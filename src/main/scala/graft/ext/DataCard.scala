package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Corpus DATA CARD — the one-call datasheet a training-data
  * release ships with (datasheets-for-datasets practice): size, token
  * budget, language composition, quality and PII exposure, exact-dup
  * rate, in ONE tidy long-format (metric, value) table that diffs
  * trivially across corpus versions.
  *
  * Distinct from `ops.Profile` (per-COLUMN null/distinct census): this
  * is the corpus-level content summary.
  *
  * Scale shape: ONE map-combinable aggregate pass over the corpus for
  * every scalar metric (the dup-rate's distinct-hash count rides the
  * same pass as approx? no — it is exact, via count(distinct hash) in
  * the same agg: Spark plans one Expand+two-stage aggregate, still a
  * single scan), plus one O(languages) groupBy for the composition
  * rows. Output is O(metrics + languages) — driver-sized by
  * construction. All arithmetic is deterministic and SQL-restatable,
  * so `ext_data_card` is DuckDB-oracled end-to-end.
  */
object DataCard {

  /** @return (metric, value) rows, ordered by metric:
    *   n_docs, total_tokens, avg_tokens, mean_quality, pct_empty,
    *   exact_dup_rate, pii_email_rate, lang_share_<lang>...
    */
  def corpusCard(docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val t = col(textCol)
    val toks = TextAnalysis.tokenCount(t)
    val head = docs.agg(
      count(lit(1)).as("n"),
      sum(toks.cast("long")).as("tot"),
      avg(toks).as("avgt"),
      avg(TextAnalysis.qualityScore(t)).as("q"),
      sum(when(length(trim(t)) === 0, 1L).otherwise(0L)).as("empty"),
      countDistinct(md5(t)).as("dh"),
      sum(when(TextAnalysis.piiCount(t, TextAnalysis.EmailRe) > 0, 1L)
        .otherwise(0L)).as("email")).head()
    val n = head.getLong(0)
    require(n > 0, "DataCard over an empty corpus")
    require(!head.anyNull,
      "DataCard: null aggregate — the text column is entirely null " +
        "(mis-mapped column?); null-reject or fix the mapping first")
    val scalars = Seq(
      "n_docs" -> n.toDouble,
      "total_tokens" -> head.getLong(1).toDouble,
      "avg_tokens" -> head.getDouble(2),
      "mean_quality" -> head.getDouble(3),
      "pct_empty" -> head.getLong(4).toDouble / n,
      "exact_dup_rate" -> (1.0 - head.getLong(5).toDouble / n),
      "pii_email_rate" -> head.getLong(6).toDouble / n
    ).toDF("metric", "value")
    val langs = docs.groupBy(col(langCol).as("l"))
      .agg(count(lit(1)).as("cnt"))
      .select(concat(lit("lang_share_"), coalesce(col("l"), lit("null")))
        .as("metric"), (col("cnt") / lit(n.toDouble)).as("value"))
    scalars.unionByName(langs)
      .select(col("metric"), round(col("value"), 6).as("value"))
      .orderBy("metric")
  }

  /** Media decode-coverage rows in the card's (metric, value) long
    * format: one `media_<format>_<kind>` row per census group (see
    * [[Multimodal.decodeCensus]] for the kinds). This is the FALLBACK
    * ACCOUNTING a media corpus release needs on its datasheet: the
    * per-row `kind` says whether one payload really decoded, but only
    * this rollup makes a codec blind spot (e.g. every MP3 byte-statted
    * because the JVM has no MP3 codec) visible at corpus scale. Union
    * with [[corpusCard]] output for the combined card.
    */
  def mediaDecodeCard(features: DataFrame): DataFrame =
    features.groupBy("format", "kind")
      .agg(count(lit(1)).as("cnt"))
      .select(
        concat(lit("media_"), col("format"), lit("_"), col("kind"))
          .as("metric"),
        col("cnt").cast("double").as("value"))
      .orderBy("metric")

  /** Corpus-level wild-MP3 coverage rows in the card's (metric,
    * value) long format, from [[AudioFingerprint.mp3Coverage]]'s
    * per-stream table: `mp3_frames_total`, `mp3_frames_decodable`
    * and `mp3_decodable_fraction` (frame-weighted). This is the
    * datasheet number that keeps the [[Mp3]] embedded-Huffman-subset
    * boundary HONEST at corpus scale — the census says how many
    * files landed in the MP3 regime, this says what fraction of
    * their frames the subset can actually decode, measured on the
    * corpus rather than assumed. A corpus with no MP3 frames yields
    * totals of 0 and a null-safe fraction of 0.
    */
  def mp3CoverageCard(coverage: DataFrame): DataFrame =
    coverage.agg(
      coalesce(sum("frames_total"), lit(0L)).as("t"),
      coalesce(sum("frames_decodable"), lit(0L)).as("d"))
      .select(explode(map(
        lit("mp3_frames_total"), col("t").cast("double"),
        lit("mp3_frames_decodable"), col("d").cast("double"),
        lit("mp3_decodable_fraction"),
        round(when(col("t") > 0, col("d").cast("double") / col("t"))
          .otherwise(lit(0.0)), 6))).as(Seq("metric", "value")))
      .orderBy("metric")

  /** Corpus-level TEXT-EXTRACTION fidelity rows (r15) — the
    * mp3CoverageCard analog for the document heap. Input is any of
    * the extraction tables ([[Pdf.table]], [[Html.table]],
    * [[Office.table]]): rows carrying `doc_id`, `text` and a
    * `refused` counter. Refused is a PER-DOCUMENT number that
    * [[Pdf.table]] repeats on each page row, so the rollup
    * aggregates per doc first (max — identical within a doc).
    * Emits `{prefix}_docs`, `{prefix}_rows` (total extraction rows —
    * PAGES for [[Pdf.table]], messages/cues/members for the others),
    * `{prefix}_chars`, `{prefix}_refused` and
    * `{prefix}_refused_per_mchar` (per million extracted chars,
    * round 6, 0 on an empty extraction) — the datasheet numbers
    * that keep the entity/encoding/filter refusal boundaries
    * measured at corpus scale.
    */
  def textExtractionCard(rows: DataFrame, prefix: String): DataFrame =
    rows.groupBy("doc_id")
      .agg(count(lit(1)).as("rows"),
        sum(length(col("text"))).as("chars"),
        max("refused").as("refused"))
      .agg(count(lit(1)).as("docs"),
        coalesce(sum("rows"), lit(0L)).as("p"),
        coalesce(sum("chars"), lit(0L)).as("c"),
        coalesce(sum("refused"), lit(0L)).as("r"))
      .select(explode(map(
        lit(s"${prefix}_docs"), col("docs").cast("double"),
        lit(s"${prefix}_rows"), col("p").cast("double"),
        lit(s"${prefix}_chars"), col("c").cast("double"),
        lit(s"${prefix}_refused"), col("r").cast("double"),
        lit(s"${prefix}_refused_per_mchar"),
        round(when(col("c") > 0,
          col("r").cast("double") * 1000000.0 / col("c"))
          .otherwise(lit(0.0)), 6))).as(Seq("metric", "value")))
      .orderBy("metric")
}
