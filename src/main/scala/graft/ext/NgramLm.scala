package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] N-gram language-model perplexity scoring — the published
  * quality-filter stage (CCNet's KenLM filter, Gopher's quality
  * pipeline): train a bigram model on a trusted reference corpus, score
  * every candidate document by cross-entropy under that model, and gate
  * on perplexity. Low perplexity ≈ "looks like the reference corpus";
  * the model-based complement to the rule-based
  * `TextAnalysis.qualityScore` heuristics. Reference analog: the
  * reference pipeline filters rows on fixed predicates only
  * (`etl/csv_loader.py:99-102` — dropna plus `exchange_rate > 0`); this
  * is the learned generalization a training-data pipeline needs.
  *
  * Model: add-k smoothed bigram probabilities over whitespace tokens
  * (`TextAnalysis.tokens` — the one tokenizer every text operator in
  * this engine shares, so vocab/oov/perplexity agree on what a token
  * is):
  *
  *   p(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k·V)
  *
  * with c(·) the TRAINING-corpus counts, V its distinct-token count,
  * and unseen words/bigrams falling through the same formula via
  * count 0 — no special cases, every probability is finite and in
  * (0, 1]. The denominator uses the unigram OCCURRENCE count (not the
  * bigram-context count): deterministic, one aggregate, and the
  * ranking a filter needs is unchanged.
  *
  * Scale shape (the 100 TB lens):
  *
  *  - TRAINING is two map-combinable aggregates, each one corpus-scan
  *    shape: token explode → unigram counts, and a zip_with pair
  *    explode → bigram counts. No windows, no per-doc state — the
  *    consecutive-pair extraction is array arithmetic inside the scan
  *    (`slice`+`zip_with`), so Catalyst never materializes token rows
  *    with ordinals, and partial aggregation collapses the shuffle to
  *    distinct-gram rows.
  *  - `maxVocab` caps the model: the exact top-maxVocab tokens (via
  *    `HeavyHitters` — no token-level shuffle) stay, the tail maps to
  *    `<unk>`. The mapping is a BROADCAST JOIN against the O(maxVocab)
  *    vocab table — never an `array_contains` over a vocab-sized
  *    literal, which would be O(V) comparisons per token and a
  *    megabyte expression tree (the `prunedExisting` plan-size lesson).
  *  - The model tables are `localCheckpoint`ed: read once per scored
  *    batch AND once for the V scalar — without materialization every
  *    use would re-aggregate the reference corpus (the re-aggregation
  *    bug `Mix.sampleToDistribution` fixed; same lesson, applied at
  *    construction).
  *  - SCORING joins candidate bigram rows against the model tables on
  *    gram keys and folds per-doc with one map-combinable avg. Join
  *    strategy is left to AQE: a capped model broadcasts (the common
  *    case); an uncapped giant model degrades to a shuffle join on the
  *    gram key, never to a driver collect. Unseen tokens resolve to the
  *    trained `<unk>` row by the SAME join (a miss rewrites the key),
  *    so the scorer adds no per-token expression work at all.
  */
object NgramLm {

  val UnkToken = "<unk>"

  /** Trained model: materialized count tables + driver-held scalars.
    * `unigrams`: (w, c) — occurrence counts (post-unk-mapping).
    * `bigrams`:  (w1, w2, c) — consecutive-pair counts.
    * `vocabSize`: distinct tokens V in the smoothing denominator.
    */
  final case class Model(
      unigrams: DataFrame,
      bigrams: DataFrame,
      vocabSize: Long,
      k: Double)

  /** Consecutive-token pairs as an array column — pure array arithmetic,
    * no explode-with-ordinal, no window. Empty for docs with < 2 tokens
    * (`slice` with length 0 is the empty array, and `sequence` descends
    * for n=1, so both degenerate shapes are guarded here once).
    */
  private def bigramPairs(toks: Column): Column =
    when(size(toks) >= 2,
      zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))

  /** Rewrite token column `c` to `<unk>` when it misses the vocab table
    * (vocab joined in as a `__in_<c>` marker beforehand).
    */
  private def unkMapped(df: DataFrame, cols: Seq[String], vocab: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.join(broadcast(vocab.select(col("w").as(c), lit(1).as(s"__in_$c"))),
          Seq(c), "left")
        .withColumn(c,
          when(col(s"__in_$c").isNotNull, col(c)).otherwise(lit(UnkToken)))
        .drop(s"__in_$c")
    }

  /** Train on `df(textCol)`. `maxVocab > 0` keeps the top-maxVocab
    * tokens (count desc, token asc — deterministic) and maps the rest
    * to `<unk>` before counting, bounding both model tables.
    */
  def train(
      df: DataFrame,
      textCol: String,
      k: Double = 0.1,
      maxVocab: Int = 0): Model = {
    require(k > 0, s"add-k smoothing needs k > 0, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = TextAnalysis.tokens(col(textCol))

    // optional vocab cap: exact top-maxVocab tokens, O(maxVocab) rows
    val vocab: Option[DataFrame] =
      if (maxVocab <= 0) None
      else Some(HeavyHitters.topTokens(df, textCol, maxVocab)
        .select(col("token").as("w")).localCheckpoint())

    def mapped(base: DataFrame, cols: Seq[String]): DataFrame =
      vocab.map(v => unkMapped(base, cols, v)).getOrElse(base)

    val unigrams = mapped(df.select(explode(toks).as("w")), Seq("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint() // read per scored batch + for V; never re-aggregate
    val bigrams = mapped(
        df.select(explode(bigramPairs(toks)).as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2")),
        Seq("w1", "w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      .localCheckpoint()
    Model(unigrams, bigrams, unigrams.count(), k)
  }

  /** Incremental model maintenance: fold one batch's gram counts into
    * durable count stores — counts are ADDITIVE, so the LM grows with
    * the corpus in O(batch) per ingest, the same posture as the dedup
    * signature stores and `ivfAppendPersisted`. Each store is a
    * TxTable-transactional `IncrementalRollup` keyed by the gram
    * (unigrams under `path/uni`, bigrams under `path/bi`), so a crashed
    * ingest publishes nothing and a replayed `deltaId` is a ledger
    * no-op per store (a crash BETWEEN the two commits converges on
    * rerun: the applied store skips, the missing one applies).
    *
    * The stores maintain UNCAPPED counts — a vocab cap is a VIEW of the
    * counts, applied at `load` time (tail counts fold into `<unk>` by
    * exact arithmetic), so one store serves any cap without re-reading
    * the corpus.
    */
  def ingestCounts(
      spark: org.apache.spark.sql.SparkSession,
      batch: DataFrame,
      textCol: String,
      path: String,
      deltaId: String): Unit = {
    val toks = TextAnalysis.tokens(col(textCol))
    graft.sinks.IncrementalRollup(spark,
      batch.select(explode(toks).as("w")),
      s"$path/uni", groupCols = Seq("w"), sumCols = Nil,
      deltaId = Some(deltaId), transactional = true)
    graft.sinks.IncrementalRollup(spark,
      batch.select(explode(bigramPairs(toks)).as("bg"))
        .select(col("bg.w1").as("w1"), col("bg.w2").as("w2")),
      s"$path/bi", groupCols = Seq("w1", "w2"), sumCols = Nil,
      deltaId = Some(deltaId), transactional = true)
  }

  /** Load the model maintained by `ingestCounts`. `maxVocab > 0`
    * derives the exact top-maxVocab vocabulary from the STORED unigram
    * counts (count desc, token asc — the `train` ordering) and folds
    * tail-gram counts into `<unk>` — O(model) arithmetic, never a
    * corpus scan, and exactly equal to `train(unionOfBatches,
    * maxVocab)` (spec-asserted): mapping before counting and summing
    * after counting commute.
    */
  def load(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      k: Double = 0.1,
      maxVocab: Int = 0): Model = {
    require(k > 0, s"add-k smoothing needs k > 0, got $k")
    val uniRaw = graft.sinks.TxTable.read(spark, s"$path/uni")
      .getOrElse(sys.error(s"NgramLm.load: no unigram store at $path/uni"))
      .select(col("w"), col("cnt").as("c"))
    val biRaw = graft.sinks.TxTable.read(spark, s"$path/bi")
      .getOrElse(sys.error(s"NgramLm.load: no bigram store at $path/bi"))
      .select(col("w1"), col("w2"), col("cnt").as("c"))
    val (uni, bi) =
      if (maxVocab <= 0) (uniRaw, biRaw)
      else {
        val vocab = uniRaw
          .orderBy(col("c").desc, col("w").asc).limit(maxVocab)
          .select("w").localCheckpoint()
        def remap(df: DataFrame, cols: Seq[String]) =
          unkMapped(df, cols, vocab)
            .groupBy(cols.map(col): _*).agg(sum("c").as("c"))
        (remap(uniRaw, Seq("w")), remap(biRaw, Seq("w1", "w2")))
      }
    val uniCk = uni.localCheckpoint()
    Model(uniCk, bi.localCheckpoint(), uniCk.count(), k)
  }

  /** Score `docs(idCol, textCol)` under `model`: one row per document
    * with at least one bigram — (id, n_bigrams, cross_entropy,
    * perplexity), cross-entropy in bits/bigram, perplexity = 2^H.
    * Rounded to 6 decimals: the per-doc fold is a float sum whose
    * accumulation order is engine-defined, and 6 decimals is where
    * every engine agrees (the repo-wide convention for float outputs).
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val bg = docs
      .select(col(idCol), explode(bigramPairs(TextAnalysis.tokens(col(textCol)))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

    // Unigram lookups double as the unk map: a miss (cu null) means the
    // token was tail-mapped (capped model — take the trained <unk> row
    // via the rewritten key) or never seen (uncapped — count stays 0
    // through the same path, since no <unk> row exists to match).
    val uni1 = model.unigrams.select(col("w").as("w1"), col("c").as("cu1"))
    val uni2 = model.unigrams.select(col("w").as("w2"), col("c").as("cu2"))
    val unkUni = model.unigrams.filter(col("w") === UnkToken)
      .select(lit(1).as("__one"), col("c").as("cunk"))
    val mapped = bg
      .join(uni1, Seq("w1"), "left")
      .join(uni2, Seq("w2"), "left")
      .withColumn("k1", when(col("cu1").isNotNull, col("w1")).otherwise(lit(UnkToken)))
      .withColumn("k2", when(col("cu2").isNotNull, col("w2")).otherwise(lit(UnkToken)))
    val unkCount: Long = // trained <unk> occurrences; 0 for uncapped models
      unkUni.collect().headOption.map(_.getLong(1)).getOrElse(0L)

    val logP = log2(
      (coalesce(col("cb"), lit(0L)) + model.k) /
        (coalesce(col("cu1"), lit(unkCount)) + model.k * model.vocabSize))
    mapped
      .join(model.bigrams.select(col("w1").as("k1"), col("w2").as("k2"),
        col("c").as("cb")), Seq("k1", "k2"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(logP).as("__h"))
      .select(col(idCol), col("n_bigrams"),
        round(-col("__h"), 6).as("cross_entropy"),
        round(pow(lit(2d), -col("__h")), 6).as("perplexity"))
  }

  /** The filter composition: keep docs scoring at or below
    * `maxPerplexity` under the model. Docs with < 2 tokens have no
    * perplexity and are dropped (a sub-2-token "document" is junk to a
    * training pipeline).
    */
  def perplexityFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      maxPerplexity: Double): DataFrame = {
    val keep = score(docs, idCol, textCol, model)
      .filter(col("perplexity") <= maxPerplexity)
      .select(idCol)
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
