package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Line-level deduplication — the C4/RefinedWeb-style hygiene pass
  * that operates WITHIN documents at line granularity rather than on whole
  * docs: (a) corpus-wide exact-duplicate-line removal (keep the first
  * occurrence by document order), and (b) boilerplate stripping (drop any
  * line that recurs across at least `minDocs` distinct documents — nav
  * bars, cookie banners, license headers — from EVERY document, then
  * reassemble the cleaned text).
  *
  * Scale shape: one explode (map-side, no shuffle) + ONE hash-partitioned
  * aggregation per pass.
  *
  *  - keep-first groups by the line VALUE with `min(struct(id, line_no))`
  *    — partial aggregation runs map-side, so the shuffle carries one
  *    partially-reduced row per distinct line per input partition, not
  *    every line occurrence (a window `row_number` over the same key
  *    would shuffle all rows and sort each group: strictly worse).
  *    Grouping by the value, not a hash of it, means no collision
  *    semantics to document — two distinct lines can never merge.
  *  - boilerplate detection aggregates exact distinct-document counts
  *    per line, keeps only lines at/above `minDocs`; that result is
  *    small BY DEFINITION (boilerplate = high-frequency), so it is
  *    collapsed to one broadcast `collect_set` row and removal becomes
  *    a map-side array `filter` over each document's own split text —
  *    the corpus is never exploded, shuffled, or re-aggregated to strip
  *    boilerplate, and line order is preserved for free.
  *
  * Reference scope: the reference pipeline dedups whole rows (A1/A2);
  * line-level dedup is part of the [EXT] training-data surface
  * (SURVEY §2.11), where published LLM corpus pipelines report it as one
  * of the highest-yield cleaning steps.
  */
object LineDedup {

  /** Explode lined text into (id, line_no, line) with 1-based positions.
    * `sepRegex` is a Java regex (default: newline). Pure map-side.
    */
  def explodeLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String = "\n"): DataFrame =
    df.select(col(idCol), posexplode(split(col(textCol), sepRegex)))
      .select(col(idCol), (col("pos") + 1).cast("int").as("line_no"),
        col("col").as("line"))

  /** Corpus-wide exact line dedup, keep-first: for every distinct line
    * value, the surviving occurrence is the one with the smallest
    * (id, line_no). Output: (id, line_no, line) survivors.
    *
    * Plan shape matters here: `min(struct(id, line_no))` expresses the
    * keep-first tiebreak directly but plans as SortAggregate (struct
    * buffers are not hash-aggregable), which sorts every partition's
    * full line set. For integral ids the pair is instead PACKED into one
    * fixed-width DECIMAL — `id * 2^31 + line_no`, order-preserving
    * because ids are required non-negative (enforced, fails loudly) and
    * line_no < 2^31 (a line number is bounded by a single document's
    * line count; a 2-billion-line document cannot exist inside one
    * row) — which keeps the aggregation a map-combinable HashAggregate.
    * Non-integral id types take the general struct-min path.
    */
  def dedupLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String = "\n"): DataFrame = {
    import org.apache.spark.sql.types._
    val lines = explodeLines(df, idCol, textCol, sepRegex)
    val idType = df.schema(idCol).dataType
    idType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val Shift = 2147483648L // 2^31
        val packed = (when(col(idCol) >= 0, col(idCol))
          .otherwise(raise_error(concat(
            lit(s"dedupLines: negative $idCol breaks keep-first packing: "),
            col(idCol).cast("string"))))
          .cast("decimal(29,0)") * Shift) + col("line_no")
        lines.groupBy(col("line"))
          .agg(min(packed).as("p"))
          .select(
            floor(col("p") / Shift).cast(idType).as(idCol),
            (col("p") % Shift).cast("int").as("line_no"),
            col("line"))
      case _ =>
        // min(struct) compares fields left-to-right: document id first,
        // then position — the keep-first tiebreak for ANY ordered id.
        lines.groupBy(col("line"))
          .agg(min(struct(col(idCol), col("line_no"))).as("first"))
          .select(col("first")(idCol).as(idCol),
            col("first")("line_no").as("line_no"), col("line"))
    }
  }

  /** Lines recurring in at least `minDocs` DISTINCT documents, with their
    * document frequency. Small by definition (it is the boilerplate set).
    */
  def boilerplateLines(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
      sepRegex: String = "\n"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    explodeLines(df, idCol, textCol, sepRegex)
      .groupBy(col("line"))
      .agg(countDistinct(col(idCol)).as("doc_freq"))
      .filter(col("doc_freq") >= minDocs)
  }

  /** Strip boilerplate lines from every document and reassemble the
    * cleaned text (lines rejoined with `joinSep` in original order).
    * A document whose every line is boilerplate disappears from the
    * output (it has no surviving text) — callers wanting to keep empty
    * husks can left-join the result back onto the corpus.
    *
    * The CORPUS IS NEVER SHUFFLED here: only the detection aggregation
    * moves (partially-reduced per-line rows — tiny), and its result, the
    * boilerplate set (small BY DEFINITION: boilerplate = high document
    * frequency), is collapsed to a one-row `collect_set` and broadcast.
    * Removal is then a map-side array `filter` over each document's own
    * split text — no explode of the corpus, no anti-join, no reassembly
    * aggregation, and line order is preserved for free instead of being
    * restored by a sort. At 100 TB the alternative (explode + anti-join
    * + collect_list by doc) shuffles every LINE of the corpus twice;
    * this shape shuffles none of it.
    */
  def stripBoilerplate(
      df: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int,
      sepRegex: String = "\n",
      joinSep: String = "\n"): DataFrame = {
    // the broadcast set holds xxhash64 LONGS, not line strings: the
    // removal filter compares every corpus line against every set entry
    // (linear array scan), and an 8-byte compare is ~an order of
    // magnitude cheaper than a string compare at the same shape. The
    // price is the usual conservative hash semantics: an innocent line
    // colliding with a boilerplate hash in 64 bits is over-removed,
    // never under-removed (same documented direction as the
    // incremental stores and Decontaminate's hashed mode).
    val bset = boilerplateLines(df, idCol, textCol, minDocs, sepRegex)
      .agg(collect_set(xxhash64(col("line"))).as("_bset"))
    val kept = filter(split(col(textCol), sepRegex),
      l => !array_contains(col("_bset"), xxhash64(l)))
    df.crossJoin(broadcast(bset))
      .select(col(idCol), kept.as("_kept"))
      .filter(size(col("_kept")) > 0)
      .select(col(idCol), array_join(col("_kept"), joinSep).as(textCol))
  }
}
