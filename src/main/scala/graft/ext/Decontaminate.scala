package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Benchmark decontamination — the standard training-data hygiene
  * step (remove training documents that overlap an evaluation set, so
  * benchmark scores measure generalization, not memorization). Overlap =
  * sharing ANY word n-gram with any benchmark document, the industry
  * convention (13-gram exact-substring matching in published LLM data
  * pipelines; n is a parameter here).
  *
  * Scale shape: the benchmark side is tiny by definition (eval sets are
  * thousands of docs; the corpus is the 100 TB side), so its distinct
  * gram-hash set BROADCASTS and the train side is a pure map-side
  * explode + broadcast semi-join at scan speed — the corpus is never
  * shuffled to find contamination; only the contaminated doc-id set
  * (small) aggregates. Grams are xxhash64'd so the join key is a long,
  * not a string (same trick as Dedup's shingle sets).
  */
object Decontaminate {

  /** Distinct hashed word n-grams of a text column. Shares Dedup's
    * shingle definition, including the short-doc fallback (a doc with
    * fewer than n tokens contributes its whole token string — exact-doc
    * matching for short docs rather than no matching at all).
    */
  private def gramHashes(text: Column, n: Int): Column =
    array_distinct(transform(Dedup.shingles(text, n), g => xxhash64(g)))

  /** Distinct word n-grams, unhashed — the exact-match join key. */
  private def gramStrings(text: Column, n: Int): Column =
    array_distinct(Dedup.shingles(text, n))

  /** Ids of training documents sharing at least one n-gram with any
    * benchmark document. Output: (doc_id) distinct.
    *
    * COLLISION SEMANTICS (default `exact = false`): the match joins on
    * xxhash64 of the gram, so an unrelated training gram colliding with
    * any benchmark gram in 64 bits falsely flags (and removeContaminated
    * silently drops) a clean document. At full corpus scale — trillions
    * of distinct train grams against millions of bench grams — the
    * birthday expectation is a handful of false flags. The error
    * direction is CONSERVATIVE (over-removal only; contamination is
    * never missed, since equal grams always hash equal), which is the
    * right default for decontamination. Set `exact = true` to join on
    * the gram string itself when a false positive is unacceptable: the
    * broadcast side stays the tiny benchmark set, but the join key is
    * a string (wider shuffle-free probe rows, same plan shape).
    */
  def contaminatedIds(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      exact: Boolean = false): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val grams: Column => Column =
      if (exact) gramStrings(_, n) else gramHashes(_, n)
    val benchGrams = benchmark
      .select(explode(grams(col(textCol))).as("g"))
      .distinct()
    train
      .select(col(idCol).as("doc_id"), explode(grams(col(textCol))).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select("doc_id")
      .distinct()
  }

  /** The clean corpus: training rows whose document shares no n-gram
    * with the benchmark set (all columns pass through). Inherits
    * `contaminatedIds`' collision semantics: the hashed default can
    * over-remove (never under-remove); `exact = true` removes exactly
    * the overlapping documents.
    */
  def removeContaminated(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13,
      exact: Boolean = false): DataFrame =
    train.join(
      contaminatedIds(train, benchmark, idCol, textCol, n, exact)
        .withColumnRenamed("doc_id", idCol),
      Seq(idCol), "left_anti")

  /** Contamination PROVENANCE: one row per (training doc, benchmark
    * doc) pair sharing at least one exact word n-gram, with the count
    * of distinct shared grams — the audit artifact behind a removal
    * decision. `contaminatedIds` answers "drop it or not"; an eval-
    * integrity review needs WHICH benchmark item leaked into WHICH
    * document and how heavily (one boilerplate gram vs a verbatim
    * copy), and a takedown of a benchmark item needs the reverse index
    * of documents it touched. Always exact-string grams — provenance
    * that can name an innocent benchmark item via a 64-bit collision
    * is worse than none.
    *
    * Scale shape: the benchmark (gram, bench_id) set broadcasts, the
    * corpus explodes its distinct grams map-side, and the per-pair
    * count is a map-combinable aggregate over the (tiny) join output —
    * the corpus is never shuffled.
    */
  def contaminationReport(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      benchIdCol: String,
      textCol: String,
      n: Int = 13): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val benchGrams = benchmark
      .select(col(benchIdCol).as("bench_id"),
        explode(gramStrings(col(textCol), n)).as("g"))
      .distinct()
    train
      .select(col(idCol).as("doc_id"),
        explode(gramStrings(col(textCol), n)).as("g"))
      .join(broadcast(benchGrams), Seq("g"))
      .groupBy("doc_id", "bench_id")
      .agg(count(lit(1)).as("shared_grams"))
  }

  /** SEMANTIC decontamination: training rows whose embedding is within
    * cosine `threshold` of ANY benchmark embedding. Catches the leakage
    * exact n-grams miss — paraphrases, translations, reformatted copies
    * of an eval item — at the cost of an embedding pass (published
    * pipelines run both: n-gram first, embedding second).
    *
    * Scale shape: the benchmark side is tiny by definition, so its
    * (double-widened, norm-hoisted) vectors BROADCAST and the check is a
    * broadcast nested-loop LEFT SEMI join along the corpus scan — the
    * corpus is never shuffled and never scored twice (semi-join
    * short-circuits on the first benchmark hit). O(|train| · |bench| · d)
    * work, |train|-bounded output, no distinct needed.
    *
    * The cosine uses the same fixed left-to-right fold as the rest of the
    * similarity surface (Similarity.dot / graft_dot), so thresholds are
    * bit-reproducible across engines and sessions.
    */
  def contaminatedIdsByEmbedding(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"cosine threshold must be in (0, 1], got $threshold")
    val dt = Similarity.dotAuto(train.sparkSession) _
    // zero- and NaN-norm rows are excluded from BOTH sides before the
    // ratio: a 0/0 cosine is NaN, and Spark's NaN ordering ranks NaN
    // above every number, so an unguarded >= threshold would flag EVERY
    // training row against a single degenerate benchmark vector. The
    // `> 0` alone is NOT enough — NaN > 0 is also TRUE under that same
    // ordering, so a vector with a NaN component (a failed embed call,
    // the very row this guard exists for) would sail through a
    // zero-only guard and its NaN cosine would match every row. Neither
    // a zero nor a NaN vector has a direction — they can neither
    // contaminate nor be contaminated.
    val t = train.select(col(idCol),
      Similarity.asDouble(col(vecCol)).as("_v"))
      .withColumn("_n", sqrt(dt(col("_v"), col("_v"))))
      .filter(col("_n") > 0 && !isnan(col("_n")))
    val b = benchmark.select(Similarity.asDouble(col(vecCol)).as("_bv"))
      .withColumn("_bn", sqrt(dt(col("_bv"), col("_bv"))))
      .filter(col("_bn") > 0 && !isnan(col("_bn")))
    t.join(broadcast(b),
        dt(col("_v"), col("_bv")) / (col("_n") * col("_bn")) >= threshold,
        "left_semi")
      .select(idCol)
  }

  /** The semantically-clean corpus: training rows farther than
    * `threshold` cosine from every benchmark embedding (all columns
    * pass through).
    */
  def removeContaminatedByEmbedding(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame =
    train.join(
      contaminatedIdsByEmbedding(train, benchmark, idCol, vecCol, threshold),
      Seq(idCol), "left_anti")
}
