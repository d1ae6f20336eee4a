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

  /** Ids of training documents sharing at least one n-gram with any
    * benchmark document. Output: (doc_id) distinct.
    */
  def contaminatedIds(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val benchGrams = benchmark
      .select(explode(gramHashes(col(textCol), n)).as("g"))
      .distinct()
    train
      .select(col(idCol).as("doc_id"), explode(gramHashes(col(textCol), n)).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select("doc_id")
      .distinct()
  }

  /** The clean corpus: training rows whose document shares no n-gram
    * with the benchmark set (all columns pass through).
    */
  def removeContaminated(
      train: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 13): DataFrame =
    train.join(
      contaminatedIds(train, benchmark, idCol, textCol, n)
        .withColumnRenamed("doc_id", idCol),
      Seq(idCol), "left_anti")
}
