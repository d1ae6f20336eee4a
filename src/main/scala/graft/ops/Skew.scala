package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for heavy-key aggregations (SURVEY's 100 TB posture:
  * "skewed keys → salting or AQE skew-join").
  *
  * AQE handles skewed JOINS at runtime; skewed AGGREGATIONS with
  * low-cardinality hot keys still funnel each key's rows through one
  * reducer. `saltedAgg` splits every key into `saltFactor` sub-keys for
  * the first (partial) aggregation, then combines sub-aggregates in a
  * cheap second pass — two shuffles, but the first spreads a hot key over
  * saltFactor reducers and the second moves only saltFactor rows per key.
  *
  * Only aggregates with an associative combine step qualify; the helper
  * takes the per-stage expressions explicitly so the caller states both
  * halves (e.g. sum→sum, count→sum, min→min).
  */
object Skew {

  /** Deterministic salt derived from stable row content, not rand() —
    * repeatable runs produce identical partitioning (and tests are
    * deterministic). Pass the row's unique id columns.
    */
  def salt(saltFactor: Int, idCols: Column*): Column =
    pmod(xxhash64(idCols: _*), lit(saltFactor))

  /** Two-phase salted aggregation.
    *
    * @param partials  per-(key, salt) aggregates, aliased
    * @param combines  combine step over the partial columns, same aliases
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[String],
      saltFactor: Int,
      idCols: Seq[Column],
      partials: Seq[Column],
      combines: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", salt(saltFactor, idCols: _*))
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partials.head, partials.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(combines.head, combines.tail: _*)
  }
}
