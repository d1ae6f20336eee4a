package graft.ops

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight data-quality metrics via `df.observe` (CollectMetrics):
  * row counts, null counts, and domain violations are accumulated DURING
  * whatever action consumes the DataFrame — write, count, stream batch —
  * in the same pass. At 100 TB the difference between this and a
  * validation query is an entire extra scan of the table.
  *
  * Generalizes the reference's post-hoc row accounting
  * (etl/csv_loader.py:152-156 logs len(df) after each stage): the checks
  * ride the plan instead of re-running it.
  */
object Quality {

  /** Attach counters to `df`. Metrics land in the returned Observation
    * after the NEXT action on the returned DataFrame:
    *   n_rows, nulls_<col> per required col, nonpos_<col> per positive col.
    */
  def observed(df: DataFrame, requiredCols: Seq[String],
      positiveCols: Seq[String] = Nil): (DataFrame, Observation) = {
    require(requiredCols.nonEmpty || positiveCols.nonEmpty,
      "no quality checks requested")
    (requiredCols ++ positiveCols).foreach(c =>
      require(df.columns.contains(c), s"unknown column $c"))
    val obs = Observation()
    // coalesce: sum over ZERO rows is SQL null — an empty (vacuously
    // clean) dataset must gate as clean, not fail on null counters
    val metrics = count(lit(1)).as("n_rows") +:
      (requiredCols.map(c =>
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as(s"nulls_$c")) ++
       positiveCols.map(c =>
        coalesce(sum(when(col(c) <= 0, 1L).otherwise(0L)), lit(0L)).as(s"nonpos_$c")))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** True iff every observed counter beyond n_rows is zero — the gate a
    * pipeline checks after its write action.
    */
  def clean(metrics: Map[String, Any]): Boolean =
    metrics.forall { case (k, v) =>
      k == "n_rows" || (v match {
        case l: Long => l == 0L
        case i: Int => i == 0
        case _ => false
      })
    }
}
