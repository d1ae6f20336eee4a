package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric imputation — the standard feature-repair step in front of
  * the estimators that (correctly) loud-reject nulls (Regression, Pca,
  * DataCard): per-column fill values from ONE aggregate pass over the
  * FIT frame, bound back as plan literals (no driver data collect, no
  * second shuffle), then applied anywhere.
  *
  * The fit/apply split is the leakage discipline: fit on the TRAINING
  * split, apply the same literals to validation/serving — refitting on
  * eval data leaks its distribution into the features. Strategies:
  * "mean" (exact when the column is integer-valued — sums are exact in
  * doubles), "median" (exact percentile 0.5 — Spark `percentile`
  * bit-matches DuckDB `quantile_cont`, see ops.Robust),
  * "median_approx", "zero".
  *
  * SCALE CONSTRAINT on "median": the exact percentile aggregate
  * buffers every DISTINCT non-null value of the column in the agg
  * buffer — O(distinct) executor memory. Fine for bounded-domain
  * columns (flags, day counts, prices in cents); an OOM driver on a
  * 100 TB high-cardinality double column. For those, fit with
  * "median_approx": `approx_percentile` (Greenwald–Khanna sketch,
  * O(accuracy · log n) memory regardless of cardinality) with rank
  * error ≤ n / accuracy — at the default accuracy 10000 that is
  * ±0.01% of rank, far inside what an IMPUTATION fill value can
  * tolerate. The oracled gate stays on exact "median" (deterministic
  * cross-engine); ImputeSpec pins the approx form to the exact one
  * within the sketch bound.
  */
object Impute {

  /** approx_percentile accuracy for "median_approx": rank error is
    * bounded by n/accuracy, memory by O(accuracy·log n) — independent
    * of column cardinality (the property "median" lacks).
    */
  val ApproxAccuracy = 10000

  /** One aggregate pass → per-column fill value. Fails loudly when a
    * column is entirely null/NaN (its statistic is undefined — silently
    * filling 0 would poison every downstream feature).
    */
  def fitFills(df: DataFrame, specs: Seq[(String, String)]): Map[String, Double] = {
    require(specs.nonEmpty, "Impute.fitFills: no columns")
    def clean(c: String): Column = {
      val d = col(c).cast("double")
      when(isnan(d), lit(null)).otherwise(d) // NaN counts as missing
    }
    val exprs = specs.map {
      case (c, "mean")   => avg(clean(c)).as(c)
      case (c, "median") => percentile(clean(c), lit(0.5)).as(c)
      case (c, "median_approx") =>
        approx_percentile(clean(c), lit(0.5), lit(ApproxAccuracy)).as(c)
      case (c, "zero")   => lit(0.0).as(c)
      case (c, other) => throw new IllegalArgumentException(
        s"Impute: unknown strategy '$other' for $c (mean|median|median_approx|zero)")
    }
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    specs.zipWithIndex.map { case ((c, strat), i) =>
      require(!row.isNullAt(i),
        s"Impute: column $c is entirely null/NaN — its $strat is undefined")
      c -> row.getDouble(i)
    }.toMap
  }

  /** Apply fitted fills: each listed column becomes double with its
    * nulls AND NaNs replaced by the fitted literal; unlisted columns
    * pass through untouched. Pure scan-level Column arithmetic.
    */
  def fill(df: DataFrame, fills: Map[String, Double]): DataFrame =
    fills.foldLeft(df) { case (d, (c, v)) =>
      val dc = col(c).cast("double")
      d.withColumn(c,
        coalesce(when(isnan(dc), lit(null)).otherwise(dc), lit(v)))
    }

  /** fit + apply on the same frame — the one-liner for non-split use. */
  def fillWith(df: DataFrame, specs: Seq[(String, String)])
      : (DataFrame, Map[String, Double]) = {
    val fills = fitFills(df, specs)
    (fill(df, fills), fills)
  }
}
