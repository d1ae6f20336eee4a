package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust-statistics gates over a numeric column: exact-percentile
  * winsorization (clamp into the [pLo, pHi] fence) and Tukey IQR
  * outlier detection — the standard pre-aggregation defenses against a
  * fat-tailed feed (one corrupted price shifting a mean, one bot
  * session dominating a sum).
  *
  * Percentiles are EXACT (`percentile`, linear interpolation — bit-
  * matched by DuckDB's quantile_cont, which is what makes both entries
  * oracle-able; the sketch-based approximate forms live in the KLL
  * family). Scale shape: ONE aggregate computes the fences (exact
  * percentile is a sort-based aggregate — at true 100 TB scale swap in
  * KLL bounds via the same API shape); fences then join back as a
  * broadcast scalar row — plan-level metadata, no driver round trip —
  * and the clamp/filter is scan-speed arithmetic.
  */
object Robust {

  private def fences(df: DataFrame, valueCol: String,
      pLo: Double, pHi: Double): DataFrame =
    df.agg(
      expr(s"percentile($valueCol, $pLo)").as("__lo"),
      expr(s"percentile($valueCol, $pHi)").as("__hi"))

  /** Append `outCol` = valueCol clamped into its exact [pLo, pHi]
    * percentile fence.
    */
  def winsorize(df: DataFrame, valueCol: String,
      pLo: Double = 0.05, pHi: Double = 0.95,
      outCol: String = "winsorized"): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi,
      s"need 0 <= pLo < pHi <= 1, got [$pLo, $pHi]")
    df.join(broadcast(fences(df, valueCol, pLo, pHi)))
      .withColumn(outCol,
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Rows outside the Tukey fence [q1 − k·IQR, q3 + k·IQR], flagged
    * with the side they fell off. k = 1.5 is the standard whisker.
    */
  def iqrOutliers(df: DataFrame, valueCol: String,
      k: Double = 1.5): DataFrame = {
    require(k > 0, s"k must be > 0, got $k")
    val f = df.agg(
      expr(s"percentile($valueCol, 0.25)").as("__q1"),
      expr(s"percentile($valueCol, 0.75)").as("__q3"))
    df.join(broadcast(f))
      .withColumn("__iqr", col("__q3") - col("__q1"))
      .filter(col(valueCol) < col("__q1") - lit(k) * col("__iqr") ||
        col(valueCol) > col("__q3") + lit(k) * col("__iqr"))
      .withColumn("side",
        when(col(valueCol) < col("__q1") - lit(k) * col("__iqr"), "low")
          .otherwise("high"))
      .drop("__q1", "__q3", "__iqr")
  }
}
