package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Classifier EVALUATION metrics — the measurement half of the
  * learned-gate stages (`Classifier`, `NgramLm`, `TextAnalysis`): a
  * quality filter is only as good as its measured ROC/calibration on a
  * labeled holdout, and at corpus scale the metrics themselves must be
  * distributed aggregations, not a driver-side sklearn call over a
  * collected sample.
  *
  * Everything here is exact and deterministic (closed-form aggregate
  * arithmetic, no sampling, no seeds) — which is what lets the three
  * query entries hash-match a DuckDB restatement end-to-end.
  *
  * Scale shape (the 100 TB lens):
  *
  *  - Every metric starts with ONE map-combinable aggregate that
  *    collapses the corpus to O(distinct scores) / O(bins) / O(1) rows —
  *    partial aggregation does the heavy lifting map-side, and nothing
  *    after the first shuffle ever touches a per-document row again.
  *  - `rocAuc`'s cumulative pass is a DISTRIBUTED prefix sum over the
  *    aggregated score-group table ([[graft.ops.PrefixSum]]): continuous
  *    model scores make distinct ≈ n, so "over the aggregated table" is
  *    no size bound at all — the cumulative must range-partition, not
  *    fall into one unpartitioned-window task (asserted in PlanSpec).
  */
object Eval {

  /** ROC-AUC via the pair-counting identity (equivalent to the
    * Mann-Whitney rank-sum with average ranks for ties):
    *
    *   AUC = Σ_g [ p_g · N_<g  +  p_g · n_g / 2 ]  /  (P · N)
    *
    * over score groups g ascending, where p_g/n_g are the group's
    * positive/negative counts and N_<g the negatives strictly below —
    * a positive beats every lower-scored negative and half-ties the
    * equal-scored ones. Output: one row
    * (pos_cnt, neg_cnt, auc round 6); auc is null when either class is
    * empty (undefined, surfaced as null rather than a fake 0).
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val g = df
      .groupBy(col(scoreCol).as("score"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("n"))
    // cumulative negatives strictly below this score: continuous model
    // scores make distinct ≈ n, so this is a distributed prefix sum
    // (graft.ops.PrefixSum: range-partition by score → per-partition
    // subtotals → broadcast prefix → partition-local cumulative), never
    // an unpartitioned window over a data-scale frame
    val (cum, _) = graft.ops.PrefixSum.runningSums(g, Seq("score"),
      Seq(("n", "nb", false)))
    cum
      .agg(
        sum("p").as("pos_cnt"),
        sum("n").as("neg_cnt"),
        // promote BEFORE the products: p·nb (and pos·neg below) in long
        // arithmetic wraps silently once per-group positives times
        // cumulative negatives pass Long.Max — plausible at
        // billions-of-rows-per-class scale
        sum(col("p").cast("double") * col("nb") +
          col("p").cast("double") * col("n") / lit(2.0)).as("u"))
      .select(col("pos_cnt"), col("neg_cnt"),
        when(col("pos_cnt") > 0 && col("neg_cnt") > 0,
          round(col("u") / (col("pos_cnt").cast("double") * col("neg_cnt")),
            6))
          .as("auc"))
  }

  /** Confusion counts and derived P/R/F1 at a score threshold
    * (prediction = score >= threshold). One O(1)-row aggregate; the
    * ratios are null (not 0) when their denominator is empty.
    */
  def confusionAt(df: DataFrame, scoreCol: String, labelCol: String,
      threshold: Double): DataFrame = {
    val pred = col(scoreCol) >= lit(threshold)
    val y = col(labelCol)
    df.agg(
        sum(when(pred && y, 1L).otherwise(0L)).as("tp"),
        sum(when(pred && !y, 1L).otherwise(0L)).as("fp"),
        sum(when(!pred && y, 1L).otherwise(0L)).as("fn"),
        sum(when(!pred && !y, 1L).otherwise(0L)).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        when(col("tp") + col("fp") > 0,
          round(col("tp") / (col("tp") + col("fp")), 6)).as("precision"),
        when(col("tp") + col("fn") > 0,
          round(col("tp") / (col("tp") + col("fn")), 6)).as("recall"),
        when(col("tp") * 2 + col("fp") + col("fn") > 0,
          round(col("tp") * 2 / (col("tp") * 2 + col("fp") + col("fn")), 6))
          .as("f1"))
  }

  /** Reliability/calibration table: scores in [0,1] bucketed into
    * `bins` equal-width bins (symmetric clamp: score 1.0 folds into the
    * top bin, anything below 0 into bin 0 — out-of-range scores never
    * mint negative bin labels), each bin reporting its size, mean
    * score, and empirical positive rate — the standard
    * reliability-diagram input. One map-combinable aggregate to O(bins)
    * rows.
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val b = greatest(least(floor(col(scoreCol) * bins), lit(bins - 1)),
      lit(0)).cast("long")
    df.groupBy(b.as("bin"))
      .agg(count(lit(1)).as("cnt"),
        round(avg(col(scoreCol)), 6).as("mean_score"),
        round(avg(when(col(labelCol), 1.0).otherwise(0.0)), 6)
          .as("pos_rate"))
      .orderBy("bin")
  }
}
