package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Categorical feature encoding for model training — the leakage-safe
  * forms: a naive mean-target encoding feeds each row its OWN label
  * back as a feature (the classic target-leak), so the canonical fix is
  * leave-one-out with prior smoothing. Everything here is window/agg
  * Column arithmetic — no UDFs, no driver round-trips, restatable in
  * SQL (the `encode_target_loo` gate hash-matches DuckDB).
  */
object Encode {

  /** Leave-one-out target encoding with additive smoothing:
    *
    *   enc_i = (sum_cat − y_i + m·prior) / (cnt_cat − 1 + m)
    *
    * where prior is the GLOBAL label mean and m the smoothing strength —
    * each row's own label is subtracted out (no self-leak). Singleton
    * categories (cnt 1) degrade to the prior when m > 0; at m = 0 a
    * singleton is 0/0 = null (NOT the prior) — m = 0 exists for testing
    * the raw LOO algebra, production callers should smooth.
    * Scale shape: per-category (sum, count)
    * via a map-side-combinable `groupBy` — O(categories) rows, NOT a
    * window over the raw fact (a `Window.partitionBy(cat)` funnels every
    * row of a category through ONE task, capping parallelism at the
    * category cardinality — fatal for a 3-value flag column at 100 TB) —
    * broadcast null-safe-joined back onto the fact together with the
    * 1-row global prior; the encoded column is then pure scan
    * arithmetic, so the fact is read exactly twice (once for the tiny
    * aggregates, once for the encode scan) with no fact-sized shuffle.
    *
    * At serving time (rows WITHOUT labels) use [[targetEncodeFit]] /
    * the fitted table instead — LOO is a TRAINING-set transform by
    * construction.
    *
    * @param broadcastStats BROADCAST CEILING: the default hints the
    *        per-category stats into a broadcast join, correct for the
    *        bounded-cardinality categories target encoding is FOR
    *        (flags, countries, merchants — up to tens of millions of
    *        rows fit Spark's 8 GB broadcast limit). An id-like catCol
    *        with near-row cardinality would blow the broadcast (where
    *        the encoding itself is also statistically meaningless —
    *        every group is a singleton at the prior); pass false to
    *        drop the hint and let AQE pick the join strategy from the
    *        aggregate's actual runtime size.
    */
  def targetEncodeLoo(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      smoothing: Double = 10.0,
      outCol: String = "te",
      broadcastStats: Boolean = true): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val y = col(labelCol).cast("double")
    val prior = df.agg(avg(y).as("__prior"))
    // Null-safe equality so a NULL category still gets its group stats
    // (matching the window form, where nulls form one partition).
    val stats = df.groupBy(col(catCol).as("__cat"))
      .agg(sum(y).as("__s"), count(y).as("__c"))
    df.join(broadcast(prior))
      .join(if (broadcastStats) broadcast(stats) else stats,
        col(catCol) <=> col("__cat"), "left")
      .withColumn(outCol,
        (col("__s") - y + lit(smoothing) * col("__prior")) /
          (col("__c") - lit(1) + lit(smoothing)))
      .drop("__cat", "__s", "__c", "__prior")
  }

  /** The FITTED per-category encoding table (category, enc) for serving:
    * smoothed mean target per category, no leave-one-out (serving rows
    * carry no label to subtract). Broadcast-join it onto serving data;
    * unseen categories fall back to the prior via the returned default.
    */
  def targetEncodeFit(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      smoothing: Double = 10.0): (DataFrame, Double) = {
    val y = col(labelCol).cast("double")
    val prior = df.agg(avg(y)).head().getDouble(0)
    val table = df.groupBy(catCol)
      .agg(((sum(y) + lit(smoothing * prior)) /
        (count(y) + lit(smoothing))).as("enc"))
    (table, prior)
  }
}
