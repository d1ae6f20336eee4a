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
    * each row's own label is subtracted out (no self-leak), and
    * singleton categories (cnt 1) degrade gracefully to the prior
    * instead of 0/0. Scale shape: one hash-partitioned window per
    * category (sum + count — both map-combinable into the same
    * exchange) plus a broadcast 1-row global aggregate; the encoded
    * column is then pure scan arithmetic.
    *
    * At serving time (rows WITHOUT labels) use [[targetEncodeFit]] /
    * the fitted table instead — LOO is a TRAINING-set transform by
    * construction.
    */
  def targetEncodeLoo(
      df: DataFrame,
      catCol: String,
      labelCol: String,
      smoothing: Double = 10.0,
      outCol: String = "te"): DataFrame = {
    require(smoothing >= 0, s"smoothing must be >= 0, got $smoothing")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(catCol)
    val y = col(labelCol).cast("double")
    val prior = df.agg(avg(y).as("__prior"))
    df.join(broadcast(prior))
      .withColumn("__s", sum(y).over(w))
      .withColumn("__c", count(y).over(w))
      .withColumn(outCol,
        (col("__s") - y + lit(smoothing) * col("__prior")) /
          (col("__c") - lit(1) + lit(smoothing)))
      .drop("__s", "__c", "__prior")
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
