package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Training-mix sampling: draw the LARGEST corpus subset whose
  * group proportions exactly match a target distribution (language /
  * domain mixing ratios — the knob every pre-training data recipe
  * publishes). Deterministic: selection within a group is by md5 rank of
  * the id, so the same corpus and weights yield the same sample on any
  * engine, any partitioning, every run.
  *
  * Feasible total T = min over groups of floor(n_g / w_g); each group
  * keeps quota_g = floor(w_g * T) rows. Both derive from one tiny
  * group-count aggregate (O(groups) rows, broadcast back) — no second
  * pass over the data. The per-group md5 ranking is a window sort within
  * each group: the exact-quota cost. When an approximate rate is enough,
  * the cheaper filter-only form is `ext_sample_stratified`'s md5-prefix
  * sampling (no shuffle at all).
  */
object Mix {

  /** @param weights target proportion per group value; groups absent
    *                from the map are excluded from the sample. Every
    *                weights key MUST have at least one corpus row —
    *                a missing group makes the only exact-proportion
    *                sample the EMPTY one (T=0), which is never what a
    *                mixing recipe means, so it fails fast instead of
    *                silently returning a sample with drifted shares.
    *                Intersect the map with the present groups first if
    *                partial coverage is intended.
    */
  def sampleToDistribution(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "sampleToDistribution needs target weights")
    require(weights.values.forall(w => w > 0 && w <= 1),
      s"weights must be in (0, 1]: $weights")
    require(!df.columns.exists(Set("__w", "__n", "__T", "__quota", "__rn")),
      "columns __w/__n/__T/__quota/__rn are reserved by sampleToDistribution")
    val spark = df.sparkSession
    import spark.implicits._
    val wDf = weights.toSeq.toDF(groupCol, "__w")
    // LEFT join from the weights so a weight group with no corpus rows
    // SURFACES (null __n) rather than dropping out of the quota math —
    // an inner join here would shrink the min() over present groups only
    // and silently violate the exact-proportions contract.
    val counts = broadcast(wDf)
      .join(df.groupBy(groupCol).agg(count(lit(1)).as("__n")),
        Seq(groupCol), "left")
    val absent = counts.filter(col("__n").isNull)
      .select(groupCol).collect().map(_.get(0))
    require(absent.isEmpty,
      s"sampleToDistribution: weight groups absent from the corpus: " +
        s"${absent.mkString(", ")} — the largest exact-proportion sample " +
        "would be empty (T=0); drop these keys or fix the corpus")
    val feasibleT = counts.agg(min(floor(col("__n") / col("__w"))).as("__T"))
    val quotas = counts.crossJoin(broadcast(feasibleT))
      .select(col(groupCol),
        floor(col("__w") * col("__T")).cast("long").as("__quota"))
    val rankW = Window.partitionBy(groupCol)
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(rankW))
      .join(broadcast(quotas), groupCol)
      .filter(col("__rn") <= col("__quota"))
      .drop("__rn", "__quota")
  }
}
