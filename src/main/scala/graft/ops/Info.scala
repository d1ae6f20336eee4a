package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Information-theoretic column statistics — the feature-relevance /
  * redundancy measures a curation pipeline reads before trusting a
  * metadata column (is `source` just `lang` in disguise? does a label
  * carry any signal about a feature?): Shannon entropies, mutual
  * information, and normalized MI between two categorical columns.
  *
  * Exact and closed-form (natural log), no sampling — DuckDB-oracle-able
  * (`ext_mutual_info`). Scale shape: ONE map-combinable aggregate
  * collapses the corpus to the O(|X|·|Y|) joint contingency table;
  * marginals are PARTITIONED windows over that table (each frame is one
  * x's or one y's rows — hash-distributed, never a single-partition
  * collapse even when a caller misfeeds a continuous column and the
  * joint approaches corpus size), the grand total is a 1-row aggregate
  * broadcast back (the Transforms.scala agg-and-broadcast idiom; the
  * joint's shuffle is computed once and reused via ReuseExchange) —
  * nothing after the first shuffle touches a corpus row, and no
  * unpartitioned window exists in the plan (PlanSpec-guarded).
  */
object Info {

  /** One row: (n, h_x, h_y, mi, nmi), nats, round 6. `nmi` =
    * MI/sqrt(H(X)·H(Y)), null when either entropy is zero (a constant
    * column carries no signal to normalize by). Null category values
    * are EXCLUDED (they are missingness, not a category; count them
    * separately).
    */
  def mutualInformation(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val Wx = org.apache.spark.sql.expressions.Window.partitionBy("x")
    val Wy = org.apache.spark.sql.expressions.Window.partitionBy("y")
    val cells = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).as("c"))
    val joint = cells
      .crossJoin(broadcast(cells.agg(sum("c").as("n"))))
      .withColumn("cx", sum("c").over(Wx))
      .withColumn("cy", sum("c").over(Wy))
    joint
      .agg(
        max("n").as("n"),
        // H(X) from the joint rows: each (x,y) cell contributes its
        // share of x's marginal term — Σ_xy (c/cx)·(cx/n)·ln(n/cx)
        // = Σ_x (cx/n)·ln(n/cx); same for H(Y)
        sum(col("c") / col("n") * log(col("n") / col("cx"))).as("hx"),
        sum(col("c") / col("n") * log(col("n") / col("cy"))).as("hy"),
        sum(col("c") / col("n") *
          log(col("c") * col("n") / (col("cx") * col("cy")))).as("mi0"))
      .select(col("n"),
        round(col("hx"), 6).as("h_x"),
        round(col("hy"), 6).as("h_y"),
        round(col("mi0"), 6).as("mi"),
        when(col("hx") > 0 && col("hy") > 0,
          round(col("mi0") / sqrt(col("hx") * col("hy")), 6)).as("nmi"))
  }
}
