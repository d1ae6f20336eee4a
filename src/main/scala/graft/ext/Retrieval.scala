package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Retrieval-list fusion: reciprocal-rank fusion (RRF) of multiple
  * ranked candidate lists — the standard way hybrid search combines the
  * lexical (BM25) and embedding (cosine top-k) halves without score
  * calibration, since 1/(c + rank) only consumes positions.
  *
  * Scale shape: fusion runs over RETRIEVED lists (k rows each), not the
  * corpus — unions of O(Σk) rows, one tiny aggregation. The ranking
  * helper windows over a retrieved list, so its single-partition window
  * touches k rows, never data.
  */
object Retrieval {

  /** Attach 1-based ranks to a retrieved list by (scoreCol desc, id asc)
    * — the deterministic rank every fusion consumer needs. Input is a
    * RETRIEVED list (top-k of some ranker): the window is O(k).
    */
  def ranked(df: DataFrame, idCol: String, scoreCol: String): DataFrame =
    df.withColumn("rank", row_number().over(
      Window.orderBy(col(scoreCol).desc, col(idCol).asc)))
      .select(col(idCol), col("rank"))

  /** Fuse pre-ranked lists: score(id) = Σ_lists 1/(c + rank_list(id)),
    * top-k by fused score (ties by id). Ids absent from a list simply
    * contribute nothing — no outer-join scaffolding.
    */
  def rrf(
      lists: Seq[DataFrame],
      idCol: String,
      k: Int,
      c: Double = 60.0): DataFrame = {
    require(lists.nonEmpty, "RRF needs at least one ranked list")
    lists
      .map(_.select(col(idCol),
        (lit(1.0) / (lit(c) + col("rank"))).as("__contrib")))
      .reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(round(sum("__contrib"), 6).as("rrf_score"),
        count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(k)
  }
}
