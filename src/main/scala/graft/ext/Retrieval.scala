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

  /** Ranked-retrieval EVALUATION — the measurement half of the search
    * stack (pairing with `Eval` for classifiers): given a pre-`ranked`
    * list and the relevant-id set, one O(k + |relevant|) pass computes
    *
    *   recall@k  = |retrieved@k ∩ relevant| / |relevant|
    *   MRR       = 1 / rank of the first relevant hit (0 if none)
    *   nDCG@k    = Σ_hits 1/log2(rank+1)  /  Σ_{i<=min(k,|rel|)} 1/log2(i+1)
    *
    * (binary relevance). Exact, deterministic, engine-portable —
    * `ext_retrieval_metrics` is DuckDB-oracled. Both inputs are
    * retrieval-sized, never corpus-sized: the join is a broadcast of
    * the relevant set into the k-row list.
    */
  def metrics(rankedList: DataFrame, relevant: DataFrame,
      idCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val rel = relevant.select(col(idCol)).distinct()
    val nRel = rel.count()
    require(nRel > 0, "retrieval metrics need a non-empty relevant set")
    val hits = rankedList.filter(col("rank") <= k)
      .join(broadcast(rel), Seq(idCol), "left_semi")
    // ideal DCG: the best possible arrangement puts every relevant id
    // (up to k of them) at the top — a constant given (k, |relevant|)
    val idcg = (1 to math.min(k, nRel.toInt))
      .map(i => 1.0 / (math.log(i + 1.0) / math.log(2.0))).sum
    hits.agg(
        count(lit(1)).as("n_hits"),
        coalesce(min("rank"), lit(0L)).as("first_rank"),
        coalesce(sum(lit(1.0) / log2(col("rank") + 1.0)), lit(0.0))
          .as("dcg"))
      .select(
        col("n_hits"),
        round(col("n_hits") / lit(nRel.toDouble), 6).as("recall_at_k"),
        when(col("first_rank") > 0,
          round(lit(1.0) / col("first_rank"), 6)).otherwise(0.0).as("mrr"),
        round(col("dcg") / lit(idcg), 6).as("ndcg_at_k"))
  }
}
