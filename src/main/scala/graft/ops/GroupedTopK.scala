package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Per-group top-k as a typed `Aggregator` with a BOUNDED buffer (SURVEY
  * §2.11's optional `Aggregator[IN, BoundedPQ, Seq]`): each partial
  * aggregation state holds at most k entries, so map-side combine ships
  * O(k) per group per partition instead of every row — the difference
  * between a grouped top-k and a full sort-per-group at 100 TB.
  *
  * Ordering is (score DESC, id ASC): the deterministic tie-break keeps
  * results reproducible and oracle-comparable (matches the SQL
  * row_number() OVER (ORDER BY score DESC, id) formulation exactly).
  */
case class ScoredRow(key: String, score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[ScoredRow, List[(Double, Long)], Seq[(Double, Long)]] {

  private def insert(e: (Double, Long), b: List[(Double, Long)]): List[(Double, Long)] =
    ((e :: b).sortBy(t => (-t._1, t._2))).take(k)

  override def zero: List[(Double, Long)] = Nil
  override def reduce(b: List[(Double, Long)], a: ScoredRow): List[(Double, Long)] =
    insert((a.score, a.id), b)
  override def merge(x: List[(Double, Long)], y: List[(Double, Long)]): List[(Double, Long)] =
    y.foldLeft(x)((acc, e) => insert(e, acc))
  override def finish(b: List[(Double, Long)]): Seq[(Double, Long)] = b

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    ExpressionEncoder[List[(Double, Long)]]()
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    ExpressionEncoder[Seq[(Double, Long)]]()
}

object GroupedTopK {
  /** Top-k rows per key by (scoreCol DESC, idCol ASC). */
  def apply(
      spark: SparkSession,
      df: DataFrame,
      keyCol: String,
      scoreCol: String,
      idCol: String,
      k: Int): DataFrame = {
    import spark.implicits._
    df.select(
        col(keyCol).cast("string").as("key"),
        col(scoreCol).cast("double").as("score"),
        col(idCol).cast("long").as("id"))
      .as[ScoredRow]
      .groupByKey(_.key)
      .agg(new TopKAggregator(k).toColumn.name("topk"))
      .flatMap { case (key, entries) => entries.map(e => (key, e._1, e._2)) }
      .toDF(keyCol, scoreCol, idCol)
  }
}
