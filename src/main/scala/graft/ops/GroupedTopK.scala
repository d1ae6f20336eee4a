package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Per-group top-k as a typed `Aggregator` with a BOUNDED heap (SURVEY
  * §2.11's `Aggregator[IN, BoundedPQ, Seq]`): each partial aggregation
  * state holds at most k entries, so map-side combine ships O(k) per group
  * per partition instead of every row — the difference between a grouped
  * top-k and a full sort-per-group at 100 TB.
  *
  * Ordering is (score DESC, id ASC): the deterministic tie-break keeps
  * results reproducible and oracle-comparable (matches the SQL
  * row_number() OVER (ORDER BY score DESC, id) formulation exactly).
  */
case class ScoredRow(key: String, score: Double, id: Long)

/** Array-backed bounded binary heap ordered worst-at-root under the
  * (score DESC, id ASC) ranking, so the two hot operations are true heap
  * ops: reject-below-root is O(1) — the overwhelmingly common case once
  * the heap fills — and accept is one sift, O(log k). (A sort-per-insert
  * list is O(k log k) per element; at k=100 that difference is the whole
  * point of a bounded structure.)
  */
final class BoundedTopK(val k: Int) extends Serializable {
  require(k >= 1, s"top-k needs k >= 1, got $k") // k=0 would index an empty heap
  private val scores = new Array[Double](k)
  private val ids = new Array[Long](k)
  private var n = 0

  /** true iff (sa, ia) ranks WORSE than (sb, ib) under (score DESC, id ASC). */
  private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean =
    sa < sb || (sa == sb && ia > ib)

  private def swap(i: Int, j: Int): Unit = {
    val s = scores(i); scores(i) = scores(j); scores(j) = s
    val d = ids(i); ids(i) = ids(j); ids(j) = d
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (worse(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = l + 1
      var w = i
      if (l < n && worse(scores(l), ids(l), scores(w), ids(w))) w = l
      if (r < n && worse(scores(r), ids(r), scores(w), ids(w))) w = r
      if (w == i) done = true
      else { swap(i, w); i = w }
    }
  }

  def insert(s: Double, id: Long): this.type = {
    if (n < k) {
      scores(n) = s; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, id)) {
      scores(0) = s; ids(0) = id
      siftDown(0)
    }
    this
  }

  def mergeFrom(o: BoundedTopK): this.type = {
    var i = 0
    while (i < o.n) { insert(o.scores(i), o.ids(i)); i += 1 }
    this
  }

  def sorted: Seq[(Double, Long)] =
    (0 until n).map(i => (scores(i), ids(i))).sortBy(t => (-t._1, t._2))
}

class TopKAggregator(k: Int)
    extends Aggregator[ScoredRow, BoundedTopK, Seq[(Double, Long)]] {

  override def zero: BoundedTopK = new BoundedTopK(k)
  override def reduce(b: BoundedTopK, a: ScoredRow): BoundedTopK =
    b.insert(a.score, a.id)
  override def merge(x: BoundedTopK, y: BoundedTopK): BoundedTopK =
    x.mergeFrom(y)
  override def finish(b: BoundedTopK): Seq[(Double, Long)] = b.sorted

  // kryo: the buffer is a mutable heap object held as-is within a
  // partition (ObjectHashAggregate); serialization happens only at the
  // shuffle boundary, where it ships O(k) entries.
  override def bufferEncoder: Encoder[BoundedTopK] = Encoders.kryo[BoundedTopK]
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
