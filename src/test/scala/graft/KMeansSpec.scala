package graft

import org.apache.spark.sql.functions._
import graft.ext.Similarity

/** Multi-round spherical k-means behavior the cross-engine oracle cannot
  * pin (`ext_kmeans_step` hash-matches exactly ONE Lloyd round — later
  * rounds assign against order-of-summation-sensitive centroids): empty-
  * cluster retention, assignment-objective monotonicity, and
  * partitioning-independence up to float accumulation noise.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  private def centroidMap(df: org.apache.spark.sql.DataFrame)
      : Map[Long, Array[Double]] =
    df.collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rows) =>
        val v = new Array[Double](rows.length)
        rows.foreach(r => v(r.getInt(1)) = r.getDouble(2))
        cid -> v
      }

  test("kmeans: a shadowed (duplicate-seed) centroid keeps its seed vector") {
    // vec 0 and vec 1 are identical: every point tying between them
    // assigns to the LOWER cid, so centroid 1 gets no members and must
    // come back unchanged after the round
    val df = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val cents = centroidMap(Similarity.kmeansCentroids(
      df, "vec_id", "embedding", k = 2, iters = 1)
      .select(col("cid"), col("pos").cast("int"), col("x")))
    assert(cents(1L).toSeq == Seq(1.0, 0.0), s"shadowed centroid ${cents(1L).toSeq}")
    // centroid 0 absorbed every vector (identical seeds tie everywhere,
    // lowest cid wins; vec 3 ties at cosine 0 to both): sum update
    // 1e-6 tolerance: the fixture is float-valued (0.9f widens to
    // 0.8999999762…), so the exact double sum sits ~2e-8 off the
    // decimal literal
    assert(math.abs(cents(0L)(0) - 2.9) < 1e-6 &&
      math.abs(cents(0L)(1) - 1.1) < 1e-6, s"trained ${cents(0L).toSeq}")
  }

  test("kmeans: mean best-cosine (assignment objective) never degrades with rounds") {
    val emb = Tables.embeddings(spark, dir)
    def objective(iters: Int): Double = {
      val cents = centroidMap(Similarity.kmeansCentroids(
        emb, "vec_id", "embedding", k = 8, iters = iters)
        .select(col("cid"), col("pos").cast("int"), col("x")))
        .values.toArray
      val vecs = emb.select(col("embedding").cast("array<double>"))
        .collect().map(_.getSeq[Double](0).toArray)
      def cos(a: Array[Double], b: Array[Double]): Double = {
        var d, na, nb = 0.0
        for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
        if (na > 0 && nb > 0) d / math.sqrt(na * nb) else -2.0
      }
      vecs.map(v => cents.map(c => cos(v, c)).max).sum / vecs.length
    }
    val o1 = objective(1)
    val o3 = objective(3)
    assert(o3 >= o1 - 1e-9, s"objective degraded: iters=1 $o1 -> iters=3 $o3")
  }

  test("kmeans: partitioning-independent up to accumulation noise") {
    val emb = Tables.embeddings(spark, dir)
    val a = centroidMap(Similarity.kmeansCentroids(
      emb.repartition(7), "vec_id", "embedding", k = 8, iters = 2)
      .select(col("cid"), col("pos").cast("int"), col("x")))
    val b = centroidMap(Similarity.kmeansCentroids(
      emb.repartition(2), "vec_id", "embedding", k = 8, iters = 2)
      .select(col("cid"), col("pos").cast("int"), col("x")))
    assert(a.keySet == b.keySet)
    val maxDiff = a.keySet.toSeq.flatMap { k =>
      a(k).zip(b(k)).map { case (x, y) => math.abs(x - y) }
    }.max
    assert(maxDiff < 1e-9, s"partitioning changed centroids by $maxDiff")
  }
}
