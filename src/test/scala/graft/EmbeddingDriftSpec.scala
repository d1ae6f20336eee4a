package graft

import graft.ext.EmbeddingDrift

class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: Seq[Array[Float]]) =
    rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")

  test("identical populations: cosine 1, L2 0") {
    val a = vecs(Seq(Array(1f, 0f, 2f), Array(3f, 1f, 0f)))
    val (cos, l2, nr, nc) = EmbeddingDrift.centroidShift(a, a, "embedding")
    assert(math.abs(cos - 1.0) < 1e-12 && l2 < 1e-12 && nr === nc)
  }

  test("orthogonal centroid shift detected") {
    val ref = vecs(Seq(Array(1f, 0f), Array(1f, 0f)))
    val cur = vecs(Seq(Array(0f, 1f), Array(0f, 1f)))
    val (cos, l2, _, _) = EmbeddingDrift.centroidShift(ref, cur, "embedding")
    assert(math.abs(cos) < 1e-12)
    assert(math.abs(l2 - math.sqrt(2)) < 1e-12)
  }

  test("per-dim centroids are plain averages in dimension order") {
    val ref = vecs(Seq(Array(1f, 10f), Array(3f, 20f)))
    val cur = vecs(Seq(Array(5f, 40f)))
    val rows = EmbeddingDrift.perDimCentroids(ref, cur, "embedding")
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.toSeq === Seq((0, 2.0, 5.0), (1, 15.0, 40.0)))
  }

  test("dimension mismatch fails with a diagnosis, not an NPE") {
    val ref = vecs(Seq(Array(1f, 2f)))
    val cur = vecs(Seq(Array(1f, 2f, 3f)))
    val e = intercept[IllegalArgumentException] {
      EmbeddingDrift.centroidShift(ref, cur, "embedding")
    }
    assert(e.getMessage.contains("dimensionality"))
  }
}
