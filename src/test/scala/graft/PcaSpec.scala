package graft

import graft.ext.Pca

/** Distributed PCA: eigen-solver golden, planted-direction recovery,
  * orthonormality, explained-variance ordering, and the projection
  * expression vs a driver-side reference.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen: 2x2 golden [[2,1],[1,2]] -> eigenvalues {3,1}") {
    val (evals, evecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = evals.zip(evecs).sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-10)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-10)
    val v0 = pairs(0)._2
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-10)
    assert(math.abs(v0(0) - v0(1)) < 1e-10) // (1,1) direction
  }

  test("fit: recovers a planted dominant direction; components orthonormal") {
    // x_i = t·u + small orthogonal wiggle, u = (3,4)/5
    val u = Array(0.6, 0.8)
    val rows = (0 until 200).map { i =>
      val t = (i % 21) - 10.0           // spread along u
      val w = ((i % 7) - 3.0) * 0.05    // tiny spread along (-0.8, 0.6)
      Seq((t * u(0) - w * u(1)).toFloat, (t * u(1) + w * u(0)).toFloat)
    }.map(Tuple1(_)).toDF("v")
    val m = Pca.fit(rows, "v", k = 2)
    val c0 = m.components(0)
    // the wiggle index correlates weakly with t (both derive from i), so
    // the true principal axis sits ~1e-5 off u — tolerance reflects that
    assert(math.abs(math.abs(c0(0) * u(0) + c0(1) * u(1)) - 1.0) < 1e-4,
      s"first component ${c0.toSeq} should align with ${u.toSeq}")
    // orthonormal rows
    for (c <- m.components)
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    val dot01 = m.components(0).zip(m.components(1)).map(p => p._1 * p._2).sum
    assert(math.abs(dot01) < 1e-9)
    // variance ordering + explained variance sums to ~1 at k=d
    assert(m.eigenvalues(0) > m.eigenvalues(1))
    assert(math.abs(m.explainedVariance.sum - 1.0) < 1e-9)
    assert(m.explainedVariance(0) > 0.99) // the wiggle is tiny
  }

  test("transform: expression projection == driver-side arithmetic") {
    val data = Seq(Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 0.0f, -1.0f),
      Seq(0.5f, 0.5f, 0.5f), Seq(-2.0f, 1.0f, 0.0f))
    val df = data.map(Tuple1(_)).toDF("v")
    val m = Pca.fit(df, "v", k = 2)
    val got = Pca.transform(df, "v", m).select("pca")
      .as[Seq[Double]].collect()
    for ((xs, proj) <- data.zip(got); ki <- 0 until 2) {
      val expect = xs.zipWithIndex.map { case (x, j) =>
        (x - m.mean(j)) * m.components(ki)(j) }.sum
      assert(math.abs(proj(ki) - expect) < 1e-9, s"row $xs comp $ki")
    }
  }

  test("fit: deterministic across runs and partitionings") {
    val df = (0 until 300).map(i =>
      Seq((i % 13).toFloat, (i % 7).toFloat, (i % 3).toFloat))
      .map(Tuple1(_)).toDF("v")
    val a = Pca.fit(df.repartition(1), "v", 3)
    val b = Pca.fit(df.repartition(8), "v", 3)
    for (k <- 0 until 3) {
      assert(math.abs(a.eigenvalues(k) - b.eigenvalues(k)) < 1e-8)
      val dot = a.components(k).zip(b.components(k)).map(p => p._1 * p._2).sum
      assert(math.abs(dot - 1.0) < 1e-6, s"component $k flipped/rotated")
    }
  }

  test("fit: ragged vectors and bad k fail loudly") {
    val ragged = Seq(Seq(1.0f, 2.0f), Seq(1.0f)).map(Tuple1(_)).toDF("v")
    intercept[Exception](Pca.fit(ragged, "v", 1))
    val ok = Seq(Seq(1.0f, 2.0f), Seq(2.0f, 1.0f)).map(Tuple1(_)).toDF("v")
    intercept[IllegalArgumentException](Pca.fit(ok, "v", 3))
  }
}
