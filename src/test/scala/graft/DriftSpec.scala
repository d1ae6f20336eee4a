package graft

import graft.ops.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical distributions score ~0; a planted shift scores high") {
    val ref = (1 to 4000).map(i => (i % 100).toDouble).toDF("v")
    val same = (1 to 2000).map(i => (i % 100).toDouble).toDF("v")
    assert(math.abs(Drift.psi(ref, same, "v", 0, 100, 10)) < 1e-9)
    // shift: mass moves into the top decile
    val shifted = (1 to 2000).map(i => 90.0 + (i % 10)).toDF("v")
    assert(Drift.psi(ref, shifted, "v", 0, 100, 10) > 0.25)
  }

  test("psi: out-of-range values clamp into edge bins; empty bins stay finite") {
    val ref = Seq(-5.0, 0.0, 50.0, 99.0, 200.0).toDF("v")
    val cur = Seq(50.0, 50.0).toDF("v")
    val rows = Drift.psiFixedBins(ref, cur, "v", 0, 100, 4).collect()
    val bins = rows.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // -5 and 0 clamp to bin 0; 200 clamps to bin 3
    assert(bins(0L)._1 === 2L && bins(3L)._1 === 2L)
    assert(rows.forall(r => !r.getDouble(5).isNaN && !r.getDouble(5).isInfinite))
    val psi = Drift.psi(ref, cur, "v", 0, 100, 4)
    assert(!psi.isNaN && psi > 0)
  }

  test("psi: nulls are excluded, not binned; empty inputs score 0") {
    val ref = Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0)).toDF("v")
    val curWithNulls = Seq(Some(10.0), Some(20.0), Some(30.0), Some(40.0),
      None, None).toDF("v")
    // same observed distribution + nulls: drift must be ~0
    assert(math.abs(Drift.psi(ref, curWithNulls, "v", 0, 50, 5)) < 1e-9)
    val empty = Seq.empty[Option[Double]].toDF("v")
    assert(Drift.psi(empty, empty, "v", 0, 50, 5) === 0.0)
  }
}
