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

  test("ksStatistic: identical samples 0, disjoint 1, hand-computed middle") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).map(Tuple1(_)).toDF("v")
    val same = graft.ops.Drift.ksStatistic(a, a, "v").head
    assert((same.getLong(0), same.getLong(1), same.getDouble(2)) ===
      ((4L, 4L, 0.0)))
    val b = Seq(10.0, 11.0).map(Tuple1(_)).toDF("v")
    assert(graft.ops.Drift.ksStatistic(a, b, "v").head.getDouble(2) === 1.0)
    // ref {1,2}, cur {2,3}: CDF gaps at v=1: |.5-0|=.5; v=2: |1-.5|=.5;
    // v=3: |1-1|=0 -> D=0.5
    val r = Seq(1.0, 2.0).map(Tuple1(_)).toDF("v")
    val c = Seq(2.0, 3.0).map(Tuple1(_)).toDF("v")
    assert(graft.ops.Drift.ksStatistic(r, c, "v").head.getDouble(2) === 0.5)
  }

  test("ksStatistic: empty side yields null ks, not a fake 0") {
    val a = Seq(1.0).map(Tuple1(_)).toDF("v")
    val row = graft.ops.Drift.ksStatistic(a, a.limit(0), "v").head
    assert(row.getLong(0) === 1L && row.getLong(1) === 0L && row.isNullAt(2))
  }

  test("chiSquare: proportional mix ~0; hand-computed shift; new category") {
    val ref = (Seq.fill(60)("a") ++ Seq.fill(40)("b")).map(Tuple1(_)).toDF("k")
    val curSame = (Seq.fill(30)("a") ++ Seq.fill(20)("b")).map(Tuple1(_)).toDF("k")
    assert(graft.ops.Drift.chiSquare(ref, curSame, "k").head.getDouble(1) === 0.0)
    // shifted: cur = 10 a, 40 b over ref 60/40 -> e_a=30, e_b=20
    // chi2 = (10-30)^2/30 + (40-20)^2/20 = 400/30 + 400/20 = 33.333333
    val curShift = (Seq.fill(10)("a") ++ Seq.fill(40)("b")).map(Tuple1(_)).toDF("k")
    assert(graft.ops.Drift.chiSquare(ref, curShift, "k").head.getDouble(1) ===
      33.333333)
    // a category the reference never saw flows through the eps floor
    val curNew = (Seq.fill(25)("a") ++ Seq.fill(25)("z")).map(Tuple1(_)).toDF("k")
    val r = graft.ops.Drift.chiSquare(ref, curNew, "k").head
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) > 100.0, s"novel category must alarm: $r")
  }
}
