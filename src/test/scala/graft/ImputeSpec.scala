package graft

import org.apache.spark.sql.functions._
import graft.ops.Impute

/** Imputation semantics the cross-engine gate (`impute_mean_median`)
  * doesn't isolate: NaN-as-missing, the fit/apply split (train
  * statistics applied to serving data), zero strategy, and the
  * all-null loud reject.
  */
class ImputeSpec extends SparkSpec {
  import spark.implicits._

  test("impute: mean/median/zero goldens, NaN counts as missing") {
    val df = Seq(
      (1L, Some(2.0), Some(10.0)),
      (2L, None, Some(20.0)),
      (3L, Some(4.0), None),
      (4L, Some(Double.NaN), Some(30.0))).toDF("id", "a", "b")
    val (filled, fills) = Impute.fillWith(df,
      Seq("a" -> "mean", "b" -> "median"))
    // mean(a) over {2, 4} = 3 (NaN excluded); median(b) over {10,20,30}
    assert(fills == Map("a" -> 3.0, "b" -> 20.0), s"fills $fills")
    val rows = filled.orderBy("id").collect()
    assert(rows.map(_.getDouble(1)).toSeq == Seq(2.0, 3.0, 4.0, 3.0))
    assert(rows.map(_.getDouble(2)).toSeq == Seq(10.0, 20.0, 20.0, 30.0))

    val (zeroed, zf) = Impute.fillWith(df, Seq("a" -> "zero"))
    assert(zf == Map("a" -> 0.0))
    assert(zeroed.orderBy("id").collect().map(_.getDouble(1)).toSeq ==
      Seq(2.0, 0.0, 4.0, 0.0))
  }

  test("impute: median_approx tracks the exact median within the sketch bound") {
    // the scale escape hatch for high-cardinality columns (exact
    // percentile buffers O(distinct) values — see the scaladoc): on
    // 10k distinct doubles the GK sketch at accuracy 10000 must land
    // within its rank-error bound (n/accuracy = 1 rank ≈ 0.001 of the
    // value range here); exact equality is NOT asserted (the sketch
    // contract is rank error, not bit equality)
    val df = spark.range(1, 10001).selectExpr("CAST(id AS DOUBLE) AS x")
    val exact = Impute.fitFills(df, Seq("x" -> "median"))("x")
    val approx = Impute.fitFills(df, Seq("x" -> "median_approx"))("x")
    assert(math.abs(approx - exact) <= 10.0,
      s"approx median $approx vs exact $exact — outside the sketch bound")
    // NaN-as-missing holds on the approx path too
    val withNan = Seq(Some(1.0), Some(Double.NaN), Some(3.0), None)
      .toDF("x")
    val f = Impute.fitFills(withNan, Seq("x" -> "median_approx"))("x")
    assert(f >= 1.0 && f <= 3.0, s"NaN leaked into the approx sketch: $f")
  }

  test("impute: fit on train, apply to serving (leakage discipline)") {
    val train = Seq(Some(10.0), Some(20.0), None).toDF("x")
    val serve = Seq(Some(100.0), None).toDF("x")
    val fills = Impute.fitFills(train, Seq("x" -> "mean"))
    assert(fills("x") == 15.0)
    // the serving fill uses the TRAIN mean, never its own
    assert(Impute.fill(serve, fills).collect().map(_.getDouble(0)).toSet ==
      Set(100.0, 15.0))
  }

  test("impute: an all-null column fails loudly, never fills garbage") {
    val df = Seq[Option[Double]](None, None).toDF("x")
    val e = intercept[IllegalArgumentException] {
      Impute.fitFills(df, Seq("x" -> "mean"))
    }
    assert(e.getMessage.contains("entirely null"), e.getMessage)
  }
}
