package graft

import graft.ext.{Eval, Regression}

/** Distributed regression: exact-recovery goldens for the normal-equation
  * path, ridge shrinkage, the solver's failure modes, and logistic
  * convergence/accuracy/AUC on separable data (full logistic training is
  * spec-gated here; its distributed gradient pass is DuckDB-oracled at
  * w=0 by ext_logreg_step).
  */
class RegressionSpec extends SparkSpec {
  import spark.implicits._

  test("fitLinear: exactly recovers a noiseless plane y = 2a - 3b + 5") {
    val df = (for (a <- 0 to 9; b <- 0 to 9)
      yield (a.toDouble, b.toDouble, 2.0 * a - 3.0 * b + 5.0))
      .toDF("a", "b", "y")
    val m = Regression.fitLinear(df, "y", Seq("a", "b"))
    assert(math.abs((m.weights(0)) - 2.0) < 1e-9)
    assert(math.abs((m.weights(1)) - -3.0) < 1e-9)
    assert(math.abs((m.weights(2)) - 5.0) < 1e-9)
    assert(math.abs((Regression.r2(df, "y", m)) - 1.0) < 1e-9)
  }

  test("fitLinear: ridge shrinks coefficients toward zero monotonically") {
    val df = (for (a <- 0 to 19) yield (a.toDouble, 3.0 * a + 1.0))
      .toDF("a", "y")
    val w0 = Regression.fitLinear(df, "y", Seq("a")).weights(0)
    val w1 = Regression.fitLinear(df, "y", Seq("a"), ridge = 10.0).weights(0)
    val w2 = Regression.fitLinear(df, "y", Seq("a"), ridge = 100.0).weights(0)
    assert(math.abs((w0) - 3.0) < 1e-9)
    assert(w1 < w0 && w2 < w1 && w2 > 0.0)
  }

  test("fitLinear: collinear features fail loudly, ridge rescues them") {
    val df = (for (a <- 0 to 9)
      yield (a.toDouble, 2.0 * a, 5.0 * a + 1.0)).toDF("a", "b", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.fitLinear(df, "y", Seq("a", "b"))
    }
    assert(e.getMessage.contains("singular"))
    val m = Regression.fitLinear(df, "y", Seq("a", "b"), ridge = 1e-3)
    // collinear ridge solution still predicts well even if weights split
    assert(Regression.r2(df, "y", m) > 0.999)
  }

  test("fitLinear: nulls in features fail loudly, not as silent zeros") {
    val df = Seq((Some(1.0), 2.0), (None, 4.0), (Some(3.0), 6.0))
      .toDF("a", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.fitLinear(df, "y", Seq("a"))
    }
    assert(e.getMessage.contains("null/NaN"))
  }

  test("fitLinear: boolean-ish NaN features fail loudly too") {
    val df = Seq((Double.NaN, 2.0), (1.0, 4.0)).toDF("a", "y")
    val e = intercept[IllegalArgumentException] {
      Regression.fitLinear(df, "y", Seq("a"))
    }
    assert(e.getMessage.contains("null/NaN"))
  }

  test("solve: partial pivoting handles a zero leading pivot") {
    val x = Regression.solve(
      Array(Array(0.0, 2.0), Array(1.0, 0.0)), Array(4.0, 3.0))
    assert(math.abs(x(0) - 3.0) < 1e-12 && math.abs(x(1) - 2.0) < 1e-12)
  }

  test("fitLogistic: separable 2-D data converges to 100% accuracy and AUC 1") {
    // class 1 in the upper-right cluster, class 0 lower-left, wide margin
    val pts = (for (i <- 0 until 40) yield {
      val y = i % 2 == 1
      val base = if (y) 2.0 else -2.0
      (base + (i % 5) * 0.1, base + (i % 7) * 0.1, y)
    }).toDF("f1", "f2", "y")
    val m = Regression.fitLogistic(pts, "y", Seq("f1", "f2"),
      iters = 60, lr = 1.0)
    val scored = pts.select(
      Regression.predictProba(m).as("p"), $"y")
    val acc = scored.filter(($"p" >= 0.5) === $"y").count() / 40.0
    assert(acc === 1.0)
    assert(Eval.rocAuc(scored, "p", "y").head.getDouble(2) === 1.0)
  }

  test("fitLogistic: ridge keeps separable weights bounded") {
    val pts = (for (i <- 0 until 20) yield {
      val y = i % 2 == 1
      (if (y) 3.0 else -3.0, y)
    }).toDF("f1", "y")
    val free = Regression.fitLogistic(pts, "y", Seq("f1"), iters = 200)
    val reg = Regression.fitLogistic(pts, "y", Seq("f1"), iters = 200,
      ridge = 0.1)
    assert(math.abs(reg.weights(0)) < math.abs(free.weights(0)))
    assert(reg.weights(0) > 0.0) // direction preserved
  }

  test("logisticGradient at w=0 is (1/n)·Σ x·(0.5−y) exactly") {
    val df = Seq((2.0, true), (4.0, false)).toDF("x", "y")
    val g = Regression.logisticGradient(df, "y", Seq("x"),
      w = Array(0.0, 0.0))
    // (2·(0.5−1) + 4·(0.5−0))/2 = 0.5 ; intercept: (−0.5+0.5)/2 = 0
    assert(math.abs((g(0)) - 0.5) < 1e-12)
    assert(math.abs((g(1)) - 0.0) < 1e-12)
  }

  test("standardize: exact moments, zero-variance column maps to 0") {
    val df = Seq((1.0, 7.0), (3.0, 7.0), (5.0, 7.0)).toDF("a", "c")
    val (out, params) = Regression.standardize(df, Seq("a", "c"))
    assert(math.abs((params("a")._1) - 3.0) < 1e-12)
    assert(params("c")._2 === 0.0)
    val rows = out.orderBy("a").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.map(_._2).forall(_ === 0.0))
    assert(rows.head._1 < 0 && rows.last._1 > 0)
    assert(math.abs(rows.map(_._1).sum) < 1e-12)
  }
}
