package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Distributed REGRESSION — linear (OLS/ridge) by one-pass normal
  * equations and logistic by fixed-schedule gradient descent — the
  * trainable-scorer tier between the closed-form Naive Bayes gate
  * (`Classifier`) and anything needing a real ML runtime. Published
  * pre-training pipelines use exactly this class of model for quality
  * gating (GPT-3's LR filter over WebText features); here it trains on
  * any numeric feature columns (`TextAnalysis` scores, embedding stats,
  * `Eval`-measured signals) without leaving the engine.
  *
  * Architecture (the 100 TB lens): there is NO per-row UDF and no UDAF —
  * every pass is ONE `agg` over GENERATED arithmetic columns
  * (sum(x_i·x_j), sum(x_i·residual)), so the heavy lifting is
  * whole-stage-codegen'd sums with map-side partial aggregation, and one
  * pass moves exactly k(k+3)/2+1 doubles per partition to the driver.
  * The k×k solve (Gaussian elimination, partial pivoting) is driver-side
  * on closed-form sufficient statistics — the standard split: data-sized
  * work distributed, model-sized work local.
  *
  *  - `fitLinear`: one corpus pass builds the Gram matrix X'X and X'y;
  *    ridge adds λI (never on the intercept). Exact closed form — no
  *    iteration, no learning rate, deterministic given the data.
  *  - `fitLogistic`: full-batch GD, `iters` passes; each pass broadcasts
  *    the current weights INTO the plan as literals (the gradient is a
  *    generated expression, recompiled per step — fine for the fixed
  *    small step counts a quality gate needs).
  *  - The first GD step from w=0 is LINEAR in the data
  *    (∇ = Σ x·(σ(0)−y) = Σ x·(0.5−y)), which is what makes
  *    `ext_logreg_step` SQL-restatable — the distributed gradient
  *    machinery itself is DuckDB-oracled, while full training is gated
  *    by RegressionSpec (convergence, separable-accuracy, AUC).
  */
object Regression {

  /** weights aligned to featureCols, intercept LAST. */
  final case class LinearModel(featureCols: Seq[String], weights: Array[Double]) {
    def predict: Column = Regression.dot(featureCols, weights)
  }

  private def dot(cols: Seq[String], w: Array[Double]): Column =
    (cols.zipWithIndex.map { case (c, i) => col(c) * lit(w(i)) } :+
      lit(w(cols.size))).reduce(_ + _)

  /** Solve Ax=b by Gaussian elimination with partial pivoting (A is the
    * small model-sized matrix — k ≤ tens; driver-side by design).
    */
  private[graft] def solve(a0: Array[Array[Double]], b0: Array[Double]): Array[Double] = {
    val n = b0.length
    val a = a0.map(_.clone()); val b = b0.clone()
    for (p <- 0 until n) {
      val piv = (p until n).maxBy(r => math.abs(a(r)(p)))
      require(math.abs(a(piv)(p)) > 1e-12,
        s"Regression.solve: singular normal matrix at pivot $p — " +
          "collinear/constant feature columns; drop one or add ridge")
      if (piv != p) { val t = a(p); a(p) = a(piv); a(piv) = t
        val tb = b(p); b(p) = b(piv); b(piv) = tb }
      for (r <- p + 1 until n) {
        val f = a(r)(p) / a(p)(p)
        if (f != 0.0) { for (c <- p until n) a(r)(c) -= f * a(p)(c); b(r) -= f * b(p) }
      }
    }
    val x = new Array[Double](n)
    for (p <- n - 1 to 0 by -1) {
      var s = b(p)
      for (c <- p + 1 until n) s -= a(p)(c) * x(c)
      x(p) = s / a(p)(p)
    }
    x
  }

  /** One-pass sufficient statistics: flat upper triangle of X'X
    * (intercept column folded in as a trailing constant-1 feature)
    * followed by X'y. Everything is a generated sum() — see object doc.
    */
  private def normalEq(df: DataFrame, labelCol: String,
      featureCols: Seq[String]): (Array[Array[Double]], Array[Double]) = {
    val k = featureCols.size + 1
    val f: Int => Column =
      i => if (i < featureCols.size) col(featureCols(i)) else lit(1.0)
    val gramExprs = for (i <- 0 until k; j <- i until k)
      yield sum(f(i) * f(j)).as(s"g_${i}_$j")
    val xtyExprs = (0 until k).map(i => sum(f(i) * col(labelCol)).as(s"b_$i"))
    // SQL sum() SKIPS null products, so a null feature would silently
    // drop its row from the statistics — count them and fail loudly
    val anyNull = (featureCols :+ labelCol)
      .map(c => col(c).isNull || isnan(col(c).cast("double")))
      .reduce(_ || _)
    val nullExpr = sum(when(anyNull, 1L).otherwise(0L)).as("bad")
    val allExprs = gramExprs ++ xtyExprs :+ nullExpr
    val row = df.agg(allExprs.head, allExprs.tail: _*).head()
    // sum() over an EMPTY frame is null — getLong on it would NPE with
    // an opaque message, so surface emptiness explicitly first (the
    // DataCard/Pca n > 0 discipline)
    require(!row.isNullAt(row.length - 1),
      "Regression: empty input — the sufficient statistics are undefined")
    require(row.getLong(row.length - 1) == 0L,
      s"Regression: ${row.getLong(row.length - 1)} rows carry null/NaN " +
        "features or label — null-reject or impute them first")
    require(!row.anyNull && !(0 until row.length - 1).exists(i =>
      row.getDouble(i).isNaN), "Regression: null/NaN in sufficient " +
      "statistics — null-reject or impute the feature/label columns first")
    val a = Array.ofDim[Double](k, k)
    var idx = 0
    for (i <- 0 until k; j <- i until k) {
      a(i)(j) = row.getDouble(idx); a(j)(i) = a(i)(j); idx += 1
    }
    (a, (0 until k).map(i => row.getDouble(idx + i)).toArray)
  }

  /** OLS / ridge by the normal equations — ONE distributed pass.
    * `ridge` (λ ≥ 0) is added to every diagonal except the intercept's.
    */
  def fitLinear(df: DataFrame, labelCol: String, featureCols: Seq[String],
      ridge: Double = 0.0): LinearModel = {
    require(featureCols.nonEmpty, "fitLinear: no feature columns")
    require(ridge >= 0, s"fitLinear: ridge must be >= 0, got $ridge")
    val (a, b) = normalEq(df, labelCol, featureCols)
    for (i <- featureCols.indices) a(i)(i) += ridge
    LinearModel(featureCols, solve(a, b))
  }

  /** R² of a fitted model on `df` — one aggregate pass (SS_res via the
    * prediction expression, SS_tot via the label moments).
    */
  def r2(df: DataFrame, labelCol: String, model: LinearModel): Double = {
    val res = col(labelCol) - model.predict
    val row = df.agg(
      sum(res * res).as("ssr"),
      sum(col(labelCol) * col(labelCol)).as("syy"),
      sum(col(labelCol)).as("sy"),
      count(lit(1)).as("n")).head()
    val sst = row.getDouble(1) - row.getDouble(2) * row.getDouble(2) / row.getLong(3)
    1.0 - row.getDouble(0) / sst
  }

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** The full-batch logistic gradient at `w` (feature order + intercept
    * last), (1/n)·Σ x·(σ(w·x)−y) + λ·w, as one generated-expression
    * aggregate pass. Exposed for the oracle query: at w=0 it is linear
    * in the data and therefore SQL-restatable.
    */
  def logisticGradient(df: DataFrame, labelCol: String,
      featureCols: Seq[String], w: Array[Double],
      ridge: Double = 0.0): Array[Double] = {
    val k = featureCols.size + 1
    require(w.length == k, s"weights must have ${k} entries (intercept last)")
    val f: Int => Column =
      i => if (i < featureCols.size) col(featureCols(i)) else lit(1.0)
    val err = sigmoid(dot(featureCols, w)) -
      when(col(labelCol), 1.0).otherwise(0.0)
    // same loud-null discipline as normalEq (sum() would silently skip)
    val anyNull = (featureCols.map(c => col(c).isNull ||
      isnan(col(c).cast("double"))) :+ col(labelCol).isNull).reduce(_ || _)
    val exprs = (0 until k).map(i => sum(f(i) * err).as(s"d_$i")) :+
      count(lit(1)).as("n") :+
      sum(when(anyNull, 1L).otherwise(0L)).as("bad")
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    // same empty-input guard as normalEq: sum() over nothing is null
    require(!row.isNullAt(k + 1),
      "Regression: empty input — the gradient is undefined")
    require(row.getLong(k + 1) == 0L,
      s"Regression: ${row.getLong(k + 1)} rows carry null/NaN features " +
        "or label — null-reject or impute them first")
    val n = row.getLong(k).toDouble
    Array.tabulate(k) { i =>
      row.getDouble(i) / n +
        (if (i < featureCols.size) ridge * w(i) else 0.0) // no reg on intercept
    }
  }

  /** Logistic regression by fixed-schedule full-batch gradient descent:
    * `iters` distributed passes, constant learning rate — deterministic
    * given (data, schedule), no sampling, no seed. Standardize features
    * first (see [[standardize]]) or convergence will be poor.
    */
  def fitLogistic(df: DataFrame, labelCol: String, featureCols: Seq[String],
      iters: Int = 100, lr: Double = 1.0, ridge: Double = 0.0): LinearModel = {
    require(iters >= 1 && lr > 0, s"fitLogistic: iters=$iters lr=$lr")
    val cached = df.select(
      (featureCols.map(col) :+ col(labelCol)): _*).localCheckpoint(true)
    var w = new Array[Double](featureCols.size + 1)
    for (_ <- 1 to iters) {
      val g = logisticGradient(cached, labelCol, featureCols, w, ridge)
      w = w.zip(g).map { case (wi, gi) => wi - lr * gi }
    }
    LinearModel(featureCols, w)
  }

  /** Score column of a logistic model: P(y=1|x) = σ(w·x). */
  def predictProba(model: LinearModel): Column = sigmoid(model.predict)

  /** Per-column (mean, stddev_pop) in one pass, and the standardized
    * frame ((x−μ)/σ; σ=0 → 0). Returns the params so serving applies
    * the exact training-time transform.
    */
  def standardize(df: DataFrame, cols: Seq[String])
      : (DataFrame, Map[String, (Double, Double)]) = {
    val exprs = cols.flatMap(c =>
      Seq(avg(col(c)).as(s"m_$c"), stddev_pop(col(c)).as(s"s_$c")))
    val row = df.agg(exprs.head, exprs.tail: _*).head()
    val params = cols.zipWithIndex.map { case (c, i) =>
      c -> (row.getDouble(2 * i), row.getDouble(2 * i + 1)) }.toMap
    val out = cols.foldLeft(df) { case (d, c) =>
      val (m, s) = params(c)
      d.withColumn(c, if (s == 0.0) lit(0.0) else (col(c) - m) / s)
    }
    (out, params)
  }
}
