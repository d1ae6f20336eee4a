package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** [EXT] Distributed PCA over an embedding column — the dimensionality
  * stage of an embedding pipeline: whitening/rotation before PQ or
  * LSH (decorrelated subspaces quantize better), cheap-ANN projection
  * (search top-k' in k≪d dims, re-rank in full d), and the variance
  * diagnostics `EmbeddingDrift` reads at a glance.
  *
  * Architecture — the standard sufficient-statistics split, same as
  * `Regression`:
  *
  *  - ONE typed-Aggregator pass accumulates (n, Σx, upper-triangular
  *    Σxxᵀ) — a single d(d+3)/2-double buffer per partition with
  *    map-side combine, NOT d²/2 generated aggregate expressions (at
  *    d=64 that is 2 080 columns — past the point where codegen'd
  *    column-per-cell aggregation stops being the right tool; one
  *    fused array loop per row is).
  *  - The d×d eigen-solve is driver-side cyclic JACOBI on the model-
  *    sized covariance (deterministic fixed sweep order, no seed).
  *    Eigenpairs sort by eigenvalue desc (ties: first sweep order) and
  *    each component's SIGN is canonicalized (largest-|coordinate|
  *    entry made positive) so the model is reproducible run to run.
  *  - `transform` projects with literal component vectors inside one
  *    fused Column expression per output dim — scan-speed, no UDF on
  *    the hot path, broadcastable by construction (the model is
  *    query-plan metadata, k·d doubles).
  */
object Pca {

  final case class Model(
      mean: Array[Double],
      // k × d, orthonormal rows, variance-descending
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      totalVariance: Double) {
    def explainedVariance: Array[Double] =
      if (totalVariance <= 0) eigenvalues.map(_ => 0.0)
      else eigenvalues.map(_ / totalVariance)
  }

  /** (n, Σx, upper-tri Σxxᵀ) in one flat buffer. Public: the
    * java-serialization Encoder refuses non-public classes.
    */
  final case class MomentBuf(
      var n: Long, var sum: Array[Double], var m2: Array[Double])

  private class MomentAgg(d: Int)
      extends Aggregator[Seq[Float], MomentBuf, MomentBuf] {
    def zero: MomentBuf =
      MomentBuf(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))
    def reduce(b: MomentBuf, xs: Seq[Float]): MomentBuf = {
      require(xs.length == d,
        s"PCA: ragged embedding — expected dim $d, got ${xs.length}")
      val x = new Array[Double](d)
      var i = 0
      while (i < d) { x(i) = xs(i); b.sum(i) += x(i); i += 1 }
      var idx = 0
      i = 0
      while (i < d) {
        var j = i
        while (j < d) { b.m2(idx) += x(i) * x(j); j += 1; idx += 1 }
        i += 1
      }
      b.n += 1; b
    }
    def merge(a: MomentBuf, b: MomentBuf): MomentBuf = {
      var i = 0
      while (i < a.sum.length) { a.sum(i) += b.sum(i); i += 1 }
      i = 0
      while (i < a.m2.length) { a.m2(i) += b.m2(i); i += 1 }
      a.n += b.n; a
    }
    def finish(r: MomentBuf): MomentBuf = r
    def bufferEncoder: Encoder[MomentBuf] = Encoders.javaSerialization[MomentBuf]
    def outputEncoder: Encoder[MomentBuf] = Encoders.javaSerialization[MomentBuf]
  }

  /** Cyclic Jacobi eigen-decomposition of a symmetric matrix (driver-
    * side, model-sized). Returns (eigenvalues, eigenvectors as rows),
    * unsorted. Deterministic: fixed sweep order, fixed tolerance.
    */
  private[graft] def jacobiEigen(
      a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) off += a(p)(q) * a(p)(q)
      if (off > 1e-12) {
        for (p <- 0 until d; q <- p + 1 until d) if (math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          val t = math.signum(theta) /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case x   => x
            }
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until d) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)),
      Array.tabulate(d)(j => Array.tabulate(d)(i => v(i)(j)))) // rows = vectors
  }

  /** Fit a k-component model: one distributed moments pass + driver
    * eigen-solve of the (population) covariance.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Model = {
    val spark = df.sparkSession
    import spark.implicits._
    val dims = df.select(size(col(vecCol))).limit(1).as[Int].collect()
    require(dims.nonEmpty, "PCA over an empty corpus")
    val d = dims.head
    require(k >= 1 && k <= d, s"PCA: k=$k out of range 1..$d")
    val buf = df.select(col(vecCol).as[Seq[Float]])
      .select(new MomentAgg(d).toColumn).head()
    val n = buf.n.toDouble
    require(buf.n >= 2, s"PCA needs >= 2 vectors, got ${buf.n}")
    val mean = buf.sum.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var idx = 0
    for (i <- 0 until d; j <- i until d) {
      val c = buf.m2(idx) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c; idx += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val top = order.take(k)
    val comps = top.map { i =>
      val vec = evecs(i)
      // canonical sign: the largest-|coordinate| entry is positive
      val m = vec.indices.maxBy(j => (math.abs(vec(j)), -j))
      if (vec(m) < 0) vec.map(-_) else vec.clone()
    }.toArray
    Model(mean, comps, top.map(i => math.max(evals(i), 0.0)).toArray,
      math.max(evals.map(math.max(_, 0.0)).sum, 0.0))
  }

  /** Projection of one literal component: Σ_j (x_j − mean_j)·w_j as a
    * fused higher-order-function expression (no UDF).
    */
  private def projectOne(vec: Column, mean: Array[Double],
      w: Array[Double]): Column = {
    val terms = zip_with(vec,
      zip_with(lit(mean), lit(w), (m, ww) => struct(m.as("m"), ww.as("w"))),
      (x, mw) => (x - mw.getField("m")) * mw.getField("w"))
    aggregate(terms, lit(0.0), (acc, t) => acc + t)
  }

  /** Append `outCol` = array<double> of the k projections. Ragged or
    * null input vectors fail LOUDLY (fit rejects the same rows, so a
    * dim mismatch at serving time is data drift — zip_with would
    * otherwise null-pad silently and emit null components).
    */
  def transform(df: DataFrame, vecCol: String, model: Model,
      outCol: String = "pca"): DataFrame = {
    val d = model.mean.length
    val proj = array(model.components.toIndexedSeq.map(w =>
      projectOne(col(vecCol), model.mean, w)): _*)
    df.withColumn(outCol,
      when(size(col(vecCol)) === d, proj).otherwise(raise_error(concat(
        lit(s"Pca.transform: expected dim $d, got vector of size "),
        coalesce(size(col(vecCol)).cast("string"), lit("null"))))))
  }
}
