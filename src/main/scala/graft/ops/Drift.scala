package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift detection between two datasets (reference batch vs
  * current batch) — the data-quality gate a production feed runs before
  * trusting an ingest: Population Stability Index over a binned value
  * column. PSI = Σ (p_cur − p_ref) · ln(p_cur / p_ref); the working
  * convention is <0.1 stable, 0.1–0.25 drifting, >0.25 shifted.
  *
  * Scale shape: both sides are scanned ONCE through a single unioned
  * aggregation (tag + groupBy(bin) with conditional counts — one
  * map-combinable shuffle of O(bins) groups); proportions and
  * contributions are window math over the O(bins) result. Pure Column
  * expressions end to end — no UDF, no driver loop, restatable in SQL
  * (the oracle does exactly that).
  */
object Drift {

  /** THE clamped-binning expression — one definition shared by
    * psiFixedBins and binCounts, so the psiFromCounts == psi
    * equivalence the streaming monitor depends on is structural, not
    * copy-maintained.
    */
  private def binExpr(c: Column, lo: Double, hi: Double, nBins: Int): Column = {
    val w = (hi - lo) / nBins
    least(greatest(floor((c - lit(lo)) / lit(w)), lit(0.0)),
      lit((nBins - 1).toDouble)).cast("long")
  }

  /** Per-bin PSI report over fixed uniform bins [lo, hi) — edges are
    * caller-pinned so the report is reproducible across engines and
    * batches (quantile-derived edges belong to the sketch family; pin
    * them from `Kll.quantile` output when adaptive bins are wanted).
    * Out-of-range values clamp into the edge bins, so both tails are
    * visible rather than dropped.
    *
    * @return (bin, n_ref, n_cur, p_ref, p_cur, contrib) ordered by bin;
    *         PSI = sum(contrib). Proportions are epsilon-clamped so an
    *         empty bin contributes a large-but-finite term.
    */
  def psiFixedBins(
      ref: DataFrame,
      cur: DataFrame,
      valueCol: String,
      lo: Double,
      hi: Double,
      nBins: Int,
      eps: Double = 1e-6): DataFrame = {
    require(nBins > 0 && hi > lo, s"need hi > lo and bins > 0: [$lo,$hi) x$nBins")
    def bin(c: Column): Column = binExpr(c, lo, hi, nBins)
    // nulls are EXCLUDED on both sides: PSI compares distributions of
    // observed values; null-rate drift is a separate check (count the
    // nulls, don't let them silently deflate every real bin's share)
    val tagged = ref.filter(col(valueCol).isNotNull)
      .select(bin(col(valueCol)).as("bin"), lit("ref").as("side"))
      .unionByName(cur.filter(col(valueCol).isNotNull)
        .select(bin(col(valueCol)).as("bin"), lit("cur").as("side")))
    val counts = tagged
      .groupBy("bin")
      .agg(count(when(col("side") === "ref", 1)).as("n_ref"),
        count(when(col("side") === "cur", 1)).as("n_cur"))
    // totals via window over the O(bins) aggregate — no second scan
    val W = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    def clamped(n: Column, tot: Column): Column =
      greatest(n.cast("double") / tot, lit(eps))
    counts
      .withColumn("p_ref", clamped(col("n_ref"), sum("n_ref").over(W)))
      .withColumn("p_cur", clamped(col("n_cur"), sum("n_cur").over(W)))
      .withColumn("contrib",
        round((col("p_cur") - col("p_ref")) *
          log(col("p_cur") / col("p_ref")), 9))
      .withColumn("p_ref", round(col("p_ref"), 9))
      .withColumn("p_cur", round(col("p_cur"), 9))
      .orderBy("bin")
  }

  /** Scalar PSI (sum of contributions). Action. */
  def psi(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int): Double = {
    val r = psiFixedBins(ref, cur, valueCol, lo, hi, nBins)
      .agg(sum("contrib")).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0) // both sides empty = no drift signal
  }

  /** Two-sample KOLMOGOROV–SMIRNOV statistic D = max_x |F_ref(x) −
    * F_cur(x)| — the binning-free complement to PSI (PSI answers "how
    * much did the binned shape move", KS answers "how far apart are the
    * CDFs at the worst point", sensitive to location shifts PSI's fixed
    * bins can blur). Exact, not sampled.
    *
    * Scale shape: one map-combinable aggregate collapses both sides to
    * O(distinct values) rows (tagged union, conditional counts) — but
    * for a CONTINUOUS column distinct ≈ rows, so the CDFs over that
    * table are computed with [[PrefixSum.runningSums]] (range-partition
    * by value → per-partition subtotals → broadcast prefix →
    * partition-local cumulative), never an unpartitioned window. The
    * grand totals fall out of the subtotal pass for free. Returns one
    * row (n_ref, n_cur, ks round 6); ks null when either side is empty.
    */
  def ksStatistic(ref: DataFrame, cur: DataFrame,
      valueCol: String): DataFrame = {
    val tagged = ref.filter(col(valueCol).isNotNull)
      .select(col(valueCol).as("v"), lit(1L).as("r"), lit(0L).as("c"))
      .unionByName(cur.filter(col(valueCol).isNotNull)
        .select(col(valueCol).as("v"), lit(0L).as("r"), lit(1L).as("c")))
    val g = tagged.groupBy("v")
      .agg(sum("r").as("nr"), sum("c").as("nc"))
    val (cum, totals) = PrefixSum.runningSums(g, Seq("v"),
      Seq(("nr", "cr", true), ("nc", "cc", true)))
    val (tr, tc) = (totals("nr"), totals("nc"))
    val diff =
      if (tr > 0 && tc > 0)
        abs(col("cr") / lit(tr.toDouble) - col("cc") / lit(tc.toDouble))
      else lit(null).cast("double")
    cum.withColumn("diff", diff)
      .agg(round(max("diff"), 6).as("ks"))
      .select(lit(tr).as("n_ref"), lit(tc).as("n_cur"), col("ks"))
  }

  /** CHI-SQUARE drift over a CATEGORICAL column: Σ over observed
    * categories of (o_cur − e)² / e with e the expected count under the
    * reference proportions scaled to the current total. Categories with
    * zero reference mass contribute through an eps floor (new-category
    * drift is signal, not a division error). One map-combinable
    * aggregate to O(categories) rows; the side totals are a 1-row
    * aggregate broadcast back onto those rows (agg-and-broadcast — the
    * category shuffle is reused via ReuseExchange, and the plan carries
    * NO unpartitioned window, so a caller misfeeding a continuous
    * column degrades to a big-but-distributed aggregate instead of a
    * single-partition sort); the scalar fold is a final O(categories)
    * pass. Output: (n_categories, chi2 round 6), chi2 null when either
    * side is empty.
    */
  def chiSquare(ref: DataFrame, cur: DataFrame, catCol: String,
      eps: Double = 0.5): DataFrame = {
    val tagged = ref.filter(col(catCol).isNotNull)
      .select(col(catCol).as("k"), lit(1L).as("r"), lit(0L).as("c"))
      .unionByName(cur.filter(col(catCol).isNotNull)
        .select(col(catCol).as("k"), lit(0L).as("r"), lit(1L).as("c")))
    val counts = tagged.groupBy("k")
      .agg(sum("r").as("nr"), sum("c").as("nc"))
    counts
      .crossJoin(broadcast(
        counts.agg(sum("nr").as("tr"), sum("nc").as("tc"))))
      .withColumn("e", when(col("tr") > 0 && col("tc") > 0,
        // promote BEFORE the product: nr·tc in long arithmetic wraps
        // silently (ANSI off) once counts reach ~3e9 × 3e9 — real at
        // corpus scale; double loses only ulps there
        greatest(col("nr").cast("double") * col("tc") / col("tr"),
          lit(eps))))
      .withColumn("term", when(col("e").isNotNull,
        (col("nc") - col("e")) * (col("nc") - col("e")) / col("e")))
      .agg(count(lit(1)).as("n_categories"),
        round(sum("term"), 6).as("chi2"))
  }

  /** DENSE per-bin non-null counts (same clamped binning as
    * psiFixedBins) — the precomputable half of a PSI comparison. A
    * streaming monitor freezes the reference side as this array ONCE
    * and never rescans it per micro-batch (see
    * streaming.StreamingDrift); one O(bins) aggregate per call.
    */
  def binCounts(df: DataFrame, valueCol: String,
      lo: Double, hi: Double, nBins: Int): Array[Long] = {
    require(nBins > 0 && hi > lo, s"need hi > lo and bins > 0: [$lo,$hi) x$nBins")
    val b = binExpr(col(valueCol), lo, hi, nBins)
    val rows = df.filter(col(valueCol).isNotNull)
      .groupBy(b.as("bin")).agg(count(lit(1)).as("n"))
      .collect()
    val out = new Array[Long](nBins)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** PSI from two dense count arrays — identical arithmetic to the
    * DataFrame form (proportions over non-null totals, eps clamp; a bin
    * empty on BOTH sides contributes ln(eps/eps)=0, exactly as its
    * absence from psiFixedBins' sparse report does — asserted
    * equivalent in DriftSpec). Either side fully empty → 0.0 (no
    * signal), matching `psi`.
    */
  def psiFromCounts(refCounts: Array[Long], curCounts: Array[Long],
      eps: Double = 1e-6): Double = {
    require(refCounts.length == curCounts.length,
      s"bin mismatch: ${refCounts.length} vs ${curCounts.length}")
    val nr = refCounts.sum.toDouble
    val nc = curCounts.sum.toDouble
    if (nr == 0 || nc == 0) return 0.0
    refCounts.indices.map { i =>
      val p = math.max(refCounts(i) / nr, eps)
      val q = math.max(curCounts(i) / nc, eps)
      val c = (q - p) * math.log(q / p)
      // HALF_UP to match Spark/DuckDB round() exactly (rint is half-even)
      BigDecimal(c).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.sum
  }
}
