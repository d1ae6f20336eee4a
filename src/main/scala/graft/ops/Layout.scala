package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout clustering — the DATA-LAYOUT lever
  * behind multi-column file skipping at 100 TB: parquet min/max footers
  * (and TxTable generation stats) prune a scan only when each file's
  * value range is TIGHT in the filtered column. A lexicographic sort
  * gives perfect pruning on the leading key and none on the rest; the
  * z-curve interleaves the keys' bits so every file covers a small
  * BOX in the multi-dimensional key space — range predicates on ANY
  * subset of the keys then skip most files (the technique behind
  * Delta/Iceberg OPTIMIZE ZORDER, built here from plain Columns).
  *
  * Scale shape: the code itself is pure bit arithmetic in the scan
  * (codegen'd, no UDF, no shuffle); the write is ONE range
  * repartition + in-partition sort — the same cost as any clustered
  * rewrite, paid once per compaction and amortized over every
  * subsequent pruned read.
  */
object Layout {

  /** The Morton code of `cols`: bit b of column i lands at interleaved
    * position b·k + i. Callers pass NON-NEGATIVE integer columns
    * already bounded below 2^bits (rank/modulo/linear-normalize first —
    * [[zOrderWrite]] does the linear form); bits·k ≤ 63 keeps the code
    * in a signed long. Pure Column arithmetic: shifts and masks,
    * whole-stage-codegen friendly, restatable in any SQL engine (the
    * `layout_zorder` oracle replays it bit for bit in DuckDB).
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1, "zValue needs at least one column")
    require(bits >= 1 && bits * k <= 63,
      s"bits * cols must fit a signed long: bits=$bits cols=$k")
    val terms = for {
      b <- 0 until bits
      i <- 0 until k
    } yield shiftleft(
      shiftright(cols(i).cast("long"), b).bitwiseAND(lit(1L)),
      b * k + i)
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear min-max normalization of `c` into [0, 2^bits): the cheap
    * bounded-rank substitute. Degenerate constant columns map to 0.
    * Skew caveat: ONE outlier stretches the range so every other row
    * collapses into a few low z-cells and the boxes degrade toward
    * lexicographic — pass such columns in `robustCols` to use quantile
    * cutpoints instead (equal-POPULATION bins, outlier-immune).
    */
  private def normalized(c: String, lo: Double, hi: Double, bits: Int): Column = {
    val top = (1L << bits) - 1
    val scale = if (hi > lo) top / (hi - lo) else 0.0
    least(
      greatest(((col(c).cast("double") - lit(lo)) * lit(scale)).cast("long"),
        lit(0L)),
      lit(top))
  }

  /** Quantile (equal-population) binning of `c` into [0, 2^bits): bin =
    * #cutpoints <= value, found by an UNROLLED binary search over the
    * literal cutpoint array — `bits` chained projections each doing one
    * lo/hi halving step (constant per-row work, whole-stage codegen'd,
    * no UDF; a naive count-scan over 2^bits cutpoints would be 4096×
    * the work per row, and an expression-nested search would blow up
    * the tree exponentially). NULL values converge to bin 0, matching
    * the min-max path's null posture. `mid` is clamped into the array
    * so ANSI `element_at` can never see an out-of-range index.
    */
  private[graft] def quantileBinned(
      df: DataFrame, c: String, cuts: Array[Double], bits: Int,
      outCol: String): DataFrame = {
    val arr = lit(cuts)
    val v = col(c).cast("double")
    val lo = s"__qlo_$c"
    val hi = s"__qhi_$c"
    var cur = df.withColumn(lo, lit(0)).withColumn(hi, lit(cuts.length))
    for (_ <- 0 until bits) {
      val mid = least((col(lo) + col(hi)) / 2, lit(cuts.length - 1))
        .cast("int")
      val below = element_at(arr, mid + 1) <= v
      cur = cur
        .withColumn(s"${lo}_n", when(below, mid + 1).otherwise(col(lo)))
        .withColumn(hi, when(below, col(hi)).otherwise(mid))
        .withColumn(lo, col(s"${lo}_n"))
        .drop(s"${lo}_n")
    }
    cur.withColumn(outCol, col(lo).cast("long")).drop(lo, hi)
  }

  /** Write `df` z-order-clustered on `cols` into ~`numFiles` files:
    * one bounds agg (2 scalars per min-max key column, one approximate
    * quantile sketch per `robustCols` column — never a data collect),
    * then range-repartition + in-partition sort on the z-code. The
    * helper columns are projected away before the write, so the layout
    * is invisible to readers except through the file statistics it
    * tightens. Rows with a NULL key clamp to bin 0 on that dimension
    * (greatest/least skip nulls, so the null passes the clamp chain as
    * 0 and the z-code is an ordinary long) — null rows interleave with
    * minimum-valued rows rather than sorting apart.
    *
    * `robustCols` selects per-column quantile-cutpoint normalization
    * (2^bits − 1 approx-percentile boundaries, same z-code downstream):
    * equal-population bins, so a 6-sigma outlier costs ONE z-cell
    * instead of compressing every normal row into a few cells the way
    * linear min-max does. Default remains min-max — it preserves value
    * GEOMETRY (a range predicate's selectivity maps linearly to z-cells)
    * and costs 2 scalars instead of a sketch.
    */
  def zOrderWrite(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      bits: Int = 12,
      numFiles: Int = 16,
      robustCols: Set[String] = Set.empty): Unit =
    zOrderStage(df, cols, bits, robustCols)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** The clustering stage of [[zOrderWrite]] without the write: one
    * bounds/sketch aggregate, then `df` plus a `__z` Morton-code helper
    * column (and nothing else). Callers that own their write path —
    * `TxTable.compactClustered`, `Maintenance.compactClustered` —
    * range-repartition + sort on `__z`, drop it, and commit through
    * their own machinery; the layout effect is identical.
    */
  def zOrderStage(
      df: DataFrame,
      cols: Seq[String],
      bits: Int = 12,
      robustCols: Set[String] = Set.empty): DataFrame = {
    require(cols.nonEmpty, "zOrderStage needs at least one cluster column")
    require(robustCols.subsetOf(cols.toSet),
      s"robustCols ${robustCols -- cols.toSet} not in cluster columns")
    require(!df.columns.contains("__z"),
      "column __z is reserved by the z-order stage")
    val nCuts = (1 << bits) - 1
    val probs = array((1 to nCuts).map(i =>
      lit(i.toDouble / (nCuts + 1))): _*)
    // ONE aggregate pass whatever the mix: min/max scalars for linear
    // columns, a percentile sketch for robust ones
    val exprs = cols.flatMap { c =>
      if (robustCols(c))
        Seq(approx_percentile(col(c).cast("double"), probs,
          lit(math.max(10000, 4 * nCuts))).as(s"cuts_$c"))
      else Seq(min(col(c).cast("double")).as(s"lo_$c"),
        max(col(c).cast("double")).as(s"hi_$c"))
    }
    val bounds = df.agg(exprs.head, exprs.tail: _*).head()
    var idx = 0
    var staged = df
    val normed = cols.map { c =>
      if (robustCols(c)) {
        val cuts =
          if (bounds.isNullAt(idx)) Array.empty[Double]
          else bounds.getSeq[Double](idx).toArray
        idx += 1
        if (cuts.isEmpty) lit(0L) // all-null column: constant
        else {
          staged = quantileBinned(staged, c, cuts, bits, s"__qbin_$c")
          col(s"__qbin_$c")
        }
      } else {
        val r =
          if (bounds.isNullAt(idx)) lit(0L) // all-null column: constant
          else normalized(c, bounds.getDouble(idx), bounds.getDouble(idx + 1),
            bits)
        idx += 2
        r
      }
    }
    staged.withColumn("__z", zValue(normed, bits))
      .drop(cols.filter(robustCols).map(c => s"__qbin_$c"): _*)
  }

  /** Per-file bounding boxes of `cols` over a written table — the
    * measurable layout quality: sum of normalized box volumes ≈ the
    * fraction of the key space a random point predicate cannot skip.
    * One aggregate grouped by file name; O(files) rows.
    */
  def fileBoxes(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"),
          max(col(c)).as(s"max_$c"))): _*)
}
