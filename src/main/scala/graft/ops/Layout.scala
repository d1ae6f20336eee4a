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
    * bounded-rank substitute (one shared agg computes the bounds; a
    * skew-robust variant would use quantile cutpoints — same z-code
    * downstream). Degenerate constant columns map to 0.
    */
  private def normalized(c: String, lo: Double, hi: Double, bits: Int): Column = {
    val top = (1L << bits) - 1
    val scale = if (hi > lo) top / (hi - lo) else 0.0
    least(
      greatest(((col(c).cast("double") - lit(lo)) * lit(scale)).cast("long"),
        lit(0L)),
      lit(top))
  }

  /** Write `df` z-order-clustered on `cols` into ~`numFiles` files:
    * one bounds agg (2 scalars per key column — never a data collect),
    * then range-repartition + in-partition sort on the z-code. The
    * helper column is projected away before the write, so the layout is
    * invisible to readers except through the file statistics it
    * tightens. Rows with a NULL key sort first deterministically (null
    * casts to 0 after the greatest/least clamp chain is bypassed —
    * zValue treats null bits as null, so the z-code is null and Spark
    * ranges nulls first).
    */
  def zOrderWrite(
      df: DataFrame,
      path: String,
      cols: Seq[String],
      bits: Int = 12,
      numFiles: Int = 16): Unit = {
    require(cols.nonEmpty, "zOrderWrite needs at least one cluster column")
    val exprs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"lo_$c"),
      max(col(c).cast("double")).as(s"hi_$c")))
    val bounds = df.agg(exprs.head, exprs.tail: _*).head()
    val normed = cols.zipWithIndex.map { case (c, i) =>
      if (bounds.isNullAt(2 * i)) lit(0L) // all-null column: constant
      else normalized(c, bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1),
        bits)
    }
    df.withColumn("__z", zValue(normed, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
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
