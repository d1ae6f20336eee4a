package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed GLOBAL running sums — the shared discipline behind every
  * cumulative computation here (KS CDFs in [[Drift.ksStatistic]], the
  * AUC rank sum in [[graft.ext.Eval.rocAuc]]); same recipe as
  * [[graft.ext.Packer.packBudget]]'s token prefix sum.
  *
  * A `Window.orderBy(k)` with no partition spec collapses the whole
  * input to ONE task — fine when the input is provably tiny, a
  * scale-killer when "O(distinct values)" of a CONTINUOUS column means
  * "O(rows)". This is the textbook replacement:
  *
  *  1. range-repartition by the order key and sort within partitions —
  *     partition i holds a contiguous key range, ranges ordered by i;
  *  2. one O(partitions)-row aggregate collects per-partition subtotals
  *     to the driver (metadata, not data);
  *  3. the exclusive prefix of those subtotals broadcasts back as a flat
  *     array literal indexed by partition id, and each partition
  *     computes its local running sum in parallel, offset by its prefix.
  *
  * The result depends only on the order key, never on the partition
  * count, so sf0.001 and a 1000-executor cluster agree bit-for-bit.
  */
object PrefixSum {

  /** Add one running-sum column per spec to `df`, ordered globally by
    * `orderCols`.
    *
    * @param specs (valueCol, outCol, inclusive) — valueCol must be LONG
    *              (exact integer arithmetic; doubles would make the sum
    *              order-dependent). `inclusive=true` sums rows up to and
    *              including the current one; `false` strictly before it
    *              (0 for the global first row).
    * @return (df + outCols, grand totals keyed by valueCol) — the
    *         totals come free from the pass-1 subtotals, sparing callers
    *         a second whole-input aggregate (or an unpartitioned
    *         unbounded window) just to get them.
    */
  def runningSums(
      df: DataFrame,
      orderCols: Seq[String],
      specs: Seq[(String, String, Boolean)]): (DataFrame, Map[String, Long]) = {
    require(orderCols.nonEmpty && specs.nonEmpty)
    require(!df.columns.contains("__pid"),
      "column __pid is reserved by PrefixSum.runningSums")
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ordCols = orderCols.map(col)
    val ranged = df
      .repartitionByRange(parts, ordCols: _*)
      .sortWithinPartitions(ordCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pid must be identical in both passes

    // pass 1: per-partition subtotals — O(partitions) driver rows
    val sumAggs = specs.map { case (v, _, _) => sum(col(v)).as(v) }
    val subtotals: Map[Int, IndexedSeq[Long]] = ranged
      .groupBy("__pid").agg(sumAggs.head, sumAggs.tail: _*)
      .collect()
      .map { r =>
        r.getInt(0) -> specs.indices
          .map(i => if (r.isNullAt(i + 1)) 0L else r.getLong(i + 1))
          .toIndexedSeq
      }.toMap
    val zero = IndexedSeq.fill(specs.size)(0L)
    val prefixes = Array.ofDim[IndexedSeq[Long]](parts)
    var acc = zero
    for (pid <- 0 until parts) {
      prefixes(pid) = acc
      val t = subtotals.getOrElse(pid, zero)
      acc = IndexedSeq.tabulate(specs.size)(j => acc(j) + t(j))
    }
    val totals = specs.map(_._1).zip(acc).toMap

    // pass 2: parallel partition-local running sums + broadcast prefix.
    // Flat array literal indexed by pid — constant expression depth at
    // any partition count (a CASE chain would grow with the cluster).
    val w = Window.partitionBy("__pid").orderBy(ordCols: _*)
    val out = specs.zipWithIndex.foldLeft(ranged) {
      case (d, ((v, o, inclusive), i)) =>
        val frame =
          if (inclusive) w.rowsBetween(Window.unboundedPreceding, 0)
          else w.rowsBetween(Window.unboundedPreceding, -1)
        val prefix = element_at(
          array((0 until parts).map(p => lit(prefixes(p)(i))): _*),
          col("__pid") + 1)
        d.withColumn(o, coalesce(sum(col(v)).over(frame), lit(0L)) + prefix)
    }
    (out.drop("__pid"), totals)
  }
}
