package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Sequence packing — assign documents to fixed token-budget
  * training sequences by the standard concat-and-split recipe: lay the
  * corpus out in a deterministic order, concatenate token counts, and
  * cut every `budget` tokens. Each document gets the pack that contains
  * its START offset plus the offset within that pack (documents may
  * straddle a boundary; the trainer's loader splits them — the
  * ASSIGNMENT is what the distributed engine must produce).
  *
  * The global running sum is the scale problem: a window over a global
  * ORDER BY collapses to ONE partition — the classic accidental
  * scale-killer. This implementation is the textbook distributed prefix
  * sum instead:
  *
  *  1. range-repartition by the order key, sort within partitions —
  *     partition i holds a contiguous key range, all ranges ordered;
  *  2. one tiny aggregate collects the per-partition token totals
  *     (O(partitions) rows to the driver — metadata, not data);
  *  3. the exclusive prefix of those totals broadcasts back, and each
  *     partition computes its local running sum in parallel, offset by
  *     its prefix.
  *
  * The result depends only on the ORDER KEY — not on the partition
  * count — so the same corpus packs identically on a laptop and a
  * 1000-executor cluster (asserted in PackerSpec), and the whole thing
  * restates as one window expression in DuckDB for the oracle
  * (`ext_pack_sequences`).
  */
object Packer {

  /** @param tokenCount Column producing the per-document token count
    *                   (e.g. TextAnalysis.tokenCount(col("text")))
    * @return (id, n_tokens, pack_id, pack_offset) — pack_id is the
    *         0-based sequence index containing the document's first
    *         token; pack_offset its position inside that sequence
    */
  def packBudget(
      df: DataFrame,
      idCol: String,
      tokenCount: Column,
      budget: Long): DataFrame = {
    require(budget >= 1, s"token budget must be >= 1, got $budget")
    val spark = df.sparkSession
    val reserved = Seq("__pid", "__cum", "__prefix")
    require(!df.columns.exists(reserved.contains),
      s"columns ${reserved.mkString("/")} are reserved by packBudget")

    val toks = df.select(col(idCol).as("id"), tokenCount.cast("long").as("n_tokens"))
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = toks
      .repartitionByRange(parts, col("id"))
      .sortWithinPartitions("id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pid must be identical in both passes

    // pass 1: per-partition totals — O(partitions) driver rows
    val partTotals = ranged.groupBy("__pid").agg(sum("n_tokens").as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefixByPid = {
      var acc = 0L
      (0 until parts).map { pid =>
        val p = pid -> acc
        acc += partTotals.getOrElse(pid, 0L)
        p
      }.toMap
    }
    // pass 2: parallel per-partition running sum + broadcast prefix.
    // The prefix lookup is one FLAT array literal indexed by partition
    // id — constant expression depth however many partitions the
    // cluster runs (a nested CASE chain here would grow with the
    // partition count and eventually trip codegen's method-size limit).
    val prefixExpr = element_at(
      array((0 until parts).map(pid => lit(prefixByPid(pid))): _*),
      col("__pid") + 1)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy("id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val start = sum(col("n_tokens")).over(w) + prefixExpr - col("n_tokens")
    ranged
      .withColumn("pack_id", floor(start / budget))
      .withColumn("pack_offset", start % budget)
      .select("id", "n_tokens", "pack_id", "pack_offset")
  }
}
