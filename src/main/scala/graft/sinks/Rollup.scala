package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental aggregate-table maintenance: a persistent rollup (count +
  * sums per group) updated from delta batches in O(delta) — never by
  * rescanning history. The batch-cadence generalization of the
  * reference's per-run accounting (K9 counts, F5 delta window): each run
  * folds its delta into the standing aggregate instead of recomputing
  * the aggregate over all history, which is the difference between a
  * maintenance job that reads a day and one that reads 100 TB.
  *
  * Only DISTRIBUTIVE aggregates are maintained (count, sum — min/max
  * would also qualify): stored partials merge by the SAME operation, so
  * `maintain(b1); maintain(b2)` is exactly `aggregate(b1 UNION b2)` —
  * the invariant the oracled `rollup_incremental` query proves against
  * DuckDB. Averages and other algebraic forms derive at read time
  * (sum/cnt); holistic aggregates (exact percentiles) need the sketch
  * path (ExtOpsSpec's t-digest/HLL/CMS family) instead.
  *
  * Scale shape: the delta is pre-aggregated (one map-combinable
  * shuffle), the standing table is read PARTITION-PRUNED to the groups
  * the delta touches (partition cols ⊆ group cols, same immutability
  * rule as Upsert), combined with one more small aggregation over
  * O(touched groups) rows, and committed with the partition-local
  * stage-aside swap — untouched partitions are never listed, read, or
  * rewritten. Shares MergeWrite/SwapUtil crash discipline (heal-first,
  * never delete-then-rename).
  */
object IncrementalRollup {

  /** @param groupCols   grouping key of the maintained rollup
    * @param sumCols     measure -> stored-column-alias pairs; each stored
    *                    column is `sum(measure)` (exact for integral or
    *                    integer-valued-double measures; floating sums
    *                    merge associatively only up to reordering)
    * @param partitionBy physical partition cols, must be group cols
    */
  def apply(
      spark: SparkSession,
      delta: DataFrame,
      targetPath: String,
      groupCols: Seq[String],
      sumCols: Seq[(String, String)],
      partitionBy: Seq[String] = Nil): Unit = {
    require(groupCols.nonEmpty, "IncrementalRollup needs group columns")
    require(partitionBy.forall(groupCols.contains),
      s"partition columns must be group columns: partitionBy=$partitionBy " +
        s"groupCols=$groupCols")
    val reserved = "cnt" +: sumCols.map(_._2)
    require(reserved.distinct.size == reserved.size &&
      !groupCols.exists(reserved.contains),
      s"stored-column aliases collide: $reserved vs $groupCols")

    val aggs = count(lit(1)).as("cnt") +:
      sumCols.map { case (m, a) => sum(col(m)).as(a) }
    val deltaAgg = delta
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)

    // heal a crashed previous swap BEFORE reading (see Upsert)
    val p0 = new Path(targetPath)
    SwapUtil.recoverUnder(
      p0.getFileSystem(spark.sparkContext.hadoopConfiguration), p0)

    if (!UpsertIgnore.targetExists(spark, targetPath)) {
      val w = deltaAgg.write.mode("overwrite")
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
        .parquet(targetPath)
      return
    }
    val existingAll =
      MergeWrite.readNoInference(spark, targetPath, partitionBy.nonEmpty)
    SchemaGuard.requireAligned(spark, deltaAgg, existingAll, partitionBy, targetPath)
    val existing = Upsert.prunedExisting(deltaAgg, existingAll, partitionBy)

    // partials merge by the same op: counts add, sums add
    val mergeAggs = sum(col("cnt")).as("cnt") +:
      sumCols.map { case (_, a) => sum(col(a)).as(a) }
    val combined = existing
      .unionByName(deltaAgg.select(existingAll.columns.toSeq.map(col): _*))
      .groupBy(groupCols.map(col): _*)
      .agg(mergeAggs.head, mergeAggs.tail: _*)
      .select(existingAll.columns.toSeq.map(col): _*)

    MergeWrite.commitStaged(spark, combined, targetPath, partitionBy,
      "IncrementalRollup")
  }
}
