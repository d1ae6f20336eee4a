package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.broadcast

/** Shared takedown-tombstone fold for the durable dedup stores
  * (keyed / line / MinHash / substring / embedding).
  *
  * Every store's `forget` is an O(takedown) tombstone append: probes
  * anti-join the tombstone set, so forgotten owners stop blocking
  * immediately, but their rows — hashes, fingerprints, and in the
  * embedding store raw vectors or PQ codes — stay physically present,
  * and the per-probe anti-join broadcast grows with every takedown
  * forever. Compaction is the one moment the store is rewritten anyway,
  * so that is where the debt is settled: rewrite each table MINUS the
  * forgotten owners, then clear the tombstone set.
  *
  * Crash ordering: the tombstone dir is cleared LAST, after every table
  * rewrite committed. A crash after some rewrites leaves tombstones
  * that anti-join already-absent rows — a no-op — so probes stay
  * correct through every window, and the next fold converges. Each
  * individual table rewrite is atomic via Maintenance's stage-aside
  * swap (and healed by its `recover` on the next attempt).
  *
  * The anti-join keys are the tombstone frame's own columns (each
  * store's `forget` writes exactly its id column), so one helper serves
  * stores with different id column names.
  */
private[graft] object StoreTombstones {

  /** True only when `path` holds COMMITTED parquet data files (a
    * crashed append's `_temporary` dir alone must read as "no data" —
    * probing it would throw UNABLE_TO_INFER_SCHEMA).
    */
  private[graft] def hasData(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { f =>
      val n = f.getPath.getName
      f.isFile && n.endsWith(".parquet") && !n.startsWith("_") &&
        !n.startsWith(".")
    }
  }

  /** Compact every existing table under the store, folding the
    * tombstones at `forgottenPath` into each rewrite, then clear the
    * tombstone dir. Returns (files before, files after) summed over the
    * rewritten tables.
    */
  def foldAndCompact(
      spark: SparkSession,
      forgottenPath: String,
      tables: Seq[String],
      targetFileBytes: Long): (Int, Int) = {
    val present = tables.filter(hasData(spark, _))
    val tombstoned = hasData(spark, forgottenPath)
    val counts = present.map { t =>
      if (!tombstoned)
        graft.sinks.Maintenance.compact(spark, t, targetFileBytes)
      else {
        // read once per table (the fold runs inside the rewrite); the
        // tombstone set is takedown-sized, so it broadcasts
        val forgotten = spark.read.parquet(forgottenPath)
        val keys = forgotten.columns.toSeq
        graft.sinks.Maintenance.compactWith(spark, t, targetFileBytes,
          df => df.join(broadcast(forgotten.dropDuplicates(keys)),
            keys, "left_anti"))
      }
    }.foldLeft((0, 0)) { case ((a, b), (x, y)) => (a + x, b + y) }
    if (tombstoned) {
      val p = new Path(forgottenPath)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    counts
  }
}
