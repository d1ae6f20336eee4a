package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Deterministic corpus shuffle + shard assignment: every training
  * run wants the corpus in a reproducible pseudo-random order, split
  * into equal shards — and re-derivable bit-for-bit on any engine, any
  * partitioning, any day (so a resumed or re-run job reads the same
  * shard contents). The order key is md5(salt:id): changing the salt
  * reshuffles (a new epoch), keeping it reproduces.
  *
  * The global position is the scale problem: `row_number() OVER (ORDER
  * BY key)` collapses to ONE partition. This is the same distributed
  * prefix sum as Packer/Mix: range-repartition on the key (partition i
  * holds a contiguous key range), O(partitions) per-partition counts to
  * the driver, parallel local ranks offset by the exclusive prefix.
  *
  * Shards are round-robin on position (shard = pos % numShards), so
  * shard sizes differ by at most one row and every shard is itself a
  * uniform sample of the corpus — the property epoch-sharded training
  * loaders rely on.
  */
object Shuffle {

  /** 0-based global position of every row in ascending (`key`, id)
    * order, via the distributed prefix sum: range-repartition on the
    * key (partition i holds a contiguous key range), O(partitions)
    * per-partition counts to the driver, parallel local ranks offset by
    * the exclusive prefix — never a single-partition global window.
    * Returns ((idCol, pos), total rows); the flat-array prefix literal
    * keeps expression depth constant at any partition count (the Packer
    * lesson).
    */
  private[ext] def positionByKey(
      df: DataFrame, idCol: String, key: Column): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df // key is evaluated against df's own columns
      .select(col(idCol).as("__id"), key.as("__k"))
      .repartitionByRange(parts, col("__k"), col("__id"))
      .sortWithinPartitions("__k", "__id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pid must be identical in both passes

    val partCounts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefixByPid = {
      var acc = 0L
      (0 until parts).map { pid =>
        val p = pid -> acc
        acc += partCounts.getOrElse(pid, 0L)
        p
      }.toMap
    }
    val total = partCounts.values.sum
    val prefixExpr = element_at(
      array((0 until parts).map(pid => lit(prefixByPid(pid))): _*),
      col("__pid") + 1)
    val w = Window.partitionBy("__pid").orderBy("__k", "__id")
    (ranged
      .withColumn("pos", prefixExpr + row_number().over(w) - 1)
      .select(col("__id").as(idCol), col("pos")), total)
  }

  /** @return (idCol, shard, pos): pos is the document's 0-based global
    *         position in the shuffled order, shard = pos % numShards.
    */
  def shuffleShard(
      df: DataFrame,
      idCol: String,
      salt: String,
      numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val (positioned, _) = positionByKey(df, idCol,
      md5(concat(lit(salt), lit(":"), col(idCol).cast("string"))))
    positioned.select(col(idCol),
      (col("pos") % numShards).as("shard"), col("pos"))
  }
}
