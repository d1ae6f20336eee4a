package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Contrastive TRAINING-TRIPLET mining from the near-dup pair
  * graph: every dedup pipeline here emits (id_a, id_b) near-duplicate
  * pairs, and those pairs are exactly the (anchor, positive) supervision
  * an embedding model trains on — what's missing is the NEGATIVE. This
  * operator adds it with the published in-batch-negatives recipe:
  * each pair's negative is another pair's positive, drawn by a
  * deterministic global rotation, then FILTERED against the pair graph
  * so an accidental true-neighbor never becomes a training negative
  * (the false-negative poison of naive in-batch sampling).
  *
  * Everything is rank arithmetic + anti-join — no randomness, no seed,
  * so the output is engine-portable and `ext_triplets` is DuckDB-oracled
  * end-to-end.
  *
  * Scale shape: pair lists at corpus scale are themselves billions of
  * rows, so the global rotation must NOT be a single-partition window.
  * It is computed distributed while keeping the exact global-order
  * semantics the oracle states: range-partition by (anchor, positive)
  * and `lead` WITHIN each partition (parallel), then stitch the one
  * boundary row per partition — whose successor lives in the next
  * partition — from the per-partition FIRST rows, an O(partitions)
  * driver-side list broadcast back as a flat array literal (the same
  * subtotal-to-driver discipline as [[graft.ops.PrefixSum]]). The global
  * last row wraps to the global first positive, exactly the old
  * `first_value` semantics. The safety filter is one anti-join of
  * candidates against the same pair list.
  */
object Triplets {

  /** (anchor, positive, negative) from near-dup `pairs` (id_a, id_b).
    * Negative = the positive of the NEXT pair in (id_a, id_b) order
    * (wrapping), dropped when it collides with the anchor/positive or
    * is itself a known neighbor of the anchor (either orientation).
    */
  def inBatchTriplets(pairs0: DataFrame): DataFrame = {
    // consumed three times (rotation + both edge orientations): checkpoint
    // so an expensive upstream pair generator runs ONCE, and the anti-join
    // provably sees the same pair set the rotation used
    val pairs = pairs0.select("id_a", "id_b").localCheckpoint(false)
    val p = pairs.select(col("id_a").as("anchor"), col("id_b").as("positive"))
    val spark = pairs.sparkSession
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = p
      .repartitionByRange(parts, col("anchor"), col("positive"))
      .sortWithinPartitions("anchor", "positive")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pid must be identical in both passes

    // pass 1: each partition's FIRST (anchor, positive) — the struct min
    // under the same lexicographic order the range partitioning uses.
    // O(partitions) driver rows: metadata, not data.
    val firsts = ranged.groupBy("__pid")
      .agg(min(struct(col("anchor"), col("positive"))).as("f"))
      .select(col("__pid"), col("f").getField("positive").as("fp"))
      .collect()
      .map(r => r.getInt(0) -> r.get(1))
      .sortBy(_._1)
    if (firsts.isEmpty) {
      // no pairs → no triplets, with the full output schema intact
      return p.withColumn("negative", col("positive"))
        .select("anchor", "positive", "negative")
    }

    // successor of partition i's LAST row = first positive of the next
    // NON-EMPTY partition; the global last row wraps to the global first
    val fps = firsts.map(_._2)
    val nextFirst: Map[Int, Any] = firsts.map(_._1).zipWithIndex.map {
      case (pid, i) => pid -> fps((i + 1) % fps.length)
    }.toMap
    // flat array literal indexed by pid (empty partitions never evaluate
    // their slot — any placeholder keeps the array total)
    val boundary = element_at(
      array((0 until parts).map(pid =>
        lit(nextFirst.getOrElse(pid, fps(0)))): _*),
      col("__pid") + 1)

    // pass 2: parallel partition-local lead; only each partition's last
    // row falls through to the stitched boundary value
    val w = Window.partitionBy("__pid").orderBy("anchor", "positive")
    val rotated = ranged
      .withColumn("negative", coalesce(lead("positive", 1).over(w), boundary))
    // never train against yourself…
    val noSelf = rotated.filter(
      col("negative") =!= col("anchor") && col("negative") =!= col("positive"))
    // …or against a true neighbor (either pair orientation)
    val edges = pairs.select(col("id_a").as("e_a"), col("id_b").as("e_b"))
      .unionByName(pairs.select(col("id_b").as("e_a"), col("id_a").as("e_b")))
    noSelf.join(edges,
        col("anchor") === col("e_a") && col("negative") === col("e_b"),
        "left_anti")
      .select("anchor", "positive", "negative")
  }
}
