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
  * Scale shape: all work is PAIR-GRAPH-sized, never corpus-sized — the
  * rotation is one window over the pair list (global order: a triplet
  * set is bounded by the dedup graph, orders of magnitude below the
  * corpus; for a pathological pair explosion, rotate within hash
  * buckets instead), and the safety filter is one broadcast-able
  * anti-join of candidates against the same pair list.
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
    val w = Window.orderBy("anchor", "positive")
    val rotated = p
      .withColumn("negative",
        coalesce(lead("positive", 1).over(w),
          first("positive").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))))
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
