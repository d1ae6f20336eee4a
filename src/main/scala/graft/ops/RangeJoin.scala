package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned range join (point-in-interval): pairs every point row with the
  * interval rows whose `[lo, hi]` contains it. Spark plans a raw
  * inequality join as BroadcastNestedLoopJoin — O(|points| × |intervals|)
  * compares and a broadcast of a whole side, the classic 100 TB killer.
  * The binned form is how production interval joins are built:
  *
  *  - points land in bin `floor(p / binWidth)`;
  *  - each interval replicates to every bin it touches
  *    (`sequence(floor(lo/w), floor(hi/w))` exploded);
  *  - an ordinary shuffled EQUI-join on the bin meets each point only
  *    with intervals overlapping its bin, and the exact containment
  *    filter keeps true matches.
  *
  * Every matching pair meets EXACTLY once (the join is on the point's
  * single bin), so no distinct pass is needed. Cost scales with
  * bin co-occupancy, not the cross product; interval replication is
  * `span/binWidth + 1` rows, so `binWidth` should be of the order of a
  * typical interval span (replication stays O(1)) — hot bins beyond that
  * are ordinary join skew, handled by AQE like any exchange.
  *
  * Columns must be numeric (cast timestamps with `unix_timestamp` at the
  * call site); bounds are inclusive on both ends.
  */
object RangeJoin {

  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", floor(col(pointCol) / binWidth))
    val i = intervals
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin",
        explode(sequence(floor(col(loCol) / binWidth), floor(col(hiCol) / binWidth))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Interval × interval overlap join: pairs every `a` row with the `b`
    * rows whose `[bLo, bHi]` intersects its `[aLo, aHi]` (closed bounds).
    * Same binning as pointInInterval, but a pair can now co-occupy MANY
    * bins — the first-shared-bin condition
    * (`bin == max(firstBin(a), firstBin(b))`) emits each pair exactly
    * once without a distinct pass: overlapping intervals share the bin
    * range `[max(startBins), min(endBins)]`, whose first element is that
    * max. Column names of `a` and `b` must be disjoint.
    */
  def intervalOverlap(
      a: DataFrame,
      aLo: String,
      aHi: String,
      b: DataFrame,
      bLo: String,
      bHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val collisions = a.columns.toSet & b.columns.toSet
    require(collisions.isEmpty, s"column names must be disjoint: $collisions")
    val aBinned = a.filter(col(aLo) <= col(aHi)).withColumn("__bin",
      explode(sequence(floor(col(aLo) / binWidth), floor(col(aHi) / binWidth))))
    val bBinned = b.filter(col(bLo) <= col(bHi)).withColumn("__bin",
      explode(sequence(floor(col(bLo) / binWidth), floor(col(bHi) / binWidth))))
    aBinned.join(bBinned, Seq("__bin"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__bin") ===
        greatest(floor(col(aLo) / binWidth), floor(col(bLo) / binWidth)))
      .drop("__bin")
  }
}
