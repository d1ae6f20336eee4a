package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Deterministic, leakage-safe train/val/test splitting.
  *
  * A naive row-level random split leaks: near-duplicate documents (or
  * pages from the same site, chunks of the same document, items of the
  * same dedup component) land on both sides of the train/eval boundary,
  * and eval scores measure memorization. The published fix is to assign
  * splits at the granularity of the LEAKAGE GROUP — dedup component id,
  * canonical URL/domain, source — so correlated rows move together.
  *
  * Assignment is a pure hash of the group key (md5 prefix vs cumulative
  * weight boundaries), which buys three properties a `rand()` split
  * cannot give:
  *  - deterministic across runs, partitionings, engines, and cluster
  *    sizes — the split is a FUNCTION of the data, reproducible anywhere
  *    (same idiom as the stratified sampler; md5 is engine-portable);
  *  - stable under corpus growth — adding documents never reassigns an
  *    existing group, so eval sets stay fixed as the corpus is re-built
  *    (the property that makes longitudinal eval comparisons valid);
  *  - map-side only — no shuffle, no state: a literal comparison chain
  *    along the scan.
  *
  * The first 8 md5 hex chars give 2^32 buckets; weight boundaries are
  * precomputed driver-side as 8-digit lowercase hex literals, and
  * equal-length lowercase hex compares lexicographically == numerically,
  * so the whole assignment is string comparisons that whole-stage
  * codegen inlines.
  */
object Splits {

  /** Validated cumulative (name, upperBoundHex) pairs; the LAST split is
    * the open tail (no boundary needed). Weights must be positive; they
    * are normalized, so (8, 1, 1) and (0.8, 0.1, 0.1) are the same.
    */
  private def boundaries(
      splits: Seq[(String, Double)]): Seq[(String, String)] = {
    require(splits.size >= 2, s"need >= 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0), s"weights must be > 0: $splits")
    require(splits.map(_._1).distinct.size == splits.size,
      s"duplicate split names: $splits")
    val total = splits.map(_._2).sum
    var cum = 0.0
    splits.init.map { case (name, w) =>
      cum += w / total
      // clamp: a cumulative weight that rounds to 1.0 would floor to
      // 2^32 = 9 hex chars, breaking the equal-length lexicographic
      // comparison (h < "100000000" is false for most hashes)
      val bound =
        math.min(math.floor(cum * 4294967296.0).toLong, 0xffffffffL)
      (name, f"$bound%08x")
    }
  }

  /** The split name for a key column, as a pure Column expression.
    * A NULL key fails loudly: null md5 would make every boundary
    * comparison null and silently route ALL null-keyed rows into the
    * tail split — inflating and contaminating the eval set is exactly
    * the failure this operator exists to prevent.
    */
  def splitFor(
      key: Column,
      splits: Seq[(String, Double)],
      seed: String = ""): Column = {
    val checked = when(key.isNotNull, key.cast("string"))
      .otherwise(raise_error(lit(
        "Splits: null group key — null-keyed rows would all land in the " +
          "tail split; assign a real group (or filter/quarantine nulls) " +
          "before splitting")))
    val h = substring(md5(concat(lit(seed + ":"), checked)), 1, 8)
    val tail = splits.last._1
    boundaries(splits).foldRight(lit(tail): Column) {
      case ((name, bound), elseC) => when(h < bound, name).otherwise(elseC)
    }
  }

  /** Assign every row a split by hashing `groupCol` — rows sharing a
    * group (dedup component, domain, source document) always land in the
    * SAME split, which is what makes the split leakage-safe. Adds a
    * `split` column; everything else passes through.
    */
  def assign(
      df: DataFrame,
      groupCol: String,
      splits: Seq[(String, Double)],
      seed: String = ""): DataFrame =
    df.withColumn("split", splitFor(col(groupCol), splits, seed))

  /** K-FOLD cross-validation assignment, leakage-safe and
    * deterministic: fold = the group key's md5-uniform 60-bit bucket
    * modulo k (the engine-portable hash idiom the weighted sampler and
    * [[splitFor]] share), so all rows of one leakage group land in one
    * fold, the assignment is a pure FUNCTION of the data (reproducible
    * across runs/partitionings/engines), corpus growth never
    * reassigns an existing group (longitudinal CV comparisons stay
    * valid), and the whole thing is one map-side expression — no
    * shuffle, no rand(). Fold f's eval set = fold f, train = the
    * rest. Null keys fail loudly, the [[splitFor]] posture. Adds an
    * int `fold` column in [0, k).
    */
  def kfold(
      df: DataFrame,
      groupCol: String,
      k: Int,
      seed: String = ""): DataFrame = {
    require(k >= 2, s"kfold: k must be >= 2, got $k")
    val key = col(groupCol)
    val checked = when(key.isNotNull, key.cast("string"))
      .otherwise(raise_error(lit(
        "Splits: null group key — null-keyed rows would all land in one " +
          "fold; assign a real group (or filter/quarantine nulls) " +
          "before splitting")))
    val h = conv(substring(md5(concat(lit(seed + ":"), checked)), 1, 15),
      16, 10).cast("long")
    df.withColumn("fold", pmod(h, lit(k)).cast("int"))
  }

  /** Temporal split with an EMBARGO gap — the time-series leakage
    * control: everything strictly before `trainEnd` trains, everything
    * at/after `evalStart` evaluates, and the (trainEnd, evalStart)
    * embargo window is EXCLUDED so features with lookback (rolling
    * windows, lagged joins, label horizons) cannot straddle the
    * boundary — a random or gap-less time split leaks the eval period
    * into any feature computed with a window. Null timestamps fail
    * loudly (same posture as splitFor: a silently-routed null row is a
    * contamination, not a convenience). Pure scan-level predicate —
    * partition-prunable when the table is date-partitioned.
    */
  def temporal(
      df: DataFrame,
      tsCol: String,
      trainEnd: Column,
      evalStart: Column): DataFrame = {
    val ts = when(col(tsCol).isNotNull, col(tsCol))
      .otherwise(raise_error(lit(
        "Splits.temporal: null timestamp — null-dated rows cannot be " +
          "placed on either side of the embargo; filter/repair them first")))
    df.withColumn("split",
      when(ts < trainEnd, "train")
        .when(ts >= evalStart, "eval")
        .otherwise("embargo"))
  }
}
