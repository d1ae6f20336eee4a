package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 merge: fold a new attribute snapshot
  * into a versioned dimension table, closing out changed rows and opening
  * new versions — the warehouse-standard history-preserving upsert, and
  * the natural extension of the reference's merge-overwrite sink
  * (etl/csv_loader.py:188-212 rewrites history wholesale; SCD2 keeps it).
  *
  * Row shape: key columns + attribute columns + `valid_from`/`valid_to`
  * (timestamp-ntz; `valid_to IS NULL` = current version).
  *
  * Scale shape: ONE equi-join of the open slice vs the snapshot on the
  * key (both sides hash-partition on the same key; closed history never
  * joins — it unions through untouched). No window, no collect. At 100 TB
  * the closed slice is the bulk of the table and moves zero bytes through
  * the shuffle.
  */
object Scd2 {

  /** @param dim       current dimension (versioned rows, open rows have
    *                  null valid_to)
    * @param snapshot  key + attribute columns as of `asOf`
    * @param keys      natural key columns
    * @param attrs     tracked attribute columns (a change in any opens a
    *                  new version)
    * @param asOfCol   literal timestamp column for the new version's
    *                  valid_from / the closed version's valid_to
    * @param validateKeys assert (one small aggregate each) that the
    *                  snapshot has at most one row per key and the dim at
    *                  most one OPEN row per key. A duplicated key would
    *                  fan out through the full_outer join into duplicate
    *                  close-outs and multiple simultaneously-open versions
    *                  — silent corruption of the open-row invariant, so
    *                  the default is to fail loudly up front. Disable only
    *                  when the caller has already enforced uniqueness.
    * @return the merged dimension (same schema as `dim`)
    */
  def merge(dim: DataFrame, snapshot: DataFrame, keys: Seq[String],
      attrs: Seq[String], asOfCol: Column,
      validateKeys: Boolean = true): DataFrame = {
    require(keys.nonEmpty, "SCD2 requires at least one key column")
    require(attrs.nonEmpty, "SCD2 requires at least one tracked attribute")
    if (validateKeys) {
      // struct() is never null, so count_distinct sees null keys too
      def dupCheck(df: DataFrame, what: String): Unit = {
        val r = df.agg(count(lit(1)).as("n"),
          count_distinct(struct(keys.map(col): _*)).as("d")).head()
        require(r.getLong(0) == r.getLong(1),
          s"Scd2.merge: $what has ${r.getLong(0) - r.getLong(1)} duplicate " +
            s"rows per key ${keys.mkString("(", ",", ")")} — dedup upstream " +
            "or pass validateKeys=false after enforcing uniqueness")
      }
      dupCheck(snapshot, "snapshot")
      // open-slice check restricted to the keys THIS snapshot touches: a
      // dup key outside the snapshot passes through untouched (no fan-out
      // through the join), so checking it would scan the whole dimension
      // for no merge-protection — this form is O(open rows matching the
      // batch), not O(dim), via a broadcastable snapshot-key semi-join
      val snapKeys = snapshot
        .select(keys.map(k => col(k).as(s"__s_$k")): _*).distinct()
      val touchCond = keys.map(k => col(k) <=> col(s"__s_$k")).reduce(_ && _)
      dupCheck(
        dim.filter(col("valid_to").isNull).join(snapKeys, touchCond, "left_semi"),
        "dimension open slice (snapshot keys)")
    }
    val reserved = Seq("__d_present", "__s_present") ++
      (keys ++ attrs).map(c => s"__s_$c")
    val clash = (dim.columns ++ snapshot.columns).toSet.intersect(reserved.toSet)
    require(clash.isEmpty, s"columns reserved by Scd2.merge in use: $clash")
    val closed = dim.filter(col("valid_to").isNotNull)
    val open = dim.filter(col("valid_to").isNull)

    // Presence is tracked with explicit literal flags, NOT key null-ness:
    // a (pathological but possible) null natural key would otherwise look
    // like "side absent" and silently vanish from the merge. The join is
    // null-safe (<=>) for the same reason — null keys match each other.
    val openFlagged = open.withColumn("__d_present", lit(true))
    val snapCols = keys.map(k => col(k).as(s"__s_$k")) ++
      attrs.map(a => col(a).as(s"__s_$a"))
    val snap = snapshot.select(snapCols: _*).withColumn("__s_present", lit(true))
    val keyCond = keys.map(k => col(k) <=> col(s"__s_$k")).reduce(_ && _)
    // null-safe attr comparison: a null->value or value->null flip IS a change
    val changedCond = attrs.map(a => !(col(a) <=> col(s"__s_$a"))).reduce(_ || _)

    val jf = openFlagged.join(snap, keyCond, "full_outer")
    // the flag is a literal true on its own side, null when the outer
    // join found no match — isNotNull is two-valued, never tri-state
    val dPresent = col("__d_present").isNotNull
    val sPresent = col("__s_present").isNotNull

    val dimSideCols = dim.columns.map(col)
    // open rows with no snapshot match, or matching with equal attrs: keep as-is
    val keep = jf.filter(dPresent && (!sPresent || !changedCond))
      .select(dimSideCols: _*)
    // matched and changed: close the old version at asOf
    val toClose = jf.filter(dPresent && sPresent && changedCond)
    val closedNow = toClose.select(
      (dim.columns.filterNot(_ == "valid_to").map(col) :+
        asOfCol.cast("timestamp_ntz").as("valid_to")): _*)
    // changed or brand-new keys: open a fresh version from the snapshot side
    val openNew = jf.filter(sPresent && (!dPresent || changedCond))
    val newVersions = openNew.select(
      (dim.columns.map {
        case "valid_from" => asOfCol.cast("timestamp_ntz").as("valid_from")
        case "valid_to" => lit(null).cast("timestamp_ntz").as("valid_to")
        case c if keys.contains(c) || attrs.contains(c) => col(s"__s_$c").as(c)
        case c => col(c) // non-tracked payload columns carry over (null for new keys)
      }): _*)

    closed.unionByName(keep).unionByName(closedNow).unionByName(newVersions)
  }
}
