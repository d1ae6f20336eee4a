package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join (point-in-time join): for every left row, attach
  * the payload of the LATEST right row with the same key whose time is at
  * or before the left row's time — "the rate in effect when the event
  * happened". The reference's data model implies exactly this lookup
  * (a rates table keyed `(currency, timestamptz)` consumed by
  * time-stamped readers); Spark has no native ASOF operator.
  *
  * Per SURVEY's custom-operator preference order this is tier (a) —
  * COMPOSED from built-ins, because the composition is already the
  * optimal physical shape, so a custom LogicalPlan/Strategy (tier c)
  * would add surface without adding a better plan. The form: tag both
  * sides, union them, and window-fill the right payload downward in time
  * order. That plans as ONE hash-partition exchange on the key plus an
  * in-partition sort — i.e. exactly a distributed sort-merge as-of join —
  * and never materializes the (left × matching-right) pair blowup that a
  * range-join + row_number formulation pays before its filter. At 100 TB:
  * one shuffle of left+right, linear scan per partition, skewed keys
  * handled by AQE like any other exchange.
  *
  * Payload consistency: the right payload is filled as ONE struct, not
  * per-column — `last(col, ignoreNulls)` per column would stitch values
  * from DIFFERENT right rows whenever a payload cell is legitimately
  * NULL. Filling the (never-null-for-right-rows) struct keeps each left
  * row paired with one whole right row.
  *
  * Ties: a right row AT the left row's time matches (inclusive); among
  * right rows sharing (key, time) the one greatest by `tiebreak` wins —
  * deterministic, mirrors `row_number() ORDER BY time DESC, tiebreak
  * DESC` in the oracle.
  *
  * NULL keys: the window partitioning groups null keys TOGETHER (null ==
  * null), unlike SQL join semantics where null matches nothing — filter
  * null-keyed rows out first if SQL semantics are required.
  */
object AsOfJoin {

  def backward(
      left: DataFrame,
      right: DataFrame,
      leftOn: Seq[String],
      rightOn: Seq[String],
      leftTime: String,
      rightTime: String,
      tiebreak: Seq[String] = Nil): DataFrame = {
    require(leftOn.size == rightOn.size && leftOn.nonEmpty, "key lists must match")
    val payloadCols = right.columns.toSeq.filterNot(rightOn.contains)
    val collisions = payloadCols.toSet & left.columns.toSet
    require(collisions.isEmpty, s"right payload collides with left columns: $collisions")
    val reserved = Set("__t", "__side", "__p", "__match")
    require((left.columns.toSet ++ right.columns.toSet).intersect(reserved).isEmpty,
      s"column names $reserved are reserved by AsOfJoin")

    val leftRest = left.columns.toSeq.filterNot(leftOn.contains)

    // unified row shape: keys (left names) + __t + __side + left rest +
    // one nullable struct holding the whole right payload
    val lSide = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(
        org.apache.spark.sql.types.StructType(
          right.select(payloadCols.map(col): _*).schema.fields)))
      .select((leftOn.map(col) ++ Seq(col("__t"), col("__side"), col("__p")) ++
        leftRest.map(col)): _*)
    val rSide = right
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payloadCols.map(col): _*))
      .select((rightOn.zip(leftOn).map { case (r, l) => col(r).as(l) } ++
        Seq(col("__t"), col("__side"), col("__p")) ++
        leftRest.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)

    // right rows sort before left rows at equal time (inclusive match);
    // among equal (key, time) right rows the greatest tiebreak sorts last
    // and wins the fill
    val order = Seq(col("__t").asc, col("__side").asc) ++
      tiebreak.map(c => col("__p").getField(c).asc)
    val w = Window
      .partitionBy(leftOn.map(col): _*)
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val filled = lSide.unionByName(rSide)
      .withColumn("__match", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val out = leftOn.map(col) ++
      leftRest.map(col) ++
      payloadCols.map(c => col("__match").getField(c).as(c))
    filled.select(out: _*)
  }
}
