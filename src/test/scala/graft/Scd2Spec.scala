package graft

import org.apache.spark.sql.functions._
import graft.sinks.Scd2

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = lit(s).cast("timestamp_ntz")

  // dim at t0: keys 1..4 open; key 4 also has an already-closed old version
  private def dim0 = Seq(
    (1L, 100.0, "A", "2000-01-01 00:00:00", null.asInstanceOf[String]),
    (2L, 200.0, "B", "2000-01-01 00:00:00", null.asInstanceOf[String]),
    (3L, 300.0, "C", "2000-01-01 00:00:00", null.asInstanceOf[String]),
    (4L, 380.0, "D", "1990-01-01 00:00:00", "2000-01-01 00:00:00"),
    (4L, 400.0, "D", "2000-01-01 00:00:00", null.asInstanceOf[String])
  ).toDF("k", "bal", "seg", "vf", "vt")
    .select(col("k"), col("bal"), col("seg"),
      col("vf").cast("timestamp_ntz").as("valid_from"),
      col("vt").cast("timestamp_ntz").as("valid_to"))

  // snapshot at t1: key 1 unchanged, key 2 changed, key 3 missing,
  // key 4 changed, key 9 brand new
  private def snap = Seq(
    (1L, 100.0, "A"),
    (2L, 250.0, "B"),
    (4L, 400.0, "E"),
    (9L, 900.0, "Z")
  ).toDF("k", "bal", "seg")

  private def merged = Scd2.merge(dim0, snap,
    keys = Seq("k"), attrs = Seq("bal", "seg"), asOfCol = ts("2001-06-01 00:00:00"))

  test("unchanged key keeps its open row untouched") {
    val r = merged.filter(col("k") === 1L).collect()
    assert(r.length == 1 && r.head.isNullAt(r.head.fieldIndex("valid_to")))
    assert(r.head.getDouble(1) == 100.0)
  }

  test("changed key: old version closed at asOf, new version opened") {
    val rows = merged.filter(col("k") === 2L)
      .orderBy("valid_from").collect()
    assert(rows.length == 2)
    assert(rows(0).getDouble(1) == 200.0 &&
      rows(0).getAs[java.time.LocalDateTime]("valid_to").toString == "2001-06-01T00:00")
    assert(rows(1).getDouble(1) == 250.0 && rows(1).isNullAt(rows(1).fieldIndex("valid_to")))
  }

  test("key missing from snapshot stays open (absence is not deletion)") {
    val r = merged.filter(col("k") === 3L).collect()
    assert(r.length == 1 && r.head.isNullAt(r.head.fieldIndex("valid_to")))
  }

  test("closed history rows pass through; multi-version key grows a third version") {
    val rows = merged.filter(col("k") === 4L).orderBy("valid_from").collect()
    assert(rows.length == 3) // 1990 closed, 2000 closed-now, 2001 open
    assert(rows(0).getAs[java.time.LocalDateTime]("valid_to") != null)
    assert(rows(1).getAs[java.time.LocalDateTime]("valid_to").toString == "2001-06-01T00:00")
    assert(rows(2).getString(2) == "E" && rows(2).isNullAt(rows(2).fieldIndex("valid_to")))
  }

  test("brand-new key opens its first version at asOf") {
    val r = merged.filter(col("k") === 9L).collect()
    assert(r.length == 1)
    assert(r.head.getAs[java.time.LocalDateTime]("valid_from").toString == "2001-06-01T00:00")
    assert(r.head.isNullAt(r.head.fieldIndex("valid_to")))
  }

  test("re-merging the same snapshot is a no-op (idempotent)") {
    val again = Scd2.merge(merged, snap,
      keys = Seq("k"), attrs = Seq("bal", "seg"), asOfCol = ts("2001-07-01 00:00:00"))
    val a = merged.orderBy("k", "valid_from").collect().map(_.toSeq).toSeq
    val b = again.orderBy("k", "valid_from").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("a null natural key neither vanishes nor duplicates (null-safe merge)") {
    val dimN = Seq(
      (Option(1L), 100.0, "A", "2000-01-01 00:00:00"),
      (Option.empty[Long], 50.0, "X", "2000-01-01 00:00:00")
    ).toDF("k", "bal", "seg", "vf")
      .select(col("k"), col("bal"), col("seg"),
        col("vf").cast("timestamp_ntz").as("valid_from"),
        lit(null).cast("timestamp_ntz").as("valid_to"))
    // snapshot also carries the null key, with a changed attribute
    val snapN = Seq((Option(1L), 100.0, "A"), (Option.empty[Long], 60.0, "X"))
      .toDF("k", "bal", "seg")
    val m = Scd2.merge(dimN, snapN, Seq("k"), Seq("bal", "seg"),
      ts("2001-06-01 00:00:00"))
    val nullRows = m.filter(col("k").isNull).orderBy("valid_from").collect()
    // null key matched null key (<=>): old closed, new opened — 2 rows
    assert(nullRows.length == 2, s"null-key rows: ${nullRows.length}")
    assert(!nullRows(0).isNullAt(nullRows(0).fieldIndex("valid_to")))
    assert(nullRows(1).isNullAt(nullRows(1).fieldIndex("valid_to")))
    assert(nullRows(1).getDouble(1) == 60.0)
    assert(m.filter(col("k") === 1L).count() == 1) // unchanged row untouched
  }

  test("guards: reserved internal column names rejected") {
    intercept[IllegalArgumentException] {
      Scd2.merge(dim0.withColumn("__d_present", lit(1)), snap,
        Seq("k"), Seq("bal"), ts("2001-06-01 00:00:00"))
    }
    intercept[IllegalArgumentException] {
      Scd2.merge(dim0, snap.withColumn("__s_bal", lit(1)),
        Seq("k"), Seq("bal"), ts("2001-06-01 00:00:00"))
    }
  }

  test("guards: duplicate snapshot keys rejected (fan-out corruption)") {
    val dupSnap = snap.unionByName(Seq((2L, 999.0, "Q")).toDF("k", "bal", "seg"))
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(dim0, dupSnap, Seq("k"), Seq("bal", "seg"),
        ts("2001-06-01 00:00:00")).collect()
    }
    assert(e.getMessage.contains("duplicate"), e.getMessage)
    // validateKeys=false restores the caller-enforced-precondition path
    Scd2.merge(dim0, snap, Seq("k"), Seq("bal", "seg"),
      ts("2001-06-01 00:00:00"), validateKeys = false).collect()
  }

  test("guards: multiple OPEN dim rows per key rejected") {
    val brokenDim = dim0.unionByName(
      Seq((1L, 111.0, "A2", "2000-06-01 00:00:00", null.asInstanceOf[String]))
        .toDF("k", "bal", "seg", "vf", "vt")
        .select(col("k"), col("bal"), col("seg"),
          col("vf").cast("timestamp_ntz").as("valid_from"),
          col("vt").cast("timestamp_ntz").as("valid_to")))
    val e = intercept[IllegalArgumentException] {
      Scd2.merge(brokenDim, snap, Seq("k"), Seq("bal", "seg"),
        ts("2001-06-01 00:00:00")).collect()
    }
    assert(e.getMessage.contains("open slice"), e.getMessage)
  }

  test("guards: empty keys or attrs rejected") {
    intercept[IllegalArgumentException] {
      Scd2.merge(dim0, snap, Nil, Seq("bal"), ts("2001-06-01 00:00:00"))
    }
    intercept[IllegalArgumentException] {
      Scd2.merge(dim0, snap, Seq("k"), Nil, ts("2001-06-01 00:00:00"))
    }
  }
}
