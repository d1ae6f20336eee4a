package graft

import org.apache.spark.sql.functions._
import graft.ops.Transforms

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("F1+C2 calendar-month window (not 30-day)") {
    val df = Seq("2026-03-31", "2026-02-28", "2026-01-30", "2026-02-01")
      .toDF("d").withColumn("d", col("d").cast("date"))
    // anchor 2026-03-31, 1 month back -> add_months gives 2026-02-28
    val out = Transforms.windowMonths("d", lit("2026-03-31").cast("date"), 1)(df)
      .as[java.sql.Date].collect().map(_.toString).sorted
    assert(out.toSeq == Seq("2026-02-28", "2026-03-31"))
  }

  test("C1 permissive parse: null on garbage, never error (ANSI-safe)") {
    val df = Seq("2026-08-11 10:00:00", "not-a-date", "2026-13-45 99:99:99")
      .toDF("s").select(Transforms.permissiveTimestamp(col("s")).as("t"))
    val vals = df.collect().map(r => Option(r.get(0)))
    assert(vals.count(_.isDefined) == 1)
    assert(vals.count(_.isEmpty) == 2)
  }

  test("A2 keep-first dedup is deterministic (window, not dropDuplicates)") {
    val df = Seq(
      ("USD", "2026-08-11T16:00", 1.0, 1),
      ("USD", "2026-08-11T16:00", 2.0, 2), // same key, later priority
      ("GBP", "2026-08-11T16:00", 3.0, 1)
    ).toDF("ccy", "ts", "rate", "prio")
    val out = Transforms.dedupKeyedKeepFirst(
      Seq("ccy", "ts"), Seq(col("prio").asc))(df)
      .orderBy("ccy").as[(String, String, Double, Int)].collect()
    assert(out.toSeq == Seq(
      ("GBP", "2026-08-11T16:00", 3.0, 1),
      ("USD", "2026-08-11T16:00", 1.0, 1))) // prio 1 kept, not arbitrary
  }

  test("cleanHistory: dedup + dropna + positive domain composed") {
    val df = Seq(
      (Some("USD"), Some(1.1), Some("2026-07-15")),
      (Some("USD"), Some(1.1), Some("2026-07-15")), // exact dup
      (Some("AUD"), Some(-1.5), Some("2026-07-15")), // non-positive
      (Some("CAD"), None: Option[Double], Some("2026-07-15")), // null rate
      (None: Option[String], Some(1.5), Some("2026-07-15")) // null ccy
    ).toDF("currency", "exchange_rate", "date")
    assert(Transforms.cleanHistory(df).count() == 1)
  }

  test("U1 unionBySchema: drifted schemas merge by column union with nulls") {
    val api = Seq(("USD", 1.08)).toDF("currency", "exchange_rate")
    val scraped = Seq(("US Dollar", 1.08)).toDF("currency_name", "exchange_rate")
    val out = Transforms.unionBySchema(Seq(api, scraped))
    assert(out.columns.toSeq == Seq("currency", "exchange_rate", "currency_name"))
    assert(out.count() == 2)
    assert(out.filter(col("currency").isNull).count() == 1)
    assert(out.filter(col("currency_name").isNull).count() == 1)
  }

  test("F5 recentDelta: only rows within the window survive") {
    val now = java.time.LocalDateTime.parse("2026-08-11T12:00:00")
    val df = Seq("2026-08-11 11:59:00", "2026-08-11 11:39:59", "2026-08-11 11:41:00")
      .toDF("created_at").withColumn("created_at", col("created_at").cast("timestamp_ntz"))
    val out = Transforms.recentDelta("created_at", lit(now).cast("timestamp_ntz"), 20)(df)
    assert(out.count() == 2) // 11:39:59 is outside the 20-min window
  }

  test("O1 topK plans as TakeOrderedAndProject (no global sort)") {
    val df = spark.range(1000).toDF("id")
    val plan = Transforms.topK(5, col("id").desc)(df)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"unexpected plan:\n$plan")
  }

  test("GroupedTopK bounded heap matches the window formulation at k=100") {
    // deterministic pseudo-random scores with planted ties: exercises the
    // heap's accept/reject/sift paths and the (score DESC, id ASC)
    // tie-break well past the k=3 production query.
    val df = spark.range(5000)
      .withColumn("key", (col("id") % 4).cast("string"))
      .withColumn("score", (xxhash64(col("id")) % 500).cast("double"))
    val got = graft.ops.GroupedTopK(spark, df, "key", "score", "id", 100)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val want = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("key")
          .orderBy(col("score").desc, col("id").asc)))
      .filter(col("rn") <= 100).select("key", "score", "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(got == want)
  }
}
