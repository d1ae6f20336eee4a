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

  test("AsOfJoin.backward: inclusive match, latest-wins, nulls when none") {
    val trades = Seq(
      (1L, "A", 10L), // before any quote -> null payload
      (2L, "A", 20L), // exactly at quote t=20 -> inclusive match
      (3L, "A", 35L), // between quotes -> latest earlier (t=30)
      (4L, "B", 50L), // other key
      (5L, "C", 50L)  // key with no quotes at all
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 20L, 101L, 1.0),
      ("A", 30L, 102L, 2.0),
      ("A", 30L, 103L, 3.0), // same (key, time): greatest tiebreak wins
      ("B", 40L, 104L, 4.0)
    ).toDF("q_sym", "q_t", "quote_id", "px")
    val out = graft.ops.AsOfJoin.backward(trades, quotes,
        leftOn = Seq("sym"), rightOn = Seq("q_sym"),
        leftTime = "t", rightTime = "q_t", tiebreak = Seq("quote_id"))
      .select("trade_id", "quote_id", "px")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2))))).toMap
    assert(out(1L).isEmpty)
    assert(out(2L).contains((101L, 1.0)))
    assert(out(3L).contains((103L, 3.0))) // t=30, tiebreak picks quote 103
    assert(out(4L).contains((104L, 4.0)))
    assert(out(5L).isEmpty)
  }

  test("AsOfJoin fills the payload as one row — never stitches columns") {
    // quote 202 has a NULL px: a per-column last(ignoreNulls) fill would
    // pair 202's id with 201's px; the struct fill must keep them together
    val trades = Seq((1L, "A", 50L)).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      ("A", 10L, 201L, Some(9.0)),
      ("A", 20L, 202L, None)
    ).toDF("q_sym", "q_t", "quote_id", "px")
    val r = graft.ops.AsOfJoin.backward(trades, quotes,
        leftOn = Seq("sym"), rightOn = Seq("q_sym"),
        leftTime = "t", rightTime = "q_t", tiebreak = Seq("quote_id"))
      .select("quote_id", "px").head()
    assert(r.getLong(0) == 202L)
    assert(r.isNullAt(1), "px must be 202's NULL, not stitched from 201")
  }

  test("AsOfJoin plans one exchange: union + window, no pair-blowup join") {
    val trades = spark.range(100).toDF("trade_id")
      .withColumn("sym", (col("trade_id") % 4).cast("string"))
      .withColumn("t", col("trade_id") * 10)
    val quotes = spark.range(50).toDF("quote_id")
      .withColumn("q_sym", (col("quote_id") % 4).cast("string"))
      .withColumn("q_t", col("quote_id") * 7)
    val p = graft.ops.AsOfJoin.backward(trades, quotes,
        Seq("sym"), Seq("q_sym"), "t", "q_t", Seq("quote_id"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert(p.contains("Window"), "expected window fill")
    assert(p.split("Exchange").length - 1 <= 1, s"more than one exchange:\n$p")
  }

  test("RangeJoin matches the naive inequality join, each pair exactly once") {
    // deterministic points and intervals with boundary cases: intervals
    // spanning multiple bins, zero-width intervals, points on bin edges,
    // and NEGATIVE coordinates (floor division must round toward -inf)
    val pts = spark.range(200).toDF("pid").withColumn("p", col("pid") * 3 % 97 - 40)
    val ivs = spark.range(60).toDF("iid")
      .withColumn("lo", col("iid") * 7 % 89 - 40)
      .withColumn("hi", col("lo") + col("iid") % 25) // widths 0..24
    val binned = graft.ops.RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 10)
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
      .select("pid", "iid")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length == binned.distinct.length, "pair emitted twice")
    assert(binned.toSet == naive.toSet)
    assert(binned.nonEmpty)
  }

  test("RangeJoin.intervalOverlap matches naive, each pair exactly once") {
    val as = spark.range(120).toDF("aid")
      .withColumn("a_lo", col("aid") * 5 % 83)
      .withColumn("a_hi", col("a_lo") + col("aid") % 31) // spans 0..30
    val bs = spark.range(70).toDF("bid")
      .withColumn("b_lo", col("bid") * 11 % 79)
      .withColumn("b_hi", col("b_lo") + col("bid") % 17)
    val binned = graft.ops.RangeJoin.intervalOverlap(as, "a_lo", "a_hi", bs, "b_lo", "b_hi", 10)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = as.join(bs, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.length == binned.distinct.length, "pair emitted twice")
    assert(binned.toSet == naive.toSet)
    assert(binned.nonEmpty)
  }

  test("RangeJoin plans a shuffled equi-join on the bin, not a nested loop") {
    val pts = spark.range(2000).toDF("pid").withColumn("p", col("pid"))
    val ivs = spark.range(500).toDF("iid")
      .withColumn("lo", col("iid") * 4).withColumn("hi", col("lo") + 10)
    val p = graft.ops.RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 16)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$p")
    assert(p.contains("Join"), "expected an equi-join on the bin")
  }

  test("spreadIfNarrow: spreads an under-split scan, passes a pre-split input by reference") {
    val target = spark.sessionState.conf.numShufflePartitions
    val narrow = Tables.documents(spark, "/root/testdata/sf0.001") // one row-group
    assert(narrow.rdd.getNumPartitions < target, "fixture no longer narrow")
    assert(graft.ops.Transforms.spreadIfNarrow(narrow)
      .rdd.getNumPartitions == target)
    val wide = narrow.repartition(target)
    // an already-split input must gain NO exchange — same plan, by reference
    assert(graft.ops.Transforms.spreadIfNarrow(wide) eq wide)
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
