package graft

import org.apache.spark.sql.functions._
import graft.ops.Skew
import graft.sinks.UpsertIgnore

/** Scale-mechanics specs: partitioned upsert targets and salted
  * aggregation — correctness of the structures the 100 TB layout uses.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("K5 over a date-partitioned target: layout + idempotence + pruning") {
    val dir = tmpDir("k5part") + "/t"
    val day1 = Seq(
      ("USD", "2026-08-10", 1.0), ("GBP", "2026-08-10", 2.0)
    ).toDF("currency", "date", "rate")
    val day2 = Seq(
      ("USD", "2026-08-11", 1.1), ("USD", "2026-08-10", 9.9) // dup key
    ).toDF("currency", "date", "rate")

    val r1 = UpsertIgnore(spark, day1, dir, Seq("currency", "date"),
      pruneCol = Some("date"), partitionBy = Seq("date"))
    assert(r1 == UpsertIgnore.Result(2, 0))
    // physical layout is date-partitioned
    val dirs = new java.io.File(dir).listFiles().map(_.getName).filter(_.contains("="))
    assert(dirs.contains("date=2026-08-10"))

    val r2 = UpsertIgnore(spark, day2, dir, Seq("currency", "date"),
      pruneCol = Some("date"), partitionBy = Seq("date"))
    assert(r2 == UpsertIgnore.Result(1, 1))
    val t = spark.read.parquet(dir)
    assert(t.count() == 3)
    assert(t.filter(col("currency") === "USD" && col("date") === "2026-08-10")
      .select("rate").head().getDouble(0) == 1.0) // original kept

    // the prune filter lands as a PARTITION filter, not a data filter
    val pruned = spark.read.parquet(dir).filter(col("date") === "2026-08-11")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(date"), s"plan:\n$plan")
  }

  test("salted aggregation equals plain aggregation (hot-key safe)") {
    // one hot key (90% of rows) + long tail
    val rows = (1 to 10000).map { i =>
      val k = if (i % 10 != 0) "hot" else s"k${i % 97}"
      (i.toLong, k, i.toDouble)
    }
    val df = rows.toDF("id", "key", "v")
    val plain = df.groupBy("key")
      .agg(sum("v").as("s"), count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedAgg(df, Seq("key"), saltFactor = 8,
      idCols = Seq(col("id")),
      partials = Seq(sum("v").as("s"), count(lit(1)).as("c")),
      combines = Seq(sum("s").as("s"), sum("c").as("c")))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet == plain.keySet)
    for ((k, (s, c)) <- plain) {
      assert(salted(k)._2 == c, s"count mismatch for $k")
      assert(math.abs(salted(k)._1 - s) < 1e-6, s"sum mismatch for $k")
    }
  }

  test("AQE splits a skewed join partition at runtime (skew-aware SMJ)") {
    // one key owning ~95% of the fact: the classic hot-partition join.
    // Thresholds are shrunk so local-mode data sizes trip the optimizer —
    // the assertion is that the FINAL adaptive plan marks the join/reader
    // as skew-handled, i.e. the hot partition was split across tasks
    // instead of serializing one reducer (the 100 TB failure mode salting
    // guards against; AQE is the runtime half of that defense).
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      val fact = (1 to 120000).map(i =>
        (if (i % 20 != 0) 1L else (i % 50).toLong + 2, i.toDouble)).toDF("k", "v")
      val dim = (1L to 60L).map(k => (k, s"d$k")).toDF("k", "name")
      val j = fact.join(dim, "k")
      // execute j's OWN plan (count() would build and run a different
      // tree, leaving j's adaptive plan unfinalized)
      assert(j.collect().length == 120000)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE did not split the hot partition:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions") {
    // fact partitioned by the join key's dimension attribute; filtering
    // the dim must inject a runtime subquery that skips fact partitions —
    // at 100 TB this is the difference between scanning one partition
    // and scanning the table.
    val factPath = tmpDir("dpp") + "/fact"
    val dimPath = tmpDir("dpp_dim") + "/dim"
    Tables.orders(spark, dir)
      .write.partitionBy("o_orderpriority").parquet(factPath)
    // the dim must be a REAL scan: a LocalRelation's filter constant-folds
    // away and DPP then sees no selective predicate to prune with
    Seq(("1-URGENT", "now"), ("5-LOW", "later"))
      .toDF("prio", "speed").write.parquet(dimPath)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // pin the threshold high: the pruning subquery rides the BROADCAST
      // of the dim, and a neighboring test in this suite sets -1
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      val q = spark.read.parquet(factPath)
        .join(spark.read.parquet(dimPath).filter(col("speed") === "now"),
          col("o_orderpriority") === col("prio"))
      assert(q.count() ==
        Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT").count())
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning") || p.contains("DynamicPruning"),
        s"no dynamic partition pruning in plan:\n$p")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // parquet scans (not LocalRelation) so the optimizer sees sizes
      val fact = Tables.lineitem(spark, dir)
      val dimSel = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT") // selective creation side
      val q = fact.join(dimSel, col("l_orderkey") === col("o_orderkey"))
        .select("l_orderkey", "l_quantity", "o_orderpriority")
      q.collect()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("might_contain") || p.contains("bloom"),
        s"no runtime bloom filter in plan:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salt is deterministic and spreads a key over saltFactor buckets") {
    val df = (1L to 1000L).toDF("id")
    val s1 = df.select(Skew.salt(8, col("id")).as("s")).collect().map(_.getLong(0))
    val s2 = df.select(Skew.salt(8, col("id")).as("s")).collect().map(_.getLong(0))
    assert(s1.toSeq == s2.toSeq)
    assert(s1.distinct.sorted.toSeq == (0L to 7L))
  }
}
