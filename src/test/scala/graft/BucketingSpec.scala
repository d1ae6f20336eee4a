package graft

import org.apache.spark.sql.functions._
import graft.ops.Bucketing

class BucketingSpec extends SparkSpec {

  test("bucketed co-located join runs with zero Exchange (no shuffle)") {
    val work = tmpDir("buckets")
    val dir = "/root/testdata/sf0.001"
    Bucketing.writeBucketed(Tables.lineitem(spark, dir),
      "li_bucketed", s"$work/li", buckets = 8, key = "l_orderkey")
    Bucketing.writeBucketed(Tables.orders(spark, dir),
      "o_bucketed", s"$work/o", buckets = 8, key = "o_orderkey")
    // force the non-broadcast path so the assertion is about bucketing
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark,
        "li_bucketed", "o_bucketed", "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      // and it is correct
      assert(joined.count() ==
        Tables.lineitem(spark, dir).join(Tables.orders(spark, dir),
          col("l_orderkey") === col("o_orderkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
