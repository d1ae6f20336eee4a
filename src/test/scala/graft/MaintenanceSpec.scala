package graft

import org.apache.spark.sql.functions._
import graft.sinks.Maintenance

class MaintenanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("compact: many small files collapse to the target count, rows intact") {
    val path = tmpDir("compact") + "/t"
    val src = Tables.orders(spark, dir)
    src.repartition(40).write.parquet(path) // simulate incremental-append debris
    val rowsBefore = spark.read.parquet(path).count()
    val (before, after) = Maintenance.compact(spark, path, targetFileBytes = 8L * 1024 * 1024)
    assert(before >= 40, s"setup wrote $before files")
    assert(after < before, s"no compaction: $before -> $after")
    // tiny table well under one target file -> exactly 1 data file
    assert(after == 1)
    assert(spark.read.parquet(path).count() == rowsBefore)
    assert(spark.read.parquet(path).schema == src.schema)
  }

  test("compact preserves a partitioned table's directory layout") {
    val path = tmpDir("compact_part") + "/t"
    Tables.orders(spark, dir).repartition(10)
      .write.partitionBy("o_orderpriority").parquet(path)
    val rowsBefore = spark.read.parquet(path).count()
    val (before, after) = Maintenance.compact(spark, path,
      targetFileBytes = 8L * 1024 * 1024)
    assert(after < before, s"no compaction: $before -> $after")
    // partition dirs survive the rewrite; pruning still works
    val dirs = new java.io.File(path).listFiles().map(_.getName)
    assert(dirs.exists(_.startsWith("o_orderpriority=")),
      s"partition layout destroyed: ${dirs.toSeq}")
    val pruned = spark.read.parquet(path)
      .filter(col("o_orderpriority") === "1-URGENT")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(o_orderpriority"))
    assert(spark.read.parquet(path).count() == rowsBefore)
  }

  test("compact: guard rejects sub-MiB targets") {
    intercept[IllegalArgumentException] {
      Maintenance.compact(spark, tmpDir("x"), targetFileBytes = 1000)
    }
  }

  test("clusterBy: files cover disjoint ranges of the cluster column") {
    val path = tmpDir("cluster") + "/t"
    Maintenance.clusterBy(Tables.orders(spark, dir), path, "o_orderkey", numFiles = 4)
    // per-file [min,max] of the cluster column must not interleave
    val ranges = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"file ranges overlap: $ranges")
      case _ =>
    }
    assert(spark.read.parquet(path).count() ==
      Tables.orders(spark, dir).count())
  }

  test("clusterBy: range filter after clustering prunes at the scan") {
    val path = tmpDir("cluster2") + "/t"
    Maintenance.clusterBy(Tables.orders(spark, dir), path, "o_orderkey", numFiles = 4)
    val q = spark.read.parquet(path).filter(col("o_orderkey") < 100)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), LessThan(o_orderkey,100)"),
      s"range predicate not pushed:\n$p")
    assert(q.count() == Tables.orders(spark, dir).filter(col("o_orderkey") < 100).count())
  }
}
