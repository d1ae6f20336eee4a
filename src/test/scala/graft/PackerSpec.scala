package graft

import org.apache.spark.sql.functions._
import graft.ext.{Packer, TextAnalysis}

class PackerSpec extends SparkSpec {
  import spark.implicits._

  test("packBudget: hand-checked assignment, straddlers keep their start pack") {
    // budget 10; cumulative starts: 0, 4, 8, 15, 15+9=24
    val docs = Seq((1L, 4L), (2L, 4L), (3L, 7L), (4L, 9L), (5L, 2L))
      .toDF("doc_id", "n")
    val out = Packer.packBudget(docs, "doc_id", col("n"), 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out == Map(
      1L -> ((0L, 0L)), // starts at 0
      2L -> ((0L, 4L)), // starts at 4
      3L -> ((0L, 8L)), // starts at 8, straddles into pack 1
      4L -> ((1L, 5L)), // starts at 15
      5L -> ((2L, 4L))  // starts at 24
    ), s"got $out")
  }

  test("packBudget is partition-count independent (distributed prefix sum)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def run(shufflePartitions: Int): Map[Long, (Long, Long)] = {
      val saved = spark.conf.get("spark.sql.shuffle.partitions")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
        Packer.packBudget(docs, "doc_id",
            TextAnalysis.tokenCount(col("text")), 2048)
          .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3)))).toMap
      } finally spark.conf.set("spark.sql.shuffle.partitions", saved)
    }
    val p1 = run(1)   // degenerate: the single-partition (global window) layout
    val p7 = run(7)   // uneven spread
    assert(p1 == p7, "pack assignment depends on partitioning")
    assert(p1.size == 500)
    // no single-partition exchange in the distributed plan
    val plan = Packer.packBudget(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), 2048)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global-window bottleneck in plan:\n$plan")
  }

  test("packBudget: offsets always inside the budget, packs dense") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = Packer.packBudget(docs, "doc_id",
      TextAnalysis.tokenCount(col("text")), 512)
    assert(out.filter(col("pack_offset") < 0 || col("pack_offset") >= 512).count() == 0)
    // every pack id up to the max is used (concat-and-split leaves no gaps)
    val ids = out.select("pack_id").distinct()
      .collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == (0L to ids.max).toSeq)
  }
}
