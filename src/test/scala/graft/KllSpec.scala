package graft

import org.apache.spark.sql.functions._

import graft.functions.Kll

class KllSpec extends SparkSpec {
  import spark.implicits._

  test("kll: quantile estimate lands within published rank error") {
    // deterministic but irregular continuous-ish values: rank bands are
    // one row wide, so this exercises the real approximation regime
    val n = 20000
    val vals = (1 to n).map(i => ((i * 2654435761L) % 1000003).toDouble)
    val sorted = vals.sorted
    val sk = vals.toDF("v").agg(Kll.sketchAgg(col("v")).as("sk"))
    for (q <- Seq(0.1, 0.5, 0.9)) {
      val est = sk.select(Kll.quantile(col("sk"), q)).as[Double].head()
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.02,
        s"q=$q est=$est realized rank=$rank")
    }
  }

  test("kll: two-way merge equals one-shot sketch within rank error") {
    val n = 10000
    val vals = (1 to n).map(i => ((i * 48271L) % 65537).toDouble)
    val (a, b) = vals.splitAt(n / 3)
    val parts = a.toDF("v").agg(Kll.sketchAgg(col("v")).as("sk"))
      .unionByName(b.toDF("v").agg(Kll.sketchAgg(col("v")).as("sk")))
    val merged = parts.agg(Kll.mergeAgg(col("sk")).as("sk"))
    assert(merged.select(Kll.count(col("sk"))).as[Long].head() === n.toLong)
    val sorted = vals.sorted
    for (q <- Seq(0.25, 0.75)) {
      val est = merged.select(Kll.quantile(col("sk"), q)).as[Double].head()
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) <= 0.03,
        s"merged q=$q est=$est realized rank=$rank")
    }
  }

  test("kll: nulls skipped; empty sketch estimates null") {
    val sk = Seq(Some(1.0), None, Some(3.0)).toDF("v")
      .agg(Kll.sketchAgg(col("v")).as("sk"))
    assert(sk.select(Kll.count(col("sk"))).as[Long].head() === 2L)
    val empty = Seq.empty[Option[Double]].toDF("v")
      .agg(Kll.sketchAgg(col("v")).as("sk"))
    assert(empty.select(Kll.quantile(col("sk"), 0.5)).head().isNullAt(0))
  }
}
