package graft

import org.apache.spark.sql.functions._

import graft.functions.FreqItems

class FreqItemsSpec extends SparkSpec {
  import spark.implicits._

  test("freqitems: heavy item survives merge across splits; estimate bounded") {
    // 5000 distinct light items (well beyond mapSize 64) + one item at
    // 8% frequency: the approximation regime. MG guarantees the heavy
    // item is reported and its estimate overshoots by <= maxError.
    val n = 25000
    val data = (1 to n).map { i =>
      if (i % 12 == 0) "heavy" else s"w${(i * 2654435761L) % 5000}"
    }
    val trueHeavy = data.count(_ == "heavy").toLong
    val (a, b) = data.splitAt(n / 3)
    val parts = a.toDF("v").agg(FreqItems.sketchAgg(col("v")).as("sk"))
      .unionByName(b.toDF("v").agg(FreqItems.sketchAgg(col("v")).as("sk")))
    val merged = parts.agg(FreqItems.mergeAgg(col("sk")).as("sk"))
      .select(FreqItems.topK(col("sk"), 5).as("top"),
        FreqItems.maxError(col("sk")).as("err"))
      .head()
    val top = merged.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val err = merged.getLong(1)
    assert(top.headOption.map(_._1).contains("heavy"), top)
    val est = top.head._2
    assert(est >= trueHeavy && est <= trueHeavy + err,
      s"est=$est true=$trueHeavy maxError=$err")
  }

  test("freqitems: bounded cardinality stays exact (maxError 0)") {
    val df = (1 to 9999).map(i => s"v${i % 7}").toDF("v")
    val row = df.agg(FreqItems.sketchAgg(col("v")).as("sk"))
      .select(FreqItems.topK(col("sk"), 7).as("top"),
        FreqItems.maxError(col("sk")).as("err"))
      .head()
    assert(row.getLong(1) === 0L)
    val top = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // 9999 = 7*1428 + 3: values v1..v3 get 1429, v0/v4..v6 get 1428
    assert(top === Map("v1" -> 1429L, "v2" -> 1429L, "v3" -> 1429L,
      "v0" -> 1428L, "v4" -> 1428L, "v5" -> 1428L, "v6" -> 1428L))
  }
}
