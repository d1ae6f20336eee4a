package graft

import org.apache.spark.sql.functions._
import graft.ops.Drift
import graft.streaming.StreamingDrift

/** Streaming PSI monitor: the dense-count path must equal the batch
  * DataFrame path, the per-batch metric must separate an in-distribution
  * micro-batch from a shifted one, and replay must not double-report.
  */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  test("psiFromCounts == batch psi, including empty and missing bins + nulls") {
    val ref = (Seq.fill(50)(1.0) ++ Seq.fill(30)(3.0) ++ Seq.fill(20)(9.5) ++
      Seq(Double.NaN).filter(_ => false)).map(Tuple1(_)).toDF("v")
    val cur = (Seq.fill(10)(1.0) ++ Seq.fill(70)(5.0) ++
      Seq.fill(5)(-3.0)) // below lo — clamps into bin 0
      .map(Tuple1(_)).toDF("v")
      .unionByName(Seq(Tuple1(null.asInstanceOf[java.lang.Double]))
        .toDF("v").select(col("v").cast("double")))
    val batch = Drift.psi(ref, cur, "v", 0.0, 10.0, 10)
    val dense = Drift.psiFromCounts(
      Drift.binCounts(ref, "v", 0.0, 10.0, 10),
      Drift.binCounts(cur, "v", 0.0, 10.0, 10))
    assert(math.abs(batch - dense) < 1e-9, s"$batch vs $dense")
    assert(dense > 0.25) // this pair IS shifted
  }

  test("monitor: per-batch PSI separates stable from shifted; replay-safe") {
    val work = tmpDir("sdrift")
    val src = s"$work/src"
    new java.io.File(src).mkdirs()
    // reference distribution: uniform-ish over [0, 10)
    val ref = (0 until 1000).map(i => (i.toLong, (i % 10) + 0.5))
      .toDF("id", "v")
    // batch file 1: drawn from the same distribution (stable)
    (0 until 500).map(i => (10000L + i, (i % 10) + 0.5)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/b1")
    // batch file 2: mass collapsed onto one bin (shifted)
    (0 until 500).map(i => (20000L + i, 2.5)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$src/b2")
    val refCounts = Drift.binCounts(ref, "v", 0.0, 10.0, 10)

    val stream = spark.readStream
      .schema("id LONG, v DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/*")
    val r = StreamingDrift.monitorAvailableNow(spark, stream, "v",
      refCounts, 0.0, 10.0, 10, s"$work/metrics", s"$work/ckpt")
    assert(r.batches >= 2, s"expected >=2 micro-batches, got ${r.batches}")
    val rows = spark.read.parquet(s"$work/metrics")
      .orderBy("batch_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2)))
    assert(rows.length == r.batches.toInt)
    val psis = rows.map(_._3)
    assert(psis.min < 0.1, s"stable batch should read stable: ${psis.toSeq}")
    assert(psis.max > 0.25, s"shifted batch should alarm: ${psis.toSeq}")
    assert(math.abs(r.maxPsi - psis.max) < 1e-12)

    // replay with the SAME checkpoint: nothing new to process, and the
    // keyed metrics sink cannot double-report what already landed
    val r2 = StreamingDrift.monitorAvailableNow(spark, stream, "v",
      refCounts, 0.0, 10.0, 10, s"$work/metrics", s"$work/ckpt")
    assert(spark.read.parquet(s"$work/metrics").count() == rows.length)
    assert(r2.batches == 0 || spark.read.parquet(s"$work/metrics").count() == rows.length)
  }

  test("monitor: refCounts/nBins mismatch fails loudly") {
    val e = intercept[IllegalArgumentException] {
      StreamingDrift.monitorAvailableNow(spark,
        spark.readStream.schema("v DOUBLE").parquet(tmpDir("x") + "/*"),
        "v", Array(1L, 2L), 0.0, 1.0, 5, "/tmp/never", "/tmp/never_ckpt")
    }
    assert(e.getMessage.contains("bins"))
  }
}
