package graft

import org.apache.spark.sql.functions._
import graft.ext.{ImageIndex, Multimodal}

/** The persisted Hamming-space image index: bounded-distance top-k must
  * EQUAL the exhaustive baseline restricted to the bound (pigeonhole is
  * exact, not approximate), the probe must read less of the store than
  * a full postings scan (the layout's whole point), and un-prunable
  * bounds must be rejected at build time.
  */
class ImageIndexSpec extends SparkSpec {
  import spark.implicits._

  private def planeOf(seed: Int, flip: Int = -1): Array[Byte] =
    Array.tabulate(24 * 16) { p =>
      val x = p % 24; val y = p / 24
      val v = ((x * (13 + seed % 7) + y * (7 + seed % 5) +
        x * y * (1 + seed % 3)) * 3 + seed * 29) % 251
      (if (p == flip) (v + 96) % 251 else v).toByte
    }

  private def png(seed: Int, flip: Int = -1) =
    Multimodal.storedGrayPng(planeOf(seed, flip), 24, 16)

  private def frameOf(rows: Seq[(Long, Array[Byte])]) =
    rows.toDF("doc_id", "media")
      .withColumn("width", lit(0)).withColumn("height", lit(0))

  test("bounded top-k equals the exhaustive baseline restricted to the bound") {
    // 200 distinct textured images, plus planted near-copies of the
    // probe images (one flipped pixel — a few gradient signs at most)
    val corpus = frameOf(
      (0 until 200).map(s => (s.toLong, png(s))) ++
        Seq(0, 7, 13).flatMap(s => Seq(
          (1000L + s, png(s, flip = 40)),
          (2000L + s, png(s, flip = 333)))))
    val probes = frameOf(Seq(0, 7, 13).map(s => (s.toLong, png(s))))
    val path = tmpDir("imgidx1") + "/idx"
    ImageIndex.build(corpus, path, maxHamming = 7)
    val got = ImageIndex.topK(spark, path, probes, k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = Multimodal.imageTopK(corpus, probes, k = 8)
      .filter(col("hamming") <= 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(expected.exists(_._3 == 0) && expected.size > 3,
      s"fixture must plant in-bound matches, got $expected")
    assert(got == expected,
      s"index result diverged from the bounded exhaustive baseline:\n" +
        s"  index    : $got\n  exhaustive: $expected")
  }

  test("a probe reads less of the postings than a full scan (pruning)") {
    val corpus = frameOf((0 until 3000).map(s => (s.toLong, png(s))))
    val path = tmpDir("imgidx2") + "/idx"
    ImageIndex.build(corpus, path, maxHamming = 7)
    val probes = frameOf(Seq((17L, png(17))))
    // Spark's own task input metrics, NOT FileSystem.getAllStatistics:
    // a filterless parquet scan reads through nio and under-counts on
    // the Hadoop stats, while pushed-filter scans go through the
    // counted Hadoop stream — the FS counters compare two different
    // I/O paths. The baseline therefore carries a trivially-true PUSHED
    // predicate so both sides run the same counted reader.
    val acc = new java.util.concurrent.atomic.AtomicLong
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        acc.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    def measured(body: => Unit): Long = {
      acc.set(0)
      spark.sparkContext.addSparkListener(listener)
      try {
        body
        // listener events are async: wait until the counter settles
        var last = -1L
        var spins = 0
        while (acc.get != last && spins < 20) {
          last = acc.get; Thread.sleep(250); spins += 1
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      acc.get
    }
    var hits: Array[org.apache.spark.sql.Row] = null
    val probeBytes = measured {
      hits = ImageIndex.topK(spark, path, probes, k = 5).collect()
    }
    assert(hits.exists(h => h.getLong(1) == 17L && h.getInt(2) == 0),
      s"self-match must surface: ${hits.toSeq}")
    val fullBytes = measured {
      (0 to 7).foreach { c =>
        spark.read.parquet(s"$path/postings/chunk=$c")
          .filter(col("cval") >= 0L).collect()
      }
    }
    assert(probeBytes < fullBytes / 2,
      s"probe read $probeBytes input bytes, not well below the full " +
        s"scan's $fullBytes — the sorted cval bands are not pruning")
  }

  test("append: probe-equivalent to rebuild, replay skips, staleness accumulates") {
    val base = frameOf((0 until 150).map(s => (s.toLong, png(s))))
    val extra = frameOf((150 until 260).map(s => (s.toLong, png(s))) :+
      (3000L, png(17, flip = 99))) // a near-copy of a probe image
    val grown = tmpDir("imgidx5") + "/idx"
    val rebuilt = tmpDir("imgidx6") + "/idx"
    ImageIndex.build(base, grown, maxHamming = 7)
    val r1 = ImageIndex.append(extra, grown)
    assert(r1.appended == 111 && r1.skipped == 0, s"$r1")
    // replay of the same batch: everything anti-joins away
    val r2 = ImageIndex.append(extra, grown)
    assert(r2.appended == 0 && r2.skipped == 111, s"$r2")
    assert(r2.totalPostings == r1.totalPostings, s"replay grew the index: $r2")
    // staleness vs the build-time layout: 111/150 postings-per-image
    // cancels — and it crossed the default rebuild advice threshold
    assert(math.abs(r1.staleness - 111.0 / 150) < 1e-9 && r1.rebuildAdvised,
      s"$r1")
    // probe equivalence with a from-scratch build over the union
    ImageIndex.build(frameOf(
      ((0 until 260).map(s => (s.toLong, png(s))) :+
        (3000L, png(17, flip = 99)))), rebuilt, maxHamming = 7)
    val probes = frameOf(Seq((17L, png(17)), (200L, png(200))))
    def res(path: String) = ImageIndex.topK(spark, path, probes, k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaGrown = res(grown)
    assert(viaGrown == res(rebuilt),
      s"append diverged from rebuild: $viaGrown vs ${res(rebuilt)}")
    assert(viaGrown.exists(r => r._1 == 17L && r._2 == 3000L),
      s"appended near-copy must be findable: $viaGrown")
  }

  test("topKOriented: a quarter-turn re-save is findable; the store stays orientation-free") {
    // a 90°-cw re-save of image 17's plane stored as its OWN 16×24 file
    def rotCw(p: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](p.length)
      for (y <- 0 until h; x <- 0 until w)
        out(x * h + (h - 1 - y)) = p(y * w + x)
      out
    }
    val corpus = frameOf((0 until 120).map(s => (s.toLong, png(s))) :+
      (5000L, Multimodal.storedGrayPng(rotCw(planeOf(17), 24, 16), 16, 24)))
    val path = tmpDir("imgidx_rot") + "/idx"
    ImageIndex.build(corpus, path, maxHamming = 7)
    val probes = frameOf(Seq((17L, png(17))))
    // the plain probe finds the un-rotated original but NOT the rotated
    // re-save — the documented store boundary
    val plain = ImageIndex.topK(spark, path, probes, k = 8)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(plain.contains((17L, 0)), s"$plain")
    assert(!plain.exists(_._1 == 5000L),
      s"fixture must make the plain probe miss the rotation: $plain")
    // the oriented probe finds BOTH at hamming 0 — the rotated probe
    // plane IS the stored copy's plane, and the store was not touched
    val oriented = ImageIndex.topKOriented(spark, path, probes, k = 8)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet
    assert(oriented.contains((17L, 0)) && oriented.contains((5000L, 0)),
      s"oriented probe must find the quarter-turn re-save: $oriented")
    // and every plain hit is still present (min-hamming can only help)
    assert(plain.subsetOf(oriented), s"plain=$plain oriented=$oriented")
    // a probe with no decodable plane and no geometry honestly returns
    // nothing (no hash to rotate, no payload regime to fall back to)
    val none = ImageIndex.topKOriented(spark, path,
      frameOf(Seq((9L, "not an image".getBytes("UTF-8")))), k = 3)
    assert(none.collect().isEmpty)
    // probe schemas accepted elsewhere in the image family work here
    // too (ADVICE r11): LONG width/height cast down, and NULL geometry
    // on a decodable payload never reaches the fallback read
    val longGeom = Seq((17L, png(17))).toDF("doc_id", "media")
      .withColumn("width", lit(24L)).withColumn("height", lit(16L))
    assert(ImageIndex.topKOriented(spark, path, longGeom, k = 8)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet == oriented)
    val nullGeom = Seq((17L, png(17))).toDF("doc_id", "media")
      .withColumn("width", lit(null).cast("int"))
      .withColumn("height", lit(null).cast("int"))
    assert(ImageIndex.topKOriented(spark, path, nullGeom, k = 8)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSet == oriented)
  }

  test("build rejects bounds too wide to prune; topK uses the stored bound") {
    val corpus = frameOf((0 until 4).map(s => (s.toLong, png(s))))
    val e = intercept[IllegalArgumentException] {
      ImageIndex.build(corpus, tmpDir("imgidx3") + "/idx", maxHamming = 10)
    }
    assert(e.getMessage.contains("imageTopK"))
    val path = tmpDir("imgidx4") + "/idx"
    ImageIndex.build(corpus, path, maxHamming = 3)
    assert(ImageIndex.boundOf(spark, path) == 3)
    // rebuild at a different bound swaps atomically; the probe follows
    ImageIndex.build(corpus, path, maxHamming = 5)
    assert(ImageIndex.boundOf(spark, path) == 5)
    val got = ImageIndex.topK(spark, path,
      frameOf(Seq((2L, png(2)))), k = 2).collect()
    assert(got.exists(r => r.getLong(1) == 2L && r.getInt(2) == 0),
      s"self-match after rebuild: ${got.toSeq}")
    // takedown through the shared core: forgotten image unfindable
    // immediately (full lifecycle held by SimhashIndexSpec — same code)
    ImageIndex.forget(spark, path, Seq(2L).toDF("doc_id"))
    val masked = ImageIndex.topK(spark, path,
      frameOf(Seq((2L, png(2)))), k = 2).collect()
    assert(!masked.exists(_.getLong(1) == 2L),
      s"forgotten image still ranks: ${masked.toSeq}")
  }
}
