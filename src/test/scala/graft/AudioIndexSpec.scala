package graft

import org.apache.spark.sql.functions._
import graft.ext.{AudioFingerprint, AudioIndex}

/** The persisted audio-fingerprint posting index: indexed top-k must
  * EQUAL the full-scan store form (exact keys, exact shared counts), a
  * probe must read less of the postings than a full scan (the layout's
  * whole point — held via task input metrics, the ImageIndexSpec
  * method), the append/forget lifecycle must match the HammingIndex
  * discipline, and the artifact's fingerprint parameters must drive
  * every probe (a parameter mismatch is impossible by construction).
  */
class AudioIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Sr = 8000
  // the unique-tones fixture of AudioFingerprintSpec: seeds < 24 keep
  // every tone under Nyquist AND globally unique (discrimination by
  // construction); the wide pruning fixture reuses bins via % 140
  private def seqOf(seed: Int): Seq[(Double, Int)] =
    (0 until 6).map(i => (300.0 + (seed * 6 + i) * 25.0, 1024))
  private def wav(seed: Int, amp: Double = 0.5): Array[Byte] =
    AudioFingerprint.tonesWav(Sr, seqOf(seed), amp)
  private def wideWav(seed: Int): Array[Byte] =
    AudioFingerprint.tonesWav(Sr,
      (0 until 6).map(i => (300.0 + ((seed * 17 + i * 31) % 140) * 25.0,
        1024)), 0.5)

  private def resSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("indexed topK EQUALS the full-scan store form (and the one-shot)") {
    val corpus = (0 until 14).map(k => (k.toLong, wav(k)))
      .toDF("doc_id", "media")
    // five re-mastered probes plus one never-seen recording
    val probes = ((0 until 5).map(k => (500L + k, wav(k, 0.3))) :+
      (900L, wav(20))).toDF("doc_id", "media")
    val store = tmpDir("audidx_store") + "/s"
    AudioFingerprint.ingest(spark, corpus, store)
    val path = tmpDir("audidx1") + "/idx"
    AudioIndex.build(spark, corpus, path)
    val viaIndex = resSet(AudioIndex.topK(spark, path, probes, k = 3))
    val viaStore = resSet(
      AudioFingerprint.audioTopKStore(spark, store, probes, k = 3))
    val viaOneShot = resSet(
      AudioFingerprint.audioTopK(spark, corpus, probes, k = 3))
    assert(viaIndex == viaStore,
      s"index diverged from the store scan:\n  index: $viaIndex\n" +
        s"  store: $viaStore")
    assert(viaIndex == viaOneShot, s"one-shot diverged: $viaOneShot")
    // planted truth: each probe's single match is its source recording;
    // the never-seen probe returns nothing (honest bounded answer)
    assert(viaIndex.map(r => (r._1, r._2)) ==
      (0 until 5).map(k => (500L + k, k.toLong)).toSet, s"$viaIndex")
  }

  test("a probe reads less of the postings than a full scan (pruning)") {
    val corpus = (0 until 800).map(k => (k.toLong, wideWav(k)))
      .toDF("doc_id", "media")
    val path = tmpDir("audidx2") + "/idx"
    AudioIndex.build(spark, corpus, path, files = 64)
    val probes = Seq((9017L, wideWav(17))).toDF("doc_id", "media")
    // Spark's own task input metrics (see ImageIndexSpec: FS statistics
    // under-count the nio path, so the baseline carries a trivially-true
    // PUSHED predicate to run the same counted reader)
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
      hits = AudioIndex.topK(spark, path, probes, k = 3).collect()
    }
    assert(hits.exists(_.getLong(1) == 17L),
      s"self-match must surface: ${hits.toSeq}")
    val fullBytes = measured {
      spark.read.parquet(s"$path/postings")
        .filter(col("fp") >= 0L).collect()
    }
    assert(probeBytes < fullBytes / 2,
      s"probe read $probeBytes input bytes, not well below the full " +
        s"scan's $fullBytes — the sorted fp bands are not pruning")
  }

  test("append: probe-equivalent to rebuild, replay skips, forget/readmit") {
    val base = (0 until 10).map(k => (k.toLong, wav(k)))
      .toDF("doc_id", "media")
    val extra = ((10 until 16).map(k => (k.toLong, wav(k))) :+
      (3000L, wav(3, 0.25))).toDF("doc_id", "media") // near-copy of 3
    val grown = tmpDir("audidx3") + "/idx"
    val rebuilt = tmpDir("audidx4") + "/idx"
    AudioIndex.build(spark, base, grown)
    val r1 = AudioIndex.append(spark, extra, grown)
    assert(r1.appended > 0 && r1.skipped == 0, s"$r1")
    // replay: everything anti-joins away, the index does not grow
    val r2 = AudioIndex.append(spark, extra, grown)
    assert(r2.appended == 0 && r2.skipped == r1.appended, s"$r2")
    assert(r2.totalPostings == r1.totalPostings, s"replay grew the index: $r2")
    assert(r1.staleness > 0.5 && r1.rebuildAdvised, s"$r1")
    AudioIndex.build(spark,
      base.unionByName(extra), rebuilt)
    val probes = Seq((500L, wav(3, 0.4)), (501L, wav(12, 0.3)))
      .toDF("doc_id", "media")
    def res(path: String) = resSet(AudioIndex.topK(spark, path, probes, k = 4))
    val viaGrown = res(grown)
    assert(viaGrown == res(rebuilt),
      s"append diverged from rebuild: $viaGrown vs ${res(rebuilt)}")
    assert(viaGrown.exists(r => r._1 == 500L && r._2 == 3000L),
      s"appended near-copy must be findable: $viaGrown")
    assert(viaGrown.exists(r => r._1 == 501L && r._2 == 12L),
      s"appended recording must be findable: $viaGrown")

    // takedown: forgotten recordings stop ranking immediately
    AudioIndex.forget(spark, grown, Seq(3L, 3000L).toDF("doc_id"))
    val masked = resSet(AudioIndex.topK(spark, grown, probes, k = 4))
    assert(!masked.exists(r => r._2 == 3L || r._2 == 3000L),
      s"forgotten recordings still rank: $masked")
    assert(masked.exists(r => r._1 == 501L && r._2 == 12L),
      s"unrelated recordings must keep ranking: $masked")
    // explicit re-ingest readmits (the store family's semantics)
    val r3 = AudioIndex.append(spark,
      Seq((3L, wav(3))).toDF("doc_id", "media"), grown)
    // counts are POSTING rows: the already-indexed recording's ~50
    // landmarks all skip, none append
    assert(r3.appended == 0 && r3.skipped > 0,
      s"readmit must not duplicate postings: $r3")
    val back = resSet(AudioIndex.topK(spark, grown, probes, k = 4))
    assert(back.exists(r => r._1 == 500L && r._2 == 3L),
      s"readmitted recording must rank again: $back")
    // rebuild clears the remaining tombstones with the layout
    AudioIndex.build(spark, base.unionByName(extra), grown)
    val cleared = resSet(AudioIndex.topK(spark, grown, probes, k = 4))
    assert(cleared.exists(r => r._2 == 3000L),
      s"rebuild must clear tombstones: $cleared")
  }

  test("compact: re-packs appended files, erases tombstones, keeps results") {
    val base = (0 until 8).map(k => (k.toLong, wav(k))).toDF("doc_id", "media")
    val extra = (8 until 14).map(k => (k.toLong, wav(k))).toDF("doc_id", "media")
    val path = tmpDir("audidx6") + "/idx"
    AudioIndex.build(spark, base, path, files = 4)
    AudioIndex.append(spark, extra, path)
    AudioIndex.forget(spark, path, Seq(2L).toDF("doc_id"))
    val probes = Seq((500L, wav(10, 0.3)), (501L, wav(2, 0.3)))
      .toDF("doc_id", "media")
    def res = resSet(AudioIndex.topK(spark, path, probes, k = 2))
    val before = res
    assert(before.exists(r => r._1 == 500L && r._2 == 10L) &&
      !before.exists(_._2 == 2L), s"$before")
    // the default fan-out is the BUILD-time one from build_meta
    // (ADVICE r11) — this index was built at files = 4, not the
    // builder's default 32
    val (fb, fa) = AudioIndex.compact(spark, path)
    assert(fa == 4 && fb > fa, s"$fb -> $fa")
    assert(res == before, s"compaction changed results: $res vs $before")
    assert(spark.read.parquet(s"$path/postings")
        .filter(col("doc_id") === 2L).count() == 0,
      "forgotten postings must be physically erased")
    val r = AudioIndex.append(spark, extra, path)
    assert(r.appended == 0 && r.staleness == 0.0 && !r.rebuildAdvised, s"$r")
  }

  test("the artifact's fingerprint parameters drive every probe") {
    val corpus = (0 until 6).map(k => (k.toLong, wav(k)))
      .toDF("doc_id", "media")
    val path = tmpDir("audidx5") + "/idx"
    val custom = AudioFingerprint.Params(frameSize = 256, hop = 128)
    AudioIndex.build(spark, corpus, path, custom)
    val got = AudioIndex.paramsOf(spark, path)
    assert(got.frameSize == 256 && got.hop == 128, s"$got")
    // a probe fingerprints with the ARTIFACT's parameters (not the
    // caller's defaults), so the planted match still surfaces
    val hits = AudioIndex.topK(spark, path,
      Seq((500L, wav(2, 0.3))).toDF("doc_id", "media"), k = 1).collect()
    assert(hits.length == 1 && hits.head.getLong(1) == 2L,
      s"probe under artifact params must match: ${hits.toSeq}")
  }
}
