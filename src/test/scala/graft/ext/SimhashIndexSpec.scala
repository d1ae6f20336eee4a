package graft.ext

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** The persisted Hamming-space TEXT index (SimhashIndex — the SimHash
  * instantiation of the HammingIndex core): bounded-distance top-k must
  * EQUAL an INDEPENDENTLY computed exhaustive baseline restricted to
  * the bound (plain-Scala brute force over the same signatures — no
  * engine helper on the expected side), appends must be
  * probe-equivalent to a rebuild, and un-prunable bounds must be
  * rejected at build time. The pruning bytes-read property is held by
  * ImageIndexSpec over the SHARED HammingIndex layout/probe code — not
  * duplicated here.
  */
class SimhashIndexSpec extends SparkSpec {
  import spark.implicits._

  /** ~40-token documents over a deterministic vocabulary; `edit`
    * replaces that many tokens — a light rewrite lands a few simhash
    * bits away, a re-crawl (edit = 0, different id) at exactly 0.
    */
  private def doc(seed: Int, edit: Int = 0): String =
    (0 until 40).map { i =>
      if (i < edit) s"edited${seed}x$i"
      else s"w${(seed * 17 + i * 13) % 997}tok$i"
    }.mkString(" ")

  private def frameOf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  private def shOf(df: DataFrame): Map[Long, Long] =
    Dedup.simhashFrame(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Plain-Scala bounded top-k: hamming asc, doc_id asc, take k. */
  private def bruteTopK(corpus: Map[Long, Long], probes: Map[Long, Long],
      bound: Int, k: Int): Set[(Long, Long, Int)] =
    probes.toSeq.flatMap { case (qid, qsh) =>
      corpus.toSeq
        .map { case (id, sh) =>
          (qid, id, java.lang.Long.bitCount(qsh ^ sh)) }
        .filter(_._3 <= bound)
        .sortBy(t => (t._3, t._2))
        .take(k)
    }.toSet

  test("bounded top-k equals the brute-force baseline restricted to the bound") {
    val corpus = frameOf(
      (0 until 200).map(s => (s.toLong, doc(s))) ++
        Seq(0, 7, 13).flatMap(s => Seq(
          (1000L + s, doc(s)),            // exact re-crawl, new id
          (2000L + s, doc(s, edit = 2)))) // light rewrite
    )
    val probes = frameOf(Seq(0, 7, 13).map(s => (s.toLong, doc(s))))
    val path = tmpDir("shidx1") + "/idx"
    SimhashIndex.build(corpus, "doc_id", "text", path, maxHamming = 7)
    assert(SimhashIndex.exists(spark, path) &&
      SimhashIndex.boundOf(spark, path) == 7)
    val got = SimhashIndex.topK(spark, path, probes, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val expected = bruteTopK(shOf(corpus), shOf(probes), bound = 7, k = 8)
    assert(expected.exists(t => t._2 >= 1000L && t._3 == 0),
      s"fixture must plant an exact re-crawl in bound, got $expected")
    assert(got == expected,
      s"index result diverged from the bounded brute force:\n" +
        s"  index: $got\n  brute: $expected")
  }

  test("append: probe-equivalent to rebuild, replay skips, staleness accumulates") {
    val base = (0 until 150).map(s => (s.toLong, doc(s)))
    val extra = (150 until 260).map(s => (s.toLong, doc(s))) :+
      (3000L, doc(17)) // a re-crawl of a probe document
    val grown = tmpDir("shidx2") + "/idx"
    val rebuilt = tmpDir("shidx3") + "/idx"
    SimhashIndex.build(frameOf(base), "doc_id", "text", grown,
      maxHamming = 7)
    val r1 = SimhashIndex.append(frameOf(extra), "doc_id", "text", grown)
    assert(r1.appended == 111 && r1.skipped == 0, s"$r1")
    val r2 = SimhashIndex.append(frameOf(extra), "doc_id", "text", grown)
    assert(r2.appended == 0 && r2.skipped == 111, s"$r2")
    assert(r2.totalPostings == r1.totalPostings, s"replay grew the index: $r2")
    assert(math.abs(r1.staleness - 111.0 / 150) < 1e-9 && r1.rebuildAdvised,
      s"$r1")
    SimhashIndex.build(frameOf(base ++ extra), "doc_id", "text", rebuilt,
      maxHamming = 7)
    val probes = frameOf(Seq((17L, doc(17)), (200L, doc(200))))
    def res(path: String) =
      SimhashIndex.topK(spark, path, probes, "doc_id", "text", k = 6)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaGrown = res(grown)
    assert(viaGrown == res(rebuilt),
      s"append diverged from rebuild: $viaGrown vs ${res(rebuilt)}")
    assert(viaGrown.exists(r => r._1 == 17L && r._2 == 3000L && r._3 == 0),
      s"appended re-crawl must be findable at hamming 0: $viaGrown")
  }

  test("takedown: forget hides immediately, re-ingest readmits, rebuild clears") {
    val base = (0 until 60).map(s => (s.toLong, doc(s)))
    val path = tmpDir("shidx6") + "/idx"
    SimhashIndex.build(frameOf(base), "doc_id", "text", path, maxHamming = 7)
    val probe = frameOf(Seq((500L, doc(9))))
    def top1 = SimhashIndex.topK(spark, path, probe, "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(1), r.getInt(2))).toSeq
    assert(top1 == Seq((9L, 0)), s"pre-takedown self-match: $top1")
    // takedown: the compliance property — unfindable IMMEDIATELY, no
    // rebuild wait
    SimhashIndex.forget(spark, path, Seq(9L).toDF("doc_id"))
    assert(!top1.exists(_._1 == 9L) || top1.isEmpty,
      s"forgotten doc still ranks: $top1")
    // a SECOND forget accumulates; unrelated docs keep ranking
    SimhashIndex.forget(spark, path, Seq(23L).toDF("doc_id"))
    val other = SimhashIndex.topK(spark, path,
      frameOf(Seq((600L, doc(30)))), "doc_id", "text", k = 1)
      .collect().map(r => r.getLong(1)).toSeq
    assert(other == Seq(30L), s"unrelated doc must keep ranking: $other")
    // explicit re-ingest lifts the takedown (the store families'
    // forget→readmit semantics); the OTHER tombstone survives the
    // partial readmit rewrite
    val r = SimhashIndex.append(frameOf(Seq((9L, doc(9)))), "doc_id",
      "text", path)
    assert(r.appended == 0 && r.skipped == 1, s"$r") // postings existed
    assert(top1 == Seq((9L, 0)), s"readmitted doc must rank again: $top1")
    val probe23 = SimhashIndex.topK(spark, path,
      frameOf(Seq((700L, doc(23)))), "doc_id", "text", k = 1)
      .collect().map(r2 => r2.getLong(1)).toSeq
    assert(!probe23.contains(23L), s"doc 23 must stay forgotten: $probe23")
    // rebuild replaces the whole artifact: tombstones clear with it
    SimhashIndex.build(frameOf(base), "doc_id", "text", path, maxHamming = 7)
    val after = SimhashIndex.topK(spark, path,
      frameOf(Seq((800L, doc(23)))), "doc_id", "text", k = 1)
      .collect().map(r2 => r2.getLong(1)).toSeq
    assert(after == Seq(23L), s"rebuild must clear tombstones: $after")
  }

  test("compact: re-packs appended files, erases tombstones physically, resets staleness") {
    val base = (0 until 120).map(s => (s.toLong, doc(s)))
    val extra1 = (120 until 170).map(s => (s.toLong, doc(s)))
    val extra2 = (170 until 220).map(s => (s.toLong, doc(s)))
    val path = tmpDir("shidx7") + "/idx"
    SimhashIndex.build(frameOf(base), "doc_id", "text", path,
      maxHamming = 7, filesPerChunk = 4)
    SimhashIndex.append(frameOf(extra1), "doc_id", "text", path)
    SimhashIndex.append(frameOf(extra2), "doc_id", "text", path)
    SimhashIndex.forget(spark, path, Seq(17L).toDF("doc_id"))
    val probes = frameOf(Seq((500L, doc(150)), (501L, doc(17))))
    def res = SimhashIndex.topK(spark, path, probes, "doc_id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val before = res
    assert(before.exists(r => r._1 == 500L && r._2 == 150L && r._3 == 0) &&
      !before.exists(_._2 == 17L), s"$before")
    // compaction needs only the ARTIFACT — no corpus re-hash; the
    // DEFAULT fan-out is the one the index was BUILT at (pinned in
    // build_meta — ADVICE r11: a non-default build must not silently
    // re-pack at a hard-coded default)
    val (filesBefore, filesAfter) = SimhashIndex.compact(spark, path)
    // two appends added their own file sets; the packed layout is back
    // to exactly (maxHamming+1) * the BUILD-time filesPerChunk
    assert(filesAfter == 8 * 4 && filesBefore > filesAfter,
      s"$filesBefore -> $filesAfter")
    // probe results unchanged (minus nothing: the tombstone was already
    // masking) — and the tombstoned doc is now PHYSICALLY gone
    assert(res == before, s"compaction changed results: $res vs $before")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$path/forgotten")),
      "tombstones must clear with the compacted artifact")
    assert(spark.read.parquet(s"$path/postings")
        .filter(org.apache.spark.sql.functions.col("doc_id") === 17L)
        .count() == 0, "forgotten postings must be physically erased")
    // the row baseline reset: a replayed append is all-skip at ~0 staleness
    val r = SimhashIndex.append(frameOf(extra2), "doc_id", "text", path)
    assert(r.appended == 0 && r.staleness == 0.0 && !r.rebuildAdvised, s"$r")
    // fully-tombstoned: compaction refuses to produce an unrepresentable
    // empty artifact — no-op, the mask stays and probes stay empty
    SimhashIndex.forget(spark, path,
      ((0 until 220).map(_.toLong)).toDF("doc_id"))
    val (b2, a2) = SimhashIndex.compact(spark, path, filesPerChunk = 4)
    assert(b2 == a2, s"empty compact must be a no-op: $b2 -> $a2")
    assert(SimhashIndex.topK(spark, path, probes, "doc_id", "text", k = 2)
      .collect().isEmpty, "mask must hold after the refused compaction")
  }

  test("null-text rows: never indexed, never crash a probe") {
    val base = Seq((1L, doc(1)), (2L, null.asInstanceOf[String]),
      (3L, doc(3)))
    val path = tmpDir("shidx8") + "/idx"
    SimhashIndex.build(frameOf(base), "doc_id", "text", path, maxHamming = 7)
    // the null-text doc writes NO postings (a null signature would
    // explode into phantom null-cval rows inflating rows/staleness)
    assert(spark.read.parquet(s"$path/postings")
      .filter(org.apache.spark.sql.functions.col("doc_id") === 2L)
      .count() == 0, "null-text doc must not be indexed")
    // a null-text PROBE filters instead of throwing (the declarative
    // simhash form now emits (id, null sh) rows for them)
    val got = SimhashIndex.topK(spark, path,
      frameOf(Seq((500L, doc(1)), (501L, null.asInstanceOf[String]))),
      "doc_id", "text", k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == Set((500L, 1L, 0)), s"$got")
    // and appending a null-text batch is a clean no-op
    val r = SimhashIndex.append(
      frameOf(Seq((9L, null.asInstanceOf[String]))), "doc_id", "text", path)
    assert(r.appended == 0, s"$r")
  }

  test("build rejects un-prunable bounds; rebuild swaps the stored bound") {
    val corpus = frameOf((0 until 4).map(s => (s.toLong, doc(s))))
    val e = intercept[IllegalArgumentException] {
      SimhashIndex.build(corpus, "doc_id", "text",
        tmpDir("shidx4") + "/idx", maxHamming = 12)
    }
    assert(e.getMessage.contains("simhashNearDups"))
    val path = tmpDir("shidx5") + "/idx"
    SimhashIndex.build(corpus, "doc_id", "text", path, maxHamming = 3)
    assert(SimhashIndex.boundOf(spark, path) == 3)
    SimhashIndex.build(corpus, "doc_id", "text", path, maxHamming = 5)
    assert(SimhashIndex.boundOf(spark, path) == 5)
    val got = SimhashIndex.topK(spark, path,
      frameOf(Seq((2L, doc(2)))), "doc_id", "text", k = 2).collect()
    assert(got.exists(r => r.getLong(1) == 2L && r.getInt(2) == 0),
      s"self-match after rebuild: ${got.toSeq}")
  }
}
