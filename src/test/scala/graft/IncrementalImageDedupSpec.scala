package graft

import org.apache.spark.sql.functions._
import graft.ext.{IncrementalImageDedup, Multimodal}

/** Durable image-signature store: the properties the oracled
  * `ext_image_incr` gate (two-ingest == all-pairs truth) does not
  * isolate — multi-split equivalence with the one-shot operator,
  * idempotent replay, and the forget/compact erasure path.
  */
class IncrementalImageDedupSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.mediaTable(
    Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 200))

  private def pairSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("three-ingest run equals the one-shot operator over the union") {
    val store = tmpDir("imgstore") + "/s"
    val oneShot = pairSet(Multimodal.imageNearDups(media, maxHamming = 10))
    val inc =
      pairSet(IncrementalImageDedup.ingest(spark,
        media.filter(col("doc_id") < 70), store)) ++
      pairSet(IncrementalImageDedup.ingest(spark,
        media.filter(col("doc_id") >= 70 && col("doc_id") < 140), store)) ++
      pairSet(IncrementalImageDedup.ingest(spark,
        media.filter(col("doc_id") >= 140), store))
    assert(inc == oneShot,
      s"incremental/one-shot diverge: only-inc=${inc -- oneShot} " +
        s"only-oneshot=${oneShot -- inc}")
    assert(IncrementalImageDedup.storedDocs(spark, store) == media.count())
  }

  test("re-ingesting an already-stored image reports the cross pair, not a self pair") {
    val store = tmpDir("imgstore2") + "/s"
    val one = media.filter(col("doc_id") === 3)
    IncrementalImageDedup.ingest(spark, one, store)
    // identical bytes under a fresh id: hamming-0 pair against the store
    val copy = one.withColumn("doc_id", lit(9999L))
    val found = pairSet(IncrementalImageDedup.ingest(spark, copy, store))
    assert(found == Set((3L, 9999L, 0)), s"$found")
    // replay of the SAME id: no self pair, store unchanged
    val replay = pairSet(IncrementalImageDedup.ingest(spark, one, store))
    assert(!replay.exists(p => p._1 == 3L && p._2 == 3L), s"$replay")
    assert(IncrementalImageDedup.storedDocs(spark, store) == 2)
  }

  /** Bytes read through the local Hadoop FileSystem — the honest
    * measure of the bloom skip: it removes store-file SCAN work.
    * (Job counts and task input-records are a wash at fixture scale:
    * the bloom adds fixed tiny jobs, and cached localCheckpoint block
    * reads pollute the records metric.)
    */
  private def fileBytesRead(): Long = {
    import scala.jdk.CollectionConverters._
    org.apache.hadoop.fs.FileSystem.getAllStatistics.asScala
      .filter(_.getScheme == "file").map(_.getBytesRead).sum
  }

  test("bloom lifecycle: sidecars cover every key, all-new batch skips the store scan") {
    import graft.ext.{Dedup, KeyBloom}
    val store = tmpDir("imgstore4") + "/s"
    IncrementalImageDedup.ingest(spark,
      media.filter(col("doc_id") < 50), store)
    IncrementalImageDedup.ingest(spark,
      media.filter(col("doc_id") >= 50 && col("doc_id") < 100), store)
    val sidecars =
      KeyBloom.loadSidecars(spark, s"$store/bloom_mh10", Long.MaxValue)
    assert(sidecars.map(_.size) == Some(2), "one sidecar per registering ingest")
    // coverage invariant: every committed blocking key is in some sidecar
    val keys = spark.read.parquet(s"$store/sigs")
      .select(explode(Dedup.shChunks(col("sh"), 10)).as("cc"))
      .select(xxhash64(col("cc.chunk"), col("cc.cval")).as("kh"))
      .as[Long].collect()
    assert(keys.nonEmpty && keys.forall(h => sidecars.get.exists(_.contains(h))),
      "a committed blocking key no sidecar covers")

    // all-new batch: armed store vs the same store with blooms stripped
    // (legacy) — the armed probe must read strictly fewer STORE BYTES
    // (the probe and verify store scans are skipped; the registration
    // read prunes on disjoint id bounds). The skip regime needs SPARSE
    // blocking keys, so this half runs at maxHamming = 3 (16-bit
    // chunks) against a 400-image store — at the 5-bit chunks of
    // maxHamming = 10 the keyspace saturates and the probe deliberately
    // bypasses the filter (see blockingKeyspace).
    def png(seed: Int) = {
      val plane = Array.tabulate(24 * 16) { p =>
        val x = p % 24; val y = p / 24
        (((x * (13 + seed % 7) + y * (7 + seed % 5) +
          x * y * (1 + seed % 3)) * 3 + seed * 29) % 251).toByte
      }
      Multimodal.storedGrayPng(plane, 24, 16)
    }
    def frameOf(seedIds: Seq[Int]) =
      seedIds.map(s => (s.toLong, png(s), 0, 0))
        .toDF("doc_id", "media", "width", "height")
    // offline-verified fixture: these 20 seeds' mh=3 blocking keys are
    // fully DISJOINT from the 1474 distinct keys of the 1000..1399
    // store (and their hashes pairwise > 10 bits apart), so the batch
    // is PROVABLY skippable
    val batchSeeds = Seq(2, 10, 16, 19, 31, 50, 53, 66, 73, 74,
      75, 78, 79, 83, 87, 88, 90, 92, 100, 110)
    val mh3 = IncrementalImageDedup.Params(maxHamming = 3)
    val store3 = tmpDir("imgstore5") + "/s"
    IncrementalImageDedup.ingest(spark, frameOf(1000 until 1400), store3, mh3)
    var armedPairs: Set[(Long, Long, Int)] = null
    val a0 = fileBytesRead()
    armedPairs = pairSet(IncrementalImageDedup.ingest(spark,
      frameOf(batchSeeds), store3, mh3))
    val armedBytes = fileBytesRead() - a0
    assert(armedPairs.isEmpty, s"key-disjoint images must not pair: $armedPairs")
    val fs = new org.apache.hadoop.fs.Path(store3)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$store3/bloom_mh3"), true)
    val l0 = fileBytesRead()
    IncrementalImageDedup.ingest(spark, frameOf(5000 until 5020), store3, mh3)
    val legacyBytes = fileBytesRead() - l0
    assert(armedBytes < legacyBytes,
      s"bloom-armed all-new ingest read $armedBytes file bytes, " +
        s"not below the bloom-less probe's $legacyBytes")
    // legacy store: no sidecar may be written once coverage lapsed
    assert(!new java.io.File(s"$store3/bloom_mh3").exists(),
      "sidecar written that cannot cover the legacy sigs")
    // and a true re-crawl is STILL caught through the armed-bloom path
    // of a sparse store (no false negatives)
    val store4 = tmpDir("imgstore6") + "/s"
    IncrementalImageDedup.ingest(spark, frameOf(batchSeeds), store4, mh3)
    val recrawl = pairSet(IncrementalImageDedup.ingest(spark,
      Seq((99999L, png(73), 0, 0)).toDF("doc_id", "media", "width", "height"),
      store4, mh3))
    assert(recrawl == Set((73L, 99999L, 0)), s"recrawl lost through bloom: $recrawl")

    // compaction re-arms ONE right-sized sidecar over the live keys and
    // replays still collide through it
    IncrementalImageDedup.compactStore(spark, store)
    val armed = KeyBloom.loadSidecars(spark, s"$store/bloom_mh10", Long.MaxValue)
    assert(armed.map(_.size) == Some(1), s"compaction must rebuild one sidecar")
    val allKeys = spark.read.parquet(s"$store/sigs")
      .select(explode(Dedup.shChunks(col("sh"), 10)).as("cc"))
      .select(xxhash64(col("cc.chunk"), col("cc.cval")).as("kh"))
      .as[Long].collect()
    assert(allKeys.forall(armed.get.head.contains),
      "post-compaction bloom misses a live blocking key")
    val replay = pairSet(IncrementalImageDedup.ingest(spark,
      media.filter(col("doc_id") === 3).withColumn("doc_id", lit(6666L)),
      store))
    assert(replay.exists(p => p._1 == 3L && p._2 == 6666L),
      s"re-crawl admitted past the armed bloom: $replay")

    // a differently-parameterized ingest must DROP the stale bloom dir
    // (its keys no longer cover) rather than consult it
    IncrementalImageDedup.ingest(spark,
      media.filter(col("doc_id") === 7).withColumn("doc_id", lit(5555L)),
      store, IncrementalImageDedup.Params(maxHamming = 6))
    assert(!new java.io.File(s"$store/bloom_mh10").exists(),
      "stale bloom_mh10 survived an mh=6 ingest")
  }

  test("signature-regime marker: a pre-regime or mismatched store refuses ingest") {
    val store = tmpDir("imgstore_regime") + "/s"
    IncrementalImageDedup.ingest(spark, media.filter(col("doc_id") === 3), store)
    val p = new org.apache.hadoop.fs.Path(s"$store/sig_regime")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(p), "store must be born with its regime marker")
    // a store that PREDATES regime tracking (no marker) holds byte-regime
    // signatures for decodable images: probing it with pixel-regime
    // hashes would silently lose recall, so it must fail LOUDLY
    fs.delete(p, false)
    val e1 = intercept[IllegalArgumentException] {
      IncrementalImageDedup.ingest(spark,
        media.filter(col("doc_id") === 5), store)
    }
    assert(e1.getMessage.contains("Rebuild"), e1.getMessage)
    // and so must an explicitly different regime
    val out = fs.create(p, true)
    out.write("dhash_bytes 1\n".getBytes("UTF-8")); out.close()
    val e2 = intercept[IllegalArgumentException] {
      IncrementalImageDedup.ingest(spark,
        media.filter(col("doc_id") === 5), store)
    }
    assert(e2.getMessage.contains("dhash_bytes"), e2.getMessage)
    // restoring the marker restores service
    val out2 = fs.create(p, true)
    out2.write(s"${IncrementalImageDedup.SigRegime}\n".getBytes("UTF-8"))
    out2.close()
    IncrementalImageDedup.ingest(spark,
      media.filter(col("doc_id") === 5), store)
    assert(IncrementalImageDedup.storedDocs(spark, store) == 2)
  }

  test("forget: fresh copies readmit, compaction erases physically") {
    val store = tmpDir("imgstore3") + "/s"
    val one = media.filter(col("doc_id") === 5)
    IncrementalImageDedup.ingest(spark, one, store)
    // blocked while remembered
    val c1 = pairSet(IncrementalImageDedup.ingest(spark,
      one.withColumn("doc_id", lit(8888L)), store))
    assert(c1 == Set((5L, 8888L, 0)), s"$c1")
    IncrementalImageDedup.forget(spark, store, Seq(5L, 8888L).toDF("doc_id"))
    // after the forget: the same content under another fresh id pairs
    // with NOTHING — the store no longer remembers it
    val c2 = pairSet(IncrementalImageDedup.ingest(spark,
      one.withColumn("doc_id", lit(7777L)), store))
    assert(c2.isEmpty, s"forgotten content still blocks: $c2")
    // compaction folds the tombstones: only the live id remains stored
    IncrementalImageDedup.compactStore(spark, store)
    val left = spark.read.parquet(s"$store/sigs")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(left == Set(7777L), s"tombstones not folded: $left")
  }
}
