package graft

import org.apache.spark.sql.functions._
import graft.ext.{IncrementalKeyedDedup, KeyBloom}

/** Bloom sidecars for the durable dedup stores: the no-false-negative
  * invariant (the ONLY thing correctness rests on), the sizing math, the
  * sidecar round-trip, and the store-level lifecycle — legacy stores
  * stay bloom-less until compaction arms full coverage.
  */
class KeyBloomSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("no false negatives, ever: every added key is contained") {
    val keys = Array.fill(20000)(rnd.nextLong())
    val b = KeyBloom.create(keys.length, bitsPerKey = 16)
    keys.foreach(b.add)
    assert(keys.forall(b.contains), "a Bloom filter false negative")
  }

  test("false-positive rate lands near the sizing math (16 b/key ~ 0.05%)") {
    val keys = Array.fill(50000)(rnd.nextLong())
    val b = KeyBloom.create(keys.length, bitsPerKey = 16)
    keys.foreach(b.add)
    val probes = Array.fill(50000)(rnd.nextLong()).filterNot(keys.contains)
    val fp = probes.count(b.contains).toDouble / probes.length
    assert(fp < 0.005, f"FPR $fp%.5f is far off the ~0.0005 design point")
  }

  test("distributed build == local build (treeAggregate OR is lossless)") {
    val keys = Seq.fill(5000)(rnd.nextLong()).distinct
    val local = KeyBloom.create(keys.length, 16)
    keys.foreach(local.add)
    val dist = KeyBloom.build(spark,
      keys.toDF("key_hash").repartition(8), keys.length, 16)
    assert(dist.words.toSeq === local.words.toSeq)
  }

  test("sidecar round-trips through parquet bit-exactly") {
    val dir = tmpDir("bloomrt") + "/bloom"
    val keys = Seq.fill(1000)(rnd.nextLong())
    val b = KeyBloom.create(keys.length, 16)
    keys.foreach(b.add)
    KeyBloom.writeSidecar(spark, dir, b, keys.length)
    val loaded = KeyBloom.loadSidecars(spark, dir, Long.MaxValue).get
    assert(loaded.size === 1)
    assert(loaded.head.numBits === b.numBits)
    assert(loaded.head.numHashes === b.numHashes)
    assert(loaded.head.words.toSeq === b.words.toSeq)
  }

  test("loadSidecars honors the byte budget (over budget -> None -> full scan)") {
    val dir = tmpDir("bloombudget") + "/bloom"
    val b = KeyBloom.create(10000, 16)
    KeyBloom.writeSidecar(spark, dir, b, 10000)
    assert(KeyBloom.loadSidecars(spark, dir, maxBloomBytes = 16).isEmpty)
    assert(KeyBloom.loadSidecars(spark, dir, Long.MaxValue).nonEmpty)
  }

  test("store lifecycle: born-with-bloom stores write a sidecar per ingest") {
    val store = tmpDir("bloomlife1") + "/store"
    IncrementalKeyedDedup.ingest(spark,
      Seq((1L, "x")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    IncrementalKeyedDedup.ingest(spark,
      Seq((2L, "y")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    val sidecars = KeyBloom.loadSidecars(spark, s"$store/bloom", Long.MaxValue)
    assert(sidecars.map(_.size) === Some(2), s"one sidecar per ingest")
    // the sidecars cover exactly the registered keys
    val stored = spark.read.parquet(s"$store/keys")
      .select("key_hash").as[Long].collect()
    assert(stored.forall(kh => sidecars.get.exists(_.contains(kh))),
      "a committed key no sidecar covers — coverage invariant broken")
  }

  test("legacy store (keys without blooms) never writes partial sidecars; " +
      "compaction arms them") {
    val store = tmpDir("bloomlife2") + "/store"
    // a store created before the bloom feature: keys/ exists, bloom/ absent
    Seq((100L, 1L)).map { case (kh, id) => (kh, id) }
      .toDF("key_hash", "doc_id").write.parquet(s"$store/keys")
    val out = IncrementalKeyedDedup.ingest(spark,
      Seq((2L, "z")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(2L))
    assert(!new java.io.File(s"$store/bloom").exists(),
      "a sidecar was written that cannot cover the legacy keys")
    // compaction rebuilds ONE sidecar over ALL live keys — coverage
    // restored, pruning active from here on
    IncrementalKeyedDedup.compactStore(spark, store)
    val armed = KeyBloom.loadSidecars(spark, s"$store/bloom", Long.MaxValue)
    assert(armed.map(_.size) === Some(1))
    val stored = spark.read.parquet(s"$store/keys")
      .select("key_hash").as[Long].collect()
    assert(stored.forall(armed.get.head.contains),
      "post-compaction bloom misses a live key")
    // and a replayed key still resolves against the store through it
    val replay = IncrementalKeyedDedup.ingest(spark,
      Seq((9L, "z")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    assert(replay.select("doc_id").as[Long].collect().isEmpty,
      "known key admitted — bloom pruned a real collision")
  }

  test("compaction folds forgotten owners OUT of the rebuilt bloom") {
    val store = tmpDir("bloomlife3") + "/store"
    IncrementalKeyedDedup.ingest(spark,
      Seq((1L, "x"), (2L, "y")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    IncrementalKeyedDedup.forget(spark, store, Seq(Tuple1(1L)).toDF("doc_id"))
    IncrementalKeyedDedup.compactStore(spark, store)
    val armed = KeyBloom.loadSidecars(spark, s"$store/bloom", Long.MaxValue).get
    val live = spark.read.parquet(s"$store/keys")
      .select("key_hash").as[Long].collect()
    assert(live.forall(kh => armed.exists(_.contains(kh))))
    // forgotten x re-admits and re-registers: the new sidecar covers it
    val after = IncrementalKeyedDedup.ingest(spark,
      Seq((11L, "x"), (12L, "y")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    assert(after.select("doc_id").as[Long].collect().toSet === Set(11L))
    val again = IncrementalKeyedDedup.ingest(spark,
      Seq((21L, "x")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    assert(again.select("doc_id").as[Long].collect().isEmpty,
      "re-admitted key must block again through the armed blooms")
  }

  test("over-budget compaction DISABLES blooms rather than keeping stale ones") {
    val store = tmpDir("bloomlife4") + "/store"
    IncrementalKeyedDedup.ingest(spark,
      Seq((1L, "x")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    assert(new java.io.File(s"$store/bloom").exists())
    IncrementalKeyedDedup.compactStore(spark, store, maxBloomBytes = 1)
    assert(!new java.io.File(s"$store/bloom").exists(),
      "an over-budget store must drop its bloom dir entirely")
    // probes fall back to the full scan and stay correct; and with the
    // bloom dir gone, later ingests write no partial sidecars
    val out = IncrementalKeyedDedup.ingest(spark,
      Seq((9L, "x"), (10L, "w")).toDF("doc_id", "k"), "doc_id", col("k"), store)
    assert(out.select("doc_id").as[Long].collect().toSet === Set(10L))
    assert(!new java.io.File(s"$store/bloom").exists())
  }
}
