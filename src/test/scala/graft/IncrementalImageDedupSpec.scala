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
