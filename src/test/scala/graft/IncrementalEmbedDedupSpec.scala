package graft

import org.apache.spark.sql.functions._
import graft.ext.{IncrementalEmbedDedup, Similarity}
import graft.ext.IncrementalEmbedDedup.Params

/** The durable-store form of EMBEDDING near-dup must be equivalent to
  * the one-shot `Similarity.rpNearDups` over the accumulated corpus —
  * same contract as IncrementalDedupSpec, on the embedding side.
  */
class IncrementalEmbedDedupSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def universe = graft.queries.ExtQueries
    .plantedNearDupVectors(spark, dir)

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val P = Params(threshold = 0.99, maxHamming = 10)

  test("incremental ingests find exactly the one-shot pairs, batch by batch") {
    val vecs = universe
    val store = tmpDir("incembed") + "/store"
    // split so every planted twin (vec_id + 10000) lands in the SECOND
    // batch: all twin pairs must surface as cross-batch collisions
    val b1 = vecs.filter(col("vec_id") < 10000)
    val b2 = vecs.filter(col("vec_id") >= 10000)
    val p1 = pairsOf(IncrementalEmbedDedup.ingest(spark, b1, "vec_id",
      "v", store, P))
    val p2 = pairsOf(IncrementalEmbedDedup.ingest(spark, b2, "vec_id",
      "v", store, P))
    val oneShot = pairsOf(Similarity.rpNearDups(vecs, "vec_id", "v",
      threshold = 0.99, maxHamming = 10))
    assert((p1 ++ p2) == oneShot,
      s"missing=${oneShot -- (p1 ++ p2)} extra=${(p1 ++ p2) -- oneShot}")
    assert(oneShot.nonEmpty, "planted universe produced no near-dup pairs")
    assert(p2.forall { case (a, b) => a >= 10000 || b >= 10000 },
      "second ingest re-emitted store-only pairs")
  }

  test("re-ingest is idempotent on the store and re-emits its pairs") {
    val vecs = universe
    val store = tmpDir("incembed2") + "/store"
    val first = pairsOf(IncrementalEmbedDedup.ingest(spark, vecs, "vec_id",
      "v", store, P))
    def storeRows = spark.read.parquet(s"$store/vecs").count()
    val n1 = storeRows
    val again = pairsOf(IncrementalEmbedDedup.ingest(spark, vecs, "vec_id",
      "v", store, P))
    assert(storeRows == n1, "re-ingest duplicated store rows")
    assert(again == first, s"missing=${first -- again} extra=${again -- first}")
  }

  test("pq store: cross-batch pairs match the one-shot set with a ~10x smaller store") {
    val vecs = universe
    val exactStore = tmpDir("incembedpqa") + "/store"
    val pqStore = tmpDir("incembedpqb") + "/store"
    // pq-mode threshold 0.9: twins sit at exact cosine >= 0.997 and the
    // m=32 reconstruction keeps >= ~0.99 of it — an order-of-magnitude
    // margin — while background pairs stay far below either threshold
    val pqP = Params(threshold = 0.9, maxHamming = 10, pqM = 32, pqK = 64)
    val exP = Params(threshold = 0.9, maxHamming = 10)
    val b1 = vecs.filter(col("vec_id") < 10000)
    val b2 = vecs.filter(col("vec_id") >= 10000)
    val pqPairs =
      pairsOf(IncrementalEmbedDedup.ingest(spark, b1, "vec_id", "v", pqStore, pqP)) ++
      pairsOf(IncrementalEmbedDedup.ingest(spark, b2, "vec_id", "v", pqStore, pqP))
    val exactPairs =
      pairsOf(IncrementalEmbedDedup.ingest(spark, b1, "vec_id", "v", exactStore, exP)) ++
      pairsOf(IncrementalEmbedDedup.ingest(spark, b2, "vec_id", "v", exactStore, exP))
    // every exact-verify pair survives the quantized verify at this
    // margin (recall); quantization may only ADD pairs whose exact score
    // sits just under threshold — none exist in the planted universe
    assert(pqPairs == exactPairs,
      s"missing=${exactPairs -- pqPairs} extra=${pqPairs -- exactPairs}")
    assert(exactPairs.nonEmpty)
    def bytesOf(p: String): Long = {
      val f = new java.io.File(p)
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(x => bytesOf(x.toString)).sum).getOrElse(0L)
    }
    // per-row compression: codes vs vectors. The codebooks are O(1)
    // metadata (m*k*subDim doubles, ~32KB) — at this tiny SF they would
    // dominate the ratio, while at corpus scale they amortize to zero
    val vecBytes = bytesOf(s"$exactStore/vecs")
    val codeBytes = bytesOf(s"$pqStore/codes")
    assert(codeBytes * 4 < vecBytes,
      s"codes store $codeBytes bytes vs vectors $vecBytes — expected >= 4x smaller")
    assert(bytesOf(s"$pqStore/codebooks") < 100 * 1024,
      "codebooks are supposed to be kilobyte metadata")
    // and re-ingest stays idempotent through the codes path
    val again = pairsOf(IncrementalEmbedDedup.ingest(spark, b2, "vec_id",
      "v", pqStore, pqP))
    assert(spark.read.parquet(s"$pqStore/codes").count() == vecs.count())
    assert(again.forall { case (a, b) => a != b })
    // a store built with codes refuses a raw-vector ingest (mode pin)
    intercept[IllegalArgumentException] {
      IncrementalEmbedDedup.ingest(spark, b1, "vec_id", "v", pqStore, exP)
    }
  }

  test("forget erases the doc from probes; compaction erases its RAW VECTOR") {
    val store = tmpDir("incembed_forget") + "/store"
    val vecs = universe
    // base 7 and its planted twin 10007 — ingest the base, forget it,
    // then its twin must arrive as a NEW doc (no pair, no block)
    IncrementalEmbedDedup.ingest(spark,
      vecs.filter(col("vec_id") < 10000), "vec_id", "v", store, P)
    IncrementalEmbedDedup.forget(spark, store,
      Seq(Tuple1(7L)).toDF("doc_id"))
    val p2 = pairsOf(IncrementalEmbedDedup.ingest(spark,
      vecs.filter(col("vec_id") === 10007L), "vec_id", "v", store, P))
    assert(!p2.exists(p => p._1 == 7L || p._2 == 7L),
      s"forgotten doc 7 still pairs: $p2")
    // an UNforgotten base still pairs with its twin — forget is per-owner
    val p3 = pairsOf(IncrementalEmbedDedup.ingest(spark,
      vecs.filter(col("vec_id") === 10008L), "vec_id", "v", store, P))
    assert(p3.contains((8L, 10008L)), s"unforgotten doc 8 must pair: $p3")
    // the fold: doc 7's signatures AND its raw vector physically erased
    // — the embedding store is the one where the vector itself is the
    // right-to-be-forgotten hazard
    IncrementalEmbedDedup.compactStore(spark, store)
    assert(spark.read.parquet(s"$store/vecs")
      .filter(col("doc_id") === 7L).count() === 0, "raw vector retained")
    assert(spark.read.parquet(s"$store/sigs")
      .filter(col("doc_id") === 7L).count() === 0, "signatures retained")
    assert(!new java.io.File(s"$store/forgotten").exists(),
      "forgotten/ not cleared by the fold")
    // post-fold probe identical to the masked store: twin 10007 (ingested
    // above, now the content's owner) still blocks a re-delivery
    val p4 = pairsOf(IncrementalEmbedDedup.ingest(spark,
      vecs.filter(col("vec_id") === 10007L)
        .withColumn("vec_id", col("vec_id") + 90000L),
      "vec_id", "v", store, P))
    assert(p4.contains((10007L, 100007L)), s"post-fold probe drifted: $p4")
  }

  test("pq store: forget + fold erases the PQ codes of the forgotten doc") {
    val store = tmpDir("incembed_forgetpq") + "/store"
    val pqP = Params(threshold = 0.9, maxHamming = 10, pqM = 32, pqK = 64)
    IncrementalEmbedDedup.ingest(spark,
      universe.filter(col("vec_id") < 10000), "vec_id", "v", store, pqP)
    IncrementalEmbedDedup.forget(spark, store,
      Seq(Tuple1(5L)).toDF("doc_id"))
    IncrementalEmbedDedup.compactStore(spark, store)
    assert(spark.read.parquet(s"$store/codes")
      .filter(col("doc_id") === 5L).count() === 0, "PQ codes retained")
    assert(!new java.io.File(s"$store/forgotten").exists())
    // the twin of the forgotten base arrives pair-free; another's pairs
    val p = pairsOf(IncrementalEmbedDedup.ingest(spark,
      universe.filter(col("vec_id").isin(10005L, 10006L)),
      "vec_id", "v", store, pqP))
    assert(!p.exists(q => q._1 == 5L || q._2 == 5L), s"erased doc pairs: $p")
    assert(p.contains((6L, 10006L)), s"unforgotten doc 6 must pair: $p")
  }

  test("duplicated ids in one batch neither self-pair nor duplicate the store") {
    val store = tmpDir("incembed3") + "/store"
    val v = universe.filter(col("vec_id") < 10)
    val doubled = v.unionByName(v) // every id twice in one batch
    val pairs = pairsOf(IncrementalEmbedDedup.ingest(spark, doubled, "vec_id",
      "v", store, P))
    assert(pairs.forall { case (a, b) => a != b }, s"self-pairs in $pairs")
    assert(spark.read.parquet(s"$store/vecs").count() === v.count())
  }
}
