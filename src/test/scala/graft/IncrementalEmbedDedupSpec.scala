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
