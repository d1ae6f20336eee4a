package graft

import org.apache.spark.sql.functions._
import graft.ext.Dedup

/** Quantified recall of the near-dup pipelines against planted ground
  * truth (VERDICT r1 item 4): "returns rows" is not a correctness signal;
  * these assert the pipelines find what is actually there.
  *
  * Ground truth = all-pairs char-3-gram Jaccard >= 0.9 over the sf0.01
  * corpus (500 docs — the quadratic measuring stick is affordable here,
  * and this is the scale the driver's oracle gate runs at). The oracled
  * queries `ext_minhash_recall` / `ext_corpus_recall` re-prove the same
  * property against DuckDB each round.
  */
class RecallSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def docs = Tables.documents(spark, dir)

  private def gtPairs = Dedup
    .ngramGroundTruthPairs(docs, "doc_id", "text", 3, 0.9)
    .select("id_a", "id_b")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash-LSH finds every planted 3-gram near-dup pair (recall 1.0)") {
    val gt = gtPairs
    assert(gt.nonEmpty, "degenerate ground truth — no planted pairs?")
    val found = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (gt & found).size.toDouble / gt.size
    assert(recall >= 0.95, s"minhash recall $recall; missed=${gt -- found}")
  }

  test("corpus dedup merges every planted pair into one component") {
    val gt = gtPairs
    val labels = Dedup.dedupCorpus(docs, "doc_id", "text",
      threshold = 0.5, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val merged = gt.count { case (a, b) => labels(a) == labels(b) }
    val recall = merged.toDouble / gt.size
    assert(recall >= 0.95, s"corpus recall $recall of ${gt.size} pairs")
  }

  test("simhash chunk-blocking loses NOTHING vs brute-force hamming<=3") {
    // SimHash's approximation step is the pigeonhole blocking, and its
    // recall vs an all-pairs hamming scan is exactly 1.0 by construction —
    // asserted as set EQUALITY, not a bound. (SimHash hamming<=3 is a
    // bag-of-tokens similarity, deliberately different from the 3-gram
    // ground truth above: at sf0.01 it captures 15 of the 25 3-gram pairs
    // plus token-reorder dups that 3-grams miss.)
    val blocked = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
    val brute = sh.as("x").join(sh.as("y"), col("x.doc_id") < col("y.doc_id"))
      .filter(bit_count(col("x.sh").bitwiseXOR(col("y.sh"))) <= 3)
      .select(col("x.doc_id"), col("y.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"blocking lost ${brute -- blocked}, invented ${blocked -- brute}")
  }

  test("lloyd-trained IVF centroids dominate the untrained seed at fixed nProbe") {
    import graft.ext.Similarity
    val emb = Tables.embeddings(spark, dir)
    Similarity.clearIndexCache()
    val queryIds = (0L until 1000L by 50L).toSeq // 20 spread-out queries
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
    def meanRecall(iters: Int): Double = {
      val per = queries.map { case (_, q) =>
        val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
          .collect().map(_.getLong(0)).toSet
        val approx = Similarity.ivfTopK(spark, emb, "vec_id", "embedding", q,
          10, nCentroids = 16, nProbe = 2, iters = iters)
          .collect().map(_.getLong(0)).toSet
        (exact & approx).size / 10.0
      }
      per.sum / per.length
    }
    val untrained = meanRecall(0)
    val trained = meanRecall(graft.queries.ExtQueries.IvfIters)
    Similarity.clearIndexCache()
    // measured at r3: untrained 0.39, trained 0.50 (nProbe=2/16) — the
    // margin asserts a REAL improvement, not a tie, with slack for
    // last-ulp variation in the distributed Lloyd sums
    assert(trained >= untrained + 0.05,
      s"training no longer improves recall: trained=$trained untrained=$untrained")
    assert(trained >= 0.45, s"trained recall $trained too low at nProbe=2")
  }

  test("rp-lsh finds every planted near-identical vector pair (recall 1.0)") {
    val corpus = graft.queries.ExtQueries.plantedNearDupVectors(spark, dir)
    val gt = graft.ext.Similarity.cosinePairsAbove(corpus, "vec_id", "v", 0.99)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gt.size == 200, s"expected 200 planted pairs, got ${gt.size}")
    val found = graft.ext.Similarity.rpNearDups(corpus, "vec_id", "v",
      threshold = 0.99, maxHamming = 10)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gt.subsetOf(found), s"rp-lsh missed ${gt -- found}")
    // and precision is exact by construction (candidates verified with
    // the exact cosine): nothing below threshold sneaks in
    assert(found.subsetOf(gt), s"invented pairs ${found -- gt}")
  }

  test("simhash near-dups quantified vs 3-gram ground truth") {
    val gt = gtPairs
    val found = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (gt & found).size.toDouble / gt.size
    // hamming<=3 on 64-bit bag-of-tokens simhash is a TIGHTER notion than
    // 3-gram>=0.9; the floor documents the measured overlap (0.6 at r2)
    // so a silent regression in either pipeline trips this.
    assert(recall >= 0.5, s"simhash-vs-3gram overlap $recall")
  }
}
