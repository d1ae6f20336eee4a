package graft

import org.apache.spark.sql.functions._
import graft.ext.{Pq, Similarity}

/** Product quantization: compression contract, determinism, distributed
  * == driver encode, ADC + re-rank equality with exact search, and
  * planted-twin recall through the candidate pool.
  */
class PqSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.01"

  private def emb = Tables.embeddings(spark, dir)

  private lazy val cb = Pq.train(emb, "vec_id", "embedding", m = 8, k = 32)

  test("codes honor the compression contract: m codes, each in [0, k)") {
    val rows = Pq.encode(emb, "vec_id", "embedding", cb)
      .select("codes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getSeq[Int](0)
      assert(codes.length == cb.m)
      assert(codes.forall(c => c >= 0 && c < cb.k))
    }
  }

  test("training is deterministic: same corpus -> identical codebooks") {
    val cb2 = Pq.train(emb, "vec_id", "embedding", m = 8, k = 32)
    assert(cb.m == cb2.m && cb.k == cb2.k && cb.subDim == cb2.subDim)
    for (j <- 0 until cb.m; c <- 0 until cb.k)
      assert(java.util.Arrays.equals(cb.centers(j)(c), cb2.centers(j)(c)),
        s"codebook ($j, $c) differs between identical trainings")
  }

  test("distributed encode equals driver-side Codebooks.encode") {
    val viaSpark = Pq.encode(emb, "vec_id", "embedding", cb)
      .select("vec_id", "codes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toArray).toMap
    emb.select(col("vec_id"), Similarity.asDouble(col("embedding")))
      .collect().foreach { r =>
        val id = r.getLong(0)
        val direct = cb.encode(r.getSeq[Double](1).toArray)
        assert(java.util.Arrays.equals(viaSpark(id), direct),
          s"vec $id: distributed encode diverges from driver encode")
      }
  }

  test("decode reconstructs within the trained quantizer's distortion") {
    // On the training sample itself the mean per-element reconstruction
    // error must be small relative to the data's own scale — a sanity
    // bound that catches subspace misalignment (off-by-one offsets would
    // blow this up), not a precision claim.
    val rows = emb.select(Similarity.asDouble(col("embedding"))).limit(64)
      .collect().map(_.getSeq[Double](0).toArray)
    val scale = rows.map(v => v.map(math.abs).max).max
    val mae = rows.map { v =>
      val rec = cb.decode(cb.encode(v))
      v.indices.map(i => math.abs(v(i) - rec(i))).sum / v.length
    }.sum / rows.length
    assert(mae < 0.25 * scale, s"reconstruction MAE $mae vs data scale $scale")
  }

  test("ADC + exact re-rank recovers the exact brute-force top-10") {
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val pq = Pq.adcTopK(codes, emb, "vec_id", "embedding", cb, q, 10, pool = 100)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(pq.toSeq == exact.toSeq,
      s"PQ top-10 ${pq.toSeq} != exact ${exact.toSeq}")
  }

  test("a planted exact twin is the ADC pool's first candidate") {
    // A corpus vector identical to the query maximizes true cosine; its
    // ADC approximation is the query's own reconstruction score, which
    // must also rank first — the planted-recall property that makes the
    // pool trustworthy without scanning full vectors.
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val top = Pq.adcTopK(codes, emb, "vec_id", "embedding", cb, q, 1, pool = 10)
      .head()
    assert(top.getLong(0) == 7L, s"twin not recovered: ${top}")
    assert(top.getDouble(1) == 1.0)
  }

  test("dimension must divide into subspaces") {
    intercept[IllegalArgumentException] {
      Pq.train(emb, "vec_id", "embedding", m = 7, k = 8)
    }
  }

  test("IVF-PQ equals the uncompressed IVF probe at the same operating point") {
    // With a pool covering the probed clusters and an exact re-rank, the
    // compression is score-invisible: the composed probe must return the
    // IDENTICAL top-10 (ids and scores) as ivfTopK with the same
    // centroids and probe set.
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val plain = Similarity.ivfTopK(spark, emb, "vec_id", "embedding", q,
        k = 10, nCentroids = 16, nProbe = 4, iters = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pq = Pq.ivfPqTopK(emb, "vec_id", "embedding", q,
        k = 10, nCentroids = 16, nProbe = 4, m = 8, nCodes = 32,
        iters = 2, pool = 600)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pq == plain, s"IVF-PQ $pq != IVF $plain")
  }

  test("zero-norm rows never outrank genuine neighbors (NaN-orders-largest guard)") {
    import spark.implicits._
    // a corpus with TWO zero vectors and genuine unit vectors: the zero
    // rows' cosine is 0/0 = NaN, which Spark orders LARGEST — unguarded,
    // they seize the top-k ahead of every real neighbor
    val base = (1 to 12).map { i =>
      val v = Array.fill(8)(0.0f); v(i % 8) = 1.0f; v((i + 1) % 8) = 0.5f
      (i.toLong, v.toSeq)
    }
    val zeros = Seq((100L, Array.fill(8)(0.0f).toSeq),
      (101L, Array.fill(8)(0.0f).toSeq))
    val tiny = (base ++ zeros).toDF("vec_id", "embedding")
    val cbT = Pq.train(tiny, "vec_id", "embedding", m = 2, k = 8)
    val q = base.head._2.map(_.toDouble)
    val codesT = Pq.encode(tiny, "vec_id", "embedding", cbT)
    val adc = Pq.adcTopK(codesT, tiny, "vec_id", "embedding", cbT, q,
      k = 12, pool = 14).collect()
    assert(!adc.map(_.getLong(0)).contains(100L) &&
      !adc.map(_.getLong(0)).contains(101L),
      s"zero vector in ADC top-k: ${adc.map(_.getLong(0)).toSeq}")
    assert(adc.forall(r => !r.getDouble(1).isNaN))
    val ivfpq = Pq.ivfPqTopK(tiny, "vec_id", "embedding", q,
      k = 12, nCentroids = 2, nProbe = 2, m = 2, nCodes = 8, pool = 14)
      .collect()
    assert(!ivfpq.map(_.getLong(0)).contains(100L) &&
      !ivfpq.map(_.getLong(0)).contains(101L),
      s"zero vector in IVF-PQ top-k: ${ivfpq.map(_.getLong(0)).toSeq}")
    assert(ivfpq.forall(r => !r.getDouble(1).isNaN))
    // and a zero QUERY has no cosine neighbors — fail fast, not NaN soup
    intercept[IllegalArgumentException] {
      Pq.adcTopK(codesT, tiny, "vec_id", "embedding", cbT,
        Seq.fill(8)(0.0), 1)
    }
    intercept[IllegalArgumentException] {
      Pq.ivfPqTopK(tiny, "vec_id", "embedding", Seq.fill(8)(0.0), 1,
        nCentroids = 2, nProbe = 2, m = 2, nCodes = 8)
    }
  }

  test("durable PQ layer: cache-cold probe == uncompressed durable probe, no re-encode") {
    val path = tmpDir("pqdurable") + "/ivf"
    Similarity.ivfBuildPersisted(emb, "vec_id", "embedding", path,
      nCentroids = 16, iters = 2)
    Pq.pqAttachPersisted(spark, path, m = 8, k = 32)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    // "new session": drop every session cache — the probe below may use
    // ONLY the on-disk artifact (codes + codebooks + centroids)
    Pq.clearCaches()
    Similarity.clearIndexCache()
    val probe = Pq.ivfPqTopKPersisted(spark, path, q, k = 10, nProbe = 4,
      pool = 600, idCol = "vec_id")
    val plan = probe.queryExecution.executedPlan.toString
    // no corpus re-encode in the probe: encode is a mapPartitions over
    // the typed Dataset — its physical signature must be absent
    assert(!plan.contains("MapPartitions") && !plan.contains("SerializeFromObject"),
      s"probe re-encodes the corpus:\n$plan")
    // both the codes scan and the re-rank vector scan prune directories
    assert(plan.sliding("PartitionFilters: [centroid_id".length)
      .count(_ == "PartitionFilters: [centroid_id") == 2,
      s"expected centroid pruning on codes AND re-rank scans:\n$plan")
    val got = probe.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val want = Similarity.ivfTopKPersisted(spark, path, q, k = 10,
        nProbe = 4, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"durable IVF-PQ $got != durable IVF $want")
  }

  test("durable PQ layer: refuses to probe after the assignments change (stale pin)") {
    val path = tmpDir("pqstale") + "/ivf"
    Similarity.ivfBuildPersisted(emb.filter(col("vec_id") % 5 =!= 0),
      "vec_id", "embedding", path, nCentroids = 8, iters = 1)
    Pq.pqAttachPersisted(spark, path, m = 8, k = 16)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    assert(Pq.ivfPqTopKPersisted(spark, path, q, k = 5, nProbe = 8,
      idCol = "vec_id").count() == 5)
    // grow the assignments out from under the codes: probing must refuse
    Similarity.ivfAppendPersisted(emb.filter(col("vec_id") % 5 === 0),
      "vec_id", "embedding", path)
    val e = intercept[IllegalStateException] {
      Pq.ivfPqTopKPersisted(spark, path, q, k = 5, nProbe = 8, idCol = "vec_id")
    }
    assert(e.getMessage.contains("STALE"), e.getMessage)
    // INCREMENTAL recovery: encode only the appended rows against the
    // existing codebooks — cheaper than re-attach, same codebooks
    val appended = Pq.pqAppendPersisted(spark, path)
    assert(appended > 0, "append encoded nothing")
    val afterAppend = Pq.ivfPqTopKPersisted(spark, path, q, k = 5,
      nProbe = 8, pool = 600, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the appended rows are probe-visible and the probe equals the
    // uncompressed durable probe at the same operating point
    val want = Similarity.ivfTopKPersisted(spark, path, q, k = 5,
        nProbe = 8, idCol = "vec_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(afterAppend == want, s"post-append IVF-PQ $afterAppend != IVF $want")
    // re-running the append is a no-op (idempotent anti-join)
    assert(Pq.pqAppendPersisted(spark, path) == 0)
    // and a full re-attach still works over the grown corpus
    Pq.pqAttachPersisted(spark, path, m = 8, k = 16)
    assert(Pq.ivfPqTopKPersisted(spark, path, q, k = 5, nProbe = 8,
      idCol = "vec_id").count() == 5)
  }

  test("ivf forget: raw vectors AND codes physically erased, probes keep serving") {
    val path = tmpDir("ivfforget") + "/ivf"
    Similarity.ivfBuildPersisted(emb, "vec_id", "embedding", path,
      nCentroids = 16, iters = 2)
    Pq.pqAttachPersisted(spark, path, m = 8, k = 32)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val before = Similarity.ivfTopKPersisted(spark, path, q, k = 10,
      nProbe = 16, idCol = "vec_id").collect().map(_.getLong(0)).toSeq
    // take down the top hit (vec 0 itself) and a mid-ranked neighbor
    val gone = Seq(before.head, before(4))
    val removed = Similarity.ivfForgetPersisted(spark, path, gone)
    assert(removed === 2L, s"expected 2 rows erased, got $removed")
    // PHYSICAL erasure: the raw artifact files — read directly, no
    // probe pruning — carry neither the vectors nor the codes
    assert(spark.read.parquet(s"$path/assignments")
      .filter(col("id").isin(gone: _*)).count() === 0, "vectors retained")
    assert(spark.read.parquet(s"$path/pq/codes")
      .filter(col("id").isin(gone: _*)).count() === 0, "codes retained")
    // the pin was re-armed: BOTH durable probes serve, minus the ids,
    // and still agree with each other at the same operating point
    assert(Pq.pqFresh(spark, path), "forget left the PQ pin stale")
    Pq.clearCaches(); Similarity.clearIndexCache()
    val after = Similarity.ivfTopKPersisted(spark, path, q, k = 10,
      nProbe = 16, idCol = "vec_id").collect().map(_.getLong(0)).toSeq
    assert(gone.forall(!after.contains(_)), s"forgotten ids served: $after")
    val afterPq = Pq.ivfPqTopKPersisted(spark, path, q, k = 10,
      nProbe = 16, pool = 600, idCol = "vec_id")
      .collect().map(_.getLong(0)).toSeq
    assert(afterPq == after, s"IVF-PQ $afterPq != IVF $after post-forget")
    // unknown ids: no-op, nothing rewritten, pin untouched
    assert(Similarity.ivfForgetPersisted(spark, path, Seq(999999L)) === 0L)
    assert(Pq.pqFresh(spark, path))
    // and incremental machinery still composes: append after forget
    // (the forgotten ids re-admit like any new row — right-to-erasure)
    val res = Similarity.ivfAppendPersisted(
      emb.filter(col("vec_id") === gone.head), "vec_id", "embedding", path)
    assert(res.appended === 1L, s"$res")
  }

  test("the IVF-PQ codes table carries no vector column") {
    // The structural memory guarantee: a probe over the codes table
    // CANNOT read an embedding — the column does not exist in its schema.
    val idx = Similarity.ivfIndexFor(emb, "vec_id", "embedding", 16, iters = 2)
    val codes = Pq.ivfPqCodes(idx, cb)
    assert(codes.columns.toSet == Set("id", "centroid_id", "n", "codes"))
  }
}
