package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, IncrementalDedup}

/** The durable-signature-store form of near-dup detection must be
  * EQUIVALENT to the one-shot run over the accumulated corpus — that is
  * the whole contract: ingest-by-ingest results union to exactly the
  * pairs minhashNearDups finds on the union, with no recomputation of
  * old-vs-old work.
  */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("incremental ingests find exactly the one-shot pairs, batch by batch") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = tmpDir("incdedup") + "/store"
    val b1 = docs.filter(col("doc_id") < 250)
    val b2 = docs.filter(col("doc_id") >= 250)
    val p1 = pairsOf(IncrementalDedup.ingest(spark, b1, "doc_id", "text", store))
    val p2 = pairsOf(IncrementalDedup.ingest(spark, b2, "doc_id", "text", store))
    val oneShot = pairsOf(Dedup.minhashNearDups(docs, "doc_id", "text"))
    val oneShotB1 = pairsOf(Dedup.minhashNearDups(b1, "doc_id", "text"))
    // first ingest == one-shot over b1; second ingest adds exactly the
    // pairs that involve a b2 doc
    assert(p1 == oneShotB1)
    assert((p1 ++ p2) == oneShot,
      s"missing=${oneShot -- (p1 ++ p2)} extra=${(p1 ++ p2) -- oneShot}")
    assert(p2.forall { case (a, b) => a >= 250 || b >= 250 },
      "second ingest re-emitted store-only pairs")
    assert(IncrementalDedup.storedDocs(spark, store) == docs.count())
  }

  test("re-ingesting a batch is idempotent on the store and re-emits its pairs") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = tmpDir("incdedup2") + "/store"
    val b = docs.filter(col("doc_id") < 100)
    val first = pairsOf(IncrementalDedup.ingest(spark, b, "doc_id", "text", store))
    val n1 = IncrementalDedup.storedDocs(spark, store)
    val again = pairsOf(IncrementalDedup.ingest(spark, b, "doc_id", "text", store))
    assert(IncrementalDedup.storedDocs(spark, store) == n1,
      "re-ingest duplicated store rows")
    // every original pair resurfaces (now via store collisions), none lost
    assert(again == first, s"missing=${first -- again} extra=${again -- first}")
  }

  test("store probe plan: ONE store scan, probe broadcast, store never shuffled") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = tmpDir("incdedupplan") + "/store"
    IncrementalDedup.ingest(spark,
      docs.filter(col("doc_id") < 250), "doc_id", "text", store)
    // the next batch's probe against the populated store
    val hashed = graft.ext.Dedup.hashedShingleSets(
      docs.filter(col("doc_id") >= 250), "doc_id", "text", 3)
    val newBands = graft.ext.Dedup.bandRowsOf(
      graft.ext.Dedup.minhashSigsOf(hashed, 32), 8, 4)
    val hot = IncrementalDedup.probeHot(spark, s"$store/bands", newBands)
    hot.count() // let AQE finalize
    val p = hot.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"probe is not a broadcast semi-join:\n$p")
    // the STORE side must stream straight from its scan into the join:
    // an exchange there would mean the corpus-sized side shuffles per
    // ingest — the exact O(corpus) cost this design removes. (The
    // broadcast BUILD side legitimately aggregates the O(batch) probe
    // keys, so the assertion is scoped to the store branch: the text
    // between the join node and the store scan.)
    val storeBranch = p.substring(
      p.indexOf("BroadcastHashJoin"), p.indexOf("store/bands"))
    assert(!storeBranch.contains("Exchange"),
      s"store side shuffled in the probe plan:\n$p")
  }

  test("store compaction shrinks the file count without changing results") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val store = tmpDir("incdedup4") + "/store"
    for (k <- 0 until 3)
      IncrementalDedup.ingest(spark,
        docs.filter(col("doc_id") % 3 === k), "doc_id", "text", store)
    val (before, after) = IncrementalDedup.compactStore(spark, store)
    assert(after < before, s"no compaction: $before -> $after")
    // a fourth ingest against the compacted store still matches one-shot
    val extra = Seq((9001L, docs.filter(col("doc_id") === 0)
      .select("text").head().getString(0))).toDF("doc_id", "text")
    val pairs = IncrementalDedup.ingest(spark, extra, "doc_id", "text", store)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists(_._2 == 9001L), s"post-compaction probe lost pairs: $pairs")
    assert(IncrementalDedup.storedDocs(spark, store) == docs.count() + 1)
  }

  test("forget: a forgotten doc stops blocking and pairing; fresh copy re-registers") {
    val textA = "one two three four five six seven eight nine ten eleven twelve"
    val textB = "totally different words in this document here with no overlap"
    val store = tmpDir("incdedup_forget") + "/store"
    IncrementalDedup.ingest(spark,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      "doc_id", "text", store)
    IncrementalDedup.forget(spark, store, Seq(Tuple1(1L)).toDF("doc_id"))
    // a fresh copy of the forgotten content: no pair against the
    // forgotten owner (its signatures are dead), admitted as new
    val p2 = pairsOf(IncrementalDedup.ingest(spark,
      Seq((11L, textA)).toDF("doc_id", "text"), "doc_id", "text", store))
    assert(p2.isEmpty, s"forgotten doc 1 still pairs/blocks: $p2")
    // the fresh copy registered as the NEW owner — it blocks again
    val p3 = pairsOf(IncrementalDedup.ingest(spark,
      Seq((21L, textA)).toDF("doc_id", "text"), "doc_id", "text", store))
    assert(p3 == Set((11L, 21L)), s"re-registered owner must pair: $p3")
    // doc 2 was never forgotten: still blocks its content
    val p4 = pairsOf(IncrementalDedup.ingest(spark,
      Seq((31L, textB)).toDF("doc_id", "text"), "doc_id", "text", store))
    assert(p4 == Set((2L, 31L)), s"unforgotten doc 2 must still pair: $p4")
  }

  test("compaction folds tombstones: rows physically erased, forgotten/ cleared") {
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    val textB = "some other content entirely unrelated to the first document text"
    val store = tmpDir("incdedup_fold") + "/store"
    IncrementalDedup.ingest(spark,
      Seq((1L, textA), (2L, textB)).toDF("doc_id", "text"),
      "doc_id", "text", store)
    IncrementalDedup.forget(spark, store, Seq(Tuple1(1L)).toDF("doc_id"))
    IncrementalDedup.compactStore(spark, store)
    // physically erased from BOTH tables — the right-to-erasure end state
    assert(spark.read.parquet(s"$store/shingles")
      .filter(col("doc_id") === 1L).count() === 0, "shingle set retained")
    assert(spark.read.parquet(s"$store/bands")
      .filter(col("doc_id") === 1L).count() === 0, "band rows retained")
    // tombstone set cleared — the probes' anti-join broadcast is bounded
    assert(!new java.io.File(s"$store/forgotten").exists(),
      "forgotten/ not cleared by the fold")
    // probes behave identically to the pre-fold masked store
    val p = pairsOf(IncrementalDedup.ingest(spark,
      Seq((41L, textA), (42L, textB)).toDF("doc_id", "text"),
      "doc_id", "text", store))
    assert(p == Set((2L, 42L)), s"post-fold probe drifted: $p")
  }

  test("hash-family marker: store pins its permutation scheme across sessions") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val docs = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "totally different words in this one here")).toDF("doc_id", "text")
    val reg = spark.sessionState.functionRegistry
    val fid = FunctionIdentifier("graft_minhash")
    val saved = (reg.lookupFunction(fid).get, reg.lookupFunctionBuilder(fid).get)

    // 1: a native-session store records "native", and probing it from a
    // session WITHOUT the native expression fails loudly (its seeded-
    // xxhash64 signatures would be disjoint — silence is the bug)
    val storeN = tmpDir("incdedup_fam_n") + "/store"
    IncrementalDedup.ingest(spark, docs.filter(col("doc_id") < 3),
      "doc_id", "text", storeN)
    assert(IncrementalDedup.storedFamily(spark, storeN).contains("native"))
    try {
      reg.dropFunction(fid)
      val e = intercept[IllegalArgumentException] {
        IncrementalDedup.ingest(spark, docs.filter(col("doc_id") === 3),
          "doc_id", "text", storeN)
      }
      assert(e.getMessage.contains("native"), e.getMessage)

      // 2: a store built under the FALLBACK records that family...
      val storeF = tmpDir("incdedup_fam_f") + "/store"
      IncrementalDedup.ingest(spark, docs.filter(col("doc_id") < 3),
        "doc_id", "text", storeF)
      assert(IncrementalDedup.storedFamily(spark, storeF).contains("fallback"))
      reg.registerFunction(fid, saved._1, saved._2)
      // ...and a native session probing it AUTO-SELECTS the fallback
      // scheme: the cross-batch exact-dup pair must surface (disjoint
      // families would find nothing)
      val pairs = pairsOf(IncrementalDedup.ingest(spark,
        Seq((9L, "one two three four five six seven eight")).toDF("doc_id", "text"),
        "doc_id", "text", storeF))
      assert(pairs == Set((1L, 9L), (2L, 9L)), s"cross-family probe lost pairs: $pairs")
    } finally {
      if (!spark.catalog.functionExists("graft_minhash"))
        reg.registerFunction(fid, saved._1, saved._2)
    }

    // 3: a marker-less pre-existing store refuses to guess
    val storeL = tmpDir("incdedup_fam_l") + "/store"
    IncrementalDedup.ingest(spark, docs.filter(col("doc_id") < 3),
      "doc_id", "text", storeL)
    val fs = new org.apache.hadoop.fs.Path(storeL, "_family")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(storeL, "_family"), false)
    val e = intercept[RuntimeException] {
      IncrementalDedup.ingest(spark, docs.filter(col("doc_id") === 3),
        "doc_id", "text", storeL)
    }
    assert(e.getMessage.contains("_family"), e.getMessage)
  }

  test("degenerate store buckets are capped, spread docs still match") {
    val store = tmpDir("incdedup3") + "/store"
    // 30 identical docs -> every band bucket has 30 members; with
    // maxBucket=10 the store side must drop those buckets rather than
    // produce 30*29/2-scale join work; the distinct pair (100,101) in
    // its own bucket must survive
    val boiler = (0L until 30L).map(i => (i, "alpha beta gamma delta epsilon zeta"))
    val distinctPair = Seq(
      (100L, "one two three four five six seven"),
      (101L, "one two three four five six seven"))
    val b1 = (boiler ++ distinctPair).toDF("doc_id", "text")
    val p = graft.ext.IncrementalDedup.Params(maxBucket = 10)
    IncrementalDedup.ingest(spark, b1, "doc_id", "text", store, p)
    // new batch: one more boilerplate doc + one more copy of the pair text
    val b2 = Seq(
      (200L, "alpha beta gamma delta epsilon zeta"),
      (201L, "one two three four five six seven")).toDF("doc_id", "text")
    val pairs = pairsOf(IncrementalDedup.ingest(spark, b2, "doc_id", "text", store, p))
    assert(pairs.contains((100L, 201L)) && pairs.contains((101L, 201L)),
      s"distinct-bucket match lost: $pairs")
    assert(!pairs.exists { case (a, b) => b == 200L && a < 30L },
      s"capped mega-bucket leaked pairs: $pairs")
  }
}
