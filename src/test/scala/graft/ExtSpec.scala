package graft

import org.apache.spark.sql.functions._
import graft.ext.{Dedup, Multimodal, Similarity, TextAnalysis}

class ExtSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // near-dup of 1
    (3L, "completely different content about spark engines"),
    (4L, "the quick brown fox jumps over the lazy dog")   // exact dup of 1
  ).toDF("doc_id", "text")

  test("minhash near-dup finds exact and near pairs, not dissimilar ones") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup always survives
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // dissimilar excluded
  }

  test("minhash jaccard of an exact dup is 1.0") {
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      threshold = 0.5, numHashes = 32, bands = 8, shingleN = 3).collect()
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(exact.exists(_.getDouble(2) == 1.0))
  }

  test("simhash: identical text -> identical hash; near text -> small hamming") {
    val sh = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) <
           java.lang.Long.bitCount(sh(1L) ^ sh(3L)))
  }

  test("image dHash: identical planes collide, brightness shift is invariant") {
    // (doc_id, media, width, height) — 3 copies of one plane, one
    // globally brightened copy (gradient SIGNS unchanged -> same hash),
    // one reshaped (different sampling -> different hash), one empty
    val plane = Array.tabulate[Byte](64)(i => ((i * 7) % 101).toByte)
    val bright = plane.map(b => ((b & 0xff) + 50).toByte) // strictly monotone (max 150)
    val rows = Seq(
      (1L, plane, 8, 8), (2L, plane, 8, 8),
      (3L, bright, 8, 8),
      (4L, plane, 16, 4),
      (5L, Array.empty[Byte], 8, 8)).toDF("doc_id", "media", "width", "height")
    val hashes = rows.select(col("doc_id"),
      graft.ext.Multimodal.dHash(col("media"), col("width"), col("height")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hashes(1L) == hashes(2L), "identical planes must collide")
    assert(hashes(1L) == hashes(3L),
      "a monotone brightness shift must not change gradient signs")
    assert(hashes(1L) != hashes(4L), "a reshaped plane samples differently")
    assert(hashes(5L) == 0L, "empty payload hashes to 0")
    val pairs = graft.ext.Multimodal.imageNearDups(rows, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      !pairs.exists(p => p._1 == 4L || p._2 == 4L), s"pairs: $pairs")
  }

  test("simhash frozen-corpus golden: exact signatures and near-dup pairs") {
    // The BPE/unigram golden discipline applied to simhash (the r8
    // verdict's stretch item): the signature family (token hashing,
    // 64-bit bit-vote, empty-text path) is pinned to frozen values on a
    // fixed literal corpus, so ANY change to the hash family or vote
    // arithmetic — which ext_corpus_recall alone would only catch if it
    // happened to flip a planted pair — trips this spec. The native
    // Catalyst expression and the declarative fallback are bit-identical
    // (asserted elsewhere in this spec), so the goldens hold on both
    // paths. Docs 1/2 identical (hamming 0), 3 one-token-swapped from 1
    // (hamming 8), 5 one-token-swapped from 4 (hamming 6), 8 empty.
    val frozen = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "pack my box with five dozen liquor jugs"),
      (5L, "pack my box with five dozen liquor mugs"),
      (6L, "sphinx of black quartz judge my vow"),
      (7L, "how vexingly quick daft zebras jump"),
      (8L, "")).toDF("doc_id", "text")
    val sigs = frozen
      .select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val golden = Map(
      1L -> -7573889167326994222L, 2L -> -7573889167326994222L,
      3L -> -7573818796391882541L, 4L -> 2495353224988115078L,
      5L -> 2495352958691754626L, 6L -> 4762906711925119524L,
      7L -> 6481335506413398417L, 8L -> -7444071767201028348L)
    assert(sigs == golden, s"simhash signatures drifted: $sigs")
    val pairs = Dedup.simhashNearDups(frozen, "doc_id", "text",
        maxHamming = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs == Set((1L, 2L, 0), (1L, 3L, 8), (2L, 3L, 8), (4L, 5L, 6)),
      s"simhash near-dup pairs drifted: $pairs")
  }

  test("simhash agg form (inside nearDups) matches the Column-expression form") {
    // nearDups with maxHamming=0 returns exactly the identical-simhash
    // pairs; per the expression form that's the (1,4) exact-dup pair.
    val pairs = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 4L)))
  }

  test("shared-substring pairs: verbatim span found, dissimilar excluded, capped") {
    val span = "this exact forty character span is shared!"  // 42 chars
    val rows = Seq(
      (1L, s"first document header $span first trailer with other words"),
      (2L, s"completely different framing text $span and another ending"),
      (3L, "no shared content here at all, just ordinary filler text"),
      (4L, "another unrelated document with its own words and nothing copied"))
      .toDF("doc_id", "text")
    val pairs = Dedup.sharedSubstringPairs(rows, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
    // degenerate grams (shared by > maxBucket docs) are capped out
    val boiler = (0L until 30L).map(i => (i, s"$span tail$i")).toDF("doc_id", "text")
    val capped = Dedup.sharedSubstringPairs(boiler, "doc_id", "text",
      minLen = 40, maxBucket = 10).count()
    assert(capped == 0, "mega-gram bucket not capped")
  }

  test("shared-substring pairs: docs shorter than minLen never match, even identical") {
    // two identical 24-char docs cannot contain a 40-char shared span —
    // the old whole-text gram clamp reported them anyway
    val rows = Seq(
      (1L, "identical short snippet"),
      (2L, "identical short snippet"),
      (3L, "a long filler document easily exceeding the forty character floor here"))
      .toDF("doc_id", "text")
    assert(Dedup.sharedSubstringPairs(rows, "doc_id", "text", minLen = 40).count() == 0)
  }

  test("shared-substring pairs: winnowed candidates match the all-gram reference") {
    // winnowing must find exactly the pairs the naive one-row-per-
    // position gram explode finds: recall 1.0 by the Schleimer window
    // guarantee, precision restored by the exact verify. Overlap cases:
    // span at doc start / middle / end, barely-minLen span, long span,
    // g-length (sub-minLen) decoy overlap that winnowing may surface as
    // a candidate but the verify must reject.
    val span40 = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // exactly 40
    val span90 = ("shared long paragraph that runs on and on with plenty of " +
      "verbatim characters to cross windows!")
    val decoy25 = "tinydecoyoverlaptwentyfiv" // 25 = g at window 16
    val rows = Seq(
      (1L, s"$span40 then some unique trailing content for doc one here"),
      (2L, s"unique leading content for doc two then $span40"),
      (3L, s"doc three embeds $span90 in the middle of unrelated words"),
      (4L, s"fourth document also carries $span90 but elsewhere in text"),
      (5L, s"decoy doc five holds $decoy25 and nothing else shared at all"),
      (6L, s"decoy doc six also has $decoy25 padding out to length easily"),
      (7L, "entirely unrelated seventh document with no copied spans at all"))
      .toDF("doc_id", "text")
    val naive = {
      val grams = array_distinct(transform(
        sequence(lit(1), length(col("text")) - 39),
        i => xxhash64(substr(col("text"), i, lit(40)))))
      val e = rows.filter(length(col("text")) >= 40)
        .select(col("doc_id"), explode(grams).as("g"))
      e.as("x").join(e.as("y"),
          col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
        .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val got = Dedup.sharedSubstringPairs(rows, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive, s"got $got want $naive")
    assert(naive == Set((1L, 2L), (3L, 4L)), s"reference unexpected: $naive")
  }

  test("incremental substring ingests find exactly the one-shot pairs") {
    val span40 = "0123456789abcdefghijklmnopqrstuvwxyzABCD"
    val span90 = ("shared long paragraph that runs on and on with plenty of " +
      "verbatim characters to cross windows!")
    val decoy25 = "tinydecoyoverlaptwentyfiv" // g-length: candidate, verify rejects
    val rows = Seq(
      (1L, s"$span40 then some unique trailing content for doc one here"),
      (2L, s"unique leading content for doc two then $span40"),
      (3L, s"doc three embeds $span90 in the middle of unrelated words"),
      (4L, s"fourth document also carries $span90 but elsewhere in text"),
      (5L, s"decoy doc five holds $decoy25 and nothing else shared at all"),
      (6L, s"decoy doc six also has $decoy25 padding out to length easily"),
      (7L, "entirely unrelated seventh document with no copied spans at all"))
      .toDF("doc_id", "text")
    val oneShot = Dedup.sharedSubstringPairs(rows, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val store = tmpDir("incsub") + "/store"
    def ingest(pred: org.apache.spark.sql.Column) =
      graft.ext.IncrementalSubstring.ingest(spark, rows.filter(pred),
        "doc_id", "text", store, minLen = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = ingest(col("doc_id") % 2 === 1) // docs 1,3,5,7
    val p2 = ingest(col("doc_id") % 2 === 0) // docs 2,4,6
    assert(p1.isEmpty, s"odd docs share no span: $p1")
    assert((p1 ++ p2) == oneShot,
      s"missing=${oneShot -- (p1 ++ p2)} extra=${(p1 ++ p2) -- oneShot}")
    assert(oneShot == Set((1L, 2L), (3L, 4L)))
  }

  test("incremental substring: forget stops blocking; fold erases the rows") {
    val span = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val store = tmpDir("incsub_forget") + "/store"
    def ing(rows: Seq[(Long, String)]) =
      graft.ext.IncrementalSubstring.ingest(spark, rows.toDF("doc_id", "text"),
        "doc_id", "text", store, minLen = 40)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ing(Seq((1L, s"$span plus unique trailing content for doc one"))).isEmpty)
    graft.ext.IncrementalSubstring.forget(spark, store,
      Seq(Tuple1(1L)).toDF("doc_id"))
    // the forgotten owner's span no longer pairs; the fresh copy
    // registers as the new owner and pairs against the NEXT copy
    val p2 = ing(Seq((11L, s"other leading words then $span here")))
    assert(p2.isEmpty, s"forgotten doc 1 still pairs: $p2")
    val p3 = ing(Seq((21L, s"third carrier of $span with its own tail")))
    assert(p3 === Set((11L, 21L)), s"new owner must pair: $p3")
    // fold: fingerprints AND gram sets physically erased, tombstones gone
    graft.ext.IncrementalSubstring.compactStore(spark, store)
    assert(spark.read.parquet(s"$store/fps")
      .filter(col("doc_id") === 1L).count() === 0, "fingerprints retained")
    assert(spark.read.parquet(s"$store/grams")
      .filter(col("doc_id") === 1L).count() === 0, "gram sets retained")
    assert(!new java.io.File(s"$store/forgotten").exists(),
      "forgotten/ not cleared by the fold")
    val p4 = ing(Seq((31L, s"fourth carrier of $span after the fold")))
    assert(p4 === Set((11L, 31L), (21L, 31L)), s"post-fold probe drifted: $p4")
  }

  test("ngram jaccard: identity 1.0, disjoint 0.0, symmetric") {
    val df = Seq(("abcdef", "abcdef", "uvwxyz")).toDF("a", "b", "c")
    val r = df.select(
      Dedup.ngramJaccard(col("a"), col("b")).as("same"),
      Dedup.ngramJaccard(col("a"), col("c")).as("disj"),
      Dedup.ngramJaccard(col("c"), col("a")).as("disj_sym")).head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 0.0)
    assert(r.getDouble(1) == r.getDouble(2))
  }

  test("cosine: orthogonal 0, identical 1, opposite -1") {
    val df = Seq((Array(1.0, 0.0), Array(0.0, 1.0), Array(-1.0, 0.0)))
      .toDF("x", "y", "nx")
    val r = df.select(
      Similarity.cosine(col("x"), col("y")).as("orth"),
      Similarity.cosine(col("x"), col("x")).as("self"),
      Similarity.cosine(col("x"), col("nx")).as("opp")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) + 1.0) < 1e-12)
  }

  test("ivf top-k achieves high recall vs brute force on real embeddings") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val approx = Similarity.ivfTopK(spark, emb, "vec_id", "embedding", q, 10,
      nCentroids = 16, nProbe = 8).collect().map(_.getLong(0)).toSet
    val recall = (exact & approx).size / 10.0
    assert(recall >= 0.5, s"recall $recall too low; exact=$exact approx=$approx")
    assert(approx.contains(0L)) // the query vector itself is always found
  }

  test("native graft_cosine Expression is bit-identical to the HOF form") {
    assert(spark.catalog.functionExists("graft_cosine"),
      "GraftExtensions not installed in test session")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.asDouble(col("embedding")).as("v"))
    val q = emb.filter(col("vec_id") === 1).select("v").head().getSeq[Double](0)
    val both = emb.select(col("vec_id"),
      Similarity.cosine(col("v"), lit(q.toArray)).as("hof"),
      call_function("graft_cosine", col("v"), lit(q.toArray)).as("native"))
    // BIT-identical, not approximately equal: same IEEE fold order.
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
    // and the codegen path actually plans the native expression
    val plan = both.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cosine"))
  }

  test("hoisted-norm pair score (graft_dot) is bit-identical to graft_cosine") {
    assert(spark.catalog.functionExists("graft_dot"),
      "GraftExtensions not installed in test session")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id").as("id"), Similarity.asDouble(col("embedding")).as("v"))
      .withColumn("n", sqrt(call_function("graft_dot", col("v"), col("v"))))
      .filter(col("id") < 40)
    val pairs = emb.as("x").join(emb.as("y"), col("x.id") < col("y.id"))
      .select(
        call_function("graft_cosine", col("x.v"), col("y.v")).as("full"),
        (call_function("graft_dot", col("x.v"), col("y.v"))
          / (col("x.n") * col("y.n"))).as("hoisted"))
    // BIT-identical: the hoisted norm is the same IEEE fold, just computed
    // once per row instead of once per pair.
    assert(pairs.filter(col("full") =!= col("hoisted")).count() == 0)
  }

  test("ivf index is built once and reused across probes") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    Similarity.clearIndexCache()
    val idx1 = Similarity.ivfIndexFor(emb, "vec_id", "embedding", 16)
    val idx2 = Similarity.ivfIndexFor(emb, "vec_id", "embedding", 16)
    assert(idx1 eq idx2) // same cached instance, no rebuild
    assert(idx1.assignments.storageLevel.useMemory) // persisted artifact
    // a different param set is a different index
    val idx3 = Similarity.ivfIndexFor(emb, "vec_id", "embedding", 8)
    assert(!(idx3 eq idx1))
    // assignment covers every row exactly once, over the real centroids
    assert(idx1.assignments.count() == emb.count())
    val cids = idx1.centroids.map(_.id).toSet
    assert(idx1.assignments.filter(!col("centroid_id").isin(cids.toSeq: _*)).count() == 0)
    Similarity.clearIndexCache()
    assert(!idx1.assignments.storageLevel.useMemory) // cache release unpersists
  }

  test("cosinePairsAboveIvf caps degenerate mega-clusters (maxCluster)") {
    // 200 near-identical vectors form one mega-cluster (quadratic pair
    // count by definition) plus 10 spread vectors; the cap must drop the
    // mega-cluster exactly as LSH paths drop oversized buckets, bounding
    // the join to sum-over-surviving-clusters of |c|^2.
    val rnd = new scala.util.Random(3)
    val base = Array.fill(16)(rnd.nextGaussian())
    val rows = (0 until 200).map { i =>
      (i.toLong, base.map(_ + 0.001 * rnd.nextGaussian()).toSeq)
    } ++ (200 until 210).map { i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian()).toSeq)
    }
    val emb = rows.toDF("vec_id", "v")
    Similarity.clearIndexCache()
    // threshold -1 keeps every scored pair: counts below are pure
    // candidate-pair counts
    val uncapped = Similarity.cosinePairsAboveIvf(
      emb, "vec_id", "v", threshold = -1.0, nCentroids = 4).count()
    val capped = Similarity.cosinePairsAboveIvf(
      emb, "vec_id", "v", threshold = -1.0, nCentroids = 4,
      maxCluster = 50).count()
    Similarity.clearIndexCache()
    assert(uncapped >= 200L * 199 / 2,
      s"mega-cluster did not form: $uncapped pairs") // quadratic uncapped
    assert(capped <= 4L * 50 * 49 / 2,
      s"cap failed to bound the in-cluster join: $capped pairs")
  }

  test("persisted ivf index: probe matches recall and scans only probed directories") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val path = tmpDir("ivf_persist") + "/idx"
    Similarity.ivfBuildPersisted(emb, "vec_id", "embedding", path,
      nCentroids = 16, iters = 2)
    val q = emb.filter(col("vec_id") === 0).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 10)
      .collect().map(_.getLong(0)).toSet
    val probed = Similarity.ivfTopKPersisted(spark, path, q, 10, nProbe = 8,
      idCol = "vec_id")
    val got = probed.collect().map(_.getLong(0)).toSet
    assert((exact & got).size / 10.0 >= 0.5, s"recall too low: exact=$exact got=$got")
    assert(got.contains(0L)) // the query vector itself is always found
    // artifact layout: one directory per centroid, probe reads <= nProbe
    val dirs = new java.io.File(s"$path/assignments").listFiles()
      .filter(_.getName.startsWith("centroid_id=")).map(_.getName)
    assert(dirs.length == 16, s"expected 16 partition dirs, got ${dirs.toSeq}")
    // (input_file_name is only visible at the scan, not above top-k, so
    // the files-read check runs on the pruned scan shape directly)
    val twoClusters = spark.read.parquet(s"$path/assignments")
      .filter(col("centroid_id").isin(dirs.take(2).map(_.split("=")(1).toLong): _*))
    val files = twoClusters.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
      .map(f => f.split("centroid_id=")(1).split("/")(0)).toSet
    assert(files.size <= 2, s"pruned scan read ${files.size} cluster dirs: $files")
  }

  test("semantic dedup: planted twins collapse to their base, background intact") {
    val corpus = queries.ExtQueries.plantedNearDupVectors(spark, "/root/testdata/sf0.001")
    // default (rplsh) strategy must equal the brute-force ground truth
    val got = Similarity.semanticDedup(corpus, "vec_id", "v", 0.99)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Similarity.semanticDedup(corpus, "vec_id", "v", 0.99,
        strategy = "brute")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet) ++ (want.toSet diff got.toSet)}")
    assert(got(10005L) == 5L && got(5L) == 5L, "twin did not collapse to base")
    assert(got(7L) == 7L, "background vector wrongly merged")
    // the ivf strategy's precision is exact even where its recall is
    // not: every merge it makes is a true merge (it measurably splits
    // boundary twins across clusters — the reason rplsh is the default)
    val ivf = Similarity.semanticDedup(corpus, "vec_id", "v", 0.99,
        strategy = "ivf", nCentroids = 8, iters = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(ivf.forall { case (id, c) => c == id || want(id) == c },
      "ivf strategy merged a non-pair")
    assert(ivf.count { case (id, c) => c != id } <=
      want.count { case (id, c) => c != id })
  }

  test("ivf append: probe-equivalent to rebuild, idempotent, staleness counted") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.01")
    val base = emb.filter(col("vec_id") < 400) // 400 of the 500 vectors
    val grow = emb.filter(col("vec_id") >= 400)
    val pApp = tmpDir("ivfapp") + "/idx"
    Similarity.ivfBuildPersisted(base, "vec_id", "embedding", pApp,
      nCentroids = 16, iters = 1)
    val r1 = Similarity.ivfAppendPersisted(grow, "vec_id", "embedding", pApp)
    val growN = grow.count()
    assert(r1.appended == growN && r1.skipped == 0, s"$r1")
    // staleness = appended-since-training / trained-on
    assert(math.abs(r1.staleness - growN.toDouble / 400) < 1e-9, s"$r1")
    assert(Similarity.ivfAppendPersisted(grow, "vec_id", "embedding", pApp,
        retrainThreshold = 0.1) match {
      case r2 => r2.appended == 0 && r2.skipped == growN && r2.retrainRecommended
    }, "re-append must be a no-op and over-threshold staleness must flag retrain")

    // append+probe ≡ rebuild+probe when the rebuild uses the SAME
    // centroids (assign-only equivalence — the operator's contract):
    // probing the appended index over the full corpus must return
    // exactly what a probe over base∪grow assigned fresh would
    val q = emb.filter(col("vec_id") === 450)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val topApp = Similarity.ivfTopKPersisted(spark, pApp, q, k = 10,
      nProbe = 4, idCol = "vec_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // the appended vector itself must be probe-visible at rank 1
    assert(topApp.head == ((450L, 1.0)), s"appended vec not probed: $topApp")
    // recall vs brute force stays at the level of a full rebuild at the
    // same params (centroids trained on the grown corpus): append loses
    // nothing probe-side at this growth
    val pFull = tmpDir("ivffull") + "/idx"
    Similarity.ivfBuildPersisted(emb, "vec_id", "embedding", pFull,
      nCentroids = 16, iters = 1)
    val qv = emb.filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", qv, 10)
      .collect().map(_.getLong(0)).toSet
    def recallOf(path: String): Double =
      Similarity.ivfTopKPersisted(spark, path, qv, k = 10, nProbe = 12,
        idCol = "vec_id").collect().map(_.getLong(0)).toSet
        .intersect(brute).size / 10.0
    val (ra, rf) = (recallOf(pApp), recallOf(pFull))
    assert(ra >= rf - 0.2 && ra >= 0.7, s"append recall $ra vs rebuild $rf")
  }

  test("ivf probe scans only the probed clusters") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = emb.filter(col("vec_id") === 7).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble)
    val topk = Similarity.ivfTopK(spark, emb, "vec_id", "embedding", q, 5,
      nCentroids = 16, nProbe = 2)
    // every result must come from one of the 2 probed clusters
    val idx = Similarity.ivfIndexFor(emb, "vec_id", "embedding", 16)
    val clusters = topk.join(idx.assignments.withColumnRenamed("id", "vec_id"), "vec_id")
      .select("centroid_id").distinct().count()
    assert(clusters <= 2)
  }

  test("graft_isect merge walk matches array_intersect counts exactly") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      rnd.shuffle((0L until 300L).toList).take(rnd.nextInt(200) + 1).sorted.toArray,
      rnd.shuffle((0L until 300L).toList).take(rnd.nextInt(200) + 1).sorted.toArray))
    val df = spark.createDataFrame(rows).toDF("a", "b")
    val mismatches = df.select(
      call_function("graft_isect", col("a"), col("b")).as("walk"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
      .filter(col("walk") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("rp-lsh near-dup finds every planted near-identical embedding pair") {
    // deterministic synthetic corpus: 200 base vectors + 20 planted
    // near-dups (tiny perturbation => cosine ~0.999); the real embeddings
    // table plants no near-dup pairs (max pair cosine ~0.6), so the
    // operator is proven here instead of an oracled query.
    val rnd = new scala.util.Random(42)
    def vec() = Array.fill(64)(rnd.nextGaussian())
    val base = (0L until 200L).map(i => (i, vec()))
    val dups = base.take(20).map { case (i, v) =>
      (1000L + i, v.map(x => x + rnd.nextGaussian() * 0.01))
    }
    val df = spark.createDataFrame((base ++ dups).map { case (i, v) =>
      (i, v.map(_.toFloat))
    }).toDF("vec_id", "embedding")
    val found = Similarity.rpNearDups(df, "vec_id", "embedding",
      threshold = 0.98, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.cosinePairsAbove(df, "vec_id", "embedding", 0.98)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20, s"planting failed: ${exact.size}")
    assert(found == exact, // recall 1.0 on this corpus, precision exact
      s"missed=${exact -- found} invented=${found -- exact}")
  }

  test("text analysis: token counts, ratios, langId deterministic tie-break") {
    val r = Seq(("the cat and the dog!!", "  spaced   out  "))
      .toDF("a", "b").select(
        TextAnalysis.tokenCount(col("a")).as("n"),
        TextAnalysis.tokenCount(col("b")).as("n_trim"),
        TextAnalysis.punctRatio(col("a")).as("punct"),
        TextAnalysis.langId(col("a")).as("lang")).head()
    assert(r.getInt(0) == 5)
    assert(r.getInt(1) == 2) // trim prevents empty-token inflation
    assert(r.getDouble(2) > 0)
    assert(r.getString(3) == "en")
  }

  test("repetition filters: known fractions on a hand-built doc") {
    val df = Seq(("a a a b", "x y z w", "")).toDF("r", "c", "e")
    val row = df.select(
      TextAnalysis.topTokenFraction(col("r")).as("top_r"),
      TextAnalysis.duplicateNgramFraction(col("r"), 2).as("d2_r"),
      TextAnalysis.duplicateNgramFraction(col("r"), 3).as("d3_r"),
      TextAnalysis.topTokenFraction(col("c")).as("top_c"),
      TextAnalysis.duplicateNgramFraction(col("c"), 2).as("d2_c"),
      TextAnalysis.duplicateNgramFraction(col("e"), 2).as("d2_e")).head()
    assert(row.getDouble(0) == 0.75)     // "a" owns 3 of 4 tokens
    assert(row.getDouble(1) == 0.333333) // "a a" repeats: 3 bigrams, 2 distinct
    assert(row.getDouble(2) == 0.0)      // trigrams all distinct
    assert(row.getDouble(3) == 0.25)     // uniform doc
    assert(row.getDouble(4) == 0.0)
    assert(row.getDouble(5) == 0.0)      // empty doc degrades to 0, not NaN
  }

  test("native graft_dhash is bit-identical to the declarative dHash tree") {
    // the native expression exists purely to dodge the ~200-node
    // hex/substr/conv tree's per-plan Janino compile — any semantic
    // drift between the two forms would silently split stored image
    // signatures from fresh probes, so every row of the corpus (plus
    // degenerate geometries) is held to exact equality
    assert(spark.catalog.functionExists("graft_dhash"), "extensions absent")
    val media = graft.ext.Multimodal.mediaTable(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val both = media.select(
      graft.ext.Multimodal.dHash(col("media"), col("width"), col("height"))
        .as("decl"),
      call_function("graft_dhash", col("media"),
        col("width").cast("int"), col("height").cast("int"))
        .as("nat"))
    assert(both.filter(!(col("decl") <=> col("nat"))).count() == 0,
      "native/declarative dHash diverge on the corpus")
    // degenerate geometry (null / zero / negative) must be NULL on BOTH
    // paths — never a shared sentinel hash that clusters such rows into
    // mutual hamming-0 "duplicates"
    val edge = Seq(
      (Some(Array.empty[Byte]), Some(8), Some(8)),   // empty payload -> 0L
      (Some(Array[Byte](1)), Some(1), Some(1)),
      (Some(Array.tabulate[Byte](5)(_.toByte)), Some(64), Some(48)),
      (Some(Array[Byte](1, 2, 3)), Some(0), Some(8)),   // zero width -> null
      (Some(Array[Byte](1, 2, 3)), Some(8), Some(-4)),  // negative -> null
      (Some(Array[Byte](1, 2, 3)), None, Some(8)),      // null width -> null
      (None, Some(8), Some(8)))                         // null media -> null
      .toDF("m", "w", "h")
    val e = edge.select(
      graft.ext.Multimodal.dHash(col("m"), col("w"), col("h")).as("decl"),
      call_function("graft_dhash", col("m"),
        col("w").cast("int"), col("h").cast("int")).as("nat"))
      .collect()
    e.foreach(r => assert(r.isNullAt(0) == r.isNullAt(1) &&
      (r.isNullAt(0) || r.getLong(0) == r.getLong(1)), s"edge diverges: $r"))
    assert(!e(0).isNullAt(0) && e(0).getLong(0) == 0L, "empty payload must hash 0")
    (3 to 6).foreach(i => assert(e(i).isNullAt(0) && e(i).isNullAt(1),
      s"degenerate row $i must hash NULL: ${e(i)}"))
  }

  test("fallback paths (no native expressions) produce equivalent dedup results") {
    // every near-dup pipeline documents an explode+aggregate fallback for
    // sessions without GraftExtensions — prove those branches actually
    // run and agree with the native path, by dropping the functions from
    // the registry for the duration (restored in finally)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val reg = spark.sessionState.functionRegistry
    val names = Seq("graft_minhash", "graft_simhash", "graft_isect")
    val saved = names.map { n =>
      val fid = FunctionIdentifier(n)
      (fid, reg.lookupFunction(fid).get, reg.lookupFunctionBuilder(fid).get)
    }
    val nativeSim = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nativeMinhashPairs = Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    try {
      saved.foreach { case (fid, _, _) => reg.dropFunction(fid) }
      assert(!spark.catalog.functionExists("graft_minhash"))
      // simhash fallback is BIT-identical (same bit-vote arithmetic,
      // explode+aggregate instead of the single-pass expression)
      val fb = Dedup.simhashNearDups(docs, "doc_id", "text", maxHamming = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fb == Set((1L, 4L)), s"fallback simhash pairs: $fb")
      // minhash fallback uses a different (still sound) permutation
      // family: the exact-dup pair must survive with jaccard 1.0, the
      // dissimilar doc must stay excluded, and VERIFIED jaccards agree
      // with the native run (verification shares the hset arithmetic)
      val fbPairs = Dedup.minhashNearDups(docs, "doc_id", "text")
        .select("id_a", "id_b", "jaccard").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(fbPairs.contains((1L, 4L)) && fbPairs((1L, 4L)) == 1.0)
      assert(!fbPairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))
      fbPairs.keySet.intersect(nativeMinhashPairs.keySet).foreach { p =>
        assert(fbPairs(p) == nativeMinhashPairs(p), s"jaccard drift at $p")
      }
      // and the ground-truth oracle path (graft_isect fallback) matches
      val gt = Dedup.ngramGroundTruthPairs(docs, "doc_id", "text", 3, 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gt.contains((1L, 4L)))
    } finally
      saved.foreach { case (fid, info, builder) =>
        reg.registerFunction(fid, info, builder)
      }
    // natives restored: the single-pass expression is live again
    assert(spark.catalog.functionExists("graft_minhash"))
    val sim2 = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sim2 == nativeSim)
  }

  test("simhashFrame: tokenless/null rows are ROW-IDENTICAL across forms") {
    // the contract the fallback's left-join exists for: an empty or
    // whitespace-only document (Spark's split drops trailing empties ->
    // empty token array) hashes to 0 in BOTH forms instead of silently
    // vanishing from the declarative aggregate, and NULL text hashes to
    // NULL sh in both (the image family's null-signature convention)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val df = Seq((1L, "alpha beta gamma"), (2L, ""), (3L, "   "),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    def rows(frame: org.apache.spark.sql.DataFrame) = frame.collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    val native = rows(Dedup.simhashFrame(df, "doc_id", "text"))
    assert(native.size == 4, s"native dropped rows: $native")
    // empty/whitespace text tokenizes to ONE empty-string token (Java
    // split quirk: "".split -> [""]), so every empty doc shares one
    // constant signature — the same duplicate-class semantic as 0
    assert(native(2L).isDefined && native(2L) == native(3L),
      s"empty docs must share one constant signature: $native")
    assert(native(4L).isEmpty, s"null text must hash NULL: $native")
    val reg = spark.sessionState.functionRegistry
    val fid = FunctionIdentifier("graft_simhash")
    val saved = (reg.lookupFunction(fid).get, reg.lookupFunctionBuilder(fid).get)
    try {
      reg.dropFunction(fid)
      val fb = rows(Dedup.simhashFrame(df, "doc_id", "text"))
      assert(fb == native, s"fallback diverged: $fb vs native $native")
    } finally reg.registerFunction(fid, saved._1, saved._2)
  }

  test("multimodal: batched stub decode preserves every row, deterministic") {
    val media = Multimodal.mediaTable(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val f1 = Multimodal.extractFeatures(spark, media, batchSize = 7)
      .collect().map(f => f.doc_id -> f.checksum).toMap
    val f2 = Multimodal.extractFeatures(spark, media, batchSize = 64)
      .collect().map(f => f.doc_id -> f.checksum).toMap
    assert(f1.size == 500)
    assert(f1 == f2) // batch size never changes results
  }

  test("multimodal: ContainerCodec parses real PNG and WAV fixture bytes") {
    import java.io.ByteArrayOutputStream

    // a REAL (header-valid) PNG: signature + CRC-correct IHDR + IEND
    def pngBytes(w: Int, h: Int, bitDepth: Int, colorType: Int): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      val ihdr = new ByteArrayOutputStream()
      ihdr.write("IHDR".getBytes("US-ASCII"))
      for (v <- Seq(w, h))
        ihdr.write(Array((v >> 24).toByte, (v >> 16).toByte,
          (v >> 8).toByte, v.toByte))
      ihdr.write(bitDepth); ihdr.write(colorType)
      ihdr.write(0); ihdr.write(0); ihdr.write(0) // compression/filter/interlace
      val body = ihdr.toByteArray
      out.write(Array[Byte](0, 0, 0, 13)) // IHDR payload length
      out.write(body)
      val crc = new java.util.zip.CRC32; crc.update(body)
      val c = crc.getValue
      out.write(Array((c >> 24).toByte, (c >> 16).toByte, (c >> 8).toByte, c.toByte))
      out.write(Array[Byte](0, 0, 0, 0)); out.write("IEND".getBytes("US-ASCII"))
      out.toByteArray
    }

    // a REAL WAV: RIFF/WAVE, PCM fmt chunk, data = 1 second of a
    // full-scale square wave at 8 kHz mono 16-bit (RMS = 1.0 exactly)
    def wavBytes(sampleRate: Int, seconds: Int): Array[Byte] = {
      val n = sampleRate * seconds
      val dataLen = n * 2
      val out = new ByteArrayOutputStream()
      def le16(v: Int) = out.write(Array(v.toByte, (v >> 8).toByte))
      def le32(v: Int) = out.write(Array(v.toByte, (v >> 8).toByte,
        (v >> 16).toByte, (v >> 24).toByte))
      out.write("RIFF".getBytes("US-ASCII")); le32(36 + dataLen)
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); le32(16)
      le16(1); le16(1); le32(sampleRate); le32(sampleRate * 2); le16(2); le16(16)
      out.write("data".getBytes("US-ASCII")); le32(dataLen)
      for (i <- 0 until n) le16(if (i % 2 == 0) -32768 else 32767)
      out.toByteArray
    }

    import spark.implicits._
    val media = Seq(
      Multimodal.MediaRow(1L, pngBytes(640, 480, 8, 2), "image/png", 0, 0),
      Multimodal.MediaRow(2L, wavBytes(8000, 1), "audio/wav", 0, 0),
      Multimodal.MediaRow(3L, "not a media file".getBytes, "text/plain", 0, 0))
      .toDF()
    val f = Multimodal.extractFeatures(spark, media, batchSize = 2)
      .collect().map(x => x.doc_id -> x).toMap
    // PNG geometry straight from the (CRC-verified) IHDR
    assert(f(1L).format == "image/png")
    assert(f(1L).feature.toSeq == Seq(640f, 480f, 8f, 2f))
    // WAV geometry from the fmt/data chunks; RMS of a full-scale square
    // wave is 1.0 (up to the -32768 vs 32767 asymmetry)
    assert(f(2L).format == "audio/wav")
    assert(f(2L).feature(0) == 1f && f(2L).feature(1) == 8000f)
    assert(math.abs(f(2L).feature(2) - 1.0f) < 1e-6, s"duration ${f(2L).feature(2)}")
    assert(math.abs(f(2L).feature(3) - 1.0f) < 1e-4, s"rms ${f(2L).feature(3)}")
    // unrecognized bytes fall back to the deterministic byte-stats form
    assert(f(3L).format == "text/plain")
    assert(f(3L).byte_len == 16)

    // a corrupted IHDR CRC must NOT yield garbage geometry
    val bad = pngBytes(640, 480, 8, 2)
    bad(20) = (bad(20) ^ 0xff).toByte // flip a width byte, CRC now wrong
    val fb = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(9L, bad, "image/png", 0, 0)).toDF())
      .collect().head
    assert(fb.feature.forall(_ <= 1f), "corrupt PNG parsed as geometry")
    assert(fb.kind == "byte-stats", s"corrupt PNG kind ${fb.kind}")
    // real decodes label their kind — the census dimension
    assert(f(1L).kind == "header" && f(2L).kind == "pcm"
      && f(3L).kind == "byte-stats")
  }

  test("multimodal: MP4 moov atom walk — duration/tracks/geometry, no codec") {
    import spark.implicits._
    // golden: 2.5 s at timescale 1000, 2 tracks, 640x360 on track 1
    val mp4 = Multimodal.minimalMp4(1000, 2500, 2, 640, 360)
    val f = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(1L, mp4, "video/mp4", 0, 0)).toDF())
      .collect().head
    assert(f.format == "video/mp4" && f.kind == "container", s"$f")
    assert(f.feature.toSeq == Seq(2.5f, 2f, 640f, 360f),
      s"mp4 features ${f.feature.toSeq}")

    // v1 mvhd (64-bit times) must parse through the version branch:
    // hand-build moov{mvhd(v1)} + one trak from the v0 synthesizer
    val v0 = Multimodal.minimalMp4(50, 125, 1, 16, 8) // 2.5 s at ts 50
    def be32(v: Long): Array[Byte] = Array(
      (v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def box(typ: String, payload: Array[Byte]): Array[Byte] =
      be32(8L + payload.length) ++ typ.getBytes("US-ASCII") ++ payload
    val mvhdV1 = box("mvhd",
      Array[Byte](1, 0, 0, 0) ++            // version 1 + flags
        Array.fill[Byte](16)(0) ++          // creation/modification (8+8)
        be32(1000L) ++                      // timescale
        be32(0L) ++ be32(7250L) ++          // duration u64 = 7.25 s
        Array.fill[Byte](80)(0))
    // reuse the synthesized trak box: it starts right after
    // ftyp(24) + moov header(8) + mvhd(108) in the v0 layout
    val ftypLen = 24; val mvhdLen = 108
    val trak = v0.drop(ftypLen + 8 + mvhdLen)
    val v1 = v0.take(ftypLen) ++ box("moov", mvhdV1 ++ trak)
    val f1 = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(2L, v1, "video/mp4", 0, 0)).toDF())
      .collect().head
    assert(f1.kind == "container" && f1.feature(0) == 7.25f &&
      f1.feature(1) == 1f, s"v1 mvhd ${f1.feature.toSeq}")

    // truncation falls back to byte-stats, never a partial parse
    val cut = mp4.take(mp4.length - 10)
    val fc = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(3L, cut, "video/mp4", 0, 0)).toDF())
      .collect().head
    assert(fc.kind == "byte-stats", s"truncated MP4 kind ${fc.kind}")

    // census rolls the real/fallback split up per (format, kind)
    val census = Multimodal.decodeCensus(spark, Seq(
        Multimodal.MediaRow(1L, mp4, "video/mp4", 0, 0),
        Multimodal.MediaRow(2L, v1, "video/mp4", 0, 0),
        Multimodal.MediaRow(3L, cut, "video/mp4", 0, 0)).toDF())
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(census == Map(("video/mp4", "container") -> 2L,
      ("video/mp4", "byte-stats") -> 1L), s"census $census")
  }

  test("multimodal: animated GIF — frame surface and two-cut pairing") {
    import spark.implicits._
    val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    def fr(k: Int, f: Int) = Array.tabulate(13 * 9)(p =>
      ((p * 31 + k * 7 + f * 53) % 251).toByte)
    val frames = (0 until 5).map(f => fr(1, f))
    val cutA = Multimodal.encodeGifAnim(13, 9, frames, pal,
      Seq(10, 8, 8, 8, 12))
    // the re-encode that DROPS the intro frame — first-frame keys miss it
    val cutB = Multimodal.encodeGifAnim(13, 9, frames.drop(1), pal,
      Seq(8, 8, 8, 12))
    val other = Multimodal.encodeGifAnim(13, 9,
      (0 until 5).map(f => fr(7, f)), pal, Seq(5, 5, 5, 5, 5))

    // container-exact surface: frames counted, GCE delays summed
    val a = Multimodal.ContainerCodec.gifFrames(cutA).get
    assert(a.frameCount == 5 && a.delayCs == 46 &&
      a.frameHashes.length == 5, s"$a")
    assert(a.durationSec == 0.46, s"${a.durationSec}")
    // a single-frame GIF (no GCE) is 1 frame, 0 cs — same walk
    val single = Multimodal.ContainerCodec.gifFrames(
      Multimodal.encodeGif(13, 9, fr(1, 0), pal)).get
    assert(single.frameCount == 1 && single.delayCs == 0, s"$single")

    // the first-frame store key genuinely diverges between the cuts...
    val b = Multimodal.ContainerCodec.gifFrames(cutB).get
    assert(a.frameHashes.head != b.frameHashes.head,
      "fixture must make the first-frame key miss")
    // ...while the frame-landmark rule pairs them: 4 shared frame
    // hashes (every frame but the dropped intro)
    assert(a.frameHashes.toSet.intersect(b.frameHashes.toSet).size == 4)
    val pairs = Multimodal.animDups(spark,
        Seq((1L, cutA), (2L, cutB), (3L, other))
          .toDF("doc_id", "media"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 4L)), s"$pairs")

    // the feature row carries the animation surface (audio-duration
    // precedent): [w, h, meanR, meanG, meanB, lum, frames, durationSec]
    val feats = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(1L, cutA, "image/gif", 0, 0)).toDF())
      .collect().head
    assert(feats.kind == "pixels" && feats.feature.length == 8 &&
      feats.feature(6) == 5f && feats.feature(7) == 0.46f,
      s"gif features ${feats.feature.toSeq}")

    // truncation mid-animation degrades to the frames already walked
    val cut = Multimodal.ContainerCodec.gifFrames(
      cutA.take(cutA.length - 40))
    assert(cut.exists(c => c.frameCount > 0 && c.frameCount < 5), s"$cut")

    // a TRAILING GCE (structurally legal) must not inflate the total:
    // a delay counts only when its frame materializes
    val trailing = cutA.init ++ Array[Byte](0x21, 0xf9.toByte, 4, 0,
      50, 0, 0, 0, 0x3b)
    val t = Multimodal.ContainerCodec.gifFrames(trailing).get
    assert(t.frameCount == 5 && t.delayCs == 46,
      s"trailing GCE inflated the duration: $t")

    // a tail truncation INSIDE the last sub-block chain (terminator and
    // trailer cut) keeps the decoded pixels — the hash regime must not
    // silently flip to byte-stats for a stored copy
    val singleGif = Multimodal.encodeGif(13, 9, fr(1, 0), pal)
    val tailCut = singleGif.take(singleGif.length - 2)
    assert(Multimodal.ContainerCodec.grayPlane(tailCut).isDefined,
      "tail-truncated GIF must keep its pixel regime")
    // ...while the frame SURFACE only counts complete frames
    assert(Multimodal.ContainerCodec.gifFrames(tailCut).isEmpty)
  }

  test("multimodal: GIF disposal compositing — delta re-encodes share landmarks") {
    import spark.implicits._
    val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val W = 16; val H = 10
    def canvas(seed: Int) = Array.tabulate(W * H)(p =>
      ((p * 29 + seed * 37 + 5) % 251).toByte)
    // three presentation canvases: A, then A with a 5×4 patch changed
    // at (6,3), then that with a 4×4 patch changed at (0,0)
    val a = canvas(1)
    val b = a.clone()
    for (y <- 3 until 7; x <- 6 until 11)
      b(y * W + x) = ((x * 7 + y * 13 + 100) % 251).toByte
    val c = b.clone()
    for (y <- 0 until 4; x <- 0 until 4)
      c(y * W + x) = ((x * 11 + y * 3 + 60) % 251).toByte
    def region(src: Array[Byte], l: Int, t: Int, fw: Int, fh: Int) =
      Array.tabulate(fw * fh)(p => src((t + p / fw) * W + (l + p % fw)))
    // the full-frame encoding ships every canvas whole...
    val full = Multimodal.encodeGifAnim(W, H, Seq(a, b, c), pal, Seq(4, 5, 6))
    // ...the delta encoding ships only the changed regions (disposal 0:
    // the canvas persists) — byte-very-different files, same animation
    val delta = Multimodal.encodeGifAnimFrames(W, H, Seq(
      Multimodal.GifFrameSpec(a, W, H, delayCs = 4),
      Multimodal.GifFrameSpec(region(b, 6, 3, 5, 4), 5, 4,
        left = 6, top = 3, delayCs = 5),
      Multimodal.GifFrameSpec(region(c, 0, 0, 4, 4), 4, 4, delayCs = 6)),
      pal)
    val fFull = Multimodal.ContainerCodec.gifFrames(full).get
    val fDelta = Multimodal.ContainerCodec.gifFrames(delta).get
    assert(fFull.frameCount == 3 && fDelta.frameCount == 3 &&
      fFull.delayCs == 15 && fDelta.delayCs == 15, s"$fFull / $fDelta")
    assert(fFull.frameHashes.toSeq == fDelta.frameHashes.toSeq,
      "delta-encoded regions must composite to the full-frame landmarks")
    // a TRANSPARENCY delta (full-geometry frame, unchanged pixels
    // transparent) composites identically too
    val transp = Multimodal.encodeGifAnimFrames(W, H, Seq(
      Multimodal.GifFrameSpec(a, W, H, delayCs = 4),
      Multimodal.GifFrameSpec(
        Array.tabulate(W * H)(p => if (b(p) != a(p)) b(p) else 255.toByte),
        W, H, delayCs = 5, transparent = 255),
      Multimodal.GifFrameSpec(
        Array.tabulate(W * H)(p => if (c(p) != b(p)) c(p) else 255.toByte),
        W, H, delayCs = 6, transparent = 255)),
      pal)
    assert(Multimodal.ContainerCodec.gifFrames(transp).get
      .frameHashes.toSeq == fFull.frameHashes.toSeq,
      "transparency-delta frames must composite to the same landmarks")
    // and the pair operator sees delta + full as one animation
    val pairs = Multimodal.animDups(spark,
        Seq((1L, full), (2L, delta), (3L, transp),
          (4L, Multimodal.encodeGifAnim(W, H,
            Seq(canvas(8), canvas(9)), pal, Seq(3, 3))))
          .toDF("doc_id", "media"), minSharedFrames = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L)), s"$pairs")

    // disposal 2 (restore background): the frame's region clears to
    // transparent black before the next frame — equal to a full-frame
    // animation that paints that region black (gray palette entry 0)
    val black = 0
    val d2 = Multimodal.encodeGifAnimFrames(W, H, Seq(
      Multimodal.GifFrameSpec(a, W, H, delayCs = 4, disposal = 2),
      Multimodal.GifFrameSpec(region(b, 6, 3, 5, 4), 5, 4,
        left = 6, top = 3, delayCs = 5)), pal)
    val bg = a.map(_ => black.toByte)
    for (y <- 3 until 7; x <- 6 until 11) bg(y * W + x) = b(y * W + x)
    val d2Full = Multimodal.encodeGifAnim(W, H, Seq(a, bg), pal, Seq(4, 5))
    assert(Multimodal.ContainerCodec.gifFrames(d2).get.frameHashes.toSeq ==
      Multimodal.ContainerCodec.gifFrames(d2Full).get.frameHashes.toSeq,
      "restore-background must clear the disposed region")

    // disposal 3 (restore previous): the canvas reverts to its state
    // before the disposing frame
    val d3 = Multimodal.encodeGifAnimFrames(W, H, Seq(
      Multimodal.GifFrameSpec(a, W, H, delayCs = 4),
      Multimodal.GifFrameSpec(region(b, 6, 3, 5, 4), 5, 4,
        left = 6, top = 3, delayCs = 5, disposal = 3),
      Multimodal.GifFrameSpec(region(c, 0, 0, 4, 4), 4, 4, delayCs = 6)),
      pal)
    val aWithC = a.clone()
    for (y <- 0 until 4; x <- 0 until 4) aWithC(y * W + x) = c(y * W + x)
    val d3Full = Multimodal.encodeGifAnim(W, H, Seq(a, b, aWithC), pal,
      Seq(4, 5, 6))
    assert(Multimodal.ContainerCodec.gifFrames(d3).get.frameHashes.toSeq ==
      Multimodal.ContainerCodec.gifFrames(d3Full).get.frameHashes.toSeq,
      "restore-previous must revert the disposing frame")

    // a structurally complete frame whose PIXELS are unrecoverable
    // still COUNTS (the structural walk counts it — ADVICE r11: the
    // two branches must agree on every input); the landmark walk ends
    // there, and the trailing GCE delay still sums
    val twoOk = Multimodal.encodeGifAnim(W, H, Seq(a, b), pal, Seq(4, 5))
    val corrupt = new java.io.ByteArrayOutputStream()
    corrupt.write(twoOk, 0, twoOk.length - 1) // strip the trailer
    // GCE (delay 7) + descriptor + min-code byte 1 (invalid: LZW needs
    // >= 2) + one data sub-block + terminator + trailer
    corrupt.write(Array[Byte](0x21, 0xf9.toByte, 4, 0, 7, 0, 0, 0,
      0x2c, 0, 0, 0, 0, 4, 0, 4, 0, 0, 1, 2, 9, 9, 0, 0x3b))
    val fc = Multimodal.ContainerCodec.gifFrames(corrupt.toByteArray).get
    val structural = Multimodal.ContainerCodec.gifFrames(
      corrupt.toByteArray, maxHashFrames = 0).get
    assert(fc.frameCount == 3 && structural.frameCount == 3 &&
      fc.delayCs == 16 && structural.delayCs == 16,
      s"hashed/structural counts must agree: $fc / $structural")
    assert(fc.frameHashes.length == 2,
      s"landmarks must end at the unrecoverable frame: $fc")
  }

  test("multimodal: fragmented MP4 — moof durations, progressive pairing") {
    import spark.implicits._
    val coded = Array.tabulate(300)(i => ((i * 13 + 5) % 251).toByte)
    def chunksOf(p: Array[Byte]) = {
      val c1 = p.length / 3; val c2 = 2 * p.length / 3
      Seq(p.slice(0, c1), p.slice(c1, c2), p.slice(c2, p.length))
    }
    // mehd carries the muxer-known total (movie timescale)
    val viaMehd = Multimodal.minimalFmp4(600, 320, 240,
      chunksOf(coded).map(c => (c, Seq(100, 120, 130))),
      mehdTicks = 1500L)
    // no mehd: the per-sample trun durations sum on the mdhd clock
    val viaTrun = Multimodal.minimalFmp4(600, 320, 240,
      chunksOf(coded).map(c => (c, Seq(200, 300, 100))))
    // no mehd, no per-sample durations: sample_count × the tfhd default
    val viaDefault = Multimodal.minimalFmp4(600, 320, 240,
      chunksOf(coded).map(c => (c, Seq.fill(4)(25))),
      perSampleDurations = false)
    val feats = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(1L, viaMehd, "video/mp4", 0, 0),
        Multimodal.MediaRow(2L, viaTrun, "video/mp4", 0, 0),
        Multimodal.MediaRow(3L, viaDefault, "video/mp4", 0, 0)).toDF())
      .collect().map(f => f.doc_id -> f).toMap
    for ((id, dur) <- Seq((1L, 2.5f), (2L, 3.0f), (3L, 0.5f))) {
      val f = feats(id)
      assert(f.kind == "container" && f.feature.toSeq ==
        Seq(dur, 1f, 320f, 240f), s"fmp4 $id: ${f.feature.toSeq}")
    }
    // the fragmentation is a RE-WRAP: the same coded bytes split over
    // three fragment mdats must fingerprint like the progressive file
    val progressive = Multimodal.minimalMp4(600, 1500, 1, 320, 240,
      mdat = coded)
    val fpP = Multimodal.ContainerCodec.videoPayloadFp(progressive)
    assert(fpP.isDefined &&
      Multimodal.ContainerCodec.videoPayloadFp(viaMehd) == fpP &&
      Multimodal.ContainerCodec.videoPayloadFp(viaTrun) == fpP,
      "a fragmented re-mux must keep the payload fingerprint")
    assert(Multimodal.ContainerCodec.videoPayloadFp(
        Multimodal.minimalFmp4(600, 320, 240,
          chunksOf(coded.map(b => (b ^ 1).toByte))
            .map(c => (c, Seq(100))))) != fpP,
      "different coded bytes must not collide")
    // a moof truncated mid-box degrades the row to byte-stats
    val cut = viaTrun.take(viaTrun.length - 7)
    val census = Multimodal.decodeCensus(spark, Seq(
        Multimodal.MediaRow(1L, viaMehd, "video/mp4", 0, 0),
        Multimodal.MediaRow(2L, cut, "video/mp4", 0, 0)).toDF())
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(census == Map(("video/mp4", "container") -> 1L,
      ("video/mp4", "byte-stats") -> 1L), s"census $census")
  }

  test("multimodal: hostile container fields stay total (ADVICE r12)") {
    // 1. a disposal-2 GIF frame patched entirely past the right canvas
    //    edge: the dispose is a no-op clear — the hashed walk must KEEP
    //    its frames (not drop the file) and agree with the structural
    //    count
    val W = 12; val H = 10
    val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val a = Array.tabulate(W * H)(p => ((p * 7 + 3) % 251).toByte)
    val sub = Array.tabulate(3 * 2)(p => ((p * 11 + 5) % 251).toByte)
    val gif = Multimodal.encodeGifAnimFrames(W, H, Seq(
      Multimodal.GifFrameSpec(a, W, H, delayCs = 4),
      Multimodal.GifFrameSpec(sub, 3, 2, left = 6, top = 2, delayCs = 5,
        disposal = 2)), pal)
    // image descriptor of frame 2: 0x2c, left=6, top=2, w=3, h=2 (LE)
    val desc = Array[Byte](0x2c, 6, 0, 2, 0, 3, 0, 2, 0)
    val at = gif.indexOfSlice(desc)
    assert(at > 0, "fixture descriptor not found")
    val patched = gif.clone()
    patched(at + 1) = 13 // left = 13 > canvas width 12, top stays < H
    val hashed = Multimodal.ContainerCodec.gifFrames(patched).get
    val structural =
      Multimodal.ContainerCodec.gifFrames(patched, maxHashFrames = 0).get
    assert(hashed.frameCount == 2 && structural.frameCount == 2 &&
      hashed.frameHashes.length == 2,
      s"off-canvas dispose must not drop frames: $hashed / $structural")

    // 2. trun sample_count x default duration are unvalidated u32s: a
    //    hostile product must SATURATE, never wrap Long into a negative
    //    duration
    import spark.implicits._
    val coded = Array.tabulate(90)(i => ((i * 13 + 5) % 251).toByte)
    // TWO fragments: each trun contributes (2^32-1)(2^31-1) ~ 0.9999
    // Long.MaxValue ticks, so the unsaturated sum wraps negative and
    // the old `trunTicks > 0` gate silently reported duration 0
    val fmp4 = Multimodal.minimalFmp4(600, 320, 240,
      Seq((coded.take(45), Seq(Int.MaxValue)),
        (coded.drop(45), Seq(Int.MaxValue))),
      perSampleDurations = false)
    val hostile = fmp4.clone()
    var i = 0
    var patchedTruns = 0
    while (i + 12 <= hostile.length) {
      if (hostile(i) == 't' && hostile(i + 1) == 'r' &&
        hostile(i + 2) == 'u' && hostile(i + 3) == 'n') {
        // tag..: ver/flags(4) then sample_count(4) -> 0xFFFFFFFF
        for (k <- 8 until 12) hostile(i + k) = 0xff.toByte
        patchedTruns += 1
      }
      i += 1
    }
    assert(patchedTruns == 2, s"expected 2 trun boxes, saw $patchedTruns")
    val f = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(1L, hostile, "video/mp4", 0, 0)).toDF())
      .collect().head
    assert(f.feature(0) > 0f && !f.feature(0).isNaN,
      s"hostile trun product must saturate positive, got ${f.feature(0)}")
  }

  test("multimodal: APNG + animated WebP — frame surfaces pair across containers") {
    import spark.implicits._
    val W = 14; val H = 9
    def plane(f: Int) = Array.tabulate(W * H)(p =>
      ((p * 23 + f * 47 + 9) % 251).toByte)
    val planes = (0 until 4).map(plane)
    val grayPal = Array.tabulate(256 * 3)(i => (i / 3).toByte)

    // the SAME four gray canvases in all three containers
    val gif = Multimodal.encodeGifAnim(W, H, planes, grayPal,
      Seq(4, 5, 6, 10)) // centiseconds
    val apng = Multimodal.encodeApng(W, H, 0,
      planes.zip(Seq((4, 100), (5, 100), (6, 100), (1, 10))).map {
        case (px, (num, den)) =>
          Multimodal.ApngFrameSpec(px, W, H, delayNum = num, delayDen = den)
      })
    val webp = Multimodal.encodeWebpAnim(W, H,
      planes.zip(Seq(40, 50, 60, 100)).map { case (px, ms) =>
        Multimodal.WebpFrameSpec(
          px.map(v => 0xff000000 | ((v & 0xff) * 0x010101)), W, H,
          durationMs = ms)
      })

    val g = Multimodal.ContainerCodec.animFrames(gif).get
    val a = Multimodal.ContainerCodec.animFrames(apng).get
    val w = Multimodal.ContainerCodec.animFrames(webp).get
    assert(g._1 == "gif" && a._1 == "apng" && w._1 == "webp")
    for ((n, s) <- Seq(("gif", g._2), ("apng", a._2), ("webp", w._2)))
      assert(s.frameCount == 4 && s.durationMs == 250L &&
        s.frameHashes.length == 4, s"$n: $s")
    assert(g._2.frameHashes.toSeq == a._2.frameHashes.toSeq &&
      a._2.frameHashes.toSeq == w._2.frameHashes.toSeq,
      "the same canvases must land the same landmarks in every container")

    // ...so the pair operator pairs the animation ACROSS containers
    val pairs = Multimodal.animDups(spark,
        Seq((1L, gif), (2L, apng), (3L, webp),
          (10L, Multimodal.encodeGifAnim(W, H,
            Seq(plane(7), plane(8)), grayPal, Seq(3, 3))))
          .toDF("doc_id", "media"), minSharedFrames = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs == Set((1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)), s"$pairs")

    // APNG delta regions, a hidden default image, and split fdAT all
    // composite to the same landmarks (region x must stay even only
    // for WebP; APNG is pixel-exact)
    def apngRegion(src: Array[Byte], l: Int, t: Int, fw: Int, fh: Int) =
      Array.tabulate(fw * fh)(p => src((t + p / fw) * W + (l + p % fw)))
    val deltaFrames = Multimodal.ApngFrameSpec(planes(0), W, H,
        delayNum = 4, delayDen = 100) +:
      (1 until 4).map { f =>
        // ship only the rows that changed (every row here, but as a
        // narrower region: columns 2..11)
        Multimodal.ApngFrameSpec(apngRegion(planes(f), 2, 1, 9, 7), 9, 7,
          x = 2, y = 1, delayNum = Seq(0, 5, 6, 10)(f), delayDen = 100)
      }
    // delta frames repaint only a region — build the expected canvases
    val deltaCanvases = deltaFrames.indices.map { i =>
      val c = planes(0).clone()
      for (j <- 1 to i; yy <- 1 until 8; xx <- 2 until 11)
        c(yy * W + xx) = planes(j)(yy * W + xx)
      c
    }
    val deltaApng = Multimodal.encodeApng(W, H, 0, deltaFrames)
    val fullOfDelta = Multimodal.encodeGifAnim(W, H, deltaCanvases,
      grayPal, Seq(4, 5, 6, 10))
    assert(Multimodal.ContainerCodec.animFrames(deltaApng).get._2
        .frameHashes.toSeq ==
      Multimodal.ContainerCodec.animFrames(fullOfDelta).get._2
        .frameHashes.toSeq,
      "APNG delta regions must composite like the full-frame form")
    val hidden = Multimodal.encodeApng(W, H, 0,
      planes.map(Multimodal.ApngFrameSpec(_, W, H, delayNum = 2)),
      defaultImage = Some(plane(9)), splitFdat = true)
    val hs = Multimodal.ContainerCodec.apngFrames(hidden).get
    assert(hs.frameCount == 4 &&
      hs.frameHashes.toSeq == g._2.frameHashes.toSeq,
      s"hidden default image / split fdAT must not move the landmarks: $hs")

    // RGBA OVER blending: unchanged pixels ship transparent, the
    // canvas underneath stands — equal to the SOURCE full-frame form
    def rgba(px: Array[Byte]) = px.flatMap(v => Array(v, v, v, 255.toByte))
    val overApng = Multimodal.encodeApng(W, H, 6, Seq(
      Multimodal.ApngFrameSpec(rgba(planes(0)), W, H, delayNum = 4),
      Multimodal.ApngFrameSpec(
        Array.tabulate(W * H)(identity).flatMap { p =>
          val v = planes(1)(p)
          if (v == planes(0)(p)) Array[Byte](0, 0, 0, 0) // transparent
          else Array[Byte](v, v, v, 255.toByte)
        }, W, H, delayNum = 5, blend = 1)))
    val sourceApng = Multimodal.encodeApng(W, H, 6, Seq(
      Multimodal.ApngFrameSpec(rgba(planes(0)), W, H, delayNum = 4),
      Multimodal.ApngFrameSpec(rgba(planes(1)), W, H, delayNum = 5)))
    assert(Multimodal.ContainerCodec.apngFrames(overApng).get
        .frameHashes.toSeq ==
      Multimodal.ContainerCodec.apngFrames(sourceApng).get
        .frameHashes.toSeq,
      "OVER-blended transparent deltas must composite like SOURCE fulls")

    // the OPTIMIZER-style form: INDEXED frames whose unchanged pixels
    // point at a tRNS-transparent palette index (the GIF transparency
    // model in PNG clothes) — must composite identically too
    val trns = Array.tabulate(256)(i =>
      (if (i == 255) 0 else 255).toByte)
    val palApng = Multimodal.encodeApng(W, H, 3, Seq(
      Multimodal.ApngFrameSpec(planes(0), W, H, delayNum = 4),
      Multimodal.ApngFrameSpec(
        Array.tabulate(W * H)(p =>
          if (planes(1)(p) != planes(0)(p)) planes(1)(p) else 255.toByte),
        W, H, delayNum = 5, blend = 1)),
      palette = Some(grayPal), trns = Some(trns))
    assert(Multimodal.ContainerCodec.apngFrames(palApng).get
        .frameHashes.toSeq ==
      Multimodal.ContainerCodec.apngFrames(sourceApng).get
        .frameHashes.toSeq,
      "palette+tRNS deltas must composite like the full-frame form")

    // a lossy (VP8) frame is the codec boundary: it still counts, the
    // landmark walk ends there — patch the LAST frame's VP8L tag
    val lossyTail = webp.clone()
    val lastL = lossyTail.lastIndexOfSlice("VP8L".getBytes("US-ASCII"))
    lossyTail(lastL + 3) = ' '.toByte
    val lt = Multimodal.ContainerCodec.webpAnimFrames(lossyTail).get
    assert(lt.frameCount == 4 && lt.durationMs == 250L &&
      lt.frameHashes.length == 3,
      s"lossy frame must count but end the landmarks: $lt")

    // feature rows carry the animation surface in both containers
    val feats = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(1L, apng, "image/png", 0, 0),
        Multimodal.MediaRow(2L, webp, "image/webp", 0, 0)).toDF())
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).kind == "pixels" && feats(1L).feature.length == 10 &&
      feats(1L).feature(8) == 4f && feats(1L).feature(9) == 0.25f,
      s"apng features ${feats(1L).feature.toSeq}")
    assert(feats(2L).kind == "container" && feats(2L).feature.length == 6 &&
      feats(2L).feature(4) == 4f && feats(2L).feature(5) == 0.25f,
      s"webp anim features ${feats(2L).feature.toSeq}")

    // the cross-container table reports exact integers
    val table = Multimodal.animTable(spark,
        Seq((1L, gif), (2L, apng), (3L, webp)).toDF("doc_id", "media"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(table == Set((1L, "gif", 4, 250L), (2L, "apng", 4, 250L),
      (3L, "webp", 4, 250L)), s"$table")

    // static payloads have no animation surface; truncation degrades
    assert(Multimodal.ContainerCodec.apngFrames(
      Multimodal.encodePng(W, H, 0, planes(0), (0 until H).map(_ => 0)))
      .isEmpty, "a static PNG has no animation surface")
    assert(Multimodal.ContainerCodec.webpAnimFrames(
      Multimodal.encodeWebpL(W, H, planes(0))).isEmpty,
      "a static WebP has no animation surface")
    val cutApng = Multimodal.ContainerCodec.apngFrames(
      apng.take(apng.length - 30))
    assert(cutApng.forall(_.frameCount <= 4), s"$cutApng")
  }

  test("multimodal: fractional-alpha OVER blend is float-exact and container-independent") {
    // a semi-transparent FADE: an opaque RGBA base, then three
    // full-canvas overlays whose per-pixel alpha sweeps 0..255
    // (mixing the binary fast path and the fractional float path in
    // one frame). The engine's composited landmarks must equal an
    // independent double-precision Porter-Duff reference bit-exactly,
    // and the SAME fade in an animated WebP must land the SAME
    // landmarks as the APNG (fractional alpha is no longer an
    // integer-convention approximation).
    val W = 11; val H = 7
    def px(p: Int, f: Int, c: Int) = ((p * 29 + f * 71 + c * 91) % 251)
    def alpha(p: Int, f: Int) = (p * 13 + f * 57) % 256
    val base = Array.tabulate(W * H * 4) { i =>
      val p = i / 4
      (if (i % 4 == 3) 255 else px(p, 0, i % 4)).toByte
    }
    def overlay(f: Int) = Array.tabulate(W * H * 4) { i =>
      val p = i / 4
      (if (i % 4 == 3) alpha(p, f) else px(p, f, i % 4)).toByte
    }
    val frames = base +: (1 to 3).map(overlay)

    // the independent float reference: byte canvas, double OVER per
    // frame, round-half-up quantization — straight off the APNG spec
    val canvas = new Array[Byte](W * H * 4)
    val expected = frames.zipWithIndex.map { case (fr, fi) =>
      var p = 0
      while (p < W * H) {
        val o = p * 4
        val fa = fr(o + 3) & 0xff
        if (fi == 0 || fa == 255) System.arraycopy(fr, o, canvas, o, 4)
        else if (fa > 0) {
          val faf = fa / 255.0
          val bw = ((canvas(o + 3) & 0xff) / 255.0) * (1.0 - faf)
          val oaf = faf + bw
          var c = 0
          while (c < 3) {
            canvas(o + c) = math.min(255L, math.round(
              ((fr(o + c) & 0xff) * faf + (canvas(o + c) & 0xff) * bw)
                / oaf)).toByte
            c += 1
          }
          canvas(o + 3) = math.round(oaf * 255.0).toInt.min(255).toByte
        }
        p += 1
      }
      val gray = Array.tabulate(W * H) { q =>
        ((299 * (canvas(q * 4) & 0xff) + 587 * (canvas(q * 4 + 1) & 0xff) +
          114 * (canvas(q * 4 + 2) & 0xff) + 500) / 1000).toByte
      }
      graft.functions.DHashPixels.computeGrid(gray, W, H)
    }

    val fadeApng = Multimodal.encodeApng(W, H, 6,
      Multimodal.ApngFrameSpec(base, W, H, delayNum = 3) +:
        (1 to 3).map(f => Multimodal.ApngFrameSpec(
          overlay(f), W, H, delayNum = 3, blend = 1)))
    val a = Multimodal.ContainerCodec.apngFrames(fadeApng).get
    assert(a.frameHashes.toSeq == expected,
      s"APNG fade landmarks must equal the float reference: " +
        s"${a.frameHashes.toSeq} vs $expected")

    def argb(fr: Array[Byte]) = Array.tabulate(W * H) { p =>
      ((fr(p * 4 + 3) & 0xff) << 24) | ((fr(p * 4) & 0xff) << 16) |
        ((fr(p * 4 + 1) & 0xff) << 8) | (fr(p * 4 + 2) & 0xff)
    }
    val fadeWebp = Multimodal.encodeWebpAnim(W, H,
      Multimodal.WebpFrameSpec(argb(base), W, H, durationMs = 30) +:
        (1 to 3).map(f => Multimodal.WebpFrameSpec(
          argb(overlay(f)), W, H, durationMs = 30, blendOver = true)))
    val wf = Multimodal.ContainerCodec.webpAnimFrames(fadeWebp).get
    assert(wf.frameHashes.toSeq == expected,
      s"WebP fade landmarks must equal the float reference (and the " +
        s"APNG): ${wf.frameHashes.toSeq} vs $expected")
  }

  test("multimodal: AVIF/HEIC/HEIF — brand dispatch, ispe geometry, sequence walk") {
    import spark.implicits._
    def feats(rows: (Long, Array[Byte], String)*) =
      Multimodal.extractFeatures(spark, rows.map { case (id, b, f) =>
        Multimodal.MediaRow(id, b, f, 0, 0) }.toDF())
        .collect().map(f => f.doc_id -> f).toMap

    // still AVIF: meta-only, geometry from ispe, items from iinf;
    // a smaller alpha-plane ispe must NOT move the canvas extents
    val avif = Multimodal.minimalHeif("avif", 100, 60, items = 2,
      alphaIspe = Some((50, 30)))
    // HEIC via the generic mif1 major rescued by its compatible brand
    val rescued = Multimodal.minimalHeif("mif1", 40, 30,
      compatBrands = Seq("miaf", "heic"))
    // plain mif1 stays generic HEIF
    val heif = Multimodal.minimalHeif("mif1", 24, 16,
      compatBrands = Seq("miaf"))
    // AVIF sequence: moov rides along — stts sum + mvhd v1 duration
    val avis = Multimodal.minimalHeif("avis", 64, 48, items = 2,
      sttsCounts = Seq(5, 3), timescale = 100, durationTicks = 240,
      mvhdV1 = true)
    val f = feats((1L, avif, "image/avif"), (2L, rescued, "image/heif"),
      (3L, heif, "image/heif"), (4L, avis, "image/avif"))
    assert(f(1L).format == "image/avif" && f(1L).kind == "container" &&
      f(1L).feature.toSeq == Seq(100f, 60f, 2f, 0f, 0f), s"${f(1L)}")
    assert(f(2L).format == "image/heic", s"${f(2L)}")
    assert(f(3L).format == "image/heif", s"${f(3L)}")
    assert(f(4L).format == "image/avif-seq" &&
      f(4L).feature.toSeq == Seq(64f, 48f, 2f, 8f, 2.4f), s"${f(4L)}")

    // an ordinary video MP4 must still take the video path (no brand)
    val mp4 = Multimodal.minimalMp4(600, 1200, 1, 320, 240)
    val fv = feats((5L, mp4, "video/mp4"))(5L)
    assert(fv.format == "video/mp4" && fv.feature.length == 4, s"$fv")

    // malformed image brand falls to byte-stats, NOT video semantics;
    // truncation anywhere is total
    val torso = avif.take(20) // ftyp only, no meta
    val fb = feats((6L, torso, "image/avif"))(6L)
    assert(fb.kind == "byte-stats", s"$fb")
    (1 to avis.length by 7).foreach { cut =>
      Multimodal.ContainerCodec.decode(Seq(
        Multimodal.MediaRow(9L, avis.take(cut), "image/avif", 0, 0)))
    }
  }

  test("multimodal: WebM/MKV EBML walk — geometry, remux fingerprint, cross-container") {
    import spark.implicits._
    def frames(seed: Int): Seq[Array[Byte]] = (0 until 6).map(f =>
      Array.tabulate(40 + f * 7)(i =>
        ((i * 31 + seed * 17 + f * 5 + 3) % 251).toByte))
    // geometry: 2.5 s = 2500 ticks at the 1 ms default scale; video +
    // audio track; max-over-tracks picks the video geometry
    val w1 = Multimodal.minimalWebm(1000000L, 2500.0, 640, 360,
      frames(1), audioTrack = true)
    val f = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(1L, w1, "video/webm", 0, 0)).toDF())
      .collect().head
    assert(f.format == "video/webm" && f.kind == "container", s"$f")
    assert(f.feature.toSeq == Seq(2.5f, 2f, 640f, 360f),
      s"webm features ${f.feature.toSeq}")
    // the matroska DocType routes to the x-matroska mime
    val mkv = Multimodal.minimalWebm(1000000L, 1000.0, 320, 240,
      frames(2), docType = "matroska")
    val fm = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(2L, mkv, "video/webm", 0, 0)).toDF())
      .collect().head
    assert(fm.format == "video/x-matroska" && fm.feature(0) == 1.0f, s"$fm")

    // Info.Duration is optional (live-capture muxers omit it): the row
    // keeps its container regime — real track count and geometry,
    // duration 0 — instead of falling to byte-stats (ADVICE r11)
    val live = Multimodal.minimalWebm(1000000L, 0.0, 640, 360,
      frames(1), audioTrack = true, noDuration = true)
    val fl = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(3L, live, "video/webm", 0, 0)).toDF())
      .collect().head
    assert(fl.format == "video/webm" && fl.kind == "container" &&
      fl.feature.toSeq == Seq(0f, 2f, 640f, 360f),
      s"duration-less webm features ${fl.feature.toSeq}")

    // remux fingerprint: every container rewrite a re-wrap performs —
    // re-chunked clusters, BlockGroup wrapping, Xiph lacing, Void
    // padding, metadata/timescale edits — keeps the fingerprint
    val fp0 = Multimodal.ContainerCodec.videoPayloadFp(w1)
    assert(fp0.isDefined, "fixture must fingerprint")
    val variants = Seq(
      Multimodal.minimalWebm(500000L, 5000.0, 640, 360, frames(1),
        framesPerCluster = 1, title = "re-titled edition"),
      Multimodal.minimalWebm(1000000L, 2500.0, 640, 360, frames(1),
        blockGroups = true, voidPad = 33),
      Multimodal.minimalWebm(1000000L, 2500.0, 640, 360, frames(1),
        xiphLacePairs = true),
      Multimodal.minimalWebm(1000000L, 2500.0, 640, 360, frames(1),
        framesPerCluster = 6))
    variants.zipWithIndex.foreach { case (v, i) =>
      assert(Multimodal.ContainerCodec.videoPayloadFp(v) == fp0,
        s"remux variant $i moved the fingerprint")
    }
    assert(Multimodal.ContainerCodec.videoPayloadFp(
        Multimodal.minimalWebm(1000000L, 2500.0, 640, 360, frames(3)))
      != fp0, "different coded frames must not collide")

    // an UNKNOWN-SIZE first cluster (live-stream muxing: terminated
    // only by the next cluster id) absorbs the rest of the segment —
    // the recursive cluster walk must keep hashing the later clusters'
    // blocks, so the fingerprint does not move
    val streamed = w1.clone()
    val ci = streamed.indexOfSlice(
      Seq[Byte](0x1f, 0x43, 0xb6.toByte, 0x75))
    assert(ci > 0, "fixture must contain a cluster")
    val szFirst = streamed(ci + 4) & 0xff
    val szLen = java.lang.Integer.numberOfLeadingZeros(szFirst) - 23
    streamed(ci + 4) = (szFirst | ((1 << (8 - szLen)) - 1)).toByte
    for (i <- 1 until szLen) streamed(ci + 4 + i) = 0xff.toByte
    assert(Multimodal.ContainerCodec.videoPayloadFp(streamed) == fp0,
      "an unknown-size cluster must not lose the later clusters' frames")

    // cross-container: an MP4 whose mdat carries the SAME coded byte
    // stream is the same video — both walks hash the raw coded bytes
    val mp4Same = Multimodal.minimalMp4(600, 1200, 1, 320, 240,
      mdat = frames(1).flatten.toArray)
    assert(Multimodal.ContainerCodec.videoPayloadFp(mp4Same) == fp0,
      "an mp4<->webm re-wrap of the same coded stream must pair")

    // and the pair operator sees all of it in one frame
    val media = Seq(
      (1L, w1), (2L, variants(1)), (3L, mp4Same),
      (4L, Multimodal.minimalWebm(1000000L, 2500.0, 640, 360, frames(3))))
      .toDF("doc_id", "media")
    val pairs = Multimodal.videoRemuxDups(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"$pairs")

    // truncation falls back to byte-stats, never a partial parse; the
    // census counts the webm container class
    val cut = w1.take(w1.length - 9)
    val census = Multimodal.decodeCensus(spark, Seq(
        Multimodal.MediaRow(1L, w1, "video/webm", 0, 0),
        Multimodal.MediaRow(2L, mkv, "video/webm", 0, 0),
        Multimodal.MediaRow(3L, cut, "video/webm", 0, 0)).toDF())
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(census == Map(("video/webm", "container") -> 1L,
      ("video/x-matroska", "container") -> 1L,
      ("video/webm", "byte-stats") -> 1L), s"census $census")
  }

  test("multimodal: exifWebp carries the spec-shaped VP8X envelope (ADVICE r12)") {
    import spark.implicits._
    def tagAt(b: Array[Byte], off: Int) = new String(b, off, 4, "US-ASCII")
    val plane = Array.tabulate(6 * 4)(p => ((p * 19) % 251).toByte)
    // simple-format input: a VP8X header must be SYNTHESIZED in front
    // (EXIF is an extended-format feature), canvas lifted from VP8L
    val simple = Multimodal.exifWebp(Multimodal.encodeWebpL(6, 4, plane),
      orientation = 3, make = "graftcam", model = "gx-300",
      takenAt = "2024:05:06 07:08:09")
    assert(tagAt(simple, 12) == "VP8X", "first chunk must be VP8X")
    assert((simple(20) & 0x08) != 0, "VP8X EXIF flag must be set")
    val cw = ((simple(24) & 0xff) | ((simple(25) & 0xff) << 8) |
      ((simple(26) & 0xff) << 16)) + 1
    val chh = ((simple(27) & 0xff) | ((simple(28) & 0xff) << 8) |
      ((simple(29) & 0xff) << 16)) + 1
    assert(cw == 6 && chh == 4, s"VP8X canvas ${cw}x$chh")
    assert(tagAt(simple, 12 + 18) == "VP8L",
      "bitstream chunk must follow the synthesized VP8X")
    // an input that ALREADY has a VP8X (animation) keeps it, gains the
    // EXIF flag, and both surfaces still parse
    val anim = Multimodal.encodeWebpAnim(6, 4, Seq(
      Multimodal.WebpFrameSpec(
        plane.map(v => 0xff000000 | ((v & 0xff) * 0x010101)), 6, 4,
        durationMs = 40)))
    val taggedAnim = Multimodal.exifWebp(anim, orientation = 6,
      make = "graftcam", model = "gx-500",
      takenAt = "2026:01:02 03:04:05")
    assert(tagAt(taggedAnim, 12) == "VP8X" &&
      (taggedAnim(20) & 0x08) != 0 && (taggedAnim(20) & 0x02) != 0,
      "existing VP8X must keep animation flag and gain EXIF flag")
    val af = Multimodal.ContainerCodec.animFrames(taggedAnim)
    assert(af.exists(_._2.frameCount == 1),
      s"animation surface survives: $af")
    val rows = Multimodal.exifTable(spark,
        Seq((1L, simple), (2L, taggedAnim)).toDF("doc_id", "media"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(rows(1L).orientation.contains(3) &&
      rows(1L).model.contains("gx-300"), s"${rows(1L)}")
    assert(rows(2L).orientation.contains(6) &&
      rows(2L).model.contains("gx-500"), s"${rows(2L)}")
    // and the pixel path still sees through the envelope
    assert(Multimodal.ContainerCodec.grayPlane(simple).exists(_._2 == 6))
  }

  test("multimodal: EXIF provenance — fields extracted, no-EXIF and truncation are null") {
    val im = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "jpg", bos)
    val plain = bos.toByteArray
    val tagged = Multimodal.exifJpeg(plain, orientation = 6,
      make = "graftcam", model = "gx-100",
      takenAt = "2022:07:04 18:22:11")
    // the tagged file must still DECODE as a picture (APP1 is
    // transparent to the pixel path)
    assert(Multimodal.ContainerCodec.grayPlane(tagged).exists(_._2 == 6))
    // GPS variant: S/W hemispheres must sign the decimal degrees
    val located = Multimodal.exifJpeg(plain, orientation = 1,
      make = "graftcam", model = "gx-100",
      takenAt = "2022:07:04 18:22:11",
      gps = Some(("S", 33, 52, 8, "W", 151, 12, 30)))
    assert(Multimodal.ContainerCodec.grayPlane(located).exists(_._2 == 6))
    val rows = Multimodal.exifTable(spark, Seq(
        (1L, tagged), (2L, plain),
        (3L, tagged.take(30)), // APP1 cut mid-IFD
        (4L, "no jpeg at all".getBytes("UTF-8")),
        (5L, located))
        .toDF("doc_id", "media"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(rows(1L).orientation.contains(6) &&
      rows(1L).make.contains("graftcam") &&
      rows(1L).model.contains("gx-100") &&
      rows(1L).taken_at.contains("2022:07:04 18:22:11"), s"${rows(1L)}")
    assert(rows(1L).lat.isEmpty && rows(1L).lon.isEmpty,
      s"no GPS IFD -> no position: ${rows(1L)}")
    assert(rows(5L).lat.contains(-(33 + 52 / 60.0 + 8 / 3600.0)) &&
      rows(5L).lon.contains(-(151 + 12 / 60.0 + 30 / 3600.0)),
      s"signed decimal degrees: ${rows(5L)}")
    for (id <- Seq(2L, 3L, 4L))
      assert(rows(id).orientation.isEmpty && rows(id).make.isEmpty &&
        rows(id).taken_at.isEmpty && rows(id).lat.isEmpty,
        s"doc $id must be all-null: ${rows(id)}")

    // PNG eXIf and WebP EXIF envelopes land the SAME fields — the IFD
    // walk is container-independent, only the hop differs
    val plane = Array.tabulate(6 * 4)(p => ((p * 19) % 251).toByte)
    val png = Multimodal.exifPng(
      Multimodal.encodePng(6, 4, 0, plane, (0 until 4).map(_ => 0)),
      orientation = 8, make = "graftcam", model = "gx-200",
      takenAt = "2023:01:02 03:04:05",
      gps = Some(("N", 48, 51, 24, "E", 2, 21, 3)))
    val webpPlain = Multimodal.exifWebp(Multimodal.encodeWebpL(6, 4, plane),
      orientation = 3, make = "graftcam", model = "gx-300",
      takenAt = "2024:05:06 07:08:09")
    val webpPrefixed = Multimodal.exifWebp(
      Multimodal.encodeWebpL(6, 4, plane),
      orientation = 5, make = "graftcam", model = "gx-400",
      takenAt = "2025:09:10 11:12:13", exifPrefix = true)
    // the carriers must still decode as pictures (the chunks are
    // transparent to the pixel path)
    assert(Multimodal.ContainerCodec.grayPlane(png).exists(_._2 == 6))
    assert(Multimodal.ContainerCodec.grayPlane(webpPlain).exists(_._2 == 6))
    // a corrupted eXIf CRC is an invalid chunk: all-null, never garbage
    val badCrc = png.clone()
    val exifAt = badCrc.indexOfSlice("eXIf".getBytes("US-ASCII"))
    badCrc(exifAt + 30) = (badCrc(exifAt + 30) ^ 0x41).toByte
    val rows2 = Multimodal.exifTable(spark, Seq(
        (1L, png), (2L, webpPlain), (3L, webpPrefixed), (4L, badCrc),
        (5L, png.take(exifAt + 20)))
        .toDF("doc_id", "media"))
      .collect().map(r => r.doc_id -> r).toMap
    assert(rows2(1L).orientation.contains(8) &&
      rows2(1L).model.contains("gx-200") &&
      rows2(1L).lat.contains(48 + 51 / 60.0 + 24 / 3600.0) &&
      rows2(1L).lon.contains(2 + 21 / 60.0 + 3 / 3600.0), s"${rows2(1L)}")
    assert(rows2(2L).orientation.contains(3) &&
      rows2(2L).model.contains("gx-300") &&
      rows2(2L).taken_at.contains("2024:05:06 07:08:09"), s"${rows2(2L)}")
    assert(rows2(3L).orientation.contains(5) &&
      rows2(3L).model.contains("gx-400"),
      s"the Exif\\0\\0-prefixed form must parse too: ${rows2(3L)}")
    for (id <- Seq(4L, 5L))
      assert(rows2(id).orientation.isEmpty && rows2(id).make.isEmpty &&
        rows2(id).lat.isEmpty,
        s"doc $id (bad CRC / truncated) must be all-null: ${rows2(id)}")
  }

  test("multimodal: MP3 and Ogg geometry from frame/id headers, no codec") {
    // MPEG-1 Layer III, 128 kbps, 44100 Hz, joint stereo, behind an
    // ID3v2 tag (syncsafe size 0x100 = 256 payload bytes)
    val mp3 = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("ID3".getBytes("US-ASCII"))
      out.write(Array[Byte](4, 0, 0, 0, 0, 2, 0)) // ver, flags, size 0x100
      out.write(new Array[Byte](256))
      // header: ff fb 92 40 -> v1, L3, idx 9 (128k), 44100, joint
      out.write(Array(0xff, 0xfb, 0x92, 0x40).map(_.toByte))
      out.write(new Array[Byte](4000))
      out.toByteArray
    }
    // Ogg Vorbis id page: "OggS" v0, first-page flag, 1 segment
    def oggPage(idPacket: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0) // version
      out.write(2) // header type: beginning of stream
      out.write(new Array[Byte](8 + 4 + 4 + 4)) // granule, serial, seq, crc
      out.write(1) // one segment
      out.write(idPacket.length)
      out.write(idPacket)
      out.toByteArray
    }
    val vorbis = {
      val p = new java.io.ByteArrayOutputStream()
      p.write(1); p.write("vorbis".getBytes("US-ASCII"))
      p.write(new Array[Byte](4)) // version
      p.write(2)                  // channels
      p.write(Array[Byte]((48000 & 0xff).toByte, ((48000 >> 8) & 0xff).toByte,
        0, 0)) // rate LE
      p.write(new Array[Byte](12))
      oggPage(p.toByteArray)
    }
    val opus = {
      val p = new java.io.ByteArrayOutputStream()
      p.write("OpusHead".getBytes("US-ASCII"))
      p.write(1) // version
      p.write(1) // channels
      p.write(new Array[Byte](2)) // pre-skip
      p.write(Array[Byte]((16000 & 0xff).toByte, ((16000 >> 8) & 0xff).toByte,
        0, 0))
      p.write(new Array[Byte](3))
      oggPage(p.toByteArray)
    }
    // VBR: same header, a Xing tag after the 32-byte stereo side info
    // declaring 1000 frames -> exactly 1000*1152/44100 s
    val vbr = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(Array(0xff, 0xfb, 0x92, 0x40).map(_.toByte))
      out.write(new Array[Byte](32)) // side info
      out.write("Xing".getBytes("US-ASCII"))
      out.write(Array[Byte](0, 0, 0, 1))          // flags: frames
      out.write(Array[Byte](0, 0, 0x03, 0xe8.toByte)) // 1000 frames
      out.write(new Array[Byte](500))
      out.toByteArray
    }
    // a second Ogg page carrying the final granule position (96000
    // samples at 48 kHz -> 2.0 s)
    val opusTwoPage = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(opus)
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0); out.write(4) // version, end-of-stream
      out.write(Array[Byte]((96000 & 0xff).toByte,
        ((96000 >> 8) & 0xff).toByte, ((96000 >> 16) & 0xff).toByte,
        0, 0, 0, 0, 0)) // granule 96000 LE
      out.write(new Array[Byte](4 + 4 + 4)) // serial, seq, crc
      out.write(1); out.write(1) // one 1-byte segment
      out.write(0)
      out.toByteArray
    }
    // CHAINED streams (the radio-rip layout): the complete 2.0 s opus
    // stream above concatenated with a complete vorbis stream whose
    // data page ends at granule 144000 (48 kHz -> 3.0 s). Duration must
    // SUM the chains — 5.0 s — with each chain's own granule clock;
    // geometry stays the FIRST chain's (a last-page-only read would
    // report 3.0 s and miss the first chain entirely)
    val chained = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(opusTwoPage)
      out.write(vorbis)
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0); out.write(4) // version, end-of-stream
      out.write(Array[Byte](0x80.toByte, 0x32, 0x02, 0, 0, 0, 0, 0))
      out.write(new Array[Byte](4 + 4 + 4)) // serial, seq, crc
      out.write(1); out.write(1) // one 1-byte segment
      out.write(0)
      out.toByteArray
    }
    // MP3-in-WAV (fmt tag 0x55): the data chunk is the Xing-tagged
    // stream above — the wrapper must route through the MP3 walk and
    // report the same EXACT frame-count duration
    val mp3Wav = {
      val out = new java.io.ByteArrayOutputStream()
      val dataLen = vbr.length + (vbr.length & 1)
      out.write("RIFF".getBytes("US-ASCII"))
      def le32(v: Int): Unit = (0 until 4).foreach(i =>
        out.write((v >> (8 * i)) & 0xff))
      le32(4 + 24 + 8 + dataLen)
      out.write("WAVE".getBytes("US-ASCII"))
      out.write("fmt ".getBytes("US-ASCII")); le32(16)
      out.write(0x55); out.write(0) // WAVE_FORMAT_MPEGLAYER3
      out.write(2); out.write(0)    // channels
      le32(44100); le32(16000)      // rate, byte rate
      out.write(1); out.write(0); out.write(0); out.write(0) // align, bits
      out.write("data".getBytes("US-ASCII")); le32(vbr.length)
      out.write(vbr)
      if ((vbr.length & 1) == 1) out.write(0)
      out.toByteArray
    }
    // CONCURRENT multiplexing (all BOS pages first — audio + a
    // non-audio stream on ANOTHER serial): the per-serial walk must
    // keep the audio duration instead of zeroing it on the foreign BOS
    val muxed = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(vorbis) // serial 0 BOS
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0); out.write(2) // BOS, serial 1 below
      out.write(new Array[Byte](8)) // granule
      out.write(Array[Byte](1, 0, 0, 0)) // serial 1
      out.write(new Array[Byte](8)) // seq, crc
      out.write(1); out.write(8)
      out.write("skeleton".getBytes("US-ASCII")) // not an audio id header
      out.write("OggS".getBytes("US-ASCII"))
      out.write(0); out.write(4) // EOS data page, serial 0
      out.write(Array[Byte](0x80.toByte, 0x32, 0x02, 0, 0, 0, 0, 0))
      out.write(new Array[Byte](12)) // serial 0, seq, crc
      out.write(1); out.write(1); out.write(0)
      out.toByteArray
    }
    val feats = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(1L, mp3, "audio/mpeg", 0, 0),
        Multimodal.MediaRow(2L, vorbis, "audio/ogg", 0, 0),
        Multimodal.MediaRow(3L, opus, "audio/ogg", 0, 0),
        Multimodal.MediaRow(4L, mp3.take(200), "audio/mpeg", 0, 0),
        Multimodal.MediaRow(5L, vbr, "audio/mpeg", 0, 0),
        Multimodal.MediaRow(6L, opusTwoPage, "audio/ogg", 0, 0),
        Multimodal.MediaRow(7L, chained, "audio/ogg", 0, 0),
        Multimodal.MediaRow(8L, mp3Wav, "audio/wav", 0, 0),
        Multimodal.MediaRow(9L, muxed, "audio/ogg", 0, 0)).toDF())
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats(7L).format == "audio/ogg-opus" &&
      feats(7L).feature(2) == 5f,
      s"chained-stream duration must sum per chain: ${feats(7L)}")
    assert(feats(9L).format == "audio/ogg-vorbis" &&
      feats(9L).feature(2) == 3f,
      s"muxed non-audio BOS must not zero the duration: ${feats(9L)}")

    // a LYING u32 chunk size (0x7FFFFFF8) must not wrap the Int bound
    // check into a negative offset — byte-stats, never a task crash
    val lying = "RIFF".getBytes("US-ASCII") ++
      Array[Byte](100, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0x7f) ++
      new Array[Byte](40)
    val fl = Multimodal.extractFeatures(spark,
      Seq(Multimodal.MediaRow(10L, lying, "audio/wav", 0, 0)).toDF())
      .collect().head
    assert(fl.kind == "byte-stats", s"lying chunk size: $fl")
    assert(feats(8L).format == "audio/wav-mp3" &&
      feats(8L).kind == "container" &&
      math.abs(feats(8L).feature(2) - 1000f * 1152f / 44100f) < 1e-4 &&
      feats(8L).feature(3) == 128f,
      s"MP3-in-WAV must carry the Xing-exact duration: ${feats(8L)}")
    assert(feats(5L).kind == "container" &&
      math.abs(feats(5L).feature(2) - 1000f * 1152f / 44100f) < 1e-4,
      s"Xing frame count must set the exact duration: ${feats(5L)}")
    assert(feats(6L).format == "audio/ogg-opus" &&
      feats(6L).feature(2) == 2f,
      s"last-page granule must set the duration: ${feats(6L)}")
    assert(feats(1L).format == "audio/mpeg" && feats(1L).kind == "container")
    // [channels, sampleRate, durationSec, bitrateKbps]
    assert(feats(1L).feature(0) == 2f && feats(1L).feature(1) == 44100f)
    assert(feats(1L).feature(3) == 128f)
    val expectedDur = 4004f * 8f / 128000f
    assert(math.abs(feats(1L).feature(2) - expectedDur) < 1e-4,
      s"CBR duration estimate: ${feats(1L).feature(2)} vs $expectedDur")
    assert(feats(2L).format == "audio/ogg-vorbis" &&
      feats(2L).feature.toSeq == Seq(2f, 48000f, 0f, 0f), s"${feats(2L)}")
    assert(feats(3L).format == "audio/ogg-opus" &&
      feats(3L).feature.toSeq == Seq(1f, 16000f, 0f, 0f), s"${feats(3L)}")
    // an ID3 tag whose declared size swallows the file: byte-stats
    assert(feats(4L).kind == "byte-stats", s"${feats(4L)}")
  }

  test("multimodal: WEBP geometry from all three bitstream headers, no codec") {
    def riff(chunk: String, payload: Array[Byte]): Array[Byte] = {
      val total = 4 + 8 + payload.length + (payload.length & 1)
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array(total & 0xff, (total >> 8) & 0xff, (total >> 16) & 0xff,
        (total >> 24) & 0xff).map(_.toByte))
      out.write("WEBP".getBytes("US-ASCII"))
      out.write(chunk.getBytes("US-ASCII"))
      out.write(Array(payload.length & 0xff, (payload.length >> 8) & 0xff,
        (payload.length >> 16) & 0xff, (payload.length >> 24) & 0xff)
        .map(_.toByte))
      out.write(payload)
      if ((payload.length & 1) == 1) out.write(0)
      out.toByteArray
    }
    // VP8 lossy keyframe header: 3-byte tag (bit0=0 keyframe), start
    // code 9d 01 2a, then 14-bit LE width/height
    val vp8 = riff("VP8 ", Array[Byte](0x10, 0, 0, 0x9d.toByte, 0x01, 0x2a,
      (320 & 0xff).toByte, (320 >> 8).toByte,
      (240 & 0xff).toByte, (240 >> 8).toByte, 0, 0))
    // VP8L: 0x2f then (w-1) 14 bits | (h-1) << 14 | alpha << 28
    val bitsL = (199L) | (149L << 14) | (1L << 28)
    val vp8l = riff("VP8L", Array[Byte](0x2f,
      (bitsL & 0xff).toByte, ((bitsL >> 8) & 0xff).toByte,
      ((bitsL >> 16) & 0xff).toByte, ((bitsL >> 24) & 0xff).toByte, 0))
    // VP8X: flags (alpha bit4), 3 reserved, 24-bit LE canvas minus one
    val vp8x = riff("VP8X", Array[Byte](0x10, 0, 0, 0,
      (1023 & 0xff).toByte, ((1023 >> 8) & 0xff).toByte, 0,
      (767 & 0xff).toByte, ((767 >> 8) & 0xff).toByte, 0))
    val feats = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(1L, vp8, "image/webp", 0, 0),
        Multimodal.MediaRow(2L, vp8l, "image/webp", 0, 0),
        Multimodal.MediaRow(3L, vp8x, "image/webp", 0, 0)).toDF())
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.values.forall(f =>
      f.format == "image/webp" && f.kind == "container"), s"$feats")
    assert(feats(1L).feature.toSeq == Seq(320f, 240f, 0f, 0f), s"${feats(1L)}")
    assert(feats(2L).feature.toSeq == Seq(200f, 150f, 1f, 1f), s"${feats(2L)}")
    assert(feats(3L).feature.toSeq == Seq(1024f, 768f, -1f, 1f), s"${feats(3L)}")
    // a truncated VP8 payload degrades to byte-stats, never garbage
    val broken = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(4L, vp8.take(24), "image/webp", 0, 0)).toDF())
      .collect().head
    assert(broken.kind == "byte-stats", s"truncated webp kind ${broken.kind}")
  }

  test("multimodal: video remux dedup — payload identity through container rewrites") {
    val payloadA = Array.tabulate(300)(i => ((i * 31 + 7) % 251).toByte)
    val payloadB = Array.tabulate(280)(i => ((i * 13 + 5) % 251).toByte)
    val orig = Multimodal.minimalMp4(600, 1200, 1, 320, 240, mdat = payloadA)
    // re-wrap: moov after mdat, free padding, every metadata field moved
    val remux = Multimodal.minimalMp4(90000, durationTicks = 500L,
      tracks = 2, width = 640, height = 480, mdat = payloadA,
      moovFirst = false, freePad = 16)
    val other = Multimodal.minimalMp4(600, 1200, 1, 320, 240, mdat = payloadB)
    val noPayload = Multimodal.minimalMp4(600, 1200, 1, 320, 240)
    assert(orig.toSeq != remux.toSeq, "fixtures must differ at byte level")
    val pairs = Multimodal.videoRemuxDups(Seq(
        (1L, orig), (2L, remux), (3L, other), (4L, noPayload))
        .toDF("doc_id", "media"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"exactly the re-wrapped copy must pair: $pairs")
  }

  test("multimodal: PNG pixel decode — real channel means through all five filters") {
    import java.io.ByteArrayOutputStream

    def be32(out: ByteArrayOutputStream, v: Long): Unit =
      out.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
    def chunk(out: ByteArrayOutputStream, id: String, payload: Array[Byte]): Unit = {
      be32(out, payload.length)
      val body = id.getBytes("US-ASCII") ++ payload
      out.write(body)
      val crc = new java.util.zip.CRC32; crc.update(body)
      be32(out, crc.getValue)
    }
    // forward-filter one scanline (the encoder side of the five PNG
    // filters) so the decoder's unfilter path is exercised for real
    def filterRow(ft: Int, raw: Array[Int], prev: Array[Int], bpp: Int): Array[Byte] =
      Array.tabulate(raw.length) { x =>
        val a = if (x >= bpp) raw(x - bpp) else 0
        val u = prev(x)
        val c = if (x >= bpp) prev(x - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => u
          case 3 => (a + u) >> 1
          case 4 =>
            val p = a + u - c
            val pa = math.abs(p - a); val pb = math.abs(p - u)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
        }
        ((raw(x) - pred) & 0xff).toByte
      }
    // full encoder: rows of w*channels ints in 0..255, one filter type
    // per row; interlace/compression/filterMethod zero
    def png(w: Int, h: Int, colorType: Int, rows: Seq[Array[Int]],
        filters: Seq[Int]): Array[Byte] = {
      val channels = colorType match {
        case 0 => 1; case 2 => 3; case 4 => 2; case 6 => 4
      }
      require(rows.forall(_.length == w * channels) && rows.length == h)
      val out = new ByteArrayOutputStream()
      out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte))
      val ihdr = new ByteArrayOutputStream()
      be32(ihdr, w); be32(ihdr, h)
      ihdr.write(8); ihdr.write(colorType); ihdr.write(0); ihdr.write(0); ihdr.write(0)
      chunk(out, "IHDR", ihdr.toByteArray)
      val rawStream = new ByteArrayOutputStream()
      var prev = new Array[Int](w * channels)
      rows.zip(filters).foreach { case (row, ft) =>
        rawStream.write(ft)
        rawStream.write(filterRow(ft, row, prev, channels))
        prev = row
      }
      val deflater = new java.util.zip.Deflater()
      deflater.setInput(rawStream.toByteArray); deflater.finish()
      val zipped = new ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!deflater.finished())
        zipped.write(buf, 0, deflater.deflate(buf))
      deflater.end()
      // split the one zlib stream over TWO IDAT chunks — decoders must
      // concatenate before inflating
      val z = zipped.toByteArray
      val cut = z.length / 2
      chunk(out, "IDAT", z.take(cut))
      chunk(out, "IDAT", z.drop(cut))
      chunk(out, "IEND", Array.empty[Byte])
      out.toByteArray
    }
    def featuresOf(bytes: Array[Byte]): Array[Float] = {
      import spark.implicits._
      Multimodal.extractFeatures(spark,
        Seq(Multimodal.MediaRow(1L, bytes, "image/png", 0, 0)).toDF())
        .collect().head.feature
    }

    // 2x2 RGB with known values: means are exact eighths of 255
    val rgbRows = Seq(
      Array(255, 0, 0, /**/ 0, 255, 0),
      Array(0, 0, 255, /**/ 255, 255, 255))
    val fRgb = featuresOf(png(2, 2, 2, rgbRows, Seq(0, 0)))
    assert(fRgb.take(4).toSeq == Seq(2f, 2f, 8f, 2f), s"geometry ${fRgb.toSeq}")
    assert(fRgb.length == 8, s"expected pixel stats appended: ${fRgb.toSeq}")
    val expect = Seq(510f / 4 / 255, 510f / 4 / 255, 510f / 4 / 255)
    fRgb.slice(4, 7).zip(expect).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"channel mean $got != $want")
    }
    assert(math.abs(fRgb(7) - 0.5f) < 1e-6, s"luminance ${fRgb(7)}")

    // grayscale: R=G=B=gray mean; luminance equals it
    val fGray = featuresOf(png(3, 1, 0, Seq(Array(0, 51, 102)), Seq(0)))
    assert(math.abs(fGray(4) - 51f / 255) < 1e-6, s"${fGray.toSeq}")
    assert(fGray(4) == fGray(5) && fGray(5) == fGray(6) && fGray(7) == fGray(4))

    // all five filters on an RGBA gradient: decoded means must equal the
    // raw means whatever filter each row used
    val w = 5; val rgbaRows = (0 until 5).map(y =>
      Array.tabulate(w * 4)(i => (y * 40 + i * 7) % 256))
    val fAll = featuresOf(png(w, 5, 6, rgbaRows, Seq(0, 1, 2, 3, 4)))
    val flat = rgbaRows.flatten
    def rawMean(ch: Int): Float =
      (flat.zipWithIndex.collect { case (v, i) if i % 4 == ch => v }.sum
        .toDouble / (w * 5) / 255.0).toFloat
    (0 until 3).foreach { ch =>
      assert(math.abs(fAll(4 + ch) - rawMean(ch)) < 1e-6,
        s"filtered decode drifted on channel $ch: ${fAll.toSeq}")
    }

    // out-of-path PNGs degrade to geometry-only, never garbage stats
    val interlaced = png(2, 2, 2, rgbRows, Seq(0, 0))
    interlaced(28) = 1 // Adam7 flag — IHDR CRC now wrong -> stub path
    val fBadCrc = featuresOf(interlaced)
    assert(fBadCrc.length == 4 && fBadCrc.forall(_ <= 1f),
      s"corrupt IHDR must fall back: ${fBadCrc.toSeq}")
    // truncated IDAT: geometry survives, pixel stats do not
    val whole = png(2, 2, 2, rgbRows, Seq(0, 0))
    val truncated = whole.take(whole.length - 30) // cut into the IDAT
    val fTrunc = featuresOf(truncated)
    assert(fTrunc.toSeq == Seq(2f, 2f, 8f, 2f),
      s"truncated IDAT must be geometry-only: ${fTrunc.toSeq}")
  }

  test("multimodal: frame sampling yields frames for every non-trivial doc") {
    val media = Multimodal.mediaTable(
      Tables.documents(spark, "/root/testdata/sf0.001"))
    val frames = Multimodal.sampleFrames(media, stride = 16, frame = 8)
    assert(frames.select("doc_id").distinct().count() == 500)
    assert(frames.filter(octet_length(col("frame_bytes")) > 8).count() == 0)
  }

  test("dedupCorpus: transitive near-dups collapse to one canonical doc") {
    // 1~2 (near), 1==4 (exact): {1,2,4} is one component even though the
    // 2~4 edge may be absent; 3 is alone. Both component engines (driver
    // union-find and distributed label propagation) must agree.
    for (driverMax <- Seq(Long.MaxValue, 0L)) {
      val labels = Dedup.dedupCorpus(docs, "doc_id", "text",
        threshold = 0.5, shingleN = 3, driverMaxEdges = driverMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels(1L) == 1L && labels(4L) == 1L && labels(2L) == 1L,
        s"driverMaxEdges=$driverMax: $labels")
      assert(labels(3L) == 3L)
    }
  }

  test("componentsFromPairs: explicit pair graph, both engines, min label") {
    import spark.implicits._
    // chain 10-20, 20-30 (transitive), island 40-50, isolated 60: min-label
    // canonicals regardless of which engine resolves the components
    val corpus = Seq(10L, 20L, 30L, 40L, 50L, 60L).toDF("doc_id")
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L)).toDF("id_a", "id_b")
    for (driverMax <- Seq(Long.MaxValue, 0L)) {
      val labels = Dedup.componentsFromPairs(corpus, "doc_id", pairs,
        driverMaxEdges = driverMax)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
        40L -> 40L, 50L -> 40L, 60L -> 60L),
        s"driverMaxEdges=$driverMax: $labels")
    }
  }

  test("componentsFromPairs: diameter-200 chain converges in log rounds") {
    import spark.implicits._
    // A 200-link chain (serial near-copies of one article) has graph
    // diameter 199: plain min-label propagation needs ~200 rounds and
    // the old maxIters=10 exit returned WRONG labels silently. The
    // large-star/small-star contraction must resolve it well inside the
    // default 10-round cap, all docs canonicalized to the chain minimum.
    val n = 200
    val corpus = (0L until n.toLong).toDF("doc_id")
    val pairs = (0L until n.toLong - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val labels = Dedup.componentsFromPairs(corpus, "doc_id", pairs,
      maxIters = 10, driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(labels.length == n)
    assert(labels.forall(_._2 == 0L), labels.filter(_._2 != 0L).take(5).toSeq)
  }

  test("keepBestByScore: clusters keep the max-score member, ties to min id") {
    import spark.implicits._
    // cluster {1,2,3}: scores 5, 9, 9 -> rep 2 (max score, tie -> min id);
    // cluster {10,11}: 11 outscores the min-id canonical -> rep 11, so the
    // representative genuinely differs from the keep-first choice;
    // singleton 20 represents itself without entering the aggregation
    val docs = Seq((1L, 5.0), (2L, 9.0), (3L, 9.0), (10L, 1.0), (11L, 8.0),
      (20L, 3.0)).toDF("doc_id", "q")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    for (driverMax <- Seq(Long.MaxValue, 0L)) {
      val out = Dedup.keepBestByScore(docs, "doc_id", "q", pairs,
        driverMaxEdges = driverMax)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(out == Map(
        1L -> (1L, 2L), 2L -> (1L, 2L), 3L -> (1L, 2L),
        10L -> (10L, 11L), 11L -> (10L, 11L),
        20L -> (20L, 20L)), s"driverMaxEdges=$driverMax: $out")
    }
    val survivors = Dedup.keepBestSurvivors(docs, "doc_id", "q", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(survivors == Set(2L, 11L, 20L))
  }

  test("componentsFromPairs: hitting maxIters unconverged fails loudly") {
    import spark.implicits._
    val corpus = (0L until 200L).toDF("doc_id")
    val pairs = (0L until 199L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.componentsFromPairs(corpus, "doc_id", pairs,
        maxIters = 2, driverMaxEdges = 0L).collect()
    }
    assert(e.getMessage.contains("not converged"))
  }

  test("sharedGroundTruth: one quadratic pair build shared across gates") {
    val a = graft.queries.ExtQueries
      .sharedGroundTruth(spark, "/root/testdata/sf0.001")
    // the second fetch must run ZERO Spark jobs — the cache hit is a
    // reference to the checkpointed frame, not a rebuild
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val b = graft.queries.ExtQueries
        .sharedGroundTruth(spark, "/root/testdata/sf0.001")
      assert(a eq b)
      Thread.sleep(1000) // listener bus is async; let any job event land
      assert(jobs.get() == 0, s"cache hit ran ${jobs.get()} job(s)")
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(a.columns.toSeq == Seq("id_a", "id_b", "jaccard3"))
    // same discipline for the vector gates' shared planted corpus + GT
    val (c1, g1) = graft.queries.ExtQueries
      .sharedPlantedGt(spark, "/root/testdata/sf0.001")
    val (c2, g2) = graft.queries.ExtQueries
      .sharedPlantedGt(spark, "/root/testdata/sf0.001")
    assert((c1 eq c2) && (g1 eq g2))
  }

  test("exact dedup groups identical content") {
    val d = Dedup.exact(docs, "doc_id", Seq("text"))
    assert(d.count() == 3) // 1&4 collapse
    assert(d.filter(col("dup_count") === 2).select("keep_id").head().getLong(0) == 1L)
  }

  test("multimodal dedup composes: duplicate payloads found via the embed store") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 40)
    val media = graft.ext.Multimodal.mediaTable(docs)
    // plant a byte-identical duplicate of doc 3 under a new id in the
    // SECOND batch: its decoded feature vector is identical, so the
    // cross-batch probe must surface (3, 9003) at cosine ~1
    val dup = media.filter(col("doc_id") === 3)
      .withColumn("doc_id", lit(9003L))
    val feats = graft.ext.Multimodal
      .extractFeatures(spark, media.unionByName(dup),
        codec = graft.ext.Multimodal.StubCodec)
      .toDF().select(col("doc_id"), col("feature"))
    val store = tmpDir("mmdedup") + "/store"
    val P = graft.ext.IncrementalEmbedDedup.Params(
      threshold = 0.999999, maxHamming = 10)
    val p1 = graft.ext.IncrementalEmbedDedup.ingest(spark,
      feats.filter(col("doc_id") < 9000), "doc_id", "feature", store, P)
    val p2 = graft.ext.IncrementalEmbedDedup.ingest(spark,
      feats.filter(col("doc_id") >= 9000), "doc_id", "feature", store, P)
    val pairs = p1.unionByName(p2).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((3L, 9003L)),
      s"planted duplicate payload not found: $pairs")
  }

  test("compressionRatio: native expression == driver-side zlib helper exactly") {
    import org.apache.spark.unsafe.types.UTF8String
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps going"),
      (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
      (3L, "zq9#kL!x2@Wp$v8&Tm^c4*Rj(b7)Ne_hY5+uG3-sD1=fA6~iO0`eKqZw"),
      (4L, "")
    ).toDF("id", "text")
    assert(spark.catalog.functionExists("graft_deflate_ratio"),
      "test session must register GraftExtensions")
    val got = docs.select(col("id"),
      graft.ext.TextAnalysis.compressionRatio(spark, col("text")).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact-equality oracle: the same static helper, run on the driver
    for ((id, text) <- Seq(1L -> "the quick brown fox jumps over the lazy dog and keeps going",
        2L -> "spam spam spam spam spam spam spam spam spam spam spam spam",
        3L -> "zq9#kL!x2@Wp$v8&Tm^c4*Rj(b7)Ne_hY5+uG3-sD1=fA6~iO0`eKqZw",
        4L -> ""))
      assert(got(id) === graft.functions.DeflateRatioHelper.ratioOf(
        UTF8String.fromString(text)), s"doc $id")
    // the published ordering the signal exists for: repetitive << prose < noise
    assert(got(2L) < got(1L) && got(1L) < got(3L), got.toString)
    // UDF fallback path computes the identical value
    val viaUdf = {
      val f = org.apache.spark.sql.functions.udf((s: String) =>
        graft.functions.DeflateRatioHelper.ratioOf(UTF8String.fromString(s)))
      docs.filter(col("id") === 2L).select(f(col("text"))).head.getDouble(0)
    }
    assert(viaUdf === got(2L))
  }

  test("compressionRatio: null text stays null") {
    val d = Seq((1L, null.asInstanceOf[String]), (2L, "abc")).toDF("id", "text")
    val rows = d.select(col("id"),
      graft.ext.TextAnalysis.compressionRatio(spark, col("text")).as("r"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && !rows(1).isNullAt(1))
  }

  test("multimodal: JPEG pixels decode for real through the JDK codec") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream

    def jpegBytes(w: Int, h: Int, paint: (Int, Int) => Int): Array[Byte] = {
      val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, paint(x, y))
      val out = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(im, "jpg", out), "JDK JPEG writer absent")
      out.toByteArray
    }

    import spark.implicits._
    val red = jpegBytes(16, 8, (_, _) => 0xff0000)
    val halves = jpegBytes(32, 32, (x, _) => if (x < 16) 0x000000 else 0xffffff)
    val truncated = red.take(40) // valid magic, dies in the entropy coder
    val media = Seq(
      Multimodal.MediaRow(1L, red, "image/jpeg", 0, 0),
      Multimodal.MediaRow(2L, halves, "image/jpeg", 0, 0),
      Multimodal.MediaRow(3L, truncated, "image/jpeg", 0, 0)).toDF()
    val f = Multimodal.extractFeatures(spark, media, batchSize = 2)
      .collect().map(x => x.doc_id -> x).toMap

    // geometry is exact; solid red decodes to means ~(1,0,0) (JPEG is
    // lossy but near-exact on solid blocks)
    assert(f(1L).format == "image/jpeg")
    val Array(w1, h1, r1, g1, b1, lum1) = f(1L).feature
    assert(w1 == 16f && h1 == 8f)
    assert(r1 > 0.9f && g1 < 0.2f && b1 < 0.2f, f(1L).feature.toSeq.toString)
    assert(math.abs(lum1 - (0.299f * r1 + 0.587f * g1 + 0.114f * b1)) < 1e-6)
    // half-black/half-white: every channel mean ~0.5
    val Array(w2, h2, r2, g2, b2, _) = f(2L).feature
    assert(w2 == 32f && h2 == 32f)
    for (m <- Seq(r2, g2, b2))
      assert(math.abs(m - 0.5f) < 0.05f, f(2L).feature.toSeq.toString)
    // truncated payload: total operator, falls back to byte stats
    assert(f(3L).format == "image/jpeg" && f(3L).feature.length == 4)
  }
}
