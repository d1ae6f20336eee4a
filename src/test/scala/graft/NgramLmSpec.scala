package graft

import org.apache.spark.sql.functions._
import graft.ext.NgramLm

/** N-gram LM perplexity filter: hand-computed probabilities, unk
  * mapping under a capped vocab, unseen-gram smoothing, partitioning
  * invariance, and the filter composition.
  */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // corpus "a b a b a": uni a:3 b:2 (V=2); bi (a,b):2 (b,a):2
  private lazy val tiny = Seq((1L, "a b a b a")).toDF("doc_id", "text")

  test("hand-computed bigram probability and perplexity") {
    val m = NgramLm.train(tiny, "text", k = 0.5)
    assert(m.vocabSize == 2)
    // "a b": one bigram, p(b|a) = (2+0.5)/(3+0.5*2) = 0.625
    val r = NgramLm.score(Seq((9L, "a b")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().head
    assert(r.getLong(1) == 1)
    assert(math.abs(r.getDouble(2) - (-math.log(0.625) / math.log(2))) < 1e-5)
    assert(math.abs(r.getDouble(3) - 1.6) < 1e-5)
  }

  test("unseen word and bigram take the smoothed floor, never 0 or NaN") {
    val m = NgramLm.train(tiny, "text", k = 0.5)
    // "a c": c unseen (uncapped model) -> cb=0, cu(a)=3: p = 0.5/(3+1)
    val r = NgramLm.score(Seq((9L, "a c")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().head
    assert(math.abs(r.getDouble(3) - 8.0) < 1e-5) // 1/p = 8
    // both words unseen: cu=0 -> p = 0.5/(0+1) = 0.5, finite
    val r2 = NgramLm.score(Seq((9L, "x y")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().head
    assert(math.abs(r2.getDouble(3) - 2.0) < 1e-5)
  }

  test("capped vocab maps the tail to <unk> in training AND scoring") {
    val m = NgramLm.train(tiny, "text", k = 0.5, maxVocab = 1)
    // top-1 vocab = {a}; b -> <unk>: uni a:3 <unk>:2, bi (a,<unk>):2
    val unk = m.unigrams.filter(col("w") === NgramLm.UnkToken)
      .collect().head.getLong(1)
    assert(unk == 2L)
    // any OOV w2 scores identically to the trained tail token
    val both = NgramLm.score(
      Seq((1L, "a b"), (2L, "a zebra")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().sortBy(_.getLong(0))
    assert(both(0).getDouble(3) == both(1).getDouble(3))
    // and the probability is the REAL (a,<unk>) count, not the floor
    assert(math.abs(both(0).getDouble(3) - 1.0 / (2.5 / 4.0)) < 1e-5)
  }

  test("score is invariant to input partitioning") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, s"the quick fox ${i % 7} jumps over dog ${i % 3}"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(docs, "text", k = 0.1)
    val a = NgramLm.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    val b = NgramLm.score(docs.repartition(13), "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("incremental count store: ingests fold to the one-shot model, replay is a no-op") {
    val path = tmpDir("lmstore")
    val b1 = Seq((1L, "the cat sat on the mat"), (2L, "the dog sat here"))
      .toDF("doc_id", "text")
    val b2 = Seq((3L, "a cat and a dog sat"), (4L, "the mat sat still"))
      .toDF("doc_id", "text")
    NgramLm.ingestCounts(spark, b1, "text", path, "b1")
    NgramLm.ingestCounts(spark, b2, "text", path, "b2")
    NgramLm.ingestCounts(spark, b2, "text", path, "b2") // replay: ledger no-op

    def table(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val incr = NgramLm.load(spark, path, k = 0.5)
    val once = NgramLm.train(b1.unionAll(b2), "text", k = 0.5)
    assert(incr.vocabSize == once.vocabSize)
    assert(table(incr.unigrams) == table(once.unigrams))
    assert(table(incr.bigrams) == table(once.bigrams))
    val probe = Seq((9L, "the cat sat on a mat")).toDF("doc_id", "text")
    assert(
      NgramLm.score(probe, "doc_id", "text", incr).collect().toSeq ==
        NgramLm.score(probe, "doc_id", "text", once).collect().toSeq)

    // a vocab cap applied at LOAD time equals capping at train time:
    // fold-after-count and map-before-count commute
    val capIncr = NgramLm.load(spark, path, k = 0.5, maxVocab = 3)
    val capOnce = NgramLm.train(b1.unionAll(b2), "text", k = 0.5, maxVocab = 3)
    assert(table(capIncr.unigrams) == table(capOnce.unigrams))
    assert(table(capIncr.bigrams) == table(capOnce.bigrams))
  }

  test("perplexityFilter keeps reference-like docs, drops gibberish") {
    val reference = Seq.tabulate(30)(i =>
      (100L + i, "the cat sat on the mat and the dog sat on the rug"))
      .toDF("doc_id", "text")
    val m = NgramLm.train(reference, "text", k = 0.1)
    val candidates = Seq(
      (1L, "the cat sat on the rug"),          // in-domain: low ppl
      (2L, "zx qv wq jj kk zz pp aa bb cc")    // gibberish: floor probs
    ).toDF("doc_id", "text")
    val scored = NgramLm.score(candidates, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(scored(1L) < scored(2L))
    val kept = NgramLm.perplexityFilter(
      candidates, "doc_id", "text", m, maxPerplexity = scored(1L) + 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // sub-2-token docs have no bigram and are dropped by the gate
    val short = NgramLm.perplexityFilter(
      Seq((7L, "one")).toDF("doc_id", "text"),
      "doc_id", "text", m, maxPerplexity = 1e9)
    assert(short.count() == 0)
  }
}
