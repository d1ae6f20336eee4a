package graft

import graft.ext.{Bpe, UnigramLm}

/** Unigram-LM tokenizer: a hand-derivable golden case (the EM fixed
  * point is analytic on a one-word corpus), the totality/lossless
  * invariants, determinism, likelihood-improving segmentation vs chars,
  * and the distributed encode == driver encode equivalence.
  */
class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("GOLDEN: one-word corpus — EM concentrates on the whole word") {
    // corpus = "ab" ×100. Seeds: a, b (chars) + ab. Initial probs ∝
    // score (a:100, b:100, ab:200): Viterbi("ab") compares [ab] =
    // log(200/400) against [a,b] = 2·log(100/400) → [ab] wins. M-step
    // gives ab virtually all mass (chars keep the 0.5 floor), so the
    // fixed point segments "ab" as ONE piece — hand-derived, no
    // reference to the implementation.
    val m = UnigramLm.trainLocal(Seq(("ab", 100L)), vocabSize = 3)
    assert(UnigramLm.encodeWord("ab", m) === Vector("ab"))
    // the pieces a and b survive (totality floor) but carry far less
    // probability than ab
    assert(m.pieces.keySet === Set("a", "b", "ab"))
    assert(m.pieces("ab") > m.pieces("a") && m.pieces("ab") > m.pieces("b"))
    // unseen composition segments with the known pieces
    assert(UnigramLm.encodeWord("aab", m) === Vector("a", "ab"))
  }

  test("totality + losslessness: every word segments, pieces concat back") {
    val hist = Seq(("hello", 50L), ("help", 30L), ("world", 20L),
      ("held", 10L), ("low", 40L))
    val m = UnigramLm.trainLocal(hist, vocabSize = 12)
    for (w <- Seq("hello", "help", "world", "held", "low",
        "lowhello", "unseenword", "zzz")) {
      val pieces = UnigramLm.encodeWord(w, m)
      assert(pieces.mkString === w, s"lossy segmentation of '$w': $pieces")
      assert(pieces.forall(_.nonEmpty))
    }
  }

  test("unknown characters encode via the unk floor, never win over known") {
    val m = UnigramLm.trainLocal(Seq(("abc", 10L)), vocabSize = 6)
    val pieces = UnigramLm.encodeWord("axbc", m)
    assert(pieces.mkString === "axbc")
    assert(pieces.contains("x"), s"unk char must stand alone: $pieces")
    assert(m.unkLogProb < m.pieces.valuesIterator.min)
  }

  test("determinism: identical histograms train identical models") {
    val hist = Seq(("alpha", 30L), ("alphabet", 20L), ("bet", 25L),
      ("beta", 15L), ("gamma", 10L))
    val m1 = UnigramLm.trainLocal(hist, vocabSize = 15)
    val m2 = UnigramLm.trainLocal(hist, vocabSize = 15)
    assert(m1 === m2)
  }

  test("the trained vocab compresses the training corpus below chars") {
    val hist = Seq(("tokenization", 40L), ("organization", 35L),
      ("realization", 30L), ("nation", 25L), ("ration", 20L))
    val m = UnigramLm.trainLocal(hist, vocabSize = 30)
    val (toks, chars) = hist.map { case (w, c) =>
      (UnigramLm.encodeWord(w, m).length.toLong * c, w.length.toLong * c)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(toks < chars / 2,
      s"shared -ization/-ation mass must compress: $toks vs $chars chars")
    // vocab budget respected
    assert(m.pieces.size <= 30)
  }

  test("vocab never shrinks below the character set; budget still honored") {
    val m = UnigramLm.trainLocal(Seq(("abcdefgh", 5L)), vocabSize = 2)
    assert(m.pieces.keySet.filter(_.length == 1).size === 8,
      "single chars must survive any budget (totality)")
  }

  test("distributed pieceCounts == driver encode, null text = zero") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(120)
    val m = UnigramLm.train(
      Bpe.wordHistogram(docs, "text", 5000), vocabSize = 200)
    val dist = UnigramLm.pieceCounts(spark, docs, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val local = docs.select("doc_id", "text").collect().map { r =>
      val words = "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase).toSeq
      r.getLong(0) ->
        (words.map(w => UnigramLm.encodeWord(w, m).length.toLong).sum,
          words.size.toLong)
    }.toMap
    assert(dist === local)
    val withNull = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val z = UnigramLm.pieceCounts(spark, withNull, "doc_id", "text", m)
      .collect().head
    assert(z.getLong(1) === 0L && z.getLong(2) === 0L)
  }

  test("unigram and BPE genuinely differ: same corpus, both compress") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val hist = Bpe.wordHistogram(docs, "text", 5000)
    // budgets kept BELOW whole-word coverage for this corpus's ~31-word
    // synthetic vocabulary, so both tokenizers genuinely split subwords
    val uni = UnigramLm.train(hist, vocabSize = 40)
    val bpe = Bpe.train(hist, numMerges = 25)
    val u = UnigramLm.pieceCounts(spark, docs, "doc_id", "text", uni)
      .agg(org.apache.spark.sql.functions.sum("unigram_tokens"),
        org.apache.spark.sql.functions.sum("words")).collect().head
    val b = Bpe.tokenCounts(spark, docs, "doc_id", "text", bpe)
      .agg(org.apache.spark.sql.functions.sum("bpe_tokens")).collect().head
    // both are real subword tokenizers on this corpus: more tokens than
    // words (subword splitting happens), and the two counts differ (the
    // families are not the same tokenizer in disguise)
    assert(u.getLong(0) > u.getLong(1), "unigram degenerated to words")
    assert(b.getLong(0) > u.getLong(1), "bpe degenerated to words")
    assert(u.getLong(0) !== b.getLong(0))
  }
}
