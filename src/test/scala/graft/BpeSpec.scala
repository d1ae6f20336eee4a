package graft

import graft.ext.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  val classic = Seq( // Sennrich et al.'s worked example corpus
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))

  test("bpe: most frequent pair merges first; training is deterministic") {
    val m1 = Bpe.trainLocal(classic, 4)
    val m2 = Bpe.trainLocal(classic, 4)
    assert(m1 === m2)
    // "es" appears in newest(6)+widest(3)=9 — the classic first merge
    assert(m1.head === (("e", "s")))
    assert(m1(1) === (("es", "t")))
  }

  test("bpe: with enough merges every training word becomes one token") {
    val merges = Bpe.trainLocal(classic, 100)
    val ranks = merges.zipWithIndex.toMap
    for ((w, _) <- classic)
      assert(Bpe.encodeWord(w, ranks).length === 1, s"word $w")
    // an unseen word still encodes (to learned subwords + leftovers)
    val toks = Bpe.encodeWord("lowest", ranks)
    assert(toks.nonEmpty && toks.mkString == "lowest" + Bpe.EndOfWord)
  }

  test("bpe GOLDEN: frozen merge table and exact token arrays, hand-derived") {
    // the full 10-merge sequence over the classic corpus, derived BY HAND
    // from the (count desc, pair asc) rule — a drift in either the
    // trainer's tie-breaking or the encoder's rank-apply order fails this
    // exactly, which upgrades the rows-only ext_bpe_tokens entry with a
    // golden equality gate on the algorithm itself
    val golden = Vector(
      ("e", "s"), ("es", "t"), ("est", "</w>"),           // 9,9,9 by pair asc
      ("l", "o"), ("lo", "w"),                            // 7,7
      ("e", "w"), ("ew", "est</w>"), ("n", "ewest</w>"),  // 6-ties by pair asc
      ("low", "</w>"),                                    // 5
      ("d", "est</w>"))                                   // 3-tie: d < i < w
    assert(Bpe.trainLocal(classic, 10) === golden)
    val ranks = golden.zipWithIndex.toMap
    val expect = Map(
      "low" -> Vector("low</w>"),
      "lower" -> Vector("low", "e", "r", "</w>"),
      "newest" -> Vector("newest</w>"),
      "widest" -> Vector("w", "i", "dest</w>"),
      "lowest" -> Vector("low", "est</w>"),   // unseen: learned subwords
      "wildest" -> Vector("w", "i", "l", "dest</w>"))
    for ((w, toks) <- expect)
      assert(Bpe.encodeWord(w, ranks) === toks,
        s"$w -> ${Bpe.encodeWord(w, ranks)} (want $toks)")
  }

  test("bpe: distributed histogram + token counts match driver encode") {
    val df = Seq(
      (1L, "low low lower"),
      (2L, "newest newest widest"),
      (3L, "")).toDF("doc_id", "text")
    val hist = Bpe.wordHistogram(df, "text", 100).as[(String, Long)]
      .collect().toMap
    assert(hist === Map("low" -> 2L, "lower" -> 1L,
      "newest" -> 2L, "widest" -> 1L))
    val merges = Bpe.train(Bpe.wordHistogram(df, "text", 100), 3)
    val ranks = merges.zipWithIndex.toMap
    val got = Bpe.tokenCounts(spark, df, "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val expect = Seq(
      (1L, "low low lower"), (2L, "newest newest widest"), (3L, ""))
      .map { case (id, t) =>
        val ws = "[a-z0-9]+".r.findAllIn(t.toLowerCase).toSeq
        (id, ws.map(w => Bpe.encodeWord(w, ranks).length.toLong).sum,
          ws.size.toLong)
      }
    assert(got.toSeq === expect)
  }

  test("bpe: token counts preserve non-numeric id types") {
    val df = Seq(("doc-a", "low low"), ("doc-b", "widest")).toDF("id", "text")
    val merges = Bpe.train(Bpe.wordHistogram(df, "text", 100), 2)
    val got = Bpe.tokenCounts(spark, df, "id", "text", merges)
      .orderBy("id").collect().map(r => (r.getString(0), r.getLong(2)))
    assert(got.toSeq === Seq(("doc-a", 2L), ("doc-b", 1L)))
  }
}
