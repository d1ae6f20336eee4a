package graft

import graft.ext.Bm25

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  val docs = Seq(
    (1L, "spark shuffle join broadcast join join"), // tf(join)=3, short
    (2L, "spark shuffle join"),                     // tf(join)=1
    (3L, "completely unrelated words only here"),   // no match
    (4L, "join " + Seq.fill(96)("filler").mkString(" ")) // tf=1, long doc
  ).toDF("doc_id", "text")

  test("bm25: higher tf ranks higher; non-matching docs absent") {
    val got = Bm25.search(docs, "doc_id", "text", Seq("join"), 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(got.head === 1L, s"tf=3 doc should rank first: $got")
    assert(!got.contains(3L))
    assert(got.toSet === Set(1L, 2L, 4L))
  }

  test("bm25: length normalization — same tf, longer doc scores lower") {
    val rows = Bm25.search(docs, "doc_id", "text", Seq("join"), 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(rows(2L) > rows(4L),
      s"short doc must beat long doc at equal tf: $rows")
  }

  test("bm25: multi-term queries sum per-term scores; matched counts terms") {
    val got = Bm25.search(docs, "doc_id", "text", Seq("join", "shuffle"), 10)
      .select("doc_id", "matched").as[(Long, Long)].collect().toMap
    assert(got(1L) === 2L && got(2L) === 2L && got(4L) === 1L)
  }
}
