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

  test("rrf: fused score is the sum of reciprocal ranks; single-list ids survive") {
    import graft.ext.Retrieval
    val a = Seq((10L, 0.9), (20L, 0.8), (30L, 0.7)).toDF("doc_id", "score")
    val b = Seq((20L, 0.99), (40L, 0.5)).toDF("doc_id", "score")
    val fused = Retrieval.rrf(
      Seq(Retrieval.ranked(a, "doc_id", "score"),
        Retrieval.ranked(b, "doc_id", "score")),
      "doc_id", k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val byId = fused.map(t => t._1 -> t).toMap
    def rr(r: Int) = 1.0 / (60 + r)
    // 20 appears rank2 in a, rank1 in b
    assert(math.abs(byId(20L)._2 - math.rint((rr(2) + rr(1)) * 1e6) / 1e6) < 1e-9)
    assert(byId(20L)._3 === 2L && byId(40L)._3 === 1L)
    // both-lists doc outranks every single-list doc here
    assert(fused.head._1 === 20L)
  }

  test("bm25: empty corpus fails with the diagnostic, not an NPE") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Bm25.search(empty, "doc_id", "text", Seq("join"), 5)
    }
    assert(e.getMessage.contains("empty corpus"))
  }

  test("indexed bm25: score-indistinguishable from the corpus scan") {
    val path = tmpDir("bm25idx") + "/idx"
    Bm25.buildIndex(docs, "doc_id", "text", path)
    for (q <- Seq(Seq("join"), Seq("join", "shuffle"), Seq("filler"))) {
      val scan = Bm25.search(docs, "doc_id", "text", q, 10)
        .collect().map(_.toSeq).toSeq
      val idx = Bm25.searchIndexed(spark, path, q, 10)
        .collect().map(_.toSeq).toSeq
      assert(idx === scan, s"query $q")
    }
  }

  test("indexed bm25: the term filter pushes into the postings scan") {
    val path = tmpDir("bm25push") + "/idx"
    Bm25.buildIndex(docs, "doc_id", "text", path)
    val plan = Bm25.searchIndexed(spark, path, Seq("join", "shuffle"), 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term IN must reach the parquet scan:\n$plan")
  }

  test("indexed bm25: querying a missing index fails loudly") {
    val e = intercept[IllegalArgumentException] {
      Bm25.searchIndexed(spark, tmpDir("bm25none") + "/nope", Seq("x"), 5)
    }
    assert(e.getMessage.contains("buildIndex"))
  }

  test("retrieval metrics: hand-computed recall/MRR/nDCG on a mixed list") {
    import org.apache.spark.sql.functions._
    import graft.ext.Retrieval
    // ranked list 1..4 = docs 10,20,30,40; relevant = {20, 40, 99}
    val lst = Seq((10L, 4.0), (20L, 3.0), (30L, 2.0), (40L, 1.0))
      .toDF("doc_id", "score")
    val rel = Seq(20L, 40L, 99L).toDF("doc_id")
    val r = Retrieval.metrics(Retrieval.ranked(lst, "doc_id", "score"),
      rel, "doc_id", k = 4).head
    assert(r.getLong(0) === 2L)                      // hits at ranks 2, 4
    assert(r.getDouble(1) === 0.666667)              // 2 of 3 relevant
    assert(r.getDouble(2) === 0.5)                   // first hit rank 2
    // dcg = 1/log2(3) + 1/log2(5); idcg = 1/log2(2) + 1/log2(3) + 1/log2(4)
    val dcg = 1.0 / (math.log(3) / math.log(2)) + 1.0 / (math.log(5) / math.log(2))
    val idcg = 1.0 + 1.0 / (math.log(3) / math.log(2)) + 0.5
    assert(math.abs(r.getDouble(3) - dcg / idcg) < 1e-6)
  }

  test("retrieval metrics: no hits -> zeros; empty relevant set loud") {
    import org.apache.spark.sql.functions._
    import graft.ext.Retrieval
    val lst = Retrieval.ranked(
      Seq((10L, 1.0)).toDF("doc_id", "score"), "doc_id", "score")
    val r = Retrieval.metrics(lst, Seq(99L).toDF("doc_id"), "doc_id", 5).head
    assert(r.getLong(0) === 0L && r.getDouble(1) === 0.0 &&
      r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0)
    intercept[IllegalArgumentException] {
      Retrieval.metrics(lst, Seq.empty[Long].toDF("doc_id"), "doc_id", 5)
    }
  }
}
