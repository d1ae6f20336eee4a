package graft

import org.apache.spark.sql.functions._
import graft.ext.Classifier

/** Naive Bayes quality classifier: hand-computed log-odds, unseen-word
  * default, class separation, partitioning invariance, and the gate.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // pos tokens: a:2 b:1 (Np=3); neg tokens: c:2 b:1 (Nn=3); V=3
  private lazy val pos = Seq((1L, "a a b")).toDF("doc_id", "text")
  private lazy val neg = Seq((2L, "c c b")).toDF("doc_id", "text")

  test("hand-computed word log-odds and prior") {
    val m = Classifier.train(pos, neg, "text", k = 1.0)
    assert(m.prior == 0.0) // one doc each
    // lo(a) = ln((2+1)/(3+3)) - ln((0+1)/(3+3)) = ln(3)
    val lo = m.logOdds.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(lo("a") - math.log(3.0)) < 1e-12)
    assert(math.abs(lo("b")) < 1e-12)            // symmetric counts
    assert(math.abs(lo("c") + math.log(3.0)) < 1e-12)
    // unseen word: ln((Nn+kV)/(Np+kV)) = ln(1) = 0 for symmetric corpora
    assert(math.abs(m.defaultLo) < 1e-12)
    // doc "a a": score = 2·ln 3
    val s = Classifier.score(Seq((9L, "a a")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().head
    assert(s.getLong(1) == 2)
    assert(math.abs(s.getDouble(2) - 2 * math.log(3.0)) < 1e-5)
  }

  test("asymmetric corpora: prior and default log-odds shift correctly") {
    val pos2 = Seq((1L, "a a b"), (2L, "a b a")).toDF("doc_id", "text")
    val m = Classifier.train(pos2, neg, "text", k = 1.0)
    assert(math.abs(m.prior - math.log(2.0)) < 1e-12)
    // Np=6, Nn=3, V=3: default = ln((3+3)/(6+3)) = ln(2/3) < 0
    assert(math.abs(m.defaultLo - math.log(6.0 / 9.0)) < 1e-12)
    // an all-unseen doc scores prior + 2·default
    val s = Classifier.score(Seq((9L, "z z")).toDF("doc_id", "text"),
      "doc_id", "text", m).collect().head
    assert(math.abs(s.getDouble(2) -
      (math.log(2.0) + 2 * math.log(6.0 / 9.0))) < 1e-5)
  }

  test("separates the classes it was trained on; gate keeps positives") {
    val posC = (1L to 20L).map(i =>
      (i, s"well written prose with varied structure and clear meaning $i"))
      .toDF("doc_id", "text")
    val negC = (21L to 40L).map(i =>
      (i, s"buy cheap pills now click here winner prize $i claim claim"))
      .toDF("doc_id", "text")
    val m = Classifier.train(posC, negC, "text", k = 0.5)
    val cand = Seq(
      (101L, "clear prose with varied meaning and structure"),
      (102L, "click here now to claim cheap prize pills")
    ).toDF("doc_id", "text")
    val s = Classifier.score(cand, "doc_id", "text", m)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(101L) > 0 && s(102L) < 0, s"$s")
    val kept = Classifier.filterBy(cand, "doc_id", "text", m)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(101L))
  }

  test("score is invariant to input partitioning") {
    val posC = (1L to 10L).map(i => (i, s"good text number $i ok"))
      .toDF("doc_id", "text")
    val negC = (11L to 20L).map(i => (i, s"bad junk number $i spam"))
      .toDF("doc_id", "text")
    val m = Classifier.train(posC, negC, "text")
    val docs = (1L to 30L).map(i => (i, s"text number $i spam ok good"))
      .toDF("doc_id", "text")
    val a = Classifier.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    val b = Classifier.score(docs.repartition(11), "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("save/load round-trip: loaded model scores bit-identically") {
    val posC = (1L to 10L).map(i => (i, s"good clear text number $i"))
      .toDF("doc_id", "text")
    val negC = (11L to 20L).map(i => (i, s"spam junk number $i click"))
      .toDF("doc_id", "text")
    val m = Classifier.train(posC, negC, "text", k = 0.5)
    val path = tmpDir("nbmodel") + "/m"
    Classifier.save(m, path)
    val loaded = Classifier.load(spark, path)
    assert(loaded.prior == m.prior && loaded.defaultLo == m.defaultLo &&
      loaded.k == m.k)
    val docs = (1L to 15L).map(i => (i, s"text number $i click good unseen"))
      .toDF("doc_id", "text")
    val a = Classifier.score(docs, "doc_id", "text", m)
      .orderBy("doc_id").collect().toSeq
    val b = Classifier.score(docs, "doc_id", "text", loaded)
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
    // a second save over the same path stays loadable (marker rewritten)
    Classifier.save(loaded, path)
    assert(Classifier.load(spark, path).logOdds.count() == m.logOdds.count())
    // incomplete save (no meta sidecar) refuses to load
    val broken = tmpDir("nbbroken") + "/m"
    m.logOdds.write.parquet(s"$broken/log_odds")
    val e = intercept[IllegalArgumentException] {
      Classifier.load(spark, broken)
    }
    assert(e.getMessage.contains("meta"))
  }
}
