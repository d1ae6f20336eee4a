package graft

import org.apache.spark.sql.functions._
import graft.ext.LineDedup

/** Line-level dedup (C4-style): keep-first semantics, boilerplate
  * stripping + reassembly, and the plan shapes that make both scale
  * (map-side partial agg for keep-first; broadcast removal join).
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha\nboiler\nbeta"),
    (2L, "boiler\nalpha\ngamma"),
    (3L, "boiler\ndelta"),
    (4L, "delta\nepsilon")
  ).toDF("doc_id", "text")

  test("explodeLines: 1-based positions, map-side only") {
    val lines = LineDedup.explodeLines(corpus, "doc_id", "text")
    assert(lines.columns.toSeq === Seq("doc_id", "line_no", "line"))
    assert(lines.count() === 10)
    assert(lines.filter($"doc_id" === 1L).orderBy("line_no")
      .select("line").as[String].collect().toSeq ===
      Seq("alpha", "boiler", "beta"))
    // no shuffle in the exploded plan
    val plan = lines.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"explode should not shuffle:\n$plan")
  }

  test("dedupLines: corpus-wide keep-first by (doc_id, line_no)") {
    val out = LineDedup.dedupLines(corpus, "doc_id", "text")
      .orderBy("doc_id", "line_no")
      .as[(Long, Int, String)].collect().toSeq
    // "boiler" first occurs in doc 1 line 2; "alpha" doc 1 line 1;
    // "delta" doc 3 line 2 beats doc 4 line 1 on doc order
    assert(out === Seq(
      (1L, 1, "alpha"), (1L, 2, "boiler"), (1L, 3, "beta"),
      (2L, 3, "gamma"), (3L, 2, "delta"), (4L, 2, "epsilon")))
  }

  test("dedupLines: integral ids plan a map-combinable HashAggregate") {
    val plan = LineDedup.dedupLines(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"packed keep-first should hash-aggregate:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"packed keep-first must not sort partitions:\n$plan")
    assert(!plan.contains("Window"),
      s"keep-first must not plan a window sort:\n$plan")
  }

  test("dedupLines: string ids take the struct-min path, same semantics") {
    val df = Seq(
      ("a", "x\ny"), ("b", "y\nz")
    ).toDF("doc_id", "text")
    val out = LineDedup.dedupLines(df, "doc_id", "text")
      .orderBy("doc_id", "line_no")
      .as[(String, Int, String)].collect().toSeq
    assert(out === Seq(("a", 1, "x"), ("a", 2, "y"), ("b", 2, "z")))
  }

  test("dedupLines: negative ids fail loudly, never silently mis-order") {
    val df = Seq((-1L, "x\ny")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      LineDedup.dedupLines(df, "doc_id", "text").collect()
    }
    assert(e.getMessage.contains("negative") ||
      e.getCause != null && e.getCause.getMessage.contains("negative"),
      s"unexpected error: ${e.getMessage}")
  }

  test("boilerplateLines: document-frequency threshold") {
    val b = LineDedup.boilerplateLines(corpus, "doc_id", "text", minDocs = 3)
      .as[(String, Long)].collect().toMap
    assert(b === Map("boiler" -> 3L))
    // alpha and delta each appear in 2 docs — caught at minDocs = 2
    val b2 = LineDedup.boilerplateLines(corpus, "doc_id", "text", minDocs = 2)
      .as[(String, Long)].collect().toMap
    assert(b2 === Map("boiler" -> 3L, "alpha" -> 2L, "delta" -> 2L))
  }

  test("stripBoilerplate: removal + in-order reassembly, corpus unshuffled") {
    val cleaned = LineDedup.stripBoilerplate(
      corpus, "doc_id", "text", minDocs = 3)
    val byId = cleaned.as[(Long, String)].collect().toMap
    assert(byId === Map(
      1L -> "alpha\nbeta", 2L -> "alpha\ngamma",
      3L -> "delta", 4L -> "delta\nepsilon"))
    val plan = cleaned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"),
      s"the boilerplate set should broadcast:\n$plan")
    // removal is an array filter over the corpus's own text: no explode
    // of the corpus, no anti-join, no per-doc reassembly aggregation
    assert(!plan.contains("collect_list"),
      s"no reassembly aggregation expected:\n$plan")
    assert(!plan.contains("SortAggregate") && !plan.contains("Window"),
      s"no sort-based operator expected:\n$plan")
  }

  test("stripBoilerplate: in-doc duplicate non-boilerplate lines survive") {
    val df = Seq(
      (1L, "keep\nboil\nkeep"), (2L, "boil\nx"), (3L, "boil\ny")
    ).toDF("doc_id", "text")
    val byId = LineDedup.stripBoilerplate(df, "doc_id", "text", minDocs = 3)
      .as[(Long, String)].collect().toMap
    assert(byId === Map(1L -> "keep\nkeep", 2L -> "x", 3L -> "y"))
  }

  test("stripBoilerplate: a fully-boilerplate document disappears") {
    val df = Seq(
      (1L, "x\ny"), (2L, "x\ny"), (3L, "x\ny")
    ).toDF("doc_id", "text")
    val cleaned = LineDedup.stripBoilerplate(df, "doc_id", "text", minDocs = 2)
    assert(cleaned.count() === 0)
  }

  test("custom separator regex and join separator") {
    val df = Seq((1L, "a | b | a")).toDF("doc_id", "text")
    val lines = LineDedup.explodeLines(df, "doc_id", "text",
      sepRegex = "\\s\\|\\s")
    assert(lines.select("line").as[String].collect().toSeq ===
      Seq("a", "b", "a"))
    val kept = LineDedup.dedupLines(df, "doc_id", "text",
      sepRegex = "\\s\\|\\s")
    assert(kept.count() === 2)
  }
}
