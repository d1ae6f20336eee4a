package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 1=keeper, 2=exact dup of 1, 3=near dup of 1,
  // 4=junk (low quality: short + pure punctuation), 5=distinct keeper
  // with PII, 6=distinct keeper in another lang
  private def corpus = Seq(
    (1L, ("the quick brown fox jumps over the lazy dog and then " * 8).trim, "en"),
    (2L, ("the quick brown fox jumps over the lazy dog and then " * 8).trim, "en"),
    (3L, (("the quick brown fox jumps over the lazy dog and then " * 8) + "tail").trim, "en"),
    (4L, "!!! ??? ###", "en"),
    (5L, ("reach me at bob@example.com for the report details now " * 8).trim, "en"),
    (6L, ("el rapido zorro marron salta sobre el perro perezoso y " * 8).trim, "es")
  ).toDF("doc_id", "text", "lang")

  test("curation: junk gated, dups collapsed, chunks written per-lang, PII gone") {
    val out = tmpDir("curation") + "/corpus"
    val r = Curation.run(spark, corpus, out,
      minQuality = 0.3, threshold = 0.5, window = 20, stride = 15)
    assert(r.input == 6)
    assert(r.afterQuality == 5, s"quality gate kept ${r.afterQuality}") // doc 4 gone
    assert(r.afterExact == 4, s"exact dedup kept ${r.afterExact}") // doc 2 gone
    assert(r.afterNearDup == 3, s"near dedup kept ${r.afterNearDup}") // doc 3 gone
    assert(r.chunks > 0)

    val written = spark.read.parquet(out)
    assert(written.count() == r.chunks)
    // survivors are exactly the canonical keepers
    assert(written.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 5L, 6L))
    // lang partition directories exist (partitioned write)
    assert(new java.io.File(s"$out/lang=en").isDirectory)
    assert(new java.io.File(s"$out/lang=es").isDirectory)
    // PII was redacted before chunking
    val doc5 = written.filter(col("doc_id") === 5L)
      .agg(concat_ws(" ", collect_list("chunk"))).head().getString(0)
    assert(!doc5.contains("bob@example.com") && doc5.contains("<EMAIL>"))
  }

  test("boilerplate stage: shared lines stripped everywhere, husks dropped") {
    // newline-structured docs: a cookie banner recurs in three docs; one
    // doc is NOTHING BUT the banner and must drop entirely
    val banner = "accept all cookies to continue reading this site"
    // bodies share NO vocabulary, so the near-dup stage cannot merge them
    val alpha = ("alpine meadows bloom under spring sunshine while marmots " +
      "whistle across high passes ") * 4
    val beta = ("binary search trees rotate nodes keeping lookup depth " +
      "logarithmic during insertion storms ") * 4
    val gamma = ("gamma ray bursts outshine entire galaxies for brief " +
      "cosmic moments every single year ") * 4
    val docs = Seq(
      (1L, s"$banner\n${alpha.trim}", "en"),
      (2L, s"${beta.trim}\n$banner", "en"),
      (3L, s"$banner", "en"),
      (4L, gamma.trim, "en")
    ).toDF("doc_id", "text", "lang")
    val out = tmpDir("cur_boiler") + "/c"
    val r = Curation.run(spark, docs, out, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      boilerplateMinDocs = Some(3))
    assert(r.afterBoilerplate == 3, s"$r") // doc 3 was pure banner
    val written = spark.read.parquet(out)
    assert(written.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    val all = written.agg(concat_ws(" ", collect_list("chunk")))
      .head().getString(0)
    assert(!all.contains("accept all cookies"),
      "banner text leaked into the curated chunks")
    assert(all.contains("alpine") && all.contains("binary") &&
      all.contains("galaxies"))
  }

  test("curation is deterministic: rerun produces the identical chunk set") {
    val out1 = tmpDir("cur_a") + "/c"
    val out2 = tmpDir("cur_b") + "/c"
    val r1 = Curation.run(spark, corpus, out1, minQuality = 0.3,
      threshold = 0.5, window = 20, stride = 15)
    val r2 = Curation.run(spark, corpus, out2, minQuality = 0.3,
      threshold = 0.5, window = 20, stride = 15)
    assert(r1 == r2)
    val a = spark.read.parquet(out1).orderBy("doc_id", "chunk_id")
      .collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(out2).orderBy("doc_id", "chunk_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
