package graft

import graft.ext.DataCard

/** Corpus data card: exact hand-computed metrics over a corpus with one
  * duplicate pair, one empty doc, one PII doc, two languages.
  */
class DataCardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma", "en"),
    (2L, "alpha beta gamma", "en"), // exact dup of 1
    (3L, "", "en"),                 // empty
    (4L, "contact me at a.b@example.com today", "fr")
  ).toDF("doc_id", "text", "lang")

  test("corpusCard: exact metrics on a hand-built corpus") {
    val card = DataCard.corpusCard(docs, "doc_id", "text", "lang")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("n_docs") === 4.0)
    // tokens: 3 + 3 + 1 + 5 — Spark's split(trim("")) yields [""] (one
    // token), matching DuckDB's string_split_regex; the email counts as
    // ONE whitespace token
    assert(card("total_tokens") === (3 + 3 + 1 + 5).toDouble)
    assert(card("pct_empty") === 0.25)
    assert(card("exact_dup_rate") === 0.25)  // 3 distinct hashes of 4 docs
    assert(card("pii_email_rate") === 0.25)
    assert(card("lang_share_en") === 0.75)
    assert(card("lang_share_fr") === 0.25)
    assert(card.keys.count(_.startsWith("lang_share_")) === 2)
  }

  test("corpusCard: empty corpus fails loudly") {
    val e = intercept[IllegalArgumentException] {
      DataCard.corpusCard(docs.limit(0), "doc_id", "text", "lang")
    }
    assert(e.getMessage.contains("empty"))
  }
}
