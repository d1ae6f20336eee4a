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

  test("mp3CoverageCard: frame-weighted rollup, zero-safe on no MP3s") {
    // per-stream rows as AudioFingerprint.mp3Coverage emits them:
    // 8/8, 0/8 and 5/8 decodable frames -> 13/24 corpus-weighted
    val cov = Seq((1L, 8L, 8L, 1.0), (2L, 8L, 0L, 0.0),
      (3L, 8L, 5L, 0.625))
      .toDF("doc_id", "frames_total", "frames_decodable",
        "decodable_fraction")
    val card = DataCard.mp3CoverageCard(cov)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("mp3_frames_total") === 24.0)
    assert(card("mp3_frames_decodable") === 13.0)
    assert(card("mp3_decodable_fraction") === 0.541667)
    // a corpus with no MP3 frames: totals 0, fraction 0 (not null/NaN)
    val empty = DataCard.mp3CoverageCard(cov.limit(0))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(empty("mp3_frames_total") === 0.0)
    assert(empty("mp3_decodable_fraction") === 0.0)
  }

  test("textExtractionCard: per-doc refused dedupe (pdf page repeat), rate, zero-safe") {
    // Pdf.table repeats the DOC-level refused on each page row: doc 1
    // has two pages with refused=3 — counted ONCE (max per doc).
    // chars: doc1 "abcde"+"fgh" = 8, doc2 "xy" = 2 -> 10; refused 3+1
    val rows = Seq(
      (1L, "abcde", 3L), (1L, "fgh", 3L), (2L, "xy", 1L))
      .toDF("doc_id", "text", "refused")
    val card = DataCard.textExtractionCard(rows, "pdf_text")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(card("pdf_text_docs") === 2.0)
    assert(card("pdf_text_rows") === 3.0)
    assert(card("pdf_text_chars") === 10.0)
    assert(card("pdf_text_refused") === 4.0)
    assert(card("pdf_text_refused_per_mchar") === 400000.0)
    val empty = DataCard.textExtractionCard(rows.limit(0), "html")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(empty("html_docs") === 0.0)
    assert(empty("html_refused_per_mchar") === 0.0)
  }
}
