package graft

import org.apache.spark.sql.functions._
import graft.ext.Urls

/** URL canonicalization spec — every rule of the documented canonical
  * form, plus NULL semantics for unparseable rows and the dedup shape.
  */
class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(Urls.canonicalize($"u").as("c"))
      .as[String].collect().toSeq

  test("scheme and host lowercased; www and fragment dropped") {
    assert(canon("HTTPS://WWW.Example.COM/Path#frag") ===
      Seq("https://example.com/Path"))
  }

  test("path case is preserved") {
    assert(canon("http://a.com/CaseSensitive/Path") ===
      Seq("http://a.com/CaseSensitive/Path"))
  }

  test("default ports dropped, non-default kept") {
    assert(canon(
      "http://a.com:80/x", "https://a.com:443/x", "http://a.com:8080/x") ===
      Seq("http://a.com/x", "https://a.com/x", "http://a.com:8080/x"))
  }

  test("trailing slashes stripped; bare host canonical") {
    assert(canon("http://a.com/x///", "http://a.com/", "http://a.com") ===
      Seq("http://a.com/x", "http://a.com", "http://a.com"))
  }

  test("tracking params removed; rest sorted; empty query drops ?") {
    assert(canon(
      "http://a.com/x?b=2&utm_source=f&a=1",
      "http://a.com/x?a=1&b=2&gclid=g&fbclid=h&msclkid=i",
      "http://a.com/x?utm_campaign=c") ===
      Seq("http://a.com/x?a=1&b=2",
        "http://a.com/x?a=1&b=2",
        "http://a.com/x"))
  }

  test("bare ref is NOT stripped by default: ?ref= selects page content") {
    // two DIFFERENT pages on a code-hosting site — stripping ref would
    // canonicalize them together and URL dedup (by key, no text-stage
    // backstop) would silently delete one of them
    val pages = Seq(
      (1L, "http://host.com/repo/readme?ref=main"),
      (2L, "http://host.com/repo/readme?ref=release-v2")
    ).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(pages, "doc_id", "url")
    assert(out.count() === 2, "ref-distinct pages must both survive dedup")
    // a caller that KNOWS its crawl's ref is attribution-only can opt in
    val widened = Urls.dedupByUrl(pages, "doc_id", "url",
      trackingParams = Urls.DefaultTrackingParams :+ "ref")
    assert(widened.count() === 1)
  }

  test("param ORDER never distinguishes pages") {
    assert(canon("http://a.com/x?z=1&a=2") === canon("http://a.com/x?a=2&z=1"))
  }

  test("http and https remain distinct (no scheme upgrade)") {
    assert(canon("http://a.com/x") !== canon("https://a.com/x"))
  }

  test("userinfo dropped: credentials never change the page identity") {
    assert(canon("http://user:pw@a.com:8080/x", "http://a.com:8080/x")
      .distinct.size === 1)
  }

  test("unparseable rows canonicalize to NULL") {
    val out = Seq("not a url", "", "just/words").toDF("u")
      .select(Urls.canonicalize($"u").as("c"))
    assert(out.filter($"c".isNotNull).count() === 0)
  }

  test("dedupByUrl: keep-first on canonical key, counts duplicates") {
    val df = Seq(
      (10L, "HTTP://A.com/x?b=2&a=1"),
      (11L, "http://a.com/x/?a=1&b=2&utm_source=s"),
      (12L, "http://a.com/y"),
      (13L, "garbage")
    ).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(df, "doc_id", "url")
      .orderBy("url_canon")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("http://a.com/x?a=1&b=2", 10L, 2L),
      ("http://a.com/y", 12L, 1L)))
  }

  test("dedup is one hash aggregation (map-side combinable)") {
    val df = Seq((1L, "http://a.com/x")).toDF("doc_id", "url")
    val plan = Urls.dedupByUrl(df, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"),
      s"dedup should be a hash aggregate:\n$plan")
    assert(!plan.contains("Window"), s"no window sort expected:\n$plan")
  }
}
