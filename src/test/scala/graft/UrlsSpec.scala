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

  test("registrableDomain: eTLD+1 heuristic with two-level suffixes and IPs") {
    import org.apache.spark.sql.functions._
    val hosts = Seq(
      "deep.sub.example.com", "example.com", "news.bbc.co.uk", "bbc.co.uk",
      "shop.example.com.au", "192.168.0.1", "localhost", "")
      .toDF("h")
    val got = hosts.select(col("h"),
      graft.ext.Urls.registrableDomain(col("h")).as("d"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(got("deep.sub.example.com") === Some("example.com"))
    assert(got("example.com") === Some("example.com"))
    assert(got("news.bbc.co.uk") === Some("bbc.co.uk"))   // two-level suffix
    assert(got("bbc.co.uk") === Some("bbc.co.uk"))
    assert(got("shop.example.com.au") === Some("example.com.au"))
    assert(got("192.168.0.1") === Some("192.168.0.1"))    // IPs pass whole
    assert(got("localhost") === Some("localhost"))        // single label
    assert(got("") === None)
  }

  test("domainQuota: cap binds per domain, deterministic at any partitioning") {
    import org.apache.spark.sql.functions._
    val rows = (1L to 60L).map(i =>
      (i, s"https://${if (i <= 40) "big.com" else "small.org"}/p$i"))
      .toDF("id", "url")
    val a = graft.ext.Urls.domainQuota(rows.repartition(1), "id", "url", 5)
      .select("id").as[Long].collect().toSet
    val b = graft.ext.Urls.domainQuota(rows.repartition(7), "id", "url", 5)
      .select("id").as[Long].collect().toSet
    assert(a === b)
    assert(a.count(_ <= 40L) === 5 && a.count(_ > 40L) === 5)
  }

  test("normalize: NFC merges composed and decomposed forms; controls collapse") {
    import org.apache.spark.sql.functions._
    val composed = "caf\u00e9"                 // é as one code point
    val decomposed = "cafe\u0301"              // e + combining acute
    val messy = "A\tB\u0000C   D "
    val df = Seq((1L, composed), (2L, decomposed), (3L, messy), (4L, null))
      .toDF("id", "t")
    val got = df.select(col("id"),
      graft.ext.TextAnalysis.normalize(spark, col("t")).as("n"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === got(2L), "NFC must merge the two caf\u00e9 encodings")
    assert(got(3L) === Some("a b c d"))
    assert(got(4L) === None)
    // native expression and UDF fallback agree
    val viaHelper = graft.functions.NfcNormalizeHelper.nfc(
      org.apache.spark.unsafe.types.UTF8String.fromString(decomposed)).toString
    assert(viaHelper === composed)
  }

  test("domainQuota: unparseable URLs pass through un-quota'd, domain null") {
    import org.apache.spark.sql.functions._
    val rows = Seq((1L, "https://big.com/a"), (2L, "https://big.com/b"),
      (3L, "not a url at all"), (4L, "also-not-a-url"))
      .toDF("id", "url")
    val out = graft.ext.Urls.domainQuota(rows, "id", "url", maxPerDomain = 1)
      .select("id", "domain").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out.size === 3)                 // 1 kept of big.com + both bad rows
    assert(out(3L) === None && out(4L) === None)
    assert(out.contains(1L) && !out.contains(2L)) // quota still binds
  }
}
