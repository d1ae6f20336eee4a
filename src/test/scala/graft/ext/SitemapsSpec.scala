package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Sitemap extraction: hand-authored goldens for all three protocol
  * forms, the gzip wrapper, malformed-entry skips, and totality.
  */
class SitemapsSpec extends AnyFunSuite {

  test("hand-authored urlset: entities, lastmod year, priority, loc-less skip") {
    val xml =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>https://ex.org/a?x=1&amp;y=2</loc>
        |    <lastmod>2021-06-15</lastmod>
        |    <priority>0.8</priority>
        |  </url>
        |  <url><lastmod>2020-01-01</lastmod></url>
        |  <url><loc>https://ex.org/plain</loc></url>
        |</urlset>
        |""".stripMargin.getBytes("UTF-8")
    val got = Sitemaps.parse(xml).get
    // the loc-less middle entry contributes nothing
    assert(got == Seq(
      Sitemaps.Entry("urlset", "https://ex.org/a?x=1&y=2",
        Some("2021-06-15"), Some(2021), Some(0.8)),
      Sitemaps.Entry("urlset", "https://ex.org/plain",
        None, None, None)), s"$got")
  }

  test("sitemapindex: child pointers with kind=index; <url vs <urlset delimiter") {
    val xml = ("<?xml version=\"1.0\"?><sitemapindex>" +
      "<sitemap><loc>https://ex.org/s1.xml</loc>" +
      "<lastmod>2019-12-31</lastmod></sitemap>" +
      "<sitemap><loc>https://ex.org/s2.xml.gz</loc></sitemap>" +
      "</sitemapindex>").getBytes("UTF-8")
    val got = Sitemaps.parse(xml).get
    assert(got.map(e => (e.kind, e.loc, e.year)) == Seq(
      ("index", "https://ex.org/s1.xml", Some(2019)),
      ("index", "https://ex.org/s2.xml.gz", None)), s"$got")
  }

  test("plain-text form: all-URL lists only; prose with a link is NOT a sitemap") {
    val txt = "https://ex.org/one\nhttps://ex.org/two\n\n".getBytes("UTF-8")
    val got = Sitemaps.parse(txt).get
    assert(got.map(_.loc) ==
      Seq("https://ex.org/one", "https://ex.org/two"))
    assert(got.forall(_.kind == "text"))
    val prose = ("see https://ex.org/one for details\n" +
      "https://ex.org/two\n").getBytes("UTF-8")
    assert(Sitemaps.parse(prose) == None)
    assert(Sitemaps.parse("no urls at all".getBytes("UTF-8")) == None)
  }

  test("gzipped sitemap unwraps once; encoder round-trips both forms") {
    val entries = Seq(
      ("https://ex.org/p0", "2022-03-04", 0.5),
      ("https://ex.org/p1?a=1&b=2", "", -1.0))
    val gz = Sitemaps.encode(entries, gzipped = true)
    val got = Sitemaps.parse(gz).get
    assert(got.map(_.loc) == entries.map(_._1), s"$got")
    assert(got.head.lastmod.contains("2022-03-04") &&
      got.head.priority.contains(0.5))
    val idx = Sitemaps.encode(
      Seq(("https://ex.org/child.xml", "2021-01-01", -1.0)),
      index = true)
    assert(Sitemaps.parse(idx).get.head.kind == "index")
  }

  test("an XML that is neither form returns None; over-cap text list CAPS") {
    assert(Sitemaps.parse(
      ("<?xml version=\"1.0\"?><doc><p>not a sitemap</p></doc>")
        .getBytes("UTF-8")) == None)
    // 50,001 URL lines: the text path must keep the first 50,000
    // like the XML path does, not reject the whole document
    val big = (0 to 50000).map(i => s"https://c.ex/$i")
      .mkString("", "\n", "\n").getBytes("UTF-8")
    val got = Sitemaps.parse(big).get
    assert(got.length == 50000 && got.head.loc == "https://c.ex/0")
  }

  test("hostile totality: bit flips, truncations, junk never throw") {
    val base = Sitemaps.encode(Seq(
      ("https://f.ex/a", "2020-01-01", 0.4),
      ("https://f.ex/b", "", -1.0)))
    val r = new scala.util.Random(91)
    for (_ <- 0 until 300) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(4))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Sitemaps.parse(mut)
    }
    for (cut <- 1 until base.length by 11) Sitemaps.parse(base.take(cut))
    Sitemaps.parse(Array.fill(64)(0x3c.toByte))
  }
}
