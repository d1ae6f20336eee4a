package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** robots.txt compliance (RFC 9309): group selection, the §2.2.2
  * longest-match examples hand-derived from the RFC's own tables,
  * wildcard/anchor matching, and the Spark filter op.
  */
class RobotsSpec extends AnyFunSuite {

  test("RFC 9309 §5.2-style longest-match table, hand-derived") {
    val rules = Seq(
      Robots.Rule("/", allow = true),
      Robots.Rule("/folder", allow = false),
      Robots.Rule("/folder/", allow = true),
      Robots.Rule("/*.ext$", allow = false))
    // /folder/page: allow /folder/ (len 8) beats disallow /folder (7)
    assert(Robots.allowed(rules, "/folder/page"))
    // /folderx: disallow /folder (7) beats allow / (1)
    assert(!Robots.allowed(rules, "/folderx"))
    // /page.ext: the anchored wildcard disallow (len 7) beats / (1)
    assert(!Robots.allowed(rules, "/page.ext"))
    // /page.ext.html: $ anchor fails -> allow / wins
    assert(Robots.allowed(rules, "/page.ext.html"))
    // no rule matches -> allowed
    assert(Robots.allowed(Nil, "/anything"))
  }

  test("tie between allow and disallow of equal length: allow wins") {
    val rules = Seq(
      Robots.Rule("/p", allow = false),
      Robots.Rule("/p", allow = true))
    assert(Robots.allowed(rules, "/page"))
    assert(Robots.allowed(rules.reverse, "/page"))
  }

  test("pattern matching: wildcards, anchors, root-only $") {
    assert(Robots.patternMatches("/a*b", "/a-x-b-tail"))
    assert(!Robots.patternMatches("/a*b", "/a-x-c"))
    assert(Robots.patternMatches("/a*b$", "/a-x-b"))
    assert(!Robots.patternMatches("/a*b$", "/a-x-b-tail"))
    assert(Robots.patternMatches("/$", "/"))
    assert(!Robots.patternMatches("/$", "/x"))
    assert(Robots.patternMatches("*private", "/deep/private"))
    assert(Robots.patternMatches("/a*b*c", "/a.b.b.c"))
  }

  test("group selection: longest prefixing token, * fallback, runs") {
    val txt =
      """# corpus crawler policy
        |User-agent: bot
        |Disallow: /bot-only
        |
        |User-agent: bot-news
        |User-agent: other
        |Disallow: /news
        |
        |Sitemap: https://x/sitemap.xml
        |
        |User-agent: *
        |Disallow: /all
        |""".stripMargin
    // bot-news-eu matches 'bot-news' (8) over 'bot' (3)
    assert(Robots.rulesFor(txt, "bot-news-eu") ==
      Seq(Robots.Rule("/news", allow = false)))
    // bot-image matches only 'bot'
    assert(Robots.rulesFor(txt, "bot-image") ==
      Seq(Robots.Rule("/bot-only", allow = false)))
    // a stranger gets the * group
    assert(Robots.rulesFor(txt, "stranger") ==
      Seq(Robots.Rule("/all", allow = false)))
    // the Sitemap line neither attaches rules nor splits groups
    assert(Robots.rulesFor(txt, "other") ==
      Seq(Robots.Rule("/news", allow = false)))
  }

  test("empty Disallow matches nothing; rules before any group drop") {
    val txt =
      """Disallow: /orphan
        |User-agent: *
        |Disallow:
        |Allow: /ok
        |""".stripMargin
    val rules = Robots.rulesFor(txt, "any")
    assert(rules == Seq(Robots.Rule("/ok", allow = true)), s"$rules")
    assert(Robots.allowed(rules, "/orphan/page"))
  }

  test("pathOf: query kept, fragment dropped, bare host is root") {
    assert(Robots.pathOf("https://h.ex/p/q?a=1#frag") == "/p/q?a=1")
    assert(Robots.pathOf("https://h.ex") == "/")
    assert(Robots.pathOf("https://h.ex?a=1") == "/?a=1")
  }

  test("filterAllowed: per-host rules, robots-less hosts pass, columns survive") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val robots = Seq(
      ("strict.ex", "User-agent: *\nDisallow: /private\nAllow: /private/pub\n"),
      ("agent.ex", "User-agent: graftbot\nDisallow: /\n" +
        "User-agent: *\nAllow: /\n")).toDF("host", "robots_txt")
    val urls = Seq(
      (1L, "https://strict.ex/public/a"),
      (2L, "https://strict.ex/private/x"),
      (3L, "https://strict.ex/private/pub/y"),
      (4L, "https://agent.ex/any"),
      (5L, "https://norobots.ex/free")).toDF("id", "url")
    val got = Robots.filterAllowed(spark, urls, "url",
        robots, "host", "robots_txt", "graftbot")
      .select("id").as[Long].collect().sorted.toSeq
    // graftbot: strict.ex blocks /private but allows /private/pub
    // (longer match); agent.ex blocks graftbot entirely; norobots
    // passes by default
    assert(got == Seq(1L, 3L, 5L), s"$got")
  }

  test("hostile totality: junk robots bodies and URLs never throw") {
    val r = new scala.util.Random(77)
    for (_ <- 0 until 300) {
      val junk = new String(Array.fill(1 + r.nextInt(300))(
        r.nextInt(128).toByte), "US-ASCII")
      val rules = Robots.rulesFor(junk, "bot")
      Robots.allowed(rules, Robots.pathOf(junk))
    }
    assert(Robots.rulesFor("", "bot") == Nil)
  }
}
