package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** HTML text extraction: hand-authored goldens (there is no fixture
  * writer to be circular with — every input here is handwritten and
  * every expected string hand-derived), charset sniffing, entity
  * boundary accounting, and hostile totality.
  */
class HtmlSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("full messy page: script/style/comment drop, blocks, title, inline flow") {
    val page =
      """<!DOCTYPE html>
        |<html lang="en">
        |<head>
        |  <meta charset="utf-8">
        |  <title> The  Title &amp; More </title>
        |  <style>p { color: red; } /* no leak */</style>
        |  <script type="text/javascript">
        |    var x = 1 < 2 && "</div>never text";
        |  </script>
        |</head>
        |<body>
        |  <!-- a comment <p>not text</p> -->
        |  <h1>Heading One</h1>
        |  <p>First    paragraph with <b>bold</b> and <i>italics</i>.</p>
        |  <p>Second
        |     paragraph spans lines.</p>
        |  <div><span>inline</span> <a href="x?a=1&amp;b=2">link</a></div>
        |  <noscript><p>js off</p></noscript>
        |</body>
        |</html>
        |""".stripMargin
    val t = Html.text(b(page)).get
    assert(t.title.contains("The Title & More"), s"${t.title}")
    assert(t.text ==
      "Heading One\nFirst paragraph with bold and italics.\n" +
        "Second paragraph spans lines.\ninline link", s"[${t.text}]")
    assert(t.refused == 0)
  }

  test("script content with a '</div>' string inside never leaks; attr '>' safe") {
    val page = "<html><body><p data-x=\"a > b\">kept</p>" +
      "<script>if (a<b) s = \"</div>leak\";</script><p>after</p></body></html>"
    val t = Html.text(b(page)).get
    assert(t.text == "kept\nafter", s"[${t.text}]")
  }

  test("entities: numeric dec/hex, XML core, nbsp; unknown named stays literal AND counts") {
    val page = "<html><body><p>&amp; &lt;x&gt; &#65;&#x42; a&nbsp;b " +
      "&eacute; &#xD800; &notAnEntity</p></body></html>"
    val t = Html.text(b(page)).get
    // &eacute; is outside the transcription-free core -> literal + counted;
    // the surrogate numeric drops + counts; '&notAnEntity' (no semicolon)
    // is plain text
    assert(t.text == "& <x> AB a b &eacute; &notAnEntity", s"[${t.text}]")
    assert(t.refused == 2, s"${t.refused}")
  }

  test("tables and lists: cells space-separated, rows/items line-broken") {
    val page = "<html><body><ul><li>one</li><li>two</li></ul>" +
      "<table><tr><td>a1</td><td>a2</td></tr>" +
      "<tr><th>b1</th><th>b2</th></tr></table></body></html>"
    val t = Html.text(b(page)).get
    assert(t.text == "one\ntwo\na1 a2\nb1 b2", s"[${t.text}]")
  }

  test("meta charset windows-1252: high bytes decode through the JDK charset") {
    val page = "<html><head><meta charset=\"windows-1252\"></head>" +
      "<body><p>café — naïve</p></body></html>"
    val bytes = page.getBytes("windows-1252")
    val t = Html.text(bytes).get
    assert(t.text == "café — naïve", s"[${t.text}]")
    // same bytes WITHOUT the declaration: cp1252 high bytes are
    // malformed UTF-8 -> U+FFFD replacement, never a silent cp1252 guess
    val undeclared = "<html><body><p>café</p></body></html>"
      .getBytes("windows-1252")
    assert(Html.text(undeclared).get.text != "café")
  }

  test("http-equiv content-type form and quote variants sniff too") {
    val page = "<html><head><meta http-equiv=\"Content-Type\" " +
      "content=\"text/html; charset=ISO-8859-1\"></head>" +
      "<body><p>über</p></body></html>"
    assert(Html.text(page.getBytes("ISO-8859-1")).get.text == "über")
    // a 'charset=' in VISIBLE TEXT is not a declaration
    val trick = "<html><body><p>set charset=UTF-16BE in config; begrüßt</p></body></html>"
    assert(Html.text(trick.getBytes("UTF-8")).get.text ==
      "set charset=UTF-16BE in config; begrüßt")
  }

  test("UTF-16 BOMs decode both endians") {
    val page = "<html><body><p>wide σ text</p></body></html>"
    for (cs <- Seq("UTF-16BE", "UTF-16LE")) {
      val bom = if (cs == "UTF-16BE") Array[Byte](0xfe.toByte, 0xff.toByte)
        else Array[Byte](0xff.toByte, 0xfe.toByte)
      val t = Html.text(bom ++ page.getBytes(cs))
      assert(t.exists(_.text == "wide σ text"), s"$cs: $t")
    }
  }

  test("br/hr break lines; CDATA payload is character data; PI and doctype dropped") {
    val page = "<?xml-stylesheet href=\"x\"?><!DOCTYPE html>" +
      "<html><body><p>one<br>two</p><hr><p>three</p>" +
      "<svg><![CDATA[raw < data]]></svg></body></html>"
    val t = Html.text(b(page)).get
    assert(t.text == "one\ntwo\nthree\nraw < data", s"[${t.text}]")
  }

  test("review pins: self-closed title/script never swallow; utf-16 meta label = UTF-8") {
    // XHTML (the epub route) legally self-closes empty elements: a
    // <title/> or <script/> that opened a raw-text span would swallow
    // the whole rest of the document
    val t1 = Html.text(b("<html><head><title/></head><body>" +
      "<p>chapter text</p></body></html>")).get
    assert(t1.text == "chapter text" && t1.title.isEmpty, s"$t1")
    val t2 = Html.text(b("<html><body><script/><p>still here</p>" +
      "</body></html>")).get
    assert(t2.text == "still here", s"$t2")
    // WHATWG: a meta-declared UTF-16 label on what must be an
    // ASCII-compatible stream maps to UTF-8 — honoring it would
    // mojibake the page with refused = 0
    val t3 = Html.text(("<html><head><meta charset=\"utf-16\"></head>" +
      "<body><p>not mojibake</p></body></html>").getBytes("UTF-8")).get
    assert(t3.text == "not mojibake", s"$t3")
  }

  test("non-HTML payloads return None; html fragment with <html> sniffs") {
    assert(Html.text(b("just plain text, no tags")) == None)
    assert(Html.text(b("{\"json\": true}")) == None)
    assert(Html.text(null) == None)
    assert(Html.text(b("<HTML><Body><p>CAPS TAGS</p></Body></HTML>"))
      .get.text == "CAPS TAGS")
  }

  test("empty body still returns a row (census counts the page), title captured") {
    val t = Html.text(b("<html><head><title>only title</title></head>" +
      "<body></body></html>")).get
    assert(t.title.contains("only title") && t.text == "")
  }

  test("unterminated comment/script/tag truncate gracefully") {
    assert(Html.text(b("<html><p>seen</p><!-- never closed")).get
      .text == "seen")
    assert(Html.text(b("<html><p>seen</p><script>var x=1;")).get
      .text == "seen")
    assert(Html.text(b("<html><p>seen</p><div attr=\"unclosed")).get
      .text == "seen")
  }

  test("head metadata: description/author/og/canonical/year, all hand-derived") {
    val page = ("<html><head><title>T</title>" +
      "<meta name=\"Description\" content=\"A &amp; B  desc\">" +
      "<meta name=\"author\" content='Quoted Author'>" +
      "<meta property=\"og:title\" content=\"OG Title\">" +
      "<meta property=\"article:published_time\" " +
      "content=\"2019-11-02T03:04:05Z\">" +
      "<link href=\"https://ex.org/canon\" rel=\"canonical\">" +
      "</head><body><p>b</p></body></html>").getBytes("UTF-8")
    val m = Html.meta(page).get
    // attribute entities decode; whitespace collapses; attr order in
    // <link> must not matter; case-insensitive name= lookup
    assert(m == Html.HtmlMeta(Some("A & B desc"), Some("Quoted Author"),
      Some("https://ex.org/canon"), Some(2019), Some("OG Title")), s"$m")
  }

  test("meta edge cases: '>' inside content, meta in script never reads, unquoted value") {
    val page = ("<html><head>" +
      "<meta name=\"description\" content=\"x > y still desc\">" +
      "<script>var s = '<meta name=\"author\" content=\"fake\">';" +
      "</script>" +
      "<meta name=author content=barewood>" +
      "</head><body></body></html>").getBytes("UTF-8")
    val m = Html.meta(page).get
    assert(m.description.contains("x > y still desc"), s"$m")
    // the script-quoted meta is raw-text content, never metadata
    assert(m.author.contains("barewood"), s"$m")
    assert(m.canonical == None && m.publishedYear == None)
    // meta-less page: the all-None row, not a miss
    val bare = Html.meta(
      "<html><body><p>no head</p></body></html>".getBytes("UTF-8")).get
    assert(bare == Html.HtmlMeta(None, None, None, None, None))
    // non-HTML: no row at all
    assert(Html.meta("just words".getBytes("UTF-8")) == None)
  }

  test("review pins: unquoted URLs keep their slashes; name= inside a value never misattributes; CDATA meta ignored") {
    // WHATWG-legal unquoted href: '/' is ordinary value text — the
    // old scan truncated at it, extracting just the scheme
    val m1 = Html.meta(("<html><head>" +
      "<link rel=canonical href=https://ex.org/a/b>" +
      "</head><body></body></html>").getBytes("UTF-8")).get
    assert(m1.canonical.contains("https://ex.org/a/b"), s"$m1")
    // a ' name=description' INSIDE another attribute's quoted value
    // must not shadow the real property= attribute
    val m2 = Html.meta(("<html><head>" +
      "<meta content=\"try name=description here\" property=\"og:title\">" +
      "</head><body></body></html>").getBytes("UTF-8")).get
    assert(m2.ogTitle.contains("try name=description here") &&
      m2.description == None, s"$m2")
    // a meta inside CDATA is character data, never metadata (the
    // text() walk already treats it so — the walks must agree)
    val m3 = Html.meta(("<html><body><svg><![CDATA[" +
      "<meta name=\"description\" content=\"phantom\">]]></svg>" +
      "</body></html>").getBytes("UTF-8")).get
    assert(m3.description == None, s"$m3")
  }

  test("hostile totality: junk, truncations, bit flips never throw") {
    val base = b("<!DOCTYPE html><html><head><meta charset=utf-8>" +
      "<title>t</title></head><body><p>a&amp;b</p><table><tr><td>c" +
      "</td></tr></table><script>s</script></body></html>")
    val r = new scala.util.Random(15)
    for (cut <- 1 until base.length by 7) {
      Html.text(base.take(cut)); Html.meta(base.take(cut))
    }
    for (_ <- 0 until 300) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(5))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Html.text(mut); Html.meta(mut)
    }
    Html.text(Array.fill(512)(0xa5.toByte))
    Html.meta(Array.fill(512)(0xa5.toByte))
  }

  test("table explodes one row per HTML doc, non-HTML contributes nothing") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val docs = Seq(
      (1L, b("<html><head><title>T1</title></head><body><p>one</p></body></html>")),
      (2L, b("<html><body><p>x &eacute;</p></body></html>")),
      (3L, b("not html at all"))).toDF("doc_id", "media")
    val rows = Html.table(spark, docs).orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getLong(0) == 1L && rows(0).getString(1) == "T1" &&
      rows(0).getString(2) == "one" && rows(0).getLong(3) == 0L)
    assert(rows(1).getLong(0) == 2L && rows(1).isNullAt(1) &&
      rows(1).getString(2) == "x &eacute;" && rows(1).getLong(3) == 1L)
  }
}
