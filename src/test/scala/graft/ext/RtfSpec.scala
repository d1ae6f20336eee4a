package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** RTF extraction: hand-authored goldens (the fixture writer is only
  * used for round trips — every golden input here is handwritten and
  * its expected text hand-derived), destination skipping, escapes,
  * unicode fallbacks, provenance, and hostile totality.
  */
class RtfSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("hand-authored RTF: tables skipped, pars break, escapes decode") {
    val raw = "{\\rtf1\\ansi\\ansicpg1252\\deff0" +
      "{\\fonttbl{\\f0\\fswiss Arial;}{\\f1\\fmodern Courier New;}}" +
      "{\\colortbl;\\red255\\green0\\blue0;}" +
      "{\\*\\generator Some Writer 1.0;}" +
      "First line with \\'e9 and an \\emdash{} dash.\\par " +
      "Braces \\{kept\\} and a back\\\\slash.\\line " +
      "Tab\\tab separated.\\par}"
    val t = Rtf.text(b(raw)).get
    assert(t.text ==
      "First line with é and an — dash.\n" +
        "Braces {kept} and a back\\slash.\n" +
        "Tab separated.", s"[${t.text}]")
  }

  test("\\uN unicode with \\uc fallback skipping; surrogate pair recombines") {
    // \uc1 (default): each \uN is followed by one fallback char to skip
    // astral U+1D4AA as two signed-16-bit decimal \u words:
    // 0xD835 -> -10187, 0xDCAA -> -9046
    val raw = "{\\rtf1\\ansi \\u945?lpha and \\uc2\\u946??eta" +
      " \\uc0\\u-10187\\u-9046  script\\par}"
    val t = Rtf.text(b(raw)).get
    assert(t.text == "αlpha and βeta 𝒪 script"
      .replace("lpha", "lpha"), s"[${t.text}]")
    // check precisely: fallback '?' skipped once, then twice
    assert(t.text.startsWith("α") && t.text.contains("and β"), t.text)
    assert(t.text.contains("𝒪"), "astral char lost")
  }

  test("{\\info}: title, author, creation year; info text never leaks to body") {
    val raw = "{\\rtf1\\ansi{\\info{\\title The Doc Title}" +
      "{\\author Jane Q}{\\creatim\\yr1998\\mo7\\dy4}}" +
      "Body only.\\par}"
    val t = Rtf.text(b(raw)).get
    assert(t.title.contains("The Doc Title") &&
      t.author.contains("Jane Q") && t.year.contains(1998), s"$t")
    assert(t.text == "Body only.", s"[${t.text}]")
  }

  test("\\bin skips raw bytes; pict groups contribute nothing") {
    // 8 raw bytes after \bin8 include '}' and '\' — a walk that does
    // not skip them whole shifts into the pixel data
    val raw = "{\\rtf1\\ansi before " +
      "{\\pict\\wmetafile8\\bin8 }\\{p}}" +
      " after\\par}"
    val t = Rtf.text(b(raw)).get
    assert(t.text == "before after", s"[${t.text}]")
  }

  test("round trip through the fixture writer: cp1252 and unicode, provenance") {
    val paras = Seq("First paragraph — with dash", "Zwöl? ünïcode",
      "plain third")
    val enc = Rtf.encode(paras, title = "T1", author = "A1", year = 2005)
    val t = Rtf.text(enc).get
    assert(t.text == paras.mkString("\n"), s"[${t.text}]")
    assert(t.title.contains("T1") && t.author.contains("A1") &&
      t.year.contains(2005))
    // greek forces the \uN path (not in cp1252)
    val g = Rtf.text(Rtf.encode(Seq("σίγμα plus ascii"))).get
    assert(g.text == "σίγμα plus ascii", s"[${g.text}]")
  }

  test("non-RTF returns None; table shape") {
    assert(Rtf.text(b("plain text")) == None)
    assert(Rtf.text(null) == None)
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = Rtf.table(spark, Seq(
      (1L, Rtf.encode(Seq("row body"), title = "RT")),
      (2L, "nope".getBytes("UTF-8"))).toDF("doc_id", "media"))
      .collect()
    assert(rows.length == 1 && rows(0).getString(1) == "RT" &&
      rows(0).getString(4) == "row body")
  }

  test("hostile totality: junk, truncations, bit flips, deep nesting never throw") {
    val base = Rtf.encode(Seq("fuzz — body", "ünïcode σ"), title = "t",
      author = "a", year = 2000)
    val r = new scala.util.Random(63)
    for (cut <- 1 until base.length by 7) Rtf.text(base.take(cut))
    for (_ <- 0 until 250) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(5))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Rtf.text(mut)
    }
    // 100k unmatched opens: the nesting guard must refuse, not OOM/hang
    Rtf.text(b("{\\rtf1" + "{" * 100000))
    Rtf.text(b("{\\rtf1 " + "\\u12345" * 2000 + "}"))
  }
}
