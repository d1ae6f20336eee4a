package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Generic XML extraction: hand-authored goldens (no fixture writer
  * exists), declared encodings, entity boundary, CDATA, totality.
  */
class XmlSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("UTF-8")

  test("DocBook-ish document: structure to lines, comments/PI/doctype dropped") {
    val raw = """<?xml version="1.0" encoding="UTF-8"?>
      |<!DOCTYPE article PUBLIC "-//OASIS//DTD DocBook//EN" "x.dtd">
      |<article>
      |  <title>The Title</title>
      |  <!-- editorial note dropped -->
      |  <?pi dropped too?>
      |  <para>First paragraph   with
      |     folded whitespace.</para>
      |  <para>Second one.</para>
      |</article>
      |""".stripMargin
    val t = Xml.text(b(raw)).get
    assert(t.root == "article")
    assert(t.text == "The Title\nFirst paragraph with folded whitespace.\nSecond one.",
      s"[${t.text}]")
    assert(t.refused == 0)
  }

  test("entities: core five + numeric decode, DTD-defined stays literal and counts") {
    val raw = "<?xml version=\"1.0\"?><r><p>&amp; &lt;x&gt; &#65;&#x42; " +
      "&mdash; &custom;</p></r>"
    val t = Xml.text(b(raw)).get
    assert(t.text == "& <x> AB &mdash; &custom;", s"[${t.text}]")
    assert(t.refused == 2)
  }

  test("declared encoding decodes through the JDK; CDATA payload is character data") {
    val latin = "<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?>" +
      "<d><t>café touché</t></d>"
    assert(Xml.text(latin.getBytes("ISO-8859-1")).get.text ==
      "café touché")
    val cdata = "<?xml version=\"1.0\"?><d><c><![CDATA[raw < & data]]></c></d>"
    assert(Xml.text(b(cdata)).get.text == "raw < & data")
  }

  test("attribute '>' safe; self-closed breaks; XHTML routes to Html not Xml in census") {
    val raw = "<?xml version=\"1.0\"?><d a=\"x > y\"><p>kept</p>" +
      "<br/><p>after</p></d>"
    assert(Xml.text(b(raw)).get.text == "kept\nafter")
    // an XHTML payload (xml declaration + <html>) classifies text/html
    val xhtml = ("<?xml version=\"1.0\"?><html xmlns=\"h\"><body>" +
      "<p>xhtml text</p></body></html>").getBytes("UTF-8")
    val f = Multimodal.ContainerCodec.decode(
      Seq(Multimodal.MediaRow(1L, xhtml, "application/xhtml+xml", 0, 0))).head
    assert(f.format == "text/html", s"$f")
  }

  test("non-XML returns None; table shape") {
    assert(Xml.text(b("<html><p>no decl</p></html>")) == None)
    assert(Xml.text(null) == None)
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = Xml.table(spark, Seq(
      (1L, b("<?xml version=\"1.0\"?><tei><x>body text</x></tei>")),
      (2L, b("plain"))).toDF("doc_id", "media")).collect()
    assert(rows.length == 1 && rows(0).getString(1) == "tei" &&
      rows(0).getString(2) == "body text")
  }

  test("hostile totality: junk, truncations, bit flips never throw") {
    val base = b("<?xml version=\"1.0\" encoding=\"utf-8\"?><a>" +
      "<b attr=\"v>alue\">text &amp; more</b><![CDATA[cd]]></a>")
    val r = new scala.util.Random(119)
    for (cut <- 1 until base.length by 3) Xml.text(base.take(cut))
    for (_ <- 0 until 250) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(5))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Xml.text(mut)
    }
    Xml.text(b("<?xml " + "<" * 5000))
  }
}
