package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** DOCX/EPUB extraction: a JDK-ZipOutputStream golden (a zip writer
  * this repo did NOT write, so reader bugs can't cancel zipWrap
  * bugs), round trips through both fixture writers, spine ordering,
  * provenance, and hostile totality.
  */
class OfficeSpec extends AnyFunSuite {

  test("JDK-written zip + handwritten document.xml extract (writer-independent pin)") {
    val doc = "<?xml version=\"1.0\"?><w:document xmlns:w=\"ns\">" +
      "<w:body><w:p><w:r><w:t>Hand </w:t></w:r><w:r><w:t>golden</w:t>" +
      "</w:r></w:p><w:p><w:r><w:t>Second para &amp; more</w:t></w:r>" +
      "</w:p></w:body></w:document>"
    val core = "<cp:coreProperties xmlns:dc=\"d\"><dc:title>Golden T" +
      "</dc:title><dc:creator>Golden A</dc:creator>" +
      "<dcterms:created>2019-05-06</dcterms:created></cp:coreProperties>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    for ((n, d) <- Seq(("word/document.xml", doc),
        ("docProps/core.xml", core))) {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(d.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    val t = Office.docxText(bos.toByteArray).get
    assert(t.text == "Hand golden\nSecond para & more", s"[${t.text}]")
    assert(t.title.contains("Golden T") && t.author.contains("Golden A") &&
      t.year.contains(2019), s"$t")
    assert(t.refused == 0)
  }

  test("docx round trip: runs concatenate, paragraphs break, provenance") {
    for (stored <- Seq(false, true)) {
      val b = Office.encodeDocx(
        Seq("First paragraph here", "Second one", "Third & last"),
        title = "A Title", author = "An Author", createdYear = 2021,
        stored = stored)
      val t = Office.docxText(b).get
      assert(t.kind == "docx")
      assert(t.text ==
        "First paragraph here\nSecond one\nThird & last",
        s"stored=$stored: [${t.text}]")
      assert(t.title.contains("A Title") &&
        t.author.contains("An Author") && t.year.contains(2021))
      // the dispatcher routes it too
      assert(Office.text(b).map(_.kind).contains("docx"))
    }
  }

  test("epub: spine orders chapters even when zip order is scrambled") {
    val chapters = Seq(
      ("Chapter One", Seq("para one a", "para one b")),
      ("Chapter Two", Seq("para two a")),
      ("Chapter Three", Seq("para three a")))
    for (scramble <- Seq(false, true)) {
      val b = Office.encodeEpub(chapters, title = "Book T",
        author = "Book A", year = 2015, scrambleOrder = scramble)
      val t = Office.epubText(b).get
      assert(t.kind == "epub")
      assert(t.text ==
        "Chapter One\npara one a\npara one b\n" +
          "Chapter Two\npara two a\n" +
          "Chapter Three\npara three a",
        s"scramble=$scramble: [${t.text}]")
      assert(t.title.contains("Book T") && t.author.contains("Book A") &&
        t.year.contains(2015))
    }
  }

  test("epub degraded route: no container.xml falls back to CD order") {
    val b = Office.encodeEpub(Seq(("Solo", Seq("alpha", "beta"))))
    // strip container.xml by rebuilding without it (test-side surgery
    // through the fixture writer's own entries)
    val chapter = ("OEBPS/ch0.xhtml",
      ("<html xmlns=\"x\"><body><h2>Solo</h2><p>alpha</p><p>beta</p>" +
        "</body></html>").getBytes("UTF-8"))
    val noContainer = Office.zipWrap(Seq(
      ("mimetype", "application/epub+zip".getBytes("US-ASCII")),
      chapter))
    val t = Office.epubText(noContainer).get
    assert(t.text == "Solo\nalpha\nbeta", s"[${t.text}]")
    assert(t.title.isEmpty)
    val _ = b
  }

  test("review pins: </w:pict> is not a paragraph break; self-closed <w:t/> swallows nothing") {
    // legacy Word puts VML inside a run: '</w:pict>' must not match
    // the '/w:p' paragraph break, and an empty self-closed run must
    // not open a span to the NEXT run's close tag (raw markup would
    // land in corpus text)
    val doc = "<w:document><w:body><w:p>" +
      "<w:r><w:t>before </w:t></w:r>" +
      "<w:pict><v:shape/></w:pict>" +
      "<w:r><w:t xml:space=\"preserve\"/></w:r>" +
      "<w:r><w:t>after</w:t></w:r>" +
      "</w:p></w:body></w:document>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
    z.write(doc.getBytes("UTF-8"))
    z.closeEntry(); z.close()
    val t = Office.docxText(bos.toByteArray).get
    assert(t.text == "before after", s"[${t.text}]")
  }

  test("JDK-written zip + handwritten content.xml: the ODT walk (writer-independent pin)") {
    // pretty-printed content.xml: the inter-element whitespace is
    // layout (ODF collapse rule), the annotation subtree is a
    // reviewer comment and never corpus text, text:s is an EXPLICIT
    // three-space run that must survive verbatim
    val content =
      """<?xml version="1.0"?>
        |<office:document-content xmlns:office="o" xmlns:text="t">
        |  <office:body>
        |    <office:text>
        |      <text:h text:outline-level="1">Head &amp; One</text:h>
        |      <text:p>alpha <text:span text:style-name="T1">beta</text:span> gamma</text:p>
        |      <text:p>tabs<text:tab/>here<text:line-break/>wide<text:s text:c="3"/>gap</text:p>
        |      <office:annotation><dc:creator>rev</dc:creator><text:p>never in corpus</text:p></office:annotation>
        |      <text:p>last one</text:p>
        |    </office:text>
        |  </office:body>
        |</office:document-content>
        |""".stripMargin
    val meta = "<office:document-meta><office:meta><dc:title>Odt T" +
      "</dc:title><dc:creator>Odt A</dc:creator><meta:creation-date>" +
      "2018-07-08T00:00:00</meta:creation-date></office:meta>" +
      "</office:document-meta>"
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    for ((n, d) <- Seq(
        ("mimetype", "application/vnd.oasis.opendocument.text"),
        ("content.xml", content), ("meta.xml", meta))) {
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(d.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    val t = Office.odtText(bos.toByteArray).get
    assert(t.text == "Head & One\nalpha beta gamma\ntabs here\n" +
      "wide   gap\nlast one", s"[${t.text}]")
    assert(t.title.contains("Odt T") && t.author.contains("Odt A") &&
      t.year.contains(2018), s"$t")
    assert(t.refused == 0)
  }

  test("odt round trip: spans join, paragraphs break, provenance, dispatcher") {
    for (stored <- Seq(false, true)) {
      val b = Office.encodeOdt(
        Seq("First paragraph here", "Second & more"),
        title = "O Title", author = "O Author", createdYear = 2022,
        stored = stored)
      val t = Office.odtText(b).get
      assert(t.kind == "odt")
      assert(t.text == "First paragraph here\nSecond & more",
        s"stored=$stored: [${t.text}]")
      assert(t.title.contains("O Title") &&
        t.author.contains("O Author") && t.year.contains(2022))
      assert(Office.text(b).map(_.kind).contains("odt"))
    }
  }

  test("a zip with content.xml but no OpenDocument mimetype is not an ODT") {
    val b = Office.zipWrap(Seq(("content.xml",
      ("<office:document-content><office:body><office:text>" +
        "<text:p>unbranded</text:p></office:text></office:body>" +
        "</office:document-content>").getBytes("UTF-8"))))
    assert(Office.text(b) == None)
  }

  test("a plain zip is NOT a document; a docx-less epub-less zip returns None") {
    val plain = Office.zipWrap(Seq(
      ("a.txt", "hello".getBytes("UTF-8")),
      ("dir/b.bin", Array.tabulate(64)(_.toByte))))
    assert(Office.text(plain) == None)
    assert(Office.text("not a zip".getBytes("UTF-8")) == None)
    assert(Office.text(null) == None)
  }

  test("zip comment does not hide the EOCD; stored entries read verbatim") {
    val b = Office.zipWrap(Seq(("word/document.xml",
      ("<w:document><w:body><w:p><w:r><w:t>commented</w:t></w:r>" +
        "</w:p></w:body></w:document>").getBytes("UTF-8"))),
      stored = true, comment = "trailing zip comment text")
    assert(Office.docxText(b).get.text == "commented")
  }

  test("plain zip: members list, doc dispatch, container census — documents excluded") {
    val zip = Office.zipWrap(Seq(
      ("a.html", "<html><body><p>member text</p></body></html>"
        .getBytes("UTF-8")),
      ("b.bin", Array.tabulate(32)(_.toByte)),
      ("c.docx", Office.encodeDocx(Seq("nested docx")))))
    val ms = Office.zipMembers(zip).get
    assert(ms.map(_._1) == Seq("a.html", "b.bin", "c.docx"), s"$ms")
    // a zip-BRANDED document is not an archive: members refuse
    assert(Office.zipMembers(Office.encodeDocx(Seq("doc"))) == None)
    assert(Office.zipMembers("not zip".getBytes("UTF-8")) == None)
    // census: the plain zip is a counted container class [members,
    // docMembers] — the r15 tar precedent (an archive is not a
    // document, but no longer an opaque byte blob either)
    val f = Multimodal.ContainerCodec
      .decode(Seq(Multimodal.MediaRow(1L, zip, "application/zip", 0, 0)))
      .head
    assert(f.format == "application/zip" && f.kind == "container", s"$f")
    assert(f.feature.take(2).toSeq == Seq(3f, 2f), s"${f.feature.toSeq}")
  }

  test("zipDocTable: rows per recognized member, nested docx extracts") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val zip = Office.zipWrap(Seq(
      ("p.html", "<html><body><p>zip html</p></body></html>"
        .getBytes("UTF-8")),
      ("skip.bin", Array.tabulate(16)(_.toByte)),
      ("d.docx", Office.encodeDocx(Seq("zip docx")))))
    val rows = Office.zipDocTable(spark, Seq(
        (5L, zip), (6L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media"))
      .as[(Long, Int, String, String, Long)].collect().toSeq.sorted
    assert(rows == Seq(
      (5L, 0, "p.html", "zip html", 0L),
      (5L, 2, "d.docx", "zip docx", 0L)), s"$rows")
  }

  test("hostile totality: junk, truncations, bit flips never throw") {
    val base = Office.encodeDocx(Seq("fuzz paragraph", "two"),
      title = "t", author = "a", createdYear = 2000)
    val epub = Office.encodeEpub(Seq(("C", Seq("p1", "p2"))),
      title = "t", year = 2001)
    val odt = Office.encodeOdt(Seq("fuzz odt", "two"),
      title = "t", author = "a", createdYear = 2002)
    val r = new scala.util.Random(31)
    for (f <- Seq(base, epub, odt)) {
      for (cut <- 1 until f.length by 13) Office.text(f.take(cut))
      for (_ <- 0 until 200) {
        val mut = f.clone()
        for (_ <- 0 to r.nextInt(5))
          mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
        Office.text(mut)
      }
    }
    Office.text(Array.fill(128)('P'.toByte))
  }

  test("table explodes one row per document, non-documents contribute nothing") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val docs = Seq(
      (1L, Office.encodeDocx(Seq("docx body"), title = "D1")),
      (2L, Office.encodeEpub(Seq(("Ch", Seq("epub body"))),
        title = "E2", year = 2010)),
      (3L, "not zip".getBytes("UTF-8"))).toDF("doc_id", "media")
    val rows = Office.table(spark, docs).orderBy("doc_id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "docx" &&
      rows(0).getString(2) == "D1" && rows(0).getString(5) == "docx body")
    assert(rows(1).getString(1) == "epub" &&
      rows(1).getString(2) == "E2" && rows(1).getInt(4) == 2010 &&
      rows(1).getString(5) == "Ch\nepub body")
  }
}
