package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction: encoder round trips through every variant
  * knob, a HAND-AUTHORED raw PDF (independent of the fixture writer),
  * encoding boundaries, and hostile totality.
  */
class PdfSpec extends AnyFunSuite {

  test("hand-authored raw PDF extracts its text (writer-independent pin)") {
    // a complete minimal PDF written out longhand — nothing here went
    // through Pdf.encode, so reader bugs can't cancel writer bugs
    val raw =
      """%PDF-1.4
        |1 0 obj
        |<< /Type /Catalog /Pages 2 0 R >>
        |endobj
        |2 0 obj
        |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
        |endobj
        |3 0 obj
        |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
        |   /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
        |endobj
        |4 0 obj
        |<< /Length 60 >>
        |stream
        |BT /F1 12 Tf 72 720 Td (Hello World) Tj 0 -14 Td (Line 2) Tj ET
        |endstream
        |endobj
        |5 0 obj
        |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
        |endobj
        |trailer
        |<< /Size 6 /Root 1 0 R >>
        |%%EOF
        |""".stripMargin.getBytes("ISO-8859-1")
    val t = Pdf.text(raw).get
    assert(t.pages == Vector("Hello World\nLine 2"), s"$t")
    assert(t.refused == 0)
  }

  test("encoder round trip: multi-page, flate and plain, escapes") {
    for (flate <- Seq(false, true)) {
      val pages = Seq(
        Seq("First page line one", "and (escaped) \\ line"),
        Seq("Second page"))
      val b = Pdf.encode(pages, flate = flate)
      assert(Pdf.isPdf(b))
      val t = Pdf.text(b).get
      assert(t.pages == Vector(
        "First page line one\nand (escaped) \\ line",
        "Second page"), s"flate=$flate: $t")
      assert(t.refused == 0)
    }
  }

  test("TJ kerning gap reinserts exactly one space") {
    val b = Pdf.encode(Seq(Seq("alpha beta", "gamma delta")),
      kerning = true)
    assert(Pdf.text(b).get.pages == Vector("alpha beta\ngamma delta"))
  }

  test("WinAnsiEncoding: cp1252 high bytes decode without a table") {
    val b = Pdf.encode(Seq(Seq("café naïve — dash")), winAnsi = true)
    val t = Pdf.text(b).get
    // the em dash U+2014 is cp1252 0x97 — only reachable via the
    // JDK charset, never the ASCII fallback
    assert(t.pages == Vector("café naïve — dash"), s"$t")
    assert(t.refused == 0)
    // WITHOUT the encoding the high bytes refuse into the counter
    // (never a mojibake guess)
    val plain = Pdf.encode(Seq(Seq("café")), winAnsi = false)
    val tp = Pdf.text(plain).get
    assert(tp.pages == Vector("caf") && tp.refused == 1, s"$tp")
  }

  test("ToUnicode CMap overrides the byte interpretation (A..Z -> a..z)") {
    val b = Pdf.encode(Seq(Seq("MIXED Case 42")), toUnicodeShift = true)
    // uppercase letters travel through the bfrange; everything else
    // (lowercase, digits, space) passes as ASCII
    assert(Pdf.text(b).get.pages == Vector("mixed case 42"))
  }

  test("Type0/Identity-H: two-byte codes through a bfrange CMap") {
    val b = Pdf.encode(Seq(Seq("composite text", "two byte")),
      type0 = true)
    assert(Pdf.text(b).get.pages == Vector("composite text\ntwo byte"))
  }

  test("object-stream PDFs (1.5 compressed layout) extract identically") {
    val pages = Seq(Seq("packed objects", "second line"), Seq("page two"))
    val a = Pdf.text(Pdf.encode(pages)).get
    val o = Pdf.text(Pdf.encode(pages, objStm = true)).get
    assert(a == o, s"$a vs $o")
    assert(o.pages.length == 2 && o.pages(0).startsWith("packed"))
  }

  test("unimplemented filters refuse into the fidelity counter, never guess") {
    // patch a content stream's filter name to LZWDecode: the page goes
    // dark but the document still parses and COUNTS the loss
    val b = Pdf.encode(Seq(Seq("will vanish")), flate = true)
    val s = new String(b, "ISO-8859-1")
      .replace("/FlateDecode", "/LZWDecode33") // same length: offsets hold
    val t = Pdf.text(s.getBytes("ISO-8859-1")).get
    assert(t.pages == Vector("") && t.refused >= 1, s"$t")
  }

  test("document /Info provenance: trailer ref, UTF-16 strings, xref-stream ref") {
    val a = Pdf.encode(Seq(Seq("x")), title = "The Title",
      author = "An Author", infoYear = 1997)
    assert(Pdf.docInfo(a).contains(Pdf.DocInfo(Some("The Title"),
      Some("An Author"), Some(1997))))
    // UTF-16BE-with-BOM strings carry non-latin text losslessly
    val u = Pdf.encode(Seq(Seq("x")), title = "Grüße 标题",
      utf16Info = true, infoYear = 2008)
    val du = Pdf.docInfo(u).get
    assert(du.title.contains("Grüße 标题") && du.year.contains(2008), s"$du")
    // the PDF-1.5 layout: /Info riding the xref STREAM dict, the
    // Info object itself packed inside the ObjStm
    val o = Pdf.encode(Seq(Seq("x")), objStm = true, title = "Packed",
      infoYear = 2015)
    assert(Pdf.docInfo(o).contains(Pdf.DocInfo(Some("Packed"), None,
      Some(2015))), s"${Pdf.docInfo(o)}")
    // no Info dict -> no row; text extraction unaffected either way
    assert(Pdf.docInfo(Pdf.encode(Seq(Seq("x")))) == None)
    assert(Pdf.text(a).get.pages == Vector("x"))
    // non-ASCII PDFDocEncoding bytes (no BOM) are dropped, not guessed
    val raw = Pdf.encode(Seq(Seq("x")), title = "café", utf16Info = false)
    assert(Pdf.docInfo(raw).get.title.contains("caf"))
  }

  test("review pins: brace DoS, array DecodeParms, bad name hex, Tm baseline, split Contents, ObjStm override") {
    // 1. a '{' inside an array must consume, not spin value() forever
    val brace = ("%PDF-1.4\n1 0 obj\n[ { ] \nendobj\n" +
      "trailer\n<< /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    assert(Pdf.text(brace) == None) // returns (quickly), no hang

    // 2. /DecodeParms in ARRAY form must still refuse predictors
    def onePage(contentObj: String): Array[Byte] =
      ("""%PDF-1.4
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
        |3 0 obj << /Type /Page /Parent 2 0 R
        |  /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj
        |""".stripMargin + contentObj + """
        |5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
        |trailer << /Root 1 0 R >>
        |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    // (r15: predictors now DECODE — garbage under the filter still
    // refuses into the counter, array-form parms exercised in the
    // LZW/predictor round-trip tests below)
    val pred = onePage(
      "4 0 obj << /Length 8 /Filter [/FlateDecode] " +
        "/DecodeParms [<< /Predictor 12 /Columns 4 >>] >>\n" +
        "stream\nXXXXXXXX\nendstream\nendobj")
    val tp = Pdf.text(pred).get
    assert(tp.pages == Vector("") && tp.refused >= 1,
      s"garbage under an array-form predictor filter must refuse: $tp")

    // 3. a malformed name hex escape stays literal, never aborts
    val badName = onePage(
      "4 0 obj << /Length 40 /X#zz (ignored) >>\n" +
        "stream\nBT /F1 12 Tf 72 720 Td (ok) Tj ET\nendstream\nendobj")
    assert(Pdf.text(badName).get.pages == Vector("ok"))

    // 4. Tm on the SAME baseline joins; a vertical Tm move breaks
    val tm = onePage(
      "4 0 obj << /Length 96 >>\nstream\n" +
        "BT /F1 12 Tf 1 0 0 1 72 700 Tm (Hello) Tj " +
        "1 0 0 1 150 700 Tm ( World) Tj " +
        "1 0 0 1 72 686 Tm (Next) Tj ET\nendstream\nendobj")
    assert(Pdf.text(tm).get.pages == Vector("Hello World\nNext"),
      s"${Pdf.text(tm).get}")

    // 5. split /Contents: the token boundary gets an injected
    // whitespace so "Tj" + "0" never merges into an unknown operator
    val split =
      ("""%PDF-1.4
        |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
        |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
        |3 0 obj << /Type /Page /Parent 2 0 R
        |  /Resources << /Font << /F1 7 0 R >> >>
        |  /Contents [4 0 R 6 0 R] >> endobj
        |4 0 obj << /Length 34 >>
        |stream
        |BT /F1 12 Tf 72 720 Td (hello) Tj
        |endstream
        |endobj
        |6 0 obj << /Length 23 >>
        |stream
        |0 -14 Td (world) Tj ET
        |endstream
        |endobj
        |7 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj
        |trailer << /Root 1 0 R >>
        |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    assert(Pdf.text(split).get.pages == Vector("hello\nworld"))

    // 6. an object packed into a LATER incremental-update ObjStm
    // overrides the original top-level definition (later-wins by file
    // offset, not just top-level-vs-top-level)
    val base = Pdf.encode(Seq(Seq("old text")), flate = false)
    val newPage = "3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 9 0 R >>"
    val inner = newPage.replaceFirst("^3 0 obj ", "")
    val hdr = s"3 0 "
    val stmData = hdr + inner
    val update =
      (s"""9 0 obj << /Length 46 >>
         |stream
         |BT /F1 12 Tf 72 720 Td (updated text) Tj ET
         |endstream
         |endobj
         |10 0 obj << /Type /ObjStm /N 1 /First ${hdr.length} /Length ${stmData.length} >>
         |stream
         |$stmData
         |endstream
         |endobj
         |%%EOF""".stripMargin).getBytes("ISO-8859-1")
    val updated = base ++ update
    assert(Pdf.text(updated).get.pages == Vector("updated text"),
      s"${Pdf.text(updated).get}")
  }

  test("LZW: the ISO 32000 worked example decodes (writer-independent pin)") {
    // spec 7.4.4.2, Example 2: input (hex) 45 45 45 45 45 65 45 45 45
    // 66 encodes as codes 256, 0x45, 258, 258, 0x65, 259, 0x66, 257 —
    // hand-packed here at 9 bits MSB-first by an independent
    // test-side packer
    val codes = Seq(256, 0x45, 258, 258, 0x65, 259, 0x66, 257)
    val out = new java.io.ByteArrayOutputStream()
    var buf = 0L
    var cnt = 0
    codes.foreach { c =>
      buf = (buf << 9) | c; cnt += 9
      while (cnt >= 8) { out.write(((buf >> (cnt - 8)) & 0xff).toInt); cnt -= 8 }
    }
    if (cnt > 0) out.write(((buf << (8 - cnt)) & 0xff).toInt)
    val got = Pdf.lzwDecode(out.toByteArray, earlyChange = true).get
    assert(got.toSeq == Seq[Byte](0x45, 0x45, 0x45, 0x45, 0x45, 0x65,
      0x45, 0x45, 0x45, 0x66), got.toSeq.toString)
  }

  test("LZW round trip: width growth past 9 bits, both /EarlyChange settings") {
    // enough distinct lines that the dictionary crosses 511 entries
    // (the 9->10-bit boundary, where EarlyChange desync would garble)
    val pages = Seq((0 until 60).map(l =>
      s"lzw line $l with some repeating repeating text $l"))
    for (early <- Seq(true, false)) {
      val b = Pdf.encode(pages, lzw = true, earlyChange = early)
      assert(new String(b, "ISO-8859-1").contains("/LZWDecode"))
      if (!early)
        assert(new String(b, "ISO-8859-1").contains("/EarlyChange 0"))
      val t = Pdf.text(b).get
      assert(t.pages == Vector(pages.head.mkString("\n")),
        s"early=$early: $t")
      assert(t.refused == 0)
    }
  }

  test("predictors: PNG rows (Up/Paeth) and TIFF differencing round trip") {
    val pages = Seq(Seq("predictor page", "second line of it"))
    for ((pred, lzw) <- Seq((12, false), (14, false), (2, false),
        (12, true), (2, true))) {
      val b = Pdf.encode(pages, lzw = lzw, predictor = pred,
        predictorColumns = 11)
      val t = Pdf.text(b).get
      assert(t.pages == Vector("predictor page\nsecond line of it"),
        s"pred=$pred lzw=$lzw: $t")
      assert(t.refused == 0)
    }
  }

  test("review pin: predictor geometry whose row size Int-wraps refuses, no OOM") {
    // /Colors 17 /BitsPerComponent 16 /Columns 16777216: the true row
    // is ~570 MB but a 32-bit product wraps to a plausible size — the
    // Long-arithmetic guard must refuse (rb+1 > data) instead of
    // reconstructing with shifted rows or allocating GB-scale scratch
    val z = {
      val df = new java.util.zip.Deflater()
      df.setInput(Array.fill(64)('X'.toByte)); df.finish()
      val o = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](256)
      while (!df.finished()) o.write(buf, 0, df.deflate(buf))
      df.end(); o.toByteArray
    }
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${z.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 10 /Colors 17 /BitsPerComponent 16 " +
      "/Columns 16777216 >> >>\nstream\n").getBytes("ISO-8859-1") ++ z ++
      ("\nendstream\nendobj\n" +
        "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n" +
        "trailer << /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    val t = Pdf.text(pdf).get
    assert(t.pages == Vector("") && t.refused >= 1, s"$t")
  }

  test("TIFF predictor hand golden: test-side differencing, reader-side undo") {
    // the content stream differenced COLUMN-WISE by the test itself
    // (not Pdf.encode) over 8-byte rows, then raw (no compression is
    // not legal for predictors — so flate via the JDK, which this
    // test trusts both ways)
    val content = "BT /F1 12 Tf (hand) Tj ET" // 25 bytes -> pad to 32
    val raw = (content + " " * 7).getBytes("ISO-8859-1")
    val cols = 8
    val diff = raw.clone()
    for (r <- raw.indices by cols; x <- (cols - 1) until 0 by -1)
      diff(r + x) = ((raw(r + x) - raw(r + x - 1)) & 0xff).toByte
    val df = new java.util.zip.Deflater()
    df.setInput(diff); df.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val zBuf = new Array[Byte](256)
    while (!df.finished()) zOut.write(zBuf, 0, df.deflate(zBuf))
    df.end()
    val z = zOut.toByteArray
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R " +
      "/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${z.length} /Filter /FlateDecode " +
      "/DecodeParms << /Predictor 2 /Colors 1 /BitsPerComponent 8 " +
      "/Columns 8 >> >>\nstream\n").getBytes("ISO-8859-1") ++ z ++
      ("\nendstream\nendobj\n" +
        "5 0 obj << /Type /Font /Subtype /Type1 /BaseFont /Helvetica >> endobj\n" +
        "trailer << /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    assert(Pdf.text(pdf).get.pages == Vector("hand"))
  }

  test("cyclic /Kids terminates: self-referencing Pages is a 60-byte DoS otherwise") {
    // `/Kids [2 0 R 2 0 R 3 0 R]` on object 2: without visited-object
    // tracking the depth cap alone admits ~2^64 recursive calls — the
    // page must extract exactly ONCE and the walk return immediately
    val raw =
      """%PDF-1.4
        |1 0 obj
        |<< /Type /Catalog /Pages 2 0 R >>
        |endobj
        |2 0 obj
        |<< /Type /Pages /Kids [2 0 R 2 0 R 3 0 R] /Count 1 >>
        |endobj
        |3 0 obj
        |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
        |   /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
        |endobj
        |4 0 obj
        |<< /Length 33 >>
        |stream
        |BT /F1 12 Tf (Survived) Tj ET
        |endstream
        |endobj
        |5 0 obj
        |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
        |endobj
        |trailer
        |<< /Size 6 /Root 1 0 R >>
        |%%EOF
        |""".stripMargin.getBytes("ISO-8859-1")
    val t = Pdf.text(raw).get
    assert(t.pages == Vector("Survived"), s"$t")
  }

  test("incremental update: /Root from the LAST trailer beats a stale catalog") {
    // a re-save may write the replacement catalog under a NEW object
    // number, leaving the stale one live in the object scan — picking
    // any /Type/Catalog dict can resurrect the OLD page tree
    val raw =
      """%PDF-1.4
        |1 0 obj
        |<< /Type /Catalog /Pages 2 0 R >>
        |endobj
        |2 0 obj
        |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
        |endobj
        |3 0 obj
        |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
        |   /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
        |endobj
        |4 0 obj
        |<< /Length 33 >>
        |stream
        |BT /F1 12 Tf (OLD TEXT) Tj ET
        |endstream
        |endobj
        |5 0 obj
        |<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>
        |endobj
        |trailer
        |<< /Size 6 /Root 1 0 R >>
        |6 0 obj
        |<< /Type /Catalog /Pages 7 0 R >>
        |endobj
        |7 0 obj
        |<< /Type /Pages /Kids [8 0 R] /Count 1 >>
        |endobj
        |8 0 obj
        |<< /Type /Page /Parent 7 0 R /MediaBox [0 0 612 792]
        |   /Resources << /Font << /F1 5 0 R >> >> /Contents 9 0 R >>
        |endobj
        |9 0 obj
        |<< /Length 33 >>
        |stream
        |BT /F1 12 Tf (NEW TEXT) Tj ET
        |endstream
        |endobj
        |trailer
        |<< /Size 10 /Root 6 0 R /Prev 9 >>
        |%%EOF
        |""".stripMargin.getBytes("ISO-8859-1")
    val t = Pdf.text(raw).get
    assert(t.pages == Vector("NEW TEXT"), s"stale catalog won: $t")
    // a trailer-less damaged file still falls back to the catalog scan
    val noTrailer = new String(raw, "ISO-8859-1")
      .replace("trailer", "%railer").getBytes("ISO-8859-1")
    assert(Pdf.text(noTrailer).isDefined, "catalog-scan fallback lost")
  }

  test("hostile bfrange flood is budgeted: 17 full-width ranges don't OOM/lock") {
    // 17 x <0000>..<ffff> = 1,114,112 insertions requested > the 2^20
    // budget — must complete promptly with the budget's prefix mapped
    val flood = (1 to 17).map(_ =>
      "1 beginbfrange\n<0000> <ffff> <0041>\nendbfrange\n").mkString
    val cmap = "/CIDInit /ProcSet findresource begin 1 begincmap\n" +
      flood + "endcmap end\n"
    val body =
      s"""1 0 obj
        |<< /Type /Catalog /Pages 2 0 R >>
        |endobj
        |2 0 obj
        |<< /Type /Pages /Kids [3 0 R] /Count 1 >>
        |endobj
        |3 0 obj
        |<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792]
        |   /Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>
        |endobj
        |4 0 obj
        |<< /Length 35 >>
        |stream
        |BT /F1 12 Tf <00070008> Tj ET
        |endstream
        |endobj
        |5 0 obj
        |<< /Type /Font /Subtype /Type0 /BaseFont /X
        |   /Encoding /Identity-H /ToUnicode 6 0 R >>
        |endobj
        |6 0 obj
        |<< /Length ${cmap.length} >>
        |stream
        |$cmap
        |endstream
        |endobj
        |trailer
        |<< /Size 7 /Root 1 0 R >>
        |%%EOF
        |""".stripMargin
    val raw = ("%PDF-1.4\n" + body).getBytes("ISO-8859-1")
    val t = Pdf.text(raw).get
    // codes 0x0007/0x0008 sit inside the budgeted prefix of range 1
    // (dst base <0041>: code k maps to 'A' + k) -> "HI"
    assert(t.pages == Vector("HI"), s"$t")
  }

  test("hostile totality: junk, truncations, bit flips never throw") {
    assert(Pdf.text("not a pdf at all".getBytes("UTF-8")) == None)
    assert(Pdf.text(Array.emptyByteArray) == None)
    val b = Pdf.encode(Seq(Seq("target text", "more")), flate = true)
    val r = new scala.util.Random(47)
    for (_ <- 0 until 300) {
      val m = b.clone()
      m(r.nextInt(m.length)) = r.nextInt(256).toByte
      Pdf.text(m) // must not throw
    }
    for (len <- Seq(4, 9, 40, b.length / 2, b.length - 3))
      Pdf.text(java.util.Arrays.copyOf(b, len))
    // a pdf header with garbage body
    assert(Pdf.text(("%PDF-1.7\n" + "garbage " * 50).getBytes("UTF-8"))
      == None)
    // hostile deep nesting: thousands of '[' would StackOverflow PAST
    // the NonFatal catch without the lexer's depth cap
    val deep = ("%PDF-1.4\n1 0 obj\n" + "[" * 50000 +
      "\nendobj\ntrailer << /Root 1 0 R >>\n%%EOF").getBytes("ISO-8859-1")
    assert(Pdf.text(deep) == None)
    val deepDict = ("%PDF-1.4\n1 0 obj\n" + "<<" * 50000 +
      "\nendobj\n%%EOF").getBytes("ISO-8859-1")
    assert(Pdf.text(deepDict) == None)
  }

  test("page rows table shape: per-page rows, refused repeated") {
    // exercised end-to-end by the ext_pdf_text gate; here the pure
    // text() contract on a 3-page doc
    val t = Pdf.text(Pdf.encode(Seq(Seq("a"), Seq("b"), Seq("c")))).get
    assert(t.pages == Vector("a", "b", "c"))
  }
}
