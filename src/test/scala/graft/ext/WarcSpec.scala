package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** WARC extraction: a hand-authored raw record golden (independent of
  * Warc.encode), the .warc.gz member layout, HTTP chunked +
  * content-encoding decode, the crawl→documents pipeline, and
  * hostile totality.
  */
class WarcSpec extends AnyFunSuite {

  private def b(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  test("hand-authored raw WARC extracts records (writer-independent pin)") {
    // written out longhand — CRLF framing, Content-Length, two-CRLF
    // separator; nothing here went through Warc.encode
    val payload = "<html><body><p>hand body</p></body></html>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      s"charset=utf-8\r\nContent-Length: ${payload.length}\r\n\r\n" +
      payload
    val raw = "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "WARC-Date: 2021-03-04T05:06:07Z\r\n" +
      "Content-Length: 9\r\n\r\n" +
      "info body" +
      "\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.org/page\r\n" +
      "WARC-Date: 2022-01-02T03:04:05Z\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n" +
      http +
      "\r\n\r\n"
    val rs = Warc.records(b(raw)).get
    assert(rs.length == 2, s"$rs")
    assert(rs(0).warcType == "warcinfo" && rs(0).year.contains(2021) &&
      new String(rs(0).body, "UTF-8") == "info body")
    val r = rs(1)
    assert(r.warcType == "response" &&
      r.url.contains("http://example.org/page") &&
      r.year.contains(2022) && r.httpStatus.contains(200) &&
      r.mime.contains("text/html") &&
      new String(r.body, "UTF-8") == payload, s"$r")
  }

  test("round trip plain and per-record-gzip (.warc.gz member layout)") {
    val recs = (0 until 3).map { k =>
      ("response", s"http://h/$k", s"201$k-01-01T00:00:00Z",
        Warc.httpBlock(200, "text/html",
          b(s"<html><body><p>doc $k</p></body></html>")))
    }
    for (gz <- Seq(false, true)) {
      val w = Warc.encode(recs, perRecordGzip = gz)
      assert(Warc.isWarc(w), s"gz=$gz")
      val rs = Warc.records(w).get
      assert(rs.length == 3)
      assert(rs.zipWithIndex.forall { case (r, k) =>
        r.httpStatus.contains(200) &&
          new String(r.body, "UTF-8").contains(s"doc $k")
      }, s"gz=$gz: $rs")
    }
  }

  test("chunked transfer-encoding and gzip content-encoding both decode") {
    val payload = b("<html><body><p>enc payload text</p></body></html>")
    for ((ch, gz) <- Seq((true, false), (false, true), (true, true))) {
      val w = Warc.encode(Seq(("response", "http://h/e",
        "2020-01-01T00:00:00Z",
        Warc.httpBlock(200, "text/html", payload, chunked = ch,
          gzipBody = gz))))
      val r = Warc.records(w).get.head
      assert(new String(r.body, "UTF-8").contains("enc payload text"),
        s"ch=$ch gz=$gz: ${new String(r.body, "UTF-8").take(60)}")
    }
  }

  test("docTable: crawl members become clean corpus text; non-2xx and non-docs drop") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val html = Warc.httpBlock(200, "text/html",
      b("<html><head><title>T</title></head><body><p>crawl text</p></body></html>"))
    val notFound = Warc.httpBlock(404, "text/html",
      b("<html><body><p>missing</p></body></html>"))
    val png = Warc.httpBlock(200, "image/png", Array.tabulate(32)(_.toByte))
    val w = Warc.encode(Seq(
      ("warcinfo", "", "2020-01-01T00:00:00Z", b("crawler=x")),
      ("response", "http://h/a", "2020-01-01T00:00:00Z", html),
      ("response", "http://h/b", "2020-01-01T00:00:00Z", notFound),
      ("response", "http://h/c", "2020-01-01T00:00:00Z", png)))
    val rows = Warc.docTable(spark, Seq((7L, w)).toDF("doc_id", "media"))
      .collect()
    assert(rows.length == 1, rows.mkString(";"))
    assert(rows(0).getLong(0) == 7L && rows(0).getInt(1) == 1 &&
      rows(0).getString(2) == "http://h/a" &&
      rows(0).getString(5) == "crawl text")
  }

  test("review pin: truncated HTTP headers keep the RAW block as body, never drop it") {
    // a capture cut mid-headers (no blank line) must degrade to the
    // raw block — the bytes were present and stay extractable
    val block = b("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n" +
      "X-Truncated-Header-No-Blank-Line: yes")
    val w = Warc.encode(Seq(("response", "http://h/t",
      "2020-01-01T00:00:00Z", block)))
    val r = Warc.records(w).get.head
    assert(r.httpStatus.contains(200))
    assert(r.body.toSeq == block.toSeq, "raw block must be kept")
  }

  test("record table shape; a junk tail stops the walk without shifting") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val w = Warc.encode(Seq(
      ("response", "http://h/1", "2019-01-01T00:00:00Z",
        Warc.httpBlock(200, "text/html", b("<html><p>x</p></html>"))))) ++
      b("GARBAGE TRAILING BYTES THAT ARE NOT A RECORD")
    val rows = Warc.table(spark, Seq((1L, w)).toDF("doc_id", "media"))
      .collect()
    assert(rows.length == 1 && rows(0).getString(2) == "response")
  }

  test("census routes a WARC as application/warc, not as its embedded HTML") {
    // the HTML sniff is a loose 1 KiB scan: a WARC whose head carries
    // an '<html' payload must still classify by its exact magic
    val w = Warc.encode(Seq(("response", "http://h/x",
      "2020-01-01T00:00:00Z",
      Warc.httpBlock(200, "text/html",
        b("<html><body><p>inside</p></body></html>")))))
    val f = Multimodal.ContainerCodec
      .decode(Seq(Multimodal.MediaRow(1L, w, "application/warc", 0, 0)))
      .head
    assert(f.format == "application/warc" && f.kind == "container",
      s"$f")
    assert(f.feature.take(2).toSeq == Seq(1f, 1f))
  }

  test("gzip transparency: gzipped html classifies gzip:text/html, gzip junk byte-stats, no nested recursion") {
    def gz(p: Array[Byte]): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(o)
      g.write(p); g.close(); o.toByteArray
    }
    def classify(p: Array[Byte]) = Multimodal.ContainerCodec
      .decode(Seq(Multimodal.MediaRow(1L, p, "application/gzip", 0, 0)))
      .head
    val html = gz(b("<html><body><p>wrapped</p></body></html>"))
    val f = classify(html)
    assert(f.format == "gzip:text/html" && f.kind == "text", s"$f")
    // outer byte identity: length and checksum are the STORED bytes
    assert(f.byte_len == html.length)
    // gzip of junk: the wrapper carries no information -> byte-stats
    val j = classify(gz(Array.tabulate(64)(i => ((i * 7) % 251).toByte)))
    assert(j.kind == "byte-stats" && j.format == "application/gzip",
      s"$j")
    // double-gzip: one unwrap only — inner gzip is unclassifiable,
    // so byte-stats, never unbounded recursion
    val d = classify(gz(gz(b("<html><p>deep</p></html>"))))
    assert(d.kind == "byte-stats", s"$d")
  }

  test("non-WARC payloads return None") {
    assert(Warc.records(b("HTTP/1.1 200 OK\r\n\r\n")) == None)
    assert(Warc.records(b("plain text")) == None)
    assert(Warc.records(null) == None)
    // a gzip of something that is NOT warc
    val o = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(o)
    gz.write(b("just gzipped text, no records")); gz.close()
    assert(Warc.records(o.toByteArray) == None)
  }

  test("hostile totality: junk, truncations, bit flips never throw") {
    val base = Warc.encode(Seq(
      ("response", "http://h/f", "2020-06-07T08:09:10Z",
        Warc.httpBlock(200, "text/html",
          b("<html><body><p>fuzz</p></body></html>"), chunked = true))),
      perRecordGzip = true)
    val r = new scala.util.Random(47)
    for (cut <- 1 until base.length by 5) Warc.records(base.take(cut))
    for (_ <- 0 until 250) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(5))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Warc.records(mut)
    }
    Warc.records(Array.fill(256)('W'.toByte))
  }
}
