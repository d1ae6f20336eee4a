package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] WARC crawl-archive extraction (ISO 28500 / the IIPC WARC/1.x
  * layout) — the container format web crawls actually ship in. A
  * training pipeline's first step over a crawl corpus is
  * "WARC member → clean documents", and everything in that step is
  * container/text math:
  *
  *  - RECORDS: `WARC/1.x` version line, header lines to the blank
  *    line, `Content-Length`-delimited block, two-CRLF record
  *    separator. The standard `.warc.gz` layout (each record its own
  *    gzip member, members concatenated) inflates through the JDK's
  *    own GZIPInputStream, which consumes concatenated members;
  *    output is byte-capped against decompression bombs.
  *  - HTTP: a `response` record's block is a captured HTTP message —
  *    status line, headers, payload. `Transfer-Encoding: chunked`
  *    decodes (pure hex-length framing); `Content-Encoding: gzip`
  *    inflates (JDK); both refuse into a None payload on structural
  *    violation rather than guessing.
  *  - DOCUMENTS: [[docTable]] routes each response payload through
  *    the document dispatch ([[Html.text]] / [[Pdf.text]] /
  *    [[Office.text]]) so a crawl member explodes straight to clean
  *    corpus text with the per-document refused counters intact.
  *
  * Every offset and length is validated; record counts are capped.
  * Scale shape: [[table]]/[[docTable]] are one batched map over the
  * media column — rows per record, no shuffle, no driver collect.
  */
object Warc {

  /** One WARC record; `httpStatus`/`mime`/`body` are the parsed HTTP
    * layer for `response` records (body = payload after
    * chunked/content-encoding decode), None/raw-block otherwise.
    */
  final case class Record(warcType: String, url: Option[String],
      year: Option[Int], httpStatus: Option[Int], mime: Option[String],
      body: Array[Byte])

  /** THE gzip magic sniff — one definition shared by the WARC walk,
    * [[Tar]], [[Documents.dispatch]] and the census unwrap.
    */
  private[ext] def isGzip(b: Array[Byte]): Boolean =
    b != null && b.length >= 18 && (b(0) & 0xff) == 0x1f &&
      (b(1) & 0xff) == 0x8b

  def isWarc(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 8) return false
    if (b(0) == 'W' && b(1) == 'A' && b(2) == 'R' && b(3) == 'C' &&
      b(4) == '/') return true
    // .warc.gz: sniff the first member's head (read just 5 bytes —
    // the full-inflate cap belongs to records(), not the sniff)
    isGzip(b) && (try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 512)
      val h = new Array[Byte](5)
      var n = 0
      var eof = false
      while (n < 5 && !eof) {
        val g = in.read(h, n, 5 - n)
        if (g < 0) eof = true else n += g
      }
      in.close()
      n == 5 && h(0) == 'W' && h(1) == 'A' && h(2) == 'R' &&
        h(3) == 'C' && h(4) == '/'
    } catch { case scala.util.control.NonFatal(_) => false })
  }

  /** Inflate (concatenated gzip members — the JDK stream consumes
    * them) up to `cap` bytes; None past the cap or on corruption.
    */
  private[ext] def gunzip(b: Array[Byte], cap: Int): Option[Array[Byte]] =
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 8192)
      val out = new java.io.ByteArrayOutputStream(
        math.min(math.max(64, b.length * 4), cap))
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0 && out.size <= cap) {
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      in.close()
      if (out.size > cap) None else Some(out.toByteArray)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Parse a header section starting at `off`: lowercased name →
    * value map plus the offset just past the blank line. Tolerates
    * bare-LF line ends. None when no blank line terminates it.
    */
  private def headers(b: Array[Byte], off: Int,
      end: Int): Option[(Map[String, String], Int)] = {
    val m = Map.newBuilder[String, String]
    var i = off
    var lines = 0
    while (i < end && lines < 256) {
      // line extent
      var e = i
      while (e < end && b(e) != '\n') e += 1
      if (e >= end) return None
      val lineEnd = if (e > i && b(e - 1) == '\r') e - 1 else e
      if (lineEnd == i) return Some((m.result(), e + 1)) // blank line
      val line = new String(b, i, lineEnd - i, "ISO-8859-1")
      val c = line.indexOf(':')
      if (c > 0)
        m += ((line.substring(0, c).trim
          .toLowerCase(java.util.Locale.ROOT),
          line.substring(c + 1).trim))
      i = e + 1
      lines += 1
    }
    None
  }

  /** HTTP chunked transfer decoding (RFC 9112 7.1): hex length line,
    * chunk bytes, CRLF, repeat; 0-length terminates. None on any
    * structural violation.
    */
  private def dechunk(b: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    var done = false
    while (!done) {
      var e = i
      while (e < b.length && b(e) != '\n') e += 1
      if (e >= b.length) return None
      val lineEnd = if (e > i && b(e - 1) == '\r') e - 1 else e
      val hex = new String(b, i, lineEnd - i, "ISO-8859-1")
        .split(';')(0).trim // chunk extensions dropped
      val len =
        try java.lang.Long.parseLong(hex, 16)
        catch { case _: NumberFormatException => return None }
      if (len < 0 || len > (1 << 26)) return None
      i = e + 1
      if (len == 0) done = true
      else {
        if (i + len > b.length) return None
        out.write(b, i, len.toInt)
        i += len.toInt
        // CRLF after the chunk data
        if (i < b.length && b(i) == '\r') i += 1
        if (i < b.length && b(i) == '\n') i += 1
      }
    }
    Some(out.toByteArray)
  }

  /** Parse all records. None when the bytes aren't WARC (gzipped or
    * plain). Malformed records stop the walk — never a shifted parse.
    */
  def records(b: Array[Byte]): Option[Seq[Record]] = try {
    if (!isWarc(b)) return None
    val data =
      if (isGzip(b)) gunzip(b, 1 << 27).getOrElse(return None) else b
    val out = Seq.newBuilder[Record]
    var i = 0
    var count = 0
    while (i < data.length && count < 65536) {
      // skip inter-record newlines
      while (i < data.length && (data(i) == '\r' || data(i) == '\n'))
        i += 1
      if (i >= data.length) { i = data.length }
      else if (!(i + 5 <= data.length && data(i) == 'W' &&
        data(i + 1) == 'A' && data(i + 2) == 'R' &&
        data(i + 3) == 'C' && data(i + 4) == '/')) {
        i = data.length // junk past the last record: stop, don't shift
      } else {
        // version line
        var e = i
        while (e < data.length && data(e) != '\n') e += 1
        if (e >= data.length) { i = data.length }
        else headers(data, e + 1, data.length) match {
          case None => i = data.length
          case Some((h, blockOff)) =>
            val len = h.get("content-length")
              .flatMap(_.toLongOption).getOrElse(-1L)
            if (len < 0 || blockOff + len > data.length) {
              i = data.length
            } else {
              val block = java.util.Arrays.copyOfRange(
                data, blockOff, blockOff + len.toInt)
              val wtype = h.getOrElse("warc-type", "")
              val url = h.get("warc-target-uri")
              val year = h.get("warc-date").map(_.take(4))
                .filter(s => s.length == 4 && s.forall(_.isDigit))
                .map(_.toInt).filter(_ > 0)
              val isHttpResponse = wtype == "response" &&
                h.get("content-type")
                  .forall(_.toLowerCase(java.util.Locale.ROOT)
                    .startsWith("application/http"))
              val (status, mime, body) =
                if (isHttpResponse) parseHttp(block)
                else (None, h.get("content-type"), block)
              out += Record(wtype, url, year, status, mime, body)
              count += 1
              i = blockOff + len.toInt
            }
        }
      }
    }
    val rs = out.result()
    if (rs.isEmpty) None else Some(rs)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Captured HTTP response → (status, content-type sans params,
    * decoded payload). A malformed message keeps the raw block as the
    * body with no status — degraded, never dropped.
    */
  private def parseHttp(block: Array[Byte])
      : (Option[Int], Option[String], Array[Byte]) = {
    if (block.length < 12 || !(block(0) == 'H' && block(1) == 'T' &&
      block(2) == 'T' && block(3) == 'P' && block(4) == '/'))
      return (None, None, block)
    var e = 0
    while (e < block.length && block(e) != '\n') e += 1
    if (e >= block.length) return (None, None, block)
    val statusLine = new String(block, 0,
      if (block(e - 1) == '\r') e - 1 else e, "ISO-8859-1")
    val status = statusLine.split(' ')
      .lift(1).flatMap(_.toIntOption).filter(s => s >= 100 && s < 600)
    headers(block, e + 1, block.length) match {
      // no terminating blank line (truncated capture) or past the
      // header-line cap: keep the RAW block as the body — degraded,
      // never dropped (the scaladoc contract)
      case None => (status, None, block)
      case Some((h, payloadOff)) =>
        val mime = h.get("content-type")
          .map(_.split(';')(0).trim.toLowerCase(java.util.Locale.ROOT))
          .filter(_.nonEmpty)
        var payload = java.util.Arrays.copyOfRange(
          block, payloadOff, block.length)
        if (h.get("transfer-encoding")
          .exists(_.toLowerCase(java.util.Locale.ROOT)
            .contains("chunked")))
          payload = dechunk(payload).getOrElse(Array.emptyByteArray)
        if (h.get("content-encoding")
          .exists(_.toLowerCase(java.util.Locale.ROOT)
            .contains("gzip")))
          payload = gunzip(payload, 1 << 26)
            .getOrElse(Array.emptyByteArray)
        (status, mime, payload)
    }
  }

  /** Record rows: (doc_id, rec_idx, warc_type, url, year,
    * http_status, mime, body_len) — one batched map.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        records(b).toSeq.flatten.zipWithIndex.map { case (r, k) =>
          (id, k, r.warcType, r.url, r.year, r.httpStatus, r.mime,
            r.body.length)
        }
      }
      .toDF("doc_id", "rec_idx", "warc_type", "url", "year",
        "http_status", "mime", "body_len")
  }

  /** Crawl → clean documents: response payloads routed through the
    * shared [[Documents.dispatch]] (2xx only). Rows: (doc_id,
    * rec_idx, url, http_status, mime, text, refused). One batched
    * map — a crawl member becomes corpus text in one pass.
    */
  def docTable(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        records(b).toSeq.flatten.zipWithIndex.flatMap {
          case (r, k) if r.warcType == "response" &&
            r.httpStatus.exists(st => st >= 200 && st < 300) =>
            Documents.dispatch(r.body).map { case (text, refused) =>
              (id, k, r.url, r.httpStatus, r.mime, text, refused)
            }
          case _ => None
        }
      }
      .toDF("doc_id", "rec_idx", "url", "http_status", "mime", "text",
        "refused")
  }

  // ------------------------------------------------------------------
  // Fixture writer
  // ------------------------------------------------------------------

  /** A REAL WARC: version line, headers, Content-Length'd block, the
    * two-CRLF separator; `perRecordGzip` emits the standard .warc.gz
    * layout (one gzip member per record). Each spec is (warcType,
    * url, isoDate, block); response blocks should be full HTTP
    * messages — [[httpBlock]] builds them.
    */
  def encode(recs: Seq[(String, String, String, Array[Byte])],
      perRecordGzip: Boolean = false): Array[Byte] = {
    require(recs.nonEmpty, "encode: records")
    val out = new java.io.ByteArrayOutputStream()
    recs.foreach { case (wtype, url, date, block) =>
      val hdr = new StringBuilder
      hdr ++= "WARC/1.0\r\n"
      hdr ++= s"WARC-Type: $wtype\r\n"
      if (url.nonEmpty) hdr ++= s"WARC-Target-URI: $url\r\n"
      if (date.nonEmpty) hdr ++= s"WARC-Date: $date\r\n"
      if (wtype == "response")
        hdr ++= "Content-Type: application/http;msgtype=response\r\n"
      hdr ++= s"Content-Length: ${block.length}\r\n\r\n"
      val rec = hdr.toString.getBytes("ISO-8859-1") ++ block ++
        "\r\n\r\n".getBytes("ISO-8859-1")
      if (perRecordGzip) {
        val o = new java.io.ByteArrayOutputStream()
        val gz = new java.util.zip.GZIPOutputStream(o)
        gz.write(rec); gz.close()
        out.write(o.toByteArray)
      } else out.write(rec)
    }
    out.toByteArray
  }

  /** A captured HTTP/1.1 response message: status, Content-Type, and
    * optionally chunked framing and/or gzip content-encoding over the
    * payload.
    */
  def httpBlock(status: Int, mime: String, payload: Array[Byte],
      chunked: Boolean = false, gzipBody: Boolean = false): Array[Byte] = {
    var body = payload
    if (gzipBody) {
      val o = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(o)
      gz.write(body); gz.close()
      body = o.toByteArray
    }
    if (chunked) {
      val o = new java.io.ByteArrayOutputStream()
      // split into two chunks so the framing is genuinely exercised
      val cut = math.max(1, body.length / 2)
      Seq(body.take(cut), body.drop(cut)).filter(_.nonEmpty)
        .foreach { c =>
          o.write(s"${c.length.toHexString}\r\n".getBytes("ISO-8859-1"))
          o.write(c)
          o.write("\r\n".getBytes("ISO-8859-1"))
        }
      o.write("0\r\n\r\n".getBytes("ISO-8859-1"))
      body = o.toByteArray
    }
    val hdr = new StringBuilder
    hdr ++= s"HTTP/1.1 $status OK\r\n"
    hdr ++= s"Content-Type: $mime\r\n"
    if (chunked) hdr ++= "Transfer-Encoding: chunked\r\n"
    if (gzipBody) hdr ++= "Content-Encoding: gzip\r\n"
    hdr ++= s"Content-Length: ${body.length}\r\n\r\n"
    hdr.toString.getBytes("ISO-8859-1") ++ body
  }
}
