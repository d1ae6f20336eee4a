package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Email / MBOX text extraction — mailing-list and email-dump
  * corpora, implemented from the public RFCs with zero transcribed
  * tables:
  *
  *  - RFC 5322 messages: header block (folded lines unfold), blank
  *    line, body. MBOX archives split on the `From ` separator line
  *    with the mboxrd `>From` quoting convention unescaped.
  *  - RFC 2047 encoded-words in Subject/From
  *    (`=?charset?B|Q?...?=`): B through the JDK Base64 decoder, Q is
  *    quoted-printable with `_` as space; the charset resolves through
  *    the JDK registry (unresolvable charsets leave the word literal —
  *    in-band data kept, nothing guessed).
  *  - MIME bodies: `Content-Transfer-Encoding` base64 (JDK) and
  *    quoted-printable (soft breaks, `=HH`) decode;
  *    multipart bodies walk parts by boundary (depth-capped), preferring
  *    `text/plain` and falling back to `text/html` through
  *    [[Html.text]] — one HTML extractor, one whitespace discipline.
  *    Non-text parts (attachments) contribute nothing.
  *
  * Scale shape: [[table]] is one batched map over the media column —
  * rows per message, no shuffle, no driver collect (the [[Pdf.table]]
  * discipline).
  */
object Email {

  /** One message: provenance headers + extracted body text. */
  final case class Message(from: Option[String], subject: Option[String],
      year: Option[Int], text: String)

  private val HeaderNames = Seq("from:", "to:", "subject:", "date:",
    "received:", "message-id:", "mime-version:")

  /** MBOX (`From ` at offset 0 AND a real header block on the next
    * lines — plain prose that happens to start "From the..." must NOT
    * sniff) or a bare RFC 5322 message (>= 2 standard headers at line
    * starts before the first blank line).
    */
  def isEmail(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 16) return false
    val head = new String(b, 0, math.min(b.length, 2048), "ISO-8859-1")
    def headerish(s: String): Boolean = {
      val pre = s.split("\r?\n\r?\n", 2)(0)
      pre.split("\r?\n").map(_.toLowerCase(java.util.Locale.ROOT))
        .count(l => HeaderNames.exists(l.startsWith)) >= 2
    }
    if (head.startsWith("From ")) {
      val nl = head.indexOf('\n')
      nl > 0 && headerish(head.substring(nl + 1))
    } else headerish(head)
  }

  // ------------------------------------------------------------------
  // Decoders (all JDK / algorithmic)
  // ------------------------------------------------------------------

  private def charsetOf(name: String): java.nio.charset.Charset =
    try java.nio.charset.Charset.forName(name.trim)
    catch {
      case scala.util.control.NonFatal(_) =>
        java.nio.charset.StandardCharsets.UTF_8
    }

  /** Quoted-printable (RFC 2045 6.7): `=HH`, soft line breaks `=\n`;
    * `underscoreSpace` enables the RFC 2047 Q-variant `_` = 0x20.
    */
  private[ext] def quotedPrintable(s: String,
      underscoreSpace: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 2 < s.length &&
        Character.digit(s.charAt(i + 1), 16) >= 0 &&
        Character.digit(s.charAt(i + 2), 16) >= 0) {
        out.write((Character.digit(s.charAt(i + 1), 16) << 4) |
          Character.digit(s.charAt(i + 2), 16))
        i += 3
      } else if (c == '=' && i + 1 < s.length &&
        (s.charAt(i + 1) == '\r' || s.charAt(i + 1) == '\n')) {
        i += 1 // soft break: swallow the '=' and the EOL
        if (i < s.length && s.charAt(i) == '\r') i += 1
        if (i < s.length && s.charAt(i) == '\n') i += 1
      } else if (c == '_' && underscoreSpace) { out.write(' '); i += 1 }
      else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  /** RFC 2047 encoded-words: `=?charset?B|Q?payload?=`; adjacent
    * encoded-words joined without the intervening whitespace (the
    * RFC's own rule). Undecodable words stay literal.
    */
  private val EncodedWord = "=\\?([^?]+)\\?([bBqQ])\\?([^?]*)\\?=".r

  private[ext] def decodeWords(s: String): String = {
    val sb = new StringBuilder
    var last = 0
    var lastWasWord = false
    for (m <- EncodedWord.findAllMatchIn(s)) {
      val gap = s.substring(last, m.start)
      // whitespace BETWEEN encoded-words is transparent per RFC
      if (!(lastWasWord && gap.forall(ch => ch == ' ' || ch == '\t')))
        sb ++= gap
      val decoded: Option[String] = try {
        // STRICT charset lookup here (unlike bodies, where UTF-8 is a
        // reasonable default): an unresolvable encoded-word stays
        // literal — in-band data kept, nothing guessed
        val cs = java.nio.charset.Charset.forName(m.group(1))
        m.group(2).toLowerCase(java.util.Locale.ROOT) match {
          case "b" => Some(new String(
            java.util.Base64.getMimeDecoder.decode(m.group(3)), cs))
          case _ => Some(new String(
            quotedPrintable(m.group(3), underscoreSpace = true), cs))
        }
      } catch { case scala.util.control.NonFatal(_) => None }
      sb ++= decoded.getOrElse(m.matched)
      last = m.end
      lastWasWord = true
    }
    sb ++= s.substring(last)
    sb.toString
  }

  // ------------------------------------------------------------------
  // Message parse
  // ------------------------------------------------------------------

  /** Unfolded header map (lowercased names; first occurrence wins)
    * plus the body offset.
    */
  private def headerBlock(s: String): (Map[String, String], Int) = {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var i = 0
    var lastKey: String = null
    var lastKept = false // a duplicate's continuation must not append
    var bodyAt = s.length //   to the FIRST header's value
    var scanning = true
    while (scanning && i < s.length) {
      var e = s.indexOf('\n', i)
      if (e < 0) e = s.length
      val lineEnd = if (e > i && s.charAt(e - 1) == '\r') e - 1 else e
      if (lineEnd == i) { bodyAt = e + 1; scanning = false }
      else {
        val line = s.substring(i, lineEnd)
        if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') &&
          lastKey != null) {
          if (lastKept) m(lastKey) = m(lastKey) + " " + line.trim // unfold
        } else {
          val c = line.indexOf(':')
          if (c > 0) {
            val k = line.substring(0, c).trim
              .toLowerCase(java.util.Locale.ROOT)
            lastKey = k
            lastKept = !m.contains(k) // duplicates: first wins
            if (lastKept) m(k) = line.substring(c + 1).trim
          } else { scanning = false; bodyAt = i } // malformed: body here
        }
        i = e + 1
      }
    }
    (m.toMap, math.min(bodyAt, s.length))
  }

  private def param(headerValue: String, name: String): Option[String] = {
    val lower = headerValue.toLowerCase(java.util.Locale.ROOT)
    val at = lower.indexOf(name + "=")
    if (at < 0) return None
    var v = headerValue.substring(at + name.length + 1).trim
    if (v.startsWith("\"")) {
      val e = v.indexOf('"', 1)
      if (e < 0) return None
      Some(v.substring(1, e))
    } else {
      val e = v.indexWhere(ch => ch == ';' || ch == ' ' || ch == '\t')
      Some(if (e < 0) v else v.substring(0, e)).filter(_.nonEmpty)
    }
  }

  /** One entity's text (recursing into multipart, depth-capped). */
  private def entityText(s: String, depth: Int): String = {
    if (depth > 8) return ""
    val (h, bodyAt) = headerBlock(s)
    entityTextParsed(h, s.substring(bodyAt), depth)
  }

  private def entityTextParsed(h: Map[String, String], body: String,
      depth: Int): String = {
    val ctype = h.getOrElse("content-type", "text/plain")
    val mime = ctype.split(';')(0).trim
      .toLowerCase(java.util.Locale.ROOT)
    if (mime.startsWith("multipart/")) {
      val boundary = param(ctype, "boundary").getOrElse(return "")
      // RFC 2046: a delimiter is '--boundary' at a LINE START — a
      // part whose text merely CONTAINS the string must not split
      val parts = body.split("(?m)^--" +
        java.util.regex.Pattern.quote(boundary))
        .drop(1) // preamble
        .takeWhile(p => !p.startsWith("--"))
        .map(_.dropWhile(c => c == '\r' || c == '\n' || c == ' ' ||
          c == '\t'))
      val texts = parts.map(entityText(_, depth + 1)).filter(_.nonEmpty)
      // multipart/alternative carries the SAME content in rising
      // preference order — taking all of them would duplicate the
      // message; the first non-empty (text/plain by convention) wins
      if (mime == "multipart/alternative") texts.headOption.getOrElse("")
      else texts.mkString("\n")
    } else {
      val cte = h.getOrElse("content-transfer-encoding", "7bit")
        .trim.toLowerCase(java.util.Locale.ROOT)
      val raw: Array[Byte] = cte match {
        case "base64" =>
          try java.util.Base64.getMimeDecoder.decode(
            body.filter(c => c > ' ' || c == '\n'))
          catch {
            case scala.util.control.NonFatal(_) => Array.emptyByteArray
          }
        case "quoted-printable" => quotedPrintable(body)
        case _ => body.getBytes("ISO-8859-1")
      }
      val cs = param(ctype, "charset").map(charsetOf)
        .getOrElse(java.nio.charset.StandardCharsets.UTF_8)
      mime match {
        case "text/plain" | "text" =>
          new String(raw, cs).replace("\r\n", "\n").trim
        case "text/html" =>
          // the HTML pipeline needs its own charset sniff on BYTES;
          // the MIME charset param wins by re-encoding is lossy —
          // feed the bytes straight through (its meta/BOM sniff, then
          // UTF-8 default, covers the honest cases)
          Html.text(raw).map(_.text).getOrElse("")
        case _ => "" // attachments and non-text parts
      }
    }
  }

  /** Parse one RFC 5322 message (headers parsed ONCE — the body walk
    * reuses them).
    */
  private[ext] def message(s: String): Message = {
    val (h, bodyAt) = headerBlock(s)
    val from = h.get("from").map(decodeWords).map(_.trim)
      .filter(_.nonEmpty)
    val subject = h.get("subject").map(decodeWords).map(_.trim)
      .filter(_.nonEmpty)
    // RFC 5322 date: "[dow,] dd Mon yyyy hh:mm:ss zone" — the year is
    // the third whitespace token after the optional day-of-week
    val year = h.get("date").flatMap { d =>
      d.split("[ \\t]+").find(t =>
        t.length == 4 && t.forall(_.isDigit)).map(_.toInt)
        .filter(y => y > 1000 && y < 10000)
    }
    Message(from, subject, year,
      entityTextParsed(h, s.substring(bodyAt), 0))
  }

  /** All messages: an MBOX splits on `From ` separator lines (mboxrd
    * `>From` unquoting applied per message); a bare message parses
    * whole. None when the bytes don't sniff as email.
    */
  def messages(b: Array[Byte]): Option[Seq[Message]] = try {
    if (!isEmail(b)) return None
    val s = new String(b, "ISO-8859-1")
    val msgs: Seq[String] =
      if (s.startsWith("From ")) {
        s.split("(?m)^From [^\n]*\n").toSeq
          .filter(_.nonEmpty)
          // mboxrd unquoting: strip exactly ONE '>' off any
          // '>'*'From ' line the archiver quoted
          .map(_.replaceAll("(?m)^>(>*From )", "$1"))
      } else Seq(s)
    val out = msgs.map(message).filter(m =>
      m.from.nonEmpty || m.subject.nonEmpty || m.text.nonEmpty)
    if (out.isEmpty) None else Some(out)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Message rows: (doc_id, msg_idx, from, subject, year, text) — one
    * batched map.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        messages(b).toSeq.flatten.zipWithIndex.map { case (m, k) =>
          (id, k, m.from, m.subject, m.year, m.text)
        }
      }
      .toDF("doc_id", "msg_idx", "from", "subject", "year", "text")
  }

  // ------------------------------------------------------------------
  // Fixture writer
  // ------------------------------------------------------------------

  /** A real MBOX: `From ` separators, RFC 5322 headers, and per
    * message one of four body shapes — plain 7bit, quoted-printable,
    * base64, or multipart/alternative (plain + html part).
    */
  def encodeMbox(msgs: Seq[(String, String, Int, String)],
      shape: Int => String = _ => "plain"): Array[Byte] = {
    require(msgs.nonEmpty, "encodeMbox: messages")
    val out = new StringBuilder
    msgs.zipWithIndex.foreach { case ((from, subject, year, body), k) =>
      out ++= s"From $from Thu Jan  2 03:04:05 $year\n"
      out ++= s"From: $from\n"
      out ++= s"Subject: $subject\n"
      out ++= s"Date: Thu, 2 Jan $year 03:04:05 +0000\n"
      out ++= "MIME-Version: 1.0\n"
      shape(k) match {
        case "qp" =>
          out ++= "Content-Type: text/plain; charset=utf-8\n"
          out ++= "Content-Transfer-Encoding: quoted-printable\n\n"
          val enc = new StringBuilder
          body.getBytes("UTF-8").foreach { byt =>
            val v = byt & 0xff
            if (v >= 0x20 && v < 0x7f && v != '=') enc += v.toChar
            else if (v == '\n') enc += '\n'
            else enc ++= f"=$v%02X"
          }
          out ++= enc
          out ++= "\n\n"
        case "b64" =>
          out ++= "Content-Type: text/plain; charset=utf-8\n"
          out ++= "Content-Transfer-Encoding: base64\n\n"
          out ++= java.util.Base64.getMimeEncoder
            .encodeToString(body.getBytes("UTF-8"))
          out ++= "\n\n"
        case "multipart" =>
          val b = s"bnd_$k"
          out ++= s"Content-Type: multipart/alternative; boundary=\"$b\"\n\n"
          out ++= s"preamble ignored\n--$b\n"
          out ++= "Content-Type: text/plain; charset=utf-8\n\n"
          out ++= body
          out ++= s"\n--$b\n"
          out ++= "Content-Type: text/html\n\n"
          out ++= s"<html><body><p>${body}</p></body></html>"
          out ++= s"\n--$b--\n\n"
        case _ =>
          out ++= "Content-Type: text/plain; charset=utf-8\n\n"
          out ++= body
          out ++= "\n\n"
      }
    }
    out.toString.getBytes("UTF-8")
  }
}
