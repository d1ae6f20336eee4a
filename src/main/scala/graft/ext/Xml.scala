package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Generic XML text extraction — the DocBook/TEI/JATS class of
  * structured-document corpora (academic fulltexts, dictionary dumps)
  * that are XML but NOT XHTML (those carry an `<html` root and route
  * through [[Html]]; the census checks Html first).
  *
  *  - Comments, processing instructions and the DOCTYPE drop; CDATA
  *    markers drop with their payload kept as character data; tag
  *    scan honors quoted attribute values.
  *  - Character references decode through the shared
  *    [[Html.entityAt]]: XML's five predefined entities + numeric
  *    forms; every DTD-defined named entity stays LITERAL and counts
  *    into the per-document `refused` counter (entity tables are
  *    in-band DTD data this extractor deliberately does not resolve).
  *  - LINE STRUCTURE, documented honestly: generic XML carries no
  *    display semantics, so a close tag breaks the line (one line per
  *    closed element that produced text) and whitespace collapses
  *    like [[Html]]. An inline element mid-sentence therefore splits
  *    a line — an accepted artifact of schema-free extraction, far
  *    better for corpus text than losing paragraph boundaries.
  *
  * Scale shape: [[table]] is one batched map — no shuffle, no driver
  * collect (the [[Pdf.table]] discipline).
  */
object Xml {

  final case class XmlText(root: String, text: String, refused: Long)

  /** Strict sniff: the XML declaration (optionally after a BOM). The
    * census dispatch checks [[Html.isHtml]] BEFORE this, so XHTML
    * never lands here.
    */
  def isXml(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 8) return false
    var i = 0
    if ((b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) i = 3
    while (i < b.length && (b(i) == ' ' || b(i) == '\n' ||
      b(i) == '\r' || b(i) == '\t')) i += 1
    i + 5 <= b.length && b(i) == '<' && b(i + 1) == '?' &&
      b(i + 2) == 'x' && b(i + 3) == 'm' && b(i + 4) == 'l'
  }

  /** The declaration's encoding attribute via the JDK registry;
    * UTF-8 default per spec.
    */
  private def charsetOf(b: Array[Byte]): java.nio.charset.Charset = {
    val head = new String(b, 0, math.min(b.length, 256), "ISO-8859-1")
      .toLowerCase(java.util.Locale.ROOT)
    val at = head.indexOf("encoding=")
    if (at >= 0 && at + 10 < head.length) {
      val q = head.charAt(at + 9)
      if (q == '"' || q == '\'') {
        val e = head.indexOf(q, at + 10)
        if (e > 0) {
          try return java.nio.charset.Charset.forName(
            head.substring(at + 10, e))
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
    java.nio.charset.StandardCharsets.UTF_8
  }

  def text(b: Array[Byte]): Option[XmlText] = try {
    if (!isXml(b)) return None
    val full = new String(b, charsetOf(b))
    val s = if (full.nonEmpty && full.charAt(0) == '\uFEFF')
      full.substring(1) else full
    val n = s.length
    var refused = 0L
    var root = ""
    val out = new StringBuilder
    var pendingSpace = false
    var pendingNewline = false
    def emit(c: Char): Unit = {
      if (c == ' ' || Character.isWhitespace(c)) pendingSpace = true
      else {
        if (pendingNewline) { if (out.nonEmpty) out += '\n' }
        else if (pendingSpace && out.nonEmpty && out.last != '\n')
          out += ' '
        pendingSpace = false
        pendingNewline = false
        out += c
      }
    }
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![cdata[", 0, 9)) {
          val e = s.indexOf("]]>", i + 9)
          val end = if (e < 0) n else e
          var j = i + 9
          while (j < end) { emit(s.charAt(j)); j += 1 }
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1) == '!' ||
          s.charAt(i + 1) == '?')) {
          // DOCTYPE / processing instruction: to '>' (quote-aware)
          var j = i + 2
          var q = 0.toChar
          while (j < n && (q != 0.toChar || s.charAt(j) != '>')) {
            val cj = s.charAt(j)
            if (q != 0.toChar) { if (cj == q) q = 0.toChar }
            else if (cj == '"' || cj == '\'') q = cj
            j += 1
          }
          i = if (j < n) j + 1 else n
        } else if (i + 1 < n && (s.charAt(i + 1).isLetter ||
          s.charAt(i + 1) == '/' || s.charAt(i + 1) == '_')) {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (s.charAt(j).isLetterOrDigit ||
            s.charAt(j) == '-' || s.charAt(j) == ':' ||
            s.charAt(j) == '_' || s.charAt(j) == '.')) j += 1
          if (root.isEmpty && !closing) root = s.substring(ns, j)
          var q = 0.toChar
          while (j < n && (q != 0.toChar || s.charAt(j) != '>')) {
            val cj = s.charAt(j)
            if (q != 0.toChar) { if (cj == q) q = 0.toChar }
            else if (cj == '"' || cj == '\'') q = cj
            j += 1
          }
          val selfClosed = j < n && j >= 1 && s.charAt(j - 1) == '/'
          if (closing || selfClosed) pendingNewline = true
          i = if (j < n) j + 1 else n
        } else { emit('<'); i += 1 }
      } else if (c == '&') {
        val (rep, next, r) = Html.entityAt(s, i)
        refused += r
        if (rep == null) { emit('&'); i += 1 }
        else { rep.foreach(emit); i = next }
      } else { emit(c); i += 1 }
    }
    Some(XmlText(root, out.toString, refused))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Rows: (doc_id, root, text, refused) — one batched map. */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        text(b).map(t => (id, t.root, t.text, t.refused))
      }
      .toDF("doc_id", "root", "text", "refused")
  }
}
