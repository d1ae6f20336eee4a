package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] General HTML→text extraction — the single dominant
  * text-bearing format in any web crawl (the reference's only HTML
  * handling is the rates-table regex of
  * `/root/reference/etl/web_scraper.py:65-104`; a training corpus
  * needs the whole page). Implemented from the public WHATWG HTML
  * spec with zero transcribed tables:
  *
  *  - CHARSET: BOM sniff (UTF-8 / UTF-16 both endians), then the
  *    spec's meta prescan over the first 1024 bytes (`charset=`
  *    inside a `<meta`), resolved through the JDK's own
  *    `Charset.forName` — no code-point table of any encoding lives
  *    here. UTF-8 is the spec default when nothing declares.
  *  - STRUCTURE: comments (`<!-- -->`), CDATA sections, DOCTYPE and
  *    processing instructions dropped; `<script>`/`<style>`/
  *    `<noscript>`/`<template>`/`<textarea>` are raw-text elements
  *    whose CONTENT is dropped whole (until the matching close tag,
  *    case-insensitive) so code and CSS never leak into corpus text;
  *    `<title>` is captured as document provenance, not body text.
  *    Tag attribute scan honors quotes, so a `>` inside an attribute
  *    value never truncates a tag.
  *  - BLOCKS: block-level open AND close tags (p, div, li, tr,
  *    h1-h6, table, blockquote, pre, section, …) plus `<br>`/`<hr>`
  *    emit a line break; `<td>`/`<th>` a cell space. Everything else
  *    is inline.
  *  - ENTITIES: numeric (`&#N;`/`&#xH;` — any valid scalar value,
  *    surrogates and out-of-range REFUSE) and the spec's XML core
  *    (`amp lt gt quot apos`) plus `nbsp` decode; every OTHER named
  *    entity stays LITERAL in the text and increments the
  *    per-document `refused` counter — the HTML5 named-entity table
  *    (2,231 names) is exactly the class of numeric table this
  *    engine never transcribes (the [[Pdf]] encoding discipline),
  *    and the boundary is measured, never silent.
  *  - WHITESPACE: runs collapse to one space, block boundaries to
  *    one newline, no leading/trailing space per line (`<pre>`
  *    content collapses like everything else — documented honest
  *    flattening, not a guess).
  *
  * Scale shape: [[table]] is one batched map over the media column —
  * no shuffle, no driver collect (the [[Pdf.table]] discipline).
  */
object Html {

  /** Extracted page: `<title>` provenance, collapsed body text, and
    * the count of refused entities (unknown named / invalid numeric).
    */
  final case class HtmlText(title: Option[String], text: String,
      refused: Long)

  /** Cheap byte-level sniff: an ASCII-lowered window of the head must
    * carry the doctype or an `<html` tag. Multi-byte encodings can't
    * alias '<' in any charset the prescan window cares about.
    */
  def isHtml(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 6) return false
    val n = math.min(b.length, 1024)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = b(i) & 0xff
      // NULs are SKIPPED (not spaced): UTF-16 ASCII text interleaves
      // one zero byte per char, and dropping them recovers the tag
      if (c != 0)
        sb.append(if (c >= 'A' && c <= 'Z') (c + 32).toChar else c.toChar)
      i += 1
    }
    val head = sb.toString
    head.contains("<!doctype html") || head.contains("<html")
  }

  /** HTML5 encoding sniff: BOM first, then the meta prescan — a
    * `charset=` that appears inside a `<meta` tag within the first
    * 1024 bytes, name resolved via the JDK charset registry (an
    * unknown name falls back to the UTF-8 default rather than
    * guessing bytes).
    */
  private def sniffCharset(b: Array[Byte]): java.nio.charset.Charset = {
    import java.nio.charset.StandardCharsets
    if (b.length >= 3 && (b(0) & 0xff) == 0xef && (b(1) & 0xff) == 0xbb &&
      (b(2) & 0xff) == 0xbf) return StandardCharsets.UTF_8
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      return StandardCharsets.UTF_16BE
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xfe)
      return StandardCharsets.UTF_16LE
    val n = math.min(b.length, 1024)
    val head = new String(b, 0, n, "ISO-8859-1")
      .toLowerCase(java.util.Locale.ROOT)
    val at = head.indexOf("charset=")
    if (at >= 0) {
      // inside a <meta ...> tag: the nearest '<meta' before the match
      // must not have been closed yet (a "charset=" in visible text
      // or a comment is NOT an encoding declaration)
      val metaAt = head.lastIndexOf("<meta", at)
      val closeAt = head.lastIndexOf(">", at)
      if (metaAt >= 0 && closeAt < metaAt) {
        var j = at + 8
        if (j < head.length && (head(j) == '"' || head(j) == '\''))
          j += 1
        val s = j
        while (j < head.length && (head(j).isLetterOrDigit ||
          head(j) == '-' || head(j) == '_' || head(j) == '.')) j += 1
        if (j > s) {
          val nm = head.substring(s, j)
          // WHATWG prescan rule: a meta-declared UTF-16 family label
          // maps to UTF-8 — real UTF-16 bytes would have hit the BOM
          // branch, so the declaration is always an authoring error
          // and honoring it mojibakes a whole UTF-8 page silently
          if (nm.startsWith("utf-16")) return StandardCharsets.UTF_8
          try return java.nio.charset.Charset.forName(nm)
          catch { case scala.util.control.NonFatal(_) => () }
        }
      }
    }
    StandardCharsets.UTF_8
  }

  /** Open OR close of these emits a line break. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "li", "ul", "ol", "dl", "dt", "dd", "table", "tr",
    "thead", "tbody", "tfoot", "caption", "h1", "h2", "h3", "h4", "h5",
    "h6", "blockquote", "pre", "section", "article", "aside", "header",
    "footer", "nav", "main", "figure", "figcaption", "form", "fieldset",
    "address", "details", "summary", "hr", "br", "select", "option")

  /** Raw-text elements whose content is DROPPED whole. */
  private val RawDrop: Set[String] =
    Set("script", "style", "noscript", "template", "textarea")

  /** The entity decode shared by body and title text. At `s(i) == '&'`:
    * returns (replacement-or-null, next index, refused delta). Null
    * replacement means "no entity here — emit the '&' literally".
    * Unknown NAMED entities return their literal `&name;` spelling
    * with refused = 1 (in-band data kept, boundary counted); invalid
    * numerics (surrogate / out of range / overflow) drop with
    * refused = 1.
    */
  private[ext] def entityAt(s: String, i: Int): (String, Int, Int) = {
    val n = s.length
    val sc = i + 1
    if (sc < n && s.charAt(sc) == '#') {
      var j = sc + 1
      val hex = j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')
      if (hex) j += 1
      val ds = j
      while (j < n && j - ds < 8 &&
        Character.digit(s.charAt(j), if (hex) 16 else 10) >= 0) j += 1
      if (j > ds && j < n && s.charAt(j) == ';') {
        val cp =
          try Integer.parseInt(s.substring(ds, j), if (hex) 16 else 10)
          catch { case _: NumberFormatException => -1 }
        if (cp > 0 && cp <= 0x10ffff &&
          !(cp >= 0xd800 && cp <= 0xdfff))
          (new String(Character.toChars(cp)), j + 1, 0)
        else ("", j + 1, 1) // invalid scalar: drop, count
      } else (null, i + 1, 0)
    } else {
      var j = sc
      while (j < n && j - sc < 32 && s.charAt(j).isLetterOrDigit) j += 1
      if (j > sc && j < n && s.charAt(j) == ';') {
        val name = s.substring(sc, j)
        name match {
          case "amp"  => ("&", j + 1, 0)
          case "lt"   => ("<", j + 1, 0)
          case "gt"   => (">", j + 1, 0)
          case "quot" => ("\"", j + 1, 0)
          case "apos" => ("'", j + 1, 0)
          case "nbsp" => ("\u00a0", j + 1, 0)
          case _      => ("&" + name + ";", j + 1, 1) // literal, counted
        }
      } else (null, i + 1, 0)
    }
  }

  private def indexOfCi(s: String, pat: String, from: Int): Int = {
    var i = math.max(0, from)
    val last = s.length - pat.length
    while (i <= last) {
      if (s.regionMatches(true, i, pat, 0, pat.length)) return i
      i += 1
    }
    -1
  }

  /** Collapse whitespace runs to one space, trim — for `<title>`. */
  private def collapseWs(s: String): String = {
    val out = new StringBuilder
    var pend = false
    s.foreach { c =>
      if (Character.isWhitespace(c) || c == '\u00a0') pend = true
      else {
        if (pend && out.nonEmpty) out += ' '
        pend = false
        out += c
      }
    }
    out.toString
  }

  /** Extract title + body text. None when the bytes don't sniff as
    * HTML; a page whose body collapses to nothing still returns (the
    * census must count it as an html row, not byte-stats).
    */
  def text(b: Array[Byte]): Option[HtmlText] = try {
    if (!isHtml(b)) return None
    val full = new String(b, sniffCharset(b))
    val s = if (full.nonEmpty && full.charAt(0) == '\uFEFF')
      full.substring(1) else full
    val n = s.length
    var refused = 0L
    val out = new StringBuilder
    var pendingSpace = false
    var pendingNewline = false
    def emit(c: Char): Unit = {
      if (c == '\u00a0' || Character.isWhitespace(c)) {
        pendingSpace = true
        ()
      } else {
        if (pendingNewline) { if (out.nonEmpty) out += '\n' }
        else if (pendingSpace && out.nonEmpty && out.last != '\n')
          out += ' '
        pendingSpace = false
        pendingNewline = false
        out += c
      }
    }
    def emitStr(t: String): Unit = t.foreach(emit)
    var title: Option[String] = None
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![cdata[", 0, 9)) {
          // foreign-content CDATA: the payload is character data
          val e = s.indexOf("]]>", i + 9)
          val end = if (e < 0) n else e
          var j = i + 9
          while (j < end) { emit(s.charAt(j)); j += 1 }
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (s.charAt(i + 1).isLetter ||
          s.charAt(i + 1) == '/' || s.charAt(i + 1) == '!' ||
          s.charAt(i + 1) == '?')) {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (s.charAt(j).isLetterOrDigit ||
            s.charAt(j) == '-' || s.charAt(j) == ':')) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          // to '>' honoring quoted attribute values
          var q = 0.toChar
          while (j < n && (q != 0.toChar || s.charAt(j) != '>')) {
            val cj = s.charAt(j)
            if (q != 0.toChar) { if (cj == q) q = 0.toChar }
            else if (cj == '"' || cj == '\'') q = cj
            j += 1
          }
          val tagEnd = if (j < n) j + 1 else n
          // a SELF-CLOSED <title/> or <script/> (legal in the XHTML
          // that Office.epubText routes through here) must not open a
          // raw-text span — scanning for a close tag that never comes
          // would swallow the whole document (review find r15)
          val selfClosed = j < n && j >= 1 && s.charAt(j - 1) == '/'
          if (!closing && !selfClosed && name == "title") {
            val e = indexOfCi(s, "</title", tagEnd)
            val end = if (e < 0) n else e
            if (title.isEmpty) {
              val tb = new StringBuilder
              var k = tagEnd
              while (k < end) {
                if (s.charAt(k) == '&') {
                  val (rep, next, r) = entityAt(s, k)
                  refused += r
                  if (rep == null) { tb += '&'; k += 1 }
                  else { tb ++= rep; k = next }
                } else { tb += s.charAt(k); k += 1 }
              }
              val t = collapseWs(tb.toString)
              if (t.nonEmpty) title = Some(t)
            }
            i = end // the </title> tag itself parses next iteration
          } else if (!closing && !selfClosed && RawDrop(name)) {
            val e = indexOfCi(s, "</" + name, tagEnd)
            i = if (e < 0) n else e // close tag parses next iteration
          } else {
            if (BlockTags(name)) pendingNewline = true
            else if (!closing && (name == "td" || name == "th"))
              pendingSpace = true
            i = tagEnd
          }
        } else { emit('<'); i += 1 } // stray '<' is text
      } else if (c == '&') {
        val (rep, next, r) = entityAt(s, i)
        refused += r
        if (rep == null) { emit('&'); i += 1 }
        else { emitStr(rep); i = next }
      } else { emit(c); i += 1 }
    }
    Some(HtmlText(title, out.toString, refused))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Head metadata for crawl curation: description / author /
    * canonical URL / published year / og:title.
    */
  final case class HtmlMeta(description: Option[String],
      author: Option[String], canonical: Option[String],
      publishedYear: Option[Int], ogTitle: Option[String])

  /** The attributes of one tag's source text, tokenized LEFT TO RIGHT
    * the way a real parser reads them (a `name=` occurrence inside
    * another attribute's quoted value can never match — substring
    * scans misattribute there): skip the tag name, then repeat
    * [whitespace/slash]* name [= value]? with quoted or WHATWG-legal
    * unquoted values (unquoted ends at whitespace or `>` — a `/` is
    * ordinary value text, so unquoted URLs survive). Names lowercase;
    * first occurrence wins (the spec's duplicate rule); entities in
    * values decode through the shared boundary.
    */
  private def attrsOf(tagSrc: String): Map[String, String] = {
    val out = scala.collection.mutable.Map.empty[String, String]
    val n = tagSrc.length
    var i = 0
    // past '<' and the element name
    if (i < n && tagSrc.charAt(i) == '<') i += 1
    while (i < n && !tagSrc.charAt(i).isWhitespace &&
      tagSrc.charAt(i) != '>') i += 1
    while (i < n) {
      while (i < n && (tagSrc.charAt(i).isWhitespace ||
        tagSrc.charAt(i) == '/')) i += 1
      if (i >= n || tagSrc.charAt(i) == '>') return out.toMap
      val ns = i
      while (i < n && !tagSrc.charAt(i).isWhitespace &&
        tagSrc.charAt(i) != '=' && tagSrc.charAt(i) != '>' &&
        tagSrc.charAt(i) != '/') i += 1
      val name = tagSrc.substring(ns, i).toLowerCase(java.util.Locale.ROOT)
      while (i < n && tagSrc.charAt(i).isWhitespace) i += 1
      var value = ""
      if (i < n && tagSrc.charAt(i) == '=') {
        i += 1
        while (i < n && tagSrc.charAt(i).isWhitespace) i += 1
        if (i < n) {
          val quote = tagSrc.charAt(i)
          val (vs, ve, next) =
            if (quote == '"' || quote == '\'') {
              val e = tagSrc.indexOf(quote, i + 1)
              if (e < 0) (i + 1, n, n) else (i + 1, e, e + 1)
            } else {
              var e = i
              while (e < n && !tagSrc.charAt(e).isWhitespace &&
                tagSrc.charAt(e) != '>') e += 1
              (i, e, e)
            }
          val vb = new StringBuilder
          var k = vs
          while (k < ve) {
            if (tagSrc.charAt(k) == '&') {
              val (rep, nx, _) = entityAt(tagSrc, k)
              if (rep == null) { vb += '&'; k += 1 }
              else { vb ++= rep; k = nx }
            } else { vb += tagSrc.charAt(k); k += 1 }
          }
          value = collapseWs(vb.toString)
          i = next
        }
      }
      if (name.nonEmpty && !out.contains(name)) out(name) = value
    }
    out.toMap
  }

  /** Crawl-provenance metadata: `<meta name=/property= content=>`
    * pairs (description/og:description, author/article:author,
    * og:title, article:published_time/date → leading year) and the
    * `<link rel="canonical" href>` URL. The scan reuses the
    * quoted-attribute-aware tag walk (a `>` inside content="" cannot
    * truncate a tag) and the raw-text drops, so a meta tag quoted
    * inside a script never misreports. None for non-HTML payloads; a
    * page without any of the fields yields the all-None row.
    */
  def meta(b: Array[Byte]): Option[HtmlMeta] = try {
    if (!isHtml(b)) return None
    val full = new String(b, sniffCharset(b))
    val s = if (full.nonEmpty && full.charAt(0) == '\uFEFF')
      full.substring(1) else full
    val n = s.length
    var description, author, canonical, ogTitle: Option[String] = None
    var year: Option[Int] = None
    var i = 0
    while (i < n) {
      if (s.charAt(i) == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val e = s.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (s.regionMatches(true, i, "<![cdata[", 0, 9)) {
          // character data to text(); never metadata here either
          val e = s.indexOf("]]>", i + 9)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
          (s.charAt(i + 1) == '!' || s.charAt(i + 1) == '?')) {
          // DOCTYPE / processing instruction: skip like text() does
          val e = s.indexOf('>', i + 1)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n && (s.charAt(i + 1).isLetter ||
          s.charAt(i + 1) == '/')) {
          var j = i + 1
          val closing = s.charAt(j) == '/'
          if (closing) j += 1
          val ns = j
          while (j < n && (s.charAt(j).isLetterOrDigit ||
            s.charAt(j) == '-' || s.charAt(j) == ':')) j += 1
          val name = s.substring(ns, j).toLowerCase(java.util.Locale.ROOT)
          var q = 0.toChar
          while (j < n && (q != 0.toChar || s.charAt(j) != '>')) {
            val cj = s.charAt(j)
            if (q != 0.toChar) { if (cj == q) q = 0.toChar }
            else if (cj == '"' || cj == '\'') q = cj
            j += 1
          }
          val tagEnd = if (j < n) j + 1 else n
          val selfClosed = j < n && j >= 1 && s.charAt(j - 1) == '/'
          if (!closing && !selfClosed && RawDrop(name)) {
            val e = indexOfCi(s, "</" + name, tagEnd)
            i = if (e < 0) n else e
          } else {
            if (name == "meta") {
              val attrs = attrsOf(s.substring(i, tagEnd))
              val key = attrs.get("name").orElse(attrs.get("property"))
                .map(_.toLowerCase(java.util.Locale.ROOT)).getOrElse("")
              val content = attrs.get("content").filter(_.nonEmpty)
              key match {
                case "description" | "og:description" =>
                  description = description.orElse(content)
                case "author" | "article:author" =>
                  author = author.orElse(content)
                case "og:title" => ogTitle = ogTitle.orElse(content)
                case "article:published_time" | "date" | "dcterms.date" =>
                  year = year.orElse(content.map(_.take(4))
                    .filter(y => y.length == 4 && y.forall(_.isDigit))
                    .map(_.toInt).filter(_ > 0))
                case _ => ()
              }
            } else if (name == "link") {
              val attrs = attrsOf(s.substring(i, tagEnd))
              if (attrs.get("rel").exists(_.equalsIgnoreCase("canonical")))
                canonical = canonical
                  .orElse(attrs.get("href").filter(_.nonEmpty))
            }
            i = tagEnd
          }
        } else i += 1
      } else i += 1
    }
    Some(HtmlMeta(description, author, canonical, year, ogTitle))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Metadata rows for a media corpus: (doc_id, description, author,
    * canonical, published_year, og_title) — one batched map; non-HTML
    * payloads contribute nothing.
    */
  def metaTable(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        meta(b).map(m => (id, m.description, m.author, m.canonical,
          m.publishedYear, m.ogTitle))
      }
      .toDF("doc_id", "description", "author", "canonical",
        "published_year", "og_title")
  }

  /** Page rows for a media corpus: (doc_id, title, text, refused) —
    * one batched map; non-HTML payloads contribute nothing.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        text(b).map(t => (id, t.title, t.text, t.refused))
      }
      .toDF("doc_id", "title", "text", "refused")
  }
}
