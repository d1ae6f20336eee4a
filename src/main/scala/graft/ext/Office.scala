package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] Office-document text extraction — DOCX and EPUB, the
  * second-largest document class after PDF in most crawled corpora.
  * Both are ZIP containers (the public APPNOTE layout) around XML,
  * so the whole surface is container math plus the JDK Inflater:
  *
  *  - ZIP: End-Of-Central-Directory scan from the tail (the spec's
  *    own discovery route — comments put EOCD up to 64 KiB before
  *    EOF), central-directory walk for (name, method, sizes, local
  *    offset), then the local header re-read for the actual data
  *    start. Only methods 0 (stored) and 8 (deflate — raw, via
  *    `Inflater(true)`) decode; anything else refuses that entry.
  *    Every offset/length is validated; entry counts and inflated
  *    sizes are capped.
  *  - DOCX (OOXML WordprocessingML, ECMA-376): text runs are the
  *    `<w:t>` elements of `word/document.xml`; `<w:p>` closes a
  *    paragraph (newline), `<w:br/>`/`<w:cr/>` break lines,
  *    `<w:tab/>` is a space. Provenance (title / creator / created
  *    year) reads `docProps/core.xml`'s Dublin Core fields.
  *  - EPUB (OCF + OPF, IDPF/W3C): `META-INF/container.xml` names the
  *    OPF package file; its manifest maps ids to hrefs and its spine
  *    orders the content documents; each content document is XHTML
  *    and runs through [[Html.text]] (one extractor, one whitespace
  *    discipline). A broken/absent spine falls back to every
  *    .xhtml/.html entry in central-directory order — the honest
  *    degraded route, same text, possibly reordered. Provenance from
  *    the OPF's `dc:title`/`dc:creator`.
  *
  * XML character references decode through [[Html.entityAt]] (XML
  * core + numeric; unknown named entities stay literal and count) —
  * no entity table is transcribed anywhere.
  *
  * Scale shape: [[table]] is one batched map over the media column —
  * no shuffle, no driver collect (the [[Pdf.table]] discipline).
  */
object Office {

  /** One extracted document: kind is "docx", "epub" or "odt". */
  final case class DocText(kind: String, title: Option[String],
      author: Option[String], year: Option[Int], text: String,
      refused: Long)

  // ------------------------------------------------------------------
  // ZIP container
  // ------------------------------------------------------------------

  private def u16le(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
  private def u32le(b: Array[Byte], o: Int): Long =
    ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
      ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)

  def isZip(b: Array[Byte]): Boolean =
    b != null && b.length >= 22 && b(0) == 'P' && b(1) == 'K' &&
      b(2) == 3 && b(3) == 4

  private final case class Entry(name: String, method: Int,
      localOff: Int, csize: Int, usize: Int)

  /** Central-directory walk. None when no EOCD resolves; entries with
    * out-of-range geometry are dropped individually (a malformed
    * entry must not hide its siblings).
    */
  private def entries(b: Array[Byte]): Option[Seq[Entry]] = {
    // EOCD: PK\x05\x06 scanned backward through the max comment span
    var eocd = -1
    var i = b.length - 22
    val stop = math.max(0, b.length - 22 - 65535)
    while (eocd < 0 && i >= stop) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 &&
        b(i + 3) == 6) eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val count = u16le(b, eocd + 10)
    val cdOff = u32le(b, eocd + 16)
    if (count > 4096 || cdOff < 0 || cdOff >= b.length) return None
    val out = Seq.newBuilder[Entry]
    var o = cdOff.toInt
    var k = 0
    while (k < count && o + 46 <= b.length) {
      if (!(b(o) == 'P' && b(o + 1) == 'K' && b(o + 2) == 1 &&
        b(o + 3) == 2)) return Some(out.result()) // walk stops, never shifts
      val method = u16le(b, o + 10)
      val csize = u32le(b, o + 20)
      val usize = u32le(b, o + 24)
      val nameLen = u16le(b, o + 28)
      val extraLen = u16le(b, o + 30)
      val commentLen = u16le(b, o + 32)
      val localOff = u32le(b, o + 42)
      if (o + 46 + nameLen > b.length) return Some(out.result())
      val name = new String(b, o + 46, nameLen, "UTF-8")
      if (csize >= 0 && csize <= b.length && usize >= 0 &&
        usize <= (1 << 26) && localOff >= 0 && localOff < b.length)
        out += Entry(name, method, localOff.toInt, csize.toInt,
          usize.toInt)
      o += 46 + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.result())
  }

  /** Read one entry's bytes through its local header (whose name and
    * extra field lengths are authoritative for the data offset).
    */
  private def entryData(b: Array[Byte], e: Entry): Option[Array[Byte]] = {
    val o = e.localOff
    if (o + 30 > b.length || b(o) != 'P' || b(o + 1) != 'K' ||
      b(o + 2) != 3 || b(o + 3) != 4) return None
    val nameLen = u16le(b, o + 26)
    val extraLen = u16le(b, o + 28)
    val dataOff = o + 30 + nameLen + extraLen
    if (dataOff < 0 || dataOff + e.csize > b.length) return None
    e.method match {
      case 0 =>
        if (e.csize != e.usize) return None
        Some(java.util.Arrays.copyOfRange(b, dataOff, dataOff + e.csize))
      case 8 =>
        try {
          val inf = new java.util.zip.Inflater(true) // raw deflate
          inf.setInput(b, dataOff, e.csize)
          val out = new Array[Byte](e.usize)
          var n = 0
          var guard = 0
          while (n < e.usize && !inf.finished() && guard < (1 << 16)) {
            val got = inf.inflate(out, n, e.usize - n)
            if (got > 0) n += got
            else if (inf.needsInput() || inf.needsDictionary())
              guard = 1 << 16
            guard += 1
          }
          inf.end()
          if (n == e.usize) Some(out) else None
        } catch { case scala.util.control.NonFatal(_) => None }
      case _ => None // stored/deflate only; others refuse this entry
    }
  }

  private def entry(b: Array[Byte], es: Seq[Entry],
      name: String): Option[Array[Byte]] =
    es.find(_.name == name).flatMap(entryData(b, _))

  // ------------------------------------------------------------------
  // Mini-XML helpers (scan, not a DOM — these files are small and the
  // grammar needed is elements + attributes + character data)
  // ------------------------------------------------------------------

  /** Decode XML character references in a text span. Returns the text
    * plus the refused-entity count ([[Html.entityAt]] semantics).
    */
  private def xmlText(s: String): (String, Long) = {
    val out = new StringBuilder
    var refused = 0L
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (rep, next, r) = Html.entityAt(s, i)
        refused += r
        if (rep == null) { out += '&'; i += 1 }
        else { out ++= rep; i = next }
      } else { out += s.charAt(i); i += 1 }
    }
    (out.toString, refused)
  }

  /** Content of the FIRST `<tag ...>text</tag>` occurrence —
    * entity-decoded, trimmed; None when absent/empty/self-closed.
    */
  private def tagContent(xml: String, tag: String): Option[String] = {
    var at = 0
    while (at >= 0) {
      val i = xml.indexOf("<" + tag, at)
      if (i < 0) return None
      val after = i + 1 + tag.length
      // the match must be the whole element name
      if (after < xml.length && (xml.charAt(after) == '>' ||
        xml.charAt(after) == ' ' || xml.charAt(after) == '\t' ||
        xml.charAt(after) == '\n' || xml.charAt(after) == '/')) {
        val gt = xml.indexOf('>', after)
        if (gt < 0) return None
        if (xml.charAt(gt - 1) == '/') { at = gt; () } // self-closed
        else {
          val end = xml.indexOf("</" + tag, gt + 1)
          if (end < 0) return None
          val t = xmlText(xml.substring(gt + 1, end))._1.trim
          return if (t.isEmpty) None else Some(t)
        }
      } else at = i + 1
    }
    None
  }

  /** An attribute value out of a single tag's source text. */
  private def attr(tagSrc: String, name: String): Option[String] = {
    val i = tagSrc.indexOf(name + "=")
    if (i < 0) return None
    val q = i + name.length + 1
    if (q >= tagSrc.length) return None
    val quote = tagSrc.charAt(q)
    if (quote != '"' && quote != '\'') return None
    val e = tagSrc.indexOf(quote, q + 1)
    if (e < 0) return None
    Some(xmlText(tagSrc.substring(q + 1, e))._1)
  }

  /** All full tag sources `<name ...>` (or self-closed) in order. */
  private def tagsOf(xml: String, name: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var at = 0
    var go = true
    while (go) {
      val i = xml.indexOf("<" + name, at)
      if (i < 0) go = false
      else {
        val after = i + 1 + name.length
        val ok = after < xml.length && (xml.charAt(after) == '>' ||
          xml.charAt(after) == ' ' || xml.charAt(after) == '/' ||
          xml.charAt(after) == '\t' || xml.charAt(after) == '\n')
        val gt = xml.indexOf('>', i)
        if (gt < 0) go = false
        else {
          if (ok) out += xml.substring(i, gt + 1)
          at = gt + 1
        }
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // DOCX
  // ------------------------------------------------------------------

  /** WordprocessingML body text: `<w:t>` runs concatenated within a
    * paragraph, `</w:p>` a newline, `<w:br/>`/`<w:cr/>` line breaks,
    * `<w:tab/>` a space. Anything else (field codes, drawings,
    * properties) contributes nothing.
    */
  private def docxBody(xml: String): (String, Long) = {
    val out = new StringBuilder
    var refused = 0L
    def brk(): Unit =
      if (out.nonEmpty && out.last != '\n') out += '\n'
    // name match must stop at a DELIMITER: a loose startsWith turns
    // '</w:pict>' into a '/w:p' paragraph break (review find r15)
    def isTag(tag: String, name: String): Boolean =
      tag.startsWith(name) && (tag.length == name.length || {
        val c = tag.charAt(name.length)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/'
      })
    var i = 0
    val n = xml.length
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        val gt = xml.indexOf('>', lt)
        if (gt < 0) { i = n }
        else {
          val tag = xml.substring(lt + 1, gt)
          // a SELF-CLOSED <w:t/> is an empty run, never an open one —
          // scanning to the next </w:t> would swallow raw markup from
          // the following run into corpus text (review find r15)
          if (isTag(tag, "w:t") && !tag.endsWith("/")) {
            val end = xml.indexOf("</w:t>", gt + 1)
            if (end < 0) { i = n }
            else {
              val (t, r) = xmlText(xml.substring(gt + 1, end))
              out ++= t
              refused += r
              i = end + 6
            }
          } else {
            if (isTag(tag, "/w:p") || isTag(tag, "w:br") ||
              isTag(tag, "w:cr")) brk()
            else if (isTag(tag, "w:tab") &&
              out.nonEmpty && out.last != '\n' && out.last != ' ')
              out += ' '
            i = gt + 1
          }
        }
      }
    }
    (out.toString.stripSuffix("\n"), refused)
  }

  def docxText(b: Array[Byte]): Option[DocText] = try {
    if (!isZip(b)) return None
    val es = entries(b).getOrElse(return None)
    val doc = entry(b, es, "word/document.xml").getOrElse(return None)
    val (body, refused) = docxBody(new String(doc, "UTF-8"))
    val core = entry(b, es, "docProps/core.xml")
      .map(new String(_, "UTF-8"))
    def field(t: String): Option[String] = core.flatMap(tagContent(_, t))
    val year = core.flatMap(tagContent(_, "dcterms:created"))
      .map(_.take(4)).filter(s => s.length == 4 && s.forall(_.isDigit))
      .map(_.toInt).filter(_ > 0)
    Some(DocText("docx", field("dc:title"), field("dc:creator"), year,
      body, refused))
  } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // EPUB
  // ------------------------------------------------------------------

  def epubText(b: Array[Byte]): Option[DocText] = try {
    if (!isZip(b)) return None
    val es = entries(b).getOrElse(return None)
    val isEpub = entry(b, es, "mimetype")
      .exists(m => new String(m, "US-ASCII").trim ==
        "application/epub+zip")
    if (!isEpub) return None
    var title: Option[String] = None
    var author: Option[String] = None
    var year: Option[Int] = None
    // container.xml -> OPF -> manifest + spine
    val spineDocs: Seq[String] = {
      val opfPath = entry(b, es, "META-INF/container.xml")
        .map(new String(_, "UTF-8"))
        .flatMap(c => tagsOf(c, "rootfile").headOption)
        .flatMap(attr(_, "full-path"))
      opfPath.flatMap { p =>
        entry(b, es, p).map { opfBytes =>
          val opf = new String(opfBytes, "UTF-8")
          title = tagContent(opf, "dc:title")
          author = tagContent(opf, "dc:creator")
          year = tagContent(opf, "dc:date").map(_.take(4))
            .filter(s => s.length == 4 && s.forall(_.isDigit))
            .map(_.toInt).filter(_ > 0)
          val dir = p.lastIndexOf('/') match {
            case -1 => ""
            case k  => p.substring(0, k + 1)
          }
          val hrefById = tagsOf(opf, "item").flatMap { t =>
            for (id <- attr(t, "id"); href <- attr(t, "href"))
              yield (id, dir + href)
          }.toMap
          tagsOf(opf, "itemref")
            .flatMap(attr(_, "idref"))
            .flatMap(hrefById.get)
        }.filter(_.nonEmpty)
      }.getOrElse {
        // degraded route: every XHTML entry in central-directory order
        es.map(_.name).filter(n =>
          n.endsWith(".xhtml") || n.endsWith(".html"))
      }
    }
    var refused = 0L
    val parts = spineDocs.flatMap { name =>
      entry(b, es, name).flatMap(Html.text).map { h =>
        refused += h.refused
        h.text
      }
    }
    if (parts.isEmpty && title.isEmpty) return None
    Some(DocText("epub", title, author, year,
      parts.filter(_.nonEmpty).mkString("\n"), refused))
  } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------------
  // ODT (OpenDocument text)
  // ------------------------------------------------------------------

  /** OpenDocument body text (content.xml): character data inside
    * `<office:body>` with the ODF whitespace-collapse rule (runs of
    * layout whitespace become one space, dropped at line starts —
    * explicit space runs travel as `<text:s text:c="n"/>`),
    * `</text:p>`/`</text:h>` paragraph breaks, `<text:line-break/>`
    * a break, `<text:tab/>` a space, and `<office:annotation>`
    * subtrees dropped whole (reviewer comments are not document
    * text). Entities through the shared [[Html.entityAt]] boundary.
    */
  private def odtBody(xml: String): (String, Long) = {
    val out = new StringBuilder
    var refused = 0L
    def brk(): Unit = {
      while (out.nonEmpty && out.last == ' ')
        out.setLength(out.length - 1)
      if (out.nonEmpty && out.last != '\n') out += '\n'
    }
    def isTag(tag: String, name: String): Boolean =
      tag.startsWith(name) && (tag.length == name.length || {
        val c = tag.charAt(name.length)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '/'
      })
    var inBody = false
    var i = 0
    val n = xml.length
    while (i < n) {
      val lt = xml.indexOf('<', i)
      if (lt < 0) { i = n }
      else {
        if (inBody && lt > i) {
          val (t, r) = xmlText(xml.substring(i, lt))
          refused += r
          var k = 0
          while (k < t.length) {
            val c = t.charAt(k)
            if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
              if (out.nonEmpty && out.last != ' ' && out.last != '\n')
                out += ' '
            } else out += c
            k += 1
          }
        }
        val gt = xml.indexOf('>', lt)
        if (gt < 0) { i = n }
        else {
          val tag = xml.substring(lt + 1, gt)
          if (isTag(tag, "office:body")) inBody = true
          else if (isTag(tag, "/office:body")) inBody = false
          else if (inBody) {
            if (isTag(tag, "office:annotation") && !tag.endsWith("/")) {
              val end = xml.indexOf("</office:annotation>", gt + 1)
              if (end >= 0) { i = end; () }
              else i = n
            } else if (isTag(tag, "/text:p") || isTag(tag, "/text:h") ||
              isTag(tag, "text:line-break")) brk()
            else if (isTag(tag, "text:tab")) {
              if (out.nonEmpty && out.last != ' ' && out.last != '\n')
                out += ' '
            } else if (isTag(tag, "text:s")) {
              // an EXPLICIT space run: text:c spaces (default 1,
              // capped — a hostile count can't balloon the heap)
              val c = attr(tag, "text:c")
                .flatMap(_.toIntOption).getOrElse(1)
              out ++= " " * math.min(math.max(c, 0), 64)
            }
          }
          if (!(inBody && isTag(tag, "office:annotation") &&
            !tag.endsWith("/"))) i = gt + 1
        }
      }
    }
    brk()
    (out.toString.stripSuffix("\n"), refused)
  }

  /** ODT extraction: the OpenDocument `mimetype` entry gates the
    * format (the OCF discipline EPUB already uses), body from
    * `content.xml`, Dublin Core provenance from `meta.xml`.
    */
  def odtText(b: Array[Byte]): Option[DocText] = try {
    if (!isZip(b)) return None
    val es = entries(b).getOrElse(return None)
    val isOdt = entry(b, es, "mimetype").exists(m =>
      new String(m, "US-ASCII").trim ==
        "application/vnd.oasis.opendocument.text")
    if (!isOdt) return None
    val content = entry(b, es, "content.xml").getOrElse(return None)
    val (body, refused) = odtBody(new String(content, "UTF-8"))
    val meta = entry(b, es, "meta.xml").map(new String(_, "UTF-8"))
    val title = meta.flatMap(tagContent(_, "dc:title"))
    val author = meta.flatMap(tagContent(_, "dc:creator"))
      .orElse(meta.flatMap(tagContent(_, "meta:initial-creator")))
    val year = meta.flatMap(tagContent(_, "meta:creation-date"))
      .map(_.take(4)).filter(s => s.length == 4 && s.forall(_.isDigit))
      .map(_.toInt).filter(_ > 0)
    Some(DocText("odt", title, author, year, body, refused))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Dispatch: DOCX, then EPUB, then ODT. None for any other payload
    * (a plain zip is an ARCHIVE, not a document — it lands the
    * census's container class and its members flow through
    * [[zipDocs]] instead).
    */
  def text(b: Array[Byte]): Option[DocText] =
    docxText(b).orElse(epubText(b)).orElse(odtText(b))

  /** Member listing WITHOUT the document probe — for callers that
    * have already established the payload is a plain archive (the
    * census calls this after its own [[text]] miss; re-probing would
    * pay the three-format zip+XML walk twice per archive).
    */
  private[ext] def zipMembersRaw(b: Array[Byte])
      : Option[Seq[(String, Array[Byte])]] = try {
    if (!isZip(b)) return None
    entries(b).map(_.flatMap(e =>
      entryData(b, e).map(d => (e.name, d))))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Plain-zip member listing (name, bytes) in central-directory
    * order — None when the bytes are not a zip OR when they are one
    * of the zip-branded document formats (those are documents, not
    * archives; [[text]] owns them).
    */
  def zipMembers(b: Array[Byte]): Option[Seq[(String, Array[Byte])]] =
    try {
      if (!isZip(b) || text(b).isDefined) return None
      zipMembersRaw(b)
    } catch { case scala.util.control.NonFatal(_) => None }

  /** ZIP archive → clean documents (the [[Tar.docTable]] shape): one
    * row per member the shared [[Documents.dispatch]] recognizes —
    * (doc_id, member_idx, name, text, refused); one batched map, no
    * shuffle, ONE document probe per archive.
    */
  def zipDocTable(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val members =
          if (b == null || !isZip(b) || text(b).isDefined) Nil
          else zipMembersRaw(b).getOrElse(Nil)
        members.zipWithIndex.flatMap { case ((name, data), i) =>
          Documents.dispatch(data).map { case (text, refused) =>
            (id, i, name, text, refused)
          }
        }
      }
      .toDF("doc_id", "member_idx", "name", "text", "refused")
  }

  /** Document rows for a media corpus: (doc_id, kind, title, author,
    * year, text, refused) — one batched map.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        text(b).map(d =>
          (id, d.kind, d.title, d.author, d.year, d.text, d.refused))
      }
      .toDF("doc_id", "kind", "title", "author", "year", "text",
        "refused")
  }

  // ------------------------------------------------------------------
  // Fixture writers
  // ------------------------------------------------------------------

  /** A REAL zip: local headers with correct CRC-32s (java.util.zip),
    * deflate (raw) or stored entries, central directory, EOCD.
    */
  def zipWrap(entries: Seq[(String, Array[Byte])],
      stored: Boolean = false, comment: String = ""): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(k =>
      out.write(((v >> (8 * k)) & 0xff).toInt))
    val central = new java.io.ByteArrayOutputStream()
    def c16(v: Int): Unit = { central.write(v & 0xff); central.write((v >> 8) & 0xff) }
    def c32(v: Long): Unit = (0 until 4).foreach(k =>
      central.write(((v >> (8 * k)) & 0xff).toInt))
    entries.foreach { case (name, data) =>
      val crc = new java.util.zip.CRC32()
      crc.update(data)
      val packed =
        if (stored) data
        else {
          val df = new java.util.zip.Deflater(
            java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
          df.setInput(data); df.finish()
          val o = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](4096)
          while (!df.finished()) o.write(buf, 0, df.deflate(buf))
          df.end()
          o.toByteArray
        }
      val method = if (stored) 0 else 8
      val nameB = name.getBytes("UTF-8")
      val localOff = out.size()
      out.write(Array[Byte]('P', 'K', 3, 4))
      w16(20); w16(0); w16(method); w16(0); w16(0)
      w32(crc.getValue); w32(packed.length.toLong); w32(data.length.toLong)
      w16(nameB.length); w16(0)
      out.write(nameB); out.write(packed)
      central.write(Array[Byte]('P', 'K', 1, 2))
      c16(20); c16(20); c16(0); c16(method); c16(0); c16(0)
      c32(crc.getValue); c32(packed.length.toLong); c32(data.length.toLong)
      c16(nameB.length); c16(0); c16(0); c16(0); c16(0)
      c32(0); c32(localOff.toLong)
      central.write(nameB)
    }
    val cd = central.toByteArray
    val cdOff = out.size()
    out.write(cd)
    out.write(Array[Byte]('P', 'K', 5, 6))
    w16(0); w16(0); w16(entries.length); w16(entries.length)
    w32(cd.length.toLong); w32(cdOff.toLong)
    val cb = comment.getBytes("UTF-8")
    w16(cb.length); out.write(cb)
    out.toByteArray
  }

  private def xmlEsc(s: String): String = s.flatMap {
    case '&' => "&amp;"
    case '<' => "&lt;"
    case '>' => "&gt;"
    case '"' => "&quot;"
    case c   => c.toString
  }

  /** Fixture DOCX: one `<w:p>` of `<w:r><w:t>` runs per paragraph
    * (runs split mid-paragraph to pin run concatenation), plus the
    * Dublin Core properties part.
    */
  def encodeDocx(paragraphs: Seq[String], title: String = null,
      author: String = null, createdYear: Int = 0,
      stored: Boolean = false): Array[Byte] = {
    require(paragraphs.nonEmpty, "encodeDocx: paragraphs")
    val body = paragraphs.map { p =>
      val cut = p.length / 2
      s"<w:p><w:r><w:t xml:space=\"preserve\">${xmlEsc(p.take(cut))}" +
        s"</w:t></w:r><w:r><w:t xml:space=\"preserve\">" +
        s"${xmlEsc(p.drop(cut))}</w:t></w:r></w:p>"
    }.mkString
    val doc = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<w:document xmlns:w=\"http://schemas.openxmlformats.org/" +
      "wordprocessingml/2006/main\"><w:body>" + body +
      "</w:body></w:document>"
    val core = "<?xml version=\"1.0\"?><cp:coreProperties " +
      "xmlns:cp=\"http://schemas.openxmlformats.org/package/2006/" +
      "metadata/core-properties\" xmlns:dc=\"http://purl.org/dc/" +
      "elements/1.1/\" xmlns:dcterms=\"http://purl.org/dc/terms/\">" +
      Option(title).map(t => s"<dc:title>${xmlEsc(t)}</dc:title>")
        .getOrElse("") +
      Option(author).map(a => s"<dc:creator>${xmlEsc(a)}</dc:creator>")
        .getOrElse("") +
      (if (createdYear > 0)
        s"<dcterms:created>$createdYear-01-02T03:04:05Z</dcterms:created>"
      else "") +
      "</cp:coreProperties>"
    val types = "<?xml version=\"1.0\"?><Types xmlns=\"http://schemas" +
      ".openxmlformats.org/package/2006/content-types\"/>"
    zipWrap(Seq(
      ("[Content_Types].xml", types.getBytes("UTF-8")),
      ("word/document.xml", doc.getBytes("UTF-8")),
      ("docProps/core.xml", core.getBytes("UTF-8"))), stored = stored)
  }

  /** Fixture EPUB: mimetype (stored-style content but compression is
    * irrelevant to the reader), container.xml, OPF with manifest +
    * spine, one XHTML chapter per entry. `scrambleOrder` stores the
    * chapter entries in REVERSE zip order so only the spine can
    * sequence them correctly.
    */
  def encodeEpub(chapters: Seq[(String, Seq[String])],
      title: String = null, author: String = null, year: Int = 0,
      scrambleOrder: Boolean = false): Array[Byte] = {
    require(chapters.nonEmpty, "encodeEpub: chapters")
    val container = "<?xml version=\"1.0\"?><container version=\"1.0\" " +
      "xmlns=\"urn:oasis:names:tc:opendocument:xmlns:container\">" +
      "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
      "media-type=\"application/oebps-package+xml\"/></rootfiles>" +
      "</container>"
    val items = chapters.indices.map(i =>
      s"<item id=\"c$i\" href=\"ch$i.xhtml\" " +
        "media-type=\"application/xhtml+xml\"/>").mkString
    val refs = chapters.indices.map(i =>
      s"<itemref idref=\"c$i\"/>").mkString
    val opf = "<?xml version=\"1.0\"?><package xmlns=\"http://www.idpf" +
      ".org/2007/opf\" version=\"3.0\"><metadata xmlns:dc=\"http://" +
      "purl.org/dc/elements/1.1/\">" +
      Option(title).map(t => s"<dc:title>${xmlEsc(t)}</dc:title>")
        .getOrElse("") +
      Option(author).map(a => s"<dc:creator>${xmlEsc(a)}</dc:creator>")
        .getOrElse("") +
      (if (year > 0) s"<dc:date>$year-01-02</dc:date>" else "") +
      s"</metadata><manifest>$items</manifest><spine>$refs</spine>" +
      "</package>"
    val chapterEntries = chapters.zipWithIndex.map { case ((h, ps), i) =>
      val body = ps.map(p => s"<p>${xmlEsc(p)}</p>").mkString
      (s"OEBPS/ch$i.xhtml",
        ("<?xml version=\"1.0\" encoding=\"UTF-8\"?><html xmlns=\"" +
          "http://www.w3.org/1999/xhtml\"><head><title>" + xmlEsc(h) +
          "</title></head><body><h2>" + xmlEsc(h) + "</h2>" + body +
          "</body></html>").getBytes("UTF-8"))
    }
    val ordered =
      if (scrambleOrder) chapterEntries.reverse else chapterEntries
    zipWrap(Seq(
      ("mimetype", "application/epub+zip".getBytes("US-ASCII")),
      ("META-INF/container.xml", container.getBytes("UTF-8")),
      ("OEBPS/content.opf", opf.getBytes("UTF-8"))) ++ ordered)
  }

  /** Fixture ODT: mimetype, content.xml (one text:p per paragraph,
    * each split across a styled text:span so span boundaries are
    * exercised), meta.xml Dublin Core provenance.
    */
  def encodeOdt(paragraphs: Seq[String], title: String = null,
      author: String = null, createdYear: Int = 0,
      stored: Boolean = false): Array[Byte] = {
    require(paragraphs.nonEmpty, "encodeOdt: paragraphs")
    val body = paragraphs.map { p =>
      val cut = p.length / 2
      s"<text:p>${xmlEsc(p.take(cut))}<text:span text:style-name=" +
        s""""T1">${xmlEsc(p.drop(cut))}</text:span></text:p>"""
    }.mkString
    val content = "<?xml version=\"1.0\" encoding=\"UTF-8\"?>" +
      "<office:document-content xmlns:office=\"urn:oasis:names:tc:" +
      "opendocument:xmlns:office:1.0\" xmlns:text=\"urn:oasis:names:" +
      "tc:opendocument:xmlns:text:1.0\"><office:body><office:text>" +
      body + "</office:text></office:body></office:document-content>"
    val meta = "<?xml version=\"1.0\"?><office:document-meta " +
      "xmlns:office=\"urn:oasis:names:tc:opendocument:xmlns:office:" +
      "1.0\" xmlns:dc=\"http://purl.org/dc/elements/1.1/\" " +
      "xmlns:meta=\"urn:oasis:names:tc:opendocument:xmlns:meta:1.0\">" +
      "<office:meta>" +
      Option(title).map(t => s"<dc:title>${xmlEsc(t)}</dc:title>")
        .getOrElse("") +
      Option(author).map(a => s"<dc:creator>${xmlEsc(a)}</dc:creator>")
        .getOrElse("") +
      (if (createdYear > 0)
        s"<meta:creation-date>$createdYear-01-02T03:04:05</meta" +
          ":creation-date>"
      else "") +
      "</office:meta></office:document-meta>"
    zipWrap(Seq(
      ("mimetype", "application/vnd.oasis.opendocument.text"
        .getBytes("US-ASCII")),
      ("content.xml", content.getBytes("UTF-8")),
      ("meta.xml", meta.getBytes("UTF-8"))), stored = stored)
  }
}
