package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] PNG textual-metadata extraction (tEXt / zTXt / iTXt) — the
  * image heap's in-band provenance channel alongside EXIF. Exporters
  * and generators write Software/Comment/Author keywords here, and
  * image-generation tools ship their full prompt/config blobs in a
  * tEXt or iTXt chunk ("parameters" and friends), so a curation
  * pipeline needs this channel to attribute, filter, and screen
  * synthetic images at corpus scale.
  *
  * All three carriers per the PNG spec (ISO 15948 §11.3.4):
  *  - `tEXt`: keyword NUL value, both Latin-1.
  *  - `zTXt`: keyword NUL method(0 = zlib deflate) compressed value;
  *    inflated through the JDK (byte-capped — a hostile chunk cannot
  *    balloon the heap), Latin-1.
  *  - `iTXt`: keyword NUL compressed-flag compression-method
  *    language-tag NUL translated-keyword NUL value, value UTF-8
  *    (zlib-deflated when the flag is 1).
  *
  * Chunks walk through the CRC-gated layout: a chunk whose CRC fails
  * is SKIPPED (never a corrupted guess), a structurally malformed
  * text payload (no NUL, empty or >79-byte keyword, unknown method)
  * is skipped, and the walk itself stops at the first size violation
  * — the [[Multimodal.ContainerCodec]] discipline.
  *
  * Scale shape: [[table]] is one batched map over the media column;
  * rows explode per chunk, no shuffle, no driver collect.
  */
object PngText {

  /** One textual chunk: `lang` is the iTXt language tag (None for
    * tEXt/zTXt), `compressed` marks zTXt and deflated iTXt.
    */
  final case class PngTextRow(keyword: String, text: String,
      lang: Option[String], compressed: Boolean)

  private val InflateCap = 1 << 22 // 4 MiB of metadata text is plenty

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def inflate(b: Array[Byte], off: Int, len: Int)
      : Option[Array[Byte]] = try {
    val inf = new java.util.zip.Inflater()
    inf.setInput(b, off, len)
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var total = 0
    while (!inf.finished() && total <= InflateCap) {
      val n = inf.inflate(buf)
      if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
        inf.end(); return None // truncated / preset-dictionary stream
      }
      out.write(buf, 0, n)
      total += n
    }
    inf.end()
    if (total > InflateCap) None else Some(out.toByteArray)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** All textual chunks of a PNG in file order; None when the bytes
    * are not a PNG.
    */
  def chunks(b: Array[Byte]): Option[Seq[PngTextRow]] = try {
    if (b == null || !Multimodal.ContainerCodec.isPng(b)) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[PngTextRow]
    var o = 8
    var go = true
    while (go && o + 12 <= b.length) {
      val len = u32(b, o)
      if (len > b.length - o - 12) go = false
      else {
        val id = new String(b, o + 4, 4, "US-ASCII")
        val dOff = o + 8
        val dLen = len.toInt
        if (id == "tEXt" || id == "zTXt" || id == "iTXt") {
          val crc = new java.util.zip.CRC32
          crc.update(b, o + 4, 4 + dLen)
          if (crc.getValue == u32(b, dOff + dLen))
            parse(id, b, dOff, dLen).foreach(out += _)
        }
        if (id == "IEND") go = false
        o = dOff + dLen + 4
      }
    }
    Some(out.toSeq)
  } catch { case scala.util.control.NonFatal(_) => None }

  private def parse(id: String, b: Array[Byte], off: Int, len: Int)
      : Option[PngTextRow] = {
    var nul = -1
    var i = off
    while (nul < 0 && i < off + len) {
      if (b(i) == 0) nul = i
      i += 1
    }
    if (nul < 0) return None
    val kLen = nul - off
    if (kLen < 1 || kLen > 79) return None
    val keyword = new String(b, off, kLen, "ISO-8859-1")
    id match {
      case "tEXt" =>
        Some(PngTextRow(keyword,
          new String(b, nul + 1, off + len - nul - 1, "ISO-8859-1"),
          None, compressed = false))
      case "zTXt" =>
        if (nul + 2 > off + len || b(nul + 1) != 0) None // method 0 only
        else inflate(b, nul + 2, off + len - nul - 2).map(v =>
          PngTextRow(keyword, new String(v, "ISO-8859-1"), None,
            compressed = true))
      case _ => // iTXt
        if (nul + 3 > off + len) return None
        val flag = b(nul + 1) & 0xff
        val method = b(nul + 2) & 0xff
        if (flag > 1 || (flag == 1 && method != 0)) return None
        var n2 = -1
        var j = nul + 3
        while (n2 < 0 && j < off + len) {
          if (b(j) == 0) n2 = j
          j += 1
        }
        if (n2 < 0) return None
        val lang = new String(b, nul + 3, n2 - nul - 3, "US-ASCII")
        var n3 = -1
        j = n2 + 1
        while (n3 < 0 && j < off + len) {
          if (b(j) == 0) n3 = j
          j += 1
        }
        if (n3 < 0) return None
        val vOff = n3 + 1
        val vLen = off + len - vOff
        val value =
          if (flag == 1) inflate(b, vOff, vLen)
            .map(new String(_, "UTF-8")).getOrElse(return None)
          else new String(b, vOff, vLen, "UTF-8")
        Some(PngTextRow(keyword, value,
          if (lang.isEmpty) None else Some(lang), flag == 1))
    }
  }

  /** Text-chunk rows for a media corpus: (doc_id, chunk_idx, keyword,
    * lang, compressed, text) — one batched map, rows explode per
    * chunk, non-PNG payloads contribute nothing.
    */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        chunks(b).getOrElse(Nil).zipWithIndex.map { case (c, i) =>
          (id, i, c.keyword, c.lang, c.compressed, c.text)
        }
      }
      .toDF("doc_id", "chunk_idx", "keyword", "lang", "compressed",
        "text")
  }

  // ------------------------------------------------------------------
  // Fixture writer
  // ------------------------------------------------------------------

  /** Insert textual chunks right after IHDR (correct CRCs): each
    * spec is (keyword, text, lang, compressed) — lang null for
    * tEXt/zTXt; compressed selects zTXt (lang null) or deflated
    * iTXt (lang non-null).
    */
  def withText(png: Array[Byte],
      specs: Seq[(String, String, String, Boolean)]): Array[Byte] = {
    require(Multimodal.ContainerCodec.isPng(png) && png.length >= 33,
      "withText: not a PNG")
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, 33) // signature + IHDR
    def be32(v: Long): Unit =
      out.write(Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte))
    def deflate(v: Array[Byte]): Array[Byte] = {
      val d = new java.util.zip.Deflater()
      d.setInput(v); d.finish()
      val buf = new Array[Byte](v.length * 2 + 64)
      val n = d.deflate(buf)
      d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    for ((kw, text, lang, comp) <- specs) {
      val body: Array[Byte] =
        if (lang == null && !comp)
          "tEXt".getBytes("US-ASCII") ++
            kw.getBytes("ISO-8859-1") ++ Array[Byte](0) ++
            text.getBytes("ISO-8859-1")
        else if (lang == null)
          "zTXt".getBytes("US-ASCII") ++
            kw.getBytes("ISO-8859-1") ++ Array[Byte](0, 0) ++
            deflate(text.getBytes("ISO-8859-1"))
        else {
          val v = text.getBytes("UTF-8")
          "iTXt".getBytes("US-ASCII") ++
            kw.getBytes("ISO-8859-1") ++
            Array[Byte](0, if (comp) 1 else 0, 0) ++
            lang.getBytes("US-ASCII") ++ Array[Byte](0) ++
            Array[Byte](0) ++ // empty translated keyword
            (if (comp) deflate(v) else v)
        }
      be32(body.length - 4L)
      out.write(body)
      val crc = new java.util.zip.CRC32; crc.update(body)
      be32(crc.getValue)
    }
    out.write(png, 33, png.length - 33)
    out.toByteArray
  }
}
