package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** [EXT] TAR archive extraction (POSIX ustar, the public header
  * layout) — the bulk-dump format research corpora ship in (arXiv
  * source dumps, dataset tarballs). Everything is container math:
  *
  *  - 512-byte header blocks: name (100 bytes, NUL-padded), size
  *    (12-byte octal), typeflag, the `ustar` magic at offset 257;
  *    data occupies ceil(size/512) blocks; two zero blocks end the
  *    archive (a truncated archive just ends — the walk stops, never
  *    shifts). GNU long-name (`L`) entries resolve the following
  *    member's name; the ustar prefix field joins with `/`.
  *  - `.tar.gz` unwraps through the JDK gzip stream (byte-capped).
  *  - [[docTable]] routes regular-file members through the shared
  *    [[Documents.dispatch]] — archive member → corpus text with the
  *    per-document refused counters intact.
  *
  * Every offset/size is validated; member counts capped. Scale
  * shape: [[table]]/[[docTable]] are one batched map over the media
  * column — rows per member, no shuffle, no driver collect.
  */
object Tar {

  final case class Entry(name: String, data: Array[Byte])

  private def isGzip(b: Array[Byte]): Boolean = Warc.isGzip(b)

  private def hasUstar(b: Array[Byte]): Boolean =
    b.length >= 512 && b(257) == 'u' && b(258) == 's' &&
      b(259) == 't' && b(260) == 'a' && b(261) == 'r'

  def isTar(b: Array[Byte]): Boolean = {
    if (b == null || b.length < 18) return false // a .tar.gz of a
    if (hasUstar(b)) return true // mostly-zero archive can be tiny
    // .tar.gz: inflate just the first header block for the magic
    isGzip(b) && (try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b), 1024)
      val h = new Array[Byte](512)
      var n = 0
      var eof = false
      while (n < 512 && !eof) {
        val g = in.read(h, n, 512 - n)
        if (g < 0) eof = true else n += g
      }
      in.close()
      n == 512 && hasUstar(h)
    } catch { case scala.util.control.NonFatal(_) => false })
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    var v = 0L
    var i = off
    val end = off + len
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < end && b(i) >= '0' && b(i) <= '7' && v < (1L << 40)) {
      v = v * 8 + (b(i) - '0')
      i += 1
    }
    v
  }

  private def str(b: Array[Byte], off: Int, len: Int): String = {
    var e = off
    val end = off + len
    while (e < end && b(e) != 0) e += 1
    new String(b, off, e - off, "UTF-8")
  }

  /** Regular-file members in archive order. None when the bytes
    * aren't a tar (gzipped or plain).
    */
  def entries(b: Array[Byte]): Option[Seq[Entry]] = try {
    if (!isTar(b)) return None
    val data = if (isGzip(b)) Warc.gunzip(b, 1 << 27)
      .getOrElse(return None) else b
    val out = Seq.newBuilder[Entry]
    var off = 0
    var count = 0
    var longName: String = null
    var stop = false
    while (!stop && off + 512 <= data.length && count < 65536) {
      if (data(off) == 0) { stop = true } // end-of-archive zero block
      else {
        val size = octal(data, off + 124, 12)
        val typeflag = data(off + 156)
        val dataOff = off + 512
        if (size < 0 || dataOff + size > data.length) { stop = true }
        else {
          if (typeflag == 'L') {
            // GNU long name: the data IS the next member's name
            longName = str(data, dataOff, size.toInt)
          } else if (typeflag == '0' || typeflag == 0) {
            val prefix = str(data, off + 345, 155)
            val base = str(data, off, 100)
            val name =
              if (longName != null) longName
              else if (prefix.nonEmpty) prefix + "/" + base
              else base
            longName = null
            out += Entry(name, java.util.Arrays.copyOfRange(
              data, dataOff, dataOff + size.toInt))
            count += 1
          } else longName = null // dirs/links/pax: skipped
          off = dataOff + ((size + 511) / 512).toInt * 512
        }
      }
    }
    val es = out.result()
    if (es.isEmpty) None else Some(es)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Member rows: (doc_id, member_idx, name, byte_len). */
  def table(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        entries(b).toSeq.flatten.zipWithIndex.map { case (e, k) =>
          (id, k, e.name, e.data.length)
        }
      }
      .toDF("doc_id", "member_idx", "name", "byte_len")
  }

  /** Archive → clean documents: members through the shared
    * [[Documents.dispatch]]. Rows: (doc_id, member_idx, name, text,
    * refused); non-document members contribute nothing.
    */
  def docTable(s: SparkSession, media: DataFrame): DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        entries(b).toSeq.flatten.zipWithIndex.flatMap { case (e, k) =>
          Documents.dispatch(e.data).map { case (text, refused) =>
            (id, k, e.name, text, refused)
          }
        }
      }
      .toDF("doc_id", "member_idx", "name", "text", "refused")
  }

  /** Fixture writer: a real ustar archive (correct checksums, prefix
    * field unused, optional GNU long-name entries, optional whole-
    * archive gzip).
    */
  def encode(members: Seq[(String, Array[Byte])],
      gzipAll: Boolean = false): Array[Byte] = {
    require(members.nonEmpty, "encode: members")
    val out = new java.io.ByteArrayOutputStream()
    def header(name: String, size: Int, typeflag: Byte): Array[Byte] = {
      val h = new Array[Byte](512)
      val nb = name.getBytes("UTF-8")
      System.arraycopy(nb, 0, h, 0, math.min(nb.length, 100))
      def oct(v: Long, off: Int, len: Int): Unit = {
        val s = java.lang.Long.toOctalString(v)
        val pad = "0" * (len - 1 - s.length) + s
        System.arraycopy(pad.getBytes("US-ASCII"), 0, h, off, len - 1)
      }
      oct(420, 100, 8) // 0644
      oct(0, 108, 8); oct(0, 116, 8)
      oct(size.toLong, 124, 12)
      oct(0, 136, 12)
      h(156) = typeflag
      "ustar".getBytes("US-ASCII").copyToArray(h, 257)
      h(263) = '0'; h(264) = '0' // version
      // checksum: spaces while summing, then octal + NUL + space
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = h.map(_ & 0xff).sum
      val cs = java.lang.Long.toOctalString(sum.toLong)
      val pad = "0" * (6 - cs.length) + cs
      System.arraycopy(pad.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      h
    }
    members.foreach { case (name, data) =>
      if (name.getBytes("UTF-8").length > 100) {
        // GNU long-name entry precedes the member
        val nb = name.getBytes("UTF-8")
        out.write(header("././@LongLink", nb.length, 'L'))
        out.write(nb)
        // pad guard: a name of exactly N*512 bytes must not emit a
        // full zero block (the reader would read end-of-archive)
        if (nb.length % 512 != 0)
          out.write(new Array[Byte](512 - nb.length % 512))
        out.write(header(name.take(100), data.length, '0'))
      } else out.write(header(name, data.length, '0'))
      out.write(data)
      val rem = data.length % 512
      if (rem != 0) out.write(new Array[Byte](512 - rem))
    }
    out.write(new Array[Byte](1024)) // two zero blocks
    val plain = out.toByteArray
    if (!gzipAll) plain
    else {
      val o = new java.io.ByteArrayOutputStream()
      val gz = new java.util.zip.GZIPOutputStream(o)
      gz.write(plain); gz.close()
      o.toByteArray
    }
  }
}
