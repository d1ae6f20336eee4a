package graft.ext

/** Audio PROVENANCE extraction — the [[Multimodal.ContainerCodec]]
  * EXIF analog for the audio heap, from the public tag layouts:
  * ID3v2.3/2.4 (id3.org informal standards), FLAC VORBIS_COMMENT and
  * PICTURE metadata blocks (RFC 9639 sections 8.6/8.8), the
  * Ogg-Vorbis comment header (Vorbis I section 5), including the
  * METADATA_BLOCK_PICTURE field (base64 of the FLAC PICTURE
  * structure), and the MP4-family iTunes `ilst` atoms
  * (moov/udta/meta/ilst per ISO/IEC 14496-12 box grammar — the
  * M4A/AAC/ALAC and MP4-video metadata carrier, the most common after
  * ID3), Matroska/WebM Tags + Attachments (SimpleTag name/string
  * pairs and attached cover art per the public Matroska element
  * registry — the EBML heap's carrier), and APEv1/v2 trailer tags
  * (the Monkey's-Audio-era ripper footer, found before an ID3v1
  * block when both are stacked). One container-independent row
  * shape, so the same recording tagged through any envelope lands the
  * identical provenance — and the embedded COVER ART crosses into the
  * image surface: the extracted bytes are the original image file, so
  * its perceptual hash pairs with the standalone artwork (the
  * cross-modal dedup class the cover gate pins).
  *
  * ID3v2.2 (three-byte TP1/TT2/TAL/TYE/PIC frames, the old-iTunes-rip
  * vintage) and the UNSYNCHRONISATION scheme (whole-tag FF-00
  * de-stuffing for v2.2/v2.3, per-frame for v2.4 with the data-length
  * indicator skip) both parse since r14. Boundaries (refuse, never
  * mis-parse): compressed/encrypted frames and the v2.2 compression
  * header bit (no scheme was ever standardized — the spec's own rule
  * is "ignore the tag") return None for the affected scope; text
  * encodings 0 (latin-1), 1 (UTF-16 with BOM) and 3 (UTF-8) are
  * decoded, 2 (UTF-16BE) reads as UTF-16 without a BOM.
  */
object AudioTags {

  /** One provenance row; `cover` is the embedded image file verbatim,
    * `lyrics` the embedded full-text transcript (ID3v2 USLT/ULT,
    * Vorbis-comment LYRICS/UNSYNCEDLYRICS, M4A `©lyr`) — the audio
    * heap's in-band TEXT modality.
    */
  final case class Tags(
      artist: Option[String],
      title: Option[String],
      album: Option[String],
      year: Option[Int],
      cover: Option[Array[Byte]],
      lyrics: Option[String] = None) {
    def nonEmpty: Boolean =
      artist.nonEmpty || title.nonEmpty || album.nonEmpty ||
        year.nonEmpty || cover.nonEmpty || lyrics.nonEmpty
  }

  private val Empty = Tags(None, None, None, None, None)

  /** Container dispatch: ID3v2 prologue (any carrier), FLAC metadata
    * blocks, Ogg-Vorbis comment packet. None when the payload carries
    * no recognizable tag structure.
    */
  /** The ID3v2 tag bytes of a payload, whatever carried them: the
    * raw prologue, the AIFF 'ID3 ' chunk, or the RIFF 'id3 '/'ID3 '
    * chunk — ONE dispatch shared by [[of]] and [[syncedLyrics]].
    */
  private def id3Body(b: Array[Byte]): Option[Array[Byte]] =
    if (b(0) == 'I' && b(1) == 'D' && b(2) == '3') Some(b)
    else if (Aiff.isAiff(b)) // the 'ID3 ' chunk AIFF taggers write
      iffChunk(b, 12, "ID3 ", bigEndian = true)
    else if (Multimodal.ContainerCodec.isWav(b)) // RIFF 'id3 ' chunk
      iffChunk(b, 12, "id3 ", bigEndian = false)
        .orElse(iffChunk(b, 12, "ID3 ", bigEndian = false))
    else None

  def of(b: Array[Byte]): Option[Tags] = try {
    if (b == null || b.length < 10) return None
    val t = id3Body(b).map(id3v2).getOrElse {
      if (Flac.isFlac(b)) flacTags(b)
      else if (Vorbis.isOggVorbis(b)) vorbisTags(b)
      else if (Multimodal.ContainerCodec.isMp4(b)) // iTunes ilst
        mp4Tags(b)
      else if (Multimodal.ContainerCodec.isEbml(b)) // Matroska Tags
        mkvTags(b)
      else Empty
    }
    // trailer fallbacks when nothing richer matched: APEv2 first (the
    // Monkey's-Audio-era ripper tag, richer), then the 128-byte ID3v1
    // "TAG" block — the two footers old MP3 rips carry
    val t2 = if (t.nonEmpty) t else apeTags(b)
    val t3 = if (t2.nonEmpty) t2 else id3v1(b)
    if (t3.nonEmpty) Some(t3) else None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** APEv1/v2 trailer tag (the public Monkey's Audio tag layout):
    * a 32-byte footer at EOF — or just before an ID3v1 trailer —
    * ("APETAGEX", version u32le 1000/2000, size u32le of items+footer,
    * item count, flags, 8 reserved), items walked forward from
    * footerEnd - size: value length u32le, item flags u32le (bits 1-2:
    * 0 text UTF-8, 1 binary), nul-terminated ASCII key, value. Keys
    * are case-insensitive; "Cover Art (Front)" is binary with a
    * nul-terminated filename prefixed to the image bytes. Every size
    * is validated against the enclosing range — malformed tags return
    * Empty, never a shifted parse.
    */
  private def apeTags(b: Array[Byte]): Tags = {
    def footerAt(end: Int): Int = {
      val o = end - 32
      if (o < 0) return -1
      val pre = new String(b, o, 8, "ISO-8859-1")
      if (pre == "APETAGEX") o else -1
    }
    var fo = footerAt(b.length)
    if (fo < 0 && b.length >= 128 &&
      b(b.length - 128) == 'T' && b(b.length - 127) == 'A' &&
      b(b.length - 126) == 'G')
      fo = footerAt(b.length - 128)
    if (fo < 0) return Empty
    val version = u32le(b, fo + 8)
    if (version != 1000L && version != 2000L) return Empty
    val size = u32le(b, fo + 12).toInt
    val items = u32le(b, fo + 16).toInt
    if (size < 32 || items < 0 || items > 1024) return Empty
    val start = fo + 32 - size
    if (start < 0) return Empty
    var artist, title, album: Option[String] = None
    var year: Option[Int] = None
    var cover: Option[Array[Byte]] = None
    var lyrics: Option[String] = None
    var off = start
    var i = 0
    while (i < items && off + 8 <= fo) {
      val len = u32le(b, off).toInt
      val flags = u32le(b, off + 4)
      var ko = off + 8
      while (ko < fo && b(ko) != 0) ko += 1
      if (ko >= fo) return Tags(artist, title, album, year, cover, lyrics)
      val key = new String(b, off + 8, ko - (off + 8), "ISO-8859-1")
        .toLowerCase(java.util.Locale.ROOT)
      val vo = ko + 1
      // bound check without `vo + len`: a len just under 2^31 wraps
      // the sum negative and slips past `ve > fo`, then new String
      // throws and the NonFatal catch discards the whole tag instead
      // of stopping at the malformed item
      if (len < 0 || len > fo - vo) return Tags(artist, title, album, year, cover, lyrics)
      val ve = vo + len
      val isText = ((flags >> 1) & 3) == 0
      def txt = new String(b, vo, len, "UTF-8")
      key match {
        case "artist" if isText => artist = artist.orElse(Some(txt))
        case "title" if isText  => title = title.orElse(Some(txt))
        case "album" if isText  => album = album.orElse(Some(txt))
        case "year" if isText =>
          year = year.orElse(txt.take(4).toIntOption.filter(_ > 0))
        case "lyrics" if isText => lyrics = lyrics.orElse(Some(txt))
        case "cover art (front)" if !isText && cover.isEmpty =>
          // nul-terminated filename, then the image bytes verbatim
          var p = vo
          while (p < ve && b(p) != 0) p += 1
          if (p + 1 < ve)
            cover = Some(java.util.Arrays.copyOfRange(b, p + 1, ve))
        case _ => ()
      }
      off = ve
      i += 1
    }
    Tags(artist, title, album, year, cover, lyrics)
  }

  /** Fixture writer: append an APEv2 tag (header + items + footer,
    * the layout Monkey's Audio-era rippers write) to any payload.
    */
  def apeWrap(audio: Array[Byte], artist: String = null,
      title: String = null, album: String = null, year: Int = 0,
      cover: Array[Byte] = null, lyrics: String = null): Array[Byte] = {
    val items = new java.io.ByteArrayOutputStream()
    var count = 0
    def le32(o: java.io.ByteArrayOutputStream, v: Long): Unit =
      (0 until 4).foreach(k => o.write(((v >> (8 * k)) & 0xff).toInt))
    def item(key: String, value: Array[Byte], binary: Boolean): Unit = {
      le32(items, value.length.toLong)
      le32(items, if (binary) 2L else 0L)
      items.write(key.getBytes("ISO-8859-1")); items.write(0)
      items.write(value)
      count += 1
    }
    if (artist != null) item("Artist", artist.getBytes("UTF-8"), false)
    if (title != null) item("Title", title.getBytes("UTF-8"), false)
    if (album != null) item("Album", album.getBytes("UTF-8"), false)
    if (year > 0) item("Year", year.toString.getBytes("UTF-8"), false)
    if (lyrics != null) item("Lyrics", lyrics.getBytes("UTF-8"), false)
    if (cover != null)
      item("Cover Art (Front)",
        "cover.png".getBytes("ISO-8859-1") ++ Array[Byte](0) ++ cover,
        binary = true)
    val body = items.toByteArray
    val size = body.length + 32L // items + footer, excluding header
    def block(isHeader: Boolean): Array[Byte] = {
      val o = new java.io.ByteArrayOutputStream()
      o.write("APETAGEX".getBytes("ISO-8859-1"))
      le32(o, 2000L)
      le32(o, size)
      le32(o, count.toLong)
      le32(o, (1L << 31) | (if (isHeader) 1L << 29 else 0L))
      o.write(new Array[Byte](8))
      o.toByteArray
    }
    val out = new java.io.ByteArrayOutputStream()
    out.write(audio)
    out.write(block(isHeader = true))
    out.write(body)
    out.write(block(isHeader = false))
    out.toByteArray
  }

  /** ID3v1: fixed 128-byte trailer — title/artist/album 30 bytes
    * each (space- or nul-padded latin-1), year 4 digits.
    */
  private def id3v1(b: Array[Byte]): Tags = {
    val o = b.length - 128
    if (o < 0 || b(o) != 'T' || b(o + 1) != 'A' || b(o + 2) != 'G')
      return Empty
    def field(off: Int, len: Int): Option[String] = {
      val s = new String(b, o + off, len, "ISO-8859-1")
        .takeWhile(_ != '\u0000').trim
      if (s.isEmpty) None else Some(s)
    }
    Tags(field(33, 30), field(3, 30), field(63, 30),
      field(93, 4).flatMap(_.toIntOption), None)
  }

  /** Fixture writer: append an ID3v1 trailer. */
  def id3v1Wrap(audio: Array[Byte], artist: String = "",
      title: String = "", album: String = "", year: Int = 0)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(audio)
    out.write("TAG".getBytes("US-ASCII"))
    def field(s: String, len: Int): Unit = {
      val raw = s.getBytes("ISO-8859-1").take(len)
      out.write(raw)
      out.write(new Array[Byte](len - raw.length))
    }
    field(title, 30)
    field(artist, 30)
    field(album, 30)
    field(if (year > 0) year.toString else "", 4)
    out.write(new Array[Byte](30 + 1)) // comment + genre
    out.toByteArray
  }

  /** First `id` chunk payload in a FORM/RIFF chunk sequence starting
    * at `off0` (AIFF sizes big-endian, RIFF little-endian; both pad
    * chunks to even).
    */
  private def iffChunk(b: Array[Byte], off0: Int, id: String,
      bigEndian: Boolean): Option[Array[Byte]] = {
    var off = off0
    while (off + 8 <= b.length) {
      val cid = new String(b, off, 4, "US-ASCII")
      val sz = (if (bigEndian) u32be(b, off + 4) else u32le(b, off + 4))
        .toInt
      val po = off + 8
      if (sz < 0 || po + sz > b.length) return None
      if (cid == id) return Some(java.util.Arrays.copyOfRange(b, po, po + sz))
      off = po + sz + (sz & 1)
    }
    None
  }

  /** Append an 'ID3 '/'id3 ' chunk carrying a full ID3v2 tag to an
    * existing AIFF or WAV file (patching the FORM/RIFF size).
    */
  def withId3Chunk(container: Array[Byte], tag: Array[Byte])
      : Array[Byte] = {
    val aiff = Aiff.isAiff(container)
    require(aiff || Multimodal.ContainerCodec.isWav(container),
      "withId3Chunk: AIFF or WAV")
    val id = if (aiff) "ID3 " else "id3 "
    val out = new java.io.ByteArrayOutputStream()
    out.write(container)
    out.write(id.getBytes("US-ASCII"))
    val sz = tag.length
    if (aiff) {
      out.write((sz >>> 24) & 0xff); out.write((sz >>> 16) & 0xff)
      out.write((sz >>> 8) & 0xff); out.write(sz & 0xff)
    } else {
      out.write(sz & 0xff); out.write((sz >>> 8) & 0xff)
      out.write((sz >>> 16) & 0xff); out.write((sz >>> 24) & 0xff)
    }
    out.write(tag)
    if ((sz & 1) == 1) out.write(0)
    val arr = out.toByteArray
    val total = arr.length - 8 // FORM/RIFF payload size
    if (aiff) {
      arr(4) = ((total >>> 24) & 0xff).toByte
      arr(5) = ((total >>> 16) & 0xff).toByte
      arr(6) = ((total >>> 8) & 0xff).toByte
      arr(7) = (total & 0xff).toByte
    } else {
      arr(4) = (total & 0xff).toByte
      arr(5) = ((total >>> 8) & 0xff).toByte
      arr(6) = ((total >>> 16) & 0xff).toByte
      arr(7) = ((total >>> 24) & 0xff).toByte
    }
    arr
  }

  /** A bare ID3v2 tag block (no audio payload) — the chunk body
    * [[withId3Chunk]] embeds.
    */
  def id3Tag(artist: String = null, title: String = null,
      album: String = null, year: Int = 0, cover: Array[Byte] = null,
      v24: Boolean = false, utf8: Boolean = false): Array[Byte] =
    id3v2Wrap(Array.emptyByteArray, artist, title, album, year, cover,
      v24, utf8)

  // ------------------------------------------------------------------
  // ID3v2
  // ------------------------------------------------------------------

  private def syncsafe(b: Array[Byte], o: Int): Int =
    ((b(o) & 0x7f) << 21) | ((b(o + 1) & 0x7f) << 14) |
      ((b(o + 2) & 0x7f) << 7) | (b(o + 3) & 0x7f)

  private def u32be(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  private def text(b: Array[Byte], off: Int, end: Int, enc: Int)
      : Option[String] = {
    if (end <= off) return Some("")
    val raw = java.util.Arrays.copyOfRange(b, off, end)
    val s = enc match {
      case 0     => new String(raw, "ISO-8859-1")
      case 1 | 2 => new String(raw, "UTF-16") // BOM-led; 2 is BE
      case 3     => new String(raw, "UTF-8")
      case _     => return None
    }
    Some(s.takeWhile(_ != '\u0000'))
  }

  /** Reverse the unsynchronisation scheme (id3v2.3 section 5): drop
    * every 0x00 that directly follows a 0xFF in [from, to).
    */
  private def deUnsync(b: Array[Byte], from: Int, to: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(0, to - from))
    var i = from
    while (i < to) {
      out.write(b(i))
      if (b(i) == 0xff.toByte && i + 1 < to && b(i + 1) == 0) i += 2
      else i += 1
    }
    out.toByteArray
  }

  /** Scalar tags only — the [[of]] dispatch shape. */
  private def id3v2(b: Array[Byte]): Tags = id3v2Full(b)._1

  /** Tags plus SYLT synced-lyrics entries (startMs, text) — absolute
    * millisecond timestamps only (format 2); MPEG-frame-clocked SYLT
    * (format 1) needs decode context this walk does not have, so it
    * REFUSES (no entries), never a guessed timeline.
    */
  private[ext] def id3v2Full(b: Array[Byte])
      : (Tags, Seq[(Long, String)]) = {
    val major = b(3) & 0xff
    if (major != 2 && major != 3 && major != 4) return (Empty, Nil)
    val flags = b(5) & 0xff
    // v2.2 header bit 6 is COMPRESSION (never standardized; the spec's
    // rule is "ignore the tag"); v2.3/v2.4 bit 6 is the ext header
    if (major == 2 && (flags & 0x40) != 0) return (Empty, Nil)
    val tagEnd = math.min(b.length, 10 + syncsafe(b, 6))
    if (tagEnd <= 10) return (Empty, Nil)
    // v2.2/v2.3 unsynchronisation applies to the WHOLE tag body; v2.4
    // moved it per-frame (the tag-level flag just says all frames use
    // it), handled in the frame loop below
    val wholeTagUnsync = (flags & 0x80) != 0 && major != 4
    val body =
      if (wholeTagUnsync) deUnsync(b, 10, tagEnd)
      else java.util.Arrays.copyOfRange(b, 10, tagEnd)
    val end = body.length
    var off = 0
    if (major != 2 && (flags & 0x40) != 0) { // extended header skip
      if (off + 4 > end) return (Empty, Nil)
      val ehSize =
        if (major == 4) syncsafe(body, off)
        else u32be(body, off).toInt + 4 // v2.3 size excludes itself
      off += ehSize
    }
    val headerLen = if (major == 2) 6 else 10
    var artist, title, album: Option[String] = None
    var year: Option[Int] = None
    var cover: Option[Array[Byte]] = None
    var lyrics: Option[String] = None
    val synced = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def done() = (Tags(artist, title, album, year, cover, lyrics),
      synced.toSeq)
    while (off >= 0 && off + headerLen <= end) {
      val id = new String(body, off, if (major == 2) 3 else 4, "US-ASCII")
      if (id(0) == 0) return done()
      val size =
        if (major == 4) syncsafe(body, off + 4)
        else if (major == 2) ((body(off + 3) & 0xff) << 16) |
          ((body(off + 4) & 0xff) << 8) | (body(off + 5) & 0xff)
        else u32be(body, off + 4).toInt
      val frameFlags =
        if (major == 2) 0
        else ((body(off + 8) & 0xff) << 8) | (body(off + 9) & 0xff)
      var po = off + headerLen
      val pe = po + size
      if (size < 0 || pe > end || pe < po) return done()
      // compressed/encrypted/GROUPED frames: skip rather than
      // mis-parse. Grouping (v2.3 format 0x20, v2.4 format 0x40)
      // prepends a 1-byte group id to the payload — parsing it as the
      // text-encoding byte would shift every offset by one and, on an
      // APIC, silently corrupt the extracted cover
      val skip =
        if (major == 4) (frameFlags & 0x4c) != 0
        else if (major == 2) false // no frame flags in v2.2
        else (frameFlags & 0xe0) != 0
      // v2.4 per-frame transforms: de-unsync (format bit 1), then the
      // optional 4-byte data-length indicator (format bit 0)
      var fb = body
      var fpo = po
      var fpe = pe
      if (!skip && major == 4 && (frameFlags & 0x03) != 0) {
        if ((frameFlags & 0x02) != 0) {
          fb = deUnsync(body, po, pe); fpo = 0; fpe = fb.length
        }
        if ((frameFlags & 0x01) != 0) fpo += 4 // declared inflated size
        if (fpo > fpe) return done()
      }
      val psize = fpe - fpo
      def tid(v4: String, v2: String): Boolean =
        if (major == 2) id == v2 else id == v4
      if (!skip) {
        if (tid("TPE1", "TP1") && psize >= 1)
          artist = artist.orElse(text(fb, fpo + 1, fpe, fb(fpo) & 0xff))
        else if (tid("TIT2", "TT2") && psize >= 1)
          title = title.orElse(text(fb, fpo + 1, fpe, fb(fpo) & 0xff))
        else if (tid("TALB", "TAL") && psize >= 1)
          album = album.orElse(text(fb, fpo + 1, fpe, fb(fpo) & 0xff))
        else if (tid("USLT", "ULT") && psize >= 5 && lyrics.isEmpty) {
          // enc byte, 3-byte language, descriptor NUL-terminated in
          // enc (UTF-16 uses 0x0000), then the transcript text
          val enc = fb(fpo) & 0xff
          var p = fpo + 4
          if (enc == 1 || enc == 2) {
            while (p + 1 < fpe && !(fb(p) == 0 && fb(p + 1) == 0)) p += 2
            p += 2
          } else {
            while (p < fpe && fb(p) != 0) p += 1
            p += 1
          }
          if (p <= fpe) lyrics = text(fb, p, fpe, enc)
        }
        else if (tid("SYLT", "SLT") && psize >= 7 && synced.isEmpty) {
          // enc, 3-byte language, timestamp FORMAT (2 = absolute ms —
          // the only self-contained clock; 1 = MPEG frames REFUSES),
          // content type, descriptor NUL in enc, then repeated
          // [text NUL(enc)][u32be timestamp]
          val enc = fb(fpo) & 0xff
          val tsFormat = fb(fpo + 4) & 0xff
          if (tsFormat == 2) {
            var p = fpo + 6
            def pastNul(from: Int): Int = {
              var k = from
              if (enc == 1 || enc == 2) {
                while (k + 1 < fpe && !(fb(k) == 0 && fb(k + 1) == 0))
                  k += 2
                k + 2
              } else {
                while (k < fpe && fb(k) != 0) k += 1
                k + 1
              }
            }
            p = pastNul(p) // descriptor
            while (p < fpe) {
              val tEnd = pastNul(p)
              val nulLen = if (enc == 1 || enc == 2) 2 else 1
              if (tEnd + 4 <= fpe) {
                val t = text(fb, p, tEnd - nulLen, enc).getOrElse("")
                val ms = u32be(fb, tEnd)
                if (t.nonEmpty) synced += ((ms, t.stripPrefix("\n")))
                p = tEnd + 4
              } else p = fpe // truncated entry: stop, never shift
            }
          }
        }
        else if ((tid("TYER", "TYE") || (major != 2 && id == "TDRC")) &&
          psize >= 1)
          year = year.orElse(text(fb, fpo + 1, fpe, fb(fpo) & 0xff)
            .flatMap(_.take(4).toIntOption))
        else if (tid("APIC", "PIC") && psize >= 4 && cover.isEmpty) {
          val enc = fb(fpo) & 0xff
          var p = fpo + 1
          if (major == 2) p += 3 // 3-byte image format ("PNG"/"JPG")
          else {
            while (p < fpe && fb(p) != 0) p += 1 // MIME (latin-1)
            p += 1 // past the nul
          }
          if (p < fpe) {
            p += 1 // picture type byte
            // description: nul-terminated in `enc` (UTF-16 uses 0x0000)
            if (enc == 1 || enc == 2) {
              while (p + 1 < fpe && !(fb(p) == 0 && fb(p + 1) == 0)) p += 2
              p += 2
            } else {
              while (p < fpe && fb(p) != 0) p += 1
              p += 1
            }
            if (p < fpe)
              cover = Some(java.util.Arrays.copyOfRange(fb, p, fpe))
          }
        }
      }
      off = pe
    }
    done()
  }

  /** The unsynchronisation WRITE side: a 0x00 after every 0xFF —
    * stricter than the spec's minimum (only false syncs and FF-00),
    * which is legal and what [[deUnsync]] reverses exactly.
    */
  private def unsyncStuff(b: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    while (i < b.length) {
      out.write(b(i))
      if (b(i) == 0xff.toByte) out.write(0)
      i += 1
    }
    out.toByteArray
  }

  /** Fixture writer: prepend a real ID3v2.2, v2.3 or v2.4 tag (text
    * frames + optional APIC/PIC) to any audio payload. `unsync`
    * applies the spec-correct scheme for the chosen version:
    * whole-tag stuffing for v2.2/v2.3, per-frame stuffing with the
    * frame-format flag for v2.4.
    */
  def id3v2Wrap(audio: Array[Byte],
      artist: String = null, title: String = null, album: String = null,
      year: Int = 0, cover: Array[Byte] = null,
      v24: Boolean = false, utf8: Boolean = false,
      v22: Boolean = false, unsync: Boolean = false,
      lyrics: String = null,
      synced: Seq[(Long, String)] = Nil): Array[Byte] = {
    require(!(v22 && v24), "pick one ID3v2 version")
    val frames = new java.io.ByteArrayOutputStream()
    def frame(id: String, payload0: Array[Byte]): Unit = {
      val payload =
        if (unsync && v24) unsyncStuff(payload0) else payload0
      frames.write(id.getBytes("US-ASCII"))
      val sz = payload.length
      if (v22) {
        frames.write((sz >>> 16) & 0xff); frames.write((sz >>> 8) & 0xff)
        frames.write(sz & 0xff)
      } else if (v24) {
        frames.write((sz >>> 21) & 0x7f); frames.write((sz >>> 14) & 0x7f)
        frames.write((sz >>> 7) & 0x7f); frames.write(sz & 0x7f)
      } else {
        frames.write((sz >>> 24) & 0xff); frames.write((sz >>> 16) & 0xff)
        frames.write((sz >>> 8) & 0xff); frames.write(sz & 0xff)
      }
      if (!v22) {
        frames.write(0)
        frames.write(if (unsync && v24) 2 else 0) // v2.4 unsync bit
      }
      frames.write(payload)
    }
    def tf(id4: String, id2: String, v: String): Unit = if (v != null) {
      val enc = if (utf8 && v24) 3 else 0
      val cs = if (enc == 3) "UTF-8" else "ISO-8859-1"
      frame(if (v22) id2 else id4,
        Array((enc & 0xff).toByte) ++ v.getBytes(cs))
    }
    tf("TPE1", "TP1", artist)
    tf("TIT2", "TT2", title)
    tf("TALB", "TAL", album)
    if (year > 0)
      tf(if (v24) "TDRC" else "TYER", "TYE", year.toString)
    if (lyrics != null) {
      // USLT/ULT: enc, 3-byte language, empty NUL-ended descriptor
      val enc = if (utf8 && v24) 3 else 0
      val cs = if (enc == 3) "UTF-8" else "ISO-8859-1"
      frame(if (v22) "ULT" else "USLT",
        Array((enc & 0xff).toByte) ++ "eng".getBytes("US-ASCII") ++
          Array[Byte](0) ++ lyrics.getBytes(cs))
    }
    if (synced.nonEmpty) {
      // SYLT/SLT: enc, language, format 2 (absolute ms), content
      // type 1 (lyrics), empty descriptor, then [text NUL][u32be ms]
      val enc = if (utf8 && v24) 3 else 0
      val cs = if (enc == 3) "UTF-8" else "ISO-8859-1"
      val body = new java.io.ByteArrayOutputStream()
      body.write(enc)
      body.write("eng".getBytes("US-ASCII"))
      body.write(2); body.write(1); body.write(0) // fmt, type, desc
      for ((ms, t) <- synced) {
        body.write(t.getBytes(cs)); body.write(0)
        for (k <- 3 to 0 by -1) body.write(((ms >> (8 * k)) & 0xff).toInt)
      }
      frame(if (v22) "SLT" else "SYLT", body.toByteArray)
    }
    if (cover != null) {
      val p = new java.io.ByteArrayOutputStream()
      p.write(0) // latin-1
      if (v22) p.write("PNG".getBytes("ISO-8859-1"))
      else { p.write("image/png".getBytes("ISO-8859-1")); p.write(0) }
      p.write(3) // front cover
      p.write("cover".getBytes("ISO-8859-1")); p.write(0)
      p.write(cover)
      frame(if (v22) "PIC" else "APIC", p.toByteArray)
    }
    val body0 = frames.toByteArray
    val body =
      if (unsync && !v24) unsyncStuff(body0) // whole-tag (v2.2/v2.3)
      else body0
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(if (v22) 2 else if (v24) 4 else 3); out.write(0)
    out.write(if (unsync) 0x80 else 0) // flags
    val sz = body.length
    out.write((sz >>> 21) & 0x7f); out.write((sz >>> 14) & 0x7f)
    out.write((sz >>> 7) & 0x7f); out.write(sz & 0x7f)
    out.write(body)
    out.write(audio)
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // FLAC metadata blocks
  // ------------------------------------------------------------------

  private def u32le(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  /** Vorbis-comment field list (shared by FLAC and Ogg-Vorbis): the
    * UTF-8 `NAME=value` pairs after the vendor string.
    */
  private def commentFields(b: Array[Byte], off0: Int, end: Int)
      : Seq[(String, String)] = {
    var off = off0
    if (off + 4 > end) return Nil
    val vendorLen = u32le(b, off).toInt
    off += 4 + vendorLen
    if (off + 4 > end || vendorLen < 0) return Nil
    val n = u32le(b, off).toInt
    off += 4
    val out = Seq.newBuilder[(String, String)]
    var i = 0
    while (i < n && off + 4 <= end) {
      val len = u32le(b, off).toInt
      off += 4
      if (len < 0 || off + len > end) return out.result()
      val s = new String(b, off, len, "UTF-8")
      val eq = s.indexOf('=')
      if (eq > 0)
        out += ((s.substring(0, eq).toUpperCase(java.util.Locale.ROOT),
          s.substring(eq + 1)))
      off += len
      i += 1
    }
    out.result()
  }

  private def tagsFromFields(fields: Seq[(String, String)]): Tags = {
    val m = fields.toMap
    val cover = m.get("METADATA_BLOCK_PICTURE").flatMap { b64 =>
      try {
        val block = java.util.Base64.getDecoder.decode(b64)
        pictureData(block, 0, block.length)
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    Tags(m.get("ARTIST"), m.get("TITLE"), m.get("ALBUM"),
      m.get("DATE").flatMap(_.take(4).toIntOption), cover,
      m.get("LYRICS").orElse(m.get("UNSYNCEDLYRICS"))
        .filter(_.nonEmpty))
  }

  /** The image bytes out of a FLAC PICTURE structure at [off, end). */
  private def pictureData(b: Array[Byte], off0: Int, end: Int)
      : Option[Array[Byte]] = {
    var off = off0 + 4 // picture type
    if (off + 4 > end) return None
    val mimeLen = u32be(b, off).toInt
    off += 4 + mimeLen
    if (off + 4 > end || mimeLen < 0) return None
    val descLen = u32be(b, off).toInt
    off += 4 + descLen + 16 // desc + w/h/depth/colors
    if (off + 4 > end || descLen < 0) return None
    val dataLen = u32be(b, off).toInt
    off += 4
    if (dataLen < 0 || off + dataLen > end) return None
    Some(java.util.Arrays.copyOfRange(b, off, off + dataLen))
  }

  private def flacTags(b: Array[Byte]): Tags = {
    var off = 4
    var tags = Empty
    var last = false
    while (!last && off + 4 <= b.length) {
      val hdr = b(off) & 0xff
      last = (hdr & 0x80) != 0
      val typ = hdr & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      val po = off + 4
      val pe = po + len
      if (pe > b.length) return tags
      if (typ == 4) {
        val t = tagsFromFields(commentFields(b, po, pe))
        tags = Tags(tags.artist.orElse(t.artist),
          tags.title.orElse(t.title), tags.album.orElse(t.album),
          tags.year.orElse(t.year), tags.cover.orElse(t.cover),
          tags.lyrics.orElse(t.lyrics))
      } else if (typ == 6 && tags.cover.isEmpty) {
        tags = tags.copy(cover = pictureData(b, po, pe))
      }
      off = pe
    }
    tags
  }

  /** Fixture writer: splice VORBIS_COMMENT (+ optional PICTURE)
    * metadata blocks into a native FLAC stream from [[Flac.encode]].
    */
  def flacWithTags(native: Array[Byte],
      artist: String = null, title: String = null, album: String = null,
      year: Int = 0, cover: Array[Byte] = null,
      lyrics: String = null): Array[Byte] = {
    require(Flac.isFlac(native) && native.length > 42, "native flac")
    val out = new java.io.ByteArrayOutputStream()
    out.write(native, 0, 42)
    val arr = out.toByteArray
    arr(4) = (arr(4) & 0x7f).toByte // STREAMINFO is no longer last
    out.reset(); out.write(arr)
    val fields = Seq("ARTIST" -> artist, "TITLE" -> title,
      "ALBUM" -> album, "DATE" -> (if (year > 0) year.toString else null),
      "LYRICS" -> lyrics)
      .collect { case (k, v) if v != null => s"$k=$v" }
    val vc = new java.io.ByteArrayOutputStream()
    def le32(v: Int): Unit =
      (0 until 4).foreach(i => vc.write((v >> (8 * i)) & 0xff))
    val vendor = "graft".getBytes("UTF-8")
    le32(vendor.length); vc.write(vendor)
    le32(fields.length)
    fields.foreach { f =>
      val fb = f.getBytes("UTF-8")
      le32(fb.length); vc.write(fb)
    }
    val vcb = vc.toByteArray
    val lastFlag = if (cover == null) 0x80 else 0
    out.write(lastFlag | 4)
    out.write((vcb.length >> 16) & 0xff); out.write((vcb.length >> 8) & 0xff)
    out.write(vcb.length & 0xff)
    out.write(vcb)
    if (cover != null) out.write(pictureBlock(cover, last = true))
    out.write(native, 42, native.length - 42)
    out.toByteArray
  }

  /** A complete PICTURE metadata block (header included when `last`
    * wraps it for FLAC; the payload alone is what the Ogg base64
    * field carries).
    */
  private def pictureBlock(cover: Array[Byte], last: Boolean)
      : Array[Byte] = {
    val p = picturePayload(cover)
    val out = new java.io.ByteArrayOutputStream()
    out.write((if (last) 0x80 else 0) | 6)
    out.write((p.length >> 16) & 0xff); out.write((p.length >> 8) & 0xff)
    out.write(p.length & 0xff)
    out.write(p)
    out.toByteArray
  }

  private def picturePayload(cover: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Int): Unit =
      (3 to 0 by -1).foreach(i => out.write((v >> (8 * i)) & 0xff))
    be32(3) // front cover
    val mime = "image/png".getBytes("US-ASCII")
    be32(mime.length); out.write(mime)
    be32(0) // empty description
    be32(0); be32(0); be32(0); be32(0) // w, h, depth, colors
    be32(cover.length); out.write(cover)
    out.toByteArray
  }

  /** The Ogg METADATA_BLOCK_PICTURE field value for a cover. */
  def oggPictureField(cover: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(picturePayload(cover))

  // ------------------------------------------------------------------
  // Ogg-Vorbis comment packet
  // ------------------------------------------------------------------

  // ------------------------------------------------------------------
  // Spark operators
  // ------------------------------------------------------------------

  /** Provenance table: one row per media payload, tagless payloads as
    * all-null rows — the [[Multimodal]] EXIF-table discipline.
    */
  def table(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .map { case (id, b) =>
        val t = of(b)
        (id, t.flatMap(_.artist), t.flatMap(_.title),
          t.flatMap(_.album), t.flatMap(_.year),
          t.exists(_.cover.nonEmpty))
      }
      .toDF("doc_id", "artist", "title", "album", "year", "has_cover")
  }

  /** Embedded-LYRICS rows for a media corpus: (doc_id, lyrics) — the
    * audio heap's in-band TEXT modality (USLT, Vorbis-comment LYRICS,
    * M4A `©lyr`, APE Lyrics, Matroska LYRICS SimpleTag), one batched
    * map, rows only where a transcript exists.
    */
  def lyricsTable(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        of(b).flatMap(_.lyrics).map(l => (id, l))
      }
      .toDF("doc_id", "lyrics")
  }

  /** SYLT synced-lyrics entries (startMs, text) of an ID3v2-bearing
    * payload: raw ID3 prologue or the WAV/AIFF id3 chunk. None when
    * no absolute-ms SYLT frame exists.
    */
  def syncedLyrics(b: Array[Byte]): Option[Seq[(Long, String)]] = try {
    if (b == null || b.length < 10) return None
    val entries = id3Body(b).map(id3v2Full(_)._2).getOrElse(Nil)
    if (entries.isEmpty) None else Some(entries)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Timestamped-transcript rows: (doc_id, idx, start_ms, text) —
    * the audio analog of the subtitle cue table, one batched map.
    */
  def syncedLyricsTable(s: org.apache.spark.sql.SparkSession,
      media: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        syncedLyrics(b).getOrElse(Nil).zipWithIndex.map {
          case ((ms, t), i) => (id, i, ms, t)
        }
      }
      .toDF("doc_id", "idx", "start_ms", "text")
  }

  /** Cross-modal cover dedup: embedded cover art joins standalone
    * images on the shared perceptual hash (the extracted bytes ARE
    * the original image file, so identical artwork lands hash
    * equality — hamming-0 exact).
    *
    * Scale shape: both sides collapse to (id, 64-bit hash) BEFORE the
    * join — media bytes never shuffle — and the equi-join carries NO
    * build-side hint: `images` is a caller-supplied frame of unbounded
    * size, so force-broadcasting it OOMs at corpus scale; AQE picks
    * broadcast at runtime exactly when the hashed side is actually
    * small (asserted hint-free in PlanSpec).
    */
  def coverPairs(s: org.apache.spark.sql.SparkSession,
      images: org.apache.spark.sql.DataFrame,
      audio: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val img = images.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        graft.functions.DHashPixels.computeExternal(b, 0, 0)
          .map(h => (id, h.sh))
      }.toDF("image_id", "hash")
    val cov = audio.select("doc_id", "media").as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        of(b).flatMap(_.cover).flatMap(c =>
          graft.functions.DHashPixels.computeExternal(c, 0, 0)
            .map(h => (id, h.sh)))
      }.toDF("audio_id", "hash")
    cov.join(img, "hash")
      .select("image_id", "audio_id")
  }

  // ------------------------------------------------------------------
  // MP4-family carrier (iTunes `ilst`): M4A/AAC/ALAC audio, MP4 video
  // ------------------------------------------------------------------

  /** ISO-BMFF box walk (ISO/IEC 14496-12 §4.2): 32-bit size + 4-char
    * type, size 1 = 64-bit largesize, size 0 = to-end-of-enclosure.
    * Types decode as ISO-8859-1 — the `ilst` item names carry the 0xA9
    * copyright byte ("©ART") that a US-ASCII decode would mangle to
    * U+FFFD. Callback gets (type, payloadStart, payloadEnd); return
    * false to stop the walk.
    */
  private[ext] def walkMp4(b: Array[Byte], off0: Int, end: Int)(
      f: (String, Int, Int) => Boolean): Boolean = {
    var off = off0
    while (off + 8 <= end) {
      val sz32 = u32be(b, off)
      val typ = new String(b, off + 4, 4, "ISO-8859-1")
      var hdr = 8L
      var sz = sz32
      if (sz32 == 1) {
        if (off + 16 > end) return false
        sz = (u32be(b, off + 8) << 32) | u32be(b, off + 12)
        hdr = 16L
      } else if (sz32 == 0) sz = (end - off).toLong
      if (sz < hdr || off.toLong + sz > end) return false
      if (!f(typ, (off + hdr).toInt, (off + sz).toInt)) return false
      off += sz.toInt
    }
    true
  }

  /** iTunes-style metadata: `moov/udta/meta/ilst` items ©ART (artist),
    * ©nam (title), ©alb (album), ©day (year — a date string whose
    * leading 4 digits are the year), covr (cover art, JPEG/PNG bytes
    * verbatim). Each item holds a `data` box: 4-byte version+well-known
    * type (1 = UTF-8 text, 13 = JPEG, 14 = PNG, 0 = implicit), 4-byte
    * locale, then the value. `meta` is a FULL box — 4 bytes of
    * version/flags precede its children (the classic off-by-four that
    * breaks naive walkers).
    */
  private def mp4Tags(b: Array[Byte]): Tags = {
    var artist, title, album: Option[String] = None
    var year: Option[Int] = None
    var cover: Option[Array[Byte]] = None
    var lyrics: Option[String] = None
    def dataOf(po: Int, pe: Int): Option[(Int, Array[Byte])] = {
      var res: Option[(Int, Array[Byte])] = None
      walkMp4(b, po, pe) { (t, qo, qe) =>
        if (t == "data" && qe - qo >= 8) {
          res = Some(((u32be(b, qo) & 0xffffff).toInt,
            java.util.Arrays.copyOfRange(b, qo + 8, qe)))
          false // first data box wins
        } else true
      }
      res
    }
    def str(po: Int, pe: Int): Option[String] = dataOf(po, pe).collect {
      case (t, v) if (t == 1 || t == 0) && v.nonEmpty =>
        new String(v, java.nio.charset.StandardCharsets.UTF_8)
    }
    walkMp4(b, 0, b.length) { (t1, po, pe) =>
      if (t1 == "moov") walkMp4(b, po, pe) { (t2, qo, qe) =>
        if (t2 == "udta") walkMp4(b, qo, qe) { (t3, ro, re) =>
          if (t3 == "meta" && re - ro >= 4)
            walkMp4(b, ro + 4, re) { (t4, so, se) =>
              if (t4 == "ilst") walkMp4(b, so, se) { (item, io, ie) =>
                item match {
                  case "©ART" => artist = str(io, ie).orElse(artist)
                  case "©nam" => title = str(io, ie).orElse(title)
                  case "©alb" => album = str(io, ie).orElse(album)
                  case "©day" => year = str(io, ie)
                    .map(_.take(4)).filter(_.forall(_.isDigit))
                    .filter(_.length == 4).map(_.toInt).orElse(year)
                  case "©lyr" => lyrics = str(io, ie).orElse(lyrics)
                  case "covr" => cover = dataOf(io, ie).collect {
                    case (t, v) if (t == 13 || t == 14 || t == 0) &&
                      v.nonEmpty => v
                  }.orElse(cover)
                  case _ => ()
                }
                true
              }
              true
            }
          true
        }
        true
      }
      true
    }
    Tags(artist, title, album, year, cover, lyrics)
  }

  private def mp4TextBe(v: Int): Array[Byte] =
    java.nio.ByteBuffer.allocate(4).putInt(v).array()

  private def mp4TagBox(typ: String, payload: Array[Byte]): Array[Byte] =
    java.nio.ByteBuffer.allocate(8 + payload.length)
      .putInt(8 + payload.length).put(typ.getBytes("ISO-8859-1"))
      .put(payload).array()

  /** Fixture side: splice an iTunes `udta{meta{hdlr,ilst}}` into an
    * existing MP4's top-level `moov` (size rewritten in place) — the
    * layout iTunes/ffmpeg write for M4A. Null/zero fields are omitted;
    * `cover` type code is sniffed PNG (14) vs JPEG (13).
    */
  def mp4WithTags(mp4: Array[Byte], artist: String = null,
      title: String = null, album: String = null, year: Int = 0,
      cover: Array[Byte] = null, lyrics: String = null): Array[Byte] = {
    def data(typeCode: Int, payload: Array[Byte]): Array[Byte] =
      mp4TagBox("data", mp4TextBe(typeCode) ++ mp4TextBe(0) ++ payload)
    def text(item: String, v: String): Array[Byte] =
      mp4TagBox(item, data(1, v.getBytes("UTF-8")))
    val items = Seq.newBuilder[Array[Byte]]
    if (artist != null) items += text("©ART", artist)
    if (title != null) items += text("©nam", title)
    if (album != null) items += text("©alb", album)
    if (year > 0) items += text("©day", year.toString)
    if (lyrics != null) items += text("©lyr", lyrics)
    if (cover != null) {
      val isPng = cover.length >= 8 && (cover(0) & 0xff) == 0x89 &&
        cover(1) == 'P'
      items += mp4TagBox("covr", data(if (isPng) 14 else 13, cover))
    }
    val ilst = mp4TagBox("ilst", items.result().flatten.toArray)
    val hdlr = mp4TagBox("hdlr",
      mp4TextBe(0) ++ mp4TextBe(0) ++ // version/flags, pre_defined
        "mdir".getBytes("ISO-8859-1") ++
        "appl".getBytes("ISO-8859-1") ++ new Array[Byte](9))
    val udta = mp4TagBox("udta",
      mp4TagBox("meta", mp4TextBe(0) ++ hdlr ++ ilst))
    var mo = -1
    var me = -1
    walkMp4(mp4, 0, mp4.length) { (t, po, pe) =>
      if (t == "moov" && mo < 0) { mo = po - 8; me = pe }
      true
    }
    require(mo >= 0 && u32be(mp4, mo) == (me - mo).toLong,
      "mp4WithTags: no 32-bit-size top-level moov")
    val out = new java.io.ByteArrayOutputStream()
    out.write(mp4, 0, mo)
    out.write(mp4TextBe(me - mo + udta.length), 0, 4)
    out.write(mp4, mo + 4, me - mo - 4)
    out.write(udta, 0, udta.length)
    out.write(mp4, me, mp4.length - me)
    out.toByteArray
  }

  private def vorbisTags(b: Array[Byte]): Tags = {
    // the comment packet is the second packet of the stream; walk the
    // pages for it (it usually sits at the head of page 2)
    Vorbis.commentPacketOf(b) match {
      case Some(p) if p.length > 7 =>
        tagsFromFields(commentFields(p, 7, p.length))
      case _ => Empty
    }
  }

  // ------------------------------------------------------------------
  // Matroska / WebM Tags + Attachments
  // ------------------------------------------------------------------

  /** Matroska provenance — the EBML heap's ID3 analog, from the
    * public Matroska element registry: Segment > Tags > Tag >
    * SimpleTag (TagName/TagString UTF-8 pairs: ARTIST, TITLE, ALBUM,
    * DATE_RELEASED/DATE_RECORDED; a TITLE inside a Tag whose Targets
    * carries TargetTypeValue 50 is the ALBUM title per the spec's
    * target-type table) and Segment > Attachments > AttachedFile
    * (cover art convention: the first image-typed attachment's
    * FileData is the artwork verbatim). The element IDs are structural
    * identifiers, not decode tables — a mis-recalled ID would MISS a
    * field (walkEbml validates every size), never mis-parse one.
    */
  private def mkvTags(b: Array[Byte]): Tags = {
    val C = Multimodal.ContainerCodec
    var artist, title, album: Option[String] = None
    var year: Option[Int] = None
    var cover: Option[Array[Byte]] = None
    var lyrics: Option[String] = None
    C.walkEbml(b, 0, b.length) { (id, po, pe) =>
      if (id == 0x18538067L) { // Segment
        C.walkEbml(b, po, pe) { (id2, qo, qe) =>
          if (id2 == 0x1254C367L) { // Tags
            C.walkEbml(b, qo, qe) { (id3, ro, re) =>
              if (id3 == 0x7373L) { // Tag
                // EBML does not mandate child order: resolve the Tag's
                // Targets FIRST (a wild Tag may put Targets after its
                // SimpleTags), then classify. Only an EXPLICIT
                // TargetTypeValue of 50 is album-scoped — honoring the
                // spec's default of 50 on an absent value would misfile
                // every plain track TITLE the common muxers write.
                var targetAlbum = false
                C.walkEbml(b, ro, re) { (id4, so, se) =>
                  if (id4 == 0x63C0L) // Targets
                    C.walkEbml(b, so, se) { (id5, to, te) =>
                      if (id5 == 0x68CAL) // TargetTypeValue
                        targetAlbum = C.ebmlUint(b, to, te) == 50L
                      true
                    }
                  true
                }
                C.walkEbml(b, ro, re) { (id4, so, se) =>
                  if (id4 == 0x67C8L) { // SimpleTag
                    var name: String = null
                    var value: String = null
                    C.walkEbml(b, so, se) { (id5, to, te) =>
                      if (id5 == 0x45A3L)
                        name = new String(b, to, te - to, "UTF-8")
                      else if (id5 == 0x4487L)
                        value = new String(b, to, te - to, "UTF-8")
                      true
                    }
                    if (name != null && value != null) name match {
                      case "ARTIST" => artist = artist.orElse(Some(value))
                      case "TITLE" =>
                        if (targetAlbum) album = album.orElse(Some(value))
                        else title = title.orElse(Some(value))
                      case "ALBUM" => album = album.orElse(Some(value))
                      case "DATE_RELEASED" | "DATE_RECORDED" =>
                        year = year.orElse(
                          value.take(4).toIntOption.filter(_ > 0))
                      case "LYRICS" =>
                        lyrics = lyrics.orElse(Some(value))
                      case _ => ()
                    }
                  }
                  true
                }
              }
              true
            }
          } else if (id2 == 0x1941A469L && cover.isEmpty) { // Attachments
            C.walkEbml(b, qo, qe) { (id3, ro, re) =>
              if (id3 == 0x61A7L && cover.isEmpty) { // AttachedFile
                var mime: String = null
                var data: Array[Byte] = null
                C.walkEbml(b, ro, re) { (id4, so, se) =>
                  if (id4 == 0x4660L) // FileMimeType
                    mime = new String(b, so, se - so, "ISO-8859-1")
                  else if (id4 == 0x465CL) // FileData
                    data = java.util.Arrays.copyOfRange(b, so, se)
                  true
                }
                if (mime != null && mime.startsWith("image/") &&
                  data != null) cover = Some(data)
              }
              true
            }
          }
          true
        }
      }
      true
    }
    Tags(artist, title, album, year, cover, lyrics)
  }

  /** Fixture side: splice a Tags element (SimpleTag fields, plus an
    * album TITLE under a TargetTypeValue-50 target — the spec's own
    * album form, so the reader's target handling is exercised) and an
    * Attachments cover into an existing WebM/Matroska Segment, size
    * rewritten. Null/zero fields are omitted.
    */
  def mkvWithTags(mkv: Array[Byte], artist: String = null,
      title: String = null, album: String = null, year: Int = 0,
      cover: Array[Byte] = null, lyrics: String = null): Array[Byte] = {
    val C = Multimodal.ContainerCodec
    def simpleTag(name: String, value: String): Array[Byte] =
      C.ebmlElem(0x67C8L,
        C.ebmlElem(0x45A3L, name.getBytes("UTF-8")) ++
          C.ebmlElem(0x4487L, value.getBytes("UTF-8")))
    val trackTags = Seq.newBuilder[Array[Byte]]
    if (artist != null) trackTags += simpleTag("ARTIST", artist)
    if (title != null) trackTags += simpleTag("TITLE", title)
    if (year > 0) trackTags += simpleTag("DATE_RELEASED", year.toString)
    if (lyrics != null) trackTags += simpleTag("LYRICS", lyrics)
    val tags = Seq.newBuilder[Array[Byte]]
    val trackBody = trackTags.result()
    if (trackBody.nonEmpty)
      tags += C.ebmlElem(0x7373L, trackBody.flatten.toArray)
    if (album != null) // the TargetTypeValue-50 TITLE form
      tags += C.ebmlElem(0x7373L,
        C.ebmlElem(0x63C0L, C.ebmlElem(0x68CAL, Array[Byte](50))) ++
          simpleTag("TITLE", album))
    val extra = new java.io.ByteArrayOutputStream()
    val tagBody = tags.result()
    if (tagBody.nonEmpty)
      extra.write(C.ebmlElem(0x1254C367L, tagBody.flatten.toArray))
    if (cover != null) {
      val isPng = cover.length >= 8 && (cover(0) & 0xff) == 0x89 &&
        cover(1) == 'P'
      extra.write(C.ebmlElem(0x1941A469L, C.ebmlElem(0x61A7L,
        C.ebmlElem(0x466EL,
          (if (isPng) "cover.png" else "cover.jpg").getBytes("UTF-8")) ++
          C.ebmlElem(0x4660L,
            (if (isPng) "image/png" else "image/jpeg").getBytes("UTF-8")) ++
          C.ebmlElem(0x465CL, cover) ++
          C.ebmlElem(0x46AEL, Array[Byte](1))))) // FileUID (required)
    }
    val extraBytes = extra.toByteArray
    if (extraBytes.isEmpty) return mkv
    // locate the top-level Segment header and rewrite its size
    var off = 0
    while (off < mkv.length) {
      val (id, idLen) = C.ebmlVint(mkv, off, mkv.length, keepMarker = true)
      require(idLen > 0, "mkvWithTags: malformed EBML")
      val (sz, szLen) = C.ebmlVint(mkv, off + idLen, mkv.length,
        keepMarker = false)
      require(szLen > 0, "mkvWithTags: malformed EBML size")
      val po = off + idLen + szLen
      val pe = if (sz < 0) mkv.length else po + sz.toInt
      if (id == 0x18538067L) {
        val out = new java.io.ByteArrayOutputStream()
        out.write(mkv, 0, off + idLen)
        out.write(C.ebmlSize8((pe - po).toLong + extraBytes.length))
        out.write(mkv, po, pe - po)
        out.write(extraBytes)
        out.write(mkv, pe, mkv.length - pe)
        return out.toByteArray
      }
      off = pe
    }
    throw new IllegalArgumentException("mkvWithTags: no Segment")
  }
}
