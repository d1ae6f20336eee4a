package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal column plumbing (SURVEY §2.11): image/audio/video as
  * opaque `binary` columns plus typed metadata, with decode / feature-
  * extract / resize / frame-sample as batched per-partition operators.
  *
  * The Spark-side mechanics — schema, partition-parallel batched
  * execution, stable batch shape — are real and tested, and so is the
  * default decode: `ContainerCodec` parses actual PNG and WAV/PCM
  * container headers (CRC-checked IHDR geometry; RIFF chunk walk with a
  * real RMS over the 16-bit samples) with no external libraries.
  * Compressed pixel decode is REAL for PNG (java.util.zip.Inflater +
  * scanline unfilters) and JPEG (the JDK's bundled ImageIO codec);
  * video/MP3 still need a native codec in production. `StubCodec`
  * remains the deterministic fallback for unrecognized payloads and
  * the fake test media.
  *
  * Batched `mapPartitions` is the Scala analog of Python's mapInPandas:
  * rows are processed in fixed-size batches so a vectorized/native codec
  * amortizes per-call overhead, and memory stays bounded per batch rather
  * than per partition.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  /** `kind` records HOW the features were obtained — "pixels" (full
    * image decode), "header" (PNG geometry only), "pcm" (WAV samples),
    * "container" (MP4 moov metadata), "byte-stats" (StubCodec
    * fallback) — so a corpus run can ROLL UP its codec blind spot
    * (see [[decodeCensus]]): at 100 TB the difference between "we
    * decoded the audio" and "we byte-statted it" must be a queryable
    * number, not a per-row detail nobody aggregates.
    */
  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      format: String,
      kind: String,
      checksum: Long,
      feature: Array[Float])

  /** Animated-GIF frame surface: structural frame count, total GCE
    * delay (centiseconds — exact container data), and per-frame
    * perceptual hashes for the hashed prefix (see
    * [[ContainerCodec.gifFrames]] for the invariance contract).
    */
  final case class GifAnim(
      frameCount: Int,
      delayCs: Long,
      frameHashes: Array[Long]) {
    def durationSec: Double = delayCs / 100.0
  }

  /** Container-agnostic ANIMATION surface — the one frame-landmark
    * model across GIF, APNG, and animated WebP: structural frame
    * count, total presentation duration in MILLISECONDS (exact
    * container integers for GIF — centiseconds × 10 — and WebP — ANMF
    * carries milliseconds; APNG delays are num/den-second rationals
    * folded per frame at num·1000/den in integer division, documented
    * and closed-form), and per-frame composited-canvas landmark hashes
    * for the hashed prefix (see [[ContainerCodec.gifFrames]] for the
    * compositing contract — all three containers hash the same
    * logical-screen canvas model, so the same animation pairs ACROSS
    * containers).
    */
  final case class AnimSurface(
      frameCount: Int,
      durationMs: Long,
      frameHashes: Array[Long]) {
    def durationSec: Double = durationMs / 1000.0
  }

  /** Batch-in/batch-out decode contract shared by every codec: the unit
    * a vectorized or native implementation amortizes over.
    */
  trait MediaCodec extends Serializable {
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures]
  }

  /** Deterministic stand-in for formats with no parser here (the
    * `fake/rgb8` test payloads): features derive from byte statistics.
    * Also the fallback ContainerCodec applies to unrecognized bytes.
    */
  object StubCodec extends MediaCodec {
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        MediaFeatures(r.doc_id, r.media.length, r.format, "byte-stats",
          byteChecksum(r.media),
          Array.tabulate(4) { j =>
            if (r.media.isEmpty) 0f
            else (r.media(j % r.media.length) & 0xff) / 255f
          })
      }
  }

  private def byteChecksum(bytes: Array[Byte]): Long = {
    var checksum = 0L
    var i = 0
    while (i < bytes.length) { checksum = checksum * 31 + (bytes(i) & 0xff); i += 1 }
    checksum
  }

  /** REAL container AND pixel parsing for the formats that need no
    * external codec — PNG (geometry from the IHDR chunk, and for the
    * standard static color types — 8/16-bit gray/RGB/GA/RGBA, 8-bit
    * palette, 1/2/4-bit gray and palette, non-interlaced or Adam7 —
    * a FULL pixel decode: IDAT is zlib, so `java.util.zip.Inflater`
    * plus the five PNG scanline unfilters recover the raw pixels
    * offline) and WAV/PCM (audio
    * geometry from the fmt chunk plus a real RMS amplitude over the PCM
    * samples). Formats are sniffed from magic bytes, not trusted from
    * the metadata column; unrecognized payloads fall back to StubCodec's
    * byte statistics, so the operator is total. JPEG pixels decode for
    * real too — through the JDK's own ImageIO codec (java.desktop,
    * headless-safe, no external library). MP3 remains the documented
    * boundary.
    *
    * Feature layout (array<float>, so width may vary by what decoded;
    * the downstream schema is codec-independent):
    *   PNG header-only: [width, height, bitDepth, colorType]
    *   PNG with pixels: [width, height, bitDepth, colorType,
    *                     meanR, meanG, meanB, luminance]  (means 0..1;
    *                     gray replicates into R=G=B; luminance is the
    *                     BT.601 weighting 0.299R + 0.587G + 0.114B)
    *   JPEG:            [width, height, meanR, meanG, meanB, luminance]
    *   WAV: [channels, sampleRate, durationSec, rms]
    */
  object ContainerCodec extends MediaCodec {

    private def u32be(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
    private def u32le(b: Array[Byte], o: Int): Long =
      ((b(o + 3) & 0xffL) << 24) | ((b(o + 2) & 0xffL) << 16) |
        ((b(o + 1) & 0xffL) << 8) | (b(o) & 0xffL)
    private def u16le(b: Array[Byte], o: Int): Int =
      ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, "US-ASCII")

    private val PngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private[ext] def isPng(b: Array[Byte]): Boolean =
      b.length >= 33 && b.take(8).sameElements(PngSig)
    private[ext] def isWav(b: Array[Byte]): Boolean =
      b.length >= 44 && tag(b, 0) == "RIFF" && tag(b, 8) == "WAVE"

    /** RIFF chunk walk shared by decodeWav and [[AudioDsp]]: locate the
      * PCM layout — (channels, sampleRate, bitsPerSample, dataOff,
      * dataLen) — with every chunk size validated against the buffer so
      * a truncated file cannot over-read. None for non-PCM encodings.
      */
    /** (format, channels, sampleRate, bitsPerSample, dataOff, dataLen,
      * blockAlign) with `format` RESOLVED to 1 (integer PCM), 3 (IEEE
      * float), or 0x11 (IMA ADPCM — decodable from the public spec,
      * blockAlign is its block size): WAVE_FORMAT_EXTENSIBLE (0xFFFE —
      * standard for >16-bit and multichannel masters) unwraps to the
      * first two GUID bytes of its SubFormat. Formats with no sample
      * decode here return None — the caller then routes MP3-in-WAV
      * (0x55) to container geometry and everything else to byte stats.
      */
    private[ext] def wavLayout(
        b: Array[Byte]): Option[(Int, Int, Int, Int, Int, Int, Int)] = {
      var off = 12
      var format, channels, sampleRate, bitsPerSample, blockAlign = 0
      var dataOff, dataLen = -1
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val sz = u32le(b, off + 4) // LONG: a lying u32 size must not
        if (off + 8L + sz > b.length) return None // wrap the Int check
        if (id == "fmt " && sz >= 16) {
          format = u16le(b, off + 8)
          if (format == 0xfffe && sz >= 40)
            format = u16le(b, off + 8 + 24) // SubFormat GUID leads with it
          if (format != 1 && format != 2 && format != 3 &&
            format != 0x11 && format != 6 && format != 7 &&
            format != 0x55) return None // 0x55: MP3-in-WAV (decodable r13)
          channels = u16le(b, off + 10)
          sampleRate = u32le(b, off + 12).toInt
          blockAlign = u16le(b, off + 20)
          bitsPerSample = u16le(b, off + 22)
        } else if (id == "data") { dataOff = off + 8; dataLen = sz.toInt }
        off += (8 + sz + (sz & 1)).toInt // chunks are word-aligned
      }
      if (channels <= 0 || sampleRate <= 0 || dataOff < 0 || format == 0) None
      else Some((format, channels, sampleRate, bitsPerSample, dataOff,
        dataLen, blockAlign))
    }

    /** PNG: signature, then the mandatory first chunk IHDR =
      * len(4) "IHDR" width(4) height(4) bitDepth(1) colorType(1) ... crc(4).
      * The CRC32 over "IHDR"+payload is VERIFIED — a corrupt header
      * falls back to byte-stats rather than emitting garbage geometry.
      * When the image is on the decode path (8/16-bit gray/RGB/GA/RGBA,
      * 8-bit palette, 1/2/4-bit gray/palette, non-interlaced or
      * Adam7 — see [[pngInterleaved]]) with CRC-valid IDAT data, the
      * pixels are decoded for real and per-channel means append to the
      * feature (see the layout above); anything else stays
      * geometry-only.
      */
    private def decodePng(r: MediaRow): Option[MediaFeatures] = {
      val b = r.media
      if (u32be(b, 8) != 13 || tag(b, 12) != "IHDR") return None
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      if (crc.getValue != u32be(b, 12 + 4 + 13)) return None
      val width = u32be(b, 16)
      val height = u32be(b, 20)
      val bitDepth = b(24) & 0xff
      val colorType = b(25) & 0xff
      val geometry =
        Array(width.toFloat, height.toFloat, bitDepth.toFloat, colorType.toFloat)
      val px = pixelStats(b, width.toInt, height.toInt, bitDepth, colorType)
      // APNG: the animation surface rides the feature row (the GIF
      // precedent) — [.., frameCount, durationSec] appended; static
      // PNGs keep their layout untouched
      val anim = apngFrames(b, maxHashFrames = 0)
      val feature = px.map(geometry ++ _).getOrElse(geometry) ++
        anim.map(a => Array(a.frameCount.toFloat, a.durationSec.toFloat))
          .getOrElse(Array.empty[Float])
      Some(MediaFeatures(r.doc_id, b.length, "image/png",
        if (px.isDefined) "pixels" else "header", byteChecksum(b), feature))
    }

    /** Samples per pixel IN THE SCANLINE per PNG color type (palette
      * carries one index per pixel; expansion happens post-unfilter).
      */
    private[ext] def pngChannelsOf(colorType: Int): Int = channelsOf(colorType)
    private def channelsOf(colorType: Int): Int = colorType match {
      case 0 => 1 // grayscale
      case 2 => 3 // RGB
      case 3 => 1 // palette indices
      case 4 => 2 // gray + alpha
      case 6 => 4 // RGBA
      case _ => 0 // invalid types: no pixel path
    }

    /** Defense against decompression bombs: a 4-float stat never
      * justifies inflating more than this per image (a ~5 KB zlib
      * stream can legally inflate to gigabytes).
      */
    private val MaxInflatedBytes = 1L << 26 // 64 MiB

    /** The decoded interleaved 8-bit samples (width·height·channels
      * bytes, row-major) for decodable PNGs: 8- and 16-BIT
      * gray/RGB/GA/RGBA (a 16-bit sample folds to its high byte —
      * exactly the inverse of the spec's v·257 8→16 expansion, so the
      * same picture stored at either depth decodes to the same bytes),
      * 8-bit PALETTE (PLTE lookup expands to RGB — indexed color is
      * everywhere in a real crawl), SUB-BYTE (1/2/4-bit) gray and
      * palette images (MSB-first unpacking, gray samples scaled by
      * 255/(2^d−1) per the spec), and ADAM7-INTERLACED images at any
      * of those depths (each of the 7 passes unfilters independently
      * over its own packed sub-image, then scatters to final pixel
      * positions — an interlaced re-encode of the same picture decodes
      * to the same plane). None when any chunk/zlib/size/palette
      * validation fails — conservative: bad data degrades, never
      * decodes into garbage. Shared by the mean-stat feature path
      * ([[pixelStats]]) and the grayscale perceptual-hash path
      * ([[grayPlane]]).
      */
    private[ext] def pngInterleaved(
        b: Array[Byte], width: Int, height: Int,
        bitDepth: Int, colorType: Int): Option[(Array[Byte], Int)] = {
      val compression = b(26) & 0xff
      val filterMethod = b(27) & 0xff
      val interlace = b(28) & 0xff
      if (compression != 0 || filterMethod != 0 || interlace > 1) return None

      // walk the chunks after IHDR, concatenating CRC-valid IDAT data
      // (one zlib stream may span many IDAT chunks) and capturing the
      // CRC-valid PLTE for indexed color (+ its optional tRNS alphas)
      val idat = new java.io.ByteArrayOutputStream()
      var palette: Array[Byte] = null
      var trns: Array[Byte] = null
      var off = 8 + 4 + 4 + 13 + 4
      var done = false
      while (!done && off + 8 <= b.length) {
        val sz = u32be(b, off).toInt
        if (sz < 0 || off + 12 + sz > b.length) return None
        val id = tag(b, off + 4)
        if (id == "IDAT" || id == "PLTE" || id == "tRNS") {
          val crc = new java.util.zip.CRC32
          crc.update(b, off + 4, 4 + sz)
          if (crc.getValue != u32be(b, off + 8 + sz)) return None
          if (id == "IDAT") idat.write(b, off + 8, sz)
          else if (id == "PLTE") {
            if (sz == 0 || sz % 3 != 0 || sz > 3 * 256) return None
            palette = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
          } else if (colorType == 3) { // palette alphas; other forms
            if (sz > 256) return None  // (gray/RGB value keys) unhandled
            trns = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + sz)
          }
        } else if (id == "IEND") done = true
        off += 12 + sz
      }
      if (idat.size == 0) return None
      pngExpand(idat.toByteArray, palette, trns, width, height, bitDepth,
        colorType, interlace)
    }

    /** The inflate + unfilter + expand core shared by the whole-image
      * path ([[pngInterleaved]]) and the APNG frame path
      * ([[apngFrames]] — each fcTL frame is its own complete zlib
      * stream over its own fw×fh scanlines at the IMAGE's depth/color
      * type, so the exact same machinery decodes it). All geometry,
      * depth, bomb-bound, and palette validation lives here. `trns`
      * (indexed color only) carries per-palette-index alphas — the
      * GIF-style transparency an APNG OPTIMIZER emits for delta
      * frames: with it present, palette expansion yields RGBA
      * (channels 4, missing entries opaque per spec) so the
      * compositor sees the real alphas; without it, RGB as before.
      * Alpha never reaches the gray plane ([[toGray]]), so static
      * hashes/stats are unchanged by a tRNS chunk.
      */
    private def pngExpand(
        zdata: Array[Byte], palette: Array[Byte], trns: Array[Byte],
        width: Int, height: Int, bitDepth: Int, colorType: Int,
        interlace: Int): Option[(Array[Byte], Int)] = {
      // samples per pixel as they appear IN THE SCANLINE (palette = 1
      // index per pixel; expansion to RGB happens after unfiltering)
      val scanChannels = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => 0
      }
      val subByte = bitDepth == 1 || bitDepth == 2 || bitDepth == 4
      val depthOk =
        bitDepth == 8 || (subByte && (colorType == 0 || colorType == 3)) ||
          (bitDepth == 16 && colorType != 3) // 16-bit palette is invalid PNG
      if (scanChannels == 0 || !depthOk || width <= 0 || height <= 0)
        return None
      if (colorType == 3 && palette == null) return None
      val bitsPerPx = scanChannels * bitDepth
      def rowBytes(w: Int): Long = (w.toLong * bitsPerPx + 7) / 8
      val stride = rowBytes(width).toInt
      // Adam7 pass geometry (xStart, yStart, xStep, yStep); the
      // non-interlaced image is the single trivial pass
      val passes: Array[(Int, Int, Int, Int)] =
        if (interlace == 0) Array((0, 0, 1, 1))
        else Array((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
      def passDims(p: (Int, Int, Int, Int)): (Int, Int) =
        ((width - p._1 + p._3 - 1) / p._3, (height - p._2 + p._4 - 1) / p._4)
      val total = passes.map { p =>
        val (pw, ph) = passDims(p)
        if (pw <= 0 || ph <= 0) 0L else (1L + rowBytes(pw)) * ph
      }.sum
      if (total <= 0 || total > MaxInflatedBytes ||
        stride.toLong * height > MaxInflatedBytes) return None

      // inflate to EXACTLY height * (1 + rowData) filtered bytes
      val raw = new Array[Byte](total.toInt)
      val inf = new java.util.zip.Inflater()
      try {
        inf.setInput(zdata)
        var got = 0
        while (got < raw.length && !inf.finished()) {
          val n = inf.inflate(raw, got, raw.length - got)
          if (n == 0 && inf.needsInput()) return None // truncated stream
          got += n
        }
        if (got != raw.length) return None
      } catch {
        case _: java.util.zip.DataFormatException => return None
      } finally inf.end()

      // undo the per-scanline filter (types 0-4: None, Sub, Up, Average,
      // Paeth) over the PACKED row bytes; per the spec bpp rounds up to
      // one byte for sub-byte depths, and each Adam7 pass filters as if
      // it were its own image (previous-row state resets per pass)
      val bpp = math.max(1, bitsPerPx / 8)
      def unfilter(rawOff: Int, rows: Int, rb: Int): Array[Byte] = {
        val prev = new Array[Int](rb) // unfiltered previous row
        val cur = new Array[Int](rb)
        val out = new Array[Byte](rb * rows)
        var y = 0
        while (y < rows) {
          val rowOff = rawOff + y * (rb + 1)
          val fType = raw(rowOff) & 0xff
          if (fType > 4) return null
          var x = 0
          while (x < rb) {
            val v = raw(rowOff + 1 + x) & 0xff
            val a = if (x >= bpp) cur(x - bpp) else 0   // left
            val u = prev(x)                              // up
            val c = if (x >= bpp) prev(x - bpp) else 0   // upper-left
            val recon = fType match {
              case 0 => v
              case 1 => v + a
              case 2 => v + u
              case 3 => v + ((a + u) >> 1)
              case 4 =>
                val p = a + u - c
                val pa = math.abs(p - a); val pb = math.abs(p - u)
                val pc = math.abs(p - c)
                v + (if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c)
            }
            cur(x) = recon & 0xff
            out(y * rb + x) = cur(x).toByte
            x += 1
          }
          System.arraycopy(cur, 0, prev, 0, rb)
          y += 1
        }
        out
      }
      val lines: Array[Byte] =
        if (interlace == 0) {
          val lf = unfilter(0, height, stride)
          if (lf == null) return None
          lf
        } else {
          // deinterlace: unfilter each pass, scatter its pixels into a
          // packed full-geometry buffer at their final (x, y) positions
          val full = new Array[Byte](stride * height)
          var rawOff = 0
          var pi = 0
          while (pi < passes.length) {
            val (xs, ys, xi, yi) = passes(pi)
            val (pw, ph) = passDims(passes(pi))
            if (pw > 0 && ph > 0) {
              val prb = rowBytes(pw).toInt
              val pl = unfilter(rawOff, ph, prb)
              if (pl == null) return None
              rawOff += (prb + 1) * ph
              val pxBytes = bitsPerPx / 8 // 0 marks the sub-byte depths
              var j = 0
              while (j < ph) {
                val y = ys + j * yi
                var i = 0
                while (i < pw) {
                  val x = xs + i * xi
                  if (pxBytes > 0) {
                    System.arraycopy(pl, j * prb + i * pxBytes,
                      full, y * stride + x * pxBytes, pxBytes)
                  } else {
                    val sBit = i * bitDepth
                    val v = (pl(j * prb + (sBit >> 3)) >>
                      (8 - bitDepth - (sBit & 7))) & ((1 << bitDepth) - 1)
                    val dBit = x * bitDepth
                    full(y * stride + (dBit >> 3)) =
                      (full(y * stride + (dBit >> 3)) |
                        (v << (8 - bitDepth - (dBit & 7)))).toByte
                  }
                  i += 1
                }
                j += 1
              }
            }
            pi += 1
          }
          full
        }

      // expand packed samples / palette indices into interleaved 8-bit
      if (bitDepth == 8 && colorType != 3) return Some((lines, scanChannels))
      if (bitDepth == 16) {
        // fold each big-endian 16-bit sample to its high byte — the
        // exact inverse of the spec's v·257 8→16 expansion
        val n = width * height * scanChannels
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) { out(i) = lines(i * 2); i += 1 }
        return Some((out, scanChannels))
      }
      val maxVal = (1 << bitDepth) - 1
      def sampleAt(y: Int, px: Int): Int =
        if (bitDepth == 8) lines(y * stride + px) & 0xff
        else {
          val bitPos = px * bitDepth
          (lines(y * stride + (bitPos >> 3)) >> (8 - bitDepth - (bitPos & 7))) & maxVal
        }
      if (colorType == 3) {
        val nEntries = palette.length / 3
        val ch = if (trns == null) 3 else 4
        val out = new Array[Byte](width * height * ch)
        var p = 0
        var yy = 0
        while (yy < height) {
          var xx = 0
          while (xx < width) {
            val idx = sampleAt(yy, xx)
            if (idx >= nEntries) return None // index past the palette
            out(p) = palette(idx * 3)
            out(p + 1) = palette(idx * 3 + 1)
            out(p + 2) = palette(idx * 3 + 2)
            // tRNS alphas; entries past its length are opaque per spec
            if (ch == 4)
              out(p + 3) = if (idx < trns.length) trns(idx) else -1
            p += ch; xx += 1
          }
          yy += 1
        }
        Some((out, ch))
      } else { // sub-byte gray: scale to 8 bits (255/(2^d-1) exactly)
        val out = new Array[Byte](width * height)
        var p = 0
        var yy = 0
        while (yy < height) {
          var xx = 0
          while (xx < width) {
            out(p) = (sampleAt(yy, xx) * 255 / maxVal).toByte
            p += 1; xx += 1
          }
          yy += 1
        }
        Some((out, 1))
      }
    }

    /** [meanR, meanG, meanB, luminance] over the real decoded pixels,
      * or None when this PNG is outside the 8-bit non-interlaced
      * gray/RGB/GA/RGBA path (or any chunk/zlib/size validation fails —
      * conservative: bad data degrades to geometry-only, never garbage
      * stats).
      */
    private def pixelStats(
        b: Array[Byte], width: Int, height: Int,
        bitDepth: Int, colorType: Int): Option[Array[Float]] =
      pngInterleaved(b, width, height, bitDepth, colorType).map {
        case (px, channels) =>
          val sums = new Array[Long](channels)
          var i = 0
          while (i < px.length) {
            sums(i % channels) += px(i) & 0xff
            i += 1
          }
          val n = width.toLong * height
          def mean(ch: Int): Float = (sums(ch).toDouble / n / 255.0).toFloat
          // channels >= 3 = color (RGB/RGBA/palette-expanded); 1-2 = gray
          val (r, g, bl) =
            if (channels >= 3) (mean(0), mean(1), mean(2))
            else (mean(0), mean(0), mean(0))
          val luminance = 0.299f * r + 0.587f * g + 0.114f * bl
          Array(r, g, bl, luminance)
      }

    /** Pixel-count ceiling for the perceptual-hash decode: a JPEG/PNG
      * whose plane exceeds this many pixels falls back to the
      * payload-byte hash regime rather than materializing an unbounded
      * plane per row inside an expression (the PNG path is additionally
      * bounded by [[MaxInflatedBytes]]).
      */
    private val MaxHashPixels = 1 << 24 // 16M pixels = 16 MiB gray plane

    /** CRC-checked IHDR geometry for [[grayPlane]]: (width, height,
      * bitDepth, colorType), or None when the signature/first-chunk/CRC
      * validation fails or the geometry is non-positive.
      */
    private def pngHeader(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      if (!isPng(b)) return None
      if (u32be(b, 8) != 13 || tag(b, 12) != "IHDR") return None
      val crc = new java.util.zip.CRC32
      crc.update(b, 12, 4 + 13)
      if (crc.getValue != u32be(b, 12 + 4 + 13)) return None
      val w = u32be(b, 16)
      val h = u32be(b, 20)
      if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) None
      else Some((w.toInt, h.toInt, b(24) & 0xff, b(25) & 0xff))
    }

    /** Interleaved samples -> one BT.601 grayscale byte per pixel, in
      * INTEGER arithmetic ((299R + 587G + 114B + 500) / 1000) so the
      * plane — and every hash derived from it — is bit-restatable in
      * plain SQL with no float rounding question. Gray/gray+alpha take
      * the gray channel; alpha never contributes (a transparent pixel's
      * color still identifies the image content).
      */
    private def toGray(px: Array[Byte], channels: Int): Array[Byte] =
      channels match {
        case 1 => px
        case _ =>
          val n = px.length / channels
          val out = new Array[Byte](n)
          var p = 0
          var i = 0
          if (channels == 2) {
            while (p < n) { out(p) = px(i); p += 1; i += 2 }
          } else { // 3 or 4
            while (p < n) {
              val r = px(i) & 0xff; val g = px(i + 1) & 0xff
              val bl = px(i + 2) & 0xff
              out(p) = ((299 * r + 587 * g + 114 * bl + 500) / 1000).toByte
              p += 1; i += channels
            }
          }
          out
      }

    /** JPEG -> grayscale plane through the JDK's ImageIO codec, same
      * integer BT.601 as the PNG path. None on decode failure or planes
      * past [[MaxHashPixels]].
      */
    private def jpegGray(b: Array[Byte]): Option[(Array[Byte], Int, Int)] =
      try {
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(b))
        if (im == null || im.getWidth <= 0 || im.getHeight <= 0 ||
            im.getWidth.toLong * im.getHeight > MaxHashPixels) None
        else {
          val w = im.getWidth; val h = im.getHeight
          val out = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = im.getRGB(x, y)
              val r = (p >> 16) & 0xff; val g = (p >> 8) & 0xff
              val bl = p & 0xff
              out(y * w + x) = ((299 * r + 587 * g + 114 * bl + 500) / 1000).toByte
              x += 1
            }
            y += 1
          }
          Some((out, w, h))
        }
      } catch {
        case scala.util.control.NonFatal(_) => None
      }

    /** The decoded grayscale (BT.601) plane for perceptual hashing:
      * (plane, width, height) when the payload is a decodable PNG (the
      * inflate+unfilter path the feature stats share) or JPEG (ImageIO),
      * None otherwise — the caller falls back to hashing the payload
      * bytes. This is what makes a RE-ENCODED copy of the same picture
      * hash near-identically: losslessly re-encoded PNGs (different
      * scanline filters, IDAT split, deflate level) decode to the SAME
      * plane, and a JPEG re-compression decodes to a plane a few
      * gradient signs away.
      */
    private[graft] def grayPlane(b: Array[Byte]): Option[(Array[Byte], Int, Int)] =
      if (b == null) None
      else if (isPng(b))
        pngHeader(b).flatMap { case (w, h, bitDepth, colorType) =>
          if (w.toLong * h > MaxHashPixels) None
          else pngInterleaved(b, w, h, bitDepth, colorType).map {
            case (px, channels) => (toGray(px, channels), w, h)
          }
        }
      else if (isJpeg(b)) jpegGray(b)
      else if (isGif(b)) gifRgb(b).map { case (px, w, h) => (toGray(px, 3), w, h) }
      else if (isBmp(b)) bmpRgb(b).map { case (px, w, h) => (toGray(px, 3), w, h) }
      else if (isWebp(b)) webpRgb(b).map { case (px, w, h) => (toGray(px, 3), w, h) }
      else if (isTiff(b)) tiffRgb(b).map { case (px, w, h) => (toGray(px, 3), w, h) }
      else if (isIco(b)) icoRgb(b).map { case (px, w, h) => (toGray(px, 3), w, h) }
      else None

    /** WAV: RIFF chunk walk to "fmt " (audioFormat, channels, sampleRate,
      * bitsPerSample) and "data" (sample payload). RMS amplitude is
      * computed over the decoded mono mix for EVERY supported sample
      * layout (8/16/24/32-bit integer PCM and 32/64-bit IEEE float,
      * mono or multichannel — `AudioDsp.monoSamples`, the same decode
      * the fingerprint/DSP family runs on) — a real signal feature, not
      * a stand-in. Chunk sizes are validated against the buffer so a
      * truncated file cannot over-read.
      */
    private def decodeWav(r: MediaRow): Option[MediaFeatures] = try {
      val b = r.media
      val (format, channels, sampleRate, bitsPerSample, _, dataLen,
        blockAlign) =
        wavLayout(b) match {
          case Some(layout) => layout
          // not a decodable sample layout: anything unknown falls
          // through the MP3-in-WAV route to byte-stats
          case None         => return wavMp3Features(r)
        }
      // fmt 0x55 (MP3-in-WAV) has its own mime/duration conventions —
      // route it whole (since r13 it decodes to pcm there)
      if (format == 0x55) return wavMp3Features(r)
      val durationSec =
        if (format == 0x11 && blockAlign > 8) {
          // IMA: (1 + 2*(blockAlign/channels - 4)) samples per block
          val spb = 1 + 2 * (blockAlign / channels - 4)
          (dataLen / blockAlign).toDouble * spb / sampleRate
        } else {
          val byteRate = sampleRate.toLong * channels * (bitsPerSample / 8)
          if (byteRate > 0) dataLen.toDouble / byteRate else 0.0
        }
      val rms = AudioDsp.monoSamples(b) match {
        case Some((x, _)) if x.nonEmpty =>
          var sum = 0.0
          var i = 0
          while (i < x.length) { sum += x(i) * x(i); i += 1 }
          math.sqrt(sum / x.length)
        case _ => 0.0
      }
      Some(MediaFeatures(r.doc_id, b.length, "audio/wav", "pcm",
        byteChecksum(b),
        Array(channels.toFloat, sampleRate.toFloat, durationSec.toFloat,
          rms.toFloat)))
    } catch { case scala.util.control.NonFatal(_) => None }

    private[ext] def isJpeg(b: Array[Byte]): Boolean =
      b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
        (b(2) & 0xff) == 0xff

    /** JPEG: REAL pixel decode through the JDK's bundled ImageIO codec
      * (java.desktop ships a baseline+progressive JPEG decoder — pure
      * JVM, headless-safe, no external library; the entropy coder we
      * previously documented as a boundary is in the JDK after all).
      * Features mirror the PNG pixel layout without the PNG-specific
      * header fields: [width, height, meanR, meanG, meanB, luminance],
      * means in 0..1 over the decoded RGB. A payload ImageIO rejects
      * (truncated/corrupt) falls through to byte statistics — the
      * operator stays total. MP3 remains the documented boundary.
      */
    private def decodeJpeg(r: MediaRow): Option[MediaFeatures] =
      try {
        val im = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.media))
        if (im == null || im.getWidth <= 0 || im.getHeight <= 0) None
        else {
          val w = im.getWidth; val h = im.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val p = im.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val mr = (sr.toDouble / n / 255.0).toFloat
          val mg = (sg.toDouble / n / 255.0).toFloat
          val mb = (sb.toDouble / n / 255.0).toFloat
          val lum = 0.299f * mr + 0.587f * mg + 0.114f * mb
          Some(MediaFeatures(r.doc_id, r.media.length, "image/jpeg",
            "pixels", byteChecksum(r.media),
            Array(w.toFloat, h.toFloat, mr, mg, mb, lum)))
        }
      } catch {
        // ImageIO's JPEG reader throws RuntimeExceptions (AIOOBE, NASE,
        // IAE) on mangled headers, not just IOException — total means
        // total
        case scala.util.control.NonFatal(_) => None
      }

    private[ext] def isGif(b: Array[Byte]): Boolean =
      b.length >= 14 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

    private[ext] def isBmp(b: Array[Byte]): Boolean =
      b.length >= 54 && b(0) == 'B' && b(1) == 'M'

    /** GIF LZW: variable-width codes (start minCodeSize+1, grow to 12
      * bits as the dictionary fills, reset on CLEAR) packed LSB-first
      * over the concatenated data sub-blocks starting at `off0` (whose
      * first byte is the min code size). Returns exactly `need`
      * expanded index bytes, or null on any structural violation —
      * conservative, like every other decode path here.
      */
    private def lzwDecode(b: Array[Byte], off0: Int, need: Int): Array[Byte] = {
      var off = off0
      if (off >= b.length) return null
      val minCode = b(off) & 0xff; off += 1
      if (minCode < 2 || minCode > 8) return null
      val data = new java.io.ByteArrayOutputStream()
      var bs = if (off < b.length) b(off) & 0xff else return null
      while (bs != 0) {
        off += 1
        if (off + bs > b.length) return null // cut MID-sub-block: no pixels
        data.write(b, off, bs)
        off += bs
        // a file cut after its last complete sub-block but before the
        // 0 terminator still carries every pixel — decode what is there
        // (the expansion below fails anyway if the data is short)
        bs = if (off >= b.length) 0 else b(off) & 0xff
      }
      val d = data.toByteArray
      val clear = 1 << minCode
      val endCode = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val out = new Array[Byte](need)
      val stack = new Array[Byte](4096)
      var outN = 0
      var dictSize = clear + 2
      var codeWidth = minCode + 1
      var bitPos = 0
      var prev = -1
      while (outN < need) {
        // read one LSB-first code at the current width
        if (bitPos + codeWidth > d.length * 8) return null
        var code = 0
        var i = 0
        while (i < codeWidth) {
          val p = bitPos + i
          if (((d(p >> 3) >> (p & 7)) & 1) != 0) code |= 1 << i
          i += 1
        }
        bitPos += codeWidth
        if (code == clear) {
          dictSize = clear + 2; codeWidth = minCode + 1; prev = -1
        } else if (code == endCode) {
          return null // stream ended before the frame filled
        } else {
          val isNew = code >= dictSize
          if (isNew && (code != dictSize || prev < 0)) return null
          // expand the base string (KwKwK expands prev and appends its
          // own first byte)
          var c = if (isNew) prev else code
          var sp = 0
          while (c >= clear + 2) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
          if (c >= clear) return null // clear/end can never head a chain
          val first = c.toByte
          val emitLen = sp + 1 + (if (isNew) 1 else 0)
          if (outN + emitLen > need) return null
          out(outN) = first; outN += 1
          var j = sp - 1
          while (j >= 0) { out(outN) = stack(j); outN += 1; j -= 1 }
          if (isNew) { out(outN) = first; outN += 1 }
          if (prev >= 0 && dictSize < 4096) {
            prefix(dictSize) = prev
            suffix(dictSize) = first
            dictSize += 1
            if (dictSize == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          }
          prev = code
        }
      }
      out
    }

    /** Offset just past a sub-block chain whose first byte sits at
      * `off0` (the min-code-size byte of an LZW stream) — the
      * structural skip for frames whose pixels are not needed. -1 on a
      * truncated chain.
      */
    private def subBlocksEnd(b: Array[Byte], off0: Int): Int = {
      var off = off0 + 1 // min code size byte
      while (off < b.length && (b(off) & 0xff) != 0)
        off += 1 + (b(off) & 0xff)
      if (off >= b.length) -1 else off + 1
    }

    /** One decoded image-descriptor block: display-order palette
      * INDICES (interlace already undone), the color table they index,
      * the frame's position on the logical screen, and the offset past
      * the block (-1 when the file was truncated AFTER the pixels but
      * inside the sub-block chain — the pixels are real, the walk ends
      * with this frame).
      */
    private final case class GifFrameData(
        idx: Array[Byte], ct: Array[Byte],
        left: Int, top: Int, fw: Int, fh: Int, end: Int)

    /** Decode ONE image-descriptor block whose 0x2c byte sits at `off0`
      * — local-or-global color table, the REAL LZW expansion, 4-pass
      * interlace reorder, every index validated against the table.
      * None when the PIXELS cannot be recovered. A file truncated AFTER
      * the frame's pixels but inside the sub-block chain still decodes
      * (the pixel-regime hash of a stored copy must not silently flip
      * to byte-stats on a tail truncation) — `end` is then -1.
      */
    private def gifFrameAt(b: Array[Byte], off0: Int,
        gct: Array[Byte]): Option[GifFrameData] = {
      def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      if (off0 + 10 > b.length) return None
      val left = u16(off0 + 1); val top = u16(off0 + 3)
      val fw = u16(off0 + 5); val fh = u16(off0 + 7)
      val ip = b(off0 + 9) & 0xff
      var off = off0 + 10
      var ct = gct
      if ((ip & 0x80) != 0) {
        val n = 2 << (ip & 7)
        if (off + 3 * n > b.length) return None
        ct = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
        off += 3 * n
      }
      if (ct == null || fw <= 0 || fh <= 0 ||
        fw.toLong * fh > MaxHashPixels) return None
      val raw = lzwDecode(b, off, fw * fh)
      if (raw == null) return None
      val end = subBlocksEnd(b, off)
      val nColors = ct.length / 3
      val idx =
        if ((ip & 0x40) == 0) raw
        else { // interlaced: rows arrive in the four GIF passes
          val o = new Array[Byte](raw.length); var r = 0
          for ((s, st) <- Seq((0, 8), (4, 8), (2, 4), (1, 2)))
            for (y <- s until fh by st) {
              System.arraycopy(raw, r * fw, o, y * fw, fw); r += 1
            }
          o
        }
      var i = 0
      while (i < idx.length) {
        if ((idx(i) & 0xff) >= nColors) return None
        i += 1
      }
      Some(GifFrameData(idx, ct, left, top, fw, fh, end))
    }

    /** Palette lookup of a decoded frame to interleaved RGB. */
    private def gifFrameRgb(f: GifFrameData): Array[Byte] = {
      val out = new Array[Byte](f.fw * f.fh * 3)
      var i = 0
      while (i < f.idx.length) {
        val ci = f.idx(i) & 0xff
        out(i * 3) = f.ct(ci * 3)
        out(i * 3 + 1) = f.ct(ci * 3 + 1)
        out(i * 3 + 2) = f.ct(ci * 3 + 2)
        i += 1
      }
      out
    }

    /** Structural skip over one image-descriptor block at `off0` (no
      * pixel decode): next block offset, -1 on truncation.
      */
    private def gifFrameSkip(b: Array[Byte], off0: Int): Int = {
      if (off0 + 10 > b.length) return -1
      val ip = b(off0 + 9) & 0xff
      var off = off0 + 10
      if ((ip & 0x80) != 0) {
        val n = 2 << (ip & 7)
        if (off + 3 * n > b.length) return -1
        off += 3 * n
      }
      subBlocksEnd(b, off)
    }

    /** GIF header walk: (global color table or null, offset of the
      * first block after it). None on a malformed logical screen.
      */
    private def gifHeader(b: Array[Byte]): Option[(Array[Byte], Int)] = {
      if (!isGif(b)) return None
      val packed = b(10) & 0xff
      var off = 13
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        if (off + 3 * n > b.length) return None
        gct = java.util.Arrays.copyOfRange(b, off, off + 3 * n)
        off += 3 * n
      }
      Some((gct, off))
    }

    /** First-frame GIF decode — the frame that identifies the picture
      * keys every store/hash in the image family; any structural
      * violation returns None and the payload falls back to byte
      * statistics. The ANIMATION surface (frame count, duration,
      * per-frame hashes) is [[gifFrames]].
      */
    private[ext] def gifRgb(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = try {
      val (gct, start) = gifHeader(b) match {
        case Some(v) => v
        case None    => return None
      }
      var off = start
      while (off < b.length) {
        (b(off) & 0xff) match {
          case 0x21 => // extension block: label, then data sub-blocks
            off += 2
            while (off < b.length && (b(off) & 0xff) != 0)
              off += 1 + (b(off) & 0xff)
            off += 1
          case 0x2c => // image descriptor: the first frame is the hash
            return gifFrameAt(b, off, gct).map(f =>
              (gifFrameRgb(f), f.fw, f.fh))
          case 0x3b => return None // trailer before any frame
          case _ => return None
        }
      }
      None
    } catch { case scala.util.control.NonFatal(_) => None }

    // --------------------------------------- animation canvas compositing
    //
    // The three animation containers (GIF, APNG, animated WebP) share
    // one landmark model: each frame composites onto a logical-screen
    // RGBA canvas (per the container's disposal/blend rules) and the
    // landmark is the dHashPixels grid over the canvas's gray plane.
    // Compositing — not region hashing — is what lets a DELTA-encoded
    // animation (frames shipped as changed regions) share landmarks
    // with a full-frame re-encode of the same animation, and lets the
    // same frames pair ACROSS containers. The canvas starts transparent
    // black and "restore to background" clears to transparent black in
    // every container (GIF's background-color-index is famously ignored
    // by real renderers; a deterministic shared convention is what the
    // cross-container identity needs).

    /** Clear a canvas region to transparent black (disposal 2 /
      * dispose-to-background), clipped to the canvas.
      */
    private def clearRegion(canvas: Array[Byte], cw: Int, ch: Int,
        left: Int, top: Int, fw: Int, fh: Int): Unit = {
      var y = math.max(0, top)
      val yEnd = math.min(ch, top + fh)
      val x0 = math.max(0, left)
      val xEnd = math.min(cw, left + fw)
      if (x0 >= xEnd) return // region entirely past an edge: no-op clear
      while (y < yEnd) {
        java.util.Arrays.fill(canvas, (y * cw + x0) * 4, (y * cw + xEnd) * 4,
          0.toByte)
        y += 1
      }
    }

    /** The animated-GIF frame surface, one walk: frame COUNT, total
      * presentation DURATION (the sum of each frame's Graphic Control
      * Extension delay, centiseconds — frames without a GCE contribute
      * 0: the "browsers clamp tiny delays" floor is a rendering policy,
      * not container data), and a per-frame perceptual hash for the
      * first `maxHashFrames` frames.
      *
      * Chosen invariance, documented: frames are LANDMARKS — two cuts
      * of the same animation that differ by a dropped/added intro frame
      * still share every remaining frame hash, so a shared-frame-count
      * rule pairs them (spec-held) where the single first-frame store
      * key cannot. Each landmark hashes the COMPOSITED logical-screen
      * canvas — frame blitted at its (left, top) with transparent
      * pixels skipped, then the GCE disposal applied (none/keep;
      * restore-background clears the region to transparent black;
      * restore-previous reverts the canvas) — so a delta-encoded
      * animation and a full-frame re-encode of the same animation share
      * every landmark (spec-held). For the common full-canvas opaque
      * frame the canvas IS the frame plane, so those hashes equal the
      * plain frame-plane hashes. A degenerate logical screen (zero or
      * past [[MaxHashPixels]]) falls back to hashing each frame's own
      * region plane — the documented honest fallback.
      *
      * Frame-count rule, identical in the hashed and structural
      * branches: a frame COUNTS iff its whole block (through the
      * sub-block terminator) is present. A structurally complete frame
      * whose PIXELS are unrecoverable (corrupt LZW, out-of-table index,
      * oversized plane) still counts — the landmark walk just ends
      * there (compositing past an undecodable frame would hash canvases
      * the renderer never shows), so frameCount always agrees with
      * [[gifAnimTable]]'s structural count.
      *
      * None when the payload is not a structurally valid GIF or has no
      * complete frame (truncation degrades, never throws).
      */
    private[graft] def gifFrames(b: Array[Byte],
        maxHashFrames: Int = 64): Option[GifAnim] = try {
      val (gct, start) = gifHeader(b) match {
        case Some(v) => v
        case None    => return None
      }
      val cw = (b(6) & 0xff) | ((b(7) & 0xff) << 8)
      val ch = (b(8) & 0xff) | ((b(9) & 0xff) << 8)
      val canvasOk = cw > 0 && ch > 0 && cw.toLong * ch <= MaxHashPixels
      val canvas =
        if (canvasOk && maxHashFrames > 0) new Array[Byte](cw * ch * 4)
        else null
      var off = start
      var frames = 0
      var delayCs = 0L
      var pendingDelay = 0L
      var pendingDisposal = 0
      var pendingTransp = -1
      val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      var hashing = maxHashFrames > 0
      var done = false
      while (!done && off < b.length) {
        (b(off) & 0xff) match {
          case 0x21 =>
            // Graphic Control Extension: packed disposal/transparency
            // byte, delay in centiseconds (little-endian), transparent
            // index — all applying to the NEXT frame; the delay counts
            // only when that frame materializes (a trailing or orphaned
            // GCE must not inflate the duration)
            if (off + 1 < b.length && (b(off + 1) & 0xff) == 0xf9 &&
                off + 7 < b.length && (b(off + 2) & 0xff) >= 4) {
              val packed = b(off + 3) & 0xff
              pendingDelay =
                (b(off + 4) & 0xff) | ((b(off + 5) & 0xff) << 8)
              pendingDisposal = (packed >> 2) & 7
              pendingTransp =
                if ((packed & 1) != 0) b(off + 6) & 0xff else -1
            }
            off += 2
            while (off < b.length && (b(off) & 0xff) != 0)
              off += 1 + (b(off) & 0xff)
            off += 1
          case 0x2c =>
            val decoded =
              if (hashing && hashes.length < maxHashFrames)
                gifFrameAt(b, off, gct)
              else None
            decoded match {
              case Some(f) if f.end >= 0 =>
                frames += 1
                delayCs += pendingDelay
                if (canvas != null) {
                  val prev =
                    if (pendingDisposal == 3) canvas.clone() else null
                  // blit: transparent pixels leave the canvas untouched
                  var y = math.max(0, -f.top)
                  while (y < f.fh && f.top + y < ch) {
                    var x = math.max(0, -f.left)
                    while (x < f.fw && f.left + x < cw) {
                      val ci = f.idx(y * f.fw + x) & 0xff
                      if (ci != pendingTransp) {
                        val po = ((f.top + y) * cw + (f.left + x)) * 4
                        canvas(po) = f.ct(ci * 3)
                        canvas(po + 1) = f.ct(ci * 3 + 1)
                        canvas(po + 2) = f.ct(ci * 3 + 2)
                        canvas(po + 3) = -1
                      }
                      x += 1
                    }
                    y += 1
                  }
                  hashes += graft.functions.DHashPixels.computeGrid(
                    toGray(canvas, 4), cw, ch)
                  pendingDisposal match {
                    case 2 =>
                      clearRegion(canvas, cw, ch, f.left, f.top, f.fw, f.fh)
                    case 3 =>
                      if (prev != null)
                        System.arraycopy(prev, 0, canvas, 0, canvas.length)
                    case _ => ()
                  }
                } else // degenerate screen: region-plane fallback
                  hashes += graft.functions.DHashPixels.computeGrid(
                    toGray(gifFrameRgb(f), 3), f.fw, f.fh)
                pendingDelay = 0; pendingDisposal = 0; pendingTransp = -1
                off = f.end
              case _ =>
                // structural count (pixels not needed, not recoverable,
                // or past the hashed prefix): the frame still counts
                // when its whole block is present; an unrecoverable
                // frame additionally ENDS the landmark walk — the
                // canvas state past it is unknowable
                val end = gifFrameSkip(b, off)
                if (end < 0) done = true // truncation degrades
                else {
                  if (hashing && hashes.length < maxHashFrames)
                    hashing = false // pixel-decode failure: no more landmarks
                  frames += 1
                  delayCs += pendingDelay
                  pendingDelay = 0; pendingDisposal = 0; pendingTransp = -1
                  off = end
                }
            }
          case 0x3b => done = true
          case _ => done = true
        }
      }
      if (frames == 0) None
      else Some(GifAnim(frames, delayCs, hashes.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Expand interleaved 1/2/3/4-channel samples to RGBA (gray
      * replicates, missing alpha is opaque) — the canvas-side pixel
      * form the APNG/WebP compositors blit.
      */
    private def toRgba(px: Array[Byte], channels: Int): Array[Byte] =
      channels match {
        case 4 => px
        case _ =>
          val n = px.length / channels
          val out = new Array[Byte](n * 4)
          var i = 0
          while (i < n) {
            val o = i * 4
            channels match {
              case 1 =>
                out(o) = px(i); out(o + 1) = px(i); out(o + 2) = px(i)
                out(o + 3) = -1
              case 2 =>
                out(o) = px(i * 2); out(o + 1) = px(i * 2)
                out(o + 2) = px(i * 2); out(o + 3) = px(i * 2 + 1)
              case _ =>
                out(o) = px(i * 3); out(o + 1) = px(i * 3 + 1)
                out(o + 2) = px(i * 3 + 2); out(o + 3) = -1
            }
            i += 1
          }
          out
      }

    /** Blit an RGBA region onto the canvas at (x0, y0), clipped.
      * `over` applies Porter-Duff OVER exactly as APNG/WebP specify it:
      * binary-alpha pixels (fa 255 → copy, fa 0 → canvas stands) take
      * the exact integer fast path — that is the overwhelming real-
      * animation case — and fractional alpha composites in double
      * precision (oa = fa + ba·(1−fa), c = (fc·fa + bc·ba·(1−fa)) / oa
      * on [0,1]-normalized values) with round-half-up quantization back
      * to 8 bits, so a fade composited here lands the same bytes as the
      * spec's float-reference computation. Otherwise SOURCE (copy,
      * alpha included).
      */
    private def blitRgba(canvas: Array[Byte], cw: Int, ch: Int,
        frame: Array[Byte], fw: Int, fh: Int, x0: Int, y0: Int,
        over: Boolean): Unit = {
      var y = 0
      while (y < fh && y0 + y < ch) {
        var x = 0
        while (x < fw && x0 + x < cw) {
          val fo = (y * fw + x) * 4
          val po = ((y0 + y) * cw + (x0 + x)) * 4
          val fa = frame(fo + 3) & 0xff
          if (!over || fa == 255) {
            canvas(po) = frame(fo); canvas(po + 1) = frame(fo + 1)
            canvas(po + 2) = frame(fo + 2); canvas(po + 3) = frame(fo + 3)
          } else if (fa > 0) {
            val ba = canvas(po + 3) & 0xff
            val faf = fa / 255.0
            val bw = (ba / 255.0) * (1.0 - faf) // background weight
            val oaf = faf + bw
            // oaf >= faf > 0 here, so the quotient is always defined
            def mix(fc: Int, bc: Int): Byte =
              math.min(255L,
                math.round((fc * faf + bc * bw) / oaf)).toByte
            canvas(po) = mix(frame(fo) & 0xff, canvas(po) & 0xff)
            canvas(po + 1) = mix(frame(fo + 1) & 0xff, canvas(po + 1) & 0xff)
            canvas(po + 2) = mix(frame(fo + 2) & 0xff, canvas(po + 2) & 0xff)
            canvas(po + 3) = math.round(oaf * 255.0).toInt.min(255).toByte
          } // fa == 0 under OVER: the canvas pixel stands
          x += 1
        }
        y += 1
      }
    }

    /** The APNG animation surface — the [[gifFrames]] model on PNG's
      * animation chunks: `acTL` (must precede IDAT) declares the
      * animation, each `fcTL` (sequenced) positions one frame on the
      * logical screen with its delay/dispose/blend, and the frame's
      * pixels arrive either as the IDAT itself (when its fcTL precedes
      * IDAT — the common exporter layout) or as `fdAT` chunks (fcTL's
      * data with a 4-byte sequence prefix). Every frame is a complete
      * zlib stream over its own fw×fh scanlines at the image's
      * depth/color type, decoded by the exact machinery the static
      * path uses ([[pngExpand]] — inflate, unfilter, palette/16-bit/
      * sub-byte expansion, Adam7).
      *
      * Frame COUNT is structural (every fcTL walked), duration the
      * num·1000/den millisecond fold (delay_den 0 reads as 100 per
      * spec), and landmarks the composited-canvas hashes of the hashed
      * prefix under the shared convention: transparent-black canvas,
      * blend SOURCE/OVER per fcTL, dispose none/background(region
      * clears to transparent black)/previous, dispose-previous on the
      * first frame treated as background (spec rule). A frame whose
      * pixels fail to decode or whose region leaves the canvas ends
      * the landmark walk but still counts — the [[gifFrames]] rule, so
      * hashed and structural walks agree on every input. Sequence
      * numbers are validated consecutive (a shuffled file is
      * malformed, not reinterpreted); consumed chunks are CRC-checked.
      * None for static PNGs (no acTL) and anything malformed before
      * the first complete frame.
      */
    private[graft] def apngFrames(b: Array[Byte],
        maxHashFrames: Int = 64): Option[AnimSurface] = try {
      val (w, h, bitDepth, colorType) = pngHeader(b) match {
        case Some(v) => v
        case None    => return None
      }
      val interlace = b(28) & 0xff
      if ((b(26) & 0xff) != 0 || (b(27) & 0xff) != 0 || interlace > 1)
        return None
      final case class Fc(fw: Int, fh: Int, x: Int, y: Int,
          delayNum: Int, delayDen: Int, dispose: Int, blend: Int,
          data: java.io.ByteArrayOutputStream)
      val frames = scala.collection.mutable.ArrayBuffer.empty[Fc]
      var palette: Array[Byte] = null
      var trns: Array[Byte] = null
      var hasActl = false
      var sawIdat = false
      var expectedSeq = 0
      var off = 8 + 4 + 4 + 13 + 4
      var done = false
      def crcOk(o: Int, sz: Int): Boolean = {
        val crc = new java.util.zip.CRC32
        crc.update(b, o + 4, 4 + sz)
        crc.getValue == u32be(b, o + 8 + sz)
      }
      while (!done && off + 8 <= b.length) {
        val sz = u32be(b, off).toInt
        if (sz < 0 || off + 12 + sz > b.length) done = true // truncated
        else {
          val id = tag(b, off + 4)
          val po = off + 8
          id match {
            case "acTL" =>
              if (sawIdat || sz < 8 || !crcOk(off, sz)) return None
              hasActl = true
            case "PLTE" =>
              if (sz == 0 || sz % 3 != 0 || sz > 3 * 256 ||
                !crcOk(off, sz)) return None
              palette = java.util.Arrays.copyOfRange(b, po, po + sz)
            case "tRNS" if colorType == 3 => // palette alphas (optimizer
              if (sz > 256 || !crcOk(off, sz)) return None // delta frames)
              trns = java.util.Arrays.copyOfRange(b, po, po + sz)
            case "fcTL" =>
              if (sz != 26 || !crcOk(off, sz)) return None
              if (u32be(b, po) != expectedSeq) return None
              expectedSeq += 1
              frames += Fc(u32be(b, po + 4).toInt, u32be(b, po + 8).toInt,
                u32be(b, po + 12).toInt, u32be(b, po + 16).toInt,
                ((b(po + 20) & 0xff) << 8) | (b(po + 21) & 0xff),
                ((b(po + 22) & 0xff) << 8) | (b(po + 23) & 0xff),
                b(po + 24) & 0xff, b(po + 25) & 0xff,
                new java.io.ByteArrayOutputStream())
            case "IDAT" =>
              if (!crcOk(off, sz)) return None
              sawIdat = true
              // an fcTL before IDAT makes the default image frame 1;
              // otherwise the default image is hidden from the animation
              if (frames.length == 1) frames.head.data.write(b, po, sz)
            case "fdAT" =>
              if (sz < 4 || frames.isEmpty || !crcOk(off, sz)) return None
              if (u32be(b, po) != expectedSeq) return None
              expectedSeq += 1
              frames.last.data.write(b, po + 4, sz - 4)
            case "IEND" => done = true
            case _ => ()
          }
          off += 12 + sz
        }
      }
      if (!hasActl || frames.isEmpty) return None
      val durationMs = frames.iterator.map { f =>
        val den = if (f.delayDen == 0) 100 else f.delayDen
        f.delayNum.toLong * 1000 / den
      }.sum
      val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      if (maxHashFrames > 0 && w.toLong * h <= MaxHashPixels) {
        val canvas = new Array[Byte](w * h * 4)
        var i = 0
        var ok = true
        while (ok && i < frames.length && hashes.length < maxHashFrames) {
          val f = frames(i)
          val regionOk = f.fw > 0 && f.fh > 0 && f.x >= 0 && f.y >= 0 &&
            f.x + f.fw <= w && f.y + f.fh <= h
          val px =
            if (regionOk)
              pngExpand(f.data.toByteArray, palette, trns, f.fw, f.fh,
                bitDepth, colorType, interlace)
            else None
          px match {
            case Some((samples, channels)) =>
              val dispose = if (i == 0 && f.dispose == 2) 1 else f.dispose
              val prev = if (dispose == 2) canvas.clone() else null
              blitRgba(canvas, w, h, toRgba(samples, channels),
                f.fw, f.fh, f.x, f.y, over = f.blend == 1)
              hashes += graft.functions.DHashPixels.computeGrid(
                toGray(canvas, 4), w, h)
              dispose match {
                case 1 => clearRegion(canvas, w, h, f.x, f.y, f.fw, f.fh)
                case 2 => System.arraycopy(prev, 0, canvas, 0, canvas.length)
                case _ => ()
              }
            case None => ok = false // landmarks end; the count stands
          }
          i += 1
        }
      }
      Some(AnimSurface(frames.length, durationMs, hashes.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

    private def u24le(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16)

    /** The animated-WebP surface — the [[gifFrames]] model on RIFF
      * `ANMF` chunks: VP8X declares the animation (flag 0x02) and the
      * canvas geometry, each ANMF carries one frame's position (stored
      * halved), size (minus one), duration in EXACT milliseconds, and
      * a flags byte (bit 0: dispose to background; bit 1: do NOT
      * blend), followed by the frame's own image subchunks. Lossless
      * (VP8L) frames decode through [[Vp8l]] — alpha included — and
      * composite under the shared canvas convention (transparent-black
      * init and background, OVER per [[blitRgba]]); a lossy (VP8)
      * frame is the documented codec boundary: it still COUNTS (the
      * ANMF header is container data) but ends the landmark walk, the
      * [[gifFrames]] rule. Frame count is structural over the ANMF
      * walk; duration the exact millisecond sum. None when the payload
      * is not an animated WebP or malformed before the first ANMF.
      */
    private[graft] def webpAnimFrames(b: Array[Byte],
        maxHashFrames: Int = 64): Option[AnimSurface] = try {
      if (!isWebp(b)) return None
      var cw = 0
      var chh = 0
      var anim = false
      var frames = 0
      var durationMs = 0L
      val hashes = scala.collection.mutable.ArrayBuffer.empty[Long]
      var hashing = maxHashFrames > 0
      var canvas: Array[Byte] = null
      var off = 12
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val sz = u32le(b, off + 4)
        val po = off + 8
        if (sz < 0 || po + sz > b.length) return if (frames > 0)
          Some(AnimSurface(frames, durationMs, hashes.toArray)) else None
        id match {
          case "VP8X" if sz >= 10 =>
            anim = (b(po) & 0x02) != 0
            cw = u24le(b, po + 4) + 1
            chh = u24le(b, po + 7) + 1
          case "ANMF" if anim && sz >= 16 =>
            val fx = u24le(b, po) * 2
            val fy = u24le(b, po + 3) * 2
            val fw = u24le(b, po + 6) + 1
            val fh = u24le(b, po + 9) + 1
            durationMs += u24le(b, po + 12)
            val flags = b(po + 15) & 0xff
            frames += 1
            if (hashing && hashes.length < maxHashFrames) {
              if (canvas == null) {
                if (cw > 0 && chh > 0 && cw.toLong * chh <= MaxHashPixels)
                  canvas = new Array[Byte](cw * chh * 4)
                else hashing = false
              }
              // the frame's own subchunk walk to its VP8L payload
              var so = po + 16
              var rgba: Array[Byte] = null
              var decodable = true
              while (rgba == null && decodable && so + 8 <= po + sz) {
                val sid = tag(b, so)
                val ssz = u32le(b, so + 4)
                if (ssz < 0 || so + 8 + ssz > po + sz) decodable = false
                else if (sid == "VP8L")
                  Vp8l.decodeArgb(b, so + 8, ssz.toInt, MaxHashPixels) match {
                    case Some((argb, aw, ah)) if aw == fw && ah == fh =>
                      rgba = new Array[Byte](argb.length * 4)
                      var i = 0
                      while (i < argb.length) {
                        val p = argb(i)
                        rgba(i * 4) = ((p >>> 16) & 0xff).toByte
                        rgba(i * 4 + 1) = ((p >>> 8) & 0xff).toByte
                        rgba(i * 4 + 2) = (p & 0xff).toByte
                        rgba(i * 4 + 3) = (p >>> 24).toByte
                        i += 1
                      }
                    case _ => decodable = false
                  }
                else if (sid == "VP8 ") decodable = false // codec boundary
                else so += 8 + ssz.toInt + (ssz.toInt & 1)
              }
              if (canvas != null && rgba != null &&
                  fx + fw <= cw && fy + fh <= chh) {
                blitRgba(canvas, cw, chh, rgba, fw, fh, fx, fy,
                  over = (flags & 0x02) == 0) // bit 1 SET = do not blend
                hashes += graft.functions.DHashPixels.computeGrid(
                  toGray(canvas, 4), cw, chh)
                if ((flags & 0x01) != 0) // dispose to background
                  clearRegion(canvas, cw, chh, fx, fy, fw, fh)
              } else hashing = false // landmarks end; the count stands
            }
          case _ => ()
        }
        off = po + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
      if (!anim || frames == 0) None
      else Some(AnimSurface(frames, durationMs, hashes.toArray))
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Container dispatch for the cross-container animation surface:
      * GIF (centiseconds × 10), APNG, animated WebP — one landmark
      * model (see [[AnimSurface]]), so [[Multimodal.animDups]] pairs
      * cuts of one animation ACROSS containers.
      */
    private[graft] def animFrames(b: Array[Byte],
        maxHashFrames: Int = 64): Option[(String, AnimSurface)] =
      if (b == null) None
      else if (isGif(b))
        gifFrames(b, maxHashFrames).map(g =>
          ("gif", AnimSurface(g.frameCount, g.delayCs * 10, g.frameHashes)))
      else if (isPng(b)) apngFrames(b, maxHashFrames).map(("apng", _))
      else if (isWebp(b)) webpAnimFrames(b, maxHashFrames).map(("webp", _))
      else None

    /** BMP (BITMAPINFOHEADER and later) to interleaved RGB: 8-bit
      * paletted, 24-bit BGR, and 32-bit BGRA rows, 4-byte row padding,
      * bottom-up (positive height) or top-down (negative) — the
      * uncompressed workhorse format a crawl still sees — plus BI_RLE8
      * runs (encoded/absolute modes, EOL/EOD/delta escapes, skipped
      * pixels as palette entry 0), the legacy clipart compression. RLE4
      * and bitfield compressions return None (fall back to byte stats).
      */
    private[ext] def bmpRgb(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = try {
      if (!isBmp(b)) return None
      def i32(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
      def u16(o: Int) = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
      val dataOff = i32(10)
      val hdrSize = i32(14)
      if (hdrSize < 40) return None // BITMAPCOREHEADER is pre-Windows-3
      val w = i32(18)
      val hRaw = i32(22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      val bits = u16(28)
      val comp = i32(30)
      val rle8 = comp == 1 && bits == 8 && !topDown // RLE is bottom-up only
      if ((comp != 0 && !rle8) || w <= 0 || h <= 0 ||
        w.toLong * h > MaxHashPixels) return None
      val rowSize = ((w.toLong * bits + 31) / 32 * 4).toInt
      if (dataOff < 54 ||
        (!rle8 && dataOff.toLong + rowSize.toLong * h > b.length))
        return None
      val bypp = bits / 8
      val out = new Array[Byte](w * h * 3)
      if (rle8) {
        // BI_RLE8: encoded runs (count, index), escapes (0,0)=end of
        // line, (0,1)=end of bitmap, (0,2)=delta (dx, dy), (0,n>=3)=
        // n literal indices padded to a word boundary. Skipped pixels
        // (deltas / early EOL / early EOD) read as palette entry 0 per
        // the de-facto convention. Rows are bottom-up.
        val palOff = 14 + hdrSize
        val used = i32(46)
        val palCount = if (used == 0) 256 else used
        if (palCount < 0 || palCount > 256 ||
          palOff + 4 * palCount > dataOff) return None
        val idx = new Array[Byte](w * h) // defaults to index 0
        var p = dataOff
        var x = 0
        var row = 0 // counted from the BOTTOM row
        var end = false
        while (!end && row < h) {
          if (p + 2 > b.length) return None // truncated stream
          val n = b(p) & 0xff
          val v = b(p + 1) & 0xff
          p += 2
          if (n > 0) { // encoded run; clipped defensively at the row end
            var i = 0
            while (i < n) {
              if (x < w) idx((h - 1 - row) * w + x) = v.toByte
              x += 1; i += 1
            }
          } else v match {
            case 0 => x = 0; row += 1 // end of line
            case 1 => end = true      // end of bitmap
            case 2 =>                 // delta: skip (dx, dy) pixels
              if (p + 2 > b.length) return None
              x += b(p) & 0xff; row += b(p + 1) & 0xff; p += 2
            case cnt =>               // absolute: cnt literal indices
              if (p + cnt > b.length) return None
              var i = 0
              while (i < cnt) {
                if (x < w && row < h) idx((h - 1 - row) * w + x) = b(p + i)
                x += 1; i += 1
              }
              p += cnt + (cnt & 1)    // word-aligned
          }
        }
        var py = 0
        while (py < h) {
          var px = 0
          while (px < w) {
            val ci = idx(py * w + px) & 0xff
            if (ci >= palCount) return None
            val eo = palOff + ci * 4
            val po = (py * w + px) * 3
            out(po) = b(eo + 2); out(po + 1) = b(eo + 1); out(po + 2) = b(eo)
            px += 1
          }
          py += 1
        }
        return Some((out, w, h))
      }
      bits match {
        case 24 | 32 =>
          var y = 0
          while (y < h) {
            val src = dataOff + (if (topDown) y else h - 1 - y) * rowSize
            var x = 0
            while (x < w) {
              val so = src + x * bypp
              val po = (y * w + x) * 3
              out(po) = b(so + 2)     // R (rows are BGR[A])
              out(po + 1) = b(so + 1) // G
              out(po + 2) = b(so)     // B
              x += 1
            }
            y += 1
          }
          Some((out, w, h))
        case 8 | 4 | 1 => // paletted, incl. the 16/2-color icon classics
          val palOff = 14 + hdrSize
          val used = i32(46)
          val palCount = if (used == 0) 1 << bits else used
          if (palCount < 0 || palCount > (1 << bits) ||
            palOff + 4 * palCount > dataOff) return None
          var y = 0
          while (y < h) {
            val src = dataOff + (if (topDown) y else h - 1 - y) * rowSize
            var x = 0
            while (x < w) {
              // sub-byte rows pack MSB-first (leftmost pixel in the
              // high bits), the BMP convention
              val ci = bits match {
                case 8 => b(src + x) & 0xff
                case 4 => (b(src + (x >> 1)) >> (4 - 4 * (x & 1))) & 0xf
                case _ => (b(src + (x >> 3)) >> (7 - (x & 7))) & 1
              }
              if (ci >= palCount) return None
              val eo = palOff + ci * 4 // entries are BGRA quads
              val po = (y * w + x) * 3
              out(po) = b(eo + 2); out(po + 1) = b(eo + 1); out(po + 2) = b(eo)
              x += 1
            }
            y += 1
          }
          Some((out, w, h))
        case _ => None
      }
    } catch { case scala.util.control.NonFatal(_) => None }

    /** EXIF provenance fields from any container that carries an EXIF
      * blob — JPEG APP1, bare TIFF, PNG's `eXIf` chunk (a raw TIFF
      * payload, CRC-checked like every consumed PNG chunk), and WebP's
      * `EXIF` RIFF chunk (raw TIFF, with or without the JPEG-style
      * "Exif\0\0" prefix — both ship in the wild): (orientation, make,
      * model, takenAt, lat, lon) — the camera/time/LOCATION metadata a
      * curation pipeline mines for dedup attribution, time-range
      * filtering, and privacy screening (embedded GPS is PII a
      * training corpus must be able to surface and strip). The IFD
      * walk itself is container-independent; only the envelope hop
      * differs. A self-contained bounds-checked IFD walk in either
      * byte order: IFD0 tags 271/272/274/306, DateTimeOriginal (36867)
      * behind the ExifIFD pointer (34665), and GPSLatitude/Longitude
      * (signed decimal degrees from the ref + 3-RATIONAL d/m/s form)
      * behind the GPSInfo pointer (34853 — its IFD has its OWN tag
      * namespace, so it walks with a dedicated handler). None when no
      * EXIF is present — total, like every parser here.
      */
    private[graft] def exifOf(b: Array[Byte])
        : Option[(Option[Int], Option[String], Option[String],
          Option[String], Option[Double], Option[Double])] = try {
      val base: Int =
        if (isTiff(b)) 0
        else if (isJpeg(b)) {
          // walk JPEG segments to APP1 "Exif\0\0"
          var off = 2
          var found = -1
          while (found < 0 && off + 4 <= b.length &&
            (b(off) & 0xff) == 0xff) {
            val marker = b(off + 1) & 0xff
            if (marker == 0xda || marker == 0xd9) return None // SOS/EOI
            val len = ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
            if (len < 2 || off + 2 + len > b.length) return None
            if (marker == 0xe1 && len >= 8 + 6 &&
              b(off + 4) == 'E' && b(off + 5) == 'x' && b(off + 6) == 'i' &&
              b(off + 7) == 'f' && b(off + 8) == 0 && b(off + 9) == 0)
              found = off + 10
            off += 2 + len
          }
          if (found < 0) return None
          found
        } else if (isPng(b)) {
          // walk the chunks to a CRC-valid eXIf (payload = bare TIFF)
          var off = 8
          var found = -1
          while (found < 0 && off + 8 <= b.length) {
            val sz = u32be(b, off).toInt
            if (sz < 0 || off + 12 + sz > b.length) return None
            val id = tag(b, off + 4)
            if (id == "eXIf") {
              val crc = new java.util.zip.CRC32
              crc.update(b, off + 4, 4 + sz)
              if (crc.getValue != u32be(b, off + 8 + sz)) return None
              found = off + 8
            } else if (id == "IEND") return None
            off += 12 + sz
          }
          if (found < 0) return None
          found
        } else if (isWebp(b)) {
          // walk the RIFF chunks to EXIF; skip an optional Exif\0\0 hdr
          var off = 12
          var found = -1
          while (found < 0 && off + 8 <= b.length) {
            val sz = u32le(b, off + 4)
            val po = off + 8
            if (sz < 0 || po + sz > b.length) return None
            if (tag(b, off) == "EXIF")
              found =
                if (sz >= 6 && b(po) == 'E' && b(po + 1) == 'x' &&
                  b(po + 2) == 'i' && b(po + 3) == 'f' &&
                  b(po + 4) == 0 && b(po + 5) == 0) po + 6
                else po
            off = po + sz.toInt + (sz.toInt & 1) // word-aligned
          }
          if (found < 0) return None
          found
        } else return None
      if (base + 8 > b.length) return None
      val le = b(base) == 'I' && b(base + 1) == 'I'
      if (!le && !(b(base) == 'M' && b(base + 1) == 'M')) return None
      def u16(o: Int): Int =
        if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      def u32(o: Int): Long =
        if (le) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
        else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
      if (u16(base + 2) != 42) return None
      var orientation: Option[Int] = None
      var make, model, taken: Option[String] = None
      var latRef, lonRef: Option[String] = None
      var latAbs, lonAbs: Option[Double] = None
      def ascii(typ: Int, count: Long, vo: Int): Option[String] = {
        if (typ != 2 || count <= 0 || count > 4096) return None
        val off =
          if (count <= 4) vo.toLong else base + u32(vo)
        if (off < 0 || off + count > b.length) return None
        val raw = new String(b, off.toInt, count.toInt - 1, "US-ASCII")
        Some(raw.takeWhile(_ != '\u0000'))
      }
      def walk(ifdOff: Long, depth: Int): Unit = {
        if (depth > 2 || ifdOff < 8 || base + ifdOff + 2 > b.length) return
        val io = (base + ifdOff).toInt
        val n = u16(io)
        if (io + 2 + n * 12 > b.length) return
        var e = 0
        while (e < n) {
          val eo = io + 2 + e * 12
          val tag = u16(eo)
          val typ = u16(eo + 2)
          val count = u32(eo + 4)
          val vo = eo + 8
          tag match {
            case 274 if typ == 3 => orientation = Some(u16(vo))
            case 271 => make = ascii(typ, count, vo)
            case 272 => model = ascii(typ, count, vo)
            case 306 if taken.isEmpty => taken = ascii(typ, count, vo)
            case 36867 => taken = ascii(typ, count, vo) // DateTimeOriginal
            case 34665 if typ == 4 => walk(u32(vo), depth + 1)
            case 34853 if typ == 4 => walkGps(u32(vo))
            case _ => ()
          }
          e += 1
        }
      }
      // d/m/s as three unsigned RATIONALs (always external: 24 bytes)
      def gpsCoord(typ: Int, count: Long, vo: Int): Option[Double] = {
        if (typ != 5 || count != 3) return None
        val off = base + u32(vo)
        if (off < 0 || off + 24 > b.length) return None
        def rat(o: Long): Option[Double] = {
          val den = u32((o + 4).toInt)
          if (den == 0) None else Some(u32(o.toInt).toDouble / den)
        }
        for (d <- rat(off); m <- rat(off + 8); s <- rat(off + 16))
          yield d + m / 60.0 + s / 3600.0
      }
      def walkGps(ifdOff: Long): Unit = {
        if (ifdOff < 8 || base + ifdOff + 2 > b.length) return
        val io = (base + ifdOff).toInt
        val n = u16(io)
        if (io + 2 + n * 12 > b.length) return
        var e = 0
        while (e < n) {
          val eo = io + 2 + e * 12
          val tag = u16(eo)
          val typ = u16(eo + 2)
          val count = u32(eo + 4)
          val vo = eo + 8
          tag match { // the GPS IFD's own namespace
            case 1 => latRef = ascii(typ, count, vo)
            case 2 => latAbs = gpsCoord(typ, count, vo)
            case 3 => lonRef = ascii(typ, count, vo)
            case 4 => lonAbs = gpsCoord(typ, count, vo)
            case _ => ()
          }
          e += 1
        }
      }
      walk(u32(base + 4), 0)
      val lat = latAbs.map(v => if (latRef.contains("S")) -v else v)
      val lon = lonAbs.map(v => if (lonRef.contains("W")) -v else v)
      if (orientation.isEmpty && make.isEmpty && model.isEmpty &&
        taken.isEmpty && lat.isEmpty && lon.isEmpty) None
      else Some((orientation, make, model, taken, lat, lon))
    } catch { case scala.util.control.NonFatal(_) => None }

    private[ext] def isIco(b: Array[Byte]): Boolean =
      b.length >= 22 && b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0 &&
        u16le(b, 4) >= 1

    /** ICO (favicon) pixel decode by REUSE: each directory entry is
      * either a complete PNG (decoded through the existing PNG path)
      * or a headerless BMP DIB with DOUBLED height (XOR image + AND
      * mask) — re-wrapped with a synthesized file header and decoded
      * through the existing BMP path, mask ignored. The largest entry
      * wins (the icon actually representative of the image). Alpha is
      * dropped like everywhere in the family.
      */
    private[ext] def icoRgb(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = try {
      if (!isIco(b)) return None
      val count = u16le(b, 4)
      var best = -1
      var bestArea = -1L
      var e = 0
      while (e < count) {
        val eo = 6 + e * 16
        if (eo + 16 > b.length) return None
        val w = { val v = b(eo) & 0xff; if (v == 0) 256 else v }
        val h = { val v = b(eo + 1) & 0xff; if (v == 0) 256 else v }
        if (w.toLong * h > bestArea) { bestArea = w.toLong * h; best = e }
        e += 1
      }
      val eo = 6 + best * 16
      val size = u32le(b, eo + 8)
      val off = u32le(b, eo + 12)
      if (off < 0 || size <= 0 || off + size > b.length) return None
      val payload =
        java.util.Arrays.copyOfRange(b, off.toInt, (off + size).toInt)
      if (isPng(payload))
        return pngHeader(payload).flatMap { case (w, h, bitDepth, colorType) =>
          if (w.toLong * h > MaxHashPixels) None
          else pngInterleaved(payload, w, h, bitDepth, colorType).map {
            case (px, channels) => (expandRgb(px, channels), w, h)
          }
        }
      // BMP DIB: BITMAPINFOHEADER with biHeight doubled for the AND
      // mask — halve it and wrap in a file header for the BMP decoder
      if (payload.length < 40 || u32le(payload, 0) != 40) return None
      val biHeight = u32le(payload, 8).toInt
      val realH = biHeight / 2
      val bits = u16le(payload, 14)
      val palEntries =
        if (bits >= 16) 0
        else {
          val declared = u32le(payload, 32).toInt
          if (declared > 0) declared else 1 << bits
        }
      val dib = payload.clone()
      def le32(o: Int, v: Int): Unit = {
        dib(o) = v.toByte; dib(o + 1) = (v >> 8).toByte
        dib(o + 2) = (v >> 16).toByte; dib(o + 3) = (v >> 24).toByte
      }
      le32(8, realH)
      val out = new Array[Byte](14 + dib.length)
      out(0) = 'B'; out(1) = 'M'
      def ole32(o: Int, v: Int): Unit = {
        out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
        out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
      }
      ole32(2, out.length)
      ole32(10, 14 + 40 + palEntries * 4)
      System.arraycopy(dib, 0, out, 14, dib.length)
      bmpRgb(out)
    } catch { case scala.util.control.NonFatal(_) => None }

    /** Interleaved PNG samples (gray / gray+alpha / RGB / RGBA) to RGB
      * triplets — gray replicates, alpha drops.
      */
    private def expandRgb(px: Array[Byte], channels: Int): Array[Byte] = {
      val n = px.length / channels
      val out = new Array[Byte](n * 3)
      var i = 0
      while (i < n) {
        val o = i * channels
        if (channels >= 3) {
          out(i * 3) = px(o); out(i * 3 + 1) = px(o + 1)
          out(i * 3 + 2) = px(o + 2)
        } else {
          out(i * 3) = px(o); out(i * 3 + 1) = px(o); out(i * 3 + 2) = px(o)
        }
        i += 1
      }
      out
    }

    private[ext] def isTiff(b: Array[Byte]): Boolean =
      b.length >= 8 &&
        ((b(0) == 'I' && b(1) == 'I' && b(2) == 42 && b(3) == 0) ||
          (b(0) == 'M' && b(1) == 'M' && b(2) == 0 && b(3) == 42))

    /** Baseline TIFF pixel decode, no codec: IFD walk in either byte
      * order, 8-bit grayscale (both photometric polarities) / RGB(A) /
      * palette, chunky layout, multi-strip, Compression 1 (none) and
      * 32773 (PackBits RLE — the classic fax/scan baseline). Anything
      * else (LZW/JPEG-in-TIFF, planar, bilevel, 16-bit) returns None
      * and the row falls back — conservative and total like every
      * decode path here. Every offset/count is validated against the
      * buffer so a lying IFD can never over-read.
      */
    private[graft] def tiffRgb(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = try {
      if (!isTiff(b)) return None
      val le = b(0) == 'I'
      def u16(o: Int): Int =
        if (le) (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
        else ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
      def u32(o: Int): Long =
        if (le) (u16(o) & 0xffffL) | ((u16(o + 2) & 0xffffL) << 16)
        else ((u16(o) & 0xffffL) << 16) | (u16(o + 2) & 0xffffL)
      val ifd = u32(4)
      if (ifd < 8 || ifd + 2 > b.length) return None
      val nEntries = u16(ifd.toInt)
      if (ifd + 2 + nEntries * 12 + 4 > b.length) return None
      // tag -> (type, count, valueFieldOffset)
      var width = 0L; var height = 0L; var compression = 1L
      var photometric = -1L; var spp = 1L; var rowsPerStrip = 0xffffffffL
      var bitsOk = true
      var stripOffsets: Array[Long] = null
      var stripCounts: Array[Long] = null
      var colorMapOff = -1; var colorMapCount = 0L
      var planar = 1L
      var e = 0
      while (e < nEntries) {
        val eo = ifd.toInt + 2 + e * 12
        val tag = u16(eo)
        val typ = u16(eo + 2)
        val count = u32(eo + 4)
        val vo = eo + 8
        def scalar: Long = typ match {
          case 3 => u16(vo).toLong // SHORT sits first in the field
          case 4 => u32(vo)
          case 1 => (b(vo) & 0xff).toLong
          case _ => -1L
        }
        def vec: Array[Long] = {
          // malformed vectors throw into the outer catch -> None
          val sz = typ match { case 3 => 2; case 4 => 4; case _ => 0 }
          if (sz == 0 || count <= 0 || count > (1 << 20))
            sys.error("tiff: bad vector type/count")
          val base =
            if (count * sz <= 4) vo.toLong
            else {
              val off = u32(vo)
              if (off + count * sz > b.length)
                sys.error("tiff: vector past buffer")
              off
            }
          Array.tabulate(count.toInt)(i =>
            if (sz == 2) u16((base + i * 2).toInt).toLong
            else u32((base + i * 4).toInt))
        }
        tag match {
          case 256 => width = scalar
          case 257 => height = scalar
          case 258 => bitsOk = vec.forall(_ == 8)
          case 259 => compression = scalar
          case 262 => photometric = scalar
          case 273 => stripOffsets = vec
          case 277 => spp = scalar
          case 278 => rowsPerStrip = scalar
          case 279 => stripCounts = vec
          case 284 => planar = scalar
          case 320 =>
            colorMapCount = count
            colorMapOff =
              (if (count * 2 <= 4) vo.toLong else u32(vo)).toInt
          case _ => () // ancillary tags are free to exist
        }
        e += 1
      }
      val w = width.toInt; val h = height.toInt
      if (w <= 0 || h <= 0 || w.toLong * h > MaxHashPixels || !bitsOk ||
        planar != 1 || stripOffsets == null || stripCounts == null ||
        stripOffsets.length != stripCounts.length) return None
      if (compression != 1 && compression != 32773) return None
      val sppI = spp.toInt
      val pm = photometric.toInt
      val rgbOut = new Array[Byte](w * h * 3)
      val palette: Array[Byte] =
        if (pm == 3) {
          if (colorMapOff < 0 || colorMapCount < 3 * 256 ||
            colorMapOff + colorMapCount * 2 > b.length) return None
          // ColorMap: 256 reds, 256 greens, 256 blues as 16-bit values
          Array.tabulate(768) { i =>
            val ch = i % 3; val idx = i / 3
            (u16(colorMapOff + (ch * 256 + idx) * 2) >> 8).toByte
          }
        } else null
      if ((pm == 3 || pm <= 1) && sppI != 1) return None
      if (pm == 2 && sppI != 3 && sppI != 4) return None
      if (pm < 0 || pm > 3) return None
      val rowBytes = w * sppI
      val rps =
        if (rowsPerStrip <= 0 || rowsPerStrip > h) h.toLong
        else rowsPerStrip
      var y = 0
      var strip = 0
      while (y < h) {
        if (strip >= stripOffsets.length) return None
        val rows = math.min(rps, (h - y).toLong).toInt
        val need = rowBytes * rows
        val so = stripOffsets(strip)
        val sc = stripCounts(strip)
        if (so < 0 || sc < 0 || so + sc > b.length) return None
        val raw: Array[Byte] =
          if (compression == 1) {
            if (sc < need) return None
            java.util.Arrays.copyOfRange(b, so.toInt, so.toInt + need)
          } else { // PackBits
            val out = new Array[Byte](need)
            var i = so.toInt; val end = (so + sc).toInt
            var o = 0
            while (o < need) {
              if (i >= end) return None
              val n = b(i); i += 1
              if (n >= 0) {
                if (i + n + 1 > end || o + n + 1 > need) return None
                System.arraycopy(b, i, out, o, n + 1)
                i += n + 1; o += n + 1
              } else if (n != -128) {
                if (i >= end || o + (1 - n) > need) return None
                java.util.Arrays.fill(out, o, o + 1 - n, b(i))
                i += 1; o += 1 - n
              } // -128: no-op per the spec
            }
            out
          }
        var r = 0
        while (r < rows) {
          var x = 0
          while (x < w) {
            val po = ((y + r) * w + x) * 3
            if (pm == 2) { // RGB(A): alpha ignored like everywhere
              val o = r * rowBytes + x * sppI
              rgbOut(po) = raw(o); rgbOut(po + 1) = raw(o + 1)
              rgbOut(po + 2) = raw(o + 2)
            } else if (pm == 3) {
              val ci = (raw(r * rowBytes + x) & 0xff) * 3
              rgbOut(po) = palette(ci); rgbOut(po + 1) = palette(ci + 1)
              rgbOut(po + 2) = palette(ci + 2)
            } else { // gray; photometric 0 inverts (white-is-zero)
              val v0 = raw(r * rowBytes + x) & 0xff
              val v = (if (pm == 0) 255 - v0 else v0).toByte
              rgbOut(po) = v; rgbOut(po + 1) = v; rgbOut(po + 2) = v
            }
            x += 1
          }
          r += 1
        }
        y += rows
        strip += 1
      }
      Some((rgbOut, w, h))
    } catch { case scala.util.control.NonFatal(_) => None }

    private[ext] def isWebp(b: Array[Byte]): Boolean =
      b.length >= 25 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && tag(b, 8) == "WEBP" // 25 = RIFF 12 + hdr 8 + VP8L 5

    /** Lossless-WebP pixel decode: walk the RIFF chunks to the first
      * "VP8L" payload (plain or inside a VP8X extended layout) and run
      * the [[Vp8l]] decoder — real Huffman/LZ77/transform expansion,
      * no codec library. Returns RGB triplets like [[gifRgb]]; None
      * for lossy VP8 (the genuinely codec-bound arithmetic-decode
      * boundary) and anything malformed, falling back to geometry or
      * payload-byte treatment.
      */
    private[ext] def webpRgb(b: Array[Byte]): Option[(Array[Byte], Int, Int)] = {
      if (!isWebp(b)) return None
      var off = 12
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val sz = u32le(b, off + 4)
        val po = off + 8
        if (sz < 0 || po + sz > b.length) return None
        if (id == "VP8L")
          return Vp8l.decodeArgb(b, po, sz.toInt, MaxHashPixels).map {
            case (argb, w, h) =>
              val out = new Array[Byte](w * h * 3)
              var i = 0
              while (i < argb.length) {
                val p = argb(i)
                out(i * 3) = ((p >>> 16) & 0xff).toByte
                out(i * 3 + 1) = ((p >>> 8) & 0xff).toByte
                out(i * 3 + 2) = (p & 0xff).toByte
                i += 1
              }
              (out, w, h)
          }
        off = po + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
      None
    }

    /** WEBP: REAL pixel decode for lossless (VP8L) payloads through
      * [[Vp8l]] — Huffman + LZ77 + all four transforms, no codec
      * library — with the JPEG-shaped feature layout [width, height,
      * meanR, meanG, meanB, luminance] and kind "pixels". Lossy and
      * extended payloads keep the header-geometry treatment: all
      * three layouts carry their dimensions in clear — "VP8 " lossy
      * keyframes (14-bit width/height after the 0x9d012a start code),
      * "VP8L" (14-bit fields LSB-first after the 0x2f signature),
      * "VP8X" extended (24-bit canvas minus-one fields) — so a crawl
      * gets real geometry for every WebP while VP8 arithmetic
      * decoding stays the documented codec boundary (the census shows
      * exactly how many rows sit there). Geometry feature layout:
      * [width, height, lossless, hasAlpha].
      */
    private def decodeWebp(r: MediaRow): Option[MediaFeatures] = {
      val b = r.media
      webpRgb(b) match {
        case Some((px, w, h)) =>
          return Some(rgbFeatures(r, "image/webp", px, w, h))
        case None => ()
      }
      var off = 12
      var feat: Array[Float] = null
      while (feat == null && off + 8 <= b.length) {
        val id = tag(b, off)
        val sz = u32le(b, off + 4)
        val po = off + 8
        if (sz < 0 || po + sz > b.length) return None
        id match {
          case "VP8 " if sz >= 10 =>
            val keyframe = (b(po) & 1) == 0
            if (!keyframe || (b(po + 3) & 0xff) != 0x9d ||
              (b(po + 4) & 0xff) != 0x01 || (b(po + 5) & 0xff) != 0x2a)
              return None
            val w = u16le(b, po + 6) & 0x3fff
            val h = u16le(b, po + 8) & 0x3fff
            feat = Array(w.toFloat, h.toFloat, 0f, 0f)
          case "VP8L" if sz >= 5 =>
            if ((b(po) & 0xff) != 0x2f) return None
            val bits = u32le(b, po + 1)
            val w = (bits & 0x3fff).toInt + 1
            val h = ((bits >> 14) & 0x3fff).toInt + 1
            val alpha = ((bits >> 28) & 1).toInt
            feat = Array(w.toFloat, h.toFloat, 1f, alpha.toFloat)
          case "VP8X" if sz >= 10 =>
            val alpha = (b(po) >> 4) & 1
            val w = ((b(po + 4) & 0xff) | ((b(po + 5) & 0xff) << 8) |
              ((b(po + 6) & 0xff) << 16)) + 1
            val h = ((b(po + 7) & 0xff) | ((b(po + 8) & 0xff) << 8) |
              ((b(po + 9) & 0xff) << 16)) + 1
            feat = Array(w.toFloat, h.toFloat, -1f, alpha.toFloat)
          case _ => ()
        }
        off = po + sz.toInt + (sz.toInt & 1) // RIFF chunks are word-aligned
      }
      Option(feat).map { f0 =>
        // animated WebP: the ANMF surface rides the feature row (the
        // GIF/APNG precedent) — [.., frameCount, durationSec] appended
        val anim = webpAnimFrames(b, maxHashFrames = 0)
        val f = f0 ++ anim.map(a =>
            Array(a.frameCount.toFloat, a.durationSec.toFloat))
          .getOrElse(Array.empty[Float])
        MediaFeatures(r.doc_id, b.length, "image/webp", "container",
          byteChecksum(b), f)
      }
    }

    /** MP3: an optional ID3v2 envelope then MPEG audio frames whose
      * 4-byte headers carry version/layer/bitrate/sample-rate/channel
      * mode in clear. True when a valid Layer III frame header sits at
      * the post-ID3 offset (or the very start).
      */
    private[ext] def isMp3(b: Array[Byte]): Boolean =
      mp3Meta(b).isDefined

    private def id3v2Size(b: Array[Byte]): Int =
      if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3')
        // syncsafe 28-bit size + the 10-byte header itself
        10 + (((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
          ((b(8) & 0x7f) << 7) | (b(9) & 0x7f))
      else 0

    private val Mp3BitrateV1L3 = Array(0, 32, 40, 48, 56, 64, 80, 96,
      112, 128, 160, 192, 224, 256, 320, 0)
    private val Mp3BitrateV2L3 = Array(0, 8, 16, 24, 32, 40, 48, 56,
      64, 80, 96, 112, 128, 144, 160, 0)
    private val Mp3RateV1 = Array(44100, 48000, 32000, 0)

    /** (bitrateKbps, sampleRate, channels, audioOffset) from the first
      * MPEG-1/2/2.5 Layer III frame header; None when the payload is
      * not MP3-shaped. Free-format (bitrate index 0) is rejected —
      * duration needs a real rate.
      */
    private def mp3Meta(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
      val off = id3v2Size(b)
      if (off < 0 || off + 4 > b.length) return None
      val h0 = b(off) & 0xff; val h1 = b(off + 1) & 0xff
      val h2 = b(off + 2) & 0xff; val h3 = b(off + 3) & 0xff
      if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
      val versionBits = (h1 >> 3) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1
      val layerBits = (h1 >> 1) & 3   // 1 = Layer III
      if (versionBits == 1 || layerBits != 1) return None
      val brIdx = (h2 >> 4) & 0xf
      val srIdx = (h2 >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      val bitrate =
        if (versionBits == 3) Mp3BitrateV1L3(brIdx) else Mp3BitrateV2L3(brIdx)
      val srBase = Mp3RateV1(srIdx)
      val sampleRate = versionBits match {
        case 3 => srBase
        case 2 => srBase / 2
        case _ => srBase / 4
      }
      val channels = if (((h3 >> 6) & 3) == 3) 1 else 2
      Some((bitrate, sampleRate, channels, off))
    }

    /** MP3: header GEOMETRY, no codec — the WebP-geometry precedent
      * applied to the web's most common audio format (the MDCT +
      * Huffman synthesis is the documented boundary; the census counts
      * these rows on the container side). Duration: EXACT from the
      * Xing/Info VBR tag's frame count when present (frames x 1152 or
      * 576 samples / rate), else the CBR estimate over the post-ID3
      * payload. Feature layout mirrors WAV: [channels, sampleRate,
      * durationSec, bitrateKbps].
      */
    /** (channels, sampleRate, durationSec, bitrateKbps) of an MP3
      * bitstream — Xing/Info-exact or CBR-estimated; the shared core of
      * the bare-MP3 and MP3-in-WAV routes.
      */
    private def mp3Geometry(b: Array[Byte]): Option[(Int, Int, Double, Int)] =
      mp3Meta(b).map { case (bitrate, sampleRate, channels, off) =>
        val v1 = ((b(off + 1) >> 3) & 3) == 3
        val samplesPerFrame = if (v1) 1152 else 576
        // the Xing/Info tag sits after the side info of the first frame
        val sideInfo =
          if (v1) { if (channels == 1) 17 else 32 }
          else { if (channels == 1) 9 else 17 }
        val xo = off + 4 + sideInfo
        val durationSec =
          if (xo + 12 <= b.length &&
            (tag(b, xo) == "Xing" || tag(b, xo) == "Info") &&
            (b(xo + 7) & 1) == 1) // flags: frame count present
            u32be(b, xo + 8).toDouble * samplesPerFrame / sampleRate
          else (b.length - off).toDouble * 8.0 / (bitrate * 1000.0)
        (channels, sampleRate, durationSec, bitrate)
      }

    private def decodeMp3(r: MediaRow): Option[MediaFeatures] = {
      // full sample decode first (r13, ext.Mp3): MPEG-1 Layer III
      // within the embedded-table surface is a "pcm" row with the WAV
      // feature layout; MPEG-2/2.5, intensity stereo, and unembedded
      // Huffman tables keep the census-visible container treatment
      Mp3.decode(r.media) match {
        case Some((x, sampleRate)) if x.nonEmpty =>
          val (channels, _, _, _) =
            mp3Geometry(r.media).getOrElse((1, sampleRate, 0.0, 0))
          return Some(MediaFeatures(r.doc_id, r.media.length, "audio/mpeg",
            "pcm", byteChecksum(r.media),
            Array(channels.toFloat, sampleRate.toFloat,
              (x.length.toDouble / sampleRate).toFloat, rmsOf(x))))
        case _ => ()
      }
      mp3Geometry(r.media).map { case (channels, sampleRate, dur, bitrate) =>
        MediaFeatures(r.doc_id, r.media.length, "audio/mpeg", "container",
          byteChecksum(r.media),
          Array(channels.toFloat, sampleRate.toFloat, dur.toFloat,
            bitrate.toFloat))
      }
    }

    /** MP3-in-WAV (fmt tag 0x55 — the one compressed WAV wrapper left
      * after PCM/float/ADPCM/G.711 gained real decodes): the `data`
      * chunk IS an MP3 bitstream. Since r13 a stream inside the
      * embedded-table surface decodes for REAL ([[Mp3.decode]]) and
      * counts as "pcm"; anything outside keeps duration/bitrate from
      * the MP3 header walk (Xing-exact when tagged) on the container
      * side under the ogg-style suffixed mime.
      */
    private def wavMp3Features(r: MediaRow): Option[MediaFeatures] = try {
      val b = r.media
      var off = 12
      var fmt = 0
      var dataOff = -1
      var dataLen = -1
      while (off + 8 <= b.length) {
        val id = tag(b, off)
        val sz = u32le(b, off + 4) // Long-safe bound, like wavLayout
        if (off + 8L + sz > b.length) return None
        if (id == "fmt " && sz >= 16) {
          fmt = u16le(b, off + 8)
          if (fmt == 0xfffe && sz >= 40)
            fmt = u16le(b, off + 8 + 24)
        } else if (id == "data") { dataOff = off + 8; dataLen = sz.toInt }
        off += (8 + sz + (sz & 1)).toInt
      }
      if (fmt != 0x55 || dataOff < 0 || dataLen <= 0) return None
      val stream = java.util.Arrays.copyOfRange(b, dataOff, dataOff + dataLen)
      // full sample decode first (r13): a decodable stream is a "pcm"
      // row with the WAV feature layout; outside the decoder's surface
      // it keeps the container-geometry treatment
      Mp3.decode(stream) match {
        case Some((x, sampleRate)) if x.nonEmpty =>
          val (channels, _, _, _) =
            mp3Geometry(stream).getOrElse((1, sampleRate, 0.0, 0))
          return Some(MediaFeatures(r.doc_id, b.length, "audio/wav-mp3",
            "pcm", byteChecksum(b),
            Array(channels.toFloat, sampleRate.toFloat,
              (x.length.toDouble / sampleRate).toFloat, rmsOf(x))))
        case _ => ()
      }
      mp3Geometry(stream).map { case (channels, sampleRate, dur, bitrate) =>
        MediaFeatures(r.doc_id, b.length, "audio/wav-mp3", "container",
          byteChecksum(b),
          Array(channels.toFloat, sampleRate.toFloat, dur.toFloat,
            bitrate.toFloat))
      }
    } catch { case scala.util.control.NonFatal(_) => None }

    /** RMS of a decoded mono signal (shared by the pcm feature rows). */
    private def rmsOf(x: Array[Double]): Float = {
      if (x.isEmpty) return 0f
      var sum = 0.0
      var i = 0
      while (i < x.length) { sum += x(i) * x(i); i += 1 }
      math.sqrt(sum / x.length).toFloat
    }

    private[ext] def isOgg(b: Array[Byte]): Boolean =
      b.length >= 47 && b(0) == 'O' && b(1) == 'g' && b(2) == 'g' &&
        b(3) == 'S' // 47 = 27-byte page header + 1 segment + OpusHead id

    /** Ogg id-header parse at payload offset `po`: (mime, channels,
      * rate, granuleRate) — both Vorbis (0x01 + "vorbis": channels u8,
      * rate u32le) and Opus ("OpusHead": channels u8, pre-skip, input
      * rate u32le) carry geometry in clear, no codec work. Opus
      * granules tick at 48 kHz regardless of the input rate.
      */
    private def oggIdHeader(b: Array[Byte],
        po: Int): Option[(String, Int, Long, Long)] = {
      if (po + 19 > b.length) return None
      if (b(po) == 1 && tag(b, po + 1) == "vorb" && b(po + 5) == 'i' &&
          b(po + 6) == 's') {
        if (po + 16 > b.length) return None
        val rt = u32le(b, po + 12)
        Some(("audio/ogg-vorbis", b(po + 11) & 0xff, rt, rt))
      } else if (tag(b, po) == "Opus" && tag(b, po + 4) == "Head")
        Some(("audio/ogg-opus", b(po + 9) & 0xff, u32le(b, po + 12), 48000L))
      else None
    }

    /** Ogg: geometry from the first audio id header; duration from a
      * FORWARD page walk keyed by STREAM SERIAL, which handles both
      * layouts a crawl sees:
      *  - CHAINED streams (a "radio rip": complete streams
      *    concatenated, each with its own BOS/serial/granule clock) —
      *    the total is the SUM over serials of (final granule / that
      *    serial's rate), not the last page's granule alone;
      *  - CONCURRENT multiplexing (audio + skeleton/subtitle streams
      *    interleaved, ALL BOS pages first) — non-audio serials fail
      *    the id-header parse, carry no rate, and contribute nothing,
      *    so the audio serial's duration survives the extra BOS pages.
      * A file multiplexing several PARALLEL audio streams sums them —
      * the container-estimate boundary, documented. Pages whose granule
      * is -1 (no packet boundary) are skipped; a REUSED serial (spec
      * forbids it within one physical stream, chains may collide by
      * accident) flushes its previous span first. Truncation keeps the
      * spans walked so far. Feature layout
      * [channels, sampleRate, durationSec, 0], kind "container".
      */
    private def decodeOgg(r: MediaRow): Option[MediaFeatures] = {
      val b = r.media
      if (!isOgg(b) || (b(5) & 2) == 0) return None // first page is BOS
      // FLAC-in-Ogg (r13): the native decoder through the rebuilt
      // stream — lossless, so the row is "lossless" like bare FLAC
      if (OggFlac.isOggFlac(b)) {
        OggFlac.decode(b) match {
          case Some((x, sr)) if x.nonEmpty =>
            val channels = OggFlac.info(b).map(_._2).getOrElse(1)
            return Some(MediaFeatures(r.doc_id, b.length, "audio/ogg-flac",
              "lossless", byteChecksum(b),
              Array(channels.toFloat, sr.toFloat,
                (x.length.toDouble / sr).toFloat, rmsOf(x))))
          case _ => return None // corrupt mapping: byte-stats
        }
      }
      var mime: String = null
      var channels = 0
      var rate = 0L
      var totalDur = 0.0
      val rates = scala.collection.mutable.Map.empty[Long, Long]
      val granules = scala.collection.mutable.Map.empty[Long, Long]
      def flush(serial: Long): Unit = {
        val gr = rates.getOrElse(serial, 0L)
        val g = granules.getOrElse(serial, 0L)
        if (gr > 0 && g > 0) totalDur += g.toDouble / gr
        rates.remove(serial)
        granules.remove(serial)
        ()
      }
      var off = 0
      var walking = true
      while (walking && off + 27 <= b.length && b(off) == 'O' &&
          b(off + 1) == 'g' && b(off + 2) == 'g' && b(off + 3) == 'S') {
        val flags = b(off + 5) & 0xff
        val granule = u32le(b, off + 6) | (u32le(b, off + 10) << 32)
        val serial = u32le(b, off + 14)
        val nSegs = b(off + 26) & 0xff
        if (off + 27 + nSegs > b.length) walking = false
        else {
          var paySize = 0
          var s = 0
          while (s < nSegs) { paySize += b(off + 27 + s) & 0xff; s += 1 }
          val payOff = off + 27 + nSegs
          if (payOff + paySize > b.length) walking = false
          else {
            if ((flags & 2) != 0) { // BOS opens a (new) serial
              if (rates.contains(serial) || granules.contains(serial))
                flush(serial)
              oggIdHeader(b, payOff).foreach { case (m, ch, rt, gr) =>
                if (mime == null) { // the first AUDIO stream identifies
                  if (ch < 1 || rt <= 0) return None
                  mime = m; channels = ch; rate = rt
                }
                rates(serial) = gr
              }
            }
            if (granule > 0) granules(serial) = granule
            off = payOff + paySize
          }
        }
      }
      if (mime == null) return None
      rates.keySet.toSeq.foreach(flush)
      // full sample decode first (r13, ext.Vorbis; floor0 decodes too
      // since r14): a Vorbis stream the from-spec decoder consumes
      // end-to-end is a "pcm" row with the WAV feature layout;
      // bad-setup/Opus streams keep the census-visible container
      // treatment below
      if (mime == "audio/ogg-vorbis") Vorbis.decode(b) match {
        case Some((x, sr)) if x.nonEmpty =>
          var sum = 0.0
          var i = 0
          while (i < x.length) { sum += x(i) * x(i); i += 1 }
          return Some(MediaFeatures(r.doc_id, b.length, mime, "pcm",
            byteChecksum(b),
            Array(channels.toFloat, sr.toFloat,
              (x.length.toDouble / sr).toFloat,
              math.sqrt(sum / x.length).toFloat)))
        case _ => ()
      }
      Some(MediaFeatures(r.doc_id, b.length, mime, "container",
        byteChecksum(b),
        Array(channels.toFloat, rate.toFloat, totalDur.toFloat, 0f)))
    }

    private[ext] def isMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && tag(b, 4) == "ftyp"

    /** One level of ISO-BMFF box walking over [off0, end): `f(type,
      * payloadOff, payloadEnd)` per box. Every size is validated against
      * the enclosing range (size==1 reads the 64-bit largesize;
      * size==0 means "to the end of the enclosing box"), so a truncated
      * or lying file can never over-read — returns false on the first
      * malformed size and the caller falls back to byte-stats.
      */
    private def walkBoxes(b: Array[Byte], off0: Int, end: Int)(
        f: (String, Int, Int) => Boolean): Boolean = {
      var off = off0
      while (off + 8 <= end) {
        val sz32 = u32be(b, off)
        val typ = tag(b, off + 4)
        var hdr = 8L
        var sz = sz32
        if (sz32 == 1) {
          if (off + 16 > end) return false
          sz = (u32be(b, off + 8) << 32) | u32be(b, off + 12)
          hdr = 16L
        } else if (sz32 == 0) sz = (end - off).toLong
        if (sz < hdr || off + sz > end) return false
        if (!f(typ, off + hdr.toInt, off + sz.toInt)) return false
        off += sz.toInt
      }
      true
    }

    /** MP4/ISO-BMFF: container-only metadata from the atom walk —
      * presentation duration, track count (trak atoms), and visual
      * geometry (tkhd 16.16 fixed-point width/height; max over tracks,
      * since sound tracks carry zeros). Duration resolves in the order
      * a real demuxer does: the mvhd duration when non-zero
      * (progressive files, v0 and v1 layouts); else the FRAGMENTED
      * path — `mvex/mehd` fragment_duration (movie timescale, v0/v1)
      * when the muxer knew the total, else the sum of `moof/traf/trun`
      * sample durations (per-sample when flag 0x100 is set, else
      * sample_count × the tfhd default — media timescale from the
      * first trak's mdhd), the DASH/live-capture class whose mvhd
      * always says 0. ZERO codec work — the WAV RIFF discipline
      * applied to video ([[decodeCensus]] counts how many rows sit on
      * each side of the codec line).
      * Feature layout: [durationSec, trackCount, width, height].
      */
    private def decodeMp4(r: MediaRow): Option[MediaFeatures] = {
      val b = r.media
      var mvhdTs = 0L
      var mvhdDur = -1L
      var mehdDur = -1L
      var mdhdTs = 0L
      var trunTicks = 0L
      var sawMvhd = false
      var tracks = 0
      var w = 0f
      var h = 0f
      val ok = walkBoxes(b, 0, b.length) { (typ, po, pe) =>
        if (typ == "moov")
          walkBoxes(b, po, pe) { (t2, qo, qe) =>
            if (t2 == "mvhd" && qe - qo >= 20) {
              val ver = b(qo) & 0xff
              if (ver == 1 && qe - qo >= 32) {
                mvhdTs = u32be(b, qo + 20)
                mvhdDur = (u32be(b, qo + 24) << 32) | u32be(b, qo + 28)
                sawMvhd = mvhdTs > 0
              } else if (ver == 0) {
                mvhdTs = u32be(b, qo + 12)
                mvhdDur = u32be(b, qo + 16)
                sawMvhd = mvhdTs > 0
              }
              true
            } else if (t2 == "trak") {
              tracks += 1
              walkBoxes(b, qo, qe) { (t3, ro, re) =>
                if (t3 == "tkhd") {
                  val wOff = if ((b(ro) & 0xff) == 1) 88 else 76
                  if (re - ro >= wOff + 8) {
                    val tw = u32be(b, ro + wOff) / 65536f
                    val th = u32be(b, ro + wOff + 4) / 65536f
                    if (tw > w) w = tw
                    if (th > h) h = th
                  }
                } else if (t3 == "mdia")
                  walkBoxes(b, ro, re) { (t4, so, se) =>
                    if (t4 == "mdhd" && mdhdTs == 0) { // first track's clock
                      val ver = b(so) & 0xff
                      if (ver == 1 && se - so >= 24)
                        mdhdTs = u32be(b, so + 20)
                      else if (ver == 0 && se - so >= 16)
                        mdhdTs = u32be(b, so + 12)
                    }
                    true
                  }
                true
              }
            } else if (t2 == "mvex")
              walkBoxes(b, qo, qe) { (t3, ro, re) =>
                if (t3 == "mehd") {
                  val ver = b(ro) & 0xff
                  if (ver == 1 && re - ro >= 12)
                    mehdDur = (u32be(b, ro + 4) << 32) | u32be(b, ro + 8)
                  else if (ver == 0 && re - ro >= 8)
                    mehdDur = u32be(b, ro + 4)
                }
                true
              }
            else true
          }
        else if (typ == "moof")
          walkBoxes(b, po, pe) { (t2, qo, qe) =>
            if (t2 != "traf") true
            else {
              var defaultDur = 0L // tfhd precedes trun within its traf
              walkBoxes(b, qo, qe) { (t3, ro, re) =>
                if (t3 == "tfhd" && re - ro >= 8) {
                  val flags = u32be(b, ro).toInt & 0xffffff
                  var fo = ro + 8
                  if ((flags & 0x1) != 0) fo += 8  // base-data-offset
                  if ((flags & 0x2) != 0) fo += 4  // sample-descr index
                  if ((flags & 0x8) != 0 && fo + 4 <= re)
                    defaultDur = u32be(b, fo)
                } else if (t3 == "trun" && re - ro >= 8) {
                  val flags = u32be(b, ro).toInt & 0xffffff
                  val n = u32be(b, ro + 4)
                  var fo = ro + 8
                  if ((flags & 0x1) != 0) fo += 4   // data-offset
                  if ((flags & 0x4) != 0) fo += 4   // first-sample-flags
                  if ((flags & 0x100) != 0) {       // per-sample durations
                    val stride = 4 * (1 +
                      (if ((flags & 0x200) != 0) 1 else 0) +
                      (if ((flags & 0x400) != 0) 1 else 0) +
                      (if ((flags & 0x800) != 0) 1 else 0))
                    var s = 0L
                    while (s < n && fo + 4 <= re) {
                      trunTicks += u32be(b, fo)
                      fo += stride
                      s += 1
                    }
                  } else if (n > 0 && defaultDur > 0) {
                    // both are unvalidated u32 file fields: saturate
                    // instead of wrapping Long on corrupt input
                    val prod =
                      if (n > Long.MaxValue / defaultDur) Long.MaxValue
                      else n * defaultDur
                    trunTicks =
                      if (trunTicks > Long.MaxValue - prod) Long.MaxValue
                      else trunTicks + prod
                  }
                }
                true
              }
            }
          }
        else true
      }
      if (!ok || !sawMvhd || tracks == 0) None
      else {
        val durationSec =
          if (mvhdDur > 0) mvhdDur.toDouble / mvhdTs
          else if (mehdDur > 0) mehdDur.toDouble / mvhdTs
          else if (trunTicks > 0 && mdhdTs > 0) trunTicks.toDouble / mdhdTs
          else 0.0
        Some(MediaFeatures(r.doc_id, b.length, "video/mp4", "container",
          byteChecksum(b),
          Array(durationSec.toFloat, tracks.toFloat, w, h)))
      }
    }

    /** Remux-robust MP4 payload fingerprint: 64-bit FNV-1a over the
      * concatenated `mdat` payload bytes in file order, skipping every
      * other atom — so the edits a re-wrap makes (moov relocated for
      * faststart, metadata tags rewritten, free/skip padding inserted,
      * atom order shuffled) do NOT move the fingerprint, while any
      * change to the actual coded samples does. This is the container-
      * level video dup class a crawl sees constantly; frame DECODE
      * stays the documented codec boundary. None when the box walk
      * fails or no mdat exists (metadata-only files have no payload to
      * identify).
      */
    private[graft] def mp4PayloadFp(b: Array[Byte]): Option[Long] = {
      if (b == null || !isMp4(b)) return None
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var any = false
      val ok = walkBoxes(b, 0, b.length) { (typ, po, pe) =>
        if (typ == "mdat") {
          any = true
          var i = po
          while (i < pe) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
        }
        true
      }
      if (ok && any) Some(h) else None
    }

    // --------------------------------------------- AVIF / HEIC (r13)

    /** ftyp major + compatible brands (bounded: first box only). */
    private def ftypBrands(b: Array[Byte]): Seq[String] = {
      if (!isMp4(b)) return Nil
      val sz = u32be(b, 0)
      if (sz < 16 || sz > b.length) return Nil
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      out += tag(b, 8) // major brand
      var off = 16     // skip minor version; then compatible brands
      while (off + 4 <= sz) { out += tag(b, off); off += 4 }
      out.toSeq
    }

    /** The suffixed census mime of an ISO-BMFF IMAGE container, or None
      * for ordinary video MP4. Brand precedence: the MAJOR brand
      * decides; compatible brands only rescue a generic major (mif1/
      * msf1). Sequences ("image sequence" = animation) get the ogg-
      * style suffixed mime so the census splits still vs animated.
      */
    private[ext] def isoImageMime(b: Array[Byte]): Option[String] = {
      val brands = ftypBrands(b)
      if (brands.isEmpty) return None
      val major = brands.head
      def classify(br: String): Option[String] = br match {
        case "avif" => Some("image/avif")
        case "avis" => Some("image/avif-seq")
        case "heic" | "heix" => Some("image/heic")
        case "hevc" | "hevx" => Some("image/heic-seq")
        case _ => None
      }
      classify(major).orElse(major match {
        case "mif1" => Some(brands.tail.iterator.flatMap(classify(_))
          .nextOption().getOrElse("image/heif"))
        case "msf1" => Some(brands.tail.iterator.flatMap(classify(_))
          .nextOption().getOrElse("image/heif-seq"))
        case _ => None
      })
    }

    /** AVIF/HEIC/HEIF geometry + census row, zero codec work (the MP4
      * discipline on the image-file heap): `meta/iprp/ipco/ispe` gives
      * the spatial extents (max over properties — thumbnails and alpha
      * planes carry their own ispe), `meta/iinf` the item count, and
      * for image SEQUENCES (avis/msf1/hevc) the moov walk gives frame
      * count (stts sample-count sum) and duration (mvhd). AV1/HEVC
      * payload decode stays the documented codec boundary — these rows
      * were previously invisible (no geometry, no census class at
      * all), which is exactly the blind spot the census exists to
      * count. Feature layout: [width, height, items, frames,
      * durationSec].
      */
    private def decodeHeif(r: MediaRow, mime: String)
        : Option[MediaFeatures] = {
      val b = r.media
      var w = 0L; var h = 0L
      var items = 0L
      var frames = 0L
      var mvhdTs = 0L; var mvhdDur = 0L
      val ok = walkBoxes(b, 0, b.length) { (typ, po, pe) =>
        typ match {
          case "meta" if pe - po >= 4 =>
            walkBoxes(b, po + 4, pe) { (t2, qo, qe) =>
              t2 match {
                case "iinf" if qe - qo >= 8 =>
                  val ver = b(qo) & 0xff
                  items =
                    if (ver == 0)
                      ((b(qo + 4) & 0xff) << 8) | (b(qo + 5) & 0xff)
                    else u32be(b, qo + 4)
                case "iprp" =>
                  walkBoxes(b, qo, qe) { (t3, ro, re) =>
                    if (t3 == "ipco")
                      walkBoxes(b, ro, re) { (t4, so, se) =>
                        if (t4 == "ispe" && se - so >= 12) {
                          w = math.max(w, u32be(b, so + 4))
                          h = math.max(h, u32be(b, so + 8))
                        }
                        true
                      }
                    else true
                  }
                case _ => ()
              }
              true
            }
          case "moov" =>
            walkBoxes(b, po, pe) { (t2, qo, qe) =>
              t2 match {
                case "mvhd" if qe - qo >= 20 =>
                  val ver = b(qo) & 0xff
                  if (ver == 1 && qe - qo >= 32) {
                    mvhdTs = u32be(b, qo + 20)
                    mvhdDur = (u32be(b, qo + 24) << 32) | u32be(b, qo + 28)
                  } else {
                    mvhdTs = u32be(b, qo + 12)
                    mvhdDur = u32be(b, qo + 16)
                  }
                case "trak" =>
                  // stts sample-count sum anywhere under the trak
                  def sumStts(o0: Int, e0: Int): Unit = {
                    walkBoxes(b, o0, e0) { (t3, ro, re) =>
                      t3 match {
                        case "stts" if re - ro >= 8 =>
                          val n = u32be(b, ro + 4)
                          var i = 0L
                          var fo = ro + 8
                          while (i < n && fo + 8 <= re) {
                            frames += u32be(b, fo)
                            fo += 8
                            i += 1
                          }
                        case "mdia" | "minf" | "stbl" => sumStts(ro, re)
                        case _ => ()
                      }
                      true
                    }
                    ()
                  }
                  sumStts(qo, qe)
                case _ => ()
              }
              true
            }
          case _ => ()
        }
        true
      }
      if (!ok || (w == 0 && h == 0)) return None
      val durationSec =
        if (mvhdTs > 0) mvhdDur.toDouble / mvhdTs else 0.0
      Some(MediaFeatures(r.doc_id, b.length, mime, "container",
        byteChecksum(b),
        Array(w.toFloat, h.toFloat, items.toFloat, frames.toFloat,
          durationSec.toFloat)))
    }

    // ------------------------------------------------- EBML (WebM/MKV)

    private[ext] def isEbml(b: Array[Byte]): Boolean =
      b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

    /** One EBML variable-length integer at `off` within [0, end):
      * (value, byteLength), length 0 on malformed/out-of-range input.
      * Element IDs keep the length-marker bit (the spec stores them
      * that way — 0x1A45DFA3 IS the id); SIZE vints clear it, and the
      * all-ones size ("unknown, streamed") returns -1 so the walker can
      * extend it to the enclosing end.
      */
    private[ext] def ebmlVint(b: Array[Byte], off: Int, end: Int,
        keepMarker: Boolean): (Long, Int) = {
      if (off >= end) return (0L, 0)
      val first = b(off) & 0xff
      if (first == 0) return (0L, 0) // > 8-byte vints don't occur in EBML
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 23
      if (off + len > end) return (0L, 0)
      var v =
        if (keepMarker) first.toLong
        else (first & ((1 << (8 - len)) - 1)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
      if (!keepMarker && v == (1L << (7 * len)) - 1) v = -1L
      (v, len)
    }

    /** Walk EBML elements over [off0, end): `f(id, payloadOff,
      * payloadEnd)` per element. Every size is validated against the
      * enclosing range (the walkBoxes discipline — a truncated or lying
      * file can never over-read); an unknown-size element extends to
      * the enclosing end (the streamed-Segment case). Returns false on
      * the first malformed header and the caller falls back to
      * byte-stats.
      */
    private[ext] def walkEbml(b: Array[Byte], off0: Int, end: Int)(
        f: (Long, Int, Int) => Boolean): Boolean = {
      var off = off0
      while (off < end) {
        val (id, idLen) = ebmlVint(b, off, end, keepMarker = true)
        if (idLen == 0) return false
        val (sz, szLen) = ebmlVint(b, off + idLen, end, keepMarker = false)
        if (szLen == 0) return false
        val po = off + idLen + szLen
        if (sz >= 0 && po.toLong + sz > end) return false
        val pe = if (sz < 0) end else po + sz.toInt
        if (!f(id, po, pe)) return false
        off = pe
      }
      true
    }

    /** Big-endian unsigned integer element payload (0..8 bytes; EBML
      * uints are stored minimally). Empty payload = 0 per the spec.
      */
    private[ext] def ebmlUint(b: Array[Byte], po: Int, pe: Int): Long = {
      var v = 0L
      var i = po
      while (i < pe && i < po + 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
      v
    }

    /** EBML element WRITE side (shared with the AudioTags Matroska
      * splicer): raw marker-carrying id bytes, an 8-byte explicit-size
      * vint (0x01 marker + 7 value bytes — always legal, sidesteps
      * minimal-length bookkeeping), and a whole element.
      */
    private[ext] def ebmlIdBytes(id: Long): Array[Byte] = {
      var len = 1
      while ((id >>> (8 * len)) != 0) len += 1
      val a = new Array[Byte](len)
      var i = 0
      while (i < len) {
        a(i) = ((id >>> (8 * (len - 1 - i))) & 0xff).toByte
        i += 1
      }
      a
    }

    private[ext] def ebmlSize8(n: Long): Array[Byte] = {
      val a = new Array[Byte](8)
      a(0) = 1
      var i = 7
      var v = n
      while (i >= 1) { a(i) = (v & 0xff).toByte; v >>= 8; i -= 1 }
      a
    }

    private[ext] def ebmlElem(id: Long, payload: Array[Byte]): Array[Byte] =
      ebmlIdBytes(id) ++ ebmlSize8(payload.length.toLong) ++ payload

    /** EBML float element payload: 4-byte IEEE single or 8-byte double,
      * big-endian; anything else is malformed (NaN).
      */
    private def ebmlFloat(b: Array[Byte], po: Int, pe: Int): Double =
      (pe - po) match {
        case 4 => java.lang.Float.intBitsToFloat(u32be(b, po).toInt).toDouble
        case 8 => java.lang.Double.longBitsToDouble(
          (u32be(b, po) << 32) | u32be(b, po + 4))
        case _ => Double.NaN
      }

    /** WebM/Matroska: container-only metadata from the EBML walk — the
      * MP4 moov discipline applied to the web's other major video
      * wrapper. DocType picks the mime (webm vs x-matroska), Info
      * yields presentation duration (Duration float × TimestampScale
      * ns), Tracks yields the track count and visual geometry
      * (PixelWidth/Height; max over tracks). ZERO codec work — frame
      * DECODE stays the documented native-codec boundary; the census
      * counts these rows as "container".
      * Feature layout: [durationSec, trackCount, width, height] —
      * identical to MP4, so downstream video features are
      * container-agnostic.
      */
    private def decodeWebm(r: MediaRow): Option[MediaFeatures] = {
      val b = r.media
      var docType = "matroska"
      var tsScale = 1000000L // spec default: 1 ms per tick
      var durTicks = Double.NaN
      var tracks = 0
      var w = 0f
      var h = 0f
      val ok = walkEbml(b, 0, b.length) { (id, po, pe) =>
        if (id == 0x1A45DFA3L) // EBML header
          walkEbml(b, po, pe) { (id2, qo, qe) =>
            if (id2 == 0x4282L) // DocType
              docType = new String(b, qo, qe - qo, "US-ASCII")
                .takeWhile(_ != 0.toChar) // strings may be NUL-padded
            true
          }
        else if (id == 0x18538067L) // Segment
          walkEbml(b, po, pe) { (id2, qo, qe) =>
            if (id2 == 0x1549A966L) // Info
              walkEbml(b, qo, qe) { (id3, ro, re) =>
                if (id3 == 0x2AD7B1L) tsScale = ebmlUint(b, ro, re)
                else if (id3 == 0x4489L) durTicks = ebmlFloat(b, ro, re)
                true
              }
            else if (id2 == 0x1654AE6BL) // Tracks
              walkEbml(b, qo, qe) { (id3, ro, re) =>
                if (id3 == 0xAEL) { // TrackEntry
                  tracks += 1
                  walkEbml(b, ro, re) { (id4, so, se) =>
                    if (id4 == 0xE0L) // Video
                      walkEbml(b, so, se) { (id5, to, te) =>
                        if (id5 == 0xB0L) { // PixelWidth
                          val v = ebmlUint(b, to, te).toFloat
                          if (v > w) w = v
                        } else if (id5 == 0xBAL) { // PixelHeight
                          val v = ebmlUint(b, to, te).toFloat
                          if (v > h) h = v
                        }
                        true
                      }
                    else true
                  }
                } else true
              }
            else true
          }
        else true
      }
      if (!ok || tracks == 0 || tsScale <= 0) None
      else {
        val mime =
          if (docType == "webm") "video/webm" else "video/x-matroska"
        // Info.Duration is OPTIONAL in Matroska and commonly absent
        // from live-captured streams (the unknown-size-cluster file
        // class) — tracks/geometry are still real container data, so
        // the row keeps its container regime with duration 0 (the Ogg
        // "only the id page" precedent) instead of falling all the way
        // to byte-stats
        val durSec =
          if (durTicks.isNaN) 0f else (durTicks * tsScale / 1e9).toFloat
        Some(MediaFeatures(r.doc_id, b.length, mime, "container",
          byteChecksum(b),
          Array(durSec, tracks.toFloat, w, h)))
      }
    }

    /** Remux-robust WebM/MKV payload fingerprint — [[mp4PayloadFp]]'s
      * contract on the EBML container: 64-bit FNV-1a over the coded
      * FRAME bytes in file order, skipping everything a re-wrap
      * rewrites. Invariant to: metadata edits (Title/MuxingApp/tags),
      * SeekHead/Cues/Void re-layout, cluster RE-CHUNKING (frames
      * redistributed across Clusters), SimpleBlock <-> BlockGroup
      * rewraps, timestamp/TimestampScale changes, and RE-LACING (the
      * lace size table is skipped, so laced and unlaced deliveries of
      * the same frames hash identically). Any change to the coded
      * frames themselves moves the fingerprint. Because the hash runs
      * over the same raw coded bytes as the MP4 form, a remux ACROSS
      * containers (the same coded stream re-wrapped mp4 <-> webm) also
      * pairs — asserted in spec. None when the EBML walk fails or no
      * block exists.
      */
    private[graft] def webmPayloadFp(b: Array[Byte]): Option[Long] = {
      if (b == null || !isEbml(b)) return None
      var h = 0xcbf29ce484222325L // FNV-1a offset basis
      var any = false
      // Block/SimpleBlock payload: track vint, s16 relative timestamp,
      // flags, optional lace table, then the concatenated frame bytes —
      // only the frame bytes are hashed
      def hashBlock(po: Int, pe: Int): Boolean = {
        val (_, tl) = ebmlVint(b, po, pe, keepMarker = false)
        if (tl == 0 || po + tl + 3 > pe) return false
        var i = po + tl + 2
        val flags = b(i) & 0xff
        i += 1
        (flags & 0x06) match {
          case 0x00 => () // no lacing
          case 0x04 => // fixed-size lacing: count byte only
            if (i >= pe) return false
            i += 1
          case 0x02 => // Xiph: count byte + 255-run sizes for count frames
            if (i >= pe) return false
            val c = b(i) & 0xff
            i += 1
            var k = 0
            while (k < c) {
              var more = true
              while (more) {
                if (i >= pe) return false
                more = (b(i) & 0xff) == 255
                i += 1
              }
              k += 1
            }
          case _ => // EBML lacing: count byte + size vint + count-1 deltas
            if (i >= pe) return false
            val c = b(i) & 0xff
            i += 1
            var k = 0
            while (k < c) {
              val (_, l) = ebmlVint(b, i, pe, keepMarker = false)
              if (l == 0) return false
              i += l
              k += 1
            }
        }
        any = true
        while (i < pe) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
        true
      }
      // an UNKNOWN-SIZE cluster (live-stream muxing: terminated only by
      // the next cluster id) extends to the segment end, so later
      // clusters arrive as its "children" — recurse on the cluster id
      // to keep hashing their blocks in file order
      def walkCluster(qo: Int, qe: Int): Boolean =
        walkEbml(b, qo, qe) { (id3, ro, re) =>
          if (id3 == 0xA3L) hashBlock(ro, re) // SimpleBlock
          else if (id3 == 0xA0L) // BlockGroup
            walkEbml(b, ro, re) { (id4, so, se) =>
              if (id4 == 0xA1L) hashBlock(so, se) else true // Block
            }
          else if (id3 == 0x1F43B675L) walkCluster(ro, re)
          else true
        }
      val ok = walkEbml(b, 0, b.length) { (id, po, pe) =>
        if (id != 0x18538067L) true // Segment
        else walkEbml(b, po, pe) { (id2, qo, qe) =>
          if (id2 != 0x1F43B675L) true // Cluster
          else walkCluster(qo, qe)
        }
      }
      if (ok && any) Some(h) else None
    }

    /** Container-dispatching video payload fingerprint: the one entry
      * point the dedup family (one-shot pairs, keyed store, streaming
      * twin, curation/training stages) routes through — MP4/MOV via the
      * atom walk, WebM/MKV via the EBML walk. Both hash the raw coded
      * bytes with the same FNV-1a, so identity holds across a
      * cross-container remux too.
      */
    private[graft] def videoPayloadFp(b: Array[Byte]): Option[Long] =
      if (b == null) None
      else if (isMp4(b)) mp4PayloadFp(b)
      else if (isEbml(b)) webmPayloadFp(b)
      else None

    /** Shared mean-stat feature for the RGB-interleaved decoders
      * (GIF/BMP): the JPEG layout [width, height, meanR, meanG, meanB,
      * luminance], means in 0..1.
      */
    private def rgbFeatures(r: MediaRow, mime: String,
        px: Array[Byte], w: Int, h: Int): MediaFeatures = {
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < px.length) {
        sr += px(i) & 0xff; sg += px(i + 1) & 0xff; sb += px(i + 2) & 0xff
        i += 3
      }
      val n = w.toLong * h
      val mr = (sr.toDouble / n / 255.0).toFloat
      val mg = (sg.toDouble / n / 255.0).toFloat
      val mb = (sb.toDouble / n / 255.0).toFloat
      val lum = 0.299f * mr + 0.587f * mg + 0.114f * mb
      MediaFeatures(r.doc_id, r.media.length, mime, "pixels",
        byteChecksum(r.media),
        Array(w.toFloat, h.toFloat, mr, mg, mb, lum))
    }

    /** FLAC: REAL sample decode through [[Flac]] (fixed/LPC subframes,
      * Rice residuals, stereo decorrelation — no codec library), same
      * feature layout as WAV: [channels, sampleRate, durationSec, rms]
      * over the decoded mono mix, kind "lossless". A payload whose
      * frames don't decode falls back to byte statistics.
      */
    private def decodeFlac(r: MediaRow): Option[MediaFeatures] =
      for {
        (sampleRate, channels, _, total) <- Flac.info(r.media)
        (x, _) <- AudioDsp.monoSamples(r.media)
      } yield {
        var sum = 0.0
        var i = 0
        while (i < x.length) { sum += x(i) * x(i); i += 1 }
        val rms = if (x.isEmpty) 0.0 else math.sqrt(sum / x.length)
        MediaFeatures(r.doc_id, r.media.length, "audio/flac", "lossless",
          byteChecksum(r.media),
          Array(channels.toFloat, sampleRate.toFloat,
            total.toFloat / sampleRate, rms.toFloat))
      }

    /** AIFF/AIFC (r13): pure container math through [[Aiff.decode]] —
      * PCM/sowt/G.711/float32 forms are "pcm" rows with the WAV
      * feature layout; an AIFC compression outside that surface
      * (ima4 etc.) keeps COMM geometry on the census-visible
      * container side.
      */
    private def decodeAiff(r: MediaRow): Option[MediaFeatures] = {
      Aiff.decode(r.media) match {
        case Some((x, sampleRate)) if x.nonEmpty =>
          val channels = Aiff.info(r.media).map(_._1).getOrElse(1)
          return Some(MediaFeatures(r.doc_id, r.media.length, "audio/aiff",
            "pcm", byteChecksum(r.media),
            Array(channels.toFloat, sampleRate.toFloat,
              (x.length.toDouble / sampleRate).toFloat, rmsOf(x))))
        case _ => ()
      }
      Aiff.info(r.media).map { case (channels, rate, frames, _) =>
        MediaFeatures(r.doc_id, r.media.length, "audio/aiff", "container",
          byteChecksum(r.media),
          Array(channels.toFloat, rate.toFloat,
            (frames / rate).toFloat, 0f))
      }
    }

    /** AU/.snd (r13): [[Au.decode]] — all documented PCM/G.711/float
      * encodings decode; anything else is a container row with the
      * header geometry.
      */
    private def decodeAu(r: MediaRow): Option[MediaFeatures] = {
      Au.decode(r.media) match {
        case Some((x, sampleRate)) if x.nonEmpty =>
          val channels = Au.info(r.media).map(_._1).getOrElse(1)
          return Some(MediaFeatures(r.doc_id, r.media.length, "audio/basic",
            "pcm", byteChecksum(r.media),
            Array(channels.toFloat, sampleRate.toFloat,
              (x.length.toDouble / sampleRate).toFloat, rmsOf(x))))
        case _ => ()
      }
      Au.info(r.media).map { case (channels, rate, _, _, dataLen) =>
        MediaFeatures(r.doc_id, r.media.length, "audio/basic", "container",
          byteChecksum(r.media),
          Array(channels.toFloat, rate.toFloat, 0f, dataLen.toFloat))
      }
    }

    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        classify(r, unwrapGzip = true)
          .getOrElse(StubCodec.decode(Seq(r)).head)
      }

    /** The format dispatch. `unwrapGzip` allows ONE transparent gzip
      * unwrap (r15): a gzipped payload whose inflated bytes classify
      * to a real class reports that class with a `gzip:` format
      * prefix (outer byte length and checksum — dedup keys stay on
      * the stored bytes); gzip of unclassifiable content falls to
      * byte-stats under the DECLARED format (the wrapper carries no
      * information). One layer only — nested gzip cannot recurse.
      * A `.warc.gz` never reaches here: Warc.isWarc sniffs it first.
      */
    private def classify(r: MediaRow,
        unwrapGzip: Boolean): Option[MediaFeatures] = {
        val parsed =
          if (isPng(r.media)) decodePng(r)
          else if (isWav(r.media)) decodeWav(r)
          else if (Flac.isFlac(r.media)) decodeFlac(r)
          else if (isJpeg(r.media)) decodeJpeg(r)
          else if (isWebp(r.media)) decodeWebp(r)
          else if (isMp4(r.media)) isoImageMime(r.media) match {
            // AVIF/HEIC/HEIF: image-branded ISO-BMFF routes to the
            // meta/ispe geometry walk; a malformed image brand falls
            // to byte-stats (NOT video semantics), which is exactly
            // what the census should count
            case Some(m) => decodeHeif(r, m)
            case None    => decodeMp4(r)
          }
          else if (isEbml(r.media)) decodeWebm(r)
          else if (isGif(r.media))
            gifRgb(r.media).map { case (px, w, h) =>
              // animation surface rides the feature row (the audio-
              // duration precedent): [.., frameCount, durationSec]
              val f0 = rgbFeatures(r, "image/gif", px, w, h)
              val anim = gifFrames(r.media, maxHashFrames = 0)
              f0.copy(feature = f0.feature ++ Array(
                anim.map(_.frameCount.toFloat).getOrElse(1f),
                anim.map(_.durationSec.toFloat).getOrElse(0f)))
            }
          else if (isBmp(r.media))
            bmpRgb(r.media).map { case (px, w, h) =>
              rgbFeatures(r, "image/bmp", px, w, h) }
          else if (isTiff(r.media))
            tiffRgb(r.media).map { case (px, w, h) =>
              rgbFeatures(r, "image/tiff", px, w, h) }
          else if (isIco(r.media))
            icoRgb(r.media).map { case (px, w, h) =>
              rgbFeatures(r, "image/x-icon", px, w, h) }
          else if (isOgg(r.media)) decodeOgg(r)
          else if (Aiff.isAiff(r.media)) decodeAiff(r)
          else if (Au.isAu(r.media)) decodeAu(r)
          else if (isMp3(r.media)) decodeMp3(r)
          else if (Pdf.isPdf(r.media))
            // PDF (r14, ext.Pdf): a document whose pages extract is a
            // "text" row — [pages, totalChars, refusedCodes, 0] — so
            // the census counts the crawl's long-form text heap; a
            // PDF header whose body refuses parse falls to byte-stats
            Pdf.text(r.media).map { t =>
              MediaFeatures(r.doc_id, r.media.length, "application/pdf",
                "text", byteChecksum(r.media),
                Array(t.pages.length.toFloat,
                  t.pages.map(_.length).sum.toFloat,
                  t.refused.toFloat, 0f))
            }
          // ORDER: the zip/rtf/warc magics are exact at offset 0;
          // the HTML sniff is a loose 1 KiB scan that would claim a
          // WARC (or any container) whose head happens to carry an
          // '<html' payload — precise magics go first
          else if (Office.isZip(r.media))
            // DOCX/EPUB/ODT (r15, ext.Office): zip-container documents
            // land the "text" regime; a plain zip that is NONE of them
            // is a counted CONTAINER class like tar — [members,
            // docMembers] — with members flowing through
            // Office.zipDocTable (an archive is not a document, but
            // since r15 it is no longer an opaque byte blob either)
            Office.text(r.media).map { t =>
              val mime = t.kind match {
                case "docx" => "application/docx"
                case "epub" => "application/epub+zip"
                case _ => "application/vnd.oasis.opendocument.text"
              }
              MediaFeatures(r.doc_id, r.media.length, mime, "text",
                byteChecksum(r.media),
                Array(t.text.length.toFloat,
                  t.title.map(_.length).getOrElse(0).toFloat,
                  t.refused.toFloat, 0f))
            }.orElse(Office.zipMembersRaw(r.media).map { ms =>
              MediaFeatures(r.doc_id, r.media.length, "application/zip",
                "container", byteChecksum(r.media),
                Array(ms.length.toFloat,
                  ms.count(m => Documents.dispatch(m._2).isDefined)
                    .toFloat, 0f, 0f))
            })
          else if (Rtf.isRtf(r.media))
            // RTF (r15, ext.Rtf): the legacy rich-text class joins
            // the "text" regime — [textChars, titleChars, 0, 0]
            Rtf.text(r.media).map { t =>
              MediaFeatures(r.doc_id, r.media.length, "application/rtf",
                "text", byteChecksum(r.media),
                Array(t.text.length.toFloat,
                  t.title.map(_.length).getOrElse(0).toFloat, 0f, 0f))
            }
          else if (Warc.isWarc(r.media))
            // WARC (r15, ext.Warc): crawl archives are a container
            // class — [records, responses, 0, 0]; the document text
            // inside flows through Warc.docTable, not the census
            Warc.records(r.media).map { rs =>
              MediaFeatures(r.doc_id, r.media.length,
                "application/warc", "container", byteChecksum(r.media),
                Array(rs.length.toFloat,
                  rs.count(_.warcType == "response").toFloat, 0f, 0f))
            }

          else if (Tar.isTar(r.media))
            // TAR (r15, ext.Tar): dump archives are a container
            // class — [members, docMembers, 0, 0]; member text flows
            // through Tar.docTable, not the census. Exact ustar magic
            // must also beat the loose HTML sniff (the first member's
            // bytes sit inside the 1 KiB window)
            Tar.entries(r.media).map { es =>
              MediaFeatures(r.doc_id, r.media.length,
                "application/x-tar", "container", byteChecksum(r.media),
                Array(es.length.toFloat,
                  es.count(e => Documents.dispatch(e.data).isDefined)
                    .toFloat, 0f, 0f))
            }
          else if (Email.isEmail(r.media))
            // Email/MBOX (r15, ext.Email): the mailing-list heap is
            // "text" — [messages, totalChars, 0, 0]; must sniff
            // BEFORE the loose HTML scan (an html-bodied message
            // would otherwise classify by its payload)
            Email.messages(r.media).map { ms =>
              MediaFeatures(r.doc_id, r.media.length, "message/rfc822",
                "text", byteChecksum(r.media),
                Array(ms.length.toFloat,
                  ms.map(_.text.length).sum.toFloat, 0f, 0f))
            }
          else if (Html.isHtml(r.media))
            // HTML (r15, ext.Html): the crawl's dominant text format —
            // a "text" row [textChars, titleChars, refusedEntities, 0];
            // the extractor is total once sniffed, so no byte-stats
            // fallback class exists for the html brand
            Html.text(r.media).map { t =>
              MediaFeatures(r.doc_id, r.media.length, "text/html",
                "text", byteChecksum(r.media),
                Array(t.text.length.toFloat,
                  t.title.map(_.length).getOrElse(0).toFloat,
                  t.refused.toFloat, 0f))
            }
          else if (Xml.isXml(r.media))
            // generic XML (r15, ext.Xml) — AFTER the Html check, so
            // XHTML routes through the html extractor
            Xml.text(r.media).map { t =>
              MediaFeatures(r.doc_id, r.media.length, "application/xml",
                "text", byteChecksum(r.media),
                Array(t.text.length.toFloat, 0f, t.refused.toFloat, 0f))
            }
          else None
        parsed.orElse {
          if (unwrapGzip && Warc.isGzip(r.media))
            Warc.gunzip(r.media, 1 << 26).flatMap { inner =>
              classify(r.copy(media = inner), unwrapGzip = false)
                .map(f => f.copy(byte_len = r.media.length,
                  format = "gzip:" + f.format,
                  checksum = byteChecksum(r.media)))
            }
          else None
        }
      }
  }

  /** Deterministic minimal-MP4 synthesizer (`ftyp` + `moov{mvhd,
    * trak{tkhd}×n}`) — the [[AudioDsp.sineWav]] analog for the video
    * gates: doc_id-derived parameters stay SQL-restatable while the
    * atom walk runs on real ISO-BMFF bytes end-to-end. Track 1 carries
    * the visual geometry; extra tracks are soundtrack-shaped (zero
    * width/height). mvhd/tkhd are version 0.
    */
  private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] =
    java.nio.ByteBuffer.allocate(8 + payload.length)
      .putInt(8 + payload.length).put(typ.getBytes("US-ASCII"))
      .put(payload).array()

  private val mp4Ftyp: Array[Byte] = mp4Box("ftyp",
    "isom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0) ++
      "isomiso2".getBytes("US-ASCII"))

  /** The shared `moov` builder: mvhd + tracks-many traks (track 1
    * carries the visual geometry; extra tracks are soundtrack-shaped).
    * `mdhdTimescale` > 0 adds an mdia/mdhd per trak (the media clock
    * the fragmented trun-duration path reads); `mehdTicks` >= 0 adds
    * mvex/mehd (the fragmented total the muxer knew up front).
    */
  private def mp4Moov(timescale: Int, durationTicks: Long, tracks: Int,
      width: Int, height: Int, mdhdTimescale: Int = 0,
      mehdTicks: Long = -1L): Array[Byte] = {
    val mvhd = mp4Box("mvhd", {
      val bb = java.nio.ByteBuffer.allocate(100) // v0 payload
      bb.putInt(0)                       // version 0 + flags
        .putInt(0).putInt(0)             // creation, modification
        .putInt(timescale).putInt(durationTicks.toInt)
        .putInt(0x00010000)              // rate 1.0
        .putShort(0x0100.toShort)        // volume 1.0
        .putShort(0).putLong(0L)         // reserved
      Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
        .foreach(bb.putInt)              // identity matrix
      bb.position(bb.position() + 24)    // pre_defined ×6
      bb.putInt(tracks + 1)              // next_track_ID
      bb.array()
    })
    val traks = (1 to tracks).map { i =>
      val tkhd = mp4Box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(84) // v0 payload
        bb.putInt(7)                     // version 0 + flags (enabled)
          .putInt(0).putInt(0)           // creation, modification
          .putInt(i).putInt(0)           // track_ID, reserved
          .putInt(durationTicks.toInt)
          .putLong(0L)                   // reserved
          .putShort(0).putShort(0)       // layer, alternate_group
          .putShort(if (i == 1) 0 else 0x0100.toShort) // volume
          .putShort(0)                   // reserved
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)            // identity matrix
        bb.putInt(if (i == 1) width << 16 else 0)   // 16.16 fixed
          .putInt(if (i == 1) height << 16 else 0)
        bb.array()
      })
      val mdia =
        if (mdhdTimescale <= 0) Array.empty[Byte]
        else mp4Box("mdia", mp4Box("mdhd",
          java.nio.ByteBuffer.allocate(20) // v0 payload
            .putInt(0).putInt(0).putInt(0)
            .putInt(mdhdTimescale).putInt(0).array()))
      mp4Box("trak", tkhd ++ mdia)
    }
    val mvex =
      if (mehdTicks < 0) Array.empty[Byte]
      else mp4Box("mvex", mp4Box("mehd",
        java.nio.ByteBuffer.allocate(8)
          .putInt(0).putInt(mehdTicks.toInt).array()))
    mp4Box("moov", mvhd ++ traks.flatten ++ mvex)
  }

  def minimalMp4(timescale: Int, durationTicks: Long, tracks: Int,
      width: Int, height: Int,
      mdat: Array[Byte] = Array.empty,
      moovFirst: Boolean = true,
      freePad: Int = 0): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && tracks >= 1,
      s"minimalMp4: timescale=$timescale duration=$durationTicks tracks=$tracks")
    require(freePad >= 0, s"minimalMp4: freePad $freePad")
    val moov = mp4Moov(timescale, durationTicks, tracks, width, height)
    // remux knobs for the payload-fingerprint gates: carry real sample
    // bytes, relocate moov after mdat (the faststart rewrite in
    // reverse), pad with a free atom — byte-different files whose mdat
    // payload is identical
    val mdatBox =
      if (mdat.isEmpty) Array.empty[Byte] else mp4Box("mdat", mdat)
    val free =
      if (freePad == 0) Array.empty[Byte]
      else mp4Box("free", new Array[Byte](freePad))
    if (moovFirst) mp4Ftyp ++ moov ++ free ++ mdatBox
    else mp4Ftyp ++ mdatBox ++ free ++ moov
  }

  /** Minimal MP4 with ONE 3GPP timed-text (tx3g) track and FULL sample
    * tables (stsd/stts/stsc/stsz/stco) over an mdat of u16be-length
    * text samples — the layout MP4Box/ffmpeg write for subtitle muxes,
    * and the first fixture exercising a real sample-table walk. Cues
    * are (durationTicks, text), contiguous from t=0 on the mdhd
    * `timescale` clock. Samples pack TWO per chunk so the stsc
    * run-length mapping is genuinely walked (an odd count adds a
    * second one-sample run).
    */
  def minimalMp4Tx3g(timescale: Int,
      cues: Seq[(Long, String)]): Array[Byte] = {
    require(timescale > 0 && cues.nonEmpty, "minimalMp4Tx3g args")
    val samples = cues.map { case (_, t) =>
      val tb = t.getBytes("UTF-8")
      java.nio.ByteBuffer.allocate(2 + tb.length)
        .putShort(tb.length.toShort).put(tb).array()
    }
    val totalTicks = cues.map(_._1).sum
    val chunkGroups = samples.grouped(2).toSeq
    def full(p: Array[Byte]) = Array[Byte](0, 0, 0, 0) ++ p
    // tx3g sample entry: 6 reserved + u16 data_ref_index, then the
    // 3GPP fields (display flags, justification, bg color, text box,
    // default style record) — zeroed defaults
    val stsd = mp4Box("stsd",
      full(java.nio.ByteBuffer.allocate(4).putInt(1).array() ++
        mp4Box("tx3g", new Array[Byte](38))))
    val stts = mp4Box("stts", full {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 * cues.length)
      bb.putInt(cues.length)
      cues.foreach { case (d, _) => bb.putInt(1).putInt(d.toInt) }
      bb.array()
    })
    val stscRuns =
      if (chunkGroups.length <= 1) Seq((1, samples.length))
      else if (samples.length % 2 == 0) Seq((1, 2))
      else Seq((1, 2), (chunkGroups.length, 1))
    val stsc = mp4Box("stsc", full {
      val bb = java.nio.ByteBuffer.allocate(4 + 12 * stscRuns.length)
      bb.putInt(stscRuns.length)
      stscRuns.foreach { case (fc, spc) =>
        bb.putInt(fc).putInt(spc).putInt(1)
      }
      bb.array()
    })
    val stsz = mp4Box("stsz", full {
      val bb = java.nio.ByteBuffer.allocate(8 + 4 * samples.length)
      bb.putInt(0).putInt(samples.length)
      samples.foreach(s => bb.putInt(s.length))
      bb.array()
    })
    def buildMoov(chunkOffs: Seq[Int]): Array[Byte] = {
      val stco = mp4Box("stco", full {
        val bb = java.nio.ByteBuffer.allocate(4 + 4 * chunkOffs.length)
        bb.putInt(chunkOffs.length)
        chunkOffs.foreach(bb.putInt)
        bb.array()
      })
      val stbl = mp4Box("stbl", stsd ++ stts ++ stsc ++ stsz ++ stco)
      val mdhd = mp4Box("mdhd",
        java.nio.ByteBuffer.allocate(20)
          .putInt(0).putInt(0).putInt(0)
          .putInt(timescale).putInt(totalTicks.toInt).array())
      val hdlr = mp4Box("hdlr",
        full(java.nio.ByteBuffer.allocate(20).putInt(0)
          .put("sbtl".getBytes("US-ASCII"))
          .putInt(0).putInt(0).putInt(0).array() ++ Array[Byte](0)))
      val mdia = mp4Box("mdia", mdhd ++ hdlr ++ mp4Box("minf", stbl))
      val tkhd = mp4Box("tkhd", {
        val bb = java.nio.ByteBuffer.allocate(84)
        bb.putInt(7).putInt(0).putInt(0).putInt(1).putInt(0)
          .putInt(totalTicks.toInt).putLong(0L)
          .putShort(0).putShort(0).putShort(0).putShort(0)
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.putInt(0).putInt(0)
        bb.array()
      })
      val mvhd = mp4Box("mvhd", {
        val bb = java.nio.ByteBuffer.allocate(100)
        bb.putInt(0).putInt(0).putInt(0)
          .putInt(timescale).putInt(totalTicks.toInt)
          .putInt(0x00010000).putShort(0x0100.toShort)
          .putShort(0).putLong(0L)
        Seq(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
          .foreach(bb.putInt)
        bb.position(bb.position() + 24)
        bb.putInt(2)
        bb.array()
      })
      mp4Box("moov", mvhd ++ mp4Box("trak", tkhd ++ mdia))
    }
    val probe = buildMoov(Seq.fill(chunkGroups.length)(0))
    val mdatPayloadOff = mp4Ftyp.length + probe.length + 8
    val offs = chunkGroups.scanLeft(mdatPayloadOff)(
      (o, g) => o + g.map(_.length).sum).dropRight(1)
    val moov = buildMoov(offs)
    require(moov.length == probe.length, "tx3g moov size drifted")
    mp4Ftyp ++ moov ++ mp4Box("mdat", samples.flatten.toArray)
  }

  /** Deterministic AVIF/HEIC/HEIF synthesizer — the [[minimalMp4]]
    * analog for the ISO-BMFF IMAGE heap: `ftyp` with the image brand,
    * `meta{hdlr(pict), iinf{infe ×items}, iprp{ipco{ispe (+ a smaller
    * alpha/thumbnail ispe)}}}` and, for image SEQUENCES, `moov{mvhd,
    * trak{mdia{minf{stbl{stts}}}}}` with per-entry sample counts.
    * AV1/HEVC payload stays out — this synthesizes exactly the
    * envelope the census geometry walk reads, so gate parameters stay
    * SQL-restatable while the walk runs on real ISO-BMFF bytes.
    */
  def minimalHeif(majorBrand: String, width: Int, height: Int,
      items: Int = 1,
      compatBrands: Seq[String] = Nil,
      alphaIspe: Option[(Int, Int)] = None,
      sttsCounts: Seq[Int] = Nil,
      timescale: Int = 0, durationTicks: Long = 0L,
      mvhdV1: Boolean = false): Array[Byte] = {
    require(majorBrand.length == 4 && compatBrands.forall(_.length == 4),
      s"minimalHeif: brands must be 4cc ($majorBrand $compatBrands)")
    require(width > 0 && height > 0 && items >= 1,
      s"minimalHeif: $width x $height items=$items")
    require(sttsCounts.forall(_ >= 0) && timescale >= 0,
      s"minimalHeif: stts=$sttsCounts timescale=$timescale")
    val ftyp = mp4Box("ftyp",
      majorBrand.getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
        compatBrands.flatMap(_.getBytes("US-ASCII")).toArray)
    val hdlr = mp4Box("hdlr",
      java.nio.ByteBuffer.allocate(25).putInt(0).putInt(0)
        .put("pict".getBytes("US-ASCII")).array()) // 12 reserved + nul
    val infes = (1 to items).map { i =>
      mp4Box("infe", java.nio.ByteBuffer.allocate(13)
        .putInt(0x02000000)              // version 2 + flags
        .putShort(i.toShort).putShort(0) // item_ID, protection
        .put((if (majorBrand.startsWith("avi")) "av01" else "hvc1")
          .getBytes("US-ASCII"))
        .array())                        // trailing nul item name
    }
    val iinf = mp4Box("iinf",
      java.nio.ByteBuffer.allocate(6).putInt(0) // version 0 + flags
        .putShort(items.toShort).array() ++ infes.flatten)
    def ispe(w: Int, h: Int) = mp4Box("ispe",
      java.nio.ByteBuffer.allocate(12).putInt(0).putInt(w).putInt(h)
        .array())
    val ipco = mp4Box("ipco", ispe(width, height) ++
      alphaIspe.map { case (w, h) => ispe(w, h) }
        .getOrElse(Array.empty[Byte]))
    val meta = mp4Box("meta",
      Array[Byte](0, 0, 0, 0) ++ hdlr ++ iinf ++ mp4Box("iprp", ipco))
    val moov =
      if (sttsCounts.isEmpty) Array.empty[Byte]
      else {
        val mvhd = mp4Box("mvhd",
          if (mvhdV1)
            java.nio.ByteBuffer.allocate(32)
              .putInt(0x01000000)        // version 1
              .putLong(0L).putLong(0L)   // creation, modification
              .putInt(timescale).putLong(durationTicks).array()
          else
            java.nio.ByteBuffer.allocate(20)
              .putInt(0).putInt(0).putInt(0)
              .putInt(timescale).putInt(durationTicks.toInt).array())
        val stts = {
          val bb = java.nio.ByteBuffer.allocate(8 + sttsCounts.length * 8)
          bb.putInt(0).putInt(sttsCounts.length)
          sttsCounts.foreach(n => bb.putInt(n).putInt(1)) // count, delta
          mp4Box("stts", bb.array())
        }
        mp4Box("moov", mvhd ++ mp4Box("trak", mp4Box("mdia",
          mp4Box("minf", mp4Box("stbl", stts)))))
      }
    ftyp ++ meta ++ moov
  }

  /** Deterministic FRAGMENTED-MP4 synthesizer (DASH/live-capture
    * shape): mvhd duration 0, an mvex (with mehd when `mehdTicks` >=
    * 0), and one `moof`+`mdat` pair per chunk — mfhd sequence, traf
    * with tfhd (carrying default_sample_duration when
    * `perSampleDurations` is off) and trun (per-sample durations when
    * on). The same coded bytes split across fragment mdats in file
    * order, so [[ContainerCodec.mp4PayloadFp]] must pair a progressive
    * file with its fragmented re-mux — the re-wrap class
    * `videoPayloadFp` exists for, in its DASH form.
    */
  def minimalFmp4(timescale: Int, width: Int, height: Int,
      chunks: Seq[(Array[Byte], Seq[Int])],
      mehdTicks: Long = -1L,
      perSampleDurations: Boolean = true): Array[Byte] = {
    require(timescale > 0 && chunks.nonEmpty,
      s"minimalFmp4: timescale=$timescale chunks=${chunks.length}")
    chunks.foreach { case (_, durs) =>
      require(durs.nonEmpty && durs.forall(_ >= 0), "minimalFmp4: durations")
      require(perSampleDurations || durs.distinct.length == 1,
        "minimalFmp4: the tfhd-default form needs uniform durations")
    }
    val moov = mp4Moov(timescale, 0L, 1, width, height,
      mdhdTimescale = timescale, mehdTicks = mehdTicks)
    val frags = chunks.zipWithIndex.flatMap { case ((mdat, durs), i) =>
      val mfhd = mp4Box("mfhd", java.nio.ByteBuffer.allocate(8)
        .putInt(0).putInt(i + 1).array())
      val tfhd = mp4Box("tfhd", {
        val flags = if (perSampleDurations) 0 else 0x8
        val bb = java.nio.ByteBuffer.allocate(8 + (if (flags == 0x8) 4 else 0))
        bb.putInt(flags).putInt(1) // flags, track_ID
        if (flags == 0x8) bb.putInt(durs.head)
        bb.array()
      })
      val trun = mp4Box("trun", {
        val flags = if (perSampleDurations) 0x100 else 0
        val bb = java.nio.ByteBuffer.allocate(
          8 + (if (perSampleDurations) 4 * durs.length else 0))
        bb.putInt(flags).putInt(durs.length)
        if (perSampleDurations) durs.foreach(bb.putInt)
        bb.array()
      })
      mp4Box("moof", mfhd ++ mp4Box("traf", tfhd ++ trun)) ++
        mp4Box("mdat", mdat)
    }
    mp4Ftyp ++ moov ++ frags.toArray
  }

  /** Deterministic minimal-WebM/Matroska synthesizer — the
    * [[minimalMp4]] analog on the EBML container, with the remux knobs
    * the payload-fingerprint gates need: the same coded `frames` can be
    * re-chunked across Clusters, re-wrapped SimpleBlock <-> BlockGroup,
    * re-LACED (Xiph, pairs per block), padded with Void, and carried
    * under different Title/MuxingApp/TimestampScale metadata — all
    * byte-different files whose frame payload is identical. doc_id-
    * derived parameters stay SQL-restatable while the EBML walk runs on
    * real Matroska bytes end-to-end.
    */
  def minimalWebm(
      timestampScale: Long,
      durationTicks: Double,
      width: Int, height: Int,
      frames: Seq[Array[Byte]] = Seq.empty,
      framesPerCluster: Int = 2,
      blockGroups: Boolean = false,
      xiphLacePairs: Boolean = false,
      voidPad: Int = 0,
      title: String = "",
      audioTrack: Boolean = false,
      docType: String = "webm",
      // live-capture muxers commonly omit Info.Duration — the fixture
      // knob for the duration-less geometry class
      noDuration: Boolean = false,
      // subtitle cues (startTicks, durTicks, text) on an S_TEXT/UTF8
      // track (number 3): each cue a BlockGroup with BlockDuration in
      // its own Cluster — the layout mkvmerge writes for SRT muxes
      subtitleCues: Seq[(Long, Long, String)] = Nil,
      // styled cues on an S_TEXT/ASS track (number 4): each payload
      // the Dialogue-line remnant mkvmerge stores — ReadOrder, Layer,
      // Style, Name, margins, Effect, then the RAW text field (which
      // may itself carry commas and {\...} override blocks)
      assCues: Seq[(Long, Long, String)] = Nil,
      // streamed/live-mux layout: Clusters written before Info/Tracks
      // in segment order (legal Matroska — a single-pass reader that
      // binds tracks only after seeing Tracks drops every such cue)
      clustersFirst: Boolean = false): Array[Byte] = {
    require(timestampScale > 0 && durationTicks >= 0 && width > 0 &&
      height > 0, s"minimalWebm: ts=$timestampScale dur=$durationTicks " +
      s"${width}x$height")
    require(framesPerCluster >= 1 && voidPad >= 0,
      s"minimalWebm: fpc=$framesPerCluster void=$voidPad")
    def sizeVint(n: Long): Array[Byte] = {
      var len = 1
      while (len < 8 && n >= (1L << (7 * len)) - 1) len += 1
      val out = new Array[Byte](len)
      var v = n | (1L << (7 * len)) // marker bit
      var i = len - 1
      while (i >= 0) { out(i) = (v & 0xff).toByte; v >>>= 8; i -= 1 }
      out
    }
    def idBytes(id: Long): Array[Byte] = {
      var len = 1
      while ((id >>> (8 * len)) != 0) len += 1
      Array.tabulate(len)(i => ((id >>> (8 * (len - 1 - i))) & 0xff).toByte)
    }
    def elem(id: Long, payload: Array[Byte]): Array[Byte] =
      idBytes(id) ++ sizeVint(payload.length.toLong) ++ payload
    def uintPayload(v: Long): Array[Byte] = {
      var len = 1
      while ((v >>> (8 * len)) != 0) len += 1
      Array.tabulate(len)(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte)
    }
    val header = elem(0x1A45DFA3L,
      elem(0x4282L, docType.getBytes("US-ASCII")) ++
        elem(0x4287L, uintPayload(2)) ++ // DocTypeVersion
        elem(0x4285L, uintPayload(2)))   // DocTypeReadVersion
    val info = elem(0x1549A966L,
      elem(0x2AD7B1L, uintPayload(timestampScale)) ++
        (if (noDuration) Array.empty[Byte]
         else elem(0x4489L, java.nio.ByteBuffer.allocate(8)
           .putDouble(durationTicks).array())) ++
        (if (title.isEmpty) Array.empty[Byte]
         else elem(0x7BA9L, title.getBytes("UTF-8")) ++
           elem(0x4D80L, title.reverse.getBytes("UTF-8"))))
    def track(num: Int, typ: Int, codec: String, video: Boolean) =
      elem(0xAEL,
        elem(0xD7L, uintPayload(num.toLong)) ++   // TrackNumber
          elem(0x83L, uintPayload(typ.toLong)) ++ // TrackType
          elem(0x86L, codec.getBytes("US-ASCII")) ++
          (if (!video) Array.empty[Byte]
           else elem(0xE0L,
             elem(0xB0L, uintPayload(width.toLong)) ++
               elem(0xBAL, uintPayload(height.toLong)))))
    val tracks = elem(0x1654AE6BL,
      track(1, 1, "V_VP9", video = true) ++
        (if (audioTrack) track(2, 2, "A_OPUS", video = false)
         else Array.empty[Byte]) ++
        (if (subtitleCues.isEmpty) Array.empty[Byte]
         else track(3, 0x11, "S_TEXT/UTF8", video = false)) ++
        (if (assCues.isEmpty) Array.empty[Byte]
         else track(4, 0x11, "S_TEXT/ASS", video = false)))
    def simpleBlock(fs: Seq[Array[Byte]]): Array[Byte] = {
      // one block per call: unlaced single frame, or a Xiph lace of all
      val flags = if (fs.length > 1) 0x82 else 0x80 // key [+ Xiph lacing]
      val lace =
        if (fs.length == 1) Array.empty[Byte]
        else Array((fs.length - 1).toByte) ++
          fs.dropRight(1).flatMap { f =>
            Array.fill(f.length / 255)(255.toByte) :+ (f.length % 255).toByte
          }
      val payload = Array[Byte](0x81.toByte, 0, 0, flags.toByte) ++
        lace ++ fs.flatten
      if (blockGroups && fs.length == 1)
        elem(0xA0L, elem(0xA1L,
          payload.updated(3, (flags & 0x7f).toByte))) // Block: no key bit
      else elem(0xA3L, payload)
    }
    val clusters = frames.grouped(framesPerCluster).zipWithIndex.map {
      case (fs, ci) =>
        val blocks =
          if (xiphLacePairs) fs.grouped(2).map(simpleBlock).toSeq
          else fs.map(f => simpleBlock(Seq(f)))
        elem(0x1F43B675L,
          elem(0xE7L, uintPayload(ci.toLong * 40)) ++
            blocks.flatten.toArray)
    }.toSeq
    val void =
      if (voidPad == 0) Array.empty[Byte]
      else elem(0xECL, new Array[Byte](voidPad))
    val subClusters = subtitleCues.map { case (start, dur, text) =>
      elem(0x1F43B675L,
        elem(0xE7L, uintPayload(start)) ++
          elem(0xA0L, // BlockGroup: Block (track 3, rel 0) + duration
            elem(0xA1L, Array[Byte](0x83.toByte, 0, 0, 0) ++
              text.getBytes("UTF-8")) ++
              elem(0x9BL, uintPayload(dur))))
    } ++ assCues.zipWithIndex.map { case ((start, dur, text), ro) =>
      val payload = s"$ro,0,Default,,0,0,0,,$text"
      elem(0x1F43B675L,
        elem(0xE7L, uintPayload(start)) ++
          elem(0xA0L, // BlockGroup: Block (track 4, rel 0) + duration
            elem(0xA1L, Array[Byte](0x84.toByte, 0, 0, 0) ++
              payload.getBytes("UTF-8")) ++
              elem(0x9BL, uintPayload(dur))))
    }
    header ++ elem(0x18538067L,
      if (clustersFirst)
        clusters.flatten.toArray ++ subClusters.flatten.toArray ++
          info ++ tracks ++ void
      else
        info ++ tracks ++ void ++ clusters.flatten.toArray ++
          subClusters.flatten.toArray)
  }

  /** Deterministic PNG encoder (the [[minimalMp4]]/[[AudioDsp.sineWav]]
    * analog for images): real signature/IHDR/IDAT/IEND chunks with
    * correct CRCs, per-row forward filtering (types 0-4) and a real
    * zlib stream at the given deflate level — so re-encoding gates can
    * synthesize two DIFFERENT byte-level encodings of the SAME pixels
    * (different filter choices, different compression level, IDAT split
    * in two, different COLOR MODEL: truecolor vs PLTE palette vs
    * sub-byte gray, different BIT DEPTH: 8 vs 16 where each sample
    * expands to v·257 per the spec, PROGRESSIVE: Adam7 interlaced vs
    * sequential) and hold the perceptual hash to invariance across
    * them. `pixels` is interleaved row-major, one byte per sample
    * (w·h·channels bytes; palette = one index per pixel, sub-byte =
    * one value per pixel packed at write time, 16-bit = the high byte,
    * low byte replicated at write time). When `interlace` is set the
    * `filters` seq cycles over the concatenated Adam7 pass rows.
    */
  def encodePng(
      w: Int, h: Int, colorType: Int, pixels: Array[Byte],
      filters: Seq[Int],
      deflateLevel: Int = java.util.zip.Deflater.DEFAULT_COMPRESSION,
      splitIdat: Boolean = false,
      bitDepth: Int = 8,
      palette: Option[Array[Byte]] = None,
      interlace: Boolean = false): Array[Byte] = {
    val channels = ContainerCodec.pngChannelsOf(colorType)
    require(channels > 0, s"encodePng: unsupported colorType $colorType")
    require(bitDepth == 8 || (bitDepth == 16 && colorType != 3) ||
      (Seq(1, 2, 4).contains(bitDepth) && (colorType == 0 || colorType == 3)),
      s"encodePng: bitDepth $bitDepth with colorType $colorType")
    require((colorType == 3) == palette.isDefined,
      "encodePng: palette iff colorType 3")
    palette.foreach { pal =>
      require(pal.nonEmpty && pal.length % 3 == 0 && pal.length <= 768,
        s"encodePng: palette of ${pal.length} bytes")
      require(pixels.forall(px => (px & 0xff) < pal.length / 3),
        "encodePng: palette index out of range")
    }
    if (bitDepth < 8)
      require(pixels.forall(px => (px & 0xff) < (1 << bitDepth)),
        s"encodePng: sample past $bitDepth bits")
    require(pixels.length == w * h * channels && filters.nonEmpty &&
      (interlace || filters.length == h),
      s"encodePng: need $w*$h*$channels sample bytes and $h filters")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit =
      o.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
    def chunk(id: String, payload: Array[Byte]): Unit = {
      be32(out, payload.length)
      val body = id.getBytes("US-ASCII") ++ payload
      out.write(body)
      val crc = new java.util.zip.CRC32; crc.update(body)
      be32(out, crc.getValue)
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(bitDepth); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(if (interlace) 1 else 0)
    chunk("IHDR", ihdr.toByteArray)
    palette.foreach(pal => chunk("PLTE", pal))
    // pack samples into scanline bytes (sub-byte: MSB-first; 16-bit:
    // the spec's v·257 expansion = the sample byte twice, big-endian),
    // then forward-filter each packed line with its requested type.
    // Interlaced output emits the seven Adam7 passes in order, each
    // filtered as its own image; `filters` cycles over pass rows.
    val bpp = math.max(1, channels * bitDepth / 8)
    def packLine(samples: Array[Byte], pw: Int): Array[Byte] =
      if (bitDepth == 8) samples
      else if (bitDepth == 16) {
        val line = new Array[Byte](samples.length * 2)
        var i = 0
        while (i < samples.length) {
          line(2 * i) = samples(i); line(2 * i + 1) = samples(i)
          i += 1
        }
        line
      } else {
        val line = new Array[Byte]((pw * bitDepth + 7) / 8)
        var x = 0
        while (x < pw) {
          val bitPos = x * bitDepth
          line(bitPos >> 3) = (line(bitPos >> 3) |
            ((samples(x) & 0xff) << (8 - bitDepth - (bitPos & 7)))).toByte
          x += 1
        }
        line
      }
    val passes =
      if (!interlace) Seq((0, 0, 1, 1))
      else Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val rawOut = new java.io.ByteArrayOutputStream()
    var fIdx = 0
    for ((xs, ys, xi, yi) <- passes) {
      val pw = (w - xs + xi - 1) / xi
      val ph = (h - ys + yi - 1) / yi
      if (pw > 0 && ph > 0) {
        var prevLine: Array[Byte] = null
        for (j <- 0 until ph) {
          val y = ys + j * yi
          val samples = new Array[Byte](pw * channels)
          var i = 0
          while (i < pw) {
            var c = 0
            while (c < channels) {
              samples(i * channels + c) =
                pixels((y * w + (xs + i * xi)) * channels + c)
              c += 1
            }
            i += 1
          }
          val line = packLine(samples, pw)
          val ft = filters(fIdx % filters.length); fIdx += 1
          require(ft >= 0 && ft <= 4, s"encodePng: filter $ft")
          rawOut.write(ft)
          var x = 0
          while (x < line.length) {
            val v = line(x) & 0xff
            val a = if (x >= bpp) line(x - bpp) & 0xff else 0
            val u = if (prevLine != null) prevLine(x) & 0xff else 0
            val c = if (prevLine != null && x >= bpp) prevLine(x - bpp) & 0xff
              else 0
            val pred = ft match {
              case 0 => 0
              case 1 => a
              case 2 => u
              case 3 => (a + u) >> 1
              case 4 =>
                val p = a + u - c
                val pa = math.abs(p - a); val pb = math.abs(p - u)
                val pc = math.abs(p - c)
                if (pa <= pb && pa <= pc) a else if (pb <= pc) u else c
            }
            rawOut.write((v - pred) & 0xff)
            x += 1
          }
          prevLine = line
        }
      }
    }
    val raw = rawOut.toByteArray
    val deflater = new java.util.zip.Deflater(deflateLevel)
    deflater.setInput(raw); deflater.finish()
    val zipped = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!deflater.finished()) zipped.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val z = zipped.toByteArray
    if (splitIdat && z.length >= 2) { // one zlib stream over two IDATs
      chunk("IDAT", z.take(z.length / 2))
      chunk("IDAT", z.drop(z.length / 2))
    } else chunk("IDAT", z)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** One frame of the APNG encoder: `pixels` is fw·fh·channels
    * interleaved 8-bit samples blitted at (x, y); delay is the
    * num/den-second rational; `dispose` 0/1/2 = none/background/
    * previous, `blend` 0/1 = source/over — the fcTL fields verbatim.
    */
  final case class ApngFrameSpec(
      pixels: Array[Byte], fw: Int, fh: Int, x: Int = 0, y: Int = 0,
      delayNum: Int = 0, delayDen: Int = 100,
      dispose: Int = 0, blend: Int = 0)

  /** Deterministic APNG encoder (the [[encodeGifAnimFrames]] analog on
    * PNG's animation chunks): real acTL/fcTL/fdAT chunks with correct
    * CRCs and consecutive sequence numbers, each frame its own zlib
    * stream over filter-0 scanlines at the image's color type (8-bit
    * gray/RGB/GA/RGBA). Without `defaultImage` the first frame IS the
    * IDAT (its fcTL precedes IDAT — the common exporter layout); with
    * it, the IDAT carries a default image hidden from the animation
    * and every frame ships as fdAT. `splitFdat` splits each frame's
    * stream over two fdAT chunks (sequence numbers still consecutive) —
    * the multi-chunk delivery a reader must reassemble.
    */
  def encodeApng(w: Int, h: Int, colorType: Int,
      frames: Seq[ApngFrameSpec],
      defaultImage: Option[Array[Byte]] = None,
      splitFdat: Boolean = false,
      // indexed color (colorType 3): the palette, plus optional tRNS
      // per-index alphas — the GIF-style transparency APNG optimizers
      // emit for delta frames
      palette: Option[Array[Byte]] = None,
      trns: Option[Array[Byte]] = None): Array[Byte] = {
    val channels = ContainerCodec.pngChannelsOf(colorType)
    require(channels > 0, s"encodeApng: colorType $colorType")
    require((colorType == 3) == palette.isDefined,
      "encodeApng: palette iff colorType 3")
    palette.foreach { pal =>
      require(pal.nonEmpty && pal.length % 3 == 0 && pal.length <= 768,
        s"encodeApng: palette of ${pal.length} bytes")
    }
    trns.foreach { t =>
      require(palette.isDefined && t.length <= palette.get.length / 3,
        "encodeApng: tRNS needs a palette covering its entries")
    }
    require(frames.nonEmpty, "encodeApng: no frames")
    frames.foreach { f =>
      require(f.fw > 0 && f.fh > 0 && f.x >= 0 && f.y >= 0 &&
        f.x + f.fw <= w && f.y + f.fh <= h &&
        f.pixels.length == f.fw * f.fh * channels,
        s"encodeApng: frame ${f.fw}x${f.fh}+${f.x}+${f.y} in ${w}x$h")
      require(f.dispose >= 0 && f.dispose <= 2 && (f.blend & ~1) == 0 &&
        f.delayNum >= 0 && f.delayNum <= 0xffff &&
        f.delayDen >= 0 && f.delayDen <= 0xffff,
        s"encodeApng: fcTL fields out of range")
    }
    defaultImage.foreach(d => require(d.length == w * h * channels,
      s"encodeApng: default image needs $w*$h*$channels samples"))
    require(defaultImage.isDefined ||
      (frames.head.fw == w && frames.head.fh == h &&
        frames.head.x == 0 && frames.head.y == 0),
      "encodeApng: an IDAT-backed first frame must cover the canvas")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def be32(o: java.io.ByteArrayOutputStream, v: Long): Unit =
      o.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte,
        v.toByte))
    def chunk(id: String, payload: Array[Byte]): Unit = {
      be32(out, payload.length)
      val body = id.getBytes("US-ASCII") ++ payload
      out.write(body)
      val crc = new java.util.zip.CRC32; crc.update(body)
      be32(out, crc.getValue)
    }
    def deflated(px: Array[Byte], fw: Int, fh: Int): Array[Byte] = {
      val raw = new Array[Byte]((1 + fw * channels) * fh)
      var y = 0
      while (y < fh) { // filter 0 per row
        System.arraycopy(px, y * fw * channels,
          raw, y * (1 + fw * channels) + 1, fw * channels)
        y += 1
      }
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val z = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) z.write(buf, 0, d.deflate(buf))
      d.end()
      z.toByteArray
    }
    val ihdr = new java.io.ByteArrayOutputStream()
    be32(ihdr, w); be32(ihdr, h)
    ihdr.write(8); ihdr.write(colorType)
    ihdr.write(0); ihdr.write(0); ihdr.write(0)
    chunk("IHDR", ihdr.toByteArray)
    palette.foreach(chunk("PLTE", _))
    trns.foreach(chunk("tRNS", _))
    val actl = new java.io.ByteArrayOutputStream()
    be32(actl, frames.length); be32(actl, 0) // num_frames, infinite plays
    chunk("acTL", actl.toByteArray)
    var seq = 0
    def fctl(f: ApngFrameSpec): Unit = {
      val p = new java.io.ByteArrayOutputStream()
      be32(p, seq); seq += 1
      be32(p, f.fw); be32(p, f.fh); be32(p, f.x); be32(p, f.y)
      p.write((f.delayNum >> 8) & 0xff); p.write(f.delayNum & 0xff)
      p.write((f.delayDen >> 8) & 0xff); p.write(f.delayDen & 0xff)
      p.write(f.dispose); p.write(f.blend)
      chunk("fcTL", p.toByteArray)
    }
    def fdat(z: Array[Byte]): Unit = {
      val parts =
        if (splitFdat && z.length >= 2)
          Seq(z.take(z.length / 2), z.drop(z.length / 2))
        else Seq(z)
      parts.foreach { part =>
        val p = new java.io.ByteArrayOutputStream()
        be32(p, seq); seq += 1
        p.write(part)
        chunk("fdAT", p.toByteArray)
      }
    }
    defaultImage match {
      case Some(d) => // hidden default image; all frames are fdAT
        chunk("IDAT", deflated(d, w, h))
        frames.foreach { f => fctl(f); fdat(deflated(f.pixels, f.fw, f.fh)) }
      case None => // the first frame IS the IDAT
        fctl(frames.head)
        chunk("IDAT", deflated(frames.head.pixels, w, h))
        frames.tail.foreach { f =>
          fctl(f); fdat(deflated(f.pixels, f.fw, f.fh))
        }
    }
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Grayscale PNG with a HAND-WRITTEN stored-deflate zlib stream
    * (filter 0, one stored block): a fully valid PNG the real
    * inflate+unfilter decode path consumes, whose plane bytes ALSO sit
    * at closed-form payload offsets —
    *
    *   plane(x, y) = payload[48 + y·(w+1) + 1 + x]
    *
    * (sig 8 + IHDR 25 + IDAT len/type 8 + zlib hdr 2 + stored-block
    * hdr 5 = 48) — so a SQL engine with no PNG library can read the
    * plane straight out of the payload when a gate wants byte-level
    * replay. (The `ext_image_dhash_px` oracle goes one step further and
    * regenerates the plane from its closed-form formula instead,
    * holding the whole encode→inflate→unfilter→hash loop to it.) Row
    * payload must fit one stored block (h·(w+1) <= 65535).
    */
  def storedGrayPng(plane: Array[Byte], w: Int, h: Int): Array[Byte] = {
    require(plane.length == w * h, s"storedGrayPng: need $w*$h plane bytes")
    val rawLen = h * (w + 1)
    require(rawLen <= 0xffff, s"storedGrayPng: $rawLen > one stored block")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    def be32(v: Long): Unit =
      out.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte))
    def chunk(id: String, payload: Array[Byte]): Unit = {
      be32(payload.length)
      val body = id.getBytes("US-ASCII") ++ payload
      out.write(body)
      val crc = new java.util.zip.CRC32; crc.update(body)
      be32(crc.getValue)
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte) // gray, 8-bit
      .put(0.toByte).put(0.toByte).put(0.toByte).array()
    chunk("IHDR", ihdr)
    val raw = new Array[Byte](rawLen) // h rows of (filter 0, w gray bytes)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * w, raw, y * (w + 1) + 1, w)
      y += 1
    }
    val adler = new java.util.zip.Adler32; adler.update(raw)
    val a = adler.getValue
    val idat = java.nio.ByteBuffer.allocate(2 + 5 + rawLen + 4)
      .put(0x78.toByte).put(0x01.toByte)          // zlib header (78 01 % 31 == 0)
      .put(0x01.toByte)                           // bfinal=1, btype=stored
      .put((rawLen & 0xff).toByte).put((rawLen >> 8).toByte)
      .put((~rawLen & 0xff).toByte).put(((~rawLen >> 8) & 0xff).toByte)
      .put(raw)
      .put((a >> 24).toByte).put((a >> 16).toByte)
      .put((a >> 8).toByte).put(a.toByte)
      .array()
    chunk("IDAT", idat)
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** Deterministic GIF encoder (the [[encodePng]] analog): real
    * GIF89a header, global color table, image descriptor, and a REAL
    * variable-width LZW stream (dictionary growth, width widening one
    * code behind the decoder's — the GIF off-by-one — sub-block
    * framing), optionally 4-pass interlaced — so format-invariance
    * gates can hold one picture across PNG/GIF/BMP byte encodings.
    * `palette` is 3·2^k RGB bytes (GIF color tables are power-of-two
    * sized); `indices` one palette index per pixel, row-major.
    */
  def encodeGif(w: Int, h: Int, indices: Array[Byte], palette: Array[Byte],
      interlace: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    gifHeaderTo(out, w, h, palette)
    gifFrameTo(out, w, h, indices, palette, interlace)
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** Multi-frame GIF89a encoder: each frame is a full-canvas image
    * descriptor preceded by a Graphic Control Extension carrying its
    * delay (centiseconds) — the two-cut dedup and frame-surface gates'
    * fixture writer. Frames share the global color table.
    */
  def encodeGifAnim(w: Int, h: Int, frames: Seq[Array[Byte]],
      palette: Array[Byte], delaysCs: Seq[Int]): Array[Byte] = {
    require(frames.nonEmpty && frames.length == delaysCs.length,
      s"encodeGifAnim: ${frames.length} frames, ${delaysCs.length} delays")
    encodeGifAnimFrames(w, h,
      frames.zip(delaysCs).map { case (f, d) =>
        GifFrameSpec(f, w, h, delayCs = d)
      }, palette)
  }

  /** One frame of the positioned/delta GIF encoder: `indices` is a
    * fw×fh region blitted at (left, top) on the logical screen;
    * `disposal` is the GCE disposal method (0/1 keep, 2 restore
    * background, 3 restore previous); `transparent` an optional
    * transparent palette index (-1 = none).
    */
  final case class GifFrameSpec(
      indices: Array[Byte], fw: Int, fh: Int,
      left: Int = 0, top: Int = 0, delayCs: Int = 0,
      disposal: Int = 0, transparent: Int = -1)

  /** The general multi-frame GIF89a encoder: positioned region frames
    * with per-frame disposal and transparency — the DELTA-encoDING a
    * real optimizer emits (only the changed region ships, unchanged
    * pixels are transparent or outside the region). The compositing
    * gates synthesize delta-encoded and full-frame encodings of the
    * SAME animation with it and hold the landmark hashes to invariance.
    */
  def encodeGifAnimFrames(w: Int, h: Int, frames: Seq[GifFrameSpec],
      palette: Array[Byte]): Array[Byte] = {
    require(frames.nonEmpty, "encodeGifAnimFrames: no frames")
    val out = new java.io.ByteArrayOutputStream()
    gifHeaderTo(out, w, h, palette)
    frames.foreach { f =>
      require(f.delayCs >= 0 && f.delayCs <= 0xffff,
        s"encodeGifAnimFrames: delay ${f.delayCs}")
      require(f.disposal >= 0 && f.disposal <= 3,
        s"encodeGifAnimFrames: disposal ${f.disposal}")
      require(f.left >= 0 && f.top >= 0 && f.fw > 0 && f.fh > 0 &&
        f.left + f.fw <= w && f.top + f.fh <= h,
        s"encodeGifAnimFrames: region ${f.fw}x${f.fh}+${f.left}+${f.top} " +
          s"outside ${w}x$h")
      require(f.transparent >= -1 && f.transparent < palette.length / 3,
        s"encodeGifAnimFrames: transparent index ${f.transparent}")
      // GCE: introducer, label, block size 4, packed (disposal +
      // transparency flag), delay LE, transparent index, terminator
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparent >= 0) 1 else 0))
      out.write(f.delayCs & 0xff); out.write((f.delayCs >> 8) & 0xff)
      out.write(math.max(0, f.transparent)); out.write(0)
      gifFrameTo(out, f.fw, f.fh, f.indices, palette, interlace = false,
        left = f.left, top = f.top)
    }
    out.write(0x3b)
    out.toByteArray
  }

  private def gifHeaderTo(out: java.io.ByteArrayOutputStream, w: Int,
      h: Int, palette: Array[Byte]): Unit = {
    require(w > 0 && h > 0, s"encodeGif: screen ${w}x$h")
    val nColors = palette.length / 3
    require(palette.length % 3 == 0 && Integer.bitCount(nColors) == 1 &&
      nColors >= 2 && nColors <= 256,
      s"encodeGif: palette entries must be a power of two in 2..256, got $nColors")
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    val gctBits = 31 - Integer.numberOfLeadingZeros(nColors) // log2(nColors)
    out.write(0x80 | (gctBits - 1)) // GCT present, 2^(bits) entries
    out.write(0); out.write(0)      // background color, aspect ratio
    out.write(palette, 0, palette.length)
  }

  private def gifFrameTo(out: java.io.ByteArrayOutputStream, w: Int,
      h: Int, indices: Array[Byte], palette: Array[Byte],
      interlace: Boolean, left: Int = 0, top: Int = 0): Unit = {
    val nColors = palette.length / 3
    require(indices.length == w * h && indices.forall(i => (i & 0xff) < nColors),
      "encodeGif: frame indices out of palette/geometry range")
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write(0x2c); le16(left); le16(top); le16(w); le16(h)
    out.write(if (interlace) 0x40 else 0)
    // the row order the stream carries (interlace = the four GIF passes)
    val rows: Seq[Int] =
      if (!interlace) 0 until h
      else Seq((0, 8), (4, 8), (2, 4), (1, 2)).flatMap {
        case (s, st) => s until h by st
      }
    val stream = new Array[Byte](w * h)
    var sp = 0
    for (y <- rows) { System.arraycopy(indices, y * w, stream, sp, w); sp += w }
    val gctBits = 31 - Integer.numberOfLeadingZeros(nColors)
    val minCode = math.max(2, gctBits)
    out.write(minCode)
    val clear = 1 << minCode
    val endCode = clear + 1
    val bits = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L; var bitN = 0
    var codeWidth = minCode + 1
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitN; bitN += codeWidth
      while (bitN >= 8) {
        bits.write((bitBuf & 0xff).toInt); bitBuf >>= 8; bitN -= 8
      }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var dictSize = clear + 2
    emit(clear)
    var cur = stream(0) & 0xff
    var i = 1
    while (i < stream.length) {
      val k = stream(i) & 0xff
      val key = Integer.valueOf((cur << 8) | k)
      val hit = dict.get(key)
      if (hit != null) cur = hit.intValue()
      else {
        emit(cur)
        if (dictSize < 4096) {
          dict.put(key, Integer.valueOf(dictSize))
          dictSize += 1
          // the decoder registers each entry one code later, so the
          // encoder widens one entry past the width boundary
          if (dictSize == (1 << codeWidth) + 1 && codeWidth < 12)
            codeWidth += 1
        }
        cur = k
      }
      i += 1
    }
    emit(cur); emit(endCode)
    if (bitN > 0) bits.write((bitBuf & 0xff).toInt)
    val z = bits.toByteArray
    var o = 0
    while (o < z.length) {
      val n = math.min(255, z.length - o)
      out.write(n); out.write(z, o, n); o += n
    }
    out.write(0) // data terminator
  }

  /** Deterministic 24-bit BI_RGB BMP encoder: BGR rows, 4-byte padding,
    * bottom-up by default or top-down (negative height) when asked.
    * `rgb` is interleaved row-major RGB, top row first.
    */
  def encodeBmp(w: Int, h: Int, rgb: Array[Byte],
      topDown: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && rgb.length == w * h * 3,
      s"encodeBmp: need $w*$h*3 RGB bytes")
    val rowSize = (w * 3 + 3) / 4 * 4
    bmpBytes(w, h, topDown, rowSize, 24, Array.empty, (buf, off) => {
      var y = 0
      while (y < h) {
        val dst = off + (if (topDown) y else h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val po = (y * w + x) * 3
          buf(dst + x * 3) = rgb(po + 2)     // B
          buf(dst + x * 3 + 1) = rgb(po + 1) // G
          buf(dst + x * 3 + 2) = rgb(po)     // R
          x += 1
        }
        y += 1
      }
    })
  }

  /** Deterministic 8-bit paletted BI_RGB BMP encoder: BGRA palette
    * quads after the header, one index byte per pixel, padded rows.
    */
  def encodeBmp8(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte], topDown: Boolean = false): Array[Byte] = {
    val n = palette.length / 3
    require(palette.length % 3 == 0 && n >= 1 && n <= 256,
      s"encodeBmp8: palette of ${palette.length} bytes")
    require(w > 0 && h > 0 && indices.length == w * h,
      s"encodeBmp8: need $w*$h indices")
    require(indices.forall(i => (i & 0xff) < n),
      "encodeBmp8: index out of palette range")
    val quads = new Array[Byte](4 * n)
    var i = 0
    while (i < n) { // RGB palette -> BGRA quads
      quads(i * 4) = palette(i * 3 + 2)
      quads(i * 4 + 1) = palette(i * 3 + 1)
      quads(i * 4 + 2) = palette(i * 3)
      i += 1
    }
    val rowSize = (w + 3) / 4 * 4
    bmpBytes(w, h, topDown, rowSize, 8, quads, (buf, off) => {
      var y = 0
      while (y < h) {
        val dst = off + (if (topDown) y else h - 1 - y) * rowSize
        System.arraycopy(indices, y * w, buf, dst, w)
        y += 1
      }
    })
  }

  /** ICO container around prepared entry payloads — each a complete
    * PNG file or a headerless DIB ([[bmpToIcoDib]]). Entries are
    * (width, height, payload); 256 encodes as the directory's 0.
    */
  def encodeIco(entries: Seq[(Int, Int, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty && entries.size <= 0xffff, "encodeIco: entries")
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Int): Unit = { le16(v & 0xffff); le16((v >> 16) & 0xffff) }
    le16(0); le16(1); le16(entries.size)
    var off = 6 + entries.size * 16
    for ((w, h, payload) <- entries) {
      require(w >= 1 && w <= 256 && h >= 1 && h <= 256, s"encodeIco: ${w}x$h")
      out.write(if (w == 256) 0 else w)
      out.write(if (h == 256) 0 else h)
      out.write(0); out.write(0) // palette count, reserved
      le16(1); le16(32)          // planes, bitcount (advisory)
      le32(payload.length)
      le32(off)
      off += payload.length
    }
    entries.foreach(e => out.write(e._3))
    out.toByteArray
  }

  /** Headerless ICO DIB from an [[encodeBmp]]/[[encodeBmp8]] file:
    * strip the 14-byte file header, DOUBLE biHeight (the ICO
    * convention reserving space for the AND mask), append an all-zero
    * mask row block.
    */
  def bmpToIcoDib(bmp: Array[Byte]): Array[Byte] = {
    require(bmp.length > 54 && bmp(0) == 'B' && bmp(1) == 'M',
      "bmpToIcoDib: not a BMP file")
    def i32(o: Int): Int = (bmp(o) & 0xff) | ((bmp(o + 1) & 0xff) << 8) |
      ((bmp(o + 2) & 0xff) << 16) | ((bmp(o + 3) & 0xff) << 24)
    val w = i32(18)
    val h = i32(22)
    require(h > 0, "bmpToIcoDib: ICO DIBs are bottom-up — no topDown input")
    val maskRow = ((w + 31) / 32) * 4
    // copyOfRange zero-pads past the source end: that IS the AND mask
    val dib = java.util.Arrays.copyOfRange(bmp, 14,
      bmp.length + h * maskRow)
    val h2 = h * 2
    dib(8) = h2.toByte; dib(9) = (h2 >> 8).toByte
    dib(10) = (h2 >> 16).toByte; dib(11) = (h2 >> 24).toByte
    dib
  }

  /** PackBits RLE (the TIFF baseline compressor): runs of 3+ become
    * repeat packets, everything else literal packets of up to 128.
    */
  private def packBitsEncode(src: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < src.length) {
      var run = 1
      while (i + run < src.length && run < 128 && src(i + run) == src(i))
        run += 1
      if (run >= 3) {
        out.write(1 - run); out.write(src(i)); i += run
      } else {
        var j = i
        def runAhead(p: Int) = p + 2 < src.length &&
          src(p) == src(p + 1) && src(p) == src(p + 2)
        while (j < src.length && j - i < 128 && !runAhead(j)) j += 1
        out.write(j - i - 1)
        out.write(src, i, j - i)
        i = j
      }
    }
    out.toByteArray
  }

  /** Baseline-TIFF fixture encoder: a real IFD writer in either byte
    * order — 8-bit gray (both photometric polarities), RGB, and
    * 256-color palette, single- or multi-strip, Compression 1 or
    * PackBits. `samples` is gray bytes (pm 0/1/3: palette indices) or
    * interleaved RGB (pm 2).
    */
  def encodeTiff(w: Int, h: Int, samples: Array[Byte], photometric: Int,
      palette: Array[Byte] = null, bigEndian: Boolean = false,
      packBits: Boolean = false, rowsPerStrip: Int = 0): Array[Byte] = {
    val spp = if (photometric == 2) 3 else 1
    require(photometric >= 0 && photometric <= 3,
      s"encodeTiff: photometric $photometric")
    require(w > 0 && h > 0 && samples.length == w * h * spp,
      s"encodeTiff: need $w*$h*$spp samples")
    if (photometric == 3)
      require(palette != null && palette.length == 768,
        "encodeTiff: palette photometric needs 256 RGB entries")
    val stored =
      if (photometric == 0) samples.map(v => (255 - (v & 0xff)).toByte)
      else samples
    val rps = if (rowsPerStrip <= 0) h else rowsPerStrip
    val rowBytes = w * spp
    val strips = (0 until h by rps).map { y0 =>
      val rows = math.min(rps, h - y0)
      val raw = java.util.Arrays.copyOfRange(
        stored, y0 * rowBytes, (y0 + rows) * rowBytes)
      if (packBits) packBitsEncode(raw) else raw
    }
    val n = strips.length
    val dataStart = 8L
    val stripOffs = strips.scanLeft(dataStart)((o, s) => o + s.length).init
    var cur = dataStart + strips.map(_.length.toLong).sum
    val padData = (cur % 2).toInt // arrays start word-aligned
    cur += padData
    val bpsOff = if (spp == 3) { val o = cur; cur += 6; o } else -1L
    val cmapOff = if (photometric == 3) { val o = cur; cur += 1536; o } else -1L
    val soOff = if (n > 1) { val o = cur; cur += n * 4; o } else -1L
    val scOff = if (n > 1) { val o = cur; cur += n * 4; o } else -1L
    val ifdOff = cur
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit =
      if (bigEndian) { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
      else { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit =
      if (bigEndian) { w16(((v >> 16) & 0xffff).toInt); w16((v & 0xffff).toInt) }
      else { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    out.write(if (bigEndian) 'M' else 'I')
    out.write(if (bigEndian) 'M' else 'I')
    w16(42)
    w32(ifdOff)
    strips.foreach(s => out.write(s, 0, s.length))
    if (padData == 1) out.write(0)
    if (spp == 3) { w16(8); w16(8); w16(8) }
    if (photometric == 3)
      for (ch <- 0 until 3; idx <- 0 until 256)
        w16((palette(idx * 3 + ch) & 0xff) << 8)
    if (n > 1) { stripOffs.foreach(w32); strips.foreach(s => w32(s.length)) }
    // IFD: entries in ascending tag order, as the spec requires
    def entryInline16(tag: Int, v: Int): Unit = {
      w16(tag); w16(3); w32(1); w16(v); w16(0)
    }
    def entryInline32(tag: Int, v: Long): Unit = {
      w16(tag); w16(4); w32(1); w32(v)
    }
    def entryVec(tag: Int, typ: Int, count: Int, off: Long): Unit = {
      w16(tag); w16(typ); w32(count); w32(off)
    }
    val nEntries = 9 + (if (photometric == 3) 1 else 0)
    w16(nEntries)
    entryInline16(256, w)
    entryInline16(257, h)
    if (spp == 3) entryVec(258, 3, 3, bpsOff) else entryInline16(258, 8)
    entryInline16(259, if (packBits) 32773 else 1)
    entryInline16(262, photometric)
    if (n > 1) entryVec(273, 4, n, soOff)
    else entryInline32(273, stripOffs(0))
    entryInline16(277, spp)
    entryInline32(278, rps)
    if (n > 1) entryVec(279, 4, n, scOff)
    else entryInline32(279, strips(0).length)
    if (photometric == 3) entryVec(320, 3, 768, cmapOff)
    w32(0) // no next IFD
    out.toByteArray
  }

  /** Lossless-WebP (VP8L) fixture encoder: a real bitstream writer —
    * canonical Huffman codes (simple and code-length-coded), optional
    * color cache, greedy LZ77, and the subtract-green / predictor /
    * color-indexing transforms — wrapped in the RIFF container. Gray
    * input expands to equal RGB channels (BT.601 of equal channels is
    * the gray value exactly, the GIF-fixture identity). The knobs
    * produce byte-incompatible encodings of the SAME pixels for the
    * cross-encoding invariance gates.
    */
  def encodeWebpL(w: Int, h: Int, gray: Array[Byte],
      subtractGreen: Boolean = false, cacheBits: Int = 0,
      lz77: Boolean = false, predictor: Int = -1,
      palette: Boolean = false, colorXform: Boolean = false,
      meta: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && gray.length == w * h,
      s"encodeWebpL: need $w*$h samples")
    val argb = new Array[Int](w * h)
    var i = 0
    while (i < argb.length) {
      val v = gray(i) & 0xff
      argb(i) = 0xff000000 | (v << 16) | (v << 8) | v
      i += 1
    }
    val payload = Vp8l.encode(argb, w, h, subtractGreen = subtractGreen,
      cacheBits = cacheBits, lz77 = lz77, predictor = predictor,
      palette = palette, colorXform = colorXform, meta = meta)
    val padded = payload.length + (payload.length & 1)
    val out = new Array[Byte](12 + 8 + padded)
    def le32(o: Int, v: Int): Unit = {
      out(o) = v.toByte; out(o + 1) = (v >> 8).toByte
      out(o + 2) = (v >> 16).toByte; out(o + 3) = (v >> 24).toByte
    }
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(4, 4 + 8 + padded)
    out(8) = 'W'; out(9) = 'E'; out(10) = 'B'; out(11) = 'P'
    out(12) = 'V'; out(13) = 'P'; out(14) = '8'; out(15) = 'L'
    le32(16, payload.length)
    System.arraycopy(payload, 0, out, 20, payload.length)
    out
  }

  /** One frame of the animated-WebP encoder: packed ARGB pixels (what
    * [[Vp8l.encode]] consumes — alpha included) blitted at (x, y),
    * which must be EVEN (ANMF stores positions halved); `durationMs`
    * the exact 24-bit millisecond field; `disposeBg`/`blendOver` the
    * ANMF flag bits.
    */
  final case class WebpFrameSpec(
      argb: Array[Int], fw: Int, fh: Int, x: Int = 0, y: Int = 0,
      durationMs: Int = 0, disposeBg: Boolean = false,
      blendOver: Boolean = false)

  /** Deterministic animated-WebP encoder (the [[encodeGifAnimFrames]]
    * analog on RIFF): VP8X with the animation flag and minus-one
    * canvas fields, an ANIM chunk, and one ANMF per frame — halved
    * positions, minus-one sizes, 24-bit millisecond durations, the
    * dispose/blend flag byte, and a REAL lossless VP8L payload per
    * frame through [[Vp8l.encode]].
    */
  def encodeWebpAnim(w: Int, h: Int,
      frames: Seq[WebpFrameSpec]): Array[Byte] = {
    require(frames.nonEmpty, "encodeWebpAnim: no frames")
    require(w > 0 && h > 0 && w <= 0x1000000 && h <= 0x1000000,
      s"encodeWebpAnim: canvas ${w}x$h")
    frames.foreach { f =>
      require(f.fw > 0 && f.fh > 0 && f.x >= 0 && f.y >= 0 &&
        f.x % 2 == 0 && f.y % 2 == 0 &&
        f.x + f.fw <= w && f.y + f.fh <= h &&
        f.argb.length == f.fw * f.fh,
        s"encodeWebpAnim: frame ${f.fw}x${f.fh}+${f.x}+${f.y} in ${w}x$h " +
          "(positions must be even)")
      require(f.durationMs >= 0 && f.durationMs < (1 << 24),
        s"encodeWebpAnim: duration ${f.durationMs}")
    }
    val out = new java.io.ByteArrayOutputStream()
    def le24(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      o.write(v & 0xff); o.write((v >> 8) & 0xff); o.write((v >> 16) & 0xff)
    }
    def le32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
      le24(o, v); o.write((v >>> 24) & 0xff)
    }
    def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val c = new java.io.ByteArrayOutputStream()
      c.write(id.getBytes("US-ASCII")); le32(c, payload.length)
      c.write(payload)
      if ((payload.length & 1) == 1) c.write(0) // RIFF word alignment
      c.toByteArray
    }
    val vp8x = new java.io.ByteArrayOutputStream()
    vp8x.write(0x02) // animation flag
    vp8x.write(0); vp8x.write(0); vp8x.write(0) // reserved
    le24(vp8x, w - 1); le24(vp8x, h - 1)
    val animChunk = new java.io.ByteArrayOutputStream()
    le32(animChunk, 0) // background color (unused: transparent black)
    animChunk.write(0); animChunk.write(0) // loop count 0 = infinite
    val anmfs = frames.map { f =>
      val p = new java.io.ByteArrayOutputStream()
      le24(p, f.x / 2); le24(p, f.y / 2)
      le24(p, f.fw - 1); le24(p, f.fh - 1)
      le24(p, f.durationMs)
      p.write((if (f.blendOver) 0 else 0x02) | (if (f.disposeBg) 1 else 0))
      p.write(chunk("VP8L", Vp8l.encode(f.argb, f.fw, f.fh)))
      chunk("ANMF", p.toByteArray)
    }
    val body = chunk("VP8X", vp8x.toByteArray) ++
      chunk("ANIM", animChunk.toByteArray) ++ anmfs.flatten
    out.write("RIFF".getBytes("US-ASCII"))
    le32(out, 4 + body.length)
    out.write("WEBP".getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  /** Sub-byte paletted BMP fixture encoder (4-bit 16-color / 1-bit
    * 2-color — the icon classics): indices pack MSB-first within each
    * byte per the BMP convention.
    */
  def encodeBmpSub(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte], bits: Int,
      topDown: Boolean = false): Array[Byte] = {
    require(bits == 4 || bits == 1, s"encodeBmpSub: bits $bits")
    val n = palette.length / 3
    require(palette.length % 3 == 0 && n >= 1 && n <= (1 << bits),
      s"encodeBmpSub: palette of ${palette.length} bytes at $bits bits")
    require(w > 0 && h > 0 && indices.length == w * h,
      s"encodeBmpSub: need $w*$h indices")
    require(indices.forall(i => (i & 0xff) < n),
      "encodeBmpSub: index out of palette range")
    val quads = new Array[Byte](4 * n)
    var i = 0
    while (i < n) { // RGB palette -> BGRA quads
      quads(i * 4) = palette(i * 3 + 2)
      quads(i * 4 + 1) = palette(i * 3 + 1)
      quads(i * 4 + 2) = palette(i * 3)
      i += 1
    }
    val rowSize = ((w.toLong * bits + 31) / 32 * 4).toInt
    bmpBytes(w, h, topDown, rowSize, bits, quads, (buf, off) => {
      var y = 0
      while (y < h) {
        val dst = off + (if (topDown) y else h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val idx = indices(y * w + x) & 0xff
          if (bits == 4)
            buf(dst + (x >> 1)) =
              (buf(dst + (x >> 1)) | (idx << (4 - 4 * (x & 1)))).toByte
          else
            buf(dst + (x >> 3)) =
              (buf(dst + (x >> 3)) | (idx << (7 - (x & 7)))).toByte
          x += 1
        }
        y += 1
      }
    })
  }

  /** Deterministic BI_RLE8 BMP encoder — the legacy-clipart compression
    * the decoder's RLE branch consumes: per bottom-up row, runs of
    * equal indices emit encoded (count, index) pairs and mixed spans
    * emit absolute-mode literals (word-padded), each row closed by the
    * EOL escape and the stream by EOD — so the format-invariance gates
    * can hold one picture across BI_RGB and BI_RLE8 byte encodings.
    * `absoluteRuns` forces absolute mode for every span (both decoder
    * modes get exercised either way, since single pixels always emit
    * encoded pairs).
    */
  def encodeBmpRle8(w: Int, h: Int, indices: Array[Byte],
      palette: Array[Byte], absoluteRuns: Boolean = false): Array[Byte] = {
    val n = palette.length / 3
    require(palette.length % 3 == 0 && n >= 1 && n <= 256,
      s"encodeBmpRle8: palette of ${palette.length} bytes")
    require(w > 0 && h > 0 && indices.length == w * h,
      s"encodeBmpRle8: need $w*$h indices")
    require(indices.forall(i => (i & 0xff) < n),
      "encodeBmpRle8: index out of palette range")
    val rle = new java.io.ByteArrayOutputStream()
    var row = h - 1 // streams encode bottom-up
    while (row >= 0) {
      var x = 0
      while (x < w) {
        if (absoluteRuns && w - x >= 3) {
          // absolute mode: a literal span (minimum 3, maximum 255)
          val span = math.min(255, w - x)
          rle.write(0); rle.write(span)
          var i = 0
          while (i < span) {
            rle.write(indices(row * w + x + i) & 0xff); i += 1
          }
          if ((span & 1) == 1) rle.write(0) // word padding
          x += span
        } else {
          // encoded run (valid for any length 1..255)
          var run = 1
          while (x + run < w && run < 255 &&
            indices(row * w + x + run) == indices(row * w + x)) run += 1
          rle.write(run); rle.write(indices(row * w + x) & 0xff)
          x += run
        }
      }
      rle.write(0); rle.write(0) // end of line
      row -= 1
    }
    rle.write(0); rle.write(1)   // end of bitmap
    val data = rle.toByteArray
    val quads = new Array[Byte](4 * n)
    var i = 0
    while (i < n) { // RGB palette -> BGRA quads
      quads(i * 4) = palette(i * 3 + 2)
      quads(i * 4 + 1) = palette(i * 3 + 1)
      quads(i * 4 + 2) = palette(i * 3)
      i += 1
    }
    val dataOff = 54 + quads.length
    val buf = new Array[Byte](dataOff + data.length)
    def le16(o: Int, v: Int): Unit = {
      buf(o) = v.toByte; buf(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      le16(o, v & 0xffff); le16(o + 2, (v >> 16) & 0xffff)
    }
    buf(0) = 'B'; buf(1) = 'M'
    le32(2, buf.length); le32(10, dataOff)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w); le32(22, h) // RLE is bottom-up only
    le16(26, 1); le16(28, 8)
    le32(30, 1) // BI_RLE8
    le32(34, data.length)
    le32(46, n)
    System.arraycopy(quads, 0, buf, 54, quads.length)
    System.arraycopy(data, 0, buf, dataOff, data.length)
    buf
  }

  private def bmpBytes(w: Int, h: Int, topDown: Boolean, rowSize: Int,
      bits: Int, palette: Array[Byte],
      fill: (Array[Byte], Int) => Unit): Array[Byte] = {
    val dataOff = 54 + palette.length
    val buf = new Array[Byte](dataOff + rowSize * h)
    def le16(o: Int, v: Int): Unit = {
      buf(o) = v.toByte; buf(o + 1) = (v >> 8).toByte
    }
    def le32(o: Int, v: Int): Unit = {
      buf(o) = v.toByte; buf(o + 1) = (v >> 8).toByte
      buf(o + 2) = (v >> 16).toByte; buf(o + 3) = (v >> 24).toByte
    }
    buf(0) = 'B'; buf(1) = 'M'
    le32(2, buf.length); le32(10, dataOff)
    le32(14, 40) // BITMAPINFOHEADER
    le32(18, w); le32(22, if (topDown) -h else h)
    le16(26, 1); le16(28, bits)
    le32(30, 0) // BI_RGB
    le32(34, rowSize * h)
    le32(46, palette.length / 4) // biClrUsed
    System.arraycopy(palette, 0, buf, 54, palette.length)
    fill(buf, dataOff)
    buf
  }

  /** Build a media table from documents: text bytes stand in for media
    * payloads (opaque binary + typed metadata columns).
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("fake/rgb8").as("format"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** Batched decode/feature-extract over partitions. Partition-parallel,
    * no shuffle; batchSize bounds peak memory per task. The default
    * codec parses real PNG/WAV containers and falls back to byte-stats
    * for everything else; pass `StubCodec` for the deterministic
    * fake-payload form the rows-only verification uses.
    */
  def extractFeatures(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64,
      codec: MediaCodec = ContainerCodec): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => codec.decode(batch.toSeq))
    }
  }

  final case class ExifRow(doc_id: Long, orientation: Option[Int],
      make: Option[String], model: Option[String],
      taken_at: Option[String], lat: Option[Double], lon: Option[Double])

  /** Image PROVENANCE extraction: EXIF orientation / camera make +
    * model / capture timestamp / GPS position per document — the
    * metadata a curation pipeline mines for dedup attribution,
    * camera-source analysis, time-range filtering, and PRIVACY
    * screening (embedded GPS is PII: a corpus must be able to list and
    * strip located images) at corpus scale. Partition-parallel map, no
    * shuffle; rows without EXIF carry nulls (total). JPEG APP1 and
    * bare-TIFF EXIF in either byte order; lat/lon in signed decimal
    * degrees (S/W negative).
    */
  def exifTable(spark: SparkSession, media: DataFrame): Dataset[ExifRow] = {
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        ContainerCodec.exifOf(bytes) match {
          case Some((o, mk, md, dt, la, lo)) =>
            ExifRow(id, o, mk, md, dt, la, lo)
          case None => ExifRow(id, None, None, None, None, None, None)
        }
      })
  }

  /** Wrap a JPEG with an EXIF APP1 segment (little-endian TIFF: IFD0
    * tags Make/Model/Orientation + an ExifIFD with DateTimeOriginal,
    * plus a GPS IFD when `gps` carries d/m/s components) — the
    * provenance-extraction fixture writer. Strings must be at least 4
    * chars so every ASCII value takes the external-offset form the
    * reader expects for long values. `gps` is (latRef, latD, latM,
    * latS, lonRef, lonD, lonM, lonS) with integer components, the
    * common camera layout (den 1 rationals).
    */
  def exifJpeg(jpeg: Array[Byte], orientation: Int, make: String,
      model: String, takenAt: String,
      gps: Option[(String, Int, Int, Int, String, Int, Int, Int)] = None)
      : Array[Byte] = {
    require(jpeg.length >= 4 && (jpeg(0) & 0xff) == 0xff &&
      (jpeg(1) & 0xff) == 0xd8, "exifJpeg: not a JPEG")
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++
      exifTiff(orientation, make, model, takenAt, gps)
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe1) // APP1
    val len = payload.length + 2
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
    out.write(jpeg, 2, jpeg.length - 2)
    out.toByteArray
  }

  /** Insert a PNG `eXIf` chunk (bare-TIFF payload, correct CRC) right
    * after IHDR — the phone/exporter PNG provenance carrier.
    */
  def exifPng(png: Array[Byte], orientation: Int, make: String,
      model: String, takenAt: String,
      gps: Option[(String, Int, Int, Int, String, Int, Int, Int)] = None)
      : Array[Byte] = {
    require(ContainerCodec.isPng(png) && png.length >= 33,
      "exifPng: not a PNG")
    val tiff = exifTiff(orientation, make, model, takenAt, gps)
    val out = new java.io.ByteArrayOutputStream()
    out.write(png, 0, 33) // signature + IHDR
    def be32(v: Long): Unit =
      out.write(Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte,
        v.toByte))
    be32(tiff.length)
    val body = "eXIf".getBytes("US-ASCII") ++ tiff
    out.write(body)
    val crc = new java.util.zip.CRC32; crc.update(body)
    be32(crc.getValue)
    out.write(png, 33, png.length - 33)
    out.toByteArray
  }

  /** Append a WebP `EXIF` RIFF chunk (TIFF payload, optionally behind
    * the JPEG-style "Exif\0\0" prefix — both forms ship in the wild)
    * and patch the RIFF size — the phone/exporter WebP provenance
    * carrier. EXIF is an extended-format feature, so the output carries
    * the spec-shaped envelope: an existing VP8X gets its EXIF flag
    * (0x08) set; a simple-format input (bare VP8/VP8L first chunk) gets
    * a VP8X header synthesized in front with the EXIF flag and the
    * canvas geometry lifted from the bitstream header — mirroring
    * [[encodeWebpAnim]]'s VP8X emission.
    */
  def exifWebp(webp: Array[Byte], orientation: Int, make: String,
      model: String, takenAt: String,
      gps: Option[(String, Int, Int, Int, String, Int, Int, Int)] = None,
      exifPrefix: Boolean = false): Array[Byte] = {
    require(ContainerCodec.isWebp(webp), "exifWebp: not a WebP")
    val tiff0 = exifTiff(orientation, make, model, takenAt, gps)
    val tiff =
      if (exifPrefix)
        "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff0
      else tiff0
    val out = new java.io.ByteArrayOutputStream()
    val firstTag =
      if (webp.length >= 16) new String(webp, 12, 4, "US-ASCII") else ""
    if (firstTag == "VP8X") {
      out.write(webp, 0, webp.length)
      // EXIF flag set below, once the stream is a patchable array
    } else {
      // simple format: synthesize the VP8X envelope the EXIF feature
      // requires, canvas geometry from the VP8/VP8L bitstream header
      val po = 20 // 12 RIFF+WEBP + 8 chunk header
      val (w, h, alpha) = firstTag match {
        case "VP8L" =>
          require(webp.length >= po + 5 && (webp(po) & 0xff) == 0x2f,
            "exifWebp: malformed VP8L header")
          val bits = ((webp(po + 1) & 0xffL)) | ((webp(po + 2) & 0xffL) << 8) |
            ((webp(po + 3) & 0xffL) << 16) | ((webp(po + 4) & 0xffL) << 24)
          (((bits & 0x3fff) + 1).toInt, (((bits >> 14) & 0x3fff) + 1).toInt,
            ((bits >> 28) & 1).toInt)
        case "VP8 " =>
          require(webp.length >= po + 10 && (webp(po + 3) & 0xff) == 0x9d &&
            (webp(po + 4) & 0xff) == 0x01 && (webp(po + 5) & 0xff) == 0x2a,
            "exifWebp: malformed VP8 keyframe header")
          val w = ((webp(po + 6) & 0xff) | ((webp(po + 7) & 0xff) << 8)) & 0x3fff
          val h = ((webp(po + 8) & 0xff) | ((webp(po + 9) & 0xff) << 8)) & 0x3fff
          (w, h, 0)
        case t => throw new IllegalArgumentException(
          s"exifWebp: unsupported first chunk '$t'")
      }
      out.write(webp, 0, 12)
      out.write("VP8X".getBytes("US-ASCII"))
      out.write(10); out.write(0); out.write(0); out.write(0)
      out.write(0x08 | (alpha << 4)) // EXIF flag (+ alpha when declared)
      out.write(0); out.write(0); out.write(0) // reserved
      def le24(v: Int): Unit = {
        out.write(v & 0xff); out.write((v >> 8) & 0xff)
        out.write((v >> 16) & 0xff)
      }
      le24(w - 1); le24(h - 1)
      out.write(webp, 12, webp.length - 12)
    }
    out.write("EXIF".getBytes("US-ASCII"))
    out.write(tiff.length & 0xff); out.write((tiff.length >> 8) & 0xff)
    out.write((tiff.length >> 16) & 0xff); out.write((tiff.length >> 24) & 0xff)
    out.write(tiff, 0, tiff.length)
    if ((tiff.length & 1) == 1) out.write(0) // RIFF word alignment
    val bytes = out.toByteArray
    if (firstTag == "VP8X") // existing envelope: set the EXIF flag
      bytes(20) = (bytes(20) | 0x08).toByte
    val riffSz = bytes.length - 8
    bytes(4) = (riffSz & 0xff).toByte
    bytes(5) = ((riffSz >> 8) & 0xff).toByte
    bytes(6) = ((riffSz >> 16) & 0xff).toByte
    bytes(7) = ((riffSz >> 24) & 0xff).toByte
    bytes
  }

  /** The little-endian TIFF EXIF blob the three wrappers above embed:
    * IFD0 Make/Model/Orientation + an ExifIFD with DateTimeOriginal,
    * plus a GPS IFD when `gps` carries d/m/s components.
    */
  private def exifTiff(orientation: Int, make: String,
      model: String, takenAt: String,
      gps: Option[(String, Int, Int, Int, String, Int, Int, Int)])
      : Array[Byte] = {
    require(Seq(make, model, takenAt).forall(_.length >= 4),
      "exifTiff: strings must be >= 4 chars (external-offset form)")
    val mk = make.getBytes("US-ASCII") :+ 0.toByte
    val md = model.getBytes("US-ASCII") :+ 0.toByte
    val dt = takenAt.getBytes("US-ASCII") :+ 0.toByte
    val nIfd0 = if (gps.isDefined) 5 else 4
    val ifd0 = 8
    val exifIfd = ifd0 + 2 + nIfd0 * 12 + 4
    val gpsIfd = exifIfd + 2 + 1 * 12 + 4
    val gpsLen = if (gps.isDefined) 2 + 4 * 12 + 4 + 48 else 0
    val strBase = gpsIfd + gpsLen
    val mkOff = strBase
    val mdOff = mkOff + mk.length
    val dtOff = mdOff + md.length
    val tiff = java.nio.ByteBuffer.allocate(dtOff + dt.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd0)
    tiff.putShort(nIfd0.toShort) // IFD0 entries, ascending tags
    tiff.putShort(271).putShort(2).putInt(mk.length).putInt(mkOff)
    tiff.putShort(272).putShort(2).putInt(md.length).putInt(mdOff)
    tiff.putShort(274).putShort(3).putInt(1)
      .putShort(orientation.toShort).putShort(0)
    tiff.putShort(34665.toShort).putShort(4).putInt(1).putInt(exifIfd)
    if (gps.isDefined)
      tiff.putShort(34853.toShort).putShort(4).putInt(1).putInt(gpsIfd)
    tiff.putInt(0) // no next IFD
    tiff.putShort(1) // ExifIFD entries
    tiff.putShort(36867.toShort).putShort(2).putInt(dt.length).putInt(dtOff)
    tiff.putInt(0)
    gps.foreach { case (latRef, latD, latM, latS, lonRef, lonD, lonM, lonS) =>
      require(Set("N", "S").contains(latRef) && Set("E", "W").contains(lonRef),
        s"exifJpeg: gps refs $latRef/$lonRef")
      val latData = gpsIfd + 2 + 4 * 12 + 4
      val lonData = latData + 24
      def refBytes(s: String): Unit = { // ASCII count 2, inline value
        tiff.put(s.getBytes("US-ASCII")(0)).put(0.toByte)
          .put(0.toByte).put(0.toByte)
      }
      tiff.putShort(4) // GPS IFD entries, its own tag namespace
      tiff.putShort(1).putShort(2).putInt(2); refBytes(latRef)
      tiff.putShort(2).putShort(5).putInt(3).putInt(latData)
      tiff.putShort(3).putShort(2).putInt(2); refBytes(lonRef)
      tiff.putShort(4).putShort(5).putInt(3).putInt(lonData)
      tiff.putInt(0) // no next IFD
      Seq(latD, latM, latS, lonD, lonM, lonS).foreach { v =>
        tiff.putInt(v).putInt(1) // RATIONAL v/1
      }
    }
    tiff.put(mk).put(md).put(dt)
    tiff.array()
  }

  /** Corpus-level decode-coverage rollup: row counts per (format,
    * kind) over the extracted features — the codec-blind-spot census.
    * A 100 TB run that silently byte-statted its MP3s looks identical
    * to one that decoded them unless this number is on the data card;
    * group sizes are O(formats × kinds), driver-trivial.
    */
  def decodeCensus(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64,
      codec: MediaCodec = ContainerCodec): DataFrame =
    extractFeatures(spark, media, batchSize, codec).toDF()
      .groupBy("format", "kind")
      .agg(count(lit(1)).as("cnt"))
      .orderBy("format", "kind")

  /** Frame-sampling analog: pick every `stride`-th byte window as a
    * "frame" — the partitioning/explode mechanics of video frame
    * extraction with the codec stubbed.
    */
  def sampleFrames(media: DataFrame, stride: Int = 16, frame: Int = 8): DataFrame =
    media.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(((length(col("media")) - frame) / stride).cast("int"), lit(0))),
        i => substring(col("media"), (i * stride + 1).cast("int"), lit(frame))))
        .as(Seq("frame_idx", "frame_bytes")))

  // ----------------------------------------------- perceptual image dedup

  /** Perceptual difference-hash (dHash) of an 8-bit image plane held in
    * an opaque binary column — the image-side sibling of the text
    * near-dup signatures, as PURE Column arithmetic (hex + conv byte
    * extraction, integer grid math, shift/or bit packing: codegen'd, no
    * UDF, cross-engine restatable — the `ext_image_dhash` oracle
    * replays every bit in DuckDB).
    *
    * The classic algorithm: nearest-neighbor-sample the plane to a 9×8
    * grayscale grid, set bit (j·8+i) when grid(i,j) > grid(i+1,j) —
    * horizontal GRADIENT signs, so the 64-bit hash is invariant to
    * global brightness and robust to small edits, and near-duplicate
    * images differ in a few bits (Hamming). On a real corpus the grid
    * reads the DECODED grayscale plane (a codec concern — see the
    * ContainerCodec boundary); here the opaque payload bytes stand in
    * as the plane, row-major modulo the buffer — deterministic, and
    * identical hashes for identical payloads either way.
    *
    * Scale shape: one scan, ~144 byte extractions and 64 comparisons
    * per row, all inside whole-stage codegen; empty payloads hash to 0.
    * Degenerate rows — null media, null or non-positive width/height —
    * hash to NULL, not 0: hashing them all to one value would make every
    * such row a mutual hamming-0 "duplicate" and dedup stages would
    * silently drop all but the first. Callers skip null signatures.
    */
  def dHash(media: Column, width: Column, height: Column): Column = {
    val hx = hex(media)
    val len = length(media).cast("long") // octet length of the plane
    val w = width.cast("long")
    val h = height.cast("long")
    // grayscale plane value at grid cell (i of 9, j of 8)
    def g(i: Int, j: Int): Column = {
      val sx = floor(lit(i) * w / 9).cast("long")
      val sy = floor(lit(j) * h / 8).cast("long")
      val pos = pmod(sy * w + sx, len)
      when(len > 0,
        conv(substr(hx, (pos * 2 + 1).cast("int"), lit(2)), 16, 10)
          .cast("long")).otherwise(lit(0L))
    }
    val hash = (for { j <- 0 until 8; i <- 0 until 8 } yield
      when(g(i, j) > g(i + 1, j), shiftleft(lit(1L), j * 8 + i))
        .otherwise(lit(0L)))
      .reduce(_ bitwiseOR _)
    when(media.isNull || w.isNull || h.isNull || w <= 0 || h <= 0,
      lit(null).cast("long")).otherwise(hash)
  }

  /** [[dHash]] through the native `graft_dhash` expression when the
    * session has GraftExtensions, else the declarative tree —
    * bit-identical either way (ExtSpec-asserted), but the native call
    * is ONE generated statement where the declarative form is ~200
    * nodes of hex/substr/conv whose per-plan Janino compile dominated
    * the image gates. Both forms yield NULL on null media or degenerate
    * geometry (see [[dHash]]); this is the PAYLOAD-byte hash — for a
    * pixel-aware hash on decodable PNG/JPEG/GIF/BMP see [[dHashPixels]].
    */
  private[graft] def dHashAuto(s: SparkSession)(
      media: Column, width: Column, height: Column): Column =
    if (s.catalog.functionExists("graft_dhash"))
      call_function("graft_dhash", media,
        width.cast("int"), height.cast("int"))
    else dHash(media, width, height)

  /** The PIXEL-AWARE perceptual hash: struct<sh: bigint, kind: string>
    * where decodable PNG/JPEG/GIF/BMP payloads hash their decoded BT.601
    * grayscale plane (9×8 area-mean grid — see
    * `graft.functions.DHashPixels`; `kind` = "pixels") and everything
    * else falls back to the payload-byte [[dHash]] semantics with the
    * metadata geometry (`kind` = "payload"). Null media, or payload
    * regime with null/non-positive geometry, yields a NULL struct —
    * degenerate rows never cluster. The metadata width/height coalesce
    * to 0 BEFORE the call so a null metadata column cannot null out a
    * PNG whose real geometry comes from its own header.
    *
    * Native `graft_dhash_px` when the session has GraftExtensions (one
    * generated statement, whole-stage codegen); a typed-UDF fallback
    * with identical semantics otherwise (EXT-only path — acceptable
    * off the parity surface, and spec-asserted bit-identical).
    */
  def dHashPixels(s: SparkSession)(
      media: Column, width: Column, height: Column): Column = {
    val w = coalesce(width.cast("int"), lit(0))
    val h = coalesce(height.cast("int"), lit(0))
    if (s.catalog.functionExists("graft_dhash_px"))
      call_function("graft_dhash_px", media, w, h)
    else {
      val f = udf(graft.functions.DHashPixels.computeExternal _)
      f(media, w, h)
    }
  }

  /** Per-(regime) rollup over a media frame — how many images got REAL
    * perceptual treatment vs the payload-byte fallback (the decode-
    * census discipline applied to hashing; null = degenerate rows).
    */
  def imageHashCensus(media: DataFrame): DataFrame =
    media.select(dHashPixels(media.sparkSession)(
        col("media"), col("width"), col("height")).getField("kind").as("kind"))
      .groupBy("kind").agg(count(lit(1)).as("cnt"))
      .orderBy("kind")

  /** Near-duplicate image pairs by PERCEPTUAL dHash Hamming distance
    * over a `mediaTable`-shaped frame (doc_id, media, width, height):
    * hash = one scan (decoded-plane regime for PNG/JPEG/GIF/BMP, payload bytes
    * otherwise — see [[dHashPixels]]); pair search = the pigeonhole
    * chunk blocking shared with SimHash/RP-LSH
    * (`Dedup.hammingCandidates` — a pair within `maxHamming` bits MUST
    * agree on one whole chunk, so candidates come from same-chunk-value
    * buckets, never all-pairs), then exact Hamming verification.
    * Degenerate rows (null media/geometry) hash NULL and never pair.
    * Returns (id_a, id_b, hamming), id_a < id_b.
    */
  def imageNearDups(
      media: DataFrame,
      maxHamming: Int = 10,
      maxBucket: Int = 2000): DataFrame = {
    val sh = media.select(col("doc_id"),
      dHashPixels(media.sparkSession)(
        col("media"), col("width"), col("height")).getField("sh").as("sh"))
      .filter(col("sh").isNotNull)
      .localCheckpoint(false)
    Dedup.hammingCandidates(sh, maxHamming, maxBucket)
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Brute-force most-similar-image search: for each probe image, the k
    * lowest-Hamming corpus images by perceptual dHash — the exhaustive
    * baseline of image similarity (the `ext_batch_topk` shape with
    * Hamming in place of cosine; when a distance BOUND applies,
    * [[imageNearDups]]' chunk blocking is the sub-linear path). Probe
    * signatures broadcast along one unshuffled corpus signature scan;
    * the per-probe top-k is `GroupedTopK`'s bounded per-partition
    * heaps — no global sort, no corpus shuffle. Ties break to the lower
    * doc_id. Degenerate rows never score. Returns (q_id, doc_id,
    * hamming), k rows per probe.
    */
  def imageTopK(media: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val spark = media.sparkSession
    val corpus = media.select(col("doc_id"),
      dHashPixels(spark)(col("media"), col("width"), col("height"))
        .getField("sh").as("sh"))
      .filter(col("sh").isNotNull)
    val qs = probes.select(col("doc_id").as("q_id"),
      dHashPixels(spark)(col("media"), col("width"), col("height"))
        .getField("sh").as("qsh"))
      .filter(col("qsh").isNotNull)
    val scored = corpus.crossJoin(broadcast(qs))
      .select(col("q_id"), col("doc_id"),
        (-bit_count(col("sh").bitwiseXOR(col("qsh")))).cast("double")
          .as("score"))
    graft.ops.GroupedTopK(spark, scored, "q_id", "score", "doc_id", k)
      .select(col("q_id").cast("long").as("q_id"), col("doc_id"),
        (-col("score")).cast("int").as("hamming"))
  }

  /** The four quarter-turn hashes of a probe image's decoded plane —
    * the SERVE-side orientation lever the store deliberately does not
    * carry (COVERAGE round-11 decision): the stored hash stays a pure
    * function of the delivered plane (a stripped-metadata copy keeps
    * matching its source), and a rotation-tolerant SEARCH instead
    * probes all four orientations of the PROBE — exact for
    * quarter-turn re-saves (the rotated probe plane IS the stored
    * copy's plane), 4 hashes at serve time, nothing at rest. None for
    * undecodable payloads — the payload regime has no geometry to
    * rotate, so callers fall back to the single payload hash.
    * Order: [as-is, 90° cw, 180°, 270° cw].
    */
  private[graft] def orientedHashes(b: Array[Byte]): Option[Array[Long]] =
    ContainerCodec.grayPlane(b).map { case (px, w, h) =>
      def rot90(p: Array[Byte], pw: Int, ph: Int): Array[Byte] = {
        // clockwise: source (x, y) lands at (ph - 1 - y, x) in ph×pw
        val out = new Array[Byte](p.length)
        var y = 0
        while (y < ph) {
          var x = 0
          while (x < pw) {
            out(x * ph + (ph - 1 - y)) = p(y * pw + x)
            x += 1
          }
          y += 1
        }
        out
      }
      val r90 = rot90(px, w, h)
      val r180 = rot90(r90, h, w)
      val r270 = rot90(r180, w, h)
      Array(
        graft.functions.DHashPixels.computeGrid(px, w, h),
        graft.functions.DHashPixels.computeGrid(r90, h, w),
        graft.functions.DHashPixels.computeGrid(r180, w, h),
        graft.functions.DHashPixels.computeGrid(r270, h, w))
    }

  /** Gray plane re-mapped to its UPRIGHT (display) form per the EXIF
    * orientation tag 1-8 — identity, horizontal/vertical mirror, 180°,
    * transpose, 90° cw, transverse, 270° cw. Returns (plane, w, h) of
    * the upright image. Unknown values read as 1 (identity) — the
    * spec's default.
    */
  private[graft] def uprightPlane(px: Array[Byte], w: Int, h: Int,
      orientation: Int): (Array[Byte], Int, Int) = {
    if (orientation <= 1 || orientation > 8) return (px, w, h)
    val swap = orientation >= 5 // 5-8 transpose the axes
    val (ow, oh) = if (swap) (h, w) else (w, h)
    val out = new Array[Byte](px.length)
    var y = 0
    while (y < oh) {
      var x = 0
      while (x < ow) {
        // source pixel whose DISPLAY position is (x, y)
        val (sx, sy) = orientation match {
          case 2 => (w - 1 - x, y)         // mirror horizontal
          case 3 => (w - 1 - x, h - 1 - y) // 180°
          case 4 => (x, h - 1 - y)         // mirror vertical
          case 5 => (y, x)                 // transpose
          case 6 => (y, h - 1 - x)         // 90° cw to display
          case 7 => (w - 1 - y, h - 1 - x) // transverse
          case _ => (w - 1 - y, x)         // 8: 270° cw to display
        }
        out(y * ow + x) = px(sy * w + sx)
        x += 1
      }
      y += 1
    }
    (out, ow, oh)
  }

  /** The EXIF-orientation-NORMALIZED perceptual hash: the decoded gray
    * plane is re-mapped to its upright form per the payload's own EXIF
    * orientation tag (JPEG APP1, PNG eXIf, WebP EXIF — see
    * [[ContainerCodec.exifOf]]) before the dHash grid, so a rotated
    * re-save that CARRIES its rotation in metadata hashes like its
    * upright source. Payloads with no EXIF (or orientation 1) hash
    * exactly like [[dHashPixels]]'s pixel regime; undecodable payloads
    * keep the payload-byte fallback. This is the opt-in BATCH-cadence
    * orientation lever (`IncrementalImageDedup.Params
    * .normalizeOrientation`) — the serve-side lever is
    * [[graft.ext.ImageIndex.topKOriented]], and the DEFAULT store
    * stays metadata-free by the COVERAGE round-11 argument (a
    * stripped-metadata copy must keep matching its source; the regime
    * marker keeps the two hash populations from silently mixing).
    */
  private[graft] def exifNormalizedSh(b: Array[Byte], w: Int,
      h: Int): Option[Long] =
    ContainerCodec.grayPlane(b) match {
      case Some((px, pw, ph)) =>
        val o = ContainerCodec.exifOf(b).flatMap(_._1).getOrElse(1)
        val (up, uw, uh) = uprightPlane(px, pw, ph, o)
        Some(graft.functions.DHashPixels.computeGrid(up, uw, uh))
      case None =>
        graft.functions.DHashPixels.computeExternal(b, w, h).map(_.sh)
    }

  /** Animated-GIF frame table: (doc_id, frames, duration_cs) — the
    * container-exact animation surface (structural frame count, summed
    * GCE delays in centiseconds) as a queryable frame. Non-GIF and
    * frameless payloads yield no rows. One partition-parallel map, no
    * shuffle.
    */
  def gifAnimTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        ContainerCodec.gifFrames(b, maxHashFrames = 0)
          .map(a => (id, a.frameCount, a.delayCs))
      })
      .toDF("doc_id", "frames", "duration_cs")
  }

  /** Cross-container animation table: (doc_id, container, frames,
    * duration_ms) over GIF, APNG, and animated WebP payloads — the
    * [[gifAnimTable]] surface widened to every animation container the
    * web ships, with durations in exact milliseconds (GIF cs × 10,
    * APNG num·1000/den, WebP ANMF ms — see [[AnimSurface]]). GIF rows
    * include single-frame files (its frame surface is total); PNG/WebP
    * rows exist only where the animation chunks (acTL/ANMF) do — a
    * static file has no animation surface to report. One
    * partition-parallel map, no shuffle.
    */
  def animTable(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        ContainerCodec.animFrames(b, maxHashFrames = 0)
          .map { case (c, a) => (id, c, a.frameCount, a.durationMs) }
      })
      .toDF("doc_id", "container", "frames", "duration_ms")
  }

  /** Duplicate ANIMATION pairs by shared frame hashes — the landmark
    * model ([[AudioFingerprint]]) applied to animation frames across
    * ALL THREE containers (GIF, APNG, animated WebP): each frame's
    * composited-canvas grid hash is one landmark, and two cuts pair
    * when they share at least `minSharedFrames` of them. This is what
    * the single first-frame key cannot do: a re-encode that DROPS or
    * prepends an intro frame still shares every remaining frame with
    * the original — and because all three containers hash the same
    * canvas model, the same animation pairs ACROSS containers (a GIF
    * sticker and its APNG/WebP re-encode) and across delta-vs-full
    * frame encodings (the compositing contract at
    * [[ContainerCodec.gifFrames]]). Same bucket-pair shape as every
    * exact-key dedup (groupBy hash, map-side combinable, `maxBucket`
    * hub cap — a constant-color frame shared by thousands of
    * animations identifies nothing). Returns (id_a, id_b, shared),
    * id_a < id_b.
    */
  def animDups(spark: SparkSession, media: DataFrame,
      minSharedFrames: Int = 2, maxBucket: Int = 2000,
      maxHashFrames: Int = 64): DataFrame =
    LandmarkStore.sharedCounts(
        animLandmarks(spark, media, maxHashFrames), maxBucket)
      .filter(col("shared") >= minSharedFrames)

  /** The distributed animation-landmark operator: media rows (doc_id,
    * media) in, (doc_id, fp) landmark rows out — one partition-parallel
    * scan, no shuffle, each fp a composited-canvas frame hash
    * ([[ContainerCodec.animFrames]], per-document distinct).
    * Non-animation payloads yield no rows. Feeds both the one-shot
    * [[animDups]] and the durable [[AnimDedup]] store through the
    * shared [[LandmarkStore]] machinery.
    */
  private[ext] def animLandmarks(spark: SparkSession, media: DataFrame,
      maxHashFrames: Int = 64): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) =>
        ContainerCodec.animFrames(b, maxHashFrames)
          .toSeq.flatMap(_._2.frameHashes.distinct.map(fh => (id, fh)))
      })
      .toDF("doc_id", "fp")
  }

  /** Duplicate-VIDEO pairs by the remux-robust payload fingerprint
    * ([[ContainerCodec.videoPayloadFp]] — MP4/MOV via the atom walk,
    * WebM/MKV via the EBML walk): two videos pair iff their coded
    * sample bytes are identical, regardless of how the container
    * around them was rewritten — moov relocated (faststart), metadata
    * tags edited, free/Void padding, atom/element order shuffled,
    * clusters re-chunked, blocks re-laced, and even a re-wrap ACROSS
    * the two container families. The dup class this catches is the
    * container re-wrap, the video analog of a losslessly re-encoded
    * PNG; transcoded copies (different coded bytes for the same frames)
    * remain behind the documented codec boundary. One scan to
    * fingerprint, then the same bucket-pair shape as every exact-dedup
    * in the family (groupBy fingerprint — a 64-bit key, map-side
    * combinable; `maxBucket` caps pathological buckets).
    * Returns (id_a, id_b), id_a < id_b.
    */
  def videoRemuxDups(media: DataFrame, maxBucket: Int = 2000): DataFrame = {
    val fpUdf = udf((b: Array[Byte]) => ContainerCodec.videoPayloadFp(b))
    media.select(col("doc_id"), fpUdf(col("media")).as("fp"))
      .filter(col("fp").isNotNull)
      .groupBy("fp")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(Dedup.pairExpansion(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
  }
}
