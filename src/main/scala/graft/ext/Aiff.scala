package graft.ext

/** AIFF/AIFC and AU (Sun/NeXT) audio containers, implemented from the
  * public format descriptions (Apple "Audio Interchange File Format
  * 1.3" / AIFF-C draft; the AU header layout documented in Sun's
  * audio file format man pages). Both are pure container math over
  * PCM/companded samples — no codec tables, so the decode surface is
  * wild-file correct by construction, the same claim class as WAV:
  *
  *  - AIFF/'NONE': big-endian signed PCM 8/16/24/32 (AIFF 8-bit is
  *    SIGNED, unlike WAV's unsigned 8-bit)
  *  - 'sowt': the little-endian 16-bit AIFC variant Macs wrote
  *  - 'ulaw'/'alaw' (+ upper-case forms): G.711 companded, through
  *    the same expanders the WAV path uses
  *  - 'fl32'/'FL32': IEEE float32 big-endian
  *  - sample rate: the 80-bit IEEE 754 extended-precision field,
  *    parsed exactly (sign/15-bit exponent/64-bit mantissa)
  *  - AU encodings 1 (mu-law), 2-5 (signed PCM 8/16/24/32 BE),
  *    6/7 (float32/64 BE), 27 (A-law); annotation padding honored
  *    via dataOffset; unknown dataSize (0xffffffff) reads to EOF
  *
  * Anything else (AIFC 'ima4' etc.) keeps container-regime geometry —
  * the census-visible boundary, not a silent wrong decode.
  */
object Aiff {

  private def u16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def isAiff(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 && tag(b, 0) == "FORM" &&
      (tag(b, 8) == "AIFF" || tag(b, 8) == "AIFC")

  /** The 80-bit extended-precision sample rate, exactly. */
  private[ext] def extended80(b: Array[Byte], o: Int): Double = {
    val se = u16(b, o)
    val exp = se & 0x7fff
    var mant = 0L
    var i = 0
    while (i < 8) { mant = (mant << 8) | (b(o + 2 + i) & 0xffL); i += 1 }
    if (exp == 0 && mant == 0L) return 0.0
    val v = // mantissa has the integer bit explicit (bit 63)
      java.lang.Math.scalb(
        (mant >>> 11).toDouble, // keep 53 significant bits for the double
        exp - 16383 - 52)
    if ((se & 0x8000) != 0) -v else v
  }

  /** Encoder-side inverse, exact for integer sample rates. */
  private[ext] def packExtended80(rate: Long): Array[Byte] = {
    require(rate > 0, s"packExtended80: $rate")
    var m = rate
    var shifts = 0
    while ((m & 0x8000000000000000L) == 0L) { m <<= 1; shifts += 1 }
    val exp = 16383 + 63 - shifts
    val out = new Array[Byte](10)
    out(0) = ((exp >> 8) & 0x7f).toByte
    out(1) = (exp & 0xff).toByte
    var i = 0
    while (i < 8) { out(2 + i) = ((m >>> (56 - 8 * i)) & 0xff).toByte; i += 1 }
    out
  }

  /** Geometry without sample decode: (channels, sampleRate,
    * numSampleFrames, compressionType) — 'NONE' for plain AIFF.
    */
  def info(b: Array[Byte]): Option[(Int, Double, Long, String)] = try {
    if (!isAiff(b)) return None
    val aifc = tag(b, 8) == "AIFC"
    var off = 12
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val sz = u32(b, off + 4)
      val po = off + 8
      if (id == "COMM" && sz >= 18 && po + 18 <= b.length) {
        val channels = u16(b, po)
        val frames = u32(b, po + 2)
        val rate = extended80(b, po + 8)
        val compr =
          if (aifc && sz >= 22 && po + 22 <= b.length) tag(b, po + 18)
          else "NONE"
        if (channels < 1 || rate <= 0) return None
        return Some((channels, rate, frames, compr))
      }
      off = po + sz.toInt + (sz.toInt & 1) // chunks pad to even
      if (sz > b.length) return None
    }
    None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Decode to a mono mix — the [[Mp3.decode]] contract. None outside
    * the PCM/G.711/float surface (census keeps the geometry).
    */
  def decode(b: Array[Byte]): Option[(Array[Double], Int)] = try {
    val (channels, rate, frames, compr) = info(b) match {
      case Some(v) => v
      case None    => return None
    }
    // locate SSND
    var off = 12
    var dataOff = -1
    var dataLen = 0
    var sampleSize = 0
    while (off + 8 <= b.length) {
      val id = tag(b, off)
      val sz = u32(b, off + 4)
      val po = off + 8
      if (id == "COMM" && po + 18 <= b.length) sampleSize = u16(b, po + 6)
      if (id == "SSND" && sz >= 8 && po + 8 <= b.length) {
        val pad = u32(b, po) // offset into the sound data
        dataOff = po + 8 + pad.toInt
        dataLen = math.min(sz - 8 - pad, (b.length - dataOff).toLong).toInt
      }
      off = po + sz.toInt + (sz.toInt & 1)
      if (sz > b.length) return None
    }
    if (dataOff < 0 || dataLen <= 0 || channels < 1) return None
    val littleEndian = compr == "sowt"
    val companded = compr == "ulaw" || compr == "ULAW" ||
      compr == "alaw" || compr == "ALAW"
    val float32 = compr == "fl32" || compr == "FL32"
    if (compr != "NONE" && !littleEndian && !companded && !float32)
      return None // ima4 and friends: the census container boundary
    val bps =
      if (companded) 1
      else if (float32) 4
      else if (littleEndian) 2
      else sampleSize match {
        case 8 => 1; case 16 => 2; case 24 => 3; case 32 => 4
        case _ => return None
      }
    val total = math.min(frames, dataLen.toLong / (channels * bps)).toInt
    if (total <= 0) return None
    val out = new Array[Double](total)
    var i = 0
    while (i < total) {
      var acc = 0.0
      var ch = 0
      while (ch < channels) {
        val o = dataOff + (i * channels + ch) * bps
        acc +=
          (if (companded) {
            val v = b(o) & 0xff
            (if (compr.equalsIgnoreCase("ulaw")) AudioDsp.mulawExpand(v)
             else AudioDsp.alawExpand(v)) / 32768.0
          } else if (float32) {
            java.lang.Float.intBitsToFloat(u32(b, o).toInt).toDouble
          } else if (littleEndian) {
            ((b(o) & 0xff) | (b(o + 1) << 8)).toShort / 32768.0
          } else bps match {
            case 1 => b(o) / 128.0 // AIFF 8-bit is signed
            case 2 => ((b(o) << 8) | (b(o + 1) & 0xff)).toShort / 32768.0
            case 3 =>
              (((b(o) << 16) | ((b(o + 1) & 0xff) << 8) |
                (b(o + 2) & 0xff)) << 8 >> 8) / 8388608.0
            case _ => u32(b, o).toInt / 2147483648.0
          })
        ch += 1
      }
      out(i) = acc / channels
      i += 1
    }
    Some((out, math.round(rate).toInt))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic AIFF/AIFC synthesizer (interleaved samples in
    * [-1,1]) — the [[AudioDsp.pcmWav]] analog.
    */
  def encode(samples: Array[Double], sampleRate: Int, bits: Int = 16,
      channels: Int = 1, compression: String = "NONE"): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0,
      s"aiff: channels $channels")
    val aifc = compression != "NONE"
    val littleEndian = compression == "sowt"
    val companded = compression.equalsIgnoreCase("ulaw") ||
      compression.equalsIgnoreCase("alaw")
    val float32 = compression.equalsIgnoreCase("fl32")
    val bps =
      if (companded) 1
      else if (float32) 4
      else if (littleEndian) 2
      else { require(Seq(8, 16, 24, 32).contains(bits), s"bits $bits"); bits / 8 }
    val effBits =
      if (companded) 8 else if (float32) 32
      else if (littleEndian) 16 else bits
    val frames = samples.length / channels
    val dataLen = samples.length * bps
    val commLen = if (aifc) 18 + 4 + 2 else 18 // + 4cc + empty pstring
    val out = java.nio.ByteBuffer
      .allocate(12 + 8 + commLen + (commLen & 1) + 8 + 8 + dataLen +
        (dataLen & 1))
    out.put("FORM".getBytes("US-ASCII"))
      .putInt(4 + 8 + commLen + (commLen & 1) + 8 + 8 + dataLen +
        (dataLen & 1))
      .put((if (aifc) "AIFC" else "AIFF").getBytes("US-ASCII"))
      .put("COMM".getBytes("US-ASCII")).putInt(commLen)
      .putShort(channels.toShort)
      .putInt(frames)
      .putShort(effBits.toShort)
      .put(packExtended80(sampleRate.toLong))
    if (aifc) {
      out.put(compression.getBytes("US-ASCII"))
      out.put(0.toByte).put(0.toByte) // empty pstring + its pad
    }
    if ((commLen & 1) == 1) out.put(0.toByte)
    out.put("SSND".getBytes("US-ASCII")).putInt(8 + dataLen)
      .putInt(0).putInt(0) // offset, blockSize
    samples.foreach { s =>
      val v = math.max(-1.0, math.min(1.0, s))
      if (companded) {
        val q = math.round(v * 32767).toInt
        out.put((if (compression.equalsIgnoreCase("ulaw"))
          AudioDsp.mulawCompress(q) else AudioDsp.alawCompress(q)).toByte)
      } else if (float32) {
        out.putInt(java.lang.Float.floatToIntBits(v.toFloat))
      } else if (littleEndian) {
        val q = math.round(v * 32767).toInt
        out.put((q & 0xff).toByte).put(((q >> 8) & 0xff).toByte)
      } else bps match {
        case 1 => out.put(math.round(v * 127).toByte)
        case 2 => out.putShort(math.round(v * 32767).toShort)
        case 3 =>
          val q = math.round(v * 8388607).toInt
          out.put(((q >> 16) & 0xff).toByte).put(((q >> 8) & 0xff).toByte)
            .put((q & 0xff).toByte)
        case _ => out.putInt(math.round(v * 2147483647.0).toInt)
      }
    }
    if ((dataLen & 1) == 1) out.put(0.toByte)
    out.array()
  }
}

/** AU (Sun/NeXT ".snd"): the simplest real audio container — a 24+
  * byte big-endian header, optional annotation (dataOffset skips it),
  * then samples.
  */
object Au {

  private def u32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

  def isAu(b: Array[Byte]): Boolean =
    b != null && b.length >= 24 && b(0) == '.' && b(1) == 's' &&
      b(2) == 'n' && b(3) == 'd'

  /** (channels, sampleRate, encoding, dataOffset, dataLen). */
  def info(b: Array[Byte]): Option[(Int, Int, Int, Int, Int)] = try {
    if (!isAu(b)) return None
    val dataOff = u32(b, 4).toInt
    val declared = u32(b, 8)
    val encoding = u32(b, 12).toInt
    val rate = u32(b, 16).toInt
    val channels = u32(b, 20).toInt
    if (dataOff < 24 || dataOff > b.length || rate <= 0 ||
      channels < 1 || channels > 64) return None
    val avail = b.length - dataOff
    val len = // 0xffffffff = unknown: read to EOF
      if (declared == 0xffffffffL) avail
      else math.min(declared, avail.toLong).toInt
    Some((channels, rate, encoding, dataOff, len))
  } catch { case scala.util.control.NonFatal(_) => None }

  def decode(b: Array[Byte]): Option[(Array[Double], Int)] = try {
    val (channels, rate, encoding, dataOff, dataLen) = info(b) match {
      case Some(v) => v
      case None    => return None
    }
    val bps = encoding match {
      case 1 | 2 | 27 => 1
      case 3          => 2
      case 4          => 3
      case 5 | 6      => 4
      case 7          => 8
      case _          => return None
    }
    val total = dataLen / (channels * bps)
    if (total <= 0) return None
    val out = new Array[Double](total)
    var i = 0
    while (i < total) {
      var acc = 0.0
      var ch = 0
      while (ch < channels) {
        val o = dataOff + (i * channels + ch) * bps
        acc += (encoding match {
          case 1  => AudioDsp.mulawExpand(b(o) & 0xff) / 32768.0
          case 27 => AudioDsp.alawExpand(b(o) & 0xff) / 32768.0
          case 2  => b(o) / 128.0
          case 3  => ((b(o) << 8) | (b(o + 1) & 0xff)).toShort / 32768.0
          case 4 =>
            (((b(o) << 16) | ((b(o + 1) & 0xff) << 8) |
              (b(o + 2) & 0xff)) << 8 >> 8) / 8388608.0
          case 5 => u32(b, o).toInt / 2147483648.0
          case 6 => java.lang.Float.intBitsToFloat(u32(b, o).toInt).toDouble
          case _ =>
            java.lang.Double.longBitsToDouble(
              (u32(b, o) << 32) | u32(b, o + 4))
        })
        ch += 1
      }
      out(i) = acc / channels
      i += 1
    }
    Some((out, rate))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic AU synthesizer (interleaved samples in [-1,1]);
    * `annotation` exercises the dataOffset path, `unknownSize` the
    * 0xffffffff read-to-EOF form.
    */
  def encode(samples: Array[Double], sampleRate: Int, encoding: Int = 3,
      channels: Int = 1, annotation: String = "",
      unknownSize: Boolean = false): Array[Byte] = {
    require(channels >= 1 && samples.length % channels == 0, "au args")
    val bps = encoding match {
      case 1 | 2 | 27 => 1
      case 3          => 2
      case 4          => 3
      case 5 | 6      => 4
      case 7          => 8
      case _ => throw new IllegalArgumentException(s"au encoding $encoding")
    }
    val ann = annotation.getBytes("US-ASCII")
    val dataOff = 24 + ann.length
    val dataLen = samples.length * bps
    val out = java.nio.ByteBuffer.allocate(dataOff + dataLen)
    out.put(".snd".getBytes("US-ASCII")).putInt(dataOff)
      .putInt(if (unknownSize) 0xffffffff else dataLen)
      .putInt(encoding).putInt(sampleRate).putInt(channels)
      .put(ann)
    samples.foreach { s =>
      val v = math.max(-1.0, math.min(1.0, s))
      encoding match {
        case 1 =>
          out.put(AudioDsp.mulawCompress(math.round(v * 32767).toInt).toByte)
        case 27 =>
          out.put(AudioDsp.alawCompress(math.round(v * 32767).toInt).toByte)
        case 2 => out.put(math.round(v * 127).toByte)
        case 3 => out.putShort(math.round(v * 32767).toShort)
        case 4 =>
          val q = math.round(v * 8388607).toInt
          out.put(((q >> 16) & 0xff).toByte).put(((q >> 8) & 0xff).toByte)
            .put((q & 0xff).toByte)
        case 5 => out.putInt(math.round(v * 2147483647.0).toInt)
        case 6 => out.putInt(java.lang.Float.floatToIntBits(v.toFloat))
        case _ => out.putLong(java.lang.Double.doubleToLongBits(v))
      }
    }
    out.array()
  }
}
