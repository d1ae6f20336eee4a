package graft.ext

/** FLAC codec — decoder for the audio regime plus a real fixture
  * encoder, implemented from the public FLAC format specification
  * (RFC 9639) with zero codec dependency (the JDK ships no FLAC
  * reader). Reference behavior: finance_pipeline treats media as
  * opaque blobs; this is beyond-parity multimodal surface — a FLAC
  * master and its WAV rip decode to the SAME samples, so the landmark
  * fingerprints treat them as one recording.
  *
  * Decoder surface: STREAMINFO + metadata skip, fixed/variable
  * blocking, all four subframe types (CONSTANT, VERBATIM, FIXED orders
  * 0-4, LPC orders 1-32), partitioned Rice residuals with the escape
  * code, wasted-bits shifts, and all three stereo decorrelations
  * (left/side, right/side, mid/side). Frame CRCs are skipped, not
  * verified (a corrupt frame fails structurally long before the CRC
  * would fire); every read is bounds-checked and any violation
  * degrades to None — conservative and total like every decode path
  * here. Bits are read MSB-first (the FLAC convention, opposite of
  * VP8L's LSB-first).
  */
private[graft] object Flac {

  def isFlac(b: Array[Byte]): Boolean =
    b.length >= 42 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' &&
      b(3) == 'C'

  // ---------------------------------------------------------------
  // MSB-first bit reader
  // ---------------------------------------------------------------
  private final class Reader(b: Array[Byte], var pos: Int, end: Int) {
    private var bit = 0
    def bytePos: Int = pos
    def aligned: Boolean = bit == 0
    def alignToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }
    def readBit(): Int = {
      if (pos >= end) throw new IllegalStateException("flac: past end")
      val v = (b(pos) >> (7 - bit)) & 1
      bit += 1
      if (bit == 8) { bit = 0; pos += 1 }
      v
    }
    def readBits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    def readSigned(n: Int): Long = {
      val v = readBits(n)
      if (n > 0 && (v & (1L << (n - 1))) != 0) v - (1L << n) else v
    }
    def readUnary(): Int = {
      var q = 0
      while (readBit() == 0) {
        q += 1
        require(q < (1 << 24), "flac: runaway unary")
      }
      q
    }
  }

  /** (sampleRate, channels, bitsPerSample, totalSamples, framesOffset)
    * from the metadata walk, validated; None for anything malformed.
    */
  private def streamInfo(
      b: Array[Byte]): Option[(Int, Int, Int, Long, Int)] = try {
    if (!isFlac(b)) return None
    var off = 4
    var sampleRate = 0
    var channels = 0
    var bits = 0
    var totalSamples = 0L
    var last = false
    var sawStreamInfo = false
    while (!last) {
      if (off + 4 > b.length) return None
      last = ((b(off) >> 7) & 1) == 1
      val btype = b(off) & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      off += 4
      if (off + len > b.length) return None
      if (btype == 0) { // STREAMINFO
        if (len < 34) return None
        val r = new Reader(b, off, off + len)
        r.readBits(16); r.readBits(16) // min/max block size
        r.readBits(24); r.readBits(24) // min/max frame size
        sampleRate = r.readBits(20).toInt
        channels = r.readBits(3).toInt + 1
        bits = r.readBits(5).toInt + 1
        totalSamples = r.readBits(36)
        sawStreamInfo = true
      }
      off += len
    }
    if (!sawStreamInfo || sampleRate <= 0 || channels < 1 ||
      channels > 8 || bits < 4 || bits > 32 || totalSamples <= 0) None
    else Some((sampleRate, channels, bits, totalSamples, off))
  } catch { case scala.util.control.NonFatal(_) => None }

  /** (sampleRate, channels, bitsPerSample, totalSamples) — the
    * metadata-only view for feature extraction.
    */
  def info(b: Array[Byte]): Option[(Int, Int, Int, Long)] =
    streamInfo(b).map(t => (t._1, t._2, t._3, t._4))

  /** Decode to (normalized mono mix, sampleRate). `maxSamples` bounds
    * allocation up front (the MaxHashPixels discipline).
    */
  def decode(b: Array[Byte],
      maxSamples: Long = 1L << 26): Option[(Array[Double], Int)] = try {
    val (sampleRate, channels, bits, totalSamples, framesOff) =
      streamInfo(b) match {
        case Some(t) => t
        case None    => return None
      }
    var off = framesOff
    if (totalSamples > maxSamples) return None
    val n = totalSamples.toInt
    val out = new Array[Double](n)
    val denom = (1L << (bits - 1)).toDouble
    var written = 0
    val chBuf = Array.ofDim[Long](channels, 65536)
    while (written < n) {
      if (off + 5 > b.length) return None
      val r = new Reader(b, off, b.length)
      // frame header
      if (r.readBits(14) != 0x3ffe) return None // sync
      r.readBit() // reserved
      r.readBit() // blocking strategy
      val bsCode = r.readBits(4).toInt
      val srCode = r.readBits(4).toInt
      val chAsgn = r.readBits(4).toInt
      val ssCode = r.readBits(3).toInt
      r.readBit() // reserved
      // UTF-8-style coded frame/sample number: lead byte tells length
      val lead = r.readBits(8).toInt
      var follow =
        if (lead < 0x80) 0
        else if ((lead & 0xe0) == 0xc0) 1
        else if ((lead & 0xf0) == 0xe0) 2
        else if ((lead & 0xf8) == 0xf0) 3
        else if ((lead & 0xfc) == 0xf8) 4
        else if ((lead & 0xfe) == 0xfc) 5
        else if (lead == 0xfe) 6
        else return None
      while (follow > 0) { r.readBits(8); follow -= 1 }
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case 6 => r.readBits(8).toInt + 1
        case 7 => r.readBits(16).toInt + 1
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case c => 256 << (c - 8)
      }
      srCode match { // per-frame sample-rate overrides: skip the bits
        case 12 => r.readBits(8)
        case 13 | 14 => r.readBits(16)
        case 15 => return None
        case _ => ()
      }
      val frameBits = ssCode match {
        case 0 => bits // from STREAMINFO
        case 1 => 8
        case 2 => 12
        case 4 => 16
        case 5 => 20
        case 6 => 24
        case 7 => 32
        case _ => return None
      }
      r.readBits(8) // header CRC-8 (not verified — see scaladoc)
      if (blockSize <= 0 || blockSize > 65536 ||
        written + blockSize > n) return None
      if (chAsgn > 10) return None // 11-15 reserved
      val nCh = if (chAsgn <= 7) chAsgn + 1 else 2
      if (nCh != channels) return None
      var ch = 0
      while (ch < nCh) {
        // side channels carry one extra bit
        val extra = chAsgn match {
          case 8 => if (ch == 1) 1 else 0  // left/side
          case 9 => if (ch == 0) 1 else 0  // side/right
          case 10 => if (ch == 1) 1 else 0 // mid/side
          case _ => 0
        }
        decodeSubframe(r, chBuf(ch), blockSize, frameBits + extra)
        ch += 1
      }
      r.alignToByte()
      r.readBits(16) // frame CRC-16 (not verified)
      off = r.bytePos
      // stereo decorrelation
      chAsgn match {
        case 8 => // left/side: right = left - side
          var i = 0
          while (i < blockSize) {
            chBuf(1)(i) = chBuf(0)(i) - chBuf(1)(i); i += 1
          }
        case 9 => // side/right: left = right + side
          var i = 0
          while (i < blockSize) {
            chBuf(0)(i) = chBuf(1)(i) + chBuf(0)(i); i += 1
          }
        case 10 => // mid/side
          var i = 0
          while (i < blockSize) {
            val side = chBuf(1)(i)
            val mid2 = (chBuf(0)(i) << 1) | (side & 1)
            chBuf(0)(i) = (mid2 + side) >> 1
            chBuf(1)(i) = (mid2 - side) >> 1
            i += 1
          }
        case _ => ()
      }
      var i = 0
      while (i < blockSize) {
        var acc = 0.0
        var c = 0
        while (c < channels) { acc += chBuf(c)(i); c += 1 }
        out(written + i) = acc / channels / denom
        i += 1
      }
      written += blockSize
    }
    Some((out, sampleRate))
  } catch { case scala.util.control.NonFatal(_) => None }

  private def decodeSubframe(r: Reader, buf: Array[Long], blockSize: Int,
      bps: Int): Unit = {
    require(r.readBit() == 0, "flac: subframe padding bit")
    val typ = r.readBits(6).toInt
    var wasted = 0
    if (r.readBit() == 1) wasted = r.readUnary() + 1
    val eff = bps - wasted
    require(eff >= 1 && eff <= 33, s"flac: effective bps $eff")
    if (typ == 0) { // CONSTANT
      val v = r.readSigned(eff)
      java.util.Arrays.fill(buf, 0, blockSize, v)
    } else if (typ == 1) { // VERBATIM
      var i = 0
      while (i < blockSize) { buf(i) = r.readSigned(eff); i += 1 }
    } else if (typ >= 8 && typ <= 12) { // FIXED, order 0..4
      val order = typ - 8
      require(order <= blockSize, "flac: fixed order > block")
      var i = 0
      while (i < order) { buf(i) = r.readSigned(eff); i += 1 }
      readResidual(r, buf, blockSize, order)
      i = order
      while (i < blockSize) {
        buf(i) = order match {
          case 0 => buf(i)
          case 1 => buf(i) + buf(i - 1)
          case 2 => buf(i) + 2 * buf(i - 1) - buf(i - 2)
          case 3 => buf(i) + 3 * buf(i - 1) - 3 * buf(i - 2) + buf(i - 3)
          case _ => buf(i) + 4 * buf(i - 1) - 6 * buf(i - 2) +
            4 * buf(i - 3) - buf(i - 4)
        }
        i += 1
      }
    } else if (typ >= 32) { // LPC, order 1..32
      val order = typ - 31
      require(order <= blockSize, "flac: lpc order > block")
      var i = 0
      while (i < order) { buf(i) = r.readSigned(eff); i += 1 }
      val precision = r.readBits(4).toInt + 1
      require(precision <= 15, "flac: lpc precision")
      val shift = r.readSigned(5).toInt
      require(shift >= 0, "flac: negative lpc shift")
      val coefs = Array.fill(order)(r.readSigned(precision))
      readResidual(r, buf, blockSize, order)
      i = order
      while (i < blockSize) {
        var acc = 0L
        var j = 0
        while (j < order) { acc += coefs(j) * buf(i - 1 - j); j += 1 }
        buf(i) = buf(i) + (acc >> shift)
        i += 1
      }
    } else sys.error(s"flac: reserved subframe type $typ")
    if (wasted > 0) {
      var i = 0
      while (i < blockSize) { buf(i) = buf(i) << wasted; i += 1 }
    }
  }

  /** Partitioned Rice residual into buf(order until blockSize). */
  private def readResidual(r: Reader, buf: Array[Long], blockSize: Int,
      order: Int): Unit = {
    val method = r.readBits(2).toInt
    require(method <= 1, s"flac: residual method $method")
    val pBits = if (method == 0) 4 else 5
    val escape = if (method == 0) 15 else 31
    val partOrder = r.readBits(4).toInt
    val parts = 1 << partOrder
    // RFC 9639: block size / 2^po must divide evenly and exceed the
    // predictor order
    require(blockSize % parts == 0 && (blockSize >> partOrder) > order,
      "flac: bad partition order")
    var idx = order
    var p = 0
    while (p < parts) {
      val count = (blockSize >> partOrder) - (if (p == 0) order else 0)
      val param = r.readBits(pBits).toInt
      if (param == escape) {
        val raw = r.readBits(5).toInt
        var i = 0
        while (i < count) { buf(idx) = r.readSigned(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.readUnary().toLong
          val rem = r.readBits(param)
          val u = (q << param) | rem
          buf(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
  }

  // ---------------------------------------------------------------
  // fixture encoder
  // ---------------------------------------------------------------
  private final class Writer {
    val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    def bit(v: Int): Unit = {
      cur = (cur << 1) | (v & 1)
      nbits += 1
      if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
    }
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit(((v >> i) & 1).toInt); i -= 1 }
    }
    def unary(q: Int): Unit = {
      var i = 0
      while (i < q) { bit(0); i += 1 }
      bit(1)
    }
    def align(): Unit = while (nbits != 0) bit(0)
    def toBytes: Array[Byte] = { align(); buf.toByteArray }
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
        else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private def crc16(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (b(i) & 0xff) << 8
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
        else (crc << 1) & 0xffff
        k += 1
      }
      i += 1
    }
    crc
  }

  /** Rice parameter that keeps total coded size sane for `vals`. */
  private def riceParam(vals: Seq[Long]): Int = {
    val mean = if (vals.isEmpty) 0.0
      else vals.map(v => math.abs(v).toDouble).sum / vals.length
    var p = 0
    while ((1L << p) < mean + 1 && p < 14) p += 1
    p
  }

  /** Encode PCM samples as a real FLAC stream at any of the standard
    * widths the frame header can state directly (8/12/16/20/24 bits —
    * `samples` carry signed values in the chosen width's range). `mode`
    * selects the subframe/stereo machinery exercised: "verbatim" (no
    * prediction), "fixed0" (Rice over raw samples), "fixed2"
    * (second-order fixed prediction + Rice; constant subframes where a
    * block is flat), and "midside" (fixed2 with mid/side stereo
    * decorrelation). Stereo input is interleaved (left, right) pairs
    * when `channels == 2`. The decoder is width-general already; this
    * end widened so the FLAC≡WAV identity gates can run on a
    * studio-width master end-to-end.
    */
  def encode(samples: Array[Int], sampleRate: Int, channels: Int = 1,
      mode: String = "fixed2", blockSize: Int = 4096,
      bits: Int = 16): Array[Byte] = {
    val (header, frames) =
      encodeParts(samples, sampleRate, channels, mode, blockSize, bits)
    val out = new java.io.ByteArrayOutputStream()
    out.write(header)
    frames.foreach { case (f, _) => out.write(f) }
    out.toByteArray
  }

  /** [[encode]] split at FRAME boundaries: (fLaC+STREAMINFO header,
    * per-frame (coded bytes, end-sample position)) — the granularity
    * the Ogg mapping needs (each Ogg audio packet must be exactly ONE
    * native frame, with the frame's last-sample granule). encode() is
    * the concatenation.
    */
  private[ext] def encodeParts(samples: Array[Int], sampleRate: Int,
      channels: Int = 1, mode: String = "fixed2", blockSize: Int = 4096,
      bits: Int = 16): (Array[Byte], Seq[(Array[Byte], Long)]) = {
    require(channels == 1 || channels == 2, s"flac encode: $channels ch")
    val bitsCode = Map(8 -> 1, 12 -> 2, 16 -> 4, 20 -> 5, 24 -> 6)
      .getOrElse(bits, sys.error(s"flac encode: unsupported width $bits"))
    val lim = 1 << (bits - 1)
    require(samples.forall(v => v >= -lim && v < lim),
      s"flac encode: samples out of $bits-bit range")
    require(samples.length % channels == 0, "flac encode: ragged channels")
    val nSamples = samples.length / channels
    require(nSamples > 0 && blockSize >= 16, "flac encode: empty/tiny")
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    // STREAMINFO, last-metadata-block flag set
    val si = new Writer
    si.bits(blockSize.toLong, 16); si.bits(blockSize.toLong, 16)
    si.bits(0, 24); si.bits(0, 24)
    si.bits(sampleRate.toLong, 20)
    si.bits((channels - 1).toLong, 3)
    si.bits((bits - 1).toLong, 5)
    si.bits(nSamples.toLong, 36)
    (0 until 16).foreach(_ => si.bits(0, 8)) // md5 unset
    val siBytes = si.toBytes
    out.write(0x80) // last + type 0
    out.write(0); out.write(0); out.write(siBytes.length)
    out.write(siBytes)
    val header = out.toByteArray

    val frames = Seq.newBuilder[(Array[Byte], Long)]
    var frameIdx = 0
    var pos = 0
    while (pos < nSamples) {
      val bs = math.min(blockSize, nSamples - pos)
      val w = new Writer
      w.bits(0x3ffe, 14)
      w.bit(0) // reserved
      w.bit(0) // fixed blocking
      w.bits(7, 4)  // block size: explicit 16-bit
      w.bits(0, 4)  // sample rate: from STREAMINFO
      val midside = mode == "midside" && channels == 2
      w.bits(if (channels == 1) 0 else if (midside) 10 else 1, 4)
      w.bits(bitsCode.toLong, 3)
      w.bit(0)
      require(frameIdx < 128, "flac encode: too many frames for 1-byte id")
      w.bits(frameIdx.toLong, 8)
      w.bits((bs - 1).toLong, 16)
      // CRC-8 over the header bytes so far
      w.align()
      val headBytes = w.buf.toByteArray
      w.bits(crc8(headBytes, 0, headBytes.length).toLong, 8)
      // channels
      val chans: Seq[(Array[Long], Int)] =
        if (channels == 1)
          Seq((Array.tabulate(bs)(i => samples(pos + i).toLong), bits))
        else {
          val l = Array.tabulate(bs)(i => samples((pos + i) * 2).toLong)
          val rr = Array.tabulate(bs)(i => samples((pos + i) * 2 + 1).toLong)
          if (midside) {
            val mid = Array.tabulate(bs)(i => (l(i) + rr(i)) >> 1)
            val side = Array.tabulate(bs)(i => l(i) - rr(i))
            Seq((mid, bits), (side, bits + 1))
          } else Seq((l, bits), (rr, bits))
        }
      for ((data, bps) <- chans) writeSubframe(w, data, bps, mode)
      w.align()
      val frameNoCrc = w.buf.toByteArray
      w.bits(crc16(frameNoCrc, 0, frameNoCrc.length).toLong, 16)
      pos += bs
      frames += ((w.toBytes, pos.toLong))
      frameIdx += 1
    }
    (header, frames.result())
  }

  private def writeSubframe(w: Writer, data: Array[Long], bps: Int,
      mode: String): Unit = {
    val bs = data.length
    w.bit(0) // padding
    if (mode == "verbatim") {
      w.bits(1, 6); w.bit(0) // type, no wasted bits
      data.foreach(v => w.bits(v & ((1L << bps) - 1), bps))
      return
    }
    if (data.forall(_ == data(0))) { // CONSTANT
      w.bits(0, 6); w.bit(0)
      w.bits(data(0) & ((1L << bps) - 1), bps)
      return
    }
    val order = if (mode == "fixed0") 0 else 2
    if (bs <= order + 1) { // too small for prediction: verbatim
      w.bits(1, 6); w.bit(0)
      data.foreach(v => w.bits(v & ((1L << bps) - 1), bps))
      return
    }
    w.bits(8L + order, 6) // FIXED
    w.bit(0)              // no wasted bits
    var i = 0
    while (i < order) { w.bits(data(i) & ((1L << bps) - 1), bps); i += 1 }
    val resid = Array.tabulate(bs - order) { k =>
      val j = k + order
      if (order == 0) data(j)
      else data(j) - 2 * data(j - 1) + data(j - 2)
    }
    // one partition, 4-bit rice
    w.bits(0, 2)
    w.bits(0, 4)
    val param = riceParam(resid.toSeq)
    w.bits(param.toLong, 4)
    resid.foreach { v =>
      val u = (v << 1) ^ (v >> 63) // zigzag
      w.unary((u >>> param).toInt)
      w.bits(u & ((1L << param) - 1), param)
    }
  }
}

/** FLAC-in-Ogg (the Xiph "FLAC-to-Ogg mapping", version 1.0): the
  * BOS packet is 0x7F "FLAC" major minor headerPackets(u16be)
  * followed by a complete native "fLaC" + STREAMINFO; later header
  * packets carry further metadata blocks, and every audio packet is
  * one native FLAC frame. Decode REBUILDS the native stream — the
  * 42-byte fLaC+STREAMINFO torso with its last-metadata-block flag
  * forced, then the frame packets verbatim — and hands it to the one
  * shared [[Flac.decode]], so the Ogg envelope adds no second codec
  * path to trust.
  */
object OggFlac {

  def isOggFlac(b: Array[Byte]): Boolean =
    b != null && b.length >= 47 && b(0) == 'O' && b(1) == 'g' &&
      b(2) == 'g' && b(3) == 'S' && {
        val nSegs = b(26) & 0xff
        val po = 27 + nSegs
        po + 5 <= b.length && (b(po) & 0xff) == 0x7f && b(po + 1) == 'F' &&
          b(po + 2) == 'L' && b(po + 3) == 'A' && b(po + 4) == 'C'
      }

  /** STREAMINFO through the BOS torso: (sampleRate, channels, bits,
    * totalSamples) — [[Flac.info]]'s contract.
    */
  def info(b: Array[Byte]): Option[(Int, Int, Int, Long)] = try {
    if (!isOggFlac(b)) return None
    val nSegs = b(26) & 0xff
    val po = 27 + nSegs + 9 // past the 0x7F FLAC ver nHeaders prologue
    if (po + 42 > b.length) return None
    val torso = java.util.Arrays.copyOfRange(b, po, po + 42)
    torso(4) = (torso(4) | 0x80).toByte
    Flac.info(torso)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Mono mix — the [[Flac.decode]] contract via the rebuilt stream. */
  def decode(b: Array[Byte]): Option[(Array[Double], Int)] = try {
    if (!isOggFlac(b)) return None
    val (packets, _) = Vorbis.oggPackets(b, (p, o, n) =>
      n >= 5 && (p(o) & 0xff) == 0x7f && p(o + 1) == 'F' &&
        p(o + 2) == 'L' && p(o + 3) == 'A' && p(o + 4) == 'C') match {
      case Some(v) => v
      case None    => return None
    }
    if (packets.isEmpty) return None
    val bos = packets.head
    // 0x7F FLAC major minor nHeaders(2) | fLaC | block header(4) + 34
    if (bos.length < 9 + 4 + 4 + 34 || bos(9) != 'f' || bos(10) != 'L' ||
      bos(11) != 'a' || bos(12) != 'C') return None
    val nHeaders = ((bos(7) & 0xff) << 8) | (bos(8) & 0xff)
    val native = new java.io.ByteArrayOutputStream()
    native.write(bos, 9, bos.length - 9)
    // force the STREAMINFO header's last-metadata-block flag so the
    // skipped header packets (comments etc.) are not expected
    val out = native.toByteArray
    out(4) = (out(4) | 0x80).toByte
    native.reset()
    native.write(out)
    // skip nHeaders metadata packets, then frames verbatim; when the
    // muxer declared 0 ("unknown count"), skip until the 0xFFF8 frame
    // sync instead
    var sawFrame = false
    packets.iterator.drop(1 + nHeaders).foreach { pk =>
      if (!sawFrame && nHeaders == 0)
        sawFrame = pk.length >= 2 && (pk(0) & 0xff) == 0xff &&
          (pk(1) & 0xf8) == 0xf8
      else sawFrame = true
      if (sawFrame) native.write(pk)
    }
    Flac.decode(native.toByteArray)
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Deterministic Ogg-FLAC synthesizer: [[Flac.encodeParts]]'s native
    * stream re-enveloped per the mapping — BOS packet with the
    * 0x7F FLAC prologue and the STREAMINFO (last-flag cleared), one
    * VORBIS_COMMENT header packet (exercising the skip), then ONE
    * audio packet PER native frame (the mapping's rule — a multi-frame
    * packet round-trips through the in-repo concatenating decoder but
    * is not a conformant stream) with per-packet last-sample granule
    * positions, real page CRCs via the shared [[Vorbis.oggWrap]].
    */
  def encode(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val (header, frames) = Flac.encodeParts(samples, sampleRate)
    val native = header
    require(native.length >= 42 && native(0) == 'f', "native flac shape")
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(0x7f)
    bos.write("FLAC".getBytes("US-ASCII"))
    bos.write(1); bos.write(0) // mapping version 1.0
    bos.write(0); bos.write(1) // one more header packet follows
    val torso = java.util.Arrays.copyOfRange(native, 0, 42)
    torso(4) = (torso(4) & 0x7f).toByte // clear last-metadata flag
    bos.write(torso)
    val comment = new java.io.ByteArrayOutputStream()
    comment.write(0x80 | 4) // last block, VORBIS_COMMENT
    val vendor = "graft".getBytes("US-ASCII")
    val len = 4 + vendor.length + 4
    comment.write(0); comment.write(0); comment.write(len)
    comment.write(vendor.length); comment.write(0); comment.write(0)
    comment.write(0)
    comment.write(vendor)
    comment.write(new Array[Byte](4)) // zero user comments
    Vorbis.oggWrap(
      Seq((bos.toByteArray, 0L), (comment.toByteArray, 0L)) ++ frames)
  }
}
