package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** [EXT] Real spectral feature extraction for PCM audio — the audio
  * analog of the PNG pixel path: everything here is pure-JVM DSP with
  * no codec library, so WAV/PCM payloads get REAL signal features
  * (short-time FFT → power spectrum → mel filterbank → log-mel means,
  * plus spectral centroid and zero-crossing rate), not byte statistics.
  * Lossy codecs (MP3/AAC) remain the documented `ContainerCodec`
  * boundary; this operator consumes the same RIFF chunk walk.
  *
  * Pipeline shape (the part that matters at 100 TB): one
  * `mapPartitions` over the opaque binary column — partition-parallel,
  * no shuffle, batch-bounded memory. Per row the cost is
  * O(frames · frameSize · log frameSize); frameSize/hop/nMels are
  * parameters, not globals, so a caller can trade fidelity for
  * throughput per corpus.
  *
  * DSP choices, all standard: Hann window (frames overlap at
  * hop ≤ frameSize, and the raised-cosine edge kills the rectangular
  * window's spectral leakage), radix-2 iterative Cooley–Tukey FFT
  * (frameSize must be a power of two — enforced), HTK-style mel scale
  * mel(f) = 2595·log10(1 + f/700) with triangular filters, features
  * averaged over frames into one fixed-width vector per document (the
  * shape embedding/classifier stages downstream consume).
  */
object AudioDsp {

  /** Per-document spectral summary. `decoded=false` rows (non-WAV,
    * non-16-bit, or too short for one frame) carry zeroed features —
    * the operator is total over arbitrary binary, like the rest of the
    * multimodal family.
    */
  final case class AudioFeatures(
      doc_id: Long,
      decoded: Boolean,
      sample_rate: Int,
      n_samples: Int,
      n_frames: Int,
      zcr: Float,
      centroid_hz: Float,
      rms: Float,
      log_mel: Array[Float])

  // ---- FFT --------------------------------------------------------------

  /** In-place iterative radix-2 Cooley–Tukey; n must be a power of 2.
    * Bit-reversal permutation, then log2(n) butterfly passes with
    * per-stage twiddle recurrence.
    */
  private[graft] def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0 && n > 0,
      s"FFT length must be a power of two, got $n")
    // bit-reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cr - im(base + k + len / 2) * ci
          val vi = re(base + k + len / 2) * ci + im(base + k + len / 2) * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  // ---- mel machinery ----------------------------------------------------

  def melOf(hz: Double): Double = 2595.0 * math.log10(1.0 + hz / 700.0)
  def hzOf(mel: Double): Double = 700.0 * (math.pow(10.0, mel / 2595.0) - 1.0)

  /** Triangular filters over the one-sided spectrum (nFft/2 + 1 bins):
    * nMels + 2 mel-spaced edge points from 0 to Nyquist; filter m rises
    * from edge m to m+1 and falls to m+2.
    */
  private[graft] def melFilterbank(
      nMels: Int, nFft: Int, sampleRate: Int): Array[Array[Double]] = {
    val nBins = nFft / 2 + 1
    val maxMel = melOf(sampleRate / 2.0)
    val edges = Array.tabulate(nMels + 2)(i => hzOf(maxMel * i / (nMels + 1)))
    Array.tabulate(nMels) { m =>
      val (lo, c, hi) = (edges(m), edges(m + 1), edges(m + 2))
      Array.tabulate(nBins) { bin =>
        val f = bin.toDouble * sampleRate / nFft
        if (f <= lo || f >= hi) 0.0
        else if (f <= c) (f - lo) / math.max(c - lo, 1e-12)
        else (hi - f) / math.max(hi - c, 1e-12)
      }
    }
  }

  private[graft] def hann(n: Int): Array[Double] =
    Array.tabulate(n)(i => 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (n - 1))))

  /** WAV -> normalized mono samples + sample rate across the full
    * uncompressed sample space — 8-bit unsigned, 16/24/32-bit signed
    * integer PCM (format 1) and 32/64-bit IEEE float (format 3,
    * including the WAVE_FORMAT_EXTENSIBLE wrapping pro-audio masters
    * use) — or None for anything else (compressed WAV falls back to
    * byte statistics like every other codec boundary). Multichannel
    * mixes down by the per-sample mean. The mono-mix [[analyze]] and
    * the landmark fingerprints use, factored out so every audio
    * consumer shares the EXACT decode: the same recording delivered as
    * a 16-bit web rip and a 24-bit or float master decodes to the same
    * signal up to quantization, so it fingerprints as the same
    * recording.
    */
  // IMA ADPCM tables (public spec; shared by encode and decode)
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  private def imaClampIdx(i: Int): Int = if (i < 0) 0 else if (i > 88) 88 else i
  private def imaClamp(v: Int): Int =
    if (v < -32768) -32768 else if (v > 32767) 32767 else v

  /** ITU-T G.711 mu-law byte -> linear 16-bit (the public expansion:
    * invert, split exponent/mantissa, bias 0x84).
    */
  private[ext] def mulawExpand(u0: Int): Int = {
    val u = ~u0 & 0xff
    val exp = (u >> 4) & 7
    val man = u & 0xf
    val mag = (((man << 3) + 0x84) << exp) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** ITU-T G.711 A-law byte -> linear 16-bit (toggle 0x55, segmented
    * expansion).
    */
  private[ext] def alawExpand(a0: Int): Int = {
    val a = (a0 ^ 0x55) & 0xff
    val exp = (a >> 4) & 7
    val man = a & 0xf
    val mag =
      if (exp == 0) (man << 4) + 8
      else ((man << 4) + 0x108) << (exp - 1)
    if ((a & 0x80) != 0) mag else -mag
  }

  /** G.711 fixture encoders — exact inverses of the expanders over
    * their quantization cells.
    */
  private[ext] def mulawCompress(s0: Int): Int = {
    val sign = if (s0 < 0) 0x80 else 0
    var s = math.min(32635, math.abs(s0)) + 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
    val man = (s >> (exp + 3)) & 0xf
    ~(sign | (exp << 4) | man) & 0xff
  }

  private[ext] def alawCompress(s0: Int): Int = {
    val sign = if (s0 >= 0) 0x80 else 0
    var s = math.min(32767, math.abs(s0))
    val out =
      if (s < 256) sign | (s >> 4)
      else {
        var exp = 7
        var mask = 0x4000
        while (exp > 1 && (s & mask) == 0) { exp -= 1; mask >>= 1 }
        sign | (exp << 4) | ((s >> (exp + 3)) & 0xf)
      }
    (out ^ 0x55) & 0xff
  }

  // MS ADPCM tables (public spec)
  private val MsCoef1 = Array(256, 512, 0, 192, 240, 460, 392)
  private val MsCoef2 = Array(0, -256, 0, 64, 0, -208, -232)
  private val MsAdapt = Array(230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** One MS-ADPCM step from a signed nibble: (sample, newDelta). */
  private def msStep(s1: Int, s2: Int, c1: Int, c2: Int, delta: Int,
      nib: Int): (Int, Int) = {
    val signed = if (nib >= 8) nib - 16 else nib
    val pred = imaClamp(((s1 * c1 + s2 * c2) >> 8) + signed * delta)
    val d2 = math.max(16, (MsAdapt(nib) * delta) >> 8)
    (pred, d2)
  }

  /** MS ADPCM (format 2) block decode to the normalized mono mix: per
    * block and channel a 7-byte header (coef index u8, delta i16le,
    * sample1 i16le, sample2 i16le — sample2 is the OLDER sample), then
    * one nibble per sample, channels interleaved nibble-by-nibble for
    * stereo, HIGH nibble first.
    */
  private def msMono(b: Array[Byte], channels: Int, dataOff: Int,
      dataLen: Int, blockAlign: Int): Option[Array[Double]] = {
    if (blockAlign < 7 * channels || channels < 1 || channels > 2)
      return None
    def i16(o: Int): Int = ((b(o + 1) << 8) | (b(o) & 0xff)).toShort.toInt
    val spb = 2 + 2 * (blockAlign - 7 * channels) / channels
    val out = new scala.collection.mutable.ArrayBuffer[Double]()
    var bo = dataOff
    val end = dataOff + math.min(dataLen, b.length - dataOff)
    while (bo + 7 * channels <= end) {
      val blockEnd = math.min(bo + blockAlign, end)
      val ci = new Array[Int](channels)
      val delta = new Array[Int](channels)
      val s1 = new Array[Int](channels)
      val s2 = new Array[Int](channels)
      var ch = 0
      while (ch < channels) {
        ci(ch) = b(bo + ch) & 0xff
        if (ci(ch) > 6) return None
        delta(ch) = i16(bo + channels + ch * 2)
        s1(ch) = i16(bo + 3 * channels + ch * 2)
        s2(ch) = i16(bo + 5 * channels + ch * 2)
        ch += 1
      }
      def emit(vals: Array[Int]): Unit = {
        var acc = 0.0
        var c = 0
        while (c < channels) { acc += vals(c); c += 1 }
        out += acc / channels / 32768.0
      }
      emit(s2) // the older sample plays first
      emit(s1)
      var produced = 2
      var go = bo + 7 * channels
      var nibIdx = 0
      while (go < blockEnd && produced < spb) {
        val v = b(go) & 0xff
        var half = 0
        while (half < 2 && produced < spb) {
          val nib = if (half == 0) v >> 4 else v & 0xf
          val ch2 = if (channels == 2) (nibIdx & 1) else 0
          val (p, d2) = msStep(s1(ch2), s2(ch2), MsCoef1(ci(ch2)),
            MsCoef2(ci(ch2)), delta(ch2), nib)
          s2(ch2) = s1(ch2); s1(ch2) = p; delta(ch2) = d2
          if (channels == 1 || (nibIdx & 1) == 1) {
            emit(s1)
            produced += 1
          }
          nibIdx += 1
          half += 1
        }
        go += 1
      }
      bo += blockAlign
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  /** One IMA step: (newPredictor, newIndex) from a nibble. */
  private def imaStep(pred: Int, idx: Int, n: Int): (Int, Int) = {
    val step = ImaStep(idx)
    var diff = step >> 3
    if ((n & 4) != 0) diff += step
    if ((n & 2) != 0) diff += step >> 1
    if ((n & 1) != 0) diff += step >> 2
    val p = imaClamp(if ((n & 8) != 0) pred - diff else pred + diff)
    (p, imaClampIdx(idx + ImaIndex(n)))
  }

  /** IMA ADPCM block decode to the normalized mono mix: per block and
    * channel a 4-byte header (predictor i16le = the first sample, step
    * index u8), then nibbles low-first — mono sequential, stereo in
    * alternating 4-byte channel groups. A trailing partial block
    * decodes as far as its bytes go.
    */
  private def imaMono(b: Array[Byte], channels: Int, dataOff: Int,
      dataLen: Int, blockAlign: Int): Option[Array[Double]] = {
    if (blockAlign < 4 * channels || channels < 1 || channels > 2)
      return None
    val spb = 1 + 2 * (blockAlign / channels - 4)
    val out = new scala.collection.mutable.ArrayBuffer[Double]()
    var bo = dataOff
    val end = dataOff + math.min(dataLen, b.length - dataOff)
    while (bo + 4 * channels <= end) {
      val blockEnd = math.min(bo + blockAlign, end)
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      var ch = 0
      while (ch < channels) {
        val ho = bo + ch * 4
        pred(ch) = ((b(ho + 1) << 8) | (b(ho) & 0xff)).toShort.toInt
        idx(ch) = math.min(88, b(ho + 2) & 0xff)
        ch += 1
      }
      // header predictors are the block's first samples
      var mix = 0.0
      ch = 0
      while (ch < channels) { mix += pred(ch); ch += 1 }
      out += mix / channels / 32768.0
      var produced = 1
      var go = bo + 4 * channels
      // nibble streams per channel: stereo alternates 4-byte groups
      val nibbles = Array.fill(channels)(
        new scala.collection.mutable.ArrayBuffer[Int]())
      var gi = 0
      while (go < blockEnd) {
        val ch2 = if (channels == 2) (gi & 1) else 0
        val take = math.min(4, blockEnd - go)
        var k = 0
        while (k < take) {
          val v = b(go + k) & 0xff
          nibbles(ch2) += (v & 0xf)
          nibbles(ch2) += (v >> 4)
          k += 1
        }
        go += take
        gi += 1
      }
      val perCh = nibbles.map(_.length).min
      var i = 0
      while (i < perCh && produced < spb) {
        var mix2 = 0.0
        ch = 0
        while (ch < channels) {
          val (p, ix) = imaStep(pred(ch), idx(ch), nibbles(ch)(i))
          pred(ch) = p; idx(ch) = ix
          mix2 += p
          ch += 1
        }
        out += mix2 / channels / 32768.0
        produced += 1
        i += 1
      }
      bo += blockAlign
    }
    if (out.isEmpty) None else Some(out.toArray)
  }

  private[graft] def monoSamples(bytes: Array[Byte]): Option[(Array[Double], Int)] = {
    if (bytes == null) return None
    if (Flac.isFlac(bytes)) return Flac.decode(bytes) // lossless: same signal
    if (Vorbis.isOggVorbis(bytes)) return Vorbis.decode(bytes) // r13: lossy
    if (OggFlac.isOggFlac(bytes)) return OggFlac.decode(bytes) // r13
    if (Aiff.isAiff(bytes)) return Aiff.decode(bytes) // r13: container math
    if (Au.isAu(bytes)) return Au.decode(bytes) // r13: container math
    if (!Multimodal.ContainerCodec.isWav(bytes))
      // bare MP3 (round 13): lossy, but the decoded signal shares its
      // spectral peaks with the master, which is all landmarks need
      return if (Mp3.isMp3(bytes)) Mp3.decode(bytes) else None
    val (format, channels, sampleRate, bits, dataOff, dataLen, blockAlign) =
      Multimodal.ContainerCodec.wavLayout(bytes) match {
        case Some(l) => l
        case None    => return None
      }
    if (format == 0x55) // MP3-in-WAV: the data chunk IS an MP3 stream
      return Mp3.decode(
        java.util.Arrays.copyOfRange(bytes, dataOff, dataOff + dataLen))
    if (format == 0x11)
      return imaMono(bytes, channels, dataOff, dataLen, blockAlign)
        .map((_, sampleRate))
    if (format == 2)
      return msMono(bytes, channels, dataOff, dataLen, blockAlign)
        .map((_, sampleRate))
    if (format == 6 || format == 7) { // A-law / mu-law, 8-bit companded
      if (bits != 8) return None
      val nSamples = dataLen / channels
      val x = new Array[Double](nSamples)
      var i = 0
      while (i < nSamples) {
        var acc = 0.0
        var ch = 0
        while (ch < channels) {
          val v = bytes(dataOff + i * channels + ch) & 0xff
          acc += (if (format == 6) alawExpand(v) else mulawExpand(v))
          ch += 1
        }
        x(i) = acc / channels / 32768.0
        i += 1
      }
      return Some((x, sampleRate))
    }
    val bps = bits / 8
    if (bps <= 0) return None
    def i32le(o: Int): Int =
      (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
        ((bytes(o + 2) & 0xff) << 16) | (bytes(o + 3) << 24)
    val sample: Int => Double = (format, bits) match {
      case (1, 8)  => o => ((bytes(o) & 0xff) - 128) / 128.0
      case (1, 16) => o =>
        ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort.toDouble / 32768.0
      case (1, 24) => o =>
        ((bytes(o + 2) << 16) | ((bytes(o + 1) & 0xff) << 8) |
          (bytes(o) & 0xff)) / 8388608.0
      case (1, 32) => o => i32le(o) / 2147483648.0
      case (3, 32) => o => java.lang.Float.intBitsToFloat(i32le(o)).toDouble
      case (3, 64) => o => java.lang.Double.longBitsToDouble(
        (i32le(o + 4).toLong << 32) | (i32le(o).toLong & 0xffffffffL))
      case _ => return None
    }
    val nSamples = dataLen / bps / channels
    val x = new Array[Double](nSamples)
    var i = 0
    while (i < nSamples) {
      var acc = 0.0; var ch = 0
      while (ch < channels) {
        acc += sample(dataOff + (i * channels + ch) * bps)
        ch += 1
      }
      x(i) = acc / channels
      i += 1
    }
    Some((x, sampleRate))
  }

  // ---- per-document analysis -------------------------------------------

  /** Decode an uncompressed WAV (any [[monoSamples]] layout) and
    * summarize its spectrum. None when the payload is not such a WAV
    * (caller emits the zeroed row).
    */
  private[graft] def analyze(
      bytes: Array[Byte], frameSize: Int, hop: Int,
      nMels: Int): Option[AudioFeatures] = {
    val (x, sampleRate) = monoSamples(bytes) match {
      case Some(ms) => ms
      case None     => return None
    }
    val nSamples = x.length
    // whole-signal zcr and rms
    var crossings = 0; var energy = 0.0
    var i = 0
    while (i < nSamples) {
      energy += x(i) * x(i)
      if (i > 0 && (x(i) >= 0) != (x(i - 1) >= 0)) crossings += 1
      i += 1
    }
    val zcr =
      if (nSamples > 1) crossings.toFloat / (nSamples - 1) else 0f
    val rms =
      if (nSamples > 0) math.sqrt(energy / nSamples).toFloat else 0f

    val nFrames =
      if (nSamples < frameSize) 0 else (nSamples - frameSize) / hop + 1
    val nBins = frameSize / 2 + 1
    val meanPower = new Array[Double](nBins)
    if (nFrames > 0) {
      val window = hann(frameSize)
      val re = new Array[Double](frameSize)
      val im = new Array[Double](frameSize)
      var fIdx = 0
      while (fIdx < nFrames) {
        val off = fIdx * hop
        var k = 0
        while (k < frameSize) {
          re(k) = x(off + k) * window(k); im(k) = 0.0; k += 1
        }
        fft(re, im)
        k = 0
        while (k < nBins) {
          meanPower(k) += (re(k) * re(k) + im(k) * im(k)) / nFrames
          k += 1
        }
        fIdx += 1
      }
    }
    var pSum = 0.0; var fSum = 0.0
    i = 0
    while (i < nBins) {
      pSum += meanPower(i)
      fSum += meanPower(i) * (i.toDouble * sampleRate / frameSize)
      i += 1
    }
    val centroid = if (pSum > 0) (fSum / pSum).toFloat else 0f
    val fb = melFilterbank(nMels, frameSize, sampleRate)
    val logMel = Array.tabulate(nMels) { m =>
      var e = 0.0; var k = 0
      while (k < nBins) { e += fb(m)(k) * meanPower(k); k += 1 }
      math.log10(e + 1e-10).toFloat
    }
    Some(AudioFeatures(0L, decoded = true, sampleRate, nSamples, nFrames,
      zcr, centroid, rms, logMel))
  }

  /** The distributed operator: media rows in, one fixed-width spectral
    * summary per document out. One mapPartitions, no shuffle; rows this
    * DSP cannot decode come back `decoded=false` with zeroed features
    * (log-mel at the silence floor), keeping the operator total.
    */
  def features(
      spark: SparkSession,
      media: DataFrame,
      frameSize: Int = 512,
      hop: Int = 256,
      nMels: Int = 16): Dataset[AudioFeatures] = {
    require((frameSize & (frameSize - 1)) == 0 && frameSize > 1,
      s"frameSize must be a power of two, got $frameSize")
    require(hop > 0 && hop <= frameSize, s"hop must be in (0, frameSize]")
    import spark.implicits._
    media.as[Multimodal.MediaRow].mapPartitions { it =>
      it.map { r =>
        analyze(r.media, frameSize, hop, nMels) match {
          case Some(f) => f.copy(doc_id = r.doc_id)
          case None =>
            AudioFeatures(r.doc_id, decoded = false, 0, 0, 0, 0f, 0f, 0f,
              Array.fill(nMels)(-10f))
        }
      }
    }
  }

  /** IMA ADPCM WAV fixture encoder (format 0x11): the reference
    * greedy nibble quantizer, so the decoder reproduces the encoder's
    * reconstruction EXACTLY (ADPCM is lossy vs the input, never vs
    * itself). One Array[Double] in [-1,1] per channel (1 or 2); the
    * final block pads by repeating the last sample.
    */
  def imaAdpcmWav(chans: Seq[Array[Double]], sampleRate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    val channels = chans.length
    require(channels == 1 || channels == 2, s"imaAdpcmWav: $channels ch")
    require(chans.forall(_.length == chans.head.length),
      "imaAdpcmWav: ragged channels")
    require(blockAlign % (4 * channels) == 0 && blockAlign >= 8 * channels,
      s"imaAdpcmWav: blockAlign $blockAlign")
    val n = chans.head.length
    require(n >= 1, "imaAdpcmWav: empty")
    val spb = 1 + 2 * (blockAlign / channels - 4)
    val nBlocks = (n + spb - 1) / spb
    def q(v: Double): Int = imaClamp(math.round(v * 32767.0).toInt)
    val data = new java.io.ByteArrayOutputStream()
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * spb
      def sampleAt(ch: Int, i: Int): Int =
        q(chans(ch)(math.min(base + i, n - 1)))
      val pred = Array.tabulate(channels)(ch => sampleAt(ch, 0))
      // per-block initial step index sized to the block's mean delta —
      // skipping the slow adaptation ramp a zero index would impose
      // (the header carries it, so the decoder follows exactly)
      val idx = Array.tabulate(channels) { ch =>
        val meanD = (1 until spb)
          .map(i => math.abs(sampleAt(ch, i) - sampleAt(ch, i - 1)).toLong)
          .sum / math.max(1, spb - 1)
        val k = ImaStep.indexWhere(_ >= meanD)
        if (k < 0) 88 else k
      }
      for (ch <- 0 until channels) {
        val p = pred(ch)
        data.write(p & 0xff); data.write((p >> 8) & 0xff)
        data.write(idx(ch)); data.write(0)
      }
      // reference greedy quantizer, nibble streams per channel
      val nibs = Array.ofDim[Int](channels, spb - 1)
      for (ch <- 0 until channels) {
        var p = pred(ch)
        var ix = idx(ch)
        var i = 1
        while (i < spb) {
          val t = sampleAt(ch, i)
          val step = ImaStep(ix)
          var diff = t - p
          var nib = 0
          if (diff < 0) { nib = 8; diff = -diff }
          if (diff >= step) { nib |= 4; diff -= step }
          if (diff >= (step >> 1)) { nib |= 2; diff -= step >> 1 }
          if (diff >= (step >> 2)) nib |= 1
          val (p2, ix2) = imaStep(p, ix, nib)
          p = p2; ix = ix2
          nibs(ch)(i - 1) = nib
          i += 1
        }
      }
      // mono: sequential bytes; stereo: alternating 4-byte groups
      if (channels == 1) {
        var i = 0
        while (i < spb - 1) {
          val lo = nibs(0)(i)
          val hi = if (i + 1 < spb - 1) nibs(0)(i + 1) else 0
          data.write(lo | (hi << 4))
          i += 2
        }
      } else {
        val groups = (spb - 1) / 8
        var g = 0
        while (g < groups) {
          var ch = 0
          while (ch < 2) {
            var k = 0
            while (k < 4) {
              val i = g * 8 + k * 2
              val lo = nibs(ch)(i)
              val hi = if (i + 1 < spb - 1) nibs(ch)(i + 1) else 0
              data.write(lo | (hi << 4))
              k += 1
            }
            ch += 1
          }
          g += 1
        }
      }
      blk += 1
    }
    val payload = data.toByteArray
    val out = java.nio.ByteBuffer
      .allocate(12 + 8 + 20 + 8 + 4 + 8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + 20 + 8 + 4 + 8 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(20)
      .putShort(0x11).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / spb) // nominal byte rate
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(2).putShort(spb.toShort) // cbSize, wSamplesPerBlock
      .put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
      .put("data".getBytes("US-ASCII")).putInt(payload.length)
      .put(payload)
    out.array()
  }

  /** MS ADPCM WAV fixture encoder (format 2, coefficient pair 0 so the
    * predictor is the previous sample): the greedy nibble quantizer
    * against the decoder's own reconstruction, mono or stereo
    * (nibbles alternate channels, high nibble first).
    */
  def msAdpcmWav(chans: Seq[Array[Double]], sampleRate: Int,
      blockAlign: Int = 256): Array[Byte] = {
    val channels = chans.length
    require(channels == 1 || channels == 2, s"msAdpcmWav: $channels ch")
    require(chans.forall(_.length == chans.head.length),
      "msAdpcmWav: ragged channels")
    require(blockAlign >= 14 * channels && blockAlign % channels == 0,
      s"msAdpcmWav: blockAlign $blockAlign")
    val n = chans.head.length
    require(n >= 2, "msAdpcmWav: need at least two samples")
    def q(v: Double): Int = imaClamp(math.round(v * 32767.0).toInt)
    val spb = 2 + 2 * (blockAlign - 7 * channels) / channels
    val nBlocks = (n + spb - 1) / spb
    val data = new java.io.ByteArrayOutputStream()
    var blk = 0
    while (blk < nBlocks) {
      val base = blk * spb
      def sampleAt(ch: Int, i: Int): Int =
        q(chans(ch)(math.min(base + i, n - 1)))
      val s2 = Array.tabulate(channels)(sampleAt(_, 0))
      val s1 = Array.tabulate(channels)(sampleAt(_, 1))
      val delta = Array.tabulate(channels) { ch =>
        val meanD = (2 until spb)
          .map(i => math.abs(sampleAt(ch, i) - sampleAt(ch, i - 1)).toLong)
          .sum / math.max(1, spb - 2)
        math.max(16, (meanD / 4).toInt)
      }
      for (ch <- 0 until channels) data.write(0) // coef index 0
      for (ch <- 0 until channels) {
        data.write(delta(ch) & 0xff); data.write((delta(ch) >> 8) & 0xff)
      }
      for (ch <- 0 until channels) {
        data.write(s1(ch) & 0xff); data.write((s1(ch) >> 8) & 0xff)
      }
      for (ch <- 0 until channels) {
        data.write(s2(ch) & 0xff); data.write((s2(ch) >> 8) & 0xff)
      }
      var cur = 0
      var half = 0
      var i = 2
      var nibIdx = 0
      val totalNibs = (spb - 2) * channels
      while (nibIdx < totalNibs) {
        val ch = if (channels == 2) (nibIdx & 1) else 0
        val t = sampleAt(ch, i)
        val pred = (s1(ch) * MsCoef1(0) + s2(ch) * MsCoef2(0)) >> 8
        val ideal = math.round((t - pred).toDouble / delta(ch)).toInt
        val nib = (math.max(-8, math.min(7, ideal))) & 0xf
        val (p, d2) = msStep(s1(ch), s2(ch), MsCoef1(0), MsCoef2(0),
          delta(ch), nib)
        s2(ch) = s1(ch); s1(ch) = p; delta(ch) = d2
        if (half == 0) { cur = nib << 4; half = 1 }
        else { data.write(cur | nib); half = 0 }
        nibIdx += 1
        if (channels == 1 || (nibIdx & 1) == 0) i += 1
      }
      if (half == 1) data.write(cur)
      blk += 1
    }
    val payload = data.toByteArray
    val fmtLen = 18 + 32 // + wSamplesPerBlock, wNumCoef, 7 coef pairs
    val out = java.nio.ByteBuffer
      .allocate(12 + 8 + fmtLen + 8 + 4 + 8 + payload.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
      .putInt(4 + 8 + fmtLen + 8 + 4 + 8 + payload.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(fmtLen)
      .putShort(2).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign / spb)
      .putShort(blockAlign.toShort).putShort(4)
      .putShort(32).putShort(spb.toShort).putShort(7)
    for (k <- 0 until 7)
      out.putShort(MsCoef1(k).toShort).putShort(MsCoef2(k).toShort)
    out.put("fact".getBytes("US-ASCII")).putInt(4).putInt(n)
      .put("data".getBytes("US-ASCII")).putInt(payload.length)
      .put(payload)
    out.array()
  }

  /** G.711 WAV fixture encoder: mu-law (format 7) or A-law (format 6),
    * 8-bit companded telephony audio — the exact inverse pair of the
    * decode expanders.
    */
  def g711Wav(samples: Array[Double], sampleRate: Int,
      alaw: Boolean = false, channels: Int = 1): Array[Byte] = {
    require(channels >= 1, s"g711Wav: channels $channels")
    val fmt = if (alaw) 6 else 7
    val dataLen = samples.length * channels
    val out = java.nio.ByteBuffer.allocate(12 + 8 + 18 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + 18 + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(18)
      .putShort(fmt.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels).putShort(channels.toShort)
      .putShort(8).putShort(0) // bits, cbSize
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { v =>
      val s = math.max(-32768, math.min(32767,
        math.round(v * 32767.0).toInt))
      val b = if (alaw) alawCompress(s) else mulawCompress(s)
      var ch = 0
      while (ch < channels) { out.put(b.toByte); ch += 1 }
    }
    out.array()
  }

  /** General WAV writer for the width/format-invariance fixtures:
    * doubles in [-1, 1] encoded as 8-bit unsigned, 16/24/32-bit signed
    * PCM (format 1) or 32/64-bit IEEE float (format 3), mono or
    * channel-duplicated multichannel, optionally wrapped in
    * WAVE_FORMAT_EXTENSIBLE — every layout [[monoSamples]] decodes.
    * Quantization rounds to nearest, so a 16-bit web rip and a 24-bit
    * master of the same signal decode within one another's LSB.
    */
  def pcmWav(samples: Array[Double], sampleRate: Int, bits: Int = 16,
      float: Boolean = false, channels: Int = 1,
      extensible: Boolean = false): Array[Byte] = {
    require(channels >= 1, s"pcmWav: channels $channels")
    val format = if (float) 3 else 1
    require(
      (!float && Seq(8, 16, 24, 32).contains(bits)) ||
        (float && (bits == 32 || bits == 64)),
      s"pcmWav: unsupported layout format=$format bits=$bits")
    val bps = bits / 8
    val fmtLen = if (extensible) 40 else 16
    val dataLen = samples.length * channels * bps
    val out = java.nio.ByteBuffer
      .allocate(12 + 8 + fmtLen + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(4 + 8 + fmtLen + 8 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(fmtLen)
      .putShort(if (extensible) 0xfffe.toShort else format.toShort)
      .putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * bps)
      .putShort((channels * bps).toShort).putShort(bits.toShort)
    if (extensible) {
      out.putShort(22)            // cbSize
        .putShort(bits.toShort)   // wValidBitsPerSample
        .putInt(0)                // dwChannelMask
        .putShort(format.toShort) // SubFormat GUID leads with the code
      out.put(Array[Byte](0, 0, 0, 0, 0x10, 0, 0x80.toByte, 0, 0,
        0xaa.toByte, 0, 0x38, 0x9b.toByte, 0x71)) // KSDATAFORMAT remainder
    }
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach { v =>
      var ch = 0
      while (ch < channels) {
        if (float && bits == 32) out.putFloat(v.toFloat)
        else if (float) out.putDouble(v)
        else bits match {
          case 8  => out.put((math.round(v * 127.0) + 128).toByte)
          case 16 => out.putShort(math.round(v * 32767.0).toShort)
          case 24 =>
            val q = math.round(v * 8388607.0).toInt
            out.put(q.toByte).put((q >> 8).toByte).put((q >> 16).toByte)
          case _ => out.putInt(math.round(v * 2147483647.0).toInt)
        }
        ch += 1
      }
    }
    out.array()
  }

  /** Deterministic WAV synthesizer (16-bit PCM mono sine) — the fixture
    * generator for the audio gates: freq/duration derive from doc_id so
    * the framing arithmetic is restatable in plain SQL while the DSP
    * itself is exercised on real RIFF bytes end-to-end.
    */
  def sineWav(
      sampleRate: Int, nSamples: Int, freqHz: Double,
      amplitude: Double = 0.5, phase: Double = 0.1): Array[Byte] = {
    val dataLen = nSamples * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = amplitude * math.sin(2.0 * math.Pi * freqHz * i / sampleRate
        + phase)
      out.putShort(math.round(v * 32767.0).toShort)
      i += 1
    }
    out.array()
  }
}
