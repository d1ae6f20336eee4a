package graft.ext

/** MP3 (MPEG-1 Audio Layer III) codec — sample decoder for the audio
  * landmark regime plus a real CBR fixture encoder, implemented from
  * the public ISO/IEC 11172-3 bitstream layout with zero codec
  * dependency (the JDK ships no MP3 reader). Reference behavior:
  * finance_pipeline treats media as opaque blobs; this is the
  * BASELINE.json `north_star` [EXT] multimodal surface — an MP3
  * re-encode of a WAV/FLAC master decodes to the SAME signal (within
  * the codec's own quantization noise), so the landmark fingerprints
  * treat them as one recording. Until this round MP3 was the
  * documented geometry-only boundary (`Multimodal.scala` mp3Geometry);
  * the decode census flips those rows from "container" to "pcm".
  *
  * What is implemented FROM THE SPEC (algorithmic or closed-form,
  * EXCEPT the three documented substitutions below — of which #3, the
  * scalefactor-band tables, IS a transcribed numeric table with only
  * structural validation):
  *  - frame header walk, CBR/VBR frames, ID3v2/ID3v1 envelopes;
  *  - side info (mono/stereo), the BIT RESERVOIR (main_data_begin
  *    back-pointer into prior frames' main data);
  *  - scalefactors: slen1/slen2 from scalefac_compress, scfsi reuse,
  *    long / short / mixed layouts;
  *  - Huffman spectrum: big_values pair regions with per-region table
  *    select, count1 quadruples, sign bits, rzero tail;
  *  - requantize (|v|^(4/3), global_gain, scalefac_scale, preflag
  *    pretab, subblock_gain), short-block REORDER;
  *  - mid/side stereo (mode_extension bit 1);
  *  - alias reduction butterflies (ci = {-0.6,-0.535,-0.33,-0.185,
  *    -0.095,-0.041,-0.0142,-0.0037} — spec constants, cs/ca derived);
  *  - hybrid synthesis: IMDCT-36/12 with all four spec window types
  *    (long / start / short / stop, sine windows — closed form),
  *    granule overlap-add, frequency inversion;
  *  - the 32-band polyphase synthesis in the spec's exact V-fifo /
  *    U-stride / 512-tap windowed structure.
  *
  * DOCUMENTED SUBSTITUTIONS (the places the spec's content is a
  * tabulated numeric artifact that cannot be re-derived — transcribing
  * such tables from memory would be fabrication, the failure mode
  * SURVEY.md §0 exists to prevent). Items 1 and 2 carry strong
  * structural validation; item 3 is VALIDATED MORE WEAKLY and is the
  * honest fabrication-risk residue of this module:
  *  1. Polyphase prototype: ISO Table B.3 ("synthesis window D") is a
  *     512-value near-PR filter design with no closed form. This codec
  *     uses a MATCHED prototype DERIVED AT INIT from a closed-form
  *     recipe in the identical 512-tap structure: a square-root-
  *     raised-cosine lowpass (power-complementary at the pi/64 band
  *     crossover — the pseudo-QMF alias-cancellation condition),
  *     frequency-sampled, inverse-FFT'd, Hann-tapered, block-sign
  *     folded — see [[Proto]]. Reconstruction ~-36 dB (far below the
  *     format's own quantization noise), stopband ~-68 dB (the number
  *     that matters: quantization breaks exact alias cancellation, so
  *     inter-band leakage resurfaces as ghost tones at the stopband
  *     level — a short sine prototype at -23 dB produced cross-file
  *     phantom landmarks; this one does not). graft-encoded streams
  *     round-trip cleanly; third-party streams decode with bounded
  *     extra aliasing and a constant gain offset (harmless to
  *     landmarks, which are relative spectral peaks).
  *  2. Huffman tables: ISO Table B.7 is 34 tabulated code tables. The
  *     subset embedded here (tables 0, 1, 2 and count1 tables A, B) is
  *     structurally VALIDATED at class-init (complete prefix codes,
  *     Kraft sum exactly 1). The fixture encoder restricts itself to
  *     this subset; a frame selecting an unembedded table decodes to
  *     None and the file stays in the census-visible container regime
  *     (exactly like the other documented codec boundaries). The same
  *     conservative None covers MPEG-2/2.5 (LSF scalefactor coding)
  *     and intensity stereo.
  *  3. Scalefactor-band boundaries and pretab (ISO Table B.8 /
  *     pretab): [[SfbLong]], [[SfbShort]], [[Pretab]] are transcribed
  *     tables like B.7, but their only available validation is
  *     STRUCTURAL (correct entry counts, strictly ascending, exact
  *     full-spectrum endpoints 576/192, pretab shape) — far short of
  *     the Kraft-sum completeness proof the Huffman subset gets, and
  *     the per-rate encode→decode round trips (Mp3Spec, all three
  *     MPEG-1 rates) are CIRCULAR because the fixture encoder shares
  *     these tables. A transcription error here would silently
  *     mis-requantize WILD files while every fixture stays green.
  *     There is no spec worked example to pin against; the residual
  *     risk is accepted and recorded here rather than overstated away.
  *
  * Substitutions 1 and 2 fail LOUD (census rows), never wrong-note;
  * substitution 3 is the one place a wrong table could be quiet, on
  * wild files only.
  */
private[graft] object Mp3 {

  // ---------------------------------------------------------------
  // Frame header
  // ---------------------------------------------------------------

  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val RateV1 = Array(44100, 48000, 32000, 0)

  /** (bitrateKbps, sampleRate, channels, mode, modeExt, padding,
    * crc, srIdx) for a syncword at `off` that is an MPEG-1 Layer III
    * header; None otherwise (including MPEG-2/2.5 and free-format).
    */
  private def header(b: Array[Byte], off: Int)
      : Option[(Int, Int, Int, Int, Int, Int, Boolean, Int)] = {
    if (off + 4 > b.length) return None
    if ((b(off) & 0xff) != 0xff || (b(off + 1) & 0xe0) != 0xe0) return None
    val version = (b(off + 1) >> 3) & 0x3   // 3 = MPEG-1
    val layer = (b(off + 1) >> 1) & 0x3     // 1 = Layer III
    if (version != 3 || layer != 1) return None
    val crc = (b(off + 1) & 1) == 0         // protection_bit 0 => CRC
    val brIdx = (b(off + 2) >> 4) & 0xf
    val srIdx = (b(off + 2) >> 2) & 0x3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (b(off + 2) >> 1) & 1
    val mode = (b(off + 3) >> 6) & 0x3      // 0 st, 1 js, 2 dual, 3 mono
    val modeExt = (b(off + 3) >> 4) & 0x3
    val channels = if (mode == 3) 1 else 2
    Some((BitrateV1L3(brIdx), RateV1(srIdx), channels, mode, modeExt,
      padding, crc, srIdx))
  }

  private def frameBytes(bitrateKbps: Int, rate: Int, padding: Int): Int =
    144 * bitrateKbps * 1000 / rate + padding

  /** Offset of the first MPEG frame: skips an ID3v2 envelope and scans
    * a bounded window for a valid sync (the FLAC/WAV walkers' lenience).
    */
  private def firstFrame(b: Array[Byte]): Int = {
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + sz
    }
    val limit = math.min(b.length - 4, off + 4096)
    var p = off
    while (p >= 0 && p <= limit) {
      header(b, p) match {
        case Some((br, rate, _, _, _, pad, _, _)) =>
          // arbitrary binary is full of spurious 0xFFEx syncs: demand a
          // SECOND consecutive valid frame (or an exact stream end)
          // before believing one
          val fl = frameBytes(br, rate, pad)
          if (p + fl == b.length || header(b, p + fl).isDefined) return p
        case None => ()
      }
      p += 1
    }
    -1
  }

  def isMp3(b: Array[Byte]): Boolean =
    b != null && b.length >= 4 && firstFrame(b) >= 0

  // ---------------------------------------------------------------
  // Huffman tables (embedded subset of ISO Table B.7, validated)
  // ---------------------------------------------------------------

  /** A spectrum pair table: symbols are (x, y) with x = sym / ny,
    * y = sym % ny. `codes`/`lens` are parallel, symbol-indexed.
    */
  private final class PairTable(val nx: Int, val ny: Int,
      codes: Array[Int], lens: Array[Int]) {
    require(codes.length == nx * ny && lens.length == nx * ny)
    val maxLen: Int = lens.max
    // LUT indexed by maxLen peeked bits -> (symbol << 5) | len
    val lut: Array[Int] = {
      val t = Array.fill(1 << maxLen)(-1)
      var s = 0
      while (s < codes.length) {
        val pad = maxLen - lens(s)
        val base = codes(s) << pad
        var k = 0
        while (k < (1 << pad)) {
          require(t(base | k) == -1,
            s"mp3 huffman: overlapping codes (symbol $s)")
          t(base | k) = (s << 5) | lens(s)
          k += 1
        }
        s += 1
      }
      require(t.forall(_ != -1), "mp3 huffman: incomplete code")
      t
    }
    // completeness + prefix-freeness above IS the Kraft==1 check: every
    // LUT slot covered exactly once.
  }

  // Table 1: 2x2, lens {1,3,2,3}, codes {1,1,1,0}
  private val Tab1 = new PairTable(2, 2,
    Array(1, 1, 1, 0), Array(1, 3, 2, 3))
  // Table 2: 3x3, lens {1,3,6,3,3,5,5,5,6}, codes {1,2,1,3,1,1,3,2,0}
  private val Tab2 = new PairTable(3, 3,
    Array(1, 2, 1, 3, 1, 1, 3, 2, 0), Array(1, 3, 6, 3, 3, 5, 5, 5, 6))

  /** table_select -> embedded table; None = valid per spec but not
    * embedded here (the documented decode boundary).
    */
  private def pairTable(sel: Int): Option[PairTable] = sel match {
    case 0 => Some(null) // table 0: no data, all zero
    case 1 => Some(Tab1)
    case 2 => Some(Tab2)
    case _ => None
  }

  /** count1 quadruple tables: symbol = (v<<3)|(w<<2)|(x<<1)|y. */
  private final class QuadTable(codes: Array[Int], lens: Array[Int]) {
    val maxLen: Int = lens.max
    val lut: Array[Int] = {
      val t = Array.fill(1 << maxLen)(-1)
      var s = 0
      while (s < 16) {
        val pad = maxLen - lens(s)
        val base = codes(s) << pad
        var k = 0
        while (k < (1 << pad)) {
          require(t(base | k) == -1, s"mp3 count1: overlapping codes ($s)")
          t(base | k) = (s << 5) | lens(s)
          k += 1
        }
        s += 1
      }
      require(t.forall(_ != -1), "mp3 count1: incomplete code")
      t
    }
  }

  private val Count1A = new QuadTable(
    Array(1, 5, 4, 5, 6, 5, 4, 4, 7, 3, 6, 0, 7, 2, 3, 1),
    Array(1, 4, 4, 5, 4, 6, 5, 6, 4, 5, 5, 6, 5, 6, 6, 6))
  private val Count1B = new QuadTable(
    Array.tabulate(16)(v => ~v & 0xf), Array.fill(16)(4))

  // ---------------------------------------------------------------
  // Scalefactor bands (MPEG-1 rates), pretab, slen
  // ---------------------------------------------------------------

  // index by srIdx (0=44100, 1=48000, 2=32000)
  private val SfbLong: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 52, 62, 74, 90, 110, 134,
      162, 196, 238, 288, 342, 418, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 42, 50, 60, 72, 88, 106, 128,
      156, 190, 230, 276, 330, 384, 576),
    Array(0, 4, 8, 12, 16, 20, 24, 30, 36, 44, 54, 66, 82, 102, 126, 156,
      194, 240, 296, 364, 448, 550, 576))
  private val SfbShort: Array[Array[Int]] = Array(
    Array(0, 4, 8, 12, 16, 22, 30, 40, 52, 66, 84, 106, 136, 192),
    Array(0, 4, 8, 12, 16, 22, 28, 38, 50, 64, 80, 100, 126, 192),
    Array(0, 4, 8, 12, 16, 22, 30, 42, 58, 78, 104, 138, 180, 192))
  // structural validation (ascending, full-spectrum coverage)
  for (t <- SfbLong) require(t.length == 23 && t.last == 576 &&
    t.zip(t.tail).forall(p => p._1 < p._2), "mp3 sfb long malformed")
  for (t <- SfbShort) require(t.length == 14 && t.last == 192 &&
    t.zip(t.tail).forall(p => p._1 < p._2), "mp3 sfb short malformed")

  private val Pretab =
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0)
  require(Pretab.length == 22 && Pretab.forall(v => v >= 0 && v <= 3),
    "mp3 pretab malformed") // one value per long band; substitution #3

  private val Slen1 = Array(0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4)
  private val Slen2 = Array(0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3)

  // ---------------------------------------------------------------
  // Filterbank constants (all closed-form)
  // ---------------------------------------------------------------

  /** Polyphase prototype: documented substitution #1 (header).
    *
    * Design (all closed-form, derived at class init — zero embedded
    * digits): a square-root-raised-cosine lowpass sampled in frequency
    * (flat to (1-a)·pi/64, cosine taper to zero at (1+a)·pi/64 with
    * a = 0.7 — power-complementary at the band crossover pi/64, which
    * is the pseudo-QMF adjacent-band alias-cancellation condition),
    * inverse-FFT'd, centered, Hann-tapered to 512 taps, then folded
    * with the (-1)^(i/64) block signs the spec's 64-periodic matrixing
    * convention absorbs into its C/D windows. Measured properties
    * (pinned in Mp3Spec): matched analysis/synthesis reconstructs at
    * ~-36 dB (far below the format's own quantization noise) with
    * ~-68 dB stopband — the stopband is what matters: quantization
    * breaks the filterbank's exact alias cancellation, so inter-band
    * leakage resurfaces as ghost tones at reflected frequencies AT THE
    * STOPBAND LEVEL (a -23 dB short-prototype design audibly ghosted;
    * at -68 dB the ghosts sit far below the landmark peak picker's
    * floor). End-to-end chain delay: 481 + 576 = 1057 samples.
    */
  private val Proto: Array[Double] = {
    val n = 8192
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    val w0 = math.Pi / 64
    val alpha = 0.7
    val lo = (1 - alpha) * w0
    val hi = (1 + alpha) * w0
    var k = 0
    while (k <= n / 2) {
      val w = 2 * math.Pi * k / n
      val h =
        if (w <= lo) 1.0
        else if (w < hi) math.cos(math.Pi / 4 * (w - lo) / (alpha * w0))
        else 0.0
      re(k) = h
      if (k > 0 && k < n / 2) re(n - k) = h
      k += 1
    }
    AudioDsp.fft(re, im) // real-even spectrum: ifft = fft / n
    val out = new Array[Double](512)
    var i = 0
    while (i < 512) {
      val src = ((i - 256) % n + n) % n
      val hann = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / 511))
      val blockSign = if ((i / 64) % 2 == 1) -1.0 else 1.0
      out(i) = re(src) / n * hann * blockSign
      i += 1
    }
    out
  }

  /** end-to-end gain of the matched pair at the 481-sample structure
    * delay, measured at init on a deterministic LCG noise burst — the
    * synthesis normalizes by it so the chain is unity-gain.
    */
  // lazy: the calibration drives Analysis/Synth0, which need the
  // matrixing constants declared below this point
  private lazy val SynthGain: Double = {
    val n = 4096
    val x = new Array[Double](n)
    var seed = 0x2545f4914f6cdd1dL
    var i = 0
    while (i < n) { // xorshift: deterministic, platform-independent
      seed ^= seed << 13; seed ^= seed >>> 7; seed ^= seed << 17
      x(i) = (seed >> 11).toDouble / (1L << 52).toDouble
      i += 1
    }
    val an = new Analysis
    val sy = new Synth0
    val y = new Array[Double](n)
    val s = new Array[Double](32)
    var t = 0
    while (t < n / 32) {
      an.step(x, t * 32, s)
      sy.step(s, y, t * 32)
      t += 1
    }
    val delay = 481
    var dot = 0.0
    var ref2 = 0.0
    var j = 1400
    while (j < n - 200) {
      dot += y(j) * x(j - delay); ref2 += x(j - delay) * x(j - delay)
      j += 1
    }
    val a = dot / ref2
    // self-check: the design must actually reconstruct
    var err = 0.0
    j = 1400
    while (j < n - 200) {
      val e = y(j) - a * x(j - delay)
      err += e * e
      j += 1
    }
    require(a != 0 && math.sqrt(err / (a * a * ref2)) < 0.05,
      "mp3 filterbank design failed its reconstruction self-check")
    1.0 / a
  }
  /** synthesis matrixing N[i][k] = cos((16+i)(2k+1)pi/64) */
  private val Nmat: Array[Array[Double]] = Array.tabulate(64, 32)((i, k) =>
    math.cos((16 + i) * (2 * k + 1) * math.Pi / 64))
  /** analysis matrixing M[k][i] = cos((2k+1)(i-16)pi/64) (encoder) */
  private val Mmat: Array[Array[Double]] = Array.tabulate(32, 64)((k, i) =>
    math.cos((2 * k + 1) * (i - 16) * math.Pi / 64))

  private val Cos36: Array[Array[Double]] = Array.tabulate(36, 18)((i, k) =>
    math.cos(math.Pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1)))
  private val Cos12: Array[Array[Double]] = Array.tabulate(12, 6)((i, k) =>
    math.cos(math.Pi / 24.0 * (2 * i + 1 + 6) * (2 * k + 1)))
  private val Win36 =
    Array.tabulate(36)(i => math.sin(math.Pi * (i + 0.5) / 36))
  private val Win12 =
    Array.tabulate(12)(i => math.sin(math.Pi * (i + 0.5) / 12))
  private val WinStart = Array.tabulate(36) { i =>
    if (i < 18) Win36(i)
    else if (i < 24) 1.0
    else if (i < 30) math.sin(math.Pi * (i - 18 + 0.5) / 12)
    else 0.0
  }
  private val WinStop = Array.tabulate(36) { i =>
    if (i < 6) 0.0
    else if (i < 12) math.sin(math.Pi * (i - 6 + 0.5) / 12)
    else if (i < 18) 1.0
    else Win36(i)
  }

  // alias-reduction butterflies: spec ci constants, cs/ca derived
  private val AliasCi =
    Array(-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142, -0.0037)
  private val AliasCs = AliasCi.map(c => 1.0 / math.sqrt(1.0 + c * c))
  private val AliasCa = AliasCi.map(c => c / math.sqrt(1.0 + c * c))

  // ---------------------------------------------------------------
  // Bit reader (MSB-first) over an array with an absolute bit cursor
  // ---------------------------------------------------------------

  private final class BitReader(b: Array[Byte], var bitPos: Int) {
    def read(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteAt = bitPos >>> 3
        if (byteAt >= b.length)
          throw new IllegalStateException("mp3: past end of main data")
        v = (v << 1) | ((b(byteAt) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1
        i += 1
      }
      v
    }
    def peek(n: Int): Int = {
      val save = bitPos
      var v = 0
      var i = 0
      while (i < n) {
        val byteAt = bitPos >>> 3
        v = (v << 1) |
          (if (byteAt >= b.length) 0
           else (b(byteAt) >> (7 - (bitPos & 7))) & 1)
        bitPos += 1
        i += 1
      }
      bitPos = save
      v
    }
  }

  // ---------------------------------------------------------------
  // Side info
  // ---------------------------------------------------------------

  private final case class GranuleInfo(
      part23Length: Int,
      bigValues: Int,
      globalGain: Int,
      scalefacCompress: Int,
      windowSwitching: Boolean,
      blockType: Int,
      mixedBlock: Boolean,
      tableSelect: Array[Int],
      subblockGain: Array[Int],
      region0Count: Int,
      region1Count: Int,
      preflag: Int,
      scalefacScale: Int,
      count1Table: Int)

  private final case class SideInfo(
      mainDataBegin: Int,
      scfsi: Array[Array[Int]],           // [ch][4]
      granules: Array[Array[GranuleInfo]]) // [gr][ch]

  private def readSideInfo(r: BitReader, channels: Int): SideInfo = {
    val mainDataBegin = r.read(9)
    r.read(if (channels == 1) 5 else 3) // private bits
    val scfsi = Array.tabulate(channels, 4)((_, _) => r.read(1))
    val granules = Array.tabulate(2, channels) { (_, _) =>
      val part23 = r.read(12)
      val bigValues = r.read(9)
      val globalGain = r.read(8)
      val sfCompress = r.read(4)
      val wsf = r.read(1) == 1
      var blockType = 0
      var mixed = false
      val tableSelect = new Array[Int](3)
      val subblockGain = new Array[Int](3)
      var r0 = 0; var r1 = 0
      if (wsf) {
        blockType = r.read(2)
        mixed = r.read(1) == 1
        tableSelect(0) = r.read(5); tableSelect(1) = r.read(5)
        subblockGain(0) = r.read(3); subblockGain(1) = r.read(3)
        subblockGain(2) = r.read(3)
        // implicit regions (spec): bt2 pure-short -> boundary 36 lines,
        // start/stop/mixed -> 54; no region2
        r0 = -1; r1 = -1
      } else {
        tableSelect(0) = r.read(5); tableSelect(1) = r.read(5)
        tableSelect(2) = r.read(5)
        r0 = r.read(4); r1 = r.read(3)
      }
      val preflag = r.read(1)
      val sfScale = r.read(1)
      val c1t = r.read(1)
      GranuleInfo(part23, bigValues, globalGain, sfCompress, wsf, blockType,
        mixed, tableSelect, subblockGain, r0, r1, preflag, sfScale, c1t)
    }
    SideInfo(mainDataBegin, scfsi, granules)
  }

  // ---------------------------------------------------------------
  // Scalefactors
  // ---------------------------------------------------------------

  /** Long sf[0..20] (sfb21 carries none) or short sf[sfb*3+w]; returns
    * (long, short) arrays — mixed blocks fill both.
    */
  private def readScalefactors(r: BitReader, g: GranuleInfo,
      scfsi: Array[Int], prevLong: Array[Int], isGranule1: Boolean)
      : (Array[Int], Array[Int]) = {
    val slen1 = Slen1(g.scalefacCompress)
    val slen2 = Slen2(g.scalefacCompress)
    val long = new Array[Int](22)
    val short = new Array[Int](13 * 3)
    if (g.windowSwitching && g.blockType == 2) {
      if (g.mixedBlock) {
        var sfb = 0
        while (sfb < 8) { long(sfb) = r.read(slen1); sfb += 1 }
        sfb = 3
        while (sfb < 6) {
          var w = 0
          while (w < 3) { short(sfb * 3 + w) = r.read(slen1); w += 1 }
          sfb += 1
        }
        while (sfb < 12) {
          var w = 0
          while (w < 3) { short(sfb * 3 + w) = r.read(slen2); w += 1 }
          sfb += 1
        }
      } else {
        var sfb = 0
        while (sfb < 6) {
          var w = 0
          while (w < 3) { short(sfb * 3 + w) = r.read(slen1); w += 1 }
          sfb += 1
        }
        while (sfb < 12) {
          var w = 0
          while (w < 3) { short(sfb * 3 + w) = r.read(slen2); w += 1 }
          sfb += 1
        }
      }
    } else {
      // long blocks: scfsi groups {0-5, 6-10, 11-15, 16-20}
      val groups = Array((0, 6, slen1), (6, 11, slen1),
        (11, 16, slen2), (16, 21, slen2))
      var gi = 0
      while (gi < 4) {
        val (from, until, slen) = groups(gi)
        val reuse = isGranule1 && scfsi(gi) == 1
        var sfb = from
        while (sfb < until) {
          long(sfb) = if (reuse) prevLong(sfb) else r.read(slen)
          sfb += 1
        }
        gi += 1
      }
    }
    (long, short)
  }

  // ---------------------------------------------------------------
  // Huffman spectrum decode
  // ---------------------------------------------------------------

  /** Decodes one granule-channel's 576 quantized values; returns null
    * when the granule selects an unembedded table (documented boundary).
    */
  private def readSpectrum(r: BitReader, g: GranuleInfo, srIdx: Int,
      granuleEndBit: Int): Array[Int] = {
    val is = new Array[Int](576)
    val bigLines = math.min(576, g.bigValues * 2)
    // region boundaries (spec: implicit 36/54 under window switching)
    val (b1, b2) =
      if (g.windowSwitching) {
        val r1 = if (g.blockType == 2 && !g.mixedBlock) 36 else 54
        (math.min(r1, bigLines), bigLines)
      } else {
        val l = SfbLong(srIdx)
        val i1 = math.min(g.region0Count + 1, 22)
        val i2 = math.min(g.region0Count + 1 + g.region1Count + 1, 22)
        (math.min(l(i1), bigLines), math.min(l(i2), bigLines))
      }
    var line = 0
    var region = 0
    while (line < bigLines) {
      val bound = if (line < b1) b1 else if (line < b2) b2 else bigLines
      region = if (line < b1) 0 else if (line < b2) 1 else 2
      val tab = pairTable(g.tableSelect(region)) match {
        case Some(t) => t
        case None    => return null
      }
      while (line < bound) {
        if (tab == null) { // table 0: the region is all zero
          is(line) = 0; is(line + 1) = 0
        } else {
          val hit = tab.lut(r.peek(tab.maxLen))
          val sym = hit >>> 5
          r.bitPos += (hit & 31)
          var x = sym / tab.ny
          var y = sym % tab.ny
          // (embedded tables carry no ESC/linbits: max value 2)
          if (x != 0 && r.read(1) == 1) x = -x
          if (y != 0 && r.read(1) == 1) y = -y
          is(line) = x; is(line + 1) = y
        }
        line += 2
      }
    }
    // count1 region: quads until the part2_3 bit budget is consumed
    val quad = if (g.count1Table == 0) Count1A else Count1B
    while (r.bitPos < granuleEndBit && line + 3 < 576) {
      val hit = quad.lut(r.peek(quad.maxLen))
      val sym = hit >>> 5
      r.bitPos += (hit & 31)
      var k = 0
      while (k < 4) {
        var v = (sym >> (3 - k)) & 1
        if (v != 0 && r.read(1) == 1) v = -v
        is(line + k) = v
        k += 1
      }
      if (r.bitPos > granuleEndBit) { // partial quad past budget: void
        var k2 = 0
        while (k2 < 4) { is(line + k2) = 0; k2 += 1 }
      }
      line += 4
    }
    is
  }

  // ---------------------------------------------------------------
  // Requantize + short-block reorder
  // ---------------------------------------------------------------

  private def pow43(v: Int): Double = {
    val a = math.abs(v).toDouble
    val m = math.pow(a, 4.0 / 3.0)
    if (v < 0) -m else m
  }

  private def requantize(is: Array[Int], g: GranuleInfo, srIdx: Int,
      sfLong: Array[Int], sfShort: Array[Int]): Array[Double] = {
    val xr = new Array[Double](576)
    val sfm = 0.5 * (g.scalefacScale + 1)
    val base = (g.globalGain - 210) / 4.0
    if (g.windowSwitching && g.blockType == 2 && !g.mixedBlock) {
      // bitstream order for pure-short granules is sfb-major, then
      // window, then line-within-band; reorder() maps to IMDCT order
      val sb = SfbShort(srIdx)
      var idx = 0
      var sfb = 0
      while (sfb < 13) {
        val width = sb(sfb + 1) - sb(sfb)
        var w = 0
        while (w < 3) {
          val sf = if (sfb < 12) sfShort(sfb * 3 + w) else 0
          val gain = math.pow(2.0,
            base - 2.0 * g.subblockGain(w) - sfm * sf)
          var k = 0
          while (k < width) {
            xr(idx) = pow43(is(idx)) * gain
            idx += 1
            k += 1
          }
          w += 1
        }
        sfb += 1
      }
    } else if (g.windowSwitching && g.blockType == 2 && g.mixedBlock) {
      // mixed: first 36 lines long (sfb 0..7), rest short from sfb 3
      val lb = SfbLong(srIdx)
      var idx = 0
      var sfb = 0
      while (sfb < 8 && idx < 36) {
        val gain = math.pow(2.0, base -
          sfm * (sfLong(sfb) + g.preflag * Pretab(sfb)))
        while (idx < lb(sfb + 1) && idx < 36) {
          xr(idx) = pow43(is(idx)) * gain
          idx += 1
        }
        sfb += 1
      }
      val sb = SfbShort(srIdx)
      sfb = 3
      while (sfb < 13) {
        val width = sb(sfb + 1) - sb(sfb)
        var w = 0
        while (w < 3) {
          val sf = if (sfb < 12) sfShort(sfb * 3 + w) else 0
          val gain = math.pow(2.0,
            base - 2.0 * g.subblockGain(w) - sfm * sf)
          var k = 0
          while (k < width && idx < 576) {
            xr(idx) = pow43(is(idx)) * gain
            idx += 1
            k += 1
          }
          w += 1
        }
        sfb += 1
      }
    } else {
      val lb = SfbLong(srIdx)
      var sfb = 0
      var idx = 0
      while (sfb < 22) {
        val sf = if (sfb < 21) sfLong(sfb) else 0
        val pre = if (sfb < 21) Pretab(sfb) else 0
        val gain = math.pow(2.0, base - sfm * (sf + g.preflag * pre))
        while (idx < lb(sfb + 1)) {
          xr(idx) = pow43(is(idx)) * gain
          idx += 1
        }
        sfb += 1
      }
    }
    xr
  }

  /** Short-block reorder: bitstream (sfb, window, line) order into the
    * IMDCT's subband order — within each 18-line subband group,
    * coefficient k of window w lands at 3k + w.
    */
  private def reorder(xr: Array[Double], g: GranuleInfo,
      srIdx: Int): Array[Double] = {
    if (!(g.windowSwitching && g.blockType == 2)) return xr
    val out = new Array[Double](576)
    val sb = SfbShort(srIdx)
    val startSfb = if (g.mixedBlock) 3 else 0
    val startLine = if (g.mixedBlock) 36 else 0
    if (g.mixedBlock) System.arraycopy(xr, 0, out, 0, 36)
    var idx = startLine
    var sfb = startSfb
    while (sfb < 13) {
      val w0 = sb(sfb); val width = sb(sfb + 1) - w0
      var w = 0
      while (w < 3) {
        var k = 0
        while (k < width) {
          val freq = 3 * (w0 + k) + w
          if (freq < 576 && idx < 576) out(freq) = xr(idx)
          idx += 1
          k += 1
        }
        w += 1
      }
      sfb += 1
    }
    out
  }

  // ---------------------------------------------------------------
  // Alias reduction, IMDCT, frequency inversion
  // ---------------------------------------------------------------

  private def aliasReduce(xr: Array[Double], g: GranuleInfo): Unit = {
    if (g.windowSwitching && g.blockType == 2 && !g.mixedBlock) return
    val sbLimit =
      if (g.windowSwitching && g.blockType == 2 && g.mixedBlock) 1 else 31
    var sb = 0
    while (sb < sbLimit) {
      val off = 18 * sb
      var i = 0
      while (i < 8) {
        val a = xr(off + 17 - i)
        val b = xr(off + 18 + i)
        xr(off + 17 - i) = a * AliasCs(i) - b * AliasCa(i)
        xr(off + 18 + i) = b * AliasCs(i) + a * AliasCa(i)
        i += 1
      }
      sb += 1
    }
  }

  /** encoder-side inverse butterflies (transpose of the rotation) */
  private def aliasEncode(xr: Array[Double]): Unit = {
    var sb = 0
    while (sb < 31) {
      val off = 18 * sb
      var i = 0
      while (i < 8) {
        val a = xr(off + 17 - i)
        val b = xr(off + 18 + i)
        xr(off + 17 - i) = a * AliasCs(i) + b * AliasCa(i)
        xr(off + 18 + i) = b * AliasCs(i) - a * AliasCa(i)
        i += 1
      }
      sb += 1
    }
  }

  /** IMDCT of one subband's 18 coefficients into 36 windowed samples. */
  private def imdctBlock(x: Array[Double], off: Int, blockType: Int,
      longWindow: Boolean): Array[Double] = {
    val out = new Array[Double](36)
    if (blockType == 2 && !longWindow) {
      var w = 0
      while (w < 3) {
        var i = 0
        while (i < 12) {
          var s = 0.0
          var k = 0
          while (k < 6) { s += x(off + 3 * k + w) * Cos12(i)(k); k += 1 }
          out(6 + 6 * w + i) += s * Win12(i)
          i += 1
        }
        w += 1
      }
    } else {
      val win = blockType match {
        case 1 => WinStart
        case 3 => WinStop
        case _ => Win36
      }
      var i = 0
      while (i < 36) {
        var s = 0.0
        var k = 0
        while (k < 18) { s += x(off + k) * Cos36(i)(k); k += 1 }
        out(i) = s * win(i)
        i += 1
      }
    }
    out
  }

  // ---------------------------------------------------------------
  // Polyphase synthesis (spec V-fifo structure, matched prototype)
  // ---------------------------------------------------------------

  /** spec V-fifo synthesis structure with an explicit gain (gain 1 for
    * the init-time calibration, [[SynthGain]] in the decoder).
    */
  private final class Synth0(gain: Double = 1.0) {
    private val v = new Array[Double](1024)
    /** 32 subband samples in, 32 PCM samples out. */
    def step(s: Array[Double], out: Array[Double], outOff: Int): Unit = {
      System.arraycopy(v, 0, v, 64, 960)
      var i = 0
      while (i < 64) {
        var acc = 0.0
        val n = Nmat(i)
        var k = 0
        while (k < 32) { acc += n(k) * s(k); k += 1 }
        v(i) = acc
        i += 1
      }
      // U stride + window over the full 512-tap prototype:
      // U[64q+j] = V[128q+j], U[64q+32+j] = V[128q+96+j]
      var j = 0
      while (j < 32) {
        var acc = 0.0
        var q = 0
        while (q < 8) {
          acc += Proto(64 * q + j) * v(128 * q + j) +
            Proto(64 * q + 32 + j) * v(128 * q + 96 + j)
          q += 1
        }
        out(outOff + j) = gain * acc
        j += 1
      }
    }
  }
  private def newSynth(): Synth0 = new Synth0(SynthGain)

  // ---------------------------------------------------------------
  // Decoder
  // ---------------------------------------------------------------

  /** Decode an MPEG-1 Layer III stream to (monoMixedSamples,
    * sampleRate). None for anything outside the documented surface
    * (MPEG-2/2.5, unembedded Huffman tables, intensity stereo) or
    * structurally broken — conservative and total, like every decode
    * path in this engine.
    */
  /** MEASURED coverage of the embedded Huffman subset (documented
    * substitution #2): walk the frame headers + side info and count,
    * per stream, (framesTotal, framesDecodable) — the data-card number
    * that turns "the subset covers this corpus" from an assumption
    * into a measurement. A frame counts decodable when its side info
    * avoids every boundary the sample decoder refuses on: intensity
    * stereo, the forbidden windowSwitching+blockType-0 combination,
    * and any big-values region selecting an unembedded pair table
    * (bigValues == 0 never consults a pair table, so selects are then
    * irrelevant). Slightly conservative: a frame whose TRAILING region
    * is empty but declares an unembedded select still counts
    * undecodable — declared selects are what's measured. None when no
    * frame parses (not an MP3 / pure-container bytes). Side info only:
    * no Huffman work, no requantize — O(frames) header arithmetic.
    */
  def frameCoverage(b: Array[Byte]): Option[(Int, Int)] = try {
    val start = firstFrame(b)
    if (start < 0) return None
    var off = start
    var frames = 0
    var good = 0
    var rate0 = -1
    var nch0 = -1
    while (off + 4 <= b.length) {
      header(b, off) match {
        case None =>
          return if (frames > 0) Some((frames, good)) else None
        case Some((br, rate, channels, mode, modeExt, padding, crc, _)) =>
          if (frames == 0) { rate0 = rate; nch0 = channels }
          else if (rate != rate0 || channels != nch0)
            return Some((frames, good)) // mid-stream switch ends the walk
          val fl = frameBytes(br, rate, padding)
          if (off + fl > b.length)
            return if (frames > 0) Some((frames, good)) else None
          var p = off + 4
          if (crc) p += 2
          val sideBytes = if (channels == 1) 17 else 32
          var ok = p + sideBytes <= off + fl
          if (ok && mode == 1 && (modeExt & 0x1) != 0) ok = false
          if (ok) {
            val side = readSideInfo(new BitReader(b, p * 8), channels)
            var gr = 0
            while (ok && gr < 2) {
              var ch = 0
              while (ok && ch < channels) {
                val g = side.granules(gr)(ch)
                if (g.windowSwitching && g.blockType == 0) ok = false
                else if (g.bigValues > 0) {
                  val nRegions = if (g.windowSwitching) 2 else 3
                  var i = 0
                  while (ok && i < nRegions) {
                    if (pairTable(g.tableSelect(i)).isEmpty) ok = false
                    i += 1
                  }
                }
                ch += 1
              }
              gr += 1
            }
          }
          frames += 1
          if (ok) good += 1
          off += fl
      }
    }
    if (frames > 0) Some((frames, good)) else None
  } catch { case scala.util.control.NonFatal(_) => None }

  def decode(b: Array[Byte]): Option[(Array[Double], Int)] = try {
    val start = firstFrame(b)
    if (start < 0) return None
    var off = start
    var sampleRate = 0
    var nch = 0
    // reservoir of main-data bytes (grows; offsets tracked absolutely;
    // a primitive growable buffer — no per-byte boxing on the hot path)
    var reservoir = new Array[Byte](1 << 16)
    var reservoirLen = 0
    def reservoirAdd(src: Array[Byte], srcOff: Int, n: Int): Unit = {
      if (reservoirLen + n > reservoir.length) {
        val grown = new Array[Byte](
          math.max(reservoir.length * 2, reservoirLen + n))
        System.arraycopy(reservoir, 0, grown, 0, reservoirLen)
        reservoir = grown
      }
      System.arraycopy(src, srcOff, reservoir, reservoirLen, n)
      reservoirLen += n
    }
    val out = new scala.collection.mutable.ArrayBuffer[Double](1 << 16)
    val overlap = Array.ofDim[Double](2, 32, 18)
    val synth = Array.fill(2)(newSynth())
    val prevSfLong = Array.fill(2)(new Array[Int](22))
    var frames = 0
    while (off + 4 <= b.length) {
      header(b, off) match {
        case None =>
          // trailing junk / ID3v1 after >=1 good frame ends the walk;
          // garbage before any frame is a non-file
          return if (frames > 0) Some((out.toArray, sampleRate)) else None
        case Some((br, rate, channels, mode, modeExt, padding, crc, srIdx)) =>
          if (frames == 0) { sampleRate = rate; nch = channels }
          else if (rate != sampleRate || channels != nch)
            return Some((out.toArray, sampleRate)) // mid-stream switch
          val fl = frameBytes(br, rate, padding)
          if (off + fl > b.length)
            return if (frames > 0) Some((out.toArray, sampleRate)) else None
          var p = off + 4
          if (crc) p += 2
          val sideBytes = if (channels == 1) 17 else 32
          if (p + sideBytes > off + fl) return None
          val side = readSideInfo(new BitReader(b, p * 8), channels)
          p += sideBytes
          val mainLen = off + fl - p
          val resBase = reservoirLen
          reservoirAdd(b, p, mainLen)
          // main data for THIS frame starts main_data_begin bytes back
          val mdStart = resBase - side.mainDataBegin
          if (mdStart < 0) {
            // not enough reservoir yet (stream cut-in): skip frame
            off += fl
            frames += 1
            out ++= new Array[Double](1152) // keep time alignment
          } else {
            val res = java.util.Arrays.copyOfRange(
              reservoir, mdStart, reservoirLen)
            val r = new BitReader(res, 0)
            val msStereo = mode == 1 && (modeExt & 0x2) != 0
            if (mode == 1 && (modeExt & 0x1) != 0)
              return None // intensity stereo: documented boundary
            val pcm = Array.ofDim[Double](nch, 1152)
            var gr = 0
            while (gr < 2) {
              val xrCh = new Array[Array[Double]](nch)
              var ch = 0
              while (ch < nch) {
                val g = side.granules(gr)(ch)
                if (g.windowSwitching && g.blockType == 0)
                  return None // forbidden combination
                val granuleStart = r.bitPos
                val granuleEnd = granuleStart + g.part23Length
                val (sfL, sfS) = readScalefactors(r, g, side.scfsi(ch),
                  prevSfLong(ch), gr == 1)
                if (!(g.windowSwitching && g.blockType == 2))
                  System.arraycopy(sfL, 0, prevSfLong(ch), 0, 22)
                val is = readSpectrum(r, g, srIdx, granuleEnd)
                if (is == null) return None // unembedded huffman table
                r.bitPos = granuleEnd // skip stuffing
                val xr0 = requantize(is, g, srIdx, sfL, sfS)
                xrCh(ch) = reorder(xr0, g, srIdx)
                ch += 1
              }
              if (msStereo && nch == 2) {
                val inv = 1.0 / math.sqrt(2.0)
                var i = 0
                while (i < 576) {
                  val m = xrCh(0)(i); val s = xrCh(1)(i)
                  xrCh(0)(i) = (m + s) * inv
                  xrCh(1)(i) = (m - s) * inv
                  i += 1
                }
              }
              ch = 0
              while (ch < nch) {
                val g = side.granules(gr)(ch)
                val xr = xrCh(ch)
                aliasReduce(xr, g)
                // per-subband IMDCT + overlap-add + frequency inversion
                val sTime = Array.ofDim[Double](18, 32)
                var sb = 0
                while (sb < 32) {
                  val longWin = g.mixedBlock && sb < 2
                  val bt =
                    if (!g.windowSwitching) 0
                    else if (longWin) 0
                    else g.blockType
                  val y = imdctBlock(xr, sb * 18, bt, longWin)
                  var i = 0
                  while (i < 18) {
                    sTime(i)(sb) = y(i) + overlap(ch)(sb)(i)
                    overlap(ch)(sb)(i) = y(18 + i)
                    i += 1
                  }
                  sb += 1
                }
                // frequency inversion: odd subbands, odd time samples
                var i = 1
                while (i < 18) {
                  var sb2 = 1
                  while (sb2 < 32) {
                    sTime(i)(sb2) = -sTime(i)(sb2)
                    sb2 += 2
                  }
                  i += 2
                }
                var t2 = 0
                while (t2 < 18) {
                  synth(ch).step(sTime(t2), pcm(ch), gr * 576 + t2 * 32)
                  t2 += 1
                }
                ch += 1
              }
              gr += 1
            }
            var i = 0
            while (i < 1152) {
              var acc = 0.0
              var ch = 0
              while (ch < nch) { acc += pcm(ch)(i); ch += 1 }
              out += acc / nch
              i += 1
            }
            off += fl
            frames += 1
          }
      }
    }
    if (frames > 0) Some((out.toArray, sampleRate)) else None
  } catch { case scala.util.control.NonFatal(_) => None }

  /** (channels, sampleRate, durationSec, bitrateKbps) without decoding
    * samples — None when the first frame is not MPEG-1 Layer III.
    */
  def geometry(b: Array[Byte]): Option[(Int, Int, Double, Int)] = {
    val start = firstFrame(b)
    if (start < 0) return None
    header(b, start).map { case (br, rate, ch, _, _, _, _, _) =>
      // frame-count walk (CBR or VBR): sum frames until sync loss
      var off = start
      var frames = 0L
      var brSum = 0L
      var cont = true
      while (cont && off + 4 <= b.length) {
        header(b, off) match {
          case Some((fbr, frate, _, _, _, pad, _, _)) if frate == rate =>
            frames += 1; brSum += fbr
            off += frameBytes(fbr, rate, pad)
          case _ => cont = false
        }
      }
      (ch, rate, frames * 1152.0 / rate,
        if (frames == 0) br else (brSum / frames).toInt)
    }
  }

  // ---------------------------------------------------------------
  // Fixture encoder (CBR, embedded-table subset, long or all-short)
  // ---------------------------------------------------------------

  private final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    var bitCount: Int = 0
    def write(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1)
        nbits += 1
        bitCount += 1
        if (nbits == 8) { buf.write(cur); cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def padToByte(): Unit = if (nbits != 0) write(0, 8 - nbits)
    def toBytes: Array[Byte] = { padToByte(); buf.toByteArray }
  }

  /** Streaming PQMF analysis matched to [[Synth]] (the encoder half of
    * documented substitution #1).
    */
  private final class Analysis {
    private val x = new Array[Double](512)
    private val y = new Array[Double](64)
    def step(in: Array[Double], inOff: Int, s: Array[Double]): Unit = {
      System.arraycopy(x, 0, x, 32, 480)
      var i = 0
      while (i < 32) { x(i) = in(inOff + 31 - i); i += 1 }
      // window + partial sums over the full 512-tap prototype
      i = 0
      while (i < 64) {
        var acc = 0.0
        var q = 0
        while (q < 8) { acc += Proto(i + 64 * q) * x(i + 64 * q); q += 1 }
        y(i) = acc
        i += 1
      }
      var k = 0
      while (k < 32) {
        var acc = 0.0
        val m = Mmat(k)
        var j = 0
        while (j < 64) { acc += m(j) * y(j); j += 1 }
        s(k) = acc
        k += 1
      }
    }
  }

  /** big_values Huffman cost+emit with table 2 (values in [-2, 2]). */
  private def emitPairs(w: BitWriter, v: Array[Int], until: Int): Unit = {
    var i = 0
    while (i < until) {
      val x = v(i); val y = v(i + 1)
      val sym = math.abs(x) * 3 + math.abs(y)
      // inline table 2 codes (validated at init through Tab2)
      val code = Array(1, 2, 1, 3, 1, 1, 3, 2, 0)(sym)
      val len = Array(1, 3, 6, 3, 3, 5, 5, 5, 6)(sym)
      w.write(code, len)
      if (x != 0) w.write(if (x < 0) 1 else 0, 1)
      if (y != 0) w.write(if (y < 0) 1 else 0, 1)
      i += 2
    }
  }

  private def pairBits(v: Array[Int], until: Int): Int = {
    val lens = Array(1, 3, 6, 3, 3, 5, 5, 5, 6)
    var bits = 0
    var i = 0
    while (i < until) {
      bits += lens(math.abs(v(i)) * 3 + math.abs(v(i + 1)))
      if (v(i) != 0) bits += 1
      if (v(i + 1) != 0) bits += 1
      i += 2
    }
    bits
  }

  /** Encode PCM ([-1,1], mono or L/R-interleaved stereo) as MPEG-1
    * Layer III. `rate` must be 32000/44100/48000. Stereo uses
    * mid/side (mode_extension 2) so the decoder's MS path is
    * round-trip covered. `forceShort` emits every granule as
    * block_type 2 (pure short) to cover the short-window path.
    */
  def encode(pcm: Array[Double], rate: Int, channels: Int = 1,
      bitrateKbps: Int = 160, forceShort: Boolean = false): Array[Byte] = {
    require(channels == 1 || channels == 2, s"channels $channels")
    val srIdx = RateV1.indexOf(rate)
    require(srIdx >= 0 && srIdx < 3, s"MPEG-1 rate required, got $rate")
    val brIdx = BitrateV1L3.indexOf(bitrateKbps)
    require(brIdx > 0, s"bitrate $bitrateKbps not in ${BitrateV1L3.toSeq}")
    val nFrames = math.max(1,
      (pcm.length / channels + 1151) / 1152)
    val nSamp = nFrames * 1152
    val chan = Array.ofDim[Double](channels, nSamp)
    var i = 0
    while (i < pcm.length) {
      chan(i % channels)(i / channels) = pcm(i)
      i += 1
    }
    // MS matrix for stereo (mode_ext = 2 -> decoder inverts)
    val enc: Array[Array[Double]] =
      if (channels == 2) {
        val inv = 1.0 / math.sqrt(2.0)
        Array(
          Array.tabulate(nSamp)(j => (chan(0)(j) + chan(1)(j)) * inv),
          Array.tabulate(nSamp)(j => (chan(0)(j) - chan(1)(j)) * inv))
      } else chan
    // full-stream PQMF analysis, then per-granule MDCT
    val nBlocks = nSamp / 32
    val sub = Array.ofDim[Double](channels, nBlocks, 32)
    for (ch <- 0 until channels) {
      val an = new Analysis
      var t = 0
      while (t < nBlocks) {
        an.step(enc(ch), t * 32, sub(ch)(t))
        t += 1
      }
    }
    // encoder-side frequency inversion (mirror of the decoder's)
    for (ch <- 0 until channels; t <- 1 until nBlocks by 2;
         sb <- 1 until 32 by 2)
      sub(ch)(t)(sb) = -sub(ch)(t)(sb)
    val nGran = nBlocks / 18
    // forward MDCT: long 1/9, short 1/3 per window (TDAC gains N/4)
    val spec = Array.ofDim[Double](channels, nGran, 576)
    for (ch <- 0 until channels) {
      val prev = Array.ofDim[Double](32, 18)
      var g = 0
      while (g < nGran) {
        val cur = Array.ofDim[Double](32, 18)
        for (sb <- 0 until 32; k <- 0 until 18)
          cur(sb)(k) = sub(ch)(g * 18 + k)(sb)
        var sb = 0
        while (sb < 32) {
          val x36 = new Array[Double](36)
          var k = 0
          while (k < 18) {
            x36(k) = prev(sb)(k); x36(18 + k) = cur(sb)(k); k += 1
          }
          if (forceShort) {
            // three MDCT-12 windows at offsets 6/12/18; coefficient k
            // of window w lands at freq 3k+w of the subband (the
            // decoder's reorder() inverse)
            var w = 0
            while (w < 3) {
              var kk = 0
              while (kk < 6) {
                var acc = 0.0
                var ii = 0
                while (ii < 12) {
                  acc += x36(6 + 6 * w + ii) * Win12(ii) * Cos12(ii)(kk)
                  ii += 1
                }
                spec(ch)(g)(sb * 18 + 3 * kk + w) = acc / 3.0
                kk += 1
              }
              w += 1
            }
          } else {
            var kk = 0
            while (kk < 18) {
              var acc = 0.0
              var ii = 0
              while (ii < 36) {
                acc += x36(ii) * Win36(ii) * Cos36(ii)(kk)
                ii += 1
              }
              spec(ch)(g)(sb * 18 + kk) = acc / 9.0
              kk += 1
            }
          }
          sb += 1
        }
        prev.indices.foreach(s2 =>
          System.arraycopy(cur(s2), 0, prev(s2), 0, 18))
        g += 1
      }
      // undo the spectral interleave the decoder's reorder applies:
      // nothing to do for long blocks; for short the emit order is
      // (sfb, window, line) — build it from the 3k+w layout per granule
      if (forceShort) {
        val sb2 = SfbShort(srIdx)
        var g2 = 0
        while (g2 < nGran) {
          val src = spec(ch)(g2)
          val emit = new Array[Double](576)
          var idx = 0
          var sfb = 0
          while (sfb < 13) {
            val w0 = sb2(sfb); val width = sb2(sfb + 1) - w0
            var w = 0
            while (w < 3) {
              var k = 0
              while (k < width) {
                emit(idx) = src(3 * (w0 + k) + w)
                idx += 1; k += 1
              }
              w += 1
            }
            sfb += 1
          }
          System.arraycopy(emit, 0, spec(ch)(g2), 0, 576)
          g2 += 1
        }
      } else {
        var g2 = 0
        while (g2 < nGran) { aliasEncode(spec(ch)(g2)); g2 += 1 }
      }
    }
    // frame packing
    val frameLen = frameBytes(bitrateKbps, rate, 0)
    val sideBytes = if (channels == 1) 17 else 32
    val mainBitsPerFrame = (frameLen - 4 - sideBytes) * 8
    val outBytes = new java.io.ByteArrayOutputStream()
    var fr = 0
    while (fr < nFrames) {
      // quantize both granules (x channels), search global_gain to fit
      val quant = Array.ofDim[Array[Int]](2, channels)
      val ggs = Array.ofDim[Int](2, channels)
      val bigVals = Array.ofDim[Int](2, channels)
      val partBits = Array.ofDim[Int](2, channels)
      val budget = mainBitsPerFrame / (2 * channels)
      for (g <- 0 until 2; ch <- 0 until channels) {
        val xr = spec(ch)(fr * 2 + g)
        var maxA = 0.0
        var j = 0
        while (j < 576) {
          val a = math.abs(xr(j)); if (a > maxA) maxA = a; j += 1
        }
        var gg =
          if (maxA <= 0) 210
          else math.min(255, math.max(0, math.ceil(210 +
            4.0 * (math.log(maxA / math.pow(2.0, 4.0 / 3.0)) /
              math.log(2.0))).toInt))
        var done = false
        var v: Array[Int] = null
        var lastNz = -1
        var bits = 0
        while (!done) {
          val scale = math.pow(2.0, (gg - 210) / 4.0)
          v = new Array[Int](576)
          lastNz = -1
          var k = 0
          while (k < 576) {
            val q = math.round(
              math.pow(math.abs(xr(k)) / scale, 0.75)).toInt
            val qc = math.min(2, q)
            v(k) = if (xr(k) < 0) -qc else qc
            if (qc != 0) lastNz = k
            k += 1
          }
          val nLines = math.min(576, ((lastNz + 2) / 2) * 2)
          bits = pairBits(v, nLines)
          if (bits <= math.min(budget, 4095) || gg >= 255) done = true
          else gg = math.min(255, gg + 4)
        }
        val nLines = math.min(576, ((lastNz + 2) / 2) * 2)
        quant(g)(ch) = v
        ggs(g)(ch) = gg
        bigVals(g)(ch) = math.min(288, nLines / 2)
        partBits(g)(ch) = pairBits(v, bigVals(g)(ch) * 2)
      }
      // header
      val w = new BitWriter
      w.write(0x7ff, 11)
      w.write(3, 2) // MPEG-1
      w.write(1, 2) // Layer III
      w.write(1, 1) // no CRC
      w.write(brIdx, 4)
      w.write(srIdx, 2)
      w.write(0, 1) // padding
      w.write(0, 1) // private
      w.write(if (channels == 1) 3 else 1, 2) // mono / joint stereo
      w.write(if (channels == 1) 0 else 2, 2) // mode_ext: MS on
      w.write(0, 1); w.write(0, 1) // copyright/original
      w.write(0, 2) // emphasis
      // side info
      w.write(0, 9) // main_data_begin = 0 (no reservoir)
      w.write(0, if (channels == 1) 5 else 3)
      for (_ <- 0 until channels) w.write(0, 4) // scfsi
      for (g <- 0 until 2; ch <- 0 until channels) {
        w.write(partBits(g)(ch), 12)
        w.write(bigVals(g)(ch), 9)
        w.write(ggs(g)(ch), 8)
        w.write(0, 4) // scalefac_compress = 0
        if (forceShort) {
          w.write(1, 1) // window_switching
          w.write(2, 2) // block_type 2
          w.write(0, 1) // not mixed
          w.write(2, 5); w.write(2, 5) // table_select x2
          w.write(0, 3); w.write(0, 3); w.write(0, 3) // subblock_gain
        } else {
          w.write(0, 1) // no window switching
          w.write(2, 5); w.write(2, 5); w.write(2, 5) // table 2 x3
          w.write(15, 4) // region0_count (clamped by decoder)
          w.write(7, 3)  // region1_count
        }
        w.write(0, 1) // preflag
        w.write(0, 1) // scalefac_scale
        w.write(1, 1) // count1 table B (unused: count1 region empty)
      }
      // main data: scalefactors (0 bits at compress=0) + huffman
      for (g <- 0 until 2; ch <- 0 until channels)
        emitPairs(w, quant(g)(ch), bigVals(g)(ch) * 2)
      // stuff to the CBR frame length
      val bytes = w.toBytes
      require(bytes.length <= frameLen,
        s"mp3 encode: frame overflow ${bytes.length} > $frameLen")
      outBytes.write(bytes)
      var pad = bytes.length
      while (pad < frameLen) { outBytes.write(0); pad += 1 }
      fr += 1
    }
    outBytes.toByteArray
  }
}
