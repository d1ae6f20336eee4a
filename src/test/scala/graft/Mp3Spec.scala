package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ext.Mp3

/** MP3 codec: matched encoder/decoder round-trips (the FLAC/VP8L
  * fixture-encoder discipline), hostile-input totality, geometry.
  * Lossy tolerances follow the ADPCM precedent: signal-level SNR
  * bounds, not bit equality.
  */
class Mp3Spec extends AnyFunSuite {

  /** best-aligned SNR (dB) of got vs ref over a delay scan — the MP3
    * chain has a fixed 1057-sample latency (481 polyphase + 576 MDCT)
    * plus encoder padding; the landmark regime is shift-invariant so
    * the tests are too.
    */
  private def alignedSnr(ref: Array[Double], got: Array[Double],
      maxDelay: Int = 1400): (Int, Double) = {
    var best = (-1, Double.NegativeInfinity)
    val lo = math.max(2000, maxDelay + 100)
    val hi = math.min(ref.length, got.length) - 100
    require(hi - lo > 1000, s"signal too short: $lo..$hi")
    var d = 0
    while (d < maxDelay) {
      var se = 0.0; var sr = 0.0; var dot = 0.0
      var i = lo
      while (i < hi) {
        dot += got(i) * ref(i - d); sr += ref(i - d) * ref(i - d)
        i += 1
      }
      val a = if (sr > 0) dot / sr else 0.0
      i = lo
      while (i < hi) {
        val e = got(i) - a * ref(i - d)
        se += e * e
        i += 1
      }
      val snr =
        if (se <= 0) 300.0
        else 10.0 * math.log10(a * a * sr / se)
      if (snr > best._2) best = (d, snr)
      d += 1
    }
    best
  }

  private def tone(n: Int, freqs: Seq[Double], rate: Int,
      amp: Double = 0.5): Array[Double] =
    Array.tabulate(n)(i => freqs.map(f =>
      amp / freqs.size * math.sin(2 * math.Pi * f * i / rate)).sum)

  test("mono long-block round trip at all three MPEG-1 rates") {
    for (rate <- Seq(32000, 44100, 48000)) {
      val x = tone(1152 * 12, Seq(440.0, 1200.0, 3100.0), rate)
      val mp3 = Mp3.encode(x, rate)
      assert(Mp3.isMp3(mp3), s"own stream must sync at $rate")
      val (y, r) = Mp3.decode(mp3).get
      assert(r == rate)
      assert(y.length == 1152 * 12, s"got ${y.length}")
      // ~10.7 dB measured: the honest floor of the embedded-table
      // subset's {0,±1,±2} spectrum (landmarks are what the regime
      // needs, and they pair — see the landmark test below)
      val (d, snr) = alignedSnr(x, y)
      assert(snr > 8.0, s"rate $rate: snr $snr dB at delay $d")
    }
  }

  test("stereo mid/side round trip (decoder MS path is live)") {
    val rate = 32000
    val n = 1152 * 10
    val l = tone(n, Seq(500.0, 2000.0), rate)
    val rr = tone(n, Seq(700.0, 2600.0), rate)
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = rr(i) }
    val mp3 = Mp3.encode(inter, rate, channels = 2)
    val (y, r) = Mp3.decode(mp3).get
    assert(r == rate)
    val mix = Array.tabulate(n)(i => (l(i) + rr(i)) / 2)
    val (d, snr) = alignedSnr(mix, y)
    assert(snr > 9.0, s"stereo snr $snr dB at delay $d")
  }

  test("forced short-block round trip (decoder short-window path is live)") {
    val rate = 44100
    val x = tone(1152 * 10, Seq(880.0, 2500.0), rate)
    val mp3 = Mp3.encode(x, rate, forceShort = true)
    val (y, r) = Mp3.decode(mp3).get
    assert(r == rate)
    val (d, snr) = alignedSnr(x, y)
    assert(snr > 7.0, s"short-block snr $snr dB at delay $d")
  }

  test("geometry: duration from the frame walk, bitrate, channels") {
    val rate = 32000
    val x = tone(1152 * 8, Seq(440.0), rate)
    val mp3 = Mp3.encode(x, rate, bitrateKbps = 128)
    val (ch, r, dur, br) = Mp3.geometry(mp3).get
    assert(ch == 1 && r == rate && br == 128)
    assert(math.abs(dur - 8 * 1152.0 / rate) < 1e-9, s"dur $dur")
  }

  test("hostile inputs: totality, boundaries stay None") {
    assert(Mp3.decode(null).isEmpty)
    assert(Mp3.decode(Array.empty[Byte]).isEmpty)
    assert(Mp3.decode("not an mp3 stream at all".getBytes("UTF-8")).isEmpty)
    val rate = 32000
    val good = Mp3.encode(tone(1152 * 4, Seq(440.0), rate), rate)
    // truncation mid-frame: the completed frames still decode
    val cut = good.take(good.length - 100)
    val dec = Mp3.decode(cut)
    assert(dec.isDefined && dec.get._1.length == 1152 * 3,
      s"got ${dec.map(_._1.length)}")
    // trailing junk after the last frame is tolerated (ID3v1 class)
    val tail = good ++ "TAGgarbagegarbage".getBytes("UTF-8")
    assert(Mp3.decode(tail).get._1.length == 1152 * 4)
    // an MPEG-2 stream (version bits 10 on EVERY frame — one broken
    // header merely resyncs, which is correct) is outside the surface
    val v2 = good.clone()
    val flen = good.length / 4 // CBR: 4 equal frames
    for (k <- 0 until 4) v2(k * flen + 1) = (v2(k * flen + 1) & ~0x08).toByte
    assert(Mp3.decode(v2).isEmpty, "MPEG-2 LSF must stay a None boundary")
    // an unembedded huffman table select -> None, not garbage: patch
    // side info so granule 0 selects table 7 (valid per spec, not
    // embedded). table_select(0) sits 9+5+4+12+9+8+4+1 = 52 bits into
    // the side info for mono, i.e. bits 52..56 of byte offset 4.
    val patched = good.clone()
    // set the 5 table bits (52..56 within side info) to 7
    def setBit(bitInSide: Int, v: Int): Unit = {
      val abs = 4 * 8 + bitInSide
      val byteAt = abs / 8; val bit = 7 - (abs % 8)
      patched(byteAt) =
        ((patched(byteAt) & ~(1 << bit)) | ((v & 1) << bit)).toByte
    }
    val sel = 7
    for (k <- 0 until 5) setBit(52 + k, (sel >> (4 - k)) & 1)
    assert(Mp3.decode(patched).isEmpty,
      "unembedded huffman table must be a loud None boundary")
  }

  test("frameCoverage measures the subset, agreeing with decode's verdict") {
    val rate = 32000
    // graft-encoded: every frame inside the subset, count = ceil(n/1152)
    val good = Mp3.encode(tone(2304, Seq(440.0), rate), rate)
    assert(Mp3.frameCoverage(good).contains((2, 2)))
    assert(Mp3.decode(good).isDefined)
    // patch frame 0's granule-0 table_select to a wild table: coverage
    // drops exactly that frame while decode refuses the whole stream
    val patched = good.clone()
    val flen = good.length / 2
    def setBit(frameOff: Int, bitInSide: Int, v: Int): Unit = {
      val abs = (frameOff + 4) * 8 + bitInSide
      val byteAt = abs / 8; val bit = 7 - (abs % 8)
      patched(byteAt) =
        ((patched(byteAt) & ~(1 << bit)) | ((v & 1) << bit)).toByte
    }
    // big_values (bits 30..38) nonzero so the select is live, then
    // table_select(0) (bits 52..56) = 13
    for (k <- 0 until 9) setBit(0, 30 + k, (9 >> (8 - k)) & 1)
    for (k <- 0 until 5) setBit(0, 52 + k, (13 >> (4 - k)) & 1)
    assert(Mp3.frameCoverage(patched).contains((2, 1)),
      s"got ${Mp3.frameCoverage(patched)}")
    assert(Mp3.decode(patched).isEmpty,
      "decode stays a loud whole-stream refusal on a wild table")
    // second frame patched too: zero coverage
    for (k <- 0 until 9) setBit(flen, 30 + k, (9 >> (8 - k)) & 1)
    for (k <- 0 until 5) setBit(flen, 52 + k, (13 >> (4 - k)) & 1)
    assert(Mp3.frameCoverage(patched).contains((2, 0)))
    // the census-container torso (truncated single frame) measures None
    val torso = Array(0xff, 0xfb, 0x92, 0x40).map(_.toByte) ++
      new Array[Byte](400)
    assert(Mp3.frameCoverage(torso).isEmpty)
    assert(Mp3.frameCoverage(null).isEmpty &&
      Mp3.frameCoverage("junk".getBytes("UTF-8")).isEmpty)
  }

  test("landmarks: an MP3 re-encode pairs with its WAV master") {
    val rate = 32000
    def tones(k: Int) = (0 until 6).map(i => (400.0 + (k * 6 + i) * 45.0, 4096))
    val masterPcm = tones(0).flatMap { case (f, n) =>
      tone(n, Seq(f), rate, amp = 0.5)
    }.toArray
    val mp3 = Mp3.encode(masterPcm, rate)
    val (decoded, _) = Mp3.decode(mp3).get
    val p = graft.ext.AudioFingerprint.Params()
    val lmMaster = invokeLandmarks(masterPcm, p)
    val lmMp3 = invokeLandmarks(decoded, p)
    val shared = lmMaster.toSet.intersect(lmMp3.toSet).size
    assert(shared >= p.minShared,
      s"re-encode must share landmarks: $shared < ${p.minShared}")
    // and a DIFFERENT recording must not pair
    val otherPcm = tones(5).flatMap { case (f, n) =>
      tone(n, Seq(f), rate, amp = 0.5)
    }.toArray
    val lmOther = invokeLandmarks(otherPcm, p)
    assert(lmMp3.toSet.intersect(lmOther.toSet).size < p.minShared,
      "distinct recordings must stay distinct")
  }

  private def invokeLandmarks(x: Array[Double],
      p: graft.ext.AudioFingerprint.Params): Array[Long] =
    graft.ext.AudioFingerprint.landmarks(x, p)
}
