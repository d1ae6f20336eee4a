package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The FLAC codec. Validation: encoder/decoder round-trips across the
  * subframe space (verbatim, constant, fixed orders 0/2 with Rice
  * residuals, independent and mid/side stereo, multi-frame), the EXACT
  * cross-container identity (a FLAC encode of the samples inside a WAV
  * decodes to bit-identical normalized samples through the ONE shared
  * `monoSamples` — what makes a FLAC master dedup against its WAV
  * rip), and totality on malformed payloads. The fingerprint-level
  * consequence is gated in AudioFingerprintSpec and the planted-truth
  * oracle `ext_audio_flac_pairs`.
  */
class FlacSpec extends AnyFunSuite {

  private def sig(n: Int, seed: Int): Array[Int] =
    Array.tabulate(n) { i =>
      math.round(32767.0 * 0.4 *
        (math.sin(2 * math.Pi * (300.0 + seed * 40) * i / 8000) +
          0.5 * math.sin(2 * math.Pi * (900.0 + seed * 25) * i / 8000)))
        .toInt
    }

  private def decoded(bytes: Array[Byte]): (Array[Double], Int) =
    Flac.decode(bytes).getOrElse(fail("flac did not decode"))

  test("mono round-trips: verbatim, fixed0, fixed2, multi-frame") {
    val q = sig(3000, 1)
    val expect = q.map(_ / 32768.0).toSeq
    val variants = Seq(
      "verbatim" -> Flac.encode(q, 8000, mode = "verbatim"),
      "fixed0" -> Flac.encode(q, 8000, mode = "fixed0"),
      "fixed2" -> Flac.encode(q, 8000, mode = "fixed2"),
      "multiframe" -> Flac.encode(q, 8000, mode = "fixed2",
        blockSize = 512))
    assert(variants.map(_._2.toSeq).distinct.size == variants.size,
      "variants must differ at the byte level")
    for ((name, bytes) <- variants) {
      val (x, sr) = decoded(bytes)
      assert(sr == 8000 && x.length == q.length, s"$name geometry")
      assert(x.toSeq == expect, s"$name samples")
    }
    // prediction + Rice must actually compress the tonal signal
    assert(variants(2)._2.length < variants(0)._2.length,
      "fixed2 should beat verbatim on a tonal signal")
  }

  test("constant subframes: a flat block costs one value") {
    val q = Array.fill(2048)(-1234)
    val bytes = Flac.encode(q, 8000, mode = "fixed2")
    val (x, _) = decoded(bytes)
    assert(x.toSeq == q.map(_ / 32768.0).toSeq)
    assert(bytes.length < 100, s"constant frame should be tiny: ${bytes.length}")
  }

  test("stereo round-trips: independent and mid/side decorrelation") {
    val n = 2000
    val lr = new Array[Int](n * 2)
    val l = sig(n, 2); val r = sig(n, 5)
    for (i <- 0 until n) { lr(2 * i) = l(i); lr(2 * i + 1) = r(i) }
    val expect = Array.tabulate(n)(i => (l(i) + r(i)) / 2.0 / 32768.0).toSeq
    val indep = Flac.encode(lr, 8000, channels = 2, mode = "fixed2")
    val ms = Flac.encode(lr, 8000, channels = 2, mode = "midside")
    assert(indep.toSeq != ms.toSeq)
    assert(decoded(indep)._1.toSeq == expect, "independent stereo")
    assert(decoded(ms)._1.toSeq == expect, "mid/side stereo")
  }

  test("24-bit round-trips: studio width encodes and decodes exactly") {
    // 24-bit samples exercise the widened encoder end (STREAMINFO width
    // field, frame-header sample-size code 6, 24/25-bit subframes); the
    // decoder was width-general already
    val q24 = sig(3000, 5).map(v => v * 251) // spread into 24-bit range
    val expect = q24.map(_ / 8388608.0).toSeq
    for (mode <- Seq("verbatim", "fixed2")) {
      val (x, sr) = decoded(Flac.encode(q24, 8000, mode = mode, bits = 24))
      assert(sr == 8000 && x.toSeq == expect, s"24-bit $mode")
    }
    // 24-bit mid/side stereo: the side channel runs at 25 bits
    val lr24 = (0 until 2048).flatMap(i =>
      Seq(q24(i), q24(i + 512))).toArray
    val expectMs = (0 until 2048)
      .map(i => (q24(i) + q24(i + 512)) / 2.0 / 8388608.0).toSeq
    val (xm, _) = decoded(Flac.encode(lr24, 8000, channels = 2,
      mode = "midside", bits = 24))
    assert(xm.toSeq == expectMs, "24-bit mid/side stereo")
    // out-of-range samples refuse loudly rather than wrapping
    intercept[IllegalArgumentException] {
      Flac.encode(Array(1 << 23), 8000, bits = 24)
    }
  }

  test("EXACT cross-container identity: FLAC of a WAV's samples decodes identically") {
    val q = sig(4096, 3)
    val wav = AudioDsp.pcmWav(q.map(_ / 32767.0), 8000)
    val flac = Flac.encode(q, 8000)
    val (xw, srw) = AudioDsp.monoSamples(wav).get
    val (xf, srf) = AudioDsp.monoSamples(flac).get // dispatches to Flac
    assert(srw == srf && xw.length == xf.length)
    assert(xw.toSeq == xf.toSeq,
      "the one shared decode must make WAV and FLAC the same signal")
  }

  test("totality: truncation, junk, and oversize declarations degrade to None") {
    val whole = Flac.encode(sig(2048, 4), 8000)
    for (cut <- Seq(3, 20, 45, whole.length - 5))
      assert(Flac.decode(whole.take(cut)).isEmpty, s"cut at $cut")
    assert(Flac.decode("fLaCnot really".getBytes("US-ASCII")).isEmpty)
    // a stream whose STREAMINFO declares more samples than the budget
    assert(Flac.decode(whole, maxSamples = 100).isEmpty)
    val flipped = whole.clone
    flipped(30) = (flipped(30) ^ 0x40).toByte // corrupt inside STREAMINFO
    // either fails cleanly or still decodes structurally — never throws
    Flac.decode(flipped)
  }

  test("FLAC-in-Ogg conformance: one audio packet per native frame") {
    // the Xiph mapping requires each audio packet to be exactly ONE
    // FLAC frame — a single multi-frame packet round-trips through the
    // in-repo concatenating decoder but is not a conformant stream, and
    // per-frame packets are the layout a third-party muxer produces
    val n = 10000 // 3 frames at blockSize 4096: 4096 + 4096 + 1808
    val x = sig(n, 9)
    val ogg = OggFlac.encode(x, 8000)
    val flacBos: (Array[Byte], Int, Int) => Boolean = (p, o, len) =>
      len >= 5 && (p(o) & 0xff) == 0x7f && p(o + 1) == 'F' &&
        p(o + 2) == 'L' && p(o + 3) == 'A' && p(o + 4) == 'C'
    val Some((pkts, fg)) = Vorbis.oggPackets(ogg, flacBos)
    assert(pkts.length == 2 + 3, s"2 headers + 3 frames, got ${pkts.length}")
    for (pk <- pkts.drop(2)) // every audio packet opens with frame sync
      assert((pk(0) & 0xff) == 0xff && (pk(1) & 0xfc) == 0xf8,
        "audio packet does not start at a frame boundary")
    assert(fg == n, s"final granule $fg != $n samples")
    assert(OggFlac.decode(ogg).get._1.toSeq ==
      Flac.decode(Flac.encode(x, 8000)).get._1.toSeq)
  }

  test("FLAC-in-Ogg: the rebuilt native stream decodes bit-identically") {
    val x = sig(3000, 4)
    val nativeRef = Flac.decode(Flac.encode(x, 8000)).get
    val ogg = OggFlac.encode(x, 8000)
    assert(OggFlac.isOggFlac(ogg) && !Flac.isFlac(ogg))
    val (y, sr) = OggFlac.decode(ogg).get
    assert(sr == 8000 && y.toSeq == nativeRef._1.toSeq,
      "Ogg envelope must not change one sample")
    assert(OggFlac.info(ogg) == Flac.info(Flac.encode(x, 8000)),
      "STREAMINFO through the BOS torso")
    // routed: the whole audio family consumes the Ogg envelope
    assert(AudioDsp.monoSamples(ogg).get._1.toSeq == nativeRef._1.toSeq)
    // hostile: truncation/bit flips are total; a corrupt first page
    // refuses
    val r = new scala.util.Random(3)
    for (cut <- 1 until ogg.length by 53) OggFlac.decode(ogg.take(cut))
    for (_ <- 0 until 120) {
      val mut = ogg.clone()
      for (_ <- 0 to r.nextInt(4))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      OggFlac.decode(mut)
    }
  }
}
