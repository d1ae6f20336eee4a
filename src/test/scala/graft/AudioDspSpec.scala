package graft

import graft.ext.{AudioDsp, Multimodal}

/** The audio DSP path on signals with hand-computable spectra: FFT
  * identities first (impulse, single-tone bin concentration, Parseval),
  * then end-to-end WAV → features with the physics checked — spectral
  * centroid at the tone, dominant mel band containing it, ZCR = 2f/sr,
  * RMS = A/√2 — plus the totality/mono-mix/framing edges.
  */
class AudioDspSpec extends SparkSpec {
  import spark.implicits._

  test("fft: impulse -> flat unit spectrum") {
    val re = new Array[Double](64); val im = new Array[Double](64)
    re(0) = 1.0
    AudioDsp.fft(re, im)
    for (k <- 0 until 64) {
      assert(math.abs(re(k) - 1.0) < 1e-12 && math.abs(im(k)) < 1e-12,
        s"bin $k of an impulse spectrum is not 1+0i")
    }
  }

  test("fft: a pure cosine at bin k concentrates ALL energy at k and N-k") {
    val n = 256; val k0 = 19
    val re = Array.tabulate(n)(i => math.cos(2 * math.Pi * k0 * i / n))
    val im = new Array[Double](n)
    AudioDsp.fft(re, im)
    def mag(k: Int) = math.hypot(re(k), im(k))
    assert(math.abs(mag(k0) - n / 2.0) < 1e-6, s"peak ${mag(k0)} != ${n / 2}")
    assert(math.abs(mag(n - k0) - n / 2.0) < 1e-6)
    for (k <- 0 until n if k != k0 && k != n - k0)
      assert(mag(k) < 1e-6, s"leakage ${mag(k)} at bin $k")
  }

  test("fft: Parseval — time energy equals spectrum energy / N") {
    val rnd = new scala.util.Random(7)
    val n = 128
    val x = Array.fill(n)(rnd.nextGaussian())
    val timeEnergy = x.map(v => v * v).sum
    val re = x.clone(); val im = new Array[Double](n)
    AudioDsp.fft(re, im)
    val specEnergy = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeEnergy - specEnergy) < 1e-9 * n)
  }

  test("mel filterbank: partitions of unity inside the passband, zero outside") {
    val fb = AudioDsp.melFilterbank(nMels = 16, nFft = 512, sampleRate = 8000)
    assert(fb.length == 16 && fb.forall(_.length == 257))
    assert(fb.forall(_.forall(w => w >= 0.0 && w <= 1.0)))
    // every filter has support, and supports are ordered by frequency
    val peaks = fb.map(f => f.indexOf(f.max))
    assert(fb.forall(_.max > 0.0))
    assert(peaks.toSeq == peaks.sorted.toSeq,
      s"mel peaks out of order: ${peaks.toSeq}")
  }

  test("sine WAV end-to-end: centroid at the tone, right mel band, zcr, rms") {
    val sr = 8000; val f0 = 1000.0
    val wav = AudioDsp.sineWav(sr, nSamples = 4096, freqHz = f0)
    val feats = AudioDsp.analyze(wav, frameSize = 512, hop = 256, nMels = 16).get
    assert(feats.decoded && feats.sample_rate == sr && feats.n_samples == 4096)
    assert(feats.n_frames == (4096 - 512) / 256 + 1)
    // centroid: all energy sits at the tone (±1 bin of leakage: 15.6 Hz)
    assert(math.abs(feats.centroid_hz - f0) < 25.0,
      s"centroid ${feats.centroid_hz} not at $f0")
    // zcr of a sine = 2 f / sr
    assert(math.abs(feats.zcr - 2 * f0 / sr) < 0.01, s"zcr ${feats.zcr}")
    // rms of A·sin = A/√2
    assert(math.abs(feats.rms - 0.5 / math.sqrt(2)) < 1e-3, s"rms ${feats.rms}")
    // the argmax mel band's triangle must CONTAIN the tone
    val m = feats.log_mel.indexOf(feats.log_mel.max)
    val maxMel = AudioDsp.melOf(sr / 2.0)
    val lo = AudioDsp.hzOf(maxMel * m / 17.0)
    val hi = AudioDsp.hzOf(maxMel * (m + 2) / 17.0)
    assert(f0 > lo && f0 < hi, s"dominant band $m covers ($lo, $hi), not $f0")
  }

  test("two tones: centroid lands at the energy-weighted mean") {
    val sr = 8000
    // equal-amplitude tones at 500 and 1500 -> centroid ~ 1000
    val a = AudioDsp.sineWav(sr, 8192, 500.0, amplitude = 0.4)
    val b = AudioDsp.sineWav(sr, 8192, 1500.0, amplitude = 0.4)
    val mixed = a.clone()
    // mix the PCM payloads sample-by-sample (offset 44 = header)
    var i = 44
    while (i < mixed.length - 1) {
      val sa = (((a(i + 1) << 8) | (a(i) & 0xff)).toShort).toInt
      val sb = (((b(i + 1) << 8) | (b(i) & 0xff)).toShort).toInt
      val s = sa + sb
      mixed(i) = (s & 0xff).toByte; mixed(i + 1) = ((s >> 8) & 0xff).toByte
      i += 2
    }
    val f = AudioDsp.analyze(mixed, 512, 256, 16).get
    assert(math.abs(f.centroid_hz - 1000.0) < 40.0, s"centroid ${f.centroid_hz}")
  }

  test("distributed operator is total: WAV decodes, junk zeroes, no shuffle") {
    val media = Seq(
      Multimodal.MediaRow(1L, AudioDsp.sineWav(8000, 2048, 800.0), "audio/wav", 0, 0),
      Multimodal.MediaRow(2L, "not audio at all".getBytes, "text/plain", 0, 0),
      Multimodal.MediaRow(3L, AudioDsp.sineWav(16000, 100, 440.0), "audio/wav", 0, 0))
      .toDF()
    val out = AudioDsp.features(spark, media)
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"),
      "per-document DSP must not shuffle")
    val f = out.collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).decoded && f(1L).n_frames == (2048 - 512) / 256 + 1)
    assert(!f(2L).decoded && f(2L).n_frames == 0 && f(2L).log_mel.length == 16)
    // 100 samples < one 512 frame: decoded but frame-less, zcr still real
    assert(f(3L).decoded && f(3L).n_frames == 0 && f(3L).centroid_hz == 0f)
    assert(f(3L).zcr > 0f)
  }

  test("sample-width/format invariance: every uncompressed layout decodes to one signal") {
    val sr = 8000; val n = 1024
    val sig = Array.tabulate(n) { i =>
      0.4 * math.sin(2 * math.Pi * 700.0 * i / sr) +
        0.2 * math.sin(2 * math.Pi * 1900.0 * i / sr)
    }
    // per-layout quantization tolerance: round-to-nearest at b bits of
    // magnitude plus the (2^b-1)/2^b normalization skew
    val layouts = Seq(
      ("pcm8", AudioDsp.pcmWav(sig, sr, bits = 8), 1e-2),
      ("pcm16", AudioDsp.pcmWav(sig, sr, bits = 16), 1e-4),
      ("pcm24", AudioDsp.pcmWav(sig, sr, bits = 24), 1e-6),
      ("pcm32", AudioDsp.pcmWav(sig, sr, bits = 32), 1e-8),
      ("f32", AudioDsp.pcmWav(sig, sr, bits = 32, float = true), 1e-6),
      ("f64", AudioDsp.pcmWav(sig, sr, bits = 64, float = true), 1e-12),
      ("stereo24", AudioDsp.pcmWav(sig, sr, bits = 24, channels = 2), 1e-6),
      ("ext24", AudioDsp.pcmWav(sig, sr, bits = 24, extensible = true), 1e-6),
      ("extf32", AudioDsp.pcmWav(sig, sr, bits = 32, float = true,
        extensible = true), 1e-6),
      // G.711 telephony companding: 8-bit log quantization — coarse
      // near the peaks, the segmented-cell bound
      ("mulaw", AudioDsp.g711Wav(sig, sr), 0.04),
      ("alaw", AudioDsp.g711Wav(sig, sr, alaw = true), 0.04),
      ("mulaw2ch", AudioDsp.g711Wav(sig, sr, channels = 2), 0.04))
    assert(layouts.map(_._2.toSeq).distinct.size == layouts.size,
      "fixture layouts must differ at the byte level")
    for ((name, bytes, tol) <- layouts) {
      val (x, rate) = AudioDsp.monoSamples(bytes)
        .getOrElse(fail(s"$name did not decode"))
      assert(rate == sr && x.length == n, s"$name geometry")
      val worst = sig.indices.map(i => math.abs(x(i) - sig(i))).max
      assert(worst <= tol, s"$name: worst sample error $worst > $tol")
    }
    // pcmWav's 16-bit mono layout is byte-identical to the historical
    // sineWav/tonesWav framing: same quantizer, same header
    assert(AudioDsp.pcmWav(Array.tabulate(64)(i =>
        0.5 * math.sin(2.0 * math.Pi * 440.0 * i / sr + 0.1)), sr).toSeq ==
      AudioDsp.sineWav(sr, 64, 440.0).toSeq)
    // a compressed format code (ADPCM = 2) is a codec boundary: None
    val adpcm = AudioDsp.pcmWav(sig, sr, bits = 16)
    adpcm(20) = 2 // format field inside "fmt "
    assert(AudioDsp.monoSamples(adpcm).isEmpty)
  }

  test("IMA ADPCM: mono and stereo blocks decode, lossy-but-faithful") {
    val sr = 8000; val n = 3000
    val a = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 200 * i / sr))
    val b = Array.tabulate(n)(i => 0.3 * math.sin(2 * math.Pi * 700 * i / sr))
    val mono = AudioDsp.imaAdpcmWav(Seq(a), sr)
    val (x, rate) = AudioDsp.monoSamples(mono)
      .getOrElse(fail("mono ADPCM did not decode"))
    assert(rate == sr && x.length >= n)
    val err = (0 until n).map(i => math.abs(x(i) - a(i))).max
    assert(err < 0.05, s"ADPCM is lossy but must track the signal: $err")
    // stereo: alternating 4-byte channel groups mix to the mean
    val st = AudioDsp.imaAdpcmWav(Seq(a, b), sr, blockAlign = 512)
    val (xs, _) = AudioDsp.monoSamples(st)
      .getOrElse(fail("stereo ADPCM did not decode"))
    val errS = (0 until n).map(i =>
      math.abs(xs(i) - (a(i) + b(i)) / 2)).max
    assert(errS < 0.05, s"stereo ADPCM error $errS")
    // feature extraction: real signal stats, kind pcm, block-accurate
    // duration
    val f = Multimodal.extractFeatures(spark, Seq(
        Multimodal.MediaRow(1L, mono, "audio/wav", 0, 0)).toDF())
      .collect().head
    assert(f.kind == "pcm" && f.format == "audio/wav")
    assert(math.abs(f.feature(2) - x.length.toFloat / sr) < 0.05,
      s"ADPCM duration: ${f.feature(2)} vs ${x.length.toFloat / sr}")
    assert(f.feature(3) > 0.2f, s"rms of a 0.5 sine: ${f.feature(3)}")
  }

  test("MS ADPCM: mono and stereo blocks decode, lossy-but-faithful") {
    val sr = 8000; val n = 3000
    val a = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 200 * i / sr))
    val b = Array.tabulate(n)(i => 0.3 * math.sin(2 * math.Pi * 700 * i / sr))
    val mono = AudioDsp.msAdpcmWav(Seq(a), sr)
    val (x, rate) = AudioDsp.monoSamples(mono)
      .getOrElse(fail("mono MS-ADPCM did not decode"))
    assert(rate == sr && x.length >= n)
    val err = (0 until n).map(i => math.abs(x(i) - a(i))).max
    assert(err < 0.05, s"MS-ADPCM must track the signal: $err")
    val st = AudioDsp.msAdpcmWav(Seq(a, b), sr, blockAlign = 512)
    val (xs, _) = AudioDsp.monoSamples(st)
      .getOrElse(fail("stereo MS-ADPCM did not decode"))
    val errS = (0 until n).map(i =>
      math.abs(xs(i) - (a(i) + b(i)) / 2)).max
    assert(errS < 0.05, s"stereo MS-ADPCM error $errS")
  }

  test("stereo mono-mix: identical channels analyze like the mono signal") {
    val sr = 8000; val n = 2048
    val mono = AudioDsp.sineWav(sr, n, 700.0)
    // build the stereo twin: duplicate each sample into two channels
    val dataLen = n * 4
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(sr).putInt(sr * 4)
      .putShort(4).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) {
      val o = 44 + i * 2
      val s = (((mono(o + 1) << 8) | (mono(o) & 0xff)).toShort)
      out.putShort(s).putShort(s)
      i += 1
    }
    val fm = AudioDsp.analyze(mono, 512, 256, 16).get
    val fs = AudioDsp.analyze(out.array(), 512, 256, 16).get
    assert(fs.centroid_hz === fm.centroid_hz)
    assert(fs.zcr === fm.zcr)
    assert(fs.log_mel.toSeq === fm.log_mel.toSeq)
  }
}
