package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Vorbis I decoder/encoder unit gates: transform math pinned against
  * the spec's direct definitions, bitpack/codebook machinery against
  * hand-computed goldens, and real encode->decode round trips through
  * every implemented block mode.
  */
class VorbisSpec extends AnyFunSuite {

  private def rng(seed: Int) = new scala.util.Random(seed)

  test("fast IMDCT equals the direct spec definition at every block size") {
    for (n <- Seq(64, 256, 1024, 2048)) {
      val r = rng(n)
      val x = Array.fill(n / 2)(r.nextDouble() * 2 - 1)
      val direct = Vorbis.imdctDirect(x, n)
      val fast = Vorbis.imdct(x, n)
      var maxErr = 0.0
      for (j <- 0 until n)
        maxErr = math.max(maxErr, math.abs(direct(j) - fast(j)))
      assert(maxErr < 1e-8, s"n=$n maxErr=$maxErr")
    }
  }

  test("MDCT/IMDCT TDAC round trip reconstructs the signal exactly") {
    // two overlapping windowed frames reconstruct their shared half:
    // the power-complementary Vorbis window is what makes this exact
    val n = 256
    val r = rng(7)
    val signal = Array.fill(2 * n)(r.nextDouble() * 2 - 1)
    val w = Vorbis.window(n, n / 2, n / 2)
    def frame(start: Int): Array[Double] = {
      val s = Array.tabulate(n)(j => signal(start + j) * w(j))
      Vorbis.imdct(Vorbis.mdct(s), n).zipWithIndex
        .map { case (v, j) => v * w(j) }
    }
    val f0 = frame(0)
    val f1 = frame(n / 2)
    // overlapped region: second half of f0 + first half of f1 ==
    // signal[n/2, n)
    var maxErr = 0.0
    for (i <- 0 until n / 2) {
      val rec = f0(n / 2 + i) + f1(i)
      maxErr = math.max(maxErr, math.abs(rec - signal(n / 2 + i)))
    }
    assert(maxErr < 1e-9, s"TDAC maxErr=$maxErr")
  }

  test("render_point and render_line match hand-computed goldens") {
    // line from (0, 10) to (8, 2): dy=-8, adx=8, base=-1 exact
    val v = new Array[Int](8)
    Vorbis.renderLine(0, 10, 8, 2, v)
    assert(v.toSeq == Seq(10, 9, 8, 7, 6, 5, 4, 3), v.toSeq)
    // non-integer slope: (0,0) -> (5,7): base=1, ady=7-5=2
    val v2 = new Array[Int](5)
    Vorbis.renderLine(0, 0, 5, 7, v2)
    // err: 2,4(>=5? no),... x1:err2 y1; x2:err4 y2; x3:err6-5=1 y+sy(2)=4
    assert(v2.toSeq == Seq(0, 1, 2, 4, 5), v2.toSeq)
    assert(Vorbis.renderPoint(0, 0, 8, 8, 4) == 4)
    assert(Vorbis.renderPoint(0, 8, 8, 0, 3) == 5)
  }

  test("float32 pack/unpack round-trips the fixture dyadics and signs") {
    for (v <- Seq(0.5, -3.5, 0.0625, -0.4375, 1.0, -1.0, 42.25))
      assert(Vorbis.float32Unpack(Vorbis.float32Pack(v)) == v, s"$v")
    // spec layout: mantissa*2^(exp-788), sign in bit 21+10
    assert(Vorbis.float32Unpack((788L << 21) | 3L) == 3.0)
    assert(Vorbis.float32Unpack(0x80000000L | (788L << 21) | 3L) == -3.0)
  }

  test("ilog matches the spec examples") {
    assert(Vorbis.ilog(0) == 0 && Vorbis.ilog(1) == 1 &&
      Vorbis.ilog(2) == 2 && Vorbis.ilog(3) == 2 &&
      Vorbis.ilog(4) == 3 && Vorbis.ilog(7) == 3)
  }

  test("inverse dB table derivation hits the spec's published endpoints") {
    assert(math.abs(Vorbis.inverseDb(255) - 1.0) < 1e-12)
    assert(math.abs(Vorbis.inverseDb(0) - 1.0649863e-07) < 1e-12,
      s"${Vorbis.inverseDb(0)}")
    // halfway: exactly 70/256*128... the step is uniform in dB
    val ratio = Vorbis.inverseDb(100) / Vorbis.inverseDb(99)
    assert(math.abs(20 * math.log10(ratio) - 140.0 / 256.0) < 1e-9)
  }

  test("mono round trip: tones survive the lossy encode at spectral peaks") {
    val rate = 16000
    val n = 8192
    val pcm = Array.tabulate(n)(i =>
      0.4 * math.sin(2 * math.Pi * 500 * i / rate) +
        0.2 * math.sin(2 * math.Pi * 2250 * i / rate))
    val ogg = Vorbis.encode(pcm, rate)
    assert(Vorbis.isOggVorbis(ogg))
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate)
    assert(out.length == n, s"decoded ${out.length} of $n")
    // time-domain SNR: quantization-limited but well above noise
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - pcm(i)) * (out(i) - pcm(i)); sig += pcm(i) * pcm(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 20, s"SNR $snr dB")
  }

  test("stereo round trip decodes the mono mix") {
    val rate = 8000
    val n = 4096
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 400 * i / rate))
    val rr = Array.tabulate(n)(i => 0.3 * math.sin(2 * math.Pi * 900 * i / rate))
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = rr(i) }
    val ogg = Vorbis.encode(inter, rate, channels = 2)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    val mix = Array.tabulate(n)(i => (l(i) + rr(i)) / 2)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - mix(i)) * (out(i) - mix(i)); sig += mix(i) * mix(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 18, s"stereo SNR $snr dB")
  }

  test("short-block round trip (the other mode path)") {
    val rate = 8000
    val n = 2048
    val pcm = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 625 * i / rate))
    val ogg = Vorbis.encode(pcm, rate, forceShort = true)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - pcm(i)) * (out(i) - pcm(i)); sig += pcm(i) * pcm(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 20, s"short SNR $snr dB")
  }

  test("long/short transitions: the slope-matched window geometry survives") {
    val rate = 8000
    val pcm = Array.tabulate(6144)(i =>
      0.5 * math.sin(2 * math.Pi * 500 * i / rate))
    // long, long, short x6, long, long ... exercises both reduced slopes
    val schedule = Seq(true, true, false, false, false, false, false,
      false, true, true, true, true, true, true, true, true)
    val ogg = Vorbis.encodeSchedule(pcm, rate, 1, schedule)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == pcm.length,
      s"${out.length} vs ${pcm.length}")
    var err = 0.0; var sig = 0.0
    for (i <- pcm.indices) {
      err += (out(i) - pcm(i)) * (out(i) - pcm(i)); sig += pcm(i) * pcm(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 18, s"transition SNR $snr dB")
  }

  test("silence encodes to unaudible floors and decodes to zeros") {
    val ogg = Vorbis.encode(new Array[Double](3000), 8000)
    val (out, _) = Vorbis.decode(ogg).get
    assert(out.length == 3000 && out.forall(_ == 0.0))
  }

  test("hostile inputs: decode is total and refuses what it must") {
    assert(Vorbis.decode(null) == None)
    assert(Vorbis.decode(Array.emptyByteArray) == None)
    assert(Vorbis.decode("OggS".getBytes("US-ASCII")) == None)
    val good = Vorbis.encode(
      Array.tabulate(2048)(i => 0.3 * math.sin(0.1 * i)), 8000)
    // CRC-corrupt first page -> not a decodable stream
    val broken = good.clone(); broken(40) = (broken(40) ^ 0x55).toByte
    assert(Vorbis.decode(broken) == None)
    // truncations and bit flips never throw
    val r = rng(11)
    for (cut <- 1 until good.length by 37)
      Vorbis.decode(good.take(cut))
    for (_ <- 0 until 200) {
      val mut = good.clone()
      for (_ <- 0 to r.nextInt(4))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      Vorbis.decode(mut)
    }
  }

  test("residue types 0 and 1 round-trip (per-channel vectors, both interleaves)") {
    val rate = 8000
    val n = 4096
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 375 * i / rate))
    val rr = Array.tabulate(n)(i => 0.3 * math.sin(2 * math.Pi * 1125 * i / rate))
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = rr(i) }
    val mixRef = Array.tabulate(n)(i => (l(i) + rr(i)) / 2)
    val frames = (2 * n + 1023) / 1024 + 1
    for (resType <- Seq(0, 1)) {
      val ogg = Vorbis.encodeSchedule(inter, rate, 2,
        Seq.fill(frames)(true), resType = resType)
      val (out, r) = Vorbis.decode(ogg).get
      assert(r == rate && out.length == n, s"type $resType: ${out.length}")
      var err = 0.0; var sig = 0.0
      for (i <- 0 until n) {
        err += (out(i) - mixRef(i)) * (out(i) - mixRef(i))
        sig += mixRef(i) * mixRef(i)
      }
      val snr = 10 * math.log10(sig / err)
      assert(snr > 18, s"residue type $resType SNR $snr dB")
    }
  }

  test("coupled stereo round-trips through the square-polar inverse") {
    val rate = 8000
    val n = 4096
    // correlated L/R (the case coupling exists for) plus a side tone
    val l = Array.tabulate(n)(i =>
      0.4 * math.sin(2 * math.Pi * 500 * i / rate) +
        0.1 * math.sin(2 * math.Pi * 1500 * i / rate))
    val rr = Array.tabulate(n)(i =>
      0.4 * math.sin(2 * math.Pi * 500 * i / rate) -
        0.1 * math.sin(2 * math.Pi * 1500 * i / rate))
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = rr(i) }
    val mixRef = Array.tabulate(n)(i => (l(i) + rr(i)) / 2)
    val frames = (2 * n + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(inter, rate, 2,
      Seq.fill(frames)(true), coupled = true)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - mixRef(i)) * (out(i) - mixRef(i))
      sig += mixRef(i) * mixRef(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 15, s"coupled SNR $snr dB")
  }

  test("two submaps: stereo channels routed by mux decode independently") {
    val rate = 8000
    val n = 4096
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 375 * i / rate))
    val rr = Array.tabulate(n)(i => 0.3 * math.sin(2 * math.Pi * 1375 * i / rate))
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = rr(i) }
    val mixRef = Array.tabulate(n)(i => (l(i) + rr(i)) / 2)
    val frames = (2 * n + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(inter, rate, 2,
      Seq.fill(frames)(true), submaps = 2)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - mixRef(i)) * (out(i) - mixRef(i))
      sig += mixRef(i) * mixRef(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 18, s"submap SNR $snr dB")
  }

  test("a coupled pair with one silent channel still reconstructs (the rescue path)") {
    val rate = 8000
    val n = 2048
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 625 * i / rate))
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) inter(2 * i) = l(i) // right channel all zero
    val frames = (2 * n + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(inter, rate, 2,
      Seq.fill(frames)(true), coupled = true)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    val mixRef = l.map(_ / 2)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - mixRef(i)) * (out(i) - mixRef(i))
      sig += mixRef(i) * mixRef(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 15, s"rescue SNR $snr dB")
  }

  /** LSB-first bit writer mirroring the spec's pack convention, for
    * crafting codebook streams the fixture encoder never emits.
    */
  private final class Bits {
    private val out = new java.io.ByteArrayOutputStream()
    private var cur = 0
    private var n = 0
    def w(v: Long, bits: Int): this.type = {
      var i = 0
      while (i < bits) {
        cur |= (((v >>> i) & 1L).toInt) << n
        n += 1
        if (n == 8) { out.write(cur); cur = 0; n = 0 }
        i += 1
      }
      this
    }
    /** A codeword: root branch first (MSB of the code). */
    def code(c: Long, len: Int): this.type = {
      var k = len - 1
      while (k >= 0) { w((c >>> k) & 1L, 1); k -= 1 }
      this
    }
    def bytes: Array[Byte] = {
      if (n > 0) { out.write(cur); cur = 0; n = 0 }
      out.toByteArray
    }
  }

  test("codeword assignment matches the spec's own worked example") {
    // Vorbis I spec 3.2.1: lengths [2,4,4,4,4,2,3,3] assign
    // 00, 0100, 0101, 0110, 0111, 10, 110, 111 — the canonical
    // first-fit example, decoded here through the real tree
    val b = new Bits
    b.w(0x564342, 24).w(1, 16).w(8, 24)
    b.w(0, 1).w(0, 1) // unordered, dense
    for (l <- Seq(2, 4, 4, 4, 4, 2, 3, 3)) b.w(l - 1, 5)
    b.w(0, 4) // lookup 0
    // decode entries 0, 5, 6, 1, 7, 4 via their spec codewords
    b.code(0x0, 2).code(0x2, 2).code(0x6, 3)
      .code(0x4, 4).code(0x7, 3).code(0x7, 4)
    val Some((scalars, _)) = Vorbis.testCodebook(b.bytes, 6)
    assert(scalars == Seq(0, 5, 6, 1, 7, 4), scalars)
  }

  test("ordered-length codebook parse: run-length lengths, canonical codes") {
    // 4 entries, ordered, all length 2 -> codes 00 01 10 11
    val b = new Bits
    b.w(0x564342, 24).w(1, 16).w(4, 24) // sync, dim 1, entries 4
    b.w(1, 1) // ordered
    b.w(1, 5) // initial length - 1 = 1 (length 2)
    b.w(4, 3) // ilog(4)=3 bits: all four entries at this length
    b.w(0, 4) // lookup 0
    b.code(2, 2).code(1, 2).code(3, 2) // decode entries 2, 1, 3
    val Some((scalars, _)) = Vorbis.testCodebook(b.bytes, 3)
    assert(scalars == Seq(2, 1, 3), scalars)
  }

  test("sparse codebook parse: absent entries never decode") {
    // 4 entries: e0 len1, e1 absent, e2 len2, e3 len2 (Kraft exactly 1)
    val b = new Bits
    b.w(0x564342, 24).w(1, 16).w(4, 24)
    b.w(0, 1).w(1, 1) // unordered, sparse
    b.w(1, 1).w(0, 5) // e0 present, len 1
    b.w(0, 1) // e1 absent
    b.w(1, 1).w(1, 5) // e2 present, len 2
    b.w(1, 1).w(1, 5) // e3 present, len 2
    b.w(0, 4) // lookup 0
    // canonical first-fit: e0 = 0, e2 = 10, e3 = 11
    b.code(2, 2).code(0, 1).code(3, 2)
    val Some((scalars, _)) = Vorbis.testCodebook(b.bytes, 3)
    assert(scalars == Seq(2, 0, 3), scalars)
  }

  test("lookup type 1 VQ: implicit lattice indexing and sequence_p") {
    // dim 2, 4 entries len 2, lookup1: lookup_values = 2 (2^2 <= 4),
    // mults {0, 1}, min 0, delta 3 -> entry e = (e%2)*3, ((e/2)%2)*3
    def book(seqP: Boolean): Array[Byte] = {
      val b = new Bits
      b.w(0x564342, 24).w(2, 16).w(4, 24)
      b.w(0, 1).w(0, 1) // unordered, dense
      for (_ <- 0 until 4) b.w(1, 5) // all length 2
      b.w(1, 4) // lookup type 1
      b.w(Vorbis.float32Pack(0.0), 32)
      b.w(Vorbis.float32Pack(3.0), 32)
      b.w(0, 4) // value_bits - 1 = 0 (1 bit)
      b.w(if (seqP) 1 else 0, 1)
      b.w(0, 1).w(1, 1) // multiplicands 0, 1
      b.code(3, 2) // decode entry 3 as VQ
      b.bytes
    }
    val Some((_, v)) = Vorbis.testCodebook(book(seqP = false), 0, vq = true)
    assert(v.toSeq == Seq(3.0, 3.0), v.toSeq)
    val Some((_, vs)) = Vorbis.testCodebook(book(seqP = true), 0, vq = true)
    assert(vs.toSeq == Seq(3.0, 6.0), vs.toSeq) // cascaded add
    // entry 2: v0 = mults[0]=0, v1 = mults[1]=3
    val b2 = {
      val b = new Bits
      b.w(0x564342, 24).w(2, 16).w(4, 24)
      b.w(0, 1).w(0, 1)
      for (_ <- 0 until 4) b.w(1, 5)
      b.w(1, 4)
      b.w(Vorbis.float32Pack(0.0), 32).w(Vorbis.float32Pack(3.0), 32)
      b.w(0, 4).w(0, 1)
      b.w(0, 1).w(1, 1)
      b.code(2, 2)
      b.bytes
    }
    val Some((_, v2)) = Vorbis.testCodebook(b2, 0, vq = true)
    assert(v2.toSeq == Seq(0.0, 3.0), v2.toSeq)
  }

  test("overspecified and underspecified codebooks refuse") {
    // overspecified: 3 entries all length 1
    val over = new Bits
    over.w(0x564342, 24).w(1, 16).w(3, 24).w(0, 1).w(0, 1)
    for (_ <- 0 until 3) over.w(0, 5)
    over.w(0, 4)
    assert(Vorbis.testCodebook(over.bytes, 0) == None)
    // underspecified: 3 entries all length 2 (Kraft 3/4)
    val under = new Bits
    under.w(0x564342, 24).w(1, 16).w(3, 24).w(0, 1).w(0, 1)
    for (_ <- 0 until 3) under.w(1, 5)
    under.w(0, 4)
    assert(Vorbis.testCodebook(under.bytes, 0) == None)
    // bad sync
    val sync = new Bits
    sync.w(0x564341, 24).w(1, 16).w(2, 24)
    assert(Vorbis.testCodebook(sync.bytes, 0) == None)
  }

  test("single-used-entry codebook decodes with ZERO bits sunk (spec 3.2.1)") {
    // spec 3.2.1: a codebook with one used entry "consists of a single
    // codework of zero bits" — decoding must sink NOTHING. Sparse book:
    // 4 entries, only e2 present (declared len 3). Eight scalar decodes
    // follow with NO payload bits at all: if decode sank the declared
    // length (the pre-fix bug) the reader would EOP after the byte
    // padding ran out and bit-desync any real packet that follows.
    val b = new Bits
    b.w(0x564342, 24).w(1, 16).w(4, 24)
    b.w(0, 1).w(1, 1) // unordered, sparse
    b.w(0, 1) // e0 absent
    b.w(0, 1) // e1 absent
    b.w(1, 1).w(2, 5) // e2 present, declared len 3
    b.w(0, 1) // e3 absent
    b.w(0, 4) // lookup 0
    val Some((scalars, _)) = Vorbis.testCodebook(b.bytes, 8)
    assert(scalars == Seq.fill(8)(2), scalars)
  }

  test("lookup-2 size guard runs in Long: 2^16 x 2^16 refuses, no wrap") {
    // entries * dim = 2^32 wraps Int to a negative; the cap compare must
    // promote to Long or the guard passes and the mult allocation throws
    // NegativeArraySizeException (testCodebook propagates non-EOP).
    // Ordered lengths: 65536 entries all len 16 (Kraft exactly 1).
    val b = new Bits
    b.w(0x564342, 24).w(65535, 16).w(65536, 24) // dim 65535, entries 2^16
    b.w(1, 1) // ordered
    b.w(15, 5) // initial length 16
    b.w(65536, 17) // ilog(65536) = 17 bits: all entries at len 16
    b.w(2, 4) // lookup type 2
    b.w(0, 32).w(0, 32) // min, delta
    b.w(0, 4).w(0, 1) // value_bits 1, sequence_p 0
    assert(Vorbis.testCodebook(b.bytes, 0) == None)
  }

  test("EOP mid-vector-decode zeroes the rest and still overlap-adds (spec 4.3)") {
    // Truncate one mid-stream audio packet after the mode/window flags:
    // the spec zeroes the undecoded vectors and runs synthesis anyway,
    // so the decoded SAMPLE COUNT must not change (abandoning the frame
    // — the pre-fix behavior — drops the lapped joint and drifts
    // against the granule positions for the rest of the stream).
    val rate = 8000
    val pcm = Array.tabulate(4096)(i => 0.5 * math.sin(0.21 * i))
    val ogg = Vorbis.encode(pcm, rate)
    val bos: (Array[Byte], Int, Int) => Boolean = (p, o, n) =>
      n >= 7 && p(o) == 1 && p(o + 1) == 'v' && p(o + 6) == 's'
    val Some((pkts, fg)) = Vorbis.oggPackets(ogg, bos)
    assert(pkts.length > 6, s"need several audio packets, got ${pkts.length}")
    val cut = 5 // an interior audio packet (headers are 0..2)
    val mangled = pkts.zipWithIndex.map { case (pk, i) =>
      if (i == cut) java.util.Arrays.copyOf(pk, 3) else pk
    }
    val truncated = Vorbis.oggWrap(
      mangled.zipWithIndex.map { case (pk, i) =>
        (pk, if (i == mangled.length - 1) fg else 0L)
      })
    val Some((ref, _)) = Vorbis.decode(ogg)
    val Some((got, gotRate)) = Vorbis.decode(truncated)
    assert(gotRate == rate)
    assert(got.length == ref.length,
      s"sample-count drift: ${got.length} vs ${ref.length}")
    // the stream before the damaged frame's overlap region is
    // untouched: packet 5 = audio frame 2, whose first lapped joint
    // (frames 1-2) starts at sample 512 for 1024-sample long blocks
    assert((0 until 512).forall(i => got(i) == ref(i)),
      "samples before the truncated frame changed")
    // and the damage is real: the zeroed frame changes the joint region
    assert((512 until 1536).exists(i => got(i) != ref(i)),
      "truncation had no effect — the test cut nothing")
  }

  test("floor0 mono round trip: the legacy-LSP envelope path decodes") {
    val rate = 16000
    val n = 8192
    val pcm = Array.tabulate(n)(i =>
      0.4 * math.sin(2 * math.Pi * 500 * i / rate) +
        0.2 * math.sin(2 * math.Pi * 2250 * i / rate))
    val frames = (2 * n + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(pcm, rate, 1,
      Seq.fill(frames)(true), floor0 = true)
    assert(Vorbis.isOggVorbis(ogg))
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate)
    assert(out.length == n, s"decoded ${out.length} of $n")
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - pcm(i)) * (out(i) - pcm(i)); sig += pcm(i) * pcm(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 15, s"floor0 SNR $snr dB")
  }

  test("floor0 stereo + short blocks round-trip (mode/coupling orthogonal to floor type)") {
    val rate = 8000
    val n = 4096
    val l = Array.tabulate(n)(i => 0.5 * math.sin(2 * math.Pi * 400 * i / rate))
    val rr = Array.tabulate(n)(i => 0.3 * math.sin(2 * math.Pi * 900 * i / rate))
    val inter = new Array[Double](2 * n)
    for (i <- 0 until n) { inter(2 * i) = l(i); inter(2 * i + 1) = rr(i) }
    val frames = (2 * n + 255) / 256 + 1
    val ogg = Vorbis.encodeSchedule(inter, rate, 2,
      Seq.fill(frames)(false), floor0 = true)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    val mix = Array.tabulate(n)(i => (l(i) + rr(i)) / 2)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - mix(i)) * (out(i) - mix(i)); sig += mix(i) * mix(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 12, s"floor0 stereo/short SNR $snr dB")
  }

  test("renderFloor0 equals direct LSP polynomial evaluation (the product-form identity)") {
    // independent oracle: build P(z) = (1+z^-1) PROD (1 - 2cos(t)z^-1
    // + z^-2) over even-indexed coefficients, Q likewise with (1-z^-1)
    // over odd-indexed, evaluate |P|^2, |Q|^2 by complex summation at
    // the decoder's own warped omegas, and form the spec's dB curve
    // from sqrt((|P|^2+|Q|^2)/4). renderFloor0's 4(cos t - cos w)^2
    // product must agree to rounding error.
    val cfg = Vorbis.fixtureFloor0(16000, order = 8)
    val coeffs = Array(0.35, 0.52, 0.91, 1.18, 1.55, 1.9, 2.3, 2.7)
    val amp = 37
    val n2 = 512
    val data = amp.toDouble +: coeffs
    val got = Vorbis.renderFloor0(cfg, data, n2)
    val map = Vorbis.barkMap(cfg, n2)
    def polyMag2(roots: Seq[Double], trivialSign: Int, w: Double): Double = {
      // coefficients of (1 + trivialSign*z^-1) * PROD(1-2cos(t)z^-1+z^-2)
      var c = Array(1.0, trivialSign.toDouble)
      for (t <- roots) {
        val f = Array(1.0, -2 * math.cos(t), 1.0)
        val next = new Array[Double](c.length + 2)
        for (i <- c.indices; j <- 0 to 2) next(i + j) += c(i) * f(j)
        c = next
      }
      var re = 0.0; var im = 0.0
      for (k <- c.indices) {
        re += c(k) * math.cos(-k * w); im += c(k) * math.sin(-k * w)
      }
      re * re + im * im
    }
    val even = Seq(0, 2, 4, 6).map(coeffs(_))
    val odd = Seq(1, 3, 5, 7).map(coeffs(_))
    var maxRel = 0.0
    for (i <- 0 until n2) {
      val w = math.Pi * map(i) / cfg.barkMapSize
      val den = math.sqrt((polyMag2(even, 1, w) + polyMag2(odd, -1, w)) / 4)
      val expect = math.exp(0.11512925 *
        (amp * cfg.ampOffset / (63.0 * den) - cfg.ampOffset))
      maxRel = math.max(maxRel, math.abs(got(i) - expect) /
        math.max(expect, 1e-300))
    }
    assert(maxRel < 1e-9, s"identity deviation $maxRel")
  }

  test("floor0 bark map is structural: zero at DC, monotone, clamped top") {
    for ((rate, n2) <- Seq((8000, 128), (16000, 512), (48000, 1024))) {
      val cfg = Vorbis.fixtureFloor0(rate)
      val map = Vorbis.barkMap(cfg, n2)
      assert(map(0) == 0, s"rate $rate: DC bin maps to ${map(0)}")
      assert(map.sliding(2).forall(p => p(0) <= p(1)),
        s"rate $rate: bark map not monotone")
      assert(map.last <= cfg.barkMapSize - 1 && map.last >=
        cfg.barkMapSize / 2, // top bin lands in the upper half
        s"rate $rate: top bin ${map.last} of ${cfg.barkMapSize}")
    }
  }

  test("floor0 EOP mid-coefficients: channel goes silent, sample count holds") {
    // spec 4.3 through the floor0 path: truncating an audio packet
    // inside the LSP coefficient decode must zero that channel's
    // vectors and still synthesize the frame — the decoded sample
    // count cannot drift
    val rate = 8000
    val pcm = Array.tabulate(4096)(i => 0.5 * math.sin(0.21 * i))
    val frames = (2 * 4096 + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(pcm, rate, 1,
      Seq.fill(frames)(true), floor0 = true)
    val bos: (Array[Byte], Int, Int) => Boolean = (p, o, n) =>
      n >= 7 && p(o) == 1 && p(o + 1) == 'v' && p(o + 6) == 's'
    val Some((pkts, fg)) = Vorbis.oggPackets(ogg, bos)
    assert(pkts.length > 6)
    val cut = 5
    // 2 bytes = 16 bits: past mode+window flags (3 bits) and the
    // amplitude (6), into the coefficient codewords
    val mangled = pkts.zipWithIndex.map { case (pk, i) =>
      if (i == cut) java.util.Arrays.copyOf(pk, 2) else pk
    }
    val truncated = Vorbis.oggWrap(
      mangled.zipWithIndex.map { case (pk, i) =>
        (pk, if (i == mangled.length - 1) fg else 0L)
      })
    val Some((ref, _)) = Vorbis.decode(ogg)
    val Some((got, _)) = Vorbis.decode(truncated)
    assert(got.length == ref.length,
      s"sample-count drift: ${got.length} vs ${ref.length}")
    assert((0 until 512).forall(i => got(i) == ref(i)),
      "samples before the truncated frame changed")
  }

  test("floor0 hostile headers refuse: zero order/rate/barkMapSize, bad books") {
    val pcm = Array.tabulate(2048)(i => 0.4 * math.sin(0.3 * i))
    val frames = (2 * 2048 + 1023) / 1024 + 1
    def stream(cfg: Vorbis.Floor0): Array[Byte] =
      Vorbis.encodeSchedule(pcm, 8000, 1, Seq.fill(frames)(true),
        floor0Cfg = Some(cfg))
    val good = Vorbis.fixtureFloor0(8000)
    assert(Vorbis.decode(stream(good)).isDefined)
    val hostile = Seq(
      "zero order" -> good.copy(order = 0),
      "zero rate" -> good.copy(rate = 0),
      "zero barkMapSize" -> good.copy(barkMapSize = 0),
      // book 0 is the lookup-less classification book: floor0
      // coefficients decode "in VQ context", so it must refuse
      "lookup-less book" -> good.copy(bookList = Array(0)),
      "book out of range" -> good.copy(bookList = Array(9)))
    for ((name, cfg) <- hostile) {
      val b = stream(cfg)
      assert(Vorbis.isOggVorbis(b), name)
      assert(Vorbis.decode(b) == None, s"$name must refuse")
    }
    // spec-legal amplitude_bits > 31 (the 6-bit field goes to 63): the
    // amplitude reads in Long (an Int accumulator wraps shifts mod 32)
    // and the 40-bit field must consume exactly 40 bits — a count
    // drift would desync every following packet read. The stream
    // stays decodable with the right sample count and finite values.
    val wideAmp = Vorbis.decode(stream(good.copy(ampBits = 40))).get._1
    val ref = Vorbis.decode(stream(good)).get._1
    assert(wideAmp.length == ref.length,
      s"ampBits=40 sample count ${wideAmp.length} vs ${ref.length}")
    assert(wideAmp.forall(v => !v.isNaN && !v.isInfinite),
      "ampBits=40 produced non-finite samples")
  }

  test("packets spanning pages: continued-packet reassembly decodes identically") {
    val rate = 8000
    val pcm = Array.tabulate(4096)(i =>
      0.5 * math.sin(2 * math.Pi * 750 * i / rate))
    val ogg = Vorbis.encode(pcm, rate)
    val ref = Vorbis.decode(ogg).get._1
    // repaginate with a tiny lacing budget so every sizeable packet
    // SPANS pages (continuation flag + 255-lace tails) — the wild
    // long-packet layout the fixture writer never emits
    case class Page(flags: Int, granule: Long, laces: Seq[Int],
        payload: Array[Byte])
    def parsePages(b: Array[Byte]): Seq[Page] = {
      var off = 0
      val out = Seq.newBuilder[Page]
      while (off + 27 <= b.length) {
        val nSegs = b(off + 26) & 0xff
        val laces = (0 until nSegs).map(s => b(off + 27 + s) & 0xff)
        val paySize = laces.sum
        val payOff = off + 27 + nSegs
        out += Page(b(off + 5) & 0xff,
          (0 until 8).map(i => (b(off + 6 + i) & 0xffL) << (8 * i)).sum,
          laces, java.util.Arrays.copyOfRange(b, payOff, payOff + paySize))
        off = payOff + paySize
      }
      out.result()
    }
    val pages = parsePages(ogg)
    // packets in order with the granule of the page they END on
    val packets = Seq.newBuilder[(Array[Byte], Long)]
    val pend = new java.io.ByteArrayOutputStream()
    for (pg <- pages) {
      var o = 0
      for (l <- pg.laces) {
        pend.write(pg.payload, o, l); o += l
        if (l < 255) { packets += ((pend.toByteArray, pg.granule)); pend.reset() }
      }
    }
    // re-emit with at most 3 laces per page, splitting packets: a
    // packet whose laces straddle a flush gets the continuation flag
    // on the following page
    val outB = new java.io.ByteArrayOutputStream()
    var seq = 0
    val maxLaces = 3
    var lacesBuf = Vector.empty[Int]
    var payBuf = new java.io.ByteArrayOutputStream()
    var pageGranule = -1L
    var thisPageCont = false
    var midPacket = false
    def flushPage(): Unit = {
      val header = java.nio.ByteBuffer.allocate(27 + lacesBuf.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      header.put("OggS".getBytes("US-ASCII")).put(0.toByte)
        .put(((if (thisPageCont) 1 else 0) |
          (if (seq == 0) 2 else 0)).toByte)
        .putLong(pageGranule).putInt(0x67726166).putInt(seq).putInt(0)
        .put(lacesBuf.length.toByte)
      lacesBuf.foreach(l => header.put(l.toByte))
      val page = header.array() ++ payBuf.toByteArray
      val crc = Vorbis.oggCrc(page, 0, page.length)
      page(22) = (crc & 0xff).toByte
      page(23) = ((crc >> 8) & 0xff).toByte
      page(24) = ((crc >> 16) & 0xff).toByte
      page(25) = ((crc >> 24) & 0xff).toByte
      outB.write(page)
      seq += 1
      lacesBuf = Vector.empty
      payBuf = new java.io.ByteArrayOutputStream()
      pageGranule = -1L
      thisPageCont = midPacket
    }
    for ((pk, granule) <- packets.result()) {
      val laces =
        (0 until pk.length / 255).map(_ => 255) :+ (pk.length % 255)
      var off = 0
      for ((lace, li) <- laces.zipWithIndex) {
        payBuf.write(pk, off, lace)
        lacesBuf = lacesBuf :+ lace
        off += lace
        midPacket = li < laces.length - 1
        if (!midPacket) pageGranule = granule
        if (lacesBuf.length >= maxLaces) flushPage()
      }
    }
    if (lacesBuf.nonEmpty) flushPage()
    val respun = outB.toByteArray
    val out2 = Vorbis.decode(respun)
    assert(out2.isDefined, "respun stream must decode")
    assert(out2.get._1.toSeq == ref.toSeq,
      "continued-packet reassembly must decode bit-identically")
  }

  test("lookup-type-1 residue books round-trip (implicit lattice in a real stream)") {
    val rate = 8000
    val n = 4096
    val pcm = Array.tabulate(n)(i =>
      0.5 * math.sin(2 * math.Pi * 625 * i / rate) +
        0.2 * math.sin(2 * math.Pi * 1875 * i / rate))
    val frames = (2 * n + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(pcm, rate, 1,
      Seq.fill(frames)(true), lookup1Books = true)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - pcm(i)) * (out(i) - pcm(i)); sig += pcm(i) * pcm(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 20, s"lookup1 SNR $snr dB")
  }

  test("a nonzero residue begin offsets partitions correctly") {
    // energy above the uncoded low band: 1375 Hz at 8 kHz / 1024-MDCT
    // sits at bin ~176, beyond begin=64
    val rate = 8000
    val n = 4096
    val pcm = Array.tabulate(n)(i =>
      0.5 * math.sin(2 * math.Pi * 1375 * i / rate))
    val frames = (2 * n + 1023) / 1024 + 1
    val ogg = Vorbis.encodeSchedule(pcm, rate, 1,
      Seq.fill(frames)(true), resBegin = 64)
    val (out, r) = Vorbis.decode(ogg).get
    assert(r == rate && out.length == n)
    var err = 0.0; var sig = 0.0
    for (i <- 0 until n) {
      err += (out(i) - pcm(i)) * (out(i) - pcm(i)); sig += pcm(i) * pcm(i)
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr > 18, s"resBegin SNR $snr dB")
  }

  test("a chained physical stream decodes its first logical stream") {
    val rate = 8000
    val a = Array.tabulate(2048)(i => 0.5 * math.sin(2 * math.Pi * 500 * i / rate))
    val b = Array.tabulate(2048)(i => 0.4 * math.sin(2 * math.Pi * 900 * i / rate))
    val oggA = Vorbis.encode(a, rate)
    val refA = Vorbis.decode(oggA).get._1
    val chained = oggA ++ Vorbis.encode(b, rate)
    val (out, r) = Vorbis.decode(chained).get
    assert(r == rate && out.toSeq == refA.toSeq,
      "the serial lock must keep the first stream's samples exactly")
  }

  test("square-polar coupling inverse matches the spec pseudocode golden") {
    // hand-worked examples straight off spec 4.3.5's branch table
    // (M,A) -> (newM, newA)
    val cases = Seq(
      ((5.0, 2.0), (5.0, 3.0)),   // M>0, A>0: A' = M - A
      ((5.0, -2.0), (3.0, 5.0)),  // M>0, A<=0: M' = M + A, A' = M
      ((-5.0, 2.0), (-5.0, -3.0)), // M<=0, A>0: A' = M + A
      ((-5.0, -2.0), (-3.0, -5.0))) // M<=0, A<=0: M'=M-A... A'=M
    // decode through a real coupled stream is exercised implicitly;
    // here pin the arithmetic via a minimal reimplementation check
    for (((m, a), (em, ea)) <- cases) {
      var (nm, na) = (m, a)
      if (m > 0) {
        if (a > 0) { nm = m; na = m - a } else { na = m; nm = m + a }
      } else {
        if (a > 0) { nm = m; na = m + a } else { na = m; nm = m - a }
      }
      assert((nm, na) == (em, ea), s"($m,$a) -> ($nm,$na)")
    }
  }
}
