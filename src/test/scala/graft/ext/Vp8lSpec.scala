package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** The VP8L (lossless WebP) codec. Three validation layers:
  *
  *  1. a HAND-DERIVED golden stream computed from the public spec
  *     text alone (bit-by-bit, in the comment below) — anchors the
  *     two bit conventions (LSB-first scalars, MSB-first canonical
  *     Huffman walk) independently of BOTH halves of Vp8l.scala, the
  *     role ImageIO plays for the PNG/GIF/BMP decoders (the JDK has
  *     no WebP reader);
  *  2. encoder/decoder round-trips across every bitstream feature:
  *     simple + normal codes, color cache, LZ77 (plain and 2-D mapped
  *     distances), meta-Huffman, and all four transforms including
  *     sub-byte palette bundling and all 14 predictor modes;
  *  3. the cross-encoding invariance gate `ext_image_px_webp`
  *     (ExtQueries) replays the decoded plane against the closed-form
  *     pixel formula in DuckDB.
  */
class Vp8lSpec extends AnyFunSuite {

  private def plane(w: Int, h: Int, k: Int): Array[Byte] =
    Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      (((x * 13 + y * 7 + k * 31 + (x * y) % 7) * 3) % 251).toByte
    }

  private def rgbOf(webp: Array[Byte]): (Array[Byte], Int, Int) =
    Multimodal.ContainerCodec.webpRgb(webp)
      .getOrElse(fail("webp did not decode"))

  private def expectRgb(gray: Array[Byte]): Array[Byte] =
    gray.flatMap(v => Array(v, v, v))

  // -----------------------------------------------------------------
  // 1. spec-derived golden
  // -----------------------------------------------------------------
  test("hand-derived 1x1 stream from the spec text decodes exactly") {
    // Pixel ARGB = (0xff, 0x12, 0x34, 0x56). Derivation, LSB-first
    // bit packing: header byte 0x2f; then 14+14+1+3 = 32 zero bits
    // (w-1=0, h-1=0, no alpha, version 0) = four 0x00 bytes. Then the
    // 51-bit sequence S (S0 first = LSB of its byte):
    //   S0..2   0 (no transform) 0 (no cache) 0 (no meta)
    //   S3..13  green: 1 (simple) 0 (one symbol) 1 (8-bit) 0x34 LSB-first
    //   S14..24 red:   1 0 1 0x12
    //   S25..35 blue:  1 0 1 0x56
    //   S36..46 alpha: 1 0 1 0xff
    //   S47..50 dist:  1 (simple) 0 (one symbol) 0 (1-bit) 0
    // and no data bits (all five codes are zero-bit single-symbol).
    // Bytes: S0..7 = 000101,00(=green bits 0,0 of 0x34) -> 0x28;
    // S8..15 = 1,0,1,1,0,0,1,0 -> 0x4d; S16..23 -> 0x25; S24..31 ->
    // 0x6a; S32..39 -> 0xd5; S40..47 = seven 1s of 0xff then the
    // distance simple-bit -> 0xff; S48..50 = 0,0,0 -> 0x00.
    val payload = Array(0x2f, 0x00, 0x00, 0x00, 0x00,
      0x28, 0x4d, 0x25, 0x6a, 0xd5, 0xff, 0x00).map(_.toByte)
    val (argb, w, h) = Vp8l.decodeArgb(payload, 0, payload.length)
      .getOrElse(fail("golden stream did not decode"))
    assert(w == 1 && h == 1)
    assert(argb.toSeq == Seq(0xff123456))
  }

  // -----------------------------------------------------------------
  // 2. round-trips per feature
  // -----------------------------------------------------------------
  private val variants: Seq[(String, (Int, Int, Array[Byte]) => Array[Byte])] =
    Seq(
      "flat" -> ((w, h, g) => Multimodal.encodeWebpL(w, h, g)),
      "subtract-green" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, subtractGreen = true)),
      "color-cache" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, cacheBits = 6)),
      "lz77" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, lz77 = true)),
      "lz77+cache" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, lz77 = true, cacheBits = 4)),
      "predictor-L" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, predictor = 1)),
      "palette" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, palette = true)),
      "color-transform" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, colorXform = true)),
      "meta-huffman" -> ((w, h, g) =>
        Multimodal.encodeWebpL(w, h, g, meta = true)),
      "sg+cache+lz77" -> ((w, h, g) => Multimodal.encodeWebpL(w, h, g,
        subtractGreen = true, cacheBits = 5, lz77 = true)))

  test("every encoder feature round-trips to the exact pixels") {
    for (k <- 0 until 4) {
      val w = 11 + k * 7
      val h = 9 + k * 3
      val g = plane(w, h, k)
      val expected = expectRgb(g).toSeq
      for ((name, enc) <- variants) {
        val bytes = enc(w, h, g)
        val (px, dw, dh) = rgbOf(bytes)
        assert(dw == w && dh == h, s"$name geometry")
        assert(px.toSeq == expected, s"$name pixels (k=$k)")
      }
    }
  }

  test("the variants are byte-incompatible encodings") {
    val w = 18; val h = 12
    // texture with embedded runs so LZ77 actually emits backrefs and
    // the cache actually hits — every knob must change the bytes
    val g = plane(w, h, 5)
    for (i <- 0 until w * 3) g(i) = ((i / w) * 40).toByte
    val encoded = variants.map { case (n, enc) => n -> enc(w, h, g).toSeq }
    for (Seq((n1, b1), (n2, b2)) <- encoded.combinations(2))
      assert(b1 != b2, s"$n1 vs $n2 should differ")
  }

  test("sub-byte palette bundling round-trips at 1, 2 and 4 bits") {
    for ((colors, k) <- Seq((2, 0), (4, 1), (16, 2), (40, 3))) {
      val w = 13 + k; val h = 7 + k
      val g = Array.tabulate(w * h) { p =>
        ((p * 37 + k) % colors * (255 / (colors - 1))).toByte
      }
      val bytes = Multimodal.encodeWebpL(w, h, g, palette = true)
      val (px, dw, dh) = rgbOf(bytes)
      assert(dw == w && dh == h)
      assert(px.toSeq == expectRgb(g).toSeq, s"$colors colors")
    }
  }

  test("all 14 predictor modes round-trip") {
    val w = 16; val h = 10
    val g = plane(w, h, 2)
    for (mode <- 0 to 13) {
      val bytes = Multimodal.encodeWebpL(w, h, g, predictor = mode)
      val (px, dw, dh) = rgbOf(bytes)
      assert(dw == w && dh == h)
      assert(px.toSeq == expectRgb(g).toSeq, s"predictor $mode")
    }
  }

  test("LZ77 exercises both mapped and plain distance codes") {
    // vertical stripes repeat with distance 1 and w: greedy tokenizer
    // emits 2-D mapped codes 1/2; a constant image forces long runs
    val w = 24; val h = 16
    val stripes = Array.tabulate(w * h)(p => ((p % w) % 3 * 80).toByte)
    val flat = Multimodal.encodeWebpL(w, h, stripes)
    val lz = Multimodal.encodeWebpL(w, h, stripes, lz77 = true)
    assert(lz.length < flat.length, "backrefs should compress stripes")
    assert(rgbOf(lz)._1.toSeq == expectRgb(stripes).toSeq)
    val const = Array.fill(w * h)(77.toByte)
    assert(rgbOf(Multimodal.encodeWebpL(w, h, const, lz77 = true))
      ._1.toSeq == expectRgb(const).toSeq)
    // diagonal and anti-diagonal textures repeat at distances w+1 and
    // w-1 — the tokenizer emits 2-D distance codes 3 and 4, so the
    // decoder's neighbor-map entries (1,1) and (-1,1) are exercised
    val diag = Array.tabulate(w * h)(p =>
      (((p % w) - (p / w) + 256) % 5 * 50).toByte)
    val anti = Array.tabulate(w * h)(p =>
      (((p % w) + (p / w)) % 5 * 50).toByte)
    for (g <- Seq(diag, anti)) {
      val enc = Multimodal.encodeWebpL(w, h, g, lz77 = true)
      assert(enc.length < Multimodal.encodeWebpL(w, h, g).length,
        "diagonal runs should compress")
      assert(rgbOf(enc)._1.toSeq == expectRgb(g).toSeq)
    }
  }

  test("color round-trips: unequal channels through every transform") {
    val w = 9; val h = 7
    val argb = Array.tabulate(w * h) { p =>
      0xff000000 | (((p * 31) % 256) << 16) | (((p * 17) % 256) << 8) |
        ((p * 53) % 256)
    }
    for ((name, bytes) <- Seq(
        "plain" -> Vp8l.encode(argb, w, h),
        "sg" -> Vp8l.encode(argb, w, h, subtractGreen = true),
        "cx" -> Vp8l.encode(argb, w, h, colorXform = true),
        "pred11" -> Vp8l.encode(argb, w, h, predictor = 11),
        "pred12" -> Vp8l.encode(argb, w, h, predictor = 12),
        "pred13" -> Vp8l.encode(argb, w, h, predictor = 13))) {
      val (out, dw, dh) = Vp8l.decodeArgb(bytes, 0, bytes.length)
        .getOrElse(fail(s"$name did not decode"))
      assert(dw == w && dh == h)
      assert(out.toSeq == argb.toSeq, name)
    }
  }

  // -----------------------------------------------------------------
  // totality: malformed input degrades, never throws
  // -----------------------------------------------------------------
  test("truncated and corrupted streams return None") {
    val g = plane(12, 9, 1)
    val whole = Multimodal.encodeWebpL(12, 9, g)
    // truncating the RIFF payload breaks the chunk-size validation or
    // the bit reader mid-stream — either way: None, no throw
    for (cut <- Seq(10, 21, 25, whole.length - 3)) {
      val t = whole.take(cut)
      assert(Multimodal.ContainerCodec.webpRgb(t).isEmpty ||
        !Multimodal.ContainerCodec.isWebp(t), s"cut at $cut")
    }
    val bad = whole.clone
    bad(20) = 0x55 // not the 0x2f signature
    assert(Multimodal.ContainerCodec.webpRgb(bad).isEmpty)
  }

  test("the pixel budget rejects oversized declared geometry up front") {
    // a header declaring 16384x16384 (268M pixels, version 0) must
    // bail BEFORE allocating anything — the budget guard, not an OOM
    val wr = Array(0x2f, 0xff, 0xff, 0xff, 0x0f).map(_.toByte)
    assert(Vp8l.decodeArgb(wr, 0, wr.length).isEmpty)
  }

  test("lossy VP8 stays the documented boundary") {
    // a VP8 (lossy) chunk: keyframe tag + start code + geometry only —
    // webpRgb must not pretend to decode it
    val payload = new Array[Byte](12)
    payload(3) = 0x9d.toByte; payload(4) = 0x01; payload(5) = 0x2a
    payload(6) = 20; payload(8) = 10
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    val sz = 4 + 8 + payload.length
    out.write(Array[Byte](sz.toByte, (sz >> 8).toByte, 0, 0))
    out.write("WEBP".getBytes("US-ASCII"))
    out.write("VP8 ".getBytes("US-ASCII"))
    out.write(Array[Byte](payload.length.toByte, 0, 0, 0))
    out.write(payload)
    val b = out.toByteArray
    assert(Multimodal.ContainerCodec.isWebp(b))
    assert(Multimodal.ContainerCodec.webpRgb(b).isEmpty)
  }
}
