package graft

import org.apache.spark.sql.functions._
import graft.ext.{IncrementalImageDedup, Multimodal}
import graft.functions.DHashPixels

/** The pixel-regime perceptual hash (`Multimodal.dHashPixels` /
  * `graft_dhash_px`): the property the whole image-dedup family exists
  * for — a RE-ENCODED copy of the same picture (the most common
  * image-dup class in a crawl) must hash identically (lossless PNG
  * re-encodes) or a few Hamming bits away (JPEG re-compression) — plus
  * the frozen-golden pin on the grid arithmetic (the BPE/simhash
  * discipline: DuckDB cannot decode PNG for the invariance half, so the
  * hash values are pinned to literals computed by an INDEPENDENT
  * implementation of the area-mean grid).
  */
class ImagePixelHashSpec extends SparkSpec {
  import spark.implicits._

  // canonical textured fixture: 20x16 gray, values from a fixed formula
  private val W = 20
  private val H = 16
  private val plane: Array[Byte] = Array.tabulate(W * H) { p =>
    val x = p % W; val y = p / W
    (((x * 13 + y * 7 + (x * y) % 5) * 3) % 251).toByte
  }
  // independently computed (Python reimplementation of the area-mean
  // grid + integer cross-multiply comparison) — NOT computeGrid output
  private val Golden = -5466128281783585756L

  private def pxOf(rows: Seq[(Long, Array[Byte], Int, Int)]) =
    rows.toDF("doc_id", "media", "width", "height")
      .select(col("doc_id"),
        Multimodal.dHashPixels(spark)(
          col("media"), col("width"), col("height")).as("px"))
      .select(col("doc_id"), col("px.sh").as("sh"), col("px.kind").as("kind"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getString(2)))))
      .toMap

  private def jpegBytes(gray: Array[Byte], w: Int, h: Int,
      quality: Float): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(y * w + x) & 0xff
      im.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(im, null, null), params)
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("lossless PNG re-encodings of the same pixels hash IDENTICALLY (frozen golden)") {
    // four byte-level DIFFERENT encodings of the same 20x16 plane:
    // stored-deflate gray, max-compression gray, mixed-filter +
    // IDAT-split gray, and RGB with R=G=B (BT.601 of equal channels is
    // the gray value exactly)
    val stored = Multimodal.storedGrayPng(plane, W, H)
    val level9 = Multimodal.encodePng(W, H, 0, plane, Seq.fill(H)(0), 9)
    val mixed = Multimodal.encodePng(W, H, 0, plane,
      (0 until H).map(_ % 5), 1, splitIdat = true)
    val rgb = Multimodal.encodePng(W, H, 2,
      plane.flatMap(b => Array(b, b, b)), (0 until H).map(_ % 3).reverse)
    val encodings = Seq(stored, level9, mixed, rgb)
    assert(encodings.map(_.toSeq).distinct.size == 4,
      "fixture encodings must differ at the byte level")

    val got = pxOf(encodings.zipWithIndex.map { case (b, i) => (i.toLong, b, 0, 0) })
    // metadata geometry is (0,0) — the pixel regime must not care
    (0L to 3L).foreach { id =>
      assert(got(id).contains((Golden, "pixels")),
        s"encoding $id: ${got(id)} != golden $Golden/pixels")
    }
  }

  test("palette and sub-byte encodings of the same picture hash like truecolor") {
    // one gray picture with 16 levels (multiples of 17, so the 4-bit
    // scale-up v*255/15 reproduces the 8-bit values EXACTLY), encoded
    // five byte-different ways across three COLOR MODELS
    val vals = Array.tabulate(W * H) { p =>
      val x = p % W; val y = p / W
      ((x * 3 + y * 5 + (x * y) % 7) % 16)
    }
    val gray8 = vals.map(v => (v * 17).toByte)
    val gray8Png = Multimodal.storedGrayPng(gray8, W, H)
    // RGB truecolor of the same pixels
    val rgbPng = Multimodal.encodePng(W, H, 2,
      gray8.flatMap(b => Array(b, b, b)), (0 until H).map(_ % 5), 6)
    // 8-bit palette: identity-ish palette of the 16 used gray levels
    val pal = Array.tabulate(16 * 3)(i => ((i / 3) * 17).toByte)
    val palPng = Multimodal.encodePng(W, H, 3,
      vals.map(_.toByte), (0 until H).map(y => (y + 1) % 5), 9,
      palette = Some(pal))
    // 4-bit palette: same palette, indices packed two per byte
    val pal4Png = Multimodal.encodePng(W, H, 3,
      vals.map(_.toByte), Seq.fill(H)(2), 1, bitDepth = 4,
      palette = Some(pal))
    // 4-bit gray: values 0..15 scale to exactly v*17 on decode
    val gray4Png = Multimodal.encodePng(W, H, 0,
      vals.map(_.toByte), (0 until H).map(_ % 3), 4, bitDepth = 4,
      splitIdat = true)
    val encodings = Seq(gray8Png, rgbPng, palPng, pal4Png, gray4Png)
    assert(encodings.map(_.toSeq).distinct.size == 5,
      "encodings must differ at the byte level")
    val got = pxOf(encodings.zipWithIndex.map { case (b, i) => (i.toLong, b, 0, 0) })
    val hashes = (0L to 4L).map(got(_))
    assert(hashes.forall(_.exists(_._2 == "pixels")), s"regimes: $got")
    assert(hashes.map(_.get._1).distinct.size == 1,
      s"color models of the SAME picture diverged: $got")
    // and the feature means agree across models too (palette expansion
    // and sub-byte scaling feed the same BT.601 stat path)
    import spark.implicits._
    val feats = Multimodal.extractFeatures(spark,
      encodings.zipWithIndex.map { case (b, i) =>
        Multimodal.MediaRow(i.toLong, b, "image/png", 0, 0) }.toDF())
      .collect().map(f => f.doc_id -> f).toMap
    assert(feats.values.forall(_.kind == "pixels"),
      s"kinds: ${feats.values.map(f => f.doc_id -> f.kind)}")
    val lums = feats.values.map(_.feature.last).toSeq
    assert(lums.distinct.size == 1, s"luminance means diverged: $lums")

    // a palette PNG whose PLTE CRC is corrupt degrades to the payload
    // regime (never garbage pixels)
    val corrupt = palPng.clone()
    val plteAt = {
      var i = 0
      while (!(corrupt(i) == 'P' && corrupt(i + 1) == 'L' &&
        corrupt(i + 2) == 'T' && corrupt(i + 3) == 'E')) i += 1
      i
    }
    corrupt(plteAt + 4) = (corrupt(plteAt + 4) ^ 0x55).toByte // first entry
    val gotBad = pxOf(Seq((9L, corrupt, 4, 4)))
    assert(gotBad(9L).exists(_._2 == "payload"),
      s"corrupt PLTE must fall back to payload bytes: $gotBad")
  }

  test("16-bit and Adam7-interlaced encodings of the same picture hash to the golden") {
    // five more byte-different encodings of the CANONICAL plane: deep
    // color (16-bit gray and RGB, samples v*257 per the spec — decode
    // folds the high byte back to v exactly) and progressive (Adam7
    // gray/RGB with mixed per-pass-row filters, and the two combined)
    val deep = Multimodal.encodePng(W, H, 0, plane,
      (0 until H).map(_ % 5), 6, bitDepth = 16)
    val deepRgb = Multimodal.encodePng(W, H, 2,
      plane.flatMap(b => Array(b, b, b)), (0 until H).map(_ % 3), 9,
      bitDepth = 16, splitIdat = true)
    val adam7 = Multimodal.encodePng(W, H, 0, plane,
      Seq(0, 1, 2, 3, 4), 6, interlace = true)
    val adam7Rgb = Multimodal.encodePng(W, H, 2,
      plane.flatMap(b => Array(b, b, b)), Seq(4, 2, 0), 1, interlace = true)
    val adam7Deep = Multimodal.encodePng(W, H, 0, plane,
      Seq(1, 3), 9, bitDepth = 16, interlace = true)
    val encodings = Seq(deep, deepRgb, adam7, adam7Rgb, adam7Deep)
    assert(encodings.map(_.toSeq).distinct.size == 5,
      "fixture encodings must differ at the byte level")
    val got = pxOf(encodings.zipWithIndex.map { case (b, i) => (i.toLong, b, 0, 0) })
    (0L to 4L).foreach { id =>
      assert(got(id).contains((Golden, "pixels")),
        s"doc $id: expected the canonical-plane golden, got $got")
    }

    // sub-byte + interlace: a 4-bit gray Adam7 image equals its plain
    // 8-bit encoding (scatter writes PACKED bits at final positions)
    val vals = Array.tabulate(W * H) { p =>
      val x = p % W; val y = p / W
      ((x * 3 + y * 5 + (x * y) % 7) % 16)
    }
    val gray8Png = Multimodal.storedGrayPng(vals.map(v => (v * 17).toByte), W, H)
    val gray4i = Multimodal.encodePng(W, H, 0, vals.map(_.toByte),
      Seq(0, 2, 1), 9, bitDepth = 4, interlace = true)
    val got2 = pxOf(Seq((0L, gray8Png, 0, 0), (1L, gray4i, 0, 0)))
    assert(got2(0L).isDefined && got2(0L) == got2(1L),
      s"4-bit Adam7 must decode to the same plane as 8-bit gray: $got2")
  }

  test("GIF and BMP encodings of the same picture hash like PNG") {
    // the canonical plane as: GIF sequential, GIF 4-pass interlaced
    // (identity gray color table — BT.601 of equal channels is the
    // gray value exactly), BMP 24-bit bottom-up, BMP 24-bit top-down,
    // BMP 8-bit paletted — five more byte-incompatible containers that
    // must all land on the frozen golden
    val grayCt = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    val rgb = plane.flatMap(b => Array(b, b, b))
    val encodings = Seq(
      Multimodal.encodeGif(W, H, plane, grayCt),
      Multimodal.encodeGif(W, H, plane, grayCt, interlace = true),
      Multimodal.encodeBmp(W, H, rgb),
      Multimodal.encodeBmp(W, H, rgb, topDown = true),
      Multimodal.encodeBmp8(W, H, plane, grayCt),
      // BI_RLE8, both stream modes: encoded runs and absolute literals
      Multimodal.encodeBmpRle8(W, H, plane, grayCt),
      Multimodal.encodeBmpRle8(W, H, plane, grayCt, absoluteRuns = true))
    assert(encodings.map(_.toSeq).distinct.size == 7,
      "fixture encodings must differ at the byte level")
    val got = pxOf(encodings.zipWithIndex.map { case (b, i) => (i.toLong, b, 0, 0) })
    (0L to 6L).foreach { id =>
      assert(got(id).contains((Golden, "pixels")),
        s"doc $id: expected the canonical-plane golden, got $got")
    }

    // RLE8 escapes: a hand-built stream with a DELTA skip — skipped
    // pixels read palette entry 0 (black), equal to the explicit form
    val solid = Array.fill[Byte](6 * 4)(9)
    val withHole = solid.clone()
    // delta skips (2,1) from row-bottom (1, y-from-bottom 1): pixels at
    // bottom-up row 1 cols 1-5 and row 2 cols 0-2 read index 0
    for (c <- 1 until 6) withHole((4 - 1 - 1) * 6 + c) = 0
    for (c <- 0 until 3) withHole((4 - 1 - 2) * 6 + c) = 0
    val deltaRle = {
      val base = Multimodal.encodeBmpRle8(6, 4, solid, grayCt)
      val dataOff = 54 + 256 * 4
      // row0: run of 6; then col 1 of row 1, delta (2,1), finish row 2
      val stream = Array[Byte](6, 9, 0, 0, 1, 9, 0, 2, 2, 1, 3, 9,
        0, 0, 6, 9, 0, 0, 0, 1)
      val out = base.take(dataOff) ++ stream
      // patch file and data sizes
      def le32(b: Array[Byte], o: Int, v: Int): Unit = {
        b(o) = v.toByte; b(o + 1) = (v >> 8).toByte
        b(o + 2) = (v >> 16).toByte; b(o + 3) = (v >> 24).toByte
      }
      le32(out, 2, out.length); le32(out, 34, stream.length)
      out
    }
    val gotDelta = pxOf(Seq(
      (0L, deltaRle, 0, 0),
      (1L, Multimodal.encodeBmp8(6, 4, withHole, grayCt), 0, 0)))
    assert(gotDelta(0L).isDefined && gotDelta(0L) == gotDelta(1L),
      s"the delta escape must skip to palette-0 pixels: $gotDelta")

    // a truncated RLE stream degrades to the payload regime
    val rle = Multimodal.encodeBmpRle8(W, H, plane, grayCt)
    val gotRleCut = pxOf(Seq((9L, rle.take(rle.length - 5), 4, 4)))
    assert(gotRleCut(9L).exists(_._2 == "payload"),
      s"truncated RLE8 must fall back to payload bytes: $gotRleCut")

    // a big textured frame pushes the LZW dictionary through all code
    // widths up to 12 bits: GIF must still equal its BMP twin
    val bw = 80; val bh = 60
    val big = Array.tabulate(bw * bh) { p =>
      val x = p % bw; val y = p / bw
      (((x * 31 + y * 17 + (x * y) % 11) * 7) % 253).toByte
    }
    val gotBig = pxOf(Seq(
      (0L, Multimodal.encodeGif(bw, bh, big, grayCt), 0, 0),
      (1L, Multimodal.encodeBmp(bw, bh, big.flatMap(b => Array(b, b, b)), topDown = true), 0, 0)))
    assert(gotBig(0L).isDefined && gotBig(0L).exists(_._2 == "pixels") &&
      gotBig(0L) == gotBig(1L),
      s"LZW decode must reproduce the plane byte-for-byte: $gotBig")

    // a truncated LZW stream degrades to the payload regime, never
    // garbage pixels
    val gif = Multimodal.encodeGif(W, H, plane, grayCt)
    val cut = gif.take(gif.length - 24) ++ Array[Byte](0, 0x3b)
    val gotCut = pxOf(Seq((9L, cut, 4, 4)))
    assert(gotCut(9L).exists(_._2 == "payload"),
      s"truncated GIF must fall back to payload bytes: $gotCut")
  }

  test("4-bit and 1-bit paletted BMPs decode like their PNG twins") {
    val v16 = Array.tabulate(W * H) { p =>
      ((p % W * 7 + p / W * 11) % 16).toByte
    }
    val pal16 = Array.tabulate(16 * 3)(i => ((i / 3) * 17).toByte)
    val bmp4 = Multimodal.encodeBmpSub(W, H, v16, pal16, bits = 4)
    val png4 = Multimodal.encodePng(W, H, 0, v16,
      (0 until H).map(_ % 5), 6, bitDepth = 4)
    val v2 = v16.map(v => (v % 2).toByte)
    val pal2 = Array[Byte](0, 0, 0, -1, -1, -1)
    val bmp1 = Multimodal.encodeBmpSub(W, H, v2, pal2, bits = 1,
      topDown = true)
    val png1 = Multimodal.encodePng(W, H, 0, v2, (0 until H).map(_ % 3),
      9, bitDepth = 1)
    val got = pxOf(Seq((0L, bmp4, 0, 0), (1L, png4, 0, 0),
      (2L, bmp1, 0, 0), (3L, png1, 0, 0)))
    assert(got(0L).exists(_._2 == "pixels") && got(0L) == got(1L),
      s"16-color BMP must hash like its PNG twin: $got")
    assert(got(2L).exists(_._2 == "pixels") && got(2L) == got(3L),
      s"2-color BMP must hash like its PNG twin: $got")
    assert(got(0L) != got(2L), "the two pictures must differ")
    // through the favicon wrapper too: the 16-color icon classic
    val ico4 = Multimodal.encodeIco(Seq((W, H,
      Multimodal.bmpToIcoDib(bmp4))))
    val gotIco = pxOf(Seq((4L, ico4, 0, 0)))
    assert(gotIco(4L) == got(0L), s"16-color ICO: $gotIco vs ${got(0L)}")
  }

  test("ICO favicons hash like their contained image; largest entry wins") {
    val rgb = plane.flatMap(b => Array(b, b, b))
    // a multi-entry icon: a tiny 8x8 decoy DIB first, the real picture
    // second — the directory walk must pick the LARGEST entry
    val decoy = Multimodal.bmpToIcoDib(
      Multimodal.encodeBmp(8, 8, Array.fill(8 * 8 * 3)(7.toByte)))
    val real = Multimodal.bmpToIcoDib(Multimodal.encodeBmp(W, H, rgb))
    val multi = Multimodal.encodeIco(Seq((8, 8, decoy), (W, H, real)))
    val pngEntry = Multimodal.encodeIco(Seq((W, H,
      Multimodal.encodePng(W, H, 2, rgb, (0 until H).map(_ % 3), 6))))
    val got = pxOf(Seq((0L, multi, 0, 0), (1L, pngEntry, 0, 0)))
    assert(got(0L).contains((Golden, "pixels")), s"multi-entry DIB: $got")
    assert(got(1L).contains((Golden, "pixels")), s"PNG entry: $got")
    // a directory pointing past the payload degrades to payload bytes
    val cut = multi.take(multi.length - 40)
    val gotCut = pxOf(Seq((9L, cut, 4, 4)))
    assert(gotCut(9L).exists(_._2 == "payload"),
      s"truncated ICO must fall back: $gotCut")
  }

  test("TIFF encodings of the same picture hash like PNG; decode matches ImageIO") {
    val grayPal = Array.tabulate(768)(i => (i / 3).toByte)
    val encodings = Seq(
      Multimodal.encodeTiff(W, H, plane, 1),
      Multimodal.encodeTiff(W, H, plane.flatMap(b => Array(b, b, b)), 2,
        bigEndian = true),
      Multimodal.encodeTiff(W, H, plane, 0), // white-is-zero polarity
      Multimodal.encodeTiff(W, H, plane, 3, palette = grayPal),
      Multimodal.encodeTiff(W, H, plane, 1, packBits = true,
        rowsPerStrip = 5))
    assert(encodings.map(_.toSeq).distinct.size == 5,
      "fixture encodings must differ at the byte level")
    val got = pxOf(encodings.zipWithIndex.map { case (b, i) =>
      (i.toLong, b, 0, 0) })
    (0L to 4L).foreach { id =>
      assert(got(id).contains((Golden, "pixels")),
        s"doc $id: expected the canonical-plane golden, got $got")
    }

    // cross-decoder conformance: the JDK ships a TIFF ImageIO reader
    // (unlike WebP), so our IFD/PackBits walk is held against an
    // INDEPENDENT implementation pixel-for-pixel, not just against our
    // own encoder. Gray fixtures compare RASTER samples (getRGB runs
    // ImageIO's linear-gray -> sRGB gamma conversion — not a decode
    // difference); the inverted-polarity and palette fixtures are
    // excluded here because ImageIO's WhiteIsZero/16-bit-colormap
    // normalization choices are its own — the closed-form DuckDB
    // oracle (ext_image_px_tiff) pins both against ground truth.
    for ((bytes, mode) <- Seq(encodings(0) -> "gray",
        encodings(1) -> "rgb", encodings(4) -> "gray")) {
      val im = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(im != null, s"ImageIO rejected a $mode fixture — encoder invalid")
      val (px, w2, h2) = Multimodal.ContainerCodec.tiffRgb(bytes).get
      assert(w2 == im.getWidth && h2 == im.getHeight, s"$mode geometry")
      val raster = im.getRaster
      for (y <- 0 until h2; x <- 0 until w2) {
        val o = (y * w2 + x) * 3
        if (mode == "gray")
          assert(raster.getSample(x, y, 0) == (px(o) & 0xff),
            s"$mode pixel ($x,$y): ImageIO ${raster.getSample(x, y, 0)} " +
              s"vs ${px(o) & 0xff}")
        else {
          val p = im.getRGB(x, y)
          assert(((p >> 16) & 0xff) == (px(o) & 0xff) &&
            ((p >> 8) & 0xff) == (px(o + 1) & 0xff) &&
            (p & 0xff) == (px(o + 2) & 0xff),
            s"$mode pixel ($x,$y): ImageIO ${p.toHexString} vs " +
              s"(${px(o)},${px(o + 1)},${px(o + 2)})")
        }
      }
    }

    // LZW-compressed TIFF stays a documented boundary: degrade, never lie
    val lzw = Multimodal.encodeTiff(W, H, plane, 1)
    // flip the Compression tag value (entry 3 of 9 ascending; find 259)
    val gotCut = pxOf(Seq((9L, {
      val c = lzw.clone
      def u16(o: Int) = (c(o) & 0xff) | ((c(o + 1) & 0xff) << 8)
      val ifd = u16(4) | (u16(6) << 16)
      val entries = u16(ifd)
      val eo = (0 until entries).map(ifd + 2 + _ * 12)
        .find(o => u16(o) == 259)
        .getOrElse(fail("compression tag not found in fixture"))
      c(eo + 8) = 5 // LZW
      c
    }, 4, 4)))
    assert(gotCut(9L).exists(_._2 == "payload"),
      s"LZW TIFF must fall back to payload bytes: $gotCut")
  }

  test("lossless WebP (VP8L) encodings of the same picture hash like PNG") {
    // the canonical plane through the Vp8l encoder's knobs — four more
    // byte-incompatible containers on the frozen golden: the fifth
    // container format joins the pixel regime (a WebP re-save of a PNG
    // is a first-class crawl dup class)
    val encodings = Seq(
      Multimodal.encodeWebpL(W, H, plane),
      Multimodal.encodeWebpL(W, H, plane, subtractGreen = true),
      Multimodal.encodeWebpL(W, H, plane, lz77 = true, cacheBits = 6),
      Multimodal.encodeWebpL(W, H, plane, predictor = 11))
    assert(encodings.map(_.toSeq).distinct.size == 4,
      "fixture encodings must differ at the byte level")
    val got = pxOf(encodings.zipWithIndex.map { case (b, i) =>
      (i.toLong, b, 0, 0) })
    (0L to 3L).foreach { id =>
      assert(got(id).contains((Golden, "pixels")),
        s"doc $id: expected the canonical-plane golden, got $got")
    }

    // a truncated VP8L stream degrades to the payload regime
    val whole = Multimodal.encodeWebpL(W, H, plane)
    val gotCut = pxOf(Seq((9L, whole.take(whole.length - 8), 4, 4)))
    assert(gotCut(9L).exists(_._2 == "payload"),
      s"truncated WebP must fall back to payload bytes: $gotCut")

    // lossy VP8 keeps the payload regime (codec boundary) — geometry
    // comes from the container walk, pixels never pretend
    val lossy = {
      val payload = new Array[Byte](12)
      payload(3) = 0x9d.toByte; payload(4) = 0x01; payload(5) = 0x2a
      payload(6) = 20; payload(8) = 10
      val out = new java.io.ByteArrayOutputStream()
      out.write("RIFF".getBytes("US-ASCII"))
      out.write(Array[Byte]((4 + 8 + 12).toByte, 0, 0, 0))
      out.write("WEBP".getBytes("US-ASCII"))
      out.write("VP8 ".getBytes("US-ASCII"))
      out.write(Array[Byte](12, 0, 0, 0))
      out.write(payload)
      out.toByteArray
    }
    val gotLossy = pxOf(Seq((8L, lossy, 4, 4)))
    assert(gotLossy(8L).exists(_._2 == "payload"),
      s"lossy VP8 must stay in the payload regime: $gotLossy")
  }

  test("a half-size thumbnail lands within the near-dup band (grid IS a resize)") {
    // the 9x8 area-mean grid is itself a box resize, so a 2x2
    // box-downscaled THUMBNAIL of a picture — the classic crawl dup
    // the byte/payload regimes can never catch — hashes a few
    // grid-misalignment bits away, inside imageNearDups' default band
    val bw = 48; val bh = 32
    val big = Array.tabulate(bw * bh) { p =>
      val x = p % bw; val y = p / bw
      (((x * 11 + y * 5 + (x * y) % 7) * 3) % 251).toByte
    }
    val thumb = Array.tabulate((bw / 2) * (bh / 2)) { p =>
      val x = (p % (bw / 2)) * 2; val y = (p / (bw / 2)) * 2
      (((big(y * bw + x) & 0xff) + (big(y * bw + x + 1) & 0xff) +
        (big((y + 1) * bw + x) & 0xff) +
        (big((y + 1) * bw + x + 1) & 0xff)) / 4).toByte
    }
    val media = Seq(
      (1L, Multimodal.storedGrayPng(big, bw, bh)),
      (2L, Multimodal.storedGrayPng(thumb, bw / 2, bh / 2)),
      (3L, Multimodal.storedGrayPng(plane, W, H))) // unrelated picture
      .toDF("doc_id", "media")
      .withColumn("width", lit(0)).withColumn("height", lit(0))
    val pairs = Multimodal.imageNearDups(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"thumbnail must pair with its original and nothing else: $pairs")
  }

  test("monotone brightness shift on the decoded plane keeps the hash") {
    val bright = plane.map(b => math.min((b & 0xff) + 40, 255).toByte)
    val got = pxOf(Seq(
      (1L, Multimodal.storedGrayPng(bright, W, H), 0, 0)))
    assert(got(1L).contains((Golden, "pixels")),
      s"brightness shift changed gradient signs: ${got(1L)}")
  }

  test("JPEG re-compression and PNG->JPEG re-encode land within the near-dup threshold") {
    // 8px-aligned checkerboard: JPEG's DCT blocks preserve it well, so
    // a real crawl-style re-encode chain (PNG -> JPEG q90 -> JPEG q60)
    // must stay within the default maxHamming=10 band
    val w = 64; val h = 48
    val checker = Array.tabulate(w * h) { p =>
      val x = p % w; val y = p / w
      (if ((x / 8 + y / 8) % 2 == 0) 230 else 25).toByte
    }
    val png = Multimodal.storedGrayPng(checker, w, h)
    val j90 = jpegBytes(checker, w, h, 0.9f)
    val j60 = jpegBytes(checker, w, h, 0.6f)
    val got = pxOf(Seq((1L, png, 0, 0), (2L, j90, 0, 0), (3L, j60, 0, 0)))
    assert(got.values.forall(_.exists(_._2 == "pixels")), s"regimes: $got")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val (p, q90, q60) = (got(1L).get._1, got(2L).get._1, got(3L).get._1)
    assert(ham(p, q90) <= 10, s"PNG vs JPEG q90: hamming ${ham(p, q90)}")
    assert(ham(q90, q60) <= 10, s"JPEG q90 vs q60: hamming ${ham(q90, q60)}")
    assert(ham(p, q60) <= 10, s"PNG vs JPEG q60: hamming ${ham(p, q60)}")
  }

  test("payload fallback is bit-identical to graft_dhash; degenerate rows are NULL") {
    val fake = "not an image at all, just opaque bytes".getBytes("UTF-8")
    val rows = Seq(
      (1L, fake, 8, 5),
      (2L, Array.empty[Byte], 8, 8), // empty payload: valid geometry -> 0L
      (3L, fake, 0, 8),              // zero width -> null
      (4L, null.asInstanceOf[Array[Byte]], 8, 8)) // null media -> null
    val got = pxOf(rows)
    val legacy = Seq((1L, fake, 8, 5)).toDF("doc_id", "media", "width", "height")
      .select(Multimodal.dHash(col("media"), col("width"), col("height")))
      .head().getLong(0)
    assert(got(1L).contains((legacy, "payload")),
      s"payload regime drifted from graft_dhash: ${got(1L)} vs $legacy")
    assert(got(2L).contains((0L, "payload")), s"empty payload: ${got(2L)}")
    assert(got(3L).isEmpty && got(4L).isEmpty,
      s"degenerate rows must be NULL: ${got(3L)} ${got(4L)}")
  }

  test("native graft_dhash_px and the UDF fallback are bit-identical") {
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    val rows = Seq(
      (1L, Multimodal.storedGrayPng(plane, W, H), 0, 0),
      (2L, jpegBytes(plane, W, H, 0.8f), 0, 0),
      (3L, "opaque payload".getBytes("UTF-8"), 7, 3),
      (4L, "x".getBytes("UTF-8"), 0, 0),
      (5L, Array.empty[Byte], 2, 2))
    val native = pxOf(rows)
    val reg = spark.sessionState.functionRegistry
    val fid = FunctionIdentifier("graft_dhash_px")
    val (info, builder) =
      (reg.lookupFunction(fid).get, reg.lookupFunctionBuilder(fid).get)
    val fallback =
      try {
        reg.dropFunction(fid)
        assert(!spark.catalog.functionExists("graft_dhash_px"))
        pxOf(rows)
      } finally reg.registerFunction(fid, info, builder)
    assert(native == fallback, s"native $native != udf fallback $fallback")
    assert(spark.catalog.functionExists("graft_dhash_px"))
  }

  test("IncrementalImageDedup: a RE-ENCODED image dedups cross-batch (the store's contract)") {
    val store = tmpDir("graft_px_incr") + "/store"
    val other = Array.tabulate(W * H)(p => ((p * 37 + 11) % 256).toByte)
    // batch 1: the original picture (max-compression PNG) + an unrelated one
    val b1 = Seq(
      (10L, Multimodal.encodePng(W, H, 0, plane, Seq.fill(H)(0), 9), 0, 0),
      (11L, Multimodal.storedGrayPng(other, W, H), 0, 0))
      .toDF("doc_id", "media", "width", "height")
    // batch 2: the SAME picture re-encoded (different filters, level,
    // IDAT split — byte-level different payload) + a fresh one
    val reenc = Multimodal.encodePng(W, H, 0, plane,
      (0 until H).map(_ % 5), 1, splitIdat = true)
    val fresh = Array.tabulate(W * H)(p => ((p * 91 + 3) % 256).toByte)
    val b2 = Seq(
      (20L, reenc, 0, 0),
      (21L, Multimodal.storedGrayPng(fresh, W, H), 0, 0))
      .toDF("doc_id", "media", "width", "height")

    val p1 = IncrementalImageDedup.ingest(spark, b1, store).collect()
    assert(p1.isEmpty, s"first batch has no dups: ${p1.toSeq}")
    val p2 = IncrementalImageDedup.ingest(spark, b2, store)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(p2.toSeq == Seq((10L, 20L, 0)),
      s"re-encoded copy must pair cross-batch at hamming 0: ${p2.toSeq}")

    // takedown: forget both copies; a third re-encode is admitted fresh
    IncrementalImageDedup.forget(spark, store,
      Seq(10L, 20L).toDF("doc_id"))
    val b3 = Seq((30L, Multimodal.storedGrayPng(plane, W, H), 0, 0))
      .toDF("doc_id", "media", "width", "height")
    val p3 = IncrementalImageDedup.ingest(spark, b3, store).collect()
    assert(p3.isEmpty, s"forgotten image must readmit: ${p3.toSeq}")
  }

  test("imageNearDups + census over a mixed-regime corpus") {
    val corpus = Seq(
      (1L, Multimodal.storedGrayPng(plane, W, H), 0, 0),
      (2L, Multimodal.encodePng(W, H, 0, plane, (0 until H).map(_ % 5), 1), 0, 0),
      (3L, "payload-only bytes here".getBytes("UTF-8"), 6, 4),
      (4L, "payload-only bytes here".getBytes("UTF-8"), 6, 4),
      (5L, null.asInstanceOf[Array[Byte]], 6, 4),
      (6L, "zz".getBytes("UTF-8"), 0, 0))
      .toDF("doc_id", "media", "width", "height")
    val pairs = Multimodal.imageNearDups(corpus, maxHamming = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 1~2: re-encoded pixels; 3~4: identical payloads; degenerate 5/6
    // never pair (the advice-fixed NULL posture)
    assert(pairs == Set((1L, 2L), (3L, 4L)), s"pairs: $pairs")
    val census = Multimodal.imageHashCensus(corpus)
      .collect().map(r => (if (r.isNullAt(0)) "null" else r.getString(0))
        -> r.getLong(1)).toMap
    assert(census == Map("pixels" -> 2L, "payload" -> 2L, "null" -> 2L),
      s"census: $census")
  }
}
