package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** PNG textual metadata (tEXt/zTXt/iTXt): a hand-packed chunk golden
  * (writer-independent), round trips through all three carriers, the
  * CRC gate, malformed-payload skips, and hostile totality.
  */
class PngTextSpec extends AnyFunSuite {

  private def basePng = Multimodal.encodePng(6, 5, 0,
    Array.tabulate(30)(i => (i * 8).toByte), (0 until 5).map(_ => 0))

  test("hand-packed tEXt chunk extracts (writer-independent pin)") {
    // the chunk is assembled byte by byte BY THE TEST — length,
    // type, keyword NUL value, CRC over type+data — so a matching
    // writer/reader bug pair cannot cancel
    val png = basePng
    val kw = "Software".getBytes("ISO-8859-1")
    val value = "hand golden 1.0".getBytes("ISO-8859-1")
    val data = kw ++ Array[Byte](0) ++ value
    val body = "tEXt".getBytes("US-ASCII") ++ data
    val crc = new java.util.zip.CRC32
    crc.update(body)
    def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
      (v >> 8).toByte, v.toByte)
    val chunk = be32(data.length.toLong) ++ body ++ be32(crc.getValue)
    val doc = png.take(33) ++ chunk ++ png.drop(33)
    val got = PngText.chunks(doc).get
    assert(got == Seq(PngText.PngTextRow("Software",
      "hand golden 1.0", None, compressed = false)), s"$got")
  }

  test("all three carriers round trip; file order and flags preserved") {
    val doc = PngText.withText(basePng, Seq(
      ("Comment", "plain text value", null, false),
      ("Description", "deflated latin-1 é", null, true),
      ("parameters", "prompt: a cat — seed 42", "en", true),
      ("Title", "uncompressed utf-8 σ", "de-DE", false)))
    val got = PngText.chunks(doc).get
    assert(got == Seq(
      PngText.PngTextRow("Comment", "plain text value", None, false),
      PngText.PngTextRow("Description", "deflated latin-1 é",
        None, true),
      PngText.PngTextRow("parameters", "prompt: a cat — seed 42",
        Some("en"), true),
      PngText.PngTextRow("Title", "uncompressed utf-8 σ",
        Some("de-DE"), false)), s"$got")
  }

  test("a CRC-corrupt chunk is skipped, later chunks survive") {
    val doc = PngText.withText(basePng, Seq(
      ("First", "will corrupt", null, false),
      ("Second", "survives", null, false)))
    // flip one byte inside the FIRST chunk's value
    val at = doc.indexOfSlice("will corrupt".getBytes("ISO-8859-1"))
    assert(at > 0)
    val bad = doc.clone()
    bad(at) = (bad(at) ^ 0x40).toByte
    val got = PngText.chunks(bad).get
    assert(got ==
      Seq(PngText.PngTextRow("Second", "survives", None, false)),
      s"$got")
  }

  test("malformed payloads skip: no NUL, empty keyword, bad methods") {
    def chunk(id: String, data: Array[Byte]): Array[Byte] = {
      val body = id.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32
      crc.update(body)
      def be32(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte,
        (v >> 8).toByte, v.toByte)
      be32(data.length.toLong) ++ body ++ be32(crc.getValue)
    }
    val png = basePng
    val bads = Seq(
      chunk("tEXt", "no nul here".getBytes("ISO-8859-1")),
      chunk("tEXt", Array[Byte](0) ++ "empty kw".getBytes("ISO-8859-1")),
      chunk("tEXt", ("k" * 80).getBytes("ISO-8859-1") ++
        Array[Byte](0) ++ "kw too long".getBytes("ISO-8859-1")),
      chunk("zTXt", "kw".getBytes("ISO-8859-1") ++
        Array[Byte](0, 9) ++ "bad method".getBytes("ISO-8859-1")),
      chunk("zTXt", "kw".getBytes("ISO-8859-1") ++
        Array[Byte](0, 0) ++ "not deflate".getBytes("ISO-8859-1")),
      chunk("iTXt", "kw".getBytes("ISO-8859-1") ++
        Array[Byte](0, 2, 0, 0, 0) ++ "bad flag".getBytes("UTF-8")))
    val good = chunk("tEXt", "ok".getBytes("ISO-8859-1") ++
      Array[Byte](0) ++ "kept".getBytes("ISO-8859-1"))
    val doc = png.take(33) ++ bads.flatten ++ good ++ png.drop(33)
    val got = PngText.chunks(doc).get
    assert(got == Seq(PngText.PngTextRow("ok", "kept", None, false)),
      s"$got")
  }

  test("text-less PNG yields no rows; non-PNG yields None; table routes") {
    assert(PngText.chunks(basePng).get.isEmpty)
    assert(PngText.chunks("not a png".getBytes("UTF-8")) == None)
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = PngText.table(spark, Seq(
        (1L, PngText.withText(basePng,
          Seq(("Author", "table author", null, false)))),
        (2L, basePng),
        (3L, "junk".getBytes("UTF-8"))).toDF("doc_id", "media"))
      .as[(Long, Int, String, Option[String], Boolean, String)]
      .collect().toSeq
    assert(rows == Seq((1L, 0, "Author", None, false, "table author")),
      s"$rows")
  }

  test("hostile totality: bit flips, truncations, junk never throw") {
    val doc = PngText.withText(basePng, Seq(
      ("A", "alpha", null, false),
      ("B", "beta", null, true),
      ("C", "gamma", "en", true)))
    val r = new scala.util.Random(53)
    for (_ <- 0 until 300) {
      val mut = doc.clone()
      for (_ <- 0 to r.nextInt(4))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      PngText.chunks(mut) // must not throw
    }
    for (cut <- 1 until doc.length by 17)
      PngText.chunks(doc.take(cut))
    assert(PngText.chunks(Array.fill(64)(0x11.toByte)) == None)
  }
}
