package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Cross-surface mutation soak: every r15 extraction surface against
  * bit-flipped, truncated, and pure-junk inputs in one deterministic
  * sweep — a standing second layer under CodecProperties' randomized
  * seeds (the scaled-up 28k-mutation version of this sweep ran clean
  * at round close).
  */
class SoakSpec extends AnyFunSuite {
  test("r15 extraction surfaces survive flips, truncations, junk") {
    val r = new scala.util.Random(987654321L)
    val plane = Array.tabulate(15 * 11)(p => ((p * 37) % 251).toByte)
    val bases: Seq[Array[Byte]] = Seq(
      PngText.withText(
        Multimodal.encodePng(15, 11, 0, plane, (0 until 11).map(_ % 5)),
        Seq(("Software", "fuzz tool", null, false),
          ("parameters", "fuzz prompt", "en", true))),
      ("[Script Info]\nTitle: f\n\n[Events]\nFormat: Layer, Start, End, " +
        "Style, Name, MarginL, MarginR, MarginV, Effect, Text\n" +
        "Dialogue: 0,0:00:01.00,0:00:02.00,Default,,0,0,0,,fuzz ass\n")
        .getBytes("UTF-8"),
      ("<!DOCTYPE html><html><head><meta charset=utf-8><title>fz</title>" +
        "<meta name=description content=\"d\"><link rel=canonical " +
        "href=https://x/y></head><body><p>fuzz</p></body></html>")
        .getBytes("UTF-8"),
      Office.encodeOdt(Seq("fuzz odt para", "two"), title = "t"),
      Office.zipWrap(Seq(
        ("a.html", "<html><p>m</p></html>".getBytes("UTF-8")),
        ("b.bin", Array.tabulate(32)(_.toByte)))),
      AudioTags.id3v2Wrap(
        Array[Byte](0xff.toByte, 0xfb.toByte, 0x92.toByte, 0x40) ++
          new Array[Byte](64), artist = "a", lyrics = "l1\nl2",
        v24 = true, utf8 = true))
    var n = 0
    for (base <- bases; _ <- 0 until 400) {
      val mut = base.clone()
      for (_ <- 0 to r.nextInt(6))
        mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
      try {
        PngText.chunks(mut)
        Subtitles.parseAss(new String(mut, java.nio.charset.StandardCharsets.UTF_8))
        Html.meta(mut); Html.text(mut)
        Office.text(mut); Office.zipMembersRaw(mut)
        AudioTags.of(mut)
        Multimodal.ContainerCodec.decode(
          Seq(Multimodal.MediaRow(1L, mut, "x", 0, 0)))
        n += 1
      } catch { case e: Throwable =>
        fail(s"soak: base ${bases.indexOf(base)}: $e")
      }
    }
    // truncations of every base
    for (base <- bases; cut <- 1 until base.length by 17) {
      val t = base.take(cut)
      PngText.chunks(t)
      Subtitles.parseAss(new String(t, java.nio.charset.StandardCharsets.UTF_8))
      Html.meta(t); Html.text(t); Office.text(t)
      Office.zipMembersRaw(t); AudioTags.of(t)
      n += 1
    }
    // pure random junk
    for (_ <- 0 until 400) {
      val j = Array.fill(1 + r.nextInt(600))(r.nextInt(256).toByte)
      PngText.chunks(j)
      Subtitles.parseAss(new String(j, java.nio.charset.StandardCharsets.UTF_8))
      Html.meta(j); Html.text(j); Office.text(j)
      Office.zipMembersRaw(j); AudioTags.of(j)
      n += 1
    }
    assert(n > 2000, s"soak ran $n inputs")
  }
}
