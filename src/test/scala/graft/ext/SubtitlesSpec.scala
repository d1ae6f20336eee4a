package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Subtitle extraction: Matroska S_TEXT/UTF8 tracks and SRT/WebVTT
  * text files — hand-computed cue goldens, scaling, totality.
  */
class SubtitlesSpec extends AnyFunSuite {

  test("Matroska S_TEXT/UTF8 cues round-trip through minimalWebm") {
    val cues = Seq((1000L, 500L, "first cue"), (2500L, 750L, "second\ncue"),
      (10000L, 1200L, "ünïcode ok"))
    val mkv = Multimodal.minimalWebm(1000000L, 20000.0, 320, 240,
      frames = Seq(Array.tabulate(40)(_.toByte)),
      subtitleCues = cues)
    val got = Subtitles.mkvCues(mkv).get
    assert(got.map(c => (c.startMs, c.durMs, c.text)) == cues,
      s"got $got")
    // exact equality above already proves the track-1 video
    // frames never leak into the cue list
    assert(got.forall(_.track == 3))
  }

  test("TimestampScale scales block times: 100 us ticks halve to ms correctly") {
    // scale 100000 ns = 0.1 ms per tick: tick 4000 -> 400 ms
    val mkv = Multimodal.minimalWebm(100000L, 90000.0, 160, 120,
      subtitleCues = Seq((4000L, 2500L, "scaled")))
    val Seq(c) = Subtitles.mkvCues(mkv).get
    assert(c.startMs == 400L && c.durMs == 250L, s"$c")
  }

  test("streamed-mux layout: Clusters before Tracks keep every cue (two-pass pin)") {
    // legal in live/streamed Matroska: the muxer flushes Clusters
    // before Info/Tracks land in segment order — a single-pass reader
    // that binds subtitle tracks only on seeing Tracks drops ALL cues
    val cues = Seq((800L, 400L, "early cue"), (3000L, 600L, "late cue"))
    val mkv = Multimodal.minimalWebm(100000L, 50000.0, 160, 120,
      frames = Seq(Array.tabulate(20)(_.toByte)),
      subtitleCues = cues, clustersFirst = true)
    val got = Subtitles.mkvCues(mkv).get
    // Info (TimestampScale 100 us) also trails the clusters: the
    // two-pass walk must still scale 800 ticks -> 80 ms
    assert(got.map(c => (c.startMs, c.durMs, c.text)) ==
      Seq((80L, 40L, "early cue"), (300L, 60L, "late cue")), s"$got")
  }

  test("a subtitle-less WebM yields None, not an empty table row set") {
    val mkv = Multimodal.minimalWebm(1000000L, 1000.0, 320, 240,
      frames = Seq(Array.tabulate(30)(_.toByte)))
    assert(Subtitles.mkvCues(mkv) == None)
  }

  test("MP4 tx3g cues round-trip the full sample-table walk (odd count = 2 stsc runs)") {
    val cues = Seq((750L, "mp4 one"), (1250L, "mp4 twö"), (500L, "mp4 three"))
    val mp4 = Multimodal.minimalMp4Tx3g(1000, cues)
    val got = Subtitles.mp4Cues(mp4).get
    // contiguous from t=0: starts are the duration prefix sums
    assert(got.map(c => (c.startMs, c.durMs, c.text)) == Seq(
      (0L, 750L, "mp4 one"), (750L, 1250L, "mp4 twö"),
      (2000L, 500L, "mp4 three")), s"$got")
  }

  test("MP4 tx3g timescale scaling: 600-tick clock lands exact millis") {
    val mp4 = Multimodal.minimalMp4Tx3g(600, Seq((1200L, "two sec"),
      (300L, "half sec")))
    val got = Subtitles.mp4Cues(mp4).get
    assert(got.map(c => (c.startMs, c.durMs)) ==
      Seq((0L, 2000L), (2000L, 500L)), s"$got")
  }

  test("a text-less MP4 yields None; tx3g hostile totality") {
    val plain = Multimodal.minimalMp4(600, 1200, 1, 320, 240,
      mdat = Array.tabulate(64)(_.toByte))
    assert(Subtitles.mp4Cues(plain) == None)
    val mp4 = Multimodal.minimalMp4Tx3g(1000, Seq((500L, "target")))
    val r = new scala.util.Random(43)
    for (_ <- 0 until 200) {
      val b = mp4.clone()
      b(r.nextInt(b.length)) = r.nextInt(256).toByte
      Subtitles.mp4Cues(b) // must not throw
    }
    for (len <- Seq(0, 9, 40, mp4.length / 2))
      Subtitles.mp4Cues(java.util.Arrays.copyOf(mp4, len))
  }

  test("SRT parse: indices, comma millis, multi-line text, blank separation") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:02,500
        |Hello there.
        |Second line.
        |
        |2
        |00:01:00,250 --> 00:01:03,000
        |Goodbye.
        |""".stripMargin
    val cues = Subtitles.parseSrt(srt)
    assert(cues == Seq(
      Subtitles.Cue(0, 1000L, 1500L, "Hello there.\nSecond line."),
      Subtitles.Cue(0, 60250L, 2750L, "Goodbye.")), s"$cues")
  }

  test("WebVTT parse: header, dot millis, hour-less timings, NOTE ignored") {
    val vtt =
      """WEBVTT
        |
        |NOTE this block has no timing line and is skipped
        |
        |00:04.000 --> 00:06.500
        |Caption one
        |
        |01:02:03.450 --> 01:02:04.000
        |Caption two
        |""".stripMargin
    val cues = Subtitles.parseSrt(vtt)
    assert(cues == Seq(
      Subtitles.Cue(0, 4000L, 2500L, "Caption one"),
      Subtitles.Cue(0, 3723450L, 550L, "Caption two")), s"$cues")
  }

  test("track 127 (the all-ones 1-byte vint) keeps its cues") {
    // the block's track-number vint 0xFF is a legitimate track 127 —
    // the size-field 'unknown' sentinel must NOT apply here
    def el(id: Long, payload: Array[Byte]): Array[Byte] = {
      var len = 1
      while ((id >>> (8 * len)) != 0) len += 1
      val idb = (0 until len).map(i =>
        ((id >>> (8 * (len - 1 - i))) & 0xff).toByte).toArray
      val sz = new Array[Byte](8)
      sz(0) = 1
      var v = payload.length.toLong
      for (i <- 7 to 1 by -1) { sz(i) = (v & 0xff).toByte; v >>= 8 }
      idb ++ sz ++ payload
    }
    def uint(v: Long): Array[Byte] = {
      var len = 1
      while ((v >>> (8 * len)) != 0) len += 1
      (0 until len).map(i =>
        ((v >>> (8 * (len - 1 - i))) & 0xff).toByte).toArray
    }
    val trackEntry = el(0xAEL,
      el(0xD7L, uint(127)) ++ el(0x83L, uint(0x11)) ++
        el(0x86L, "S_TEXT/UTF8".getBytes("US-ASCII")))
    val block = el(0xA0L, // BlockGroup: Block(track 0xFF, rel 0) + dur
      el(0xA1L, Array[Byte](0xff.toByte, 0, 0, 0) ++
        "high track".getBytes("UTF-8")) ++
        el(0x9BL, uint(640)))
    val mkv = el(0x1A45DFA3L, Array.emptyByteArray) ++
      el(0x18538067L,
        el(0x1654AE6BL, trackEntry) ++
          el(0x1F43B675L, el(0xE7L, uint(100)) ++ block))
    val got = Subtitles.mkvCues(mkv).get
    assert(got == Seq(Subtitles.Cue(127, 100L, 640L, "high track")),
      s"$got")
  }

  test("S_TEXT/ASS MKV track: 8th-comma split, override strip, mixed with UTF8") {
    // one file carrying BOTH a plain-text track (3) and a styled
    // track (4): the ASS text field keeps its own comma, the {\i1}
    // override block drops, \N is a hard break
    val mkv = Multimodal.minimalWebm(1000000L, 20000.0, 320, 240,
      frames = Seq(Array.tabulate(24)(_.toByte)),
      subtitleCues = Seq((1000L, 500L, "plain cue")),
      assCues = Seq((3000L, 800L, "{\\i1}styled, a\\Nb"),
        (5000L, 600L, "plain styled")))
    val got = Subtitles.mkvCues(mkv).get
    assert(got == Seq(
      Subtitles.Cue(3, 1000L, 500L, "plain cue"),
      Subtitles.Cue(4, 3000L, 800L, "styled, a\nb"),
      Subtitles.Cue(4, 5000L, 600L, "plain styled")), s"$got")
  }

  test("a malformed ASS payload (fewer than 8 commas) skips that cue only") {
    // same-length byte substitution keeps every EBML size valid: the
    // second cue's field commas become semicolons, so it is no longer
    // a Dialogue remnant and must drop without guessing a split —
    // while the first cue survives
    val mkv = Multimodal.minimalWebm(1000000L, 20000.0, 320, 240,
      assCues = Seq((1000L, 500L, "keep me"),
        (2000L, 500L, "drop me")))
    val needle = "1,0,Default,,0,0,0,,drop me".getBytes("UTF-8")
    val swap = "1;0;Default;;0;0;0;;drop me".getBytes("UTF-8")
    val idx = mkv.indexOfSlice(needle)
    assert(idx >= 0)
    val b = mkv.clone()
    System.arraycopy(swap, 0, b, idx, swap.length)
    val got = Subtitles.mkvCues(b).get
    assert(got == Seq(Subtitles.Cue(4, 1000L, 500L, "keep me")), s"$got")
  }

  test("standalone .ass: Format order honored, centiseconds, comments drop") {
    // a NONSTANDARD Format (Start/End shifted right by a leading
    // Effect field) must still time the cues; the Text field is last
    // and keeps its commas; \h maps to the spec's hard space; an unterminated {
    // drops the tail
    val ass =
      """[Script Info]
        |Title: golden
        |
        |[V4+ Styles]
        |Format: Name, Fontname
        |Style: Default,Arial
        |
        |[Events]
        |Format: Effect, Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Text
        |Comment: ,0,0:00:00.00,0:00:01.00,Default,,0,0,0,never
        |Dialogue: ,0,0:00:01.50,0:00:03.00,Default,,0,0,0,one, two\hthree
        |Dialogue: ,0,0:01:00.25,0:01:02.00,Default,,0,0,0,tail{\i1 open
        |""".stripMargin
    val got = Subtitles.parseAss(ass)
    assert(got == Seq(
      Subtitles.Cue(0, 1500L, 1500L, "one, two\u00A0three"),
      Subtitles.Cue(0, 60250L, 1750L, "tail")), s"$got")
  }

  test("SSA v4 (Marked=) scripts parse with the default ten-field layout") {
    // no Format line: the standard layout applies; SSA's Marked=0
    // first field sits where Layer would — Start/End stay at 1/2
    val ssa =
      """[Script Info]
        |ScriptType: v4.00
        |
        |[Events]
        |Dialogue: Marked=0,0:00:02.00,0:00:04.50,Default,,0,0,0,,ssa line
        |""".stripMargin
    val got = Subtitles.parseAss(ssa)
    assert(got == Seq(Subtitles.Cue(0, 2000L, 2500L, "ssa line")), s"$got")
  }

  test("ASS cues route through table() by the [Script Info] sniff") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val ass = ("[Script Info]\nTitle: t\n\n[Events]\n" +
      "Format: Layer, Start, End, Style, Name, MarginL, MarginR, " +
      "MarginV, Effect, Text\n" +
      "Dialogue: 0,0:00:01.00,0:00:02.00,Default,,0,0,0,,via table\n")
      .getBytes("UTF-8")
    val rows = Subtitles.table(spark,
        Seq((7L, ass)).toDF("doc_id", "media"))
      .as[(Long, Int, Long, Long, String)].collect().toSeq
    assert(rows == Seq((7L, 0, 1000L, 1000L, "via table")), s"$rows")
  }

  test("LRC lyrics files: stamps, centis/millis fractions, multi-stamp lines") {
    val lrc =
      """[ar:an artist]
        |[ti:a title]
        |[00:05.25]first line
        |[00:12.5][01:30.125]repeated chorus
        |[99:59.99]deep line
        |no stamp, contributes nothing
        |""".stripMargin
    val got = Subtitles.parseLrc(lrc)
    // .5 is 5 deciseconds (500 ms), .125 millis, .99 centis
    assert(got == Seq(
      Subtitles.Cue(0, 5250L, 0L, "first line"),
      Subtitles.Cue(0, 12500L, 0L, "repeated chorus"),
      Subtitles.Cue(0, 90125L, 0L, "repeated chorus"),
      Subtitles.Cue(0, 5999990L, 0L, "deep line")), s"$got")
    // table() routing by the stamp sniff
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = Subtitles.table(spark,
        Seq((3L, "[00:01.00]via table\n".getBytes("UTF-8")))
          .toDF("doc_id", "media"))
      .as[(Long, Int, Long, Long, String)].collect().toSeq
    assert(rows == Seq((3L, 0, 1000L, 0L, "via table")), s"$rows")
  }

  test("review pins: LRC with an arrow routes to LRC; stamp-flood stays linear") {
    // an LRC lyric containing '-->' must not be shadowed by the
    // loose SRT sniff into zero rows
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val rows = Subtitles.table(spark,
        Seq((1L, "[00:02.00]love --> hate\n".getBytes("UTF-8")))
          .toDF("doc_id", "media"))
      .as[(Long, Int, Long, Long, String)].collect().toSeq
    assert(rows == Seq((1L, 0, 2000L, 0L, "love --> hate")), s"$rows")
    // a ~700 KB single line of back-to-back stamps: the region-based
    // matcher walks it linearly (the substring-per-stamp version
    // would spend minutes here)
    val flood = (0 until 70000).map(i =>
      f"[${i / 600}%02d:${i / 10 % 60}%02d.${i % 10}]").mkString + "end"
    val got = Subtitles.parseLrc(flood)
    assert(got.length == 70000 && got.head.text == "end")
  }

  test("review pin: a 20-digit hours field drops the cue, never throws") {
    // an unbounded hours capture would overflow Long in toLong and
    // throw NumberFormatException out of the Spark task
    val ass = ("[Script Info]\n\n[Events]\n" +
      "Dialogue: 0,99999999999999999999:00:00.00,0:00:01.00," +
      "Default,,0,0,0,,hostile\n" +
      "Dialogue: 0,0:00:01.00,0:00:02.00,Default,,0,0,0,,kept\n")
    val gotA = Subtitles.parseAss(ass)
    assert(gotA == Seq(Subtitles.Cue(0, 1000L, 1000L, "kept")), s"$gotA")
    val srt = "1\n99999999999999999999:00:00,000 --> 0:00:01,000\n" +
      "hostile\n\n2\n00:00:01,000 --> 00:00:02,000\nkept\n"
    val gotS = Subtitles.parseSrt(srt)
    assert(gotS == Seq(Subtitles.Cue(0, 1000L, 1000L, "kept")), s"$gotS")
  }

  test("hostile totality: junk bytes, truncations, bit flips never throw") {
    val r = new scala.util.Random(41)
    val mkv = Multimodal.minimalWebm(1000000L, 5000.0, 160, 120,
      subtitleCues = Seq((100L, 200L, "target")))
    for (_ <- 0 until 200) {
      val b = mkv.clone()
      b(r.nextInt(b.length)) = r.nextInt(256).toByte
      Subtitles.mkvCues(b) // must not throw
    }
    for (len <- Seq(0, 3, 17, mkv.length / 2)) {
      Subtitles.mkvCues(java.util.Arrays.copyOf(mkv, len))
    }
    assert(Subtitles.mkvCues(Array.fill(64)(0x5a.toByte)) == None)
    assert(Subtitles.parseSrt("no cues here at all") == Nil)
  }
}
