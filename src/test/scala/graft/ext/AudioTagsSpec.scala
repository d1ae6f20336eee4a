package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** Audio provenance gates: ID3v2.3/2.4 frame walk (encodings,
  * syncsafe vs raw sizes, APIC), FLAC VORBIS_COMMENT + PICTURE
  * blocks, Ogg-Vorbis comment fields with the base64 picture, the
  * refusal boundaries, and totality over hostile bytes.
  */
class AudioTagsSpec extends AnyFunSuite {

  private val torso = {
    val o = new java.io.ByteArrayOutputStream()
    o.write(Array(0xff, 0xfb, 0x92, 0x40).map(_.toByte))
    o.write(new Array[Byte](64)); o.toByteArray
  }
  private val png = Multimodal.encodePng(6, 5, 0,
    Array.tabulate(30)(i => (i * 8).toByte), (0 until 5).map(_ => 0))
  private val tone = Array.tabulate(1200)(i => math.round(
    0.4 * math.sin(2 * math.Pi * 440 * i / 8000) * 32767).toInt)

  test("ID3v2.3 latin-1 and v2.4 UTF-8 land the same fields") {
    for ((v24, utf8) <- Seq((false, false), (true, true), (true, false))) {
      val b = AudioTags.id3v2Wrap(torso, "The Rolling Stones",
        "Gimme Shelter", "Let It Bleed", 1969, cover = png,
        v24 = v24, utf8 = utf8)
      val t = AudioTags.of(b).get
      assert(t.artist.contains("The Rolling Stones") && // spaces survive
        t.title.contains("Gimme Shelter") &&
        t.album.contains("Let It Bleed") &&
        t.year.contains(1969), s"v24=$v24 utf8=$utf8: $t")
      assert(t.cover.get.toSeq == png.toSeq, "APIC bytes verbatim")
    }
    // non-latin text through UTF-8 v2.4
    val nb = AudioTags.id3v2Wrap(torso, "Motörhead", v24 = true,
      utf8 = true)
    assert(AudioTags.of(nb).get.artist.contains("Motörhead"))
    // the wrapped payload still routes as MP3 elsewhere (a frame-
    // length-exact torso: 144*128000/44100 + padding = 418 bytes)
    val frameTorso = {
      val o = new java.io.ByteArrayOutputStream()
      o.write(Array(0xff, 0xfb, 0x92, 0x40).map(_.toByte))
      o.write(new Array[Byte](414)); o.toByteArray
    }
    assert(Mp3.isMp3(frameTorso))
    assert(Mp3.isMp3(AudioTags.id3v2Wrap(frameTorso, "a")))
  }

  test("ID3v2 UTF-16 text and description terminators parse") {
    // hand-build a v2.3 frame with encoding 1 (UTF-16 + BOM)
    val txt = "ACDC".getBytes("UTF-16") // BOM-led
    val frames = new java.io.ByteArrayOutputStream()
    frames.write("TPE1".getBytes("US-ASCII"))
    val sz = 1 + txt.length
    frames.write(0); frames.write(0); frames.write(0); frames.write(sz)
    frames.write(0); frames.write(0)
    frames.write(1); frames.write(txt)
    val body = frames.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write("ID3".getBytes("US-ASCII"))
    out.write(3); out.write(0); out.write(0)
    out.write(0); out.write(0); out.write(body.length >> 7)
    out.write(body.length & 0x7f)
    out.write(body); out.write(torso)
    val t = AudioTags.of(out.toByteArray).get
    assert(t.artist.contains("ACDC"), s"$t")
  }

  test("ID3v2.2 three-byte frames parse: the old-iTunes-rip vintage") {
    val b = AudioTags.id3v2Wrap(torso, "Nick Drake", "River Man",
      "Five Leaves Left", 1969, cover = png, v22 = true)
    val t = AudioTags.of(b).get
    assert(t.artist.contains("Nick Drake") &&
      t.title.contains("River Man") &&
      t.album.contains("Five Leaves Left") && t.year.contains(1969), s"$t")
    assert(t.cover.get.toSeq == png.toSeq, "PIC bytes verbatim")
    // v2.2's compression header bit: no scheme was standardized — the
    // spec's own rule is "ignore the tag"
    val comp = b.clone(); comp(5) = (comp(5) | 0x40).toByte
    assert(AudioTags.of(comp) == None)
  }

  test("unsynchronisation round-trips: whole-tag v2.2/v2.3, per-frame v2.4") {
    // 0xFF bytes in both text (latin-1 'ÿ') and the cover payload
    // force real FF-00 stuffing — the stuffed tag must differ from the
    // plain one, and parse must land identical fields
    val ffCover = Array.tabulate(64)(i =>
      if (i % 3 == 0) 0xff.toByte else (i * 7).toByte)
    for ((v22, v24) <- Seq((true, false), (false, false), (false, true))) {
      val plain = AudioTags.id3v2Wrap(torso, "ÿakÿuza", "tÿtle",
        "albÿm", 2003, cover = ffCover, v22 = v22, v24 = v24)
      val stuffed = AudioTags.id3v2Wrap(torso, "ÿakÿuza", "tÿtle",
        "albÿm", 2003, cover = ffCover, v22 = v22, v24 = v24,
        unsync = true)
      assert(stuffed.length > plain.length,
        s"v22=$v22 v24=$v24: stuffing inserted nothing")
      val t = AudioTags.of(stuffed).get
      assert(t.artist.contains("ÿakÿuza") && t.title.contains("tÿtle") &&
        t.album.contains("albÿm") && t.year.contains(2003),
        s"v22=$v22 v24=$v24: $t")
      assert(t.cover.get.toSeq == ffCover.toSeq,
        s"v22=$v22 v24=$v24: cover bytes after de-unsync")
    }
  }

  test("FLAC VORBIS_COMMENT + PICTURE splice keeps the stream decodable") {
    val native = Flac.encode(tone, 8000)
    val tagged = AudioTags.flacWithTags(native, "artist", "title",
      "album", 2001, cover = png)
    val t = AudioTags.of(tagged).get
    assert(t.artist.contains("artist") && t.title.contains("title") &&
      t.album.contains("album") && t.year.contains(2001))
    assert(t.cover.get.toSeq == png.toSeq, "PICTURE data verbatim")
    // the spliced stream still sample-decodes identically
    assert(Flac.decode(tagged).get._1.toSeq ==
      Flac.decode(native).get._1.toSeq,
      "metadata blocks must not move one sample")
    // tagless native: no provenance row
    assert(AudioTags.of(native) == None)
  }

  test("Ogg-Vorbis comment fields + base64 picture parse; stream still decodes") {
    val pcm = tone.map(_ / 32768.0)
    val ogg = Vorbis.encode(pcm, 8000, comments = Seq(
      "ARTIST" -> "someone", "TITLE" -> "something", "ALBUM" -> "somewhere",
      "DATE" -> "1997-06-01",
      "METADATA_BLOCK_PICTURE" -> AudioTags.oggPictureField(png)))
    val t = AudioTags.of(ogg).get
    assert(t.artist.contains("someone") && t.title.contains("something") &&
      t.album.contains("somewhere") && t.year.contains(1997), s"$t")
    assert(t.cover.get.toSeq == png.toSeq, "base64 picture verbatim")
    assert(Vorbis.decode(ogg).isDefined, "comments must not break decode")
    // a comment-less stream has no provenance row
    assert(AudioTags.of(Vorbis.encode(pcm, 8000)) == None)
  }

  test("WAV 'id3 ' and AIFF 'ID3 ' chunks carry the same provenance") {
    val pcm = tone.map(_ / 32768.0)
    val tag = AudioTags.id3Tag("chunked artist", "chunked title",
      year = 1988, cover = png)
    for (container <- Seq(AudioDsp.pcmWav(pcm, 8000),
        Aiff.encode(pcm, 8000))) {
      val wrapped = AudioTags.withId3Chunk(container, tag)
      val t = AudioTags.of(wrapped).get
      assert(t.artist.contains("chunked artist") &&
        t.title.contains("chunked title") && t.year.contains(1988) &&
        t.cover.get.toSeq == png.toSeq, s"$t")
      // the audio still decodes identically with the chunk appended
      assert(AudioDsp.monoSamples(wrapped).get._1.toSeq ==
        AudioDsp.monoSamples(container).get._1.toSeq,
        "the ID3 chunk must not move one sample")
      // an untagged container has no provenance row
      assert(AudioTags.of(container) == None)
    }
  }

  test("ID3v1 trailer: the old-rip fallback parses, v2 wins when both present") {
    val v1 = AudioTags.id3v1Wrap(torso, "Old Artist Name",
      "Some Long Title Here", "An Album", 1985)
    val t = AudioTags.of(v1).get
    assert(t.artist.contains("Old Artist Name") &&
      t.title.contains("Some Long Title Here") &&
      t.album.contains("An Album") && t.year.contains(1985) &&
      t.cover.isEmpty, s"$t")
    // both tags present: ID3v2 takes precedence
    val both = AudioTags.id3v1Wrap(
      AudioTags.id3v2Wrap(torso, "New Artist", year = 2005), "Old Artist")
    assert(AudioTags.of(both).get.artist.contains("New Artist"))
    assert(AudioTags.of(both).get.year.contains(2005))
    // a bare trailer on arbitrary bytes is still a tag
    assert(AudioTags.of(AudioTags.id3v1Wrap(
      Array.tabulate(50)(_.toByte), "x")).isDefined)
  }

  test("M4A iTunes ilst: the sixth carrier lands the same provenance row") {
    val m4a = AudioTags.mp4WithTags(
      Multimodal.minimalMp4(1000, 2000, 1, 0, 0,
        mdat = Array.tabulate(32)(_.toByte)),
      "Danger Mouse", "Encore", "The Grey Album", 2004, cover = png)
    val t = AudioTags.of(m4a).get
    assert(t.artist.contains("Danger Mouse") &&
      t.title.contains("Encore") && t.album.contains("The Grey Album") &&
      t.year.contains(2004), s"$t")
    assert(t.cover.exists(_.sameElements(png)),
      "covr bytes must come back verbatim (the cross-modal identity)")
    // still a structurally valid MP4: the geometry walk reads through it
    assert(Multimodal.ContainerCodec.isMp4(m4a))
    // partial tags: omitted fields stay None, bare moov yields no row
    val partial = AudioTags.of(AudioTags.mp4WithTags(
      Multimodal.minimalMp4(1000, 2000, 1, 0, 0), title = "Solo")).get
    assert(partial.title.contains("Solo") && partial.artist.isEmpty &&
      partial.cover.isEmpty)
    assert(AudioTags.of(Multimodal.minimalMp4(1000, 2000, 1, 0, 0)).isEmpty,
      "an untagged MP4 must not mint an empty provenance row")
    // ©day carries a full date string in the wild: leading year parses
    val full = AudioTags.mp4WithTags(
      Multimodal.minimalMp4(1000, 2000, 1, 0, 0), year = 1994)
    assert(AudioTags.of(full).get.year.contains(1994))
  }

  test("grouped frames skip, never shift: v2.3 0x20 and v2.4 0x40 format flags") {
    // grouping prepends a 1-byte group id to the payload; parsing it
    // as the text-encoding byte would shift every offset by one. The
    // refuse-never-mis-parse rule: the frame is SKIPPED.
    for (v24 <- Seq(false, true)) {
      val b = AudioTags.id3v2Wrap(torso, "Shifted", "Kept", v24 = v24)
      // set the grouping bit on the FIRST frame (TPE1) only: locate
      // its format-flag byte (header 10 + "TPE1" 4 + size 4 + status 1)
      val g = b.clone()
      g(10 + 9) = (g(10 + 9) | (if (v24) 0x40 else 0x20)).toByte
      val t = AudioTags.of(g).get
      assert(t.artist.isEmpty, s"v24=$v24: grouped TPE1 must skip, got $t")
      assert(t.title.contains("Kept"), s"v24=$v24: next frame intact")
    }
  }

  test("Matroska Tags + attached cover: the EBML carrier round-trips") {
    val webm = Multimodal.minimalWebm(1000000L, 2000.0, 320, 240,
      Seq(Array.tabulate(50)(i => (i * 7).toByte)), audioTrack = true)
    val tagged = AudioTags.mkvWithTags(webm, "Boards of Canada",
      "Roygbiv", "Music Has the Right to Children", 1998, cover = png)
    val t = AudioTags.of(tagged).get
    assert(t.artist.contains("Boards of Canada") &&
      t.title.contains("Roygbiv") &&
      t.album.contains("Music Has the Right to Children") &&
      t.year.contains(1998), s"$t")
    assert(t.cover.get.toSeq == png.toSeq, "FileData bytes verbatim")
    // the fixture writes album as a TargetTypeValue-50 TITLE (checked
    // above); the other wild form — a plain ALBUM SimpleTag — must
    // land the same field. Hand-built minimal EBML stream:
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
    val plainAlbum = el(0x1A45DFA3L, Array.emptyByteArray) ++
      el(0x18538067L, el(0x1254C367L, el(0x7373L,
        el(0x67C8L, el(0x45A3L, "ALBUM".getBytes("UTF-8")) ++
          el(0x4487L, "Geogaddi".getBytes("UTF-8"))))))
    assert(AudioTags.of(plainAlbum).get.album.contains("Geogaddi"))
    // EBML does not mandate child order: a Tag with its SimpleTag
    // BEFORE the TargetTypeValue-50 Targets must still file the TITLE
    // as the album (the Targets resolve in a first pass)
    val targetsLast = el(0x1A45DFA3L, Array.emptyByteArray) ++
      el(0x18538067L, el(0x1254C367L, el(0x7373L,
        el(0x67C8L, el(0x45A3L, "TITLE".getBytes("UTF-8")) ++
          el(0x4487L, "Tomorrow's Harvest".getBytes("UTF-8"))) ++
          el(0x63C0L, el(0x68CAL, Array[Byte](50))))))
    val tl = AudioTags.of(targetsLast).get
    assert(tl.album.contains("Tomorrow's Harvest") && tl.title.isEmpty,
      s"Targets-after-SimpleTag misfiled: $tl")
    // no fields -> the splice is an identity -> no row
    assert(AudioTags.mkvWithTags(webm).toSeq == webm.toSeq)
    // the splice must not move the container's own metadata or coded
    // frames: geometry and payload fingerprint identical to untagged
    def feat(b: Array[Byte]) = Multimodal.ContainerCodec
      .decode(Seq(Multimodal.MediaRow(1L, b, "video/webm", 0, 0))).head
    val mu = feat(webm)
    val mt = feat(tagged)
    assert(mu.feature.toSeq == mt.feature.toSeq &&
      mu.format == mt.format && mu.kind == mt.kind,
      s"container features moved: $mu vs $mt")
    val fu = Multimodal.ContainerCodec.videoPayloadFp(webm)
    val ft = Multimodal.ContainerCodec.videoPayloadFp(tagged)
    assert(fu.isDefined && fu == ft, "coded-frame fingerprint moved")
    // untagged webm: no provenance row
    assert(AudioTags.of(webm) == None)
  }

  test("APEv2 trailer tag: round trip, ID3v1 coexistence, hostile totality") {
    val b = AudioTags.apeWrap(torso, "Aphex Twin", "Xtal",
      "Selected Ambient Works 85-92", 1992, cover = png)
    val t = AudioTags.of(b).get
    assert(t.artist.contains("Aphex Twin") && t.title.contains("Xtal") &&
      t.album.contains("Selected Ambient Works 85-92") &&
      t.year.contains(1992), s"$t")
    assert(t.cover.get.toSeq == png.toSeq,
      "cover bytes after the filename prefix, verbatim")
    // the wild stacking old rips carry: audio + APE + ID3v1 trailer —
    // APE is found before the ID3v1 block and wins (richer fields)
    val stacked = AudioTags.id3v1Wrap(
      AudioTags.apeWrap(torso, "Ape Artist", "Ape Title"),
      artist = "V1 Artist", title = "V1 Title")
    val ts = AudioTags.of(stacked).get
    assert(ts.artist.contains("Ape Artist") && ts.title.contains("Ape Title"),
      s"APE must win over ID3v1: $ts")
    // ID3v1 alone still works as the last fallback
    val v1only = AudioTags.id3v1Wrap(torso, artist = "V1 Artist")
    assert(AudioTags.of(v1only).get.artist.contains("V1 Artist"))
    // hostile: bad version refuses; truncated items never shift-parse
    val badVer = b.clone()
    badVer(b.length - 24) = 99 // version -> garbage
    assert(AudioTags.of(badVer) == None)
    val cut = java.util.Arrays.copyOfRange(b, 0, b.length - 40)
    assert(AudioTags.of(cut) == None || AudioTags.of(cut).isEmpty)
  }

  test("APE item length near 2^31 stops at the item, keeping earlier fields") {
    // vo + len wraps Int-negative for len just under 2^31, slipping a
    // `ve > fo` bound check; the walk must stop at the malformed item
    // (keeping Artist) — not throw into the NonFatal catch and discard
    // the whole tag
    val b = AudioTags.apeWrap(torso, "Ape Artist", "Evil")
    val item2 = torso.length + 32 +
      (8 + "Artist".length + 1 + "Ape Artist".length)
    b(item2) = 0xf0.toByte // len -> 0x7ffffff0 little-endian
    b(item2 + 1) = 0xff.toByte
    b(item2 + 2) = 0xff.toByte
    b(item2 + 3) = 0x7f.toByte
    val t = AudioTags.of(b).get
    assert(t.artist.contains("Ape Artist") && t.title.isEmpty, s"$t")
  }

  test("embedded lyrics: all six carriers round trip the transcript") {
    val lyr = "verse one line\nverse two line"
    // ID3v2.2 / v2.3 / v2.4-utf8 USLT/ULT
    for ((v22, v24, utf8) <- Seq((true, false, false),
        (false, false, false), (false, true, true))) {
      val t = AudioTags.of(AudioTags.id3v2Wrap(torso, artist = "a",
        v22 = v22, v24 = v24, utf8 = utf8, lyrics = lyr)).get
      assert(t.lyrics.contains(lyr), s"v22=$v22 v24=$v24: $t")
    }
    val flac = AudioTags.flacWithTags(Flac.encode(tone, 8000),
      title = "t", lyrics = lyr)
    assert(AudioTags.of(flac).get.lyrics.contains(lyr))
    val ogg = Vorbis.encode(tone.map(_ / 32768.0), 8000,
      comments = Seq("TITLE" -> "t", "LYRICS" -> lyr))
    assert(AudioTags.of(ogg).get.lyrics.contains(lyr))
    val m4a = AudioTags.mp4WithTags(
      Multimodal.minimalMp4(1000, 2000, 1, 0, 0,
        mdat = Array.tabulate(48)(_.toByte)),
      title = "t", lyrics = lyr)
    assert(AudioTags.of(m4a).get.lyrics.contains(lyr))
    val ape = AudioTags.apeWrap(torso, artist = "a", lyrics = lyr)
    assert(AudioTags.of(ape).get.lyrics.contains(lyr))
    val mkv = AudioTags.mkvWithTags(
      Multimodal.minimalWebm(1000000L, 900.0, 160, 120,
        Seq(Array.tabulate(30)(i => (i * 5).toByte)),
        audioTrack = true),
      artist = "a", lyrics = lyr)
    assert(AudioTags.of(mkv).get.lyrics.contains(lyr))
    // a lyricless tag stays None on the lyrics field
    assert(AudioTags.of(AudioTags.id3v2Wrap(torso, artist = "a"))
      .get.lyrics == None)
  }

  test("hand-built UTF-16 USLT: the descriptor scan steps 16-bit units") {
    // enc 1 (UTF-16 with BOM), language "eng", NON-EMPTY descriptor
    // terminated by 0x0000, then the BOM-led UTF-16 transcript — the
    // descriptor walk must step two bytes at a time or it lands
    // mid-code-unit and shears the text
    def utf16(s: String): Array[Byte] =
      Array[Byte](0xfe.toByte, 0xff.toByte) ++ s.flatMap(c =>
        Seq(((c >> 8) & 0xff).toByte, (c & 0xff).toByte))
    val payload = Array[Byte](1) ++ "eng".getBytes("US-ASCII") ++
      utf16("desc") ++ Array[Byte](0, 0) ++ utf16("löng text ünïts")
    val frames = "USLT".getBytes("US-ASCII") ++
      Array[Byte](0, 0, (payload.length >> 8).toByte,
        (payload.length & 0xff).toByte) ++
      Array[Byte](0, 0) ++ payload
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
      Array[Byte]((frames.length >> 21 & 0x7f).toByte,
        (frames.length >> 14 & 0x7f).toByte,
        (frames.length >> 7 & 0x7f).toByte,
        (frames.length & 0x7f).toByte) ++ frames
    val t = AudioTags.of(tag ++ torso).get
    assert(t.lyrics.contains("löng text ünïts"), s"$t")
  }

  test("SYLT synced lyrics: ms entries round trip; frame-clocked format refuses") {
    val entries = Seq((0L, "line one"), (4200L, "line twö"),
      (9000L, "line three"))
    for ((v22, v24, utf8) <- Seq((false, false, false),
        (false, true, true), (true, false, false))) {
      val b = AudioTags.id3v2Wrap(torso, artist = "a",
        v22 = v22, v24 = v24, utf8 = utf8, synced = entries)
      assert(AudioTags.syncedLyrics(b).contains(entries),
        s"v22=$v22 v24=$v24: ${AudioTags.syncedLyrics(b)}")
      // the scalar walk is untouched by the SYLT frame
      assert(AudioTags.of(b).get.artist.contains("a"))
    }
    // hand-built format-1 (MPEG-frame clock) SYLT: REFUSES — a frame
    // count is not a timestamp without decode context
    val p = new java.io.ByteArrayOutputStream()
    p.write(0); p.write("eng".getBytes("US-ASCII"))
    p.write(1); p.write(1); p.write(0) // format 1, type, empty desc
    p.write("text".getBytes("ISO-8859-1")); p.write(0)
    p.write(Array[Byte](0, 0, 0, 42))
    val pay = p.toByteArray
    val frame = "SYLT".getBytes("US-ASCII") ++
      Array[Byte](0, 0, (pay.length >> 8).toByte,
        (pay.length & 0xff).toByte, 0, 0) ++ pay
    val tag = "ID3".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0) ++
      Array[Byte]((frame.length >> 21 & 0x7f).toByte,
        (frame.length >> 14 & 0x7f).toByte,
        (frame.length >> 7 & 0x7f).toByte,
        (frame.length & 0x7f).toByte) ++ frame
    assert(AudioTags.syncedLyrics(tag ++ torso) == None)
    // no SYLT at all
    assert(AudioTags.syncedLyrics(
      AudioTags.id3v2Wrap(torso, lyrics = "unsynced")) == None)
  }

  test("hostile inputs: truncations and bit flips are total") {
    val fixtures = Seq(
      AudioTags.id3v2Wrap(torso, "a", "b", "c", 2000, cover = png),
      AudioTags.flacWithTags(Flac.encode(tone, 8000), "a", cover = png),
      AudioTags.mp4WithTags(
        Multimodal.minimalMp4(1000, 2000, 1, 0, 0,
          mdat = Array.tabulate(32)(_.toByte)),
        "a", "b", "c", 2000, cover = png),
      Vorbis.encode(tone.map(_ / 32768.0), 8000, comments = Seq(
        "ARTIST" -> "a",
        "METADATA_BLOCK_PICTURE" -> AudioTags.oggPictureField(png))))
    val r = new scala.util.Random(9)
    for (f <- fixtures) {
      for (cut <- 1 until f.length by 61) AudioTags.of(f.take(cut))
      for (_ <- 0 until 150) {
        val mut = f.clone()
        for (_ <- 0 to r.nextInt(4))
          mut(r.nextInt(mut.length)) = r.nextInt(256).toByte
        AudioTags.of(mut)
      }
    }
    assert(AudioTags.of(null) == None)
    assert(AudioTags.of("ID3".getBytes) == None)
  }
}
