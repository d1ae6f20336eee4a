package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 1=keeper, 2=exact dup of 1, 3=near dup of 1,
  // 4=junk (low quality: short + pure punctuation), 5=distinct keeper
  // with PII, 6=distinct keeper in another lang
  private def corpus = Seq(
    (1L, ("the quick brown fox jumps over the lazy dog and then " * 8).trim, "en"),
    (2L, ("the quick brown fox jumps over the lazy dog and then " * 8).trim, "en"),
    (3L, (("the quick brown fox jumps over the lazy dog and then " * 8) + "tail").trim, "en"),
    (4L, "!!! ??? ###", "en"),
    (5L, ("reach me at bob@example.com for the report details now " * 8).trim, "en"),
    (6L, ("el rapido zorro marron salta sobre el perro perezoso y " * 8).trim, "es")
  ).toDF("doc_id", "text", "lang")

  test("curation: junk gated, dups collapsed, chunks written per-lang, PII gone") {
    val out = tmpDir("curation") + "/corpus"
    val r = Curation.run(spark, corpus, out,
      minQuality = 0.3, threshold = 0.5, window = 20, stride = 15)
    assert(r.input == 6)
    assert(r.afterQuality == 5, s"quality gate kept ${r.afterQuality}") // doc 4 gone
    assert(r.afterExact == 4, s"exact dedup kept ${r.afterExact}") // doc 2 gone
    assert(r.afterNearDup == 3, s"near dedup kept ${r.afterNearDup}") // doc 3 gone
    assert(r.chunks > 0)

    val written = spark.read.parquet(out)
    assert(written.count() == r.chunks)
    // survivors are exactly the canonical keepers
    assert(written.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 5L, 6L))
    // lang partition directories exist (partitioned write)
    assert(new java.io.File(s"$out/lang=en").isDirectory)
    assert(new java.io.File(s"$out/lang=es").isDirectory)
    // PII was redacted before chunking
    val doc5 = written.filter(col("doc_id") === 5L)
      .agg(concat_ws(" ", collect_list("chunk"))).head().getString(0)
    assert(!doc5.contains("bob@example.com") && doc5.contains("<EMAIL>"))
  }

  test("boilerplate stage: shared lines stripped everywhere, husks dropped") {
    // newline-structured docs: a cookie banner recurs in three docs; one
    // doc is NOTHING BUT the banner and must drop entirely
    val banner = "accept all cookies to continue reading this site"
    // bodies share NO vocabulary, so the near-dup stage cannot merge them
    val alpha = ("alpine meadows bloom under spring sunshine while marmots " +
      "whistle across high passes ") * 4
    val beta = ("binary search trees rotate nodes keeping lookup depth " +
      "logarithmic during insertion storms ") * 4
    val gamma = ("gamma ray bursts outshine entire galaxies for brief " +
      "cosmic moments every single year ") * 4
    val docs = Seq(
      (1L, s"$banner\n${alpha.trim}", "en"),
      (2L, s"${beta.trim}\n$banner", "en"),
      (3L, s"$banner", "en"),
      (4L, gamma.trim, "en")
    ).toDF("doc_id", "text", "lang")
    val out = tmpDir("cur_boiler") + "/c"
    val r = Curation.run(spark, docs, out, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      boilerplateMinDocs = Some(3))
    assert(r.afterBoilerplate == 3, s"$r") // doc 3 was pure banner
    val written = spark.read.parquet(out)
    assert(written.select("doc_id").distinct().as[Long].collect().toSet ==
      Set(1L, 2L, 4L))
    val all = written.agg(concat_ws(" ", collect_list("chunk")))
      .head().getString(0)
    assert(!all.contains("accept all cookies"),
      "banner text leaked into the curated chunks")
    assert(all.contains("alpine") && all.contains("binary") &&
      all.contains("galaxies"))
  }

  test("media stage: a re-crawled re-encoded image collapses docs whose TEXT was rewritten") {
    import graft.ext.Multimodal
    val W = 20; val H = 16
    val plane = Array.tabulate(W * H) { p =>
      val x = p % W; val y = p / W
      (((x * 13 + y * 7 + (x * y) % 5) * 3) % 251).toByte
    }
    val png = Multimodal.encodePng(W, H, 0, plane, Seq.fill(H)(0), 9)
    // byte-level DIFFERENT encoding of the SAME pixels — only the
    // pixel-regime hash can see through it
    val reenc = Multimodal.encodePng(W, H, 0, plane,
      (0 until H).map(_ % 5), 1, splitIdat = true)
    val otherPng = Multimodal.storedGrayPng(
      Array.tabulate(W * H)(p => ((p * 37 + 11) % 256).toByte), W, H)
    val docs = Seq(
      // 1: original article with picture P
      (1L, ("solar flares disrupted radio communication across the arctic " +
        "circle during the magnetic storm event ") * 4, "en",
        Some(png), 0, 0),
      // 2: REWRITTEN text (no shared vocabulary), re-encoded copy of P —
      // only the image stage can catch this recrawl
      (2L, ("geomagnetic disturbances knocked out shortwave broadcasts " +
        "near polar latitudes throughout yesterday ") * 4, "en",
        Some(reenc), 0, 0),
      // 3: distinct text, distinct picture
      (3L, ("quantum error correction codes stabilize logical qubits " +
        "against decoherence in superconducting lattices ") * 4, "en",
        Some(otherPng), 0, 0),
      // 4: no media at all — must pass through the stage untouched
      (4L, ("fermented tea cultures require consistent ambient warmth " +
        "and patient weekly attention for balance ") * 4, "en",
        None, 0, 0))
      .toDF("doc_id", "text", "lang", "media", "width", "height")
    val out = tmpDir("cur_media") + "/c"
    val r = Curation.run(spark, docs, out, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")))
    assert(r.afterNearDup == 4, s"texts share nothing: $r") // no text dups
    assert(r.afterImageDedup == 3, s"image stage must drop doc 2: $r")
    val kept = spark.read.parquet(out)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), s"kept $kept")

    // same corpus through the durable store: run 1 registers, run 2
    // (text rewritten AGAIN, third encoding of P) dedups cross-RUN
    val store = tmpDir("cur_media_store") + "/imgstore"
    val out1 = tmpDir("cur_media_s1") + "/c"
    val r1 = Curation.run(spark, docs, out1, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")),
      imageStorePath = Some(store))
    assert(r1.afterImageDedup == 3, s"store run 1: $r1")
    val docs2 = Seq(
      (9L, ("ionospheric propagation failed across auroral zones while " +
        "operators switched to satellite relays ") * 4, "en",
        Some(Multimodal.storedGrayPng(plane, W, H)), 0, 0))
      .toDF("doc_id", "text", "lang", "media", "width", "height")
    val out2 = tmpDir("cur_media_s2") + "/c"
    val r2 = Curation.run(spark, docs2, out2, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")),
      imageStorePath = Some(store))
    assert(r2.afterImageDedup == 0,
      s"run-2 recrawl must dedup against the STORE: $r2")
  }

  test("media stage: EXIF-orientation normalization pairs a rotated re-save (opt-in)") {
    import graft.ext.Multimodal
    val W = 20; val H = 16
    val upright = Array.tabulate(W * H) { p =>
      val x = p % W; val y = p / W
      (((x * 13 + y * 7 + (x * y) % 5) * 3) % 251).toByte
    }
    // a camera/export that stored the image rotated 90° ccw and tagged
    // orientation 6 ("rotate 90° cw to display") — the stored plane is
    // H×W, the DISPLAYED picture is exactly `upright`
    val stored = Array.tabulate(H * W) { i =>
      val r = i / H; val c = i % H
      upright(c * W + (W - 1 - r))
    }
    val rotatedResave = Multimodal.exifPng(
      Multimodal.storedGrayPng(stored, H, W),
      orientation = 6, make = "graftcam", model = "gx-500",
      takenAt = "2026:02:03 04:05:06")
    def docsOf(id: Long, text: String, media: Array[Byte]) =
      Seq((id, (text + " ") * 8, "en", Some(media), 0, 0))
        .toDF("doc_id", "text", "lang", "media", "width", "height")
    val original = docsOf(1L, "telescopes resolved the crater rim under " +
      "slanting winter light above the basalt plain",
      Multimodal.storedGrayPng(upright, W, H))
    val resave = docsOf(9L, "completely rewritten caption describing " +
      "volcanic geology with none of the original words", rotatedResave)

    // flag ON: the rotated re-save drops against the stored upright
    // source CROSS-RUN — normalization folded the orientation into the
    // signature at rest
    val storeOn = tmpDir("cur_orient_on") + "/imgstore"
    val r1 = Curation.run(spark, original, tmpDir("cur_or1") + "/c",
      minQuality = 0.2, threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")),
      imageStorePath = Some(storeOn), imageNormalizeOrientation = true)
    assert(r1.afterImageDedup == 1, s"run 1 registers: $r1")
    val r2 = Curation.run(spark, resave, tmpDir("cur_or2") + "/c",
      minQuality = 0.2, threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")),
      imageStorePath = Some(storeOn), imageNormalizeOrientation = true)
    assert(r2.afterImageDedup == 0,
      s"the rotated re-save must dedup against the upright source: $r2")

    // flag OFF (fresh store): semantics unchanged — the rotated plane
    // hashes differently and the re-save survives
    val storeOff = tmpDir("cur_orient_off") + "/imgstore"
    Curation.run(spark, original, tmpDir("cur_or3") + "/c",
      minQuality = 0.2, threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")),
      imageStorePath = Some(storeOff))
    val r4 = Curation.run(spark, resave, tmpDir("cur_or4") + "/c",
      minQuality = 0.2, threshold = 0.5, window = 20, stride = 15,
      mediaCols = Some(("media", "width", "height")),
      imageStorePath = Some(storeOff))
    assert(r4.afterImageDedup == 1,
      s"without the flag the store stays orientation-free: $r4")

    // the two hash populations are separate REGIMES: probing the
    // flag-on store without the flag fails loudly, never silently
    val e = intercept[IllegalArgumentException] {
      Curation.run(spark, resave, tmpDir("cur_or5") + "/c",
        minQuality = 0.2, threshold = 0.5, window = 20, stride = 15,
        mediaCols = Some(("media", "width", "height")),
        imageStorePath = Some(storeOn))
    }
    assert(e.getMessage.contains("dhash_px_exif"), s"${e.getMessage}")
  }

  test("audio stage: a re-mastered recording collapses docs with rewritten text") {
    import graft.ext.AudioFingerprint
    def rec(k: Int, amp: Double) = AudioFingerprint.tonesWav(8000,
      (0 until 6).map(i => (300.0 + (k * 6 + i) * 25.0, 1024)), amp)
    val docs = Seq(
      (1L, ("granite tidepools shelter anemones and juvenile sculpin " +
        "through every winter storm season reliably ") * 4, "en",
        Some(rec(3, 0.5))),
      // rewritten text, re-mastered SAME recording
      (2L, ("intertidal basins of hard rock protect soft invertebrates " +
        "and small fish during rough weather months ") * 4, "en",
        Some(rec(3, 0.2))),
      (3L, ("volcanic caldera lakes accumulate dissolved minerals over " +
        "geological timescales without surface outflow ") * 4, "en",
        Some(rec(7, 0.5))),
      (4L, ("handmade paper absorbs pigment differently along its " +
        "chain lines producing soft irregular gradients ") * 4, "en",
        None)) // no audio: passes through
      .toDF("doc_id", "text", "lang", "media")
    val out = tmpDir("cur_audio") + "/c"
    val r = Curation.run(spark, docs, out, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      audioCol = Some("media"))
    assert(r.afterNearDup == 4 && r.afterAudioDedup == 3,
      s"audio stage must drop doc 2: $r")
    val kept = spark.read.parquet(out)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), s"kept $kept")
  }

  test("video stage: a re-wrapped mp4 collapses docs with rewritten text; store spans runs") {
    import graft.ext.Multimodal
    val payload = Array.tabulate(240)(i => ((i * 31 + 3) % 251).toByte)
    def doc(id: Long, text: String, media: Option[Array[Byte]]) =
      (id, (text + " ") * 4, "en", media)
    val docs = Seq(
      doc(1L, "a screencast explains derivative pricing with narrated " +
        "examples recorded once and published in the original wrapper",
        Some(Multimodal.minimalMp4(600, 1200, 1, 320, 240, mdat = payload))),
      // rewritten text, SAME payload re-wrapped (faststart + metadata)
      doc(2L, "completely different caption describing a finance video " +
        "tutorial using none of the previous description vocabulary",
        Some(Multimodal.minimalMp4(90000, 9, 2, 640, 480, mdat = payload,
          moovFirst = false, freePad = 20))),
      doc(3L, "timelapse footage of glacier calving uses its own unique " +
        "payload bytes and therefore must never collapse with others",
        Some(Multimodal.minimalMp4(600, 500, 1, 100, 80,
          mdat = payload.map(b => (b ^ 0x11).toByte)))),
      doc(4L, "plain text document with no video at all that passes " +
        "through the stage untouched whatever the fingerprints say", None))
      .toDF("doc_id", "text", "lang", "media")
    val out = tmpDir("cur_video") + "/c"
    val r = Curation.run(spark, docs, out, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      videoCol = Some("media"))
    assert(r.afterNearDup == 4 && r.afterVideoDedup == 3,
      s"video stage must drop doc 2: $r")
    val kept = spark.read.parquet(out)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L), s"kept $kept")

    // store form: a SECOND run (fresh ids) against the durable store
    // drops the re-wrap cross-RUN
    val store = tmpDir("cur_vstore") + "/s"
    val out2 = tmpDir("cur_video2") + "/c"
    Curation.run(spark, docs, out2, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      videoCol = Some("media"), videoStorePath = Some(store))
    val later = Seq(doc(11L, "a third rewrite of the derivatives " +
        "screencast description sharing no phrasing with either prior",
        Some(Multimodal.minimalMp4(44100, 321, 3, 888, 500,
          mdat = payload, moovFirst = false, freePad = 4))))
      .toDF("doc_id", "text", "lang", "media")
    val out3 = tmpDir("cur_video3") + "/c"
    val r3 = Curation.run(spark, later, out3, minQuality = 0.2,
      threshold = 0.5, window = 20, stride = 15,
      videoCol = Some("media"), videoStorePath = Some(store))
    assert(r3.afterVideoDedup == 0,
      s"cross-run re-wrap not caught by the video store: $r3")
  }

  test("curation is deterministic: rerun produces the identical chunk set") {
    val out1 = tmpDir("cur_a") + "/c"
    val out2 = tmpDir("cur_b") + "/c"
    val r1 = Curation.run(spark, corpus, out1, minQuality = 0.3,
      threshold = 0.5, window = 20, stride = 15)
    val r2 = Curation.run(spark, corpus, out2, minQuality = 0.3,
      threshold = 0.5, window = 20, stride = 15)
    assert(r1 == r2)
    val a = spark.read.parquet(out1).orderBy("doc_id", "chunk_id")
      .collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(out2).orderBy("doc_id", "chunk_id")
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
