package graft

import org.apache.spark.sql.functions._
import graft.pipelines.TrainingSet
import graft.sinks.TxTable

/** The round-4 composition: gates → decontamination → exact dedup →
  * incremental near-dup vs the durable store → sequence packing →
  * transactional commit. Planted documents prove each stage drops
  * exactly its target, across TWO batches, with replay protection.
  */
class TrainingSetSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark = Seq(
    (9000L, "the secret benchmark passage about quantum turtles and gradient descent algorithms")
  ).toDF("doc_id", "text")

  private def good(id: Long, seed: String) =
    (id, s"a perfectly reasonable $seed document with the usual amount of " +
      s"varied natural text for the engine to keep and it is long enough " +
      s"to pass the quality gates of the pipeline in round four $seed")

  test("two-batch build: every planted junk class dropped, packs committed atomically") {
    val work = tmpDir("trainset")
    val store = s"$work/store"
    val target = s"$work/train"

    val b1 = Seq(
      good(1L, "alpha"),
      good(2L, "beta"),
      // boilerplate: one token owns the doc -> repetition gate
      (3L, ("spam " * 40).trim),
      // contaminated: embeds an 8-gram of the benchmark passage
      (4L, "leading words then the secret benchmark passage about quantum " +
        "turtles and gradient descent algorithms trailing text to make " +
        "this one long enough to pass the length and quality gates easily"),
      // exact dup inside the batch
      (5L, good(1L, "alpha")._2)
    ).toDF("doc_id", "text")

    val r1 = TrainingSet.ingest(spark, b1, benchmark, store, target, "b1")
    assert(!r1.alreadyApplied)
    assert(r1.input == 5)
    assert(r1.afterGates == 4, s"$r1")         // repetition doc out
    assert(r1.afterDecontaminate == 3, s"$r1") // contaminated doc out
    assert(r1.afterExact == 2, s"$r1")         // exact dup out
    assert(r1.afterNearDup == 2, s"$r1")       // no near-dups yet
    assert(r1.packs >= 1)

    val kept1 = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(1L, 2L))

    // batch 2: a near-dup of a STORED doc (larger id loses to the store
    // even though its own batch would keep it), plus a fresh doc
    val b2 = Seq(
      (11L, good(1L, "alpha")._2 + " tiny tail"),
      good(12L, "gamma")
    ).toDF("doc_id", "text")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2")
    assert(r2.afterNearDup == 1, s"$r2") // 11 near-dups stored doc 1
    val kept2 = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L, 12L), s"$kept2")

    // replay of an applied batch is a no-op (delta ledger)
    val r2b = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2")
    assert(r2b.alreadyApplied)
    assert(TxTable.read(spark, target).get.count() ==
      kept2.size, "replay changed the training table")

    // the committed assignment is complete: every kept doc has a pack
    val t = TxTable.read(spark, target).get
    assert(t.filter(col("pack_id").isNull || col("pack_offset").isNull).count() == 0)
    assert(t.select("batch_id").distinct().count() == 2)
  }

  test("url dedup, semantic decontamination, and leakage-safe split stages") {
    val work = tmpDir("trainurlsplit")
    val store = s"$work/store"
    val target = s"$work/train"

    // orthogonal unit embeddings except doc 23, a paraphrase of the
    // benchmark's embedding direction (cosine 1 > threshold)
    def vec(hot: Int): Array[Float] =
      Array.tabulate(8)(i => if (i == hot) 1f else 0f)
    val benchEmb = Seq(Tuple1(vec(0))).toDF("embedding")

    val b = Seq(
      // same page crawled twice: messy vs canonical URL — one survives
      (21L, good(21L, "alpha")._2, "HTTP://A.com/x/?b=2&utm_source=s", vec(1)),
      (22L, good(22L, "beta")._2, "http://a.com/x?b=2", vec(2)),
      // n-gram-clean PARAPHRASE of the benchmark by embedding
      (23L, good(23L, "gamma")._2, "http://a.com/y", vec(0)),
      (24L, good(24L, "delta")._2, "http://a.com/z", vec(3)),
      // unparseable URL must pass through, not be dropped
      (25L, good(25L, "epsilon")._2, "not a url", vec(4))
    ).toDF("doc_id", "text", "url", "embedding")

    val splits = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)
    val r = TrainingSet.ingest(spark, b, benchmark, store, target, "b1",
      urlCol = Some("url"),
      benchmarkEmbeddings = Some(benchEmb), embedThreshold = 0.9,
      splits = splits)
    assert(r.afterGates == 5, s"$r")
    assert(r.afterUrlDedup == 4, s"$r")            // 22 loses to 21's page
    assert(r.afterDecontaminate == 4, s"$r")       // n-grams see nothing
    assert(r.afterEmbedDecontaminate == 3, s"$r")  // 23 caught semantically
    val t = TxTable.read(spark, target).get
    assert(t.select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(21L, 24L, 25L))
    // every committed row carries its split, and packing ran PER SPLIT:
    // each populated split's pack ids start at 0 (its own fold), which
    // is only possible when no pack spans splits
    assert(t.filter(col("split").isNull).count() == 0)
    val packStarts = t.groupBy("split").agg(min("pack_id").as("m"))
      .collect().map(_.getLong(1))
    assert(packStarts.forall(_ == 0L), "per-split packing expected")
    // split assignment is the deterministic Splits function of doc_id
    val expected = graft.ext.Splits.assign(
      b.select("doc_id"), "doc_id", splits).collect()
      .map(r0 => r0.getLong(0) -> r0.getString(1)).toMap
    t.select("doc_id", "split").collect().foreach { r0 =>
      assert(expected(r0.getLong(0)) == r0.getString(1), s"split drifted")
    }
  }

  test("durable URL store: a later batch's re-crawl drops at the url stage") {
    val work = tmpDir("trainurlstore")
    val store = s"$work/store"
    val target = s"$work/train"
    val urlStore = s"$work/urls"
    val b1 = Seq((31L, good(31L, "alpha")._2, "http://site.com/page"))
      .toDF("doc_id", "text", "url")
    val r1 = TrainingSet.ingest(spark, b1, benchmark, store, target, "b1",
      urlCol = Some("url"), urlStorePath = Some(urlStore))
    assert(r1.afterUrlDedup == 1, s"$r1")
    // batch 2 re-crawls the same page (messier URL, DIFFERENT text so
    // only the URL stage can catch it) plus a genuinely new page
    val b2 = Seq(
      (32L, good(32L, "beta")._2, "HTTP://Site.com/page/?utm_source=f"),
      (33L, good(33L, "gamma")._2, "http://site.com/other")
    ).toDF("doc_id", "text", "url")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2",
      urlCol = Some("url"), urlStorePath = Some(urlStore))
    assert(r2.afterGates == 2 && r2.afterUrlDedup == 1, s"$r2")
    val kept = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(31L, 33L), s"re-crawl 32 must not commit: $kept")
  }

  test("crash replay with a URL store: the rerun still commits the batch") {
    val work = tmpDir("trainurlcrash")
    val store = s"$work/store"
    val target = s"$work/train"
    val urlStore = s"$work/urls"
    val b = Seq(
      (41L, good(41L, "alpha")._2, "http://site.com/a"),
      (42L, good(42L, "beta")._2, "http://site.com/b")
    ).toDF("doc_id", "text", "url")
    // simulate the crash window the advisor flagged: stage 1e registered
    // the batch's URL keys in the durable store, then the run died before
    // the stage-7 TxTable commit — so the ledger has no trace of b1 but
    // the store already owns every key
    graft.ext.IncrementalKeyedDedup.ingest(spark, b, "doc_id",
      graft.ext.Urls.canonicalize(col("url")), urlStore)
    // the rerun must treat the batch's own registrations as "already
    // mine" and carry the rows through to the commit, not anti-join the
    // whole batch away as cross-batch duplicates of itself
    val r = TrainingSet.ingest(spark, b, benchmark, store, target, "b1",
      urlCol = Some("url"), urlStorePath = Some(urlStore))
    assert(!r.alreadyApplied)
    assert(r.afterUrlDedup == 2, s"rerun lost the batch at the URL stage: $r")
    val kept = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(41L, 42L), s"crash replay lost rows: $kept")
  }

  test("substring gate: a cross-batch verbatim span is dropped by exactly that stage") {
    val work = tmpDir("trainsub")
    val store = s"$work/store"
    val target = s"$work/train"
    // NOTE: the good() template shares long verbatim runs between any
    // two docs — exactly what this gate screens — so this test uses
    // fully distinct texts with ONE planted span
    val span = "varied natural text for the engine to keep" // 43 chars
    val b1 = Seq(
      (1L, s"the first document narrates $span alongside its own original " +
        "phrasing that no other record in the corpus repeats anywhere"),
      (2L, "the second document covers completely separate subject matter " +
        "with vocabulary chosen to overlap nothing in the first at all"))
      .toDF("doc_id", "text")
    val r1 = TrainingSet.ingest(spark, b1, benchmark, store, target, "b1",
      minQuality = 0.0, substringMinLen = Some(40))
    assert(r1.afterSubstring == 2, s"$r1")

    // doc 11 is textually DISSIMILAR to everything stored (low shingle
    // jaccard -> survives the near-dup stage) but embeds the 43-char
    // span verbatim; doc 12 is clean
    val b2 = Seq(
      (11L, "entirely different content discussing other topics where " +
        s"$span appears quoted wholesale among fresh surrounding words " +
        "padding this document well past every quality gate threshold"),
      (12L, "a third clean document about yet another independent theme " +
        "sharing no copied span with anything ingested before it here"))
      .toDF("doc_id", "text")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2",
      minQuality = 0.0, substringMinLen = Some(40))
    assert(r2.afterNearDup == 2, s"near-dup stage wrongly dropped: $r2")
    assert(r2.afterSubstring == 1, s"substring stage missed the span: $r2")
    val kept = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 12L), s"$kept")
  }

  test("count-free ingest: identical table and stores, -1 audit counts, ledger intact") {
    val textA = "an original account of tidal pools with phrasing that " +
      "repeats nowhere else in this corpus at all whatsoever"
    val textB = "a second record on alpine lichens with vocabulary " +
      "overlapping nothing in the first account of anything"
    def build(work: String, accounting: Boolean) = {
      val b1 = Seq((1L, textA), (2L, textB)).toDF("doc_id", "text")
      val r1 = TrainingSet.ingest(spark, b1, benchmark, s"$work/store",
        s"$work/train", "b1", minQuality = 0.0, accounting = accounting)
      // near-dup of textA under a new id: must drop via the store in
      // BOTH modes (the stages run identically, only the counts differ)
      val b2 = Seq((3L, textA + " tail")).toDF("doc_id", "text")
      val r2 = TrainingSet.ingest(spark, b2, benchmark, s"$work/store",
        s"$work/train", "b2", minQuality = 0.0, accounting = accounting)
      (r1, r2,
        TxTable.read(spark, s"$work/train").get
          .select("doc_id", "pack_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet)
    }
    val (a1, a2, tableOn) = build(tmpDir("tscnt_on"), accounting = true)
    val workOff = tmpDir("tscnt_off")
    val (f1, f2, tableOff) = build(workOff, accounting = false)
    assert(tableOn == tableOff, s"count-free ingest changed the table: " +
      s"on=$tableOn off=$tableOff")
    assert(a1.afterNearDup == 2 && a2.afterNearDup == 0, s"$a1 / $a2")
    assert(f1.input == -1 && f1.afterGates == -1 && f1.afterNearDup == -1 &&
      f1.afterSubstring == -1 && f1.packs == -1, s"counts leaked: $f1")
    assert(!f2.alreadyApplied, s"$f2")
    // the zero-survivor batch b2 still entered the replay ledger: its
    // rerun is a no-op even though it committed no rows
    val r = TrainingSet.ingest(spark,
      Seq((3L, textA + " tail")).toDF("doc_id", "text"), benchmark,
      s"$workOff/store", s"$workOff/train",
      "b2", minQuality = 0.0, accounting = false)
    assert(r.alreadyApplied, "zero-survivor count-free batch not in ledger")
  }

  test("image stage: perceptual dup with REWRITTEN text drops cross-batch; takedown readmits") {
    val work = tmpDir("trainimg")
    val store = s"$work/store"
    val imgStore = s"$work/imgs"
    val target = s"$work/train"
    val plane = Array.tabulate[Byte](64)(i => ((i * 7) % 101).toByte)
    val other = Array.tabulate[Byte](64)(i => ((i * 13 + 31) % 97).toByte)
    val textA = "the first caption describes a lighthouse on basalt cliffs " +
      "with phrasing no other record repeats anywhere at all today"
    val textB = "completely rewritten alt text mentioning coastal beacons " +
      "and volcanic rock formations with zero shared vocabulary overlap"
    def ing(rows: Seq[(Long, String, Array[Byte])], id: String) =
      TrainingSet.ingest(spark,
        rows.toDF("doc_id", "text", "media")
          .withColumn("width", lit(8)).withColumn("height", lit(8)),
        benchmark, store, target, id, minQuality = 0.0,
        mediaCols = Some(("media", "width", "height")),
        imageStorePath = Some(imgStore))
    val r1 = ing(Seq((1L, textA, plane)), "b1")
    assert(r1.afterImageDedup == 1, s"$r1")
    // batch 2: the SAME image under fully rewritten text — every
    // text-shaped stage passes it, the image store must catch it
    val r2 = ing(Seq((2L, textB, plane)), "b2")
    assert(r2.afterNearDup == 1 && r2.afterImageDedup == 0,
      s"re-encoded image not caught by the perceptual store: $r2")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    // takedown reaches the image store: the same image readmits fresh
    TrainingSet.takedown(spark, target, store, Seq(1L, 2L),
      imageStorePath = Some(imgStore))
    val r3 = ing(Seq((3L, textB + " extra", plane)), "b3")
    assert(r3.afterImageDedup == 1, s"image store did not forget: $r3")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(3L))
    // a DIFFERENT image with near-dup text still drops at the TEXT stage
    // (the stages compose, not replace)
    val r4 = ing(Seq((4L, textB + " extra", other)), "b4")
    assert(r4.afterNearDup == 0, s"text stage stopped working: $r4")
  }

  test("animation stage: a cross-container CUT with REWRITTEN text drops cross-batch; takedown readmits") {
    import graft.ext.Multimodal
    val work = tmpDir("trainanim")
    val store = s"$work/store"
    val animStore = s"$work/anims"
    val target = s"$work/train"
    val pal = Array.tabulate(256 * 3)(i => (i / 3).toByte)
    def fr(f: Int) = Array.tabulate(13 * 9)(p =>
      ((p * 31 + f * 53 + 5) % 251).toByte)
    val gifFull = Multimodal.encodeGifAnim(13, 9,
      (0 until 5).map(fr), pal, (0 until 5).map(f => 6 + f))
    // an APNG re-encode that DROPS the intro frame: the image stage's
    // first-frame key provably diverges, only frame landmarks pair it
    val apngCut = Multimodal.encodeApng(13, 9, 0, (1 until 5).map(f =>
      Multimodal.ApngFrameSpec(fr(f), 13, 9, delayNum = 6 + f)))
    assert(graft.functions.DHashPixels.computeExternal(gifFull, 0, 0)
        .map(_.sh) !=
      graft.functions.DHashPixels.computeExternal(apngCut, 0, 0).map(_.sh),
      "fixture must make the first-frame image key miss")
    val textA = "a looping weather radar animation over the gulf with " +
      "caption phrasing that appears nowhere else in this corpus today"
    val textB = "fully rewritten alt text describing cyclone imagery in " +
      "motion sharing zero vocabulary with the original description"
    def ing(rows: Seq[(Long, String, Array[Byte])], id: String) =
      TrainingSet.ingest(spark,
        rows.toDF("doc_id", "text", "media")
          .withColumn("width", lit(13)).withColumn("height", lit(9)),
        benchmark, store, target, id, minQuality = 0.0,
        mediaCols = Some(("media", "width", "height")),
        animStorePath = Some(animStore))
    val r1 = ing(Seq((1L, textA, gifFull)), "n1")
    assert(r1.afterAnimDedup == 1, s"$r1")
    val r2 = ing(Seq((2L, textB, apngCut)), "n2")
    assert(r2.afterNearDup == 1 && r2.afterAnimDedup == 0,
      s"the cross-container cut must drop at the animation stage: $r2")
    // takedown reaches the animation store; compaction erases it
    TrainingSet.takedown(spark, target, store, Seq(1L, 2L),
      animStorePath = Some(animStore))
    TrainingSet.compactStores(spark, store,
      animStorePath = Some(animStore))
    assert(spark.read.parquet(s"$animStore/fps")
      .filter(col("doc_id").isin(1L, 2L)).count() == 0,
      "takedown+compaction must physically erase the landmarks")
    val r3 = ing(Seq((3L, textB + " extra", apngCut)), "n3")
    assert(r3.afterAnimDedup == 1, s"animation store did not forget: $r3")
  }

  test("audio stage: re-mastered recording with REWRITTEN text drops cross-batch; takedown readmits") {
    import graft.ext.AudioFingerprint
    val work = tmpDir("trainaudio")
    val store = s"$work/store"
    val audioStore = s"$work/audio"
    val target = s"$work/train"
    def rec(k: Int, amp: Double) = AudioFingerprint.tonesWav(8000,
      (0 until 6).map(i => (300.0 + (k * 6 + i) * 25.0, 1024)), amp)
    val textA = "an interview transcript describing harbor seals hauling " +
      "out on granite ledges with phrasing repeated nowhere else at all"
    val textB = "entirely rewritten caption about pinnipeds resting along " +
      "rocky shorelines sharing zero vocabulary with anything previous"
    def ing(rows: Seq[(Long, String, Array[Byte])], id: String) =
      TrainingSet.ingest(spark, rows.toDF("doc_id", "text", "media"),
        benchmark, store, target, id, minQuality = 0.0,
        audioCol = Some("media"), audioStorePath = Some(audioStore))
    val r1 = ing(Seq((1L, textA, rec(4, 0.5))), "a1")
    assert(r1.afterAudioDedup == 1, s"$r1")
    // batch 2: the SAME recording re-mastered quieter, under fully
    // rewritten text — only the landmark store can catch it
    val r2 = ing(Seq((2L, textB, rec(4, 0.25))), "a2")
    assert(r2.afterNearDup == 1 && r2.afterAudioDedup == 0,
      s"re-mastered audio not caught by the landmark store: $r2")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    // a serving-side audio index over the ingested recording: takedown
    // must reach it too — the one-erasure-surface property
    val audioIdx = s"$work/audioidx"
    graft.ext.AudioIndex.build(spark,
      Seq((1L, rec(4, 0.5))).toDF("doc_id", "media"), audioIdx)
    val probe = Seq((900L, rec(4, 0.3))).toDF("doc_id", "media")
    assert(graft.ext.AudioIndex.topK(spark, audioIdx, probe, k = 1)
        .collect().map(_.getLong(1)).toSeq == Seq(1L),
      "pre-takedown: the audio index must find recording 1")
    // takedown reaches the audio store AND index: the recording
    // readmits fresh and stops ranking in query-by-example search
    TrainingSet.takedown(spark, target, store, Seq(1L, 2L),
      audioStorePath = Some(audioStore), audioIndexPath = Some(audioIdx))
    assert(graft.ext.AudioIndex.topK(spark, audioIdx, probe, k = 1)
        .collect().isEmpty,
      "post-takedown: recording 1 must be unfindable in the audio index")
    val r3 = ing(Seq((3L, textB + " more", rec(4, 0.4))), "a3")
    assert(r3.afterAudioDedup == 1, s"audio store did not forget: $r3")
    // a DIFFERENT recording passes while the stage is active
    val r4 = ing(Seq((4L, textA + " again", rec(9, 0.5))), "a4")
    assert(r4.afterAudioDedup == 1, s"distinct audio wrongly dropped: $r4")
    // cross-CONTAINER: a FLAC re-encode of the stored recording (byte-
    // incompatible file, bit-identical decoded signal through the one
    // shared monoSamples) drops at exactly the audio stage — no extra
    // wiring, the decode IS the integration point
    val flacCopy = AudioFingerprint.tonesFlac(8000,
      (0 until 6).map(i => (300.0 + (4 * 6 + i) * 25.0, 1024)), 0.4)
    val r5 = ing(Seq((5L, "yet another fully disjoint caption naming " +
      "nothing previous in any prior batch", flacCopy)), "a5")
    assert(r5.afterNearDup == 1 && r5.afterAudioDedup == 0,
      s"FLAC re-encode not caught by the landmark store: $r5")
  }

  test("video stage: re-WRAPPED mp4 with REWRITTEN text drops cross-batch; takedown readmits") {
    import graft.ext.Multimodal
    val work = tmpDir("trainvideo")
    val store = s"$work/store"
    val videoStore = s"$work/video"
    val target = s"$work/train"
    val payload = Array.tabulate(260)(i => ((i * 31 + 7) % 251).toByte)
    val orig = Multimodal.minimalMp4(600, 1200, 1, 320, 240, mdat = payload)
    // the faststart re-wrap: moov after mdat, padding, all metadata moved
    val rewrap = Multimodal.minimalMp4(90000, 777, 2, 640, 480,
      mdat = payload, moovFirst = false, freePad = 24)
    val otherVid = Multimodal.minimalMp4(600, 1200, 1, 320, 240,
      mdat = payload.map(b => (b ^ 0x2d).toByte))
    val textA = "a screencast walkthrough narrating orbital mechanics " +
      "with phrasing that appears in no other record whatsoever here"
    val textB = "fully rewritten description of a space flight tutorial " +
      "video sharing not one content word with the previous caption"
    def ing(rows: Seq[(Long, String, Array[Byte])], id: String) =
      TrainingSet.ingest(spark, rows.toDF("doc_id", "text", "media"),
        benchmark, store, target, id, minQuality = 0.0,
        videoCol = Some("media"), videoStorePath = Some(videoStore))
    val r1 = ing(Seq((1L, textA, orig)), "v1")
    assert(r1.afterVideoDedup == 1, s"$r1")
    // batch 2: the SAME video re-wrapped, under fully rewritten text —
    // only the payload-fingerprint store can catch it
    val r2 = ing(Seq((2L, textB, rewrap)), "v2")
    assert(r2.afterNearDup == 1 && r2.afterVideoDedup == 0,
      s"re-wrapped video not caught by the payload store: $r2")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L))
    // a row with NO video passes through the stage untouched
    val r2b = ing(Seq((5L, textA + " null media case", null)), "v2b")
    assert(r2b.afterVideoDedup == 1, s"null video wrongly dropped: $r2b")
    // takedown reaches the video store: the same payload readmits fresh
    TrainingSet.takedown(spark, target, store, Seq(1L, 2L),
      videoStorePath = Some(videoStore))
    val r3 = ing(Seq((3L, textB + " more", rewrap)), "v3")
    assert(r3.afterVideoDedup == 1, s"video store did not forget: $r3")
    // a video with DIFFERENT payload bytes passes while the stage is on
    val r4 = ing(Seq((4L, textA + " again", otherVid)), "v4")
    assert(r4.afterVideoDedup == 1, s"distinct video wrongly dropped: $r4")
    // cross-CONTAINER: a WebM re-wrap of the stored coded stream (the
    // same payload bytes as frames in an EBML container) drops at
    // exactly the video stage — videoPayloadFp hashes the raw coded
    // bytes in both walks, so no extra wiring
    val webmCopy = Multimodal.minimalWebm(1000000L, 4000.0, 640, 480,
      Seq(payload.take(60), payload.slice(60, 110), payload.drop(110)),
      blockGroups = true, title = "rewrapped webm edition")
    val r5 = ing(Seq((6L, "a caption with wholly novel vocabulary about " +
      "nothing mentioned before anywhere", webmCopy)), "v5")
    assert(r5.afterNearDup == 1 && r5.afterVideoDedup == 0,
      s"webm re-wrap not caught by the payload store: $r5")
  }

  test("takedown: table row deleted AND every store forgets — content re-admittable") {
    val work = tmpDir("traintakedown")
    val store = s"$work/store"
    val target = s"$work/train"
    val urlStore = s"$work/urls"
    // fully distinct texts: the good() template shares >40-char verbatim
    // runs between any two docs, which the substring gate would screen
    val textA = "the first document narrates an original account of tidal " +
      "marsh ecology with phrasing no other record repeats anywhere at all"
    val textB = "the second document covers volcanic soil chemistry with " +
      "vocabulary chosen to overlap nothing in the first document here"
    val b1 = Seq(
      (1L, textA, "http://site.com/alpha"),
      (2L, textB, "http://site.com/beta")
    ).toDF("doc_id", "text", "url")
    TrainingSet.ingest(spark, b1, benchmark, store, target, "b1",
      minQuality = 0.0, urlCol = Some("url"), urlStorePath = Some(urlStore),
      substringMinLen = Some(40))
    // a serving-side text index over the ingested corpus: takedown must
    // reach it too — the one-erasure-surface property
    val textIdx = s"$work/textidx"
    graft.ext.SimhashIndex.build(
      TxTable.read(spark, target).get.select("doc_id", "text"),
      "doc_id", "text", textIdx, maxHamming = 7)
    val probeA = Seq((900L, textA)).toDF("doc_id", "text")
    assert(graft.ext.SimhashIndex
        .topK(spark, textIdx, probeA, "doc_id", "text", k = 1)
        .collect().map(_.getLong(1)).toSeq == Seq(1L),
      "pre-takedown: the index must find doc 1")
    // right-to-erasure request for doc 1
    val deleted = TrainingSet.takedown(spark, target, store, Seq(1L),
      urlStorePath = Some(urlStore), textIndexPath = Some(textIdx))
    assert(deleted === 1L, s"expected 1 table row deleted, got $deleted")
    assert(!graft.ext.SimhashIndex
        .topK(spark, textIdx, probeA, "doc_id", "text", k = 1)
        .collect().map(_.getLong(1)).contains(1L),
      "post-takedown: doc 1 must be unfindable in the text index")
    // the ONE maintenance pass settles the index physically too: the
    // tombstone folds, the forgotten postings erase, results unchanged
    TrainingSet.compactStores(spark, store, urlStorePath = Some(urlStore),
      textIndexPath = Some(textIdx))
    val idxFs = new org.apache.hadoop.fs.Path(textIdx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!idxFs.exists(
        new org.apache.hadoop.fs.Path(s"$textIdx/forgotten")),
      "compactStores must fold the index tombstones")
    assert(spark.read.parquet(s"$textIdx/postings")
        .filter(org.apache.spark.sql.functions.col("doc_id") === 1L)
        .count() == 0,
      "compactStores must erase the forgotten postings physically")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L))
    // identical content + identical URL re-ingests under a NEW id: every
    // store must have forgotten doc 1, or one of the URL / near-dup /
    // substring stages silently drops the re-admission
    val b2 = Seq((11L, textA, "http://site.com/alpha"))
      .toDF("doc_id", "text", "url")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2",
      minQuality = 0.0, urlCol = Some("url"), urlStorePath = Some(urlStore),
      substringMinLen = Some(40))
    assert(r2.afterUrlDedup == 1, s"URL store did not forget: $r2")
    assert(r2.afterNearDup == 1, s"near-dup store did not forget: $r2")
    assert(r2.afterSubstring == 1, s"substring store did not forget: $r2")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet === Set(2L, 11L))
    // doc 2 was NOT taken down: its content still dedups away
    val b3 = Seq((21L, textB + " tail", "http://other.com/b"))
      .toDF("doc_id", "text", "url")
    val r3 = TrainingSet.ingest(spark, b3, benchmark, store, target, "b3",
      minQuality = 0.0, urlCol = Some("url"), urlStorePath = Some(urlStore),
      substringMinLen = Some(40))
    assert(r3.afterNearDup == 0, s"unforgotten doc 2 stopped blocking: $r3")
  }

  test("durable embedding store: cross-batch paraphrase dropped; takedown erases it") {
    val work = tmpDir("trainembedstore")
    val store = s"$work/store"
    val target = s"$work/train"
    val embStore = s"$work/embeds"
    // embeddings carry the content identity; the TEXTS are all fully
    // distinct (so only the embedding stage can catch the paraphrase)
    def vec(hot: Int, eps: Float = 0f): Array[Float] =
      Array.tabulate(8)(i =>
        if (i == hot) 1f else if (i == (hot + 1) % 8) eps else 0f)
    val b1 = Seq(
      (1L, "the first document narrates tidal marsh ecology with phrasing " +
        "that repeats nowhere else in this corpus at all", vec(0)),
      (2L, "the second document covers volcanic soil chemistry with its own " +
        "vocabulary overlapping nothing written before", vec(2))
    ).toDF("doc_id", "text", "embedding")
    val r1 = TrainingSet.ingest(spark, b1, benchmark, store, target, "b1",
      minQuality = 0.0, embedStorePath = Some(embStore))
    assert(r1.afterEmbedNearDup == 2, s"$r1")
    // batch 2: a PARAPHRASE of doc 1 (cosine ~0.999, different words), a
    // fresh doc, and a row with no embedding (must pass through)
    val b2 = Seq(
      (11L, "a rephrased account of coastal wetland biology using entirely " +
        "different words to say what the first one said", vec(0, 0.05f)),
      (12L, "a genuinely new third topic about glacier dynamics sharing " +
        "no content with anything ingested earlier here", vec(4)),
      (13L, "a row that arrived without an embedding and must survive " +
        "this stage untouched rather than be dropped",
        null.asInstanceOf[Array[Float]])
    ).toDF("doc_id", "text", "embedding")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2",
      minQuality = 0.0, embedStorePath = Some(embStore))
    assert(r2.afterNearDup == 3, s"text stage must not catch the paraphrase: $r2")
    assert(r2.afterEmbedNearDup == 2, s"embed stage must drop doc 11: $r2")
    assert(TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet ===
      Set(1L, 2L, 12L, 13L))
    // takedown of the marsh-ecology content reaches the embedding
    // store. BOTH its ids go: doc 1 (committed) and doc 11 (dropped as
    // a duplicate but still registered as SEEN content — the store
    // family's documented discipline); afterwards a fresh paraphrase
    // re-admits under a new id, and compactStores physically erases the
    // forgotten VECTORS (the right-to-be-forgotten hazard of this store)
    TrainingSet.takedown(spark, target, store, Seq(1L, 11L),
      embedStorePath = Some(embStore), vacuum = true)
    // vacuum = true settles the TABLE tail of physical erasure: the
    // pre-delete generation (still holding doc 1 via time travel) is
    // gone from disk — no surviving data file contains the id
    assert(spark.read.parquet(s"$target/data")
      .filter(col("doc_id") === 1L).count() === 0,
      "vacuumed takedown left doc 1 readable in an old generation")
    val r3 = TrainingSet.ingest(spark,
      Seq((21L, "another paraphrase of the marsh ecology content in yet " +
        "other words long enough for every gate here", vec(0, 0.03f)))
        .toDF("doc_id", "text", "embedding"),
      benchmark, store, target, "b3",
      minQuality = 0.0, embedStorePath = Some(embStore))
    assert(r3.afterEmbedNearDup == 1,
      s"forgotten doc 1 must stop blocking its paraphrases: $r3")
    TrainingSet.compactStores(spark, store, embedStorePath = Some(embStore))
    assert(spark.read.parquet(s"$embStore/vecs")
      .filter(col("doc_id").isin(1L, 11L)).count() === 0,
      "takedown + compactStores left a forgotten vector behind")
    assert(!new java.io.File(s"$embStore/forgotten").exists())
  }

  test("streaming pipeline: micro-batches build the same table; checkpoint loss converges") {
    val work = tmpDir("trainstream")
    val store = s"$work/store"
    val target = s"$work/train"
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    // two "crawl days" land as two files; day 2 re-delivers a near-copy
    // of a day-1 doc (must drop via the durable store) plus a fresh doc
    val day1 = Seq(good(1L, "alpha"), good(2L, "beta")).toDF("doc_id", "text")
    val day2 = Seq(
      (11L, good(1L, "alpha")._2 + " tiny tail"),
      good(12L, "gamma")).toDF("doc_id", "text")
    day1.coalesce(1).write.mode("append").parquet(s"$work/src")
    day2.coalesce(1).write.mode("append").parquet(s"$work/src")
    def run(ckpt: String) = TrainingSet.ingestAvailableNow(
      spark, s"$work/src", docSchema, s"$work/$ckpt",
      (b, deltaId) => TrainingSet.ingest(spark, b, benchmark, store,
        target, deltaId),
      maxFilesPerTrigger = Some(1))
    val reports = run("ckpt")
    assert(reports.length >= 2, s"expected >=2 micro-batches: $reports")
    assert(!reports.exists(_.alreadyApplied))
    def kept = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // keep-first attribution depends on file arrival order; the
    // order-independent law: exactly one of the {1, 11} near-dup pair
    // survives, 2 and 12 always do
    val first = kept
    assert(first.intersect(Set(1L, 11L)).size === 1, s"$first")
    assert(first.contains(2L) && first.contains(12L), s"$first")
    // checkpoint LOSS: everything re-delivers under fresh delta ids —
    // gates + exact dedup + the durable stores drop every row, the
    // zero-survivor batches still ledger, the table converges
    val replay = run("ckpt2")
    assert(kept === first, "checkpoint-loss replay changed the table")
    assert(replay.forall(r => r.alreadyApplied || r.afterNearDup == 0),
      s"replayed batches must commit nothing: $replay")
  }

  test("zero-survivor batch still enters the replay ledger") {
    val work = tmpDir("trainzero")
    val store = s"$work/store"
    val target = s"$work/train"
    val b1 = Seq(good(1L, "alpha")).toDF("doc_id", "text")
    assert(TrainingSet.ingest(spark, b1, benchmark, store, target, "b1")
      .afterNearDup == 1)
    // batch 2 is ONE near-dup of stored content: everything dedups away,
    // yet the store grew (doc 21 is now 'seen') — a rerun must be a
    // no-op, not a reprocess
    val b2 = Seq((21L, good(1L, "alpha")._2 + " extra tail")).toDF("doc_id", "text")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2")
    assert(!r2.alreadyApplied && r2.afterNearDup == 0, s"$r2")
    assert(TxTable.appliedDeltaIds(spark, target) == Set("b1", "b2"))
    val r2b = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2")
    assert(r2b.alreadyApplied, "zero-survivor batch was reprocessed on rerun")
    assert(TxTable.read(spark, target).get.count() == 1)
  }

  test("heavy-hitter stopword gate drops corpus-common-token boilerplate") {
    val work = tmpDir("trainhh")
    val common = Seq("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    // six docs: mostly unique words + two common ones (hhFrac ~ 0.11);
    // one boilerplate doc made ONLY of the corpus-common tokens in
    // varied order (no single token dominates, bigrams mostly unique —
    // the fixed repetition gates cannot see it)
    def unique(i: Long) = (0 until 16).map(j => s"w${i}x$j").mkString(" ")
    val boiler = (common ++ common.reverse ++ common.sorted).mkString(" ")
    val docs = ((1L to 6L).map(i => (i, s"${unique(i)} alpha beta")) :+
      (7L, boiler)).toDF("doc_id", "text")
    val r = TrainingSet.ingest(spark, docs, benchmark,
      s"$work/store", s"$work/train", "b1",
      minQuality = 0.0, hhStopwordK = 10, maxHhStopwordFrac = 0.8)
    assert(r.input == 7 && r.afterGates == 6, s"$r")
    val kept = TxTable.read(spark, s"$work/train").get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 6L).toSet, s"$kept")
  }

  test("LM perplexity gate drops out-of-domain gibberish the rules can't see") {
    val work = tmpDir("trainlm")
    // trusted reference corpus: natural-looking english with shared
    // bigram structure
    val reference = (1L to 20L).map(i =>
      (100L + i, s"the quick brown fox number $i jumps over the lazy dog " +
        s"and the quick dog runs past the brown fox again"))
      .toDF("doc_id", "text")
    val model = graft.ext.NgramLm.train(reference, "text", k = 0.1)
    // gibberish doc: unique non-repeating tokens — passes every fixed
    // gate (no dominant token, no dup bigrams, fine quality ratios) but
    // every transition takes the smoothed floor probability
    val gibberish = (0 until 24).map(j => s"qz${j}v wx${j}k").mkString(" ")
    val docs = ((1L to 4L).map(i =>
      (i, s"the quick brown fox also jumps over the lazy dog number $i " +
        s"and then the brown dog runs past the quick fox")) :+
      (5L, gibberish)).toDF("doc_id", "text")
    val ceiling = graft.ext.NgramLm
      .score(docs.filter(col("doc_id") <= 4), "doc_id", "text", model)
      .agg(max("perplexity")).collect().head.getDouble(0)
    val r = TrainingSet.ingest(spark, docs, benchmark,
      s"$work/store", s"$work/train", "b1",
      minQuality = 0.0, perplexityModel = Some(model),
      maxPerplexity = ceiling + 1)
    assert(r.input == 5 && r.afterGates == 4, s"$r")
    val kept = TxTable.read(spark, s"$work/train").get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 4L).toSet, s"$kept")
  }

  test("NB classifier gate drops negative-class lookalikes") {
    val work = tmpDir("traincls")
    val posRef = (1L to 15L).map(i =>
      (200L + i, s"carefully edited article number $i with varied and " +
        s"meaningful vocabulary across sentences"))
      .toDF("doc_id", "text")
    val negRef = (1L to 15L).map(i =>
      (300L + i, s"click here winner $i free prize claim now cheap deal " +
        s"offer expires soon act fast"))
      .toDF("doc_id", "text")
    val model = graft.ext.Classifier.train(posRef, negRef, "text", k = 0.5)
    val docs = ((1L to 3L).map(i =>
      (i, s"an edited article with meaningful vocabulary and varied " +
        s"sentences number $i for the corpus")) :+
      (4L, "click here to claim the free winner prize now cheap offer " +
        "expires act fast deal soon")).toDF("doc_id", "text")
    val r = TrainingSet.ingest(spark, docs, benchmark,
      s"$work/store", s"$work/train", "b1",
      minQuality = 0.0, classifierModel = Some(model))
    assert(r.input == 4 && r.afterGates == 3, s"$r")
    val kept = TxTable.read(spark, s"$work/train").get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == (1L to 3L).toSet, s"$kept")
  }

  test("compression-ratio gate: looped spam dropped by exactly this stage") {
    import org.apache.spark.sql.functions._
    val work = tmpDir("tsdeflate")
    val prose = "the quick brown fox jumps over the lazy dog and then " +
      "wanders far away to find a quiet meadow near the old stone bridge " +
      "where it is safe to rest for a while in the warm afternoon sun"
    val spam = ("buy now " * 40).trim
    val batch = Seq((1L, prose), (2L, spam)).toDF("doc_id", "text")
    val bench = Seq((900L, "benchmark only text nothing shared"))
      .toDF("doc_id", "text")
    // gate OFF: both docs pass the rule gates (spam is word-diverse
    // enough? no — it trips duplicateNgramFraction; relax that knob so
    // the deflate gate is the ONLY discriminator under test)
    val off = graft.pipelines.TrainingSet.ingest(spark, batch, bench,
      s"$work/off/store", s"$work/off/t", "d1",
      maxTopTokenFrac = 1.0, maxDupNgramFrac = 1.0, minQuality = 0.0)
    assert(off.afterGates === 2, s"$off")
    val on = graft.pipelines.TrainingSet.ingest(spark, batch, bench,
      s"$work/on/store", s"$work/on/t", "d1",
      maxTopTokenFrac = 1.0, maxDupNgramFrac = 1.0, minQuality = 0.0,
      minDeflateRatio = 0.25)
    assert(on.afterGates === 1, s"spam must fall to the deflate floor: $on")
    val kept = graft.sinks.TxTable.read(spark, s"$work/on/t").get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
  }
}
