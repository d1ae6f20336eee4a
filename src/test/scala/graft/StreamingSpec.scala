package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventIngest

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** FileStreamSource requires a DIRECTORY; the testdata table is a single
    * file, so stage it into a temp dir once for the suite.
    */
  private lazy val srcDir: String = {
    val dir = tmpDir("events_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    dir
  }

  test("availableNow ingest: all events land once; rerun inserts nothing") {
    val work = tmpDir("stream")
    val n1 = EventIngest.ingestAvailableNow(spark, srcDir,
      s"$work/events_table", s"$work/ckpt1")
    assert(n1 == 1000)
    assert(spark.read.parquet(s"$work/events_table").count() == 1000)
    // Fresh checkpoint = full reprocess; the idempotent K5 sink absorbs it
    // (exactly-once-per-key without checkpoint coupling).
    val n2 = EventIngest.ingestAvailableNow(spark, srcDir,
      s"$work/events_table", s"$work/ckpt2")
    assert(n2 == 0)
    assert(spark.read.parquet(s"$work/events_table").count() == 1000)
  }

  test("flatMapGroupsWithState sessionization matches session_window semantics") {
    val work = tmpDir("sess")
    val q = graft.streaming.Sessionize(spark,
      EventIngest.readEventStream(spark, srcDir), gapMinutes = 30)
      .writeStream
      .format("memory")
      .queryName("sessions")
      .outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("sessions")
      .select(col("user_id"), col("session_start").cast("timestamp_ntz"),
        col("session_end").cast("timestamp_ntz"), col("cnt"),
        round(col("sum_value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    // Batch truth: session_window over the same events. Sessions closed
    // by a LATER event always stream; each user's final session streams
    // only if the end-of-stream watermark passed its timeout (AvailableNow
    // runs a final no-data batch where event-time timeouts fire). So:
    // streamed ⊆ all, all∖streamed ⊆ {per-user last}, non-last ⊆ streamed.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("session_start").desc)
    val batchDf = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("cnt"), col("sum_value"))
      .withColumn("__rn", row_number().over(w))
    val batchAll = batchDf.drop("__rn").collect().map(_.toSeq).toSet
    val batchLast = batchDf.filter(col("__rn") === 1).drop("__rn")
      .collect().map(_.toSeq).toSet
    assert(streamed.subsetOf(batchAll), "streamed a session batch truth lacks")
    assert((batchAll -- streamed).subsetOf(batchLast),
      "failed to stream a session that a later event had closed")
    assert((batchAll -- batchLast).subsetOf(streamed))
    assert(streamed.nonEmpty)
  }

  test("dropDuplicatesWithinWatermark: a replayed file dedupes with bounded state") {
    val dupDir = tmpDir("events_dup")
    // same table staged twice = full replay arriving as a second file
    for (n <- Seq("a", "b"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
        java.nio.file.Paths.get(dupDir, s"$n.parquet"))
    val work = tmpDir("streamdedup")
    val q = graft.streaming.EventIngest.dedupedStream(
      graft.streaming.EventIngest.readEventStream(spark, dupDir))
      .select("event_id")
      .writeStream
      .format("memory").queryName("deduped").outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = spark.table("deduped").collect().map(_.getLong(0))
    assert(ids.length == 1000, s"expected 1000 unique events, got ${ids.length}")
    assert(ids.toSet.size == 1000)
  }

  test("stream-static enrichment join matches batch; dim broadcast, stream unshuffled") {
    val work = tmpDir("streamdim")
    // static dim derived deterministically from the same table — and
    // deliberately SHARING the key column name (the natural call shape
    // the internal rename exists for)
    val dim = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("user_id")).distinct()
      .withColumn("segment", (col("user_id") % 3).cast("int"))
    val q = EventIngest.enrichWithDim(
      EventIngest.readEventStream(spark, srcDir), dim, "user_id", "user_id")
      .select("event_id", "user_id", "segment")
      .writeStream
      .format("memory").queryName("enriched").outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("enriched").collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .join(broadcast(dim.withColumnRenamed("user_id", "d_user_id")),
        col("user_id") === col("d_user_id"), "left")
      .select("event_id", "user_id", "segment")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join: click->purchase pairs match the batch join") {
    val work = tmpDir("streamss")
    val clicks = EventIngest.readEventStream(spark, srcDir)
      .filter(col("event_type") === "click")
    val purchases = EventIngest.readEventStream(spark, srcDir)
      .filter(col("event_type") === "purchase")
    val q = EventIngest.correlate(clicks, purchases, "user_id", withinMinutes = 60)
      .select("user_id", "id_l", "id_r")
      .writeStream
      .format("memory").queryName("correlated").outputMode("append")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("correlated").collect().map(_.toSeq).toSet
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("ts_l"), col("event_id").as("id_l"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("u2"), col("ts").as("ts_r"), col("event_id").as("id_r"))
    val batch = c.join(p,
      col("user_id") === col("u2") &&
        col("ts_r") >= col("ts_l") &&
        col("ts_r") <= col("ts_l") + expr("INTERVAL 60 MINUTES"))
      .select("user_id", "id_l", "id_r")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("correlate's watermark covers the join horizon (no silent in-window drops)") {
    // a 20-min watermark with a 45-min join window would expire buffered
    // rows while matching rows are still admissible — the delay must
    // stretch to the horizon
    val s = EventIngest.readEventStream(spark, srcDir)
    val j = EventIngest.correlate(
      s.filter(col("event_type") === "click"),
      s.filter(col("event_type") === "purchase"),
      "user_id", withinMinutes = 45)
    val plan = j.queryExecution.analyzed.toString
    assert(plan.contains("45 minutes"), s"watermark not derived from horizon:\n$plan")
    assert(!plan.contains("20 minutes"), s"hardcoded 20-min watermark survived:\n$plan")
  }

  test("streaming near-dup ingest over micro-batches == one-shot pairs; replay-safe") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val work = tmpDir("streamdedup")
    // stage the corpus as TWO files so maxFilesPerTrigger=1 forces two
    // micro-batches — the cross-batch pairs must come from the STORE
    for (half <- Seq(0, 1))
      docs.filter(col("doc_id") % 2 === half).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val nb = graft.streaming.StreamingDedup.ingestAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", "text",
      s"$work/store", s"$work/pairs", s"$work/ckpt",
      maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    val streamed = graft.streaming.StreamingDedup.pairs(spark, s"$work/pairs")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.ext.Dedup.minhashNearDups(docs, "doc_id", "text")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot,
      s"missing=${oneShot -- streamed} extra=${streamed -- oneShot}")
    // checkpoint loss => full replay; the keyed store absorbs it and the
    // consumer-side distinct keeps the pair log exactly-once in effect
    graft.streaming.StreamingDedup.ingestAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", "text",
      s"$work/store", s"$work/pairs", s"$work/ckpt2",
      maxFilesPerTrigger = Some(1))
    val replayed = graft.streaming.StreamingDedup.pairs(spark, s"$work/pairs")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(replayed == oneShot)
  }

  test("streaming substring ingest over micro-batches == one-shot pairs; replay-safe") {
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val span = "0123456789abcdefghijklmnopqrstuvwxyzABCD" // 40 chars
    val docs = Seq(
      (1L, s"$span leading copy plus plenty of original trailing words here"),
      (2L, "a completely independent document with no span copied anywhere"),
      (3L, s"later arrival that quotes $span inside fresh surrounding text"),
      (4L, "another independent arrival with its own vocabulary only"))
      .toDF("doc_id", "text")
    val work = tmpDir("streamsub")
    for (half <- Seq(0, 1)) // two files -> two forced micro-batches
      docs.filter(col("doc_id") % 2 === (1 - half)).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val nb = graft.streaming.StreamingDedup.ingestSubstringAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", "text",
      s"$work/store", s"$work/pairs", s"$work/ckpt",
      minLen = 40, maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    def logged = graft.streaming.StreamingDedup
      .substringPairs(spark, s"$work/pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.ext.Dedup
      .sharedSubstringPairs(docs, "doc_id", "text", minLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(logged == oneShot && oneShot == Set((1L, 3L)),
      s"streamed=$logged oneShot=$oneShot")
    // checkpoint loss => full replay; idempotent store + consumer-side
    // distinct keep the pair log exactly-once in effect
    graft.streaming.StreamingDedup.ingestSubstringAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", "text",
      s"$work/store", s"$work/pairs", s"$work/ckpt2",
      minLen = 40, maxFilesPerTrigger = Some(1))
    assert(logged == oneShot)
  }

  test("event stream starts on an EMPTY landing directory (schema fallback)") {
    // the normal deployment order: the stream starts first, files land
    // later — the footer probe has nothing to read and must fall back
    // to the conf-selected explicit schema instead of throwing
    val empty = tmpDir("emptyland")
    val stream = EventIngest.readEventStream(spark, empty)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
  }

  test("streaming line dedup: one survivor per distinct line; replay-safe") {
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val docs = Seq(
      (1L, "shared\nalpha\nshared"),
      (2L, "beta\nshared"),
      (3L, "gamma\nbeta"),
      (4L, "delta"))
      .toDF("doc_id", "text")
    val work = tmpDir("streamlines")
    for (half <- Seq(0, 1)) // two files -> two forced micro-batches
      docs.filter(col("doc_id") % 2 === half).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val nb = graft.streaming.StreamingDedup.ingestLinesAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", "text",
      s"$work/store", s"$work/lines", s"$work/ckpt",
      maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    def logged = graft.streaming.StreamingDedup
      .survivingLines(spark, s"$work/lines", "doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    // keep-first ATTRIBUTION depends on micro-batch arrival order (file
    // order is not id order), so assert the order-INDEPENDENT laws:
    // every distinct line survives exactly once, none is lost
    val first = logged
    assert(first.map(_._3) === Set("shared", "alpha", "beta", "gamma", "delta"))
    assert(first.size === 5, s"duplicate survivors: $first")
    // checkpoint loss => full replay: replayed batches collide with the
    // store and emit nothing new; the log stays exactly-once in effect
    graft.streaming.StreamingDedup.ingestLinesAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", "text",
      s"$work/store", s"$work/lines", s"$work/ckpt2",
      maxFilesPerTrigger = Some(1))
    assert(logged === first)
    // pre-first-write reader declares the written schema (string id here
    // would break a consumer that ran before data arrived — pinned)
    val empty = graft.streaming.StreamingDedup
      .survivingLines(spark, s"$work/never", "doc_id")
    assert(empty.schema.fieldNames.toSeq === Seq("doc_id", "line_no", "line"))
    assert(empty.count() === 0)
  }

  test("streaming keyed (URL) dedup: micro-batches == one-shot keep-first; replay-safe") {
    val docSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType)))
    // a crawl stream: same page under messy variants, a fresh page, an
    // unparseable row (must pass through, never be registered)
    val crawl = Seq(
      (1L, "HTTP://A.com/x?b=2&utm_source=s"),
      (2L, "http://a.com/x/?b=2"), // same page as 1 — messier
      (3L, "http://a.com/y"),
      (4L, "not a url"))
      .toDF("doc_id", "url")
    val work = tmpDir("streamkeyed")
    for (half <- Seq(0, 1)) // two files -> two forced micro-batches
      crawl.filter(col("doc_id") % 2 === (1 - half)).select("doc_id", "url")
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val key = graft.ext.Urls.canonicalize(col("url"))
    val nb = graft.streaming.StreamingDedup.ingestKeyedAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", key,
      s"$work/store", s"$work/survivors", s"$work/ckpt",
      maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    def logged = graft.streaming.StreamingDedup
      .keyedSurvivors(spark, s"$work/survivors", docSchema)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // keep-first ATTRIBUTION depends on micro-batch arrival order, so
    // assert the order-independent laws: exactly one of the x-page pair
    // survives, the fresh page and the keyless row always survive
    val first = logged
    assert(first.intersect(Set(1L, 2L)).size === 1,
      s"exactly one crawl of page x must survive: $first")
    assert(first.contains(3L) && first.contains(4L), s"$first")
    // checkpoint loss => full replay: the owner-aware ingest re-emits
    // the same survivors (no batch lost, no usurped keys); the
    // consumer-side distinct keeps the log exactly-once in effect
    graft.streaming.StreamingDedup.ingestKeyedAvailableNow(spark,
      s"$work/src", docSchema, "doc_id", key,
      s"$work/store", s"$work/survivors", s"$work/ckpt2",
      maxFilesPerTrigger = Some(1))
    assert(logged === first, "replay changed the survivor log")
    // pre-first-write reader declares the source schema
    val empty = graft.streaming.StreamingDedup
      .keyedSurvivors(spark, s"$work/never", docSchema)
    assert(empty.schema.fieldNames.toSeq === Seq("doc_id", "url"))
    assert(empty.count() === 0)
  }

  test("streaming windowed agg matches the batch computation") {
    val work = tmpDir("streamwin")
    val q = EventIngest.windowedCounts(
      EventIngest.readEventStream(spark, srcDir))
      .writeStream
      .format("memory")
      .queryName("win_counts")
      .outputMode("complete")
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("win_counts")
      .select("window_start", "event_type", "cnt", "sum_value")
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, "/root/testdata/sf0.001")
      .groupBy(date_trunc("hour", col("ts")).cast("timestamp_ntz").as("window_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming rollup maintenance: micro-batches == direct agg; checkpoint loss cannot double-count") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val rows = Seq(("a", 1L), ("a", 2L), ("b", 10L), ("a", 4L), ("b", 20L),
      ("c", 100L)).toDF("grp", "v")
    val work = tmpDir("streamroll")
    for (half <- Seq(0, 1)) // two files -> two forced micro-batches
      rows.filter(col("v") % 2 === half).coalesce(1)
        .write.mode("append").parquet(s"$work/src")
    def maintain(ckpt: String): Long =
      graft.streaming.StreamingRollup.maintainAvailableNow(spark,
        s"$work/src", schema, s"$work/rollup",
        groupCols = Seq("grp"), sumCols = Seq("v" -> "sum_v"),
        checkpointDir = s"$work/$ckpt", streamId = "s1",
        maxFilesPerTrigger = Some(1))
    assert(maintain("ckpt") >= 2)
    def state = graft.sinks.TxTable.read(spark, s"$work/rollup").get
      .select("grp", "cnt", "sum_v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val direct = Set(("a", 3L, 7L), ("b", 2L, 30L), ("c", 1L, 100L))
    assert(state == direct)
    // checkpoint LOSS replays every micro-batch; the TxTable deltaId
    // ledger recognizes s1-<batchId> and skips the fold — the standing
    // aggregate cannot double-count (true exactly-once, no consumer-side
    // dedup involved)
    maintain("ckpt2")
    assert(state == direct)
  }

  test("streaming embedding ingest over micro-batches == one-shot pairs") {
    val vecs = graft.queries.ExtQueries
      .plantedNearDupVectors(spark, "/root/testdata/sf0.001")
      .localCheckpoint(true)
    val schema = vecs.schema
    val work = tmpDir("streamembed")
    // base vectors and their planted twins in separate files -> separate
    // micro-batches: every twin pair must surface cross-batch
    for (half <- Seq(0, 1))
      vecs.filter(if (half == 0) col("vec_id") < 10000
                  else col("vec_id") >= 10000)
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val P = graft.ext.IncrementalEmbedDedup.Params(
      threshold = 0.99, maxHamming = 10)
    val nb = graft.streaming.StreamingDedup.ingestEmbeddingsAvailableNow(
      spark, s"$work/src", schema, "vec_id", "v",
      s"$work/store", s"$work/pairs", s"$work/ckpt", P,
      maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    val streamed = spark.read.parquet(s"$work/pairs")
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.ext.Similarity
      .rpNearDups(vecs, "vec_id", "v", threshold = 0.99, maxHamming = 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot && oneShot.nonEmpty,
      s"missing=${oneShot -- streamed} extra=${streamed -- oneShot}")
  }

  test("streaming image ingest over micro-batches == one-shot pairs") {
    val media = graft.ext.Multimodal.mediaTable(
      Tables.documents(spark, "/root/testdata/sf0.001")
        .filter(col("doc_id") < 200)).localCheckpoint(true)
    val schema = media.schema
    val work = tmpDir("streamimg")
    // two files -> two micro-batches: cross-batch perceptual pairs must
    // surface via the durable store, not the in-batch path
    for (half <- Seq(0, 1))
      media.filter(if (half == 0) col("doc_id") < 100
                   else col("doc_id") >= 100)
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val nb = graft.streaming.StreamingDedup.ingestImagesAvailableNow(
      spark, s"$work/src", schema, s"$work/store", s"$work/pairs",
      s"$work/ckpt", maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    val streamed = spark.read.parquet(s"$work/pairs")
      .select("id_a", "id_b").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val oneShot = graft.ext.Multimodal.imageNearDups(media, maxHamming = 10)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == oneShot && oneShot.nonEmpty,
      s"missing=${oneShot -- streamed} extra=${streamed -- oneShot}")
  }

  test("streaming video dedup: a re-wrapped copy drops cross-batch; replay-safe") {
    import org.apache.spark.sql.types.{BinaryType, LongType, StructField, StructType}
    val payloadA = Array.tabulate(300)(i => ((i * 31 + 7) % 251).toByte)
    val payloadB = Array.tabulate(280)(i => ((i * 13 + 5) % 251).toByte)
    val orig = graft.ext.Multimodal.minimalMp4(600, 1200, 1, 320, 240,
      mdat = payloadA)
    // the faststart re-wrap: moov relocated, every metadata field moved,
    // free padding — byte-different, same mdat payload
    val remux = graft.ext.Multimodal.minimalMp4(90000, 500L, tracks = 2,
      width = 640, height = 480, mdat = payloadA,
      moovFirst = false, freePad = 16)
    val other = graft.ext.Multimodal.minimalMp4(600, 1200, 1, 320, 240,
      mdat = payloadB)
    val notMp4 = "just some text bytes".getBytes("UTF-8")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("video", BinaryType)))
    val crawl = Seq((1L, orig), (2L, remux), (3L, other), (4L, notMp4))
      .toDF("doc_id", "video")
    val work = tmpDir("streamvid")
    for (half <- Seq(0, 1)) // two files -> two forced micro-batches
      crawl.filter(col("doc_id") % 2 === (1 - half))
        .coalesce(1).write.mode("append").parquet(s"$work/src")
    val nb = graft.streaming.StreamingDedup.ingestVideosAvailableNow(spark,
      s"$work/src", schema, "doc_id", "video",
      s"$work/store", s"$work/survivors", s"$work/ckpt",
      maxFilesPerTrigger = Some(1))
    assert(nb >= 2, s"expected >=2 micro-batches, got $nb")
    def logged = graft.streaming.StreamingDedup
      .keyedSurvivors(spark, s"$work/survivors", schema)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // keep-first attribution depends on micro-batch arrival order:
    // assert the order-independent laws — exactly one of the
    // re-wrapped pair survives CROSS-BATCH (1 and 2 land in different
    // micro-batches by the %2 split), the distinct payload and the
    // keyless non-MP4 row always survive
    val first = logged
    assert(first.intersect(Set(1L, 2L)).size === 1,
      s"exactly one wrap of the same video must survive: $first")
    assert(first.contains(3L) && first.contains(4L), s"$first")
    // checkpoint loss => full replay converges to the same survivors
    graft.streaming.StreamingDedup.ingestVideosAvailableNow(spark,
      s"$work/src", schema, "doc_id", "video",
      s"$work/store", s"$work/survivors", s"$work/ckpt2",
      maxFilesPerTrigger = Some(1))
    assert(logged === first, "replay changed the survivor log")
  }

  test("pre-first-write pair log declares the corpus id type, not LongType") {
    import org.apache.spark.sql.types.{LongType, StringType}
    // a consumer that runs BEFORE any pairs are emitted must see the
    // same schema it will see after — string-id corpora previously got
    // a LongType empty frame that broke later unions/joins
    val none = tmpDir("emptypairs") + "/never_written"
    val sp = graft.streaming.StreamingDedup.pairs(spark, none, StringType)
    assert(sp.schema("id_a").dataType == StringType &&
      sp.schema("id_b").dataType == StringType && sp.count() == 0)
    val ss = graft.streaming.StreamingDedup.substringPairs(spark, none, StringType)
    assert(ss.schema("id_a").dataType == StringType && ss.count() == 0)
    // default stays LongType for the engine's own long-keyed corpora
    assert(graft.streaming.StreamingDedup.pairs(spark, none)
      .schema("id_a").dataType == LongType)
  }

  test("enrichAsOf: event-time-correct dim version; processing-time would leak") {
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    val cut = Timestamp.valueOf("2024-01-15 00:00:00")
    val dim = Seq(
      (7L, "bronze", Timestamp.valueOf("1970-01-01 00:00:00"), Option(cut)),
      (7L, "gold", cut, Option.empty[Timestamp])
    ).toDF("u", "tier", "valid_from", "valid_to")
      .select(col("u"), col("tier"), col("valid_from"),
        col("valid_to").cast("timestamp"))
    val events = Seq(
      (1L, 7L, Timestamp.valueOf("2024-01-10 12:00:00")), // before upgrade
      (2L, 7L, cut),                                       // boundary: >= from
      (3L, 7L, Timestamp.valueOf("2024-01-20 12:00:00")), // after
      (4L, 9L, Timestamp.valueOf("2024-01-20 12:00:00"))  // no dim row at all
    ).toDF("event_id", "user_id", "ts")
    val stream = events // batch DF exercises the same join; the oracled
    // stream_temporal_enrich entry drives the real streaming runtime
    val got = EventIngest.enrichAsOf(stream, dim, "user_id", "u",
        "ts", "valid_from", "valid_to")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L) === Some("bronze")) // the version valid AT the event
    assert(got(2L) === Some("gold"))   // inclusive lower bound
    assert(got(3L) === Some("gold"))
    assert(got(4L) === None)           // left join keeps unmatched events
  }
}
