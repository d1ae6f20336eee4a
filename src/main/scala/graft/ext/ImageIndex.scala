package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Persisted Hamming-space image index — the dHash analog of the
  * persisted IVF artifact (`Similarity.ivfBuildPersisted`): a one-time
  * layout pass that lets bounded-distance image search read a PRUNED
  * slice of the corpus instead of scanning it, the serving lever for
  * image corpora that outgrow the exhaustive `Multimodal.imageTopK`
  * baseline.
  *
  * Layout = multi-index pigeonhole postings (the same blocking
  * arithmetic as `Dedup.hammingCandidates` / the incremental image
  * store, made DURABLE and SORTED):
  *
  *   path/postings/chunk=<c>/   (cval, doc_id, sh) — one posting per
  *     (image, chunk); files within each chunk partition are
  *     range-partitioned AND sorted by cval, so every parquet row group
  *     covers a narrow cval band and a probe's `cval IN (...)` pushed
  *     filter prunes at row-group granularity, not just directory
  *     granularity
  *   path/build_meta            "maxhamming H\nrows N" — the blocking
  *     parameter is part of the artifact (a probe at a different bound
  *     would silently lose recall; reading it from the artifact makes
  *     that impossible)
  *
  * Space is the classic multi-index-hashing trade: (maxHamming+1) rows
  * per image, ~20 bytes each — at H=7 that is 8 postings/image, ~2.5%
  * of a 10 KB average image payload, written once. A probe touches only
  * the row groups whose cval band intersects the probe's chunk values:
  * with b = 64/(H+1) bits per chunk a random probe selects ~(H+1)/2^b
  * of the postings, so the pruning pays off exactly when the bound is
  * tight relative to 64 bits (b >= 8, i.e. H <= 7: ~3% of the corpus
  * read per probe; at H=15, b=4, it reads ~100% and the exhaustive scan
  * is honestly the better plan — `build` rejects those bounds loudly
  * rather than persisting an index that cannot prune).
  *
  * Correctness is pigeonhole-exact, not approximate: any image within
  * `maxHamming` bits of a probe agrees with it on at least one whole
  * chunk, so the candidate union contains every true match; exact
  * Hamming verification on the carried `sh` then makes the result
  * EQUAL to the exhaustive top-k restricted to the bound (the
  * `ext_image_index_topk` gate holds that equality against the
  * brute-force oracle). Deliberately NOT an approximate recall trade —
  * a takedown/compliance search ("find every stored copy of this
  * image") needs the guarantee.
  *
  * Relationship to the family: `IncrementalImageDedup` answers "is this
  * BATCH near anything stored" at crawl cadence; this index answers
  * "what is near this PROBE" at serving cadence over a frozen corpus
  * snapshot. Rebuild = rerun `build` (stage-aside swap: a concurrent
  * probe never observes a half-written index).
  */
object ImageIndex {

  /** Hash `media` (a `Multimodal.mediaTable`-shaped frame) and persist
    * the posting layout at `path`. One pass over the media: hash,
    * explode the maxHamming+1 chunks, range-sort by (chunk, cval),
    * write partitioned by chunk. Degenerate rows (null hash) are not
    * indexed — they never pair anywhere in the family.
    */
  def build(media: DataFrame, path: String, maxHamming: Int = 7,
      filesPerChunk: Int = 8): Unit = {
    require(maxHamming >= 0 && maxHamming <= 7,
      s"imageIndex: maxHamming must be 0..7 (>= 8 bits per chunk) so the " +
        s"layout can prune; at $maxHamming an exhaustive scan is the " +
        "better plan — use Multimodal.imageTopK")
    require(filesPerChunk >= 1, s"imageIndex: filesPerChunk $filesPerChunk")
    val spark = media.sparkSession
    val sh = media.select(col("doc_id"),
      Multimodal.dHashPixels(spark)(
        col("media"), col("width"), col("height")).getField("sh").as("sh"))
      .filter(col("sh").isNotNull)
    val postings = sh
      .select(col("doc_id"), col("sh"),
        explode(Dedup.shChunks(col("sh"), maxHamming)).as("cc"))
      .select(col("cc.chunk").as("chunk"), col("cc.cval").as("cval"),
        col("doc_id"), col("sh"))
    val target = new Path(path)
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new Path(target.getParent, s".${target.getName}__staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    // EXPLICIT fan-out, not the session shuffle default: pruning
    // granularity IS the file/row-group count per chunk directory. A
    // range partition covering a whole chunk (what the conf default
    // degenerates to on a small build) has min=0/max=everything cval
    // stats and can prune nothing; `filesPerChunk` sorted range slices
    // give every file a narrow cval band (huge builds additionally
    // split into 128 MB row groups inside each file, so granularity
    // scales with the corpus either way).
    postings
      .repartitionByRange((maxHamming + 1) * filesPerChunk,
        col("chunk"), col("cval"))
      .sortWithinPartitions(col("chunk"), col("cval"))
      .write.mode("overwrite").partitionBy("chunk")
      .parquet(s"$staging/postings")
    val rows = spark.read.parquet(s"$staging/postings").count()
    val out = fs.create(new Path(staging, "build_meta"), true)
    try {
      out.write(s"maxhamming $maxHamming\nrows $rows\n".getBytes("UTF-8"))
      out.hsync()
    } finally out.close()
    graft.sinks.SwapUtil.stageAsideSwap(fs, target, staging, "image index",
      dstMayBeAbsent = true)
    ()
  }

  /** True when a built artifact exists at `path` (build_meta is staged
    * with the postings, so its presence implies the whole layout).
    */
  def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(s"$path/build_meta")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** The blocking bound the artifact was built at (from build_meta). */
  def boundOf(spark: SparkSession, path: String): Int = metaOf(spark, path)._1

  /** (maxHamming, build-time posting rows) from build_meta. The row
    * count is the staleness denominator for [[append]] — it records the
    * last full LAYOUT pass, so it does not move on appends.
    */
  private def metaOf(spark: SparkSession, path: String): (Int, Long) = {
    val p = new Path(s"$path/build_meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val fields = text.linesIterator.flatMap { l =>
      l.split(" ", 2) match {
        case Array(k, v) => Some(k -> v.trim)
        case _ => None
      }
    }.toMap
    (fields.get("maxhamming").map(_.toInt).getOrElse(
        sys.error(s"image index at $path: no maxhamming in build_meta")),
      fields.get("rows").map(_.toLong).getOrElse(0L))
  }

  final case class AppendResult(
      appended: Long, skipped: Long, totalPostings: Long,
      staleness: Double, rebuildAdvised: Boolean)

  /** Incrementally grow the index with a batch of new images — the
    * `ivfAppendPersisted` discipline applied to the Hamming layout.
    * Already-indexed doc_ids skip (id anti-join against ONE chunk
    * partition — every image posts in every chunk, so chunk 0 carries
    * the complete id set at 1/(H+1) of the postings); fresh images
    * append as their own cval-sorted files per chunk directory.
    * Appends degrade pruning gradually, not correctness: each appended
    * file carries its own narrow cval band, but file COUNT grows per
    * batch, so `staleness` (appended rows / build-time rows) tells the
    * caller when to re-run [[build]] and restore the packed layout —
    * the same rebuild-economics contract as the IVF artifact. Probe
    * results are unaffected by replays: a re-appended batch anti-joins
    * away, and [[topK]]'s per-pair dropDuplicates absorbs any residue.
    */
  def append(media: DataFrame, path: String,
      rebuildThreshold: Double = 0.5): AppendResult = {
    val spark = media.sparkSession
    require(exists(spark, path), s"no image index at $path — build first")
    val (maxHamming, atBuild) = metaOf(spark, path)
    val sh = media.select(col("doc_id"),
      Multimodal.dHashPixels(spark)(
        col("media"), col("width"), col("height")).getField("sh").as("sh"))
      .filter(col("sh").isNotNull)
    val existingIds =
      spark.read.parquet(s"$path/postings/chunk=0").select("doc_id")
    val fresh = sh.join(existingIds, Seq("doc_id"), "left_anti")
      .localCheckpoint(false) // counted AND written
    val freshCount = fresh.count()
    val input = sh.count()
    if (freshCount > 0)
      fresh
        .select(col("doc_id"), col("sh"),
          explode(Dedup.shChunks(col("sh"), maxHamming)).as("cc"))
        .select(col("cc.chunk").as("chunk"), col("cc.cval").as("cval"),
          col("doc_id"), col("sh"))
        .repartitionByRange(maxHamming + 1, col("chunk"), col("cval"))
        .sortWithinPartitions(col("chunk"), col("cval"))
        .write.mode("append").partitionBy("chunk")
        .parquet(s"$path/postings")
    val total = spark.read.parquet(s"$path/postings").count()
    val staleness =
      (total - atBuild).toDouble / math.max(atBuild, 1L).toDouble
    AppendResult(freshCount, input - freshCount, total, staleness,
      staleness > rebuildThreshold)
  }

  /** Bounded-distance top-k against the persisted index: for each probe
    * image, the k nearest corpus images WITHIN the index's Hamming
    * bound — equal to the exhaustive top-k restricted to that bound.
    *
    * Probe shape (the ivfTopKPersisted discipline): probe hashes are a
    * BOUNDED driver-side set (this is a serving call — enforced, not
    * assumed); each chunk directory gets its own scan carrying a plain
    * pushed `cval IN (...)` predicate, so the postings read prunes to
    * the probe's buckets (directories by chunk, row groups and pages by
    * the sorted cval bands) and never materializes the corpus. The
    * pruned candidates broadcast-join the probe table, verify exact
    * Hamming on the carried signature, and feed bounded per-partition
    * top-k heaps. Ties break to the lower doc_id.
    *
    * Returns (q_id, doc_id, hamming) — at most k rows per probe; probes
    * with nothing inside the bound return no rows (the honest answer
    * for a bounded search).
    */
  def topK(spark: SparkSession, path: String, probes: DataFrame, k: Int,
      maxProbes: Int = 4096): DataFrame = {
    require(k > 0, s"imageIndex: k must be positive, got $k")
    val maxHamming = boundOf(spark, path)
    val qs = probes.select(col("doc_id").as("q_id"),
      Multimodal.dHashPixels(spark)(
        col("media"), col("width"), col("height")).getField("sh").as("qsh"))
      .filter(col("qsh").isNotNull)
      .limit(maxProbes + 1)
      .collect()
    require(qs.length <= maxProbes,
      s"imageIndex: more than $maxProbes probes — this is a serving call; " +
        "batch-vs-corpus jobs belong on IncrementalImageDedup/imageNearDups")
    if (qs.isEmpty) {
      import spark.implicits._
      return Seq.empty[(Long, Long, Int)].toDF("q_id", "doc_id", "hamming")
    }
    val nChunks = maxHamming + 1
    val chunkBits = 64 / nChunks
    def cvalOf(sh: Long, c: Int): Long =
      if (c == nChunks - 1) sh >>> (c * chunkBits)
      else (sh >>> (c * chunkBits)) & ((1L << chunkBits) - 1)
    // one scan PER CHUNK DIRECTORY, each with a plain `cval IN (...)`
    // predicate — a pushable data filter (an OR-of-ANDs over
    // (chunk, cval) pushes nothing: the partition pruner can only
    // extract `chunk IN (all)` from it and the parquet reader drops the
    // mixed disjunction entirely — measured, not assumed: the spec holds
    // probe bytes-read below the full scan). Row groups and pages whose
    // sorted cval band misses the probe values never leave disk.
    import spark.implicits._
    val parts = (0 until nChunks).map { c =>
      val vals = qs.map(r => cvalOf(r.getLong(1), c)).distinct.toSeq
      spark.read.parquet(s"$path/postings/chunk=$c")
        .filter(col("cval").isInCollection(vals))
        .select(lit(c).as("chunk"), col("cval"), col("doc_id"), col("sh"))
    }
    val probeDf = qs.map(r => (r.getLong(0), r.getLong(1)))
      .toSeq.toDF("q_id", "qsh")
      .select(col("q_id"), col("qsh"),
        explode(Dedup.shChunks(col("qsh"), maxHamming)).as("cc"))
      .select(col("cc.chunk").as("chunk"), col("cc.cval").as("cval"),
        col("q_id"), col("qsh"))
    val cand = parts.reduce(_ unionByName _)
      .join(broadcast(probeDf), Seq("chunk", "cval"))
      .select(col("q_id"), col("doc_id"),
        bit_count(col("sh").bitwiseXOR(col("qsh"))).cast("int").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("q_id", "doc_id") // a pair can share several chunks
    graft.ops.GroupedTopK(spark, cand.select(col("q_id"), col("doc_id"),
        (-col("hamming")).cast("double").as("score")), "q_id", "score",
        "doc_id", k)
      .select(col("q_id").cast("long").as("q_id"), col("doc_id"),
        (-col("score")).cast("int").as("hamming"))
  }
}
