package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{AudioFingerprint, Chunker, Dedup, IncrementalImageDedup, LineDedup, Multimodal, TextAnalysis}
import graft.ops.Quality
import graft.sources.TableIO

/** End-to-end training-data curation: the composition the [EXT] operators
  * exist for. One pipeline takes a raw document corpus to training-ready
  * chunks:
  *
  *   quality gate -> PII redaction [-> C4-style boilerplate strip]
  *   -> exact dedup -> near-dup dedup
  *   (MinHash-LSH -> connected components, keep canonical)
  *   [-> perceptual IMAGE dedup] [-> landmark AUDIO dedup]
  *   -> token-window chunking -> lang-partitioned parquet
  *
  * Stage order is the cost order: the cheap scan-speed gates (quality,
  * redaction, exact-dup hash) shrink the corpus BEFORE the shuffling
  * near-dup stage, and chunking (which multiplies rows) runs last. The
  * expensive tail (chunk+write) reports its count via observe, riding
  * the write; stage counts before it are count()s over the checkpointed
  * post-dedup frame or the scan-speed gate — cheap, but real actions.
  */
object Curation {

  /** Stage-by-stage row accounting (the pipeline's audit trail). */
  final case class Report(
      input: Long, afterQuality: Long, afterExact: Long,
      afterNearDup: Long, chunks: Long, afterBoilerplate: Long = -1,
      afterImageDedup: Long = -1, afterAudioDedup: Long = -1,
      afterVideoDedup: Long = -1)

  /** @param minQuality  quality-score gate in [0,1] (TextAnalysis.qualityScore)
    * @param threshold   near-dup jaccard threshold for MinHash-LSH
    * @param window      chunk window (tokens); `stride` = window - overlap
    * @param boilerplateMinDocs when set, C4-style boilerplate stripping
    *        (LineDedup.stripBoilerplate) between redaction and exact
    *        dedup: any line recurring in at least this many distinct
    *        documents is dropped from EVERY document — nav bars, cookie
    *        banners, license headers — and a document left with no lines
    *        drops entirely. It must run BEFORE the content-hash stages:
    *        removing shared boilerplate is exactly what lets two
    *        near-identical articles hash/shingle on their own words.
    * @param mediaCols when set — (media, width, height) column names on
    *        `docs` — a perceptual IMAGE dedup stage runs after the text
    *        near-dup stage: a re-crawled page whose TEXT was rewritten
    *        but whose picture is the same (or a re-encoded copy of it —
    *        `Multimodal.dHashPixels` hashes the decoded plane) collapses
    *        to one canonical doc. Rows with null media or degenerate
    *        geometry pass through untouched — they can never be image
    *        dups of anything. It runs AFTER the text stages because the
    *        text dedup is the bigger reducer and image hashing then
    *        scans fewer rows.
    * @param imageStorePath with `mediaCols`: dedup against the durable
    *        cross-run dHash store (`IncrementalImageDedup` — stored doc
    *        wins, keep-first in-batch) instead of the one-shot
    *        components form, and register this run's survivors.
    * @param audioCol when set, the acoustic sibling of the media stage:
    *        landmark-fingerprint dedup (`AudioFingerprint`) over this
    *        opaque audio column after the image stage — a re-mastered
    *        copy of the same recording under rewritten text collapses
    *        to one canonical doc. Null/undecodable audio passes through.
    * @param audioStorePath with `audioCol`: the durable cross-run
    *        fingerprint store instead of the one-shot components form.
    * @param videoCol when set, VIDEO dedup by remux-robust payload
    *        fingerprint after the audio stage — a re-WRAPPED copy of
    *        the same MP4 (moov relocated, metadata rewritten, padding)
    *        under rewritten text collapses to one canonical doc.
    *        Non-MP4/payload-less media fingerprints NULL and passes
    *        through; transcodes stay behind the codec boundary.
    * @param videoStorePath with `videoCol`: the durable cross-run
    *        payload-fingerprint key store (IncrementalKeyedDedup —
    *        stored doc wins cross-run) instead of the one-shot form.
    */
  def run(spark: SparkSession, docs: DataFrame, outPath: String,
      idCol: String = "doc_id", textCol: String = "text", langCol: String = "lang",
      minQuality: Double = 0.2, threshold: Double = 0.9,
      window: Int = 200, stride: Int = 150,
      boilerplateMinDocs: Option[Int] = None,
      mediaCols: Option[(String, String, String)] = None,
      imageMaxHamming: Int = 6,
      imageStorePath: Option[String] = None,
      // opt-in: fold EXIF orientation into the image-stage signature
      // (IncrementalImageDedup.Params.normalizeOrientation) so a
      // rotated re-save carrying its rotation in metadata dedups
      // against its stored upright source at batch cadence
      imageNormalizeOrientation: Boolean = false,
      audioCol: Option[String] = None,
      audioStorePath: Option[String] = None,
      videoCol: Option[String] = None,
      videoStorePath: Option[String] = None): Report = {
    require(minQuality >= 0 && minQuality <= 1, s"minQuality in [0,1], got $minQuality")
    val input = docs.count()

    // 1+2: quality gate + PII redaction — pure Column exprs, one scan.
    val gated = docs
      .filter(TextAnalysis.qualityScore(col(textCol)) >= minQuality)
      .withColumn(textCol, TextAnalysis.redactPii(col(textCol)))

    // 2b (optional): boilerplate strip — corpus never shuffled (the
    // small boilerplate set broadcasts as one collect_set row; see
    // LineDedup). Fully-boilerplate docs drop via the inner join. The
    // gated frame feeds THREE plan branches here (join left side, the
    // strip's corpus scan, its boilerplate-set aggregation), so it is
    // checkpointed first — without it the quality filter and regex
    // redaction would run three times over the corpus.
    val stripped = boilerplateMinDocs match {
      case None    => gated
      case Some(m) =>
        val g = gated.localCheckpoint(false)
        g.drop(textCol).join(
          LineDedup.stripBoilerplate(g, idCol, textCol, m), Seq(idCol))
    }
    val afterBoilerplate =
      if (boilerplateMinDocs.isEmpty) -1L else stripped.count()

    // 3: exact dedup — keep the min-id doc per content hash (one
    // map-combinable shuffle; semi-join back to rows keeps all columns).
    val exactDeduped = Dedup.exactSurvivors(stripped, idCol, Seq(textCol))
      // checkpoint: consumed by dedupCorpus (shingle pipeline) AND the
      // final semi-join — without it the quality+redact+dedup prefix
      // runs twice. Lazy: released on plan GC (see Dedup notes).
      .localCheckpoint(false)
    val afterExact = exactDeduped.count()

    // 4: near-dup dedup — banded MinHash-LSH candidates, components,
    // keep only canonical docs.
    val labels = Dedup.dedupCorpus(exactDeduped, idCol, textCol, threshold)
    val canonical = labels.filter(col("id") === col("canonical_id"))
      .select(col("id").as(idCol))
    val nearDeduped = exactDeduped.join(canonical, Seq(idCol), "left_semi")

    // 4b (optional): perceptual image dedup — the multimodal blind spot
    // of every text stage above (a rewritten article carrying the same
    // or a re-encoded picture). One-shot: dHash near-dup pairs ->
    // connected components -> keep the min-id canonical (the text
    // dedup's canonical rule). With a store path: the incremental form
    // (stored doc wins cross-run, keep-first in-batch) and the
    // survivors register for the NEXT run. Null-media rows bypass the
    // stage entirely; degenerate geometry hashes NULL inside and never
    // pairs (so neither can ever be dropped as an image dup).
    val mediaDeduped = mediaCols match {
      case None => nearDeduped
      case Some((mCol, wCol, hCol)) =>
        // feeds the hash scan AND the survivor join — checkpoint so the
        // quality/redact/dedup prefix doesn't run twice more
        val base = nearDeduped.localCheckpoint(false)
        val media = base.filter(col(mCol).isNotNull)
          .select(col(idCol).as("doc_id"), col(mCol).as("media"),
            col(wCol).cast("int").as("width"), col(hCol).cast("int").as("height"))
        imageStorePath match {
          case Some(isp) =>
            val pairs = IncrementalImageDedup.ingest(spark, media, isp,
              IncrementalImageDedup.Params(maxHamming = imageMaxHamming,
                normalizeOrientation = imageNormalizeOrientation))
            TrainingSet.dropPairLosers(base, pairs, idCol)
          case None =>
            val keep = Dedup.componentsFromPairs(media.select("doc_id"),
              "doc_id", Multimodal.imageNearDups(media,
                maxHamming = imageMaxHamming).select("id_a", "id_b"))
              .filter(col("id") === col("canonical_id"))
              .select(col("id").as(idCol))
            base.filter(col(mCol).isNull)
              .unionByName(base.join(keep, Seq(idCol), "left_semi"))
        }
    }
    val afterImageDedup =
      if (mediaCols.isEmpty) -1L else mediaDeduped.count()

    // 4c (optional): acoustic dedup — same composition as the image
    // stage with landmark fingerprints in place of dHash.
    val audioDeduped = audioCol match {
      case None => mediaDeduped
      case Some(aCol) =>
        val base = mediaDeduped.localCheckpoint(false)
        val audio = base.filter(col(aCol).isNotNull)
          .select(col(idCol).as("doc_id"), col(aCol).as("media"))
        audioStorePath match {
          case Some(asp) =>
            TrainingSet.dropPairLosers(base,
              AudioFingerprint.ingest(spark, audio, asp), idCol)
          case None =>
            val keep = Dedup.componentsFromPairs(audio.select("doc_id"),
              "doc_id", AudioFingerprint.audioNearDups(spark, audio)
                .select("id_a", "id_b"))
              .filter(col("id") === col("canonical_id"))
              .select(col("id").as(idCol))
            base.filter(col(aCol).isNull)
              .unionByName(base.join(keep, Seq(idCol), "left_semi"))
        }
    }
    val afterAudioDedup =
      if (audioCol.isEmpty) -1L else audioDeduped.count()

    // 4d (optional): video dedup — exact payload-fingerprint identity,
    // so the one-shot form needs no Hamming machinery: fingerprint
    // pairs -> components -> keep-min canonical; the store form rides
    // IncrementalKeyedDedup's survivor semantics directly (stored doc
    // wins cross-run, keep-first in-batch, NULL keys pass through).
    val videoDeduped = videoCol match {
      case None => audioDeduped
      case Some(vCol) =>
        val base = audioDeduped.localCheckpoint(false)
        videoStorePath match {
          case Some(vsp) =>
            val fpU = udf((b: Array[Byte]) =>
              Multimodal.ContainerCodec.videoPayloadFp(b))
            graft.ext.IncrementalKeyedDedup.ingest(spark, base, idCol,
              fpU(col(vCol)), vsp)
          case None =>
            val video = base.filter(col(vCol).isNotNull)
              .select(col(idCol).as("doc_id"), col(vCol).as("media"))
            val keep = Dedup.componentsFromPairs(video.select("doc_id"),
              "doc_id", Multimodal.videoRemuxDups(video)
                .select("id_a", "id_b"))
              .filter(col("id") === col("canonical_id"))
              .select(col("id").as(idCol))
            base.filter(col(vCol).isNull)
              .unionByName(base.join(keep, Seq(idCol), "left_semi"))
        }
    }
    val afterVideoDedup =
      if (videoCol.isEmpty) -1L else videoDeduped.count()

    // 5: chunk + write, metrics riding the write action. The partition
    // column rides THROUGH the chunker (keepCols) — a join back to the
    // doc->lang map would be O(surviving docs), broadcastable nowhere
    // near 100 TB.
    val chunks = Chunker.chunkByTokens(
      videoDeduped.select(col(idCol), col(textCol), col(langCol)),
      idCol, textCol, window, stride, keepCols = Seq(langCol))
    val (observed, obs) = Quality.observed(chunks, requiredCols = Seq("chunk"))
    TableIO.write(observed, TableIO.Parquet, outPath,
      partitionCols = Seq(langCol))
    val nChunks = obs.get("n_rows").asInstanceOf[Long]

    Report(input, gated.count(), afterExact,
      nearDeduped.count(), nChunks, afterBoilerplate = afterBoilerplate,
      afterImageDedup = afterImageDedup, afterAudioDedup = afterAudioDedup,
      afterVideoDedup = afterVideoDedup)
  }
}
