package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Persisted Hamming-space image index — the dHash instantiation
  * of the shared [[HammingIndex]] posting layout (see that file for the
  * artifact design, pruning math, and exactness argument): a one-time
  * layout pass that lets bounded-distance image search read a PRUNED
  * slice of the corpus instead of scanning it, the serving lever for
  * image corpora that outgrow the exhaustive `Multimodal.imageTopK`
  * baseline.
  *
  * Space at H=7 is 8 postings/image, ~2.5% of a 10 KB average image
  * payload, written once; a random probe reads ~3% of the postings.
  * The `ext_image_index_topk` gate holds the probe EQUAL to the
  * exhaustive top-k restricted to the bound against the brute-force
  * DuckDB oracle.
  *
  * Relationship to the family: `IncrementalImageDedup` answers "is this
  * BATCH near anything stored" at crawl cadence; this index answers
  * "what is near this PROBE" at serving cadence over a frozen corpus
  * snapshot. Rebuild = rerun `build` (stage-aside swap: a concurrent
  * probe never observes a half-written index).
  */
object ImageIndex {

  private val What = "image index"

  private def hashed(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    media.select(col("doc_id"),
      Multimodal.dHashPixels(spark)(
        col("media"), col("width"), col("height")).getField("sh").as("sh"))
      .filter(col("sh").isNotNull)
  }

  /** Hash `media` (a `Multimodal.mediaTable`-shaped frame) and persist
    * the posting layout at `path`. Degenerate rows (null hash) are not
    * indexed — they never pair anywhere in the family.
    */
  def build(media: DataFrame, path: String, maxHamming: Int = 7,
      filesPerChunk: Int = 8): Unit =
    HammingIndex.build(hashed(media), path, maxHamming, filesPerChunk,
      What, "Multimodal.imageTopK")

  /** True when a built artifact exists at `path`. */
  def exists(spark: SparkSession, path: String): Boolean =
    HammingIndex.exists(spark, path)

  /** The blocking bound the artifact was built at (from build_meta). */
  def boundOf(spark: SparkSession, path: String): Int =
    HammingIndex.boundOf(spark, path, What)

  type AppendResult = HammingIndex.AppendResult

  /** Takedown: forgotten doc_ids (a `doc_id` column) stop ranking in
    * [[topK]] IMMEDIATELY; an explicit re-ingest via [[append]]
    * readmits; [[build]] clears the tombstones with the layout. The
    * index sits under the same erasure surface as the stores.
    */
  def forget(spark: SparkSession, path: String, ids: DataFrame): Unit =
    HammingIndex.forget(spark, path, ids, What)

  /** Incrementally grow the index with a batch of new images — see
    * [[HammingIndex.append]] for the discipline (id anti-join against
    * one chunk partition, staleness vs the build-time row count,
    * rebuild advice past the threshold).
    */
  def append(media: DataFrame, path: String,
      rebuildThreshold: Double = 0.5): AppendResult =
    HammingIndex.append(hashed(media), path, rebuildThreshold, What)

  /** Bounded-distance top-k against the persisted index: for each probe
    * image, the k nearest corpus images WITHIN the index's Hamming
    * bound — equal to the exhaustive top-k restricted to the bound.
    * Probe hashes are a BOUNDED driver-side set (a serving call —
    * enforced); see [[HammingIndex.topK]] for the pruned-scan shape.
    */
  def topK(spark: SparkSession, path: String, probes: DataFrame, k: Int,
      maxProbes: Int = 4096): DataFrame = {
    val qs = probes.select(col("doc_id").as("q_id"),
      Multimodal.dHashPixels(spark)(
        col("media"), col("width"), col("height")).getField("sh").as("qsh"))
      .filter(col("qsh").isNotNull)
      .limit(maxProbes + 1)
      .collect()
    require(qs.length <= maxProbes,
      s"imageIndex: more than $maxProbes probes — this is a serving call; " +
        "batch-vs-corpus jobs belong on IncrementalImageDedup/imageNearDups")
    HammingIndex.topK(spark, path,
      qs.map(r => (r.getLong(0), r.getLong(1))), k, What)
  }
}
