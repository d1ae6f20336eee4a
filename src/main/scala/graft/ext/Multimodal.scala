package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Multimodal column plumbing (SURVEY §2.11): image/audio/video as
  * opaque `binary` columns plus typed metadata, with decode / feature-
  * extract / resize / frame-sample as batched per-partition operators.
  *
  * The Spark-side mechanics — schema, partition-parallel batched
  * execution, stable batch shape — are real and tested. The media DECODE
  * itself is a clearly-marked deterministic STUB (`StubCodec`): the
  * container has no image/audio libraries, and the decode body is the one
  * line a production deployment replaces (e.g. with a JNI codec), keeping
  * every scaling property intact.
  *
  * Batched `mapPartitions` is the Scala analog of Python's mapInPandas:
  * rows are processed in fixed-size batches so a vectorized/native codec
  * amortizes per-call overhead, and memory stays bounded per batch rather
  * than per partition.
  */
object Multimodal {

  final case class MediaRow(
      doc_id: Long,
      media: Array[Byte],
      format: String,
      width: Int,
      height: Int)

  final case class MediaFeatures(
      doc_id: Long,
      byte_len: Int,
      format: String,
      checksum: Long,
      feature: Array[Float])

  /** Deterministic stand-in for a real media codec. Replace `decode` with
    * a real implementation (libjpeg/ffmpeg via JNI) in production — the
    * signature (batch in, batch out) is the contract.
    */
  object StubCodec {
    /** STUB: "decodes" media bytes into a tiny feature vector derived from
      * byte statistics. Deterministic, so specs and the rows-only
      * verification are stable.
      */
    def decode(batch: Seq[MediaRow]): Seq[MediaFeatures] =
      batch.map { r =>
        var checksum = 0L
        var i = 0
        while (i < r.media.length) { checksum = checksum * 31 + (r.media(i) & 0xff); i += 1 }
        val feat = Array.tabulate(4) { j =>
          if (r.media.isEmpty) 0f
          else (r.media(j % r.media.length) & 0xff) / 255f
        }
        MediaFeatures(r.doc_id, r.media.length, r.format, checksum, feat)
      }
  }

  /** Build a media table from documents: text bytes stand in for media
    * payloads (opaque binary + typed metadata columns).
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      lit("fake/rgb8").as("format"),
      (col("n_chars") % 64 + 1).cast("int").as("width"),
      (col("n_chars") % 48 + 1).cast("int").as("height"))

  /** Batched decode/feature-extract over partitions. Partition-parallel,
    * no shuffle; batchSize bounds peak memory per task.
    */
  def extractFeatures(
      spark: SparkSession,
      media: DataFrame,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      it.grouped(batchSize).flatMap(batch => StubCodec.decode(batch.toSeq))
    }
  }

  /** Frame-sampling analog: pick every `stride`-th byte window as a
    * "frame" — the partitioning/explode mechanics of video frame
    * extraction with the codec stubbed.
    */
  def sampleFrames(media: DataFrame, stride: Int = 16, frame: Int = 8): DataFrame =
    media.select(col("doc_id"),
      posexplode(transform(
        sequence(lit(0),
          greatest(((length(col("media")) - frame) / stride).cast("int"), lit(0))),
        i => substring(col("media"), (i * stride + 1).cast("int"), lit(frame))))
        .as(Seq("frame_idx", "frame_bytes")))
}
