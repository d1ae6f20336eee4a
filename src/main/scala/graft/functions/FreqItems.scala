package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Mergeable frequent-items sketches (DataSketches ItemsSketch<String>)
  * — the top-k analog of the HLL/KLL rollup measures: "most frequent
  * values per group" is holistic, a stored sketch folds across delta
  * batches with the published Misra-Gries error (count over-estimated
  * by at most the sketch's maxError; EXACT whenever the group's
  * distinct-value count stays under ~maxMapSize·0.75, the regime the
  * oracled query pins). Completes the mergeable measure family:
  * count/sum (distributive), HLL distinct, KLL quantile, FI top-k.
  *
  * Same execution shape as `Kll`: typed Aggregators via udaf → live
  * on-heap sketch per partial, serialization only at shuffle
  * boundaries; read-time estimates over O(groups) sketch rows.
  */
object FreqItems {

  /** Default sketch capacity (power of 2). Exact below ~48 distinct
    * values; ~1.5 KB serialized empty.
    */
  val DefaultMapSize = 64

  private val serde = new ArrayOfStringsSerDe

  final class Buf(@transient var sk: ItemsSketch[String]) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray(serde)
      out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b)
      sk = ItemsSketch.getInstance(Memory.wrap(b), serde)
    }
  }

  private final class SketchAgg(mapSize: Int)
      extends Aggregator[String, Buf, Array[Byte]] {
    def zero: Buf = new Buf(new ItemsSketch[String](mapSize))
    def reduce(b: Buf, x: String): Buf = { if (x != null) b.sk.update(x); b }
    def merge(a: Buf, b: Buf): Buf = { a.sk.merge(b.sk); a }
    def finish(b: Buf): Array[Byte] = b.sk.toByteArray(serde)
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class MergeAgg(mapSize: Int)
      extends Aggregator[Array[Byte], Buf, Array[Byte]] {
    def zero: Buf = new Buf(new ItemsSketch[String](mapSize))
    def reduce(b: Buf, bytes: Array[Byte]): Buf = {
      if (bytes != null)
        b.sk.merge(ItemsSketch.getInstance(Memory.wrap(bytes), serde))
      b
    }
    def merge(a: Buf, b: Buf): Buf = { a.sk.merge(b.sk); a }
    def finish(b: Buf): Array[Byte] = b.sk.toByteArray(serde)
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a string measure into a frequent-items sketch (binary).
    * Nulls skipped.
    */
  def sketchAgg(c: Column, mapSize: Int = DefaultMapSize): Column =
    org.apache.spark.sql.functions.udaf(new SketchAgg(mapSize), Encoders.STRING)
      .apply(c.cast("string"))

  /** Merge stored sketches (the fold side of an incremental rollup). */
  def mergeAgg(c: Column, mapSize: Int = DefaultMapSize): Column =
    org.apache.spark.sql.functions.udaf(new MergeAgg(mapSize), Encoders.BINARY)
      .apply(c)

  /** Top-k items by estimated count, ordered (count desc, item asc) for
    * determinism. NO_FALSE_POSITIVES: every returned item's true count
    * exceeds the error bound — in the exact regime this is exactly the
    * group's top-k. Array of (item, estimate) structs; O(groups) rows.
    */
  def topK(sketch: Column, k: Int): Column =
    udf((b: Array[Byte]) =>
      if (b == null) None
      else {
        val sk = ItemsSketch.getInstance(Memory.wrap(b), serde)
        Some(sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
          .map(r => (r.getItem, r.getEstimate))
          .sortBy { case (item, est) => (-est, item) }
          .take(k).toSeq)
      }).apply(sketch)

  /** Worst-case count over-estimation of the sketch (0 = exact regime). */
  def maxError(sketch: Column): Column =
    udf((b: Array[Byte]) =>
      if (b == null) 0L
      else ItemsSketch.getInstance(Memory.wrap(b), serde).getMaximumError)
      .apply(sketch)

  /** SQL string surface: `graft_fi_agg(string)`,
    * `graft_fi_merge(binary)`, `graft_fi_topk(binary, int)` (array of
    * (item, estimate) structs). Session-scoped, like `Kll.register`.
    */
  def register(
      spark: org.apache.spark.sql.SparkSession,
      mapSize: Int = DefaultMapSize): Unit = {
    spark.udf.register("graft_fi_agg",
      org.apache.spark.sql.functions.udaf(new SketchAgg(mapSize), Encoders.STRING))
    spark.udf.register("graft_fi_merge",
      org.apache.spark.sql.functions.udaf(new MergeAgg(mapSize), Encoders.BINARY))
    spark.udf.register("graft_fi_topk",
      (b: Array[Byte], k: Int) =>
        if (b == null) None
        else {
          val sk = ItemsSketch.getInstance(Memory.wrap(b), serde)
          Some(sk.getFrequentItems(ErrorType.NO_FALSE_POSITIVES)
            .map(r => (r.getItem, r.getEstimate))
            .sortBy { case (item, est) => (-est, item) }
            .take(k).toSeq)
        })
  }
}
