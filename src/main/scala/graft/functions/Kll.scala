package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** Mergeable KLL quantile sketches (DataSketches, same library Spark's
  * own `hll_sketch_agg` rides on) — the quantile analog of the HLL
  * distinct rollup: exact percentiles are holistic (they do not fold
  * across delta batches), a stored KLL sketch folds by merge with a
  * published normalized-rank error (~1.65% at the default k=200), which
  * is what makes "median per group, maintained in O(delta)" possible at
  * 100 TB.
  *
  * Execution shape: the aggregators are typed `Aggregator`s wrapped with
  * `functions.udaf`, which plans as a TypedImperativeAggregate — per-row
  * updates hit a live on-heap sketch; serialization happens only at
  * partial-aggregate (shuffle) boundaries, so the hot path never
  * deserializes per row. The read-time estimate is a scalar UDF, which
  * is fine because it runs over O(groups) sketch rows, never over data.
  */
object Kll {

  val DefaultK = 200

  /** Live-sketch buffer. Java-serialization hooks delegate to the
    * sketch's own compact byte form, so the buffer round-trips shuffle
    * boundaries without reflection over sketch internals.
    */
  final class Buf(@transient var sk: KllDoublesSketch) extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      val b = sk.toByteArray
      out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b)
      sk = KllDoublesSketch.heapify(Memory.wrap(b))
    }
  }

  private final class SketchAgg(k: Int)
      extends Aggregator[java.lang.Double, Buf, Array[Byte]] {
    def zero: Buf = new Buf(KllDoublesSketch.newHeapInstance(k))
    def reduce(b: Buf, x: java.lang.Double): Buf = {
      if (x != null) b.sk.update(x.doubleValue()); b
    }
    def merge(a: Buf, b: Buf): Buf = { a.sk.merge(b.sk); a }
    def finish(b: Buf): Array[Byte] = b.sk.toByteArray
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class MergeAgg(k: Int)
      extends Aggregator[Array[Byte], Buf, Array[Byte]] {
    def zero: Buf = new Buf(KllDoublesSketch.newHeapInstance(k))
    def reduce(b: Buf, bytes: Array[Byte]): Buf = {
      if (bytes != null) b.sk.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
      b
    }
    def merge(a: Buf, b: Buf): Buf = { a.sk.merge(b.sk); a }
    def finish(b: Buf): Array[Byte] = b.sk.toByteArray
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a double measure into a KLL sketch (binary). Nulls are
    * skipped, matching SQL aggregate semantics.
    */
  def sketchAgg(c: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.functions.udaf(new SketchAgg(k), Encoders.DOUBLE)
      .apply(c.cast("double"))

  /** Merge stored KLL sketches (the fold side of an incremental rollup). */
  def mergeAgg(c: Column, k: Int = DefaultK): Column =
    org.apache.spark.sql.functions.udaf(new MergeAgg(k), Encoders.BINARY)
      .apply(c)

  /** Estimate the q-quantile from a stored sketch (inclusive rank
    * semantics, matching SQL `quantile_disc`: the returned value is one
    * actually present in the data). Runs over sketch rows — O(groups).
    */
  def quantile(sketch: Column, q: Double): Column =
    udf((b: Array[Byte]) =>
      if (b == null) None
      else {
        val sk = KllDoublesSketch.heapify(Memory.wrap(b))
        if (sk.isEmpty) None else Some(sk.getQuantile(q))
      }).apply(sketch)

  /** Number of items the sketch has seen (exact). */
  def count(sketch: Column): Column =
    udf((b: Array[Byte]) =>
      if (b == null) 0L else KllDoublesSketch.heapify(Memory.wrap(b)).getN)
      .apply(sketch)

  /** Expose the sketch family on the SQL string surface:
    * `graft_kll_agg(double)`, `graft_kll_merge(binary)`,
    * `graft_kll_quantile(binary, double)`. Session-scoped registration
    * (udaf-backed aggregates cannot ride SparkSessionExtensions'
    * expression injection).
    */
  def register(spark: org.apache.spark.sql.SparkSession, k: Int = DefaultK): Unit = {
    spark.udf.register("graft_kll_agg",
      org.apache.spark.sql.functions.udaf(new SketchAgg(k), Encoders.DOUBLE))
    spark.udf.register("graft_kll_merge",
      org.apache.spark.sql.functions.udaf(new MergeAgg(k), Encoders.BINARY))
    spark.udf.register("graft_kll_quantile",
      (b: Array[Byte], q: Double) =>
        if (b == null) None
        else {
          val sk = KllDoublesSketch.heapify(Memory.wrap(b))
          if (sk.isEmpty) None else Some(sk.getQuantile(q))
        })
  }
}
