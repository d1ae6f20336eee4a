package graft.functions

import java.io.{ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches, Union}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable THETA sketches (DataSketches) — distinct-counting WITH set
  * algebra: unlike HLL (union-only), theta sketches support
  * intersection and difference, which is what cross-corpus overlap
  * needs ("how many distinct documents/grams do corpora A and B
  * share?") without ever joining A against B. Each corpus folds to one
  * O(k) sketch; |A∩B|, |A∪B|, Jaccard are driver math on two sketches.
  *
  * Exactness regime: a theta sketch below its nominal-entries capacity
  * k retains EVERY distinct hash — estimates (including intersections)
  * are exact, which is what lets `ext_corpus_overlap` carry a DuckDB
  * oracle at test scale while the same code degrades gracefully to
  * ±1.6% (k=4096) estimation at 100 TB. The retained set is the k
  * smallest hashes — a pure function of the input SET, so results are
  * partitioning- and order-invariant in both regimes (KMV sketches are
  * mergeable with deterministic results; asserted in ThetaSpec).
  *
  * Execution shape mirrors `Kll`/`FreqItems`: typed Aggregators wrapped
  * with `functions.udaf` plan as TypedImperativeAggregate — per-row
  * updates hit a live on-heap Union; serialization happens only at
  * partial-aggregate (shuffle) boundaries.
  */
object Theta {

  val DefaultNominal = 4096

  private def newUnion(nominal: Int): Union =
    SetOperation.builder().setNominalEntries(nominal).buildUnion()

  /** Live-union buffer; Java-serialization hooks delegate to the compact
    * sketch byte form (the union gadget itself is not serialized).
    */
  final class Buf(@transient var u: Union, var nominal: Int)
      extends Serializable {
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeInt(nominal)
      val b = u.getResult.toByteArray
      out.writeInt(b.length); out.write(b)
    }
    private def readObject(in: ObjectInputStream): Unit = {
      nominal = in.readInt()
      val n = in.readInt()
      val b = new Array[Byte](n); in.readFully(b)
      u = newUnion(nominal)
      u.union(Sketches.heapifySketch(Memory.wrap(b)))
    }
  }

  private final class SketchAgg(nominal: Int)
      extends Aggregator[String, Buf, Array[Byte]] {
    def zero: Buf = new Buf(newUnion(nominal), nominal)
    def reduce(b: Buf, x: String): Buf = {
      if (x != null) b.u.update(x); b
    }
    def merge(a: Buf, b: Buf): Buf = { a.u.union(b.u.getResult); a }
    def finish(b: Buf): Array[Byte] = b.u.getResult.toByteArray
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  private final class MergeAgg(nominal: Int)
      extends Aggregator[Array[Byte], Buf, Array[Byte]] {
    def zero: Buf = new Buf(newUnion(nominal), nominal)
    def reduce(b: Buf, bytes: Array[Byte]): Buf = {
      if (bytes != null) b.u.union(Sketches.heapifySketch(Memory.wrap(bytes)))
      b
    }
    def merge(a: Buf, b: Buf): Buf = { a.u.union(b.u.getResult); a }
    def finish(b: Buf): Array[Byte] = b.u.getResult.toByteArray
    def bufferEncoder: Encoder[Buf] = Encoders.javaSerialization[Buf]
    def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Aggregate a string key column into a theta sketch (binary). */
  def sketchAgg(c: Column, nominal: Int = DefaultNominal): Column =
    org.apache.spark.sql.functions.udaf(new SketchAgg(nominal), Encoders.STRING)
      .apply(c.cast("string"))

  /** Merge stored theta sketches (the fold side of incremental rollups). */
  def mergeAgg(c: Column, nominal: Int = DefaultNominal): Column =
    org.apache.spark.sql.functions.udaf(new MergeAgg(nominal), Encoders.BINARY)
      .apply(c)

  // ---- driver-side set algebra over stored sketches -----------------

  def deserialize(bytes: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double =
    if (bytes == null) 0d else deserialize(bytes).getEstimate

  def intersectionEstimate(a: Array[Byte], b: Array[Byte],
      nominal: Int = DefaultNominal): Double = {
    val i = SetOperation.builder().setNominalEntries(nominal).buildIntersection()
    i.intersect(deserialize(a)); i.intersect(deserialize(b))
    i.getResult.getEstimate
  }

  def unionEstimate(a: Array[Byte], b: Array[Byte],
      nominal: Int = DefaultNominal): Double = {
    val u = newUnion(nominal)
    u.union(deserialize(a)); u.union(deserialize(b))
    u.getResult.getEstimate
  }
}
