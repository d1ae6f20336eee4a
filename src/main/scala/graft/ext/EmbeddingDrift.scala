package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Embedding-space drift between two batches (reference corpus vs
  * new ingest, or two model versions): per-dimension centroid
  * comparison, summarized as centroid cosine / L2 shift. The embedding
  * analog of `ops.Drift`'s PSI — a new encoder checkpoint or a
  * distribution shift in the source moves the centroid long before
  * nearest-neighbor quality visibly degrades.
  *
  * Scale shape: one tagged union scan, posexplode to (dim, value), one
  * map-combinable shuffle into O(dims) groups. On a 100 TB embedding
  * store run it over the deterministic hash sample (ext_sample_*) —
  * centroid estimates converge at modest sample sizes; the operator
  * itself stays exact over whatever input it is given.
  */
object EmbeddingDrift {

  /** Per-dimension centroids of both sides: (pos, mean_ref, mean_cur),
    * 0-based dimension index, ordered. Pure Column plan — restatable in
    * SQL (the oracle uses unnest WITH ORDINALITY).
    */
  def perDimCentroids(
      ref: DataFrame, cur: DataFrame, vecCol: String): DataFrame = {
    val tagged = ref
      .select(lit("ref").as("side"), posexplode(col(vecCol).cast("array<double>")))
      .unionByName(cur
        .select(lit("cur").as("side"), posexplode(col(vecCol).cast("array<double>"))))
    tagged
      .groupBy("pos")
      .agg(avg(when(col("side") === "ref", col("col"))).as("mean_ref"),
        avg(when(col("side") === "cur", col("col"))).as("mean_cur"))
      .orderBy("pos")
  }

  /** Centroid shift summary: (cosine between centroids, L2 distance,
    * ref-norm, cur-norm). Driver math over the O(dims) centroid rows.
    */
  def centroidShift(
      ref: DataFrame, cur: DataFrame, vecCol: String): (Double, Double, Double, Double) = {
    val raw = perDimCentroids(ref, cur, vecCol).collect()
    // a null mean = that side has no value at this dimension (different
    // dimensionality, or an empty side): a cosine between spaces of
    // different shape is meaningless — fail with the diagnosis instead
    // of a bare NPE
    val badDims = raw.filter(r =>
      r.isNullAt(r.fieldIndex("mean_ref")) || r.isNullAt(r.fieldIndex("mean_cur")))
    require(badDims.isEmpty,
      s"centroidShift: ref/cur disagree on dimensionality or a side is " +
        s"empty (dims ${badDims.map(_.getInt(0)).toSeq.sorted.take(5).mkString(",")}...)")
    val rows = raw
      .map(r => (r.getDouble(r.fieldIndex("mean_ref")),
        r.getDouble(r.fieldIndex("mean_cur"))))
    val dot = rows.map { case (a, b) => a * b }.sum
    val nr = math.sqrt(rows.map { case (a, _) => a * a }.sum)
    val nc = math.sqrt(rows.map { case (_, b) => b * b }.sum)
    val l2 = math.sqrt(rows.map { case (a, b) => (a - b) * (a - b) }.sum)
    val cos = if (nr == 0 || nc == 0) 0.0 else dot / (nr * nc)
    (cos, l2, nr, nc)
  }
}
