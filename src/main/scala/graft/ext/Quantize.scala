package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Scalar int8 quantization for embedding columns (SURVEY §2.11
  * similarity-search support): per-vector asymmetric min/max codes —
  * code = round((x - lo) / scale), scale = (hi - lo) / 255 — the standard
  * 4x memory compression for ANN serving (float32 -> uint8 + two floats).
  *
  * Pure Column expressions (array_min/max + transform HOFs): narrow,
  * per-row, no shuffle — at 100 TB this runs at scan speed as the map
  * stage of an index-build write. Degenerate all-equal vectors (scale 0)
  * quantize to code 0 with zero reconstruction error.
  */
object Quantize {

  /** PROJECTS each row to (id, v, lo, hi, scale, codes) — `v` the
    * double-cast vector, `codes` the int array in [0,255]. Other input
    * columns are dropped; join back on the id if payload is needed.
    */
  def int8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), transform(col(vecCol), x => x.cast("double")).as("v"))
      .withColumn("lo", array_min(col("v")))
      .withColumn("hi", array_max(col("v")))
      .withColumn("scale", (col("hi") - col("lo")) / lit(255.0))
      .withColumn("codes", transform(col("v"), x =>
        when(col("scale") === 0, lit(0))
          .otherwise(round((x - col("lo")) / col("scale"))).cast("int")))

  /** int8 plus `recon_mae`: mean absolute error of the dequantized form
    * (code * scale + lo) vs the original — the quality metric that decides
    * whether quantized search needs a re-rank pass over full vectors.
    * The per-element error recomputes the code inline from x (rather than
    * zipping `codes` back), keeping the expression a single transform.
    */
  def int8WithError(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    int8(df, idCol, vecCol).withColumn("recon_mae",
      round(
        aggregate(
          transform(col("v"), x =>
            when(col("scale") === 0, lit(0.0)).otherwise(
              abs(x - (round((x - col("lo")) / col("scale")) * col("scale") + col("lo"))))),
          lit(0.0), (acc, e) => acc + e) / size(col("v")), 6))
}
