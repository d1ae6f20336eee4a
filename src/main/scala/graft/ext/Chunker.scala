package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Document chunking for training/embedding pipelines: split each
  * document into overlapping token windows (window size W, stride S,
  * overlap W-S) — the preprocessing step that turns a corpus into
  * model-sized pieces while preserving context across boundaries.
  *
  * Pure narrow plan: tokenize once, explode the start offsets, slice —
  * no shuffle, no UDFs; at 100 TB this is a map stage that runs at scan
  * speed and parallelizes with the input splits. Output is keyed
  * (id, chunk_id) so downstream dedup/embedding stages join back cleanly.
  */
object Chunker {

  /** Chunk start offsets run 0, S, 2S, ... while start < max(len-(W-S), 1)
    * — every token lands in at least one chunk, no chunk is fully
    * contained in its predecessor, and empty/short docs yield exactly one
    * chunk. Null-text docs yield NO chunks (they are rejected rows, not
    * empty documents — size(null) = -1 would otherwise fabricate a
    * corrupt chunk with n_tokens = -1). `keepCols` pass through to every
    * chunk row (e.g. the partition/language column) so downstream stages
    * need no join back to the doc table.
    */
  def chunkByTokens(docs: DataFrame, idCol: String, textCol: String,
      window: Int, stride: Int, keepCols: Seq[String] = Nil): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    require(stride >= 1 && stride <= window,
      s"stride must be in [1, window], got stride=$stride window=$window")
    val reserved = Set("toks", "start", "chunk_id", "chunk", "n_tokens")
    val clash = (keepCols :+ idCol).filter(reserved.contains)
    require(clash.isEmpty,
      s"column names reserved by chunkByTokens in use: ${clash.toSet}")
    val overlap = window - stride
    val kept = keepCols.map(col)
    docs.filter(col(textCol).isNotNull)
      .select((col(idCol) +: TextAnalysis.tokens(col(textCol)).as("toks") +: kept): _*)
      .withColumn("start", explode(sequence(lit(0),
        greatest(size(col("toks")) - overlap, lit(1)) - 1, lit(stride))))
      .select((col(idCol) +:
        (col("start") / stride).cast("long").as("chunk_id") +:
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ").as("chunk") +:
        least(lit(window), size(col("toks")) - col("start")).cast("int").as("n_tokens") +:
        kept): _*)
  }
}
