package graft.sinks

import org.apache.spark.sql.DataFrame

/** Output-file sizing for the durable-store/table write paths (opt
  * guide §6): a parquet write emits one file per partition of the
  * WRITING frame, and the incremental stores' batch frames carry their
  * compute parallelism (core-count repartitions, map-side pipelines) —
  * a KB-scale registration batch then commits ~cores tiny files per
  * table per ingest, paying one commit round per file locally and
  * creating the small-files problem (per-file open cost on every later
  * store probe scan, listing pressure) at cluster scale.
  *
  * `sizedForWrite` decouples write layout from compute layout with a
  * REBALANCE hint: under AQE (on by default) the exchange coalesces to
  * `spark.sql.adaptive.advisoryPartitionSizeInBytes` — file count
  * derives from the batch's BYTES at any scale (one file for a KB
  * batch, advisory-sized files for a TB batch), not from the cluster's
  * core count. Without AQE the hint degrades to a plain round-robin
  * shuffle of the batch — semantics identical. The shuffle it adds is
  * batch-sized (the stores' write sides are always the small side by
  * design), never a corpus shuffle.
  */
object WriteLayout {
  def sizedForWrite(df: DataFrame): DataFrame = df.hint("rebalance")
}
