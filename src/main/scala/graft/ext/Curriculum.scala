package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Curriculum staging: order the corpus by a difficulty signal
  * (token count, LM perplexity, classifier score — any per-doc column)
  * and cut it into contiguous stages, easiest first — the published
  * curriculum-learning data layout (length-based and perplexity-based
  * curricula), and the ordered complement of `Shuffle.shuffleShard`
  * (whose shards are uniform samples; curriculum stages are ordered
  * blocks, so stage 0 is genuinely the easy end).
  *
  * The global position is the same scale problem as Shuffle/Packer/Mix:
  * `row_number() OVER (ORDER BY signal)` collapses to one partition.
  * This reuses the shared distributed prefix sum
  * (`Shuffle.positionByKey`): range-repartition on (signal, id),
  * O(partitions) driver metadata, parallel local ranks + broadcast
  * exclusive prefix. Stage assignment is integer math on the position
  * (`pos·numStages div total` — exact long division, no float
  * boundary), so the result is a pure function of (corpus, signal,
  * numStages) at any partition count.
  */
object Curriculum {

  /** @return (idCol, pos, stage): pos the 0-based rank in ascending
    *         (signal, id) order; stage in [0, numStages) as contiguous
    *         equal blocks (sizes differ by at most one).
    */
  def stageBySignal(
      df: DataFrame,
      idCol: String,
      signal: Column,
      numStages: Int): DataFrame = {
    require(numStages >= 1, s"numStages must be >= 1, got $numStages")
    val (positioned, total) = Shuffle.positionByKey(df, idCol, signal)
    if (total == 0) return positioned.select(col(idCol), col("pos"),
      lit(0L).as("stage"))
    positioned.select(col(idCol), col("pos"),
      expr(s"pos * ${numStages}L div ${total}L").as("stage"))
  }
}
