package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.{Decontaminate, Dedup, IncrementalDedup, Packer, TextAnalysis}
import graft.sinks.TxTable

/** End-to-end training-SET construction over a GROWING corpus — the
  * composition the round-4 operators exist for, and the batch-cadence
  * complement of `Curation` (which curates one static corpus):
  *
  *   repetition + quality gates -> benchmark decontamination ->
  *   exact dedup -> INCREMENTAL near-dup vs the durable signature
  *   store -> token-budget sequence packing -> transactional commit
  *
  * Each `ingest` call processes one batch and folds it into a durable,
  * snapshot-isolated training table:
  *
  *  - Near-dup state lives in the IncrementalDedup store, so a batch is
  *    checked against EVERYTHING ingested before it in O(batch +
  *    collisions) — corpus growth never reprocesses the corpus.
  *  - The packed assignment is committed through TxTable with the batch
  *    id as the applied-delta id: a crashed run publishes nothing, a
  *    rerun of an already-committed batch is a no-op, and readers of
  *    the training table are never exposed to a half-ingested batch.
  *  - Packs are per-batch (pack key = (batch deltaId, pack_id)): packing
  *    is an order-dependent global fold, so cross-batch repacking would
  *    rewrite history — instead each batch packs its own survivors,
  *    the same append-only discipline as the sequence data itself.
  *
  * Drop rules: a new doc is dropped if it fails a gate, shares an
  * n-gram with the benchmark, duplicates content inside the batch
  * (exact or near), or near-duplicates an ALREADY-STORED doc (the
  * stored doc wins — first-ingested-wins, deterministic).
  */
object TrainingSet {

  final case class Report(
      input: Long, afterGates: Long, afterDecontaminate: Long,
      afterExact: Long, afterNearDup: Long, packs: Long,
      alreadyApplied: Boolean)

  /** @param deltaId   stable batch identifier (replay protection)
    * @param benchmark eval set to decontaminate against (tiny side)
    * @param budget    tokens per training sequence
    */
  def ingest(
      spark: SparkSession,
      batch: DataFrame,
      benchmark: DataFrame,
      storePath: String,
      targetPath: String,
      deltaId: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      budget: Long = 2048,
      minQuality: Double = 0.2,
      maxTopTokenFrac: Double = 0.4,
      maxDupNgramFrac: Double = 0.5,
      decontaminateN: Int = 8,
      nearDupThreshold: Double = 0.9): Report = {
    if (TxTable.appliedDeltaIds(spark, targetPath).contains(deltaId))
      return Report(0, 0, 0, 0, 0, 0, alreadyApplied = true)
    val input = batch.count()

    // 1: scan-speed gates (quality + repetition) — shrink the corpus
    // before anything that shuffles
    val gated = batch.filter(
      TextAnalysis.qualityScore(col(textCol)) >= minQuality &&
        TextAnalysis.topTokenFraction(col(textCol)) <= maxTopTokenFrac &&
        TextAnalysis.duplicateNgramFraction(col(textCol), 2) <= maxDupNgramFrac)
    val afterGates = gated.count()

    // 2: benchmark decontamination — bench gram set broadcasts, the
    // batch is never shuffled to find contamination
    val clean = Decontaminate.removeContaminated(
      gated, benchmark, idCol, textCol, n = decontaminateN)
    val afterDecontaminate = clean.count()

    // 3: exact dedup inside the batch (cross-batch exact dups are also
    // near-dups at jaccard 1.0 — the store stage catches them)
    val exact = Dedup.exactSurvivors(clean, idCol, Seq(textCol))
      .localCheckpoint(false) // consumed by store ingest AND final join
    val afterExact = exact.count()

    // 4: incremental near-dup vs the durable store. Drop rules:
    //  - CROSS pair (one side already stored): the batch side loses,
    //    whatever the id order — first-ingested-wins.
    //  - IN-BATCH pair: the larger id loses (keep-first by id; chains
    //    collapse to their minimum like dedupCorpus's canonical doc).
    val pairs = IncrementalDedup.ingest(spark, exact, idCol, textCol,
      storePath, IncrementalDedup.Params(threshold = nearDupThreshold))
      .localCheckpoint(false) // consumed by three classification joins
    val idsA = exact.select(col(idCol).as("id_a"))
    val idsB = exact.select(col(idCol).as("id_b"))
    val aInBatch = pairs.join(idsA, Seq("id_a"), "left_semi")
    val dropIds =
      // id_a in batch, id_b stored -> drop id_a
      aInBatch.join(idsB, Seq("id_b"), "left_anti")
        .select(col("id_a").as(idCol))
      // id_b in batch, id_a stored -> drop id_b
      .unionByName(pairs.join(idsA, Seq("id_a"), "left_anti")
        .join(idsB, Seq("id_b"), "left_semi")
        .select(col("id_b").as(idCol)))
      // both in batch -> drop the larger id
      .unionByName(aInBatch.join(idsB, Seq("id_b"), "left_semi")
        .select(col("id_b").as(idCol)))
      .distinct()
    val survivors = exact.join(dropIds, Seq(idCol), "left_anti")
      .localCheckpoint(false)
    val afterNearDup = survivors.count()

    // 5: pack the survivors into token-budget sequences (per-batch packs;
    // see the header for why packs never span batches)
    val packed = survivors.join(
      Packer.packBudget(survivors, idCol,
          TextAnalysis.tokenCount(col(textCol)), budget)
        .withColumnRenamed("id", idCol),
      Seq(idCol))
      .withColumn("batch_id", lit(deltaId))
    val packs = packed.select("pack_id").distinct().count()

    // 6: atomic append into the training table, replay-protected
    if (afterNearDup > 0)
      TxTable.commit(spark, packed, targetPath, partitionBy = Seq("batch_id"),
        deltaId = Some(deltaId), append = true)
    Report(input, afterGates, afterDecontaminate, afterExact, afterNearDup,
      packs, alreadyApplied = false)
  }
}
