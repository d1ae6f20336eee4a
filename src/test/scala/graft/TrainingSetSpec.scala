package graft

import org.apache.spark.sql.functions._
import graft.pipelines.TrainingSet
import graft.sinks.TxTable

/** The round-4 composition: gates → decontamination → exact dedup →
  * incremental near-dup vs the durable store → sequence packing →
  * transactional commit. Planted documents prove each stage drops
  * exactly its target, across TWO batches, with replay protection.
  */
class TrainingSetSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark = Seq(
    (9000L, "the secret benchmark passage about quantum turtles and gradient descent algorithms")
  ).toDF("doc_id", "text")

  private def good(id: Long, seed: String) =
    (id, s"a perfectly reasonable $seed document with the usual amount of " +
      s"varied natural text for the engine to keep and it is long enough " +
      s"to pass the quality gates of the pipeline in round four $seed")

  test("two-batch build: every planted junk class dropped, packs committed atomically") {
    val work = tmpDir("trainset")
    val store = s"$work/store"
    val target = s"$work/train"

    val b1 = Seq(
      good(1L, "alpha"),
      good(2L, "beta"),
      // boilerplate: one token owns the doc -> repetition gate
      (3L, ("spam " * 40).trim),
      // contaminated: embeds an 8-gram of the benchmark passage
      (4L, "leading words then the secret benchmark passage about quantum " +
        "turtles and gradient descent algorithms trailing text to make " +
        "this one long enough to pass the length and quality gates easily"),
      // exact dup inside the batch
      (5L, good(1L, "alpha")._2)
    ).toDF("doc_id", "text")

    val r1 = TrainingSet.ingest(spark, b1, benchmark, store, target, "b1")
    assert(!r1.alreadyApplied)
    assert(r1.input == 5)
    assert(r1.afterGates == 4, s"$r1")         // repetition doc out
    assert(r1.afterDecontaminate == 3, s"$r1") // contaminated doc out
    assert(r1.afterExact == 2, s"$r1")         // exact dup out
    assert(r1.afterNearDup == 2, s"$r1")       // no near-dups yet
    assert(r1.packs >= 1)

    val kept1 = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept1 == Set(1L, 2L))

    // batch 2: a near-dup of a STORED doc (larger id loses to the store
    // even though its own batch would keep it), plus a fresh doc
    val b2 = Seq(
      (11L, good(1L, "alpha")._2 + " tiny tail"),
      good(12L, "gamma")
    ).toDF("doc_id", "text")
    val r2 = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2")
    assert(r2.afterNearDup == 1, s"$r2") // 11 near-dups stored doc 1
    val kept2 = TxTable.read(spark, target).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(1L, 2L, 12L), s"$kept2")

    // replay of an applied batch is a no-op (delta ledger)
    val r2b = TrainingSet.ingest(spark, b2, benchmark, store, target, "b2")
    assert(r2b.alreadyApplied)
    assert(TxTable.read(spark, target).get.count() ==
      kept2.size, "replay changed the training table")

    // the committed assignment is complete: every kept doc has a pack
    val t = TxTable.read(spark, target).get
    assert(t.filter(col("pack_id").isNull || col("pack_offset").isNull).count() == 0)
    assert(t.select("batch_id").distinct().count() == 2)
  }
}
