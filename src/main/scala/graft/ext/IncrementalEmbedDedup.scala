package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Similarity.{asDouble, dotAuto}
import graft.sinks.UpsertIgnore

/** [EXT] Incremental EMBEDDING near-duplicate detection against a
  * durable store — the embedding-side counterpart of `IncrementalDedup`
  * (which is MinHash/text): every ingested batch is checked against the
  * whole accumulated corpus in O(batch + collisions), then joins it.
  * Completes the symmetry: text near-dup has one-shot, incremental, and
  * streaming forms; embedding near-dup had only the one-shot
  * `Similarity.rpNearDups`.
  *
  * Store layout (both registered idempotently through `UpsertIgnore`):
  *
  *   store/sigs/  (doc_id, chunk, cval)  — RP-LSH signature chunks, the
  *                                         probe surface (pigeonhole
  *                                         blocking: hamming <= maxHamming
  *                                         twins share >= 1 chunk value)
  *   store/vecs/  (doc_id, v, n)         — exact-cosine verify side
  *
  * Per-ingest shape, mirroring `IncrementalDedup.ingest`:
  *  - the batch's distinct (chunk, cval) keys BROADCAST against ONE scan
  *    of the stored sigs (the store is never shuffled);
  *  - buckets whose COMBINED (batch + stored) size exceeds `maxBucket`
  *    drop as degenerate hubs — the same cap, measured over the same
  *    union, as the one-shot blocking;
  *  - candidates verify by exact cosine against stored vectors read
  *    semi-join-pruned to the colliding ids;
  *  - precision is exact (every reported pair passed the cosine), and
  *    candidate recall is the pigeonhole guarantee — so a two-ingest run
  *    reports exactly the pairs the one-shot operator reports over the
  *    union (spec-asserted).
  */
object IncrementalEmbedDedup {

  final case class Params(
      threshold: Double = 0.9,
      maxHamming: Int = 6,
      maxBucket: Int = 2000)

  private def exists(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Ingest a batch of (idCol, vecCol) rows: returns the cosine>=threshold
    * pairs the batch introduces — (id_a, id_b, score), new-vs-stored and
    * new-vs-new — then registers the batch's signatures and vectors.
    */
  def ingest(
      spark: SparkSession,
      batch: DataFrame,
      idCol: String,
      vecCol: String,
      storePath: String,
      params: Params = Params()): DataFrame = {
    require(spark.catalog.functionExists("graft_rplsh"),
      "IncrementalEmbedDedup needs GraftExtensions " +
        "(spark.sql.extensions=graft.functions.GraftExtensions)")
    val sigsPath = s"$storePath/sigs"
    val vecsPath = s"$storePath/vecs"
    val storeExists = exists(spark, sigsPath)
    val dt = dotAuto(spark) _

    val e = batch
      // normalize to array<double> WITH nullable elements: parquet reads
      // arrays back element-nullable, so a containsNull=false batch
      // (typed Dataset encoders produce those) would trip the store's
      // schema-drift guard on the second ingest
      .select(col(idCol).as("doc_id"),
        asDouble(col(vecCol)).cast("array<double>").as("v"))
      // ids are keys: a duplicated id in one batch would self-pair,
      // multiply candidate joins, and write duplicate store rows the
      // keyed registration could never clean up
      .dropDuplicates("doc_id")
      .withColumn("n", sqrt(dt(col("v"), col("v"))))
      .withColumn("sh", call_function("graft_rplsh", col("v"), lit(64)))
      .localCheckpoint(false) // chunks, verify, registration all read it
    val chunks = e
      .select(col("doc_id"),
        explode(Dedup.shChunks(col("sh"), params.maxHamming)).as("cc"))
      .select(col("doc_id"), col("cc.chunk").as("chunk"),
        col("cc.cval").as("cval"))
      .localCheckpoint(false) // probe, in-batch buckets, registration

    // the cap must apply to the COMBINED (batch + stored) bucket, or the
    // incremental run diverges from the one-shot operator at the cap
    // boundary in both directions: a union bucket over the cap would
    // expand here, and a degenerate batch hub would bypass the store-
    // side-only cap. Bucket sizes are O(keys) metadata. (A re-ingested
    // doc counts on both sides, so its buckets drop marginally earlier —
    // the idempotent-replay path, documented, never the growth path.)
    val batchCnt = chunks.groupBy("chunk", "cval").count()
      .withColumnRenamed("count", "__bc")
    def inBatchPairs(okKeys: DataFrame) = chunks
      .join(okKeys, Seq("chunk", "cval"), "left_semi")
      .groupBy("chunk", "cval")
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(Dedup.pairExpansion(col("ids"))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))

    val candidates =
      (if (!storeExists)
         inBatchPairs(batchCnt.filter(col("__bc") <= params.maxBucket)
           .select("chunk", "cval"))
       else {
         // ONE store scan, batch chunk keys broadcast — the store side
         // never shuffles (the IncrementalDedup.probeHot shape)
         val hot = spark.read.parquet(sigsPath)
           .join(broadcast(chunks.select("chunk", "cval").distinct()),
             Seq("chunk", "cval"), "left_semi")
           .localCheckpoint(false)
         val okKeys = hot.groupBy("chunk", "cval").count()
           .withColumnRenamed("count", "__sc")
           .join(batchCnt, Seq("chunk", "cval"), "full_outer")
           .filter(coalesce(col("__sc"), lit(0L)) +
             coalesce(col("__bc"), lit(0L)) <= params.maxBucket)
           .select("chunk", "cval")
           .localCheckpoint(false) // gates the cross AND in-batch sides
         val cross = chunks
           .join(hot.join(okKeys, Seq("chunk", "cval"), "left_semi")
             .withColumnRenamed("doc_id", "store_id"),
             Seq("chunk", "cval"))
           .filter(col("doc_id") =!= col("store_id"))
           .select(least(col("doc_id"), col("store_id")).as("id_a"),
             greatest(col("doc_id"), col("store_id")).as("id_b"))
         cross.unionByName(inBatchPairs(okKeys))
       })
        .distinct()
        .localCheckpoint(false) // prunes the verify side AND joins it

    // exact-cosine verify: batch vectors + stored vectors of colliding
    // ids only (semi-join prune) — precision is exact either path
    val vecs =
      if (!storeExists) e.select("doc_id", "v", "n")
      else e.select("doc_id", "v", "n").unionByName(
          spark.read.parquet(vecsPath).join(
            candidates
              .select(explode(array(col("id_a"), col("id_b"))).as("doc_id"))
              .distinct(),
            Seq("doc_id"), "left_semi"))
        // a re-ingested doc appears on both sides with an identical vector
        .groupBy("doc_id").agg(first("v").as("v"), first("n").as("n"))
    val pairs = candidates
      .join(vecs.select(col("doc_id").as("id_a"), col("v").as("va"),
        col("n").as("na")), "id_a")
      .join(vecs.select(col("doc_id").as("id_b"), col("v").as("vb"),
        col("n").as("nb")), "id_b")
      .withColumn("score",
        round(dt(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("score") >= params.threshold)
      .select("id_a", "id_b", "score")

    // materialize BEFORE mutating the store (the returned plan must not
    // re-probe a store that now contains the batch itself)
    val out = pairs.orderBy("id_a", "id_b").localCheckpoint(true)

    if (!storeExists) {
      e.select("doc_id", "v", "n").write.mode("overwrite").parquet(vecsPath)
      chunks.write.mode("overwrite").parquet(sigsPath)
    } else {
      UpsertIgnore(spark, e.select("doc_id", "v", "n"), vecsPath,
        keys = Seq("doc_id"), pruneCol = Some("doc_id"))
      UpsertIgnore(spark, chunks, sigsPath,
        keys = Seq("doc_id", "chunk"), pruneCol = Some("doc_id"))
    }
    out
  }
}
