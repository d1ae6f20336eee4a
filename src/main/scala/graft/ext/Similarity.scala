package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** [EXT] Embedding similarity search (SURVEY §2.11): brute-force cosine
  * top-k as the exact baseline, IVF (inverted-file) clustering as the
  * scale path. Embeddings are ArrayType(FloatType) columns; all math is
  * widened to double with a FIXED left-to-right summation order so results
  * are bit-reproducible (and oracle-comparable) across engines.
  *
  * Scale posture: brute-force is a map-side scan + TakeOrderedAndProject
  * (no shuffle, O(k) memory) — correct but O(N·d) per query. IVF cuts the
  * scanned fraction to nProbe/nCentroids by partitioning the corpus on
  * nearest-centroid; the assignment is computed once and would be
  * persisted as a partition column at 100 TB so probes become partition
  * pruning, not a filter.
  */
object Similarity {

  /** Widen a float embedding to double. */
  def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Cosine with automatic dispatch to the native codegen'd Expression
    * (graft.functions.CosineSimilarity) when the session has
    * GraftExtensions installed, else the declarative HOF form. Both
    * compute bit-identical doubles (asserted in ExtSpec), so the
    * dispatch never changes results — only speed (~10x on pair joins).
    */
  def cosineAuto(spark: org.apache.spark.sql.SparkSession)(a: Column, b: Column): Column =
    if (spark.catalog.functionExists("graft_cosine")) call_function("graft_cosine", a, b)
    else cosine(a, b)

  /** Exact brute-force top-k by cosine against a literal query vector.
    * Ties broken by id for determinism. Plans as scan → project →
    * TakeOrderedAndProject: no shuffle, bounded memory.
    */
  def bruteForceTopK(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int): DataFrame = {
    val q = lit(query.toArray)
    val cos = cosineAuto(embeddings.sparkSession) _
    embeddings
      .select(col(idCol),
        round(cos(asDouble(col(vecCol)), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF index: assign every vector to its nearest centroid by cosine.
    * Centroids here are the first `nCentroids` corpus vectors (a
    * deterministic, training-free choice standing in for k-means — the
    * index structure, probing, and pruning are the real subject).
    * Assignment is a broadcast nested comparison, no shuffle of the corpus.
    */
  def ivfAssign(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int): DataFrame = {
    // Norms precomputed per row/centroid — a cosine per (row, centroid)
    // pair would otherwise recompute both norms nCentroids times per row.
    val centroids = embeddings
      .orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"), asDouble(col(vecCol)).as("cvec"))
      .withColumn("cnorm", norm(col("cvec")))
    embeddings.select(col(idCol), col(vecCol))
      .withColumn("__v", asDouble(col(vecCol)))
      .withColumn("__vnorm", norm(col("__v")))
      .crossJoin(broadcast(centroids))
      .withColumn("cos", dot(col("__v"), col("cvec")) / (col("__vnorm") * col("cnorm")))
      .groupBy(col(idCol), col(vecCol))
      .agg(max_by(col("centroid_id"), col("cos")).as("centroid_id"))
  }

  /** IVF top-k: probe the `nProbe` centroids nearest the query, brute-force
    * only within their clusters. Approximate (recall < 1 when the true
    * neighbor lives in an unprobed cluster) — the spec measures recall
    * against bruteForceTopK.
    */
  def ivfTopK(
      spark: SparkSession,
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      query: Seq[Double],
      k: Int,
      nCentroids: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val assigned = ivfAssign(embeddings, idCol, vecCol, nCentroids)
    val q = lit(query.toArray)
    val probeIds = embeddings
      .orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).as("centroid_id"),
        cosine(asDouble(col(vecCol)), q).as("cos"))
      .orderBy(col("cos").desc, col("centroid_id").asc)
      .limit(nProbe)
    val cos = cosineAuto(spark) _
    assigned.join(broadcast(probeIds.select("centroid_id")), Seq("centroid_id"))
      .select(col(idCol),
        round(cos(asDouble(col(vecCol)), q), 6).as("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }

  /** All pairs above a cosine threshold — near-dup detection by embedding.
    * Brute self-join here (candidate generation at scale goes through
    * ivfAssign: only same-cluster pairs are compared, mirroring the
    * MinHash-LSH bucket trick).
    */
  def cosinePairsAbove(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double): DataFrame = {
    // Per-row norms computed once before the join — identical values to a
    // per-pair recompute (same inputs, deterministic IEEE ops), ~2x fewer
    // array traversals per pair.
    val e = embeddings.select(col(idCol).as("id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
    val score =
      if (embeddings.sparkSession.catalog.functionExists("graft_cosine"))
        call_function("graft_cosine", col("x.v"), col("y.v"))
      else dot(col("x.v"), col("y.v")) / (col("x.n") * col("y.n"))
    e.as("x").join(e.as("y"), col("x.id") < col("y.id"))
      .withColumn("score", round(score, 6))
      .filter(col("score") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("score"))
  }

  /** Same-cluster candidate pairs above a cosine threshold: the IVF-bucketed
    * scale path for near-dup pairs (compares only within clusters).
    */
  def cosinePairsAboveIvf(
      embeddings: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      nCentroids: Int = 16): DataFrame = {
    val assigned = ivfAssign(embeddings, idCol, vecCol, nCentroids)
      .select(col(idCol).as("id"), col("centroid_id"), asDouble(col(vecCol)).as("v"))
      .withColumn("n", norm(col("v")))
      .persist()
    val score =
      if (embeddings.sparkSession.catalog.functionExists("graft_cosine"))
        call_function("graft_cosine", col("x.v"), col("y.v"))
      else dot(col("x.v"), col("y.v")) / (col("x.n") * col("y.n"))
    assigned.as("x").join(assigned.as("y"),
        col("x.centroid_id") === col("y.centroid_id") && col("x.id") < col("y.id"))
      .withColumn("score", round(score, 6))
      .filter(col("score") >= threshold)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"), col("score"))
  }
}
