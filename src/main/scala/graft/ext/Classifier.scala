package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Learned quality CLASSIFIER gate — the "classifier filter" stage
  * of published pre-training pipelines (GPT-3's LR-against-WebText
  * filter, Llama's fastText-style quality classifiers, CCNet's lid
  * gate): train on a positive reference corpus vs a negative corpus,
  * score every candidate document, keep what scores positive. The
  * supervised complement to `NgramLm` (which needs only positive
  * examples) — together they are the two learned screens beside the
  * rule-based `TextAnalysis.qualityScore` heuristics.
  *
  * Model: add-k multinomial Naive Bayes over whitespace tokens (the
  * engine-wide `TextAnalysis.tokens` tokenizer). Deterministic and
  * closed-form — no SGD, no seed, every engine computes the identical
  * model from the same corpora, which is what makes the scores
  * DuckDB-oracle-able (`ext_classifier_quality`):
  *
  *   logOdds(doc) = ln(P(pos)/P(neg))
  *               + Σ_w [ ln p(w|pos) − ln p(w|neg) ]
  *   p(w|c) = (count_c(w) + k) / (N_c + k·V)
  *
  * with N_c the class token total, V the union vocabulary size, and
  * words unseen in BOTH classes contributing the constant default
  * log-odds ln((N_neg + kV)/(N_pos + kV)) through the same formula.
  *
  * Scale shape (the 100 TB lens):
  *
  *  - TRAINING is ONE map-combinable aggregate over the tagged union of
  *    both corpora (token explode → per-word class counts) — the two
  *    reference corpora are read once each, and partial aggregation
  *    collapses the shuffle to distinct-word rows. The log-odds column
  *    is driver-free arithmetic on that table; scalars (class totals,
  *    V, doc priors) are O(1) aggregates of the checkpointed model
  *    table, never corpus re-scans.
  *  - The model table is `localCheckpoint`ed: built once, read per
  *    scored batch (the `Mix.sampleToDistribution` materialization
  *    lesson).
  *  - SCORING is token explode → left join on the word key (AQE
  *    broadcasts bounded models; a giant model degrades to a shuffle
  *    join, never a driver collect) → one map-combinable per-doc sum.
  *    Unseen words coalesce to the default log-odds constant — no
  *    per-token membership expressions anywhere.
  */
object Classifier {

  /** Trained model: `logOdds` is (w, lo) — per-word ln-odds including
    * smoothing; `prior` the class prior ln-odds; `defaultLo` the
    * unseen-word constant.
    */
  final case class Model(
      logOdds: DataFrame,
      prior: Double,
      defaultLo: Double,
      k: Double)

  /** Train on a positive vs a negative reference corpus. */
  def train(
      pos: DataFrame,
      neg: DataFrame,
      textCol: String,
      k: Double = 0.5): Model = {
    require(k > 0, s"add-k smoothing needs k > 0, got $k")
    val toks = TextAnalysis.tokens(col(textCol))

    // one tagged-union aggregate: per-word counts in both classes. The
    // doc totals ride along as one count per class (tag rows), so the
    // prior needs no second pass over either corpus.
    val tagged = pos.select(explode(toks).as("w"), lit(1L).as("p"), lit(0L).as("n"))
      .unionAll(neg.select(explode(toks).as("w"), lit(0L).as("p"), lit(1L).as("n")))
    val counts = tagged.groupBy("w")
      .agg(sum("p").as("cp"), sum("n").as("cn"))
      .localCheckpoint() // read for scalars + per scored batch

    val Seq(np, nn, v) = counts
      .agg(sum("cp"), sum("cn"), count(lit(1)))
      .head().toSeq.map(x => (x: Any) match {
        case l: Long => l.toDouble
        case d: Double => d
      })
    val posDocs = pos.count().toDouble
    val negDocs = neg.count().toDouble
    require(posDocs > 0 && negDocs > 0,
      "Classifier.train needs non-empty positive AND negative corpora")

    val lo = log((col("cp") + k) / lit(np + k * v)) -
      log((col("cn") + k) / lit(nn + k * v))
    Model(
      counts.select(col("w"), lo.as("lo")).localCheckpoint(),
      prior = math.log(posDocs / negDocs),
      defaultLo = math.log((nn + k * v) / (np + k * v)),
      k = k)
  }

  /** Persist a trained model: the per-word table under `path/log_odds`
    * and the three scalars as a one-row sidecar under `path/meta`,
    * written LAST — its presence marks a complete save, so a crashed
    * save is invisible to `load` (same publish-order discipline as the
    * TxTable manifest rename). The model is O(vocabulary) — tiny next
    * to any corpus — and a loaded model scores batches across sessions
    * without retraining, the durability `NgramLm`'s count store already
    * has (its counts are additive; log-odds are not, hence save/load of
    * the finished model rather than an incremental store).
    */
  def save(model: Model, path: String): Unit = {
    val spark = model.logOdds.sparkSession
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a re-save must not leave a stale meta visible beside a half-written
    // word table: drop the completion marker first, then overwrite
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/meta"), true)
    model.logOdds.write.mode("overwrite").parquet(s"$path/log_odds")
    import spark.implicits._
    Seq((model.prior, model.defaultLo, model.k))
      .toDF("prior", "default_lo", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Load a model saved by `save`; scores are bit-identical to the
    * in-session model (spec-asserted). Fails fast on a missing or
    * incomplete (no meta) save.
    */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    val metaPath = new org.apache.hadoop.fs.Path(s"$path/meta")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(metaPath),
      s"Classifier.load: no complete model at $path (meta sidecar missing)")
    val meta = spark.read.parquet(s"$path/meta").head()
    Model(
      spark.read.parquet(s"$path/log_odds").localCheckpoint(),
      prior = meta.getAs[Double]("prior"),
      defaultLo = meta.getAs[Double]("default_lo"),
      k = meta.getAs[Double]("k"))
  }

  /** Score `docs`: (id, n_tokens, log_odds) — positive means "looks
    * like the positive reference". Rounded to 6 decimals (float-sum
    * accumulation order is engine-defined; repo-wide convention).
    */
  def score(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame =
    docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .join(model.logOdds, Seq("w"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(coalesce(col("lo"), lit(model.defaultLo))).as("__s"))
      .select(col(idCol), col("n_tokens"),
        round(col("__s") + model.prior, 6).as("log_odds"))

  /** The gate: keep docs with log-odds at or above `minLogOdds`
    * (0 = "more likely positive than negative").
    */
  def filterBy(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: Model,
      minLogOdds: Double = 0.0): DataFrame = {
    val keep = score(docs, idCol, textCol, model)
      .filter(col("log_odds") >= minLogOdds)
      .select(idCol)
    docs.join(keep, Seq(idCol), "left_semi")
  }
}
