package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** [EXT] Exact global top-k frequent tokens WITHOUT shuffling the token
  * stream — the two-pass heavy-hitters design every large-corpus
  * vocabulary/stopword job wants at 100 TB, where the naive
  * explode→groupBy shuffles one record per token occurrence (trillions).
  *
  *  Pass 1 — candidates: each partition folds its token stream through
  *    a bounded Misra-Gries summary (capacity c = expand·k counters).
  *    MG guarantees any token with partition frequency > n_p/c keeps a
  *    counter, so any GLOBAL heavy hitter (frequency > n/c) survives in
  *    at least one partition's summary (pigeonhole over partitions).
  *    Only the summaries — O(partitions · c) rows, not tokens — leave
  *    the executors.
  *  Pass 2 — exact recount: the candidate set broadcasts back and one
  *    filtered aggregate counts ONLY candidate tokens (map-side combine
  *    over ≤ c distinct keys — negligible shuffle).
  *
  * EXACTNESS: the result is provably the true top-k only when the
  * recount yields a FULL k rows and the k-th frequency exceeds n/c (MG
  * guarantees every token above n/c is a candidate, so nothing outside
  * the candidate set can outrank the k-th) — checked at runtime. Any
  * other outcome — a flat corpus, or MG's decrement evictions leaving
  * fewer than k candidates at all — FALLS BACK to the full exact
  * aggregation rather than returning a silently approximate (or
  * silently truncated) answer. The returned counts are always exact
  * either way (which is what makes `ext_heavy_hitters` oracle-able
  * against DuckDB).
  */
object HeavyHitters {

  /** Bounded Misra-Gries fold: returns the summary's keys (candidate
    * tokens) and the partition's token count for one token iterator.
    */
  private[graft] def misraGries(
      tokens: Iterator[String], capacity: Int): (Seq[String], Long) = {
    // value type must be the REFERENCE java.lang.Long: with scala.Long
    // the missing-key get() null silently unboxes to 0, the null checks
    // constant-fold, and the eviction branch below goes dead — the map
    // then grows with every distinct token, unbounded (caught via the
    // "comparing Long and Null" lint, round 13)
    val counts = new java.util.HashMap[String, java.lang.Long](capacity * 2)
    var n = 0L
    tokens.foreach { t =>
      n += 1
      val cur = counts.get(t)
      if (cur != null || counts.size < capacity)
        counts.put(t, if (cur == null) 1L else cur + 1L)
      else {
        // decrement-all: evict zeroed counters (the classic MG step)
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    (counts.keySet().asScala.toSeq, n)
  }

  /** Exact (token, cnt) top-k over the whitespace tokens of `textCol`,
    * ordered (cnt desc, token asc). `expand` trades candidate-summary
    * size against fallback probability.
    */
  def topTokens(
      df: DataFrame,
      textCol: String,
      k: Int,
      expand: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(expand >= 2, s"expand must be >= 2, got $expand")
    val spark = df.sparkSession
    import spark.implicits._
    val capacity = k * expand
    val toks: Dataset[String] = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .as[String]

    // pass 1: per-partition summaries + partition counts -> driver
    // (O(partitions * capacity) rows; the token total rides along so no
    // separate counting pass is needed)
    val summaries = toks
      .mapPartitions { it =>
        val (cand, n) = misraGries(it, capacity)
        (cand.map(t => (t, -1L)) :+ (("", n))).iterator
      }
      .collect()
    val candidates = summaries.collect { case (t, -1L) => t }.distinct
    val n = summaries.collect { case (_, np) if np >= 0 => np }.sum

    // pass 2: candidate-bounded exact recount. The candidate filter is a
    // broadcast LEFT-SEMI join against a candidates DataFrame, not an
    // `isin` literal chain: at cluster partition counts the literal form
    // is an O(partitions·capacity)-term expression tree (the same
    // plan-size disease Upsert.prunedExisting bounds), while the join's
    // plan is constant-size whatever the candidate count.
    def exactOver(base: DataFrame) = base
      .groupBy(col("t").as("token"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(k)
    val counted =
      if (candidates.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else exactOver(toks.join(
        broadcast(candidates.toSeq.toDF("t")), Seq("t"), "left_semi"))
        .collect()

    // exactness certificate: only a FULL k rows whose k-th count beats
    // the MG threshold n/capacity proves no non-candidate can outrank
    // the cut. Fewer than k surviving candidates proves NOTHING — MG's
    // decrement evictions can strip candidates on flat distributions
    // while sub-threshold non-candidates still belong in the true top-k
    // — so that case falls back too (never silently truncate).
    val exactGuaranteed =
      counted.length == k && counted.last.getLong(1) > n / capacity
    val rows =
      if (exactGuaranteed) counted.toSeq
      else exactOver(toks.toDF()).collect().toSeq // flat corpus: full aggregate
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType))))
  }
}
