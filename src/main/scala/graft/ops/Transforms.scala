package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The transform library: every cleaning / filtering / derivation operator
  * from SURVEY.md §2 as a pure `DataFrame => DataFrame` combinator, so
  * pipelines compose into ONE lazy Catalyst plan (no materialization
  * barriers like the reference's intermediate CSV at etl/csv_loader.py:63).
  *
  * Scale posture: all combinators are narrow (no shuffle) except
  * `dedupKeyedKeepFirst` (hash shuffle on the key) and `topK` (planned as
  * TakeOrderedAndProject — per-partition heap + driver merge, never a full
  * sort). Filters/projections are plain Catalyst expressions so they push
  * down into parquet scans (PushedFilters) and prune columns (ReadSchema).
  */
object Transforms {

  /** F1 + C2 — calendar-month date-range window, reference
    * etl/csv_loader.py:54-58 (`today - DateOffset(months=m) <= date <= today`).
    * `anchor` replaces `today` so tests are deterministic; add_months has
    * the same calendar-month (not 30-day) semantics as pd.DateOffset.
    */
  def windowMonths(dateCol: String, anchor: Column, months: Int)(df: DataFrame): DataFrame =
    df.filter(col(dateCol) >= add_months(anchor, -months) && col(dateCol) <= anchor)

  /** F2 — null-rejection on required columns (etl/csv_loader.py:99-101). */
  def dropNullRequired(cols: Seq[String])(df: DataFrame): DataFrame =
    df.na.drop(cols)

  /** F3 — positive-domain predicate (etl/csv_loader.py:102). */
  def positiveDomain(c: String)(df: DataFrame): DataFrame =
    df.filter(col(c) > 0)

  /** F5 — incremental processing-time delta window (services/supabase.py:57-61,
    * `created_at >= now - 20 minutes`). `now` is supplied as a Column so the
    * caller can pin it (tests) or pass current_timestamp() (production).
    */
  def recentDelta(tsCol: String, now: Column, minutes: Int)(df: DataFrame): DataFrame =
    df.filter(col(tsCol) >= now - expr(s"INTERVAL $minutes MINUTES"))

  /** F5 variant anchored to the data itself (max event time - window). The
    * scalar max is computed as a 1-row aggregate broadcast into the filter —
    * no driver-side collect, stays one lazy plan.
    */
  def recentDeltaFromMax(tsCol: String, minutes: Int)(df: DataFrame): DataFrame = {
    val maxDf = df.agg(max(col(tsCol)).as("__max_ts"))
    df.crossJoin(broadcast(maxDf))
      .filter(col(tsCol) >= col("__max_ts") - expr(s"INTERVAL $minutes MINUTES"))
      .drop("__max_ts")
  }

  /** A1 — full-row exact dedup (etl/csv_loader.py:98). */
  def dedupExact(df: DataFrame): DataFrame = df.dropDuplicates()

  /** A2 — keyed dedup with DETERMINISTIC keep-first semantics
    * (etl/web_scraper.py:116-118 keeps the existing CSV's row because
    * concat puts it first). Spark's dropDuplicates keeps an arbitrary row,
    * so where keep-first is observable we use a window + row_number, which
    * shuffles once on the key — same cost as dropDuplicates.
    */
  def dedupKeyedKeepFirst(keys: Seq[String], order: Seq[Column])(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** O1/O2/O3 — multi-key sort + limit. Catalyst plans orderBy+limit as
    * TakeOrderedAndProject (true distributed top-k: per-partition bounded
    * heap, merge on driver) — no full sort, no single-partition shuffle,
    * which is the difference between O(k) and O(N log N) memory at 100 TB.
    */
  def topK(k: Int, order: Column*)(df: DataFrame): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** O3 — dynamic sort spec: sort keys included only if the column exists
    * (scripts/inspect_db.py:19-21).
    */
  def topKDynamic(k: Int, wanted: Seq[(String, Boolean)])(df: DataFrame): DataFrame = {
    val present = wanted.collect {
      case (name, asc) if df.columns.contains(name) =>
        if (asc) col(name).asc else col(name).desc
    }
    df.orderBy(present: _*).limit(k)
  }

  /** U1 + §1.2 schema drift — union by column name, absent columns null-
    * filled (services/supabase.py:17-20,35: union-of-columns schema merge).
    */
  def unionBySchema(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true))

  /** C10 — provenance literal attach (services/supabase.py:29-30). */
  def withSource(tag: String)(df: DataFrame): DataFrame =
    df.withColumn("source", lit(tag))

  /** Spread an under-split input across cores — CONDITIONALLY. A bounded
    * local corpus often arrives as one parquet row-group = one input
    * split, which would run an entire downstream map-heavy or
    * pair-expansion stage on a single core; a 100 TB input is already
    * thousands of splits and must NOT pay an extra exchange. So the
    * round-robin repartition applies only when the scan's actual split
    * count is below the session's parallelism.
    *
    * PRECONDITIONS, load-bearing:
    *  - MAP-ONLY INPUT PLANS ONLY (scan/filter/project). `df.rdd` forces
    *    physical planning, and under AQE an input containing a shuffle
    *    would EXECUTE its upstream stages eagerly just to read a
    *    partition count — then again when the plan runs.
    *  - The check is split COUNT, not balance: a pre-split input whose
    *    pushed filter concentrates the rows in one split passes through
    *    untouched. Quadratic bounded-universe stages keep their
    *    unconditional spread for exactly that reason
    *    (Dedup.ngramGroundTruthPairs).
    */
  def spreadIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** C3 — event-time synthesis for history rows: civil date + 10h, UTC
    * (etl/csv_loader.py:105-108). Session TZ is pinned UTC (build.sbt).
    */
  def synthesizeEventTimeHistory(dateCol: String)(df: DataFrame): DataFrame =
    df.withColumn("timestamptz",
      col(dateCol).cast("timestamp") + expr("INTERVAL 10 HOURS"))

  /** C4 — event-time synthesis for API rows: civil date @ 16:00 CET → UTC,
    * DST-aware (etl/api_fetcher.py:72-82, etl/config.py:32-33).
    */
  def synthesizeEventTimeApi(dateCol: String)(df: DataFrame): DataFrame =
    df.withColumn("timestamptz",
      to_utc_timestamp(
        to_timestamp(concat(date_format(col(dateCol), "yyyy-MM-dd"), lit(" 16:00:00"))),
        "CET").cast("timestamp_ntz"))

  /** C1 — permissive timestamp parse: null on unparseable, never error
    * (pd.to_datetime errors="coerce", etl/csv_loader.py:52). Spark 4 is
    * ANSI by default, so the `try_` form is load-bearing here.
    */
  def permissiveTimestamp(c: Column): Column = try_to_timestamp(c)

  /** Composite cleaner for the history pipeline: A1 + F2 + F3 + C1
    * (etl/csv_loader.py:96-108 transform_data).
    */
  def cleanHistory(df: DataFrame): DataFrame = {
    val deduped = df.dropDuplicates()
    val required = deduped.na.drop(Seq("currency", "exchange_rate", "date"))
    required.filter(col("exchange_rate") > 0)
  }
}
