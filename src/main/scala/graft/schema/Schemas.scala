package graft.schema

import org.apache.spark.sql.types._

/** Explicit schemas for the three source row shapes and the unified sink
  * row (SURVEY.md §1.2). The engine never relies on CSV/JSON inference
  * (the reference's `pd.read_csv` with no dtypes, etl/csv_loader.py:49) —
  * explicit StructTypes make scans deterministic and prunable.
  *
  * Per-source schema drift is load-bearing (services/supabase.py:17-20,35):
  * history has all columns; api lacks `currency_name`
  * (etl/api_fetcher.py:131-141); scraped lacks the `currency` code
  * (etl/web_scraper.py:130-140). The unified shape is the column union.
  */
object Schemas {

  /** Raw Kaggle history CSV: etl/csv_loader.py:99-101, 174-180, 200-207. */
  val historyCsv: StructType = StructType(Seq(
    StructField("currency", StringType, nullable = true),
    StructField("base_currency", StringType, nullable = true),
    StructField("currency_name", StringType, nullable = true),
    StructField("exchange_rate", DoubleType, nullable = true),
    StructField("date", StringType, nullable = true) // parsed permissively (C1)
  ))

  /** forex_rates_history table shape: etl/csv_loader.py:123-135. */
  val history: StructType = StructType(Seq(
    StructField("currency", StringType, nullable = false),
    StructField("base_currency", StringType, nullable = false),
    StructField("currency_name", StringType, nullable = true),
    StructField("exchange_rate", DoubleType, nullable = false),
    StructField("date", DateType, nullable = true),
    StructField("timestamptz", TimestampNTZType, nullable = true),
    StructField("created_at", TimestampNTZType, nullable = true)
  ))

  /** forex_rates_api table shape (no currency_name): etl/api_fetcher.py:131-142. */
  val api: StructType = StructType(Seq(
    StructField("currency", StringType, nullable = true),
    StructField("base_currency", StringType, nullable = true),
    StructField("exchange_rate", DoubleType, nullable = true),
    StructField("date", DateType, nullable = true),
    StructField("timestamptz", TimestampNTZType, nullable = true),
    StructField("created_at", TimestampNTZType, nullable = true)
  ))

  /** forex_rates_scraped table shape (no currency code): etl/web_scraper.py:130-141. */
  val scraped: StructType = StructType(Seq(
    StructField("currency_name", StringType, nullable = true),
    StructField("base_currency", StringType, nullable = true),
    StructField("exchange_rate", DoubleType, nullable = true),
    StructField("date", DateType, nullable = true),
    StructField("timestamptz", TimestampNTZType, nullable = true),
    StructField("created_at", TimestampNTZType, nullable = true)
  ))

  /** Frankfurter /latest JSON document: etl/api_fetcher.py:69-70,85. */
  val frankfurterDoc: StructType = StructType(Seq(
    StructField("amount", DoubleType, nullable = true),
    StructField("base", StringType, nullable = true),
    StructField("date", StringType, nullable = true),
    StructField("rates", MapType(StringType, DoubleType), nullable = true)
  ))

  /** Natural keys for the upsert-ignore sinks (UNIQUE constraints:
    * etl/api_fetcher.py:140, etl/csv_loader.py:133, etl/web_scraper.py:139).
    */
  val historyKey: Seq[String] = Seq("currency", "timestamptz")
  val apiKey: Seq[String]     = Seq("currency", "timestamptz")
  val scrapedKey: Seq[String] = Seq("currency_name", "timestamptz")
}

/** Typed row for the unified sink shape (column union of the three drifted
  * source schemas + provenance tag, services/supabase.py:29-35).
  */
case class UnifiedRate(
    currency: Option[String],
    base_currency: String,
    currency_name: Option[String],
    exchange_rate: Double,
    date: java.time.LocalDate,
    timestamptz: java.time.LocalDateTime,
    source: String)
