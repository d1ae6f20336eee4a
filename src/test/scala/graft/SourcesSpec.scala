package graft

import org.apache.spark.sql.functions._
import graft.sources.{CsvHistorySource, HtmlRatesSource, RestJsonSource}

class SourcesSpec extends SparkSpec {

  test("S1 csv history: explicit schema, no inference") {
    val df = CsvHistorySource.read(spark, fixture("daily_forex_rates.csv"))
    assert(df.schema.fieldNames.toSeq ==
      Seq("currency", "base_currency", "currency_name", "exchange_rate", "date"))
    assert(df.count() == 13)
    // exchange_rate is typed double; empty cell -> null, not failure
    assert(df.filter(col("currency") === "CAD")
      .select("exchange_rate").head().isNullAt(0))
  }

  test("S5+C11 rest json: map pivoted long, one row per currency") {
    val json = scala.io.Source.fromFile(fixture("frankfurter_latest.json")).mkString
    val df = RestJsonSource.parse(spark, json)
    assert(df.count() == 5)
    assert(df.schema.fieldNames.toSeq ==
      Seq("currency", "base_currency", "exchange_rate", "date", "timestamptz"))
    val usd = df.filter(col("currency") === "USD").head()
    assert(usd.getAs[String]("base_currency") == "EUR")
    assert(usd.getAs[Double]("exchange_rate") == 1.0843)
    // C4: 2026-08-11 is CEST (+2) -> 16:00 CET == 14:00 UTC
    assert(usd.getAs[java.time.LocalDateTime]("timestamptz") ==
      java.time.LocalDateTime.parse("2026-08-11T14:00:00"))
  }

  test("C4 winter date uses +1 offset (DST-aware)") {
    val df = RestJsonSource.parse(spark,
      """{"base":"EUR","date":"2026-01-15","rates":{"USD":1.09}}""")
    assert(df.head().getAs[java.time.LocalDateTime]("timestamptz") ==
      java.time.LocalDateTime.parse("2026-01-15T15:00:00"))
  }

  test("S7 html timestamp extracted and parsed as UTC") {
    val html = scala.io.Source.fromFile(fixture("x_rates_table.html")).mkString
    assert(HtmlRatesSource.extractTimestamp(html).contains(
      java.time.LocalDateTime.parse("2026-08-11T18:28:00")))
    assert(HtmlRatesSource.extractTimestamp("<html>no span</html>").isEmpty)
  }

  test("S8 html rates: header skipped, malformed + non-numeric rows dropped") {
    val html = scala.io.Source.fromFile(fixture("x_rates_table.html")).mkString
    val rates = HtmlRatesSource.parseRates(html)
    // 6 body rows: 4 valid, 1 single-cell (guard :89-90), 1 non-numeric
    assert(rates.map(_._1) ==
      Seq("US Dollar", "British Pound", "Japanese Yen", "Swiss Franc"))
    assert(rates.find(_._1 == "Japanese Yen").get._2 == 160.21)
  }

  test("S8 full read: scraped schema with page timestamp stamped per row") {
    val html = scala.io.Source.fromFile(fixture("x_rates_table.html")).mkString
    val df = HtmlRatesSource.read(spark, html)
    assert(df.count() == 4)
    assert(df.select("timestamptz").distinct().count() == 1)
    assert(df.columns.contains("currency_name") && !df.columns.contains("currency"))
  }
}
