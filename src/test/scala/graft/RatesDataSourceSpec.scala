package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

class RatesDataSourceSpec extends SparkSpec {

  test("graft-rates json: one partition per payload file, long rows") {
    val dir = tmpDir("dsv2json")
    Files.copy(Paths.get(fixture("frankfurter_latest.json")),
      Paths.get(dir, "day1.json"))
    Files.writeString(Paths.get(dir, "day2.json"),
      """{"base":"EUR","date":"2026-08-12","rates":{"USD":1.0850,"GBP":0.8419}}""")
    val df = spark.read.format("graft-rates")
      .option("kind", "json").option("path", dir).load()
    assert(df.schema.fieldNames.toSeq ==
      Seq("currency", "base_currency", "exchange_rate", "date", "timestamptz"))
    assert(df.count() == 7) // 5 + 2
    assert(df.rdd.getNumPartitions == 2) // one per payload file
    // C4 semantics identical to the driver-side source: 16:00 CEST -> 14:00 UTC
    val usd = df.filter(col("currency") === "USD" && col("date") === "2026-08-11").head()
    assert(usd.getAs[java.time.LocalDateTime]("timestamptz") ==
      java.time.LocalDateTime.parse("2026-08-11T14:00:00"))
  }

  test("graft-rates html: same rows as the driver-side HtmlRatesSource") {
    val dir = tmpDir("dsv2html")
    Files.copy(Paths.get(fixture("x_rates_table.html")),
      Paths.get(dir, "page.html"))
    val dsv2 = spark.read.format("graft-rates")
      .option("kind", "html").option("path", dir).load()
    val driverSide = graft.sources.HtmlRatesSource.read(spark,
      scala.io.Source.fromFile(fixture("x_rates_table.html")).mkString)
      .drop("created_at")
    assert(dsv2.collect().map(_.toSeq).toSet ==
      driverSide.collect().map(_.toSeq).toSet)
  }

  test("graft-rates rejects unknown kind") {
    intercept[Exception] {
      spark.read.format("graft-rates")
        .option("kind", "csv").option("path", "/tmp").load()
    }
  }
}
