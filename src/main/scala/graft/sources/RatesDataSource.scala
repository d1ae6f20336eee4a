package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSourceV2 `TableProvider` for the two external rate feeds — the
  * idiomatic `spark.read.format("graft-rates")` form of S5/S6-S8 (SURVEY
  * §2.1 suggests exactly this as the polish over driver-side
  * createDataFrame). Usage:
  *
  * {{{
  *   spark.read.format("graft-rates")
  *     .option("kind", "json")   // or "html"
  *     .option("path", "/data/payloads")   // dir or glob of payload files
  *     .load()
  * }}}
  *
  * Each payload FILE becomes one `InputPartition`, so a directory of
  * fetched documents (e.g. one per day per feed) parses in parallel
  * across executors — the scan scales with the number of payloads while
  * a single daily document degenerates to one tiny task, both correct.
  * Parsing reuses the same pure functions as the driver-side sources
  * (HtmlRatesSource), so both paths stay semantically identical.
  */
class RatesDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rates"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RatesDataSource.schemaFor(options.getOrDefault("kind", "json"))

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RatesTable(
      properties.getOrDefault("kind", "json"),
      properties.get("path"))
}

object RatesDataSource {
  /** Long row shapes per feed (SURVEY §1.2 drift: json/api rows carry the
    * currency code, html/scraped rows only the display name).
    */
  def schemaFor(kind: String): StructType = kind match {
    case "json" => StructType(Seq(
      StructField("currency", StringType),
      StructField("base_currency", StringType),
      StructField("exchange_rate", DoubleType),
      StructField("date", DateType),
      StructField("timestamptz", TimestampNTZType)))
    case "html" => StructType(Seq(
      StructField("currency_name", StringType),
      StructField("base_currency", StringType),
      StructField("exchange_rate", DoubleType),
      StructField("date", DateType),
      StructField("timestamptz", TimestampNTZType)))
    case other => throw new IllegalArgumentException(
      s"graft-rates kind must be json|html, got '$other'")
  }
}

private class RatesTable(kind: String, path: String)
    extends Table with SupportsRead {
  override def name(): String = s"graft-rates($kind, $path)"
  override def schema(): StructType = RatesDataSource.schemaFor(kind)
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      // The session's Hadoop conf (credentials, custom filesystem schemes),
      // captured at plan time on the driver and shipped to executors inside
      // the reader factory — `new Configuration()` would silently drop any
      // user FS settings, diverging from how Sinks resolves paths.
      private val hadoopConf = new SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf())

      override def build(): Scan = this
      override def readSchema(): StructType = schema()
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val p = new Path(path)
        val fs = p.getFileSystem(hadoopConf.value)
        // globStatus handles both concrete paths and glob patterns; a
        // single directory match expands to its children
        val matched = Option(fs.globStatus(p)).getOrElse(Array.empty)
        val files =
          if (matched.length == 1 && matched(0).isDirectory)
            fs.listStatus(matched(0).getPath).map(_.getPath)
          else matched.map(_.getPath)
        files.sortBy(_.toString)
          .map(f => RatesPartition(kind, f.toString): InputPartition)
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new RatesReaderFactory(hadoopConf)
    }
}

private case class RatesPartition(kind: String, file: String) extends InputPartition

private class RatesReaderFactory(hadoopConf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val RatesPartition(kind, file) = partition
    val text = {
      val p = new Path(file)
      val fs = p.getFileSystem(hadoopConf.value)
      val in = fs.open(p)
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    }
    val rows = (kind match {
      case "json" => RatesPayloadParser.parseJson(text)
      case "html" => RatesPayloadParser.parseHtml(text)
    }).iterator
    new PartitionReader[InternalRow] {
      override def next(): Boolean = rows.hasNext
      override def get(): InternalRow = rows.next()
      override def close(): Unit = ()
    }
  }
}

/** Payload → InternalRow parsing, shared by all partitions. Timestamps are
  * NTZ micros; dates are epoch days — the engine's canonical encodings.
  */
private object RatesPayloadParser {
  private val EuropeCet = java.time.ZoneId.of("CET")

  /** Frankfurter-shaped JSON (etl/api_fetcher.py:69-85): rates map pivoted
    * long, event time = civil date @ 16:00 CET → UTC (C4/C11).
    */
  def parseJson(text: String): Seq[InternalRow] = {
    val doc = new ObjectMapper().readTree(text)
    val base = if (doc.has("base")) doc.get("base").asText() else "EUR"
    val date = java.time.LocalDate.parse(doc.get("date").asText())
    val utc = date.atTime(16, 0).atZone(EuropeCet)
      .withZoneSameInstant(java.time.ZoneOffset.UTC).toLocalDateTime
    val micros = utc.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    doc.get("rates").properties().asScala.toSeq.map { e =>
      InternalRow(
        UTF8String.fromString(e.getKey),
        UTF8String.fromString(base),
        e.getValue.asDouble(),
        date.toEpochDay.toInt,
        micros)
    }
  }

  /** x-rates-shaped HTML: same regex parse as the driver-side source
    * (HtmlRatesSource — S7/S8 guards included by construction).
    */
  def parseHtml(text: String): Seq[InternalRow] = {
    val ts = HtmlRatesSource.extractTimestamp(text)
      .getOrElse(throw new IllegalArgumentException(
        "ratesTimestamp span missing or unparseable"))
    val micros = ts.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
      ts.getNano / 1000L
    HtmlRatesSource.parseRates(text).map { case (name, rate) =>
      InternalRow(
        UTF8String.fromString(name),
        UTF8String.fromString("EUR"),
        rate,
        ts.toLocalDate.toEpochDay.toInt,
        micros)
    }
  }
}
