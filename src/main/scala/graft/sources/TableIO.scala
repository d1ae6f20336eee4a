package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format table IO: one read/write seam over the columnar and
  * row formats a lake actually mixes (parquet, ORC, JSON-lines, CSV).
  * Generalizes the reference's single-format readers (etl/csv_loader.py:49
  * `pd.read_csv`) into the format-plural surface a 100 TB lake needs.
  *
  * Design rules, applied uniformly:
  *  - EXPLICIT schema always (never inference — inference is a full extra
  *    pass over row formats and nondeterministic under drift);
  *  - columnar formats (parquet/ORC) keep predicate pushdown + column
  *    pruning; row formats (JSON/CSV) at least prune top-level columns;
  *  - writes go through `partitionBy` when a partition spec is given, so
  *    downstream scans prune directories — THE dominant 100 TB read
  *    optimization.
  */
object TableIO {

  sealed abstract class Format(val name: String)
  case object Parquet extends Format("parquet")
  case object Orc extends Format("orc")
  case object JsonLines extends Format("json")
  case object Csv extends Format("csv")

  /** Schema-explicit read. PERMISSIVE parse for row formats: malformed
    * rows surface as nulls (the F4 malformed-row guard filters them),
    * never abort a 1000-executor job at row 10^12.
    *
    * `csvMultiLine` (default true) makes CSV reads parse RECORDS rather
    * than physical lines — required to roundtrip this module's own writer,
    * which quotes embedded newlines (line-based parsing would split such
    * a record into malformed null rows with no error). The cost: a
    * multiLine CSV file is NOT SPLITTABLE, so each file parses in one
    * task. For huge EXTERNAL line-delimited CSVs (no quoted newlines by
    * contract), pass csvMultiLine = false to keep scans split-parallel.
    */
  def read(spark: SparkSession, fmt: Format, path: String, schema: StructType,
      csvMultiLine: Boolean = true): DataFrame = {
    val r = spark.read.format(fmt.name).schema(schema)
    fmt match {
      case Csv => r.option("header", "true").option("mode", "PERMISSIVE")
        .option("multiLine", csvMultiLine.toString).load(path)
      case JsonLines => r.option("mode", "PERMISSIVE").load(path)
      case _ => r.load(path)
    }
  }

  /** Partition-aware write. `partitionCols` become directory levels —
    * choose low-cardinality columns (date, source) so file counts stay
    * bounded while scans prune.
    */
  def write(df: DataFrame, fmt: Format, path: String,
            mode: SaveMode = SaveMode.Overwrite,
            partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.format(fmt.name).mode(mode)
    val wp = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    fmt match {
      case Csv => wp.option("header", "true").save(path)
      case _ => wp.save(path)
    }
  }
}
