package graft.sources

import java.sql.{Connection, ResultSet}

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S9 — JDBC table scan (SURVEY §2.1): the reference reads its SQLite /
  * Postgres tables with `pd.read_sql_query` (services/supabase.py:55-63,
  * etl/api_fetcher.py:204-215, scripts/inspect_db.py:25-27) — a
  * single-connection, whole-result-in-memory pull. Re-expressed as Spark's
  * partitioned-JDBC architecture (the JDBCRDD contract):
  *
  *  - the table is striped into per-partition WHERE ranges over a numeric
  *    `partitionColumn` (first/last stripes unbounded so out-of-range rows
  *    are never silently dropped — same rule as Spark's own JDBC source);
  *  - each TASK opens its own connection executor-side and streams only
  *    its stripe through the ResultSet — no driver-side collect, memory
  *    bounded per task, parallelism = numPartitions;
  *  - the connection FACTORY is injected (a serializable `() =>
  *    java.sql.Connection`), the same seam S5/S6/K7 use for their
  *    transports: offline specs plug an in-memory stub, production plugs
  *    a DriverManager/pool factory — the scan code never changes.
  *
  * At 100 TB the database side is the bottleneck, not Spark: stripes map
  * 1:1 to index-range scans, and `numPartitions` caps concurrent
  * connections (the knob Spark's own source exposes for exactly this
  * reason).
  */
object JdbcSource {

  /** Serializable connection factory — ships to executors inside the task
    * closure, so implementations must not capture a live Connection.
    */
  trait ConnectionFactory extends (() => Connection) with Serializable

  /** Per-stripe WHERE predicates over a numeric partition column.
    * Mirrors Spark's JDBCRelation.columnPartition semantics: n-2 bounded
    * stripes plus unbounded first/last, so rows outside [lower, upper)
    * still land in a partition.
    */
  def partitionPredicates(
      column: String,
      lower: Long,
      upper: Long,
      numPartitions: Int): Seq[Option[String]] = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    if (numPartitions == 1) Seq(None)
    else {
      val stride = math.max((upper - lower) / numPartitions, 1L)
      (0 until numPartitions).map { i =>
        val lo = lower + i * stride
        val hi = lower + (i + 1) * stride
        if (i == 0) Some(s"$column < $hi")
        else if (i == numPartitions - 1) Some(s"$column >= $lo")
        else Some(s"$column >= $lo AND $column < $hi")
      }
    }
  }

  /** Scan `table` through the injected factory with an explicit schema.
    * Column projection happens in the SQL (only `schema` columns are
    * SELECTed — pushdown by construction), and callers push filters by
    * passing a view/subquery as `table` (the `(SELECT ...) t` idiom
    * Spark's JDBC source shares).
    */
  def read(
      spark: SparkSession,
      connect: ConnectionFactory,
      table: String,
      schema: StructType,
      partitionColumn: Option[String] = None,
      lowerBound: Long = 0L,
      upperBound: Long = 0L,
      numPartitions: Int = 1): DataFrame = {
    val preds: Seq[Option[String]] = partitionColumn match {
      case Some(c) => partitionPredicates(c, lowerBound, upperBound, numPartitions)
      case None => Seq(None)
    }
    val fields = schema.fields
    val colList = fields.map(_.name).mkString(", ")
    val rdd = spark.sparkContext
      .parallelize(preds, preds.size)
      .mapPartitions { predIt =>
        predIt.flatMap { pred =>
          val sql = s"SELECT $colList FROM $table" +
            pred.map(p => s" WHERE $p").getOrElse("")
          val conn = connect()
          val stmt = conn.createStatement()
          val rs = stmt.executeQuery(sql)
          var closed = false
          def closeAll(): Unit = if (!closed) {
            closed = true
            try rs.close() finally { try stmt.close() finally conn.close() }
          }
          // tasks that stop early (limit, failure) still release the
          // connection
          Option(TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => closeAll()))
          new Iterator[Row] {
            private var advanced = false
            private var has = false
            override def hasNext: Boolean = {
              if (!advanced) {
                has = rs.next()
                advanced = true
                if (!has) closeAll()
              }
              has
            }
            override def next(): Row = {
              if (!hasNext) throw new NoSuchElementException("end of ResultSet")
              advanced = false
              Row.fromSeq(fields.zipWithIndex.map { case (f, i) =>
                readColumn(rs, f.dataType, i + 1)
              }.toIndexedSeq)
            }
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** JDBC → Catalyst value conversion for the engine's column types;
    * `wasNull` maps SQL NULL to Spark null for primitives.
    */
  private def readColumn(rs: ResultSet, dt: DataType, idx: Int): Any = {
    val v: Any = dt match {
      case LongType => rs.getLong(idx)
      case IntegerType => rs.getInt(idx)
      case DoubleType => rs.getDouble(idx)
      case FloatType => rs.getFloat(idx)
      case BooleanType => rs.getBoolean(idx)
      case StringType => rs.getString(idx)
      case DateType => rs.getDate(idx)
      case TimestampType => rs.getTimestamp(idx)
      case TimestampNTZType =>
        Option(rs.getTimestamp(idx)).map(_.toLocalDateTime).orNull
      case DecimalType() => rs.getBigDecimal(idx)
      case other => throw new IllegalArgumentException(
        s"JdbcSource does not map ${other.sql}")
    }
    if (rs.wasNull()) null else v
  }
}
