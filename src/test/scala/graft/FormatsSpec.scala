package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sources.TableIO

/** Multi-format IO roundtrips + the plan properties each format must
  * keep: partition-directory pruning on partitioned writes, predicate
  * pushdown on columnar formats.
  */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // date (not ntz-timestamp) for the roundtrip frame: CSV/JSON carry
  // dates portably; timestamp-ntz-in-CSV is a format quirk, not the IO
  // surface under test
  private def sample = Tables.orders(spark, dir)
    .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      col("o_totalprice"), col("o_orderdate").cast("date").as("o_date"),
      col("o_orderpriority"))

  private def sorted(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("o_orderkey").collect().toSeq

  for (fmt <- Seq(TableIO.Parquet, TableIO.Orc, TableIO.JsonLines, TableIO.Csv)) {
    test(s"${fmt.name}: write/read roundtrip preserves rows and schema") {
      val path = tmpDir(s"fmt_${fmt.name}") + "/t"
      val in = sample
      TableIO.write(in, fmt, path)
      val back = TableIO.read(spark, fmt, path, in.schema)
      assert(back.schema == in.schema, s"schema drift through ${fmt.name}")
      assert(sorted(back) == sorted(in), s"row drift through ${fmt.name}")
    }
  }

  test("partitioned write -> partition-pruned read (directory pruning)") {
    val path = tmpDir("fmt_part") + "/t"
    TableIO.write(sample, TableIO.Parquet, path,
      partitionCols = Seq("o_orderpriority"))
    val back = spark.read.parquet(path).filter(col("o_orderpriority") === "1-URGENT")
    val p = back.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter not pruning directories:\n$p")
    assert(back.count() ==
      sample.filter(col("o_orderpriority") === "1-URGENT").count())
  }

  test("ORC keeps predicate pushdown and column pruning") {
    val path = tmpDir("fmt_orc") + "/t"
    TableIO.write(sample, TableIO.Orc, path)
    val q = TableIO.read(spark, TableIO.Orc, path, sample.schema)
      .filter(col("o_orderkey") > 100).select("o_orderkey", "o_totalprice")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,100)"),
      s"filter not pushed to ORC scan:\n$p")
    assert(!p.contains("o_orderstatus"), "ORC scan reads pruned columns")
  }

  test("schema evolution: mergeSchema unions old and new parquet layouts") {
    import spark.implicits._
    val path = tmpDir("fmt_evolve") + "/t"
    // generation 1: (id, a) — written before the column was added
    Seq((1L, "x")).toDF("id", "a").write.parquet(s"$path/gen=1")
    // generation 2: (id, a, b) — the evolved layout
    Seq((2L, "y", 3.5)).toDF("id", "a", "b").write.parquet(s"$path/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.sorted.toSeq == Seq("a", "b", "gen", "id"))
    val rows = merged.orderBy("id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("b"))) // old rows: new col null
    assert(rows(1).getDouble(rows(1).fieldIndex("b")) == 3.5)
  }

  test("append mode accumulates, overwrite replaces") {
    val path = tmpDir("fmt_mode") + "/t"
    val in = sample.limit(10)
    TableIO.write(in, TableIO.Parquet, path)
    TableIO.write(in, TableIO.Parquet, path, mode = SaveMode.Append)
    assert(spark.read.parquet(path).count() == 20)
    TableIO.write(in, TableIO.Parquet, path, mode = SaveMode.Overwrite)
    assert(spark.read.parquet(path).count() == 10)
  }

  test("CSV roundtrip survives quotes, embedded commas, newlines, and unicode") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "line\nbreak"),
      (5L, "tab\tand unicode: naïve 日本語 🚀"),
      (6L, "")
    ).toDF("id", "s")
    val path = tmpDir("fmt_csvedge") + "/t"
    TableIO.write(nasty, TableIO.Csv, path)
    // TableIO.read must roundtrip its own writer's output, including
    // quoted newlines (multiLine is set inside the seam)
    val back = TableIO.read(spark, TableIO.Csv, path, nasty.schema)
    val a = back.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val b = nasty.orderBy("id").collect().map(r =>
      // CSV cannot distinguish empty string from null without a marker;
      // Spark reads "" back as null — normalize for the comparison and
      // keep that caveat visible here
      (r.getLong(0), Option(r.getString(1)).filter(_.nonEmpty).orNull)).toSeq
    assert(a == b)
  }

  test("PERMISSIVE row-format read surfaces malformed rows as nulls, not failures") {
    val path = tmpDir("fmt_bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(path, "part-0.json"),
      """{"o_orderkey": 1, "o_totalprice": 10.5}
        |this is not json
        |{"o_orderkey": 2, "o_totalprice": "NaNsense"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("o_orderkey", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("o_totalprice", org.apache.spark.sql.types.DoubleType)))
    val back = TableIO.read(spark, TableIO.JsonLines, path, schema)
    // 3 physical lines -> 3 rows; the broken ones carry nulls and are
    // dropped by the standard F2 null-rejection step
    assert(back.count() == 3)
    assert(back.filter(col("o_orderkey").isNotNull && col("o_totalprice").isNotNull)
      .count() == 1)
  }
}
