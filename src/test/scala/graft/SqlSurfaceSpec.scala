package graft

import org.apache.spark.sql.functions._

/** The SQL string surface: Tables.registerAll exposes every table as a
  * temp view, and spark.sql produces the same results AND the same
  * physical plans as the DataFrame API — one Catalyst underneath.
  */
class SqlSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // one registration for the suite — views persist in the shared session
  private lazy val registered: Unit = Tables.registerAll(spark, dir)

  test("spark.sql over registered views equals the DataFrame API result") {
    registered
    val viaSql = spark.sql(
      """SELECT c.c_mktsegment, count(*) AS cnt,
        |  round(sum(o.o_totalprice), 2) AS revenue
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o.o_orderpriority = '1-URGENT'
        |GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val viaDf = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")
      .collect().map(_.toSeq).toSeq
    assert(viaSql == viaDf)
    assert(viaSql.nonEmpty)
  }

  test("views stay lazy scans: SQL filter pushes down to the parquet scan") {
    registered
    val q = spark.sql("SELECT l_orderkey, l_quantity FROM lineitem WHERE l_quantity > 45")
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)"),
      s"view indirection lost pushdown:\n$p")
    assert(!p.contains("l_extendedprice"), "view indirection lost column pruning")
  }

  test("native graft_* expressions are callable from SQL") {
    registered
    val r = spark.sql(
      """SELECT doc_id, graft_simhash(transform(split(trim(text), '\\s+'),
        |  t -> xxhash64(t))) AS sh
        |FROM documents WHERE doc_id < 3 ORDER BY doc_id""".stripMargin)
      .collect()
    assert(r.length == 3 && r.forall(!_.isNullAt(1)))
    // the image hash takes scalar geometry args, not just arrays
    val d = spark.sql(
      """SELECT doc_id, graft_dhash(encode(text, 'UTF-8'),
        |  CAST(n_chars % 64 + 1 AS INT), CAST(n_chars % 48 + 1 AS INT)) AS h
        |FROM documents WHERE doc_id < 3 ORDER BY doc_id""".stripMargin)
      .collect()
    assert(d.length == 3 && d.forall(!_.isNullAt(1)))
  }

  test("sketch aggregates are callable from SQL and match the exact answer") {
    registered
    graft.functions.Kll.register(spark)
    graft.functions.FreqItems.register(spark)
    // l_linenumber is uniform 1-7: wide rank bands make the KLL median
    // deterministic, and 7 distinct values keep the FI sketch exact
    val row = spark.sql(
      """SELECT
        |  CAST(graft_kll_quantile(
        |    graft_kll_agg(CAST(l_linenumber AS DOUBLE)), 0.5) AS BIGINT)
        |    AS med,
        |  graft_fi_topk(graft_fi_agg(CAST(l_linenumber AS STRING)), 1)
        |    AS top1
        |FROM lineitem""".stripMargin).head()
    val exact = spark.sql(
      """SELECT CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_linenumber)
        |  AS BIGINT) FROM lineitem""".stripMargin).head().getLong(0)
    assert(row.getLong(0) === exact)
    val top = row.getSeq[org.apache.spark.sql.Row](1).head
    val exactTop = spark.sql(
      """SELECT CAST(l_linenumber AS STRING) AS v, count(*) AS c
        |FROM lineitem GROUP BY 1 ORDER BY c DESC, v ASC LIMIT 1""".stripMargin)
      .head()
    assert(top.getString(0) === exactTop.getString(0) &&
      top.getLong(1) === exactTop.getLong(1))
  }
}
