package graft

import graft.sinks.Catalog

class CatalogSpec extends SparkSpec {

  test("S10/S11/K4/K8: register, list, describe, drop") {
    Catalog.registerTable(spark, "cat_lineitem", "/root/testdata/sf0.001/lineitem.parquet")
    assert(Catalog.listTables(spark).contains("cat_lineitem"))
    // S11: dynamic column list minus excluded (all-but-id projection)
    val cols = Catalog.columnsExcept(spark.table("cat_lineitem"), "l_orderkey")
    assert(!cols.contains("l_orderkey") && cols.contains("l_quantity"))
    assert(Catalog.dropTable(spark, "cat_lineitem"))
    assert(!Catalog.listTables(spark).contains("cat_lineitem"))
  }

  test("O3 over a registered table: sort keys only for existing columns") {
    import org.apache.spark.sql.functions.col
    Catalog.registerTable(spark, "cat_orders", "/root/testdata/sf0.001/orders.parquet")
    val out = graft.ops.Transforms.topKDynamic(5, Seq(
      ("o_orderdate", false), ("ghost_col", true), ("o_orderkey", true)))(
      spark.table("cat_orders"))
    assert(out.count() == 5)
    val dates = out.select(col("o_orderdate")).collect().map(_.getAs[Any](0).toString)
    assert(dates.sorted.reverse.toSeq == dates.toSeq)
    Catalog.dropTable(spark, "cat_orders")
  }
}
