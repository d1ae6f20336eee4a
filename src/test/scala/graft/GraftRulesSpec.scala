package graft

import org.apache.spark.sql.functions._

/** Optimizer-rule tier: CollapseIdempotentNfc must rewrite the PLAN
  * (one NfcNormalize where the query wrote two) without changing a
  * value. Inputs derive from spark.range so constant folding cannot
  * evaluate the expressions away before the rule is observable.
  */
class GraftRulesSpec extends SparkSpec {

  // "cafe" + combining acute: NFC composes it — a real value change
  private def base = spark.range(3).select(
    col("id"),
    concat(lit("café "), col("id").cast("string")).as("t"))

  test("nested graft_nfc collapses to one application, values unchanged") {
    val nested = base.select(col("id"),
      call_function("graft_nfc", call_function("graft_nfc", col("t"))).as("n"))
    val single = base.select(col("id"),
      call_function("graft_nfc", col("t")).as("n"))
    val optimized = nested.queryExecution.optimizedPlan.toString
    assert("graft_nfc".r.findAllIn(optimized).length === 1,
      s"rule must collapse the nested call:\n$optimized")
    val got = nested.orderBy("id").collect().map(_.getString(1)).toSeq
    assert(got === single.orderBy("id").collect().map(_.getString(1)).toSeq)
    assert(got.head === "caf\u00e9 0") // decomposed input composed by NFC
  }

  test("the rule does not touch single or unrelated expressions") {
    val plan = base.select(
      call_function("graft_nfc", col("t")).as("a"),
      upper(col("t")).as("b"))
      .queryExecution.optimizedPlan.toString
    assert("graft_nfc".r.findAllIn(plan).length === 1)
    assert(plan.contains("upper"))
  }
}
