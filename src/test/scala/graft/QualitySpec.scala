package graft

import org.apache.spark.sql.functions._
import graft.ops.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1L, Some(10.0), "a"),
    (2L, None, "b"),
    (3L, Some(-5.0), null.asInstanceOf[String]),
    (4L, Some(0.0), "d")
  ).toDF("id", "amount", "tag")

  test("observe collects row, null, and domain counters in one action") {
    val (instrumented, obs) = Quality.observed(df,
      requiredCols = Seq("amount", "tag"), positiveCols = Seq("amount"))
    val written = tmpDir("quality") + "/t"
    instrumented.write.parquet(written) // the action that carries the metrics
    val m = obs.get
    assert(m("n_rows") == 4L)
    assert(m("nulls_amount") == 1L)
    assert(m("nulls_tag") == 1L)
    assert(m("nonpos_amount") == 2L) // -5.0 and 0.0 (nulls don't count)
    assert(!Quality.clean(m))
    assert(spark.read.parquet(written).count() == 4) // rows unaffected
  }

  test("empty dataset gates as clean (sum-over-zero-rows is not a violation)") {
    val empty = df.filter(col("id") < 0)
    val (instrumented, obs) = Quality.observed(empty,
      requiredCols = Seq("amount"), positiveCols = Seq("amount"))
    instrumented.count()
    val m = obs.get
    assert(m("n_rows") == 0L && m("nulls_amount") == 0L && m("nonpos_amount") == 0L)
    assert(Quality.clean(m))
  }

  test("clean data passes the gate") {
    val good = df.filter(col("id") === 1L)
    val (instrumented, obs) = Quality.observed(good,
      requiredCols = Seq("amount", "tag"), positiveCols = Seq("amount"))
    instrumented.count()
    assert(Quality.clean(obs.get))
  }

  test("metrics ride the existing plan: no extra exchange or subtree") {
    val (instrumented, _) = Quality.observed(df, requiredCols = Seq("amount"))
    val p = instrumented.queryExecution.executedPlan.toString
    assert(p.contains("CollectMetrics"), s"no CollectMetrics operator:\n$p")
    assert(!p.contains("Exchange"), s"observe added a shuffle:\n$p")
  }

  test("guards: unknown column and empty check set rejected") {
    intercept[IllegalArgumentException] { Quality.observed(df, Seq("nope")) }
    intercept[IllegalArgumentException] { Quality.observed(df, Nil, Nil) }
  }
}
