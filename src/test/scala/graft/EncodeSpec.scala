package graft

import org.apache.spark.sql.functions._
import graft.ops.Encode

/** Target-encoding semantics beyond the cross-engine gate: the
  * no-self-leak property itself, singleton degradation to the prior,
  * and the fit/serve table.
  */
class EncodeSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 10.0), ("a", 20.0), ("a", 30.0),
    ("b", 100.0),
    ("c", 1.0), ("c", 3.0)).toDF("cat", "y")

  test("LOO encoding never feeds a row its own label back") {
    // with smoothing 0, enc for a row in a 2+-row category is the mean
    // of the OTHER members — e.g. ('a', 10): (20+30)/2 = 25
    val enc = Encode.targetEncodeLoo(df, "cat", "y", smoothing = 0.0)
      .filter(col("cat") === "a")
      .select("y", "te").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(enc == Map(10.0 -> 25.0, 20.0 -> 20.0, 30.0 -> 15.0), s"$enc")
  }

  test("LOO singleton category degrades to the prior, never 0/0") {
    // 'b' has one row: (100 - 100 + m*prior) / (0 + m) = prior exactly
    val prior = (10 + 20 + 30 + 100 + 1 + 3) / 6.0
    val te = Encode.targetEncodeLoo(df, "cat", "y", smoothing = 5.0)
      .filter(col("cat") === "b").select("te").head().getDouble(0)
    assert(math.abs(te - prior) < 1e-12, s"singleton te $te != prior $prior")
  }

  test("fit table: smoothed means, unseen category falls back to prior") {
    val (table, prior) = Encode.targetEncodeFit(df, "cat", "y", smoothing = 0.0)
    val m = table.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 20.0 && m("b") == 100.0 && m("c") == 2.0, s"$m")
    assert(math.abs(prior - 164.0 / 6.0) < 1e-12)
  }

  test("temporal split: embargo region excluded from both sides") {
    val rows = Seq("2024-01-01 00:00:00", "2024-02-15 00:00:00",
      "2024-03-10 00:00:00", "2024-05-01 00:00:00")
      .toDF("s").select(to_timestamp(col("s")).as("ts"))
    val split = graft.ext.Splits.temporal(rows, "ts",
      to_timestamp(lit("2024-02-01 00:00:00")),
      to_timestamp(lit("2024-04-01 00:00:00")))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(split == Map("train" -> 1L, "embargo" -> 2L, "eval" -> 1L), s"$split")
  }

  test("temporal split: null timestamps fail loudly") {
    val rows = Seq(Some("2024-01-01 00:00:00"), None).toDF("s")
      .select(to_timestamp(col("s")).as("ts"))
    val e = intercept[Exception] {
      graft.ext.Splits.temporal(rows, "ts",
        to_timestamp(lit("2024-02-01 00:00:00")),
        to_timestamp(lit("2024-04-01 00:00:00")))
        .groupBy("split").count().collect()
    }
    assert(e.getMessage != null)
  }
}
