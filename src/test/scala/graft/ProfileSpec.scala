package graft

import graft.ops.Profile

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile: nulls, exact distinct, min/max per column") {
    val df = Seq(
      (Some(3), Option("b")),
      (Some(1), Option("a")),
      (Some(3), None),
      (None, Option("a"))
    ).toDF("num", "str")
    val rows = Profile.profile(df, Seq("num", "str")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(rows.toSeq === Seq(
      ("num", 1L, 2L, "1", "3"),
      ("str", 1L, 2L, "a", "b")))
  }

  test("profile: all-null column reports zero distinct and null extremes") {
    val df = Seq((1, Option.empty[String]), (2, None)).toDF("id", "v")
    val r = Profile.profile(df, Seq("v")).collect().head
    assert((r.getLong(1), r.getLong(2)) === ((2L, 0L)))
    assert(r.isNullAt(3) && r.isNullAt(4))
  }
}
