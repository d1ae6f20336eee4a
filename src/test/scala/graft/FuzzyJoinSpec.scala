package graft

import graft.ops.FuzzyJoin

/** Fuzzy self-join: blocking must equal brute force (the lossless
  * claim), including the short-string fallback block and nulls.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def brute(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    (for {
      (i1, s1) <- rows; (i2, s2) <- rows
      if i1 < i2 && s1 != null && s2 != null
      dist = {
        // driver-side reference Levenshtein
        val m = Array.tabulate(s1.length + 1, s2.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to s1.length; j <- 1 to s2.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (s1(i - 1) == s2(j - 1)) 0 else 1))
        m(s1.length)(s2.length)
      }
      if dist <= d
    } yield (i1, i2, dist.toLong)).toSet

  test("blocking == brute force on mixed long/short/null strings") {
    val rows = Seq(
      (1L, "kettle black"), (2L, "kettle blace"), (3L, "kettle blak"),
      (4L, "completely different"), (5L, "ab"), (6L, "ac"), (7L, "b"),
      (8L, null.asInstanceOf[String]), (9L, "kettle black"),
      (10L, "settle black"), (11L, "a"), (12L, "abc"))
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === brute(rows, d), s"maxDist=$d")
    }
  }

  test("short strings pair through the fallback block, not silently drop") {
    val rows = Seq((1L, "ab"), (2L, "ax"), (3L, "xy"))
    val got = FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // ab~ax dist 1; xy is 2 away from both
  }

  test("guards: invalid params fail loudly") {
    val df = Seq((1L, "a")).toDF("id", "s")
    intercept[IllegalArgumentException](FuzzyJoin.selfJoin(df, "id", "s", 0))
    intercept[IllegalArgumentException](FuzzyJoin.selfJoin(df, "id", "s", 1, q = 0))
  }
}
