package graft

import graft.ext.Graph

/** PageRank: hand-derived goldens (symmetric cycle, dangling
  * redistribution, hub dominance) and the mass-conservation invariant
  * that the dangling fold exists to protect.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: 2-cycle is exactly uniform at every iteration") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iters = 5).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.5) < 1e-12 && math.abs(r(2L) - 0.5) < 1e-12)
  }

  test("pageRank: dangling node's mass is redistributed — Σpr stays 1") {
    // 1 → 2, 2 has no out-edges (dangling)
    val e = Seq((1L, 2L)).toDF("s", "d")
    val rows = Graph.pageRank(e, "s", "d", iters = 4).collect()
    val total = rows.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-9, s"mass leaked: $total")
    val r = rows.map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(2L) > r(1L)) // everything 1 has flows to 2; 2 only trickles back
  }

  test("pageRank: one-iteration dangling golden, hand-derived") {
    // 1 → 2: pr0 = (.5, .5); D0 = .5 (node 2 dangles)
    // pr1(1) = .15/2 + .85·(0 + .25)        = 0.2875
    // pr1(2) = .15/2 + .85·(.5/1 + .25)     = 0.7125
    val e = Seq((1L, 2L)).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iters = 1).collect()
      .map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(math.abs(r(1L) - 0.2875) < 1e-12)
    assert(math.abs(r(2L) - 0.7125) < 1e-12)
  }

  test("pageRank: star hub outranks leaves; undirected doubles edges") {
    val e = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L)).toDF("s", "d")
    val r = Graph.pageRank(e, "s", "d", iters = 10, undirected = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(9L) > r(1L) * 2)
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // leaves are symmetric — identical rank
    assert(math.abs(r(1L) - r(4L)) < 1e-12)
  }

  test("pageRank: invalid parameters fail loudly") {
    val e = Seq((1L, 2L)).toDF("s", "d")
    intercept[IllegalArgumentException](Graph.pageRank(e, "s", "d", 0))
    intercept[IllegalArgumentException](
      Graph.pageRank(e, "s", "d", 1, damping = 1.0))
    intercept[IllegalArgumentException](
      Graph.pageRank(e.limit(0), "s", "d", 1))
  }
}
