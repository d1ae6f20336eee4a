package graft

import graft.queries.ParityQueries

/** Physical-plan regression guards: these properties ARE the 100 TB design
  * (SURVEY §4/§6) — top-k must never global-sort, dim joins must
  * broadcast, the K5 anti-join must build on the (pruned) existing side,
  * scans must push filters and prune columns. A refactor that silently
  * loses one of these passes row-level tests but regresses 100x at scale,
  * so the plans themselves are asserted.
  */
class PlanSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    ParityQueries.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("flagship top-k plans as TakeOrderedAndProject with pushed filter") {
    val p = plan("flagship_topk_latest")
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("GreaterThan(l_quantity,0.0)"), "filter not pushed to scan")
    assert(!p.contains("l_returnflag"), "column pruning lost")
  }

  test("k5 anti-join broadcasts the pruned existing side") {
    val p = plan("k5_upsert_antijoin")
    assert(p.contains("LeftAnti, BuildRight"), s"anti-join shape wrong:\n$p")
    assert(p.contains("LessThan(l_shipdate"), "prune filter not pushed to build scan")
  }

  test("dim join is a broadcast hash join, fact side unshuffled") {
    val p = plan("join_broadcast_segment")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q1 aggregation is partial (map-side) then final") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_"),
      s"no map-side partial aggregation:\n$p")
  }

  test("projection prunes unread columns at the scan") {
    val p = plan("p1_projection")
    assert(!p.contains("c_mktsegment"), "scan reads columns the query never uses")
  }

  test("whole-stage codegen active on the scan-filter-project path") {
    // flagship has no shuffle, so its executed plan is final (not wrapped
    // in an unresolved AdaptiveSparkPlan) and shows codegen spans as *(n).
    assert(plan("flagship_topk_latest").contains("*("), "no codegen spans")
  }
}
