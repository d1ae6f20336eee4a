package graft

import graft.ext.Triplets

/** Contrastive triplet mining: rotation golden, wrap-around, and the
  * true-neighbor safety filter (the false-negative poison case).
  */
class TripletsSpec extends SparkSpec {
  import spark.implicits._

  test("inBatchTriplets: deterministic rotation with wrap-around") {
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val got = Triplets.inBatchTriplets(pairs)
      .orderBy("anchor").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // (1,2)→neg 4; (3,4)→neg 6; (5,6)→wraps to 2
    assert(got === Seq((1L, 2L, 4L), (3L, 4L, 6L), (5L, 6L, 2L)))
  }

  test("inBatchTriplets: a rotated negative that is a TRUE neighbor drops") {
    // pairs (1,2) and (1,3): rotating (1,2)'s negative yields 3, but
    // (1,3) IS a near-dup pair — training against it would poison the
    // model, so the row must drop rather than ship a false negative
    val pairs = Seq((1L, 2L), (1L, 3L), (8L, 9L)).toDF("id_a", "id_b")
    val got = Triplets.inBatchTriplets(pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(!got.contains((1L, 2L, 3L)))
    assert(got.contains((1L, 3L, 9L))) // (1,3) rotates to 9 — fine
    assert(got.contains((8L, 9L, 2L))) // wrap
    // and no surviving negative equals its anchor or positive
    for ((a, p, n) <- got) assert(n != a && n != p)
  }

  test("inBatchTriplets: single pair yields nothing (no usable negative)") {
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    // the wrap rotation lands on its own positive → filtered
    assert(Triplets.inBatchTriplets(pairs).count() === 0)
  }
}
