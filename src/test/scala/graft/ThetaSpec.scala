package graft

import org.apache.spark.sql.functions._
import graft.ext.CorpusOverlap
import graft.functions.Theta

/** Theta sketch distinct/set-algebra: exactness below capacity, merge
  * equivalence, estimation-regime error, and the overlap operator vs
  * join-computed ground truth.
  */
class ThetaSpec extends SparkSpec {
  import spark.implicits._

  /** Retained hash set of a serialized sketch, sorted — the KMV state a
    * deterministic sketch must reproduce exactly.
    */
  private def hashes(b: Array[Byte]): Seq[Long] = {
    val it = Theta.deserialize(b).iterator()
    val buf = scala.collection.mutable.ArrayBuffer[Long]()
    while (it.next()) buf += it.get()
    buf.sorted.toSeq
  }

  test("exact regime: estimate and intersection equal true set algebra") {
    val a = (1 to 300).map(i => s"k$i").toDF("k")
    val b = (201 to 500).map(i => s"k$i").toDF("k")
    val o = CorpusOverlap.overlap(a, b, "k", nominal = 4096)
    assert(o.exact)
    assert(o.distinctA == 300d && o.distinctB == 300d)
    assert(o.intersection == 100d && o.union == 500d)
    assert(math.abs(o.jaccard - 0.2) < 1e-12)
  }

  test("sketch is a pure function of the input SET (partitioning/dup invariant)") {
    val base = (1 to 400).map(i => s"v$i")
    val dups = (base ++ base ++ base.take(50)).toDF("k").repartition(7)
    val once = base.toDF("k").coalesce(1)
    val Seq(s1, s2) = Seq(dups, once).map(_
      .agg(Theta.sketchAgg(col("k"))).head().getAs[Array[Byte]](0))
    assert(Theta.estimate(s1) == 400d && Theta.estimate(s2) == 400d)
    assert(hashes(s1) == hashes(s2))
  }

  test("mergeAgg over partial sketches == one sketch over the union") {
    val parts = (1 to 600).map(i => (i % 3, s"m$i")).toDF("g", "k")
    val partial = parts.groupBy("g")
      .agg(Theta.sketchAgg(col("k")).as("sk"))
    val merged = partial.agg(Theta.mergeAgg(col("sk")))
      .head().getAs[Array[Byte]](0)
    val direct = parts.agg(Theta.sketchAgg(col("k")))
      .head().getAs[Array[Byte]](0)
    assert(Theta.estimate(merged) == 600d)
    assert(hashes(merged) == hashes(direct))
  }

  test("estimation regime: 50k distinct at nominal 512 within published error") {
    val big = (1 to 50000).map(i => s"x$i").toDF("k").repartition(8)
    val sk = big.agg(Theta.sketchAgg(col("k"), nominal = 512))
      .head().getAs[Array[Byte]](0)
    val est = Theta.estimate(sk)
    assert(Theta.deserialize(sk).isEstimationMode)
    // RSE ~ 1/sqrt(k) ≈ 4.4% at k=512; allow 4 sigma
    assert(math.abs(est - 50000) / 50000 < 0.18, s"est=$est")
  }

  test("thetaCols in IncrementalRollup: two folds stay exact, groups intersect") {
    val path = tmpDir("thetaroll")
    def batch(lo: Int, hi: Int) = (lo to hi)
      .map(i => (if (i % 2 == 0) "even" else "odd", s"u${i / 10}"))
      .toDF("g", "k") // key u<i/10> repeats within and across batches
    graft.sinks.IncrementalRollup(spark, batch(1, 200), path,
      groupCols = Seq("g"), sumCols = Nil, deltaId = Some("d1"),
      transactional = true, thetaCols = Seq("k" -> "sk"))
    graft.sinks.IncrementalRollup(spark, batch(201, 400), path,
      groupCols = Seq("g"), sumCols = Nil, deltaId = Some("d2"),
      transactional = true, thetaCols = Seq("k" -> "sk"))
    val rows = graft.sinks.TxTable.read(spark, path).get
      .select(col("g"), graft.sinks.IncrementalRollup.thetaEstimate(col("sk"))
        .as("d"), col("sk"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1),
        r.getAs[Array[Byte]](2))).toMap
    // keys u0..u40; buckets u1..u39 hold both parities, u0 = i 1..9
    // (both), u40 = i 400 only (even) -> even 41, odd 40, shared 40
    assert(rows("even")._1 == 41d && rows("odd")._1 == 40d)
    val inter = Theta.intersectionEstimate(rows("even")._2, rows("odd")._2)
    assert(inter == 40d)
  }

  test("overlapByGroup matches join-computed ground truth") {
    val rows = for {
      g <- Seq("a", "b", "c"); i <- 1 to 120
    } yield (g, if (i <= 40) s"shared$i" else s"$g-own$i")
    val df = rows.toDF("g", "k")
    val got = CorpusOverlap.overlapByGroup(df, "g", "k", nominal = 4096)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got.keySet == Set(("a", "b"), ("a", "c"), ("b", "c")))
    // each group: 120 distinct, 40 shared with every other
    got.values.foreach { case (na, nb, ni, j) =>
      assert(na == 120L && nb == 120L && ni == 40L)
      assert(math.abs(j - 40d / 200d) < 1e-9)
    }
  }
}
