package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: the code's golden bit pattern, and the MEASURED
  * layout effect — per-file bounding boxes in the clustered key space
  * must be far tighter than a lexicographic layout's, because tight
  * boxes ARE the file-skipping win the operator exists for (the code
  * arithmetic itself is cross-engine-pinned by the `layout_zorder`
  * oracle).
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zValue: golden Morton codes") {
    // x=1 (b0) -> pos 0; y=2 (b1) -> pos 3: z = 1 + 8 = 9
    val z = Seq((1L, 2L), (0L, 0L), (3L, 3L), (255L, 0L))
      .toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 8).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // (3,3): bits 0,1 of both -> positions 0..3 all set = 15
    // (255,0): x's 8 bits at even positions 0,2,..,14 = 0x5555
    assert(z == Seq(9L, 0L, 15L, 0x5555L), s"golden z codes: $z")
  }

  test("zOrderWrite: per-file key boxes shrink vs a lexicographic layout") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val zDir = tmpDir("graft_zorder") + "/z"
    val lexDir = tmpDir("graft_zorder") + "/lex"
    Layout.zOrderWrite(li, zDir, Seq("l_partkey", "l_suppkey"),
      bits = 12, numFiles = 16)
    // the lexicographic strawman: same file count, sorted by orderkey
    // (the natural ingest order — tight on nothing we filter by)
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(lexDir)

    def meanBoxArea(path: String): Double = {
      val boxes = Layout.fileBoxes(spark.read.parquet(path),
        Seq("l_partkey", "l_suppkey")).collect()
      assert(boxes.length > 1, s"expected several files at $path")
      // normalized by the global key ranges so the areas are comparable
      val (pLo, pHi) = (1.0, 2000.0)
      val (sLo, sHi) = (1.0, 100.0)
      boxes.map { r =>
        val pw = (r.getLong(3) - r.getLong(2)).toDouble / (pHi - pLo)
        val sw = (r.getLong(5) - r.getLong(4)).toDouble / (sHi - sLo)
        pw * sw
      }.sum / boxes.length
    }
    val zArea = meanBoxArea(zDir)
    val lexArea = meanBoxArea(lexDir)
    // random (partkey, suppkey) pairs sorted by orderkey cover ~the whole
    // plane per file (area ~1); the z-curve caps every file to a small box
    assert(zArea < lexArea / 4,
      s"z-order box area $zArea not clearly tighter than lexicographic $lexArea")

    // and the win is what a 2-dim range predicate actually skips: count
    // files whose box intersects a small query box in BOTH dimensions
    def touching(path: String): Int =
      Layout.fileBoxes(spark.read.parquet(path),
        Seq("l_partkey", "l_suppkey")).collect().count { r =>
        r.getLong(2) <= 250 && r.getLong(3) >= 1 &&
          r.getLong(4) <= 25 && r.getLong(5) >= 1
      }
    assert(touching(zDir) < touching(lexDir),
      s"z-order touches ${touching(zDir)} files vs lex ${touching(lexDir)}")
  }

  test("zOrderWrite: quantile robustCols survive a planted outlier; linear degrades") {
    // ONE 1000x outlier stretches the linear min-max range so every
    // normal partkey collapses into ~4 of the 4096 bins — the z-code
    // then discriminates only suppkey and each file's partkey box
    // re-widens toward the full range. Quantile cutpoints are
    // equal-population: the outlier costs one bin and the normal rows
    // keep their resolution. Boxes are measured over the normal rows
    // only (the outlier's own file is legitimately wide in both
    // layouts — the defect linear shows is that it wrecks everyone
    // ELSE's boxes).
    val base = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val outlier = base.limit(1)
      .withColumn("l_partkey", lit(2000000L))
    val li = base.unionByName(outlier)
    val linDir = tmpDir("graft_zq") + "/lin"
    val robDir = tmpDir("graft_zq") + "/rob"
    Layout.zOrderWrite(li, linDir, Seq("l_partkey", "l_suppkey"),
      bits = 12, numFiles = 16)
    Layout.zOrderWrite(li, robDir, Seq("l_partkey", "l_suppkey"),
      bits = 12, numFiles = 16, robustCols = Set("l_partkey", "l_suppkey"))

    // The harm to measure: under the outlier, linear min-max maps every
    // normal partkey into ~4 of 4096 bins, so the z-code degenerates to
    // a 1-D suppkey sort — mean box AREA still looks fine (each file is
    // thin in suppkey), but partkey-only pruning is gone: every file
    // spans the full normal partkey range. So count the files a
    // partkey-range predicate must touch.
    def touching(path: String): (Int, Int) = {
      val boxes = Layout.fileBoxes(
        spark.read.parquet(path).filter(col("l_partkey") <= 2000),
        Seq("l_partkey", "l_suppkey")).collect()
      assert(boxes.length > 1, s"expected several files at $path")
      (boxes.count(r => r.getLong(2) <= 1100 && r.getLong(3) >= 1000),
        boxes.length)
    }
    val (linTouch, linFiles) = touching(linDir)
    val (robTouch, robFiles) = touching(robDir)
    // linear + outlier: every file intersects the partkey window
    assert(linTouch == linFiles,
      s"expected the degraded linear layout to touch all files: $linTouch/$linFiles")
    // quantile keeps real pruning. The exact count jitters with the
    // range partitioner's sampling (observed 7-9 of 16), so the bound
    // is 3/4 of the files — linear's 100% stays clearly separated.
    assert(robTouch * 4 <= robFiles * 3 && robTouch < linTouch,
      s"quantile layout touches $robTouch/$robFiles files, linear $linTouch/$linFiles — no clear pruning win")

    // layout-only rewrite holds on the robust path too
    val back = spark.read.parquet(robDir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty,
      "robust z-order write changed the row multiset")
    assert(back.columns.toSeq == li.columns.toSeq, "helper column leaked")
  }

  test("zOrderWrite: content identical to the input (layout-only rewrite)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val dir = tmpDir("graft_zorder") + "/t"
    Layout.zOrderWrite(li, dir, Seq("l_partkey", "l_suppkey"),
      bits = 8, numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty,
      "z-order write changed the row multiset")
    assert(back.columns.toSeq == li.columns.toSeq, "helper column leaked")
  }
}
