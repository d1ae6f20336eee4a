package graft

import org.apache.spark.sql.functions._
import graft.sinks.{IncrementalRollup, TxTable, Upsert}

/** Manifest-committed table format: snapshot isolation for the
  * rewriting sinks. The legacy per-leaf swap documents a no-concurrent-
  * reader contract; these specs prove the TxTable commit REMOVES it —
  * a reader racing a multi-partition replace sees the old snapshot or
  * the new one, never a torn mix — and that the deltaId ledger makes
  * non-idempotent rollup maintenance crash+rerun exact.
  */
class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def seed(tag: Int) =
    (1 to 4).map(p => (s"p$p", p.toLong, tag)).toDF("part", "k", "tag")

  test("roundtrip: partitioned commit + read, partial replace carries the rest") {
    val dir = tmpDir("txr") + "/t"
    TxTable.commit(spark, seed(1), dir, Seq("part"))
    val t1 = TxTable.read(spark, dir).get
    assert(t1.count() == 4)
    assert(t1.columns.sorted.toSeq == Seq("k", "part", "tag"))
    // replace only p1/p2; p3/p4 carry over from gen=1
    val delta = Seq(("p1", 10L, 2), ("p2", 20L, 2)).toDF("part", "k", "tag")
    TxTable.commit(spark, delta, dir, Seq("part"))
    val t2 = TxTable.read(spark, dir).get
    assert(t2.count() == 4)
    assert(t2.filter(col("part").isin("p1", "p2"))
      .select("tag").distinct().collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(t2.filter(col("part").isin("p3", "p4"))
      .select("tag").distinct().collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("diff: manifest diff attributes appended rows; compaction flags non-append") {
    val dir = tmpDir("txdiff") + "/t"
    TxTable.commit(spark, seed(1), dir, Seq("part"), deltaId = Some("d1"))
    val v1 = TxTable.currentManifest(spark, dir).get.version
    TxTable.commit(spark,
      Seq(("p1", 100L, 9), ("p5", 500L, 9)).toDF("part", "k", "tag"),
      dir, Seq("part"), deltaId = Some("d2"), append = true)
    val v2 = TxTable.currentManifest(spark, dir).get.version
    val d = TxTable.diff(spark, dir, v1, v2)
    assert(d.appendOnly && d.removedDirs.isEmpty && d.newDeltaIds == Seq("d2"))
    // addedBetween reads ONLY the new generation's rows
    val added = TxTable.addedBetween(spark, dir, v1, v2)
      .select("part", "k").as[(String, Long)].collect().sortBy(_._1)
    assert(added.toSeq == Seq(("p1", 100L), ("p5", 500L)))
    // self-diff is empty but typed
    assert(TxTable.addedBetween(spark, dir, v2, v2).count() == 0)
    // compaction rewrites the snapshot: dirs retire, appendOnly is false
    TxTable.compact(spark, dir)
    val v3 = TxTable.currentManifest(spark, dir).get.version
    val dc = TxTable.diff(spark, dir, v2, v3)
    assert(!dc.appendOnly && dc.removedDirs.nonEmpty)
  }

  test("stats skipping: narrow predicate reads only matching generations") {
    val dir = tmpDir("txstats") + "/t"
    // an append STREAM whose batches cover disjoint time ranges — the
    // canonical skipping layout (each generation = one day's ingest)
    for (day <- 1 to 5)
      TxTable.commit(spark,
        (0 until 10).map(i => (day * 100L + i, day.toLong))
          .toDF("ts", "payload"),
        dir, Nil, append = day > 1, statsCols = Seq("ts"))
    // predicate covering one day's range: 1 of 5 directories scans
    assert(TxTable.pruneEffect(spark, dir, "ts", 300.0, 309.0) === ((1, 5)))
    val got = TxTable.readWhere(spark, dir, "ts", 300.0, 309.0).get
      .select("ts").as[Long].collect().sorted
    assert(got.toSeq === (300L to 309L))
    // stats survive further appends (carry-over) and vacuum-irrelevant
    // columns without stats never prune
    assert(TxTable.pruneEffect(spark, dir, "payload", 99.0, 99.5) === ((5, 5)))
    // row filter still applies inside the kept directory
    assert(TxTable.readWhere(spark, dir, "ts", 305.0, 306.0).get.count() === 2)
    // full-range predicate keeps everything
    assert(TxTable.pruneEffect(spark, dir, "ts", 0.0, 1e9) === ((5, 5)))
  }

  test("stats skipping: partitioned commit logs per-leaf stats") {
    val dir = tmpDir("txstatsp") + "/t"
    TxTable.commit(spark,
      Seq(("p1", 1L), ("p1", 5L), ("p2", 100L), ("p2", 200L))
        .toDF("part", "k"),
      dir, Seq("part"), statsCols = Seq("k"))
    assert(TxTable.pruneEffect(spark, dir, "k", 0.0, 10.0) === ((1, 2)))
    val got = TxTable.readWhere(spark, dir, "k", 0.0, 10.0).get
      .select("k").as[Long].collect().sorted
    assert(got.toSeq === Seq(1L, 5L))
    // a replace of p1 without statsCols retires the old stats with the
    // directory; the new unstatted directory reads unconditionally
    TxTable.commit(spark, Seq(("p1", 7L)).toDF("part", "k"), dir, Seq("part"))
    assert(TxTable.pruneEffect(spark, dir, "k", 0.0, 10.0) === ((1, 2)))
    assert(TxTable.readWhere(spark, dir, "k", 0.0, 10.0).get.count() === 1)
  }

  test("stats skipping: transactional upsert-ignore appends carry statsCols") {
    val dir = tmpDir("txstatsu") + "/t"
    import graft.sinks.UpsertIgnore
    for (block <- 1 to 3) // disjoint id blocks per append — time/id-keyed ingest
      UpsertIgnore(spark,
        (0 until 20).map(i => (block * 1000L + i, s"v$block")).toDF("id", "v"),
        dir, keys = Seq("id"), transactional = true, statsCols = Seq("id"))
    assert(TxTable.pruneEffect(spark, dir, "id", 2000.0, 2019.0) === ((1, 3)))
    assert(TxTable.readWhere(spark, dir, "id", 2000.0, 2019.0).get.count() === 20)
  }

  test("deleteWhere: stats-pruned delete rewrites only overlapping generations") {
    val dir = tmpDir("txdel") + "/t"
    for (day <- 1 to 4)
      TxTable.commit(spark,
        (0 until 10).map(i => (day * 100L + i, s"d$day")).toDF("ts", "tag"),
        dir, Nil, append = day > 1, statsCols = Seq("ts"))
    val before = TxTable.currentManifest(spark, dir).get
    // delete day 2's block: only its generation overlaps
    val deleted = TxTable.deleteWhere(spark, dir, "ts", 200.0, 299.0,
      statsCols = Seq("ts"))
    assert(deleted === 10L)
    val after = TxTable.currentManifest(spark, dir).get
    // three untouched generations carry over BY REFERENCE (same dirs)
    val carried = before.dirs.toSet.intersect(after.dirs.toSet)
    assert(carried.size === 3, s"carried=$carried")
    val left = TxTable.read(spark, dir).get.select("ts").as[Long]
      .collect().sorted
    assert(left.length === 30 && !left.exists(t => t >= 200 && t <= 299))
    // time travel still sees the deleted rows until vacuum
    assert(TxTable.readAt(spark, dir, before.version).count() === 40)
    // delete with no overlapping stats range touches nothing
    assert(TxTable.deleteWhere(spark, dir, "ts", 9000.0, 9999.0) === 0L)
    assert(TxTable.currentManifest(spark, dir).get.version === after.version)
    // deleting a range with survivors inside the touched generation
    val d2 = TxTable.deleteWhere(spark, dir, "ts", 100.0, 104.0,
      statsCols = Seq("ts"))
    assert(d2 === 5L)
    assert(TxTable.read(spark, dir).get.count() === 25)
  }

  test("schema evolution: an append that adds a column reads back null-filled") {
    val dir = tmpDir("txse") + "/t"
    TxTable.commit(spark, Seq(("p1", 1L), ("p2", 2L)).toDF("part", "k"),
      dir, Seq("part"))
    // the delta carries a NEW column `score`; the gen=1 files lack it
    TxTable.commit(spark,
      Seq(("p1", 10L, 0.5), ("p3", 30L, 0.7)).toDF("part", "k", "score"),
      dir, Seq("part"), append = true)
    val t = TxTable.read(spark, dir).get
    assert(t.columns.sorted.toSeq == Seq("k", "part", "score"),
      t.columns.mkString(","))
    val rows = t.select("k", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(rows == Map(1L -> null, 2L -> null, 10L -> 0.5, 30L -> 0.7), rows)
    // and the OLD column is null-filled the other way: a later
    // generation dropping `score` again still reads the snapshot shape
    TxTable.commit(spark, Seq(("p4", 40L)).toDF("part", "k"),
      dir, Seq("part"), append = true)
    val t2 = TxTable.read(spark, dir).get
    assert(t2.columns.sorted.toSeq == Seq("k", "part", "score"))
    assert(t2.filter(col("k") === 40L).select("score").head().isNullAt(0))
    assert(t2.filter(col("k") === 10L).select("score").head().getDouble(0) == 0.5)
  }

  test("schema drift guard: a type change needs replaceAll, not a silent cast") {
    val dir = tmpDir("txsd") + "/t"
    TxTable.commit(spark, Seq(("p1", 1L)).toDF("part", "k"), dir, Seq("part"))
    val e = intercept[IllegalArgumentException] {
      TxTable.commit(spark, Seq(("p2", "oops")).toDF("part", "k"),
        dir, Seq("part"), append = true)
    }
    assert(e.getMessage.contains("schema drift"), e.getMessage)
    // replaceAll resets the recorded schema legitimately
    TxTable.commit(spark, Seq(("p2", "ok")).toDF("part", "k"),
      dir, Seq("part"), replaceAll = true)
    assert(TxTable.read(spark, dir).get.select("k").head().getString(0) == "ok")
  }

  test("deltaId charset guard: whitespace/control ids rejected at commit") {
    val dir = tmpDir("txdc") + "/t"
    for (bad <- Seq("a b", "a\tb", "a\nb", "")) {
      val e = intercept[IllegalArgumentException] {
        TxTable.commit(spark, Seq((1L, "a")).toDF("k", "v"), dir, Nil,
          deltaId = Some(bad))
      }
      assert(e.getMessage.contains("deltaId"), s"'$bad': ${e.getMessage}")
    }
    intercept[IllegalArgumentException] {
      TxTable.recordDelta(spark, dir, "a b")
    }
  }

  test("recordDelta: zero-survivor batches enter the ledger without data") {
    val dir = tmpDir("txrd") + "/t"
    TxTable.commit(spark, Seq(("p1", 1L)).toDF("part", "k"), dir, Seq("part"),
      deltaId = Some("b1"))
    TxTable.recordDelta(spark, dir, "b2")
    assert(TxTable.appliedDeltaIds(spark, dir) == Set("b1", "b2"))
    // replay of the recorded id is rejected like any other delta
    intercept[IllegalArgumentException] { TxTable.recordDelta(spark, dir, "b2") }
    // the snapshot is untouched: same rows, schema carried forward
    val t = TxTable.read(spark, dir).get
    assert(t.count() == 1 && t.columns.sorted.toSeq == Seq("k", "part"))
    // a ledger-only table (no data ever committed) is readable as absent
    val dir2 = tmpDir("txrd2") + "/t"
    TxTable.recordDelta(spark, dir2, "only")
    assert(TxTable.appliedDeltaIds(spark, dir2) == Set("only"))
    assert(TxTable.read(spark, dir2).isEmpty)
  }

  test("flat table: commit replaces the whole snapshot atomically") {
    val dir = tmpDir("txf") + "/t"
    TxTable.commit(spark, Seq((1L, "a")).toDF("k", "v"), dir, Nil)
    TxTable.commit(spark, Seq((2L, "b"), (3L, "c")).toDF("k", "v"), dir, Nil,
      replaceAll = true)
    val t = TxTable.read(spark, dir).get
    assert(t.collect().map(_.getLong(0)).sorted.toSeq == Seq(2L, 3L))
  }

  test("a crash at EVERY commit stage leaves the previous snapshot intact") {
    val dir = tmpDir("txc") + "/t"
    TxTable.commit(spark, seed(1), dir, Seq("part"))
    for (stage <- Seq("before-data", "after-data", "before-publish")) {
      val e = intercept[RuntimeException] {
        TxTable.commit(spark, seed(9), dir, Seq("part"),
          failpoint = s => if (s == stage) sys.error(s"crash at $s"))
      }
      assert(e.getMessage.contains(stage))
      // reader still sees the v1 snapshot, complete and consistent
      val t = TxTable.read(spark, dir).get
      assert(t.count() == 4, s"torn read after crash at $stage")
      assert(t.select("tag").distinct().collect()
        .map(_.getInt(0)).toSeq == Seq(1), s"torn read after crash at $stage")
    }
    // the rerun reclaims the orphan generation and commits cleanly
    TxTable.commit(spark, seed(2), dir, Seq("part"))
    assert(TxTable.read(spark, dir).get.select("tag").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(2))
  }

  test("concurrent reader during multi-partition replaces never sees a torn table") {
    val dir = tmpDir("txrace") + "/t"
    TxTable.commit(spark, seed(0), dir, Seq("part"))
    val torn = new java.util.concurrent.atomic.AtomicReference[String](null)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val reader = new Thread(() => {
      while (!stop.get() && torn.get() == null) {
        // invariant: every commit rewrites ALL FOUR partitions with one
        // tag, so a consistent snapshot has exactly one distinct tag on
        // exactly 4 rows — the per-leaf swap breaks this, the manifest
        // commit must not
        val rows = TxTable.read(spark, dir).get
          .groupBy("tag").agg(count(lit(1)).as("n")).collect()
        if (rows.length != 1 || rows(0).getLong(1) != 4)
          torn.set(rows.mkString(", "))
      }
    })
    reader.start()
    try
      for (i <- 1 to 8) {
        TxTable.commit(spark, seed(i), dir, Seq("part"))
        assert(torn.get() == null, s"torn read observed: ${torn.get()}")
      }
    finally { stop.set(true); reader.join(30000) }
    assert(torn.get() == null, s"torn read observed: ${torn.get()}")
  }

  test("reserved 'gen' column rejected; commit is O(touched) at 100 partitions") {
    val dir = tmpDir("txg") + "/t"
    intercept[IllegalArgumentException] {
      TxTable.commit(spark, Seq((1L, 2L)).toDF("k", "gen"), dir, Nil)
    }
    // 100-partition table; a single-partition commit writes ONE leaf in
    // its generation and carries the other 99 entries untouched
    val wide = (1 to 100).map(p => (s"p$p", p.toLong)).toDF("part", "k")
    TxTable.commit(spark, wide, dir, Seq("part"))
    TxTable.commit(spark, Seq(("p37", 999L)).toDF("part", "k"), dir, Seq("part"))
    val m = TxTable.currentManifest(spark, dir).get
    assert(m.entries.count(_._2.startsWith("gen=2/")) == 1, "non-touched leaves rewritten")
    assert(m.entries.size == 100)
    val t = TxTable.read(spark, dir).get
    assert(t.count() == 100)
    assert(t.filter(col("part") === "p37").head().getLong(
      t.schema.fieldIndex("k")) == 999L)
  }

  test("deltaId ledger: applied ids accumulate and replays are rejected") {
    val dir = tmpDir("txd") + "/t"
    TxTable.commit(spark, seed(1), dir, Seq("part"), deltaId = Some("b1"))
    TxTable.commit(spark, seed(2), dir, Seq("part"), deltaId = Some("b2"))
    assert(TxTable.appliedDeltaIds(spark, dir) == Set("b1", "b2"))
    val e = intercept[IllegalArgumentException] {
      TxTable.commit(spark, seed(3), dir, Seq("part"), deltaId = Some("b1"))
    }
    assert(e.getMessage.contains("already applied"))
  }

  test("optimistic version check detects a lost update") {
    val dir = tmpDir("txv") + "/t"
    TxTable.commit(spark, seed(1), dir, Seq("part"))
    // writer A reads v1, writer B commits v2, writer A's commit must fail
    TxTable.commit(spark, seed(2), dir, Seq("part"))
    val e = intercept[IllegalArgumentException] {
      TxTable.commit(spark, seed(3), dir, Seq("part"),
        expectedVersion = Some(1L))
    }
    assert(e.getMessage.contains("concurrent commit"))
  }

  test("vacuum can truncate the delta ledger atomically (retention window)") {
    val dir = tmpDir("txledger") + "/t"
    for (i <- 1 to 5)
      TxTable.commit(spark, seed(i), dir, Seq("part"), deltaId = Some(s"d$i"))
    TxTable.vacuum(spark, dir, keepDeltaIds = 2)
    assert(TxTable.appliedDeltaIds(spark, dir) == Set("d4", "d5"))
    // the truncation is itself a manifest version; data is untouched
    assert(TxTable.read(spark, dir).get.select("tag").distinct()
      .head().getInt(0) == 5)
    // inside the retained window replays are still rejected...
    intercept[IllegalArgumentException] {
      TxTable.commit(spark, seed(9), dir, Seq("part"), deltaId = Some("d5"))
    }
    // ...outside it the id can recommit (the documented tradeoff)
    TxTable.commit(spark, seed(1), dir, Seq("part"), deltaId = Some("d1"))
  }

  test("time travel until vacuum; vacuum drops unreferenced generations") {
    val dir = tmpDir("txvac") + "/t"
    for (i <- 1 to 3) TxTable.commit(spark, seed(i), dir, Seq("part"))
    assert(TxTable.readAt(spark, dir, 1).select("tag").distinct()
      .head().getInt(0) == 1)
    TxTable.vacuum(spark, dir, keepVersions = 1)
    val gens = new java.io.File(s"$dir/data").listFiles().map(_.getName).toSet
    assert(gens == Set("gen=3"), s"gens after vacuum: $gens")
    assert(TxTable.read(spark, dir).get.select("tag").distinct()
      .head().getInt(0) == 3)
    intercept[Exception] { TxTable.readAt(spark, dir, 1).collect() }
  }

  test("compaction is a normal commit: fewer files, same rows, reader-safe") {
    val dir = tmpDir("txcompact") + "/t"
    // five small commits -> five generations' worth of files live? No —
    // each commit REPLACES the partitions it carries; accumulate small
    // files by committing one partition at a time
    for (p <- 1 to 4)
      TxTable.commit(spark,
        Seq((s"p$p", p.toLong, 1)).toDF("part", "k", "tag"), dir, Seq("part"))
    val before = TxTable.read(spark, dir).get.collect().map(_.toSeq).toSet
    val (nb, na) = TxTable.compact(spark, dir)
    assert(na <= nb && na == 4, s"files $nb -> $na")
    assert(TxTable.read(spark, dir).get.collect().map(_.toSeq).toSet == before)
    // old snapshot still resolvable until vacuum (reader-safety window)
    assert(TxTable.readAt(spark, dir, 4).count() == 4)
    TxTable.vacuum(spark, dir)
    assert(TxTable.read(spark, dir).get.collect().map(_.toSeq).toSet == before)
  }

  test("compactClustered: 2-dim predicate touches fewer files; snapshot identical; stats logged") {
    val dir = tmpDir("txzc") + "/t"
    val li = Tables.lineitem(spark, "/root/testdata/sf0.01")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    // four append generations in natural (orderkey-ish) ingest order —
    // the layout every incremental writer produces, tight on nothing a
    // (partkey, suppkey) predicate filters by
    for (b <- 0 until 4)
      TxTable.commit(spark, li.filter(pmod(col("l_orderkey"), lit(4)) === b),
        dir, Nil, append = true)
    def touching(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val boxes = graft.ops.Layout
        .fileBoxes(df, Seq("l_partkey", "l_suppkey")).collect()
      (boxes.count(r => r.getLong(2) <= 500 && r.getLong(3) >= 251 &&
        r.getLong(4) <= 50 && r.getLong(5) >= 26), boxes.length)
    }
    val (preTouch, preFiles) = touching(TxTable.read(spark, dir).get)
    assert(preTouch == preFiles,
      s"expected the ingest-order layout to have no 2-dim pruning: $preTouch/$preFiles")
    val (fb, fa) = TxTable.compactClustered(spark, dir,
      Seq("l_partkey", "l_suppkey"), bits = 12, numFiles = 16)
    assert(fb == preFiles && fa >= 2 && fa <= 16, s"files $fb -> $fa")
    val after = TxTable.read(spark, dir).get
    val (postTouch, postFiles) = touching(after)
    // range-partitioned z boundaries are sampled, not cell-aligned, so
    // boundary files straddle z-cells — half the files is still a
    // conservative ceiling vs the pre-compaction 100%
    assert(postTouch * 2 <= postFiles,
      s"clustered compaction still touches $postTouch/$postFiles files " +
        s"for the 2-dim predicate (was $preTouch/$preFiles)")
    // the rewrite is layout-only and the commit machinery is intact
    assert(after.count() == li.count())
    assert(after.exceptAll(li).isEmpty && li.exceptAll(after).isEmpty,
      "clustered compaction changed the row multiset")
    // z-column generation stats ride the manifest, so readWhere/
    // deleteWhere prune this generation against later appends
    val m = TxTable.currentManifest(spark, dir).get
    assert(m.stats.values.exists(s =>
      s.contains("l_partkey") && s.contains("l_suppkey")),
      s"no generation stats for the cluster columns: ${m.stats}")
    // partitioned tables reject loudly — their layout is already pinned
    val pdir = tmpDir("txzc") + "/p"
    TxTable.commit(spark, seed(1), pdir, Seq("part"))
    intercept[IllegalArgumentException] {
      TxTable.compactClustered(spark, pdir, Seq("k"))
    }
  }

  // ---- sink integration --------------------------------------------

  test("transactional rollup: crash mid-maintain + rerun folds the delta EXACTLY once") {
    val dir = tmpDir("txroll") + "/t"
    val b1 = Seq(("p1", 1.0), ("p1", 2.0), ("p2", 3.0)).toDF("part", "x")
    val b2 = Seq(("p1", 10.0), ("p3", 5.0)).toDF("part", "x")
    def maintain(b: org.apache.spark.sql.DataFrame, id: String) =
      IncrementalRollup(spark, b, dir, groupCols = Seq("part"),
        sumCols = Seq("x" -> "sum_x"), partitionBy = Seq("part"),
        deltaId = Some(id), transactional = true)
    maintain(b1, "b1")
    // the ADVICE scenario: a failed maintain() followed by a rerun of
    // the SAME delta must not double-count. Simulate the crash by
    // failing the underlying commit after data lands but before the
    // manifest publishes.
    intercept[RuntimeException] {
      val agg = b2.groupBy("part").agg(count(lit(1)).as("cnt"), sum("x").as("sum_x"))
      val existing = TxTable.read(spark, dir).get
      val folded = existing.unionByName(agg.select(existing.columns.map(col).toSeq: _*))
        .groupBy("part").agg(sum("cnt").as("cnt"), sum("sum_x").as("sum_x"))
        .select(existing.columns.map(col).toSeq: _*)
      TxTable.commit(spark, folded, dir, Seq("part"), deltaId = Some("b2"),
        failpoint = s => if (s == "before-publish") sys.error("crash at before-publish"))
    }
    maintain(b2, "b2") // rerun: folds b2 (the crash published nothing)
    maintain(b2, "b2") // replay after success: no-op via the ledger
    val t = TxTable.read(spark, dir).get
      .select("part", "cnt", "sum_x").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(t == Map("p1" -> ((3L, 13.0)), "p2" -> ((1L, 3.0)), "p3" -> ((1L, 5.0))),
      s"got $t")
  }

  test("legacy rollup: deltaId marker makes rerun-after-success a no-op") {
    val dir = tmpDir("legroll") + "/t"
    val b = Seq(("p1", 1.0), ("p2", 2.0)).toDF("part", "x")
    def maintain() = IncrementalRollup(spark, b, dir,
      groupCols = Seq("part"), sumCols = Seq("x" -> "sum_x"),
      partitionBy = Seq("part"), deltaId = Some("b1"))
    maintain(); maintain() // second run must not double-count
    val t = spark.read.parquet(dir).select("part", "cnt").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(t == Map("p1" -> 1L, "p2" -> 1L), s"got $t")
  }

  test("transactional upsert-ignore: atomic keyed append, idempotent, crash-safe") {
    val dir = tmpDir("txk5") + "/t"
    val b1 = Seq(("p1", 1L, 1.0), ("p2", 2L, 2.0)).toDF("part", "k", "v")
    def upsert(b: org.apache.spark.sql.DataFrame) =
      graft.sinks.UpsertIgnore(spark, b, dir, keys = Seq("part", "k"),
        partitionBy = Seq("part"), transactional = true)
    assert(upsert(b1) == graft.sinks.UpsertIgnore.Result(2, 0))
    // rerun: the anti-join vs the snapshot inserts nothing (idempotent)
    assert(upsert(b1) == graft.sinks.UpsertIgnore.Result(0, 2))
    // overlapping batch: only the unseen key lands, appended atomically
    val b2 = Seq(("p1", 1L, 9.9), ("p1", 7L, 7.0)).toDF("part", "k", "v")
    assert(upsert(b2) == graft.sinks.UpsertIgnore.Result(1, 1))
    val t = TxTable.read(spark, dir).get
    assert(t.count() == 3)
    // the existing p1/k=1 row kept its original value (insert-IGNORE)
    assert(t.filter(col("part") === "p1" && col("k") === 1L)
      .select("v").head().getDouble(0) == 1.0)
    // p1 now resolves through TWO generations (append, not replace)...
    val m = TxTable.currentManifest(spark, dir).get
    assert(m.entries.count(_._1 == "part=p1") == 2, m.entries.toString)
    // ...until compaction collapses the accumulation, contents unchanged
    TxTable.compact(spark, dir)
    val m2 = TxTable.currentManifest(spark, dir).get
    assert(m2.entries.count(_._1 == "part=p1") == 1, m2.entries.toString)
    assert(TxTable.read(spark, dir).get.count() == 3)
    // a crashed append (data written, manifest unpublished) is invisible;
    // the rerun reclaims the orphan and inserts exactly once
    val b3 = Seq(("p3", 3L, 3.0)).toDF("part", "k", "v")
    intercept[RuntimeException] {
      TxTable.commit(spark, b3, dir, Seq("part"), append = true,
        failpoint = s => if (s == "before-publish") sys.error("crash"))
    }
    assert(TxTable.read(spark, dir).get.count() == 3)
    assert(upsert(b3) == graft.sinks.UpsertIgnore.Result(1, 0))
    assert(TxTable.read(spark, dir).get.count() == 4)
  }

  test("transactional upsert: last-writer-wins merge under the manifest log") {
    val dir = tmpDir("txups") + "/t"
    val seed0 = Seq(("p1", 1L, "a"), ("p2", 2L, "b")).toDF("part", "k", "v")
    val r1 = Upsert(spark, seed0, dir, keys = Seq("part", "k"),
      partitionBy = Seq("part"), transactional = true)
    assert(r1 == Upsert.Result(updated = 0, inserted = 2))
    val batch = Seq(("p1", 1L, "A"), ("p3", 3L, "c")).toDF("part", "k", "v")
    val r2 = Upsert(spark, batch, dir, keys = Seq("part", "k"),
      partitionBy = Seq("part"), transactional = true)
    assert(r2 == Upsert.Result(updated = 1, inserted = 1))
    val t = TxTable.read(spark, dir).get.collect()
      .map(r => (r.getString(r.fieldIndex("part")), r.getLong(r.fieldIndex("k"))) ->
        r.getString(r.fieldIndex("v"))).toMap
    assert(t == Map(("p1", 1L) -> "A", ("p2", 2L) -> "b", ("p3", 3L) -> "c"))
    // untouched partition's generation directory is immutable: p2 still
    // resolves into gen=1
    val m = TxTable.currentManifest(spark, dir).get
    assert(m.entries.filter(_._1 == "part=p2").map(_._2)
      .forall(_.startsWith("gen=1/")), m.entries.toString)
  }
}
