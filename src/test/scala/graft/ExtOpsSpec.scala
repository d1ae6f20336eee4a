package graft

import org.apache.spark.sql.functions._
import graft.ext.{Quantize, TextAnalysis, Tfidf}

/** Specs for the round-2 text/embedding operators: TF-IDF keyword
  * extraction, PII redaction, int8 embedding quantization, and the
  * sketch-vs-exact error bounds of the approximate aggregates that stand
  * in for the exact forms at 100 TB.
  */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- TF-IDF -------------------------------------------------------

  private val corpus = Seq(
    (1L, "common common rare1"),
    (2L, "common common other"),
    (3L, "common filler words here"),
    (4L, "common filler words again")
  ).toDF("doc_id", "text")

  test("tfidf: corpus-wide term scores 0, doc-unique term ranks first") {
    val top = Tfidf.topTerms(corpus, "doc_id", "text", k = 3)
    val rows = top.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getDouble(3), r.getInt(4)))
    // "common" appears in every doc -> idf = ln(1) = 0 -> tfidf 0
    assert(rows.filter(_._2 == "common").forall(_._3 == 0.0))
    // doc 1's unique term is its top-ranked keyword
    val doc1First = rows.filter(r => r._1 == 1L && r._4 == 1).head
    assert(doc1First._2 == "rare1")
    // never more than k rows per doc, ranks contiguous from 1
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._4).sorted.sameElements(1 to rs.length))
    }
  }

  test("tfidf: ties rank deterministically by term") {
    // docs 3 and 4 share {filler, words} with equal tf and df -> equal
    // tfidf; term order must break the tie alphabetically
    val top = Tfidf.topTerms(corpus, "doc_id", "text", k = 3)
      .filter(col("doc_id") === 3L).orderBy("rn")
      .collect().map(_.getString(1))
    val fillerIdx = top.indexOf("filler")
    val wordsIdx = top.indexOf("words")
    assert(fillerIdx >= 0 && wordsIdx >= 0 && fillerIdx < wordsIdx)
  }

  test("tfidf: k guard rejects k=0") {
    intercept[IllegalArgumentException] {
      Tfidf.topTerms(corpus, "doc_id", "text", k = 0)
    }
  }

  // ---- PII redaction ------------------------------------------------

  test("pii: emails, urls, and long digit runs redact; short runs survive") {
    val df = Seq(
      "mail a.user+tag@sub.example.org now",
      "see https://ex.org/path?q=1234567 for details",
      "account 12345678 but room 42 and zip 12345",
      "no pii here at all"
    ).toDF("raw").select(TextAnalysis.redactPii(col("raw")).as("clean"))
    val out = df.collect().map(_.getString(0))
    assert(out(0) == "mail <EMAIL> now")
    // URL consumed as a unit — its embedded digit run must NOT surface as <ID>
    assert(out(1) == "see <URL> for details")
    assert(out(2) == "account <ID> but room 42 and zip 12345")
    assert(out(3) == "no pii here at all")
  }

  test("pii: counts match the hits actually redacted") {
    val df = Seq("a@b.co c@d.io and https://x.y plus 9999999")
      .toDF("raw").select(
        TextAnalysis.piiCount(col("raw"), TextAnalysis.EmailRe).as("e"),
        TextAnalysis.piiCount(col("raw"), TextAnalysis.UrlRe).as("u"),
        TextAnalysis.piiCount(col("raw"), TextAnalysis.IdRe).as("i"))
    val r = df.head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == ((2, 1, 1)))
  }

  // ---- int8 quantization --------------------------------------------

  private val vecs = Seq(
    (1L, Array(0.0f, 1.0f, 2.0f, 3.0f)),
    (2L, Array(-5.0f, 0.0f, 5.0f, 10.0f)),
    (3L, Array(7.5f, 7.5f, 7.5f, 7.5f)) // degenerate: all equal
  ).toDF("vec_id", "embedding")

  test("quantize: codes span [0,255], endpoints exact") {
    val q = Quantize.int8(vecs, "vec_id", "embedding")
      .select(col("vec_id"), col("codes")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(q(1L).head == 0 && q(1L).last == 255)
    assert(q(1L).forall(c => c >= 0 && c <= 255))
    assert(q(2L).head == 0 && q(2L).last == 255)
  }

  test("quantize: degenerate all-equal vector -> code 0, zero error") {
    val r = Quantize.int8WithError(vecs, "vec_id", "embedding")
      .filter(col("vec_id") === 3L).head()
    assert(r.getSeq[Int](r.fieldIndex("codes")).forall(_ == 0))
    assert(r.getDouble(r.fieldIndex("recon_mae")) == 0.0)
  }

  test("quantize: reconstruction error bounded by half a step") {
    val rows = Quantize.int8WithError(vecs, "vec_id", "embedding")
      .select(col("vec_id"), col("scale"), col("recon_mae")).collect()
    rows.foreach { r =>
      val halfStep = r.getDouble(1) / 2.0
      assert(r.getDouble(2) <= halfStep + 1e-9,
        s"vec ${r.getLong(0)}: mae ${r.getDouble(2)} > half-step $halfStep")
    }
  }

  // ---- training-mix sampling ----------------------------------------

  test("mix sampling: output proportions hit the target quotas exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val weights = Map("en" -> 0.4, "es" -> 0.15, "fr" -> 0.15,
      "de" -> 0.15, "zh" -> 0.15)
    val out = graft.ext.Mix
      .sampleToDistribution(docs, "lang", "doc_id", weights)
    val got = out.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // exact feasible quotas: T = min floor(n_g / w_g), quota = floor(w*T)
    val n = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (g, w) => math.floor(n(g) / w) }.min
    weights.foreach { case (g, w) =>
      assert(got(g) == math.floor(w * t).toLong, s"$g: ${got(g)}")
    }
    // deterministic: same call, same rows
    val a = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val b = graft.ext.Mix.sampleToDistribution(docs, "lang", "doc_id", weights)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b)
  }

  test("mix sampling: selection matches the single-window reference at any partitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val weights = Map("en" -> 0.4, "es" -> 0.15, "fr" -> 0.15,
      "de" -> 0.15, "zh" -> 0.15)
    // reference: the naive Window.partitionBy(group) full-sort form the
    // distributed prefix-sum selection must reproduce row-for-row
    val n = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = weights.map { case (g, w) => math.floor(n(g) / w) }.min
    val quotas = weights.map { case (g, w) => g -> math.floor(w * t).toLong }
    val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    val want = docs.withColumn("__rn", row_number().over(w))
      .join(quotas.toSeq.toDF("lang", "__q"), "lang")
      .filter(col("__rn") <= col("__q"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    Seq(docs, docs.repartition(3), docs.repartition(17)).foreach { d =>
      val got = graft.ext.Mix.sampleToDistribution(d, "lang", "doc_id", weights)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == want, s"diff: ${(got diff want) ++ (want diff got)}")
    }
  }

  test("mix sampling plan: no per-group global sort, corpus scanned once in the result") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val weights = Map("en" -> 0.4, "es" -> 0.15, "fr" -> 0.15,
      "de" -> 0.15, "zh" -> 0.15)
    val out = graft.ext.Mix.sampleToDistribution(docs, "lang", "doc_id", weights)
    val plan = out.queryExecution.optimizedPlan.toString
    // the rank window must be keyed by (__pid, __g) — parallelism =
    // partition count; a windowspecdefinition over the bare group column
    // would hand each group's whole sort to one task at scale
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    assert(!plan.contains("windowspecdefinition(lang"), plan)
    // quotas/T are driver math over ONE collected aggregate: the returned
    // plan re-reads the corpus only for the final survivor semi-join
    val scans = out.queryExecution.optimizedPlan.collectLeaves().count {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case _ => false
    }
    assert(scans == 1, s"expected 1 corpus scan in the result plan, got $scans\n$plan")
  }

  test("mix sampling guards: empty and out-of-range weights rejected") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    intercept[IllegalArgumentException] {
      graft.ext.Mix.sampleToDistribution(docs, "lang", "doc_id", Map.empty)
    }
    intercept[IllegalArgumentException] {
      graft.ext.Mix.sampleToDistribution(docs, "lang", "doc_id", Map("en" -> 1.5))
    }
  }

  test("mix sampling: duplicate ids rejected — the id semi-join would overshoot quotas") {
    // survivors resolve via left_semi on the id: a duplicated id returns
    // EVERY row sharing it, silently exceeding its group's quota — the
    // contract is a loud refusal, not a drifted sample
    val docs = Seq((1L, "en"), (1L, "en"), (2L, "en"), (3L, "en"),
      (10L, "es"), (11L, "es")).toDF("doc_id", "lang")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Mix.sampleToDistribution(docs, "lang", "doc_id",
        Map("en" -> 0.5, "es" -> 0.5))
    }
    assert(e.getMessage.contains("unique") && e.getMessage.contains("en"),
      e.getMessage)
  }

  test("mix sampling: weight group with zero corpus rows fails fast") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // "xx" never appears in the corpus: an inner-join formulation would
    // silently minimize T over the PRESENT groups and return a sample
    // whose proportions no longer match the target — the contract is to
    // refuse instead.
    val e = intercept[IllegalArgumentException] {
      graft.ext.Mix.sampleToDistribution(docs, "lang", "doc_id",
        Map("en" -> 0.4, "xx" -> 0.6)).count()
    }
    assert(e.getMessage.contains("xx"))
  }

  test("temperature weights: alpha=1 natural, alpha=0 uniform, low-resource rises") {
    import spark.implicits._
    val docs = (Seq.fill(90)("en") ++ Seq.fill(10)("sw")).zipWithIndex
      .map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "lang")
    val natural = graft.ext.Mix.temperatureWeights(docs, "lang", 1.0)
    assert(math.abs(natural("en") - 0.9) < 1e-12 &&
      math.abs(natural("sw") - 0.1) < 1e-12)
    val uniform = graft.ext.Mix.temperatureWeights(docs, "lang", 0.0)
    assert(math.abs(uniform("en") - 0.5) < 1e-12 &&
      math.abs(uniform("sw") - 0.5) < 1e-12)
    val mid = graft.ext.Mix.temperatureWeights(docs, "lang", 0.5)
    assert(mid("sw") > 0.1 && mid("sw") < 0.5, mid)
    assert(math.abs(mid.values.sum - 1.0) < 1e-12)
  }

  test("budget waterfill: saturated groups cap at capacity, rest share the rate, total = budget") {
    import spark.implicits._
    // capacities: a=100, b=1000, c=1000 tokens (1 token per row via lit)
    val docs = (Seq.fill(100)("a") ++ Seq.fill(1000)("b") ++ Seq.fill(1000)("c"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "g")
    val out = graft.ext.Mix.allocateBudget(docs, "g", lit(1L), budget = 1100,
      weights = Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(3), r.getBoolean(4))).toMap
    // a's fair share (0.5 * rate) exceeds its 100 tokens -> saturates;
    // rate = (1100 - 100) / 0.5 = 2000; b = c = 500
    assert(out("a") == ((100L, 100.0, true)), out)
    assert(out("b") == ((1000L, 500.0, false)), out)
    assert(out("c") == ((1000L, 500.0, false)), out)
    assert(math.abs(out.values.map(_._2).sum - 1100.0) < 1e-9)
  }

  test("budget waterfill: budget >= capacity saturates everyone; guards are loud") {
    import spark.implicits._
    val docs = (Seq.fill(10)("a") ++ Seq.fill(20)("b"))
      .zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("doc_id", "g")
    val all = graft.ext.Mix.allocateBudget(docs, "g", lit(1L), budget = 1000,
      weights = Map("a" -> 0.5, "b" -> 0.5))
      .collect().map(r => r.getString(0) -> (r.getDouble(3), r.getBoolean(4))).toMap
    assert(all == Map("a" -> ((10.0, true)), "b" -> ((20.0, true))), all)
    intercept[IllegalArgumentException] {
      graft.ext.Mix.allocateBudget(docs, "g", lit(1L), 10,
        Map("a" -> 0.5, "missing" -> 0.5))
    }
    intercept[IllegalArgumentException] {
      graft.ext.Mix.allocateBudget(docs, "g", lit(1L), 10, Map("a" -> 0.0))
    }
  }

  // ---- deterministic shuffle-shard -----------------------------------

  test("shuffle-shard: positions match the single-window reference at any partitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(concat(lit("epoch1:"), col("doc_id").cast("string"))),
        col("doc_id"))
    val want = docs.withColumn("pos", row_number().over(w) - 1)
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    Seq(docs, docs.repartition(3), docs.repartition(17)).foreach { d =>
      val got = graft.ext.Shuffle.shuffleShard(d, "doc_id", "epoch1", 8)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(g => g._1 -> g._3).toMap == want)
      assert(got.forall { case (_, shard, pos) => shard == pos % 8 })
    }
    // a different salt is a different epoch: the order must change
    val other = graft.ext.Shuffle.shuffleShard(docs, "doc_id", "epoch2", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(other != want, "salt did not reshuffle")
    // round-robin sharding: shard sizes within 1 of each other
    val sizes = graft.ext.Shuffle.shuffleShard(docs, "doc_id", "epoch1", 8)
      .groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length == 8 && sizes.max - sizes.min <= 1, sizes.toSeq)
  }

  test("shuffle-shard plan: no single-partition global sort") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val out = graft.ext.Shuffle.shuffleShard(docs, "doc_id", "epoch1", 8)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    // an empty-partitionBy window spec would be the one-task global sort
    assert(!plan.contains("windowspecdefinition(__k"), plan)
  }

  test("curriculum: stages are contiguous ascending-signal blocks at any partitioning") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sig = graft.ext.TextAnalysis.tokenCount(col("text")).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(sig, col("doc_id"))
    val want = docs.withColumn("pos", row_number().over(w) - 1)
      .select("doc_id", "pos").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val total = want.size.toLong
    Seq(docs, docs.repartition(13)).foreach { d =>
      val got = graft.ext.Curriculum.stageBySignal(d, "doc_id", sig, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(got.map(g => g._1 -> g._2).toMap == want)
      assert(got.forall { case (_, pos, st) => st == pos * 4 / total })
    }
    // stage boundaries respect the signal order: max signal of stage s
    // <= min signal of stage s+1
    val staged = graft.ext.Curriculum.stageBySignal(docs, "doc_id", sig, 4)
      .join(docs.select(col("doc_id"), sig.as("sig")), "doc_id")
    val bounds = staged.groupBy("stage")
      .agg(min("sig").as("lo"), max("sig").as("hi"))
      .orderBy("stage").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(bounds.length == 4)
    bounds.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi <= lo, bounds.toSeq)
      case _ =>
    }
  }

  test("curriculum plan: no single-partition global sort") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val sig = graft.ext.TextAnalysis.tokenCount(col("text")).cast("long")
    val out = graft.ext.Curriculum.stageBySignal(docs, "doc_id", sig, 4)
    val plan = out.queryExecution.optimizedPlan.toString
    assert(plan.contains("windowspecdefinition(__pid"), plan)
    assert(!plan.contains("windowspecdefinition(__k"), plan)
  }

  // ---- heavy hitters ------------------------------------------------

  test("heavy hitters: exact top-k with a skewed corpus (certificate path)") {
    // 40 "hot" docs of one token vs a long tail: the MG candidates
    // certainly contain the hot tokens and the certificate holds
    val docs = ((1 to 40).map(i => (i.toLong, "hot " * (50 - i % 3))) ++
      (100 to 300).map(i => (i.toLong, s"tail$i rare$i")))
      .toDF("doc_id", "text")
    val top = graft.ext.HeavyHitters.topTokens(docs, "text", 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exact = docs.select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t").asc)
      .limit(1).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(top.toSeq == exact.toSeq, s"got ${top.toSeq} want ${exact.toSeq}")
  }

  test("heavy hitters: FLAT corpus falls back and still returns the exact top-k") {
    // every token unique -> no frequency beats n/capacity; the
    // certificate fails and the fallback full aggregate must kick in
    val docs = (1 to 400).map(i => (i.toLong, s"u$i v$i")).toDF("doc_id", "text")
    val top = graft.ext.HeavyHitters.topTokens(docs, "text", 5, expand = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs.select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t").asc)
      .limit(5).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == exact, s"got $top want $exact")
  }

  test("heavy hitters: decrement evictions leaving < k candidates still return k exact rows") {
    // one partition, all-unique token stream sized so MG's decrement-all
    // step clears the summary on every 5th token (capacity k*expand = 4):
    // after 40 tokens the summary is empty, token 41 leaves ONE candidate.
    // A certificate that treated "< k candidates" as exact would silently
    // return 1 row; the true top-2 has 2 rows — the fallback must fire.
    val docs = Seq((1L, (1 to 41).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text").coalesce(1)
    val top = graft.ext.HeavyHitters.topTokens(docs, "text", 2, expand = 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val exact = docs.select(explode(graft.ext.TextAnalysis.tokens(col("text"))).as("t"))
      .groupBy("t").count().orderBy(col("count").desc, col("t").asc)
      .limit(2).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top.length == 2 && top == exact, s"got $top want $exact")
  }

  test("heavy hitters misra-gries: summary always contains every majority token") {
    val stream = Seq.fill(60)("a") ++ Seq.fill(30)("b") ++
      (1 to 40).map(i => s"x$i")
    val (cand, n) = graft.ext.HeavyHitters.misraGries(
      scala.util.Random.shuffle(stream).iterator, 8)
    assert(n == 130)
    // a (freq 60) and b (freq 30) both exceed n/(capacity+1) ~ 14.4
    assert(cand.contains("a") && cand.contains("b"), cand.toString)
    // and the summary is actually BOUNDED by the capacity — with the
    // boxed-Long regression (round 13) the eviction branch went dead
    // and every distinct token became a candidate
    assert(cand.size <= 8, s"summary must stay bounded: ${cand.size}")
    val (flood, _) = graft.ext.HeavyHitters.misraGries(
      (1 to 10000).iterator.map(i => s"u$i"), 8)
    assert(flood.size <= 8,
      s"10k distinct tokens through capacity 8: ${flood.size} counters")
  }

  // ---- decontamination ----------------------------------------------

  test("decontaminate: planted overlap flagged, clean + contaminated partition train") {
    val bench = Seq((100L, "the quick brown fox jumps over lazy dogs"))
      .toDF("doc_id", "text")
    val train = Seq(
      (1L, "totally unrelated content about spark engines here"),
      (2L, "he said the quick brown fox appeared at dawn"), // shares a 4-gram
      (3L, "quick brown dogs sleep"), // shares words but no 4-gram
      (4L, "tiny doc") // short-doc fallback: whole text, no benchmark match
    ).toDF("doc_id", "text")
    val flagged = graft.ext.Decontaminate
      .contaminatedIds(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(2L), s"flagged $flagged")
    val clean = graft.ext.Decontaminate
      .removeContaminated(train, bench, "doc_id", "text", n = 4)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(1L, 3L, 4L))
    // exact partition: clean and contaminated are disjoint and cover train
    assert((clean ++ flagged) == Set(1L, 2L, 3L, 4L) && (clean & flagged).isEmpty)
  }

  test("decontaminate: exact-gram mode agrees with hashed mode on real docs") {
    // same flagged set either way here (no 64-bit collisions in a small
    // corpus); `exact` exists for the trillion-gram regime where the
    // hashed join's conservative over-removal is not acceptable
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bench = docs.filter(col("doc_id") % 17 === 0)
      .select("doc_id", "text")
    val hashed = graft.ext.Decontaminate
      .contaminatedIds(docs, bench, "doc_id", "text", n = 5)
      .collect().map(_.getLong(0)).toSet
    val exact = graft.ext.Decontaminate
      .contaminatedIds(docs, bench, "doc_id", "text", n = 5, exact = true)
      .collect().map(_.getLong(0)).toSet
    assert(hashed == exact)
    assert(exact.nonEmpty) // the benchmark docs at least flag themselves
  }

  test("decontaminate: short benchmark doc matches only identical short docs") {
    // the short-doc fallback hashes the WHOLE token string, so a 2-token
    // benchmark doc flags an identical train doc but not a superset doc
    val bench = Seq((9L, "tiny doc")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "tiny doc"),
      (2L, "a tiny doc with more words around it")).toDF("doc_id", "text")
    val flagged = graft.ext.Decontaminate
      .contaminatedIds(train, bench, "doc_id", "text", n = 4)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L), s"flagged $flagged")
  }

  test("decontaminate by embedding: cosine neighbors flagged, scale-invariant") {
    // bench direction (1,0,0,0): train has an exact copy at a different
    // SCALE (cosine 1), a near-paraphrase (cos ~0.995), and an
    // orthogonal doc (cos 0) — threshold 0.9 flags the first two
    val bench = Seq(Tuple1(Array(1f, 0f, 0f, 0f))).toDF("vec")
    val train = Seq(
      (1L, Array(5f, 0f, 0f, 0f)),
      (2L, Array(1f, 0.1f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "vec")
    val flagged = graft.ext.Decontaminate
      .contaminatedIdsByEmbedding(train, bench, "vec_id", "vec", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 2L), s"flagged $flagged")
    val clean = graft.ext.Decontaminate
      .removeContaminatedByEmbedding(train, bench, "vec_id", "vec", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(3L))
  }

  test("decontaminate by embedding: zero-norm vectors can neither contaminate nor be flagged") {
    // a zero benchmark vector makes every cosine 0/0 = NaN, and Spark
    // orders NaN above all numbers — unguarded, the semi-join would
    // flag the WHOLE corpus (silent empty training set)
    val bench = Seq(
      Tuple1(Array(0f, 0f, 0f, 0f)), // failed-embed padding row
      Tuple1(Array(1f, 0f, 0f, 0f))).toDF("vec")
    val train = Seq(
      (1L, Array(1f, 0.05f, 0f, 0f)), // genuinely close to the real bench
      (2L, Array(0f, 1f, 0f, 0f)),    // orthogonal — must survive
      (3L, Array(0f, 0f, 0f, 0f))     // zero-norm train row — must survive
    ).toDF("vec_id", "vec")
    val flagged = graft.ext.Decontaminate
      .contaminatedIdsByEmbedding(train, bench, "vec_id", "vec", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L), s"flagged $flagged")
    val clean = graft.ext.Decontaminate
      .removeContaminatedByEmbedding(train, bench, "vec_id", "vec", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L), s"clean $clean")
  }

  test("decontaminate by embedding: NaN vectors can neither contaminate nor be flagged") {
    // NaN > 0 is TRUE under Spark's NaN-highest ordering, so a zero-only
    // norm guard passes a NaN-component vector through and its NaN
    // cosine >= threshold then flags EVERY training row — one failed
    // embed call in the benchmark would silently empty the corpus
    val bench = Seq(
      Tuple1(Array(Float.NaN, 0f, 0f, 0f)), // failed embed call
      Tuple1(Array(1f, 0f, 0f, 0f))).toDF("vec")
    val train = Seq(
      (1L, Array(1f, 0.05f, 0f, 0f)),      // close to the real bench row
      (2L, Array(0f, 1f, 0f, 0f)),         // orthogonal — must survive
      (3L, Array(0f, Float.NaN, 0f, 0f))   // NaN train row — must survive
    ).toDF("vec_id", "vec")
    val flagged = graft.ext.Decontaminate
      .contaminatedIdsByEmbedding(train, bench, "vec_id", "vec", 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L), s"flagged $flagged")
    val clean = graft.ext.Decontaminate
      .removeContaminatedByEmbedding(train, bench, "vec_id", "vec", 0.9)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L), s"clean $clean")
  }

  test("decontaminate by embedding: semi-join broadcast, corpus unshuffled") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val bench = emb.filter(col("vec_id") % 50 === 0).select("embedding")
    val plan = graft.ext.Decontaminate
      .contaminatedIdsByEmbedding(emb, bench, "vec_id", "embedding", 0.99)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") &&
      plan.contains("LeftSemi"),
      s"expected a broadcast nested-loop LEFT SEMI:\n$plan")
    // the only exchange is the benchmark's broadcast — the corpus side
    // must not be hash/range-partitioned to be checked
    assert(!plan.contains("Exchange hashpartitioning") &&
      !plan.contains("Exchange rangepartitioning"),
      s"corpus must not shuffle:\n$plan")
  }

  // ---- approximate aggregates vs exact (the 100 TB forms) -----------

  test("approx_percentile tracks exact percentile within its accuracy bound") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = df.agg(
      expr("percentile(l_extendedprice, 0.5)").as("exact"),
      expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx")).head()
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    // accuracy=1000 -> rank error <= n/1000; translate to a loose 5% value
    // tolerance for this distribution
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("mergeable HLL sketches: per-day sketches union to the whole-table answer") {
    // THE incremental-distinct pattern at 100 TB: store one tiny sketch
    // per partition/day, answer "distinct over any date range" by
    // unioning sketches — no rescan of history. Correctness claim:
    // union-of-parts == sketch-of-whole, and the estimate tracks exact.
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("d", dayofmonth(col("o_orderdate")))
    val perDay = df.groupBy("d")
      .agg(expr("hll_sketch_agg(o_custkey)").as("sk"))
    val unioned = perDay
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val whole = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))").as("est"))
      .head().getLong(0)
    val exact = df.select(countDistinct("o_custkey")).head().getLong(0)
    assert(unioned == whole,
      s"sketch union is not lossless vs one-shot: $unioned vs $whole")
    assert(math.abs(unioned - exact).toDouble / exact < 0.05,
      s"estimate $unioned vs exact $exact")
  }

  test("mergeable count-min sketches: per-day merge == whole-table, counts never under") {
    // the heavy-hitter companion to the HLL pattern: store one tiny CMS
    // per partition/day, answer "how often did key k appear over any
    // range" by merging sketches — no history rescan. Claims: (1) merge
    // of parts is LOSSLESS vs one-shot (same width/depth/seed), (2) CMS
    // error is one-sided — estimate >= true, <= true + eps*N.
    import org.apache.spark.util.sketch.CountMinSketch
    val df = Tables.orders(spark, "/root/testdata/sf0.001")
      .withColumn("d", dayofmonth(col("o_orderdate")))
    val cmsExpr = "count_min_sketch(o_custkey, 0.001d, 0.99d, 42)"
    val perDay = df.groupBy("d").agg(expr(cmsExpr).as("sk"))
      .collect().map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("sk")))
    val merged = perDay.reduce { (a, b) => a.mergeInPlace(b); a }
    val whole = CountMinSketch.readFrom(
      df.agg(expr(cmsExpr).as("sk")).head().getAs[Array[Byte]]("sk"))
    val n = df.count()
    val slack = math.ceil(0.001 * n).toLong
    val truth = df.groupBy("o_custkey").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), col("o_custkey")).limit(8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    truth.foreach { case (k, c) =>
      val est = merged.estimateCount(k)
      assert(est == whole.estimateCount(k),
        s"merge not lossless for key $k: $est vs ${whole.estimateCount(k)}")
      assert(est >= c && est <= c + slack,
        s"key $k: estimate $est outside [$c, ${c + slack}]")
    }
  }

  test("approx_count_distinct within documented 5% of exact") {
    val df = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val r = df.agg(
      countDistinct("l_partkey").as("exact"),
      approx_count_distinct("l_partkey", rsd = 0.05).as("approx")).head()
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx $approx vs exact $exact")
  }

  test("sampleWeighted: deterministic, partitioning-invariant, weight-sensitive") {
    import org.apache.spark.sql.functions._
    val df = (1L to 400L).map(i => (i, if (i <= 20) 1000.0 else 1.0))
      .toDF("id", "w")
    val a = graft.ext.Mix.sampleWeighted(df.repartition(1), "id", "w", 30)
      .select("id").as[Long].collect().toSet
    val b = graft.ext.Mix.sampleWeighted(df.repartition(13), "id", "w", 30)
      .select("id").as[Long].collect().toSet
    assert(a === b, "selection must not depend on partitioning")
    assert(a.size === 30)
    // the 20 heavy rows (1000x weight) should dominate the sample
    assert(a.count(_ <= 20L) >= 15, s"heavy rows under-sampled: $a")
  }

  test("sampleWeighted: non-positive weights fail loudly") {
    val df = Seq((1L, 2.0), (2L, 0.0)).toDF("id", "w")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Mix.sampleWeighted(df, "id", "w", 1)
    }
    assert(e.getMessage.contains("positive"))
  }

  test("mutualInformation: independence 0, identity = entropy, hand case") {
    import org.apache.spark.sql.functions._
    // independent uniform 2x2: MI = 0, H = ln 2 each
    val indep = Seq(("a","p"),("a","q"),("b","p"),("b","q"))
      .toDF("x","y")
    val r1 = graft.ops.Info.mutualInformation(indep, "x", "y").head
    assert(r1.getDouble(3) === 0.0)
    assert(math.abs(r1.getDouble(1) - math.log(2)) < 1e-6)
    assert(r1.getDouble(4) === 0.0) // nmi defined, zero
    // y == x: MI = H(X), NMI = 1
    val ident = Seq(("a","a"),("a","a"),("b","b"),("c","c"))
      .toDF("x","y")
    val r2 = graft.ops.Info.mutualInformation(ident, "x", "y").head
    assert(r2.getDouble(3) === r2.getDouble(1))
    assert(r2.getDouble(4) === 1.0)
    // constant column: zero entropy -> nmi null, mi 0
    val const = Seq(("a","p"),("a","q")).toDF("x","y")
    val r3 = graft.ops.Info.mutualInformation(const, "x", "y").head
    assert(r3.getDouble(3) === 0.0 && r3.isNullAt(4))
  }

  test("winsorize: exact fences clamp both tails, interior untouched") {
    import org.apache.spark.sql.functions._
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val w = graft.ops.Robust.winsorize(df, "v", 0.05, 0.95)
      .select("v", "winsorized").collect()
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // exact percentiles of 1..100: p05 = 5.95, p95 = 95.05
    assert(w(1.0) === 5.95 && w(3.0) === 5.95)
    assert(w(100.0) === 95.05 && w(99.0) === 95.05)
    assert(w(50.0) === 50.0)
  }

  test("iqrOutliers: hand case, sides labeled, clean data empty") {
    import org.apache.spark.sql.functions._
    val clean = (1 to 20).map(_.toDouble).toDF("v")
    assert(graft.ops.Robust.iqrOutliers(clean, "v").count() === 0)
    val spiked = ((1 to 20).map(_.toDouble) ++ Seq(1000.0, -1000.0)).toDF("v")
    val got = graft.ops.Robust.iqrOutliers(spiked, "v")
      .select("v", "side").collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(got === Map(1000.0 -> "high", -1000.0 -> "low"))
  }
}
