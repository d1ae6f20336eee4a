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

  test("tpch q3/q10 broadcast every dim and top-k without a global sort") {
    for (q <- Seq("tpch_q3_shipping_priority", "tpch_q10_returned")) {
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q: dims not broadcast:\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q: fact-side shuffle join crept in")
      assert(p.contains("TakeOrderedAndProject"), s"$q: top-k global-sorted")
      assert(p.contains("partial_sum"), s"$q: no map-side partial aggregation")
    }
    // the segment filter reaches the customer scan as a pushed filter
    assert(plan("tpch_q3_shipping_priority").contains("EqualTo(c_mktsegment,BUILDING)"),
      "q3 segment filter not pushed to the dim scan")
  }

  test("LOO target encoding: no Window over the fact, groupBy + broadcast join") {
    // the r8-weak shape was Window.partitionBy(cat) over the raw fact —
    // parallelism capped at category cardinality (3 on l_returnflag).
    // The fixed shape: O(categories) HashAggregate broadcast-joined back.
    val p = plan("encode_target_loo")
    assert(!p.contains("Window"), s"fact-sized window crept back in:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"stats join not broadcast:\n$p")
    assert(p.contains("partial_sum"), s"category stats not map-side combined:\n$p")
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

  private def extPlan(name: String): String =
    graft.queries.ExtQueries.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString

  test("native simhash/minhash signatures plan map-side with ZERO exchanges") {
    // the near-dup pipelines checkpoint their signature stage, which hides
    // it from their executed plans — assert the claim on the stage itself:
    // one select, native expression, no Exchange anywhere.
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, dir)
    val toks = transform(graft.ext.TextAnalysis.tokens(col("text")), t => xxhash64(t))
    val sim = docs.select(call_function("graft_simhash", toks).as("sh"))
      .queryExecution.executedPlan.toString
    assert(sim.contains("graft_simhash") && !sim.contains("Exchange"),
      s"simhash signature not a pure map stage:\n$sim")
    val mh = docs.select(call_function("graft_minhash",
        array_distinct(toks), lit(32)).as("sig"))
      .queryExecution.executedPlan.toString
    assert(mh.contains("graft_minhash") && !mh.contains("Exchange"),
      s"minhash signature not a pure map stage:\n$mh")
  }

  test("image dHash signature plans map-side with ZERO exchanges, codegen on") {
    // the 144 byte-extractions + 64 comparisons must all live in one
    // whole-stage-codegen'd projection along the scan — any Exchange or
    // codegen fallback here multiplies the cost of every image pipeline
    import org.apache.spark.sql.functions._
    val media = graft.ext.Multimodal.mediaTable(Tables.documents(spark, dir))
    val p = media.select(col("doc_id"),
        graft.ext.Multimodal.dHash(col("media"), col("width"), col("height"))
          .as("sh"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"dHash signature not a pure map stage:\n$p")
    assert(p.contains("*("), s"dHash projection fell out of codegen:\n$p")
  }

  test("simhash near-dup pipeline carries no explode-aggregate shuffle") {
    // the fallback's 64 per-bit sum-aggregates would appear as partial_sum
    // over exploded token rows; the native path has none anywhere
    val p = extPlan("ext_simhash_neardup")
    assert(!p.contains("partial_sum"), s"explode-agg fallback in plan:\n$p")
  }

  test("ivf probe reads the persisted index, not the parquet corpus") {
    val q = graft.ext.Similarity // force index build through the query path
    graft.queries.ExtQueries.buildIndexes(spark, dir)
    val p = extPlan("ext_ivf_topk")
    assert(p.contains("InMemoryTableScan"), s"probe bypasses the index:\n$p")
    assert(p.contains("centroid_id"), "probe does not prune by cluster")
  }

  test("durable ivf probe prunes partitions: PartitionFilters on centroid_id") {
    graft.queries.ExtQueries.buildIndexes(spark, dir)
    val p = extPlan("ext_ivf_topk_persisted")
    // the cluster selection must reach the scan as a PARTITION filter
    // (directory pruning), not a post-scan data filter
    assert(p.contains("PartitionFilters: [centroid_id"),
      s"probe scans the whole artifact instead of pruning directories:\n$p")
    // and only the probed directories' files are read: the scan's
    // partition count equals nProbe clusters, not nCentroids
    val scanned = graft.queries.ExtQueries.queries("ext_ivf_topk_persisted")(spark, dir)
    assert(scanned.count() == 10)
  }

  test("win_lag_lead: all five window functions share ONE shuffle and ONE Window node") {
    val p = plan("win_lag_lead")
    def cnt(sub: String) = p.sliding(sub.length).count(_ == sub)
    assert(cnt("Exchange hashpartitioning") == 1,
      s"window family should reuse a single partitioning:\n$p")
    assert(cnt("Window [") <= 1, s"window functions not collapsed into one node:\n$p")
  }

  test("full outer join plans as a join, not a union-rebuild") {
    val p = plan("join_full_outer")
    assert(p.contains("FullOuter"), s"no FullOuter join operator:\n$p")
  }

  test("argminmax and percentiles aggregate with map-side partials, one exchange") {
    for (q <- Seq("agg_argminmax", "agg_percentiles")) {
      val p = plan(q)
      assert(p.sliding("Exchange hashpartitioning".length)
        .count(_ == "Exchange hashpartitioning") == 1, s"$q: extra shuffle:\n$p")
      assert(p.contains("partial_"), s"$q: no map-side partial aggregation:\n$p")
    }
  }

  test("pii redaction and quantization are pure map stages (no hash shuffle)") {
    for (q <- Seq("ext_pii_redact", "ext_embed_quantize")) {
      val p = extPlan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q: row-local operator acquired a shuffle:\n$p")
    }
  }

  test("animation surface decodes in one map; landmark dedup shuffles hash keys only") {
    // animTable: one MapPartitions decode — no hash shuffle anywhere
    // (the gate's presentation sort range-partitions, which is fine)
    val t = extPlan("ext_image_anim")
    assert(t.contains("MapPartitions"), s"decode map missing:\n$t")
    assert(!t.contains("Exchange hashpartitioning"),
      s"the animation decode acquired a shuffle:\n$t")
    // animDups: the pair search groups 64-bit frame hashes with
    // map-side partials and is NEVER all-pairs — what shuffles is the
    // (doc_id, fp) key frame, not media bytes
    val p = extPlan("ext_image_anim_pairs")
    assert(p.contains("partial_collect_list") && p.contains("partial_count"),
      s"bucket aggregation lost its map-side partials:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoop"),
      s"pair search must never be all-pairs:\n$p")
  }

  test("tfidf reuses the tf shuffle at runtime (one pass over text)") {
    // the tf aggregate feeds both the scoring join and the df aggregate;
    // AQE must dedupe the identical shuffle stages, otherwise the corpus
    // is tokenized twice — the dominant cost at 100 TB. Reuse only shows
    // in the FINAL adaptive plan, so execute first.
    val df = graft.queries.ExtQueries.queries("ext_tfidf_topterms")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage"),
      s"tf shuffle not reused — corpus scanned twice:\n$p")
  }

  test("q18 aggregates the fact BEFORE joining; no hint pins the build side") {
    val p = plan("tpch_q18_large_orders")
    // partial->final aggregate of lineitem feeds the join, never the
    // other way round (the anti-shape multiplies rows pre-aggregate)
    assert(p.contains("partial_sum"), s"no map-side partial agg:\n$p")
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && aggIdx > joinIdx,
      s"aggregate does not feed the join (agg@$aggIdx join@$joinIdx)")
    assert(p.contains("TakeOrderedAndProject"), "top-k global-sorted")
  }

  test("q21 self-joins stay semi/anti — no nested loop, no row multiplication") {
    val p = plan("tpch_q21_waiting_supplier")
    assert(p.contains("LeftSemi"), s"EXISTS did not plan as left-semi:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS did not plan as left-anti:\n$p")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi self-join degenerated to a nested loop:\n$p")
  }

  test("psi drift is one unioned aggregation into O(bins) groups") {
    val p = plan("drift_psi_price")
    // both sides scan lineitem with their shipdate filter pushed down;
    // the union aggregates once (partial+final), then window math runs
    // over the O(bins) result
    assert(p.contains("partial_count"), s"no map-side partials:\n$p")
    val scans = "Scan parquet".r.findAllIn(p).length
    assert(scans == 2, s"expected 2 fact scans (ref+cur sides), got $scans")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      "shipdate split not pushed to the scans")
  }

  test("audio provenance/coverage/census gates: one map stage, no hash shuffle") {
    // the r13/r14 audio surface: provenance rows, the MP3 coverage
    // measurement and the HEIF geometry census are per-row container
    // walks — any Exchange hashpartitioning here means a decode map
    // acquired a shuffle (presentation orderBy range-partitions, fine)
    for (q <- Seq("ext_audio_tags", "ext_audio_mp3_coverage",
        "ext_image_heif_meta",
        // r14: subtitle/PDF extraction rows are the same per-row
        // container-walk class — cues/pages explode inside the map
        "ext_video_subtitles", "ext_pdf_text", "ext_pdf_info",
        // r15: HTML, DOCX/EPUB, RTF, email and WARC extraction —
        // same class
        "ext_html_text", "ext_office_text", "ext_rtf_text",
        "ext_email_text", "ext_warc_docs", "ext_tar_docs",
        "ext_xml_text", "ext_image_pngtext", "ext_audio_lyrics",
        "ext_zip_docs", "ext_html_meta", "ext_audio_synced_lyrics",
        "ext_sitemap_urls")) {
      val p = extPlan(q)
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q: row-local walk acquired a hash shuffle:\n$p")
    }
    // the codec-boundary pair gates: fingerprint buckets keep their
    // map-side combine and the pair search is never all-pairs
    for (q <- Seq("ext_audio_mp3_pairs", "ext_audio_vorbis_pairs")) {
      val p = extPlan(q)
      assert(p.contains("partial_"),
        s"$q: fingerprint buckets lost map-side combine:\n$p")
      assert(!p.contains("CartesianProduct") &&
        !p.contains("BroadcastNestedLoop"),
        s"$q: pair search degenerated to all-pairs:\n$p")
    }
  }

  test("cover-pair join carries no forced broadcast of a caller-supplied frame") {
    // the r13-weak shape: broadcast(img) pinned an UNBOUNDED caller
    // frame as the build side — an OOM at corpus scale. The join must
    // stay hint-free so AQE picks broadcast only when the hashed side
    // is actually small at runtime.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = graft.queries.ExtQueries.queries("ext_audio_cover_pairs")(spark, dir)
    val hints = df.queryExecution.analyzed.collect { case h: ResolvedHint => h }
    assert(hints.isEmpty,
      s"unconditional join-side hint crept back in:\n${df.queryExecution.analyzed}")
  }

  test("cumulative ops (KS / AUC / triplet rotation) carry NO unpartitioned window") {
    // the r13-weak shape: Window.orderBy with no partitionBy over a
    // distinct-value-sized frame — single-partition by construction,
    // data-scale on continuous inputs. All three now run the PrefixSum
    // discipline (range-partition → subtotals → broadcast prefix →
    // partition-local window), so every Window node left in the plan
    // must carry a partition spec. Checked on the logical plan: the
    // physical WindowExec inherits its partitioning 1:1, and AQE
    // wrapping can't hide nodes there.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LogicalWindow}
    // drift_chi2_priority / ext_mutual_info joined the list in r15:
    // their grand totals moved from a whole-frame window to the
    // agg-and-broadcast idiom, so a caller misfeeding a continuous
    // column degrades to a distributed aggregate, never a
    // single-partition sort (the marginal windows that remain in
    // ext_mutual_info are partitioned by x / by y).
    val dfs = Seq(
      "drift_ks_price" -> ParityQueries.queries("drift_ks_price")(spark, dir),
      "drift_chi2_priority" ->
        ParityQueries.queries("drift_chi2_priority")(spark, dir),
      "ext_eval_auc" ->
        graft.queries.ExtQueries.queries("ext_eval_auc")(spark, dir),
      "ext_mutual_info" ->
        graft.queries.ExtQueries.queries("ext_mutual_info")(spark, dir),
      "ext_triplets" ->
        graft.queries.ExtQueries.queries("ext_triplets")(spark, dir))
    for ((name, df) <- dfs) {
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: LogicalWindow if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"$name: unpartitioned Window crept back in:\n${df.queryExecution.optimizedPlan}")
    }
  }

  test("r8 tpch shapes: dims broadcast, semis stay semi, no cartesian") {
    // every new shape must keep the fact side shuffle-free of dim joins
    // and never degenerate to a nested-loop/cartesian product
    for (q <- Seq("tpch_q2_min_cost_supplier", "tpch_q9_profit",
        "tpch_q11_important_stock", "tpch_q15_top_supplier",
        "tpch_q16_supplier_cnt", "tpch_q17_small_quantity",
        "tpch_q20_dominant_supplier", "tpch_q4_priority_late",
        "tpch_q12_late_priority", "tpch_q13_order_distribution")) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q: cartesian product:\n$p")
      assert(p.contains("partial_"), s"$q: no map-side partial aggregation")
    }
    // q4's EXISTS is a single LEFT SEMI carrying the non-equi date
    // predicate — never a row-multiplying inner join + distinct
    val q4 = plan("tpch_q4_priority_late")
    assert(q4.contains("LeftSemi"), s"q4 lost the semi join:\n$q4")
    // q16's exclusion is an ANTI join against the broadcast flagged set
    val q16 = plan("tpch_q16_supplier_cnt")
    assert(q16.contains("LeftAnti, BuildRight"), s"q16 anti shape:\n$q16")
    // q15/q11's global scalar threshold broadcasts (1-row build side),
    // never a driver round-trip or a shuffle join
    for (q <- Seq("tpch_q15_top_supplier", "tpch_q11_important_stock")) {
      val p = plan(q)
      assert(p.contains("BroadcastNestedLoopJoin") ||
        p.contains("BroadcastHashJoin"), s"$q: scalar threshold not broadcast")
    }
    // q2/q9 dim joins broadcast; the fact is never sort-merge-joined
    // against a dim (q2's min-per-part join back is agg-sized, exempt)
    val q9 = plan("tpch_q9_profit")
    assert(q9.contains("BroadcastHashJoin") && !q9.contains("SortMergeJoin"),
      s"q9 dims not broadcast:\n$q9")
  }
}
