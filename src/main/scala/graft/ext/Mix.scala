package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Training-mix sampling: draw the LARGEST corpus subset whose
  * group proportions exactly match a target distribution (language /
  * domain mixing ratios — the knob every pre-training data recipe
  * publishes). Deterministic: selection within a group is by md5 rank of
  * the id, so the same corpus and weights yield the same sample on any
  * engine, any partitioning, every run.
  *
  * Feasible total T = min over groups of floor(n_g / w_g); each group
  * keeps quota_g = floor(w_g * T) rows. Scale shape:
  *
  *  - ONE corpus aggregate: the per-group counts (O(groups) rows) are
  *    collected once and the absence check, T, and every quota derive
  *    from that driver-held array — never a second pass, never a
  *    re-aggregation (the counts are sample METADATA, like Packer's
  *    partition totals or the IVF centroid table).
  *  - The exact-quota selection is the Packer prefix-sum trick applied
  *    PER GROUP, not a `Window.partitionBy(group)` full sort: that
  *    window caps parallelism at #groups and hands a 40%-share group's
  *    entire sort to ONE task at 100 TB. Instead the (group, rank-key)
  *    projection range-repartitions so every partition holds a
  *    contiguous slice of the global (group, key) order, per-(partition,
  *    group) counts come back as O(partitions + groups) driver rows,
  *    and each partition ranks its own slice in parallel offset by its
  *    group's exclusive prefix. The checkpointed intermediate carries
  *    only (group, id, key) — survivors join back to the corpus by id.
  *
  * The selected set is a pure function of (corpus, weights) — identical
  * at any partition count (asserted in ExtOpsSpec) and restatable as
  * DuckDB's window form for the oracle (`ext_sample_mix`).
  */
object Mix {

  /** Temperature-scaled target distribution from the corpus itself:
    * p_g = n_g^alpha / sum(n^alpha) — the standard multilingual
    * rebalancing (alpha=1 keeps natural proportions, alpha=0 is
    * uniform, published recipes use ~0.3-0.7 to up-sample low-resource
    * groups without flattening entirely). One O(groups) aggregate; the
    * returned map feeds `sampleToDistribution`.
    */
  def temperatureWeights(
      df: DataFrame, groupCol: String, alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1]: $alpha")
    // sortBy group key: double summation order must not depend on the
    // nondeterministic collect order, or the weights (and every floor
    // boundary downstream) wobble by ULPs between runs
    val counts = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1)
    require(counts.nonEmpty, "temperatureWeights: empty corpus")
    val powed = counts.map { case (g, n) => g -> math.pow(n.toDouble, alpha) }
    val z = powed.map(_._2).sum
    powed.map { case (g, p) => g -> p / z }.toMap
  }

  /** @param weights target proportion per group value; groups absent
    *                from the map are excluded from the sample. Every
    *                weights key MUST have at least one corpus row —
    *                a missing group makes the only exact-proportion
    *                sample the EMPTY one (T=0), which is never what a
    *                mixing recipe means, so it fails fast instead of
    *                silently returning a sample with drifted shares.
    *                Intersect the map with the present groups first if
    *                partial coverage is intended.
    */
  def sampleToDistribution(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "sampleToDistribution needs target weights")
    require(weights.values.forall(w => w > 0 && w <= 1),
      s"weights must be in (0, 1]: $weights")
    val reserved = Set("__g", "__id", "__k", "__pid", "__rn", "__quota", "__prefix")
    require(!reserved(groupCol) && !reserved(idCol),
      s"column names ${reserved.mkString("/")} are reserved by sampleToDistribution")
    val spark = df.sparkSession
    import spark.implicits._

    // THE corpus aggregate — one job, O(groups) rows to the driver.
    // Everything downstream (absence check, T, quotas) is driver math on
    // this array; re-deriving any of it from the DataFrame would re-run
    // the corpus aggregation per use (it used to run 3x per call).
    // countDistinct rides the same job: the quota mechanism ranks IDS
    // and resolves survivors by semi-join, so a duplicated id would
    // return every row sharing it and silently overshoot its group's
    // quota — fail fast instead (Shuffle/Curriculum share the store
    // contract, so the guard protects all three).
    val rawCounts = df
      .filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(count(lit(1)).as("__n"), countDistinct(col(idCol)).as("__d"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dupGroups = rawCounts.collect { case (g, n, d) if n != d => s"$g ($n rows, $d ids)" }
    require(dupGroups.isEmpty,
      s"sampleToDistribution: '$idCol' must be unique and non-null per " +
        s"row — duplicate or null ids in group(s) " +
        s"${dupGroups.sorted.mkString(", ")} would exceed their quota via " +
        "the id semi-join (countDistinct ignores nulls); dedup the corpus " +
        "first")
    val counts: Map[String, Long] =
      rawCounts.map { case (g, n, _) => g -> n }.toMap
    val absent = weights.keySet -- counts.keySet
    require(absent.isEmpty,
      s"sampleToDistribution: weight groups absent from the corpus: " +
        s"${absent.toSeq.sorted.mkString(", ")} — the largest " +
        "exact-proportion sample would be empty (T=0); drop these keys " +
        "or fix the corpus")
    // same IEEE double arithmetic as the previous Column form (and the
    // DuckDB oracle): floor(n / w), then floor(w * T)
    val feasibleT = weights.map { case (g, w) =>
      math.floor(counts(g) / w).toLong
    }.min
    val quotas = weights.map { case (g, w) =>
      g -> math.floor(w * feasibleT).toLong
    }

    // ---- exact per-group top-quota by (md5(id), id) rank, distributed.
    // Partition i holds a contiguous slice of the global (group, key)
    // order; a group spanning partitions p..q ranks each slice locally
    // (window keyed by (__pid, __g): parallelism = partition count, not
    // group count) and offsets by the group's rows in partitions < pid.
    val parts = math.max(spark.sessionState.conf.numShufflePartitions, 1)
    val ranged = df
      .select(col(groupCol).cast("string").as("__g"), col(idCol).as("__id"))
      .join(broadcast(quotas.keys.toSeq.toDF("__g")), "__g")
      .withColumn("__k", md5(col("__id").cast("string")))
      .repartitionByRange(parts, col("__g"), col("__k"), col("__id"))
      .sortWithinPartitions("__g", "__k", "__id")
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false) // pid must be identical in both passes

    // O(partitions + groups) driver rows: each partition holds 1-2
    // groups' slices, so the cell census is metadata, not data
    val cells = ranged.groupBy("__pid", "__g").agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val prefixRows = cells.groupBy(_._2).toSeq.flatMap { case (g, gc) =>
      var acc = 0L
      gc.sortBy(_._1).map { case (pid, _, c) =>
        val row = (pid, g, acc); acc += c; row
      }
    }

    val w = Window.partitionBy("__pid", "__g").orderBy("__k", "__id")
    val keep = ranged
      .withColumn("__rn", row_number().over(w))
      .join(broadcast(prefixRows.toDF("__pid", "__g", "__prefix")),
        Seq("__pid", "__g"))
      .join(broadcast(quotas.toSeq.toDF("__g", "__quota")), Seq("__g"))
      .filter(col("__prefix") + col("__rn") <= col("__quota"))
      .select(col("__id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Deterministic WEIGHTED sample without replacement (Efraimidis–
    * Spirakis A-ES, the published one-pass reservoir recipe): each row
    * gets key ln(u)/w with u a hash-uniform of its id (md5, 60 bits →
    * (0,1]) and w its weight; the k LARGEST keys are a weighted sample
    * without replacement. No randomness, no seed — selection is a pure
    * function of (ids, weights, k), identical on any engine/partitioning,
    * which is what lets `ext_sample_weighted` hash-match DuckDB.
    *
    * Scale shape: one scan computing the key expression (codegen
    * arithmetic on md5 — no shuffle), then TakeOrderedAndProject for the
    * top-k (per-partition heaps, never a global sort). Rows with
    * non-positive or null weight are REJECTED loudly (ln(u)/w flips
    * sign and would silently win every slot).
    */
  /** Token-BUDGET allocation across groups — the "how many tokens of
    * each domain does this training run get" solve behind every mixing
    * recipe with a fixed compute budget: allocate `budget` tokens
    * proportionally to `weights` (e.g. [[temperatureWeights]]), but no
    * group above its available tokens; the shortfall of saturated
    * (fully-consumed) groups redistributes among the rest at a common
    * rate. Exact waterfill: with groups sorted by capacity/weight, the
    * unique rate r* satisfies sum(min(t_g, r*·w_g)) = budget — found by
    * the standard prefix walk (first k where the saturated set is
    * consistent), O(groups) driver math after ONE map-combinable
    * corpus aggregate (the temperatureWeights scale shape; token
    * counts stay exact longs).
    *
    * Returns one row per weighted group: (group, tokens_available,
    * weight, allocated, saturated) — `allocated/tokens_available` is
    * the group's epoch count; saturated groups train exactly one epoch.
    * budget >= total capacity degenerates to every group saturated
    * (nothing left to ration). Weight keys absent from the corpus fail
    * fast, the [[sampleToDistribution]] strictness.
    */
  def allocateBudget(
      df: DataFrame,
      groupCol: String,
      tokens: Column,
      budget: Long,
      weights: Map[String, Double]): DataFrame = {
    require(budget >= 0, s"allocateBudget: budget must be >= 0, got $budget")
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"allocateBudget: weights must be non-empty and strictly positive")
    val spark = df.sparkSession
    import spark.implicits._
    val caps = df.filter(col(groupCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(sum(tokens.cast("long")).as("__t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val absent = weights.keySet -- caps.keySet
    require(absent.isEmpty,
      s"allocateBudget: weight groups absent from the corpus: " +
        s"${absent.toSeq.sorted.mkString(", ")}")
    // everything below runs in ratio order (group name tie-break) — the
    // double prefix sums are SEQUENTIAL in that order, so an engine
    // restating the same walk reproduces them bit for bit
    val rows = weights.keys.toSeq.sorted
      .map(g => (g, caps(g), weights(g)))
      .sortBy { case (g, t, w) => (t / w, g) }
    val totalT = rows.map(_._2).sum
    val totW = rows.foldLeft(0.0)(_ + _._3)
    val rate: Double =
      if (budget >= totalT) Double.PositiveInfinity
      else {
        var k = 0
        var cumT = 0L
        var cumW = 0.0
        var r = 0.0
        var found = false
        while (!found && k < rows.length) {
          r = (budget - cumT) / (totW - cumW)
          val okLeft = k == 0 || rows(k - 1)._2 / rows(k - 1)._3 <= r
          val okRight = r <= rows(k)._2 / rows(k)._3
          if (okLeft && okRight) found = true
          else { cumT += rows(k)._2; cumW += rows(k)._3; k += 1 }
        }
        require(found, "allocateBudget: no consistent waterfill prefix — " +
          "unreachable for budget < total capacity")
        r
      }
    val out = rows.map { case (g, t, w) =>
      val a = if (t / w <= rate) t.toDouble else rate * w
      (g, t, w, a, t / w <= rate)
    }
    spark.createDataFrame(out.sortBy(_._1))
      .toDF(groupCol, "tokens_available", "weight", "allocated", "saturated")
  }

  def sampleWeighted(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"sampleWeighted: k must be >= 1, got $k")
    val bad = df.filter(col(weightCol).isNull || col(weightCol) <= 0).count()
    require(bad == 0,
      s"sampleWeighted: $bad rows carry null/non-positive '$weightCol' — " +
        "weights must be strictly positive (filter or floor them first)")
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("double") + 1.0) / math.pow(2.0, 60)
    df.withColumn("__aes_key", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__aes_key").desc, col(idCol).asc)
      .limit(k)
      .drop("__aes_key")
  }
}
