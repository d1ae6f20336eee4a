package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Theta

/** [EXT] Cross-corpus overlap estimation via theta sketches: how many
  * distinct keys (texts, tokens, shingle hashes, URLs) do two corpora
  * share — WITHOUT joining them. The question behind contamination
  * audits ("does my train split share content with that other crawl?"),
  * source-mix diagnostics (shared vocabulary between language/domain
  * slices), and dedup planning (expected cross-corpus collision rate
  * before paying for the full near-dup pass).
  *
  * At 100 TB the join-based answer shuffles both corpora; this folds
  * each corpus to ONE O(k) sketch (map-side live-union aggregation,
  * `functions.Theta`) and answers every pairwise |A∩B| / |A∪B| /
  * Jaccard as driver math over sketch bytes. Below the sketch capacity
  * the counts are EXACT (the KMV retained set is complete), so the
  * operator carries a DuckDB oracle at test scale; past capacity it
  * degrades to the published ±1.6%@k=4096 bound with the SAME code
  * path — the caller chooses the regime with `nominal`.
  */
object CorpusOverlap {

  /** Two-corpus overlap. `exact` reports whether BOTH sketches stayed
    * below capacity (counts are true distincts, not estimates).
    */
  final case class Overlap(
      distinctA: Double, distinctB: Double,
      intersection: Double, union: Double,
      jaccard: Double, exact: Boolean)

  def overlap(
      dfA: DataFrame, dfB: DataFrame, keyCol: String,
      nominal: Int = Theta.DefaultNominal): Overlap = {
    val Seq(a, b) = Seq(dfA, dfB).map(_
      .agg(Theta.sketchAgg(col(keyCol), nominal).as("sk"))
      .head().getAs[Array[Byte]](0))
    val inter = Theta.intersectionEstimate(a, b, nominal)
    val uni = Theta.unionEstimate(a, b, nominal)
    Overlap(
      Theta.estimate(a), Theta.estimate(b), inter, uni,
      if (uni == 0) 0d else inter / uni,
      exact = !Theta.deserialize(a).isEstimationMode &&
        !Theta.deserialize(b).isEstimationMode)
  }

  /** Pairwise overlap between every pair of groups in one corpus: ONE
    * grouped sketch aggregation (one corpus scan, O(groups·k) driver
    * bytes), then all group-pair set algebra on the driver. Returns
    * (group_a, group_b, distinct_a, distinct_b, distinct_shared,
    * jaccard) for pairs with a non-empty intersection, group_a <
    * group_b, ordered. Counts are exact below sketch capacity —
    * integral by construction, surfaced as longs.
    */
  def overlapByGroup(
      df: DataFrame, groupCol: String, keyCol: String,
      nominal: Int = Theta.DefaultNominal): DataFrame = {
    val spark = df.sparkSession
    val sketches = df
      .filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"))
      .agg(Theta.sketchAgg(col(keyCol), nominal).as("sk"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1))
      .sortBy(_._1)
    val rows = for {
      i <- sketches.indices
      j <- (i + 1) until sketches.length
      (ga, a) = sketches(i)
      (gb, b) = sketches(j)
      inter = Theta.intersectionEstimate(a, b, nominal)
      if inter > 0
    } yield {
      val (na, nb) = (Theta.estimate(a), Theta.estimate(b))
      Row(ga, gb, math.rint(na).toLong, math.rint(nb).toLong,
        math.rint(inter).toLong,
        BigDecimal(inter / (na + nb - inter))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("group_a", StringType),
        StructField("group_b", StringType),
        StructField("distinct_a", LongType),
        StructField("distinct_b", LongType),
        StructField("distinct_shared", LongType),
        StructField("jaccard", DoubleType))))
  }
}
