package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance FUZZY SELF-JOIN without the cross product: all pairs
  * (a, b), a < b by id, with levenshtein(a, b) <= maxDist — the entity-
  * resolution / near-identical-name primitive (supplier dedup, crawl
  * title matching).
  *
  * Blocking (the 100 TB posture — a naive form is O(n²) rows through
  * one executor):
  *
  *  - LENGTH BAND, lossless: lev(a,b) <= d forces ||a|−|b|| <= d.
  *  - SHARED Q-GRAM, lossless above a minimum length: d edits destroy
  *    at most q·d of a string's (|s|−q+1) q-grams, so strings with
  *    |s| >= q·(d+1) + q − 1 within distance d still share at least one
  *    q-gram — candidates join on an exploded gram key, never
  *    all-pairs. Strings SHORTER than the bound fall back to one shared
  *    "__short" block (tiny by definition: the length band caps the
  *    partner set over a bounded short-string universe).
  *  - Exact verify: `levenshtein` (codegen'd built-in) on the distinct
  *    candidate pairs; blocking only bounds WHAT verifies, never what
  *    qualifies — asserted against the brute-force join in
  *    FuzzyJoinSpec.
  */
object FuzzyJoin {

  def selfJoin(
      df: DataFrame,
      idCol: String,
      strCol: String,
      maxDist: Int,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    require(q >= 1, s"q must be >= 1, got $q")
    val minLen = q * (maxDist + 1) + q - 1
    def keyed(side: String) = df
      .select(col(idCol).as(s"${side}_id"), col(strCol).as(s"${side}_s"))
      .filter(col(s"${side}_s").isNotNull)
      .withColumn(s"${side}_len", length(col(s"${side}_s")))
      .withColumn("__key", explode(
        when(col(s"${side}_len") >= minLen,
          expr(s"array_distinct(transform(" +
            s"sequence(1, ${side}_len - ${q - 1}), " +
            s"i -> substring(${side}_s, i, $q)))"))
          .otherwise(array(lit("__short")))))
    val a = keyed("a")
    val b = keyed("b")
    a.join(b,
        a("__key") === b("__key") &&
          col("a_id") < col("b_id") &&
          abs(col("a_len") - col("b_len")) <= maxDist)
      .select("a_id", "b_id", "a_s", "b_s")
      .distinct()
      .filter(levenshtein(col("a_s"), col("b_s")) <= maxDist)
      .select(col("a_id").as("id_a"), col("b_id").as("id_b"),
        levenshtein(col("a_s"), col("b_s")).cast("long").as("dist"))
  }
}
