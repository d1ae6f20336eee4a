package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] TF-IDF keyword extraction (SURVEY §2.11 text analysis): the
  * standard corpus-statistics weighting for search/curation pipelines —
  * which terms characterize each document against the whole corpus.
  *
  * Scale shape (the 100 TB plan):
  *  - term-frequency: one shuffle on (doc, term), map-side combinable;
  *  - document-frequency: derived FROM the tf aggregate (each tf row is
  *    one distinct (doc, term)), so no second pass over raw text;
  *  - the df table is vocabulary-sized — orders of magnitude smaller than
  *    the corpus — and is broadcast, as is the single-row corpus count;
  *  - top-k per doc: row_number window over the doc partition. Two
  *    shuffles total ((doc,term) then doc); no driver collects.
  */
object Tfidf {

  /** Top-k terms per document by tf·idf with idf = ln(N/df).
    * Deterministic: ties broken by term; output keyed (id, rn).
    */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val terms = docs
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .filter(length(col("term")) > 0)
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"), col("rn"))
  }
}
