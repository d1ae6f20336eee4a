package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY's scale posture:
  * "repartition/bucketing for co-located joins"). Writing both sides of a
  * recurring join bucketed (and sorted) by the join key lets every
  * subsequent join plan as a SortMergeJoin with NO Exchange on either
  * side — at 100 TB that converts the nightly fact-to-fact join from a
  * full-cluster shuffle into local merges. Asserted in BucketingSpec by
  * the absence of Exchange operators in the physical plan.
  */
object Bucketing {

  /** Write `df` as an external bucketed+sorted table at `path`. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      buckets: Int,
      key: String): Unit =
    df.write
      .mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key. The caller is
    * responsible for both tables having the SAME bucket count — Spark
    * otherwise shuffles the smaller-bucketed side.
    */
  def bucketedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable),
      spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}
