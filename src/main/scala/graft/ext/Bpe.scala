package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training and application — the tokenizer
  * half of a training-data pipeline (token budgets, packing, and vocab
  * coverage all assume a real subword tokenizer, not whitespace counts).
  *
  * Distributed shape follows how production BPE trainers actually work
  * (Sennrich et al., and every published implementation): the corpus
  * pass is ONE map-combinable word-count shuffle producing a BOUNDED
  * word histogram (`maxWords` most frequent words cover effectively all
  * token mass — Zipf), and the merge loop runs on the driver over that
  * histogram with incremental pair-count maintenance. The corpus is
  * never rescanned per merge: 100 TB of text is read once, the
  * O(maxWords·avgLen) histogram is the only driver state.
  *
  * Encoding is a scan-only `mapPartitions` with a per-partition
  * word->tokens memo (natural text repeats words heavily, so the memo
  * turns per-occurrence merge loops into hash lookups; the memo is
  * bounded by the partition's distinct-word count — cap partition sizes
  * via `maxPartitionBytes` as usual). No shuffle, no driver round-trip.
  */
object Bpe {

  /** End-of-word sentinel symbol (classic BPE): distinguishes "est" the
    * suffix from "est" mid-word, and makes detokenization lossless.
    */
  val EndOfWord = "</w>"

  private val WordRe = "[a-z0-9]+"

  /** Lowercased word stream of a text column (letters+digits runs). */
  def words(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(lower(text), lit(WordRe), lit(0))

  /** The bounded word histogram: one map-combinable shuffle, then the
    * deterministic top `maxWords` by (count desc, word asc).
    */
  def wordHistogram(df: DataFrame, textCol: String, maxWords: Int): DataFrame =
    df.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(maxWords)

  /** Train `numMerges` BPE merges from a (word, cnt) histogram.
    * Driver-side over the bounded histogram (the collect is the
    * documented O(maxWords) boundary); pair counts are maintained
    * incrementally — only words containing the merged pair are
    * re-scanned per iteration. Deterministic: ties break on the
    * lexicographically smallest pair.
    *
    * @return merges in rank order (rank = index)
    */
  def train(hist: DataFrame, numMerges: Int): Vector[(String, String)] = {
    val rows = hist.select(col("word"), col("cnt").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainLocal(rows.toSeq, numMerges)
  }

  private[graft] def trainLocal(
      hist: Seq[(String, Long)], numMerges: Int): Vector[(String, String)] = {
    val syms = hist.map { case (w, _) =>
      (w.map(_.toString) :+ EndOfWord).toArray
    }.toArray
    val cnts = hist.map(_._2).toArray

    val pairCnt = mutable.HashMap.empty[(String, String), Long]
    val pairWords = mutable.HashMap.empty[(String, String), mutable.BitSet]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val c = pairCnt.getOrElse(p, 0L) + sign * cnts(wi)
        if (c <= 0L) pairCnt.remove(p) else pairCnt(p) = c
        if (sign > 0)
          pairWords.getOrElseUpdate(p, mutable.BitSet.empty) += wi
        i += 1
      }
    }
    syms.indices.foreach(addWord(_, 1L))

    val merges = Vector.newBuilder[(String, String)]
    var made = 0
    while (made < numMerges && pairCnt.nonEmpty) {
      // deterministic argmax: highest count, then smallest pair
      var best: (String, String) = null
      var bestC = 0L
      pairCnt.foreach { case (p, c) =>
        if (c > bestC || (c == bestC && (best == null ||
            p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))) {
          best = p; bestC = c
        }
      }
      merges += best
      made += 1
      val joined = best._1 + best._2
      // only words that (still) contain the pair change
      val members = pairWords.remove(best).getOrElse(mutable.BitSet.empty)
      members.foreach { wi =>
        val s = syms(wi)
        var contains = false
        var i = 0
        while (!contains && i < s.length - 1) {
          contains = s(i) == best._1 && s(i + 1) == best._2; i += 1
        }
        if (contains) {
          addWord(wi, -1L)
          syms(wi) = mergeAll(s, best._1, best._2, joined)
          addWord(wi, 1L)
        }
      }
    }
    merges.result()
  }

  private def mergeAll(
      s: Array[String], a: String, b: String, joined: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i < s.length - 1 && s(i) == a && s(i + 1) == b) {
        out += joined; i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** Encode one word with trained merges: repeatedly apply the
    * lowest-rank applicable merge (all its occurrences, left to right) —
    * the standard BPE apply rule, so encoding matches training exactly
    * on training words.
    */
  def encodeWord(
      word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var s: Array[String] = (word.map(_.toString) :+ EndOfWord).toArray
    var done = false
    while (!done && s.length > 1) {
      var best: (String, String) = null
      var bestRank = Int.MaxValue
      var i = 0
      while (i < s.length - 1) {
        val r = ranks.getOrElse((s(i), s(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; best = (s(i), s(i + 1)) }
        i += 1
      }
      if (best == null) done = true
      else s = mergeAll(s, best._1, best._2, best._1 + best._2)
    }
    s.toVector
  }

  /** Per-document BPE token counts: scan-only mapPartitions with a
    * per-partition word->length memo; merges ride a broadcast. Output
    * (id, bpe_tokens, words).
    */
  def tokenCounts(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val bc = spark.sparkContext.broadcast(
      merges.zipWithIndex.toMap: Map[(String, String), Int])
    val wordRe = WordRe.r
    // Row-based mapPartitions so the id keeps its ORIGINAL type — a
    // cast("long") would null out string ids and crash the encoder
    val in = df.select(col(idCol), coalesce(col(textCol), lit("")).as("__text"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields.head,
      org.apache.spark.sql.types.StructField("bpe_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("words",
        org.apache.spark.sql.types.LongType, nullable = false)))
    in.mapPartitions { it =>
      val ranks = bc.value
      val memo = mutable.HashMap.empty[String, Int]
      it.map { row =>
        val text = row.getString(1)
        var toks = 0L
        var nWords = 0L
        wordRe.findAllIn(text.toLowerCase).foreach { w =>
          nWords += 1
          toks += memo.getOrElseUpdate(w, encodeWord(w, ranks).length)
        }
        org.apache.spark.sql.Row(row.get(0), toks, nWords)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(idCol, "bpe_tokens", "words")
  }
}
