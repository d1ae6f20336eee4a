package graft.ext

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-language-model subword tokenizer (the SentencePiece unigram
  * method, Kudo 2018) — the second tokenizer family next to [[Bpe]]:
  * where BPE GROWS a vocabulary bottom-up by merging, the unigram model
  * SHRINKS a large seed vocabulary top-down, keeping the pieces that
  * maximize corpus likelihood under a unigram prior. The two families
  * segment differently (unigram favors globally-likely long pieces;
  * BPE is greedy by merge rank), and training-data pipelines routinely
  * need both.
  *
  * Distributed shape — identical to BPE's, and for the same reason:
  * the corpus pass is ONE map-combinable word-histogram shuffle
  * (`Bpe.wordHistogram`, shared); training runs on the driver over the
  * bounded histogram (Zipf: `maxWords` words carry effectively all
  * token mass), so 100 TB of text is read once and O(maxWords·avgLen)
  * substring state is the only driver memory. Encoding is scan-only
  * `mapPartitions` with a broadcast model and per-partition word memo —
  * no shuffle, no driver round-trip.
  *
  * Training = hard (Viterbi) EM with iterative pruning, the documented
  * deterministic variant of SentencePiece's soft-EM:
  *
  *  1. Seed: every substring of histogram words up to `maxPieceLen`,
  *     scored by occurrence·length; keep the `seedSize` best plus ALL
  *     single characters (totality — any word must segment).
  *  2. E-step: Viterbi-segment each histogram word under current piece
  *     log-probs; count piece usage weighted by word count.
  *     M-step: re-normalize probs from usage; multi-char pieces with
  *     zero usage drop (they can never win a segmentation again).
  *  3. Prune: keep single chars plus the best multi-char pieces by
  *     prob (ties → lexicographic), shrinking by `shrink` per round
  *     until `vocabSize` is reached; finish with one more EM pass.
  *
  * Every argmax and sort carries an explicit deterministic tie-break,
  * so train → encode is bit-reproducible across runs and JVMs (the
  * BpeSpec discipline; asserted in UnigramLmSpec).
  */
object UnigramLm {

  /** Trained model: piece → log-prob. `unkLogProb` scores characters
    * never seen in training (encode stays total on any input).
    */
  final case class Model(pieces: Map[String, Double], unkLogProb: Double)
      extends Serializable

  /** Train from a (word, cnt) histogram DataFrame (the
    * `Bpe.wordHistogram` output — the collect is the documented
    * O(maxWords) driver boundary, same as BPE's).
    */
  def train(
      hist: DataFrame,
      vocabSize: Int,
      maxPieceLen: Int = 8,
      seedSize: Int = 4000,
      emIters: Int = 2,
      shrink: Double = 0.75): Model = {
    val rows = hist.select(col("word"), col("cnt").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainLocal(rows.toSeq, vocabSize, maxPieceLen, seedSize, emIters, shrink)
  }

  private[graft] def trainLocal(
      hist: Seq[(String, Long)],
      vocabSize: Int,
      maxPieceLen: Int = 8,
      seedSize: Int = 4000,
      emIters: Int = 2,
      shrink: Double = 0.75): Model = {
    require(vocabSize > 0 && seedSize > 0 && shrink > 0 && shrink < 1)

    // ---- 1. seed vocabulary --------------------------------------------
    val subCnt = mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val maxL = math.min(maxPieceLen, w.length - i)
        while (l <= maxL) {
          val p = w.substring(i, i + l)
          subCnt(p) = subCnt.getOrElse(p, 0L) + c
          l += 1
        }
        i += 1
      }
    }
    val chars = subCnt.keysIterator.filter(_.length == 1).toSeq.sorted
    // multi-char seeds by occurrence·length (a long frequent piece saves
    // more tokens than a short one at equal count), deterministic ties
    val multis = subCnt.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c * p.length, p) }
      .take(seedSize)
    // initial probs proportional to the seed scores
    var probs = mutable.HashMap.empty[String, Double]
    val init = chars.map(ch => (ch, subCnt(ch))) ++
      multis.map { case (p, c) => (p, c * p.length) }
    val initTotal = init.iterator.map(_._2.toDouble).sum
    init.foreach { case (p, s) => probs(p) = math.log(s / initTotal) }

    // ---- Viterbi under current probs -----------------------------------
    def segment(w: String): Vector[String] = viterbi(w, probs, maxPieceLen,
      unkOf(probs))

    def emPass(): Unit = {
      val usage = mutable.HashMap.empty[String, Double]
      hist.foreach { case (w, c) =>
        segment(w).foreach { p =>
          usage(p) = usage.getOrElse(p, 0.0) + c.toDouble
        }
      }
      // chars keep a floor usage so segmentation stays total even when
      // every occurrence is absorbed into longer pieces
      chars.foreach { ch => usage(ch) = usage.getOrElse(ch, 0.0) + 0.5 }
      val total = usage.valuesIterator.sum
      val next = mutable.HashMap.empty[String, Double]
      usage.foreach { case (p, u) =>
        if (probs.contains(p)) next(p) = math.log(u / total)
      }
      probs = next // multi-char pieces with zero usage drop here
    }

    // ---- 2./3. EM + prune loop -----------------------------------------
    var guard = 0
    while (probs.size > vocabSize && guard < 100) {
      guard += 1
      var it = 0
      while (it < emIters) { emPass(); it += 1 }
      val multiNow = probs.iterator.filter(_._1.length > 1).toSeq
        .sortBy { case (p, lp) => (-lp, p) }
      val keepMulti = math.max(vocabSize - chars.size,
        math.min(multiNow.size,
          (multiNow.size * shrink).toInt))
      val kept = multiNow.take(keepMulti).map(_._1).toSet
      val pruned = mutable.HashMap.empty[String, Double]
      probs.foreach { case (p, lp) =>
        if (p.length == 1 || kept(p)) pruned(p) = lp
      }
      probs = pruned
      if (keepMulti == multiNow.size && probs.size > vocabSize) {
        // cannot shrink further (all that remains is single chars)
        guard = 100
      }
    }
    emPass() // final re-estimate over the settled vocabulary
    Model(probs.toMap, unkOf(probs))
  }

  /** Unknown-character score: decisively below every real piece, so an
    * unseen char never outbids a known segmentation but still lets any
    * input encode.
    */
  private def unkOf(probs: mutable.HashMap[String, Double]): Double =
    (if (probs.isEmpty) 0.0 else probs.valuesIterator.min) - 10.0

  /** Viterbi best segmentation of `w`: dp over end positions maximizing
    * summed log-prob. Deterministic ties: candidate starts are tried in
    * ascending order with a strict improvement test, so the EARLIEST
    * start (longest final piece) wins equal scores.
    */
  private def viterbi(
      w: String,
      probs: mutable.HashMap[String, Double],
      maxPieceLen: Int,
      unk: Double): Vector[String] = {
    val n = w.length
    if (n == 0) return Vector.empty
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = new Array[Int](n + 1)
    score(0) = 0.0
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        val lp =
          if (j - i == 1)
            probs.getOrElse(w.substring(i, j), unk)
          else probs.getOrElse(w.substring(i, j), Double.NegativeInfinity)
        val s = score(i) + lp
        if (s > score(j)) { score(j) = s; back(j) = i }
        i += 1
      }
      j += 1
    }
    val out = List.newBuilder[String]
    val rev = mutable.ArrayBuffer.empty[(Int, Int)]
    var e = n
    while (e > 0) { val s = back(e); rev += ((s, e)); e = s }
    rev.reverseIterator.foreach { case (s, t) => out += w.substring(s, t) }
    out.result().toVector
  }

  /** Encode one word with a trained model (exposed for specs/memos). */
  def encodeWord(word: String, model: Model): Vector[String] = {
    val probs = mutable.HashMap.empty[String, Double]
    model.pieces.foreach { case (p, lp) => probs(p) = lp }
    val maxLen = if (model.pieces.isEmpty) 1
      else model.pieces.keysIterator.map(_.length).max
    viterbi(word, probs, maxLen, model.unkLogProb)
  }

  /** Per-document unigram piece counts: scan-only mapPartitions with a
    * per-partition word→count memo, model on a broadcast. Output
    * (id, unigram_tokens, words) — the Bpe.tokenCounts twin, so the two
    * tokenizer families are drop-in comparable downstream.
    */
  def pieceCounts(
      spark: SparkSession,
      df: DataFrame,
      idCol: String,
      textCol: String,
      model: Model): DataFrame = {
    val bc = spark.sparkContext.broadcast(model)
    val wordRe = "[a-z0-9]+".r
    val in = df.select(col(idCol), coalesce(col(textCol), lit("")).as("__text"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.fields.head,
      org.apache.spark.sql.types.StructField("unigram_tokens",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("words",
        org.apache.spark.sql.types.LongType, nullable = false)))
    in.mapPartitions { it =>
      val m = bc.value
      val probs = mutable.HashMap.empty[String, Double]
      m.pieces.foreach { case (p, lp) => probs(p) = lp }
      val maxLen = if (m.pieces.isEmpty) 1
        else m.pieces.keysIterator.map(_.length).max
      val memo = mutable.HashMap.empty[String, Int]
      it.map { row =>
        val text = row.getString(1)
        var toks = 0L
        var nWords = 0L
        wordRe.findAllIn(text.toLowerCase).foreach { w =>
          nWords += 1
          toks += memo.getOrElseUpdate(w,
            viterbi(w, probs, maxLen, m.unkLogProb).length)
        }
        org.apache.spark.sql.Row(row.get(0), toks, nWords)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
      .toDF(idCol, "unigram_tokens", "words")
  }
}
