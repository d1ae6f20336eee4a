package graft

import org.apache.spark.sql.functions._
import graft.ext.Chunker

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def doc(text: String) = Seq((1L, text)).toDF("doc_id", "text")

  test("every token appears; consecutive chunks overlap by window-stride") {
    val text = (1 to 47).map(i => s"w$i").mkString(" ")
    val chunks = Chunker.chunkByTokens(doc(text), "doc_id", "text",
      window = 20, stride = 15).orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2).split(" ")))
    // starts 0,15,30 -> 3 chunks
    assert(chunks.map(_._1).toSeq == Seq(0L, 1L, 2L))
    // coverage: the union of chunk tokens is exactly the doc's tokens
    assert(chunks.flatMap(_._2).toSet == text.split(" ").toSet)
    // overlap: last 5 of chunk k == first 5 of chunk k+1
    chunks.sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(a.takeRight(5).sameElements(b.take(5)))
      case _ =>
    }
    // tail chunk is short (47 - 30 = 17 tokens), never padded
    assert(chunks.last._2.length == 17)
  }

  test("short doc yields exactly one chunk with all tokens") {
    val r = Chunker.chunkByTokens(doc("a b c"), "doc_id", "text", 20, 15).collect()
    assert(r.length == 1)
    assert(r.head.getString(2) == "a b c" && r.head.getInt(3) == 3)
  }

  test("stride == window means zero overlap and full partition") {
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val chunks = Chunker.chunkByTokens(doc(text), "doc_id", "text", 10, 10)
      .orderBy("chunk_id").collect().map(_.getString(2).split(" ").toSeq)
    assert(chunks.length == 4)
    assert(chunks.flatten.toSeq == text.split(" ").toSeq) // exact partition, order kept
  }

  test("null text yields no chunks; keepCols ride through") {
    val df = Seq((1L, "a b c", "en"), (2L, null.asInstanceOf[String], "es"))
      .toDF("doc_id", "text", "lang")
    val out = Chunker.chunkByTokens(df, "doc_id", "text", 20, 15,
      keepCols = Seq("lang")).collect()
    assert(out.length == 1) // null-text doc rejected, not fabricated
    assert(out.head.getLong(0) == 1L && out.head.getString(4) == "en")
    assert(out.head.getInt(3) == 3) // n_tokens sane, never -1
  }

  test("guards: window and stride bounds") {
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(doc("a"), "doc_id", "text", 0, 1)
    }
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(doc("a"), "doc_id", "text", 10, 11)
    }
    // keepCols may not collide with the chunker's output columns
    intercept[IllegalArgumentException] {
      Chunker.chunkByTokens(
        doc("a").withColumn("chunk", col("text")),
        "doc_id", "text", 10, 10, keepCols = Seq("chunk"))
    }
  }

  test("chunking is a pure map plan: no exchange") {
    val p = Chunker.chunkByTokens(doc("a b c"), "doc_id", "text", 20, 15)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"chunker acquired a shuffle:\n$p")
  }
}
