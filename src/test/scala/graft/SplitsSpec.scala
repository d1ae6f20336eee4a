package graft

import org.apache.spark.sql.functions._
import graft.ext.Splits

/** Leakage-safe deterministic splitting: group atomicity, stability
  * under growth and repartitioning, weight normalization, validation,
  * and the map-side plan shape.
  */
class SplitsSpec extends SparkSpec {
  import spark.implicits._

  private val W = Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)

  private def docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("group-atomic: every group lands in exactly one split") {
    val n = Splits.assign(docs, "source", W)
      .groupBy("source").agg(countDistinct("split").as("k"))
      .filter($"k" > 1).count()
    assert(n === 0)
  }

  test("deterministic and partitioning-invariant") {
    val a = Splits.assign(docs, "source", W)
      .select("doc_id", "split").collect().toSet
    val b = Splits.assign(docs.repartition(13), "source", W)
      .select("doc_id", "split").collect().toSet
    assert(a === b)
  }

  test("stable under corpus growth: existing groups never reassigned") {
    val before = Splits.assign(docs.filter($"doc_id" < 100), "source", W)
      .select("doc_id", "split").collect().toSet
    val after = Splits.assign(docs, "source", W)
      .filter($"doc_id" < 100)
      .select("doc_id", "split").collect().toSet
    assert(before === after)
  }

  test("weights are normalized: (6,1,1) == (0.75, 0.125, 0.125)") {
    val a = Splits.assign(docs, "source", W)
      .select("doc_id", "split").collect().toSet
    val b = Splits.assign(docs, "source",
      Seq("train" -> 6.0, "val" -> 1.0, "test" -> 1.0))
      .select("doc_id", "split").collect().toSet
    assert(a === b)
  }

  test("row-granularity split approximates weights on many keys") {
    // keying on doc_id (unique) gives the row-level split; 500 docs
    // should land near 75/12.5/12.5 (md5 is uniform)
    val byName = Splits.assign(docs, "doc_id", W)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    val n = byName.values.sum.toDouble
    assert(math.abs(byName("train") / n - 0.75) < 0.08, byName.toString)
    assert(byName.keySet === Set("train", "val", "test"))
  }

  test("seed changes the assignment, same seed repeats it") {
    val a = Splits.assign(docs, "source", W, seed = "s1")
      .select("doc_id", "split").collect().toSet
    val b = Splits.assign(docs, "source", W, seed = "s2")
      .select("doc_id", "split").collect().toSet
    val a2 = Splits.assign(docs, "source", W, seed = "s1")
      .select("doc_id", "split").collect().toSet
    assert(a === a2)
    assert(a !== b) // 20 groups; collision chance across seeds ~ 0
  }

  test("validation: sizes, positivity, duplicate names") {
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "source", Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "source", Seq("a" -> 1.0, "b" -> 0.0))
    }
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "source", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("null group key fails loudly instead of silently landing in the tail split") {
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "grp")
    val e = intercept[Exception] {
      Splits.assign(df, "grp", W).collect()
    }
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("null group key")), s"got: ${msgs(e)}")
  }

  test("extreme weights: boundary hex stays 8 chars, assignment still total") {
    // a cumulative weight that rounds to 1.0 in double would floor to
    // 2^32 (9 hex chars) and break the lexicographic compare — clamped
    val byName = Splits.assign(docs, "doc_id",
      Seq("a" -> 1e18, "b" -> 1.0))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byName.getOrElse("a", 0L) >= 499,
      s"split 'a' should receive essentially everything: $byName")
  }

  test("kfold: group-atomic, partitioning-invariant, all folds populated, guards loud") {
    val f = Splits.kfold(docs, "source", 4)
    // group atomicity: one fold per leakage group
    assert(f.groupBy("source").agg(countDistinct("fold").as("k"))
      .filter($"k" > 1).count() === 0)
    // folds are a pure function of the key: repartitioning changes nothing
    val a = f.select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = Splits.kfold(docs.repartition(13), "source", 4)
      .select("doc_id", "fold").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b, "fold assignment depends on partitioning")
    // row-granularity folds cover [0, k) and roughly balance
    val sizes = Splits.kfold(docs, "doc_id", 5).groupBy("fold").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.keySet == Set(0, 1, 2, 3, 4), s"folds missing: $sizes")
    assert(sizes.values.min > 0)
    // map-side only: no Exchange in the assignment plan
    val plan = Splits.kfold(docs, "doc_id", 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kfold shuffles:\n$plan")
    intercept[IllegalArgumentException] { Splits.kfold(docs, "doc_id", 1) }
    val e = intercept[Exception] {
      Seq(Some("a"), None).toDF("g")
        .select(col("g")).transform(Splits.kfold(_, "g", 3))
        .collect()
    }
    assert(e.getMessage != null)
  }

  test("assignment is map-side only: no shuffle in the plan") {
    val plan = Splits.assign(docs, "source", W)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"split must not shuffle:\n$plan")
  }
}
