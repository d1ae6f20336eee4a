package graft

import graft.ext.Eval
import org.apache.spark.sql.Row

/** Classifier-evaluation metrics: hand-derived goldens (tie-aware AUC,
  * confusion/P/R/F1, calibration bins) plus the structural properties —
  * complement symmetry, degenerate-class nulls, and the top-bin fold.
  */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  // scores with a TIE spanning both classes: pos {0.8, 0.5}, neg {0.5, 0.2}
  // pairs: (0.8 vs 0.5)=1, (0.8 vs 0.2)=1, (0.5 vs 0.5)=0.5, (0.5 vs 0.2)=1
  // AUC = 3.5 / 4 = 0.875
  private def tied = Seq(
    (0.8, true), (0.5, true), (0.5, false), (0.2, false)
  ).toDF("score", "y")

  test("rocAuc: hand-computed tie-aware golden") {
    assert(Eval.rocAuc(tied, "score", "y").collect() ===
      Array(Row(2L, 2L, 0.875)))
  }

  test("rocAuc: perfect separation is 1.0, reversed is 0.0") {
    val perfect = Seq((0.9, true), (0.8, true), (0.3, false), (0.1, false))
      .toDF("score", "y")
    assert(Eval.rocAuc(perfect, "score", "y").head.getDouble(2) === 1.0)
    val reversed = perfect.select($"score", !$"y" as "y")
    assert(Eval.rocAuc(reversed, "score", "y").head.getDouble(2) === 0.0)
  }

  test("rocAuc: auc(-score) = 1 - auc(score) (complement symmetry)") {
    val a = Eval.rocAuc(tied, "score", "y").head.getDouble(2)
    val b = Eval.rocAuc(tied.select(-$"score" as "score", $"y"),
      "score", "y").head.getDouble(2)
    assert(math.abs((1.0 - a) - b) < 1e-9)
  }

  test("rocAuc: single-class input yields null auc, not a fake number") {
    val onlyPos = Seq((0.9, true), (0.1, true)).toDF("score", "y")
    val r = Eval.rocAuc(onlyPos, "score", "y").head
    assert(r.getLong(0) === 2L && r.getLong(1) === 0L && r.isNullAt(2))
  }

  test("confusionAt: golden counts and P/R/F1; prediction is >= threshold") {
    // at 0.5: pred {0.8+, 0.5+, 0.5-}, not-pred {0.2-}
    val r = Eval.confusionAt(tied, "score", "y", 0.5).head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 1L, 0L, 1L)))
    assert(r.getDouble(4) === 0.666667) // precision 2/3 round 6
    assert(r.getDouble(5) === 1.0)      // recall 2/2
    assert(r.getDouble(6) === 0.8)      // f1 = 4/5
  }

  test("confusionAt: empty-denominator ratios are null") {
    val r = Eval.confusionAt(tied, "score", "y", 0.95).head
    assert((r.getLong(0), r.getLong(1)) === ((0L, 0L))) // nothing predicted
    assert(r.isNullAt(4)) // precision undefined
    assert(r.getDouble(5) === 0.0)
  }

  test("calibrationBins: bin assignment, top-bin fold, exact rates") {
    val df = Seq((0.05, false), (0.95, true), (1.0, true), (0.91, false))
      .toDF("score", "y")
    val rows = Eval.calibrationBins(df, "score", "y", bins = 10).collect()
    // score 1.0 folds INTO bin 9 rather than creating a phantom bin 10
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 9L))
    val top = rows.last
    assert(top.getLong(1) === 3L)
    assert(top.getDouble(3) === 0.666667) // 2 of 3 positive
  }
}
