package graft

import graft.metrics.{MetricQueries, RankMetrics}

/** DeLong AUC CI (q300), average precision (q301), Brier decomposition
  * (q302): hand-computed placements, the sklearn step-wise AP, and the
  * exact Murphy identity.
  */
class EvalCardsSpec extends SparkSpec {
  import spark.implicits._

  test("delongAuc: perfect separation gives auc 1 with zero variance") {
    val df = Seq((3.0, 1), (4.0, 1), (1.0, 0), (2.0, 0))
      .toDF("score", "label")
    val r = RankMetrics.delongAuc(df, "score", "label").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 0.0)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 1.0)
  }

  test("delongAuc: full ties give auc 0.5, hand-computed placements") {
    // pos {1,2}, neg {1,2}: V10 = {0.25, 0.75} → S10 = 0.125;
    // Var = 0.125/2 + 0.125/2 = 0.125 → se = 0.353553
    val df = Seq((1.0, 1), (2.0, 1), (1.0, 0), (2.0, 0))
      .toDF("score", "label")
    val r = RankMetrics.delongAuc(df, "score", "label").head()
    assert(r.getDouble(2) == 0.5)
    assert(r.getDouble(3) == 0.353553)
  }

  test("averagePrecision: sklearn step-wise value on alternating ranks") {
    // desc: 4(+) P=1 ΔR=1/2; 2(+) P=2/3 ΔR=1/2 → AP = 1/2 + 1/3
    val df = Seq((4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0))
      .toDF("score", "label")
    val r = RankMetrics.averagePrecision(df, "score", "label").head()
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 0.833333)
    assert(r.getDouble(3) == 0.5)
  }

  test("averagePrecision: tied scores share one threshold") {
    val df = Seq((2.0, 1), (2.0, 0)).toDF("score", "label")
    val r = RankMetrics.averagePrecision(df, "score", "label").head()
    assert(r.getDouble(2) == 0.5)
  }

  test("averagePrecision: bucket stitching is invisible (1 vs 8)") {
    val df = (1 to 60).map(i => (i * 0.37, if (i % 3 == 0) 1 else 0))
      .toDF("score", "label")
    assert(RankMetrics.averagePrecision(df, "score", "label", 1).head() ==
      RankMetrics.averagePrecision(df, "score", "label", 8).head())
  }

  test("brierDecomposition: perfect forecasts decompose to zero Brier") {
    val df = Seq((1.0, 1), (1.0, 1), (0.0, 0), (0.0, 0))
      .toDF("prob", "label")
    val r = MetricQueries.brierDecomposition(df, "prob", "label").head()
    assert(r.getDouble(2) == 0.0)          // brier
    assert(r.getDouble(3) == 0.0)          // reliability
    assert(r.getDouble(4) == 0.25)         // resolution = uncertainty
    assert(r.getDouble(5) == 0.25)
    assert(r.getDouble(6) == 0.0 && r.getDouble(7) == 0.0)
  }

  test("brierDecomposition: Murphy identity closes exactly") {
    val df = (1 to 200).map { i =>
      val p = (i % 97) / 96.0
      (p, if ((i * 7) % 13 < 5) 1 else 0)
    }.toDF("prob", "label")
    val r = MetricQueries.brierDecomposition(df, "prob", "label").head()
    val (brier, rel, res, unc, wvar, wcov) =
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7))
    assert(math.abs(brier - (rel - res + unc + wvar - 2 * wcov)) < 5e-6)
    assert(r.getLong(1) <= 20L)            // bin contract
  }
}
