package graft

import org.apache.spark.sql.functions._
import graft.metrics.MetricQueries

class MetricQueriesSpec extends SparkSpec {
  import spark.implicits._

  // labels: 0,0,0,1 — preds: 0,1,0,1 → acc .75; recall(0)=2/3, recall(1)=1
  private val lp = Seq((0, 0), (0, 1), (0, 0), (1, 1)).toDF("label", "pred")

  test("confusion counts each (label,pred) cell") {
    val m = MetricQueries.confusion(lp, "label", "pred")
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(m == Map((0, 0) -> 2L, (0, 1) -> 1L, (1, 1) -> 1L))
  }

  test("accuracy") {
    assert(lp.agg(MetricQueries.accuracy(lp, "label", "pred")).head().getDouble(0) == 0.75)
  }

  test("balancedAccuracy = mean per-class recall") {
    val r = MetricQueries.balancedAccuracy(lp, "label", "pred").head()
    assert(approx(r.getAs[Double]("balanced_accuracy"), 0.833333))
    assert(r.getAs[Long]("n_classes") == 2L)
  }

  test("regressionMetrics: mae/mse/rmse/r2 against sklearn-checked values") {
    // y=[3,-0.5,2,7], p=[2.5,0,2,8] → mae=0.5, mse=0.375, r2=0.9486081...
    val df = Seq((3.0, 2.5), (-0.5, 0.0), (2.0, 2.0), (7.0, 8.0)).toDF("y", "p")
    val r = MetricQueries.regressionMetrics(df, "y", "p").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("mae") == 0.5)
    // NB the engine rounds mse to integers for cross-engine stability on
    // large sums; at toy scale that rounds 0.375 → 0. r2 keeps precision.
    assert(approx(r.getAs[Double]("r2"), 0.948608, 1e-5))
  }

  test("calibrationBins: hand-computed reliability bins with Brier") {
    // scores 0.05,0.15,0.15,0.95 with labels 0,0,1,1 and 10 bins
    val df = Seq((0.05, 0), (0.15, 0), (0.15, 1), (0.95, 1), (1.0, 1))
      .toDF("score", "label")
    val r = MetricQueries.calibrationBins(df, "score", "label", 10, 2)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getDouble(2),
        x.getDouble(3), x.getDouble(4)))).toMap
    assert(r.keySet == Set(0L, 1L, 9L))
    assert(r(0L) == ((1L, 0.05, 0.0, 0.0025)))           // (0.05-0)^2
    assert(r(1L) == ((2L, 0.15, 0.5, (0.0225 + 0.7225) / 2)))
    // score 1.0 clamps into the top bin with 0.95
    assert(r(9L) == ((2L, 0.975, 1.0, (0.0025 + 0.0) / 2)))
  }

  test("classWeights: inverse frequency, averaging to 1") {
    val df = Seq("a", "a", "a", "b").toDF("cls")
    val w = MetricQueries.classWeights(df, "cls")
      .collect().map(r => (r.getString(0), r.getAs[Double]("weight"))).toMap
    // total=4, k=2 → w(a)=4/(2*3)=0.666667, w(b)=4/(2*1)=2
    assert(approx(w("a"), 0.666667, 1e-6))
    assert(w("b") == 2.0)
  }

  test("calibrationErrorCard: exact on perfect and worst-case fixtures") {
    import spark.implicits._
    // perfectly calibrated: every score 0.5, half positive
    val good = Seq((0.5, 1), (0.5, 0)).toDF("score", "label")
    val g = MetricQueries.calibrationErrorCard(good, "score", "label", 2)
      .collect().head
    assert(g.getLong(0) == 2L)
    assert(g.getDouble(1) == 0.0) // ece
    assert(g.getDouble(2) == 0.0) // mce
    assert(g.getDouble(3) == 0.25) // brier of p=.5 on balanced labels
    // maximally overconfident: score 0.9, all negative
    val bad = Seq((0.9, 0), (0.9, 0)).toDF("score", "label")
    val b = MetricQueries.calibrationErrorCard(bad, "score", "label", 2)
      .collect().head
    assert(b.getDouble(1) == 0.9)
    assert(b.getDouble(2) == 0.9)
    assert(b.getDouble(3) == 0.81)
  }

  test("q199 active selection: most-uncertain-first ordering with bounded entropy") {
    val rows = SparkEntry.q199(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 10)
    val margins = rows.map(_.getAs[Double]("margin")).toSeq
    assert(margins == margins.sorted, s"margin not ascending: $margins")
    rows.foreach { r =>
      val p = r.getAs[Double]("p")
      val e = r.getAs[Double]("entropy")
      assert(p > 0.0 && p < 1.0)
      // binary entropy is bounded by ln 2 and maximal at the margin
      assert(e >= 0.0 && e <= math.log(2.0) + 1e-9)
      assert(math.abs(r.getAs[Double]("margin") -
        math.rint(math.abs(p - 0.5) * 1e6) / 1e6) <= 1e-9)
    }
  }
}
