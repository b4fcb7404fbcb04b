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

  test("rerandomizationTest: planted effect significant, independent noise is not") {
    import spark.implicits._
    // value 100 iff group 1 — the observed Δ=100 is unreachable by any
    // mixed relabeling
    val planted = (1L to 60L).map(k =>
      (k, if (k % 3 == 0) 1 else 0, if (k % 3 == 0) 100.0 else 0.0))
      .toDF("k", "g", "v")
    val r = MetricQueries.rerandomizationTest(planted, "k",
      col("g") === 1, "v").head()
    assert(r.getAs[Double]("delta_obs") == 100.0)
    assert(r.getAs[Double]("mean_a") == 100.0)
    assert(r.getAs[Double]("mean_b") == 0.0)
    assert(r.getAs[Long]("n_perms") == 64L)
    assert(r.getAs[Double]("p_value") <= 3.0 / 65.0,
      s"planted effect not detected: $r")
    // value independent of the grouping → the observed Δ is ordinary
    val noise = (1L to 60L).map(k =>
      (k, if (k % 3 == 0) 1 else 0, (k % 7).toDouble)).toDF("k", "g", "v")
    val r2 = MetricQueries.rerandomizationTest(noise, "k",
      col("g") === 1, "v").head()
    assert(r2.getAs[Double]("p_value") > 0.05, s"false positive: $r2")
    // determinism: fixed salts, no RNG
    val again = MetricQueries.rerandomizationTest(planted, "k",
      col("g") === 1, "v").head()
    assert(again.toString == r.toString)
  }

  test("woeIv: hand-computed two-bin card with Laplace adjustment") {
    import spark.implicits._
    // bin 0: 4 pos / 0 neg; bin 1: 0 pos / 4 neg; tp=tn=4, nb=2
    // dp0 = 4.5/5 = .9, dn0 = .5/5 = .1 → woe0 = ln 9; bin 1 mirrors
    val df = ((1 to 4).map(i => (0L, 1)) ++ (1 to 4).map(i => (1L, 0)))
      .toDF("b", "y")
    val r = MetricQueries.woeIv(df, col("b"), col("y") === 1)
      .collect().map(x => x.getLong(0) -> x).toMap
    val ln9 = math.rint(math.log(9.0) * 1e6) / 1e6
    assert(r(0L).getAs[Double]("woe") == ln9)
    assert(r(1L).getAs[Double]("woe") == -ln9)
    assert(r(0L).getAs[Long]("n_pos") == 4L &&
      r(0L).getAs[Long]("n_neg") == 0L)
    val contrib = math.rint(0.8 * math.log(9.0) * 1e6) / 1e6
    assert(r(0L).getAs[Double]("iv_contrib") == contrib)
    assert(r(1L).getAs[Double]("iv_contrib") == contrib)
    val ivTotal = math.rint(2 * 0.8 * math.log(9.0) * 1e6) / 1e6
    assert(r(0L).getAs[Double]("iv_total") == ivTotal)
    // a non-informative bin layout scores near zero IV
    val flat = ((1 to 4).map(i => (i.toLong % 2, 1)) ++
      (1 to 4).map(i => (i.toLong % 2, 0))).toDF("b", "y")
    val fr = MetricQueries.woeIv(flat, col("b"), col("y") === 1).collect()
    assert(fr.forall(_.getAs[Double]("iv_total") == 0.0))
  }

  test("wilsonRateCard: hand-computed interval, stays inside (0,1)") {
    // group g: n=10, k=3 → p̂=.3; z=1.959964
    val df = ((0 until 3).map(_ => ("g", true)) ++
      (0 until 7).map(_ => ("g", false)) ++
      (0 until 4).map(_ => ("h", true))).toDF("grp", "s")
    val out = MetricQueries.wilsonRateCard(df, "grp", col("s"))
      .collect().map(r => r.getString(0) -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val z = 1.959964; val zz = z * z; val n = 10.0; val p = 0.3
    val denom = 1.0 + zz / n
    val center = (p + zz / (2.0 * n)) / denom
    val half = z * math.sqrt(p * (1.0 - p) / n + zz / (4.0 * n * n)) / denom
    val g = out("g")
    assert(g.getLong(1) == 10L && g.getLong(2) == 3L)
    assert(g.getDouble(3) == 0.3)
    assert(g.getDouble(4) == r6(center - half))
    assert(g.getDouble(5) == r6(center + half))
    // all-success group: Wald width would be 0; Wilson's lower bound
    // stays strictly inside (0,1) and its upper bound is exactly 1 at
    // p̂ = 1 (center + half telescopes to (1+z²/n)/(1+z²/n))
    val h = out("h")
    assert(h.getDouble(4) > 0.0 && h.getDouble(4) < 1.0)
    assert(h.getDouble(5) == 1.0 && h.getDouble(6) > 0.0)
  }
}
