package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.metrics.MetricQueries
import graft.operators.{CdcOps, DriftOps}

/** Round-11 additions: binary-classifier card, Mood's median test,
  * SCD type-2 history build.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- q337 MCC card

  test("binaryClassifierCard matches hand-computed 2x2 scores") {
    // tp=2 fp=1 fn=1 tn=4: PPV=TPR=2/3, TNR=NPV=4/5
    val d = Seq((1, 1), (1, 1), (0, 1), (1, 0),
      (0, 0), (0, 0), (0, 0), (0, 0)).toDF("label", "pred")
    val r = MetricQueries.binaryClassifierCard(d, "label", "pred")
      .select("tp", "fp", "fn", "tn", "mcc", "fowlkes_mallows",
        "youden_j", "markedness")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 2L && r._2 == 1L && r._3 == 1L && r._4 == 4L)
    assert(r._5 == r6((2.0 * 4 - 1.0) / math.sqrt(3.0 * 3 * 5 * 5)))
    assert(r._6 == r6(math.sqrt(2.0 / 3 * (2.0 / 3))))
    assert(r._7 == r6(2.0 / 3 + 4.0 / 5 - 1))
    assert(r._8 == r6(2.0 / 3 + 4.0 / 5 - 1))
  }

  test("binaryClassifierCard nulls MCC on a single-class degenerate input") {
    val d = Seq((1, 1), (1, 1), (1, 0)).toDF("label", "pred")
    val r = MetricQueries.binaryClassifierCard(d, "label", "pred")
    val row = r.select("mcc", "youden_j", "fowlkes_mallows").head()
    assert(row.isNullAt(0)) // (tn+fp) = 0 kills the MCC denominator
    assert(row.isNullAt(1)) // ... and Youden needs TNR
    assert(!row.isNullAt(2)) // FM only needs the positive margins
  }

  // ------------------------------------------------- q338 Mood's median

  test("moodsMedianTest: clean separation gives chi2 = N") {
    // g1 all below, g2 all above the pooled median (4+6)/2 = 5
    val d = (Seq(1, 2, 3, 4).map(("g1", _)) ++
      Seq(6, 7, 8, 9).map(("g2", _))).toDF("g", "v")
    val r = DriftOps.moodsMedianTest(d, "v", "g")
      .select("g", "n_above", "n_below", "e_above", "pooled_median",
        "chi2", "df")
      .as[(String, Long, Long, Double, Double, Double, Long)]
      .collect().toSeq
    assert(r == Seq(("g1", 0L, 4L, 2.0, 5.0, 8.0, 1L),
      ("g2", 4L, 0L, 2.0, 5.0, 8.0, 1L)))
  }

  test("moodsMedianTest drops values at the pooled median") {
    // 5 fives sit AT the pooled median and vanish; survivors:
    // a -> {1,2,8} (1 above, 2 below), b -> {3,9} (1 above, 1 below)
    val d = (Seq(1, 2, 5, 5, 8).map(("a", _)) ++
      Seq(3, 5, 5, 5, 9).map(("b", _))).toDF("g", "v")
    val r = DriftOps.moodsMedianTest(d, "v", "g")
      .select("g", "n_above", "n_below", "e_above", "pooled_median",
        "chi2")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(r == Seq(("a", 1L, 2L, 1.2, 5.0, 0.138889),
      ("b", 1L, 1L, 0.8, 5.0, 0.138889)))
  }

  test("moodsMedianTest two-level prefix sum matches a brute-force median") {
    // 500 values with ties spread across the full bucket range — exercises
    // the bucketed cumulation (values land in many of the 32 buckets) and
    // the ≤buckets-row offset frame, unlike the tiny fixtures above
    val rnd = new scala.util.Random(11)
    val vals = Seq.fill(501)(rnd.nextInt(97).toDouble)
    val d = vals.zipWithIndex
      .map { case (v, i) => (if (i % 3 == 0) "a" else "b", v) }
      .toDF("g", "v")
    val sorted = vals.sorted
    val n = sorted.size
    val med = (sorted((n + 1) / 2 - 1) + sorted(n / 2)) / 2.0
    val rows = DriftOps.moodsMedianTest(d, "v", "g")
      .select("g", "n_above", "n_below", "pooled_median")
      .as[(String, Long, Long, Double)].collect()
      .map { case (g, a, b, m) => g -> ((a, b, m)) }.toMap
    def expect(g: String) = {
      val gv = vals.zipWithIndex.collect {
        case (v, i) if (if (i % 3 == 0) "a" else "b") == g => v }
      (gv.count(_ > med).toLong, gv.count(_ < med).toLong, med)
    }
    assert(rows("a") == expect("a"), s"a: ${rows("a")} vs ${expect("a")}")
    assert(rows("b") == expect("b"), s"b: ${rows("b")} vs ${expect("b")}")
  }

  // --------------------------------------------------- q339 SCD type-2

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("scdType2 builds validity intervals and collapses same-value runs") {
    val d = Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"),
      (1L, ts(3), 12L, "B"), (1L, ts(4), 13L, "A"),
      (2L, ts(5), 14L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = CdcOps.scdType2(d, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version")
      .select("user_id", "event_type", "valid_from", "valid_to",
        "is_current", "version")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().toSeq
    assert(r == Seq(
      (1L, "A", ts(1), Some(ts(3)), false, 1L),
      (1L, "B", ts(3), Some(ts(4)), false, 2L),
      (1L, "A", ts(4), None, true, 3L),
      (2L, "C", ts(5), None, true, 1L)))
  }

  // ------------------------------------------- q340-q342 daily spine

  private def dailyEvents(counts: Seq[Int]) = {
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(new Timestamp(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli))
    }
    rows.toDF("ts")
  }

  test("kpssDailyCounts matches the hand-worked 1,2,3,4 series") {
    // mu=2.5; S=(-1.5,-2,-1.5,0) -> SS=8.5; gamma0=1.25;
    // weighted lag terms 0.25-0.225-0.225 -> lrv=0.85; eta=0.625
    val got = graft.operators.TimeSeriesOps.kpssDailyCounts(
        dailyEvents(Seq(1, 2, 3, 4)), "ts", bandwidth = 4)
      .select("n_days", "mean", "gamma0", "lrv", "eta")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(got == ((4L, 2.5, 1.25, 0.85, 0.625)))
  }

  test("varianceRatioDailyCounts: a perfectly alternating series " +
      "mean-reverts to vr = 0 at every even horizon") {
    val got = graft.operators.TimeSeriesOps.varianceRatioDailyCounts(
        dailyEvents(Seq(1, 3, 1, 3, 1, 3, 1, 3, 1, 3)), "ts")
      .select("q", "n_windows", "var_1", "var_q", "vr")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    // var_1 = 1 (mean 2, values 1/3); every q-window sums to exactly 2q
    assert(got == Seq((2L, 9L, 1.0, 0.0, 0.0), (4L, 7L, 1.0, 0.0, 0.0),
      (8L, 3L, 1.0, 0.0, 0.0)))
  }

  test("pageHinkleyDailyCounts tracks a level shift's excursion") {
    // 1,1,1 then 7,7,7: increments 0,0,0,4.5,3.6,3 -> m peaks 11.1 at
    // i=5; the running min stays 0 so PH = m
    val got = graft.operators.TimeSeriesOps.pageHinkleyDailyCounts(
        dailyEvents(Seq(1, 1, 1, 7, 7, 7)), "ts")
      .select("n_days", "delta", "ph_stat", "t_star", "m_final")
      .as[(Long, Double, Double, Long, Double)].head()
    assert(got == ((6L, 0.0, 11.1, 5L, 11.1)))
  }

  // ------------------------------------- q343-q345 closed-form OLS

  test("adfTestDailyCounts matches the hand-solved 1,2,4,3,5,4 system") {
    // m=4 obs; exact rationals: b0=57/14, gamma=-6/7, phi=-4/7,
    // SSR=3/7, t = -sqrt(6)
    val got = graft.operators.TimeSeriesOps.adfTestDailyCounts(
        dailyEvents(Seq(1, 2, 4, 3, 5, 4)), "ts")
      .select("n_obs", "b0", "gamma", "phi", "ssr", "t_gamma")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    assert(got == ((4L, 4.071429, -0.857143, -0.571429, 0.428571,
      -2.44949)))
  }

  test("grangerDailyCounts: a lagged copy is detected asymmetrically") {
    // clicks cycle 1,2,3; purchases equal yesterday's clicks except one
    // perturbed day - x->y F must dwarf y->x F
    val clicks = Seq(1, 2, 3, 1, 2, 3, 1, 2, 3)
    val purch = Seq(2, 1, 2, 3, 1, 2, 4, 1, 2) // y_t = x_{t-1}, one +1
    val rows = clicks.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)((tsDay(d), "click")) } ++
      purch.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)((tsDay(d), "purchase")) }
    val df = rows.toDF("ts", "event_type")
    val fwd = graft.operators.TimeSeriesOps.grangerDailyCounts(
        df, "ts", "event_type", "click", "purchase")
      .select("n_obs", "f_stat").as[(Long, Double)].head()
    val rev = graft.operators.TimeSeriesOps.grangerDailyCounts(
        df, "ts", "event_type", "purchase", "click")
      .select("n_obs", "f_stat").as[(Long, Double)].head()
    assert(fwd._1 == 8L && rev._1 == 8L)
    assert(fwd._2 > 10.0, s"forward F ${fwd._2} should be large")
    assert(fwd._2 > 5.0 * math.abs(rev._2),
      s"forward ${fwd._2} must dwarf reverse ${rev._2}")
  }

  test("cochraneOrcuttDailyTrend matches a plain-Scala replay") {
    val counts = Seq(1, 4, 2, 6, 3, 8, 4, 9, 6, 11)
    val got = graft.operators.TimeSeriesOps.cochraneOrcuttDailyTrend(
        dailyEvents(counts), "ts")
      .select("n_days", "slope_ols", "rho", "slope_co", "intercept_co")
      .as[(Long, Double, Double, Double, Double)].head()
    // independent local replay of the documented algebra
    def r(v: Double, s: Int) = BigDecimal(v)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = counts.length
    val i = (0 until n).map(_.toDouble)
    val x = counts.map(_.toDouble)
    val (si, sii) = (i.sum, i.map(v => v * v).sum)
    val (sx, six) = (x.sum, i.zip(x).map { case (a, b) => a * b }.sum)
    val b = (n * six - si * sx) / (n * sii - si * si)
    val a = (sx - b * si) / n
    val e = i.zip(x).map { case (ii, xx) => xx - (a + b * ii) }
    val rho = e.zip(e.tail).map { case (p, c) => r(c * p, 8) }.sum /
      e.init.map(p => r(p * p, 8)).sum
    val xs = (1 until n).map(t => t - rho * (t - 1).toDouble)
    val ys = (1 until n).map(t => x(t) - rho * x(t - 1))
    val m = n - 1
    val (t1, t11) = (xs.map(r(_, 8)).sum,
      xs.map(v => r(v * v, 8)).sum)
    val (ty, t1y) = (ys.map(r(_, 8)).sum,
      xs.zip(ys).map { case (p, q) => r(p * q, 8) }.sum)
    val b2 = (m * t1y - t1 * ty) / (m * t11 - t1 * t1)
    assert(got._1 == n.toLong)
    assert(got._2 == r(b, 6) && got._3 == r(rho, 6))
    assert(got._4 == r(b2, 6))
    assert(got._5 == r((ty - b2 * t1) / m, 6))
    assert(got._3 < 0.0) // alternation -> negative serial correlation
  }

  // ----------------------------- q346-q348 break/variance/seasonal

  test("chowTestDailyCounts flags a slope break at the midpoint") {
    // left: perfect slope +1; right: near-perfect slope -2 with one
    // perturbed point -> SSE_l = 0, SSE_r small, F large
    val counts = Seq(1, 2, 3, 4, 5, 10, 8, 6, 4, 3)
    val got = graft.operators.TimeSeriesOps.chowTestDailyCounts(
        dailyEvents(counts), "ts")
      .select("n_days", "break_i", "ssr_pooled", "ssr_left",
        "ssr_right", "f_stat")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(got._1 == 10L && got._2 == 5L)
    assert(got._4 == 0.0, "left half is exactly linear")
    assert(got._5 > 0.0 && got._5 < 1.0)
    assert(got._3 > got._4 + got._5, "pooled SSE must exceed split")
    assert(got._6 > 20.0, s"break must be loud, F=${got._6}")
  }

  test("breuschPaganDailyTrend matches a plain-Scala replay") {
    // variance grows with time: flat-ish first half, wild second half
    val counts = Seq(5, 6, 5, 6, 5, 2, 12, 1, 14, 2)
    val got = graft.operators.TimeSeriesOps.breuschPaganDailyTrend(
        dailyEvents(counts), "ts")
      .select("n_days", "r2_aux", "lm_stat")
      .as[(Long, Double, Double)].head()
    def r(v: Double, s: Int) = BigDecimal(v)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val n = counts.length
    val i = (0 until n).map(_.toDouble)
    val x = counts.map(_.toDouble)
    val (si, sii) = (i.sum, i.map(v => v * v).sum)
    val (sx, six) = (x.sum, i.zip(x).map(p => p._1 * p._2).sum)
    val b = (n * six - si * sx) / (n * sii - si * si)
    val a = (sx - b * si) / n
    val e = i.zip(x).map { case (ii, xx) => xx - (a + b * ii) }
    val g = e.map(v => v * v)
    val (sg, sig, sgg) = (g.map(r(_, 8)).sum,
      i.zip(g).map { case (ii, gg) => r(ii * gg, 8) }.sum,
      g.map(v => r(v * v, 8)).sum)
    val sxy = sig - si * sg / n
    val sxx2 = sii - si * si / n
    val syy = sgg - sg * sg / n
    val r2 = sxy * sxy / (sxx2 * syy)
    assert(got._1 == n.toLong)
    assert(math.abs(got._2 - r2) < 1e-6 &&
      math.abs(got._3 - n * r2) < 1e-5)
    assert(got._2 > 0.3, "variance trend must be visible")
  }

  test("seasonalDecompositionDailyCounts recovers an exact period-7 " +
      "pattern with strength 1") {
    // x_i = (i mod 7) + 1 for 21 days: every complete MA-7 window
    // averages 4, detrended = phase - 3 exactly, remainder 0
    val got = graft.operators.TimeSeriesOps
      .seasonalDecompositionDailyCounts(
        dailyEvents((0 until 21).map(i => (i % 7) + 1)), "ts")
      .select("phase", "n_obs", "seasonal_raw", "seasonal_idx",
        "seasonal_strength")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val expN = Map(0L -> 2L, 1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 2L,
      5L -> 2L, 6L -> 2L)
    assert(got.map(_._1) == (0L to 6L))
    got.foreach { case (p, n, raw, idx, s) =>
      assert(n == expN(p) && raw == p - 3.0 && idx == p - 3.0 &&
        s == 1.0, s"phase $p: ($n, $raw, $idx, $s)")
    }
  }

  // ------------------------------- q349-q351 two-sample ECDF battery

  test("kuiperTwoSample: disjoint supports give V = 1") {
    val d = (Seq(1.0, 2.0).map(("a", _)) ++ Seq(3.0, 4.0).map(("b", _)))
      .toDF("g", "v")
    val r = graft.operators.DriftOps.kuiperTwoSample(d, "v", "g", "a", "b")
      .select("n_a", "n_b", "d_plus", "d_minus", "v_stat")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r == ((2L, 2L, 1.0, 0.0, 1.0)))
  }

  test("cramerVonMisesTwoSample matches scipy on the untied and tied " +
      "hand cases") {
    val d1 = (Seq(1.0, 2.0).map(("a", _)) ++ Seq(3.0, 4.0).map(("b", _)))
      .toDF("g", "v")
    val r1 = graft.operators.DriftOps
      .cramerVonMisesTwoSample(d1, "v", "g", "a", "b")
      .select("u_stat", "t_stat").as[(Double, Double)].head()
    assert(r1 == ((16.0, 0.375))) // scipy cramervonmises_2samp = 0.375
    val d2 = (Seq(1.0, 1.0).map(("a", _)) ++ Seq(1.0, 2.0).map(("b", _)))
      .toDF("g", "v")
    val r2 = graft.operators.DriftOps
      .cramerVonMisesTwoSample(d2, "v", "g", "a", "b")
      .select("u_stat", "t_stat").as[(Double, Double)].head()
    assert(r2 == ((12.0, 0.125))) // midrank ties, worked by hand
  }

  test("andersonDarlingTwoSample matches the hand-worked A2 = 19/11") {
    val d = (Seq(1.0, 2.0).map(("a", _)) ++ Seq(3.0, 4.0).map(("b", _)))
      .toDF("g", "v")
    val r = graft.operators.DriftOps
      .andersonDarlingTwoSample(d, "v", "g", "a", "b")
      .select("n_a", "n_b", "n_grid", "a2_stat")
      .as[(Long, Long, Long, Double)].head()
    assert(r._1 == 2L && r._2 == 2L && r._3 == 4L)
    assert(math.abs(r._4 - 19.0 / 11.0) < 1e-5, s"a2=${r._4}")
  }

  // ---------------------------------------- q352-q353 graph operators

  test("linkPredictionCard scores the path graph's skip pairs") {
    // 1-2-3-4: candidates (1,3) via 2 and (2,4) via 3, both cn=1,
    // jaccard 0.5, AA = 1/ln 2
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
    val r = graft.operators.GraphOps.linkPredictionCard(edges, "s", "d")
      .select("id_a", "id_b", "common_neighbors", "jaccard",
        "adamic_adar")
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(r == Seq((1L, 3L, 1L, 0.5, 1.442695),
      (2L, 4L, 1L, 0.5, 1.442695)))
  }

  test("linkPredictionCard never proposes an existing edge") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val got = graft.operators.GraphOps.linkPredictionCard(edges, "s", "d")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!got.contains((1L, 2L)) && !got.contains((2L, 3L)) &&
      !got.contains((1L, 3L)))
    assert(got.contains((1L, 4L)) && got.contains((2L, 4L)))
  }

  test("assortativityCard: a star is perfectly disassortative") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("s", "d")
    val r = graft.operators.GraphOps.assortativityCard(edges, "s", "d")
      .select("n_nodes", "n_edges", "n_triangles", "n_wedges",
        "transitivity", "assortativity")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r == ((4L, 3L, 0L, 3L, 0.0, -1.0)))
  }

  test("assortativityCard: triangle + pendant has transitivity 3/5") {
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s", "d")
    val r = graft.operators.GraphOps.assortativityCard(edges, "s", "d")
      .select("n_triangles", "n_wedges", "transitivity", "assortativity")
      .as[(Long, Long, Double, Double)].head()
    assert(r == ((1L, 5L, 0.6, -0.714286)))
  }

  // --------------------------------- q354-q356 text/categorical cards

  private def r6(v: Double) = BigDecimal(v)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def r9(v: Double) = BigDecimal(v)
    .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("lexicalDiversityCard matches the hand spectrum of 'a a a b b c'") {
    val got = graft.operators.TextOps.lexicalDiversityCard(
        Seq("a a a b b c").toDF("text"), "text")
      .select("n_tokens", "n_types", "v1", "v2", "yule_k", "simpson_d",
        "honore_r", "sichel_s")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)]
      .head()
    assert(got._1 == 6L && got._2 == 3L && got._3 == 1L && got._4 == 1L)
    assert(got._5 == r6(10000.0 * 8 / 36.0)) // K = 10^4 (14-6)/36
    assert(got._6 == r6(8.0 / 30.0)) // D = (6+2)/30
    assert(got._7 == r6(100.0 * math.log(6.0) / (1.0 - 1.0 / 3.0)))
    assert(got._8 == r6(1.0 / 3.0))
  }

  test("kneserNeyBigramCard matches the hand-worked 'a b a b' model") {
    // bigrams: "a b"x2, "b a"x1; P(b|a)=0.8125, P(a|b)=0.625
    val got = graft.operators.TextOps.kneserNeyBigramCard(
        Seq((1L, "a b a b")).toDF("doc_id", "text"), "doc_id", "text")
      .select("n_bigrams", "n_bigram_types", "avg_logp", "ppl")
      .as[(Long, Long, Double, Double)].head()
    val avg = (r9(2.0 * math.log(0.8125)) + r9(1.0 * math.log(0.625))) / 3.0
    assert(got == ((3L, 2L, r6(avg), r6(math.exp(-avg)))))
  }

  test("categoricalDistanceCard matches hand p=(3/4,1/4) vs q=(1/2,1/2)") {
    val d = (Seq.fill(3)((2L, "x")) :+ (2L, "y")) ++
      Seq((1L, "x"), (1L, "y")) // even user 2 = cohort A, odd user 1 = B
    val got = graft.operators.DriftOps.categoricalDistanceCard(
        d.toDF("user_id", "cat"), "cat", col("user_id") % 2 === 0)
      .select("n_a", "n_b", "n_categories", "tv", "bc", "hellinger",
        "bhattacharyya")
      .as[(Long, Long, Long, Double, Double, Double, Double)].head()
    val bc = r9(math.sqrt(0.75 * 0.5)) + r9(math.sqrt(0.25 * 0.5))
    assert(got._1 == 4L && got._2 == 2L && got._3 == 2L)
    assert(got._4 == 0.25 && got._5 == r6(bc))
    assert(got._6 == r6(math.sqrt(1.0 - bc)))
    assert(got._7 == r6(-math.log(bc)))
  }

  // ----------------------------------- q357-q359 AMS sketch and Hurst

  test("amsF2Card is exact on a single-key stream and counters merge " +
      "additively") {
    import graft.operators.SketchOps
    val occ = Seq.fill(10)("kkk").toDF("k")
    val card = SketchOps.amsF2Card(
      SketchOps.amsCounters(occ, col("k")),
      occ.groupBy("k").agg(count(lit(1)).as("f"))
        .agg(sum(col("f") * col("f")).cast("long").as("f2_exact")))
    val rows = card.select("est", "median_est", "f2_exact", "rel_err")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // one key -> each row holds +-10 in one bucket -> est = 100 exactly
    assert(rows.map(_._1) == Seq(100L, 100L, 100L))
    assert(rows.head._2 == 100L && rows.head._3 == 100L &&
      rows.head._4 == 0.0)
    // additivity: counters(full) == merge of counters(halves)
    val all = Seq("a", "b", "a", "c", "b", "a").toDF("k")
    val h1 = Seq("a", "b", "a").toDF("k")
    val h2 = Seq("c", "b", "a").toDF("k")
    val full = SketchOps.amsCounters(all, col("k"))
      .orderBy("r", "b").collect().toSeq
    val merged = SketchOps.amsCounters(h1, col("k"))
      .unionByName(SketchOps.amsCounters(h2, col("k")))
      .groupBy("r", "b").agg(sum("c").as("c"))
      .orderBy("r", "b").collect().toSeq
    assert(full == merged)
  }

  test("hurstRsDailyCounts: hand-worked R/S on the 1..8 ramp at w=4") {
    // both blocks: R = 2, S = sqrt(1.25) -> R/S = 1.78885438
    val got = graft.operators.TimeSeriesOps.hurstRsDailyCounts(
        dailyEvents(1 to 8), "ts", sizes = Seq(2, 4))
      .select("w", "n_blocks", "mean_rs")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.map(t => (t._1, t._2)) == Seq((2L, 4L), (4L, 2L)))
    assert(got(1)._3 == 1.788854)
  }

  test("hurstRsDailyCounts separates trending from mean-reverting") {
    val trend = graft.operators.TimeSeriesOps.hurstRsDailyCounts(
        dailyEvents((1 to 64).map(i => i * 2)), "ts",
        sizes = Seq(4, 8, 16))
      .select("hurst").as[Double].head()
    val revert = graft.operators.TimeSeriesOps.hurstRsDailyCounts(
        dailyEvents((1 to 64).map(i => if (i % 2 == 0) 1 else 9)), "ts",
        sizes = Seq(4, 8, 16))
      .select("hurst").as[Double].head()
    assert(trend > 0.85, s"ramp must look persistent, H=$trend")
    assert(revert < 0.35, s"alternation must mean-revert, H=$revert")
  }

  // --------------------------------------- q360-q362 eval/drift cards

  test("hosmerLemeshowCard: a perfectly calibrated scorer gets HL = 0") {
    val d = (Seq.fill(2)((0.2, 1)) ++ Seq.fill(8)((0.2, 0)) ++
      Seq.fill(8)((0.8, 1)) ++ Seq.fill(2)((0.8, 0))).toDF("p", "y")
    val r = graft.metrics.RankMetrics.hosmerLemeshowCard(d, "p", "y")
      .select("bin", "n", "obs_pos", "exp_pos", "hl_stat", "df")
      .as[(Long, Long, Long, Double, Double, Long)].collect().toSeq
    assert(r == Seq((3L, 10L, 2L, 2.0, 0.0, 0L),
      (8L, 10L, 8L, 8.0, 0.0, 0L)))
  }

  test("hosmerLemeshowCard flags an anti-calibrated scorer loudly") {
    val d = (Seq.fill(9)((0.1, 1)) ++ Seq.fill(1)((0.1, 0)) ++
      Seq.fill(1)((0.9, 1)) ++ Seq.fill(9)((0.9, 0))).toDF("p", "y")
    val hl = graft.metrics.RankMetrics.hosmerLemeshowCard(d, "p", "y")
      .select("hl_stat").as[Double].head()
    // each bin: (9-1)^2/(1*(1-0.1)) = 71.111111 -> total 142.222222
    assert(hl == 142.222222)
  }

  test("forecastAccuracyCard: seasonal-naive is exact on a period-7 " +
      "pattern and the naive row self-normalizes") {
    val got = graft.operators.TimeSeriesOps.forecastAccuracyCard(
        dailyEvents((0 until 21).map(i => (i % 7) + 1)), "ts")
      .select("model", "n_obs", "mae", "rmse", "smape", "mase",
        "theil_u")
      .as[(String, Long, Double, Double, Double, Double, Double)]
      .collect().toSeq
    val naive = got.head
    val seasonal = got(1)
    assert(naive._1 == "naive" && seasonal._1 == "seasonal_naive")
    assert(naive._2 == 14L && seasonal._2 == 14L)
    assert(naive._6 == 1.0 && naive._7 == 1.0)
    assert(seasonal._3 == 0.0 && seasonal._4 == 0.0 &&
      seasonal._5 == 0.0 && seasonal._6 == 0.0 && seasonal._7 == 0.0)
    assert(naive._3 > 1.0, "the naive baseline must show real error")
  }

  test("mmdLinearCard: identical cohorts give 0, separated cohorts " +
      "don't") {
    val vA = Seq(Array(1.0f, 0.0f), Array(0.0f, 1.0f),
      Array(0.5f, 0.5f), Array(0.3f, 0.7f))
    val same = (0 until 4).flatMap(i =>
      Seq((2L * i, vA(i), 0), (2L * i + 1, vA(i), 1)))
      .toDF("vec_id", "embedding", "label")
    val zero = graft.operators.SimilarityOps.mmdLinearCard(
        same, "vec_id", "embedding", col("label") % 2 === 0)
      .select("n_quads", "mmd2_linear").as[(Long, Double)].head()
    assert(zero == ((2L, 0.0)))
    val far = ((0 until 4).map(i => (i.toLong, Array(0.0f, 0.0f), 0)) ++
      (4 until 8).map(i => (i.toLong, Array(3.0f, 4.0f), 1)))
      .toDF("vec_id", "embedding", "label")
    val sep = graft.operators.SimilarityOps.mmdLinearCard(
        far, "vec_id", "embedding", col("label") % 2 === 0)
      .select("mmd2_linear").as[Double].head()
    // within-kernels are 1 (d=0), cross exp(-25) ~ 0 -> mmd2 ~ 2
    assert(math.abs(sep - 2.0) < 1e-6, s"mmd2=$sep")
  }

  // ------------------------------------ q363-q365 privacy + PH twin

  test("dpClippedMean clips, is deterministic, and reports its own " +
      "error honestly") {
    val d = Seq(50.0, 100.0, 150.0, 300.0).toDF("value")
    val run = () => graft.operators.ProfileOps
      .dpClippedMean(d, "value", hi = 200.0, eps = 1.0)
      .select("n", "mean_true", "dp_mean", "abs_err")
      .as[(Long, Double, Double, Double)].head()
    val a = run()
    assert(a._1 == 4L && a._2 == 125.0) // 300 clips to 200
    assert(a._4 == r6(math.abs(a._3 - a._2)))
    assert(run() == a, "seeded draws must replay identically")
  }

  test("uniquenessRiskCard counts the k-profile of hand cells") {
    val d = Seq(("a", 1), ("b", 1), ("c", 1), ("c", 1), ("d", 1),
      ("d", 1), ("d", 1)).toDF("q1", "q2")
    val r = graft.operators.ProfileOps.uniquenessRiskCard(
        d, Seq(col("q1"), col("q2")))
      .select("n_records", "n_cells", "k1_cells", "k1_records",
        "k_le2_records", "max_cell", "pct_unique", "avg_cell")
      .as[(Long, Long, Long, Long, Long, Long, Double, Double)].head()
    assert(r == ((7L, 4L, 2L, 2L, 4L, 3L, 0.285714, 1.75)))
  }

  test("streamingPageHinkley lands on the batch card bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ph_")
    try {
      val events = dailyEvents(Seq(3, 3, 3, 9, 9, 9, 2, 2))
      events.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("ev.parquet").toString)
      val stream = graft.streaming.StreamingOps.streamingPageHinkley(
        spark, dir.toString, "ev.parquet", "ts",
        graft.streaming.StreamSink.Memory("spec_ph")).collect().toSeq
      val batch = graft.operators.TimeSeriesOps.pageHinkleyDailyCounts(
        events, "ts").collect().toSeq
      assert(stream == batch)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  // -------------------------------- q366-q367 spectrum + ordinal assoc

  test("periodogramDailyCounts finds the 7-day rhythm") {
    val pattern = Seq(10, 13, 14, 12, 9, 7, 8) // rounded sinusoid
    val got = graft.operators.TimeSeriesOps.periodogramDailyCounts(
        dailyEvents((0 until 28).map(i => pattern(i % 7))), "ts")
      .select("k", "period_days", "dominant_k", "spectral_entropy")
      .as[(Long, Double, Long, Double)].collect().toSeq
    assert(got.size == 14) // n/2 = 14 frequencies
    assert(got.forall(_._3 == 4L), "dominant k must be n/period = 4")
    assert(got.find(_._1 == 4L).get._2 == 7.0)
    val h = got.head._4
    assert(h > 0.0 && h < 0.7, s"a strong rhythm concentrates power: $h")
  }

  test("ordinalAssociationCard: perfect, tied, and reversed orders") {
    def card(rows: Seq[(Int, Int)]) =
      graft.operators.DriftOps.ordinalAssociationCard(
          rows.toDF("x", "y"), col("x"), col("y"))
        .select("n", "concordant", "discordant", "ties_x", "ties_y",
          "tau_b", "gamma", "somers_d_yx")
        .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
        .head()
    assert(card(Seq((1, 1), (2, 2), (3, 3))) ==
      ((3L, 3L, 0L, 0L, 0L, 1.0, 1.0, 1.0)))
    assert(card(Seq((1, 1), (1, 1), (2, 2))) ==
      ((3L, 2L, 0L, 1L, 1L, 1.0, 1.0, 1.0)))
    assert(card(Seq((1, 2), (2, 1))) ==
      ((2L, 0L, 1L, 0L, 0L, -1.0, -1.0, -1.0)))
  }

  // ------------------------------- q368-q370 BM / Cochran / gap KS

  test("brunnerMunzelTest reproduces the original paper's example") {
    // Brunner & Munzel (2000) worked example (also scipy's doctest):
    // W = 3.1374674823, df = 17.68...
    val x = Seq(1, 2, 1, 1, 1, 1, 1, 1, 1, 1, 2, 4, 1, 1)
    val y = Seq(3, 3, 4, 3, 1, 2, 3, 1, 1, 5, 4)
    val d = (x.map(("x", _)) ++ y.map(("y", _))).toDF("g", "v")
    val r = graft.operators.DriftOps.brunnerMunzelTest(
        d, "v", "g", "x", "y")
      .select("n_a", "n_b", "p_hat", "w_stat", "df")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == 14L && r._2 == 11L)
    assert(math.abs(r._4 - 3.137467) < 1e-3, s"W=${r._4}")
    assert(math.abs(r._5 - 17.683) < 0.05, s"df=${r._5}")
    assert(r._3 > 0.7, s"y must dominate, p_hat=${r._3}")
  }

  test("cochranQTest matches the hand-worked 4-subject table") {
    // indicators: a=(1,1,0) b=(1,0,0) c=(1,1,1) d=(0,1,0) -> Q = 24/9
    val rows = Seq(("a", "t0"), ("a", "t1"), ("b", "t0"), ("c", "t0"),
      ("c", "t1"), ("c", "t2"), ("d", "t1"))
    val r = graft.operators.DriftOps.cochranQTest(
        rows.toDF("s", "tr"), col("s"), "tr", Seq("t0", "t1", "t2"))
      .select("n_subjects", "c_t0", "c_t1", "c_t2", "total_successes",
        "q_stat", "df")
      .as[(Long, Long, Long, Long, Long, Double, Long)].head()
    assert(r == ((4L, 3L, 3L, 1L, 7L, 2.666667, 2L)))
  }

  test("exponentialGapKs: perfectly periodic arrivals are maximally " +
      "non-exponential at the step") {
    // 11 events 60s apart: one gap value, D = 1 - 1/e at the step
    val rows = (0 to 10).map(m => (1L, new Timestamp(m * 60000L), m.toLong))
      .toDF("user_id", "ts", "event_id")
    val r = graft.operators.TimeSeriesOps.exponentialGapKs(
        rows, "user_id", "ts", "event_id")
      .select("n_gaps", "lambda_per_sec", "d_stat", "sqrt_n_d")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 10L)
    assert(r._2 == r6(1.0 / 60.0))
    val dExp = r9(1.0 - math.exp(-1.0))
    assert(r._3 == r6(dExp))
    assert(r._4 == r6(math.sqrt(10.0) * dExp))
  }

  // --------------------------- q371-q373 partial corr / ANOVA / Markov

  test("partialCorrelation: y = x + z is perfect given z, diluted raw") {
    val rows = Seq((1, 10), (2, 10), (1, 20), (2, 20), (3, 10), (4, 10),
      (3, 20), (4, 20)).map { case (x, z) => (x, x + z, z) }
    val r = graft.operators.ProfileOps.partialCorrelation(
        rows.toDF("x", "y", "z"), "x", "y", "z", scale = 0)
      .select("n", "r_xy", "r_xy_given_z")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 8L)
    assert(r._3 > 0.999998, s"partial must be ~1, got ${r._3}")
    assert(r._2 < 0.5, s"raw r is diluted by z, got ${r._2}")
  }

  test("anovaEffectSizes matches the hand-worked two-group case") {
    val d = (Seq(1, 2, 3).map(("a", _)) ++ Seq(4, 5, 6).map(("b", _)))
      .toDF("g", "v")
    val r = graft.operators.DriftOps.anovaEffectSizes(d, "v", "g")
      .select("n", "k", "eta_squared", "omega_squared",
        "epsilon_squared", "cohens_f")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 == 6L && r._2 == 2L)
    assert(r._3 == r6(13.5 / 17.5) && r._4 == r6(12.5 / 18.5) &&
      r._5 == r6(12.5 / 17.5))
    assert(r._6 == r6(math.sqrt((13.5 / 17.5) / (4.0 / 17.5))))
  }

  test("markovEntropyRate: a deterministic cycle has H = 0, a fair " +
      "branch has H = pi_A ln 2") {
    def chain(states: Seq[String]) = states.zipWithIndex
      .map { case (s, i) => (1L, ts(i), i.toLong, s) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val cyc = graft.operators.TimeSeriesOps.markovEntropyRate(
        chain(Seq("A", "B", "A", "B", "A")), "user_id", "ts",
        "event_id", "event_type")
      .select("entropy_rate", "efficiency").as[(Double, Double)].head()
    assert(cyc == ((0.0, 0.0)))
    val br = graft.operators.TimeSeriesOps.markovEntropyRate(
        chain(Seq("A", "B", "A", "C", "A", "B", "A", "C")), "user_id",
        "ts", "event_id", "event_type")
      .select("n_transitions", "k_states", "entropy_rate")
      .as[(Long, Long, Double)].head()
    // A->B 2, A->C 2 (H_A = ln 2), B/C deterministic; pi_A = 4/7
    val hA = r9(-(0.5 * math.log(0.5))) * 2
    assert(br._1 == 7L && br._2 == 3L)
    assert(br._3 == r6(r9(4.0 / 7.0 * hA)))
  }

  // ------------------------------- q374-q375 Poisson IRLS + twin

  test("poissonTrendIrls: constant counts converge to a = ln c, b = 0, " +
      "deviance 0") {
    val last = graft.operators.TimeSeriesOps.poissonTrendIrls(
        dailyEvents(Seq.fill(10)(5)), "ts")
      .orderBy(col("iter").desc).limit(1)
      .select("a", "b", "rate_ratio_per_day", "deviance")
      .as[(Double, Double, Double, Double)].head()
    assert(last == ((r6(math.log(5.0)), 0.0, 1.0, 0.0)))
  }

  test("poissonTrendIrls recovers an exact exponential growth curve") {
    val last = graft.operators.TimeSeriesOps.poissonTrendIrls(
        dailyEvents(Seq(1, 2, 4, 8, 16, 32)), "ts")
      .orderBy(col("iter").desc).limit(1)
      .select("b", "deviance").as[(Double, Double)].head()
    assert(math.abs(last._1 - math.log(2.0)) < 1e-3, s"b=${last._1}")
    assert(last._2 < 1e-3, s"deviance=${last._2}")
  }

  test("streamingSeasonalDecomposition lands on the batch card " +
      "bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seas_")
    try {
      val events = dailyEvents((0 until 21).map(i => (i % 7) + 2))
      events.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("ev.parquet").toString)
      val stream = graft.streaming.StreamingOps
        .streamingSeasonalDecomposition(spark, dir.toString,
          "ev.parquet", "ts",
          graft.streaming.StreamSink.Memory("spec_seas"))
        .collect().toSeq
      val batch = graft.operators.TimeSeriesOps
        .seasonalDecompositionDailyCounts(events, "ts").collect().toSeq
      assert(stream == batch)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  // -------------------------------------------------- q376 Nelson–Aalen

  test("nelsonAalen matches the hand-computed cumulative hazard") {
    // durations: 1(ev), 2(cens), 3(ev), 3(ev), 5(cens)
    // t=1: n=5 d=1 -> H=0.2, V=0.04; t=3: n=3 d=2 -> H=0.2+2/3, V=0.04+2/9
    val d = Seq((1L, true), (2L, false), (3L, true), (3L, true),
      (5L, false)).toDF("dur", "ev")
    val r = graft.operators.SurvivalOps.nelsonAalen(d, "dur", "ev")
      .orderBy("t")
      .select("t", "n_risk", "n_event", "cum_hazard", "hazard_var",
        "breslow_survival")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.map(x => (x._1, x._2, x._3)) ==
      Seq((1L, 5L, 1L), (2L, 4L, 0L), (3L, 3L, 2L), (5L, 1L, 0L)))
    assert(r(0)._4 == 0.2 && r(0)._5 == 0.04)
    assert(r(2)._4 == r6(0.2 + 2.0 / 3) && r(2)._5 == r6(0.04 + 2.0 / 9))
    assert(r(2)._6 == r6(math.exp(-(0.2 + 2.0 / 3))))
  }

  test("nelsonAalen Breslow survival dominates the Kaplan–Meier curve") {
    // exp(-d/n) >= 1 - d/n termwise, so the Breslow curve sits on or
    // above the product-limit estimate at every time point
    val d = Seq((1L, true), (1L, true), (2L, false), (3L, true),
      (4L, true), (6L, false), (7L, true)).toDF("dur", "ev")
    val na = graft.operators.SurvivalOps.nelsonAalen(d, "dur", "ev")
      .select("t", "breslow_survival")
      .as[(Long, Double)].collect().toMap
    val km = graft.operators.SurvivalOps.kaplanMeier(d, "dur", "ev")
      .select("t", "survival")
      .as[(Long, Double)].collect().toMap
    assert(na.keySet == km.keySet)
    na.foreach { case (t, s) => assert(s >= km(t) - 1e-9, s"t=$t") }
  }

  // -------------------------------------------------- q377 meta-analysis

  test("metaAnalysisPool: homogeneous strata give tau2=0, fixed==random") {
    // two strata, identical arm distributions -> identical effects,
    // Q ~ 0 -> tau2 clamps to 0 and both pools agree
    val rows = for {
      s <- Seq("s1", "s2"); (a, vs) <- Seq(
        (true, Seq(10.0, 12.0, 14.0)), (false, Seq(4.0, 6.0, 8.0)))
      v <- vs
    } yield (s, a, v)
    val d = rows.toDF("study", "arm", "v")
    val r = DriftOps.metaAnalysisPool(d, "study", "v", col("arm"),
        scale = 6)
      .select("k_studies", "fixed_effect", "tau2", "i2", "random_effect")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == 2L && r._2 == 6.0 && r._3 == 0.0 && r._4 == 0.0)
    assert(r._5 == r._2)
  }

  test("metaAnalysisPool: heterogeneous strata widen the random-effects " +
      "SE and pull the pool toward equal weights") {
    // stratum effects 1 and 9 with equal within-stratum SEs: fixed and
    // random pools agree on the midpoint, but tau2 > 0 inflates the SE
    val rows =
      Seq(("s1", true, 11.0), ("s1", true, 13.0), ("s1", false, 10.0),
        ("s1", false, 12.0),
        ("s2", true, 21.0), ("s2", true, 23.0), ("s2", false, 12.0),
        ("s2", false, 14.0))
    val d = rows.toDF("study", "arm", "v")
    val r = DriftOps.metaAnalysisPool(d, "study", "v", col("arm"),
        scale = 6)
      .select("fixed_effect", "fixed_se", "tau2", "i2", "random_effect",
        "random_se")
      .as[(Double, Double, Double, Double, Double, Double)].head()
    assert(r._1 == 5.0 && r._5 == 5.0) // equal weights either way
    assert(r._3 > 0.0 && r._4 > 0.0)
    assert(r._6 > r._2) // heterogeneity must widen the interval
  }

  test("metaAnalysisPool excludes strata with an arm smaller than 2") {
    val d = Seq(("keep", true, 1.0), ("keep", true, 2.0),
      ("keep", false, 5.0), ("keep", false, 7.0),
      ("drop", true, 9.0), ("drop", false, 1.0), ("drop", false, 2.0))
      .toDF("study", "arm", "v")
    val r = DriftOps.metaAnalysisPool(d, "study", "v", col("arm"),
      scale = 6).select("k_studies").as[Long].head()
    assert(r == 1L)
  }

  // ------------------------------------------------ q378 Ansari–Bradley

  test("ansariBradley matches the hand-worked 5-value pooled sample") {
    // pooled sorted: 1,4,5,6,10 -> both-ends scores 1,2,3,2,1
    // A = {1,10} (the extremes): AB=2, mu=1.8, E=3.6,
    // Var = 2*3*(19-5*1.8^2)/(5*4) = 0.84
    val d = (Seq(1.0, 10.0).map(("a", _)) ++
      Seq(4.0, 5.0, 6.0).map(("b", _))).toDF("g", "v")
    val r = DriftOps.ansariBradley(d, "v", "g", "a", "b")
      .select("n_a", "n_b", "ab_stat", "mu_ab", "sigma_ab", "z")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 2L && r._2 == 3L)
    assert(r._3 == 2.0 && r._4 == 3.6)
    assert(r._5 == r6(math.sqrt(0.84)))
    assert(r._6 == r6((2.0 - 3.6) / math.sqrt(0.84)))
  }

  test("ansariBradley: the more dispersed group scores low (negative z)") {
    // A hugs the tails, B hugs the center of the pooled ordering
    val d = (Seq(1.0, 2.0, 99.0, 100.0).map(("wide", _)) ++
      Seq(49.0, 50.0, 51.0, 52.0).map(("tight", _))).toDF("g", "v")
    val r = DriftOps.ansariBradley(d, "v", "g", "wide", "tight")
      .select("z").as[Double].head()
    assert(r < -1.0)
  }

  test("ansariBradley mid-rank scores under ties stay exact") {
    // 4 copies of one value: each takes the mid-rank score; with n=4
    // scores (doubled) are min(2r, 10-2r) at mid-rank 2.5 -> s=2.5 each
    val d = (Seq(7.0, 7.0).map(("a", _)) ++
      Seq(7.0, 7.0).map(("b", _))).toDF("g", "v")
    val r = DriftOps.ansariBradley(d, "v", "g", "a", "b")
      .select("ab_stat", "mu_ab", "n_tied_values")
      .as[(Double, Double, Long)].head()
    assert(r._1 == 5.0 && r._2 == 5.0 && r._3 == 1L)
  }

  // ---------------------------------------------- q379 quantile trend

  test("quantileTrendIrls is exact on a constant series") {
    // zero residuals at the OLS init -> uniform weights -> the WLS
    // refit reproduces (a=c, b=0) and the pinball loss is 0 at every tau
    val got = graft.operators.TimeSeriesOps
      .quantileTrendIrls(dailyEvents(Seq.fill(12)(5)), "ts")
      .select("tau", "a", "b", "pinball_mean", "ols_a", "ols_b")
      .as[(Double, Double, Double, Double, Double, Double)]
      .collect().toSeq
    assert(got.map(_._1) == Seq(0.25, 0.5, 0.75))
    got.foreach { r =>
      assert(r._2 == 5.0 && r._3 == 0.0 && r._4 == 0.0)
      assert(r._5 == 5.0 && r._6 == 0.0)
    }
  }

  test("quantileTrendIrls separates quartile slopes when the spread " +
      "itself trends") {
    // median stays near 20, but amplitude of the +/- swing grows with i
    // -> upper-quartile slope above lower-quartile slope
    val counts = (0 until 24).map(i =>
      20 + (if (i % 2 == 0) i / 2 else -(i / 2)))
    val got = graft.operators.TimeSeriesOps
      .quantileTrendIrls(dailyEvents(counts), "ts")
      .select("tau", "b").as[(Double, Double)].collect().toMap
    assert(got(0.75) > got(0.25) + 0.1)
    assert(got.values.forall(b => !b.isNaN))
  }

  // ------------------------------------------------------- q380 KMV

  test("kmvEstimate is exact below k and within sketch error above") {
    import graft.operators.SketchOps
    val small = (1 to 40).map(v => ("g", v)).toDF("grp", "k")
    val sm = SketchOps.kmvEstimate(
      SketchOps.kmvMinHashes(small, Seq("grp"), col("k")), Seq("grp"))
      .select("n_kept", "kmv_estimate").as[(Long, Double)].head()
    assert(sm._1 == 40L && sm._2 == 40.0)
    val big = (1 to 5000).map(v => ("g", v)).toDF("grp", "k")
    val bg = SketchOps.kmvEstimate(
      SketchOps.kmvMinHashes(big, Seq("grp"), col("k")), Seq("grp"))
      .select("n_kept", "kmv_estimate").as[(Long, Double)].head()
    // k=64 -> relative sd ~ 1/sqrt(62) ~ 12.7%; 4 sigma is a safe gate
    assert(bg._1 == 64L)
    assert(math.abs(bg._2 / 5000.0 - 1.0) < 0.51, s"est=${bg._2}")
  }

  test("kmv sharded sketches merge to the whole-data sketch exactly") {
    import graft.operators.SketchOps
    val all = (1 to 2000).map(v => ("g", v))
    // overlapping shards: dedup in the merge must not double-count
    val shardA = all.filter(_._2 <= 1400).toDF("grp", "k")
    val shardB = all.filter(_._2 >= 1000).toDF("grp", "k")
    val ka = SketchOps.kmvMinHashes(shardA, Seq("grp"), col("k"))
    val kb = SketchOps.kmvMinHashes(shardB, Seq("grp"), col("k"))
    val mergedHs = ka.select("h").unionByName(kb.select("h")).distinct()
      .orderBy("h").limit(64).as[Long].collect().toSeq
    val whole = SketchOps.kmvMinHashes(all.toDF("grp", "k"), Seq("grp"),
      col("k")).orderBy("r").select("h").as[Long].collect().toSeq
    assert(mergedHs == whole)
  }

  test("streamingKmvDistinct lands on the batch card bit-for-bit") {
    val dir = java.nio.file.Files.createTempDirectory("graft_kmv_")
    try {
      val rows = (1 to 300).map(v => (if (v % 3 == 0) "a" else "b", v))
        .toDF("grp", "k")
      rows.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("kv.parquet").toString)
      val stream = graft.streaming.StreamingOps
        .streamingKmvDistinct(spark, dir.toString, "kv.parquet",
          graft.streaming.StreamSink.Memory("spec_kmv"), identity)
        .collect().toSeq
      val batch = graft.operators.SketchOps.kmvDistinctCard(
        graft.operators.SketchOps.kmvMinHashes(rows, Seq("grp"),
          col("k")), rows).collect().toSeq
      assert(stream == batch)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  // ----------------------------------------------- q381 Fisher exact

  test("Stats.lnGamma tracks exact ln(n!) to 1e-8") {
    val lnFactExact = (n: Int) =>
      (1 to n).map(i => math.log(i.toDouble)).sum
    Seq(1, 2, 5, 10, 100, 1000).foreach { n =>
      val got = spark.range(1)
        .select(graft.functions.Stats.lnFact(lit(n.toDouble)).as("v"))
        .as[Double].head()
      assert(math.abs(got - lnFactExact(n)) < 1e-8, s"n=$n got=$got")
    }
  }

  test("fisherExact2x2 matches the exact BigInt hypergeometric tail") {
    // table a=6 b=2 / c=1 d=7: n=16, r1=8, c1=7, right tail k in {6,7}
    val rows = Seq.fill(6)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(1)((false, true)) ++ Seq.fill(7)((false, false))
    val d = rows.toDF("r", "c")
    def bc(n: Int, k: Int): BigInt =
      (BigInt(1) to BigInt(k)).foldLeft(BigInt(1))((acc, i) =>
        acc * (n - k + i.toInt) / i)
    val denom = bc(16, 7).toDouble
    val p6 = (bc(8, 6) * bc(8, 1)).toDouble / denom
    val p7 = (bc(8, 7) * bc(8, 0)).toDouble / denom
    val got = DriftOps.fisherExact2x2(d, col("r"), col("c"))
      .select("n", "r1", "c1", "a_obs", "n_terms", "p_right",
        "mid_p_right")
      .as[(Long, Long, Long, Long, Long, Double, Double)].head()
    assert(got._1 == 16L && got._2 == 8L && got._3 == 7L &&
      got._4 == 6L && got._5 == 2L)
    assert(math.abs(got._6 - (p6 + p7)) < 2e-6, s"p=${got._6}")
    assert(math.abs(got._7 - (p6 + p7 - 0.5 * p6)) < 2e-6)
  }

  test("fisherExact2x2 refuses an over-wide tail support") {
    val d = (1 to 100).map(i => (i % 2 == 0, i % 3 == 0)).toDF("r", "c")
    val e = intercept[IllegalArgumentException] {
      DriftOps.fisherExact2x2(d, col("r"), col("c"), maxTerms = 10L)
        .head()
    }
    assert(e.getMessage.contains("maxTerms"))
  }

  // ------------------------------------------------ q382 RANSAC trend

  test("ransacTrendLine recovers the planted line under gross outliers") {
    // exact line x = 50 + 2i with two +500 spikes: the consensus
    // winner's inlier set is exactly the 28 clean days, and the OLS
    // refit on integers recovers slope 2 / intercept 50 EXACTLY
    val counts = (0 until 30).map(i =>
      if (i == 5 || i == 17) 50 + 2 * i + 500 else 50 + 2 * i)
    val r = graft.operators.TimeSeriesOps
      .ransacTrendLine(dailyEvents(counts), "ts")
      .select("n_days", "n_inliers", "refit_slope", "refit_intercept",
        "inlier_frac")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(r._1 == 30L)
    assert(r._2 == 28L, s"inliers=${r._2}")
    assert(r._3 == 2.0 && r._4 == 50.0)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._5 == r6(28.0 / 30.0))
  }

  // --------------------------------------------- q383/q384 forecasters

  test("thetaForecast is exact on a constant series and tracks trend") {
    val const = graft.operators.TimeSeriesOps
      .thetaForecast(dailyEvents(Seq.fill(10)(7)), "ts")
      .select("h", "trend_component", "ses_component", "forecast")
      .as[(Long, Double, Double, Double)].collect().toSeq
    assert(const.map(_._1) == (1L to 7L))
    const.foreach(r => assert(r._2 == 7.0 && r._3 == 7.0 && r._4 == 7.0))
    val rising = graft.operators.TimeSeriesOps
      .thetaForecast(dailyEvents((0 until 14).map(i => 5 + 2 * i)), "ts")
      .select("h", "forecast").as[(Long, Double)].collect().toSeq
      .sortBy(_._1)
    rising.sliding(2).foreach {
      case Seq(a, b) => assert(b._2 > a._2, "forecast must rise with h")
      case _ => ()
    }
  }

  test("crostonForecast matches the hand-worked intermittent series") {
    // spine starts at the first event day; demands at i=0(4), 3(2), 7(6)
    // zh: 4 -> 3.8 -> 4.02; ph: 1 -> 1.2 -> 1.48
    val counts = Seq(0, 0, 4, 0, 0, 2, 0, 0, 0, 6)
    val r = graft.operators.TimeSeriesOps
      .crostonForecast(dailyEvents(counts), "ts", lit(true))
      .select("n_days", "n_demand_days", "total_demand", "size_hat",
        "interval_hat", "croston_rate", "sba_rate", "demand_frac")
      .as[(Long, Long, Long, Double, Double, Double, Double, Double)]
      .head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 8L && r._2 == 3L && r._3 == 12L)
    assert(r._4 == 4.02 && r._5 == 1.48)
    assert(r._6 == r6(4.02 / 1.48))
    assert(r._7 == r6((1.0 - 0.1 / 2.0) * (4.02 / 1.48)))
    assert(r._8 == 0.375)
  }

  // ------------------------------------------------ q385 Rocchio PRF

  test("rocchioPrfCard with beta=0 is the identity (delta 0, overlap 1)") {
    val vecs = (0 until 20).map(i =>
      (i.toLong, Seq(1.0 + i * 0.01, 0.5, 0.1 * (i % 3)), i % 2))
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.SimilarityOps.rocchioPrfCard(
      vecs, vecs.filter(col("vec_id") < 5), "vec_id", "embedding",
      "label", k = 5, m = 3, beta = 0.0)
      .select("p_at_k_delta", "mean_overlap_at_k")
      .as[(Double, Double)].head()
    assert(r._1 == 0.0 && r._2 == 1.0)
  }

  test("rocchioPrfCard lifts precision when feedback reveals the " +
      "relevant direction") {
    // query (0.9,0.4,0.2,0) label 0: round 1 ranks B (dim 2) above the
    // second relevant cluster A2 (dim 3); the top-5 pseudo-relevant A1
    // docs carry a 0.3 A2 component, so q' = q + 0.75*centroid flips
    // A2 above B and the after-list is all label 0
    val a1 = (1 to 6).map(i =>
      (i.toLong, Seq(1.0, 0.0, 0.3, 0.0), 0))
    val b = (7 to 16).map(i => (i.toLong, Seq(0.0, 1.0, 0.0, 0.0), 1))
    val a2 = (17 to 26).map(i => (i.toLong, Seq(0.0, 0.0, 1.0, 0.0), 0))
    val qrow = Seq((0L, Seq(0.9, 0.4, 0.2, 0.0), 0))
    val corpus = (qrow ++ a1 ++ b ++ a2)
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.SimilarityOps.rocchioPrfCard(
      corpus, corpus.filter(col("vec_id") === 0L), "vec_id",
      "embedding", "label", k = 10, m = 5, beta = 0.75)
      .select("n_queries", "p_at_k_before", "p_at_k_after",
        "p_at_k_delta")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 1L)
    assert(r._2 == 0.6 && r._3 == 1.0 && r._4 == 0.4, r.toString)
  }

  // ---------------------------------------------------- q386 Quade

  test("quadeTest matches the hand-worked 3x3 design with a flat block") {
    // ranges 9,2,0 -> block weights 3,2,1; the flat block contributes
    // S=0 (tied ranks center out) regardless of its weight
    // S_j = (-5, 0, 5); A=26; B=50/3; F = 2*(50/3)/(26-50/3) = 25/7
    val d = Seq(
      ("b1", "t1", 1.0), ("b1", "t2", 2.0), ("b1", "t3", 10.0),
      ("b2", "t1", 2.0), ("b2", "t2", 3.0), ("b2", "t3", 4.0),
      ("b3", "t1", 5.0), ("b3", "t2", 5.0), ("b3", "t3", 5.0))
      .toDF("blk", "trt", "v")
    val r = DriftOps.quadeTest(d, "blk", "trt", "v")
      .select("trt", "s_j", "a_stat", "b_stat", "f_stat", "df1", "df2")
      .as[(String, Double, Double, Double, Double, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.map(x => (x._1, x._2)) ==
      Seq(("t1", -5.0), ("t2", 0.0), ("t3", 5.0)))
    r.foreach { x =>
      assert(x._3 == 26.0 && x._4 == r6(50.0 / 3.0))
      assert(x._5 == r6(25.0 / 7.0))
      assert(x._6 == 2L && x._7 == 4L)
    }
  }

  // ---------------------------------------------------- q387 BFS hops

  test("bfsHops walks a path graph and respects islands") {
    // path 0-1-2-3-4 plus the island 5-6; sources = 4 smallest ids
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L))
      .toDF("a", "b")
    val r = graft.operators.GraphOps.bfsHops(edges, "a", "b")
      .select("src", "d", "n_at_distance", "n_reached",
        "ecc_within_rounds", "n_vertices")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(r.forall(_._6 == 7L))
    // source 0 reaches the 5-node path, one vertex per level, ecc 4
    val s0 = r.filter(_._1 == 0L)
    assert(s0.map(x => (x._2, x._3)).sorted ==
      (0L to 4L).map((_, 1L)))
    assert(s0.forall(x => x._4 == 5L && x._5 == 4L))
    // source 2 sits mid-path: levels 1,2,2 and ecc 2
    val s2 = r.filter(_._1 == 2L)
    assert(s2.map(x => (x._2, x._3)).sorted ==
      Seq((0L, 1L), (1L, 2L), (2L, 2L)))
    assert(s2.forall(x => x._4 == 5L && x._5 == 2L))
    // the island is never reached from the path sources
    assert(r.forall(_._4 == 5L))
  }

  // --------------------------------------- q388-q390 inference cards

  test("signTestDaily: a strictly rising series gives the exact " +
      "binomial tail") {
    // 4 up-moves of 4: P[X >= 4 | Bin(4, 1/2)] = 1/16
    val r = graft.operators.TimeSeriesOps
      .signTestDaily(dailyEvents(Seq(1, 2, 3, 4, 5)), "ts")
      .select("n_pos", "n_neg", "m", "k", "p_right", "p_two_sided")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r._1 == 4L && r._2 == 0L && r._3 == 4L && r._4 == 4L)
    assert(r._5 == 0.0625 && r._6 == 0.125)
  }

  test("captureRecapture matches the hand-worked two-occasion table") {
    // u1,u4 in both halves; u2 first only; u3 second only:
    // n1=3, n2=3, m=2 -> LP=4.5, Chapman=16/3-1, SE=2/3, true=4
    val ev = Seq((1L, tsDay(0)), (1L, tsDay(10)), (2L, tsDay(1)),
      (3L, tsDay(9)), (4L, tsDay(2)), (4L, tsDay(8)))
      .toDF("user_id", "ts")
    val r = graft.operators.SketchOps
      .captureRecapture(ev, "user_id", "ts")
      .select("n1", "n2", "n_both", "n_true", "lincoln_petersen",
        "chapman_estimate", "chapman_se")
      .as[(Long, Long, Long, Long, Double, Double, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 3L && r._2 == 3L && r._3 == 2L && r._4 == 4L)
    assert(r._5 == 4.5)
    assert(r._6 == r6(16.0 / 3.0 - 1.0))
    assert(r._7 == r6(math.sqrt(4.0 * 4.0 * 1.0 * 1.0 / (9.0 * 4.0))))
  }

  test("jackknifeRatioByStratum matches the hand-worked two-stratum " +
      "case") {
    // A: (1,1), B: (3,3,3): full=2.2, leave-outs (3,1) -> mean 2,
    // var = (1/2)*(10 - 2*4) = 1, bias-corrected 2*2.2 - 2 = 2.4
    val d = Seq(("a", 1.0), ("a", 1.0), ("b", 3.0), ("b", 3.0),
      ("b", 3.0)).toDF("g", "v")
    val r = graft.operators.RobustStats
      .jackknifeRatioByStratum(d, "g", "v")
      .select("k_strata", "ratio_full", "jack_mean", "jack_se",
        "bias_corrected")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(r._1 == 2L && r._2 == 2.2 && r._3 == 2.0)
    assert(r._4 == 1.0 && r._5 == 2.4)
  }

  // ---------------------------------------- q391-q393 model cards

  test("randomizedResponse unbiases the noisy rate within its SE") {
    // 400 units, 25% true: the seeded coins are deterministic, so the
    // estimate is a fixed number — assert the unbiasing identity and
    // that it lands within 3 SE of the truth
    val d = (1 to 400).map(i => (i.toLong, i % 4 == 0))
      .toDF("user_id", "is_x")
    val r = graft.operators.ProfileOps
      .randomizedResponse(d, "user_id", "is_x")
      .select("n", "true_rate", "observed_yes_rate", "rr_estimate",
        "rr_se", "abs_err")
      .as[(Long, Double, Double, Double, Double, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 400L && r._2 == 0.25)
    assert(r._4 == r6((r._3 - 0.125) / 0.75))
    assert(r._6 < 3.0 * r._5, s"err=${r._6} se=${r._5}")
  }

  test("negativeBinomialFit prefers NB on overdispersed counts and " +
      "nulls it when MoM is undefined") {
    // alternating 0/20: mean 10, var 2000/19 >> 10
    val over = graft.operators.TimeSeriesOps
      .negativeBinomialFit(
        dailyEvents((0 until 20).map(i => if (i % 2 == 0) 0 else 20)),
        "ts")
      .select("vmr", "nb_size", "ll_poisson", "ll_negbin", "delta_aic")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(over._1 > 5.0)
    assert(over._2 > 0.0)
    assert(over._4 > over._3, "NB must beat Poisson here")
    assert(over._5 > 0.0)
    // near-constant counts: v <= m, MoM undefined -> null NB columns
    val under = graft.operators.TimeSeriesOps
      .negativeBinomialFit(
        dailyEvents((0 until 20).map(i => 10 + (i % 2))), "ts")
      .select(col("nb_size").isNull, col("delta_aic").isNull)
      .as[(Boolean, Boolean)].head()
    assert(under._1 && under._2)
  }

  test("weibullFromKm recovers the planted shape on a Weibull sample") {
    // inverse-CDF sample of Weibull(k=2, lambda=10), all events
    val n = 200
    val durs = (1 to n).map { i =>
      val s = 1.0 - (i - 0.5) / n
      (math.ceil(10.0 * math.sqrt(-math.log(s))).toLong, true)
    }
    val km = graft.operators.SurvivalOps
      .kaplanMeier(durs.toDF("dur", "ev"), "dur", "ev")
    val r = graft.operators.SurvivalOps.weibullFromKm(km)
      .select("n_points", "shape_k", "scale_lambda", "r2")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 >= 10L)
    assert(r._2 > 1.5 && r._2 < 2.5, s"shape=${r._2}")
    assert(r._3 > 8.0 && r._3 < 12.0, s"scale=${r._3}")
    assert(r._4 > 0.95, s"r2=${r._4}")
  }

  // --------------------------------------- q394/q395 validity cards

  test("daviesBouldinCard: index is the mean component and tight " +
      "orthogonal clusters score well") {
    // the two smallest congruential draws over ids 0..79 are ids 0 and
    // 11 — place them in DIFFERENT clusters so the 2 drawn centroids
    // straddle the structure
    val vecs = (0 until 80).map { i =>
      val inB = i == 11 || i >= 40
      if (inB) (i.toLong, Seq(0.0, 0.001 * i, 1.0))
      else (i.toLong, Seq(1.0, 0.001 * i, 0.0))
    }.toDF("vec_id", "embedding")
    val rows = graft.operators.SimilarityOps
      .daviesBouldinCard(vecs, "vec_id", "embedding", nlist = 2)
      .select("db_component", "db_index", "k_clusters", "scatter",
        "min_separation")
      .as[(Double, Double, Long, Double, Double)].collect().toSeq
    assert(rows.nonEmpty)
    val meanComp = rows.map(_._1).sum / rows.length
    assert(math.abs(rows.head._2 - meanComp) < 1e-5)
    assert(rows.forall(_._3 == rows.length))
    // tight clusters, wide separation -> every component well under 1
    rows.foreach(r => assert(r._1 < 1.0, r.toString))
  }

  test("daviesBouldinCard on identical vectors yields no comparable " +
      "pairs") {
    val vecs = (0 until 10).map(i => (i.toLong, Seq(1.0, 2.0)))
      .toDF("vec_id", "embedding")
    val n = graft.operators.SimilarityOps
      .daviesBouldinCard(vecs, "vec_id", "embedding", nlist = 2)
      .count()
    assert(n == 0L)
  }

  test("turningPointTest matches the hand-worked alternating series " +
      "and ignores plateaus") {
    // 1,3,2,4,1,5: interior 3,2,4,1 all strict extrema -> T=4
    val r = graft.operators.TimeSeriesOps
      .turningPointTest(dailyEvents(Seq(1, 3, 2, 4, 1, 5)), "ts")
      .select("n_days", "n_turning", "expected", "variance", "z")
      .as[(Long, Long, Double, Double, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 6L && r._2 == 4L)
    assert(r._3 == r6(2.0 * 4.0 / 3.0))
    assert(r._4 == r6(67.0 / 90.0))
    assert(r._5 == r6((4.0 - 2.0 * 4.0 / 3.0) / math.sqrt(67.0 / 90.0)))
    // plateau produces no strict extremum
    val p = graft.operators.TimeSeriesOps
      .turningPointTest(dailyEvents(Seq(1, 2, 2, 1)), "ts")
      .select("n_turning").as[Long].head()
    assert(p == 0L)
  }

  // ------------------------------------------------- q396 probit

  test("Stats.normCdf matches reference normal-CDF values to 1e-6") {
    val pts = Seq(0.0 -> 0.5, 1.0 -> 0.8413447461, -1.0 -> 0.1586552539,
      1.96 -> 0.9750021049, -2.5758293 -> 0.005, 3.0 -> 0.9986501020)
    pts.foreach { case (x, want) =>
      val got = spark.range(1)
        .select(graft.functions.Stats.normCdf(lit(x)).as("v"))
        .as[Double].head()
      assert(math.abs(got - want) < 1e-6, s"x=$x got=$got want=$want")
    }
  }

  test("irlsProbitPortable: symmetric data fixes b0=b1=0, informative " +
      "data converges near the logistic slope / 1.6") {
    val sym = Seq((1.0, 0.0), (1.0, 1.0), (-1.0, 0.0), (-1.0, 1.0))
      .toDF("x", "y")
    val s = graft.ml.MlPipelines.irlsProbitPortable(sym, "x", "y")
      .orderBy(desc("iter")).select("b0", "b1")
      .as[(Double, Double)].head()
    assert(s._1 == 0.0 && s._2 == 0.0)
    // smooth monotone relationship: probit and logit agree up to the
    // classic ~1.6 link-scale factor
    val rows = (0 until 200).map { i =>
      val x = (i % 21).toDouble - 10.0
      (x, if ((i * 7 + x * 13).toInt % 20 < 10 + x.toInt) 1.0 else 0.0)
    }
    val d = rows.toDF("x", "y")
    val pb = graft.ml.MlPipelines.irlsProbitPortable(d, "x", "y",
        iters = 8)
      .orderBy(desc("iter")).select("b1").as[Double].head()
    val lg = graft.ml.MlPipelines.irlsLogisticPortable(d, "x", "y",
        iters = 8)
      .orderBy(desc("iter")).select("b1").as[Double].head()
    assert(pb > 0.0 && lg > 0.0)
    val ratio = lg / pb
    assert(ratio > 1.3 && ratio < 2.0, s"logit/probit slope ratio=$ratio")
  }

  // ------------------------------------- q397/q398 io + uncertainty

  test("ORC round-trip preserves mixed types and values exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc_")
    try {
      val d = Seq((1L, "a", 1.0 / 3.0, true),
        (2L, "b", -0.000001, false),
        (3L, null.asInstanceOf[String], 9.87654321e18, true))
        .toDF("id", "s", "v", "f")
      d.write.mode("overwrite").orc(dir.resolve("t").toString)
      val back = spark.read.orc(dir.resolve("t").toString)
      // ORC read-back relaxes nullability; names and types must hold
      assert(back.schema.map(f => (f.name, f.dataType)) ==
        d.schema.map(f => (f.name, f.dataType)))
      assert(back.orderBy("id").collect().toSeq ==
        d.orderBy("id").collect().toSeq)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
    }
  }

  test("blockBootstrapTrend: constant series gives zero slope, zero " +
      "spread; rank interval brackets the replicate mean") {
    val const = graft.operators.TimeSeriesOps
      .blockBootstrapTrend(dailyEvents(Seq.fill(20)(6)), "ts")
      .select("slope_full", "boot_mean", "boot_se", "ci_lo", "ci_hi")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(const == ((0.0, 0.0, 0.0, 0.0, 0.0)))
    val trend = graft.operators.TimeSeriesOps
      .blockBootstrapTrend(
        dailyEvents((0 until 28).map(i => 10 + 2 * i)), "ts")
      .select("slope_full", "boot_mean", "boot_se", "ci_lo", "ci_hi")
      .as[(Double, Double, Double, Double, Double)].head()
    assert(trend._1 == 2.0) // exact OLS on the exact line
    assert(trend._4 <= trend._2 && trend._2 <= trend._5)
    assert(trend._3 >= 0.0)
    // blocks preserve the local slope: replicates stay near the truth
    assert(math.abs(trend._2 - 2.0) < 1.0, trend.toString)
  }

  // ---------------------------------------------------- q399 UCB replay

  test("ucbReplay locks onto a dominant arm and regret counts its " +
      "exploration exactly") {
    // arm a pays 1.0 (normalized) every day, arm b pays 0.2: each pull
    // of b costs exactly 0.8 regret, so cum_regret == 0.8 * pulls(b)
    val rows = (0 until 20).flatMap { d =>
      Seq(("a", 10.0), ("a", 10.0), ("b", 2.0), ("b", 2.0))
        .map { case (arm, v) => (tsDay(d), arm, v) }
    }
    val ev = rows.toDF("ts", "event_type", "value")
    val r = graft.operators.BanditOps
      .ucbReplay(ev, "ts", "event_type", "value", Seq("a", "b"))
      .select("t", "chosen_arm", "cum_regret")
      .as[(Long, String, Double)].collect().toSeq.sortBy(_._1)
    val pullsB = r.count(_._2 == "b")
    val pullsA = r.count(_._2 == "a")
    assert(pullsA > pullsB, s"a=$pullsA b=$pullsB")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.last._3 == r6(0.8 * pullsB), s"regret=${r.last._3}")
    // regret is non-decreasing (b-pulls only add)
    r.sliding(2).foreach {
      case Seq(x, y) => assert(y._3 >= x._3 - 1e-9)
      case _ => ()
    }
  }

  // -------------------------------------------- q400 permutation test

  test("permutationTest: a planted separation gives the minimum " +
      "attainable p, a degenerate null gives p = 1") {
    // A sits 100 above B: no fixed-size relabeling can reach the
    // observed diff, so n_extreme = 0 and p = 1/(B+1)
    val sep = ((1 to 20).map(i => (i.toLong, 100.0 + i, true)) ++
      (21 to 40).map(i => (i.toLong, 0.0 + i - 20, false)))
      .toDF("uid", "v", "grp")
    val r1 = DriftOps.permutationTest(sep, "uid", "v", col("grp"))
      .select("n_a", "n_b", "n_extreme", "p_value")
      .as[(Long, Long, Long, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r1._1 == 20L && r1._2 == 20L)
    assert(r1._3 == 0L && r1._4 == r6(1.0 / 65.0))
    // identical values: every relabeling ties the observed 0 -> p = 1
    val nul = (1 to 40).map(i => (i.toLong, 7.0, i % 2 == 0))
      .toDF("uid", "v", "grp")
    val r2 = DriftOps.permutationTest(nul, "uid", "v", col("grp"))
      .select("obs_diff", "n_extreme", "p_value")
      .as[(Double, Long, Double)].head()
    assert(r2._1 == 0.0 && r2._2 == 64L && r2._3 == 1.0)
  }

  // ------------------------------------------- q402 cartography

  test("trainingCartography maps clean examples easy and planted " +
      "label noise hard") {
    val rows = (1 to 30).map(_ => (5.0, 1.0)) ++
      (1 to 30).map(_ => (-5.0, 0.0)) ++
      (1 to 3).map(_ => (5.0, 0.0)) // mislabeled
    val d = rows.toDF("x", "y")
    val r = graft.ml.MlPipelines.trainingCartography(d, "x", "y")
      .select("n_examples", "n_easy", "n_hard", "n_ambiguous")
      .as[(Long, Long, Long, Long)].head()
    assert(r._1 == 63L)
    assert(r._2 >= 55L, s"easy=${r._2}")
    assert(r._3 >= 3L, s"hard=${r._3}")
  }

  // --------------------------------------- q403/q404 survival + RFM

  test("competingRisks matches the hand-worked three-subject table " +
      "and the AJ identity") {
    // t=1 cause1; t=2 cause2; t=3 censored
    val d = Seq((1L, 1), (2L, 2), (3L, 0)).toDF("dur", "cause")
    val r = graft.operators.SurvivalOps.competingRisks(d, "dur", "cause")
      .orderBy("t")
      .select("t", "n_risk", "survival", "cif_cause1", "cif_cause2")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0) == ((1L, 3L, r6(2.0 / 3.0), r6(1.0 / 3.0), 0.0)))
    assert(r(1) == ((2L, 2L, r6(1.0 / 3.0), r6(1.0 / 3.0),
      r6(1.0 / 3.0))))
    // censoring moves nothing; S + CIF1 + CIF2 == 1 throughout
    assert(r(2)._3 == r(1)._3 && r(2)._4 == r(1)._4 &&
      r(2)._5 == r(1)._5)
    r.foreach(x => assert(math.abs(x._3 + x._4 + x._5 - 1.0) < 1e-5))
  }

  test("rfmSegments codes the best and worst customers 555 and 111") {
    // customer i: i orders of amount 100*i, last on day i -> every
    // dimension ranks i monotonically
    val rows = (1 to 10).flatMap { i =>
      (1 to i).map(_ => (i.toLong, tsDay(i), 100.0 * i))
    }
    val d = rows.toDF("cust", "ts", "amt")
    val cells = graft.metrics.RankMetrics
      .rfmSegments(d, "cust", "ts", "amt")
      .select("r", "f", "m", "n_customers")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(cells.map(_._4).sum == 10L)
    assert(cells.contains((5L, 5L, 5L, 2L)), cells.toString) // cust 9,10
    assert(cells.contains((1L, 1L, 1L, 2L)), cells.toString) // cust 1,2
  }

  // --------------------------------------- q405 calibration slope

  test("calibration slope is ~1 for a calibrated scorer and ~0 for an " +
      "uninformative one") {
    // labels drawn (deterministically) AT the scorer's own rate
    val p1a = 1000003L
    val p2a = 9999991L
    def u(i: Long): Double = {
      val x1 = ((i % p1a) * 2654435761L) % p1a
      val x2 = ((x1 + i / p1a) % p2a * 22695477L) % p2a
      (x2.toDouble + 0.5) / p2a.toDouble
    }
    val rows = (1 to 2000).map { i =>
      val s = math.min(0.95, math.max(0.05, (i % 100) / 100.0))
      val y = if (u(i.toLong) < s) 1.0 else 0.0
      (math.log(s / (1.0 - s)), y)
    }
    val d = rows.toDF("x", "y")
    val cal = graft.ml.MlPipelines.irlsLogisticPortable(d, "x", "y",
        iters = 8)
      .orderBy(desc("iter")).select("b0", "b1")
      .as[(Double, Double)].head()
    assert(cal._2 > 0.8 && cal._2 < 1.2, s"slope=${cal._2}")
    assert(math.abs(cal._1) < 0.2, s"intercept=${cal._1}")
    // label independent of score -> slope collapses toward 0
    val flat = rows.zipWithIndex.map { case ((x, _), i) =>
      (x, if (i % 2 == 0) 1.0 else 0.0)
    }.toDF("x", "y")
    val f = graft.ml.MlPipelines.irlsLogisticPortable(flat, "x", "y",
        iters = 8)
      .orderBy(desc("iter")).select("b1").as[Double].head()
    assert(math.abs(f) < 0.1, s"flat slope=$f")
  }

  // ------------------------------------------- q406 Allen census

  test("allenCensus classifies all 13 relations and leaves no hole") {
    val aSpans = Seq(
      (1L, 0L, 2L), (2L, 0L, 5L), (3L, 0L, 6L), (4L, 5L, 6L),
      (5L, 6L, 7L), (6L, 6L, 8L), (7L, 5L, 8L), (8L, 9L, 10L),
      (9L, 8L, 10L), (10L, 6L, 10L), (11L, 5L, 10L), (12L, 4L, 10L),
      (13L, 4L, 8L)).toDF("k", "s", "e")
    val bSpans = (1L to 13L).map(k => (k, 5L, 8L)).toDF("k", "s", "e")
    val got = graft.operators.FuzzyJoins
      .allenCensus(aSpans, bSpans, Seq("k"), "s", "e")
      .select("relation", "n").as[(String, Long)].collect().toMap
    val want = Seq("precedes", "meets", "overlaps", "starts", "during",
      "finishes", "equals", "preceded_by", "met_by", "overlapped_by",
      "started_by", "contains", "finished_by")
    assert(got.keySet == want.toSet, got.toString)
    assert(got.values.forall(_ == 1L))
  }

  private def tsDay(d: Int): Timestamp = new Timestamp(
    java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)

  test("scdType2 treats null attribute values as a tracked run") {
    val d = Seq(
      (1L, ts(1), 1L, None: Option[String]),
      (1L, ts(2), 2L, None),
      (1L, ts(3), 3L, Some("A")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = CdcOps.scdType2(d, "user_id", "ts", "event_id", "event_type")
      .orderBy("version")
      .select("event_type", "version", "is_current")
      .as[(Option[String], Long, Boolean)].collect().toSeq
    assert(r == Seq((None, 1L, false), (Some("A"), 2L, true)))
  }
}
