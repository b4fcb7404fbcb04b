package graft

import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

class TimeSeriesDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def daily(countsByDay: Seq[Int]) = {
    val rows = countsByDay.zipWithIndex.flatMap { case (n, d) =>
      val day = java.time.LocalDate.of(2024, 5, 1).plusDays(d.toLong)
      Seq.fill(n)(s"${day}T08:00:00")
    }
    rows.toDF("ts").select(col("ts").cast("timestamp").as("ts"))
  }

  test("ljungBoxDailyCounts: Q(1) matches the closed form and Q is " +
    "nondecreasing in h") {
    val df = daily((0 until 30).map(d => 2 + (d % 5) * 3))
    val acf1 = TimeSeriesOps.dailyCountAcf(df, "ts", 4)
      .filter(col("lag") === 1).select("acf").as[Double].head()
    val card = TimeSeriesOps.ljungBoxDailyCounts(df, "ts", maxLag = 4)
      .orderBy("lag").select("lag", "acf", "q_lb")
      .as[(Long, Double, Double)].collect()
    assert(card.length == 4)
    val n = 30.0
    val expQ1 = BigDecimal(n * (n + 2.0) *
      BigDecimal(acf1 * acf1 / (n - 1.0))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(card(0)._3 - expQ1) < 1e-9)
    card.sliding(2).foreach { case Array(a, b) =>
      assert(b._3 >= a._3 - 1e-9, s"Q fell: ${a._3} -> ${b._3}")
    }
  }

  test("durbinWatsonDailyTrend: alternating residuals push DW " +
    "toward 4, clumped residuals toward 0") {
    val alt = daily((0 until 24).map(d => if (d % 2 == 0) 5 else 1))
    val dwAlt = TimeSeriesOps.durbinWatsonDailyTrend(alt, "ts")
      .select("dw").as[Double].head()
    assert(dwAlt > 3.0, s"alternating DW should be near 4, got $dwAlt")
    // step series: detrended residuals stay same-signed in long runs
    val step = daily(Seq.fill(12)(1) ++ Seq.fill(12)(9))
    val dwStep = TimeSeriesOps.durbinWatsonDailyTrend(step, "ts")
      .select("dw").as[Double].head()
    assert(dwStep < 1.5, s"step DW should be small, got $dwStep")
  }

  test("durbinWatsonDailyTrend: slope/intercept recover a noisy " +
    "linear trend") {
    val df = daily((0 until 20).map(d => 3 + d + (d % 2)))
    val r = TimeSeriesOps.durbinWatsonDailyTrend(df, "ts")
      .select("n_days", "slope", "intercept")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 20L)
    assert(math.abs(r._2 - 1.0) < 0.1)
    assert(math.abs(r._3 - 3.5) < 1.0)
  }

  test("runsTestDailyCounts: alternating series maximizes runs, " +
    "clumped series gives 2 runs") {
    val alt = daily((0 until 20).map(d => if (d % 2 == 0) 5 else 1))
    val rAlt = TimeSeriesOps.runsTestDailyCounts(alt, "ts")
      .select("n_days_used", "n_above", "n_below", "runs", "e_runs", "z")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    // median = 3, nothing at the median: all 20 days used, R = 20
    assert(rAlt._1 == 20L && rAlt._2 == 10L && rAlt._3 == 10L)
    assert(rAlt._4 == 20L)
    assert(math.abs(rAlt._5 - 11.0) < 1e-9)
    assert(rAlt._6 > 3.0)
    val clump = daily(Seq.fill(10)(1) ++ Seq.fill(10)(5))
    val rc = TimeSeriesOps.runsTestDailyCounts(clump, "ts")
      .select("runs", "z").as[(Long, Double)].head()
    assert(rc._1 == 2L && rc._2 < -3.0)
  }

  test("runsTestDailyCounts: days at the median drop") {
    // counts 1,2,3 repeated: median = 2, those days are excluded
    val df = daily((0 until 21).map(d => 1 + (d % 3)))
    val r = TimeSeriesOps.runsTestDailyCounts(df, "ts")
      .select("n_days_used", "n_above", "n_below")
      .as[(Long, Long, Long)].head()
    assert(r._1 == 14L && r._2 == 7L && r._3 == 7L)
  }
}
