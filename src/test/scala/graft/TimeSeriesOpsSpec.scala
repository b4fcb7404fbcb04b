package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.TimeSeriesOps

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // one key, strictly increasing values 1,2,4,8 at hourly cadence
  private val series = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10L, 1.0),
    (1L, ts("2024-01-01 01:00:00"), 11L, 2.0),
    (1L, ts("2024-01-01 02:00:00"), 12L, 4.0),
    (1L, ts("2024-01-01 03:00:00"), 13L, 8.0),
  ).toDF("k", "ts", "id", "v")

  test("deltaStats: lag-1 deltas and deltas-of-deltas") {
    val r = TimeSeriesOps.deltaStats(series, "k", "ts", "id", "v").head()
    // deltas: 1,2,4 → mean 7/3; d2: 1,2 → mean 1.5
    assert(r.getAs[Long]("n_obs") == 4L)
    assert(r.getAs[Long]("n_deltas") == 3L)
    assert(approx(r.getAs[Double]("delta_mean"), 7.0 / 3))
    assert(approx(r.getAs[Double]("delta2_mean"), 1.5))
  }

  test("periodTrend: dispersion across per-bucket means") {
    val two = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0), // week of 2024-01-01
      (1L, ts("2024-01-02 00:00:00"), 3.0), // same ISO week → mean 2
      (1L, ts("2024-01-10 00:00:00"), 6.0), // next week → mean 6
    ).toDF("k", "ts", "v")
    val r = TimeSeriesOps.periodTrend(two, "k", "ts", "v", "week").head()
    assert(r.getAs[Long]("n_buckets") == 2L)
    assert(r.getAs[Double]("trend_range") == 4.0)
  }

  test("diurnalRange: range over hourly means") {
    val r = TimeSeriesOps.diurnalRange(series, "k", "ts", "v").head()
    assert(r.getAs[Long]("n_hours") == 4L)
    assert(r.getAs[Double]("daily_range") == 7.0) // 8 - 1
  }

  test("halvesTrend: ntile(2) halves, late minus early") {
    val r = TimeSeriesOps.halvesTrend(series, "k", "ts", "id", "v").head()
    assert(approx(r.getAs[Double]("early_mean"), 1.5))
    assert(approx(r.getAs[Double]("late_mean"), 6.0))
    assert(approx(r.getAs[Double]("trend_change"), 4.5))
  }

  test("halvesTrend: odd length gives the LATE half the extra element (len//2)") {
    // reference: mid = 5//2 = 2 → early [1,2], late [4,8,16]
    val odd = series.union(
      Seq((1L, ts("2024-01-01 04:00:00"), 14L, 16.0)).toDF("k", "ts", "id", "v"))
    val r = TimeSeriesOps.halvesTrend(odd, "k", "ts", "id", "v").head()
    assert(approx(r.getAs[Double]("early_mean"), 1.5)) // 1,2
    assert(approx(r.getAs[Double]("late_mean"), 28.0 / 3)) // 4,8,16
  }

  test("strideSample keeps rows 1, 1+s, 1+2s of each key's order") {
    val r = TimeSeriesOps.strideSample(series, "k", "ts", "id", 2)
      .select("id").as[Long].collect().sorted
    assert(r.toSeq == Seq(10L, 12L))
  }

  test("lastN keeps most recent rows") {
    val r = TimeSeriesOps.lastN(series, "k", "ts", "id", 2)
      .select("id").as[Long].collect().sorted
    assert(r.toSeq == Seq(12L, 13L))
  }

  test("deltaStats is invariant under input row permutation") {
    val shuffled = series.orderBy(rand(7))
    val a = TimeSeriesOps.deltaStats(series, "k", "ts", "id", "v").head()
    val b = TimeSeriesOps.deltaStats(shuffled, "k", "ts", "id", "v").head()
    assert(a.toSeq == b.toSeq)
  }

  test("dailyCountAcf: alternating series — negative lag-1, positive lag-2") {
    // counts 2,0,2,0,... over 8 days (gap days are the zeros — only
    // even days carry events); textbook acf of a period-2 square wave
    val rows = for {
      d <- 0 until 8 if d % 2 == 0
      i <- 0 until 2
    } yield (d.toLong * 86400000000L + i, "e")
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us")))
    val acf = TimeSeriesOps.dailyCountAcf(df, "ts", maxLag = 3)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // D=7 observed spine (day 0..6): 2,0,2,0,2,0,2 → μ=8/7
    // lag1: pairs 6, Σxx2=0; lag2: pairs 5, Σxx2=12 (2·2 × 3)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val mu = 8.0 / 7.0
    val den = 16.0 - 7.0 * mu * mu
    assert(acf(1L)._1 == 6L)
    assert(acf(1L)._2 == r6((0.0 - mu * (6.0 + 6.0) + 6.0 * mu * mu) / den))
    assert(acf(2L)._1 == 5L)
    assert(acf(2L)._2 == r6((12.0 - mu * (6.0 + 6.0) + 5.0 * mu * mu) / den))
  }

  test("dailyCountAcf: calendar spine zero-fills a hole, " +
    "partitioning-invariant") {
    // events on days 0 and 2 only → spine day 1 contributes x=0
    val rows = Seq(0L, 2L).flatMap(d =>
      (0 until 3).map(i => (d * 86400000000L + i, "e")))
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us")))
    val a = TimeSeriesOps.dailyCountAcf(df, "ts", maxLag = 2).collect()
    val b = TimeSeriesOps.dailyCountAcf(df.repartition(5), "ts", maxLag = 2)
      .collect()
    assert(a.toSeq == b.toSeq)
    // lag-2 pair set is exactly (day0, day2): n_pairs = 1
    assert(a.find(_.getLong(0) == 2L).get.getLong(1) == 1L)
  }

  test("seasonalDowCard: two clean weeks — exact indices, strength 1") {
    // days 4..17 since epoch = Mon 1970-01-05 .. Sun 1970-01-18; Mondays
    // carry mass 10, the rest 1 → zero within-dow variance → R² = 1
    val rows = (4 until 18).map { d =>
      val dow = (d + 3) % 7
      (d.toLong * 86400000000L, if (dow == 0) 10.0 else 1.0)
    }
    val df = rows.toDF("us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = TimeSeriesOps.seasonalDowCard(df, "ts", "v")
      .collect().map(r => r.getLong(0) -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.size == 7)
    assert(out.values.forall(_.getLong(1) == 2L))
    val mu = 32.0 / 14.0
    assert(out(0L).getDouble(2) == 10.0)
    assert(out(0L).getDouble(3) == r6(10.0 / mu))
    assert(out(1L).getDouble(3) == r6(1.0 / mu))
    out.values.foreach(r => assert(r.getDouble(4) == 1.0,
      s"strength ${r.getDouble(4)}"))
  }

  test("segmentedTrendFit: flat-then-ramp recovered exactly") {
    // days 0..9 carry 5 events, days 10..19 carry 5 + 3(d−10):
    // perfect two-segment fit at breakpoint day 9, slopes 0 and 3
    val rows = (0 until 20).flatMap { d =>
      val n = if (d < 10) 5 else 5 + 3 * (d - 10)
      (0 until n).map(i => (d.toLong * 86400000000L + i, "e"))
    }
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = TimeSeriesOps.segmentedTrendFit(df, "ts").collect().head
    assert(r.getLong(0) == 20L)
    assert(r.getDate(1).toString == "1970-01-10")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 3.0)
    assert(r.getDouble(5) == 0.0) // sse_two
    assert(r.getDouble(4) > 0.0)  // single line cannot fit
    assert(r.getDouble(6) == 1.0) // full SSE reduction
  }

  test("overdispersionCard: constant days VMR 0, bursty days VMR >> 1") {
    // constant 3/day over 6 days: variance 0
    val flat = (0 until 6).flatMap(d =>
      (0 until 3).map(i => (d.toLong * 86400000000L + i, "e")))
      .toDF("us", "e").withColumn("ts", timestamp_micros(col("us")))
    val f = TimeSeriesOps.overdispersionCard(flat, "ts").collect().head
    assert(f.getLong(0) == 6L)
    assert(f.getDouble(1) == 3.0 && f.getDouble(2) == 0.0)
    assert(f.getDouble(3) == 0.0)
    // burst: day 0 has 10 events, days 1..4 none (spine zero-fills) —
    // mean 2, var = (100 - 20)/4 = 20, VMR 10, χ² = 40
    val burst = (0 until 10).map(i => (i.toLong, "e")) :+
      (4L * 86400000000L, "e")
    val bdf = (burst.take(10) :+ (4L * 86400000000L, "e"))
      .toDF("us", "e").withColumn("ts", timestamp_micros(col("us")))
    val b = TimeSeriesOps.overdispersionCard(bdf, "ts").collect().head
    assert(b.getLong(0) == 5L)
    assert(b.getDouble(3) > 5.0, s"vmr ${b.getDouble(3)}")
  }
}
