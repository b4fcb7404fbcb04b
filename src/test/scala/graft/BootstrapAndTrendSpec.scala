package graft

import org.apache.spark.sql.functions._
import graft.operators.RobustStats

/** Hand-checked fixtures for the uncertainty/trend pair: the seeded
  * Poisson bootstrap (exact degenerate cases + distributional sanity)
  * and the Theil–Sen daily trend (noiseless recovery + breakdown
  * robustness vs OLS).
  */
class BootstrapAndTrendSpec extends SparkSpec {
  import spark.implicits._

  test("poissonBootstrapMeans: constant group is exactly degenerate") {
    // every replicate mean of a constant column IS the constant —
    // lo = hi = mean, se = 0, regardless of the drawn weights
    val df = (1 to 200).map(i => (i.toLong, "g", 5.0)).toDF("id", "g", "x")
    val r = RobustStats.poissonBootstrapMeans(df, col("id"), "x", "g")
      .collect().head
    assert(r.getLong(1) == 200L)
    assert(r.getDouble(2) == 5.0)
    assert(r.getLong(3) == 64L)
    assert(r.getDouble(4) == 5.0 && r.getDouble(5) == 5.0)
    assert(r.getDouble(6) == 0.0)
  }

  test("poissonBootstrapMeans: CI brackets, se sane, partition-invariant") {
    val df = (1 to 400).map(i => (i.toLong, "g", (i % 10).toDouble))
      .toDF("id", "g", "x")
    val a = RobustStats.poissonBootstrapMeans(df, col("id"), "x", "g")
      .collect().head
    val b = RobustStats.poissonBootstrapMeans(df.repartition(13),
      col("id"), "x", "g").collect().head
    assert(a == b)
    assert(a.getDouble(4) <= a.getDouble(2) && a.getDouble(2) <=
      a.getDouble(5), s"CI [${a.getDouble(4)}, ${a.getDouble(5)}] " +
      s"should bracket ${a.getDouble(2)}")
    // σ/√n ≈ 2.87/20 ≈ 0.14 — the bootstrap SE should be in that decade
    assert(a.getDouble(6) > 0.03 && a.getDouble(6) < 0.6)
  }

  test("poissonBootstrapMeans: drawn weights average near 1") {
    // indirect check through the machinery: the bootstrap means of a
    // linear column must center on the true mean, not drift with the
    // weight distribution's mass
    val df = (1 to 500).map(i => (i.toLong, "g", i.toDouble)).toDF("id", "g", "x")
    val r = RobustStats.poissonBootstrapMeans(df, col("id"), "x", "g")
      .collect().head
    val trueMean = 250.5
    assert(math.abs((r.getDouble(4) + r.getDouble(5)) / 2.0 - trueMean) <
      trueMean * 0.1)
  }

  test("theilSenDailyTrend: noiseless linear counts recovered exactly") {
    // day d carries d+1 events → every pair slope is 1
    val rows = for { d <- 0 until 10; i <- 0 to d }
      yield (d.toLong * 86400000000L + i, "e")
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = RobustStats.theilSenDailyTrend(df, "ts").collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 45L)
    assert(r.getDouble(2) == 1.0)
    assert(r.getDouble(3) == 1.0)
  }

  test("theilSenDailyTrend: one crazy day moves OLS, not the median") {
    // linear d+1 counts over days 0..9, then an endpoint day 10 with
    // 200 events — maximal leverage on OLS; the pair-slope median
    // still sees 45 unit slopes below the 10 inflated ones
    val rows = (for { d <- 0 until 10; i <- 0 to d }
      yield (d.toLong * 86400000000L + i, "e")) ++
      (0 until 200).map(i => (10L * 86400000000L + i, "e"))
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = RobustStats.theilSenDailyTrend(df, "ts").collect().head
    assert(r.getLong(0) == 11L && r.getLong(1) == 55L)
    assert(r.getDouble(2) == 1.0, s"median slope ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.0) > 0.5,
      s"OLS should be dragged, got ${r.getDouble(3)}")
  }

  test("theilSenDailyTrend: gap day enters as zero volume") {
    // events on days 0 and 2 only: spine [0,1,2] with x = 3,0,3 →
    // slopes {-3, 0, 3} → median 0
    val rows = Seq(0L, 2L).flatMap(d =>
      (0 until 3).map(i => (d * 86400000000L + i, "e")))
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = RobustStats.theilSenDailyTrend(df, "ts").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 0.0)
  }
}
