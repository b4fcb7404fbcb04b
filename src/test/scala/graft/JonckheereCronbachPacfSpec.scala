package graft

import org.apache.spark.sql.functions._
import graft.operators.{DriftOps, ProfileOps, TimeSeriesOps}

class JonckheereCronbachPacfSpec extends SparkSpec {
  import spark.implicits._

  test("jonckheereTerpstra: perfectly ordered groups, no ties") {
    // g1=(1,2) < g2=(3,4) < g3=(5,6): every cross-group pair ascends,
    // J = 4+4+4 = 12; E[J] = (36-12)/4 = 6; Var = A/72 with
    // A = 6*5*17 - 3*(2*1*9) = 456 -> 6.333333
    val df = Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0),
      ("c", 5.0), ("c", 6.0)).toDF("g", "v")
    val r = DriftOps.jonckheereTerpstra(df, "v", "g")
      .select("n", "k", "j_stat", "e_j", "var_j", "z")
      .as[(Long, Long, Double, Double, Double, Double)].head()
    assert(r._1 == 6L && r._2 == 3L)
    assert(r._3 == 12.0)
    assert(r._4 == 6.0)
    assert(math.abs(r._5 - 456.0 / 72.0) < 1e-6)
    assert(math.abs(r._6 - 6.0 / math.sqrt(456.0 / 72.0)) < 1e-6)
  }

  test("jonckheereTerpstra: ties count half") {
    // g1=(1,1), g2=(1,2): pairs (1,1)+(1,2)+(1,1)+(1,2) ->
    // 0.5+1+0.5+1 = 3
    val df = Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0))
      .toDF("g", "v")
    val r = DriftOps.jonckheereTerpstra(df, "v", "g")
      .select("j_stat").as[Double].head()
    assert(r == 3.0)
  }

  test("jonckheereTerpstra: reversed ordering gives J below E[J]") {
    val df = Seq(("a", 5.0), ("a", 6.0), ("b", 3.0), ("b", 4.0),
      ("c", 1.0), ("c", 2.0)).toDF("g", "v")
    val r = DriftOps.jonckheereTerpstra(df, "v", "g")
      .select("j_stat", "e_j", "z").as[(Double, Double, Double)].head()
    assert(r._1 == 0.0 && r._2 == 6.0 && r._3 < 0.0)
  }

  test("cronbachAlpha: two perfectly correlated items") {
    // y = 2x => r = 1 => alpha_std = 1; raw = 2*(1 - 5/9) = 8/9
    val df = Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0)).toDF("x", "y")
    val r = ProfileOps.cronbachAlpha(df, Seq("x", "y"))
      .select("n", "k", "alpha_raw", "alpha_std", "mean_inter_item_r")
      .as[(Long, Int, Double, Double, Double)].head()
    assert(r._1 == 3L && r._2 == 2)
    assert(math.abs(r._3 - 8.0 / 9.0) < 1e-6)
    assert(math.abs(r._4 - 1.0) < 1e-6)
    assert(math.abs(r._5 - 1.0) < 1e-6)
  }

  test("cronbachAlpha: uncorrelated items give alpha near 0, " +
    "null rows drop listwise") {
    // x and y orthogonal over a balanced design: cov = 0 -> r = 0 ->
    // alpha_std = 0; raw alpha = 2*(1 - 1) = 0 since totVar = sum of
    // item vars when cov = 0. One null row must drop entirely.
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0), (1.0, 2.0), (2.0, 1.0), (2.0, 2.0), (3.0, null))
      .toDF("x", "y")
    val r = ProfileOps.cronbachAlpha(df, Seq("x", "y"))
      .select("n", "alpha_raw", "alpha_std")
      .as[(Long, Double, Double)].head()
    assert(r._1 == 4L)
    assert(math.abs(r._2) < 1e-9 && math.abs(r._3) < 1e-9)
  }

  test("cronbachAlpha: fewer than 2 items fails loudly") {
    val e = intercept[IllegalArgumentException] {
      ProfileOps.cronbachAlpha(Seq(1.0).toDF("x"), Seq("x"))
    }
    assert(e.getMessage.contains("at least 2 items"))
  }

  test("pacfDurbinLevinson matches an independent recursion on the " +
    "same ACF card, and pacf(1) == acf(1)") {
    // 40 distinct days of counts with a strong weekly + parity pattern
    val days = (0 until 40).flatMap { d =>
      val n = 3 + (d % 7) + (if (d % 2 == 0) 2 else 0)
      val day = java.time.LocalDate.of(2024, 3, 1).plusDays(d.toLong)
      Seq.fill(n)(s"${day}T12:00:00")
    }
    val df = days.toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val acf = TimeSeriesOps.dailyCountAcf(df, "ts", maxLag = 4)
      .orderBy("lag").select("acf").as[Double].collect()
    def r9(v: Double): Double = new java.math.BigDecimal(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    // independent textbook Durbin-Levinson (same rounding contract)
    var phi = Vector(r9(acf(0)))
    var expect = Vector(phi(0))
    for (k <- 2 to 4) {
      val num = acf(k - 1) -
        (1 until k).map(j => phi(j - 1) * acf(k - j - 1)).sum
      val den = 1.0 - (1 until k).map(j => phi(j - 1) * acf(j - 1)).sum
      val pkk = r9(num / den)
      phi = (1 until k).map(j =>
        r9(phi(j - 1) - pkk * phi(k - j - 1))).toVector :+ pkk
      expect = expect :+ pkk
    }
    val got = TimeSeriesOps.pacfDurbinLevinson(df, "ts", maxLag = 4)
      .orderBy("lag").select("pacf").as[Double].collect()
    assert(got.length == 4)
    assert(math.abs(got(0) - r9(acf(0))) < 5e-7)
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-5, s"pacf mismatch: $g vs $e")
    }
  }

  test("pacfDurbinLevinson: maxLag beyond series span fails loudly") {
    val df = Seq("2024-03-01T00:00:00", "2024-03-02T00:00:00",
      "2024-03-02T01:00:00", "2024-03-03T00:00:00",
      "2024-03-03T01:00:00", "2024-03-03T02:00:00")
      .toDF("ts").select(col("ts").cast("timestamp").as("ts"))
    val e = intercept[IllegalArgumentException] {
      TimeSeriesOps.pacfDurbinLevinson(df, "ts", maxLag = 10)
    }
    assert(e.getMessage.contains("ACF returned"))
  }
}
