package graft

import org.apache.spark.sql.functions._
import graft.operators.{DriftOps, SurvivalOps}

/** Wasserstein-1 (q297), energy distance (q298), log-rank (q299):
  * hand-computed statistics, tie handling, bucket-stitch invariance, and
  * the grid-size contract.
  */
class DistanceAndLogRankSpec extends SparkSpec {
  import spark.implicits._

  private def w1(vals: Seq[(Double, String)], buckets: Int = 32) =
    DriftOps.wasserstein1d(vals.toDF("value", "g"), "value", "g",
      "A", "B", buckets).head()

  private def en(vals: Seq[(Double, String)], buckets: Int = 32) =
    DriftOps.energyDistance(vals.toDF("value", "g"), "value", "g",
      "A", "B", buckets).head()

  test("wasserstein1d: unit shift gives W1 = 1") {
    // A={0,1}, B={1,2}: |F gaps| are 0.5 on [0,1) and 0.5 on [1,2)
    val r = w1(Seq(0.0 -> "A", 1.0 -> "A", 1.0 -> "B", 2.0 -> "B"))
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)
  }

  test("wasserstein1d: identical samples give 0; degenerate support ok") {
    assert(w1(Seq(1.0 -> "A", 2.0 -> "A", 1.0 -> "B", 2.0 -> "B"))
      .getDouble(2) == 0.0)
    // all mass on one point: single grid row, no next_v
    assert(w1(Seq(3.0 -> "A", 3.0 -> "B")).getDouble(2) == 0.0)
  }

  test("wasserstein1d: bucket stitching is invisible (1 vs 8 buckets)") {
    val vals = (1 to 40).map(i => (i * 0.75, if (i % 3 == 0) "A" else "B"))
    assert(w1(vals, buckets = 1) == w1(vals, buckets = 8))
  }

  test("energyDistance: two point masses at distance 2 give D = 4") {
    val r = en(Seq(0.0 -> "A", 2.0 -> "B"))
    assert(r.getDouble(2) == 2.0)   // e_cross = E|X−Y|
    assert(r.getDouble(3) == 4.0)   // D = 2·2 − 0 − 0
    assert(r.getDouble(4) == 2.0)   // (1·1/2)·D
  }

  test("energyDistance: interleaved pairs, hand-computed moments") {
    // A={0,2}, B={1,3}: E|XY|=1.5, E|XX|=E|YY|=1 → D=1, stat=1
    val r = en(Seq(0.0 -> "A", 2.0 -> "A", 1.0 -> "B", 3.0 -> "B"))
    assert(r.getDouble(2) == 1.5)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 1.0)
  }

  test("energyDistance: identical distributions give D = 0 (ties exact)") {
    val vals = Seq("A", "B").flatMap(g =>
      Seq(1.0 -> g, 2.0 -> g, 3.0 -> g))
    val r = en(vals)
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0)
    // and the cross moment is the shared within moment: 8/9
    assert(r.getDouble(2) == 0.888889)
  }

  test("energyDistance: bucket stitching is invisible (1 vs 8 buckets)") {
    val vals = (1 to 40).map(i => (i * 1.25, if (i % 4 == 0) "A" else "B"))
    assert(en(vals, buckets = 1) == en(vals, buckets = 8))
  }

  test("logRankTest: balanced risk sets give chi2 = 0") {
    // t=1: dA=dB=1, nA=nB=2 → eA=1, var=1/3; t=3: nA=0 → eA=0, var=0
    val df = Seq((1L, true, true), (2L, false, true),
      (1L, true, false), (3L, true, false))
      .toDF("dur", "ev", "isa")
    val r = SurvivalOps.logRankTest(df, "dur", "ev", col("isa")).head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 1.0)        // expected_a
    assert(r.getDouble(3) == 0.0)        // obs − exp
    assert(r.getDouble(4) == 0.333333)   // hypergeometric var at t=1
    assert(r.getDouble(5) == 0.0)        // chi2
  }

  test("logRankTest: all events in cohort A, hand-computed chi2 = 3") {
    // t=1: d=2 (all A), nA=nB=2 → eA=1, oma=1, var=1/3 → chi2=3
    val df = Seq((1L, true, true), (1L, true, true),
      (5L, false, false), (5L, false, false))
      .toDF("dur", "ev", "isa")
    val r = SurvivalOps.logRankTest(df, "dur", "ev", col("isa")).head()
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L)
    assert(r.getDouble(3) == 1.0)
    assert(r.getDouble(4) == 0.333333)
    assert(r.getDouble(5) == 3.0)
  }

  test("logRankTest: grid-size contract is enforced") {
    val df = (1 to 50).map(i => (i.toLong, true, i % 2 == 0))
      .toDF("dur", "ev", "isa")
    val e = intercept[IllegalArgumentException] {
      SurvivalOps.logRankTest(df, "dur", "ev", col("isa"),
        maxGridSize = 10L).head()
    }
    assert(e.getMessage.contains("grid too fine"))
  }
}
