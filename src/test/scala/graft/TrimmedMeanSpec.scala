package graft

import graft.operators.RobustStats

/** Trimmed/winsorized mean card (q258): hand-computed values including
  * boundary-tie mass, and the domain-contract guard.
  */
class TrimmedMeanSpec extends SparkSpec {
  import spark.implicits._

  test("trimmedMeanCard: hand-computed card with distinct boundaries") {
    // sorted: 1,2,2,2,3,100; k = ⌊6/6⌋ = 1 → lo = 2 (rank 2),
    // hi = 3 (rank 5); trimmed = (110−1−100)/4, winsor = (9+2+3)/6
    val df = Seq(1.0, 2.0, 2.0, 2.0, 3.0, 100.0).toDF("v")
    val r = RobustStats.trimmedMeanCard(df, "v", 1L, 6L).head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 1L)
    assert(r.getLong(2) == 2000000L && r.getLong(3) == 3000000L)
    assert(r.getDouble(4) == 18.333333)   // raw 110/6
    assert(r.getDouble(5) == 2.25)        // trimmed 9/4
    assert(r.getDouble(6) == 2.333333)    // winsorized 14/6
  }

  test("trimmedMeanCard: tie mass at the boundary is assigned by rank") {
    // sorted: 5,5,5,5,5,9; lo = hi = 5 — rank arithmetic must drop
    // exactly ONE 5 below and the 9 above
    val df = Seq(5.0, 5.0, 5.0, 5.0, 5.0, 9.0).toDF("v")
    val r = RobustStats.trimmedMeanCard(df, "v", 1L, 6L).head()
    assert(r.getDouble(5) == 5.0 && r.getDouble(6) == 5.0)
    assert(r.getDouble(4) == 5.666667)    // raw 34/6
  }

  test("trimmedMeanCard: out-of-contract magnitude fails loudly") {
    val df = Seq(1.0, 5.0e12).toDF("v")
    val e = intercept[Exception] {
      RobustStats.trimmedMeanCard(df, "v", 1L, 4L).head()
    }
    assert(e.getMessage.contains("micro-scaling contract"))
  }
}
