package graft

import org.apache.spark.sql.functions._
import graft.functions.Stats._

/** Stats aggregate helpers: exact sums, bias-corrected moments (pandas
  * G1/G2 parity — hand-computed expected values), null paths.
  */
class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("dsum is exact on money-like doubles") {
    // 0.1 + 0.2 in double is 0.30000000000000004; decimal accumulation
    // must yield exactly 0.3.
    val df = Seq(0.1, 0.2).toDF("v")
    assert(df.agg(dsum($"v", 2)).head().getDouble(0) == 0.3)
  }

  test("davg divides the exact sum by the non-null count") {
    val df = Seq(Some(1.0), Some(2.0), None).toDF("v")
    assert(df.agg(davg($"v", 2)).head().getDouble(0) == 1.5)
  }

  test("stdRounded: sample stddev, null for n<2") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("v")
    // ddof=1 stddev of this classic set is 2.13809...
    assert(approx(df.agg(stdRounded($"v")).head().getDouble(0), 2.13809, 1e-5))
    assert(Seq(1.0).toDF("v").agg(stdRounded($"v")).head().isNullAt(0))
  }

  test("skewSample matches pandas Series.skew (bias-corrected G1)") {
    // pandas: pd.Series([1,2,3,4,10]).skew() = 1.697056274847714
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("v")
    assert(approx(df.agg(skewSample($"v")).head().getDouble(0),
      1.697056274847714, 1e-12))
    // null below min support n=3
    assert(Seq(1.0, 2.0).toDF("v").agg(skewSample($"v")).head().isNullAt(0))
  }

  test("kurtSample matches pandas Series.kurtosis (bias-corrected G2)") {
    // pandas: pd.Series([1,2,3,4,10]).kurtosis() = 3.1519999999999992
    val df = Seq(1.0, 2.0, 3.0, 4.0, 10.0).toDF("v")
    assert(approx(df.agg(kurtSample($"v")).head().getDouble(0),
      3.1519999999999992, 1e-12))
    assert(Seq(1.0, 2.0, 3.0).toDF("v").agg(kurtSample($"v")).head().isNullAt(0))
  }

  test("rowMean skips nulls and is null when all inputs are null") {
    val df = Seq(
      (Some(1.0), Some(3.0)),
      (Some(5.0), None),
      (None: Option[Double], None: Option[Double])).toDF("a", "b")
    val out = df.select(rowMean($"a", $"b")).collect()
    assert(out(0).getDouble(0) == 2.0)
    assert(out(1).getDouble(0) == 5.0)
    assert(out(2).isNullAt(0))
  }
}
