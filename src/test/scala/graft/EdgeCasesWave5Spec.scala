package graft

import org.apache.spark.sql.functions._
import graft.metrics.MetricQueries
import graft.operators.{RobustStats, SplitOps}

/** Round-4 degenerate-input hardening (round-3 ADVICE items): non-positive
  * sampling weights, empty selection frames, and single-label kappa must
  * yield defined (null-carrying) results, never a throw and never a
  * silently-wrong number.
  */
class EdgeCasesWave5Spec extends SparkSpec {
  import spark.implicits._

  test("prioritySample: zero/negative weights rank last, never throw") {
    // one good row and two degenerate ones; k=1 must pick the positive
    val df = Seq((1L, 0.0), (2L, -3.0), (3L, 5.0)).toDF("id", "w")
    val top = SplitOps.prioritySample(df, "id", "w", 1).collect()
    assert(top.length == 1 && top.head.getLong(0) == 3L)
    // k covering everything still returns all rows (degenerates kept, last)
    assert(SplitOps.prioritySample(df, "id", "w", 10).count() == 3)
    // all-degenerate input: defined result, deterministic id tie-break
    val bad = Seq((7L, 0.0), (8L, 0.0)).toDF("id", "w")
    val one = SplitOps.prioritySample(bad, "id", "w", 1).collect()
    assert(one.length == 1 && one.head.getLong(0) == 7L)
  }

  test("exactMedianByCounting: empty frame reports n=0 with null median") {
    val empty = Seq.empty[Tuple1[Long]].toDF("v")
    val r = RobustStats.exactMedianByCounting(empty, "v").collect().head
    assert(r.getLong(0) == 0L)
    assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }

  test("cohenKappa: unanimous single label gives p_e=1 and null kappa") {
    val df = Seq(("x", "x"), ("x", "x"), ("x", "x")).toDF("r1", "r2")
    val r = MetricQueries.cohenKappa(df, "r1", "r2").collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0)
    assert(r.isNullAt(4))
  }
}
