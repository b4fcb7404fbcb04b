package graft

import org.apache.spark.sql.functions._
import graft.metrics.MetricQueries
import graft.operators.{RobustStats, TextOps}

/** Fairness card (q309), POT/GPD tail (q310), hash-collision sweep
  * (q311): hand-computed group rates, exact method-of-moments tail fit,
  * and pigeonhole invariants.
  */
class FairnessAndTailSpec extends SparkSpec {
  import spark.implicits._

  test("fairnessCard: hand-computed rates and gaps") {
    // A: tp=2 fp=1 fn=1 tn=1 (n=5); B: tp=0 fp=0 fn=2 tn=3 (n=5)
    val df = Seq(
      ("A", true, true), ("A", true, true), ("A", false, true),
      ("A", true, false), ("A", false, false),
      ("B", true, false), ("B", true, false),
      ("B", false, false), ("B", false, false), ("B", false, false))
      .toDF("g", "y", "p")
    val rows = MetricQueries.fairnessCard(df, "g", col("y"), col("p"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = rows("A")
    assert(a.getDouble(2) == 0.6)               // selection rate 3/5
    assert(a.getDouble(4) == 0.666667)          // tpr 2/3
    assert(a.getDouble(8) == 0.666667)          // predictive parity 2/3
    val b = rows("B")
    assert(b.getDouble(2) == 0.0)
    assert(b.getDouble(4) == 0.0)               // tpr 0/2
    assert(b.isNullAt(8))                       // no predictions → null
    // pooled selection rate = 3/10 → dp gaps ±0.3
    assert(a.getDouble(3) == 0.3 && b.getDouble(3) == -0.3)
  }

  test("potGpdTail: exact method-of-moments on crafted excesses") {
    // 57 mass points at 10.0 (k = 19·60/20 = 57 → u = 10.0), excesses
    // {1,2,3} → m=2, s²=1, ξ = ½(1−4) = −1.5, σ = 2·2.5 = 5
    val df = (Seq.fill(57)(10.0) ++ Seq(11.0, 12.0, 13.0)).toDF("v")
    val r = RobustStats.potGpdTail(df, "v").head()
    assert(r.getLong(0) == 60L)
    assert(r.getDouble(1) == 10.0)       // threshold
    assert(r.getLong(2) == 3L)           // n_exceed
    assert(r.getDouble(3) == 2.0)        // mean excess
    assert(r.getDouble(4) == -1.5)       // xi
    assert(r.getDouble(5) == 5.0)        // sigma
    // return level: 10 + 5/(−1.5)·(50^{−1.5} − 1)
    val expected = 10.0 + 5.0 / -1.5 *
      (math.exp(-1.5 * math.log(3.0 / (60.0 * 0.001))) - 1.0)
    assert(math.abs(r.getDouble(6) - expected) < 1e-5)
  }

  test("hashCollisionSweep: pigeonhole and conservation invariants") {
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val rows = TextOps.hashCollisionSweep(df, "text", Seq(2, 64))
      .collect()
    rows.foreach { r =>
      val (dim, nTerms, used, coll) =
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nTerms == 6L)
      assert(used <= math.min(nTerms, dim.toLong))
      // every bucket beyond the singletons holds colliding terms
      assert(coll == nTerms - (2 * used - nTerms) ||
        coll >= nTerms - used)
    }
    // dim=2 with 6 terms MUST collide (pigeonhole)
    assert(rows.find(_.getInt(0) == 2).get.getLong(3) >= 4L)
  }

  test("hashCollisionSweep: mass share weights by occurrences") {
    // one dominant term: if it collides, mass share >> term rate
    val df = Seq((1L, ("x " * 50) + "y z w v u t s r q p o n m l"))
      .toDF("doc_id", "text")
    val r = TextOps.hashCollisionSweep(df, "text", Seq(4)).head()
    assert(r.getLong(1) == 15L)          // distinct terms
    assert(r.getDouble(4) > 0.0)         // collisions at dim 4 certain
  }
}
