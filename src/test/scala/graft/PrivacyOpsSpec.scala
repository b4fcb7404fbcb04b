package graft

import org.apache.spark.sql.functions._
import graft.operators.ProfileOps

/** l-diversity audit (q236) and seeded-Laplace DP histogram (q237):
  * hand-computed cards, the k-anonymity blind spot l-diversity exists to
  * catch, determinism of the seeded noise, and ε scaling.
  */
class PrivacyOpsSpec extends SparkSpec {
  import spark.implicits._

  test("lDiversityCard hand-computed, catches the k-anonymity blindspot") {
    // group A: sensitive {1,1,2,3} -> 3 distinct, modal 2/4
    // group B: sensitive {7,7,7}   -> 1 distinct (l-poor!) though its
    // SIZE (3) could pass a small-k anonymity gate
    val df = Seq(
      ("A", 1L), ("A", 1L), ("A", 2L), ("A", 3L),
      ("B", 7L), ("B", 7L), ("B", 7L)).toDF("q", "s")
    val r = ProfileOps.lDiversityCard(df, Seq("q"), col("s"), l = 3L).head()
    assert(r.getLong(r.fieldIndex("n_rows")) == 7L)
    assert(r.getLong(r.fieldIndex("n_groups")) == 2L)
    assert(r.getLong(r.fieldIndex("min_distinct_sensitive")) == 1L)
    assert(r.getLong(r.fieldIndex("n_groups_below_l")) == 1L)
    assert(r.getLong(r.fieldIndex("n_rows_below_l")) == 3L)
    assert(r.getDouble(r.fieldIndex("frac_rows_below_l")) == 0.428571)
    // group B is fully disclosive: modal 3/3
    assert(r.getDouble(r.fieldIndex("worst_disclosure")) == 1.0)
  }

  test("dpNoisyHistogram: deterministic seeded noise, exact arithmetic") {
    val df = (Seq.fill(30)("x") ++ Seq.fill(50)("y") ++ Seq.fill(20)("z"))
      .toDF("g")
    val a = ProfileOps.dpNoisyHistogram(df, "g").collect()
    val b = ProfileOps.dpNoisyHistogram(df.repartition(7), "g").collect()
    // seeded from the group KEY: identical under any partitioning/rerun
    assert(a.toSeq == b.toSeq)
    val byG = a.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(byG("x")._1 == 30L && byG("y")._1 == 50L && byG("z")._1 == 20L)
    // noisy = true + noise (both rounded at 6), noise actually nonzero
    a.foreach { r =>
      assert(math.abs(r.getDouble(3) - (r.getLong(1) + r.getDouble(2)))
        < 1e-9)
      assert(r.getDouble(2) != 0.0)
    }
    // different groups draw different noise
    assert(Set(byG("x")._2, byG("y")._2, byG("z")._2).size == 3)
  }

  test("dpNoisyHistogram: noise scales as 1/eps") {
    val df = Seq.fill(25)("k").toDF("g")
    val n1 = ProfileOps.dpNoisyHistogram(df, "g", eps = 1.0)
      .head().getDouble(2)
    val n4 = ProfileOps.dpNoisyHistogram(df, "g", eps = 4.0)
      .head().getDouble(2)
    assert(approx(n1 / 4.0, n4, 1e-5))
  }
}
