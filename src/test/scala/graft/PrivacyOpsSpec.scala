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

  test("concentrationCard: hand-computed Gini and top shares on a " +
      "head-heavy corpus") {
    // 99 docs of mass 1 + one of mass 901: G = 2·95050/100000 − 1.01
    val df = (Seq.fill(99)(1L) :+ 901L).zipWithIndex
      .map { case (m, i) => (i.toLong, m) }.toDF("id", "mass")
    val r = ProfileOps.concentrationCard(df, col("mass")).head()
    assert(r.getLong(0) == 100L && r.getLong(1) == 1000L)
    assert(r.getDouble(2) == 0.891)
    assert(r.getDouble(3) == 0.901)  // top-1% = the mega-doc
    assert(r.getDouble(4) == 0.91)   // top-10% adds 9 unit docs
  }

  test("concentrationCard: equal masses give Gini 0 and proportional " +
      "shares") {
    val df = (1L to 50L).map(i => (i, 7L)).toDF("id", "mass")
    val r = ProfileOps.concentrationCard(df, col("mass")).head()
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(4) == 0.1)    // top-10% of equal docs holds 10%
  }

  test("tClosenessCard: hand-computed TVD on skewed groups") {
    // global dist {a:4, b:4}; each group holds only one value →
    // TVD = ½(|1−½| + |0−½|) = 0.5 per group, both above t = 1/5
    val df = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g2", "b")))
      .toDF("q", "s")
    val r = ProfileOps.tClosenessCard(df, Seq("q"), col("s"), 1L, 5L)
      .head()
    assert(r.getDouble(0) == 0.2)     // t
    assert(r.getLong(1) == 8L)        // n_rows
    assert(r.getLong(2) == 2L)        // n_groups
    assert(r.getDouble(3) == 0.5)     // max_tvd
    assert(r.getLong(4) == 2L && r.getLong(5) == 8L)
    assert(r.getDouble(6) == 1.0)     // frac_rows_above_t
  }

  test("tClosenessCard: groups matching the global dist have TVD 0") {
    val df = (Seq.fill(2)(("g1", "a")) ++ Seq.fill(2)(("g1", "b")) ++
      Seq.fill(2)(("g2", "a")) ++ Seq.fill(2)(("g2", "b"))).toDF("q", "s")
    val r = ProfileOps.tClosenessCard(df, Seq("q"), col("s"), 1L, 5L)
      .head()
    assert(r.getDouble(3) == 0.0 && r.getLong(4) == 0L)
    assert(r.getDouble(6) == 0.0)
  }

  test("tClosenessCard: exact threshold boundary is NOT above t") {
    // group g1 {a,a,a,b} vs global {a:6,b:2}: p=(¾,¼) q=(¾,¼) → 0; make
    // a group whose TVD is exactly t and assert the strict > verdict
    // TVD(g)=t exactly: g1={a,a,a,a,a,b,b,b} p=(5/8,3/8), global
    // {a:10,b:6} q=(5/8,3/8) → 0 … simpler: single group vs itself is
    // always 0; exactness of the verdict is covered by the rational
    // comparison: t = 1/2 with the skewed corpus above gives TVD = ½ = t
    val df = (Seq.fill(4)(("g1", "a")) ++ Seq.fill(4)(("g2", "b")))
      .toDF("q", "s")
    val r = ProfileOps.tClosenessCard(df, Seq("q"), col("s"), 1L, 2L)
      .head()
    assert(r.getDouble(3) == 0.5)
    assert(r.getLong(4) == 0L, "TVD == t must not count as above t")
  }
}
