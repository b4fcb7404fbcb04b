package graft

import org.apache.spark.sql.functions._
import graft.metrics.RankMetrics
import graft.operators.RobustStats

/** Hand-computed fixtures for the association screens: Spearman via
  * bucketed midranks and categorical mutual information.
  */
class AssociationSpec extends SparkSpec {
  import spark.implicits._

  test("spearman: monotone = 1, antitone = -1, constant = null") {
    val mono = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 25.0), (4.0, 70.0))
      .toDF("x", "y")
    assert(RankMetrics.spearman(mono, "x", "y").collect().head
      .getDouble(1) == 1.0)
    val anti = Seq((1.0, 9.0), (2.0, 7.0), (3.0, 5.0), (4.0, 1.0))
      .toDF("x", "y")
    assert(RankMetrics.spearman(anti, "x", "y").collect().head
      .getDouble(1) == -1.0)
    val const = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "y")
    assert(RankMetrics.spearman(const, "x", "y").collect().head.isNullAt(1))
  }

  test("spearman: tie midranks match the textbook tie-corrected value") {
    // x: 1,2,2,4 → ranks 1, 2.5, 2.5, 4; y: 10,20,20,40 → same ranks →
    // rho = 1 exactly under the tie-corrected (Pearson-on-midranks) form
    val tied = Seq((1.0, 10.0), (2.0, 20.0), (2.0, 20.0), (4.0, 40.0))
      .toDF("x", "y")
    val r = RankMetrics.spearman(tied, "x", "y").collect().head
    assert(r.getLong(0) == 4L && r.getDouble(1) == 1.0)
    // x: 1,2,2,4 vs shuffled y: 20,10,40,20 — hand Pearson on midranks
    // rx = (1, 2.5, 2.5, 4), ry = (2.5, 1, 4, 2.5)
    // n=4 sx=10 sy=10 sxy=(2.5+2.5+10+10)=25 sxx=syy=(1+6.25+6.25+16)=29.5
    // rho = (100-100)/ (4*29.5-100) = 0/18 = 0
    val mixed = Seq((1.0, 20.0), (2.0, 10.0), (2.0, 40.0), (4.0, 20.0))
      .toDF("x", "y")
    assert(RankMetrics.spearman(mixed, "x", "y").collect().head
      .getDouble(1) == 0.0)
  }

  test("mutualInformation: identical columns give MI = H, independence 0") {
    // identical two-level columns, p = (0.5, 0.5): MI = H = ln 2
    val same = Seq(("a", "a"), ("a", "a"), ("b", "b"), ("b", "b"))
      .toDF("u", "v")
    val r = RobustStats.mutualInformation(same, col("u"), col("v"))
      .collect().head
    val ln2 = BigDecimal(math.log(2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == ln2 && r.getDouble(2) == ln2)
    assert(r.getDouble(4) == 1.0) // NMI of a perfect dependency
    // exact independence: every (u, v) cell equally likely
    val indep = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"))
      .toDF("u", "v")
    val ri = RobustStats.mutualInformation(indep, col("u"), col("v"))
      .collect().head
    assert(ri.getDouble(1) == 0.0 && ri.getDouble(4) == 0.0)
  }

  test("mutualInformation: single-level column yields null NMI, zero MI") {
    val degenerate = Seq(("a", "x"), ("a", "y")).toDF("u", "v")
    val r = RobustStats.mutualInformation(degenerate, col("u"), col("v"))
      .collect().head
    assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    assert(r.isNullAt(4))
  }

  test("contingencyAssociation: perfect 2x2 association has V = T = 1") {
    // diagonal-only table: χ² = n, min dim 2 → V = √(n/n·1) = 1
    val df = (Seq.fill(6)(("a", 0)) ++ Seq.fill(4)(("b", 1)))
      .toDF("r", "c")
    val r = RobustStats.contingencyAssociation(df, col("r"), col("c"))
      .collect().head
    assert(r.getLong(0) == 10L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == 10.0) // χ² = n for a perfect 2×2
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0)
  }

  test("contingencyAssociation: independent table has V = 0; " +
    "degenerate single level is empty") {
    // product structure: P(r,c) = P(r)P(c) exactly → every o == e
    val df = (for { r <- Seq("a", "b"); c <- 0 to 2; i <- 0 until 4 }
      yield (r, c)).toDF("r", "c")
    val out = RobustStats.contingencyAssociation(df, col("r"), col("c"))
      .collect().head
    assert(out.getDouble(4) == 0.0 && out.getDouble(5) == 0.0)
    assert(out.getLong(3) == 2L)
    val deg = Seq(("a", 0), ("a", 1)).toDF("r", "c")
    assert(RobustStats.contingencyAssociation(deg, col("r"), col("c"))
      .collect().isEmpty)
  }
}
