package graft

import graft.operators.DriftOps

/** Mann–Whitney U (q259): hand-computed statistics with and without
  * ties, including the tie-corrected sigma.
  */
class MannWhitneySpec extends SparkSpec {
  import spark.implicits._

  private def run(vals: Seq[(Double, String)]) =
    DriftOps.mannWhitneyU(vals.toDF("value", "g"), "value", "g", "A", "B")
      .head()

  test("mannWhitneyU: fully separated samples give U = nA·nB, r = 1") {
    val r = run(Seq(1.0 -> "A", 2.0 -> "A", 3.0 -> "A",
      4.0 -> "B", 5.0 -> "B", 6.0 -> "B"))
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
    assert(r.getLong(2) == 0L)            // no ties
    assert(r.getDouble(3) == 9.0)         // U_B = R_B − nB(nB+1)/2 = 9
    assert(r.getDouble(4) == 4.5)         // mu
    assert(r.getDouble(5) == 2.291288)    // sqrt(9/12·7)
    assert(r.getDouble(7) == 1.0)         // rank-biserial
    assert(math.abs(r.getDouble(6) - 4.5 / 2.2912878474779) < 1e-5)
  }

  test("mannWhitneyU: midranks and tie correction are exact") {
    // A = {1,2,2}, B = {2,3,3}: R_B = 3 + 2·5.5 = 14 → U_B = 8;
    // Σ(t³−t) = 24 + 6 = 30 → σ = sqrt(9/12·(7−1)) = sqrt(4.5)
    val r = run(Seq(1.0 -> "A", 2.0 -> "A", 2.0 -> "A",
      2.0 -> "B", 3.0 -> "B", 3.0 -> "B"))
    assert(r.getLong(2) == 2L)            // two tied values (2 and 3)
    assert(r.getDouble(3) == 8.0)
    assert(r.getDouble(5) == 2.12132)     // sqrt(4.5) rounded
    assert(r.getDouble(7) == 0.777778)
  }

  test("kruskalWallis: hand-computed H on three separated groups") {
    // A={1,2} B={3,4} C={5,6}: R = 3,7,11 → H = 12/42·89.5 − 21
    val df = Seq(1.0 -> "A", 2.0 -> "A", 3.0 -> "B", 4.0 -> "B",
      5.0 -> "C", 6.0 -> "C").toDF("value", "g")
    val r = DriftOps.kruskalWallis(df, "value", "g").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 4.571429)
    assert(r.getDouble(3) == 1.0)          // no ties
    assert(r.getDouble(4) == 4.571429)
  }

  test("kruskalWallis: identical group distributions give H = 0 with " +
      "tie correction applied") {
    val df = Seq("A", "B", "C").flatMap(g =>
      Seq(1.0 -> g, 2.0 -> g)).toDF("value", "g")
    val r = DriftOps.kruskalWallis(df, "value", "g").head()
    assert(r.getDouble(2) == 0.0)
    assert(r.getDouble(3) == 0.771429)     // 1 − 48/210
    assert(r.getDouble(4) == 0.0)
  }

  test("mannWhitneyU: symmetric samples give z = 0") {
    val r = run(Seq(1.0 -> "A", 3.0 -> "B", 5.0 -> "A", 7.0 -> "B",
      2.0 -> "B", 4.0 -> "A", 6.0 -> "B", 8.0 -> "A"))
    assert(r.getDouble(3) == r.getDouble(4)) // U_B == mu exactly here
    assert(r.getDouble(6) == 0.0)
  }
}
