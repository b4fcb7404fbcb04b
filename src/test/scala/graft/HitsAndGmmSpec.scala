package graft

import graft.ml.MlPipelines
import graft.operators.GraphOps

class HitsAndGmmSpec extends SparkSpec {
  import spark.implicits._

  test("hitsFixedPoint: broader hub outranks narrower, shared target wins") {
    // 1 → {10, 11}, 2 → {10}: node 1 cites more (better hub), node 10
    // is cited by more (better authority). L∞ normalization pins the
    // top of each side at exactly scale = 10^6.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("s", "d")
    val got = GraphOps.hitsFixedPoint(edges, "s", "d")
      .select("side", "id", "score_fp")
      .as[(String, Long, Long)].collect()
    val hubs = got.filter(_._1 == "hub").map(r => r._2 -> r._3).toMap
    val auths = got.filter(_._1 == "authority").map(r => r._2 -> r._3).toMap
    assert(hubs(1L) == 1000000L && hubs(2L) < 1000000L)
    assert(auths(10L) == 1000000L && auths(11L) < 1000000L)
  }

  test("hitsFixedPoint: symmetric complete bipartite graph is uniform") {
    // K_{2,2}: every hub sees both authorities and vice versa — all
    // scores must sit at the normalization cap on both sides forever.
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L))
      .toDF("s", "d")
    val got = GraphOps.hitsFixedPoint(edges, "s", "d")
      .select("score_fp").as[Long].collect()
    assert(got.length == 4 && got.forall(_ == 1000000L))
  }

  test("hitsFixedPoint: top-k truncates and keeps both sides") {
    // star with 15 authorities: k=10 keeps 1 hub + 10 authorities
    val edges = (1L to 15L).map(d => (0L, 100L + d)).toDF("s", "d")
    val got = GraphOps.hitsFixedPoint(edges, "s", "d", k = 10)
    val bySide = got.groupBy("side").count()
      .as[(String, Long)].collect().toMap
    assert(bySide == Map("hub" -> 1L, "authority" -> 10L))
  }

  test("gmm1dEmPortable recovers two well-separated components") {
    val rnd = new java.util.Random(42)
    val xs = Seq.fill(200)(rnd.nextGaussian()) ++
      Seq.fill(200)(10.0 + rnd.nextGaussian())
    val df = xs.toDF("value")
    val rows = MlPipelines.gmm1dEmPortable(df, "value")
      .as[(Int, Double, Double, Double, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(rows.length == 6)
    val (_, pi, mu1, mu2, v1, v2, _) = rows.last
    assert(math.abs(pi - 0.5) < 0.05, s"pi=$pi")
    assert(math.abs(mu1 - 0.0) < 0.3, s"mu1=$mu1")
    assert(math.abs(mu2 - 10.0) < 0.3, s"mu2=$mu2")
    assert(v1 > 0.5 && v1 < 2.0 && v2 > 0.5 && v2 < 2.0)
    // EM monotonicity certificate: mean log-likelihood never decreases
    // (slack covers the 6-decimal rounding of the reported trace)
    rows.map(_._7).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-6, s"log-lik fell: $a -> $b")
    }
  }

  test("gmm1dEmPortable: constant column fails loudly, nulls drop first") {
    // all-equal values: variance is exactly 0 → the E-step density
    // would divide by zero (loud under ANSI, silent inf in the SQL
    // replay) — the contract is a loud degenerate-input failure
    val df = (Seq.fill(50)(Some(5.0)) ++ Seq(None, None)).toDF("value")
    val e = intercept[IllegalArgumentException] {
      MlPipelines.gmm1dEmPortable(df, "value", iters = 2).collect()
    }
    assert(e.getMessage.contains("non-degenerate variance"))
  }
}
