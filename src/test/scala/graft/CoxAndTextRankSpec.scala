package graft

import org.apache.spark.sql.functions._
import graft.operators.{SurvivalOps, TextOps}

class CoxAndTextRankSpec extends SparkSpec {
  import spark.implicits._

  test("coxPhBinary first Newton step at β=0 IS the log-rank score") {
    // the Cox score test at β=0 and the log-rank O−E statistic are the
    // same quantity (binary covariate, Breslow ties) — cross-operator pin
    val rnd = new java.util.Random(11)
    val rows = (1 to 300).map { i =>
      val a = i % 2 == 0
      val rate = if (a) 0.10 else 0.05
      val t = math.ceil(-math.log(1.0 - rnd.nextDouble()) / rate).toLong
      (t.min(60L), t <= 60L, a)
    }
    val df = rows.toDF("dur", "ev", "isa")
    val u1 = SurvivalOps.coxPhBinary(df, "dur", "ev", col("isa"))
      .filter(col("iter") === 1).select("score_u").as[Double].head()
    val oma = SurvivalOps.logRankTest(df, "dur", "ev", col("isa"))
      .select("obs_minus_exp_a").as[Double].head()
    assert(math.abs(u1 - oma) < 1e-6, s"u1=$u1 oma=$oma")
  }

  test("coxPhBinary recovers a known log-hazard-ratio") {
    // group A hazard = 2× group B, uncensored: β̂ ≈ ln 2
    val rnd = new java.util.Random(7)
    val rows = (1 to 2000).map { i =>
      val a = i % 2 == 0
      val rate = if (a) 0.08 else 0.04
      (math.ceil(-math.log(1.0 - rnd.nextDouble()) / rate).toLong, true, a)
    }
    val fit = SurvivalOps.coxPhBinary(rows.toDF("dur", "ev", "isa"),
        "dur", "ev", col("isa"))
      .orderBy(col("iter"))
      .select("beta", "log_lik").as[(Double, Double)].collect()
    val beta = fit.last._1
    assert(math.abs(beta - math.log(2.0)) < 0.15, s"beta=$beta")
    // Newton converged: last two iterations agree to 6 decimals
    assert(math.abs(fit.last._1 - fit(fit.length - 2)._1) < 1e-6)
    // partial log-likelihood never decreases along the path
    fit.map(_._2).sliding(2).foreach { case Array(a, b) =>
      assert(b >= a - 1e-6, s"log-lik fell: $a -> $b")
    }
  }

  test("coxPhBinary: degenerate one-sided covariate fails loudly") {
    val df = (1 to 50).map(i => (i.toLong, true, true)).toDF("dur", "ev", "x")
    val e = intercept[IllegalArgumentException] {
      SurvivalOps.coxPhBinary(df, "dur", "ev", col("x")).collect()
    }
    assert(e.getMessage.contains("information"))
  }

  test("textRankKeywords: the shared neighbor out-centralizes the spokes") {
    // "hub" is adjacent to every spoke; spokes only ever touch hub —
    // a star graph, so hub must take rank 1
    val docs = Seq.fill(10)("a hub b hub c hub d").toDF("text")
    val got = TextOps.textRankKeywords(docs, "text", minCount = 5L, k = 5)
      .select("rank", "word").as[(Long, String)].collect()
    assert(got.head._2 == "hub", s"got=${got.toSeq}")
    assert(got.map(_._1).toSeq == (1L to got.length))
  }

  test("textRankKeywords: rare words and empty tokens never enter") {
    val docs = Seq.fill(10)("common words  repeat together") ++
      Seq("rare singleton appears once")
    val words = TextOps.textRankKeywords(docs.toDF("text"), "text",
        minCount = 5L, k = 30)
      .select("word").as[String].collect().toSet
    assert(!words.contains("") && !words.contains("rare"))
    assert(words == Set("common", "words", "repeat", "together"))
  }
}
