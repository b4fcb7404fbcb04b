package graft

import org.apache.spark.sql.functions._
import graft.metrics.RankMetrics
import graft.ml.MlPipelines
import graft.operators.DriftOps

class KmeansFriedmanLiftSpec extends SparkSpec {
  import spark.implicits._

  test("kmeans1dPortable recovers three separated clumps, WCSS falls") {
    val rnd = new java.util.Random(3)
    val xs = Seq.fill(150)(rnd.nextGaussian() * 0.3) ++
      Seq.fill(150)(10.0 + rnd.nextGaussian() * 0.3) ++
      Seq.fill(150)(20.0 + rnd.nextGaussian() * 0.3)
    val rows = MlPipelines.kmeans1dPortable(xs.toDF("x"), "x")
      .as[(Int, Int, Double, Long, Double)].collect()
    val last = rows.filter(_._1 == 6).sortBy(_._2)
    assert(math.abs(last(0)._3 - 0.0) < 0.5)
    assert(math.abs(last(1)._3 - 10.0) < 0.5)
    assert(math.abs(last(2)._3 - 20.0) < 0.5)
    assert(last.map(_._4).sum == 450L)
    // Lloyd monotonicity: per-iteration WCSS never increases
    val wcss = rows.groupBy(_._1).toSeq.sortBy(_._1).map(_._2.head._5)
    wcss.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-6, s"WCSS rose: $a -> $b")
    }
  }

  test("kmeans1dPortable: emptied middle cluster keeps its center") {
    // two tight clumps at the range ends: init c2 = 0.5 attracts no
    // points (everything is nearer 1/6 or 5/6) and must carry through
    val xs = Seq.fill(30)(0.0) ++ Seq.fill(30)(1.0)
    val last = MlPipelines.kmeans1dPortable(xs.toDF("x"), "x", iters = 3)
      .filter(col("iter") === 3).orderBy("cluster")
      .select("center", "size").as[(Double, Long)].collect()
    assert(last(0) == ((0.0, 30L)))
    assert(last(1) == ((0.5, 0L)))
    assert(last(2) == ((1.0, 30L)))
  }

  test("kmeans1dPortable: constant column fails loudly") {
    val e = intercept[IllegalArgumentException] {
      MlPipelines.kmeans1dPortable(
        Seq.fill(10)(4.2).toDF("x"), "x").collect()
    }
    assert(e.getMessage.contains("degenerate"))
  }

  test("friedmanTest: perfectly consistent ordering gives the max Q") {
    // 4 blocks, 3 treatments, C > B > A everywhere: ranks (1,2,3) per
    // block, R = (4,8,12), Q = 12/(4·3·4)·224 − 3·4·4 = 8 exactly
    val rows = for (b <- 1 to 4; (t, v) <- Seq(("a", 1.0), ("b", 2.0),
      ("c", 3.0))) yield (b, t, v)
    val got = DriftOps.friedmanTest(rows.toDF("blk", "trt", "v"),
        "blk", "trt", "v")
      .select("n_blocks", "k", "q_stat", "tie_correction", "q_corrected")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(got == ((4L, 3L, 8.0, 1.0, 8.0)))
  }

  test("friedmanTest: incomplete blocks drop; all-tied blocks zero Q") {
    val complete = for (b <- 1 to 3; t <- Seq("a", "b", "c"))
      yield (b, t, 5.0)
    val partial = Seq((9, "a", 1.0), (9, "b", 2.0)) // missing "c"
    val got = DriftOps.friedmanTest(
        (complete ++ partial).toDF("blk", "trt", "v"), "blk", "trt", "v")
      .select("n_blocks", "q_corrected").as[(Long, Option[Double])].head()
    assert(got._1 == 3L)
    // every block fully tied: correction hits zero -> q_corrected null
    assert(got._2.isEmpty)
  }

  test("liftGainsCard: top-decile capture on a clean ranking") {
    // scores 1..20, positives = top 5 scores: bin1 all-positive (lift
    // 4x), everything captured by bin 3
    val df = (1 to 20).map(i => (i.toDouble, if (i >= 16) 1 else 0))
      .toDF("score", "label")
    val got = RankMetrics.liftGainsCard(df, "score", "label")
      .select("bin", "n", "n_pos", "lift", "cum_gain")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(got.length == 10 && got.forall(_._2 == 2L))
    assert(got.head == ((1L, 2L, 2L, 4.0, 0.4)))
    assert(got(2)._5 == 1.0)
    assert(got.drop(3).forall(_._3 == 0L))
  }

  test("liftGainsCard: one fully-tied score lands in one bin") {
    val df = (1 to 20).map(i => (7.5, i % 4 / 3)).toDF("score", "label")
    val got = RankMetrics.liftGainsCard(df, "score", "label")
      .select("bin", "n", "n_pos").as[(Long, Long, Long)].collect()
    // midrank 10.5 from the top -> ceil(10.5*10/20) = bin 6, all 20 rows
    assert(got.toSeq == Seq((6L, 20L, 5L)))
  }
}
