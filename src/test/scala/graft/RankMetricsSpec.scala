package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.metrics.RankMetrics

class RankMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("binaryAuc matches the hand-computed tie-corrected value") {
    // scores 0.1,0.2,0.2,0.3 → midranks 1, 2.5, 2.5, 4
    // Σ ranks⁺ = 2.5 + 4 = 6.5; U = 6.5 − 2·3/2 = 3.5; AUC = 3.5/(2·2)
    val df = Seq((0.1, 0), (0.2, 1), (0.2, 0), (0.3, 1)).toDF("score", "label")
    val row = RankMetrics.binaryAuc(df, "score", "label").head()
    assert(row.getLong(0) == 4L)
    assert(row.getLong(1) == 2L)
    assert(row.getDouble(2) == 0.875)
  }

  test("midranks equal the naive global-window midranks on random tied data") {
    val df = spark.range(0, 2000)
      .select(
        (pmod(col("id") * 2654435761L, lit(97)) / lit(97.0)).as("score"),
        pmod(col("id"), lit(2)).cast("int").as("label"))
      .repartition(7)
    // naive single-partition formulation (what q46 used to do)
    val naive = df
      .withColumn("r", row_number().over(Window.orderBy(col("score"))))
      .withColumn("rr", avg(col("r")).over(Window.partitionBy(col("score"))))
      .groupBy(col("score"))
      .agg(first(col("rr")).as("expected"), count(lit(1)).as("n_rows"))
    val dist = RankMetrics.midranks(df, "score", "label", Nil)
      .groupBy(col("score"))
      .agg(first(col("midrank")).as("got"), sum(col("cnt")).as("n_rows2"))
    val joined = naive.join(dist, "score").collect()
    assert(joined.length == 97)
    joined.foreach { r =>
      assert(r.getAs[Double]("expected") == r.getAs[Double]("got"), r.toString)
      assert(r.getAs[Long]("n_rows") == r.getAs[Long]("n_rows2"), r.toString)
    }
  }

  test("grouped binaryAuc ranks each group independently") {
    val df = Seq(
      // group a: perfect separation → AUC 1.0
      ("a", 0.1, 0), ("a", 0.2, 0), ("a", 0.8, 1), ("a", 0.9, 1),
      // group b: perfectly inverted → AUC 0.0
      ("b", 0.9, 0), ("b", 0.8, 0), ("b", 0.1, 1), ("b", 0.2, 1))
      .toDF("g", "score", "label")
    val rows = RankMetrics.binaryAuc(df, "score", "label", Seq("g"))
      .orderBy("g").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(rows(0).getDouble(3) == 1.0)
    assert(rows(1).getDouble(3) == 0.0)
  }

  test("binaryAuc is null when a class is absent") {
    val allPos = Seq((0.1, 1), (0.2, 1)).toDF("score", "label")
    assert(RankMetrics.binaryAuc(allPos, "score", "label").head().isNullAt(2))
  }

  test("ovrMacroAuc: per-class AUCs and macro average") {
    // 3 classes, scores are the one-hot of the true class → every class
    // separates perfectly: per-class AUC 1.0, macro 1.0
    val df = Seq(0, 1, 2, 0, 1, 2).toDF("y")
    val perfect = Seq(0, 1, 2).map(c =>
      c -> when(col("y") === c, 1.0).otherwise(0.0))
    val rows = RankMetrics.ovrMacroAuc(df, "y", perfect).orderBy("cls").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Double]("auc") == 1.0, r.toString)
      assert(r.getAs[Double]("macro_auc") == 1.0, r.toString)
    }
  }

  test("retrievalEvalCard: hand-computed nDCG/MRR/AP on a two-query fixture") {
    import SparkSpec.spark.implicits._
    // q1: rel (1,0,1) at ranks 1..3; q2: all irrelevant
    val ranked = Seq(
      ("q1", 1L, 1.0), ("q1", 2L, 0.0), ("q1", 3L, 1.0),
      ("q2", 1L, 0.0), ("q2", 2L, 0.0))
      .toDF("q", "rank", "rel")
    val r = RankMetrics.retrievalEvalCard(ranked, "q", "rank", "rel", 10)
      .head()
    def r9(v: Double) = BigDecimal(v)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln2 = 0.6931471805599453
    def log2(x: Double) = math.log(x) / ln2
    val dcg = 1.0 / log2(2.0) + 1.0 / log2(4.0)       // = 1.5
    val idcg = 1.0 / log2(2.0) + 1.0 / log2(3.0)      // ideal: rel 1,1,0
    val ndcg1 = r9(dcg / idcg)
    val ap1 = r9((1.0 / 1.0 + 2.0 / 3.0) / 2.0)
    assert(r.getAs[Long]("n_queries") == 2L)
    assert(r.getAs[Double]("mean_ndcg_at_10") == r6(ndcg1 / 2.0))
    assert(r.getAs[Double]("mrr") == r6(1.0 / 2.0))   // q1 rr=1, q2 rr=0
    assert(r.getAs[Double]("mean_ap") == r6(ap1 / 2.0))
  }

  test("rankBiasedOverlap: identical rankings give 1 - p^d, disjoint 0") {
    import org.apache.spark.sql.functions.col
    val df = (0L until 100L).map(i => (i, i.toDouble, -i.toDouble))
      .toDF("id", "s1", "s2")
    val same = RankMetrics.rankBiasedOverlap(df, "id",
      Seq(col("s1").desc, col("id")), Seq(col("s1").desc, col("id")))
      .collect().head
    // replicate the engine arithmetic: exp/ln power, X_i = i, 12-dec
    // term truncation, decimal sum, ×(1−p), round 6
    val expect = {
      val terms = (1 to 50).map { i =>
        // engine shape: (exp(..) * x) / i with x = i, left-associative
        BigDecimal(math.exp((i - 1).toDouble * math.log(0.9)) *
            i.toDouble / i.toDouble)
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      BigDecimal((1.0 - 0.9) * terms.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    assert(same.getAs[Double]("rbo") == expect)
    assert(same.getAs[Long]("overlap_at_depth") == 50L)
    assert(same.getAs[Double]("agreement_at_depth") == 1.0)
    // s1 vs s2 rank the 100 items in opposite orders → disjoint top-50
    val disj = RankMetrics.rankBiasedOverlap(df, "id",
      Seq(col("s1").desc, col("id")), Seq(col("s2").desc, col("id")))
      .collect().head
    assert(disj.getAs[Double]("rbo") == 0.0)
    assert(disj.getAs[Long]("overlap_at_depth") == 0L)
  }
}
