package graft

import org.apache.spark.sql.functions._
import graft.operators.{DriftOps, GraphOps, PatternOps, SketchOps,
  SkewOps, SurvivalOps, TimeSeriesOps}
import graft.metrics.MetricQueries

/** Empty/degenerate-input behavior of the q113–q130 operators — quiet
  * partitions and dead tenants must produce empty or well-defined frames,
  * never throw (the EdgeCasesRound3Spec contract extended to this round's
  * surface).
  */
class EdgeCasesWave3Spec extends SparkSpec {
  import spark.implicits._

  private def emptyEvents = Seq.empty[(Long, Long, String, Double)]
    .toDF("user_id", "us", "event_type", "value")
    .withColumn("ts", timestamp_micros(col("us")))

  test("psiDrift: empty and single-timestamp inputs yield empty frames") {
    assert(DriftOps.psiDrift(emptyEvents, "event_type", "ts", "value")
      .count() == 0)
    // a degenerate time range has no reference window (the strict
    // mid-boundary excludes everything): empty, never a throw
    val one = Seq((1L, 5L, "a", 1.0)).toDF("user_id", "us", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    assert(DriftOps.psiDrift(one, "event_type", "ts", "value").count() == 0)
  }

  test("ksTwoSample: one group absent yields an empty frame, not a throw") {
    val oneSided = Seq(("a", 1.0), ("a", 2.0)).toDF("g", "v")
    assert(DriftOps.ksTwoSample(oneSided, "v", "g", "a", "b").count() == 0)
  }

  test("markovTransitions: single-event users produce no transitions") {
    val df = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("u", "us", "s")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("id", col("us"))
    assert(TimeSeriesOps.markovTransitions(df, "u", "ts", "id", "s")
      .count() == 0)
  }

  test("cohenKappa: disjoint label spaces give pe=0 and kappa=po") {
    val df = Seq(("a", "x"), ("b", "y")).toDF("r1", "r2")
    val r = MetricQueries.cohenKappa(df, "r1", "r2").collect().head
    assert(r.getLong(1) == 0L && r.getDouble(3) == 0.0
      && r.getDouble(4) == 0.0)
  }

  test("bloomSemiJoin: empty keys side keeps nothing") {
    val big = (1L to 10L).map(Tuple1(_)).toDF("k")
    val none = Seq.empty[Tuple1[Long]].toDF("kk")
    assert(SkewOps.bloomSemiJoin(big, none, "k", "kk", 10L, 1024L)
      .count() == 0)
  }

  test("pageRankFixedPoint: empty edge set yields an empty rank frame") {
    val edges = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(GraphOps.pageRankFixedPoint(edges, "s", "d", iterations = 2)
      .count() == 0)
  }

  test("kaplanMeier: empty input and all-censored input") {
    assert(SurvivalOps.kaplanMeier(
      Seq.empty[(Int, Boolean)].toDF("d", "ev"), "d", "ev").count() == 0)
    val cens = Seq((1, false), (2, false)).toDF("d", "ev")
    val out = SurvivalOps.kaplanMeier(cens, "d", "ev")
      .orderBy("t").collect().map(_.getDouble(4))
    assert(out.forall(_ == 1.0)) // no events → survival stays 1
  }

  test("cmsHeavyHitters: empty corpus yields an empty top list") {
    val docs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SketchOps.cmsHeavyHitters(docs, "doc_id", "text").count() == 0)
  }

  test("pairCooccurrence / topPaths: single-item baskets are pair-free") {
    val df = Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("u", "us", "it")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("id", col("us"))
    assert(PatternOps.pairCooccurrence(df, "u", "it").count() == 0)
    val paths = PatternOps.topPaths(df, "u", "ts", "id", "it", 5, 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(paths == Map("a" -> 1L, "b" -> 1L))
  }
}
