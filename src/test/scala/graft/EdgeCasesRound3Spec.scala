package graft

import org.apache.spark.sql.functions._
import graft.operators.{FunnelOps, ProfileOps, RobustStats, TextOps}

/** Empty/degenerate-input behavior of the round-3 operators: the cases a
  * scheduled 100 TB pipeline hits on a quiet partition or a dead tenant —
  * they must produce empty or well-defined frames, never throw.
  */
class EdgeCasesRound3Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: later stages with zero events yield 0 users, defined conv") {
    val ev = Seq((1L, ts("2024-01-01 10:00:00"), "view"))
      .toDF("user_id", "ts", "event_type")
    val got = FunnelOps.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .select("n_users", "conv_from_prev")
      .as[(Long, Option[Double])].collect().toSeq
    // conv is null after an empty stage (SQL x/0 → NULL, never a throw)
    assert(got == Seq((1L, None), (0L, Some(0.0)), (0L, None)))
  }

  test("funnel: empty input keeps the full stage skeleton at zero") {
    val ev = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    val got = FunnelOps.funnel(ev, "user_id", "ts", "event_type",
      Seq("view", "click")).orderBy("stage_idx")
      .select("n_users").as[Long].collect().toSeq
    assert(got == Seq(0L, 0L))
  }

  test("madOutliers / weightedMedianLower: empty and single-row keys") {
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    assert(RobustStats.madOutliers(empty, "k", "v").count() == 0)
    val one = Seq(("a", 5.0)).toDF("k", "v")
    val r = RobustStats.madOutliers(one, "k", "v").collect().head
    assert(r.getAs[Double]("median") == 5.0 && r.getAs[Double]("mad") == 0.0
      && r.getAs[Long]("n_outliers") == 0L)
    val w = Seq(("a", 5.0, 2.0)).toDF("k", "v", "w")
    assert(RobustStats.weightedMedianLower(w, "k", "v", "w")
      .collect().head.getAs[Double]("weighted_median") == 5.0)
  }

  test("chiSquare: single category row collapses to dof 0, chi2 0") {
    val df = Seq(("a", 0), ("a", 0), ("a", 0)).toDF("r", "c")
    val got = RobustStats.chiSquare(df, col("r"), col("c")).collect().head
    assert(got.getAs[Long]("dof") == 0L)
    assert(got.getAs[Double]("chi2") == 0.0)
  }

  test("columnProfile: all-null column profiles as 0 distinct, full null") {
    val df = Seq((1L, Option.empty[String]), (2L, None)).toDF("id", "s")
    val got = ProfileOps.columnProfile(df, Seq("s")).collect().head
    assert(got.getAs[Long]("n_null") == 2L)
    assert(got.getAs[Double]("null_frac") == 1.0)
    assert(got.getAs[Long]("n_distinct") == 0L)
  }

  test("cohortRetention: a single event is its own cohort at offset 0") {
    val ev = Seq((1L, ts("2024-01-03 10:00:00")))
      .toDF("user_id", "ts")
    val got = FunnelOps.cohortRetention(ev, "user_id", "ts", 3).collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("week_offset") == 0L)
    assert(got.head.getAs[Long]("n_users") == 1L)
  }

  test("tokenLmStats / withCharDiversity: whitespace-only documents") {
    val docs = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    // trim('') tokenizes to a single empty token, and splitting '' into
    // chars yields one empty element — BOTH semantics shared with DuckDB's
    // string_split (probed), so empty docs stay oracle-consistent
    val lm = TextOps.tokenLmStats(docs, "doc_id", "text")
      .orderBy("doc_id").select("n_tokens").as[Long].collect().toSeq
    assert(lm == Seq(1L, 1L))
    val cd = TextOps.withCharDiversity(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(cd.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L))
    assert(cd.head.getAs[Long]("n_chars") == 1L) // the one empty element
    assert(cd(1).getAs[Long]("n_chars") == 3L)   // three spaces
  }
}
