package graft

import org.apache.spark.sql.functions._
import graft.operators.{FunnelOps, ProfileOps, RobustStats, TextOps}

class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenLmStats: corpus frequencies and rare fraction, hand-computed") {
    // corpus freqs: the:3, cat:2, runs:1, zebra:1 — only "the" reaches the
    // rareBelow=3 threshold, so cat/runs/zebra all count as rare
    val docs = Seq(
      (1L, "the cat"),        // sums 3+2=5, n 2, 1 rare
      (2L, "the cat runs"),   // 3+2+1=6, n 3, 2 rare
      (3L, "the zebra"),      // 3+1=4, n 2, 1 rare
    ).toDF("doc_id", "text")
    val got = TextOps.tokenLmStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2.5, 0.5),
      (2L, 3L, 2.0, 0.666667),
      (3L, 2L, 2.0, 0.5)))
  }

  test("withCharDiversity: simpson, top share, entropy, hand-computed") {
    val docs = Seq((1L, "aab")).toDF("doc_id", "text")
    val r = TextOps.withCharDiversity(docs, "doc_id", "text").collect().head
    assert(r.getAs[Long]("n_chars") == 3L)
    assert(r.getAs[Long]("n_distinct_chars") == 2L)
    // 1 − (2² + 1²)/3² = 4/9
    assert(r.getAs[Double]("simpson") == 0.444444)
    assert(r.getAs[Double]("top_char_share") == 0.666667)
    // H = ln 3 − (2·ln 2)/3 ≈ 0.6365142
    assert(math.abs(r.getAs[Double]("entropy_nats") - 0.636514) < 1e-6)
  }

  test("madOutliers: median/MAD and the 3-MAD rule, hand-computed") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0), ("a", 100.0))
      .toDF("k", "v")
    val r = RobustStats.madOutliers(df, "k", "v").collect().head
    // med 3, deviations (2,1,0,1,97), MAD 1, only 97 > 3·1
    assert(r.getAs[Long]("n") == 5L)
    assert(r.getAs[Double]("median") == 3.0)
    assert(r.getAs[Double]("mad") == 1.0)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("madOutliers: interpolated median on even counts (type 7)") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0)).toDF("k", "v")
    assert(RobustStats.madOutliers(df, "k", "v")
      .collect().head.getAs[Double]("median") == 3.0)
  }

  test("weightedMedianLower: cumulative-weight rule and value-tie collapse") {
    // weights: 1@10 (+1@10 duplicated value), 1@20, 5@30 → total 8,
    // half 4 → first value whose cum ≥ 4 is 30
    val df = Seq(("a", 10.0, 1.0), ("a", 10.0, 1.0), ("a", 20.0, 1.0),
      ("a", 30.0, 5.0)).toDF("k", "v", "w")
    assert(RobustStats.weightedMedianLower(df, "k", "v", "w")
      .collect().head.getAs[Double]("weighted_median") == 30.0)
    // equal weights → lower median of {1,2,3,4} is 2 (cum 2·2 ≥ 4)
    val eq = Seq(("a", 1.0, 1.0), ("a", 2.0, 1.0), ("a", 3.0, 1.0),
      ("a", 4.0, 1.0)).toDF("k", "v", "w")
    assert(RobustStats.weightedMedianLower(eq, "k", "v", "w")
      .collect().head.getAs[Double]("weighted_median") == 2.0)
  }

  test("chiSquare: 2×2 contingency, hand-computed") {
    // o = [[10, 20], [30, 40]]: n=100, e = [[12,18],[28,42]]
    // χ² = 4/12 + 4/18 + 4/28 + 4/42 = 0.793651
    val rows =
      Seq.fill(10)(("a", 0)) ++ Seq.fill(20)(("a", 1)) ++
      Seq.fill(30)(("b", 0)) ++ Seq.fill(40)(("b", 1))
    val df = rows.toDF("r", "c")
    val got = RobustStats.chiSquare(df, col("r"), col("c")).collect().head
    assert(got.getAs[Long]("n") == 100L)
    assert(got.getAs[Long]("dof") == 1L)
    assert(got.getAs[Double]("chi2") == 0.793651)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("funnel: strictly-ordered stages, first-touch attribution") {
    val ev = Seq(
      // u1 converts fully in order
      (1L, ts("2024-01-01 10:00:00"), "view"),
      (1L, ts("2024-01-01 11:00:00"), "click"),
      (1L, ts("2024-01-01 12:00:00"), "purchase"),
      // u2 clicked BEFORE viewing → no click conversion
      (2L, ts("2024-01-01 09:00:00"), "click"),
      (2L, ts("2024-01-01 10:00:00"), "view"),
      // u3 views only
      (3L, ts("2024-01-01 10:00:00"), "view"),
      // u4 purchase at the SAME ts as the click → strict > rejects it
      (4L, ts("2024-01-01 10:00:00"), "view"),
      (4L, ts("2024-01-01 11:00:00"), "click"),
      (4L, ts("2024-01-01 11:00:00"), "purchase"),
    ).toDF("user_id", "ts", "event_type")
    val got = FunnelOps.funnel(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("stage_idx")
      .select("stage", "n_users", "conv_from_prev")
      .as[(String, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      ("view", 4L, None),
      ("click", 2L, Some(0.5)),
      ("purchase", 1L, Some(0.5))))
  }

  test("cohortRetention: offsets from the first-event week") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday, week 0
      (1L, ts("2024-01-10 10:00:00")), // week 1
      (1L, ts("2024-01-24 10:00:00")), // week 3
      (2L, ts("2024-01-03 10:00:00")), // same cohort week
      (2L, ts("2024-01-11 10:00:00")), // week 1
    ).toDF("user_id", "ts").withColumn("event_type", lit("x"))
    val got = FunnelOps.cohortRetention(ev, "user_id", "ts", 3)
      .orderBy("week_offset")
      .select("week_offset", "n_users").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 2L), (3L, 1L)))
  }

  test("columnProfile: null and distinct accounting") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None),
      (Some(2L), Some("b")), (None, Some("a")),
    ).toDF("id", "s")
    val got = ProfileOps.columnProfile(df, Seq("id", "s"))
      .orderBy("column")
      .select("column", "n_rows", "n_null", "n_distinct")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("id", 4L, 1L, 2L), ("s", 4L, 1L, 2L)))
  }

  test("pcaExplainedVariance: ratios ordered, cum consistent, ≤ 1") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = graft.ml.MlPipelines.pcaExplainedVariance(emb, "embedding", 4)
      .orderBy("component")
      .select("explained_var_ratio", "cum_explained")
      .as[(Double, Double)].collect().toSeq
    assert(got.size == 4)
    // components come back in decreasing-variance order
    assert(got.map(_._1) == got.map(_._1).sorted.reverse)
    // cum is the running sum (6-decimal rounding) and bounded by 1
    assert(math.abs(got.map(_._1).sum - got.last._2) < 1e-5)
    assert(got.last._2 <= 1.0 && got.forall(_._1 > 0.0))
  }

  test("gridSearchLogReg: one row per grid point, argmax flagged best") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_orderkey") < 200)
      .withColumn("y", (col("l_returnflag") =!= "N").cast("double"))
    val got = graft.ml.MlPipelines.gridSearchLogReg(li, "l_orderkey",
        Seq("l_quantity", "l_extendedprice"), "y", Seq(0.1, 1.0), k = 3)
      .collect()
    assert(got.length == 2)
    assert(got.count(_.getAs[Boolean]("is_best")) == 1)
    val best = got.filter(_.getAs[Boolean]("is_best")).head
    assert(got.forall(_.getAs[Double]("cv_accuracy") <=
      best.getAs[Double]("cv_accuracy")))
  }

  test("takeUntilTokenBudget: per-stratum cutoff at the exact budget") {
    val docs = Seq(
      (1L, "a", 500L), (2L, "a", 400L), (3L, "a", 200L), // cum 900, 1100 > 1000 at doc 3
      (4L, "b", 1000L), (5L, "b", 1L),                   // b: exactly at budget, then over
    ).toDF("doc_id", "source", "n_tokens")
    val kept = graft.operators.SplitOps.takeUntilTokenBudget(
        docs, "doc_id", "source", "n_tokens", 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 4L)) // doc 3 overflows a, doc 5 overflows b
  }

  test("gapStats: counts gaps over threshold, keys without gaps drop out") {
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L),
      (1L, ts("2024-01-01 01:00:00"), 2L), // 1 h — no gap
      (1L, ts("2024-01-01 09:00:00"), 3L), // 8 h — gap
      (2L, ts("2024-01-01 00:00:00"), 4L),
      (2L, ts("2024-01-01 02:00:00"), 5L), // 2 h — no gap
    ).toDF("user_id", "ts", "event_id")
    val got = graft.operators.TimeSeriesOps.gapStats(
        ev, "user_id", "ts", "event_id", 6L * 3600 * 1000000)
      .collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("user_id") == 1L)
    assert(got.head.getAs[Long]("n_gaps") == 1L)
    assert(got.head.getAs[Long]("max_gap_us") == 8L * 3600 * 1000000)
  }

  test("ar1ClosedForm: exact fit on a noiseless AR(1) series") {
    // y_t = 2 + 0.5·y_{t−1}, y_0 = 8 → 6, 5, 4.5, 4.25: closed form must
    // recover slope/intercept exactly (to the 6-decimal rounding)
    val ys = Iterator.iterate(8.0)(y => 2.0 + 0.5 * y).take(6).toSeq
    val ev = ys.zipWithIndex.map { case (y, i) =>
      ("k", ts(f"2024-01-01 ${i}%02d:00:00"), i.toLong, y)
    }.toDF("k", "ts", "event_id", "value")
    // scale 6: the series (8, 6, 5, 4.5, 4.25, 4.125) needs 3 decimals —
    // the dsum contract requires exact per-row recovery
    val r = graft.ml.MlPipelines.ar1ClosedForm(ev, "k", "ts", "event_id",
      "value", scale = 6).collect().head
    assert(r.getAs[Long]("n_pairs") == 5L)
    assert(r.getAs[Double]("slope") == 0.5)
    assert(r.getAs[Double]("intercept") == 2.0)
    assert(r.getAs[Double]("rmse") == 0.0)
  }

  test("keyDistribution: skew report on a known distribution") {
    val df = (Seq.fill(8)(1L) ++ Seq.fill(1)(2L) ++ Seq.fill(1)(3L))
      .toDF("k")
    val r = graft.operators.SkewOps.keyDistribution(df, "k").collect().head
    assert(r.getAs[Long]("n_rows") == 10L)
    assert(r.getAs[Long]("n_keys") == 3L)
    assert(r.getAs[Double]("avg_per_key") == 3.333333)
    assert(r.getAs[Long]("max_per_key") == 8L)
    assert(r.getAs[Double]("skew_ratio") == 2.4) // 8 / 3.333333 rounded
  }

  test("hll sketch union estimates track the exact distinct count") {
    val n = 20000L
    val ids = spark.range(n)
      .withColumn("day", (col("id") % 30).cast("int"))
    val daily = ids.groupBy(col("day"))
      .agg(hll_sketch_agg(col("id")).as("sk"))
    val est = daily.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().head.getAs[Long]("est")
    // HLL at default lgConfigK=12 is ~1.6% rse; 5% is a safe bound
    assert(math.abs(est - n).toDouble / n < 0.05, s"est=$est vs exact=$n")
  }
}
