package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stats._
import graft.metrics.MetricQueries
import graft.ml.MlPipelines
import graft.operators._

/** Query surface part 4 (file split only): classical tests, forecasters, graph cards, bandits, CART twin, SQL-text surface II. */
private[graft] trait EntryPart4 extends EntryPart3 {

  // ---------------------------------------------------------------- q381
  // Fisher's exact right-tail test: is high order priority associated
  // with finished status? The exact sibling of q100's chi-square —
  // log-space hypergeometric tail via the portable Lanczos lnGamma, so
  // the p-value stays meaningful (as ln p) down to 1e-300.
  def q381(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.fisherExact2x2(
      t(spark, dir, "orders"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
      col("o_orderstatus") === "F")

  // ---------------------------------------------------------------- q382
  // RANSAC trend line on the daily count spine: 16 seeded two-point
  // models, consensus scoring at half the rounded std, OLS refit on the
  // winner's inliers — the by-consensus member of the robust-trend
  // family (Theil–Sen q273 by rank, Huber q303 by loss shape).
  def q382(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.ransacTrendLine(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q383
  // Theta-method 7-day forecast on the daily count spine: OLS-line
  // extrapolation averaged with SES over the theta=2 series — the
  // M3-winning combination sitting between q164's flat EWMA and q308's
  // Holt trend.
  def q383(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.thetaForecast(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q384
  // Croston intermittent-demand card on the sparse series "days with
  // high-value purchases": separate SES on demand sizes and intervals,
  // rate + Syntetos-Boylan correction — the forecaster for
  // mostly-zero series where level smoothers decay to noise.
  def q384(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.crostonForecast(t(spark, dir, "events"), "ts",
      col("event_type") === "purchase" && col("value") > lit(200.0))

  // ---------------------------------------------------------------- q385
  // Rocchio pseudo-relevance feedback, measured: q223's holdout queries
  // retrieve top-10, move toward the top-5 centroid (q' = q + 0.75·c),
  // re-retrieve — macro P@10 before vs after and list overlap. The
  // query-expansion step of the retrieval stack (BM25 q161, ANN q182,
  // RRF q166, eval q223), with its win/loss made a number.
  def q385(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    SimilarityOps.rocchioPrfCard(e, e.filter(col("vec_id") < 30),
      "vec_id", "embedding", "label")
  }

  // ---------------------------------------------------------------- q386
  // Quade test on the same block design as q320's Friedman: blocks
  // weighted by their range mid-rank, so flat blocks stop diluting the
  // treatment signal — the power upgrade at small k, sharing q320's
  // cell/rank machinery for a direct read-across.
  def q386(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.quadeTest(
      t(spark, dir, "events").withColumn("__blk", col("user_id") % 50),
      "__blk", "event_type", "value")

  // ---------------------------------------------------------------- q387
  // Multi-source BFS over the cosine similarity graph: exact hop
  // distances from the 4 smallest vertex ids, 6 rounds — the distance
  // structure (ball growth, reach, islands) the q118/q315/q323 degree
  // family can't see.
  def q387(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.bfsHops(
      cosineEdges(spark, dir, 0.2), "id_a", "id_b")

  // ---------------------------------------------------------------- q388
  // Exact sign test on day-over-day count changes: the small-m exact
  // companion of q333's runs test and q326's Mann–Kendall — binomial
  // tail via the portable Lanczos lnGamma, no asymptotics.
  def q388(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.signTestDaily(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q389
  // Capture–recapture population estimate: first/second half of the
  // time range as two capture occasions, Lincoln–Petersen + Chapman
  // with SE — extrapolates BEYOND the observed ids (no hash sketch
  // can), with the true distinct count on the card so the closure
  // error is measured.
  def q389(spark: SparkSession, dir: String): DataFrame =
    SketchOps.captureRecapture(t(spark, dir, "events"), "user_id", "ts")

  // ---------------------------------------------------------------- q390
  // Delete-one-nation jackknife for mean order value: the
  // design-honest SE when observations cluster by stratum, plus the
  // bias-corrected estimate — the error bar q01-style means silently
  // get wrong under clustering.
  def q390(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    graft.operators.RobustStats.jackknifeRatioByStratum(
      o.join(broadcast(c), col("o_custkey") === col("c_custkey")),
      "c_nationkey", "o_totalprice")
  }

  // ---------------------------------------------------------------- q391
  // Warner randomized response on "is this user a frequent purchaser":
  // respondent-side local DP (q237/q363 noise the aggregate; this
  // never collects the truth), unbiased back out of the noisy yes-rate
  // with its SE and the measured error vs the true rate.
  def q391(spark: SparkSession, dir: String): DataFrame = {
    val perUser = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 15L).as("is_heavy"))
    graft.operators.ProfileOps.randomizedResponse(
      perUser, "user_id", "is_heavy")
  }

  // ---------------------------------------------------------------- q392
  // Negative-binomial vs Poisson fit of the daily count distribution:
  // MoM NB parameters, both exact log-likelihoods via the portable
  // lnGamma, and the AIC gap — the diagnosis behind q282's
  // overdispersion symptom.
  def q392(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.negativeBinomialFit(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q393
  // Weibull probability-plot fit of q122's Kaplan–Meier curve: shape,
  // scale, R² and the parametric median — the two-number summary that
  // closes the survival family.
  def q393(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SurvivalOps.weibullFromKm(
      graft.operators.SurvivalOps.kaplanMeier(
        signupPurchaseDurations(spark, dir), "dur_days", "__event"))

  // ---------------------------------------------------------------- q394
  // Davies–Bouldin index of the portable-IVF clustering: the internal
  // validity number completing the clustering-eval set (cohesion q252,
  // label-NMI q256) — per-cluster components say which cluster drags
  // the score.
  def q394(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.daviesBouldinCard(t(spark, dir, "embeddings"),
      "vec_id", "embedding")

  // ---------------------------------------------------------------- q395
  // Turning-point randomness test on daily counts: strict local
  // extrema vs the iid expectation 2(n-2)/3 — the alternation view the
  // runs test (levels) and sign test (direction balance) are blind to.
  def q395(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.turningPointTest(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q396
  // Probit regression on q189's exact data: the link-function
  // robustness check (agreement with the logistic fit at the classic
  // 1.6 slope ratio says the verdict doesn't hinge on the link) — the
  // portable normCdf/normPdf make the whole Fisher-scoring trajectory
  // hash-checkable like q189.
  def q396(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.irlsProbitPortable(
      withReturnFlagBin(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)),
      "l_quantity", "l_returnflag_bin", iters = 6)
      .orderBy(col("iter"))

  // ---------------------------------------------------------------- q397
  // ORC round-trip fidelity: lineitem columns written to ORC and read
  // back, then the q01-style exact aggregate — hash-equal to the same
  // aggregate straight off parquet, proving the second columnar format
  // in the I/O matrix preserves types and values bit-for-bit. The
  // scratch table is removed after the (materialized) read-back.
  def q397(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT",
          System.getProperty("java.io.tmpdir"))),
      "graft_q397_")
    try {
      t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_returnflag"),
          col("l_quantity"), col("l_extendedprice"))
        .write.mode("overwrite").orc(s"$root/li_orc")
      val res = spark.read.orc(s"$root/li_orc")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_orderkey")).as("n_orders"),
          graft.functions.Stats.dsum(col("l_quantity"), 2).as("sum_qty"),
          graft.functions.Stats.dsum(col("l_extendedprice"), 2)
            .as("sum_price"))
        .orderBy(col("l_returnflag"))
      // materialize BEFORE the scratch dir disappears
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(root.toFile)
    }
  }

  // ---------------------------------------------------------------- q398
  // Moving-block bootstrap CI for the daily trend slope: seeded blocks
  // preserve short-range dependence inside each resample — the honest
  // SE for autocorrelated days, next to q390's iid-cluster jackknife
  // and q272's iid Poisson bootstrap.
  def q398(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.blockBootstrapTrend(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q399
  // UCB1 bandit replay over the daily per-event-type reward matrix:
  // what would adaptive allocation have done on the logged days, and
  // what did exploration cost vs the hindsight-best fixed arm — the
  // policy-level judgment the static A/B battery (q121/q178/q218)
  // can't give. Fully deterministic; the whole trajectory hash-checks.
  def q399(spark: SparkSession, dir: String): DataFrame =
    graft.operators.BanditOps.ucbReplay(
      t(spark, dir, "events"), "ts", "event_type", "value",
      Seq("click", "error", "purchase", "signup", "view"))

  // ---------------------------------------------------------------- q400
  // Seeded randomization test on the q121 experiment frame: does the
  // parity split move the per-user mean event value? 64 exact
  // fixed-size label permutations, two-sided p — the assumption-free
  // member of the location battery (Welch trusts normality,
  // Mann–Whitney changes the estimand; this tests THE mean under the
  // randomization null alone).
  def q400(spark: SparkSession, dir: String): DataFrame = {
    val perUser = t(spark, dir, "events")
      .filter(col("value").isNotNull)
      .groupBy(col("user_id"))
      .agg((graft.functions.Stats.dsum(col("value").cast("double"), 12) /
        count(lit(1))).as("mv"))
    graft.operators.DriftOps.permutationTest(
      perUser, "user_id", "mv", pmod(col("user_id"), lit(2)) === 0)
  }

  // ---------------------------------------------------------------- q401
  // TWO-feature logistic on q189's slice (quantity + discount): the
  // multivariable portable fit — adjusted coefficients from a 3×3
  // Cramer-solved Fisher step each round, still hash-checked end to
  // end via a recursive CTE.
  def q401(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.irlsLogistic2Portable(
      withReturnFlagBin(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)),
      "l_quantity", "l_discount", "l_returnflag_bin", iters = 6)

  // ---------------------------------------------------------------- q402
  // Dataset cartography over q189's portable training trajectory:
  // per-example confidence/variability across the 6 Newton steps,
  // bucketed easy/ambiguous/hard — the curation map (ambiguous carries
  // the signal, a fat hard region means label noise), fully
  // deterministic because the trajectory is the round-9 fixed-point
  // path.
  def q402(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.trainingCartography(
      withReturnFlagBin(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)),
      "l_quantity", "l_returnflag_bin", iters = 6)

  // ---------------------------------------------------------------- q403
  // Competing-risks cumulative incidence: signup → first purchase vs
  // first error, whichever strikes first — Aalen–Johansen CIFs per
  // cause, the correct "converted by day t" when 1−KM-per-cause would
  // overstate both.
  def q403(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("__h"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__s"))
    def firstOf(tp: String, alias: String) =
      ev.filter(col("event_type") === tp)
        .join(broadcast(signup), "user_id")
        .filter(unix_micros(col("ts")) >= col("__s"))
        .groupBy(col("user_id"))
        .agg(min(unix_micros(col("ts"))).as(alias))
    val purchaseFirst = col("__p").isNotNull &&
      (col("__e").isNull || col("__p") <= col("__e"))
    val subjects = signup
      .join(firstOf("purchase", "__p"), Seq("user_id"), "left")
      .join(firstOf("error", "__e"), Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        (coalesce(when(purchaseFirst, col("__p"))
          .otherwise(col("__e")), col("__h")) - col("__s")).as("__dur_us"),
        when(purchaseFirst, 1)
          .when(col("__e").isNotNull, 2).otherwise(0).as("cause"))
      .select(expr("__dur_us div 86400000000").as("dur_days"),
        col("cause"))
    graft.operators.SurvivalOps
      .competingRisks(subjects, "dur_days", "cause")
      .orderBy(col("t"))
  }

  // ---------------------------------------------------------------- q404
  // RFM segmentation of customers: recency/frequency/monetary
  // quintiles from distributed midranks (ties share a quintile), one
  // row per populated cell with size, share, mean order value — the
  // classic customer-value map on the portable rank machinery.
  def q404(spark: SparkSession, dir: String): DataFrame =
    graft.metrics.RankMetrics.rfmSegments(
      t(spark, dir, "orders"), "o_custkey", "o_orderdate",
      "o_totalprice")

  // ---------------------------------------------------------------- q405
  // Calibration slope/intercept (logistic recalibration, Cox 1958):
  // refit y on logit(score) — slope < 1 reads "overconfident",
  // intercept ≠ 0 reads "base-rate shift". The third leg of the
  // calibration family: q197 MEASURES miscalibration (ECE), q126/q224
  // FIX it (isotonic/Platt), this one names WHICH kind it is. Reuses
  // the q189 round-9 Newton contract on the logit-transformed score.
  def q405(spark: SparkSession, dir: String): DataFrame = {
    val s = (col("o_orderkey") * 7 % 1000) / lit(1000.0)
    val sc = greatest(lit(1e-6), least(lit(0.999999), s))
    val d = t(spark, dir, "orders")
      .select(log(sc / (lit(1.0) - sc)).as("x"),
        (col("o_totalprice") > 150000).cast("double").as("y"))
    MlPipelines.irlsLogisticPortable(d, "x", "y", iters = 6)
      .orderBy(col("iter"))
  }

  // ---------------------------------------------------------------- q406
  // Allen interval-algebra census: per (user, day), the click span vs
  // the view span classified into the 13 temporal relations — the
  // profiling step that says WHICH temporal-join predicate the data
  // actually needs (the interval joins q05/q45/q63 each answer one).
  def q406(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def span(tp: String) = ev.filter(col("event_type") === tp)
      .groupBy(col("user_id"), to_date(col("ts")).as("day"))
      .agg(min(unix_micros(col("ts"))).as("s"),
        max(unix_micros(col("ts"))).as("e"))
    graft.operators.FuzzyJoins.allenCensus(
      span("click"), span("view"), Seq("user_id", "day"), "s", "e")
  }

  // ---------------------------------------------------------------- q407
  // Portable exact-split CART regression tree (depth 3) — the split
  // search inside the MLlib RF/GBT ensembles (q42/q59/q155; reference
  // train_ensemble.py:137-139) made hash-checkable: distinct-value
  // threshold candidates, round-2 variance-reduction gain argmax with
  // deterministic tie-break, min-5-rows leaves, round-6 leaf means —
  // the whole fit replays in unrolled level-by-level SQL. MLlib's
  // DecisionTreeRegressor is pinned to it on a separable fixture
  // (MlPipelinesSpec); the MLlib fits stay the production default.
  def q407(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.cartTreePortable(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 2000),
      "l_orderkey", "l_quantity", "l_discount",
      col("l_quantity").cast("double") *
        (lit(1.0) - col("l_discount").cast("double")) * lit(1000.0),
      maxDepth = 3, minLeaf = 5)

  // ------------------------------------------- q408–q417: SQL-surface II
  // Round-12 expansion of the SQL-text door (q146–q149/q153/q154/q167):
  // the ten most user-facing remaining families served as PURE SQL TEXT —
  // what a `spark.sql` analyst actually types. Five strings are
  // engine-portable and double as their own DuckDB oracles; the other
  // five share the proven oracle of their DataFrame sibling (dialect
  // functions only). Catalyst plans text and DSL identically, so none of
  // these pay a plan penalty (TakeOrdered for top-k, broadcast for the
  // small sides, prefix windows stay value-collapsed).

  // Interval join + stats in SQL (q05 semantics; portable text).
  def q408(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.intervalJoin)

  // As-of join in SQL via union-ordered last-click carry-forward (q63
  // semantics; the oracle stays DuckDB's native ASOF LEFT JOIN).
  def q409(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.asofJoin)

  // Weighted median in SQL (q101 semantics; portable text).
  def q410(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.weightedMedian)

  // Column profile in SQL (q104 semantics; dialect twin).
  def q411(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.profile)

  // Weekly cohort retention in SQL (q103 semantics; dialect twin).
  def q412(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.retention)

  // ROLLUP totals in SQL (q54 semantics; portable text).
  def q413(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.rollup)

  // Global top-k in SQL (q10 semantics; portable text).
  def q414(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.topk)

  // Text quality scoring in SQL (q13 semantics; dialect twin).
  def q415(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.textQuality)

  // Weekly trend in SQL (q07 semantics; portable text).
  def q416(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.weeklyTrend)

  // Per-key skew report in SQL (q112 semantics; dialect twin).
  def q417(spark: SparkSession, dir: String): DataFrame =
    sqlQ(spark, dir, SqlText.skewReport)

  // ---------------------------------------------------------------- q418
  // LSTM cell forward pass, hash-checked (reference M5 lstm.py:14-402):
  // per-user T=8 sequence pivot, 8 unrolled steps of the full
  // i/f/o/candidate gate recurrence on fixed round-9 weights, states
  // re-rounded to 9 per step — replays in DuckDB as chained per-step
  // CTEs (the q200 MLP-forward contract extended to recurrence).
  // Training stays out of scope by SURVEY-sanctioned design.
  def q418(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.lstmForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q419
  // Single-head scaled-dot-product attention forward at the last
  // position, hash-checked (reference M6 transformer.py:16-496):
  // round-9 q/k/v projections, max-shift softmax, attention-weighted
  // value mix + weight entropy (the "where does it look" diagnostic).
  def q419(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.attentionForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q420
  // TRAINED recurrent model, hash-checked: 1-unit Elman RNN learns
  // next-step prediction by 6 full-batch gradient steps, gradients from
  // forward-mode RTRL sensitivities riding the staged recurrence —
  // the whole training TRAJECTORY (params, clipped gradients, MSE
  // descent) replays in DuckDB, closing the "trainable deep sequence
  // model" gap at the smallest portable scale (reference M5
  // trainer.py:262-320; full-width BiLSTM training stays out of scope
  // by SURVEY-sanctioned design).
  def q420(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.rnnRtrlTrain(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q421
  // Full transformer encoder block forward, hash-checked (reference M6
  // transformer.py:16-496): scalar token embedding + polynomial
  // positional encoding (sin/cos are not in the proven-portable set),
  // Q/K/V attention with max-shift softmax, residual + LayerNorm, ReLU
  // FFN + residual — every sub-layer the reference stacks, in order.
  def q421(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.transformerBlockForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q422
  // Two-level coarse→fine IVF assignment card — the 100 TB assignment
  // path ([[SimilarityOps.ivfAssignTwoLevel]], auto-engaged above 2048
  // centroids) exercised explicitly at card scale: 12 portable centroids
  // → 3 contiguous coarse blocks of 4 (reps = lowest-id member), each
  // vector probes its best 2 blocks (round-6 cosine, block-id ties) and
  // argmaxes over just those blocks' fine centroids. Per-fine-centroid
  // occupancy + round-6 mean assigned cosine, hash-checked — so the plan
  // that replaces the unbounded flat broadcast at scale is itself
  // oracle-green, not just spec'd.
  def q422(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val cents = SimilarityOps.ivfCentroidsPortable(
      e, "vec_id", "embedding", nlist = 12)
    val assigned = SimilarityOps.ivfAssignTwoLevel(
      e, "vec_id", "embedding", cents, nlist = 12, coarseProbe = 2,
      simRound = Some(6))
    assigned.join(cents, Seq("centroid_id"))
      .select(col("centroid_id"), col("vec_id"),
        round(SimilarityOps.cosineNative(col("emb"), col("centroid")), 6)
          .as("__cos"))
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_assigned"),
        min(col("vec_id")).as("min_vec_id"),
        round(dsum(col("__cos"), 12) / count(lit(1)), 6).as("avg_cosine"))
      .orderBy(col("centroid_id"))
  }

  // ---------------------------------------------------------------- q425
  // TRAINED 1-unit LSTM, hash-checked: q420's RTRL recipe extended to
  // the full gated cell (reference lstm.py:78-100) — ∂c/∂θ and ∂h/∂θ
  // sensitivities for all 12 gate parameters ride the staged recurrence,
  // full-batch clipped gradient steps, and the whole training TRAJECTORY
  // (params, gradients, MSE descent) replays in DuckDB as chained
  // per-iteration CTE blocks.
  def q425(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.lstmRtrlTrain(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q427
  // Attention-pooling forward over the q418 LSTM's full hidden
  // trajectory, hash-checked (reference lstm.py:24-42 — the softmax-
  // scored pooling the reference puts on top of every RNN): score MLP
  // w2·tanh(a·h_t + b1) + b2 per step, max-shift softmax, weight-mixed
  // pooled output; per-position weights exposed (w1..w8) so "where
  // does the pooling look" is queryable.
  def q427(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.attentionPoolingForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q428
  // Bidirectional LSTM forward, hash-checked (reference lstm.py:99-122,
  // bidirectional=True, output dim 2x hidden): the q418 cell runs the
  // sequence forward with the q418 weights and backward with an
  // independent reverse draw (torch's weight_*_reverse), both
  // interleaved in ONE staged plan; final states concat as
  // (hf1,hf2,hb1,hb2) — torch's [h_fwd; h_bwd].
  def q428(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.bidiLstmForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q429
  // The q421 encoder block on the reference's TRUE sinusoidal
  // positional encoding (transformer.py:16-45), shipped the q423 way:
  // sin/cos computed once driver-side, rounded to 9, embedded as
  // identical literals in the Spark plan and the oracle SQL — closes
  // the documented polynomial-PE divergence without widening the
  // proven-portable function set.
  def q429(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.transformerBlockForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value",
      pe = graft.ml.SeqForward.posEncSin)

  // ---------------------------------------------------------------- q430
  // Masked attention over SHORT windows (transformer.py:94-133 masking,
  // dataset.py:287-298 pad/truncate): users with Tmin<=n<T events are
  // admitted, missing positions carried as NULL (= −inf: exp→NULL→
  // weight 0, GREATEST skips NULLs in both engines), q attends from
  // the last VALID position. Full windows reproduce q419's unmasked
  // arithmetic digit for digit (spec'd padding invariance).
  def q430(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.maskedAttentionForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q431
  // GRU cell forward, hash-checked (the reference's rnn_type="gru"
  // variant, lstm.py:111 nn.GRU): torch gate semantics with the hidden
  // bias INSIDE the reset product — r/z sigmoid gates, candidate
  // n = tanh(W_in x + b_in + r*(W_hn h + b_hn)), h' = (1-z)*n + z*h —
  // unrolled T steps on a disjoint round-9 draw.
  def q431(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.gruForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q432
  // Two-layer stacked LSTM forward, hash-checked (the reference default
  // depth: num_layers=2 at lstm.py:73): layer 2 consumes layer 1's full
  // per-step hidden sequence (snapshotted columns) with its own disjoint
  // draw; both layers' final states exposed.
  def q432(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.stackedLstmForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q433
  // The reference model's WHOLE inference path, hash-checked end to end
  // (lstm.py:59-230 HiveLSTM.forward): input Linear(1→2) + LayerNorm
  // (torch ε=1e-5, learned γ/β) → bidirectional LSTM (per-position
  // [h_fwd;h_bwd], dim 4) → attention pooling (Linear→Tanh→Linear
  // scores, softmax, mix) → output Linear(4→2)+ReLU → regression head.
  // A reference user can run model inference here and hash-match it.
  def q433(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.hiveLstmForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q434
  // The reference's SECOND model's whole inference path, hash-checked
  // (transformer.py:180-330 HiveTransformer.forward): input Linear +
  // LayerNorm, learned CLS token, absolute-position sinusoidal PE
  // (shared literals), TWO stacked encoder blocks (full-sequence
  // 2-head attention in block 1; block 2 computed at the CLS position,
  // whose output is all CLS pooling reads), tanh-GELU FFNs (documented
  // erf divergence), output Linear+GELU, regression head.
  def q434(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.hiveTransformerForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q435
  // Packed-sequence LSTM forward (torch pack_padded_sequence,
  // lstm.py:170-180): Tmin<=n<=T windows admitted, state updates are
  // CASE-guarded no-ops past each user's true length — packing's "this
  // sequence has left the batch" semantics with no sort/pack/unpack.
  // Full windows reproduce q418 digit for digit (spec'd).
  def q435(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.packedLstmForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q436
  // The reference's HEADLINE model's whole inference path, hash-checked
  // (mlp.py:47-149 HiveMLP, classification — the 83.7% winner,
  // EXPERIMENTS.md:11): input Linear(8→2) + LayerNorm → THREE residual
  // blocks h = h + block(h) (block = Linear→LayerNorm→ReLU) →
  // classification head + max-shift softmax. Probabilities, argmax
  // class (tie → 0, torch argmax-first), trunk features exposed.
  // With q433/q434 all three reference models now replay end to end.
  def q436(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.hiveMlpForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q437
  // TRAINED weighted-cross-entropy classifier under AdamW, hash-checked
  // (trainer.py:146-150 CrossEntropyLoss(weight=class_weights); weights
  // = normalized inverse class frequency, trainer.py:352-366): miniature
  // 2-class softmax over (x1, x8), closed-form CE gradients w_y·(p−y),
  // torch weighted-mean reduction (÷ Σw, exact from counts), clip ±1,
  // q426's exact-decimal AdamW chains. The whole trajectory (params,
  // gradients, weighted loss descent) replays in DuckDB with the class
  // weights computed IN SQL from the same counts.
  def q437(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.ceWeightedAdamwTrain(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q438
  // DUAL-HEAD MLP forward, hash-checked (mlp.py:151-217 DualHeadMLP):
  // the q436 trunk bank SHARED, simultaneous regression head
  // (Linear(2→1)→ReLU→Linear(1→1)) AND classification logits in ONE
  // plan — the reference's "exact frame count + high/low class in a
  // single pass" shape. Spec pins trunk features against the
  // single-head twin.
  def q438(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.dualHeadMlpForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q439
  // The scripts/evaluate.py lifecycle as ONE plan, hash-checked
  // (evaluate.py:124-176): HiveMLP whole-model forward → softmax +
  // argmax → classification metric card (accuracy, confusion matrix,
  // precision/recall/F1 from counts, balanced accuracy, log-loss,
  // Brier) against the held-out (T+1)-th value binarized at ceThr —
  // a REAL holdout, graded end to end in-engine.
  def q439(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.mlpEvaluateCard(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q440
  // DualHeadLSTM forward, hash-checked (lstm.py:243-340): the q433
  // HiveLSTM trunk (input proj + LayerNorm → bidi LSTM → attention
  // pooling → shared Linear(4→2)+ReLU projection) emitting the
  // regression output AND classification softmax simultaneously in
  // ONE plan; reg_pred is bit-identical to q433's pred (spec'd).
  def q440(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.hiveLstmForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value",
      dualHead = true)

  // ---------------------------------------------------------------- q441
  // DualHeadTransformer forward, hash-checked (transformer.py:345-440):
  // the q434 HiveTransformer trunk (CLS + PE → two stacked blocks →
  // CLS pooling → shared Linear(2→1)+GELU projection) emitting both
  // heads in one plan; reg_pred bit-identical to q434's pred (spec'd).
  def q441(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.hiveTransformerForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value",
      dualHead = true)

  // ---------------------------------------------------------------- q426
  // TRAINED Elman RNN under the reference's DEFAULT optimizer, hash-
  // checked (trainer.py:125-131 AdamW, weight_decay=0.01 at :89):
  // q420's RTRL gradient machinery driven by AdamW — per-parameter
  // first/second moments ride the iteration fold, bias correction
  // divides by driver-literal 1−βᵗ factors, decoupled decay multiplies
  // the WEIGHT (the gradient entering the moments stays raw). The whole
  // optimizer trajectory replays in DuckDB — the last training-loop
  // knob (schedules q423, early stop q155/q194, clipping q420/q425).
  def q426(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.rnnAdamwTrain(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q424
  // TWO-HEAD transformer encoder block forward, hash-checked (reference
  // M6 transformer.py:62-133 head split, num_heads=4 at :196 — here
  // d_model=2 splits into 2 heads of head_dim=1, same split/per-head
  // softmax/concat/W_O arithmetic): per-head outputs exposed as
  // head1_out/head2_out so head independence is queryable; residual +
  // LayerNorm + ReLU FFN as q421.
  def q424(spark: SparkSession, dir: String): DataFrame =
    graft.ml.SeqForward.multiHeadBlockForward(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "value")

  // ---------------------------------------------------------------- q423
  // LR-schedule replay card (reference trainer.py:137-141,294): the
  // per-day val-loss history drives a torch-semantics ReduceLROnPlateau
  // (min mode, rel threshold 1e-4, patience 5, factor 0.5) replayed as an
  // in-engine aggregate() fold — comparisons + exact halvings, so a
  // DuckDB recursive CTE replays the whole trajectory — joined with the
  // CosineAnnealingLR(T_max=100) closed form as shared round-12 literals
  // (the q418–q421 convention; cos isn't cross-engine-portable).
  def q423(spark: SparkSession, dir: String): DataFrame =
    graft.ml.LrSchedule.plateauCosineCard(
      t(spark, dir, "events"), "ts", "value")

  // ---------------------------------------------------------------- q357
  // AMS/count-sketch F2 of the (user, event_type) stream: 3×64 signed
  // counters from disjoint MD5 slices, per-row estimates Σc², median
  // row vs the exact second moment — join-size estimation in fixed
  // memory; counters are additive (mergeable across days/partitions).
  def q357(spark: SparkSession, dir: String): DataFrame = {
    val keyed = amsKeyed(t(spark, dir, "events"))
    SketchOps.amsF2Card(
      SketchOps.amsCounters(keyed, col("k")), amsExact(keyed))
  }

  // ---------------------------------------------------------------- q358
  // Streaming twin of q357 (SHARED oracle): the counter matrix is pure
  // additive bounded state (3×64 BIGINTs forever) in one complete-mode
  // aggregation — streamed counters ≡ batch under any micro-batching.
  def q358(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingAmsF2(
      spark, dir, "events.parquet", rows = 3, width = 64,
      graft.streaming.StreamSink.Memory("q358_ams"), amsKeyed)

  // ---------------------------------------------------------------- q359
  // Hurst exponent by R/S analysis over dyadic windows 8..64: the
  // long-memory scaling law behind q341's single-horizon variance
  // ratios; exact block integers, log–log OLS slope.
  def q359(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.hurstRsDailyCounts(t(spark, dir, "events"), "ts",
      sizes = Seq(4, 8, 16, 32))

  // ---------------------------------------------------------------- q349
  // Kuiper two-sample on click-vs-view values: D⁺ + D⁻ over the shared
  // ECDF grid — the two-tail-fair sup statistic next to q115's KS,
  // exact integer cross-product numerators.
  def q349(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.kuiperTwoSample(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q350
  // Cramér–von Mises two-sample: midrank U with every tie group's
  // deviation sum collapsed in closed form, U·12 an exact integer off
  // the cumulative grid — the integrated member of the ECDF battery.
  def q350(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.cramerVonMisesTwoSample(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q351
  // Two-sample Anderson–Darling (midrank A²): tail-weighted ECDF gap,
  // doubled midrank integers per grid value, round-6 decimal term
  // sums — the tail-sensitive member of the battery.
  def q351(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.andersonDarlingTwoSample(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q312
  // Empirical-Bayes shrinkage of per-source long-doc rates: beta prior
  // by method of moments over the source rates, each source's rate
  // shrunk (k+α)/(n+α+β) — the small-sample stabilizer behind every
  // per-source quality ranking.
  def q312(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.ebShrinkageCard(
      t(spark, dir, "documents"), "source", col("n_chars") >= 200)

  // ---------------------------------------------------------------- q313
  // Wilcoxon signed-rank on per-user paired click-vs-view mean values:
  // the PAIRED companion to q259's unpaired rank test — same-key
  // differences midranked by the distributed bucketed scheme, tie-exact
  // normal approximation.
  def q313(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.wilcoxonSignedRank(
      t(spark, dir, "events"), "user_id", "value", "event_type",
      "click", "view")

  // ---------------------------------------------------------------- q314
  // Streaming twin of q309 (SHARED oracle): the per-group confusion
  // cells are pure additive complete-mode state; the same
  // fairnessFromCells finisher lands on the batch card bit-for-bit
  // under any micro-batching — the always-fresh bias monitor.
  def q314(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingFairnessCard(
      spark, dir, "orders.parquet", "o_orderpriority",
      col("o_totalprice") > 150000,
      ((col("o_orderkey") % 1000) / lit(1000.0) +
        col("o_totalprice") / lit(1e6)) > 0.65,
      graft.streaming.StreamSink.Memory("q314_fairness"))
  }

  // ---------------------------------------------------------------- q309
  // Fairness audit over order priority as the protected attribute:
  // per-group selection rate, TPR, FPR, precision and their gaps vs the
  // pooled rates — the bias gate on q46's scored frame at a fixed 0.65
  // threshold. One count aggregation; ratios of exact BIGINTs.
  def q309(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", col("o_totalprice") > 150000)
      .withColumn("score",
        (col("o_orderkey") % 1000) / lit(1000.0) +
          col("o_totalprice") / lit(1e6))
    graft.metrics.MetricQueries.fairnessCard(d, "o_orderpriority",
      col("label"), col("score") > 0.65)
  }

  // ---------------------------------------------------------------- q310
  // Peaks-over-threshold GPD tail card on event values: excesses above
  // the exact 95th percentile (integer milli-units), method-of-moments
  // ξ/σ, and the extrapolated 1-in-1000 return level — the principled
  // extreme-value sibling of the MAD gate.
  def q310(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.potGpdTail(
      t(spark, dir, "events"), "value")

  // ---------------------------------------------------------------- q311
  // Feature-hashing collision sweep: the corpus vocabulary hashed into
  // 256/1024/4096 buckets via the portable congruential draw, with the
  // collided-term count and the token MASS sitting in collided buckets
  // — the hashing-trick sizing audit behind q232.
  def q311(spark: SparkSession, dir: String): DataFrame =
    TextOps.hashCollisionSweep(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q306
  // Maximal-marginal-relevance selection: 10 greedy picks balancing
  // anchor relevance (λ=0.7) against similarity to what's already
  // chosen — the relevance-aware sibling of q219's k-center traversal,
  // one linear argmax scan per pick, rounded-cosine portable.
  def q306(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.mmrSelect(t(spark, dir, "embeddings"),
      "vec_id", "embedding", k = 10)

  // ---------------------------------------------------------------- q307
  // RAKE keyword extraction over the corpus: stopword-delimited
  // candidate phrases scored by summed word degree/frequency — the
  // phrase-level keyword miner next to q255's PMI collocations.
  def q307(spark: SparkSession, dir: String): DataFrame =
    TextOps.rakeKeywords(t(spark, dir, "documents"), "doc_id", "text")

  // ---------------------------------------------------------------- q308
  // Holt double-exponential smoothing of the daily event count: level +
  // trend states with one-step-ahead fitted values — the adaptive-trend
  // forecaster between q164's EWMA and q290's segmented OLS. Driver
  // recursion over the bounded day spine (contract-enforced), recursive-
  // CTE oracle.
  def q308(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.holtLinear(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q303
  // Huber-IRLS robust regression (price-per-quantity line under a
  // δ=10 robustness radius): the outlier-resistant member of the
  // portable-fit family — fixed 8 Newton-weighted-LS rounds, round-9
  // params, recursive-CTE oracle replay (the q189 contract).
  def q303(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.huberIrlsPortable(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)
        .withColumn("y", col("l_extendedprice") / lit(1000.0)),
      "l_quantity", "y", delta = 10.0, iters = 8)
      .orderBy(col("iter"))

  // ---------------------------------------------------------------- q304
  // Linear-SHAP attribution card over the closed-form 2-feature OLS
  // (quantity + discount → price): per-feature coefficient, E|φ|, and
  // normalized share — model explanation without per-row attributions.
  def q304(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.linearShapCard(
      t(spark, dir, "lineitem")
        .withColumn("y", col("l_extendedprice") / lit(1000.0)),
      "l_quantity", "l_discount", "y")

  // ---------------------------------------------------------------- q305
  // Drop-column importance on the same closed-form surface: R² of the
  // full fit vs each genuine 1-feature refit — all three fits from ONE
  // exact-decimal moment row, zero extra scans.
  def q305(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.dropColumnImportanceCard(
      t(spark, dir, "lineitem")
        .withColumn("y", col("l_extendedprice") / lit(1000.0)),
      "l_quantity", "l_discount", "y")

  // ---------------------------------------------------------------- q300
  // DeLong variance + 95% CI for q46's ROC-AUC: placement values from
  // three distributed midrank passes (combined / positives / negatives),
  // joined per distinct score — the error bar without ever
  // materializing per-row ranks.
  def q300(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("score",
        (col("o_orderkey") % 1000) / lit(1000.0) +
          col("o_totalprice") / lit(1e6))
    graft.metrics.RankMetrics.delongAuc(d, "score", "label")
  }

  // ---------------------------------------------------------------- q301
  // Average precision (PR-AUC, step-wise) on the same scored frame:
  // the imbalance-honest companion to q46, with the prevalence baseline
  // it must beat. Descending cumulatives via the bucketed prefix scheme.
  def q301(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("score",
        (col("o_orderkey") % 1000) / lit(1000.0) +
          col("o_totalprice") / lit(1e6))
    graft.metrics.RankMetrics.averagePrecision(d, "score", "label")
  }

  // ---------------------------------------------------------------- q302
  // Murphy decomposition of the Brier score over 20 probability bins:
  // reliability / resolution / uncertainty plus the within-bin terms
  // that close the identity exactly — q197's ECE, diagnosed.
  def q302(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("prob", (col("o_orderkey") % 997) / lit(996.0))
    graft.metrics.MetricQueries.brierDecomposition(d, "prob", "label")
  }

  // ---------------------------------------------------------------- q297
  // Exact 1-D Wasserstein-1 (earth-mover) distance between click and
  // view value distributions: the ECDF-gap integral, in value units —
  // the drift magnitude KS (q115) can't give. Distributed prefix sums
  // via the range-bucket scheme; DECIMAL term sums for portability.
  def q297(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.wasserstein1d(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q298
  // Energy distance (Székely–Rizzo) between the same two populations:
  // every pairwise-|difference| expectation computed in O(grid) from
  // sorted prefix moments — never an O(n²) pair join — plus the scaled
  // two-sample test statistic.
  def q298(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.energyDistance(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q299
  // Log-rank (Mantel–Cox) test on q122's signup→purchase survival
  // durations, cohorted by user-id parity: the hypothesis-test
  // companion to the Kaplan–Meier curve, from the same per-day risk
  // sets (aggregate-before-global-window rule throughout).
  def q299(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("__h"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__s"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .join(broadcast(signup), "user_id")
      .filter(unix_micros(col("ts")) >= col("__s"))
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__p"))
    val durations = signup
      .join(firstPurchase, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        col("user_id"),
        expr("coalesce(__p, __h) - __s").as("__dur_us"),
        col("__p").isNotNull.as("__event"))
      .select(expr("__dur_us div 86400000000").as("dur_days"),
        col("__event"), (col("user_id") % 2 === 0).as("__cohort_a"))
    graft.operators.SurvivalOps.logRankTest(
      durations, "dur_days", "__event", col("__cohort_a"))
  }

  // ---------------------------------------------------------------- q295
  // Token burstiness (Church & Gale): per-doc VMR of the top-20 corpus
  // tokens — content words clump, function words ride the Poisson
  // line; zeros enter through the closed form, never an explosion.
  def q295(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenBurstiness(t(spark, dir, "documents"), "doc_id", "text")

  // ---------------------------------------------------------------- q294
  // Conditional bigram entropy H(w2|w1) vs unigram H(w): the
  // predictability-gain card — how many nats one token of context
  // buys, without training a model (q133's perplexity needs one).
  def q294(spark: SparkSession, dir: String): DataFrame =
    TextOps.conditionalBigramEntropy(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q293
  // Hill tail-index of the token-frequency distribution over the
  // top-50 counts — the principled heavy-tail exponent next to q140's
  // log-log Zipf regression (the regression is biased by the body).
  def q293(spark: SparkSession, dir: String): DataFrame =
    TextOps.hillTailIndex(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q292
  // Streaming twin of q269 (SHARED oracle): the (day, count) frame is
  // additive complete-mode state; the same spine/lag finisher lands on
  // the batch ACF bit-for-bit.
  def q292(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingDailyAcf(
      spark, dir, "events.parquet", "ts", maxLag = 7,
      graft.streaming.StreamSink.Memory("q292_acf"),
      prepare = Tables.normalizeEventTs)
  }

  // ---------------------------------------------------------------- q291
  // Pairwise Mann–Whitney z matrix with BH control across ALL event-
  // type pairs from ONE pass (per-group cumulative counts on the shared
  // value spine) — the post-hoc step after q261's Kruskal–Wallis:
  // WHICH pairs differ, FDR-controlled.
  def q291(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.pairwiseRankMatrix(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q290
  // Two-segment trend fit of daily volume: least-squares breakpoint
  // (slope change — what CUSUM's level detector smears), exact prefix
  // moments on the calendar spine, SSE-reduction evidence weight.
  def q290(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.segmentedTrendFit(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q289
  // Vocabulary-richness card: V, N, f1/f2, bias-corrected Chao1 lower
  // bound on true vocabulary, Good's coverage 1−f1/N, Herdan's C —
  // how much lexicon the crawl has NOT seen yet, in one row.
  def q289(spark: SparkSession, dir: String): DataFrame =
    TextOps.vocabRichnessCard(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q288
  // Streaming twin of q276 (SHARED oracle): the per-group moment frame
  // is additive complete-mode state (|segments| rows); the same
  // bhFdrFromMoments finisher re-ranks the fleet on demand.
  def q288(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingBhFdr(
      spark, dir, "events.parquet", "value", "event_type", alpha = 0.05,
      graft.streaming.StreamSink.Memory("q288_bhfdr"),
      prepare = Tables.normalizeEventTs)
  }

  // ---------------------------------------------------------------- q287
  // Levene variance-equality across event types: the VARIANCE member
  // of the drift battery (means q266, shape q115, location q259) —
  // ANOVA on |x − mean_g|, exact decimal two-pass moments.
  def q287(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.leveneTest(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q286
  // One-way ANOVA F + η² across event types: the k-sample parametric
  // screen with the effect size an F-test alone hides at scale.
  def q286(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.anovaF(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q285
  // Rank-biased overlap between the quality-score and token-count
  // orderings of the corpus top-50 — do two curation rankings agree
  // where it matters (geometric top-weighting, p=0.9)? exp/ln powers,
  // decimal term sums, two TakeOrdered selections only.
  def q285(spark: SparkSession, dir: String): DataFrame = {
    val q = TextOps.withQuality(t(spark, dir, "documents"), "text",
      Seq("the", "a"))
    graft.metrics.RankMetrics.rankBiasedOverlap(q, "doc_id",
      Seq(col("quality_score").desc, col("doc_id")),
      Seq(col("n_tokens").desc, col("doc_id")))
  }

  // ---------------------------------------------------------------- q284
  // Wald SPRT mean-shift monitor: baseline μ0/σ0 from the first half
  // of days, one-sigma alternative, exact decimal prefix masses, the
  // first ln((1−β)/α) / ln(β/(1−α)) crossing = the decision day —
  // WHEN the evidence sufficed, with α/β control (q267 says where).
  def q284(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.sprtMeanShift(
      t(spark, dir, "events"), "ts", "value")

  // ---------------------------------------------------------------- q283
  // Good–Turing frequency-of-frequencies: N_r for r=1..10, unseen-mass
  // estimate p0=N1/N, smoothed r* — whether the corpus/vocab is
  // saturating. Exact counting end to end.
  def q283(spark: SparkSession, dir: String): DataFrame =
    TextOps.goodTuringCard(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q282
  // Daily-count overdispersion: VMR + index-of-dispersion χ² against
  // the Poisson null — whether rate alerts can use Poisson bands.
  // Calendar-spine zero days; exact integer moments.
  def q282(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.overdispersionCard(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q281
  // Streaming twin of q267 (SHARED oracle): per-day decimal masses as
  // complete-mode additive state (bounded by the calendar span), the
  // same cusumFromDaily finisher — stream ≡ batch bit-for-bit.
  def q281(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingCusumChangePoint(
      spark, dir, "events.parquet", "ts", "value",
      graft.streaming.StreamSink.Memory("q281_cusum"),
      prepare = Tables.normalizeEventTs)
  }

  // ---------------------------------------------------------------- q280
  // HRW shard-resize movement card over distinct user ids: measured
  // moved-key fraction for rendezvous hashing (≈1/nTo) vs naive mod
  // (≈ everything) when 16 shards become 17 — the resize cost of a
  // bucketed 100 TB layout, quantified on the real key population.
  def q280(spark: SparkSession, dir: String): DataFrame =
    SplitOps.hrwShardMovementCard(t(spark, dir, "events"), "user_id")

  // ---------------------------------------------------------------- q279
  // Diagonal-Mahalanobis embedding outliers: per-dim exact-decimal
  // stats (q247's accumulators), per-vector D² with decimal term sums,
  // TakeOrdered top-10 — the whole-corpus anomaly screen before any
  // clustering.
  def q279(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.embeddingOutlierCard(t(spark, dir, "embeddings"),
      "vec_id", "embedding", k = 10)

  // ---------------------------------------------------------------- q278
  // Day-of-week seasonality card of the daily event-value mass:
  // multiplicative index per weekday + ANOVA R² strength — whether
  // day-over-day alerts need dow-adjustment. Weekday from pure
  // epoch-day arithmetic (0=Monday), immune to locale dayofweek().
  def q278(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.seasonalDowCard(t(spark, dir, "events"), "ts", "value")

  // ---------------------------------------------------------------- q277
  // Confident-learning label-noise audit (Northcutt et al. 2021) over
  // q203's NB probabilities: per-class confidence thresholds, the
  // confident joint (given → suspected) on the held-out split — WHICH
  // labels to re-annotate first. Softmax denominators accumulate as
  // exact decimals of rounded terms (order-free).
  def q277(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.confidentLearningCard(
      t(spark, dir, "lineitem"), "l_orderkey", "l_returnflag",
      "l_quantity", "l_discount")

  // ---------------------------------------------------------------- q276
  // Benjamini–Hochberg FDR over the per-event-type one-vs-rest Welch z
  // battery — multiple-comparisons discipline for segment drift
  // monitors: rejections are ranks ≤ k* = max{k: p(k) ≤ αk/m}. Normal
  // tail via the shared Abramowitz–Stegun polynomial (fixed-shape
  // doubles, bit-identical across engines).
  def q276(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.bhFdrCard(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q275
  // Streaming twin of q266 (SHARED oracle): the Welch moment frame —
  // two counts + four exact decimal sums — is pure additive state in
  // one complete-mode global aggregation (1 row, bounded forever);
  // the same welchFromMoments finisher lands on the batch answer
  // bit-for-bit under any micro-batching.
  def q275(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingWelchTTest(
      spark, dir, "events.parquet", "value", "event_type",
      "click", "view",
      graft.streaming.StreamSink.Memory("q275_welch"),
      prepare = Tables.normalizeEventTs)
  }

  // ---------------------------------------------------------------- q274
  // Cross-source unigram cross-entropy matrix: H(b‖a) of each source's
  // tokens under every source's add-1-smoothed LM — which sources can
  // share a mixing bucket, measured. One closed form per ordered pair
  // (unmatched words contribute ln(1)=0 — no outer join).
  def q274(spark: SparkSession, dir: String): DataFrame =
    TextOps.crossSourceCrossEntropy(t(spark, dir, "documents"),
      "source", "text")

  // ---------------------------------------------------------------- q273
  // Theil–Sen daily-volume trend: median of all pairwise day slopes
  // (29% breakdown — one crazy ingest day cannot move it) next to the
  // OLS slope it robustifies. The quadratic lives on the bounded day
  // spine only; the data collapses in one count aggregation.
  def q273(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.theilSenDailyTrend(
      t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q272
  // Poisson-bootstrap 95% CI + SE for mean l_extendedprice per return
  // flag — the 100 TB bootstrap (Chamandy et al. 2012): every row draws
  // its own Poisson(1) replicate weights from the seeded two-round
  // congruential generator, so all 64 replicates are ONE scan + one
  // keyed aggregation, no resample shuffle.
  def q272(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.poissonBootstrapMeans(
      t(spark, dir, "lineitem"),
      col("l_orderkey") * 10 + col("l_linenumber"),
      "l_extendedprice", "l_returnflag")

  // ---------------------------------------------------------------- q271
  // Cramér's V / Tschuprow's T over event_type × (user_id mod 7): the
  // association STRENGTH card a bare χ² (q100) hides at scale — at
  // 100 TB χ² rejects independence for trivially weak effects; V says
  // whether anyone should care. chiSquare's decimal-contribution shape.
  def q271(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.contingencyAssociation(
      t(spark, dir, "events"),
      col("event_type"), pmod(col("user_id"), lit(7)))

  // ---------------------------------------------------------------- q270
  // Wilson 95% score intervals for the 'F'-status rate per order
  // priority — the small-n-honest binomial band (Wald collapses at
  // p̂∈{0,1}); one count aggregation + stateless interval projection.
  def q270(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.wilsonRateCard(t(spark, dir, "orders"),
      "o_orderpriority", col("o_orderstatus") === "F")

  // ---------------------------------------------------------------- q269
  // Daily-event-count autocorrelation at lags 1..7 — the seasonality /
  // persistence probe of ingest volume (strong lag-7 = weekly rhythm).
  // Gap days are zero-volume observations via a calendar spine; exact
  // integer moments, bounded day-frame joins.
  def q269(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.dailyCountAcf(t(spark, dir, "events"), "ts", maxLag = 7)

  // ---------------------------------------------------------------- q268
  // Cochran–Armitage trend: is the 'F'-status rate monotone across the
  // ordered priority scores 1..5 — the dose-response screen χ² (q100)
  // cannot answer. Exact integer score moments; one category
  // aggregation.
  def q268(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.cochranArmitage(
      t(spark, dir, "orders"),
      substring(col("o_orderpriority"), 1, 1).cast("int"),
      col("o_orderstatus") === "F")

  // ---------------------------------------------------------------- q267
  // CUSUM change-point over the daily event-value mass: max
  // standardized deviation of the cumulative daily total from its
  // linear expectation + the argmax day — WHEN the mix moved, where
  // PSI (q82 family) only says THAT it moved. Exact decimal prefix
  // masses; arithmetic on the bounded day frame.
  def q267(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.cusumChangePoint(
      t(spark, dir, "events"), "ts", "value")

  // ---------------------------------------------------------------- q266
  // Welch's unequal-variance t (click vs view value): the parametric
  // mean-shift member of the drift battery next to q259's rank test
  // and q115's KS shape test — exact decimal moments, one conditional
  // aggregation, Welch–Satterthwaite df.
  def q266(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.welchTTest(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q265
  // Streaming twin of q248 (SHARED oracle): the corpus ingested as 3
  // id-RANGE waves (the append-log order); pass 1 records wave token
  // totals, pass 2 emits additive partial cards against the frozen
  // earlier-wave offsets; the summed card equals batch exactly.
  def q265(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT",
          System.getProperty("java.io.tmpdir"))),
      "graft_q265_")
    try {
      val e = t(spark, dir, "documents")
      val b = e.agg(min(col("doc_id")).cast("long"),
        max(col("doc_id")).cast("long")).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val span = mx - mn + 1L
      val (t1, t2) = (mn + span / 3, mn + 2L * span / 3)
      val tagged = e.withColumn("__w",
        when(col("doc_id") <= t1, 0)
          .when(col("doc_id") <= t2, 1).otherwise(2))
      val wavesDir = s"$root/waves"
      // all three wave fixtures in ONE job (was one scan+write per wave)
      graft.tools.WaveFiles.writeStamped(tagged, "__w", 3, wavesDir,
        root.toString)
      val res = graft.streaming.StreamingOps.streamingPackingCard(
        spark, wavesDir, "doc_id", "text", contextLen = 512,
        s"$root/store", bucketWidth = 100)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q264
  // OOV drift vs a frozen vocab: the early id-half's top-100 tokens
  // become the frozen vocabulary; each half's OOV rate + new token
  // types in the late half — tokenizer rot measured before perplexity
  // moves.
  def q264(spark: SparkSession, dir: String): DataFrame =
    TextOps.oovDriftCard(t(spark, dir, "documents"), "doc_id", "text",
      vocabSize = 100)

  // ---------------------------------------------------------------- q263
  // Token-balanced shard plan: docs assigned to shards by global token
  // offset (4096-token target, docs never split) — the token-budgeted
  // sibling of q242's count shards; per-shard mass + deviation. Same
  // two-level prefix sum as q248.
  def q263(spark: SparkSession, dir: String): DataFrame =
    SplitOps.tokenShardPlan(t(spark, dir, "documents"), "doc_id",
      "text", shardTokens = 4096L, bucketWidth = 100)

  // ---------------------------------------------------------------- q262
  // Corpus-concentration card: Gini + top-1%/10% token share of the
  // per-doc token mass — the inequality audit for mega-doc dominance.
  // Exact Lorenz arithmetic on the tie-collapsed mass frame; q115's
  // prefix-sum shape; rank-split tie mass at the share boundaries.
  def q262(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.concentrationCard(t(spark, dir, "documents"),
      size(split(trim(col("text")), " ")).cast("long"))

  // ---------------------------------------------------------------- q261
  // Kruskal–Wallis H across ALL event types: the k-sample screen
  // before pairwise rank tests (q259) — exact doubled midranks, tie
  // correction, the q115 prefix-sum shape.
  def q261(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.kruskalWallis(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q260
  // Learning-curve card: q183's closed-form ridge fitted on NESTED
  // 25/50/100% hash-bucket fractions of the train pool, scored on one
  // fixed holdout — "is more data still buying accuracy?" measured.
  // Bucket sufficient stats aggregated once; fractions are conditional
  // reductions over the 20-row frame.
  def q260(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.learningCurveRidge(t(spark, dir, "lineitem"),
      "l_orderkey", "l_quantity", "l_extendedprice", lambda = 1.0)

  // ---------------------------------------------------------------- q259
  // Mann–Whitney U (click vs view): the nonparametric LOCATION member
  // of the drift battery next to q115's KS shape test — exact doubled
  // midranks + tie correction in decimals, q115's two-level prefix-sum
  // shape, z and rank-biserial effect at the end.
  def q259(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.mannWhitneyU(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q258
  // Trimmed & winsorized means of l_extendedprice at 5% per side — the
  // robust-location card next to q208's MAD gate: boundaries by
  // counting search (no sort), tail mass by rank arithmetic, exact
  // micro-integer sums; raw-vs-trimmed spread = tail contamination.
  def q258(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.trimmedMeanCard(
      t(spark, dir, "lineitem"), "l_extendedprice", trimNum = 1L,
      trimDen = 20L)

  // ---------------------------------------------------------------- q257
  // LSH band-config sweep: q246's quality card across rowsPerBand ∈
  // {2,4,8} splits of ONE persisted signature matrix against ONE truth
  // set — the measured S-curve (recall vs candidate volume) that fixes
  // the banding before a corpus-scale dedup run.
  def q257(spark: SparkSession, dir: String): DataFrame =
    DedupOps.lshBandSweep(t(spark, dir, "documents"), "doc_id", "text")

  // ---------------------------------------------------------------- q255
  // PMI collocations: adjacent-token bigrams (count ≥ 5) scored
  // ln(c12·N/(c1·c2)) against unigrams, top-30 — the multi-word-unit
  // mining behind tokenizer-vocab design. Two count aggregations, two
  // vocab joins, TakeOrdered head.
  def q255(spark: SparkSession, dir: String): DataFrame =
    TextOps.pmiCollocations(t(spark, dir, "documents"), "text",
      minCount = 5L, k = 30)

  // ---------------------------------------------------------------- q253
  // Per-source frequency cap (domain cap): ≤10 docs per source, best
  // q13-quality first, id tiebreak — kept/dropped counts and token
  // mass per source, plus the quality bar the cap imposed. Bounded-k
  // window per source; no domain can dominate the mix.
  def q253(spark: SparkSession, dir: String): DataFrame =
    TextOps.sourceCapCard(t(spark, dir, "documents"), "source",
      "doc_id", "text", cap = 10)

  // ---------------------------------------------------------------- q180
  // Split-conformal prediction intervals: per-user mean fitted on the
  // first time half, |residual| quantile q̂ = ⌈0.9(n_cal+1)⌉-th smallest
  // calibration residual (third quarter; counting binary search — no
  // sort), empirical coverage measured on the held-out last quarter.
  // The conformal guarantee (coverage ≥ 0.9 in expectation) becomes a
  // measurable one-row card. Residuals scale to micro-integers so the
  // quantile search runs on exact longs.
  def q180(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = t(spark, dir, "events")
    val us = unix_micros(col("ts"))
    val rng = ev.agg(min(us).as("__mn"), max(us).as("__mx"))
    val w = ev.crossJoin(broadcast(rng))
      .withColumn("__q",
        when(us * 2 < col("__mn") + col("__mx"), "train")
          .when(us * 4 < col("__mn") + lit(3L) * col("__mx"), "cal")
          .otherwise("test"))
    val mu = w.filter(col("__q") === "train")
      .groupBy(col("user_id"))
      .agg(round(sum(col("value").cast("decimal(28,4)")).cast("double") /
        count(lit(1)), 6).as("__mu"))
    val scored = w.filter(col("__q") =!= "train")
      .join(mu, "user_id")
      .withColumn("__r",
        round(abs(col("value") - col("__mu")) * 1000000.0, 0).cast("long"))
    val cal = scored.filter(col("__q") === "cal")
      .select(col("__r")).persist()
    try {
      val nCal = cal.count()
      val nTrain = w.filter(col("__q") === "train").count()
      // ⌈0.9(n+1)⌉ in INTEGER arithmetic — double 0.9·(n+1) over-ceils
      // when n+1 is a multiple of 10 (0.9 is not exact in binary)
      val k = (9L * (nCal + 1) + 9L) / 10L
      val qhat =
        if (k > nCal) Long.MaxValue
        else RobustStats.kthSmallestByCounting(cal, "__r", k)
      val test = scored.filter(col("__q") === "test")
        .agg(count(lit(1)).as("__n"),
          sum(when(col("__r") <= qhat, 1L).otherwise(0L)).as("__cov"))
        .head()
      val nTest = test.getLong(0)
      // n_test = 0 (degenerate split): SUM is null and the ratio would be
      // NaN — emit null coverage, matching the oracle's NULL from an
      // empty-aggregate numerator
      val coverage: Option[Double] =
        if (nTest == 0L) None
        else Some(BigDecimal(test.getLong(1).toDouble / nTest.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      Seq((nTrain, nCal, nTest, qhat, coverage))
        .toDF("n_train", "n_cal", "n_test", "qhat_micro", "coverage")
    } finally { cal.unpersist(); () }
  }

  // ---------------------------------------------------------------- q179
  // Deterministic negative sampling (contrastive-training primitive):
  // 4 portable pseudo-random negatives per document anchor over the
  // dense [0, 500) id space, self-draws shifted by one. Pure per-row
  // projection — no shuffle until the caller joins payloads.
  def q179(spark: SparkSession, dir: String): DataFrame =
    SplitOps.negativeSamples(t(spark, dir, "documents"),
      "doc_id", n = 500L, k = 4)
      .orderBy(col("doc_id"), col("neg_rank"))

  // ---------------------------------------------------------------- q178
  // CUPED variance-reduced A/B: per-user pre-period mean (first time
  // half) absorbs the user's level; the pooled theta adjusts the
  // experiment metric (second half) and variance shrinks by rho^2 —
  // the experimentation upgrade over q121's plain z-test. Variants from
  // the portable hash split (q20's draw).
  def q178(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val us = unix_micros(col("ts"))
    val rng = ev.agg(min(us).as("__mn"), max(us).as("__mx"))
    val w = ev.crossJoin(broadcast(rng))
      .withColumn("__pre", us * 2 < col("__mn") + col("__mx"))
    def halfMean(pre: Boolean, name: String) =
      w.filter(col("__pre") === pre)
        .groupBy(col("user_id"))
        .agg(round(sum(col("value").cast("decimal(28,4)")).cast("double") /
          count(lit(1)), 6).as(name))
    val units = halfMean(pre = true, "x_pre")
      .join(halfMean(pre = false, "y_post"), "user_id")
      .withColumn("variant",
        when(SplitOps.hashBucket(col("user_id"), 2) === 0L, "A")
          .otherwise("B"))
    MetricQueries.cupedAb(units, "variant", "x_pre", "y_post")
      .orderBy(col("variant"))
  }

  // ---------------------------------------------------------------- q177
  // Jensen–Shannon drift per event_type — the symmetric, bounded (≤ln 2)
  // member of the drift battery next to PSI (q113), KS (q115) and chi²
  // (q100); js_distance = √(JS/ln 2) ∈ [0,1]. Same time-split binning
  // and Laplace smoothing as PSI, same one-bin-keyed-aggregation shape.
  def q177(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.jsDivergence(t(spark, dir, "events"),
      "event_type", "ts", "value")
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q176
  // Seasonality strength per user: does the hour-of-day profile explain
  // the value variance (1 − SSE_within/SSE_total on the seasonal-naive
  // model)? Pure sufficient-statistics ANOVA — two hash aggregations,
  // no windows, no per-event residual frame.
  def q176(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.seasonalStrength(t(spark, dir, "events"),
      "user_id", "ts", "value")
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q175
  // Percentile quality gate — THE corpus-curation cut: exact p10/p90 of
  // the quality score found by counting binary search (q129's no-sort
  // machinery; ~34 cheap scans, never a global sort), then the corpus
  // banded below/core/above. Scores scale to micro-integers first so
  // the search runs on exact longs. Output is one driver-sized card.
  def q175(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // NOT fanned out (ParOps.fanOut): A/B at sf0.1 measured the fanned
    // variant slower (1.33 s vs 0.93 s plain, median-of-5) — the scoring
    // pass is one scan's worth of regex work, and the percentile jobs
    // after it prefer the narrow persisted frame (the q404/q258 lesson)
    val scored = TextOps.withQuality(
        t(spark, dir, "documents"), "text", Seq("the", "a"))
      .select(col("doc_id"),
        round(col("quality_score") * 1000000.0, 0).cast("long").as("q_micro"))
      .persist()
    try {
      val n = scored.count()
      // empty corpus: no percentile is answerable — the degenerate
      // all-zero card, not a missing-rank crash
      if (n == 0L)
        return Seq((0L, 0L, 0L, 0L, 0L, 0L))
          .toDF("n_docs", "p10_micro", "p90_micro",
            "n_below", "n_core", "n_above")
      val k10 = (n + 9) / 10
      val k90 = (9 * n + 9) / 10
      // q_micro lives in the BOUNDED domain [0, 10⁶] — both percentiles
      // from one histogram pass instead of two counting binary searches
      // (~40 jobs); same kth-smallest definition, oracle unchanged
      val os = RobustStats.orderStatsBounded(scored, "q_micro", Seq(k10, k90))
      val p10 = os(k10)
      val p90 = os(k90)
      val bands = scored.agg(
        sum(when(col("q_micro") < p10, 1L).otherwise(0L)),
        sum(when(col("q_micro") >= p10 && col("q_micro") <= p90, 1L)
          .otherwise(0L)),
        sum(when(col("q_micro") > p90, 1L).otherwise(0L))).head()
      Seq((n, p10, p90, bands.getLong(0), bands.getLong(1), bands.getLong(2)))
        .toDF("n_docs", "p10_micro", "p90_micro",
          "n_below", "n_core", "n_above")
    } finally { scored.unpersist(); () }
  }

  // ---------------------------------------------------------------- q174
  // Rolling z-score anomaly flags per user over the event stream —
  // self-exclusive 20-row lookback, |z| > 3 flags. Exact decimal sums
  // over the bounded ROWS frame; null z (never divide-by-zero) below 2
  // priors or at zero variance.
  def q174(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.rollingZScore(t(spark, dir, "events"),
      "user_id", "ts", "event_id", "value", window = 20, threshold = 3.0)
      .orderBy(col("user_id"), col("ts"), col("event_id"))

  // ---------------------------------------------------------------- q173
  // Cross-source overlap matrix: which sources mirror each other, at
  // shingle grain, BEFORE any per-document dedup — shingles collapse to
  // their (bounded, small) source set, pairs explode from that set,
  // output ≤ n_sources² rows.
  def q173(spark: SparkSession, dir: String): DataFrame =
    DedupOps.sourceOverlapMatrix(t(spark, dir, "documents"),
      "source", "text", shingleSize = 3)
      .orderBy(col("src_a"), col("src_b"))

  // ---------------------------------------------------------------- q172
  // Temperature-scaled mixture weights (the data-mixture card):
  // per-source token mass → w = n^0.7/Σn^0.7 (flattened toward uniform)
  // + epochs-at-budget, the overfit-risk column. n^τ = exp(τ·ln n)
  // explicitly on both engines; the denominator sums rounded powers
  // through exact decimals.
  def q172(spark: SparkSession, dir: String): DataFrame =
    SplitOps.mixtureWeights(
      TextOps.withTokenStats(t(spark, dir, "documents"), "text"),
      "source", "n_tokens", temperature = 0.7, tokenBudget = 1000000L)
      .orderBy(col("source"))

  // ---------------------------------------------------------------- q171
  // Character n-gram profile language ID (Cavnar–Trenkle; the scale-up
  // path q14's heuristic scaladoc promises): self-trained per-language
  // trigram profiles (bounded |charset|³ keyspace → bounded rank
  // window), broadcast profile join, per-doc argmax with lang tiebreak.
  // (The synthetic fixture's lang labels are random word soup, so
  // accuracy is chance — the operator's semantics, not the fixture's
  // separability, are what the oracle checks.)
  def q171(spark: SparkSession, dir: String): DataFrame =
    TextOps.charNgramLangId(t(spark, dir, "documents"),
      "doc_id", "lang", "text", topK = 20)
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q170
  // Vocabulary construction (tokenizer-vocab builder): top-40 terms with
  // min-count 2, dense ids in (count desc, term) order, cumulative
  // token-coverage curve against the FULL corpus total. Head cap is
  // TakeOrdered (q140 contract); windows run over the capped frame.
  def q170(spark: SparkSession, dir: String): DataFrame =
    TextOps.buildVocabulary(t(spark, dir, "documents"), "text",
      maxVocab = 40, minCount = 2L)
      .orderBy(col("token_id"))

  // ---------------------------------------------------------------- q169
  // Stateful streaming EWMA (mapGroupsWithState): the true recurrence
  // y ← αx + (1−α)y carried as one record per user — the streaming twin
  // of q164's bounded-window batch form. The ordered fold is a fixed
  // IEEE sequence, so the emitted doubles hash-match the oracle's
  // ordered list_reduce replay with NO rounding (q118 precedent).
  def q169(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.streaming.StreamingOps.streamingEwma(
      spark, dir, "events.parquet", alpha = 0.2,
      graft.streaming.StreamSink.Memory(s"q169_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs)
    out.orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q168
  // Exact n-gram containment pairs — the asymmetric dedup relation
  // (doc-inside-doc: quotes, page-in-page scrapes) that symmetric
  // Jaccard (q39) misses under size imbalance. Same capped postings
  // machinery as q39; both directions reported.
  def q168(spark: SparkSession, dir: String): DataFrame =
    DedupOps.containmentPairs(t(spark, dir, "documents"), "doc_id", "text",
      shingleSize = 3, minContainment = 0.8, maxShingleDf = Some(1000))
      .orderBy(col("id_a"), col("id_b"))
}
