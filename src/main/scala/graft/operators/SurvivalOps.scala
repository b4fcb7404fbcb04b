package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Survival analysis: the Kaplan–Meier product-limit estimator over
  * right-censored durations. The reference's retention view of users is a
  * point-in-time aggregate (`/root/reference/src/data/preprocessing.py`
  * windowed counts); survival curves are the longitudinal generalization —
  * "how long until conversion/churn, given most subjects haven't converted
  * yet" — and the standard churn/time-to-event readout for a behavioral
  * table at any scale.
  *
  * Scale shape: one keyed aggregation collapses the data to one row per
  * distinct duration (a bounded time grid — days/weeks — so the frame is
  * tiny); the risk-set reverse-cumulative and the product-limit cumulation
  * run as ordered windows over THAT aggregated frame only, never over the
  * data (the q46/q115 rule: global windows only above aggregates).
  */
object SurvivalOps {

  /** Kaplan–Meier curve from per-subject (`durationCol`: integer time
    * units, `eventCol`: true = event observed, false = right-censored).
    * Returns one row per distinct duration with the risk set, event and
    * censor counts, and the product-limit survival estimate
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
    *
    * The product accumulates in log space (Σ ln(1 − dᵢ/nᵢ), exponentiated
    * once); every dᵢ/nᵢ is an exact-integer ratio divided once, and the
    * final estimate rounds to 6 so the curve is engine-portable.
    *
    * SCALE CONTRACT: the ordered windows run over the per-duration frame,
    * so the duration column must be a COARSE time grid (days/weeks —
    * thousands of distinct values). For fine-grained durations (seconds
    * at corpus scale → millions of distinct values through one window
    * task), pass `bucketWidth > 1` to floor durations onto a bounded grid
    * first; the curve is then evaluated at bucket lower edges, which is
    * the standard life-table coarsening.
    *
    * The contract is ENFORCED, not just documented: a cheap
    * `approx_count_distinct` pre-pass fails fast (with the fix in the
    * message) when the post-bucket grid would exceed `maxGridSize` — the
    * alternative is a silent single-task window over millions of rows,
    * the exact failure mode this operator's shape exists to avoid.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String, bucketWidth: Long = 1L,
      maxGridSize: Long = 10000L): DataFrame = {
    val tExpr =
      if (bucketWidth <= 1L) col(durationCol)
      else floor(col(durationCol).cast("long") / bucketWidth) * bucketWidth
    val approxGrid =
      df.agg(approx_count_distinct(tExpr).as("n")).head().getLong(0)
    require(approxGrid <= maxGridSize,
      s"kaplanMeier time grid too fine: ~$approxGrid distinct " +
        s"(bucketed) durations exceed maxGridSize=$maxGridSize, so the " +
        "product-limit window would funnel them through one task. Pass a " +
        "larger bucketWidth (life-table coarsening) or raise maxGridSize " +
        "deliberately.")
    val byT = df.groupBy(tExpr.as("t"))
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    // risk set: subjects with duration ≥ t — a reverse cumulative sum over
    // the per-duration frame
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wSurv = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censored")).over(wRisk))
      // a fully-depleted risk set (d == n, only possible at the last time
      // point) sends the product to exactly 0 — handled explicitly, since
      // ln(0) is an ERROR in ANSI engines, not −∞
      .withColumn("__step",
        when(col("n_event") < col("n_risk"),
          log(lit(1.0) - col("n_event").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("n_event") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(sum(col("__step")).over(wSurv)), 6)))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        col("survival"))
  }

  /** Nelson–Aalen cumulative-hazard estimator over the same
    * right-censored frame as [[kaplanMeier]]: H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ,
    * with the Poisson-count variance Σ dᵢ/nᵢ² and the Breslow/
    * Fleming–Harrington survival exp(−H). The hazard-scale companion of
    * the product-limit curve — additive, so increments over disjoint
    * time windows sum, which is what a per-epoch churn budget needs
    * (KM's product does not decompose that way).
    *
    * Exactness: each dᵢ/nᵢ is one exact-integer ratio divided once;
    * cumulation is an ORDERED window over the per-duration grid, so
    * both engines accumulate in the identical t order — no
    * partition-order sensitivity exists. Same enforced grid contract as
    * [[kaplanMeier]] (windows only above the per-duration aggregate).
    */
  def nelsonAalen(df: DataFrame, durationCol: String,
      eventCol: String, bucketWidth: Long = 1L,
      maxGridSize: Long = 10000L): DataFrame = {
    val tExpr =
      if (bucketWidth <= 1L) col(durationCol)
      else floor(col(durationCol).cast("long") / bucketWidth) * bucketWidth
    val approxGrid =
      df.agg(approx_count_distinct(tExpr).as("n")).head().getLong(0)
    require(approxGrid <= maxGridSize,
      s"nelsonAalen time grid too fine: ~$approxGrid distinct " +
        s"(bucketed) durations exceed maxGridSize=$maxGridSize; pass a " +
        "larger bucketWidth (life-table coarsening) or raise " +
        "maxGridSize deliberately.")
    val byT = df.groupBy(tExpr.as("t"))
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nD = col("n_risk").cast("double")
    byT
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censored")).over(wRisk))
      .withColumn("__h",
        sum(col("n_event").cast("double") / nD).over(wCum))
      .withColumn("__v",
        sum(col("n_event").cast("double") / (nD * nD)).over(wCum))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        round(col("__h"), 6).as("cum_hazard"),
        round(col("__v"), 6).as("hazard_var"),
        round(exp(-col("__h")), 6).as("breslow_survival"))
  }

  /** Weibull fit of a [[kaplanMeier]] curve by the probability-plot
    * regression: ln(−ln S(t)) is linear in ln t under Weibull, so OLS
    * on the KM points (0 < S < 1, t > 0) yields shape k (slope) and
    * scale λ = exp(−intercept/k) — the parametric summary of the
    * survival family (KM q122 / Nelson–Aalen q376 / log-rank q299 /
    * Cox q318): two numbers and a median instead of a curve, plus R²
    * as the "is it even Weibull" check (k < 1 → cooling hazard,
    * k > 1 → wear-out).
    *
    * Exactness: S is the KM round-6 value (identical in both engines),
    * the transform is fixed ln shapes, OLS moments accumulate as
    * round-12 decimals over the bounded duration grid.
    */
  def weibullFromKm(km: DataFrame): DataFrame = {
    def d12(c: org.apache.spark.sql.Column) =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val pts = km
      .filter(col("t") > 0L && col("survival") > 0.0 &&
        col("survival") < 1.0)
      .select(log(col("t").cast("double")).as("z"),
        log(-log(col("survival"))).as("y"))
    val s = pts.agg(count(lit(1)).as("n_points"),
      d12(col("z")).as("__sz"), d12(col("z") * col("z")).as("__szz"),
      d12(col("y")).as("__sy"), d12(col("y") * col("y")).as("__syy"),
      d12(col("z") * col("y")).as("__szy"))
    val nD = col("n_points").cast("double")
    val slope = (nD * col("__szy") - col("__sz") * col("__sy")) /
      (nD * col("__szz") - col("__sz") * col("__sz"))
    val intercept = (col("__sy") - slope * col("__sz")) / nD
    val r2num = (nD * col("__szy") - col("__sz") * col("__sy")) *
      (nD * col("__szy") - col("__sz") * col("__sy"))
    val r2den = (nD * col("__szz") - col("__sz") * col("__sz")) *
      (nD * col("__syy") - col("__sy") * col("__sy"))
    val scale = exp(-intercept / slope)
    s.filter(col("n_points") >= 3L).select(
      col("n_points"),
      round(slope, 6).as("shape_k"),
      round(scale, 6).as("scale_lambda"),
      when(r2den > 0.0, round(r2num / r2den, 6)).as("r2"),
      round(scale * exp(log(log(lit(2.0))) / slope), 6)
        .as("median_time"))
  }

  /** Competing-risks cumulative incidence (Aalen–Johansen, two causes):
    * CIF_k(t) = Σ_{s≤t} Ŝ(s⁻)·d_k(s)/n(s), with Ŝ the overall KM on
    * the combined event hazard. THE correct "probability a user
    * converts / errors-out by day t" when the two outcomes compete —
    * 1 − KM per cause overstates both (it treats the other cause as
    * censoring, crediting time the subject no longer had). `causeCol`:
    * 0 = censored, 1 / 2 = the competing causes.
    *
    * Exactness: d/n ratios are exact integer divisions; Ŝ(s⁻)
    * accumulates in log space over the ordered per-duration grid (the
    * q122 contract, shifted one row); CIF increments cumulate in the
    * same ordered window — both engines replay the identical order.
    * Same enforced grid contract as [[kaplanMeier]].
    */
  def competingRisks(df: DataFrame, durationCol: String,
      causeCol: String, maxGridSize: Long = 10000L): DataFrame = {
    val approxGrid =
      df.agg(approx_count_distinct(col(durationCol)).as("n"))
        .head().getLong(0)
    require(approxGrid <= maxGridSize,
      s"competingRisks time grid too fine: ~$approxGrid distinct " +
        s"durations exceed maxGridSize=$maxGridSize; coarsen first.")
    val byT = df.groupBy(col(durationCol).as("t"))
      .agg(
        sum(when(col(causeCol) === 1, 1L).otherwise(0L)).as("d1"),
        sum(when(col(causeCol) === 2, 1L).otherwise(0L)).as("d2"),
        sum(when(col(causeCol) === 0, 1L).otherwise(0L)).as("n_censored"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nD = col("n_risk").cast("double")
    val dTot = col("d1") + col("d2")
    byT
      .withColumn("n_risk",
        sum(dTot + col("n_censored")).over(wRisk))
      .withColumn("__step",
        when(dTot < col("n_risk"),
          log(lit(1.0) - dTot.cast("double") / nD)).otherwise(lit(0.0)))
      .withColumn("__sminus",
        exp(coalesce(sum(col("__step")).over(wPrev), lit(0.0))))
      .withColumn("survival",
        when(dTot === col("n_risk"), lit(0.0))
          .otherwise(round(exp(sum(col("__step")).over(wCum)), 6)))
      .withColumn("cif_cause1",
        round(sum(col("__sminus") * col("d1").cast("double") / nD)
          .over(wCum), 6))
      .withColumn("cif_cause2",
        round(sum(col("__sminus") * col("d2").cast("double") / nD)
          .over(wCum), 6))
      .select(col("t"), col("n_risk"), col("d1").as("d_cause1"),
        col("d2").as("d_cause2"), col("n_censored"), col("survival"),
        col("cif_cause1"), col("cif_cause2"))
  }

  /** Two-sample log-rank (Mantel–Cox) test: are the survival curves of
    * two cohorts the same? The hypothesis-test companion to
    * [[kaplanMeier]] — at every event time t the observed group-A deaths
    * d_A(t) are compared with the hypergeometric expectation
    * e_A(t) = d(t)·n_A(t)/n(t) given the pooled risk sets, and
    * χ² = (Σ(d_A − e_A))² / Σ Var_t with
    * Var_t = d·(n_A/n)·(n_B/n)·(n−d)/(n−1).
    *
    * `groupExpr` must evaluate to a boolean (true = cohort A). Same grid
    * contract as [[kaplanMeier]]: risk sets are reverse-cumulative sums
    * over the per-duration aggregate (enforced ≤ `maxGridSize`), never
    * over the data. Counts are exact BIGINTs; each event-time term is one
    * fixed-shape double expression summed as DECIMAL(28,12) — engine-
    * portable.
    */
  def logRankTest(df: DataFrame, durationCol: String, eventCol: String,
      groupExpr: org.apache.spark.sql.Column,
      maxGridSize: Long = 10000L): DataFrame = {
    val approxGrid =
      df.agg(approx_count_distinct(col(durationCol)).as("n"))
        .head().getLong(0)
    require(approxGrid <= maxGridSize,
      s"logRankTest time grid too fine: ~$approxGrid distinct durations " +
        s"exceed maxGridSize=$maxGridSize; coarsen the duration column " +
        "(life-table bucketing) or raise maxGridSize deliberately.")
    val byT = df
      .select(col(durationCol).as("t"), col(eventCol).as("__ev"),
        groupExpr.as("__is_a"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("__is_a") && col("__ev"), 1L).otherwise(0L)).as("da"),
        sum(when(!col("__is_a") && col("__ev"), 1L).otherwise(0L)).as("db"),
        sum(when(col("__is_a"), 1L).otherwise(0L)).as("ta"),
        sum(when(!col("__is_a"), 1L).otherwise(0L)).as("tb"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = byT
      .withColumn("na", sum(col("ta")).over(wRisk))
      .withColumn("nb", sum(col("tb")).over(wRisk))
      .filter(col("da") + col("db") > 0L)
    val dTot = (col("da") + col("db")).cast("double")
    val nTot = (col("na") + col("nb")).cast("double")
    val naD = col("na").cast("double")
    val nbD = col("nb").cast("double")
    val expA = dTot * naD / nTot
    val varT = when(col("na") + col("nb") > 1L,
      dTot * (naD / nTot) * (nbD / nTot) *
        ((nTot - dTot) / (nTot - lit(1.0)))).otherwise(lit(0.0))
    def dsum12(c: org.apache.spark.sql.Column) =
      graft.functions.Stats.dsum(c, 12)
    val agg = risk.agg(
      sum(col("da")).as("events_a"),
      sum(col("db")).as("events_b"),
      dsum12(col("da").cast("double") - expA).as("__oma"),
      dsum12(expA).as("__ea"),
      dsum12(varT).as("__v"))
    agg.select(
      col("events_a"), col("events_b"),
      round(col("__ea"), 6).as("expected_a"),
      round(col("__oma"), 6).as("obs_minus_exp_a"),
      round(col("__v"), 6).as("var_sum"),
      when(col("__v") > 0.0,
        round(col("__oma") * col("__oma") / col("__v"), 6))
        .as("chi2"))
  }

  /** Cox proportional-hazards fit for ONE binary covariate (Cox 1972,
    * Breslow tie handling), run as fixed-iteration Newton–Raphson on the
    * partial likelihood — the model-based sibling of [[logRankTest]]
    * (whose score test is exactly this model's first Newton step at
    * β = 0). With a binary covariate the risk-set statistics collapse to
    * the log-rank per-time frame (d₁, d₀, n₁, n₀ per distinct event
    * time): Σ_{i∈R} e^{βxᵢ} = n₀ + n₁·e^β, so each Newton step is ONE
    * aggregation over that tiny frame —
    *
    *   U(β) = Σ_t [d₁ − d·n₁e^β/(n₀+n₁e^β)]        (score)
    *   I(β) = Σ_t  d·n₀n₁e^β/(n₀+n₁e^β)²           (information)
    *   ℓ(β) = Σ_t [d₁β − d·ln(n₀+n₁e^β)]           (Breslow partial ll)
    *
    * Portable-fit contract (the q189/q316 family): per-time terms are
    * fixed-shape doubles, sums accumulate as DECIMAL(28,12), β rounds
    * to 9 decimals per iteration — the trajectory replays exactly as a
    * DuckDB recursive CTE. Trace row i: ℓ at the iteration's input β,
    * then the updated β and its hazard ratio e^β.
    *
    * Scale shape: one keyed aggregation to the duration grid (guarded
    * like [[logRankTest]]), a reverse-cumulative window over that grid
    * only, then `iters` single-row aggregations over the persisted
    * event-time frame.
    */
  def coxPhBinary(df: DataFrame, durationCol: String, eventCol: String,
      covariateExpr: org.apache.spark.sql.Column, iters: Int = 6,
      maxGridSize: Long = 10000L): DataFrame = {
    require(iters >= 1, s"need at least one Newton step, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    import graft.functions.Stats.dsum
    val approxGrid =
      df.agg(approx_count_distinct(col(durationCol)).as("n"))
        .head().getLong(0)
    require(approxGrid <= maxGridSize,
      s"coxPhBinary time grid too fine: ~$approxGrid distinct durations " +
        s"exceed maxGridSize=$maxGridSize; coarsen the duration column.")
    val byT = df
      .select(col(durationCol).as("t"), col(eventCol).as("__ev"),
        covariateExpr.as("__x1"))
      .groupBy(col("t"))
      .agg(
        sum(when(col("__x1") && col("__ev"), 1L).otherwise(0L)).as("d1"),
        sum(when(!col("__x1") && col("__ev"), 1L).otherwise(0L)).as("d0"),
        sum(when(col("__x1"), 1L).otherwise(0L)).as("t1"),
        sum(when(!col("__x1"), 1L).otherwise(0L)).as("t0"))
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = byT
      .withColumn("n1", sum(col("t1")).over(wRisk))
      .withColumn("n0", sum(col("t0")).over(wRisk))
      .filter(col("d1") + col("d0") > 0L)
      .select(col("t"), col("d1"), col("d0"), col("n1"), col("n0"))
      .persist()
    try {
      require(risk.limit(1).count() > 0, "no observed events to fit on")
      def r9(v: Double): Double =
        new java.math.BigDecimal(v)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      var beta = 0.0
      val trace = (1 to iters).map { i =>
        val eb = lit(math.exp(beta))
        val d = (col("d1") + col("d0")).cast("double")
        val n1d = col("n1").cast("double")
        val n0d = col("n0").cast("double")
        val den = n0d + n1d * eb
        val r = risk.agg(
          dsum(col("d1").cast("double") - d * n1d * eb / den, 12).as("u"),
          dsum(d * n0d * n1d * eb / (den * den), 12).as("inf"),
          dsum(col("d1").cast("double") * lit(beta) - d * log(den), 12)
            .as("ll")).head()
        val (u, inf, ll) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
        require(inf > 0.0,
          s"information is $inf at iteration $i (degenerate covariate?)")
        val llIn = new java.math.BigDecimal(ll)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        beta = r9(beta + u / inf)
        (i, beta, u, inf, llIn)
      }
      trace.toDF("iter", "__b", "__u", "__i", "log_lik")
        .select(col("iter"), round(col("__b"), 6).as("beta"),
          round(exp(col("__b")), 6).as("hazard_ratio"),
          round(col("__u"), 6).as("score_u"),
          round(col("__i"), 6).as("information"),
          col("log_lik"))
        .orderBy(col("iter"))
    } finally { risk.unpersist(); () }
  }
}
