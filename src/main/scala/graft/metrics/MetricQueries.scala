package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Stats._

/** Classification/regression metrics as DataFrame queries (reference
  * `/root/reference/src/training/metrics.py:44-154`) — each metric is one
  * aggregation pass, all-deterministic: counts are exact, error sums go
  * through exact decimal accumulation, and final ratios are single double
  * divisions.
  */
object MetricQueries {

  /** Confusion counts (reference X6, `metrics.py:116-154`). */
  def confusion(df: DataFrame, label: String, pred: String): DataFrame =
    df.groupBy(col(label), col(pred)).agg(count(lit(1)).as("n"))

  /** Binary-classifier summary card beyond precision/recall: Matthews
    * correlation (the balanced single-number score that survives class
    * imbalance — Matthews 1975), Fowlkes–Mallows √(PPV·TPR), Youden's J
    * (TPR + TNR − 1, the operating-point quality the ROC curve reads
    * off), and markedness (PPV + NPV − 1) — the column-wise dual of J.
    * Extends the reference's metric surface (`metrics.py:116-154` stops
    * at per-class precision/recall).
    *
    * Exactness: the 2×2 cells are exact BIGINT counts; every derived
    * number is a fixed-shape double expression over them (the MCC
    * denominator takes one IEEE sqrt of a product of exact-long-to-
    * double conversions — deterministic on any engine).
    *
    * Scale shape: ONE conditional aggregation over the scan; the card
    * assembles on a 1-row frame.
    */
  def binaryClassifierCard(df: DataFrame, label: String,
      pred: String): DataFrame = {
    val y = col(label)
    val p = col(pred)
    val cells = df
      .filter(y.isNotNull && p.isNotNull)
      .agg(
        sum(when(y === 1 && p === 1, 1L).otherwise(0L)).as("tp"),
        sum(when(y === 0 && p === 1, 1L).otherwise(0L)).as("fp"),
        sum(when(y === 1 && p === 0, 1L).otherwise(0L)).as("fn"),
        sum(when(y === 0 && p === 0, 1L).otherwise(0L)).as("tn"))
    def d(c: Column): Column = c.cast("double")
    val tp = d(col("tp")); val fp = d(col("fp"))
    val fn = d(col("fn")); val tn = d(col("tn"))
    val ppv = tp / (tp + fp)
    val tpr = tp / (tp + fn)
    val tnr = tn / (tn + fp)
    val npv = tn / (tn + fn)
    val mccDen = sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    cells.select(
      col("tp"), col("fp"), col("fn"), col("tn"),
      when(mccDen > 0.0,
        round((tp * tn - fp * fn) / mccDen, 6)).as("mcc"),
      when(tp + fp > 0.0 && tp + fn > 0.0,
        round(sqrt(ppv * tpr), 6)).as("fowlkes_mallows"),
      when(tp + fn > 0.0 && tn + fp > 0.0,
        round(tpr + tnr - lit(1.0), 6)).as("youden_j"),
      when(tp + fp > 0.0 && tn + fn > 0.0,
        round(ppv + npv - lit(1.0), 6)).as("markedness"))
  }

  /** Accuracy over (label, pred). */
  def accuracy(df: DataFrame, label: String, pred: String): Column =
    sum(when(col(label) === col(pred), 1).otherwise(0)) / count(lit(1))

  /** Probability-calibration bins (reliability-diagram data): scores bucket
    * into `bins` equal-width bins; per bin the count, exact-decimal mean
    * score, positive rate, and Brier contribution. One hash aggregation —
    * the post-training calibration check every classifier report needs,
    * extending the reference's metric surface (metrics.py stops at AUC).
    * `scoreScale` = decimal places of the score column (for exact sums).
    */
  def calibrationBins(df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int, scoreScale: Int = 3): DataFrame = {
    val s = col(scoreCol)
    val y = col(labelCol).cast("double")
    df.withColumn("bin", least(floor(s * bins).cast("long"), lit(bins - 1L)))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        (dsum(s, scoreScale) / count(lit(1))).as("avg_score"),
        (sum(col(labelCol)).cast("double") / count(lit(1))).as("pos_rate"),
        (dsum((s - y) * (s - y), 2 * scoreScale) / count(lit(1))).as("brier"))
      .orderBy(col("bin"))
  }

  /** One-number calibration card over the [[calibrationBins]] reliability
    * diagram: ECE (bin-weight-averaged |pos_rate − avg_score|), MCE (the
    * worst bin's gap), and the corpus Brier score — the summary a model
    * report quotes next to AUC, and the quantity a recalibration step
    * (q126's isotonic fit) is judged by. The bin frame is tiny (`bins`
    * rows), so the card aggregates decimal-exact sums over it — fully
    * engine-portable, no accumulation-order noise.
    */
  def calibrationErrorCard(df: DataFrame, scoreCol: String,
      labelCol: String, bins: Int, scoreScale: Int = 3): DataFrame = {
    val b = calibrationBins(df, scoreCol, labelCol, bins, scoreScale)
    val gap = abs(col("pos_rate") - col("avg_score"))
    b.agg(
      sum(col("n")).as("n"),
      round(dsum(gap * col("n"), 12) / sum(col("n")), 6).as("ece"),
      round(max(gap), 6).as("mce"),
      round(dsum(col("brier") * col("n"), 12) / sum(col("n")), 6)
        .as("brier"))
  }

  /** Balanced accuracy = mean per-class recall (reference X2,
    * `metrics.py:45`): inner per-class aggregation, then a tiny mean.
    */
  def balancedAccuracy(df: DataFrame, label: String, pred: String): DataFrame = {
    val perClass = df.groupBy(col(label)).agg(
      (sum(when(col(pred) === col(label), 1).otherwise(0)) / count(lit(1)))
        .as("recall"))
    perClass.agg(round(avg(col("recall")), 6).as("balanced_accuracy"),
      count(lit(1)).as("n_classes"))
  }

  /** Regression metrics in one pass (reference X5/X7, `metrics.py:92-111`):
    * MAE, MSE, RMSE, R², NRMSE (rmse / label range) and null-guarded MAPE,
    * all from exact decimal error sums so results are bit-identical across
    * engines and partitionings. R² uses the algebraic identity
    * ss_tot = Σy² − (Σy)²/n to stay single-pass.
    */
  def regressionMetrics(df: DataFrame, y: String, p: String): DataFrame = {
    val err = col(y) - col(p)
    // The squared-error decimal sums overflow double's exact 2^53 range, so
    // their final decimal→double cast carries one engine-dependent ulp;
    // rounding mse to integers (and r2 to 6) makes that noise unobservable,
    // while mae's smaller sum stays bit-exact.
    df.agg(
      count(lit(1)).as("n"),
      round(dsum(abs(err), 4) / count(lit(1)), 6).as("mae"),
      round(dsum(err * err, 4) / count(lit(1)), 0).as("mse"),
      dsum(err * err, 4).as("ss_res"),
      dsum(col(y), 2).as("sum_y"),
      dsum(col(y) * col(y), 4).as("sum_y2"),
      round(max(col(y)) - min(col(y)), 6).as("y_range"),
      // MAPE guard: rows with y = 0 are excluded (reference metrics.py:107)
      round(dsum(when(col(y) =!= 0, abs(err / col(y))), 6) /
        count(when(col(y) =!= 0, lit(1))), 6).as("mape"))
      .select(
        col("n"),
        col("mae"),
        col("mse"),
        // rmse/nrmse derive from the UNROUNDED ss_res/n — the integer
        // rounding on the reported mse is an output quantization only
        // (rounding first would zero rmse whenever mse < 0.5)
        round(sqrt(col("ss_res") / col("n")), 6).as("rmse"),
        round(lit(1.0) - col("ss_res") /
          (col("sum_y2") - col("sum_y") * col("sum_y") / col("n")), 6).as("r2"),
        round(sqrt(col("ss_res") / col("n")) / col("y_range"), 6).as("nrmse"),
        col("mape"))
  }

  /** Inverse-frequency class weights — weight = total / (n_classes · count)
    * (reference M11/A11, `/root/reference/src/training/trainer.py:352-366`).
    * Unrounded (label, n, weight) rows; the single source of the weight
    * definition for both the metric query and estimator weightCol feeds.
    */
  def inverseFrequencyWeights(df: DataFrame, label: String): DataFrame = {
    val counts = df.groupBy(col(label)).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    counts
      .withColumn("total", sum(col("n")).over(w))
      .withColumn("n_classes", count(lit(1)).over(w))
      .withColumn("weight", col("total") / (col("n_classes") * col("n")))
      .select(label, "n", "weight")
  }

  /** Rounded presentation of [[inverseFrequencyWeights]]. */
  def classWeights(df: DataFrame, label: String): DataFrame =
    inverseFrequencyWeights(df, label)
      .withColumn("weight", round(col("weight"), 6))

  /** Cohen's kappa: chance-corrected agreement between two categorical
    * raters, κ = (p_o − p_e)/(1 − p_e) with p_e from the rater marginals.
    * The inter-annotator-agreement metric a labeling pipeline reports before
    * trusting its labels (the reference takes its phenotype labels on faith,
    * `/root/reference/src/data/dataset.py:300-341`; at corpus scale one
    * audits first). One count aggregation over the (r1, r2) grid; every
    * probability is an exact-integer ratio divided once at the end.
    */
  def cohenKappa(df: DataFrame, rater1: String, rater2: String): DataFrame = {
    val cells = df.groupBy(col(rater1).as("r1"), col(rater2).as("r2"))
      .agg(count(lit(1)).as("o"))
    val m1 = cells.groupBy(col("r1")).agg(sum(col("o")).as("n1"))
    val m2 = cells.groupBy(col("r2")).agg(sum(col("o")).as("n2"))
    // expected-agreement numerator: Σ_k n1_k·n2_k over the shared label
    // set; coalesce — DISJOINT label spaces make the join empty and the
    // sum NULL, but pe is genuinely 0 there, not undefined
    val pe = m1.join(m2, col("r1") === col("r2"))
      .agg(coalesce(sum(col("n1") * col("n2")), lit(0L)).as("__pe_num"))
    val agg = cells.agg(
      sum(col("o")).as("__n"),
      sum(when(col("r1") === col("r2"), col("o")).otherwise(0L))
        .as("__agree"))
    // p_e = 1 (both raters emit one identical label) makes kappa 0/0 —
    // return null like every other hardened closed-form fit, never throw
    val pO = col("__agree").cast("double") / col("__n")
    val pE = col("__pe_num").cast("double") / (col("__n") * col("__n"))
    agg.crossJoin(broadcast(pe))
      .select(
        col("__n").as("n"),
        col("__agree").as("n_agree"),
        round(pO, 6).as("p_o"),
        round(pE, 6).as("p_e"),
        round(when(pE =!= 1.0, (pO - pE) / (lit(1.0) - pE)), 6).as("kappa"))
  }

  /** Two-proportion pooled z-test — the A/B-experiment readout. `df` is one
    * row per subject with a two-valued `variantCol` and a boolean
    * `successCol`; the output is one row of per-variant counts/rates and
    * z = (p_b − p_a) / √(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ pooled.
    * One count aggregation; every rate is an exact-integer ratio divided
    * once, √ is IEEE-deterministic, so the statistic is engine-portable.
    */
  def twoProportionZTest(df: DataFrame, variantCol: String,
      successCol: String, variantA: String, variantB: String): DataFrame = {
    val agg = df.filter(col(variantCol).isin(variantA, variantB))
      .agg(
        sum(when(col(variantCol) === variantA, 1L).otherwise(0L)).as("n_a"),
        sum(when(col(variantCol) === variantA && col(successCol), 1L)
          .otherwise(0L)).as("x_a"),
        sum(when(col(variantCol) === variantB, 1L).otherwise(0L)).as("n_b"),
        sum(when(col(variantCol) === variantB && col(successCol), 1L)
          .otherwise(0L)).as("x_b"))
    val pa = col("x_a").cast("double") / col("n_a")
    val pb = col("x_b").cast("double") / col("n_b")
    val pooled = (col("x_a") + col("x_b")).cast("double") /
      (col("n_a") + col("n_b"))
    agg.select(
      col("n_a"), col("x_a"), col("n_b"), col("x_b"),
      round(pa, 6).as("p_a"),
      round(pb, 6).as("p_b"),
      round((pb - pa) /
        sqrt(pooled * (lit(1.0) - pooled) *
          (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))), 6).as("z"))
  }

  /** CUPED variance-reduced A/B readout — the experimentation-platform
    * upgrade over the plain z-test ([[abZTest]]): each unit's pre-period
    * covariate x absorbs its idiosyncratic level, the pooled
    * θ = cov(x,y)/var(x) adjusts y to y − θ(x − x̄), and the variance
    * shrinks by exactly ρ² (reported as `var_reduction`). Expects one
    * row per unit with doubles `xCol` (pre-period metric) and `yCol`
    * (experiment metric) and a variant column; emits one row per
    * variant with raw and adjusted means plus the pooled diagnostics.
    *
    * Determinism: per-unit x/y are rounded to 6 before accumulation and
    * every cross-moment accumulates as exact decimals (order-free); θ,
    * means and ρ² are closed-form ratios of those sums — one pass, no
    * per-unit adjusted frame. Zero pre-period variance → null θ and
    * adjusted columns (never a divide-by-zero).
    */
  def cupedAb(df: DataFrame, variantCol: String, xCol: String,
      yCol: String): DataFrame = {
    val x = round(col(xCol), 6)
    val y = round(col(yCol), 6)
    def d(c: Column) = c.cast("decimal(28,12)")
    val perVariant = df
      .filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(variantCol))
      .agg(
        count(lit(1)).as("n"),
        sum(d(x)).as("__sx"), sum(d(y)).as("__sy"),
        sum(d(round(x * x, 6))).as("__sxx"),
        sum(d(round(x * y, 6))).as("__sxy"),
        sum(d(round(y * y, 6))).as("__syy"))
    val pooled = perVariant.agg(
      sum(col("n")).as("__np"),
      sum(col("__sx")).as("__sxp"), sum(col("__sy")).as("__syp"),
      sum(col("__sxx")).as("__sxxp"), sum(col("__sxy")).as("__sxyp"),
      sum(col("__syy")).as("__syyp"))
    val np = col("__np").cast("double")
    val varX = np * col("__sxxp").cast("double") -
      col("__sxp").cast("double") * col("__sxp").cast("double")
    val varY = np * col("__syyp").cast("double") -
      col("__syp").cast("double") * col("__syp").cast("double")
    val covXY = np * col("__sxyp").cast("double") -
      col("__sxp").cast("double") * col("__syp").cast("double")
    val theta = covXY / varX
    val meanXp = col("__sxp").cast("double") / np
    perVariant.crossJoin(broadcast(pooled))
      .withColumn("mean_y",
        round(col("__sy").cast("double") / col("n").cast("double"), 6))
      .withColumn("theta", when(varX > 0.0, round(theta, 6)))
      .withColumn("mean_y_adj",
        when(varX > 0.0, round(
          col("__sy").cast("double") / col("n").cast("double") -
            theta * (col("__sx").cast("double") / col("n").cast("double") -
              meanXp), 6)))
      .withColumn("var_reduction",
        when(varX > 0.0 && varY > 0.0,
          round(covXY * covXY / (varX * varY), 6)))
      .select(col(variantCol), col("n"), col("mean_y"), col("mean_y_adj"),
        col("theta"), col("var_reduction"))
  }

  /** Fisher RE-RANDOMIZATION test (the permutation test's Bernoulli
    * variant): the observed |Δmean| between two groups is compared
    * against `b` pseudo-random relabelings of the rows, each drawn by the
    * engine-portable congruential hash with a distinct salt — no RNG
    * state, reproducible across engines and partitionings. p-value with
    * the standard add-one correction (n_ge + 1)/(b + 1). Unlike the
    * classic z-test (q121) this makes NO normality assumption.
    *
    * Scale shape: all `b` relabelings are ONE pass — the row explodes
    * into its `b` (perm, group') assignments, and map-side partial
    * aggregation collapses the blow-up to 2·b rows per partition before
    * the shuffle. Means are exact-decimal; every Δ rounds to 9 before
    * the ≥ comparison so 1-ulp drift cannot flip a count.
    */
  def rerandomizationTest(df: DataFrame, keyCol: String, groupExpr: Column,
      valueCol: String, b: Int = 64, scale: Int = 4): DataFrame = {
    require(b >= 1, s"need b >= 1 permutations, got $b")
    val d = df.select(col(keyCol).cast("long").as("__k"),
      groupExpr.cast("long").as("__g"),
      col(valueCol).cast("double").as("__v"))
    def r9(c: Column): Column = round(c, 9)
    val obs = d.agg(
        count(lit(1)).as("n"),
        sum(when(col("__g") === 1L, 1L).otherwise(0L)).as("__na"),
        dsum(when(col("__g") === 1L, col("__v")).otherwise(lit(0.0)), scale)
          .as("__sa"),
        dsum(col("__v"), scale).as("__s"))
      .withColumn("mean_a", r9(col("__sa") / col("__na").cast("double")))
      .withColumn("mean_b", r9((col("__s") - col("__sa")) /
        (col("n") - col("__na")).cast("double")))
      .withColumn("delta_obs", r9(abs(col("mean_a") - col("mean_b"))))
    // relabeling draw: the TWO-ROUND congruential hash (prioritySample's
    // family), NOT hashBucket(·, 2) — a single multiplicative round mod 2
    // reduces to key parity over any small key range (every "relabeling"
    // would be the same split); the intermediate odd-prime reductions are
    // what mix the low bit
    val p1 = 1000003L; val p2 = 9999991L
    val s = col("__k") + col("__p") * lit(104729L)
    val x1 = pmod(pmod(s, lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + (s.cast("decimal(38,0)") / lit(p1))
      .cast("long"), lit(p2)) * lit(22695477L), lit(p2))
    val perms = d
      .select(col("__k"), col("__v"),
        explode(sequence(lit(1), lit(b))).as("__p"))
      .withColumn("__gp", pmod(x2, lit(2L)))
      .groupBy(col("__p"))
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__gp") === 1L, 1L).otherwise(0L)).as("__na"),
        dsum(when(col("__gp") === 1L, col("__v")).otherwise(lit(0.0)), scale)
          .as("__sa"),
        dsum(col("__v"), scale).as("__s"))
      // a degenerate relabeling (all rows one side) carries no Δ — count
      // it as extreme (≥ anything), the conservative reading
      .withColumn("__delta",
        when(col("__na") > 0L && col("__na") < col("__n"),
          r9(abs(r9(col("__sa") / col("__na").cast("double")) -
            r9((col("__s") - col("__sa")) /
              (col("__n") - col("__na")).cast("double"))))))
    val exceed = perms.crossJoin(broadcast(obs.select(col("delta_obs"))))
      .agg(count(lit(1)).as("n_perms"),
        sum(when(col("__delta").isNull ||
          col("__delta") >= col("delta_obs"), 1L).otherwise(0L))
          .as("n_ge"))
    obs.crossJoin(broadcast(exceed))
      .withColumn("p_value",
        round((col("n_ge").cast("double") + lit(1.0)) /
          (col("n_perms").cast("double") + lit(1.0)), 6))
      .select(col("n"), col("mean_a"), col("mean_b"), col("delta_obs"),
        col("n_perms"), col("n_ge"), col("p_value"))
  }

  /** Weight-of-evidence / information-value binning — the classic
    * univariate predictive-power screen (credit-scoring lineage; the
    * question a feature-selection pass asks before committing a column to
    * a model): per bin, WOE = ln(distr_pos/distr_neg) with a 0.5 Laplace
    * adjustment per cell (distr_x = (n_x + 0.5)/(total_x + 0.5·n_bins) —
    * a zero cell shrinks instead of exploding to ±∞), and
    * IV = Σ (distr_pos − distr_neg)·WOE with the sum accumulated in
    * exact decimal (bin order cannot move the total).
    *
    * One count aggregation over (bin, target), a broadcast totals row,
    * and a |bins|-row result carrying the repeated iv_total — no second
    * data scan. `binExpr` must be deterministic; `targetExpr` must be
    * 0/1.
    */
  def woeIv(df: DataFrame, binExpr: Column, targetExpr: Column): DataFrame = {
    val cells = df.select(binExpr.as("bin"),
        targetExpr.cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).as("n_pos"))
      .withColumn("n_neg", col("n") - col("n_pos"))
    val totals = cells.agg(
      sum(col("n_pos")).as("__tp"),
      sum(col("n_neg")).as("__tn"),
      count(lit(1)).as("__nb"))
    val scored = cells.crossJoin(broadcast(totals))
      .withColumn("__dp",
        (col("n_pos").cast("double") + lit(0.5)) /
          (col("__tp").cast("double") + lit(0.5) * col("__nb").cast("double")))
      .withColumn("__dn",
        (col("n_neg").cast("double") + lit(0.5)) /
          (col("__tn").cast("double") + lit(0.5) * col("__nb").cast("double")))
      .withColumn("__woe", log(col("__dp") / col("__dn")))
    val iv = scored
      .agg(sum(((col("__dp") - col("__dn")) * col("__woe"))
        .cast("decimal(28,12)")).cast("double").as("__iv"))
    scored.crossJoin(broadcast(iv))
      .select(col("bin"), col("n"), col("n_pos"), col("n_neg"),
        round(col("__woe"), 6).as("woe"),
        round((col("__dp") - col("__dn")) * col("__woe"), 6).as("iv_contrib"),
        round(col("__iv"), 6).as("iv_total"))
      .orderBy(col("bin"))
  }

  /** Wilson score interval (Wilson 1927) per group for a binary rate —
    * the small-n-honest confidence band a Wald interval gets wrong
    * (Wald collapses to width 0 at p̂ ∈ {0,1}; Wilson never leaves
    * (0,1)). With z the normal quantile:
    *
    *   center = (p̂ + z²/2n)/(1 + z²/n)
    *   half   = z·√(p̂(1−p̂)/n + z²/4n²)/(1 + z²/n)
    *
    * Exactness: n and k are exact counts; p̂ and the interval assembly
    * are the only doubles, in one fixed parenthesization with z as a
    * shared literal.
    *
    * Scale shape: one (group) count aggregation over the scan; the
    * interval is a stateless projection on the |groups|-row frame.
    */
  def wilsonRateCard(df: DataFrame, groupCol: String,
      successExpr: Column, z: Double = 1.959964): DataFrame = {
    val g = df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(when(successExpr, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val zz = lit(z) * lit(z)
    val denom = lit(1.0) + zz / nD
    val center = (p + zz / (lit(2.0) * nD)) / denom
    val half = lit(z) * sqrt(p * (lit(1.0) - p) / nD +
      zz / (lit(4.0) * nD * nD)) / denom
    g.select(col(groupCol), col("n"), col("k"),
        round(p, 6).as("p_hat"),
        round(center - half, 6).as("ci_lo"),
        round(center + half, 6).as("ci_hi"),
        round(lit(2.0) * half, 6).as("ci_width"))
      .orderBy(col(groupCol))
  }

  /** Fairness audit card over a protected-group column: per group the
    * selection rate (demographic parity), TPR (equal opportunity), FPR
    * (equalized odds' second arm), and precision (predictive parity),
    * each with its gap against the pooled rate — the bias readout a
    * model gate reads before a training set or a classifier ships.
    *
    * One (group × label × pred) count aggregation over the scan;
    * everything else is fixed-shape ratios of exact BIGINTs on the
    * |groups|-row frame (pooled rates joined by broadcast). Rates are
    * null (never 0/0) when a group lacks the conditioning class.
    */
  def fairnessCard(df: DataFrame, groupCol: String, labelExpr: Column,
      predExpr: Column): DataFrame =
    fairnessFromCells(fairnessCells(df, groupCol, labelExpr, predExpr),
      groupCol)

  /** The fairness card's sufficient statistics: one confusion-count row
    * per group — pure ADDITIVE state (counts sum across micro-batches),
    * which is what makes the streaming twin share the batch oracle.
    */
  def fairnessCells(df: DataFrame, groupCol: String, labelExpr: Column,
      predExpr: Column): DataFrame =
    df.groupBy(col(groupCol).as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(labelExpr && predExpr, 1L).otherwise(0L)).as("tp"),
        sum(when(!labelExpr && predExpr, 1L).otherwise(0L)).as("fp"),
        sum(when(labelExpr && !predExpr, 1L).otherwise(0L)).as("fn"),
        sum(when(!labelExpr && !predExpr, 1L).otherwise(0L)).as("tn"))

  /** Assembly of the per-group rates/gaps from a [[fairnessCells]]
    * frame — fixed-shape ratios of exact BIGINTs, shared verbatim by the
    * batch card and the streaming twin.
    */
  def fairnessFromCells(cells: DataFrame, groupCol: String): DataFrame = {
    val pooled = cells.agg(
      sum(col("n")).as("__N"),
      sum(col("tp")).as("__TP"), sum(col("fp")).as("__FP"),
      sum(col("fn")).as("__FN"), sum(col("tn")).as("__TN"))
    def rate(num: Column, den: Column): Column =
      when(den > 0L, num.cast("double") / den.cast("double"))
    val j = cells.crossJoin(broadcast(pooled))
    val selRate = rate(col("tp") + col("fp"), col("n"))
    val tpr = rate(col("tp"), col("tp") + col("fn"))
    val fpr = rate(col("fp"), col("fp") + col("tn"))
    val prec = rate(col("tp"), col("tp") + col("fp"))
    val selAll = rate(col("__TP") + col("__FP"), col("__N"))
    val tprAll = rate(col("__TP"), col("__TP") + col("__FN"))
    val fprAll = rate(col("__FP"), col("__FP") + col("__TN"))
    j.select(
        col("grp").as(groupCol), col("n"),
        round(selRate, 6).as("selection_rate"),
        round(selRate - selAll, 6).as("dp_gap"),
        round(tpr, 6).as("tpr"),
        round(tpr - tprAll, 6).as("eo_gap"),
        round(fpr, 6).as("fpr"),
        round(fpr - fprAll, 6).as("fpr_gap"),
        round(prec, 6).as("predictive_parity"))
      .orderBy(col(groupCol))
  }

  /** Murphy decomposition of the Brier score over `nBins` equal-width
    * probability bins: Brier = reliability − resolution + uncertainty
    * + within-bin p-variance − 2·within-bin p,y-covariance (the exact
    * identity for non-constant bins; the within terms vanish when each
    * bin's forecasts are constant). The diagnosis behind q197's ECE:
    * reliability is miscalibration, resolution is the discrimination the
    * forecaster actually earns, uncertainty is the irreducible ȳ(1−ȳ).
    *
    * Scale shape: one hash aggregation to per-bin exact moments (p and
    * p·y sums as DECIMAL(28,12), counts BIGINT); all assembly runs on
    * the ≤ nBins-row frame with fixed-shape doubles — engine-portable.
    * `probCol` must lie in [0,1]; the top edge folds into the last bin.
    */
  def brierDecomposition(df: DataFrame, probCol: String, labelCol: String,
      nBins: Int = 20): DataFrame = {
    val p = col(probCol).cast("double")
    val y = col(labelCol).cast("long")
    val binned = df.select(
      least(lit(nBins - 1), floor(p * nBins).cast("int")).as("bin"),
      p.as("__p"), y.as("__y"))
    val perBin = binned.groupBy(col("bin")).agg(
      count(lit(1)).as("n_k"),
      sum(col("__y")).as("sy_k"),
      dsum(col("__p"), 12).as("sp_k"),
      dsum(col("__p") * col("__p"), 12).as("spp_k"),
      dsum(col("__p") * col("__y").cast("double"), 12).as("spy_k"))
    val glob = perBin.agg(
      sum(col("n_k")).as("__n"), sum(col("sy_k")).as("__sy"),
      sum(col("spp_k").cast("decimal(28,12)")).cast("double").as("__spp"),
      sum(col("spy_k").cast("decimal(28,12)")).cast("double").as("__spy"))
    val j = perBin.crossJoin(broadcast(glob))
    val nD = col("__n").cast("double")
    val nkD = col("n_k").cast("double")
    val ybar = col("__sy").cast("double") / nD
    val pbarK = col("sp_k") / nkD
    val ybarK = col("sy_k").cast("double") / nkD
    val w = nkD / nD
    val rel = w * ((pbarK - ybarK) * (pbarK - ybarK))
    val res = w * ((ybarK - ybar) * (ybarK - ybar))
    val wvar = w * (col("spp_k") / nkD - pbarK * pbarK)
    val wcov = w * (col("spy_k") / nkD - pbarK * ybarK)
    val agg = j.groupBy(col("__n"), col("__sy"), col("__spp"), col("__spy"))
      .agg(
        count(lit(1)).as("n_bins"),
        dsum(rel, 12).as("__rel"),
        dsum(res, 12).as("__res"),
        dsum(wvar, 12).as("__wvar"),
        dsum(wcov, 12).as("__wcov"))
    val brier =
      (col("__spp") - lit(2.0) * col("__spy") + col("__sy").cast("double")) /
        col("__n").cast("double")
    val ybarG = col("__sy").cast("double") / col("__n").cast("double")
    agg.select(
      col("__n").as("n"),
      col("n_bins"),
      round(brier, 6).as("brier"),
      round(col("__rel"), 6).as("reliability"),
      round(col("__res"), 6).as("resolution"),
      round(ybarG * (lit(1.0) - ybarG), 6).as("uncertainty"),
      round(col("__wvar"), 6).as("within_var"),
      round(col("__wcov"), 6).as("within_cov"))
  }
}
