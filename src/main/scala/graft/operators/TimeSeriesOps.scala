package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Stats._

/** Time-ordered analytics: the reference's per-window statistical feature
  * extraction, multi-scale trends, temporal deltas and subsampling
  * (`/root/reference/src/data/preprocessing.py:101-273,345-358`,
  * `/root/reference/src/data/dataset.py:233-298`), each as one or two
  * shuffle-bounded Spark passes instead of per-group Python loops.
  *
  * Every window below partitions by the series key — on a cluster that means
  * state for one key never crosses executors, and the number of shuffles is
  * fixed (≤ 2) regardless of group count.
  */
object TimeSeriesOps {

  /** First- and second-order delta statistics (reference A3: `np.diff` then
    * mean/std — `/root/reference/src/data/preprocessing.py:122-131`).
    * One window pass computes lag-1 deltas and deltas-of-deltas; one
    * aggregation computes their stats. `tiebreak` makes ordering total, so
    * results are deterministic under any partitioning.
    */
  def deltaStats(df: DataFrame, key: String, ts: String, tiebreak: String,
      value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val d1 = df.withColumn("d1", col(value) - lag(col(value), 1).over(w))
    val d2 = d1.withColumn("d2", col("d1") - lag(col("d1"), 1).over(w))
    d2.groupBy(col(key)).agg(
      count(col(value)).as("n_obs"),
      count(col("d1")).as("n_deltas"),
      (dsum(col("d1"), 6) / count(col("d1"))).as("delta_mean"),
      stdPopRounded(col("d1")).as("delta_std"),
      (dsum(col("d2"), 6) / count(col("d2"))).as("delta2_mean"),
      stdPopRounded(col("d2")).as("delta2_std"))
  }

  /** Temporal gap detection (the complement of resample+forward-fill):
    * per-key consecutive-timestamp deltas exceeding `thresholdUs` — the
    * sensor-outage / dead-tenant report a monitoring pass runs before
    * trusting windowed features. One window pass (same ordered-lag shape
    * as [[deltaStats]]), integer microsecond arithmetic throughout, keys
    * with no gaps filtered out.
    */
  def gapStats(df: DataFrame, key: String, ts: String, tiebreak: String,
      thresholdUs: Long): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    df.withColumn("__gap",
        unix_micros(col(ts)) - lag(unix_micros(col(ts)), 1).over(w))
      .groupBy(col(key))
      .agg(
        count(lit(1)).as("n_obs"),
        sum(when(col("__gap") > thresholdUs, 1L).otherwise(0L)).as("n_gaps"),
        max(col("__gap")).as("max_gap_us"))
      .filter(col("n_gaps") > 0)
  }

  /** Two-level trend aggregation (reference A5: per-week means, then
    * dispersion across the weekly means —
    * `/root/reference/src/data/preprocessing.py:229-261`). Two hash
    * aggregations; the second input is already tiny.
    */
  def periodTrend(df: DataFrame, key: String, ts: String, value: String,
      truncUnit: String): DataFrame = {
    val per = df
      .groupBy(col(key), date_trunc(truncUnit, col(ts)).as("bucket"))
      .agg((dsum(col(value), 4) / count(lit(1))).as("bucket_mean"))
    per.groupBy(col(key)).agg(
      count(lit(1)).as("n_buckets"),
      stdRounded(col("bucket_mean")).as("trend_std"),
      round(max(col("bucket_mean")) - min(col("bucket_mean")), 6).as("trend_range"))
  }

  /** Diurnal profile (reference A7: hourly means then daily range —
    * `/root/reference/src/data/preprocessing.py:352-358`). The reference
    * recomputes the hour column per feature (22× redundant); here all
    * features of a key flow through one pair of aggregations.
    */
  def diurnalRange(df: DataFrame, key: String, ts: String, value: String): DataFrame = {
    val hourly = df
      .groupBy(col(key), hour(col(ts)).as("hr"))
      .agg((dsum(col(value), 4) / count(lit(1))).as("hour_mean"))
    hourly.groupBy(col(key)).agg(
      count(lit(1)).as("n_hours"),
      round(max(col("hour_mean")) - min(col("hour_mean")), 6).as("daily_range"))
  }

  /** Early-vs-late split trend (reference A6: halve each series at the median
    * index, compare half means — `/root/reference/src/data/preprocessing.py:232,263-273`).
    * The reference splits at `mid = len//2` with `early = [:mid]`,
    * `late = [mid:]` — for odd lengths the LATE half gets the extra
    * element (ntile(2) would give it to the early half), so the half is
    * assigned explicitly from row_number vs the partition count.
    */
  def halvesTrend(df: DataFrame, key: String, ts: String, tiebreak: String,
      value: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val wAll = Window.partitionBy(col(key))
    val withHalf = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("half",
        when(col("__rn") <= expr("__n div 2"), 1).otherwise(2))
    withHalf.groupBy(col(key)).agg(
      (dsum(when(col("half") === 1, col(value)), 4) /
        count(when(col("half") === 1, lit(1)))).as("early_mean"),
      (dsum(when(col("half") === 2, col(value)), 4) /
        count(when(col("half") === 2, lit(1)))).as("late_mean"))
      .withColumn("trend_change", col("late_mean") - col("early_mean"))
  }

  /** Stride subsampling (reference W3: every 12th reading → hourly cadence —
    * `/root/reference/src/data/dataset.py:237-238`). Keeps rows where
    * row_number ≡ 1 (mod stride) within each key's total order.
    */
  def strideSample(df: DataFrame, key: String, ts: String, tiebreak: String,
      stride: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    df.withColumn("rn", row_number().over(w))
      .filter((col("rn") - 1) % stride === 0)
  }

  /** Last-N truncation (reference W4: keep the most recent `maxLen` rows per
    * key — `/root/reference/src/data/dataset.py:289-291`).
    */
  def lastN(df: DataFrame, key: String, ts: String, tiebreak: String,
      maxLen: Int): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).desc, col(tiebreak).desc)
    df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxLen)
      .drop("rn")
  }

  /** Sequence assembly (reference W1–W4 + pad/truncate,
    * `/root/reference/src/data/dataset.py:233-298`): per key, the
    * time-ordered id sequence truncated to the most recent `maxLen`
    * elements and left-zero-padded to exactly `maxLen`. One hash
    * aggregation; sorting happens on the collected per-key array (bounded by
    * maxLen after slice), never as a global sort. Emitted as a joined
    * string so the contract is engine-portable (array formatting is not).
    */
  def sequenceAssembly(df: DataFrame, key: String, ts: String,
      idCol: String, maxLen: Int): DataFrame = {
    val collected = df
      .groupBy(col(key))
      .agg(sort_array(collect_list(struct(col(ts), col(idCol)))).as("s"))
      .withColumn("ids", transform(col("s"), x => x.getField(idCol)))
    val truncated = collected.withColumn("last_n",
      when(size(col("ids")) >= maxLen, slice(col("ids"), -maxLen, maxLen))
        .otherwise(col("ids")))
    truncated
      .withColumn("padded",
        concat(array_repeat(lit(0L), lit(maxLen) - size(col("last_n"))),
          col("last_n")))
      .select(col(key), col("padded"),
        concat_ws(",", col("padded")).as("seq_str"),
        size(col("last_n")).cast("long").as("seq_len"))
  }

  /** First-order Markov transition matrix over per-key event sequences: for
    * every ordered consecutive pair of states within a key, the transition
    * count and the row-stochastic probability P(next | prev). The behavioral
    * summary a sequence model (the reference's LSTM input,
    * `/root/reference/src/data/dataset.py:233-298`) starts from.
    *
    * One keyed ordered window for the lag (tiebroken to a total order, so
    * the pairing is deterministic), one (prev, next) count aggregation, and
    * a broadcast join of the tiny per-prev marginal. Probabilities are
    * exact-integer ratios divided once — partition-order-free.
    */
  def markovTransitions(df: DataFrame, key: String, ts: String,
      tiebreak: String, state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val pairs = df
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("prev_state"), col(state).as("next_state"))
      .agg(count(lit(1)).as("n"))
    val marginal = pairs.groupBy(col("prev_state"))
      .agg(sum(col("n")).as("__tot"))
    pairs.join(broadcast(marginal), "prev_state")
      .withColumn("p", round(col("n").cast("double") / col("__tot"), 6))
      .select(col("prev_state"), col("next_state"), col("n"), col("p"))
  }

  /** Poisson log-linear trend fit on the daily event-count series:
    * x_t ~ Poisson(exp(a + b·i)) by IRLS in the portable-fit contract
    * (q189/q316/q318 family) — fixed Newton/Fisher steps, per-row
    * working-response terms rounded to 12 into exact decimal sums,
    * round-9 parameters per step, the full iteration trace as the
    * result. THE correct trend model for counts (the q332 OLS line can
    * go negative and assumes constant variance; Poisson's variance
    * grows with the mean) — b exponentiates to a daily rate ratio.
    * Deviance 2Σ[x ln(x/μ) − (x − μ)] (x=0 → 2μ) tracks convergence.
    *
    * Scale shape: one count aggregation; per iteration ONE 5-sum
    * reduction over the bounded spine; driver holds two scalars.
    */
  /** RANSAC line fit on the daily count spine (Fischler & Bolles 1981):
    * `nCandidates` two-point models from SEEDED engine-portable draws
    * (the two-round congruential generator — q135/q179 family, no RNG
    * state), each scored by its inlier count at a threshold of half the
    * rounded sample std; the consensus winner is refit by OLS on its
    * inliers only. The "fit the trend the outliers can't touch" member
    * of the robust family: q273's Theil–Sen resists outliers by rank,
    * Huber (q303) by loss shape — RANSAC by consensus, and it reports
    * WHICH days were outvoted (inlier_frac).
    *
    * Portability: draws, indices and inlier counts are exact integers;
    * candidate params round to 9 before the threshold comparison (both
    * engines compare identical doubles against the identically-rounded
    * threshold); refit moments are exact integer sums. Determinism is
    * total — same data, same card, any engine, any partitioning.
    *
    * Scale shape: candidates × spine is a broadcast of `nCandidates`
    * params against the bounded day spine (one conditional-sum
    * aggregation); the winner is an order-limit over `nCandidates`
    * rows. Nothing wider than the spine is ever touched.
    */
  def ransacTrendLine(df: DataFrame, tsCol: String,
      nCandidates: Int = 16, salt: Long = 0L): DataFrame = {
    require(nCandidates >= 2, "need at least 2 candidate models")
    val series = dailyCountSeries(df, tsCol).persist()
    try {
      // a 1–2 day spine degenerates: both draws collapse to the same
      // index (0/0 NaN slope) and stddev_samp is NaN/NULL-divergent
      // across engines — contract error, matching the >= 3 guard of the
      // sibling spine fits (thetaForecast, quantileTrendIrls)
      require(series.count() >= 3,
        "ransacTrendLine needs a spine of at least 3 days")
      val p1 = 1000003L
      val p2 = 9999991L
      def draw(seed: Column, n: Column): Column = {
        val x1 = pmod(pmod(seed, lit(p1)) * lit(2654435761L), lit(p1))
        val x2 = pmod(pmod(x1 + (seed.cast("decimal(38,0)") / lit(p1))
            .cast("long"), lit(p2)) * lit(22695477L), lit(p2))
        pmod(x2, n)
      }
      val meta = series.agg(count(lit(1)).as("__n"),
        (graft.functions.Stats.stdRounded(col("x").cast("double")) /
          lit(2.0)).as("__thr"))
      val cands = meta
        .select(explode(sequence(lit(0L), lit(nCandidates - 1L)))
          .as("cand"), col("__n"), col("__thr"))
        .withColumn("__i0",
          draw(col("cand") * lit(7919L) + lit(salt), col("__n")))
        .withColumn("__i1r",
          draw(col("cand") * lit(7919L) + lit(3571L) + lit(salt),
            col("__n")))
        .withColumn("__i1",
          when(col("__i1r") === col("__i0"),
            pmod(col("__i1r") + lit(1L), col("__n")))
            .otherwise(col("__i1r")))
      val s0 = series.select(col("i").as("__i0"), col("x").as("__x0"))
      val s1 = series.select(col("i").as("__i1"), col("x").as("__x1"))
      val withPts = cands.join(broadcast(s0), "__i0")
        .join(broadcast(s1), "__i1")
        .withColumn("cand_slope",
          round((col("__x1").cast("double") - col("__x0").cast("double")) /
            (col("__i1").cast("double") - col("__i0").cast("double")), 9))
        .withColumn("cand_intercept",
          round(col("__x0").cast("double") -
            col("cand_slope") * col("__i0").cast("double"), 9))
      def dec0(c: Column): Column = c.cast("decimal(38,0)")
      val resid = col("x").cast("double") -
        (col("cand_intercept") + col("cand_slope") * col("i").cast("double"))
      val inl = abs(resid) <= col("__thr")
      val scored = series.crossJoin(broadcast(withPts))
        .groupBy(col("cand"), col("__n"), col("__thr"), col("__i0"),
          col("__i1"), col("cand_slope"), col("cand_intercept"))
        .agg(
          sum(when(inl, 1L).otherwise(0L)).as("n_inliers"),
          sum(when(inl, dec0(col("i")))).cast("double").as("__si"),
          sum(when(inl, dec0(col("i")) * dec0(col("i"))))
            .cast("double").as("__sii"),
          sum(when(inl, dec0(col("x")))).cast("double").as("__sx"),
          sum(when(inl, dec0(col("i")) * dec0(col("x"))))
            .cast("double").as("__six"))
      val best = scored
        .orderBy(col("n_inliers").desc, col("cand")).limit(1)
      val mD = col("n_inliers").cast("double")
      val refitB = (mD * col("__six") - col("__si") * col("__sx")) /
        (mD * col("__sii") - col("__si") * col("__si"))
      best.select(
        col("__n").as("n_days"), col("__thr").as("threshold"),
        col("cand").as("best_cand"), col("__i0").as("i0"),
        col("__i1").as("i1"),
        round(col("cand_slope"), 6).as("cand_slope"),
        round(col("cand_intercept"), 6).as("cand_intercept"),
        col("n_inliers"),
        round(mD / col("__n").cast("double"), 6).as("inlier_frac"),
        round(refitB, 6).as("refit_slope"),
        round((col("__sx") - refitB * col("__si")) / mD, 6)
          .as("refit_intercept"))
    } finally { series.unpersist(); () }
  }

  /** Quantile (pinball) trend lines on the daily count spine: for each
    * τ, the linear fit minimizing Σ ρ_τ(x − a − b·i) by smoothed IRLS —
    * weights w = (τ if r ≥ 0 else 1−τ)/max(ε, |r|), fixed steps, the
    * portable-fit contract (round-12 decimal working sums, round-9
    * params per step; q189/q374 family). Three slopes bound the trend's
    * SHAPE the way a single OLS line can't: diverging τ=0.25/0.75
    * slopes mean the spread itself is trending, and the τ=0.5 line is
    * the outlier-robust twin of q332's least-squares trend.
    *
    * Output per τ: final intercept/slope, the mean pinball loss at the
    * fit, and the OLS init shared by all τ (the comparison row).
    *
    * Scale shape: one count aggregation to the bounded day spine;
    * per (τ, step) ONE 5-sum reduction over that spine; driver holds
    * two scalars per τ.
    */
  def quantileTrendIrls(df: DataFrame, tsCol: String,
      taus: Seq[Double] = Seq(0.25, 0.5, 0.75), iters: Int = 8,
      eps: Double = 1e-6): DataFrame = {
    require(iters >= 1 && taus.nonEmpty &&
      taus.forall(t => t > 0.0 && t < 1.0),
      "need iters >= 1 and taus strictly inside (0,1)")
    val series = dailyCountSeries(df, tsCol).persist()
    try {
      val spark = df.sparkSession
      import spark.implicits._
      def r9(v: Double): Double =
        new java.math.BigDecimal(v)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      def d12(c: Column): Column =
        sum(round(c, 12).cast("decimal(38,12)")).cast("double")
      val iD = col("i").cast("double")
      val xD = col("x").cast("double")
      def dec0(c: Column): Column = c.cast("decimal(38,0)")
      val m0 = series.agg(count(lit(1)).as("n"),
        sum(dec0(col("i"))).cast("double").as("si"),
        sum(dec0(col("i")) * dec0(col("i"))).cast("double").as("sii"),
        sum(dec0(col("x"))).cast("double").as("sx"),
        sum(dec0(col("i")) * dec0(col("x"))).cast("double").as("six"))
        .head()
      val nD = m0.getLong(0).toDouble
      require(m0.getLong(0) >= 3, "need a spine of at least 3 days")
      val (si, sii, sx, six) =
        (m0.getDouble(1), m0.getDouble(2), m0.getDouble(3),
          m0.getDouble(4))
      val b0 = r9((nD * six - si * sx) / (nD * sii - si * si))
      val a0 = r9((sx - b0 * si) / nD)
      val rows = taus.map { tau =>
        var a = a0
        var b = b0
        (1 to iters).foreach { it =>
          val r = xD - (lit(a) + lit(b) * iD)
          val w = when(r >= 0.0, lit(tau)).otherwise(lit(1.0) - lit(tau))
            .divide(greatest(lit(eps), abs(r)))
          val s = series.agg(
            d12(w).as("sw"), d12(w * iD).as("swi"),
            d12(w * iD * iD).as("swii"),
            d12(w * xD).as("swx"), d12(w * iD * xD).as("swix")).head()
          val (sw, swi, swii, swx, swix) = (s.getDouble(0),
            s.getDouble(1), s.getDouble(2), s.getDouble(3),
            s.getDouble(4))
          val den = sw * swii - swi * swi
          require(den > 0.0, s"degenerate pinball system at step $it")
          b = r9((sw * swix - swi * swx) / den)
          a = r9((swx - b * swi) / sw)
        }
        val rFin = xD - (lit(a) + lit(b) * iD)
        val loss = series.agg(
          d12(when(rFin >= 0.0, lit(tau) * rFin)
            .otherwise((lit(tau) - lit(1.0)) * rFin))).head().getDouble(0)
        (tau, a, b, loss / nD)
      }
      rows.toDF("tau", "__a", "__b", "__loss")
        .select(col("tau"), round(col("__a"), 6).as("a"),
          round(col("__b"), 6).as("b"),
          round(col("__loss"), 6).as("pinball_mean"),
          round(lit(a0), 6).as("ols_a"), round(lit(b0), 6).as("ols_b"))
        .orderBy(col("tau"))
    } finally { series.unpersist(); () }
  }

  def poissonTrendIrls(df: DataFrame, tsCol: String,
      iters: Int = 6): DataFrame = {
    require(iters >= 1, "need at least one IRLS step")
    val series = dailyCountSeries(df, tsCol).persist()
    try {
      val spark = df.sparkSession
      import spark.implicits._
      def r9(v: Double): Double =
        new java.math.BigDecimal(v)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      def d12(c: Column): Column =
        sum(round(c, 12).cast("decimal(38,12)")).cast("double")
      val m0 = series.agg(count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("sx")).head()
      require(m0.getLong(0) > 0 && m0.getDouble(1) > 0.0,
        "need a non-empty series with positive total count")
      var a = r9(math.log(m0.getDouble(1) / m0.getLong(0).toDouble))
      var b = 0.0
      val iD = col("i").cast("double")
      val xD = col("x").cast("double")
      val trace = (1 to iters).map { it =>
        val eta = lit(a) + lit(b) * iD
        val mu = exp(eta)
        val z = eta + (xD - mu) / mu
        val r = series.agg(
          d12(mu).as("sw"), d12(mu * iD).as("swi"),
          d12(mu * iD * iD).as("swii"),
          d12(mu * z).as("swz"), d12(mu * iD * z).as("swiz"),
          d12(when(col("x") > 0L,
            lit(2.0) * (xD * log(xD / mu) - (xD - mu)))
            .otherwise(lit(2.0) * mu)).as("dev")).head()
        val (sw, swi, swii, swz, swiz, dev) = (r.getDouble(0),
          r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5))
        val den = sw * swii - swi * swi
        require(den > 0.0, s"degenerate IRLS system at step $it")
        b = r9((sw * swiz - swi * swz) / den)
        a = r9((swz - b * swi) / sw)
        val devIn = new java.math.BigDecimal(dev)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (it, a, b, devIn)
      }
      trace.toDF("iter", "__a", "__b", "deviance")
        .select(col("iter"), round(col("__a"), 6).as("a"),
          round(col("__b"), 6).as("b"),
          round(exp(col("__b")), 6).as("rate_ratio_per_day"),
          col("deviance"))
        .orderBy(col("iter"))
    } finally { series.unpersist(); () }
  }

  /** Entropy rate of the per-key state Markov chain (Shannon 1948,
    * H(X₂|X₁) under the empirical chain): H = −Σ_i π̂_i Σ_j p̂_ij ln p̂_ij
    * with π̂ the empirical source distribution of transitions — how
    * PREDICTABLE is the next event given the current one, the
    * one-number summary of [[markovTransitions]]' full matrix (and the
    * sequence-side sibling of q294's context-free bigram entropy).
    * Efficiency = H/ln(k) ∈ [0,1] normalizes away the state count.
    *
    * Exactness: transition counts exact; per-row −(n_ij/n_i)·ln(p̂)
    * terms round to 9 into decimal sums weighted by exact marginals.
    *
    * Scale shape: one key-partitioned lag window, one transition
    * count aggregation; everything after on the k²-bounded matrix.
    */
  def markovEntropyRate(df: DataFrame, key: String, ts: String,
      tiebreak: String, state: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val pairs = df
      .filter(col(state).isNotNull)
      .withColumn("__prev", lag(col(state), 1).over(w))
      .filter(col("__prev").isNotNull)
      .groupBy(col("__prev").as("i"), col(state).as("j"))
      .agg(count(lit(1)).as("n"))
    val marg = pairs.groupBy(col("i")).agg(sum(col("n")).as("ni"))
    val tot = pairs.agg(sum(col("n")).as("nt"),
      countDistinct(col("i")).as("k_states"))
    val p = col("n").cast("double") / col("ni").cast("double")
    val rowTerm = round(-(p * log(p)), 9).cast("decimal(38,9)")
    val perI = pairs.join(broadcast(marg), "i")
      .groupBy(col("i"), col("ni"))
      .agg(sum(rowTerm).cast("double").as("__hi"))
    val h = perI.crossJoin(broadcast(tot))
      .select(col("nt"), col("k_states"),
        round(col("ni").cast("double") / col("nt").cast("double") *
          col("__hi"), 9).cast("decimal(38,9)").as("__t"))
      .groupBy(col("nt"), col("k_states"))
      .agg(sum(col("__t")).cast("double").as("__h"))
    h.select(col("nt").as("n_transitions"), col("k_states"),
      round(col("__h"), 6).as("entropy_rate"),
      round(log(col("k_states").cast("double")), 6).as("max_entropy"),
      when(col("k_states") > 1,
        round(col("__h") / log(col("k_states").cast("double")), 6))
        .as("efficiency"))
  }

  /** Single mean-shift changepoint per key, exact: bucket time into
    * integer hours, reduce each key to per-bucket sufficient statistics
    * (n, Σy, Σy²) — ONE keyed aggregation over the data — then evaluate
    * every candidate split on the tiny per-key bucket frame with ordered
    * prefix sums and pick the split minimizing two-segment SSE. The
    * monitoring question "did this metric's level change, and when" with
    * no iteration and no approximation; candidate count = bucket count,
    * so the search is O(hours), never O(rows).
    *
    * Sums accumulate as exact decimals; the SSE arithmetic happens in
    * doubles after one cast, and the argmin tie-breaks on the earliest
    * split — engine-portable end to end.
    */
  def changepointMeanShift(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, scale: Int = 2): DataFrame = {
    val buckets = df
      .groupBy(col(keyCol),
        expr(s"unix_micros($tsCol) div 3600000000").as("__h"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col(valCol).cast(s"decimal(28,$scale)")).as("__s"),
        sum((col(valCol) * col(valCol)).cast(s"decimal(28,${2 * scale})"))
          .as("__s2"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = buckets.groupBy(col(keyCol))
      .agg(sum(col("__n")).as("__tn"),
        sum(col("__s")).as("__ts"), sum(col("__s2")).as("__ts2"))
    def sse(n: Column, s: Column, s2: Column): Column =
      s2 - (s * s) / n // all doubles; caller guards n > 0
    val splits = buckets
      .withColumn("__cn", sum(col("__n")).over(wCum))
      .withColumn("__cs", sum(col("__s")).over(wCum).cast("double"))
      .withColumn("__cs2", sum(col("__s2")).over(wCum).cast("double"))
      .join(broadcast(totals), keyCol)
      // a split AFTER the last bucket is the no-split model; exclude it
      .filter(col("__cn") < col("__tn"))
      .withColumn("__sse",
        sse(col("__cn").cast("double"), col("__cs"), col("__cs2")) +
        sse((col("__tn") - col("__cn")).cast("double"),
          col("__ts").cast("double") - col("__cs"),
          col("__ts2").cast("double") - col("__cs2")))
    val best = splits.groupBy(col(keyCol))
      .agg(min(struct(col("__sse"), col("__h"), col("__cn"))).as("__b"))
    best.join(broadcast(totals), keyCol)
      .select(col(keyCol),
        col("__b.__h").as("split_after_hour"),
        col("__b.__cn").as("n_before"),
        (col("__tn") - col("__b.__cn")).as("n_after"),
        round(col("__b.__sse"), 4).as("sse_split"),
        // decimal→double BEFORE squaring: decimal·decimal precision rules
        // differ between engines, doubles do not
        round(col("__ts2").cast("double") -
          col("__ts").cast("double") * col("__ts").cast("double") /
            col("__tn").cast("double"), 4).as("sse_nosplit"))
  }

  /** Seasonal-naive decomposition strength per key: how much of a key's
    * variance the hour-of-day profile explains —
    * strength = 1 − SSE_within / SSE_total, where SSE_within pools the
    * per-(key, hour) residual sum of squares and SSE_total is the key's
    * plain sum of squares (the forecasting-literature "strength of
    * seasonality" on the seasonal-naive model). strength ≈ 0 ⇒ the
    * diurnal profile is noise; ≈ 1 ⇒ the key is pure clockwork.
    *
    * No per-event residual is ever materialized: the ANOVA identity
    * SSE_within = Σx² − Σ_h S_h²/n_h turns the whole decomposition into
    * per-(key, hour) exact-decimal sufficient statistics — two hash
    * aggregations, zero windows, zero joins beyond the hour rollup. The
    * ≤ 24 per-hour terms accumulate as rounded decimals (order-free);
    * zero-variance keys emit a null strength.
    */
  def seasonalStrength(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String): DataFrame = {
    val byHour = df
      .groupBy(col(keyCol), hour(col(tsCol)).as("__h"))
      .agg(
        count(lit(1)).as("__n_h"),
        sum(col(valCol).cast("decimal(28,4)")).as("__s_h"),
        sum((col(valCol) * col(valCol)).cast("decimal(38,8)")).as("__q_h"))
    byHour
      .groupBy(col(keyCol))
      .agg(
        sum(col("__n_h")).as("n_events"),
        count(lit(1)).as("n_hours_active"),
        sum(col("__s_h")).cast("double").as("__s"),
        sum(col("__q_h")).cast("double").as("__q"),
        // Σ_h S_h²/n_h: each hour's term rounded then summed exactly
        sum(round((col("__s_h").cast("double") * col("__s_h").cast("double"))
            / col("__n_h").cast("double"), 6).cast("decimal(28,6)"))
          .cast("double").as("__w"))
      .withColumn("sse_total",
        round(col("__q") - col("__s") * col("__s") /
          col("n_events").cast("double"), 4))
      .withColumn("sse_within", round(col("__q") - col("__w"), 4))
      .withColumn("seasonal_strength",
        when(col("sse_total") > 0.0,
          round(lit(1.0) - (col("__q") - col("__w")) /
            (col("__q") - col("__s") * col("__s") /
              col("n_events").cast("double")), 6)))
      .select(col(keyCol), col("n_events"), col("n_hours_active"),
        col("sse_total"), col("sse_within"), col("seasonal_strength"))
  }

  /** Rolling z-score anomaly flags per key: each observation scored
    * against the mean/stddev of the `window` observations strictly BEFORE
    * it (self-exclusive — a spike must not mask itself), flagged when
    * |z| exceeds `threshold`. Sums accumulate as exact decimals over the
    * bounded ROWS frame, so the statistics are partition-order-free; the
    * variance uses the (n·Σx² − (Σx)²)/(n·(n−1)) sample form computed in
    * doubles AFTER the exact accumulation. Rows with fewer than 2 prior
    * observations (or zero variance) emit a null z — never a
    * divide-by-zero.
    */
  def rollingZScore(df: DataFrame, keyCol: String, tsCol: String,
      tiebreak: String, valCol: String, window: Int,
      threshold: Double): DataFrame = {
    require(window >= 2, "window must be >= 2")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreak))
      .rowsBetween(-window, -1)
    val x = col(valCol).cast("decimal(28,4)")
    val n = count(x).over(w)
    val s1 = sum(x).over(w).cast("double")
    // square in DOUBLE first (IEEE, engine-identical), then accumulate
    // exactly — a decimal×decimal square overflows precision 38 and the
    // two engines' overflow rules differ (the changepoint precedent)
    val s2 = sum((col(valCol) * col(valCol)).cast("decimal(38,8)"))
      .over(w).cast("double")
    val nD = n.cast("double")
    val mean = s1 / nD
    val varS = (nD * s2 - s1 * s1) / (nD * (nD - lit(1.0)))
    val z = when(n >= 2 && varS > 0.0,
      round((col(valCol) - mean) / sqrt(varS), 6))
    df.select(col(keyCol), col(tsCol), col(tiebreak), col(valCol),
        z.as("z_score"))
      .withColumn("is_anomaly",
        when(col("z_score").isNotNull, abs(col("z_score")) > threshold))
  }

  /** Bounded-window exponentially weighted moving average per key: for
    * each row, the weighted mean of its last `window` observations with
    * geometric weights (1−α)^j, normalized over the weights actually
    * present (the adjust=True EWM convention, truncated to the window).
    *
    * The truncation IS the scale contract: the textbook recurrence
    * y_t = αx_t + (1−α)y_{t−1} is inherently sequential per key (a 100 TB
    * key's whole history through one task, and one lost row reshapes
    * every later value), while the bounded window is a fixed chain of
    * per-key `lag`s — shuffle-free beyond the keying, restart-safe, and
    * with weights ≤ (1−α)^{w−1} the tail it drops is below measurement
    * noise for any sane (α, window). Weights and values scale to EXACT
    * integers and the result (`ewma_micro`, micro-units) is one integral
    * floor division — no floating-point op touches the value, because the
    * all-2·5-factor weights make the quotient's decimal expansion
    * terminate and a round-at-tie is engine-ambiguous. `ewma` is the
    * micro value over 10⁶, for display. Values are assumed non-negative
    * (integral `div` truncates toward zero; floor ≠ truncate below zero).
    */
  def ewma(df: DataFrame, keyCol: String, tsCol: String, tiebreak: String,
      valCol: String, alpha: BigDecimal = BigDecimal("0.2"),
      window: Int = 8): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(window >= 1, "window must be >= 1")
    // exactness bound: the largest weight scale is (window−1)·scale(α);
    // x(28,4) × w(p,s) must keep precision ≤ 38 on both engines
    require((window - 1) * alpha.scale <= 9,
      s"(window-1)*scale(alpha) must be <= 9 to stay decimal-exact; " +
        s"got window=$window, scale=${alpha.scale}")
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreak))
    // EXACT INTEGER arithmetic end to end: the portability guarantee is
    // that both engines compute the SAME integer floor division of the
    // same exact integer sums — not that the quotient terminates (the
    // weight SUM in the denominator can carry arbitrary prime factors).
    // Rounding a non-terminating quotient would differ between engines'
    // double rounding, so no float may touch the value.
    // x scales to 10⁻⁴ integers (value×10⁴ is integer-valued in
    // decimal(34,4), cast exact), weights to 10^(−ws) integers, and the
    // result is one integral floor division — unambiguous everywhere.
    val x = (col(valCol).cast("decimal(28,4)") * lit(10000L)).cast("long")
    val beta = BigDecimal(1) - alpha
    val ws = (window - 1) * alpha.scale
    val weights = (0 until window)
      .map(j => (beta.pow(j) * BigDecimal(10).pow(ws)).toLongExact)
    val terms = weights.zipWithIndex.map { case (wj, j) =>
      val xj = if (j == 0) x else lag(x, j).over(w)
      (when(xj.isNotNull, lit(wj)).otherwise(lit(null)), xj * lit(wj))
    }
    val num = terms.map { case (_, t) => coalesce(t, lit(0L)) }.reduce(_ + _)
    val den = terms.map { case (wc, _) => coalesce(wc, lit(0L)) }.reduce(_ + _)
    df.select(col(keyCol), col(tsCol), col(tiebreak), col(valCol),
        num.as("__num"), den.as("__den"))
      // num = Σwx·10^(4+ws), den = Σw·10^ws → ewma·10⁶ = num·10²/den;
      // values are non-negative (weights > 0, caller's value domain), so
      // `div`'s truncation is floor on both engines. den = 0 only when
      // every window value is null — emit null, never an ANSI
      // divide-by-zero (oracle mirrors the CASE)
      .withColumn("ewma_micro",
        expr("CASE WHEN __den = 0 THEN NULL ELSE (__num * 100) div __den END"))
      .withColumn("ewma",
        col("ewma_micro").cast("double") / lit(1000000.0))
      .drop("__num", "__den")
  }

  /** Sample autocorrelation of the DAILY EVENT COUNT at lags 1..`maxLag`
    * — the seasonality/persistence probe of an ingest volume series
    * (a strong lag-7 says weekly rhythm; slow decay says trending
    * volume, the thing naive day-over-day alerts misfire on). Gap days
    * count as 0 (a missing day IS a zero-volume observation for a
    * count series), via an explicit calendar spine.
    *
    * Exactness: counts are integers, so every moment — Σx, Σx², and
    * each lag's Σx·x₊ₗ / partial sums — is an exact DECIMAL reduction;
    * the textbook estimator assembles them per lag in one fixed double
    * shape: r_l = (Σxᵢxᵢ₊ₗ − μ(Aₗ+Bₗ) + (D−l)μ²)/(Σx² − Dμ²), μ = Σx/D.
    *
    * Scale shape: one (day) count aggregation over the scan; the
    * calendar spine, the lag frame, and the self-equi-join all live on
    * the bounded day frame (≤ calendar span × maxLag rows).
    */
  def dailyCountAcf(df: DataFrame, tsCol: String,
      maxLag: Int = 7): DataFrame =
    dailyCountAcfFromCounts(
      df.groupBy(to_date(col(tsCol)).as("day")).agg(count(lit(1)).as("x")),
      maxLag)

  /** Finish a (day, x) daily-count frame into the ACF card — the count
    * frame is pure additive state (streamable in complete mode; the
    * batch ≡ stream contract), everything here runs on the bounded day
    * spine.
    */
  def dailyCountAcfFromCounts(counts: DataFrame,
      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val bounds = counts.agg(min(col("day")).as("__lo"),
      max(col("day")).as("__hi"))
    val series = bounds
      .select(col("__lo"), explode(sequence(col("__lo"), col("__hi")))
        .as("day"))
      .join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("__lo")).cast("long").as("i"),
        coalesce(col("x"), lit(0L)).as("x"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val tot = series.agg(
      sum(col("x")).cast("double").as("__s0"),
      sum(dec(col("x")) * dec(col("x"))).cast("double").as("__s2"),
      count(lit(1)).as("__d"))
    val lags = bounds.select(
      explode(sequence(lit(1), lit(maxLag))).as("l"))
    val pairs = series.crossJoin(broadcast(lags))
      .withColumn("i2", col("i") + col("l"))
      .join(series.select(col("i").as("i2"), col("x").as("x2")), "i2")
    val perLag = pairs.groupBy(col("l"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(dec(col("x")) * dec(col("x2"))).cast("double").as("__nl"),
        sum(col("x")).cast("double").as("__al"),
        sum(col("x2")).cast("double").as("__bl"))
    val dD = col("__d").cast("double")
    val mu = col("__s0") / dD
    perLag.crossJoin(broadcast(tot))
      .select(col("l").cast("long").as("lag"), col("n_pairs"),
        round((col("__nl") - mu * (col("__al") + col("__bl")) +
          col("n_pairs").cast("double") * mu * mu) /
          (col("__s2") - dD * mu * mu), 6).as("acf"))
      .orderBy(col("lag"))
  }

  /** Partial autocorrelation of the daily event-count series via the
    * Durbin–Levinson recursion (Durbin 1960) on [[dailyCountAcf]]'s
    * rounded ACF values: PACF(k) = φ_kk — the lag-k correlation with
    * the shorter lags regressed away, the AR-order picker the raw ACF
    * can't be (an AR(1) has geometric ACF at every lag but PACF
    * support only at 1). Portable-fit contract: the recursion consumes
    * the 6-decimal ACF card values and rounds every φ to 9, so the
    * oracle replays the identical algebra in unrolled SQL; driver-side
    * recursion over a maxLag-sized vector is free.
    *
    * Scale shape: one [[dailyCountAcf]] pass (calendar-bounded spine);
    * the recursion is O(maxLag²) scalars on the driver.
    */
  def pacfDurbinLevinson(df: DataFrame, tsCol: String,
      maxLag: Int = 4): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val r = dailyCountAcf(df, tsCol, maxLag)
      .orderBy(col("lag")).select(col("acf")).as[Double].collect()
    require(r.length == maxLag,
      s"ACF returned ${r.length} lags, expected $maxLag (series shorter" +
        " than maxLag?)")
    def rr(k: Int): Double = r(k - 1)
    var phi = Array(r9(rr(1)))
    val pacf = scala.collection.mutable.ArrayBuffer(phi(0))
    for (k <- 2 to maxLag) {
      // ascending-j left-assoc sums — the oracle writes the same order
      val num = rr(k) -
        (1 until k).foldLeft(0.0)((s, j) => s + phi(j - 1) * rr(k - j))
      val den = 1.0 -
        (1 until k).foldLeft(0.0)((s, j) => s + phi(j - 1) * rr(j))
      val pkk = r9(num / den)
      phi = ((1 until k).map(j =>
        r9(phi(j - 1) - pkk * phi(k - j - 1))) :+ pkk).toArray
      pacf += pkk
    }
    pacf.toSeq.zipWithIndex
      .map { case (p, i) => (i + 1, p) }
      .toDF("lag", "__p")
      .select(col("lag").cast("long").as("lag"),
        round(col("__p"), 6).as("pacf"))
      .orderBy(col("lag"))
  }

  /** Ljung–Box portmanteau test (Ljung & Box 1978) on the daily
    * event-count series: Q(h) = n(n+2)·Σ_{k≤h} r_k²/(n−k) per lag h —
    * "is there ANY autocorrelation left through lag h", the whiteness
    * check that closes the ACF ([[dailyCountAcf]]) / PACF
    * ([[pacfDurbinLevinson]]) triptych. n recovers exactly as
    * n_pairs + lag on every ACF row (the spine is gap-free).
    *
    * Portability: each term r_k²/(n−k) is rounded to 12 and summed as
    * DECIMAL(38,12) over the lag window — decimal addition is
    * order-independent, so the running sum is identical under any
    * window evaluation strategy (Spark sequential vs DuckDB segment
    * tree); the n(n+2) blow-up happens once per row in doubles.
    *
    * Scale shape: one [[dailyCountAcf]] pass; everything else lives on
    * the maxLag-row card.
    */
  def ljungBoxDailyCounts(df: DataFrame, tsCol: String,
      maxLag: Int = 7): DataFrame = {
    val acf = dailyCountAcf(df, tsCol, maxLag)
    val n = (col("n_pairs") + col("lag")).cast("double")
    val term = round(col("acf") * col("acf") /
      (n - col("lag").cast("double")), 12)
    val w = Window.orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    acf
      .withColumn("__n", n)
      .withColumn("__cum",
        sum(term.cast("decimal(38,12)")).over(w).cast("double"))
      .select(col("lag"), col("acf"),
        round(col("__n") * (col("__n") + 2.0) * col("__cum"), 6)
          .as("q_lb"))
      .orderBy(col("lag"))
  }

  /** Durbin–Watson statistic (Durbin & Watson 1950) on the residuals
    * of the daily event-count series OLS-detrended against day index:
    * DW = Σ(e_t − e_{t−1})² / Σe_t² ∈ [0,4], ≈2 when residuals are
    * white, →0 under positive serial correlation — the regression-
    * flavored companion to [[ljungBoxDailyCounts]]. The OLS fit uses
    * exact integer moments (counts × day indices) cast once to double
    * in the textbook shape b = (nΣix − ΣiΣx)/(nΣi² − (Σi)²); per-row
    * residual terms are rounded to 8 and decimal-summed so both
    * reductions are order-independent.
    *
    * Scale shape: one count aggregation; spine-bounded window lag.
    */
  def durbinWatsonDailyTrend(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val series = counts.agg(min(col("day")).as("__lo"),
        max(col("day")).as("__hi"))
      .select(col("__lo"), explode(sequence(col("__lo"), col("__hi")))
        .as("day"))
      .join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("__lo")).cast("long").as("i"),
        coalesce(col("x"), lit(0L)).as("x"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val m = series.agg(count(lit(1)).as("n"),
      sum(col("i")).cast("double").as("__si"),
      sum(dec(col("i")) * dec(col("i"))).cast("double").as("__sii"),
      sum(col("x")).cast("double").as("__sx"),
      sum(dec(col("i")) * dec(col("x"))).cast("double").as("__six"))
    val nD = col("n").cast("double")
    val fit = m.select(col("n"),
      ((nD * col("__six") - col("__si") * col("__sx")) /
        (nD * col("__sii") - col("__si") * col("__si"))).as("__b"),
      col("__sx"), col("__si"))
      .select(col("n"), col("__b"),
        ((col("__sx") - col("__b") * col("__si")) /
          col("n").cast("double")).as("__a"))
    val resid = series.crossJoin(broadcast(fit))
      .withColumn("e", col("x").cast("double") -
        (col("__a") + col("__b") * col("i").cast("double")))
    val wLag = Window.orderBy(col("i"))
    val terms = resid
      .withColumn("__ep", lag(col("e"), 1).over(wLag))
      .select(col("n"), col("__a"), col("__b"),
        round(col("e") * col("e"), 8).cast("decimal(38,8)").as("__e2"),
        when(col("__ep").isNotNull,
          round((col("e") - col("__ep")) * (col("e") - col("__ep")), 8)
            .cast("decimal(38,8)")).as("__d2"))
    terms.groupBy(col("n"), col("__a"), col("__b"))
      .agg(sum(col("__e2")).cast("double").as("__sse"),
        sum(col("__d2")).cast("double").as("__ssd"))
      .select(col("n").as("n_days"),
        round(col("__b"), 6).as("slope"),
        round(col("__a"), 6).as("intercept"),
        round(col("__ssd") / col("__sse"), 6).as("dw"))
  }

  /** Wald–Wolfowitz runs test (1940) on the daily event-count series
    * against its median: are above/below-median days RANDOMLY ordered,
    * or do they clump (trend/cycle)? Median = mean of the two middle
    * order statistics of the day frame (explicit ranks, no engine
    * median()); days AT the median drop (the classical convention);
    * R = 1 + #sign changes in day order, with the exact-integer null
    * moments E[R] = 1 + 2n₁n₂/N and
    * Var[R] = 2n₁n₂(2n₁n₂ − N)/(N²(N−1)).
    *
    * Scale shape: one count aggregation; ranks/lag on the bounded day
    * spine only.
    */
  def runsTestDailyCounts(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val series = counts.agg(min(col("day")).as("__lo"),
        max(col("day")).as("__hi"))
      .select(col("__lo"), explode(sequence(col("__lo"), col("__hi")))
        .as("day"))
      .join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("__lo")).cast("long").as("i"),
        coalesce(col("x"), lit(0L)).as("x"))
    val wRank = Window.orderBy(col("x"), col("i"))
    val ranked = series.withColumn("__r", row_number().over(wRank))
    val nTot = series.agg(count(lit(1)).as("__n"))
    val med = ranked.crossJoin(broadcast(nTot))
      .filter(col("__r") === floor((col("__n") + 1) / 2) ||
        col("__r") === floor(col("__n") / 2) + 1)
      .agg((sum(col("x")).cast("double") / count(lit(1))).as("__med"))
    val signed = series.crossJoin(broadcast(med))
      .filter(col("x").cast("double") =!= col("__med"))
      .withColumn("__s", (col("x").cast("double") > col("__med"))
        .cast("int"))
    val wLag = Window.orderBy(col("i"))
    val runs = signed
      .withColumn("__prev", lag(col("__s"), 1).over(wLag))
      .agg(sum(lit(1)).as("__nn"),
        sum(col("__s")).as("__n1"),
        (sum(when(col("__prev").isNotNull &&
          col("__prev") =!= col("__s"), 1L).otherwise(0L)) + 1L)
          .as("__runs"))
    val n1 = col("__n1").cast("double")
    val nn = col("__nn").cast("double")
    val n2 = nn - n1
    val eR = lit(1.0) + lit(2.0) * n1 * n2 / nn
    val varR = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nn) /
      (nn * nn * (nn - 1.0))
    runs.select(col("__nn").as("n_days_used"),
      col("__n1").as("n_above"),
      (col("__nn") - col("__n1")).as("n_below"),
      col("__runs").as("runs"),
      round(eR, 6).as("e_runs"),
      round(varR, 6).as("var_runs"),
      when(varR > 0.0, round((col("__runs").cast("double") - eR) /
        sqrt(varR), 6)).as("z"))
  }

  /** Day-of-week seasonality card over a daily mass series: the
    * multiplicative index mean(dow)/mean(all) per weekday plus the
    * one-way-ANOVA seasonality strength R² = SS_between/SS_total — how
    * much of daily volume variance the weekly rhythm explains (the
    * number that says whether day-over-day alerts need dow-adjustment).
    * Weekday comes from pure epoch-day arithmetic — (days-since-epoch
    * + 3) mod 7, 0 = Monday — so no engine's locale-dependent
    * dayofweek() can disagree.
    *
    * Exactness: daily masses are exact decimals; SS terms use the
    * ANOVA identity (SS_between = Σ n_w·m_w² − D·μ², SS_total =
    * Σ T_d² − D·μ²) with decimal-cast square contributions on
    * identical doubles — no residual pass over the data.
    *
    * Scale shape: one (day) aggregation over the scan, everything
    * after on the bounded day frame; the card is 7 rows.
    */
  def seasonalDowCard(df: DataFrame, tsCol: String, valCol: String,
      scale: Int = 2): DataFrame = {
    val daily = df.filter(col(valCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast(s"decimal(28,$scale)")).as("td"))
      .withColumn("dow",
        pmod(datediff(col("day"), lit("1970-01-01").cast("date")) + 3,
          lit(7)).cast("long"))
    val tot = daily.agg(
      count(lit(1)).as("__d"),
      sum(col("td")).cast("double").as("__s"),
      sum((col("td").cast("double") * col("td").cast("double"))
        .cast("decimal(38,6)")).cast("double").as("__q"))
    val perDow = daily.groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("td")).cast("double").as("__sw"))
      .withColumn("__mw", col("__sw") / col("n_days").cast("double"))
    val dD = col("__d").cast("double")
    val mu = col("__s") / dD
    val ssb = perDow.agg(
      sum((col("n_days").cast("double") * col("__mw") * col("__mw"))
        .cast("decimal(38,6)")).cast("double").as("__ssbRaw"))
    perDow.crossJoin(broadcast(tot)).crossJoin(broadcast(ssb))
      .select(col("dow"), col("n_days"),
        round(col("__mw"), 6).as("mean_mass"),
        round(col("__mw") / mu, 6).as("seasonal_index"),
        round((col("__ssbRaw") - dD * mu * mu) /
          (col("__q") - dD * mu * mu), 6).as("strength"))
      .orderBy(col("dow"))
  }

  /** Two-segment trend fit of the daily event-count series: the least-
    * squares breakpoint — argmin over candidate split days of
    * SSE_left + SSE_right, each segment its own OLS line — next to
    * [[graft.operators.DriftOps.cusumChangePoint]]'s LEVEL-shift
    * detector, this finds a change in SLOPE (ramp-up starts, growth
    * stalls) that CUSUM smears. The SSE-reduction fraction vs the
    * single global line is the evidence weight.
    *
    * Exactness: the day spine carries integer counts, so every prefix
    * moment (Σx, Σx², Σi, Σi², Σi·x) is an exact decimal window sum;
    * each candidate's slopes/SSEs assemble per-row from exact terms in
    * one fixed double shape; argmin ties break toward the earliest day.
    *
    * Scale shape: one (day) count aggregation over the scan; prefix
    * windows, the candidate scan and the argmin all live on the
    * bounded calendar spine.
    */
  def segmentedTrendFit(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val series = counts
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("__lo"), explode(sequence(col("__lo"), col("__hi")))
        .as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"),
        datediff(col("day"), col("__lo")).cast("long").as("i"),
        coalesce(col("x"), lit(0L)).as("x"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val wCum = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = series
      .withColumn("p_n", count(lit(1)).over(wCum))
      .withColumn("p_x", sum(col("x")).over(wCum))
      .withColumn("p_xx", sum(dec(col("x")) * dec(col("x"))).over(wCum))
      .withColumn("p_i", sum(col("i")).over(wCum))
      .withColumn("p_ii", sum(dec(col("i")) * dec(col("i"))).over(wCum))
      .withColumn("p_ix", sum(dec(col("i")) * dec(col("x"))).over(wCum))
    val tot = pre.agg(
      max(col("p_n")).as("__tn"), max(col("p_x")).as("__tx"),
      max(col("p_xx")).as("__txx"), max(col("p_i")).as("__ti"),
      max(col("p_ii")).as("__tii"), max(col("p_ix")).as("__tix"))
    // closed-form OLS pieces for a segment given its exact moments
    def seg(n: Column, si: Column, sii: Column, sx: Column, sxx: Column,
        six: Column): (Column, Column) = {
      val nD = n.cast("double")
      val den = sii.cast("double") - si.cast("double") *
        si.cast("double") / nD
      val slope = (six.cast("double") - si.cast("double") *
        sx.cast("double") / nD) / den
      val sse = (sxx.cast("double") - sx.cast("double") *
        sx.cast("double") / nD) - slope * slope * den
      (slope, sse)
    }
    val cand = pre.crossJoin(broadcast(tot))
      // left = 0..i (needs ≥2 days with distinct i), right = the rest
      .filter(col("p_n") >= 2 && col("__tn") - col("p_n") >= 2)
    val (slL, sseL) = seg(col("p_n"), col("p_i"), col("p_ii"),
      col("p_x"), col("p_xx"), col("p_ix"))
    val (slR, sseR) = seg(col("__tn") - col("p_n"),
      col("__ti") - col("p_i"), col("__tii") - col("p_ii"),
      col("__tx") - col("p_x"), col("__txx") - col("p_xx"),
      col("__tix") - col("p_ix"))
    val (slT, sseT) = seg(col("__tn"), col("__ti"), col("__tii"),
      col("__tx"), col("__txx"), col("__tix"))
    val scored = cand.select(col("day"), col("i"),
      round(slL, 6).as("slope_left"), round(slR, 6).as("slope_right"),
      round(sseL + sseR, 6).as("sse_two"),
      round(sseT, 6).as("sse_single"),
      col("__tn").as("n_days"))
    scored
      .orderBy(col("sse_two"), col("day"))
      .limit(1)
      .select(col("n_days"), col("day").as("breakpoint_day"),
        col("slope_left"), col("slope_right"),
        col("sse_single"), col("sse_two"),
        round(when(col("sse_single") > 0.0,
          (col("sse_single") - col("sse_two")) / col("sse_single")),
          6).as("sse_reduction_frac"))
  }

  /** Overdispersion card for the daily event-count series: the
    * variance-to-mean ratio and the index-of-dispersion statistic
    * χ² = (D−1)·s²/x̄ (≈ χ²_{D−1} under a Poisson arrival null). VMR ≫ 1
    * says bursty/clumped ingest — the fact that decides whether rate
    * alerts can use Poisson bands or need the empirical spread. Gap
    * days are zero-count observations via the [[dailyCountAcf]]
    * calendar spine.
    *
    * Exactness: integer counts → Σx and Σx² are exact decimals; mean,
    * variance and the statistic assemble in one fixed double shape.
    *
    * Scale shape: one (day) count aggregation; everything after on the
    * bounded day frame; the card is 1 row.
    */
  def overdispersionCard(df: DataFrame, tsCol: String): DataFrame = {
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val series = counts
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
      .join(counts, Seq("day"), "left")
      .select(coalesce(col("x"), lit(0L)).as("x"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val agg = series.agg(
        count(lit(1)).as("n_days"),
        sum(col("x")).cast("double").as("__s"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("__q"))
      .filter(col("n_days") > 1 && col("__s") > 0.0)
    val dD = col("n_days").cast("double")
    val mean = col("__s") / dD
    val variance = (col("__q") - col("__s") * col("__s") / dD) /
      (dD - lit(1.0))
    agg.select(col("n_days"),
      round(mean, 6).as("mean_daily"),
      round(variance, 6).as("var_daily"),
      round(variance / mean, 6).as("vmr"),
      round((dD - lit(1.0)) * variance / mean, 6).as("chi2_dispersion"))
  }

  /** Holt double-exponential smoothing (level + linear trend) of the
    * daily event count — the adaptive-trend forecaster between q164's
    * flat EWMA and q290's global segmented OLS:
    * ℓ_t = α·x_t + (1−α)(ℓ_{t−1}+b_{t−1}),
    * b_t = β(ℓ_t − ℓ_{t−1}) + (1−β)b_{t−1}, init ℓ₁ = x₁, b₁ = 0.
    * `fitted` is the one-step-ahead forecast ℓ_{t−1}+b_{t−1} the
    * observation is judged against (null on day 1).
    *
    * Scale shape: the recursion is inherently sequential, so it runs on
    * the DRIVER over the bounded zero-filled day spine (≤ `maxGridSize`
    * rows, ENFORCED like kaplanMeier) — the data-proportional work is
    * only the daily count aggregate. Portability: α/β are BigDecimal so
    * the complements are exact literals; states round to 9 per step (the
    * irlsLoop recipe), replayed by a recursive CTE.
    */
  def holtLinear(df: DataFrame, tsCol: String,
      alpha: BigDecimal = BigDecimal("0.3"),
      beta: BigDecimal = BigDecimal("0.1"),
      maxGridSize: Long = 5000L): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1,
      "alpha and beta must be in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x"))
    val bounds = counts.agg(min(col("day")).as("__lo"),
      max(col("day")).as("__hi"))
    val series = bounds
      .select(explode(sequence(col("__lo"), col("__hi"))).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
    val rows = series.orderBy(col("day")).collect()
    require(rows.length <= maxGridSize,
      s"holtLinear day spine too long: ${rows.length} days exceed " +
        s"maxGridSize=$maxGridSize; aggregate to a coarser grid or raise " +
        "maxGridSize deliberately.")
    val (aD, bD) = (alpha.toDouble, beta.toDouble)
    val (caD, cbD) = ((BigDecimal(1) - alpha).toDouble,
      (BigDecimal(1) - beta).toDouble)
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    var l = 0.0
    var b = 0.0
    val out = rows.zipWithIndex.map { case (r, i) =>
      val day = r.getDate(0)
      val x = r.getLong(1)
      if (i == 0) {
        l = x.toDouble; b = 0.0
        (day, x, None: Option[Double], l, b)
      } else {
        val fit = l + b
        val lNew = r9(aD * x.toDouble + caD * (l + b))
        b = r9(bD * (lNew - l) + cbD * b)
        l = lNew
        (day, x, Some(fit), l, b)
      }
    }.toSeq
    out.toDF("day", "x", "__fit", "__l", "__b")
      .select(col("day"), col("x"),
        round(col("__fit"), 6).as("fitted"),
        round(col("__l"), 6).as("level"),
        round(col("__b"), 6).as("trend"))
      .orderBy(col("day"))
  }

  /** Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 — the
    * M3-competition winner) on the daily count spine: the h-step
    * forecast averages the extrapolated OLS line (θ=0, pure long-run
    * trend) with SES applied to the θ=2 series 2x_t − line_t (double
    * local curvature) — so it tracks the local level without losing
    * the trend, which is exactly where q164's flat EWMA and q308's
    * Holt each give up one half. One output row per horizon step.
    *
    * Portability: OLS init from exact integer sums, round-9 params,
    * round-9 SES states (the [[holtLinear]] recipe; recursive-CTE
    * replay). Scale shape: the recursion runs on the DRIVER over the
    * bounded zero-filled spine (≤ `maxGridSize`, enforced); the
    * data-proportional work is only the daily count aggregate.
    */
  def thetaForecast(df: DataFrame, tsCol: String,
      alpha: BigDecimal = BigDecimal("0.3"), horizon: Int = 7,
      maxGridSize: Long = 5000L): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(horizon >= 1, "need at least one forecast step")
    val spark = df.sparkSession
    import spark.implicits._
    val rows = dailyCountSeries(df, tsCol).orderBy(col("i"))
      .select(col("i"), col("x")).as[(Long, Long)].collect()
    require(rows.length >= 3 && rows.length <= maxGridSize,
      s"thetaForecast needs a spine of 3..$maxGridSize days, got " +
        s"${rows.length}")
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val nD = rows.length.toDouble
    val si = rows.map(_._1).sum.toDouble
    val sii = rows.map(r => r._1 * r._1).sum.toDouble
    val sx = rows.map(_._2).sum.toDouble
    val six = rows.map(r => r._1 * r._2).sum.toDouble
    val b0 = r9((nD * six - si * sx) / (nD * sii - si * si))
    val a0 = r9((sx - b0 * si) / nD)
    val aD = alpha.toDouble
    val caD = (BigDecimal(1) - alpha).toDouble
    var l = 0.0
    rows.zipWithIndex.foreach { case ((i, x), idx) =>
      val t2 = 2.0 * x.toDouble - (a0 + b0 * i.toDouble)
      l = if (idx == 0) t2 else r9(aD * t2 + caD * l)
    }
    val ses = l
    (1 to horizon).map { h =>
      val lineH = a0 + b0 * (nD - 1.0 + h.toDouble)
      (h.toLong, lineH, ses, 0.5 * (lineH + ses))
    }.toDF("h", "__line", "__ses", "__f")
      .select(col("h"),
        round(col("__line"), 6).as("trend_component"),
        round(col("__ses"), 6).as("ses_component"),
        round(col("__f"), 6).as("forecast"))
      .orderBy(col("h"))
  }

  /** Croston's method (1972) for INTERMITTENT demand — the forecaster
    * for series that are mostly zeros, where SES/Holt/theta all decay
    * toward a meaningless between-spike average: separate SES streams
    * for the nonzero demand SIZES z_k and the inter-demand INTERVALS
    * p_k, forecast rate ẑ/p̂ per day, plus the Syntetos–Boylan
    * bias-corrected variant (1 − α/2)·ẑ/p̂. `demandExpr` marks which
    * events count as demand; missing days are exact zeros.
    *
    * Conventions (replayed by the oracle): demands at spine indices
    * d₁<d₂<…; p₁ = d₁+1 (first interval measured from the spine
    * start), p_k = d_k − d_{k−1}; init ẑ = z₁, p̂ = p₁; round-9 states
    * per step. Same driver-over-bounded-spine scale shape as
    * [[holtLinear]] (enforced ≤ `maxGridSize`).
    */
  def crostonForecast(df: DataFrame, tsCol: String, demandExpr: Column,
      alpha: BigDecimal = BigDecimal("0.1"),
      maxGridSize: Long = 5000L): DataFrame = {
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(when(demandExpr, 1L).otherwise(0L)).as("x"))
    val rows = dailySpineFromCounts(counts).orderBy(col("i"))
      .select(col("i"), col("x")).as[(Long, Long)].collect()
    require(rows.length <= maxGridSize,
      s"crostonForecast day spine too long: ${rows.length} days exceed " +
        s"maxGridSize=$maxGridSize")
    val demands = rows.filter(_._2 > 0L)
    require(demands.nonEmpty,
      "crostonForecast needs at least one demand day")
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val aD = alpha.toDouble
    val caD = (BigDecimal(1) - alpha).toDouble
    var zh = demands.head._2.toDouble
    var ph = (demands.head._1 + 1L).toDouble
    demands.sliding(2).foreach {
      case Array((iPrev, _), (iCur, xCur)) =>
        zh = r9(aD * xCur.toDouble + caD * zh)
        ph = r9(aD * (iCur - iPrev).toDouble + caD * ph)
      case _ => ()
    }
    val rate = zh / ph
    Seq((rows.length.toLong, demands.length.toLong,
      demands.map(_._2).sum, zh, ph, rate,
      (1.0 - aD / 2.0) * rate,
      demands.length.toDouble / rows.length.toDouble))
      .toDF("n_days", "n_demand_days", "total_demand", "__zh", "__ph",
        "__rate", "__sba", "__frac")
      .select(col("n_days"), col("n_demand_days"), col("total_demand"),
        round(col("__zh"), 6).as("size_hat"),
        round(col("__ph"), 6).as("interval_hat"),
        round(col("__rate"), 6).as("croston_rate"),
        round(col("__sba"), 6).as("sba_rate"),
        round(col("__frac"), 6).as("demand_frac"))
  }

  /** EXACT sign test on day-over-day changes of the daily count spine:
    * are ups and downs balanced? n⁺/n⁻ from exact integer diffs (ties
    * dropped, the standard convention), then the EXACT binomial tail
    * P[X ≥ max(n⁺,n⁻)] under Bin(m, ½) in log space via the portable
    * [[graft.functions.Stats.lnGamma]] — the small-m companion of
    * q333's normal-approximation runs test and q326's Mann–Kendall
    * (which need asymptotics this card doesn't).
    *
    * Scale shape: one spine aggregation, one lag window over the
    * bounded spine, a tail explode of ≤ m+1 terms off a 1-row frame
    * (m is the spine length, not the data), two 1-row reductions.
    */
  def signTestDaily(df: DataFrame, tsCol: String): DataFrame = {
    import graft.functions.Stats.{dsum, lnChoose}
    val series = dailyCountSeries(df, tsCol)
    val w = Window.orderBy(col("i"))
    val diffs = series
      .withColumn("__prev", lag(col("x"), 1).over(w))
      .filter(col("__prev").isNotNull)
      .select((col("x") - col("__prev")).as("__d"))
    val m0 = diffs.agg(
      sum(when(col("__d") > 0L, 1L).otherwise(0L)).as("n_pos"),
      sum(when(col("__d") < 0L, 1L).otherwise(0L)).as("n_neg"),
      sum(when(col("__d") === 0L, 1L).otherwise(0L)).as("n_ties"))
      .withColumn("m", col("n_pos") + col("n_neg"))
      .withColumn("k", greatest(col("n_pos"), col("n_neg")))
    val mD = col("m").cast("double")
    def termAt(jD: Column): Column =
      lnChoose(mD, jD) - mD * log(lit(2.0))
    val terms = m0
      .select(col("m"), explode(sequence(col("k"), col("m"))).as("j"))
      .select(termAt(col("j").cast("double")).as("lt"))
    val mx = terms.agg(max(col("lt")).as("__mx"))
    val s = terms.crossJoin(broadcast(mx))
      .agg(dsum(exp(col("lt") - col("__mx")), 12).as("__s"),
        max(col("__mx")).as("__mx"))
    val lnP = col("__mx") + log(col("__s"))
    m0.crossJoin(broadcast(s)).select(
      col("n_pos"), col("n_neg"), col("n_ties"), col("m"), col("k"),
      round(exp(lnP), 6).as("p_right"),
      round(least(lit(1.0), lit(2.0) * exp(lnP)), 6).as("p_two_sided"))
  }

  /** Negative-binomial vs Poisson fit of the daily count distribution —
    * the model-based verdict on q282's overdispersion ratio: NB(r, θ)
    * by method of moments (r = m²/(v−m), θ = r/(r+m)), then BOTH exact
    * log-likelihoods via the portable
    * [[graft.functions.Stats.lnGamma]] and the AIC gap. A VMR > 1
    * says "overdispersed"; this card says how much better the
    * two-parameter model actually explains the data — the difference
    * between a symptom and a diagnosis.
    *
    * Exactness: moments from exact decimal sums in fixed double
    * shapes (no rounding needed — both engines derive identical m, v,
    * r); per-day likelihood terms are fixed lnGamma expressions summed
    * as round-12 decimals. NB columns are null when v ≤ m (MoM
    * undefined — the Poisson-or-underdispersed case), decided by the
    * same comparison in both engines.
    *
    * Scale shape: one count aggregation, one 3-sum moment reduction,
    * one likelihood reduction over the bounded spine.
    */
  def negativeBinomialFit(df: DataFrame, tsCol: String): DataFrame = {
    import graft.functions.Stats.{lnFact, lnGamma}
    def d12(c: Column): Column =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    val series = dailyCountSeries(df, tsCol)
    val m0 = series.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).cast("double").as("__sx"),
      sum(col("x").cast("decimal(38,0)") * col("x").cast("decimal(38,0)"))
        .cast("double").as("__sxx"))
    val nD = col("n").cast("double")
    val mean = col("__sx") / nD
    val variance = (col("__sxx") - col("__sx") * col("__sx") / nD) /
      (nD - lit(1.0))
    val moments = m0.select(col("n"), mean.as("__m"),
      variance.as("__v"),
      when(variance > mean, mean * mean / (variance - mean)).as("__r"))
    val xD = col("x").cast("double")
    val llP = xD * log(col("__m")) - col("__m") - lnFact(xD)
    val llNb = lnGamma(xD + col("__r")) - lnGamma(col("__r")) -
      lnFact(xD) + col("__r") * log(col("__r") / (col("__r") + col("__m"))) +
      xD * log(col("__m") / (col("__r") + col("__m")))
    val sums = series.crossJoin(broadcast(moments))
      .agg(d12(llP).as("__llp"),
        d12(when(col("__r") > 0.0, llNb)).as("__llnb"),
        max(col("n")).as("n"), max(col("__m")).as("__m"),
        max(col("__v")).as("__v"), max(col("__r")).as("__r"))
    sums.select(
      col("n").as("n_days"),
      round(col("__m"), 6).as("mean_daily"),
      round(col("__v"), 6).as("var_daily"),
      round(col("__v") / col("__m"), 6).as("vmr"),
      round(col("__r"), 6).as("nb_size"),
      round(col("__llp"), 6).as("ll_poisson"),
      round(col("__llnb"), 6).as("ll_negbin"),
      // ΔAIC = AIC_poisson − AIC_NB = 2(ll_nb − ll_p) − 2; > 0 → NB wins
      round(lit(2.0) * (col("__llnb") - col("__llp")) - lit(2.0), 6)
        .as("delta_aic"))
  }

  /** Turning-point randomness test on the daily count spine: count the
    * STRICT local extrema (x_{t−1} < x_t > x_{t+1} or mirrored) among
    * interior points; under iid the count is asymptotically normal
    * with E = 2(n−2)/3 and Var = (16n−29)/90 (Kendall). Too FEW
    * turning points → trend/momentum; too MANY → negative
    * autocorrelation (over-alternation) — the third member of the
    * randomness battery next to q333's runs test (levels vs median)
    * and q388's sign test (up/down balance), each blind to what the
    * others see. Ties produce no strict extremum (the plateau
    * convention both engines share).
    *
    * Scale shape: one lag/lead window over the bounded spine, one
    * 1-row reduction. All counts exact integers.
    */
  def turningPointTest(df: DataFrame, tsCol: String): DataFrame = {
    val series = dailyCountSeries(df, tsCol)
    val w = Window.orderBy(col("i"))
    val t = series
      .withColumn("__p", lag(col("x"), 1).over(w))
      .withColumn("__f", lead(col("x"), 1).over(w))
      .filter(col("__p").isNotNull && col("__f").isNotNull)
      .agg(count(lit(1)).as("__interior"),
        sum(when((col("__p") < col("x") && col("x") > col("__f")) ||
          (col("__p") > col("x") && col("x") < col("__f")), 1L)
          .otherwise(0L)).as("n_turning"))
    val nD = (col("__interior") + lit(2L)).cast("double")
    val e = lit(2.0) * (nD - lit(2.0)) / lit(3.0)
    val v = (lit(16.0) * nD - lit(29.0)) / lit(90.0)
    t.select(
      (col("__interior") + lit(2L)).as("n_days"),
      col("n_turning"),
      round(e, 6).as("expected"),
      round(v, 6).as("variance"),
      when(v > 0.0,
        round((col("n_turning").cast("double") - e) / sqrt(v), 6))
        .as("z"))
  }

  /** RESIDUAL moving-block bootstrap (Künsch 1989) for the daily trend
    * slope: fit the OLS line once, then build `nBoot` replicate series
    * as (trend at the new position) + (a seeded random BLOCK of
    * consecutive residuals), refit each, and report the replicate
    * mean/SE and the (2nd, 31st) order-statistic interval (≈90% at
    * B=32). THE honest uncertainty for a trend on AUTOCORRELATED days:
    * the iid jackknife/bootstrap understates the SE exactly when days
    * are dependent, and residual blocks preserve that short-range
    * dependence inside each resample — while resampling the RAW series
    * (the naive MBB) would scramble block levels and destroy the very
    * trend being measured (caught by this operator's spec).
    *
    * Exactness: block starts are exact congruential integers; the
    * fitted line uses round-9 parameters so residuals are identical
    * doubles in both engines; replicate moments accumulate as round-12
    * decimals; order statistics are rank-exact.
    *
    * Scale shape: the replicate frame is (B × m blocks × L offsets)
    * rows off a 1-row aggregate, one equi-join against the bounded
    * spine, one (replicate)-keyed reduction, one rank window over B
    * rows.
    */
  def blockBootstrapTrend(df: DataFrame, tsCol: String, nBoot: Int = 32,
      blockLen: Int = 7, salt: Long = 0L): DataFrame = {
    require(nBoot >= 8 && blockLen >= 2,
      "need nBoot >= 8 and blockLen >= 2")
    val series = dailyCountSeries(df, tsCol).persist()
    try {
      def r9(v: Double): Double =
        new java.math.BigDecimal(v)
          .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
      def dec0(c: Column): Column = c.cast("decimal(38,0)")
      val f = series.agg(count(lit(1)).as("n"),
        sum(dec0(col("i"))).cast("double").as("si"),
        sum(dec0(col("i")) * dec0(col("i"))).cast("double").as("sii"),
        sum(dec0(col("x"))).cast("double").as("sx"),
        sum(dec0(col("i")) * dec0(col("x"))).cast("double").as("six"))
        .head()
      val n = f.getLong(0)
      require(n > blockLen, s"spine of $n days needs > blockLen days")
      val nD = n.toDouble
      val (si, sii, sx, six) =
        (f.getDouble(1), f.getDouble(2), f.getDouble(3), f.getDouble(4))
      val bFull = r9((nD * six - si * sx) / (nD * sii - si * si))
      val aFull = r9((sx - bFull * si) / nD)
      val mBlocks = ((n + blockLen - 1) / blockLen).toInt
      val p1 = 1000003L
      val p2 = 9999991L
      def draw(seed: Column): Column = {
        val x1 = pmod(pmod(seed, lit(p1)) * lit(2654435761L), lit(p1))
        val x2 = pmod(pmod(x1 + (seed.cast("decimal(38,0)") / lit(p1))
            .cast("long"), lit(p2)) * lit(22695477L), lit(p2))
        pmod(x2, lit(n - blockLen + 1))
      }
      val resid = series.select(col("i"),
        (col("x").cast("double") -
          (lit(aFull) + lit(bFull) * col("i").cast("double"))).as("e"))
      val blocks = series.sparkSession.range(1).select(
          explode(sequence(lit(0L), lit(nBoot - 1L))).as("r"))
        .select(col("r"),
          explode(sequence(lit(0L), lit(mBlocks - 1L))).as("j"))
        .select(col("r"), col("j"),
          draw(col("r") * lit(31L) + col("j") * lit(7919L) + lit(salt))
            .as("s"))
        .select(col("r"), col("j"), col("s"),
          explode(sequence(lit(0L), lit(blockLen - 1L))).as("o"))
        .select(col("r"),
          (col("j") * lit(blockLen.toLong) + col("o")).as("pos"),
          (col("s") + col("o")).as("i"))
      def d12s(c: Column): Column =
        sum(round(c, 12).cast("decimal(38,12)")).cast("double")
      val joined = blocks.join(resid, "i")
      val perR = joined.groupBy(col("r"))
        .agg(count(lit(1)).as("m"),
          sum(dec0(col("pos"))).cast("double").as("sp"),
          sum(dec0(col("pos")) * dec0(col("pos"))).cast("double")
            .as("spp"),
          d12s(col("e")).as("se"),
          d12s(col("pos").cast("double") * col("e")).as("spe"))
      val mD = col("m").cast("double")
      val slopes = perR.select(col("r"),
        (lit(bFull) + (mD * col("spe") - col("sp") * col("se")) /
          (mD * col("spp") - col("sp") * col("sp"))).as("b"))
      val w = Window.orderBy(col("b"), col("r"))
      val ranked = slopes.withColumn("rk", row_number().over(w))
      def d12(c: Column): Column =
        sum(round(c, 12).cast("decimal(38,12)")).cast("double")
      val agg = ranked.agg(
        d12(col("b")).as("__sb"), d12(col("b") * col("b")).as("__sbb"),
        max(when(col("rk") === 2, col("b"))).as("__lo"),
        max(when(col("rk") === nBoot - 1, col("b"))).as("__hi"),
        count(lit(1)).as("n_boot"))
      val bD = col("n_boot").cast("double")
      val bootMean = col("__sb") / bD
      agg.select(
        lit(n).as("n_days"), col("n_boot"),
        lit(blockLen.toLong).as("block_len"),
        round(lit(bFull), 6).as("slope_full"),
        round(bootMean, 6).as("boot_mean"),
        round(sqrt(greatest(lit(0.0),
          (col("__sbb") - bD * bootMean * bootMean) / (bD - lit(1.0)))),
          6).as("boot_se"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
    } finally { series.unpersist(); () }
  }

  /** Gap-filled (i, x) daily-count spine: day index from the calendar
    * minimum, missing days as exact zero counts — the shared base of
    * the whole daily-diagnostics family.
    */
  private def dailyCountSeries(df: DataFrame, tsCol: String): DataFrame =
    dailySpineFromCounts(df.groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("x")))

  /** Gap-fill a (day, x) count frame into the (i, x) index spine —
    * exposed separately so streaming twins can feed their additive
    * count state through the identical finisher.
    */
  def dailySpineFromCounts(counts: DataFrame): DataFrame =
    counts.agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("__lo"), explode(sequence(col("__lo"), col("__hi")))
        .as("day"))
      .join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("__lo")).cast("long").as("i"),
        coalesce(col("x"), lit(0L)).as("x"))

  /** 3×3 determinant in one fixed double shape (row-major args) —
    * shared by every Cramer-solved 3-regressor OLS below so Spark and
    * the oracle expand the identical expression tree.
    */
  private def det3(a: Column, b: Column, c: Column, d: Column, e: Column,
      f: Column, g: Column, h: Column, i: Column): Column =
    a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)

  /** Augmented Dickey–Fuller test (Dickey & Fuller 1979; one augmented
    * lag, with constant) on the daily event-count series:
    * Δx_t = b₀ + γ·x_{t−1} + φ·Δx_{t−1} + ε_t, the unit-root t-ratio
    * t(γ) read against the DF distribution — the unit-root-as-null
    * companion of [[kpssDailyCounts]] (running both brackets the
    * series). Fit is CLOSED FORM: every normal-equation moment is an
    * exact decimal reduction of integer counts/lags/diffs, the 3×3
    * solve is Cramer's rule in one fixed double shape ([[det3]]), and
    * SSR comes from the y'y − b'X'y identity — no iteration, no
    * libm beyond one sqrt.
    *
    * Scale shape: one count aggregation; two lag windows + one 1-row
    * reduction on the bounded day spine.
    */
  def adfTestDailyCounts(df: DataFrame, tsCol: String): DataFrame = {
    val series = dailyCountSeries(df, tsCol)
    val w = Window.orderBy(col("i"))
    val lagged = series
      .withColumn("xl", lag(col("x"), 1).over(w))
      .withColumn("dx", col("x") - col("xl"))
      .withColumn("dxl", lag(col("dx"), 1).over(w))
      .filter(col("dxl").isNotNull)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val m = lagged.agg(
      count(lit(1)).as("m"),
      sum(col("xl")).cast("double").as("s1"),
      sum(col("dxl")).cast("double").as("s2"),
      sum(dec(col("xl")) * dec(col("xl"))).cast("double").as("s11"),
      sum(dec(col("xl")) * dec(col("dxl"))).cast("double").as("s12"),
      sum(dec(col("dxl")) * dec(col("dxl"))).cast("double").as("s22"),
      sum(col("dx")).cast("double").as("sy"),
      sum(dec(col("xl")) * dec(col("dx"))).cast("double").as("s1y"),
      sum(dec(col("dxl")) * dec(col("dx"))).cast("double").as("s2y"),
      sum(dec(col("dx")) * dec(col("dx"))).cast("double").as("syy"))
    val nD = col("m").cast("double")
    val (s1, s2, s11, s12, s22) = (col("s1"), col("s2"), col("s11"),
      col("s12"), col("s22"))
    val (sy, s1y, s2y, syy) = (col("sy"), col("s1y"), col("s2y"),
      col("syy"))
    val det = det3(nD, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    val b1 = det3(nD, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    val b2 = det3(nD, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    val ssr = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    val s2e = ssr / (nD - lit(3.0))
    val inv11 = (nD * s22 - s2 * s2) / det
    m.select(col("m").as("n_obs"),
      round(b0, 6).as("b0"),
      round(b1, 6).as("gamma"),
      round(b2, 6).as("phi"),
      round(ssr, 6).as("ssr"),
      round(b1 / sqrt(s2e * inv11), 6).as("t_gamma"))
  }

  /** Granger-causality F-test (Granger 1969; one lag, levels) between
    * the daily count series of two event types on the SHARED calendar
    * spine: does yesterday's `causeType` count improve today's
    * `effectType` forecast beyond its own lag? Unrestricted
    * y_t = b₀ + b₁y_{t−1} + b₂x_{t−1} (Cramer 3×3, [[det3]]) vs
    * restricted y_t = a₀ + a₁y_{t−1}; F = (SSR_r − SSR_u)/(SSR_u/(m−3)).
    * Exact integer moments throughout, one fixed double assembly.
    *
    * Scale shape: one filtered count aggregation per type (one scan),
    * lag windows + 1-row reductions on the bounded day spine.
    */
  def grangerDailyCounts(df: DataFrame, tsCol: String, typeCol: String,
      causeType: String, effectType: String): DataFrame = {
    val d = df.filter(col(typeCol).isin(causeType, effectType))
      .select(to_date(col(tsCol)).as("day"), col(typeCol).as("ty"))
    val counts = d.groupBy(col("day"))
      .agg(
        sum(when(col("ty") === causeType, 1L).otherwise(0L)).as("xc"),
        sum(when(col("ty") === effectType, 1L).otherwise(0L)).as("ye"))
    val series = counts
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("__lo"), explode(sequence(col("__lo"), col("__hi")))
        .as("day"))
      .join(counts, Seq("day"), "left")
      .select(datediff(col("day"), col("__lo")).cast("long").as("i"),
        coalesce(col("xc"), lit(0L)).as("xc"),
        coalesce(col("ye"), lit(0L)).as("ye"))
    val w = Window.orderBy(col("i"))
    val lagged = series
      .withColumn("yl", lag(col("ye"), 1).over(w))
      .withColumn("xl", lag(col("xc"), 1).over(w))
      .filter(col("yl").isNotNull)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val m = lagged.agg(
      count(lit(1)).as("m"),
      sum(col("yl")).cast("double").as("s1"),
      sum(col("xl")).cast("double").as("s2"),
      sum(dec(col("yl")) * dec(col("yl"))).cast("double").as("s11"),
      sum(dec(col("yl")) * dec(col("xl"))).cast("double").as("s12"),
      sum(dec(col("xl")) * dec(col("xl"))).cast("double").as("s22"),
      sum(col("ye")).cast("double").as("sy"),
      sum(dec(col("yl")) * dec(col("ye"))).cast("double").as("s1y"),
      sum(dec(col("xl")) * dec(col("ye"))).cast("double").as("s2y"),
      sum(dec(col("ye")) * dec(col("ye"))).cast("double").as("syy"))
    val nD = col("m").cast("double")
    val (s1, s2, s11, s12, s22) = (col("s1"), col("s2"), col("s11"),
      col("s12"), col("s22"))
    val (sy, s1y, s2y, syy) = (col("sy"), col("s1y"), col("s2y"),
      col("syy"))
    val det = det3(nD, s1, s2, s1, s11, s12, s2, s12, s22)
    val b0 = det3(sy, s1, s2, s1y, s11, s12, s2y, s12, s22) / det
    val b1 = det3(nD, sy, s2, s1, s1y, s12, s2, s2y, s22) / det
    val b2 = det3(nD, s1, sy, s1, s11, s1y, s2, s12, s2y) / det
    val ssrU = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    // restricted: y on [1, y_lag]
    val a1 = (nD * s1y - s1 * sy) / (nD * s11 - s1 * s1)
    val a0 = (sy - a1 * s1) / nD
    val ssrR = syy - (a0 * sy + a1 * s1y)
    m.select(col("m").as("n_obs"),
      round(b1, 6).as("b_ylag"),
      round(b2, 6).as("b_xlag"),
      round(ssrR, 6).as("ssr_r"),
      round(ssrU, 6).as("ssr_u"),
      round((ssrR - ssrU) / (ssrU / (nD - lit(3.0))), 6).as("f_stat"))
  }

  /** Cochrane–Orcutt AR(1) correction (1949) of the daily-count trend
    * fit: stage 1 = the [[durbinWatsonDailyTrend]] OLS, ρ̂ from its
    * residual lag products, stage 2 = OLS on the quasi-differenced
    * (x*, y*) = (i − ρ(i−1), y_t − ρy_{t−1}) — the serially-correlated
    *-errors repair for the slope whose naive SEs the DW statistic just
    * flagged. Residual products round to 8 into decimal sums (the DW
    * convention); stage-2 moments likewise.
    *
    * Scale shape: one count aggregation; two window passes + two 1-row
    * reductions on the bounded day spine.
    */
  def cochraneOrcuttDailyTrend(df: DataFrame, tsCol: String): DataFrame = {
    val series = dailyCountSeries(df, tsCol)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val m = series.agg(count(lit(1)).as("n"),
      sum(col("i")).cast("double").as("__si"),
      sum(dec(col("i")) * dec(col("i"))).cast("double").as("__sii"),
      sum(col("x")).cast("double").as("__sx"),
      sum(dec(col("i")) * dec(col("x"))).cast("double").as("__six"))
    val nD0 = col("n").cast("double")
    val fit = m.select(col("n"),
      ((nD0 * col("__six") - col("__si") * col("__sx")) /
        (nD0 * col("__sii") - col("__si") * col("__si"))).as("__b"),
      col("__sx"), col("__si"))
      .select(col("n"), col("__b"),
        ((col("__sx") - col("__b") * col("__si")) /
          col("n").cast("double")).as("__a"))
    val w = Window.orderBy(col("i"))
    val resid = series.crossJoin(broadcast(fit))
      .withColumn("e", col("x").cast("double") -
        (col("__a") + col("__b") * col("i").cast("double")))
      .withColumn("__ep", lag(col("e"), 1).over(w))
      .withColumn("__xp", lag(col("x"), 1).over(w))
    val rhoF = resid.filter(col("__ep").isNotNull)
      .agg(
        (sum(round(col("e") * col("__ep"), 8).cast("decimal(38,8)"))
          .cast("double") /
         sum(round(col("__ep") * col("__ep"), 8).cast("decimal(38,8)"))
          .cast("double")).as("__rho"))
    val star = resid.filter(col("__xp").isNotNull)
      .crossJoin(broadcast(rhoF))
      .select(
        (col("i").cast("double") -
          col("__rho") * (col("i") - 1L).cast("double")).as("xs"),
        (col("x").cast("double") -
          col("__rho") * col("__xp").cast("double")).as("ys"),
        col("__rho"), col("__b"), col("n"))
    val agg2 = star.groupBy(col("__rho"), col("__b"), col("n"))
      .agg(count(lit(1)).as("m"),
        sum(round(col("xs"), 8).cast("decimal(38,8)")).cast("double")
          .as("t1"),
        sum(round(col("xs") * col("xs"), 8).cast("decimal(38,8)"))
          .cast("double").as("t11"),
        sum(round(col("ys"), 8).cast("decimal(38,8)")).cast("double")
          .as("ty"),
        sum(round(col("xs") * col("ys"), 8).cast("decimal(38,8)"))
          .cast("double").as("t1y"))
    val mD = col("m").cast("double")
    val b2 = (mD * col("t1y") - col("t1") * col("ty")) /
      (mD * col("t11") - col("t1") * col("t1"))
    agg2.select(col("n").as("n_days"),
      round(col("__b"), 6).as("slope_ols"),
      round(col("__rho"), 6).as("rho"),
      round(b2, 6).as("slope_co"),
      round((col("ty") - b2 * col("t1")) / mD, 6).as("intercept_co"))
  }

  /** Chow structural-break test (Chow 1960) at the midpoint of the
    * daily event-count trend: did (intercept, slope) change between the
    * two halves? Three closed-form OLS fits — pooled, left, right —
    * each SSE assembled from exact integer segment moments
    * (SSE = Syy_c − b²·Sii_c, the [[segmentedTrendFit]] shape), then
    * F = ((SSE_p − SSE_l − SSE_r)/2) / ((SSE_l + SSE_r)/(n − 4)).
    * Complements q290's exhaustive-search segmented fit: q290 FINDS the
    * best break, this TESTS a designated one.
    *
    * Scale shape: one count aggregation, ONE grouped reduction (the
    * segment flag is the group key), a 1-row assembly.
    */
  def chowTestDailyCounts(df: DataFrame, tsCol: String): DataFrame = {
    val series = dailyCountSeries(df, tsCol)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val n0 = series.agg(count(lit(1)).as("__n0"))
    val seg = series.crossJoin(broadcast(n0))
      // i < n/2 via exact integers (Column./ is double division)
      .withColumn("__seg", (col("i") * lit(2L) < col("__n0")).cast("int"))
      .groupBy(col("__seg"))
      .agg(count(lit(1)).as("n"),
        sum(col("i")).cast("double").as("si"),
        sum(dec(col("i")) * dec(col("i"))).cast("double").as("sii"),
        sum(col("x")).cast("double").as("sx"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("sxx"),
        sum(dec(col("i")) * dec(col("x"))).cast("double").as("six"))
    def sse(n: Column, si: Column, sii: Column, sx: Column, sxx: Column,
        six: Column): Column = {
      val nD = n.cast("double")
      val den = sii - si * si / nD
      val slope = (six - si * sx / nD) / den
      (sxx - sx * sx / nD) - slope * slope * den
    }
    val halves = seg.groupBy()
      .agg(
        sum(col("n")).as("n"),
        sum(col("si")).as("si"), sum(col("sii")).as("sii"),
        sum(col("sx")).as("sx"), sum(col("sxx")).as("sxx"),
        sum(col("six")).as("six"),
        max(when(col("__seg") === 1, col("n"))).as("nl"),
        max(when(col("__seg") === 1, col("si"))).as("sil"),
        max(when(col("__seg") === 1, col("sii"))).as("siil"),
        max(when(col("__seg") === 1, col("sx"))).as("sxl"),
        max(when(col("__seg") === 1, col("sxx"))).as("sxxl"),
        max(when(col("__seg") === 1, col("six"))).as("sixl"),
        max(when(col("__seg") === 0, col("n"))).as("nr"),
        max(when(col("__seg") === 0, col("si"))).as("sir"),
        max(when(col("__seg") === 0, col("sii"))).as("siir"),
        max(when(col("__seg") === 0, col("sx"))).as("sxr"),
        max(when(col("__seg") === 0, col("sxx"))).as("sxxr"),
        max(when(col("__seg") === 0, col("six"))).as("sixr"))
    val sseP = sse(col("n"), col("si"), col("sii"), col("sx"),
      col("sxx"), col("six"))
    val sseL = sse(col("nl"), col("sil"), col("siil"), col("sxl"),
      col("sxxl"), col("sixl"))
    val sseR = sse(col("nr"), col("sir"), col("siir"), col("sxr"),
      col("sxxr"), col("sixr"))
    val nD = col("n").cast("double")
    halves.select(col("n").cast("long").as("n_days"),
      (col("nl").cast("long")).as("break_i"),
      round(sseP, 6).as("ssr_pooled"),
      round(sseL, 6).as("ssr_left"),
      round(sseR, 6).as("ssr_right"),
      round(((sseP - sseL - sseR) / lit(2.0)) /
        ((sseL + sseR) / (nD - lit(4.0))), 6).as("f_stat"))
  }

  /** Breusch–Pagan heteroscedasticity test (1979) on the daily-count
    * trend residuals: auxiliary regression of e² on the day index,
    * LM = n·R²_aux — do the residuals' VARIANCES trend even after the
    * mean does? (The DW/Cochrane–Orcutt family checks correlation;
    * this checks scale.) Stage-1 fit is the exact-moment
    * [[durbinWatsonDailyTrend]] OLS; e² terms round to 8 into decimal
    * sums, R²_aux = Sxy²/(Sxx·Syy) in one fixed shape.
    *
    * Scale shape: one count aggregation, two 1-row reductions on the
    * bounded day spine.
    */
  def breuschPaganDailyTrend(df: DataFrame, tsCol: String): DataFrame = {
    val series = dailyCountSeries(df, tsCol)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val m = series.agg(count(lit(1)).as("n"),
      sum(col("i")).cast("double").as("__si"),
      sum(dec(col("i")) * dec(col("i"))).cast("double").as("__sii"),
      sum(col("x")).cast("double").as("__sx"),
      sum(dec(col("i")) * dec(col("x"))).cast("double").as("__six"))
    val nD0 = col("n").cast("double")
    val fit = m.select(col("n"), col("__si"), col("__sii"),
      ((nD0 * col("__six") - col("__si") * col("__sx")) /
        (nD0 * col("__sii") - col("__si") * col("__si"))).as("__b"),
      col("__sx"))
      .select(col("n"), col("__si"), col("__sii"), col("__b"),
        ((col("__sx") - col("__b") * col("__si")) /
          col("n").cast("double")).as("__a"))
    val aux = series.crossJoin(broadcast(fit))
      .withColumn("e", col("x").cast("double") -
        (col("__a") + col("__b") * col("i").cast("double")))
      .select(col("n"), col("__si"), col("__sii"),
        round(col("e") * col("e"), 8).cast("decimal(38,8)").as("__e2"),
        round(col("i").cast("double") * (col("e") * col("e")), 8)
          .cast("decimal(38,8)").as("__ie2"),
        round((col("e") * col("e")) * (col("e") * col("e")), 8)
          .cast("decimal(38,8)").as("__e4"))
      .groupBy(col("n"), col("__si"), col("__sii"))
      .agg(sum(col("__e2")).cast("double").as("__sg"),
        sum(col("__ie2")).cast("double").as("__sig"),
        sum(col("__e4")).cast("double").as("__sgg"))
    val nD = col("n").cast("double")
    val sxyA = col("__sig") - col("__si") * col("__sg") / nD
    val sxxA = col("__sii") - col("__si") * col("__si") / nD
    val syyA = col("__sgg") - col("__sg") * col("__sg") / nD
    val r2 = sxyA * sxyA / (sxxA * syyA)
    aux.select(col("n").cast("long").as("n_days"),
      round(r2, 6).as("r2_aux"),
      round(nD * r2, 6).as("lm_stat"))
  }

  /** Classical additive seasonal decomposition (period 7) of the daily
    * event-count series: centered 7-day moving-average trend (complete
    * windows only), per-phase seasonal indices from the detrended
    * means, indices centered to sum 0, and the seasonal-strength share
    * 1 − Var(remainder)/Var(detrended) — the decomposition view behind
    * q176's seasonal-strength scalar and q278's raw day-of-week card.
    * Phase = day-index mod 7 (calendar-anchor-free, identical on any
    * engine).
    *
    * Exactness: the MA-7 trend is an exact integer window sum over 7.0;
    * detrended terms round to 8 into decimal sums for both the index
    * means and the variance shares.
    *
    * Scale shape: one count aggregation; one bounded window + two
    * grouped reductions on the day spine.
    */
  def seasonalDecompositionDailyCounts(df: DataFrame,
      tsCol: String): DataFrame =
    seasonalDecompositionFromCounts(
      df.groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("x")))

  /** Finish a (day, x) count frame into the decomposition card — the
    * count frame is pure additive state (streamable in complete mode;
    * the batch ≡ stream contract).
    */
  def seasonalDecompositionFromCounts(counts: DataFrame): DataFrame = {
    val series = dailySpineFromCounts(counts)
    val w7 = Window.orderBy(col("i")).rowsBetween(-3, 3)
    val det = series
      .withColumn("__s7", sum(col("x")).over(w7))
      .withColumn("__c7", count(lit(1)).over(w7))
      .filter(col("__c7") === 7L)
      .select(col("i"), (col("i") % 7L).as("phase"),
        (col("x").cast("double") -
          col("__s7").cast("double") / lit(7.0)).as("__d"))
      .persist()
    try {
      val byPhase = det.groupBy(col("phase"))
        .agg(count(lit(1)).as("n_obs"),
          (sum(round(col("__d"), 8).cast("decimal(38,8)")).cast("double") /
            count(lit(1)).cast("double")).as("__raw"))
      val centre = byPhase.agg(
        (sum(round(col("__raw"), 8).cast("decimal(38,8)")).cast("double") /
          count(lit(1)).cast("double")).as("__mean"))
      val idx = byPhase.crossJoin(broadcast(centre))
        .withColumn("__ctr", col("__raw") - col("__mean"))
      val rem = det.join(idx.select(col("phase"), col("__ctr")), "phase")
        .select(
          round(col("__d") * col("__d"), 8).cast("decimal(38,8)")
            .as("__d2"),
          round((col("__d") - col("__ctr")) * (col("__d") - col("__ctr")),
            8).cast("decimal(38,8)").as("__r2"))
        .agg(sum(col("__d2")).cast("double").as("__sd2"),
          sum(col("__r2")).cast("double").as("__sr2"))
      idx.crossJoin(broadcast(rem))
        .select(col("phase"), col("n_obs"),
          round(col("__raw"), 6).as("seasonal_raw"),
          round(col("__ctr"), 6).as("seasonal_idx"),
          round(lit(1.0) - col("__sr2") / col("__sd2"), 6)
            .as("seasonal_strength"))
        .orderBy(col("phase"))
    } finally { det.unpersist(); () }
  }

  /** Forecast-accuracy card on the daily event-count series: the naive
    * (ŷ_t = x_{t−1}) and seasonal-naive (ŷ_t = x_{t−7}) baselines
    * scored on the shared evaluation window (t ≥ 7) with MAE, RMSE,
    * sMAPE, MASE (MAE over the naive's MAE — Hyndman & Koehler 2006)
    * and Theil's U₂ (RMSE ratio). Any real forecaster (q111 AR(1),
    * q308 Holt) must beat these rows or it's decoration — this card is
    * the yardstick the accuracy literature says to report against.
    *
    * Exactness: errors are exact integers (|e|, e² exact sums); sMAPE
    * terms are fixed double shapes rounded to 9 into decimal sums.
    *
    * Scale shape: one count aggregation, one lag window, one grouped
    * reduction on the bounded spine.
    */
  def forecastAccuracyCard(df: DataFrame, tsCol: String): DataFrame = {
    val series = dailyCountSeries(df, tsCol)
    val w = Window.orderBy(col("i"))
    val lagged = series
      .withColumn("l1", lag(col("x"), 1).over(w))
      .withColumn("l7", lag(col("x"), 7).over(w))
      .filter(col("l7").isNotNull)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    def modelAgg(name: String, pred: Column) = {
      val e = col("x") - pred
      val sm = when(abs(col("x")) + abs(pred) > 0L,
        round(lit(2.0) * abs(e).cast("double") /
          (abs(col("x")) + abs(pred)).cast("double"), 9))
        .otherwise(lit(0.0))
      lagged.agg(
        count(lit(1)).as("n_obs"),
        sum(abs(e)).cast("double").as("__sae"),
        sum(dec(e) * dec(e)).cast("double").as("__sse"),
        sum(sm.cast("decimal(38,9)")).cast("double").as("__ssm"))
        .select(lit(name).as("model"), col("n_obs"), col("__sae"),
          col("__sse"), col("__ssm"))
    }
    val both = modelAgg("naive", col("l1"))
      .unionByName(modelAgg("seasonal_naive", col("l7")))
    val nD = col("n_obs").cast("double")
    val scored = both.select(col("model"), col("n_obs"),
      (col("__sae") / nD).as("__mae"),
      sqrt(col("__sse") / nD).as("__rmse"),
      (col("__ssm") / nD).as("__smape"))
    val base = scored.filter(col("model") === "naive")
      .select(col("__mae").as("__bmae"), col("__rmse").as("__brmse"))
    scored.crossJoin(broadcast(base))
      .select(col("model"), col("n_obs"),
        round(col("__mae"), 6).as("mae"),
        round(col("__rmse"), 6).as("rmse"),
        round(col("__smape"), 6).as("smape"),
        round(col("__mae") / col("__bmae"), 6).as("mase"),
        round(col("__rmse") / col("__brmse"), 6).as("theil_u"))
      .orderBy(col("model"))
  }

  /** Periodogram / spectral card of the daily event-count series:
    * power P_k = (A_k² + B_k²)/n at the Fourier frequencies k = 1..n/2
    * (A/B the cos/sin projections), normalized spectral entropy (how
    * concentrated is the rhythm), and the dominant period — the
    * frequency-domain reading of seasonality that q348's fixed
    * period-7 decomposition ASSUMES and this card can DISCOVER.
    *
    * Portability: the angle 2πkt/n is a fixed double shape; each
    * projection term x_t·cos/sin rounds to 6 into decimal sums (the
    * engine-wide exp/ln-class reliance on libm agreement, here cos/sin
    * — rounding absorbs ulp-level divergence); entropy terms round to
    * 9.
    *
    * Scale shape: one count aggregation; the (n × n/2) term frame is
    * calendar-bounded; one grouped reduction per frequency.
    */
  def periodogramDailyCounts(df: DataFrame, tsCol: String,
      maxFreqs: Int = 16): DataFrame = {
    require(maxFreqs >= 1, "maxFreqs must be >= 1")
    val series = dailyCountSeries(df, tsCol)
    val tot = series.agg(count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("__sx"))
    val nD = col("n").cast("double")
    val freqs = tot
      .select(col("n"), col("__sx"),
        explode(sequence(lit(1L),
          least(floor(col("n") / 2.0).cast("long"),
            lit(maxFreqs.toLong)))).as("k"))
    val twoPi = 6.283185307179586
    val angle = lit(twoPi) * col("k").cast("double") *
      col("i").cast("double") / nD
    // demeaned projections: subtracting the mean kills the k=0 leakage
    val xc = col("x").cast("double") - col("__sx") / nD
    val terms = series.crossJoin(broadcast(freqs))
      .select(col("k"), col("n"), col("__sx"),
        round(xc * cos(angle), 6).cast("decimal(38,6)").as("__ca"),
        round(xc * sin(angle), 6).cast("decimal(38,6)").as("__sb"))
    val perK = terms.groupBy(col("k"), col("n"))
      .agg(sum(col("__ca")).cast("double").as("__a"),
        sum(col("__sb")).cast("double").as("__b"))
      .select(col("k"), col("n"),
        round((col("__a") * col("__a") + col("__b") * col("__b")) /
          col("n").cast("double"), 6).as("power"))
    val totP = perK.agg(
      graft.functions.Stats.dsum(col("power"), 6).as("__tp"))
    val withP = perK.crossJoin(broadcast(totP))
      .withColumn("__p", col("power") / col("__tp"))
    val ent = withP
      .select(when(col("__p") > 0.0,
        round(-col("__p") * log(col("__p")), 9)).otherwise(lit(0.0))
        .cast("decimal(38,9)").as("__e"))
      .agg(sum(col("__e")).cast("double").as("__h"),
        count(lit(1)).as("__nk"))
    val dom = perK.agg(max(col("power")).as("__mx"))
    val domK = perK.crossJoin(broadcast(dom))
      .filter(col("power") === col("__mx"))
      .agg(min(col("k")).as("__dk"))
    withP.crossJoin(broadcast(ent)).crossJoin(broadcast(domK))
      .select(col("k"), col("power"),
        round(col("n").cast("double") / col("k").cast("double"), 6)
          .as("period_days"),
        round(col("__h") / log(col("__nk").cast("double")), 6)
          .as("spectral_entropy"),
        col("__dk").as("dominant_k"))
      .orderBy(col("k"))
  }

  /** One-sample Kolmogorov–Smirnov test of per-key inter-arrival gaps
    * against the fitted exponential: if arrivals were Poisson, gaps are
    * Exp(λ̂ = n/Σgaps) — D = sup|F̂ − F_exp| over the centisecond-
    * quantized gap grid reads how far the process is from memoryless
    * (bursty sessions push D up). The distributional sibling of q110's
    * gap-outlier screen and the model-check behind any Poisson
    * assumption (q282 overdispersion checks counts; this checks
    * TIMING).
    *
    * Exactness: gaps are exact integer microseconds (λ̂'s moments
    * exact); the ECDF runs on the quantized grid (identical on any
    * engine); each D-side term rounds to 9 before the max; one exp per
    * grid value.
    *
    * Scale shape: per-KEY lag windows (no global sort of events), one
    * grid count aggregation, one grid-bounded cumulative window.
    */
  def exponentialGapKs(df: DataFrame, keyCol: String, tsCol: String,
      tiebreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreak))
    val gaps = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__gap", col("__us") - lag(col("__us"), 1).over(w))
      .filter(col("__gap").isNotNull)
      .select(col("__gap"),
        round(col("__gap").cast("double") / lit(1e6), 2).as("v"))
    val tot = gaps.agg(count(lit(1)).as("n"),
      sum(col("__gap")).cast("double").as("__sus"))
    val lambda = col("n").cast("double") / (col("__sus") / lit(1e6))
    val byV = gaps.groupBy(col("v")).agg(count(lit(1)).as("c"))
    val wv = Window.orderBy(col("v"))
    val cum = byV.withColumn("cum", sum(col("c")).over(wv))
      .crossJoin(broadcast(tot))
    val nD = col("n").cast("double")
    val f = lit(1.0) - exp(-lambda * col("v"))
    val sides = cum.select(col("n"), col("__sus"),
      greatest(
        round(col("cum").cast("double") / nD - f, 9),
        round(f - (col("cum") - col("c")).cast("double") / nD, 9))
        .as("__d"))
    sides.groupBy(col("n"), col("__sus"))
      .agg(max(col("__d")).as("__dmax"))
      .select(col("n").as("n_gaps"),
        round(lambda, 6).as("lambda_per_sec"),
        round(col("__dmax"), 6).as("d_stat"),
        round(sqrt(nD) * col("__dmax"), 6).as("sqrt_n_d"))
  }

  /** Hurst exponent by rescaled-range analysis (Hurst 1951; Mandelbrot
    * & Wallis 1969) on the daily event-count series: for each window
    * size w the series splits into ⌊n/w⌋ complete blocks; per block the
    * range of cumulative deviations from the block mean over the block
    * std gives R/S; H is the log–log OLS slope of mean R/S against w.
    * H ≈ 0.5 = memoryless, > 0.5 = persistent (trends feed on
    * themselves), < 0.5 = mean-reverting — the long-memory companion to
    * the ACF/variance-ratio view (VR reads ONE horizon ratio, H fits
    * the whole scaling law).
    *
    * Exactness: block sums/cumsums are exact integers; deviations,
    * R, S are fixed double shapes; R/S rounds to 8 into decimal block
    * sums; the final 4-point OLS uses round-9 decimal moments of
    * ln w / ln(mean R/S).
    *
    * Scale shape: one count aggregation; one window pass over the
    * (|sizes| × days) exploded spine partitioned BY (w, block).
    */
  def hurstRsDailyCounts(df: DataFrame, tsCol: String,
      sizes: Seq[Int] = Seq(8, 16, 32, 64)): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 2),
      "window sizes must all be >= 2")
    val series = dailyCountSeries(df, tsCol)
    val ws = series.limit(1).select(
      explode(lit(sizes.distinct.sorted.toArray)).as("w"))
    val tagged = series.crossJoin(broadcast(ws))
      .withColumn("blk", expr("i div w"))
      .withColumn("k", expr("i % w") + 1L)
    val wFull = Window.partitionBy(col("w"), col("blk"))
    val wRun = Window.partitionBy(col("w"), col("blk")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val blocks = tagged
      .withColumn("__tot", sum(col("x")).over(wFull))
      .withColumn("__tsq", sum(dec(col("x")) * dec(col("x"))).over(wFull))
      .withColumn("__cnt", count(lit(1)).over(wFull))
      .filter(col("__cnt") === col("w").cast("long"))
      .withColumn("__cum", sum(col("x")).over(wRun))
      .withColumn("__d",
        col("__cum").cast("double") - col("k").cast("double") *
          (col("__tot").cast("double") / col("w").cast("double")))
      .groupBy(col("w"), col("blk"))
      .agg(max(col("__d")).as("__dmax"), min(col("__d")).as("__dmin"),
        max(col("__tot")).as("__tot"),
        max(col("__tsq").cast("double")).as("__tsq"))
    val wD = col("w").cast("double")
    val s = sqrt((col("__tsq") - col("__tot").cast("double") *
      col("__tot").cast("double") / wD) / wD)
    val rs = (col("__dmax") - col("__dmin")) / s
    val perW = blocks
      .filter(s > 0.0)
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_blocks"),
        (sum(round(rs, 8).cast("decimal(38,8)")).cast("double") /
          count(lit(1)).cast("double")).as("__mrs"))
      .filter(col("__mrs") > 0.0)
    val pts = perW.select(col("w"), col("n_blocks"), col("__mrs"),
      round(log(wD), 9).cast("decimal(38,9)").as("__lx"),
      round(log(col("__mrs")), 9).cast("decimal(38,9)").as("__ly"),
      round(log(wD) * log(wD), 9).cast("decimal(38,9)").as("__lxx"),
      round(log(wD) * log(col("__mrs")), 9).cast("decimal(38,9)")
        .as("__lxy"))
    val fit = pts.agg(count(lit(1)).as("__np"),
      sum(col("__lx")).cast("double").as("__sx"),
      sum(col("__ly")).cast("double").as("__sy"),
      sum(col("__lxx")).cast("double").as("__sxx"),
      sum(col("__lxy")).cast("double").as("__sxy"))
    val npD = col("__np").cast("double")
    val hurst = (npD * col("__sxy") - col("__sx") * col("__sy")) /
      (npD * col("__sxx") - col("__sx") * col("__sx"))
    pts.crossJoin(broadcast(fit.select(round(hurst, 6).as("hurst"))))
      .select(col("w").cast("long").as("w"), col("n_blocks"),
        round(col("__mrs"), 6).as("mean_rs"), col("hurst"))
      .orderBy(col("w"))
  }

  /** KPSS level-stationarity test (Kwiatkowski, Phillips, Schmidt & Shin
    * 1992) on the daily event-count series: η = (Σ_t S_t²/n²) / s²(L),
    * S_t the partial sums of the demeaned series and s²(L) the Bartlett-
    * kernel long-run variance at bandwidth L. The null here is
    * STATIONARITY — the mirror image of the unit-root tests ([[adfTest*]]
    * has the unit root as the null), so running both brackets the series
    * from two sides.
    *
    * Exactness: S_t = cumX_t − k·μ assembles from the EXACT integer
    * cumulative count; every autocovariance Σx_t·x_{t+l} / A_l / B_l is
    * an exact decimal reduction (the [[dailyCountAcf]] machinery); the
    * Bartlett weights (1 − l/(L+1)) are finite binary-exact doubles only
    * for L+1 a power of two — portability instead comes from rounding
    * each weighted term to 9 before the decimal sum.
    *
    * Scale shape: one count aggregation; spine/lag/window work bounded
    * by calendar days.
    */
  def kpssDailyCounts(df: DataFrame, tsCol: String,
      bandwidth: Int = 4): DataFrame = {
    require(bandwidth >= 0, "bandwidth must be >= 0")
    val series = dailyCountSeries(df, tsCol)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val tot = series.agg(
      count(lit(1)).as("n"),
      sum(col("x")).cast("double").as("__sx"),
      sum(dec(col("x")) * dec(col("x"))).cast("double").as("__sxx"))
    val nD = col("n").cast("double")
    val mu = col("__sx") / nD
    // partial sums of the demeaned series from the exact running count
    val wCum = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sSq = series
      .withColumn("__cum", sum(col("x")).over(wCum))
      .withColumn("__k", col("i") + 1L)
      .crossJoin(broadcast(tot))
      .select(round(
        (col("__cum").cast("double") - col("__k").cast("double") * mu) *
        (col("__cum").cast("double") - col("__k").cast("double") * mu), 6)
        .cast("decimal(38,6)").as("__s2"))
      .agg(sum(col("__s2")).cast("double").as("__ss"))
    // Bartlett-weighted autocovariances off the exact pair moments
    val lags = series.limit(1)
      .select(explode(sequence(lit(1), lit(bandwidth))).as("l"))
    val pairs = series.crossJoin(broadcast(lags))
      .withColumn("i2", col("i") + col("l"))
      .join(series.select(col("i").as("i2"), col("x").as("x2")), "i2")
    val perLag = pairs.groupBy(col("l"))
      .agg(count(lit(1)).as("__np"),
        sum(dec(col("x")) * dec(col("x2"))).cast("double").as("__nl"),
        sum(col("x")).cast("double").as("__al"),
        sum(col("x2")).cast("double").as("__bl"))
    val gammaL = (col("__nl") - mu * (col("__al") + col("__bl")) +
      col("__np").cast("double") * mu * mu) / nD
    val wgt = lit(1.0) - col("l").cast("double") / lit(bandwidth + 1.0)
    val lagSum = perLag.crossJoin(broadcast(tot))
      .select(round(wgt * gammaL, 9).cast("decimal(38,9)").as("__t"))
      .agg(coalesce(sum(col("__t")).cast("double"), lit(0.0)).as("__wl"))
    val gamma0 = (col("__sxx") - nD * mu * mu) / nD
    tot.crossJoin(sSq).crossJoin(lagSum)
      .select(col("n").as("n_days"), round(mu, 6).as("mean"),
        round(gamma0, 6).as("gamma0"),
        round(gamma0 + lit(2.0) * col("__wl"), 6).as("lrv"),
        round(col("__ss") / (nD * nD) /
          (gamma0 + lit(2.0) * col("__wl")), 6).as("eta"))
  }

  /** Lo–MacKinlay-style variance-ratio card on the daily event-count
    * series: VR(q) = Var(q-day overlapping sums)/(q·Var(x)) for q ∈
    * `qs` — ≈1 for white noise, >1 under positive persistence, <1 under
    * mean-reversion. The simple consistent estimator (population
    * variances, overlapping windows, no bias correction) — documented
    * shape, identical in the oracle.
    *
    * Exactness: window q-sums of integer counts are exact integers, so
    * every moment (Σm, Σm², Σx, Σx²) is an exact decimal reduction and
    * each VR assembles per-q in one fixed double shape.
    *
    * Scale shape: one count aggregation; one bounded-window pass per
    * distinct q over the day spine.
    */
  def varianceRatioDailyCounts(df: DataFrame, tsCol: String,
      qs: Seq[Int] = Seq(2, 4, 8)): DataFrame = {
    require(qs.nonEmpty && qs.forall(_ >= 2), "qs must all be >= 2")
    val series = dailyCountSeries(df, tsCol).persist()
    try {
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val tot = series.agg(
        count(lit(1)).as("n"),
        sum(col("x")).cast("double").as("__sx"),
        sum(dec(col("x")) * dec(col("x"))).cast("double").as("__sxx"))
      val perQ = qs.distinct.sorted.map { q =>
        val w = Window.orderBy(col("i"))
          .rowsBetween(Window.currentRow, q - 1)
        series
          .withColumn("__m", sum(col("x")).over(w))
          .withColumn("__cnt", count(lit(1)).over(w))
          .filter(col("__cnt") === q.toLong) // complete windows only
          .agg(count(lit(1)).as("n_windows"),
            sum(col("__m")).cast("double").as("__sm"),
            sum(dec(col("__m")) * dec(col("__m"))).cast("double")
              .as("__smm"))
          .select(lit(q.toLong).as("q"), col("n_windows"), col("__sm"),
            col("__smm"))
      }.reduce(_ unionByName _)
      val nD = col("n").cast("double")
      val mu = col("__sx") / nD
      val var1 = col("__sxx") / nD - mu * mu
      val nwD = col("n_windows").cast("double")
      val qD = col("q").cast("double")
      val varQ = col("__smm") / nwD -
        (col("__sm") / nwD) * (col("__sm") / nwD)
      perQ.crossJoin(broadcast(tot))
        .select(col("q"), col("n_windows"),
          round(var1, 6).as("var_1"),
          round(varQ, 6).as("var_q"),
          round(varQ / (qD * var1), 6).as("vr"))
        .orderBy(col("q"))
    } finally { series.unpersist(); () }
  }

  /** Page–Hinkley change monitor (Page 1954, Hinkley 1971) on the daily
    * event-count series: m_t = Σ_{s≤t}(x_s − x̄_s − δ) with x̄_s the
    * RUNNING mean, PH_t = m_t − min_{s≤t} m_s; the card reports the
    * peak excursion and where it first happens — the sequential-drift
    * sibling of q267's offline CUSUM (which uses the GLOBAL mean and
    * needs the whole series; this shape is one-pass/streamable).
    *
    * Exactness: x̄_s = cumX_s/k from exact integers; each increment is
    * one fixed double shape rounded to 9, the running m_t an exact
    * decimal cumulative sum, the running minimum a decimal window min —
    * every engine walks the identical sequence.
    *
    * Scale shape: one count aggregation; two cumulative windows on the
    * bounded day spine.
    */
  def pageHinkleyDailyCounts(df: DataFrame, tsCol: String,
      delta: BigDecimal = BigDecimal("0.0")): DataFrame =
    pageHinkleyFromCounts(
      df.groupBy(to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("x")), delta)

  /** Finish a (day, x) count frame into the Page–Hinkley card — the
    * count frame is pure additive state (streamable in complete mode;
    * the batch ≡ stream contract), everything here runs on the bounded
    * spine.
    */
  def pageHinkleyFromCounts(counts: DataFrame,
      delta: BigDecimal = BigDecimal("0.0")): DataFrame = {
    val series = dailySpineFromCounts(counts)
    val wCum = Window.orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m = series
      .withColumn("__cum", sum(col("x")).over(wCum))
      .withColumn("__k", col("i") + 1L)
      .withColumn("__inc", round(
        col("x").cast("double") -
          col("__cum").cast("double") / col("__k").cast("double") -
          lit(delta.toDouble), 9).cast("decimal(38,9)"))
      .withColumn("__m", sum(col("__inc")).over(wCum))
      .withColumn("__mmin", min(col("__m")).over(wCum))
      .select(col("i"), (col("__m") - col("__mmin")).cast("double")
        .as("__ph"), col("__m"))
    val best = m.agg(max(col("__ph")).as("__best"))
    val tStar = m.crossJoin(broadcast(best))
      .filter(col("__ph") === col("__best"))
      .agg(min(col("i")).as("t_star"))
    val tail = m.agg(count(lit(1)).as("n_days"),
      max(col("__ph")).as("__phmax"),
      max_by(col("__m"), col("i")).cast("double").as("__mfinal"))
    tail.crossJoin(tStar)
      .select(col("n_days"), lit(delta.toDouble).as("delta"),
        round(col("__phmax"), 6).as("ph_stat"), col("t_star"),
        round(col("__mfinal"), 6).as("m_final"))
  }
}
