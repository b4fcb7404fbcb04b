package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distribution-drift and distribution-audit operators: PSI between two time
  * windows, the two-sample Kolmogorov–Smirnov statistic, and a Benford
  * first-digit audit. The reference freezes its feature scalers on the train
  * window and applies them unchanged at inference
  * (`/root/reference/src/data/preprocessing.py:139-163`) — drift detection is
  * the production guard that says when that frozen assumption has expired.
  *
  * All three are pure aggregation pipelines: exact integer bin/rank counts,
  * one keyed shuffle each, broadcast joins for the tiny statistic frames, and
  * decimal-cast contribution sums so the reported statistics are partition-
  * order-free and engine-portable.
  */
object DriftOps {

  /** Population Stability Index per key between a reference window (first
    * half of the time range: `2·ts < min+max`, integer microseconds, no
    * division) and the current window (second half). Values bin into
    * `nBins` equal-width bins over the reference window's per-key [min, max]
    * (current-window stragglers clamp into the edge bins); proportions are
    * Laplace-smoothed by 0.5 per bin so empty bins stay finite; and
    * PSI = Σ (p_cur − p_ref)·ln(p_cur / p_ref).
    *
    * Scale shape: one scan for the per-key bounds (broadcast back), one
    * (key, bin) count aggregation, broadcast totals — the events table
    * shuffles once, on the (key, bin) grid.
    */
  def psiDrift(df: DataFrame, keyCol: String, tsCol: String, valCol: String,
      nBins: Int = 10): DataFrame =
    psiFromCells(timeSplitCells(df, keyCol, tsCol, valCol, nBins),
      keyCol, nBins)

  /** First-half-vs-second-half binned counters per key — the shared
    * front end of the drift battery ([[psiDrift]], [[jsDivergence]]):
    * reference = first time half, bins fitted on the reference range.
    */
  private def timeSplitCells(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, nBins: Int): DataFrame = {
    val usCol = unix_micros(col(tsCol))
    val range = df.agg(
      min(usCol).as("__mn_us"), max(usCol).as("__mx_us"))
    val withWin = df
      .crossJoin(broadcast(range))
      .withColumn("__is_ref",
        usCol * 2 < col("__mn_us") + col("__mx_us"))
    val bounds = withWin.filter(col("__is_ref"))
      .groupBy(col(keyCol))
      .agg(min(col(valCol)).as("__lo"), max(col(valCol)).as("__hi"))
    withWin
      .join(broadcast(bounds), keyCol)
      .withColumn("__w", (col("__hi") - col("__lo")) / lit(nBins.toDouble))
      .withColumn("__bin",
        when(col("__w") === 0.0, lit(0))
          .otherwise(least(lit(nBins - 1), greatest(lit(0),
            floor((col(valCol) - col("__lo")) / col("__w")).cast("int")))))
      .groupBy(col(keyCol), col("__bin"))
      .agg(
        sum(when(col("__is_ref"), 1L).otherwise(0L)).as("__ref"),
        sum(when(!col("__is_ref"), 1L).otherwise(0L)).as("__cur"))
  }

  /** Jensen–Shannon divergence per key over the same time-split binned
    * cells as [[psiDrift]] — the symmetric, BOUNDED (≤ ln 2) member of
    * the drift battery, preferable when either window can be empty in a
    * bin (KL/PSI explode, JS does not). Laplace smoothing identical to
    * PSI's; per-bin contributions round-trip through exact decimals
    * (order-free); `js_distance` = √(JS/ln 2) ∈ [0,1] is the metric
    * form. Same scale shape as PSI: one bin-keyed aggregation, tiny
    * broadcast totals.
    */
  def jsDivergence(df: DataFrame, keyCol: String, tsCol: String,
      valCol: String, nBins: Int = 10): DataFrame = {
    val cells = timeSplitCells(df, keyCol, tsCol, valCol, nBins)
    val totals = cells.groupBy(col(keyCol))
      .agg(sum(col("__ref")).as("__nref"), sum(col("__cur")).as("__ncur"))
    val smooth = lit(0.5 * nBins)
    val pr = (col("__ref") + 0.5) / (col("__nref") + smooth)
    val pc = (col("__cur") + 0.5) / (col("__ncur") + smooth)
    val m = (pr + pc) / lit(2.0)
    val contrib = lit(0.5) * (pr * log(pr / m) + pc * log(pc / m))
    cells.join(broadcast(totals), keyCol)
      .withColumn("__contrib", contrib.cast("decimal(28,12)"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("__ref")).as("n_ref"),
        sum(col("__cur")).as("n_cur"),
        round(greatest(sum(col("__contrib")).cast("double"), lit(0.0)), 6)
          .as("js_nats"))
      .withColumn("js_distance",
        round(sqrt(col("js_nats") / lit(math.log(2.0))), 6))
  }

  /** PSI finishing arithmetic over a (key, bin, __ref, __cur) counter
    * frame — shared by the batch operator above and the STREAMING drift
    * monitor ([[graft.streaming.StreamingOps.streamingPsiDrift]]), whose
    * counters are maintained incrementally: the counts are pure additive
    * state, so a micro-batch engine can keep them forever-fresh and this
    * step turns any snapshot into the PSI report.
    */
  def psiFromCells(cells: DataFrame, keyCol: String, nBins: Int): DataFrame = {
    val totals = cells.groupBy(col(keyCol))
      .agg(sum(col("__ref")).as("__nref"), sum(col("__cur")).as("__ncur"))
    val smooth = lit(0.5 * nBins)
    cells.join(broadcast(totals), keyCol)
      .withColumn("__pr",
        (col("__ref") + 0.5) / (col("__nref") + smooth))
      .withColumn("__pc",
        (col("__cur") + 0.5) / (col("__ncur") + smooth))
      .withColumn("__contrib",
        ((col("__pc") - col("__pr")) * log(col("__pc") / col("__pr")))
          .cast("decimal(28,12)"))
      .groupBy(col(keyCol))
      .agg(
        first(col("__nref")).as("n_ref"),
        first(col("__ncur")).as("n_cur"),
        round(sum(col("__contrib")).cast("double"), 6).as("psi"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic: max |F_a(v) − F_b(v)| over the
    * observed support, where F are the empirical CDFs of `valCol` within the
    * two `groupCol` populations.
    *
    * The ECDF needs a global running count over sorted values — the naive
    * single-partition `Window.orderBy` is exactly the scale bug the q46 AUC
    * review flagged. Here the prefix sum is distributed: values bucket by a
    * deterministic range split (from the broadcast global [min, max], not
    * sampling, so the bucket id is a pure function of the value), prefix
    * sums run per-bucket under a keyed window, and only the per-bucket
    * subtotal frame (`buckets` rows) crosses a global window to produce each
    * bucket's starting offset. No full-table single-partition stage exists
    * at any size.
    */
  def ksTwoSample(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    // NULL values have no ECDF position — drop them (the kruskalWallis
    // convention), else they form a null grid point and skew n_a/n_b.
    val v = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"),
        (col(groupCol) === groupA).as("__is_a"))
    // collapse ties first: the grid the ECDF is evaluated on
    val byVal = v.groupBy(col("v"))
      .agg(
        sum(when(col("__is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__is_a"), 1L).otherwise(0L)).as("cb"))
    val bounds = byVal.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val bucketed = byVal.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("int"))))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .withColumn("__cum_a", sum(col("ca")).over(wIn))
      .withColumn("__cum_b", sum(col("cb")).over(wIn))
    // per-bucket subtotals: tiny (≤ `buckets` rows), so the global ordered
    // window below is a driver-scale frame, never the data
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("ca")).as("__ta"), sum(col("cb")).as("__tb"))
      .withColumn("__off_a", coalesce(sum(col("__ta")).over(wOff), lit(0L)))
      .withColumn("__off_b", coalesce(sum(col("__tb")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__off_a"), col("__off_b"))
    val totals = byVal.agg(
      sum(col("ca")).as("__na"), sum(col("cb")).as("__nb"))
    cum.join(broadcast(offsets), "__bkt")
      .crossJoin(broadcast(totals))
      // an absent population makes the ECDF undefined — return an empty
      // frame instead of dividing by a zero count
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(
        col("__na"), col("__nb"),
        abs(
          (col("__off_a") + col("__cum_a")).cast("double") / col("__na") -
          (col("__off_b") + col("__cum_b")).cast("double") / col("__nb"))
          .as("__d"))
      .groupBy(col("__na"), col("__nb"))
      .agg(round(max(col("__d")), 6).as("ks_stat"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("ks_stat"))
  }

  /** First significant digit of a positive BIGINT column, purely by integer
    * comparisons (no log/string round-trip, so every engine agrees bit-for-
    * bit), with observed shares against the Benford expectation
    * log10(1 + 1/d) — supplied as fixed literals so the report never depends
    * on a libm. One count aggregation over 9 digits.
    */
  def benfordAudit(df: DataFrame, valCol: String): DataFrame = {
    val k = col(valCol).cast("long")
    // positive values below 10^13 (beyond any key domain here); each branch
    // is an exact integer floor-divide down to one digit
    val firstDigit = Seq(1L, 10L, 100L, 1000L, 10000L, 100000L, 1000000L,
      10000000L, 100000000L, 1000000000L, 10000000000L, 100000000000L,
      1000000000000L)
      .foldLeft(lit(null).cast("long")) { (acc, p) =>
        when(k >= p && k < p * 10, (k / p).cast("long")).otherwise(acc)
      }
    val expected = Map(
      1 -> 0.301030, 2 -> 0.176091, 3 -> 0.124939, 4 -> 0.096910,
      5 -> 0.079181, 6 -> 0.066947, 7 -> 0.057992, 8 -> 0.051153,
      9 -> 0.045757)
    val expCol = expected.toSeq.sortBy(_._1)
      .foldLeft(lit(null).cast("double")) { case (acc, (d, p)) =>
        when(col("digit") === d, lit(p)).otherwise(acc)
      }
    val counts = df
      .filter(k >= 1L)
      .select(firstDigit.as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .withColumn("obs_p",
        round(col("n").cast("double") / col("__tot"), 6))
      .withColumn("exp_p", expCol)
      .withColumn("abs_dev", round(abs(col("obs_p") - col("exp_p")), 6))
      .select(col("digit"), col("n"), col("obs_p"), col("exp_p"),
        col("abs_dev"))
  }

  /** Two-sample Mann–Whitney U (Wilcoxon rank-sum) — the nonparametric
    * location test next to [[ksTwoSample]]'s shape test in the drift
    * battery: midrank sums with exact tie handling, the tie-corrected
    * normal approximation z, and the rank-biserial effect size
    * r = 2U_B/(n_A·n_B) − 1 (positive → B stochastically larger).
    *
    * Exactness: ranks never materialize per row. On the tie-collapsed
    * value frame, a value's doubled midrank is the INTEGER
    * 2·prev_total + t + 1, so the doubled rank sum 2R_B accumulates in
    * DECIMAL(38,0) exactly (Σ(t³−t) for the tie correction likewise);
    * doubles appear only in μ, σ, z, r at the end.
    *
    * Scale shape: the prefix sums over distinct values run the q115
    * two-level shape — deterministic range buckets, per-bucket keyed
    * windows, a ≤`buckets`-row offset frame — never a global ordered
    * window over the data.
    */
  /** Kruskal–Wallis H — the k-sample extension of [[mannWhitneyU]]:
    * "do ANY of these slices differ in location?" across every group at
    * once (the one-shot screen before pairwise rank tests). Same exact
    * doubled-midrank machinery on the tie-collapsed value frame: per
    * group, 2R_j accumulates in DECIMAL(38,0); H and its tie-corrected
    * form are assembled from the exact sums at the end:
    *
    *   H = 12/(n(n+1)) · Σ R_j²/n_j − 3(n+1),   H_corr = H / C,
    *   C = 1 − Σ(t³−t)/(n³−n).
    *
    * Scale shape: the q115/q259 two-level prefix-sum shape for the
    * distinct-value cumulative counts; groups pivot as one count
    * aggregation keyed on (value, group) — bounded by |distinct values|
    * × |groups|.
    */
  def kruskalWallis(df: DataFrame, valCol: String,
      groupCol: String, buckets: Int = 32): DataFrame = {
    val byVG = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(valCol).cast("double").as("v"), col(groupCol).as("g"))
      .groupBy(col("v"), col("g")).agg(count(lit(1)).as("c"))
    val byVal = byVG.groupBy(col("v")).agg(sum(col("c")).as("t"))
    val bounds = byVal.agg(min(col("v")).as("__lo"),
      max(col("v")).as("__hi"))
    val bucketed = byVal.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("int"))))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.withColumn("__cum_t", sum(col("t")).over(wIn))
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("t")).as("__tt"))
      .withColumn("__off", coalesce(sum(col("__tt")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__off"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val ranked = cum.join(broadcast(offsets), "__bkt")
      .withColumn("__prev", col("__off") + col("__cum_t") - col("t"))
    // per-group doubled rank sums: 2R_j = Σ c·(2·prev + t + 1)
    val perG = byVG.join(ranked.select(col("v"), col("t"), col("__prev")),
        "v")
      .groupBy(col("g"))
      .agg(sum(col("c")).as("n_j"),
        sum(dec(col("c")) *
          (dec(col("__prev")) * lit(2) + dec(col("t")) + lit(1)))
          .as("__r2"))
    val ties = ranked.agg(
      sum(dec(col("t")) * dec(col("t")) * dec(col("t")) - dec(col("t")))
        .as("__ties"),
      sum(col("t")).as("__n"))
    val nD = col("__n").cast("double")
    val h = perG.crossJoin(broadcast(ties))
      .withColumn("__rj", col("__r2").cast("double") / lit(2.0))
      .agg(max(col("__n")).as("n"),
        count(lit(1)).as("n_groups"),
        max(col("__ties")).as("__tsum"),
        // decimal(38,6): R_j²/n_j reaches ~n³ — 10^32 of integer head-
        // room covers any single-cluster corpus this card is sane for
        sum(((col("__rj") * col("__rj") / col("n_j").cast("double")))
          .cast("decimal(38,6)")).cast("double").as("__rsum"))
    h.select(col("n"), col("n_groups"),
        (lit(12.0) / (col("n").cast("double") *
          (col("n").cast("double") + lit(1.0))) * col("__rsum") -
          lit(3.0) * (col("n").cast("double") + lit(1.0))).as("__h"),
        (lit(1.0) - col("__tsum").cast("double") /
          (col("n").cast("double") * col("n").cast("double") *
            col("n").cast("double") - col("n").cast("double")))
          .as("__corr"))
      .select(col("n"), col("n_groups"), round(col("__h"), 6).as("h"),
        round(col("__corr"), 6).as("tie_correction"),
        when(col("__corr") > 0.0, round(col("__h") / col("__corr"), 6))
          .as("h_corrected"))
  }

  /** Friedman test (Friedman 1937): the non-parametric repeated-measures
    * ANOVA — do `treatCol`'s levels differ, once `blockCol`'s baseline
    * is ranked away within each block? Cells are per-(block, treatment)
    * means (DECIMAL sum / count, rounded to 9 so cell values — and thus
    * ranks — are engine-portable); only COMPLETE blocks (all k
    * treatments present) enter, the classical requirement. Within-block
    * average ranks handle ties (min-rank + (t−1)/2), and the statistic
    * carries the standard tie correction:
    *
    *   Q = [12/(nk(k+1))·ΣⱼRⱼ² − 3n(k+1)] / [1 − ΣT/(nk(k²−1))],
    *   T = Σ_ties (t³−t) summed over tie groups in every block.
    *
    * Q ~ χ²(k−1) under H₀. Sits between [[kruskalWallis]] (independent
    * groups) and q313's Wilcoxon signed-rank (k = 2 blocks = pairs).
    *
    * Scale shape: one keyed aggregation to the (block, treatment) cell
    * frame; ranks are windows PARTITIONED BY block (k rows per
    * partition — never a global window); the rest is k-row and
    * single-row aggregation. Exact decimal rank sums (ranks are
    * half-integers).
    */
  def friedmanTest(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    val cells = df
      .filter(col(valCol).isNotNull && col(blockCol).isNotNull &&
        col(treatCol).isNotNull)
      .groupBy(col(blockCol).as("b"), col(treatCol).as("trt"))
      .agg(round(graft.functions.Stats.dsum(col(valCol).cast("double"), 12)
        / count(lit(1)), 9).as("v"))
    val k = cells.agg(countDistinct(col("trt")).as("k")).head().getLong(0)
    require(k >= 2, s"need at least 2 treatments, got $k")
    val complete = cells.groupBy(col("b"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") === k)
      .select(col("b"))
    val c = cells.join(complete, "b")
    val wRank = Window.partitionBy(col("b")).orderBy(col("v"))
    val wTie = Window.partitionBy(col("b"), col("v"))
    val ranked = c
      .withColumn("__t", count(lit(1)).over(wTie))
      .withColumn("__r", rank().over(wRank).cast("double") +
        (col("__t") - lit(1)).cast("double") / lit(2.0))
    val ties = c.groupBy(col("b"), col("v"))
      .agg(count(lit(1)).as("t"))
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("__tsum"))
    val byTrt = ranked.groupBy(col("trt"))
      .agg(graft.functions.Stats.dsum(col("__r"), 1).as("rj"))
    val nRow = complete.agg(count(lit(1)).as("n")).head()
    val n = nRow.getLong(0)
    require(n >= 1, "no complete blocks to test on")
    val nD = n.toDouble
    val kD = k.toDouble
    byTrt
      .agg(graft.functions.Stats.dsum(col("rj") * col("rj"), 2)
        .as("__r2"))
      .crossJoin(broadcast(ties))
      .select(
        lit(n).as("n_blocks"), lit(k).as("k"),
        (lit(12.0) / (nD * kD * (kD + 1.0)) * col("__r2") -
          lit(3.0) * nD * (kD + 1.0)).as("__q"),
        (lit(1.0) - col("__tsum").cast("double") /
          (nD * kD * (kD * kD - 1.0))).as("__corr"))
      .select(col("n_blocks"), col("k"), round(col("__q"), 6).as("q_stat"),
        round(col("__corr"), 6).as("tie_correction"),
        when(col("__corr") > 0.0, round(col("__q") / col("__corr"), 6))
          .as("q_corrected"))
  }

  /** Quade test (1979) — the weighted-blocks companion to
    * [[friedmanTest]]: within-block mid-ranks as in Friedman, but each
    * block is weighted by the mid-rank Q_i of its RANGE across blocks,
    * so blocks where the treatments actually differ carry the decision
    * and flat blocks stop diluting it (the power win over Friedman at
    * small k). S_ij = Q_i·(r_ij − (k+1)/2), S_j = Σ_i S_ij,
    * A = ΣΣ S²_ij, B = Σ_j S²_j / n, F = (n−1)·B/(A−B) on
    * (k−1, (n−1)(k−1)) df. Output: one row per treatment with its S_j
    * and the shared card columns.
    *
    * Exactness: cell means are the Friedman round-9 contract; ranks,
    * block-range ranks, and S_ij live on the .25 grid (exactly
    * representable doubles), accumulated via exact decimal sums —
    * partition-order-free and engine-portable. Scale shape: same as
    * Friedman (cell aggregation, windows over the per-block and
    * per-(block-count) frames only) plus one window over the n-block
    * range frame.
    */
  def quadeTest(df: DataFrame, blockCol: String, treatCol: String,
      valCol: String): DataFrame = {
    import graft.functions.Stats.dsum
    val cells = df
      .filter(col(valCol).isNotNull && col(blockCol).isNotNull &&
        col(treatCol).isNotNull)
      .groupBy(col(blockCol).as("b"), col(treatCol).as("trt"))
      .agg(round(dsum(col(valCol).cast("double"), 12)
        / count(lit(1)), 9).as("v"))
    val k = cells.agg(countDistinct(col("trt")).as("k")).head().getLong(0)
    require(k >= 2, s"need at least 2 treatments, got $k")
    val complete = cells.groupBy(col("b"))
      .agg(count(lit(1)).as("__c")).filter(col("__c") === k)
      .select(col("b"))
    val c = cells.join(complete, "b")
    val wRank = Window.partitionBy(col("b")).orderBy(col("v"))
    val wTie = Window.partitionBy(col("b"), col("v"))
    val ranked = c
      .withColumn("__t", count(lit(1)).over(wTie))
      .withColumn("__r", rank().over(wRank).cast("double") +
        (col("__t") - lit(1)).cast("double") / lit(2.0))
    val ranges = c.groupBy(col("b"))
      .agg((max(col("v")) - min(col("v"))).as("__rg"))
    val wQ = Window.orderBy(col("__rg"))
    val wQTie = Window.partitionBy(col("__rg"))
    val blockW = ranges
      .withColumn("__qt", count(lit(1)).over(wQTie))
      .withColumn("__q", rank().over(wQ).cast("double") +
        (col("__qt") - lit(1)).cast("double") / lit(2.0))
      .select(col("b"), col("__q"))
    val nRow = complete.agg(count(lit(1)).as("n")).head()
    val n = nRow.getLong(0)
    require(n >= 2, "need at least 2 complete blocks")
    val sij = ranked.join(broadcast(blockW), "b")
      .withColumn("__s",
        col("__q") * (col("__r") - lit((k + 1).toDouble / 2.0)))
    val byTrt = sij.groupBy(col("trt"))
      .agg(dsum(col("__s"), 2).as("s_j"),
        dsum(col("__s") * col("__s"), 4).as("__sii"))
    val card = byTrt.agg(
      dsum(col("__sii"), 4).as("__a"),
      dsum(col("s_j") * col("s_j"), 4).as("__b2"))
      .select(col("__a"),
        (col("__b2") / lit(n.toDouble)).as("__b"))
    val nD = n.toDouble
    byTrt.crossJoin(broadcast(card))
      .select(col("trt"), round(col("s_j"), 6).as("s_j"),
        lit(n).as("n_blocks"), lit(k).as("k"),
        round(col("__a"), 6).as("a_stat"),
        round(col("__b"), 6).as("b_stat"),
        when(col("__a") > col("__b"),
          round(lit(nD - 1.0) * col("__b") / (col("__a") - col("__b")),
            6)).as("f_stat"),
        lit(k - 1).as("df1"), lit((n - 1) * (k - 1)).as("df2"))
      .orderBy(col("trt"))
  }

  def mannWhitneyU(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    // NULL values carry no rank — drop them (the kruskalWallis
    // convention), else they enter n_a/n_b, rank sums, and the tie
    // correction as a null 'value' in the tie-collapsed frame.
    val v = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"),
        (col(groupCol) === groupA).as("__is_a"))
    val byVal = v.groupBy(col("v"))
      .agg(
        sum(when(col("__is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__is_a"), 1L).otherwise(0L)).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val bounds = byVal.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val bucketed = byVal.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("int"))))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.withColumn("__cum_t", sum(col("t")).over(wIn))
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("t")).as("__tt"))
      .withColumn("__off", coalesce(sum(col("__tt")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__off"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val prev = col("__off") + col("__cum_t") - col("t")
    val agg = cum.join(broadcast(offsets), "__bkt")
      .agg(
        sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        // 2·R_B = Σ c_B·(2·prev + t + 1): exact doubled midrank mass
        sum(dec(col("cb")) * (dec(prev) * lit(2) + dec(col("t")) + lit(1)))
          .as("__r2b"),
        sum(dec(col("t")) * dec(col("t")) * dec(col("t")) - dec(col("t")))
          .as("__ties"),
        sum(when(col("t") > 1L, 1L).otherwise(0L)).as("n_tied_values"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    // U_B = R_B − n_B(n_B+1)/2, kept doubled-exact until this division
    val ub = (col("__r2b").cast("double") -
      nb * (nb + lit(1.0))) / lit(2.0)
    val mu = na * nb / lit(2.0)
    val sigma = sqrt(na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("__ties").cast("double") /
        (n * (n - lit(1.0)))))
    agg.select(
      col("n_a"), col("n_b"), col("n_tied_values"),
      round(ub, 6).as("u_b"),
      round(mu, 6).as("mu_u"),
      round(sigma, 6).as("sigma_u"),
      round((ub - mu) / sigma, 6).as("z"),
      round(ub * lit(2.0) / (na * nb) - lit(1.0), 6).as("rank_biserial"))
  }

  /** Welch's unequal-variance two-sample t-test (Welch 1947) — the
    * parametric MEAN-shift member of the drift battery next to
    * [[mannWhitneyU]]'s rank test and [[ksTwoSample]]'s shape test:
    * t = (x̄_A − x̄_B)/√(s²_A/n_A + s²_B/n_B) with the
    * Welch–Satterthwaite degrees of freedom. No pooled-variance
    * assumption, so a drifted variance cannot masquerade as a mean
    * shift.
    *
    * Exactness: per-group Σx and Σx² accumulate as exact per-row
    * DECIMAL casts (the [[graft.functions.Stats.dsum]] contract —
    * `scale` must cover the value's decimal precision, `scale2` its
    * square's), so every moment is partition-order-free; doubles
    * appear only in the mean/variance/t/df assembly at the end, in
    * one fixed parenthesization both engines replay.
    *
    * Scale shape: ONE conditional aggregation over the filtered scan —
    * no shuffle wider than a single 1-row frame, no window, no join.
    */
  def welchTTest(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, scale: Int = 2,
      scale2: Int = 4): DataFrame =
    welchFromMoments(welchMoments(df, valCol, groupCol, groupA, groupB,
      scale, scale2))

  /** The additive moment state behind [[welchTTest]] — counts and exact
    * per-row decimal sums of v and v² per group, in one conditional
    * aggregation. Every column is a sum, so the frame is streamable in
    * complete mode and any snapshot finishes via [[welchFromMoments]]
    * (the batch ≡ stream contract of the streaming-sketch family).
    */
  def welchMoments(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, scale: Int = 2,
      scale2: Int = 4): DataFrame = {
    val v = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"),
        (col(groupCol) === groupA).as("__is_a"))
    v.agg(
      sum(when(col("__is_a"), 1L).otherwise(0L)).as("n_a"),
      sum(when(!col("__is_a"), 1L).otherwise(0L)).as("n_b"),
      sum(when(col("__is_a"), col("v")).cast(s"decimal(28,$scale)"))
        .cast("double").as("__sa"),
      sum(when(!col("__is_a"), col("v")).cast(s"decimal(28,$scale)"))
        .cast("double").as("__sb"),
      sum(when(col("__is_a"), col("v") * col("v"))
        .cast(s"decimal(38,$scale2)")).cast("double").as("__qa"),
      sum(when(!col("__is_a"), col("v") * col("v"))
        .cast(s"decimal(38,$scale2)")).cast("double").as("__qb"))
  }

  /** Finish a [[welchMoments]] frame into the Welch report — the one
    * fixed double parenthesization both engines (and the streaming
    * twin) replay.
    */
  def welchFromMoments(moments: DataFrame): DataFrame = {
    val agg = moments.filter(col("n_a") > 1 && col("n_b") > 1)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val va = (col("__qa") - col("__sa") * col("__sa") / naD) /
      (naD - lit(1.0))
    val vb = (col("__qb") - col("__sb") * col("__sb") / nbD) /
      (nbD - lit(1.0))
    val proj = agg.select(col("n_a"), col("n_b"),
      (col("__sa") / naD).as("__ma"), (col("__sb") / nbD).as("__mb"),
      va.as("__va"), vb.as("__vb"))
    val sea = col("__va") / col("n_a").cast("double")
    val seb = col("__vb") / col("n_b").cast("double")
    val se2 = sea + seb
    proj.select(
      col("n_a"), col("n_b"),
      round(col("__ma"), 6).as("mean_a"),
      round(col("__mb"), 6).as("mean_b"),
      round(col("__va"), 6).as("var_a"),
      round(col("__vb"), 6).as("var_b"),
      round((col("__ma") - col("__mb")) / sqrt(se2), 6).as("t_welch"),
      round(se2 * se2 /
        (sea * sea / (col("n_a").cast("double") - lit(1.0)) +
         seb * seb / (col("n_b").cast("double") - lit(1.0))), 6)
        .as("df_welch"))
  }

  /** CUSUM change-point scan (Page 1954 / the Brownian-bridge form) over
    * a per-day mass series: the largest standardized deviation of the
    * cumulative daily total from its linear expectation,
    *
    *   dev_k = C_k − k·S/D,   stat = max_k |dev_k| / (σ̂_T·√D),
    *
    * with the (earliest) argmax day reported as the change point — the
    * level-shift detector that says WHEN an ingest mix moved, where
    * [[psi]] only says THAT it moved. Days are observed days (a gap day
    * carries no evidence about level).
    *
    * Exactness: daily totals and their cumulative prefix accumulate as
    * exact DECIMALs (order-free); σ̂_T comes from per-day decimal-cast
    * square contributions on identical doubles (the [[RobustStats
    * .chiSquare]] contribution convention); every dev_k is assembled
    * per-row from exact terms — no running double sum anywhere, so no
    * engine's window-accumulation order can perturb the statistic.
    *
    * Scale shape: one (day) count/sum aggregation over the scan; all
    * later arithmetic lives on the bounded day frame (≤ calendar span),
    * where a single-partition ordered window is driver-scale by
    * construction — the same bounded-frame exemption as the per-bucket
    * offset frames above.
    */
  def cusumChangePoint(df: DataFrame, tsCol: String, valCol: String,
      scale: Int = 2): DataFrame =
    cusumFromDaily(cusumDailyMasses(df, tsCol, valCol, scale))

  /** The additive state behind [[cusumChangePoint]]: exact decimal
    * per-day masses — one (day) aggregation whose rows are pure sums,
    * so the frame is streamable in complete mode and any snapshot
    * finishes via [[cusumFromDaily]] (the batch ≡ stream contract).
    */
  def cusumDailyMasses(df: DataFrame, tsCol: String, valCol: String,
      scale: Int = 2): DataFrame =
    df.filter(col(valCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(sum(col(valCol).cast(s"decimal(28,$scale)")).as("td"))

  /** Finish a [[cusumDailyMasses]] frame into the CUSUM report — all
    * arithmetic on the bounded day frame, no second data scan.
    */
  def cusumFromDaily(daily: DataFrame): DataFrame = {
    val wCum = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wK = Window.orderBy(col("day"))
    val cum = daily
      .withColumn("ck", sum(col("td")).over(wCum))
      .withColumn("k", row_number().over(wK).cast("long"))
    val tot = daily.agg(
      sum(col("td")).cast("double").as("__s"),
      sum((col("td").cast("double") * col("td").cast("double"))
        .cast("decimal(38,6)")).cast("double").as("__q"),
      count(lit(1)).as("__d"))
    val dD = col("__d").cast("double")
    val sigma = sqrt((col("__q") - col("__s") * col("__s") / dD) / dD)
    val dev = cum.crossJoin(broadcast(tot))
      .withColumn("__dev",
        col("ck").cast("double") -
          col("k").cast("double") * (col("__s") / dD))
      .withColumn("__sigma", sigma)
      .filter(col("__sigma") > 0.0)
    dev
      .orderBy(abs(col("__dev")).desc, col("day"))
      .limit(1)
      .select(
        col("__d").as("n_days"),
        round(col("__s"), 6).as("total_mass"),
        round(col("__sigma"), 6).as("sigma_daily"),
        round(abs(col("__dev")) / (col("__sigma") * sqrt(dD)), 6)
          .as("cusum_stat"),
        col("day").as("changepoint_day"),
        round(col("k").cast("double") / dD, 6).as("changepoint_frac"))
  }

  /** Wald sequential probability ratio test (Wald 1945) for a mean
    * shift in the daily mass series — the SEQUENTIAL member of the
    * drift battery: where CUSUM ([[cusumChangePoint]]) retrospectively
    * locates a change, SPRT walks the monitoring window day by day and
    * says WHEN the evidence first sufficed to call drift (or to accept
    * stability), with α/β error control built into the stopping bounds
    * ln((1−β)/α) and ln(β/(1−α)). Baseline μ₀/σ₀ come from the first
    * half of the days; the tested alternative is the standard
    * one-sigma shift μ₁ = μ₀ + σ₀; the log-likelihood ratio after k
    * monitored days reduces to
    *
    *   LLR_k = (δ/σ₀²)·(C_k − k·μ₀ − k·δ/2),   δ = σ₀,
    *
    * with C_k the EXACT decimal prefix mass of the monitoring window —
    * no running double sum (the [[cusumChangePoint]] discipline), so
    * the first crossing is engine-deterministic.
    *
    * Scale shape: one (day) aggregation over the scan; the baseline
    * stats, the LLR walk and the crossing scan all live on the bounded
    * day frame.
    */
  def sprtMeanShift(df: DataFrame, tsCol: String, valCol: String,
      alpha: Double = 0.05, beta: Double = 0.05,
      scale: Int = 2): DataFrame = {
    val daily = cusumDailyMasses(df, tsCol, valCol, scale)
    val wK = Window.orderBy(col("day"))
    val idx = daily.withColumn("i", row_number().over(wK).cast("long"))
    val d = idx.agg(count(lit(1)).as("__d"))
    val split = idx.crossJoin(broadcast(d))
      .withColumn("__split", floor(col("__d") / 2))
      .filter(col("__split") >= 2 && col("__d") - col("__split") >= 1)
    val base = split.filter(col("i") <= col("__split"))
      .agg(max(col("__split")).as("n_base"),
        max(col("__d")).as("n_days"),
        sum(col("td")).cast("double").as("__s"),
        sum((col("td").cast("double") * col("td").cast("double"))
          .cast("decimal(38,6)")).cast("double").as("__q"))
    val nbD = col("n_base").cast("double")
    val stats = base.select(col("n_days"), col("n_base"),
        (col("__s") / nbD).as("__mu0"),
        sqrt((col("__q") - col("__s") * col("__s") / nbD) /
          (nbD - lit(1.0))).as("__sigma0"))
      .filter(col("__sigma0") > 0.0)
    val monitor = split.filter(col("i") > col("__split"))
      .withColumn("k", (col("i") - col("__split")).cast("long"))
      .withColumn("ck", sum(col("td")).over(
        Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(stats))
    val kD = col("k").cast("double")
    val delta = col("__sigma0")
    val llr = (delta / (col("__sigma0") * col("__sigma0"))) *
      (col("ck").cast("double") - kD * col("__mu0") -
        kD * (delta / lit(2.0)))
    val lnA = log((lit(1.0) - lit(beta)) / lit(alpha))
    val lnB = log(lit(beta) / (lit(1.0) - lit(alpha)))
    val walked = monitor
      .withColumn("__llr", llr)
      .withColumn("__status",
        when(col("__llr") >= lnA, lit("drift"))
          .when(col("__llr") <= lnB, lit("no_drift")))
    val firstCross = walked
      .agg(min(when(col("__status").isNotNull, col("k"))).as("__kdec"))
    val lastK = walked.agg(max(col("k")).as("__kmax"))
    val finalRow = walked.crossJoin(broadcast(lastK))
      .filter(col("k") === col("__kmax"))
      .select(col("n_days"), col("n_base"),
        round(col("__mu0"), 6).as("mu0"),
        round(col("__sigma0"), 6).as("sigma0"),
        col("__kmax").as("n_monitor"),
        round(col("__llr"), 6).as("llr_final"))
    val decision = walked.crossJoin(broadcast(firstCross))
      .filter(col("k") === col("__kdec"))
      .select(col("k").as("k_decision"), col("day").as("decision_day"),
        col("__status").as("decision"))
    finalRow.join(broadcast(decision), lit(true), "left")
      .select(col("n_days"), col("n_base"), col("n_monitor"),
        col("mu0"), col("sigma0"), col("llr_final"),
        coalesce(col("decision"), lit("undecided")).as("decision"),
        col("k_decision"), col("decision_day"))
  }

  /** Benjamini–Hochberg FDR screen (Benjamini & Hochberg 1995) over the
    * per-group one-vs-rest Welch z battery — the multiple-comparisons
    * discipline a per-segment drift monitor needs: test EVERY segment's
    * mean against the rest, then control the expected fraction of false
    * alarms at `alpha` instead of alarming on raw p < 0.05 across
    * hundreds of segments. Rejections are ranks ≤ k* where
    * k* = max{k : p₍ₖ₎ ≤ α·k/m}.
    *
    * p-values use the Abramowitz–Stegun 26.2.17 polynomial for the
    * normal tail (2·φ(|z|)·poly(t), |err| < 7.5e-8) — an APPROXIMATION
    * by construction, but a fixed-shape double computation with shared
    * literal coefficients, so both engines produce the identical value
    * and the gate checks it bit-for-bit. Group and rest moments come
    * from ONE exact-decimal aggregation (rest = totals − group, decimal
    * subtraction, exact).
    *
    * Scale shape: one (group) aggregation over the scan; ranking and
    * the BH threshold live on the |groups|-row frame.
    */
  def bhFdrCard(df: DataFrame, valCol: String, groupCol: String,
      alpha: Double = 0.05, scale: Int = 2, scale2: Int = 4): DataFrame =
    bhFdrFromMoments(
      bhFdrMoments(df, valCol, groupCol, scale, scale2), alpha, groupCol)

  /** The additive per-group moment state behind [[bhFdrCard]] — counts
    * and exact per-row decimal sums of v and v², streamable in complete
    * mode ([[welchMoments]]' contract, one row per group); any snapshot
    * finishes via [[bhFdrFromMoments]].
    */
  def bhFdrMoments(df: DataFrame, valCol: String, groupCol: String,
      scale: Int = 2, scale2: Int = 4): DataFrame = {
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    d.groupBy(col("g")).agg(
      count(lit(1)).as("n_g"),
      sum(col("v").cast(s"decimal(28,$scale)")).as("__sd"),
      sum((col("v") * col("v")).cast(s"decimal(38,$scale2)")).as("__qd"))
  }

  /** Finish a [[bhFdrMoments]] frame into the BH-FDR report — the one
    * fixed shape the batch, streaming, and SQL paths all replay.
    */
  def bhFdrFromMoments(grp: DataFrame, alpha: Double = 0.05,
      outName: String = "g"): DataFrame = {
    val groupCol = outName
    val tot = grp.agg(sum(col("n_g")).as("__n"),
      sum(col("__sd")).as("__st"), sum(col("__qd")).as("__qt"))
    val ngD = col("n_g").cast("double")
    val nrD = (col("__n") - col("n_g")).cast("double")
    val sa = col("__sd").cast("double")
    val qa = col("__qd").cast("double")
    val sr = (col("__st") - col("__sd")).cast("double")
    val qr = (col("__qt") - col("__qd")).cast("double")
    val ma = sa / ngD
    val mr = sr / nrD
    val va = (qa - sa * sa / ngD) / (ngD - lit(1.0))
    val vr = (qr - sr * sr / nrD) / (nrD - lit(1.0))
    val se2 = va / ngD + vr / nrD
    val z = (ma - mr) / sqrt(se2)
    val az = abs(z)
    val t = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = t * (lit(0.319381530) + t * (lit(-0.356563782) +
      t * (lit(1.781477937) + t * (lit(-1.821255978) +
        t * lit(1.330274429)))))
    val phi = exp(-az * az / lit(2.0)) / lit(2.5066282746310002)
    val scored = grp.crossJoin(broadcast(tot))
      .filter(col("n_g") > 1 && (col("__n") - col("n_g")) > 1)
      .filter(se2 > 0.0)
      .select(col("g"), col("n_g"),
        round(ma, 6).as("mean_g"), round(mr, 6).as("mean_rest"),
        round(z, 6).as("z"),
        round(lit(2.0) * phi * poly, 9).as("p_value"))
    val m = scored.agg(count(lit(1)).as("__m"))
    val wR = Window.orderBy(col("p_value"), col("g"))
    val ranked = scored
      .withColumn("rank", row_number().over(wR).cast("long"))
      .crossJoin(broadcast(m))
      .withColumn("bh_critical", round(lit(alpha) *
        col("rank").cast("double") / col("__m").cast("double"), 9))
    val kstar = ranked
      .agg(coalesce(max(when(col("p_value") <= col("bh_critical"),
        col("rank"))), lit(0L)).as("__k"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("g").as(groupCol), col("n_g"), col("mean_g"),
        col("mean_rest"), col("z"), col("p_value"), col("rank"),
        col("bh_critical"), (col("rank") <= col("__k")).as("rejected"))
      .orderBy(col("rank"))
  }

  /** Pairwise Mann–Whitney z matrix with Benjamini–Hochberg control —
    * the post-hoc step after [[kruskalWallis]] says "something
    * differs": WHICH segment pairs differ in location, with the
    * G(G−1)/2 simultaneous tests FDR-controlled (the Dunn-test shape,
    * on exact midranks). ALL pairs come from ONE pass: per-group
    * zero-filled cumulative counts on the shared distinct-value spine
    * give every pair's doubled rank sums by a single spine self-join —
    * no per-pair rescan of the data.
    *
    * Exactness: [[mannWhitneyU]]'s doubled-midrank decimals per pair;
    * the normal tail is the shared Abramowitz–Stegun polynomial
    * ([[bhFdrCard]]); ranks and the BH threshold live on the pair
    * frame.
    *
    * Scale shape: one (value, group) count aggregation over the scan;
    * the spine × groups frame is |distinct values|·G rows (bounded by
    * the value domain — 2-decimal measures cap it independently of row
    * count), the pair join |distinct values|·G² — all far from data
    * scale.
    */
  def pairwiseRankMatrix(df: DataFrame, valCol: String, groupCol: String,
      alpha: Double = 0.05): DataFrame = {
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("v"))
    val byVG = d.groupBy(col("v"), col("g")).agg(count(lit(1)).as("c"))
    val spine = byVG.select(col("v")).distinct()
    val groups = byVG.select(col("g")).distinct()
    val full = spine.crossJoin(broadcast(groups))
      .join(byVG, Seq("v", "g"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val f = full.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("prev", col("cum") - col("c"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val pairRows = f.select(col("v"), col("g").as("g_a"),
        col("c").as("ca"), col("prev").as("pa"))
      .join(f.select(col("v"), col("g").as("g_b"),
        col("c").as("cb"), col("prev").as("pb")), "v")
      .filter(col("g_a") < col("g_b"))
    val t = col("ca") + col("cb")
    val agg = pairRows.groupBy(col("g_a"), col("g_b"))
      .agg(
        sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(dec(col("cb")) *
          (dec(col("pa") + col("pb")) * lit(2) + dec(t) + lit(1)))
          .as("__r2b"),
        sum(dec(t) * dec(t) * dec(t) - dec(t)).as("__ties"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val n = na + nb
    val ub = (col("__r2b").cast("double") - nb * (nb + lit(1.0))) /
      lit(2.0)
    val mu = na * nb / lit(2.0)
    val sigma = sqrt(na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("__ties").cast("double") /
        (n * (n - lit(1.0)))))
    val z = (ub - mu) / sigma
    val az = abs(z)
    val tPoly = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
    val poly = tPoly * (lit(0.319381530) + tPoly * (lit(-0.356563782) +
      tPoly * (lit(1.781477937) + tPoly * (lit(-1.821255978) +
        tPoly * lit(1.330274429)))))
    val phi = exp(-az * az / lit(2.0)) / lit(2.5066282746310002)
    val scored = agg.filter(sigma > 0.0)
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"),
        round(z, 6).as("z"),
        round(lit(2.0) * phi * poly, 9).as("p_value"))
    val m = scored.agg(count(lit(1)).as("__m"))
    val wR = Window.orderBy(col("p_value"), col("g_a"), col("g_b"))
    val ranked = scored
      .withColumn("rank", row_number().over(wR).cast("long"))
      .crossJoin(broadcast(m))
      .withColumn("bh_critical", round(lit(alpha) *
        col("rank").cast("double") / col("__m").cast("double"), 9))
    val kstar = ranked
      .agg(coalesce(max(when(col("p_value") <= col("bh_critical"),
        col("rank"))), lit(0L)).as("__k"))
    ranked.crossJoin(broadcast(kstar))
      .select(col("g_a"), col("g_b"), col("n_a"), col("n_b"), col("z"),
        col("p_value"), col("rank"), col("bh_critical"),
        (col("rank") <= col("__k")).as("rejected"))
      .orderBy(col("rank"))
  }

  /** Jonckheere–Terpstra ordered-alternative test (Jonckheere 1954):
    * does `valCol` TREND across the ordered levels of `groupCol`
    * (ordered by its natural `<`)? J = Σ_{a<b} U_ab — the sum of
    * pairwise Mann–Whitney counts over ordered group pairs, ties at ½
    * — is far more powerful than [[kruskalWallis]] when the
    * alternative is monotone. All pairs come from ONE pass on the
    * [[pairwiseRankMatrix]] spine: per-group zero-filled cumulative
    * counts give every pair's doubled U by a single spine self-join;
    * 2J stays an exact BIGINT-decimal until the final halving. The
    * null moments carry the full Hollander–Wolfe tie correction:
    * E[J] = (N² − Σnᵢ²)/4 and Var[J] = A/72 + B/[36N(N−1)(N−2)] +
    * C/[8N(N−1)] with A, B, C the standard group-size / tie-group
    * polynomial sums — every one an exact integer aggregate.
    *
    * Scale shape: one (value, group) count aggregation; the spine ×
    * groups frame is |distinct values|·G rows, the pair join
    * |distinct values|·G² — never data-scale.
    */
  def jonckheereTerpstra(df: DataFrame, valCol: String,
      groupCol: String): DataFrame = {
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(valCol).cast("double").as("v"))
    val byVG = d.groupBy(col("v"), col("g")).agg(count(lit(1)).as("c"))
    val spine = byVG.select(col("v")).distinct()
    val groups = byVG.select(col("g")).distinct()
    val full = spine.crossJoin(broadcast(groups))
      .join(byVG, Seq("v", "g"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
    val wCum = Window.partitionBy(col("g")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val f = full.withColumn("cum", sum(col("c")).over(wCum))
      .withColumn("prev", col("cum") - col("c"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    // 2·J_ab mass at value v: c_b·(2·prev_a + c_a) — below-pairs twice
    // plus tied pairs once
    val j2 = f.select(col("v"), col("g").as("g_a"),
        col("c").as("ca"), col("prev").as("pa"))
      .join(f.select(col("v"), col("g").as("g_b"), col("c").as("cb")), "v")
      .filter(col("g_a") < col("g_b"))
      .agg(sum(dec(col("cb")) * (dec(col("pa")) * lit(2) + dec(col("ca"))))
        .cast("long").as("j2"))
    val sizes = byVG.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
      .agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("n_g") * col("n_g")).as("__n2"),
        sum(col("n_g") * (col("n_g") - 1) *
          (lit(2) * col("n_g") + 5)).as("__na"),
        sum(col("n_g") * (col("n_g") - 1) * (col("n_g") - 2)).as("__nb"),
        sum(col("n_g") * (col("n_g") - 1)).as("__nc"))
    val ties = byVG.groupBy(col("v")).agg(sum(col("c")).as("t"))
      .agg(sum(col("t") * (col("t") - 1) *
          (lit(2) * col("t") + 5)).as("__ta"),
        sum(col("t") * (col("t") - 1) * (col("t") - 2)).as("__tb"),
        sum(col("t") * (col("t") - 1)).as("__tc"))
    val nD = col("n").cast("double")
    val a = nD * (nD - 1.0) * (lit(2.0) * nD + 5.0) -
      col("__na").cast("double") - col("__ta").cast("double")
    val b = col("__nb").cast("double") * col("__tb").cast("double")
    val cc = col("__nc").cast("double") * col("__tc").cast("double")
    val varJ = a / lit(72.0) +
      b / (lit(36.0) * nD * (nD - 1.0) * (nD - 2.0)) +
      cc / (lit(8.0) * nD * (nD - 1.0))
    val ej = (nD * nD - col("__n2").cast("double")) / lit(4.0)
    val jD = col("j2").cast("double") / lit(2.0)
    j2.crossJoin(broadcast(sizes)).crossJoin(broadcast(ties))
      .select(col("n"), col("k"),
        round(jD, 1).as("j_stat"),
        round(ej, 6).as("e_j"),
        round(varJ, 6).as("var_j"),
        when(varJ > 0.0, round((jD - ej) / sqrt(varJ), 6)).as("z"))
  }

  /** One-way ANOVA F over per-group means (Fisher): does ANY group's
    * mean differ — the k-sample parametric screen before pairwise
    * Welch tests, with η² = SSB/SST as the effect size (the variance
    * share group membership explains — at 100 TB an F-test rejects for
    * trivial effects; η² says whether to care, the [[RobustStats
    * .contingencyAssociation]] lesson for means).
    *
    * Exactness: one exact-decimal (group) moment aggregation;
    * SSB = Σ S_g²/n_g − S²/N via the ANOVA identity with per-group
    * decimal-cast contributions; SSW = Q − Σ S_g²/n_g. Fixed double
    * shapes thereafter.
    *
    * Scale shape: one (group) aggregation over the scan; everything
    * after on the |groups|-row frame.
    */
  def anovaF(df: DataFrame, valCol: String, groupCol: String,
      scale: Int = 2, scale2: Int = 4): DataFrame = {
    val grp = bhFdrMoments(df, valCol, groupCol, scale, scale2)
    val agg = grp.agg(
        sum(col("n_g")).as("n"),
        count(lit(1)).as("k"),
        sum(col("__sd")).cast("double").as("__s"),
        sum(col("__qd")).cast("double").as("__q"),
        sum(((col("__sd").cast("double") * col("__sd").cast("double")) /
          col("n_g").cast("double")).cast("decimal(38,6)"))
          .cast("double").as("__sb"))
      .filter(col("k") > 1 && col("n") > col("k"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("__sb") - col("__s") * col("__s") / nD
    val ssw = col("__q") - col("__sb")
    agg.select(col("n"), col("k"),
      round(ssb, 6).as("ss_between"),
      round(ssw, 6).as("ss_within"),
      when(ssw > 0.0,
        round((ssb / (kD - lit(1.0))) / (ssw / (nD - kD)), 6))
        .as("f_stat"),
      round(ssb / (ssb + ssw), 6).as("eta_squared"))
  }

  /** ANOVA effect-size card: η² (variance share — biased up in small
    * samples), ω² (Hays 1963 — the near-unbiased estimate), ε²
    * (Kelley 1935), and Cohen's f — the MAGNITUDE companions to
    * [[anovaF]]'s significance (a huge n makes tiny effects
    * "significant"; these say whether the group structure matters).
    * Same exact decimal group moments, one fixed double assembly.
    */
  def anovaEffectSizes(df: DataFrame, valCol: String, groupCol: String,
      scale: Int = 2, scale2: Int = 4): DataFrame = {
    val grp = bhFdrMoments(df, valCol, groupCol, scale, scale2)
    val agg = grp.agg(
        sum(col("n_g")).as("n"),
        count(lit(1)).as("k"),
        sum(col("__sd")).cast("double").as("__s"),
        sum(col("__qd")).cast("double").as("__q"),
        sum(((col("__sd").cast("double") * col("__sd").cast("double")) /
          col("n_g").cast("double")).cast("decimal(38,6)"))
          .cast("double").as("__sb"))
      .filter(col("k") > 1 && col("n") > col("k"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("__sb") - col("__s") * col("__s") / nD
    val ssw = col("__q") - col("__sb")
    val sst = ssb + ssw
    val msw = ssw / (nD - kD)
    val eta = ssb / sst
    agg.select(col("n"), col("k"),
      round(eta, 6).as("eta_squared"),
      round((ssb - (kD - lit(1.0)) * msw) / (sst + msw), 6)
        .as("omega_squared"),
      round((ssb - (kD - lit(1.0)) * msw) / sst, 6).as("epsilon_squared"),
      when(eta < 1.0, round(sqrt(eta / (lit(1.0) - eta)), 6))
        .as("cohens_f"))
  }

  /** Levene's variance-equality test (Levene 1960, mean-centered): the
    * VARIANCE member of the drift battery — [[welchTTest]] sees mean
    * shifts, [[ksTwoSample]] shapes, [[mannWhitneyU]] locations; this
    * one alarms when a segment's SPREAD moved (tails widening is how
    * data-quality rot usually shows first). Mechanically: one-way
    * ANOVA ([[anovaF]]'s identity) on z = |x − x̄_g|.
    *
    * Exactness: pass 1 — exact decimal group means, rounded to 9 (the
    * NB parameter convention) and broadcast back; pass 2 — z moments
    * accumulate as decimal casts of identical per-row doubles; the F
    * assembly is fixed-shape.
    *
    * Scale shape: two scans (means, then centered moments) with a
    * broadcast join between — no shuffle of the data beyond the two
    * keyed aggregations.
    */
  def leveneTest(df: DataFrame, valCol: String, groupCol: String,
      scale: Int = 2): DataFrame = {
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    val means = d.groupBy(col("g"))
      .agg(count(lit(1)).as("__nm"),
        sum(col("v").cast(s"decimal(28,$scale)")).cast("double").as("__sm"))
      .filter(col("__nm") > 1)
      .select(col("g"),
        round(col("__sm") / col("__nm").cast("double"), 9).as("__m"))
    val z = d.join(broadcast(means), "g")
      .withColumn("__z", abs(col("v") - col("__m")))
    val grp = z.groupBy(col("g")).agg(
      count(lit(1)).as("n_g"),
      sum(col("__z").cast("decimal(38,8)")).as("__sd"),
      sum((col("__z") * col("__z")).cast("decimal(38,10)")).as("__qd"))
    val agg = grp.agg(
        sum(col("n_g")).as("n"),
        count(lit(1)).as("k"),
        sum(col("__sd")).cast("double").as("__s"),
        sum(col("__qd")).cast("double").as("__q"),
        sum(((col("__sd").cast("double") * col("__sd").cast("double")) /
          col("n_g").cast("double")).cast("decimal(38,6)"))
          .cast("double").as("__sb"))
      .filter(col("k") > 1 && col("n") > col("k"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val ssb = col("__sb") - col("__s") * col("__s") / nD
    val ssw = col("__q") - col("__sb")
    agg.select(col("n"), col("k"),
      round(col("__s") / nD, 6).as("mean_abs_dev"),
      when(ssw > 0.0,
        round((ssb / (kD - lit(1.0))) / (ssw / (nD - kD)), 6))
        .as("f_levene"))
  }

  /** Bartlett's test (Bartlett 1937) for variance homogeneity across
    * groups — the PARAMETRIC complement to [[leveneTest]] (sharper
    * under near-normality, fragile to heavy tails; running both is the
    * classical protocol):
    *
    *   T = [(N−k)·ln s_p² − Σ(nᵢ−1)·ln sᵢ²] /
    *       [1 + (Σ 1/(nᵢ−1) − 1/(N−k)) / (3(k−1))]  ~ χ²(k−1)
    *
    * Exactness: per-group variances come from exact DECIMAL first/
    * second moments in one fixed double shape and are rounded to 9 —
    * ln then runs on identical double inputs in both engines (the
    * proven exp/ln contract). Every cross-group Σ — (nᵢ−1)sᵢ²,
    * (nᵢ−1)·ln sᵢ², 1/(nᵢ−1) — is rounded per-term and DECIMAL-summed,
    * so group accumulation order cannot move the statistic.
    * Zero-variance or singleton groups drop (ln s² undefined) — k and
    * N count the RETAINED groups.
    *
    * Scale shape: one keyed aggregation over the scan, then arithmetic
    * on the |groups|-row frame.
    */
  def bartlettTest(df: DataFrame, valCol: String, groupCol: String,
      scale: Int = 2): DataFrame = {
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
    val grp = d.groupBy(col("g"))
      .agg(count(lit(1)).as("n_g"),
        sum(col("v").cast(s"decimal(28,$scale)")).cast("double").as("__s"),
        sum((col("v") * col("v")).cast(s"decimal(38,${2 * scale})"))
          .cast("double").as("__q"))
      .filter(col("n_g") > 1)
    val ngD = col("n_g").cast("double")
    val withVar = grp
      .withColumn("__v",
        round((col("__q") - col("__s") * col("__s") / ngD) /
          (ngD - 1.0), 9))
      .filter(col("__v") > 0.0)
    val agg = withVar.agg(
        sum(col("n_g")).as("n"),
        count(lit(1)).as("k"),
        sum(round((ngD - 1.0) * col("__v"), 6)
          .cast("decimal(38,6)")).cast("double").as("__ssw"),
        sum(round((ngD - 1.0) * log(col("__v")), 9)
          .cast("decimal(38,9)")).cast("double").as("__slnv"),
        sum(round(lit(1.0) / (ngD - 1.0), 12)
          .cast("decimal(38,12)")).cast("double").as("__sinv"))
      .filter(col("k") > 1 && col("n") > col("k"))
    val nD = col("n").cast("double")
    val kD = col("k").cast("double")
    val sp2 = round(col("__ssw") / (nD - kD), 9)
    val num = (nD - kD) * log(sp2) - col("__slnv")
    val den = lit(1.0) +
      (col("__sinv") - lit(1.0) / (nD - kD)) / (lit(3.0) * (kD - 1.0))
    agg.select(col("n"), col("k"),
      round(sp2, 6).as("pooled_var"),
      round(num / den, 6).as("t_stat"),
      (col("k") - 1L).as("df"))
  }

  /** McNemar's test (McNemar 1947) on paired binary outcomes — one
    * subject, two conditions: did the marginal rate CHANGE, judged
    * only on the discordant pairs? χ² = (b−c)²/(b+c) plus the
    * Edwards continuity-corrected (|b−c|−1)²/(b+c), b/c the discordant
    * cell counts. Subjects collapse via bool-OR per key (does the key
    * exhibit the condition at all), so the operator runs directly on
    * event-grained data.
    *
    * Exactness: the 2×2 table is exact integers; the two statistics
    * are one fixed double shape each.
    *
    * Scale shape: one keyed bool-OR aggregation, one 4-cell count.
    */
  def mcnemarTest(df: DataFrame, keyCol: String, condA: Column,
      condB: Column): DataFrame = {
    val perKey = df.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max(when(condA, 1L).otherwise(0L)).as("a"),
        max(when(condB, 1L).otherwise(0L)).as("b"))
    val cells = perKey.agg(
      count(lit(1)).as("n_keys"),
      sum(when(col("a") === 1L && col("b") === 1L, 1L).otherwise(0L))
        .as("n11"),
      sum(when(col("a") === 1L && col("b") === 0L, 1L).otherwise(0L))
        .as("n10"),
      sum(when(col("a") === 0L && col("b") === 1L, 1L).otherwise(0L))
        .as("n01"),
      sum(when(col("a") === 0L && col("b") === 0L, 1L).otherwise(0L))
        .as("n00"))
    val bD = col("n10").cast("double")
    val cD = col("n01").cast("double")
    val disc = bD + cD
    cells.select(col("n_keys"), col("n11"), col("n10"), col("n01"),
      col("n00"),
      when(disc > 0.0,
        round((bD - cD) * (bD - cD) / disc, 6)).as("chi2"),
      when(disc > 0.0,
        round((abs(bD - cD) - 1.0) * (abs(bD - cD) - 1.0) / disc, 6))
        .as("chi2_cc"))
  }

  /** Cochran–Armitage trend test (Cochran 1954, Armitage 1955): is a
    * binary outcome's rate monotonically trending across ORDERED
    * categories — the dose-response screen a χ² of independence cannot
    * answer (χ² ignores the ordering). With per-category score s_i,
    * trials n_i, successes k_i, N = Σn_i, p̄ = ΣK/N:
    *
    *   T = Σ s_i·k_i − p̄·Σ s_i·n_i
    *   Var(T) = p̄(1−p̄)·(Σ s_i²·n_i − (Σ s_i·n_i)²/N)
    *   z = T/√Var(T)
    *
    * Exactness: every Σ is an exact BIGINT/decimal moment of integer
    * counts and integer scores; p̄ and the final assembly are the only
    * doubles, in one fixed parenthesization.
    *
    * Scale shape: one (category) count aggregation over the scan, then
    * arithmetic on the |categories|-row frame.
    */
  def cochranArmitage(df: DataFrame, scoreExpr: Column,
      successExpr: Column): DataFrame = {
    val cat = df.select(scoreExpr.cast("long").as("s"),
        when(successExpr, 1L).otherwise(0L).as("y"))
      .filter(col("s").isNotNull)
      .groupBy(col("s"))
      .agg(count(lit(1)).as("n_i"), sum(col("y")).as("k_i"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val agg = cat.agg(
        sum(col("n_i")).as("n"),
        sum(col("k_i")).as("k"),
        count(lit(1)).as("n_categories"),
        sum(dec(col("s")) * dec(col("k_i"))).cast("double").as("__sk"),
        sum(dec(col("s")) * dec(col("n_i"))).cast("double").as("__sn"),
        sum(dec(col("s")) * dec(col("s")) * dec(col("n_i")))
          .cast("double").as("__ssn"))
      .filter(col("k") > 0 && col("k") < col("n"))
    val nD = col("n").cast("double")
    val pbar = col("k").cast("double") / nD
    val tStat = col("__sk") - pbar * col("__sn")
    val varT = pbar * (lit(1.0) - pbar) *
      (col("__ssn") - col("__sn") * col("__sn") / nD)
    agg.select(
      col("n"), col("k"), col("n_categories"),
      round(pbar, 6).as("p_bar"),
      round(tStat, 6).as("t_stat"),
      round(varT, 6).as("var_t"),
      when(varT > 0.0, round(tStat / sqrt(varT), 6)).as("z_trend"))
  }

  /** Wilcoxon signed-rank test on PAIRED means: per key, the difference
    * of the two conditions' exact-decimal means (rounded to 6 so ranking
    * is engine-portable), zero differences dropped (the standard
    * convention), |d| midranked by the [[graft.metrics.RankMetrics]]
    * distributed bucketed scheme, and
    * z = (W⁺ − m(m+1)/4) / √(Σrᵢ²/4) — the tie-exact normal
    * approximation. The PAIRED companion to [[mannWhitneyU]]'s
    * independent-samples test: same-key before/after comparisons
    * (per-user click vs view value here) where the between-key variance
    * would drown an unpaired test.
    *
    * Exactness: midranks are exact halves (Σr over DECIMAL(28,1),
    * Σr² over DECIMAL(28,2)); μ and σ assemble in fixed-shape doubles.
    */
  def wilcoxonSignedRank(df: DataFrame, keyCol: String, valCol: String,
      condCol: String, condA: String, condB: String): DataFrame = {
    import graft.functions.Stats.dsum
    val perKey = df
      .filter(col(condCol).isin(condA, condB) && col(valCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(
        count(when(col(condCol) === condA, 1)).as("__na"),
        count(when(col(condCol) === condB, 1)).as("__nb"),
        (dsum(when(col(condCol) === condA, col(valCol)), 12) /
          count(when(col(condCol) === condA, 1))).as("__ma"),
        (dsum(when(col(condCol) === condB, col(valCol)), 12) /
          count(when(col(condCol) === condB, 1))).as("__mb"))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(round(col("__ma") - col("__mb"), 6).as("__d"))
      .filter(col("__d") =!= 0.0)
      .select(col("__d"), abs(col("__d")).as("__absd"),
        lit(0).as("__zero"))
    val ranked = graft.metrics.RankMetrics.midranks(
      perKey.select(col("__absd"), col("__zero")), "__absd", "__zero", Nil)
      .select(col("__absd"), col("midrank"))
    val joined = perKey.join(ranked, "__absd")
    joined.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("__d") > 0.0, col("midrank").cast("decimal(28,1)"))
          .otherwise(lit(0).cast("decimal(28,1)")))
          .cast("double").as("__wplus"),
        sum((col("midrank") * col("midrank")).cast("decimal(28,2)"))
          .cast("double").as("__sr2"))
      .filter(col("n_pairs") > 0)
      .select(
        col("n_pairs"),
        round(col("__wplus"), 6).as("w_plus"),
        round(col("n_pairs").cast("double") *
          (col("n_pairs").cast("double") + lit(1.0)) / lit(4.0), 6)
          .as("mu"),
        round(sqrt(col("__sr2") / lit(4.0)), 6).as("sigma"),
        when(col("__sr2") > 0.0,
          round((col("__wplus") -
            col("n_pairs").cast("double") *
              (col("n_pairs").cast("double") + lit(1.0)) / lit(4.0)) /
            sqrt(col("__sr2") / lit(4.0)), 6)).as("z"))
  }

  /** Shared distributed ECDF grid for the integral-form two-sample
    * distances ([[wasserstein1d]], [[energyDistance]]): one row per
    * distinct value with per-group counts, inclusive cumulative counts,
    * inclusive cumulative value·count sums (exact DECIMAL), and the next
    * grid value. Prefix sums are distributed by the [[ksTwoSample]] range-
    * bucket scheme — per-bucket windows plus a buckets-row offset frame —
    * so no full-table single-partition stage exists; the next-value column
    * stitches bucket boundaries through the same tiny frame.
    */
  private def ecdfGrid(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int): DataFrame = {
    val v = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"),
        (col(groupCol) === groupA).as("__is_a"))
    val byVal = v.groupBy(col("v"))
      .agg(
        sum(when(col("__is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__is_a"), 1L).otherwise(0L)).as("cb"))
    val bounds = byVal.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    // per-row v·count terms quantized to exact decimals ONCE, so every
    // downstream prefix sum is associativity-free (engine-portable)
    def dterm(cnt: Column): Column =
      (col("v") * cnt.cast("double")).cast("decimal(28,12)")
    val bucketed = byVal.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("int"))))
      .withColumn("__sa", dterm(col("ca")))
      .withColumn("__sb", dterm(col("cb")))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed
      .withColumn("__cum_a", sum(col("ca")).over(wIn))
      .withColumn("__cum_b", sum(col("cb")).over(wIn))
      .withColumn("__cum_sa", sum(col("__sa")).over(wIn))
      .withColumn("__cum_sb", sum(col("__sb")).over(wIn))
      .withColumn("__next_in",
        lead(col("v"), 1).over(
          Window.partitionBy(col("__bkt")).orderBy(col("v"))))
    // per-bucket subtotal/stitch frame: ≤ `buckets` rows, so its global
    // ordered windows are driver-scale, never the data
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("ca")).as("__ta"), sum(col("cb")).as("__tb"),
        sum(col("__sa")).as("__tsa"), sum(col("__sb")).as("__tsb"),
        min(col("v")).as("__bmin"))
      .withColumn("__off_a", coalesce(sum(col("__ta")).over(wOff), lit(0L)))
      .withColumn("__off_b", coalesce(sum(col("__tb")).over(wOff), lit(0L)))
      .withColumn("__off_sa", coalesce(sum(col("__tsa")).over(wOff),
        lit(0).cast("decimal(28,12)")))
      .withColumn("__off_sb", coalesce(sum(col("__tsb")).over(wOff),
        lit(0).cast("decimal(28,12)")))
      .withColumn("__next_bkt_min",
        lead(col("__bmin"), 1).over(Window.orderBy(col("__bkt"))))
      .select(col("__bkt"), col("__off_a"), col("__off_b"),
        col("__off_sa"), col("__off_sb"), col("__next_bkt_min"))
    val totals = byVal.agg(
      sum(col("ca")).as("__na"), sum(col("cb")).as("__nb"))
    cum.join(broadcast(offsets), "__bkt")
      .crossJoin(broadcast(totals))
      .filter(col("__na") > 0 && col("__nb") > 0)
      .select(col("v"), col("ca"), col("cb"),
        (col("__off_a") + col("__cum_a")).as("cum_a"),
        (col("__off_b") + col("__cum_b")).as("cum_b"),
        (col("__off_sa") + col("__cum_sa")).as("cum_sa"),
        (col("__off_sb") + col("__cum_sb")).as("cum_sb"),
        coalesce(col("__next_in"), col("__next_bkt_min")).as("next_v"),
        col("__na"), col("__nb"))
  }

  /** Exact 1-D Wasserstein-1 (earth-mover) distance between the `valCol`
    * distributions of two `groupCol` populations:
    * W₁ = Σᵢ |F_A(vᵢ) − F_B(vᵢ)| · (vᵢ₊₁ − vᵢ) over the observed grid —
    * the integral of the ECDF gap, the drift battery's magnitude-in-value-
    * units member next to KS (sup-gap, q115) and PSI (binned, q113).
    *
    * Exactness: cumulative counts are exact BIGINTs; each grid term is one
    * fixed-shape double expression of them, summed as DECIMAL(28,12) —
    * accumulation-order independent, engine-portable. Scale: the
    * [[ecdfGrid]] distributed prefix scheme (no single-partition stage).
    */
  def wasserstein1d(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    val g = ecdfGrid(df, valCol, groupCol, groupA, groupB, buckets)
    val gap =
      abs(col("cum_a").cast("double") / col("__na") -
        col("cum_b").cast("double") / col("__nb"))
    val term = when(col("next_v").isNotNull,
      gap * (col("next_v") - col("v"))).otherwise(lit(0.0))
    g.groupBy(col("__na"), col("__nb"))
      .agg(round(graft.functions.Stats.dsum(term, 12), 6).as("w1"))
      .select(col("__na").as("n_a"), col("__nb").as("n_b"), col("w1"))
  }

  /** Exact 1-D energy distance between two populations:
    * D = 2·E|X−Y| − E|X−X′| − E|Y−Y′|, with every pairwise-|difference|
    * expectation computed in O(grid) from sorted-order prefix moments —
    * Σ_{pairs}|xᵢ−xⱼ| = Σ_v c_v·(cnt_{<v}·v − sum_{<v}) — never the O(n²)
    * pair join. Complements [[wasserstein1d]]: same units, but a proper
    * characteristic-function metric (Székely & Rizzo 2004) whose scaled
    * form n_a·n_b/(n_a+n_b)·D is the two-sample energy test statistic.
    *
    * Exactness: prefix counts are BIGINT and prefix value-sums are
    * DECIMAL(28,12) quantized once per grid row; each term is one fixed-
    * shape double expression, summed via DECIMAL — engine-portable.
    */
  def energyDistance(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    val g = ecdfGrid(df, valCol, groupCol, groupA, groupB, buckets)
    // strictly-below prefix moments (ties contribute zero |difference|)
    val cntA = (col("cum_a") - col("ca")).cast("double")
    val cntB = (col("cum_b") - col("cb")).cast("double")
    val sumA = (col("cum_sa") - (col("v") * col("ca").cast("double"))
      .cast("decimal(28,12)")).cast("double")
    val sumB = (col("cum_sb") - (col("v") * col("cb").cast("double"))
      .cast("decimal(28,12)")).cast("double")
    def dsum12(c: Column): Column = graft.functions.Stats.dsum(c, 12)
    val agg = g.groupBy(col("__na"), col("__nb"))
      .agg(
        dsum12(col("ca").cast("double") * (cntA * col("v") - sumA))
          .as("__pa"),
        dsum12(col("cb").cast("double") * (cntB * col("v") - sumB))
          .as("__pb"),
        dsum12(col("ca").cast("double") * (cntB * col("v") - sumB) +
          col("cb").cast("double") * (cntA * col("v") - sumA))
          .as("__px"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val eXY = col("__px") / (naD * nbD)
    val eXX = lit(2.0) * col("__pa") / (naD * naD)
    val eYY = lit(2.0) * col("__pb") / (nbD * nbD)
    val d = lit(2.0) * eXY - eXX - eYY
    agg.select(
      col("__na").as("n_a"), col("__nb").as("n_b"),
      round(eXY, 6).as("e_cross"),
      round(d, 6).as("e_dist"),
      round(naD * nbD / (naD + nbD) * d, 6).as("e_stat"))
  }

  /** Kuiper two-sample test (Kuiper 1960): V = D⁺ + D⁻, the SUM of the
    * largest ECDF exceedances in each direction — unlike KS's single
    * sup (q115), V weights the distribution's two tails equally and is
    * invariant under cyclic shifts, the right sup-statistic when drift
    * can push mass out both ends. Same [[ecdfGrid]] distributed prefix
    * scheme as KS/Wasserstein.
    *
    * Exactness: D⁺/D⁻ numerators are exact integer cross-products
    * (cum_a·n_b − cum_b·n_a); one double division each at the end.
    */
  def kuiperTwoSample(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    val g = ecdfGrid(df, valCol, groupCol, groupA, groupB, buckets)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val diff = dec(col("cum_a")) * dec(col("__nb")) -
      dec(col("cum_b")) * dec(col("__na"))
    val agg = g.groupBy(col("__na"), col("__nb"))
      .agg(max(diff).as("__mp"), max(-diff).as("__mn"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      round(col("__mp").cast("double") / (naD * nbD), 6).as("d_plus"),
      round(col("__mn").cast("double") / (naD * nbD), 6).as("d_minus"),
      round((col("__mp").cast("double") + col("__mn").cast("double")) /
        (naD * nbD), 6).as("v_stat"))
  }

  /** Cramér–von Mises two-sample test (Anderson 1962, midrank ties):
    * T = U/(n_a·n_b·N) − (4n_a·n_b − 1)/(6N), with
    * U = n_a·Σ_i(r_i − i)² + n_b·Σ_j(s_j − j)² over combined midranks —
    * the INTEGRATED-squared-ECDF-gap member of the two-sample battery
    * (KS sup q115, Kuiper two-sided sup, Wasserstein q297 mass, AD
    * tail-weighted). Each tie group's deviation sum collapses in closed
    * form (Σ_{k≤c}(d−k)², d the half-integer midrank offset), so U·12
    * is an EXACT integer assembled from the grid's cumulative counts —
    * no per-observation ranks ever materialize.
    *
    * Scale shape: the [[ecdfGrid]] distributed prefix scheme; one
    * grouped decimal reduction over the distinct-value grid.
    */
  def cramerVonMisesTwoSample(df: DataFrame, valCol: String,
      groupCol: String, groupA: String, groupB: String,
      buckets: Int = 32): DataFrame = {
    val g = ecdfGrid(df, valCol, groupCol, groupA, groupB, buckets)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val c = col("ca") + col("cb")
    val cumNprev = (col("cum_a") + col("cum_b")) - c
    // 2·(midrank − within-sample prefix): integer by construction
    def d2(cumPrev: Column): Column =
      lit(2L) * cumNprev + c + lit(1L) - lit(2L) * cumPrev
    // 12·Σ_{k=1..cnt}(d − k)² as exact integers
    def s12(cnt: Column, dd: Column): Column =
      lit(3L) * dec(cnt) * dec(dd) * dec(dd) -
        lit(6L) * dec(dd) * dec(cnt) * dec(cnt + 1L) +
        lit(2L) * dec(cnt) * dec(cnt + 1L) * dec(lit(2L) * cnt + 1L)
    val agg = g.groupBy(col("__na"), col("__nb"))
      .agg(
        sum(s12(col("ca"), d2(col("cum_a") - col("ca")))).as("__sa"),
        sum(s12(col("cb"), d2(col("cum_b") - col("cb")))).as("__sb"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val u12 = (dec(col("__na")) * col("__sa") +
      dec(col("__nb")) * col("__sb")).cast("double")
    val u = u12 / lit(12.0)
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      round(u, 6).as("u_stat"),
      round(u / (naD * nbD * (naD + nbD)) -
        (lit(4.0) * naD * nbD - lit(1.0)) /
          (lit(6.0) * (naD + nbD)), 6).as("t_stat"))
  }

  /** Two-sample Anderson–Darling test (Scholz & Stephens 1987, midrank
    * version — the k=2 A²_akN): tail-weighted integrated ECDF gap,
    * the member of the battery most sensitive to tail drift. Per
    * distinct value the midrank quantities double to exact integers
    * (M2 = 2·cumᵢ − cᵢ, B2 = 2·cumN − l), each term
    * (l/N)·(N·M2 − nᵢ·B2)²/(2N·B2 − B2² − N·l) is one deterministic
    * IEEE double shape, rounded to 6 into decimal per-sample sums.
    *
    * Scale shape: the [[ecdfGrid]] distributed prefix scheme; one
    * grouped reduction.
    */
  def andersonDarlingTwoSample(df: DataFrame, valCol: String,
      groupCol: String, groupA: String, groupB: String,
      buckets: Int = 32): DataFrame = {
    val g = ecdfGrid(df, valCol, groupCol, groupA, groupB, buckets)
    val l = col("ca") + col("cb")
    val cumN = col("cum_a") + col("cum_b")
    val nTot = col("__na") + col("__nb")
    val nD = nTot.cast("double")
    val b2 = (lit(2L) * cumN - l).cast("double")
    val lD = l.cast("double")
    def term(cum: Column, cnt: Column, nI: Column): Column = {
      val m2 = (lit(2L) * cum - cnt).cast("double")
      val num = nD * m2 - nI.cast("double") * b2
      lD / nD * (num * num) / (lit(2.0) * nD * b2 - b2 * b2 - nD * lD)
    }
    val agg = g.groupBy(col("__na"), col("__nb"))
      .agg(
        count(lit(1)).as("n_grid"),
        sum(round(term(col("cum_a"), col("ca"), col("__na")), 6)
          .cast("decimal(38,6)")).cast("double").as("__ia"),
        sum(round(term(col("cum_b"), col("cb"), col("__nb")), 6)
          .cast("decimal(38,6)")).cast("double").as("__ib"))
    val naD = col("__na").cast("double")
    val nbD = col("__nb").cast("double")
    val nD2 = (col("__na") + col("__nb")).cast("double")
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      col("n_grid"),
      round((nD2 - lit(1.0)) / nD2 *
        (col("__ia") / naD + col("__ib") / nbD), 6).as("a2_stat"))
  }

  /** Categorical-distribution distance card between two cohorts: total
    * variation ½Σ|p−q| (the fraction of mass that must MOVE — the
    * tightest bound on any event-probability difference), Bhattacharyya
    * coefficient Σ√(pq) with its distance −ln BC, and Hellinger
    * √(1 − BC) (the metric one, bounded [0,1]) — the bounded/metric
    * members of the categorical family next to PSI (q113, unbounded
    * log-weighted) and JS divergence (q177).
    *
    * Exactness: cell counts exact; per-category terms are fixed double
    * shapes rounded to 9 into decimal sums; one sqrt/ln at the end.
    *
    * Scale shape: one conditional count aggregation over the scan;
    * everything else on the category-bounded frame.
    */
  def categoricalDistanceCard(df: DataFrame, catCol: String,
      isA: Column): DataFrame = {
    val d = df.filter(col(catCol).isNotNull)
      .select(col(catCol).as("cat"), isA.as("__isa"))
    val cells = d.groupBy(col("cat"))
      .agg(sum(when(col("__isa"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__isa"), 1L).otherwise(0L)).as("cb"))
    val tot = cells.agg(sum(col("ca")).as("__na"),
      sum(col("cb")).as("__nb"))
    val p = col("ca").cast("double") / col("__na").cast("double")
    val q = col("cb").cast("double") / col("__nb").cast("double")
    val agg = cells.crossJoin(broadcast(tot))
      .select(col("__na"), col("__nb"),
        round(abs(p - q), 9).cast("decimal(38,9)").as("__tv"),
        round(sqrt(p * q), 9).cast("decimal(38,9)").as("__bc"))
      .groupBy(col("__na"), col("__nb"))
      .agg(count(lit(1)).as("n_categories"),
        sum(col("__tv")).cast("double").as("__stv"),
        sum(col("__bc")).cast("double").as("__sbc"))
    agg.select(col("__na").as("n_a"), col("__nb").as("n_b"),
      col("n_categories"),
      round(lit(0.5) * col("__stv"), 6).as("tv"),
      round(col("__sbc"), 6).as("bc"),
      round(sqrt(greatest(lit(0.0), lit(1.0) - col("__sbc"))), 6)
        .as("hellinger"),
      when(col("__sbc") > 0.0, round(-log(col("__sbc")), 6) + lit(0.0))
        .as("bhattacharyya"))
  }

  /** Ordinal-association card over two ordinal columns: Kendall's
    * τ_b (tie-corrected), Goodman–Kruskal γ (tie-ignoring), and
    * Somers' d_yx (asymmetric, y predicted from x) — the ORDINAL
    * siblings of q271's nominal Cramér's V and q151's Spearman (rank
    * correlation reads positions; these read pair concordance, which
    * is what an ordinal scale actually licenses). Everything reduces
    * to the contingency table: concordant/discordant pair counts come
    * from one strict-upper-triangle self-join of the CELL frame
    * (|cells|² work, never row pairs), tie counts from the marginals.
    *
    * Exactness: C, D, tie counts, N₀ are exact integers; the three
    * coefficients are fixed double shapes with one sqrt.
    *
    * Scale shape: one grouped count (the contingency table), one
    * broadcast cell self-join, two marginal reductions.
    */
  def ordinalAssociationCard(df: DataFrame, xCol: Column,
      yCol: Column): DataFrame = {
    val cells = df.select(xCol.as("gx"), yCol.as("gy"))
      .filter(col("gx").isNotNull && col("gy").isNotNull)
      .groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("c"))
      .persist()
    try {
      def dec(c: Column): Column = c.cast("decimal(38,0)")
      val b = cells.select(col("gx").as("gx2"), col("gy").as("gy2"),
        col("c").as("c2"))
      val pairs = cells.join(broadcast(b),
          col("gx2") > col("gx") &&
            (col("gy2") > col("gy") || col("gy2") < col("gy")))
        .agg(
          sum(when(col("gy2") > col("gy"), dec(col("c")) * dec(col("c2")))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("__cc"),
          sum(when(col("gy2") < col("gy"), dec(col("c")) * dec(col("c2")))
            .otherwise(lit(0).cast("decimal(38,0)"))).as("__dd"))
      def tieSum(kc: Column): Column =
        sum(dec(kc) * dec(kc - 1L)).cast("decimal(38,0)")
      val tx = cells.groupBy(col("gx")).agg(sum(col("c")).as("m"))
        .agg((tieSum(col("m")) / lit(2)).cast("decimal(38,0)").as("__tx"))
      val ty = cells.groupBy(col("gy")).agg(sum(col("c")).as("m"))
        .agg((tieSum(col("m")) / lit(2)).cast("decimal(38,0)").as("__ty"))
      val tot = cells.agg(sum(col("c")).as("__n"))
      val out = pairs.crossJoin(tx).crossJoin(ty).crossJoin(tot)
      val nD = col("__n").cast("double")
      val n0 = nD * (nD - lit(1.0)) / lit(2.0)
      val cD = col("__cc").cast("double")
      val dD = col("__dd").cast("double")
      val txD = col("__tx").cast("double")
      val tyD = col("__ty").cast("double")
      out.select(col("__n").as("n"),
        col("__cc").cast("long").as("concordant"),
        col("__dd").cast("long").as("discordant"),
        col("__tx").cast("long").as("ties_x"),
        col("__ty").cast("long").as("ties_y"),
        round((cD - dD) / sqrt((n0 - txD) * (n0 - tyD)), 6).as("tau_b"),
        when(cD + dD > 0.0, round((cD - dD) / (cD + dD), 6))
          .as("gamma"),
        round((cD - dD) / (n0 - txD), 6).as("somers_d_yx"))
    } finally { cells.unpersist(); () }
  }

  /** Brunner–Munzel test (2000): the heteroscedasticity-robust
    * replacement for Mann–Whitney (q259 assumes equal shapes under the
    * null; BM does not) — relative effect p̂ = P(X<Y) + ½P(X=Y) with a
    * studentized statistic and Satterthwaite df from the within-sample
    * rank variances. All rank quantities collapse onto the distinct-
    * value grid: every tied observation shares its combined AND
    * within-sample midrank, so the variance sums are per-value terms
    * weighted by exact cell counts (the scipy `brunnermunzel`
    * convention, midranks).
    *
    * Exactness: midranks are exact half-integers off the cumulative
    * grid; mean ranks are single divisions; variance terms are fixed
    * double shapes rounded to 9 into decimal sums.
    *
    * Scale shape: the [[ecdfGrid]] distributed prefix scheme + two
    * grouped reductions.
    */
  def brunnerMunzelTest(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    val g = ecdfGrid(df, valCol, groupCol, groupA, groupB, buckets)
      .persist()
    try {
      val c = col("ca") + col("cb")
      val m = ((col("cum_a") + col("cum_b")) - c).cast("double") +
        (c + lit(1L)).cast("double") / 2.0
      val mA = (col("cum_a") - col("ca")).cast("double") +
        (col("ca") + lit(1L)).cast("double") / 2.0
      val mB = (col("cum_b") - col("cb")).cast("double") +
        (col("cb") + lit(1L)).cast("double") / 2.0
      def dsum1(e: Column): Column =
        sum(e.cast("decimal(38,1)")).cast("double")
      val means = g.groupBy(col("__na"), col("__nb"))
        .agg(dsum1(col("ca").cast("double") * m).as("__sma"),
          dsum1(col("cb").cast("double") * m).as("__smb"))
        .select(col("__na"), col("__nb"),
          (col("__sma") / col("__na").cast("double")).as("__rca"),
          (col("__smb") / col("__nb").cast("double")).as("__rcb"))
      val naD = col("__na").cast("double")
      val nbD = col("__nb").cast("double")
      val tA = m - mA - col("__rca") + (naD + lit(1.0)) / 2.0
      val tB = m - mB - col("__rcb") + (nbD + lit(1.0)) / 2.0
      val sums = g.join(broadcast(means), Seq("__na", "__nb"))
        .groupBy(col("__na"), col("__nb"), col("__rca"), col("__rcb"))
        .agg(
          sum(round(col("ca").cast("double") * (tA * tA), 9)
            .cast("decimal(38,9)")).cast("double").as("__ssa"),
          sum(round(col("cb").cast("double") * (tB * tB), 9)
            .cast("decimal(38,9)")).cast("double").as("__ssb"))
      val sx = col("__ssa") / (naD - lit(1.0))
      val sy = col("__ssb") / (nbD - lit(1.0))
      val pooled = naD * sx + nbD * sy
      val w = naD * nbD * (col("__rcb") - col("__rca")) /
        ((naD + nbD) * sqrt(pooled))
      val dfSat = (pooled * pooled) /
        ((naD * sx) * (naD * sx) / (naD - lit(1.0)) +
          (nbD * sy) * (nbD * sy) / (nbD - lit(1.0)))
      sums.select(col("__na").as("n_a"), col("__nb").as("n_b"),
        round((col("__rcb") - (nbD + lit(1.0)) / 2.0) / naD, 6)
          .as("p_hat"),
        round(w, 6).as("w_stat"),
        round(dfSat, 6).as("df"))
    } finally { g.unpersist(); () }
  }

  /** Cochran's Q test (1950): do k related binary treatments have the
    * same success rate across subjects? Here per-subject indicator
    * rows (did user i ever fire treatment j) form the k×n 0/1 matrix;
    * Q = k(k−1)·Σ_j(C_j − T/k)²/(k·T − ΣR_i²) against χ²(k−1) — the
    * k-treatment generalization of q336's McNemar (k=2 reduces to it).
    *
    * Exactness: everything is exact integer counting until the final
    * ratio.
    *
    * Scale shape: one per-(subject, treatment) aggregation, one
    * per-subject row-total reduction, one k-row column frame.
    */
  def cochranQTest(df: DataFrame, subjectCol: Column, treatCol: String,
      treatments: Seq[String]): DataFrame = {
    require(treatments.size >= 2, "need >= 2 treatments")
    val k = treatments.size
    val indicators = df.filter(col(treatCol).isin(treatments: _*))
      .groupBy(subjectCol.as("__subj"))
      .agg(max(when(col(treatCol) === treatments.head, 1L)
        .otherwise(0L)).as(s"__t_0"),
        treatments.tail.zipWithIndex.map { case (t, i) =>
          max(when(col(treatCol) === t, 1L).otherwise(0L))
            .as(s"__t_${i + 1}")
        }: _*)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val r = treatments.indices.map(i => col(s"__t_$i"))
      .reduce(_ + _)
    val aggCols = count(lit(1)).as("n_subjects") +:
      (treatments.indices.map(i =>
        sum(col(s"__t_$i")).as(s"__c_$i")) :+
        sum(r).as("__T") :+
        sum(dec(r) * dec(r)).cast("long").as("__R2"))
    val agg = indicators.agg(aggCols.head, aggCols.tail: _*)
    val kD = lit(k.toDouble)
    val tD = col("__T").cast("double")
    val meanC = tD / kD
    val num = treatments.indices.map { i =>
      val cD = col(s"__c_$i").cast("double")
      (cD - meanC) * (cD - meanC)
    }.reduce(_ + _)
    val denom = kD * tD - col("__R2").cast("double")
    val q = when(denom > 0.0,
      kD * (kD - lit(1.0)) * num / denom)
    val outCols = col("n_subjects") +:
      (treatments.indices.map(i =>
        col(s"__c_$i").as(s"c_${treatments(i)}")) :+
        col("__T").cast("long").as("total_successes") :+
        round(q, 6).as("q_stat") :+
        lit((k - 1).toLong).as("df"))
    agg.select(outCols: _*)
  }

  /** Mood's median test (Mood 1950): are the k groups' values drawn
    * around ONE common median? The pooled median comes from the two
    * middle order statistics over the distinct-value cumulative-count
    * frame (no data sort, no engine `median()`); values exactly AT the
    * pooled median drop (the classical convention, matching
    * [[TimeSeriesOps.runsTestDailyCounts]]); the χ² statistic runs over
    * the 2×k above/below table. The crudest — and most outlier-proof —
    * member of the k-sample location family (q261 Kruskal–Wallis reads
    * mean ranks, q286 ANOVA means; this reads only sides of the
    * median).
    *
    * Exactness: order statistics and all 2×k cells are exact integers;
    * expected cells and the χ² assembly are fixed-shape doubles.
    *
    * Scale shape: one distinct-value count aggregation, then the
    * [[kruskalWallis]] two-level prefix-sum over the distinct-value
    * frame (deterministic range buckets + per-bucket keyed windows +
    * a ≤`buckets`-row offset frame — the distinct-value count grows
    * with n here, events.value is ~18% distinct, so NO unpartitioned
    * ordered window may touch that frame), one group aggregation.
    */
  def moodsMedianTest(df: DataFrame, valCol: String,
      groupCol: String, buckets: Int = 32): DataFrame = {
    // NaN must be excluded alongside NULL: floor(NaN).cast(int) is 0 in
    // non-ANSI Spark, so a NaN value would land in bucket 0 and shift
    // the cumulative ranks of every later bucket (the pre-bucketing
    // global orderBy placed NaN last; the bucketed prefix-sum must not
    // depend on engine-specific NaN placement at all)
    val d = df.filter(col(valCol).isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("g"), col(valCol).cast("double").as("v"))
      .filter(!isnan(col("v")))
    val byV = d.groupBy(col("v")).agg(count(lit(1)).as("c"))
    // two-level prefix sum (q115/kruskalWallis shape): bucket by value
    // range, cumulate inside each bucket, add the per-bucket offsets
    val bounds = byV.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val bucketed = byV.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("int"))))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cumIn = bucketed.withColumn("__cum_c", sum(col("c")).over(wIn))
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("c")).as("__cc"))
      .withColumn("__off", coalesce(sum(col("__cc")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val cum = cumIn.join(broadcast(offsets), "__bkt")
      .withColumn("cum", col("__off") + col("__cum_c"))
    val nTot = d.agg(count(lit(1)).as("__n"))
    // two middle order statistics: ranks ⌊(n+1)/2⌋ and ⌊n/2⌋+1
    // (Column./ is DOUBLE division — floor+cast gives the integer ranks)
    val r1 = floor((col("__n") + 1L) / 2.0).cast("long")
    val r2 = floor(col("__n") / 2.0).cast("long") + 1L
    val med = cum.crossJoin(broadcast(nTot))
      .select(
        when(col("cum") >= r1 && col("cum") - col("c") < r1, col("v"))
          .as("__v1"),
        when(col("cum") >= r2 && col("cum") - col("c") < r2, col("v"))
          .as("__v2"))
      .agg(max(col("__v1")).as("__v1"), max(col("__v2")).as("__v2"))
      .select(((col("__v1") + col("__v2")) / 2.0).as("__med"))
    val cells = d.crossJoin(broadcast(med))
      .filter(col("v") =!= col("__med"))
      .groupBy(col("g"))
      .agg(
        sum(when(col("v") > col("__med"), 1L).otherwise(0L)).as("n_above"),
        sum(when(col("v") < col("__med"), 1L).otherwise(0L)).as("n_below"),
        max(col("__med")).as("__med"))
    val tot = cells.agg(
      sum(col("n_above")).as("__ta"), sum(col("n_below")).as("__tb"),
      count(lit(1)).as("__k"))
    val withTot = cells.crossJoin(broadcast(tot))
    val nD = (col("__ta") + col("__tb")).cast("double")
    val rowN = (col("n_above") + col("n_below")).cast("double")
    val ea = rowN * col("__ta").cast("double") / nD
    val eb = rowN * col("__tb").cast("double") / nD
    val term = round(
      (col("n_above").cast("double") - ea) *
        (col("n_above").cast("double") - ea) / ea +
      (col("n_below").cast("double") - eb) *
        (col("n_below").cast("double") - eb) / eb, 9)
    val perG = withTot.select(col("g"), col("n_above"), col("n_below"),
      col("__med"), col("__k"),
      round(ea, 6).as("e_above"),
      term.cast("decimal(38,9)").as("__t"))
    val chi2 = perG.groupBy(col("__med"), col("__k"))
      .agg(sum(col("__t")).cast("double").as("__chi2"))
    perG.crossJoin(broadcast(chi2.select(col("__chi2"))))
      .select(col("g"), col("n_above"), col("n_below"), col("e_above"),
        round(col("__med"), 6).as("pooled_median"),
        round(col("__chi2"), 6).as("chi2"),
        (col("__k") - 1L).as("df"))
      .orderBy(col("g"))
  }

  /** Ansari–Bradley two-sample dispersion test (Ansari & Bradley 1960):
    * are the two groups equally SPREAD around a common center? Pooled
    * values take mid-ranks from BOTH ends — score
    * s = min(r, n+1−r) — so extreme values score low and central
    * values high; a group with systematically LOW scores is the more
    * dispersed one. The rank companion of [[leveneTest]] (means/
    * variances) next to [[mannWhitneyU]]'s location test: the same
    * drift battery slot, but answering "did the variance move" without
    * any moment assumption.
    *
    * Ties use mid-rank scores; the normal approximation is the exact
    * finite-population form (sampling n_a scores without replacement
    * from the realized score multiset): E[AB] = n_a·s̄,
    * Var[AB] = n_a·n_b·(Σs² − n·s̄²)/(n(n−1)) — correct under any tie
    * pattern, no parity split needed.
    *
    * Exactness: mid-ranks and scores stay DOUBLED (2r, 2s — exact
    * integers even at .5 mid-ranks); every sum is an exact decimal
    * product aggregation; doubles appear once at the card assembly.
    * Scale shape = [[mannWhitneyU]]: the rank cumulation runs over the
    * value-collapsed frame, bucketed so no single task sees the whole
    * domain.
    */
  def ansariBradley(df: DataFrame, valCol: String, groupCol: String,
      groupA: String, groupB: String, buckets: Int = 32): DataFrame = {
    val v = df
      .filter(col(groupCol).isin(groupA, groupB) && col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"),
        (col(groupCol) === groupA).as("__is_a"))
    val byVal = v.groupBy(col("v"))
      .agg(
        sum(when(col("__is_a"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("__is_a"), 1L).otherwise(0L)).as("cb"))
      .withColumn("t", col("ca") + col("cb"))
    val bounds = byVal.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"),
      sum(col("t")).as("__n"))
    val bucketed = byVal.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")) / (col("__hi") - col("__lo"))
              * buckets).cast("int"))))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = bucketed.withColumn("__cum_t", sum(col("t")).over(wIn))
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("t")).as("__tt"))
      .withColumn("__off", coalesce(sum(col("__tt")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__off"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val prev = col("__off") + col("__cum_t") - col("t")
    // doubled mid-rank and doubled both-ends score (exact integers)
    val mid2 = prev * lit(2L) + col("t") + lit(1L)
    val s2c = least(mid2, (col("__n") + lit(1L)) * lit(2L) - mid2)
    val agg = cum.join(broadcast(offsets), "__bkt")
      .select(col("ca"), col("cb"), col("t"), s2c.as("__s2"))
      .agg(
        sum(col("ca")).as("n_a"), sum(col("cb")).as("n_b"),
        sum(dec(col("ca")) * dec(col("__s2"))).as("__ab2"),
        sum(dec(col("t")) * dec(col("__s2"))).as("__ss2"),
        sum(dec(col("t")) * dec(col("__s2")) * dec(col("__s2")))
          .as("__s4"),
        sum(when(col("t") > 1L, 1L).otherwise(0L)).as("n_tied_values"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
    val naD = col("n_a").cast("double")
    val nbD = col("n_b").cast("double")
    val nD = naD + nbD
    val abD = col("__ab2").cast("double") / lit(2.0)
    val mu = col("__ss2").cast("double") / (lit(2.0) * nD)
    val ssq = col("__s4").cast("double") / lit(4.0) - nD * mu * mu
    val varAb = naD * nbD / (nD * (nD - lit(1.0))) * ssq
    agg.select(
      col("n_a"), col("n_b"), col("n_tied_values"),
      round(abD, 6).as("ab_stat"),
      round(naD * mu, 6).as("mu_ab"),
      round(sqrt(varAb), 6).as("sigma_ab"),
      when(varAb > 0.0, round((abD - naD * mu) / sqrt(varAb), 6))
        .as("z"))
  }

  /** Fisher's EXACT right-tail test on the 2×2 table of two boolean
    * expressions: P[X ≥ a] under the hypergeometric null with the
    * observed margins — the test q100's chi-square approximates, exact
    * at any cell size (including the small/skewed cells where chi-square
    * breaks). Computed in log-space: ln-binomials via the portable
    * [[graft.functions.Stats.lnGamma]] (a fixed Lanczos expression tree
    * both engines replay bit-for-bit — built-in `lgamma`s are NOT
    * portable), the tail summed as exp(termₖ − max) so a p-value of
    * 1e-300 still reports its ln instead of underflowing silently.
    * Mid-p (− half the point mass at a) comes free from the same
    * margins. Also reports the sample log-odds ratio.
    *
    * Scale contract: the tail has min(r1,c1) − a + 1 terms — bounded by
    * the SMALLER margin, not the data. That is the nature of an exact
    * test: it is for tables with a modest minor margin; `maxTerms`
    * (default 10⁶) fails fast with the fix (use q100's chi-square)
    * when the support outgrows it. Under the cap the explode is one
    * narrow frame off a 1-row aggregate, then two 1-row reductions.
    */
  def fisherExact2x2(df: DataFrame, rowExpr: Column, colExpr: Column,
      maxTerms: Long = 1000000L): DataFrame = {
    import graft.functions.Stats.{dsum, lnChoose}
    val m = df.agg(
      count(lit(1)).as("n"),
      sum(when(rowExpr, 1L).otherwise(0L)).as("r1"),
      sum(when(colExpr, 1L).otherwise(0L)).as("c1"),
      sum(when(rowExpr && colExpr, 1L).otherwise(0L)).as("a"))
    val h = m.head()
    val (hn, hr1, hc1, ha) =
      (h.getLong(0), h.getLong(1), h.getLong(2), h.getLong(3))
    val support = math.min(hr1, hc1) - ha + 1
    require(support >= 1 && support <= maxTerms,
      s"fisherExact2x2 tail support $support exceeds maxTerms=$maxTerms " +
        "(margins too large for an exact test — use the chi-square " +
        "approximation) or the table is degenerate")
    val nD = col("n").cast("double")
    val r1D = col("r1").cast("double")
    val c1D = col("c1").cast("double")
    def termAt(kD: Column): Column =
      lnChoose(r1D, kD) + lnChoose(nD - r1D, c1D - kD) -
        lnChoose(nD, c1D)
    val terms = m
      .select(col("n"), col("r1"), col("c1"), col("a"),
        explode(sequence(col("a"), least(col("r1"), col("c1"))))
          .as("k"))
      .select(termAt(col("k").cast("double")).as("lt"))
    val mx = terms.agg(max(col("lt")).as("__mx"),
      count(lit(1)).as("n_terms"))
    val s = terms.crossJoin(broadcast(mx))
      .agg(dsum(exp(col("lt") - col("__mx")), 12).as("__s"),
        max(col("__mx")).as("__mx"), max(col("n_terms")).as("n_terms"))
    val aD = col("a").cast("double")
    val bD = r1D - aD
    val cD = c1D - aD
    val dD = nD - r1D - c1D + aD
    val lnP = col("__mx") + log(col("__s"))
    m.crossJoin(broadcast(s)).select(
      col("n"), col("r1"), col("c1"), col("a").as("a_obs"),
      round(r1D * c1D / nD, 6).as("expected_a"),
      when(aD > 0.0 && bD > 0.0 && cD > 0.0 && dD > 0.0,
        round(log(aD * dD / (bD * cD)), 6)).as("log_odds"),
      col("n_terms"),
      round(lnP, 6).as("ln_p_right"),
      round(exp(lnP), 6).as("p_right"),
      round(exp(lnP) - lit(0.5) * exp(termAt(aD)), 6).as("mid_p_right"))
  }

  /** Seeded randomization (permutation) test for a two-group mean
    * difference (Fisher–Pitman): `nPerm` label permutations are built
    * from engine-portable congruential draws — permutation p ranks the
    * units by draw(id, p) and relabels the first n_A as pseudo-A, so
    * group sizes are preserved EXACTLY — and the two-sided p-value is
    * (1 + #{|Δ*| ≥ |Δ|})/(nPerm + 1). The assumption-free member of
    * the location battery: Welch (q266) trusts normality of means,
    * Mann–Whitney (q259) changes the estimand to ranks; this one tests
    * THE mean difference under the randomization null alone.
    *
    * Portability: draws and ranks are exact integers, per-permutation
    * means are round-12 decimal sums in one fixed shape, and the
    * extreme-count compares identical doubles — the full trajectory
    * hash-checks.
    *
    * Scale contract: each permutation ranks all n units in ONE ordered
    * window partition, so this is for BOUNDED unit frames (per-user /
    * per-entity aggregates) — enforced via `maxUnits`, like the
    * survival-grid contracts. The (nPerm × n) frame itself is a
    * projection + keyed window + keyed reduction, nothing driver-side.
    */
  def permutationTest(perUnit: DataFrame, idCol: String, valCol: String,
      groupExpr: Column, nPerm: Int = 64, salt: Long = 0L,
      maxUnits: Long = 1000000L): DataFrame = {
    import graft.functions.Stats.dsum
    require(nPerm >= 16, s"need nPerm >= 16, got $nPerm")
    val d = perUnit.filter(col(valCol).isNotNull)
      .select(col(idCol).cast("long").as("u"),
        col(valCol).cast("double").as("v"), groupExpr.as("__a"))
      .persist()
    try {
      val m = d.agg(count(lit(1)).as("n"),
        sum(when(col("__a"), 1L).otherwise(0L)).as("na")).head()
      val (n, na) = (m.getLong(0), m.getLong(1))
      require(n <= maxUnits,
        s"permutationTest unit frame of $n exceeds maxUnits=$maxUnits; " +
          "aggregate to a bounded unit grain first")
      require(na >= 2 && n - na >= 2, "need >= 2 units per group")
      val naD = na.toDouble
      val nbD = (n - na).toDouble
      val obs = d.agg(
        (dsum(when(col("__a"), col("v")), 12) / lit(naD) -
          dsum(when(!col("__a"), col("v")), 12) / lit(nbD)).as("__obs"))
      val p1 = 1000003L
      val p2 = 9999991L
      val seed = col("u") * lit(31L) + col("p") * lit(7919L) + lit(salt)
      val x1 = pmod(pmod(seed, lit(p1)) * lit(2654435761L), lit(p1))
      val x2 = pmod(pmod(x1 + (seed.cast("decimal(38,0)") / lit(p1))
          .cast("long"), lit(p2)) * lit(22695477L), lit(p2))
      val perms = d.select(col("u"), col("v"),
          explode(sequence(lit(1L), lit(nPerm.toLong))).as("p"))
        .withColumn("__d", x2)
      val w = Window.partitionBy(col("p"))
        .orderBy(col("__d"), col("u"))
      val relabeled = perms
        .withColumn("__pa", row_number().over(w) <= na)
      val perPerm = relabeled.groupBy(col("p"))
        .agg((dsum(when(col("__pa"), col("v")), 12) / lit(naD) -
          dsum(when(!col("__pa"), col("v")), 12) / lit(nbD)).as("__pd"))
      val card = perPerm.crossJoin(broadcast(obs))
        .agg(count(lit(1)).as("n_perm"),
          sum(when(abs(col("__pd")) >= abs(col("__obs")), 1L)
            .otherwise(0L)).as("n_extreme"),
          max(col("__obs")).as("__obs"))
      card.select(
        lit(n).as("n_units"), lit(na).as("n_a"), lit(n - na).as("n_b"),
        round(col("__obs"), 6).as("obs_diff"),
        col("n_perm"), col("n_extreme"),
        round((col("n_extreme") + lit(1L)).cast("double") /
          (col("n_perm") + lit(1L)).cast("double"), 6).as("p_value"))
    } finally { d.unpersist(); () }
  }

  /** Inverse-variance meta-analysis of per-stratum two-arm mean
    * differences (fixed effect + DerSimonian–Laird 1986 random
    * effects): each stratum (`studyCol` value) contributes the effect
    * e_i = x̄₁ − x̄₂ between `armExpr`-true and -false rows with
    * SE²_i = s²₁/n₁ + s²₂/n₂; pooling gives the fixed effect
    * Σwᵢeᵢ/Σwᵢ (wᵢ = 1/SE²ᵢ), Cochran's heterogeneity
    * Q = Σwᵢeᵢ² − (Σwᵢeᵢ)²/Σwᵢ, the DL between-stratum variance
    * τ² = max(0, (Q − (k−1))/(Σw − Σw²/Σw)), I², and the
    * random-effects re-pool with wᵢ* = 1/(SE²ᵢ + τ²). The "is this
    * effect one number or a mixture" card a per-segment experiment
    * readout needs before trusting a single pooled delta.
    *
    * Exactness: per-arm Σx and Σx² accumulate as exact decimals (the
    * value column must be decimal-typed or `scale` must cover it);
    * per-stratum doubles assemble in one fixed parenthesization;
    * stratum-level sums re-enter via the dsum(12) contract. Strata with
    * an arm of size < 2 (SE undefined) are excluded in both engines.
    *
    * Scale shape: one (stratum, arm) aggregation, one k-row reduction,
    * one broadcast of τ² back over the k-row frame — nothing wider
    * than the stratum count ever sits in a window or on the driver.
    */
  def metaAnalysisPool(df: DataFrame, studyCol: String, valCol: String,
      armExpr: Column, scale: Int = 2): DataFrame = {
    import graft.functions.Stats.dsum
    val sc2 = scale * 2
    val perArm = df
      .filter(col(valCol).isNotNull)
      .groupBy(col(studyCol).as("study"), armExpr.as("__a"))
      .agg(count(lit(1)).as("n"),
        sum(col(valCol).cast(s"decimal(28,$scale)")).as("sx"),
        sum(col(valCol).cast(s"decimal(28,$scale)") *
          col(valCol).cast(s"decimal(28,$scale)")).as("sxx"))
    def arm(a: Boolean, c: String, out: String) =
      when(col("__a") === lit(a), col(c)).otherwise(lit(null)).as(out)
    val perStudy = perArm
      .groupBy(col("study"))
      .agg(
        max(arm(true, "n", "n1")).as("n1"),
        max(arm(true, "sx", "sx1")).as("sx1"),
        max(arm(true, "sxx", "sxx1")).as("sxx1"),
        max(arm(false, "n", "n0")).as("n0"),
        max(arm(false, "sx", "sx0")).as("sx0"),
        max(arm(false, "sxx", "sxx0")).as("sxx0"))
      .filter(col("n1") >= 2L && col("n0") >= 2L)
    def meanV(sx: Column, n: Column) = sx.cast("double") / n.cast("double")
    def varV(sxx: Column, sx: Column, n: Column) = {
      val nD = n.cast("double")
      (sxx.cast("double") - sx.cast("double") * sx.cast("double") / nD) /
        (nD - lit(1.0))
    }
    val eff = meanV(col("sx1"), col("n1")) - meanV(col("sx0"), col("n0"))
    val se2 = varV(col("sxx1"), col("sx1"), col("n1")) /
        col("n1").cast("double") +
      varV(col("sxx0"), col("sx0"), col("n0")) / col("n0").cast("double")
    val studies = perStudy
      .select(col("study"), eff.as("e"), se2.as("se2"),
        (lit(1.0) / se2).as("w"))
      .filter(col("se2") > 0.0)
    val pooled = studies.agg(
      count(lit(1)).as("k_studies"),
      dsum(col("w"), 12).as("__sw"),
      dsum(col("w") * col("e"), 12).as("__swe"),
      dsum(col("w") * col("e") * col("e"), 12).as("__swee"),
      dsum(col("w") * col("w"), 12).as("__sww"))
    val qStat = col("__swee") - col("__swe") * col("__swe") / col("__sw")
    val dfK = (col("k_studies") - lit(1L)).cast("double")
    val tau2 = when(col("k_studies") > 1L,
      greatest(lit(0.0),
        (qStat - dfK) / (col("__sw") - col("__sww") / col("__sw"))))
      .otherwise(lit(0.0))
    val card = pooled.select(
      col("k_studies"),
      (col("__swe") / col("__sw")).as("__fixed"),
      sqrt(lit(1.0) / col("__sw")).as("__fixed_se"),
      qStat.as("__q"), dfK.as("__df"),
      // round τ² BEFORE it re-enters the per-study weights so the
      // random-effects pass starts from one agreed double in both engines
      round(tau2, 9).as("__tau2"))
    val rand = studies.crossJoin(broadcast(card.select(col("__tau2"))))
      .select((lit(1.0) / (col("se2") + col("__tau2"))).as("wr"),
        col("e"))
      .agg(dsum(col("wr"), 12).as("__swr"),
        dsum(col("wr") * col("e"), 12).as("__swre"))
    card.crossJoin(broadcast(rand)).select(
      col("k_studies"),
      round(col("__fixed"), 6).as("fixed_effect"),
      round(col("__fixed_se"), 6).as("fixed_se"),
      round(col("__q"), 6).as("q_stat"),
      when(col("__q") > 0.0 && col("k_studies") > 1L,
        round(greatest(lit(0.0),
          (col("__q") - col("__df")) / col("__q")), 6))
        .otherwise(lit(0.0)).as("i2"),
      round(col("__tau2"), 6).as("tau2"),
      round(col("__swre") / col("__swr"), 6).as("random_effect"),
      round(sqrt(lit(1.0) / col("__swr")), 6).as("random_se"))
  }
}
