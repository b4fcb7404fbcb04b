package graft.metrics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stats._

/** Distributed rank statistics: Mann–Whitney midrank AUC without a global
  * single-partition window (reference X4,
  * `/root/reference/src/training/metrics.py:49-72`).
  *
  * The naive formulation — `row_number().over(Window.orderBy(score))` —
  * funnels the whole table through ONE task and dies at scale. This one never
  * materializes per-row ranks at all:
  *
  *   1. collapse to one row per (group, score) with a hash aggregate
  *      (`cnt`, `pos` — the only pass over the full data);
  *   2. assign each distinct score a DETERMINISTIC order-preserving bucket —
  *      a linear bin between the exact global min/max of the score (NOT
  *      `repartitionByRange`: its sampled bounds and `spark_partition_id`
  *      change between re-executions of the same subtree, which silently
  *      corrupts any plan that references the bucketed frame twice) — and
  *      compute per-bucket cumulative counts with a window PARTITIONED by
  *      (bucket, group): every task ranks only its slice;
  *   3. compute per-bucket rank offsets from the tiny (bucket, group)
  *      bucket-total frame via a broadcast triangular join — no
  *      single-partition exchange anywhere;
  *   4. midrank of a tie group of size c starting after b rows is
  *      b + (c+1)/2, so Σ ranks of positives = Σ pos·midrank, all exact
  *      (counts are longs, midranks are exact halves accumulated in decimal).
  *
  * Work per step is O(distinct scores) after step 1; the only full-data
  * shuffles are the initial hash aggregate and the min/max pass. Linear
  * binning keys bucket load to the score distribution — heavily skewed score
  * ranges concentrate buckets (an equi-depth quantile binning can be plugged
  * in here if that ever bites); ranks stay exact regardless.
  */
object RankMetrics {

  /** One row per (groupCols..., score) with `cnt`, `pos` (count of label=1),
    * and the exact Mann–Whitney `midrank` of that tie group within its group
    * partition. `buckets` bounds the bin fan-out of the distinct-score frame.
    */
  def midranks(df: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String], buckets: Int = 32): DataFrame = {
    val g = groupCols.map(col)
    val byScore = df.groupBy(g :+ col(scoreCol): _*)
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    // deterministic order-preserving binning: exact min/max (no sampling),
    // so every re-execution of this subtree assigns identical buckets
    val bounds = df.agg(
      min(col(scoreCol)).as("s_min"), max(col(scoreCol)).as("s_max"))
    val bucketed = byScore.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        when(col("s_max") <= col("s_min"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col(scoreCol) - col("s_min")) /
              (col("s_max") - col("s_min")) * buckets).cast("int"))))
      .drop("s_min", "s_max")
    val wLocal = Window.partitionBy(col("bkt") +: g: _*)
      .orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val localRanked = bucketed.withColumn("below_local",
      coalesce(sum(col("cnt")).over(wLocal), lit(0L)))
    // per-(bucket, group) totals — one tiny row per bucket
    val totals = bucketed.groupBy(col("bkt") +: g: _*)
      .agg(sum(col("cnt")).as("bucket_cnt"))
    // offset(bkt, group) = Σ bucket_cnt over same-group buckets with lower
    // bkt: a broadcast triangular self-join over the bucket-total frame
    // (≤ buckets·|groups| rows) — never a single-partition exchange
    val tHi = totals.select(
      col("bkt") +: groupCols.map(c => col(c).as(s"hi_$c")): _*)
    val tLo = totals.select(
      col("bkt").as("lo_bkt") +:
        groupCols.map(c => col(c).as(s"lo_$c")) :+
        col("bucket_cnt").as("lo_cnt"): _*)
    val cond = groupCols
      .map(c => col(s"hi_$c") === col(s"lo_$c"))
      .foldLeft(col("lo_bkt") < col("bkt"))(_ && _)
    val offsets = tHi.join(broadcast(tLo), cond, "left")
      .groupBy(col("bkt") +: groupCols.map(c => col(s"hi_$c")): _*)
      .agg(coalesce(sum(col("lo_cnt")), lit(0L)).as("offset"))
    val offsetsNamed = offsets.select(
      col("bkt") +:
        groupCols.map(c => col(s"hi_$c").as(c)) :+
        col("offset"): _*)
    localRanked
      .join(broadcast(offsetsNamed), "bkt" +: groupCols)
      .withColumn("midrank",
        (col("offset") + col("below_local")).cast("double") +
          (col("cnt") + lit(1)) / lit(2.0))
      .select((g :+ col(scoreCol)) ++
        Seq(col("cnt"), col("pos"), col("midrank")): _*)
  }

  /** Binary ROC-AUC per group (or globally when `groupCols` is empty) via
    * distributed midranks: AUC = (Σ ranks⁺ − n⁺(n⁺+1)/2) / (n⁺·n⁻).
    * Output: groupCols..., n, n_pos, auc (rounded to 6; null when a group
    * has no positives or no negatives).
    */
  def binaryAuc(df: DataFrame, scoreCol: String, labelCol: String,
      groupCols: Seq[String] = Nil): DataFrame = {
    val ranked = midranks(df, scoreCol, labelCol, groupCols)
    val aggs = Seq(
      sum(col("cnt")).as("n"),
      sum(col("pos")).as("n_pos"),
      // pos·midrank is exact at one decimal (midranks are integer halves)
      dsum(col("pos") * col("midrank"), 1).as("pos_rank_sum"))
    val base =
      if (groupCols.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
      else ranked.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
    base.select(groupCols.map(col) ++ Seq(
      col("n"),
      col("n_pos"),
      // undefined (null, ANSI-safe) when a class is absent: n⁺·n⁻ = 0
      when(col("n_pos") > 0 && col("n_pos") < col("n"),
        round(
          (col("pos_rank_sum") - col("n_pos") * (col("n_pos") + 1) / 2.0) /
            (col("n_pos") * (col("n") - col("n_pos"))), 6)).as("auc")): _*)
  }

  /** (value, midrank) lookup for one column via the bucketed distributed
    * rank — one row per distinct value, never a global per-row sort.
    */
  private def midrankLookup(df: DataFrame, valueCol: String): DataFrame =
    midranks(df.select(col(valueCol).as("__v"))
        .withColumn("__l", lit(0)), "__v", "__l", Nil)
      .select(col("__v"), col("midrank"))

  /** Spearman rank correlation of two numeric columns, ties handled by
    * midranks (the standard tie-corrected estimator ρ = Pearson on the
    * rank transforms). Both rank transforms reuse the bucketed
    * distributed midrank machinery above — no single-partition sort at
    * any cardinality — and rows recover their ranks through two
    * distinct-value equi-joins. Sufficient statistics accumulate in
    * exact decimals (midranks are integer halves), one divide + sqrt at
    * the end; zero-variance columns yield null, never 0/0.
    * Output: one row (n, rho).
    */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val rx = midrankLookup(df, xCol)
      .select(col("__v").as("__vx"), col("midrank").as("__rx"))
    val ry = midrankLookup(df, yCol)
      .select(col("__v").as("__vy"), col("midrank").as("__ry"))
    val ranked = df.select(col(xCol).as("__vx"), col(yCol).as("__vy"))
      .join(rx, "__vx").join(ry, "__vy")
    ranked.agg(
        count(lit(1)).as("n"),
        sum(col("__rx").cast("decimal(28,1)")).cast("double").as("__sx"),
        sum(col("__ry").cast("decimal(28,1)")).cast("double").as("__sy"),
        sum((col("__rx") * col("__ry")).cast("decimal(28,2)"))
          .cast("double").as("__sxy"),
        sum((col("__rx") * col("__rx")).cast("decimal(28,2)"))
          .cast("double").as("__sxx"),
        sum((col("__ry") * col("__ry")).cast("decimal(28,2)"))
          .cast("double").as("__syy"))
      .select(col("n"),
        round(
          when((col("n") * col("__sxx") - col("__sx") * col("__sx")) *
               (col("n") * col("__syy") - col("__sy") * col("__sy")) > 0d,
            (col("n") * col("__sxy") - col("__sx") * col("__sy")) /
              sqrt((col("n") * col("__sxx") - col("__sx") * col("__sx")) *
                   (col("n") * col("__syy") - col("__sy") * col("__sy")))),
          6).as("rho"))
  }

  /** One-vs-rest multiclass AUC (reference `metrics.py:59-72`): expand each
    * row into one binary problem per class (label = [cls == labelCol],
    * score = the class's score column), compute per-class binary AUC
    * distributed, and append the macro average. The expansion is a single
    * generate over one scan — |classes|·n rows, never |classes| re-reads.
    * Output: one row per class (cls, n, n_pos, auc, macro_auc) with the
    * macro value repeated.
    */
  def ovrMacroAuc(df: DataFrame, labelCol: String,
      classScores: Seq[(Int, org.apache.spark.sql.Column)]): DataFrame = {
    val pairs = classScores.map { case (cls, score) =>
      struct(lit(cls).as("cls"), score.cast("double").as("score"))
    }
    val expanded = df
      .select(col(labelCol), explode(array(pairs: _*)).as("cs"))
      .select(col("cs.cls").as("cls"),
        (col(labelCol) === col("cs.cls")).cast("int").as("bin_label"),
        col("cs.score").as("score"))
    val aucs = binaryAuc(expanded, "score", "bin_label", Seq("cls"))
    val macroAvg = aucs.agg(round(avg(col("auc")), 6).as("macro_auc"))
    aucs.crossJoin(broadcast(macroAvg))
  }

  /** Retrieval-quality card over a ranked result frame — the IR eval
    * every retrieval stack (BM25 q161, ANN q16/q182, RRF q166) is judged
    * by: per query, nDCG@k (graded gains rel/log₂(rank+1) against the
    * ideal reordering), reciprocal rank of the first relevant hit, and
    * average precision within the top k; macro-averaged into one row.
    *
    * Input: (`qCol`, `rankCol` 1-based dense per query, `relCol` graded
    * relevance ≥ 0). All per-query arithmetic is fixed-parenthesization
    * doubles on exact ranks (log₂ via ln(x)/ln2 with the ln 2 literal
    * both engines parse), per-query values rounded to 9, the macro means
    * decimal-accumulated and rounded to 6 — fully oracle-replayable.
    * The running-relevance window sum is exact (hence engine-portable)
    * for INTEGER-valued grades; fractional grades would be at the mercy
    * of each engine's windowed-sum accumulation order.
    * Queries with NO relevant hit in the top k score 0 on all three
    * (the honest macro convention: absent relevance counts, not skips).
    */
  def retrievalEvalCard(ranked: DataFrame, qCol: String, rankCol: String,
      relCol: String, k: Int): DataFrame = {
    val ln2 = 0.6931471805599453
    def r9(c: org.apache.spark.sql.Column) = round(c, 9)
    val d = ranked.filter(col(rankCol) <= k)
      .select(col(qCol).as("q"), col(rankCol).cast("long").as("rank"),
        col(relCol).cast("double").as("rel"))
    val wIdeal = Window.partitionBy(col("q"))
      .orderBy(col("rel").desc, col("rank").asc)
    val wCum = Window.partitionBy(col("q")).orderBy(col("rank"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = d
      .withColumn("__ipos", row_number().over(wIdeal).cast("long"))
      .withColumn("__gain",
        col("rel") / (log(col("rank").cast("double") + 1.0) / lit(ln2)))
      .withColumn("__igain",
        col("rel") / (log(col("__ipos").cast("double") + 1.0) / lit(ln2)))
      .withColumn("__cumrel", sum(col("rel")).over(wCum))
      .withColumn("__prec",
        when(col("rel") > 0.0,
          col("__cumrel") / col("rank").cast("double")))
    val perQ = scored.groupBy(col("q")).agg(
        dsum(col("__gain"), 12).as("__dcg"),
        dsum(col("__igain"), 12).as("__idcg"),
        min(when(col("rel") > 0.0, col("rank"))).as("__firstrel"),
        dsum(coalesce(col("__prec"), lit(0.0)), 12).as("__sumprec"),
        sum(when(col("rel") > 0.0, 1L).otherwise(0L)).as("__nrel"))
      .withColumn("ndcg",
        when(col("__idcg") > 0.0, r9(col("__dcg") / col("__idcg")))
          .otherwise(lit(0.0)))
      .withColumn("rr",
        when(col("__firstrel").isNotNull,
          r9(lit(1.0) / col("__firstrel").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("ap",
        when(col("__nrel") > 0L,
          r9(col("__sumprec") / col("__nrel").cast("double")))
          .otherwise(lit(0.0)))
    perQ.agg(
      count(lit(1)).as("n_queries"),
      round(dsum(col("ndcg"), 12) / count(lit(1)), 6)
        .as(s"mean_ndcg_at_$k"),
      round(dsum(col("rr"), 12) / count(lit(1)), 6).as("mrr"),
      round(dsum(col("ap"), 12) / count(lit(1)), 6).as("mean_ap"))
  }

  /** Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
    * orderings of the same items, truncated at `depth`:
    *
    *   RBO@d = (1−p)·Σ_{i=1..d} p^{i−1}·X_i/i,
    *
    * X_i = |top-i(A) ∩ top-i(B)|. The top-weighted ranking-agreement
    * score a retrieval/curation A-B test needs (Spearman over full
    * lists drowns the head in the tail; RBO's geometric weights read
    * like a user scanning results). `p` sets the eye-depth: 0.9 ≈ the
    * top ~10 ranks carry ~86% of the weight.
    *
    * Portability: both rankings are deterministic (`orderA`/`orderB`
    * must be total orders — tie-break on the id); X_i counts come from
    * max(rank_A, rank_B) ≤ i on the joined top-depth frames; p^{i−1}
    * is computed as exp((i−1)·ln p) — the exp/ln pair is the proven
    * cross-engine-identical path, where pow() is not; depth terms sum
    * in exact decimal.
    *
    * Scale shape: two TakeOrdered top-`depth` selections are the only
    * contact with the data; the join, the depth explosion and the sum
    * all live on ≤ depth-row frames.
    */
  def rankBiasedOverlap(df: DataFrame, idCol: String, orderA: Seq[
      org.apache.spark.sql.Column], orderB: Seq[org.apache.spark.sql.Column],
      depth: Int = 50, p: Double = 0.9): DataFrame = {
    require(depth >= 1 && p > 0.0 && p < 1.0, "need depth >= 1, p in (0,1)")
    def top(order: Seq[org.apache.spark.sql.Column], rn: String) = {
      val t = df.orderBy(order: _*).limit(depth)
      t.withColumn(rn, row_number().over(
        Window.orderBy(order: _*)).cast("long"))
        .select(col(idCol), col(rn))
    }
    val a = top(orderA, "ia")
    val b = top(orderB, "ib")
    val joined = a.join(b, idCol)
      .select(greatest(col("ia"), col("ib")).as("m"))
    val depths = df.sparkSession.range(1, depth + 1)
      .select(col("id").cast("long").as("i"))
    val xi = depths.join(joined, col("m") <= col("i"), "left")
      .groupBy(col("i"))
      .agg(sum(when(col("m").isNotNull, 1L).otherwise(0L)).as("x"))
    val terms = xi.select(col("i"), col("x"),
      (exp((col("i").cast("double") - lit(1.0)) * log(lit(p))) *
        col("x").cast("double") / col("i").cast("double"))
        .cast("decimal(38,12)").as("__t"))
    terms.agg(
        max(when(col("i") === depth, col("x"))).as("overlap_at_depth"),
        sum(col("__t")).cast("double").as("__s"))
      .select(lit(depth.toLong).as("depth"), lit(p).as("p"),
        round((lit(1.0) - lit(p)) * col("__s"), 6).as("rbo"),
        col("overlap_at_depth"),
        round(col("overlap_at_depth").cast("double") / lit(depth.toDouble),
          6).as("agreement_at_depth"))
  }

  /** DeLong (1988) nonparametric variance and 95% CI for the binary
    * ROC-AUC — the error bar the point estimate in [[binaryAuc]] lacks.
    * Uses the fast placement form: for a positive with combined midrank R
    * and within-positive midrank R⁺, V₁₀ = (R − R⁺)/n₀ (tie-correct);
    * symmetrically V₀₁ = 1 − (R − R⁻)/n₁ for negatives. Then
    * Var(AUC) = S₁₀/n₁ + S₀₁/n₀ with S the sample variances of the
    * placements.
    *
    * Scale shape: three [[midranks]] passes (combined, positives,
    * negatives), each O(distinct scores) after its hash aggregate, joined
    * per distinct score — placements are never materialized per row.
    * Placement moments accumulate as DECIMAL(28,12) of fixed-shape double
    * terms (midranks are exact halves) — engine-portable.
    */
  def delongAuc(df: DataFrame, scoreCol: String,
      labelCol: String): DataFrame = {
    val lbl = col(labelCol).cast("int")
    val all = midranks(df, scoreCol, labelCol, Nil)
    val posR = midranks(df.filter(lbl === 1), scoreCol, labelCol, Nil)
      .select(col(scoreCol), col("midrank").as("__rp"))
    val negR = midranks(df.filter(lbl === 0), scoreCol, labelCol, Nil)
      .select(col(scoreCol), col("midrank").as("__rn"))
    val totals = all.agg(sum(col("pos")).as("__n1"),
      sum(col("cnt") - col("pos")).as("__n0"))
    val j = all
      .join(posR, Seq(scoreCol), "left")
      .join(negR, Seq(scoreCol), "left")
      .crossJoin(broadcast(totals))
    val n1D = col("__n1").cast("double")
    val n0D = col("__n0").cast("double")
    val v10 = (col("midrank") - col("__rp")) / n0D
    val v01 = lit(1.0) - (col("midrank") - col("__rn")) / n1D
    val negCnt = col("cnt") - col("pos")
    val agg = j.agg(
      first(col("__n1")).as("__n1"),
      first(col("__n0")).as("__n0"),
      dsum(when(col("pos") > 0, col("pos").cast("double") * v10)
        .otherwise(lit(0.0)), 12).as("__s10"),
      dsum(when(col("pos") > 0,
        col("pos").cast("double") * (v10 * v10))
        .otherwise(lit(0.0)), 12).as("__s10sq"),
      dsum(when(negCnt > 0, negCnt.cast("double") * v01)
        .otherwise(lit(0.0)), 12).as("__s01"),
      dsum(when(negCnt > 0,
        negCnt.cast("double") * (v01 * v01))
        .otherwise(lit(0.0)), 12).as("__s01sq"))
    val m1D = col("__n1").cast("double")
    val m0D = col("__n0").cast("double")
    val auc10 = col("__s10") / m1D
    val auc01 = col("__s01") / m0D
    val var10 = (col("__s10sq") - m1D * (auc10 * auc10)) / (m1D - lit(1.0))
    val var01 = (col("__s01sq") - m0D * (auc01 * auc01)) / (m0D - lit(1.0))
    val varAuc = var10 / m1D + var01 / m0D
    val se = sqrt(varAuc)
    agg
      .filter(col("__n1") > 1 && col("__n0") > 1)
      .select(
        (col("__n1") + col("__n0")).as("n"),
        col("__n1").as("n_pos"),
        round(auc10, 6).as("auc"),
        round(se, 6).as("se_delong"),
        round(auc10 - lit(1.959963984540054) * se, 6).as("ci_lo"),
        round(auc10 + lit(1.959963984540054) * se, 6).as("ci_hi"))
  }

  /** Average precision (area under the precision–recall curve, the
    * step-wise sklearn estimator, no interpolation): thresholds sweep the
    * distinct scores descending and
    * AP = Σ_s (pos_s/n₁) · (TP≥s / (TP≥s + FP≥s)).
    * The PR companion to [[binaryAuc]] — the honest metric under class
    * imbalance, graded against the prevalence baseline it must beat.
    *
    * Scale shape: one hash aggregate to the distinct-score frame, then
    * the [[midranks]] bucketed prefix scheme for the descending
    * cumulatives (exact BIGINTs; TP≥s = n₁ − pos-below ascending) — no
    * single-partition stage; term sums as DECIMAL(28,12).
    */
  def averagePrecision(df: DataFrame, scoreCol: String, labelCol: String,
      buckets: Int = 32): DataFrame = {
    val byScore = df.groupBy(col(scoreCol))
      .agg(count(lit(1)).as("cnt"),
        sum(col(labelCol).cast("long")).as("pos"))
    val bounds = df.agg(
      min(col(scoreCol)).as("s_min"), max(col(scoreCol)).as("s_max"))
    val bucketed = byScore.crossJoin(broadcast(bounds))
      .withColumn("bkt",
        when(col("s_max") <= col("s_min"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col(scoreCol) - col("s_min")) /
              (col("s_max") - col("s_min")) * buckets).cast("int"))))
      .drop("s_min", "s_max")
    val wLocal = Window.partitionBy(col("bkt")).orderBy(col(scoreCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = bucketed
      .withColumn("__below_p", coalesce(sum(col("pos")).over(wLocal), lit(0L)))
      .withColumn("__below_n",
        coalesce(sum(col("cnt") - col("pos")).over(wLocal), lit(0L)))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("bkt"))
      .agg(sum(col("pos")).as("__tp"), sum(col("cnt") - col("pos")).as("__tn"))
      .withColumn("__off_p", coalesce(sum(col("__tp")).over(wOff), lit(0L)))
      .withColumn("__off_n", coalesce(sum(col("__tn")).over(wOff), lit(0L)))
      .select(col("bkt"), col("__off_p"), col("__off_n"))
    val totals = byScore.agg(
      sum(col("pos")).as("__n1"), sum(col("cnt") - col("pos")).as("__n0"))
    val g = local.join(broadcast(offsets), "bkt")
      .crossJoin(broadcast(totals))
      .withColumn("__tp_ge", col("__n1") - (col("__off_p") + col("__below_p")))
      .withColumn("__fp_ge", col("__n0") - (col("__off_n") + col("__below_n")))
    val term = when(col("pos") > 0,
      (col("pos").cast("double") / col("__n1").cast("double")) *
        (col("__tp_ge").cast("double") /
          (col("__tp_ge") + col("__fp_ge")).cast("double")))
      .otherwise(lit(0.0))
    g.groupBy(col("__n1"), col("__n0"))
      .agg(dsum(term, 12).as("__ap"))
      .filter(col("__n1") > 0)
      .select(
        (col("__n1") + col("__n0")).as("n"),
        col("__n1").as("n_pos"),
        round(col("__ap"), 6).as("pr_auc"),
        round(col("__n1").cast("double") /
          (col("__n1") + col("__n0")).cast("double"), 6).as("prevalence"))
  }

  /** Hosmer–Lemeshow goodness-of-calibration test (1980): rows cut
    * into `nBins` deciles of predicted RISK (ascending, by the
    * [[midranks]] distributed scheme — tied scores land in one bin),
    * per bin observed vs expected positives, Ĉ = Σ (O−E)²/(E(1−E/n))
    * against χ²(k−2) — the TEST companion to the reliability diagram
    * (q84 bins, q197 ECE summarize; this says whether the deviation is
    * statistically real).
    *
    * Exactness: bin memberships from exact midranks; E = Σp per bin is
    * an exact decimal sum at the score's true scale; each bin term is
    * one fixed double shape rounded to 9 into the decimal statistic.
    *
    * Scale shape: the midranks distributed prefix scheme + one grouped
    * reduction; no global per-row sort.
    */
  def hosmerLemeshowCard(df: DataFrame, scoreCol: String,
      labelCol: String, nBins: Int = 10, scoreScale: Int = 6): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val mr = midranks(df, scoreCol, labelCol, Nil)
    val totals = mr.agg(sum(col("cnt")).as("__n"))
    val binned = mr.crossJoin(broadcast(totals))
      .withColumn("bin",
        ceil(col("midrank") * lit(nBins) / col("__n").cast("double"))
          .cast("long"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("obs_pos"),
        dsum(col(scoreCol) * col("cnt").cast("double"), scoreScale)
          .as("__e"))
    val nD = col("n").cast("double")
    val oD = col("obs_pos").cast("double")
    val term = when(col("__e") > 0.0 && col("__e") < nD,
      round((oD - col("__e")) * (oD - col("__e")) /
        (col("__e") * (lit(1.0) - col("__e") / nD)), 9)
        .cast("decimal(38,9)"))
    val stat = binned
      .select(col("bin"), col("n"), col("obs_pos"), col("__e"),
        term.as("__t"))
      .groupBy()
      .agg(count(col("__t")).as("__k"),
        sum(col("__t")).cast("double").as("__hl"))
    binned.crossJoin(broadcast(stat))
      .select(col("bin"), col("n"), col("obs_pos"),
        round(col("__e"), 6).as("exp_pos"),
        round(col("__hl"), 6).as("hl_stat"),
        (col("__k") - 2L).as("df"))
      .orderBy(col("bin"))
  }

  /** Lift / cumulative-gains table: rows ranked by score descending and
    * cut into `nBins` population bins (campaign deciles); per bin the
    * positive rate, lift over base rate, and cumulative capture
    * (gain = share of all positives caught by the top bins). The
    * model-targeting readout next to [[binaryAuc]] (threshold-free) and
    * averagePrecision (top-heavy): "mail decile 1 and you reach X% of
    * converters at Y× random".
    *
    * Binning rides the distributed [[midranks]] machinery — a tie
    * group's bin comes from its midrank from the top,
    * ⌈(n − midrank + 1)·nBins/n⌉, so no global per-row sort exists and
    * ties land deterministically in ONE bin (the classical "don't split
    * tied scores across deciles" rule). Cumulatives are a window over
    * the ≤ nBins-row frame.
    */
  def liftGainsCard(df: DataFrame, scoreCol: String, labelCol: String,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val mr = midranks(df, scoreCol, labelCol, Nil)
    val totals = mr.agg(sum(col("cnt")).as("__n"),
      sum(col("pos")).as("__p"))
    val binned = mr.crossJoin(broadcast(totals))
      .withColumn("bin",
        ceil((col("__n").cast("double") - col("midrank") + lit(1.0)) *
          lit(nBins) / col("__n").cast("double")).cast("long"))
      .groupBy(col("bin"))
      .agg(sum(col("cnt")).as("n"), sum(col("pos")).as("n_pos"),
        max(col("__n")).as("__nt"), max(col("__p")).as("__pt"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = col("__pt").cast("double") / col("__nt").cast("double")
    binned
      .withColumn("cum_n", sum(col("n")).over(wCum))
      .withColumn("cum_pos", sum(col("n_pos")).over(wCum))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("n_pos").cast("double") / col("n").cast("double"), 6)
          .as("pos_rate"),
        when(col("__pt") > 0L, round(
          (col("n_pos").cast("double") / col("n").cast("double")) / base,
          6)).as("lift"),
        col("cum_n"), col("cum_pos"),
        when(col("__pt") > 0L, round(col("cum_pos").cast("double") /
          col("__pt").cast("double"), 6)).as("cum_gain"),
        when(col("__pt") > 0L, round(
          (col("cum_pos").cast("double") / col("cum_n").cast("double")) /
            base, 6)).as("cum_lift"))
      .orderBy(col("bin"))
  }

  /** RFM segmentation (recency / frequency / monetary quintiles) — the
    * classic customer-value map, built on the distributed [[midranks]]
    * machinery so tied values share a quintile and the codes are
    * engine- and partition-order-portable. R scores 5 = most RECENT
    * (descending bins, q321's formula); F and M score 5 = highest.
    * One row per populated (r, f, m) cell with its size, share, and
    * exact-decimal mean monetary value.
    *
    * Scale shape: one per-customer aggregation, three value-collapsed
    * midrank passes (the bucketed no-global-sort scheme), then the
    * per-value quintile maps join back — recency and frequency by
    * broadcast (their value domains are bounded: days-since and order
    * counts), monetary by shuffle equi-join (its distinct values are
    * ~O(customers), too wide to pin on the driver), one cell
    * aggregation.
    */
  def rfmSegments(orders: DataFrame, custCol: String, tsCol: String,
      amtCol: String, nBins: Int = 5): DataFrame = {
    import graft.functions.Stats.dsum
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val horizon = orders
      .agg(max(unix_micros(col(tsCol).cast("timestamp"))).as("__hz"))
    val perCust = orders
      .filter(col(custCol).isNotNull)
      .groupBy(col(custCol).as("cust"))
      .agg(max(unix_micros(col(tsCol).cast("timestamp"))).as("__last"),
        count(lit(1)).as("freq"),
        sum(col(amtCol).cast("decimal(28,2)")).as("__m"))
      .crossJoin(broadcast(horizon))
      .select(col("cust"),
        expr("(__hz - __last) div 86400000000").as("recency"),
        col("freq"), col("__m").cast("double").as("monetary"))
      .withColumn("__z", lit(0L))
    def quintile(valCol: String, descending: Boolean): DataFrame = {
      val mr = midranks(perCust, valCol, "__z", Nil)
      val tot = mr.agg(sum(col("cnt")).as("__n"))
      val q =
        if (descending)
          ceil((col("__n").cast("double") - col("midrank") + lit(1.0)) *
            lit(nBins) / col("__n").cast("double"))
        else
          ceil(col("midrank") * lit(nBins) / col("__n").cast("double"))
      mr.crossJoin(broadcast(tot))
        .select(col(valCol), q.cast("long").as(s"${valCol}_q"))
    }
    val cells = perCust
      .join(broadcast(quintile("recency", descending = true)), "recency")
      .join(broadcast(quintile("freq", descending = false)), "freq")
      .join(quintile("monetary", descending = false), "monetary")
      .groupBy(col("recency_q").as("r"), col("freq_q").as("f"),
        col("monetary_q").as("m"))
      .agg(count(lit(1)).as("n_customers"),
        dsum(col("monetary"), 2).as("__sm"))
    val tot = cells.agg(sum(col("n_customers")).as("__nt"))
    cells.crossJoin(broadcast(tot))
      .select(col("r"), col("f"), col("m"), col("n_customers"),
        round(col("__sm") / col("n_customers").cast("double"), 6)
          .as("mean_monetary"),
        round(col("n_customers").cast("double") /
          col("__nt").cast("double"), 6).as("share"))
      .orderBy(col("r"), col("f"), col("m"))
  }
}
