package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: the per-column audit (row/null/distinct counts) that
  * gates every ingest into a training-data lake. One aggregation pass per
  * profiled column over a shared scan — column pruning keeps each pass to
  * exactly the profiled column, and the per-column results are tiny one-row
  * frames unioned into the report, so the operator is a constant number of
  * linear scans regardless of data volume (and a single scan after the
  * unions collapse under shared-scan reuse).
  */
object ProfileOps {

  /** Profile the named columns: row count, null count and fraction, and
    * exact distinct count (nulls excluded, SQL semantics). `keyExpr`
    * optionally maps a column before counting distincts (e.g. timestamps
    * to epoch micros so precision quirks don't leak into the count).
    * For the trillion-distinct regime swap the exact count for
    * `approx_count_distinct` — q53 proves that path; this operator is the
    * audit-exact variant.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
      keyExpr: Map[String, Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    cols.map { c =>
      val v = keyExpr.getOrElse(c, col(c))
      df.agg(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        round(sum(when(col(c).isNull, 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 6).as("null_frac"),
        countDistinct(v).as("n_distinct"))
    }.reduce(_.unionByName(_))
  }

  /** One-pass embedding-diversity card: mean squared norm E‖x‖², squared
    * norm of the mean vector ‖x̄‖², and the mean pairwise squared
    * Euclidean distance via the identity E‖x−y‖² = 2·(E‖x‖² − ‖x̄‖²)
    * (independent draws) — the corpus-diversity audit behind "is this
    * source adding coverage or repeating itself", computed WITHOUT any
    * pair join: one posexplode + one per-dimension aggregation of exact
    * decimal sums (≤ dim rows out), then one combine. At corpus scale
    * this is a single linear pass where the naive pairwise estimate is
    * O(n²); the per-dim (s/n)² terms round to 8 decimals then sum
    * exactly, so the card replays bit-for-bit in SQL.
    */
  def embeddingDiversity(df: DataFrame, vecCol: String): DataFrame = {
    // decimal sums stay DECIMAL through both aggregation levels (one
    // cast to double only at the point of an IEEE division) — a
    // double→decimal round-trip between levels would expose the two
    // engines' cast-rounding conventions
    val perDim = df
      .select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "__v")))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("__n"),
        sum(col("__v").cast("decimal(28,6)")).as("__s"),
        sum((col("__v") * col("__v")).cast("decimal(38,8)")).as("__q"))
      // (s/n)² rounded to a fixed grid per dimension, summed exactly —
      // addition-order-free on both engines (the q176 ANOVA trick)
      .withColumn("__term",
        round((col("__s").cast("double") / col("__n")) *
            (col("__s").cast("double") / col("__n")), 8)
          .cast("decimal(28,8)"))
    perDim.agg(
        max(col("__n")).as("n_vecs"),
        count(lit(1)).as("n_dims"),
        (sum(col("__q")).cast("double") / max(col("__n"))).as("__msq"),
        sum(col("__term")).cast("double").as("__nms"))
      .select(col("n_vecs"), col("n_dims"),
        round(col("__msq"), 6).as("mean_sq_norm"),
        round(col("__nms"), 6).as("sq_norm_of_mean"),
        round(lit(2.0) * (col("__msq") - col("__nms")), 6)
          .as("mean_pair_sq_dist"))
  }

  /** Order-invariant table content fingerprint: the exact-decimal SUM of a
    * portable 60-bit MD5 row hash over `cols`, plus the row count — the
    * replica/migration verification primitive. Two copies of a 100 TB
    * table compare by exchanging ONE (count, fingerprint) row each,
    * independent of partitioning, file layout, and row order (sum is
    * commutative; decimal(38,0) holds 2⁶⁰ × 10¹⁸ rows without overflow,
    * so no wraparound convention needs to match between engines). Nulls
    * hash as an explicit sentinel so ('a', null) ≠ ('anull').
    *
    * The fingerprint returns as a STRING so it survives any client's
    * numeric layer unchanged. Columns should be cast-stable types
    * (integers/strings/dates) — double→string formatting differs across
    * engines, so hash the key columns, not the measures.
    */
  def contentFingerprint(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "contentFingerprint needs at least one column")
    val parts = cols.map(c =>
      coalesce(col(c).cast("string"), lit("null")))
    val rowHash = conv(substring(md5(concat_ws("|", parts: _*)), 1, 15),
      16, 10).cast("decimal(38,0)")
    df.select(rowHash.as("__h"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("__h")).cast("string").as("fingerprint"))
  }

  /** k-anonymity audit over a quasi-identifier column set — the privacy
    * gate run before releasing or training on user-adjacent data: every
    * row whose quasi-identifier combination is shared by fewer than `k`
    * rows is re-identifiable at that granularity. ONE group-size
    * aggregation plus one card aggregation — no joins, no sort; the card
    * is a single row (n_rows, n_groups, min_group_size, rows below k,
    * fraction).
    */
  def kAnonymityCard(df: DataFrame, quasiCols: Seq[String],
      k: Long): DataFrame = {
    require(quasiCols.nonEmpty && k >= 2, "need quasi columns and k >= 2")
    val groups = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
    groups.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__n")).as("min_group_size"),
        sum(when(col("__n") < k, col("__n")).otherwise(0L))
          .as("n_rows_below_k"))
      .withColumn("k", lit(k))
      .withColumn("frac_below_k",
        round(col("n_rows_below_k").cast("double") /
          col("n_rows").cast("double"), 6))
      .select(col("k"), col("n_rows"), col("n_groups"),
        col("min_group_size"), col("n_rows_below_k"), col("frac_below_k"))
  }

  /** Pearson correlation matrix over the named numeric columns — the
    * feature-redundancy screen (which measures move together, which are
    * safe to drop) — in ONE aggregation pass: all per-column sums,
    * squares, and pairwise cross-products accumulate as exact decimals in
    * a single scan (k columns → k(k+1)/2 + k accumulators, never a second
    * read), then the m(m−1)/2 correlations are pure driver arithmetic on
    * the one sufficient-statistics row. r computed with the fixed
    * parenthesization (n·Σxy − ΣxΣy)/(√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²)),
    * rounded to 6. Squares/products accumulate at decimal scale 6 — a
    * deterministic cast both engines share (the q197 convention); a
    * constant column yields a NULL correlation (zero variance), never
    * NaN.
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    import graft.functions.Stats.dsum
    require(cols.size >= 2, "need at least two columns")
    val spark = df.sparkSession
    import spark.implicits._
    // fanned out (ParOps): k(k+3)/2 decimal accumulators per row is
    // gmm-class per-row work, and a one-row-group scan would run the
    // whole pass on one core (decimal sums are order-free)
    val d = graft.operators.ParOps.fanOut(
      df.select(cols.map(c => col(c).cast("double").as(c)): _*),
      weight = 4.0)
    val pairs = for {
      i <- cols.indices; j <- cols.indices if i < j
    } yield (cols(i), cols(j))
    val aggs =
      cols.map(c => dsum(col(c), 6).as(s"s_$c")) ++
      cols.map(c => dsum(col(c) * col(c), 6).as(s"q_$c")) ++
      pairs.map { case (a, b) => dsum(col(a) * col(b), 6).as(s"p_${a}_$b") }
    val r = d.agg(count(lit(1)).as("n"), aggs: _*).head()
    val n = r.getLong(0).toDouble
    def g(name: String): Double = r.getDouble(r.fieldIndex(name))
    val out = pairs.map { case (a, b) =>
      val (sx, sy) = (g(s"s_$a"), g(s"s_$b"))
      val (qx, qy) = (g(s"q_$a"), g(s"q_$b"))
      val pxy = g(s"p_${a}_$b")
      val vx = n * qx - sx * sx
      val vy = n * qy - sy * sy
      val corr: Option[Double] =
        if (vx > 0.0 && vy > 0.0)
          Some(new java.math.BigDecimal(
            (n * pxy - sx * sy) / (math.sqrt(vx) * math.sqrt(vy)))
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
        else None
      (a, b, r.getLong(0), corr)
    }
    out.toDF("col_a", "col_b", "n", "corr")
      .orderBy(col("col_a"), col("col_b"))
  }

  /** l-diversity audit (Machanavajjhala et al. 2007 — the upgrade of
    * [[kAnonymityCard]] the privacy literature demands: a large
    * quasi-group is still disclosive when everyone in it shares the
    * SAME sensitive value): per quasi-identifier group, the count of
    * distinct sensitive values; the card reports groups/rows below `l`
    * and the worst single-value disclosure probability
    * max over groups of (modal sensitive count / group size).
    *
    * Scale shape: two stacked aggregations — (quasi, sensitive) counts,
    * then per-quasi distinct/total/modal — and a one-row card; no
    * joins, no sort, no distinct shuffle beyond the first groupBy.
    */
  def lDiversityCard(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, l: Long): DataFrame = {
    require(quasiCols.nonEmpty && l >= 2, "need quasi columns and l >= 2")
    val qs = quasiCols.map(col)
    val gs = df.groupBy(qs :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val gg = gs.groupBy(qs: _*)
      .agg(count(lit(1)).as("__d"), sum(col("__c")).as("__n"),
        max(col("__c")).as("__mx"))
    gg.agg(
        sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        min(col("__d")).as("min_distinct_sensitive"),
        sum(when(col("__d") < l, 1L).otherwise(0L)).as("n_groups_below_l"),
        sum(when(col("__d") < l, col("__n")).otherwise(0L))
          .as("n_rows_below_l"),
        round(max(col("__mx").cast("double") / col("__n").cast("double")),
          6).as("worst_disclosure"))
      .withColumn("l", lit(l))
      .withColumn("frac_rows_below_l",
        round(col("n_rows_below_l").cast("double") /
          col("n_rows").cast("double"), 6))
      .select(col("l"), col("n_rows"), col("n_groups"),
        col("min_distinct_sensitive"), col("n_groups_below_l"),
        col("n_rows_below_l"), col("frac_rows_below_l"),
        col("worst_disclosure"))
  }

  /** Laplace-mechanism histogram SIMULATION (Dwork et al. 2006) — a
    * calibration card, NOT a privacy mechanism. The noise is derived
    * deterministically from the PUBLIC group key (60-bit MD5 polynomial
    * through the engine-portable two-round congruential generator, the
    * [[SplitOps.prioritySample]] family), so anyone can recompute each
    * group's draw and invert n_noisy back to n_true exactly: NOTHING
    * here is differentially private. The seeding exists so the draw is
    * replayable in plain SQL for the oracle gate; a production release
    * would swap the key-seeded draw for a run-secret source of
    * randomness — portability and privacy are mutually exclusive in
    * this operator, and this implementation chooses portability. What
    * the card legitimately answers is the CALIBRATION question: for a
    * given ε, what error magnitude does Laplace(1/ε) noise impose on
    * counts of this histogram's shape. Mechanics: b = 1/ε via the
    * inverse CDF X = −b·sgn(v)·ln(1−2|v|), v = u − ½ ∈ (−½, ½)
    * strictly (u = (x₂ + 0.5)/p₂ keeps the log argument positive);
    * disjoint groups → parallel composition (one histogram costs ε,
    * not |groups|·ε) — properties a real release would inherit.
    *
    * NULL group keys are excluded (an MD5 of NULL has no draw; a real
    * release would pre-coalesce them into an explicit bucket).
    *
    * Scale shape: one count aggregation over the data; noise is a
    * per-group stateless projection on the |groups|-row frame.
    */
  def dpNoisyHistogram(df: DataFrame, groupCol: String,
      eps: Double = 1.0): DataFrame = {
    require(eps > 0.0, "eps must be positive")
    val p1 = 1000003L
    val p2 = 9999991L
    val h = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol)).agg(count(lit(1)).as("n_true"))
    val hx = conv(substring(md5(col(groupCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val hdiv = (hx.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(hx, lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + hdiv, lit(p2)) * lit(22695477L), lit(p2))
    val u = (x2.cast("double") + lit(0.5)) / lit(p2.toDouble)
    val v = u - lit(0.5)
    val lnArg = lit(1.0) - lit(2.0) * abs(v)
    val noise = round(
      (when(v >= 0.0, lit(-1.0)).otherwise(lit(1.0)) * log(lnArg)) /
        lit(eps), 6)
    h.withColumn("noise", noise)
      .withColumn("n_noisy",
        round(col("n_true").cast("double") + col("noise"), 6))
      .withColumn("eps", lit(eps))
      .orderBy(col(groupCol))
  }

  /** Laplace-mechanism clipped-mean SIMULATION — [[dpNoisyHistogram]]'s
    * numeric sibling, same portability-over-privacy contract (the two
    * draws are seeded from PUBLIC literals so the oracle can replay
    * them; a production release would use run-secret randomness). The
    * standard two-query mean: values clip to [0, `hi`] (sum sensitivity
    * hi, count sensitivity 1), the budget splits ε/2 + ε/2, and the
    * released mean is noisy_sum/noisy_count — the card answers the
    * CALIBRATION question "what error does ε impose on a mean of this
    * n and range".
    *
    * Exactness: the clipped sum is an exact decimal at the value's
    * scale; both Laplace draws ride the proven two-round congruential
    * inverse-CDF; everything after is fixed double shapes.
    *
    * Scale shape: one aggregation over the scan; noise on a 1-row frame.
    */
  def dpClippedMean(df: DataFrame, valCol: String, hi: Double,
      eps: Double = 1.0, seed: String = "dpmean",
      valScale: Int = 2): DataFrame = {
    require(eps > 0.0 && hi > 0.0, "eps and hi must be positive")
    val p1 = 1000003L
    val p2 = 9999991L
    def draw(tag: String): Column = {
      val hx = conv(substring(md5(lit(s"$seed:$tag")), 1, 15), 16, 10)
        .cast("long")
      val hdiv = (hx.cast("decimal(38,0)") / lit(p1)).cast("long")
      val x1 = pmod(pmod(hx, lit(p1)) * lit(2654435761L), lit(p1))
      val x2 = pmod(pmod(x1 + hdiv, lit(p2)) * lit(22695477L), lit(p2))
      val u = (x2.cast("double") + lit(0.5)) / lit(p2.toDouble)
      val v = u - lit(0.5)
      when(v >= 0.0, lit(-1.0)).otherwise(lit(1.0)) *
        log(lit(1.0) - lit(2.0) * abs(v))
    }
    val clipped = least(greatest(col(valCol).cast("double"), lit(0.0)),
      lit(hi))
    val agg = df.filter(col(valCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        graft.functions.Stats.dsum(clipped, valScale).as("__s"))
    val halfEps = eps / 2.0
    val noisySum = col("__s") + round(draw("sum") * lit(hi / halfEps), 6)
    val noisyCnt = col("n").cast("double") +
      round(draw("count") * lit(1.0 / halfEps), 6)
    agg.select(col("n"),
        round(col("__s") / col("n").cast("double"), 6).as("mean_true"),
        round(noisySum, 6).as("noisy_sum"),
        round(noisyCnt, 6).as("noisy_count"),
        round(noisySum / noisyCnt, 6).as("dp_mean"),
        lit(eps).as("eps"))
      .withColumn("abs_err",
        round(abs(col("dp_mean") - col("mean_true")), 6))
  }

  /** Randomized-response SIMULATION (Warner 1965) — the oldest local-DP
    * mechanism, completing the privacy battery's collection side
    * (q237/q363 add noise at the AGGREGATE; this adds it at the
    * RESPONDENT, so no raw truth ever needs to be collected): each unit
    * answers truthfully with probability `pTruth`, otherwise flips a
    * fair coin; the population rate unbiases as
    * π̂ = (ŷ − (1−p)/2)/p with SE = √(ŷ(1−ŷ)/n)/p. The card carries the
    * true rate, so the privacy-for-variance trade is measured.
    *
    * Same portability-over-privacy contract as [[dpClippedMean]]: both
    * per-unit draws are seeded from the PUBLIC unit id through the
    * two-round congruential generator, so the oracle replays every
    * coin; a production release would use run-secret randomness.
    *
    * Scale shape: two per-row hash draws (projections, no shuffle) and
    * one 1-row aggregation.
    */
  def randomizedResponse(perUnit: DataFrame, idCol: String,
      truthCol: String, pTruth: Double = 0.75,
      salt: String = "rr"): DataFrame = {
    require(pTruth > 0.5 && pTruth < 1.0,
      s"pTruth must be in (0.5, 1), got $pTruth")
    val p1 = 1000003L
    val p2 = 9999991L
    def draw(tag: String): Column = {
      val hx = conv(substring(md5(concat(lit(s"$salt:$tag:"),
        col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
      val hdiv = (hx.cast("decimal(38,0)") / lit(p1)).cast("long")
      val x1 = pmod(pmod(hx, lit(p1)) * lit(2654435761L), lit(p1))
      val x2 = pmod(pmod(x1 + hdiv, lit(p2)) * lit(22695477L), lit(p2))
      (x2.cast("double") + lit(0.5)) / lit(p2.toDouble)
    }
    val honest = draw("h") < lit(pTruth)
    val coin = draw("c") < lit(0.5)
    val resp = when(honest, col(truthCol)).otherwise(coin)
    val agg = perUnit.filter(col(truthCol).isNotNull)
      .agg(count(lit(1)).as("n"),
        sum(when(col(truthCol), 1L).otherwise(0L)).as("__nt"),
        sum(when(resp, 1L).otherwise(0L)).as("__ny"))
    val nD = col("n").cast("double")
    val y = col("__ny").cast("double") / nD
    val est = (y - (lit(1.0) - lit(pTruth)) / lit(2.0)) / lit(pTruth)
    val se = sqrt(y * (lit(1.0) - y) / nD) / lit(pTruth)
    agg.select(col("n"),
      round(col("__nt").cast("double") / nD, 6).as("true_rate"),
      round(y, 6).as("observed_yes_rate"),
      round(est, 6).as("rr_estimate"),
      round(se, 6).as("rr_se"),
      round(abs(est - col("__nt").cast("double") / nD), 6).as("abs_err"),
      lit(pTruth).as("p_truth"))
  }

  /** Re-identification risk card over a quasi-identifier combination:
    * how many records are UNIQUE (cell size 1 — linkable by anyone
    * holding the same attributes), in cells ≤ 2, the cell-size spread —
    * the attacker's-eye summary that motivates the k-anonymity /
    * l-diversity / t-closeness battery (q217/q236/q249 check a chosen
    * k; this card says what the data's ACTUAL k profile is).
    *
    * Exactness: everything is exact integer counting; two ratios at
    * the end.
    *
    * Scale shape: one grouped count over the scan + one reduction over
    * the cell frame.
    */
  def uniquenessRiskCard(df: DataFrame,
      quasiCols: Seq[Column]): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier")
    val cells = df.groupBy(quasiCols: _*).agg(count(lit(1)).as("c"))
    cells.agg(
        sum(col("c")).as("n_records"),
        count(lit(1)).as("n_cells"),
        sum(when(col("c") === 1L, 1L).otherwise(0L)).as("k1_cells"),
        sum(when(col("c") === 1L, col("c")).otherwise(0L))
          .as("k1_records"),
        sum(when(col("c") <= 2L, col("c")).otherwise(0L))
          .as("k_le2_records"),
        max(col("c")).as("max_cell"))
      .select(col("n_records"), col("n_cells"), col("k1_cells"),
        col("k1_records"), col("k_le2_records"), col("max_cell"),
        round(col("k1_records").cast("double") /
          col("n_records").cast("double"), 6).as("pct_unique"),
        round(col("n_records").cast("double") /
          col("n_cells").cast("double"), 6).as("avg_cell"))
  }

  /** First-order partial correlation r_xy·z = (r_xy − r_xz·r_yz) /
    * √((1−r_xz²)(1−r_yz²)): the x–y association with z's linear
    * influence REMOVED — the confounder check q210's raw correlation
    * matrix can't make (a strong r_xy that collapses given z was z's
    * doing all along). All three Pearson r's assemble from ONE
    * ten-moment exact-decimal aggregation.
    *
    * `scale` is the columns' true decimal precision (the dsum
    * contract; cross-products are exact at 2·scale).
    */
  def partialCorrelation(df: DataFrame, xCol: String, yCol: String,
      zCol: String, scale: Int = 2): DataFrame = {
    import graft.functions.Stats.dsum
    val d = df.filter(col(xCol).isNotNull && col(yCol).isNotNull &&
        col(zCol).isNotNull)
      .select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"),
        col(zCol).cast("double").as("z"))
    val s2 = 2 * scale
    val m = d.agg(count(lit(1)).as("n"),
      dsum(col("x"), scale).as("sx"), dsum(col("y"), scale).as("sy"),
      dsum(col("z"), scale).as("sz"),
      dsum(col("x") * col("x"), s2).as("sxx"),
      dsum(col("y") * col("y"), s2).as("syy"),
      dsum(col("z") * col("z"), s2).as("szz"),
      dsum(col("x") * col("y"), s2).as("sxy"),
      dsum(col("x") * col("z"), s2).as("sxz"),
      dsum(col("y") * col("z"), s2).as("syz"))
    val nD = col("n").cast("double")
    def r(sab: Column, sa: Column, sb: Column, saa: Column,
        sbb: Column): Column =
      (nD * sab - sa * sb) /
        sqrt((nD * saa - sa * sa) * (nD * sbb - sb * sb))
    val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
    val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
    val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
    m.select(col("n"),
      round(rxy, 6).as("r_xy"),
      round(rxz, 6).as("r_xz"),
      round(ryz, 6).as("r_yz"),
      round((rxy - rxz * ryz) /
        sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 6)
        .as("r_xy_given_z"))
  }

  /** Corpus-concentration card: Gini coefficient and top-1%/top-10%
    * token share of a per-row mass column (tokens per document) — the
    * inequality audit that says whether a handful of mega-documents
    * carry the corpus (they dominate training mix, dedup cost, and
    * shard skew alike). Lorenz arithmetic runs EXACTLY on the
    * tie-collapsed mass frame:
    *
    *   2·Σᵢ i·xᵢ = Σ_v v·(2·c·prev + c·(c+1))   (sorted-rank mass)
    *   G = that/(n·S) − (n+1)/n
    *
    * and each top-share boundary is rank arithmetic on the cumulative
    * frame (tie mass split by rank, the trimmed-mean convention) — no
    * sort of the data, no doubles until the final divisions.
    *
    * Scale shape: one mass aggregation collapses the corpus to its
    * distinct mass values; prefix sums run the two-level bucket shape
    * (q115/q259); the share lookups are broadcast-joined rank probes.
    */
  def concentrationCard(df: DataFrame, massCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = 32
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val byV = df.select(massCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("c"))
    val bounds = byV.agg(min(col("v")).as("__lo"), max(col("v")).as("__hi"))
    val bucketed = byV.crossJoin(broadcast(bounds))
      .withColumn("__bkt",
        when(col("__hi") === col("__lo"), lit(0))
          .otherwise(least(lit(buckets - 1),
            floor((col("v") - col("__lo")).cast("double") /
              (col("__hi") - col("__lo")).cast("double") * buckets)
              .cast("int"))))
    val wIn = Window.partitionBy(col("__bkt")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum0 = bucketed
      .withColumn("__cum_c", sum(col("c")).over(wIn))
      .withColumn("__cum_m", sum(dec(col("v")) * dec(col("c"))).over(wIn))
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy(col("__bkt"))
      .agg(sum(col("c")).as("__tc"),
        sum(dec(col("v")) * dec(col("c"))).as("__tm"))
      .withColumn("__off_c",
        coalesce(sum(col("__tc")).over(wOff), lit(0L)))
      .withColumn("__off_m",
        coalesce(sum(col("__tm")).over(wOff), dec(lit(0L))))
      .select(col("__bkt"), col("__off_c"), col("__off_m"))
    val cum = cum0.join(broadcast(offsets), "__bkt")
      .withColumn("__prev_c", col("__off_c") + col("__cum_c") - col("c"))
      .withColumn("__prev_m",
        col("__off_m") + col("__cum_m") - dec(col("v")) * dec(col("c")))
    val agg = cum.agg(
      sum(col("c")).as("n"),
      sum(dec(col("v")) * dec(col("c"))).as("s"),
      // 2·Σ i·x over sorted ranks, exact: v·(2·c·prev + c·(c+1))
      sum(dec(col("v")) * (dec(lit(2)) * dec(col("c")) * dec(col("__prev_c"))
        + dec(col("c")) * (dec(col("c")) + lit(1)))).as("g2"))
    // top-share probes: mass of the (n − ⌊n/den⌋) smallest rows, tie
    // mass split by rank; share = 1 − small/S
    def topShare(den: Long, name: String): DataFrame = {
      val nk = agg.select(col("n"), col("s"),
        (col("n") - ((col("n") - pmod(col("n"), lit(den)))
          .cast("decimal(38,0)") / lit(den)).cast("long")).as("__r"))
      cum.crossJoin(broadcast(nk))
        .filter(col("__prev_c") < col("__r") &&
          col("__r") <= col("__prev_c") + col("c"))
        .select((when(col("__r") === 0L, dec(lit(0L))).otherwise(
          col("__prev_m") +
            (dec(col("__r")) - dec(col("__prev_c"))) * dec(col("v"))))
          .as("__small"), col("s").as("__s2"))
        .select(round(lit(1.0) - col("__small").cast("double") /
          col("__s2").cast("double"), 6).as(name))
    }
    agg.select(col("n").as("n_rows"),
        col("s").cast("long").as("total_mass"),
        round(col("g2").cast("double") /
          (col("n").cast("double") * col("s").cast("double")) -
          (col("n").cast("double") + lit(1.0)) / col("n").cast("double"),
          6).as("gini"))
      .crossJoin(broadcast(topShare(100L, "top1_share")))
      .crossJoin(broadcast(topShare(10L, "top10_share")))
  }

  /** t-closeness audit (Li et al. 2007) — the third rung of the privacy
    * ladder after k-anonymity ([[kAnonymityCard]]) and l-diversity
    * ([[lDiversityCard]]): a quasi-group can be large AND diverse yet
    * still disclosive when its sensitive-value DISTRIBUTION differs from
    * the corpus-wide one. Per group, the nominal-EMD distance = total
    * variation ½·Σ|p(s) − q(s)| against the global distribution; the
    * card reports the worst group and how much data sits above the
    * threshold t = tNum/tDen.
    *
    * Exactness: the TVD is the exact rational
    * (S1 + (N − S2)·n_g) / (2·n_g·N) with S1 = Σ_{s∈grp}|c_g·N − c·n_g|
    * and S2 = Σ_{s∈grp} c(s) — absent sensitive values contribute their
    * full global mass without materializing a group×value cross join.
    * All integer products run in decimal(38,0) (order-free, no long
    * overflow at corpus scale) and the threshold verdict compares
    * num·tDen > den·tNum EXACTLY — no double round-trip can flip it.
    *
    * Scale shape: two stacked aggregations on (group, s) keys, the
    * global value distribution broadcast, one co-partitioned join of
    * group sizes — never a per-row window, never a cross join.
    */
  def tClosenessCard(df: DataFrame, quasiCols: Seq[String],
      sensitive: Column, tNum: Long, tDen: Long): DataFrame = {
    require(quasiCols.nonEmpty && tNum >= 0 && tDen >= 1,
      "need quasi columns and a t = tNum/tDen with tDen >= 1")
    val qs = quasiCols.map(col)
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val gs = df.groupBy(qs :+ sensitive.as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val glob = gs.groupBy(col("__s")).agg(sum(col("__c")).as("__cg"))
    val tot = glob.agg(sum(col("__cg")).as("__N"))
    val ng = gs.groupBy(qs: _*).agg(sum(col("__c")).as("__ng"))
    val per = gs.join(broadcast(glob), "__s")
      .join(ng, quasiCols)
      .crossJoin(broadcast(tot))
      .groupBy(qs: _*)
      .agg(first(col("__ng")).as("__ng"), first(col("__N")).as("__N"),
        sum(abs(dec(col("__c")) * dec(col("__N")) -
          dec(col("__cg")) * dec(col("__ng")))).as("__s1"),
        sum(dec(col("__cg"))).as("__s2"))
      .withColumn("__num", col("__s1") +
        (dec(col("__N")) - col("__s2")) * dec(col("__ng")))
      .withColumn("__den", dec(lit(2L)) * dec(col("__ng")) * dec(col("__N")))
      .withColumn("__tvd",
        col("__num").cast("double") / col("__den").cast("double"))
      .withColumn("__above",
        col("__num") * dec(lit(tDen)) > col("__den") * dec(lit(tNum)))
    per.agg(
        max(col("__N")).as("n_rows"),
        count(lit(1)).as("n_groups"),
        round(max(col("__tvd")), 6).as("max_tvd"),
        sum(when(col("__above"), 1L).otherwise(0L)).as("n_groups_above_t"),
        sum(when(col("__above"), col("__ng")).otherwise(0L))
          .as("n_rows_above_t"))
      .withColumn("t", round(lit(tNum.toDouble / tDen.toDouble), 6))
      .withColumn("frac_rows_above_t",
        round(col("n_rows_above_t").cast("double") /
          col("n_rows").cast("double"), 6))
      .select(col("t"), col("n_rows"), col("n_groups"), col("max_tvd"),
        col("n_groups_above_t"), col("n_rows_above_t"),
        col("frac_rows_above_t"))
  }

  /** Empirical-Bayes (beta-binomial) shrinkage of per-group success
    * rates: fit the beta prior by method of moments on the observed
    * group rates (c = m(1−m)/v − 1, α = m·c, β = (1−m)·c, rounded to 9)
    * and report each group's rate shrunk toward it,
    * (k+α)/(n+α+β). The small-sample stabilizer of every per-source
    * quality ranking (q253's capping, q181's canonical-by-quality):
    * a 2/2 source stops outranking a 950/1000 one.
    *
    * Scale shape: one (group) count aggregation, one moment pass over
    * the |groups|-row frame (DECIMAL sums of fixed-shape rate doubles),
    * shrinkage as a stateless projection. Degenerate priors (zero
    * between-group variance or non-positive c) yield null shrunk rates
    * — surfaced, never a divide-by-zero.
    */
  def ebShrinkageCard(df: DataFrame, groupCol: String,
      successExpr: Column): DataFrame = {
    import graft.functions.Stats.dsum
    val cells = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(successExpr, 1L).otherwise(0L)).as("k"))
    val p = col("k").cast("double") / col("n").cast("double")
    val mom = cells.agg(
        count(lit(1)).as("__g"),
        dsum(p, 12).as("__sp"),
        dsum(p * p, 12).as("__spp"))
      .filter(col("__g") > 1)
    val gD = col("__g").cast("double")
    val m = col("__sp") / gD
    val v = (col("__spp") - col("__sp") * col("__sp") / gD) /
      (gD - lit(1.0))
    val c = m * (lit(1.0) - m) / v - lit(1.0)
    val prior = mom.select(
      when(v > 0.0 && c > 0.0, round(m * c, 9)).as("__alpha"),
      when(v > 0.0 && c > 0.0, round((lit(1.0) - m) * c, 9)).as("__beta"))
    cells.crossJoin(broadcast(prior))
      .select(
        col(groupCol), col("n"), col("k"),
        round(p, 6).as("raw_rate"),
        round((col("k").cast("double") + col("__alpha")) /
          (col("n").cast("double") + col("__alpha") + col("__beta")), 6)
          .as("shrunk_rate"),
        round(col("__alpha"), 6).as("alpha"),
        round(col("__beta"), 6).as("beta"))
      .orderBy(col(groupCol))
  }

  /** Cronbach's α internal-consistency card (Cronbach 1951) over a
    * fixed item-column battery: the raw-score
    * α = k/(k−1)·(1 − Σᵢvarᵢ/var_total) and the standardized
    * α_std = k·r̄/(1 + (k−1)·r̄) from the mean pairwise Pearson r —
    * "do these measures move together enough to sum into one score".
    * For a feature battery it doubles as a redundancy audit: α near 1
    * means the items are one signal wearing k hats.
    *
    * Exactness: ONE aggregation collects every first/second-order
    * moment (item sums, squares, all k(k−1)/2 cross-products) as
    * exact DECIMAL(28,6) sums — items with ≤ 2-decimal values make
    * every product exact at 4 decimals — then fixed double shapes:
    * variances and correlations in one deterministic parenthesization,
    * Σvarᵢ and r̄ folded in declared item order. Rows with ANY null
    * item drop (listwise deletion, the classical convention).
    *
    * Scale shape: one scan, one single-row aggregation; everything
    * after is scalar.
    */
  def cronbachAlpha(df: DataFrame, items: Seq[String]): DataFrame = {
    val k = items.size
    require(k >= 2, s"need at least 2 items, got $k")
    import graft.functions.Stats.dsum
    val d = df.filter(items.map(col(_).isNotNull).reduce(_ && _))
      .select(items.map(c => col(c).cast("double").as(c)): _*)
    val pairs = for {
      i <- items.indices; j <- (i + 1) until k
    } yield (i, j)
    val aggs =
      items.zipWithIndex.flatMap { case (c, i) =>
        Seq(dsum(col(c), 6).as(s"s$i"),
          dsum(col(c) * col(c), 6).as(s"q$i"))
      } ++ pairs.map { case (i, j) =>
        dsum(col(items(i)) * col(items(j)), 6).as(s"p${i}_$j")
      }
    val m = d.agg(count(lit(1)).as("n"), aggs: _*)
    val nD = col("n").cast("double")
    def varRaw(i: Int) =
      col(s"q$i") - col(s"s$i") * col(s"s$i") / nD
    def covRaw(i: Int, j: Int) =
      col(s"p${i}_$j") - col(s"s$i") * col(s"s$j") / nD
    val sumVar = items.indices.map(i => varRaw(i) / (nD - 1.0))
      .reduce(_ + _)
    val totVar = (items.indices.map(varRaw) ++
      pairs.map { case (i, j) => covRaw(i, j) * lit(2.0) })
      .reduce(_ + _) / (nD - 1.0)
    val rBar = pairs.map { case (i, j) =>
      covRaw(i, j) / sqrt(varRaw(i) * varRaw(j))
    }.reduce(_ + _) / lit(pairs.size.toDouble)
    val kD = k.toDouble
    m.select(col("n"), lit(k).as("k"),
      round(lit(kD / (kD - 1.0)) * (lit(1.0) - sumVar / totVar), 6)
        .as("alpha_raw"),
      round(lit(kD) * rBar / (lit(1.0) + lit(kD - 1.0) * rBar), 6)
        .as("alpha_std"),
      round(rBar, 6).as("mean_inter_item_r"),
      round(sumVar, 6).as("sum_item_var"),
      round(totVar, 6).as("total_var"))
  }

  /** Jarque–Bera normality card (Jarque & Bera 1980):
    * JB = n/6·(S² + (K−3)²/4) from the POPULATION skewness S and
    * kurtosis K — "how far from Gaussian is this column", the screen
    * in front of every normality-assuming test in the battery
    * ([[graft.operators.DriftOps.bartlettTest]], ANOVA, Welch).
    *
    * Exactness: the four raw moments Σx..Σx⁴ accumulate as exact
    * per-row DECIMAL casts (scale 4·s for the quartic — exact for
    * ≤ s-decimal inputs); central moments, S = m₃/(m₂√m₂) (no pow —
    * engine-portable sqrt), K = m₄/m₂² and JB assemble in one fixed
    * double shape.
    *
    * Scale shape: one scan, one single-row aggregation.
    */
  def jarqueBera(df: DataFrame, valCol: String,
      scale: Int = 2): DataFrame = {
    val d = df.filter(col(valCol).isNotNull)
      .select(col(valCol).cast("double").as("v"))
    val m = d.agg(count(lit(1)).as("n"),
      sum(col("v").cast(s"decimal(28,$scale)")).cast("double").as("s1"),
      sum((col("v") * col("v")).cast(s"decimal(38,${2 * scale})"))
        .cast("double").as("s2"),
      sum((col("v") * col("v") * col("v"))
        .cast(s"decimal(38,${3 * scale})")).cast("double").as("s3"),
      sum((col("v") * col("v") * col("v") * col("v"))
        .cast(s"decimal(38,${4 * scale})")).cast("double").as("s4"))
    val nD = col("n").cast("double")
    val mu = col("s1") / nD
    val m2 = col("s2") / nD - mu * mu
    val m3 = col("s3") / nD - lit(3.0) * mu * (col("s2") / nD) +
      lit(2.0) * mu * mu * mu
    val m4 = col("s4") / nD - lit(4.0) * mu * (col("s3") / nD) +
      lit(6.0) * mu * mu * (col("s2") / nD) -
      lit(3.0) * mu * mu * mu * mu
    val skew = m3 / (m2 * sqrt(m2))
    val kurt = m4 / (m2 * m2)
    m.select(col("n"), round(mu, 6).as("mean"),
      round(skew, 6).as("skewness"),
      round(kurt - 3.0, 6).as("ex_kurtosis"),
      round(nD / 6.0 * (skew * skew +
        (kurt - 3.0) * (kurt - 3.0) / 4.0), 6).as("jb"))
  }
}
