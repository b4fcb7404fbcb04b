package graft

/** Oracle SQL map, part 3 of the file split (q280_hrw_resize…q340_kpss). */
private[graft] trait OracleSqlPart3 extends OracleSqlPart2 {

  protected def sqlPart3: Map[String, String] = Map(

    // q280: HRW resize replayed — salted two-round congruential weights,
    // packed h·64+b argmax (ties toward higher shard id identically),
    // one keyed MAX aggregation, movement counts.
    "q280_hrw_resize" ->
      """WITH keys AS (
        |  SELECT DISTINCT CAST(user_id AS BIGINT) AS k FROM events),
        |shards AS (SELECT UNNEST(range(0, 17)) AS b),
        |a AS (
        |  SELECT k, b,
        |    ((((((k + b * 104729) % 1000003) * 2654435761) % 1000003)
        |      + (k + b * 104729) // 1000003) % 9999991) * 22695477
        |      % 9999991 * 64 + b AS pk
        |  FROM keys CROSS JOIN shards),
        |g AS (
        |  SELECT k,
        |    MAX(CASE WHEN b < 16 THEN pk END) AS pkf,
        |    MAX(pk) AS pkt
        |  FROM a GROUP BY k)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |  CAST(SUM(CASE WHEN pkf % 64 <> pkt % 64 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved_hrw,
        |  ROUND(CAST(SUM(CASE WHEN pkf % 64 <> pkt % 64 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_moved_hrw,
        |  ROUND(1.0 / 17.0, 6) AS expected_hrw,
        |  CAST(SUM(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_moved_mod,
        |  ROUND(CAST(SUM(CASE WHEN k % 16 <> k % 17 THEN 1 ELSE 0 END)
        |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_moved_mod
        |FROM g""".stripMargin,

    // q276: BH-FDR replayed — exact decimal group/total moments (rest =
    // total − group), one-vs-rest Welch z, the shared Abramowitz–Stegun
    // 26.2.17 tail polynomial, (p, g) rank order, k* = max passing rank.
    // q288 shares q276's SQL verbatim: the streamed per-group moment
    // frame is additive state equal to the batch moments exactly.
    "q276_bh_fdr" -> q276BhFdrSql,
    "q288_stream_bhfdr" -> q276BhFdrSql,

    // q286: ANOVA F replayed — the shared per-group decimal moments,
    // ANOVA-identity SS terms with decimal contributions, fixed F/η².
    "q286_anova_f" ->
      """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(CAST(v AS DECIMAL(28,2))) AS sd,
        |    SUM(CAST(v * v AS DECIMAL(38,4))) AS qd
        |  FROM d GROUP BY g),
        |a AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(sd) AS DOUBLE) AS s, CAST(SUM(qd) AS DOUBLE) AS q,
        |    CAST(SUM(CAST((CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) /
        |      CAST(n_g AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sb
        |  FROM grp)
        |SELECT n, k,
        |  ROUND(sb - s * s / CAST(n AS DOUBLE), 6) AS ss_between,
        |  ROUND(q - sb, 6) AS ss_within,
        |  CASE WHEN q - sb > 0.0 THEN
        |    ROUND(((sb - s * s / CAST(n AS DOUBLE)) /
        |      (CAST(k AS DOUBLE) - 1.0)) /
        |      ((q - sb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
        |  END AS f_stat,
        |  ROUND((sb - s * s / CAST(n AS DOUBLE)) /
        |    ((sb - s * s / CAST(n AS DOUBLE)) + (q - sb)), 6)
        |    AS eta_squared
        |FROM a WHERE k > 1 AND n > k""".stripMargin,

    // q287: Levene replayed — round-9 group means broadcast back,
    // |x−mean| decimal moments on identical doubles, the q286 ANOVA
    // identity on z.
    "q287_levene" ->
      """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |m AS (
        |  SELECT g, ROUND(CAST(SUM(CAST(v AS DECIMAL(28,2))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 9) AS mg
        |  FROM d GROUP BY g HAVING COUNT(*) > 1),
        |z AS (SELECT d.g, ABS(d.v - m.mg) AS z FROM d JOIN m USING (g)),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(CAST(z AS DECIMAL(38,8))) AS sd,
        |    SUM(CAST(z * z AS DECIMAL(38,10))) AS qd
        |  FROM z GROUP BY g),
        |a AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(sd) AS DOUBLE) AS s, CAST(SUM(qd) AS DOUBLE) AS q,
        |    CAST(SUM(CAST((CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)) /
        |      CAST(n_g AS DOUBLE) AS DECIMAL(38,6))) AS DOUBLE) AS sb
        |  FROM grp)
        |SELECT n, k,
        |  ROUND(s / CAST(n AS DOUBLE), 6) AS mean_abs_dev,
        |  CASE WHEN q - sb > 0.0 THEN
        |    ROUND(((sb - s * s / CAST(n AS DOUBLE)) /
        |      (CAST(k AS DOUBLE) - 1.0)) /
        |      ((q - sb) / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE))), 6)
        |  END AS f_levene
        |FROM a WHERE k > 1 AND n > k""".stripMargin,

    // q289: vocabulary richness replayed — exact counts, fixed-shape
    // Chao1 / coverage / Herdan arithmetic.
    "q289_vocab_richness" ->
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM w GROUP BY w),
        |a AS (
        |  SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
        |    CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
        |  FROM c)
        |SELECT n_tokens, n_types, f1, f2,
        |  ROUND(CAST(n_types AS DOUBLE) + CAST(f1 AS DOUBLE) *
        |    (CAST(f1 AS DOUBLE) - 1.0) /
        |    (2.0 * (CAST(f2 AS DOUBLE) + 1.0)), 6) AS chao1,
        |  ROUND(1.0 - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
        |    AS coverage,
        |  ROUND(LN(CAST(n_types AS DOUBLE)) /
        |    LN(CAST(n_tokens AS DOUBLE)), 6) AS herdan_c
        |FROM a WHERE n_tokens > 1""".stripMargin,

    // q277: confident learning replayed — q203's NB parameter CTEs, the
    // rounded-term decimal softmax (order-free denominator), per-class
    // thresholds as mean own-label probability, threshold-cleared argmax
    // into the confident joint.
    "q277_confident_learning" ->
      """WITH d AS (
        |  SELECT l_returnflag AS cls, CAST(l_quantity AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2,
        |    ((l_orderkey % 1000003) * 2654435761) % 10 AS b
        |  FROM lineitem),
        |tr AS (SELECT * FROM d WHERE b < 7),
        |nt AS (SELECT COUNT(*) AS n FROM tr),
        |p AS (
        |  SELECT cls, COUNT(*) AS nc,
        |    CAST(SUM(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS q1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS q2
        |  FROM tr GROUP BY cls),
        |pp AS (
        |  SELECT cls,
        |    ROUND(CAST(nc AS DOUBLE) / (SELECT n FROM nt), 9) AS prior,
        |    ROUND(s1 / nc, 9) AS mu1,
        |    ROUND(GREATEST((q1 - s1 * s1 / nc) / (nc - 1),
        |      0.000000001), 9) AS v1,
        |    ROUND(s2 / nc, 9) AS mu2,
        |    ROUND(GREATEST((q2 - s2 * s2 / nc) / (nc - 1),
        |      0.000000001), 9) AS v2
        |  FROM p),
        |g AS (
        |  SELECT cls AS given, x1, x2, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM d WHERE b >= 7 GROUP BY cls, x1, x2),
        |s AS (
        |  SELECT g.given, g.x1, g.x2, g.n, pp.cls AS cand,
        |    ROUND(LN(pp.prior)
        |      - 0.5 * (LN(6.283185307179586 * pp.v1)
        |        + ((g.x1 - pp.mu1) * (g.x1 - pp.mu1)) / pp.v1)
        |      - 0.5 * (LN(6.283185307179586 * pp.v2)
        |        + ((g.x2 - pp.mu2) * (g.x2 - pp.mu2)) / pp.v2), 6) AS sc
        |  FROM g, pp),
        |e AS (
        |  SELECT given, x1, x2, n, cand,
        |    ROUND(EXP(sc - MAX(sc) OVER
        |      (PARTITION BY given, x1, x2)), 12) AS ev
        |  FROM s),
        |pr AS (
        |  SELECT given, x1, x2, n, cand,
        |    ROUND(ev / CAST(SUM(CAST(ev AS DECIMAL(38,12))) OVER
        |      (PARTITION BY given, x1, x2) AS DOUBLE), 6) AS pb
        |  FROM e),
        |th AS (
        |  SELECT cand,
        |    ROUND(CAST(SUM(CAST(n * pb AS DECIMAL(38,6))) AS DOUBLE) /
        |      CAST(SUM(n) AS DOUBLE), 6) AS t
        |  FROM pr WHERE given = cand GROUP BY cand),
        |cleared AS (
        |  SELECT pr.given, pr.x1, pr.x2, pr.n, pr.cand, pr.pb,
        |    ROW_NUMBER() OVER (PARTITION BY pr.given, pr.x1, pr.x2
        |      ORDER BY pr.pb DESC, pr.cand) AS rn
        |  FROM pr JOIN th ON pr.cand = th.cand
        |  WHERE pr.pb >= th.t),
        |joint AS (
        |  SELECT given, cand AS suspected, CAST(SUM(n) AS BIGINT)
        |    AS n_rows
        |  FROM cleared WHERE rn = 1 GROUP BY given, cand)
        |SELECT j.given, j.suspected, j.n_rows, th.t AS t_suspected
        |FROM joint j JOIN th ON j.suspected = th.cand
        |ORDER BY j.given, j.suspected""".stripMargin,

    // q274: cross-entropy matrix replayed — same token stream, matched-
    // pair closed form (unmatched words contribute ln(1)=0), decimal
    // contribution sums, exp on the identical unrounded entropy.
    "q274_cross_entropy" ->
      """WITH t AS (
        |  SELECT source, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |w AS (SELECT source AS src, u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |c AS (SELECT src, w, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM w GROUP BY src, w),
        |n AS (SELECT src, CAST(SUM(c) AS BIGINT) AS nt FROM c GROUP BY src),
        |v AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM c),
        |matched AS (
        |  SELECT b.src AS src_from, a.src AS src_to,
        |    CAST(SUM(CAST(CAST(b.c AS DOUBLE) *
        |      LN(CAST(a.c AS DOUBLE) + 1.0) AS DECIMAL(38,12)))
        |      AS DOUBLE) AS t_ab
        |  FROM c b JOIN c a ON b.w = a.w
        |  GROUP BY b.src, a.src),
        |pairs AS (
        |  SELECT nb.src AS src_from, na.src AS src_to,
        |    nb.nt AS nb, na.nt AS na,
        |    COALESCE(m.t_ab, 0.0) AS t_ab
        |  FROM n nb CROSS JOIN n na
        |  LEFT JOIN matched m
        |    ON m.src_from = nb.src AND m.src_to = na.src)
        |SELECT src_from, src_to, nb AS n_tokens_from,
        |  ROUND(LN(CAST(na + v.v AS DOUBLE)) -
        |    t_ab / CAST(nb AS DOUBLE), 6) AS h_cross,
        |  ROUND(EXP(LN(CAST(na + v.v AS DOUBLE)) -
        |    t_ab / CAST(nb AS DOUBLE)), 6) AS ppl_cross
        |FROM pairs CROSS JOIN v
        |ORDER BY src_from, src_to""".stripMargin,

    // q267: CUSUM replayed — exact decimal daily/prefix masses, per-row
    // double deviations from exact terms (no running double sum), the
    // chi-square contribution convention for sigma, earliest-argmax tie
    // order (|dev| DESC, day).
    // q284: SPRT replayed — first-half baseline from exact decimal
    // moments, monitor-window decimal prefix masses, identical LLR
    // shape and ln-bound literals, first-crossing decision by MIN(k).
    "q284_sprt_monitor" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS td
        |  FROM events WHERE value IS NOT NULL GROUP BY day),
        |ix AS (
        |  SELECT day, td,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS dd
        |  FROM d),
        |sp AS (
        |  SELECT *, dd // 2 AS split FROM ix
        |  WHERE dd // 2 >= 2 AND dd - dd // 2 >= 1),
        |base AS (
        |  SELECT MAX(split) AS n_base, MAX(dd) AS n_days,
        |    CAST(SUM(td) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(CAST(td AS DOUBLE) * CAST(td AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS q
        |  FROM sp WHERE i <= split),
        |st0 AS (
        |  SELECT n_days, n_base,
        |    s / CAST(n_base AS DOUBLE) AS mu0,
        |    SQRT((q - s * s / CAST(n_base AS DOUBLE)) /
        |      (CAST(n_base AS DOUBLE) - 1.0)) AS sigma0
        |  FROM base),
        |st AS (SELECT * FROM st0 WHERE sigma0 > 0.0),
        |mon AS (
        |  SELECT day, CAST(i - split AS BIGINT) AS k,
        |    SUM(td) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ck
        |  FROM sp WHERE i > split),
        |w AS (
        |  SELECT mon.day, mon.k, st.n_days, st.n_base, st.mu0, st.sigma0,
        |    (st.sigma0 / (st.sigma0 * st.sigma0)) *
        |      (CAST(mon.ck AS DOUBLE) - CAST(mon.k AS DOUBLE) * st.mu0 -
        |        CAST(mon.k AS DOUBLE) * (st.sigma0 / 2.0)) AS llr
        |  FROM mon CROSS JOIN st),
        |w2 AS (
        |  SELECT *,
        |    CASE WHEN llr >= LN((1.0 - 0.05) / 0.05) THEN 'drift'
        |         WHEN llr <= LN(0.05 / (1.0 - 0.05)) THEN 'no_drift'
        |    END AS status
        |  FROM w),
        |fc AS (SELECT MIN(CASE WHEN status IS NOT NULL THEN k END)
        |       AS kdec FROM w2),
        |lk AS (SELECT MAX(k) AS kmax FROM w2),
        |fin AS (
        |  SELECT n_days, n_base, ROUND(mu0, 6) AS mu0,
        |    ROUND(sigma0, 6) AS sigma0, k AS n_monitor,
        |    ROUND(llr, 6) AS llr_final
        |  FROM w2 CROSS JOIN lk WHERE k = kmax),
        |dec AS (
        |  SELECT k AS k_decision, day AS decision_day, status AS decision
        |  FROM w2 CROSS JOIN fc WHERE k = kdec)
        |SELECT f.n_days, f.n_base, f.n_monitor, f.mu0, f.sigma0,
        |  f.llr_final, COALESCE(d2.decision, 'undecided') AS decision,
        |  d2.k_decision, d2.decision_day
        |FROM fin f LEFT JOIN dec d2 ON TRUE""".stripMargin,

    // q285: RBO replayed — q13's quality expression, deterministic
    // (score DESC, id) ranks, max-rank overlap counts per depth,
    // exp/ln geometric weights, decimal term sums.
    "q285_rank_overlap" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |    ROUND(LEAST(len(toks) / 100.0, 1.0) *
        |      (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) /
        |        CAST(len(toks) AS DOUBLE)), 6) AS quality_score
        |  FROM t),
        |ra AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY quality_score DESC, doc_id) AS BIGINT) AS ia
        |  FROM q QUALIFY ia <= 50),
        |rb AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER
        |    (ORDER BY n_tokens DESC, doc_id) AS BIGINT) AS ib
        |  FROM q QUALIFY ib <= 50),
        |j AS (SELECT GREATEST(ia, ib) AS m FROM ra JOIN rb USING (doc_id)),
        |dep AS (SELECT CAST(UNNEST(range(1, 51)) AS BIGINT) AS i),
        |xi AS (
        |  SELECT i, CAST(SUM(CASE WHEN m IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS x
        |  FROM dep LEFT JOIN j ON j.m <= dep.i GROUP BY i),
        |terms AS (
        |  SELECT i, x, CAST(EXP((CAST(i AS DOUBLE) - 1.0) * LN(0.9)) *
        |    CAST(x AS DOUBLE) / CAST(i AS DOUBLE) AS DECIMAL(38,12)) AS t
        |  FROM xi)
        |SELECT CAST(50 AS BIGINT) AS depth, 0.9 AS p,
        |  ROUND((1.0 - 0.9) * CAST(SUM(t) AS DOUBLE), 6) AS rbo,
        |  MAX(CASE WHEN i = 50 THEN x END) AS overlap_at_depth,
        |  ROUND(CAST(MAX(CASE WHEN i = 50 THEN x END) AS DOUBLE) / 50.0,
        |    6) AS agreement_at_depth
        |FROM terms""".stripMargin,

    // q281 shares q267's SQL verbatim: the streamed per-day decimal
    // mass frame is additive state equal to the batch masses exactly.
    "q267_cusum_changepoint" -> q267CusumSql,
    "q281_stream_cusum" -> q267CusumSql,

    // q282: overdispersion replayed — q269's calendar spine, exact
    // HUGEINT moments, fixed-shape VMR / dispersion χ².
    "q282_overdispersion" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT COALESCE(c.x, 0) AS x
        |  FROM days d LEFT JOIN counts c ON d.day = c.day),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS q
        |  FROM series)
        |SELECT n_days,
        |  ROUND(s / CAST(n_days AS DOUBLE), 6) AS mean_daily,
        |  ROUND((q - s * s / CAST(n_days AS DOUBLE)) /
        |    (CAST(n_days AS DOUBLE) - 1.0), 6) AS var_daily,
        |  ROUND(((q - s * s / CAST(n_days AS DOUBLE)) /
        |    (CAST(n_days AS DOUBLE) - 1.0)) /
        |    (s / CAST(n_days AS DOUBLE)), 6) AS vmr,
        |  ROUND((CAST(n_days AS DOUBLE) - 1.0) *
        |    ((q - s * s / CAST(n_days AS DOUBLE)) /
        |      (CAST(n_days AS DOUBLE) - 1.0)) /
        |    (s / CAST(n_days AS DOUBLE)), 6) AS chi2_dispersion
        |FROM a WHERE n_days > 1 AND s > 0.0""".stripMargin,

    // q283: Good–Turing replayed — same empty-token-filtered stream,
    // count-of-counts, r+1 self-join on the card frame, fixed-shape
    // divisions.
    "q283_good_turing" ->
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM w GROUP BY w),
        |ff AS (SELECT r, CAST(COUNT(*) AS BIGINT) AS n_types
        |       FROM c GROUP BY r),
        |tot AS (SELECT CAST(SUM(r) AS BIGINT) AS n,
        |  CAST(COUNT(*) AS BIGINT) AS v FROM c),
        |low AS (
        |  SELECT r, n_types FROM ff
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY r) <= 10),
        |card AS (
        |  SELECT f.r, f.n_types, f2.n_types AS nt_next
        |  FROM low f LEFT JOIN ff f2 ON f2.r = f.r + 1)
        |SELECT r, n_types,
        |  ROUND(CAST(r AS DOUBLE) * CAST(n_types AS DOUBLE) /
        |    CAST(n AS DOUBLE), 6) AS mass,
        |  ROUND(CAST(n_types AS DOUBLE) / CAST(v AS DOUBLE), 6)
        |    AS type_share,
        |  CASE WHEN nt_next IS NOT NULL THEN
        |    ROUND((CAST(r AS DOUBLE) + 1.0) * CAST(nt_next AS DOUBLE) /
        |      CAST(n_types AS DOUBLE), 6) END AS r_star,
        |  ROUND(CASE WHEN r = 1 THEN
        |    CAST(n_types AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS p0_unseen
        |FROM card CROSS JOIN tot
        |ORDER BY r""".stripMargin,

    // q268: Cochran–Armitage replayed — exact HUGEINT score moments
    // (≡ Spark's decimal(38,0)), identical double assembly for
    // p̄/T/Var/z.
    "q268_cochran_armitage" ->
      """WITH c0 AS (
        |  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS s,
        |    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |cat AS (
        |  SELECT s, CAST(COUNT(*) AS BIGINT) AS n_i,
        |    CAST(SUM(y) AS BIGINT) AS k_i
        |  FROM c0 WHERE s IS NOT NULL GROUP BY s),
        |a AS (
        |  SELECT CAST(SUM(n_i) AS BIGINT) AS n,
        |    CAST(SUM(k_i) AS BIGINT) AS k,
        |    CAST(COUNT(*) AS BIGINT) AS n_categories,
        |    CAST(SUM(CAST(s AS HUGEINT) * k_i) AS DOUBLE) AS sk,
        |    CAST(SUM(CAST(s AS HUGEINT) * n_i) AS DOUBLE) AS sn,
        |    CAST(SUM(CAST(s AS HUGEINT) * s * n_i) AS DOUBLE) AS ssn
        |  FROM cat)
        |SELECT n, k, n_categories,
        |  ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_bar,
        |  ROUND(sk - (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * sn, 6)
        |    AS t_stat,
        |  ROUND((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (ssn - sn * sn / CAST(n AS DOUBLE)), 6) AS var_t,
        |  CASE WHEN (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (ssn - sn * sn / CAST(n AS DOUBLE)) > 0.0
        |    THEN ROUND((sk - (CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * sn) /
        |      SQRT((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |        (ssn - sn * sn / CAST(n AS DOUBLE))), 6) END AS z_trend
        |FROM a WHERE k > 0 AND k < n""".stripMargin,

    // q247: embedding drift replayed — hash-half slices, per-dim exact
    // decimal means, decimal reductions over dims (order-free), rounded
    // cosine/L2/top-shift finishing.
    "q247_embedding_drift" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
        |    ((vec_id % 1000003) * 2654435761) % 20 >= 10 AS b
        |  FROM embeddings),
        |dv AS (
        |  SELECT b, u.s.d AS d, u.s.v AS v
        |  FROM e, UNNEST(list_transform(emb,
        |    (x, i) -> struct_pack(d := i - 1, v := x))) AS u(s)),
        |d0 AS (
        |  SELECT d,
        |    CAST(SUM(CASE WHEN NOT b
        |      THEN CAST(v AS DECIMAL(28,12)) END) AS DOUBLE) AS sa,
        |    COUNT(CASE WHEN NOT b THEN 1 END) AS n_a,
        |    CAST(SUM(CASE WHEN b
        |      THEN CAST(v AS DECIMAL(28,12)) END) AS DOUBLE) AS sb,
        |    COUNT(CASE WHEN b THEN 1 END) AS n_b
        |  FROM dv GROUP BY d),
        |m AS (
        |  SELECT d, n_a, n_b,
        |    sa / CAST(n_a AS DOUBLE) AS ma,
        |    sb / CAST(n_b AS DOUBLE) AS mb
        |  FROM d0),
        |m2 AS (SELECT *, ABS(ma - mb) AS shift FROM m),
        |ag AS (
        |  SELECT CAST(MAX(n_a) AS BIGINT) AS n_a,
        |    CAST(MAX(n_b) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(ma * mb AS DECIMAL(28,18))) AS DOUBLE) AS dot,
        |    CAST(SUM(CAST(ma * ma AS DECIMAL(28,18))) AS DOUBLE) AS qa,
        |    CAST(SUM(CAST(mb * mb AS DECIMAL(28,18))) AS DOUBLE) AS qb,
        |    CAST(SUM(CAST((ma - mb) * (ma - mb) AS DECIMAL(28,18)))
        |      AS DOUBLE) AS sq
        |  FROM m2),
        |top AS (
        |  SELECT CAST(d AS BIGINT) AS top_dim, ROUND(shift, 6)
        |    AS top_shift
        |  FROM m2 ORDER BY shift DESC NULLS LAST, d LIMIT 1)
        |SELECT ag.n_a, ag.n_b,
        |  CASE WHEN ag.qa > 0.0 AND ag.qb > 0.0 THEN
        |    ROUND(ag.dot / (SQRT(ag.qa) * SQRT(ag.qb)), 6)
        |  END AS cosine_means,
        |  ROUND(SQRT(ag.sq), 6) AS l2_shift,
        |  top.top_dim, top.top_shift
        |FROM ag, top""".stripMargin,

    // q245: the Snorkel LFAnalysis card — votes as a UNION of filtered
    // projections, per-doc vote/label stats, per-LF diagnostics.
    "q245_weak_labels" ->
      """WITH dt AS (
        |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks
        |  FROM documents),
        |v AS (
        |  SELECT doc_id, 'lf_spark' AS lf, 'tech' AS label
        |  FROM dt WHERE list_contains(toks, 'spark')
        |  UNION ALL
        |  SELECT doc_id, 'lf_customer', 'retail'
        |  FROM dt WHERE list_contains(toks, 'customer')
        |  UNION ALL
        |  SELECT doc_id, 'lf_window_table', 'tech'
        |  FROM dt WHERE list_contains(toks, 'window')
        |    AND list_contains(toks, 'table')
        |  UNION ALL
        |  SELECT doc_id, 'lf_vector', 'retail'
        |  FROM dt WHERE list_contains(toks, 'vector')),
        |pd AS (
        |  SELECT doc_id, COUNT(*) AS nv, COUNT(DISTINCT label) AS nl
        |  FROM v GROUP BY doc_id),
        |n AS (SELECT COUNT(*) AS n FROM dt)
        |SELECT v.lf, COUNT(*) AS n_votes,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(n.n AS DOUBLE), 6)
        |    AS coverage,
        |  CAST(SUM(CASE WHEN pd.nv > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_overlap,
        |  CAST(SUM(CASE WHEN pd.nl > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_conflict
        |FROM v JOIN pd USING (doc_id), n
        |GROUP BY v.lf, n.n
        |ORDER BY v.lf""".stripMargin,

    // the streamed index's quantizer is drawn from (and frozen at) the
    // wave-0 subset; assignment covers the full corpus — otherwise q182's
    // exact chain. The streamed artifact must be invisible in the answer.
    "q230_stream_ivf_ingest" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |drawn AS (
        |  SELECT vec_id, emb,
        |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
        |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
        |  FROM e
        |  WHERE ((vec_id % 1000003) * 2654435761) % 10 < 4),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
        |      AS centroid_id,
        |    emb AS centroid
        |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
        |assign AS (
        |  SELECT vec_id, emb, centroid_id FROM (
        |    SELECT e.vec_id, e.emb, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |        ROUND(list_inner_product(e.emb, c.centroid) /
        |          (SQRT(list_inner_product(e.emb, e.emb)) *
        |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
        |          DESC,
        |        c.centroid_id) AS rn
        |    FROM e, cent c)
        |  WHERE rn = 1),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 20),
        |probes AS (
        |  SELECT q_id, qe, centroid_id FROM (
        |    SELECT q.q_id, q.qe, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
        |        ROUND(list_inner_product(q.qe, c.centroid) /
        |          (SQRT(list_inner_product(q.qe, q.qe)) *
        |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
        |          DESC,
        |        c.centroid_id) AS pr
        |    FROM q, cent c)
        |  WHERE pr <= 3),
        |cand AS (
        |  SELECT p.q_id, a.vec_id,
        |    ROUND(list_inner_product(a.emb, p.qe) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(p.qe, p.qe))), 6) AS cosine
        |  FROM assign a JOIN probes p USING (centroid_id)
        |  WHERE p.q_id <> a.vec_id)
        |SELECT q_id, vec_id, cosine, rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT)
        |    AS rank
        |  FROM cand)
        |WHERE rank <= 3
        |ORDER BY q_id, rank""".stripMargin,
    "q219_kcenter_coreset" -> q219KCenterSql,

    // exact top-10 cosine retrieval, label-match relevance, macro
    // nDCG/MRR/MAP with the identical ln-based log2 and decimal sums
    "q223_retrieval_eval" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS ql, emb AS qe FROM e
        |  WHERE vec_id < 30),
        |nn AS (
        |  SELECT q_id, ql, n_id, nl, rank FROM (
        |    SELECT q.q_id, q.ql, e.vec_id AS n_id, e.label AS nl,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
        |        ROUND(list_inner_product(e.emb, q.qe) /
        |          (SQRT(list_inner_product(e.emb, e.emb)) *
        |           SQRT(list_inner_product(q.qe, q.qe))), 6) DESC,
        |        e.vec_id) AS rank
        |    FROM e, q WHERE e.vec_id <> q.q_id)
        |  WHERE rank <= 10),
        |d AS (
        |  SELECT q_id AS q, rank,
        |    CASE WHEN ql = nl THEN 1.0 ELSE 0.0 END AS rel
        |  FROM nn),
        |sc AS (
        |  SELECT q, rank, rel,
        |    ROW_NUMBER() OVER (PARTITION BY q ORDER BY rel DESC, rank ASC)
        |      AS ipos,
        |    SUM(rel) OVER (PARTITION BY q ORDER BY rank
        |      ROWS UNBOUNDED PRECEDING) AS cumrel
        |  FROM d),
        |perq AS (
        |  SELECT q,
        |    CAST(SUM(CAST(rel / (LN(CAST(rank AS DOUBLE) + 1.0) /
        |      0.6931471805599453) AS DECIMAL(28,12))) AS DOUBLE) AS dcg,
        |    CAST(SUM(CAST(rel / (LN(CAST(ipos AS DOUBLE) + 1.0) /
        |      0.6931471805599453) AS DECIMAL(28,12))) AS DOUBLE) AS idcg,
        |    MIN(CASE WHEN rel > 0.0 THEN rank END) AS firstrel,
        |    CAST(SUM(CAST(COALESCE(CASE WHEN rel > 0.0 THEN
        |        cumrel / CAST(rank AS DOUBLE) END, 0.0)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sumprec,
        |    CAST(SUM(CASE WHEN rel > 0.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS nrel
        |  FROM sc GROUP BY q),
        |m AS (
        |  SELECT q,
        |    CASE WHEN idcg > 0.0 THEN ROUND(dcg / idcg, 9)
        |      ELSE 0.0 END AS ndcg,
        |    CASE WHEN firstrel IS NOT NULL THEN
        |      ROUND(1.0 / CAST(firstrel AS DOUBLE), 9)
        |      ELSE 0.0 END AS rr,
        |    CASE WHEN nrel > 0 THEN
        |      ROUND(sumprec / CAST(nrel AS DOUBLE), 9)
        |      ELSE 0.0 END AS ap
        |  FROM perq)
        |SELECT COUNT(*) AS n_queries,
        |  ROUND(CAST(SUM(CAST(ndcg AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_ndcg_at_10,
        |  ROUND(CAST(SUM(CAST(rr AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS mrr,
        |  ROUND(CAST(SUM(CAST(ap AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS mean_ap
        |FROM m""".stripMargin,

    // exact brute-force top-5 vs the q182 IVF probe path, recall per query
    "q220_ann_recall" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 20),
        |exact AS (
        |  SELECT q_id, vec_id AS n_id FROM (
        |    SELECT q.q_id, e.vec_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
        |        ROUND(list_inner_product(e.emb, q.qe) /
        |          (SQRT(list_inner_product(e.emb, e.emb)) *
        |           SQRT(list_inner_product(q.qe, q.qe))), 6) DESC,
        |        e.vec_id) AS rank
        |    FROM e, q WHERE e.vec_id <> q.q_id)
        |  WHERE rank <= 5),
        |drawn AS (
        |  SELECT vec_id, emb,
        |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
        |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
        |  FROM e),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
        |      AS centroid_id,
        |    emb AS centroid
        |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
        |assign AS (
        |  SELECT vec_id, emb, centroid_id FROM (
        |    SELECT t.vec_id, t.emb, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
        |        ROUND(list_inner_product(t.emb, c.centroid) /
        |          (SQRT(list_inner_product(t.emb, t.emb)) *
        |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
        |          DESC,
        |        c.centroid_id) AS rn
        |    FROM e t, cent c)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT q_id, qe, centroid_id FROM (
        |    SELECT q.q_id, q.qe, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
        |        ROUND(list_inner_product(q.qe, c.centroid) /
        |          (SQRT(list_inner_product(q.qe, q.qe)) *
        |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
        |          DESC,
        |        c.centroid_id) AS pr
        |    FROM q, cent c)
        |  WHERE pr <= 3),
        |cand AS (
        |  SELECT p.q_id, a.vec_id,
        |    ROUND(list_inner_product(a.emb, p.qe) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(p.qe, p.qe))), 6) AS cosine
        |  FROM assign a JOIN probes p USING (centroid_id)
        |  WHERE p.q_id <> a.vec_id),
        |approx AS (
        |  SELECT q_id, vec_id AS n_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |    FROM cand)
        |  WHERE rank <= 5)
        |SELECT exact.q_id, COUNT(*) AS n_exact,
        |  CAST(SUM(CASE WHEN approx.n_id IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_found,
        |  ROUND(CAST(SUM(CASE WHEN approx.n_id IS NOT NULL THEN 1 ELSE 0
        |      END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS recall
        |FROM exact LEFT JOIN approx USING (q_id, n_id)
        |GROUP BY exact.q_id
        |ORDER BY q_id""".stripMargin,

    // 64 salted congruential relabelings in one pass, add-one p-value;
    // degenerate (one-sided) relabelings count as extreme
    "q218_rerandomization" ->
      """WITH d AS (
        |  SELECT event_id AS k,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
        |    value AS v
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |obs AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CAST(CASE WHEN g = 1 THEN v ELSE 0.0 END
        |      AS DECIMAL(28,4))) AS DOUBLE) AS sa,
        |    CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) AS s
        |  FROM d),
        |obs3 AS (
        |  SELECT n, mean_a, mean_b,
        |    ROUND(ABS(mean_a - mean_b), 9) AS delta_obs
        |  FROM (
        |    SELECT n, ROUND(sa / CAST(na AS DOUBLE), 9) AS mean_a,
        |      ROUND((s - sa) / CAST(n - na AS DOUBLE), 9) AS mean_b
        |    FROM obs)),
        |perms AS (
        |  SELECT pp, COUNT(*) AS pn,
        |    CAST(SUM(CASE WHEN gp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS na,
        |    CAST(SUM(CAST(CASE WHEN gp = 1 THEN v ELSE 0.0 END
        |      AS DECIMAL(28,4))) AS DOUBLE) AS sa,
        |    CAST(SUM(CAST(v AS DECIMAL(28,4))) AS DOUBLE) AS s
        |  FROM (
        |    SELECT d.v, p.p AS pp,
        |      ((((((d.k + p.p * 104729) % 1000003) * 2654435761) % 1000003
        |          + (d.k + p.p * 104729) // 1000003) % 9999991)
        |        * 22695477) % 9999991 % 2 AS gp
        |    FROM d, UNNEST(range(1, 65)) AS p(p))
        |  GROUP BY pp),
        |pd AS (
        |  SELECT pp, CASE WHEN na > 0 AND na < pn THEN
        |    ROUND(ABS(ROUND(sa / CAST(na AS DOUBLE), 9) -
        |      ROUND((s - sa) / CAST(pn - na AS DOUBLE), 9)), 9)
        |  END AS delta FROM perms),
        |ex AS (
        |  SELECT COUNT(*) AS n_perms,
        |    CAST(SUM(CASE WHEN delta IS NULL OR
        |      delta >= (SELECT delta_obs FROM obs3) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_ge
        |  FROM pd)
        |SELECT obs3.n, obs3.mean_a, obs3.mean_b, obs3.delta_obs,
        |  ex.n_perms, ex.n_ge,
        |  ROUND((CAST(ex.n_ge AS DOUBLE) + 1.0) /
        |    (CAST(ex.n_perms AS DOUBLE) + 1.0), 6) AS p_value
        |FROM obs3, ex""".stripMargin,

    // decimal sums carried through the (cat, fold) rollup; leave-one-fold
    // -out means with the global-OOF fallback
    "q215_target_encoding" ->
      """WITH cells AS (
        |  SELECT o_orderpriority AS cat,
        |    ((o_custkey % 1000003) * 2654435761) % 5 AS fold,
        |    COUNT(*) AS n_rows,
        |    SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS s
        |  FROM orders GROUP BY cat, fold),
        |ct AS (SELECT cat, CAST(SUM(n_rows) AS BIGINT) AS nc,
        |    SUM(s) AS sc FROM cells GROUP BY cat),
        |ft AS (SELECT fold, CAST(SUM(n_rows) AS BIGINT) AS nf,
        |    SUM(s) AS sf FROM cells GROUP BY fold),
        |g AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS n, SUM(s) AS st
        |  FROM cells)
        |SELECT cells.cat, cells.fold, cells.n_rows,
        |  CASE WHEN ct.nc - cells.n_rows > 0 THEN
        |    ROUND(CAST(ct.sc - cells.s AS DOUBLE) /
        |      CAST(ct.nc - cells.n_rows AS DOUBLE), 6)
        |  ELSE
        |    ROUND(CAST(g.st - ft.sf AS DOUBLE) /
        |      CAST(g.n - ft.nf AS DOUBLE), 6)
        |  END AS enc
        |FROM cells JOIN ct USING (cat) JOIN ft USING (fold), g
        |ORDER BY cat, fold""".stripMargin,

    "q217_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY c_nationkey, c_mktsegment)
        |SELECT CAST(5 AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n_rows,
        |  COUNT(*) AS n_groups, CAST(MIN(n) AS BIGINT) AS min_group_size,
        |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |    AS n_rows_below_k,
        |  ROUND(CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(n) AS DOUBLE), 6) AS frac_below_k
        |FROM g""".stripMargin,

    // Laplace-adjusted WOE/IV with the identical smoothing arithmetic;
    // IV accumulated in decimal so bin order cannot move the total
    "q211_woe_iv" ->
      """WITH d AS (
        |  SELECT CAST(FLOOR((l_quantity - 1) / 5) AS BIGINT) AS bin,
        |    CASE WHEN l_returnflag <> 'N' THEN 1 ELSE 0 END AS y
        |  FROM lineitem),
        |cells AS (
        |  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos,
        |    COUNT(*) - CAST(SUM(y) AS BIGINT) AS n_neg
        |  FROM d GROUP BY bin),
        |tot AS (
        |  SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
        |    CAST(SUM(n_neg) AS BIGINT) AS tn, COUNT(*) AS nb
        |  FROM cells),
        |sc AS (
        |  SELECT bin, n, n_pos, n_neg,
        |    (CAST(n_pos AS DOUBLE) + 0.5) /
        |      (CAST(tp AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)) AS dp,
        |    (CAST(n_neg AS DOUBLE) + 0.5) /
        |      (CAST(tn AS DOUBLE) + 0.5 * CAST(nb AS DOUBLE)) AS dn
        |  FROM cells, tot),
        |sc2 AS (SELECT *, LN(dp / dn) AS woe0 FROM sc),
        |iv AS (
        |  SELECT CAST(SUM(CAST((dp - dn) * woe0 AS DECIMAL(28,12)))
        |    AS DOUBLE) AS ivt
        |  FROM sc2)
        |SELECT bin, n, n_pos, n_neg, ROUND(woe0, 6) AS woe,
        |  ROUND((dp - dn) * woe0, 6) AS iv_contrib,
        |  ROUND(ivt, 6) AS iv_total
        |FROM sc2, iv ORDER BY bin""".stripMargin,

    // draw replayed; "smallest draws, ties by key, exactly ⌈n_s/50⌉" is
    // rank-by-(draw, key) ≤ ceil-target per stratum
    "q209_stratified_sample" ->
      """WITH d AS (
        |  SELECT o_orderpriority AS s, o_orderkey AS k,
        |    ((((((o_orderkey % 1000003) * 2654435761) % 1000003)
        |        + (o_orderkey // 1000003)) % 9999991) * 22695477)
        |      % 9999991 AS draw
        |  FROM orders),
        |t AS (SELECT s, (COUNT(*) + 49) // 50 AS target FROM d GROUP BY s),
        |r AS (
        |  SELECT d.*, ROW_NUMBER() OVER (PARTITION BY s ORDER BY draw, k)
        |    AS rn
        |  FROM d)
        |SELECT r.s AS o_orderpriority, r.k AS o_orderkey, r.draw
        |FROM r JOIN t USING (s) WHERE r.rn <= t.target
        |ORDER BY o_orderpriority, draw, o_orderkey""".stripMargin,

    // q182's draw/assign/probe over the train split, then the 5-NN label
    // vote (votes desc, label asc) and the confusion matrix
    "q205_knn_classify" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
        |    ((vec_id % 1000003) * 2654435761) % 10 AS b
        |  FROM embeddings),
        |tr AS (SELECT * FROM e WHERE b < 7),
        |te AS (SELECT * FROM e WHERE b >= 7),
        |drawn AS (
        |  SELECT vec_id, emb,
        |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
        |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
        |  FROM tr),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
        |      AS centroid_id,
        |    emb AS centroid
        |  FROM drawn
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY d, vec_id) <=
        |    GREATEST(8,
        |      CAST(CEIL(SQRT(COUNT(*) OVER () * 3.0)) AS BIGINT))),
        |assign AS (
        |  SELECT vec_id, emb, centroid_id FROM (
        |    SELECT t.vec_id, t.emb, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
        |        ROUND(list_inner_product(t.emb, c.centroid) /
        |          (SQRT(list_inner_product(t.emb, t.emb)) *
        |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
        |          DESC,
        |        c.centroid_id) AS rn
        |    FROM tr t, cent c)
        |  WHERE rn = 1),
        |probes AS (
        |  SELECT q_id, qe, centroid_id FROM (
        |    SELECT t.vec_id AS q_id, t.emb AS qe, c.centroid_id,
        |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
        |        ROUND(list_inner_product(t.emb, c.centroid) /
        |          (SQRT(list_inner_product(t.emb, t.emb)) *
        |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
        |          DESC,
        |        c.centroid_id) AS pr
        |    FROM te t, cent c)
        |  WHERE pr <= 3),
        |cand AS (
        |  SELECT p.q_id, a.vec_id,
        |    ROUND(list_inner_product(a.emb, p.qe) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(p.qe, p.qe))), 6) AS cosine
        |  FROM assign a JOIN probes p USING (centroid_id)
        |  WHERE p.q_id <> a.vec_id),
        |nn AS (
        |  SELECT q_id, vec_id FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |    FROM cand)
        |  WHERE rank <= 5),
        |votes AS (
        |  SELECT nn.q_id, l.label AS nlabel, COUNT(*) AS v
        |  FROM nn JOIN e l ON l.vec_id = nn.vec_id
        |  GROUP BY nn.q_id, l.label),
        |pred AS (
        |  SELECT q_id, nlabel AS predicted FROM (
        |    SELECT *, ROW_NUMBER() OVER (
        |      PARTITION BY q_id ORDER BY v DESC, nlabel ASC) AS rn
        |    FROM votes)
        |  WHERE rn = 1)
        |SELECT te.label AS actual, pred.predicted, COUNT(*) AS n_rows
        |FROM te LEFT JOIN pred ON pred.q_id = te.vec_id
        |GROUP BY te.label, pred.predicted
        |ORDER BY actual, predicted""".stripMargin,

    // both medians replayed as k-th order statistics (lower median), the
    // outlier verdict in the same exact-integer inequality
    "q208_mad_outliers" ->
      """WITH d AS (
        |  SELECT event_type AS s,
        |    CAST(ROUND(value * 1000000.0, 0) AS BIGINT) AS v
        |  FROM events),
        |nn AS (SELECT COUNT(*) AS n, (COUNT(*) + 1) // 2 AS k FROM d),
        |med AS (
        |  SELECT v AS m FROM (
        |    SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM d), nn
        |  WHERE rn = nn.k),
        |dev AS (
        |  SELECT s, ABS(v - (SELECT m FROM med)) AS dd FROM d),
        |mad AS (
        |  SELECT dd AS m FROM (
        |    SELECT dd, ROW_NUMBER() OVER (ORDER BY dd) AS rn FROM dev), nn
        |  WHERE rn = nn.k)
        |SELECT s AS event_type, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN dd * 6745 > 35000 * (SELECT m FROM mad)
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  ROUND(CAST(SUM(CASE WHEN dd * 6745 > 35000 * (SELECT m FROM mad)
        |      THEN 1 ELSE 0 END) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate,
        |  (SELECT m FROM med) AS median_micro,
        |  (SELECT m FROM mad) AS mad_micro
        |FROM dev GROUP BY s
        |ORDER BY event_type""".stripMargin,

    // the q189 Newton replay on the (score, label) frame, then plain
    // binned-reliability expressions over the round-9 fixed point
    "q224_platt_calibration" ->
      """WITH RECURSIVE d AS (
        |  SELECT (o_orderkey * 7 % 1000) / CAST(1000.0 AS DOUBLE) AS x,
        |    CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END AS y
        |  FROM orders),
        |it(i, b0, b1) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  UNION ALL
        |  SELECT i + 1,
        |    ROUND(b0 + (swxx * g0 - swx * g1) / (sw * swxx - swx * swx), 9),
        |    ROUND(b1 + (sw * g1 - swx * g0) / (sw * swxx - swx * swx), 9)
        |  FROM (
        |    SELECT i, b0, b1,
        |      CAST(SUM(CAST(y - p AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |      CAST(SUM(CAST((y - p) * x AS DECIMAL(28,12))) AS DOUBLE)
        |        AS g1,
        |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS sw,
        |      CAST(SUM(CAST(p * (1.0 - p) * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swx,
        |      CAST(SUM(CAST(p * (1.0 - p) * x * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swxx
        |    FROM (
        |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, d.x AS x,
        |        d.y AS y,
        |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x))) AS p
        |      FROM it, d
        |      WHERE it.i < 6)
        |    GROUP BY i, b0, b1)),
        |fin AS (SELECT b0, b1 FROM it WHERE i = 6),
        |sc AS (
        |  SELECT x, y,
        |    ROUND(1.0 / (1.0 + EXP(-(fin.b0 + fin.b1 * x))), 6) AS pc
        |  FROM d, fin),
        |b AS (
        |  SELECT GREATEST(CAST(0 AS BIGINT),
        |      LEAST(CAST(FLOOR(x * 10) AS BIGINT), 9)) AS bin,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,3))) AS DOUBLE) / COUNT(*)
        |      AS avg_raw,
        |    CAST(SUM(CAST(pc AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*)
        |      AS avg_cal,
        |    CAST(SUM(CAST(y AS BIGINT)) AS DOUBLE) / COUNT(*) AS pos_rate
        |  FROM sc GROUP BY bin),
        |e AS (
        |  SELECT
        |    ROUND(CAST(SUM(CAST(ABS(pos_rate - avg_raw) *
        |      CAST(n AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
        |      / SUM(n), 6) AS ece_raw,
        |    ROUND(CAST(SUM(CAST(ABS(pos_rate - avg_cal) *
        |      CAST(n AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE)
        |      / SUM(n), 6) AS ece_cal
        |  FROM b)
        |SELECT b.bin, b.n, ROUND(b.avg_raw, 6) AS avg_raw,
        |  ROUND(b.avg_cal, 6) AS avg_cal,
        |  ROUND(b.pos_rate, 6) AS pos_rate, e.ece_raw, e.ece_cal
        |FROM b, e ORDER BY bin""".stripMargin,

    // closed-form NB: round-9 params from exact decimal sums, fixed-shape
    // log-posterior rounded to 6, argmax tie-broken toward the smallest
    // class (ORDER BY sc DESC, cand ASC ≡ the strict-greater fold)
    "q203_gaussian_nb" ->
      """WITH d AS (
        |  SELECT l_returnflag AS cls, CAST(l_quantity AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2,
        |    ((l_orderkey % 1000003) * 2654435761) % 10 AS b
        |  FROM lineitem),
        |tr AS (SELECT * FROM d WHERE b < 7),
        |nt AS (SELECT COUNT(*) AS n FROM tr),
        |p AS (
        |  SELECT cls, COUNT(*) AS nc,
        |    CAST(SUM(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS q1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS q2
        |  FROM tr GROUP BY cls),
        |pp AS (
        |  SELECT cls,
        |    ROUND(CAST(nc AS DOUBLE) / (SELECT n FROM nt), 9) AS prior,
        |    ROUND(s1 / nc, 9) AS mu1,
        |    ROUND(GREATEST((q1 - s1 * s1 / nc) / (nc - 1),
        |      0.000000001), 9) AS v1,
        |    ROUND(s2 / nc, 9) AS mu2,
        |    ROUND(GREATEST((q2 - s2 * s2 / nc) / (nc - 1),
        |      0.000000001), 9) AS v2
        |  FROM p),
        |g AS (
        |  SELECT cls, x1, x2, COUNT(*) AS n
        |  FROM d WHERE b >= 7 GROUP BY cls, x1, x2),
        |s AS (
        |  SELECT g.cls AS actual, g.x1 AS x1, g.x2 AS x2, g.n AS n,
        |    pp.cls AS cand,
        |    ROUND(LN(pp.prior)
        |      - 0.5 * (LN(6.283185307179586 * pp.v1)
        |        + ((g.x1 - pp.mu1) * (g.x1 - pp.mu1)) / pp.v1)
        |      - 0.5 * (LN(6.283185307179586 * pp.v2)
        |        + ((g.x2 - pp.mu2) * (g.x2 - pp.mu2)) / pp.v2), 6) AS sc
        |  FROM g, pp),
        |pick AS (
        |  SELECT actual, n, cand,
        |    ROW_NUMBER() OVER (PARTITION BY actual, x1, x2
        |      ORDER BY sc DESC, cand ASC) AS rn
        |  FROM s)
        |SELECT actual, cand AS predicted, CAST(SUM(n) AS BIGINT) AS n_rows
        |FROM pick WHERE rn = 1
        |GROUP BY actual, cand
        |ORDER BY actual, predicted""".stripMargin,

    // exact-integer contingency per observed (token, class); χ² in double
    // with the same fixed parenthesization as the Spark expression
    "q204_chi2_tokens" ->
      """WITH pres AS (
        |  SELECT d.lang AS cls, u.token
        |  FROM documents d,
        |    UNNEST(list_distinct(string_split(TRIM(d.text), ' ')))
        |      AS u(token)
        |  WHERE u.token <> ''),
        |nd AS (SELECT COUNT(*) AS n FROM documents),
        |pc AS (SELECT lang AS cls, COUNT(*) AS nc FROM documents
        |  GROUP BY lang),
        |pa AS (SELECT token, cls, COUNT(*) AS na FROM pres
        |  GROUP BY token, cls),
        |tt AS (SELECT token, CAST(SUM(na) AS BIGINT) AS ntok FROM pa
        |  GROUP BY token HAVING SUM(na) >= 5),
        |ctg AS (
        |  SELECT pa.cls, pa.token, pa.na, tt.ntok, nd.n,
        |    CAST(pa.na AS DOUBLE) AS ad,
        |    CAST(tt.ntok - pa.na AS DOUBLE) AS bd,
        |    CAST(pc.nc - pa.na AS DOUBLE) AS cd,
        |    CAST(nd.n - pc.nc - (tt.ntok - pa.na) AS DOUBLE) AS dd
        |  FROM pa JOIN tt USING (token) JOIN pc USING (cls), nd),
        |sc AS (
        |  SELECT cls, token, na, ntok,
        |    CASE WHEN ((ad + bd) * (cd + dd)) * ((ad + cd) * (bd + dd)) > 0
        |      THEN ROUND((CAST(n AS DOUBLE) *
        |          ((ad * dd - bd * cd) * (ad * dd - bd * cd))) /
        |        (((ad + bd) * (cd + dd)) * ((ad + cd) * (bd + dd))), 6)
        |      END AS chi2
        |  FROM ctg),
        |rk AS (
        |  SELECT cls, token, na, ntok, chi2,
        |    ROW_NUMBER() OVER (PARTITION BY cls
        |      ORDER BY chi2 DESC, token ASC) AS rank
        |  FROM sc)
        |SELECT cls, rank, token, na AS n_docs_in_class,
        |  ntok AS n_docs_total, chi2
        |FROM rk WHERE rank <= 10
        |ORDER BY cls, rank""".stripMargin,
    "q201_quantile_sketch" -> logBinQuantileSql,
    // the streaming path converges to the batch sketch exactly
    // (additive counters commute with micro-batching) — same oracle
    "q202_stream_quantiles" -> logBinQuantileSql,

    // the q189 recursive Newton replay supplies the probe model; scoring,
    // margin ranking, and the entropy card are plain expressions over it
    "q199_active_selection" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CASE WHEN l_returnflag <> 'N' THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem WHERE l_orderkey < 500),
        |it(i, b0, b1, ll) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
        |    CAST(NULL AS DOUBLE)
        |  UNION ALL
        |  SELECT i + 1,
        |    ROUND(b0 + (swxx * g0 - swx * g1) / (sw * swxx - swx * swx), 9),
        |    ROUND(b1 + (sw * g1 - swx * g0) / (sw * swxx - swx * swx), 9),
        |    llm
        |  FROM (
        |    SELECT i, b0, b1,
        |      CAST(SUM(CAST(y - p AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |      CAST(SUM(CAST((y - p) * x AS DECIMAL(28,12))) AS DOUBLE) AS g1,
        |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS sw,
        |      CAST(SUM(CAST(p * (1.0 - p) * x AS DECIMAL(28,12))) AS DOUBLE)
        |        AS swx,
        |      CAST(SUM(CAST(p * (1.0 - p) * x * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swxx,
        |      ROUND(CAST(SUM(CAST(y * LN(p) + (1.0 - y) * LN(1.0 - p)
        |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
        |    FROM (
        |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, d.x AS x, d.y AS y,
        |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x))) AS p
        |      FROM it, d
        |      WHERE it.i < 6)
        |    GROUP BY i, b0, b1)),
        |prm AS (SELECT ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1
        |  FROM it WHERE i = 6),
        |grp AS (SELECT x AS l_quantity, COUNT(*) AS n_rows FROM d
        |  GROUP BY 1),
        |sc AS (
        |  SELECT l_quantity, n_rows,
        |    ROUND(1.0 / (1.0 + EXP(-(b0 + b1 * l_quantity))), 6) AS p
        |  FROM grp, prm),
        |sc2 AS (
        |  SELECT l_quantity, n_rows, p,
        |    ROUND(ABS(p - 0.5), 6) AS margin,
        |    LEAST(GREATEST(p, 0.000001), 0.999999) AS pc
        |  FROM sc)
        |SELECT l_quantity, n_rows, p, margin,
        |  ROUND(-(pc * LN(pc) + (1.0 - pc) * LN(1.0 - pc)), 6) AS entropy
        |FROM sc2
        |ORDER BY margin ASC, l_quantity ASC LIMIT 10""".stripMargin,

    // one exact-decimal stats pass, then 8 scalar soft-threshold CD
    // sweeps replayed over a 1-row stats frame in a recursive CTE
    "q196_lasso_cd" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 2000),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(x1 AS DECIMAL(28,2))) AS DOUBLE) AS sx1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(28,2))) AS DOUBLE) AS sx2,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,4))) AS DOUBLE) AS s11,
        |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s22,
        |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s12,
        |    CAST(SUM(CAST(x1 * y AS DECIMAL(28,4))) AS DOUBLE) AS s1y,
        |    CAST(SUM(CAST(x2 * y AS DECIMAL(28,4))) AS DOUBLE) AS s2y,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy
        |  FROM d),
        |c0 AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM s),
        |c AS (
        |  SELECT nd, sx1, sx2, sy,
        |    s11 - sx1 * sx1 / nd AS s11c,
        |    s22 - sx2 * sx2 / nd AS s22c,
        |    s12 - sx1 * sx2 / nd AS s12c,
        |    s1y - sx1 * sy / nd AS s1yc,
        |    s2y - sx2 * sy / nd AS s2yc,
        |    syy - sy * sy / nd AS syyc
        |  FROM c0),
        |it(i, b1, b2) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  UNION ALL
        |  SELECT i + 1, nb1,
        |    ROUND((CASE WHEN rho2 > 100.0 THEN rho2 - 100.0
        |      WHEN rho2 < -100.0 THEN rho2 + 100.0
        |      ELSE 0.0 END) * nd / s22c, 9)
        |  FROM (
        |    SELECT i, nb1, (s2yc - nb1 * s12c) / nd AS rho2, nd, s22c
        |    FROM (
        |      SELECT i,
        |        ROUND((CASE WHEN rho1 > 100.0 THEN rho1 - 100.0
        |          WHEN rho1 < -100.0 THEN rho1 + 100.0
        |          ELSE 0.0 END) * nd / s11c, 9) AS nb1,
        |        nd, s11c, s22c, s12c, s2yc
        |      FROM (
        |        SELECT it.i AS i,
        |          (c.s1yc - it.b2 * c.s12c) / c.nd AS rho1,
        |          c.nd AS nd, c.s11c AS s11c, c.s22c AS s22c,
        |          c.s12c AS s12c, c.s2yc AS s2yc
        |        FROM it, c WHERE it.i < 8))))
        |SELECT i AS sweep, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2,
        |  ROUND(sy / nd - b1 * (sx1 / nd) - b2 * (sx2 / nd), 6)
        |    AS intercept,
        |  ROUND((syyc - 2.0 * (b1 * s1yc + b2 * s2yc) +
        |      (b1 * b1 * s11c + 2.0 * b1 * b2 * s12c +
        |       b2 * b2 * s22c)) / (2.0 * nd) +
        |    100.0 * (ABS(b1) + ABS(b2)), 2) AS objective
        |FROM it, c WHERE i >= 1
        |ORDER BY sweep""".stripMargin,

    // q62's two masks; OLS closed form for the regression head, the q189
    // recursive-CTE Newton replay for the classification head
    "q195_multitask_portable" ->
      """WITH RECURSIVE src AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    NULLIF(l_tax, 0.0) AS tax_target,
        |    CASE WHEN l_partkey % 3 <> 0 THEN
        |      CASE WHEN l_discount >= 0.05 THEN 1.0 ELSE 0.0 END
        |    END AS disc_target
        |  FROM lineitem WHERE l_orderkey < 2000),
        |reg AS (
        |  SELECT x, CAST(tax_target AS DOUBLE) AS y FROM src
        |  WHERE tax_target IS NOT NULL),
        |rs AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx
        |  FROM reg),
        |rp AS (
        |  SELECT n, coef_raw, (sy - coef_raw * sx) / n AS intercept_raw
        |  FROM (
        |    SELECT *, CASE WHEN n * sxx - sx * sx <> 0.0
        |      THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS coef_raw
        |    FROM rs)),
        |rrow AS (
        |  SELECT 'reg' AS task, rp.n AS n_rows,
        |    ROUND(rp.intercept_raw, 6) AS intercept,
        |    ROUND(rp.coef_raw, 6) AS coef,
        |    ROUND(SQRT(CAST(SUM(CAST(
        |        (reg.y - (rp.intercept_raw + rp.coef_raw * reg.x)) *
        |        (reg.y - (rp.intercept_raw + rp.coef_raw * reg.x))
        |      AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)), 6) AS metric
        |  FROM reg, rp
        |  GROUP BY rp.n, rp.intercept_raw, rp.coef_raw),
        |clsd AS (
        |  SELECT x, CAST(disc_target AS DOUBLE) AS y FROM src
        |  WHERE disc_target IS NOT NULL),
        |it(i, b0, b1, ll) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
        |    CAST(NULL AS DOUBLE)
        |  UNION ALL
        |  SELECT i + 1,
        |    ROUND(b0 + (swxx * g0 - swx * g1) / (sw * swxx - swx * swx), 9),
        |    ROUND(b1 + (sw * g1 - swx * g0) / (sw * swxx - swx * swx), 9),
        |    llm
        |  FROM (
        |    SELECT i, b0, b1,
        |      CAST(SUM(CAST(y - p AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |      CAST(SUM(CAST((y - p) * x AS DECIMAL(28,12))) AS DOUBLE) AS g1,
        |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS sw,
        |      CAST(SUM(CAST(p * (1.0 - p) * x AS DECIMAL(28,12))) AS DOUBLE)
        |        AS swx,
        |      CAST(SUM(CAST(p * (1.0 - p) * x * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swxx,
        |      ROUND(CAST(SUM(CAST(y * LN(p) + (1.0 - y) * LN(1.0 - p)
        |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
        |    FROM (
        |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1,
        |        clsd.x AS x, clsd.y AS y,
        |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * clsd.x))) AS p
        |      FROM it, clsd
        |      WHERE it.i < 6)
        |    GROUP BY i, b0, b1)),
        |crow AS (
        |  SELECT 'cls' AS task,
        |    (SELECT COUNT(*) FROM clsd) AS n_rows,
        |    ROUND(b0, 6) AS intercept, ROUND(b1, 6) AS coef, ll AS metric
        |  FROM it WHERE i = 6)
        |SELECT * FROM rrow UNION ALL SELECT * FROM crow
        |ORDER BY task""".stripMargin,
    "q163_lsh_buckets" -> q163LshSql,
    "q164_ewma" -> q164EwmaSql,
    "q165_token_chunks" -> q165ChunkSql,
    "q166_hybrid_rrf" -> q166RrfSql,
    // the SQL-text BM25 twin shares q161's oracle (identical aggregation
    // text modulo the token-explode idiom)
    "q167_sql_bm25" -> q161Bm25Sql,

    // seasonal strength: the ANOVA identity on per-(user,hour)
    // exact-decimal sufficient statistics; per-hour terms rounded then
    // summed exactly (order-free)
    "q176_seasonal_strength" ->
      """WITH byh AS (
        |  SELECT user_id, date_part('hour', ts) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS n_h,
        |    SUM(CAST(value AS DECIMAL(28,4))) AS s_h,
        |    SUM(CAST(value * value AS DECIMAL(38,8))) AS q_h
        |  FROM events GROUP BY 1, 2),
        |agg AS (
        |  SELECT user_id,
        |    CAST(SUM(n_h) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_hours_active,
        |    CAST(SUM(s_h) AS DOUBLE) AS s,
        |    CAST(SUM(q_h) AS DOUBLE) AS q,
        |    CAST(SUM(CAST(ROUND(
        |      (CAST(s_h AS DOUBLE) * CAST(s_h AS DOUBLE)) /
        |        CAST(n_h AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE) AS w
        |  FROM byh GROUP BY 1)
        |SELECT user_id, n_events, n_hours_active,
        |  ROUND(q - s * s / CAST(n_events AS DOUBLE), 4) AS sse_total,
        |  ROUND(q - w, 4) AS sse_within,
        |  CASE WHEN ROUND(q - s * s / CAST(n_events AS DOUBLE), 4) > 0
        |    THEN ROUND(CAST(1.0 AS DOUBLE) -
        |      (q - w) / (q - s * s / CAST(n_events AS DOUBLE)), 6) END
        |    AS seasonal_strength
        |FROM agg
        |ORDER BY user_id""".stripMargin,

    // quality gate: kth-smallest = ORDER BY LIMIT/OFFSET on the same
    // micro-integer scores; k = ceil(n/10) lower-convention percentiles
    "q175_quality_gate" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, CAST(ROUND(
        |    ROUND(LEAST(len(toks) / 100.0, 1.0) *
        |      (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) /
        |        CAST(len(toks) AS DOUBLE)), 6) * 1000000.0, 0) AS BIGINT)
        |    AS q_micro
        |  FROM t),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM q),
        |ranked AS (
        |  SELECT q_micro, ROW_NUMBER() OVER (ORDER BY q_micro) AS r FROM q),
        |p10 AS (
        |  SELECT q_micro AS p10_micro FROM ranked, n
        |  WHERE r = (n_docs + 9) // 10),
        |p90 AS (
        |  SELECT q_micro AS p90_micro FROM ranked, n
        |  WHERE r = (9 * n_docs + 9) // 10)
        |SELECT n.n_docs, p10.p10_micro, p90.p90_micro,
        |  CAST(SUM(CASE WHEN q_micro < p10_micro THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_below,
        |  CAST(SUM(CASE WHEN q_micro >= p10_micro AND q_micro <= p90_micro
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_core,
        |  CAST(SUM(CASE WHEN q_micro > p90_micro THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_above
        |FROM q CROSS JOIN n CROSS JOIN p10 CROSS JOIN p90
        |GROUP BY 1, 2, 3""".stripMargin,

    // rolling z-score: exact decimal window sums, double variance after
    // one cast; CASE mirrors the null-below-2-priors / zero-variance path
    "q174_rolling_zscore" ->
      """WITH s AS (
        |  SELECT user_id, ts, event_id, value,
        |    COUNT(CAST(value AS DECIMAL(28,4))) OVER w AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(28,4))) OVER w AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(value * value AS DECIMAL(38,8))) OVER w AS DOUBLE)
        |      AS s2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
        |z AS (
        |  SELECT user_id, ts, event_id, value,
        |    CASE WHEN n >= 2 AND
        |        (n * s2 - s1 * s1) / (n * (n - CAST(1.0 AS DOUBLE))) > 0
        |      THEN ROUND((value - s1 / n) /
        |        SQRT((n * s2 - s1 * s1) / (n * (n - CAST(1.0 AS DOUBLE)))),
        |        6) END AS z_score
        |  FROM s)
        |SELECT user_id, ts, event_id, value, z_score,
        |  CASE WHEN z_score IS NOT NULL THEN ABS(z_score) > 3.0 END
        |    AS is_anomaly
        |FROM z
        |ORDER BY user_id, ts, event_id""".stripMargin,

    // source overlap: distinct (source, shingle) self-join at source
    // grain (n_sources² output), exact counts
    "q173_source_overlap" ->
      """WITH toks AS (
        |  SELECT source, string_split(trim(text), ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT source AS src, sh FROM (
        |    SELECT source, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [array_to_string(tk, ' ')] END) AS sh
        |    FROM toks)),
        |sizes AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1),
        |shared AS (
        |  SELECT a.src AS src_a, b.src AS src_b,
        |    CAST(COUNT(*) AS BIGINT) AS n_shared
        |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.src < b.src
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared,
        |  ROUND(n_shared / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6)
        |    AS src_jaccard
        |FROM shared
        |JOIN sizes sa ON sa.src = src_a
        |JOIN sizes sb ON sb.src = src_b
        |ORDER BY src_a, src_b""".stripMargin,

    // mixture weights: n^tau as explicit exp(tau ln n), rounded powers
    // summed through exact decimals (order-free denominator)
    "q172_mixture_weights" ->
      """WITH d AS (
        |  SELECT source, len(string_split(trim(text), ' ')) AS n_tok
        |  FROM documents),
        |per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM d GROUP BY 1),
        |pw AS (
        |  SELECT source, n_docs, n_tokens,
        |    ROUND(EXP(CAST(0.7 AS DOUBLE) *
        |      LN(CAST(n_tokens AS DOUBLE))), 6) AS p6
        |  FROM per),
        |tot AS (
        |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS tot,
        |    SUM(CAST(p6 AS DECIMAL(28,6))) AS tot_pow
        |  FROM pw)
        |SELECT source, n_docs, n_tokens,
        |  ROUND(n_tokens / CAST(tot AS DOUBLE), 6) AS p_raw,
        |  ROUND(p6 / CAST(tot_pow AS DOUBLE), 6) AS mix_weight,
        |  ROUND(CAST(1000000.0 AS DOUBLE) * (p6 / CAST(tot_pow AS DOUBLE)) /
        |    CAST(n_tokens AS DOUBLE), 6) AS epochs_at_budget
        |FROM pw CROSS JOIN tot
        |ORDER BY source""".stripMargin,

    // n-gram language ID: trigram profiles + overlap argmax replayed on
    // exact integers; argmax = rank-1 row over (matches desc, lang)
    "q171_ngram_langid" ->
      """WITH tris AS (
        |  SELECT doc_id, lang,
        |    unnest(list_transform(
        |      range(1, GREATEST(length(text) - 2, 1) + 1),
        |      i -> substring(text, CAST(i AS INT), 3))) AS tri
        |  FROM documents),
        |profiles AS (
        |  SELECT lang AS plang, tri FROM (
        |    SELECT lang, tri, ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY COUNT(*) DESC, tri) AS r
        |    FROM tris GROUP BY lang, tri)
        |  WHERE r <= 20),
        |doctris AS (SELECT DISTINCT doc_id, tri FROM tris),
        |matches AS (
        |  SELECT d.doc_id, p.plang, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM doctris d JOIN profiles p USING (tri)
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT doc_id, plang, n FROM (
        |    SELECT doc_id, plang, n, ROW_NUMBER() OVER (
        |      PARTITION BY doc_id ORDER BY n DESC, plang) AS r
        |    FROM matches)
        |  WHERE r = 1)
        |SELECT d.doc_id, d.lang,
        |  COALESCE(b.plang, 'und') AS lang_pred_ngram,
        |  COALESCE(b.n, 0) AS n_profile_matches
        |FROM documents d LEFT JOIN best b USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,

    // vocabulary build: count/rank/cumsum replay; the coverage
    // denominator is the FULL token total, mirrored
    "q170_vocab_build" ->
      """WITH counts AS (
        |  SELECT term, COUNT(*) AS n FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS term
        |    FROM documents)
        |  GROUP BY term),
        |total AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM counts),
        |head AS (
        |  SELECT term, n FROM counts WHERE n >= 2
        |  ORDER BY n DESC, term LIMIT 40),
        |ranked AS (
        |  SELECT term, n,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, term) AS BIGINT) - 1
        |      AS token_id,
        |    CAST(SUM(n) OVER (ORDER BY n DESC, term
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM head)
        |SELECT token_id, term, n,
        |  ROUND(cum / CAST(t.n_total AS DOUBLE), 6) AS cum_coverage
        |FROM ranked CROSS JOIN total t
        |ORDER BY token_id""".stripMargin,

    // streaming EWMA: the per-user recurrence replayed as an ORDERED
    // list_reduce — identical IEEE fold (αx + (1−α)acc, acc₀ = x₀), so
    // raw doubles match bit-for-bit with no rounding
    "q169_stream_ewma" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  list_reduce(list(value ORDER BY ts, event_id),
        |    (acc, x) -> CAST(0.2 AS DOUBLE) * x +
        |      CAST(0.8 AS DOUBLE) * acc) AS ewma_last
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // containment: the q39 postings replay with the asymmetric
    // |A∩B|/|A| ratios (df cap mirrored; filter on ROUNDED values)
    "q168_containment" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [array_to_string(tk, ' ')] END) AS sh
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |cold AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |  FROM sh a JOIN cold USING (sh)
        |  JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  ROUND(n_shared / CAST(sa.n_sh AS DOUBLE), 6) AS containment_a_in_b,
        |  ROUND(n_shared / CAST(sb.n_sh AS DOUBLE), 6) AS containment_b_in_a
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE GREATEST(ROUND(n_shared / CAST(sa.n_sh AS DOUBLE), 6),
        |               ROUND(n_shared / CAST(sb.n_sh AS DOUBLE), 6)) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // isotonic calibration: the PAV fixpoint is the UNIQUE isotonic L2
    // solution, so DuckDB reaches it by repeatedly pooling maximal
    // violating chains (window-grouped, aggregate-merged) inside a
    // recursive CTE until monotone — the q67 recursive-CTE precedent.
    // Tied scores pre-aggregate to their mean (MLlib makeUnique); the
    // model's compression emits first+last point of each equal-prediction
    // run (one row when the run is a single point). All block values are
    // exact integer-sum ratios divided once, so doubles match bit-for-bit.
    "q126_isotonic_calibration" ->
      """WITH RECURSIVE pts AS (
        |  SELECT value AS x,
        |    CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
        |  FROM events),
        |uniq AS (
        |  SELECT x, SUM(y) AS s, CAST(COUNT(*) AS DOUBLE) AS n
        |  FROM pts GROUP BY x),
        |pav(r, ord, lo, hi, s, n) AS (
        |  SELECT 0, ROW_NUMBER() OVER (ORDER BY x), x, x, s, n FROM uniq
        |  UNION ALL
        |  SELECT r + 1, MIN(ord), MIN(lo), MAX(hi), SUM(s), SUM(n)
        |  FROM (
        |    SELECT r, ord, lo, hi, s, n,
        |      SUM(stp) OVER (ORDER BY ord) AS grp,
        |      MAX(1 - stp) OVER () AS any_viol
        |    FROM (
        |      SELECT r, ord, lo, hi, s, n,
        |        CASE WHEN LAG(s / n) OVER (ORDER BY ord) > s / n
        |          THEN 0 ELSE 1 END AS stp
        |      FROM pav))
        |  WHERE any_viol = 1
        |  GROUP BY r, grp),
        |fin AS (
        |  SELECT lo, hi, s / n AS v FROM pav
        |  WHERE r = (SELECT MAX(r) FROM pav)),
        |runs AS (
        |  SELECT lo, hi, v,
        |    SUM(CASE WHEN pv IS NULL OR pv <> v THEN 1 ELSE 0 END)
        |      OVER (ORDER BY lo) AS run_id
        |  FROM (SELECT lo, hi, v, LAG(v) OVER (ORDER BY lo) AS pv FROM fin)),
        |comp AS (
        |  SELECT MIN(lo) AS lo, MAX(hi) AS hi, MIN(v) AS v
        |  FROM runs GROUP BY run_id)
        |SELECT boundary, fitted FROM (
        |  SELECT ROUND(lo, 6) AS boundary, ROUND(v, 6) AS fitted FROM comp
        |  UNION ALL
        |  SELECT ROUND(hi, 6), ROUND(v, 6) FROM comp WHERE hi <> lo)
        |ORDER BY boundary, fitted""".stripMargin,

    "q124_int8_quantization" ->
      """WITH f AS (
        |  SELECT unnest(list_transform(CAST(embedding AS DOUBLE[]),
        |    (x, i) -> struct_pack(dim := i - 1, v := x))) AS s
        |  FROM embeddings),
        |vals AS (SELECT CAST(s.dim AS INTEGER) AS dim, s.v AS v FROM f),
        |b AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM vals GROUP BY dim),
        |q AS (
        |  SELECT vals.dim, v, mn, mx,
        |    CASE WHEN mx = mn THEN 0
        |         ELSE CAST(ROUND((v - mn) / (mx - mn) * 255) - 128
        |           AS INTEGER) END AS qq
        |  FROM vals JOIN b ON vals.dim = b.dim),
        |r AS (
        |  SELECT dim, mn, mx,
        |    ABS(v - (CASE WHEN mx = mn THEN mn
        |      ELSE mn + CAST(qq + 128 AS DOUBLE) / 255.0 * (mx - mn) END))
        |      AS err
        |  FROM q)
        |SELECT dim, COUNT(*) AS n,
        |  ROUND(MAX(mx) - MAX(mn), 6) AS range,
        |  ROUND(MAX(err), 6) AS max_abs_err,
        |  ROUND(SQRT(CAST(SUM(CAST(err * err AS DECIMAL(28,16))) AS DOUBLE)
        |    / COUNT(*)), 6) AS rmse
        |FROM r GROUP BY dim ORDER BY dim""".stripMargin,

    "q119_rolling_backtest" ->
      """WITH rng AS (
        |  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events),
        |b AS (
        |  SELECT
        |    CAST((epoch_us(ts) - mn) // 1000000 AS DOUBLE) AS x,
        |    LEAST(5, CAST(((epoch_us(ts) - mn) * 6) // (mx - mn + 1)
        |      AS INTEGER)) AS slice,
        |    CAST(value AS DOUBLE) AS y
        |  FROM events, rng),
        |suff AS (
        |  SELECT slice, COUNT(*) AS n,
        |    SUM(CAST(x AS DECIMAL(28,0))) AS sx,
        |    SUM(CAST(y AS DECIMAL(28,2))) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(28,2))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(28,0))) AS sxx
        |  FROM b GROUP BY slice),
        |acc AS (
        |  SELECT slice,
        |    SUM(n) OVER w AS tn,
        |    CAST(SUM(sx) OVER w AS DOUBLE) AS tsx,
        |    CAST(SUM(sy) OVER w AS DOUBLE) AS tsy,
        |    CAST(SUM(sxy) OVER w AS DOUBLE) AS tsxy,
        |    CAST(SUM(sxx) OVER w AS DOUBLE) AS tsxx
        |  FROM suff
        |  WINDOW w AS (ORDER BY slice
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |params AS (
        |  SELECT slice, tn,
        |    (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx) AS slope,
        |    (tsy - (tn * tsxy - tsx * tsy) / (tn * tsxx - tsx * tsx) * tsx)
        |      / tn AS intercept
        |  FROM acc WHERE tn IS NOT NULL AND tn > 1
        |    AND (tn * tsxx - tsx * tsx) <> 0)
        |SELECT b.slice AS fold, CAST(MAX(tn) AS BIGINT) AS n_train,
        |  COUNT(*) AS n_test,
        |  ROUND(MAX(slope), 6) AS slope,
        |  ROUND(MAX(intercept), 6) AS intercept,
        |  ROUND(SQRT(CAST(SUM(CAST(
        |    (y - (intercept + slope * x)) * (y - (intercept + slope * x))
        |    AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)), 6) AS rmse_test
        |FROM b JOIN params ON b.slice = params.slice
        |GROUP BY b.slice
        |ORDER BY fold""".stripMargin,

    "q120_benford_audit" ->
      """WITH d AS (
        |  SELECT CASE
        |    WHEN o_orderkey < 10 THEN o_orderkey
        |    WHEN o_orderkey < 100 THEN o_orderkey // 10
        |    WHEN o_orderkey < 1000 THEN o_orderkey // 100
        |    WHEN o_orderkey < 10000 THEN o_orderkey // 1000
        |    WHEN o_orderkey < 100000 THEN o_orderkey // 10000
        |    WHEN o_orderkey < 1000000 THEN o_orderkey // 100000
        |    WHEN o_orderkey < 10000000 THEN o_orderkey // 1000000
        |    WHEN o_orderkey < 100000000 THEN o_orderkey // 10000000
        |    WHEN o_orderkey < 1000000000 THEN o_orderkey // 100000000
        |    WHEN o_orderkey < 10000000000 THEN o_orderkey // 1000000000
        |    WHEN o_orderkey < 100000000000 THEN o_orderkey // 10000000000
        |    WHEN o_orderkey < 1000000000000 THEN o_orderkey // 100000000000
        |    ELSE o_orderkey // 1000000000000 END AS digit
        |  FROM orders WHERE o_orderkey >= 1),
        |c AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT SUM(n) AS tot FROM c),
        |e AS (
        |  SELECT digit, n,
        |    ROUND(CAST(n AS DOUBLE) / tot, 6) AS obs_p,
        |    CAST(CASE digit
        |      WHEN 1 THEN 0.301030 WHEN 2 THEN 0.176091
        |      WHEN 3 THEN 0.124939 WHEN 4 THEN 0.096910
        |      WHEN 5 THEN 0.079181 WHEN 6 THEN 0.066947
        |      WHEN 7 THEN 0.057992 WHEN 8 THEN 0.051153
        |      WHEN 9 THEN 0.045757 END AS DOUBLE) AS exp_p
        |  FROM c, t)
        |SELECT digit, n, obs_p, exp_p,
        |  ROUND(ABS(obs_p - exp_p), 6) AS abs_dev
        |FROM e ORDER BY digit""".stripMargin,
    // q328: Jonckheere–Terpstra replayed — (value, group) counts,
    // per-group zero-filled cumulative spine, exact-HUGEINT 2J off
    // the ordered pair join, Hollander–Wolfe tie-corrected moments in
    // the identical double parenthesization.
    "q328_jonckheere" ->
      """WITH d AS (
        |  SELECT CAST(o_orderpriority AS VARCHAR) AS g,
        |    CAST(o_totalprice AS DOUBLE) AS v
        |  FROM orders
        |  WHERE o_totalprice IS NOT NULL AND o_orderpriority IS NOT NULL),
        |byvg AS (
        |  SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM d GROUP BY v, g),
        |spine AS (SELECT DISTINCT v FROM byvg),
        |grps AS (SELECT DISTINCT g FROM byvg),
        |filled AS (
        |  SELECT s.v, gr.g, COALESCE(b.c, 0) AS c
        |  FROM spine s CROSS JOIN grps gr
        |  LEFT JOIN byvg b ON s.v = b.v AND gr.g = b.g),
        |f AS (
        |  SELECT v, g, c,
        |    SUM(c) OVER (PARTITION BY g ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |      AS prev
        |  FROM filled),
        |j AS (
        |  SELECT CAST(SUM(CAST(b.c AS HUGEINT) *
        |      (CAST(a.prev AS HUGEINT) * 2 + CAST(a.c AS HUGEINT)))
        |    AS BIGINT) AS j2
        |  FROM f a JOIN f b ON a.v = b.v
        |  WHERE a.g < b.g),
        |sizes AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(SUM(n_g * n_g) AS BIGINT) AS n2,
        |    CAST(SUM(n_g * (n_g - 1) * (2 * n_g + 5)) AS BIGINT) AS na,
        |    CAST(SUM(n_g * (n_g - 1) * (n_g - 2)) AS BIGINT) AS nb,
        |    CAST(SUM(n_g * (n_g - 1)) AS BIGINT) AS nc
        |  FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g
        |        FROM byvg GROUP BY g)),
        |ties AS (
        |  SELECT
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS ta,
        |    CAST(SUM(t * (t - 1) * (t - 2)) AS BIGINT) AS tb,
        |    CAST(SUM(t * (t - 1)) AS BIGINT) AS tc
        |  FROM (SELECT CAST(SUM(c) AS BIGINT) AS t
        |        FROM byvg GROUP BY v)),
        |m AS (
        |  SELECT j.j2, sizes.n, sizes.k,
        |    CAST(sizes.n AS DOUBLE) AS nd,
        |    CAST(sizes.n2 AS DOUBLE) AS n2d,
        |    CAST(sizes.na AS DOUBLE) AS nad,
        |    CAST(sizes.nb AS DOUBLE) AS nbd,
        |    CAST(sizes.nc AS DOUBLE) AS ncd,
        |    CAST(ties.ta AS DOUBLE) AS tad,
        |    CAST(ties.tb AS DOUBLE) AS tbd,
        |    CAST(ties.tc AS DOUBLE) AS tcd
        |  FROM j, sizes, ties),
        |fin AS (
        |  SELECT n, k,
        |    CAST(j2 AS DOUBLE) / 2.0 AS jd,
        |    (nd * nd - n2d) / 4.0 AS ej,
        |    (nd * (nd - 1.0) * (2.0 * nd + 5.0) - nad - tad) / 72.0 +
        |      nbd * tbd / (36.0 * nd * (nd - 1.0) * (nd - 2.0)) +
        |      ncd * tcd / (8.0 * nd * (nd - 1.0)) AS varj
        |  FROM m)
        |SELECT n, k, ROUND(jd, 1) AS j_stat, ROUND(ej, 6) AS e_j,
        |  ROUND(varj, 6) AS var_j,
        |  CASE WHEN varj > 0.0
        |    THEN ROUND((jd - ej) / SQRT(varj), 6) END AS z
        |FROM fin""".stripMargin,

    // q329: Cronbach's α replayed — one moment aggregation (exact
    // DECIMAL(28,6) sums of items, squares, all 6 cross-products),
    // then the identical double shapes: item variances in declared
    // order, pair covariances/correlations in (i<j) order, α_raw and
    // α_std with the same literal folding.
    "q329_cronbach_alpha" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x0,
        |    CAST(l_extendedprice AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2,
        |    CAST(l_tax AS DOUBLE) AS x3
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x0 AS DECIMAL(28,6))) AS DOUBLE) AS s0,
        |    CAST(SUM(CAST(x0 * x0 AS DECIMAL(28,6))) AS DOUBLE) AS q0,
        |    CAST(SUM(CAST(x1 AS DECIMAL(28,6))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,6))) AS DOUBLE) AS q1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(28,6))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,6))) AS DOUBLE) AS q2,
        |    CAST(SUM(CAST(x3 AS DECIMAL(28,6))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(x3 * x3 AS DECIMAL(28,6))) AS DOUBLE) AS q3,
        |    CAST(SUM(CAST(x0 * x1 AS DECIMAL(28,6))) AS DOUBLE) AS p0_1,
        |    CAST(SUM(CAST(x0 * x2 AS DECIMAL(28,6))) AS DOUBLE) AS p0_2,
        |    CAST(SUM(CAST(x0 * x3 AS DECIMAL(28,6))) AS DOUBLE) AS p0_3,
        |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,6))) AS DOUBLE) AS p1_2,
        |    CAST(SUM(CAST(x1 * x3 AS DECIMAL(28,6))) AS DOUBLE) AS p1_3,
        |    CAST(SUM(CAST(x2 * x3 AS DECIMAL(28,6))) AS DOUBLE) AS p2_3
        |  FROM d),
        |v AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd,
        |    q0 - s0 * s0 / CAST(n AS DOUBLE) AS v0,
        |    q1 - s1 * s1 / CAST(n AS DOUBLE) AS v1,
        |    q2 - s2 * s2 / CAST(n AS DOUBLE) AS v2,
        |    q3 - s3 * s3 / CAST(n AS DOUBLE) AS v3,
        |    p0_1 - s0 * s1 / CAST(n AS DOUBLE) AS c0_1,
        |    p0_2 - s0 * s2 / CAST(n AS DOUBLE) AS c0_2,
        |    p0_3 - s0 * s3 / CAST(n AS DOUBLE) AS c0_3,
        |    p1_2 - s1 * s2 / CAST(n AS DOUBLE) AS c1_2,
        |    p1_3 - s1 * s3 / CAST(n AS DOUBLE) AS c1_3,
        |    p2_3 - s2 * s3 / CAST(n AS DOUBLE) AS c2_3
        |  FROM m),
        |f AS (
        |  SELECT n,
        |    v0 / (nd - 1.0) + v1 / (nd - 1.0) + v2 / (nd - 1.0) +
        |      v3 / (nd - 1.0) AS sumvar,
        |    (v0 + v1 + v2 + v3 + c0_1 * 2.0 + c0_2 * 2.0 + c0_3 * 2.0 +
        |      c1_2 * 2.0 + c1_3 * 2.0 + c2_3 * 2.0) / (nd - 1.0)
        |      AS totvar,
        |    (c0_1 / SQRT(v0 * v1) + c0_2 / SQRT(v0 * v2) +
        |      c0_3 / SQRT(v0 * v3) + c1_2 / SQRT(v1 * v2) +
        |      c1_3 / SQRT(v1 * v3) + c2_3 / SQRT(v2 * v3)) / 6.0
        |      AS rbar
        |  FROM v)
        |SELECT n, CAST(4 AS INTEGER) AS k,
        |  ROUND((4.0 / 3.0) * (1.0 - sumvar / totvar), 6) AS alpha_raw,
        |  ROUND(4.0 * rbar / (1.0 + 3.0 * rbar), 6) AS alpha_std,
        |  ROUND(rbar, 6) AS mean_inter_item_r,
        |  ROUND(sumvar, 6) AS sum_item_var,
        |  ROUND(totvar, 6) AS total_var
        |FROM f""".stripMargin,

    // q330: PACF replayed — q269's spine/ACF card at 6 decimals for
    // lags 1..4, then the Durbin–Levinson recursion UNROLLED with the
    // identical ascending-j left-associated sums and round-9 at every
    // φ (the portable-fit contract).
    "q330_pacf" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) AS i,
        |    COALESCE(c.x, 0) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |tot AS (
        |  SELECT CAST(SUM(x) AS DOUBLE) AS s0,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS d
        |  FROM series),
        |lags AS (SELECT UNNEST(range(1, 5)) AS l),
        |p AS (
        |  SELECT l.l, s1.x AS x, s2.x AS x2
        |  FROM series s1 CROSS JOIN lags l
        |  JOIN series s2 ON s2.i = s1.i + l.l),
        |a AS (
        |  SELECT l, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CAST(x AS HUGEINT) * x2) AS DOUBLE) AS nl,
        |    CAST(SUM(x) AS DOUBLE) AS al,
        |    CAST(SUM(x2) AS DOUBLE) AS bl
        |  FROM p GROUP BY l),
        |acf AS (
        |  SELECT CAST(l AS BIGINT) AS lag,
        |    ROUND((nl - (s0 / CAST(d AS DOUBLE)) * (al + bl) +
        |      CAST(n_pairs AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |        (s0 / CAST(d AS DOUBLE))) /
        |      (s2 - CAST(d AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |        (s0 / CAST(d AS DOUBLE))), 6) AS acf
        |  FROM a CROSS JOIN tot),
        |r AS (
        |  SELECT MAX(CASE WHEN lag = 1 THEN acf END) AS r1,
        |    MAX(CASE WHEN lag = 2 THEN acf END) AS r2,
        |    MAX(CASE WHEN lag = 3 THEN acf END) AS r3,
        |    MAX(CASE WHEN lag = 4 THEN acf END) AS r4
        |  FROM acf),
        |k1 AS (SELECT *, ROUND(r1, 9) AS p11 FROM r),
        |k2 AS (SELECT *,
        |  ROUND((r2 - p11 * r1) / (1.0 - p11 * r1), 9) AS p22 FROM k1),
        |k2b AS (SELECT *, ROUND(p11 - p22 * p11, 9) AS p21 FROM k2),
        |k3 AS (SELECT *,
        |  ROUND((r3 - (p21 * r2 + p22 * r1)) /
        |    (1.0 - (p21 * r1 + p22 * r2)), 9) AS p33 FROM k2b),
        |k3b AS (SELECT *, ROUND(p21 - p33 * p22, 9) AS p31,
        |  ROUND(p22 - p33 * p21, 9) AS p32 FROM k3),
        |k4 AS (SELECT *,
        |  ROUND((r4 - (p31 * r3 + p32 * r2 + p33 * r1)) /
        |    (1.0 - (p31 * r1 + p32 * r2 + p33 * r3)), 9) AS p44
        |  FROM k3b)
        |SELECT CAST(lag AS BIGINT) AS lag, ROUND(pv, 6) AS pacf FROM (
        |  SELECT 1 AS lag, p11 AS pv FROM k4
        |  UNION ALL SELECT 2, p22 FROM k4
        |  UNION ALL SELECT 3, p33 FROM k4
        |  UNION ALL SELECT 4, p44 FROM k4)
        |ORDER BY lag""".stripMargin,

    // q331: Ljung–Box replayed — q269's ACF card, n = n_pairs + lag
    // (gap-free spine), per-lag terms rounded to 12 and DECIMAL-summed
    // over the lag window (order-independent), n(n+2) blow-up per row.
    "q331_ljung_box" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) AS i,
        |    COALESCE(c.x, 0) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |tot AS (
        |  SELECT CAST(SUM(x) AS DOUBLE) AS s0,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS d
        |  FROM series),
        |lags AS (SELECT UNNEST(range(1, 8)) AS l),
        |p AS (
        |  SELECT l.l, s1.x AS x, s2.x AS x2
        |  FROM series s1 CROSS JOIN lags l
        |  JOIN series s2 ON s2.i = s1.i + l.l),
        |a AS (
        |  SELECT l, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CAST(x AS HUGEINT) * x2) AS DOUBLE) AS nl,
        |    CAST(SUM(x) AS DOUBLE) AS al,
        |    CAST(SUM(x2) AS DOUBLE) AS bl
        |  FROM p GROUP BY l),
        |acf AS (
        |  SELECT CAST(l AS BIGINT) AS lag, n_pairs,
        |    ROUND((nl - (s0 / CAST(d AS DOUBLE)) * (al + bl) +
        |      CAST(n_pairs AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |        (s0 / CAST(d AS DOUBLE))) /
        |      (s2 - CAST(d AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |        (s0 / CAST(d AS DOUBLE))), 6) AS acf
        |  FROM a CROSS JOIN tot),
        |t2 AS (
        |  SELECT lag, acf,
        |    CAST(n_pairs + lag AS DOUBLE) AS nd,
        |    CAST(SUM(CAST(ROUND(acf * acf /
        |        (CAST(n_pairs + lag AS DOUBLE) - CAST(lag AS DOUBLE)),
        |        12) AS DECIMAL(38,12))) OVER (ORDER BY lag
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS cum
        |  FROM acf)
        |SELECT lag, acf, ROUND(nd * (nd + 2.0) * cum, 6) AS q_lb
        |FROM t2 ORDER BY lag""".stripMargin,

    // q332: Durbin–Watson replayed — exact integer OLS moments on the
    // spine, identical b/a double shapes, per-row residual terms
    // rounded to 8 and DECIMAL-summed.
    "q332_durbin_watson" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) AS i,
        |    COALESCE(c.x, 0) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(i) AS DOUBLE) AS si,
        |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS sii,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS six
        |  FROM series),
        |fit AS (
        |  SELECT n,
        |    (CAST(n AS DOUBLE) * six - si * sx) /
        |      (CAST(n AS DOUBLE) * sii - si * si) AS bb, sx, si
        |  FROM m),
        |fit2 AS (
        |  SELECT n, bb, (sx - bb * si) / CAST(n AS DOUBLE) AS aa
        |  FROM fit),
        |resid AS (
        |  SELECT f.n, f.aa, f.bb, s.i,
        |    CAST(s.x AS DOUBLE) - (f.aa + f.bb * CAST(s.i AS DOUBLE))
        |      AS e
        |  FROM series s CROSS JOIN fit2 f),
        |terms AS (
        |  SELECT n, aa, bb,
        |    CAST(ROUND(e * e, 8) AS DECIMAL(38,8)) AS e2,
        |    CASE WHEN LAG(e) OVER (ORDER BY i) IS NOT NULL
        |      THEN CAST(ROUND((e - LAG(e) OVER (ORDER BY i)) *
        |        (e - LAG(e) OVER (ORDER BY i)), 8) AS DECIMAL(38,8))
        |    END AS d2
        |  FROM resid),
        |agg AS (
        |  SELECT n, aa, bb,
        |    CAST(SUM(e2) AS DOUBLE) AS sse,
        |    CAST(SUM(d2) AS DOUBLE) AS ssd
        |  FROM terms GROUP BY n, aa, bb)
        |SELECT n AS n_days, ROUND(bb, 6) AS slope,
        |  ROUND(aa, 6) AS intercept, ROUND(ssd / sse, 6) AS dw
        |FROM agg""".stripMargin,

    // q333: runs test replayed — explicit two-middle-rank median,
    // strict above/below signs (median days drop), LAG sign changes,
    // exact-integer null moments in identical double shapes.
    "q333_runs_test" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) AS i,
        |    COALESCE(c.x, 0) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM series),
        |ranked AS (
        |  SELECT i, x,
        |    CAST(ROW_NUMBER() OVER (ORDER BY x, i) AS BIGINT) AS r
        |  FROM series),
        |med AS (
        |  SELECT CAST(SUM(r2.x) AS DOUBLE) / COUNT(*) AS med
        |  FROM ranked r2, nn
        |  WHERE r2.r = CAST(FLOOR((nn.n + 1) / 2.0) AS BIGINT)
        |     OR r2.r = CAST(FLOOR(nn.n / 2.0) AS BIGINT) + 1),
        |signed AS (
        |  SELECT s.i,
        |    CASE WHEN CAST(s.x AS DOUBLE) > med.med THEN 1 ELSE 0 END
        |      AS sg
        |  FROM series s CROSS JOIN med
        |  WHERE CAST(s.x AS DOUBLE) <> med.med),
        |lagged AS (
        |  SELECT sg, LAG(sg) OVER (ORDER BY i) AS pg FROM signed),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nn2,
        |    CAST(SUM(sg) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN pg IS NOT NULL AND pg <> sg
        |      THEN 1 ELSE 0 END) AS BIGINT) + 1 AS runs
        |  FROM lagged),
        |f AS (
        |  SELECT nn2, n1, runs,
        |    CAST(nn2 AS DOUBLE) AS nd, CAST(n1 AS DOUBLE) AS n1d,
        |    CAST(nn2 AS DOUBLE) - CAST(n1 AS DOUBLE) AS n2d
        |  FROM agg),
        |f2 AS (
        |  SELECT nn2, n1, runs,
        |    1.0 + 2.0 * n1d * n2d / nd AS er,
        |    2.0 * n1d * n2d * (2.0 * n1d * n2d - nd) /
        |      (nd * nd * (nd - 1.0)) AS vr
        |  FROM f)
        |SELECT nn2 AS n_days_used, n1 AS n_above,
        |  nn2 - n1 AS n_below, runs,
        |  ROUND(er, 6) AS e_runs, ROUND(vr, 6) AS var_runs,
        |  CASE WHEN vr > 0.0
        |    THEN ROUND((CAST(runs AS DOUBLE) - er) / SQRT(vr), 6)
        |  END AS z
        |FROM f2""".stripMargin,

    // q334: Jarque–Bera replayed — the same four exact DECIMAL raw
    // moments, central moments / S / K / JB in the identical double
    // parenthesization (sqrt, not pow).
    "q334_jarque_bera" ->
      """WITH d AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(v * v AS DECIMAL(38,4))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(v * v * v AS DECIMAL(38,6))) AS DOUBLE) AS s3,
        |    CAST(SUM(CAST(v * v * v * v AS DECIMAL(38,8))) AS DOUBLE)
        |      AS s4
        |  FROM d),
        |c AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd,
        |    s1 / CAST(n AS DOUBLE) AS mu, s2, s3, s4
        |  FROM m),
        |c2 AS (
        |  SELECT n, nd, mu,
        |    s2 / nd - mu * mu AS m2,
        |    s3 / nd - 3.0 * mu * (s2 / nd) + 2.0 * mu * mu * mu AS m3,
        |    s4 / nd - 4.0 * mu * (s3 / nd) + 6.0 * mu * mu * (s2 / nd)
        |      - 3.0 * mu * mu * mu * mu AS m4
        |  FROM c),
        |c3 AS (
        |  SELECT n, nd, mu,
        |    m3 / (m2 * SQRT(m2)) AS sk,
        |    m4 / (m2 * m2) AS ku
        |  FROM c2)
        |SELECT n, ROUND(mu, 6) AS mean, ROUND(sk, 6) AS skewness,
        |  ROUND(ku - 3.0, 6) AS ex_kurtosis,
        |  ROUND(nd / 6.0 * (sk * sk + (ku - 3.0) * (ku - 3.0) / 4.0), 6)
        |    AS jb
        |FROM c3""".stripMargin,

    // q335: Bartlett replayed — exact decimal group moments, round-9
    // variances into LN (identical double inputs), per-term rounding +
    // DECIMAL sums across groups, the same T assembly.
    "q335_bartlett" ->
      """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    CAST(SUM(CAST(v AS DECIMAL(28,2))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v * v AS DECIMAL(38,4))) AS DOUBLE) AS q
        |  FROM d GROUP BY g HAVING COUNT(*) > 1),
        |wv AS (
        |  SELECT n_g, CAST(n_g AS DOUBLE) AS ngd,
        |    ROUND((q - s * s / CAST(n_g AS DOUBLE)) /
        |      (CAST(n_g AS DOUBLE) - 1.0), 9) AS v
        |  FROM grp),
        |wf AS (SELECT * FROM wv WHERE v > 0.0),
        |agg AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS k,
        |    CAST(SUM(CAST(ROUND((ngd - 1.0) * v, 6)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS ssw,
        |    CAST(SUM(CAST(ROUND((ngd - 1.0) * LN(v), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) AS slnv,
        |    CAST(SUM(CAST(ROUND(1.0 / (ngd - 1.0), 12)
        |      AS DECIMAL(38,12))) AS DOUBLE) AS sinv
        |  FROM wf),
        |f AS (
        |  SELECT n, k, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
        |    ssw, slnv, sinv
        |  FROM agg WHERE k > 1 AND n > k),
        |f2 AS (
        |  SELECT n, k, nd, kd, slnv, sinv,
        |    ROUND(ssw / (nd - kd), 9) AS sp2
        |  FROM f)
        |SELECT n, k, ROUND(sp2, 6) AS pooled_var,
        |  ROUND(((nd - kd) * LN(sp2) - slnv) /
        |    (1.0 + (sinv - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0))), 6)
        |    AS t_stat,
        |  k - 1 AS df
        |FROM f2""".stripMargin,

    // q336: McNemar replayed — per-customer bool-OR collapse, exact
    // 2×2 cells, discordant χ² with and without the Edwards
    // continuity correction.
    "q336_mcnemar" ->
      """WITH perkey AS (
        |  SELECT o_custkey,
        |    MAX(CASE WHEN o_orderpriority = '1-URGENT'
        |      THEN 1 ELSE 0 END) AS a,
        |    MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS b
        |  FROM orders WHERE o_custkey IS NOT NULL
        |  GROUP BY o_custkey),
        |cells AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
        |    CAST(SUM(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n11,
        |    CAST(SUM(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n10,
        |    CAST(SUM(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n01,
        |    CAST(SUM(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n00
        |  FROM perkey),
        |f AS (
        |  SELECT *, CAST(n10 AS DOUBLE) AS bd, CAST(n01 AS DOUBLE) AS cd,
        |    CAST(n10 AS DOUBLE) + CAST(n01 AS DOUBLE) AS disc
        |  FROM cells)
        |SELECT n_keys, n11, n10, n01, n00,
        |  CASE WHEN disc > 0.0
        |    THEN ROUND((bd - cd) * (bd - cd) / disc, 6) END AS chi2,
        |  CASE WHEN disc > 0.0
        |    THEN ROUND((ABS(bd - cd) - 1.0) * (ABS(bd - cd) - 1.0) /
        |      disc, 6) END AS chi2_cc
        |FROM f""".stripMargin,
    // q337: the 2×2 cells are exact BIGINTs; every score reassembles in
    // the identical double parenthesization (left-assoc products under
    // one IEEE sqrt).
    "q337_mcc_card" ->
      """WITH t AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |         CASE WHEN (o_orderkey % 7) < 3 THEN 1 ELSE 0 END AS pred
        |  FROM orders),
        |cells AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN label = 1 AND pred = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN label = 0 AND pred = 1 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN label = 1 AND pred = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN label = 0 AND pred = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM t),
        |d AS (
        |  SELECT tp, fp, fn, tn,
        |    CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
        |    CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd
        |  FROM cells),
        |s AS (
        |  SELECT tp, fp, fn, tn, tpd, fpd, fnd, tnd,
        |    tpd / (tpd + fpd) AS ppv, tpd / (tpd + fnd) AS tpr,
        |    tnd / (tnd + fpd) AS tnr, tnd / (tnd + fnd) AS npv,
        |    SQRT((tpd + fpd) * (tpd + fnd) * (tnd + fpd) * (tnd + fnd))
        |      AS mden
        |  FROM d)
        |SELECT tp, fp, fn, tn,
        |  CASE WHEN mden > 0.0
        |    THEN ROUND((tpd * tnd - fpd * fnd) / mden, 6) END AS mcc,
        |  CASE WHEN tpd + fpd > 0.0 AND tpd + fnd > 0.0
        |    THEN ROUND(SQRT(ppv * tpr), 6) END AS fowlkes_mallows,
        |  CASE WHEN tpd + fnd > 0.0 AND tnd + fpd > 0.0
        |    THEN ROUND(tpr + tnr - 1.0, 6) END AS youden_j,
        |  CASE WHEN tpd + fpd > 0.0 AND tnd + fnd > 0.0
        |    THEN ROUND(ppv + npv - 1.0, 6) END AS markedness
        |FROM s""".stripMargin,

    // q338: Mood's median replayed — the same two-middle-order-stat
    // median off the distinct-value cumulative frame, at-median drops,
    // per-group cells exact, χ² terms rounded + decimal-summed.
    "q338_moods_median" ->
      """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |byv AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM d GROUP BY v),
        |cum AS (
        |  SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM byv),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
        |med AS (
        |  SELECT (MAX(CASE WHEN cum >= (n + 1) // 2
        |      AND cum - c < (n + 1) // 2 THEN v END) +
        |    MAX(CASE WHEN cum >= n // 2 + 1
        |      AND cum - c < n // 2 + 1 THEN v END)) / 2.0 AS med
        |  FROM cum, nn),
        |cells AS (
        |  SELECT g,
        |    CAST(SUM(CASE WHEN v > med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_above,
        |    CAST(SUM(CASE WHEN v < med THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_below,
        |    MAX(med) AS med
        |  FROM d, med WHERE v <> med GROUP BY g),
        |tot AS (
        |  SELECT CAST(SUM(n_above) AS BIGINT) AS ta,
        |    CAST(SUM(n_below) AS BIGINT) AS tb,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM cells),
        |terms AS (
        |  SELECT g, n_above, n_below, med, k,
        |    ROUND(CAST(n_above + n_below AS DOUBLE) * CAST(ta AS DOUBLE) /
        |      (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE)), 6) AS e_above,
        |    ROUND(
        |      (CAST(n_above AS DOUBLE) -
        |        CAST(n_above + n_below AS DOUBLE) * CAST(ta AS DOUBLE) /
        |          (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))) *
        |      (CAST(n_above AS DOUBLE) -
        |        CAST(n_above + n_below AS DOUBLE) * CAST(ta AS DOUBLE) /
        |          (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))) /
        |      (CAST(n_above + n_below AS DOUBLE) * CAST(ta AS DOUBLE) /
        |        (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))) +
        |      (CAST(n_below AS DOUBLE) -
        |        CAST(n_above + n_below AS DOUBLE) * CAST(tb AS DOUBLE) /
        |          (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))) *
        |      (CAST(n_below AS DOUBLE) -
        |        CAST(n_above + n_below AS DOUBLE) * CAST(tb AS DOUBLE) /
        |          (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))) /
        |      (CAST(n_above + n_below AS DOUBLE) * CAST(tb AS DOUBLE) /
        |        (CAST(ta AS DOUBLE) + CAST(tb AS DOUBLE))), 9) AS term
        |  FROM cells, tot),
        |chi AS (
        |  SELECT CAST(SUM(CAST(term AS DECIMAL(38,9))) AS DOUBLE) AS chi2
        |  FROM terms)
        |SELECT g, n_above, n_below, e_above,
        |  ROUND(med, 6) AS pooled_median,
        |  ROUND(chi2, 6) AS chi2, k - 1 AS df
        |FROM terms, chi ORDER BY g""".stripMargin,

    // q339: SCD2 replayed — identical run detection (IS DISTINCT FROM =
    // Spark's null-safe <=>), identical (ts, event_id) total order.
    "q339_scd2_history" ->
      """WITH base AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    LAG(event_type) OVER w AS prev,
        |    ROW_NUMBER() OVER w AS rn
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |runs AS (
        |  SELECT user_id, ts, event_id, event_type FROM base
        |  WHERE rn = 1 OR prev IS DISTINCT FROM event_type),
        |hist AS (
        |  SELECT user_id, event_type, ts AS valid_from,
        |    LEAD(ts) OVER w2 AS valid_to,
        |    CAST(ROW_NUMBER() OVER w2 AS BIGINT) AS version
        |  FROM runs
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_type, valid_from, valid_to,
        |  valid_to IS NULL AS is_current, version
        |FROM hist ORDER BY user_id, version""".stripMargin,
    // q340: KPSS replayed — exact cumulative counts into S_t, the ACF
    // pair moments into Bartlett-weighted autocovariances, identical
    // double parenthesization throughout.
    "q340_kpss" ->
      (s"""WITH $dailySeriesCtes,
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
        |      AS DOUBLE) AS sxx
        |  FROM series),
        |cum AS (
        |  SELECT i, x, SUM(x) OVER (ORDER BY i) AS cum FROM series),
        |ssq AS (
        |  SELECT CAST(SUM(CAST(ROUND(
        |    (CAST(cum AS DOUBLE) - CAST(i + 1 AS DOUBLE) *
        |      (sx / CAST(n AS DOUBLE))) *
        |    (CAST(cum AS DOUBLE) - CAST(i + 1 AS DOUBLE) *
        |      (sx / CAST(n AS DOUBLE))), 6) AS DECIMAL(38,6)))
        |    AS DOUBLE) AS ss
        |  FROM cum, tot),
        |lagf AS (SELECT UNNEST(generate_series(1, 4)) AS l),
        |pairs AS (
        |  SELECT s.x AS x, s2.x AS x2, l.l
        |  FROM series s CROSS JOIN lagf l
        |  JOIN series s2 ON s2.i = s.i + l.l),
        |perlag AS (
        |  SELECT l, CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x2 AS DECIMAL(38,0)))
        |      AS DOUBLE) AS nl,
        |    CAST(SUM(x) AS DOUBLE) AS al, CAST(SUM(x2) AS DOUBLE) AS bl
        |  FROM pairs GROUP BY l),
        |lagsum AS (
        |  SELECT COALESCE(CAST(SUM(CAST(ROUND(
        |    (1.0 - CAST(l AS DOUBLE) / 5.0) *
        |    ((nl - sx / CAST(n AS DOUBLE) * (al + bl) +
        |      CAST(np AS DOUBLE) * (sx / CAST(n AS DOUBLE)) *
        |        (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE)), 9)
        |    AS DECIMAL(38,9))) AS DOUBLE), 0.0) AS wl
        |  FROM perlag, tot)
        |SELECT n AS n_days,
        |  ROUND(sx / CAST(n AS DOUBLE), 6) AS mean,
        |  ROUND((sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE)) *
        |    (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE), 6) AS gamma0,
        |  ROUND((sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE)) *
        |    (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) +
        |    2.0 * wl, 6) AS lrv,
        |  ROUND(ss / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) /
        |    ((sxx - CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE)) *
        |      (sx / CAST(n AS DOUBLE))) / CAST(n AS DOUBLE) +
        |      2.0 * wl), 6) AS eta
        |FROM tot, ssq, lagsum""").stripMargin,
  )
}
