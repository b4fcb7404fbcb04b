package graft

/** Oracle SQL map, part 4 of the file split (q341_variance_ratio…q407_cart_tree). */
private[graft] trait OracleSqlPart4 extends OracleSqlPart3 {

  protected def sqlPart4: Map[String, String] = Map(

    // q341: variance ratio replayed — overlapping q-sums as exact
    // cumulative-count differences (same integers as Spark's window
    // sums), the simple consistent estimator in identical shape.
    "q341_variance_ratio" ->
      (s"""WITH $dailySeriesCtes,
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
        |      AS DOUBLE) AS sxx
        |  FROM series),
        |cum AS (
        |  SELECT i, x, SUM(x) OVER (ORDER BY i) AS c FROM series),
        |qs AS (SELECT CAST(UNNEST([2, 4, 8]) AS BIGINT) AS q),
        |wins AS (
        |  SELECT q.q, CAST(a.c - COALESCE(bb.c, 0) AS BIGINT) AS m
        |  FROM cum a CROSS JOIN qs q
        |  LEFT JOIN cum bb ON bb.i = a.i - q.q
        |  WHERE a.i >= q.q - 1),
        |perq AS (
        |  SELECT q, CAST(COUNT(*) AS BIGINT) AS n_windows,
        |    CAST(SUM(m) AS DOUBLE) AS sm,
        |    CAST(SUM(CAST(m AS DECIMAL(38,0)) * CAST(m AS DECIMAL(38,0)))
        |      AS DOUBLE) AS smm
        |  FROM wins GROUP BY q)
        |SELECT q, n_windows,
        |  ROUND(sxx / CAST(n AS DOUBLE) -
        |    sx / CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE)), 6)
        |    AS var_1,
        |  ROUND(smm / CAST(n_windows AS DOUBLE) -
        |    sm / CAST(n_windows AS DOUBLE) *
        |      (sm / CAST(n_windows AS DOUBLE)), 6) AS var_q,
        |  ROUND((smm / CAST(n_windows AS DOUBLE) -
        |    sm / CAST(n_windows AS DOUBLE) *
        |      (sm / CAST(n_windows AS DOUBLE))) /
        |    (CAST(q AS DOUBLE) *
        |      (sxx / CAST(n AS DOUBLE) -
        |        sx / CAST(n AS DOUBLE) * (sx / CAST(n AS DOUBLE)))), 6)
        |    AS vr
        |FROM perq, tot ORDER BY q""").stripMargin,

    // q342: Page–Hinkley replayed — running mean from exact cumulative
    // counts, round-9 increments into an exact decimal running sum and
    // running minimum; identical walk on any engine.
    "q342_page_hinkley" -> pageHinkleySql,
    "q365_stream_page_hinkley" -> pageHinkleySql,
    // q343: ADF replayed — exact integer lag/diff moments, Cramer 3×3
    // in the identical det3 expansion, SSR via y'y − b'X'y, one sqrt.
    "q343_adf" ->
      (s"""WITH $dailySeriesCtes,
        |l1 AS (
        |  SELECT i, x, LAG(x) OVER (ORDER BY i) AS xl FROM series),
        |l2 AS (
        |  SELECT i, x, xl, x - xl AS dx,
        |    LAG(x - xl) OVER (ORDER BY i) AS dxl
        |  FROM l1),
        |f AS (SELECT * FROM l2 WHERE dxl IS NOT NULL),
        |mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(xl) AS DOUBLE) AS s1,
        |    CAST(SUM(dxl) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(xl AS DECIMAL(38,0)) * CAST(xl AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s11,
        |    CAST(SUM(CAST(xl AS DECIMAL(38,0)) *
        |      CAST(dxl AS DECIMAL(38,0))) AS DOUBLE) AS s12,
        |    CAST(SUM(CAST(dxl AS DECIMAL(38,0)) *
        |      CAST(dxl AS DECIMAL(38,0))) AS DOUBLE) AS s22,
        |    CAST(SUM(dx) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(xl AS DECIMAL(38,0)) * CAST(dx AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s1y,
        |    CAST(SUM(CAST(dxl AS DECIMAL(38,0)) *
        |      CAST(dx AS DECIMAL(38,0))) AS DOUBLE) AS s2y,
        |    CAST(SUM(CAST(dx AS DECIMAL(38,0)) * CAST(dx AS DECIMAL(38,0)))
        |      AS DOUBLE) AS syy
        |  FROM f),
        |dets AS (
        |  SELECT m, CAST(m AS DOUBLE) AS md, s1, s2, s11, s12, s22,
        |    sy, s1y, s2y, syy,
        |    CAST(m AS DOUBLE) * (s11 * s22 - s12 * s12) -
        |      s1 * (s1 * s22 - s12 * s2) +
        |      s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) -
        |      s1 * (s1y * s22 - s12 * s2y) +
        |      s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    CAST(m AS DOUBLE) * (s1y * s22 - s12 * s2y) -
        |      sy * (s1 * s22 - s12 * s2) +
        |      s2 * (s1 * s2y - s1y * s2) AS det1,
        |    CAST(m AS DOUBLE) * (s11 * s2y - s1y * s12) -
        |      s1 * (s1 * s2y - s1y * s2) +
        |      sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM mom),
        |bs AS (
        |  SELECT m, md, s2, s22, sy, s1y, s2y, syy, det,
        |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
        |  FROM dets),
        |fin AS (
        |  SELECT m, md, s2, s22, det, b0, b1, b2,
        |    syy - (b0 * sy + b1 * s1y + b2 * s2y) AS ssr
        |  FROM bs)
        |SELECT m AS n_obs, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS gamma,
        |  ROUND(b2, 6) AS phi, ROUND(ssr, 6) AS ssr,
        |  ROUND(b1 / SQRT(ssr / (md - 3.0) *
        |    ((md * s22 - s2 * s2) / det)), 6) AS t_gamma
        |FROM fin""").stripMargin,

    // q344: Granger replayed — the shared click/purchase spine, the
    // same det3 Cramer solve for the unrestricted fit, closed-form
    // restricted fit, F in the identical shape.
    "q344_granger" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day, event_type AS ty
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |counts AS (
        |  SELECT day,
        |    CAST(SUM(CASE WHEN ty = 'click' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS xc,
        |    CAST(SUM(CASE WHEN ty = 'purchase' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS ye
        |  FROM d GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d2.day) AS BIGINT) AS i,
        |    COALESCE(c.xc, 0) AS xc, COALESCE(c.ye, 0) AS ye
        |  FROM days d2 CROSS JOIN b LEFT JOIN counts c ON d2.day = c.day),
        |l1 AS (
        |  SELECT i, xc, ye, LAG(ye) OVER (ORDER BY i) AS yl,
        |    LAG(xc) OVER (ORDER BY i) AS xl
        |  FROM series),
        |f AS (SELECT * FROM l1 WHERE yl IS NOT NULL),
        |mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(yl) AS DOUBLE) AS s1,
        |    CAST(SUM(xl) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(yl AS DECIMAL(38,0)) * CAST(yl AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s11,
        |    CAST(SUM(CAST(yl AS DECIMAL(38,0)) * CAST(xl AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s12,
        |    CAST(SUM(CAST(xl AS DECIMAL(38,0)) * CAST(xl AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s22,
        |    CAST(SUM(ye) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(yl AS DECIMAL(38,0)) * CAST(ye AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s1y,
        |    CAST(SUM(CAST(xl AS DECIMAL(38,0)) * CAST(ye AS DECIMAL(38,0)))
        |      AS DOUBLE) AS s2y,
        |    CAST(SUM(CAST(ye AS DECIMAL(38,0)) * CAST(ye AS DECIMAL(38,0)))
        |      AS DOUBLE) AS syy
        |  FROM f),
        |dets AS (
        |  SELECT m, CAST(m AS DOUBLE) AS md, s1, s2, s11, s12, s22,
        |    sy, s1y, s2y, syy,
        |    CAST(m AS DOUBLE) * (s11 * s22 - s12 * s12) -
        |      s1 * (s1 * s22 - s12 * s2) +
        |      s2 * (s1 * s12 - s11 * s2) AS det,
        |    sy * (s11 * s22 - s12 * s12) -
        |      s1 * (s1y * s22 - s12 * s2y) +
        |      s2 * (s1y * s12 - s11 * s2y) AS det0,
        |    CAST(m AS DOUBLE) * (s1y * s22 - s12 * s2y) -
        |      sy * (s1 * s22 - s12 * s2) +
        |      s2 * (s1 * s2y - s1y * s2) AS det1,
        |    CAST(m AS DOUBLE) * (s11 * s2y - s1y * s12) -
        |      s1 * (s1 * s2y - s1y * s2) +
        |      sy * (s1 * s12 - s11 * s2) AS det2
        |  FROM mom),
        |bs AS (
        |  SELECT m, md, s1, s11, sy, s1y, s2y, syy,
        |    det0 / det AS b0, det1 / det AS b1, det2 / det AS b2
        |  FROM dets),
        |rr AS (
        |  SELECT m, md, sy, s1y, s2y, syy, b0, b1, b2,
        |    (md * s1y - s1 * sy) / (md * s11 - s1 * s1) AS a1,
        |    s1
        |  FROM bs),
        |fin AS (
        |  SELECT m, md, b1, b2,
        |    syy - (b0 * sy + b1 * s1y + b2 * s2y) AS ssr_u,
        |    syy - (((sy - a1 * s1) / md) * sy + a1 * s1y) AS ssr_r
        |  FROM rr)
        |SELECT m AS n_obs, ROUND(b1, 6) AS b_ylag,
        |  ROUND(b2, 6) AS b_xlag, ROUND(ssr_r, 6) AS ssr_r,
        |  ROUND(ssr_u, 6) AS ssr_u,
        |  ROUND((ssr_r - ssr_u) / (ssr_u / (md - 3.0)), 6) + 0.0
        |    AS f_stat
        |FROM fin""".stripMargin,

    // q345: Cochrane–Orcutt replayed — the q332 OLS/residual prelude,
    // ρ from round-8 decimal lag products, quasi-differenced stage-2
    // moments through the same round-8 decimal sums.
    "q345_cochrane_orcutt" ->
      (s"""WITH $dailySeriesCtes,
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
        |  SELECT f.n, f.aa, f.bb, s.i, s.x,
        |    CAST(s.x AS DOUBLE) - (f.aa + f.bb * CAST(s.i AS DOUBLE))
        |      AS e
        |  FROM series s CROSS JOIN fit2 f),
        |lagd AS (
        |  SELECT n, bb, i, x, e,
        |    LAG(e) OVER (ORDER BY i) AS ep,
        |    LAG(x) OVER (ORDER BY i) AS xp
        |  FROM resid),
        |rho AS (
        |  SELECT
        |    CAST(SUM(CAST(ROUND(e * ep, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) /
        |    CAST(SUM(CAST(ROUND(ep * ep, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS rho
        |  FROM lagd WHERE ep IS NOT NULL),
        |star AS (
        |  SELECT n, bb, rho,
        |    CAST(i AS DOUBLE) - rho * CAST(i - 1 AS DOUBLE) AS xs,
        |    CAST(x AS DOUBLE) - rho * CAST(xp AS DOUBLE) AS ys
        |  FROM lagd, rho WHERE xp IS NOT NULL),
        |agg2 AS (
        |  SELECT n, bb, rho, CAST(COUNT(*) AS BIGINT) AS m2,
        |    CAST(SUM(CAST(ROUND(xs, 8) AS DECIMAL(38,8))) AS DOUBLE)
        |      AS t1,
        |    CAST(SUM(CAST(ROUND(xs * xs, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS t11,
        |    CAST(SUM(CAST(ROUND(ys, 8) AS DECIMAL(38,8))) AS DOUBLE)
        |      AS ty,
        |    CAST(SUM(CAST(ROUND(xs * ys, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS t1y
        |  FROM star GROUP BY n, bb, rho),
        |fin AS (
        |  SELECT n, bb, rho, t1, ty, CAST(m2 AS DOUBLE) AS md,
        |    (CAST(m2 AS DOUBLE) * t1y - t1 * ty) /
        |      (CAST(m2 AS DOUBLE) * t11 - t1 * t1) AS b2
        |  FROM agg2)
        |SELECT n AS n_days, ROUND(bb, 6) AS slope_ols,
        |  ROUND(rho, 6) AS rho, ROUND(b2, 6) AS slope_co,
        |  ROUND((ty - b2 * t1) / md, 6) AS intercept_co
        |FROM fin""").stripMargin,
    // q346: Chow replayed — exact integer segment moments via the
    // i*2 < n midpoint flag, the same SSE = Syy_c − b²·Sii_c shape per
    // fit, F assembled identically (+0.0 folds any −0.0).
    "q346_chow" ->
      (s"""WITH $dailySeriesCtes,
        |n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n0 FROM series),
        |segd AS (
        |  SELECT CASE WHEN i * 2 < n0 THEN 1 ELSE 0 END AS seg, i, x
        |  FROM series, n0),
        |moms AS (
        |  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(i) AS DOUBLE) AS si,
        |    CAST(SUM(CAST(i AS DECIMAL(38,0)) * CAST(i AS DECIMAL(38,0)))
        |      AS DOUBLE) AS sii,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(i AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
        |      AS DOUBLE) AS six
        |  FROM segd GROUP BY seg),
        |h AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n, SUM(si) AS si,
        |    SUM(sii) AS sii, SUM(sx) AS sx, SUM(sxx) AS sxx,
        |    SUM(six) AS six,
        |    MAX(CASE WHEN seg = 1 THEN n END) AS nl,
        |    MAX(CASE WHEN seg = 1 THEN si END) AS sil,
        |    MAX(CASE WHEN seg = 1 THEN sii END) AS siil,
        |    MAX(CASE WHEN seg = 1 THEN sx END) AS sxl,
        |    MAX(CASE WHEN seg = 1 THEN sxx END) AS sxxl,
        |    MAX(CASE WHEN seg = 1 THEN six END) AS sixl,
        |    MAX(CASE WHEN seg = 0 THEN n END) AS nr,
        |    MAX(CASE WHEN seg = 0 THEN si END) AS sir,
        |    MAX(CASE WHEN seg = 0 THEN sii END) AS siir,
        |    MAX(CASE WHEN seg = 0 THEN sx END) AS sxr,
        |    MAX(CASE WHEN seg = 0 THEN sxx END) AS sxxr,
        |    MAX(CASE WHEN seg = 0 THEN six END) AS sixr
        |  FROM moms),
        |d2 AS (
        |  SELECT *, CAST(n AS DOUBLE) AS nd, CAST(nl AS DOUBLE) AS nld,
        |    CAST(nr AS DOUBLE) AS nrd
        |  FROM h),
        |d3 AS (
        |  SELECT *, sii - si * si / nd AS denp,
        |    siil - sil * sil / nld AS denl,
        |    siir - sir * sir / nrd AS denr
        |  FROM d2),
        |d4 AS (
        |  SELECT *, (six - si * sx / nd) / denp AS slp,
        |    (sixl - sil * sxl / nld) / denl AS sll,
        |    (sixr - sir * sxr / nrd) / denr AS slr
        |  FROM d3),
        |d5 AS (
        |  SELECT *, (sxx - sx * sx / nd) - slp * slp * denp AS ssep,
        |    (sxxl - sxl * sxl / nld) - sll * sll * denl AS ssel,
        |    (sxxr - sxr * sxr / nrd) - slr * slr * denr AS sser
        |  FROM d4)
        |SELECT n AS n_days, CAST(nl AS BIGINT) AS break_i,
        |  ROUND(ssep, 6) AS ssr_pooled, ROUND(ssel, 6) AS ssr_left,
        |  ROUND(sser, 6) AS ssr_right,
        |  ROUND(((ssep - ssel - sser) / 2.0) /
        |    ((ssel + sser) / (nd - 4.0)), 6) + 0.0 AS f_stat
        |FROM d5""").stripMargin,

    // q347: Breusch–Pagan replayed — the q332 OLS/residual prelude with
    // si/sii carried through, round-8 decimal e²/i·e²/e⁴ sums, LM in
    // the identical shape.
    "q347_breusch_pagan" ->
      (s"""WITH $dailySeriesCtes,
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(i) AS DOUBLE) AS si,
        |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS sii,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS six
        |  FROM series),
        |fit AS (
        |  SELECT n, si, sii,
        |    (CAST(n AS DOUBLE) * six - si * sx) /
        |      (CAST(n AS DOUBLE) * sii - si * si) AS bb, sx
        |  FROM m),
        |fit2 AS (
        |  SELECT n, si, sii, bb,
        |    (sx - bb * si) / CAST(n AS DOUBLE) AS aa
        |  FROM fit),
        |resid AS (
        |  SELECT f.n, f.si, f.sii, s.i,
        |    CAST(s.x AS DOUBLE) - (f.aa + f.bb * CAST(s.i AS DOUBLE))
        |      AS e
        |  FROM series s CROSS JOIN fit2 f),
        |aux AS (
        |  SELECT n, si, sii,
        |    CAST(ROUND(e * e, 8) AS DECIMAL(38,8)) AS e2,
        |    CAST(ROUND(CAST(i AS DOUBLE) * (e * e), 8)
        |      AS DECIMAL(38,8)) AS ie2,
        |    CAST(ROUND((e * e) * (e * e), 8) AS DECIMAL(38,8)) AS e4
        |  FROM resid),
        |agg AS (
        |  SELECT n, si, sii, CAST(SUM(e2) AS DOUBLE) AS sg,
        |    CAST(SUM(ie2) AS DOUBLE) AS sig,
        |    CAST(SUM(e4) AS DOUBLE) AS sgg
        |  FROM aux GROUP BY n, si, sii),
        |fin AS (
        |  SELECT n, CAST(n AS DOUBLE) AS nd,
        |    sig - si * sg / CAST(n AS DOUBLE) AS sxy,
        |    sii - si * si / CAST(n AS DOUBLE) AS sxx,
        |    sgg - sg * sg / CAST(n AS DOUBLE) AS syy
        |  FROM agg)
        |SELECT n AS n_days,
        |  ROUND(sxy * sxy / (sxx * syy), 6) AS r2_aux,
        |  ROUND(nd * (sxy * sxy / (sxx * syy)), 6) AS lm_stat
        |FROM fin""").stripMargin,

    // q348: classical decomposition replayed — exact 7-sum MA trend,
    // round-8 decimal detrended sums, centered indices, variance
    // share; +0.0 folds any −0.0 the near-zero indices could round to.
    "q348_seasonal_decomposition" -> seasonalDecompositionSql,
    "q375_stream_seasonal" -> seasonalDecompositionSql,
    // q349: Kuiper replayed — the q297 grid, exact HUGEINT ECDF
    // cross-products, one double division per direction.
    "q349_kuiper" ->
      """WITH v AS (
        |  SELECT value AS v, event_type = 'click' AS isa
        |  FROM events
        |  WHERE event_type IN ('click','view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM v GROUP BY v),
        |c AS (
        |  SELECT v, ca, cb,
        |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM g),
        |m AS (
        |  SELECT na, nb,
        |    MAX(CAST(cum_a AS HUGEINT) * nb - CAST(cum_b AS HUGEINT) * na)
        |      AS mp,
        |    MAX(-(CAST(cum_a AS HUGEINT) * nb -
        |      CAST(cum_b AS HUGEINT) * na)) AS mn
        |  FROM c CROSS JOIN tot GROUP BY na, nb)
        |SELECT na AS n_a, nb AS n_b,
        |  ROUND(CAST(mp AS DOUBLE) /
        |    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS d_plus,
        |  ROUND(CAST(mn AS DOUBLE) /
        |    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS d_minus,
        |  ROUND((CAST(mp AS DOUBLE) + CAST(mn AS DOUBLE)) /
        |    (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS v_stat
        |FROM m""".stripMargin,

    // q350: Cramér–von Mises replayed — the same closed-form tie-group
    // deviation sums in HUGEINT, U·12 exact, T assembled identically
    // (+0.0 folds a near-zero −0.0).
    "q350_cramer_von_mises" ->
      """WITH v AS (
        |  SELECT value AS v, event_type = 'click' AS isa
        |  FROM events
        |  WHERE event_type IN ('click','view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM v GROUP BY v),
        |c AS (
        |  SELECT v, ca, cb,
        |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM g),
        |terms AS (
        |  SELECT
        |    3 * CAST(ca AS HUGEINT) *
        |      (2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1 -
        |        2 * (cum_a - ca)) *
        |      (2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1 -
        |        2 * (cum_a - ca)) -
        |    6 * CAST(2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1 -
        |        2 * (cum_a - ca) AS HUGEINT) * ca * (ca + 1) +
        |    2 * CAST(ca AS HUGEINT) * (ca + 1) * (2 * ca + 1) AS sa,
        |    3 * CAST(cb AS HUGEINT) *
        |      (2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1 -
        |        2 * (cum_b - cb)) *
        |      (2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1 -
        |        2 * (cum_b - cb)) -
        |    6 * CAST(2 * (cum_a + cum_b - ca - cb) + (ca + cb) + 1 -
        |        2 * (cum_b - cb) AS HUGEINT) * cb * (cb + 1) +
        |    2 * CAST(cb AS HUGEINT) * (cb + 1) * (2 * cb + 1) AS sb
        |  FROM c),
        |agg AS (
        |  SELECT CAST(SUM(sa) AS HUGEINT) AS ssa,
        |    CAST(SUM(sb) AS HUGEINT) AS ssb
        |  FROM terms),
        |f AS (
        |  SELECT na, nb, CAST(na AS DOUBLE) AS nad,
        |    CAST(nb AS DOUBLE) AS nbd,
        |    CAST(na * ssa + nb * ssb AS DOUBLE) / 12.0 AS u
        |  FROM agg, tot)
        |SELECT na AS n_a, nb AS n_b, ROUND(u, 6) AS u_stat,
        |  ROUND(u / (nad * nbd * (nad + nbd)) -
        |    (4.0 * nad * nbd - 1.0) / (6.0 * (nad + nbd)), 6) + 0.0
        |    AS t_stat
        |FROM f""".stripMargin,

    // q351: Anderson–Darling replayed — doubled midrank integers, the
    // identical per-term IEEE shape rounded to 6 into decimal sums.
    "q351_anderson_darling" ->
      """WITH v AS (
        |  SELECT value AS v, event_type = 'click' AS isa
        |  FROM events
        |  WHERE event_type IN ('click','view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM v GROUP BY v),
        |c AS (
        |  SELECT v, ca, cb,
        |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM g),
        |terms AS (
        |  SELECT na, nb,
        |    CAST(ca + cb AS DOUBLE) AS ld,
        |    CAST(na + nb AS DOUBLE) AS nd,
        |    CAST(2 * (cum_a + cum_b) - (ca + cb) AS DOUBLE) AS b2,
        |    CAST(2 * cum_a - ca AS DOUBLE) AS m2a,
        |    CAST(2 * cum_b - cb AS DOUBLE) AS m2b
        |  FROM c CROSS JOIN tot),
        |t2 AS (
        |  SELECT na, nb,
        |    CAST(ROUND(ld / nd *
        |      ((nd * m2a - CAST(na AS DOUBLE) * b2) *
        |       (nd * m2a - CAST(na AS DOUBLE) * b2)) /
        |      (2.0 * nd * b2 - b2 * b2 - nd * ld), 6)
        |      AS DECIMAL(38,6)) AS ta,
        |    CAST(ROUND(ld / nd *
        |      ((nd * m2b - CAST(nb AS DOUBLE) * b2) *
        |       (nd * m2b - CAST(nb AS DOUBLE) * b2)) /
        |      (2.0 * nd * b2 - b2 * b2 - nd * ld), 6)
        |      AS DECIMAL(38,6)) AS tb
        |  FROM terms),
        |agg AS (
        |  SELECT na, nb, CAST(COUNT(*) AS BIGINT) AS n_grid,
        |    CAST(SUM(ta) AS DOUBLE) AS ia, CAST(SUM(tb) AS DOUBLE) AS ib
        |  FROM t2 GROUP BY na, nb)
        |SELECT na AS n_a, nb AS n_b, n_grid,
        |  ROUND((CAST(na + nb AS DOUBLE) - 1.0) /
        |    CAST(na + nb AS DOUBLE) *
        |    (ia / CAST(na AS DOUBLE) + ib / CAST(nb AS DOUBLE)), 6)
        |    AS a2_stat
        |FROM agg""".stripMargin,
    // q352: link prediction replayed — the q139 cosine-edge prelude,
    // wedge join on the shared neighbor, NOT EXISTS anti-join, round-9
    // decimal Adamic–Adar terms, the same total (cn, id) order.
    "q352_link_prediction" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.2),
        |sym AS (
        |  SELECT src AS a, dst AS b FROM pairs
        |  UNION ALL SELECT dst, src FROM pairs),
        |deg AS (
        |  SELECT a AS z, CAST(COUNT(*) AS BIGINT) AS dz
        |  FROM sym GROUP BY a),
        |thr AS (
        |  SELECT s.a AS z, s.b AS u, d.dz
        |  FROM sym s JOIN deg d ON s.a = d.z),
        |cand AS (
        |  SELECT t1.u AS u, t2.u AS w, CAST(COUNT(*) AS BIGINT) AS cn,
        |    CAST(SUM(CAST(ROUND(1.0 / LN(CAST(t1.dz AS DOUBLE)), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) AS aa
        |  FROM thr t1 JOIN thr t2 ON t1.z = t2.z AND t1.u < t2.u
        |  GROUP BY t1.u, t2.u),
        |nonadj AS (
        |  SELECT c.* FROM cand c
        |  WHERE NOT EXISTS (SELECT 1 FROM pairs p
        |                    WHERE p.src = c.u AND p.dst = c.w)),
        |wd AS (
        |  SELECT n.u, n.w, n.cn, n.aa, d1.dz AS du, d2.dz AS dw
        |  FROM nonadj n JOIN deg d1 ON n.u = d1.z
        |  JOIN deg d2 ON n.w = d2.z)
        |SELECT u AS id_a, w AS id_b, cn AS common_neighbors,
        |  ROUND(CAST(cn AS DOUBLE) / CAST(du + dw - cn AS DOUBLE), 6)
        |    AS jaccard,
        |  ROUND(aa, 6) AS adamic_adar
        |FROM wd ORDER BY cn DESC, u, w LIMIT 20""".stripMargin,

    // q353: assortativity/transitivity replayed — exact HUGEINT stub
    // moments over the same prelude, identical double assembly.
    "q353_assortativity" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.2),
        |sym AS (
        |  SELECT src AS a, dst AS b FROM pairs
        |  UNION ALL SELECT dst, src FROM pairs),
        |deg AS (
        |  SELECT a AS z, CAST(COUNT(*) AS BIGINT) AS dz
        |  FROM sym GROUP BY a),
        |stubs AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
        |    CAST(SUM(d1.dz + d2.dz) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(d1.dz AS HUGEINT) * d1.dz +
        |      CAST(d2.dz AS HUGEINT) * d2.dz) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(d1.dz AS HUGEINT) * d2.dz) * 2 AS DOUBLE)
        |      AS sxy
        |  FROM pairs p JOIN deg d1 ON p.src = d1.z
        |  JOIN deg d2 ON p.dst = d2.z),
        |wedges AS (
        |  SELECT CAST(SUM(CAST(dz AS HUGEINT) * (dz - 1)) AS DOUBLE)
        |      AS w2,
        |    CAST(COUNT(*) AS BIGINT) AS n_nodes
        |  FROM deg),
        |tri AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        |    SELECT p1.src AS a, p1.dst AS b, p2.dst AS c
        |    FROM pairs p1 JOIN pairs p2 ON p1.dst = p2.src
        |    WHERE EXISTS (SELECT 1 FROM pairs p3
        |                  WHERE p3.src = p1.src AND p3.dst = p2.dst))),
        |f AS (
        |  SELECT n_nodes, m, n_triangles, w2, sx, sxx, sxy,
        |    CAST(m * 2 AS DOUBLE) AS m2d
        |  FROM stubs, wedges, tri),
        |f2 AS (SELECT *, sx / m2d AS mu FROM f)
        |SELECT n_nodes, m AS n_edges, n_triangles,
        |  CAST(w2 / 2.0 AS BIGINT) AS n_wedges,
        |  ROUND(3.0 * CAST(n_triangles AS DOUBLE) / (w2 / 2.0), 6)
        |    AS transitivity,
        |  ROUND((sxy / m2d - mu * mu) / (sxx / m2d - mu * mu), 6) + 0.0
        |    AS assortativity
        |FROM f2""".stripMargin,
    // q354: lexical diversity replayed — the q289 spectrum prelude,
    // exact HUGEINT spectrum moments, identical double shapes.
    "q354_lexical_diversity" ->
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS r FROM w GROUP BY w),
        |a AS (
        |  SELECT CAST(SUM(r) AS BIGINT) AS n_tokens,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    CAST(SUM(CAST(r AS HUGEINT) * r) AS DOUBLE) AS sr2,
        |    CAST(SUM(CAST(r AS HUGEINT) * (r - 1)) AS DOUBLE) AS sr11,
        |    CAST(SUM(CASE WHEN r = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        |    CAST(SUM(CASE WHEN r = 2 THEN 1 ELSE 0 END) AS BIGINT) AS v2
        |  FROM c)
        |SELECT n_tokens, n_types, v1, v2,
        |  ROUND(10000.0 * (sr2 - CAST(n_tokens AS DOUBLE)) /
        |    (CAST(n_tokens AS DOUBLE) * CAST(n_tokens AS DOUBLE)), 6)
        |    AS yule_k,
        |  ROUND(sr11 / (CAST(n_tokens AS DOUBLE) *
        |    (CAST(n_tokens AS DOUBLE) - 1.0)), 6) AS simpson_d,
        |  CASE WHEN v1 < n_types THEN
        |    ROUND(100.0 * LN(CAST(n_tokens AS DOUBLE)) /
        |      (1.0 - CAST(v1 AS DOUBLE) / CAST(n_types AS DOUBLE)), 6)
        |  END AS honore_r,
        |  ROUND(CAST(v2 AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
        |    AS sichel_s
        |FROM a WHERE n_tokens > 1""".stripMargin,

    // q355: Kneser–Ney replayed — the q133 bigram prelude, exact
    // context/continuation/type counts, the identical interpolated-P
    // shape, round-9 weighted log terms into the decimal corpus sum.
    "q355_kneser_ney" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS tk
        |  FROM documents),
        |bg AS (
        |  SELECT tk[i] || ' ' || tk[i + 1] AS bg
        |  FROM toks, unnest(range(1, GREATEST(len(tk), 1))) AS t(i)),
        |c2 AS (
        |  SELECT bg, CAST(COUNT(*) AS BIGINT) AS c2,
        |    string_split(bg, ' ')[1] AS w1,
        |    string_split(bg, ' ')[-1] AS w2
        |  FROM bg GROUP BY bg),
        |ctx AS (
        |  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
        |    CAST(COUNT(*) AS BIGINT) AS n1f
        |  FROM c2 GROUP BY w1),
        |cont AS (
        |  SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
        |  FROM c2 GROUP BY w2),
        |ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM c2),
        |sc AS (
        |  SELECT c2.c2 AS c2c,
        |    (CAST(c2.c2 AS DOUBLE) - 0.75) / CAST(ctx.c1 AS DOUBLE) +
        |    0.75 * CAST(ctx.n1f AS DOUBLE) / CAST(ctx.c1 AS DOUBLE) *
        |      (CAST(cont.n1b AS DOUBLE) / CAST(ty.nt AS DOUBLE)) AS p
        |  FROM c2 JOIN ctx ON c2.w1 = ctx.w1
        |  JOIN cont ON c2.w2 = cont.w2, ty),
        |agg AS (
        |  SELECT CAST(SUM(c2c) AS BIGINT) AS n_bigrams,
        |    CAST(COUNT(*) AS BIGINT) AS n_bigram_types,
        |    CAST(SUM(CAST(ROUND(CAST(c2c AS DOUBLE) * LN(p), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) /
        |      CAST(SUM(c2c) AS DOUBLE) AS avg
        |  FROM sc)
        |SELECT n_bigrams, n_bigram_types,
        |  ROUND(avg, 6) AS avg_logp, ROUND(EXP(-avg), 6) AS ppl
        |FROM agg""".stripMargin,

    // q356: categorical distance replayed — exact cohort cells, round-9
    // decimal term sums, one sqrt/ln each at the end.
    "q356_categorical_distance" ->
      """WITH d AS (
        |  SELECT event_type AS cat, user_id % 2 = 0 AS isa
        |  FROM events WHERE event_type IS NOT NULL),
        |cells AS (
        |  SELECT cat,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM d GROUP BY cat),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM cells),
        |terms AS (
        |  SELECT na, nb,
        |    CAST(ROUND(ABS(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) -
        |      CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)), 9)
        |      AS DECIMAL(38,9)) AS tv,
        |    CAST(ROUND(SQRT(CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) *
        |      (CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE))), 9)
        |      AS DECIMAL(38,9)) AS bc
        |  FROM cells, tot),
        |agg AS (
        |  SELECT na, nb, CAST(COUNT(*) AS BIGINT) AS n_categories,
        |    CAST(SUM(tv) AS DOUBLE) AS stv,
        |    CAST(SUM(bc) AS DOUBLE) AS sbc
        |  FROM terms GROUP BY na, nb)
        |SELECT na AS n_a, nb AS n_b, n_categories,
        |  ROUND(0.5 * stv, 6) AS tv, ROUND(sbc, 6) AS bc,
        |  ROUND(SQRT(GREATEST(0.0, 1.0 - sbc)), 6) AS hellinger,
        |  CASE WHEN sbc > 0.0 THEN ROUND(-LN(sbc), 6) + 0.0 END
        |    AS bhattacharyya
        |FROM agg""".stripMargin,
    // q357: AMS F2 replayed — the same MD5 slice decode (hexPolySlice7),
    // bucket/sign split, exact HUGEINT counter squares, rank-2 median.
    // q358 is the streaming build of the SAME counters (additive state)
    // and shares this oracle verbatim.
    "q357_ams_f2" -> amsF2Sql,
    "q358_stream_ams" -> amsF2Sql,

    // q359: Hurst R/S replayed — integer block cumsums, the identical
    // deviation/range/std shapes, round-8 decimal block sums, round-9
    // decimal log–log OLS moments.
    "q359_hurst" ->
      (s"""WITH $dailySeriesCtes,
        |ws AS (SELECT CAST(UNNEST([4, 8, 16, 32]) AS BIGINT) AS w),
        |tagged AS (
        |  SELECT w.w, s.i, s.x, s.i // w.w AS blk, s.i % w.w + 1 AS k
        |  FROM series s CROSS JOIN ws w),
        |fullb AS (
        |  SELECT w, i, x, blk, k,
        |    SUM(x) OVER (PARTITION BY w, blk) AS tot,
        |    SUM(CAST(x AS HUGEINT) * x) OVER (PARTITION BY w, blk)
        |      AS tsq,
        |    COUNT(*) OVER (PARTITION BY w, blk) AS cnt,
        |    SUM(x) OVER (PARTITION BY w, blk ORDER BY i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM tagged),
        |blocks AS (
        |  SELECT w, blk,
        |    MAX(CAST(cum AS DOUBLE) - CAST(k AS DOUBLE) *
        |      (CAST(tot AS DOUBLE) / CAST(w AS DOUBLE))) AS dmax,
        |    MIN(CAST(cum AS DOUBLE) - CAST(k AS DOUBLE) *
        |      (CAST(tot AS DOUBLE) / CAST(w AS DOUBLE))) AS dmin,
        |    MAX(tot) AS tot, MAX(CAST(tsq AS DOUBLE)) AS tsq
        |  FROM fullb WHERE cnt = w GROUP BY w, blk),
        |rsb AS (
        |  SELECT w,
        |    SQRT((tsq - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) /
        |      CAST(w AS DOUBLE)) / CAST(w AS DOUBLE)) AS s,
        |    ROUND((dmax - dmin) /
        |      SQRT((tsq - CAST(tot AS DOUBLE) * CAST(tot AS DOUBLE) /
        |        CAST(w AS DOUBLE)) / CAST(w AS DOUBLE)), 8) AS rs
        |  FROM blocks),
        |perw AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |    CAST(SUM(CAST(rs AS DECIMAL(38,8))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS mrs
        |  FROM rsb WHERE s > 0.0 GROUP BY w),
        |pts AS (
        |  SELECT w, n_blocks, mrs,
        |    CAST(ROUND(LN(CAST(w AS DOUBLE)), 9) AS DECIMAL(38,9))
        |      AS lx,
        |    CAST(ROUND(LN(mrs), 9) AS DECIMAL(38,9)) AS ly,
        |    CAST(ROUND(LN(CAST(w AS DOUBLE)) * LN(CAST(w AS DOUBLE)), 9)
        |      AS DECIMAL(38,9)) AS lxx,
        |    CAST(ROUND(LN(CAST(w AS DOUBLE)) * LN(mrs), 9)
        |      AS DECIMAL(38,9)) AS lxy
        |  FROM perw WHERE mrs > 0.0),
        |fit AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS np,
        |    CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
        |    CAST(SUM(lxx) AS DOUBLE) AS sxx,
        |    CAST(SUM(lxy) AS DOUBLE) AS sxy
        |  FROM pts)
        |SELECT w, n_blocks, ROUND(mrs, 6) AS mean_rs,
        |  ROUND((CAST(np AS DOUBLE) * sxy - sx * sy) /
        |    (CAST(np AS DOUBLE) * sxx - sx * sx), 6) AS hurst
        |FROM pts, fit ORDER BY w""").stripMargin,
    // q360: Hosmer–Lemeshow replayed — the q321 midrank convention,
    // ceil-decile bins, DECIMAL(28,6) expected sums, round-9 terms.
    "q360_hosmer_lemeshow" ->
      """WITH d AS (
        |  SELECT ROUND((o_orderkey * 7 % 1000) / 1000.0, 6) AS p,
        |    CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y
        |  FROM orders),
        |ms AS (
        |  SELECT p, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(y) AS BIGINT) AS pos
        |  FROM d GROUP BY p),
        |tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM ms),
        |mr AS (
        |  SELECT p, cnt, pos,
        |    CAST(COALESCE(SUM(cnt) OVER (ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS DOUBLE) + (cnt + 1) / 2.0 AS midrank
        |  FROM ms),
        |binned AS (
        |  SELECT CAST(CEIL(midrank * 10 / CAST(tot.n AS DOUBLE))
        |      AS BIGINT) AS bin,
        |    CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS obs_pos,
        |    CAST(SUM(CAST(p * CAST(cnt AS DOUBLE) AS DECIMAL(28,6)))
        |      AS DOUBLE) AS e
        |  FROM mr, tot GROUP BY 1),
        |terms AS (
        |  SELECT bin, n, obs_pos, e,
        |    CASE WHEN e > 0.0 AND e < CAST(n AS DOUBLE) THEN
        |      CAST(ROUND((CAST(obs_pos AS DOUBLE) - e) *
        |        (CAST(obs_pos AS DOUBLE) - e) /
        |        (e * (1.0 - e / CAST(n AS DOUBLE))), 9)
        |        AS DECIMAL(38,9))
        |    END AS t
        |  FROM binned),
        |stat AS (
        |  SELECT CAST(COUNT(t) AS BIGINT) AS k,
        |    CAST(SUM(t) AS DOUBLE) AS hl
        |  FROM terms)
        |SELECT bin, n, obs_pos, ROUND(e, 6) AS exp_pos,
        |  ROUND(hl, 6) AS hl_stat, k - 2 AS df
        |FROM terms, stat ORDER BY bin""".stripMargin,

    // q361: forecast yardstick replayed — exact integer error sums,
    // round-9 decimal sMAPE terms, the identical ratio shapes.
    "q361_forecast_accuracy" ->
      (s"""WITH $dailySeriesCtes,
        |lagd AS (
        |  SELECT i, x, LAG(x, 1) OVER (ORDER BY i) AS l1,
        |    LAG(x, 7) OVER (ORDER BY i) AS l7
        |  FROM series),
        |f AS (SELECT * FROM lagd WHERE l7 IS NOT NULL),
        |m AS (
        |  SELECT 'naive' AS model, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(ABS(x - l1)) AS DOUBLE) AS sae,
        |    CAST(SUM(CAST(x - l1 AS DECIMAL(38,0)) *
        |      CAST(x - l1 AS DECIMAL(38,0))) AS DOUBLE) AS sse,
        |    CAST(SUM(CAST(CASE WHEN ABS(x) + ABS(l1) > 0 THEN
        |      ROUND(2.0 * CAST(ABS(x - l1) AS DOUBLE) /
        |        CAST(ABS(x) + ABS(l1) AS DOUBLE), 9) ELSE 0.0 END
        |      AS DECIMAL(38,9))) AS DOUBLE) AS ssm
        |  FROM f
        |  UNION ALL
        |  SELECT 'seasonal_naive', CAST(COUNT(*) AS BIGINT),
        |    CAST(SUM(ABS(x - l7)) AS DOUBLE),
        |    CAST(SUM(CAST(x - l7 AS DECIMAL(38,0)) *
        |      CAST(x - l7 AS DECIMAL(38,0))) AS DOUBLE),
        |    CAST(SUM(CAST(CASE WHEN ABS(x) + ABS(l7) > 0 THEN
        |      ROUND(2.0 * CAST(ABS(x - l7) AS DOUBLE) /
        |        CAST(ABS(x) + ABS(l7) AS DOUBLE), 9) ELSE 0.0 END
        |      AS DECIMAL(38,9))) AS DOUBLE)
        |  FROM f),
        |sc AS (
        |  SELECT model, n_obs, sae / CAST(n_obs AS DOUBLE) AS mae,
        |    SQRT(sse / CAST(n_obs AS DOUBLE)) AS rmse,
        |    ssm / CAST(n_obs AS DOUBLE) AS smape
        |  FROM m),
        |base AS (
        |  SELECT mae AS bmae, rmse AS brmse FROM sc
        |  WHERE model = 'naive')
        |SELECT model, n_obs, ROUND(mae, 6) AS mae,
        |  ROUND(rmse, 6) AS rmse, ROUND(smape, 6) AS smape,
        |  ROUND(mae / bmae, 6) AS mase,
        |  ROUND(rmse / brmse, 6) AS theil_u
        |FROM sc, base ORDER BY model""").stripMargin,

    // q362: linear MMD² replayed — id-ordered cohort pairing, the
    // list_inner_product distance shape rounded to 9 under the exp,
    // round-9 h terms into the decimal mean.
    "q362_mmd_linear" ->
      """WITH d AS (
        |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e,
        |    label % 2 = 0 AS a
        |  FROM embeddings),
        |idx AS (
        |  SELECT id, e, a,
        |    ROW_NUMBER() OVER (PARTITION BY a ORDER BY id) - 1 AS r
        |  FROM d),
        |px AS (SELECT r // 2 AS pair, r % 2 AS pos, e, a FROM idx),
        |x1 AS (SELECT pair, e AS ex1 FROM px WHERE a AND pos = 0),
        |x2 AS (SELECT pair, e AS ex2 FROM px WHERE a AND pos = 1),
        |y1 AS (SELECT pair, e AS ey1 FROM px WHERE NOT a AND pos = 0),
        |y2 AS (SELECT pair, e AS ey2 FROM px WHERE NOT a AND pos = 1),
        |quads AS (
        |  SELECT x1.pair, ex1, ex2, ey1, ey2
        |  FROM x1 JOIN x2 USING (pair) JOIN y1 USING (pair)
        |  JOIN y2 USING (pair)),
        |hs AS (
        |  SELECT ROUND(
        |    EXP(-1.0 * ROUND(list_inner_product(ex1, ex1) +
        |      list_inner_product(ex2, ex2) -
        |      2.0 * list_inner_product(ex1, ex2), 9)) +
        |    EXP(-1.0 * ROUND(list_inner_product(ey1, ey1) +
        |      list_inner_product(ey2, ey2) -
        |      2.0 * list_inner_product(ey1, ey2), 9)) -
        |    EXP(-1.0 * ROUND(list_inner_product(ex1, ex1) +
        |      list_inner_product(ey2, ey2) -
        |      2.0 * list_inner_product(ex1, ey2), 9)) -
        |    EXP(-1.0 * ROUND(list_inner_product(ex2, ex2) +
        |      list_inner_product(ey1, ey1) -
        |      2.0 * list_inner_product(ex2, ey1), 9)), 9) AS h
        |  FROM quads)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_quads,
        |  ROUND(CAST(SUM(CAST(h AS DECIMAL(38,9))) AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mmd2_linear
        |FROM hs""".stripMargin,
    // q363: DP clipped mean replayed — the q237 two-round congruential
    // draw seeded from the public literals, identical clipping and
    // budget-split shapes.
    "q363_dp_mean" ->
      (s"""WITH a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(LEAST(GREATEST(CAST(value AS DOUBLE), 0.0),
        |      200.0) AS DECIMAL(28,2))) AS DOUBLE) AS s
        |  FROM events WHERE value IS NOT NULL),
        |hs AS (
        |  SELECT ${hexPoly15("MD5('dpmean:sum')")} AS x),
        |hc AS (
        |  SELECT ${hexPoly15("MD5('dpmean:count')")} AS x),
        |ds AS (
        |  SELECT (((((x % 1000003) * 2654435761) % 1000003) +
        |    x // 1000003) % 9999991) * 22695477 % 9999991 AS x2
        |  FROM hs),
        |dc AS (
        |  SELECT (((((x % 1000003) * 2654435761) % 1000003) +
        |    x // 1000003) % 9999991) * 22695477 % 9999991 AS x2
        |  FROM hc),
        |nzs AS (
        |  SELECT ROUND((CASE WHEN ((CAST(x2 AS DOUBLE) + 0.5) /
        |      9999991.0 - 0.5) >= 0.0 THEN -1.0 ELSE 1.0 END *
        |    LN(1.0 - 2.0 * ABS((CAST(x2 AS DOUBLE) + 0.5) / 9999991.0
        |      - 0.5))) * 400.0, 6) AS nsum
        |  FROM ds),
        |nzc AS (
        |  SELECT ROUND((CASE WHEN ((CAST(x2 AS DOUBLE) + 0.5) /
        |      9999991.0 - 0.5) >= 0.0 THEN -1.0 ELSE 1.0 END *
        |    LN(1.0 - 2.0 * ABS((CAST(x2 AS DOUBLE) + 0.5) / 9999991.0
        |      - 0.5))) * 2.0, 6) AS ncnt
        |  FROM dc),
        |f AS (
        |  SELECT n, s, s + nsum AS ns, CAST(n AS DOUBLE) + ncnt AS nc
        |  FROM a, nzs, nzc)
        |SELECT n, ROUND(s / CAST(n AS DOUBLE), 6) AS mean_true,
        |  ROUND(ns, 6) AS noisy_sum, ROUND(nc, 6) AS noisy_count,
        |  ROUND(ns / nc, 6) AS dp_mean, 1.0 AS eps,
        |  ROUND(ABS(ROUND(ns / nc, 6) -
        |    ROUND(s / CAST(n AS DOUBLE), 6)), 6) AS abs_err
        |FROM f""").stripMargin,

    // q364: uniqueness risk replayed — exact integer cell counting on
    // the same (nation, segment, acctbal-bucket) quasi-identifier.
    "q364_uniqueness_risk" ->
      """WITH cells AS (
        |  SELECT c_nationkey, c_mktsegment,
        |    FLOOR(c_acctbal / 100.0) AS bal_bucket,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT CAST(SUM(c) AS BIGINT) AS n_records,
        |  CAST(COUNT(*) AS BIGINT) AS n_cells,
        |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS k1_cells,
        |  CAST(SUM(CASE WHEN c = 1 THEN c ELSE 0 END) AS BIGINT)
        |    AS k1_records,
        |  CAST(SUM(CASE WHEN c <= 2 THEN c ELSE 0 END) AS BIGINT)
        |    AS k_le2_records,
        |  CAST(MAX(c) AS BIGINT) AS max_cell,
        |  ROUND(CAST(SUM(CASE WHEN c = 1 THEN c ELSE 0 END) AS DOUBLE) /
        |    CAST(SUM(c) AS DOUBLE), 6) AS pct_unique,
        |  ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
        |    AS avg_cell
        |FROM cells""".stripMargin,
    // q366: periodogram replayed — identical angle/projection shapes,
    // round-6 decimal term sums, round-9 entropy terms; cos/sin ride
    // the engine-wide libm-agreement contract under rounding.
    "q366_periodogram" ->
      (s"""WITH $dailySeriesCtes,
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx
        |  FROM series),
        |freqs AS (
        |  SELECT n, sx, CAST(UNNEST(generate_series(1,
        |    LEAST(CAST(FLOOR(n / 2.0) AS BIGINT), 16))) AS BIGINT) AS k
        |  FROM tot),
        |terms AS (
        |  SELECT f.k, f.n,
        |    CAST(ROUND((CAST(s.x AS DOUBLE) -
        |      f.sx / CAST(f.n AS DOUBLE)) *
        |      COS(6.283185307179586 * CAST(f.k AS DOUBLE) *
        |        CAST(s.i AS DOUBLE) / CAST(f.n AS DOUBLE)), 6)
        |      AS DECIMAL(38,6)) AS ca,
        |    CAST(ROUND((CAST(s.x AS DOUBLE) -
        |      f.sx / CAST(f.n AS DOUBLE)) *
        |      SIN(6.283185307179586 * CAST(f.k AS DOUBLE) *
        |        CAST(s.i AS DOUBLE) / CAST(f.n AS DOUBLE)), 6)
        |      AS DECIMAL(38,6)) AS sb
        |  FROM series s CROSS JOIN freqs f),
        |agg AS (
        |  SELECT k, n, CAST(SUM(ca) AS DOUBLE) AS a,
        |    CAST(SUM(sb) AS DOUBLE) AS b
        |  FROM terms GROUP BY k, n),
        |perk AS (
        |  SELECT k, n,
        |    ROUND((a * a + b * b) / CAST(n AS DOUBLE), 6) AS power
        |  FROM agg),
        |totp AS (
        |  SELECT CAST(SUM(CAST(power AS DECIMAL(28,6))) AS DOUBLE) AS tp
        |  FROM perk),
        |wp AS (SELECT k, n, power, power / tp AS p FROM perk, totp),
        |ent AS (
        |  SELECT CAST(SUM(CAST(CASE WHEN p > 0.0
        |      THEN ROUND(-p * LN(p), 9) ELSE 0.0 END
        |      AS DECIMAL(38,9))) AS DOUBLE) AS h,
        |    CAST(COUNT(*) AS BIGINT) AS nk
        |  FROM wp),
        |mx AS (SELECT MAX(power) AS mx FROM perk),
        |dom AS (
        |  SELECT MIN(k) AS dk FROM perk, mx WHERE power = mx)
        |SELECT k, power,
        |  ROUND(CAST(n AS DOUBLE) / CAST(k AS DOUBLE), 6)
        |    AS period_days,
        |  ROUND(h / LN(CAST(nk AS DOUBLE)), 6) AS spectral_entropy,
        |  dk AS dominant_k
        |FROM wp, ent, dom ORDER BY k""").stripMargin,

    // q367: ordinal association replayed — the identical cell
    // self-join pair counts in HUGEINT, marginal tie counts, the same
    // three coefficient shapes.
    "q367_ordinal_association" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS gx,
        |    CAST(FLOOR(l_extendedprice / 10000.0) AS BIGINT) AS gy
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
        |cells AS (
        |  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM d GROUP BY gx, gy),
        |pairs AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN b.gy > a.gy
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS HUGEINT)
        |      AS cc,
        |    CAST(SUM(CASE WHEN b.gy < a.gy
        |      THEN CAST(a.c AS HUGEINT) * b.c ELSE 0 END) AS HUGEINT)
        |      AS dd
        |  FROM cells a JOIN cells b
        |    ON b.gx > a.gx AND b.gy <> a.gy),
        |txm AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cells
        |        GROUP BY gx),
        |tym AS (SELECT CAST(SUM(c) AS BIGINT) AS m FROM cells
        |        GROUP BY gy),
        |tx AS (SELECT CAST(SUM(CAST(m AS HUGEINT) * (m - 1)) // 2
        |  AS HUGEINT) AS tx FROM txm),
        |ty AS (SELECT CAST(SUM(CAST(m AS HUGEINT) * (m - 1)) // 2
        |  AS HUGEINT) AS ty FROM tym),
        |tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cells)
        |SELECT n, CAST(cc AS BIGINT) AS concordant,
        |  CAST(dd AS BIGINT) AS discordant,
        |  CAST(tx AS BIGINT) AS ties_x, CAST(ty AS BIGINT) AS ties_y,
        |  ROUND((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) /
        |    SQRT((CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0 -
        |      CAST(tx AS DOUBLE)) *
        |      (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0 -
        |        CAST(ty AS DOUBLE))), 6) AS tau_b,
        |  CASE WHEN CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE) > 0.0 THEN
        |    ROUND((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) /
        |      (CAST(cc AS DOUBLE) + CAST(dd AS DOUBLE)), 6) END
        |    AS gamma,
        |  ROUND((CAST(cc AS DOUBLE) - CAST(dd AS DOUBLE)) /
        |    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0) / 2.0 -
        |      CAST(tx AS DOUBLE)), 6) AS somers_d_yx
        |FROM pairs, tx, ty, tot""".stripMargin,
    // q368: Brunner–Munzel replayed — half-integer midranks off the
    // shared grid (DECIMAL(38,1) mean-rank sums), round-9 variance
    // terms, the identical W / Satterthwaite shapes.
    "q368_brunner_munzel" ->
      """WITH v AS (
        |  SELECT value AS v, event_type = 'click' AS isa
        |  FROM events
        |  WHERE event_type IN ('click','view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS cb
        |  FROM v GROUP BY v),
        |c AS (
        |  SELECT v, ca, cb,
        |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM g),
        |mr AS (
        |  SELECT ca, cb,
        |    CAST(cum_a + cum_b - ca - cb AS DOUBLE) +
        |      CAST(ca + cb + 1 AS DOUBLE) / 2.0 AS m,
        |    CAST(cum_a - ca AS DOUBLE) + CAST(ca + 1 AS DOUBLE) / 2.0
        |      AS ma,
        |    CAST(cum_b - cb AS DOUBLE) + CAST(cb + 1 AS DOUBLE) / 2.0
        |      AS mb
        |  FROM c),
        |means AS (
        |  SELECT na, nb,
        |    CAST(SUM(CAST(CAST(ca AS DOUBLE) * m AS DECIMAL(38,1)))
        |      AS DOUBLE) / CAST(na AS DOUBLE) AS rca,
        |    CAST(SUM(CAST(CAST(cb AS DOUBLE) * m AS DECIMAL(38,1)))
        |      AS DOUBLE) / CAST(nb AS DOUBLE) AS rcb
        |  FROM mr, tot GROUP BY na, nb),
        |sums AS (
        |  SELECT na, nb, rca, rcb,
        |    CAST(SUM(CAST(ROUND(CAST(ca AS DOUBLE) *
        |      ((m - ma - rca + (CAST(na AS DOUBLE) + 1.0) / 2.0) *
        |       (m - ma - rca + (CAST(na AS DOUBLE) + 1.0) / 2.0)), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) AS ssa,
        |    CAST(SUM(CAST(ROUND(CAST(cb AS DOUBLE) *
        |      ((m - mb - rcb + (CAST(nb AS DOUBLE) + 1.0) / 2.0) *
        |       (m - mb - rcb + (CAST(nb AS DOUBLE) + 1.0) / 2.0)), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) AS ssb
        |  FROM mr, means GROUP BY na, nb, rca, rcb),
        |f AS (
        |  SELECT na, nb, rca, rcb, CAST(na AS DOUBLE) AS nad,
        |    CAST(nb AS DOUBLE) AS nbd,
        |    ssa / (CAST(na AS DOUBLE) - 1.0) AS sx,
        |    ssb / (CAST(nb AS DOUBLE) - 1.0) AS sy
        |  FROM sums),
        |f2 AS (SELECT *, nad * sx + nbd * sy AS pooled FROM f)
        |SELECT na AS n_a, nb AS n_b,
        |  ROUND((rcb - (nbd + 1.0) / 2.0) / nad, 6) AS p_hat,
        |  ROUND(nad * nbd * (rcb - rca) /
        |    ((nad + nbd) * SQRT(pooled)), 6) AS w_stat,
        |  ROUND((pooled * pooled) /
        |    ((nad * sx) * (nad * sx) / (nad - 1.0) +
        |      (nbd * sy) * (nbd * sy) / (nbd - 1.0)), 6) AS df
        |FROM f2""".stripMargin,

    // q369: Cochran's Q replayed — exact indicator cells, identical
    // fixed-shape assembly.
    "q369_cochran_q" ->
      """WITH ind AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS t0,
        |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS t1,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |      AS t2
        |  FROM events
        |  WHERE event_type IN ('click','view','purchase')
        |  GROUP BY user_id, CAST(ts AS DATE)),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
        |    CAST(SUM(t0) AS BIGINT) AS c0,
        |    CAST(SUM(t1) AS BIGINT) AS c1,
        |    CAST(SUM(t2) AS BIGINT) AS c2,
        |    CAST(SUM(t0 + t1 + t2) AS BIGINT) AS tt,
        |    CAST(SUM(CAST(t0 + t1 + t2 AS HUGEINT) * (t0 + t1 + t2))
        |      AS BIGINT) AS r2
        |  FROM ind)
        |SELECT n_subjects, c0 AS c_click, c1 AS c_view,
        |  c2 AS c_purchase, tt AS total_successes,
        |  CASE WHEN 3.0 * CAST(tt AS DOUBLE) - CAST(r2 AS DOUBLE) > 0.0
        |  THEN ROUND(3.0 * (3.0 - 1.0) *
        |    ((CAST(c0 AS DOUBLE) - CAST(tt AS DOUBLE) / 3.0) *
        |     (CAST(c0 AS DOUBLE) - CAST(tt AS DOUBLE) / 3.0) +
        |     (CAST(c1 AS DOUBLE) - CAST(tt AS DOUBLE) / 3.0) *
        |     (CAST(c1 AS DOUBLE) - CAST(tt AS DOUBLE) / 3.0) +
        |     (CAST(c2 AS DOUBLE) - CAST(tt AS DOUBLE) / 3.0) *
        |     (CAST(c2 AS DOUBLE) - CAST(tt AS DOUBLE) / 3.0)) /
        |    (3.0 * CAST(tt AS DOUBLE) - CAST(r2 AS DOUBLE)), 6)
        |  END AS q_stat,
        |  CAST(2 AS BIGINT) AS df
        |FROM agg""".stripMargin,

    // q370: exponential-gap KS replayed — exact µs gaps and λ moments,
    // centisecond grid, round-9 D sides, one exp per grid value.
    "q370_exponential_gap_ks" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS us, event_id FROM events),
        |l AS (
        |  SELECT us - LAG(us) OVER (PARTITION BY user_id
        |    ORDER BY us, event_id) AS gap
        |  FROM e),
        |gaps AS (
        |  SELECT gap, ROUND(CAST(gap AS DOUBLE) / 1e6, 2) AS v
        |  FROM l WHERE gap IS NOT NULL),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(gap) AS DOUBLE) AS sus
        |  FROM gaps),
        |byv AS (
        |  SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM gaps GROUP BY v),
        |cum AS (
        |  SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum FROM byv),
        |sides AS (
        |  SELECT n, sus, GREATEST(
        |    ROUND(CAST(cum AS DOUBLE) / CAST(n AS DOUBLE) -
        |      (1.0 - EXP(-(CAST(n AS DOUBLE) / (sus / 1e6)) * v)), 9),
        |    ROUND((1.0 - EXP(-(CAST(n AS DOUBLE) / (sus / 1e6)) * v)) -
        |      CAST(cum - c AS DOUBLE) / CAST(n AS DOUBLE), 9)) AS d
        |  FROM cum, tot)
        |SELECT n AS n_gaps,
        |  ROUND(CAST(n AS DOUBLE) / (sus / 1e6), 6) AS lambda_per_sec,
        |  ROUND(MAX(d), 6) AS d_stat,
        |  ROUND(SQRT(CAST(n AS DOUBLE)) * MAX(d), 6) AS sqrt_n_d
        |FROM sides GROUP BY n, sus""".stripMargin,
    // q371: partial correlation replayed — the identical ten exact
    // decimal moments and r shapes, one sqrt per correlation.
    "q371_partial_correlation" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y,
        |    CAST(l_discount AS DOUBLE) AS z
        |  FROM lineitem
        |  WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
        |    AND l_discount IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(z AS DECIMAL(28,2))) AS DOUBLE) AS sz,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(z * z AS DECIMAL(28,4))) AS DOUBLE) AS szz,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * z AS DECIMAL(28,4))) AS DOUBLE) AS sxz,
        |    CAST(SUM(CAST(y * z AS DECIMAL(28,4))) AS DOUBLE) AS syz
        |  FROM d),
        |r AS (
        |  SELECT n,
        |    (CAST(n AS DOUBLE) * sxy - sx * sy) /
        |      SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |        (CAST(n AS DOUBLE) * syy - sy * sy)) AS rxy,
        |    (CAST(n AS DOUBLE) * sxz - sx * sz) /
        |      SQRT((CAST(n AS DOUBLE) * sxx - sx * sx) *
        |        (CAST(n AS DOUBLE) * szz - sz * sz)) AS rxz,
        |    (CAST(n AS DOUBLE) * syz - sy * sz) /
        |      SQRT((CAST(n AS DOUBLE) * syy - sy * sy) *
        |        (CAST(n AS DOUBLE) * szz - sz * sz)) AS ryz
        |  FROM m)
        |SELECT n, ROUND(rxy, 6) AS r_xy, ROUND(rxz, 6) AS r_xz,
        |  ROUND(ryz, 6) AS r_yz,
        |  ROUND((rxy - rxz * ryz) /
        |    SQRT((1.0 - rxz * rxz) * (1.0 - ryz * ryz)), 6)
        |    AS r_xy_given_z
        |FROM r""".stripMargin,

    // q372: effect sizes replayed — the q286 moment CTEs, the ω²/ε²/f
    // shapes verbatim.
    "q372_anova_effect_sizes" ->
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
        |  FROM grp),
        |f AS (
        |  SELECT n, k, CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
        |    sb - s * s / CAST(n AS DOUBLE) AS ssb, q - sb AS ssw
        |  FROM a WHERE k > 1 AND n > k),
        |f2 AS (
        |  SELECT n, k, kd, ssb, ssw, ssb + ssw AS sst,
        |    ssw / (nd - kd) AS msw, ssb / (ssb + ssw) AS eta
        |  FROM f)
        |SELECT n, k, ROUND(eta, 6) AS eta_squared,
        |  ROUND((ssb - (kd - 1.0) * msw) / (sst + msw), 6)
        |    AS omega_squared,
        |  ROUND((ssb - (kd - 1.0) * msw) / sst, 6) AS epsilon_squared,
        |  CASE WHEN eta < 1.0 THEN
        |    ROUND(SQRT(eta / (1.0 - eta)), 6) END AS cohens_f
        |FROM f2""".stripMargin,

    // q373: entropy rate replayed — exact transition counts, round-9
    // per-row and per-source terms into decimal sums, one ln at the
    // end.
    "q373_markov_entropy" ->
      """WITH l AS (
        |  SELECT event_type AS j,
        |    LAG(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS i
        |  FROM events WHERE event_type IS NOT NULL),
        |pairs AS (
        |  SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM l WHERE i IS NOT NULL GROUP BY i, j),
        |marg AS (SELECT i, CAST(SUM(n) AS BIGINT) AS ni
        |         FROM pairs GROUP BY i),
        |tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nt,
        |    CAST(COUNT(DISTINCT i) AS BIGINT) AS k_states
        |  FROM pairs),
        |peri AS (
        |  SELECT p.i, m.ni,
        |    CAST(SUM(CAST(ROUND(-(CAST(p.n AS DOUBLE) /
        |      CAST(m.ni AS DOUBLE) *
        |      LN(CAST(p.n AS DOUBLE) / CAST(m.ni AS DOUBLE))), 9)
        |      AS DECIMAL(38,9))) AS DOUBLE) AS hi
        |  FROM pairs p JOIN marg m ON p.i = m.i GROUP BY p.i, m.ni),
        |h AS (
        |  SELECT nt, k_states,
        |    CAST(SUM(CAST(ROUND(CAST(ni AS DOUBLE) /
        |      CAST(nt AS DOUBLE) * hi, 9) AS DECIMAL(38,9)))
        |      AS DOUBLE) AS hh
        |  FROM peri, tot GROUP BY nt, k_states)
        |SELECT nt AS n_transitions, k_states,
        |  ROUND(hh, 6) AS entropy_rate,
        |  ROUND(LN(CAST(k_states AS DOUBLE)), 6) AS max_entropy,
        |  CASE WHEN k_states > 1 THEN
        |    ROUND(hh / LN(CAST(k_states AS DOUBLE)), 6) END
        |    AS efficiency
        |FROM h""".stripMargin,
    // q374: Poisson IRLS replayed — the q318 recursive-CTE contract:
    // round-12 decimal working-response sums over the spine, round-9
    // parameters per step, deviance at the entering parameters.
    "q374_poisson_trend" ->
      (s"""WITH RECURSIVE $dailySeriesCtes,
        |m0 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(x) AS DOUBLE) AS sx
        |  FROM series),
        |it(step, a, bb, dev) AS (
        |  SELECT 0, ROUND(LN(sx / CAST(n AS DOUBLE)), 9),
        |    CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
        |  FROM m0
        |  UNION ALL
        |  SELECT step + 1, ROUND((swz - bnew * swi) / sw, 9), bnew, dev
        |  FROM (
        |    SELECT step, sw, swi, swz, dev,
        |      ROUND((sw * swiz - swi * swz) /
        |        (sw * swii - swi * swi), 9) AS bnew
        |    FROM (
        |      SELECT step,
        |        CAST(SUM(CAST(ROUND(mu, 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS sw,
        |        CAST(SUM(CAST(ROUND(mu * sid, 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS swi,
        |        CAST(SUM(CAST(ROUND(mu * sid * sid, 12)
        |          AS DECIMAL(38,12))) AS DOUBLE) AS swii,
        |        CAST(SUM(CAST(ROUND(mu * (eta + (xd - mu) / mu), 12)
        |          AS DECIMAL(38,12))) AS DOUBLE) AS swz,
        |        CAST(SUM(CAST(ROUND(mu * sid *
        |          (eta + (xd - mu) / mu), 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS swiz,
        |        CAST(SUM(CAST(ROUND(CASE WHEN x > 0 THEN
        |          2.0 * (xd * LN(xd / mu) - (xd - mu))
        |          ELSE 2.0 * mu END, 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS dev
        |      FROM (
        |        SELECT it.step AS step, s.x,
        |          CAST(s.x AS DOUBLE) AS xd,
        |          CAST(s.i AS DOUBLE) AS sid,
        |          it.a + it.bb * CAST(s.i AS DOUBLE) AS eta,
        |          EXP(it.a + it.bb * CAST(s.i AS DOUBLE)) AS mu
        |        FROM it, series s WHERE it.step < 6)
        |      GROUP BY step)))
        |SELECT step AS iter, ROUND(a, 6) AS a, ROUND(bb, 6) AS b,
        |  ROUND(EXP(bb), 6) AS rate_ratio_per_day,
        |  ROUND(dev, 6) AS deviance
        |FROM it WHERE step >= 1 ORDER BY iter""").stripMargin,
    // q376: Nelson–Aalen replayed on q122's duration frame — exact
    // integer risk sets, one double division per time point, ordered
    // cumulative sums (both engines accumulate in t order).
    "q376_nelson_aalen" ->
      """WITH h AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
        |s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS su
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS pu
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.su
        |  GROUP BY e.user_id),
        |d AS (
        |  SELECT (COALESCE(p.pu, h.hz) - s.su) // 86400000000 AS t,
        |    p.pu IS NOT NULL AS ev
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id, h),
        |byt AS (
        |  SELECT t,
        |    SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS n_event,
        |    SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS n_censored
        |  FROM d GROUP BY t),
        |na AS (
        |  SELECT t, n_event, n_censored,
        |    SUM(n_event + n_censored) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
        |  FROM byt),
        |cum AS (
        |  SELECT t, n_risk, n_event, n_censored,
        |    SUM(CAST(n_event AS DOUBLE) / CAST(n_risk AS DOUBLE))
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hh,
        |    SUM(CAST(n_event AS DOUBLE) /
        |        (CAST(n_risk AS DOUBLE) * CAST(n_risk AS DOUBLE)))
        |      OVER (ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vv
        |  FROM na)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(n_event AS BIGINT) AS n_event,
        |  CAST(n_censored AS BIGINT) AS n_censored,
        |  ROUND(hh, 6) AS cum_hazard,
        |  ROUND(vv, 6) AS hazard_var,
        |  ROUND(EXP(-hh), 6) AS breslow_survival
        |FROM cum ORDER BY t""".stripMargin,
    // q377: meta-analysis replayed — exact decimal per-arm moments
    // (DECIMAL(18,2) values so the squares stay inside DuckDB's width-38
    // ceiling), the q266 variance parenthesization, DECIMAL(28,12)
    // stratum-level sums, τ² rounded to 9 before the random re-pool.
    "q377_meta_analysis" ->
      """WITH j AS (
        |  SELECT c_nationkey AS study,
        |    o_orderpriority IN ('1-URGENT', '2-HIGH') AS a,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |arm AS (
        |  SELECT study, a, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(x) AS sx, SUM(x * x) AS sxx
        |  FROM j GROUP BY study, a),
        |st AS (
        |  SELECT study,
        |    MAX(CASE WHEN a THEN n END) AS n1,
        |    MAX(CASE WHEN a THEN CAST(sx AS DOUBLE) END) AS sx1,
        |    MAX(CASE WHEN a THEN CAST(sxx AS DOUBLE) END) AS sxx1,
        |    MAX(CASE WHEN NOT a THEN n END) AS n0,
        |    MAX(CASE WHEN NOT a THEN CAST(sx AS DOUBLE) END) AS sx0,
        |    MAX(CASE WHEN NOT a THEN CAST(sxx AS DOUBLE) END) AS sxx0
        |  FROM arm GROUP BY study
        |  HAVING MAX(CASE WHEN a THEN n END) >= 2
        |    AND MAX(CASE WHEN NOT a THEN n END) >= 2),
        |es AS (
        |  SELECT study,
        |    sx1 / CAST(n1 AS DOUBLE) - sx0 / CAST(n0 AS DOUBLE) AS e,
        |    (sxx1 - sx1 * sx1 / CAST(n1 AS DOUBLE)) /
        |        (CAST(n1 AS DOUBLE) - 1.0) / CAST(n1 AS DOUBLE) +
        |      (sxx0 - sx0 * sx0 / CAST(n0 AS DOUBLE)) /
        |        (CAST(n0 AS DOUBLE) - 1.0) / CAST(n0 AS DOUBLE) AS se2
        |  FROM st),
        |sw AS (
        |  SELECT study, e, se2, 1.0 / se2 AS w FROM es WHERE se2 > 0),
        |pool AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS k_studies,
        |    CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS swt,
        |    CAST(SUM(CAST(w * e AS DECIMAL(28,12))) AS DOUBLE) AS swe,
        |    CAST(SUM(CAST(w * e * e AS DECIMAL(28,12))) AS DOUBLE)
        |      AS swee,
        |    CAST(SUM(CAST(w * w AS DECIMAL(28,12))) AS DOUBLE) AS sww
        |  FROM sw),
        |card AS (
        |  SELECT k_studies, swe / swt AS fixed_e, SQRT(1.0 / swt) AS fse,
        |    swee - swe * swe / swt AS q,
        |    CAST(k_studies - 1 AS DOUBLE) AS dfk,
        |    CASE WHEN k_studies > 1 THEN ROUND(GREATEST(0.0,
        |      ((swee - swe * swe / swt) - CAST(k_studies - 1 AS DOUBLE)) /
        |        (swt - sww / swt)), 9) ELSE 0.0 END AS tau2
        |  FROM pool),
        |rnd AS (
        |  SELECT
        |    CAST(SUM(CAST(1.0 / (se2 + tau2) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS swr,
        |    CAST(SUM(CAST(1.0 / (se2 + tau2) * e AS DECIMAL(28,12)))
        |      AS DOUBLE) AS swre
        |  FROM sw, card)
        |SELECT k_studies,
        |  ROUND(fixed_e, 6) AS fixed_effect,
        |  ROUND(fse, 6) AS fixed_se,
        |  ROUND(q, 6) AS q_stat,
        |  CASE WHEN q > 0 AND k_studies > 1
        |    THEN ROUND(GREATEST(0.0, (q - dfk) / q), 6) + 0.0
        |    ELSE 0.0 END AS i2,
        |  ROUND(tau2, 6) + 0.0 AS tau2,
        |  ROUND(swre / swr, 6) AS random_effect,
        |  ROUND(SQRT(1.0 / swr), 6) AS random_se
        |FROM card, rnd""".stripMargin,
    // q378: Ansari–Bradley replayed — the q259 value-collapsed rank
    // frame, doubled both-ends scores as exact HUGEINT products,
    // finite-population moments in one fixed double shape.
    "q378_ansari_bradley" ->
      """WITH v AS (
        |  SELECT CAST(value AS DOUBLE) AS v,
        |    event_type = 'click' AS is_a
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |bv AS (
        |  SELECT v,
        |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb,
        |    CAST(COUNT(*) AS BIGINT) AS t
        |  FROM v GROUP BY v),
        |tot AS (SELECT CAST(SUM(t) AS BIGINT) AS n FROM bv),
        |c AS (
        |  SELECT bv.*, tot.n,
        |    CAST(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) - t AS prev
        |  FROM bv, tot),
        |sc AS (
        |  SELECT ca, cb, t,
        |    LEAST(prev * 2 + t + 1, (n + 1) * 2 - (prev * 2 + t + 1))
        |      AS s2
        |  FROM c),
        |a AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(ca AS HUGEINT) * s2) AS HUGEINT) AS ab2,
        |    CAST(SUM(CAST(t AS HUGEINT) * s2) AS HUGEINT) AS ss2,
        |    CAST(SUM(CAST(t AS HUGEINT) * s2 * s2) AS HUGEINT) AS s4,
        |    CAST(SUM(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_tied
        |  FROM sc),
        |f AS (
        |  SELECT n_a, n_b, n_tied,
        |    CAST(n_a AS DOUBLE) AS nad, CAST(n_b AS DOUBLE) AS nbd,
        |    CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) AS nd,
        |    CAST(ab2 AS DOUBLE) / 2.0 AS abd,
        |    CAST(ss2 AS DOUBLE) /
        |      (2.0 * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))) AS mu,
        |    CAST(s4 AS DOUBLE) / 4.0 AS sqsum
        |  FROM a WHERE n_a > 0 AND n_b > 0)
        |SELECT n_a, n_b, n_tied AS n_tied_values,
        |  ROUND(abd, 6) AS ab_stat,
        |  ROUND(nad * mu, 6) AS mu_ab,
        |  ROUND(SQRT(nad * nbd / (nd * (nd - 1.0)) *
        |    (sqsum - nd * mu * mu)), 6) AS sigma_ab,
        |  CASE WHEN nad * nbd / (nd * (nd - 1.0)) *
        |      (sqsum - nd * mu * mu) > 0
        |    THEN ROUND((abd - nad * mu) /
        |      SQRT(nad * nbd / (nd * (nd - 1.0)) *
        |        (sqsum - nd * mu * mu)), 6) + 0.0 END AS z
        |FROM f""".stripMargin,
    // q379: pinball IRLS replayed — exact-integer OLS init, recursive
    // CTE over (τ, step) with round-12 decimal weighted sums and
    // round-9 params, mean pinball loss at the final parameters.
    "q379_quantile_trend" ->
      (s"""WITH RECURSIVE $dailySeriesCtes,
        |m0 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(i AS HUGEINT)) AS DOUBLE) AS si,
        |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS sii,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS six
        |  FROM series),
        |init AS (
        |  SELECT n, si, sx,
        |    ROUND((CAST(n AS DOUBLE) * six - si * sx) /
        |      (CAST(n AS DOUBLE) * sii - si * si), 9) AS b0
        |  FROM m0),
        |init2 AS (
        |  SELECT n, b0, ROUND((sx - b0 * si) / CAST(n AS DOUBLE), 9) AS a0
        |  FROM init),
        |taus(tau) AS (VALUES (0.25), (0.5), (0.75)),
        |it(tau, step, a, bb) AS (
        |  SELECT tau, 0, a0, b0 FROM init2, taus
        |  UNION ALL
        |  SELECT tau, step + 1, ROUND((swx - bnew * swi) / sw, 9), bnew
        |  FROM (
        |    SELECT tau, step, sw, swi, swx,
        |      ROUND((sw * swix - swi * swx) /
        |        (sw * swii - swi * swi), 9) AS bnew
        |    FROM (
        |      SELECT tau, step,
        |        CAST(SUM(CAST(ROUND(w, 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS sw,
        |        CAST(SUM(CAST(ROUND(w * sid, 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS swi,
        |        CAST(SUM(CAST(ROUND(w * sid * sid, 12)
        |          AS DECIMAL(38,12))) AS DOUBLE) AS swii,
        |        CAST(SUM(CAST(ROUND(w * xd, 12) AS DECIMAL(38,12)))
        |          AS DOUBLE) AS swx,
        |        CAST(SUM(CAST(ROUND(w * sid * xd, 12)
        |          AS DECIMAL(38,12))) AS DOUBLE) AS swix
        |      FROM (
        |        SELECT it.tau AS tau, it.step AS step,
        |          CAST(s.i AS DOUBLE) AS sid, CAST(s.x AS DOUBLE) AS xd,
        |          CASE WHEN CAST(s.x AS DOUBLE) -
        |              (it.a + it.bb * CAST(s.i AS DOUBLE)) >= 0
        |            THEN it.tau ELSE 1.0 - it.tau END /
        |            GREATEST(1e-06, ABS(CAST(s.x AS DOUBLE) -
        |              (it.a + it.bb * CAST(s.i AS DOUBLE)))) AS w
        |        FROM it, series s WHERE it.step < 8)
        |      GROUP BY tau, step))),
        |fin AS (SELECT tau, a, bb FROM it WHERE step = 8),
        |loss AS (
        |  SELECT f.tau AS tau,
        |    CAST(SUM(CAST(ROUND(CASE WHEN CAST(s.x AS DOUBLE) -
        |        (f.a + f.bb * CAST(s.i AS DOUBLE)) >= 0
        |      THEN f.tau * (CAST(s.x AS DOUBLE) -
        |        (f.a + f.bb * CAST(s.i AS DOUBLE)))
        |      ELSE (f.tau - 1.0) * (CAST(s.x AS DOUBLE) -
        |        (f.a + f.bb * CAST(s.i AS DOUBLE))) END, 12)
        |      AS DECIMAL(38,12))) AS DOUBLE) AS lsum
        |  FROM fin f, series s GROUP BY f.tau)
        |SELECT f.tau AS tau, ROUND(f.a, 6) + 0.0 AS a,
        |  ROUND(f.bb, 6) + 0.0 AS b,
        |  ROUND(l.lsum / CAST(init2.n AS DOUBLE), 6) AS pinball_mean,
        |  ROUND(init2.a0, 6) + 0.0 AS ols_a,
        |  ROUND(init2.b0, 6) + 0.0 AS ols_b
        |FROM fin f JOIN loss l ON f.tau = l.tau, init2
        |ORDER BY tau""").stripMargin,
    // q380: KMV replayed — distinct 60-bit hashes, per-group rank ≤ 64,
    // ALL merged from the kept sets (dedupe + re-rank), exact-integer
    // kth hash, one double division. Streaming twin shares it: minK
    // over deduplicated unions is idempotent, so any micro-batching
    // lands on the same kept set.
    "q380_kmv" -> q380KmvSql,
    "q380_stream_kmv" -> q380KmvSql,
    // q381: Fisher exact replayed — the same Lanczos lnGamma expression
    // tree (portable: +,*,/,LN only), log-space tail with exp(term−max)
    // summed as DECIMAL(28,12), identical parenthesization throughout.
    "q381_fisher_exact" -> q381FisherSql,
    // q382: RANSAC replayed — q179's congruential draws, round-9
    // two-point params, inlier votes against the shared rounded
    // threshold, HUGEINT refit moments.
    "q382_ransac_trend" -> q382RansacSql,
    // q383: theta replayed — q379's exact-integer OLS init, round-9
    // SES recursion over the theta=2 series, fixed combination
    // arithmetic per horizon step.
    "q383_theta_forecast" ->
      (s"""WITH RECURSIVE $dailySeriesCtes,
        |m0 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(i AS HUGEINT)) AS DOUBLE) AS si,
        |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS sii,
        |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS six
        |  FROM series),
        |init AS (
        |  SELECT n, si, sx,
        |    ROUND((CAST(n AS DOUBLE) * six - si * sx) /
        |      (CAST(n AS DOUBLE) * sii - si * si), 9) AS b0
        |  FROM m0),
        |init2 AS (
        |  SELECT n, b0, ROUND((sx - b0 * si) / CAST(n AS DOUBLE), 9)
        |    AS a0
        |  FROM init),
        |th AS (
        |  SELECT s.i AS i,
        |    2.0 * CAST(s.x AS DOUBLE) -
        |      (a0 + b0 * CAST(s.i AS DOUBLE)) AS t2
        |  FROM series s, init2),
        |it(i, l) AS (
        |  SELECT i, t2 FROM th WHERE i = 0
        |  UNION ALL
        |  SELECT th.i, ROUND(0.3 * th.t2 + 0.7 * it.l, 9)
        |  FROM it JOIN th ON th.i = it.i + 1),
        |lastl AS (SELECT l FROM it, init2 WHERE i = n - 1),
        |hh AS (SELECT CAST(UNNEST(generate_series(1, 7)) AS BIGINT) AS h)
        |SELECT hh.h AS h,
        |  ROUND(a0 + b0 * (CAST(n AS DOUBLE) - 1.0 + CAST(hh.h AS DOUBLE)),
        |    6) + 0.0 AS trend_component,
        |  ROUND(l, 6) + 0.0 AS ses_component,
        |  ROUND(0.5 * ((a0 + b0 * (CAST(n AS DOUBLE) - 1.0 +
        |    CAST(hh.h AS DOUBLE))) + l), 6) + 0.0 AS forecast
        |FROM hh, init2, lastl ORDER BY h""").stripMargin,
    // q384: Croston replayed — demand days ranked over the gap-filled
    // spine, p1 = d1+1 convention, round-9 twin SES recursion, the
    // same 1 - 0.1/2 bias-correction arithmetic.
    "q384_croston" ->
      """WITH RECURSIVE counts AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    CAST(SUM(CASE WHEN event_type = 'purchase' AND value > 200.0
        |      THEN 1 ELSE 0 END) AS BIGINT) AS x
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
        |dd AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY i) AS BIGINT) AS k,
        |    i, x
        |  FROM series WHERE x > 0),
        |iv AS (
        |  SELECT k, x,
        |    CASE WHEN k = 1 THEN i + 1
        |      ELSE i - LAG(i) OVER (ORDER BY k) END AS p
        |  FROM dd),
        |it(k, zh, ph) AS (
        |  SELECT k, CAST(x AS DOUBLE), CAST(p AS DOUBLE)
        |  FROM iv WHERE k = 1
        |  UNION ALL
        |  SELECT iv.k,
        |    ROUND(0.1 * CAST(iv.x AS DOUBLE) + 0.9 * it.zh, 9),
        |    ROUND(0.1 * CAST(iv.p AS DOUBLE) + 0.9 * it.ph, 9)
        |  FROM it JOIN iv ON iv.k = it.k + 1),
        |mx AS (SELECT MAX(k) AS mk FROM iv),
        |fin AS (SELECT zh, ph FROM it, mx WHERE k = mk),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_demand_days,
        |    CAST(SUM(CASE WHEN x > 0 THEN x ELSE 0 END) AS BIGINT)
        |      AS total_demand
        |  FROM series)
        |SELECT n_days, n_demand_days, total_demand,
        |  ROUND(zh, 6) AS size_hat,
        |  ROUND(ph, 6) AS interval_hat,
        |  ROUND(zh / ph, 6) AS croston_rate,
        |  ROUND((1.0 - 0.1 / 2.0) * (zh / ph), 6) AS sba_rate,
        |  ROUND(CAST(n_demand_days AS DOUBLE) /
        |    CAST(n_days AS DOUBLE), 6) AS demand_frac
        |FROM fin, tot""".stripMargin,
    // q385: Rocchio replayed — the q223 cosine/rank contract for both
    // rounds, round-12 decimal centroids per (query, dim), the same
    // q + 0.75·c expansion, macro means as decimal sums.
    "q385_rocchio_prf" ->
      """WITH e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 30),
        |r1 AS (
        |  SELECT q_id, n_id, rank FROM (
        |    SELECT q.q_id, e.vec_id AS n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
        |        ROUND(list_inner_product(e.emb, q.qe) /
        |          (SQRT(list_inner_product(e.emb, e.emb)) *
        |           SQRT(list_inner_product(q.qe, q.qe))), 6) DESC,
        |        e.vec_id) AS rank
        |    FROM e, q WHERE e.vec_id <> q.q_id)
        |  WHERE rank <= 10),
        |fb AS (
        |  SELECT r1.q_id, e.emb FROM r1 JOIN e ON e.vec_id = r1.n_id
        |  WHERE r1.rank <= 5),
        |fbv0 AS (
        |  SELECT q_id, emb, UNNEST(range(1, len(emb) + 1)) AS dim
        |  FROM fb),
        |fbv AS (SELECT q_id, dim, emb[dim] AS v FROM fbv0),
        |cent AS (
        |  SELECT q_id, dim,
        |    CAST(SUM(CAST(ROUND(v, 12) AS DECIMAL(38,12))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS c
        |  FROM fbv GROUP BY q_id, dim),
        |qv0 AS (
        |  SELECT q_id, qe, UNNEST(range(1, len(qe) + 1)) AS dim FROM q),
        |qv AS (SELECT q_id, dim, qe[dim] AS v FROM qv0),
        |q2 AS (
        |  SELECT q_id, list(qv.v + 0.75 * cent.c ORDER BY dim) AS qe2
        |  FROM qv JOIN cent USING (q_id, dim) GROUP BY q_id),
        |r2 AS (
        |  SELECT q_id, n_id, rank FROM (
        |    SELECT q2.q_id, e.vec_id AS n_id,
        |      ROW_NUMBER() OVER (PARTITION BY q2.q_id ORDER BY
        |        ROUND(list_inner_product(e.emb, q2.qe2) /
        |          (SQRT(list_inner_product(e.emb, e.emb)) *
        |           SQRT(list_inner_product(q2.qe2, q2.qe2))), 6) DESC,
        |        e.vec_id) AS rank
        |    FROM e, q2 WHERE e.vec_id <> q2.q_id)
        |  WHERE rank <= 10),
        |p1 AS (
        |  SELECT r1.q_id,
        |    CAST(SUM(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END)
        |        AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS p
        |  FROM r1 JOIN e ql ON ql.vec_id = r1.q_id
        |    JOIN e nl ON nl.vec_id = r1.n_id
        |  GROUP BY r1.q_id),
        |p2 AS (
        |  SELECT r2.q_id,
        |    CAST(SUM(CASE WHEN ql.label = nl.label THEN 1 ELSE 0 END)
        |        AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS p
        |  FROM r2 JOIN e ql ON ql.vec_id = r2.q_id
        |    JOIN e nl ON nl.vec_id = r2.n_id
        |  GROUP BY r2.q_id),
        |ov AS (
        |  SELECT r1.q_id, CAST(COUNT(*) AS BIGINT) AS novl
        |  FROM r1 JOIN r2 ON r1.q_id = r2.q_id AND r1.n_id = r2.n_id
        |  GROUP BY r1.q_id),
        |perq AS (
        |  SELECT p1.q_id, p1.p AS pb, p2.p AS pa,
        |    CAST(COALESCE(ov.novl, 0) AS DOUBLE) / 10.0 AS ovf
        |  FROM p1 JOIN p2 ON p1.q_id = p2.q_id
        |    LEFT JOIN ov ON ov.q_id = p1.q_id)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  ROUND(CAST(SUM(CAST(ROUND(pb, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS p_at_k_before,
        |  ROUND(CAST(SUM(CAST(ROUND(pa, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS p_at_k_after,
        |  ROUND(CAST(SUM(CAST(ROUND(pa, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) -
        |    CAST(SUM(CAST(ROUND(pb, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) + 0.0 AS p_at_k_delta,
        |  ROUND(CAST(SUM(CAST(ROUND(ovf, 12) AS DECIMAL(38,12)))
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_overlap_at_k
        |FROM perq""".stripMargin,
    // q386: Quade replayed — q320's cell/rank CTEs, block-range
    // mid-rank weights, .25-grid S terms through exact decimal sums.
    "q386_quade" ->
      """WITH cells AS (
        |  SELECT user_id % 50 AS b, event_type AS trt,
        |    ROUND(CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,12)))
        |      AS DOUBLE) / COUNT(*), 9) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |    AND user_id IS NOT NULL
        |  GROUP BY 1, 2),
        |kk AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS k FROM cells),
        |complete AS (
        |  SELECT b FROM cells GROUP BY b
        |  HAVING COUNT(*) = (SELECT k FROM kk)),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM complete),
        |c AS (SELECT cells.* FROM cells JOIN complete USING (b)),
        |rnk AS (
        |  SELECT b, trt,
        |    CAST(RANK() OVER (PARTITION BY b ORDER BY v) AS DOUBLE) +
        |      (CAST(COUNT(*) OVER (PARTITION BY b, v) AS BIGINT) - 1)
        |        / 2.0 AS r
        |  FROM c),
        |rg AS (SELECT b, MAX(v) - MIN(v) AS rgv FROM c GROUP BY b),
        |bw AS (
        |  SELECT b,
        |    CAST(RANK() OVER (ORDER BY rgv) AS DOUBLE) +
        |      (CAST(COUNT(*) OVER (PARTITION BY rgv) AS BIGINT) - 1)
        |        / 2.0 AS q
        |  FROM rg),
        |sij AS (
        |  SELECT rnk.trt AS trt,
        |    bw.q * (rnk.r - (CAST(kk.k AS DOUBLE) + 1.0) / 2.0) AS s
        |  FROM rnk JOIN bw USING (b), kk),
        |byt AS (
        |  SELECT trt,
        |    CAST(SUM(CAST(s AS DECIMAL(28,2))) AS DOUBLE) AS s_j,
        |    CAST(SUM(CAST(s * s AS DECIMAL(28,4))) AS DOUBLE) AS sii
        |  FROM sij GROUP BY trt),
        |card AS (
        |  SELECT CAST(SUM(CAST(sii AS DECIMAL(28,4))) AS DOUBLE) AS a,
        |    CAST(SUM(CAST(s_j * s_j AS DECIMAL(28,4))) AS DOUBLE) /
        |      CAST(nn.n AS DOUBLE) AS bb
        |  FROM byt, nn GROUP BY nn.n)
        |SELECT trt, ROUND(s_j, 6) + 0.0 AS s_j, n AS n_blocks, k,
        |  ROUND(a, 6) AS a_stat, ROUND(bb, 6) AS b_stat,
        |  CASE WHEN a > bb
        |    THEN ROUND((CAST(n AS DOUBLE) - 1.0) * bb / (a - bb), 6)
        |    END AS f_stat,
        |  k - 1 AS df1, (n - 1) * (k - 1) AS df2
        |FROM byt, card, nn, kk ORDER BY trt""".stripMargin,
    // q387: BFS replayed — the q118 cosine edge CTE, recursive
    // expansion with UNION dedup bounded at 6 rounds, min-distance
    // group, exact integer level counts.
    "q387_bfs_hops" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS s, b.vec_id AS t
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.2),
        |sym AS (
        |  SELECT s, t FROM pairs UNION SELECT t, s FROM pairs),
        |verts AS (SELECT DISTINCT s AS v FROM sym),
        |srcs AS (SELECT v AS src FROM verts ORDER BY v LIMIT 4),
        |bfs(src, v, d) AS (
        |  SELECT src, src, CAST(0 AS BIGINT) FROM srcs
        |  UNION
        |  SELECT b.src, sym.t, b.d + 1
        |  FROM bfs b JOIN sym ON sym.s = b.v WHERE b.d < 6),
        |mind AS (
        |  SELECT src, v, CAST(MIN(d) AS BIGINT) AS d
        |  FROM bfs GROUP BY src, v),
        |persrc AS (
        |  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reached,
        |    CAST(MAX(d) AS BIGINT) AS ecc_within_rounds
        |  FROM mind GROUP BY src),
        |nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM verts)
        |SELECT m.src AS src, m.d AS d,
        |  CAST(COUNT(*) AS BIGINT) AS n_at_distance,
        |  p.n_reached, p.ecc_within_rounds, nv.n_vertices
        |FROM mind m JOIN persrc p ON m.src = p.src, nv
        |GROUP BY m.src, m.d, p.n_reached, p.ecc_within_rounds,
        |  nv.n_vertices
        |ORDER BY src, d""".stripMargin,
    // q388: exact sign test replayed — integer day-over-day diffs, the
    // q381 log-space binomial tail with the same Lanczos lnGamma text.
    "q388_sign_test" -> q388SignTestSql,
    // q389: capture-recapture replayed — q113 half-split capture flags,
    // exact integer overlaps, one fixed double shape per estimator.
    "q389_capture_recapture" ->
      """WITH t AS (
        |  SELECT user_id AS u, epoch_us(ts) AS tt FROM events
        |  WHERE user_id IS NOT NULL),
        |rng AS (SELECT MIN(tt) AS mn, MAX(tt) AS mx FROM t),
        |f AS (
        |  SELECT u,
        |    MAX(CASE WHEN tt * 2 < mn + mx THEN 1 ELSE 0 END) AS a,
        |    MAX(CASE WHEN tt * 2 >= mn + mx THEN 1 ELSE 0 END) AS b
        |  FROM t, rng GROUP BY u),
        |agg AS (
        |  SELECT CAST(SUM(a) AS BIGINT) AS n1,
        |    CAST(SUM(b) AS BIGINT) AS n2,
        |    CAST(SUM(a * b) AS BIGINT) AS n_both,
        |    CAST(COUNT(*) AS BIGINT) AS n_true
        |  FROM f),
        |d AS (
        |  SELECT n1, n2, n_both, n_true,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d,
        |    CAST(n_both AS DOUBLE) AS md,
        |    CAST(n_true AS DOUBLE) AS ntd
        |  FROM agg)
        |SELECT n1, n2, n_both, n_true,
        |  CASE WHEN n_both > 0
        |    THEN ROUND(n1d * n2d / md, 6) END AS lincoln_petersen,
        |  ROUND((n1d + 1.0) * (n2d + 1.0) / (md + 1.0) - 1.0, 6)
        |    AS chapman_estimate,
        |  ROUND(SQRT((n1d + 1.0) * (n2d + 1.0) * (n1d - md) *
        |    (n2d - md) / ((md + 1.0) * (md + 1.0) * (md + 2.0))), 6)
        |    AS chapman_se,
        |  ROUND(((n1d + 1.0) * (n2d + 1.0) / (md + 1.0) - 1.0 - ntd) /
        |    ntd, 6) + 0.0 AS rel_err_vs_true
        |FROM d""".stripMargin,
    // q390: jackknife replayed — exact decimal per-stratum sums, fixed
    // leave-one-out ratio shapes, DECIMAL(28,12) stratum-level moments.
    "q390_jackknife_ratio" ->
      """WITH j AS (
        |  SELECT c_nationkey AS stratum,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  WHERE o_totalprice IS NOT NULL),
        |per AS (
        |  SELECT stratum, SUM(v) AS s, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM j GROUP BY stratum),
        |tot AS (
        |  SELECT SUM(s) AS ts, CAST(SUM(c) AS BIGINT) AS tc,
        |    CAST(COUNT(*) AS BIGINT) AS k
        |  FROM per),
        |loo AS (
        |  SELECT k, ts, tc,
        |    CAST(ts - s AS DOUBLE) / CAST(tc - c AS DOUBLE) AS ri
        |  FROM per, tot),
        |agg AS (
        |  SELECT k, ts, tc,
        |    CAST(SUM(CAST(ri AS DECIMAL(28,12))) AS DOUBLE) AS sr,
        |    CAST(SUM(CAST(ri * ri AS DECIMAL(28,12))) AS DOUBLE) AS sr2
        |  FROM loo GROUP BY k, ts, tc)
        |SELECT k AS k_strata,
        |  ROUND(CAST(ts AS DOUBLE) / CAST(tc AS DOUBLE), 6)
        |    AS ratio_full,
        |  ROUND(sr / CAST(k AS DOUBLE), 6) AS jack_mean,
        |  ROUND(SQRT(GREATEST(0.0, (CAST(k AS DOUBLE) - 1.0) /
        |    CAST(k AS DOUBLE) * (sr2 - CAST(k AS DOUBLE) *
        |      (sr / CAST(k AS DOUBLE)) * (sr / CAST(k AS DOUBLE))))), 6)
        |    AS jack_se,
        |  ROUND(CAST(k AS DOUBLE) *
        |      (CAST(ts AS DOUBLE) / CAST(tc AS DOUBLE)) -
        |    (CAST(k AS DOUBLE) - 1.0) * (sr / CAST(k AS DOUBLE)), 6)
        |    AS bias_corrected
        |FROM agg""".stripMargin,
    // q391: randomized response replayed — hexPoly15 congruential
    // draws per unit (both coins public-seeded), fixed unbiasing
    // arithmetic.
    "q391_randomized_response" -> q391RrSql,
    // q392: NB-vs-Poisson replayed — exact decimal moments, the same
    // Lanczos lnGamma likelihood text, round-12 decimal ll sums.
    "q392_negbin_fit" -> q392NegbinSql,
    // q393: Weibull plot replayed — q122's KM chain as a CTE, fixed ln
    // transforms on the shared round-6 survival values, round-12
    // decimal OLS moments.
    "q393_weibull_fit" -> q393WeibullSql,
    // q394: Davies-Bouldin replayed — the q252 draw/assignment CTEs,
    // Euclidean distances in the fixed x·x − 2x·c + c·c shape,
    // round-12 decimal scatter and mean sums.
    "q394_davies_bouldin" -> q394DaviesBouldinSql,
    // q395: turning points replayed — lag/lead over the spine, exact
    // strict-extrema counts, one fixed moment shape.
    "q395_turning_points" ->
      (s"""WITH $dailySeriesCtes,
        |t AS (
        |  SELECT x, LAG(x) OVER (ORDER BY i) AS p,
        |    LEAD(x) OVER (ORDER BY i) AS f
        |  FROM series),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS interior,
        |    CAST(SUM(CASE WHEN (p < x AND x > f) OR (p > x AND x < f)
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_turning
        |  FROM t WHERE p IS NOT NULL AND f IS NOT NULL),
        |d AS (
        |  SELECT interior + 2 AS n_days, n_turning,
        |    CAST(interior + 2 AS DOUBLE) AS nd
        |  FROM m)
        |SELECT n_days, n_turning,
        |  ROUND(2.0 * (nd - 2.0) / 3.0, 6) AS expected,
        |  ROUND((16.0 * nd - 29.0) / 90.0, 6) AS variance,
        |  CASE WHEN (16.0 * nd - 29.0) / 90.0 > 0
        |    THEN ROUND((CAST(n_turning AS DOUBLE) -
        |      2.0 * (nd - 2.0) / 3.0) /
        |      SQRT((16.0 * nd - 29.0) / 90.0), 6) + 0.0 END AS z
        |FROM d""").stripMargin,
    // q396: probit replayed — the q189 recursive-CTE contract with the
    // same Zelen–Severo normCdf/normPdf expression text, clamped Φ,
    // Fisher-scoring sums as DECIMAL(28,12).
    "q396_probit" -> q396ProbitSql,
    // q397: the ORC round-trip's CLAIM is fidelity — the oracle is the
    // same exact aggregate straight off the parquet table.
    "q397_orc_roundtrip" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q398: block bootstrap replayed — q179 congruential block starts,
    // exact HUGEINT replicate moments, rank-exact order statistics.
    "q398_block_bootstrap" -> q398BlockBootstrapSql,
    // q399: UCB1 replay replayed — round-9 normalized day×arm rewards,
    // a 10-column state recursion with the argmax cascade, the same
    // sequential reward/regret accumulation order.
    "q399_ucb_replay" -> q399UcbReplaySql,
    // q400: randomization test replayed — congruential per-(unit,perm)
    // draws, fixed-size relabeling via per-perm rank, DECIMAL(28,12)
    // mean shapes, exact extreme counting.
    "q400_permutation_test" -> q400PermutationSql,
    // q401: two-feature IRLS replayed — the q189 recursive-CTE
    // contract with a 3×3 Cramer solve in the shared det3 shape.
    "q401_logistic_2f" -> q401Logistic2Sql,
    // q402: cartography replayed — q189's recursion supplies the six
    // round-9 parameter pairs; confidence/variability are the same
    // fixed per-example chains, zone thresholds on round-9 values.
    "q402_training_cartography" -> q402CartographySql,
    // q403: Aalen–Johansen replayed — q122's duration machinery with a
    // cause column, shifted log-space S(s-), ordered CIF cumulation.
    "q403_competing_risks" ->
      """WITH h AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
        |s AS (
        |  SELECT user_id, MIN(epoch_us(ts)) AS su
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |p AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS pu
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.su
        |  GROUP BY e.user_id),
        |er AS (
        |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS eu
        |  FROM events e JOIN s ON e.user_id = s.user_id
        |  WHERE e.event_type = 'error' AND epoch_us(e.ts) >= s.su
        |  GROUP BY e.user_id),
        |d AS (
        |  SELECT
        |    (COALESCE(CASE WHEN p.pu IS NOT NULL
        |        AND (er.eu IS NULL OR p.pu <= er.eu) THEN p.pu
        |      ELSE er.eu END, h.hz) - s.su) // 86400000000 AS t,
        |    CASE WHEN p.pu IS NOT NULL
        |        AND (er.eu IS NULL OR p.pu <= er.eu) THEN 1
        |      WHEN er.eu IS NOT NULL THEN 2 ELSE 0 END AS cause
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id
        |    LEFT JOIN er ON s.user_id = er.user_id, h),
        |byt AS (
        |  SELECT t,
        |    SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS d1,
        |    SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS d2,
        |    SUM(CASE WHEN cause = 0 THEN 1 ELSE 0 END) AS n_censored
        |  FROM d GROUP BY t),
        |cr AS (
        |  SELECT t, d1, d2, n_censored,
        |    SUM(d1 + d2 + n_censored) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |      AS n_risk
        |  FROM byt),
        |st AS (
        |  SELECT t, d1, d2, n_censored, n_risk,
        |    CASE WHEN d1 + d2 < n_risk
        |      THEN LN(1.0 - CAST(d1 + d2 AS DOUBLE) /
        |        CAST(n_risk AS DOUBLE))
        |      ELSE 0.0 END AS step
        |  FROM cr),
        |cum AS (
        |  SELECT t, d1, d2, n_censored, n_risk,
        |    EXP(COALESCE(SUM(step) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
        |      AS sminus,
        |    SUM(step) OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cstep
        |  FROM st)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(d1 AS BIGINT) AS d_cause1,
        |  CAST(d2 AS BIGINT) AS d_cause2,
        |  CAST(n_censored AS BIGINT) AS n_censored,
        |  CASE WHEN d1 + d2 = n_risk THEN 0.0
        |    ELSE ROUND(EXP(cstep), 6) END AS survival,
        |  ROUND(SUM(sminus * CAST(d1 AS DOUBLE) /
        |      CAST(n_risk AS DOUBLE)) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS cif_cause1,
        |  ROUND(SUM(sminus * CAST(d2 AS DOUBLE) /
        |      CAST(n_risk AS DOUBLE)) OVER (ORDER BY t
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS cif_cause2
        |FROM cum ORDER BY t""".stripMargin,
    // q404: RFM replayed — the q259 per-value prev/midrank scheme per
    // dimension, q321's descending bin formula for recency, exact
    // decimal monetary sums.
    "q404_rfm_segments" -> q404RfmSql,
    // q405: calibration slope replayed — q189's recursion on the
    // clamped logit of the q197 scorer.
    "q405_calibration_slope" ->
      """WITH RECURSIVE d AS (
        |  SELECT LN(GREATEST(1e-6, LEAST(0.999999,
        |      (o_orderkey * 7 % 1000) / CAST(1000.0 AS DOUBLE))) /
        |    (1.0 - GREATEST(1e-6, LEAST(0.999999,
        |      (o_orderkey * 7 % 1000) / CAST(1000.0 AS DOUBLE))))) AS x,
        |    CASE WHEN o_totalprice > 150000 THEN 1.0 ELSE 0.0 END AS y
        |  FROM orders),
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
        |      CAST(SUM(CAST((y - p) * x AS DECIMAL(28,12))) AS DOUBLE)
        |        AS g1,
        |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS sw,
        |      CAST(SUM(CAST(p * (1.0 - p) * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swx,
        |      CAST(SUM(CAST(p * (1.0 - p) * x * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swxx,
        |      ROUND(CAST(SUM(CAST(y * LN(p) + (1.0 - y) * LN(1.0 - p)
        |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
        |    FROM (
        |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, d.x AS x,
        |        d.y AS y,
        |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x))) AS p
        |      FROM it, d
        |      WHERE it.i < 6)
        |    GROUP BY i, b0, b1))
        |SELECT i AS iter, ROUND(b0, 6) + 0.0 AS b0,
        |  ROUND(b1, 6) + 0.0 AS b1, ll AS log_loss
        |FROM it WHERE i >= 1
        |ORDER BY iter""".stripMargin,
    // q406: Allen census replayed — exact integer span comparisons
    // through the identical case cascade.
    "q406_allen_census" ->
      """WITH c AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MIN(epoch_us(ts)) AS a_s, MAX(epoch_us(ts)) AS ae
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |v AS (
        |  SELECT user_id, CAST(ts AS DATE) AS day,
        |    MIN(epoch_us(ts)) AS bs, MAX(epoch_us(ts)) AS be
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |p AS (SELECT a_s, ae, bs, be FROM c JOIN v USING (user_id, day)),
        |r AS (
        |  SELECT CASE
        |    WHEN ae < bs THEN 'precedes'
        |    WHEN be < a_s THEN 'preceded_by'
        |    WHEN a_s = bs AND ae = be THEN 'equals'
        |    WHEN ae = bs THEN 'meets'
        |    WHEN be = a_s THEN 'met_by'
        |    WHEN a_s = bs AND ae < be THEN 'starts'
        |    WHEN a_s = bs AND ae > be THEN 'started_by'
        |    WHEN ae = be AND a_s > bs THEN 'finishes'
        |    WHEN ae = be AND a_s < bs THEN 'finished_by'
        |    WHEN a_s > bs AND ae < be THEN 'during'
        |    WHEN a_s < bs AND ae > be THEN 'contains'
        |    WHEN a_s < bs AND ae > bs AND ae < be THEN 'overlaps'
        |    WHEN a_s > bs AND a_s < be AND ae > be THEN 'overlapped_by'
        |    ELSE 'other' END AS relation
        |  FROM p),
        |counts AS (
        |  SELECT relation, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM r GROUP BY relation),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
        |SELECT relation, n,
        |  ROUND(CAST(n AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
        |FROM counts, tot ORDER BY relation""".stripMargin,

    // q408–q417: the round-12 SQL-text surface. Portable strings serve
    // verbatim (the q146 convention); dialect twins share the proven
    // oracle of their DataFrame sibling via the private defs below.
    "q408_sql_interval_join" -> SqlText.intervalJoin,
    "q409_sql_asof_join" -> asofSql,
    "q410_sql_weighted_median" -> SqlText.weightedMedian,
    "q411_sql_profile" -> profileSql,
    "q412_sql_retention" -> retentionSql,
    "q413_sql_rollup" -> SqlText.rollup,
    "q414_sql_topk" -> SqlText.topk,
    "q415_sql_text_quality" -> textQualitySql,
    "q416_sql_weekly_trend" -> SqlText.weeklyTrend,
    "q417_sql_skew_report" -> skewReportSql,

    // q407: the exact-split CART fit UNROLLED level by level — per level,
    // assignment LEFT JOIN on the previous level's 1-row-per-node winners,
    // per-(node, feature, value) DECIMAL(28,12) cells, prefix-sum window
    // over the aggregated frame, per-node round-2 gain argmax with the
    // identical (gain desc, feat asc, value asc) tie-break — exactly the
    // driver loop of MlPipelines.cartTreePortable, digit for digit.
    "q407_cart_tree" -> q407CartTreeSql,

    // q418/q419: the deep-sequence forward passes replayed — the same
    // round-9 weight literals (emitted by graft.ml.SeqForward.fmt), the
    // same per-step state rounding, the same fixed gate/softmax
    // parenthesization; recurrence unrolls as chained per-step CTEs.
    "q418_lstm_forward" -> q418LstmSql,
    "q419_attention_forward" -> q419AttentionSql,

    // q420: the RNN TRAINING trajectory replayed — params flow as columns
    // through chained per-iteration CTE blocks (i_k → staged forward+RTRL
    // → exact-decimal gradient aggregate → i_{k+1}); round-9 states,
    // sensitivities, clipped gradients and updates match the driver loop
    // of SeqForward.rnnRtrlTrain digit for digit.
    "q420_rnn_rtrl_train" -> q420RnnSql,

    // q421: the transformer encoder block replayed — identical round-9
    // weight/positional literals, the same stage order (embed+PE → Q/K/V
    // → scaled scores → max-shift softmax → residual → LayerNorm → ReLU
    // FFN → residual) as CTE stages.
    "q421_transformer_block" -> q421TransformerSql,

    // q422: the two-level coarse→fine IVF assignment replayed — q182's
    // congruential centroid draw, contiguous blocks of ⌈√12⌉=4 with
    // lowest-id representatives, top-2 block probe then within-block
    // argmax, both ranking round-6 cosines with id tie-breaks.
    "q422_two_level_assign" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |drawn AS (
        |  SELECT vec_id, emb,
        |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
        |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
        |  FROM e),
        |cent AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
        |      AS centroid_id,
        |    emb AS centroid
        |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 12)),
        |fine AS (
        |  SELECT centroid_id, CAST(centroid_id // 4 AS BIGINT) AS coarse_id,
        |    centroid
        |  FROM cent),
        |coarse AS (
        |  SELECT coarse_id, centroid AS ccent FROM fine
        |  WHERE centroid_id % 4 = 0),
        |probed AS (
        |  SELECT vec_id, emb, coarse_id FROM (
        |    SELECT e.vec_id, e.emb, c.coarse_id,
        |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        |        ROUND(list_inner_product(e.emb, c.ccent) /
        |          (SQRT(list_inner_product(e.emb, e.emb)) *
        |           SQRT(list_inner_product(c.ccent, c.ccent))), 6) DESC,
        |        c.coarse_id) AS rn
        |    FROM e, coarse c)
        |  WHERE rn <= 2),
        |assign AS (
        |  SELECT vec_id, centroid_id, cos FROM (
        |    SELECT p.vec_id, f.centroid_id,
        |      ROUND(list_inner_product(p.emb, f.centroid) /
        |        (SQRT(list_inner_product(p.emb, p.emb)) *
        |         SQRT(list_inner_product(f.centroid, f.centroid))), 6)
        |        AS cos,
        |      ROW_NUMBER() OVER (PARTITION BY p.vec_id ORDER BY
        |        ROUND(list_inner_product(p.emb, f.centroid) /
        |          (SQRT(list_inner_product(p.emb, p.emb)) *
        |           SQRT(list_inner_product(f.centroid, f.centroid))), 6)
        |          DESC,
        |        f.centroid_id) AS rn
        |    FROM probed p JOIN fine f USING (coarse_id))
        |  WHERE rn = 1)
        |SELECT centroid_id, COUNT(*) AS n_assigned,
        |  MIN(vec_id) AS min_vec_id,
        |  ROUND(CAST(SUM(CAST(cos AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_cosine
        |FROM assign GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,

    // q423: the plateau scheduler's whole state trajectory replayed as a
    // recursive CTE (lr, best, bad-count carried per epoch — pure
    // comparisons and exact halvings), cosine annealing joined as the
    // SAME round-12 literals the Spark plan embeds.
    "q423_lr_schedule" -> q423LrScheduleSql,

    // q424: the two-head encoder block replayed — identical round-9
    // literals from the disjoint mhParam bank, per-head score/softmax/mix
    // stages (head_dim=1 ⇒ scale 1), round-9 head outputs at the concat
    // boundary, W_O + residual + LayerNorm + FFN as q421's CTE chain.
    "q424_multihead_attention" -> q424MultiHeadSql,

    // q425: the 1-unit LSTM TRAINING trajectory replayed — params flow
    // as columns through chained per-iteration CTE blocks, each step 5
    // staged CTEs (gates → cell+∂c/∂θ → tanh c → hidden+∂h/∂θ → rename,
    // no select both reads and redefines a name), exact-decimal gradient
    // aggregates, clip ±1, round-9 updates — digit for digit against
    // SeqForward.lstmRtrlTrain.
    "q425_lstm_rtrl_train" -> q425LstmTrainSql,

    // q426: the AdamW OPTIMIZER trajectory replayed — q420's per-
    // iteration CTE blocks extended with first/second-moment state
    // (m/v flow as columns next to the params), bias correction divides
    // by the driver-literal 1−βᵗ factors, decoupled decay multiplies
    // the WEIGHT — digit for digit against SeqForward.rnnAdamwTrain.
    "q426_rnn_adamw_train" -> q426AdamwSql,

    // q427: the attention-pooling layer replayed — q418's per-step CTE
    // chain with each hidden state snapshotted, then the score MLP /
    // max-shift softmax / weighted mix as staged CTEs, identical round-9
    // literals from the disjoint poolParam bank.
    "q427_attention_pooling" -> q427PoolingSql,

    // q428: the bidirectional LSTM replayed — two interleaved q418
    // chains (forward weights ascending, independent reverse-draw
    // weights descending), concat exposed as hf/hb.
    "q428_bidi_lstm" -> q428BidiSql,

    // q429: the encoder block on the TRUE sinusoidal positional
    // encoding — sin/cos shipped as shared round-9 literals (the q423
    // recipe), the rest of the CTE chain identical to q421.
    "q429_transformer_sin_pe" -> q429TransformerSinSql,

    // q430: masked attention over short windows — NULL carries −inf
    // through the same score/softmax CTEs (COALESCE(EXP(...),0) weights,
    // NULL-skipping GREATEST shift in both engines), q from the last
    // valid position.
    "q430_masked_attention" -> q430MaskedAttnSql,

    // q431: the GRU cell replayed — torch gate semantics (b_hn INSIDE
    // the reset product), two CTEs per step (gates+hidden-side
    // pre-activation from the old h, then candidate+interpolation).
    "q431_gru_forward" -> q431GruSql,

    // q432: the two-layer stack replayed — layer 1 is q418's chain with
    // per-step snapshots, layer 2 the same gated recurrence over that
    // 2-dim sequence with its own literal bank.
    "q432_stacked_lstm" -> q432StackedLstmSql,

    // q433: the WHOLE HiveLSTM inference path replayed — input Linear +
    // LayerNorm CTEs, interleaved fwd/bwd recurrence with per-position
    // snapshots, pooling MLP/softmax/mix, output Linear+ReLU, head.
    "q433_hive_lstm_forward" -> q433HiveLstmSql,

    // q436: the WHOLE HiveMLP inference path replayed — the reference's
    // HEADLINE model (input Linear + LayerNorm, three residual blocks,
    // classification head + softmax); with q433/q434 all three models
    // now hash-check end to end.
    "q436_hive_mlp_forward" -> q436HiveMlpSql,

    // q437: weighted-cross-entropy trained trajectory under AdamW —
    // class weights computed IN SQL from the same counts, CE gradients
    // from the closed form w·(p − y), q426's exact-decimal state chains.
    "q437_ce_weighted_adamw" -> q437CeAdamwSql,

    // q438: dual-head MLP forward — shared trunk, simultaneous
    // regression output + classification logits in one plan.
    "q438_dual_head_mlp" -> q438DualHeadSql,

    // q439: the evaluate.py lifecycle as one plan — HiveMLP forward →
    // argmax/softmax → metric card + confusion matrix on a real holdout.
    "q439_evaluate_card" -> q439EvaluateCardSql,

    // q440/q441: DualHeadLSTM and DualHeadTransformer — the shared
    // trunks of q433/q434 emitting regression AND classification heads
    // simultaneously in one plan (the dual-head story now covers all
    // three reference model families).
    "q440_dual_head_lstm" -> q440DualHeadLstmSql,
    "q441_dual_head_transformer" -> q441DualHeadTransformerSql,

    // q434: the WHOLE HiveTransformer inference path replayed — CLS
    // embedding and its block-1 q/k/v folded to shared literals, the
    // full 9×9 two-head attention grid as CTE stages, post-norm
    // residuals, tanh-GELU (documented erf divergence), block 2 at the
    // CLS position, output Linear+GELU, head.
    "q434_hive_transformer" -> q434HiveTransformerSql,

    // q435: the packed-sequence LSTM replayed — q418's per-step CTEs
    // with CASE-guarded no-op updates past each sequence's true length
    // (torch pack_padded_sequence semantics without sort/pack/unpack).
    "q435_packed_lstm" -> q435PackedLstmSql,
  )

  protected def q425LstmTrainSql: String = {
    import graft.ml.SeqForward.{T, fmt, lstmTrainInit, lstmTrainIters, lstmTrainLr}
    val gateNames = Seq("i", "f", "o", "g")
    val pn = gateNames.flatMap(g => Seq(s"wx$g", s"wh$g", s"b$g"))
    val pList = pn.mkString(", ")
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val xs = (1 to T).map(j => s"x$j").mkString(", ")
    val scList = (0 until 12).map(i => s"sc$i").mkString(", ")
    val shList = (0 until 12).map(i => s"sh$i").mkString(", ")
    val scnList = (0 until 12).map(i => s"scn$i").mkString(", ")
    // per-θ gate derivative: gate′·(u_θ + wh_gate·sh_θ), u only in θ's
    // own gate — the same expression shape the Column side generates
    def dgate(g: Int, i: Int, t: Int): String = {
      val whCol = pn(3 * g + 1)
      val chain0 = s"$whCol * sh$i"
      val chain =
        if (i / 3 != g) chain0
        else i % 3 match {
          case 0 => s"x$t + $chain0"
          case 1 => s"hprev + $chain0"
          case 2 => s"1.0 + $chain0"
        }
      val gn = gateNames(g)
      g match {
        case 3 => s"(1.0 - gg * gg) * ($chain)"
        case _ => s"g$gn * (1.0 - g$gn) * ($chain)"
      }
    }
    val pivotXs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    val head =
      s"""WITH r AS (
         |  SELECT user_id,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
         |  FROM events),
         |p AS (
         |  SELECT user_id,
         |$pivotXs,
         |    MAX(CASE WHEN rn = ${T + 1} THEN x END) AS y
         |  FROM r WHERE rn <= ${T + 1}
         |  GROUP BY user_id HAVING COUNT(*) = ${T + 1}),
         |i1 AS (
         |  SELECT ${pn.zipWithIndex.map { case (nm, k) =>
        s"CAST(${fmt(lstmTrainInit(k))} AS DOUBLE) AS $nm" }
        .mkString(",\n    ")})
         |""".stripMargin
    val iters = (1 to lstmTrainIters).map { k =>
      val seed =
        s""",l${k}e0 AS (
           |  SELECT p.*, ${pn.map(nm => s"i.$nm").mkString(", ")},
           |    CAST(0.0 AS DOUBLE) AS h, CAST(0.0 AS DOUBLE) AS c,
           |    ${(0 until 12).map(i =>
          s"CAST(0.0 AS DOUBLE) AS sc$i, CAST(0.0 AS DOUBLE) AS sh$i")
          .mkString(",\n    ")}
           |  FROM p CROSS JOIN i$k i)
           |""".stripMargin
      val steps = (1 to T).map { t =>
        def a(g: Int): String =
          s"${pn(3 * g)} * x$t + ${pn(3 * g + 1)} * h + ${pn(3 * g + 2)}"
        val scnCols = (0 until 12).map(i =>
          s"    ROUND(gf * sc$i + cprev * ${dgate(1, i, t)} + " +
            s"gg * ${dgate(0, i, t)} + gi * ${dgate(3, i, t)}, 9) AS scn$i")
          .mkString(",\n")
        val shnCols = (0 until 12).map(i =>
          s"    ROUND(go * (1.0 - tc * tc) * scn$i + " +
            s"tc * ${dgate(2, i, t)}, 9) AS shn$i").mkString(",\n")
        val renames = (0 until 12).map(i =>
          s"scn$i AS sc$i, shn$i AS sh$i").mkString(", ")
        s""",l${k}a$t AS (
           |  SELECT user_id, $xs, y, $pList,
           |    ROUND(${sig(a(0))}, 9) AS gi,
           |    ROUND(${sig(a(1))}, 9) AS gf,
           |    ROUND(${sig(a(2))}, 9) AS go,
           |    ROUND(${tanh(a(3))}, 9) AS gg,
           |    h AS hprev, c AS cprev,
           |    $scList, $shList
           |  FROM l${k}e${t - 1}),
           |l${k}b$t AS (
           |  SELECT user_id, $xs, y, $pList, gi, gf, go, gg, hprev,
           |    ROUND(gf * cprev + gi * gg, 9) AS c,
           |$scnCols,
           |    $shList
           |  FROM l${k}a$t),
           |l${k}c$t AS (
           |  SELECT *, ROUND(${tanh("c")}, 9) AS tc FROM l${k}b$t),
           |l${k}d$t AS (
           |  SELECT user_id, $xs, y, $pList,
           |    ROUND(go * tc, 9) AS h, c,
           |$shnCols,
           |    $scnList
           |  FROM l${k}c$t),
           |l${k}e$t AS (
           |  SELECT user_id, $xs, y, $pList, h, c,
           |    $renames
           |  FROM l${k}d$t)
           |""".stripMargin
      }.mkString
      val gradAggs = (0 until 12).map(i =>
        s"    SUM(CAST((h - y) * sh$i AS DECIMAL(28,12))) AS a$i")
        .mkString(",\n")
      val clips = (0 until 12).map(i =>
        s"    GREATEST(-1.0, LEAST(1.0,\n" +
          s"      ROUND(CAST(a$i AS DOUBLE) * 2.0 / n, 9))) AS gr$i")
        .mkString(",\n")
      val updates = pn.zipWithIndex.map { case (nm, i) =>
        s"ROUND($nm - $lstmTrainLr * gr$i, 9) AS $nm" }.mkString(",\n    ")
      val traceCols = pn.mkString(", ") + ",\n    " +
        pn.zipWithIndex.map { case (nm, i) => s"gr$i AS g_$nm" }
          .mkString(", ")
      seed + steps +
      s""",ag$k AS (
         |  SELECT $pList, COUNT(*) AS n,
         |    SUM(CAST((h - y) * (h - y) AS DECIMAL(28,12))) AS see,
         |$gradAggs
         |  FROM l${k}e$T GROUP BY $pList),
         |gd$k AS (
         |  SELECT $pList, n, see,
         |$clips
         |  FROM ag$k),
         |i${k + 1} AS (
         |  SELECT $updates
         |  FROM gd$k),
         |t$k AS (
         |  SELECT $k AS iter, $traceCols,
         |    ROUND(CAST(see AS DOUBLE) / n, 6) + 0.0 AS mse
         |  FROM gd$k)
         |""".stripMargin
    }.mkString
    val union = (1 to lstmTrainIters).map(k => s"  SELECT * FROM t$k")
      .mkString("\n  UNION ALL\n")
    head + iters +
      s"""SELECT * FROM (
         |$union)
         |ORDER BY iter""".stripMargin
  }

  protected def q424MultiHeadSql: String = {
    import graft.ml.SeqForward.{T, fmt, mhParam, posEnc}
    val p = (0 to 39).map(mhParam)
    def emb(t: Int, d: Int): String =
      s"ROUND(${fmt(p(2 * d))} * x$t + ${fmt(p(2 * d + 1))} + " +
        s"${fmt(if (d == 0) posEnc(t)._1 else posEnc(t)._2)}, 9)"
    def proj(off: Int, t: Int, dd: Int): String =
      s"ROUND(${fmt(p(off + 2 * dd))} * e${t}_1 + " +
        s"${fmt(p(off + 2 * dd + 1))} * e${t}_2 + ${fmt(p(off + 4 + dd))}, 9)"
    val embCols = (1 to T).flatMap(t => Seq(
      s"    ${emb(t, 0)} AS e${t}_1", s"    ${emb(t, 1)} AS e${t}_2"))
      .mkString(",\n")
    val kvCols = (1 to T).flatMap(j => Seq(
      s"    ${proj(10, j, 0)} AS k${j}_1", s"    ${proj(10, j, 1)} AS k${j}_2",
      s"    ${proj(16, j, 0)} AS v${j}_1", s"    ${proj(16, j, 1)} AS v${j}_2"))
      .mkString(",\n")
    val vCarry = (1 to T).flatMap(j => Seq(s"v${j}_1", s"v${j}_2"))
      .mkString(", ")
    val sCols = (1 to 2).flatMap(h => (1 to T).map(j =>
      s"    q$h * k${j}_$h AS s${j}_$h")).mkString(",\n")
    val mCols = (1 to 2).map(h =>
      s"GREATEST(${(1 to T).map(j => s"s${j}_$h").mkString(", ")}) AS m$h")
      .mkString(", ")
    val wCols = (1 to 2).flatMap(h => (1 to T).map(j =>
      s"    EXP(s${j}_$h - m$h) AS w${j}_$h")).mkString(",\n")
    val wCarry = (1 to 2).flatMap(h => (1 to T).map(j => s"w${j}_$h"))
      .mkString(", ")
    val zCols = (1 to 2).map(h =>
      (1 to T).map(j => s"w${j}_$h").mkString(" + ") + s" AS z$h")
      .mkString(", ")
    val oCols = (1 to 2).map(h =>
      s"    ROUND((${(1 to T).map(j => s"w${j}_$h * v${j}_$h")
        .mkString(" + ")}) / z$h, 9) AS o$h").mkString(",\n")
    def outProj(dd: Int): String =
      s"ROUND(${fmt(p(22 + 2 * dd))} * o1 + ${fmt(p(23 + 2 * dd))} * o2 " +
        s"+ ${fmt(p(26 + dd))}, 9)"
    seqPivotCtes +
      s""",b1 AS (
         |  SELECT user_id,
         |$embCols
         |  FROM p),
         |b2 AS (
         |  SELECT user_id, e${T}_1, e${T}_2,
         |    ${proj(4, T, 0)} AS q1, ${proj(4, T, 1)} AS q2,
         |$kvCols
         |  FROM b1),
         |b3 AS (
         |  SELECT user_id, e${T}_1, e${T}_2, $vCarry,
         |$sCols
         |  FROM b2),
         |b4 AS (
         |  SELECT *, $mCols FROM b3),
         |b5 AS (
         |  SELECT user_id, e${T}_1, e${T}_2, $vCarry,
         |$wCols
         |  FROM b4),
         |b6 AS (
         |  SELECT *, $zCols FROM b5),
         |b7 AS (
         |  SELECT user_id, e${T}_1, e${T}_2,
         |$oCols
         |  FROM b6),
         |b8 AS (
         |  SELECT user_id, o1, o2,
         |    e${T}_1 + ${outProj(0)} AS r1,
         |    e${T}_2 + ${outProj(1)} AS r2
         |  FROM b7),
         |b9 AS (SELECT *, (r1 + r2) / 2.0 AS mu FROM b8),
         |b10 AS (
         |  SELECT *, ((r1 - mu) * (r1 - mu) + (r2 - mu) * (r2 - mu)) / 2.0
         |    AS va
         |  FROM b9),
         |b11 AS (
         |  SELECT user_id, o1, o2,
         |    ROUND((r1 - mu) / SQRT(va + 1e-6), 9) AS ln1,
         |    ROUND((r2 - mu) / SQRT(va + 1e-6), 9) AS ln2
         |  FROM b10),
         |b12 AS (
         |  SELECT user_id, o1, o2, ln1, ln2,
         |    GREATEST(0.0, ROUND(${fmt(p(28))} * ln1 + ${fmt(p(29))} * ln2
         |      + ${fmt(p(32))}, 9)) AS hd1,
         |    GREATEST(0.0, ROUND(${fmt(p(30))} * ln1 + ${fmt(p(31))} * ln2
         |      + ${fmt(p(33))}, 9)) AS hd2
         |  FROM b11)
         |SELECT user_id,
         |  ROUND(ln1 + ROUND(${fmt(p(34))} * hd1 + ${fmt(p(35))} * hd2
         |    + ${fmt(p(38))}, 9), 6) + 0.0 AS out1,
         |  ROUND(ln2 + ROUND(${fmt(p(36))} * hd1 + ${fmt(p(37))} * hd2
         |    + ${fmt(p(39))}, 9), 6) + 0.0 AS out2,
         |  ROUND(o1, 6) + 0.0 AS head1_out, ROUND(o2, 6) + 0.0 AS head2_out
         |FROM b12 ORDER BY user_id""".stripMargin
  }

  protected def q423LrScheduleSql: String = {
    import graft.ml.LrSchedule.{cosLr, fmt, maxEpochs, patience}
    val csRows = (1 to maxEpochs)
      .map(t => s"($t, ${fmt(cosLr(t))})").mkString(", ")
    val better = "h.loss < st.best * (1.0 - 0.0001)"
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n,
       |    CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS s,
       |    CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE) AS s2
       |  FROM events GROUP BY CAST(ts AS DATE)),
       |hist AS (
       |  SELECT epoch, ROUND((s2 - s * s / n) / n, 6) AS loss FROM (
       |    SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS INT) AS epoch,
       |      n, s, s2
       |    FROM daily)
       |  WHERE epoch <= $maxEpochs),
       |st(epoch, loss, lr, best, bad, is_decay) AS (
       |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.001 AS DOUBLE),
       |    CAST(1e300 AS DOUBLE), 0, 0
       |  UNION ALL
       |  SELECT h.epoch, h.loss,
       |    CASE WHEN NOT ($better) AND st.bad + 1 > $patience
       |      THEN st.lr * 0.5 ELSE st.lr END,
       |    CASE WHEN $better THEN h.loss ELSE st.best END,
       |    CASE WHEN $better THEN 0
       |         WHEN st.bad + 1 > $patience THEN 0
       |         ELSE st.bad + 1 END,
       |    CASE WHEN NOT ($better) AND st.bad + 1 > $patience
       |      THEN 1 ELSE 0 END
       |  FROM st JOIN hist h ON h.epoch = st.epoch + 1),
       |cs(epoch, lr_cosine) AS (VALUES $csRows)
       |SELECT st.epoch, st.loss AS val_loss, st.lr AS lr_plateau,
       |  st.bad AS bad_epochs, st.is_decay, cs.lr_cosine
       |FROM st JOIN cs ON cs.epoch = st.epoch
       |WHERE st.epoch >= 1
       |ORDER BY st.epoch""".stripMargin
  }

  protected def q421TransformerSql: String =
    transformerBlockSql(graft.ml.SeqForward.posEnc)

  /** q429: the SAME encoder block replayed with the reference's TRUE
    * sinusoidal positional encoding — sin/cos values shipped as shared
    * round-9 literals (the q423 cosine-annealing recipe), never
    * evaluated cross-engine. */
  protected def q429TransformerSinSql: String =
    transformerBlockSql(graft.ml.SeqForward.posEncSin)

  private def transformerBlockSql(pe: Int => (Double, Double)): String = {
    import graft.ml.SeqForward.{T, blockParam, fmt}
    val p = (0 to 40).map(blockParam)
    def emb(t: Int, d: Int): String =
      s"ROUND(${fmt(p(2 * d))} * x$t + ${fmt(p(2 * d + 1))} + " +
        s"${fmt(if (d == 0) pe(t)._1 else pe(t)._2)}, 9)"
    def proj(off: Int, t: Int, dd: Int): String =
      s"ROUND(${fmt(p(off + 2 * dd))} * e${t}_1 + " +
        s"${fmt(p(off + 2 * dd + 1))} * e${t}_2 + ${fmt(p(off + 4 + dd))}, 9)"
    val embCols = (1 to T).flatMap(t => Seq(
      s"    ${emb(t, 0)} AS e${t}_1", s"    ${emb(t, 1)} AS e${t}_2"))
      .mkString(",\n")
    val kvCols = (1 to T).flatMap(j => Seq(
      s"    ${proj(10, j, 0)} AS k${j}_1", s"    ${proj(10, j, 1)} AS k${j}_2",
      s"    ${proj(16, j, 0)} AS v${j}_1", s"    ${proj(16, j, 1)} AS v${j}_2"))
      .mkString(",\n")
    val vCarry = (1 to T).flatMap(j => Seq(s"v${j}_1", s"v${j}_2"))
      .mkString(", ")
    val sCols = (1 to T).map(j =>
      s"    (q1 * k${j}_1 + q2 * k${j}_2) * 0.707106781 AS s$j")
      .mkString(",\n")
    val sList = (1 to T).map(j => s"s$j").mkString(", ")
    val wCols = (1 to T).map(j => s"    EXP(s$j - m) AS w$j").mkString(",\n")
    val wList = (1 to T).map(j => s"w$j").mkString(", ")
    val zSum = (1 to T).map(j => s"w$j").mkString(" + ")
    def mix(dd: Int): String =
      (1 to T).map(j => s"w$j * v${j}_$dd").mkString(" + ")
    seqPivotCtes +
      s""",b1 AS (
         |  SELECT user_id,
         |$embCols
         |  FROM p),
         |b2 AS (
         |  SELECT user_id, e${T}_1, e${T}_2,
         |    ${proj(4, T, 0)} AS q1, ${proj(4, T, 1)} AS q2,
         |$kvCols
         |  FROM b1),
         |b3 AS (
         |  SELECT user_id, e${T}_1, e${T}_2, $vCarry,
         |$sCols
         |  FROM b2),
         |b4 AS (
         |  SELECT *, GREATEST($sList) AS m FROM b3),
         |b5 AS (
         |  SELECT user_id, e${T}_1, e${T}_2, $vCarry,
         |$wCols
         |  FROM b4),
         |b6 AS (
         |  SELECT *, $zSum AS z FROM b5),
         |b7 AS (
         |  SELECT user_id,
         |    e${T}_1 + (${mix(1)}) / z AS r1,
         |    e${T}_2 + (${mix(2)}) / z AS r2
         |  FROM b6),
         |b8 AS (SELECT *, (r1 + r2) / 2.0 AS mu FROM b7),
         |b9 AS (
         |  SELECT *, ((r1 - mu) * (r1 - mu) + (r2 - mu) * (r2 - mu)) / 2.0
         |    AS va
         |  FROM b8),
         |b10 AS (
         |  SELECT user_id,
         |    ROUND((r1 - mu) / SQRT(va + 1e-6), 9) AS ln1,
         |    ROUND((r2 - mu) / SQRT(va + 1e-6), 9) AS ln2
         |  FROM b9),
         |b11 AS (
         |  SELECT user_id, ln1, ln2,
         |    GREATEST(0.0, ROUND(${fmt(p(22))} * ln1 + ${fmt(p(23))} * ln2
         |      + ${fmt(p(26))}, 9)) AS hd1,
         |    GREATEST(0.0, ROUND(${fmt(p(24))} * ln1 + ${fmt(p(25))} * ln2
         |      + ${fmt(p(27))}, 9)) AS hd2
         |  FROM b10)
         |SELECT user_id,
         |  ROUND(ln1 + ROUND(${fmt(p(28))} * hd1 + ${fmt(p(29))} * hd2
         |    + ${fmt(p(32))}, 9), 6) + 0.0 AS out1,
         |  ROUND(ln2 + ROUND(${fmt(p(30))} * hd1 + ${fmt(p(31))} * hd2
         |    + ${fmt(p(33))}, 9), 6) + 0.0 AS out2,
         |  ROUND(ln1, 6) + 0.0 AS ln1, ROUND(ln2, 6) + 0.0 AS ln2
         |FROM b11 ORDER BY user_id""".stripMargin
  }

  protected def q420RnnSql: String = {
    import graft.ml.SeqForward.{T, fmt, rnnInit, rnnIters, rnnLr}
    val xs = (1 to T).map(j => s"x$j").mkString(", ")
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val pivotXs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    val head =
      s"""WITH r AS (
         |  SELECT user_id,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
         |  FROM events),
         |p AS (
         |  SELECT user_id,
         |$pivotXs,
         |    MAX(CASE WHEN rn = ${T + 1} THEN x END) AS y
         |  FROM r WHERE rn <= ${T + 1}
         |  GROUP BY user_id HAVING COUNT(*) = ${T + 1}),
         |i1 AS (
         |  SELECT CAST(${fmt(rnnInit(0))} AS DOUBLE) AS wx,
         |    CAST(${fmt(rnnInit(1))} AS DOUBLE) AS wh,
         |    CAST(${fmt(rnnInit(2))} AS DOUBLE) AS b)
         |""".stripMargin
    val iters = (1 to rnnIters).map { k =>
      // three stages per step so NO select list both reads and redefines
      // a name (h-stage: fresh hn/hprev; g-stage: fresh sxn/shn/sbn;
      // s-stage: pure rename back to the step-invariant names) — lateral
      // alias shadowing is a dialect-resolution dependency worth avoiding
      val fwd = (1 to T).map { t =>
        s""",f${k}h$t AS (
           |  SELECT user_id, $xs, y, wx, wh, b, sx, sh, sb,
           |    h AS hprev,
           |    ROUND(${tanh(s"wx * x$t + wh * h + b")}, 9) AS hn
           |  FROM f${k}s${t - 1}),
           |f${k}g$t AS (
           |  SELECT user_id, $xs, y, wx, wh, b, hn,
           |    ROUND((1.0 - hn * hn) * (x$t + wh * sx), 9) AS sxn,
           |    ROUND((1.0 - hn * hn) * (hprev + wh * sh), 9) AS shn,
           |    ROUND((1.0 - hn * hn) * (1.0 + wh * sb), 9) AS sbn
           |  FROM f${k}h$t),
           |f${k}s$t AS (
           |  SELECT user_id, $xs, y, wx, wh, b, hn AS h,
           |    sxn AS sx, shn AS sh, sbn AS sb
           |  FROM f${k}g$t)
           |""".stripMargin
      }.mkString
      s""",f${k}s0 AS (
         |  SELECT p.*, i.wx, i.wh, i.b,
         |    CAST(0.0 AS DOUBLE) AS h, CAST(0.0 AS DOUBLE) AS sx,
         |    CAST(0.0 AS DOUBLE) AS sh, CAST(0.0 AS DOUBLE) AS sb
         |  FROM p CROSS JOIN i$k i)
         |""".stripMargin + fwd +
      s""",a$k AS (
         |  SELECT wx, wh, b, COUNT(*) AS n,
         |    SUM(CAST((h - y) * (h - y) AS DECIMAL(28,12))) AS see,
         |    SUM(CAST((h - y) * sx AS DECIMAL(28,12))) AS sgx,
         |    SUM(CAST((h - y) * sh AS DECIMAL(28,12))) AS sgh,
         |    SUM(CAST((h - y) * sb AS DECIMAL(28,12))) AS sgb
         |  FROM f${k}s$T GROUP BY wx, wh, b),
         |g$k AS (
         |  SELECT wx, wh, b, n, see,
         |    GREATEST(-1.0, LEAST(1.0,
         |      ROUND(CAST(sgx AS DOUBLE) * 2.0 / n, 9))) AS gx,
         |    GREATEST(-1.0, LEAST(1.0,
         |      ROUND(CAST(sgh AS DOUBLE) * 2.0 / n, 9))) AS gh,
         |    GREATEST(-1.0, LEAST(1.0,
         |      ROUND(CAST(sgb AS DOUBLE) * 2.0 / n, 9))) AS gb
         |  FROM a$k),
         |i${k + 1} AS (
         |  SELECT ROUND(wx - $rnnLr * gx, 9) AS wx,
         |    ROUND(wh - $rnnLr * gh, 9) AS wh,
         |    ROUND(b - $rnnLr * gb, 9) AS b
         |  FROM g$k),
         |t$k AS (
         |  SELECT $k AS iter, wx + 0.0 AS wx, wh + 0.0 AS wh, b + 0.0 AS b,
         |    gx + 0.0 AS grad_wx, gh + 0.0 AS grad_wh, gb + 0.0 AS grad_b,
         |    ROUND(CAST(see AS DOUBLE) / n, 6) + 0.0 AS mse
         |  FROM g$k)
         |""".stripMargin
    }.mkString
    val union = (1 to rnnIters).map(k => s"  SELECT * FROM t$k")
      .mkString("\n  UNION ALL\n")
    head + iters +
      s"""SELECT * FROM (
         |$union)
         |ORDER BY iter""".stripMargin
  }

  protected def q426AdamwSql: String = {
    import graft.ml.SeqForward.{T, fmt, rnnInit, rnnIters, adamLr,
      adamBeta1, adamBeta2, adamEps, adamWd, adamBc1, adamBc2}
    val xs = (1 to T).map(j => s"x$j").mkString(", ")
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val pivotXs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    val (b1, b2) = (fmt(adamBeta1), fmt(adamBeta2))
    val (lr, wd, eps) = (fmt(adamLr), fmt(adamWd), fmt(adamEps))
    val head =
      s"""WITH r AS (
         |  SELECT user_id,
         |    ROW_NUMBER() OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS rn,
         |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
         |  FROM events),
         |p AS (
         |  SELECT user_id,
         |$pivotXs,
         |    MAX(CASE WHEN rn = ${T + 1} THEN x END) AS y
         |  FROM r WHERE rn <= ${T + 1}
         |  GROUP BY user_id HAVING COUNT(*) = ${T + 1}),
         |i1 AS (
         |  SELECT CAST(${fmt(rnnInit(0))} AS DOUBLE) AS wx,
         |    CAST(${fmt(rnnInit(1))} AS DOUBLE) AS wh,
         |    CAST(${fmt(rnnInit(2))} AS DOUBLE) AS b,
         |    CAST(0.0 AS DOUBLE) AS mx, CAST(0.0 AS DOUBLE) AS mh,
         |    CAST(0.0 AS DOUBLE) AS mb, CAST(0.0 AS DOUBLE) AS vx,
         |    CAST(0.0 AS DOUBLE) AS vh, CAST(0.0 AS DOUBLE) AS vb)
         |""".stripMargin
    val iters = (1 to rnnIters).map { k =>
      // the q420 forward+RTRL CTE chain verbatim (gradients are shared by
      // construction); the optimizer state stays in the 1-row i$k and
      // re-joins at the update stage — moments never ride the data frame
      val fwd = (1 to T).map { t =>
        s""",f${k}h$t AS (
           |  SELECT user_id, $xs, y, wx, wh, b, sx, sh, sb,
           |    h AS hprev,
           |    ROUND(${tanh(s"wx * x$t + wh * h + b")}, 9) AS hn
           |  FROM f${k}s${t - 1}),
           |f${k}g$t AS (
           |  SELECT user_id, $xs, y, wx, wh, b, hn,
           |    ROUND((1.0 - hn * hn) * (x$t + wh * sx), 9) AS sxn,
           |    ROUND((1.0 - hn * hn) * (hprev + wh * sh), 9) AS shn,
           |    ROUND((1.0 - hn * hn) * (1.0 + wh * sb), 9) AS sbn
           |  FROM f${k}h$t),
           |f${k}s$t AS (
           |  SELECT user_id, $xs, y, wx, wh, b, hn AS h,
           |    sxn AS sx, shn AS sh, sbn AS sb
           |  FROM f${k}g$t)
           |""".stripMargin
      }.mkString
      s""",f${k}s0 AS (
         |  SELECT p.*, i.wx, i.wh, i.b,
         |    CAST(0.0 AS DOUBLE) AS h, CAST(0.0 AS DOUBLE) AS sx,
         |    CAST(0.0 AS DOUBLE) AS sh, CAST(0.0 AS DOUBLE) AS sb
         |  FROM p CROSS JOIN i$k i)
         |""".stripMargin + fwd +
      s""",a$k AS (
         |  SELECT wx, wh, b, COUNT(*) AS n,
         |    SUM(CAST((h - y) * (h - y) AS DECIMAL(28,12))) AS see,
         |    SUM(CAST((h - y) * sx AS DECIMAL(28,12))) AS sgx,
         |    SUM(CAST((h - y) * sh AS DECIMAL(28,12))) AS sgh,
         |    SUM(CAST((h - y) * sb AS DECIMAL(28,12))) AS sgb
         |  FROM f${k}s$T GROUP BY wx, wh, b),
         |g$k AS (
         |  SELECT wx, wh, b, n, see,
         |    GREATEST(-1.0, LEAST(1.0,
         |      ROUND(CAST(sgx AS DOUBLE) * 2.0 / n, 9))) AS gx,
         |    GREATEST(-1.0, LEAST(1.0,
         |      ROUND(CAST(sgh AS DOUBLE) * 2.0 / n, 9))) AS gh,
         |    GREATEST(-1.0, LEAST(1.0,
         |      ROUND(CAST(sgb AS DOUBLE) * 2.0 / n, 9))) AS gb
         |  FROM a$k),
         |m$k AS (
         |  -- the m/v state chains update in EXACT decimal (inputs are
         |  -- 9-dec values, coefficients exact decimals): HALF_UP ties
         |  -- are well-defined and match the engine's BigDecimal fold —
         |  -- a double-side ROUND here breaks on true ties (0.1*g =
         |  -- 0.0080679525 hit one at the sf0.01 gate)
         |  SELECT g.*,
         |    CAST(ROUND($b1 * CAST(i.mx AS DECIMAL(12,9)) +
         |      (1.0 - $b1) * CAST(g.gx AS DECIMAL(12,9)), 9) AS DOUBLE)
         |      AS mxn,
         |    CAST(ROUND($b1 * CAST(i.mh AS DECIMAL(12,9)) +
         |      (1.0 - $b1) * CAST(g.gh AS DECIMAL(12,9)), 9) AS DOUBLE)
         |      AS mhn,
         |    CAST(ROUND($b1 * CAST(i.mb AS DECIMAL(12,9)) +
         |      (1.0 - $b1) * CAST(g.gb AS DECIMAL(12,9)), 9) AS DOUBLE)
         |      AS mbn,
         |    CAST(ROUND($b2 * CAST(i.vx AS DECIMAL(12,9)) +
         |      (1.0 - $b2) * CAST(g.gx AS DECIMAL(12,9)) *
         |      CAST(g.gx AS DECIMAL(12,9)), 9) AS DOUBLE) AS vxn,
         |    CAST(ROUND($b2 * CAST(i.vh AS DECIMAL(12,9)) +
         |      (1.0 - $b2) * CAST(g.gh AS DECIMAL(12,9)) *
         |      CAST(g.gh AS DECIMAL(12,9)), 9) AS DOUBLE) AS vhn,
         |    CAST(ROUND($b2 * CAST(i.vb AS DECIMAL(12,9)) +
         |      (1.0 - $b2) * CAST(g.gb AS DECIMAL(12,9)) *
         |      CAST(g.gb AS DECIMAL(12,9)), 9) AS DOUBLE) AS vbn
         |  FROM g$k g CROSS JOIN i$k i),
         |h$k AS (
         |  SELECT m.*,
         |    ROUND(mxn / ${fmt(adamBc1(k))}, 9) AS mhatx,
         |    ROUND(mhn / ${fmt(adamBc1(k))}, 9) AS mhath,
         |    ROUND(mbn / ${fmt(adamBc1(k))}, 9) AS mhatb,
         |    ROUND(vxn / ${fmt(adamBc2(k))}, 9) AS vhatx,
         |    ROUND(vhn / ${fmt(adamBc2(k))}, 9) AS vhath,
         |    ROUND(vbn / ${fmt(adamBc2(k))}, 9) AS vhatb
         |  FROM m$k m),
         |s$k AS (
         |  SELECT h.*,
         |    ROUND(mhatx / (SQRT(vhatx) + $eps), 9) AS stx,
         |    ROUND(mhath / (SQRT(vhath) + $eps), 9) AS sth,
         |    ROUND(mhatb / (SQRT(vhatb) + $eps), 9) AS stb
         |  FROM h$k h),
         |i${k + 1} AS (
         |  -- exact-decimal theta chain, same tie-proofing as m$k
         |  SELECT CAST(ROUND(CAST(wx AS DECIMAL(12,9)) * (1.0 - $lr * $wd)
         |      - $lr * CAST(stx AS DECIMAL(12,9)), 9) AS DOUBLE) AS wx,
         |    CAST(ROUND(CAST(wh AS DECIMAL(12,9)) * (1.0 - $lr * $wd)
         |      - $lr * CAST(sth AS DECIMAL(12,9)), 9) AS DOUBLE) AS wh,
         |    CAST(ROUND(CAST(b AS DECIMAL(12,9)) * (1.0 - $lr * $wd)
         |      - $lr * CAST(stb AS DECIMAL(12,9)), 9) AS DOUBLE) AS b,
         |    mxn AS mx, mhn AS mh, mbn AS mb,
         |    vxn AS vx, vhn AS vh, vbn AS vb
         |  FROM s$k),
         |t$k AS (
         |  SELECT $k AS iter, wx + 0.0 AS wx, wh + 0.0 AS wh, b + 0.0 AS b,
         |    gx + 0.0 AS grad_wx, gh + 0.0 AS grad_wh, gb + 0.0 AS grad_b,
         |    mxn + 0.0 AS m_wx, mhn + 0.0 AS m_wh, mbn + 0.0 AS m_b,
         |    vxn + 0.0 AS v_wx, vhn + 0.0 AS v_wh, vbn + 0.0 AS v_b,
         |    ROUND(CAST(see AS DOUBLE) / n, 6) + 0.0 AS mse
         |  FROM s$k)
         |""".stripMargin
    }.mkString
    val union = (1 to rnnIters).map(k => s"  SELECT * FROM t$k")
      .mkString("\n  UNION ALL\n")
    head + iters +
      s"""SELECT * FROM (
         |$union)
         |ORDER BY iter""".stripMargin
  }

  /** Shared sequence-pivot prelude for q418/q419: per-user rank by
    * (ts, event_id), first T values normalized round-9, full windows only.
    */
  private def seqPivotCtes: String = {
    val T = graft.ml.SeqForward.T
    val xs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    s"""WITH r AS (
       |  SELECT user_id,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn,
       |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
       |  FROM events),
       |p AS (
       |  SELECT user_id,
       |$xs
       |  FROM r WHERE rn <= $T
       |  GROUP BY user_id HAVING COUNT(*) = $T)
       |""".stripMargin
  }

  protected def q418LstmSql: String = {
    import graft.ml.SeqForward.{H, T, fmt, lstmParam}
    def gate(g: Int, u: Int, t: Int): String =
      s"${fmt(lstmParam(g, u, 0))} * x$t + ${fmt(lstmParam(g, u, 1))} * h1" +
        s" + ${fmt(lstmParam(g, u, 2))} * h2 + ${fmt(lstmParam(g, u, 3))}"
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    val steps = (1 to T).map { t =>
      val cNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate(1, u, t))} * c${u + 1} + " +
          s"${sig(gate(0, u, t))} * ${tanh(gate(3, u, t))}, 9) AS c${u + 1}"
      }.mkString(",\n")
      val hNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate(2, u, t))} * ${tanh(s"c${u + 1}")}, 9)" +
          s" AS h${u + 1}"
      }.mkString(",\n")
      // two CTEs per step: the cell update reads the OLD h, the hidden
      // update reads the NEW c — same staging as the Column expressions
      s""",c$t AS (
         |  SELECT user_id, $xs, h1, h2,
         |$cNew
         |  FROM s${t - 1}),
         |s$t AS (
         |  SELECT user_id, $xs, c1, c2,
         |$hNew
         |  FROM c$t)
         |""".stripMargin
    }.mkString
    seqPivotCtes +
      s""",s0 AS (
         |  SELECT user_id, $xs,
         |    CAST(0.0 AS DOUBLE) AS h1, CAST(0.0 AS DOUBLE) AS h2,
         |    CAST(0.0 AS DOUBLE) AS c1, CAST(0.0 AS DOUBLE) AS c2
         |  FROM p)
         |""".stripMargin + steps +
      s"""SELECT user_id,
         |  ROUND(h1, 6) + 0.0 AS h1, ROUND(h2, 6) + 0.0 AS h2,
         |  ROUND(c1, 6) + 0.0 AS c1, ROUND(c2, 6) + 0.0 AS c2
         |FROM s$T ORDER BY user_id""".stripMargin
  }

  protected def q419AttentionSql: String = {
    import graft.ml.SeqForward.{T, attnParam, fmt}
    val (wq, bq) = (fmt(attnParam(0)), fmt(attnParam(1)))
    val (wk, bk) = (fmt(attnParam(2)), fmt(attnParam(3)))
    val (wv, bv) = (fmt(attnParam(4)), fmt(attnParam(5)))
    val kvs = (1 to T).map(j =>
      s"    ROUND($wk * x$j + $bk, 9) AS k$j," +
        s" ROUND($wv * x$j + $bv, 9) AS v$j").mkString(",\n")
    val ss = (1 to T).map(j => s"    q * k$j * 4.0 AS s$j").mkString(",\n")
    val ws = (1 to T).map(j => s"    EXP(s$j - m) AS w$j").mkString(",\n")
    val svCarry = (1 to T).map(j => s"s$j").mkString(", ")
    val vCarry = (1 to T).map(j => s"v$j").mkString(", ")
    val zSum = (1 to T).map(j => s"w$j").mkString(" + ")
    val outSum = (1 to T).map(j => s"w$j * v$j").mkString(" + ")
    val entSum = (1 to T).map(j =>
      s"(w$j / z) * (LN(z) - (s$j - m))").mkString(" + ")
    seqPivotCtes +
      s""",a1 AS (
         |  SELECT user_id, ROUND($wq * x$T + $bq, 9) AS q,
         |$kvs
         |  FROM p),
         |a2 AS (
         |  SELECT user_id, $vCarry,
         |$ss
         |  FROM a1),
         |a3 AS (
         |  SELECT *, GREATEST(${(1 to T).map(j => s"s$j").mkString(", ")}) AS m
         |  FROM a2),
         |a4 AS (
         |  SELECT user_id, $vCarry, $svCarry, m,
         |$ws
         |  FROM a3),
         |a5 AS (SELECT *, $zSum AS z FROM a4)
         |SELECT user_id,
         |  ROUND(($outSum) / z, 6) + 0.0 AS attn_out,
         |  ROUND($entSum, 6) + 0.0 AS attn_entropy
         |FROM a5 ORDER BY user_id""".stripMargin
  }

  protected def q427PoolingSql: String = {
    import graft.ml.SeqForward.{H, T, fmt, lstmParam, poolParam}
    def gate(g: Int, u: Int, t: Int): String =
      s"${fmt(lstmParam(g, u, 0))} * x$t + ${fmt(lstmParam(g, u, 1))} * h1" +
        s" + ${fmt(lstmParam(g, u, 2))} * h2 + ${fmt(lstmParam(g, u, 3))}"
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val (a1p, a2p, b1p, w2p, b2p) = (fmt(poolParam(0)), fmt(poolParam(1)),
      fmt(poolParam(2)), fmt(poolParam(3)), fmt(poolParam(4)))
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    def hist(upTo: Int): String = (1 to upTo)
      .flatMap(t => Seq(s"ht${t}_1", s"ht${t}_2")) match {
      case Seq() => ""
      case cols => cols.mkString(", ", ", ", "")
    }
    // the q418 two-CTEs-per-step chain, with each step's hidden state
    // SNAPSHOTTED into ht{t}_d columns (the hidden CTE also aliases hn)
    val steps = (1 to T).map { t =>
      val cNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate(1, u, t))} * c${u + 1} + " +
          s"${sig(gate(0, u, t))} * ${tanh(gate(3, u, t))}, 9) AS c${u + 1}"
      }.mkString(",\n")
      val hNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate(2, u, t))} * ${tanh(s"c${u + 1}")}, 9)" +
          s" AS h${u + 1}"
      }.mkString(",\n")
      val src = if (t == 1) "s0" else s"n${t - 1}"
      s""",c$t AS (
         |  SELECT user_id, $xs, h1, h2${hist(t - 1)},
         |$cNew
         |  FROM $src),
         |s$t AS (
         |  SELECT user_id, $xs, c1, c2${hist(t - 1)},
         |$hNew
         |  FROM c$t),
         |n$t AS (
         |  SELECT *, h1 AS ht${t}_1, h2 AS ht${t}_2 FROM s$t)
         |""".stripMargin
    }.mkString
    val histAll = (1 to T).flatMap(t => Seq(s"ht${t}_1", s"ht${t}_2"))
      .mkString(", ")
    val uCols = (1 to T).map(t =>
      s"    ROUND($a1p * ht${t}_1 + $a2p * ht${t}_2 + $b1p, 9) AS u$t")
      .mkString(",\n")
    val sCols = (1 to T).map(t =>
      s"    ROUND($w2p * ${tanh(s"u$t")} + $b2p, 9) AS sc$t").mkString(",\n")
    val eCols = (1 to T).map(t => s"    EXP(sc$t - m) AS e$t").mkString(",\n")
    val zSum = (1 to T).map(t => s"e$t").mkString(" + ")
    def mix(dd: Int): String =
      (1 to T).map(t => s"e$t * ht${t}_$dd").mkString(" + ")
    val wOut = (1 to T).map(t =>
      s"  ROUND(e$t / z, 6) + 0.0 AS w$t").mkString(",\n")
    seqPivotCtes +
      s""",s0 AS (
         |  SELECT user_id, $xs,
         |    CAST(0.0 AS DOUBLE) AS h1, CAST(0.0 AS DOUBLE) AS h2,
         |    CAST(0.0 AS DOUBLE) AS c1, CAST(0.0 AS DOUBLE) AS c2
         |  FROM p)
         |""".stripMargin + steps +
      s""",p1 AS (
         |  SELECT user_id, $histAll,
         |$uCols
         |  FROM n$T),
         |p2 AS (
         |  SELECT user_id, $histAll,
         |$sCols
         |  FROM p1),
         |p3 AS (
         |  SELECT *, GREATEST(${(1 to T).map(t => s"sc$t").mkString(", ")})
         |    AS m
         |  FROM p2),
         |p4 AS (
         |  SELECT user_id, $histAll,
         |$eCols
         |  FROM p3),
         |p5 AS (SELECT *, $zSum AS z FROM p4)
         |SELECT user_id,
         |  ROUND((${mix(1)}) / z, 6) + 0.0 AS pooled1,
         |  ROUND((${mix(2)}) / z, 6) + 0.0 AS pooled2,
         |$wOut
         |FROM p5 ORDER BY user_id""".stripMargin
  }

  protected def q428BidiSql: String = {
    import graft.ml.SeqForward.{H, T, fmt, lstmParam, lstmParamRev}
    def gate(pf: (Int, Int, Int) => Double, pre: String, g: Int, u: Int,
        t: Int): String =
      s"${fmt(pf(g, u, 0))} * x$t + ${fmt(pf(g, u, 1))} * ${pre}h1" +
        s" + ${fmt(pf(g, u, 2))} * ${pre}h2 + ${fmt(pf(g, u, 3))}"
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    val steps = (1 to T).map { s =>
      val (tf, tb) = (s, T + 1 - s)
      val cNew = ((0 until H).map { u =>
        s"    ROUND(${sig(gate(lstmParam, "f", 1, u, tf))} * fc${u + 1} + " +
          s"${sig(gate(lstmParam, "f", 0, u, tf))} * " +
          s"${tanh(gate(lstmParam, "f", 3, u, tf))}, 9) AS fc${u + 1}"
      } ++ (0 until H).map { u =>
        s"    ROUND(${sig(gate(lstmParamRev, "b", 1, u, tb))} * bc${u + 1} + " +
          s"${sig(gate(lstmParamRev, "b", 0, u, tb))} * " +
          s"${tanh(gate(lstmParamRev, "b", 3, u, tb))}, 9) AS bc${u + 1}"
      }).mkString(",\n")
      val hNew = ((0 until H).map { u =>
        s"    ROUND(${sig(gate(lstmParam, "f", 2, u, tf))} * " +
          s"${tanh(s"fc${u + 1}")}, 9) AS fh${u + 1}"
      } ++ (0 until H).map { u =>
        s"    ROUND(${sig(gate(lstmParamRev, "b", 2, u, tb))} * " +
          s"${tanh(s"bc${u + 1}")}, 9) AS bh${u + 1}"
      }).mkString(",\n")
      s""",c$s AS (
         |  SELECT user_id, $xs, fh1, fh2, bh1, bh2,
         |$cNew
         |  FROM s${s - 1}),
         |s$s AS (
         |  SELECT user_id, $xs, fc1, fc2, bc1, bc2,
         |$hNew
         |  FROM c$s)
         |""".stripMargin
    }.mkString
    seqPivotCtes +
      s""",s0 AS (
         |  SELECT user_id, $xs,
         |    CAST(0.0 AS DOUBLE) AS fh1, CAST(0.0 AS DOUBLE) AS fh2,
         |    CAST(0.0 AS DOUBLE) AS fc1, CAST(0.0 AS DOUBLE) AS fc2,
         |    CAST(0.0 AS DOUBLE) AS bh1, CAST(0.0 AS DOUBLE) AS bh2,
         |    CAST(0.0 AS DOUBLE) AS bc1, CAST(0.0 AS DOUBLE) AS bc2
         |  FROM p)
         |""".stripMargin + steps +
      s"""SELECT user_id,
         |  ROUND(fh1, 6) + 0.0 AS hf1, ROUND(fh2, 6) + 0.0 AS hf2,
         |  ROUND(bh1, 6) + 0.0 AS hb1, ROUND(bh2, 6) + 0.0 AS hb2
         |FROM s$T ORDER BY user_id""".stripMargin
  }

  protected def q431GruSql: String = {
    import graft.ml.SeqForward.{H, T, fmt, gruParam}
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    def inSide(g: Int, u: Int, t: Int): String =
      s"${fmt(gruParam(g, u, 0))} * x$t + ${fmt(gruParam(g, u, 3))}"
    def hidSide(g: Int, u: Int): String =
      s"${fmt(gruParam(g, u, 1))} * h1 + ${fmt(gruParam(g, u, 2))} * h2" +
        s" + ${fmt(gruParam(g, u, 4))}"
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    val steps = (1 to T).map { t =>
      val gates = (0 until H).flatMap { u =>
        Seq(
          s"    ROUND(${sig(s"${inSide(0, u, t)} + ${hidSide(0, u)}")}, 9)" +
            s" AS r${u + 1}",
          s"    ROUND(${sig(s"${inSide(1, u, t)} + ${hidSide(1, u)}")}, 9)" +
            s" AS z${u + 1}",
          s"    ROUND(${hidSide(2, u)}, 9) AS p${u + 1}")
      }.mkString(",\n")
      val hNew = (0 until H).map { u =>
        s"    ROUND((1.0 - z${u + 1}) * " +
          s"${tanh(s"${inSide(2, u, t)} + r${u + 1} * p${u + 1}")} + " +
          s"z${u + 1} * hprev${u + 1}, 9) AS h${u + 1}"
      }.mkString(",\n")
      s""",g$t AS (
         |  SELECT user_id, $xs, h1 AS hprev1, h2 AS hprev2,
         |$gates
         |  FROM s${t - 1}),
         |s$t AS (
         |  SELECT user_id, $xs,
         |$hNew
         |  FROM g$t)
         |""".stripMargin
    }.mkString
    seqPivotCtes +
      s""",s0 AS (
         |  SELECT user_id, $xs,
         |    CAST(0.0 AS DOUBLE) AS h1, CAST(0.0 AS DOUBLE) AS h2
         |  FROM p)
         |""".stripMargin + steps +
      s"""SELECT user_id,
         |  ROUND(h1, 6) + 0.0 AS h1, ROUND(h2, 6) + 0.0 AS h2
         |FROM s$T ORDER BY user_id""".stripMargin
  }

  protected def q432StackedLstmSql: String = {
    import graft.ml.SeqForward.{H, T, fmt, lstmParam, lstm2Param}
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    def gate1(g: Int, u: Int, t: Int): String =
      s"${fmt(lstmParam(g, u, 0))} * x$t + ${fmt(lstmParam(g, u, 1))} * h1" +
        s" + ${fmt(lstmParam(g, u, 2))} * h2 + ${fmt(lstmParam(g, u, 3))}"
    def gate2(g: Int, u: Int, t: Int): String =
      s"${fmt(lstm2Param(g, u, 0))} * ht${t}_1 + " +
        s"${fmt(lstm2Param(g, u, 1))} * ht${t}_2 + " +
        s"${fmt(lstm2Param(g, u, 2))} * hh1 + " +
        s"${fmt(lstm2Param(g, u, 3))} * hh2 + ${fmt(lstm2Param(g, u, 4))}"
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    def hist(upTo: Int): String = (1 to upTo)
      .flatMap(t => Seq(s"ht${t}_1", s"ht${t}_2")) match {
      case Seq() => ""
      case cols => cols.mkString(", ", ", ", "")
    }
    val l1 = (1 to T).map { t =>
      val cNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate1(1, u, t))} * c${u + 1} + " +
          s"${sig(gate1(0, u, t))} * ${tanh(gate1(3, u, t))}, 9) AS c${u + 1}"
      }.mkString(",\n")
      val hNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate1(2, u, t))} * ${tanh(s"c${u + 1}")}, 9)" +
          s" AS h${u + 1}"
      }.mkString(",\n")
      val src = if (t == 1) "s0" else s"n${t - 1}"
      s""",c$t AS (
         |  SELECT user_id, $xs, h1, h2${hist(t - 1)},
         |$cNew
         |  FROM $src),
         |s$t AS (
         |  SELECT user_id, $xs, c1, c2${hist(t - 1)},
         |$hNew
         |  FROM c$t),
         |n$t AS (
         |  SELECT *, h1 AS ht${t}_1, h2 AS ht${t}_2 FROM s$t)
         |""".stripMargin
    }.mkString
    val histAll = (1 to T).flatMap(t => Seq(s"ht${t}_1", s"ht${t}_2"))
      .mkString(", ")
    val l2 = (1 to T).map { t =>
      val cNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate2(1, u, t))} * cc${u + 1} + " +
          s"${sig(gate2(0, u, t))} * ${tanh(gate2(3, u, t))}, 9)" +
          s" AS cc${u + 1}"
      }.mkString(",\n")
      val hNew = (0 until H).map { u =>
        s"    ROUND(${sig(gate2(2, u, t))} * ${tanh(s"cc${u + 1}")}, 9)" +
          s" AS hh${u + 1}"
      }.mkString(",\n")
      s""",d$t AS (
         |  SELECT user_id, l1_h1, l1_h2, $histAll, hh1, hh2,
         |$cNew
         |  FROM t${t - 1}),
         |t$t AS (
         |  SELECT user_id, l1_h1, l1_h2, $histAll, cc1, cc2,
         |$hNew
         |  FROM d$t)
         |""".stripMargin
    }.mkString
    seqPivotCtes +
      s""",s0 AS (
         |  SELECT user_id, $xs,
         |    CAST(0.0 AS DOUBLE) AS h1, CAST(0.0 AS DOUBLE) AS h2,
         |    CAST(0.0 AS DOUBLE) AS c1, CAST(0.0 AS DOUBLE) AS c2
         |  FROM p)
         |""".stripMargin + l1 +
      s""",t0 AS (
         |  SELECT user_id, h1 AS l1_h1, h2 AS l1_h2, $histAll,
         |    CAST(0.0 AS DOUBLE) AS hh1, CAST(0.0 AS DOUBLE) AS hh2,
         |    CAST(0.0 AS DOUBLE) AS cc1, CAST(0.0 AS DOUBLE) AS cc2
         |  FROM n$T)
         |""".stripMargin + l2 +
      s"""SELECT user_id,
         |  ROUND(hh1, 6) + 0.0 AS l2_h1, ROUND(hh2, 6) + 0.0 AS l2_h2,
         |  ROUND(l1_h1, 6) + 0.0 AS l1_h1, ROUND(l1_h2, 6) + 0.0 AS l1_h2
         |FROM t$T ORDER BY user_id""".stripMargin
  }

  protected def q433HiveLstmSql: String = hiveLstmSql(dual = false)
  protected def q440DualHeadLstmSql: String = hiveLstmSql(dual = true)

  /** Whole-HiveLSTM CTE chain; `dual = true` swaps the regression-only
    * head for DualHeadLSTM's simultaneous reg + cls heads on the shared
    * projection (`lstm.py:289-298`).
    */
  private def hiveLstmSql(dual: Boolean): String = {
    import graft.ml.SeqForward.{H, T, compParam, fmt}
    val p = (0 to 113).map(compParam)
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val eps = fmt(1e-5)
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    // input projection + LayerNorm
    val lCols = (1 to T).flatMap(t => Seq(
      s"    ROUND(${fmt(p(0))} * x$t + ${fmt(p(1))}, 9) AS l${t}_1",
      s"    ROUND(${fmt(p(2))} * x$t + ${fmt(p(3))}, 9) AS l${t}_2"))
      .mkString(",\n")
    val lList = (1 to T).flatMap(t => Seq(s"l${t}_1", s"l${t}_2"))
      .mkString(", ")
    val muCols = (1 to T).map(t =>
      s"    (l${t}_1 + l${t}_2) / 2.0 AS mu$t").mkString(",\n")
    val muList = (1 to T).map(t => s"mu$t").mkString(", ")
    val vaCols = (1 to T).map(t =>
      s"    ((l${t}_1 - mu$t) * (l${t}_1 - mu$t) + " +
        s"(l${t}_2 - mu$t) * (l${t}_2 - mu$t)) / 2.0 AS va$t")
      .mkString(",\n")
    val eCols = (1 to T).flatMap(t => Seq(
      s"    ROUND(${fmt(p(4))} * (l${t}_1 - mu$t) / SQRT(va$t + $eps)" +
        s" + ${fmt(p(5))}, 9) AS e${t}_1",
      s"    ROUND(${fmt(p(6))} * (l${t}_2 - mu$t) / SQRT(va$t + $eps)" +
        s" + ${fmt(p(7))}, 9) AS e${t}_2")).mkString(",\n")
    val eList = (1 to T).flatMap(t => Seq(s"e${t}_1", s"e${t}_2"))
      .mkString(", ")
    // bidirectional LSTM with per-position snapshots
    def gateD(base: Int, pre: String, g: Int, u: Int, t: Int): String =
      s"${fmt(p(base + g * H * 5 + u * 5))} * e${t}_1 + " +
        s"${fmt(p(base + g * H * 5 + u * 5 + 1))} * e${t}_2 + " +
        s"${fmt(p(base + g * H * 5 + u * 5 + 2))} * ${pre}h1 + " +
        s"${fmt(p(base + g * H * 5 + u * 5 + 3))} * ${pre}h2 + " +
        s"${fmt(p(base + g * H * 5 + u * 5 + 4))}"
    def histNames(steps: Seq[Int]): Seq[String] = steps.sorted.flatMap(s =>
      Seq(s"of${s}_1", s"of${s}_2", s"ob${T + 1 - s}_1", s"ob${T + 1 - s}_2"))
    def hist(upTo: Int): String = histNames(1 to upTo) match {
      case Seq() => ""
      case cols => cols.mkString(", ", ", ", "")
    }
    val bidi = (1 to T).map { s =>
      val (tf, tb) = (s, T + 1 - s)
      val cNew = ((0 until H).map { u =>
        s"    ROUND(${sig(gateD(8, "f", 1, u, tf))} * fc${u + 1} + " +
          s"${sig(gateD(8, "f", 0, u, tf))} * " +
          s"${tanh(gateD(8, "f", 3, u, tf))}, 9) AS fc${u + 1}"
      } ++ (0 until H).map { u =>
        s"    ROUND(${sig(gateD(48, "b", 1, u, tb))} * bc${u + 1} + " +
          s"${sig(gateD(48, "b", 0, u, tb))} * " +
          s"${tanh(gateD(48, "b", 3, u, tb))}, 9) AS bc${u + 1}"
      }).mkString(",\n")
      val hNew = ((0 until H).map { u =>
        s"    ROUND(${sig(gateD(8, "f", 2, u, tf))} * " +
          s"${tanh(s"fc${u + 1}")}, 9) AS fh${u + 1}"
      } ++ (0 until H).map { u =>
        s"    ROUND(${sig(gateD(48, "b", 2, u, tb))} * " +
          s"${tanh(s"bc${u + 1}")}, 9) AS bh${u + 1}"
      }).mkString(",\n")
      val src = if (s == 1) "r0" else s"n${s - 1}"
      s""",c$s AS (
         |  SELECT user_id, $eList, fh1, fh2, bh1, bh2${hist(s - 1)},
         |$cNew
         |  FROM $src),
         |s$s AS (
         |  SELECT user_id, $eList, fc1, fc2, bc1, bc2${hist(s - 1)},
         |$hNew
         |  FROM c$s),
         |n$s AS (
         |  SELECT *, fh1 AS of${tf}_1, fh2 AS of${tf}_2,
         |    bh1 AS ob${tb}_1, bh2 AS ob${tb}_2
         |  FROM s$s)
         |""".stripMargin
    }.mkString
    val histAll = histNames(1 to T).mkString(", ")
    def o(t: Int): Seq[String] =
      Seq(s"of${t}_1", s"of${t}_2", s"ob${t}_1", s"ob${t}_2")
    val uCols = (1 to T).flatMap(t => (0 until 2).map { j =>
      val terms = o(t).zipWithIndex.map { case (c, k) =>
        s"${fmt(p(88 + 4 * j + k))} * $c" }.mkString(" + ")
      s"    ROUND($terms + ${fmt(p(96 + j))}, 9) AS u${t}_${j + 1}"
    }).mkString(",\n")
    val sCols = (1 to T).map(t =>
      s"    ROUND(${fmt(p(98))} * ${tanh(s"u${t}_1")} + " +
        s"${fmt(p(99))} * ${tanh(s"u${t}_2")} + ${fmt(p(100))}, 9) AS sc$t")
      .mkString(",\n")
    val wCols = (1 to T).map(t => s"    EXP(sc$t - m) AS w$t")
      .mkString(",\n")
    val zSum = (1 to T).map(t => s"w$t").mkString(" + ")
    val poolCols = Seq("of%d_1", "of%d_2", "ob%d_1", "ob%d_2")
      .zipWithIndex.map { case (nm, k) =>
        val mixed = (1 to T).map(t => s"w$t * ${nm.format(t)}")
          .mkString(" + ")
        s"    ROUND(($mixed) / z, 9) AS pool${k + 1}"
      }.mkString(",\n")
    val opCols = (0 until 2).map { j =>
      val terms = (0 until 4).map(k =>
        s"${fmt(p(101 + 4 * j + k))} * pool${k + 1}").mkString(" + ")
      s"    GREATEST(0.0, ROUND($terms + ${fmt(p(109 + j))}, 9))" +
        s" AS op${j + 1}"
    }.mkString(",\n")
    seqPivotCtes +
      s""",il AS (
         |  SELECT user_id,
         |$lCols
         |  FROM p),
         |im AS (
         |  SELECT user_id, $lList,
         |$muCols
         |  FROM il),
         |iv AS (
         |  SELECT user_id, $lList, $muList,
         |$vaCols
         |  FROM im),
         |r0 AS (
         |  SELECT user_id,
         |$eCols,
         |    CAST(0.0 AS DOUBLE) AS fh1, CAST(0.0 AS DOUBLE) AS fh2,
         |    CAST(0.0 AS DOUBLE) AS fc1, CAST(0.0 AS DOUBLE) AS fc2,
         |    CAST(0.0 AS DOUBLE) AS bh1, CAST(0.0 AS DOUBLE) AS bh2,
         |    CAST(0.0 AS DOUBLE) AS bc1, CAST(0.0 AS DOUBLE) AS bc2
         |  FROM iv)
         |""".stripMargin + bidi +
      s""",a1 AS (
         |  SELECT user_id, $histAll,
         |$uCols
         |  FROM n$T),
         |a2 AS (
         |  SELECT user_id, $histAll,
         |$sCols
         |  FROM a1),
         |a3 AS (
         |  SELECT *, GREATEST(${(1 to T).map(t => s"sc$t").mkString(", ")})
         |    AS m
         |  FROM a2),
         |a4 AS (
         |  SELECT user_id, $histAll,
         |$wCols
         |  FROM a3),
         |a5 AS (SELECT *, $zSum AS z FROM a4),
         |a6 AS (
         |  SELECT user_id,
         |$poolCols
         |  FROM a5),
         |a7 AS (
         |  SELECT user_id, pool1, pool2, pool3, pool4,
         |$opCols
         |  FROM a6)
         |""".stripMargin +
      (if (!dual)
        s"""SELECT user_id,
           |  ROUND(${fmt(p(111))} * op1 + ${fmt(p(112))} * op2 +
           |    ${fmt(p(113))}, 6) + 0.0 AS pred,
           |  ROUND(pool1, 6) + 0.0 AS pool1, ROUND(pool2, 6) + 0.0 AS pool2,
           |  ROUND(pool3, 6) + 0.0 AS pool3, ROUND(pool4, 6) + 0.0 AS pool4
           |FROM a7 ORDER BY user_id""".stripMargin
      else {
        val q = (114 to 119).map(graft.ml.SeqForward.compParam)
        s""",d1 AS (
           |  SELECT user_id, op1, op2,
           |    ROUND(${fmt(q(0))} * op1 + ${fmt(q(1))} * op2 +
           |      ${fmt(q(4))}, 9) AS z1,
           |    ROUND(${fmt(q(2))} * op1 + ${fmt(q(3))} * op2 +
           |      ${fmt(q(5))}, 9) AS z2
           |  FROM a7),
           |d2 AS (SELECT *, GREATEST(z1, z2) AS m FROM d1),
           |d3 AS (SELECT *, EXP(z1 - m) AS e1, EXP(z2 - m) AS e2 FROM d2)
           |SELECT user_id,
           |  ROUND(${fmt(p(111))} * op1 + ${fmt(p(112))} * op2 +
           |    ${fmt(p(113))}, 6) + 0.0 AS reg_pred,
           |  ROUND(e1 / (e1 + e2), 6) + 0.0 AS prob1,
           |  ROUND(e2 / (e1 + e2), 6) + 0.0 AS prob2,
           |  CASE WHEN z1 >= z2 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(1 AS BIGINT) END AS pred_class,
           |  ROUND(op1, 6) + 0.0 AS shared1, ROUND(op2, 6) + 0.0 AS shared2
           |FROM d3 ORDER BY user_id""".stripMargin
      })
  }

  protected def q434HiveTransformerSql: String = hiveTransformerSql(dual = false)
  protected def q441DualHeadTransformerSql: String = hiveTransformerSql(dual = true)

  /** Whole-HiveTransformer CTE chain; `dual = true` swaps the
    * regression-only head for DualHeadTransformer's simultaneous reg +
    * cls heads on the shared GELU projection (`transformer.py:389-397`).
    */
  private def hiveTransformerSql(dual: Boolean): String = {
    import graft.ml.SeqForward.{T, fmt, posEncCls, trParam}
    val p = (0 to 102).map(trParam)
    def r9v(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    def gelu(x: String): String =
      s"0.5 * $x * (1.0 + ${tanh(s"0.797884561 * ($x + 0.044715 * $x * $x * $x)")})"
    val eps = fmt(1e-5)
    val e0 = Seq(r9v(p(8) + posEncCls(0)._1), r9v(p(9) + posEncCls(0)._2))
    val b1 = 10
    def projLit(off: Int, e: Seq[Double], dd: Int): Double =
      r9v(p(off + 2 * dd) * e.head + p(off + 2 * dd + 1) * e(1) +
        p(off + 4 + dd))
    val q0 = Seq(projLit(b1, e0, 0), projLit(b1, e0, 1))
    val k0 = Seq(projLit(b1 + 6, e0, 0), projLit(b1 + 6, e0, 1))
    val v0 = Seq(projLit(b1 + 12, e0, 0), projLit(b1 + 12, e0, 1))
    // input Linear + LayerNorm + PE
    val lCols = (1 to T).flatMap(t => Seq(
      s"    ROUND(${fmt(p(0))} * x$t + ${fmt(p(1))}, 9) AS l${t}_1",
      s"    ROUND(${fmt(p(2))} * x$t + ${fmt(p(3))}, 9) AS l${t}_2"))
      .mkString(",\n")
    val lList = (1 to T).flatMap(t => Seq(s"l${t}_1", s"l${t}_2"))
      .mkString(", ")
    val muCols = (1 to T).map(t =>
      s"    (l${t}_1 + l${t}_2) / 2.0 AS mu$t").mkString(",\n")
    val muList = (1 to T).map(t => s"mu$t").mkString(", ")
    val vaCols = (1 to T).map(t =>
      s"    ((l${t}_1 - mu$t) * (l${t}_1 - mu$t) + " +
        s"(l${t}_2 - mu$t) * (l${t}_2 - mu$t)) / 2.0 AS va$t")
      .mkString(",\n")
    val eCols = (1 to T).flatMap(t => Seq(
      s"    ROUND(${fmt(p(4))} * (l${t}_1 - mu$t) / SQRT(va$t + $eps)" +
        s" + ${fmt(p(5))} + ${fmt(posEncCls(t)._1)}, 9) AS e${t}_1",
      s"    ROUND(${fmt(p(6))} * (l${t}_2 - mu$t) / SQRT(va$t + $eps)" +
        s" + ${fmt(p(7))} + ${fmt(posEncCls(t)._2)}, 9) AS e${t}_2"))
      .mkString(",\n")
    val eList = (1 to T).flatMap(t => Seq(s"e${t}_1", s"e${t}_2"))
      .mkString(", ")
    // block 1 projections
    def proj(off: Int, i: Int, dd: Int): String =
      s"ROUND(${fmt(p(off + 2 * dd))} * e${i}_1 + " +
        s"${fmt(p(off + 2 * dd + 1))} * e${i}_2 + ${fmt(p(off + 4 + dd))}, 9)"
    val qkvCols = (1 to T).flatMap(i => Seq(
      s"    ${proj(b1, i, 0)} AS q${i}_1", s"    ${proj(b1, i, 1)} AS q${i}_2",
      s"    ${proj(b1 + 6, i, 0)} AS k${i}_1",
      s"    ${proj(b1 + 6, i, 1)} AS k${i}_2",
      s"    ${proj(b1 + 12, i, 0)} AS v${i}_1",
      s"    ${proj(b1 + 12, i, 1)} AS v${i}_2")).mkString(",\n")
    def qh(i: Int, h: Int): String =
      if (i == 0) fmt(q0(h - 1)) else s"q${i}_$h"
    def kh(j: Int, h: Int): String =
      if (j == 0) fmt(k0(h - 1)) else s"k${j}_$h"
    def vh(j: Int, h: Int): String =
      if (j == 0) fmt(v0(h - 1)) else s"v${j}_$h"
    val vList = (1 to T).flatMap(j => Seq(s"v${j}_1", s"v${j}_2"))
      .mkString(", ")
    val sCols = (0 to T).flatMap(i => (1 to 2).flatMap(h =>
      (0 to T).map(j =>
        s"    ${qh(i, h)} * ${kh(j, h)} AS s${i}_${j}_$h")))
      .mkString(",\n")
    val sList = (0 to T).flatMap(i => (1 to 2).flatMap(h =>
      (0 to T).map(j => s"s${i}_${j}_$h"))).mkString(", ")
    val mCols = (0 to T).flatMap(i => (1 to 2).map(h =>
      s"    GREATEST(${(0 to T).map(j => s"s${i}_${j}_$h").mkString(", ")})" +
        s" AS m${i}_$h")).mkString(",\n")
    val wCols = (0 to T).flatMap(i => (1 to 2).flatMap(h =>
      (0 to T).map(j =>
        s"    EXP(s${i}_${j}_$h - m${i}_$h) AS w${i}_${j}_$h")))
      .mkString(",\n")
    val wList = (0 to T).flatMap(i => (1 to 2).flatMap(h =>
      (0 to T).map(j => s"w${i}_${j}_$h"))).mkString(", ")
    val zCols = (0 to T).flatMap(i => (1 to 2).map(h =>
      s"    ${(0 to T).map(j => s"w${i}_${j}_$h").mkString(" + ")}" +
        s" AS z${i}_$h")).mkString(",\n")
    val oCols = (0 to T).flatMap(i => (1 to 2).map(h =>
      s"    ROUND((${(0 to T).map(j => s"w${i}_${j}_$h * ${vh(j, h)}")
        .mkString(" + ")}) / z${i}_$h, 9) AS o${i}_$h")).mkString(",\n")
    def eIn(i: Int, dd: Int): String =
      if (i == 0) fmt(e0(dd - 1)) else s"e${i}_$dd"
    val rCols = (0 to T).flatMap(i => Seq(
      s"    ${eIn(i, 1)} + ROUND(${fmt(p(b1 + 18))} * o${i}_1 + " +
        s"${fmt(p(b1 + 19))} * o${i}_2 + ${fmt(p(b1 + 22))}, 9) AS r${i}_1",
      s"    ${eIn(i, 2)} + ROUND(${fmt(p(b1 + 20))} * o${i}_1 + " +
        s"${fmt(p(b1 + 21))} * o${i}_2 + ${fmt(p(b1 + 23))}, 9) AS r${i}_2"))
      .mkString(",\n")
    def lnCtes(tag: String, pref: String, outPref: String, gOff: Int,
        srcCte: String): String = {
      val rList = (0 to T).flatMap(i =>
        Seq(s"$pref${i}_1", s"$pref${i}_2")).mkString(", ")
      val mus = (0 to T).map(i =>
        s"    ($pref${i}_1 + $pref${i}_2) / 2.0 AS lmu$i").mkString(",\n")
      val muL = (0 to T).map(i => s"lmu$i").mkString(", ")
      val vas = (0 to T).map(i =>
        s"    (($pref${i}_1 - lmu$i) * ($pref${i}_1 - lmu$i) + " +
          s"($pref${i}_2 - lmu$i) * ($pref${i}_2 - lmu$i)) / 2.0 AS lva$i")
        .mkString(",\n")
      val outs = (0 to T).flatMap(i => Seq(
        s"    ROUND(${fmt(p(gOff))} * ($pref${i}_1 - lmu$i) / " +
          s"SQRT(lva$i + $eps) + ${fmt(p(gOff + 1))}, 9) AS $outPref${i}_1",
        s"    ROUND(${fmt(p(gOff + 2))} * ($pref${i}_2 - lmu$i) / " +
          s"SQRT(lva$i + $eps) + ${fmt(p(gOff + 3))}, 9) AS $outPref${i}_2"))
        .mkString(",\n")
      s""",${tag}a AS (
         |  SELECT user_id, $rList,
         |$mus
         |  FROM $srcCte),
         |${tag}b AS (
         |  SELECT user_id, $rList, $muL,
         |$vas
         |  FROM ${tag}a),
         |${tag}c AS (
         |  SELECT user_id,
         |$outs
         |  FROM ${tag}b)
         |""".stripMargin
    }
    val n1List = (0 to T).flatMap(i =>
      Seq(s"n1_${i}_1", s"n1_${i}_2")).mkString(", ")
    val fCols = (0 to T).flatMap(i => Seq(
      s"    ROUND(${fmt(p(b1 + 28))} * n1_${i}_1 + " +
        s"${fmt(p(b1 + 29))} * n1_${i}_2 + ${fmt(p(b1 + 32))}, 9) AS f${i}_1",
      s"    ROUND(${fmt(p(b1 + 30))} * n1_${i}_1 + " +
        s"${fmt(p(b1 + 31))} * n1_${i}_2 + ${fmt(p(b1 + 33))}, 9) AS f${i}_2"))
      .mkString(",\n")
    val gCols = (0 to T).flatMap(i => Seq(
      s"    ROUND(${gelu(s"f${i}_1")}, 9) AS g${i}_1",
      s"    ROUND(${gelu(s"f${i}_2")}, 9) AS g${i}_2")).mkString(",\n")
    val r2Cols = (0 to T).flatMap(i => Seq(
      s"    n1_${i}_1 + ROUND(${fmt(p(b1 + 34))} * g${i}_1 + " +
        s"${fmt(p(b1 + 35))} * g${i}_2 + ${fmt(p(b1 + 38))}, 9) AS r${i}_1",
      s"    n1_${i}_2 + ROUND(${fmt(p(b1 + 36))} * g${i}_1 + " +
        s"${fmt(p(b1 + 37))} * g${i}_2 + ${fmt(p(b1 + 39))}, 9) AS r${i}_2"))
      .mkString(",\n")
    // block 2 at the CLS position
    val b2 = 54
    val b1oList = (0 to T).flatMap(i =>
      Seq(s"b1o_${i}_1", s"b1o_${i}_2")).mkString(", ")
    def proj2(off: Int, i: Int, dd: Int): String =
      s"ROUND(${fmt(p(off + 2 * dd))} * b1o_${i}_1 + " +
        s"${fmt(p(off + 2 * dd + 1))} * b1o_${i}_2 + " +
        s"${fmt(p(off + 4 + dd))}, 9)"
    val qkv2 = (Seq(
      s"    ${proj2(b2, 0, 0)} AS Q_1", s"    ${proj2(b2, 0, 1)} AS Q_2") ++
      (0 to T).flatMap(j => Seq(
        s"    ${proj2(b2 + 6, j, 0)} AS K${j}_1",
        s"    ${proj2(b2 + 6, j, 1)} AS K${j}_2",
        s"    ${proj2(b2 + 12, j, 0)} AS V${j}_1",
        s"    ${proj2(b2 + 12, j, 1)} AS V${j}_2"))).mkString(",\n")
    val v2List = (0 to T).flatMap(j => Seq(s"V${j}_1", s"V${j}_2"))
      .mkString(", ")
    val s2Cols = (1 to 2).flatMap(h => (0 to T).map(j =>
      s"    Q_$h * K${j}_$h AS S${j}_$h")).mkString(",\n")
    val s2List = (1 to 2).flatMap(h => (0 to T).map(j => s"S${j}_$h"))
      .mkString(", ")
    val m2 = (1 to 2).map(h =>
      s"    GREATEST(${(0 to T).map(j => s"S${j}_$h").mkString(", ")})" +
        s" AS M_$h").mkString(",\n")
    val w2Cols = (1 to 2).flatMap(h => (0 to T).map(j =>
      s"    EXP(S${j}_$h - M_$h) AS W${j}_$h")).mkString(",\n")
    val w2List = (1 to 2).flatMap(h => (0 to T).map(j => s"W${j}_$h"))
      .mkString(", ")
    val z2 = (1 to 2).map(h =>
      s"    ${(0 to T).map(j => s"W${j}_$h").mkString(" + ")} AS Z_$h")
      .mkString(",\n")
    val o2 = (1 to 2).map(h =>
      s"    ROUND((${(0 to T).map(j => s"W${j}_$h * V${j}_$h")
        .mkString(" + ")}) / Z_$h, 9) AS O_$h").mkString(",\n")
    seqPivotCtes +
      s""",il AS (
         |  SELECT user_id,
         |$lCols
         |  FROM p),
         |im AS (
         |  SELECT user_id, $lList,
         |$muCols
         |  FROM il),
         |iv AS (
         |  SELECT user_id, $lList, $muList,
         |$vaCols
         |  FROM im),
         |ie AS (
         |  SELECT user_id,
         |$eCols
         |  FROM iv),
         |pj AS (
         |  SELECT user_id, $eList,
         |$qkvCols
         |  FROM ie),
         |sc AS (
         |  SELECT user_id, $eList, $vList,
         |$sCols
         |  FROM pj),
         |mx AS (
         |  SELECT user_id, $eList, $vList, $sList,
         |$mCols
         |  FROM sc),
         |we AS (
         |  SELECT user_id, $eList, $vList,
         |$wCols
         |  FROM mx),
         |zs AS (
         |  SELECT user_id, $eList, $vList, $wList,
         |$zCols
         |  FROM we),
         |om AS (
         |  SELECT user_id, $eList,
         |$oCols
         |  FROM zs),
         |rs AS (
         |  SELECT user_id,
         |$rCols
         |  FROM om)
         |""".stripMargin +
      lnCtes("ln1", "r", "n1_", b1 + 24, "rs") +
      s""",ff AS (
         |  SELECT user_id, $n1List,
         |$fCols
         |  FROM ln1c),
         |gg AS (
         |  SELECT user_id, $n1List,
         |$gCols
         |  FROM ff),
         |r2 AS (
         |  SELECT user_id,
         |$r2Cols
         |  FROM gg)
         |""".stripMargin +
      lnCtes("ln2", "r", "b1o_", b1 + 40, "r2") +
      s""",p2 AS (
         |  SELECT user_id, $b1oList,
         |$qkv2
         |  FROM ln2c),
         |s2 AS (
         |  SELECT user_id, b1o_0_1, b1o_0_2, $v2List,
         |$s2Cols
         |  FROM p2),
         |m2 AS (
         |  SELECT user_id, b1o_0_1, b1o_0_2, $v2List, $s2List,
         |$m2
         |  FROM s2),
         |w2 AS (
         |  SELECT user_id, b1o_0_1, b1o_0_2, $v2List,
         |$w2Cols
         |  FROM m2),
         |z2 AS (
         |  SELECT user_id, b1o_0_1, b1o_0_2, $v2List, $w2List,
         |$z2
         |  FROM w2),
         |o2 AS (
         |  SELECT user_id, b1o_0_1, b1o_0_2,
         |$o2
         |  FROM z2),
         |rr AS (
         |  SELECT user_id,
         |    b1o_0_1 + ROUND(${fmt(p(b2 + 18))} * O_1 + ${fmt(p(b2 + 19))}
         |      * O_2 + ${fmt(p(b2 + 22))}, 9) AS R_1,
         |    b1o_0_2 + ROUND(${fmt(p(b2 + 20))} * O_1 + ${fmt(p(b2 + 21))}
         |      * O_2 + ${fmt(p(b2 + 23))}, 9) AS R_2
         |  FROM o2),
         |na AS (SELECT user_id, R_1, R_2, (R_1 + R_2) / 2.0 AS Lmu FROM rr),
         |nb AS (
         |  SELECT user_id, R_1, R_2, Lmu,
         |    ((R_1 - Lmu) * (R_1 - Lmu) + (R_2 - Lmu) * (R_2 - Lmu)) / 2.0
         |      AS Lva
         |  FROM na),
         |nc AS (
         |  SELECT user_id,
         |    ROUND(${fmt(p(b2 + 24))} * (R_1 - Lmu) / SQRT(Lva + $eps)
         |      + ${fmt(p(b2 + 25))}, 9) AS N1_1,
         |    ROUND(${fmt(p(b2 + 26))} * (R_2 - Lmu) / SQRT(Lva + $eps)
         |      + ${fmt(p(b2 + 27))}, 9) AS N1_2
         |  FROM nb),
         |f2 AS (
         |  SELECT user_id, N1_1, N1_2,
         |    ROUND(${fmt(p(b2 + 28))} * N1_1 + ${fmt(p(b2 + 29))} * N1_2
         |      + ${fmt(p(b2 + 32))}, 9) AS F_1,
         |    ROUND(${fmt(p(b2 + 30))} * N1_1 + ${fmt(p(b2 + 31))} * N1_2
         |      + ${fmt(p(b2 + 33))}, 9) AS F_2
         |  FROM nc),
         |g2 AS (
         |  SELECT user_id, N1_1, N1_2,
         |    ROUND(${gelu("F_1")}, 9) AS G_1,
         |    ROUND(${gelu("F_2")}, 9) AS G_2
         |  FROM f2),
         |rb AS (
         |  SELECT user_id,
         |    N1_1 + ROUND(${fmt(p(b2 + 34))} * G_1 + ${fmt(p(b2 + 35))}
         |      * G_2 + ${fmt(p(b2 + 38))}, 9) AS R_1,
         |    N1_2 + ROUND(${fmt(p(b2 + 36))} * G_1 + ${fmt(p(b2 + 37))}
         |      * G_2 + ${fmt(p(b2 + 39))}, 9) AS R_2
         |  FROM g2),
         |ca AS (SELECT user_id, R_1, R_2, (R_1 + R_2) / 2.0 AS Lmu FROM rb),
         |cb AS (
         |  SELECT user_id, R_1, R_2, Lmu,
         |    ((R_1 - Lmu) * (R_1 - Lmu) + (R_2 - Lmu) * (R_2 - Lmu)) / 2.0
         |      AS Lva
         |  FROM ca),
         |cc2 AS (
         |  SELECT user_id,
         |    ROUND(${fmt(p(b2 + 40))} * (R_1 - Lmu) / SQRT(Lva + $eps)
         |      + ${fmt(p(b2 + 41))}, 9) AS CLS_1,
         |    ROUND(${fmt(p(b2 + 42))} * (R_2 - Lmu) / SQRT(Lva + $eps)
         |      + ${fmt(p(b2 + 43))}, 9) AS CLS_2
         |  FROM cb),
         |oph AS (
         |  SELECT user_id, CLS_1, CLS_2,
         |    ROUND(${fmt(p(98))} * CLS_1 + ${fmt(p(99))} * CLS_2
         |      + ${fmt(p(100))}, 9) AS OPin
         |  FROM cc2),
         |opg AS (
         |  SELECT user_id, CLS_1, CLS_2,
         |    ROUND(${gelu("OPin")}, 9) AS OP
         |  FROM oph)
         |""".stripMargin +
      (if (!dual)
        s"""SELECT user_id,
           |  ROUND(${fmt(p(101))} * OP + ${fmt(p(102))}, 6) + 0.0 AS pred,
           |  ROUND(CLS_1, 6) + 0.0 AS cls1, ROUND(CLS_2, 6) + 0.0 AS cls2
           |FROM opg ORDER BY user_id""".stripMargin
      else {
        val q = (103 to 106).map(trParam)
        s""",d1 AS (
           |  SELECT user_id, OP,
           |    ROUND(${fmt(q(0))} * OP + ${fmt(q(2))}, 9) AS z1,
           |    ROUND(${fmt(q(1))} * OP + ${fmt(q(3))}, 9) AS z2
           |  FROM opg),
           |d2 AS (SELECT *, GREATEST(z1, z2) AS m FROM d1),
           |d3 AS (SELECT *, EXP(z1 - m) AS e1, EXP(z2 - m) AS e2 FROM d2)
           |SELECT user_id,
           |  ROUND(${fmt(p(101))} * OP + ${fmt(p(102))}, 6) + 0.0 AS reg_pred,
           |  ROUND(e1 / (e1 + e2), 6) + 0.0 AS prob1,
           |  ROUND(e2 / (e1 + e2), 6) + 0.0 AS prob2,
           |  CASE WHEN z1 >= z2 THEN CAST(0 AS BIGINT)
           |    ELSE CAST(1 AS BIGINT) END AS pred_class,
           |  ROUND(OP, 6) + 0.0 AS shared1
           |FROM d3 ORDER BY user_id""".stripMargin
      })
  }

  protected def q435PackedLstmSql: String = {
    import graft.ml.SeqForward.{H, T, Tmin, fmt, lstmParam}
    def gate(g: Int, u: Int, t: Int): String =
      s"${fmt(lstmParam(g, u, 0))} * x$t + ${fmt(lstmParam(g, u, 1))} * h1" +
        s" + ${fmt(lstmParam(g, u, 2))} * h2 + ${fmt(lstmParam(g, u, 3))}"
    def sig(z: String): String = s"1.0 / (1.0 + EXP(-($z)))"
    def tanh(z: String): String =
      s"(EXP(2.0 * ($z)) - 1.0) / (EXP(2.0 * ($z)) + 1.0)"
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    val pivotXs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    val steps = (1 to T).map { t =>
      val cNew = (0 until H).map { u =>
        s"    CASE WHEN n_valid >= $t THEN " +
          s"ROUND(${sig(gate(1, u, t))} * c${u + 1} + " +
          s"${sig(gate(0, u, t))} * ${tanh(gate(3, u, t))}, 9) " +
          s"ELSE c${u + 1} END AS c${u + 1}"
      }.mkString(",\n")
      val hNew = (0 until H).map { u =>
        s"    CASE WHEN n_valid >= $t THEN " +
          s"ROUND(${sig(gate(2, u, t))} * ${tanh(s"c${u + 1}")}, 9) " +
          s"ELSE h${u + 1} END AS h${u + 1}"
      }.mkString(",\n")
      s""",c$t AS (
         |  SELECT user_id, n_valid, $xs, h1, h2,
         |$cNew
         |  FROM s${t - 1}),
         |s$t AS (
         |  SELECT user_id, n_valid, $xs, c1, c2,
         |$hNew
         |  FROM c$t)
         |""".stripMargin
    }.mkString
    s"""WITH r AS (
       |  SELECT user_id,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn,
       |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
       |  FROM events),
       |p AS (
       |  SELECT user_id,
       |$pivotXs,
       |    COUNT(*) AS n_valid
       |  FROM r WHERE rn <= $T
       |  GROUP BY user_id HAVING COUNT(*) >= $Tmin),
       |s0 AS (
       |  SELECT user_id, n_valid, $xs,
       |    CAST(0.0 AS DOUBLE) AS h1, CAST(0.0 AS DOUBLE) AS h2,
       |    CAST(0.0 AS DOUBLE) AS c1, CAST(0.0 AS DOUBLE) AS c2
       |  FROM p)
       |""".stripMargin + steps +
      s"""SELECT user_id, n_valid,
         |  ROUND(h1, 6) + 0.0 AS h1, ROUND(h2, 6) + 0.0 AS h2,
         |  ROUND(c1, 6) + 0.0 AS c1, ROUND(c2, 6) + 0.0 AS c2
         |FROM s$T ORDER BY user_id""".stripMargin
  }

  protected def q430MaskedAttnSql: String = {
    import graft.ml.SeqForward.{T, Tmin, attnParam, fmt}
    val (wq, bq) = (fmt(attnParam(0)), fmt(attnParam(1)))
    val (wk, bk) = (fmt(attnParam(2)), fmt(attnParam(3)))
    val (wv, bv) = (fmt(attnParam(4)), fmt(attnParam(5)))
    val pivotXs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    val xq = "CASE n_valid " + (1 to T).map(t =>
      s"WHEN $t THEN x$t").mkString(" ") + " END"
    val kvs = (1 to T).map(j =>
      s"    ROUND($wk * x$j + $bk, 9) AS k$j," +
        s" ROUND($wv * x$j + $bv, 9) AS v$j").mkString(",\n")
    // NULL is the −inf convention: a masked score exponentiates to NULL
    // and coalesces to weight 0; GREATEST skips NULLs in both engines
    val ss = (1 to T).map(j => s"    q * k$j * 4.0 AS s$j").mkString(",\n")
    val es = (1 to T).map(j =>
      s"    COALESCE(EXP(s$j - m), 0.0) AS e$j").mkString(",\n")
    val vCarry = (1 to T).map(j => s"v$j").mkString(", ")
    val zSum = (1 to T).map(j => s"e$j").mkString(" + ")
    val outSum = (1 to T).map(j =>
      s"COALESCE(e$j * v$j, 0.0)").mkString(" + ")
    s"""WITH r AS (
       |  SELECT user_id,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn,
       |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
       |  FROM events),
       |p AS (
       |  SELECT user_id,
       |$pivotXs,
       |    COUNT(*) AS n_valid
       |  FROM r WHERE rn <= $T
       |  GROUP BY user_id HAVING COUNT(*) >= $Tmin),
       |a1 AS (
       |  SELECT user_id, n_valid, ROUND($wq * ($xq) + $bq, 9) AS q,
       |$kvs
       |  FROM p),
       |a2 AS (
       |  SELECT user_id, n_valid, $vCarry,
       |$ss
       |  FROM a1),
       |a3 AS (
       |  SELECT *, GREATEST(${(1 to T).map(j => s"s$j").mkString(", ")}) AS m
       |  FROM a2),
       |a4 AS (
       |  SELECT user_id, n_valid, $vCarry,
       |$es
       |  FROM a3),
       |a5 AS (SELECT *, $zSum AS z FROM a4)
       |SELECT user_id, n_valid,
       |  ROUND(($outSum) / z, 6) + 0.0 AS attn_out
       |FROM a5 ORDER BY user_id""".stripMargin
  }

  /** The HiveMLP residual trunk as a CTE chain at the production shape
    * (nFeat=8, hid=2, layers=3), mirroring `mlpTrunkGeneric` stage for
    * stage: input Linear → LayerNorm (ε=1e-5, learned γ/β) → three
    * residual Linear→LayerNorm→ReLU blocks. Reads x1..x8 (+ `carry`)
    * from `src`; the returned chain's last CTE (`"b23"`) exposes
    * user_id, carry, h1, h2.
    */
  private def mlpTrunkSqlCtes(src: String, carry: Seq[String]): String = {
    import graft.ml.SeqForward.{fmt, mlpParam => mp}
    val T = graft.ml.SeqForward.T
    val eps = fmt(1e-5)
    val cy = carry match {
      case Seq() => ""
      case cs => cs.mkString(", ", ", ", "")
    }
    // input Linear: W row-major (d=1 → 0..7, d=2 → 8..15), bias 16/17
    def inLin(d: Int): String =
      (1 to T).map(i => s"${fmt(mp(T * (d - 1) + (i - 1)))} * x$i")
        .mkString(" + ") + s" + ${fmt(mp(T * 2 + (d - 1)))}"
    def lnOut(d: Int, gOff: Int): String =
      s"ROUND(${fmt(mp(gOff + 2 * (d - 1)))} * (q$d - mu) /" +
        s" SQRT(va + $eps) + ${fmt(mp(gOff + 2 * (d - 1) + 1))}, 9)"
    val input =
      s""",t0 AS (
         |  SELECT user_id$cy,
         |    ROUND(${inLin(1)}, 9) AS q1,
         |    ROUND(${inLin(2)}, 9) AS q2
         |  FROM $src),
         |t1 AS (SELECT *, (q1 + q2) / 2.0 AS mu FROM t0),
         |t2 AS (SELECT *, ((q1 - mu) * (q1 - mu) +
         |  (q2 - mu) * (q2 - mu)) / 2.0 AS va FROM t1),
         |t3 AS (
         |  SELECT user_id$cy,
         |    ${lnOut(1, T * 2 + 2)} AS h1,
         |    ${lnOut(2, T * 2 + 2)} AS h2
         |  FROM t2)
         |""".stripMargin
    val blocks = (0 until graft.ml.SeqForward.mlpLayers).map { l =>
      val base = T * 2 + 6 + l * 10
      def blkLin(d: Int): String =
        s"${fmt(mp(base + 2 * (d - 1)))} * h1 + " +
          s"${fmt(mp(base + 2 * (d - 1) + 1))} * h2 + " +
          fmt(mp(base + 4 + (d - 1)))
      def res(d: Int): String =
        s"ROUND(h$d + GREATEST(0.0, ${lnOut(d, base + 6)}), 9)"
      val prev = if (l == 0) "t3" else s"b${l - 1}3"
      s""",b${l}0 AS (
         |  SELECT user_id$cy, h1, h2,
         |    ROUND(${blkLin(1)}, 9) AS q1,
         |    ROUND(${blkLin(2)}, 9) AS q2
         |  FROM $prev),
         |b${l}1 AS (SELECT *, (q1 + q2) / 2.0 AS mu FROM b${l}0),
         |b${l}2 AS (SELECT *, ((q1 - mu) * (q1 - mu) +
         |  (q2 - mu) * (q2 - mu)) / 2.0 AS va FROM b${l}1),
         |b${l}3 AS (
         |  SELECT user_id$cy,
         |    ${res(1)} AS h1,
         |    ${res(2)} AS h2
         |  FROM b${l}2)
         |""".stripMargin
    }.mkString
    input + blocks
  }

  /** Classification-head logits on the trunk output (shared text
    * between q436/q438/q439): z_c = ROUND(W·h + b, 9) on the head bank
    * at `off`.
    */
  private def mlpHeadZ(off: Int, c: Int): String = {
    import graft.ml.SeqForward.{fmt, mlpParam => mp}
    s"ROUND(${fmt(mp(off + 2 * (c - 1)))} * h1 + " +
      s"${fmt(mp(off + 2 * (c - 1) + 1))} * h2 + " +
      s"${fmt(mp(off + 4 + (c - 1)))}, 9)"
  }

  protected def q436HiveMlpSql: String = {
    val off = graft.ml.SeqForward.mlpTrunkSize(
      graft.ml.SeqForward.T, graft.ml.SeqForward.H,
      graft.ml.SeqForward.mlpLayers)
    seqPivotCtes + mlpTrunkSqlCtes("p", Nil) +
      s""",hd AS (
         |  SELECT user_id, h1, h2,
         |    ${mlpHeadZ(off, 1)} AS z1,
         |    ${mlpHeadZ(off, 2)} AS z2
         |  FROM b23),
         |sm AS (SELECT *, GREATEST(z1, z2) AS m FROM hd),
         |sm2 AS (SELECT *, EXP(z1 - m) AS e1, EXP(z2 - m) AS e2 FROM sm)
         |SELECT user_id,
         |  ROUND(e1 / (e1 + e2), 6) + 0.0 AS prob1,
         |  ROUND(e2 / (e1 + e2), 6) + 0.0 AS prob2,
         |  CASE WHEN z1 >= z2 THEN CAST(0 AS BIGINT)
         |    ELSE CAST(1 AS BIGINT) END AS pred_class,
         |  ROUND(h1, 6) + 0.0 AS feat1, ROUND(h2, 6) + 0.0 AS feat2
         |FROM sm2 ORDER BY user_id""".stripMargin
  }

  protected def q438DualHeadSql: String = {
    import graft.ml.SeqForward.{fmt, mlpParam => mp}
    val off = graft.ml.SeqForward.mlpTrunkSize(
      graft.ml.SeqForward.T, graft.ml.SeqForward.H,
      graft.ml.SeqForward.mlpLayers)
    val ro = off + 6
    seqPivotCtes + mlpTrunkSqlCtes("p", Nil) +
      s""",hd AS (
         |  SELECT user_id, h1, h2,
         |    ${mlpHeadZ(off, 1)} AS z1,
         |    ${mlpHeadZ(off, 2)} AS z2,
         |    GREATEST(0.0, ROUND(${fmt(mp(ro))} * h1 +
         |      ${fmt(mp(ro + 1))} * h2 + ${fmt(mp(ro + 2))}, 9)) AS rh
         |  FROM b23)
         |SELECT user_id,
         |  ROUND(${fmt(mp(ro + 3))} * rh + ${fmt(mp(ro + 4))}, 6) + 0.0
         |    AS reg_pred,
         |  ROUND(z1, 6) + 0.0 AS logit1, ROUND(z2, 6) + 0.0 AS logit2,
         |  ROUND(h1, 6) + 0.0 AS feat1, ROUND(h2, 6) + 0.0 AS feat2
         |FROM hd ORDER BY user_id""".stripMargin
  }

  /** Target pivot + binarized label shared by q437/q439: x1..x8 plus
    * yb = 1{y ≥ ceThr} from the held-out (T+1)-th value.
    */
  private def cePivotCtes: String = {
    import graft.ml.SeqForward.{T, fmt, ceThr}
    val pivotXs = (1 to T).map(t =>
      s"    MAX(CASE WHEN rn = $t THEN x END) AS x$t").mkString(",\n")
    val xs = (1 to T).map(t => s"x$t").mkString(", ")
    s"""WITH r AS (
       |  SELECT user_id,
       |    ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS rn,
       |    ROUND(CAST(value AS DOUBLE) / 500.0, 9) AS x
       |  FROM events),
       |p AS (
       |  SELECT user_id,
       |$pivotXs,
       |    MAX(CASE WHEN rn = ${T + 1} THEN x END) AS y
       |  FROM r WHERE rn <= ${T + 1}
       |  GROUP BY user_id HAVING COUNT(*) = ${T + 1}),
       |pb AS (
       |  SELECT user_id, $xs,
       |    CASE WHEN y >= ${fmt(ceThr)} THEN CAST(1 AS BIGINT)
       |      ELSE CAST(0 AS BIGINT) END AS yb
       |  FROM p)
       |""".stripMargin
  }

  protected def q437CeAdamwSql: String = {
    import graft.ml.SeqForward.{fmt, ceInit, rnnIters, adamBeta1,
      adamBeta2, adamEps, adamLr, adamWd, adamBc1, adamBc2}
    val (b1, b2) = (fmt(adamBeta1), fmt(adamBeta2))
    val (lr, wd, eps) = (fmt(adamLr), fmt(adamWd), fmt(adamEps))
    val pn = Seq("w0a", "w0b", "b0", "w1a", "w1b", "b1")
    val head = cePivotCtes +
      s""",wc AS (
         |  SELECT SUM(CASE WHEN yb = 0 THEN 1 ELSE 0 END) AS n0,
         |    SUM(CASE WHEN yb = 1 THEN 1 ELSE 0 END) AS n1
         |  FROM pb),
         |wv AS (
         |  SELECT w0, w1, w0 * n0 + w1 * n1 AS sw FROM (
         |    SELECT n0, n1,
         |      CAST(n1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS w0,
         |      CAST(n0 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE) AS w1
         |    FROM wc)),
         |i1 AS (
         |  SELECT ${pn.zipWithIndex.map { case (nm, i) =>
              s"CAST(${fmt(ceInit(i))} AS DOUBLE) AS $nm" }.mkString(",\n    ")},
         |    ${pn.map(nm => s"CAST(0.0 AS DOUBLE) AS m_$nm")
              .mkString(",\n    ")},
         |    ${pn.map(nm => s"CAST(0.0 AS DOUBLE) AS v_$nm")
              .mkString(",\n    ")})
         |""".stripMargin
    val iters = (1 to rnnIters).map { k =>
      // per-sample weighted CE gradient terms: the closed form
      // w_y·(p_c − 1{y=c})·feature, exact-decimal summed; the weighted
      // mean divides by sw = w0·n0 + w1·n1 (exact from the counts)
      val wCase = "CASE WHEN yb = 0 THEN w0 ELSE w1 END"
      val d0 = "(p0 - CASE WHEN yb = 0 THEN 1.0 ELSE 0.0 END)"
      val d1 = "(p1 - CASE WHEN yb = 1 THEN 1.0 ELSE 0.0 END)"
      val gTerms = Seq(s"$d0 * x1", s"$d0 * x8", s"$d0",
        s"$d1 * x1", s"$d1 * x8", s"$d1")
      val pCarry = pn.mkString(", ")
      s""",f${k}a AS (
         |  SELECT pb.user_id, pb.x1, pb.x8, pb.yb,
         |    ${pn.map(nm => s"i.$nm").mkString(", ")},
         |    wv.w0, wv.w1, wv.sw,
         |    ROUND(i.w0a * pb.x1 + i.w0b * pb.x8 + i.b0, 9) AS z0,
         |    ROUND(i.w1a * pb.x1 + i.w1b * pb.x8 + i.b1, 9) AS z1
         |  FROM pb CROSS JOIN i$k i CROSS JOIN wv),
         |f${k}b AS (SELECT *, GREATEST(z0, z1) AS m FROM f${k}a),
         |f${k}c AS (SELECT *, EXP(z0 - m) AS e0, EXP(z1 - m) AS e1
         |  FROM f${k}b),
         |f${k}d AS (SELECT *, ROUND(e0 / (e0 + e1), 9) AS p0,
         |  ROUND(e1 / (e0 + e1), 9) AS p1 FROM f${k}c),
         |a$k AS (
         |  SELECT $pCarry, sw, w0, w1,
         |${gTerms.zipWithIndex.map { case (t, i) =>
            s"    SUM(CAST(($wCase) * $t AS DECIMAL(28,12))) AS s$i" }
            .mkString(",\n")},
         |    SUM(CAST(-($wCase) *
         |      LN(CASE WHEN yb = 0 THEN p0 ELSE p1 END)
         |      AS DECIMAL(28,12))) AS lsum
         |  FROM f${k}d GROUP BY $pCarry, sw, w0, w1),
         |g$k AS (
         |  SELECT a.*,
         |${(0 until 6).map(i =>
            s"    GREATEST(-1.0, LEAST(1.0, ROUND(CAST(s$i AS DOUBLE)" +
              s" / sw, 9))) AS g$i").mkString(",\n")},
         |    ROUND(CAST(lsum AS DOUBLE) / sw, 6) AS loss
         |  FROM a$k a),
         |m$k AS (
         |  -- exact-decimal m/v chains (the q426 tie-proofing)
         |  SELECT g.*,
         |${pn.zipWithIndex.map { case (nm, i) =>
            s"    CAST(ROUND($b1 * CAST(i.m_$nm AS DECIMAL(12,9)) +\n" +
              s"      (1.0 - $b1) * CAST(g.g$i AS DECIMAL(12,9)), 9)" +
              s" AS DOUBLE) AS mn_$nm" }.mkString(",\n")},
         |${pn.zipWithIndex.map { case (nm, i) =>
            s"    CAST(ROUND($b2 * CAST(i.v_$nm AS DECIMAL(12,9)) +\n" +
              s"      (1.0 - $b2) * CAST(g.g$i AS DECIMAL(12,9)) *\n" +
              s"      CAST(g.g$i AS DECIMAL(12,9)), 9) AS DOUBLE)" +
              s" AS vn_$nm" }.mkString(",\n")}
         |  FROM g$k g CROSS JOIN i$k i),
         |h$k AS (
         |  SELECT m.*,
         |${pn.map(nm =>
            s"    ROUND(mn_$nm / ${fmt(adamBc1(k))}, 9) AS mh_$nm")
            .mkString(",\n")},
         |${pn.map(nm =>
            s"    ROUND(vn_$nm / ${fmt(adamBc2(k))}, 9) AS vh_$nm")
            .mkString(",\n")}
         |  FROM m$k m),
         |s$k AS (
         |  SELECT h.*,
         |${pn.map(nm =>
            s"    ROUND(mh_$nm / (SQRT(vh_$nm) + $eps), 9) AS st_$nm")
            .mkString(",\n")}
         |  FROM h$k h),
         |i${k + 1} AS (
         |  SELECT
         |${pn.map(nm =>
            s"    CAST(ROUND(CAST($nm AS DECIMAL(12,9)) * (1.0 - $lr * $wd)\n" +
              s"      - $lr * CAST(st_$nm AS DECIMAL(12,9)), 9) AS DOUBLE)" +
              s" AS $nm").mkString(",\n")},
         |    ${pn.map(nm => s"mn_$nm AS m_$nm").mkString(", ")},
         |    ${pn.map(nm => s"vn_$nm AS v_$nm").mkString(", ")}
         |  FROM s$k),
         |t$k AS (
         |  SELECT $k AS iter,
         |    ${pn.map(nm => s"$nm + 0.0 AS $nm").mkString(", ")},
         |    ${pn.zipWithIndex.map { case (nm, i) =>
              s"g$i + 0.0 AS g_$nm" }.mkString(", ")},
         |    loss + 0.0 AS ce_loss,
         |    ROUND(w0, 6) + 0.0 AS class_w0,
         |    ROUND(w1, 6) + 0.0 AS class_w1
         |  FROM s$k)
         |""".stripMargin
    }.mkString
    val union = (1 to rnnIters).map(k => s"  SELECT * FROM t$k")
      .mkString("\n  UNION ALL\n")
    head + iters +
      s"""SELECT * FROM (
         |$union)
         |ORDER BY iter""".stripMargin
  }

  protected def q439EvaluateCardSql: String = {
    val off = graft.ml.SeqForward.mlpTrunkSize(
      graft.ml.SeqForward.T, graft.ml.SeqForward.H,
      graft.ml.SeqForward.mlpLayers)
    cePivotCtes + mlpTrunkSqlCtes("pb", Seq("yb")) +
      s""",hd AS (
         |  SELECT user_id, yb,
         |    ${mlpHeadZ(off, 1)} AS z1,
         |    ${mlpHeadZ(off, 2)} AS z2
         |  FROM b23),
         |sm AS (SELECT *, GREATEST(z1, z2) AS m FROM hd),
         |sm2 AS (
         |  SELECT user_id, yb, EXP(z1 - m) AS e1, EXP(z2 - m) AS e2,
         |    CASE WHEN z1 >= z2 THEN CAST(0 AS BIGINT)
         |      ELSE CAST(1 AS BIGINT) END AS pred
         |  FROM sm),
         |pr AS (
         |  SELECT yb, pred,
         |    ROUND(e1 / (e1 + e2), 9) AS p0,
         |    ROUND(e2 / (e1 + e2), 9) AS p1
         |  FROM sm2),
         |rk AS (
         |  SELECT yb, p1, ROW_NUMBER() OVER (ORDER BY p1) AS rk FROM pr),
         |rr AS (
         |  SELECT yb, AVG(rk) OVER (PARTITION BY p1) AS arank FROM rk),
         |aucv AS (
         |  SELECT CASE WHEN SUM(yb) > 0 AND SUM(yb) < COUNT(*) THEN
         |    ROUND(
         |      (CAST(SUM(CASE WHEN yb = 1 THEN
         |          CAST(arank AS DECIMAL(28,6)) END) AS DOUBLE)
         |        - (SUM(yb) * (SUM(yb) + 1) / 2.0)) /
         |      (SUM(yb) * (COUNT(*) - SUM(yb))), 6) + 0.0 END AS auc
         |  FROM rr),
         |ag AS (
         |  -- counts CAST to BIGINT: DuckDB SUM(int) is HUGEINT, which
         |  -- round-trips to pandas as float and type-mismatches Spark's
         |  -- longs at the hash compare
         |  SELECT COUNT(*) AS n,
         |    CAST(SUM(CASE WHEN pred = yb THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_correct,
         |    CAST(SUM(CASE WHEN yb = 1 AND pred = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tp,
         |    CAST(SUM(CASE WHEN yb = 0 AND pred = 1 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fp,
         |    CAST(SUM(CASE WHEN yb = 1 AND pred = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS fn,
         |    CAST(SUM(CASE WHEN yb = 0 AND pred = 0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS tn,
         |    CAST(SUM(CAST(-LN(CASE WHEN yb = 1 THEN p1 ELSE p0 END)
         |      AS DECIMAL(28,12))) AS DOUBLE) AS llsum,
         |    CAST(SUM(CAST((p1 - CAST(yb AS DOUBLE)) *
         |      (p1 - CAST(yb AS DOUBLE)) AS DECIMAL(28,12)))
         |      AS DOUBLE) AS brsum
         |  FROM pr)
         |SELECT n, tp, fp, fn, tn,
         |  auc,
         |  ROUND(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE), 6) + 0.0
         |    AS accuracy,
         |  CASE WHEN tp + fp > 0 THEN ROUND(CAST(tp AS DOUBLE) /
         |    CAST(tp + fp AS DOUBLE), 6) + 0.0 END AS precision,
         |  CASE WHEN tp + fn > 0 THEN ROUND(CAST(tp AS DOUBLE) /
         |    CAST(tp + fn AS DOUBLE), 6) + 0.0 END AS recall,
         |  CASE WHEN 2 * tp + fp + fn > 0 THEN
         |    ROUND(2.0 * CAST(tp AS DOUBLE) /
         |      CAST(2 * tp + fp + fn AS DOUBLE), 6) + 0.0 END AS f1,
         |  CASE WHEN tp + fn > 0 AND tn + fp > 0 THEN
         |    ROUND((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) +
         |      CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE)) / 2.0, 6)
         |      + 0.0 END AS balanced_accuracy,
         |  ROUND(llsum / CAST(n AS DOUBLE), 6) + 0.0 AS log_loss,
         |  ROUND(brsum / CAST(n AS DOUBLE), 6) + 0.0 AS brier
         |FROM ag CROSS JOIN aucv""".stripMargin
  }
}
