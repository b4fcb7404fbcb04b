package graft

/** DuckDB-oracle SQL builders, part 1 of the file split (shared CTE
  * preludes, hex-hash polynomials, special functions, and the builders the
  * part-2 builders and entry maps reference). Organization only — every
  * string is unchanged.
  */
private[graft] trait OracleDefs1 {

  /** Shared by q63 (DataFrame as-of join) and q409 (its SQL-text twin,
    * which emulates the as-of with a union-ordered carry-forward window):
    * DuckDB's native ASOF LEFT JOIN after the same per-(user, ts) click
    * collapse.
    */
  protected def asofSql: String =
    """WITH p AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'purchase'),
      |c AS (SELECT user_id, ts, MAX(event_id) AS click_id,
      |        epoch_us(ts) AS click_ts_us,
      |        arg_max(value, event_id) AS click_value
      |      FROM events WHERE event_type = 'click'
      |      GROUP BY user_id, ts)
      |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
      |  c.click_id, c.click_ts_us, c.click_value
      |FROM p ASOF LEFT JOIN c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  /** Shared by q103 (DataFrame cohort retention) and q412 (SQL text). */
  protected def retentionSql: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT e.user_id, f.cw,
      |    (epoch_us(date_trunc('week', e.ts)) - epoch_us(f.cw))
      |      // 604800000000 AS week_offset
      |  FROM events e JOIN f USING (user_id))
      |SELECT CAST(cw AS DATE) AS cohort_week,
      |  CAST(week_offset AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM a WHERE week_offset <= 3
      |GROUP BY cw, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Shared by q104 (DataFrame column profile) and q411 (SQL text). */
  protected def profileSql: String =
    """SELECT * FROM (
      |  SELECT 'event_id' AS "column", COUNT(*) AS n_rows,
      |    COUNT(*) FILTER (WHERE event_id IS NULL) AS n_null,
      |    ROUND(COUNT(*) FILTER (WHERE event_id IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6) AS null_frac,
      |    COUNT(DISTINCT event_id) AS n_distinct
      |  FROM events
      |  UNION ALL
      |  SELECT 'ts', COUNT(*), COUNT(*) FILTER (WHERE ts IS NULL),
      |    ROUND(COUNT(*) FILTER (WHERE ts IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6),
      |    COUNT(DISTINCT epoch_us(ts))
      |  FROM events
      |  UNION ALL
      |  SELECT 'user_id', COUNT(*), COUNT(*) FILTER (WHERE user_id IS NULL),
      |    ROUND(COUNT(*) FILTER (WHERE user_id IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6),
      |    COUNT(DISTINCT user_id)
      |  FROM events
      |  UNION ALL
      |  SELECT 'event_type', COUNT(*),
      |    COUNT(*) FILTER (WHERE event_type IS NULL),
      |    ROUND(COUNT(*) FILTER (WHERE event_type IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6),
      |    COUNT(DISTINCT event_type)
      |  FROM events
      |  UNION ALL
      |  SELECT 'value', COUNT(*), COUNT(*) FILTER (WHERE value IS NULL),
      |    ROUND(COUNT(*) FILTER (WHERE value IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6),
      |    COUNT(DISTINCT value)
      |  FROM events
      |  UNION ALL
      |  SELECT 'props', COUNT(*), COUNT(*) FILTER (WHERE props IS NULL),
      |    ROUND(COUNT(*) FILTER (WHERE props IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6),
      |    COUNT(DISTINCT props)
      |  FROM events)
      |ORDER BY "column"""".stripMargin

  /** Shared by q13 (DataFrame quality score) and q415 (SQL text). */
  protected def textQualitySql: String =
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  ROUND(len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE), 6) AS stop_ratio,
      |  ROUND(LEAST(len(toks) / 100.0, 1.0) * (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE)), 6) AS quality_score
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** Shared by q112 (DataFrame skew report) and q417 (SQL text). */
  protected def skewReportSql: String =
    """WITH c AS (
      |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
      |SELECT CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
      |  ROUND(SUM(c) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_per_key,
      |  ROUND(quantile_cont(c, 0.99), 6) AS p99_per_key,
      |  CAST(MAX(c) AS BIGINT) AS max_per_key,
      |  ROUND(MAX(c) / ROUND(SUM(c) / CAST(COUNT(*) AS DOUBLE), 6), 6)
      |    AS skew_ratio
      |FROM c""".stripMargin

  /** q407 oracle builder: one CTE block per tree level (assignment a_k,
    * node totals t_k, candidate cells c_k, prefix p_k, winners b_k), then
    * split rows from b_1..b_D and leaf rows from the final assignment's
    * totals (a row's final node is always a leaf; depth decodes from the
    * heap-ordered id).
    */
  protected def q407CartTreeSql: String = {
    val depth = 3
    val minLeaf = 5
    def assignCte(k: Int): String =
      if (k == 1)
        """a1 AS (SELECT x1, x2, y, CAST(1 AS BIGINT) AS node FROM d)
          |""".stripMargin
      else
        s""",a$k AS (
           |  SELECT a.x1, a.x2, a.y,
           |    CASE WHEN b.node IS NULL THEN a.node
           |      WHEN (b.feat = 'l_quantity' AND a.x1 <= b.thr)
           |        OR (b.feat = 'l_discount' AND a.x2 <= b.thr)
           |      THEN 2 * a.node ELSE 2 * a.node + 1 END AS node
           |  FROM a${k - 1} a LEFT JOIN b${k - 1} b ON a.node = b.node)
           |""".stripMargin
    def levelCtes(k: Int): String =
      s""",t$k AS (
         |  SELECT node, COUNT(*) AS nn,
         |    CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sn
         |  FROM a$k GROUP BY node),
         |c$k AS (
         |  SELECT node, feat, v, COUNT(*) AS nc,
         |    SUM(CAST(y AS DECIMAL(28,12))) AS sc
         |  FROM (
         |    SELECT node, 'l_quantity' AS feat, x1 AS v, y FROM a$k
         |    UNION ALL
         |    SELECT node, 'l_discount' AS feat, x2 AS v, y FROM a$k)
         |  GROUP BY node, feat, v),
         |p$k AS (
         |  SELECT node, feat, v,
         |    SUM(nc) OVER w AS nl,
         |    CAST(SUM(sc) OVER w AS DOUBLE) AS sl
         |  FROM c$k
         |  WINDOW w AS (PARTITION BY node, feat ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |b$k AS (
         |  SELECT node, feat, v AS thr, nn, gain FROM (
         |    SELECT p.node, p.feat, p.v, t.nn,
         |      ROUND((p.sl * p.sl / p.nl +
         |        (t.sn - p.sl) * (t.sn - p.sl) / (t.nn - p.nl)) / t.nn, 2)
         |        AS gain,
         |      ROW_NUMBER() OVER (PARTITION BY p.node
         |        ORDER BY ROUND((p.sl * p.sl / p.nl +
         |          (t.sn - p.sl) * (t.sn - p.sl) / (t.nn - p.nl)) / t.nn, 2)
         |          DESC, p.feat ASC, p.v ASC) AS rk
         |    FROM p$k p JOIN t$k t USING (node)
         |    WHERE p.nl >= $minLeaf AND t.nn - p.nl >= $minLeaf)
         |  WHERE rk = 1)
         |""".stripMargin
    val base =
      s"""WITH d AS (
         |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
         |    CAST(l_discount AS DOUBLE) AS x2,
         |    CAST(l_quantity AS DOUBLE) *
         |      (1.0 - CAST(l_discount AS DOUBLE)) * 1000.0 AS y
         |  FROM lineitem
         |  WHERE l_orderkey < 2000
         |    AND ((l_orderkey % 1000003) * 2654435761) % 5 <> 0),
         |""".stripMargin
    val levels = (1 to depth).map(k => assignCte(k) + levelCtes(k)).mkString
    val finalAssign = assignCte(depth + 1)
    val finalTotals =
      s""",t${depth + 1} AS (
         |  SELECT node, COUNT(*) AS nn,
         |    CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sn
         |  FROM a${depth + 1} GROUP BY node)
         |""".stripMargin
    val depthCase =
      """CASE WHEN node >= 8 THEN 3 WHEN node >= 4 THEN 2
        |    WHEN node >= 2 THEN 1 ELSE 0 END""".stripMargin
    val splitRows = (1 to depth).map { k =>
      s"""  SELECT CAST(node AS BIGINT) AS node, ${k - 1} AS depth,
         |    'split' AS kind, feat AS feature, thr AS threshold,
         |    CAST(nn AS BIGINT) AS n_rows, gain,
         |    CAST(NULL AS DOUBLE) AS prediction
         |  FROM b$k""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val leafRows =
      s"""  SELECT CAST(node AS BIGINT) AS node, $depthCase AS depth,
         |    'leaf' AS kind, CAST(NULL AS VARCHAR) AS feature,
         |    CAST(NULL AS DOUBLE) AS threshold, CAST(nn AS BIGINT) AS n_rows,
         |    CAST(NULL AS DOUBLE) AS gain, ROUND(sn / nn, 6) AS prediction
         |  FROM t${depth + 1}""".stripMargin
    base + levels.stripPrefix(",") + finalAssign + finalTotals +
      s"""SELECT * FROM (
         |$splitRows
         |  UNION ALL
         |$leafRows)
         |ORDER BY node""".stripMargin
  }

  /** Shared by q113 (batch PSI) and q131 (its streaming twin, which
    * CONVERGES to the batch answer on a bounded replay).
    */
  /** q146–q149: the Spark side IS SQL text ([[SqlText]]). `dedup` and
    * `funnel` are engine-portable, so the oracle is the identical string;
    * the drift/sessionize oracles are the proven q113/q83 DuckDB twins
    * (same semantics, epoch-function dialect only).
    */
  /** 60-bit BIGINT from a hex column's first 15 digits — the DuckDB replay
    * of SketchOps' `conv(substring(md5(x), 1, 15), 16, 10)`.
    */
  /** 40-bit BIGINT from a hex column's first 10 digits — the DuckDB
    * replay of `conv(substring(md5(x), 1, 10), 16, 10)` (winnowing
    * fingerprint hash).
    */
  protected def hexPoly10(hcol: String): String =
    (1 to 10).map(i =>
      s"(STRPOS('0123456789abcdef', SUBSTRING($hcol, $i, 1)) - 1) * ${BigInt(16).pow(10 - i)}")
      .mkString("(", "\n      + ", ")")

  /** Shared CTE prelude: the gap-filled (i, x) daily event-count spine
    * (exact zero counts on missing days) — the DuckDB replay of
    * `TimeSeriesOps.dailyCountSeries`.
    */
  protected def dailySeriesCtes: String =
    """counts AS (
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
      |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day)"""
      .stripMargin

  protected def pageHinkleySql: String =
    (s"""WITH $dailySeriesCtes,
        |cumx AS (
        |  SELECT i, x, SUM(x) OVER (ORDER BY i) AS cum FROM series),
        |inc AS (
        |  SELECT i, CAST(ROUND(CAST(x AS DOUBLE) -
        |    CAST(cum AS DOUBLE) / CAST(i + 1 AS DOUBLE) - 0.0, 9)
        |    AS DECIMAL(38,9)) AS inc
        |  FROM cumx),
        |mm AS (SELECT i, SUM(inc) OVER (ORDER BY i) AS m FROM inc),
        |ph AS (
        |  SELECT i, CAST(m - MIN(m) OVER (ORDER BY i) AS DOUBLE) AS ph,
        |    m
        |  FROM mm),
        |best AS (SELECT MAX(ph) AS best FROM ph),
        |tstar AS (
        |  SELECT MIN(i) AS t_star FROM ph, best WHERE ph = best),
        |tl AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days, MAX(ph) AS phmax,
        |    CAST(ARG_MAX(m, i) AS DOUBLE) AS mfinal
        |  FROM ph)
        |SELECT n_days, 0.0 AS delta, ROUND(phmax, 6) AS ph_stat,
        |  t_star, ROUND(mfinal, 6) AS m_final
        |FROM tl, tstar""").stripMargin

  protected def seasonalDecompositionSql: String =
    (s"""WITH $dailySeriesCtes,
        |ma AS (
        |  SELECT i, x,
        |    SUM(x) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING AND
        |      3 FOLLOWING) AS s7,
        |    COUNT(*) OVER (ORDER BY i ROWS BETWEEN 3 PRECEDING AND
        |      3 FOLLOWING) AS c7
        |  FROM series),
        |det AS (
        |  SELECT i, i % 7 AS phase,
        |    CAST(x AS DOUBLE) - CAST(s7 AS DOUBLE) / 7.0 AS d
        |  FROM ma WHERE c7 = 7),
        |byphase AS (
        |  SELECT phase, CAST(COUNT(*) AS BIGINT) AS n_obs,
        |    CAST(SUM(CAST(ROUND(d, 8) AS DECIMAL(38,8))) AS DOUBLE) /
        |      CAST(COUNT(*) AS DOUBLE) AS raw
        |  FROM det GROUP BY phase),
        |ctr AS (
        |  SELECT CAST(SUM(CAST(ROUND(raw, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) /
        |    CAST(COUNT(*) AS DOUBLE) AS mean
        |  FROM byphase),
        |idx AS (
        |  SELECT phase, n_obs, raw, raw - mean AS ctr
        |  FROM byphase, ctr),
        |rem AS (
        |  SELECT
        |    CAST(SUM(CAST(ROUND(d * d, 8) AS DECIMAL(38,8)))
        |      AS DOUBLE) AS sd2,
        |    CAST(SUM(CAST(ROUND((d - ctr) * (d - ctr), 8)
        |      AS DECIMAL(38,8))) AS DOUBLE) AS sr2
        |  FROM det JOIN idx USING (phase))
        |SELECT phase, n_obs, ROUND(raw, 6) + 0.0 AS seasonal_raw,
        |  ROUND(ctr, 6) + 0.0 AS seasonal_idx,
        |  ROUND(1.0 - sr2 / sd2, 6) + 0.0 AS seasonal_strength
        |FROM idx, rem ORDER BY phase""").stripMargin

  protected def hexPoly15(hcol: String): String =
    (1 to 15).map(i =>
      s"(STRPOS('0123456789abcdef', SUBSTRING($hcol, $i, 1)) - 1) * ${BigInt(16).pow(15 - i)}")
      .mkString("(", "\n      + ", ")")

  /** Value of the 7-hex-digit slice of digest `hcol` for depth `d`
    * (chars 1+7d .. 7+7d, 1-based) — the Spark side's
    * `conv(substring(md5(term), 1+7d, 7), 16, 10)`.
    */
  protected def hexPolySlice7(hcol: String, d: Int): String =
    (0 until 7).map(i =>
      s"(STRPOS('0123456789abcdef', SUBSTRING($hcol, ${1 + 7 * d + i}, 1)) - 1) * ${BigInt(16).pow(6 - i)}")
      .mkString("(", "\n      + ", ")")

  /** q357/q358 shared oracle: the AMS/count-sketch counter matrix and
    * F2 card replayed — batch and streaming builds produce the SAME
    * additive counters, so one SQL serves both.
    */
  protected def amsF2Sql: String = {
    val slices = (0 until 3).map { d =>
      s"""SELECT $d AS r,
         |    ${hexPolySlice7("hx", d)} % 64 AS b,
         |    CASE WHEN (${hexPolySlice7("hx", d)} // 64) % 2 = 0
         |      THEN 1 ELSE -1 END AS s
         |  FROM h""".stripMargin
    }.mkString("\n  UNION ALL\n  ")
    s"""WITH k AS (
       |  SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS k
       |  FROM events WHERE event_type IS NOT NULL),
       |h AS (SELECT md5(k) AS hx FROM k),
       |pr AS (
       |  $slices),
       |counters AS (
       |  SELECT r, b, CAST(SUM(s) AS BIGINT) AS c
       |  FROM pr GROUP BY r, b),
       |perrow AS (
       |  SELECT r, CAST(SUM(CAST(c AS HUGEINT) * c) AS BIGINT) AS est
       |  FROM counters GROUP BY r),
       |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS nr FROM perrow),
       |rk AS (
       |  SELECT est, ROW_NUMBER() OVER (ORDER BY est, r) AS rk
       |  FROM perrow),
       |med AS (
       |  SELECT est AS median_est FROM rk, nr
       |  WHERE rk = CAST(FLOOR((nr + 1) / 2.0) AS BIGINT)),
       |ex AS (
       |  SELECT CAST(SUM(CAST(f AS HUGEINT) * f) AS BIGINT) AS f2_exact
       |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS f FROM k GROUP BY k))
       |SELECT r, est, median_est, f2_exact,
       |  ROUND(CAST(median_est - f2_exact AS DOUBLE) /
       |    CAST(f2_exact AS DOUBLE), 6) AS rel_err
       |FROM perrow, med, ex ORDER BY r""".stripMargin
  }

  /** q206 oracle: the portable Bloom filter replayed — per-key bit
    * positions from the same 7-hex MD5 slices, filter = DISTINCT position
    * set of the build keys, pass = all distinct probe positions present,
    * card vs exact membership.
    */
  protected def q206BloomSql: String = {
    def posArms(src: String): String =
      (0 until 3).map(d =>
        s"SELECT k, ${hexPolySlice7("MD5(k)", d)} % 4096 AS pos FROM $src")
        .mkString("\n    UNION ALL ")
    s"""WITH bk AS (
       |  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders
       |  WHERE o_totalprice > 150000.0),
       |bp AS (SELECT DISTINCT pos FROM (
       |    ${posArms("bk")})),
       |pk AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k
       |  FROM customer),
       |pp AS (SELECT DISTINCT k, pos FROM (
       |    ${posArms("pk")})),
       |need AS (SELECT k, COUNT(*) AS need FROM pp GROUP BY k),
       |got AS (
       |  SELECT pp.k, COUNT(bp.pos) AS got
       |  FROM pp LEFT JOIN bp USING (pos) GROUP BY pp.k),
       |hits AS (
       |  SELECT need.k,
       |    CASE WHEN got.got = need.need THEN 1 ELSE 0 END AS pass
       |  FROM need JOIN got USING (k)),
       |j AS (
       |  SELECT h.k, h.pass, m.member
       |  FROM hits h LEFT JOIN (SELECT k, 1 AS member FROM bk) m USING (k)),
       |card AS (
       |  SELECT COUNT(*) AS n_probe_keys,
       |    CAST(SUM(pass) AS BIGINT) AS n_bloom_pass,
       |    CAST(SUM(COALESCE(member, 0)) AS BIGINT) AS n_true_members,
       |    CAST(SUM(CASE WHEN pass = 1 AND member IS NULL THEN 1 ELSE 0
       |      END) AS BIGINT) AS n_false_pos,
       |    CAST(SUM(CASE WHEN member IS NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS nn
       |  FROM j),
       |sz AS (
       |  SELECT (SELECT COUNT(*) FROM bk) AS n_build_keys,
       |    (SELECT COUNT(*) FROM bp) AS n_bits_set)
       |SELECT n_build_keys, n_bits_set,
       |  ROUND(CAST(n_bits_set AS DOUBLE) / 4096.0, 6) AS load,
       |  n_probe_keys, n_bloom_pass, n_true_members, n_false_pos,
       |  CASE WHEN nn > 0 THEN
       |    ROUND(CAST(n_false_pos AS DOUBLE) / CAST(nn AS DOUBLE), 6)
       |  END AS fp_rate
       |FROM card, sz""".stripMargin
  }

  /** q207 oracle: the contamination audit replayed — DuckDB builds the
    * same 5-gram strings (1-based inclusive list slices ≡ Spark's
    * slice(toks, i+1, n)), hashes them with the 15-hex MD5 polynomial,
    * and re-runs the distinct-set probe.
    */
  protected def q207ContaminationSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks,
       |    ((doc_id % 1000003) * 2654435761) % 20 AS b
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, b,
       |    MD5(array_to_string(toks[g.i:g.i + 4], ' ')) AS h
       |  FROM dt, UNNEST(range(1, len(toks) - 3)) AS g(i)
       |  WHERE len(toks) >= 5),
       |hg AS (
       |  SELECT doc_id, b,
       |    ${hexPoly15("h")} AS g
       |  FROM grams),
       |tg AS (SELECT DISTINCT g FROM hg WHERE b >= 1),
       |eg AS (SELECT DISTINCT doc_id, g FROM hg WHERE b < 1),
       |hits AS (
       |  SELECT eg.doc_id, COUNT(*) AS n_grams,
       |    CAST(SUM(CASE WHEN tg.g IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_hit
       |  FROM eg LEFT JOIN tg ON tg.g = eg.g
       |  GROUP BY eg.doc_id),
       |ev AS (SELECT doc_id FROM dt WHERE b < 1)
       |SELECT ev.doc_id, COALESCE(hits.n_grams, 0) AS n_grams,
       |  COALESCE(hits.n_hit, 0) AS n_hit,
       |  CASE WHEN COALESCE(hits.n_grams, 0) > 0 THEN
       |    ROUND(CAST(hits.n_hit AS DOUBLE) /
       |      CAST(hits.n_grams AS DOUBLE), 6)
       |  END AS overlap_frac,
       |  CASE WHEN (CASE WHEN COALESCE(hits.n_grams, 0) > 0 THEN
       |      ROUND(CAST(hits.n_hit AS DOUBLE) /
       |        CAST(hits.n_grams AS DOUBLE), 6) END) >= 0.2
       |    THEN 1 ELSE 0 END AS contaminated
       |FROM ev LEFT JOIN hits USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  /** q210 oracle: the one-pass sufficient statistics and the identical
    * fixed-parenthesization correlation arithmetic, one UNION arm per
    * column pair.
    */
  protected def q210CorrSql: String = {
    val cs = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    def d28(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(28,6))) AS DOUBLE)"
    val sums = cs.map(c => s"${d28(c)} AS s_$c") ++
      cs.map(c => s"${d28(s"$c * $c")} AS q_$c") ++
      (for { i <- cs.indices; j <- cs.indices if i < j }
        yield s"${d28(s"${cs(i)} * ${cs(j)}")} AS p_${cs(i)}_${cs(j)}")
    val arms = (for { i <- cs.indices; j <- cs.indices if i < j } yield {
      val (a, b) = (cs(i), cs(j))
      s"""  SELECT '$a' AS col_a, '$b' AS col_b, n,
         |    CASE WHEN (n * q_$a - s_$a * s_$a) > 0.0
         |        AND (n * q_$b - s_$b * s_$b) > 0.0 THEN
         |      ROUND((n * p_${a}_$b - s_$a * s_$b) /
         |        (SQRT(n * q_$a - s_$a * s_$a) *
         |         SQRT(n * q_$b - s_$b * s_$b)), 6)
         |    END AS corr
         |  FROM s""".stripMargin
    }).mkString("\n  UNION ALL\n")
    s"""WITH s AS (
       |  SELECT COUNT(*) AS n,
       |    ${sums.mkString(",\n    ")}
       |  FROM lineitem)
       |SELECT col_a, col_b, n, corr FROM (
       |$arms)
       |ORDER BY col_a, col_b""".stripMargin
  }

  /** q214 oracle: the full label-propagation pipeline replayed — q205's
    * IVF graph over ALL nodes (k=5, self excluded, non-negative weights),
    * then `rounds` unrolled mass rounds (decimal sums, windowed decimal
    * per-node totals, round-9 normalization, train clamp) and the final
    * holdout argmax confusion.
    */
  protected def q214LabelPropSql: String = {
    val rounds = 3
    val roundCtes = (1 to rounds).map { r =>
      s"""r$r AS (
         |  SELECT q_id AS id, lbl, ROUND(raw / tot, 9) AS m FROM (
         |    SELECT q_id, lbl, raw,
         |      CAST(SUM(CAST(raw AS DECIMAL(28,12)))
         |        OVER (PARTITION BY q_id) AS DOUBLE) AS tot
         |    FROM (
         |      SELECT e.q_id, m.lbl,
         |        CAST(SUM(CAST(e.w * m.m AS DECIMAL(28,12))) AS DOUBLE)
         |          AS raw
         |      FROM edges e JOIN m${r - 1} m ON m.id = e.nbr
         |      GROUP BY e.q_id, m.lbl))
         |  WHERE tot > 0),
         |m$r AS (
         |  SELECT id, lbl, m FROM r$r
         |  WHERE id NOT IN (SELECT id FROM m0)
         |  UNION ALL SELECT id, lbl, m FROM m0),""".stripMargin
    }.mkString("\n")
    s"""WITH e AS (
       |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb,
       |    ((vec_id % 1000003) * 2654435761) % 10 AS b
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
       |    FROM e t, cent c)
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
       |    FROM e t, cent c)
       |  WHERE pr <= 3),
       |cand AS (
       |  SELECT p.q_id, a.vec_id,
       |    ROUND(list_inner_product(a.emb, p.qe) /
       |      (SQRT(list_inner_product(a.emb, a.emb)) *
       |       SQRT(list_inner_product(p.qe, p.qe))), 6) AS cosine
       |  FROM assign a JOIN probes p USING (centroid_id)
       |  WHERE p.q_id <> a.vec_id),
       |edges AS (
       |  SELECT q_id, vec_id AS nbr, GREATEST(cosine, 0.0) AS w FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
       |    FROM cand)
       |  WHERE rank <= 5),
       |m0 AS (
       |  SELECT vec_id AS id, label AS lbl, 1.0 AS m FROM e WHERE b < 7),
       |$roundCtes
       |pred AS (
       |  SELECT id, lbl AS predicted FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY id ORDER BY m DESC, lbl ASC) AS rn
       |    FROM m$rounds WHERE id NOT IN (SELECT id FROM m0))
       |  WHERE rn = 1)
       |SELECT te.label AS actual, pred.predicted, COUNT(*) AS n_rows
       |FROM (SELECT vec_id, label FROM e WHERE b >= 7) te
       |LEFT JOIN pred ON pred.id = te.vec_id
       |GROUP BY te.label, pred.predicted
       |ORDER BY actual, predicted""".stripMargin
  }

  /** q216 oracle: the q27 MinHash/LSH replay split into kept (buckets
    * 0-6) and new (7-9) sides, the kept side's distinct band store
    * left-joined onto the new side's band rows.
    */
  protected def q216IncrementalDedupSql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    val bandArms = (0 until 8).map { b =>
      val cols = (b * 4 until b * 4 + 4).map(i => s"mh_$i")
        .mkString(" || '#' || ")
      s"SELECT doc_id, b, $b AS band, MD5($cols) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk,
       |    ((doc_id % 1000003) * 2654435761) % 10 AS b
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, b, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id, b,
       |    $mhs
       |  FROM sh GROUP BY doc_id, b),
       |bands AS (
       |  $bandArms),
       |kb AS (SELECT DISTINCT band, bh FROM bands WHERE b < 7),
       |nb AS (SELECT doc_id, band, bh FROM bands WHERE b >= 7),
       |coll AS (
       |  SELECT nb.doc_id,
       |    CAST(SUM(CASE WHEN kb.band IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_band_collisions
       |  FROM nb LEFT JOIN kb ON kb.band = nb.band AND kb.bh = nb.bh
       |  GROUP BY nb.doc_id)
       |SELECT nd.doc_id,
       |  COALESCE(coll.n_band_collisions, 0) AS n_band_collisions,
       |  CASE WHEN COALESCE(coll.n_band_collisions, 0) = 0 THEN 1 ELSE 0
       |    END AS admitted
       |FROM (SELECT doc_id FROM toks WHERE b >= 7) nd
       |LEFT JOIN coll USING (doc_id)
       |ORDER BY doc_id""".stripMargin
  }

  /** q227 oracle: the three-wave admit-and-verify ingest replayed — the
    * q216 minhash/band machinery with the hash-bucket wave split, q225's
    * exact Levenshtein arithmetic run only on each wave's banded
    * collisions against the PREVIOUSLY-ADMITTED store, admitted sets
    * chained wave over wave.
    */
  protected def q227IngestDedupSql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    val bandArms = (0 until 8).map { b =>
      val cols = (b * 4 until b * 4 + 4).map(i => s"mh_$i")
        .mkString(" || '#' || ")
      s"SELECT doc_id, w, $b AS band, MD5($cols) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val sim = """CASE WHEN GREATEST(LENGTH(ta.t), LENGTH(tb.t)) > 0 THEN
                |      ROUND(1.0 - CAST(levenshtein(ta.t, tb.t) AS DOUBLE) /
                |        CAST(GREATEST(LENGTH(ta.t), LENGTH(tb.t)) AS DOUBLE),
                |        6)
                |    ELSE 1.0 END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk,
       |    CASE WHEN ((doc_id % 1000003) * 2654435761) % 10 < 4 THEN 0
       |         WHEN ((doc_id % 1000003) * 2654435761) % 10 < 7 THEN 1
       |         ELSE 2 END AS w
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, w, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id, w,
       |    $mhs
       |  FROM sh GROUP BY doc_id, w),
       |bands AS (
       |  $bandArms),
       |txt AS (
       |  SELECT doc_id, SUBSTRING(TRIM(text), 1, 200) AS t
       |  FROM documents),
       |adm0 AS (SELECT doc_id FROM toks WHERE w = 0),
       |c1 AS (
       |  SELECT DISTINCT k.doc_id AS kept, n.doc_id AS doc_id
       |  FROM bands n JOIN bands k ON k.band = n.band AND k.bh = n.bh
       |  WHERE n.w = 1 AND k.w = 0),
       |v1 AS (
       |  SELECT c1.doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |    CAST(SUM(CASE WHEN ($sim) >= 0.8 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_verified
       |  FROM c1 JOIN txt ta ON ta.doc_id = c1.kept
       |    JOIN txt tb ON tb.doc_id = c1.doc_id
       |  GROUP BY c1.doc_id),
       |r1 AS (
       |  SELECT t.doc_id,
       |    CAST(COALESCE(v1.n_candidates, 0) AS BIGINT) AS n_candidates,
       |    CAST(COALESCE(v1.n_verified, 0) AS BIGINT) AS n_verified,
       |    CASE WHEN COALESCE(v1.n_verified, 0) = 0
       |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS admitted
       |  FROM (SELECT doc_id FROM toks WHERE w = 1) t
       |  LEFT JOIN v1 USING (doc_id)),
       |keep2 AS (
       |  SELECT doc_id FROM adm0
       |  UNION ALL SELECT doc_id FROM r1 WHERE admitted = 1),
       |c2 AS (
       |  SELECT DISTINCT k.doc_id AS kept, n.doc_id AS doc_id
       |  FROM bands n JOIN bands k ON k.band = n.band AND k.bh = n.bh
       |  JOIN keep2 ON keep2.doc_id = k.doc_id
       |  WHERE n.w = 2),
       |v2 AS (
       |  SELECT c2.doc_id, CAST(COUNT(*) AS BIGINT) AS n_candidates,
       |    CAST(SUM(CASE WHEN ($sim) >= 0.8 THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_verified
       |  FROM c2 JOIN txt ta ON ta.doc_id = c2.kept
       |    JOIN txt tb ON tb.doc_id = c2.doc_id
       |  GROUP BY c2.doc_id),
       |r2 AS (
       |  SELECT t.doc_id,
       |    CAST(COALESCE(v2.n_candidates, 0) AS BIGINT) AS n_candidates,
       |    CAST(COALESCE(v2.n_verified, 0) AS BIGINT) AS n_verified,
       |    CASE WHEN COALESCE(v2.n_verified, 0) = 0
       |      THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS admitted
       |  FROM (SELECT doc_id FROM toks WHERE w = 2) t
       |  LEFT JOIN v2 USING (doc_id))
       |SELECT doc_id, wave, n_candidates, n_verified, admitted FROM (
       |  SELECT doc_id, CAST(0 AS BIGINT) AS wave,
       |    CAST(0 AS BIGINT) AS n_candidates,
       |    CAST(0 AS BIGINT) AS n_verified,
       |    CAST(1 AS BIGINT) AS admitted
       |  FROM adm0
       |  UNION ALL SELECT doc_id, CAST(1 AS BIGINT) AS wave,
       |    n_candidates, n_verified, admitted FROM r1
       |  UNION ALL SELECT doc_id, CAST(2 AS BIGINT) AS wave,
       |    n_candidates, n_verified, admitted FROM r2)
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE chain of q228/q229: draws, coarse assignment, PQ coding,
    * probe pruning, the asymmetric lookup table, and the per-candidate
    * decimal lookup sum (`cand`).
    */
  protected def ivfAdcCoreCtes: String = {
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    def sliceA =
      "cb.anchor[CAST(sv.subspace * 8 + 1 AS INT):" +
        "CAST(sv.subspace * 8 + 8 AS INT)]"
    def sliceQ =
      "cb.anchor[CAST(qs.subspace * 8 + 1 AS INT):" +
        "CAST(qs.subspace * 8 + 8 AS INT)]"
    s"""e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings WHERE vec_id < 200),
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
       |    SELECT e.vec_id, e.emb, c.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
       |        ROUND(${lip("e.emb", "c.centroid")} /
       |          (SQRT(${lip("e.emb", "e.emb")}) *
       |           SQRT(${lip("c.centroid", "c.centroid")})), 6)
       |          DESC,
       |        c.centroid_id) AS rn
       |    FROM e, cent c)
       |  WHERE rn = 1),
       |drawn2 AS (
       |  SELECT vec_id, emb,
       |    (((((((vec_id + 1) % 1000003) * 2654435761) % 1000003)
       |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
       |  FROM e),
       |cb AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
       |      AS code,
       |    emb AS anchor
       |  FROM (SELECT * FROM drawn2 ORDER BY d, vec_id LIMIT 4)),
       |sv AS (
       |  SELECT a.vec_id, a.centroid_id, CAST(s AS INT) AS subspace,
       |    a.emb[CAST(s * 8 + 1 AS INT):CAST(s * 8 + 8 AS INT)] AS sv
       |  FROM assign a, range(0, 8) t(s)),
       |codes AS (
       |  SELECT vec_id, centroid_id, subspace, code FROM (
       |    SELECT sv.vec_id, sv.centroid_id, sv.subspace, cb.code,
       |      ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.subspace
       |        ORDER BY
       |          ROUND(${lip("sv.sv", "sv.sv")} -
       |            2.0 * ${lip("sv.sv", sliceA)} +
       |            ${lip(sliceA, sliceA)}, 6) ASC,
       |          cb.code ASC) AS rn
       |    FROM sv, cb)
       |  WHERE rn = 1),
       |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 20),
       |probes AS (
       |  SELECT q_id, centroid_id FROM (
       |    SELECT q.q_id, c.centroid_id,
       |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
       |        ROUND(${lip("q.qe", "c.centroid")} /
       |          (SQRT(${lip("q.qe", "q.qe")}) *
       |           SQRT(${lip("c.centroid", "c.centroid")})), 6)
       |          DESC,
       |        c.centroid_id) AS pr
       |    FROM q, cent c)
       |  WHERE pr <= 3),
       |qs AS (
       |  SELECT q_id, CAST(s AS INT) AS subspace,
       |    qe[CAST(s * 8 + 1 AS INT):CAST(s * 8 + 8 AS INT)] AS qs
       |  FROM q, range(0, 8) t(s)),
       |adc AS (
       |  SELECT qs.q_id, qs.subspace, cb.code,
       |    ROUND(${lip("qs.qs", "qs.qs")} -
       |      2.0 * ${lip("qs.qs", sliceQ)} +
       |      ${lip(sliceQ, sliceQ)}, 6) AS d2q
       |  FROM qs, cb),
       |cand AS (
       |  SELECT p.q_id, c.vec_id,
       |    ROUND(CAST(SUM(CAST(a.d2q AS DECIMAL(28,6))) AS DOUBLE), 6)
       |      AS adc_dist
       |  FROM codes c JOIN probes p USING (centroid_id)
       |  JOIN adc a ON a.q_id = p.q_id AND a.subspace = c.subspace
       |    AND a.code = c.code
       |  WHERE p.q_id <> c.vec_id
       |  GROUP BY p.q_id, c.vec_id)""".stripMargin
  }

  /** q228 oracle: IVFADC replayed — q182's coarse draw/assignment/probes,
    * q193's salt-shifted anchor draw and subspace slices, per-(vector,
    * subspace) argmin coding, the asymmetric query-to-anchor lookup
    * table, and the decimal lookup-sum ranking.
    */
  protected def q228IvfAdcSql: String =
    s"""WITH $ivfAdcCoreCtes
       |SELECT q_id, vec_id, adc_dist, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY adc_dist ASC, vec_id) AS BIGINT)
       |    AS rank
       |  FROM cand)
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin

  /** q229 oracle: q228's ADC candidate chain, shortlist depth 10, then
    * EXACT rounded-cosine re-rank over only the shortlisted rows.
    */
  protected def q229IvfAdcRerankSql: String = {
    def lip(a: String, b: String) = s"list_inner_product($a, $b)"
    s"""WITH $ivfAdcCoreCtes,
       |shortlist AS (
       |  SELECT q_id, vec_id, adc_dist FROM (
       |    SELECT *, ROW_NUMBER() OVER (
       |      PARTITION BY q_id ORDER BY adc_dist ASC, vec_id) AS sr
       |    FROM cand)
       |  WHERE sr <= 10),
       |rer AS (
       |  SELECT s.q_id, s.vec_id, s.adc_dist,
       |    ROUND(${lip("ce.emb", "qq.qe")} /
       |      (SQRT(${lip("ce.emb", "ce.emb")}) *
       |       SQRT(${lip("qq.qe", "qq.qe")})), 6) AS cosine
       |  FROM shortlist s
       |  JOIN e ce ON ce.vec_id = s.vec_id
       |  JOIN q qq ON qq.q_id = s.q_id)
       |SELECT q_id, vec_id, cosine, adc_dist, rank FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (
       |    PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS BIGINT)
       |    AS rank
       |  FROM rer)
       |WHERE rank <= 3
       |ORDER BY q_id, rank""".stripMargin
  }

  /** q219 oracle: farthest-point traversal unrolled (the q194 chained-CTE
    * convention) — portable-draw seed, per-step argmax by (mind DESC, id),
    * LEAST min-distance update with the identical rounded-cosine
    * distance.
    */
  protected def q219KCenterSql: String = {
    val k = 8
    def cosDist(a: String, b: String) =
      s"""1.0 - ROUND(list_inner_product($a, $b) /
         |      (SQRT(list_inner_product($a, $a)) *
         |       SQRT(list_inner_product($b, $b))), 6)""".stripMargin
    val steps = (2 to k).map { t =>
      s"""c$t AS (
         |  SELECT id AS cid, emb AS cemb, mind AS radius
         |  FROM s${t - 1} ORDER BY mind DESC, id LIMIT 1),
         |s$t AS (
         |  SELECT s.id, s.emb,
         |    LEAST(s.mind, ${cosDist("s.emb", "c.cemb")}) AS mind
         |  FROM s${t - 1} s, c$t c),""".stripMargin
    }.mkString("\n")
    val out = (2 to k).map(t =>
      s"""  UNION ALL SELECT $t AS step, (SELECT cid FROM c$t) AS center_id,
         |    ROUND((SELECT radius FROM c$t), 6) AS radius""".stripMargin)
      .mkString("\n")
    s"""WITH e AS (
       |  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |seed AS (
       |  SELECT id, emb FROM (
       |    SELECT id, emb,
       |      ((((((id % 1000003) * 2654435761) % 1000003)
       |          + (id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
       |    FROM e)
       |  ORDER BY d, id LIMIT 1),
       |s1 AS (
       |  SELECT e.id, e.emb, ${cosDist("e.emb", "seed.emb")} AS mind
       |  FROM e, seed),
       |$steps
       |fin AS (
       |  SELECT 1 AS step, (SELECT id FROM seed) AS center_id,
       |    CAST(NULL AS DOUBLE) AS radius
       |$out)
       |SELECT step, center_id, radius FROM fin ORDER BY step""".stripMargin
  }

  /** q225 oracle: q27's MinHash/LSH candidate generation, then the exact
    * Levenshtein verification on 200-char prefixes — integer distances,
    * one rounded division for the verdict.
    */
  protected def q225VerifiedPairsSql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    val bandArms = (0 until 8).map { b =>
      val cols = (b * 4 until b * 4 + 4).map(i => s"mh_$i")
        .mkString(" || '#' || ")
      s"SELECT doc_id, $b AS band, MD5($cols) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    val sim = """CASE WHEN GREATEST(LENGTH(ta.t), LENGTH(tb.t)) > 0 THEN
                |    ROUND(1.0 - CAST(levenshtein(ta.t, tb.t) AS DOUBLE) /
                |      CAST(GREATEST(LENGTH(ta.t), LENGTH(tb.t)) AS DOUBLE),
                |      6)
                |  ELSE 1.0 END""".stripMargin
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandArms),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |txt AS (
       |  SELECT doc_id, SUBSTRING(TRIM(text), 1, 200) AS t
       |  FROM documents)
       |SELECT p.id_a, p.id_b,
       |  CAST(levenshtein(ta.t, tb.t) AS BIGINT) AS prefix_lev,
       |  $sim AS prefix_sim,
       |  CASE WHEN ($sim) >= 0.8 THEN 1 ELSE 0 END AS verified
       |FROM pairs p
       |JOIN txt ta ON ta.doc_id = p.id_a
       |JOIN txt tb ON tb.doc_id = p.id_b
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q212 oracle: the add-one unigram LM replayed — same train/eval hash
    * slices, ln p per vocab row, per-doc decimal log-likelihood sums,
    * perplexity exponentiated from the ROUNDED cross-entropy.
    */
  protected def q212PerplexitySql: String =
    """WITH dt AS (
      |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks,
      |    ((doc_id % 1000003) * 2654435761) % 20 AS b
      |  FROM documents),
      |train AS (
      |  SELECT u.token, COUNT(*) AS c
      |  FROM dt, UNNEST(toks) AS u(token)
      |  WHERE b >= 1 AND u.token <> ''
      |  GROUP BY u.token),
      |scal AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS v FROM train),
      |lm AS (
      |  SELECT token,
      |    LN((CAST(c AS DOUBLE) + 1.0) /
      |      (CAST(n AS DOUBLE) + CAST(v AS DOUBLE))) AS lnp
      |  FROM train, scal),
      |et AS (
      |  SELECT doc_id, u.token, COUNT(*) AS cnt
      |  FROM dt, UNNEST(toks) AS u(token)
      |  WHERE b < 1 AND u.token <> ''
      |  GROUP BY doc_id, u.token),
      |sc AS (
      |  SELECT et.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
      |    CAST(SUM(CAST(
      |      COALESCE(lm.lnp,
      |        LN(1.0 / (CAST(scal.n AS DOUBLE) + CAST(scal.v AS DOUBLE))))
      |      * CAST(cnt AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS ll
      |  FROM et LEFT JOIN lm USING (token), scal
      |  GROUP BY et.doc_id),
      |ev AS (SELECT doc_id FROM dt WHERE b < 1)
      |SELECT ev.doc_id, COALESCE(sc.n_tokens, 0) AS n_tokens,
      |  ROUND(-ll / CAST(sc.n_tokens AS DOUBLE), 6) AS cross_entropy,
      |  ROUND(EXP(ROUND(-ll / CAST(sc.n_tokens AS DOUBLE), 6)), 6)
      |    AS perplexity
      |FROM ev LEFT JOIN sc USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** CMS counter CTE arms: every depth's bucket comes from its own
    * disjoint 7-hex-digit slice of ONE MD5 digest per term (mirrors the
    * Spark side's single-digest draw). `termExpr` must already be a
    * VARCHAR expression.
    */
  protected def cmsBucketArms(src: String, termExpr: String, cntCol: String,
      depth: Int, width: Int): String =
    (0 until depth).map { d =>
      s"""SELECT depth, ${hexPolySlice7("h", d)} % $width AS bucket, __c FROM (
         |    SELECT $d AS depth, MD5($termExpr) AS h, $cntCol AS __c
         |    FROM $src)""".stripMargin
    }.mkString("\n  UNION ALL ")

  /** q123 oracle: replay the count-min sketch verbatim — portable MD5
    * bucket draws, exact BIGINT counter sums, min-over-depths estimates
    * for the exact top-20 terms.
    */
  protected def q123CmsSql: String = {
    val arms = cmsBucketArms("tc", "term", "n_exact", depth = 4, width = 256)
    s"""WITH terms AS (
       |  SELECT unnest(string_split(trim(text), ' ')) AS term FROM documents),
       |tc AS (SELECT term, COUNT(*) AS n_exact FROM terms GROUP BY term),
       |buckets AS (
       |  $arms),
       |counters AS (
       |  SELECT depth, bucket, CAST(SUM(__c) AS BIGINT) AS counter
       |  FROM buckets GROUP BY depth, bucket),
       |top AS (
       |  SELECT term, n_exact FROM tc ORDER BY n_exact DESC, term LIMIT 20),
       |probes AS (
       |  ${(0 until 4).map(d =>
            s"SELECT term, n_exact, $d AS depth, ${hexPolySlice7("MD5(term)", d)} % 256 AS bucket FROM top")
            .mkString("\n  UNION ALL ")}),
       |est AS (
       |  SELECT p.term, MIN(p.n_exact) AS n_exact, MIN(c.counter) AS n_estimate
       |  FROM probes p JOIN counters c USING (depth, bucket)
       |  GROUP BY p.term)
       |SELECT term, n_exact, n_estimate, n_estimate - n_exact AS overcount
       |FROM est
       |ORDER BY n_exact DESC, term""".stripMargin
  }

  /** q136 oracle: CMS join-cardinality estimate — both counter matrices
    * replayed with the portable draw, inner product per depth, min over
    * depths, against the exact join size.
    */
  protected def q136CmsSql: String = {
    val aArms = cmsBucketArms("li", "CAST(k AS VARCHAR)", "n",
      depth = 4, width = 65536)
    val bArms = cmsBucketArms("ord", "CAST(k AS VARCHAR)", "n",
      depth = 4, width = 65536)
    s"""WITH li AS (
       |  SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
       |ord AS (
       |  SELECT o_orderkey AS k, COUNT(*) AS n FROM orders GROUP BY 1),
       |ba AS (
       |  $aArms),
       |bb AS (
       |  $bArms),
       |ca AS (SELECT depth, bucket, CAST(SUM(__c) AS BIGINT) AS counter
       |  FROM ba GROUP BY 1, 2),
       |cb AS (SELECT depth, bucket, CAST(SUM(__c) AS BIGINT) AS counter
       |  FROM bb GROUP BY 1, 2),
       |dots AS (
       |  SELECT ca.depth, CAST(SUM(ca.counter * cb.counter) AS BIGINT) AS dot
       |  FROM ca JOIN cb USING (depth, bucket) GROUP BY ca.depth),
       |est AS (SELECT MIN(dot) AS est_join_rows FROM dots),
       |exact AS (
       |  SELECT CAST(COALESCE(SUM(li.n * ord.n), 0) AS BIGINT) AS exact_join_rows
       |  FROM li JOIN ord USING (k))
       |SELECT est_join_rows, exact_join_rows,
       |  ROUND(CAST(est_join_rows AS DOUBLE) / exact_join_rows, 6) AS over_ratio
       |FROM est CROSS JOIN exact""".stripMargin
  }

  /** q159 oracle: the order-invariant content fingerprint — portable
    * 60-bit MD5 row hash summed exactly (HUGEINT; no wraparound
    * convention to match), emitted as a string.
    */
  protected def q159FingerprintSql: String = {
    val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_returnflag", "l_linestatus")
    val kw = cols.map(c => s"COALESCE(CAST($c AS VARCHAR), 'null')")
      .mkString("CONCAT_WS('|', ", ", ", ")")
    s"""WITH k AS (SELECT $kw AS k FROM lineitem),
       |h AS (SELECT MD5(k) AS hx FROM k)
       |SELECT COUNT(*) AS n_rows,
       |  CAST(CAST(SUM(${hexPoly15("hx")}) AS HUGEINT) AS VARCHAR)
       |    AS fingerprint
       |FROM h""".stripMargin
  }

  /** q160 oracle: replay the capstone curation chain end-to-end —
    * quality/langid gate, MD5 dedup canonicalization, 3-gram
    * decontamination vs the src0 slice, the two-round priority draw, and
    * the sampled corpus's fingerprint. Assembled from the q13/q14/q64/
    * q76/q135/q159 oracle fragments.
    */
  /** q161 oracle: BM25 replayed on exact corpus counts. Float constants
    * are CAST to DOUBLE so DuckDB's decimal-literal typing never triggers
    * decimal division (the construction mirrors the Spark expression
    * operation-for-operation); per-term contributions round to 6 and sum
    * as exact decimals, so doc scores are addition-order-free.
    */
  protected def q161Bm25Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |corpus AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
      |  FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term IN ('spark', 'vector', 'hash') GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id, COUNT(*) AS n_terms_hit,
      |    CAST(SUM(CAST(ROUND(
      |      LN(CAST(1.0 AS DOUBLE) +
      |        ((n.n_docs - dfreq.df) + CAST(0.5 AS DOUBLE)) /
      |        (dfreq.df + CAST(0.5 AS DOUBLE))) *
      |      (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
      |      (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) +
      |        CAST(0.75 AS DOUBLE) *
      |        (CAST(dl.dl * n.n_docs AS DOUBLE) /
      |         CAST(n.sum_dl AS DOUBLE)))),
      |    6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      |  FROM tf
      |  JOIN dfreq USING (term)
      |  JOIN dl USING (doc_id)
      |  CROSS JOIN corpus n
      |  GROUP BY tf.doc_id)
      |SELECT doc_id, n_terms_hit, bm25 FROM scored
      |ORDER BY bm25 DESC, doc_id
      |LIMIT 15""".stripMargin

  /** q162 oracle: the portable HLL replayed register-for-register — MD5
    * 60-bit hash, low 6 bits → register, leading-zero rank via binary
    * string length (exact, no float log), merge = max, and the scaled
    * register sum as exact BIGINT (64·2⁵⁵ < 2⁶³). The ALL row is built
    * from the GROUP registers, mirroring the Spark side's merge path.
    */
  protected def q162HllSql: String = {
    val h = hexPoly15("MD5('hll#' || CAST(k AS VARCHAR))")
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS grp, l_orderkey AS k FROM lineitem),
       |hashed AS (SELECT grp, $h AS h FROM keyed),
       |rho AS (
       |  SELECT grp, h % 64 AS j,
       |    CASE WHEN (h >> 6) = 0 THEN 55
       |      ELSE 55 - length(to_base(h >> 6, 2)) END AS rho
       |  FROM hashed),
       |regs0 AS (SELECT grp, j, MAX(rho) AS m_j FROM rho GROUP BY 1, 2),
       |regs AS (
       |  SELECT grp, j, m_j FROM regs0
       |  UNION ALL
       |  SELECT 'ALL' AS grp, j, MAX(m_j) AS m_j FROM regs0 GROUP BY j),
       |agg AS (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_registers_hit,
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - m_j AS INT)) AS BIGINT)
       |      AS sum_hit
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT grp, n_registers_hit,
       |    64 - n_registers_hit AS zeros,
       |    CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) *
       |      CAST(36028797018963968 AS DOUBLE) /
       |      CAST(sum_hit +
       |        (64 - n_registers_hit) * (CAST(1 AS BIGINT) << 55)
       |        AS DOUBLE) AS raw
       |  FROM agg),
       |final AS (
       |  SELECT grp, n_registers_hit,
       |    ROUND(CASE WHEN raw <= CAST(160.0 AS DOUBLE) AND zeros > 0
       |      THEN CAST(64.0 AS DOUBLE) *
       |        LN(CAST(64.0 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |      ELSE raw END, 6) AS hll_estimate
       |  FROM est),
       |exact AS (
       |  SELECT grp, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact FROM (
       |    SELECT grp, k FROM keyed
       |    UNION ALL
       |    SELECT 'ALL' AS grp, k FROM keyed)
       |  GROUP BY 1)
       |SELECT f.grp, n_registers_hit, hll_estimate, n_exact,
       |  ROUND((hll_estimate - n_exact) / CAST(n_exact AS DOUBLE), 6)
       |    AS rel_err
       |FROM final f JOIN exact USING (grp)
       |ORDER BY grp""".stripMargin
  }

  /** q190 oracle: the q162 register pipeline over click/purchase user
    * sets, union = element-wise register max, inclusion-exclusion card —
    * every register and both estimates exact-integer replayed.
    */
  protected def q190HllIntersectSql: String = {
    val h = hexPoly15("MD5('hll#' || CAST(k AS VARCHAR))")
    s"""WITH keyed AS (
       |  SELECT event_type AS grp, user_id AS k FROM events
       |  WHERE event_type IN ('click', 'purchase')),
       |hashed AS (SELECT grp, $h AS h FROM keyed),
       |rho AS (
       |  SELECT grp, h % 64 AS j,
       |    CASE WHEN (h >> 6) = 0 THEN 55
       |      ELSE 55 - length(to_base(h >> 6, 2)) END AS rho
       |  FROM hashed),
       |regs0 AS (SELECT grp, j, MAX(rho) AS m_j FROM rho GROUP BY 1, 2),
       |regs AS (
       |  SELECT grp, j, m_j FROM regs0
       |  UNION ALL
       |  SELECT 'UNION' AS grp, j, MAX(m_j) AS m_j FROM regs0 GROUP BY j),
       |agg AS (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_registers_hit,
       |    CAST(SUM(CAST(1 AS BIGINT) << CAST(55 - m_j AS INT)) AS BIGINT)
       |      AS sum_hit
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT grp, n_registers_hit,
       |    64 - n_registers_hit AS zeros,
       |    CAST(0.709 AS DOUBLE) * CAST(4096.0 AS DOUBLE) *
       |      CAST(36028797018963968 AS DOUBLE) /
       |      CAST(sum_hit +
       |        (64 - n_registers_hit) * (CAST(1 AS BIGINT) << 55)
       |        AS DOUBLE) AS raw
       |  FROM agg),
       |final AS (
       |  SELECT grp,
       |    ROUND(CASE WHEN raw <= CAST(160.0 AS DOUBLE) AND zeros > 0
       |      THEN CAST(64.0 AS DOUBLE) *
       |        LN(CAST(64.0 AS DOUBLE) / CAST(zeros AS DOUBLE))
       |      ELSE raw END, 6) AS hll_estimate
       |  FROM est),
       |wide AS (
       |  SELECT
       |    MAX(CASE WHEN grp = 'click' THEN hll_estimate END) AS est_click,
       |    MAX(CASE WHEN grp = 'purchase' THEN hll_estimate END)
       |      AS est_purchase,
       |    MAX(CASE WHEN grp = 'UNION' THEN hll_estimate END) AS est_union
       |  FROM final),
       |wide2 AS (
       |  SELECT est_click, est_purchase, est_union,
       |    ROUND(est_click + est_purchase - est_union, 6) AS est_both
       |  FROM wide),
       |exact AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS exact_both FROM (
       |    SELECT k FROM keyed WHERE grp = 'click'
       |    INTERSECT
       |    SELECT k FROM keyed WHERE grp = 'purchase'))
       |SELECT est_click, est_purchase, est_union, est_both, exact_both,
       |  ROUND(ABS(est_both - exact_both) / CAST(exact_both AS DOUBLE), 6)
       |    AS rel_err
       |FROM wide2 CROSS JOIN exact""".stripMargin
  }

  /** q163 oracle: sign-random-projection signatures replayed with the
    * same MD5-parity planes over floor-scaled integer vectors (projection
    * = exact integer sum), then the bucket-keyed pair join with
    * `list_inner_product` cosines — the proven q37 surface — averaged
    * through exact decimals.
    */
  protected def q163LshSql: String =
    """WITH signs AS (
      |  SELECT b, i,
      |    CASE WHEN (STRPOS('0123456789abcdef',
      |        SUBSTRING(MD5('hp' || b || '_' || i), 1, 1)) - 1) % 2 = 0
      |      THEN 1 ELSE -1 END AS s
      |  FROM range(0, 8) t(b), range(0, 64) u(i)),
      |scaled AS (
      |  SELECT vec_id, u.i AS i,
      |    CAST(FLOOR(CAST(embedding[u.i + 1] AS DOUBLE) *
      |      CAST(1000000.0 AS DOUBLE)) AS BIGINT) AS sv
      |  FROM embeddings, range(0, 64) u(i)),
      |proj AS (
      |  SELECT vec_id, b, SUM(s * sv) AS p
      |  FROM scaled JOIN signs USING (i) GROUP BY 1, 2),
      |sig AS (
      |  SELECT vec_id, CAST(SUM(
      |      CASE WHEN p >= 0 THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
      |        ELSE 0 END) AS BIGINT) AS signature
      |  FROM proj GROUP BY 1),
      |e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |pairs AS (
      |  SELECT sa.signature,
      |    ROUND(list_inner_product(a.emb, b.emb) /
      |      (SQRT(list_inner_product(a.emb, a.emb)) *
      |       SQRT(list_inner_product(b.emb, b.emb))), 6) AS c
      |  FROM sig sa
      |  JOIN sig sb ON sa.signature = sb.signature AND sa.vec_id < sb.vec_id
      |  JOIN e a ON a.vec_id = sa.vec_id
      |  JOIN e b ON b.vec_id = sb.vec_id),
      |pa AS (
      |  SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |    ROUND(CAST(SUM(CAST(c AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
      |      AS avg_cosine
      |  FROM pairs GROUP BY 1),
      |bkt AS (
      |  SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    MIN(vec_id) AS min_vec_id
      |  FROM sig GROUP BY 1)
      |SELECT bkt.signature, n_vecs, min_vec_id,
      |  CAST(COALESCE(n_pairs, 0) AS BIGINT) AS n_pairs, avg_cosine
      |FROM bkt LEFT JOIN pa USING (signature)
      |ORDER BY signature""".stripMargin

  /** q164 oracle: the bounded-window EWMA replayed lag-for-lag in EXACT
    * INTEGER arithmetic — value×10⁴ and weight×10⁷ integers, BIGINT
    * sums, one `//` floor division (values non-negative, so it equals
    * Spark's truncating `div`). No float touches `ewma_micro`; the
    * display `ewma` is one deterministic IEEE division by 10⁶.
    */
  protected def q164EwmaSql: String = {
    val weights = (0 until 8)
      .map(j => (BigDecimal("0.8").pow(j) * BigDecimal(10).pow(7)).toLongExact)
    val lagged = (1 until 8)
      .map(j => s"LAG(x, $j) OVER w AS x$j").mkString(",\n      |    ")
    val num = weights.zipWithIndex.map { case (w, j) =>
      val xj = if (j == 0) "x" else s"x$j"
      s"COALESCE($xj * $w, 0)"
    }.mkString(" +\n      |      ")
    val den = weights.zipWithIndex.map { case (w, j) =>
      val xj = if (j == 0) "x" else s"x$j"
      s"COALESCE(CASE WHEN $xj IS NOT NULL THEN $w END, 0)"
    }.mkString(" +\n      |      ")
    s"""WITH e AS (
       |  SELECT user_id, ts, event_id, value,
       |    CAST(CAST(value AS DECIMAL(28,4)) * 10000 AS BIGINT) AS x
       |  FROM events),
       |l AS (
       |  SELECT user_id, ts, event_id, value, x,
       |    $lagged
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |s AS (
       |  SELECT user_id, ts, event_id, value,
       |    CAST(($num) AS BIGINT) AS num,
       |    CAST(($den) AS BIGINT) AS den
       |  FROM l)
       |SELECT user_id, ts, event_id, value,
       |  CASE WHEN den = 0 THEN NULL
       |    ELSE CAST((num * 100) // den AS BIGINT) END AS ewma_micro,
       |  CASE WHEN den = 0 THEN NULL
       |    ELSE CAST((num * 100) // den AS BIGINT) END /
       |    CAST(1000000.0 AS DOUBLE) AS ewma
       |FROM s
       |ORDER BY user_id, ts, event_id""".stripMargin
  }

  /** q166 oracle: hybrid retrieval replayed ranker-for-ranker — the q161
    * BM25 candidates and the q37-surface cosine candidates (each top-50,
    * rounded scores + id tiebreak → deterministic ranks), fused with the
    * same fixed-order RRF sum and one final top-k.
    */
  protected def q166RrfSql: String =
    """WITH toks AS (
      |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |corpus AS (
      |  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl
      |  FROM dl),
      |tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf FROM toks
      |  WHERE term IN ('spark', 'vector', 'hash') GROUP BY 1, 2),
      |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
      |scored AS (
      |  SELECT tf.doc_id,
      |    CAST(SUM(CAST(ROUND(
      |      LN(CAST(1.0 AS DOUBLE) +
      |        ((n.n_docs - dfreq.df) + CAST(0.5 AS DOUBLE)) /
      |        (dfreq.df + CAST(0.5 AS DOUBLE))) *
      |      (tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE))) /
      |      (tf.tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) +
      |        CAST(0.75 AS DOUBLE) *
      |        (CAST(dl.dl * n.n_docs AS DOUBLE) /
      |         CAST(n.sum_dl AS DOUBLE)))),
      |    6) AS DECIMAL(18,6))) AS DOUBLE) AS bm25
      |  FROM tf
      |  JOIN dfreq USING (term)
      |  JOIN dl USING (doc_id)
      |  CROSS JOIN corpus n
      |  GROUP BY tf.doc_id),
      |lex AS (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT)
      |      AS lex_rank
      |  FROM (SELECT doc_id, bm25 FROM scored
      |        ORDER BY bm25 DESC, doc_id LIMIT 50)),
      |e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
      |q AS (SELECT emb AS qemb FROM e WHERE vec_id = 0),
      |cos AS (
      |  SELECT e.vec_id AS doc_id,
      |    ROUND(list_inner_product(e.emb, q.qemb) /
      |      (SQRT(list_inner_product(e.emb, e.emb)) *
      |       SQRT(list_inner_product(q.qemb, q.qemb))), 6) AS cosine
      |  FROM e CROSS JOIN q WHERE e.vec_id <> 0),
      |dense AS (
      |  SELECT doc_id,
      |    CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT)
      |      AS dense_rank
      |  FROM (SELECT doc_id, cosine FROM cos
      |        ORDER BY cosine DESC, doc_id LIMIT 50)),
      |fused AS (
      |  SELECT COALESCE(lex.doc_id, dense.doc_id) AS doc_id,
      |    ROUND(
      |      COALESCE(CAST(1.0 AS DOUBLE) /
      |        (CAST(60.0 AS DOUBLE) + CAST(lex_rank AS DOUBLE)),
      |        CAST(0.0 AS DOUBLE)) +
      |      COALESCE(CAST(1.0 AS DOUBLE) /
      |        (CAST(60.0 AS DOUBLE) + CAST(dense_rank AS DOUBLE)),
      |        CAST(0.0 AS DOUBLE)), 6) AS rrf_score,
      |    lex_rank, dense_rank
      |  FROM lex FULL OUTER JOIN dense ON lex.doc_id = dense.doc_id)
      |SELECT doc_id, rrf_score, lex_rank, dense_rank FROM fused
      |ORDER BY rrf_score DESC, doc_id
      |LIMIT 15""".stripMargin

  /** q165 oracle: sliding token-window chunking replayed with DuckDB list
    * slicing (1-based inclusive, clamping — the q71 bigram surface) and
    * the same MD5 content address.
    */
  protected def q165ChunkSql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
      |st AS (
      |  SELECT doc_id, tk,
      |    unnest(range(0, (len(tk) - 1) // 24 + 1)) AS i
      |  FROM t),
      |ch AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |    CAST(1 + 24 * i AS BIGINT) AS start_token,
      |    tk[(1 + 24 * i):(24 * i + 32)] AS chunk
      |  FROM st)
      |SELECT doc_id, chunk_idx, start_token,
      |  CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
      |  MD5(array_to_string(chunk, ' ')) AS chunk_hash
      |FROM ch
      |ORDER BY doc_id, chunk_idx""".stripMargin

  protected def q160CurationSql: String = {
    val fpPoly = hexPoly15("MD5(COALESCE(CAST(doc_id AS VARCHAR), 'null'))")
    s"""WITH s AS (
       |  SELECT doc_id, source, n_chars, text,
       |    string_split(trim(text), ' ') AS toks
       |  FROM documents),
       |q AS (
       |  SELECT doc_id, source, n_chars, text, toks,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    ROUND(LEAST(len(toks) / 100.0, 1.0) *
       |      (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) /
       |        CAST(len(toks) AS DOUBLE)), 6) AS quality_score,
       |    len(list_filter(toks, x -> x = 'the')) /
       |      CAST(len(toks) AS DOUBLE) AS the_r
       |  FROM s),
       |kept AS (
       |  SELECT doc_id, source, n_chars, n_tokens, toks, MD5(text) AS h
       |  FROM q WHERE quality_score >= 0.5 AND the_r >= 0.04),
       |canon AS (
       |  SELECT k.* FROM kept k
       |  JOIN (SELECT h, MIN(doc_id) AS keep_id FROM kept GROUP BY h) g
       |    ON k.h = g.h AND k.doc_id = g.keep_id),
       |csh AS (
       |  SELECT DISTINCT doc_id, sh FROM (
       |    SELECT doc_id, unnest(CASE WHEN len(toks) >= 5
       |      THEN list_transform(range(1, len(toks) - 3),
       |             i -> array_to_string(toks[i:i+4], ' '))
       |      ELSE [array_to_string(toks, ' ')] END) AS sh
       |    FROM canon WHERE source <> 'src0')),
       |bsh AS (
       |  SELECT DISTINCT unnest(CASE WHEN len(tk) >= 5
       |      THEN list_transform(range(1, len(tk) - 3),
       |             i -> array_to_string(tk[i:i+4], ' '))
       |      ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM (SELECT string_split(trim(text), ' ') AS tk
       |        FROM documents WHERE source = 'src0')),
       |clean AS (
       |  SELECT doc_id, source, n_chars, n_tokens
       |  FROM canon
       |  WHERE source <> 'src0' AND doc_id NOT IN (
       |    SELECT doc_id FROM csh WHERE sh IN (SELECT sh FROM bsh))),
       |x AS (
       |  SELECT doc_id, source, n_chars, n_tokens,
       |    ((doc_id % 1000003) * 2654435761) % 1000003 AS x1
       |  FROM clean),
       |x2 AS (
       |  SELECT doc_id, source, n_chars, n_tokens,
       |    (((x1 + doc_id // 1000003) % 9999991) * 22695477) % 9999991 AS x2
       |  FROM x),
       |c2 AS (
       |  SELECT doc_id, source, n_tokens,
       |    CASE WHEN n_chars > 0 THEN
       |      -LN((x2 + 1) / 9999991.0) / n_chars
       |    ELSE 'infinity'::DOUBLE END AS clock
       |  FROM x2),
       |samp AS (
       |  SELECT doc_id, source, n_tokens FROM c2
       |  ORDER BY clock, doc_id LIMIT 60),
       |fp AS (
       |  SELECT CAST(CAST(SUM($fpPoly) AS HUGEINT) AS VARCHAR)
       |    AS fingerprint
       |  FROM samp)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens, fp.fingerprint
       |FROM samp CROSS JOIN fp
       |GROUP BY source, fp.fingerprint
       |ORDER BY source""".stripMargin
  }

  /** q27 oracle: replay MinHash signatures (32 seeded-MD5 mins over word
    * 3-shingles), 8×4 LSH bands, distinct candidate pairs, and the per-doc
    * candidate count. Generated: 32 MIN arms + 8 band arms.
    */
  protected def q27MinhashSql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    val bandArms = (0 until 8).map { b =>
      val cols = (b * 4 until b * 4 + 4).map(i => s"mh_$i")
        .mkString(" || '#' || ")
      s"SELECT doc_id, $b AS band, MD5($cols) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
       |sh AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM sh GROUP BY doc_id),
       |bands AS (
       |  $bandArms),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |perdoc AS (
       |  SELECT doc_id, COUNT(*) AS n_candidates FROM (
       |    SELECT id_a AS doc_id FROM pairs
       |    UNION ALL SELECT id_b AS doc_id FROM pairs)
       |  GROUP BY doc_id)
       |SELECT d.doc_id, COALESCE(p.n_candidates, 0) AS n_candidates
       |FROM documents d LEFT JOIN perdoc p USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q28 oracle: replay SimHash-64 — 16 hex-digit decodes per token hash,
    * 64 vote sums, fingerprint packed as signed BIGINT (bit 63 = min-long
    * addition), Hamming to doc 0 via bit_count(xor). Generated: 16 digit
    * decodes + 64 vote arms + 63 fingerprint terms.
    */
  protected def q28SimhashSql: String = {
    val digits = (0 until 16).map(i =>
      s"STRPOS('0123456789abcdef', SUBSTRING(h, ${i + 1}, 1)) - 1 AS d_$i")
      .mkString(",\n    ")
    val votes = (0 until 64).map { b =>
      s"SUM(CASE WHEN (d_${b / 4} & ${1 << (b % 4)}) != 0 THEN 1 ELSE -1 END) AS v_$b"
    }.mkString(",\n    ")
    val low = (0 until 63)
      .map(b => s"CASE WHEN v_$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" +\n      ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
       |  FROM documents),
       |h AS (SELECT doc_id, MD5(tok) AS h FROM toks),
       |d AS (
       |  SELECT doc_id,
       |    $digits
       |  FROM h),
       |v AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM d GROUP BY doc_id),
       |fp AS (
       |  SELECT doc_id, CAST(
       |      $low +
       |      CASE WHEN v_63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END
       |    AS BIGINT) AS simhash
       |  FROM v),
       |ref AS (SELECT simhash AS ref_hash FROM fp WHERE doc_id = 0)
       |SELECT f.doc_id, f.simhash,
       |  CAST(bit_count(xor(f.simhash, r.ref_hash)) AS INTEGER) AS hamming_to_0
       |FROM fp f CROSS JOIN ref r
       |ORDER BY f.doc_id""".stripMargin
  }

  /** Shared by q16 (DataFrame side) and q153 (SQL-text side): brute-force
    * cosine top-10 of query vector 0, DuckDB's list_inner_product playing
    * the role of the native vec_cosine expression.
    */
  protected def knnTopkSql: String =
    """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
      |s AS (
      |  SELECT e.vec_id,
      |    ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
      |      (SQRT(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
      |       SQRT(list_inner_product(q.qe, q.qe))), 6) AS cosine
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id <> 0)
      |SELECT vec_id, cosine
      |FROM s
      |ORDER BY cosine DESC, vec_id
      |LIMIT 10""".stripMargin

  protected def sessionizeSql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT) -
      |      CAST(FLOOR(epoch(LAG(ts) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
      |        > 86400
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM x)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS start_epoch,
      |  CAST(FLOOR(epoch(MAX(ts))) AS BIGINT) -
      |    CAST(FLOOR(epoch(MIN(ts))) AS BIGINT) AS duration_sec,
      |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  protected def psiSql: String =
    """WITH rng AS (
      |  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
      |  FROM events),
      |w AS (
      |  SELECT event_type, value, epoch_us(ts) * 2 < mn + mx AS is_ref
      |  FROM events, rng),
      |b AS (
      |  SELECT event_type, MIN(value) AS lo, MAX(value) AS hi
      |  FROM w WHERE is_ref GROUP BY event_type),
      |binned AS (
      |  SELECT w.event_type, is_ref,
      |    CASE WHEN (hi - lo) / 10.0 = 0 THEN 0
      |         ELSE LEAST(9, GREATEST(0, CAST(FLOOR(
      |           (value - lo) / ((hi - lo) / 10.0)) AS INTEGER))) END AS bin
      |  FROM w JOIN b ON w.event_type = b.event_type),
      |cells AS (
      |  SELECT event_type, bin,
      |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS r,
      |    SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS c
      |  FROM binned GROUP BY event_type, bin),
      |tot AS (
      |  SELECT event_type, SUM(r) AS nref, SUM(c) AS ncur
      |  FROM cells GROUP BY event_type)
      |SELECT cells.event_type, CAST(MAX(nref) AS BIGINT) AS n_ref,
      |  CAST(MAX(ncur) AS BIGINT) AS n_cur,
      |  ROUND(CAST(SUM(CAST(
      |    ((c + 0.5) / (ncur + 5.0) - (r + 0.5) / (nref + 5.0)) *
      |    LN(((c + 0.5) / (ncur + 5.0)) / ((r + 0.5) / (nref + 5.0)))
      |    AS DECIMAL(28,12))) AS DOUBLE), 6) AS psi
      |FROM cells JOIN tot ON cells.event_type = tot.event_type
      |GROUP BY cells.event_type
      |ORDER BY cells.event_type""".stripMargin

  protected def sqlSurface: Map[String, String] = Map(
    "q146_sql_dedup" -> SqlText.dedup,
    "q147_sql_funnel" -> SqlText.funnel,
    "q154_sql_star_join" -> SqlText.starJoin,
    "q148_sql_drift" -> psiSql,
    "q149_sql_sessionize" -> sessionizeSql,
    // the layout is invisible in the answer: the oracle is the same
    // date-window aggregate over the unpartitioned table
    "q150_partition_pruning" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-08'
        |  AND DATE '2024-01-14'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // compaction is content-invisible: the per-day profile of the
    // compacted copy must equal the profile derived from the source table
    "q156_compaction" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // schema evolution is content-invisible: the mergeSchema read's
    // per-day profile equals the profile derived from the source table
    // (quality exists only from Jan 16 on)
    "q157_schema_evolution" ->
      """SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value,
        |  COUNT(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |    THEN 1 END) AS n_quality,
        |  CAST(SUM(CASE WHEN CAST(ts AS DATE) >= DATE '2024-01-16'
        |    THEN CAST(value * 0.5 AS DECIMAL(28,4))
        |    ELSE CAST(0 AS DECIMAL(28,4)) END) AS DOUBLE) AS sum_quality
        |FROM events
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // dead-letter quarantine: the payload is deterministic string concat,
    // so the good/bad split and totals re-derive arithmetically (every
    // 13th id truncated -> unparseable)
    "q158_dead_letter" ->
      """SELECT
        |  CASE WHEN doc_id % 13 = 0 THEN 'quarantined'
        |       ELSE 'parsed' END AS status,
        |  COUNT(*) AS n_rows,
        |  CAST(COALESCE(SUM(CASE WHEN doc_id % 13 != 0 THEN n_chars END), 0)
        |    AS BIGINT) AS total_n
        |FROM documents
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // tie-corrected Spearman: midrank per distinct value = AVG of the
    // row_numbers in its tie group — identical to the bucketed-rank
    // midrank formula b + (c+1)/2; sufficient stats in exact decimals
    "q151_spearman" ->
      """WITH d AS (
        |  SELECT l_quantity AS x, l_extendedprice AS y FROM lineitem),
        |rxv AS (
        |  SELECT x, AVG(rn) AS r FROM (
        |    SELECT x, CAST(ROW_NUMBER() OVER (ORDER BY x) AS DOUBLE) AS rn
        |    FROM d) GROUP BY x),
        |ryv AS (
        |  SELECT y, AVG(rn) AS r FROM (
        |    SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY y) AS DOUBLE) AS rn
        |    FROM d) GROUP BY y),
        |j AS (
        |  SELECT rxv.r AS rx, ryv.r AS ry
        |  FROM d JOIN rxv USING (x) JOIN ryv USING (y)),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(rx AS DECIMAL(28,1))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(ry AS DECIMAL(28,1))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(rx * ry AS DECIMAL(28,2))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(rx * rx AS DECIMAL(28,2))) AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(ry * ry AS DECIMAL(28,2))) AS DOUBLE) AS syy
        |  FROM j)
        |SELECT n, ROUND(CASE
        |  WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
        |  THEN (n * sxy - sx * sy) /
        |    SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) END, 6) AS rho
        |FROM s""".stripMargin,

    "q152_mutual_info" ->
      """WITH cells AS (
        |  SELECT o_orderstatus AS r, o_orderpriority AS c, COUNT(*) AS o
        |  FROM orders GROUP BY 1, 2),
        |rm AS (SELECT r, SUM(o) AS rm FROM cells GROUP BY r),
        |cm AS (SELECT c, SUM(o) AS cm FROM cells GROUP BY c),
        |nn AS (SELECT SUM(o) AS n FROM cells),
        |mi AS (
        |  SELECT MAX(n) AS n, CAST(SUM(CAST(
        |    (CAST(o AS DOUBLE) / n) *
        |    LN((CAST(o AS DOUBLE) * n) / (rm * cm))
        |    AS DECIMAL(28,12))) AS DOUBLE) AS mi
        |  FROM cells JOIN rm USING (r) JOIN cm USING (c), nn),
        |hx AS (
        |  SELECT CAST(SUM(CAST(
        |    -(CAST(rm AS DOUBLE) / n) * LN(CAST(rm AS DOUBLE) / n)
        |    AS DECIMAL(28,12))) AS DOUBLE) AS hx FROM rm, nn),
        |hy AS (
        |  SELECT CAST(SUM(CAST(
        |    -(CAST(cm AS DOUBLE) / n) * LN(CAST(cm AS DOUBLE) / n)
        |    AS DECIMAL(28,12))) AS DOUBLE) AS hy FROM cm, nn)
        |SELECT CAST(n AS BIGINT) AS n, ROUND(mi, 6) AS mi_nats,
        |  ROUND(hx, 6) AS h_row, ROUND(hy, 6) AS h_col,
        |  ROUND(CASE WHEN hx * hy > 0 THEN mi / SQRT(hx * hy) END, 6)
        |    AS nmi
        |FROM mi, hx, hy""".stripMargin,

    // SQL-text twin of q16 exercising the REGISTERED native expression
    // (GraftExtensions vec_cosine) from the SQL parser
    "q153_sql_ann" -> knnTopkSql)

  /** q118's oracle: the identical fixed-point BIGINT PageRank, the
    * `iterations` rounds UNROLLED as chained CTEs (standard SQL forbids
    * aggregation inside a recursive CTE member, and unrolling needs no
    * recursion at all). Every arithmetic step — `* 85 // 100`, `// deg`,
    * the `150000000000` teleport base — matches
    * [[graft.operators.GraphOps.pageRankFixedPoint]] literally; integer
    * math is associative, so the two engines cannot drift.
    */
  protected def pageRankSql(iterations: Int): String = {
    val base =
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
        |  SELECT src, dst FROM pairs
        |  UNION SELECT dst, src FROM pairs),
        |deg AS (SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src),
        |pr0 AS (SELECT v, CAST(1000000000000 AS BIGINT) AS rank_fp FROM deg)
        |""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",pr$k AS (
         |  SELECT sym.dst AS v,
         |    150000000000 + SUM(pr${k - 1}.rank_fp * 85 // 100 // deg.d)
         |      AS rank_fp
         |  FROM pr${k - 1}
         |  JOIN sym ON sym.src = pr${k - 1}.v
         |  JOIN deg ON deg.v = pr${k - 1}.v
         |  GROUP BY sym.dst)
         |""".stripMargin
    }.mkString
    val fin =
      s"""SELECT v AS vec_id, CAST(rank_fp AS BIGINT) AS rank_fp,
         |  ROUND(CAST(rank_fp AS DOUBLE) / 1000000000000.0, 6) AS rank
         |FROM pr$iterations ORDER BY vec_id""".stripMargin
    base + iters + fin
  }

  /** q317's TextRank replayed: q255's tokenize/adjacent-pair machinery
    * builds the min-count-5 word adjacency graph; the PageRank rounds
    * are the q118 exact-integer unroll (BIGINT fixed point, floor
    * divisions), MATERIALIZED per round; top-30 by (rank_fp, word).
    */
  protected def textRankOracleSql(iterations: Int): String = {
    val base =
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |voc AS MATERIALIZED (
        |  SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |  WHERE u.w <> '' GROUP BY u.w HAVING COUNT(*) >= 5),
        |bgl AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, UNNEST(range(1, len(toks))) AS r(i)
        |  WHERE toks[i] <> '' AND toks[i + 1] <> ''
        |    AND toks[i] <> toks[i + 1]),
        |e0 AS (
        |  SELECT b.w1 AS src, b.w2 AS dst FROM bgl b
        |  JOIN voc v1 ON b.w1 = v1.w JOIN voc v2 ON b.w2 = v2.w),
        |sym AS MATERIALIZED (
        |  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        |deg AS MATERIALIZED (
        |  SELECT src AS v, COUNT(*) AS d FROM sym GROUP BY src),
        |pr0 AS MATERIALIZED (
        |  SELECT v, CAST(1000000000000 AS BIGINT) AS rank_fp FROM deg)
        |""".stripMargin
    val iters = (1 to iterations).map { k =>
      s""",pr$k AS MATERIALIZED (
         |  SELECT sym.dst AS v,
         |    150000000000 + SUM(pr${k - 1}.rank_fp * 85 // 100 // deg.d)
         |      AS rank_fp
         |  FROM pr${k - 1}
         |  JOIN sym ON sym.src = pr${k - 1}.v
         |  JOIN deg ON deg.v = pr${k - 1}.v
         |  GROUP BY sym.dst)
         |""".stripMargin
    }.mkString
    val fin =
      s"""SELECT CAST(ROW_NUMBER() OVER (ORDER BY rank_fp DESC, v)
         |    AS BIGINT) AS rank,
         |  v AS word, CAST(rank_fp AS BIGINT) AS rank_fp,
         |  ROUND(CAST(rank_fp AS DOUBLE) / 1000000000000.0, 6) AS score
         |FROM pr$iterations
         |ORDER BY rank_fp DESC, v LIMIT 30""".stripMargin
    base + iters + fin
  }

  /** q322's keyness replayed — per-(source, term) counts vs
    * rest-of-corpus, expected counts from source token totals, the
    * 0·ln0-guarded G², deterministic top-30. Shared verbatim by the
    * q325 streaming twin (additive cells + shared finisher).
    */
  protected def keynessSql: String =
    """WITH w AS (
      |  SELECT source, u.w AS w
      |  FROM (SELECT source, string_split(trim(text), ' ') AS toks
      |        FROM documents) t,
      |    UNNEST(toks) AS u(w)
      |  WHERE u.w <> ''),
      |st AS (
      |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS a
      |  FROM w GROUP BY source, w),
      |tt AS (
      |  SELECT w, CAST(SUM(a) AS BIGINT) AS ab
      |  FROM st GROUP BY w HAVING SUM(a) >= 5),
      |srct AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS ns
      |  FROM w GROUP BY source),
      |tot AS (SELECT CAST(SUM(ns) AS BIGINT) AS n FROM srct),
      |scored AS (
      |  SELECT st.source, st.w, st.a, tt.ab - st.a AS b_rest,
      |    ROUND(2.0 * (
      |      CASE WHEN CAST(st.a AS DOUBLE) > 0.0
      |        THEN CAST(st.a AS DOUBLE) * LN(CAST(st.a AS DOUBLE) /
      |          (CAST(srct.ns AS DOUBLE) * CAST(tt.ab AS DOUBLE) /
      |            CAST(tot.n AS DOUBLE)))
      |        ELSE 0.0 END +
      |      CASE WHEN CAST(tt.ab - st.a AS DOUBLE) > 0.0
      |        THEN CAST(tt.ab - st.a AS DOUBLE) *
      |          LN(CAST(tt.ab - st.a AS DOUBLE) /
      |          (CAST(tot.n - srct.ns AS DOUBLE) * CAST(tt.ab AS DOUBLE)
      |            / CAST(tot.n AS DOUBLE)))
      |        ELSE 0.0 END), 6) AS g2,
      |    CASE WHEN CAST(st.a AS DOUBLE) / CAST(srct.ns AS DOUBLE) >
      |        CAST(tt.ab AS DOUBLE) / CAST(tot.n AS DOUBLE)
      |      THEN 'over' ELSE 'under' END AS direction
      |  FROM st JOIN tt USING (w) JOIN srct USING (source), tot)
      |SELECT CAST(ROW_NUMBER() OVER (ORDER BY g2 DESC, source, w)
      |    AS BIGINT) AS rank,
      |  source, w AS term, a AS count_in_source, b_rest AS count_rest,
      |  g2, direction
      |FROM scored ORDER BY g2 DESC, source, w LIMIT 30""".stripMargin

  /** q323's k-core peeling unrolled over the q118 cosine graph: per
    * round a degree count, the ≥k survivor set, and the edge restrict —
    * every step MATERIALIZED (each round's edge frame is referenced by
    * both the degree count and the restrict join).
    */
  protected def kCoreOracleSql(k: Int, rounds: Int): String = {
    val base =
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.2),
        |k0 AS MATERIALIZED (
        |  SELECT src, dst FROM pairs
        |  UNION SELECT dst, src FROM pairs)
        |""".stripMargin
    val steps = (1 to rounds).map { r =>
      s""",kp$r AS MATERIALIZED (
         |  SELECT src AS v FROM k${r - 1}
         |  GROUP BY src HAVING COUNT(*) >= $k),
         |k$r AS MATERIALIZED (
         |  SELECT g.src, g.dst FROM k${r - 1} g
         |  JOIN kp$r a ON g.src = a.v
         |  JOIN kp$r b ON g.dst = b.v)
         |""".stripMargin
    }.mkString
    val fin =
      s"""SELECT src AS vec_id, CAST(COUNT(*) AS BIGINT) AS degree
         |FROM k$rounds GROUP BY src ORDER BY vec_id""".stripMargin
    base + steps + fin
  }

  /** q198 oracle: robust winnowing replayed — word trigram 40-bit hashes,
    * the `hash·2²⁰ + (2²⁰−1−pos)` encoded windowed MIN (rightmost-tie
    * selection for free), distinct per-doc fingerprints, capped postings,
    * pair join, deterministic top-50.
    */
  protected def q198WinnowingSql: String = {
    val h = hexPoly10("MD5(ng)")
    s"""WITH t AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS toks
       |  FROM documents
       |  WHERE len(string_split(trim(text), ' ')) >= 3),
       |g AS (
       |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
       |    array_to_string(toks[CAST(i + 1 AS INT):CAST(i + 3 AS INT)], ' ')
       |      AS ng
       |  FROM (SELECT doc_id, toks, unnest(range(len(toks) - 2)) AS i
       |        FROM t)
       |  WHERE i < 1048576),
       |e AS (
       |  SELECT doc_id, pos,
       |    $h * 1048576 + (1048575 - pos) AS enc
       |  FROM g),
       |m AS (
       |  SELECT doc_id, pos,
       |    MIN(enc) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS fp
       |  FROM e),
       |f AS (
       |  SELECT DISTINCT doc_id, fp // 1048576 AS fp_hash
       |  FROM m WHERE pos >= 3),
       |dfreq AS (
       |  SELECT fp_hash, COUNT(*) AS dfc FROM f GROUP BY 1
       |  HAVING COUNT(*) <= 50 AND COUNT(*) >= 2),
       |kept AS (SELECT f.doc_id, f.fp_hash FROM f JOIN dfreq
       |  USING (fp_hash)),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS n_shared
       |  FROM kept a JOIN kept b
       |    ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2 HAVING COUNT(*) >= 2)
       |SELECT doc_a, doc_b, n_shared
       |FROM pairs ORDER BY n_shared DESC, doc_a, doc_b LIMIT 50""".stripMargin
  }

  /** q201/q202 oracle: the log-bin quantile sketch replayed — exact
    * digit-count + one correctly-rounded IEEE division per value (no
    * libm), additive counters, ALL-merge by summing, rank selection over
    * the cumulative bins.
    */
  /** Shared by q182 (in-memory IVF) and q226 (persisted-index IVF): the
    * index layout on disk must be invisible in the answer, so both replay
    * the same draw → assign → probe → rank pipeline.
    */
  protected def ivfPortableSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings WHERE vec_id < 200),
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
      |ORDER BY q_id, rank""".stripMargin

  protected def logBinQuantileSql: String =
    """WITH d AS (
      |  SELECT l_returnflag AS grp, CAST(l_extendedprice AS DOUBLE) AS v
      |  FROM lineitem WHERE CAST(l_extendedprice AS DOUBLE) >= 1.0),
      |b0 AS (
      |  SELECT grp,
      |    CAST(LENGTH(CAST(CAST(FLOOR(v) AS BIGINT) AS VARCHAR)) AS INT)
      |      AS e,
      |    v
      |  FROM d),
      |b1 AS (
      |  SELECT grp, e,
      |    CAST(CASE WHEN e >= 2
      |        THEN FLOOR(v / POWER(10.0, CAST(e - 2 AS DOUBLE)))
      |      ELSE FLOOR(v * 10) END AS BIGINT) AS m
      |  FROM b0),
      |bins AS (SELECT grp, e, m, COUNT(*) AS n FROM b1 GROUP BY 1, 2, 3),
      |binsall AS (
      |  SELECT grp, e, m, CAST(n AS BIGINT) AS n FROM bins
      |  UNION ALL
      |  SELECT 'ALL' AS grp, e, m, CAST(SUM(n) AS BIGINT) AS n
      |  FROM bins GROUP BY 2, 3),
      |cum AS (
      |  SELECT grp, e, m, n,
      |    SUM(n) OVER (PARTITION BY grp ORDER BY e, m) AS cum
      |  FROM binsall),
      |tot AS (SELECT grp, SUM(n) AS total FROM binsall GROUP BY 1),
      |ranks AS (
      |  SELECT grp, CAST(q AS DOUBLE) AS quantile,
      |    GREATEST(CAST(CEIL(CAST(q AS DOUBLE) * total) AS BIGINT),
      |      CAST(1 AS BIGINT)) AS rank
      |  FROM tot, (VALUES (0.5), (0.9), (0.99)) qs(q)),
      |sel AS (
      |  SELECT grp, quantile, rank, e, m,
      |    ROW_NUMBER() OVER (PARTITION BY grp, quantile ORDER BY e, m)
      |      AS rn
      |  FROM cum JOIN ranks USING (grp)
      |  WHERE cum >= rank)
      |SELECT grp, quantile, rank, e AS bin_e, m AS bin_m,
      |  CASE WHEN e >= 2
      |      THEN CAST(m AS DOUBLE) * POWER(10.0, CAST(e - 2 AS DOUBLE))
      |    ELSE CAST(m AS DOUBLE) / 10.0 END AS est
      |FROM sel WHERE rn = 1
      |ORDER BY grp, quantile""".stripMargin

  /** q200 oracle: the portable MLP forward pass replayed — closed-form
    * scaler from decimal sums, the fixed 3-decimal hash-drawn weights
    * inlined as literals (model parameters), round-9 activations, round-6
    * scores, decile histogram.
    */
  protected def q200MlpForwardSql: String = {
    import graft.ml.MlPipelines.mlpPortableWeight
    def w(tag: String): String = f"(${mlpPortableWeight(tag)}%.3f)"
    val hidden = 4
    val hCols = (0 until hidden).map { j =>
      val zj = s"${w(s"b1_$j")} + ${w(s"w1_${j}_0")} * z1 + " +
        s"${w(s"w1_${j}_1")} * z2"
      s"ROUND(1.0 - 2.0 / (EXP(2.0 * ($zj)) + 1.0), 9) AS h$j"
    }.mkString(",\n       |    ")
    val outExpr = (0 until hidden).foldLeft(w("b2")) {
      (acc, j) => s"$acc + ${w(s"v_$j")} * h$j"
    }
    s"""WITH d AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
       |    CAST(l_discount AS DOUBLE) AS x2
       |  FROM lineitem),
       |s AS (
       |  SELECT COUNT(*) AS n,
       |    CAST(SUM(CAST(x1 AS DECIMAL(28,2))) AS DOUBLE) AS sx1,
       |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,4))) AS DOUBLE) AS s11,
       |    CAST(SUM(CAST(x2 AS DECIMAL(28,2))) AS DOUBLE) AS sx2,
       |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,4))) AS DOUBLE) AS s22
       |  FROM d),
       |c AS (SELECT *, CAST(n AS DOUBLE) AS nd FROM s),
       |st AS (
       |  SELECT sx1 / nd AS mu1, SQRT((s11 - sx1 * sx1 / nd) / nd) AS sd1,
       |    sx2 / nd AS mu2, SQRT((s22 - sx2 * sx2 / nd) / nd) AS sd2
       |  FROM c),
       |z AS (
       |  SELECT ROUND((x1 - mu1) / sd1, 9) AS z1,
       |    ROUND((x2 - mu2) / sd2, 9) AS z2
       |  FROM d, st),
       |h AS (
       |  SELECT z1, z2,
       |    $hCols
       |  FROM z),
       |sc AS (
       |  SELECT ROUND(1.0 / (1.0 + EXP(-($outExpr))), 6) AS p FROM h)
       |SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS decile,
       |  COUNT(*) AS n,
       |  ROUND(CAST(SUM(CAST(p AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 6)
       |    AS avg_p
       |FROM sc GROUP BY 1 ORDER BY decile""".stripMargin
  }

  /** q194 oracle: the boosted-stumps loop UNROLLED — per round t, a
    * residual CTE (model after t−1 rounds as a chain of CASE stumps over
    * the 1-row best-split CTEs), decimal candidate sums, the round-6
    * gain argmax (ties → lowest candidate index), round-9 leaf means, and
    * the post-update train/holdout RMSE — exactly the driver loop of
    * `MlPipelines.boostedStumpsPortable`, digit for digit.
    */
  protected def q194BoostedStumpsSql: String = {
    val iters = 6
    val cands = Seq(("l_quantity", "10.0"), ("l_quantity", "20.0"),
      ("l_quantity", "30.0"), ("l_quantity", "40.0"),
      ("l_discount", "0.02"), ("l_discount", "0.04"),
      ("l_discount", "0.06"), ("l_discount", "0.08"))
    val candVals = cands.zipWithIndex
      .map { case ((f, v), i) => s"($i, '$f', $v)" }.mkString(", ")
    // the chosen stump of round j, applied to a row of d
    def stump(j: Int): String =
      s"0.5 * (CASE WHEN (b$j.feat = 'l_quantity' AND d.x1 <= b$j.thr)" +
        s" OR (b$j.feat = 'l_discount' AND d.x2 <= b$j.thr)" +
        s" THEN b$j.m_left ELSE b$j.m_right END)"
    def predAfter(t: Int): String =
      (Seq("s0.b0") ++ (1 to t).map(stump)).mkString(" + ")
    def residualCte(t: Int): String = {
      val joins = (Seq("d", "s0") ++ (1 until t).map(j => s"b$j"))
        .mkString(", ")
      s""",r$t AS (
         |  SELECT d.*, d.y - (${predAfter(t - 1)}) AS r FROM $joins)
         |""".stripMargin
    }
    val base =
      s"""WITH d AS (
         |  SELECT ((l_orderkey % 1000003) * 2654435761) % 5 <> 0
         |      AS is_train,
         |    CAST(l_quantity AS DOUBLE) AS x1,
         |    CAST(l_discount AS DOUBLE) AS x2,
         |    CAST(l_quantity AS DOUBLE) *
         |      (1.0 - CAST(l_discount AS DOUBLE)) * 1000.0 AS y
         |  FROM lineitem WHERE l_orderkey < 2000),
         |cands AS (
         |  SELECT idx, feat, CAST(thr AS DOUBLE) AS thr
         |  FROM (VALUES $candVals) c(idx, feat, thr)),
         |s0 AS (
         |  SELECT ROUND(CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE)
         |    / COUNT(*), 9) AS b0
         |  FROM d WHERE is_train)
         |""".stripMargin
    val rounds = (1 to iters).map { t =>
      residualCte(t) +
      s""",tot$t AS (
         |  SELECT CAST(SUM(CAST(r AS DECIMAL(28,12))) AS DOUBLE) AS s,
         |    COUNT(*) AS n
         |  FROM r$t WHERE is_train),
         |c$t AS (
         |  SELECT c.idx, c.feat, c.thr,
         |    CAST(SUM(CAST(CASE WHEN (c.feat = 'l_quantity' AND r.x1 <= c.thr)
         |        OR (c.feat = 'l_discount' AND r.x2 <= c.thr)
         |      THEN r.r END AS DECIMAL(28,12))) AS DOUBLE) AS sl,
         |    COUNT(CASE WHEN (c.feat = 'l_quantity' AND r.x1 <= c.thr)
         |        OR (c.feat = 'l_discount' AND r.x2 <= c.thr)
         |      THEN 1 END) AS nl
         |  FROM (SELECT * FROM r$t WHERE is_train) r, cands c
         |  GROUP BY c.idx, c.feat, c.thr),
         |b$t AS (
         |  SELECT * FROM (
         |    SELECT idx, feat, thr,
         |      ROUND(sl / nl, 9) AS m_left,
         |      ROUND((s - sl) / (n - nl), 9) AS m_right,
         |      CASE WHEN nl > 0 AND n - nl > 0
         |        THEN ROUND((sl * sl / nl + (s - sl) * (s - sl) / (n - nl))
         |          / n, 2)
         |      END AS gain
         |    FROM c$t, tot$t)
         |  ORDER BY gain DESC NULLS LAST, idx LIMIT 1)
         |""".stripMargin
    }.mkString
    val lastResidual = residualCte(iters + 1)
    val rmses = (1 to iters).map { t =>
      s""",m$t AS (
         |  SELECT is_train,
         |    ROUND(SQRT(CAST(SUM(CAST(r * r AS DECIMAL(28,12))) AS DOUBLE)
         |      / COUNT(*)), 6) AS rmse
         |  FROM r${t + 1} GROUP BY is_train)
         |""".stripMargin
    }.mkString
    val traceRows = (1 to iters).map { t =>
      s"""  SELECT $t AS iter, feat AS feature, thr AS threshold,
         |    ROUND(m_left, 6) AS m_left, ROUND(m_right, 6) AS m_right,
         |    gain,
         |    (SELECT rmse FROM m$t WHERE is_train) AS train_rmse,
         |    (SELECT rmse FROM m$t WHERE NOT is_train) AS valid_rmse
         |  FROM b$t""".stripMargin
    }.mkString("\n  UNION ALL\n")
    val fin =
      s""",trace AS (
         |$traceRows)
         |SELECT iter, feature, threshold, m_left, m_right, gain,
         |  train_rmse, valid_rmse,
         |  CASE WHEN ROW_NUMBER() OVER (ORDER BY valid_rmse ASC, iter ASC)
         |    = 1 THEN 1 ELSE 0 END AS is_best
         |FROM trace ORDER BY iter""".stripMargin
    base + rounds + lastResidual + rmses + fin
  }

  /** q231/q233 shared oracle: the identical doc_id-arithmetic PII
    * planting, the same ASCII regex set (RE2 executes these identically
    * to Java regex — `\d`/`\b`/bounded quantifiers, no engine-specific
    * syntax), counts on the RAW text, redaction in inventory order with
    * the 'g' flag (Spark's regexp_replace is global), and the 60-bit MD5
    * polynomial fingerprint of every redacted text summed per source.
    */
  protected def piiCardSql: String =
    s"""WITH aug AS (
       |  SELECT source, text ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' contact user' || doc_id ||
       |      '@mail.example.com ok' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 0 THEN ' dial ' ||
       |      (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000)
       |      ELSE '' END ||
       |    CASE WHEN doc_id % 13 = 0 THEN ' node 10.' ||
       |      (doc_id % 256) || '.' || ((doc_id * 7) % 256) || '.' ||
       |      ((doc_id * 13) % 256) || ' up' ELSE '' END ||
       |    CASE WHEN doc_id % 17 = 0 THEN ' id ' ||
       |      (100 + doc_id % 900) || '-' || (10 + doc_id % 90) || '-' ||
       |      (1000 + doc_id % 9000) || ' end' ELSE '' END
       |    AS t
       |  FROM documents),
       |det AS (
       |  SELECT source, LENGTH(t) AS len_raw,
       |    len(regexp_extract_all(t,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
       |      AS n_email,
       |    len(regexp_extract_all(t, '\\b\\d{3}-\\d{2}-\\d{4}\\b'))
       |      AS n_ssn,
       |    len(regexp_extract_all(t,
       |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ipv4,
       |    len(regexp_extract_all(t, '\\b\\d{3}-\\d{4}\\b')) AS n_phone,
       |    MD5(regexp_replace(regexp_replace(regexp_replace(
       |      regexp_replace(t,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
       |      '<EMAIL>', 'g'),
       |      '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
       |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
       |      '<IP>', 'g'),
       |      '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS h,
       |    LENGTH(regexp_replace(regexp_replace(regexp_replace(
       |      regexp_replace(t,
       |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
       |      '<EMAIL>', 'g'),
       |      '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<SSN>', 'g'),
       |      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
       |      '<IP>', 'g'),
       |      '\\b\\d{3}-\\d{4}\\b', '<PHONE>', 'g')) AS len_red
       |  FROM aug)
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(n_email) AS BIGINT) AS n_email,
       |  CAST(SUM(n_ssn) AS BIGINT) AS n_ssn,
       |  CAST(SUM(n_ipv4) AS BIGINT) AS n_ipv4,
       |  CAST(SUM(n_phone) AS BIGINT) AS n_phone,
       |  CAST(SUM(CASE WHEN n_email + n_ssn + n_ipv4 + n_phone > 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       |  CAST(SUM(len_raw - len_red) AS BIGINT) AS char_delta,
       |  CAST(SUM(${hexPoly15("h")} % 1000000007) AS BIGINT) AS redact_fp
       |FROM det
       |GROUP BY source
       |ORDER BY source""".stripMargin
}
