package graft

/** Spark-dialect SQL text for the q146–q149 SQL-first surface.
  *
  * These strings are what a SQL analyst would type against the registered
  * views ([[Tables.registerViews]]). `dedup` and `funnel` are fully
  * engine-portable and serve verbatim as their own DuckDB oracles;
  * `psiDrift` and `sessionize` differ from their oracles only in the
  * epoch-extraction function (Spark `unix_micros`/`unix_seconds` vs DuckDB
  * `epoch_us`/`floor(epoch)`) — every aggregation, guard, decimal
  * accumulation and rounding step is textually identical, so the engines
  * cannot drift.
  */
object SqlText {

  /** Exact dedup: canonical (minimum) id + copy count per distinct text —
    * q11's semantics through the SQL parser. At scale the GROUP BY text
    * shuffles on the text hash exactly like the DataFrame path.
    */
  val dedup: String =
    """SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY text
      |ORDER BY canonical_id""".stripMargin

  /** Ordered three-stage funnel (view → click → purchase) with
    * stage-over-stage conversion — q102's semantics. Stage frontiers are
    * per-user MIN aggregates joined user-keyed; the LAG window runs over
    * the 3-row stage frame.
    */
  val funnel: String =
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts > v.t1
      |  GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts > c.t2
      |  GROUP BY e.user_id),
      |n AS (
      |  SELECT 1 AS stage_idx, 'view' AS stage,
      |    (SELECT COUNT(*) FROM v) AS n_users
      |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
      |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p))
      |SELECT stage_idx, stage, n_users,
      |  ROUND(n_users / CAST(NULLIF(
      |    LAG(n_users) OVER (ORDER BY stage_idx), 0) AS DOUBLE), 6)
      |    AS conv_from_prev
      |FROM n ORDER BY stage_idx""".stripMargin

  /** Population-stability-index drift per event_type: reference = first
    * time half, current = second half, 10 equal-width bins fitted on the
    * reference, Laplace-smoothed PSI — q113's semantics. The zero-width
    * guard lives in the matched CASE branch so ANSI never divides by zero.
    */
  val psiDrift: String =
    """WITH rng AS (
      |  SELECT MIN(unix_micros(ts)) AS mn, MAX(unix_micros(ts)) AS mx
      |  FROM events),
      |w AS (
      |  SELECT event_type, value, unix_micros(ts) * 2 < mn + mx AS is_ref
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

  /** Brute-force cosine top-10 of query vector 0 — q16's semantics with
    * the native codegen `vec_cosine` expression called FROM SQL (it is in
    * the session function registry via GraftExtensions). The oracle
    * spells the same arithmetic with DuckDB's list_inner_product.
    */
  val annTopK: String =
    """WITH q AS (
      |  SELECT CAST(embedding AS ARRAY<DOUBLE>) AS qe
      |  FROM embeddings WHERE vec_id = 0),
      |s AS (
      |  SELECT e.vec_id,
      |    ROUND(vec_cosine(CAST(e.embedding AS ARRAY<DOUBLE>), q.qe), 6)
      |      AS cosine
      |  FROM embeddings e CROSS JOIN q
      |  WHERE e.vec_id <> 0)
      |SELECT vec_id, cosine
      |FROM s
      |ORDER BY cosine DESC, vec_id
      |LIMIT 10""".stripMargin

  /** TPC-H Q3 star join — q93's semantics as SQL text: a selective
    * dimension filter, the orders/lineitem fact chain, decimal-exact
    * revenue, top-10. The join-heavy shape of the SQL surface (the other
    * twins cover dedup/funnel/drift/sessionize/ANN). Fully
    * engine-portable; serves verbatim as its own DuckDB oracle. Catalyst
    * plans the text identically to the DataFrame chain — including the
    * broadcast of the filtered customer side — so the SQL door pays no
    * plan penalty.
    */
  val starJoin: String =
    """SELECT l.l_orderkey,
      |  CAST(o.o_orderdate AS DATE) AS orderdate,
      |  CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
      |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l.l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l.l_orderkey, orderdate
      |ORDER BY revenue DESC, l.l_orderkey
      |LIMIT 10""".stripMargin

  /** Gap-based sessionization (24 h inactivity closes a session) with
    * per-session stats — q83's semantics. Windows are per-user; the
    * decimal sum keeps sum_value partition-order-free.
    */
  val sessionize: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN unix_seconds(ts) - unix_seconds(LAG(ts) OVER (
      |        PARTITION BY user_id ORDER BY ts, event_id)) > 86400
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |s AS (
      |  SELECT user_id, ts, value,
      |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM x)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  unix_seconds(MIN(ts)) AS start_epoch,
      |  unix_seconds(MAX(ts)) - unix_seconds(MIN(ts)) AS duration_sec,
      |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** BM25 top-k retrieval — q161's semantics through the SQL parser (the
    * retrieval-family twin). Differs from the DuckDB oracle only in the
    * token-explode idiom (Spark `explode(split(...))` vs DuckDB
    * `unnest(string_split(...))`); every count, float cast, rounding and
    * the exact-decimal score accumulation are textually identical.
    */
  val bm25: String =
    """WITH toks AS (
      |  SELECT doc_id, explode(split(trim(text), ' ')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      |corpus AS (
      |  SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM dl),
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

  // ---- round-12 SQL-surface expansion: the ten most user-facing ---------
  // families promoted to SQL text. Five are fully engine-portable (the
  // string doubles as its own DuckDB oracle); five differ from their
  // proven oracles only in dialect functions (epoch extraction, list ops,
  // exact percentile) — every aggregation, decimal accumulation, rounding
  // step and ORDER BY is semantically identical.

  /** Point-in-interval join + per-anchor stats — q05's semantics (J2/A1)
    * as portable SQL text: ±3-day windows around signup anchors,
    * decimal-exact sums, min-support HAVING. Serves verbatim as its own
    * oracle.
    */
  val intervalJoin: String =
    """SELECT a.event_id AS anchor_id, COUNT(*) AS n_events,
      |  CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value,
      |  CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(e.value) AS avg_value,
      |  MIN(e.value) AS min_value,
      |  MAX(e.value) AS max_value,
      |  CASE WHEN COUNT(e.value) > 1 THEN ROUND(STDDEV_SAMP(e.value), 6) END AS std_value,
      |  COUNT(DISTINCT e.event_type) AS n_types
      |FROM events e
      |JOIN events a
      |  ON a.event_type = 'signup'
      | AND e.user_id = a.user_id
      | AND e.ts >= a.ts - INTERVAL 3 DAY
      | AND e.ts <= a.ts + INTERVAL 3 DAY
      |GROUP BY a.event_id
      |HAVING COUNT(*) >= 3
      |ORDER BY anchor_id""".stripMargin

  /** Weighted median per group — q101's semantics: value-collapsed
    * decimal weights, prefix-sum window over the collapsed frame (never a
    * global sort), first value whose cumulative weight crosses half.
    * Portable verbatim.
    */
  val weightedMedian: String =
    """WITH byval AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    SUM(CAST(l_quantity AS DECIMAL(28,4))) AS w
      |  FROM lineitem GROUP BY l_returnflag, l_extendedprice),
      |cum AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
      |  FROM byval),
      |tot AS (SELECT l_returnflag, SUM(w) AS tw FROM byval
      |        GROUP BY l_returnflag)
      |SELECT c.l_returnflag, MIN(c.l_extendedprice) AS weighted_median
      |FROM cum c JOIN tot t USING (l_returnflag)
      |WHERE c.cw * 2 >= t.tw
      |GROUP BY c.l_returnflag
      |ORDER BY c.l_returnflag""".stripMargin

  /** Hierarchical ROLLUP totals — q54's semantics. Portable verbatim. */
  val rollup: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Global top-k with a deterministic tiebreak — q10's semantics.
    * Portable verbatim; Catalyst plans the text as TakeOrderedAndProject
    * exactly like the DataFrame chain.
    */
  val topk: String =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin

  /** Per-user weekly activity trend — q07's semantics (A5): weekly bucket
    * means, then spread stats per user. Portable verbatim (both engines
    * truncate weeks to Monday).
    */
  val weeklyTrend: String =
    """WITH per AS (
      |  SELECT user_id, date_trunc('week', ts) AS bucket,
      |    CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS bucket_mean
      |  FROM events
      |  GROUP BY user_id, date_trunc('week', ts))
      |SELECT user_id, COUNT(*) AS n_buckets,
      |  CASE WHEN COUNT(bucket_mean) > 1 THEN ROUND(STDDEV_SAMP(bucket_mean), 6) END AS trend_std,
      |  ROUND(MAX(bucket_mean) - MIN(bucket_mean), 6) AS trend_range
      |FROM per
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** As-of (latest click at-or-before each purchase) join — q63's
    * semantics through the SQL parser, WITHOUT an ASOF keyword: clicks
    * collapse per (user, ts) exactly like the oracle's arg_max, then one
    * union-ordered window carries the last click forward onto each
    * purchase (clicks sort before purchases at equal ts — the >= bound).
    * The oracle is DuckDB's native ASOF LEFT JOIN — two entirely
    * different evaluation strategies, same rows.
    */
  val asofJoin: String =
    """WITH c AS (
      |  SELECT user_id, ts, MAX(event_id) AS click_id,
      |    unix_micros(ts) AS click_ts_us,
      |    MAX_BY(value, event_id) AS click_value
      |  FROM events WHERE event_type = 'click'
      |  GROUP BY user_id, ts),
      |u AS (
      |  SELECT user_id, ts, 0 AS pri, NULL AS event_id,
      |    click_id, click_ts_us, click_value
      |  FROM c
      |  UNION ALL
      |  SELECT user_id, ts, 1 AS pri, event_id,
      |    NULL AS click_id, NULL AS click_ts_us, NULL AS click_value
      |  FROM events WHERE event_type = 'purchase'),
      |w AS (
      |  SELECT user_id, ts, pri, event_id,
      |    LAST_VALUE(click_id) IGNORE NULLS OVER win AS click_id,
      |    LAST_VALUE(click_ts_us) IGNORE NULLS OVER win AS click_ts_us,
      |    LAST_VALUE(click_value) IGNORE NULLS OVER win AS click_value
      |  FROM u
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, pri
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
      |SELECT event_id, user_id, unix_micros(ts) AS ts_us,
      |  click_id, click_ts_us, click_value
      |FROM w WHERE pri = 1
      |ORDER BY event_id""".stripMargin

  /** Weekly cohort retention — q103's semantics: first-activity cohort
    * week per user, distinct actives per (cohort, week offset). Differs
    * from the oracle only in epoch extraction (`unix_micros` vs
    * `epoch_us`) and integer division (`DIV` vs `//`).
    */
  val retention: String =
    """WITH f AS (
      |  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
      |  FROM events GROUP BY user_id),
      |a AS (
      |  SELECT e.user_id, f.cw,
      |    (unix_micros(date_trunc('week', e.ts)) - unix_micros(f.cw))
      |      DIV 604800000000 AS week_offset
      |  FROM events e JOIN f USING (user_id))
      |SELECT CAST(cw AS DATE) AS cohort_week,
      |  CAST(week_offset AS BIGINT) AS week_offset,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM a WHERE week_offset <= 3
      |GROUP BY cw, week_offset
      |ORDER BY cohort_week, week_offset""".stripMargin

  /** Column profile of the events table — q104's semantics: one row per
    * column with null counts/fraction and distinct cardinality. Differs
    * from the oracle only in the identifier quoting (backticks) and
    * `unix_micros` vs `epoch_us` for the timestamp distinct.
    */
  val profile: String =
    """SELECT * FROM (
      |  SELECT 'event_id' AS `column`, COUNT(*) AS n_rows,
      |    COUNT(*) FILTER (WHERE event_id IS NULL) AS n_null,
      |    ROUND(COUNT(*) FILTER (WHERE event_id IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6) AS null_frac,
      |    COUNT(DISTINCT event_id) AS n_distinct
      |  FROM events
      |  UNION ALL
      |  SELECT 'ts', COUNT(*), COUNT(*) FILTER (WHERE ts IS NULL),
      |    ROUND(COUNT(*) FILTER (WHERE ts IS NULL) /
      |      CAST(COUNT(*) AS DOUBLE), 6),
      |    COUNT(DISTINCT unix_micros(ts))
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
      |ORDER BY `column`""".stripMargin

  /** Token-count + stopword-ratio quality score — q13's semantics.
    * Differs from the oracle only in the list idiom (Spark
    * `split`/`filter`/`size` vs DuckDB `string_split`/`list_filter`/
    * `len`).
    */
  val textQuality: String =
    """WITH t AS (SELECT doc_id, split(trim(text), ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(size(toks) AS BIGINT) AS n_tokens,
      |  ROUND(size(filter(toks, x -> x = 'the' OR x = 'a')) / CAST(size(toks) AS DOUBLE), 6) AS stop_ratio,
      |  ROUND(LEAST(size(toks) / 100.0, 1.0) * (1.0 - size(filter(toks, x -> x = 'the' OR x = 'a')) / CAST(size(toks) AS DOUBLE)), 6) AS quality_score
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** Per-key skew report — q112's semantics: row counts per user, p99 via
    * exact interpolated percentile, max/avg skew ratio. Differs from the
    * oracle only in the percentile name (Spark exact `percentile` vs
    * DuckDB `quantile_cont` — both linear-interpolation on the sorted
    * counts).
    */
  val skewReport: String =
    """WITH c AS (
      |  SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id)
      |SELECT CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
      |  ROUND(SUM(c) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_per_key,
      |  ROUND(percentile(c, 0.99), 6) AS p99_per_key,
      |  CAST(MAX(c) AS BIGINT) AS max_per_key,
      |  ROUND(MAX(c) / ROUND(SUM(c) / CAST(COUNT(*) AS DOUBLE), 6), 6)
      |    AS skew_ratio
      |FROM c""".stripMargin
}
