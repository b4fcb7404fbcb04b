package graft

/** DuckDB oracle SQL, one per SQL-expressible query in [[SparkEntry.queries]].
  *
  * Mirrors the Spark plans' determinism rules exactly: identical DECIMAL
  * accumulation for money sums, identical `ROUND(x, 6)` on order-sensitive
  * floating aggregates, identical total ORDER BY, identical output column
  * names and types (BIGINT↔long, DOUBLE↔double, INTEGER↔int, DATE↔date).
  */
object OracleSql {

  val sql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-01-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_quantity >= 45 AND l_returnflag = 'R'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q03_join_revenue" ->
      """SELECT n_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_revenue,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,

    "q04_suffix_join" ->
      """SELECT s_suppkey, COUNT(*) AS n_matched,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal
        |FROM customer
        |JOIN supplier
        |  ON substr(lpad(CAST(c_custkey AS VARCHAR), 6, '0'), 5, 2)
        |   = substr(lpad(CAST(s_suppkey AS VARCHAR), 6, '0'), 5, 2)
        |GROUP BY s_suppkey
        |ORDER BY s_suppkey""".stripMargin,

    "q05_interval_stats" ->
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
        |ORDER BY anchor_id""".stripMargin,

    "q06_lag_delta" ->
      """WITH t AS (
        |  SELECT user_id, ts, event_id, value,
        |    value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d1
        |  FROM events),
        |t2 AS (
        |  SELECT user_id, value, d1,
        |    d1 - LAG(d1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d2
        |  FROM t)
        |SELECT user_id,
        |  COUNT(value) AS n_obs,
        |  COUNT(d1) AS n_deltas,
        |  CAST(SUM(CAST(d1 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(d1) AS delta_mean,
        |  CASE WHEN COUNT(d1) > 0 THEN ROUND(STDDEV_POP(d1), 6) END AS delta_std,
        |  CAST(SUM(CAST(d2 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(d2) AS delta2_mean,
        |  CASE WHEN COUNT(d2) > 0 THEN ROUND(STDDEV_POP(d2), 6) END AS delta2_std
        |FROM t2
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q07_weekly_trend" ->
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
        |ORDER BY user_id""".stripMargin,

    "q08_diurnal" ->
      """WITH hourly AS (
        |  SELECT event_type, hour(ts) AS hr,
        |    CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS hour_mean
        |  FROM events
        |  GROUP BY event_type, hour(ts))
        |SELECT event_type, COUNT(*) AS n_hours,
        |  ROUND(MAX(hour_mean) - MIN(hour_mean), 6) AS daily_range
        |FROM hourly
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q09_moments" ->
      """SELECT l_returnflag,
        |  COUNT(l_quantity) AS n,
        |  CASE WHEN COUNT(l_quantity) > 1 THEN ROUND(STDDEV_SAMP(l_quantity), 6) END AS std_qty,
        |  CASE WHEN COUNT(l_quantity) > 2 THEN ROUND(SKEWNESS(l_quantity), 6) END AS skew_qty,
        |  CASE WHEN COUNT(l_quantity) > 3 THEN ROUND(KURTOSIS(l_quantity), 6) END AS kurt_qty
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q10_topk" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    // portable text shared with the q146 SQL-surface twin
    "q11_dedup_exact" -> SqlText.dedup,

    "q12_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars_text,
        |  CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS n_subwords_est
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q13_quality_score" -> textQualitySql,

    "q14_lang_id" ->
      """WITH t AS (SELECT doc_id, lang, string_split(trim(text), ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang,
        |        len(list_filter(toks, x -> x = 'the')) / CAST(len(toks) AS DOUBLE) AS the_r,
        |        len(list_filter(toks, x -> x = 'a')) / CAST(len(toks) AS DOUBLE) AS a_r
        |      FROM t)
        |SELECT doc_id,
        |  ROUND(the_r, 6) AS the_ratio,
        |  CASE WHEN the_r >= 0.04 THEN 'en' WHEN a_r >= 0.04 THEN 'fr' ELSE 'und' END AS lang_pred,
        |  CAST((CASE WHEN the_r >= 0.04 THEN 'en' WHEN a_r >= 0.04 THEN 'fr' ELSE 'und' END) = lang AS INTEGER) AS is_match
        |FROM s
        |ORDER BY doc_id""".stripMargin,

    "q15_cosine_scores" ->
      """WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0)
        |SELECT e.vec_id,
        |  ROUND(list_inner_product(CAST(e.embedding AS DOUBLE[]), q.qe) /
        |    (SQRT(list_inner_product(CAST(e.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[]))) *
        |     SQRT(list_inner_product(q.qe, q.qe))), 6) AS cosine
        |FROM embeddings e CROSS JOIN q
        |WHERE e.vec_id <> 0
        |ORDER BY e.vec_id""".stripMargin,

    "q16_knn_topk" -> knnTopkSql,

    "q17_regression_metrics" ->
      """WITH t AS (
        |  SELECT o_totalprice AS y, 50000.0 + 100.0 * (o_orderkey % 1000) AS p
        |  FROM orders),
        |agg AS (
        |  SELECT COUNT(*) AS n,
        |    ROUND(CAST(SUM(CAST(ABS(y - p) AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*), 6) AS mae,
        |    ROUND(CAST(SUM(CAST((y - p) * (y - p) AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*), 0) AS mse,
        |    CAST(SUM(CAST((y - p) * (y - p) AS DECIMAL(28,4))) AS DOUBLE) AS ss_res,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sum_y,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS sum_y2,
        |    ROUND(MAX(y) - MIN(y), 6) AS y_range,
        |    ROUND(CAST(SUM(CASE WHEN y <> 0 THEN CAST(ABS((y - p) / y) AS DECIMAL(28,6)) END) AS DOUBLE)
        |      / COUNT(CASE WHEN y <> 0 THEN 1 END), 6) AS mape
        |  FROM t)
        |SELECT n, mae, mse, ROUND(SQRT(ss_res / n), 6) AS rmse,
        |  ROUND(1.0 - ss_res / (sum_y2 - sum_y * sum_y / n), 6) AS r2,
        |  ROUND(SQRT(ss_res / n) / y_range, 6) AS nrmse,
        |  mape
        |FROM agg""".stripMargin,

    "q18_confusion" ->
      """WITH t AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |         CASE WHEN (o_orderkey % 7) < 3 THEN 1 ELSE 0 END AS pred
        |  FROM orders)
        |SELECT label, pred, COUNT(*) AS n
        |FROM t
        |GROUP BY label, pred
        |ORDER BY label, pred""".stripMargin,

    "q19_balanced_accuracy" ->
      """WITH t AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |         CASE WHEN (o_orderkey % 7) < 3 THEN 1 ELSE 0 END AS pred
        |  FROM orders),
        |per AS (
        |  SELECT label,
        |    SUM(CASE WHEN pred = label THEN 1 ELSE 0 END) / COUNT(*) AS recall
        |  FROM t GROUP BY label)
        |SELECT ROUND(AVG(recall), 6) AS balanced_accuracy, COUNT(*) AS n_classes
        |FROM per""".stripMargin,

    "q20_group_split" ->
      """WITH t AS (
        |  SELECT c_custkey, c_acctbal,
        |    CASE WHEN ((c_custkey % 1000003) * 2654435761) % 1000 < 700 THEN 'train'
        |         WHEN ((c_custkey % 1000003) * 2654435761) % 1000 < 850 THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM customer)
        |SELECT split, COUNT(*) AS n, COUNT(DISTINCT c_custkey) AS n_groups,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(28,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_acctbal
        |FROM t
        |GROUP BY split
        |ORDER BY split""".stripMargin,

    "q21_stride_sample" ->
      """WITH t AS (
        |  SELECT user_id, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT user_id, event_id, rn
        |FROM t
        |WHERE (rn - 1) % 12 = 0
        |ORDER BY user_id, rn""".stripMargin,

    "q22_halves_trend" ->
      """WITH t AS (
        |  SELECT user_id, value,
        |    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |           <= COUNT(*) OVER (PARTITION BY user_id) // 2
        |      THEN 1 ELSE 2 END AS half
        |  FROM events),
        |m AS (
        |  SELECT user_id,
        |    CAST(SUM(CASE WHEN half = 1 THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE)
        |      / COUNT(CASE WHEN half = 1 THEN 1 END) AS early_mean,
        |    CAST(SUM(CASE WHEN half = 2 THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE)
        |      / COUNT(CASE WHEN half = 2 THEN 1 END) AS late_mean
        |  FROM t GROUP BY user_id)
        |SELECT user_id, early_mean, late_mean, late_mean - early_mean AS trend_change
        |FROM m
        |ORDER BY user_id""".stripMargin,

    "q23_union_period" ->
      """SELECT period, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value,
        |  COUNT(DISTINCT user_id) AS n_users
        |FROM (
        |  SELECT user_id, value, 'D1' AS period FROM events WHERE ts < TIMESTAMP '2024-01-16'
        |  UNION ALL
        |  SELECT user_id, value, 'D2' AS period FROM events WHERE ts >= TIMESTAMP '2024-01-16') t
        |GROUP BY period
        |ORDER BY period""".stripMargin,

    "q24_rowwise_mean" ->
      """SELECT l_orderkey, l_linenumber,
        |  ROUND(CASE WHEN (CASE WHEN l_discount IS NOT NULL THEN 1 ELSE 0 END)
        |           + (CASE WHEN NULLIF(l_tax, 0.02) IS NOT NULL THEN 1 ELSE 0 END) > 0
        |    THEN (COALESCE(l_discount, 0.0) + COALESCE(NULLIF(l_tax, 0.02), 0.0))
        |       / ((CASE WHEN l_discount IS NOT NULL THEN 1 ELSE 0 END)
        |        + (CASE WHEN NULLIF(l_tax, 0.02) IS NOT NULL THEN 1 ELSE 0 END))
        |    END, 6) AS rw_mean
        |FROM lineitem
        |WHERE l_orderkey < 100
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q25_distinct_count" ->
      """SELECT COUNT(*) AS n_orders,
        |  COUNT(DISTINCT o_custkey) AS n_custs,
        |  CAST(MIN(o_orderdate) AS DATE) AS first_date,
        |  CAST(MAX(o_orderdate) AS DATE) AS last_date
        |FROM orders""".stripMargin,

    "q26_class_weights" ->
      """WITH c AS (SELECT o_orderstatus, COUNT(*) AS n FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, n,
        |  ROUND(CAST(SUM(n) OVER () AS DOUBLE) / (COUNT(*) OVER () * n), 6) AS weight
        |FROM c
        |ORDER BY o_orderstatus""".stripMargin,

    // MinHash+LSH candidate profile: the portable-hash draw (seeded MD5 over
    // shingles, MD5 band hash) lets DuckDB replay the EXACT signatures,
    // buckets, and candidate pairs — the q135 precedent applied to the
    // flagship dedup sketch
    "q27_minhash_dedup" -> q27MinhashSql,

    // SimHash-64: per-token bits from the first 16 hex digits of md5(token)
    // (digit b/4, bit b%4), fingerprint packed as signed BIGINT with bit 63
    // as a min-long addition — DuckDB replays fingerprints and Hamming
    // distances exactly
    "q28_simhash" -> q28SimhashSql,

    "q31_semi_anti_join" ->
      """WITH f AS (
        |  SELECT c_mktsegment,
        |    EXISTS(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
        |           AND o.o_totalprice > 200000) AS has
        |  FROM customer c)
        |SELECT c_mktsegment,
        |  COUNT(*) FILTER (WHERE has) AS n_with,
        |  COUNT(*) FILTER (WHERE NOT has) AS n_without
        |FROM f
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q32_scalar_funcs" ->
      """SELECT p_partkey,
        |  TRIM(p_name) AS name_trim,
        |  UPPER(p_brand) AS brand_upper,
        |  substr(p_type, 1, 5) AS type_prefix,
        |  CAST(starts_with(p_name, 'a') AS INTEGER) AS starts_a,
        |  TRY_CAST(regexp_replace(lpad(CAST(p_partkey AS VARCHAR), 8, '0'), '^0+', '') AS BIGINT) AS key_restored,
        |  TRY_CAST(p_brand AS DOUBLE) AS brand_as_num
        |FROM part
        |ORDER BY p_partkey""".stripMargin,

    "q33_json_extract" ->
      """WITH t AS (
        |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |  FROM events)
        |SELECT event_type,
        |  COUNT(k) AS n,
        |  CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k,
        |  MAX(k) AS max_k
        |FROM t
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q34_sequence_assembly" ->
      """WITH s AS (
        |  SELECT user_id, list(event_id ORDER BY ts, event_id) AS ids
        |  FROM events GROUP BY user_id),
        |t AS (
        |  SELECT user_id,
        |    CASE WHEN len(ids) >= 8 THEN ids[len(ids)-7:] ELSE ids END AS last_n
        |  FROM s)
        |SELECT user_id,
        |  array_to_string(list_concat(
        |    list_transform(range(8 - len(last_n)), x -> 0), last_n), ',') AS seq_str,
        |  len(last_n) AS seq_len
        |FROM t
        |ORDER BY user_id""".stripMargin,

    "q35_monthly_trend" ->
      """WITH per AS (
        |  SELECT l_suppkey AS k, date_trunc('month', l_shipdate) AS bucket,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*) AS bucket_mean
        |  FROM lineitem
        |  GROUP BY l_suppkey, date_trunc('month', l_shipdate))
        |SELECT k, COUNT(*) AS n_buckets,
        |  CASE WHEN COUNT(bucket_mean) > 1 THEN ROUND(STDDEV_SAMP(bucket_mean), 6) END AS trend_std,
        |  ROUND(MAX(bucket_mean) - MIN(bucket_mean), 6) AS trend_range
        |FROM per
        |GROUP BY k
        |ORDER BY k""".stripMargin,

    "q36_rolling_range_frame" ->
      """SELECT user_id, event_id,
        |  ROUND(AVG(value) OVER w, 6) AS rolling_avg_3d,
        |  COUNT(*) OVER w AS n_in_window
        |FROM events
        |WINDOW w AS (PARTITION BY user_id
        |  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
        |  RANGE BETWEEN 259200 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, event_id""".stripMargin,

    "q37_cosine_neardup" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_inner_product(a.emb, b.emb) /
        |    (SQRT(list_inner_product(a.emb, a.emb)) *
        |     SQRT(list_inner_product(b.emb, b.emb))), 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |    (SQRT(list_inner_product(a.emb, a.emb)) *
        |     SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.2
        |ORDER BY id_a, id_b""".stripMargin,

    "q38_stream_windowed" ->
      """WITH wm AS (SELECT MAX(ts) - INTERVAL 1 DAY AS w FROM events)
        |SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_value
        |FROM events CROSS JOIN wm
        |GROUP BY 1, 2, wm.w
        |HAVING date_trunc('day', MIN(ts)) + INTERVAL 1 DAY <= wm.w
        |ORDER BY window_start, event_type""".stripMargin,

    "q39_jaccard_neardup" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, sh FROM (
        |    SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1), i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [array_to_string(tk, ' ')] END) AS sh
        |    FROM toks)),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |-- mirror the Spark side's explicit shingle-df cap (1000): hot
        |-- shingles are excluded from candidate generation AND the shared
        |-- count, while n_sh stays the full set size
        |cold AS (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000),
        |shared AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
        |  FROM sh a JOIN cold USING (sh)
        |  JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  ROUND(n_shared / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6) AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.doc_id = id_a
        |JOIN sizes sb ON sb.doc_id = id_b
        |WHERE ROUND(n_shared / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // multimodal metadata: the payload is the text's UTF-8 bytes (no real
    // media in the harness), so every row takes the stub-dims path — a
    // deterministic FNV-1 64 content hash, replayed here as a HUGEINT
    // fold over the hex-decoded payload bytes (wrapping multiply = mod
    // 2^64; the unsigned hash makes floorMod/>>> plain % and //)
    "q40_multimodal_meta" ->
      """WITH b AS (
        |  SELECT doc_id, source, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n_bytes
        |  FROM documents),
        |hashed AS (
        |  SELECT doc_id, source, n_bytes,
        |    list_reduce(
        |      list_prepend(CAST(14695981039346656037 AS HUGEINT),
        |        list_transform(range(1, n_bytes + 1),
        |          i -> CAST(
        |            (STRPOS('0123456789ABCDEF', SUBSTRING(hx, 2*i - 1, 1)) - 1) * 16 +
        |            STRPOS('0123456789ABCDEF', SUBSTRING(hx, 2*i, 1)) - 1
        |            AS HUGEINT))),
        |      (acc, x) -> ((acc - acc % 256 +
        |          CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
        |        * CAST(1099511628211 AS HUGEINT))
        |        % CAST(18446744073709551616 AS HUGEINT)) AS h
        |  FROM b),
        |dims AS (
        |  SELECT source, n_bytes,
        |    64 + CAST(h % 1024 AS BIGINT) AS w,
        |    64 + CAST((h // 1024) % 1024 AS BIGINT) AS ht
        |  FROM hashed)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CAST(n_bytes AS DECIMAL(28,0))) AS BIGINT) AS total_bytes,
        |  CAST(SUM(CAST(w AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS avg_width,
        |  CAST(SUM(CAST(ht AS DECIMAL(28,0))) AS DOUBLE) / COUNT(*) AS avg_height
        |FROM dims GROUP BY source ORDER BY source""".stripMargin,

    "q41_confusion_pivot" ->
      """WITH t AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |         CASE WHEN (o_orderkey % 7) < 3 THEN 1 ELSE 0 END AS pred
        |  FROM orders),
        |a AS (
        |  SELECT label AS cls, COUNT(*) AS support,
        |    COUNT(*) FILTER (WHERE pred = label) AS tp
        |  FROM t GROUP BY label),
        |b AS (SELECT pred AS cls, COUNT(*) AS pred_n FROM t GROUP BY pred),
        |tot AS (SELECT COUNT(*) AS n FROM t)
        |SELECT cls, support,
        |  ROUND(tp / CAST(pred_n AS DOUBLE), 6) AS precision,
        |  ROUND(tp / CAST(support AS DOUBLE), 6) AS recall,
        |  ROUND(2 * tp / CAST(pred_n + support AS DOUBLE), 6) AS f1,
        |  ROUND((n - support - (pred_n - tp)) / CAST(n - support AS DOUBLE), 6) AS specificity
        |FROM a JOIN b USING (cls) CROSS JOIN tot
        |ORDER BY cls""".stripMargin,

    "q44_feature_matrix" ->
      """WITH j AS (
        |  SELECT a.event_id AS anchor_id, e.value, e.ts, e.event_id
        |  FROM events e
        |  JOIN events a ON a.event_type = 'signup'
        |    AND e.user_id = a.user_id
        |    AND e.ts >= a.ts - INTERVAL 3 DAY
        |    AND e.ts <= a.ts + INTERVAL 3 DAY),
        |d AS (
        |  SELECT anchor_id, value, ts, event_id,
        |    value - LAG(value) OVER (PARTITION BY anchor_id ORDER BY ts, event_id) AS d1
        |  FROM j)
        |SELECT anchor_id,
        |  COUNT(*) AS n_samples,
        |  ROUND(COUNT(*) / (7.0 * 24 * 4), 6) AS window_coverage,
        |  CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value) AS v_mean,
        |  CASE WHEN COUNT(value) > 1 THEN ROUND(STDDEV_SAMP(value), 6) END AS v_std,
        |  MIN(value) AS v_min,
        |  MAX(value) AS v_max,
        |  ROUND(MAX(value) - MIN(value), 6) AS v_range,
        |  CASE WHEN COUNT(value) > 2 THEN ROUND(SKEWNESS(value), 6) END AS v_skew,
        |  CASE WHEN COUNT(value) > 3 THEN ROUND(KURTOSIS(value), 6) END AS v_kurt,
        |  CAST(SUM(CAST(d1 AS DECIMAL(28,6))) AS DOUBLE) / COUNT(d1) AS v_delta_mean,
        |  CASE WHEN COUNT(d1) > 0 THEN ROUND(STDDEV_POP(d1), 6) END AS v_delta_std
        |FROM d
        |GROUP BY anchor_id
        |HAVING COUNT(*) >= 10
        |ORDER BY anchor_id""".stripMargin,

    "q45_period_agg" ->
      """SELECT l_suppkey, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_quantity) AS qty_mean,
        |  CASE WHEN COUNT(l_quantity) > 1 THEN ROUND(STDDEV_SAMP(l_quantity), 6) END AS qty_std,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) / COUNT(l_extendedprice) AS price_mean,
        |  ROUND(MAX(l_extendedprice) - MIN(l_extendedprice), 6) AS price_range
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_suppkey
        |HAVING COUNT(*) >= 100
        |ORDER BY l_suppkey""".stripMargin,

    "q46_auc_rank" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |    (o_orderkey % 1000) / 1000.0 + o_totalprice / 1e6 AS score
        |  FROM orders),
        |r AS (
        |  SELECT label, score, ROW_NUMBER() OVER (ORDER BY score) AS rk FROM d),
        |rr AS (
        |  SELECT label, AVG(rk) OVER (PARTITION BY score) AS arank FROM r)
        |SELECT COUNT(*) AS n,
        |  CAST(SUM(label) AS BIGINT) AS n_pos,
        |  ROUND(
        |    (CAST(SUM(CASE WHEN label = 1 THEN CAST(arank AS DECIMAL(28,6)) END) AS DOUBLE)
        |      - (SUM(label) * (SUM(label) + 1) / 2.0)) /
        |    (SUM(label) * (COUNT(*) - SUM(label))), 6) AS auc
        |FROM rr""".stripMargin,

    "q48_multitask_mask" ->
      """WITH d AS (
        |  SELECT l_returnflag,
        |    NULLIF(l_tax, 0.0) AS task_a,
        |    NULLIF(l_discount, 0.0) AS task_b
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  COUNT(task_a) AS n_valid_a,
        |  CAST(SUM(CAST(task_a AS DECIMAL(28,2))) AS DOUBLE) / COUNT(task_a) AS mean_a,
        |  COUNT(task_b) AS n_valid_b,
        |  CAST(SUM(CAST(task_b AS DECIMAL(28,2))) AS DOUBLE) / COUNT(task_b) AS mean_b,
        |  CAST(SUM(CAST(COALESCE(task_a, -1.0) AS DECIMAL(28,2))) AS DOUBLE) AS masked_sum_a,
        |  ROUND(COUNT(task_a) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage_a
        |FROM d
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q51_sessionize" ->
      """WITH x AS (
        |  SELECT user_id, ts, value,
        |    CASE WHEN epoch(ts) - epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, value)) > 86400
        |      THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts, value,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, value
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |g AS (
        |  SELECT user_id, sid,
        |    CAST(floor(epoch(MIN(ts))) AS BIGINT) AS start_epoch,
        |    CAST(floor(epoch(MAX(ts))) AS BIGINT) AS end_epoch,
        |    epoch_ms(MAX(ts)) AS end_ms,
        |    COUNT(*) AS n_events,
        |    ROUND(SUM(value), 4) AS sum_value
        |  FROM s GROUP BY user_id, sid),
        |m AS (SELECT user_id, MAX(sid) AS last_sid FROM g GROUP BY user_id),
        |wm AS (SELECT epoch_ms(MAX(ts)) AS max_ms FROM events)
        |SELECT g.user_id, start_epoch, end_epoch, n_events, sum_value
        |FROM g JOIN m ON g.user_id = m.user_id CROSS JOIN wm
        |WHERE g.sid < m.last_sid
        |   OR g.end_ms + 86400000 < wm.max_ms
        |ORDER BY g.user_id, start_epoch""".stripMargin,

    "q54_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q55_pivot" ->
      """SELECT user_id,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE), 0.0) AS click,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE), 0.0) AS purchase,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'signup' THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE), 0.0) AS signup,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'view' THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE), 0.0) AS view,
        |  COALESCE(CAST(SUM(CASE WHEN event_type = 'share' THEN CAST(value AS DECIMAL(28,4)) END) AS DOUBLE), 0.0) AS share
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q56_ranking" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  rnk, drnk, prnk
        |FROM (
        |  SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(RANK() OVER w AS BIGINT) AS rnk,
        |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        |    ROUND(PERCENT_RANK() OVER w, 6) AS prnk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rnk <= 3
        |ORDER BY c_nationkey, rnk, c_custkey""".stripMargin,

    "q57_posexplode" ->
      """WITH t AS (SELECT doc_id, (string_split(trim(text), ' '))[1:5] AS tk5 FROM documents),
        |u AS (SELECT doc_id,
        |        unnest(list_transform(tk5, (w, i) -> struct_pack(pos := i - 1, word := w))) AS s
        |      FROM t)
        |SELECT CAST(s.pos AS BIGINT) AS pos, COUNT(*) AS n,
        |  COUNT(DISTINCT s.word) AS n_distinct, MIN(s.word) AS first_word
        |FROM u GROUP BY 1
        |ORDER BY pos""".stripMargin,

    "q58_stream_dedup" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // closed-form OOF ridge: q60's surface + the λI term under MLlib's
    // WLS standardization convention (population moments of BOTH feature
    // and label) — slope = Sxy_c / (Sxx_c · (1 + λ/sdₚ(y))), λ = 1.0.
    // Identical exact-decimal sums, identical IEEE expression order.
    "q183_ridge_closed_form" ->
      """WITH d AS (
        |  SELECT ((l_orderkey % 1000003) * 2654435761) % 5 AS fold,
        |         CAST(l_quantity AS DOUBLE) AS x,
        |         CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 500),
        |pf AS (
        |  SELECT fold, COUNT(*) AS n_f,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx_f,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy_f,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy_f,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx_f,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy_f
        |  FROM d GROUP BY fold),
        |g AS (
        |  SELECT COUNT(*) AS n_g,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx_g,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy_g,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy_g,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx_g,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy_g
        |  FROM d),
        |p AS (
        |  SELECT fold, n_f, (n_g - n_f) AS n_tr,
        |    (sx_g - sx_f) AS sx, (sy_g - sy_f) AS sy,
        |    (sxy_g - sxy_f) AS sxy, (sxx_g - sxx_f) AS sxx,
        |    (syy_g - syy_f) AS syy
        |  FROM pf CROSS JOIN g),
        |pd AS (
        |  SELECT fold, n_f, n_tr, sx, sy, sxy, sxx,
        |    (n_tr * sxx - sx * sx) AS den0,
        |    (syy - sy * sy / n_tr) AS syyc
        |  FROM p),
        |ps AS (
        |  SELECT fold, n_f, n_tr, sx, sy,
        |    CASE WHEN den0 <> 0 AND syyc > 0 THEN
        |      (n_tr * sxy - sx * sy) /
        |        (den0 * (1.0 + 1.0 / SQRT(syyc / n_tr)))
        |    END AS slope
        |  FROM pd),
        |p2 AS (
        |  SELECT fold, n_f, n_tr, slope,
        |    (sy - slope * sx) / n_tr AS intercept
        |  FROM ps),
        |e AS (
        |  SELECT d.fold, d.y - (p2.intercept + p2.slope * d.x) AS err
        |  FROM d JOIN p2 USING (fold)),
        |er AS (
        |  SELECT fold,
        |    ROUND(SQRT(CAST(SUM(CAST(err * err AS DECIMAL(28,4))) AS DOUBLE)
        |      / COUNT(*)), 6) AS rmse_oof
        |  FROM e GROUP BY fold)
        |SELECT p2.fold, p2.n_tr AS n_train, p2.n_f AS n_test,
        |  ROUND(p2.slope, 6) AS slope, ROUND(p2.intercept, 6) AS intercept,
        |  er.rmse_oof
        |FROM p2 JOIN er USING (fold)
        |ORDER BY fold""".stripMargin,

    // q183's closed form per grid λ; pooled RMSE per λ, argmin flagged —
    // DuckDB decimal literals CAST to DOUBLE so λ arithmetic matches
    // Spark's double grid exactly
    "q187_ridge_grid_portable" ->
      """WITH d AS (
        |  SELECT ((l_orderkey % 1000003) * 2654435761) % 5 AS fold,
        |         CAST(l_quantity AS DOUBLE) AS x,
        |         CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 500),
        |pf AS (
        |  SELECT fold, COUNT(*) AS n_f,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx_f,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy_f,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy_f,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx_f,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy_f
        |  FROM d GROUP BY fold),
        |g AS (
        |  SELECT COUNT(*) AS n_g,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx_g,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy_g,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy_g,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx_g,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,4))) AS DOUBLE) AS syy_g
        |  FROM d),
        |grid AS (
        |  SELECT CAST(lambda AS DOUBLE) AS lambda
        |  FROM (VALUES (0.01), (0.1), (1.0), (10.0)) t(lambda)),
        |p AS (
        |  SELECT lambda, fold, n_f, (n_g - n_f) AS n_tr,
        |    (sx_g - sx_f) AS sx, (sy_g - sy_f) AS sy,
        |    (sxy_g - sxy_f) AS sxy, (sxx_g - sxx_f) AS sxx,
        |    (syy_g - syy_f) AS syy
        |  FROM pf CROSS JOIN g CROSS JOIN grid),
        |pd AS (
        |  SELECT lambda, fold, n_tr, sx, sy, sxy, sxx,
        |    (n_tr * sxx - sx * sx) AS den0,
        |    (syy - sy * sy / n_tr) AS syyc
        |  FROM p),
        |ps AS (
        |  SELECT lambda, fold, n_tr, sx, sy,
        |    CASE WHEN den0 <> 0 AND syyc > 0 THEN
        |      (n_tr * sxy - sx * sy) /
        |        (den0 * (1.0 + lambda / SQRT(syyc / n_tr)))
        |    END AS slope
        |  FROM pd),
        |p2 AS (
        |  SELECT lambda, fold, slope,
        |    (sy - slope * sx) / n_tr AS intercept
        |  FROM ps),
        |e AS (
        |  SELECT p2.lambda, d.y - (p2.intercept + p2.slope * d.x) AS err
        |  FROM d JOIN p2 USING (fold)),
        |er AS (
        |  SELECT lambda,
        |    SQRT(CAST(SUM(CAST(err * err AS DECIMAL(28,4))) AS DOUBLE)
        |      / COUNT(*)) AS rmse_raw
        |  FROM e GROUP BY lambda)
        |SELECT lambda, ROUND(rmse_raw, 6) AS rmse_oof_pooled,
        |  CASE WHEN ROW_NUMBER() OVER (ORDER BY rmse_raw ASC, lambda ASC) = 1
        |    THEN 1 ELSE 0 END AS is_best
        |FROM er
        |ORDER BY lambda""".stripMargin,

    "q60_oof_closed_form" ->
      """WITH d AS (
        |  SELECT ((l_orderkey % 1000003) * 2654435761) % 5 AS fold,
        |         CAST(l_quantity AS DOUBLE) AS x,
        |         CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem WHERE l_orderkey < 500),
        |pf AS (
        |  SELECT fold, COUNT(*) AS n_f,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx_f,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy_f,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy_f,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx_f
        |  FROM d GROUP BY fold),
        |g AS (
        |  SELECT COUNT(*) AS n_g,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx_g,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy_g,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy_g,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx_g
        |  FROM d),
        |p AS (
        |  SELECT fold, n_f, (n_g - n_f) AS n_tr,
        |    (sx_g - sx_f) AS sx, (sy_g - sy_f) AS sy,
        |    (sxy_g - sxy_f) AS sxy, (sxx_g - sxx_f) AS sxx
        |  FROM pf CROSS JOIN g),
        |ps AS (
        |  SELECT fold, n_f, n_tr, sx, sy,
        |    (n_tr * sxy - sx * sy) / (n_tr * sxx - sx * sx) AS slope
        |  FROM p),
        |p2 AS (
        |  SELECT fold, n_f, n_tr, slope,
        |    (sy - slope * sx) / n_tr AS intercept
        |  FROM ps),
        |e AS (
        |  SELECT d.fold, d.y - (p2.intercept + p2.slope * d.x) AS err
        |  FROM d JOIN p2 USING (fold)),
        |er AS (
        |  SELECT fold,
        |    ROUND(SQRT(CAST(SUM(CAST(err * err AS DECIMAL(28,4))) AS DOUBLE)
        |      / COUNT(*)), 6) AS rmse_oof
        |  FROM e GROUP BY fold)
        |SELECT p2.fold, p2.n_tr AS n_train, p2.n_f AS n_test,
        |  ROUND(p2.slope, 6) AS slope, ROUND(p2.intercept, 6) AS intercept,
        |  er.rmse_oof
        |FROM p2 JOIN er USING (fold)
        |ORDER BY fold""".stripMargin,

    "q61_ovr_multiclass_auc" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_orderstatus = 'F' THEN 0
        |              WHEN o_orderstatus = 'O' THEN 1 ELSE 2 END AS label3,
        |         o_orderkey, o_totalprice
        |  FROM orders),
        |x AS (
        |  SELECT c.cls,
        |    CASE WHEN d.label3 = c.cls THEN 1 ELSE 0 END AS bin_label,
        |    ((d.o_orderkey * (c.cls + 3)) % 1000) / 1000.0 + d.o_totalprice / 1e6 AS score
        |  FROM d CROSS JOIN (VALUES (0), (1), (2)) AS c(cls)),
        |r AS (
        |  SELECT cls, bin_label, score,
        |    ROW_NUMBER() OVER (PARTITION BY cls ORDER BY score) AS rk
        |  FROM x),
        |rr AS (
        |  SELECT cls, bin_label, AVG(rk) OVER (PARTITION BY cls, score) AS arank
        |  FROM r),
        |a AS (
        |  SELECT cls, COUNT(*) AS n, CAST(SUM(bin_label) AS BIGINT) AS n_pos,
        |    ROUND(
        |      (CAST(SUM(CASE WHEN bin_label = 1 THEN CAST(arank AS DECIMAL(28,6)) END) AS DOUBLE)
        |        - (SUM(bin_label) * (SUM(bin_label) + 1) / 2.0)) /
        |      (SUM(bin_label) * (COUNT(*) - SUM(bin_label))), 6) AS auc
        |  FROM rr GROUP BY cls)
        |SELECT cls, n, n_pos, auc, ROUND(AVG(auc) OVER (), 6) AS macro_auc
        |FROM a
        |ORDER BY cls""".stripMargin,

    "q43_stream_static_join" ->
      """WITH u AS (
        |  SELECT user_id, COUNT(*) AS n_total FROM events
        |  GROUP BY user_id HAVING COUNT(*) >= 50)
        |SELECT e.user_id, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_value
        |FROM events e JOIN u USING (user_id)
        |GROUP BY e.user_id
        |ORDER BY e.user_id""".stripMargin,

    "q63_asof_join" -> asofSql,

    "q64_corpus_clean" ->
      """WITH s AS (
        |  SELECT doc_id, source, text, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, source, text,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    ROUND(LEAST(len(toks) / 100.0, 1.0) *
        |      (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) /
        |        CAST(len(toks) AS DOUBLE)), 6) AS quality_score,
        |    len(list_filter(toks, x -> x = 'the')) /
        |      CAST(len(toks) AS DOUBLE) AS the_r
        |  FROM s),
        |kept AS (
        |  SELECT doc_id, source, n_tokens, quality_score, md5(text) AS h
        |  FROM q WHERE quality_score >= 0.5 AND the_r >= 0.04),
        |g AS (
        |  SELECT h, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |  FROM kept GROUP BY h)
        |SELECT kept.source,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(g.n_copies - 1) AS BIGINT) AS n_dups_removed,
        |  ROUND(CAST(SUM(CAST(kept.quality_score AS DECIMAL(28,6))) AS DOUBLE)
        |    / COUNT(kept.quality_score), 6) AS avg_quality,
        |  CAST(SUM(kept.n_tokens) AS BIGINT) AS sum_tokens
        |FROM kept JOIN g USING (h)
        |WHERE kept.doc_id = g.keep_id
        |GROUP BY kept.source
        |ORDER BY kept.source""".stripMargin,

    "q65_stream_stream_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, ts AS c_ts, value AS c_value
        |      FROM events WHERE event_type = 'click')
        |SELECT p.p_id, c.c_id, p.user_id,
        |  epoch_us(p.p_ts) AS p_ts_us, epoch_us(c.c_ts) AS c_ts_us, c.c_value
        |FROM p JOIN c ON p.user_id = c.user_id
        |  AND c.c_ts <= p.p_ts
        |  AND c.c_ts >= p.p_ts - INTERVAL 1 DAY
        |ORDER BY p.p_id, c.c_id""".stripMargin,

    "q66_corpus_mix" ->
      """SELECT source,
        |  COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE ((doc_id % 1000003) * 2654435761) % 1000 <
        |  CASE WHEN source IN ('src10','src11','src12','src13','src14',
        |                       'src15','src16','src17','src18','src19')
        |       THEN 300 ELSE 1000 END
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q67_dup_clusters" ->
      """WITH RECURSIVE e AS (
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
        |reach(v, c) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT sym.dst, reach.c FROM reach JOIN sym ON sym.src = reach.v)
        |SELECT v AS vec_id, MIN(c) AS component
        |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin,

    "q68_interval_bucketed" ->
      """SELECT a.event_id AS anchor_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN events a
        |  ON a.event_type = 'signup'
        | AND e.user_id = a.user_id
        | AND e.ts >= a.ts - INTERVAL 1 HOUR
        | AND e.ts <= a.ts + INTERVAL 1 HOUR
        |GROUP BY a.event_id
        |ORDER BY anchor_id""".stripMargin,

    "q69_tfidf_topterms" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS term
        |  FROM documents),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.term, tf.tf,
        |    ROUND(tf.tf * (LN((n.n_docs + 1.0) / (dfreq.df + 1.0)) + 1.0), 6)
        |      AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        |SELECT doc_id, term, tf, tfidf, rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 3
        |ORDER BY doc_id, rank""".stripMargin,

    "q70_cdc_compact" ->
      """SELECT user_id, last_event_id, last_type, last_value FROM (
        |  SELECT user_id, event_id AS last_event_id,
        |    event_type AS last_type, value AS last_value,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND last_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q71_repetition_quality" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
        |base AS (
        |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens,
        |    ROUND(CAST(1 AS DOUBLE) -
        |      len(list_distinct(tk)) / CAST(len(tk) AS DOUBLE), 6)
        |      AS dup_token_frac
        |  FROM t),
        |bg AS (
        |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 2
        |    THEN list_transform(range(1, len(tk)),
        |           i -> array_to_string(tk[i:i+1], ' '))
        |    ELSE [array_to_string(tk, ' ')] END) AS bg
        |  FROM t),
        |cnt AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |rep AS (
        |  SELECT doc_id, ROUND(MAX(c) / CAST(SUM(c) AS DOUBLE), 6)
        |    AS top_bigram_frac
        |  FROM cnt GROUP BY 1)
        |SELECT base.doc_id, n_tokens, dup_token_frac, top_bigram_frac
        |FROM base JOIN rep USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q72_dedup_pipeline" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.4),
        |sym AS (
        |  SELECT src, dst FROM pairs
        |  UNION SELECT dst, src FROM pairs),
        |reach(v, c) AS (
        |  SELECT src, src FROM sym
        |  UNION
        |  SELECT sym.dst, reach.c FROM reach JOIN sym ON sym.src = reach.v),
        |dropped AS (
        |  SELECT v FROM reach GROUP BY v HAVING v <> MIN(c))
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents
        |WHERE doc_id < 200 AND doc_id NOT IN (SELECT v FROM dropped)
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    // identical to q70 — the streaming view must converge to the batch
    // compaction's exact table
    "q73_stream_cdc" ->
      """SELECT user_id, last_event_id, last_type, last_value FROM (
        |  SELECT user_id, event_id AS last_event_id,
        |    event_type AS last_type, value AS last_value,
        |    ROW_NUMBER() OVER (
        |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 AND last_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q75_sequence_packing" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, source, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM t)
        |SELECT source, CAST(FLOOR(prior / 512.0) AS BIGINT) AS pack_id,
        |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2
        |ORDER BY source, pack_id""".stripMargin,

    "q76_decontamination" ->
      """WITH toks AS (
        |  SELECT doc_id, source, string_split(trim(text), ' ') AS tk
        |  FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, source, sh FROM (
        |    SELECT doc_id, source, unnest(CASE WHEN len(tk) >= 3
        |      THEN list_transform(range(1, len(tk) - 1),
        |             i -> array_to_string(tk[i:i+2], ' '))
        |      ELSE [array_to_string(tk, ' ')] END) AS sh
        |    FROM toks)),
        |bench AS (SELECT DISTINCT sh FROM sh WHERE source = 'src0')
        |SELECT DISTINCT doc_id FROM sh
        |WHERE source <> 'src0' AND sh IN (SELECT sh FROM bench)
        |ORDER BY doc_id""".stripMargin,

    "q77_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(2 * GROUPING(l_returnflag) + GROUPING(l_linestatus) AS BIGINT)
        |    AS gid,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(28,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag ASC NULLS FIRST,
        |  l_linestatus ASC NULLS FIRST""".stripMargin,

    "q78_knn_join" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |scored AS (
        |  SELECT q.vec_id AS q_id, e.vec_id AS n_id,
        |    ROUND(list_inner_product(e.emb, q.emb) /
        |      (SQRT(list_inner_product(e.emb, e.emb)) *
        |       SQRT(list_inner_product(q.emb, q.emb))), 6) AS cosine
        |  FROM e JOIN e q ON q.vec_id < 20 AND q.vec_id <> e.vec_id)
        |SELECT q_id, n_id, cosine, rank FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY q_id ORDER BY cosine DESC, n_id) AS BIGINT) AS rank
        |  FROM scored)
        |WHERE rank <= 3
        |ORDER BY q_id, rank""".stripMargin,

    "q79_percentile_truncation" ->
      """WITH thr AS (SELECT quantile_cont(n_chars, 0.95) AS thr
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_kept,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents, thr
        |WHERE n_chars <= thr.thr
        |GROUP BY source
        |ORDER BY source""".stripMargin,

    "q81_set_ops" ->
      """SELECT user_id FROM events WHERE event_type = 'click'
        |  GROUP BY 1 HAVING COUNT(*) >= 6
        |INTERSECT
        |SELECT user_id FROM events WHERE event_type = 'view'
        |  GROUP BY 1 HAVING COUNT(*) >= 6
        |EXCEPT
        |SELECT user_id FROM events WHERE event_type = 'purchase'
        |  GROUP BY 1 HAVING COUNT(*) >= 6
        |ORDER BY user_id""".stripMargin,

    "q82_zscore_outliers" ->
      """WITH s AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE) / COUNT(value)
        |      AS mu,
        |    CASE WHEN COUNT(value) > 1 THEN ROUND(STDDEV_SAMP(value), 6) END
        |      AS sd
        |  FROM events GROUP BY user_id)
        |SELECT e.event_id, e.user_id, e.value,
        |  ROUND(ABS(e.value - s.mu) / s.sd, 6) AS z
        |FROM events e JOIN s ON e.user_id = s.user_id AND s.sd > 0
        |WHERE ROUND(ABS(e.value - s.mu) / s.sd, 6) >= 3.0
        |ORDER BY e.event_id""".stripMargin,

    // DuckDB twin of SqlText.sessionize, shared with the q149 SQL-surface
    // query (floor(epoch) is the DuckDB spelling of unix_seconds)
    "q83_batch_sessionize" -> sessionizeSql,

    "q84_calibration" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |    (o_orderkey * 7 % 1000) / CAST(1000.0 AS DOUBLE) AS score
        |  FROM orders)
        |SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(score AS DECIMAL(28,3))) AS DOUBLE) / COUNT(*)
        |    AS avg_score,
        |  CAST(SUM(label) AS DOUBLE) / COUNT(*) AS pos_rate,
        |  CAST(SUM(CAST((score - label) * (score - label) AS DECIMAL(28,6)))
        |    AS DOUBLE) / COUNT(*) AS brier
        |FROM d GROUP BY 1
        |ORDER BY bin""".stripMargin,

    "q85_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(lower(text),
        |      '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(LENGTH(text) AS BIGINT) AS n_chars_raw,
        |  CAST(LENGTH(norm) AS BIGINT) AS n_chars_norm,
        |  CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens_norm
        |FROM n
        |ORDER BY doc_id""".stripMargin,

    // identical to q38 — the materialized partition-overwrite table must
    // contain exactly the memory-sink result
    "q86_materialize" ->
      """WITH wm AS (SELECT MAX(ts) - INTERVAL 1 DAY AS w FROM events)
        |SELECT CAST(date_trunc('day', ts) AS DATE) AS window_start, event_type,
        |  COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4))) AS DOUBLE), 4) AS sum_value
        |FROM events CROSS JOIN wm
        |GROUP BY 1, 2, wm.w
        |HAVING date_trunc('day', MIN(ts)) + INTERVAL 1 DAY <= wm.w
        |ORDER BY window_start, event_type""".stripMargin,

    "q87_sql_surface" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 50)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(list_inner_product(a.emb, b.emb) /
        |    (SQRT(list_inner_product(a.emb, a.emb)) *
        |     SQRT(list_inner_product(b.emb, b.emb))), 6) AS cosine
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |ORDER BY id_a, id_b""".stripMargin,

    "q88_decile_binning" ->
      """WITH d AS (
        |  SELECT o_orderstatus, o_totalprice,
        |    CAST(NTILE(10) OVER (PARTITION BY o_orderstatus
        |      ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS decile
        |  FROM orders)
        |SELECT o_orderstatus, decile, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_price,
        |  MIN(o_totalprice) AS min_price,
        |  MAX(o_totalprice) AS max_price
        |FROM d GROUP BY 1, 2
        |ORDER BY o_orderstatus, decile""".stripMargin,

    "q89_integrity_audit" ->
      """SELECT
        |  (SELECT COUNT(*) FROM lineitem l
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_orderkey = l.l_orderkey))
        |    AS n_orphan_lineitems,
        |  (SELECT COUNT(*) FROM orders o
        |   WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                     WHERE l.l_orderkey = o.o_orderkey))
        |    AS n_childless_orders,
        |  (SELECT COUNT(*) FROM customer c
        |   WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                     WHERE o.o_custkey = c.c_custkey))
        |    AS n_orderless_customers""".stripMargin,

    // the salt must be result-invisible: plain join reproduces it
    "q90_salted_join" ->
      """WITH dim AS (
        |  SELECT user_id, COUNT(*) AS n_total FROM events
        |  GROUP BY user_id HAVING COUNT(*) >= 50)
        |SELECT e.user_id, d.n_total, COUNT(*) AS n_joined,
        |  CAST(SUM(CAST(e.value AS DECIMAL(28,4))) AS DOUBLE) AS sum_value
        |FROM events e JOIN dim d ON e.user_id = d.user_id
        |GROUP BY e.user_id, d.n_total
        |ORDER BY e.user_id""".stripMargin,

    "q91_time_weighted_avg" ->
      """WITH x AS (
        |  SELECT user_id, value,
        |    LEAD(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) - epoch_us(ts)
        |      AS dur_us
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |  CAST(SUM(dur_us) AS BIGINT) AS total_us,
        |  ROUND(CAST(SUM(CAST(value * dur_us AS DECIMAL(28,4))) AS DOUBLE) /
        |    SUM(dur_us), 6) AS twa
        |FROM x WHERE dur_us IS NOT NULL
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q92_resample_ffill" ->
      """WITH ev AS (
        |  SELECT user_id, ts, value, event_id FROM events WHERE user_id < 30),
        |obs AS (
        |  SELECT user_id, ts, value FROM (
        |    SELECT user_id, ts, value, ROW_NUMBER() OVER (
        |      PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        |    FROM ev) WHERE rn = 1),
        |b AS (
        |  SELECT user_id,
        |    CAST(FLOOR(epoch_us(MIN(ts)) / 3600000000) AS BIGINT) AS mn,
        |    CAST(FLOOR(epoch_us(MAX(ts)) / 3600000000) AS BIGINT) AS mx
        |  FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id, unnest(range(mn, mx + 1)) AS h FROM b),
        |g2 AS (
        |  SELECT user_id, h, make_timestamp(h * 3600000000) AS ts FROM grid)
        |SELECT g2.user_id, g2.h AS hour_idx, o.value AS ffill_value
        |FROM g2 ASOF LEFT JOIN obs o
        |  ON g2.user_id = o.user_id AND g2.ts >= o.ts
        |ORDER BY g2.user_id, hour_idx""".stripMargin,

    "q93_star_join" ->
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
        |LIMIT 10""".stripMargin,

    "q94_unpivot" ->
      """WITH m AS (
        |  SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice FROM lineitem)
        |SELECT measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        |FROM m GROUP BY measure
        |ORDER BY measure""".stripMargin,

    "q95_feature_corr" ->
      """SELECT pair, n, pearson_r, covar FROM (
        |  SELECT 'l_quantity~l_extendedprice' AS pair, COUNT(*) AS n,
        |    ROUND(CORR(l_quantity, l_extendedprice), 6) AS pearson_r,
        |    ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 6) AS covar
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_quantity~l_discount', COUNT(*),
        |    ROUND(CORR(l_quantity, l_discount), 6),
        |    ROUND(COVAR_SAMP(l_quantity, l_discount), 6)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice~l_tax', COUNT(*),
        |    ROUND(CORR(l_extendedprice, l_tax), 6),
        |    ROUND(COVAR_SAMP(l_extendedprice, l_tax), 6)
        |  FROM lineitem)
        |ORDER BY pair""".stripMargin,

    "q96_fuzzy_match" ->
      """WITH n AS (
        |  SELECT DISTINCT p_name,
        |    string_split(p_name, ' ')[-1] AS noun
        |  FROM part)
        |SELECT a.p_name AS name_a, b.p_name AS name_b,
        |  CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
        |FROM n a JOIN n b ON a.noun = b.noun AND a.p_name < b.p_name
        |WHERE levenshtein(a.p_name, b.p_name) <= 4
        |ORDER BY name_a, name_b""".stripMargin,

    "q97_token_lm" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split(trim(text), ' ')) AS tok
        |  FROM documents),
        |lm AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
        |d AS (
        |  SELECT doc_id, COUNT(*) AS n_tokens, SUM(c) AS sum_c,
        |    COUNT(*) FILTER (WHERE c < 3) AS n_rare
        |  FROM toks JOIN lm USING (tok)
        |  GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  ROUND(sum_c / CAST(n_tokens AS DOUBLE), 6) AS avg_token_freq,
        |  ROUND(n_rare / CAST(n_tokens AS DOUBLE), 6) AS rare_frac
        |FROM d ORDER BY doc_id""".stripMargin,

    "q98_char_diversity" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |hist AS (
        |  SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch),
        |d AS (
        |  SELECT doc_id, SUM(c) AS n_chars, COUNT(*) AS n_distinct_chars,
        |    MAX(c) AS max_c, SUM(c * c) AS sum_sq,
        |    SUM(CAST(c * ln(CAST(c AS DOUBLE)) AS DECIMAL(28,10))) AS sum_clnc
        |  FROM hist GROUP BY doc_id)
        |SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(n_distinct_chars AS BIGINT) AS n_distinct_chars,
        |  ROUND(1.0 - sum_sq / CAST(n_chars * n_chars AS DOUBLE), 6) AS simpson,
        |  ROUND(max_c / CAST(n_chars AS DOUBLE), 6) AS top_char_share,
        |  ROUND(ln(CAST(n_chars AS DOUBLE)) -
        |    CAST(sum_clnc AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) AS entropy_nats
        |FROM d ORDER BY doc_id""".stripMargin,

    "q99_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS m
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - m.m) AS ad, m.m
        |  FROM events e JOIN med m USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(ad, 0.5) AS md
        |  FROM dev GROUP BY event_type)
        |SELECT d.event_type, COUNT(*) AS n,
        |  ROUND(ANY_VALUE(d.m), 6) AS median,
        |  ROUND(ANY_VALUE(ma.md), 6) AS mad,
        |  COUNT(*) FILTER (WHERE d.ad > 3.0 * ma.md) AS n_outliers
        |FROM dev d JOIN mad ma USING (event_type)
        |GROUP BY d.event_type
        |ORDER BY d.event_type""".stripMargin,

    "q100_chi_square" ->
      """WITH t AS (
        |  SELECT event_type AS r,
        |    CASE WHEN value >= 50 THEN 1 ELSE 0 END AS c FROM events),
        |cells AS (SELECT r, c, COUNT(*) AS o FROM t GROUP BY r, c),
        |rm AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rmv FROM cells GROUP BY r),
        |cm AS (SELECT c, CAST(SUM(o) AS BIGINT) AS cmv FROM cells GROUP BY c),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |  COUNT(DISTINCT r) AS nr, COUNT(DISTINCT c) AS nc FROM cells),
        |grid AS (
        |  SELECT rm.r, cm.c, rm.rmv, cm.cmv, COALESCE(cells.o, 0) AS o
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN cells ON rm.r = cells.r AND cm.c = cells.c),
        |contrib AS (
        |  SELECT CAST((o - e) * (o - e) / e AS DECIMAL(28,10)) AS ct,
        |    n, nr, nc
        |  FROM (SELECT grid.o,
        |          (rmv * cmv) / CAST(n AS DOUBLE) AS e, n, nr, nc
        |        FROM grid CROSS JOIN tot))
        |SELECT ANY_VALUE(n) AS n,
        |  CAST((ANY_VALUE(nr) - 1) * (ANY_VALUE(nc) - 1) AS BIGINT) AS dof,
        |  ROUND(CAST(SUM(ct) AS DOUBLE), 6) AS chi2
        |FROM contrib""".stripMargin,

    "q101_weighted_median" ->
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
        |ORDER BY c.l_returnflag""".stripMargin,

    // portable text shared with the q147 SQL-surface twin
    "q102_funnel" -> SqlText.funnel,

    "q103_cohort_retention" -> retentionSql,

    "q108_stream_outer_join" ->
      """WITH h AS (
        |  -- matured horizon: floor_ms(max ts) − watermark delay − range
        |  -- (outer-join state is held open for the full join window)
        |  SELECT (MAX(epoch_us(ts)) // 1000) * 1000
        |    - CAST(259200 AS BIGINT)*1000000 AS hz
        |  FROM events),
        |p AS (SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        |      WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS c_id, user_id, ts AS c_ts
        |      FROM events WHERE event_type = 'click')
        |SELECT p.p_id, p.user_id, epoch_us(p.p_ts) AS p_ts_us,
        |  c.c_id IS NOT NULL AS attributed,
        |  COALESCE(c.c_id, -1) AS c_id,
        |  COALESCE(epoch_us(c.c_ts), -1) AS c_ts_us
        |FROM p LEFT JOIN c ON p.user_id = c.user_id
        |  AND c.c_ts <= p.p_ts
        |  AND c.c_ts >= p.p_ts - INTERVAL 1 DAY
        |CROSS JOIN h
        |WHERE epoch_us(p.p_ts) < h.hz
        |ORDER BY p_id, c_id""".stripMargin,

    "q109_token_budget_mix" ->
      """WITH d AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, n_tokens,
        |    SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs_kept,
        |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept
        |FROM c WHERE cum <= 2000
        |GROUP BY source ORDER BY source""".stripMargin,

    "q110_gap_detect" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(ts) - LAG(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS gap
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_obs,
        |  COUNT(*) FILTER (WHERE gap > 21600000000) AS n_gaps,
        |  MAX(gap) AS max_gap_us
        |FROM g GROUP BY user_id
        |HAVING COUNT(*) FILTER (WHERE gap > 21600000000) > 0
        |ORDER BY user_id""".stripMargin,

    "q111_ar1_forecast" ->
      """WITH p AS (
        |  SELECT event_type,
        |    LAG(value) OVER (PARTITION BY event_type
        |      ORDER BY ts, event_id) AS x,
        |    CAST(value AS DOUBLE) AS y
        |  FROM events),
        |pp AS (SELECT event_type, x, y FROM p WHERE x IS NOT NULL),
        |s AS (
        |  SELECT event_type, COUNT(*) AS n_pairs,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(28,2))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,4))) AS DOUBLE) AS sxx
        |  FROM pp GROUP BY event_type),
        |prm AS (
        |  SELECT event_type, n_pairs,
        |    (n_pairs * sxy - sx * sy) / (n_pairs * sxx - sx * sx) AS slope,
        |    (sy - (n_pairs * sxy - sx * sy) / (n_pairs * sxx - sx * sx) * sx)
        |      / n_pairs AS intercept
        |  FROM s),
        |e AS (
        |  SELECT pp.event_type,
        |    ROUND(SQRT(CAST(SUM(CAST(
        |      (pp.y - (prm.intercept + prm.slope * pp.x)) *
        |      (pp.y - (prm.intercept + prm.slope * pp.x))
        |      AS DECIMAL(28,4))) AS DOUBLE) / COUNT(*)), 6) AS rmse
        |  FROM pp JOIN prm USING (event_type)
        |  GROUP BY pp.event_type)
        |SELECT prm.event_type, CAST(prm.n_pairs AS BIGINT) AS n_pairs,
        |  ROUND(prm.slope, 6) AS slope,
        |  ROUND(prm.intercept, 6) AS intercept, e.rmse
        |FROM prm JOIN e USING (event_type)
        |ORDER BY event_type""".stripMargin,

    "q112_skew_report" -> skewReportSql,

    "q104_column_profile" -> profileSql,

    "q113_psi_drift" -> psiSql,

    // portable-centroid IVF: the two-round congruential draw picks the 8
    // centroids, every ordering-deciding cosine is rounded to 6 before its
    // ROW_NUMBER (assignment argmax, probe top-3, final top-k) — the whole
    // index build + batched search replayed relationally
    // 12 power-method steps over the exact-decimal covariance, replayed in
    // a recursive CTE: products to DECIMAL(38,18) before order-free sums,
    // the normalized vector re-rounded to 9 decimals per step (the q189
    // portability recipe applied to an eigen-iteration)
    "q191_power_iteration_pca" ->
      """WITH RECURSIVE vals AS (
        |  SELECT vec_id, u.i AS i, CAST(embedding[u.i + 1] AS DOUBLE) AS v
        |  FROM embeddings, range(0, 64) u(i)),
        |nrows AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings),
        |mu AS (
        |  SELECT i, CAST(SUM(CAST(v AS DECIMAL(28,8))) AS DOUBLE) / n AS mu
        |  FROM vals CROSS JOIN nrows GROUP BY i, n),
        |sp AS (
        |  SELECT a.i AS i, b.i AS j,
        |    CAST(SUM(CAST(a.v * b.v AS DECIMAL(28,12))) AS DOUBLE) AS sp
        |  FROM vals a JOIN vals b USING (vec_id) GROUP BY 1, 2),
        |cov AS (
        |  SELECT sp.i AS i, sp.j AS j,
        |    ROUND(sp.sp / n - mi.mu * mj.mu, 12) AS c
        |  FROM sp CROSS JOIN nrows
        |  JOIN mu mi ON mi.i = sp.i
        |  JOIN mu mj ON mj.i = sp.j),
        |tr AS (
        |  SELECT CAST(SUM(CAST(c AS DECIMAL(38,18))) AS DOUBLE) AS trace
        |  FROM cov WHERE i = j),
        |pv(t, i, v, lam) AS (
        |  SELECT 0, r.i, ROUND(1.0 / SQRT(64.0), 9), CAST(NULL AS DOUBLE)
        |  FROM range(0, 64) r(i)
        |  UNION ALL
        |  SELECT t + 1, i, ROUND(w / nrm, 9), nrm FROM (
        |    SELECT t, i, w,
        |      SQRT(CAST(SUM(CAST(w * w AS DECIMAL(38,18))) OVER ()
        |        AS DOUBLE)) AS nrm
        |    FROM (
        |      SELECT pv.t AS t, cov.i AS i,
        |        CAST(SUM(CAST(cov.c * pv.v AS DECIMAL(38,18))) AS DOUBLE)
        |          AS w
        |      FROM pv JOIN cov ON cov.j = pv.i
        |      WHERE pv.t < 12
        |      GROUP BY 1, 2)))
        |SELECT t AS iter, ROUND(lam, 6) AS lambda1,
        |  ROUND(lam / trace, 6) AS pc1_share
        |FROM (SELECT DISTINCT t, lam FROM pv WHERE t >= 1)
        |CROSS JOIN tr
        |ORDER BY iter""".stripMargin,

    // the q189 Newton replay with the exact n/(2·n_class) balanced weight
    // folded into every per-row term
    "q192_irls_weighted" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    CASE WHEN l_returnflag <> 'N' THEN 1.0 ELSE 0.0 END AS y
        |  FROM lineitem WHERE l_orderkey < 500),
        |cw AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS npos
        |  FROM d),
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
        |      CAST(SUM(CAST(w * (y - p) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS g0,
        |      CAST(SUM(CAST(w * (y - p) * x AS DECIMAL(28,12))) AS DOUBLE)
        |        AS g1,
        |      CAST(SUM(CAST(w * p * (1.0 - p) AS DECIMAL(28,12)))
        |        AS DOUBLE) AS sw,
        |      CAST(SUM(CAST(w * p * (1.0 - p) * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swx,
        |      CAST(SUM(CAST(w * p * (1.0 - p) * x * x AS DECIMAL(28,12)))
        |        AS DOUBLE) AS swxx,
        |      ROUND(CAST(SUM(CAST(w * (y * LN(p) + (1.0 - y) * LN(1.0 - p))
        |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
        |    FROM (
        |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, d.x AS x, d.y AS y,
        |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x))) AS p,
        |        CASE WHEN d.y = 1.0 THEN cw.n / (2.0 * cw.npos)
        |          ELSE cw.n / (2.0 * (cw.n - cw.npos)) END AS w
        |      FROM it, d, cw
        |      WHERE it.i < 6)
        |    GROUP BY i, b0, b1))
        |SELECT i AS iter, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
        |  ll AS log_loss
        |FROM it WHERE i >= 1
        |ORDER BY iter""".stripMargin,

    // 6 IRLS Newton steps replayed in a recursive CTE: per-row terms cast
    // to DECIMAL(28,12) before summing and params re-rounded to 9 decimals
    // per step, so JVM-vs-libm exp/ln ulp drift cannot accumulate
    "q189_irls_logistic" ->
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
        |    GROUP BY i, b0, b1))
        |SELECT i AS iter, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
        |  ll AS log_loss
        |FROM it WHERE i >= 1
        |ORDER BY iter""".stripMargin,

    // q182's portable draw + rounded-cosine assignment, q67's recursive
    // reach, canonical keep — the whole SemDeDup pipeline replayed
    "q188_semdedup_portable" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb
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
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM assign a JOIN assign b
        |    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.4),
        |sym AS (
        |  SELECT src, dst FROM pairs
        |  UNION SELECT dst, src FROM pairs),
        |reach(v, c) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT sym.dst, reach.c FROM reach JOIN sym ON sym.src = reach.v),
        |comp AS (SELECT v, MIN(c) AS component FROM reach GROUP BY v)
        |SELECT e.label, COUNT(*) AS n_kept
        |FROM e JOIN comp ON comp.v = e.vec_id
        |WHERE comp.v = comp.component
        |GROUP BY e.label
        |ORDER BY e.label""".stripMargin,

    "q182_ivf_portable" -> ivfPortableSql,
    // the persisted-index search consumes the identical pipeline's
    // written artifact — layout must be invisible in the answer, so the
    // oracle is shared verbatim
    "q226_ivf_persisted" -> ivfPortableSql,

    // q182's congruential anchor draw sliced per subspace; round-6
    // squared-L2 argmin assignment; decimal-sum distortion profile
    "q193_pq_portable" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |drawn AS (
        |  SELECT vec_id, emb,
        |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
        |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
        |  FROM e),
        |cb AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
        |      AS code,
        |    emb AS anchor
        |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 4)),
        |sv AS (
        |  SELECT vec_id, CAST(s AS INT) AS subspace,
        |    emb[CAST(s * 8 + 1 AS INT):CAST(s * 8 + 8 AS INT)] AS sv
        |  FROM e, range(0, 8) t(s)),
        |scored AS (
        |  SELECT sv.vec_id, sv.subspace, cb.code,
        |    ROUND(
        |      list_inner_product(sv.sv, sv.sv)
        |      - 2.0 * list_inner_product(sv.sv,
        |          cb.anchor[CAST(sv.subspace * 8 + 1 AS INT):
        |                    CAST(sv.subspace * 8 + 8 AS INT)])
        |      + list_inner_product(
        |          cb.anchor[CAST(sv.subspace * 8 + 1 AS INT):
        |                    CAST(sv.subspace * 8 + 8 AS INT)],
        |          cb.anchor[CAST(sv.subspace * 8 + 1 AS INT):
        |                    CAST(sv.subspace * 8 + 8 AS INT)]), 6) AS d2
        |  FROM sv, cb),
        |asg AS (
        |  SELECT subspace, code, d2 FROM (
        |    SELECT subspace, code, d2,
        |      ROW_NUMBER() OVER (PARTITION BY vec_id, subspace
        |        ORDER BY d2 ASC, code ASC) AS rn
        |    FROM scored)
        |  WHERE rn = 1)
        |SELECT subspace, code, COUNT(*) AS n_assigned,
        |  ROUND(CAST(SUM(CAST(d2 AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*),
        |    6) AS avg_sqdist
        |FROM asg GROUP BY subspace, code
        |ORDER BY subspace, code""".stripMargin,

    // cross-doc boilerplate trigrams: per-(ngram, doc) counts → totals +
    // document frequency, deterministic full tie-break before the cut
    "q185_boilerplate_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    array_to_string(toks[CAST(i + 1 AS INT):CAST(i + 3 AS INT)], ' ')
        |      AS ngram
        |  FROM (SELECT doc_id, toks,
        |          unnest(range(greatest(len(toks) - 2, 0))) AS i
        |        FROM t)),
        |d AS (
        |  SELECT ngram, doc_id, COUNT(*) AS c FROM g GROUP BY 1, 2),
        |a AS (
        |  SELECT ngram, CAST(SUM(c) AS BIGINT) AS n_occurrences,
        |    CAST(COUNT(*) AS BIGINT) AS n_docs
        |  FROM d GROUP BY 1)
        |SELECT ngram, n_occurrences, n_docs FROM a
        |WHERE n_docs >= 2
        |ORDER BY n_occurrences DESC, n_docs DESC, ngram
        |LIMIT 25""".stripMargin,

    // embedding-diversity card: per-dimension exact decimal sums, the
    // (s/n)² terms rounded to 8 then summed exactly (q176's ANOVA trick),
    // E||x-y||² = 2(E||x||² - ||mean||²) with one IEEE op sequence both
    // engines share
    "q186_embedding_diversity" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(unnest(range(len(emb))) AS BIGINT) AS dim,
        |    CAST(unnest(emb) AS DOUBLE) AS v
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |        FROM embeddings)),
        |pd AS (
        |  SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(v AS DECIMAL(28,6))) AS s,
        |    SUM(CAST(v * v AS DECIMAL(38,8))) AS q
        |  FROM x GROUP BY 1),
        |pt AS (
        |  SELECT dim, n, q,
        |    CAST(ROUND((CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
        |      8) AS DECIMAL(28,8)) AS term
        |  FROM pd),
        |agg AS (
        |  SELECT MAX(n) AS n_vecs, CAST(COUNT(*) AS BIGINT) AS n_dims,
        |    CAST(SUM(q) AS DOUBLE) / MAX(n) AS msq,
        |    CAST(SUM(term) AS DOUBLE) AS nms
        |  FROM pt)
        |SELECT n_vecs, n_dims,
        |  ROUND(msq, 6) AS mean_sq_norm,
        |  ROUND(nms, 6) AS sq_norm_of_mean,
        |  ROUND(2.0 * (msq - nms), 6) AS mean_pair_sq_dist
        |FROM agg""".stripMargin,

    // canonical-by-quality: the q67 reachability CTE + the q13 quality
    // expression, per-component argmax via rank-1 row
    "q181_canonical_by_quality" ->
      """WITH RECURSIVE e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.3),
        |sym AS (
        |  SELECT src, dst FROM pairs
        |  UNION SELECT dst, src FROM pairs),
        |reach(v, c) AS (
        |  SELECT vec_id, vec_id FROM e
        |  UNION
        |  SELECT sym.dst, reach.c FROM reach JOIN sym ON sym.src = reach.v),
        |comp AS (SELECT v, MIN(c) AS component FROM reach GROUP BY v),
        |t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents WHERE doc_id < 200),
        |q AS (
        |  SELECT doc_id,
        |    ROUND(LEAST(len(toks) / 100.0, 1.0) *
        |      (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) /
        |        CAST(len(toks) AS DOUBLE)), 6) AS quality_score
        |  FROM t),
        |m AS (
        |  SELECT component, doc_id, quality_score,
        |    ROW_NUMBER() OVER (PARTITION BY component
        |      ORDER BY quality_score DESC, doc_id) AS rn
        |  FROM comp JOIN q ON q.doc_id = comp.v)
        |SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
        |  MIN(CASE WHEN rn = 1 THEN doc_id END) AS canonical_id,
        |  MIN(CASE WHEN rn = 1 THEN quality_score END) AS canonical_quality,
        |  ROUND(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE) /
        |    COUNT(*), 6) AS mean_quality
        |FROM m
        |GROUP BY component
        |ORDER BY component""".stripMargin,

    // conformal intervals: quartile time split, per-user train means,
    // kth calibration residual by ROW_NUMBER, integer-exact ceil
    "q180_conformal" ->
      """WITH rng AS (
        |  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events),
        |w AS (
        |  SELECT user_id, value,
        |    CASE WHEN epoch_us(ts) * 2 < mn + mx THEN 'train'
        |         WHEN epoch_us(ts) * 4 < mn + 3 * mx THEN 'cal'
        |         ELSE 'test' END AS q
        |  FROM events, rng),
        |mu AS (
        |  SELECT user_id, ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4)))
        |    AS DOUBLE) / COUNT(*), 6) AS mu
        |  FROM w WHERE q = 'train' GROUP BY 1),
        |sc AS (
        |  SELECT q, CAST(ROUND(ABS(value - mu) * 1000000.0, 0) AS BIGINT)
        |    AS r
        |  FROM w JOIN mu USING (user_id) WHERE q <> 'train'),
        |ntrain AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM w
        |  WHERE q = 'train'),
        |ncal AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM sc
        |  WHERE q = 'cal'),
        |k AS (SELECT (9 * (n_cal + 1) + 9) // 10 AS k FROM ncal),
        |qh AS (
        |  -- k > n_cal (tiny calibration set): the rank lookup is empty and
        |  -- the Spark side falls back to Long.MaxValue — mirror it so the
        |  -- oracle still emits one row on degenerate inputs
        |  SELECT COALESCE(MAX(r), 9223372036854775807) AS qhat_micro FROM (
        |    SELECT r, ROW_NUMBER() OVER (ORDER BY r) AS rn
        |    FROM sc WHERE q = 'cal'), k
        |  WHERE rn = k),
        |tst AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
        |    CAST(SUM(CASE WHEN r <= qhat_micro THEN 1 ELSE 0 END)
        |      AS BIGINT) AS cov
        |  FROM sc, qh WHERE q = 'test')
        |SELECT n_train, n_cal, n_test, qhat_micro,
        |  ROUND(cov / CAST(n_test AS DOUBLE), 6) AS coverage
        |FROM ntrain, ncal, tst, qh""".stripMargin,

    // negative sampling: the two-round portable draw replayed per
    // (anchor, rank); self-draws shift by one mod n
    "q179_negative_samples" ->
      """WITH a AS (
        |  SELECT doc_id, unnest(range(1, 5)) AS neg_rank FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(neg_rank AS INT) AS neg_rank,
        |    doc_id + neg_rank * 7919 AS seed
        |  FROM a),
        |d AS (
        |  SELECT doc_id, neg_rank,
        |    ((((seed % 1000003) * 2654435761) % 1000003 + seed // 1000003)
        |      % 9999991 * 22695477) % 9999991 % 500 AS draw
        |  FROM s)
        |SELECT doc_id, neg_rank,
        |  CASE WHEN draw = doc_id THEN (draw + 1) % 500 ELSE draw END
        |    AS neg_id
        |FROM d
        |ORDER BY doc_id, neg_rank""".stripMargin,

    // CUPED: per-user half means, portable hash variants, pooled theta
    // and rho^2 from exact-decimal cross-moments — closed form, no
    // per-unit adjusted frame
    "q178_cuped_ab" ->
      """WITH rng AS (
        |  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events),
        |w AS (
        |  SELECT user_id, value, epoch_us(ts) * 2 < mn + mx AS pre
        |  FROM events, rng),
        |xh AS (
        |  SELECT user_id, ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4)))
        |    AS DOUBLE) / COUNT(*), 6) AS x
        |  FROM w WHERE pre GROUP BY 1),
        |yh AS (
        |  SELECT user_id, ROUND(CAST(SUM(CAST(value AS DECIMAL(28,4)))
        |    AS DOUBLE) / COUNT(*), 6) AS y
        |  FROM w WHERE NOT pre GROUP BY 1),
        |units AS (
        |  SELECT CASE WHEN ((user_id % 1000003) * 2654435761) % 2 = 0
        |      THEN 'A' ELSE 'B' END AS variant, x, y
        |  FROM xh JOIN yh USING (user_id)),
        |pv AS (
        |  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(x AS DECIMAL(28,12))) AS sx,
        |    SUM(CAST(y AS DECIMAL(28,12))) AS sy,
        |    SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,12))) AS sxx,
        |    SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,12))) AS sxy,
        |    SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,12))) AS syy
        |  FROM units GROUP BY 1),
        |pool AS (
        |  SELECT CAST(SUM(n) AS DOUBLE) AS np,
        |    CAST(SUM(sx) AS DOUBLE) AS sxp, CAST(SUM(sy) AS DOUBLE) AS syp,
        |    CAST(SUM(sxx) AS DOUBLE) AS sxxp,
        |    CAST(SUM(sxy) AS DOUBLE) AS sxyp,
        |    CAST(SUM(syy) AS DOUBLE) AS syyp
        |  FROM pv)
        |SELECT variant, n,
        |  ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_y,
        |  CASE WHEN np * sxxp - sxp * sxp > 0 THEN
        |    ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) -
        |      ((np * sxyp - sxp * syp) / (np * sxxp - sxp * sxp)) *
        |      (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - sxp / np), 6) END
        |    AS mean_y_adj,
        |  CASE WHEN np * sxxp - sxp * sxp > 0 THEN
        |    ROUND((np * sxyp - sxp * syp) / (np * sxxp - sxp * sxp), 6) END
        |    AS theta,
        |  CASE WHEN np * sxxp - sxp * sxp > 0
        |      AND np * syyp - syp * syp > 0 THEN
        |    ROUND((np * sxyp - sxp * syp) * (np * sxyp - sxp * syp) /
        |      ((np * sxxp - sxp * sxp) * (np * syyp - syp * syp)), 6) END
        |    AS var_reduction
        |FROM pv CROSS JOIN pool
        |ORDER BY variant""".stripMargin,

    // Jensen–Shannon drift: same time-split cells and smoothing as PSI,
    // symmetric bounded divergence; ln2 as an explicit shared double
    // literal (libm ln(2) parity across engines is not a given)
    "q177_js_divergence" ->
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
        |  FROM cells GROUP BY event_type),
        |js AS (
        |  SELECT cells.event_type,
        |    CAST(MAX(nref) AS BIGINT) AS n_ref,
        |    CAST(MAX(ncur) AS BIGINT) AS n_cur,
        |    ROUND(GREATEST(CAST(SUM(CAST(
        |      0.5 * (
        |        ((r + 0.5) / (nref + 5.0)) *
        |          LN(((r + 0.5) / (nref + 5.0)) /
        |            ((((r + 0.5) / (nref + 5.0)) +
        |              ((c + 0.5) / (ncur + 5.0))) / 2.0)) +
        |        ((c + 0.5) / (ncur + 5.0)) *
        |          LN(((c + 0.5) / (ncur + 5.0)) /
        |            ((((r + 0.5) / (nref + 5.0)) +
        |              ((c + 0.5) / (ncur + 5.0))) / 2.0)))
        |      AS DECIMAL(28,12))) AS DOUBLE), CAST(0.0 AS DOUBLE)), 6)
        |      AS js_nats
        |  FROM cells JOIN tot ON cells.event_type = tot.event_type
        |  GROUP BY cells.event_type)
        |SELECT event_type, n_ref, n_cur, js_nats,
        |  ROUND(SQRT(js_nats / 0.6931471805599453), 6) AS js_distance
        |FROM js
        |ORDER BY event_type""".stripMargin,

    // the streaming monitor CONVERGES to the batch PSI on a bounded
    // replay — its oracle is the batch query itself (q70/q73 pattern)
    "q131_stream_psi" -> psiSql,

    "q132_zorder_skipping" ->
      """WITH raw AS (
        |  SELECT CAST(l_partkey AS BIGINT) AS x,
        |         CAST(l_suppkey AS BIGINT) AS y
        |  FROM lineitem),
        |dm AS (SELECT MAX(x) AS dmx, MAX(y) AS dmy FROM raw),
        |s0 AS (
        |  SELECT x, y,
        |    (((x * 256) // (dmx + 1)) & 255) AS x0,
        |    (((y * 256) // (dmy + 1)) & 255) AS y0
        |  FROM raw, dm),
        |s1 AS (SELECT x, y,
        |  ((x0 | (x0 << 4)) & 3855) AS x1,
        |  ((y0 | (y0 << 4)) & 3855) AS y1 FROM s0),
        |s2 AS (SELECT x, y,
        |  ((x1 | (x1 << 2)) & 13107) AS x2,
        |  ((y1 | (y1 << 2)) & 13107) AS y2 FROM s1),
        |b AS (SELECT x, y,
        |  (((x2 | (x2 << 1)) & 21845) |
        |   (((y2 | (y2 << 1)) & 21845) << 1)) AS z FROM s2),
        |mx AS (SELECT MAX(x) AS mxx, MAX(z) AS mxz FROM b),
        |fx AS (
        |  SELECT x // (mxx // 64 + 1) AS f, COUNT(*) AS n,
        |    MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
        |  FROM b, mx GROUP BY f),
        |fz AS (
        |  SELECT z // (mxz // 64 + 1) AS f, COUNT(*) AS n,
        |    MIN(x) AS minx, MAX(x) AS maxx, MIN(y) AS miny, MAX(y) AS maxy
        |  FROM b, mx GROUP BY f)
        |SELECT 'x_sorted' AS layout, COUNT(*) AS n_files,
        |  CAST(SUM(CASE WHEN minx <= 1500 AND maxx >= 100 AND miny <= 5
        |    AND maxy >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_files_hit,
        |  CAST(SUM(CASE WHEN minx <= 1500 AND maxx >= 100 AND miny <= 5
        |    AND maxy >= 2 THEN n ELSE 0 END) AS BIGINT) AS rows_read
        |FROM fx
        |UNION ALL
        |SELECT 'z_order', COUNT(*),
        |  CAST(SUM(CASE WHEN minx <= 1500 AND maxx >= 100 AND miny <= 5
        |    AND maxy >= 2 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(SUM(CASE WHEN minx <= 1500 AND maxx >= 100 AND miny <= 5
        |    AND maxy >= 2 THEN n ELSE 0 END) AS BIGINT)
        |FROM fz
        |ORDER BY layout""".stripMargin,

    "q133_bigram_perplexity" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS tk FROM documents),
        |bg AS (
        |  SELECT doc_id, tk[i] || ' ' || tk[i + 1] AS bg
        |  FROM toks, unnest(range(1, GREATEST(len(tk), 1))) AS t(i)),
        |c2 AS (SELECT bg, COUNT(*) AS c2 FROM bg GROUP BY bg),
        |c1 AS (
        |  SELECT string_split(bg, ' ')[1] AS w1, SUM(c2) AS c1
        |  FROM c2 GROUP BY 1),
        |pr AS (
        |  SELECT bg, LN(CAST(c2 AS DOUBLE) / c1) AS logp
        |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.w1),
        |d AS (
        |  SELECT doc_id, COUNT(*) AS n_bigrams,
        |    CAST(SUM(CAST(logp AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
        |      AS avg_raw
        |  FROM bg JOIN pr ON bg.bg = pr.bg
        |  GROUP BY doc_id)
        |SELECT doc_id, n_bigrams,
        |  ROUND(avg_raw, 6) AS avg_logp,
        |  ROUND(EXP(-avg_raw), 6) AS ppl
        |FROM d ORDER BY doc_id""".stripMargin,

    "q134_snapshot_diff" ->
      """WITH rng AS (
        |  SELECT MIN(epoch_us(ts)) AS mn, MAX(epoch_us(ts)) AS mx
        |  FROM events),
        |e AS (
        |  SELECT user_id, value, epoch_us(ts) * 2 < mn + mx AS is_a
        |  FROM events, rng),
        |a AS (
        |  SELECT user_id, COUNT(*) AS na,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS sa
        |  FROM e WHERE is_a GROUP BY user_id),
        |b AS (
        |  SELECT user_id, COUNT(*) AS nb,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS sb
        |  FROM e WHERE NOT is_a GROUP BY user_id),
        |j AS (
        |  SELECT COALESCE(a.user_id, b.user_id) AS u,
        |    CASE WHEN b.user_id IS NULL THEN 'removed'
        |         WHEN a.user_id IS NULL THEN 'added'
        |         WHEN na IS DISTINCT FROM nb OR sa IS DISTINCT FROM sb
        |           THEN 'changed'
        |         ELSE 'unchanged' END AS status
        |  FROM a FULL OUTER JOIN b ON a.user_id = b.user_id)
        |SELECT status, COUNT(*) AS n_keys FROM j
        |GROUP BY status ORDER BY status""".stripMargin,

    // exponential-race priority sampling: the draw is the engine-portable
    // TWO-ROUND multiplicative hash over distinct primes (round 2 folds
    // id div p1 back in so ids differing by p1 never alias), so DuckDB
    // replays the exact clock -ln(u)/w; non-positive weights rank last
    // (infinite clock)
    "q135_priority_sample" ->
      """WITH x AS (
        |  SELECT doc_id, source, n_chars,
        |    ((doc_id % 1000003) * 2654435761) % 1000003 AS x1
        |  FROM documents),
        |x2 AS (
        |  SELECT doc_id, source, n_chars,
        |    (((x1 + doc_id // 1000003) % 9999991) * 22695477) % 9999991 AS x2
        |  FROM x),
        |c AS (
        |  SELECT doc_id, source, n_chars,
        |    CASE WHEN n_chars > 0 THEN
        |      -LN((x2 + 1) / 9999991.0) / n_chars
        |    ELSE 'infinity'::DOUBLE END AS clock
        |  FROM x2),
        |s AS (
        |  SELECT doc_id, source, n_chars FROM c
        |  ORDER BY clock, doc_id LIMIT 50)
        |SELECT doc_id, source, n_chars FROM s ORDER BY doc_id""".stripMargin,

    "q139_triangle_census" ->
      """WITH e AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings WHERE vec_id < 200),
        |pairs AS (
        |  SELECT a.vec_id AS src, b.vec_id AS dst
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id
        |  WHERE ROUND(list_inner_product(a.emb, b.emb) /
        |      (SQRT(list_inner_product(a.emb, a.emb)) *
        |       SQRT(list_inner_product(b.emb, b.emb))), 6) >= 0.2),
        |tri AS (
        |  SELECT p1.src AS a, p1.dst AS b, p2.dst AS c
        |  FROM pairs p1 JOIN pairs p2 ON p1.dst = p2.src
        |  WHERE EXISTS (SELECT 1 FROM pairs p3
        |                WHERE p3.src = p1.src AND p3.dst = p2.dst)),
        |tv AS (
        |  SELECT v, COUNT(*) AS t FROM (
        |    SELECT a AS v FROM tri UNION ALL
        |    SELECT b FROM tri UNION ALL
        |    SELECT c FROM tri) GROUP BY v),
        |deg AS (
        |  SELECT v, COUNT(*) AS d FROM (
        |    SELECT src AS v FROM pairs UNION ALL
        |    SELECT dst FROM pairs) GROUP BY v),
        |cc AS (
        |  SELECT deg.v, deg.d,
        |    CASE WHEN d >= 2 THEN
        |      COALESCE(t, 0) * 2.0 / CAST(d * (d - 1) AS DOUBLE) END AS cc
        |  FROM deg LEFT JOIN tv ON deg.v = tv.v),
        |tn AS (SELECT COUNT(*) AS n_triangles FROM tri)
        |SELECT COUNT(*) AS n_nodes,
        |  CAST(SUM(d) // 2 AS BIGINT) AS n_edges,
        |  (SELECT n_triangles FROM tn) AS n_triangles,
        |  ROUND(CAST(SUM(CAST(cc AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(cc), 6) AS avg_clustering
        |FROM cc""".stripMargin,

    "q140_zipf_fit" ->
      """WITH f AS (
        |  SELECT term, COUNT(*) AS f FROM (
        |    SELECT unnest(string_split(trim(text), ' ')) AS term
        |    FROM documents) GROUP BY term),
        |h AS (SELECT term, f FROM f ORDER BY f DESC, term LIMIT 100000),
        |r AS (
        |  SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, term)
        |      AS DOUBLE)) AS x,
        |    LN(CAST(f AS DOUBLE)) AS y
        |  FROM h),
        |s AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
        |  FROM r)
        |SELECT n AS n_terms,
        |  ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
        |  ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
        |    / n, 6) AS intercept
        |FROM s""".stripMargin,

    "q141_quantile_norm" ->
      """WITH g AS (
        |  SELECT source, quantile_cont(n_chars,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM documents GROUP BY source),
        |gg AS (
        |  SELECT quantile_cont(n_chars,
        |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS q
        |  FROM documents),
        |ge AS (
        |  SELECT source, unnest(list_transform(q,
        |    (x, i) -> struct_pack(i := i, v := x))) AS s FROM g),
        |gge AS (
        |  SELECT unnest(list_transform(q,
        |    (x, i) -> struct_pack(i := i, v := x))) AS s FROM gg)
        |SELECT ge.source, CAST(ge.s.i AS INTEGER) AS decile,
        |  ROUND(ge.s.v, 6) AS group_q,
        |  ROUND(gge.s.v, 6) AS global_q,
        |  ROUND(gge.s.v - ge.s.v, 6) AS shift
        |FROM ge JOIN gge ON ge.s.i = gge.s.i
        |ORDER BY source, decile""".stripMargin,

    "q144_frequent_motifs" ->
      """WITH s AS (
        |  SELECT user_id, event_type AS i0,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS i1,
        |    LEAD(event_type, 2) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS i2
        |  FROM events),
        |m AS (
        |  SELECT user_id, i0 || '>' || i1 || '>' || i2 AS motif
        |  FROM s WHERE i1 IS NOT NULL AND i2 IS NOT NULL)
        |SELECT motif, COUNT(*) AS n_occurrences,
        |  COUNT(DISTINCT user_id) AS n_keys
        |FROM m GROUP BY motif
        |HAVING COUNT(DISTINCT user_id) >= 50
        |ORDER BY motif""".stripMargin,

    "q142_incremental_agg" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(28,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    "q137_changepoint" ->
      """WITH b AS (
        |  SELECT event_type, epoch_us(ts) // 3600000000 AS h,
        |    COUNT(*) AS n,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS s,
        |    SUM(CAST(value * value AS DECIMAL(28,4))) AS s2
        |  FROM events GROUP BY event_type, h),
        |t AS (
        |  SELECT event_type, SUM(n) AS tn, SUM(s) AS tsum,
        |    SUM(s2) AS tsum2
        |  FROM b GROUP BY event_type),
        |c AS (
        |  SELECT event_type, h,
        |    SUM(n) OVER w AS cn,
        |    CAST(SUM(s) OVER w AS DOUBLE) AS cs,
        |    CAST(SUM(s2) OVER w AS DOUBLE) AS cs2
        |  FROM b
        |  WINDOW w AS (PARTITION BY event_type ORDER BY h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |sp AS (
        |  SELECT c.event_type, h, cn, tn, tsum, tsum2,
        |    (cs2 - cs * cs / CAST(cn AS DOUBLE)) +
        |    (CAST(tsum2 AS DOUBLE) - cs2 -
        |     (CAST(tsum AS DOUBLE) - cs) * (CAST(tsum AS DOUBLE) - cs) /
        |       CAST(tn - cn AS DOUBLE)) AS sse
        |  FROM c JOIN t ON c.event_type = t.event_type
        |  WHERE cn < tn),
        |best AS (
        |  SELECT *, ROW_NUMBER() OVER (
        |    PARTITION BY event_type ORDER BY sse, h) AS rn
        |  FROM sp)
        |SELECT event_type, h AS split_after_hour,
        |  CAST(cn AS BIGINT) AS n_before,
        |  CAST(tn - cn AS BIGINT) AS n_after,
        |  ROUND(sse, 4) AS sse_split,
        |  ROUND(CAST(tsum2 AS DOUBLE) -
        |    CAST(tsum AS DOUBLE) * CAST(tsum AS DOUBLE) /
        |      CAST(tn AS DOUBLE), 4) AS sse_nosplit
        |FROM best WHERE rn = 1
        |ORDER BY event_type""".stripMargin,

    "q114_markov_transitions" ->
      """WITH seq AS (
        |  SELECT event_type,
        |    LAG(event_type) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |pairs AS (
        |  SELECT prev AS prev_state, event_type AS next_state,
        |    COUNT(*) AS n
        |  FROM seq WHERE prev IS NOT NULL
        |  GROUP BY prev, event_type),
        |m AS (SELECT prev_state, SUM(n) AS tot FROM pairs GROUP BY prev_state)
        |SELECT pairs.prev_state, next_state, n,
        |  ROUND(CAST(n AS DOUBLE) / tot, 6) AS p
        |FROM pairs JOIN m ON pairs.prev_state = m.prev_state
        |ORDER BY pairs.prev_state, next_state""".stripMargin,

    "q115_ks_two_sample" ->
      """WITH v AS (
        |  SELECT value AS v, event_type = 'click' AS is_a
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |g AS (
        |  SELECT v,
        |    SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
        |    SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
        |  FROM v GROUP BY v),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |             CAST(SUM(cb) AS BIGINT) AS n_b FROM g),
        |c AS (
        |  SELECT SUM(ca) OVER (ORDER BY v) AS cum_a,
        |         SUM(cb) OVER (ORDER BY v) AS cum_b
        |  FROM g)
        |SELECT n_a, n_b,
        |  ROUND(MAX(ABS(CAST(cum_a AS DOUBLE) / n_a -
        |                CAST(cum_b AS DOUBLE) / n_b)), 6) AS ks_stat
        |FROM c, t GROUP BY n_a, n_b""".stripMargin,

    "q116_cohen_kappa" ->
      """WITH s AS (
        |  SELECT lang,
        |    len(list_filter(string_split(trim(text), ' '), x -> x = 'the')) /
        |      CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS the_r,
        |    len(list_filter(string_split(trim(text), ' '), x -> x = 'a')) /
        |      CAST(len(string_split(trim(text), ' ')) AS DOUBLE) AS a_r
        |  FROM documents),
        |r AS (
        |  SELECT lang AS r1,
        |    CASE WHEN the_r >= 0.04 THEN 'en'
        |         WHEN a_r >= 0.04 THEN 'fr' ELSE 'und' END AS r2
        |  FROM s),
        |cells AS (SELECT r1, r2, COUNT(*) AS o FROM r GROUP BY r1, r2),
        |m1 AS (SELECT r1, SUM(o) AS n1 FROM cells GROUP BY r1),
        |m2 AS (SELECT r2, SUM(o) AS n2 FROM cells GROUP BY r2),
        |pe AS (SELECT CAST(SUM(n1 * n2) AS BIGINT) AS pe_num
        |       FROM m1 JOIN m2 ON m1.r1 = m2.r2),
        |a AS (
        |  SELECT CAST(SUM(o) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN r1 = r2 THEN o ELSE 0 END) AS BIGINT) AS agree
        |  FROM cells)
        |SELECT n, agree AS n_agree,
        |  ROUND(CAST(agree AS DOUBLE) / n, 6) AS p_o,
        |  ROUND(CAST(pe_num AS DOUBLE) / (n * n), 6) AS p_e,
        |  ROUND((CAST(agree AS DOUBLE) / n -
        |         CAST(pe_num AS DOUBLE) / (n * n)) /
        |        (1.0 - CAST(pe_num AS DOUBLE) / (n * n)), 6) AS kappa
        |FROM a, pe""".stripMargin,

    "q117_bloom_semijoin" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem
        |WHERE l_orderkey IN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 300000.0)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q118_pagerank" -> pageRankSql(iterations = 10),

    "q121_ab_ztest" ->
      """WITH u AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
        |      AS converted
        |  FROM events GROUP BY user_id),
        |v AS (
        |  SELECT CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS variant,
        |    converted
        |  FROM u),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN variant = 'a' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_a,
        |    CAST(SUM(CASE WHEN variant = 'a' AND converted THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_a,
        |    CAST(SUM(CASE WHEN variant = 'b' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN variant = 'b' AND converted THEN 1 ELSE 0 END)
        |      AS BIGINT) AS x_b
        |  FROM v)
        |SELECT n_a, x_a, n_b, x_b,
        |  ROUND(CAST(x_a AS DOUBLE) / n_a, 6) AS p_a,
        |  ROUND(CAST(x_b AS DOUBLE) / n_b, 6) AS p_b,
        |  ROUND((CAST(x_b AS DOUBLE) / n_b - CAST(x_a AS DOUBLE) / n_a) /
        |    SQRT((CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 - CAST(x_a + x_b AS DOUBLE) / (n_a + n_b)) *
        |         (1.0 / n_a + 1.0 / n_b)), 6) AS z
        |FROM a""".stripMargin,

    "q122_kaplan_meier" ->
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
        |km AS (
        |  SELECT t, n_event, n_censored,
        |    SUM(n_event + n_censored) OVER (ORDER BY t
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
        |  FROM byt)
        |SELECT t, CAST(n_risk AS BIGINT) AS n_risk,
        |  CAST(n_event AS BIGINT) AS n_event,
        |  CAST(n_censored AS BIGINT) AS n_censored,
        |  CASE WHEN n_event = n_risk THEN 0.0
        |    ELSE ROUND(EXP(SUM(CASE WHEN n_event < n_risk
        |      THEN LN(1.0 - CAST(n_event AS DOUBLE) / n_risk)
        |      ELSE 0.0 END)
        |    OVER (ORDER BY t
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END
        |    AS survival
        |FROM km ORDER BY t""".stripMargin,

    "q127_cooccurrence" ->
      """WITH it AS (SELECT DISTINCT user_id AS b, event_type AS i
        |  FROM events),
        |n AS (SELECT COUNT(DISTINCT b) AS nb FROM it),
        |s AS (SELECT i, COUNT(*) AS su FROM it GROUP BY i),
        |p AS (
        |  SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS n_both
        |  FROM it a JOIN it b ON a.b = b.b AND a.i < b.i
        |  GROUP BY a.i, b.i)
        |SELECT item_a, item_b, n_both,
        |  CAST(sa.su AS BIGINT) AS n_a, CAST(sb.su AS BIGINT) AS n_b,
        |  ROUND(CAST(n_both * nb AS DOUBLE) / (sa.su * sb.su), 6) AS lift
        |FROM p JOIN s sa ON p.item_a = sa.i JOIN s sb ON p.item_b = sb.i, n
        |ORDER BY item_a, item_b""".stripMargin,

    "q128_record_linkage" ->
      """WITH scored AS (
        |  SELECT c_custkey, s_suppkey, ROUND(
        |    (CASE WHEN right(c_name, 1) = right(s_name, 1)
        |          THEN 3.169925 ELSE -3.169925 END) +
        |    (CASE WHEN ABS(c_acctbal - s_acctbal) <= 500.0
        |          THEN 3.169925 ELSE -3.169925 END), 6) AS score
        |  FROM customer JOIN supplier ON c_nationkey = s_nationkey)
        |SELECT c_custkey, s_suppkey, score
        |FROM scored WHERE score >= 0.0
        |ORDER BY c_custkey, s_suppkey""".stripMargin,

    "q129_median_no_sort" ->
      """WITH v AS (
        |  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c
        |  FROM events WHERE event_type = 'click'),
        |r AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS rn FROM v),
        |n AS (SELECT COUNT(*) AS n FROM v)
        |SELECT MAX(n.n) AS n,
        |  MAX(CASE WHEN rn = (n.n + 1) // 2 THEN c END) AS k_lo,
        |  MAX(CASE WHEN rn = n.n // 2 + 1 THEN c END) AS k_hi,
        |  (MAX(CASE WHEN rn = (n.n + 1) // 2 THEN c END) +
        |   MAX(CASE WHEN rn = n.n // 2 + 1 THEN c END)) / 2.0 AS median
        |FROM r, n""".stripMargin,

    "q130_top_paths" ->
      """WITH rr AS (
        |  SELECT user_id, event_type,
        |    ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn
        |  FROM events),
        |p AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM rr WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, COUNT(*) AS n_keys FROM p GROUP BY path
        |ORDER BY n_keys DESC, path LIMIT 20""".stripMargin,

    "q125_bucketed_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
        |    AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // count-min sketch pair: portable MD5 bucket draws make the counter
    // matrix exact replayable integer arithmetic (the q135 precedent
    // applied to sketches); error-bound specs are retained alongside
    "q123_cms_heavy_hitters" -> q123CmsSql,
    // the streamed CMS counters equal the batch sketch exactly (additive
    // counters commute with micro-batching) — same oracle
    "q221_stream_cms" -> q123CmsSql,
    "q136_join_cardinality" -> q136CmsSql,
    "q159_content_fingerprint" -> q159FingerprintSql,
    "q160_curation_pipeline" -> q160CurationSql,
    // the streaming-ingest twin converges to the batch manifest exactly —
    // same oracle (the q73/q70 CDC-convergence convention)
    "q184_stream_curation" -> q160CurationSql,
    "q161_bm25_retrieval" -> q161Bm25Sql,
    "q162_portable_hll" -> q162HllSql,
    // the streamed registers equal the batch sketch exactly (MAX-merge is
    // associative, commutative, and idempotent) — same oracle
    "q222_stream_hll" -> q162HllSql,
    "q190_hll_intersection" -> q190HllIntersectSql,
    "q194_boosted_stumps" -> q194BoostedStumpsSql,

    // q84's reliability bins aggregated to the ECE/MCE/Brier card
    "q197_calibration_card" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS label,
        |    (o_orderkey * 7 % 1000) / CAST(1000.0 AS DOUBLE) AS score
        |  FROM orders),
        |b AS (
        |  SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
        |    COUNT(*) AS n,
        |    CAST(SUM(CAST(score AS DECIMAL(28,3))) AS DOUBLE) / COUNT(*)
        |      AS avg_score,
        |    CAST(SUM(label) AS DOUBLE) / COUNT(*) AS pos_rate,
        |    CAST(SUM(CAST((score - label) * (score - label)
        |      AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*) AS brier
        |  FROM d GROUP BY 1)
        |SELECT CAST(SUM(n) AS BIGINT) AS n,
        |  ROUND(CAST(SUM(CAST(ABS(pos_rate - avg_score) * n
        |    AS DECIMAL(28,12))) AS DOUBLE) / SUM(n), 6) AS ece,
        |  ROUND(MAX(ABS(pos_rate - avg_score)), 6) AS mce,
        |  ROUND(CAST(SUM(CAST(brier * n AS DECIMAL(28,12))) AS DOUBLE)
        |    / SUM(n), 6) AS brier
        |FROM b""".stripMargin,

    "q198_winnowing_neardup" -> q198WinnowingSql,
    "q200_mlp_forward" -> q200MlpForwardSql,

    "q206_bloom_fp_card" -> q206BloomSql,
    // the streamed filter equals the batch filter exactly (bit-set union
    // commutes with micro-batching) — same oracle
    "q213_stream_bloom" -> q206BloomSql,
    "q207_contamination" -> q207ContaminationSql,
    "q210_correlation_matrix" -> q210CorrSql,
    "q212_unigram_perplexity" -> q212PerplexitySql,
    "q214_label_propagation" -> q214LabelPropSql,
    "q216_incremental_dedup" -> q216IncrementalDedupSql,
    "q225_verified_pairs" -> q225VerifiedPairsSql,
    "q227_ingest_dedup" -> q227IngestDedupSql,
    "q228_ivfadc" -> q228IvfAdcSql,
    "q229_ivfadc_rerank" -> q229IvfAdcRerankSql,
    "q231_pii_redaction" -> piiCardSql,
    "q232_nb_lang_classify" -> q232NbLangSql,
    // q233 is the streaming build of the SAME card — additive sums over
    // stateless projections commute with micro-batching (q202/q213
    // convention), so it shares q231's oracle verbatim.
    "q233_stream_pii" -> piiCardSql,
    "q234_bpe_train" -> q234BpeTrainSql,
    "q235_bpe_encode" -> q235BpeEncodeSql,
    "q236_l_diversity" -> q236LDiversitySql,
    "q249_t_closeness" -> q249TClosenessSql,

    // q250: Heaps growth replayed — same exact integer ceil-division
    // checkpoint cutoffs, same min-checkpoint vocab counting, LN ratios
    // on identical doubles.
    "q250_heaps_growth" ->
      """WITH b AS (
        |  SELECT CAST(MIN(doc_id) AS BIGINT) AS mn,
        |    CAST(MAX(doc_id) AS BIGINT) AS mx FROM documents),
        |d AS (
        |  SELECT doc_id, text,
        |    CASE
        |      WHEN doc_id <= mn - 1 + ((mx - mn + 1) * 10 + 99) // 100
        |        THEN 10
        |      WHEN doc_id <= mn - 1 + ((mx - mn + 1) * 25 + 99) // 100
        |        THEN 25
        |      WHEN doc_id <= mn - 1 + ((mx - mn + 1) * 50 + 99) // 100
        |        THEN 50
        |      ELSE 100 END AS cb
        |  FROM documents, b),
        |tc AS (
        |  SELECT u.tok AS tok, cb, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM d, UNNEST(string_split(trim(text), ' ')) AS u(tok)
        |  GROUP BY u.tok, cb),
        |vn AS (
        |  SELECT minb AS pct, CAST(COUNT(*) AS BIGINT) AS vnew
        |  FROM (SELECT tok, MIN(cb) AS minb FROM tc GROUP BY tok)
        |  GROUP BY minb),
        |tn AS (
        |  SELECT cb AS pct, CAST(SUM(c) AS BIGINT) AS tnew
        |  FROM tc GROUP BY cb),
        |dn AS (
        |  SELECT cb AS pct, CAST(COUNT(*) AS BIGINT) AS dnew
        |  FROM d GROUP BY cb),
        |cp AS (
        |  SELECT CAST(u.p AS BIGINT) AS pct
        |  FROM UNNEST([10, 25, 50, 100]) AS u(p)),
        |g AS (
        |  SELECT cp.pct,
        |    CAST(SUM(COALESCE(dn.dnew, 0)) OVER (ORDER BY cp.pct
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_docs,
        |    CAST(SUM(COALESCE(tn.tnew, 0)) OVER (ORDER BY cp.pct
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_tokens,
        |    CAST(SUM(COALESCE(vn.vnew, 0)) OVER (ORDER BY cp.pct
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS n_vocab
        |  FROM cp
        |  LEFT JOIN vn ON vn.pct = cp.pct
        |  LEFT JOIN tn ON tn.pct = cp.pct
        |  LEFT JOIN dn ON dn.pct = cp.pct)
        |SELECT pct, n_docs, n_tokens, n_vocab,
        |  CASE WHEN LAG(n_vocab) OVER (ORDER BY pct) > 0
        |    AND LAG(n_tokens) OVER (ORDER BY pct) > 0
        |    AND n_tokens > LAG(n_tokens) OVER (ORDER BY pct)
        |  THEN ROUND(
        |    LN(CAST(n_vocab AS DOUBLE) /
        |      CAST(LAG(n_vocab) OVER (ORDER BY pct) AS DOUBLE)) /
        |    LN(CAST(n_tokens AS DOUBLE) /
        |      CAST(LAG(n_tokens) OVER (ORDER BY pct) AS DOUBLE)), 6)
        |  END AS heaps_beta
        |FROM g
        |ORDER BY pct""".stripMargin,
    "q237_dp_histogram" -> q237DpHistogramSql,
    "q238_span_scrub" -> q238SpanScrubSql,
    "q239_dsir_selection" -> q239DsirSql,
    "q240_matryoshka_recall" -> q240MatryoshkaSql,
    "q241_cluster_sample" -> q241ClusterSampleSql,
    "q251_cluster_drift" -> q251ClusterDriftSql,
    // q254 shares q251's oracle verbatim: the streamed min-k centroid
    // store + additive occupancy counts converge to the batch card
    // exactly (stream ≡ batch is the streaming contract under test).
    "q254_stream_cluster_drift" -> q251ClusterDriftSql,
    "q252_cluster_cohesion" -> q252ClusterCohesionSql,
    "q256_cluster_label_nmi" -> q256ClusterLabelSql,

    // q255: PMI collocations replayed — direct adjacent pairs (the same
    // pair set as Spark's slice-and-join bigrams), identical double
    // expression shape inside LN, rank on (rounded pmi, w1, w2).
    "q255_pmi_collocations" ->
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM w),
        |bgl AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, UNNEST(range(1, len(toks))) AS r(i)
        |  WHERE toks[i] <> '' AND toks[i + 1] <> ''),
        |bg AS (
        |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |  FROM bgl GROUP BY w1, w2 HAVING COUNT(*) >= 5),
        |scored AS (
        |  SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
        |    ROUND(LN(CAST(b.c12 AS DOUBLE) * CAST(tot.n AS DOUBLE) /
        |      (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))), 6) AS pmi
        |  FROM bg b
        |  JOIN uni u1 ON b.w1 = u1.w
        |  JOIN uni u2 ON b.w2 = u2.w
        |  CROSS JOIN tot)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, w1, w2)
        |    AS BIGINT) AS rank,
        |  w1, w2, c12, c1, c2, pmi
        |FROM scored
        |ORDER BY pmi DESC, w1, w2
        |LIMIT 30""".stripMargin,

    // q253: domain cap replayed — q13's quality expression, per-source
    // rank on (rounded score desc, id), kept/dropped aggregation.
    "q253_source_cap" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    string_split(trim(text), ' ') AS toks FROM documents),
        |q AS (
        |  SELECT doc_id, source,
        |    CAST(len(toks) AS BIGINT) AS n_tokens,
        |    ROUND(LEAST(len(toks) / 100.0, 1.0) *
        |      (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) /
        |        CAST(len(toks) AS DOUBLE)), 6) AS quality_score
        |  FROM t),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY quality_score DESC, doc_id) <= 10 AS keep
        |  FROM q)
        |SELECT source,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE 1 END) AS BIGINT)
        |    AS n_dropped,
        |  CAST(SUM(CASE WHEN keep THEN n_tokens ELSE 0 END) AS BIGINT)
        |    AS kept_tokens,
        |  CAST(SUM(CASE WHEN keep THEN 0 ELSE n_tokens END) AS BIGINT)
        |    AS dropped_tokens,
        |  MIN(CASE WHEN keep THEN quality_score END) AS min_kept_quality
        |FROM r
        |GROUP BY source
        |ORDER BY source""".stripMargin,
    "q242_epoch_shards" -> q242EpochShardsSql,
    "q243_bpe_fertility" -> q243BpeFertilitySql,
    "q244_waterfill" -> q244WaterfillSql,
    "q246_lsh_quality" -> q246LshQualitySql,
    "q257_lsh_band_sweep" -> q257LshBandSweepSql,

    // q260: learning curve replayed — two-level DECIMAL bucket sums,
    // q183's slope/intercept expressions per fraction, holdout errors
    // fanned across the three parameter rows.
    "q260_learning_curve" ->
      """WITH d AS (
        |  SELECT ((l_orderkey % 1000003) * 2654435761) % 20 AS b,
        |    CAST(l_quantity AS DOUBLE) AS x,
        |    CAST(l_extendedprice AS DOUBLE) AS y
        |  FROM lineitem),
        |bs AS (
        |  SELECT b, COUNT(*) AS n,
        |    SUM(CAST(x AS DECIMAL(28,2))) AS sx,
        |    SUM(CAST(y AS DECIMAL(28,2))) AS sy,
        |    SUM(CAST(x * y AS DECIMAL(28,4))) AS sxy,
        |    SUM(CAST(x * x AS DECIMAL(28,4))) AS sxx,
        |    SUM(CAST(y * y AS DECIMAL(28,4))) AS syy
        |  FROM d WHERE b % 5 <> 4 GROUP BY b),
        |fr AS (
        |  SELECT CAST(25 AS BIGINT) AS pct, 5 AS th
        |  UNION ALL SELECT 50, 10 UNION ALL SELECT 100, 20),
        |ps AS (
        |  SELECT fr.pct AS fraction_pct,
        |    CAST(SUM(n) AS BIGINT) AS n_tr,
        |    CAST(SUM(sx) AS DOUBLE) AS sx,
        |    CAST(SUM(sy) AS DOUBLE) AS sy,
        |    CAST(SUM(sxy) AS DOUBLE) AS sxy,
        |    CAST(SUM(sxx) AS DOUBLE) AS sxx,
        |    CAST(SUM(syy) AS DOUBLE) AS syy
        |  FROM fr JOIN bs ON bs.b < fr.th GROUP BY fr.pct),
        |pd AS (
        |  SELECT fraction_pct, n_tr, sx, sy, sxy, sxx,
        |    (n_tr * sxx - sx * sx) AS den0,
        |    (syy - sy * sy / n_tr) AS syyc
        |  FROM ps),
        |p1 AS (
        |  SELECT fraction_pct, n_tr, sx, sy,
        |    CASE WHEN den0 <> 0 AND syyc > 0 THEN
        |      (n_tr * sxy - sx * sy) /
        |        (den0 * (1.0 + 1.0 / SQRT(syyc / n_tr)))
        |    END AS slope
        |  FROM pd),
        |p2 AS (
        |  SELECT fraction_pct, n_tr, slope,
        |    (sy - slope * sx) / n_tr AS intercept
        |  FROM p1),
        |e AS (
        |  SELECT p2.fraction_pct,
        |    d.y - (p2.intercept + p2.slope * d.x) AS err
        |  FROM d, p2 WHERE d.b % 5 = 4),
        |er AS (
        |  SELECT fraction_pct, CAST(COUNT(*) AS BIGINT) AS n_test,
        |    ROUND(SQRT(CAST(SUM(CAST(err * err AS DECIMAL(28,4)))
        |      AS DOUBLE) / COUNT(*)), 6) AS rmse_holdout
        |  FROM e GROUP BY fraction_pct)
        |SELECT p2.fraction_pct, p2.n_tr AS n_train, er.n_test,
        |  ROUND(p2.slope, 6) AS slope,
        |  ROUND(p2.intercept, 6) AS intercept, er.rmse_holdout
        |FROM p2 JOIN er USING (fraction_pct)
        |ORDER BY fraction_pct""".stripMargin,

    // q264: OOV drift replayed — same exact id-half split, top-100
    // early vocab on (count DESC, token), conditional sums on the
    // (token, half) frame.
    "q264_oov_drift" ->
      """WITH b AS (
        |  SELECT CAST(MIN(doc_id) AS BIGINT) AS mn,
        |    CAST(MAX(doc_id) AS BIGINT) AS mx FROM documents),
        |tk AS (
        |  SELECT doc_id * 2 > b.mn + b.mx AS late, u.tok AS tok
        |  FROM documents, b,
        |    UNNEST(string_split(trim(text), ' ')) AS u(tok)),
        |bt AS (
        |  SELECT tok,
        |    CAST(SUM(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM tk GROUP BY tok),
        |v AS (
        |  SELECT tok, 1 AS iv FROM bt WHERE ca > 0
        |  ORDER BY ca DESC, tok LIMIT 100)
        |SELECT CAST(100 AS BIGINT) AS vocab_size,
        |  CAST(SUM(ca) AS BIGINT) AS n_tokens_early,
        |  ROUND(CAST(SUM(CASE WHEN v.iv IS NULL THEN ca ELSE 0 END)
        |      AS DOUBLE) / CAST(SUM(ca) AS DOUBLE), 6) AS oov_rate_early,
        |  CAST(SUM(cb) AS BIGINT) AS n_tokens_late,
        |  ROUND(CAST(SUM(CASE WHEN v.iv IS NULL THEN cb ELSE 0 END)
        |      AS DOUBLE) / CAST(SUM(cb) AS DOUBLE), 6) AS oov_rate_late,
        |  CAST(SUM(CASE WHEN ca = 0 AND cb > 0 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_new_types_late
        |FROM bt LEFT JOIN v USING (tok)""".stripMargin,

    // q263: token shard plan replayed — plain global prefix sum on the
    // DuckDB side (the Spark side's two-level bucket sum is the scale
    // path, same values), exact `//` floor divisions.
    "q263_token_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, tok,
        |    CAST(SUM(tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) - tok AS start
        |  FROM t)
        |SELECT start // 4096 AS shard,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
        |  CAST(4096 AS BIGINT) AS target_tokens,
        |  ROUND(CAST(SUM(tok) - 4096 AS DOUBLE) / 4096.0, 6)
        |    AS deviation_frac
        |FROM c
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    // q262: concentration card replayed — tie-collapsed mass frame,
    // HUGEINT Lorenz sums, rank-split boundaries, identical division
    // shapes.
    "q262_concentration" ->
      """WITH m AS (
        |  SELECT CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS v
        |  FROM documents),
        |bv AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM m GROUP BY v),
        |r AS (
        |  SELECT v, c,
        |    CAST(SUM(c) OVER w AS BIGINT) - c AS prev_c,
        |    CAST(SUM(CAST(v AS HUGEINT) * c) OVER w AS HUGEINT)
        |      - CAST(v AS HUGEINT) * c AS prev_m
        |  FROM bv
        |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |a AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT) AS s,
        |    CAST(SUM(CAST(v AS HUGEINT) *
        |      (2 * CAST(c AS HUGEINT) * prev_c +
        |       CAST(c AS HUGEINT) * (c + 1))) AS HUGEINT) AS g2
        |  FROM r),
        |t1 AS (
        |  SELECT ROUND(1.0 - CAST(r.prev_m +
        |      (k.rr - r.prev_c) * CAST(r.v AS HUGEINT) AS DOUBLE) /
        |    CAST(a.s AS DOUBLE), 6) AS top1_share
        |  FROM r, a, (SELECT n - n // 100 AS rr FROM a) k
        |  WHERE r.prev_c < k.rr AND k.rr <= r.prev_c + r.c),
        |t10 AS (
        |  SELECT ROUND(1.0 - CAST(r.prev_m +
        |      (k.rr - r.prev_c) * CAST(r.v AS HUGEINT) AS DOUBLE) /
        |    CAST(a.s AS DOUBLE), 6) AS top10_share
        |  FROM r, a, (SELECT n - n // 10 AS rr FROM a) k
        |  WHERE r.prev_c < k.rr AND k.rr <= r.prev_c + r.c)
        |SELECT a.n AS n_rows, CAST(a.s AS BIGINT) AS total_mass,
        |  ROUND(CAST(a.g2 AS DOUBLE) /
        |      (CAST(a.n AS DOUBLE) * CAST(a.s AS DOUBLE)) -
        |    (CAST(a.n AS DOUBLE) + 1.0) / CAST(a.n AS DOUBLE), 6)
        |    AS gini,
        |  t1.top1_share, t10.top10_share
        |FROM a, t1, t10""".stripMargin,

    // q261: Kruskal–Wallis replayed — tie-collapsed (value, group)
    // counts, HUGEINT doubled rank sums, DECIMAL(38,6)-accumulated
    // Σ R_j²/n_j, identical H/correction expression shapes.
    "q261_kruskal_wallis" ->
      """WITH vg AS (
        |  SELECT CAST(value AS DOUBLE) AS v, event_type AS g,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL
        |  GROUP BY v, g),
        |bv AS (
        |  SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM vg GROUP BY v),
        |r AS (
        |  SELECT v, t,
        |    CAST(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) - t AS prev
        |  FROM bv),
        |pg AS (
        |  SELECT vg.g, CAST(SUM(vg.c) AS BIGINT) AS n_j,
        |    CAST(SUM(CAST(vg.c AS HUGEINT) *
        |      (CAST(r.prev AS HUGEINT) * 2 + r.t + 1)) AS HUGEINT) AS r2
        |  FROM vg JOIN r USING (v) GROUP BY vg.g),
        |ti AS (
        |  SELECT CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
        |      AS ties,
        |    CAST(SUM(t) AS BIGINT) AS n
        |  FROM r),
        |agg AS (
        |  SELECT CAST(MAX(ti.n) AS BIGINT) AS n,
        |    COUNT(*) AS n_groups,
        |    MAX(ti.ties) AS tsum,
        |    CAST(SUM(CAST(
        |      (CAST(pg.r2 AS DOUBLE) / 2.0) *
        |      (CAST(pg.r2 AS DOUBLE) / 2.0) /
        |      CAST(pg.n_j AS DOUBLE)
        |    AS DECIMAL(38,6))) AS DOUBLE) AS rsum
        |  FROM pg CROSS JOIN ti)
        |SELECT n, n_groups,
        |  ROUND(12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)) *
        |    rsum - 3.0 * (CAST(n AS DOUBLE) + 1.0), 6) AS h,
        |  ROUND(1.0 - CAST(tsum AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(n AS DOUBLE)), 6) AS tie_correction,
        |  CASE WHEN 1.0 - CAST(tsum AS DOUBLE) /
        |    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |      - CAST(n AS DOUBLE)) > 0.0 THEN
        |    ROUND((12.0 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
        |        + 1.0)) * rsum - 3.0 * (CAST(n AS DOUBLE) + 1.0)) /
        |      (1.0 - CAST(tsum AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
        |        - CAST(n AS DOUBLE))), 6) END AS h_corrected
        |FROM agg""".stripMargin,

    // q259: Mann–Whitney replayed — tie-collapsed values, doubled
    // midranks in HUGEINT (≡ Spark's decimal(38,0)), identical double
    // expression shapes for u/μ/σ/z/effect.
    "q259_mann_whitney" ->
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
        |c AS (
        |  SELECT *,
        |    CAST(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
        |      PRECEDING AND CURRENT ROW) AS BIGINT) - t AS prev
        |  FROM bv),
        |a AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(cb AS HUGEINT) *
        |      (CAST(prev AS HUGEINT) * 2 + t + 1)) AS HUGEINT) AS r2b,
        |    CAST(SUM(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS ties,
        |    CAST(SUM(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_tied
        |  FROM c)
        |SELECT n_a, n_b, n_tied AS n_tied_values,
        |  ROUND((CAST(r2b AS DOUBLE) - CAST(n_b AS DOUBLE) *
        |    (CAST(n_b AS DOUBLE) + 1.0)) / 2.0, 6) AS u_b,
        |  ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0, 6)
        |    AS mu_u,
        |  ROUND(SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
        |    ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0) -
        |      CAST(ties AS DOUBLE) /
        |      ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
        |       (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))), 6)
        |    AS sigma_u,
        |  ROUND(((CAST(r2b AS DOUBLE) - CAST(n_b AS DOUBLE) *
        |      (CAST(n_b AS DOUBLE) + 1.0)) / 2.0 -
        |    CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
        |    SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
        |    ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0) -
        |      CAST(ties AS DOUBLE) /
        |      ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
        |       (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0)))), 6)
        |    AS z,
        |  ROUND((CAST(r2b AS DOUBLE) - CAST(n_b AS DOUBLE) *
        |      (CAST(n_b AS DOUBLE) + 1.0)) / 2.0 * 2.0 /
        |    (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) - 1.0, 6)
        |    AS rank_biserial
        |FROM a WHERE n_a > 0 AND n_b > 0""".stripMargin,

    // q258: trimmed/winsorized means replayed — same micro-scaling
    // round, rank boundaries by window (toy scale; the Spark side's
    // counting search returns the identical order statistics), HUGEINT
    // tail-mass arithmetic, identical division shape.
    "q258_trimmed_mean" ->
      """WITH v AS (
        |  SELECT CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 1000000.0,
        |    0) AS BIGINT) AS v
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |nk AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COUNT(*) * 1 // 20 AS BIGINT) AS k FROM v),
        |r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn FROM v),
        |lo AS (SELECT r.v AS lo FROM r, nk WHERE r.rn = nk.k + 1),
        |hi AS (SELECT r.v AS hi FROM r, nk WHERE r.rn = nk.n - nk.k),
        |s AS (
        |  SELECT CAST(SUM(CAST(v.v AS HUGEINT)) AS HUGEINT) AS s,
        |    CAST(SUM(CASE WHEN v.v < lo.lo THEN CAST(v.v AS HUGEINT)
        |      ELSE 0 END) AS HUGEINT) AS sb,
        |    CAST(SUM(CASE WHEN v.v < lo.lo THEN 1 ELSE 0 END) AS BIGINT)
        |      AS cb,
        |    CAST(SUM(CASE WHEN v.v > hi.hi THEN CAST(v.v AS HUGEINT)
        |      ELSE 0 END) AS HUGEINT) AS sa,
        |    CAST(SUM(CASE WHEN v.v > hi.hi THEN 1 ELSE 0 END) AS BIGINT)
        |      AS ca
        |  FROM v, lo, hi)
        |SELECT nk.n AS n_rows, nk.k AS k_each_side,
        |  lo.lo AS lo_micro, hi.hi AS hi_micro,
        |  ROUND(CAST(s.s AS DOUBLE) / CAST(nk.n AS DOUBLE) / 1000000.0,
        |    6) AS raw_mean,
        |  ROUND(CAST(s.s - (s.sb + (nk.k - s.cb) * lo.lo)
        |      - (s.sa + (nk.k - s.ca) * hi.hi) AS DOUBLE) /
        |    CAST(nk.n - 2 * nk.k AS DOUBLE) / 1000000.0, 6)
        |    AS trimmed_mean,
        |  ROUND(CAST(s.s - (s.sb + (nk.k - s.cb) * lo.lo)
        |      - (s.sa + (nk.k - s.ca) * hi.hi)
        |      + nk.k * lo.lo + nk.k * hi.hi AS DOUBLE) /
        |    CAST(nk.n AS DOUBLE) / 1000000.0, 6) AS winsorized_mean
        |FROM nk, lo, hi, s""".stripMargin,

    // q248: packing card replayed — same whitespace token count, plain
    // global window prefix sum (DuckDB side; the Spark side's two-level
    // bucket sum is the scale path, same values), exact `//` floor divs.
    // q265 shares it verbatim: the id-range-wave streamed partials sum
    // to the batch card exactly (stream ≡ batch is the contract).
    "q248_packing_card" -> q248PackingSql,
    "q265_stream_packing" -> q248PackingSql,

    // q272: Poisson bootstrap replayed — the q135-family two-round
    // congruential draw seeded by (row id, replicate), shared Poisson(1)
    // CDF literals, means rounded to 6 BEFORE ranking, ceil(α·64) order
    // statistics with b tiebreak, decimal-summed SE over rounded means.
    "q272_poisson_bootstrap" ->
      """WITH base AS (
        |  SELECT l_returnflag AS g,
        |    l_orderkey * 10 + l_linenumber AS id,
        |    CAST(l_extendedprice AS DOUBLE) AS x,
        |    CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100.0, 0)
        |      AS BIGINT) AS xc
        |  FROM lineitem WHERE l_extendedprice IS NOT NULL),
        |reps AS (SELECT UNNEST(range(1, 65)) AS b),
        |draw AS (
        |  SELECT g, xc, b,
        |    ((((((id + b) % 1000003) * 2654435761) % 1000003)
        |      + id // 1000003) % 9999991) * 22695477 % 9999991 AS x2
        |  FROM base CROSS JOIN reps),
        |wts AS (
        |  SELECT g, xc, b,
        |    CASE
        |      WHEN u < 0.36787944117144233 THEN 0
        |      WHEN u < 0.7357588823428847 THEN 1
        |      WHEN u < 0.9196986029286058 THEN 2
        |      WHEN u < 0.9810118431238463 THEN 3
        |      WHEN u < 0.9963401531726563 THEN 4
        |      WHEN u < 0.9994058151824183 THEN 5
        |      WHEN u < 0.999916758850712 THEN 6
        |      WHEN u < 0.9999897508033253 THEN 7
        |      WHEN u < 0.999998874797402 THEN 8
        |      ELSE 9 END AS w
        |  FROM (SELECT g, xc, b,
        |    (CAST(x2 AS DOUBLE) + 0.5) / 9999991.0 AS u FROM draw)),
        |rep_m AS (
        |  SELECT g, b,
        |    ROUND(CAST(SUM(w * xc) AS DOUBLE) /
        |      (CAST(SUM(w) AS DOUBLE) * 100.0), 6) AS m
        |  FROM wts GROUP BY g, b
        |  HAVING SUM(w) > 0),
        |ranked AS (
        |  SELECT g, b, m,
        |    ROW_NUMBER() OVER (PARTITION BY g ORDER BY m, b) AS rn
        |  FROM rep_m),
        |ci AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_reps,
        |    MAX(CASE WHEN rn = 2 THEN m END) AS boot_lo,
        |    MAX(CASE WHEN rn = 63 THEN m END) AS boot_hi,
        |    CAST(SUM(CAST(m AS DECIMAL(38,6))) AS DOUBLE) AS sm,
        |    CAST(SUM(CAST(m * m AS DECIMAL(38,12))) AS DOUBLE) AS qm
        |  FROM ranked GROUP BY g),
        |full_m AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |    CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) AS sx
        |  FROM base GROUP BY g)
        |SELECT f.g AS l_returnflag, f.n_rows,
        |  ROUND(f.sx / CAST(f.n_rows AS DOUBLE), 6) AS mean_full,
        |  c.n_reps, c.boot_lo, c.boot_hi,
        |  ROUND(SQRT((c.qm - c.sm * c.sm / CAST(c.n_reps AS DOUBLE)) /
        |    (CAST(c.n_reps AS DOUBLE) - 1.0)), 6) AS boot_se
        |FROM full_m f JOIN ci c USING (g)
        |ORDER BY l_returnflag""".stripMargin,

    // q273: Theil–Sen replayed — same calendar spine as q269, all day
    // pairs on the bounded frame, (slope, i, j) rank order, middle-rank
    // average median (`//` floor ranks), exact OLS moments.
    "q273_theil_sen" ->
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
        |pairs AS (
        |  SELECT s1.i AS i, s2.i AS j,
        |    CAST(s2.x - s1.x AS DOUBLE) / CAST(s2.i - s1.i AS DOUBLE)
        |      AS slope
        |  FROM series s1 JOIN series s2 ON s2.i > s1.i),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs),
        |ranked AS (
        |  SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, i, j) AS rn
        |  FROM pairs),
        |med AS (
        |  SELECT MAX(m.n_pairs) AS n_pairs,
        |    SUM(r.slope) / COUNT(*) AS ts
        |  FROM ranked r CROSS JOIN m
        |  WHERE r.rn = (m.n_pairs + 1) // 2 OR r.rn = (m.n_pairs + 2) // 2),
        |ols AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(x) AS DOUBLE) AS sx,
        |    CAST(SUM(i) AS DOUBLE) AS si,
        |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS six,
        |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS sii
        |  FROM series)
        |SELECT o.n_days, m2.n_pairs,
        |  ROUND(m2.ts, 6) AS theil_sen_slope,
        |  ROUND((o.six - o.si * o.sx / CAST(o.n_days AS DOUBLE)) /
        |    (o.sii - o.si * o.si / CAST(o.n_days AS DOUBLE)), 6)
        |    AS ols_slope
        |FROM ols o CROSS JOIN med m2""".stripMargin,

    // q269: daily-count ACF replayed — calendar spine with zero-filled
    // gap days, HUGEINT lag moments (≡ Spark's decimal(38,0)), the
    // textbook estimator in one shared double shape per lag.
    // q292 shares q269's SQL verbatim: the streamed (day, count) frame
    // is additive state equal to the batch counts exactly.
    "q269_daily_acf" -> q269AcfSql,
    "q292_stream_acf" -> q269AcfSql,

    // q293: Hill estimator replayed — (count DESC, token) top-51,
    // rank-51 cutoff, LN-difference terms in decimal, k/Σ.
    "q293_hill_tail" ->
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY w),
        |top AS (
        |  SELECT w, c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, w)
        |    AS BIGINT) AS rank
        |  FROM c QUALIFY rank <= 51),
        |cr AS (SELECT MAX(rank) AS cr FROM top HAVING MAX(rank) >= 3),
        |cut AS (SELECT top.c AS ck1, cr.cr FROM top CROSS JOIN cr
        |        WHERE top.rank = cr.cr),
        |terms AS (
        |  SELECT CAST(LN(CAST(top.c AS DOUBLE)) -
        |    LN(CAST(cut.ck1 AS DOUBLE)) AS DECIMAL(38,12)) AS t2,
        |    cut.ck1
        |  FROM top CROSS JOIN cut WHERE top.rank < cut.cr)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k, ck1 AS c_tail_cutoff,
        |  CASE WHEN CAST(SUM(t2) AS DOUBLE) > 0.0 THEN
        |    ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(SUM(t2) AS DOUBLE), 6)
        |  END AS hill_alpha
        |FROM terms GROUP BY ck1""".stripMargin,

    // q294: bigram entropy replayed — q255's pair set and empty-token
    // discipline, decimal entropy terms on identical doubles.
    "q294_bigram_entropy" ->
      """WITH t AS (
        |  SELECT string_split(trim(text), ' ') AS toks FROM documents),
        |w AS (SELECT u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c1
        |        FROM w GROUP BY w),
        |n1 AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1 FROM uni),
        |hu AS (
        |  SELECT -CAST(SUM(CAST(
        |    (CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) *
        |    LN(CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE))
        |    AS DECIMAL(38,12))) AS DOUBLE) AS hu
        |  FROM uni CROSS JOIN n1),
        |bgl AS (
        |  SELECT toks[i] AS w1, toks[i + 1] AS w2
        |  FROM t, UNNEST(range(1, len(toks))) AS r(i)
        |  WHERE toks[i] <> '' AND toks[i + 1] <> ''),
        |bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
        |       FROM bgl GROUP BY w1, w2),
        |n2 AS (SELECT CAST(SUM(c12) AS BIGINT) AS n2 FROM bg),
        |hc AS (
        |  SELECT n2, -CAST(SUM(CAST(
        |    (CAST(c12 AS DOUBLE) / CAST(n2 AS DOUBLE)) *
        |    LN(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE))
        |    AS DECIMAL(38,12))) AS DOUBLE) AS hc
        |  FROM bg JOIN uni ON bg.w1 = uni.w CROSS JOIN n2
        |  GROUP BY n2)
        |SELECT hc.n2 AS n_bigrams, ROUND(hu.hu, 6) AS h_unigram,
        |  ROUND(hc.hc, 6) AS h_conditional,
        |  ROUND(hu.hu - hc.hc, 6) AS predictability_gain
        |FROM hc CROSS JOIN hu""".stripMargin,

    // q295: burstiness replayed — broadcast top-20 vocabulary,
    // (token, doc) counts, zeros through the closed form, fixed VMR.
    "q295_token_burstiness" ->
      """WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS d FROM documents),
        |t AS (
        |  SELECT doc_id, string_split(trim(text), ' ') AS toks
        |  FROM documents),
        |w AS (SELECT doc_id, u.w AS w FROM t, UNNEST(toks) AS u(w)
        |      WHERE u.w <> ''),
        |topk AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS corpus_count
        |  FROM w GROUP BY w
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY corpus_count DESC, w)
        |    <= 20),
        |pd AS (
        |  SELECT w.w, tk.corpus_count, w.doc_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_td
        |  FROM w JOIN topk tk ON w.w = tk.w
        |  GROUP BY w.w, tk.corpus_count, w.doc_id),
        |st AS (
        |  SELECT w, corpus_count, CAST(COUNT(*) AS BIGINT) AS doc_freq,
        |    CAST(SUM(n_td) AS BIGINT) AS s,
        |    CAST(SUM(CAST(n_td AS HUGEINT) * n_td) AS DOUBLE) AS q
        |  FROM pd GROUP BY w, corpus_count)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY corpus_count DESC, w)
        |    AS BIGINT) AS rank,
        |  w AS token, corpus_count, doc_freq,
        |  ROUND(CAST(s AS DOUBLE) / CAST(d AS DOUBLE), 6) AS mean_per_doc,
        |  CASE WHEN CAST(s AS DOUBLE) / CAST(d AS DOUBLE) > 0.0 THEN
        |    ROUND(((q - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
        |      CAST(d AS DOUBLE)) / (CAST(d AS DOUBLE) - 1.0)) /
        |      (CAST(s AS DOUBLE) / CAST(d AS DOUBLE)), 6)
        |  END AS vmr
        |FROM st CROSS JOIN nd WHERE d > 1
        |ORDER BY rank""".stripMargin,

    // q296: mix diversity replayed — per-source decimal entropy /
    // Simpson terms, fixed exp/share shapes.
    // q315: HITS replayed — the exact-integer fixed point unrolled
    // (8 rounds of auth/hub sums + BIGINT floor-normalization against
    // the round max). Generated by [[hitsOracleSql]].
    "q315_hits" -> hitsOracleSql(8),

    // q317: TextRank replayed — q255's tokenize/bigram machinery feeds
    // the q118 unrolled exact-integer PageRank over the min-count-5
    // word adjacency graph. Generated by [[textRankOracleSql]].
    "q317_textrank" -> textRankOracleSql(10),

    // q319: Lloyd k-means replayed — the q316 recursive-CTE contract
    // with hard CASE assignment (ties to the lower cluster), per-
    // cluster DECIMAL moments, round-9 centers, empty-cluster carry,
    // WCSS at input centers; long (iter, cluster) output.
    "q319_kmeans_1d" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(value AS DOUBLE) AS x
        |  FROM events WHERE value IS NOT NULL),
        |b AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM d),
        |it(i, c1, c2, c3, n1, n2, n3, wcss) AS (
        |  SELECT 0, ROUND(mn + 1 * (mx - mn) / 6, 9),
        |    ROUND(mn + 3 * (mx - mn) / 6, 9),
        |    ROUND(mn + 5 * (mx - mn) / 6, 9),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
        |  FROM b
        |  UNION ALL
        |  SELECT i + 1,
        |    CASE WHEN n1x > 0 THEN ROUND(s1 / n1x, 9) ELSE c1 END,
        |    CASE WHEN n2x > 0 THEN ROUND(s2 / n2x, 9) ELSE c2 END,
        |    CASE WHEN n3x > 0 THEN ROUND(s3 / n3x, 9) ELSE c3 END,
        |    n1x, n2x, n3x, w
        |  FROM (
        |    SELECT i, c1, c2, c3,
        |      CAST(SUM(CASE WHEN a = 1 THEN CAST(x AS DECIMAL(28,12))
        |        END) AS DOUBLE) AS s1,
        |      CAST(SUM(CASE WHEN a = 2 THEN CAST(x AS DECIMAL(28,12))
        |        END) AS DOUBLE) AS s2,
        |      CAST(SUM(CASE WHEN a = 3 THEN CAST(x AS DECIMAL(28,12))
        |        END) AS DOUBLE) AS s3,
        |      CAST(SUM(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |        AS n1x,
        |      CAST(SUM(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS BIGINT)
        |        AS n2x,
        |      CAST(SUM(CASE WHEN a = 3 THEN 1 ELSE 0 END) AS BIGINT)
        |        AS n3x,
        |      CAST(SUM(CAST((x - ca) * (x - ca) AS DECIMAL(28,12)))
        |        AS DOUBLE) AS w
        |    FROM (
        |      SELECT it.i AS i, it.c1 AS c1, it.c2 AS c2, it.c3 AS c3,
        |        d.x AS x,
        |        CASE WHEN ABS(d.x - it.c1) <= ABS(d.x - it.c2)
        |               AND ABS(d.x - it.c1) <= ABS(d.x - it.c3) THEN 1
        |             WHEN ABS(d.x - it.c2) <= ABS(d.x - it.c3) THEN 2
        |             ELSE 3 END AS a,
        |        CASE WHEN ABS(d.x - it.c1) <= ABS(d.x - it.c2)
        |               AND ABS(d.x - it.c1) <= ABS(d.x - it.c3) THEN it.c1
        |             WHEN ABS(d.x - it.c2) <= ABS(d.x - it.c3) THEN it.c2
        |             ELSE it.c3 END AS ca
        |      FROM it, d WHERE it.i < 6)
        |    GROUP BY i, c1, c2, c3))
        |SELECT it.i AS iter, j.cluster AS cluster,
        |  ROUND(CASE j.cluster WHEN 1 THEN it.c1 WHEN 2 THEN it.c2
        |    ELSE it.c3 END, 6) AS center,
        |  CASE j.cluster WHEN 1 THEN it.n1 WHEN 2 THEN it.n2
        |    ELSE it.n3 END AS size,
        |  ROUND(it.wcss, 6) AS wcss
        |FROM it, (VALUES (1), (2), (3)) AS j(cluster)
        |WHERE it.i >= 1
        |ORDER BY iter, cluster""".stripMargin,

    // q322: Dunning keyness replayed — per-(source, term) counts vs
    // rest-of-corpus, expected counts from source token totals, the
    // 0·ln0-guarded G², deterministic top-30.
    "q322_keyness" -> keynessSql,

    // q325: streaming twin of q322 — the (source, term) count frame is
    // additive complete-mode state and the finisher is shared, so the
    // batch oracle IS the stream oracle.
    "q325_stream_keyness" -> keynessSql,

    // q326: Mann–Kendall replayed — q273's calendar spine, exact-
    // integer S over the pair join, tie-corrected variance, continuity-
    // corrected z, τ_b vs tie-free time.
    "q326_mann_kendall" ->
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
        |s AS (
        |  SELECT CAST(SUM(CASE WHEN s2.x > s1.x THEN 1
        |    WHEN s2.x < s1.x THEN -1 ELSE 0 END) AS BIGINT) AS s
        |  FROM series s1 JOIN series s2 ON s2.i > s1.i),
        |ties AS (
        |  SELECT
        |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tsum,
        |    CAST(SUM(t * (t - 1)) AS BIGINT) AS tpair,
        |    CAST(SUM(t) AS BIGINT) AS n
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |        FROM series GROUP BY x)),
        |f AS (
        |  SELECT s.s, ties.n,
        |    (CAST(ties.n AS DOUBLE) * (CAST(ties.n AS DOUBLE) - 1.0) *
        |      (2.0 * CAST(ties.n AS DOUBLE) + 5.0) -
        |      CAST(ties.tsum AS DOUBLE)) / 18.0 AS vars,
        |    CAST(ties.n AS DOUBLE) * (CAST(ties.n AS DOUBLE) - 1.0)
        |      / 2.0 AS half,
        |    CAST(ties.tpair AS DOUBLE) AS tpaird
        |  FROM s, ties)
        |SELECT n AS n_days, s AS s_stat, ROUND(vars, 6) AS var_s,
        |  CASE WHEN s = 0 THEN 0.0
        |    WHEN vars > 0.0 THEN ROUND(
        |      (CAST(s AS DOUBLE) - SIGN(CAST(s AS DOUBLE))) /
        |        SQRT(vars), 6) END AS z,
        |  CASE WHEN half > 0.0 AND half - tpaird / 2.0 > 0.0
        |    THEN ROUND(CAST(s AS DOUBLE) /
        |      SQRT(half * (half - tpaird / 2.0)), 6) END AS tau_b
        |FROM f""".stripMargin,

    // q327: Pettitt replayed — same spine, 2·midrank exact integers
    // (2·RANK + t − 1), the rank CUSUM against t(n+1), K with the
    // earliest argmax, the classic exponential significance.
    "q327_pettitt" ->
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
        |  SELECT i,
        |    2 * CAST(RANK() OVER (ORDER BY x) AS BIGINT) +
        |      (CAST(COUNT(*) OVER (PARTITION BY x) AS BIGINT) - 1) AS r2
        |  FROM series),
        |u AS (
        |  SELECT r.i,
        |    CAST(SUM(r.r2) OVER (ORDER BY r.i
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) - (r.i + 1) * (nn.n + 1) AS u_t
        |  FROM ranked r, nn),
        |uf AS (SELECT u.* FROM u, nn WHERE u.i < nn.n - 1),
        |kk AS (SELECT CAST(MAX(ABS(u_t)) AS BIGINT) AS k_stat FROM uf)
        |SELECT nn.n AS n_days, kk.k_stat,
        |  (SELECT MIN(i) FROM uf WHERE ABS(u_t) = kk.k_stat) AS t_star,
        |  ROUND(LEAST(1.0, 2.0 * EXP(
        |    -6.0 * CAST(kk.k_stat AS DOUBLE) * CAST(kk.k_stat AS DOUBLE)
        |    / (CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE) *
        |       CAST(nn.n AS DOUBLE) +
        |       CAST(nn.n AS DOUBLE) * CAST(nn.n AS DOUBLE)))), 6)
        |    AS p_approx
        |FROM nn, kk""".stripMargin,

    // q323: k-core peeling replayed — the q118 cosine graph, 8
    // MATERIALIZED degree/survivor/restrict rounds, exact integers.
    // Generated by [[kCoreOracleSql]].
    "q323_kcore" -> kCoreOracleSql(7, 8),

    // q324: readability replayed — same ". " sentence split, non-empty
    // token count, [aeiouy]+ vowel-group syllables, identical Flesch
    // constant folding, DECIMAL means per source.
    "q324_readability" ->
      """WITH p AS (
        |  SELECT source,
        |    CAST(len(string_split(text, '. ')) AS DOUBLE) AS s,
        |    CAST(len(list_filter(string_split(trim(text), ' '),
        |      x -> x <> '')) AS DOUBLE) AS w,
        |    CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
        |      AS DOUBLE) AS y
        |  FROM documents
        |  WHERE text IS NOT NULL
        |    AND len(list_filter(string_split(trim(text), ' '),
        |      x -> x <> '')) > 0),
        |f AS (
        |  SELECT source, w / s AS wps, y / w AS spw FROM p),
        |g AS (
        |  SELECT source, wps, spw,
        |    206.835 - 1.015 * wps - 84.6 * spw AS fre,
        |    0.39 * wps + 11.8 * spw - 15.59 AS fkgl
        |  FROM f)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  ROUND(CAST(SUM(CAST(wps AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_words_per_sentence,
        |  ROUND(CAST(SUM(CAST(spw AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_syllables_per_word,
        |  ROUND(CAST(SUM(CAST(fre AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_reading_ease,
        |  ROUND(CAST(SUM(CAST(fkgl AS DECIMAL(28,12))) AS DOUBLE)
        |    / COUNT(*), 6) AS avg_grade_level
        |FROM g GROUP BY source ORDER BY source""".stripMargin,

    // q320: Friedman replayed — round-9 cell means, complete blocks
    // via HAVING against the distinct-treatment count, within-block
    // average ranks (min-rank + (t−1)/2), DECIMAL rank sums, the
    // classical statistic with tie correction.
    "q320_friedman" ->
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
        |tie AS (
        |  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tsum
        |  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
        |        FROM c GROUP BY b, v)),
        |byt AS (
        |  SELECT trt, CAST(SUM(CAST(r AS DECIMAL(28,1))) AS DOUBLE) AS rj
        |  FROM rnk GROUP BY trt),
        |r2 AS (
        |  SELECT CAST(SUM(CAST(rj * rj AS DECIMAL(28,2))) AS DOUBLE)
        |    AS r2 FROM byt),
        |fin AS (
        |  SELECT nn.n AS n_blocks, kk.k AS k,
        |    12.0 / (CAST(nn.n AS DOUBLE) * CAST(kk.k AS DOUBLE) *
        |      (CAST(kk.k AS DOUBLE) + 1.0)) * r2.r2 -
        |      3.0 * CAST(nn.n AS DOUBLE) * (CAST(kk.k AS DOUBLE) + 1.0)
        |      AS q,
        |    1.0 - CAST(tie.tsum AS DOUBLE) /
        |      (CAST(nn.n AS DOUBLE) * CAST(kk.k AS DOUBLE) *
        |        (CAST(kk.k AS DOUBLE) * CAST(kk.k AS DOUBLE) - 1.0))
        |      AS corr
        |  FROM nn, kk, r2, tie)
        |SELECT n_blocks, k, ROUND(q, 6) AS q_stat,
        |  ROUND(corr, 6) AS tie_correction,
        |  CASE WHEN corr > 0.0 THEN ROUND(q / corr, 6) END
        |    AS q_corrected
        |FROM fin""".stripMargin,

    // q321: lift/gains replayed — q46's scorer, midranks over distinct
    // scores (below + (cnt+1)/2), bins by ceil-from-the-top, window
    // cumulatives over the bin frame.
    "q321_lift_gains" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END
        |    AS label,
        |    (o_orderkey % 1000) / 1000.0 + o_totalprice / 1e6 AS score
        |  FROM orders),
        |ms AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(label) AS BIGINT) AS pos
        |  FROM d GROUP BY score),
        |tot AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS p FROM ms),
        |mr AS (
        |  SELECT cnt, pos,
        |    CAST(COALESCE(SUM(cnt) OVER (ORDER BY score
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS DOUBLE) + (cnt + 1) / 2.0 AS midrank
        |  FROM ms),
        |binned AS (
        |  SELECT CAST(CEIL((CAST(tot.n AS DOUBLE) - midrank + 1.0) * 10 /
        |      CAST(tot.n AS DOUBLE)) AS BIGINT) AS bin,
        |    CAST(SUM(cnt) AS BIGINT) AS n,
        |    CAST(SUM(pos) AS BIGINT) AS n_pos,
        |    MAX(tot.n) AS nt, MAX(tot.p) AS pt
        |  FROM mr, tot GROUP BY 1),
        |cum AS (
        |  SELECT bin, n, n_pos, nt, pt,
        |    CAST(SUM(n) OVER wc AS BIGINT) AS cum_n,
        |    CAST(SUM(n_pos) OVER wc AS BIGINT) AS cum_pos
        |  FROM binned
        |  WINDOW wc AS (ORDER BY bin
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bin, n, n_pos,
        |  ROUND(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS pos_rate,
        |  CASE WHEN pt > 0 THEN ROUND(
        |    (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE)) /
        |      (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)), 6) END AS lift,
        |  cum_n, cum_pos,
        |  CASE WHEN pt > 0 THEN ROUND(CAST(cum_pos AS DOUBLE) /
        |    CAST(pt AS DOUBLE), 6) END AS cum_gain,
        |  CASE WHEN pt > 0 THEN ROUND(
        |    (CAST(cum_pos AS DOUBLE) / CAST(cum_n AS DOUBLE)) /
        |      (CAST(pt AS DOUBLE) / CAST(nt AS DOUBLE)), 6) END
        |    AS cum_lift
        |FROM cum ORDER BY bin""".stripMargin,

    // q316 contract's survival sibling: Newton on the Breslow partial
    // likelihood as a recursive CTE over the q299 per-time risk frame —
    // binary covariate collapses risk sums to n0 + n1·e^β; DECIMAL
    // score/information/log-lik sums, round-9 β per step. score_u
    // crosses zero at convergence and DuckDB's ROUND keeps IEEE −0.0
    // where Spark's BigDecimal round never does — the `+ 0.0` folds
    // −0.0 to +0.0 (exact no-op for every other value) so the driver's
    // byte-hash can't split on a sign of zero (round-10 incident).
    "q318_cox_ph" ->
      """WITH RECURSIVE h AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
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
        |    p.pu IS NOT NULL AS ev, s.user_id % 2 = 0 AS x1
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id, h),
        |byt AS (
        |  SELECT t,
        |    CAST(SUM(CASE WHEN x1 AND ev THEN 1 ELSE 0 END) AS BIGINT)
        |      AS d1,
        |    CAST(SUM(CASE WHEN (NOT x1) AND ev THEN 1 ELSE 0 END)
        |      AS BIGINT) AS d0,
        |    CAST(SUM(CASE WHEN x1 THEN 1 ELSE 0 END) AS BIGINT) AS t1,
        |    CAST(SUM(CASE WHEN x1 THEN 0 ELSE 1 END) AS BIGINT) AS t0
        |  FROM d GROUP BY t),
        |riskf AS MATERIALIZED (
        |  SELECT t, d1, d0,
        |    SUM(t1) OVER wr AS n1, SUM(t0) OVER wr AS n0
        |  FROM byt
        |  WINDOW wr AS (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |ev AS MATERIALIZED (
        |  SELECT CAST(d1 AS DOUBLE) AS d1d,
        |    CAST(d1 + d0 AS DOUBLE) AS dd,
        |    CAST(n1 AS DOUBLE) AS n1d, CAST(n0 AS DOUBLE) AS n0d
        |  FROM riskf WHERE d1 + d0 > 0),
        |it(i, beta, u, inf, ll) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE),
        |    CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        |  UNION ALL
        |  SELECT i + 1, ROUND(beta + u / inf, 9), u, inf, ll
        |  FROM (
        |    SELECT i, beta,
        |      CAST(SUM(CAST(d1d - dd * n1d * EXP(beta) / den
        |        AS DECIMAL(28,12))) AS DOUBLE) AS u,
        |      CAST(SUM(CAST(dd * n0d * n1d * EXP(beta) / (den * den)
        |        AS DECIMAL(28,12))) AS DOUBLE) AS inf,
        |      CAST(SUM(CAST(d1d * beta - dd * LN(den)
        |        AS DECIMAL(28,12))) AS DOUBLE) AS ll
        |    FROM (
        |      SELECT it.i AS i, it.beta AS beta, e.d1d, e.dd, e.n1d,
        |        e.n0d, e.n0d + e.n1d * EXP(it.beta) AS den
        |      FROM it, ev e WHERE it.i < 6)
        |    GROUP BY i, beta))
        |SELECT i AS iter, ROUND(beta, 6) AS beta,
        |  ROUND(EXP(beta), 6) AS hazard_ratio,
        |  ROUND(u, 6) + 0.0 AS score_u, ROUND(inf, 6) AS information,
        |  ROUND(ll, 6) AS log_lik
        |FROM it WHERE i >= 1
        |ORDER BY iter""".stripMargin,

    // q316: GMM EM replayed — the q189 recursive-CTE contract with the
    // two-component E-step (fixed-shape densities, underflow fallback
    // γ=½), DECIMAL moments, round-9 M-step, closed-form init.
    "q316_gmm_em" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(value AS DOUBLE) AS x
        |  FROM events WHERE value IS NOT NULL),
        |m0 AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
        |  FROM d),
        |init AS (
        |  SELECT n,
        |    ROUND(sx / CAST(n AS DOUBLE) -
        |      SQRT((sxx - sx * sx / CAST(n AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) - 1.0)), 9) AS m1,
        |    ROUND(sx / CAST(n AS DOUBLE) +
        |      SQRT((sxx - sx * sx / CAST(n AS DOUBLE)) /
        |        (CAST(n AS DOUBLE) - 1.0)), 9) AS m2,
        |    ROUND((sxx - sx * sx / CAST(n AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) - 1.0), 9) AS v
        |  FROM m0),
        |it(i, pi, m1, m2, v1, v2, ll) AS (
        |  SELECT 0, CAST(0.5 AS DOUBLE), m1, m2, v, v,
        |    CAST(NULL AS DOUBLE)
        |  FROM init
        |  UNION ALL
        |  SELECT i + 1,
        |    ROUND(sg / CAST(n AS DOUBLE), 9),
        |    ROUND(sgx / sg, 9),
        |    ROUND(shx / sh, 9),
        |    ROUND(sgxx / sg - (sgx / sg) * (sgx / sg), 9),
        |    ROUND(shxx / sh - (shx / sh) * (shx / sh), 9),
        |    llm
        |  FROM (
        |    SELECT i, n,
        |      CAST(SUM(CAST(g AS DECIMAL(28,12))) AS DOUBLE) AS sg,
        |      CAST(SUM(CAST(g * x AS DECIMAL(28,12))) AS DOUBLE) AS sgx,
        |      CAST(SUM(CAST(g * (x * x) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS sgxx,
        |      CAST(SUM(CAST(g2 AS DECIMAL(28,12))) AS DOUBLE) AS sh,
        |      CAST(SUM(CAST(g2 * x AS DECIMAL(28,12))) AS DOUBLE) AS shx,
        |      CAST(SUM(CAST(g2 * (x * x) AS DECIMAL(28,12))) AS DOUBLE)
        |        AS shxx,
        |      ROUND(CAST(SUM(CAST(LN(den) AS DECIMAL(28,12))) AS DOUBLE)
        |        / n, 6) AS llm
        |    FROM (
        |      SELECT i, n, x,
        |        CASE WHEN n1 + n2 > 0.0 THEN n1 / (n1 + n2)
        |          ELSE 0.5 END AS g,
        |        1.0 - CASE WHEN n1 + n2 > 0.0 THEN n1 / (n1 + n2)
        |          ELSE 0.5 END AS g2,
        |        n1 + n2 AS den
        |      FROM (
        |        SELECT it.i AS i, m.n AS n, d.x AS x,
        |          it.pi * (EXP(-((d.x - it.m1) * (d.x - it.m1)) /
        |            (2.0 * it.v1)) /
        |            SQRT(6.283185307179586 * it.v1)) AS n1,
        |          (1.0 - it.pi) * (EXP(-((d.x - it.m2) * (d.x - it.m2))
        |            / (2.0 * it.v2)) /
        |            SQRT(6.283185307179586 * it.v2)) AS n2
        |        FROM it, d, m0 m WHERE it.i < 6))
        |    GROUP BY i, n))
        |SELECT i AS iter, ROUND(pi, 6) AS pi, ROUND(m1, 6) AS mu1,
        |  ROUND(m2, 6) AS mu2, ROUND(v1, 6) AS var1,
        |  ROUND(v2, 6) AS var2, ll AS log_lik
        |FROM it WHERE i >= 1
        |ORDER BY iter""".stripMargin,

    // q309: fairness card replayed — one (group) confusion-count
    // aggregation, pooled rates by cross join, identical null-guarded
    // ratio shapes and gaps.
    "q309_fairness_card" -> q309FairnessSql,

    // q314 shares q309's oracle verbatim: the confusion cells are pure
    // additive state, so the streamed complete-mode counts + the same
    // finisher converge to the batch card exactly (stream ≡ batch is
    // the contract under test).
    "q314_stream_fairness" -> q309FairnessSql,

    // q312: EB shrinkage replayed — per-group cells, DECIMAL rate
    // moments over the group frame, identical MoM prior (ROUND 9) and
    // shrinkage shapes, null prior surfaced on degenerate variance.
    "q312_eb_shrinkage" ->
      """WITH cells AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |mom AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS g,
        |    CAST(SUM(CAST(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS DECIMAL(28,12))) AS DOUBLE) AS spp
        |  FROM cells),
        |pr AS (
        |  SELECT
        |    CASE WHEN v > 0 AND c > 0 THEN ROUND(m * c, 9) END AS alpha,
        |    CASE WHEN v > 0 AND c > 0 THEN ROUND((1.0 - m) * c, 9) END
        |      AS beta
        |  FROM (
        |    SELECT m, v, m * (1.0 - m) / v - 1.0 AS c FROM (
        |      SELECT sp / CAST(g AS DOUBLE) AS m,
        |        (spp - sp * sp / CAST(g AS DOUBLE)) /
        |          (CAST(g AS DOUBLE) - 1.0) AS v
        |      FROM mom WHERE g > 1)))
        |SELECT source, n, k,
        |  ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
        |  ROUND((CAST(k AS DOUBLE) + alpha) /
        |    (CAST(n AS DOUBLE) + alpha + beta), 6) AS shrunk_rate,
        |  ROUND(alpha, 6) AS alpha,
        |  ROUND(beta, 6) AS beta
        |FROM cells CROSS JOIN pr
        |ORDER BY source""".stripMargin,

    // q313: Wilcoxon signed-rank replayed — per-user DECIMAL paired
    // means, rounded-6 differences, zero drops, exclusive-prefix
    // midranks over |d|, identical W⁺/μ/σ shapes.
    "q313_wilcoxon_signed_rank" ->
      """WITH pk AS (
        |  SELECT user_id,
        |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS na,
        |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS nb,
        |    CAST(SUM(CASE WHEN event_type = 'click'
        |      THEN CAST(value AS DECIMAL(28,12)) END) AS DOUBLE) /
        |      COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS ma,
        |    CAST(SUM(CASE WHEN event_type = 'view'
        |      THEN CAST(value AS DECIMAL(28,12)) END) AS DOUBLE) /
        |      COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS mb
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
        |  GROUP BY user_id),
        |d AS (
        |  SELECT ROUND(ma - mb, 6) AS d, ABS(ROUND(ma - mb, 6)) AS absd
        |  FROM pk WHERE na > 0 AND nb > 0 AND ROUND(ma - mb, 6) <> 0.0),
        |g AS (
        |  SELECT absd, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM d GROUP BY absd),
        |r AS (
        |  SELECT absd,
        |    CAST(COALESCE(SUM(cnt) OVER (ORDER BY absd
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS DOUBLE) + (cnt + 1) / 2.0 AS midrank
        |  FROM g),
        |j AS (SELECT d.d, r.midrank FROM d JOIN r ON d.absd = r.absd),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CASE WHEN d > 0.0
        |      THEN CAST(midrank AS DECIMAL(28,1))
        |      ELSE CAST(0 AS DECIMAL(28,1)) END) AS DOUBLE) AS wplus,
        |    CAST(SUM(CAST(midrank * midrank AS DECIMAL(28,2)))
        |      AS DOUBLE) AS sr2
        |  FROM j)
        |SELECT n_pairs,
        |  ROUND(wplus, 6) AS w_plus,
        |  ROUND(CAST(n_pairs AS DOUBLE) *
        |    (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0, 6) AS mu,
        |  ROUND(SQRT(sr2 / 4.0), 6) AS sigma,
        |  CASE WHEN sr2 > 0.0 THEN
        |    ROUND((wplus - CAST(n_pairs AS DOUBLE) *
        |      (CAST(n_pairs AS DOUBLE) + 1.0) / 4.0) /
        |      SQRT(sr2 / 4.0), 6) END AS z
        |FROM agg WHERE n_pairs > 0""".stripMargin,


    // q310: POT/GPD replayed — exact milli-unit order statistic for the
    // threshold, DECIMAL excess moments, identical ξ/σ/return-level
    // shapes (exp∘ln for the power).
    "q310_pot_gpd_tail" ->
      """WITH v AS (
        |  SELECT CAST(CAST(value AS DECIMAL(28,3)) * 1000 AS BIGINT)
        |    AS v
        |  FROM events WHERE value IS NOT NULL),
        |g AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY v),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM g),
        |cum AS (
        |  SELECT v, c, SUM(c) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cm
        |  FROM g),
        |u AS (
        |  SELECT MIN(v) AS uv FROM cum CROSS JOIN t
        |  WHERE cm >= GREATEST(1, (19 * n) // 20)),
        |m AS (
        |  SELECT CAST(SUM(c) AS BIGINT) AS ne,
        |    CAST(SUM(CAST(CAST(c AS DOUBLE) *
        |      (CAST(v - uv AS DOUBLE) / 1000.0)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(CAST(c AS DOUBLE) *
        |      ((CAST(v - uv AS DOUBLE) / 1000.0) *
        |       (CAST(v - uv AS DOUBLE) / 1000.0))
        |      AS DECIMAL(28,12))) AS DOUBLE) AS syy,
        |    ANY_VALUE(uv) AS uv
        |  FROM g CROSS JOIN u WHERE g.v > u.uv),
        |a AS (
        |  SELECT n, ne, uv,
        |    sy / CAST(ne AS DOUBLE) AS mm,
        |    (syy - sy * sy / CAST(ne AS DOUBLE)) /
        |      (CAST(ne AS DOUBLE) - 1.0) AS s2
        |  FROM m CROSS JOIN t WHERE ne > 1),
        |f AS (
        |  SELECT n, ne, uv, mm, s2,
        |    0.5 * (1.0 - mm * mm / s2) AS xi
        |  FROM a),
        |f2 AS (
        |  SELECT n, ne, uv, mm, xi,
        |    mm * (1.0 - xi) AS sigma,
        |    CAST(ne AS DOUBLE) / (CAST(n AS DOUBLE) * 0.001) AS ratio
        |  FROM f)
        |SELECT n,
        |  ROUND(CAST(uv AS DOUBLE) / 1000.0, 6) AS threshold,
        |  ne AS n_exceed,
        |  ROUND(mm, 6) AS mean_excess,
        |  ROUND(xi, 6) AS xi,
        |  ROUND(sigma, 6) AS sigma,
        |  ROUND(CASE WHEN ABS(xi) > 1e-9 THEN
        |      CAST(uv AS DOUBLE) / 1000.0 +
        |        sigma / xi * (EXP(xi * LN(ratio)) - 1.0)
        |    ELSE CAST(uv AS DOUBLE) / 1000.0 + sigma * LN(ratio) END, 6)
        |    AS ret_level
        |FROM f2""".stripMargin,

    // q311: hash-collision sweep replayed — hexPoly15(MD5(term)) into
    // the two-round congruential draw (the q237 shape), bucket = draw
    // mod dim, identical per-dim rollup.
    "q311_hash_collision_sweep" -> q311HashCollisionSql,

    // q306: MMR replayed — the greedy loop unrolled as a CTE chain
    // (c0→p1→c1→…→p10), every selection on ROUND(0.7·rel − 0.3·ms, 6)
    // with the id tie-break, cosines in the proven list_inner_product
    // rounded-6 form. Generated by [[mmrOracleSql]].
    "q306_mmr_selection" -> mmrOracleSql(10),

    // q307: RAKE replayed — same \b-alternation stopword break (RE2
    // subset, 'g' flag), empty-token filter, degree/frequency word
    // scores, DECIMAL phrase sums, identical top-15 tie-break.
    "q307_rake_keywords" ->
      """WITH raw AS (
        |  SELECT UNNEST(string_split(regexp_replace(regexp_replace(
        |    lower(text), '[^a-z0-9 ]+', ' ', 'g'),
        |    '\b(the|a|and|of|to|in|is|for|on|with)\b', '|', 'g'), '|'))
        |    AS r
        |  FROM documents),
        |ph2 AS (
        |  SELECT toks, array_to_string(toks, ' ') AS phrase,
        |    CAST(len(toks) AS BIGINT) AS l
        |  FROM (SELECT list_filter(string_split(r, ' '),
        |      t -> t <> '') AS toks FROM raw)
        |  WHERE len(toks) BETWEEN 1 AND 4),
        |w AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
        |    CAST(SUM(l) AS BIGINT) AS deg
        |  FROM (SELECT UNNEST(toks) AS w, l FROM ph2) GROUP BY w),
        |dp AS (
        |  SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences,
        |    ANY_VALUE(toks) AS toks
        |  FROM ph2 GROUP BY phrase),
        |ex AS (
        |  SELECT phrase, n_occurrences, UNNEST(toks) AS tw FROM dp),
        |scored AS (
        |  SELECT phrase, n_occurrences,
        |    CAST(SUM(CAST(ws AS DECIMAL(28,12))) AS DOUBLE) AS score
        |  FROM (
        |    SELECT e.phrase, e.n_occurrences,
        |      CAST(w.deg AS DOUBLE) / CAST(w.freq AS DOUBLE) AS ws
        |    FROM ex e JOIN w ON w.w = e.tw)
        |  GROUP BY phrase, n_occurrences)
        |SELECT phrase, n_occurrences, ROUND(score, 6) AS rake_score
        |FROM scored
        |ORDER BY rake_score DESC, n_occurrences DESC, phrase
        |LIMIT 15""".stripMargin,

    // q308: Holt replayed — q290's zero-filled day spine, then the
    // level/trend recursion as a recursive CTE with ROUND(·,9) states
    // and exact-complement literals (0.3/0.7, 0.1/0.9).
    "q308_holt_smoothing" ->
      """WITH RECURSIVE counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) AS i,
        |    d.day AS day, CAST(COALESCE(c.x, 0) AS BIGINT) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |it(i, day, x, fitted, l, tr) AS (
        |  SELECT i, day, x, CAST(NULL AS DOUBLE),
        |    CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)
        |  FROM series WHERE i = 0
        |  UNION ALL
        |  SELECT s.i, s.day, s.x,
        |    it.l + it.tr,
        |    ROUND(0.3 * CAST(s.x AS DOUBLE) + 0.7 * (it.l + it.tr), 9),
        |    ROUND(0.1 * (ROUND(0.3 * CAST(s.x AS DOUBLE)
        |        + 0.7 * (it.l + it.tr), 9) - it.l) + 0.9 * it.tr, 9)
        |  FROM it JOIN series s ON s.i = it.i + 1)
        |SELECT day, x, ROUND(fitted, 6) AS fitted,
        |  ROUND(l, 6) AS level, ROUND(tr, 6) AS trend
        |FROM it ORDER BY day""".stripMargin,

    // q303: Huber IRLS replayed — the q189 recursive-CTE contract with
    // Huber weights/loss in place of the logistic ones: per-round
    // DECIMAL(28,12) weighted moments, round-9 weighted-LS params.
    "q303_huber_irls" ->
      """WITH RECURSIVE d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x,
        |    l_extendedprice / 1000.0 AS y
        |  FROM lineitem WHERE l_orderkey < 500),
        |it(i, b0, b1, hl) AS (
        |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
        |    CAST(NULL AS DOUBLE)
        |  UNION ALL
        |  SELECT i + 1,
        |    ROUND((swxx * swy - swx * swxy) / (sw * swxx - swx * swx), 9),
        |    ROUND((sw * swxy - swx * swy) / (sw * swxx - swx * swx), 9),
        |    lm
        |  FROM (
        |    SELECT i, b0, b1,
        |      CAST(SUM(CAST(w AS DECIMAL(28,12))) AS DOUBLE) AS sw,
        |      CAST(SUM(CAST(w * x AS DECIMAL(28,12))) AS DOUBLE) AS swx,
        |      CAST(SUM(CAST(w * y AS DECIMAL(28,12))) AS DOUBLE) AS swy,
        |      CAST(SUM(CAST(w * x * x AS DECIMAL(28,12))) AS DOUBLE)
        |        AS swxx,
        |      CAST(SUM(CAST(w * x * y AS DECIMAL(28,12))) AS DOUBLE)
        |        AS swxy,
        |      ROUND(CAST(SUM(CAST(loss AS DECIMAL(28,12))) AS DOUBLE)
        |        / COUNT(*), 6) AS lm
        |    FROM (
        |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, d.x AS x,
        |        d.y AS y,
        |        CASE WHEN ABS(d.y - (it.b0 + it.b1 * d.x)) <= 10.0
        |          THEN 1.0
        |          ELSE 10.0 / ABS(d.y - (it.b0 + it.b1 * d.x)) END AS w,
        |        CASE WHEN ABS(d.y - (it.b0 + it.b1 * d.x)) <= 10.0
        |          THEN (d.y - (it.b0 + it.b1 * d.x)) *
        |            (d.y - (it.b0 + it.b1 * d.x)) / 2.0
        |          ELSE 10.0 * (ABS(d.y - (it.b0 + it.b1 * d.x))
        |            - 10.0 / 2.0) END AS loss
        |      FROM it, d
        |      WHERE it.i < 8)
        |    GROUP BY i, b0, b1))
        |SELECT i AS iter, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
        |  hl AS huber_loss
        |FROM it WHERE i >= 1
        |ORDER BY iter""".stripMargin,

    // q304: linear SHAP replayed — one exact-decimal moment row, the
    // same centered 2×2 solve with ROUND(·,9) params and means, second
    // scan for the mean absolute deviations, identical share shapes.
    "q304_linear_shap" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2,
        |    l_extendedprice / 1000.0 AS y
        |  FROM lineitem),
        |mo AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS s11,
        |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS s22,
        |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS s12,
        |    CAST(SUM(CAST(x1 * y AS DECIMAL(28,12))) AS DOUBLE) AS s1y,
        |    CAST(SUM(CAST(x2 * y AS DECIMAL(28,12))) AS DOUBLE) AS s2y
        |  FROM d),
        |cen AS (
        |  SELECT n,
        |    s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
        |    s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
        |    s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
        |    s1y - s1 * sy / CAST(n AS DOUBLE) AS c1y,
        |    s2y - s2 * sy / CAST(n AS DOUBLE) AS c2y,
        |    ROUND(s1 / CAST(n AS DOUBLE), 9) AS m1,
        |    ROUND(s2 / CAST(n AS DOUBLE), 9) AS m2
        |  FROM mo),
        |fit AS (
        |  SELECT n, m1, m2,
        |    ROUND((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 9)
        |      AS b1,
        |    ROUND((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 9)
        |      AS b2
        |  FROM cen),
        |mad AS (
        |  SELECT
        |    CAST(SUM(CAST(ABS(x1 - m1) AS DECIMAL(28,12))) AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS mad1,
        |    CAST(SUM(CAST(ABS(x2 - m2) AS DECIMAL(28,12))) AS DOUBLE)
        |      / CAST(n AS DOUBLE) AS mad2,
        |    ANY_VALUE(b1) AS b1, ANY_VALUE(b2) AS b2
        |  FROM d CROSS JOIN fit GROUP BY n),
        |rows_out AS (
        |  SELECT 'l_quantity' AS feature, b1 AS b, mad1 AS mad,
        |    ABS(b1) * mad1 + ABS(b2) * mad2 AS tot FROM mad
        |  UNION ALL
        |  SELECT 'l_discount' AS feature, b2 AS b, mad2 AS mad,
        |    ABS(b1) * mad1 + ABS(b2) * mad2 AS tot FROM mad)
        |SELECT feature, ROUND(b, 6) AS coef,
        |  ROUND(ABS(b) * mad, 6) AS mean_abs_shap,
        |  ROUND(ABS(b) * mad / tot, 6) AS shap_share
        |FROM rows_out ORDER BY feature""".stripMargin,

    // q305: drop-column importance replayed — same moment row and
    // round-9 coefficients; full vs 1-feature R² in identical shapes.
    "q305_drop_column_importance" ->
      """WITH d AS (
        |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
        |    CAST(l_discount AS DOUBLE) AS x2,
        |    l_extendedprice / 1000.0 AS y
        |  FROM lineitem),
        |mo AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(x1 AS DECIMAL(28,12))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(x2 AS DECIMAL(28,12))) AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(x1 * x1 AS DECIMAL(28,12))) AS DOUBLE) AS s11,
        |    CAST(SUM(CAST(x2 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS s22,
        |    CAST(SUM(CAST(x1 * x2 AS DECIMAL(28,12))) AS DOUBLE) AS s12,
        |    CAST(SUM(CAST(x1 * y AS DECIMAL(28,12))) AS DOUBLE) AS s1y,
        |    CAST(SUM(CAST(x2 * y AS DECIMAL(28,12))) AS DOUBLE) AS s2y,
        |    CAST(SUM(CAST(y * y AS DECIMAL(28,12))) AS DOUBLE) AS syy
        |  FROM d),
        |cen AS (
        |  SELECT
        |    s11 - s1 * s1 / CAST(n AS DOUBLE) AS c11,
        |    s22 - s2 * s2 / CAST(n AS DOUBLE) AS c22,
        |    s12 - s1 * s2 / CAST(n AS DOUBLE) AS c12,
        |    s1y - s1 * sy / CAST(n AS DOUBLE) AS c1y,
        |    s2y - s2 * sy / CAST(n AS DOUBLE) AS c2y,
        |    syy - sy * sy / CAST(n AS DOUBLE) AS sst
        |  FROM mo),
        |fit AS (
        |  SELECT c11, c22, c12, c1y, c2y, sst,
        |    ROUND((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 9)
        |      AS b1,
        |    ROUND((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 9)
        |      AS b2
        |  FROM cen),
        |r2 AS (
        |  SELECT
        |    (b1 * c1y + b2 * c2y) / sst AS r2_full,
        |    (c1y / c11) * c1y / sst AS r2_only1,
        |    (c2y / c22) * c2y / sst AS r2_only2
        |  FROM fit)
        |SELECT 'l_quantity' AS dropped_feature,
        |  ROUND(r2_full, 6) AS r2_full,
        |  ROUND(r2_only2, 6) AS r2_without,
        |  ROUND(r2_full - r2_only2, 6) AS importance FROM r2
        |UNION ALL
        |SELECT 'l_discount' AS dropped_feature,
        |  ROUND(r2_full, 6) AS r2_full,
        |  ROUND(r2_only1, 6) AS r2_without,
        |  ROUND(r2_full - r2_only1, 6) AS importance FROM r2
        |ORDER BY dropped_feature""".stripMargin,

    // q300: DeLong replayed — midranks from exclusive prefix sums over
    // the distinct-score grid (combined / within-pos / within-neg, the
    // Spark midrank formula b + (c+1)/2), placement moments as
    // DECIMAL(28,12) sums, identical variance assembly shapes.
    "q300_delong_auc" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END
        |    AS label,
        |    (o_orderkey % 1000) / 1000.0 + o_totalprice / 1e6 AS score
        |  FROM orders),
        |g AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(label) AS BIGINT) AS pos
        |  FROM d GROUP BY score),
        |c AS (
        |  SELECT score, cnt, pos,
        |    COALESCE(SUM(cnt) OVER wb, 0) AS bg,
        |    COALESCE(SUM(pos) OVER wb, 0) AS bp,
        |    COALESCE(SUM(cnt - pos) OVER wb, 0) AS bn
        |  FROM g
        |  WINDOW wb AS (ORDER BY score
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
        |tot AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS n1,
        |    CAST(SUM(cnt - pos) AS BIGINT) AS n0 FROM g),
        |v AS (
        |  SELECT cnt, pos, n1, n0,
        |    (CAST(bg AS DOUBLE) + (cnt + 1) / 2.0 -
        |      (CAST(bp AS DOUBLE) + (pos + 1) / 2.0))
        |      / CAST(n0 AS DOUBLE) AS v10,
        |    1.0 - (CAST(bg AS DOUBLE) + (cnt + 1) / 2.0 -
        |      (CAST(bn AS DOUBLE) + (cnt - pos + 1) / 2.0))
        |      / CAST(n1 AS DOUBLE) AS v01
        |  FROM c CROSS JOIN tot),
        |s AS (
        |  SELECT n1, n0,
        |    CAST(SUM(CAST(CASE WHEN pos > 0
        |      THEN CAST(pos AS DOUBLE) * v10 ELSE 0.0 END
        |      AS DECIMAL(28,12))) AS DOUBLE) AS s10,
        |    CAST(SUM(CAST(CASE WHEN pos > 0
        |      THEN CAST(pos AS DOUBLE) * (v10 * v10) ELSE 0.0 END
        |      AS DECIMAL(28,12))) AS DOUBLE) AS s10sq,
        |    CAST(SUM(CAST(CASE WHEN cnt - pos > 0
        |      THEN CAST(cnt - pos AS DOUBLE) * v01 ELSE 0.0 END
        |      AS DECIMAL(28,12))) AS DOUBLE) AS s01,
        |    CAST(SUM(CAST(CASE WHEN cnt - pos > 0
        |      THEN CAST(cnt - pos AS DOUBLE) * (v01 * v01) ELSE 0.0 END
        |      AS DECIMAL(28,12))) AS DOUBLE) AS s01sq
        |  FROM v GROUP BY n1, n0),
        |a AS (
        |  SELECT n1, n0,
        |    s10 / CAST(n1 AS DOUBLE) AS auc10,
        |    (s10sq - CAST(n1 AS DOUBLE) *
        |      ((s10 / CAST(n1 AS DOUBLE)) * (s10 / CAST(n1 AS DOUBLE))))
        |      / (CAST(n1 AS DOUBLE) - 1.0) AS var10,
        |    (s01sq - CAST(n0 AS DOUBLE) *
        |      ((s01 / CAST(n0 AS DOUBLE)) * (s01 / CAST(n0 AS DOUBLE))))
        |      / (CAST(n0 AS DOUBLE) - 1.0) AS var01
        |  FROM s WHERE n1 > 1 AND n0 > 1),
        |f AS (
        |  SELECT n1, n0, auc10,
        |    SQRT(var10 / CAST(n1 AS DOUBLE) + var01 / CAST(n0 AS DOUBLE))
        |      AS se
        |  FROM a)
        |SELECT CAST(n1 + n0 AS BIGINT) AS n, n1 AS n_pos,
        |  ROUND(auc10, 6) AS auc,
        |  ROUND(se, 6) AS se_delong,
        |  ROUND(auc10 - 1.959963984540054 * se, 6) AS ci_lo,
        |  ROUND(auc10 + 1.959963984540054 * se, 6) AS ci_hi
        |FROM f""".stripMargin,

    // q301: average precision replayed — descending inclusive
    // cumulatives over the distinct-score grid equal Spark's
    // n1 − ascending-exclusive form exactly (BIGINTs), identical
    // per-threshold term shape, DECIMAL(28,12) sum.
    "q301_average_precision" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END
        |    AS label,
        |    (o_orderkey % 1000) / 1000.0 + o_totalprice / 1e6 AS score
        |  FROM orders),
        |g AS (
        |  SELECT score, CAST(COUNT(*) AS BIGINT) AS cnt,
        |    CAST(SUM(label) AS BIGINT) AS pos
        |  FROM d GROUP BY score),
        |tot AS (
        |  SELECT CAST(SUM(pos) AS BIGINT) AS n1,
        |    CAST(SUM(cnt - pos) AS BIGINT) AS n0 FROM g),
        |c AS (
        |  SELECT score, cnt, pos,
        |    SUM(pos) OVER wd AS tp,
        |    SUM(cnt - pos) OVER wd AS fp
        |  FROM g
        |  WINDOW wd AS (ORDER BY score DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT CAST(n1 + n0 AS BIGINT) AS n, n1 AS n_pos,
        |  ROUND(CAST(SUM(CAST(CASE WHEN pos > 0
        |    THEN (CAST(pos AS DOUBLE) / CAST(n1 AS DOUBLE)) *
        |      (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
        |    ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE), 6) AS pr_auc,
        |  ROUND(CAST(n1 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE), 6)
        |    AS prevalence
        |FROM c CROSS JOIN tot
        |WHERE n1 > 0
        |GROUP BY n1, n0""".stripMargin,

    // q302: Brier decomposition replayed — per-bin exact moments
    // (DECIMAL p / p² / p·y sums), fixed-shape per-bin terms with the
    // global mean joined in, DECIMAL term sums over the ≤20-bin frame.
    "q302_brier_decomposition" ->
      """WITH d AS (
        |  SELECT CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS y,
        |    (o_orderkey % 997) / 996.0 AS p
        |  FROM orders),
        |b AS (
        |  SELECT LEAST(19, CAST(FLOOR(p * 20) AS INTEGER)) AS bin, p, y
        |  FROM d),
        |pb AS (
        |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_k,
        |    CAST(SUM(y) AS BIGINT) AS sy_k,
        |    CAST(SUM(CAST(p AS DECIMAL(28,12))) AS DOUBLE) AS sp_k,
        |    CAST(SUM(CAST(p * p AS DECIMAL(28,12))) AS DOUBLE) AS spp_k,
        |    CAST(SUM(CAST(p * CAST(y AS DOUBLE) AS DECIMAL(28,12)))
        |      AS DOUBLE) AS spy_k
        |  FROM b GROUP BY bin),
        |gl AS (
        |  SELECT CAST(SUM(n_k) AS BIGINT) AS n,
        |    CAST(SUM(sy_k) AS BIGINT) AS sy,
        |    CAST(SUM(CAST(spp_k AS DECIMAL(28,12))) AS DOUBLE) AS spp,
        |    CAST(SUM(CAST(spy_k AS DECIMAL(28,12))) AS DOUBLE) AS spy
        |  FROM pb),
        |terms AS (
        |  SELECT n, sy, spp, spy,
        |    (CAST(n_k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ((sp_k / CAST(n_k AS DOUBLE) -
        |        CAST(sy_k AS DOUBLE) / CAST(n_k AS DOUBLE)) *
        |       (sp_k / CAST(n_k AS DOUBLE) -
        |        CAST(sy_k AS DOUBLE) / CAST(n_k AS DOUBLE))) AS rel,
        |    (CAST(n_k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ((CAST(sy_k AS DOUBLE) / CAST(n_k AS DOUBLE) -
        |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
        |       (CAST(sy_k AS DOUBLE) / CAST(n_k AS DOUBLE) -
        |        CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) AS res,
        |    (CAST(n_k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (spp_k / CAST(n_k AS DOUBLE) -
        |        (sp_k / CAST(n_k AS DOUBLE)) *
        |        (sp_k / CAST(n_k AS DOUBLE))) AS wvar,
        |    (CAST(n_k AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (spy_k / CAST(n_k AS DOUBLE) -
        |        (sp_k / CAST(n_k AS DOUBLE)) *
        |        (CAST(sy_k AS DOUBLE) / CAST(n_k AS DOUBLE))) AS wcov
        |  FROM pb CROSS JOIN gl),
        |agg AS (
        |  SELECT n, sy, spp, spy, CAST(COUNT(*) AS BIGINT) AS n_bins,
        |    CAST(SUM(CAST(rel AS DECIMAL(28,12))) AS DOUBLE) AS srel,
        |    CAST(SUM(CAST(res AS DECIMAL(28,12))) AS DOUBLE) AS sres,
        |    CAST(SUM(CAST(wvar AS DECIMAL(28,12))) AS DOUBLE) AS swvar,
        |    CAST(SUM(CAST(wcov AS DECIMAL(28,12))) AS DOUBLE) AS swcov
        |  FROM terms GROUP BY n, sy, spp, spy)
        |SELECT n, n_bins,
        |  ROUND((spp - 2.0 * spy + CAST(sy AS DOUBLE))
        |    / CAST(n AS DOUBLE), 6) AS brier,
        |  ROUND(srel, 6) AS reliability,
        |  ROUND(sres, 6) AS resolution,
        |  ROUND((CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) *
        |    (1.0 - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |    AS uncertainty,
        |  ROUND(swvar, 6) AS within_var,
        |  ROUND(swcov, 6) AS within_cov
        |FROM agg""".stripMargin,

    // q297: Wasserstein-1 replayed — same distinct-value grid, exact
    // cumulative counts, one fixed-shape double term per grid row
    // (|F_A−F_B|·gap), DECIMAL(28,12) term sum.
    "q297_wasserstein" ->
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
        |  SELECT v,
        |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b,
        |    LEAD(v) OVER (ORDER BY v) AS nv
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM g)
        |SELECT na AS n_a, nb AS n_b,
        |  ROUND(CAST(SUM(CAST(
        |    CASE WHEN nv IS NOT NULL THEN
        |      ABS(CAST(cum_a AS DOUBLE) / na - CAST(cum_b AS DOUBLE) / nb)
        |        * (nv - v)
        |    ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE), 6) AS w1
        |FROM c CROSS JOIN tot GROUP BY na, nb""".stripMargin,

    // q298: energy distance replayed — inclusive prefix counts and
    // DECIMAL(28,12)-quantized prefix value sums over the same grid,
    // strictly-below moments by subtracting the own-row term, identical
    // double shapes for the three pair-sum families.
    "q298_energy_distance" ->
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
        |    SUM(ca) OVER w AS cum_a, SUM(cb) OVER w AS cum_b,
        |    SUM(CAST(v * CAST(ca AS DOUBLE) AS DECIMAL(28,12))) OVER w
        |      AS cum_sa,
        |    SUM(CAST(v * CAST(cb AS DOUBLE) AS DECIMAL(28,12))) OVER w
        |      AS cum_sb
        |  FROM g
        |  WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (
        |  SELECT CAST(SUM(ca) AS BIGINT) AS na,
        |    CAST(SUM(cb) AS BIGINT) AS nb FROM g),
        |s AS (
        |  SELECT na, nb,
        |    CAST(SUM(CAST(
        |      CAST(ca AS DOUBLE) * (CAST(cum_a - ca AS DOUBLE) * v -
        |        CAST(cum_sa - CAST(v * CAST(ca AS DOUBLE)
        |          AS DECIMAL(28,12)) AS DOUBLE))
        |      AS DECIMAL(28,12))) AS DOUBLE) AS spa,
        |    CAST(SUM(CAST(
        |      CAST(cb AS DOUBLE) * (CAST(cum_b - cb AS DOUBLE) * v -
        |        CAST(cum_sb - CAST(v * CAST(cb AS DOUBLE)
        |          AS DECIMAL(28,12)) AS DOUBLE))
        |      AS DECIMAL(28,12))) AS DOUBLE) AS spb,
        |    CAST(SUM(CAST(
        |      CAST(ca AS DOUBLE) * (CAST(cum_b - cb AS DOUBLE) * v -
        |        CAST(cum_sb - CAST(v * CAST(cb AS DOUBLE)
        |          AS DECIMAL(28,12)) AS DOUBLE)) +
        |      CAST(cb AS DOUBLE) * (CAST(cum_a - ca AS DOUBLE) * v -
        |        CAST(cum_sa - CAST(v * CAST(ca AS DOUBLE)
        |          AS DECIMAL(28,12)) AS DOUBLE))
        |      AS DECIMAL(28,12))) AS DOUBLE) AS spx
        |  FROM c CROSS JOIN tot GROUP BY na, nb),
        |d AS (
        |  SELECT na, nb,
        |    spx / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS e_cross_raw,
        |    2.0 * (spx / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))) -
        |      (2.0 * spa) / (CAST(na AS DOUBLE) * CAST(na AS DOUBLE)) -
        |      (2.0 * spb) / (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE))
        |      AS d_raw
        |  FROM s)
        |SELECT na AS n_a, nb AS n_b,
        |  ROUND(e_cross_raw, 6) AS e_cross,
        |  ROUND(d_raw, 6) AS e_dist,
        |  ROUND(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) /
        |    (CAST(na AS DOUBLE) + CAST(nb AS DOUBLE)) * d_raw, 6) AS e_stat
        |FROM d""".stripMargin,

    // q299: log-rank replayed — q122's duration CTEs plus a parity
    // cohort, reverse-cumulative risk sets over the per-day frame,
    // hypergeometric expectation/variance in identical double shapes,
    // DECIMAL(28,12) term sums.
    "q299_log_rank" ->
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
        |    p.pu IS NOT NULL AS ev, s.user_id % 2 = 0 AS isa
        |  FROM s LEFT JOIN p ON s.user_id = p.user_id, h),
        |byt AS (
        |  SELECT t,
        |    CAST(SUM(CASE WHEN isa AND ev THEN 1 ELSE 0 END) AS BIGINT)
        |      AS da,
        |    CAST(SUM(CASE WHEN (NOT isa) AND ev THEN 1 ELSE 0 END)
        |      AS BIGINT) AS db,
        |    CAST(SUM(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT) AS ta,
        |    CAST(SUM(CASE WHEN isa THEN 0 ELSE 1 END) AS BIGINT) AS tb
        |  FROM d GROUP BY t),
        |risk AS (
        |  SELECT t, da, db,
        |    SUM(ta) OVER wr AS na, SUM(tb) OVER wr AS nb
        |  FROM byt
        |  WINDOW wr AS (ORDER BY t
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        |ev AS (SELECT * FROM risk WHERE da + db > 0),
        |agg AS (
        |  SELECT
        |    CAST(SUM(da) AS BIGINT) AS events_a,
        |    CAST(SUM(db) AS BIGINT) AS events_b,
        |    CAST(SUM(CAST(CAST(da AS DOUBLE) -
        |      CAST(da + db AS DOUBLE) * CAST(na AS DOUBLE) /
        |        CAST(na + nb AS DOUBLE)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS oma,
        |    CAST(SUM(CAST(
        |      CAST(da + db AS DOUBLE) * CAST(na AS DOUBLE) /
        |        CAST(na + nb AS DOUBLE)
        |      AS DECIMAL(28,12))) AS DOUBLE) AS ea,
        |    CAST(SUM(CAST(
        |      CASE WHEN na + nb > 1 THEN
        |        CAST(da + db AS DOUBLE) *
        |          (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE)) *
        |          (CAST(nb AS DOUBLE) / CAST(na + nb AS DOUBLE)) *
        |          ((CAST(na + nb AS DOUBLE) - CAST(da + db AS DOUBLE)) /
        |            (CAST(na + nb AS DOUBLE) - 1.0))
        |      ELSE 0.0 END AS DECIMAL(28,12))) AS DOUBLE) AS v
        |  FROM ev)
        |SELECT events_a, events_b,
        |  ROUND(ea, 6) AS expected_a,
        |  ROUND(oma, 6) AS obs_minus_exp_a,
        |  ROUND(v, 6) AS var_sum,
        |  CASE WHEN v > 0.0 THEN ROUND(oma * oma / v, 6) END AS chi2
        |FROM agg""".stripMargin,

    "q296_mix_diversity" ->
      """WITH s AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_s
        |  FROM documents WHERE source IS NOT NULL GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n FROM s),
        |terms AS (
        |  SELECT n, n_s,
        |    CAST((CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      LN(CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS DECIMAL(38,12)) AS h,
        |    CAST((CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      (CAST(n_s AS DOUBLE) / CAST(n AS DOUBLE))
        |      AS DECIMAL(38,12)) AS sp
        |  FROM s CROSS JOIN tot)
        |SELECT n AS n_docs, CAST(COUNT(*) AS BIGINT) AS n_sources,
        |  ROUND(-CAST(SUM(h) AS DOUBLE), 6) AS entropy,
        |  ROUND(EXP(-CAST(SUM(h) AS DOUBLE)), 6) AS effective_sources,
        |  ROUND(CAST(SUM(sp) AS DOUBLE), 6) AS simpson_index,
        |  ROUND(CAST(MAX(n_s) AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |    AS top_source_share
        |FROM terms GROUP BY n""".stripMargin,

    // q290: segmented trend replayed — q269's spine, exact prefix
    // moments in one window, identical per-candidate OLS shapes,
    // (rounded SSE, day) argmin.
    "q290_segmented_trend" ->
      """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT d.day, CAST(date_diff('day', b.lo, d.day) AS BIGINT)
        |    AS i, COALESCE(c.x, 0) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |pre AS (
        |  SELECT day, i, x,
        |    CAST(COUNT(*) OVER w AS BIGINT) AS p_n,
        |    SUM(x) OVER w AS p_x,
        |    SUM(CAST(x AS HUGEINT) * x) OVER w AS p_xx,
        |    SUM(i) OVER w AS p_i,
        |    SUM(CAST(i AS HUGEINT) * i) OVER w AS p_ii,
        |    SUM(CAST(i AS HUGEINT) * x) OVER w AS p_ix
        |  FROM series
        |  WINDOW w AS (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING
        |    AND CURRENT ROW)),
        |tot AS (
        |  SELECT MAX(p_n) AS tn, MAX(p_x) AS tx, MAX(p_xx) AS txx,
        |    MAX(p_i) AS ti, MAX(p_ii) AS tii, MAX(p_ix) AS tix
        |  FROM pre),
        |cand AS (
        |  SELECT * FROM pre CROSS JOIN tot
        |  WHERE p_n >= 2 AND tn - p_n >= 2),
        |s1 AS (
        |  SELECT day, tn,
        |    CAST(p_ii AS DOUBLE) - CAST(p_i AS DOUBLE) *
        |      CAST(p_i AS DOUBLE) / CAST(p_n AS DOUBLE) AS denl,
        |    CAST(p_ix AS DOUBLE) - CAST(p_i AS DOUBLE) *
        |      CAST(p_x AS DOUBLE) / CAST(p_n AS DOUBLE) AS numl,
        |    CAST(p_xx AS DOUBLE) - CAST(p_x AS DOUBLE) *
        |      CAST(p_x AS DOUBLE) / CAST(p_n AS DOUBLE) AS sstl,
        |    CAST(tii - p_ii AS DOUBLE) - CAST(ti - p_i AS DOUBLE) *
        |      CAST(ti - p_i AS DOUBLE) / CAST(tn - p_n AS DOUBLE) AS denr,
        |    CAST(tix - p_ix AS DOUBLE) - CAST(ti - p_i AS DOUBLE) *
        |      CAST(tx - p_x AS DOUBLE) / CAST(tn - p_n AS DOUBLE) AS numr,
        |    CAST(txx - p_xx AS DOUBLE) - CAST(tx - p_x AS DOUBLE) *
        |      CAST(tx - p_x AS DOUBLE) / CAST(tn - p_n AS DOUBLE) AS sstr,
        |    CAST(tii AS DOUBLE) - CAST(ti AS DOUBLE) *
        |      CAST(ti AS DOUBLE) / CAST(tn AS DOUBLE) AS dent,
        |    CAST(tix AS DOUBLE) - CAST(ti AS DOUBLE) *
        |      CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE) AS numt,
        |    CAST(txx AS DOUBLE) - CAST(tx AS DOUBLE) *
        |      CAST(tx AS DOUBLE) / CAST(tn AS DOUBLE) AS sstt
        |  FROM cand),
        |s2 AS (
        |  SELECT day, tn AS n_days,
        |    ROUND(numl / denl, 6) AS slope_left,
        |    ROUND(numr / denr, 6) AS slope_right,
        |    ROUND((sstl - (numl / denl) * (numl / denl) * denl) +
        |      (sstr - (numr / denr) * (numr / denr) * denr), 6) AS sse_two,
        |    ROUND(sstt - (numt / dent) * (numt / dent) * dent, 6)
        |      AS sse_single
        |  FROM s1)
        |SELECT n_days, day AS breakpoint_day, slope_left, slope_right,
        |  sse_single, sse_two,
        |  ROUND(CASE WHEN sse_single > 0.0 THEN
        |    (sse_single - sse_two) / sse_single END, 6)
        |    AS sse_reduction_frac
        |FROM s2 ORDER BY sse_two, day LIMIT 1""".stripMargin,

    // q291: pairwise rank matrix replayed — zero-filled per-group
    // cumulative counts on the shared value spine, one spine self-join
    // for every pair's doubled rank sums, shared normal-tail polynomial,
    // BH ranking on the pair frame.
    "q291_pairwise_rank_matrix" ->
      """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |bvg AS (SELECT v, g, CAST(COUNT(*) AS BIGINT) AS c
        |        FROM d GROUP BY v, g),
        |spine AS (SELECT DISTINCT v FROM bvg),
        |gs AS (SELECT DISTINCT g FROM bvg),
        |full_f AS (
        |  SELECT s.v, gr.g, COALESCE(b.c, 0) AS c
        |  FROM spine s CROSS JOIN gs gr
        |  LEFT JOIN bvg b ON b.v = s.v AND b.g = gr.g),
        |f AS (
        |  SELECT v, g, c,
        |    CAST(SUM(c) OVER (PARTITION BY g ORDER BY v ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND CURRENT ROW) - c AS BIGINT) AS prev
        |  FROM full_f),
        |pr AS (
        |  SELECT a.v, a.g AS g_a, a.c AS ca, a.prev AS pa,
        |    b.g AS g_b, b.c AS cb, b.prev AS pb
        |  FROM f a JOIN f b ON a.v = b.v AND a.g < b.g),
        |agg AS (
        |  SELECT g_a, g_b,
        |    CAST(SUM(ca) AS BIGINT) AS n_a,
        |    CAST(SUM(cb) AS BIGINT) AS n_b,
        |    CAST(SUM(CAST(cb AS HUGEINT) *
        |      (CAST(pa + pb AS HUGEINT) * 2 + (ca + cb) + 1))
        |      AS HUGEINT) AS r2b,
        |    CAST(SUM(CAST(ca + cb AS HUGEINT) * (ca + cb) * (ca + cb)
        |      - (ca + cb)) AS HUGEINT) AS ties
        |  FROM pr GROUP BY g_a, g_b
        |  HAVING SUM(ca) > 0 AND SUM(cb) > 0),
        |zs AS (
        |  SELECT g_a, g_b, n_a, n_b,
        |    ((CAST(r2b AS DOUBLE) - CAST(n_b AS DOUBLE) *
        |      (CAST(n_b AS DOUBLE) + 1.0)) / 2.0 -
        |      CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 2.0) /
        |    SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
        |      ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0) -
        |        CAST(ties AS DOUBLE) /
        |        ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
        |          (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))))
        |      AS zraw,
        |    SQRT(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0 *
        |      ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) + 1.0) -
        |        CAST(ties AS DOUBLE) /
        |        ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)) *
        |          (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - 1.0))))
        |      AS sigma
        |  FROM agg),
        |ps AS (
        |  SELECT g_a, g_b, n_a, n_b, ROUND(zraw, 6) AS z,
        |    ROUND(2.0 * (EXP(-ABS(zraw) * ABS(zraw) / 2.0) /
        |      2.5066282746310002) *
        |      ((1.0 / (1.0 + 0.2316419 * ABS(zraw))) * (0.319381530 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(zraw))) * (-0.356563782 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(zraw))) * (1.781477937 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(zraw))) * (-1.821255978 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(zraw))) * 1.330274429))))),
        |      9) AS p_value
        |  FROM zs WHERE sigma > 0.0),
        |rk AS (
        |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_value, g_a, g_b)
        |      AS BIGINT) AS rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m
        |  FROM ps),
        |crit AS (
        |  SELECT *, ROUND(0.05 * CAST(rank AS DOUBLE) /
        |    CAST(m AS DOUBLE), 9) AS bh_critical
        |  FROM rk),
        |k AS (
        |  SELECT COALESCE(MAX(CASE WHEN p_value <= bh_critical
        |    THEN rank END), 0) AS kstar
        |  FROM crit)
        |SELECT g_a, g_b, n_a, n_b, z, p_value, rank, bh_critical,
        |  rank <= k.kstar AS rejected
        |FROM crit CROSS JOIN k
        |ORDER BY rank""".stripMargin,

    // q270: Wilson intervals replayed — exact n/k counts, shared z
    // literal, identical center/half parenthesization.
    "q270_wilson_intervals" ->
      """WITH g AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
        |      AS BIGINT) AS k
        |  FROM orders GROUP BY o_orderpriority),
        |w AS (
        |  SELECT o_orderpriority, n, k,
        |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
        |    CAST(n AS DOUBLE) AS nd,
        |    1.959964 * 1.959964 AS zz
        |  FROM g),
        |c AS (
        |  SELECT o_orderpriority, n, k, p,
        |    (p + zz / (2.0 * nd)) / (1.0 + zz / nd) AS center,
        |    1.959964 * SQRT(p * (1.0 - p) / nd + zz / (4.0 * nd * nd)) /
        |      (1.0 + zz / nd) AS half
        |  FROM w)
        |SELECT o_orderpriority, n, k,
        |  ROUND(p, 6) AS p_hat,
        |  ROUND(center - half, 6) AS ci_lo,
        |  ROUND(center + half, 6) AS ci_hi,
        |  ROUND(2.0 * half, 6) AS ci_width
        |FROM c ORDER BY o_orderpriority""".stripMargin,

    // q271: Cramér/Tschuprow replayed — q100's decimal-contribution χ²
    // plus the normalized effect sizes in identical double shapes.
    "q271_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type AS r, user_id % 7 AS c,
        |    CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY r, c),
        |rm AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rm FROM cells GROUP BY r),
        |cm AS (SELECT c, CAST(SUM(o) AS BIGINT) AS cm FROM cells GROUP BY c),
        |nn AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT r) AS BIGINT) AS nr,
        |  CAST(COUNT(DISTINCT c) AS BIGINT) AS nc FROM cells),
        |grid AS (
        |  SELECT rm.r, cm.c, rm.rm, cm.cm, COALESCE(cells.o, 0) AS o
        |  FROM rm CROSS JOIN cm
        |  LEFT JOIN cells ON rm.r = cells.r AND cm.c = cells.c),
        |a AS (
        |  SELECT MAX(n) AS n, MAX(nr) AS n_rows_cat, MAX(nc) AS n_cols_cat,
        |    CAST(SUM(CAST((o - e) * (o - e) / e AS DECIMAL(28,10)))
        |      AS DOUBLE) AS chi2
        |  FROM (
        |    SELECT grid.o, (grid.rm * grid.cm) / CAST(nn.n AS DOUBLE) AS e,
        |      nn.n, nn.nr, nn.nc
        |    FROM grid CROSS JOIN nn))
        |SELECT n, n_rows_cat, n_cols_cat,
        |  (n_rows_cat - 1) * (n_cols_cat - 1) AS dof,
        |  ROUND(chi2, 6) AS chi2,
        |  ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) *
        |    (LEAST(CAST(n_rows_cat AS DOUBLE), CAST(n_cols_cat AS DOUBLE))
        |      - 1.0))), 6) AS cramers_v,
        |  ROUND(SQRT(chi2 / (CAST(n AS DOUBLE) *
        |    SQRT((CAST(n_rows_cat AS DOUBLE) - 1.0) *
        |      (CAST(n_cols_cat AS DOUBLE) - 1.0)))), 6) AS tschuprow_t
        |FROM a WHERE n_rows_cat > 1 AND n_cols_cat > 1""".stripMargin,

    // q266: Welch's t replayed — identical per-row decimal moment casts
    // (value DECIMAL(28,2), square DECIMAL(38,4)), identical double
    // parenthesization for mean/variance/t/Satterthwaite df.
    // q275 shares it verbatim: the streamed moment frame is additive
    // state that equals the batch moments exactly (stream ≡ batch).
    "q266_welch_t" -> q266WelchSql,
    "q275_stream_welch" -> q266WelchSql,

    // q278: dow seasonality replayed — epoch-day weekday arithmetic,
    // exact decimal daily masses, ANOVA-identity SS terms with decimal
    // square contributions on identical doubles.
    "q278_seasonal_dow" ->
      """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS td
        |  FROM events WHERE value IS NOT NULL GROUP BY day),
        |dd AS (
        |  SELECT day, td,
        |    CAST((date_diff('day', DATE '1970-01-01', day) + 3) % 7
        |      AS BIGINT) AS dow
        |  FROM d),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS dcount,
        |    CAST(SUM(td) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(CAST(td AS DOUBLE) * CAST(td AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS q
        |  FROM dd),
        |pw AS (
        |  SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(td) AS DOUBLE) AS sw
        |  FROM dd GROUP BY dow),
        |pw2 AS (
        |  SELECT dow, n_days, sw / CAST(n_days AS DOUBLE) AS mw FROM pw),
        |ssb AS (
        |  SELECT CAST(SUM(CAST(CAST(n_days AS DOUBLE) * mw * mw
        |    AS DECIMAL(38,6))) AS DOUBLE) AS ssbraw
        |  FROM pw2)
        |SELECT dow, n_days, ROUND(mw, 6) AS mean_mass,
        |  ROUND(mw / (s / CAST(dcount AS DOUBLE)), 6) AS seasonal_index,
        |  ROUND((ssbraw - CAST(dcount AS DOUBLE) *
        |      (s / CAST(dcount AS DOUBLE)) * (s / CAST(dcount AS DOUBLE))) /
        |    (q - CAST(dcount AS DOUBLE) *
        |      (s / CAST(dcount AS DOUBLE)) * (s / CAST(dcount AS DOUBLE))),
        |    6) AS strength
        |FROM pw2 CROSS JOIN tot CROSS JOIN ssb
        |ORDER BY dow""".stripMargin,

    // q279: embedding outliers replayed — q247's dim-explode shape,
    // round-9 per-dim stats, decimal term sums per vector, (D² DESC,
    // id) top-10.
    "q279_embedding_outliers" ->
      """WITH dims AS (
        |  SELECT vec_id, u.s.d AS d, u.s.v AS v
        |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |        FROM embeddings),
        |    UNNEST(list_transform(emb,
        |      (x, i) -> struct_pack(d := i - 1, v := x))) AS u(s)),
        |st AS (
        |  SELECT d, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(v AS DECIMAL(28,12))) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(v * v AS DECIMAL(38,16))) AS DOUBLE) AS q
        |  FROM dims GROUP BY d HAVING COUNT(*) > 1),
        |pp AS (
        |  SELECT d, ROUND(s / CAST(n AS DOUBLE), 9) AS mu,
        |    ROUND(GREATEST((q - s * s / CAST(n AS DOUBLE)) /
        |      (CAST(n AS DOUBLE) - 1.0), 0.000000001), 9) AS vr
        |  FROM st),
        |sc AS (
        |  SELECT dims.vec_id, CAST(COUNT(*) AS BIGINT) AS n_dims,
        |    CAST(SUM(CAST(((v - mu) * (v - mu)) / vr AS DECIMAL(38,12)))
        |      AS DOUBLE) AS d2
        |  FROM dims JOIN pp USING (d) GROUP BY dims.vec_id)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY d2 DESC, vec_id)
        |    AS BIGINT) AS rank,
        |  vec_id, n_dims, ROUND(d2, 6) AS mahalanobis2,
        |  ROUND(d2 / CAST(n_dims AS DOUBLE), 6) AS score_per_dim
        |FROM sc ORDER BY d2 DESC, vec_id LIMIT 10""".stripMargin,

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
        |    GREATEST(8, CAST(CEIL(COUNT(*) OVER () / 640.0) AS BIGINT))),
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
  ) ++ sqlSurface

  /** Shared by q63 (DataFrame as-of join) and q409 (its SQL-text twin,
    * which emulates the as-of with a union-ordered carry-forward window):
    * DuckDB's native ASOF LEFT JOIN after the same per-(user, ts) click
    * collapse.
    */
  private def asofSql: String =
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
  private def retentionSql: String =
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
  private def profileSql: String =
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
  private def textQualitySql: String =
    """WITH t AS (SELECT doc_id, string_split(trim(text), ' ') AS toks FROM documents)
      |SELECT doc_id,
      |  CAST(len(toks) AS BIGINT) AS n_tokens,
      |  ROUND(len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE), 6) AS stop_ratio,
      |  ROUND(LEAST(len(toks) / 100.0, 1.0) * (1.0 - len(list_filter(toks, x -> x = 'the' OR x = 'a')) / CAST(len(toks) AS DOUBLE)), 6) AS quality_score
      |FROM t
      |ORDER BY doc_id""".stripMargin

  /** Shared by q112 (DataFrame skew report) and q417 (SQL text). */
  private def skewReportSql: String =
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
  private def q407CartTreeSql: String = {
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
  private def hexPoly10(hcol: String): String =
    (1 to 10).map(i =>
      s"(STRPOS('0123456789abcdef', SUBSTRING($hcol, $i, 1)) - 1) * ${BigInt(16).pow(10 - i)}")
      .mkString("(", "\n      + ", ")")

  /** Shared CTE prelude: the gap-filled (i, x) daily event-count spine
    * (exact zero counts on missing days) — the DuckDB replay of
    * `TimeSeriesOps.dailyCountSeries`.
    */
  private def dailySeriesCtes: String =
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

  /** q357/q358 shared oracle: the AMS/count-sketch counter matrix and
    * F2 card replayed — batch and streaming builds produce the SAME
    * additive counters, so one SQL serves both.
    */
  private def amsF2Sql: String = {
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

  private def pageHinkleySql: String =
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

  private def seasonalDecompositionSql: String =
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

  private def hexPoly15(hcol: String): String =
    (1 to 15).map(i =>
      s"(STRPOS('0123456789abcdef', SUBSTRING($hcol, $i, 1)) - 1) * ${BigInt(16).pow(15 - i)}")
      .mkString("(", "\n      + ", ")")

  /** Value of the 7-hex-digit slice of digest `hcol` for depth `d`
    * (chars 1+7d .. 7+7d, 1-based) — the Spark side's
    * `conv(substring(md5(term), 1+7d, 7), 16, 10)`.
    */
  private def hexPolySlice7(hcol: String, d: Int): String =
    (0 until 7).map(i =>
      s"(STRPOS('0123456789abcdef', SUBSTRING($hcol, ${1 + 7 * d + i}, 1)) - 1) * ${BigInt(16).pow(6 - i)}")
      .mkString("(", "\n      + ", ")")

  /** q206 oracle: the portable Bloom filter replayed — per-key bit
    * positions from the same 7-hex MD5 slices, filter = DISTINCT position
    * set of the build keys, pass = all distinct probe positions present,
    * card vs exact membership.
    */
  private def q206BloomSql: String = {
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
  private def q207ContaminationSql: String =
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
  private def q210CorrSql: String = {
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
  private def q214LabelPropSql: String = {
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
       |    GREATEST(8, CAST(CEIL(COUNT(*) OVER () / 640.0) AS BIGINT))),
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
  private def q216IncrementalDedupSql: String = {
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
  private def q227IngestDedupSql: String = {
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

  /** q228 oracle: IVFADC replayed — q182's coarse draw/assignment/probes,
    * q193's salt-shifted anchor draw and subspace slices, per-(vector,
    * subspace) argmin coding, the asymmetric query-to-anchor lookup
    * table, and the decimal lookup-sum ranking.
    */
  private def q228IvfAdcSql: String =
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
  private def q229IvfAdcRerankSql: String = {
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

  /** Shared CTE chain of q228/q229: draws, coarse assignment, PQ coding,
    * probe pruning, the asymmetric lookup table, and the per-candidate
    * decimal lookup sum (`cand`).
    */
  private def ivfAdcCoreCtes: String = {
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

  /** q219 oracle: farthest-point traversal unrolled (the q194 chained-CTE
    * convention) — portable-draw seed, per-step argmax by (mind DESC, id),
    * LEAST min-distance update with the identical rounded-cosine
    * distance.
    */
  private def q219KCenterSql: String = {
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
  private def q225VerifiedPairsSql: String = {
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
  private def q212PerplexitySql: String =
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
  private def cmsBucketArms(src: String, termExpr: String, cntCol: String,
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
  private def q123CmsSql: String = {
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
  private def q136CmsSql: String = {
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
  private def q159FingerprintSql: String = {
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
  private def q161Bm25Sql: String =
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
  private def q162HllSql: String = {
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
  private def q190HllIntersectSql: String = {
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
  private def q163LshSql: String =
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
  private def q164EwmaSql: String = {
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
  private def q166RrfSql: String =
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
  private def q165ChunkSql: String =
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

  private def q160CurationSql: String = {
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
  private def q27MinhashSql: String = {
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
  private def q28SimhashSql: String = {
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

  private def sqlSurface: Map[String, String] = Map(
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

  /** Shared by q16 (DataFrame side) and q153 (SQL-text side): brute-force
    * cosine top-10 of query vector 0, DuckDB's list_inner_product playing
    * the role of the native vec_cosine expression.
    */
  private def knnTopkSql: String =
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

  private def sessionizeSql: String =
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

  private def psiSql: String =
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

  /** q118's oracle: the identical fixed-point BIGINT PageRank, the
    * `iterations` rounds UNROLLED as chained CTEs (standard SQL forbids
    * aggregation inside a recursive CTE member, and unrolling needs no
    * recursion at all). Every arithmetic step — `* 85 // 100`, `// deg`,
    * the `150000000000` teleport base — matches
    * [[graft.operators.GraphOps.pageRankFixedPoint]] literally; integer
    * math is associative, so the two engines cannot drift.
    */
  private def pageRankSql(iterations: Int): String = {
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
  private def textRankOracleSql(iterations: Int): String = {
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
  private def keynessSql: String =
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
  private def kCoreOracleSql(k: Int, rounds: Int): String = {
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
  private def q198WinnowingSql: String = {
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
  private def ivfPortableSql: String =
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

  private def logBinQuantileSql: String =
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
  private def q200MlpForwardSql: String = {
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
  private def q194BoostedStumpsSql: String = {
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
  private def piiCardSql: String =
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

  /** q232 oracle: the full hashed-vocabulary multinomial NB replay —
    * 60-bit MD5 polynomial token hash mod 512 (the q207 convention),
    * add-one smoothing over the CONSTANT bucket space (V = 512), exact
    * DECIMAL(28,12) score sums plus one double add of the log prior,
    * argmax with class tiebreak, prior-argmax fallback for token-empty
    * eval docs, truth x prediction confusion.
    */
  private def q232NbLangSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, lang, string_split(TRIM(text), ' ') AS toks,
       |    ((doc_id % 1000003) * 2654435761) % 20 AS sb
       |  FROM documents),
       |tok0 AS (
       |  SELECT doc_id, lang, sb, MD5(u.token) AS h
       |  FROM dt, UNNEST(toks) AS u(token)
       |  WHERE u.token <> ''),
       |tok AS (
       |  SELECT doc_id, lang, sb, ${hexPoly15("h")} % 512 AS b
       |  FROM tok0),
       |tc AS (
       |  SELECT lang AS cls, b, COUNT(*) AS c
       |  FROM tok WHERE sb >= 4 GROUP BY lang, b),
       |lt AS (
       |  SELECT cls, CAST(SUM(c) AS BIGINT) AS n_tok FROM tc GROUP BY cls),
       |ntr AS (SELECT COUNT(*) AS n FROM dt WHERE sb >= 4),
       |pr AS (
       |  SELECT lang AS cls, COUNT(*) AS n_docs_l
       |  FROM dt WHERE sb >= 4 GROUP BY lang),
       |classes AS (
       |  SELECT pr.cls,
       |    LN(CAST(pr.n_docs_l AS DOUBLE) / CAST(ntr.n AS DOUBLE))
       |      AS ln_prior,
       |    LN(1.0 / (CAST(COALESCE(lt.n_tok, 0) AS DOUBLE) + 512.0))
       |      AS ln_unseen
       |  FROM pr LEFT JOIN lt USING (cls), ntr),
       |model AS (
       |  SELECT tc.cls, tc.b,
       |    LN((CAST(tc.c AS DOUBLE) + 1.0) /
       |      (CAST(lt.n_tok AS DOUBLE) + 512.0)) AS ln_p
       |  FROM tc JOIN lt USING (cls)),
       |ec AS (
       |  SELECT doc_id, b, COUNT(*) AS cnt
       |  FROM tok WHERE sb < 4 GROUP BY doc_id, b),
       |sc AS (
       |  SELECT ec.doc_id, classes.cls,
       |    classes.ln_prior + CAST(SUM(CAST(
       |      COALESCE(model.ln_p, classes.ln_unseen) *
       |      CAST(cnt AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS score
       |  FROM ec CROSS JOIN classes
       |  LEFT JOIN model ON model.cls = classes.cls AND model.b = ec.b
       |  GROUP BY ec.doc_id, classes.cls, classes.ln_prior,
       |    classes.ln_unseen),
       |pk AS (
       |  SELECT doc_id, cls AS pred_lang,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cls ASC) AS rn
       |  FROM sc),
       |ed AS (SELECT doc_id, lang FROM dt WHERE sb < 4),
       |pp AS (
       |  SELECT cls AS prior_pred FROM classes
       |  ORDER BY ln_prior DESC, cls ASC LIMIT 1)
       |SELECT ed.lang,
       |  COALESCE(pk1.pred_lang, pp.prior_pred) AS pred_lang,
       |  COUNT(*) AS n_docs
       |FROM ed
       |LEFT JOIN (SELECT doc_id, pred_lang FROM pk WHERE rn = 1) pk1
       |  USING (doc_id), pp
       |GROUP BY ed.lang, COALESCE(pk1.pred_lang, pp.prior_pred)
       |ORDER BY lang, pred_lang""".stripMargin

  /** Shared q234/q235 CTE chain: the word-frequency table as
    * chr(31)-delimited symbol strings (chars + a '</w>' marker), then
    * `rounds` unrolled BPE rounds — pair counts from adjacent symbols
    * (overlaps included), argmax with (count desc, left, right)
    * tiebreak, and the greedy left-to-right merge as a list_reduce fold
    * (merge fires only when the accumulated string's LAST token equals
    * the winning left and the next symbol equals the winning right —
    * token-exact because the separator cannot occur inside symbols).
    * Mirrors the Spark side's `aggregate` fold element-for-element.
    */
  private def bpeRoundsCte(rounds: Int): String = {
    val base =
      """WITH dt AS (
        |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks
        |  FROM documents),
        |wc AS (
        |  SELECT u.token AS w, COUNT(*) AS cnt
        |  FROM dt, UNNEST(toks) AS u(token)
        |  WHERE u.token <> '' GROUP BY u.token),
        |w0 AS (
        |  SELECT cnt, array_to_string(list_transform(range(1, len(w) + 1),
        |    i -> substring(w, i, 1)), chr(31)) || chr(31) || '</w>' AS s
        |  FROM wc)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s""",p$i AS (
         |  SELECT u.p.l AS l, u.p.r AS r, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM w${i - 1}, UNNEST(list_transform(
         |    range(1, len(string_split(s, chr(31)))), j ->
         |    struct_pack(l := string_split(s, chr(31))[j],
         |      r := string_split(s, chr(31))[j + 1]))) AS u(p)
         |  GROUP BY u.p.l, u.p.r),
         |b$i AS (
         |  SELECT l AS bl, r AS br, c FROM p$i
         |  ORDER BY c DESC, l, r LIMIT 1),
         |w$i AS (
         |  SELECT cnt, list_reduce(string_split(s, chr(31)), (acc, x) ->
         |    CASE WHEN x = b.br AND (acc = b.bl OR
         |      ends_with(acc, chr(31) || b.bl))
         |    THEN acc || b.br ELSE acc || chr(31) || x END) AS s
         |  FROM w${i - 1}, b$i b),
         |n$i AS (
         |  SELECT CAST(SUM(cnt * len(string_split(s, chr(31)))) AS BIGINT)
         |    AS n FROM w$i)""".stripMargin
    }.mkString
    base + steps
  }

  /** q234 oracle: the merge table — one UNION arm per unrolled round. */
  private def q234BpeTrainSql: String = {
    val rounds = 8
    val arms = (1 to rounds).map { i =>
      s"""  SELECT $i AS merge_round, bl AS left_sym, br AS right_sym,
         |    bl || br AS merged, c AS pair_count,
         |    (SELECT n FROM n$i) AS n_symbols_after
         |  FROM b$i""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""${bpeRoundsCte(rounds)}
       |SELECT CAST(merge_round AS BIGINT) AS merge_round, left_sym,
       |  right_sym, merged, pair_count, n_symbols_after
       |FROM (
       |$arms)
       |ORDER BY merge_round""".stripMargin
  }

  /** Shared q235/q243 encode chain: q234's trained rounds, then every
    * document's words encoded by replaying the folds in merge order —
    * the per-word delimited subword string is what finishing selects
    * aggregate (the Spark side joins with the same separator). Callers
    * must select FROM the final fold relation [[bpeEncodeFinal]] — the
    * name is derived from the same rounds count so the two can't drift.
    */
  // defs, not vals: the oracles map is a val declared earlier in this
  // object and evaluates these during object init — a val here would
  // still be 0 at that point (init order), silently emitting 0 rounds
  private def bpeEncodeRounds: Int = 8
  private def bpeEncodeFinal: String = s"e$bpeEncodeRounds"
  private def bpeEncodeCtes(rounds: Int): String = {
    val base =
      s"""${bpeRoundsCte(rounds)},
         |e0 AS (
         |  SELECT doc_id, array_to_string(list_transform(
         |    range(1, len(u.token) + 1),
         |    i -> substring(u.token, i, 1)), chr(31)) ||
         |    chr(31) || '</w>' AS s
         |  FROM dt, UNNEST(toks) AS u(token)
         |  WHERE u.token <> '')""".stripMargin
    val folds = (1 to rounds).map { i =>
      s""",e$i AS (
         |  SELECT doc_id, list_reduce(string_split(s, chr(31)), (acc, x) ->
         |    CASE WHEN x = b.br AND (acc = b.bl OR
         |      ends_with(acc, chr(31) || b.bl))
         |    THEN acc || b.br ELSE acc || chr(31) || x END) AS s
         |  FROM e${i - 1}, b$i b)""".stripMargin
    }.mkString
    base + folds
  }

  private def q235BpeEncodeSql: String =
    s"""${bpeEncodeCtes(bpeEncodeRounds)}
       |SELECT doc_id AS id, COUNT(*) AS n_words,
       |  CAST(SUM(len(string_split(s, chr(31)))) AS BIGINT)
       |    AS n_subwords,
       |  CAST(SUM(${hexPoly15("MD5(s)")} % 1000000007) AS BIGINT)
       |    AS encoding_fp
       |FROM $bpeEncodeFinal
       |GROUP BY doc_id
       |ORDER BY id""".stripMargin

  /** q243 oracle: the shared encode chain aggregated per LANGUAGE —
    * subwords-per-word fertility with the fixed double division.
    */
  private def q243BpeFertilitySql: String =
    s"""${bpeEncodeCtes(bpeEncodeRounds)},
       |pd AS (
       |  SELECT doc_id, COUNT(*) AS n_words,
       |    CAST(SUM(len(string_split(s, chr(31)))) AS BIGINT)
       |      AS n_subwords
       |  FROM $bpeEncodeFinal GROUP BY doc_id)
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(pd.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(pd.n_subwords) AS BIGINT) AS n_subwords,
       |  ROUND(CAST(SUM(pd.n_subwords) AS DOUBLE) /
       |    CAST(SUM(pd.n_words) AS DOUBLE), 6) AS fertility
       |FROM pd JOIN documents d USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin

  /** q242 oracle: the epoch permutation replayed — two-round draw with
    * salt = epoch, shard by clock, within-shard rank by (clock, id),
    * position-weighted 60-bit hash sum as the order fingerprint.
    */
  private def q242EpochShardsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(TRIM(text), ' ')) AS BIGINT) AS tok
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, tok,
       |    (((((((doc_id + 1) % 1000003) * 2654435761) % 1000003)
       |      + (doc_id // 1000003)) % 9999991) * 22695477) % 9999991
       |      AS clock,
       |    ${hexPoly15("MD5(CAST(doc_id AS VARCHAR))")} % 1000000007 AS h
       |  FROM t),
       |p AS (
       |  SELECT doc_id, tok, clock % 8 AS shard, h,
       |    ROW_NUMBER() OVER (PARTITION BY clock % 8
       |      ORDER BY clock, doc_id) AS pos
       |  FROM d)
       |SELECT CAST(1 AS BIGINT) AS epoch, shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CAST(pos * h AS DECIMAL(38,0))) AS VARCHAR)
       |    AS order_fp
       |FROM p
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  /** q246 oracle: q27's banded-candidate chain and q39's capped exact
    * Jaccard chain (threshold 0.8) joined into the one-row
    * precision/recall/pruning card.
    */
  /** q257 oracle: the band sweep replayed — ONE signature/truth build
    * (q246's CTEs), then per configuration its own banding, candidate
    * join and counters, one UNION arm per rowsPerBand.
    */
  private def q257LshBandSweepSql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    def bandCte(r: Int): String = {
      val arms = (0 until 32 / r).map { b =>
        val cols = (b * r until b * r + r).map(i => s"mh_$i")
          .mkString(" || '#' || ")
        s"SELECT doc_id, $b AS band, MD5($cols) AS bh FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""bands_$r AS (
         |  $arms),
         |det_$r AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands_$r a JOIN bands_$r b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |nd_$r AS (SELECT COUNT(*) AS n_detected FROM det_$r),
         |nh_$r AS (
         |  SELECT CAST(SUM(CASE WHEN dm.d IS NOT NULL THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_hit
         |  FROM truth LEFT JOIN
         |    (SELECT id_a, id_b, 1 AS d FROM det_$r) dm
         |    USING (id_a, id_b))""".stripMargin
    }
    def arm(r: Int): String =
      s"""SELECT CAST($r AS BIGINT) AS rows_per_band,
         |  CAST(${32 / r} AS BIGINT) AS n_bands,
         |  nn.n_docs,
         |  CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS BIGINT)
         |    AS n_possible_pairs,
         |  nd_$r.n_detected, nt.n_truth,
         |  COALESCE(nh_$r.n_hit, 0) AS n_hit,
         |  CASE WHEN nd_$r.n_detected > 0 THEN
         |    ROUND(CAST(COALESCE(nh_$r.n_hit, 0) AS DOUBLE) /
         |      CAST(nd_$r.n_detected AS DOUBLE), 6) END AS precision,
         |  CASE WHEN nt.n_truth > 0 THEN
         |    ROUND(CAST(COALESCE(nh_$r.n_hit, 0) AS DOUBLE) /
         |      CAST(nt.n_truth AS DOUBLE), 6) END AS recall,
         |  CASE WHEN nn.n_docs > 1 THEN
         |    ROUND(CAST(nd_$r.n_detected AS DOUBLE) /
         |      CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS DOUBLE), 6)
         |    END AS candidate_frac
         |FROM nn, nt, nd_$r, nh_$r""".stripMargin
    val rs = Seq(2, 4, 8)
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk
       |  FROM documents),
       |shx AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM shx GROUP BY doc_id),
       |shd AS (SELECT DISTINCT doc_id, sh FROM shx),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
       |cold AS (SELECT sh FROM shd GROUP BY sh HAVING COUNT(*) <= 1000),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |  FROM shd a JOIN cold USING (sh)
       |  JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE ROUND(n_shared /
       |    CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6) >= 0.8),
       |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
       |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
       |${rs.map(bandCte).mkString(",\n")}
       |${rs.map(arm).mkString("\nUNION ALL\n")}
       |ORDER BY rows_per_band""".stripMargin
  }

  private def q246LshQualitySql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    val bandArms = (0 until 8).map { b =>
      val cols = (b * 4 until b * 4 + 4).map(i => s"mh_$i")
        .mkString(" || '#' || ")
      s"SELECT doc_id, $b AS band, MD5($cols) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk
       |  FROM documents),
       |shx AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM shx GROUP BY doc_id),
       |bands AS (
       |  $bandArms),
       |det AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |shd AS (SELECT DISTINCT doc_id, sh FROM shx),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
       |cold AS (SELECT sh FROM shd GROUP BY sh HAVING COUNT(*) <= 1000),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |  FROM shd a JOIN cold USING (sh)
       |  JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE ROUND(n_shared /
       |    CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6) >= 0.8),
       |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
       |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
       |nd AS (SELECT COUNT(*) AS n_detected FROM det),
       |nh AS (
       |  SELECT CAST(SUM(CASE WHEN dm.d IS NOT NULL THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_hit
       |  FROM truth LEFT JOIN
       |    (SELECT id_a, id_b, 1 AS d FROM det) dm USING (id_a, id_b))
       |SELECT nn.n_docs,
       |  CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS BIGINT)
       |    AS n_possible_pairs,
       |  nd.n_detected, nt.n_truth, COALESCE(nh.n_hit, 0) AS n_hit,
       |  CASE WHEN nd.n_detected > 0 THEN
       |    ROUND(CAST(COALESCE(nh.n_hit, 0) AS DOUBLE) /
       |      CAST(nd.n_detected AS DOUBLE), 6) END AS precision,
       |  CASE WHEN nt.n_truth > 0 THEN
       |    ROUND(CAST(COALESCE(nh.n_hit, 0) AS DOUBLE) /
       |      CAST(nt.n_truth AS DOUBLE), 6) END AS recall,
       |  CASE WHEN nn.n_docs > 1 THEN
       |    ROUND(CAST(nd.n_detected AS DOUBLE) /
       |      CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS DOUBLE), 6)
       |    END AS candidate_frac
       |FROM nn, nt, nd, nh""".stripMargin
  }

  /** q244 oracle: the closed-form water-fill replayed — avail-sorted
    * prefix sums, the unique valid saturation point (prevAvail ≤ λ <
    * avail under budget < total), integer level + remainder dealt in
    * sorted order, sentinel pick when the budget covers everything.
    */
  private def q244WaterfillSql: String =
    """WITH a AS (
      |  SELECT source,
      |    CAST(SUM(len(string_split(TRIM(text), ' '))) AS BIGINT)
      |      AS avail
      |  FROM documents GROUP BY source),
      |t AS (
      |  SELECT CAST(SUM(avail) AS BIGINT) AS total, COUNT(*) AS n
      |  FROM a),
      |b AS (SELECT (total * 6) // 10 AS budget, total, n FROM t),
      |s AS (
      |  SELECT source, avail,
      |    ROW_NUMBER() OVER (ORDER BY avail, source) AS pos,
      |    SUM(avail) OVER (ORDER BY avail, source
      |      ROWS UNBOUNDED PRECEDING) AS prefix,
      |    COALESCE(LAG(avail) OVER (ORDER BY avail, source), 0)
      |      AS prevavail
      |  FROM a),
      |g AS (
      |  SELECT s.*, b.budget, b.total, b.n - s.pos + 1 AS m,
      |    b.budget - (s.prefix - s.avail) AS x
      |  FROM s, b),
      |c AS (
      |  SELECT *,
      |    CASE WHEN x >= 0 THEN x // m ELSE -1 END AS level,
      |    CASE WHEN x >= 0 THEN x % m ELSE 0 END AS rem
      |  FROM g),
      |v AS (
      |  SELECT pos AS ppos, level AS plevel, rem AS prem FROM c
      |  WHERE budget < total AND prevavail <= level AND level < avail
      |  ORDER BY pos LIMIT 1),
      |p AS (
      |  SELECT
      |    COALESCE((SELECT ppos FROM v), 9223372036854775807) AS ppos,
      |    COALESCE((SELECT plevel FROM v), 9223372036854775807)
      |      AS plevel,
      |    COALESCE((SELECT prem FROM v), 0) AS prem),
      |al AS (
      |  SELECT c.source, c.avail, c.budget,
      |    CASE WHEN c.pos < p.ppos THEN c.avail
      |      ELSE p.plevel +
      |        CASE WHEN c.pos - p.ppos < p.prem THEN 1 ELSE 0 END
      |    END AS alloc
      |  FROM c, p)
      |SELECT source, avail AS avail_tokens,
      |  CAST(alloc AS BIGINT) AS alloc_tokens,
      |  CAST(CASE WHEN alloc = avail THEN 1 ELSE 0 END AS BIGINT)
      |    AS saturated,
      |  CAST(budget AS BIGINT) AS budget_tokens
      |FROM al
      |ORDER BY source""".stripMargin

  /** q236 oracle: the two stacked aggregations and the identical
    * double-division disclosure arithmetic (round AFTER max).
    */
  /** q249 oracle: t-closeness replayed — same exact-rational TVD
    * (HUGEINT products ≡ Spark's decimal(38,0)), same exact integer
    * threshold verdict num·5 > den, double division only at the end.
    */
  private def q249TClosenessSql: String =
    """WITH gs AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM customer GROUP BY c_nationkey, c_mktsegment, 3),
      |gdist AS (SELECT s, CAST(SUM(c) AS BIGINT) AS cg FROM gs GROUP BY s),
      |tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM gdist),
      |ngt AS (
      |  SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS ngv
      |  FROM gs GROUP BY c_nationkey, c_mktsegment),
      |per AS (
      |  SELECT gs.c_nationkey, gs.c_mktsegment,
      |    MAX(ngt.ngv) AS ngv, MAX(tot.n) AS n,
      |    SUM(ABS(CAST(gs.c AS HUGEINT) * tot.n -
      |      CAST(gdist.cg AS HUGEINT) * ngt.ngv)) AS s1,
      |    SUM(CAST(gdist.cg AS HUGEINT)) AS s2
      |  FROM gs
      |  JOIN gdist USING (s)
      |  JOIN ngt ON gs.c_nationkey = ngt.c_nationkey
      |    AND gs.c_mktsegment = ngt.c_mktsegment
      |  CROSS JOIN tot
      |  GROUP BY gs.c_nationkey, gs.c_mktsegment),
      |pv AS (
      |  SELECT ngv, n,
      |    s1 + (CAST(n AS HUGEINT) - s2) * ngv AS num,
      |    2 * CAST(ngv AS HUGEINT) * n AS den
      |  FROM per)
      |SELECT ROUND(CAST(1 AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS t,
      |  CAST(MAX(n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_groups,
      |  ROUND(MAX(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)), 6)
      |    AS max_tvd,
      |  CAST(SUM(CASE WHEN num * 5 > den THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_above_t,
      |  CAST(SUM(CASE WHEN num * 5 > den THEN ngv ELSE 0 END) AS BIGINT)
      |    AS n_rows_above_t,
      |  ROUND(CAST(SUM(CASE WHEN num * 5 > den THEN ngv ELSE 0 END)
      |      AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6) AS frac_rows_above_t
      |FROM pv""".stripMargin

  private def q236LDiversitySql: String =
    """WITH gs AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s,
      |    COUNT(*) AS c
      |  FROM customer
      |  GROUP BY c_nationkey, c_mktsegment, 3),
      |gg AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS d,
      |    CAST(SUM(c) AS BIGINT) AS n, CAST(MAX(c) AS BIGINT) AS mx
      |  FROM gs GROUP BY c_nationkey, c_mktsegment)
      |SELECT CAST(3 AS BIGINT) AS l,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_groups,
      |  CAST(MIN(d) AS BIGINT) AS min_distinct_sensitive,
      |  CAST(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_below_l,
      |  CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
      |    AS n_rows_below_l,
      |  ROUND(CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS DOUBLE) /
      |    CAST(SUM(n) AS DOUBLE), 6) AS frac_rows_below_l,
      |  ROUND(MAX(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
      |    AS worst_disclosure
      |FROM gg""".stripMargin

  /** q237 oracle: seeded Laplace noise replayed — the 60-bit MD5
    * polynomial of the group key through the two-round congruential
    * generator (q135 convention), u = (x2 + 0.5)/p2 strictly inside
    * (0,1), inverse-CDF noise with the identical parenthesization.
    */
  private def q237DpHistogramSql: String =
    s"""WITH h AS (
       |  SELECT o_orderpriority, COUNT(*) AS n_true
       |  FROM orders WHERE o_orderpriority IS NOT NULL
       |  GROUP BY o_orderpriority),
       |hx AS (
       |  SELECT o_orderpriority, n_true,
       |    ${hexPoly15("MD5(o_orderpriority)")} AS x
       |  FROM h),
       |d1 AS (
       |  SELECT o_orderpriority, n_true,
       |    ((x % 1000003) * 2654435761) % 1000003 AS x1,
       |    x // 1000003 AS hdiv
       |  FROM hx),
       |d2 AS (
       |  SELECT o_orderpriority, n_true,
       |    (((x1 + hdiv) % 9999991) * 22695477) % 9999991 AS x2
       |  FROM d1),
       |nz AS (
       |  SELECT o_orderpriority, n_true,
       |    ROUND((CASE WHEN ((CAST(x2 AS DOUBLE) + 0.5) / 9999991.0
       |        - 0.5) >= 0.0 THEN -1.0 ELSE 1.0 END *
       |      LN(1.0 - 2.0 * ABS((CAST(x2 AS DOUBLE) + 0.5) / 9999991.0
       |        - 0.5))) / 1.0, 6) AS noise
       |  FROM d2)
       |SELECT o_orderpriority, n_true, noise,
       |  ROUND(CAST(n_true AS DOUBLE) + noise, 6) AS n_noisy,
       |  1.0 AS eps
       |FROM nz
       |ORDER BY o_orderpriority""".stripMargin

  /** q238 oracle: the span scrub replayed — 60-bit gram hashes (q207
    * convention), the ≥2 duplicated-gram set, covered positions from
    * duplicated starts ×5 offsets, and the cleaned text re-assembled
    * with an ordered string_agg and fingerprinted.
    */
  private def q238SpanScrubSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, u.s.i AS i, u.s.tok AS tok
       |  FROM dt, UNNEST(list_transform(toks,
       |    (t, k) -> struct_pack(tok := t, i := k - 1))) AS u(s)
       |  WHERE u.s.tok <> ''),
       |g0 AS (
       |  SELECT doc_id, g.i - 1 AS j,
       |    MD5(array_to_string(toks[g.i:g.i + 4], ' ')) AS h
       |  FROM dt, UNNEST(range(1, len(toks) - 3)) AS g(i)
       |  WHERE len(toks) >= 5),
       |st AS (
       |  SELECT doc_id, j, ${hexPoly15("h")} AS gh
       |  FROM g0),
       |dup AS (
       |  SELECT gh FROM st GROUP BY gh HAVING COUNT(*) >= 2),
       |ds AS (SELECT st.doc_id, st.j FROM st JOIN dup USING (gh)),
       |cov AS (
       |  SELECT DISTINCT ds.doc_id, ds.j + o.k AS i
       |  FROM ds, UNNEST(range(0, 5)) AS o(k)),
       |kept AS (
       |  SELECT pos.doc_id, pos.i, pos.tok,
       |    CASE WHEN cov.i IS NOT NULL THEN 1 ELSE 0 END AS cv
       |  FROM pos LEFT JOIN cov
       |    ON cov.doc_id = pos.doc_id AND cov.i = pos.i),
       |card AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(cv) AS BIGINT) AS n_removed,
       |    COALESCE(string_agg(tok, ' ' ORDER BY i)
       |      FILTER (WHERE cv = 0), '') AS clean
       |  FROM kept GROUP BY doc_id),
       |nds AS (
       |  SELECT doc_id, COUNT(*) AS n_dup_spans FROM ds GROUP BY doc_id),
       |ids AS (SELECT doc_id FROM dt)
       |SELECT ids.doc_id,
       |  COALESCE(card.n_tokens, 0) AS n_tokens,
       |  COALESCE(card.n_removed, 0) AS n_removed,
       |  COALESCE(nds.n_dup_spans, 0) AS n_dup_spans,
       |  ${hexPoly15("MD5(COALESCE(card.clean, ''))")} % 1000000007
       |    AS clean_fp
       |FROM ids
       |LEFT JOIN card USING (doc_id)
       |LEFT JOIN nds USING (doc_id)
       |ORDER BY ids.doc_id""".stripMargin

  /** q239 oracle: DSIR replayed — hashed-bucket LMs for target (src0)
    * and raw with add-one smoothing over the constant 1024-bucket
    * space, per-bucket log ratio, exact decimal weight sums, top-50 by
    * UNROUNDED weight with doc_id tiebreak.
    */
  private def q239DsirSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, source, string_split(TRIM(text), ' ') AS toks
       |  FROM documents),
       |tok0 AS (
       |  SELECT doc_id, source, MD5(u.token) AS h
       |  FROM dt, UNNEST(toks) AS u(token)
       |  WHERE u.token <> ''),
       |tok AS (
       |  SELECT doc_id, source, ${hexPoly15("h")} % 1024 AS b
       |  FROM tok0),
       |tb AS (
       |  SELECT b, COUNT(*) AS c_t FROM tok
       |  WHERE source = 'src0' GROUP BY b),
       |rb AS (
       |  SELECT b, COUNT(*) AS c_r FROM tok
       |  WHERE source <> 'src0' GROUP BY b),
       |nt AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM tb),
       |nr AS (SELECT CAST(SUM(c_r) AS BIGINT) AS n FROM rb),
       |delta AS (
       |  SELECT rb.b,
       |    LN((CAST(COALESCE(tb.c_t, 0) AS DOUBLE) + 1.0) /
       |      (CAST(nt.n AS DOUBLE) + 1024.0)) -
       |    LN((CAST(rb.c_r AS DOUBLE) + 1.0) /
       |      (CAST(nr.n AS DOUBLE) + 1024.0)) AS delta
       |  FROM rb LEFT JOIN tb USING (b), nt, nr),
       |db AS (
       |  SELECT doc_id, b, COUNT(*) AS cnt FROM tok
       |  WHERE source <> 'src0' GROUP BY doc_id, b),
       |lw AS (
       |  SELECT db.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CAST(delta.delta * CAST(cnt AS DOUBLE)
       |      AS DECIMAL(28,12))) AS DOUBLE) AS lw
       |  FROM db JOIN delta USING (b) GROUP BY db.doc_id),
       |pk AS (SELECT doc_id FROM lw ORDER BY lw DESC, doc_id LIMIT 50),
       |ids AS (SELECT doc_id FROM dt WHERE source <> 'src0')
       |SELECT ids.doc_id,
       |  CAST(COALESCE(lw.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  ROUND(lw.lw, 6) AS log_ratio,
       |  CAST(CASE WHEN pk.doc_id IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS selected
       |FROM ids
       |LEFT JOIN lw USING (doc_id)
       |LEFT JOIN pk USING (doc_id)
       |ORDER BY ids.doc_id""".stripMargin

  /** q240 oracle: the full-dim exact top-5 (q220's exact CTE) compared
    * against per-prefix truncated top-5 — truncation is a list slice on
    * the same DOUBLE[] cast, rounded cosine + id tiebreak as everywhere.
    */
  private def q240MatryoshkaSql: String = {
    val dims = Seq(8, 16, 64)
    def topK(name: String, vec: String => String): String =
      s"""$name AS (
         |  SELECT q_id, vec_id AS n_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |        ROUND(list_inner_product(${vec("e.emb")}, ${vec("q.qe")}) /
         |          (SQRT(list_inner_product(${vec("e.emb")},
         |            ${vec("e.emb")})) *
         |           SQRT(list_inner_product(${vec("q.qe")},
         |            ${vec("q.qe")}))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM e, q WHERE e.vec_id <> q.q_id)
         |  WHERE rank <= 5)""".stripMargin
    val truncs = dims.map(d =>
      topK(s"t$d", v => s"$v[1:$d]")).mkString(",\n", ",\n", "")
    val arms = dims.map { d =>
      s"""  SELECT CAST($d AS BIGINT) AS dim,
         |    COUNT(DISTINCT exact.q_id) AS n_queries,
         |    COUNT(*) AS n_exact,
         |    CAST(SUM(CASE WHEN t$d.n_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_found,
         |    ROUND(CAST(SUM(CASE WHEN t$d.n_id IS NOT NULL THEN 1
         |        ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |      AS recall
         |  FROM exact LEFT JOIN t$d USING (q_id, n_id)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 20),
       |${topK("exact", identity)}$truncs
       |SELECT dim, n_queries, n_exact, n_found, recall FROM (
       |$arms)
       |ORDER BY dim""".stripMargin
  }

  /** q241 oracle: q182's portable centroids/assignment over the full
    * table, then the per-cluster quota by the SAME two-round draw
    * (the centroid draw and the sampling clock share the generator —
    * both keyed on vec_id, salt 0) with id tiebreak.
    */
  private def q241ClusterSampleSql: String =
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
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |assign AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT t.vec_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |sized AS (
      |  SELECT a.centroid_id, a.vec_id, drawn.d,
      |    COUNT(*) OVER (PARTITION BY a.centroid_id) AS n_list,
      |    ROW_NUMBER() OVER (PARTITION BY a.centroid_id
      |      ORDER BY drawn.d, a.vec_id) AS rank
      |  FROM assign a JOIN drawn USING (vec_id))
      |SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
      |  CAST(rank AS BIGINT) AS rank, vec_id,
      |  CAST(n_list AS BIGINT) AS n_list
      |FROM sized WHERE rank <= 8
      |ORDER BY centroid_id, rank""".stripMargin

  /** Shared q248/q265 oracle: the packing card — plain global window
    * prefix sum in DuckDB; the Spark batch side's two-level bucket sum
    * and the streaming side's wave-offset partials land on identical
    * values.
    */
  private def q269AcfSql: String =
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
        |  FROM p GROUP BY l)
        |SELECT CAST(l AS BIGINT) AS lag, n_pairs,
        |  ROUND((nl - (s0 / CAST(d AS DOUBLE)) * (al + bl) +
        |    CAST(n_pairs AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |      (s0 / CAST(d AS DOUBLE))) /
        |    (s2 - CAST(d AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |      (s0 / CAST(d AS DOUBLE))), 6) AS acf
        |FROM a CROSS JOIN tot
        |ORDER BY lag""".stripMargin

  private def q276BhFdrSql: String =
    """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(CAST(v AS DECIMAL(28,2))) AS sd,
        |    SUM(CAST(v * v AS DECIMAL(38,4))) AS qd
        |  FROM d GROUP BY g),
        |tot AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    SUM(sd) AS st, SUM(qd) AS qt
        |  FROM grp),
        |mo AS (
        |  SELECT g, n_g,
        |    CAST(n_g AS DOUBLE) AS ng, CAST(n - n_g AS DOUBLE) AS nr,
        |    CAST(sd AS DOUBLE) AS sa, CAST(qd AS DOUBLE) AS qa,
        |    CAST(st - sd AS DOUBLE) AS sr, CAST(qt - qd AS DOUBLE) AS qr
        |  FROM grp CROSS JOIN tot
        |  WHERE n_g > 1 AND n - n_g > 1),
        |zz AS (
        |  SELECT g, n_g,
        |    sa / ng AS ma, sr / nr AS mr,
        |    (qa - sa * sa / ng) / (ng - 1.0) AS va,
        |    (qr - sr * sr / nr) / (nr - 1.0) AS vr,
        |    ng, nr
        |  FROM mo),
        |zs AS (
        |  SELECT g, n_g, ma, mr,
        |    (ma - mr) / SQRT(va / ng + vr / nr) AS z
        |  FROM zz WHERE va / ng + vr / nr > 0.0),
        |ps AS (
        |  SELECT g, n_g, ma, mr, z,
        |    ROUND(2.0 * (EXP(-ABS(z) * ABS(z) / 2.0) /
        |      2.5066282746310002) *
        |      ((1.0 / (1.0 + 0.2316419 * ABS(z))) * (0.319381530 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * (-0.356563782 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * (1.781477937 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * (-1.821255978 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * 1.330274429))))),
        |      9) AS p_value
        |  FROM zs),
        |rk AS (
        |  SELECT g, n_g, ma, mr, z, p_value,
        |    CAST(ROW_NUMBER() OVER (ORDER BY p_value, g) AS BIGINT)
        |      AS rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m
        |  FROM ps),
        |crit AS (
        |  SELECT *, ROUND(0.05 * CAST(rank AS DOUBLE) /
        |    CAST(m AS DOUBLE), 9) AS bh_critical
        |  FROM rk),
        |k AS (
        |  SELECT COALESCE(MAX(CASE WHEN p_value <= bh_critical
        |    THEN rank END), 0) AS kstar
        |  FROM crit)
        |SELECT g AS event_type, n_g, ROUND(ma, 6) AS mean_g,
        |  ROUND(mr, 6) AS mean_rest, ROUND(z, 6) AS z, p_value, rank,
        |  bh_critical, rank <= k.kstar AS rejected
        |FROM crit CROSS JOIN k
        |ORDER BY rank""".stripMargin

  private def q267CusumSql: String =
    """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS td
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY day),
        |c AS (
        |  SELECT day, td,
        |    SUM(td) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ck,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
        |  FROM d),
        |t AS (
        |  SELECT CAST(SUM(td) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(CAST(td AS DOUBLE) * CAST(td AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS q,
        |    CAST(COUNT(*) AS BIGINT) AS dd
        |  FROM d),
        |dev AS (
        |  SELECT c.day, c.k, t.dd, t.s,
        |    SQRT((t.q - t.s * t.s / CAST(t.dd AS DOUBLE)) /
        |      CAST(t.dd AS DOUBLE)) AS sigma,
        |    CAST(c.ck AS DOUBLE) -
        |      CAST(c.k AS DOUBLE) * (t.s / CAST(t.dd AS DOUBLE)) AS dv
        |  FROM c CROSS JOIN t)
        |SELECT dd AS n_days, ROUND(s, 6) AS total_mass,
        |  ROUND(sigma, 6) AS sigma_daily,
        |  ROUND(ABS(dv) / (sigma * SQRT(CAST(dd AS DOUBLE))), 6)
        |    AS cusum_stat,
        |  day AS changepoint_day,
        |  ROUND(CAST(k AS DOUBLE) / CAST(dd AS DOUBLE), 6)
        |    AS changepoint_frac
        |FROM dev WHERE sigma > 0.0
        |ORDER BY ABS(dv) DESC, day LIMIT 1""".stripMargin

  private def q266WelchSql: String =
    """WITH v AS (
        |  SELECT CAST(value AS DOUBLE) AS v, event_type = 'click' AS is_a
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN is_a THEN CAST(v AS DECIMAL(28,2)) END)
        |      AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN NOT is_a THEN CAST(v AS DECIMAL(28,2)) END)
        |      AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN is_a THEN CAST(v * v AS DECIMAL(38,4)) END)
        |      AS DOUBLE) AS qa,
        |    CAST(SUM(CASE WHEN NOT is_a
        |      THEN CAST(v * v AS DECIMAL(38,4)) END) AS DOUBLE) AS qb
        |  FROM v),
        |p AS (
        |  SELECT n_a, n_b,
        |    sa / CAST(n_a AS DOUBLE) AS ma,
        |    sb / CAST(n_b AS DOUBLE) AS mb,
        |    (qa - sa * sa / CAST(n_a AS DOUBLE)) /
        |      (CAST(n_a AS DOUBLE) - 1.0) AS va,
        |    (qb - sb * sb / CAST(n_b AS DOUBLE)) /
        |      (CAST(n_b AS DOUBLE) - 1.0) AS vb
        |  FROM a WHERE n_a > 1 AND n_b > 1)
        |SELECT n_a, n_b,
        |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        |  ROUND(va, 6) AS var_a, ROUND(vb, 6) AS var_b,
        |  ROUND((ma - mb) / SQRT(va / CAST(n_a AS DOUBLE) +
        |    vb / CAST(n_b AS DOUBLE)), 6) AS t_welch,
        |  ROUND((va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) *
        |      (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) /
        |    ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE)) /
        |        (CAST(n_a AS DOUBLE) - 1.0) +
        |      (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE)) /
        |        (CAST(n_b AS DOUBLE) - 1.0)), 6) AS df_welch
        |FROM p""".stripMargin

  private def q380KmvSql: String = {
    val h = hexPoly15("MD5('kmv#' || CAST(k AS VARCHAR))")
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS grp, l_orderkey AS k FROM lineitem),
       |hashed AS (SELECT DISTINCT grp, $h AS h FROM keyed),
       |rk AS (
       |  SELECT grp, h,
       |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
       |  FROM hashed),
       |kept AS (SELECT grp, r, h FROM rk WHERE r <= 64),
       |allh AS (SELECT DISTINCT h FROM kept),
       |allr AS (
       |  SELECT 'ALL' AS grp, ROW_NUMBER() OVER (ORDER BY h) AS r, h
       |  FROM allh),
       |merged AS (
       |  SELECT grp, r, h FROM kept
       |  UNION ALL SELECT grp, r, h FROM allr WHERE r <= 64),
       |agg AS (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    CAST(MAX(h) AS BIGINT) AS kth_min_hash
       |  FROM merged GROUP BY grp),
       |est AS (
       |  SELECT grp, n_kept, kth_min_hash,
       |    ROUND(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
       |      ELSE CAST(63.0 AS DOUBLE) *
       |        CAST(1152921504606846976 AS DOUBLE) /
       |        CAST(kth_min_hash AS DOUBLE) END, 6) AS kmv_estimate
       |  FROM agg),
       |exact AS (
       |  SELECT grp, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact FROM (
       |    SELECT grp, k FROM keyed
       |    UNION ALL SELECT 'ALL' AS grp, k FROM keyed)
       |  GROUP BY grp)
       |SELECT e.grp AS grp, n_kept, kth_min_hash, kmv_estimate, n_exact,
       |  ROUND((kmv_estimate - CAST(n_exact AS DOUBLE)) /
       |    CAST(n_exact AS DOUBLE), 6) + 0.0 AS rel_err
       |FROM est e JOIN exact x ON e.grp = x.grp
       |ORDER BY grp""".stripMargin
  }

  /** Portable log-gamma — the SAME Numerical Recipes Lanczos expression
    * tree as [[graft.functions.Stats.lnGamma]], emitted as SQL text:
    * identical literals, identical association, only +,*,/ and LN, so
    * DuckDB reproduces Spark's doubles bit-for-bit (built-in `lgamma`s
    * are engine-specific and NOT portable).
    */
  private def lnGammaSql(z: String): String =
    s"(-(($z) + 5.5 - (($z) + 0.5) * LN(($z) + 5.5)) + " +
      "LN(2.5066282746310005 * (1.000000000190015 + " +
      s"76.18009172947146 / (($z) + 1.0) + " +
      s"-86.50532032941677 / (($z) + 2.0) + " +
      s"24.01409824083091 / (($z) + 3.0) + " +
      s"-1.231739572450155 / (($z) + 4.0) + " +
      s"1.208650973866179e-3 / (($z) + 5.0) + " +
      s"-5.395239384953e-6 / (($z) + 6.0)) / ($z)))"

  private def lnFactSql(x: String): String = lnGammaSql(s"($x) + 1.0")

  private def lnChooseSql(n: String, k: String): String =
    s"(${lnFactSql(n)} - ${lnFactSql(k)} - ${lnFactSql(s"($n) - ($k)")})"

  private def q381FisherSql: String = {
    def term(kd: String): String =
      s"(${lnChooseSql("r1d", kd)} + " +
        s"${lnChooseSql("(nd - r1d)", s"(c1d - $kd)")} - " +
        s"${lnChooseSql("nd", "c1d")})"
    s"""WITH m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END) AS BIGINT) AS r1,
       |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c1,
       |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a
       |  FROM orders),
       |md AS (
       |  SELECT n, r1, c1, a, CAST(n AS DOUBLE) AS nd,
       |    CAST(r1 AS DOUBLE) AS r1d, CAST(c1 AS DOUBLE) AS c1d,
       |    CAST(a AS DOUBLE) AS ad
       |  FROM m),
       |ks AS (
       |  SELECT nd, r1d, c1d,
       |    CAST(UNNEST(generate_series(a, LEAST(r1, c1))) AS DOUBLE)
       |      AS kd
       |  FROM md),
       |terms AS (SELECT ${term("kd")} AS lt FROM ks),
       |mx AS (
       |  SELECT MAX(lt) AS mxv, CAST(COUNT(*) AS BIGINT) AS n_terms
       |  FROM terms),
       |s AS (
       |  SELECT CAST(SUM(CAST(EXP(lt - mxv) AS DECIMAL(28,12)))
       |      AS DOUBLE) AS sv,
       |    MAX(mxv) AS mxv, MAX(n_terms) AS n_terms
       |  FROM terms, mx)
       |SELECT n, r1, c1, a AS a_obs,
       |  ROUND(r1d * c1d / nd, 6) AS expected_a,
       |  CASE WHEN ad > 0 AND r1d - ad > 0 AND c1d - ad > 0
       |      AND nd - r1d - c1d + ad > 0
       |    THEN ROUND(LN(ad * (nd - r1d - c1d + ad) /
       |      ((r1d - ad) * (c1d - ad))), 6) + 0.0 END AS log_odds,
       |  n_terms,
       |  ROUND(mxv + LN(sv), 6) + 0.0 AS ln_p_right,
       |  ROUND(EXP(mxv + LN(sv)), 6) AS p_right,
       |  ROUND(EXP(mxv + LN(sv)) - 0.5 * EXP(${term("ad")}), 6) + 0.0
       |    AS mid_p_right
       |FROM md, s""".stripMargin
  }

  private def q382RansacSql: String = {
    def drawSql(seed: String): String =
      s"(((($seed) % 1000003) * 2654435761) % 1000003 + " +
        s"($seed) // 1000003) % 9999991 * 22695477 % 9999991 % n"
    s"""WITH $dailySeriesCtes,
       |meta AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CASE WHEN COUNT(*) > 1
       |      THEN ROUND(STDDEV_SAMP(CAST(x AS DOUBLE)), 6) END / 2.0
       |      AS thr
       |  FROM series),
       |cd AS (
       |  SELECT CAST(UNNEST(generate_series(0, 15)) AS BIGINT) AS cand,
       |    n, thr
       |  FROM meta),
       |dr AS (
       |  SELECT cand, n, thr,
       |    ${drawSql("cand * 7919")} AS i0,
       |    ${drawSql("cand * 7919 + 3571")} AS i1r
       |  FROM cd),
       |d2 AS (
       |  SELECT cand, n, thr, i0,
       |    CASE WHEN i1r = i0 THEN (i1r + 1) % n ELSE i1r END AS i1
       |  FROM dr),
       |pts0 AS (
       |  SELECT d2.*, s0.x AS x0, s1.x AS x1
       |  FROM d2 JOIN series s0 ON s0.i = d2.i0
       |    JOIN series s1 ON s1.i = d2.i1),
       |pts AS (
       |  SELECT cand, n, thr, i0, i1,
       |    ROUND((CAST(x1 AS DOUBLE) - CAST(x0 AS DOUBLE)) /
       |      (CAST(i1 AS DOUBLE) - CAST(i0 AS DOUBLE)), 9) AS cand_slope,
       |    ROUND(CAST(x0 AS DOUBLE) -
       |      ROUND((CAST(x1 AS DOUBLE) - CAST(x0 AS DOUBLE)) /
       |        (CAST(i1 AS DOUBLE) - CAST(i0 AS DOUBLE)), 9) *
       |      CAST(i0 AS DOUBLE), 9) AS cand_intercept
       |  FROM pts0),
       |scored AS (
       |  SELECT cand, n, thr, i0, i1, cand_slope, cand_intercept,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.i AS HUGEINT) END) AS DOUBLE) AS si,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.i AS HUGEINT) * s.i END) AS DOUBLE) AS sii,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.x AS HUGEINT) END) AS DOUBLE) AS sx,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.i AS HUGEINT) * s.x END) AS DOUBLE) AS six
       |  FROM series s CROSS JOIN pts
       |  GROUP BY cand, n, thr, i0, i1, cand_slope, cand_intercept),
       |best AS (
       |  SELECT * FROM scored ORDER BY n_inliers DESC, cand LIMIT 1)
       |SELECT n AS n_days, thr AS threshold, cand AS best_cand, i0, i1,
       |  ROUND(cand_slope, 6) + 0.0 AS cand_slope,
       |  ROUND(cand_intercept, 6) + 0.0 AS cand_intercept,
       |  n_inliers,
       |  ROUND(CAST(n_inliers AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |    AS inlier_frac,
       |  ROUND((CAST(n_inliers AS DOUBLE) * six - si * sx) /
       |    (CAST(n_inliers AS DOUBLE) * sii - si * si), 6) + 0.0
       |    AS refit_slope,
       |  ROUND((sx - (CAST(n_inliers AS DOUBLE) * six - si * sx) /
       |      (CAST(n_inliers AS DOUBLE) * sii - si * si) * si) /
       |    CAST(n_inliers AS DOUBLE), 6) + 0.0 AS refit_intercept
       |FROM best""".stripMargin
  }

  /** Portable standard-normal pdf/CDF — the SAME fixed expression trees
    * as [[graft.functions.Stats.normPdf]]/normCdf (Zelen–Severo
    * rational tail), emitted as SQL text with identical literals.
    */
  private def normPdfSql(x: String): String =
    s"(EXP(-0.5 * ($x) * ($x)) / 2.5066282746310002)"

  private def normCdfSql(x: String): String = {
    def upper(ax: String): String = {
      val k = s"(1.0 / (1.0 + 0.2316419 * ($ax)))"
      s"(1.0 - ${normPdfSql(ax)} * (0.319381530 * $k + " +
        s"-0.356563782 * $k * $k + " +
        s"1.781477937 * $k * $k * $k + " +
        s"-1.821255978 * $k * $k * $k * $k + " +
        s"1.330274429 * $k * $k * $k * $k * $k))"
    }
    s"(CASE WHEN ($x) >= 0 THEN ${upper(s"ABS($x)")} " +
      s"ELSE 1.0 - ${upper(s"ABS($x)")} END)"
  }

  private def q396ProbitSql: String = {
    val eta = "it.b0 + it.b1 * d.x"
    s"""WITH RECURSIVE d AS (
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
       |      CAST(SUM(CAST(ph * (y - cdf) / vv AS DECIMAL(28,12)))
       |        AS DOUBLE) AS g0,
       |      CAST(SUM(CAST(ph * (y - cdf) / vv * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS g1,
       |      CAST(SUM(CAST(ph * ph / vv AS DECIMAL(28,12))) AS DOUBLE)
       |        AS sw,
       |      CAST(SUM(CAST(ph * ph / vv * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS swx,
       |      CAST(SUM(CAST(ph * ph / vv * x * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS swxx,
       |      ROUND(CAST(SUM(CAST(y * LN(cdf) + (1.0 - y) * LN(1.0 - cdf)
       |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
       |    FROM (
       |      SELECT i, b0, b1, x, y, ph, cdf,
       |        cdf * (1.0 - cdf) AS vv
       |      FROM (
       |        SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1,
       |          d.x AS x, d.y AS y,
       |          ${normPdfSql(eta)} AS ph,
       |          GREATEST(1e-10, LEAST(0.9999999999,
       |            ${normCdfSql(eta)})) AS cdf
       |        FROM it, d WHERE it.i < 6))
       |    GROUP BY i, b0, b1))
       |SELECT i AS iter, ROUND(b0, 6) + 0.0 AS b0,
       |  ROUND(b1, 6) + 0.0 AS b1, ll AS log_loss
       |FROM it WHERE i >= 1
       |ORDER BY iter""".stripMargin
  }

  private def q398BlockBootstrapSql: String = {
    val seed = "(r * 31 + j * 7919)"
    val drw = s"((($seed % 1000003) * 2654435761) % 1000003 + " +
      s"$seed // 1000003) % 9999991 * 22695477 % 9999991 % (n - 6)"
    s"""WITH $dailySeriesCtes,
       |ff AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(i AS HUGEINT)) AS DOUBLE) AS fsi,
       |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS fsii,
       |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS fsx,
       |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS fsix
       |  FROM series),
       |fit0 AS (
       |  SELECT n, fsi, fsx,
       |    ROUND((CAST(n AS DOUBLE) * fsix - fsi * fsx) /
       |      (CAST(n AS DOUBLE) * fsii - fsi * fsi), 9) AS bf
       |  FROM ff),
       |fit AS (
       |  SELECT n, bf,
       |    ROUND((fsx - bf * fsi) / CAST(n AS DOUBLE), 9) AS af
       |  FROM fit0),
       |resid AS (
       |  SELECT s.i AS i,
       |    CAST(s.x AS DOUBLE) -
       |      (af + bf * CAST(s.i AS DOUBLE)) AS e
       |  FROM series s, fit),
       |r0 AS (
       |  SELECT CAST(UNNEST(generate_series(0, 31)) AS BIGINT) AS r),
       |j0 AS (
       |  SELECT r, n,
       |    CAST(UNNEST(generate_series(0, (n + 6) // 7 - 1)) AS BIGINT)
       |      AS j
       |  FROM r0, fit),
       |st AS (SELECT r, j, n, $drw AS s FROM j0),
       |off AS (
       |  SELECT r, j, s,
       |    CAST(UNNEST(generate_series(0, 6)) AS BIGINT) AS o
       |  FROM st),
       |ps AS (SELECT r, j * 7 + o AS pos, s + o AS i FROM off),
       |perr AS (
       |  SELECT r, CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(CAST(pos AS HUGEINT)) AS DOUBLE) AS sp,
       |    CAST(SUM(CAST(pos AS HUGEINT) * pos) AS DOUBLE) AS spp,
       |    CAST(SUM(CAST(ROUND(e, 12) AS DECIMAL(38,12))) AS DOUBLE)
       |      AS se,
       |    CAST(SUM(CAST(ROUND(CAST(pos AS DOUBLE) * e, 12)
       |      AS DECIMAL(38,12))) AS DOUBLE) AS spe
       |  FROM ps JOIN resid USING (i) GROUP BY r),
       |sl AS (
       |  SELECT r,
       |    bf + (CAST(m AS DOUBLE) * spe - sp * se) /
       |      (CAST(m AS DOUBLE) * spp - sp * sp) AS b
       |  FROM perr, fit),
       |rk AS (
       |  SELECT r, b, ROW_NUMBER() OVER (ORDER BY b, r) AS rk FROM sl),
       |agg AS (
       |  SELECT
       |    CAST(SUM(CAST(ROUND(b, 12) AS DECIMAL(38,12))) AS DOUBLE)
       |      AS sb,
       |    CAST(SUM(CAST(ROUND(b * b, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE) AS sbb,
       |    MAX(CASE WHEN rk = 2 THEN b END) AS lo,
       |    MAX(CASE WHEN rk = 31 THEN b END) AS hi,
       |    CAST(COUNT(*) AS BIGINT) AS n_boot
       |  FROM rk)
       |SELECT fit.n AS n_days, n_boot, CAST(7 AS BIGINT) AS block_len,
       |  ROUND(bf, 6) + 0.0 AS slope_full,
       |  ROUND(sb / CAST(n_boot AS DOUBLE), 6) + 0.0 AS boot_mean,
       |  ROUND(SQRT(GREATEST(0.0,
       |    (sbb - CAST(n_boot AS DOUBLE) * (sb / CAST(n_boot AS DOUBLE)) *
       |      (sb / CAST(n_boot AS DOUBLE))) /
       |    (CAST(n_boot AS DOUBLE) - 1.0))), 6) AS boot_se,
       |  ROUND(lo, 6) + 0.0 AS ci_lo,
       |  ROUND(hi, 6) + 0.0 AS ci_hi
       |FROM fit, agg""".stripMargin
  }

  private def q399UcbReplaySql: String = {
    val arms = Seq("click", "error", "purchase", "signup", "view")
    def u(i: Int): String =
      s"CASE WHEN it.n$i > 0 THEN it.s$i / CAST(it.n$i AS DOUBLE) + " +
        s"SQRT(2.0 * LN(CAST(it.t + 1 AS DOUBLE)) / " +
        s"CAST(it.n$i AS DOUBLE)) ELSE 0.0 END"
    val armCase = arms.zipWithIndex
      .map { case (a, i) => s"WHEN ${i + 1} THEN '$a'" }.mkString(" ")
    val rCase = (1 to 5).map(i => s"WHEN $i THEN r$i").mkString(" ")
    s"""WITH RECURSIVE cells AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type AS arm,
       |    CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,12)))
       |      AS DOUBLE) / COUNT(*) AS m
       |  FROM events
       |  WHERE event_type IN ('click', 'error', 'purchase', 'signup',
       |    'view') AND value IS NOT NULL
       |  GROUP BY day, arm),
       |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM cells),
       |days AS (
       |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
       |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM b),
       |mx AS (SELECT MAX(m) AS mxv FROM cells),
       |grid AS (
       |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) + 1 AS t,
       |${arms.zipWithIndex.map { case (a, i) =>
           s"    COALESCE(MAX(CASE WHEN arm = '$a' " +
             s"THEN ROUND(m / mxv, 9) END), 0.0) AS r${i + 1}"
         }.mkString(",\n|")}
       |  FROM days d CROSS JOIN b CROSS JOIN mx
       |    LEFT JOIN cells c ON c.day = d.day
       |  GROUP BY 1),
       |it(t, n1, s1, n2, s2, n3, s3, n4, s4, n5, s5,
       |    chosen, rew, cum) AS (
       |  SELECT CAST(0 AS BIGINT),
       |    0, CAST(0.0 AS DOUBLE), 0, CAST(0.0 AS DOUBLE),
       |    0, CAST(0.0 AS DOUBLE), 0, CAST(0.0 AS DOUBLE),
       |    0, CAST(0.0 AS DOUBLE),
       |    0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
       |  UNION ALL
       |  SELECT t,
       |${(1 to 5).map(i =>
           s"    n$i + CASE WHEN ch = $i THEN 1 ELSE 0 END,\n" +
           s"|    s$i + CASE WHEN ch = $i THEN r$i ELSE 0.0 END"
         ).mkString(",\n|")},
       |    ch,
       |    CASE ch $rCase END,
       |    cum + CASE ch $rCase END
       |  FROM (
       |    SELECT g.t AS t, it.n1, it.s1, it.n2, it.s2, it.n3, it.s3,
       |      it.n4, it.s4, it.n5, it.s5, it.cum AS cum,
       |      g.r1 AS r1, g.r2 AS r2, g.r3 AS r3, g.r4 AS r4, g.r5 AS r5,
       |      CASE WHEN it.t + 1 <= 5 THEN CAST(it.t + 1 AS INT)
       |        WHEN ${u(1)} >= ${u(2)} AND ${u(1)} >= ${u(3)}
       |          AND ${u(1)} >= ${u(4)} AND ${u(1)} >= ${u(5)} THEN 1
       |        WHEN ${u(2)} >= ${u(3)} AND ${u(2)} >= ${u(4)}
       |          AND ${u(2)} >= ${u(5)} THEN 2
       |        WHEN ${u(3)} >= ${u(4)} AND ${u(3)} >= ${u(5)} THEN 3
       |        WHEN ${u(4)} >= ${u(5)} THEN 4
       |        ELSE 5 END AS ch
       |    FROM it JOIN grid g ON g.t = it.t + 1)),
       |tots AS (
       |  SELECT
       |${(1 to 5).map(i =>
           s"    CAST(SUM(CAST(r$i AS DECIMAL(28,12))) AS DOUBLE) AS t$i"
         ).mkString(",\n|")}
       |  FROM grid),
       |bsel AS (
       |  SELECT CASE
       |    WHEN t1 >= t2 AND t1 >= t3 AND t1 >= t4 AND t1 >= t5 THEN 1
       |    WHEN t2 >= t3 AND t2 >= t4 AND t2 >= t5 THEN 2
       |    WHEN t3 >= t4 AND t3 >= t5 THEN 3
       |    WHEN t4 >= t5 THEN 4
       |    ELSE 5 END AS ba
       |  FROM tots),
       |bcum AS (
       |  SELECT t, SUM(CASE ba $rCase END) OVER (ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bc
       |  FROM grid, bsel)
       |SELECT it.t AS t,
       |  CASE chosen $armCase END AS chosen_arm,
       |  ROUND(rew, 6) AS reward,
       |  ROUND(cum, 6) AS cum_reward,
       |  ROUND(bc - cum, 6) + 0.0 AS cum_regret
       |FROM it JOIN bcum ON bcum.t = it.t
       |WHERE it.t >= 1 ORDER BY t""".stripMargin
  }

  private def q400PermutationSql: String = {
    val seed = "(u * 31 + p * 7919)"
    val drw = s"((($seed % 1000003) * 2654435761) % 1000003 + " +
      s"$seed // 1000003) % 9999991 * 22695477 % 9999991"
    s"""WITH uu AS (
       |  SELECT user_id AS u,
       |    CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,12)))
       |      AS DOUBLE) / COUNT(*) AS v,
       |    user_id % 2 = 0 AS a
       |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na
       |  FROM uu),
       |obs AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN a THEN CAST(v AS DECIMAL(28,12)) END)
       |        AS DOUBLE) / CAST(na AS DOUBLE) -
       |      CAST(SUM(CASE WHEN NOT a THEN CAST(v AS DECIMAL(28,12)) END)
       |        AS DOUBLE) / CAST(n - na AS DOUBLE) AS od
       |  FROM uu, m GROUP BY n, na),
       |pm AS (
       |  SELECT u, v,
       |    CAST(UNNEST(generate_series(1, 64)) AS BIGINT) AS p
       |  FROM uu),
       |dr AS (SELECT u, v, p, $drw AS d FROM pm),
       |rl AS (
       |  SELECT p, v, n, na,
       |    ROW_NUMBER() OVER (PARTITION BY p ORDER BY d, u) AS rn
       |  FROM dr, m),
       |pp AS (
       |  SELECT p,
       |    CAST(SUM(CASE WHEN rn <= na
       |        THEN CAST(v AS DECIMAL(28,12)) END) AS DOUBLE) /
       |      CAST(na AS DOUBLE) -
       |      CAST(SUM(CASE WHEN NOT rn <= na
       |        THEN CAST(v AS DECIMAL(28,12)) END) AS DOUBLE) /
       |      CAST(n - na AS DOUBLE) AS pd
       |  FROM rl GROUP BY p, n, na),
       |card AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_perm,
       |    CAST(SUM(CASE WHEN ABS(pd) >= ABS(od) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_extreme
       |  FROM pp, obs)
       |SELECT m.n AS n_units, m.na AS n_a, m.n - m.na AS n_b,
       |  ROUND(od, 6) + 0.0 AS obs_diff,
       |  n_perm, n_extreme,
       |  ROUND(CAST(n_extreme + 1 AS DOUBLE) /
       |    CAST(n_perm + 1 AS DOUBLE), 6) AS p_value
       |FROM m, obs, card""".stripMargin
  }

  /** 3×3 determinant in the fixed [[graft]] det3 shape (row-major). */
  private def det3Sql(a: String, b: String, c: String, d: String,
      e: String, f: String, g: String, h: String, i: String): String =
    s"(($a) * (($e) * ($i) - ($f) * ($h)) - " +
      s"($b) * (($d) * ($i) - ($f) * ($g)) + " +
      s"($c) * (($d) * ($h) - ($e) * ($g)))"

  private def q401Logistic2Sql: String = {
    val det = det3Sql("s0", "s1", "s2", "s1", "s11", "s12",
      "s2", "s12", "s22")
    val d0 = det3Sql("g0", "s1", "s2", "g1", "s11", "s12",
      "g2", "s12", "s22")
    val d1 = det3Sql("s0", "g0", "s2", "s1", "g1", "s12",
      "s2", "g2", "s22")
    val d2 = det3Sql("s0", "s1", "g0", "s1", "s11", "g1",
      "s2", "s12", "g2")
    s"""WITH RECURSIVE d AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
       |    CAST(l_discount AS DOUBLE) AS x2,
       |    CASE WHEN l_returnflag <> 'N' THEN 1.0 ELSE 0.0 END AS y
       |  FROM lineitem WHERE l_orderkey < 500),
       |it(i, b0, b1, b2, ll) AS (
       |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |    CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
       |  UNION ALL
       |  SELECT i + 1,
       |    ROUND(b0 + $d0 / $det, 9),
       |    ROUND(b1 + $d1 / $det, 9),
       |    ROUND(b2 + $d2 / $det, 9),
       |    llm
       |  FROM (
       |    SELECT i, b0, b1, b2,
       |      CAST(SUM(CAST(y - p AS DECIMAL(28,12))) AS DOUBLE) AS g0,
       |      CAST(SUM(CAST((y - p) * x1 AS DECIMAL(28,12))) AS DOUBLE)
       |        AS g1,
       |      CAST(SUM(CAST((y - p) * x2 AS DECIMAL(28,12))) AS DOUBLE)
       |        AS g2,
       |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
       |        AS s0,
       |      CAST(SUM(CAST(p * (1.0 - p) * x1 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s1,
       |      CAST(SUM(CAST(p * (1.0 - p) * x2 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s2,
       |      CAST(SUM(CAST(p * (1.0 - p) * x1 * x1 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s11,
       |      CAST(SUM(CAST(p * (1.0 - p) * x1 * x2 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s12,
       |      CAST(SUM(CAST(p * (1.0 - p) * x2 * x2 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s22,
       |      ROUND(CAST(SUM(CAST(y * LN(p) + (1.0 - y) * LN(1.0 - p)
       |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
       |    FROM (
       |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, it.b2 AS b2,
       |        d.x1 AS x1, d.x2 AS x2, d.y AS y,
       |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x1 +
       |          it.b2 * d.x2))) AS p
       |      FROM it, d
       |      WHERE it.i < 6)
       |    GROUP BY i, b0, b1, b2))
       |SELECT i AS iter, ROUND(b0, 6) + 0.0 AS b0,
       |  ROUND(b1, 6) + 0.0 AS b1, ROUND(b2, 6) + 0.0 AS b2,
       |  ll AS log_loss
       |FROM it WHERE i >= 1
       |ORDER BY iter""".stripMargin
  }

  private def q402CartographySql: String = {
    val vterm = (1 to 6)
      .map(i => s"(p$i - cm) * (p$i - cm)").mkString(" + ")
    s"""WITH RECURSIVE d AS (
       |  SELECT l_orderkey AS k1, l_linenumber AS k2,
       |    CAST(l_quantity AS DOUBLE) AS x,
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
       |ps AS (
       |  SELECT
       |${(1 to 6).map(i =>
           s"    MAX(CASE WHEN i = $i THEN b0 END) AS a$i,\n" +
           s"|    MAX(CASE WHEN i = $i THEN b1 END) AS c$i")
         .mkString(",\n|")}
       |  FROM it WHERE i >= 1),
       |pv AS (
       |  SELECT
       |${(1 to 6).map(i =>
           s"    CASE WHEN d.y = 1.0 " +
           s"THEN 1.0 / (1.0 + EXP(-(a$i + c$i * d.x))) " +
           s"ELSE 1.0 - 1.0 / (1.0 + EXP(-(a$i + c$i * d.x))) END AS p$i")
         .mkString(",\n|")}
       |  FROM d, ps),
       |cv0 AS (
       |  SELECT p1, p2, p3, p4, p5, p6,
       |    (p1 + p2 + p3 + p4 + p5 + p6) / 6.0 AS cm
       |  FROM pv),
       |cv AS (
       |  SELECT ROUND(cm, 9) AS conf,
       |    ROUND(($vterm) / 6.0, 9) AS vr
       |  FROM cv0)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_examples,
       |  CAST(SUM(CASE WHEN conf >= 0.7 AND vr < 0.15 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_easy,
       |  CAST(SUM(CASE WHEN vr >= 0.15 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_ambiguous,
       |  CAST(SUM(CASE WHEN conf <= 0.3 AND vr < 0.15 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hard,
       |  CAST(SUM(CASE WHEN NOT (conf >= 0.7 AND vr < 0.15)
       |    AND NOT (conf <= 0.3 AND vr < 0.15)
       |    AND NOT vr >= 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
       |  ROUND(CAST(SUM(CAST(conf AS DECIMAL(28,12))) AS DOUBLE) /
       |    COUNT(*), 6) AS mean_confidence,
       |  ROUND(CAST(SUM(CAST(vr AS DECIMAL(28,12))) AS DOUBLE) /
       |    COUNT(*), 6) AS mean_variability
       |FROM cv""".stripMargin
  }

  private def q404RfmSql: String = {
    def midq(dim: String, desc: Boolean): String = {
      val mid = s"CAST(prev AS DOUBLE) + CAST(cnt + 1 AS DOUBLE) / 2.0"
      val q =
        if (desc)
          s"CEIL((CAST(n AS DOUBLE) - ($mid) + 1.0) * 5 / " +
            "CAST(n AS DOUBLE))"
        else s"CEIL(($mid) * 5 / CAST(n AS DOUBLE))"
      s"""${dim}v AS (
         |  SELECT $dim AS v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM pc GROUP BY $dim),
         |${dim}c AS (
         |  SELECT v, cnt,
         |    CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) - cnt AS prev
         |  FROM ${dim}v),
         |${dim}q AS (
         |  SELECT v, CAST($q AS BIGINT) AS qq FROM ${dim}c, nn)"""
        .stripMargin
    }
    s"""WITH hz AS (
       |  SELECT MAX(epoch_us(o_orderdate)) AS h FROM orders),
       |pc AS (
       |  SELECT o_custkey AS cust,
       |    (h - MAX(epoch_us(o_orderdate))) // 86400000000 AS recency,
       |    CAST(COUNT(*) AS BIGINT) AS freq,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
       |      AS monetary
       |  FROM orders, hz WHERE o_custkey IS NOT NULL
       |  GROUP BY o_custkey, h),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pc),
       |${midq("recency", desc = true)},
       |${midq("freq", desc = false)},
       |${midq("monetary", desc = false)},
       |j AS (
       |  SELECT pc.monetary AS monetary, rq.qq AS r, fq2.qq AS f,
       |    mq.qq AS m
       |  FROM pc
       |    JOIN recencyq rq ON pc.recency = rq.v
       |    JOIN freqq fq2 ON pc.freq = fq2.v
       |    JOIN monetaryq mq ON pc.monetary = mq.v),
       |cells AS (
       |  SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers,
       |    CAST(SUM(CAST(monetary AS DECIMAL(28,2))) AS DOUBLE) AS sm
       |  FROM j GROUP BY r, f, m),
       |tot AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS nt FROM cells)
       |SELECT r, f, m, n_customers,
       |  ROUND(sm / CAST(n_customers AS DOUBLE), 6) AS mean_monetary,
       |  ROUND(CAST(n_customers AS DOUBLE) / CAST(nt AS DOUBLE), 6)
       |    AS share
       |FROM cells, tot ORDER BY r, f, m""".stripMargin
  }

  private def q388SignTestSql: String =
    (s"""WITH $dailySeriesCtes,
       |d AS (SELECT x - LAG(x) OVER (ORDER BY i) AS dd FROM series),
       |m0 AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos,
       |    CAST(SUM(CASE WHEN dd < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_neg,
       |    CAST(SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_ties
       |  FROM d WHERE dd IS NOT NULL),
       |m1 AS (
       |  SELECT n_pos, n_neg, n_ties, n_pos + n_neg AS m,
       |    GREATEST(n_pos, n_neg) AS k
       |  FROM m0),
       |ks AS (
       |  SELECT CAST(m AS DOUBLE) AS md,
       |    CAST(UNNEST(generate_series(k, m)) AS DOUBLE) AS jd
       |  FROM m1),
       |terms AS (
       |  SELECT (${lnChooseSql("md", "jd")} - md * LN(2.0)) AS lt
       |  FROM ks),
       |mx AS (SELECT MAX(lt) AS mxv FROM terms),
       |s AS (
       |  SELECT CAST(SUM(CAST(EXP(lt - mxv) AS DECIMAL(28,12)))
       |      AS DOUBLE) AS sv,
       |    MAX(mxv) AS mxv
       |  FROM terms, mx)
       |SELECT n_pos, n_neg, n_ties, m, k,
       |  ROUND(EXP(mxv + LN(sv)), 6) AS p_right,
       |  ROUND(LEAST(1.0, 2.0 * EXP(mxv + LN(sv))), 6) AS p_two_sided
       |FROM m1, s""").stripMargin

  private def q391RrSql: String = {
    def draw(tag: String): String = {
      val hx = hexPoly15(s"MD5('rr:$tag:' || CAST(user_id AS VARCHAR))")
      s"(CAST(((($hx % 1000003) * 2654435761) % 1000003 + " +
        s"($hx) // 1000003) % 9999991 * 22695477 % 9999991 AS DOUBLE) " +
        "+ 0.5) / 9999991.0"
    }
    s"""WITH u AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
       |      AS truth
       |  FROM events GROUP BY user_id),
       |r AS (
       |  SELECT truth,
       |    CASE WHEN ${draw("h")} < 0.75 THEN truth
       |      ELSE ${draw("c")} < 0.5 END AS resp
       |  FROM u),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |    CAST(SUM(CASE WHEN resp THEN 1 ELSE 0 END) AS BIGINT) AS ny
       |  FROM r),
       |d AS (
       |  SELECT n, nt, ny, CAST(n AS DOUBLE) AS nd,
       |    CAST(ny AS DOUBLE) / CAST(n AS DOUBLE) AS y
       |  FROM agg)
       |SELECT n,
       |  ROUND(CAST(nt AS DOUBLE) / nd, 6) AS true_rate,
       |  ROUND(y, 6) AS observed_yes_rate,
       |  ROUND((y - (1.0 - 0.75) / 2.0) / 0.75, 6) AS rr_estimate,
       |  ROUND(SQRT(y * (1.0 - y) / nd) / 0.75, 6) AS rr_se,
       |  ROUND(ABS((y - (1.0 - 0.75) / 2.0) / 0.75 -
       |    CAST(nt AS DOUBLE) / nd), 6) AS abs_err,
       |  CAST(0.75 AS DOUBLE) AS p_truth
       |FROM d""".stripMargin
  }

  private def q392NegbinSql: String = {
    val llp = s"xd * LN(m) - m - ${lnFactSql("xd")}"
    val llnb = s"${lnGammaSql("xd + r")} - ${lnGammaSql("r")} - " +
      s"${lnFactSql("xd")} + r * LN(r / (r + m)) + " +
      "xd * LN(m / (r + m))"
    s"""WITH $dailySeriesCtes,
       |m0 AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
       |  FROM series),
       |mom AS (
       |  SELECT n, sx / CAST(n AS DOUBLE) AS m,
       |    (sxx - sx * sx / CAST(n AS DOUBLE)) /
       |      (CAST(n AS DOUBLE) - 1.0) AS v
       |  FROM m0),
       |mom2 AS (
       |  SELECT n, m, v,
       |    CASE WHEN v > m THEN m * m / (v - m) END AS r
       |  FROM mom),
       |xs AS (
       |  SELECT CAST(s.x AS DOUBLE) AS xd, mom2.m, mom2.v, mom2.r
       |  FROM series s, mom2),
       |ll AS (
       |  SELECT
       |    CAST(SUM(CAST(ROUND($llp, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE) AS llp,
       |    CAST(SUM(CASE WHEN r > 0 THEN
       |      CAST(ROUND($llnb, 12) AS DECIMAL(38,12)) END)
       |      AS DOUBLE) AS llnb
       |  FROM xs)
       |SELECT mom2.n AS n_days, ROUND(m, 6) AS mean_daily,
       |  ROUND(v, 6) AS var_daily,
       |  ROUND(v / m, 6) AS vmr,
       |  ROUND(r, 6) AS nb_size,
       |  ROUND(llp, 6) AS ll_poisson,
       |  ROUND(llnb, 6) AS ll_negbin,
       |  ROUND(2.0 * (llnb - llp) - 2.0, 6) + 0.0 AS delta_aic
       |FROM mom2, ll""".stripMargin
  }

  private def q393WeibullSql: String =
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
      |km AS (
      |  SELECT t, n_event, n_censored,
      |    SUM(n_event + n_censored) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      |  FROM byt),
      |kmf AS (
      |  SELECT t,
      |    CASE WHEN n_event = n_risk THEN 0.0
      |      ELSE ROUND(EXP(SUM(CASE WHEN n_event < n_risk
      |        THEN LN(1.0 - CAST(n_event AS DOUBLE) / n_risk)
      |        ELSE 0.0 END)
      |      OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END
      |      AS survival
      |  FROM km),
      |pts AS (
      |  SELECT LN(CAST(t AS DOUBLE)) AS z, LN(-LN(survival)) AS y
      |  FROM kmf WHERE t > 0 AND survival > 0 AND survival < 1),
      |mm AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
      |    CAST(SUM(CAST(ROUND(z, 12) AS DECIMAL(38,12))) AS DOUBLE)
      |      AS sz,
      |    CAST(SUM(CAST(ROUND(z * z, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) AS szz,
      |    CAST(SUM(CAST(ROUND(y, 12) AS DECIMAL(38,12))) AS DOUBLE)
      |      AS sy,
      |    CAST(SUM(CAST(ROUND(y * y, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(ROUND(z * y, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) AS szy
      |  FROM pts),
      |fit AS (
      |  SELECT n_points, CAST(n_points AS DOUBLE) AS nd,
      |    (CAST(n_points AS DOUBLE) * szy - sz * sy) /
      |      (CAST(n_points AS DOUBLE) * szz - sz * sz) AS slope,
      |    sz, sy, szz, syy, szy
      |  FROM mm WHERE n_points >= 3)
      |SELECT n_points,
      |  ROUND(slope, 6) AS shape_k,
      |  ROUND(EXP(-((sy - slope * sz) / nd) / slope), 6)
      |    AS scale_lambda,
      |  CASE WHEN (nd * szz - sz * sz) * (nd * syy - sy * sy) > 0
      |    THEN ROUND((nd * szy - sz * sy) * (nd * szy - sz * sy) /
      |      ((nd * szz - sz * sz) * (nd * syy - sy * sy)), 6) END AS r2,
      |  ROUND(EXP(-((sy - slope * sz) / nd) / slope) *
      |    EXP(LN(LN(2.0)) / slope), 6) AS median_time
      |FROM fit""".stripMargin

  private def q248PackingSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok,
      |    CAST(SUM(tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_end
      |  FROM t),
      |f AS (
      |  SELECT tok, cum_end,
      |    CASE WHEN tok > 0 THEN
      |      (cum_end - 1) // 512 - (cum_end - tok) // 512 + 1
      |    ELSE 0 END AS frag
      |  FROM c)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |  CAST(512 AS BIGINT) AS context_len,
      |  CAST((SUM(tok) + 511) // 512 AS BIGINT) AS n_contexts,
      |  CAST(SUM(CASE WHEN frag >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_docs_split,
      |  CAST(SUM(frag) AS BIGINT) AS n_fragments,
      |  CAST(((SUM(tok) + 511) // 512) * 512 - SUM(tok) AS BIGINT)
      |    AS tail_waste_tokens,
      |  ROUND(SUM(CASE WHEN frag >= 2 THEN 1 ELSE 0 END) /
      |    CAST(COUNT(*) AS DOUBLE), 6) AS split_frac
      |FROM f""".stripMargin

  /** q251 oracle: cluster-occupancy drift replayed — q241's full-corpus
    * portable draw/assignment, q247's hash-half slices, Laplace-smoothed
    * per-cluster JS contributions with the identical double expression
    * shape, total row accumulated through DECIMAL(28,6).
    */
  private def q251ClusterDriftSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    ((vec_id % 1000003) * 2654435761) % 20 >= 10 AS b
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
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |assign AS (
      |  SELECT vec_id, b, centroid_id FROM (
      |    SELECT t.vec_id, t.b, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |occ AS (
      |  SELECT centroid_id,
      |    CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM assign GROUP BY centroid_id),
      |f AS (
      |  SELECT c.centroid_id, COALESCE(o.n_a, 0) AS n_a,
      |    COALESCE(o.n_b, 0) AS n_b
      |  FROM cent c LEFT JOIN occ o USING (centroid_id)),
      |tot AS (
      |  SELECT CAST(SUM(n_a) AS BIGINT) AS na,
      |    CAST(SUM(n_b) AS BIGINT) AS nb FROM f),
      |sm AS (
      |  SELECT f.centroid_id, f.n_a, f.n_b,
      |    CAST(f.n_a + 1 AS DOUBLE) / CAST(t.na + 8 AS DOUBLE) AS pa,
      |    CAST(f.n_b + 1 AS DOUBLE) / CAST(t.nb + 8 AS DOUBLE) AS pb
      |  FROM f CROSS JOIN tot t),
      |jc AS (
      |  SELECT centroid_id, n_a, n_b, pa, pb,
      |    ROUND(0.5 * (pa * LN(pa / ((pa + pb) / 2.0)) +
      |                 pb * LN(pb / ((pa + pb) / 2.0))), 6) AS js_contrib
      |  FROM sm)
      |SELECT CAST(centroid_id AS BIGINT) AS centroid_id, n_a, n_b,
      |  ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b, js_contrib
      |FROM jc
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT), t.na, t.nb,
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  CAST(SUM(CAST(js_contrib AS DECIMAL(28,6))) AS DOUBLE)
      |FROM jc CROSS JOIN tot t GROUP BY t.na, t.nb
      |ORDER BY centroid_id""".stripMargin

  /** q252 oracle: cohesion margins replayed — portable draw, round-6
    * cosines ranked per vector (top-2), DECIMAL(28,6) mean
    * accumulation.
    */
  private def q394DaviesBouldinSql: String = {
    def dist(a: String, b: String): String =
      s"SQRT(GREATEST(0.0, list_inner_product($a, $a) - " +
        s"2.0 * list_inner_product($a, $b) + " +
        s"list_inner_product($b, $b)))"
    s"""WITH e AS (
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
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |asg AS (
      |  SELECT vec_id, emb, centroid_id, centroid FROM (
      |    SELECT t.vec_id, t.emb, c.centroid_id, c.centroid,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |sc AS (
      |  SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    CAST(SUM(CAST(ROUND(${dist("emb", "centroid")}, 12)
      |      AS DECIMAL(38,12))) AS DOUBLE) AS sd
      |  FROM asg GROUP BY centroid_id),
      |sc2 AS (
      |  SELECT centroid_id, n_vecs, sd / CAST(n_vecs AS DOUBLE) AS si
      |  FROM sc),
      |pr AS (
      |  SELECT a.centroid_id AS ci, b.centroid_id AS cj,
      |    ${dist("a.centroid", "b.centroid")} AS m
      |  FROM cent a JOIN cent b ON a.centroid_id <> b.centroid_id),
      |ri AS (
      |  SELECT pr.ci AS ci, s1.n_vecs, s1.si,
      |    MAX((s1.si + s2.si) / pr.m) AS r_max,
      |    MIN(pr.m) AS min_sep
      |  FROM pr JOIN sc2 s1 ON s1.centroid_id = pr.ci
      |    JOIN sc2 s2 ON s2.centroid_id = pr.cj
      |  WHERE pr.m > 0
      |  GROUP BY pr.ci, s1.n_vecs, s1.si),
      |dbx AS (
      |  SELECT CAST(SUM(CAST(ROUND(r_max, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS db,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM ri)
      |SELECT CAST(ci AS BIGINT) AS centroid_id, n_vecs,
      |  ROUND(si, 6) AS scatter,
      |  ROUND(min_sep, 6) AS min_separation,
      |  ROUND(r_max, 6) AS db_component,
      |  k AS k_clusters,
      |  ROUND(db, 6) AS db_index
      |FROM ri, dbx ORDER BY centroid_id""".stripMargin
  }

  private def q252ClusterCohesionSql: String =
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
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |scored AS (
      |  SELECT t.vec_id, c.centroid_id,
      |    ROUND(list_inner_product(t.emb, c.centroid) /
      |      (SQRT(list_inner_product(t.emb, t.emb)) *
      |       SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |      AS sim,
      |    ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |      ROUND(list_inner_product(t.emb, c.centroid) /
      |        (SQRT(list_inner_product(t.emb, t.emb)) *
      |         SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |        DESC,
      |      c.centroid_id) AS rn
      |  FROM e t, cent c),
      |top2 AS (
      |  SELECT vec_id,
      |    MAX(CASE WHEN rn = 1 THEN centroid_id END) AS own_cid,
      |    MAX(CASE WHEN rn = 1 THEN sim END) AS own_sim,
      |    MAX(CASE WHEN rn = 2 THEN sim END) AS next_sim
      |  FROM scored WHERE rn <= 2 GROUP BY vec_id)
      |SELECT CAST(own_cid AS BIGINT) AS centroid_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(own_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_own_cos,
      |  ROUND(CAST(SUM(CAST(next_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_next_cos,
      |  ROUND(ROUND(CAST(SUM(CAST(own_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE), 6) -
      |    ROUND(CAST(SUM(CAST(next_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE), 6), 6) AS margin
      |FROM top2
      |GROUP BY own_cid
      |ORDER BY centroid_id""".stripMargin

  /** q256 oracle: purity/NMI replayed — portable draw/assignment, the
    * bounded contingency table, every entropy/MI term accumulated
    * through DECIMAL(28,18) (q247's reduction convention), nmi computed
    * from the RAW sums and rounded last.
    */
  private def q256ClusterLabelSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    CAST(label AS BIGINT) AS l
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
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |assign AS (
      |  SELECT vec_id, l, centroid_id FROM (
      |    SELECT t.vec_id, t.l, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |cont AS (
      |  SELECT centroid_id, l, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM assign GROUP BY centroid_id, l),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cont),
      |byc AS (
      |  SELECT centroid_id, CAST(SUM(n) AS BIGINT) AS nc,
      |    CAST(MAX(n) AS BIGINT) AS maxl
      |  FROM cont GROUP BY centroid_id),
      |byl AS (
      |  SELECT l, CAST(SUM(n) AS BIGINT) AS nl FROM cont GROUP BY l),
      |hc AS (
      |  SELECT CAST(SUM(CAST(
      |      (-(CAST(nc AS DOUBLE) / CAST(t.nn AS DOUBLE))) *
      |      LN(CAST(nc AS DOUBLE) / CAST(t.nn AS DOUBLE))
      |    AS DECIMAL(28,18))) AS DOUBLE) AS h_cluster
      |  FROM byc CROSS JOIN tot t),
      |hl AS (
      |  SELECT CAST(SUM(CAST(
      |      (-(CAST(nl AS DOUBLE) / CAST(t.nn AS DOUBLE))) *
      |      LN(CAST(nl AS DOUBLE) / CAST(t.nn AS DOUBLE))
      |    AS DECIMAL(28,18))) AS DOUBLE) AS h_label
      |  FROM byl CROSS JOIN tot t),
      |mi AS (
      |  SELECT CAST(SUM(CAST(
      |      (CAST(c.n AS DOUBLE) / CAST(t.nn AS DOUBLE)) *
      |      LN(CAST(c.n AS DOUBLE) * CAST(t.nn AS DOUBLE) /
      |        (CAST(b.nc AS DOUBLE) * CAST(y.nl AS DOUBLE)))
      |    AS DECIMAL(28,18))) AS DOUBLE) AS mi
      |  FROM cont c
      |  JOIN byc b USING (centroid_id)
      |  JOIN byl y USING (l)
      |  CROSS JOIN tot t),
      |pur AS (
      |  SELECT CAST(MAX(t.nn) AS BIGINT) AS n_vecs,
      |    COUNT(*) AS n_clusters,
      |    CAST(SUM(maxl) AS BIGINT) AS pure
      |  FROM byc CROSS JOIN tot t),
      |nl2 AS (SELECT COUNT(*) AS n_labels FROM byl)
      |SELECT p.n_vecs, p.n_clusters, nl2.n_labels,
      |  ROUND(CAST(p.pure AS DOUBLE) / CAST(p.n_vecs AS DOUBLE), 6)
      |    AS purity,
      |  ROUND(hc.h_cluster, 6) AS h_cluster,
      |  ROUND(hl.h_label, 6) AS h_label,
      |  ROUND(mi.mi, 6) AS mi,
      |  CASE WHEN hc.h_cluster > 0.0 AND hl.h_label > 0.0 THEN
      |    ROUND(mi.mi / SQRT(hc.h_cluster * hl.h_label), 6) END AS nmi
      |FROM pur p, nl2, hc, hl, mi""".stripMargin

  /** q311's vocabulary hash sweep: terms drawn through
    * hexPoly15(MD5(term)) and the two-round congruential generator,
    * bucketed mod each dim, rolled up to collision counts and mass.
    */
  private def q311HashCollisionSql: String =
    s"""WITH tok AS (
       |  SELECT u.w AS term
       |  FROM (SELECT string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents) t, UNNEST(toks) AS u(w)
       |  WHERE u.w <> ''),
       |terms AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS occ
       |  FROM tok GROUP BY term),
       |hx AS (
       |  SELECT term, occ, ${hexPoly15("MD5(term)")} AS x
       |  FROM terms),
       |d2 AS (
       |  SELECT term, occ,
       |    ((((((x % 1000003) * 2654435761) % 1000003)
       |      + (x // 1000003)) % 9999991) * 22695477) % 9999991 AS x2
       |  FROM hx),
       |ex AS (
       |  SELECT term, occ, x2, dim
       |  FROM d2 CROSS JOIN (SELECT UNNEST([256, 1024, 4096]) AS dim)),
       |pb AS (
       |  SELECT dim, x2 % CAST(dim AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS bt,
       |    CAST(SUM(occ) AS BIGINT) AS bm
       |  FROM ex GROUP BY dim, bucket)
       |SELECT dim,
       |  CAST(SUM(bt) AS BIGINT) AS n_terms,
       |  CAST(COUNT(*) AS BIGINT) AS buckets_used,
       |  CAST(SUM(CASE WHEN bt >= 2 THEN bt ELSE 0 END) AS BIGINT)
       |    AS colliding_terms,
       |  ROUND(CAST(SUM(CASE WHEN bt >= 2 THEN bt ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(bt) AS DOUBLE), 6) AS collision_rate,
       |  ROUND(CAST(SUM(CASE WHEN bt >= 2 THEN bm ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(bm) AS DOUBLE), 6) AS colliding_mass_share
       |FROM pb GROUP BY dim
       |ORDER BY dim""".stripMargin

  /** q315's HITS fixed point unrolled: per round, auth raw sums from the
    * previous hub frame, BIGINT floor-normalization against the round
    * max, then the hub half symmetrically. Exact integers end to end.
    * Every step CTE is MATERIALIZED: each round's score frame is
    * referenced twice (raw sums + their max), so DuckDB's default CTE
    * inlining would otherwise expand the plan 4^rounds-fold.
    */
  private def hitsOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""ar$r AS MATERIALIZED (
         |  SELECT e.dst AS v, CAST(SUM(h.s) AS BIGINT) AS raw
         |  FROM e JOIN h${r - 1} h ON e.src = h.v GROUP BY e.dst),
         |a$r AS MATERIALIZED (
         |  SELECT v, raw * 1000000 // (SELECT MAX(raw) FROM ar$r) AS s
         |  FROM ar$r),
         |hr$r AS MATERIALIZED (
         |  SELECT e.src AS v, CAST(SUM(a.s) AS BIGINT) AS raw
         |  FROM e JOIN a$r a ON e.dst = a.v GROUP BY e.src),
         |h$r AS MATERIALIZED (
         |  SELECT v, raw * 1000000 // (SELECT MAX(raw) FROM hr$r) AS s
         |  FROM hr$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |h0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, CAST(1000000 AS BIGINT) AS s FROM e),
       |$steps
       |SELECT 'hub' AS side, v AS id, s AS score_fp,
       |  ROUND(CAST(s AS DOUBLE) / 1000000.0, 6) AS score
       |FROM (SELECT v, s FROM h$rounds ORDER BY s DESC, v LIMIT 10)
       |UNION ALL
       |SELECT 'authority' AS side, v AS id, s AS score_fp,
       |  ROUND(CAST(s AS DOUBLE) / 1000000.0, 6) AS score
       |FROM (SELECT v, s FROM a$rounds ORDER BY s DESC, v LIMIT 10)
       |ORDER BY side, score_fp DESC, id""".stripMargin
  }

  /** q306's greedy MMR loop unrolled: c0 scores every vector against the
    * smallest-id anchor; each step picks argmax ROUND(0.7·rel−0.3·ms,6)
    * (id tie-break) from c_{i−1} and folds the pick's rounded cosine
    * into the survivors' running max-sim.
    */
  private def mmrOracleSql(k: Int): String = {
    def cos(a: String, b: String): String =
      s"ROUND(list_inner_product($a, $b) / " +
        s"(SQRT(list_inner_product($a, $a)) * " +
        s"SQRT(list_inner_product($b, $b))), 6)"
    val steps = (1 to k).map { i =>
      val prev = s"c${i - 1}"
      val pick =
        s"""p$i AS (
           |  SELECT vec_id, emb, rel, ms FROM $prev
           |  ORDER BY ROUND(0.7 * rel - 0.3 * ms, 6) DESC, vec_id
           |  LIMIT 1)""".stripMargin
      val next = if (i == k) "" else
        s""",
           |c$i AS (
           |  SELECT c.vec_id, c.emb, c.rel,
           |    GREATEST(c.ms, ${cos("c.emb", "p.emb")}) AS ms
           |  FROM $prev c CROSS JOIN p$i p
           |  WHERE c.vec_id <> p.vec_id)""".stripMargin
      pick + next
    }.mkString(",\n")
    val out = (1 to k).map { i =>
      s"""SELECT $i AS pick_rank, vec_id, rel AS relevance,
         |  ROUND(ms, 6) AS max_sim,
         |  ROUND(0.7 * rel - 0.3 * ms, 6) AS mmr_score FROM p$i"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |anc AS (SELECT emb FROM e ORDER BY vec_id LIMIT 1),
       |c0 AS (
       |  SELECT e.vec_id, e.emb,
       |    ${cos("e.emb", "a.emb")} AS rel,
       |    0.0 AS ms
       |  FROM e CROSS JOIN anc a),
       |$steps
       |$out
       |ORDER BY pick_rank""".stripMargin
  }
  /** q309's fairness-card SQL, shared verbatim by the q314 streaming
    * twin (additive confusion cells; stream ≡ batch contract).
    */
  private def q309FairnessSql: String =
      """WITH d AS (
        |  SELECT o_orderpriority AS grp,
        |    o_totalprice > 150000 AS y,
        |    ((o_orderkey % 1000) / 1000.0 + o_totalprice / 1e6) > 0.65
        |      AS p
        |  FROM orders),
        |c AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN y AND p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp,
        |    CAST(SUM(CASE WHEN (NOT y) AND p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN y AND (NOT p) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN (NOT y) AND (NOT p) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM d GROUP BY grp),
        |g AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(tp) AS BIGINT) AS gtp,
        |    CAST(SUM(fp) AS BIGINT) AS gfp,
        |    CAST(SUM(fn) AS BIGINT) AS gfn,
        |    CAST(SUM(tn) AS BIGINT) AS gtn
        |  FROM c)
        |SELECT grp AS o_orderpriority, n,
        |  ROUND(CASE WHEN n > 0 THEN
        |    CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS selection_rate,
        |  ROUND(CASE WHEN n > 0 THEN
        |    CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE) END -
        |    CASE WHEN nn > 0 THEN
        |      CAST(gtp + gfp AS DOUBLE) / CAST(nn AS DOUBLE) END, 6)
        |    AS dp_gap,
        |  ROUND(CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 6) AS tpr,
        |  ROUND(CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END -
        |    CASE WHEN gtp + gfn > 0 THEN
        |      CAST(gtp AS DOUBLE) / CAST(gtp + gfn AS DOUBLE) END, 6)
        |    AS eo_gap,
        |  ROUND(CASE WHEN fp + tn > 0 THEN
        |    CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) END, 6) AS fpr,
        |  ROUND(CASE WHEN fp + tn > 0 THEN
        |    CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) END -
        |    CASE WHEN gfp + gtn > 0 THEN
        |      CAST(gfp AS DOUBLE) / CAST(gfp + gtn AS DOUBLE) END, 6)
        |    AS fpr_gap,
        |  ROUND(CASE WHEN tp + fp > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6)
        |    AS predictive_parity
        |FROM c CROSS JOIN g
        |ORDER BY o_orderpriority""".stripMargin

}
