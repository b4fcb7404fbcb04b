package graft

/** Oracle SQL map, part 1 of the file split (q01_pricing_summary…q118_pagerank). */
private[graft] trait OracleSqlPart1 extends OracleDefs2 {

  protected def sqlPart1: Map[String, String] = Map(
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
        |ORDER BY l_orderkey, l_linenumber, rw_mean""".stripMargin,

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
        |  FROM drawn
        |  QUALIFY ROW_NUMBER() OVER (ORDER BY d, vec_id) <=
        |    GREATEST(8, CAST(CEIL(COUNT(*) OVER () / 250.0) AS BIGINT))),
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
  )
}
