package graft

/** Oracle SQL map, part 2 of the file split (q121_ab_ztest…q279_embedding_outliers). */
private[graft] trait OracleSqlPart2 extends OracleSqlPart1 {

  protected def sqlPart2: Map[String, String] = Map(

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
  )
}
