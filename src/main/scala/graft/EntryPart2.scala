package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stats._
import graft.metrics.MetricQueries
import graft.ml.MlPipelines
import graft.operators._

/** Query surface part 2 (file split only): LLM-pipeline operators — dedup, retrieval, sketches, drift, eval cards, portable-twin fits. */
private[graft] trait EntryPart2 extends EntryPart1 {

  // ---------------------------------------------------------------- q96
  // Blocked fuzzy string matching (entity resolution): distinct part
  // names paired within a BLOCK (shared final token) and filtered by edit
  // distance — the blocked-join shape that keeps fuzzy matching off the
  // all-pairs cliff at catalog scale.
  def q96(spark: SparkSession, dir: String): DataFrame = {
    val names = t(spark, dir, "part").select(col("p_name")).distinct()
      .withColumn("noun", element_at(split(col("p_name"), " "), -1))
    val l = names.select(col("noun"), col("p_name").as("name_a"))
    val r = names.select(col("noun"), col("p_name").as("name_b"))
    l.join(r, Seq("noun"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 4)
      .select(col("name_a"), col("name_b"), col("dist"))
      .orderBy(col("name_a"), col("name_b"))
  }

  // ---------------------------------------------------------------- q97
  // Unigram-LM corpus statistics (text-quality family): per-document mean
  // corpus term frequency and rare-token fraction — the "how ordinary is
  // this document's vocabulary" signal an LM-data pipeline filters on.
  // Exact integer numerators, so the oracle matches at full hash parity.
  def q97(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenLmStats(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q98
  // Character-distribution quality: Shannon entropy, Simpson diversity,
  // and top-char share per document — the low-entropy/padding detector of
  // the Gopher-rule family (complements q71's token-repetition rules).
  def q98(spark: SparkSession, dir: String): DataFrame =
    TextOps.withCharDiversity(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q99
  // Robust outlier flagging: per-event-type median, MAD, and |x−med| >
  // 3·MAD counts — the outlier rule that survives a corrupted ingest
  // window where q82's mean/std z-score saturates. Exact type-7 medians
  // match DuckDB's quantile_cont bit-for-bit.
  def q99(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.madOutliers(
        t(spark, dir, "events"), "event_type", "value")
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q100
  // Chi-square test of independence: is event type associated with
  // high-value activity? Contingency counts + margin joins, each cell's
  // (o−e)²/e accumulated as an exact decimal — the feature-vs-label
  // association screen of a tabular pipeline (complements q95's Pearson
  // correlations with a categorical test).
  def q100(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.chiSquare(
      t(spark, dir, "events"),
      col("event_type"),
      when(col("value") >= 50, 1).otherwise(0))

  // ---------------------------------------------------------------- q101
  // Lower weighted median: quantity-weighted median extended price per
  // return flag — the importance-weighted quantile a corpus-mixing pass
  // uses ("median document quality weighted by token count"). Exact
  // decimal cumulative weights, no-division threshold rule, value-level
  // pre-aggregation → total-order deterministic in any engine.
  def q101(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.weightedMedianLower(
        t(spark, dir, "lineitem"),
        "l_returnflag", "l_extendedprice", "l_quantity")
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q102
  // Ordered conversion funnel (view → click → purchase, first-touch,
  // strictly increasing timestamps): per-stage user counts and conversion
  // rates — the behavioral-analytics staple, as a chain of user-keyed
  // min-aggregations with no pair blow-up.
  def q102(spark: SparkSession, dir: String): DataFrame =
    graft.operators.FunnelOps.funnel(
        t(spark, dir, "events"), "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .orderBy(col("stage_idx"))

  // ---------------------------------------------------------------- q103
  // Weekly cohort retention: users bucketed by first-event week, counted
  // in each later week they stay active — the engagement matrix behind
  // every retention dashboard. Integer epoch-week arithmetic end to end.
  def q103(spark: SparkSession, dir: String): DataFrame =
    graft.operators.FunnelOps.cohortRetention(
        t(spark, dir, "events"), "user_id", "ts", maxOffsetWeeks = 3)
      .orderBy(col("cohort_week"), col("week_offset"))

  // ---------------------------------------------------------------- q104
  // Column profile of the events table: row/null/distinct audit per
  // column — the ingest gate of a data lake. Timestamps are profiled at
  // epoch-micros so the count is precision-portable across engines.
  def q104(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.columnProfile(
        t(spark, dir, "events"),
        Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
        keyExpr = Map("ts" -> unix_micros(col("ts"))))
      .orderBy(col("column"))

  // ---------------------------------------------------------------- q105
  // PCA explained variance over the embeddings table: the dimensionality
  // screen before building an ANN index. Rows-only (eigendecomposition is
  // not SQL-replicable); the operator is spec'd against orthonormality and
  // variance-ordering invariants.
  def q105(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.pcaExplainedVariance(
        t(spark, dir, "embeddings"), "embedding", k = 8)
      .orderBy(col("component"))

  // ---------------------------------------------------------------- q106
  // Grid-search cross-validation (hyperparameter selection, the reference's
  // training-loop companion): logistic-regression regularization grid over
  // deterministic hash folds, pooled held-out accuracy per grid point,
  // best flagged. Rows-only (MLlib fits); fold determinism is the same
  // SplitOps surface q20/q30 oracle-prove.
  def q106(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.gridSearchLogReg(
        withReturnFlagBin(
          t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)),
        "l_orderkey",
        Seq("l_quantity", "l_extendedprice", "l_tax"),
        "l_returnflag_bin", Seq(0.01, 0.1, 1.0), k = 5)

  // ---------------------------------------------------------------- q107
  // Mergeable-sketch distinct counting: per-day HLL sketches of active
  // users, unioned per event type — THE 100 TB pattern for distinct
  // metrics (daily sketches persist; any date range is a cheap union,
  // never a rescan). Estimates are engine-specific → rows-only; the spec
  // bounds the estimate against the exact count.
  def q107(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val daily = ev.groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_users"))
    val exact = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(exact, "event_type")
      .select(col("event_type"), col("n_days"), col("est_users"),
        col("exact_users"),
        round(abs(col("est_users") - col("exact_users")) /
          col("exact_users").cast("double"), 6).as("rel_err"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q108
  // LEFT-OUTER stream-stream range join: q65's attribution join keeping
  // UNATTRIBUTED purchases (null-click rows), the production question
  // "which conversions had no preceding touchpoint". Null emission is
  // watermark-driven — Spark releases an unmatched left row only once the
  // watermark clears left.ts + RANGE (the join window it must keep open),
  // and tracks watermarks at millisecond grain — so both engines restrict
  // to the matured horizon floor_ms(max event time) − delay − range.
  // Inside it, streaming replay and the batch left join are provably
  // identical (verified at sf0.001/0.01/0.1). The unmatched flag and
  // sentinel click columns keep the sort total (no null-ordering
  // divergence between engines).
  def q108(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val horizonUs = (2L * 86400 + 86400) * 1000000 // watermark delay + range
    val joined = graft.streaming.StreamingOps.streamStreamRangeJoinOuter(
      spark, dir, "events.parquet", "user_id", "ts",
      col("event_type") === "purchase", col("event_type") === "click",
      rangeSeconds = 86400, "2 days",
      graft.streaming.StreamSink.Memory(s"q108_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs,
      // state partitions sized to the live state, not the session
      // shuffle width (the no-data batch stays: it emits the nulls)
      stateParts = Some(8))
    // matured horizon from the static table (harness determinism filter —
    // a 1-row aggregate, broadcast into the predicate)
    val horizon = t(spark, dir, "events")
      .agg((floor(max(unix_micros(col("ts"))) / 1000) * 1000 - horizonUs)
        .as("__h"))
    joined
      .crossJoin(broadcast(horizon))
      .filter(unix_micros(col("ts")) < col("__h"))
      .select(
        col("event_id").as("p_id"), col("user_id"),
        unix_micros(col("ts")).as("p_ts_us"),
        col("event_id_r").isNotNull.as("attributed"),
        coalesce(col("event_id_r"), lit(-1L)).as("c_id"),
        coalesce(unix_micros(col("ts_r")), lit(-1L)).as("c_ts_us"))
      .orderBy(col("p_id"), col("c_id"))
  }

  // ---------------------------------------------------------------- q109
  // Corpus composition under a TOKEN budget: each source contributes
  // documents (in id order) until its cumulative token count hits 2000 —
  // the by-tokens sibling of q66's by-rate source mixing. Exact BIGINT
  // running sums, one stratum-keyed window.
  def q109(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
      .withColumn("n_tokens",
        size(split(trim(col("text")), " ")).cast("long"))
    graft.operators.SplitOps.takeUntilTokenBudget(
        d, "doc_id", "source", "n_tokens", budget = 2000)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs_kept"),
        sum(col("n_tokens")).as("tokens_kept"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q110
  // Temporal gap detection (the monitoring complement of q92's resample +
  // forward-fill): per-user consecutive-event gaps over 6 hours — outage
  // and dead-tenant reporting before windowed features are trusted.
  // Integer microsecond arithmetic end to end.
  def q110(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeriesOps.gapStats(
        t(spark, dir, "events"), "user_id", "ts", "event_id",
        thresholdUs = 6L * 3600 * 1000000)
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q111
  // AR(1) sequence model fit in closed form, per event type: the classical
  // autoregressive ancestor of the reference's LSTM forecaster, as one
  // ordered lag window + exact-decimal normal equations — the ONLY kind of
  // model fit an SQL oracle can replicate bit-for-bit (q60's mechanism
  // extended to the sequence domain).
  def q111(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.ar1ClosedForm(
        t(spark, dir, "events"), "event_type", "ts", "event_id", "value")
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q112
  // Join-key skew report: per-key row-count distribution (mean, p99, max,
  // max/mean ratio) — the diagnostic that decides between a plain join
  // and the salted join (q90) BEFORE the job runs, over the per-key count
  // frame rather than the data.
  def q112(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SkewOps.keyDistribution(t(spark, dir, "events"), "user_id")

  // ---------------------------------------------------------------- q113
  // Distribution drift (PSI) per event type between the first and second
  // half of the time range — the production guard on q47's frozen scaler
  // assumption. Pure integer window split, equal-width bins over the
  // reference window's bounds, decimal-exact contribution sum.
  def q113(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.psiDrift(
        t(spark, dir, "events"), "event_type", "ts", "value", nBins = 10)
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q114
  // First-order Markov transition matrix of per-user event sequences:
  // the behavioral summary underneath the reference's sequence models.
  // One tiebroken keyed window + one (prev, next) count aggregation.
  def q114(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeriesOps.markovTransitions(
        t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type")
      .orderBy(col("prev_state"), col("next_state"))

  // ---------------------------------------------------------------- q115
  // Two-sample Kolmogorov–Smirnov statistic (click vs view values) with a
  // DISTRIBUTED prefix sum: deterministic range buckets + per-bucket keyed
  // windows + a buckets-row offset frame — the scale-safe ECDF shape (the
  // q46 midrank lesson applied to cumulative distributions).
  def q115(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.ksTwoSample(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q116
  // Cohen's kappa between the stored document language and the q14
  // heuristic's prediction — chance-corrected label-audit agreement,
  // exact-integer contingency ratios.
  def q116(spark: SparkSession, dir: String): DataFrame =
    graft.metrics.MetricQueries.cohenKappa(
      graft.operators.TextOps.withLangId(t(spark, dir, "documents"), "text"),
      "lang", "lang_pred")

  // ---------------------------------------------------------------- q117
  // Bloom-prefiltered semi-join: lineitem rows of high-value orders. The
  // bloom build/probe prunes the big side before its shuffle; the exact
  // semi-join wipes false positives, so the result (and the oracle) is a
  // plain semi-join — q90's "optimization must be invisible" contract.
  def q117(spark: SparkSession, dir: String): DataFrame = {
    val keys = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"))
    graft.operators.SkewOps.bloomSemiJoin(
        t(spark, dir, "lineitem"), keys, "l_orderkey", "o_orderkey",
        expectedItems = 100000L, numBits = 1048576L)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_extendedprice").cast("decimal(28,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q118
  // PageRank centrality over the q67 duplicate graph in exact fixed-point
  // BIGINT arithmetic (10 unrolled iterations, d=0.85): rank-the-canonical
  // inside dup clusters. Integer math end to end, so the oracle replays
  // the identical iterations bit-for-bit — a PageRank an SQL engine can
  // actually check, not just eyeball.
  def q118(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.pageRankFixedPoint(
        cosineEdges(spark, dir, 0.2), "id_a", "id_b", iterations = 10)
      .select(col("v").as("vec_id"), col("rank_fp"), col("rank"))
      .orderBy(col("vec_id"))

  // ---------------------------------------------------------------- q119
  // Rolling-origin backtest: expanding-window temporal CV with closed-form
  // OLS per fold — the leakage-free evaluation protocol for forecasting,
  // collapsed to sufficient statistics so folds cost one shuffle total.
  def q119(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.rollingOriginBacktest(
        t(spark, dir, "events"), "ts", "value", nSlices = 6)
      .orderBy(col("fold"))

  // ---------------------------------------------------------------- q120
  // Benford first-digit audit over order keys: the fraud/synthetic-data
  // screen. First digits by pure BIGINT comparisons (no log, no string
  // formatting), Benford expectations as shared literals.
  def q120(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.benfordAudit(t(spark, dir, "orders"), "o_orderkey")
      .orderBy(col("digit"))

  // ---------------------------------------------------------------- q121
  // Two-proportion z-test: deterministic user split (even/odd id), success
  // = heavy purchaser (≥15 purchases; every user purchases at least once,
  // which would make the pooled rate degenerate) — the A/B-experiment
  // readout over the behavioral table.
  def q121(spark: SparkSession, dir: String): DataFrame = {
    val perUser = t(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        >= 15L).as("converted"))
      .withColumn("variant",
        when(pmod(col("user_id"), lit(2)) === 0, "a").otherwise("b"))
    graft.metrics.MetricQueries.twoProportionZTest(
      perUser, "variant", "converted", "a", "b")
  }

  // ---------------------------------------------------------------- q122
  // Kaplan–Meier survival: days from each user's first signup to their
  // first subsequent purchase, right-censored at the corpus horizon. The
  // product-limit curve runs over the per-day aggregate only (q115's
  // aggregate-before-global rule).
  def q122(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SurvivalOps
      .kaplanMeier(signupPurchaseDurations(spark, dir), "dur_days",
        "__event")
      .orderBy(col("t"))

  // ---------------------------------------------------------------- q123
  // Count-min-sketch heavy hitters over the corpus vocabulary: exact
  // top-20 terms with their CMS estimates and collision overcounts. The
  // sketch itself is one (depth, bucket)-keyed exact-BIGINT aggregation —
  // mergeable by addition. Hash-seed-dependent → rows-only; the spec
  // asserts the one-sided CMS error bound.
  def q123(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SketchOps.cmsHeavyHitters(
      t(spark, dir, "documents"), "doc_id", "text",
      depth = 4, width = 256, k = 20)

  // ---------------------------------------------------------------- q124
  // Scalar int8 quantization report for the embedding table: per-dimension
  // reconstruction error of the 4× memory cut an ANN index takes before
  // sharding. Affine integer codes, decimal-exact error sums.
  def q124(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SimilarityOps.int8QuantizationReport(
        t(spark, dir, "embeddings"), "vec_id", "embedding")
      .orderBy(col("dim"))

  // ---------------------------------------------------------------- q125
  // Co-located bucketed join: lineitem ⋈ orders with BOTH sides written
  // bucketed by the order key — the zero-exchange fact-fact join layout
  // (broadcast is off for the join so the bucketing, not the dimension
  // trick, carries it; the plan audit asserts no Exchange). Result must be
  // bit-identical to the plain join — layout is invisible in the answer.
  def q125(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_q125_")
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = graft.operators.LayoutOps.bucketedEquiJoin(
        spark,
        t(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount")),
        t(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
        "l_orderkey", "o_orderkey", buckets = 8,
        root.toString, "graft_q125")
      val res = joined
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(28,6)")).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
      // pin the tiny aggregate before dropping the backing tables
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)
      graft.operators.LayoutOps.dropBucketed(spark, "graft_q125")
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q126
  // Isotonic calibration (pool-adjacent-violators): the FIX for the
  // miscalibration q84's reliability bins diagnose — a monotone map from
  // raw score to calibrated probability. MLlib's distributed PAV
  // (per-partition pooling, driver-side final merge over the pooled
  // boundary frame, never the data). Oracle-backed: the PAV fixpoint is
  // the unique isotonic solution, so a DuckDB recursive CTE reaches the
  // identical boundary/prediction frame (exact integer-sum ratios); the
  // spec additionally hand-computes PAV on a fixture.
  def q126(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.isotonicCalibration(
      t(spark, dir, "events")
        .select(col("value").as("score"),
          (col("event_type") === "purchase").cast("double").as("label")))

  // ---------------------------------------------------------------- q127
  // Pairwise event-type co-occurrence (level-2 a-priori): which actions
  // appear in the same user's history, with support counts and lift —
  // the correlated-behavior table. Pair fan-out bounded by distinct items
  // per basket, never raw rows.
  def q127(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PatternOps.pairCooccurrence(
        t(spark, dir, "events"), "user_id", "event_type")
      .orderBy(col("item_a"), col("item_b"))

  // ---------------------------------------------------------------- q128
  // Fellegi–Sunter record linkage: customer × supplier rosters blocked on
  // nation, scored by log2(m/u) agreement weights on the name-suffix and
  // account-balance fields. Blocked candidate generation + pure codegen
  // scoring — entity resolution with calibrated weights (q96's
  // levenshtein blocking is the string-distance sibling).
  def q128(spark: SparkSession, dir: String): DataFrame = {
    val pairs = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"))
      .join(t(spark, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          col("s_acctbal")),
        col("c_nationkey") === col("s_nationkey"))
    graft.operators.FuzzyJoins.fellegiSunterScore(pairs, Seq(
        (substring(col("c_name"), -1, 1) === substring(col("s_name"), -1, 1),
          3.169925, -3.169925),
        (abs(col("c_acctbal") - col("s_acctbal")) <= 500.0,
          3.169925, -3.169925)),
        threshold = 0.0)
      .select(col("c_custkey"), col("s_suppkey"), col("score"))
      .orderBy(col("c_custkey"), col("s_suppkey"))
  }

  // ---------------------------------------------------------------- q129
  // Exact median WITHOUT sorting: binary search on the integer cent grid
  // with one count-aggregate scan per step — the distributed-selection
  // answer to "exact quantile at 100 TB" (q53's approx sketch is the
  // cheap path; this is the exact one, ~34 scans instead of a global
  // sort). Driver loop controls the search only.
  def q129(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.exactMedianByCounting(
      t(spark, dir, "events")
        .filter(col("event_type") === "click")
        .select(round(col("value") * 100).cast("long").as("cents")),
      "cents")

  // ---------------------------------------------------------------- q130
  // Top user journeys: the 20 most common 5-event path prefixes — the
  // dominant-flows query of clickstream analytics. One tiebroken keyed
  // window + hash aggregations; only the bounded top-k sorts globally.
  def q130(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PatternOps.topPaths(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type",
      pathLen = 5, k = 20)

  // ---------------------------------------------------------------- q131
  // STREAMING drift monitor: q113's PSI counters maintained incrementally
  // over the event stream (pure additive state, frozen reference bins from
  // one static scan) — a bounded replay must land on exactly the batch
  // PSI, so the oracle is q113's own SQL (the q70/q73 CDC convergence
  // pattern applied to monitoring).
  def q131(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingPsiDrift(
        spark, dir, "events.parquet", "event_type", "ts", "value", nBins = 10,
        graft.streaming.StreamSink.Memory("q131_psi"),
        prepare = Tables.normalizeEventTs)
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q132
  // Z-order zone-map skipping: normalize (l_partkey, l_suppkey) onto the
  // 8-bit grid, Morton-interleave, chunk the table 64 ways under the Z
  // layout vs a plain partkey sort, and count which chunks a 2-D range
  // query (wide in x, narrow in y — the case a 1-D sort cannot skip) must
  // read — the multi-dimension data-skipping layout decision, as an
  // exact-integer report (the pure-layout sibling of q125's bucketing).
  def q132(spark: SparkSession, dir: String): DataFrame =
    graft.operators.LayoutOps.zoneMapSkipping(
      t(spark, dir, "lineitem"), "l_partkey", "l_suppkey",
      files = 64, xLo = 100L, xHi = 1500L, yLo = 2L, yHi = 5L)
      .orderBy(col("layout"))

  // ---------------------------------------------------------------- q133
  // Bigram-LM perplexity per document: the LM-based quality filter of a
  // training-data pipeline (boilerplate → low ppl, gibberish → high;
  // percentile cuts on this column are the classic cleaning step). Exact
  // corpus-count probabilities, decimal ln sums — fully oracle-checkable,
  // unlike a neural LM score.
  def q133(spark: SparkSession, dir: String): DataFrame =
    TextOps.bigramPerplexity(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q134
  // Keyed snapshot diff: per-user activity state (count + exact value
  // sum) in the first half of the time range vs the second, classified
  // added/removed/changed/unchanged — the backfill/replication audit,
  // reported as per-status key counts.
  def q134(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val usCol = unix_micros(col("ts"))
    val range = ev.agg(min(usCol).as("__mn"), max(usCol).as("__mx"))
    val based = ev.crossJoin(broadcast(range))
      .withColumn("__is_a", usCol * 2 < col("__mn") + col("__mx"))
    def snap(cond: org.apache.spark.sql.Column) = based.filter(cond)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,2)")).as("sum_value"))
    graft.operators.CdcOps.snapshotDiff(
        snap(col("__is_a")), snap(!col("__is_a")),
        "user_id", Seq("n_events", "sum_value"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_keys"))
      .orderBy(col("status"))
  }

  // ---------------------------------------------------------------- q135
  // Deterministic weighted sampling (exponential-race priorities): 50
  // documents drawn with odds ∝ n_chars, reproducible with no RNG state —
  // the corpus-curation sampler (upweight quality, keep the pipeline
  // replayable). The draw is the engine-portable multiplicative hash, so
  // the oracle replays it exactly; specs additionally pin determinism,
  // scale-invariance and weight dominance.
  def q135(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SplitOps.prioritySample(
        t(spark, dir, "documents").select(
          col("doc_id"), col("source"), col("n_chars")),
        "doc_id", "n_chars", k = 50)
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q136
  // Sketch-based join-cardinality estimate: the CMS inner product over
  // (l_orderkey, o_orderkey) counters vs the exact join size — what a
  // planner consults before choosing broadcast/shuffle/salt, for the
  // price of depth×width integers. Estimate is hash-dependent →
  // rows-only; the spec proves the one-sided bound.
  def q136(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.SketchOps
    val li = t(spark, dir, "lineitem").groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"))
    val ord = t(spark, dir, "orders").groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n"))
    // width must track the distinct-key count for a tight inner product
    // (error ~ nA·nB/width): 65536 buckets ≈ 2 MB of counters — still
    // nothing next to the join it prices
    val est = SketchOps.cmsJoinCardinality(
      SketchOps.cmsCounters(li, "l_orderkey", "n", depth = 4, width = 65536),
      SketchOps.cmsCounters(ord, "o_orderkey", "n", depth = 4, width = 65536))
    val exact = li.join(ord.withColumnRenamed("o_orderkey", "l_orderkey")
        .withColumnRenamed("n", "nb"), "l_orderkey")
      .agg(coalesce(sum(col("n") * col("nb")), lit(0L)).as("exact_join_rows"))
    est.crossJoin(broadcast(exact))
      .withColumn("over_ratio",
        round(col("est_join_rows").cast("double") /
          col("exact_join_rows"), 6))
  }

  // ---------------------------------------------------------------- q137
  // Exact mean-shift changepoint per event type: "did this metric's level
  // change, and when" — one keyed aggregation collapses the data to
  // hourly sufficient statistics, every candidate split is scored on
  // that tiny frame with prefix sums, and the argmin tie-breaks on the
  // earliest split. Monitoring's segmentation primitive, no iteration.
  def q137(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TimeSeriesOps.changepointMeanShift(
        t(spark, dir, "events"), "event_type", "ts", "value")
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q138
  // HLL sketch INTERSECTION by inclusion-exclusion (the union-only
  // algebra of q107 completed): users who both clicked and purchased,
  // estimated from three mergeable sketches vs the exact overlap.
  // Sketch-valued → rows-only; the spec bounds the relative error.
  def q138(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    def sketch(tpe: String) = ev.filter(col("event_type") === tpe)
      .agg(hll_sketch_agg(col("user_id")).as(s"sk_$tpe"),
        countDistinct(col("user_id")).as(s"n_$tpe"))
    val a = sketch("click"); val b = sketch("purchase")
    val exact = ev.filter(col("event_type") === "click")
      .select(col("user_id")).intersect(
        ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .agg(count(lit(1)).as("exact_both"))
    a.crossJoin(b)
      .select(
        hll_sketch_estimate(col("sk_click")).as("est_click"),
        hll_sketch_estimate(col("sk_purchase")).as("est_purchase"),
        (hll_sketch_estimate(col("sk_click")) +
          hll_sketch_estimate(col("sk_purchase")) -
          hll_sketch_estimate(hll_union(col("sk_click"), col("sk_purchase"))))
          .as("est_both"))
      .crossJoin(broadcast(exact))
      .withColumn("rel_err",
        round(abs(col("est_both") - col("exact_both")) /
          col("exact_both").cast("double"), 6))
  }

  // ---------------------------------------------------------------- q139
  // Triangle census of the near-dup graph: triangle count + average local
  // clustering coefficient — the structural quality check on q67's
  // clusters (true duplicate groups are near-cliques; LSH chaining
  // artifacts are not). Oriented wedge join, fan-out bounded by oriented
  // out-degree.
  def q139(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.triangleStats(
      cosineEdges(spark, dir, 0.2), "id_a", "id_b")

  // ---------------------------------------------------------------- q140
  // Zipf-law fit of the corpus head vocabulary: closed-form OLS of
  // ln(freq) on ln(rank) — the one-number authenticity screen (natural
  // text slopes ≈ −1; template-stamped corpora deviate hard). The top-N
  // head cap (TakeOrdered, mirrored in the oracle SQL) bounds the rank
  // window: the vocabulary itself is unbounded at corpus scale.
  def q140(spark: SparkSession, dir: String): DataFrame =
    TextOps.zipfFit(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q141
  // Quantile-normalization map: per-source deciles of document length
  // against the corpus deciles, with the aligning shift — the
  // batch-effect correction table applied before thresholding quality
  // scores across heterogeneous sources.
  def q141(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.quantileNormalizationMap(
        t(spark, dir, "documents"), "source", "n_chars")
      .orderBy(col("source"), col("decile"))

  // ---------------------------------------------------------------- q142
  // Incremental aggregate maintenance: per-user (count, exact sum) state
  // built from the first half of the stream, MERGED with the second
  // half's partial aggregate — never recomputing history. Counts and
  // decimal sums form a commutative monoid, so the merge is bit-identical
  // to the full recompute the oracle performs.
  def q142(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val usCol = unix_micros(col("ts"))
    val range = ev.agg(min(usCol).as("__mn"), max(usCol).as("__mx"))
    val based = ev.crossJoin(broadcast(range))
      .withColumn("__is_a", usCol * 2 < col("__mn") + col("__mx"))
    def agg(cond: org.apache.spark.sql.Column) = based.filter(cond)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(28,2)")).as("sum_value"))
    graft.operators.CdcOps.mergeAggState(
        agg(col("__is_a")), agg(!col("__is_a")),
        "user_id", "n_events", "sum_value")
      .select(col("user_id"), col("n_events"),
        col("sum_value").cast("double").as("sum_value"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q143
  // Product quantization for ANN: 64-dim float vectors → 8 codes of 4
  // bits each (32 bits/vector, a 64× cut over float32) via per-subspace
  // k-means; report per-vector reconstruction error stats. MLlib-seeded →
  // rows-only; the spec holds recall@10 against exact search.
  def q143(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    val pq = graft.operators.SimilarityOps.productQuantize(
      emb, "vec_id", "embedding", m = 8, k = 16)
    emb.select(col("vec_id"),
        posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
      .join(pq.select(col("vec_id"),
        posexplode(col("recon")).as(Seq("dim", "rv"))), Seq("vec_id", "dim"))
      .groupBy(col("vec_id"))
      .agg(round(sqrt(sum((col("v") - col("rv")) * (col("v") - col("rv")))
        / count(lit(1))), 6).as("recon_rmse"))
      .agg(
        count(lit(1)).as("n_vectors"),
        round(min(col("recon_rmse")), 6).as("min_rmse"),
        round(avg(col("recon_rmse")), 6).as("avg_rmse"),
        round(max(col("recon_rmse")), 6).as("max_rmse"))
  }

  // ---------------------------------------------------------------- q144
  // Frequent trigram motifs anywhere in user event sequences — the
  // generalization of q130's prefix paths and q114's bigram transitions;
  // completes the sequence-mining ladder (1-gram freq → transitions →
  // prefixes → motifs). One lag chain + one motif-keyed aggregation.
  def q144(spark: SparkSession, dir: String): DataFrame =
    graft.operators.PatternOps.frequentMotifs(
        t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type",
        n = 3, minKeys = 50L)
      .orderBy(col("motif"))

  // ---------------------------------------------------------------- q145
  // Training-history surface: the per-iteration L-BFGS objective of the
  // q47 classifier pipeline as a queryable frame — the reference dumps
  // per-epoch loss history to results.json (train.py:277-296,
  // trainer.py:262-320); here it's a frame any sink can materialize.
  // MLlib-internal trajectory → rows-only; the spec pins monotone
  // non-increase and the JSON artifact round-trip.
  def q145(spark: SparkSession, dir: String): DataFrame = {
    val feats = q44(spark, dir)
      .withColumn("label_bin", (col("v_mean") >= 3.0).cast("double"))
      .na.fill(0.0, Seq("v_std", "v_skew", "v_kurt", "v_delta_mean",
        "v_delta_std"))
    val (model, _) = MlPipelines.fitClassifierPipeline(feats, "anchor_id",
      Seq("n_samples", "v_std", "v_range", "v_skew", "v_kurt",
        "v_delta_mean", "v_delta_std"),
      "label_bin")
    MlPipelines.trainingHistory(model).orderBy(col("iteration"))
  }

  // ------------------------------------------------- q146–q149: SQL text
  // The SQL-first surface the north star names ("Spark SQL over Hive
  // tables"): every testdata table is registered as a temp view and the
  // Spark side of each query is PURE SQL TEXT — the same declarative
  // string an analyst would type — exercising dedup, funnel, drift and
  // sessionization through the SQL parser instead of the DataFrame DSL.
  // Catalyst plans both shapes identically, so the scan pruning/pushdown
  // posture is unchanged; the oracle twin proves value parity.

  // Exact-dedup canonicalization in SQL (the q11 semantics; the SQL text
  // is engine-portable and doubles as its own oracle).
  def q146(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.dedup)
  }

  // Three-stage ordered funnel in SQL (the q102 semantics; portable text).
  def q147(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.funnel)
  }

  // PSI drift monitor in SQL (the q113 semantics; Spark dialect differs
  // from the DuckDB oracle only in unix_micros vs epoch_us).
  def q148(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.psiDrift)
  }

  // Gap-based sessionization in SQL (the q83 semantics; Spark dialect
  // differs from the oracle only in unix_seconds vs floor(epoch)).
  def q149(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.sessionize)
  }

  // ---------------------------------------------------------------- q150
  // Partition pruning on a date-partitioned layout: events written
  // hive-partitioned by day, then a one-week window aggregated. The date
  // predicate becomes PartitionFilters at the scan (plan-audited) — the
  // layout that makes a week-window query on a years-deep 100 TB history
  // read 7 directories instead of all of them. Like q125/q132, the write
  // is the amortized layout cost; the answer is layout-invisible.
  def q150(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_q150_")
    try {
      val byDay = graft.operators.LayoutOps.writeDatePartitioned(
        t(spark, dir, "events"), "ts", "event_date",
        s"$root/events_by_day")
      val res = byDay
        .filter(col("event_date").between(lit("2024-01-08"), lit("2024-01-14")))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,4)")).cast("double")
            .as("sum_value"))
        .orderBy(col("event_date"))
      // pin the tiny aggregate before dropping the backing layout
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q151
  // Spearman rank correlation (tie-corrected, midranks) of quantity vs
  // extended price: the monotone-association screen run before fitting
  // anything. Both rank transforms reuse the q46 bucketed distributed
  // midrank — the machinery that keeps rank statistics off the
  // single-partition path at any cardinality.
  def q151(spark: SparkSession, dir: String): DataFrame =
    graft.metrics.RankMetrics.spearman(
      t(spark, dir, "lineitem"), "l_quantity", "l_extendedprice")

  // ---------------------------------------------------------------- q152
  // Mutual information between order status and priority: the feature-
  // redundancy screen (χ² q100 asks "dependent?", MI answers "by how
  // much"). One contingency aggregation + broadcast margins, exact-
  // decimal accumulation of the cell terms.
  def q152(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.mutualInformation(
      t(spark, dir, "orders"), col("o_orderstatus"), col("o_orderpriority"))

  // ---------------------------------------------------------------- q153
  // ANN top-k in SQL: the brute-force cosine shortlist of q16, typed as
  // SQL text against the registered views, with the NATIVE codegen
  // vec_cosine expression reached through the SQL parser (GraftExtensions
  // function registry) — the extension-function half of the SQL surface.
  def q153(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.annTopK)
  }

  // ---------------------------------------------------------------- q154
  // The join-family SQL twin: TPC-H Q3 (q93's semantics) as SQL text over
  // the registered views — the SQL surface's proof that a join-heavy
  // analyst query plans identically through the parser (SqlSurfaceSpec
  // pins row equivalence vs q93). Portable text = its own oracle.
  def q154(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.starJoin)
  }

  // ---------------------------------------------------------------- q156
  // Small-file compaction (the OPTIMIZE half of the layout story): plant
  // a fragmented day-partitioned copy of events (12-way write per day —
  // the shape streaming/CDC ingest leaves behind), bin-pack it with
  // compactDatePartitioned, and aggregate the COMPACTED copy. The oracle
  // re-derives the same per-day profile from the source table, proving
  // compaction is content-invisible; the spec audits the file counts
  // (fewer, larger) and read-back row identity.
  def q156(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_q156_")
    try {
      t(spark, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
        .repartition(12)
        .write.partitionBy("event_date").mode("overwrite")
        .parquet(s"$root/frag")
      graft.operators.LayoutOps.compactDatePartitioned(spark,
        s"$root/frag", s"$root/compact", "event_date",
        targetBytes = 512L * 1024 * 1024).count()
      val res = spark.read.parquet(s"$root/compact")
        .withColumn("event_date", col("event_date").cast("date"))
        .groupBy(col("event_date"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(28,4)")).cast("double")
            .as("sum_value"))
        .orderBy(col("event_date"))
      // pin the tiny per-day aggregate before dropping the backing layout
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q157
  // Schema evolution across partitions: a long-lived 100 TB table gains
  // columns over time (here `quality` appears mid-month). The early days
  // are written without it, the late days with it, and ONE mergeSchema
  // read serves both — old rows surface null, aggregates stay exact. The
  // oracle re-derives the same per-day profile from the source table, so
  // the evolution plumbing is proven content-invisible.
  def q157(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_q157_")
    try {
      val ev = t(spark, dir, "events")
        .withColumn("event_date", to_date(col("ts")))
      ev.filter(col("event_date") < lit("2024-01-16"))
        .select(col("event_date"), col("user_id"), col("value"))
        .write.partitionBy("event_date").parquet(s"$root/t")
      ev.filter(col("event_date") >= lit("2024-01-16"))
        .select(col("event_date"), col("user_id"), col("value"),
          (col("value") * 0.5).as("quality"))
        .write.mode("append").partitionBy("event_date").parquet(s"$root/t")
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(s"$root/t")
      val res = merged
        .groupBy(col("event_date").cast("date").as("event_date"))
        .agg(
          count(lit(1)).as("n_events"),
          dsum(col("value"), 4).as("sum_value"),
          count(col("quality")).as("n_quality"),
          dsum(coalesce(col("quality"), lit(0.0)), 4).as("sum_quality"))
        .orderBy(col("event_date"))
      // pin the tiny per-day aggregate before dropping the backing layout
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q158
  // Dead-letter quarantine: ingest a JSON payload column where every 13th
  // record is corrupt, parse with from_json, and route parse failures to a
  // quarantine bucket instead of failing the batch — the malformed-record
  // contract every 100 TB ingest needs. The payload is built with pure
  // string concat (NOT to_json) so the oracle derives the identical
  // good/bad split and totals arithmetically. The corrupt variant is made
  // unparseable FROM THE FIRST TOKEN (leading `!`): a merely-truncated
  // `{"id":123,` prefix is exactly what PERMISSIVE from_json may partially
  // parse on some Spark versions, which would silently flip the split.
  def q158(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val json0 = concat(lit("{\"id\":"), col("doc_id"),
      lit(",\"n\":"), col("n_chars"),
      lit(",\"src\":\""), col("source"), lit("\"}"))
    val payload = when(pmod(col("doc_id"), lit(13)) === 0,
      concat(lit("!corrupt!"), substring(json0, 1, 10))).otherwise(json0)
    docs.select(col("doc_id"), payload.as("payload"))
      .withColumn("rec",
        from_json(col("payload"),
          org.apache.spark.sql.types.StructType.fromDDL(
            "id BIGINT, n BIGINT, src STRING")))
      .withColumn("status",
        when(col("rec.id").isNotNull, lit("parsed"))
          .otherwise(lit("quarantined")))
      .groupBy(col("status"))
      .agg(
        count(lit(1)).as("n_rows"),
        coalesce(sum(col("rec.n")), lit(0L)).as("total_n"))
      .orderBy(col("status"))
  }

  // ---------------------------------------------------------------- q160
  // The capstone curation pipeline — the full pre-training data pass as
  // ONE declarative plan: quality + language gate (q13/q14) → exact
  // dedup canonicalization (q11/q64) → benchmark decontamination against
  // the src0 slice (q76) → weighted priority sample of 60 docs (q135) →
  // per-source manifest carrying the sampled corpus's content
  // fingerprint (q159). Every stage is individually oracle-proven; this
  // query proves they COMPOSE, and its oracle replays the whole chain.
  // Scale shape: codegen'd projections, one dedup shuffle, one broadcast
  // semi-join, a TakeOrdered sample, one aggregation.
  def q160(spark: SparkSession, dir: String): DataFrame =
    curationManifest(spark, dir, curationScore(t(spark, dir, "documents")))

  // ---------------------------------------------------------------- q184
  // Streaming curation capstone — q160's incremental twin: per-document
  // scoring (quality/langid/hash) runs inside each micro-batch via
  // foreachBatch into a curated parquet store (score-on-ingest), the
  // corpus-global tail (dedup → decontaminate → sample → manifest) runs
  // once over the accumulated store (curate-on-publish). The replayed
  // stream converges to the EXACT batch manifest — the oracle is q160's
  // own SQL, the q73 CDC-convergence pattern applied to curation.
  def q184(spark: SparkSession, dir: String): DataFrame = {
    // Scratch root under java.io.tmpdir (GRAFT_TMP_ROOT overrides), removed
    // after the read-back — repeated bench/verify runs leak nothing.
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_q184_")
    try {
      val store = graft.streaming.StreamingOps.streamingCurationStore(
        spark, dir, "documents.parquet", s"$root/store", s"$root/ckpt",
        curationScore)
      // pin the tiny manifest before dropping the backing store
      val res = curationManifest(spark, dir, store)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q159
  // Order-invariant content fingerprint of lineitem's key columns — the
  // replica/migration verification primitive: two copies of a 100 TB
  // table compare by exchanging one (count, fingerprint) row each,
  // independent of partitioning and row order. Portable row hash →
  // oracle replays the exact fingerprint.
  def q159(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.contentFingerprint(
      t(spark, dir, "lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_returnflag", "l_linestatus"))

  // ---------------------------------------------------------------- q155
  // Validated early stopping (the M10 control half): GBT stops adding
  // trees when the hash-held-out improvement drops below tol — the Spark
  // analog of trainer.py:262-320's patience / best-checkpoint loop. The
  // label is the quantity×(1−discount) revenue surface (an exact
  // interaction of the two features, the q41 synthetic-target precedent),
  // so the trace descends for several iterations and then the stop fires
  // — both behaviors visible in the result itself: fewer rows than
  // max_iter IS the stop. (On noise-dominated raw price the stop fires at
  // iteration 1, also correct but not demonstrative — measured in the
  // spec's scaladoc.) MLlib fit internals → rows-only; the spec plants an
  // overfit fixture and pins stop-before-maxIter plus the recorded trace.
  def q155(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.gbtEarlyStopTrace(
      t(spark, dir, "lineitem")
        .withColumn("target_revenue",
          col("l_quantity") * (lit(1.0) - col("l_discount")) * lit(1000.0)),
      "l_orderkey", Seq("l_quantity", "l_discount"), "target_revenue",
      maxIter = 60, tol = 0.02)
      .orderBy(col("iteration"))

  // ---------------------------------------------------------------- q161
  // BM25 top-k retrieval for a fixed query-term bag — the lexical
  // (sparse) retrieval flagship next to the dense ANN family (q15/q16/
  // q52): idf·saturated-tf·length-norm, per-term contributions rounded
  // then summed exactly, top-k as TakeOrdered. Every input to the score
  // is an exact corpus count, so the oracle replays it verbatim.
  def q161(spark: SparkSession, dir: String): DataFrame =
    TextOps.bm25TopDocs(t(spark, dir, "documents"), "doc_id", "text",
      Seq("spark", "vector", "hash"), topK = 15)

  // ---------------------------------------------------------------- q162
  // PORTABLE HyperLogLog distinct-count sketch: per-returnflag order-key
  // sketches (64 exact-integer MD5-derived registers) plus an ALL row
  // built by MERGING the group registers (element-wise max — the
  // mergeability that makes HLL the 100 TB distinct path), estimates vs
  // exact counts side by side. Unlike q53/q107's built-in HLL++ (opaque
  // internals → rows-only), every register and the estimate replay in
  // DuckDB end-to-end.
  def q162(spark: SparkSession, dir: String): DataFrame = {
    val keyed = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"), col("l_orderkey").as("k"))
    val regs = SketchOps.hllRegisters(keyed, Seq("grp"), col("k"))
    val regsAll = regs.groupBy(col("j")).agg(max(col("m_j")).as("m_j"))
      .withColumn("grp", lit("ALL"))
      .select(col("grp"), col("j"), col("m_j"))
    val est = SketchOps.hllEstimate(regs.unionByName(regsAll), Seq("grp"))
    val exact = keyed
      .unionByName(keyed.withColumn("grp", lit("ALL")))
      .groupBy(col("grp")).agg(countDistinct(col("k")).as("n_exact"))
    est.join(exact, "grp")
      .withColumn("rel_err",
        round((col("hll_estimate") - col("n_exact")) /
          col("n_exact").cast("double"), 6))
      .orderBy(col("grp"))
  }

  // ---------------------------------------------------------------- q163
  // Cosine-LSH bucket profile over the embeddings: engine-portable
  // sign-random-projection signatures (±1 MD5-parity planes × floor-
  // scaled integer vectors — exact integer projections, no float
  // accumulation), then per-bucket size and mean exact in-bucket cosine.
  // The pair join is bucket-keyed — the LSH contract that replaces
  // all-pairs at scale — and the whole thing hash-matches DuckDB.
  def q163(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.lshBucketProfile(
      t(spark, dir, "embeddings"), "vec_id", "embedding", numPlanes = 8)
      .orderBy(col("signature"))

  // ---------------------------------------------------------------- q164
  // Bounded-window EWMA per user over the event stream — the smoothing
  // primitive of monitoring/trend surfaces. Exact decimal weights ×
  // exact decimal values, one double division at the end; the bounded
  // lag-chain (not the sequential textbook recurrence) is the shape that
  // survives a 100 TB key history.
  def q164(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.ewma(t(spark, dir, "events"),
      "user_id", "ts", "event_id", "value")
      .orderBy(col("user_id"), col("ts"), col("event_id"))

  // ---------------------------------------------------------------- q165
  // Sliding token-window chunking (context-window builder): 32-token
  // chunks every 24 tokens per document with MD5 content addresses —
  // pure per-row array arithmetic, no shuffle; chunk hashes feed q11's
  // exact dedup grain downstream.
  def q165(spark: SparkSession, dir: String): DataFrame =
    TextOps.slidingTokenChunks(t(spark, dir, "documents"),
      "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy(col("doc_id"), col("chunk_idx"))

  // ---------------------------------------------------------------- q166
  // Hybrid retrieval: BM25 lexical candidates (q161's surface) and dense
  // cosine candidates against doc 0's embedding (q15's surface), fused
  // by reciprocal-rank fusion — the standard two-tower RAG retrieval
  // stack as one plan. Both candidate sets are top-50 bounded, so the
  // fusion join and final top-k are k-sized regardless of corpus scale;
  // ranks are deterministic (rounded scores, id tiebreak) and the fused
  // score is a fixed-order sum of two IEEE divisions — oracle-replayable.
  def q166(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val lex = TextOps.bm25TopDocs(t(spark, dir, "documents"),
        "doc_id", "text", Seq("spark", "vector", "hash"), topK = 50)
      // rank window over the 50-row candidate frame (bounded by the limit)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("bm25").desc, col("doc_id"))))
    val dense = SimilarityOps.topK(
        SimilarityOps.cosineScores(t(spark, dir, "embeddings"),
          "vec_id", "embedding", queryId = 0L), "vec_id", 50)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cosine").desc, col("vec_id"))))
      .withColumnRenamed("vec_id", "doc_id")
    SimilarityOps.rrfFuse(Seq(lex, dense), "doc_id", "rank", topK = 15)
      .withColumnRenamed("rank_0", "lex_rank")
      .withColumnRenamed("rank_1", "dense_rank")
  }

  // ---------------------------------------------------------------- q167
  // BM25 through the SQL parser over the registered views — the
  // retrieval-family SQL twin (value-equivalence to q161 proven in
  // SqlSurfaceSpec; same physical shape: filtered postings, broadcast
  // corpus stats, TakeOrdered top-k).
  def q167(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(SqlText.bm25)
  }

  // ---------------------------------------------------------------- q181
  // Quality-aware canonical selection per near-dup cluster — the keep
  // policy real pipelines want (keep the BEST copy, not the min-id
  // copy): q67's components × q13's quality scores, per-cluster argmax
  // with id tiebreak, plus member count and mean quality. One
  // cluster-keyed aggregation above proven fragments.
  def q181(spark: SparkSession, dir: String): DataFrame = {
    val nodes = t(spark, dir, "embeddings")
      .filter(col("vec_id") < 200).select(col("vec_id"))
    // 0.3 (vs q67's 0.2) keeps the graph from collapsing into one
    // giant component — 61 clusters at sf0.01, mixing groups and
    // singletons, so the keep policy is actually exercised
    val comp = GraphOps.connectedComponents(
      cosineEdges(spark, dir, 0.3), "id_a", "id_b", nodes = Some(nodes))
    val quality = TextOps.withQuality(
        t(spark, dir, "documents").filter(col("doc_id") < 200),
        "text", Seq("the", "a"))
      .select(col("doc_id"), col("quality_score"))
    comp.join(quality, col("v") === col("doc_id"))
      .groupBy(col("component"))
      .agg(
        count(lit(1)).as("n_members"),
        max(struct(col("quality_score").as("__q"),
          (-col("doc_id")).as("__negid"))).as("__best"),
        round(sum(col("quality_score").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("mean_quality"))
      .select(col("component"), col("n_members"),
        (-col("__best.__negid")).as("canonical_id"),
        col("__best.__q").as("canonical_quality"),
        col("mean_quality"))
      .orderBy(col("component"))
  }

  // ---------------------------------------------------------------- q182
  // Portable-centroid IVF twin of q80: centroids come from the two-round
  // congruential draw instead of an MLlib k-means fit, and every cosine
  // that decides an ordering (assignment argmax, probe selection, final
  // ranking) is rounded to 6 before ranking — so the ENTIRE index build +
  // batched search replays in plain SQL and the oracle hash-checks the
  // IVF plumbing end-to-end (assignment, probe pruning, list-local top-k).
  // q80's k-means path stays the production-quality default.
  def q182(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
    val cents = SimilarityOps.ivfCentroidsPortable(
      e, "vec_id", "embedding", nlist = 8)
    val assigned = SimilarityOps.ivfAssign(
      e, "vec_id", "embedding", cents, simRound = Some(6))
    SimilarityOps.ivfSearchBatch(assigned, "vec_id",
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        cents, nprobe = 3, k = 3, excludeSameId = true, simRound = Some(6))
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q183
  // Closed-form OOF ridge (reference Ridge(alpha=1.0),
  // train_ensemble.py:134-136): the q60 normal-equations surface plus the
  // λI term under MLlib's WLS standardization convention — one of
  // q42/q59's four ensemble members made hash-checkable end-to-end. The
  // spec additionally pins the closed form against a real MLlib ridge fit.
  def q183(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.oofClosedFormRidge(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500),
      "l_orderkey", "l_quantity", "l_extendedprice", 5, lambda = 1.0)
      .orderBy(col("fold"))

  // ---------------------------------------------------------------- q185
  // Cross-document boilerplate mining: top word trigrams by corpus-wide
  // occurrences with document frequency (the across-doc sibling of q71's
  // within-doc repetition) — the repeated-header/footer detector of a
  // curation pass. One explode + two-level aggregation + TakeOrdered.
  def q185(spark: SparkSession, dir: String): DataFrame =
    TextOps.boilerplateNgrams(t(spark, dir, "documents"),
      "doc_id", "text", n = 3, k = 25, minDf = 2)

  // ---------------------------------------------------------------- q186
  // Embedding-diversity card: E‖x‖², ‖x̄‖², and the mean pairwise squared
  // distance via E‖x−y‖² = 2(E‖x‖² − ‖x̄‖²) — the corpus-coverage audit
  // computed in ONE linear pass (no pair join), exact decimal sums per
  // dimension.
  def q186(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.embeddingDiversity(
      t(spark, dir, "embeddings"), "embedding")

  // ---------------------------------------------------------------- q187
  // Portable ridge-λ grid search — q106's model-selection surface made
  // hash-checkable (reference train_ensemble.py:150-158): q183's closed
  // form evaluated per grid λ on the same hash folds, pooled OOF RMSE per
  // λ, argmin flagged. Sufficient statistics computed once for the whole
  // grid; MLlib's CrossValidator would refit k·|λ| times.
  def q187(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.ridgeGridClosedForm(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500),
      "l_orderkey", "l_quantity", "l_extendedprice", 5,
      Seq(0.01, 0.1, 1.0, 10.0))
      .orderBy(col("lambda"))

  // ---------------------------------------------------------------- q188
  // Portable SemDeDup — q74's pipeline made hash-checkable end-to-end:
  // hash-drawn centroids (q182's draw), rounded-cosine assignment and
  // edge threshold, q67's recursive-CTE component replay, canonical keep.
  // Same survivor-count-per-label report as q74; the MLlib-centroid
  // default stays the quality path.
  // nlist adaptive (⌈n/250⌉ cluster-size pinning, = 8 at every local SF;
  // the oracle computes the same formula from COUNT(*))
  def q188(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.semanticDedupPortable(
        t(spark, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.4)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("label"))

  // ---------------------------------------------------------------- q189
  // Fixed-iteration IRLS logistic twin — the q29-family classification
  // path pinned end-to-end (reference train.py:170-296): 6 Newton steps
  // on quantity → returnflag-bin, per-iteration (b0, b1, log-loss) trace,
  // exact-decimal sums + per-step round-9 params so the iterative fit
  // replays in a DuckDB recursive CTE (the q126 precedent).
  def q189(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.irlsLogisticPortable(
      withReturnFlagBin(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)),
      "l_quantity", "l_returnflag_bin", iters = 6)
      .orderBy(col("iter"))

  // ---------------------------------------------------------------- q190
  // Portable HLL INTERSECTION — q138's inclusion-exclusion card rebuilt on
  // q162's exact-integer registers: click/purchase user sketches, union by
  // element-wise register max, est_both = est_a + est_b − est_union, all
  // replayed register-for-register in DuckDB (retires the sketch-opacity
  // excuse for the intersection algebra; the built-in HLL++ q138 stays the
  // production default).
  def q190(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val keyed = ev.filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type").as("grp"), col("user_id").as("k"))
    val regs = SketchOps.hllRegisters(keyed, Seq("grp"), col("k"))
    val regsU = regs.groupBy(col("j")).agg(max(col("m_j")).as("m_j"))
      .withColumn("grp", lit("UNION"))
      .select(col("grp"), col("j"), col("m_j"))
    val est = SketchOps.hllEstimate(regs.unionByName(regsU), Seq("grp"))
    val wide = est.groupBy().agg(
        max(when(col("grp") === "click", col("hll_estimate")))
          .as("est_click"),
        max(when(col("grp") === "purchase", col("hll_estimate")))
          .as("est_purchase"),
        max(when(col("grp") === "UNION", col("hll_estimate")))
          .as("est_union"))
      .withColumn("est_both",
        round(col("est_click") + col("est_purchase") - col("est_union"), 6))
    val exact = ev.filter(col("event_type") === "click")
      .select(col("user_id")).intersect(
        ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .agg(count(lit(1)).as("exact_both"))
    wide.crossJoin(broadcast(exact))
      .withColumn("rel_err",
        round(abs(col("est_both") - col("exact_both")) /
          col("exact_both").cast("double"), 6))
  }

  // ---------------------------------------------------------------- q191
  // Portable power-iteration PCA — the q105 family pinned: distributed
  // exact-decimal covariance of the embedding dims (rounded to 12), then
  // 12 driver-side power steps with round-18 products and round-9 vector
  // renormalization (the q189 recipe applied to an eigen-iteration), so
  // the whole (iter, λ₁, λ₁/trace) trace replays in a DuckDB recursive
  // CTE. MLlib PCA (q105) stays the full-spectrum default. On this
  // near-isotropic synthetic corpus (λ₂/λ₁ ≈ 1) twelve steps report a
  // still-converging estimate — the TRACE is the deterministic contract;
  // the spec pins convergence-to-MLlib on a spectrally-gapped fixture.
  def q191(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.powerIterationPC1(
      t(spark, dir, "embeddings"), "vec_id", "embedding",
      dim = 64, iters = 12)
      .orderBy(col("iter"))

  // ---------------------------------------------------------------- q192
  // Class-weighted IRLS logistic — the q49 balanced-training path pinned
  // (reference train.py:238-252 class_weight='balanced'): q189's Newton
  // trace with the exact n/(2·n_class) per-row weight folded into
  // gradient/Hessian/loss; the weights are exact integer ratios, so the
  // whole weighted fit replays in the same recursive CTE.
  def q192(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.irlsLogisticWeightedPortable(
      withReturnFlagBin(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 500)),
      "l_quantity", "l_returnflag_bin", iters = 6)
      .orderBy(col("iter"))

  // ---------------------------------------------------------------- q193
  // Portable product-quantization twin of q143: per-subspace codebooks
  // are slices of 4 hash-drawn anchor rows (the q182 congruential draw),
  // assignment is argmin of the round-6 squared L2 distance, and the
  // (subspace, code) balance/distortion profile replays exactly in SQL —
  // codebook build, assignment, and distortion all hash-checked. q143's
  // per-subspace k-means stays the production-quality default.
  def q193(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.productQuantizePortable(
        t(spark, dir, "embeddings"), "vec_id", "embedding", m = 8, k = 4)
      .orderBy(col("subspace"), col("code"))

  // ---------------------------------------------------------------- q194
  // Portable boosted-stumps training trace — the q145/q155 GBT loop made
  // hash-checkable (reference trainer.py:262-320): 6 rounds of depth-1
  // residual stumps over a fixed 8-candidate grid on the q155 revenue
  // surface, per-round train/holdout RMSE, best-checkpoint flag; leaf
  // means round-9, sums exact decimal, so the whole boosting loop replays
  // in unrolled SQL. MLlib GBT (q145/q155) stays the production default.
  def q194(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.boostedStumpsPortable(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 2000),
        "l_orderkey", "l_quantity", "l_discount",
        col("l_quantity").cast("double") *
          (lit(1.0) - col("l_discount").cast("double")) * lit(1000.0),
        cands = Seq(("l_quantity", 10.0), ("l_quantity", 20.0),
          ("l_quantity", 30.0), ("l_quantity", 40.0),
          ("l_discount", 0.02), ("l_discount", 0.04),
          ("l_discount", 0.06), ("l_discount", 0.08)),
        iters = 6)
      .orderBy(col("iter"))

  // ---------------------------------------------------------------- q195
  // Portable multitask masked-training twin of q62 (reference M13,
  // dataset.py:411-430): the same two per-task masks over one shared
  // frame — tax regression as exact closed-form OLS, discount
  // classification as the q189 fixed-iteration IRLS — one row per task
  // head, the whole masked-multi-task surface hash-checked. q62's MLlib
  // estimators stay the production default.
  def q195(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "lineitem").filter(col("l_orderkey") < 2000)
      .withColumn("tax_target", nullif(col("l_tax"), lit(0.0)))
      .withColumn("disc_target",
        when(col("l_partkey") % 3 =!= 0,
          (col("l_discount") >= 0.05).cast("double")))
    MlPipelines.multiTaskMaskedPortable(d, "l_quantity",
        "tax_target", "disc_target", iters = 6)
      .orderBy(col("task"))
  }

  // ---------------------------------------------------------------- q196
  // Fixed-sweep lasso by coordinate descent — q42/q59's lasso ensemble
  // member made hash-checkable (reference train_ensemble.py:134-143):
  // ONE exact-decimal pass for the 9 sufficient statistics, then 8 scalar
  // soft-threshold sweeps (round-9 per sweep) whose trace — including the
  // per-sweep penalized objective — replays in a recursive CTE. λ=100 on
  // this surface drives the discount coefficient to exactly 0: the
  // sparsity event itself is part of the hash-checked result.
  def q196(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.lassoCDPortable(
        t(spark, dir, "lineitem").filter(col("l_orderkey") < 2000),
        "l_quantity", "l_discount", "l_extendedprice",
        lambda = 100.0, sweeps = 8)
      .orderBy(col("sweep"))
}
