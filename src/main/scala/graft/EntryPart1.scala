package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stats._
import graft.metrics.MetricQueries
import graft.ml.MlPipelines
import graft.operators._

/** Query surface part 1 (file split only): the reference §2 core — scans, joins, aggregation, windows, splits, metrics, first ML surface. */
private[graft] trait EntryPart1 extends EntryBase {

  // ---------------------------------------------------------------- q01
  // TPC-H Q1-shaped pricing summary: scan → filter (pushed to parquet) →
  // hash aggregate with exact decimal sums. SURVEY §2: S1, P4, A1, A4.
  def q01(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("2000-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity"), 2).as("sum_qty"),
        dsum(col("l_extendedprice"), 2).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")), 6).as("sum_charge"),
        davg(col("l_quantity"), 2).as("avg_qty"),
        davg(col("l_extendedprice"), 2).as("avg_price"),
        davg(col("l_discount"), 2).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // ---------------------------------------------------------------- q02
  // Projection + predicate pushdown (SURVEY §2: P2/P3/P4).
  def q02(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  // ---------------------------------------------------------------- q03
  // Star join with broadcast dims (SURVEY §2: J1-family equi-join; Catalyst
  // picks BroadcastHashJoin — nation/customer are provably small dims).
  def q03(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val o = t(spark, dir, "orders")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice"), 2).as("total_revenue"),
        davg(col("o_totalprice"), 2).as("avg_revenue"))
      .orderBy(col("n_name"))
  }

  // ---------------------------------------------------------------- q04
  // Fuzzy suffix-match join normalized to an equi-join (reference J1:
  // sensor id 202056 ↔ annotation id 2056 via suffix).
  def q04(spark: SparkSession, dir: String): DataFrame =
    FuzzyJoins.suffixJoin(
      t(spark, dir, "customer"), t(spark, dir, "supplier"),
      "c_custkey", "s_suppkey")
      .groupBy(col("s_suppkey"))
      .agg(
        count(lit(1)).as("n_matched"),
        davg(col("c_acctbal"), 2).as("avg_acctbal"))
      .orderBy(col("s_suppkey"))

  // ---------------------------------------------------------------- q05
  // Point-in-interval broadcast join + per-window stats + min-support
  // HAVING (the heart of the reference: J2 + A1/A4 + P7,
  // preprocessing.py:142-200).
  def q05(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val anchors = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id").as("a_user"),
        col("ts").as("anchor_ts"))
    FuzzyJoins.intervalJoin(e, anchors, "user_id", "a_user", "ts", "anchor_ts",
      "3 DAYS", "3 DAYS")
      .groupBy(col("anchor_id"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(col("value"), 4).as("sum_value"),
        davg(col("value"), 4).as("avg_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"),
        stdRounded(col("value")).as("std_value"),
        countDistinct(col("event_type")).as("n_types"))
      .filter(col("n_events") >= 3)
      .orderBy(col("anchor_id"))
  }

  // ---------------------------------------------------------------- q06
  // Lag-based first/second-order delta stats (reference A3/W2).
  def q06(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.deltaStats(t(spark, dir, "events"), "user_id", "ts",
      "event_id", "value")
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q07
  // Two-level weekly trend aggregation (reference A5).
  def q07(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.periodTrend(t(spark, dir, "events"), "user_id", "ts",
      "value", "week")
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q08
  // Diurnal profile: hourly means then daily range (reference A7).
  def q08(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.diurnalRange(t(spark, dir, "events"), "event_type", "ts",
      "value")
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q09
  // Bias-corrected sample moments, pandas/DuckDB parity (reference A2).
  def q09(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(col("l_quantity")).as("n"),
        stdRounded(col("l_quantity")).as("std_qty"),
        round(skewSample(col("l_quantity")), 6).as("skew_qty"),
        round(kurtSample(col("l_quantity")), 6).as("kurt_qty"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q10
  // Top-k with deterministic tiebreak (SURVEY §2.6).
  def q10(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // ---------------------------------------------------------------- q11
  // Exact deduplication by content (north-star dedup #1).
  def q11(spark: SparkSession, dir: String): DataFrame =
    DedupOps.exactGroups(t(spark, dir, "documents"), "text", "doc_id")
      .orderBy(col("canonical_id"))

  // ---------------------------------------------------------------- q12
  // Token counting (north-star text analysis).
  def q12(spark: SparkSession, dir: String): DataFrame =
    TextOps.withTokenStats(t(spark, dir, "documents"), "text")
      .select("doc_id", "n_tokens", "n_chars_text", "n_subwords_est")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q13
  // Quality scoring: stopword ratio + composite score.
  def q13(spark: SparkSession, dir: String): DataFrame =
    TextOps.withQuality(t(spark, dir, "documents"), "text", Seq("the", "a"))
      .select("doc_id", "n_tokens", "stop_ratio", "quality_score")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q14
  // Heuristic language ID with accuracy flag against the labeled column.
  def q14(spark: SparkSession, dir: String): DataFrame =
    TextOps.withLangId(t(spark, dir, "documents"), "text")
      .select(col("doc_id"), col("the_ratio"), col("lang_pred"),
        (col("lang_pred") === col("lang")).cast("int").as("is_match"))
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q15
  // Brute-force cosine against one query vector (ANN baseline).
  def q15(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.cosineScores(t(spark, dir, "embeddings"), "vec_id",
      "embedding", 0L)
      .orderBy(col("vec_id"))

  // ---------------------------------------------------------------- q16
  // Top-10 nearest neighbours by rounded cosine (portable ordering).
  def q16(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.topK(
      SimilarityOps.cosineScores(t(spark, dir, "embeddings"), "vec_id",
        "embedding", 0L),
      "vec_id", 10)

  // ---------------------------------------------------------------- q17
  // Regression metric suite in one pass (reference X5/X7) against a
  // deterministic synthetic predictor.
  def q17(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("p", lit(50000.0) + lit(100.0) * (col("o_orderkey") % 1000))
    MetricQueries.regressionMetrics(o, "o_totalprice", "p")
  }

  def q18(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.confusion(labeledOrders(spark, dir), "label", "pred")
      .orderBy(col("label"), col("pred"))

  // ---------------------------------------------------------------- q19
  // Balanced accuracy (reference X2) — composed two-level aggregate.
  def q19(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.balancedAccuracy(labeledOrders(spark, dir), "label", "pred")

  // ---------------------------------------------------------------- q20
  // Deterministic leakage-safe group split (reference M2).
  def q20(spark: SparkSession, dir: String): DataFrame =
    SplitOps.withSplit(t(spark, dir, "customer"), "c_custkey")
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("c_custkey")).as("n_groups"),
        davg(col("c_acctbal"), 2).as("avg_acctbal"))
      .orderBy(col("split"))

  // ---------------------------------------------------------------- q21
  // Stride subsampling within keyed total order (reference W3).
  def q21(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.strideSample(t(spark, dir, "events"), "user_id", "ts",
      "event_id", 12)
      .select(col("user_id"), col("event_id"), col("rn").cast("long").as("rn"))
      .orderBy(col("user_id"), col("rn"))

  // ---------------------------------------------------------------- q22
  // Early-vs-late halves trend (reference A6/W5).
  def q22(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.halvesTrend(t(spark, dir, "events"), "user_id", "ts",
      "event_id", "value")
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q23
  // Bag union with literal period tagging (reference J5/S2).
  def q23(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val cut = lit("2024-01-16").cast("timestamp")
    val d1 = e.filter(col("ts") < cut).withColumn("period", lit("D1"))
    val d2 = e.filter(col("ts") >= cut).withColumn("period", lit("D2"))
    d1.unionByName(d2)
      .groupBy(col("period"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("value"), 4).as("sum_value"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("period"))
  }

  // ---------------------------------------------------------------- q24
  // Null-skipping row-wise mean (reference A8) with a constructed null.
  // rw_mean joins the ORDER BY: the synthetic lineitem carries duplicate
  // (l_orderkey, l_linenumber) pairs, so without it the sort isn't total
  // (the catalog-served run's different scan order exposed it).
  def q24(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") < 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(rowMean(col("l_discount"), nullif(col("l_tax"), lit(0.02))), 6)
          .as("rw_mean"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("rw_mean"))

  // ---------------------------------------------------------------- q25
  // Distinct counting + timestamp extrema (reference A9/F7); dates cast so
  // the comparison is tz-free.
  def q25(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .agg(
        count(lit(1)).as("n_orders"),
        countDistinct(col("o_custkey")).as("n_custs"),
        min(col("o_orderdate")).cast("date").as("first_date"),
        max(col("o_orderdate")).cast("date").as("last_date"))

  // ---------------------------------------------------------------- q26
  // Inverse-frequency class weights (reference A11/M11).
  def q26(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.classWeights(t(spark, dir, "orders"), "o_orderstatus")
      .orderBy(col("o_orderstatus"))

  // MinHash+LSH near-dup candidate profile per doc (north-star dedup #2).
  // Oracle-backed since the portable-hash switch: seeded-MD5 signature
  // draws and MD5 band hashes replay identically in DuckDB.
  def q27(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 32)
    val bands = DedupOps.lshBands(sigs, "doc_id", 32, 4)
    val pairs = DedupOps.candidatePairs(bands, "doc_id")
    val perDoc = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_candidates"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_candidates"))
      .orderBy(col("doc_id"))
  }

  // SimHash fingerprints + hamming distance to doc 0 (north-star dedup #3).
  // Oracle-backed: md5(token) hex-digit bits replay identically in DuckDB.
  def q28(spark: SparkSession, dir: String): DataFrame = {
    val fp = DedupOps.simhash64(t(spark, dir, "documents"), "doc_id", "text")
    val ref = fp.filter(col("doc_id") === 0)
      .select(col("simhash").as("ref_hash"))
    fp.crossJoin(broadcast(ref))
      .select(col("doc_id"), col("simhash"),
        DedupOps.hamming64(col("simhash"), col("ref_hash")).as("hamming_to_0"))
      .orderBy(col("doc_id"))
  }

  // MLlib classification on embeddings (reference M1/M2/M4 surface).
  def q29(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.logRegOnEmbeddings(t(spark, dir, "embeddings"), "vec_id",
      "embedding", "label")
      .orderBy(col("label"))

  // K-fold out-of-fold regression (reference M7/M8 surface).
  def q30(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.kfoldOOFLinReg(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500),
      "l_orderkey", Seq("l_quantity", "l_discount"), "l_extendedprice", 5)
      .orderBy(col("fold"))

  // ---------------------------------------------------------------- q31
  // Semi/anti joins (reference J4 set-membership splits): per market
  // segment, customers with vs without orders above a price threshold.
  def q31(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val bigOrders = t(spark, dir, "orders")
      .filter(col("o_totalprice") > 200000).select("o_custkey")
    val withO = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with"))
    val withoutO = c.join(bigOrders, c("c_custkey") === bigOrders("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .na.fill(0L, Seq("n_with", "n_without"))
      .orderBy(col("c_mktsegment"))
  }

  // ---------------------------------------------------------------- q32
  // Scalar-function suite (reference F8–F12): trim, strip leading zeros +
  // try_cast, startswith, substring, case conversion — over part names.
  def q32(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "part")
      .select(
        col("p_partkey"),
        trim(col("p_name")).as("name_trim"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        col("p_name").startsWith("a").cast("int").as("starts_a"),
        expr("try_cast(regexp_replace(lpad(CAST(p_partkey AS STRING), 8, '0'), '^0+', '') AS BIGINT)")
          .as("key_restored"),
        expr("try_cast(p_brand AS DOUBLE)").as("brand_as_num"))
      .orderBy(col("p_partkey"))

  // ---------------------------------------------------------------- q33
  // JSON path extraction (events.props is a JSON document) + aggregation
  // over the extracted field.
  def q33(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  // ---------------------------------------------------------------- q34
  // Sequence assembly: ordered per-user id sequence, last-8 truncation,
  // zero-padding (reference W1–W4 + dataset.py:287-298 pad/truncate).
  def q34(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.sequenceAssembly(t(spark, dir, "events"), "user_id", "ts",
      "event_id", 8)
      .select("user_id", "seq_str", "seq_len")
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q35
  // Monthly variant of the two-level trend aggregation (reference A5).
  def q35(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.periodTrend(t(spark, dir, "lineitem")
        .select(col("l_suppkey").as("k"), col("l_shipdate").as("ts"),
          col("l_extendedprice").as("v")),
      "k", "ts", "v", "month")
      .orderBy(col("k"))

  // ---------------------------------------------------------------- q36
  // Rolling 3-day trailing mean via an explicit range frame — the frame-
  // spec formulation of the reference's window stats (SURVEY §2.5 note).
  def q36(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").cast("long"))
      .rangeBetween(-3 * 86400, 0)
    t(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"),
        round(avg(col("value")).over(w), 6).as("rolling_avg_3d"),
        count(lit(1)).over(w).as("n_in_window"))
      .select("user_id", "event_id", "rolling_avg_3d", "n_in_window")
      .orderBy(col("user_id"), col("event_id"))
  }

  // ---------------------------------------------------------------- q37
  // Embedding-cosine near-duplicate pairs (north-star dedup #5): exact
  // brute force on an id-bounded block so the oracle stays cheap; the
  // unbounded path goes through SimilarityOps.lshCandidates.
  def q37(spark: SparkSession, dir: String): DataFrame =
    cosineEdges(spark, dir, 0.2).orderBy(col("id_a"), col("id_b"))

  // ---------------------------------------------------------------- q38
  // Structured Streaming: tumbling 1-day event-time windows with watermark,
  // availableNow replay over the events parquet (SURVEY §2.11).
  def q38(spark: SparkSession, dir: String): DataFrame = {
    // the schema probe inside the streaming op reads the nanos-timestamp
    // parquet — the legacy conf must be set BEFORE the op is invoked
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.streaming.StreamingOps.windowedEventStats(
      spark, dir, "events.parquet", "ts", "event_type", "value",
      "1 day", "1 day",
      graft.streaming.StreamSink.Memory(s"q38_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs)
    out.withColumn("sum_value", round(col("sum_value"), 4))
      .orderBy(col("window_start"), col("event_type"))
  }

  // ---------------------------------------------------------------- q39
  // Exact n-gram Jaccard near-dup pairs via shingle inverted index
  // (north-star dedup #4). The stopword-shingle df cap (1000) is opted into
  // EXPLICITLY — it bounds every posting-list bucket at corpus scale — and
  // the oracle SQL models the same cap, so parity holds at any scale
  // factor, not just ones where the cap happens to be lossless.
  def q39(spark: SparkSession, dir: String): DataFrame =
    DedupOps.jaccardPairsExact(t(spark, dir, "documents"), "doc_id", "text",
      3, 0.8, maxShingleDf = Some(1000))
      .orderBy(col("id_a"), col("id_b"))

  // ---------------------------------------------------------------- q40
  // Multimodal binary plumbing: opaque payload column → per-partition
  // batched metadata decode (stubbed codec), aggregated per source.
  // Oracle-backed: the stub path's FNV-1 64 content hash replays in
  // DuckDB as a HUGEINT fold over the payload bytes.
  def q40(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val meta = MultimodalOps.decodeMeta(spark,
      MultimodalOps.withPayload(docs, "text"), "doc_id").toDF()
    meta.join(docs.select("doc_id", "source"), "doc_id")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        dsum(col("n_bytes").cast("double"), 0).cast("long").as("total_bytes"),
        davg(col("width").cast("double"), 0).as("avg_width"),
        davg(col("height").cast("double"), 0).as("avg_height"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q41
  // Pivoted per-class confusion stats: precision/recall/specificity per
  // class from one conditional aggregation (reference X6 full surface).
  def q41(spark: SparkSession, dir: String): DataFrame = {
    val d = labeledOrders(spark, dir)
    val tot = d.agg(count(lit(1)).as("tot")) // lazy total, like the oracle CTE
    // INNER join on the class, exactly like the oracle's JOIN a/b USING
    // (cls): a class present only in pred or only in label is out of scope
    // for both engines, so the semantics can never diverge. Surviving rows
    // have support ≥ 1 and pred_n ≥ 1 by construction; the specificity
    // denominator can still hit 0 (single-class data) → null, not an ANSI
    // divide-by-zero error.
    d.groupBy(col("label").as("cls"))
      .agg(
        count(lit(1)).as("support"),
        sum(when(col("pred") === col("label"), 1).otherwise(0)).as("tp"))
      .join(
        d.groupBy(col("pred").as("cls"))
          .agg(count(lit(1)).as("pred_n")),
        Seq("cls"))
      .crossJoin(tot)
      .select(
        col("cls"),
        col("support"),
        round(col("tp") / col("pred_n"), 6).as("precision"),
        round(col("tp") / col("support"), 6).as("recall"),
        round(lit(2) * col("tp") / (col("pred_n") + col("support")), 6).as("f1"),
        when(col("tot") > col("support"),
          round((col("tot") - col("support") - (col("pred_n") - col("tp"))) /
            (col("tot") - col("support")), 6)).as("specificity"))
      .orderBy(col("cls"))
  }

  // ---------------------------------------------------------------- q42
  // MLlib regressor ensemble: ridge/lasso/RF/GBT + prediction average
  // (reference M7/M9) — rows-only (model fits are not SQL-expressible).
  def q42(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.ensembleRegressors(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 2000),
      "l_orderkey", Seq("l_quantity", "l_discount", "l_tax"),
      "l_extendedprice")
      .orderBy(col("model"))

  // ---------------------------------------------------------------- q43
  // Stream-static broadcast join + aggregation (SURVEY §2.11): the events
  // stream joined to the static top-value user dimension.
  def q43(spark: SparkSession, dir: String): DataFrame = {
    val users = t(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_total"))
      .filter(col("n_total") >= 50)
      .select(col("user_id").as("dim_user"), col("n_total"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.streaming.StreamingOps.streamStaticJoinStats(
      spark, dir, "events.parquet", users, "user_id", "dim_user",
      "ts", "value", "1 day",
      graft.streaming.StreamSink.Memory(s"q43_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs)
    out.withColumn("sum_value", round(col("sum_value"), 4))
      .select(col("dim_user").as("user_id"), col("n"), col("sum_value"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q44
  // The reference's core feature matrix in one pass (A1–A4 over the J2
  // interval join): per anchor window, mean/std/min/max/range + bias-
  // corrected skew/kurt + lag-delta stats + count/coverage, with the
  // min-support HAVING (preprocessing.py:101-137,96).
  def q44(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = t(spark, dir, "events")
    val anchors = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id").as("a_user"),
        col("ts").as("anchor_ts"))
    val joined = FuzzyJoins.intervalJoin(e, anchors, "user_id", "a_user",
      "ts", "anchor_ts", "3 DAYS", "3 DAYS")
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(col("ts"), col("event_id"))
    joined
      .withColumn("d1", col("value") - lag(col("value"), 1).over(w))
      .groupBy(col("anchor_id"))
      .agg(
        count(lit(1)).as("n_samples"),
        // denominator = windowDays(=7)·24·4 like the reference
        // (preprocessing.py:136) and HivePipelines.populationFeatures
        round(count(lit(1)) / lit(7.0 * 24 * 4), 6).as("window_coverage"),
        davg(col("value"), 4).as("v_mean"),
        stdRounded(col("value")).as("v_std"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"),
        round(max(col("value")) - min(col("value")), 6).as("v_range"),
        round(skewSample(col("value")), 6).as("v_skew"),
        round(kurtSample(col("value")), 6).as("v_kurt"),
        (dsum(col("d1"), 6) / count(col("d1"))).as("v_delta_mean"),
        stdPopRounded(col("d1")).as("v_delta_std"))
      .filter(col("n_samples") >= 10)
      .orderBy(col("anchor_id"))
  }

  // ---------------------------------------------------------------- q45
  // Fixed-period aggregation (reference J3/P5: summer filter + per-key
  // stats + min-support ≥ 100, preprocessing.py:306-335).
  def q45(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(
        count(lit(1)).as("n"),
        davg(col("l_quantity"), 2).as("qty_mean"),
        stdRounded(col("l_quantity")).as("qty_std"),
        davg(col("l_extendedprice"), 2).as("price_mean"),
        round(max(col("l_extendedprice")) - min(col("l_extendedprice")), 6)
          .as("price_range"))
      .filter(col("n") >= 100)
      .orderBy(col("l_suppkey"))

  // ---------------------------------------------------------------- q46
  // ROC-AUC via the Mann–Whitney rank statistic (reference X4) — exact and
  // tie-corrected, computed with DISTRIBUTED midranks (RankMetrics): the
  // only full-data pass is a hash aggregate to distinct scores; no global
  // single-partition window anywhere (PlanAuditSpec asserts it).
  def q46(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("score",
        (col("o_orderkey") % 1000) / lit(1000.0) + col("o_totalprice") / lit(1e6))
    graft.metrics.RankMetrics.binaryAuc(d, "score", "label")
      .select(col("n"), col("n_pos").cast("long").as("n_pos"), col("auc"))
  }

  // ---------------------------------------------------------------- q47
  // End-to-end population-pipeline slice (SURVEY §3.1 / §7.2 milestone):
  // interval-join feature build → threshold label → leakage-safe split →
  // scale-on-train → logistic regression → test accuracy/balanced-acc.
  // Rows-only (model fit is not SQL-expressible).
  def q47(spark: SparkSession, dir: String): DataFrame = {
    val feats = q44(spark, dir)
      .withColumn("label_bin", (col("v_mean") >= 3.0).cast("double"))
      .na.fill(0.0, Seq("v_std", "v_skew", "v_kurt", "v_delta_mean", "v_delta_std"))
    MlPipelines.classifyAndEvaluate(feats, "anchor_id",
      Seq("n_samples", "v_std", "v_range", "v_skew", "v_kurt",
        "v_delta_mean", "v_delta_std"),
      "label_bin")
  }

  // ---------------------------------------------------------------- q48
  // Multi-task masking (reference M13/F14: NaN targets masked, not
  // dropped — dataset.py:411-430): per group, per-task validity counts,
  // null-skipping means, and the conditional-mask fill value.
  def q48(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "lineitem")
      .withColumn("task_a", nullif(col("l_tax"), lit(0.0)))
      .withColumn("task_b", nullif(col("l_discount"), lit(0.0)))
    d.groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        count(col("task_a")).as("n_valid_a"),
        davg(col("task_a"), 2).as("mean_a"),
        count(col("task_b")).as("n_valid_b"),
        davg(col("task_b"), 2).as("mean_b"),
        dsum(when(col("task_a").isNotNull, col("task_a")).otherwise(lit(-1.0)), 2)
          .as("masked_sum_a"),
        round(count(col("task_a")) / count(lit(1)).cast("double"), 6)
          .as("coverage_a"))
      .orderBy(col("l_returnflag"))
  }

  // ---------------------------------------------------------------- q49
  // Class-weighted logistic regression (reference M11: inverse-frequency
  // weights fed to weightCol) — rows-only.
  def q49(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.weightedLogReg(t(spark, dir, "embeddings"), "vec_id",
      "embedding", "label")
      .orderBy(col("label"))

  // ---------------------------------------------------------------- q50
  // MLP classifier (reference M4: MultilayerPerceptronClassifier as the
  // MLlib analog of the reference's MLP) — rows-only.
  def q50(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.mlpOnEmbeddings(t(spark, dir, "embeddings"), "vec_id",
      "embedding", "label", hidden = Seq(16))
      .orderBy(col("label"))

  // ---------------------------------------------------------------- q51
  // Stateful-streaming sessionization (flatMapGroupsWithState custom
  // state): gap-closed sessions per user; the batch oracle reproduces the
  // same semantics with a window cumulative-break sweep, excluding each
  // user's still-open trailing session.
  def q51(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val out = graft.streaming.StreamingOps.sessionize(
      spark, dir, "events.parquet", gapSeconds = 86400, watermark = "0 seconds",
      graft.streaming.StreamSink.Memory(s"q51_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs)
    out.select(
      col("user_id"),
      col("session_start").cast("long").as("start_epoch"),
      col("session_end").cast("long").as("end_epoch"),
      col("n_events"),
      round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("user_id"), col("start_epoch"))
  }

  // ---------------------------------------------------------------- q52
  // IVF approximate nearest neighbours (scale path for q15/q16): k-means
  // coarse quantizer (MLlib fit) → assign → probe 4 of 16 lists → exact
  // cosine inside probes. Rows-only (the index build is not
  // SQL-expressible).
  def q52(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val cents = SimilarityOps.ivfCentroidsKMeans(e, "embedding", 16)
    val assigned = SimilarityOps.ivfAssign(e, "vec_id", "embedding", cents)
    val qv = e.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0)
    SimilarityOps.ivfSearch(
      assigned.filter(col("vec_id") =!= 0), "vec_id", qv, cents,
      nprobe = 4, k = 10)
  }

  // ---------------------------------------------------------------- q53
  // Approximate sketches — the 100 TB path for A9/quantiles: HLL++ distinct
  // count and approximate percentiles in one pass. Rows-only (sketch
  // internals are engine-specific); the spec bounds them against exact.
  def q53(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
          .as("p50_price"),
        percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000))
          .as("p99_price"))
      .orderBy(col("l_returnflag"))

  // ---------------------------------------------------------------- q54
  // Rollup hierarchy totals (relational-surface completion): per
  // (returnflag, linestatus) with subtotals and grand total.
  def q54(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  // ---------------------------------------------------------------- q55
  // Static pivot: event_type values to columns, decimal-exact sums.
  def q55(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "purchase", "signup", "view", "share")
    t(spark, dir, "events")
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .agg(dsum(col("value"), 4))
      .na.fill(0.0, types)
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q56
  // Ranking family: top-3 customers per nation by account balance with
  // rank + dense_rank + percent_rank.
  def q56(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(spark, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("rnk"),
        dense_rank().over(w).cast("long").as("drnk"),
        round(percent_rank().over(w), 6).as("prnk"))
      .filter(col("rnk") <= 3)
      .orderBy(col("c_nationkey"), col("rnk"), col("c_custkey"))
  }

  // ---------------------------------------------------------------- q57
  // Generator (explode with position): positional word expansion + global
  // term frequency over the first 5 tokens of each document.
  def q57(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(slice(TextOps.tokens(col("text")), 1, 5))
          .as(Seq("pos", "word")))
      .groupBy(col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("word")).as("n_distinct"),
        min(col("word")).as("first_word"))
      .orderBy(col("pos"))

  // ---------------------------------------------------------------- q58
  // Streaming exact dedup (dropDuplicatesWithinWatermark): with the
  // watermark spanning the whole replay, it equals batch DISTINCT — which
  // is precisely what the oracle checks. The watermark is DERIVED from the
  // dataset span (max ts − min ts, +1 day slack) so the batch-DISTINCT
  // oracle contract cannot silently break when another scale factor spans
  // longer than a hard-coded delay: keys would recur after state eviction
  // and the streaming count would quietly exceed DISTINCT.
  def q58(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val spanDays = t(spark, dir, "events")
      .agg(ceil((max(col("ts")).cast("long") - min(col("ts")).cast("long")) /
        lit(86400.0)).cast("long"))
      .head().getLong(0) + 1
    val deduped = graft.streaming.StreamingOps.dedupStream(
      spark, dir, "events.parquet", Seq("user_id", "event_type"), "ts",
      s"$spanDays days",
      graft.streaming.StreamSink.Memory(s"q58_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs)
    deduped.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_distinct_users"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------- q59
  // The reference's FULL ensemble query (train_ensemble.py:150-197): per-
  // model cross_val_predict OOF predictions, metrics on the OOF frame,
  // unweighted average, and the R²-weighted average (weights =
  // max(0.01, r2+1) normalized). Rows-only (MLlib fits).
  def q59(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.ensembleOOFWeighted(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500),
      "l_orderkey",
      Seq("l_quantity", "l_discount", "l_tax"), "l_extendedprice", 5)
      .orderBy(col("model"))

  // ---------------------------------------------------------------- q60
  // Closed-form OOF simple linear regression (reference M8 made oracle-
  // checkable): per-fold OLS slope/intercept derived analytically from
  // exact decimal sums over each fold's complement, per-sample OOF errors
  // aggregated back per fold — DuckDB reproduces the identical doubles.
  def q60(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.oofClosedFormOLS(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500),
      "l_orderkey", "l_quantity", "l_extendedprice", 5)
      .orderBy(col("fold"))

  // ---------------------------------------------------------------- q61
  // One-vs-rest multiclass AUC (reference X4 multiclass,
  // `/root/reference/src/training/metrics.py:59-72`): per-class binary
  // midrank AUC via the distributed q46 mechanism + macro average, over the
  // 3-class order-status label with per-class deterministic scores.
  def q61(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label3",
        when(col("o_orderstatus") === "F", 0)
          .when(col("o_orderstatus") === "O", 1)
          .otherwise(2))
    val classScores = Seq(0, 1, 2).map { c =>
      c -> ((col("o_orderkey") * (c + 3) % 1000) / lit(1000.0) +
        col("o_totalprice") / lit(1e6))
    }
    graft.metrics.RankMetrics.ovrMacroAuc(d, "label3", classScores)
      .orderBy(col("cls"))
  }

  // ---------------------------------------------------------------- q62
  // Per-task training over masked targets (reference M13 training loop,
  // dataset.py:411-430: each task head sees only rows where its own target
  // is non-null). Two tasks with different masks over one shared split-
  // tagged frame: tax regression (masked where l_tax = 0) and a discount
  // classification (masked on the complementary rows). Rows-only (MLlib
  // fits).
  def q62(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "lineitem").filter(col("l_orderkey") < 2000)
      .withColumn("tax_target", nullif(col("l_tax"), lit(0.0)))
      .withColumn("disc_target", // a DIFFERENT mask than tax_target's
        when(col("l_partkey") % 3 =!= 0, (col("l_discount") >= 0.05).cast("double")))
    MlPipelines.multiTaskMasked(d, "l_orderkey",
      Seq("l_quantity", "l_extendedprice"),
      Seq(MlPipelines.TaskSpec("tax_reg", "tax_target", classification = false),
        MlPipelines.TaskSpec("disc_cls", "disc_target", classification = true)))
      .orderBy(col("task"))
  }

  // ---------------------------------------------------------------- q63
  // As-of join (temporal alignment primitive): each purchase picks up the
  // latest prior click of the same user — tagged-union + one per-user
  // ordered window, one shuffle, no candidate-pair blow-up. The DuckDB
  // oracle states the identical operator natively (ASOF LEFT JOIN).
  // Two clicks at the same instant would tie arbitrarily in BOTH engines,
  // so ties are broken deterministically on max click_id — resolved inside
  // the window sort (rightTieBreak, zero extra shuffle); the oracle
  // pre-aggregates per (user_id, ts) with arg_max, the same winner.
  def q63(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"),
        unix_micros(col("ts")).as("click_ts_us"),
        col("value").as("click_value"))
    graft.operators.FuzzyJoins.asofJoin(purchases, clicks,
      Seq("user_id"), "ts", Seq("click_id", "click_ts_us", "click_value"),
      rightTieBreak = Seq("click_id"))
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("click_id"), col("click_ts_us"), col("click_value"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q64
  // End-to-end corpus cleaning (north-star composition): token/quality
  // stats + language ID → keep high-quality English docs → exact content
  // dedup (min doc_id per md5, portable across engines) → per-source
  // corpus stats. The whole LLM-data hygiene path as ONE declarative plan:
  // a per-row codegen'd projection, one dedup shuffle, one aggregation.
  def q64(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val scored = graft.operators.TextOps.withLangId(
      graft.operators.TextOps.withQuality(d, "text", Seq("the", "a")), "text")
    val kept = scored
      .filter(col("quality_score") >= 0.5 && col("lang_pred") === "en")
      .withColumn("h", md5(col("text")))
    val groups = kept.groupBy(col("h")).agg(
      min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
    kept.join(groups, "h")
      .filter(col("doc_id") === col("keep_id"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_copies") - 1).as("n_dups_removed"),
        round(davg(col("quality_score"), 6), 6).as("avg_quality"),
        sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q65
  // Stream-stream watermarked range join (attribution): purchases pair
  // with same-user clicks in the day before the purchase; both sides are
  // streams with bounded join state. Inner-join emission is watermark-
  // independent, so the finite replay hash-matches the batch self-join
  // oracle.
  def q65(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // inner emission is watermark-independent → the trailing no-data
    // eviction batch emits nothing and is skipped; state partitions are
    // sized to the live state (~40k rows), not the session shuffle width
    // (round-14 probe: 13.2s → 5.6s wall at sf0.1, results identical)
    val joined = graft.streaming.StreamingOps.streamStreamRangeJoin(
      spark, dir, "events.parquet", "user_id", "ts",
      col("event_type") === "purchase", col("event_type") === "click",
      rangeSeconds = 86400, "2 days",
      graft.streaming.StreamSink.Memory(s"q65_sink_${System.nanoTime()}"),
      prepare = Tables.normalizeEventTs,
      noDataBatch = false, stateParts = Some(8))
    joined.select(
      col("event_id").as("p_id"), col("event_id_r").as("c_id"),
      col("user_id"),
      unix_micros(col("ts")).as("p_ts_us"),
      unix_micros(col("ts_r")).as("c_ts_us"),
      col("value_r").as("c_value"))
      .orderBy(col("p_id"), col("c_id"))
  }

  // ---------------------------------------------------------------- q66
  // Deterministic corpus source-mixing (stratified sampling): crawl-ish
  // sources downsampled to 30%, curated sources kept whole, via the
  // engine-portable multiplicative hash — per-row filter, no shuffle, no
  // RNG state. The oracle reproduces the identical arithmetic in SQL.
  def q66(spark: SparkSession, dir: String): DataFrame = {
    val down = (10 to 19).map(i => s"src$i" -> 300).toMap
    SplitOps.stratifiedSample(t(spark, dir, "documents"),
      "doc_id", "source", down)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q67
  // Duplicate-cluster resolution: cosine near-dup pairs (the q37 edge set)
  // → connected components by distributed min-label propagation → one
  // canonical component id per vector. The composition step that turns
  // pairwise near-dup detection into an actionable dedup pass. The oracle
  // computes the identical transitive closure with a recursive CTE.
  def q67(spark: SparkSession, dir: String): DataFrame = {
    val nodes = t(spark, dir, "embeddings")
      .filter(col("vec_id") < 200).select(col("vec_id"))
    GraphOps.connectedComponents(cosineEdges(spark, dir, 0.2), "id_a", "id_b",
        nodes = Some(nodes))
      .select(col("v").as("vec_id"), col("component"))
      .orderBy(col("vec_id"))
  }

  // ---------------------------------------------------------------- q68
  // Point-in-interval join WITHOUT broadcast: the bucketed equi-join path
  // for the regime where the anchor set itself is corpus-sized (q05's
  // broadcast shape capsizes there). Same join semantics as q05, ±1 hour
  // window over 1-hour buckets — anchors replicate ≤3×, one bounded
  // shuffle, and the physical plan must contain no broadcast-nested-loop
  // (PlanAuditSpec asserts this).
  def q68(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val anchors = e.filter(col("event_type") === "signup")
      .select(col("event_id").as("anchor_id"), col("user_id").as("a_user"),
        col("ts").as("anchor_ts"))
    val h = 3600000000L // 1 hour in micros
    FuzzyJoins.intervalJoinBucketed(e, anchors, "user_id", "a_user",
        "ts", "anchor_ts", beforeMicros = h, afterMicros = h, bucketMicros = h)
      .groupBy(col("anchor_id"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value"), 4).as("sum_value"))
      .orderBy(col("anchor_id"))
  }

  // ---------------------------------------------------------------- q69
  // Keyword extraction: top-3 TF-IDF terms per document. Two hash
  // aggregations + a term-keyed join + a per-document ranking window —
  // no global ordering, doc-count broadcast from a 1-row aggregate.
  def q69(spark: SparkSession, dir: String): DataFrame =
    TextOps.tfIdfTopTerms(t(spark, dir, "documents"), "doc_id", "text", 3)
      .orderBy(col("doc_id"), col("rank"))

  // ---------------------------------------------------------------- q70
  // CDC compaction: latest state per user from the event change stream
  // (ts + event_id as the version tuple), rows whose latest change is an
  // 'error' tombstone dropped. One max_by hash aggregation — map-side
  // combining, no window sort-shuffle.
  def q70(spark: SparkSession, dir: String): DataFrame =
    CdcOps.compactWithDeletes(
        t(spark, dir, "events")
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"), col("value")),
        keys = Seq("user_id"), ordCols = Seq("ts", "event_id"),
        isDelete = d => d("event_type") === "error")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))

  // ---------------------------------------------------------------- q71
  // Gopher-style repetition quality metrics: duplicate-token fraction and
  // top-bigram share per document — the filter rules a pre-training corpus
  // runs to drop boilerplate/spam. One explode + two doc-keyed hash
  // aggregations; linear at corpus scale.
  def q71(spark: SparkSession, dir: String): DataFrame =
    TextOps.withRepetitionStats(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy(col("doc_id"))

  // ---------------------------------------------------------------- q72
  // End-to-end near-dup REMOVAL: embedding-cosine pairs → connected
  // components → drop every non-canonical cluster member from the documents
  // table (anti-join) → per-source corpus stats. The full composition a
  // pre-training dedup pass runs; the oracle replays it as recursive-CTE
  // closure + NOT IN + aggregate.
  def q72(spark: SparkSession, dir: String): DataFrame = {
    val edges = cosineEdges(spark, dir, 0.4)
    GraphOps.keepCanonical(
        t(spark, dir, "documents").filter(col("doc_id") < 200),
        "doc_id", edges, "id_a", "id_b")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q73
  // Streaming CDC compaction: the continuously-maintained latest-state view
  // of the event change stream — identical answer (and identical oracle) to
  // the batch q70, proving replay/live convergence of the upsert view.
  def q73(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val latest = graft.streaming.StreamingOps.compactLatestStream(
      spark, dir, "events.parquet",
      keys = Seq("user_id"), ordCols = Seq("ts", "event_id"),
      graft.streaming.StreamSink.Memory(s"q73_sink_${System.nanoTime()}"),
      prepare = df => Tables.normalizeEventTs(
        df.select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value"))))
    latest.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type").as("last_type"), col("value").as("last_value"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q74
  // Semantic dedup (SemDeDup): k-means clusters → within-cluster cosine
  // pairs → connected components → keep canonical. Per-label survivor
  // counts. Rows-only (k-means centroids aren't SQL-replicable); the
  // operator's correctness is spec'd with planted duplicates. nlist is
  // adaptive (max(8, ⌈n/250⌉) — pins cluster size so pair work scales
  // linearly; identical to the old fixed 8 at every local SF).
  def q74(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.semanticDedup(
        t(spark, dir, "embeddings"), "vec_id", "embedding",
        minCosine = 0.4)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_kept"))
      .orderBy(col("label"))

  // ---------------------------------------------------------------- q75
  // Sequence packing: greedy contiguous token-budget packs per source
  // (budget 512), reported per pack. The window partitions by source —
  // no global ordering anywhere.
  def q75(spark: SparkSession, dir: String): DataFrame =
    SplitOps.packSequences(
        TextOps.withTokenStats(t(spark, dir, "documents"), "text")
          .select(col("doc_id"), col("source"), col("n_tokens")),
        orderCol = "doc_id", partitionCol = "source",
        nTokensCol = "n_tokens", budget = 512L)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("pack_tokens"))
      .orderBy(col("source"), col("pack_id"))

  // ---------------------------------------------------------------- q76
  // Benchmark decontamination: train docs (sources != src0) sharing any
  // word trigram with the src0 "benchmark" set. One semi-join on distinct
  // shingle hashes; existence, not counting.
  def q76(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    DedupOps.contaminatedIds(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"),
        "doc_id", "text", shingleSize = 3)
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q77
  // CUBE over (returnflag, linestatus) with grouping_id: all 4 grouping
  // sets in one pass (partial-aggregated like any hash aggregate) — the
  // missing member of the q54 rollup / q55 pivot family.
  def q77(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity"), 2).as("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  // ---------------------------------------------------------------- q78
  // Batched kNN join: top-3 neighbors for each of the first 20 vectors.
  // Query side broadcast, one corpus scan, per-query ranking window.
  def q78(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
    SimilarityOps.knnJoin(e, e.filter(col("vec_id") < 20),
        "vec_id", "embedding", "vec_id", "embedding", k = 3)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q79
  // Outlier truncation by exact percentile: drop documents above the 95th
  // length percentile. The threshold is a 1-row aggregate broadcast into
  // the filter — no driver round-trip, no second scan config.
  def q79(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val thr = d.agg(expr("percentile(n_chars, 0.95)").as("thr"))
    d.crossJoin(broadcast(thr))
      .filter(col("n_chars") <= col("thr"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_chars")).as("sum_chars"))
      .orderBy(col("source"))
  }

  // ---------------------------------------------------------------- q80
  // Batched IVF ANN: the serving-shape query — one plan answers a whole
  // query table, each query scanning only its nprobe k-means lists.
  // Rows-only (k-means centroids aren't SQL-replicable); recall vs the
  // exact q78 kNN join is spec-asserted.
  def q80(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
    val centroids = SimilarityOps.ivfCentroidsKMeans(e, "embedding", nlist = 8)
    val assigned = SimilarityOps.ivfAssign(e, "vec_id", "embedding", centroids)
    SimilarityOps.ivfSearchBatch(assigned, "vec_id",
        e.filter(col("vec_id") < 20), "vec_id", "embedding",
        centroids, nprobe = 3, k = 3, excludeSameId = true)
      .orderBy(col("q_id"), col("rank"))
  }

  // ---------------------------------------------------------------- q81
  // Set operations beyond union (§2.7): distinct INTERSECT and EXCEPT —
  // heavy clickers who are also heavy viewers but not heavy purchasers.
  // Spark plans these as hash semi/anti joins on the aggregated key.
  def q81(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    def heavy(tpe: String) = e.filter(col("event_type") === tpe)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 6).select(col("user_id"))
    heavy("click").intersect(heavy("view")).except(heavy("purchase"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q82
  // Per-key z-score outlier flagging: per-user mean/std (exact decimal
  // mean, rounded sample std) joined back onto the stream, |z| ≥ 3 rows
  // flagged. Aggregate-then-join — two hash shuffles on the key, no
  // window sort.
  def q82(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val stats = e.groupBy(col("user_id"))
      .agg(davg(col("value"), 4).as("mu"), stdRounded(col("value")).as("sd"))
      .filter(col("sd") > 0)
    e.join(stats, "user_id")
      .withColumn("z", round(abs(col("value") - col("mu")) / col("sd"), 6))
      .filter(col("z") >= 3.0)
      .select(col("event_id"), col("user_id"), col("value"), col("z"))
      .orderBy(col("event_id"))
  }

  // ---------------------------------------------------------------- q83
  // BATCH sessionization: lag-gap flags cumulatively summed into session
  // ids inside one per-user window pass — the batch twin of the streaming
  // q51 (flatMapGroupsWithState). Same 1-day gap; per-session stats.
  def q83(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapped = t(spark, dir, "events")
      .withColumn("new_sess",
        when(col("ts").cast("long") -
          lag(col("ts").cast("long"), 1).over(wOrd) > 86400L, 1L)
          .otherwise(lit(0L)))
      .withColumn("session_id",
        sum(col("new_sess")).over(wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
    gapped.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).cast("long").as("start_epoch"),
        (max(col("ts")).cast("long") - min(col("ts")).cast("long"))
          .as("duration_sec"),
        dsum(col("value"), 4).as("sum_value"))
      .orderBy(col("user_id"), col("session_id"))
  }

  // ---------------------------------------------------------------- q84
  // Probability calibration (reliability bins + per-bin Brier): decile
  // bins over a deterministic 3-decimal score, exact decimal sums — the
  // calibration check the reference's metric surface lacks.
  def q84(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("score", (col("o_orderkey") * 7 % 1000) / lit(1000.0))
    MetricQueries.calibrationBins(d, "score", "label", bins = 10)
  }

  // ---------------------------------------------------------------- q85
  // Text normalization scrub: canonical lowercase/strip/collapse form with
  // before/after sizes — pure codegen'd regex projections.
  def q85(spark: SparkSession, dir: String): DataFrame = {
    val norm = TextOps.normalizeText(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        length(norm).cast("long").as("n_chars_norm"),
        size(split(norm, " ")).cast("long").as("n_tokens_norm"))
      .orderBy(col("doc_id"))
  }

  // ---------------------------------------------------------------- q86
  // Idempotent materialization: q38's windowed aggregate written through
  // foreachBatch + dynamic partition overwrite into a date-partitioned
  // parquet table, read back. Identical rows (and identical oracle) to the
  // memory-sink q38 — proving the production write path, not just the
  // test sink.
  def q86(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Scratch root under java.io.tmpdir (GRAFT_TMP_ROOT overrides), removed
    // after the read-back — repeated bench/verify runs leak nothing.
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_q86_")
    try {
      val out = graft.streaming.StreamingOps.materializeWindowedStats(
        spark, dir, "events.parquet", "ts", "event_type", "value",
        "1 day", "1 day",
        s"$root/table", s"$root/ckpt",
        prepare = Tables.normalizeEventTs)
      val res = out.withColumn("sum_value", round(col("sum_value"), 4))
        .orderBy(col("window_start"), col("event_type"))
      // Pin the result locally before deleting its backing files: it is a
      // tiny post-aggregation frame (days × event types), so this is a
      // harness materialization, not a distributed-path collect.
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q87
  // The SQL entry point: the same engine through `spark.sql`, including
  // the GraftExtensions-registered native `vec_cosine` — proving a SQL
  // user of the library sees the identical operator surface and plans.
  def q87(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "embeddings").filter(col("vec_id") < 50)
      .createOrReplaceTempView("emb_q87")
    spark.sql(
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  ROUND(vec_cosine(CAST(a.embedding AS ARRAY<DOUBLE>),
        |                   CAST(b.embedding AS ARRAY<DOUBLE>)), 6) AS cosine
        |FROM emb_q87 a JOIN emb_q87 b ON a.vec_id < b.vec_id
        |ORDER BY id_a, id_b""".stripMargin)
  }

  // ---------------------------------------------------------------- q88
  // Equal-frequency binning (ntile deciles) per status partition with
  // per-bin stats — the feature-binning step of a tabular pipeline, and
  // the remaining ranking-window family member (rank/dense_rank live in
  // q56). Deterministic tie order via the unique order key.
  def q88(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    t(spark, dir, "orders")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("o_orderstatus"), col("decile"))
      .agg(count(lit(1)).as("n"),
        dsum(col("o_totalprice"), 2).as("sum_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderstatus"), col("decile"))
  }

  // ---------------------------------------------------------------- q89
  // Referential-integrity audit (the ingest data-quality gate): orphan
  // facts and childless dimensions counted via three anti-join aggregates
  // folded into one row — each anti-join is a broadcast/shuffle semi-join,
  // no row ever leaves the executors.
  def q89(spark: SparkSession, dir: String): DataFrame = {
    def cnt(df: DataFrame, name: String) =
      df.agg(count(lit(1)).as(name))
    val orphanLines = t(spark, dir, "lineitem").join(
      t(spark, dir, "orders").select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_anti")
    val childlessOrders = t(spark, dir, "orders").join(
      t(spark, dir, "lineitem").select(col("l_orderkey")),
      col("o_orderkey") === col("l_orderkey"), "left_anti")
    val orderlessCustomers = t(spark, dir, "customer").join(
      t(spark, dir, "orders").select(col("o_custkey")),
      col("c_custkey") === col("o_custkey"), "left_anti")
    cnt(orphanLines, "n_orphan_lineitems")
      .crossJoin(cnt(childlessOrders, "n_childless_orders"))
      .crossJoin(cnt(orderlessCustomers, "n_orderless_customers"))
  }

  // ---------------------------------------------------------------- q90
  // Skew-salted join, oracle-proven: the salted physical shape must be
  // RESULT-invisible — identical rows to the plain join the oracle runs.
  // Events (fact, salted on unique event_id) joined to the top-user
  // dimension, aggregated per user.
  def q90(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val dim = e.groupBy(col("user_id")).agg(count(lit(1)).as("n_total"))
      .filter(col("n_total") >= 50)
    SkewOps.saltedJoin(e, dim, "user_id", buckets = 8,
        factIdentity = Seq("event_id"))
      .groupBy(col("user_id"), col("n_total"))
      .agg(count(lit(1)).as("n_joined"), dsum(col("value"), 4).as("sum_value"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q91
  // Time-weighted average for irregularly-sampled series: each reading
  // weighted by its holding duration (lead-ts − ts). The estimator the
  // reference's plain mean approximates badly on uneven sensor gaps; one
  // per-key window + one aggregation, exact decimal value·duration sums.
  def q91(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    t(spark, dir, "events")
      .withColumn("tse", unix_micros(col("ts")))
      .withColumn("dur_us", lead(col("tse"), 1).over(w) - col("tse"))
      .filter(col("dur_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("dur_us")).as("total_us"),
        round(dsum(col("value") * col("dur_us"), 4) / sum(col("dur_us")), 6)
          .as("twa"))
      .orderBy(col("user_id"))
  }

  // ---------------------------------------------------------------- q92
  // Resampling to a regular hourly grid with forward fill: per-key hour
  // grid (sequence+explode) as-of joined to the last observation at or
  // before each grid point — the reference's hourly resampling
  // (dataset.py) as a distributed operator. DuckDB replays it with a
  // native ASOF LEFT JOIN.
  def q92(spark: SparkSession, dir: String): DataFrame = {
    val H = 3600000000L
    val ev = t(spark, dir, "events").filter(col("user_id") < 30)
      .select(col("user_id"), col("ts"), col("value"), col("event_id"))
    // one deterministic observation per (user, ts): highest event_id wins
    val obs = ev.groupBy(col("user_id"), col("ts"))
      .agg(max_by(col("value"), col("event_id")).as("value"))
    val grid = ev.groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("mn"),
        max(unix_micros(col("ts"))).as("mx"))
      .select(col("user_id"),
        explode(sequence(floor(col("mn") / H), floor(col("mx") / H))).as("h"))
      .withColumn("ts", timestamp_micros(col("h") * H))
    FuzzyJoins.asofJoin(grid, obs, Seq("user_id"), "ts", Seq("value"))
      .select(col("user_id"), col("h").as("hour_idx"),
        col("value").as("ffill_value"))
      .orderBy(col("user_id"), col("hour_idx"))
  }

  // ---------------------------------------------------------------- q93
  // Three-way star join (TPC-H Q3 shape): selective dimension filters
  // reach both scans, the join chain shuffles on the fact keys once each,
  // revenue ranked with a top-k.
  def q93(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = t(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = t(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---------------------------------------------------------------- q94
  // Unpivot (wide→long melt, the reshaping twin of q55's pivot): two
  // lineitem measures melted to (measure, value) rows, aggregated per
  // measure. Spark's native unpivot operator; the oracle reproduces the
  // melt with UNION ALL arms.
  def q94(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      .unpivot(Array(col("l_orderkey")),
        Array(col("l_quantity"), col("l_extendedprice")),
        "measure", "value")
      .groupBy(col("measure"))
      .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
      .orderBy(col("measure"))

  // ---------------------------------------------------------------- q95
  // Feature correlation screen (the feature-selection precursor):
  // pairwise Pearson r and sample covariance for the numeric lineitem
  // measures, one aggregation pass per pair, rounded like every
  // order-sensitive floating aggregate.
  def q95(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val pairs = Seq(
      ("l_quantity", "l_extendedprice"),
      ("l_quantity", "l_discount"),
      ("l_extendedprice", "l_tax"))
    pairs.map { case (a, b) =>
      li.agg(
        lit(s"$a~$b").as("pair"),
        count(lit(1)).as("n"),
        round(corr(col(a), col(b)), 6).as("pearson_r"),
        round(covar_samp(col(a), col(b)), 6).as("covar"))
    }.reduce(_.unionByName(_)).orderBy(col("pair"))
  }
}
