package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stats._
import graft.metrics.MetricQueries
import graft.ml.MlPipelines
import graft.operators._

/** Query surface part 3 (file split only): portable trainers, text/BPE, ingest/CDC, stats battery, survival, time-series diagnostics. */
private[graft] trait EntryPart3 extends EntryPart2 {

  // ---------------------------------------------------------------- q197
  // One-number calibration card: ECE / MCE / Brier over q84's reliability
  // bins — the summary a model report quotes next to AUC, and the target
  // a recalibration step (q126 isotonic) is judged by. Tiny bin frame →
  // decimal-exact aggregation, fully oracle-checked.
  def q197(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.calibrationErrorCard(
      t(spark, dir, "orders")
        .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
        .withColumn("score", (col("o_orderkey") * 7 % 1000) / lit(1000.0)),
      "score", "label", bins = 10)

  // ---------------------------------------------------------------- q198
  // Robust-winnowing fingerprint near-dup candidates (MOSS): substring-
  // granular dedup between MinHash (q27, whole-doc) and containment
  // (q168) — any shared ≥ w+k−1 token run leaves a shared fingerprint.
  // Windowed-min selection per doc, boilerplate buckets capped, pair join
  // on fingerprint hash, TakeOrdered top-50.
  def q198(spark: SparkSession, dir: String): DataFrame =
    TextOps.winnowingNearDupPairs(t(spark, dir, "documents"),
      "doc_id", "text", k = 3, w = 4, maxDf = 50L, minShared = 2L,
      topK = 50)

  // ---------------------------------------------------------------- q199
  // Active-learning batch selection under the q189 probe model: score
  // every quantity value with the converged IRLS logistic, rank by
  // decision-margin (|p−½| ascending = most uncertain first), report the
  // top-10 with predictive entropy — the "what to label next" query of a
  // data-curation loop, end-to-end hash-checkable because the probe
  // model itself is the portable q189 fit.
  def q199(spark: SparkSession, dir: String): DataFrame = {
    val li = withReturnFlagBin(
      t(spark, dir, "lineitem").filter(col("l_orderkey") < 500))
    val params = MlPipelines.irlsLogisticPortable(
        li, "l_quantity", "l_returnflag_bin", iters = 6)
      .filter(col("iter") === 6).select(col("b0"), col("b1"))
    val p = round(lit(1.0) /
      (lit(1.0) + exp(-(col("b0") + col("b1") * col("l_quantity")))), 6)
    li.groupBy(col("l_quantity")).agg(count(lit(1)).as("n_rows"))
      .crossJoin(broadcast(params))
      .withColumn("p", p)
      .withColumn("margin", round(abs(col("p") - lit(0.5)), 6))
      // clamp before the logs: a saturated probe (p rounding to 0/1)
      // would otherwise emit 0·ln 0 = NaN, which no oracle can hash
      .withColumn("__pc",
        least(greatest(col("p"), lit(0.000001)), lit(0.999999)))
      .withColumn("entropy",
        round(-(col("__pc") * log(col("__pc")) +
          (lit(1.0) - col("__pc")) * log(lit(1.0) - col("__pc"))), 6))
      .select(col("l_quantity"), col("n_rows"), col("p"), col("margin"),
        col("entropy"))
      .orderBy(col("margin").asc, col("l_quantity").asc)
      .limit(10)
  }

  // ---------------------------------------------------------------- q200
  // Portable MLP forward inference — the q47/q50 batched-inference path
  // made hash-checkable: exact closed-form scaler (A13), a fixed
  // hash-drawn 2→4→1 tanh/sigmoid network, and the score-decile histogram
  // (A15) over the FULL lineitem — one stats pass + one pure-projection
  // scoring scan into a 10-group aggregate. Training stays MLlib (q50);
  // this pins the inference arithmetic end-to-end.
  def q200(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.mlpForwardPortable(
        t(spark, dir, "lineitem"), "l_quantity", "l_discount")
      .orderBy(col("decile"))

  // ---------------------------------------------------------------- q201
  // Mergeable log-bin quantile sketch — the quantile member of the sketch
  // family (CMS q123, HLL q162, Bloom q117): additive (digit-count,
  // 2-significant-digit) counters per returnflag, merged into an ALL
  // sketch by summing, p50/p90/p99 read off the cumulative bins with
  // ≤ 10% relative error by construction. Bin boundaries use only exact
  // string length + one correctly-rounded IEEE division — deterministic
  // across engines where ln-based log bins are not — so the whole sketch
  // AND the merge identity are hash-checked.
  def q201(spark: SparkSession, dir: String): DataFrame = {
    val bins = SketchOps.logBins(
      t(spark, dir, "lineitem")
        .select(col("l_returnflag").as("grp"), col("l_extendedprice")),
      "grp", "l_extendedprice")
    val all = bins.groupBy(col("e"), col("m")).agg(sum(col("n")).as("n"))
      .withColumn("grp", lit("ALL"))
      .select(col("grp"), col("e"), col("m"), col("n"))
    SketchOps.quantilesFromBins(bins.unionByName(all), "grp",
        Seq(0.5, 0.9, 0.99))
      .orderBy(col("grp"), col("quantile"))
  }

  // ---------------------------------------------------------------- q202
  // Streaming twin of q201: the additive sketch maintained across
  // micro-batches in complete mode, finished with the same bin-cumsum
  // read — converges to the batch sketch EXACTLY (additive counters
  // commute with batching), the q113/q131 batch≡stream contract for
  // quantiles. State = the sketch itself, bounded forever.
  def q202(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingLogBinQuantiles(
        spark, dir, "lineitem.parquet", "grp", "l_extendedprice",
        Seq(0.5, 0.9, 0.99),
        graft.streaming.StreamSink.Memory("q202_quantiles"),
        prepare = _.select(col("l_returnflag").as("grp"),
          col("l_extendedprice")))
      .orderBy(col("grp"), col("quantile"))

  // ---------------------------------------------------------------- q203
  // Portable Gaussian Naive Bayes — the third hash-proven classifier
  // family (after q189's IRLS logistic and q194's boosted stumps),
  // mirroring the reference's classical-baseline sweep
  // (train_ensemble.py:134-143): closed-form per-class priors/means/
  // variances from ONE exact-decimal pass over the hash-split train rows,
  // round-9 params folded back as literals, join-free scoring scan into
  // the test confusion matrix.
  def q203(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.gaussianNbPortable(
      t(spark, dir, "lineitem"), "l_orderkey", "l_returnflag",
      "l_quantity", "l_discount")

  // ---------------------------------------------------------------- q204
  // χ² token–class association (Yang & Pedersen 1997 feature selection):
  // which tokens identify a language — per-doc presence via
  // array_distinct INSIDE the explode (no distinct shuffle), two
  // vocabulary-level aggregations, broadcast class totals, exact-count
  // contingency per observed (token, class), top-10 per class.
  def q204(spark: SparkSession, dir: String): DataFrame =
    TextOps.chiSquareTokens(t(spark, dir, "documents"),
      "doc_id", "text", "lang", k = 10, minDf = 5L)

  // ---------------------------------------------------------------- q205
  // Portable kNN classification over the IVF index: hash-split holdout
  // vectors classified by majority label of their 5 nearest train
  // neighbors (q182's broadcast-centroid probe pruning — the corpus is
  // never shuffled), vote ties toward the smallest label, confusion
  // matrix out. The label-propagation use of similarity search.
  def q205(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.knnClassifyPortable(
      t(spark, dir, "embeddings"), "vec_id", "embedding", "label")

  // ---------------------------------------------------------------- q206
  // Portable Bloom-filter false-positive card: high-value order customers
  // build the ≤4096-row bit-position set (per-shard filters OR together —
  // the CMS/HLL mergeability contract), every customer key probes it, and
  // the card measures FP count/rate against exact membership plus the
  // filter load. The oracle-checkable twin of q117's opaque
  // bloom_filter_agg prefilter.
  def q206(spark: SparkSession, dir: String): DataFrame =
    SketchOps.bloomFpCard(
      t(spark, dir, "orders").filter(col("o_totalprice") > 150000.0),
      "o_custkey", t(spark, dir, "customer"), "c_custkey")

  // ---------------------------------------------------------------- q208
  // Robust outlier gate on event values — the SORT-FREE sibling of q99
  // (whose per-group `percentile` sorts within groups): GLOBAL median +
  // MAD via the counting binary search (~log₂(domain) count-scans, no
  // sort at any size), Iglewicz–Hoaglin modified z-score > 3.5 decided in
  // exact integer arithmetic, per-event-type rates against the global
  // thresholds.
  def q208(spark: SparkSession, dir: String): DataFrame =
    RobustStats.madOutlierCard(t(spark, dir, "events"),
      "event_type", "value")

  // ---------------------------------------------------------------- q207
  // Train–eval contamination audit: the hash-held-out 5% eval slice's
  // distinct word 5-grams probe the train slice's distinct gram set
  // (60-bit hash join keys — fixed width, never gram strings); per-doc
  // overlap fraction + contaminated verdict. The collision check run
  // before trusting any benchmark number.
  def q207(spark: SparkSession, dir: String): DataFrame =
    TextOps.contaminationOverlap(t(spark, dir, "documents"),
      "doc_id", "text", n = 5, evalBuckets = 1, threshold = 0.2)

  // ---------------------------------------------------------------- q209
  // Exact-allocation stratified sampling: each order priority yields
  // exactly ⌈n_s/50⌉ rows with the stratum's smallest portable draws —
  // rank thresholds from a SIMULTANEOUS per-stratum counting binary
  // search (one conditional-count scan per step for ALL strata, ~24
  // steps), no sort of the data at any size.
  def q209(spark: SparkSession, dir: String): DataFrame =
    SplitOps.stratifiedExactSample(t(spark, dir, "orders"),
      "o_orderpriority", "o_orderkey", 1, 50)

  // ---------------------------------------------------------------- q210
  // Pearson correlation matrix of the four lineitem measures in ONE
  // aggregation pass — the scale upgrade of q95, which scans once PER
  // PAIR: all sums/squares/cross-products accumulate as exact decimals in
  // a single scan (k(k+3)/2 accumulators), correlations as driver
  // arithmetic on the sufficient-statistics row.
  def q210(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.correlationMatrix(t(spark, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  // ---------------------------------------------------------------- q211
  // Weight-of-evidence / information-value binning of quantity against
  // the return outcome — the univariate predictive-power screen (credit-
  // scoring lineage) run before committing a feature to a model. One
  // (bin, target) count aggregation + broadcast totals; IV accumulated in
  // exact decimal.
  def q211(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.woeIv(t(spark, dir, "lineitem"),
      floor((col("l_quantity") - 1) / 5),
      (col("l_returnflag") =!= "N"))

  // ---------------------------------------------------------------- q212
  // Unigram-LM perplexity filter (the CCNet-style quality gate): add-one
  // unigram model from the train slice's token counts, per-eval-doc
  // cross-entropy and perplexity — ln p computed once per vocab row, one
  // equi-join, per-doc decimal sums. High-perplexity docs are the
  // curation drop candidates.
  def q212(spark: SparkSession, dir: String): DataFrame =
    TextOps.unigramPerplexity(t(spark, dir, "documents"), "doc_id", "text")

  // ---------------------------------------------------------------- q213
  // Streaming Bloom build ≡ batch: the filter is a streaming groupBy over
  // bit positions — state bounded at mBits rows FOREVER — and set union
  // commutes with micro-batching, so the streamed filter equals q206's
  // batch filter exactly; same card, same oracle (the q201/q202 sketch
  // convention).
  def q213(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingBloomFpCard(
      spark, dir, "orders.parquet", "customer.parquet",
      "o_custkey", "c_custkey", kHashes = 3, mBits = 4096,
      graft.streaming.StreamSink.Memory("q213_bloom"),
      prepareBuild = _.filter(col("o_totalprice") > 150000.0))

  // ---------------------------------------------------------------- q214
  // Semi-supervised label propagation over the IVF neighbor graph: train
  // one-hot masses clamped each of 3 rounds, cosine-weighted absorption
  // with round-9 per-node normalization, holdout argmax — the multi-hop
  // label densification upgrade of q205's single vote, hash-checked
  // end-to-end.
  def q214(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.labelPropagationPortable(
      t(spark, dir, "embeddings"), "vec_id", "embedding", "label")

  // ---------------------------------------------------------------- q215
  // K-fold out-of-fold target encoding of order priority against order
  // value, folds hashed on the customer (group-leakage-safe): the
  // encoder table enc(c,f) = mean of the OTHER folds, with global-OOF
  // fallback — one (cat, fold) aggregation with decimal rollups.
  def q215(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.oofTargetEncoding(t(spark, dir, "orders"),
      "o_orderpriority", "o_totalprice", "o_custkey", k = 5)

  // ---------------------------------------------------------------- q216
  // Incremental dedup admission: the new batch (hash buckets 7-9) is
  // admitted doc-by-doc against the kept corpus's persisted LSH band
  // store (buckets 0-6) — band rows are additive cross-run state; one
  // equi-join decides every admission. The daily-ingest form of q27.
  def q216(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val b = SplitOps.hashBucket(col("doc_id"), 10)
    DedupOps.incrementalAdmission(
      docs.filter(b < 7), docs.filter(b >= 7), "doc_id", "text")
  }

  // ---------------------------------------------------------------- q217
  // k-anonymity audit of the customer quasi-identifiers (nation, market
  // segment): group sizes, minimum, and the re-identifiable row fraction
  // below k=5 — the privacy gate before user-adjacent data enters a
  // training corpus. One group aggregation + one card row.
  def q217(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.kAnonymityCard(
      t(spark, dir, "customer"), Seq("c_nationkey", "c_mktsegment"), 5L)

  // ---------------------------------------------------------------- q218
  // Fisher re-randomization test: click-vs-purchase value difference
  // against 64 portable pseudo-random relabelings in ONE pass (map-side
  // partial aggregation collapses the 64× explode before the shuffle) —
  // the assumption-free sibling of q121's z-test.
  def q218(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.rerandomizationTest(
      t(spark, dir, "events")
        .filter(col("event_type").isin("click", "purchase")),
      "event_id", col("event_type") === "purchase", "value")

  // ---------------------------------------------------------------- q219
  // Greedy k-center coreset (farthest-point traversal): 8 maximally-
  // diverse exemplars with their coverage-radius curve — the data-pruning
  // selection core. k linear scans, argmax as one max-struct aggregate,
  // centers are the driver-side model; every selection replays in SQL.
  def q219(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.kCenterCoreset(
      t(spark, dir, "embeddings"), "vec_id", "embedding", k = 8)

  // ---------------------------------------------------------------- q220
  // ANN recall@5 card: the portable IVF (nprobe 3 of 8 lists) measured
  // per query against the exact brute-force top-5 — the acceptance test
  // that prices probe pruning in recall. Both sides rounded-cosine
  // deterministic, so the card is hash-checked.
  def q220(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    SimilarityOps.annRecallCard(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 20))
  }

  // ---------------------------------------------------------------- q221
  // Streaming count-min build ≡ batch: the sketch is a streaming
  // groupBy(depth, bucket) sum — state bounded at depth×width counters
  // forever, no term dictionary — and additivity makes the streamed
  // counters equal q123's batch sketch exactly; same card, same oracle
  // (the q202/q213 streaming-sketch convention).
  def q221(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingCmsHeavyHitters(
      spark, dir, "documents.parquet", "text",
      depth = 4, width = 256, k = 20,
      graft.streaming.StreamSink.Memory("q221_cms"))

  // ---------------------------------------------------------------- q222
  // Streaming HyperLogLog build ≡ batch: register state is 64 rows per
  // group forever and MAX-merge is idempotent (replays cannot
  // double-count, unlike any sum) — the streamed registers equal q162's
  // batch sketch exactly; same card, same oracle. Completes the
  // streaming-sketch family (q202 quantiles, q213 Bloom, q221 CMS).
  def q222(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingHllDistinct(
      spark, dir, "lineitem.parquet",
      graft.streaming.StreamSink.Memory("q222_hll"),
      prepare = _.select(col("l_returnflag").as("grp"),
        col("l_orderkey").as("k")))

  // ---------------------------------------------------------------- q223
  // Retrieval eval card: exact cosine top-10 per holdout query over the
  // embedding corpus (broadcast query batch, one corpus scan), relevance
  // = label match, macro nDCG@10 / MRR / MAP — the missing judgment step
  // of the retrieval stack (BM25 q161, ANN q16/q182, RRF q166).
  def q223(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < 30)
    val nn = SimilarityOps.knnJoin(e, q, "vec_id", "embedding",
      "vec_id", "embedding", k = 10)
    val lbl = e.select(col("vec_id").as("__id"), col("label").as("__l"))
    val ranked = nn
      .join(lbl.withColumnRenamed("__id", "q_id")
        .withColumnRenamed("__l", "__ql"), Seq("q_id"))
      .join(lbl.withColumnRenamed("__id", "n_id")
        .withColumnRenamed("__l", "__nl"), Seq("n_id"))
      .withColumn("rel",
        when(col("__ql") === col("__nl"), 1.0).otherwise(0.0))
    graft.metrics.RankMetrics.retrievalEvalCard(
      ranked, "q_id", "rank", "rel", k = 10)
  }

  // ---------------------------------------------------------------- q224
  // Platt-scaling calibration card — the parametric sibling of isotonic
  // q126 and the FIX for what the ECE card q197 measures: the q189
  // round-9 Newton fixed point maps raw scores to calibrated
  // probabilities; per-bin raw-vs-calibrated reliability plus both ECEs
  // (ece_cal < ece_raw is the measurable win on this uninformative
  // scorer, whose calibrated output collapses to the base rate).
  def q224(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.plattCalibrationCard(
      t(spark, dir, "orders")
        .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
        .withColumn("score", (col("o_orderkey") * 7 % 1000) / lit(1000.0)),
      "score", "label")

  // ---------------------------------------------------------------- q225
  // Candidate-then-VERIFY dedup: q27's MinHash/LSH candidates confirmed
  // by exact Levenshtein similarity on 200-char prefixes — edit distance
  // is O(L²) per pair, so it runs only on the banded candidate set (the
  // production two-stage shape). Integer-exact distances in both
  // engines; one rounded division decides the verdict.
  def q225(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = DedupOps.candidatePairs(
      DedupOps.lshBands(
        DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 32),
        "doc_id", 32, 4),
      "doc_id")
    DedupOps.verifyCandidatePairs(docs, pairs, "doc_id", "text")
  }

  // ---------------------------------------------------------------- q226
  // Persisted-IVF-index search: q182's exact pipeline, but the index is
  // written to disk (centroids parquet + assignments PARTITIONED BY list
  // id) and the search runs over the READ-BACK artifact with the probed
  // list ids pushed as a literal filter — the scan statically prunes to
  // the probed directories (IvfIndexSpec audits the PartitionFilters).
  // At 100 TB the index is built once and consumed by every ANN query;
  // this query proves the persisted path is hash-identical to the
  // in-memory build (shared q182 oracle).
  def q226(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
    val cents = SimilarityOps.ivfCentroidsPortable(
      e, "vec_id", "embedding", nlist = 8)
    val assigned = SimilarityOps.ivfAssign(
      e, "vec_id", "embedding", cents, simRound = Some(6))
    // Run-private scratch root (GRAFT_TMP_ROOT overrides tmpdir), removed
    // after the result is pinned — concurrent bench/verify runs on one
    // host each get their own index; nothing races on a shared path.
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_ivf_index_")
    try {
      SimilarityOps.writeIvfIndex(assigned, cents, root.toString)
      val (idxAssigned, idxCents) = SimilarityOps.readIvfIndex(spark, root.toString)
      val res = SimilarityOps.ivfSearchBatch(idxAssigned, "vec_id",
          e.filter(col("vec_id") < 20), "vec_id", "embedding",
          idxCents, nprobe = 3, k = 3, excludeSameId = true,
          simRound = Some(6), pruneByList = true)
        .orderBy(col("q_id"), col("rank"))
      // Pin locally before deleting the backing files (q86 convention):
      // a k-per-query frame, harness materialization only.
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q227
  // Dedup-on-ingest capstone: q216's persisted band-store admission and
  // q225's Levenshtein verification composed into one ingest stage — a
  // band collision alone no longer rejects; edit distance runs on exactly
  // the banded (kept, new) pairs and only a verified near-dup blocks
  // admission. Three deterministic hash-bucket waves replay the admission
  // history (wave 0 seeds the store); the streaming foreachBatch form is
  // proven row-identical in IngestDedupSpec. Per-ingest cost is
  // O(batch + collisions), independent of corpus size.
  def q227(spark: SparkSession, dir: String): DataFrame = {
    val b = SplitOps.hashBucket(col("doc_id"), 10)
    DedupOps.dedupIngestWaves(
      t(spark, dir, "documents"),
      when(b < 4, 0).when(b < 7, 1).otherwise(2),
      "doc_id", "text", waves = 3)
  }

  // ---------------------------------------------------------------- q228
  // IVFADC asymmetric-distance ANN search (Jégou et al. 2011): q182's
  // coarse quantizer + q193's PQ codebook composed into the production
  // index shape — candidates in the probed lists are scored by an
  // m-lookup table sum over their stored codes, never their raw vectors
  // (the 64x read cut that makes corpus-scale ANN probeable). Entire
  // pipeline (draws, assignment, coding, probe pruning, lookup table,
  // ranking) replays in plain SQL.
  def q228(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
    SimilarityOps.ivfAdcSearch(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 20), "vec_id", "embedding",
      nlist = 8, nprobe = 3, m = 8, kAnchors = 4, topK = 3)
  }

  // ---------------------------------------------------------------- q229
  // Two-stage retrieval: q228's IVFADC shortlist (depth 10 from the code
  // table) re-ranked by EXACT rounded cosine — raw vectors are fetched
  // for only |queries|x10 rows, so the exact distance cost is constant
  // in corpus size (the FAISS refine stage). ADC decides the shortlist,
  // never the final order.
  def q229(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
    SimilarityOps.ivfAdcRerank(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 20), "vec_id", "embedding",
      nlist = 8, nprobe = 3, m = 8, kAnchors = 4,
      shortlist = 10, topK = 3)
  }

  // ---------------------------------------------------------------- q230
  // Streaming IVF index maintenance, END TO END under the oracle: three
  // deterministic hash-bucket waves of embeddings stream through
  // foreachBatch — wave 0 draws and FREEZES the portable quantizer and
  // seeds the list-partitioned index, later waves assign-and-append
  // (O(batch) per ingest, never a recluster) — then the q182-style
  // search runs over the READ-BACK persisted index with static list
  // pruning. The DuckDB oracle replays the whole thing (centroids drawn
  // from the wave-0 subset, assignment over the full corpus), so the
  // streamed artifact itself is hash-checked, not just spec-compared.
  def q230(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT",
          System.getProperty("java.io.tmpdir"))),
      "graft_q230_")
    try {
      val e = t(spark, dir, "embeddings").filter(col("vec_id") < 200)
      val b = SplitOps.hashBucket(col("vec_id"), 10)
      val tagged = e.withColumn("__w",
        when(b < 4, 0).when(b < 7, 1).otherwise(2))
      val wavesDir = s"$root/waves"
      // all three wave fixtures in ONE job (was one scan+write per wave)
      graft.tools.WaveFiles.writeStamped(tagged, "__w", 3, wavesDir,
        root.toString)
      val idxRoot = s"$root/index"
      graft.streaming.StreamingOps.streamingIvfIngest(
        spark, wavesDir, "vec_id", "embedding", idxRoot, nlist = 8)
      val (assigned, cents) = graft.streaming.StreamingOps
        .readStreamedIvfIndex(spark, idxRoot, "vec_id")
      val res = SimilarityOps.ivfSearchBatch(assigned, "vec_id",
          e.filter(col("vec_id") < 20), "vec_id", "embedding",
          cents, nprobe = 3, k = 3, excludeSameId = true,
          simRound = Some(6), pruneByList = true)
        .orderBy(col("q_id"), col("rank"))
      // pin before deleting the backing files (tiny |q|·k frame)
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q231
  // PII detection + redaction card (the pre-training scrub pass):
  // email/SSN/IPv4/phone patterns — the ASCII subset Java and RE2
  // execute identically — counted on the raw text and replaced in
  // inventory order; the per-source card fingerprints every redacted
  // document with the 60-bit MD5 polynomial, so the oracle hash-checks
  // the exact scrubbed output. Stateless per-row regexps, zero shuffle
  // before the |sources|-row aggregate.
  def q231(spark: SparkSession, dir: String): DataFrame =
    piiCard(t(spark, dir, "documents")).orderBy(col("source"))

  // ---------------------------------------------------------------- q232
  // Hashed-vocabulary multinomial Naive Bayes language classifier (the
  // trainable fastText-era routing baseline): tokens hash into 512
  // fixed slots, so model state is |classes|x512 REGARDLESS of corpus
  // vocabulary; add-one smoothing over the constant bucket space, exact
  // decimal score sums, argmax with class tiebreak, truth x prediction
  // confusion. (Word-soup fixture: accuracy is chance — the operator's
  // semantics, not the fixture's separability, are what the oracle
  // checks; q171's note.)
  def q232(spark: SparkSession, dir: String): DataFrame =
    TextOps.naiveBayesLangClassify(t(spark, dir, "documents"),
      "doc_id", "lang", "text", buckets = 512, evalBuckets = 4)

  // ---------------------------------------------------------------- q233
  // Streaming PII scrub card ≡ batch (q231's twin, the q202/q213/q221/
  // q222 sketch-twin convention): detection/redaction are stateless
  // per-row projections and every card column is an additive sum, so the
  // streaming groupBy — state bounded at one row per source forever —
  // equals the batch card under any micro-batching; same oracle.
  def q233(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingPiiCard(
      spark, dir, "documents.parquet",
      graft.streaming.StreamSink.Memory(s"q233_pii_${System.nanoTime()}"),
      piiCard)

  // ---------------------------------------------------------------- q234
  // BPE tokenizer training (Sennrich et al. 2016): 8 merge rounds over
  // the corpus word-frequency table — the real-trainer factorization
  // (one corpus shuffle, then |vocab|-row rounds). The merge table is
  // exact longs + binary string tiebreaks, replayed round-for-round in
  // DuckDB (list_reduce fold ≡ the Spark aggregate fold);
  // n_symbols_after pins the greedy left-to-right merge application,
  // not just the argmax.
  def q234(spark: SparkSession, dir: String): DataFrame =
    BpeOps.bpeMerges(t(spark, dir, "documents"), "text", rounds = 8)

  // ---------------------------------------------------------------- q235
  // BPE encode with the trained vocabulary (the apply side of q234):
  // replay the 8 learned merges over every document and emit per-doc
  // subword stats + a 60-bit fingerprint of each word's FULL subword
  // sequence — the exact segmentation is hash-checked, content and
  // order. Encoding is 8 stateless codegen'd fold projections; the
  // merge table rides along as literals (BPE's artifact is small by
  // design).
  def q235(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val merges = BpeOps.bpeMerges(docs, "text", rounds = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    BpeOps.bpeEncode(docs, "doc_id", "text", merges)
  }

  // ---------------------------------------------------------------- q236
  // l-diversity audit (the q217 upgrade): a big quasi-group is still
  // disclosive when everyone shares the same sensitive value — per
  // (nation, segment) group, distinct account-balance bands (1000-wide),
  // groups/rows below l=3, and the worst modal-value disclosure
  // probability. Two stacked aggregations, one card row.
  def q236(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.lDiversityCard(t(spark, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"),
      floor(col("c_acctbal") / lit(1000)).cast("long"), l = 3L)

  // ---------------------------------------------------------------- q237
  // Differentially-private histogram of order priorities: Laplace noise
  // b=1/ε from SEEDED portable draws (60-bit MD5 of the group key
  // through the two-round congruential generator — the q135 family), so
  // the released noisy counts replay exactly in DuckDB. Disjoint groups
  // → parallel composition: the histogram costs ε=1 total. The card is
  // the calibration view (true vs noisy vs ε).
  def q237(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.dpNoisyHistogram(t(spark, dir, "orders"),
      "o_orderpriority", eps = 1.0)

  // ---------------------------------------------------------------- q238
  // Exact-substring span scrub (Lee et al. 2021): every 5-gram occurring
  // ≥2 times anywhere in the corpus marks its token span; covered tokens
  // are REMOVED and the cleaned text re-assembled — span-level dedup
  // where q11/q27/q74 drop whole documents. The cleaned string itself is
  // fingerprinted, so the oracle checks the exact scrub. Only duplicated
  // starts explode (cost follows duplication mass, not corpus size).
  def q238(spark: SparkSession, dir: String): DataFrame =
    DedupOps.duplicateSpanScrub(t(spark, dir, "documents"),
      "doc_id", "text", n = 5, minCount = 2L)

  // ---------------------------------------------------------------- q239
  // DSIR data selection (Xie et al. 2023): make the crawl look like the
  // target — src0 is the target distribution, every other doc scores
  // log w = Σ cnt_b·(ln p_target(b) − ln p_raw(b)) over 1024 hashed
  // buckets (constant LM state), top-50 selected via TakeOrdered and
  // broadcast back. Exact decimal weight sums; the whole scoring chain
  // replays in DuckDB.
  def q239(spark: SparkSession, dir: String): DataFrame =
    TextOps.dsirSelection(t(spark, dir, "documents"), "doc_id", "text",
      col("source") === "src0", buckets = 1024, k = 50)

  // ---------------------------------------------------------------- q240
  // Matryoshka truncation-recall card (Kusupati et al. 2022): exact
  // top-5 retrieval over 8/16/64-dim prefixes vs the full 64-dim truth —
  // the "how many dims does the index need" decision card (d=64 is the
  // 1.0-recall sanity row). Truncation is a slice projection; one
  // broadcast kNN join per prefix.
  def q240(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
    SimilarityOps.matryoshkaRecallCard(e, "vec_id", "embedding",
      e.filter(col("vec_id") < 20), dims = Seq(8, 16, 64), k = 5)
  }

  // ---------------------------------------------------------------- q241
  // Cluster-balanced diversity sample: portable-IVF clusters (q182) ×
  // EQUAL per-cluster quotas by portable priority draw — dominant
  // content modes can't drown the tail (q209 is the proportional
  // variant; this is the diversity one). Centroids broadcast, one
  // assignment scan, bounded-k per-cluster selection.
  def q241(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.clusterBalancedSample(t(spark, dir, "embeddings"),
      "vec_id", "embedding", nlist = 8, perList = 8)

  // ---------------------------------------------------------------- q242
  // Epoch shard manifest — reproducible training data order: each epoch
  // is a different deterministic permutation (two-round draw, salt =
  // epoch), shard by clock, order within shard by (clock, id), and
  // fingerprint THE ORDER (position-weighted hash sum, exact decimal) so
  // "same data order" is hash-checkable, never trusted. One shuffle.
  def q242(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    SplitOps.epochShardManifest(docs, "doc_id",
      size(TextOps.tokens(col("text"))), nShards = 8, epoch = 1L)
  }

  // ---------------------------------------------------------------- q243
  // Tokenizer fertility card: encode the corpus with q234's trained BPE
  // vocabulary and report subwords-per-word BY LANGUAGE — the fertility
  // audit run before committing a tokenizer (languages the vocabulary
  // under-serves pay more compute per word). Composes q234 train +
  // q235 encode + a per-language aggregate.
  def q243(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val merges = BpeOps.bpeMerges(docs, "text", rounds = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    BpeOps.bpeEncode(docs, "doc_id", "text", merges)
      .join(docs.select(col("doc_id").as("id"), col("lang")), "id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words")).as("n_words"),
        sum(col("n_subwords")).as("n_subwords"))
      .withColumn("fertility",
        round(col("n_subwords").cast("double") /
          col("n_words").cast("double"), 6))
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------- q244
  // Water-filling token allocation: a 60% global token budget split
  // max-min fair across sources — every source gets level λ except the
  // ones with less available, which saturate; λ found in CLOSED FORM on
  // avail-sorted prefix sums, remainder tokens dealt one-each in sorted
  // order, Σ alloc ≡ budget exactly (all BIGINT). q109 fixes a
  // per-source budget; this solves for the fair one.
  def q244(spark: SparkSession, dir: String): DataFrame =
    SplitOps.tokenBudgetWaterfill(t(spark, dir, "documents"), "source",
      size(TextOps.tokens(col("text"))), budgetNum = 6L, budgetDen = 10L)

  // ---------------------------------------------------------------- q245
  // Weak-supervision LF diagnostics (the Snorkel LFAnalysis card): four
  // keyword labeling functions with abstention — per LF, votes,
  // coverage, overlap with other voters, and conflicts (different
  // labels on the same doc). The triage that decides which rules
  // survive before any label model is fit. One shared scan, |LF|
  // filtered projections, two aggregations.
  def q245(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.tokens(col("text"))
    TextOps.weakLabelDiagnostics(t(spark, dir, "documents"), "doc_id",
      Seq(
        ("lf_spark", array_contains(toks, "spark"), "tech"),
        ("lf_customer", array_contains(toks, "customer"), "retail"),
        ("lf_window_table", array_contains(toks, "window") &&
          array_contains(toks, "table"), "tech"),
        ("lf_vector", array_contains(toks, "vector"), "retail")))
  }

  // ---------------------------------------------------------------- q246
  // LSH quality card (the dedup analog of q220's ANN recall card):
  // banded MinHash candidates vs exact-Jaccard ≥ 0.8 truth — precision
  // (wasted verification), recall (missed near-dups), and the candidate
  // fraction vs all n(n−1)/2 pairs (the pruning win to watch when
  // tuning bands). Both chains are the proven q27/q39 machinery.
  def q246(spark: SparkSession, dir: String): DataFrame =
    DedupOps.lshQualityCard(t(spark, dir, "documents"), "doc_id", "text")

  // ---------------------------------------------------------------- q247
  // Embedding distribution drift: hash-half slices' mean vectors
  // compared as cosine-of-means, L2 shift, and the most-shifted
  // dimension — the vector-space sibling of the PSI family (q113/q131),
  // the early-warning read that the embedding model or content mix
  // changed between ingests. One pass, 2·d decimal accumulators.
  def q247(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.embeddingDriftCard(t(spark, dir, "embeddings"),
      "vec_id", "embedding",
      SplitOps.hashBucket(col("vec_id"), 20) >= 10)

  // ---------------------------------------------------------------- q248
  // Sequence-packing card: the corpus concatenated in doc order and cut
  // into 512-token contexts — contexts, boundary-split docs, fragment
  // count, tail waste. The global running offset is the two-level
  // prefix sum (per-bucket totals broadcast as offsets, wide window per
  // bucket) — never a single-partition global window.
  def q248(spark: SparkSession, dir: String): DataFrame =
    SplitOps.packingCard(t(spark, dir, "documents"), "doc_id", "text",
      contextLen = 512, bucketWidth = 100)

  // ---------------------------------------------------------------- q249
  // t-closeness audit — completes the privacy ladder (q217 k-anonymity,
  // q236 l-diversity): per (nation, segment) quasi-group, the total-
  // variation distance of the account-balance-band distribution from the
  // global one; card = worst TVD and data mass above t = 1/5. All
  // verdicts exact-rational (decimal products, no double threshold).
  def q249(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.tClosenessCard(t(spark, dir, "customer"),
      Seq("c_nationkey", "c_mktsegment"),
      floor(col("c_acctbal") / lit(1000)).cast("long"), tNum = 1L,
      tDen = 5L)

  // ---------------------------------------------------------------- q250
  // Heaps'-law vocabulary growth: V(N) at id-order prefix checkpoints
  // (10/25/50/100%) with the empirical exponent β between checkpoints —
  // the read that predicts vocab size at 10× data. One token explosion;
  // cumulative counting runs on the vocab-bounded aggregate.
  def q250(spark: SparkSession, dir: String): DataFrame =
    TextOps.heapsGrowthCard(t(spark, dir, "documents"), "doc_id", "text")

  // ---------------------------------------------------------------- q251
  // Cluster-occupancy drift (MAUVE-lite): hash-half slices quantized
  // against shared portable-IVF clusters, per-cluster smoothed JS
  // contributions + decimal-accumulated total — the distribution-SHAPE
  // drift read next to q247's mean shift (same slices).
  def q251(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.clusterOccupancyDrift(t(spark, dir, "embeddings"),
      "vec_id", "embedding",
      SplitOps.hashBucket(col("vec_id"), 20) >= 10)

  // ---------------------------------------------------------------- q252
  // Cluster-cohesion card: per portable-IVF cluster, mean cosine to the
  // own centroid vs the runner-up centroid — the quantizer-separation
  // margin behind q220's recall symptom. One broadcast scan + top-2
  // window; decimal-accumulated means.
  def q252(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.clusterCohesionCard(t(spark, dir, "embeddings"),
      "vec_id", "embedding")

  // ---------------------------------------------------------------- q254
  // Streaming twin of q251 (SHARED oracle): the corpus streamed in 3
  // hash waves; pass 1 maintains the portable centroid draw as a
  // persisted min-k store (monotone merge, nlist rows forever), pass 2
  // accumulates additive per-slice occupancy counts batchId-keyed; the
  // shared finishing lands on the identical drift card.
  def q254(spark: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT",
          System.getProperty("java.io.tmpdir"))),
      "graft_q254_")
    try {
      val e = t(spark, dir, "embeddings")
      val b = SplitOps.hashBucket(col("vec_id"), 10)
      val tagged = e.withColumn("__w",
        when(b < 4, 0).when(b < 7, 1).otherwise(2))
      val wavesDir = s"$root/waves"
      // all three wave fixtures in ONE job (was one scan+write per wave)
      graft.tools.WaveFiles.writeStamped(tagged, "__w", 3, wavesDir,
        root.toString)
      val res = graft.streaming.StreamingOps.streamingClusterDrift(
          spark, wavesDir, "vec_id", "embedding",
          SplitOps.hashBucket(col("vec_id"), 20) >= 10,
          s"$root/store", nlist = 8)
        .orderBy(col("centroid_id"))
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row]()
      res.collect().foreach(rows.add)
      spark.createDataFrame(rows, res.schema)
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  // ---------------------------------------------------------------- q256
  // Cluster-vs-label agreement: portable-IVF clusters scored against
  // the embeddings' label column — purity and NMI, every entropy/MI
  // term decimal-accumulated. Says whether unsupervised clusters track
  // the curator's taxonomy (q241's sampling premise, measured).
  def q256(spark: SparkSession, dir: String): DataFrame =
    SimilarityOps.clusterLabelCard(t(spark, dir, "embeddings"),
      "vec_id", "embedding", "label")

  // ---------------------------------------------------------------- q296
  // Source-mix diversity: entropy, EFFECTIVE source count exp(H),
  // Simpson index, top-source share — is the corpus diverse or one
  // crawl wearing twenty names, in one row.
  def q296(spark: SparkSession, dir: String): DataFrame =
    TextOps.mixDiversityCard(t(spark, dir, "documents"), "source")

  // ---------------------------------------------------------------- q315
  // HITS hubs/authorities on the directed customer→part purchase graph
  // (who are the broad buyers, which parts anchor the catalog) — the
  // q118 exact-integer fixed-point contract with L∞ normalization;
  // top-10 each side.
  def q315(spark: SparkSession, dir: String): DataFrame = {
    val edges = t(spark, dir, "orders")
      .join(t(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey"))
    graft.operators.GraphOps.hitsFixedPoint(
      edges, "o_custkey", "l_partkey")
  }

  // ---------------------------------------------------------------- q316
  // 1-D two-component Gaussian-mixture EM on event values: fixed 6
  // rounds, DECIMAL E-step moments, round-9 M-step params, closed-form
  // init (μ = mean ∓ sd) — the unsupervised member of the portable-fit
  // family, with the per-round log-likelihood monotonicity trace.
  def q316(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.gmm1dEmPortable(t(spark, dir, "events"), "value")

  // ---------------------------------------------------------------- q317
  // TextRank keywords: PageRank centrality over the corpus word-
  // adjacency graph (vocab = tokens with count ≥ 5, edges = adjacent
  // pairs) on the q118 exact-integer contract — the global-graph
  // keyword card next to RAKE (q307) and PMI (q255).
  def q317(spark: SparkSession, dir: String): DataFrame =
    TextOps.textRankKeywords(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q318
  // Cox proportional-hazards fit (binary cohort covariate) on the
  // q299 signup→purchase durations: fixed Newton steps on the Breslow
  // partial likelihood in the portable-fit contract — the model-based
  // hazard ratio next to q299's log-rank test (whose score test is
  // this fit's first step at β=0).
  def q318(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SurvivalOps.coxPhBinary(
      signupDurations(spark, dir), "dur_days", "__event", col("__cohort_a"))

  // ---------------------------------------------------------------- q319
  // 1-D k-means (k=3, 6 Lloyd rounds) on event values in the portable-
  // fit contract — hard-assignment clustering next to q316's soft GMM,
  // with the per-iteration WCSS monotonicity trace.
  def q319(spark: SparkSession, dir: String): DataFrame =
    MlPipelines.kmeans1dPortable(t(spark, dir, "events"), "value")

  // ---------------------------------------------------------------- q320
  // Friedman test: do event types differ in value once each user-
  // bucket's baseline is ranked away? Blocks = user_id mod 50,
  // treatments = event_type, cells = per-(block, type) mean; complete
  // blocks only, tie-corrected — the repeated-measures member of the
  // rank-test family (q259 Mann–Whitney, q261 Kruskal–Wallis, q313
  // Wilcoxon).
  def q320(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.friedmanTest(
      t(spark, dir, "events").withColumn("__blk", col("user_id") % 50),
      "__blk", "event_type", "value")

  // ---------------------------------------------------------------- q321
  // Lift / cumulative-gains deciles of the q46 order-value scorer:
  // population deciles from distributed midranks (tied scores stay in
  // one decile), per-decile lift over base rate and cumulative capture.
  def q321(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("score",
        (col("o_orderkey") % 1000) / lit(1000.0) +
          col("o_totalprice") / lit(1e6))
    graft.metrics.RankMetrics.liftGainsCard(d, "score", "label")
  }

  // ---------------------------------------------------------------- q322
  // Dunning log-likelihood keyness: which terms characterize each
  // document source vs the rest of the corpus (G² on the 2×2 term
  // table, 0·ln0 = 0) — the source-profiling card next to q204's
  // label-association χ².
  def q322(spark: SparkSession, dir: String): DataFrame =
    TextOps.keynessCard(t(spark, dir, "documents"), "source", "text")

  // ---------------------------------------------------------------- q323
  // 7-core of the q118 cosine-similarity graph by 8 exact-integer
  // peeling rounds (k=7 sits inside the degree distribution, so the
  // cascade genuinely peels): the dense backbone that survives once
  // weakly-attached mirrors cascade away.
  def q323(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.kCore(
        cosineEdges(spark, dir, 0.2), "id_a", "id_b", k = 7)
      .select(col("v").as("vec_id"), col("degree"))
      .orderBy(col("vec_id"))

  // ---------------------------------------------------------------- q324
  // Flesch readability card per source: words/sentence, vowel-group
  // syllables/word, Reading Ease and FK grade — the audience-level
  // complement to q13's quality score.
  def q324(spark: SparkSession, dir: String): DataFrame =
    TextOps.readabilityCard(t(spark, dir, "documents"), "source", "text")

  // ---------------------------------------------------------------- q325
  // Streaming twin of q322 (SHARED oracle): the (source, term) count
  // frame is additive complete-mode state; the shared G² finisher
  // lands on the batch keyness card bit-for-bit.
  def q325(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingKeyness(
      spark, dir, "documents.parquet", "source", "text",
      graft.streaming.StreamSink.Memory("q325_keyness"))

  // ---------------------------------------------------------------- q326
  // Mann–Kendall trend test on the daily event-count series (q273's
  // spine): exact-integer S, tie-corrected variance, continuity-
  // corrected z, τ_b vs time — "is the trend real" next to Theil–Sen's
  // "how steep".
  def q326(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.mannKendallDailyTrend(
      t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q327
  // Pettitt rank change-point on the daily event-count series: exact-
  // integer rank CUSUM, K = max|U_t| with earliest argmax, the classic
  // 2·exp(−6K²/(n³+n²)) significance — the distribution-free sibling
  // of q267's CUSUM.
  def q327(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RobustStats.pettittDailyChangePoint(
      t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q328
  // Jonckheere–Terpstra ordered-alternative test: does order value
  // trend across the NATURALLY ORDERED priority levels ('1-URGENT' <
  // … < '5-LOW')? Exact-integer 2J off one cumulative-count spine,
  // full Hollander–Wolfe tie-corrected null moments.
  def q328(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.jonckheereTerpstra(
      t(spark, dir, "orders"), "o_totalprice", "o_orderpriority")

  // ---------------------------------------------------------------- q329
  // Cronbach's α over the lineitem measure battery — the internal-
  // consistency / redundancy audit: raw α from exact-decimal item
  // variances, standardized α from the mean pairwise Pearson r.
  def q329(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ProfileOps.cronbachAlpha(t(spark, dir, "lineitem"),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))

  // ---------------------------------------------------------------- q330
  // PACF of the daily event-count series via Durbin–Levinson on
  // q269's 6-decimal ACF card (round-9 recursion, the portable-fit
  // contract) — the AR-order picker next to q269's raw ACF.
  def q330(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.pacfDurbinLevinson(t(spark, dir, "events"), "ts",
      maxLag = 4)

  // ---------------------------------------------------------------- q331
  // Ljung–Box portmanteau on the daily event-count series: Q(h) per
  // lag 1..7 off q269's ACF card — the whiteness test that closes the
  // ACF/PACF triptych. Decimal-summed running terms keep the window
  // reduction order-independent.
  def q331(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.ljungBoxDailyCounts(t(spark, dir, "events"), "ts",
      maxLag = 7)

  // ---------------------------------------------------------------- q332
  // Durbin–Watson on OLS-detrended daily counts: serial-correlation-
  // in-residuals next to q331's raw-series whiteness; exact integer
  // OLS moments, decimal-summed residual reductions.
  def q332(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.durbinWatsonDailyTrend(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q333
  // Wald–Wolfowitz runs test: do above/below-median days clump? Exact
  // order-statistic median, sign-change run count, exact-integer null
  // moments.
  def q333(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.runsTestDailyCounts(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q334
  // Jarque–Bera normality card on extended price: exact decimal raw
  // moments Σx..Σx⁴, fixed-shape S/K assembly — the screen in front
  // of the normality-assuming members of the test battery.
  def q334(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.jarqueBera(t(spark, dir, "lineitem"), "l_extendedprice")

  // ---------------------------------------------------------------- q335
  // Bartlett variance homogeneity across event types — the parametric
  // sibling of q287's Levene; per-group ln-variance terms rounded and
  // decimal-summed so group order cannot move T.
  def q335(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.bartlettTest(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q336
  // McNemar paired-binary per customer: "has an URGENT order" vs "has
  // a filled order" — discordant-cell χ² with Edwards continuity
  // correction, exact 2×2 integers.
  def q336(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.mcnemarTest(
      t(spark, dir, "orders"), "o_custkey",
      col("o_orderpriority") === "1-URGENT",
      col("o_orderstatus") === "F")

  // ---------------------------------------------------------------- q337
  // Binary-classifier summary card on the q18 labeled orders: MCC,
  // Fowlkes–Mallows, Youden's J, markedness — the imbalance-robust
  // single-number scores the per-class table (q41) can't give. Exact
  // 2×2 cells, fixed-shape double assembly.
  def q337(spark: SparkSession, dir: String): DataFrame =
    MetricQueries.binaryClassifierCard(
      labeledOrders(spark, dir), "label", "pred")

  // ---------------------------------------------------------------- q338
  // Mood's median test: do event types share one median value? Exact
  // two-middle-order-statistic pooled median over the distinct-value
  // cumulative frame, at-median drops, 2×k χ² — the outlier-proof end
  // of the k-sample location family (q261/q286/q287/q335).
  def q338(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.moodsMedianTest(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q339
  // SCD type-2 history of each user's event_type: per-key validity
  // intervals (valid_from / valid_to / is_current / version) built in
  // two key-partitioned window passes — "what was, when" next to
  // q70's latest-state compaction.
  def q339(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CdcOps.scdType2(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type")
      .orderBy(col("user_id"), col("version"))

  // ---------------------------------------------------------------- q340
  // KPSS level-stationarity on the daily spine: partial sums of the
  // demeaned counts over the Bartlett long-run variance (L=4) — the
  // stationarity-as-null mirror of the unit-root side (q343 ADF).
  def q340(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.kpssDailyCounts(t(spark, dir, "events"), "ts",
      bandwidth = 4)

  // ---------------------------------------------------------------- q341
  // Variance-ratio card VR(2/4/8) on daily counts: overlapping q-day
  // sums vs q× the 1-day variance — persistence/mean-reversion in one
  // number per horizon, all moments exact integers.
  def q341(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.varianceRatioDailyCounts(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q342
  // Page–Hinkley monitor on daily counts: running-mean excursion peak
  // and its first day — the one-pass sequential sibling of q267's
  // global-mean CUSUM.
  def q342(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.pageHinkleyDailyCounts(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q343
  // Augmented Dickey–Fuller (1 lag, constant) on daily counts: Cramer-
  // solved closed-form fit from exact integer moments, unit-root
  // t-ratio — the null-side mirror of q340's KPSS.
  def q343(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.adfTestDailyCounts(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q344
  // Granger causality click→purchase on the shared daily spine:
  // restricted-vs-unrestricted closed-form OLS, F for the lagged
  // cross-term — "does yesterday's click count forecast purchases?".
  def q344(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.grangerDailyCounts(t(spark, dir, "events"), "ts",
      "event_type", "click", "purchase")

  // ---------------------------------------------------------------- q345
  // Cochrane–Orcutt AR(1) correction of the daily trend: ρ̂ from the
  // q332 residuals, quasi-differenced refit — the repair for the
  // serial correlation DW just measured.
  def q345(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.cochraneOrcuttDailyTrend(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q346
  // Chow break test at the spine midpoint: pooled-vs-split closed-form
  // OLS SSEs from one grouped exact-moment reduction — TESTS the break
  // q290's exhaustive segmented fit SEARCHES for.
  def q346(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.chowTestDailyCounts(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q347
  // Breusch–Pagan on the q332 trend residuals: e² regressed on day
  // index, LM = n·R² — does residual VARIANCE trend after the mean is
  // removed (the scale sibling of DW's correlation check).
  def q347(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.breuschPaganDailyTrend(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q348
  // Classical additive decomposition (period 7): centered MA-7 trend,
  // centered per-phase seasonal indices, remainder variance share —
  // the decomposition behind q176's strength scalar and q278's raw
  // day-of-week card.
  def q348(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.seasonalDecompositionDailyCounts(
      t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q352
  // Link prediction on the cosine graph: common-neighbor / Jaccard /
  // Adamic–Adar top-20 over non-adjacent pairs — "which near-dup pair
  // did the 0.2 threshold miss"; banded wedge join, never all-pairs.
  def q352(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.linkPredictionCard(
      cosineEdges(spark, dir, 0.2), "id_a", "id_b", topK = 20)

  // ---------------------------------------------------------------- q353
  // Structural card of the cosine graph: Newman degree assortativity
  // over the 2m stubs + global transitivity 3·tri/wedges — hubs-to-
  // hubs mixing and closed-wedge fraction, exact integer moments.
  def q353(spark: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.assortativityCard(
      cosineEdges(spark, dir, 0.2), "id_a", "id_b")

  // ---------------------------------------------------------------- q354
  // Lexical-diversity card: Yule's K, Simpson's D, Honoré's R, Sichel's
  // S off the exact token spectrum — the repeat-structure view next to
  // q289's species estimates; template floods move K hard.
  def q354(spark: SparkSession, dir: String): DataFrame =
    TextOps.lexicalDiversityCard(t(spark, dir, "documents"), "text")

  // ---------------------------------------------------------------- q355
  // Interpolated Kneser–Ney bigram LM (D=0.75) self-scored on the
  // corpus: continuation-count smoothing — the principled upgrade over
  // q133's raw MLE bigram perplexity, all counts exact integers.
  def q355(spark: SparkSession, dir: String): DataFrame =
    TextOps.kneserNeyBigramCard(t(spark, dir, "documents"), "doc_id",
      "text")

  // ---------------------------------------------------------------- q356
  // TV / Bhattacharyya / Hellinger between the event-type mixes of the
  // even- and odd-user cohorts — the bounded/metric members of the
  // categorical drift family (PSI q113, JS q177).
  def q356(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.categoricalDistanceCard(
      t(spark, dir, "events"), "event_type", col("user_id") % 2 === 0)

  // ---------------------------------------------------------------- q360
  // Hosmer–Lemeshow on the q224 raw scorer: deciles of predicted risk
  // via distributed midranks, observed-vs-expected positives, the χ²
  // calibration TEST behind q84/q197's descriptive reliability views.
  def q360(spark: SparkSession, dir: String): DataFrame =
    graft.metrics.RankMetrics.hosmerLemeshowCard(
      t(spark, dir, "orders")
        .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
        .withColumn("p",
          round((col("o_orderkey") * 7 % 1000) / lit(1000.0), 6)),
      "p", "label")

  // ---------------------------------------------------------------- q361
  // Forecast-accuracy yardstick: naive vs seasonal-naive on the daily
  // spine with MAE/RMSE/sMAPE/MASE/Theil's U — the baseline rows any
  // real forecaster (q111, q308) must beat.
  def q361(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.forecastAccuracyCard(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q362
  // Linear-time MMD² between even/odd-label embedding cohorts: RBF
  // h-statistics over id-ordered quadruples — O(n) kernel two-sample
  // drift where the U-statistic is O(n²).
  def q362(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SimilarityOps.mmdLinearCard(
      t(spark, dir, "embeddings"), "vec_id", "embedding",
      col("label") % 2 === 0)

  // ---------------------------------------------------------------- q363
  // DP clipped-mean calibration card: the q237 seeded-Laplace contract
  // on the numeric mean — clip to [0,200], split ε across sum+count,
  // release noisy_sum/noisy_count; portability-over-privacy documented.
  def q363(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.dpClippedMean(t(spark, dir, "events"), "value",
      hi = 200.0, eps = 1.0)

  // ---------------------------------------------------------------- q364
  // Re-identification risk card on (nation, segment, balance-bucket):
  // how many customers are UNIQUE on the quasi-identifier — the
  // attacker's-eye profile motivating q217/q236/q249's guarantees.
  def q364(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.uniquenessRiskCard(t(spark, dir, "customer"),
      Seq(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 100.0).as("bal_bucket")))

  // ---------------------------------------------------------------- q365
  // Streaming twin of q342 (SHARED oracle): the day-count frame is
  // additive complete-mode state; the same pageHinkleyFromCounts
  // finisher lands on the batch card bit-for-bit.
  def q365(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingPageHinkley(
      spark, dir, "events.parquet", "ts",
      graft.streaming.StreamSink.Memory("q365_ph"),
      prepare = Tables.normalizeEventTs)
  }

  // ---------------------------------------------------------------- q366
  // Periodogram of daily volume: power at the Fourier frequencies,
  // normalized spectral entropy, dominant period — DISCOVERS the
  // seasonality q348's fixed-period decomposition assumes.
  def q366(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.periodogramDailyCounts(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q367
  // Ordinal association quantity × price-band on lineitem: Kendall
  // τ_b / Goodman–Kruskal γ / Somers' d from one contingency-cell
  // self-join — the ordinal sibling of q271's Cramér's V.
  def q367(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.ordinalAssociationCard(
      t(spark, dir, "lineitem"),
      col("l_quantity").cast("long"),
      floor(col("l_extendedprice") / 10000.0).cast("long"))

  // ---------------------------------------------------------------- q368
  // Brunner–Munzel click-vs-view: the heteroscedasticity-robust rank
  // test (relative effect + studentized W + Satterthwaite df) that
  // replaces q259's Mann–Whitney when shapes differ under the null.
  def q368(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.brunnerMunzelTest(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q369
  // Cochran's Q over per-USER-DAY click/view/purchase indicators: do
  // the k related binary treatments share one daily rate — the
  // k-treatment generalization of q336's McNemar, exact integer cells
  // (user-day subjects keep within-subject variation alive; per-user
  // every indicator saturates and Q is undefined).
  def q369(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.cochranQTest(
      t(spark, dir, "events"),
      concat_ws(":", col("user_id"), to_date(col("ts"))), "event_type",
      Seq("click", "view", "purchase"))

  // ---------------------------------------------------------------- q370
  // One-sample KS of per-user inter-arrival gaps against the fitted
  // exponential: how far from Poisson is the arrival process — the
  // timing-side model check next to q282's count overdispersion.
  def q370(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.exponentialGapKs(
      t(spark, dir, "events"), "user_id", "ts", "event_id")

  // ---------------------------------------------------------------- q371
  // Partial correlation quantity↔price given discount on lineitem: the
  // confounder check q210's raw matrix can't make, three Pearson r's
  // from one ten-moment exact-decimal aggregation.
  def q371(spark: SparkSession, dir: String): DataFrame =
    ProfileOps.partialCorrelation(t(spark, dir, "lineitem"),
      "l_quantity", "l_extendedprice", "l_discount")

  // ---------------------------------------------------------------- q372
  // ANOVA effect sizes η²/ω²/ε²/Cohen's f for value-by-event-type: the
  // MAGNITUDE companions to q286's F — does the grouping matter, not
  // just is it significant.
  def q372(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.anovaEffectSizes(
      t(spark, dir, "events"), "value", "event_type")

  // ---------------------------------------------------------------- q373
  // Entropy rate of the per-user event-type Markov chain: how
  // predictable is the next event given the current — the one-number
  // summary of q114's transition matrix, with ln(k) normalization.
  def q373(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.markovEntropyRate(
      t(spark, dir, "events"), "user_id", "ts", "event_id", "event_type")

  // ---------------------------------------------------------------- q374
  // Poisson log-linear trend on daily counts: IRLS in the portable-fit
  // contract — the CORRECT count-trend model next to q332's OLS line
  // (never negative, variance grows with the mean); b exponentiates to
  // a daily rate ratio; deviance trace pins convergence.
  def q374(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.poissonTrendIrls(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q375
  // Streaming twin of q348 (SHARED oracle): additive day-count state
  // through the same seasonalDecompositionFromCounts finisher.
  def q375(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    graft.streaming.StreamingOps.streamingSeasonalDecomposition(
      spark, dir, "events.parquet", "ts",
      graft.streaming.StreamSink.Memory("q375_seasonal"),
      prepare = Tables.normalizeEventTs)
  }

  // ---------------------------------------------------------------- q376
  // Nelson–Aalen cumulative hazard on q122's signup→purchase durations:
  // H(t) = Σ d/n with its variance and the Breslow survival — the
  // additive hazard-scale view of the same censored frame (increments
  // over disjoint windows sum; KM's product doesn't decompose).
  def q376(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SurvivalOps
      .nelsonAalen(signupPurchaseDurations(spark, dir), "dur_days",
        "__event")
      .orderBy(col("t"))

  // ---------------------------------------------------------------- q377
  // Meta-analysis of the urgent-vs-standard order-value effect across
  // nations: per-nation mean differences pooled inverse-variance (fixed
  // effect) and DerSimonian–Laird (random effects), with Cochran's Q,
  // τ², and I² — "is this one effect or a mixture of per-segment
  // effects" before anyone trusts the single pooled delta.
  def q377(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val joined = o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
    graft.operators.DriftOps.metaAnalysisPool(
      joined, "c_nationkey", "o_totalprice",
      col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
  }

  // ---------------------------------------------------------------- q378
  // Ansari–Bradley dispersion test on click-vs-view event values: the
  // rank answer to "did the variance move" next to q259's location test
  // and q287's Levene — both-ends mid-rank scores (doubled, exact
  // integers), finite-population moments under any tie pattern.
  def q378(spark: SparkSession, dir: String): DataFrame =
    graft.operators.DriftOps.ansariBradley(
      t(spark, dir, "events"), "value", "event_type", "click", "view")

  // ---------------------------------------------------------------- q379
  // Quantile trend lines on the daily count spine: pinball IRLS at
  // τ ∈ {0.25, 0.5, 0.75} in the portable-fit contract — three slopes
  // bound the trend's shape (diverging quartile slopes = the spread
  // itself is trending); the τ=0.5 line is q332's robust twin.
  def q379(spark: SparkSession, dir: String): DataFrame =
    TimeSeriesOps.quantileTrendIrls(t(spark, dir, "events"), "ts")

  // ---------------------------------------------------------------- q380
  // KMV k-minimum-values distinct sketch per returnflag + merged ALL:
  // the third portable cardinality path next to exact countDistinct and
  // the q162 HLL registers — the kept hashes are also a uniform sample
  // of the distinct set (overlap/Jaccard questions HLL can't answer).
  // ALL is merged from the per-group sketches, never from data.
  def q380(spark: SparkSession, dir: String): DataFrame = {
    val keyed = t(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"), col("l_orderkey").as("k"))
    SketchOps.kmvDistinctCard(
      SketchOps.kmvMinHashes(keyed, Seq("grp"), col("k")), keyed)
  }

  // q380's streaming twin (SHARED oracle): ≤64 sorted longs of state per
  // group via mapGroupsWithState; minK over deduplicated unions is
  // associative/commutative/idempotent, so any micro-batching (and
  // update-mode re-emission) lands on the batch sketch exactly.
  def q380stream(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamingOps.streamingKmvDistinct(
      spark, dir, "lineitem.parquet",
      graft.streaming.StreamSink.Memory("q380_kmv"),
      prepare = _.select(col("l_returnflag").as("grp"),
        col("l_orderkey").as("k")))
}
