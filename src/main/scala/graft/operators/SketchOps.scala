package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count–min sketch heavy hitters (Cormode & Muthukrishnan, "An improved
  * data stream summary: the count-min sketch and its applications"). The
  * HLL/quantile sketches (q53/q107) answer "how many distinct / what
  * quantile"; the CMS answers "how often does THIS item occur" in fixed
  * memory — the heavy-hitter primitive for vocabulary pruning and stopword
  * discovery over a corpus too large for an exact term dictionary.
  *
  * Scale shape: the sketch is depth×width counters built with ONE
  * aggregation keyed by (depth, bucket) over ONE pass of the term stream —
  * each term's `depth` bucket draws come from disjoint slices of a single
  * MD5 digest. Counters are exact BIGINT sums, so the sketch is mergeable
  * across partitions/days by addition, and the one-sided error bound
  * (estimate ≥ truth, overshoot ≤ N/width with probability 1 − 2^−depth)
  * holds deterministically given the hash.
  */
object SketchOps {

  /** Portable 60-bit hash: the first 15 hex digits of MD5, as a BIGINT —
    * used where one draw needs the full hash width (HLL register+rank).
    */
  private def md5Long60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** All `depth` bucket draws from ONE MD5 digest: depth d reads its own
    * disjoint 7-hex-digit slice (28 bits, far above any practical width) —
    * the simhash many-hashes-from-one-digest trick. One MD5 per term
    * instead of `depth`, and standard MD5 over UTF-8 bytes means any
    * engine reproduces the value (the DuckDB oracle decodes the same
    * slices with a strpos polynomial) — the sketch's counter matrix is
    * exact integer arithmetic REPLAYABLE end-to-end, not just bounded.
    *
    * FORMAT BREAK (round 7): this single-digest layout replaced the
    * earlier per-depth-seeded hash, which changed every counter value and
    * narrowed the API to depth ≤ 4. All in-repo call sites and oracles
    * moved in lockstep; CMS counter matrices persisted under the OLD
    * scheme cannot be merged with or compared to new ones. 28 bits per
    * slice bounds width at 2²⁸ — far above the ≤ 2¹⁶ widths the heavy-
    * hitter use cases here need; a future depth > 4 needs a second digest
    * (e.g. md5(term || 'x')), not narrower slices.
    */
  private def bucketPairs(term: Column, depth: Int, width: Int): Column = {
    require(depth >= 1 && depth * 7 <= 32,
      s"depth must be in [1,4] (7 hex digits per slice of one MD5), got $depth")
    val digest = md5(term.cast("string"))
    array((0 until depth).map(d =>
      struct(lit(d).as("depth"),
        pmod(conv(substring(digest, 1 + 7 * d, 7), 16, 10).cast("long"),
          lit(width.toLong)).as("bucket"))): _*)
  }

  /** Per-(depth, bucket) CMS counters for `termCol` weighted by `cntCol`
    * (pre-aggregated term counts fold in exactly — the sketch of the raw
    * stream and of the exact term frame are identical by linearity).
    * ONE pass over the term frame: the (depth, bucket) pairs explode from
    * an array — a depth-way union would re-run the upstream term
    * aggregation once per depth.
    */
  def cmsCounters(terms: DataFrame, termCol: String, cntCol: String,
      depth: Int, width: Int): DataFrame =
    terms
      .select(explode(bucketPairs(col(termCol), depth, width)).as("__db"),
        col(cntCol).as("__c"))
      .groupBy(col("__db.depth").as("depth"), col("__db.bucket").as("bucket"))
      .agg(sum(col("__c")).as("counter"))

  /** Heavy hitters with CMS estimates: the exact top-`k` terms (for the
    * ground truth this query also carries) joined against their
    * min-over-depths sketch estimate. `overcount = estimate − exact ≥ 0`
    * is the collision error the width bounds.
    */
  def cmsHeavyHitters(df: DataFrame, idCol: String, textCol: String,
      depth: Int = 4, width: Int = 256, k: Int = 20): DataFrame = {
    val terms = df
      .select(explode(split(trim(col(textCol)), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n_exact"))
    cmsFinishHeavyHitters(terms,
      cmsCounters(terms, "term", "n_exact", depth, width), depth, width, k)
  }

  /** CMS counters straight from a raw token stream (weight 1 per
    * occurrence) — by linearity identical to [[cmsCounters]] over the
    * exact term frame, but needing NO term-level aggregation state, so a
    * STREAMING build can maintain the sketch with depth×width bounded
    * state forever (the additive-counter contract q202's quantile sketch
    * follows).
    */
  def cmsCountersFromTokens(tokens: DataFrame, termCol: String,
      depth: Int, width: Int): DataFrame =
    cmsCounters(tokens.withColumn("__one", lit(1L)), termCol, "__one",
      depth, width)

  /** Heavy-hitter finishing step against an already-built counter frame
    * (one batch pass, a merge of per-shard sketches, or a streaming
    * aggregation whose state IS the sketch): exact top-`k` terms probed
    * for their min-over-depths estimates.
    */
  def cmsFinishHeavyHitters(terms: DataFrame, counters: DataFrame,
      depth: Int, width: Int, k: Int): DataFrame = {
    val top = terms
      .orderBy(col("n_exact").desc, col("term"))
      .limit(k)
    val probes = top
      .select(col("term"), col("n_exact"),
        explode(bucketPairs(col("term"), depth, width)).as("__db"))
      .select(col("term"), col("n_exact"),
        col("__db.depth").as("depth"), col("__db.bucket").as("bucket"))
    probes.join(broadcast(counters), Seq("depth", "bucket"))
      .groupBy(col("term"))
      .agg(
        first(col("n_exact")).as("n_exact"),
        min(col("counter")).as("n_estimate"))
      .withColumn("overcount", col("n_estimate") - col("n_exact"))
      .orderBy(col("n_exact").desc, col("term"))
  }

  /** Equi-join cardinality estimate from two CMS counter frames: the true
    * size is Σ_k cA(k)·cB(k); the sketch estimate is min over depths of
    * Σ_b ctrA(d,b)·ctrB(d,b) — the classic sketch inner product, an upper
    * bound that a planner consults BEFORE paying for the join (choose
    * broadcast vs shuffle vs salt from depth×width integers instead of a
    * dry run). Exact BIGINT arithmetic throughout; the error bound is
    * nA·nB/width with probability 1 − 2^−depth.
    */
  def cmsJoinCardinality(aCounters: DataFrame,
      bCounters: DataFrame): DataFrame = {
    val a = aCounters.select(col("depth"), col("bucket"),
      col("counter").as("__ca"))
    val b = bCounters.select(col("depth"), col("bucket"),
      col("counter").as("__cb"))
    a.join(b, Seq("depth", "bucket"))
      .groupBy(col("depth"))
      .agg(sum(col("__ca") * col("__cb")).as("__dot"))
      .agg(min(col("__dot")).as("est_join_rows"))
  }

  /** Fully PORTABLE HyperLogLog registers for `valueExpr` per group: the
    * 60-bit MD5 hash splits into a 6-bit register index (m = 64) and a
    * 54-bit pattern whose leading-zero count (+1) is the register's rank
    * observation; registers keep the max. Unlike the built-in
    * `approx_count_distinct` (whose HLL++ internals no other engine
    * replays — q53/q107 stay rows-only for exactly that reason), every
    * register here is exact integer arithmetic any engine reproduces, so
    * the estimate is ORACLE-CHECKABLE end-to-end while keeping the
    * properties that make HLL the 100 TB distinct-count path: fixed 64
    * cells per group, one-pass, and merge = element-wise max (associative
    * and commutative, so partial aggregates, shard union, and incremental
    * ingest all compose exactly).
    *
    * Bit-length via `bin()` string length — exact, no float log anywhere.
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String],
      valueExpr: Column): DataFrame = {
    val h = md5Long60(concat(lit("hll#"), valueExpr.cast("string")))
    val j = pmod(h, lit(64L))
    val w = shiftright(h, 6)
    // leading zeros of the 54-bit pattern + 1; all-zero pattern → 55
    val rho = when(w === 0L, lit(55L))
      .otherwise(lit(55L) - length(bin(w)).cast("long"))
    df.select((groupCols.map(col) :+ j.as("j") :+ rho.as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("j")): _*)
      .agg(max(col("rho")).as("m_j"))
  }

  /** HLL estimate from a register frame: α₆₄·m²/Σⱼ2^(−Mⱼ) with the
    * standard small-range linear-counting correction. The register sum is
    * scaled by 2⁵⁵ so it is EXACT BIGINT (64 registers × ≤2⁵⁵ < 2⁶³ —
    * a float sum of 2^(−Mⱼ) terms would not replay bit-for-bit); the only
    * floating ops are one division and one optional ln, both
    * engine-portable at the rounded 6 decimals.
    */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String]): DataFrame = {
    val gs = groupCols.map(col)
    registers
      .groupBy(gs: _*)
      .agg(
        count(lit(1)).as("n_registers_hit"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(55 - m_j AS INT))"))
          .as("__sum_hit"))
      .withColumn("__zeros", lit(64L) - col("n_registers_hit"))
      .withColumn("__sum_scaled",
        col("__sum_hit") + col("__zeros") * lit(1L << 55))
      .withColumn("__raw",
        lit(0.709) * lit(4096.0) * lit(math.pow(2, 55)) /
          col("__sum_scaled").cast("double"))
      .withColumn("hll_estimate",
        round(when(col("__raw") <= 160.0 && col("__zeros") > 0L,
            lit(64.0) * log(lit(64.0) / col("__zeros").cast("double")))
          .otherwise(col("__raw")), 6))
      .select((gs :+ col("n_registers_hit") :+ col("hll_estimate")): _*)
  }

  /** KMV (k-minimum-values, Bar-Yossef et al. 2002) distinct sketch:
    * the k smallest DISTINCT 60-bit MD5 hashes of `valueExpr` per
    * group. The third portable cardinality sketch next to
    * [[hllRegisters]] (fixed 64 registers) and exact countDistinct —
    * KMV's niche is that the kept hashes are a uniform SAMPLE of the
    * distinct values, so the same k longs also answer set-overlap
    * questions (Jaccard of two sketches ≈ Jaccard of the kept-hash
    * sets), which registers cannot.
    *
    * Merge contract: minK(A ∪ B) = minK(minK(A) ∪ minK(B)) — the
    * union is deduplicated (hashes are value-deterministic, so the
    * same value never double-counts), making per-shard sketches,
    * incremental ingest, and cross-group rollups compose exactly.
    * Everything is exact integer arithmetic both engines replay.
    *
    * Scale shape: one distinct aggregation collapses data to distinct
    * (group, hash); the per-group top-k is a rank window over THAT
    * frame — sort-based, spillable, never wider than the distinct set.
    */
  def kmvMinHashes(df: DataFrame, groupCols: Seq[String],
      valueExpr: Column, k: Int = 64): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val gs = groupCols.map(col)
    val h = md5Long60(concat(lit("kmv#"), valueExpr.cast("string")))
    val dist = df.select((gs :+ h.as("h")): _*).distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(gs: _*).orderBy(col("h"))
    dist.withColumn("r", row_number().over(w).cast("long"))
      .filter(col("r") <= k)
      .select((gs :+ col("r") :+ col("h")): _*)
  }

  /** KMV estimate from a min-hash frame: with the full k kept,
    * (k−1)·2⁶⁰/h₍ₖ₎ (hashes are uniform on [0, 2⁶⁰)); with fewer than
    * k distinct hashes the sketch IS the distinct set and the count is
    * exact. One double division per group, rounded 6.
    */
  def kmvEstimate(minHashes: DataFrame, groupCols: Seq[String],
      k: Int = 64): DataFrame = {
    val gs = groupCols.map(col)
    minHashes.groupBy(gs: _*)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min_hash"))
      .select((gs :+ col("n_kept") :+ col("kth_min_hash") :+
        round(when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(lit((k - 1).toDouble) *
            lit(math.pow(2, 60)) / col("kth_min_hash").cast("double")), 6)
          .as("kmv_estimate")): _*)
  }

  /** KMV card shared by the batch query and its streaming twin: the
    * cross-group "ALL" sketch is merged FROM the per-group kept hashes
    * (dedupe + re-rank — the sketch-merge contract, no data re-scan),
    * estimates come from [[kmvEstimate]], and the exact distinct count
    * joins on for the measured relative error. `kept` must carry
    * (grp, r, h); `keyed` must carry (grp, k) for the exact side.
    */
  def kmvDistinctCard(kept: DataFrame, keyed: DataFrame,
      k: Int = 64): DataFrame = {
    // merged-ALL re-rank WITHOUT a global window: the input is the kept
    // hashes only (≤ k × n_groups rows by construction), so one bounded
    // collect_list aggregate sorts and slices the k smallest — no
    // single-partition WindowExec in the plan
    val allK = kept.select(col("h")).distinct()
      .agg(slice(sort_array(collect_list(col("h"))), 1, k).as("hs"))
      .select(posexplode(col("hs")).as(Seq("p", "h")))
      .select(lit("ALL").as("grp"), (col("p") + 1).cast("long").as("r"),
        col("h"))
    val est = kmvEstimate(
      kept.select(col("grp"), col("r"), col("h")).unionByName(allK),
      Seq("grp"), k)
    val exact = keyed
      .unionByName(keyed.withColumn("grp", lit("ALL")))
      .groupBy(col("grp")).agg(countDistinct(col("k")).as("n_exact"))
    est.join(exact, "grp")
      .withColumn("rel_err",
        round((col("kmv_estimate") - col("n_exact")) /
          col("n_exact").cast("double"), 6))
      .orderBy(col("grp"))
  }

  /** Capture–recapture population estimate (Lincoln–Petersen +
    * Chapman 1951): treat the first and second halves of the time range
    * as two capture occasions; units seen in both are the "marked
    * recaptures", and N̂ = n₁n₂/m (Chapman's (n₁+1)(n₂+1)/(m+1) − 1
    * with its closed-form SE is the small-m-safe version). The "how
    * big is the population we HAVEN'T fully seen" estimator — the
    * ecology twin of the distinct-count sketches (q162 HLL, q380 KMV),
    * except it extrapolates BEYOND the observed ids, which no hash
    * sketch can. The card includes the true distinct count, so the
    * closure-assumption error is measured, not assumed away.
    *
    * Exactness: capture flags and overlaps are exact integers off the
    * q113 half-split convention (2·t < min+max, no division); the
    * estimators are one fixed double shape. One scan for the range,
    * one per-unit aggregation, one 1-row reduction.
    */
  def captureRecapture(df: DataFrame, unitCol: String,
      tsCol: String): DataFrame = {
    val withT = df.filter(col(unitCol).isNotNull)
      .select(col(unitCol).as("u"), unix_micros(col(tsCol)).as("__t"))
    val rng = withT.agg(min(col("__t")).as("__mn"), max(col("__t")).as("__mx"))
    val flags = withT.crossJoin(broadcast(rng))
      .groupBy(col("u"))
      .agg(
        max(when(col("__t") * 2 < col("__mn") + col("__mx"), 1L)
          .otherwise(0L)).as("__a"),
        max(when(col("__t") * 2 >= col("__mn") + col("__mx"), 1L)
          .otherwise(0L)).as("__b"))
    val agg = flags.agg(
      sum(col("__a")).as("n1"), sum(col("__b")).as("n2"),
      sum(col("__a") * col("__b")).as("n_both"),
      count(lit(1)).as("n_true"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    val mD = col("n_both").cast("double")
    val chapman = (n1D + lit(1.0)) * (n2D + lit(1.0)) / (mD + lit(1.0)) -
      lit(1.0)
    val chapVar = (n1D + lit(1.0)) * (n2D + lit(1.0)) * (n1D - mD) *
      (n2D - mD) / ((mD + lit(1.0)) * (mD + lit(1.0)) * (mD + lit(2.0)))
    agg.select(
      col("n1"), col("n2"), col("n_both"), col("n_true"),
      when(col("n_both") > 0L, round(n1D * n2D / mD, 6))
        .as("lincoln_petersen"),
      round(chapman, 6).as("chapman_estimate"),
      round(sqrt(chapVar), 6).as("chapman_se"),
      round((chapman - col("n_true").cast("double")) /
        col("n_true").cast("double"), 6).as("rel_err_vs_true"))
  }

  /** Fully PORTABLE Bloom-filter bit positions for one key: `kHashes`
    * disjoint 7-hex-digit slices of ONE MD5 digest, each mod `mBits`,
    * deduplicated (two slices may collide into one bit — membership then
    * requires matching the DISTINCT positions, not `kHashes` of them).
    * Unlike the built-in `bloom_filter_agg` (q117 — whose serialized
    * format no other engine reads), every position here is exact integer
    * arithmetic any engine reproduces, so filter CONTENT and the
    * false-positive behavior are oracle-checkable.
    */
  def bloomPositions(key: Column, kHashes: Int, mBits: Int): Column = {
    require(kHashes >= 1 && kHashes * 7 <= 32,
      s"kHashes must be in [1,4] (7 hex digits per slice of one MD5), got $kHashes")
    require(mBits >= 2 && mBits <= (1 << 28),
      s"mBits must be in [2, 2^28], got $mBits")
    val digest = md5(key.cast("string"))
    array_distinct(array((0 until kHashes).map(d =>
      pmod(conv(substring(digest, 1 + 7 * d, 7), 16, 10).cast("long"),
        lit(mBits.toLong))): _*))
  }

  /** Bloom-filter build + probe with a measured false-positive card: the
    * filter is the DISTINCT bit-position set of the build keys (set union
    * is associative/commutative — per-shard filters OR together exactly,
    * the same mergeability contract as the CMS/HLL/quantile sketches);
    * a probe key passes iff ALL its distinct positions are set. The card
    * compares bloom passes against exact membership: false positives,
    * measured FP rate among true non-members, and the filter load
    * (n_bits_set / mBits governs the theoretical rate (load)^k).
    *
    * Scale shape: the filter is ≤ `mBits` rows — broadcast to the probe
    * side (this is how a 100 TB semi-join prunes its big side before the
    * shuffle, cf. q117); exact membership for the card is one equi-join
    * on the distinct key frames. No sort anywhere; one row out.
    */
  def bloomFpCard(build: DataFrame, buildKey: String,
      probe: DataFrame, probeKey: String,
      kHashes: Int = 3, mBits: Int = 4096): DataFrame = {
    val bKeys = build.select(col(buildKey).cast("string").as("k")).distinct()
    val bits = bKeys
      .select(explode(bloomPositions(col("k"), kHashes, mBits)).as("pos"))
      .distinct()
    bloomCardFromBits(bKeys, bits, probe, probeKey, kHashes, mBits)
  }

  /** Card finishing step given an already-built filter: `bits` is the
    * distinct bit-position frame (however produced — one batch pass, a
    * union of per-shard filters, or a streaming aggregation whose state IS
    * the filter); `bKeys` supplies the exact-membership ground truth the
    * card is audited against.
    */
  def bloomCardFromBits(bKeys: DataFrame, bits: DataFrame,
      probe: DataFrame, probeKey: String,
      kHashes: Int, mBits: Int): DataFrame = {
    val pKeys = probe.select(col(probeKey).cast("string").as("k")).distinct()
      .withColumn("__ps", bloomPositions(col("k"), kHashes, mBits))
    val hits = pKeys
      .select(col("k"), size(col("__ps")).as("__need"),
        explode(col("__ps")).as("pos"))
      .join(broadcast(bits.withColumn("__hit", lit(1L))), Seq("pos"), "left")
      .groupBy(col("k"), col("__need"))
      .agg(sum(coalesce(col("__hit"), lit(0L))).as("__got"))
      .withColumn("__pass",
        when(col("__got") === col("__need"), 1L).otherwise(0L))
    val card = hits
      .join(bKeys.withColumn("__member", lit(1L)), Seq("k"), "left")
      .agg(
        count(lit(1)).as("n_probe_keys"),
        sum(col("__pass")).as("n_bloom_pass"),
        sum(coalesce(col("__member"), lit(0L))).as("n_true_members"),
        sum(when(col("__pass") === 1L && col("__member").isNull, 1L)
          .otherwise(0L)).as("n_false_pos"),
        sum(when(col("__member").isNull, 1L).otherwise(0L))
          .as("__n_nonmembers"))
    val sizes = bKeys.agg(count(lit(1)).as("n_build_keys"))
      .crossJoin(broadcast(bits.agg(count(lit(1)).as("n_bits_set"))))
    card.crossJoin(broadcast(sizes))
      .withColumn("fp_rate",
        when(col("__n_nonmembers") > 0L,
          round(col("n_false_pos").cast("double") /
            col("__n_nonmembers").cast("double"), 6)))
      .withColumn("load",
        round(col("n_bits_set").cast("double") / lit(mBits.toDouble), 6))
      .select(col("n_build_keys"), col("n_bits_set"), col("load"),
        col("n_probe_keys"), col("n_bloom_pass"), col("n_true_members"),
        col("n_false_pos"), col("fp_rate"))
  }

  /** MERGEABLE log-bin quantile sketch, build phase: every value ≥ 1
    * lands in its (decimal-digit-count, two-leading-significant-digits)
    * bin — ≤ 90 bins per order of magnitude, counts are plain additive
    * integers, so per-shard sketches merge by summing (the CMS/HLL
    * mergeability contract, completed for quantiles). Relative rank-value
    * error is bounded by the bin width: ≤ 1/m ≤ 10% (two significant
    * digits).
    *
    * Determinism across engines is by construction: the digit count is
    * exact string length of the integer part, and the mantissa uses ONE
    * IEEE division by a power of ten — correctly rounded by the standard,
    * so identical on every engine (unlike ln-based log bins, where libm
    * ulp drift could flip a boundary).
    */
  def logBins(df: DataFrame, grpCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    df.filter(v >= 1.0)
      .withColumn("e", length(floor(v).cast("long").cast("string")))
      .withColumn("m",
        when(col("e") >= 2,
          floor(v / pow(lit(10.0), (col("e") - 2).cast("double"))))
        .otherwise(floor(v * 10)).cast("long"))
      .groupBy(col(grpCol), col("e"), col("m"))
      .agg(count(lit(1)).as("n"))
  }

  /** Quantile estimates from [[logBins]] counters: per group, the
    * cumulative count over (e, m)-ordered bins selects the first bin
    * whose cumsum reaches rank ⌈q·n⌉; the estimate is the bin's lower
    * bound m·10^(e−2). The window runs over the SKETCH (≤ 90·digits rows
    * per group), never the data — the finishing step of a 100 TB
    * quantile job is a few hundred rows per group regardless of input
    * size.
    */
  def quantilesFromBins(bins: DataFrame, grpCol: String,
      quantiles: Seq[Double]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(quantiles.nonEmpty && quantiles.forall(q => q > 0 && q <= 1),
      s"quantiles must be in (0, 1], got $quantiles")
    val spark = bins.sparkSession
    import spark.implicits._
    val cum = bins.withColumn("cum",
      sum(col("n")).over(Window.partitionBy(col(grpCol))
        .orderBy(col("e"), col("m"))))
    val ranks = bins.groupBy(col(grpCol)).agg(sum(col("n")).as("total"))
      .crossJoin(broadcast(quantiles.toDF("quantile")))
      .withColumn("rank",
        greatest(ceil(col("quantile") * col("total")), lit(1L)))
    val w = Window.partitionBy(col(grpCol), col("quantile"))
      .orderBy(col("e"), col("m"))
    cum.join(broadcast(ranks), grpCol)
      .filter(col("cum") >= col("rank"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(grpCol), col("quantile"), col("rank"),
        col("e").as("bin_e"), col("m").as("bin_m"),
        when(col("e") >= 2,
          col("m").cast("double") *
            pow(lit(10.0), (col("e") - 2).cast("double")))
          .otherwise(col("m").cast("double") / 10.0).as("est"))
  }

  /** Per-(row, bucket) AMS/count-sketch counters (Alon, Matias & Szegedy
    * 1996; the bucketed "fast AMS" of Charikar et al.): each occurrence
    * of a key adds its ±1 sign to one of `width` buckets in each of
    * `rows` independent sketch rows. Row r reads its own disjoint
    * 7-hex-digit slice of ONE MD5 digest (the [[bucketPairs]] trick):
    * low bits → bucket, next bit → sign. Counters are exact BIGINT sums
    * — ADDITIVE (mergeable across partitions/days/micro-batches), the
    * F2 second-moment primitive: join-size / self-join-size estimation
    * in fixed memory where the exact key dictionary doesn't fit.
    */
  def amsCounters(df: DataFrame, keyExpr: Column, rows: Int = 3,
      width: Int = 64): DataFrame = {
    require(rows >= 1 && rows * 7 <= 32,
      s"rows must be in [1,4] (7 hex digits per slice of one MD5), got $rows")
    require(width >= 2 && (width & (width - 1)) == 0 && width * 2 <= (1 << 28),
      s"width must be a power of two below 2^27, got $width")
    val log2w = Integer.numberOfTrailingZeros(width)
    val digest = md5(keyExpr.cast("string"))
    val pairs = array((0 until rows).map { d =>
      val slice = conv(substring(digest, 1 + 7 * d, 7), 16, 10).cast("long")
      struct(lit(d).as("r"),
        pmod(slice, lit(width.toLong)).as("b"),
        // sign = the bit just above the bucket bits (slice // width) % 2
        when(pmod(shiftright(slice, log2w), lit(2L)) === 0L, lit(1L))
          .otherwise(lit(-1L)).as("s"))
    }: _*)
    df.select(explode(pairs).as("p"))
      .select(col("p.r").as("r"), col("p.b").as("b"), col("p.s").as("s"))
      .groupBy(col("r"), col("b"))
      .agg(sum(col("s")).as("c"))
  }

  /** Finish the AMS card: per-row F2 estimates Σ_b c², the median row
    * (the variance-killing step — rows are independent), the exact F2
    * for the audit column, and the relative error. `exact` is a 1-row
    * frame with `f2_exact` (BIGINT).
    */
  def amsF2Card(counters: DataFrame, exact: DataFrame): DataFrame = {
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val perRow = counters.groupBy(col("r"))
      .agg(sum(dec(col("c")) * dec(col("c"))).cast("long").as("est"))
    val nRows = perRow.agg(count(lit(1)).as("__nr"))
    val wMed = org.apache.spark.sql.expressions.Window
      .orderBy(col("est"), col("r"))
    val med = perRow.withColumn("__rk", row_number().over(wMed))
      .crossJoin(broadcast(nRows))
      .filter(col("__rk").cast("long") ===
        floor((col("__nr") + 1L) / 2.0).cast("long"))
      .select(col("est").as("median_est"))
    perRow.crossJoin(broadcast(med)).crossJoin(broadcast(exact))
      .select(col("r"), col("est"), col("median_est"), col("f2_exact"),
        round((col("median_est") - col("f2_exact")).cast("double") /
          col("f2_exact").cast("double"), 6).as("rel_err"))
      .orderBy(col("r"))
  }
}
