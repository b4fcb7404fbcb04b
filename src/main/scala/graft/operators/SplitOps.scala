package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe deterministic group splits (reference M2: `split_by_hive`,
  * 70/15/15 by hive ID with a fixed seed —
  * `/root/reference/src/data/preprocessing.py:532-567`).
  *
  * The reference shuffles the collected unique IDs with sklearn; that exact
  * permutation is not portable, so the engine's contract is the one the
  * reference actually relies on: fixed ratios, determinism, and
  * group-exclusivity (every group lands in exactly one split). A multiplica-
  * tive integer hash of the group key drives bucket assignment — computable
  * identically on any engine, any partitioning, any scale, with no driver
  * collect.
  */
object SplitOps {

  /** Knuth-style multiplicative bucket in [0, buckets) for an integral key.
    * The key is first reduced mod a prime so the product stays below 2⁶³ —
    * no ANSI long overflow for any input key, and bit-identical to the
    * plain multiply for keys under the prime (engine-portable SQL:
    * `((key % 1000003) * 2654435761) % buckets`).
    *
    * CONTRACT: this is a SPLITTER, not an inference-grade randomizer. A
    * single multiplicative round mod `buckets` keys the low bits of the
    * product, so for buckets sharing factors with 2 (2, 8, 1000…) the
    * assignment over a small key range is a function of the key's low
    * bits (buckets=2 ≡ key parity). Deterministic splits and fold
    * assignment are exactly what that is fine for; anything that needs
    * the DRAWS to look independent across salts (permutation tests,
    * sampling priorities) must use the two-round draw
    * ([[prioritySample]]'s family) whose intermediate odd-prime
    * reductions mix the low bit — the q218 relabeling does this.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    pmod(pmod(key.cast("long"), lit(1000003L)) * lit(2654435761L),
      lit(buckets.toLong))

  /** Split label from per-mille bucket thresholds: [0,train) → "train",
    * [train, train+val) → "val", rest → "test".
    */
  def splitLabel(key: Column, trainPerMille: Int, valPerMille: Int): Column = {
    val b = hashBucket(key, 1000)
    when(b < trainPerMille, "train")
      .when(b < trainPerMille + valPerMille, "val")
      .otherwise("test")
  }

  /** Tag every row with its group's split; rows of one group always share a
    * split (leakage prevention).
    */
  def withSplit(df: DataFrame, groupKey: String, trainPerMille: Int = 700,
      valPerMille: Int = 150): DataFrame =
    df.withColumn("split", splitLabel(col(groupKey), trainPerMille, valPerMille))

  /** K-fold assignment by group key — used for out-of-fold CV (reference M8,
    * `/root/reference/scripts/train_ensemble.py:150-158`).
    */
  def withFold(df: DataFrame, groupKey: String, k: Int): DataFrame =
    df.withColumn("fold", hashBucket(col(groupKey), k))

  /** Greedy contiguous sequence packing: assign documents to fixed
    * token-budget packs (the training-batch assembly step — ~8k-token packed
    * sequences). A document lands in the pack where its PRIOR cumulative
    * token count (exclusive prefix sum) crosses into: contiguous,
    * deterministic, one window pass.
    *
    * Scale posture: the running sum partitions by `partitionCol` (source,
    * shard, date — any bounded-cardinality stream key), so no global
    * ordering exists anywhere; each partition packs independently, exactly
    * how a sharded corpus is packed in practice. Packing quality depends on
    * document order within the partition — `orderCol` asc is reproducible;
    * sorting by length descending would pack tighter but bias batch
    * composition.
    */
  def packSequences(df: DataFrame, orderCol: String, partitionCol: String,
      nTokensCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(partitionCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__prior",
        coalesce(sum(col(nTokensCol)).over(w), lit(0L)))
      .withColumn("pack_id", floor(col("__prior") / lit(budget.toDouble)))
      .drop("__prior")
  }

  /** Corpus composition under a TOKEN budget: keep each stratum's documents
    * in `orderCol` order until the stratum's cumulative token count exceeds
    * `budget` — how a training mix caps a source by tokens rather than by
    * document count ([[stratifiedSample]]'s rate-based sibling). One
    * per-stratum window over an exact BIGINT running sum; deterministic,
    * referentially ordered, and a single shuffle on the stratum key.
    */
  def takeUntilTokenBudget(df: DataFrame, orderCol: String,
      stratumCol: String, nTokensCol: String, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(nTokensCol)).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }

  /** Deterministic stratified sampling: keep a row iff its id's hash bucket
    * falls below its stratum's per-mille rate — the corpus source-mixing
    * primitive of a training-data pipeline (downweight a crawl source, keep
    * curated sources whole). Same engine-portable multiplicative hash as
    * the splits: per-row, shuffle-free, reproducible under any partitioning
    * at any scale, and REFERENTIALLY stable — a document keeps or loses its
    * place independent of what else is in the corpus, so incremental
    * ingests sample consistently.
    */
  /** Deterministic weighted sampling without replacement (exponential-race
    * priority sampling, Efraimidis & Spirakis): each row draws a
    * pseudo-uniform u from its id hash and races with clock
    * −ln(u)/weight; the k smallest clocks win. Inclusion odds scale with
    * weight, the draw is a pure function of (id, salt) — reproducible
    * across runs, engines and partitionings, with NO RNG state — and the
    * selection is one top-k (TakeOrdered, never a global sort). This is
    * the corpus-curation sampler: upweight high-quality sources, keep the
    * pipeline replayable.
    */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int, salt: Long = 0L): DataFrame = {
    // u ∈ (0, 1]: a TWO-ROUND Lehmer-style congruential draw from the same
    // engine-portable multiplicative hash family as [[hashBucket]] (NOT
    // xxhash64 — no other engine reproduces that), replayable in plain SQL:
    //   x1 = (((id + salt) % p1) * 2654435761) % p1        p1 = 1000003
    //   x2 = (((x1 + id div p1) % p2) * 22695477) % p2     p2 = 9999991
    //   u  = (x2 + 1) / p2
    // Reducing mod a PRIME (not a power of two larger than the product)
    // is what makes consecutive ids wrap ~427799/p of the range apart —
    // a power-of-two modulus above id*C never wraps for small ids and
    // degenerates into "sample the largest ids". The second round folds
    // `id div p1` back in: a single round collapses to id mod p1, so any
    // two ids differing by p1 would share one draw (at ≥10⁸-doc corpus
    // scale ~100 rows per residue class), and widens the draw space from
    // ~10⁶ to ~10⁷ distinct values. All intermediates stay below 2⁶³:
    // (p1−1)·2654435761 and (p2−1)·22695477 both fit a signed long.
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    // exact integer division (decimal, not double — a double quotient can
    // floor one off for ids above 2⁵³); DuckDB replays it as `id // p1`
    // (ids are non-negative by contract — truncation ≡ floor there)
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(salt), lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val u = (x2 + 1).cast("double") / lit(p2.toDouble)
    // Non-positive weights get an infinite clock (rank last, never crash):
    // an unguarded divide throws under ANSI on weight = 0, and under
    // non-ANSI a NULL clock would sort FIRST ascending — preferentially
    // selecting exactly the rows the weight says to avoid.
    val w = col(weightCol).cast("double")
    df.withColumn("__clock",
        when(w > 0d, -log(u) / w).otherwise(lit(Double.PositiveInfinity)))
      .orderBy(col("__clock"), col(idCol))
      .limit(k)
      .drop("__clock")
  }

  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      ratesPerMille: Map[String, Int],
      defaultPerMille: Int = 1000): DataFrame = {
    val threshold = ratesPerMille.foldLeft(lit(defaultPerMille): Column) {
      case (acc, (s, r)) => when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol), 1000) < threshold)
  }

  /** EXACT-allocation stratified sampling: stratum s yields exactly
    * ⌈n_s·num/den⌉ rows — the rows with the stratum's smallest
    * congruential draws ([[prioritySample]]'s engine-portable two-round
    * family), ties on the draw broken by smallest key. Equivalent to
    * "rank by (draw, key) within stratum, keep rank ≤ target", but
    * SORT-FREE at any size: per-stratum rank thresholds come from a
    * SIMULTANEOUS binary search over the draw domain — ONE
    * conditional-count scan per step covers ALL strata (~24 steps for the
    * 10⁷ draw space), then one tiny pass ranks only threshold-tied rows.
    * A per-stratum sort would shuffle the full table; this never does.
    *
    * Strata cardinality is bounded by contract (the thresholds live in a
    * driver map, the [[graft.operators.RobustStats.kthSmallestByCounting]]
    * convention); keys must be unique per row and non-negative.
    * Returns (stratum, key, draw) for the sampled rows.
    *
    * Per-stratum search constants reach the rows two ways, SAME results:
    * up to `literalStrataMax` strata they fold into a literal `when`
    * chain (fewest plan nodes, fully codegen'd); above it each probe's
    * constants ship as a broadcast-joined bounds frame instead — a
    * literal fold over thousands of strata would blow codegen's 64 KB
    * method limit into interpreted fallback and bloat every task's plan,
    * while a broadcast hash join of a |strata|-row frame stays flat.
    */
  /** Epoch shard manifest — the reproducible-data-order contract of a
    * training run: every document draws its epoch-specific clock from
    * the two-round congruential generator (salt = epoch, so each epoch
    * is a DIFFERENT deterministic permutation), shards by clock, and
    * orders within the shard by (clock, id). The manifest fingerprints
    * the ORDER itself — a position-weighted 60-bit hash sum, exact
    * decimal accumulation — so two runs (or two engines) claiming "the
    * same data order" can be hash-compared, not trusted.
    *
    * Scale shape: one shuffle on the shard id; the within-shard
    * position is a bounded window sort per shard (shards are sized to
    * fit a worker by choosing nShards); the manifest is nShards rows.
    */
  def epochShardManifest(df: DataFrame, idCol: String, tokenCount: Column,
      nShards: Int, epoch: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards >= 1, "nShards must be positive")
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(epoch), lit(p1)) * lit(2654435761L),
      lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val docHash = conv(substring(md5(id.cast("string")), 1, 15), 16, 10)
      .cast("long") % lit(1000000007L)
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("__clock"), col("__id"))
    df.select(id.as("__id"), tokenCount.cast("long").as("__tok"),
        x2.as("__clock"), pmod(x2, lit(nShards.toLong)).as("shard"),
        docHash.as("__h"))
      .withColumn("__pos", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__tok")).as("n_tokens"),
        sum((col("__pos") * col("__h")).cast("decimal(38,0)"))
          .cast("string").as("order_fp"))
      .withColumn("epoch", lit(epoch))
      .select(col("epoch"), col("shard"), col("n_docs"), col("n_tokens"),
        col("order_fp"))
      .orderBy(col("shard"))
  }

  /** Exact-integer water-filling token allocation: split a GLOBAL token
    * budget (num/den of the corpus total) across sources so every
    * source gets an equal level λ except those with less than λ
    * available, which saturate — the classic max-min fair allocation a
    * mixture designer uses when no source may dominate and small
    * sources must not be starved (q109 is the fixed-per-source-budget
    * sibling; this one solves for the level). All arithmetic is exact
    * BIGINT: the saturation point is found in closed form on the
    * avail-sorted prefix sums (no iteration), and the division
    * remainder goes one token each to the first `rem` unsaturated
    * sources in sorted order — Σ alloc ≡ min(budget, total) EXACTLY.
    *
    * Scale shape: the per-source avail frame is the model (|sources|
    * rows — bounded); the corpus-wide work is ONE token-count
    * aggregation. Windows run over the tiny model frame only.
    */
  def tokenBudgetWaterfill(df: DataFrame, srcCol: String,
      tokenCount: Column, budgetNum: Long, budgetDen: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(budgetNum >= 0 && budgetDen >= 1, "need num >= 0, den >= 1")
    val avail = df.groupBy(col(srcCol).as("source"))
      .agg(sum(tokenCount.cast("long")).as("avail_tokens"))
    val wAll = Window.partitionBy(lit(1))
    val wSort = Window.partitionBy(lit(1))
      .orderBy(col("avail_tokens"), col("source"))
    // exact floor division: long `/` in Spark is DOUBLE division, which
    // rounds past 2^53 — decimal(38,0) keeps total*num and the quotient
    // exact at any token scale (numerator − pmod is exactly divisible,
    // so the truncating cast IS the floor quotient)
    val totNum = col("__total").cast("decimal(38,0)") * lit(budgetNum)
    val s = avail
      .withColumn("__total", sum(col("avail_tokens")).over(wAll))
      .withColumn("__budget",
        ((totNum - pmod(totNum, lit(budgetDen))) / lit(budgetDen))
          .cast("long"))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__pos", row_number().over(wSort).cast("long"))
      .withColumn("__prefix", sum(col("avail_tokens")).over(
        wSort.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__prevAvail",
        coalesce(lag(col("avail_tokens"), 1).over(wSort), lit(0L)))
    val m = col("__n") - col("__pos") + lit(1L)
    val x = col("__budget") - (col("__prefix") - col("avail_tokens"))
    val level = when(x >= 0L,
        ((x - pmod(x, m)).cast("decimal(38,0)") / m).cast("long"))
      .otherwise(lit(-1L)).cast("long")
    val rem = when(x >= 0L, pmod(x, m)).otherwise(lit(0L))
    val g = s.withColumn("__level", level).withColumn("__rem", rem)
      .withColumn("__valid",
        col("__budget") < col("__total") &&
        col("__prevAvail") <= col("__level") &&
        col("__level") < col("avail_tokens"))
    val pick = g.filter(col("__valid"))
      .select(col("__pos").as("__ppos"), col("__level").as("__plevel"),
        col("__rem").as("__prem"))
      .orderBy(col("__ppos")).limit(1)
    g.crossJoin(broadcast(pick.unionByName(
        // budget >= total: sentinel pick saturating every source
        g.sparkSession.range(1).select(lit(Long.MaxValue).as("__ppos"),
          lit(Long.MaxValue).as("__plevel"), lit(0L).as("__prem")),
        allowMissingColumns = false).orderBy(col("__ppos")).limit(1)))
      .withColumn("alloc_tokens",
        when(col("__pos") < col("__ppos"), col("avail_tokens"))
          .otherwise(col("__plevel") +
            when(col("__pos") - col("__ppos") < col("__prem"), 1L)
              .otherwise(0L)))
      .withColumn("saturated",
        when(col("alloc_tokens") === col("avail_tokens"), 1L)
          .otherwise(0L))
      .select(col("source"), col("avail_tokens"), col("alloc_tokens"),
        col("saturated"), col("__budget").as("budget_tokens"))
      .orderBy(col("source"))
  }

  /** Token-balanced shard plan: documents assigned to output shards by
    * their GLOBAL token offset (shard = ⌊startOffset/shardTokens⌋, docs
    * never split) — the byte/token-budgeted sibling of the count-based
    * [[epochShardManifest]], i.e. the write plan that keeps every
    * training shard near the same token mass no matter how skewed the
    * per-doc lengths are. One row per shard: docs, tokens, and the
    * deviation from the target.
    *
    * Scale shape: the global offset is the [[packingCard]] two-level
    * prefix sum (per-bucket totals broadcast, wide window PER BUCKET);
    * the shard aggregation keys on shard id. Exact decimal floor
    * divisions throughout.
    */
  def tokenShardPlan(docs: DataFrame, idCol: String, textCol: String,
      shardTokens: Long, bucketWidth: Int = 1000): DataFrame = {
    require(shardTokens >= 1 && bucketWidth >= 1,
      "need shardTokens >= 1 and bucketWidth >= 1")
    import org.apache.spark.sql.expressions.Window
    def fdiv(x: Column, m: Column): Column =
      ((x - pmod(x, m)).cast("decimal(38,0)") / m).cast("long")
    val perDoc = docs.select(col(idCol).as("__id"),
        size(split(trim(col(textCol)), " ")).cast("long").as("__tok"))
      .withColumn("__bkt", fdiv(col("__id"), lit(bucketWidth.toLong)))
    val wB = Window.partitionBy(lit(1)).orderBy(col("__bkt"))
    val offsets = perDoc.groupBy(col("__bkt"))
      .agg(sum(col("__tok")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(
        wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val wD = Window.partitionBy(col("__bkt")).orderBy(col("__id"))
    perDoc.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__start", col("__off") + sum(col("__tok")).over(
        wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
        col("__tok"))
      .withColumn("shard", fdiv(col("__start"), lit(shardTokens)))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"))
      .withColumn("target_tokens", lit(shardTokens))
      .withColumn("deviation_frac", round(
        (col("n_tokens") - lit(shardTokens)).cast("double") /
          lit(shardTokens.toDouble), 6))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("target_tokens"), col("deviation_frac"))
      .orderBy(col("shard"))
  }

  def stratifiedExactSample(df: DataFrame, stratumCol: String,
      keyCol: String, num: Int, den: Int, salt: Long = 0L,
      literalStrataMax: Int = 100): DataFrame = {
    require(num >= 1 && den >= num,
      s"need 1 <= num <= den, got num=$num den=$den")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    import spark.implicits._
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(keyCol).cast("long")
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(salt), lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val d = df.select(col(stratumCol).cast("string").as("__s"),
      id.as("__k"), x2.as("__d")).persist()
    try {
      val targets = d.groupBy(col("__s")).agg(count(lit(1)).as("__n"))
        .collect()
        .map(r => r.getString(0) ->
          (r.getLong(1) * num + den - 1) / den)
        .toMap
      val useLiteral = targets.size <= literalStrataMax
      def chain(m: Map[String, Long]): Column =
        m.foldLeft(lit(Long.MaxValue)) { case (acc, (s, v)) =>
          when(col("__s") === s, lit(v)).otherwise(acc)
        }
      // attach one per-stratum constant as column `cName`: literal chain
      // below the strata threshold, broadcast-joined frame above it
      def withVal(base: DataFrame, m: Map[String, Long],
          cName: String): DataFrame =
        if (useLiteral) base.withColumn(cName, chain(m))
        else base.join(broadcast(m.toSeq.toDF("__s", cName)), "__s")
      // simultaneous 8-ary search for the target-th smallest draw per
      // stratum: every step is ONE scan counting SEVEN per-stratum
      // midpoints (7 conditional-sum aggregates fused in the pass), so
      // each stratum's range shrinks 8× per scan — ~log₈(10⁷) ≈ 8 scans
      var lo = targets.map { case (s, _) => s -> 0L }
      var hi = targets.map { case (s, _) => s -> (p2 - 1) }
      while (lo.exists { case (s, l) => l < hi(s) }) {
        val mids: Map[String, IndexedSeq[Long]] = targets.keys.map { s =>
          val w = hi(s) - lo(s)
          s -> (1 to 7).map(i => lo(s) + Math.floorDiv(w * i, 8))
            .distinct.filter(m => m >= lo(s) && m < hi(s))
        }.toMap
        // probe j uses each stratum's j-th midpoint (clamped to its last —
        // a duplicate probe costs nothing and keeps the agg shape fixed)
        def midAt(s: String, j: Int): Long = {
          val ms = mids(s)
          if (ms.isEmpty) Long.MaxValue else ms(math.min(j, ms.length - 1))
        }
        val probed =
          if (useLiteral) {
            def midChain(j: Int): Column =
              mids.keys.foldLeft(lit(Long.MaxValue)) { case (acc, s) =>
                when(col("__s") === s, lit(midAt(s, j))).otherwise(acc)
              }
            (0 until 7).foldLeft(d) { case (acc, j) =>
              acc.withColumn(s"__m$j", midChain(j))
            }
          } else {
            val mf = targets.keys.toSeq
              .map(s => (s, midAt(s, 0), midAt(s, 1), midAt(s, 2),
                midAt(s, 3), midAt(s, 4), midAt(s, 5), midAt(s, 6)))
              .toDF("__s", "__m0", "__m1", "__m2", "__m3", "__m4",
                "__m5", "__m6")
            d.join(broadcast(mf), "__s")
          }
        val aggs = (0 until 7).map(j =>
          sum(when(col("__d") <= col(s"__m$j"), 1L).otherwise(0L))
            .as(s"__c$j"))
        val cnt = probed.groupBy(col("__s")).agg(aggs.head, aggs.tail: _*)
          .collect()
          .map(r => r.getString(0) ->
            (0 until 7).map(j => r.getLong(1 + j)))
          .toMap
        val (nlo, nhi) = targets.keys.map { s =>
          if (lo(s) >= hi(s) || mids(s).isEmpty) (s -> lo(s), s -> hi(s))
          else {
            val ms = mids(s)
            val cs = ms.indices.map(j => cnt(s)(math.min(j, 6)))
            ms.zip(cs).find { case (_, c) => c >= targets(s) } match {
              case Some((m, _)) =>
                val idx = ms.indexOf(m)
                (s -> (if (idx > 0) ms(idx - 1) + 1 else lo(s)), s -> m)
              case None => (s -> (ms.last + 1), s -> hi(s))
            }
          }
        }.toList.unzip
        lo = nlo.toMap; hi = nhi.toMap
      }
      val thr = lo
      val below = withVal(d, thr, "__thr")
        .filter(col("__d") < col("__thr"))
        .select(col("__s"), col("__k"), col("__d"))
      val nBelow = below.groupBy(col("__s")).agg(count(lit(1)).as("__c"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val extra = targets.map { case (s, t) =>
        s -> (t - nBelow.getOrElse(s, 0L))
      }
      // only threshold-tied rows get ranked — a frame of ≤ ties per
      // stratum, never the data
      val tied = withVal(
          withVal(d, thr, "__thr").filter(col("__d") === col("__thr")),
          extra, "__extra")
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("__s")).orderBy(col("__k"))).cast("long"))
        .filter(col("__rn") <= col("__extra"))
        .select(col("__s"), col("__k"), col("__d"))
      below.unionByName(tied)
        .select(col("__s").as(stratumCol), col("__k").as(keyCol),
          col("__d").as("draw"))
        .orderBy(col(stratumCol), col("draw"), col(keyCol))
    } finally { d.unpersist(); () }
  }

  /** Deterministic negative sampling for contrastive training: each
    * anchor id draws `k` pseudo-random negatives from a DENSE id space
    * [0, n) via the engine-portable two-round congruential draw (the
    * [[prioritySample]] family) — reproducible across runs, engines and
    * partitionings, with no RNG state and no candidate shuffle (the
    * draw is a pure per-row projection; pairing with payloads is then
    * one equi-join on the dense id). A draw that lands on the anchor
    * itself shifts deterministically by one (mod n), so anchors never
    * pair with themselves and both engines agree on the shift.
    *
    * `n` is the dense-id-space size — the caller's contract (ids 0..n−1
    * with no holes), same as any embedding-table negative sampler.
    */
  def negativeSamples(df: DataFrame, idCol: String, n: Long,
      k: Int, salt: Long = 0L): DataFrame = {
    require(n >= 2, "need at least 2 ids to draw negatives")
    require(k >= 1, "k must be >= 1")
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    val anchors = df.select(id.as(idCol))
      .withColumn("neg_rank", explode(sequence(lit(1), lit(k))))
    val seed = id + col("neg_rank").cast("long") * lit(7919L) + lit(salt)
    val x1 = pmod(pmod(seed, lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + (seed.cast("decimal(38,0)") / lit(p1))
        .cast("long"), lit(p2)) * lit(22695477L), lit(p2))
    val draw = pmod(x2, lit(n))
    anchors.withColumn("neg_id",
      when(draw === id, pmod(draw + 1L, lit(n))).otherwise(draw))
  }

  /** Temperature-scaled corpus mixture weights — the data-mixture card of
    * a pre-training run: source s gets sampling weight
    * wₛ = nₛ^τ / Σₜ nₜ^τ over its token mass, flattening the natural
    * distribution toward uniform as τ → 0 (the multilingual-sampling
    * temperature trick). Also reports each source's epochs at a token
    * budget (budget·wₛ / nₛ — how many passes over a small source the
    * mixture implies, the overfit-risk column reviewers read first).
    *
    * Portability: n^τ is exp(τ·ln n) explicitly on both engines; the
    * denominator sums the ROUNDED powers through exact decimals so it is
    * addition-order-free. One aggregation over the per-source frame
    * (sources are few by construction — the frame is broadcast-sized).
    */
  def mixtureWeights(df: DataFrame, sourceCol: String, tokenCol: String,
      temperature: Double, tokenBudget: Long): DataFrame = {
    require(temperature > 0 && temperature <= 1,
      s"temperature must be in (0,1], got $temperature")
    val perSource = df.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("n_tokens"))
    val powT = round(
      exp(lit(temperature) * log(col("n_tokens").cast("double"))), 6)
    val totals = perSource
      .agg(sum(col("n_tokens")).as("__tot"),
        sum(powT.cast("decimal(28,6)")).as("__tot_pow"))
    perSource.crossJoin(broadcast(totals))
      .select(col(sourceCol), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("__tot").cast("double"), 6).as("p_raw"),
        round(powT / col("__tot_pow").cast("double"), 6).as("mix_weight"),
        round(lit(tokenBudget.toDouble) *
          (powT / col("__tot_pow").cast("double")) /
          col("n_tokens").cast("double"), 6).as("epochs_at_budget"))
  }

  /** Sequence-packing card: documents concatenated in id order and cut
    * into fixed `contextLen`-token training contexts (the standard
    * concat-and-split packing of LM pretraining). The card reports what
    * that packing does to the corpus — how many contexts, how many
    * documents get split across a context boundary, total fragment
    * count, and the tail padding waste — the numbers that decide
    * context length and whether boundary-respecting packing is worth
    * its cost.
    *
    * Scale shape: a GLOBAL running token offset is a prefix sum, and a
    * naive `Window.orderBy(id)` moves the corpus to one partition. This
    * computes it two-level: per-bucket token totals (a bounded frame —
    * pick `bucketWidth` so corpus/bucketWidth stays broadcast-sized)
    * carry the global offsets; the wide window then runs PER BUCKET.
    * Floor divisions use exact decimal arithmetic (long `/` is double
    * division and rounds past 2^53 — a real token count at corpus
    * scale).
    */
  def packingCard(docs: DataFrame, idCol: String, textCol: String,
      contextLen: Int = 512, bucketWidth: Int = 1000): DataFrame =
    packingCardFinish(
      packingCardPartial(docs, idCol, textCol, contextLen, bucketWidth,
        globalOffset = 0L),
      contextLen)

  /** The additive partial sums behind [[packingCard]]: fragment counts
    * computed with every start shifted by `globalOffset` — the hook the
    * streaming twin uses to fold id-range ingest waves into the exact
    * batch card (each wave's offset is the frozen sum of earlier wave
    * totals; all four outputs are additive across waves).
    */
  def packingCardPartial(docs: DataFrame, idCol: String, textCol: String,
      contextLen: Int, bucketWidth: Int, globalOffset: Long): DataFrame = {
    require(contextLen >= 1 && bucketWidth >= 1 && globalOffset >= 0,
      "need contextLen >= 1, bucketWidth >= 1, globalOffset >= 0")
    import org.apache.spark.sql.expressions.Window
    def fdiv(x: Column, m: Column): Column =
      ((x - pmod(x, m)).cast("decimal(38,0)") / m).cast("long")
    val L = lit(contextLen.toLong)
    val perDoc = docs.select(col(idCol).as("__id"),
        size(split(trim(col(textCol)), " ")).cast("long").as("__tok"))
      .withColumn("__bkt", fdiv(col("__id"), lit(bucketWidth.toLong)))
    val wB = Window.partitionBy(lit(1)).orderBy(col("__bkt"))
    val offsets = perDoc.groupBy(col("__bkt"))
      .agg(sum(col("__tok")).as("__bsum"))
      .withColumn("__off", coalesce(sum(col("__bsum")).over(
        wB.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val wD = Window.partitionBy(col("__bkt")).orderBy(col("__id"))
    val cum = perDoc.join(broadcast(offsets), Seq("__bkt"))
      .withColumn("__cumEnd", lit(globalOffset) + col("__off") +
        sum(col("__tok")).over(
          wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // a doc spanning tokens (cumPrev, cumEnd] occupies contexts
      // floor(cumPrev/L) .. floor((cumEnd-1)/L) — fragment count is the
      // context-index span + 1
      .withColumn("__frag", when(col("__tok") > 0L,
        fdiv(col("__cumEnd") - 1L, L) -
          fdiv(col("__cumEnd") - col("__tok"), L) + 1L).otherwise(0L))
    cum.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__tok")).as("total_tokens"),
      sum(when(col("__frag") >= 2L, 1L).otherwise(0L))
        .as("n_docs_split"),
      sum(col("__frag")).as("n_fragments"))
  }

  /** Finishing for [[packingCard]]: sum the (additive) partials and
    * derive the context count and tail waste from the exact totals.
    */
  def packingCardFinish(partials: DataFrame, contextLen: Int): DataFrame = {
    def fdiv(x: Column, m: Column): Column =
      ((x - pmod(x, m)).cast("decimal(38,0)") / m).cast("long")
    val L = lit(contextLen.toLong)
    partials.agg(
        sum(col("n_docs")).as("n_docs"),
        sum(col("total_tokens")).as("total_tokens"),
        sum(col("n_docs_split")).as("n_docs_split"),
        sum(col("n_fragments")).as("n_fragments"))
      .withColumn("context_len", L)
      .withColumn("n_contexts",
        fdiv(col("total_tokens") + L - 1L, L))
      .withColumn("tail_waste_tokens",
        col("n_contexts") * L - col("total_tokens"))
      .withColumn("split_frac", round(
        col("n_docs_split").cast("double") / col("n_docs").cast("double"),
        6))
      .select(col("n_docs"), col("total_tokens"), col("context_len"),
        col("n_contexts"), col("n_docs_split"), col("n_fragments"),
        col("tail_waste_tokens"), col("split_frac"))
  }

  /** Shard-resize movement card: when a cluster grows `nFrom` → `nTo`
    * shards, what fraction of keys actually move — measured for
    * rendezvous (highest-random-weight, Thaler & Ravishankar 1996)
    * hashing against naive `key mod n`. HRW's contract is that ONLY
    * keys whose new-shard draw wins move (≈ 1/nTo), while mod hashing
    * reshuffles almost everything — the difference IS the cost of a
    * resize on a bucketed 100 TB layout, and this card puts a number
    * on it for the actual key population.
    *
    * Portability: per-(key, shard) weights are the engine-portable
    * two-round congruential draw (q218's salted family); the per-key
    * argmax is MAX over the packed value h·64 + shard (ties — h
    * collisions across shards — break toward the higher shard id,
    * identically everywhere).
    *
    * Scale shape: one nTo-row broadcast cross join over the distinct
    * keys, one keyed MAX aggregation (map-side combinable), one count —
    * no window, no sort.
    */
  def hrwShardMovementCard(df: DataFrame, keyCol: String,
      nFrom: Int = 16, nTo: Int = 17): DataFrame = {
    require(nFrom >= 1 && nTo > nFrom && nTo <= 63,
      "need 1 <= nFrom < nTo <= 63 (packing headroom)")
    val p1 = 1000003L
    val p2 = 9999991L
    val keys = df.select(col(keyCol).cast("long").as("k")).distinct()
    val shards = keys.sparkSession.range(0, nTo).select(col("id").as("b"))
    val s = col("k") + col("b") * lit(104729L)
    val sDiv = (s.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(s, lit(p1)) * lit(2654435761L), lit(p1))
    val h = pmod(pmod(x1 + sDiv, lit(p2)) * lit(22695477L), lit(p2))
    val assigned = keys.crossJoin(broadcast(shards))
      .withColumn("__pk", h * lit(64L) + col("b"))
      .groupBy(col("k"))
      .agg(
        max(when(col("b") < nFrom, col("__pk"))).as("__pkFrom"),
        max(col("__pk")).as("__pkTo"))
      .select(col("k"),
        pmod(col("__pkFrom"), lit(64L)).as("hrw_from"),
        pmod(col("__pkTo"), lit(64L)).as("hrw_to"),
        pmod(col("k"), lit(nFrom.toLong)).as("mod_from"),
        pmod(col("k"), lit(nTo.toLong)).as("mod_to"))
    assigned.agg(
        count(lit(1)).as("n_keys"),
        sum(when(col("hrw_from") =!= col("hrw_to"), 1L).otherwise(0L))
          .as("n_moved_hrw"),
        sum(when(col("mod_from") =!= col("mod_to"), 1L).otherwise(0L))
          .as("n_moved_mod"))
      .select(col("n_keys"), col("n_moved_hrw"),
        round(col("n_moved_hrw").cast("double") /
          col("n_keys").cast("double"), 6).as("frac_moved_hrw"),
        round(lit(1.0) / lit(nTo.toDouble), 6).as("expected_hrw"),
        col("n_moved_mod"),
        round(col("n_moved_mod").cast("double") /
          col("n_keys").cast("double"), 6).as("frac_moved_mod"))
  }
}
