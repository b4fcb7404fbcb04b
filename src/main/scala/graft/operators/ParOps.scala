package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter,
  Generate, LeafNode, LocalLimit, LogicalPlan, Project, Sample}

/** Parallelism repair ahead of row-EXPANDING stages (optimization guide
  * §2.2/§8: shuffle the small pre-expansion rows, run the expansion wide).
  *
  * Why it exists: a compact parquet table (one row group — the testdata
  * shape at every local SF, and any "dimension-sized" input at cluster
  * scale) plans as ONE scan partition, so everything up to the first
  * exchange — shingle explodes, n-gram hashing, covariance pair
  * generation — runs on one core while the other N−1 idle. The map-side
  * work of those operators expands each input row 30–2000×, so the
  * single-task stage, not the shuffle, dominates wall time (measured at
  * sf0.1: q246 6.3 s, q225 5.7 s, q168 4.8 s of pure execution with 31
  * idle cores).
  *
  * The width is COST-GATED, not a blind jump to the core count (the
  * round-15 q185 lesson: fanning a ~600 KB frame 32-wide ahead of cheap
  * n-gram work turned 2.98 s into 8.87 s on a cold/loaded host — this
  * host pays ~30–70 ms of per-task overhead, so width must be
  * proportional to the work, guide §2.2/§2.6):
  *
  *   width = clamp(ceil(estBytes · weight / bytesPerTask), 1, defaultParallelism)
  *
  * where `estBytes` is the optimizer's size estimate of the frame (no
  * execution — `optimizedPlan.stats`), `weight` is the call site's
  * declared per-byte work multiple relative to a plain scan (minhash
  * hashes every shingle numHashes times → large; a single n-gram explode
  * → small), and `bytesPerTask` is the scale-free knob
  * `spark.graft.fanout.bytesPerTask` (default 128 KB: with weight 1 a
  * task receives what a scan task would chew in well under the per-task
  * overhead, so cheap work never fans wider than it can amortize).
  *
  * Scale safety: at cluster scale a 100 TB corpus both (a) caps at
  * defaultParallelism and (b) already scans wider than that, so the
  * current-width check makes the helper a no-op — no gratuitous
  * full-corpus shuffle. The shuffle it does introduce moves the
  * PRE-expansion rows (the cheap side, guide §8), and a key can be
  * supplied so a downstream `groupBy(key)` reuses the exchange
  * (guide §2.4).
  *
  * The helper only acts on NARROW (exchange-free) frames — leaf +
  * project/filter/generate — and is a deliberate no-op otherwise: a
  * post-shuffle frame is already cores-wide, and probing its physical
  * partition count via `df.rdd` under AQE would materialize the query
  * stages beneath it (silently double-executing upstream work). On a
  * narrow frame `df.rdd` plans but executes nothing, so the probe is
  * safe exactly where the helper applies.
  *
  * Determinism: round-robin repartition is deterministic
  * (sortBeforeRepartition, SPARK-23207) and hash repartition is a pure
  * function of the key; call sites must only feed order-insensitive
  * aggregations (exact min/max/count/decimal sums) — the repo-wide
  * determinism-under-partitioning contract the CPUS=8/32 oracle probe
  * re-checks.
  */
object ParOps {

  private def isNarrow(plan: LogicalPlan): Boolean =
    plan.collectFirst {
      case p if !(p.isInstanceOf[LeafNode] || p.isInstanceOf[Project] ||
        p.isInstanceOf[LFilter] || p.isInstanceOf[Generate] ||
        p.isInstanceOf[LocalLimit] || p.isInstanceOf[Sample]) => p
    }.isEmpty

  /** `df` repartitioned to the cost-gated width above when (and only
    * when) it is a narrow frame currently planned with fewer partitions;
    * by `keys` when given (so a following groupBy/join on the same keys
    * reuses the exchange), round-robin otherwise. `weight` declares the
    * call site's downstream per-byte work relative to a plain scan
    * (iterated consumers multiply by the iteration count).
    */
  def fanOut(df: DataFrame, keys: Seq[Column] = Nil,
      weight: Double = 8.0): DataFrame = {
    // measurement kill-switch for A/B evidence (never set by the bench)
    if (sys.env.contains("SPARK_GRAFT_NO_FANOUT")) return df
    val plan = df.queryExecution.optimizedPlan
    if (!isNarrow(plan)) return df
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val bytesPerTask = spark.conf.getOption("spark.graft.fanout.bytesPerTask")
      .map(_.trim.toLong).filter(_ > 0).getOrElse(131072L)
    val estBytes = plan.stats.sizeInBytes.toDouble
    val width = math.min(target.toDouble,
      math.max(1.0, math.ceil(estBytes * weight / bytesPerTask))).toInt
    if (width <= 1) return df
    // physical partition count of the frame as currently planned; plans
    // (but never executes) the narrow scan+projection frames this is
    // applied to
    val current = df.rdd.getNumPartitions
    if (current >= width) df
    else if (keys.nonEmpty) df.repartition(width, keys: _*)
    else df.repartition(width)
  }
}
