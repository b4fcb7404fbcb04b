package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

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
  * The repair is scale-adaptive, not a local[32] constant: repartition to
  * the session's default parallelism ONLY when the frame currently has
  * fewer partitions. At cluster scale a 100 TB corpus scans as thousands
  * of partitions, the condition is false, and the helper is a no-op — no
  * gratuitous full-corpus shuffle. The shuffle it does introduce moves the
  * PRE-expansion rows (the cheap side, guide §8), and a key can be
  * supplied so a downstream `groupBy(key)` reuses the exchange
  * (guide §2.4).
  *
  * Determinism: round-robin repartition is deterministic
  * (sortBeforeRepartition, SPARK-23207) and hash repartition is a pure
  * function of the key; call sites must only feed order-insensitive
  * aggregations (exact min/max/count/decimal sums) — the repo-wide
  * determinism-under-partitioning contract the CPUS=8/32 oracle probe
  * re-checks.
  */
object ParOps {

  /** `df` repartitioned to the session default parallelism when (and only
    * when) its current physical partitioning is narrower; by `keys` when
    * given (so a following groupBy/join on the same keys reuses the
    * exchange), round-robin otherwise.
    */
  def fanOut(df: DataFrame, keys: Seq[Column] = Nil): DataFrame = {
    // measurement kill-switch for A/B evidence (never set by the bench)
    if (sys.env.contains("SPARK_GRAFT_NO_FANOUT")) return df
    val target = df.sparkSession.sparkContext.defaultParallelism
    // physical partition count of the frame as currently planned; cheap
    // for the scan-plus-projection frames this is applied to
    val current = df.rdd.getNumPartitions
    if (current >= target) df
    else if (keys.nonEmpty) df.repartition(target, keys: _*)
    else df.repartition(target)
  }
}
