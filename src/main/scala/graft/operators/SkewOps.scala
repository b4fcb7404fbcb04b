package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: key salting. AQE's skew-join split
  * handles most cases at runtime; explicit salting remains the tool when a
  * single hot key dwarfs every partition (power-law user ids, null-heavy
  * foreign keys) or when AQE is unavailable (streaming joins).
  *
  * Shape: the fact side gets a random-but-deterministic salt in
  * [0, buckets); the dimension side is exploded ×buckets so every salted
  * key finds its match. Join cardinality is unchanged; the hot key's rows
  * now spread over `buckets` reducers.
  */
object SkewOps {

  /** Deterministic per-row salt derived from stable row identity columns —
    * reproducible across retries/partitionings, unlike rand().
    */
  def salt(buckets: Int, identity: Column*): Column =
    pmod(xxhash64(identity: _*), lit(buckets.toLong)).cast("int")

  /** Salted inner equi-join of `fact` (skewed) with `dim` (small-ish).
    * `factIdentity` are columns that uniquely identify a fact row (for the
    * deterministic salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
      factIdentity: Seq[String]): DataFrame = {
    val salted = fact.withColumn("__salt",
      salt(buckets, factIdentity.map(col): _*))
    val exploded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Key-distribution skew report: the diagnostic run BEFORE choosing
    * between a plain join and [[saltedJoin]]. One count aggregation keyed
    * by the join key, then one tiny aggregate over the per-key counts —
    * mean/p99/max rows per key and the max/mean skew ratio. The exact p99
    * (type-7, matching DuckDB's quantile_cont) sorts only the per-key
    * count frame, which is orders of magnitude smaller than the data.
    */
  def keyDistribution(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        round(sum(col("__c")) / count(lit(1)).cast("double"), 6)
          .as("avg_per_key"),
        round(expr("percentile(__c, 0.99)"), 6).as("p99_per_key"),
        max(col("__c")).as("max_per_key"))
      .withColumn("skew_ratio",
        round(col("max_per_key") / col("avg_per_key"), 6))

  /** Bloom-prefiltered semi-join: keep `big` rows whose key appears in
    * `keys`, pruning the big side with a broadcast Bloom filter BEFORE any
    * shuffle, then finishing with the exact semi-join (which removes the
    * filter's false positives — the result is bit-identical to a plain
    * semi-join, the bloom is invisible except in the plan).
    *
    * The 100 TB rationale: a keys side of tens of millions of rows is too
    * big for a broadcast hash relation but its Bloom filter is a few MB —
    * so the big side drops non-matching rows at the scan, and only
    * survivors pay the semi-join shuffle. Keys hash through xxhash64 so the
    * aggregate accepts any key type. Build: one aggregation on the keys
    * side; probe: a codegen'd filter, no extra shuffle.
    */
  def bloomSemiJoin(big: DataFrame, keys: DataFrame, bigKey: String,
      keysKey: String, expectedItems: Long = 1000000L,
      numBits: Long = 8388608L): DataFrame = {
    // The build is one distributed aggregation over the keys side; only the
    // finished filter (a few MB of bits — the 1-row-aggregate exception to
    // the no-collect rule) reaches the driver, exactly like Spark's own
    // InjectRuntimeFilter, because might_contain requires a CONSTANT bloom.
    val bloomBytes = keys
      .agg(expr(s"bloom_filter_agg(xxhash64($keysKey), " +
        s"CAST($expectedItems AS BIGINT), CAST($numBits AS BIGINT))")
        .as("__bf"))
      .head().getAs[Array[Byte]](0)
    big.filter(call_function("bloom_might_contain",
        lit(bloomBytes), xxhash64(col(bigKey))))
      .join(keys.select(col(keysKey).as(bigKey)).distinct(),
        Seq(bigKey), "leftsemi")
  }
}
