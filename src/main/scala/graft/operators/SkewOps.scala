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
}
