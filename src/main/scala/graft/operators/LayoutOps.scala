package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: bucketed tables and the co-located join. The
  * reference joins in pandas memory (`/root/reference/src/data/
  * preprocessing.py:139-188`); at 100 TB the dominant cost of a fact-fact
  * equi-join is the shuffle of BOTH sides, and the standard cure is to
  * write the tables bucketed by the join key so the join runs bucket-to-
  * bucket with ZERO exchanges — the layout is paid once at write time and
  * amortized over every subsequent join/aggregation on that key.
  */
object LayoutOps {

  /** Write `left` and `right` bucketed by their join keys into `buckets`
    * buckets under `root` (registered as tables `<tag>_l` / `<tag>_r` in
    * the session catalog, parquet at a caller-owned path), then equi-join
    * the BUCKETED tables. With bucketing metadata present, Catalyst plans
    * the join with no Exchange on either side — the plan audit asserts it.
    * Buckets are also sorted by the key, so the sort-merge join needs no
    * per-task sort either.
    *
    * The result is bit-identical to `left.join(right, ...)` — layout, like
    * salting (q90) and the bloom prefilter (q117), must be invisible in
    * the answer. Caller cleans up via [[dropBucketed]].
    */
  def bucketedEquiJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int, root: String,
      tag: String): DataFrame = {
    left.write.mode("overwrite")
      .option("path", s"$root/${tag}_l")
      .bucketBy(buckets, leftKey).sortBy(leftKey)
      .saveAsTable(s"${tag}_l")
    right.write.mode("overwrite")
      .option("path", s"$root/${tag}_r")
      .bucketBy(buckets, rightKey).sortBy(rightKey)
      .saveAsTable(s"${tag}_r")
    spark.table(s"${tag}_l")
      .join(spark.table(s"${tag}_r"),
        col(leftKey) === col(rightKey))
  }

  def dropBucketed(spark: SparkSession, tag: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${tag}_l")
    spark.sql(s"DROP TABLE IF EXISTS ${tag}_r")
  }
}
