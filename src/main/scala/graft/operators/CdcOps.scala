package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change-data-capture compaction: collapse an append-only change stream to
  * its latest state per key — the ingest-side "merge/upsert" primitive a
  * continuously-refreshed training corpus needs (recrawled documents,
  * re-annotated labels, corrected records).
  *
  * Scale design: ONE hash aggregation via `max_by` over a lexicographic
  * (version-columns) struct — partial aggregation combines map-side, so the
  * shuffle carries at most one row per key per input partition, strictly
  * cheaper than the window-rank formulation (full sort shuffle of every
  * version). Deterministic whenever the version columns form a total order
  * per key (e.g. ts + unique change id as tiebreak).
  */
object CdcOps {

  /** Latest row per `keys`, ordered by the lexicographic tuple of `ordCols`
    * (highest wins). All non-key columns are returned from the winning row.
    * Shared by the batch path and [[graft.streaming.StreamingOps
    * .compactLatestStream]] — the stream's convergence-to-batch guarantee
    * depends on both running this exact aggregation.
    */
  def compactLatest(df: DataFrame, keys: Seq[String],
      ordCols: Seq[String]): DataFrame = {
    val payload = df.columns.toSeq.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(ordCols.map(col): _*)).as("__r"))
      .select(keys.map(col) ++ payload.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Compact, then drop keys whose LATEST change is a tombstone — delete
    * semantics: a delete only wins if nothing newer re-inserts the key.
    */
  /** Keyed snapshot diff: classify every key as added / removed / changed /
    * unchanged between two table versions, comparing the given state
    * columns — the cross-snapshot audit a warehouse runs after a backfill
    * or replication pass (the batch complement of [[compactLatest]]'s
    * within-stream view). One full-outer equi-join on the key; state
    * columns must already be 1-row-per-key aggregates.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      compareCols: Seq[String]): DataFrame = {
    // presence markers, not null-checks on state columns — a legitimately
    // NULL state value must not read as an absent key
    val l = compareCols.foldLeft(
        a.select(col(key) +: compareCols.map(col): _*)
          .withColumn("__in_a", lit(1))) {
      (d, c) => d.withColumnRenamed(c, s"${c}_a")
    }
    val r = compareCols.foldLeft(
        b.select(col(key) +: compareCols.map(col): _*)
          .withColumn("__in_b", lit(1))) {
      (d, c) => d.withColumnRenamed(c, s"${c}_b")
    }
    val joined = l.join(r, Seq(key), "full_outer")
    val differs = compareCols.map(c =>
      !(col(s"${c}_a") <=> col(s"${c}_b"))).reduce(_ || _)
    joined.withColumn("status",
      when(col("__in_b").isNull, "removed")
        .when(col("__in_a").isNull, "added")
        .when(differs, "changed")
        .otherwise("unchanged"))
      .drop("__in_a", "__in_b")
  }

  /** Incremental aggregate maintenance: merge an existing per-key state
    * (n, decimal sum) with a new batch's partial aggregate WITHOUT
    * touching historical data — the materialized-view update step. Sums
    * are exact decimals and counts are integers, i.e. a commutative
    * monoid, so merge-of-partials is BIT-IDENTICAL to a full recompute —
    * the property the oracle checks (it recomputes from scratch) and the
    * reason incremental pipelines can be trusted at 100 TB, where
    * recomputation is not an option.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, key: String,
      nCol: String, sumCol: String): DataFrame =
    state.unionByName(delta)
      .groupBy(col(key))
      .agg(sum(col(nCol)).as(nCol), sum(col(sumCol)).as(sumCol))

  def compactWithDeletes(df: DataFrame, keys: Seq[String],
      ordCols: Seq[String], isDelete: DataFrame => org.apache.spark.sql.Column): DataFrame = {
    val latest = compactLatest(df, keys, ordCols)
    latest.filter(!isDelete(latest))
  }
}
