package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Slowly-changing-dimension type-2 history build: collapse a change
    * stream into per-key VALIDITY INTERVALS of the tracked attribute —
    * one row per (key, attribute run) with `valid_from` (first ts of
    * the run), `valid_to` (start of the next run, null while current),
    * `is_current`, and a per-key `version` counter. The warehouse-side
    * complement of [[compactLatest]]: latest-state answers "what is",
    * SCD2 answers "what was, when" — the as-of join's natural build
    * side (`FuzzyJoins.asOfJoin` probes it).
    *
    * Consecutive rows with the SAME attribute value belong to one run
    * (no spurious versions); ordering is total via (ts, tiebreak), so
    * the result is deterministic under any partitioning.
    *
    * Scale shape: two window passes partitioned BY KEY (state for one
    * key never crosses executors) — lag to mark run starts, lead to
    * close intervals; no self-join, no driver state.
    */
  def scdType2(df: DataFrame, key: String, ts: String, tiebreak: String,
      attr: String): DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    val runs = df
      .select(col(key), col(ts), col(tiebreak), col(attr))
      .withColumn("__prev", lag(col(attr), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // run start = first row of the key, or an attribute change; a null
      // attribute is a legitimate tracked value (null-safe comparison)
      .filter(col("__rn") === 1 || !(col("__prev") <=> col(attr)))
      .drop("__prev", "__rn")
    val wk = Window.partitionBy(col(key)).orderBy(col(ts), col(tiebreak))
    runs
      .withColumn("version", row_number().over(wk).cast("long"))
      .withColumn("valid_to", lead(col(ts), 1).over(wk))
      .select(col(key), col(attr), col(ts).as("valid_from"),
        col("valid_to"), col("valid_to").isNull.as("is_current"),
        col("version"))
  }
}
