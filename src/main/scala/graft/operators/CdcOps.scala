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
    val payload = df.columns.filterNot(keys.contains)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct(ordCols.map(col): _*)).as("__r"))
      .select(keys.map(col) ++ payload.map(c => col(s"__r.$c").as(c)): _*)
  }

  /** Compact, then drop keys whose LATEST change is a tombstone — delete
    * semantics: a delete only wins if nothing newer re-inserts the key.
    */
  def compactWithDeletes(df: DataFrame, keys: Seq[String],
      ordCols: Seq[String], isDelete: DataFrame => org.apache.spark.sql.Column): DataFrame = {
    val latest = compactLatest(df, keys, ordCols)
    latest.filter(!isDelete(latest))
  }
}
