package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling: the per-column audit (row/null/distinct counts) that
  * gates every ingest into a training-data lake. One aggregation pass per
  * profiled column over a shared scan — column pruning keeps each pass to
  * exactly the profiled column, and the per-column results are tiny one-row
  * frames unioned into the report, so the operator is a constant number of
  * linear scans regardless of data volume (and a single scan after the
  * unions collapse under shared-scan reuse).
  */
object ProfileOps {

  /** Profile the named columns: row count, null count and fraction, and
    * exact distinct count (nulls excluded, SQL semantics). `keyExpr`
    * optionally maps a column before counting distincts (e.g. timestamps
    * to epoch micros so precision quirks don't leak into the count).
    * For the trillion-distinct regime swap the exact count for
    * `approx_count_distinct` — q53 proves that path; this operator is the
    * audit-exact variant.
    */
  def columnProfile(df: DataFrame, cols: Seq[String],
      keyExpr: Map[String, Column] = Map.empty): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    cols.map { c =>
      val v = keyExpr.getOrElse(c, col(c))
      df.agg(
        lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        round(sum(when(col(c).isNull, 1L).otherwise(0L)) /
          count(lit(1)).cast("double"), 6).as("null_frac"),
        countDistinct(v).as("n_distinct"))
    }.reduce(_.unionByName(_))
  }
}
