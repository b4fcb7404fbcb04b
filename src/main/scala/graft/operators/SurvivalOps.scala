package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Survival analysis: the Kaplan–Meier product-limit estimator over
  * right-censored durations. The reference's retention view of users is a
  * point-in-time aggregate (`/root/reference/src/data/preprocessing.py`
  * windowed counts); survival curves are the longitudinal generalization —
  * "how long until conversion/churn, given most subjects haven't converted
  * yet" — and the standard churn/time-to-event readout for a behavioral
  * table at any scale.
  *
  * Scale shape: one keyed aggregation collapses the data to one row per
  * distinct duration (a bounded time grid — days/weeks — so the frame is
  * tiny); the risk-set reverse-cumulative and the product-limit cumulation
  * run as ordered windows over THAT aggregated frame only, never over the
  * data (the q46/q115 rule: global windows only above aggregates).
  */
object SurvivalOps {

  /** Kaplan–Meier curve from per-subject (`durationCol`: integer time
    * units, `eventCol`: true = event observed, false = right-censored).
    * Returns one row per distinct duration with the risk set, event and
    * censor counts, and the product-limit survival estimate
    * S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ).
    *
    * The product accumulates in log space (Σ ln(1 − dᵢ/nᵢ), exponentiated
    * once); every dᵢ/nᵢ is an exact-integer ratio divided once, and the
    * final estimate rounds to 6 so the curve is engine-portable.
    *
    * SCALE CONTRACT: the ordered windows run over the per-duration frame,
    * so the duration column must be a COARSE time grid (days/weeks —
    * thousands of distinct values). For fine-grained durations (seconds
    * at corpus scale → millions of distinct values through one window
    * task), pass `bucketWidth > 1` to floor durations onto a bounded grid
    * first; the curve is then evaluated at bucket lower edges, which is
    * the standard life-table coarsening.
    *
    * The contract is ENFORCED, not just documented: a cheap
    * `approx_count_distinct` pre-pass fails fast (with the fix in the
    * message) when the post-bucket grid would exceed `maxGridSize` — the
    * alternative is a silent single-task window over millions of rows,
    * the exact failure mode this operator's shape exists to avoid.
    */
  def kaplanMeier(df: DataFrame, durationCol: String,
      eventCol: String, bucketWidth: Long = 1L,
      maxGridSize: Long = 10000L): DataFrame = {
    val tExpr =
      if (bucketWidth <= 1L) col(durationCol)
      else floor(col(durationCol).cast("long") / bucketWidth) * bucketWidth
    val approxGrid =
      df.agg(approx_count_distinct(tExpr).as("n")).head().getLong(0)
    require(approxGrid <= maxGridSize,
      s"kaplanMeier time grid too fine: ~$approxGrid distinct " +
        s"(bucketed) durations exceed maxGridSize=$maxGridSize, so the " +
        "product-limit window would funnel them through one task. Pass a " +
        "larger bucketWidth (life-table coarsening) or raise maxGridSize " +
        "deliberately.")
    val byT = df.groupBy(tExpr.as("t"))
      .agg(
        sum(when(col(eventCol), 1L).otherwise(0L)).as("n_event"),
        sum(when(col(eventCol), 0L).otherwise(1L)).as("n_censored"))
    // risk set: subjects with duration ≥ t — a reverse cumulative sum over
    // the per-duration frame
    val wRisk = Window.orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wSurv = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censored")).over(wRisk))
      // a fully-depleted risk set (d == n, only possible at the last time
      // point) sends the product to exactly 0 — handled explicitly, since
      // ln(0) is an ERROR in ANSI engines, not −∞
      .withColumn("__step",
        when(col("n_event") < col("n_risk"),
          log(lit(1.0) - col("n_event").cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("n_event") === col("n_risk"), lit(0.0))
          .otherwise(round(exp(sum(col("__step")).over(wSurv)), 6)))
      .select(col("t"), col("n_risk"), col("n_event"), col("n_censored"),
        col("survival"))
  }
}
