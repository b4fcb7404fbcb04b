package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-sequence analytics: ordered-stage funnels and cohort retention.
  * Both are the per-user temporal alignment the reference performs on hive
  * sensor streams (`/root/reference/src/data/preprocessing.py:93-137`)
  * re-aimed at user event streams, and both reduce to user-keyed hash
  * aggregations plus joins of per-user one-row frames — the user key is
  * the only shuffle, so the plans scale linearly with the event volume and
  * are skew-safe up to the hottest single user.
  */
object FunnelOps {

  /** Ordered conversion funnel: a user converts at stage i+1 only with an
    * event of that stage STRICTLY AFTER their stage-i conversion time
    * (first-touch attribution). Returns one row per stage with the user
    * count and conversion rate from the previous stage.
    *
    * Each stage is one filtered user-keyed min-aggregation joined to the
    * previous frontier — stages are few and fixed, so the plan is a short
    * chain of hash joins on the user key; nothing is quadratic and nothing
    * is collected.
    */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val frontiers = stages.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stage, i)) =>
        val ev = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(tsCol))
        val reached = prev match {
          case None => ev
          case Some(f) =>
            ev.join(f.select(col(userCol), col("__t").as("__prev_t")), userCol)
              .filter(col(tsCol) > col("__prev_t"))
              .select(col(userCol), col(tsCol))
        }
        Some(reached.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t")))
    }.flatten
    val counts = stages.zip(frontiers).zipWithIndex.map {
      case ((stage, f), i) =>
        f.agg(lit(i + 1).cast("int").as("stage_idx"),
          lit(stage).as("stage"),
          count(lit(1)).as("n_users"))
    }.reduce(_.unionByName(_))
    // conversion from the previous stage via a self-join on stage_idx − 1
    // (the frame is `stages.length` rows — broadcast, not a window)
    val prev = counts.select(
      (col("stage_idx") + 1).as("stage_idx"), col("n_users").as("__prev_n"))
    counts.join(broadcast(prev), Seq("stage_idx"), "left")
      .select(col("stage_idx"), col("stage"), col("n_users"),
        // null for the first stage AND for an empty previous stage (ANSI
        // division would throw on 0; SQL engines yield NULL — match that)
        when(col("__prev_n") > 0,
          round(col("n_users") / col("__prev_n").cast("double"), 6))
          .as("conv_from_prev"))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their first
    * event, counted as retained in week `offset` if any event falls in
    * cohort-week + offset. One min-aggregation for cohorts, one join back,
    * one distinct-count — all keyed on the user / (cohort, offset) keys.
    * Week arithmetic stays in integer epoch math (UTC weeks are exact
    * 604800-second multiples), so counts are engine-exact.
    */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
      maxOffsetWeeks: Int): DataFrame = {
    val weekUs = 604800L * 1000000L
    val first = events.groupBy(col(userCol))
      .agg(min(col(tsCol)).as("__t0"))
      .select(col(userCol),
        date_trunc("week", col("__t0")).as("__cw"))
    events.select(col(userCol), col(tsCol))
      .join(first, userCol)
      .select(col(userCol),
        col("__cw").cast("date").as("cohort_week"),
        ((unix_micros(date_trunc("week", col(tsCol))) -
          unix_micros(col("__cw"))) / weekUs).cast("long").as("week_offset"))
      .filter(col("week_offset") <= maxOffsetWeeks)
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }
}
