package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.{FunnelOps, SkewOps, TimeSeriesOps}

/** Scaling micro-benchmark for the behavioral/time-series operators
  * (funnel, cohort retention, gap detection, skew report): all are chains
  * of user-keyed aggregations and windows, so an 8× event stream — built
  * as id-offset copies, which multiplies USERS, the partitioning key, not
  * rows-per-user — must cost ~8×, never key-count-quadratic. Loose
  * ceilings like [[DedupScalingBench]]; measured ratios print as the
  * record.
  */
class BehavioralScalingBench extends SparkSpec {

  private def events(mult: Int): DataFrame = {
    val base = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    (0 until mult).map { k =>
      base.select(
        (col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * 1000000L)).as("user_id"),
        col("event_type"))
    }.reduce(_.unionByName(_)).cache()
  }

  private def timed(f: => Long): (Long, Long) = {
    val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1000000, n)
  }

  test("funnel, cohort, gaps, skew report scale near-linearly in users") {
    val small = events(1); val big = events(8)
    assert(small.count() * 8 == big.count())

    def suite(df: DataFrame): Map[String, (Long, Long)] = Map(
      "funnel" -> timed(
        FunnelOps.funnel(df, "user_id", "ts", "event_type",
          Seq("view", "click", "purchase")).count()),
      "cohort" -> timed(
        FunnelOps.cohortRetention(df, "user_id", "ts", 3).count()),
      "gaps" -> timed(
        TimeSeriesOps.gapStats(df, "user_id", "ts", "event_id",
          6L * 3600 * 1000000).count()),
      "skew_report" -> timed(
        SkewOps.keyDistribution(df, "user_id").count()))

    suite(small) // warm codegen
    val s = suite(small); val b = suite(big)
    s.keys.toSeq.sorted.foreach { k =>
      val ratio = b(k)._1.toDouble / math.max(1, s(k)._1)
      info(f"$k%-12s 1x=${s(k)._1}%5d ms (${s(k)._2}%7d rows)  " +
        f"8x=${b(k)._1}%5d ms (${b(k)._2}%7d rows)  time-ratio=$ratio%.1f")
      // 8× data in ≤ 24× time: a user-quadratic or key-cartesian plan
      // would be ≥ 64× (ratios on this host run ~4-10× with JIT noise)
      assert(ratio < 24.0, f"$k scaled super-linearly: $ratio%.1f× at 8× data")
    }
    small.unpersist(); big.unpersist()
  }
}
