package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.{GraphOps, PatternOps, RobustStats, SurvivalOps}

/** Scaling micro-benchmark for the round-3 wave: triangle census (wedge
  * join fan-out is the risk), quantile normalization, frequent motifs and
  * Kaplan–Meier. 8× inputs are id-offset copies — multiplying KEYS
  * (nodes/sources/users/subjects), each copy structurally identical, so a
  * scale-safe plan costs ~8× and a pair-cartesian or global-sort plan
  * blows past the ceiling. Loose ceilings like [[DedupScalingBench]];
  * measured ratios print as the record.
  */
class WaveScalingBench extends SparkSpec {

  /** Deterministic pseudo-random multigraph: `copies` disconnected
    * identical components of `nodes` vertices and ~4·nodes edges, so
    * triangle work scales exactly with `copies`.
    */
  private def edges(nodes: Int, copies: Int): DataFrame =
    (0 until copies).map { k =>
      spark.range(0L, nodes.toLong * 4)
        .select(
          (col("id") % nodes + lit(k.toLong * 10000000L)).as("s"),
          ((col("id") * 2654435761L) % nodes + lit(k.toLong * 10000000L))
            .as("d"))
        .filter(col("s") =!= col("d"))
    }.reduce(_.unionByName(_)).cache()

  private def timed(f: => Long): (Long, Long) = {
    val t0 = System.nanoTime(); val n = f
    ((System.nanoTime() - t0) / 1000000, n)
  }

  test("triangle census scales near-linearly in components") {
    val small = edges(1500, 1); val big = edges(1500, 8)
    assert(small.count() * 8 == big.count())
    def run(df: DataFrame) =
      timed(GraphOps.triangleStats(df, "s", "d").count())
    run(small) // warm codegen
    val s = run(small); val b = run(big)
    val ratio = b._1.toDouble / math.max(1, s._1)
    info(f"triangles 1x=${s._1}%5d ms  8x=${b._1}%5d ms  ratio=$ratio%.1f")
    // wedge fan-out is degree-bounded per copy; a node-cartesian plan
    // would be ≥ 64×
    assert(ratio < 24.0, f"triangle census super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("spearman scales near-linearly in distinct values") {
    // near-all-distinct x and y: the bucketed-midrank frame grows with the
    // data, the worst case for a rank statistic — a global per-row sort
    // would be the q46 bug
    def pts(mult: Int) =
      spark.range(0L, 100000L * mult).select(
        ((col("id") * 2654435761L) % 1000003L).cast("double").as("x"),
        ((col("id") * 40503L + 7L) % 999983L).cast("double").as("y"))
        .cache()
    val small = pts(1); val big = pts(8)
    assert(small.count() * 8 == big.count())
    def run(df: org.apache.spark.sql.DataFrame) =
      timed(graft.metrics.RankMetrics.spearman(df, "x", "y").count())
    run(small) // warm codegen
    val s = run(small); val b = run(big)
    val ratio = b._1.toDouble / math.max(1, s._1)
    info(f"spearman 1x=${s._1}%5d ms  8x=${b._1}%5d ms  ratio=$ratio%.1f")
    assert(ratio < 24.0, f"spearman super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("quantile-norm, motifs, Kaplan-Meier scale near-linearly in keys") {
    val base = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    def events(mult: Int): DataFrame =
      (0 until mult).map { k =>
        base.select(
          (col("event_id") + lit(k * 100000000L)).as("event_id"),
          col("ts"),
          (col("user_id") + lit(k * 1000000L)).as("user_id"),
          col("event_type"), col("value"))
      }.reduce(_.unionByName(_)).cache()
    val small = events(1); val big = events(8)
    assert(small.count() * 8 == big.count())

    // per-subject synthetic durations on a bounded day grid: the KM frame
    // (distinct durations) stays constant while subjects multiply — the
    // documented scale contract
    def durations(df: DataFrame) = df
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("value")).as("v"))
      .select((col("n") * 7 % 365).as("d"), (col("v") > 0.5).as("ev"))

    def suite(df: DataFrame, minKeys: Long): Map[String, (Long, Long)] = Map(
      "quantile_norm" -> timed(
        RobustStats.quantileNormalizationMap(
          df.select(col("event_type").as("g"), col("value").as("v")),
          "g", "v").count()),
      "motifs" -> timed(
        PatternOps.frequentMotifs(df, "user_id", "ts", "event_id",
          "event_type", n = 3, minKeys = minKeys).count()),
      "kaplan_meier" -> timed(
        SurvivalOps.kaplanMeier(durations(df), "d", "ev").count()))

    suite(small, 50L) // warm codegen
    // support threshold scales with keys so motif selectivity is constant
    val s = suite(small, 50L); val b = suite(big, 400L)
    s.keys.toSeq.sorted.foreach { k =>
      val ratio = b(k)._1.toDouble / math.max(1, s(k)._1)
      info(f"$k%-14s 1x=${s(k)._1}%5d ms (${s(k)._2}%6d rows)  " +
        f"8x=${b(k)._1}%5d ms (${b(k)._2}%6d rows)  time-ratio=$ratio%.1f")
      assert(ratio < 24.0, f"$k scaled super-linearly: $ratio%.1f× at 8×")
    }
    small.unpersist(); big.unpersist()
  }
}
