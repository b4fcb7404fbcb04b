package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{RobustStats, TextOps}

class TrendTestsSpec extends SparkSpec {
  import spark.implicits._

  private def eventsWithDailyCounts(counts: Seq[Int]) = {
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(new Timestamp(
        java.time.LocalDate.of(2024, 1, 1).plusDays(d.toLong)
          .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli))
    }
    rows.toDF("ts")
  }

  test("mannKendallDailyTrend: strictly increasing counts give τ_b = 1") {
    // counts 1..10: every pair concordant, no ties ->
    // S = 45, Var = 10·9·25/18 = 125, z = 44/√125
    val got = RobustStats.mannKendallDailyTrend(
        eventsWithDailyCounts(1 to 10), "ts")
      .select("n_days", "s_stat", "var_s", "z", "tau_b")
      .as[(Long, Long, Double, Double, Double)].head()
    val zExp = BigDecimal(44.0 / math.sqrt(125.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((10L, 45L, 125.0, zExp, 1.0)))
  }

  test("mannKendallDailyTrend: constant counts give S = 0, z = 0") {
    val got = RobustStats.mannKendallDailyTrend(
        eventsWithDailyCounts(Seq.fill(8)(3)), "ts")
      .select("s_stat", "z", "tau_b")
      .as[(Long, Double, Option[Double])].head()
    // one big tie group: S = 0, z pinned to 0, τ_b undefined (null)
    assert(got == ((0L, 0.0, None)))
  }

  test("pettittDailyChangePoint finds a clean level shift") {
    // 5 days at 1 then 5 days at 10: U_t dips to -25 at t = 5 (i = 4)
    val got = RobustStats.pettittDailyChangePoint(
        eventsWithDailyCounts(Seq.fill(5)(1) ++ Seq.fill(5)(10)), "ts")
      .select("n_days", "k_stat", "t_star", "p_approx")
      .as[(Long, Long, Long, Double)].head()
    val pExp = BigDecimal(math.min(1.0,
        2.0 * math.exp(-6.0 * 25.0 * 25.0 / (1000.0 + 100.0))))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == ((10L, 25L, 4L, pExp)))
  }

  test("streamingKeyness lands on the batch card row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("graft_keyness_")
    try {
      val docs = (Seq.fill(8)(("A", "foo bar")) ++
        Seq.fill(8)(("B", "baz bar"))).toDF("source", "text")
      docs.coalesce(1).write.mode("overwrite")
        .parquet(dir.resolve("docs.parquet").toString)
      val stream = graft.streaming.StreamingOps.streamingKeyness(
        spark, dir.toString, "docs.parquet", "source", "text",
        graft.streaming.StreamSink.Memory("spec_keyness"))
      val batch = TextOps.keynessCard(docs, "source", "text")
      assert(stream.collect().toSeq == batch.collect().toSeq)
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively(); ()
    }
  }
}
