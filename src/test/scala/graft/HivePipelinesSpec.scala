package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipelines.HivePipelines

/** Golden end-to-end test of the reference's §3.1 plan on an MSPB-shaped
  * fixture: long sensor IDs vs short annotation IDs (202056 ↔ 2056),
  * ±3-day windows, min-support, FoB-threshold label — hand-checked values.
  */
class HivePipelinesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val feats = Seq("temperature", "humidity")

  // hive 202056: 12 readings around 2020-06-10 (qualifies, minRows=10);
  // hive 202099: 3 readings (fails min support)
  private lazy val sensor = (
    (0 until 12).map(i =>
      (202056L, ts(f"2020-06-${8 + i / 4}%02d 0${i % 4}:00:00"),
        20.0 + i, 50.0 + i)) ++
      (0 until 3).map(i =>
        (202099L, ts(f"2020-06-${9 + i}%02d 00:00:00"), 30.0, 60.0))
    ).toDF("hive_id", "timestamp", "temperature", "humidity")

  private lazy val population = Seq(
    (2056L, ts("2020-06-10 00:00:00"), 25.0), // label 1 (FoB ≥ 20)
    (2099L, ts("2020-06-10 00:00:00"), 10.0), // matched but under min support
    (7777L, ts("2020-06-10 00:00:00"), 30.0), // no sensor hive matches
  ).toDF("hive_id", "date", "frames_of_bees")

  test("populationFeatures: fuzzy match + window + stats + label, golden values") {
    val out = HivePipelines.populationFeatures(sensor, population,
      features = feats, windowDays = 7, minRows = 10, minCoverage = 0.0)
    val rows = out.collect()
    assert(rows.length == 1) // only 2056 survives
    val r = rows.head
    assert(r.getAs[Long]("hive_id") == 2056L)
    assert(r.getAs[Long]("n_samples") == 12L)
    // temperature 20..31: mean 25.5, range 11, deltas all 1 → delta std 0
    assert(r.getAs[Double]("temperature_mean") == 25.5)
    assert(r.getAs[Double]("temperature_range") == 11.0)
    assert(r.getAs[Double]("temperature_delta_mean") == 1.0)
    assert(r.getAs[Double]("temperature_delta_std") == 0.0)
    assert(r.getAs[Int]("population_class") == 1)
    // schema: 9 stats × 2 features + hive_id/date/n_samples/coverage/FoB/label
    assert(out.columns.length == 9 * 2 + 6)
  }

  test("populationFeatures is deterministic under input permutation") {
    val shuffled = sensor.orderBy(rand(3))
    val a = HivePipelines.populationFeatures(sensor, population, feats, 7, 10, 0.0)
      .collect().map(_.toSeq)
    val b = HivePipelines.populationFeatures(shuffled, population, feats, 7, 10, 0.0)
      .collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("summerAggregates: per-hive stats + diurnal range + weekly trend") {
    val out = HivePipelines.summerAggregates(sensor, feats, minRows = 10)
    val rows = out.collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("hive_id") == 202056L)
    assert(r.getAs[Double]("temperature_mean") == 25.5)
    // hours 0..3 have means (20+24+28)/3=24, 25, 26, 27 → daily range 3
    assert(r.getAs[Double]("temperature_daily_range") == 3.0)
    // readings span 2 ISO weeks (Jun 8-10 2020 are Mon-Wed of one week) —
    // all inside one week → weekly trend absent like the reference's
    // len(weekly_means) > 1 guard
    assert(r.isNullAt(r.fieldIndex("temperature_weekly_trend_std")))
    assert(r.isNullAt(r.fieldIndex("temperature_monthly_trend_std")))
    // early/late: 12 readings, mid=6 → early 20..25 (mean 22.5),
    // late 26..31 (mean 28.5), change +6
    assert(r.getAs[Double]("temperature_early_mean") == 22.5)
    assert(r.getAs[Double]("temperature_late_mean") == 28.5)
    assert(r.getAs[Double]("temperature_trend_change") == 6.0)
  }

  test("windowSequences: ordered vectors, stride from first, pad/truncate, label") {
    val out = HivePipelines.windowSequences(sensor, population,
      features = feats, windowDays = 7, stride = 4, maxLen = 5)
    val rows = out.collect()
    // 2099 has 3 readings < minRows=10 → dropped (dataset.py:229-230)
    assert(rows.length == 1)
    val r = rows.find(_.getAs[Long]("hive_id") == 2056L).get
    // 12 readings, stride 4 → positions 0,4,8 → temps 20,24,28; padded to 5
    assert(r.getAs[Long]("seq_len") == 3L)
    val seq = r.getSeq[scala.collection.Seq[Double]](r.fieldIndex("seq"))
      .map(_.toList).toList
    assert(seq.length == 5)
    assert(seq(0) == List(0.0, 0.0) && seq(1) == List(0.0, 0.0)) // front pad
    assert(seq.drop(2).map(_.head) == List(20.0, 24.0, 28.0))
    assert(r.getAs[Int]("population_class") == 1)
  }

  test("sequenceScalerStats: vstack-equivalent per-feature moments, pre-padding") {
    val seqs = HivePipelines.windowSequences(sensor, population,
      features = feats, windowDays = 7, stride = 1, maxLen = 100)
      .filter(col("hive_id") === 2056L)
    val stats = HivePipelines.sequenceScalerStats(seqs, "seq_raw")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // hive 2056 unpadded: temps 20..31 → mean 25.5 (padded seq would skew)
    assert(stats(0L) == 25.5)
  }

  test("populationFeatures: coverage filter excludes sparse windows (preprocessing.py:188)") {
    // coverage = 12 / 672 ≈ 0.018 — the reference's default 0.3 floor
    // rejects the window entirely
    assert(HivePipelines.populationFeatures(sensor, population, feats, 7, 10)
      .count() == 0)
  }

  test("populationFeatures: one sensor hive per annotation under suffix collision") {
    // 302056 collides with 202056 on the 4-digit suffix; only the minimum
    // matching hive's readings may enter the window (no interleaving)
    val collided = sensor.union(
      (0 until 12).map(i =>
        (302056L, ts(f"2020-06-${8 + i / 4}%02d 0${i % 4}:30:00"),
          100.0, 100.0)).toDF("hive_id", "timestamp", "temperature", "humidity"))
    val out = HivePipelines.populationFeatures(collided, population, feats, 7, 10, 0.0)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n_samples") == 12L) // not 24
    assert(out.head.getAs[Double]("temperature_mean") == 25.5) // 202056 only
  }

  test("withHiveSplit keeps every hive in exactly one split") {
    val f = HivePipelines.populationFeatures(sensor, population, feats, 7, 1, 0.0)
    val s = HivePipelines.withHiveSplit(f)
    assert(s.groupBy("hive_id").agg(countDistinct("split").as("n"))
      .filter(col("n") =!= 1).count() == 0)
  }
}
