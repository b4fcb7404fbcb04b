package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.pipelines.HivePipelines

class WinterPhenotypicSpec extends SparkSpec {
  import spark.implicits._

  test("withDerivedAverages: row-wise null-skipping measurement means") {
    val ph = Seq(
      (2050L, Some(1.0), Some(3.0), Some(2.0), None: Option[Double], Some(4.0), Some(4.0)),
      (2051L, None: Option[Double], None: Option[Double], Some(5.0), Some(7.0), None: Option[Double], Some(9.0)),
    ).toDF("hive_id", "varroa_may", "varroa_aug", "defensive_1", "defensive_2",
      "hygienic_1", "hygienic_2")
    val out = HivePipelines.withDerivedAverages(ph).orderBy("hive_id").collect()
    assert(out(0).getAs[Double]("varroa_avg") == 2.0)
    assert(out(0).getAs[Double]("defensive_avg") == 2.0) // null skipped
    assert(out(0).getAs[Double]("hygienic_avg") == 4.0)
    assert(out(1).isNullAt(out(1).fieldIndex("varroa_avg"))) // all null → null
    assert(out(1).getAs[Double]("defensive_avg") == 6.0)
  }

  test("winterFeatures: survival from mortality-cause nullness + pre-winter join") {
    def ts(s: String) = Timestamp.valueOf(s)
    val sensor = (0 until 120).map(i =>
      (202050L, ts(f"2020-09-${1 + i / 6}%02d 0${i % 6}:00:00"), 15.0 + (i % 5), 55.0))
      .toDF("hive_id", "timestamp", "temperature", "humidity")
    val winter = Seq(
      (2050L, None: Option[String], 30.5),
      (2099L, Some("starvation"), 28.0),
    ).toDF("hive_id", "mortality_cause", "weight_before_kg")
    val out = HivePipelines.winterFeatures(sensor, winter,
      features = Seq("temperature", "humidity"), minRows = 100)
    val rows = out.collect()
    assert(rows.length == 1) // only 2050 has matching sensor data
    assert(rows.head.getAs[Boolean]("survived"))
    assert(rows.head.getAs[Double]("weight_before_kg") == 30.5)
  }
}
