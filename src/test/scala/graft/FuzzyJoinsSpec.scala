package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.FuzzyJoins

class FuzzyJoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("suffixKey zero-pads then slices the suffix") {
    val df = Seq(202056L, 56L).toDF("id")
    val keys = df.select(FuzzyJoins.suffixKey($"id", 6, 2)).as[String].collect()
    assert(keys.toSeq == Seq("56", "56"))
  }

  test("suffixJoin matches long sensor ids to short annotation ids (reference J1)") {
    val sensors = Seq((202056L, 9.0), (202099L, 1.0)).toDF("sensor_id", "reading")
    val annots = Seq((2056L, "eval1")).toDF("hive_id", "eval")
    val joined = FuzzyJoins.suffixJoin(sensors, annots, "sensor_id", "hive_id")
    assert(joined.select("sensor_id").as[Long].collect().toSeq == Seq(202056L))
  }

  test("intervalJoin picks fact rows inside [anchor-before, anchor+after]") {
    val fact = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0),
      (1L, ts("2024-01-03 00:00:00"), 2.0),
      (1L, ts("2024-01-10 00:00:00"), 3.0), // outside window
      (2L, ts("2024-01-03 00:00:00"), 4.0), // wrong key
    ).toDF("k", "ts", "v")
    val anchors = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("ak", "ats")
    val j = FuzzyJoins.intervalJoin(fact, anchors, "k", "ak", "ts", "ats",
      "3 DAYS", "3 DAYS")
    assert(j.select("v").as[Double].collect().sorted.toSeq == Seq(1.0, 2.0))
  }
}
