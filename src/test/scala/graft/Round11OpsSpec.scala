package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.metrics.MetricQueries
import graft.operators.{CdcOps, DriftOps}

/** Round-11 additions: binary-classifier card, Mood's median test,
  * SCD type-2 history build.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- q337 MCC card

  test("binaryClassifierCard matches hand-computed 2x2 scores") {
    // tp=2 fp=1 fn=1 tn=4: PPV=TPR=2/3, TNR=NPV=4/5
    val d = Seq((1, 1), (1, 1), (0, 1), (1, 0),
      (0, 0), (0, 0), (0, 0), (0, 0)).toDF("label", "pred")
    val r = MetricQueries.binaryClassifierCard(d, "label", "pred")
      .select("tp", "fp", "fn", "tn", "mcc", "fowlkes_mallows",
        "youden_j", "markedness")
      .as[(Long, Long, Long, Long, Double, Double, Double, Double)].head()
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r._1 == 2L && r._2 == 1L && r._3 == 1L && r._4 == 4L)
    assert(r._5 == r6((2.0 * 4 - 1.0) / math.sqrt(3.0 * 3 * 5 * 5)))
    assert(r._6 == r6(math.sqrt(2.0 / 3 * (2.0 / 3))))
    assert(r._7 == r6(2.0 / 3 + 4.0 / 5 - 1))
    assert(r._8 == r6(2.0 / 3 + 4.0 / 5 - 1))
  }

  test("binaryClassifierCard nulls MCC on a single-class degenerate input") {
    val d = Seq((1, 1), (1, 1), (1, 0)).toDF("label", "pred")
    val r = MetricQueries.binaryClassifierCard(d, "label", "pred")
    val row = r.select("mcc", "youden_j", "fowlkes_mallows").head()
    assert(row.isNullAt(0)) // (tn+fp) = 0 kills the MCC denominator
    assert(row.isNullAt(1)) // ... and Youden needs TNR
    assert(!row.isNullAt(2)) // FM only needs the positive margins
  }

  // ------------------------------------------------- q338 Mood's median

  test("moodsMedianTest: clean separation gives chi2 = N") {
    // g1 all below, g2 all above the pooled median (4+6)/2 = 5
    val d = (Seq(1, 2, 3, 4).map(("g1", _)) ++
      Seq(6, 7, 8, 9).map(("g2", _))).toDF("g", "v")
    val r = DriftOps.moodsMedianTest(d, "v", "g")
      .select("g", "n_above", "n_below", "e_above", "pooled_median",
        "chi2", "df")
      .as[(String, Long, Long, Double, Double, Double, Long)]
      .collect().toSeq
    assert(r == Seq(("g1", 0L, 4L, 2.0, 5.0, 8.0, 1L),
      ("g2", 4L, 0L, 2.0, 5.0, 8.0, 1L)))
  }

  test("moodsMedianTest drops values at the pooled median") {
    // 5 fives sit AT the pooled median and vanish; survivors:
    // a -> {1,2,8} (1 above, 2 below), b -> {3,9} (1 above, 1 below)
    val d = (Seq(1, 2, 5, 5, 8).map(("a", _)) ++
      Seq(3, 5, 5, 5, 9).map(("b", _))).toDF("g", "v")
    val r = DriftOps.moodsMedianTest(d, "v", "g")
      .select("g", "n_above", "n_below", "e_above", "pooled_median",
        "chi2")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    assert(r == Seq(("a", 1L, 2L, 1.2, 5.0, 0.138889),
      ("b", 1L, 1L, 0.8, 5.0, 0.138889)))
  }

  // --------------------------------------------------- q339 SCD type-2

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  test("scdType2 builds validity intervals and collapses same-value runs") {
    val d = Seq(
      (1L, ts(1), 10L, "A"), (1L, ts(2), 11L, "A"),
      (1L, ts(3), 12L, "B"), (1L, ts(4), 13L, "A"),
      (2L, ts(5), 14L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = CdcOps.scdType2(d, "user_id", "ts", "event_id", "event_type")
      .orderBy("user_id", "version")
      .select("user_id", "event_type", "valid_from", "valid_to",
        "is_current", "version")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean, Long)]
      .collect().toSeq
    assert(r == Seq(
      (1L, "A", ts(1), Some(ts(3)), false, 1L),
      (1L, "B", ts(3), Some(ts(4)), false, 2L),
      (1L, "A", ts(4), None, true, 3L),
      (2L, "C", ts(5), None, true, 1L)))
  }

  test("scdType2 treats null attribute values as a tracked run") {
    val d = Seq(
      (1L, ts(1), 1L, None: Option[String]),
      (1L, ts(2), 2L, None),
      (1L, ts(3), 3L, Some("A")))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r = CdcOps.scdType2(d, "user_id", "ts", "event_id", "event_type")
      .orderBy("version")
      .select("event_type", "version", "is_current")
      .as[(Option[String], Long, Boolean)].collect().toSeq
    assert(r == Seq((None, 1L, false), (Some("A"), 2L, true)))
  }
}
