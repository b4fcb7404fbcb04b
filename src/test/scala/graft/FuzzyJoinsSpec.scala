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

  test("intervalJoinBucketed equals intervalJoin for any bucket width") {
    val rnd = new scala.util.Random(11)
    val fact = Seq.fill(400)((rnd.nextInt(5).toLong,
      ts(f"2024-01-${1 + rnd.nextInt(20)}%02d ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"),
      rnd.nextDouble())).toDF("k", "ts", "v")
    val anchors = Seq.fill(30)((rnd.nextInt(5).toLong,
      ts(f"2024-01-${1 + rnd.nextInt(20)}%02d ${rnd.nextInt(24)}%02d:00:00")))
      .toDF("ak", "ats")
    val dayMicros = 86400000000L
    val broadcastPath = FuzzyJoins.intervalJoin(fact, anchors, "k", "ak",
        "ts", "ats", "2 DAYS", "1 DAY")
      .select("k", "ts", "v", "ak", "ats").collect().toSet
    // bucket widths smaller than, equal to, and larger than the window
    for (b <- Seq(dayMicros / 4, dayMicros, 3 * dayMicros)) {
      val bucketed = FuzzyJoins.intervalJoinBucketed(fact, anchors, "k", "ak",
          "ts", "ats", beforeMicros = 2 * dayMicros, afterMicros = dayMicros,
          bucketMicros = b)
        .select("k", "ts", "v", "ak", "ats").collect().toSet
      assert(bucketed == broadcastPath, s"bucket=$b")
    }
  }

  test("asofJoin carries the latest right payload at or before each left ts") {
    val left = Seq(
      (1L, ts("2024-01-05 00:00:00"), 100L), // after r2 → picks r2
      (1L, ts("2024-01-02 00:00:00"), 101L), // exact tie with r1 → picks r1
      (1L, ts("2024-01-01 00:00:00"), 102L), // before all right rows → null
      (2L, ts("2024-01-09 00:00:00"), 103L), // other key → only r3 visible
      (3L, ts("2024-01-09 00:00:00"), 104L), // key with no right rows → null
    ).toDF("k", "ts", "left_id")
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), 7.0),  // r1
      (1L, ts("2024-01-04 00:00:00"), 8.0),  // r2
      (2L, ts("2024-01-03 00:00:00"), 9.0),  // r3
    ).toDF("k", "ts", "payload")
    val out = FuzzyJoins.asofJoin(left, right, Seq("k"), "ts", Seq("payload"))
      .orderBy("left_id")
      .select("left_id", "payload")
      .as[(Long, Option[Double])].collect().toSeq
    assert(out == Seq(
      100L -> Some(8.0), 101L -> Some(7.0), 102L -> None,
      103L -> Some(9.0), 104L -> None))
    // left-outer semantics: every left row survives exactly once
    assert(FuzzyJoins.asofJoin(left, right, Seq("k"), "ts", Seq("payload"))
      .count() == left.count())
  }

  test("asofJoin payload is row-atomic: null fields of the matched row stay null") {
    val left = Seq((1L, ts("2024-01-05 00:00:00"), 100L))
      .toDF("k", "ts", "left_id")
    // the MATCHED right row (01-04) holds a null v; an older row (01-02)
    // holds a real v — per-column carry would wrongly mix 7.0 into the match
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), Some(7.0), "a"),
      (1L, ts("2024-01-04 00:00:00"), None: Option[Double], "b"),
    ).toDF("k", "ts", "v", "tag")
    for (out <- Seq(
        FuzzyJoins.asofJoin(left, right, Seq("k"), "ts", Seq("v", "tag")),
        FuzzyJoins.asofJoinBucketed(left, right, Seq("k"), "ts",
          Seq("v", "tag"), 86400L * 1000000))) {
      val r = out.select("v", "tag").collect()
      assert(r.length == 1)
      assert(r.head.isNullAt(0),
        "null field of the matched right row must not backfill from an older row")
      assert(r.head.getString(1) == "b")
    }
  }

  test("asofJoin rightTieBreak: tied right rows resolve to the arg_max row") {
    val left = Seq((1L, ts("2024-01-05 00:00:00"), 100L))
      .toDF("k", "ts", "left_id")
    // three clicks at the SAME instant — without a tiebreak the winner is
    // arbitrary; with rightTieBreak=id the max-id row must win atomically
    val right = Seq(
      (1L, ts("2024-01-02 00:00:00"), 11L, "low"),
      (1L, ts("2024-01-02 00:00:00"), 33L, "high"),
      (1L, ts("2024-01-02 00:00:00"), 22L, "mid"),
    ).toDF("k", "ts", "rid", "tag")
    for (out <- Seq(
        FuzzyJoins.asofJoin(left, right, Seq("k"), "ts",
          Seq("rid", "tag"), rightTieBreak = Seq("rid")),
        FuzzyJoins.asofJoinBucketed(left, right, Seq("k"), "ts",
          Seq("rid", "tag"), 86400L * 1000000, rightTieBreak = Seq("rid")))) {
      val r = out.select("rid", "tag").collect()
      assert(r.length == 1)
      assert(r.head.getLong(0) == 33L && r.head.getString(1) == "high")
    }
  }

  test("asofJoin and asofJoinBucketed keep all left rows on an empty right side") {
    val left = Seq((1L, ts("2024-01-05 00:00:00"), 100L))
      .toDF("k", "ts", "left_id")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("k", "ts", "payload")
    for (out <- Seq(
        FuzzyJoins.asofJoin(left, right, Seq("k"), "ts", Seq("payload")),
        FuzzyJoins.asofJoinBucketed(left, right, Seq("k"), "ts",
          Seq("payload"), 86400L * 1000000))) {
      val rows = out.select("left_id", "payload").collect()
      assert(rows.map(_.getLong(0)).toSeq == Seq(100L))
      assert(rows.forall(_.isNullAt(1)))
    }
  }

  test("asofJoinBucketed equals asofJoin for any bucket width (real events)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    def sorted(d: org.apache.spark.sql.DataFrame) =
      d.select("event_id", "click_id", "click_value").orderBy("event_id")
        .collect().toSeq
    val plain = sorted(FuzzyJoins.asofJoin(
      purchases, clicks, Seq("user_id"), "ts", Seq("click_id", "click_value")))
    assert(plain.nonEmpty)
    // hour-wide buckets (many empty gaps to carry across) and week-wide
    // buckets (many rows per bucket) must both reproduce the plain result
    for (micros <- Seq(3600L * 1000000, 7L * 86400 * 1000000)) {
      val bucketed = sorted(FuzzyJoins.asofJoinBucketed(
        purchases, clicks, Seq("user_id"), "ts",
        Seq("click_id", "click_value"), micros))
      assert(bucketed == plain, s"bucket width $micros diverges")
    }
  }
}
