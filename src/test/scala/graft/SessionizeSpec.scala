package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingOps, StreamSink}

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("dedupStream drops in-watermark duplicate keys, keeps distinct ones") {
    val d = Files.createTempDirectory("graft_dedup_stream").toString
    val df = Seq(
      ("2024-01-01 00:00:00", 1L, "a"),
      ("2024-01-01 00:10:00", 1L, "a"), // duplicate key within watermark
      ("2024-01-01 00:20:00", 2L, "b"),
      ("2024-01-01 00:30:00", 1L, "c"), // same user, different payload key
    ).toDF("ts_s", "user_id", "payload")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/ev.parquet")

    val out = StreamingOps.dedupStream(spark, s"$d/ev.parquet", "*.parquet",
      Seq("user_id", "payload"), "ts", "1 hour",
      StreamSink.Memory(s"dedup_sink_${System.nanoTime()}"))
      .select("user_id", "payload").as[(Long, String)].collect().sorted
    assert(out.toSeq == Seq((1L, "a"), (1L, "c"), (2L, "b")))
  }

  test("sessionize splits on gap, aggregates per session") {
    val d = Files.createTempDirectory("graft_session_spec").toString
    // user 1: events at 0min, 5min (one session), 120min (second session),
    // then a far-future sentinel closes the trailing session in-batch.
    val df = Seq(
      ("2024-01-01 00:00:00", 1L, 1.0),
      ("2024-01-01 00:05:00", 1L, 2.0),
      ("2024-01-01 02:00:00", 1L, 4.0),
      ("2024-03-01 00:00:00", 1L, 0.0), // sentinel
      ("2024-03-01 00:00:00", 2L, 0.0), // sentinel
      ("2024-01-01 00:00:00", 2L, 8.0),
    ).toDF("ts_s", "user_id", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/ev.parquet")

    val out = StreamingOps.sessionize(spark, s"$d/ev.parquet", "*.parquet",
      gapSeconds = 1800, watermark = "0 seconds",
      StreamSink.Memory(s"session_sink_${System.nanoTime()}"))
      .orderBy("user_id", "session_start")
      .collect()

    // closed sessions: u1 [00:00,00:05] n=2 sum=3; u1 [02:00] n=1 sum=4;
    // u2 [00:00] n=1 sum=8 (sentinels stay open in state)
    assert(out.length == 3)
    assert(out(0).getAs[Long]("user_id") == 1L)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(0).getAs[Double]("sum_value") == 3.0)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(1).getAs[Double]("sum_value") == 4.0)
    assert(out(2).getAs[Long]("user_id") == 2L)
    assert(out(2).getAs[Double]("sum_value") == 8.0)
  }
}
