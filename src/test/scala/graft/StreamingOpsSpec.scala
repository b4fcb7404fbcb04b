package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.{StreamingOps, StreamSink}

/** Streaming queries must agree with their batch formulation — the same
  * contract the driver's oracle checks on the real tables, here on a
  * self-written fixture so the spec is hermetic.
  */
class StreamingOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_stream_spec").toString
    val df = Seq(
      ("2024-01-01 01:00:00", 1L, "a", 1.5),
      ("2024-01-01 02:00:00", 1L, "a", 2.5),
      ("2024-01-02 01:00:00", 2L, "b", 4.0),
      ("2024-01-03 01:00:00", 1L, "a", 8.0),
    ).toDF("ts_s", "user_id", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    df.coalesce(1).write.mode("overwrite").parquet(s"$d/fixture.parquet")
    d
  }

  test("RocksDB state store: q58/q131 match the default provider exactly") {
    val sf = "/root/testdata/sf0.001"
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val d58 = canon(SparkEntry.q58(spark, sf))
    val d131 = canon(SparkEntry.q131(spark, sf))
    val key = "spark.sql.streaming.stateStore.providerClass"
    val (r58, r131) = StreamingOps.withRocksDBStateStore(spark) { s =>
      assert(s.conf.get(key) == StreamingOps.RocksDBProvider)
      (canon(SparkEntry.q58(s, sf)), canon(SparkEntry.q131(s, sf)))
    }
    // the provider lives on a cloned session — the shared session's conf
    // is never touched (no restore step to race)
    assert(spark.conf.get(key) != StreamingOps.RocksDBProvider,
      "shared-session provider conf must be untouched")
    assert(r58.nonEmpty && r58 == d58)
    assert(r131.nonEmpty && r131 == d131)
  }

  test("streamingEwma: recurrence per key, id tiebreak, bit-exact fold") {
    val d = Files.createTempDirectory("graft_stream_ewma").toString
    Seq(
      ("2024-01-01 01:00:00", 1L, 1L, 1.0),
      ("2024-01-01 02:00:00", 1L, 2L, 2.0),
      // same timestamp: event_id 4 folds AFTER event_id 3
      ("2024-01-01 03:00:00", 1L, 3L, 4.0),
      ("2024-01-01 03:00:00", 1L, 4L, 8.0),
      ("2024-01-01 01:00:00", 2L, 5L, 10.0),
    ).toDF("ts_s", "user_id", "event_id", "value")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/ev.parquet")
    val out = StreamingOps.streamingEwma(spark, s"$d/ev.parquet", "*.parquet",
        alpha = 0.2, StreamSink.Memory(s"ewma_spec_${System.nanoTime()}"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // replicate the exact IEEE fold
    val y2 = 0.2 * 2.0 + 0.8 * 1.0
    val y3 = 0.2 * 4.0 + 0.8 * y2
    val y4 = 0.2 * 8.0 + 0.8 * y3
    assert(out(1L) == ((4L, y4)), out)
    assert(out(2L) == ((1L, 10.0)), out)
    graft.tools.FsUtils.deleteRecursively(java.nio.file.Paths.get(d))
  }

  test("windowedEventStats emits exactly the watermark-finalized windows") {
    // max ts = Jan 3 01:00, delay 1 day → watermark Jan 2 01:00: only the
    // Jan 1 window (end Jan 2 00:00) is finalized; Jan 2/3 stay in state
    val out = StreamingOps.windowedEventStats(spark, s"$dir/fixture.parquet",
      "*.parquet", "ts", "event_type", "value", "1 day", "1 day",
      StreamSink.Memory(s"spec_sink_${System.nanoTime()}"))
      .orderBy("window_start", "event_type")
      .collect()
    assert(out.length == 1)
    val day1 = out.head
    assert(day1.getAs[String]("event_type") == "a")
    assert(day1.getAs[Long]("n") == 2L)
    assert(day1.getAs[Double]("sum_value") == 4.0)
  }

  test("windowedEventStats with zero delay finalizes all complete windows") {
    val out = StreamingOps.windowedEventStats(spark, s"$dir/fixture.parquet",
      "*.parquet", "ts", "event_type", "value", "1 day", "0 seconds",
      StreamSink.Memory(s"spec_sink0_${System.nanoTime()}"))
      .orderBy("window_start", "event_type")
      .collect()
    // watermark = Jan 3 01:00 → Jan 1 and Jan 2 windows finalized,
    // Jan 3's window (end Jan 4) still open
    assert(out.map(_.getAs[java.sql.Date]("window_start").toString).toSeq ==
      Seq("2024-01-01", "2024-01-02"))
  }

  test("parquet sink with checkpoint produces the same rows as memory sink") {
    val mem = StreamingOps.windowedEventStats(spark, s"$dir/fixture.parquet",
      "*.parquet", "ts", "event_type", "value", "1 day", "0 seconds",
      StreamSink.Memory(s"spec_mem_${System.nanoTime()}"))
      .orderBy("window_start", "event_type").collect().toSeq
    val base = Files.createTempDirectory("graft_pq_sink").toString
    val pq = StreamingOps.windowedEventStats(spark, s"$dir/fixture.parquet",
      "*.parquet", "ts", "event_type", "value", "1 day", "0 seconds",
      StreamSink.Parquet(s"$base/out", s"$base/ckpt",
        s"spec_pq_${System.nanoTime()}"))
      .orderBy("window_start", "event_type").collect().toSeq
    assert(pq == mem)
    // the checkpoint exists — the exactly-once restart contract is real
    assert(new java.io.File(s"$base/ckpt").exists())
  }

  test("streamStreamRangeJoin equals the batch range self-join") {
    val out = StreamingOps.streamStreamRangeJoin(spark, s"$dir/fixture.parquet",
      "*.parquet", "user_id", "ts",
      col("event_type") === "a", col("event_type") === "a",
      rangeSeconds = 3600 * 24, "1 day",
      StreamSink.Memory(s"spec_ss_${System.nanoTime()}"))
      .select(col("ts"), col("ts_r"), col("value"), col("value_r"))
      .collect().map(_.toSeq).toSet
    val batch = {
      val e = spark.read.parquet(s"$dir/fixture.parquet")
        .filter(col("event_type") === "a")
      val r = e.columns.foldLeft(e)((d, c) => d.withColumnRenamed(c, c + "_r"))
      e.join(r, col("user_id") === col("user_id_r") &&
          col("ts_r") <= col("ts") &&
          col("ts_r") >= col("ts") - expr("INTERVAL 24 HOURS"))
        .select(col("ts"), col("ts_r"), col("value"), col("value_r"))
        .collect().map(_.toSeq).toSet
    }
    // self-pairs (ts = ts_r) prove the inclusive bound; the Jan 3 event
    // pairs only with itself (Jan 1 events are outside the 24 h range)
    assert(batch.nonEmpty)
    assert(out == batch)
  }

  test("streamStreamRangeJoinOuter: matured unmatched rows emit with nulls") {
    // fixture: user 1 'a' events act as left; 'b' (user 2, Jan 2) never has
    // a same-user right 'a' row → must surface as an unmatched null row
    // once matured. Delay 0 → watermark reaches max ts; all left rows with
    // ts < max ts are matured.
    val out = StreamingOps.streamStreamRangeJoinOuter(spark,
      s"$dir/fixture.parquet", "*.parquet", "user_id", "ts",
      col("event_type").isin("a", "b"), col("event_type") === "a",
      rangeSeconds = 3600 * 24, "0 seconds",
      StreamSink.Memory(s"spec_sso_${System.nanoTime()}"))
    val matured = out.filter(col("ts") < to_timestamp(lit("2024-01-03 01:00:00")))
      .select(col("user_id"), col("ts"), col("value_r"))
      .collect()
    // user 2's Jan 2 'b' row has no matching 'a' click → null right side
    val unmatched = matured.filter(_.getAs[Long]("user_id") == 2L)
    assert(unmatched.length == 1)
    assert(unmatched.head.isNullAt(2), "unmatched left row must carry nulls")
    // user 1's matured rows all match (self/same-day pairs)
    assert(matured.filter(_.getAs[Long]("user_id") == 1L)
      .forall(!_.isNullAt(2)))
  }

  test("materializeWindowedStats: replay converges, untouched partitions survive") {
    import org.apache.spark.sql.functions.col
    val d = "/root/testdata/sf0.001"
    val base = s"/tmp/graft_mat_spec_${System.nanoTime()}"
    val prep = (df: org.apache.spark.sql.DataFrame) =>
      Tables.normalizeEventTs(df)
    def run(ckpt: String) = StreamingOps.materializeWindowedStats(
        spark, d, "events.parquet", "ts", "event_type", "value",
        "1 day", "1 day", s"$base/table", s"$base/$ckpt", prep)
      .collect().map(_.toSeq).sortBy(_.toString)
    val first = run("ckpt1")
    assert(first.nonEmpty)
    // pre-seed an unrelated partition between runs: dynamic overwrite must
    // rewrite only the partitions the replay touches
    spark.createDataFrame(Seq(("seeded", 1L, 2.0)))
      .toDF("event_type", "n", "sum_value")
      .write.parquet(s"$base/table/window_start=1999-01-01")
    val second = run("ckpt2") // fresh checkpoint → full replay
    val seeded = second.filter(_.toString.contains("seeded"))
    assert(seeded.length == 1, "unrelated partition was clobbered")
    assert(second.filterNot(_.toString.contains("seeded")).toSeq ==
      first.toSeq, "replay did not converge to the same table")
  }

  test("compactLatestStream converges to the batch CDC compaction (q73 == q70)") {
    val d = "/root/testdata/sf0.001"
    val stream = SparkEntry.q73(spark, d).collect().toSeq
    val batch = SparkEntry.q70(spark, d).collect().toSeq
    assert(stream == batch)
  }

  test("streaming curation converges to the batch manifest (q184 == q160), multi-batch") {
    val d = "/root/testdata/sf0.001"
    val batch = SparkEntry.q160(spark, d).collect().toSeq
    // one-shot replay over the real table dir
    val oneShot = SparkEntry.q184(spark, d).collect().toSeq
    assert(oneShot == batch, "single-batch replay diverged from batch q160")
    // multi-batch: the same corpus split across 4 files, one file per
    // micro-batch — the scored store is a pure per-row function of the
    // rows, so the manifest must not depend on batch boundaries
    val base = s"/tmp/graft_cur_spec_${System.nanoTime()}"
    try {
      Tables.load(spark, d, "documents").repartition(4)
        .write.parquet(s"$base/docs")
      val store = StreamingOps.streamingCurationStore(
        spark, s"$base/docs", "*.parquet", s"$base/store", s"$base/ckpt",
        df => df, maxFilesPerTrigger = Some(1))
      // 4 single-file micro-batches all landed, no dup/dropped rows
      assert(store.count() == Tables.load(spark, d, "documents").count())
      assert(store.select("doc_id").distinct().count() == store.count())
      // the batch=<id> ingest layout must not leak into the store schema —
      // the read-back drops it so empty- and non-empty-source branches
      // return the identical scored schema
      assert(!store.columns.contains("batch"))
      assert(store.columns.sorted.toSeq ==
        Tables.load(spark, d, "documents").columns.sorted.toSeq)
    } finally {
      graft.tools.FsUtils.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }

  test("directory-shaped source (materialized table) streams the same rows as a file") {
    // production tables are Spark-written DIRECTORIES; the sf1 bench
    // exposed that a glob filter on the directory NAME can list zero part
    // files — fileStream must adapt on the physical shape
    val base = s"/tmp/graft_dirstream_${System.nanoTime()}"
    try {
      val ev = Tables.events(spark, "/root/testdata/sf0.001")
      ev.repartition(3).write.parquet(s"$base/events.parquet")
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.collect().map(_.toString).sorted.toSeq
      val viaDir = canon(StreamingOps.windowedEventStats(
        spark, base, "events.parquet", "ts", "event_type", "value",
        "1 day", "1 day",
        StreamSink.Memory(s"spec_dirshape_${System.nanoTime()}")))
      val viaFile = canon(StreamingOps.windowedEventStats(
        spark, "/root/testdata/sf0.001", "events.parquet", "ts",
        "event_type", "value", "1 day", "1 day",
        StreamSink.Memory(s"spec_fileshape_${System.nanoTime()}"),
        prepare = Tables.normalizeEventTs))
      assert(viaDir.nonEmpty, "directory-shaped source streamed zero rows")
      assert(viaDir == viaFile)
    } finally {
      graft.tools.FsUtils.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }

  test("materializeWindowedStats on an empty source returns an empty frame, not a crash") {
    val base = s"/tmp/graft_emptymat_${System.nanoTime()}"
    try {
      Tables.events(spark, "/root/testdata/sf0.001").limit(0)
        .coalesce(1).write.parquet(s"$base/events.parquet")
      val out = StreamingOps.materializeWindowedStats(
        spark, base, "events.parquet", "ts", "event_type", "value",
        "1 day", "1 day", s"$base/table", s"$base/ckpt")
      assert(out.count() == 0)
      assert(out.columns.toSeq ==
        Seq("window_start", "event_type", "n", "sum_value"))
    } finally {
      graft.tools.FsUtils.deleteRecursively(java.nio.file.Paths.get(base))
    }
  }

  test("streamStaticJoinStats joins the static dim and aggregates per key") {
    val static = Seq((1L, "gold")).toDF("dim_user", "tier")
    val out = StreamingOps.streamStaticJoinStats(spark, s"$dir/fixture.parquet",
      "*.parquet", static, "user_id", "dim_user", "ts", "value", "1 day",
      StreamSink.Memory(s"spec_join_sink_${System.nanoTime()}"))
      .collect()
    // only user 1 is in the dim: 3 events, sum 12.0
    assert(out.length == 1)
    assert(out.head.getAs[Long]("n") == 3L)
    assert(out.head.getAs[Double]("sum_value") == 12.0)
  }

  test("q213 streaming Bloom filter card equals the batch q206 exactly") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.q206(spark, dir).collect().map(_.toString).toSeq
    val stream = SparkEntry.q213(spark, dir).collect().map(_.toString).toSeq
    assert(batch == stream, s"batch=$batch\nstream=$stream")
  }

  test("streamingWelchTTest converges to the batch Welch report exactly") {
    val d = Files.createTempDirectory("graft_welch_stream").toString
    val rows = (1 to 40).map(i =>
      ("c", (i % 7).toDouble + 0.25)) ++
      (1 to 30).map(i => ("v", (i % 5).toDouble * 1.5)) ++
      Seq(("x", 99.0)) // a third group the filter must drop
    val df = rows.toDF("event_type", "value")
    df.coalesce(2).write.mode("overwrite").parquet(s"$d/ev.parquet")
    val batch = graft.operators.DriftOps.welchTTest(
      spark.read.parquet(s"$d/ev.parquet"), "value", "event_type",
      "c", "v").collect().toSeq
    val stream = StreamingOps.streamingWelchTTest(
      spark, d, "ev.parquet", "value", "event_type", "c", "v",
      StreamSink.Memory(s"spec_welch_${System.nanoTime()}"))
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(stream == batch, s"batch=$batch\nstream=$stream")
  }

  test("streamingCusumChangePoint converges to the batch report exactly") {
    val d = Files.createTempDirectory("graft_cusum_stream").toString
    val rows = (0 until 20).flatMap { day =>
      val level = if (day < 10) 2 else 5
      (0 until level).map(i =>
        (day.toLong * 86400000000L + i, 1.5 + (i % 3)))
    }
    val df = rows.toDF("us", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    df.coalesce(3).write.mode("overwrite").parquet(s"$d/ev.parquet")
    val batch = graft.operators.DriftOps.cusumChangePoint(
      spark.read.parquet(s"$d/ev.parquet"), "ts", "value")
      .collect().toSeq
    val stream = StreamingOps.streamingCusumChangePoint(
      spark, d, "ev.parquet", "ts", "value",
      StreamSink.Memory(s"spec_cusum_${System.nanoTime()}"))
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(stream == batch, s"batch=$batch\nstream=$stream")
  }

  test("streamingBhFdr converges to the batch report exactly") {
    val d = Files.createTempDirectory("graft_bhfdr_stream").toString
    val rows = (1 to 60).map(i => ("a", 50.0 + (i % 3))) ++
      (1 to 60).map(i => ("b", (i % 7).toDouble)) ++
      (1 to 60).map(i => ("c", ((i + 2) % 7).toDouble))
    val df = rows.toDF("event_type", "value")
    df.coalesce(3).write.mode("overwrite").parquet(s"$d/ev.parquet")
    val batch = graft.operators.DriftOps.bhFdrCard(
      spark.read.parquet(s"$d/ev.parquet"), "value", "event_type")
      .collect().toSeq
    val stream = StreamingOps.streamingBhFdr(
      spark, d, "ev.parquet", "value", "event_type", alpha = 0.05,
      StreamSink.Memory(s"spec_bhfdr_${System.nanoTime()}"))
      .collect().toSeq
    assert(batch.length == 3)
    assert(stream == batch, s"batch=$batch\nstream=$stream")
  }

  test("streamingDailyAcf converges to the batch card exactly") {
    val d = Files.createTempDirectory("graft_acf_stream").toString
    val rows = (0 until 14).flatMap { day =>
      (0 until (if (day % 2 == 0) 4 else 1)).map(i =>
        (day.toLong * 86400000000L + i, "e"))
    }
    val df = rows.toDF("us", "e")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    df.coalesce(2).write.mode("overwrite").parquet(s"$d/ev.parquet")
    val batch = graft.operators.TimeSeriesOps.dailyCountAcf(
      spark.read.parquet(s"$d/ev.parquet"), "ts", maxLag = 3)
      .collect().toSeq
    val stream = StreamingOps.streamingDailyAcf(
      spark, d, "ev.parquet", "ts", maxLag = 3,
      StreamSink.Memory(s"spec_acf_${System.nanoTime()}"))
      .collect().toSeq
    assert(batch.length == 3)
    assert(stream == batch, s"batch=$batch\nstream=$stream")
  }
}
