package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the stream-stream join bench shape (q65/q108): runs the
  * same watermarked range join as `StreamingOps.streamStreamRangeJoin`
  * but keeps the query handle and prints per-micro-batch progress —
  * batch count, rows, and the duration breakdown (addBatch / getBatch /
  * walCommit / stateStore commit) — so a wall-clock drift can be
  * attributed to a mechanism instead of re-measured.
  *
  * Usage: runMain graft.tools.StreamJoinProbe <sfDir> [outer]
  */
object StreamJoinProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outer = args.length > 1 && args(1) == "outer"
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val noData = sys.env.getOrElse("PROBE_NODATA", "true")
    val parts = sys.env.getOrElse("PROBE_PARTS",
      cpus.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sfDir
    val fileName = "events.parquet"
    val schema = spark.read.parquet(s"$dir/$fileName").schema
    def stream() = graft.Tables.normalizeEventTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", fileName).parquet(dir))
    val l = stream().filter(col("event_type") === "purchase")
      .withWatermark("ts", "2 days")
    val rBase = stream().filter(col("event_type") === "click")
    val r = rBase.columns.foldLeft(rBase)(
        (d, c) => d.withColumnRenamed(c, c + "_r"))
      .withWatermark("ts_r", "2 days")
    val cond = col("user_id") === col("user_id_r") &&
      col("ts_r") <= col("ts") &&
      col("ts_r") >= col("ts") - expr("INTERVAL 86400 SECONDS")
    val joined = l.join(r, cond, if (outer) "leftOuter" else "inner")
    val t0 = System.nanoTime()
    val q = joined.writeStream.format("memory")
      .queryName("probe_sink").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"[probe] wall=$wall%.2fs outer=$outer batches=${q.recentProgress.length}")
    q.recentProgress.foreach { p =>
      val dur = p.durationMs
      println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} " +
        s"durationMs={${dur.entrySet().toArray.mkString(", ")}} " +
        s"state=${p.stateOperators.map(s =>
          s"rows=${s.numRowsTotal} mem=${s.memoryUsedBytes}").mkString(";")}")
    }
    spark.stop()
  }
}
