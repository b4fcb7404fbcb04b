package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface (SURVEY §2.11). The reference is strictly
  * batch, but its sensor table is naturally a stream; the engine exposes the
  * windowed-stats operators over `readStream` with event-time windows and
  * watermarks. At scale this is the standard continuous-ingest path: state
  * is bounded by the watermark, aggregation is keyed by (window, key) so it
  * shards across executors, and `availableNow` gives exactly-once catch-up
  * batch replays of the same code path.
  */
object StreamingOps {

  /** Tumbling event-time window aggregation over a parquet directory read as
    * a stream, executed to completion with `Trigger.AvailableNow` and a
    * memory sink, then returned as a finite DataFrame. Semantically
    * identical to the batch `groupBy(date_trunc(...))` — the driver's
    * oracle checks exactly that equivalence.
    */
  /** File-source streams need a directory; `fileName` narrows the scan to
    * one table's parquet via pathGlobFilter.
    */
  private def fileStream(spark: SparkSession, dir: String,
      fileName: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/$fileName").schema
    spark.readStream.schema(schema)
      .option("pathGlobFilter", fileName)
      .parquet(dir)
  }

  def windowedEventStats(spark: SparkSession, dir: String, fileName: String,
      tsCol: String, keyCol: String, valueCol: String,
      window: String, watermark: String, queryName: String,
      prepare: DataFrame => DataFrame = identity): DataFrame = {
    val stream = prepare(fileStream(spark, dir, fileName))
    val agged = stream
      .withWatermark(tsCol, watermark)
      .groupBy(org.apache.spark.sql.functions.window(col(tsCol), window),
        col(keyCol))
      .agg(
        count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,4)")).as("sum_dec"))
    val q = agged.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .select(
        col("window.start").cast("date").as("window_start"),
        col(keyCol),
        col("n"),
        col("sum_dec").cast("double").as("sum_value"))
  }

  /** Stream-static broadcast join + windowed aggregation: the streaming side
    * joins a small static dimension (reference J2 as a stream-static join —
    * annotations are static, sensor readings stream). The static side is
    * broadcast so the stream never shuffles before aggregation.
    */
  def streamStaticJoinStats(spark: SparkSession, dir: String, fileName: String,
      static: DataFrame, streamKey: String, staticKey: String,
      tsCol: String, valueCol: String, watermark: String,
      queryName: String, prepare: DataFrame => DataFrame = identity): DataFrame = {
    val stream = prepare(fileStream(spark, dir, fileName))
    val joined = stream
      .withWatermark(tsCol, watermark)
      .join(broadcast(static), col(streamKey) === static(staticKey))
    val agged = joined
      .groupBy(col(staticKey))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(28,4)")).as("sum_dec"))
    val q = agged.writeStream
      .format("memory").queryName(queryName)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
      .select(col(staticKey), col("n"),
        col("sum_dec").cast("double").as("sum_value"))
  }
}
