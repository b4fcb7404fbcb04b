package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the engine's star-schema inputs.
  *
  * The reference loads CSV/Excel eagerly into pandas
  * (`/root/reference/src/data/loader.py:56-99,102-178`); here every table is
  * a lazy parquet scan so Catalyst can push filters/column pruning into the
  * file source — at 100 TB the scan must never read columns a query does not
  * use.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark's vectorized reader rejects. Read them as raw nanos and floor to
    * microseconds — exactly what DuckDB/pyarrow do when narrowing ns → µs —
    * so timestamps agree across engines.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    eventsRaw(spark, dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Every table of the star schema, in load order. */
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every table as a session temp view under its own name so
    * plain SQL text (`spark.sql("... FROM lineitem ...")`) runs against
    * the full schema — the "Spark SQL over registered tables" surface.
    * Idempotent; views stay lazy parquet scans, so SQL queries get the
    * same pushdown/pruning as the DataFrame API.
    */
  def registerViews(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
