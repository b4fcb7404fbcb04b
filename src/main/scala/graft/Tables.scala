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

  /** The events table has shipped with two parquet physical types for `ts`
    * across testdata generations: TIMESTAMP(NANOS) — which Spark's
    * vectorized reader rejects, so we read it as raw BIGINT nanos under
    * `nanosAsLong` — and TIMESTAMP(MICROS), which Spark 4 reads as
    * TIMESTAMP_NTZ. Keeping the legacy conf on is harmless for the µs
    * format; [[normalizeEventTs]] then adapts on the *decoded* schema.
    */
  private def eventsRaw(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
  }

  /** Normalize the `ts` column to session-TZ TIMESTAMP regardless of the
    * physical type the parquet carried:
    *
    *   - `BIGINT` (nanos read under `nanosAsLong`) → floor-divide to µs,
    *     exactly what DuckDB/pyarrow do when narrowing ns → µs;
    *   - `TIMESTAMP_NTZ` (µs-typed parquet) → cast to TIMESTAMP —
    *     value-preserving under the UTC session TZ every entrypoint sets,
    *     and DuckDB's `epoch_us` reads the same wall-clock, so oracle
    *     parity holds;
    *   - already TIMESTAMP (or anything else) → pass through.
    *
    * One shared decode site: a testdata-format shift must never again be a
    * 12-file fix.
    */
  def normalizeEventTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    df.schema.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(_: TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeEventTs(eventsRaw(spark, dir))
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
