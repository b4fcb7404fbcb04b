package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File sources/sinks beyond parquet (SURVEY §2.1).
  *
  * The reference reads its sensor CSVs with inferred schemas and eager
  * parsing (`/root/reference/src/data/loader.py:56-99`); here the schema is
  * explicit — at 100 TB schema inference is a full extra scan, and a fixed
  * `StructType` turns the CSV read into a streaming single pass with
  * malformed rows quarantined instead of crashing the job.
  */
object Sources {

  /** The reference's 22-feature sensor schema (loader.py:24-53), explicit. */
  val sensorSchema: StructType = StructType(
    Seq(StructField("published_at", TimestampType, nullable = true),
      StructField("tag_number", LongType, nullable = true),
      StructField("temperature", DoubleType, nullable = true),
      StructField("humidity", DoubleType, nullable = true),
      StructField("hive_power", DoubleType, nullable = true),
      StructField("audio_density", DoubleType, nullable = true),
      StructField("audio_density_ratio", DoubleType, nullable = true),
      StructField("density_variation", DoubleType, nullable = true)) ++
      (1 to 16).map(i => StructField(s"hz_$i", DoubleType, nullable = true)))

  /** CSV scan with explicit schema + literal period tag + standardized
    * column names (reference S1/S2/P1: parse_dates, period literal,
    * published_at→timestamp / tag_number→hive_id renames). PERMISSIVE mode
    * nulls malformed cells — the `_safe_float` semantics (loader.py:327-334)
    * — instead of failing the scan.
    */
  def readSensorCsv(spark: SparkSession, path: String, period: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .schema(sensorSchema)
      .csv(path)
      .withColumn("period", lit(period))
      .withColumnRenamed("published_at", "timestamp")
      .withColumnRenamed("tag_number", "hive_id")

  /** Two-period union (reference J5: `pd.concat([d1, d2])`, loader.py:91). */
  def readSensorPeriods(spark: SparkSession, d1Path: String,
      d2Path: String): DataFrame =
    readSensorCsv(spark, d1Path, "D1")
      .unionByName(readSensorCsv(spark, d2Path, "D2"))

  /** JSON sink (reference S6: results/config dumps, train.py:277-296). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC round-trip (S7 binary-sink family): the columnar alternative to
    * parquet for interchange with ORC-native warehouses. Spark's built-in
    * vectorized ORC reader keeps pushdown/pruning parity with parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Numeric feature auto-detection by schema reflection (reference
    * P9/M3: select numeric dtypes minus an exclude set —
    * `/root/reference/src/data/preprocessing.py:483-511`). Pure driver-side
    * metadata work: no data scan, unlike the reference's dtype probing.
    */
  def numericFeatureColumns(df: DataFrame, exclude: Set[String]): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] && !exclude(f.name) => f.name
    }.toSeq
}
