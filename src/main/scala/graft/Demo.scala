package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ml.MlPipelines
import graft.pipelines.HivePipelines
import graft.sources.Sources

/** End-to-end demo of the reference's §3.1 training query through the
  * public API: sensor CSVs → fuzzy/interval alignment → window feature
  * matrix → leakage-safe split → scaled logistic regression → metrics.
  * Generates an MSPB-shaped synthetic fixture under /tmp (the real MSPB
  * data is not shipped) and prints the resulting metrics row.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // --- fixture: 12 hives × 40 days × 4 readings/hour-ish cadence
    val dir = Files.createTempDirectory("graft_demo").toString
    val header = ("published_at,tag_number,temperature,humidity,hive_power," +
      "audio_density,audio_density_ratio,density_variation," +
      (1 to 16).map(i => s"hz_$i").mkString(","))
    def csv(period: String, hives: Seq[Long]): String = {
      val rows = for {
        h <- hives
        day <- 0 until 40
        slot <- 0 until 6
      } yield {
        val t = f"2020-${5 + day / 30}%02d-${1 + day % 30}%02d ${slot * 4}%02d:00:00"
        val base = 20.0 + (h % 7) + 3.0 * math.sin(day / 5.0 + slot)
        val vals = Seq(base, 50 + base / 2, 1.0 + (h % 3) * 0.5,
          0.3 + 0.01 * slot, 0.4, 0.1) ++
          (1 to 16).map(i => 0.05 * ((h + i + day) % 11))
        s"$t,$h," + vals.map(v => f"$v%.4f").mkString(",")
      }
      val p = s"$dir/$period.csv"
      Files.writeString(Paths.get(p), (header +: rows).mkString("\n"))
      p
    }
    val d1 = csv("d1", (0 until 6).map(i => 202050L + i))
    val d2 = csv("d2", (6 until 12).map(i => 202050L + i))

    val annots = (0 until 12).flatMap { i =>
      Seq(6, 20).map(day =>
        (2050L + i, java.sql.Timestamp.valueOf(f"2020-05-$day%02d 00:00:00"),
          if (i % 3 == 0) 12.0 else 28.0))
    }.toDF("hive_id", "date", "frames_of_bees")

    // --- the §3.1 plan through the public API
    val sensor = Sources.readSensorPeriods(spark, d1, d2)
    // fixture cadence is 6 readings/day (vs the reference's ~96), so the
    // coverage floor scales down accordingly
    val features = HivePipelines.populationFeatures(sensor, annots,
      minCoverage = 0.01)
    println(s"[demo] feature matrix: ${features.count()} rows x " +
      s"${features.columns.length} cols")

    val featCols = Sources.numericFeatureColumns(features,
      exclude = Set("hive_id", "frames_of_bees", "population_class"))
    val filled = features.na.fill(0.0, featCols)
    val metrics = MlPipelines.classifyAndEvaluate(filled, "hive_id",
      featCols, "population_class")
    metrics.show(truncate = false)
    spark.stop()
  }
}
