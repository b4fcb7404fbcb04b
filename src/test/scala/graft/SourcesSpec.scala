package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.Sources

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft_sources_spec").toString
    val hz = (1 to 16).map(_ => "0.1").mkString(",")
    Files.writeString(Paths.get(s"$d/d1.csv"),
      s"""published_at,tag_number,temperature,humidity,hive_power,audio_density,audio_density_ratio,density_variation,${(1 to 16).map(i => s"hz_$i").mkString(",")}
         |2020-06-01T00:00:00.000Z,202056,34.5,60.2,1.5,0.3,0.4,0.1,$hz
         |2020-06-01T00:15:00.000Z,202056,oops,61.0,1.6,0.3,0.4,0.1,$hz
         |""".stripMargin)
    Files.writeString(Paths.get(s"$d/d2.csv"),
      s"""published_at,tag_number,temperature,humidity,hive_power,audio_density,audio_density_ratio,density_variation,${(1 to 16).map(i => s"hz_$i").mkString(",")}
         |2020-07-01T00:00:00.000Z,202057,30.0,55.0,1.2,0.2,0.3,0.1,$hz
         |""".stripMargin)
    d
  }

  test("normalizeEventTs: identical wall-clock from nanos-long, NTZ, and TZ inputs") {
    import org.apache.spark.sql.types._
    // 2024-03-01 12:34:56.789012 UTC, expressed three ways
    val micros = 1709296496789012L
    val nanos = micros * 1000L + 345L // sub-µs residue must floor away
    val asLong = Seq(nanos).toDF("ts") // the old TIMESTAMP(NANOS) shape
    val rLong = Tables.normalizeEventTs(asLong).head().getTimestamp(0)
    val asTz = Seq(new java.sql.Timestamp(micros / 1000)).toDF("ts")
      .withColumn("ts", timestamp_micros(lit(micros)))
    val rTz = Tables.normalizeEventTs(asTz).head().getTimestamp(0)
    val asNtz = asTz.withColumn("ts", col("ts").cast(TimestampNTZType))
    assert(asNtz.schema("ts").dataType == TimestampNTZType)
    val norm = Tables.normalizeEventTs(asNtz)
    assert(norm.schema("ts").dataType == TimestampType,
      "NTZ must normalize to session-TZ timestamp")
    val rNtz = norm.head().getTimestamp(0)
    assert(rLong == rTz && rTz == rNtz,
      s"decodes disagree: long=$rLong tz=$rTz ntz=$rNtz")
    // frames without a ts column pass through untouched
    val other = Seq((1L, "x")).toDF("id", "name")
    assert(Tables.normalizeEventTs(other).collect().toSeq ==
      other.collect().toSeq)
  }

  test("readSensorCsv: explicit schema, renames, period tag, malformed→null") {
    val df = Sources.readSensorCsv(spark, s"$dir/d1.csv", "D1")
    assert(df.columns.contains("timestamp") && df.columns.contains("hive_id"))
    assert(!df.columns.contains("published_at"))
    assert(df.schema("temperature").dataType.typeName == "double")
    val rows = df.orderBy("timestamp").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[Double]("temperature") == 34.5)
    // "oops" is not a double → PERMISSIVE nulls it (the _safe_float path)
    assert(rows(1).isNullAt(rows(1).fieldIndex("temperature")))
    assert(rows.forall(_.getAs[String]("period") == "D1"))
  }

  test("readSensorPeriods unions both periods by name") {
    val df = Sources.readSensorPeriods(spark, s"$dir/d1.csv", s"$dir/d2.csv")
    val periods = df.groupBy("period").count().as[(String, Long)].collect().toMap
    assert(periods == Map("D1" -> 2L, "D2" -> 1L))
  }

  test("writeJson round-trips") {
    val out = s"$dir/json_out"
    Sources.writeJson(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), out)
    val back = spark.read.json(out)
    assert(back.count() == 2)
  }

  test("ORC sink round-trips schema and data exactly") {
    val out = s"$dir/orc_out"
    val df = Seq((1L, "a", 2.5), (2L, "b", -0.5)).toDF("id", "v", "x")
    Sources.writeOrc(df, out)
    val back = Sources.readOrc(spark, out)
    // file sources re-read as nullable — compare names and types
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("numericFeatureColumns reflects schema, honors exclude set") {
    val df = Seq((1L, "x", 2.5, 3)).toDF("id", "name", "temp", "cnt")
    assert(Sources.numericFeatureColumns(df, Set("id")) == Seq("temp", "cnt"))
  }
}
