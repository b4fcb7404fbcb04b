package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // parse once so both the master URL and the JSON artifact are validated
    // (an unquoted non-numeric value would emit invalid JSON)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table once so first-scan + codegen setup cost
    // is not attributed to whichever query happens to run first
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    // optional comma-separated query filter for load-controlled A/B runs
    // (SPARK_GRAFT_BENCH_QUERIES unset → the full contract bench)
    val wanted = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = wanted match {
      case Some(ws) => SparkEntry.queries.filter { case (n, _) => ws(n) }
      case None => SparkEntry.queries
    }
    // a throwing query must be VISIBLE in the bench JSON: its time is
    // reported as -1 and its name lands in "failed" (a swallowed catch
    // would disguise a broken query as a normal timing entry)
    val results = selected.toSeq.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // the stdout line gets scraped (and sometimes truncated) by harnesses —
    // also write the full record as a machine-readable artifact so bench
    // runs diff cleanly round over round
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_results.json")
    val cfg = s"""{"cpus":$cpus,"shuffle_partitions":$cpus,""" +
      s""""spark_version":"${spark.version}","n_queries":${results.size}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","config":$cfg,"failed":$failed,"queries":$qs}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
