package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated query-name filter (local iteration)
    val (sfDir, outDir, only) = args match {
      case Array(s, o) => (s, o, None)
      case Array(s, o, rest @ _*) =>
        (s, o, Some(rest.flatMap(_.split(",")).toSet))
      case _ => sys.error(
        "usage: graft.Verify <sfDir> <outDir> [queryName[,queryName...] ...]")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_CATALOG=<root>: attach the persistent derby metastore at
    // <root> and serve every table from the catalog (Tables.load hook) —
    // the oracle gate then exercises the metastore path end to end
    // shared engine configuration (EngineConf): Verify must run the SAME
    // codegen/session configs as the bench it vouches for
    val builder0 = EngineConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
    val spark = {
      graft.sources.CatalogTables.envRoot.fold(builder0) { root =>
        graft.sources.CatalogTables.hiveConfigs(root)
          .foldLeft(builder0) { case (b, (k, v)) => b.config(k, v) }
          .enableHiveSupport()
      }
    }
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // A failing query must be VISIBLE as a failure, not a missing row: it
    // gets an `_ERROR` marker inside its output dir (so a parquet read of
    // the dir errs rather than silently yielding nothing) and a line in
    // errors.json — round 6's denominator quietly shrank 181→108 because
    // failures wrote nothing at all.
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val d = new java.io.File(s"$outDir/$name")
        if (d.isFile) d.delete() // stale regular file would block mkdirs
        d.mkdirs()
        // wipe any stale parquet from a previous attempt so the marker
        // is the only content and the dir cannot read as a clean result.
        // listFiles is null when the path is not a listable directory —
        // the marker handler must never itself throw and kill the run
        Option(d.listFiles()).getOrElse(Array.empty)
          .foreach(f => if (f.isFile) f.delete())
        Files.writeString(Paths.get(s"$outDir/$name/_ERROR"),
          s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}")
        errors(name) = s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("")}"
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    Files.writeString(Paths.get(s"$outDir/errors.json"),
      errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
