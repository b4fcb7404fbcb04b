package graft.tools

import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Per-query phase profiler for the optimization rounds (guide §1:
  * measure first). For each named query it separates
  *   build   — the `fn(spark, sfDir)` call (eager work inside the query:
  *             persists, MLlib fits, driver folds),
  *   plan    — forcing `queryExecution.executedPlan` (analysis +
  *             optimization + physical planning of the RETURNED frame),
  *   exec    — the same `.count()` action the contract bench times,
  * and writes `explain("formatted")` to `<outDir>/<query>.txt` so plan
  * claims in OPTIMIZATION_rN.md are auditable. Not part of the driver
  * contract; timings here are diagnostic (single pass, warm tables).
  *
  * Usage: runMain graft.tools.QueryProfile <sfDir> <outDir> q1,q2,...
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val wanted = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val spark = graft.EngineConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // diagnostic conf overrides, e.g. "spark.sql.codegen.wholeStage=false"
    // (';'-separated) — for isolating codegen/planning cost, never for the
    // contract bench
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    // same table warm-up as Bench so exec timings are disk-cache-warm
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      try {
        val df = graft.Tables.load(spark, sfDir, t)
        df.select(org.apache.spark.sql.functions.xxhash64(
            df.columns.map(org.apache.spark.sql.functions.col): _*).as("h"))
          .agg(org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.col("h"))).head()
        ()
      } catch { case NonFatal(_) => () }
    }
    val repeat = sys.env.get("SPARK_GRAFT_PROFILE_REPEAT")
      .map(_.trim.toInt).getOrElse(1)
    // task-level accounting: jobs/stages/tasks, summed task run time and
    // deserialize time — splits "driver overhead" from "executor work"
    val nJobs = new java.util.concurrent.atomic.AtomicLong
    val nStages = new java.util.concurrent.atomic.AtomicLong
    val nTasks = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val deserMs = new java.util.concurrent.atomic.AtomicLong
    val resultMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          nJobs.incrementAndGet(); ()
        }
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          nStages.incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          nTasks.incrementAndGet()
          val m = t.taskMetrics
          if (m != null) {
            taskMs.addAndGet(m.executorRunTime)
            deserMs.addAndGet(m.executorDeserializeTime)
            resultMs.addAndGet(m.resultSerializationTime)
          }
          ()
        }
      })
    wanted.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[profile] unknown query: $name")
        case Some(fn) =>
          (1 to repeat).foreach { pass =>
            spark.sparkContext.setJobDescription(s"profile:$name")
            try {
              spark.catalog.clearCache()
              val t0 = System.nanoTime()
              val df = fn(spark, sfDir)
              val t1 = System.nanoTime()
              df.queryExecution.executedPlan
              val t2 = System.nanoTime()
              df.count()
              val t3 = System.nanoTime()
              if (pass == 1) {
                val plan = df.queryExecution.explainString(
                  org.apache.spark.sql.execution.FormattedMode)
                java.nio.file.Files.write(
                  java.nio.file.Paths.get(s"$outDir/$name.txt"),
                  plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
              }
              println(f"[profile] $name pass=$pass " +
                f"build=${(t1 - t0) / 1e9}%.3f plan=${(t2 - t1) / 1e9}%.3f " +
                f"exec=${(t3 - t2) / 1e9}%.3f total=${(t3 - t0) / 1e9}%.3f " +
                f"jobs=${nJobs.getAndSet(0)} stages=${nStages.getAndSet(0)} " +
                f"tasks=${nTasks.getAndSet(0)} taskMs=${taskMs.getAndSet(0)} " +
                f"deserMs=${deserMs.getAndSet(0)} resSerMs=${resultMs.getAndSet(0)}")
            } catch { case NonFatal(e) =>
              System.err.println(s"[profile] $name failed: ${e.getMessage}")
            }
          }
      }
    }
    spark.stop()
  }
}
