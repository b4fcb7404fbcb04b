package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Diagnostic: per-execution QueryPlanningTracker phase split (analysis /
  * optimization / physical planning) plus wall, for every action a named
  * query runs — isolates driver-side plan cost for the iterative trainers
  * (q425-class), which QueryProfile's build/plan/exec split cannot see
  * inside `fn`. Not part of the driver contract.
  *
  * Usage: runMain graft.tools.PhaseProbe <sfDir> q1[,q2...] [repeat]
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val wanted = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val spark = graft.EngineConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    sys.env.get("SPARK_GRAFT_PROFILE_CONF").foreach(_.split(";")
      .map(_.trim).filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k, v)
      })
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = {
        val ph = qe.tracker.phases.toSeq.sortBy(_._1)
          .map { case (k, v) => f"$k=${v.endTimeMs - v.startTimeMs}ms" }
          .mkString(" ")
        println(f"[phase] $funcName wall=${durationNs / 1e6}%.0fms $ph " +
          f"nodes=${qe.executedPlan.collect { case p => p }.size}")
      }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })
    wanted.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case None => System.err.println(s"[phase] unknown query: $name")
        case Some(fn) =>
          (1 to repeat).foreach { pass =>
            val t0 = System.nanoTime()
            val df = fn(spark, sfDir)
            val t1 = System.nanoTime()
            df.count()
            val t2 = System.nanoTime()
            println(f"[phase] == $name pass=$pass build=${(t1 - t0) / 1e9}%.3f" +
              f" exec=${(t2 - t1) / 1e9}%.3f")
          }
      }
    }
    spark.stop()
  }
}
