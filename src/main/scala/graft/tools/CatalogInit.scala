package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.CatalogTables

/** Build (or re-attach to) the persistent catalog: a derby-backed Hive
  * metastore + managed-table warehouse at `<root>`, the ten contract
  * tables materialized from `<sfDir>` (facts date-partitioned — see
  * [[CatalogTables]]).
  *
  * Run it twice to see the persistence contract: the first run CREATEs and
  * writes; the second (fresh JVM) finds every table already registered in
  * the metastore and only prints the row counts it reads back. After init,
  * any entrypoint launched with `SPARK_GRAFT_CATALOG=<root>` serves its
  * whole query surface from these tables.
  *
  * Usage: runMain graft.tools.CatalogInit <sfDir> <root>
  */
object CatalogInit {
  def main(args: Array[String]): Unit = {
    val (sfDir, root) = args match {
      case Array(s, r) => (s, r)
      case _ => sys.error("usage: graft.tools.CatalogInit <sfDir> <root>")
    }
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(8)
    val b0 = graft.EngineConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString))
    val spark = CatalogTables.hiveConfigs(root)
      .foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val db = CatalogTables.dbName
    val pre = if (spark.catalog.databaseExists(db))
      spark.catalog.listTables(db).collect().map(_.name).toSet
    else Set.empty[String]
    CatalogTables.materialize(spark, sfDir)
    val rows = graft.Tables.names.map { n =>
      val existed = pre.contains(n)
      val cnt = CatalogTables.contractView(spark, n).count()
      val parts = graft.sources.CatalogTables.partitionSpec.get(n)
        .map(_ => spark.sql(s"SHOW PARTITIONS $db.$n").count())
      println(s"[catalog] $db.$n rows=$cnt " +
        s"${if (existed) "(already in metastore)" else "(created)"}" +
        parts.fold("")(p => s" partitions=$p"))
      (n, cnt, existed)
    }
    println(s"[catalog] ${rows.count(_._3)}/${rows.size} tables served " +
      s"from the existing metastore at $root")
    // plan audit: a partition-column filter on a catalog fact must prune
    // through METASTORE metadata — a CatalogFileIndex-backed scan with
    // the predicate in PartitionFilters — not a recursive path listing
    import org.apache.spark.sql.functions.{col, max}
    val day = spark.table(s"$db.events")
      .select(max(col("event_date"))).head().getDate(0)
    val q = spark.table(s"$db.events")
      .filter(col("event_date") === org.apache.spark.sql.functions.lit(day))
    q.collect() // this QueryExecution runs, so its scan metrics populate
    // the ANALYZED plan holds the metastore-backed CatalogFileIndex; the
    // optimizer's PruneFileSourcePartitions then swaps in an
    // InMemoryFileIndex listing ONLY the catalog-selected partitions
    // (Spark 4 dropped the PrunedInMemoryFileIndex subclass), so the
    // audit reads the index class pre-pruning and the file count
    // post-execution
    val logicalIdx = q.queryExecution.analyzed.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          rel: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) => rel.location.getClass.getSimpleName
    }.getOrElse("none")
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(sys.error("[catalog] AUDIT FAIL: no file scan in plan"))
    val files = scan.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    val parts = spark.sql(s"SHOW PARTITIONS $db.events").count()
    val ok = scan.partitionFilters.nonEmpty &&
      logicalIdx.contains("Catalog") && files > 0 && files < parts
    println(s"[catalog] plan audit: logicalIndex=$logicalIdx " +
      s"partitionFilters=[${scan.partitionFilters.mkString(", ")}] " +
      s"filesRead=$files of $parts partitions" +
      s" => ${if (ok) "METASTORE-PRUNED" else "AUDIT FAIL"}")
    if (!ok) sys.error("[catalog] partition pruning not metastore-backed")
    // stats lifecycle: ANALYZE (idempotent — re-runs refresh), then audit
    // that rowCount lives in the METASTORE and sizes a broadcast join —
    // at 100 TB the join planner must read metadata, never list files
    CatalogTables.analyzeAll(spark)
    val nStats = spark.sharedState.externalCatalog.getTable(db, "nation")
      .stats
    val nRows = nStats.flatMap(_.rowCount).map(_.toLong).getOrElse(-1L)
    spark.conf.set("spark.sql.cbo.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val jq = spark.table(s"$db.customer")
      .join(spark.table(s"$db.nation"),
        col("c_nationkey") === org.apache.spark.sql.functions
          .col("n_nationkey"))
      .groupBy(org.apache.spark.sql.functions.col("n_name")).count()
    jq.collect()
    val bcast = jq.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }.nonEmpty
    val planRows = spark.table(s"$db.nation")
      .queryExecution.optimizedPlan.stats.rowCount
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    val statsOk = nRows > 0 && planRows.contains(BigInt(nRows)) && bcast
    println(s"[catalog] stats audit: nation rowCount=$nRows " +
      s"planRowCount=${planRows.getOrElse(-1)} broadcastJoin=$bcast" +
      s" => ${if (statsOk) "STATS-SIZED" else "AUDIT FAIL"}")
    if (!statsOk) sys.error("[catalog] join sizing not metastore-backed")
    spark.stop()
  }
}
