package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec

import graft.sources.CatalogTables

/** The persistent-catalog surface: managed-table materialization keeps the
  * contract shape, the SQL-text surface is bit-identical through the
  * catalog, and partition pruning comes from CATALOG metadata (the
  * metastore's PartitionFilters), not path listing.
  */
class CatalogSurfaceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val ready: Unit = {
    val loc = java.nio.file.Files
      .createTempDirectory("graft_cat_spec_").toString
    spark.sql(s"CREATE DATABASE IF NOT EXISTS ${CatalogTables.dbName} " +
      s"LOCATION '$loc'")
    CatalogTables.materialize(spark, dir)
  }

  test("materialized catalog tables read back in contract shape") {
    ready
    Tables.names.foreach { n =>
      val fromParquet = Tables.load(spark, dir, n)
      val fromCatalog = CatalogTables.contractView(spark, n)
      assert(fromCatalog.schema.map(f => (f.name, f.dataType)) ==
        fromParquet.schema.map(f => (f.name, f.dataType)),
        s"schema drift through the catalog for $n")
      assert(fromCatalog.count() == fromParquet.count(), s"row loss in $n")
    }
    // full-value check on a partitioned fact: same rows, same values
    val a = Tables.load(spark, dir, "events")
      .orderBy("event_id").collect().toSeq
    val b = CatalogTables.contractView(spark, "events")
      .orderBy("event_id").collect().toSeq
    assert(a == b)
  }

  test("SQL-text surface is bit-identical served from the catalog") {
    ready
    val sqls = Seq(SqlText.dedup, SqlText.starJoin, SqlText.weeklyTrend,
      SqlText.rollup, SqlText.topk, SqlText.profile, SqlText.retention)
    def run(): Seq[Seq[String]] = sqls.map(q =>
      spark.sql(q).collect().toSeq.map(_.toString).sorted)
    Tables.registerViews(spark, dir)
    val viaParquet = run()
    Tables.names.foreach(n =>
      CatalogTables.contractView(spark, n).createOrReplaceTempView(n))
    val viaCatalog = run()
    // restore parquet-backed views for sibling specs sharing the session
    Tables.registerViews(spark, dir)
    assert(viaCatalog == viaParquet)
  }

  test("partition pruning comes from catalog metadata") {
    ready
    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
      // collect() (not count(), which builds its own QueryExecution)
      // so THIS plan executes and its scan metrics populate
      df.collect()
      df.queryExecution.executedPlan.collectFirst {
        case f: FileSourceScanExec => f
      }.getOrElse(fail("no file scan in plan"))
    }
    val day = spark.table(s"${CatalogTables.dbName}.events")
      .select(max(col("event_date"))).head().getDate(0)
    val pruned = scanOf(spark.table(s"${CatalogTables.dbName}.events")
      .filter(col("event_date") === lit(day)))
    // the filter must land in PartitionFilters (metastore pruning), not
    // as a post-scan data filter
    assert(pruned.partitionFilters.nonEmpty,
      s"no PartitionFilters in:\n$pruned")
    // (this shared spec session runs the in-memory catalog, where the
    // file index is InMemoryFileIndex; the HIVE session — CatalogInit,
    // and any entrypoint under SPARK_GRAFT_CATALOG — uses CatalogFileIndex
    // with manageFilesourcePartitions, and CatalogInit's plan-audit line
    // asserts that metastore-backed index class at startup)
    val full = scanOf(spark.table(s"${CatalogTables.dbName}.events"))
    def filesRead(f: FileSourceScanExec): Long =
      f.metrics.get("numFiles").map(_.value).getOrElse(-1L)
    assert(filesRead(pruned) > 0 && filesRead(full) > filesRead(pruned),
      s"pruning read ${filesRead(pruned)} of ${filesRead(full)} files")
    // monthly fact partitioning prunes the same way
    val mScan = scanOf(spark.table(s"${CatalogTables.dbName}.orders")
      .filter(col("o_month") === lit(java.sql.Date.valueOf("1995-01-01"))))
    assert(mScan.partitionFilters.nonEmpty)
  }

  test("ANALYZE stats land in the catalog and size joins from metadata") {
    ready
    val db = CatalogTables.dbName
    CatalogTables.analyzeAll(spark)
    // rowCount can ONLY come from a catalog stat — a file listing never
    // carries it — so its presence in the catalog AND in the optimized
    // plan proves join sizing is metadata-driven, the 100 TB posture
    val nationRows = Tables.load(spark, dir, "nation").count()
    val catStats = spark.sharedState.externalCatalog
      .getTable(db, "nation").stats
    assert(catStats.exists(_.rowCount.contains(BigInt(nationRows))),
      s"ANALYZE did not persist rowCount: $catStats")
    assert(catStats.exists(_.sizeInBytes > 0))
    val oldCbo = spark.conf.get("spark.sql.cbo.enabled")
    spark.conf.set("spark.sql.cbo.enabled", "true")
    // AQE's AdaptiveSparkPlanExec hides its final plan from collect();
    // the static plan makes the broadcast decision visible
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val st = spark.table(s"$db.nation")
        .queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(nationRows)),
        s"catalog rowCount did not reach the plan: $st")
      // the stats-sized dim side broadcasts in a fact ⋈ dim join
      import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
      val j = spark.table(s"$db.customer")
        .join(spark.table(s"$db.nation"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).count()
      j.collect()
      assert(j.queryExecution.executedPlan.collect {
        case b: BroadcastHashJoinExec => b
      }.nonEmpty, s"no broadcast join in:\n${j.queryExecution.executedPlan}")
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", oldCbo)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  // LAST in the suite by design: the append mutates the shared catalog
  // fact, and the earlier tests assert parquet-parity counts
  test("appending a date partition is served transparently with pruning") {
    ready
    val db = CatalogTables.dbName
    val before = spark.sql(s"SHOW PARTITIONS $db.events").count()
    val cntBefore = spark.table(s"$db.events").count()
    val (newDay, n) = CatalogTables.appendEventsPartition(spark)
    assert(n > 0)
    assert(spark.sql(s"SHOW PARTITIONS $db.events").count() == before + 1,
      "the append must register exactly one new partition")
    // a filter on the new date prunes to just the appended partition...
    val q = spark.table(s"$db.events")
      .filter(col("event_date") === lit(newDay))
    q.collect()
    val scan = q.queryExecution.executedPlan.collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    assert(scan.partitionFilters.nonEmpty)
    assert(q.count() == n)
    // ...and every consumer serves the grown fact with no re-registration
    assert(spark.table(s"$db.events").count() == cntBefore + n)
    assert(CatalogTables.contractView(spark, "events").count() ==
      cntBefore + n)
    // the event_date = to_date(ts) derivation contract still holds
    assert(q.filter(expr("to_date(ts)") =!= col("event_date")).count() == 0)
  }
}
