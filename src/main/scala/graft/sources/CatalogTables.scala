package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Persistent catalog surface — the north star's "Spark SQL over Hive
  * tables" served from a METASTORE instead of per-session temp views
  * (reference loads CSV/Excel eagerly per run, `loader.py:56-99`; a real
  * deployment CREATEs the star schema once and every session reads the
  * catalog).
  *
  * [[materialize]] writes the ten contract tables as MANAGED tables in a
  * database: the fact tables date-partitioned on a derived day column
  * (events by `event_date`, orders by `o_date`, lineitem by `l_sdate` —
  * the q150 layout convention promoted from a path-trick to catalog
  * metadata), dimensions and the document/embedding corpora unpartitioned.
  * Partition pruning then comes from the METASTORE (`PartitionFilters`
  * against catalog partitions — the plan audit asserts it), not from
  * directory listing, which at 100 TB is the difference between a
  * per-query file listing of the whole lake and an O(partitions-touched)
  * metadata lookup.
  *
  * [[contractView]] reads a catalog table back in CONTRACT shape (the
  * partition column dropped, columns in contract order), so every query —
  * DataFrame or SQL text — is bit-identical whether it reads raw parquet
  * or the catalog ([[graft.Tables.load]] consults [[fromEnv]] and serves
  * the catalog transparently when `SPARK_GRAFT_CATALOG` is set; the
  * driver's oracle gate then runs the WHOLE surface through the
  * metastore).
  *
  * True cross-session persistence needs the Hive metastore (derby) —
  * [[graft.tools.CatalogInit]] builds it and proves a second session sees
  * the tables; with the default in-memory catalog the same code degrades
  * to session-scoped managed tables (what the spec uses).
  */
object CatalogTables {
  val dbName = "graft"

  /** (table → derived partition column, source expression). Granularity
    * tracks the table's time span: events span ~a month → daily
    * partitions; orders/lineitem span ~7 TPC-H years → monthly (daily
    * would mean thousands of near-empty directories at small SF and a
    * file-count-dominated scan — the q150/compaction lesson applied to
    * partition design).
    */
  val partitionSpec: Map[String, (String, String)] = Map(
    "events" -> ("event_date", "to_date(ts)"),
    "orders" -> ("o_month", "to_date(date_trunc('month', o_orderdate))"),
    "lineitem" -> ("l_smonth", "to_date(date_trunc('month', l_shipdate))"))

  /** CREATE the database and write all ten tables as managed tables,
    * skipping tables that already exist (idempotent — the "create once,
    * serve forever" contract; pass overwrite=true to rebuild).
    */
  def materialize(spark: SparkSession, dir: String, db: String = dbName,
      overwrite: Boolean = false): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    Tables.names.foreach { n =>
      val full = s"$db.$n"
      if (overwrite || !spark.catalog.tableExists(full)) {
        // loadParquet, NOT load: with SPARK_GRAFT_CATALOG set, load would
        // resolve from the catalog itself and overwrite=true would then
        // overwrite a table being read — rebuild must hit the source files
        val base = Tables.loadParquet(spark, dir, n)
        val w = partitionSpec.get(n) match {
          case Some((pcol, e)) =>
            base.withColumn(pcol, expr(e)).write.partitionBy(pcol)
          case None => base.write
        }
        w.mode(if (overwrite) "overwrite" else "errorifexists")
          .format("parquet").saveAsTable(full)
      }
    }
  }

  /** A catalog table in contract shape: partition column dropped, contract
    * column order restored (saveAsTable moves partition columns last).
    */
  def contractView(spark: SparkSession, name: String,
      db: String = dbName): DataFrame = {
    val cols = Tables.contract(name).map { case (c, _) => col(c) }
    spark.table(s"$db.$name").select(cols: _*)
  }

  /** The warehouse root named by SPARK_GRAFT_CATALOG (None → parquet-path
    * mode everywhere). */
  def envRoot: Option[String] =
    sys.env.get("SPARK_GRAFT_CATALOG").map(_.trim).filter(_.nonEmpty)

  /** Serve `name` from the catalog when SPARK_GRAFT_CATALOG is set and the
    * table exists there — the transparent hook [[graft.Tables.load]]
    * consults so the ENTIRE query surface (DataFrame and SQL text) runs
    * against metastore-backed scans without touching any query.
    */
  def fromEnv(spark: SparkSession, name: String): Option[DataFrame] =
    envRoot.flatMap { _ =>
      if (spark.catalog.tableExists(s"$dbName.$name"))
        Some(contractView(spark, name))
      else None
    }

  /** Session-builder configs for a persistent (derby-backed) metastore
    * rooted at `root` — shared by every entrypoint that honors
    * SPARK_GRAFT_CATALOG.
    */
  def hiveConfigs(root: String): Map[String, String] = Map(
    "spark.sql.warehouse.dir" -> s"$root/warehouse",
    // the spark.hadoop. prefix is REQUIRED: bare javax.jdo.* SparkConf
    // entries never reach the metastore client (Spark only forwards
    // spark.hadoop.*-prefixed keys), and derby would silently land in a
    // ./metastore_db under the launch cwd instead of the named root
    "spark.hadoop.javax.jdo.option.ConnectionURL" ->
      s"jdbc:derby:;databaseName=$root/metastore_db;create=true")
}
