package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators: bucketed tables and the co-located join. The
  * reference joins in pandas memory (`/root/reference/src/data/
  * preprocessing.py:139-188`); at 100 TB the dominant cost of a fact-fact
  * equi-join is the shuffle of BOTH sides, and the standard cure is to
  * write the tables bucketed by the join key so the join runs bucket-to-
  * bucket with ZERO exchanges — the layout is paid once at write time and
  * amortized over every subsequent join/aggregation on that key.
  */
object LayoutOps {

  /** Write `df` hive-partitioned by the calendar date of `tsCol`
    * (`.../date_col=YYYY-MM-DD/part-*.parquet`) — SURVEY §4.2's "built-in
    * if we partition sensor data by date", made concrete. A date-bounded
    * query over the result touches only the matching directories: Spark
    * turns the date predicate into PartitionFilters at the scan, so the
    * 100 TB history read for a one-week window lists and reads 7
    * partitions, not 3650. Returns the partitioned reader frame.
    */
  def writeDatePartitioned(df: DataFrame, tsCol: String, dateCol: String,
      path: String): DataFrame = {
    df.withColumn(dateCol, to_date(col(tsCol)))
      .write.partitionBy(dateCol).mode("overwrite").parquet(path)
    df.sparkSession.read.parquet(path)
      .withColumn(dateCol, col(dateCol).cast("date"))
  }

  /** Write `left` and `right` bucketed by their join keys into `buckets`
    * buckets under `root` (registered as tables `<tag>_l` / `<tag>_r` in
    * the session catalog, parquet at a caller-owned path), then equi-join
    * the BUCKETED tables. With bucketing metadata present, Catalyst plans
    * the join with no Exchange on either side — the plan audit asserts it.
    * Buckets are also sorted by the key, so the sort-merge join needs no
    * per-task sort either.
    *
    * The result is bit-identical to `left.join(right, ...)` — layout, like
    * salting (q90) and the bloom prefilter (q117), must be invisible in
    * the answer. Caller cleans up via [[dropBucketed]].
    */
  def bucketedEquiJoin(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String, buckets: Int, root: String,
      tag: String): DataFrame = {
    left.write.mode("overwrite")
      .option("path", s"$root/${tag}_l")
      .bucketBy(buckets, leftKey).sortBy(leftKey)
      .saveAsTable(s"${tag}_l")
    right.write.mode("overwrite")
      .option("path", s"$root/${tag}_r")
      .bucketBy(buckets, rightKey).sortBy(rightKey)
      .saveAsTable(s"${tag}_r")
    spark.table(s"${tag}_l")
      .join(spark.table(s"${tag}_r"),
        col(leftKey) === col(rightKey))
  }

  def dropBucketed(spark: SparkSession, tag: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS ${tag}_l")
    spark.sql(s"DROP TABLE IF EXISTS ${tag}_r")
  }

  /** OPTIMIZE-style small-file compaction for a date-partitioned parquet
    * table: bin-pack each partition's files into
    * `ceil(partitionBytes / targetBytes)` output files, preserving the
    * partition values, into a NEW root (copy-compact — the source stays
    * readable throughout; the final swap is the caller's atomic rename).
    * The missing half of the layout story next to bucketing
    * ([[bucketedEquiJoin]]), Z-order ([[zoneMapSkipping]]) and pruning
    * ([[writeDatePartitioned]]): streaming/CDC ingest (q86/q150) drips
    * small files into each day directory, and scan cost at 100 TB is
    * dominated by file COUNT (open/footer/seek per file) long before
    * bytes.
    *
    * Scale shape: the driver only LISTS the bounded date grid (Hadoop FS
    * API — works on any store); each partition compacts as its own
    * distributed read → coalesce(n) → write job, and the independent
    * jobs run concurrently via `.par` (the ensemble-fit pattern).
    * `coalesce`, not `repartition`: bin-packing needs no shuffle — file
    * reads stream straight into the n writers.
    *
    * Returns the per-partition report (partition value, files and bytes
    * before, files after); row identity of the compacted copy is the
    * caller's read-back check (spec-pinned, and q156's oracle re-derives
    * the content from the source table).
    */
  def compactDatePartitioned(spark: SparkSession, srcPath: String,
      dstPath: String, dateCol: String, targetBytes: Long): DataFrame = {
    import scala.collection.parallel.CollectionConverters._
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val hadoopPath = new org.apache.hadoop.fs.Path(srcPath)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(hadoopPath)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$dateCol="))
    val report = parts.toSeq.par.map { p =>
      val files = fs.listStatus(p.getPath)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      // Int-capped: a degenerate tiny targetBytes must not overflow the
      // coalesce partition count
      val n = math.min(math.max(1L, (bytes + targetBytes - 1L) / targetBytes),
        Int.MaxValue.toLong).toInt
      val dst = s"$dstPath/${p.getPath.getName}"
      spark.read.parquet(p.getPath.toString)
        .coalesce(n)
        .write.mode("overwrite").parquet(dst)
      // report what was WRITTEN, not what was requested (coalesce caps at
      // the read's partition count, so tiny inputs can pack tighter than n)
      val written = fs.listStatus(new org.apache.hadoop.fs.Path(dst))
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      (p.getPath.getName.stripPrefix(s"$dateCol="),
        files.length.toLong, bytes, written.toLong)
    }.toList.sortBy(_._1)
    import spark.implicits._
    report.toDF(dateCol, "n_files_before", "bytes_before", "n_files_after")
  }

  import org.apache.spark.sql.Column

  /** Bit-spread of an 8-bit value into the even bit positions (the classic
    * magic-mask cascade) — half of a Morton/Z-order interleave. Pure
    * BIGINT bitwise arithmetic, so any engine reproduces it bit-for-bit.
    */
  def spreadBits8(c: Column): Column = {
    val v0 = c.cast("bigint").bitwiseAND(lit(0xFFL))
    val v1 = v0.bitwiseOR(shiftleft(v0, 4)).bitwiseAND(lit(0x0F0FL))
    val v2 = v1.bitwiseOR(shiftleft(v1, 2)).bitwiseAND(lit(0x3333L))
    v2.bitwiseOR(shiftleft(v2, 1)).bitwiseAND(lit(0x5555L))
  }

  /** Z-order (Morton) code of two 8-bit dimensions: interleaved bits, so
    * rows close in BOTH dimensions get close codes — the multi-dimension
    * data-clustering key a lakehouse sorts files by when queries filter on
    * more than one column. Feed NORMALIZED coordinates (each dimension
    * rescaled onto the 0–255 grid): raw keys of unequal magnitude
    * degenerate the interleave toward the wider dimension's plain sort.
    */
  def morton8(x: Column, y: Column): Column =
    spreadBits8(x).bitwiseOR(shiftleft(spreadBits8(y), 1))

  /** Zone-map file-skipping comparison: split the table into `files`
    * equal-width chunks under (a) a Z-order layout (both dimensions
    * normalized to the 8-bit grid, then Morton-interleaved — the chunks
    * are square quadtree tiles) and (b) a single-column sort layout, build
    * each chunk's (min, max) zone map for both dimensions, and count how
    * many chunks a 2-D range query must read. The Z-layout bounds BOTH
    * dimensions per chunk, so its zone maps skip in both; the 1-D layout
    * leaves the second dimension unbounded per chunk. Everything is exact
    * integer arithmetic over one aggregation per layout — engine-portable.
    */
  def zoneMapSkipping(df: DataFrame, xCol: String, yCol: String,
      files: Int, xLo: Long, xHi: Long, yLo: Long, yHi: Long): DataFrame = {
    val raw = df.select(
      col(xCol).cast("bigint").as("__x"), col(yCol).cast("bigint").as("__y"))
    val dimMax = raw.agg(max(col("__x")).as("__dmx"), max(col("__y")).as("__dmy"))
    val base = raw.crossJoin(broadcast(dimMax))
      .withColumn("__z", morton8(
        expr("__x * 256 div (__dmx + 1)"),
        expr("__y * 256 div (__dmy + 1)")))
      .select(col("__x"), col("__y"), col("__z"))
    def report(layout: String, keyCol: String): DataFrame = {
      val mx = base.agg(max(col(keyCol)).as("__max"))
      val zones = base.crossJoin(broadcast(mx))
        .withColumn("__file",
          expr(s"$keyCol div (__max div $files + 1)"))
        .groupBy(col("__file"))
        .agg(count(lit(1)).as("__n"),
          min(col("__x")).as("__minx"), max(col("__x")).as("__maxx"),
          min(col("__y")).as("__miny"), max(col("__y")).as("__maxy"))
      zones.agg(
        lit(layout).as("layout"),
        count(lit(1)).as("n_files"),
        sum(when(col("__minx") <= xHi && col("__maxx") >= xLo &&
          col("__miny") <= yHi && col("__maxy") >= yLo, 1L).otherwise(0L))
          .as("n_files_hit"),
        sum(when(col("__minx") <= xHi && col("__maxx") >= xLo &&
          col("__miny") <= yHi && col("__maxy") >= yLo, col("__n"))
          .otherwise(0L)).as("rows_read"))
    }
    report("x_sorted", "__x").unionByName(report("z_order", "__z"))
  }
}
