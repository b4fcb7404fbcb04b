package graft

import org.apache.spark.sql.functions._
import graft.operators.LayoutOps

class LayoutCompactionSpec extends SparkSpec {

  test("compactDatePartitioned: fewer larger files, row-identical content, partitions preserved") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact")
    try {
      val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
        .withColumn("event_date", to_date(col("ts")))
      // plant fragmentation: 8 hash-spread writers × one file per day dir
      events.repartition(8)
        .write.partitionBy("event_date").parquet(s"$root/frag")
      val report = LayoutOps.compactDatePartitioned(spark,
        s"$root/frag", s"$root/compact", "event_date",
        targetBytes = 512L * 1024 * 1024).collect()
      assert(report.nonEmpty)
      // the audit: every partition ends with FEWER files (here exactly 1 —
      // a day of sf0.001 events is far below the target size)
      report.foreach { r =>
        assert(r.getLong(3) < r.getLong(1),
          s"partition ${r.getString(0)} not compacted: $r")
        assert(r.getLong(3) == 1L)
        assert(r.getLong(1) > 1L, "fixture failed to fragment")
      }
      // partition values preserved: the report's grid is exactly the
      // source's day grid
      val srcDays = events.select(col("event_date").cast("string"))
        .distinct().collect().map(_.getString(0)).sorted.toSeq
      assert(report.map(_.getString(0)).sorted.toSeq == srcDays)
      // row identity: the compacted copy is a multiset-equal clone
      val before = spark.read.parquet(s"$root/frag")
      val after = spark.read.parquet(s"$root/compact")
      assert(after.count() == before.count())
      assert(after.exceptAll(before).isEmpty,
        "compacted copy has rows the source lacks")
      assert(before.exceptAll(after).isEmpty,
        "compacted copy dropped rows")
    } finally graft.tools.FsUtils.deleteRecursively(root)
  }

  test("compactDatePartitioned: sub-target partitions still land on one file each") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact2")
    try {
      import spark.implicits._
      val data = (1L to 300L).map(i => (i, f"2024-01-${1 + (i % 3)}%02d"))
        .toDF("id", "event_date")
      data.repartition(5).write.partitionBy("event_date")
        .parquet(s"$root/frag")
      val rep = LayoutOps.compactDatePartitioned(spark,
        s"$root/frag", s"$root/compact", "event_date", targetBytes = 1L << 30)
        .collect()
      assert(rep.length == 3)
      assert(rep.forall(_.getLong(3) == 1L))
      assert(spark.read.parquet(s"$root/compact").count() == 300L)
    } finally graft.tools.FsUtils.deleteRecursively(root)
  }
}
