package graft

import org.apache.spark.sql.functions._

class ApproxAndBucketingSpec extends SparkSpec {
  import spark.implicits._

  test("approx sketches stay within tolerance of exact answers") {
    val df = SparkEntry.q53(spark, "/root/testdata/sf0.001")
    val exact = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("exact_orders"))
    val joined = df.join(exact, "l_returnflag").collect()
    joined.foreach { r =>
      val approx = r.getAs[Long]("approx_orders").toDouble
      val ex = r.getAs[Long]("exact_orders").toDouble
      assert(math.abs(approx - ex) / ex < 0.05,
        s"${r.getString(0)}: approx=$approx exact=$ex")
      // median must fall inside the observed value range
      assert(r.getAs[Double]("p50_price") > 0)
      assert(r.getAs[Double]("p99_price") >= r.getAs[Double]("p50_price"))
    }
  }

  test("bucketed tables co-locate the join: no shuffle exchange in the plan") {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 5)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1) // force non-broadcast
    import s.implicits._
    try {
      val a = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "va")
      val b = (1L to 1000L).map(i => (i, i * 3)).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("bspec_a")
      b.write.mode("overwrite").bucketBy(4, "k").sortBy("k")
        .saveAsTable("bspec_b")

      val joined = s.table("bspec_a").join(s.table("bspec_b"), "k")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      // both sides pre-bucketed on k → sort-merge join without any exchange
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() == 1000)
    } finally {
      s.sql("DROP TABLE IF EXISTS bspec_a")
      s.sql("DROP TABLE IF EXISTS bspec_b")
    }
  }

  test("date-partitioned writes prune partitions at scan time") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune_spec").toString
    val df = (0 until 90).map(i => (i.toLong, f"2024-${1 + i / 30}%02d-${1 + i % 30}%02d", i * 1.0))
      .toDF("id", "dt", "v")
    df.write.mode("overwrite").partitionBy("dt").parquet(s"$dir/t")

    val q = spark.read.parquet(s"$dir/t").filter(col("dt") === "2024-02-15")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(dt"), plan)
    // the scan must touch exactly one of the 90 date partitions
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount }
    assert(scanned == Seq(1), s"expected 1 partition scanned, got $scanned")
  }
}
