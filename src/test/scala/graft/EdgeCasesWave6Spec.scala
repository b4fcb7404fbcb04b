package graft

import org.apache.spark.sql.functions._
import graft.operators.{LayoutOps, SplitOps}

class EdgeCasesWave6Spec extends SparkSpec {
  import spark.implicits._

  test("prioritySample: ids differing by the first prime do NOT share a draw") {
    // the round-4 advice defect: a single-round draw collapses to
    // id mod 1000003, so (i, i + 1000003) pairs alias and the id
    // tie-break always picks the smaller — the sample of a 50/50 mix
    // would be EXACTLY the small ids. The second round folds id div p1
    // back in, so large ids must appear in the sample.
    val p1 = 1000003L
    val ids = (1L to 100L) ++ (1L to 100L).map(_ + p1)
    val df = ids.map((_, 1.0)).toDF("id", "w")
    val picked = SplitOps.prioritySample(df, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size == 100)
    assert(picked.exists(_ > p1),
      "no id above the prime selected - draws still alias mod p1")
    assert(picked.exists(_ <= 100L))
  }

  test("compactDatePartitioned: source without partition dirs yields an empty report") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact_empty")
    try {
      // a bare directory with a stray file, no date partitions
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/readme.txt"), "not a partition")
      val rep = LayoutOps.compactDatePartitioned(spark, root.toString,
        s"$root/out", "event_date", 1L << 20)
      assert(rep.isEmpty)
    } finally graft.tools.FsUtils.deleteRecursively(root)
  }

  test("gbtEarlyStopTrace: tiny input still yields a usable trace") {
    val df = (1L to 20L).map(i => (i, (i % 4).toDouble, (i % 4) * 2.0))
      .toDF("id", "x", "y")
    val trace = graft.ml.MlPipelines.gbtEarlyStopTrace(
      df, "id", Seq("x"), "y", maxIter = 5, tol = 0.0)
    val rows = trace.orderBy("iteration").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(r => !r.getDouble(1).isNaN))
  }
}
