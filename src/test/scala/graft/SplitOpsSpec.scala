package graft

import org.apache.spark.sql.functions._
import graft.operators.SplitOps

class SplitOpsSpec extends SparkSpec {
  import spark.implicits._

  private val rows = (1L to 2000L).flatMap(k => Seq((k, "x"), (k, "y"))).toDF("k", "payload")

  test("withSplit: every group lands in exactly one split (leakage safety)") {
    val g = SplitOps.withSplit(rows, "k")
      .groupBy("k").agg(countDistinct("split").as("n"))
      .filter($"n" =!= 1).count()
    assert(g == 0L)
  }

  test("withSplit: ratios approximate 70/15/15 and are deterministic") {
    val counts = SplitOps.withSplit(rows.select("k").distinct(), "k")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 1400.0) / 2000.0 < 0.05)
    assert(math.abs(counts("val") - 300.0) / 2000.0 < 0.05)
    assert(math.abs(counts("test") - 300.0) / 2000.0 < 0.05)
    // determinism: same assignment on recompute
    val a = SplitOps.withSplit(rows, "k").select("k", "split").distinct().collect().toSet
    val b = SplitOps.withSplit(rows, "k").select("k", "split").distinct().collect().toSet
    assert(a == b)
  }

  test("withFold: folds cover 0..k-1 and are group-exclusive") {
    val f = SplitOps.withFold(rows, "k", 5)
    assert(f.select("fold").distinct().as[Long].collect().sorted.toSeq ==
      Seq(0L, 1L, 2L, 3L, 4L))
    val bad = f.groupBy("k").agg(countDistinct("fold").as("n"))
      .filter($"n" =!= 1).count()
    assert(bad == 0L)
  }
}
