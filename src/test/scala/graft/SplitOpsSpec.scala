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

  test("packSequences: contiguous packs split at the token budget") {
    val docs = Seq(
      // source A: token counts 300, 300, 300 with budget 512
      (1L, "A", 300L), (2L, "A", 300L), (3L, "A", 300L),
      // source B packs independently
      (10L, "B", 600L), (11L, "B", 10L)).toDF("id", "src", "n_tok")
    val got = SplitOps.packSequences(docs, "id", "src", "n_tok", 512L)
      .select("id", "pack_id").as[(Long, Long)].collect().toMap
    // A: priors 0,300,600 → packs 0,0,1 ; B: priors 0,600 → packs 0,1
    assert(got == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 10L -> 0L, 11L -> 1L))
  }

  test("stratifiedSample: per-stratum rates, referential stability") {
    val docs = (0L until 2000L).map(i => (i, if (i % 2 == 0) "web" else "books"))
      .toDF("id", "src")
    val kept = SplitOps.stratifiedSample(docs, "id", "src",
      Map("web" -> 250), defaultPerMille = 1000)
    val counts = kept.groupBy("src").count().as[(String, Long)].collect().toMap
    assert(counts("books") == 1000L, "default rate keeps the stratum whole")
    assert(math.abs(counts("web") - 250.0) / 1000.0 < 0.05)
    // referential stability: sampling a pre-filtered corpus keeps exactly
    // the same ids — membership depends only on the row itself
    val subset = SplitOps.stratifiedSample(docs.filter($"id" < 500), "id", "src",
      Map("web" -> 250), defaultPerMille = 1000)
      .select("id").as[Long].collect().toSet
    val fromFull = kept.filter($"id" < 500).select("id").as[Long].collect().toSet
    assert(subset == fromFull)
  }
}
