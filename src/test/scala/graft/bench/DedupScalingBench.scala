package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.{DedupOps, TextOps}

/** Scaling micro-benchmark: the dedup-family operators must grow
  * NEAR-LINEARLY with corpus size — the property that separates a 100 TB
  * design from one that merely passes at test scale. An 8× corpus is built
  * by unioning id-offset copies with character-rotated text (same token
  * vocabulary, so shingle-df pressure is preserved, but copies are not
  * near-dups of each other — output growth stays ~8×, isolating the
  * machinery's scaling from genuine pair blow-up).
  *
  * Assertions are loose ceilings (quadratic behavior would blow far past
  * them); the measured ratios print to the test log as the bench record.
  */
class DedupScalingBench extends SparkSpec {

  private def corpus(mult: Int): DataFrame = {
    val base = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"))
    (0 until mult).map { k =>
      val rot = k * 7 + 1
      base.select(
        (col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        concat(substring(col("text"), rot, 1 << 20),
          substring(col("text"), 1, rot - 1)).as("text"))
    }.reduce(_.unionByName(_)).cache()
  }

  /** min-of-3 wall time: the minimum is the steal-robust statistic on a
    * noisy shared host (the round-15 driver run failed this suite purely
    * on a host-load window — same code passed 820/820 locally). A single
    * inflated sample can no longer blow the ratio ceiling; genuine
    * super-linear growth inflates every sample and still fails.
    */
  private def timed(f: => Long): (Long, Long) = {
    var best = Long.MaxValue; var n = 0L
    (1 to 3).foreach { _ =>
      val t0 = System.nanoTime(); n = f
      best = math.min(best, (System.nanoTime() - t0) / 1000000)
    }
    (best, n)
  }

  test("jaccard, minhash, decontamination, repetition scale near-linearly") {
    val small = corpus(1); val big = corpus(8)
    assert(small.count() * 8 == big.count())

    def suite(df: DataFrame): Map[String, (Long, Long)] = Map(
      "jaccard" -> timed(
        DedupOps.jaccardPairsExact(df, "doc_id", "text", 3, 0.5).count()),
      "minhash_lsh" -> timed(
        DedupOps.candidatePairs(
          DedupOps.lshBands(
            DedupOps.minhashSignatures(df, "doc_id", "text", 3, 16),
            "doc_id", 16, 4), "doc_id").count()),
      "decontaminate" -> timed(
        DedupOps.contaminatedIds(df.filter(col("doc_id") % 10 =!= 0),
          df.filter(col("doc_id") % 10 === 0), "doc_id", "text", 3).count()),
      "repetition" -> timed(
        TextOps.withRepetitionStats(df, "doc_id", "text").count()))

    suite(small) // warm codegen + caches
    val s = suite(small); val b = suite(big)
    s.keys.toSeq.sorted.foreach { k =>
      val ratio = b(k)._1.toDouble / math.max(1, s(k)._1)
      info(f"$k%-14s 1x=${s(k)._1}%5d ms (${s(k)._2}%7d rows)  " +
        f"8x=${b(k)._1}%5d ms (${b(k)._2}%7d rows)  time-ratio=$ratio%.1f")
      // 8× data: linear ≈ 8, allow generous constant-overhead slack;
      // quadratic (≈64×) must fail
      assert(ratio < 30.0, s"$k scales super-linearly: $ratio")
    }
    small.unpersist(); big.unpersist()
  }

  test("connected components: time bounded by edge count, not its square") {
    import graft.operators.GraphOps
    // near-clique duplicate clusters (the dedup workload): C clusters of
    // size 6 wired as rings + chords — diameter stays small at any scale
    def edges(clusters: Int) = spark.range(clusters).selectExpr("id as c")
      .selectExpr("explode(sequence(0, 5)) as i", "c")
      .selectExpr("c * 6 + i as a",
        "c * 6 + (cast(i + 1 as int) % 6) as b")
      .union(spark.range(clusters).selectExpr("id * 6 as a", "id * 6 + 3 as b"))
      .cache()
    val (e1, e8) = (edges(500), edges(4000))
    e1.count(); e8.count()
    def timedCc(e: org.apache.spark.sql.DataFrame): (Long, Long) =
      timed(GraphOps.connectedComponents(e, "a", "b")
        .groupBy("component").count().count())
    timedCc(e1) // warm
    val (t1, n1) = timedCc(e1); val (t8, n8) = timedCc(e8)
    assert(n1 == 500L && n8 == 4000L)
    val ratio = t8.toDouble / math.max(1, t1)
    info(f"cc 1x=${t1}ms ($n1 clusters) 8x=${t8}ms ($n8 clusters) ratio=$ratio%.1f")
    // rounds are diameter-bound (constant here), per-round work edge-bound:
    // 8× edges must not cost anywhere near 64×
    assert(ratio < 30.0, s"connected components scale super-linearly: $ratio")
    e1.unpersist(); e8.unpersist()
  }
}
