package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}
import graft.operators.{DriftOps, GraphOps, SurvivalOps, TimeSeriesOps}

/** Scaling micro-benchmark for the drift/survival/graph wave: PSI and the
  * KS statistic are aggregation+tiny-window pipelines, Markov transitions
  * and Kaplan–Meier are one keyed aggregation each, PageRank is
  * edge-join-bound — all must grow near-linearly. The KS case is the
  * pointed one: its distributed prefix sum replaced the naive global-sort
  * ECDF, so 8× values must NOT funnel into one task (which would show as a
  * superlinear wall-time cliff once a partition exceeds a task's memory).
  * Same loose-ceiling style as [[DedupScalingBench]].
  */
class DriftScalingBench extends SparkSpec {

  private def events(mult: Int): DataFrame = {
    val base = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
    (0 until mult).map { k =>
      base.select(
        (col("event_id") + lit(k * 100000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * 1000000L)).as("user_id"),
        col("event_type"),
        // offset values too: 8× DISTINCT value grid, the KS stressor
        (col("value") + lit(k * 1000.0)).as("value"))
    }.reduce(_.unionByName(_)).cache()
  }

  private def timed(f: => Long): (Long, Long) = {
    val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1000000, n)
  }

  test("psi, ks, markov, kaplan-meier scale near-linearly in events") {
    val small = events(1); val big = events(8)
    assert(small.count() * 8 == big.count())

    def km(df: DataFrame): Long = {
      val durations = df.groupBy(col("user_id"))
        .agg(
          (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
            .as("__dur_us"),
          max(col("event_type") === "purchase").as("__event"))
        .select(expr("__dur_us div 86400000000").as("d"), col("__event"))
      SurvivalOps.kaplanMeier(durations, "d", "__event").count()
    }
    def suite(df: DataFrame): Map[String, (Long, Long)] = Map(
      "psi" -> timed(
        DriftOps.psiDrift(df, "event_type", "ts", "value", 10).count()),
      "ks" -> timed(DriftOps.ksTwoSample(
        df, "value", "event_type", "click", "view").count()),
      "markov" -> timed(TimeSeriesOps.markovTransitions(
        df, "user_id", "ts", "event_id", "event_type").count()),
      "kaplan_meier" -> timed(km(df)))

    suite(small) // warm codegen
    val s = suite(small); val b = suite(big)
    s.keys.toSeq.sorted.foreach { k =>
      val ratio = b(k)._1.toDouble / math.max(1, s(k)._1)
      info(f"$k%-12s 1x=${s(k)._1}%5d ms (${s(k)._2}%7d rows)  " +
        f"8x=${b(k)._1}%5d ms (${b(k)._2}%7d rows)  time-ratio=$ratio%.1f")
      assert(ratio < 24.0, f"$k scaled super-linearly: $ratio%.1f× at 8× data")
    }
    small.unpersist(); big.unpersist()
  }

  test("cooccurrence, paths, snapshot-diff, bigram-ppl scale near-linearly") {
    val small = events(1); val big = events(8)
    val docsSmall = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text")).cache()
    val docsBig = (0 until 8).map { k =>
      docsSmall.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
        col("text"))
    }.reduce(_.unionByName(_)).cache()

    def snapDiff(df: DataFrame): Long = {
      val usCol = unix_micros(col("ts"))
      val range = df.agg(min(usCol).as("__mn"), max(usCol).as("__mx"))
      val based = df.crossJoin(broadcast(range))
        .withColumn("__is_a", usCol * 2 < col("__mn") + col("__mx"))
      def snap(c: org.apache.spark.sql.Column) = based.filter(c)
        .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      graft.operators.CdcOps
        .snapshotDiff(snap(col("__is_a")), snap(!col("__is_a")),
          "user_id", Seq("n")).count()
    }
    def suite(ev: DataFrame, docs: DataFrame): Map[String, (Long, Long)] = Map(
      "cooccur" -> timed(graft.operators.PatternOps
        .pairCooccurrence(ev, "user_id", "event_type").count()),
      "paths" -> timed(graft.operators.PatternOps
        .topPaths(ev, "user_id", "ts", "event_id", "event_type", 5, 20)
        .count()),
      "snapdiff" -> timed(snapDiff(ev)),
      "bigram_ppl" -> timed(graft.operators.TextOps
        .bigramPerplexity(docs, "doc_id", "text").count()))

    suite(small, docsSmall) // warm codegen
    val s = suite(small, docsSmall); val b = suite(big, docsBig)
    s.keys.toSeq.sorted.foreach { k =>
      val ratio = b(k)._1.toDouble / math.max(1, s(k)._1)
      info(f"$k%-12s 1x=${s(k)._1}%5d ms (${s(k)._2}%7d rows)  " +
        f"8x=${b(k)._1}%5d ms (${b(k)._2}%7d rows)  time-ratio=$ratio%.1f")
      assert(ratio < 24.0, f"$k scaled super-linearly: $ratio%.1f× at 8× data")
    }
    small.unpersist(); big.unpersist()
    docsSmall.unpersist(); docsBig.unpersist()
  }

  test("fixed-point pagerank scales in edges (8 disjoint graph copies)") {
    val base = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(col("vec_id") < 100)
      .select(col("vec_id"),
        col("embedding").cast("array<double>").as("emb"))
    val pairs = base.select(col("vec_id").as("a"), col("emb").as("ea"))
      .join(base.select(col("vec_id").as("b"), col("emb").as("eb")),
        col("a") < col("b"))
      .filter(graft.operators.SimilarityOps
        .cosineNative(col("ea"), col("eb")) >= 0.2)
      .select(col("a"), col("b")).cache()
    def copies(mult: Int): DataFrame =
      (0 until mult).map { k =>
        pairs.select((col("a") + lit(k * 100000L)).as("a"),
          (col("b") + lit(k * 100000L)).as("b"))
      }.reduce(_.unionByName(_))
    def run(df: DataFrame): (Long, Long) = timed(
      GraphOps.pageRankFixedPoint(df, "a", "b", iterations = 5).count())
    run(copies(1)) // warm
    val (tS, nS) = run(copies(1))
    val (tB, nB) = run(copies(8))
    assert(nB == nS * 8)
    val ratio = tB.toDouble / math.max(1, tS)
    info(f"pagerank 1x=${tS}ms ($nS nodes) 8x=${tB}ms ($nB nodes) ratio=$ratio%.1f")
    assert(ratio < 24.0, f"pagerank scaled super-linearly: $ratio%.1f×")
    pairs.unpersist()
  }
}
