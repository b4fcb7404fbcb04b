package graft

import org.apache.spark.sql.functions._
import graft.operators.{SketchOps, SimilarityOps, SurvivalOps}
import graft.metrics.MetricQueries

/** Hand-computed values for the experimentation/survival/sketch/quantization
  * operators (q121–q124).
  */
class SurvivalAndSketchSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier: textbook curve with censoring") {
    // durations: events at t=1 (2 of 5 at risk), censor at t=2,
    // event at t=3 (1 of 2 at risk), censor at t=4
    // S(1) = 1 - 2/5 = 0.6; S(3) = 0.6 * (1 - 1/2) = 0.3
    val df = Seq(
      (1, true), (1, true), (2, false), (3, true), (4, false))
      .toDF("d", "ev")
    val out = SurvivalOps.kaplanMeier(df, "d", "ev")
      .orderBy("t").collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    assert(out(1) == ((5L, 2L, 0L, 0.6)))
    assert(out(2) == ((3L, 0L, 1L, 0.6)))
    assert(out(3) == ((2L, 1L, 0L, 0.3)))
    assert(out(4) == ((1L, 0L, 1L, 0.3)))
  }

  test("kaplanMeier: full depletion ends at exactly 0, monotone curve") {
    val df = Seq((1, true), (2, true), (3, true)).toDF("d", "ev")
    val out = SurvivalOps.kaplanMeier(df, "d", "ev")
      .orderBy("t").collect().map(_.getDouble(4))
    assert(out.last == 0.0)
    assert(out.zip(out.tail).forall { case (a, b) => b <= a })
  }

  test("kaplanMeier: bucketWidth coarsens onto the life-table grid") {
    import org.apache.spark.sql.functions.{col, floor}
    val df = Seq((0L, true), (3L, true), (8L, false), (13L, true),
      (20L, true), (25L, false)).toDF("d", "ev")
    val bucketed = SurvivalOps.kaplanMeier(df, "d", "ev", bucketWidth = 7L)
      .orderBy("t").collect()
    // bucketing inside must equal pre-flooring outside
    val manual = SurvivalOps.kaplanMeier(
      df.select((floor(col("d") / 7) * 7).as("d"), col("ev")), "d", "ev")
      .orderBy("t").collect()
    assert(bucketed.map(_.toSeq.toList).toList ==
      manual.map(_.toSeq.toList).toList)
    assert(bucketed.map(_.getLong(0)).forall(t => t % 7 == 0))
    assert(bucketed.length == 4)
  }

  test("kaplanMeier: second-grain durations fail fast unless bucketed") {
    // 50k distinct second-grain durations — the fine-grid regime where an
    // unguarded run would funnel every distinct duration through ONE
    // ordered-window task
    val fine = (1L to 50000L).map(s => (s, s % 3 != 0L)).toDF("d", "ev")
    val ex = intercept[IllegalArgumentException] {
      SurvivalOps.kaplanMeier(fine, "d", "ev")
    }
    assert(ex.getMessage.contains("bucketWidth"))
    // day-width bucketing bounds the grid and the same call succeeds —
    // the window never sees more than ceil(50000/86400)+1 rows; here the
    // durations span less than a day so the whole curve is one bucket
    val daily = SurvivalOps.kaplanMeier(fine, "d", "ev",
      bucketWidth = 86400L).collect()
    assert(daily.length == 1 && daily.head.getLong(1) == 50000L)
    // an explicit maxGridSize override is honored (caller takes the risk
    // deliberately, nothing silent)
    assert(SurvivalOps.kaplanMeier(fine, "d", "ev",
      maxGridSize = 100000L).count() == 50000L)
  }

  test("twoProportionZTest: hand-computed z") {
    // a: 8/20 = 0.4, b: 14/20 = 0.7; pooled 22/40 = 0.55
    // z = 0.3 / sqrt(.55*.45*(0.1)) = 0.3/0.157321... = 1.906925
    val rows = Seq.fill(8)(("a", true)) ++ Seq.fill(12)(("a", false)) ++
      Seq.fill(14)(("b", true)) ++ Seq.fill(6)(("b", false))
    val out = MetricQueries.twoProportionZTest(
      rows.toDF("v", "s"), "v", "s", "a", "b").collect().head
    assert(out.getLong(0) == 20L && out.getLong(1) == 8L)
    assert(out.getLong(2) == 20L && out.getLong(3) == 14L)
    assert(out.getDouble(4) == 0.4 && out.getDouble(5) == 0.7)
    val expZ = BigDecimal(0.3 / math.sqrt(0.55 * 0.45 * (1.0 / 20 + 1.0 / 20)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getDouble(6) == expZ)
    // symmetric direction flips the sign
    val flipped = MetricQueries.twoProportionZTest(
      rows.toDF("v", "s"), "v", "s", "b", "a").collect().head
    assert(flipped.getDouble(6) == -expZ)
  }

  test("cmsHeavyHitters: estimates are one-sided and within the width bound") {
    // skewed corpus: term "hot" dominates; narrow sketch forces collisions
    val docs = (0 until 200).map { i =>
      (i.toLong, ("hot " * 5 + s"cold$i rare${i % 7}").trim)
    }.toDF("doc_id", "text")
    val out = SketchOps.cmsHeavyHitters(docs, "doc_id", "text",
      depth = 3, width = 16, k = 10).collect()
    val total = 200L * 7L // 7 tokens per doc
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS must never undercount: $r")
      assert(est - exact <= total, s"overshoot above any bound: $r")
    }
    // top term is exact-rank-1 and its estimate dominates
    assert(out.head.getString(0) == "hot" && out.head.getLong(1) == 1000L)
    // with 200+ distinct terms in 16 buckets, collisions must exist
    assert(out.map(_.getLong(3)).sum > 0L,
      "narrow sketch produced zero collisions — bucketing is broken")
  }

  test("cmsHeavyHitters: wide sketch reproduces exact counts") {
    val docs = Seq((1L, "a a b c"), (2L, "a b d e")).toDF("doc_id", "text")
    val out = SketchOps.cmsHeavyHitters(docs, "doc_id", "text",
      depth = 4, width = 4096, k = 5)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    out.foreach { case (t, (exact, est)) =>
      assert(exact == est, s"term $t: $est != $exact at width 4096")
    }
  }

  test("int8 quantization: error bounded by half a step, exact on constants") {
    val emb = Seq(
      (1L, Seq(0.0f, 1.0f, 5.0f)),
      (2L, Seq(1.0f, 1.0f, -5.0f)),
      (3L, Seq(0.5f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val rep = SimilarityOps.int8QuantizationReport(emb, "vec_id", "embedding")
      .orderBy("dim").collect()
    rep.foreach { r =>
      val (range, maxErr) = (r.getDouble(2), r.getDouble(3))
      // half-step bound: range/510 (+ rounding slack at the 6th decimal)
      assert(maxErr <= range / 510.0 + 1e-6, s"err above half-step: $r")
    }
    // constant dimension (all 1.0): range 0, zero error
    assert(rep(1).getDouble(2) == 0.0 && rep(1).getDouble(3) == 0.0)
  }

  test("isotonicCalibration: hand-computed PAV pooling, monotone output") {
    // scores 1..4 with labels 0,1,0,1 — PAV pools the (2,1),(3,0) violation
    // into 0.5; fitted sequence is [0, 0.5, 0.5, 1]
    val df = Seq((1.0, 0.0), (2.0, 1.0), (3.0, 0.0), (4.0, 1.0))
      .toDF("score", "label")
    val out = graft.ml.MlPipelines.isotonicCalibration(df)
      .orderBy("boundary").collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.map(_._1).sameElements(Array(1.0, 2.0, 3.0, 4.0)))
    assert(out.map(_._2).sameElements(Array(0.0, 0.5, 0.5, 1.0)))
    // events-shaped input stays monotone non-decreasing
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("value").as("score"),
        (col("event_type") === "purchase").cast("double").as("label"))
    val fitted = graft.ml.MlPipelines.isotonicCalibration(ev)
      .orderBy("boundary").collect().map(_.getDouble(1))
    assert(fitted.zip(fitted.tail).forall { case (a, b) => b >= a })
  }

  test("mergeAggState: merged partials equal the full recompute exactly") {
    val h1 = Seq((1L, 2L, BigDecimal("10.50")), (2L, 1L, BigDecimal("3.25")))
      .toDF("k", "n", "s")
    val h2 = Seq((1L, 3L, BigDecimal("0.75")), (3L, 1L, BigDecimal("8.00")))
      .toDF("k", "n", "s")
    val merged = graft.operators.CdcOps.mergeAggState(h1, h2, "k", "n", "s")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDecimal(2).doubleValue)).toMap
    assert(merged == Map(1L -> ((5L, 11.25)), 2L -> ((1L, 3.25)),
      3L -> ((1L, 8.0))))
  }

  test("productQuantize: codes in range, recall@10 vs exact search") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // finer grid than q143's 64×-compression report: recall is a
    // fidelity-config property, code-shape invariants are not
    val pq = graft.operators.SimilarityOps.productQuantize(
      emb, "vec_id", "embedding", m = 16, k = 32)
    val codes = pq.select(col("vec_id"), col("codes")).collect()
    assert(codes.forall(_.getSeq[Int](1).size == 16))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < 32)))
    // deployment contract: PQ shortlists, exact re-ranks — so the test is
    // "does the exact top-10 survive into the PQ top-50 shortlist", not
    // rank stability under quantization noise (these synthetic embeddings
    // are near-random, the hardest case for any codebook)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    def topK(df: org.apache.spark.sql.DataFrame, vecCol: String, k: Int) = df
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), graft.operators.SimilarityOps
        .cosineNative(typedLit(q), col(vecCol)).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(k)
      .collect().map(_.getLong(0)).toSet
    val exact = topK(emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")), "v", 10)
    val shortlist = topK(pq.select(col("vec_id"), col("recon")), "recon", 50)
    val recall = exact.intersect(shortlist).size / 10.0
    assert(recall >= 0.7, s"exact top-10 recall in PQ top-50: $recall")
  }

  test("int8 quantization: codes preserve neighborhood (recall@10 vs exact)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val recon = SimilarityOps.quantizeCodes(emb, "vec_id", "embedding")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>")).head()
      .getSeq[Double](0)
    def top10(df: org.apache.spark.sql.DataFrame, vecCol: String) = df
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        SimilarityOps.cosineNative(typedLit(q), col(vecCol)).as("c"))
      .orderBy(col("c").desc, col("vec_id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    val exact = top10(emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("v")), "v")
    val viaCodes = top10(recon.select(col("vec_id"), col("recon")), "recon")
    val recall = exact.intersect(viaCodes).size / 10.0
    assert(recall >= 0.8, s"int8 recall@10 too low: $recall")
  }

  test("logBins quantiles: 10% one-sided error bound holds on a uniform fixture") {
    // values 1..5000: exact q-quantile of rank r is r itself, so the
    // sketch's lower-bound estimate must satisfy est <= exact < est·(1+1/m)
    val d = (1 to 5000).map(v => ("a", v.toDouble)).toDF("grp", "x")
    val bins = SketchOps.logBins(d, "grp", "x")
    val out = SketchOps.quantilesFromBins(bins, "grp",
      Seq(0.25, 0.5, 0.9, 0.99)).collect()
    assert(out.length == 4)
    out.foreach { r =>
      val rank = r.getAs[Long]("rank")
      val est = r.getAs[Double]("est")
      val m = r.getAs[Long]("bin_m")
      val exact = rank.toDouble
      assert(est <= exact, s"estimate above the true quantile: $r")
      assert(exact < est * (1.0 + 1.0 / m),
        s"true quantile beyond the bin's upper bound: $r")
    }
  }

  test("logBins sketches merge by summing: per-shard union equals direct build") {
    val shard1 = (1 to 700).map(v => ("s", v * 3.0)).toDF("grp", "x")
    val shard2 = (1 to 900).map(v => ("s", v * 7.0 + 1.0)).toDF("grp", "x")
    val direct = SketchOps.logBins(shard1.unionByName(shard2), "grp", "x")
    val merged = SketchOps.logBins(shard1, "grp", "x")
      .unionByName(SketchOps.logBins(shard2, "grp", "x"))
      .groupBy(col("grp"), col("e"), col("m"))
      .agg(sum(col("n")).as("n"))
    assert(direct.collect().map(_.toString).sorted.toSeq ==
      merged.collect().map(_.toString).sorted.toSeq)
    val qd = SketchOps.quantilesFromBins(direct, "grp", Seq(0.5, 0.95))
    val qm = SketchOps.quantilesFromBins(merged, "grp", Seq(0.5, 0.95))
    assert(qd.collect().map(_.toString).sorted.toSeq ==
      qm.collect().map(_.toString).sorted.toSeq)
  }

  test("q202 streaming quantile sketch equals the batch q201 exactly") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.q201(spark, dir).collect().map(_.toString).toSeq
    val stream = SparkEntry.q202(spark, dir).collect().map(_.toString).toSeq
    assert(batch == stream, s"batch=$batch\nstream=$stream")
  }

  test("q221 streaming CMS heavy hitters equals the batch q123 exactly") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.q123(spark, dir).collect().map(_.toString).toSeq
    val stream = SparkEntry.q221(spark, dir).collect().map(_.toString).toSeq
    assert(batch == stream, s"batch=$batch\nstream=$stream")
  }

  test("q222 streaming HLL registers equal the batch q162 exactly") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.q162(spark, dir).collect().map(_.toString).toSeq
    val stream = SparkEntry.q222(spark, dir).collect().map(_.toString).toSeq
    assert(batch == stream, s"batch=$batch\nstream=$stream")
  }

  test("bloomFpCard: no false negatives, bounded positions, shard-merge identity") {
    import SparkSpec.spark.implicits._
    val build = (1L to 300L).map(i => i * 7L).toDF("k")
    val probe = (1L to 3000L).toDF("k")
    val card = SketchOps.bloomFpCard(build, "k", probe, "k",
      kHashes = 3, mBits = 1024).head()
    // every true member passes (Bloom's one guarantee)
    assert(card.getAs[Long]("n_bloom_pass") >=
      card.getAs[Long]("n_true_members"))
    assert(card.getAs[Long]("n_true_members") == 300L)
    assert(card.getAs[Long]("n_build_keys") == 300L)
    assert(card.getAs[Long]("n_bits_set") <= 1024L)
    assert(card.getAs[Long]("n_false_pos") ==
      card.getAs[Long]("n_bloom_pass") - card.getAs[Long]("n_true_members"))
    // mergeability: bits(A ∪ B) == bits(A) ∪ bits(B) — per-shard filters
    // OR together exactly
    def bits(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(SketchOps.bloomPositions(col("k"), 3, 1024)).as("pos"))
      .distinct().collect().map(_.getLong(0)).toSet
    val a = (1L to 150L).map(_ * 7L).toDF("k")
    val b = (151L to 300L).map(_ * 7L).toDF("k")
    assert(bits(build) == (bits(a) ++ bits(b)))
  }

  test("bloomFpCard: empty build side passes nothing, card stays well-formed") {
    import SparkSpec.spark.implicits._
    val build = Seq.empty[Long].toDF("k")
    val probe = (1L to 50L).toDF("k")
    val card = SketchOps.bloomFpCard(build, "k", probe, "k",
      kHashes = 3, mBits = 256).head()
    assert(card.getAs[Long]("n_build_keys") == 0L)
    assert(card.getAs[Long]("n_bits_set") == 0L)
    assert(card.getAs[Long]("n_bloom_pass") == 0L)
    assert(card.getAs[Long]("n_false_pos") == 0L)
    assert(card.getAs[Double]("fp_rate") == 0.0)
    assert(card.getAs[Long]("n_probe_keys") == 50L)
  }

  test("madOutlierCard: planted heavy tail flagged, constant column degenerate") {
    import SparkSpec.spark.implicits._
    // 95 inliers near 10.0, 5 planted spikes at 1000.0
    val rows = (1 to 95).map(i => ("a", 10.0 + (i % 5) * 0.001)) ++
      (1 to 5).map(_ => ("b", 1000.0))
    val r = graft.operators.RobustStats
      .madOutlierCard(rows.toDF("s", "v"), "s", "v").collect()
    val byS = r.map(x => x.getString(0) -> x).toMap
    assert(byS("b").getAs[Long]("n_outliers") == 5L)
    assert(byS("a").getAs[Long]("n_outliers") == 0L)
    assert(r.head.getAs[Long]("median_micro") / 1000000.0 >= 10.0)
    // MAD = 0 on a majority-constant column: every non-median value flags
    val const = ((1 to 10).map(_ => ("x", 5.0)) :+ (("y", 5.1)))
      .toDF("s", "v")
    val rc = graft.operators.RobustStats.madOutlierCard(const, "s", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(rc("y").getAs[Long]("n_outliers") == 1L)
    assert(rc("x").getAs[Long]("n_outliers") == 0L)
  }

  test("madOutlierCard: out-of-contract magnitudes fail loudly, in-contract extremes stay exact") {
    import SparkSpec.spark.implicits._
    // beyond the 4e12 micro-scaling contract the long cast would wrap and
    // silently flip verdicts — the guard must throw instead
    val tooBig = Seq(("a", 5.0e12), ("a", 1.0), ("a", 2.0)).toDF("s", "v")
    val e = intercept[IllegalArgumentException] {
      graft.operators.RobustStats.madOutlierCard(tooBig, "s", "v").collect()
    }
    assert(e.getMessage.contains("micro-scaling contract"))
    // inside the contract, a deviation of ~6e18 micro-units exceeds what
    // the old Long verdict product (6745·d) could hold — the decimal
    // arithmetic must still flag the planted extreme and nothing else
    val rows = (1 to 20).map(i => ("in", 3.0e12 + i)) :+ (("out", -3.0e12))
    val r = graft.operators.RobustStats
      .madOutlierCard(rows.toDF("s", "v"), "s", "v")
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("out").getAs[Long]("n_outliers") == 1L)
    assert(r("in").getAs[Long]("n_outliers") == 0L)
  }
}
