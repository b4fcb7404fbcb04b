package graft

import org.apache.spark.sql.functions._
import graft.operators.{CdcOps, GraphOps, LayoutOps, RobustStats,
  SimilarityOps, SketchOps, SplitOps, TextOps, TimeSeriesOps}

/** Empty/degenerate-input behavior of the q131–q143 operators (the
  * EdgeCasesWave3Spec contract extended to the final round-3 surface).
  */
class EdgeCasesWave4Spec extends SparkSpec {
  import spark.implicits._

  test("zoneMapSkipping: single-point table yields defined 1-file report") {
    val one = Seq((5L, 5L)).toDF("x", "y")
    val out = LayoutOps.zoneMapSkipping(one, "x", "y", 64, 0L, 10L, 0L, 10L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("x_sorted" -> 1L, "z_order" -> 1L))
  }

  test("bigramPerplexity: empty corpus and single-token docs are empty") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.bigramPerplexity(empty, "doc_id", "text").count() == 0)
    val singles = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(TextOps.bigramPerplexity(singles, "doc_id", "text").count() == 0)
  }

  test("snapshotDiff/mergeAggState: one empty side") {
    val a = Seq((1L, 2L, BigDecimal("1.00"))).toDF("k", "n", "s")
    val none = Seq.empty[(Long, Long, BigDecimal)].toDF("k", "n", "s")
    val d = CdcOps.snapshotDiff(a, none, "k", Seq("n", "s"))
      .collect().map(_.getAs[String]("status"))
    assert(d.toSeq == Seq("removed"))
    val m = CdcOps.mergeAggState(a, none, "k", "n", "s").collect()
    assert(m.length == 1 && m.head.getLong(1) == 2L)
  }

  test("changepointMeanShift: single-bucket keys drop out, never throw") {
    val df = Seq(("A", 0L, 1.0), ("A", 1L, 2.0)).toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    // both rows in hour 0 → no admissible split → key absent
    assert(TimeSeriesOps.changepointMeanShift(df, "k", "ts", "v")
      .count() == 0)
  }

  test("triangleStats: empty and single-edge graphs") {
    val none = Seq.empty[(Long, Long)].toDF("s", "d")
    assert(GraphOps.triangleStats(none, "s", "d").collect()
      .forall(r => r.getLong(0) == 0L && r.getLong(2) == 0L))
    val one = Seq((1L, 2L)).toDF("s", "d")
    val r = GraphOps.triangleStats(one, "s", "d").collect().head
    // two degree-1 nodes: no triangles and no node qualifies for cc
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L && r.getLong(2) == 0L)
    assert(r.isNullAt(3)) // avg over zero qualifying nodes is undefined
  }

  test("zipfFit: single-term corpus has a degenerate (null) slope") {
    val df = Seq(Tuple1("a a a")).toDF("text")
    val r = TextOps.zipfFit(df, "text").collect().head
    assert(r.getLong(0) == 1L)
    // one point → zero variance in x → 0/0: null or NaN, never a throw
    assert(r.isNullAt(1) || r.getDouble(1).isNaN)
  }

  test("quantileNormalizationMap: single-row group maps onto itself") {
    val df = Seq(("A", 5L)).toDF("g", "v")
    val out = RobustStats.quantileNormalizationMap(df, "g", "v").collect()
    assert(out.length == 9)
    assert(out.forall(r => r.getDouble(2) == 5.0 && r.getDouble(4) == 0.0))
  }

  test("prioritySample: k larger than the table returns everything") {
    val df = Seq((1L, 1.0), (2L, 2.0)).toDF("id", "w")
    assert(SplitOps.prioritySample(df, "id", "w", 10).count() == 2)
  }

  test("cmsJoinCardinality: disjoint key sets stay defined") {
    val a = Seq((1L, 1L)).toDF("k", "n")
    val b = Seq((1000001L, 1L)).toDF("k", "n")
    val est = SketchOps.cmsJoinCardinality(
      SketchOps.cmsCounters(a, "k", "n", 4, 1024),
      SketchOps.cmsCounters(b, "k", "n", 4, 1024)).collect().head
    // one key each: buckets rarely collide → null (no shared buckets) or a
    // small overestimate; the contract is "defined row, never a throw"
    assert(est.isNullAt(0) || est.getLong(0) >= 0L)
  }

  test("closed-form fits: zero x-variance yields null fits, never a throw") {
    // AR(1) on a constant series: every lag pair is (4,4) → undefined
    val const = (0 until 5).map(i => ("K", i.toLong, i.toLong, 4.0))
      .toDF("k", "us", "id", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val ar = graft.ml.MlPipelines.ar1ClosedForm(const, "k", "ts", "id", "v")
      .collect().head
    assert(ar.isNullAt(2) && ar.isNullAt(3)) // slope, intercept
    // backtest where every training row shares one timestamp → fold drops
    val burst = (0 until 40).map { i =>
      (if (i < 20) 0L else 1000000000000L + i.toLong * 1000000L, i.toDouble)
    }.toDF("us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val bt = graft.ml.MlPipelines.rollingOriginBacktest(
      burst, "ts", "value", nSlices = 2)
    assert(bt.count() == 0) // the only fold's training has zero x-variance
  }

  test("productQuantize: constant vectors reconstruct exactly") {
    val emb = (1L to 20L).map(i => (i, Seq.fill(8)(3.0f)))
      .toDF("vec_id", "embedding")
    val pq = SimilarityOps.productQuantize(emb, "vec_id", "embedding",
      m = 2, k = 2)
    val recon = pq.select(col("recon")).collect()
      .map(_.getSeq[Double](0))
    assert(recon.forall(v => v.size == 8 && v.forall(_ == 3.0)))
  }
}
