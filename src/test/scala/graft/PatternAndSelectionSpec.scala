package graft

import org.apache.spark.sql.functions._
import graft.operators.{FuzzyJoins, PatternOps, RobustStats}

/** Hand-computed values for the pattern-mining / record-linkage /
  * distributed-selection operators (q127–q130).
  */
class PatternAndSelectionSpec extends SparkSpec {
  import spark.implicits._

  test("pairCooccurrence: supports and lift on a three-basket fixture") {
    // baskets: 1={a,b}, 2={a,b,c}, 3={a}; duplicates must not inflate
    val df = Seq((1, "a"), (1, "b"), (1, "b"), (2, "a"), (2, "b"), (2, "c"),
      (3, "a")).toDF("u", "item")
    val out = PatternOps.pairCooccurrence(df, "u", "item")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out(("a", "b")) == ((2L, 3L, 2L, 1.0)))   // 3·2/(3·2)
    assert(out(("a", "c")) == ((1L, 3L, 1L, 1.0)))   // 3·1/(3·1)
    assert(out(("b", "c")) == ((1L, 2L, 1L, 1.5)))   // 3·1/(2·1)
  }

  test("fellegiSunterScore: weights sum per agreement pattern, threshold cuts") {
    val pairs = Seq(
      (1L, true, true), (2L, true, false), (3L, false, true),
      (4L, false, false)).toDF("id", "f1", "f2")
    val out = FuzzyJoins.fellegiSunterScore(pairs, Seq(
        (col("f1"), 2.0, -1.0), (col("f2"), 3.0, -2.0)),
        threshold = 0.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out == Map(1L -> 5.0, 2L -> 0.0, 3L -> 2.0)) // 4 scores -3, cut
  }

  test("kthSmallestByCounting: every rank matches the sorted truth, with ties") {
    val xs = Seq(5L, 3L, 9L, 3L, 7L, 1L, 9L, 9L, 2L, 4L)
    val df = xs.toDF("x")
    val sorted = xs.sorted
    (1 to xs.size).foreach { k =>
      assert(RobustStats.kthSmallestByCounting(df, "x", k.toLong)
        == sorted(k - 1), s"rank $k")
    }
  }

  test("kthSmallestByCounting: opposite-extreme values don't overflow the width") {
    // hi − lo overflows Long here; the BigInt width/midpoint keeps the
    // search correct instead of producing negative midpoints
    val xs = Seq(Long.MinValue + 3, -5L, 0L, 7L, Long.MaxValue - 3)
    val df = xs.toDF("x")
    val sorted = xs.sorted
    (1 to xs.size).foreach { k =>
      assert(RobustStats.kthSmallestByCounting(df, "x", k.toLong)
        == sorted(k - 1), s"rank $k")
    }
  }

  test("orderStatsBounded: every rank matches the counting search, with ties") {
    val xs = Seq(5L, 3L, 9L, 3L, 7L, 1L, 9L, 9L, 2L, 4L)
    val df = xs.toDF("x")
    val ks = (1 to xs.size).map(_.toLong)
    val got = RobustStats.orderStatsBounded(df, "x", ks)
    ks.foreach { k =>
      assert(got(k) == RobustStats.kthSmallestByCounting(df, "x", k),
        s"rank $k")
    }
  }

  test("orderStatsBounded: nulls are ignored, out-of-range ranks fail fast, empty → empty map") {
    val withNulls = Seq(Some(5L), None, Some(1L), Some(3L), None)
      .toDF("x")
    // nulls occupy no rank: n=3, rank 1 → 1, rank 3 → 5
    val got = RobustStats.orderStatsBounded(withNulls, "x", Seq(1L, 3L))
    assert(got == Map(1L -> 1L, 3L -> 5L))
    // rank 4 > n=3: a named error, never a silently-missing map key
    val e = intercept[IllegalArgumentException](
      RobustStats.orderStatsBounded(withNulls, "x", Seq(4L)))
    assert(e.getMessage.contains("outside [1, 3]"))
    assert(e.getMessage.contains("x"))
    // rank 0 (the q175 empty-corpus shape) fails the same way on non-empty
    val e0 = intercept[IllegalArgumentException](
      RobustStats.orderStatsBounded(withNulls, "x", Seq(0L)))
    assert(e0.getMessage.contains("outside"))
    // truly empty input: no rank is answerable — empty map, no crash
    assert(RobustStats.orderStatsBounded(
      Seq.empty[Long].toDF("x"), "x", Seq(1L)) == Map.empty)
  }

  test("orderStatsBounded: wide domains fall back to the counting search, same answers") {
    val xs = Seq(5L, 3L, 9L, 3L, 7L, 1L, 9L, 9L, 2L, 4L)
    val df = xs.toDF("x")
    val ks = (1 to xs.size).map(_.toLong)
    // maxDistinct=2 forces the unbounded-domain path (7 distinct values):
    // the enforced contract routes to kthSmallestByCounting per rank
    // instead of a single-partition window over the distinct-value axis
    val got = RobustStats.orderStatsBounded(df, "x", ks, maxDistinct = 2L)
    val sorted = xs.sorted
    ks.foreach(k => assert(got(k) == sorted(k.toInt - 1), s"rank $k"))
  }

  test("q175 on an empty corpus returns the degenerate all-zero card") {
    val dir = java.nio.file.Files.createTempDirectory("q175empty").toString
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .limit(0).write.parquet(s"$dir/documents.parquet")
    val row = SparkEntry.q175(spark, dir).collect().head
    assert(row.toSeq == Seq(0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("exactMedianByCounting: odd and even parities") {
    val odd = RobustStats.exactMedianByCounting(
      Seq(9L, 1L, 5L).toDF("x"), "x").collect().head
    assert(odd.getLong(0) == 3L && odd.getDouble(3) == 5.0)
    val even = RobustStats.exactMedianByCounting(
      Seq(1L, 2L, 3L, 10L).toDF("x"), "x").collect().head
    assert(even.getLong(1) == 2L && even.getLong(2) == 3L
      && even.getDouble(3) == 2.5)
  }

  test("morton8: hand-computed interleaves and locality ordering") {
    val df = Seq((3L, 5L), (0L, 0L), (255L, 255L), (255L, 0L))
      .toDF("x", "y")
    val z = df.select(graft.operators.LayoutOps.morton8(col("x"), col("y")))
      .collect().map(_.getLong(0))
    // interleave(011, 101) = 100111₂ = 39; corners pin the code range
    assert(z(0) == 39L)
    assert(z(1) == 0L && z(2) == 65535L)
    assert(z(3) == 0x5555L) // x bits occupy exactly the even positions
  }

  test("zoneMapSkipping: z-order reads fewer rows for a 2-D box than 1-D sort") {
    // uniform 200×200 grid; box wide in x, narrow in y
    val grid = for (x <- 0 until 200; y <- 0 until 200) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val rep = graft.operators.LayoutOps
      .zoneMapSkipping(df, "x", "y", 64, 10L, 190L, 5L, 10L)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rep("z_order") < rep("x_sorted"),
      s"z-order must beat the 1-D sort on a 2-D box: $rep")
    // and the skipping is sound: every matching row lives in a read chunk
    val matching = grid.count { case (x, y) =>
      x >= 10 && x <= 190 && y >= 5 && y <= 10 }
    assert(rep.values.forall(_ >= matching))
  }

  test("streamingPsiDrift converges to the batch PSI (q131 == q113)") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.q113(spark, dir).collect().map(_.toSeq).toSeq
    val stream = SparkEntry.q131(spark, dir).collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("bigramPerplexity: hand-computed corpus-LM scores") {
    // corpus bigrams: "a b"×2, "b a"×1, "a c"×1 → contexts a:3, b:1
    // d1 = a b a c → (ln(2/3) + ln(1) + ln(1/3)) / 3 ; d2 = a b → ln(2/3)
    val docs = Seq((1L, "a b a c"), (2L, "a b"), (3L, "x")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.bigramPerplexity(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    def dec(x: Double) = BigDecimal(x)
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val avg1 = ((dec(math.log(2.0 / 3)) + dec(math.log(1.0)) +
      dec(math.log(1.0 / 3))).toDouble / 3)
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == BigDecimal(avg1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out(1L)._3 == BigDecimal(math.exp(-avg1))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    val avg2 = dec(math.log(2.0 / 3)).toDouble / 1
    assert(out(2L)._2 == BigDecimal(avg2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a single-token document has no transitions to score
    assert(!out.contains(3L))
  }

  test("snapshotDiff: added/removed/changed/unchanged, null-safe compare") {
    val a = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, None),
      (4L, Some(40.0))).toDF("k", "v")
    val b = Seq((1L, Some(10.0)), (2L, Some(25.0)), (3L, None),
      (5L, Some(50.0))).toDF("k", "v")
    val out = graft.operators.CdcOps.snapshotDiff(a, b, "k", Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(r.fieldIndex("status")))
      .toMap
    // NULL == NULL must read as unchanged (null-safe compare), and a NULL
    // state value must not be mistaken for an absent key
    assert(out == Map(1L -> "unchanged", 2L -> "changed", 3L -> "unchanged",
      4L -> "removed", 5L -> "added"))
  }

  test("prioritySample: deterministic, scale-invariant, weight-dominant") {
    val df = (1L to 200L).map(i => (i, if (i == 7L) 10000.0 else 1.0))
      .toDF("id", "w")
    val s1 = graft.operators.SplitOps.prioritySample(df, "id", "w", 20)
      .collect().map(_.getLong(0)).toSet
    val s2 = graft.operators.SplitOps.prioritySample(df, "id", "w", 20)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2 && s1.size == 20)
    // scaling every weight by the same factor changes nothing
    // (exponential-race invariance)
    val scaled = graft.operators.SplitOps.prioritySample(
      df.withColumn("w", col("w") * 7.0), "id", "w", 20)
      .collect().map(_.getLong(0)).toSet
    assert(scaled == s1)
    // a 10000× weight races ~10000× faster — it must be in the sample
    assert(s1.contains(7L))
    // a different salt draws a different (still deterministic) sample
    val other = graft.operators.SplitOps.prioritySample(
      df, "id", "w", 20, salt = 99991L).collect().map(_.getLong(0)).toSet
    assert(other != s1 && other.size == 20)
  }

  test("cmsJoinCardinality: one-sided bound, exact at generous width") {
    import graft.operators.SketchOps
    val a = (1L to 100L).map(k => (k, k % 5 + 1)).toDF("k", "n")
    val b = (1L to 50L).map(k => (k, 2L)).toDF("k", "n")
    val exact = a.join(b.withColumnRenamed("n", "nb"), "k")
      .agg(sum(col("n") * col("nb"))).head().getLong(0)
    def est(width: Int): Long = SketchOps.cmsJoinCardinality(
      SketchOps.cmsCounters(a, "k", "n", 4, width),
      SketchOps.cmsCounters(b, "k", "n", 4, width))
      .head().getLong(0)
    assert(est(8192) == exact)  // no collisions at generous width
    assert(est(16) >= exact)    // collisions only ever overestimate
  }

  test("changepointMeanShift: finds a planted level shift exactly") {
    // key A: hours 0-9 at value 5.0, hours 10-19 at 25.0 — the best split
    // is after hour 9 with zero within-segment variance
    val rows = (0 until 20).flatMap { h =>
      Seq.fill(3)(("A", h.toLong * 3600000000L,
        if (h < 10) 5.0 else 25.0))
    }
    val df = rows.toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = graft.operators.TimeSeriesOps
      .changepointMeanShift(df, "k", "ts", "v").collect().head
    assert(out.getLong(1) == 9L, s"split hour ${out.getLong(1)}")
    assert(out.getLong(2) == 30L && out.getLong(3) == 30L)
    assert(out.getDouble(4) == 0.0) // perfect two-segment fit
    // the no-split model pays the full between-segment variance:
    // 60 · (10)² · ... = Σ(v−15)² = 60 · 100
    assert(out.getDouble(5) == 6000.0)
  }

  test("changepointMeanShift: constant series ties break to earliest split") {
    val rows = (0 until 5).map(h => ("C", h.toLong * 3600000000L, 4.0))
    val df = rows.toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = graft.operators.TimeSeriesOps
      .changepointMeanShift(df, "k", "ts", "v").collect().head
    assert(out.getLong(1) == 0L) // all splits score 0 — earliest wins
    assert(out.getDouble(4) == 0.0 && out.getDouble(5) == 0.0)
  }

  test("hll inclusion-exclusion intersection stays within sketch tolerance") {
    // |A| = 3000, |B| = 2000, |A∩B| = 1000 (ids 2000-2999 shared)
    val ev = ((0L until 3000L).map(("click", _)) ++
      (2000L until 4000L).map(("purchase", _)))
      .toDF("event_type", "user_id")
    def est(tpe: String) = ev.filter(col("event_type") === tpe)
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val got = est("click").crossJoin(est("purchase").withColumnRenamed("sk", "sk2"))
      .select((hll_sketch_estimate(col("sk")) +
        hll_sketch_estimate(col("sk2")) -
        hll_sketch_estimate(hll_union(col("sk"), col("sk2")))).as("e"))
      .head().getLong(0)
    assert(math.abs(got - 1000L) <= 150L, s"intersection estimate $got")
  }

  test("portable HLL intersection (q190) bounds the planted overlap") {
    // the portable-register twin of the built-in-sketch test above, run
    // through the actual q190 card on real testdata: estimates positive,
    // union no larger than the sum, and the inclusion-exclusion estimate
    // within the m=64 tolerance of the exact overlap
    val row = SparkEntry.q190(spark, "/root/testdata/sf0.001").collect().head
    val (ec, ep, eu, eb) = (row.getDouble(0), row.getDouble(1),
      row.getDouble(2), row.getDouble(3))
    val exact = row.getLong(4)
    assert(ec > 0 && ep > 0 && eu > 0)
    assert(eu <= ec + ep + 1e-9)
    assert(exact > 0, "fixture should have a real click∩purchase overlap")
    // 64 registers → ~13% rse per sketch; inclusion-exclusion compounds
    // three of them — generous 60% tolerance still catches sign/algebra bugs
    assert(math.abs(eb - exact) <= 0.6 * exact + 64.0,
      s"est_both=$eb exact=$exact")
  }

  test("triangleStats: hand-computed census on a triangle with a pendant") {
    // triangle 1-2-3 plus pendant edge 3-4: T=1; cc = (1, 1, 1/3, null)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("s", "d")
    val out = graft.operators.GraphOps.triangleStats(edges, "s", "d")
      .collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 4L
      && out.getLong(2) == 1L)
    val expected = BigDecimal((1.0 + 1.0 + 1.0 / 3) / 3)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out.getDouble(3) - expected) < 2e-6,
      s"avg clustering ${out.getDouble(3)}")
    // triangle-free graph: zero triangles, zero clustering
    val path = Seq((1L, 2L), (2L, 3L)).toDF("s", "d")
    val p = graft.operators.GraphOps.triangleStats(path, "s", "d")
      .collect().head
    assert(p.getLong(2) == 0L && p.getDouble(3) == 0.0)
  }

  test("zipfFit: an exact power law recovers slope -1") {
    // frequencies 12/r for ranks 1..4 → ln f = ln 12 − ln r exactly
    val text = ("a " * 12 + "b " * 6 + "c " * 4 + "d " * 3).trim
    val out = graft.operators.TextOps.zipfFit(
      Seq(Tuple1(text)).toDF("text"), "text").collect().head
    assert(out.getLong(0) == 4L)
    assert(math.abs(out.getDouble(1) - (-1.0)) < 1e-5,
      s"slope ${out.getDouble(1)}")
    assert(math.abs(out.getDouble(2) - math.log(12.0)) < 1e-5)
  }

  test("quantileNormalizationMap: shifted groups get the aligning shift") {
    val df = ((1 to 100).map(v => ("A", v.toLong)) ++
      (101 to 200).map(v => ("B", v.toLong))).toDF("g", "v")
    val out = graft.operators.RobustStats
      .quantileNormalizationMap(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // median of A = 50.5, of B = 150.5, global = 100.5 (type-7 exact)
    assert(out(("A", 5)) == ((50.5, 100.5, 50.0)))
    assert(out(("B", 5)) == ((150.5, 100.5, -50.0)))
    // B is A translated by exactly +100, so at every decile the two
    // shifts differ by exactly that translation
    (1 to 9).foreach { d =>
      assert(out(("A", d))._3 - out(("B", d))._3 == 100.0, s"decile $d")
    }
  }

  test("frequentMotifs: anywhere-in-sequence windows, support pruning") {
    // user 1: a b a b a → trigrams a>b>a ×2, b>a>b ×1
    // user 2: a b a     → a>b>a ×1
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"), (1L, 5L, "a"),
      (2L, 1L, "a"), (2L, 2L, "b"), (2L, 3L, "a"))
    val df = rows.toDF("u", "us", "it")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("id", col("us"))
    val all = graft.operators.PatternOps
      .frequentMotifs(df, "u", "ts", "id", "it", n = 3, minKeys = 1L)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(all == Map("a>b>a" -> ((3L, 2L)), "b>a>b" -> ((1L, 1L))))
    // support pruning: minKeys = 2 keeps only the cross-user motif
    val pruned = graft.operators.PatternOps
      .frequentMotifs(df, "u", "ts", "id", "it", n = 3, minKeys = 2L)
      .collect().map(_.getString(0))
    assert(pruned.toSeq == Seq("a>b>a"))
  }

  test("topPaths: prefix assembly, tie order, truncation") {
    // user 1: a b c d e f (prefix a>b>c>d>e), user 2: a b (a>b), user 3: a b
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (1L, 5L, "e"), (1L, 6L, "f"),
      (2L, 1L, "a"), (2L, 2L, "b"),
      (3L, 1L, "a"), (3L, 2L, "b"))
    val df = rows.toDF("u", "us", "it")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("id", col("us"))
    val out = PatternOps.topPaths(df, "u", "ts", "id", "it", 5, 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.head == (("a>b", 2L)))
    assert(out(1) == (("a>b>c>d>e", 1L))) // 6th event truncated away
  }
}
