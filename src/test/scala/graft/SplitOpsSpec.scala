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

  test("stratifiedExactSample: exact ceil allocation, equals rank-by-(draw,key)") {
    import org.apache.spark.sql.expressions.Window
    val rows = (1L to 997L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
    val df = rows.toDF("k", "s")
    val sample = SplitOps.stratifiedExactSample(df, "s", "k", 1, 10)
    val got = sample.groupBy("s").count().as[(String, Long)].collect().toMap
    val ns = df.groupBy("s").count().as[(String, Long)].collect().toMap
    ns.foreach { case (s, n) =>
      assert(got(s) == (n + 9) / 10, s"stratum $s: ${got(s)} vs n=$n") }
    // the sort-free selection must equal the naive windowed reference
    val p1 = 1000003L; val p2 = 9999991L
    val id = col("k").cast("long")
    val x1 = pmod(pmod(id, lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + (id.cast("decimal(38,0)") / lit(p1))
      .cast("long"), lit(p2)) * lit(22695477L), lit(p2))
    val ref = df.withColumn("draw", x2)
      .withColumn("rn", row_number().over(
        Window.partitionBy($"s").orderBy($"draw", $"k")))
      .filter($"rn" <=
        when($"s" === "a", lit((ns("a") + 9) / 10))
          .when($"s" === "b", lit((ns("b") + 9) / 10))
          .otherwise(lit((ns("c") + 9) / 10)))
      .select($"s", $"k").as[(String, Long)].collect().toSet
    val mine = sample.select($"s", $"k").as[(String, Long)].collect().toSet
    assert(mine == ref)
    // determinism across repartitionings
    val again = SplitOps.stratifiedExactSample(df.repartition(7), "s", "k",
      1, 10).select($"s", $"k").as[(String, Long)].collect().toSet
    assert(again == mine)
  }

  test("stratifiedExactSample: 1200 strata take the broadcast-join path, exact allocation") {
    val rows = (0 until 1200).flatMap { s =>
      (0 until s % 5 + 1).map(j => (s.toLong * 10 + j, f"s$s%04d"))
    }
    val df = rows.toDF("k", "s")
    // a codegen compile failure (e.g. a when-fold blowing the 64 KB method
    // limit) must THROW here, not silently fall back to interpreted mode
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val sample = SplitOps.stratifiedExactSample(df, "s", "k", 1, 2)
      // plan audit: above literalStrataMax the per-stratum constants reach
      // the rows via a broadcast hash join, not a literal when chain
      assert(sample.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        "expected the bounds-frame broadcast join in the executed plan")
      val got = sample.groupBy("s").count().as[(String, Long)]
        .collect().toMap
      (0 until 1200).foreach { s =>
        val n = (s % 5 + 1).toLong
        assert(got(f"s$s%04d") == (n + 1) / 2,
          s"stratum s$s: ${got(f"s$s%04d")} vs ceil($n/2)")
      }
    } finally spark.conf.unset("spark.sql.codegen.fallback")
  }

  test("stratifiedExactSample: literal and broadcast-join paths select identical rows") {
    val rows = (1L to 900L).map(i => (i, s"g${i % 150}"))
    val df = rows.toDF("k", "s")
    val viaLiteral = SplitOps.stratifiedExactSample(df, "s", "k", 1, 3,
        literalStrataMax = 1000)
      .select($"s", $"k").as[(String, Long)].collect().toSet
    val viaJoin = SplitOps.stratifiedExactSample(df, "s", "k", 1, 3,
        literalStrataMax = 10)
      .select($"s", $"k").as[(String, Long)].collect().toSet
    assert(viaLiteral == viaJoin)
    assert(viaLiteral.nonEmpty)
  }

  test("hrwShardMovementCard: HRW moves ~1/17 of keys, mod moves ~all") {
    val df = (0L until 5000L).map(k => Tuple1(k)).toDF("k")
    val r = SplitOps.hrwShardMovementCard(df, "k").collect().head
    assert(r.getLong(0) == 5000L)
    val hrwFrac = r.getDouble(2)
    val modFrac = r.getDouble(5)
    // 1/17 ≈ 0.0588 — allow generous sampling noise either side
    assert(hrwFrac > 0.03 && hrwFrac < 0.1, s"hrw frac $hrwFrac")
    assert(r.getDouble(3) == 0.058824)
    // mod 16→17: only k ≡ same residue mod both survives (~1/17 stay)
    assert(modFrac > 0.85, s"mod frac $modFrac")
    // duplicate keys collapse: same card from a duplicated frame
    val dup = df.union(df)
    assert(SplitOps.hrwShardMovementCard(dup, "k").collect().head == r)
  }
}
