package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.Stats._
import graft.operators.{DedupOps, SplitOps}

/** Property tests (SURVEY §5): invariants that must hold for any input,
  * not just the golden fixtures. Raw ScalaCheck generators sampled with
  * fixed seeds (the scalatest bridge artifact is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val doubles = Gen.listOfN(12,
    Gen.chooseNum(-1000.0, 1000.0).map(v => math.rint(v * 100) / 100))

  test("moments match direct pandas-formula computation for any data") {
    samples(doubles, 10).filter(xs => xs.distinct.size > 1).foreach { xs =>
      val df = xs.toDF("v")
      val r = df.agg(skewSample($"v").as("s"), kurtSample($"v").as("k")).head()
      val n = xs.size.toDouble
      val m = xs.sum / n
      val m2 = xs.map(x => math.pow(x - m, 2)).sum / n
      val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
      val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
      val g1 = m3 / math.pow(m2, 1.5)
      val expSkew = g1 * math.sqrt(n * (n - 1)) / (n - 2)
      val g2 = m4 / (m2 * m2) - 3
      val expKurt = ((n + 1) * g2 + 6) * (n - 1) / ((n - 2) * (n - 3))
      assert(approx(r.getDouble(0), expSkew, 1e-6), s"skew for $xs")
      assert(approx(r.getDouble(1), expKurt, 1e-6), s"kurt for $xs")
    }
  }

  test("dsum equals BigDecimal reference sum for any money values") {
    samples(doubles, 10).foreach { xs =>
      val got = xs.toDF("v").agg(dsum($"v", 2)).head().getDouble(0)
      val exp = xs.map(BigDecimal(_).setScale(2, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(got == exp, s"dsum for $xs")
    }
  }

  test("split buckets partition any key set: exclusive and exhaustive") {
    val keys = Gen.listOfN(50, Gen.chooseNum(Long.MinValue / 4, Long.MaxValue / 4))
    samples(keys, 5).foreach { ks =>
      val df = ks.distinct.toDF("k")
      val s = SplitOps.withSplit(df, "k")
      assert(s.count() == ks.distinct.size)
      assert(s.filter(!col("split").isin("train", "val", "test")).count() == 0)
    }
  }

  test("asofJoin equals the brute-force argmax definition for any frames") {
    import graft.operators.FuzzyJoins
    // random keys, random micros timestamps; right ts are per-key unique by
    // construction (distinct) so the operator's determinism contract holds
    val rows = Gen.listOfN(40,
      Gen.zip(Gen.chooseNum(1L, 4L), Gen.chooseNum(0L, 1000L)))
    samples(Gen.zip(rows, rows), 6).foreach { case (ls, rs) =>
      val left = ls.zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t), i.toLong) }
        .toDF("k", "ts", "left_id")
      val rdis = rs.distinct
      val right = rdis.zipWithIndex
        .map { case ((k, t), i) => (k, new Timestamp(t), i.toDouble) }
        .toDF("k", "ts", "payload")
      val got = FuzzyJoins.asofJoin(left, right, Seq("k"), "ts", Seq("payload"))
        .select("left_id", "payload")
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      val byRow = rdis.zipWithIndex
      ls.zipWithIndex.foreach { case ((k, t), i) =>
        val exp = byRow.filter { case ((rk, rt), _) => rk == k && rt <= t }
          .sortBy { case ((_, rt), _) => rt }.lastOption.map(_._2.toDouble)
        assert(got(i.toLong) == exp, s"left ($k,$t): got ${got(i.toLong)}, want $exp")
      }
    }
  }

  test("compactLatest equals brute-force latest-per-key for any change stream") {
    val row = Gen.zip(Gen.chooseNum(0L, 7L), Gen.chooseNum(0L, 100L),
      Gen.oneOf("a", "b", "c"))
    samples(Gen.listOfN(40, row), 8).foreach { rows =>
      // make versions unique per key so "latest" is well-defined
      val versioned = rows.zipWithIndex.map { case ((k, v, p), i) =>
        (k, v * 1000 + i, p)
      }
      val got = graft.operators.CdcOps
        .compactLatest(versioned.toDF("k", "v", "p"), Seq("k"), Seq("v"))
        .as[(Long, Long, String)].collect().toSet
      val expect = versioned.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
      assert(got == expect)
    }
  }

  test("packSequences matches the driver-side exclusive-prefix-sum definition") {
    val doc = Gen.zip(Gen.chooseNum(0L, 3L), Gen.chooseNum(1L, 400L))
    samples(Gen.listOfN(30, doc), 8).foreach { docs =>
      val idd = docs.zipWithIndex.map { case ((src, n), i) => (i.toLong, src, n) }
      val got = graft.operators.SplitOps
        .packSequences(idd.toDF("id", "src", "n_tok"), "id", "src", "n_tok", 512L)
        .select("id", "pack_id").as[(Long, Long)].collect().toMap
      idd.groupBy(_._2).foreach { case (_, grp) =>
        var prior = 0L
        grp.sortBy(_._1).foreach { case (id, _, n) =>
          assert(got(id) == prior / 512L, s"doc $id: got ${got(id)}")
          prior += n
        }
      }
    }
  }

  test("jaccard is symmetric, bounded [0,1], and 1 on self") {
    val words = Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d", "e", "f", "g"))
    samples(Gen.zip(words, words), 10).foreach { case (x, y) =>
      val df = Seq((x.distinct, y.distinct)).toDF("x", "y")
      val row = df.select(
        DedupOps.jaccard($"x", $"y"), DedupOps.jaccard($"y", $"x"),
        DedupOps.jaccard($"x", $"x")).head()
      val (j1, j2, js) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      assert(j1 == j2, s"symmetry for $x / $y")
      assert(j1 >= 0.0 && j1 <= 1.0)
      assert(x.isEmpty || js == 1.0)
    }
  }

  test("kthSmallestByCounting equals sorted-order truth for any multiset") {
    val lists = Gen.listOfN(25, Gen.chooseNum(-500L, 500L))
    samples(lists, 8).foreach { xs =>
      val df = xs.toDF("x")
      val sorted = xs.sorted
      Seq(1, xs.size / 2, xs.size).distinct.foreach { k =>
        val got = graft.operators.RobustStats
          .kthSmallestByCounting(df, "x", k.toLong)
        assert(got == sorted(k - 1), s"rank $k of $xs")
      }
    }
  }

  test("ksTwoSample equals the brute-force ECDF-sup definition") {
    val vals = Gen.listOfN(15,
      Gen.chooseNum(0.0, 30.0).map(v => math.rint(v * 4) / 4)) // forced ties
    samples(Gen.zip(vals, vals), 8).foreach { case (as, bs) =>
      val df = (as.map(("a", _)) ++ bs.map(("b", _))).toDF("g", "v")
      val got = graft.operators.DriftOps
        .ksTwoSample(df, "v", "g", "a", "b")
        .head().getDouble(2)
      val grid = (as ++ bs).distinct.sorted
      val exp = grid.map { x =>
        math.abs(as.count(_ <= x).toDouble / as.size -
          bs.count(_ <= x).toDouble / bs.size)
      }.max
      assert(approx(got,
        BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        1e-9), s"KS for $as vs $bs")
    }
  }

  test("kaplanMeier equals the brute-force product-limit for any durations") {
    val subj = Gen.zip(Gen.chooseNum(0, 6), Gen.oneOf(true, false))
    samples(Gen.listOfN(20, subj), 8).foreach { subjects =>
      val got = graft.operators.SurvivalOps
        .kaplanMeier(subjects.toDF("d", "ev"), "d", "ev")
        .collect().map(r => r.getInt(0) -> r.getDouble(4)).toMap
      val ts = subjects.map(_._1).distinct.sorted
      var s = 1.0
      ts.foreach { t =>
        val atRisk = subjects.count(_._1 >= t)
        val events = subjects.count(x => x._1 == t && x._2)
        s = s * (1.0 - events.toDouble / atRisk)
        val expected =
          if (events == atRisk) 0.0
          else BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        assert(approx(got(t), expected, 1e-5), s"S($t) for $subjects")
      }
    }
  }
}
