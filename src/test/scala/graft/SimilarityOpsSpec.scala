package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

class SimilarityOpsSpec extends SparkSpec {
  import spark.implicits._

  test("dot / l2norm / cosine on known vectors") {
    val df = Seq((Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0))).toDF("a", "b")
    assert(df.select(SimilarityOps.dot($"a", $"b")).head().getDouble(0) == 2.0)
    assert(df.select(SimilarityOps.l2norm($"a")).head().getDouble(0) == 3.0)
    assert(approx(df.select(SimilarityOps.cosine($"a", $"b")).head().getDouble(0),
      2.0 / (3.0 * 2.0)))
  }

  test("cosineScores: self excluded, parallel vector scores 1") {
    val e = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(2.0f, 0.0f)),  // parallel to query → cosine 1
      (2L, Seq(0.0f, 1.0f)),  // orthogonal → 0
      (3L, Seq(-1.0f, 0.0f)), // opposite → -1
    ).toDF("vec_id", "embedding")
    val s = SimilarityOps.cosineScores(e, "vec_id", "embedding", 0L)
      .orderBy("vec_id").as[(Long, Double)].collect().toMap
    assert(!s.contains(0L))
    assert(s(1L) == 1.0 && s(2L) == 0.0 && s(3L) == -1.0)
  }

  test("topK orders by cosine desc with id tiebreak") {
    val scores = Seq((5L, 0.9), (2L, 0.9), (7L, 0.5)).toDF("vec_id", "cosine")
    val r = SimilarityOps.topK(scores, "vec_id", 2).as[(Long, Double)].collect()
    assert(r.toSeq == Seq((2L, 0.9), (5L, 0.9)))
  }

  test("knnJoin: per-query top-k with id tiebreak, self excluded") {
    val e = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f)),    // cosine 1 with q1
      (3L, Seq(0.0f, 1.0f)),    // orthogonal to q1
      (4L, Seq(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = SimilarityOps.knnJoin(e, e.filter($"vec_id" === 1L),
        "vec_id", "embedding", "vec_id", "embedding", k = 2)
      .select("q_id", "n_id", "cosine", "rank")
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(r == Seq((1L, 2L, 1.0, 1L), (1L, 3L, 0.0, 2L)))
  }

  test("semanticDedup removes planted duplicates, keeps min-id canonical") {
    val rnd = new scala.util.Random(3)
    // 40 well-separated random vectors + exact duplicates of two of them
    val uniques = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat), i.toInt % 3))
    val dups = Seq(
      (100L, uniques(5)._2, 99),   // duplicate of id 5
      (101L, uniques(5)._2, 99),   // second duplicate of id 5
      (102L, uniques(17)._2, 99))  // duplicate of id 17
    val e = (uniques ++ dups).toDF("vec_id", "embedding", "label")
    val kept = SimilarityOps.semanticDedup(e, "vec_id", "embedding",
        nlist = 5, minCosine = 0.999999)
      .select("vec_id").as[Long].collect().toSet
    // identical vectors always share a cluster and have cosine 1 → only the
    // minimum id of each duplicate group survives
    assert(kept == (0L until 40L).toSet)
  }

  test("semanticDedupPortable removes planted duplicates like the k-means default") {
    val rnd = new scala.util.Random(3)
    val uniques = (0L until 40L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat), i.toInt % 3))
    val dups = Seq(
      (100L, uniques(5)._2, 99),
      (101L, uniques(5)._2, 99),
      (102L, uniques(17)._2, 99))
    val e = (uniques ++ dups).toDF("vec_id", "embedding", "label")
    // identical vectors share a cluster under ANY centroid set (argmax of
    // the same rounded cosines) and have cosine 1 → exactly the min-id
    // canonical of each duplicate group survives, same as the MLlib path
    val kept = SimilarityOps.semanticDedupPortable(e, "vec_id", "embedding",
        nlist = 5, minCosine = 0.999999)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == (0L until 40L).toSet)
  }

  test("lshCandidates buckets identical vectors together") {
    val e = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f)),
      (2L, Seq(1.0f, 2.0f, 3.0f)),   // identical → same signature
      (3L, Seq(-9.0f, 4.0f, -7.0f)),
    ).toDF("vec_id", "embedding")
    val pairs = SimilarityOps.lshCandidates(e, "vec_id", "embedding", 16)
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
  }

  test("productQuantizePortable: every (vector, subspace) coded once; identical corpus collapses to code 0 at distance 0") {
    val rnd = new scala.util.Random(7)
    val e = (0L until 30L)
      .map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val prof = SimilarityOps.productQuantizePortable(
      e, "vec_id", "embedding", m = 4, k = 3)
    val rows = prof.collect()
    // full coverage: each subspace's assignments partition the corpus
    val bySub = rows.groupBy(_.getInt(0))
    assert(bySub.keySet == Set(0, 1, 2, 3))
    bySub.values.foreach(g => assert(g.map(_.getLong(2)).sum == 30L))
    rows.foreach(r => assert(r.getDouble(3) >= 0.0))
    rows.foreach(r => assert(r.getInt(1) >= 0 && r.getInt(1) < 3))
    // determinism: a re-run is bit-identical (hash draw, no seeds)
    val again = SimilarityOps.productQuantizePortable(
      e, "vec_id", "embedding", m = 4, k = 3).collect()
    assert(rows.map(_.toString).sorted.toSeq ==
      again.map(_.toString).sorted.toSeq)
    // an identical corpus: every anchor is the same point, so the d2 tie
    // breaks to code 0 everywhere and distortion is exactly zero
    val same = (0L until 10L).map(i => (i, Seq.fill(8)(1.5f)))
      .toDF("vec_id", "embedding")
    val flat = SimilarityOps.productQuantizePortable(
      same, "vec_id", "embedding", m = 4, k = 3).collect()
    assert(flat.forall(_.getInt(1) == 0))
    assert(flat.forall(_.getDouble(3) == 0.0))
    assert(flat.forall(_.getLong(2) == 10L))
  }

  test("annRecallCard: full probing recovers recall 1.0, pruning bounds it") {
    import SparkSpec.spark.implicits._
    val rows = (0L until 100L).map { i =>
      (i, Seq.tabulate(8)(d => ((i * 31 + d * 7) % 13).toFloat / 13.0f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") < 10)
    // nprobe == nlist probes every list — the candidate set IS the corpus,
    // so recall must be exactly 1.0 for every query
    val full = graft.operators.SimilarityOps.annRecallCard(
      df, "vec_id", "embedding", q, nlist = 4, nprobe = 4, k = 5).collect()
    assert(full.length == 10)
    assert(full.forall(_.getAs[Double]("recall") == 1.0),
      s"full probing must be exact: ${full.mkString(";")}")
    // pruned probing can only lose neighbors
    val pruned = graft.operators.SimilarityOps.annRecallCard(
      df, "vec_id", "embedding", q, nlist = 4, nprobe = 1, k = 5).collect()
    assert(pruned.forall(r => r.getAs[Double]("recall") <= 1.0 &&
      r.getAs[Double]("recall") >= 0.0))
    assert(pruned.forall(_.getAs[Long]("n_exact") == 5L))
  }

  test("kCenterCoreset: covers planted orthogonal clusters, radius non-increasing") {
    import SparkSpec.spark.implicits._
    // three orthogonal directions; farthest-point traversal must visit
    // all three clusters within the first three selections
    val rows = (0L until 90L).map { i =>
      val c = (i % 3).toInt
      val base = Seq.fill(6)(0.0f).updated(2 * c, 1.0f)
      (i, base.updated(2 * c + 1, 0.001f * (i % 5)))
    }
    val df = rows.toDF("vec_id", "embedding")
    val sel = graft.operators.SimilarityOps
      .kCenterCoreset(df, "vec_id", "embedding", k = 5)
      .orderBy("step").collect()
    assert(sel.length == 5)
    assert(sel.map(_.getAs[Long]("center_id")).distinct.length == 5)
    val clusters = sel.take(3).map(_.getAs[Long]("center_id") % 3).toSet
    assert(clusters.size == 3,
      s"first three centers must span the three clusters: ${sel.mkString(";")}")
    val radii = sel.drop(1).map(_.getAs[Double]("radius"))
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"coverage radius must be non-increasing: ${radii.toSeq}")
    // once all clusters are covered the radius collapses to the jitter
    assert(radii.last < 0.01, s"radius after coverage: ${radii.toSeq}")
    assert(sel.head.isNullAt(sel.head.fieldIndex("radius")))
  }

  test("labelPropagationPortable: genuinely multi-hop — no direct train mass reaches the chain tail") {
    import SparkSpec.spark.implicits._
    def v(deg: Double) = {
      val r = math.toRadians(deg)
      Seq(math.cos(r).toFloat, math.sin(r).toFloat)
    }
    // train anchors: id 0 (label 0) at 0°, id 1 (label 1) at 270°;
    // test chain (ids ≡ 7 mod 10) walks 25°→50°→75°→100°
    val rows = Seq(
      (0L, v(0.0), 0), (1L, v(270.0), 1),
      (7L, v(25.0), 0), (17L, v(50.0), 0),
      (27L, v(75.0), 0), (37L, v(100.0), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    // precondition making the test meaningful: the chain tail has NO
    // non-negative cosine to ANY train vector — zero direct mass
    val tail = v(100.0).map(_.toDouble)
    for (anchor <- Seq(v(0.0), v(270.0))) {
      val cos = tail.zip(anchor.map(_.toDouble)).map { case (a, b) => a * b }.sum
      assert(cos <= 0.0, s"tail must be invisible to anchors, got $cos")
    }
    val cm = SimilarityOps.labelPropagationPortable(df, "vec_id",
      "embedding", "label", nlist = 1, nprobe = 1, kNbrs = 2, rounds = 4)
      .collect()
    // every chain node — including the 3-hop tail — resolves to label 0
    assert(cm.map(_.getAs[Long]("n_rows")).sum == 4L)
    assert(cm.forall(r => r.getAs[Int]("actual") == 0 &&
      r.getAs[Int]("predicted") == 0),
      s"mass must flow down the chain: ${cm.mkString(";")}")
  }

  test("labelPropagationPortable: planted clusters converge, test set partitions") {
    import SparkSpec.spark.implicits._
    val rows = (0L until 120L).map { i =>
      val lbl = (i % 2).toInt
      val base = if (lbl == 0) Seq(1.0f, 0.0f, 0.0f, 0.0f)
        else Seq(0.0f, 0.0f, 1.0f, 0.0f)
      (i, base.updated(1 + 2 * lbl, 0.01f * (i % 7)), lbl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cm = SimilarityOps.labelPropagationPortable(df, "vec_id",
      "embedding", "label", nlist = 4, nprobe = 2, kNbrs = 3, rounds = 3)
      .collect()
    assert(cm.nonEmpty)
    assert(cm.forall(r => r.getAs[Int]("actual") == r.getAs[Int]("predicted")),
      s"misclassified after propagation: ${cm.mkString(";")}")
    val nTest = df.filter(
      graft.operators.SplitOps.hashBucket(col("vec_id"), 10) >= 7).count()
    assert(cm.map(_.getAs[Long]("n_rows")).sum == nTest)
    // determinism: hash draw + fixed rounds, no seeds to drift
    val again = SimilarityOps.labelPropagationPortable(df, "vec_id",
      "embedding", "label", nlist = 4, nprobe = 2, kNbrs = 3, rounds = 3)
      .collect()
    assert(again.map(_.toString).toSeq == cm.map(_.toString).toSeq)
  }

  test("knnClassifyPortable: planted orthogonal clusters classify perfectly") {
    import SparkSpec.spark.implicits._
    // two well-separated directions in R^4; labels follow the direction
    val rows = (0L until 120L).map { i =>
      val lbl = (i % 2).toInt
      val base = if (lbl == 0) Seq(1.0f, 0.0f, 0.0f, 0.0f)
        else Seq(0.0f, 0.0f, 1.0f, 0.0f)
      // tiny per-id jitter on an off-axis dim keeps vectors distinct
      (i, base.updated(1 + 2 * lbl, 0.01f * (i % 7)), lbl)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val cm = SimilarityOps.knnClassifyPortable(df, "vec_id", "embedding",
      "label", nlist = 4, nprobe = 2, k = 3).collect()
    assert(cm.nonEmpty)
    assert(cm.forall(r => r.getAs[Int]("actual") == r.getAs[Int]("predicted")),
      s"misclassified: ${cm.mkString(";")}")
    // the confusion matrix partitions the holdout exactly
    val nTest = df.filter(
      graft.operators.SplitOps.hashBucket(col("vec_id"), 10) >= 7).count()
    assert(cm.map(_.getAs[Long]("n_rows")).sum == nTest)
  }

  test("clusterCohesionCard: one-hot axis clusters give margin 1") {
    // n == nlist → the portable draw takes every vector as a centroid:
    // own cosine 1.0, runner-up 0.0 (orthogonal axes), margin 1.0
    val vecs = (0L until 4L).map { i =>
      (i, Seq.tabulate(4)(d => if (d == i.toInt) 1.0f else 0.0f))
    }.toDF("vec_id", "embedding")
    val rows = SimilarityOps.clusterCohesionCard(vecs, "vec_id",
      "embedding", nlist = 4).collect()
    assert(rows.map(_.getLong(1)).sum == 4L)
    rows.foreach { r =>
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0)
      assert(r.getDouble(4) == 1.0)
    }
  }

  test("clusterCohesionCard: overlapping clusters shrink the margin") {
    // all vectors nearly parallel → own and runner-up cosines both ~1
    val vecs = (0L until 24L).map { i =>
      (i, Seq(1.0f, 0.01f * (i % 4), 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val rows = SimilarityOps.clusterCohesionCard(vecs, "vec_id",
      "embedding", nlist = 4).collect()
    rows.foreach(r => assert(r.getDouble(4) < 0.01,
      s"near-parallel corpus must have tiny margin, got ${r.getDouble(4)}"))
  }

  test("clusterLabelCard: labels equal to the clustering give purity 1 " +
      "and NMI 1") {
    val vecs = (0L until 40L).map { i =>
      val axis = (i % 4).toInt
      (i, Seq.tabulate(4)(d => if (d == axis) 1.0f else 0.05f * axis))
    }.toDF("vec_id", "embedding")
    // ground truth = the operator's own assignment → perfect agreement
    val cents = SimilarityOps.ivfCentroidsPortable(vecs, "vec_id",
      "embedding", 4)
    val labeled = SimilarityOps.ivfAssign(vecs, "vec_id", "embedding",
        cents, Some(6))
      .select(col("vec_id"), col("emb").as("embedding"),
        col("centroid_id").cast("int").as("label"))
    val r = SimilarityOps.clusterLabelCard(labeled, "vec_id",
      "embedding", "label", nlist = 4).head()
    assert(r.getLong(0) == 40L)
    assert(r.getDouble(3) == 1.0)                  // purity
    assert(approx(r.getDouble(7), 1.0, 1e-5))      // nmi
  }

  test("clusterLabelCard: label independent of geometry scores low NMI") {
    val vecs = (0L until 40L).map { i =>
      val axis = (i % 4).toInt
      (i, Seq.tabulate(4)(d => if (d == axis) 1.0f else 0.0f),
        ((i / 4) % 2).toInt) // label cycles independently of axis
    }.toDF("vec_id", "embedding", "label")
    val r = SimilarityOps.clusterLabelCard(vecs, "vec_id", "embedding",
      "label", nlist = 4).head()
    assert(r.getDouble(4) > 0.0 && r.getDouble(5) > 0.0) // entropies
    assert(r.getDouble(6) >= -1e-9, "MI is non-negative")
    assert(r.isNullAt(7) || r.getDouble(7) < 0.3,
      s"independent labels must score low NMI, got ${r.getDouble(7)}")
  }

  test("clusterOccupancyDrift: identical slice distributions give JS 0") {
    // pairs (2i, 2i+1) share a vector; even ids slice A, odd slice B →
    // per-cluster occupancy identical → every contribution exactly 0
    val vecs = (0L until 32L).map { i =>
      val base = (i / 2).toInt % 4
      (i, Seq.tabulate(4)(d => if (d == base) 1.0f else 0.1f))
    }.toDF("vec_id", "embedding")
    val rows = SimilarityOps.clusterOccupancyDrift(vecs, "vec_id",
      "embedding", col("vec_id") % 2 === 1, nlist = 4).collect()
    val total = rows.find(_.getLong(0) == -1L).get
    assert(total.getDouble(5) == 0.0)
    rows.filter(_.getLong(0) >= 0L).foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "equal per-cluster counts")
      assert(r.getDouble(5) == 0.0)
    }
  }

  test("clusterOccupancyDrift: disjoint modes drift, total sums rounded " +
      "contributions, counts partition the corpus") {
    val vecs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, Seq(1.0f, 0.0f, 0.0f, 0.0f))
      else (i, Seq(0.0f, 1.0f, 0.0f, 0.0f))
    }.toDF("vec_id", "embedding")
    val rows = SimilarityOps.clusterOccupancyDrift(vecs, "vec_id",
      "embedding", col("vec_id") % 2 === 1, nlist = 4).collect()
    val total = rows.find(_.getLong(0) == -1L).get
    val per = rows.filter(_.getLong(0) >= 0L)
    assert(total.getDouble(5) > 0.1, "disjoint modes must register drift")
    val sumContrib = per.map(r => BigDecimal(r.getDouble(5)))
      .sum.toDouble
    assert(math.abs(total.getDouble(5) - sumContrib) < 1e-9)
    assert(per.map(_.getLong(1)).sum == 20L &&
      per.map(_.getLong(2)).sum == 20L)
    assert(total.getLong(1) == 20L && total.getLong(2) == 20L)
  }

  test("ivfAssignTwoLevel ≡ flat argmax when every coarse block is probed") {
    val rnd = new scala.util.Random(11)
    val e = (0L until 200L).map(i =>
      (i, Seq.fill(6)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cents = SimilarityOps.ivfCentroidsPortable(e, "vec_id", "embedding",
      nlist = 12)
    // groupSize = ⌈√12⌉ = 4 → 3 coarse blocks; probing all 3 makes the
    // within-block argmax range over EVERY fine centroid — exactly flat
    val flat = SimilarityOps.ivfAssign(e, "vec_id", "embedding", cents,
        simRound = Some(6))
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    val two = SimilarityOps.ivfAssignTwoLevel(e, "vec_id", "embedding",
        cents, nlist = 12, coarseProbe = 3, simRound = Some(6))
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(two == flat)
  }

  test("ivfAssignTwoLevel: one row per vector, centroid inside a probed block") {
    val rnd = new scala.util.Random(12)
    val e = (0L until 150L).map(i =>
      (i, Seq.fill(6)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    val cents = SimilarityOps.ivfCentroidsPortable(e, "vec_id", "embedding",
      nlist = 12)
    val two = SimilarityOps.ivfAssignTwoLevel(e, "vec_id", "embedding",
      cents, nlist = 12, coarseProbe = 2, simRound = Some(6))
    assert(two.count() == 150L)
    assert(two.select("vec_id").distinct().count() == 150L)
    // recompute each vector's top-2 coarse blocks independently and check
    // the assigned fine centroid's block is among them
    val centRows = cents.select("centroid_id", "centroid")
      .as[(Int, Seq[Double])].collect().sortBy(_._1)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val d = a.zip(b).map { case (x, y) => x * y }.sum
      val r = d / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
      BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val reps = centRows.filter(_._1 % 4 == 0).map(c => (c._1 / 4, c._2))
    val vecs = e.select($"vec_id",
        $"embedding".cast("array<double>")).as[(Long, Seq[Double])]
      .collect().toMap
    val assigned = two.select("vec_id", "centroid_id")
      .as[(Long, Int)].collect()
    assigned.foreach { case (id, cid) =>
      val top2 = reps.map { case (bid, rep) => (bid, cos(vecs(id), rep)) }
        .sortBy { case (bid, s) => (-s, bid) }.take(2).map(_._1).toSet
      assert(top2.contains(cid / 4),
        s"vec $id assigned to block ${cid / 4} outside probed $top2")
    }
  }

  test("adaptive SemDeDup nlist keeps candidate pairs linear in n") {
    // the bucket stage of semanticDedupPortable at n and 2n: with
    // nlist = max(8, ⌈n/250⌉) expected cluster size is pinned, so
    // Σ c·(c-1)/2 candidate pairs grow ~linearly (a fixed nlist grows
    // them ~quadratically — 4x here)
    def pairsAt(n: Int): Double = {
      val rnd = new scala.util.Random(7)
      val e = (0L until n.toLong).map(i =>
        (i, Seq.fill(4)(rnd.nextGaussian().toFloat)))
        .toDF("vec_id", "embedding")
      val nlist = math.max(8, math.ceil(n / 250.0).toInt)
      val cents = SimilarityOps.ivfCentroidsPortable(e, "vec_id",
        "embedding", nlist)
      SimilarityOps.ivfAssign(e, "vec_id", "embedding", cents,
          simRound = Some(6))
        .groupBy("centroid_id").count()
        .agg(sum($"count" * ($"count" - 1) / 2)).head().getDouble(0)
    }
    val p1 = pairsAt(6400)
    val p2 = pairsAt(12800)
    // linear → ratio ≈ 2; quadratic → 4. Allow draw-imbalance headroom.
    assert(p2 / p1 < 3.0, s"pair growth ${p2 / p1} not linear ($p1 -> $p2)")
  }

  test("embeddingOutlierCard: planted far vector ranks first") {
    val dim = 4
    val rows = (0L until 30L).map { i =>
      val base = (0 until dim).map(d => ((i + d) % 5).toFloat / 10f)
      (i, base.toArray)
    } :+ (99L, Array.fill(dim)(50f)) // the broken embedding
    val df = rows.toDF("vec_id", "embedding")
    val out = SimilarityOps.embeddingOutlierCard(df, "vec_id",
      "embedding", k = 5).collect()
    assert(out.length == 5)
    val top = out.head
    assert(top.getLong(0) == 1L && top.getLong(1) == 99L)
    assert(top.getLong(2) == dim.toLong)
    // the planted vector's D² dwarfs every normal one's
    assert(top.getDouble(3) > 10.0 * out(1).getDouble(3))
    // ranks are 1..5 in order
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    // scores are non-increasing
    val scores = out.map(_.getDouble(3)).toSeq
    assert(scores == scores.sorted.reverse)
  }
}
