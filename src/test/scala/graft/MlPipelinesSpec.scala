package graft

import org.apache.spark.sql.functions._

import graft.ml.MlPipelines

class MlPipelinesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val lineitem = Tables
    .load(spark, "/root/testdata/sf0.001", "lineitem")
    .filter(col("l_orderkey") < 300)

  test("kfoldOOFPredictions yields exactly one prediction per input row") {
    val oof = MlPipelines.kfoldOOFPredictions(lineitem, "l_orderkey",
      Seq("l_quantity", "l_discount"), "l_extendedprice", 4)
    val n = lineitem.count()
    assert(oof.count() == n)
    // one row per (orderkey, ...) input — no dup/dropped ids across folds
    assert(oof.select("l_orderkey").count() == n)
    assert(oof.select("fold").distinct().count() == 4)
    // every row predicted by the model that did NOT see its fold: fold
    // column must match the group hash of the id
    val bad = oof.filter(
      graft.operators.SplitOps.hashBucket(col("l_orderkey"), 4) =!= col("fold"))
    assert(bad.count() == 0)
    oof.unpersist()
  }

  test("r2Weights reproduces the reference weighting rule by hand") {
    // raw = max(0.01, r2+1): 1.5, 0.01, 1.0 → sum 2.51
    val stats = Seq(("a", 0.5), ("b", -1.7), ("c", 0.0)).toDF("model", "r2")
    val w = MlPipelines.r2Weights(stats).orderBy("model")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("weight")).toMap
    assert(approx(w("a"), 1.5 / 2.51))
    assert(approx(w("b"), 0.01 / 2.51))
    assert(approx(w("c"), 1.0 / 2.51))
  }

  test("ensembleOOFWeighted: per-model + both ensemble rows, weights sum to 1") {
    val out = MlPipelines.ensembleOOFWeighted(lineitem, "l_orderkey",
      Seq("l_quantity", "l_discount"), "l_extendedprice", 3)
    val rows = out.collect()
    assert(rows.length == 6)
    // the row-key join must be 1:1 — n equals the input row count
    assert(rows.head.getLong(1) == lineitem.count())
    val models = rows.map(_.getString(0)).toSet
    assert(models == Set("ridge", "lasso", "random_forest",
      "gradient_boosting", "ensemble_avg", "ensemble_weighted"))
    val weights = rows.filter(r => !r.isNullAt(4)).map(_.getDouble(4))
    assert(weights.length == 4)
    assert(approx(weights.sum, 1.0, 1e-5))
    rows.foreach(r => assert(!r.isNullAt(2), s"missing rmse: $r"))
    out.unpersist()
  }

  test("classifyAndEvaluate without coalesce at 32 shuffle partitions matches") {
    val feats = lineitem.select(
      col("l_orderkey"), col("l_quantity"), col("l_discount"),
      (col("l_extendedprice") > 30000).cast("double").as("y"))
    val coalesced = MlPipelines.classifyAndEvaluate(
      feats, "l_orderkey", Seq("l_quantity", "l_discount"), "y").collect().toSeq
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    try {
      val wide = MlPipelines.classifyAndEvaluate(
        feats, "l_orderkey", Seq("l_quantity", "l_discount"), "y",
        partitions = 0).collect().toSeq
      assert(wide == coalesced)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("pipeline model save → load → re-score is bit-identical") {
    val feats = lineitem.select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity"), col("l_discount"),
      (col("l_extendedprice") > 30000).cast("double").as("y"))
    val (model, test) = MlPipelines.fitClassifierPipeline(
      feats, "l_orderkey", Seq("l_quantity", "l_discount"), "y")
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    model.write.overwrite().save(s"$dir/m")
    val reloaded = org.apache.spark.ml.PipelineModel.load(s"$dir/m")

    def score(m: org.apache.spark.ml.PipelineModel) =
      m.transform(test)
        .select(col("l_orderkey"), col("l_linenumber"), col("prediction"),
          col("probability").cast("string").as("prob"))
        .orderBy("l_orderkey", "l_linenumber", "prob")
        .collect().toSeq
    val a = score(model)
    val b = score(reloaded)
    assert(a.nonEmpty)
    assert(a == b, "reloaded model must reproduce identical predictions")
  }

  test("trainingHistory: monotone non-increasing objective + JSON artifact") {
    val feats = lineitem.select(
      col("l_orderkey"), col("l_quantity"), col("l_discount"),
      (col("l_extendedprice") > 30000).cast("double").as("y"))
    val (model, _) = MlPipelines.fitClassifierPipeline(
      feats, "l_orderkey", Seq("l_quantity", "l_discount"), "y")
    val hist = MlPipelines.trainingHistory(model).orderBy("iteration")
    val rows = hist.collect()
    assert(rows.length > 1, "expected more than one L-BFGS iteration")
    assert(rows.head.getLong(0) == 0L)
    val objs = rows.map(_.getDouble(1))
    // L-BFGS line search guarantees descent: each iteration's recorded
    // objective must not exceed its predecessor's (ties allowed)
    objs.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-12, s"objective rose: $a -> $b")
    }
    // results.json parity (reference train.py:277-296): the frame round-
    // trips through the JSON sink
    val dir = java.nio.file.Files.createTempDirectory("graft_hist").toString
    graft.sources.Sources.writeJson(hist, s"$dir/history")
    val back = spark.read.json(s"$dir/history")
    assert(back.count() == rows.length)
    assert(back.columns.toSet == Set("iteration", "objective"))
  }

  test("oofClosedFormOLS matches an in-test exact computation per fold") {
    val d = lineitem.select(
      graft.operators.SplitOps.hashBucket(col("l_orderkey"), 3).as("fold"),
      col("l_quantity").cast("double").as("x"),
      col("l_extendedprice").cast("double").as("y")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val got = MlPipelines.oofClosedFormOLS(lineitem, "l_orderkey",
      "l_quantity", "l_extendedprice", 3).orderBy("fold").collect()
    assert(got.length == 3)
    got.foreach { r =>
      val f = r.getLong(0)
      val tr = d.filter(_._1 != f)
      val te = d.filter(_._1 == f)
      val n = tr.length.toDouble
      val (sx, sy) = (tr.map(_._2).sum, tr.map(_._3).sum)
      val sxy = tr.map(t => t._2 * t._3).sum
      val sxx = tr.map(t => t._2 * t._2).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val intercept = (sy - slope * sx) / n
      assert(r.getLong(1) == tr.length, "n_train")
      assert(r.getLong(2) == te.length, "n_test")
      assert(approx(r.getDouble(3), slope, 1e-6), s"slope $f")
      assert(approx(r.getDouble(4), intercept, 1e-6), s"intercept $f")
      val rmse = math.sqrt(
        te.map(t => math.pow(t._3 - (intercept + slope * t._2), 2)).sum / te.length)
      assert(approx(r.getDouble(5), rmse, 1e-5), s"rmse $f")
    }
  }

  test("oofClosedFormRidge pins MLlib's ridge convention per fold") {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val lam = 1.0
    val got = MlPipelines.oofClosedFormRidge(lineitem, "l_orderkey",
      "l_quantity", "l_extendedprice", 3, lam).orderBy("fold").collect()
    assert(got.length == 3)
    val folded = graft.operators.SplitOps.withFold(lineitem, "l_orderkey", 3)
      .select(col("fold"), col("l_quantity").cast("double").as("x"),
        col("l_extendedprice").cast("double").as("label"))
    got.foreach { r =>
      val f = r.getLong(0)
      // the real MLlib ridge on the same training complement: the closed
      // form must land within solver round-off of its coefficients
      val tr = new VectorAssembler().setInputCols(Array("x"))
        .setOutputCol("features")
        .transform(folded.filter(col("fold") =!= f))
      val m = new LinearRegression().setMaxIter(50).setRegParam(lam)
        .setElasticNetParam(0.0).fit(tr)
      assert(approx(r.getDouble(3), m.coefficients(0), 1e-5),
        s"fold $f slope: closed=${r.getDouble(3)} mllib=${m.coefficients(0)}")
      assert(approx(r.getDouble(4), m.intercept, 1e-5),
        s"fold $f intercept: closed=${r.getDouble(4)} mllib=${m.intercept}")
    }
    // λ = 0 degenerates to the OLS twin exactly
    val ols = MlPipelines.oofClosedFormOLS(lineitem, "l_orderkey",
      "l_quantity", "l_extendedprice", 3).orderBy("fold").collect()
    val ridge0 = MlPipelines.oofClosedFormRidge(lineitem, "l_orderkey",
      "l_quantity", "l_extendedprice", 3, 0.0).orderBy("fold").collect()
    ols.zip(ridge0).foreach { case (a, b) =>
      assert(approx(a.getDouble(3), b.getDouble(3), 1e-9), "λ=0 slope ≡ OLS")
      assert(approx(a.getDouble(4), b.getDouble(4), 1e-9), "λ=0 intercept ≡ OLS")
    }
  }

  test("ridgeGridClosedForm: pooled RMSE consistent with per-fold ridge, one argmin flag") {
    val lambdas = Seq(0.01, 0.1, 1.0, 10.0)
    val grid = MlPipelines.ridgeGridClosedForm(lineitem, "l_orderkey",
      "l_quantity", "l_extendedprice", 3, lambdas).orderBy("lambda").collect()
    assert(grid.map(_.getDouble(0)).toSeq == lambdas)
    // exactly one winner, and it is the minimum pooled RMSE (λ asc tiebreak)
    assert(grid.map(_.getInt(2)).sum == 1)
    val best = grid.filter(_.getInt(2) == 1).head
    assert(best.getDouble(1) == grid.map(_.getDouble(1)).min)
    // each λ's pooled RMSE re-derives from oofClosedFormRidge's per-fold
    // rows: pooled² · Σn_f == Σ rmse_f² · n_f (same residuals, two
    // groupings; fold-level round-6 → loose relative tolerance)
    lambdas.foreach { lam =>
      val perFold = MlPipelines.oofClosedFormRidge(lineitem, "l_orderkey",
        "l_quantity", "l_extendedprice", 3, lam).collect()
      val nTot = perFold.map(_.getLong(2)).sum
      val pooled = math.sqrt(
        perFold.map(r => r.getDouble(5) * r.getDouble(5) * r.getLong(2)).sum / nTot)
      val got = grid.find(_.getDouble(0) == lam).get.getDouble(1)
      assert(approx(got, pooled, 1e-6), s"λ=$lam pooled=$got perFold=$pooled")
    }
  }

  test("ridgeGridClosedForm: a perfect linear target makes λ=0 exact and shrinkage monotone") {
    import spark.implicits._
    val d = (1L to 300L).map(i => (i, i.toDouble % 37, 3.0 * (i.toDouble % 37)))
      .toDF("id", "x", "y")
    val grid = MlPipelines.ridgeGridClosedForm(d, "id", "x", "y", 3,
      Seq(0.0, 0.5, 2.0, 8.0)).orderBy("lambda").collect()
    // y = 3x exactly: the unpenalized fit reproduces it → zero OOF error
    assert(grid.head.getDouble(1) <= 1e-6)
    assert(grid.head.getInt(2) == 1)
    // shrinking a perfect fit can only hurt, monotonically in λ
    val rmses = grid.map(_.getDouble(1)).toSeq
    assert(rmses == rmses.sorted)
    assert(rmses.distinct.size == rmses.size)
  }

  test("irlsLogisticPortable converges to MLlib's LogisticRegression") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val d = lineitem.withColumn("bin",
      (col("l_returnflag") =!= "N").cast("double"))
    val trace = MlPipelines.irlsLogisticPortable(d, "l_quantity", "bin",
      iters = 8).orderBy("iter").collect()
    assert(trace.length == 8)
    // the first step's loss is exactly the (0,0)-params loss, ln 2
    assert(approx(trace.head.getDouble(3), -math.log(2.0), 1e-4))
    // log-loss non-decreasing toward 0 along the trace (Newton ascent on
    // the concave log-likelihood from a cold start on non-separable data)
    val lls = trace.map(_.getDouble(3)).toSeq
    assert(lls == lls.sorted, s"log-loss not monotone: $lls")
    // converged: the last two steps agree to well past output rounding
    assert(math.abs(trace(7).getDouble(1) - trace(6).getDouble(1)) <= 1e-6)
    assert(math.abs(trace(7).getDouble(2) - trace(6).getDouble(2)) <= 1e-6)
    // and the fixed point is MLlib's unregularized logistic fit
    val tr = new VectorAssembler().setInputCols(Array("l_quantity"))
      .setOutputCol("features")
      .transform(d.select(col("l_quantity").cast("double"),
        col("bin").as("label")))
    val m = new LogisticRegression().setRegParam(0.0).setMaxIter(200)
      .setTol(1e-9).fit(tr)
    assert(approx(trace(7).getDouble(1), m.intercept, 1e-4),
      s"b0 irls=${trace(7).getDouble(1)} mllib=${m.intercept}")
    assert(approx(trace(7).getDouble(2), m.coefficients(0), 1e-4),
      s"b1 irls=${trace(7).getDouble(2)} mllib=${m.coefficients(0)}")
  }

  test("irlsLogistic2Portable converges to MLlib's two-feature fit") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val d = lineitem.withColumn("bin",
      (col("l_returnflag") =!= "N").cast("double"))
    val trace = MlPipelines.irlsLogistic2Portable(d, "l_quantity",
      "l_discount", "bin", iters = 8).orderBy("iter").collect()
    assert(trace.length == 8)
    assert(approx(trace.head.getDouble(4), -math.log(2.0), 1e-4))
    // converged to a fixed point
    assert(math.abs(trace(7).getDouble(1) - trace(6).getDouble(1)) <= 1e-6)
    assert(math.abs(trace(7).getDouble(2) - trace(6).getDouble(2)) <= 1e-6)
    assert(math.abs(trace(7).getDouble(3) - trace(6).getDouble(3)) <= 1e-6)
    val tr = new VectorAssembler()
      .setInputCols(Array("l_quantity", "l_discount"))
      .setOutputCol("features")
      .transform(d.select(col("l_quantity").cast("double"),
        col("l_discount").cast("double"), col("bin").as("label")))
    val m = new LogisticRegression().setRegParam(0.0).setMaxIter(200)
      .setTol(1e-9).fit(tr)
    assert(approx(trace(7).getDouble(1), m.intercept, 1e-4),
      s"b0 irls=${trace(7).getDouble(1)} mllib=${m.intercept}")
    assert(approx(trace(7).getDouble(2), m.coefficients(0), 1e-4),
      s"b1 irls=${trace(7).getDouble(2)} mllib=${m.coefficients(0)}")
    assert(approx(trace(7).getDouble(3), m.coefficients(1), 1e-4),
      s"b2 irls=${trace(7).getDouble(3)} mllib=${m.coefficients(1)}")
  }

  // planted two-level fixture shared by the CART tests: the true tree is
  //   x1 <= 5 ? (x2 <= 0.1 ? 10 : 20) : (x2 <= 0.2 ? 40 : 80)
  // with region means far apart so every variance-gain argmax is unique
  private lazy val cartFixture = {
    val rows = (1L to 400L).map { id =>
      val x1 = (id % 10 + 1).toDouble
      val x2 = (id / 10 % 5).toDouble * 0.1
      val y =
        if (x1 <= 5.0) { if (x2 <= 0.1) 10.0 else 20.0 }
        else { if (x2 <= 0.2) 40.0 else 80.0 }
      (id, x1, x2, y)
    }
    rows.toDF("id", "x1", "x2", "y")
  }

  test("cartTreePortable recovers the planted tree and exact region means") {
    val model = MlPipelines.cartTreePortable(cartFixture, "id", "x1", "x2",
      col("y"), maxDepth = 2, minLeaf = 5).collect()
    val byNode = model.map(r => r.getLong(0) -> r).toMap
    // root splits on x1 at the planted boundary 5.0
    assert(byNode(1L).getString(2) == "split")
    assert(byNode(1L).getString(3) == "x1")
    assert(byNode(1L).getDouble(4) == 5.0)
    // both children split on x2 at their planted boundaries
    assert(byNode(2L).getString(3) == "x2" &&
      approx(byNode(2L).getDouble(4), 0.1, 1e-12))
    assert(byNode(3L).getString(3) == "x2" &&
      approx(byNode(3L).getDouble(4), 0.2, 1e-12))
    // leaves carry the exact planted region means
    assert(byNode(4L).getDouble(7) == 10.0)
    assert(byNode(5L).getDouble(7) == 20.0)
    assert(byNode(6L).getDouble(7) == 40.0)
    assert(byNode(7L).getDouble(7) == 80.0)
    // node ids are heap-ordered, n_rows conserved parent = left + right
    assert(byNode(1L).getLong(5) ==
      byNode(2L).getLong(5) + byNode(3L).getLong(5))
  }

  test("cartTreePortable predictions pin MLlib's DecisionTreeRegressor") {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.DecisionTreeRegressor
    val model = MlPipelines.cartTreePortable(cartFixture, "id", "x1", "x2",
      col("y"), maxDepth = 3, minLeaf = 5)
    // MLlib sees the IDENTICAL train rows (the same hash split the
    // portable fit applies internally)
    val train = cartFixture.filter(
      graft.operators.SplitOps.hashBucket(col("id"), 5) =!= 0)
    val tr = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features")
      .transform(train.withColumnRenamed("y", "label"))
    val dt = new DecisionTreeRegressor().setMaxDepth(3)
      .setMinInstancesPerNode(5).fit(tr)
    val scored = dt.transform(tr)
      .withColumn("portable",
        MlPipelines.cartPredict(model, "x1", "x2"))
      .select("prediction", "portable").collect()
    assert(scored.nonEmpty)
    scored.foreach { r =>
      assert(approx(r.getDouble(0), r.getDouble(1), 1e-6),
        s"mllib=${r.getDouble(0)} portable=${r.getDouble(1)}")
    }
  }

  test("powerIterationPC1: planted single-direction data recovers share 1 and the exact variance") {
    import spark.implicits._
    // all variance lives on dim 0: λ₁ = population var of x, share = 1
    val xs = (1 to 200).map(_.toDouble)
    val e = xs.zipWithIndex
      .map { case (x, i) => (i.toLong, Seq(x.toFloat, 0f, 0f, 0f)) }
      .toDF("vec_id", "embedding")
    val trace = MlPipelines.powerIterationPC1(e, "vec_id", "embedding",
      dim = 4, iters = 5).orderBy("iter").collect()
    val n = xs.size
    val mean = xs.sum / n
    val popVar = xs.map(x => (x - mean) * (x - mean)).sum / n
    assert(approx(trace.last.getDouble(1), popVar, 1e-6),
      s"λ1=${trace.last.getDouble(1)} popVar=$popVar")
    assert(math.abs(trace.last.getDouble(2) - 1.0) <= 1e-6)
  }

  test("powerIterationPC1 converges to MLlib PCA's top explained-variance share") {
    import spark.implicits._
    // a SPECTRALLY-GAPPED fixture: strong signal along one fixed direction
    // plus small isotropic noise — λ₁ ≫ λ₂, so 30 power steps converge.
    // (The real synthetic embeddings are near-isotropic — λ₂/λ₁ ≈ 1 —
    // where power iteration legitimately needs hundreds of steps; the
    // q191 trace is still deterministic and oracle-green there, but an
    // MLlib comparison belongs on a gapped spectrum.)
    val rnd = new scala.util.Random(11)
    val dim = 16
    val u = Array.tabulate(dim)(i => math.cos(i * 0.7))
    val e = (0 until 300).map { r =>
      val s = rnd.nextGaussian() * 5.0
      (r.toLong, Array.tabulate(dim)(i =>
        (s * u(i) + rnd.nextGaussian() * 0.3).toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val trace = MlPipelines.powerIterationPC1(e, "vec_id", "embedding",
      dim = dim, iters = 30).orderBy("iter").collect()
    val last = trace(29).getDouble(1)
    val prev = trace(28).getDouble(1)
    assert(math.abs(last - prev) <= 1e-6 * math.max(1.0, last),
      s"not converged: $prev -> $last")
    // share of trace == MLlib's top explained-variance ratio (population
    // vs sample covariance scaling cancels in the ratio)
    val mllib = MlPipelines.pcaExplainedVariance(e, "embedding", 3)
      .orderBy("component").collect()
    assert(approx(trace(29).getDouble(2), mllib.head.getDouble(1), 1e-3),
      s"share=${trace(29).getDouble(2)} mllib=${mllib.head.getDouble(1)}")
  }

  test("irlsLogisticWeightedPortable matches MLlib's weighted logistic fit") {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    val d = lineitem.withColumn("bin",
      (col("l_returnflag") =!= "N").cast("double"))
    val trace = MlPipelines.irlsLogisticWeightedPortable(d, "l_quantity",
      "bin", iters = 8).orderBy("iter").collect()
    assert(trace.length == 8)
    // converged fixed point
    assert(math.abs(trace(7).getDouble(1) - trace(6).getDouble(1)) <= 1e-6)
    // MLlib on the SAME balanced weights via weightCol
    val base = d.select(col("l_quantity").cast("double"),
      col("bin").as("label"))
    val n = base.count()
    val npos = base.filter(col("label") === 1.0).count()
    val (wpos, wneg) = (n.toDouble / (2.0 * npos),
      n.toDouble / (2.0 * (n - npos)))
    val tr = new VectorAssembler().setInputCols(Array("l_quantity"))
      .setOutputCol("features")
      .transform(base.withColumn("w",
        when(col("label") === 1.0, wpos).otherwise(wneg)))
    val m = new LogisticRegression().setRegParam(0.0).setWeightCol("w")
      .setMaxIter(200).setTol(1e-9).fit(tr)
    assert(approx(trace(7).getDouble(1), m.intercept, 1e-4),
      s"b0 irls=${trace(7).getDouble(1)} mllib=${m.intercept}")
    assert(approx(trace(7).getDouble(2), m.coefficients(0), 1e-4),
      s"b1 irls=${trace(7).getDouble(2)} mllib=${m.coefficients(0)}")
    // balanced weighting must actually CHANGE the fit vs the unweighted twin
    val unw = MlPipelines.irlsLogisticPortable(d, "l_quantity", "bin",
      iters = 8).orderBy("iter").collect()
    assert(math.abs(unw(7).getDouble(2) - trace(7).getDouble(2)) > 1e-9)
  }

  test("multiTaskMasked fails with a clear message when a mask empties train") {
    val d = lineitem.select(
      col("l_orderkey"), col("l_quantity"), col("l_discount"),
      lit(null).cast("double").as("all_masked"))
    val e = intercept[IllegalArgumentException] {
      MlPipelines.multiTaskMasked(d, "l_orderkey",
        Seq("l_quantity", "l_discount"),
        Seq(MlPipelines.TaskSpec("dead", "all_masked", classification = false)))
    }
    assert(e.getMessage.contains("dead"))
    assert(e.getMessage.contains("train split is empty"))
  }

  test("multiTaskMasked trains each task only on its own non-null rows") {
    // two tasks with complementary masks over one frame: t_reg is non-null
    // on even keys, t_cls on odd keys — so the per-task train/test counts
    // must equal the split counts of each task's OWN mask, proving masked
    // rows never reach an estimator
    val d = lineitem.select(
      col("l_orderkey"), col("l_quantity"), col("l_discount"),
      when(col("l_orderkey") % 2 === 0, col("l_extendedprice")).as("t_reg"),
      when(col("l_orderkey") % 2 === 1,
        (col("l_discount") >= 0.05).cast("double")).as("t_cls"))
    val out = MlPipelines.multiTaskMasked(d, "l_orderkey",
      Seq("l_quantity", "l_discount"),
      Seq(MlPipelines.TaskSpec("t_reg", "t_reg", classification = false),
        MlPipelines.TaskSpec("t_cls", "t_cls", classification = true)))
      .orderBy("task").collect()
    assert(out.length == 2)

    def splitCounts(maskCol: String) = {
      val m = graft.operators.SplitOps.withSplit(
        d.filter(col(maskCol).isNotNull), "l_orderkey")
      (m.filter(col("split") === "train").count(),
        m.filter(col("split") === "test").count())
    }
    val Array(cls, reg) = out
    assert(reg.getString(0) == "t_reg" && reg.getString(1) == "regression")
    assert(cls.getString(0) == "t_cls" && cls.getString(1) == "classification")
    val (regTrain, regTest) = splitCounts("t_reg")
    val (clsTrain, clsTest) = splitCounts("t_cls")
    assert(reg.getLong(2) == regTrain && reg.getLong(3) == regTest)
    assert(cls.getLong(2) == clsTrain && cls.getLong(3) == clsTest)
    // complementary masks: coverages sum to 1 over the shared frame
    assert(approx(reg.getDouble(4) + cls.getDouble(4), 1.0, 1e-6))
    assert(reg.getString(5) == "rmse" && reg.getDouble(6) >= 0.0)
    val acc = cls.getDouble(6)
    assert(cls.getString(5) == "accuracy" && acc >= 0.0 && acc <= 1.0)
  }

  test("boostedStumpsPortable recovers a planted stump and descends monotonically") {
    val cands = Seq(("l_quantity", 10.0), ("l_quantity", 20.0),
      ("l_quantity", 30.0), ("l_discount", 0.05))
    // exact stump target: y = 100 left of quantity<=20, 500 right — the
    // grid contains the true split, so round 1 must choose it and each
    // 0.5-shrinkage round then halves the residual on BOTH sides
    val trace = MlPipelines.boostedStumpsPortable(lineitem, "l_orderkey",
      "l_quantity", "l_discount",
      when(col("l_quantity") <= 20.0, 100.0).otherwise(500.0),
      cands, iters = 5).orderBy("iter").collect()
    assert(trace.length == 5)
    assert(trace.head.getString(1) == "l_quantity")
    assert(trace.head.getDouble(2) == 20.0)
    val trainRmse = trace.map(_.getAs[Double]("train_rmse")).toSeq
    assert(trainRmse == trainRmse.sorted.reverse,
      s"train rmse not non-increasing: $trainRmse")
    // geometric descent on a perfectly-separable target
    assert(trainRmse.last < trainRmse.head / 4.0,
      s"no real descent: $trainRmse")
    // exactly one best checkpoint
    assert(trace.map(_.getAs[Int]("is_best")).sum == 1)
    // chosen splits always come from the candidate grid
    trace.foreach { r =>
      assert(cands.contains((r.getString(1), r.getDouble(2))))
    }
  }

  test("multiTaskMaskedPortable: masks honored, heads match single-task MLlib fits") {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val d = lineitem
      .withColumn("t_reg",
        when(col("l_orderkey") % 2 === 0, col("l_extendedprice")))
      .withColumn("t_cls",
        when(col("l_orderkey") % 2 === 1,
          (col("l_discount") >= 0.05).cast("double")))
    val out = MlPipelines.multiTaskMaskedPortable(d, "l_quantity",
      "t_reg", "t_cls", iters = 8).orderBy("task").collect()
    assert(out.length == 2)
    val Array(cls, reg) = out
    assert(reg.getString(0) == "reg" && cls.getString(0) == "cls")
    // each head saw exactly its own mask's rows
    assert(reg.getLong(1) == d.filter(col("t_reg").isNotNull).count())
    assert(cls.getLong(1) == d.filter(col("t_cls").isNotNull).count())
    // regression head IS the OLS fit of the masked rows — pin vs MLlib
    val tr = new VectorAssembler().setInputCols(Array("x"))
      .setOutputCol("features")
      .transform(d.filter(col("t_reg").isNotNull)
        .select(col("l_quantity").cast("double").as("x"),
          col("t_reg").cast("double").as("label")))
    val m = new LinearRegression().setRegParam(0.0).setMaxIter(200)
      .setTol(1e-10).fit(tr)
    assert(approx(reg.getDouble(2), m.intercept, 1e-3),
      s"intercept ols=${reg.getDouble(2)} mllib=${m.intercept}")
    assert(approx(reg.getDouble(3), m.coefficients(0), 1e-3),
      s"coef ols=${reg.getDouble(3)} mllib=${m.coefficients(0)}")
    // classification head is the converged IRLS fixed point of ITS mask
    val irls = MlPipelines.irlsLogisticPortable(
      d.filter(col("t_cls").isNotNull), "l_quantity", "t_cls", iters = 8)
      .orderBy("iter").collect()
    assert(cls.getDouble(2) == irls(7).getDouble(1))
    assert(cls.getDouble(3) == irls(7).getDouble(2))
    assert(cls.getDouble(4) == irls(7).getDouble(3))
  }

  test("mlpForwardPortable: hand-computed forward pass; deciles partition the corpus") {
    import spark.implicits._
    import graft.ml.MlPipelines.mlpPortableWeight
    // two-point fixture: mu=(1,2), sd=(1,2) → z rows (−1,−1) and (1,1)
    val d = Seq((0.0, 0.0), (2.0, 4.0)).toDF("x1", "x2")
    def r(v: Double, s: Int) = BigDecimal(v)
      .setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fwd(z1: Double, z2: Double): Double = {
      val h = (0 until 4).map { j =>
        val z = mlpPortableWeight(s"b1_$j") +
          mlpPortableWeight(s"w1_${j}_0") * z1 +
          mlpPortableWeight(s"w1_${j}_1") * z2
        r(1.0 - 2.0 / (math.exp(2.0 * z) + 1.0), 9)
      }
      val o = (0 until 4).foldLeft(mlpPortableWeight("b2")) {
        (a, j) => a + mlpPortableWeight(s"v_$j") * h(j)
      }
      r(1.0 / (1.0 + math.exp(-o)), 6)
    }
    val expected = Seq(fwd(-1.0, -1.0), fwd(1.0, 1.0))
      .groupBy(p => math.min(math.floor(p * 10).toLong, 9L))
      .map { case (dec, ps) =>
        (dec, ps.length.toLong, r(ps.sum / ps.length, 6)) }.toSet
    val got = MlPipelines.mlpForwardPortable(d, "x1", "x2").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getDouble(2))).toSet
    assert(got == expected, s"got $got expected $expected")
    // the weights draw is fixed and bounded
    assert(math.abs(mlpPortableWeight("b2")) <= 1.0)
    // corpus sweep: the decile histogram partitions every input row
    val full = MlPipelines.mlpForwardPortable(lineitem,
      "l_quantity", "l_discount")
    assert(full.agg(sum("n")).head().getLong(0) == lineitem.count())
  }

  test("plattCalibrationCard: overconfident scorer repaired, ECE drops") {
    import spark.implicits._
    // scores cluster in [0.8, 1.0) while only half the labels are
    // positive — raw ECE ~0.4; the fitted sigmoid collapses toward the
    // base rate and calibrated ECE must shrink
    val rows = (0 until 400).map(k =>
      (0.8 + (k % 20) * 0.01, k % 2))
    val df = rows.toDF("score", "label")
    val card = MlPipelines.plattCalibrationCard(df, "score", "label")
      .collect()
    assert(card.nonEmpty)
    val eceRaw = card.head.getAs[Double]("ece_raw")
    val eceCal = card.head.getAs[Double]("ece_cal")
    assert(eceRaw > 0.25, s"fixture should be badly calibrated: $eceRaw")
    assert(eceCal < eceRaw / 4.0,
      s"Platt must repair the overconfidence: raw=$eceRaw cal=$eceCal")
    // calibrated means sit near the 0.5 base rate in every occupied bin
    card.foreach { r =>
      assert(math.abs(r.getAs[Double]("avg_cal") - 0.5) < 0.05, r.toString)
    }
  }

  test("plattCalibrationCard: negative margins clamp into bin 0, never negative bins") {
    import spark.implicits._
    // raw Platt inputs are often margins, not probabilities — scores in
    // [-2, 2] must land in [0, bins) (the unclamped floor gave bin -20
    // for score -2), and the monotone margin still calibrates
    val rows = (0 until 400).map { k =>
      val margin = -2.0 + (k % 40) * 0.1
      (margin, if (margin > 0.0) 1 else 0)
    }
    val card = MlPipelines.plattCalibrationCard(
      rows.toDF("score", "label"), "score", "label", rawScale = 6)
      .collect()
    val binIds = card.map(_.getAs[Long]("bin"))
    assert(binIds.forall(b => b >= 0L && b <= 9L), binIds.mkString(","))
    assert(binIds.min == 0L && binIds.max == 9L)
    // everything below 0 pools into bin 0; its calibrated mean must sit
    // well under the positive tail's
    val byBin = card.map(r => r.getAs[Long]("bin") -> r).toMap
    assert(byBin(0L).getAs[Double]("avg_cal") <
      byBin(9L).getAs[Double]("avg_cal"))
  }

  test("oofTargetEncoding: hand-computed leave-one-fold-out means with fallback") {
    import spark.implicits._
    // hashBucket(key, 2) reduces to key % 2 here; cat A spans both folds,
    // cat B sits entirely in fold 0 → global-OOF fallback
    val df = Seq(
      (2L, "A", 1.0), (4L, "A", 3.0),    // A fold 0: n=2 s=4
      (1L, "A", 5.0),                    // A fold 1: n=1 s=5
      (6L, "B", 10.0), (8L, "B", 20.0))  // B fold 0 only: n=2 s=30
      .toDF("k", "cat", "y")
    val r = MlPipelines.oofTargetEncoding(df, "cat", "y", "k", k = 2)
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x).toMap
    assert(r(("A", 0L)).getAs[Double]("enc") == 5.0)   // (9-4)/(3-2)
    assert(r(("A", 1L)).getAs[Double]("enc") == 2.0)   // (9-5)/(3-1)
    // B fold 0: no other fold has B → global OOF over fold!=0:
    // (39 - 34) / (5 - 4) = 5.0
    assert(r(("B", 0L)).getAs[Double]("enc") == 5.0)
    assert(r(("A", 0L)).getAs[Long]("n_rows") == 2L)
    assert(r.size == 3)
  }

  test("gaussianNbPortable: separable planted classes are classified perfectly") {
    // class "lo" ~ x1 in [0,9], class "hi" ~ x1 in [100,109]; x2 is noise
    // shared by both — NB must recover the split from x1 alone
    val rows = (0L until 200L).map { k =>
      val cls = if (k % 2 == 0) "lo" else "hi"
      val base = if (cls == "lo") 0.0 else 100.0
      (k, cls, base + (k % 10).toDouble, (k % 7).toDouble)
    }
    val df = rows.toDF("k", "cls", "x1", "x2")
    val cm = MlPipelines.gaussianNbPortable(df, "k", "cls", "x1", "x2")
      .collect()
    assert(cm.forall(r =>
      r.getAs[String]("actual") == r.getAs[String]("predicted")),
      s"misclassifications: ${cm.mkString(";")}")
    // the confusion matrix partitions the test split exactly
    val nTest = df.filter(
      graft.operators.SplitOps.hashBucket(col("k"), 10) >= 7).count()
    assert(cm.map(_.getAs[Long]("n_rows")).sum == nTest)
  }

  test("gaussianNbPortable on lineitem: test-split partition and class closure") {
    val cm = MlPipelines.gaussianNbPortable(lineitem,
      "l_orderkey", "l_returnflag", "l_quantity", "l_discount").collect()
    val classes = lineitem.select("l_returnflag").distinct()
      .collect().map(_.getString(0)).toSet
    assert(cm.map(_.getAs[String]("predicted")).toSet.subsetOf(classes))
    assert(cm.map(_.getAs[String]("actual")).toSet.subsetOf(classes))
    val nTest = lineitem.filter(
      graft.operators.SplitOps.hashBucket(col("l_orderkey"), 10) >= 7).count()
    assert(cm.map(_.getAs[Long]("n_rows")).sum == nTest)
    // determinism: the closed form has no seed to drift
    val again = MlPipelines.gaussianNbPortable(lineitem,
      "l_orderkey", "l_returnflag", "l_quantity", "l_discount").collect()
    assert(again.map(_.toString).toSeq == cm.map(_.toString).toSeq)
  }

  test("lassoCDPortable: objective descends, weak feature zeroed, fixed point is MLlib's lasso") {
    import org.apache.spark.ml.feature.VectorAssembler
    import org.apache.spark.ml.regression.LinearRegression
    val trace = MlPipelines.lassoCDPortable(lineitem,
      "l_quantity", "l_discount", "l_extendedprice",
      lambda = 100.0, sweeps = 12).orderBy("sweep").collect()
    assert(trace.length == 12)
    val objs = trace.map(_.getAs[Double]("objective")).toSeq
    assert(objs == objs.sorted.reverse, s"objective not non-increasing: $objs")
    // λ=100 prices out the near-uncorrelated discount coefficient exactly
    assert(trace.last.getAs[Double]("b2") == 0.0)
    assert(trace.last.getAs[Double]("b1") != 0.0)
    // fixed point: the same (1/2n)·SSE + λ‖b‖₁ objective MLlib minimizes
    // with elasticNetParam=1 and standardization off
    val tr = new VectorAssembler().setInputCols(Array("x1", "x2"))
      .setOutputCol("features")
      .transform(lineitem.select(
        col("l_quantity").cast("double").as("x1"),
        col("l_discount").cast("double").as("x2"),
        col("l_extendedprice").cast("double").as("label")))
    val m = new LinearRegression().setElasticNetParam(1.0)
      .setRegParam(100.0).setStandardization(false)
      .setMaxIter(500).setTol(1e-10).fit(tr)
    val b1 = trace.last.getAs[Double]("b1")
    val b0 = trace.last.getAs[Double]("intercept")
    assert(math.abs(b1 - m.coefficients(0)) <=
      math.max(1e-3, math.abs(m.coefficients(0)) * 1e-3),
      s"b1 cd=$b1 mllib=${m.coefficients(0)}")
    assert(math.abs(m.coefficients(1)) <= 1e-6,
      s"mllib kept the weak feature: ${m.coefficients(1)}")
    assert(math.abs(b0 - m.intercept) <=
      math.max(1e-2, math.abs(m.intercept) * 1e-3),
      s"b0 cd=$b0 mllib=${m.intercept}")
  }

  test("learningCurveRidge: exact line recovered at lambda 0, nested " +
      "fractions grow the train set") {
    val df = (1L to 400L).map(i => (i, i.toDouble % 37,
      3.0 * (i.toDouble % 37) + 2.0)).toDF("id", "x", "y")
    val rows = MlPipelines.learningCurveRidge(df, "id", "x", "y",
      lambda = 0.0).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(25L, 50L, 100L))
    val nTrains = rows.map(_.getLong(1)).toSeq
    assert(nTrains == nTrains.sorted && nTrains.distinct == nTrains,
      s"nested fractions must strictly grow: $nTrains")
    // same fixed holdout for every curve point
    assert(rows.map(_.getLong(2)).distinct.length == 1)
    rows.foreach { r =>
      assert(r.getDouble(3) == 3.0 && r.getDouble(4) == 2.0)
      assert(r.getDouble(5) == 0.0, "perfect line has zero holdout RMSE")
    }
  }

  test("learningCurveRidge: ridge shrinkage lowers the slope magnitude " +
      "vs lambda 0") {
    val df = (1L to 400L).map(i => (i, i.toDouble % 37,
      3.0 * (i.toDouble % 37) + (i % 11).toDouble)).toDF("id", "x", "y")
    val l0 = MlPipelines.learningCurveRidge(df, "id", "x", "y", 0.0)
      .filter(col("fraction_pct") === 100L).head().getDouble(3)
    val l5 = MlPipelines.learningCurveRidge(df, "id", "x", "y", 5.0)
      .filter(col("fraction_pct") === 100L).head().getDouble(3)
    assert(math.abs(l5) < math.abs(l0))
  }

  test("confidentLearningCard: planted label flips land off-diagonal") {
    // hashBucket(k, 10) is k % 10 for small keys (the splitter caveat),
    // so: train = residues 0..6 (kept CLEAN so the fit is sound), test =
    // 7..9. Half of residue 8 (true class "lo") wears the wrong "hi"
    // label while keeping lo-features → those rows must surface at
    // (hi → lo); the clean half anchors t_lo. Features vary via k/10 so
    // no residue pins a constant feature value.
    val rows = (0L until 400L).map { k =>
      val trueCls = if (k % 2 == 0) "lo" else "hi"
      val flipped = k % 10 == 8 && (k / 10) % 2 == 0
      val given = if (!flipped) trueCls else "hi"
      val base = if (trueCls == "lo") 0.0 else 100.0
      (k, given, base + ((k / 10) % 5).toDouble,
        base + ((k / 10 + 2) % 5).toDouble)
    }
    val df = rows.toDF("k", "cls", "x1", "x2")
    val out = MlPipelines.confidentLearningCard(df, "k", "cls", "x1", "x2")
      .collect()
    val cells = out.map(r => (r.getString(0), r.getString(1)) ->
      r.getLong(2)).toMap
    assert(cells.contains(("hi", "lo")), s"cells: $cells")
    assert(cells(("hi", "lo")) == 20L, s"cells: $cells")
    assert(cells(("lo", "lo")) == 20L, s"cells: $cells")
    assert(cells(("hi", "hi")) == 80L, s"cells: $cells")
    assert(!cells.contains(("lo", "hi")), s"cells: $cells")
    // thresholds are probabilities
    out.foreach { r =>
      val t = r.getDouble(3)
      assert(t > 0.0 && t <= 1.0)
    }
  }

  test("confidentLearningCard: clean labels stay diagonal-only") {
    val rows = (0L until 300L).map { k =>
      val cls = if (k % 2 == 0) "lo" else "hi"
      val base = if (cls == "lo") 0.0 else 100.0
      (k, cls, base + ((k / 10) % 5).toDouble,
        base + ((k / 10 + 1) % 5).toDouble)
    }
    val df = rows.toDF("k", "cls", "x1", "x2")
    val out = MlPipelines.confidentLearningCard(df, "k", "cls", "x1", "x2")
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r.getString(0) == r.getString(1)),
      s"unexpected off-diagonal: ${out.mkString(";")}")
  }
}
