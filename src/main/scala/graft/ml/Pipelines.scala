package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.StandardScaler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.collection.parallel.CollectionConverters._
import graft.operators.SplitOps

/** MLlib pipeline builders mirroring the reference's training surface:
  * fit-on-train standardization (M1, `/root/reference/src/data/dataset.py:117-123`),
  * hash-based leakage-safe splits (M2), classification/regression estimators
  * (M4/M7, `/root/reference/scripts/train_ensemble.py:134-143`), and K-fold
  * out-of-fold prediction (M8, `train_ensemble.py:150-158`).
  *
  * Training data never leaves the executors: splits are column predicates,
  * scaling is a distributed fit, and metrics come back as tiny DataFrames.
  */
object MlPipelines {

  /** Classification on an embedding column: deterministic group split,
    * standardize on train only, logistic regression, per-class test
    * precision/recall. Returns one row per class.
    */
  def logRegOnEmbeddings(embeddings: DataFrame, idCol: String,
      vecCol: String, labelCol: String): DataFrame = {
    val data = SplitOps.withSplit(embeddings, idCol)
      .withColumn("features_raw", array_to_vector(col(vecCol)))
      .withColumn("label", col(labelCol).cast("double"))
    val train = data.filter(col("split") === "train")
    val test = data.filter(col("split") === "test")

    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
      .fit(train)
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setFeaturesCol("features")
      .fit(scaler.transform(train))

    val pred = lr.transform(scaler.transform(test))
      .select(col("label"), col("prediction"))
    pred.groupBy(col("label")).agg(
      count(lit(1)).as("n"),
      sum(when(col("prediction") === col("label"), 1).otherwise(0)).as("n_correct"))
      .withColumn("recall", round(col("n_correct") / col("n"), 6))
  }

  /** Class-weighted logistic regression (reference M11/A11: inverse-
    * frequency weights — `/root/reference/src/training/trainer.py:352-366`
    * — fed to the estimator's weightCol). Returns per-class recall so the
    * minority-class lift is visible.
    */
  def weightedLogReg(embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val data = SplitOps.withSplit(embeddings, idCol)
      .withColumn("features", array_to_vector(col(vecCol)))
      .withColumn("label", col(labelCol).cast("double"))
    val train = data.filter(col("split") === "train")
    val test = data.filter(col("split") === "test")
    // the shared M11 weight definition, computed distributed and joined
    // back — never collected
    val weights = graft.metrics.MetricQueries
      .inverseFrequencyWeights(train, "label")
      .select("label", "weight")
    val trainW = train.join(broadcast(weights), "label")
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setWeightCol("weight")
      .fit(trainW)
    lr.transform(test)
      .groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        round(sum(when(col("prediction") === col("label"), 1).otherwise(0)) /
          count(lit(1)).cast("double"), 6).as("recall"))
  }

  /** MLP classifier (reference M4 — the MLlib analog of the reference's
    * residual MLP; layer sizes input→hidden…→classes, no
    * LayerNorm/residual, divergence documented in SURVEY §2.9).
    */
  def mlpOnEmbeddings(embeddings: DataFrame, idCol: String, vecCol: String,
      labelCol: String, hidden: Seq[Int], partitions: Int = 2): DataFrame = {
    import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
    val base = SplitOps.withSplit(embeddings, idCol)
      .withColumn("features", array_to_vector(col(vecCol)))
      .withColumn("label", col(labelCol).cast("double"))
    val data = if (partitions > 0) base.coalesce(partitions) else base
    val train = data.filter(col("split") === "train").cache()
    val test = data.filter(col("split") === "test")
    train.count()
    // element-type-agnostic dim probe (array<float> and array<double> both
    // read as array<double>); an empty train split fails with a clear
    // message instead of NoSuchElementException
    val probe = train.select(col(vecCol).cast("array<double>")).head(1)
    require(probe.nonEmpty,
      s"train split is empty — cannot derive MLP input dimension from '$vecCol'")
    val dim = probe.head.getSeq[Double](0).size
    // output layer sized by max label over the FULL frame — distinct-count
    // over train alone breaks for non-contiguous labels or classes the
    // split left out of train (MLP requires labels in [0, numClasses))
    val nClasses = data.agg(max(col("label"))).head().getDouble(0).toInt + 1
    val mlp = new MultilayerPerceptronClassifier()
      .setLayers((dim +: hidden :+ nClasses).toArray)
      .setMaxIter(40).setSeed(42)
      .fit(train)
    val out = mlp.transform(test)
      .groupBy(col("label")).agg(
        count(lit(1)).as("n"),
        round(sum(when(col("prediction") === col("label"), 1).otherwise(0)) /
          count(lit(1)).cast("double"), 6).as("recall"))
      .cache()
    out.count()
    train.unpersist()
    out
  }

  /** The reference's full §3.1 training-query shape on an arbitrary feature
    * frame: leakage-safe group split, standardize fitted on train only,
    * logistic regression, test-set accuracy + balanced accuracy
    * (reference M1/M2/M4 + X1/X2). One summary row.
    */
  def classifyAndEvaluate(features: DataFrame, idCol: String,
      featureCols: Seq[String], labelCol: String,
      partitions: Int = 2): DataFrame = {
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
      .transform(SplitOps.withSplit(features, idCol))
      .withColumn("label", col(labelCol).cast("double"))
    val data = if (partitions > 0) base.coalesce(partitions) else base
    val train = data.filter(col("split") === "train").cache()
    val test = data.filter(col("split") === "test")
    train.count()

    val scaler = new StandardScaler()
      .setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true).fit(train)
    val lr = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setFeaturesCol("features")
      .fit(scaler.transform(train))
    val pred = lr.transform(scaler.transform(test))
      .select(col("label"), col("prediction")).cache()
    pred.count()
    train.unpersist()

    val perClass = pred.groupBy(col("label")).agg(
      (sum(when(col("prediction") === col("label"), 1).otherwise(0)) /
        count(lit(1))).as("recall"))
    val out = pred.agg(
      count(lit(1)).as("n_test"),
      round(sum(when(col("prediction") === col("label"), 1).otherwise(0)) /
        count(lit(1)), 6).as("accuracy"))
      .crossJoin(perClass.agg(
        round(avg(col("recall")), 6).as("balanced_accuracy")))
      .cache()
    out.count()
    pred.unpersist()
    out
  }

  /** The q47 pipeline as a persistable `Pipeline` (assembler → scale-on-
    * train → logistic regression): the reference checkpoints its best model
    * and reloads it for inference
    * (`/root/reference/src/training/trainer.py:322-336`,
    * `evaluate.py:231-233`); the MLlib analog is `PipelineModel.save`/
    * `.load`, spec-verified to reproduce bit-identical predictions.
    * Returns (fitted model, test split).
    */
  def fitClassifierPipeline(features: DataFrame, idCol: String,
      featureCols: Seq[String], labelCol: String,
      partitions: Int = 2): (org.apache.spark.ml.PipelineModel, DataFrame) = {
    val base = SplitOps.withSplit(features, idCol)
      .withColumn("label", col(labelCol).cast("double"))
    val data = if (partitions > 0) base.coalesce(partitions) else base
    val train = data.filter(col("split") === "train")
    val test = data.filter(col("split") === "test")
    val pipeline = new org.apache.spark.ml.Pipeline().setStages(Array(
      new org.apache.spark.ml.feature.VectorAssembler()
        .setInputCols(featureCols.toArray).setOutputCol("features_raw"),
      new StandardScaler()
        .setInputCol("features_raw").setOutputCol("features")
        .setWithMean(true).setWithStd(true),
      new LogisticRegression()
        .setMaxIter(50).setRegParam(0.01).setFeaturesCol("features")))
    (pipeline.fit(train), test)
  }

  /** Per-iteration objective history of a fitted pipeline's logistic-
    * regression stage as a queryable frame (iteration, objective) — the
    * reference records per-epoch loss/metric history and dumps it to JSON
    * (`/root/reference/scripts/train.py:277-296`, `trainer.py:262-320`);
    * the MLlib L-BFGS training summary is the analog, surfaced here
    * instead of left buried on the model object. The frame is
    * driver-tiny (≤ maxIter rows) by construction; dump it with
    * [[graft.sources.Sources.writeJson]] for the results.json parity.
    */
  def trainingHistory(model: org.apache.spark.ml.PipelineModel): DataFrame = {
    val lr = model.stages.collectFirst {
      case m: org.apache.spark.ml.classification.LogisticRegressionModel => m
    }.getOrElse(throw new IllegalArgumentException(
      "pipeline has no LogisticRegressionModel stage"))
    val spark = org.apache.spark.sql.SparkSession.active
    import spark.implicits._
    lr.summary.objectiveHistory.toSeq.zipWithIndex
      .map { case (o, i) =>
        (i.toLong,
          BigDecimal(o).setScale(8, BigDecimal.RoundingMode.HALF_UP)
            .toDouble)
      }
      .toDF("iteration", "objective")
  }

  /** Per-sample K-fold out-of-fold predictions — the reference's
    * `cross_val_predict` contract (`train_ensemble.py:150-158`): for each
    * fold, fit on the complement and score the held-out fold; the union
    * carries exactly ONE prediction per input row, which downstream
    * consumers (ensembles, metrics) aggregate or combine.
    *
    * `fitter(train)` returns the scoring function of the fitted model.
    * `partitions` controls the small-data coalesce (default 1 removes
    * per-iteration scheduling overhead from k tiny fits; pass 0 to keep the
    * input partitioning for cluster-scale frames).
    */
  def kfoldOOFPredictions(df: DataFrame, idCol: String,
      featureCols: Seq[String], labelCol: String, k: Int,
      fitter: DataFrame => DataFrame => DataFrame = defaultLinRegFitter,
      partitions: Int = 1): DataFrame = {
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withFold(df, idCol, k))
      .withColumn("label", col(labelCol).cast("double"))
    val assembled =
      (if (partitions > 0) base.coalesce(partitions) else base).cache()
    assembled.count()
    // independent fold fits run as concurrent jobs on the shared session
    val folds = (0 until k).par.map { f =>
      val score = fitter(assembled.filter(col("fold") =!= f))
      score(assembled.filter(col("fold") === f))
        .select(col(idCol), col("fold").cast("int").as("fold"),
          col("label"), col("prediction"))
    }.toList
    val oof = folds.reduce(_.unionByName(_)).cache()
    oof.count()
    assembled.unpersist()
    oof
  }

  private def defaultLinRegFitter(train: DataFrame): DataFrame => DataFrame =
    new LinearRegression().setMaxIter(50).setRegParam(0.0).fit(train).transform(_)

  /** K-fold out-of-fold linear regression: per-fold RMSE rows derived from
    * the per-sample OOF prediction frame (reference M8).
    */
  def kfoldOOFLinReg(df: DataFrame, idCol: String, featureCols: Seq[String],
      labelCol: String, k: Int): DataFrame = {
    val oof = kfoldOOFPredictions(df, idCol, featureCols, labelCol, k)
    val out = oof.groupBy(col("fold")).agg(
      count(lit(1)).as("n"),
      round(sqrt(avg(pow(col("label") - col("prediction"), 2))), 4).as("rmse"))
      .cache()
    out.count()
    oof.unpersist()
    out
  }

  /** Regressor ensemble (reference M7/M9,
    * `/root/reference/scripts/train_ensemble.py:134-197`): ridge, lasso,
    * random forest and GBT trained on the train split, scored on test, plus
    * the unweighted prediction average — one row of RMSE per model and for
    * the ensemble. Mirrors the reference's model zoo with MLlib estimators
    * (`LinearRegression` elasticNet 0/1 = ridge/lasso, `RandomForestRegressor`
    * n=100 depth=5, `GBTRegressor` iter=50 depth=3).
    */
  def ensembleRegressors(df: DataFrame, idCol: String,
      featureCols: Seq[String], labelCol: String,
      partitions: Int = 2): DataFrame = {
    import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
    // ensemble training data is id-bounded small; a few partitions (the
    // default) keep tree building parallel while avoiding 32-task
    // scheduling per boosting iteration. Pass 0 to keep the input
    // partitioning for cluster-scale frames.
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withSplit(df, idCol))
      .withColumn("label", col(labelCol).cast("double"))
    val data = if (partitions > 0) base.coalesce(partitions) else base
    val train = data.filter(col("split") === "train").cache()
    val test = data.filter(col("split") === "test").cache()
    train.count(); test.count()

    // the four estimators are independent — fit them as concurrent jobs
    // (wall time = slowest model, not the sum); each returns its scorer
    val fitters: Seq[(String, Int) => (String, DataFrame => DataFrame)] = Seq(
      (name, i) => {
        val m = new LinearRegression().setMaxIter(50).setRegParam(1.0)
          .setElasticNetParam(0.0).setPredictionCol(s"p_$i").fit(train)
        (name, m.transform(_))
      },
      (name, i) => {
        val m = new LinearRegression().setMaxIter(50).setRegParam(0.1)
          .setElasticNetParam(1.0).setPredictionCol(s"p_$i").fit(train)
        (name, m.transform(_))
      },
      (name, i) => {
        val m = new RandomForestRegressor().setNumTrees(100).setMaxDepth(5)
          .setMinInstancesPerNode(3).setSeed(42).setPredictionCol(s"p_$i").fit(train)
        (name, m.transform(_))
      },
      (name, i) => {
        val m = new GBTRegressor().setMaxIter(50).setMaxDepth(3)
          .setSeed(42).setPredictionCol(s"p_$i").fit(train)
        (name, m.transform(_))
      })
    val names = Seq("ridge", "lasso", "random_forest", "gradient_boosting")
    val models = fitters.zip(names).zipWithIndex.par
      .map { case ((fit, name), i) => fit(name, i) }.toList
    // one pass over test accumulating every model's prediction column
    val scored = models.foldLeft(test) { case (d, (_, score)) => score(d) }
    val withEns = scored.withColumn("p_ens",
      (0 until models.size).map(i => col(s"p_$i")).reduce(_ + _) / models.size)
    val perModel = models.zipWithIndex.map { case ((name, _), i) =>
      withEns.agg(
        lit(name).as("model"),
        count(lit(1)).as("n_test"),
        round(sqrt(avg(pow(col("label") - col(s"p_$i"), 2))), 4).as("rmse"))
    }
    val ens = withEns.agg(
      lit("ensemble_avg").as("model"),
      count(lit(1)).as("n_test"),
      round(sqrt(avg(pow(col("label") - col("p_ens"), 2))), 4).as("rmse"))
    val out = (perModel :+ ens).reduce(_.unionByName(_)).cache()
    out.count()
    train.unpersist(); test.unpersist()
    out
  }

  /** The reference's R² weighting rule (`train_ensemble.py:183-184`):
    * raw weight = max(0.01, r2 + 1), normalized to sum 1. Input: (model, r2)
    * rows; output adds `weight`. Kept tiny and separate so the formula is
    * spec-checkable against hand-computed values.
    */
  def r2Weights(stats: DataFrame): DataFrame = {
    val raw = stats.withColumn("w_raw", greatest(lit(0.01), col("r2") + 1))
    raw.crossJoin(broadcast(raw.agg(sum(col("w_raw")).as("w_sum"))))
      .withColumn("weight", col("w_raw") / col("w_sum"))
      .drop("w_raw", "w_sum")
  }

  /** The reference's FULL ensemble query (`train_ensemble.py:150-197`):
    * per-model `cross_val_predict` OOF predictions, per-model metrics on the
    * OOF frame, the unweighted prediction average, and the R²-weighted
    * average (weights = max(0.01, r2+1) normalized). One row per model plus
    * `ensemble_avg` and `ensemble_weighted`.
    *
    * `groupCol` drives the leakage-safe fold hash. Per-model predictions
    * are recombined by an equi-join on a synthetic unique row id minted on
    * the shared CACHED assembled frame (input rows need not be unique on
    * any natural key; the cache pins the id↔row mapping for every model
    * branch — joining on a non-unique key would cross-product the OOF
    * frames).
    *
    * Scale shape: the 4·k fits run as concurrent Spark jobs over one cached
    * assembled frame; predictions are combined by a row-key equi-join (tiny
    * here, but broadcast-free and scalable); weights travel as a broadcast
    * 1-row frame, never a collect.
    */
  def ensembleOOFWeighted(df: DataFrame, groupCol: String,
      featureCols: Seq[String], labelCol: String,
      k: Int, partitions: Int = 2): DataFrame = {
    import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
    val names = Seq("ridge", "lasso", "random_forest", "gradient_boosting")
    val fitters: Seq[DataFrame => DataFrame => DataFrame] = Seq(
      tr => new LinearRegression().setMaxIter(50).setRegParam(1.0)
        .setElasticNetParam(0.0).fit(tr).transform(_),
      tr => new LinearRegression().setMaxIter(50).setRegParam(0.1)
        .setElasticNetParam(1.0).fit(tr).transform(_),
      tr => new RandomForestRegressor().setNumTrees(100).setMaxDepth(5)
        .setMinInstancesPerNode(3).setSeed(42).fit(tr).transform(_),
      tr => new GBTRegressor().setMaxIter(50).setMaxDepth(3)
        .setSeed(42).fit(tr).transform(_))
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withFold(df, groupCol, k))
      .withColumn("label", col(labelCol).cast("double"))
    // the row id is minted BEFORE the cache, so the materialized partitions
    // pin one consistent id per row for every model branch
    val assembled = {
      val b = if (partitions > 0) base.coalesce(partitions) else base
      b.withColumn("__row_id", monotonically_increasing_id())
    }.cache()
    assembled.count()
    // per-model OOF frames over the ONE cached assembled frame (4·k
    // concurrent fits; shared fold hash, so every model predicts the same
    // held-out rows)
    val oofs = names.zip(fitters).par.map { case (name, fit) =>
      (0 until k).par.map { f =>
        val score = fit(assembled.filter(col("fold") =!= f))
        score(assembled.filter(col("fold") === f))
          .select(col("__row_id"), col("label"),
            col("prediction").as(s"p_$name"))
      }.toList.reduce(_.unionByName(_))
    }.toList
    // wide frame: (__row_id, label, p_ridge, ..., p_gradient_boosting)
    val wide = oofs
      .reduce { (a, b) => a.join(b.drop("label"), Seq("__row_id")) }.cache()
    wide.count()
    assembled.unpersist()

    def metricRow(pred: org.apache.spark.sql.Column, name: String) =
      wide.agg(
        lit(name).as("model"),
        count(lit(1)).as("n"),
        round(sqrt(avg(pow(col("label") - pred, 2))), 4).as("rmse"),
        round(lit(1.0) -
          (graft.functions.Stats.dsum(pow(col("label") - pred, 2), 4) /
            (graft.functions.Stats.dsum(col("label") * col("label"), 4) -
              graft.functions.Stats.dsum(col("label"), 2) *
                graft.functions.Stats.dsum(col("label"), 2) / count(lit(1)))),
          6).as("r2"))

    val perModel = names.map(n => metricRow(col(s"p_$n"), n))
      .reduce(_.unionByName(_))
    val weighted = r2Weights(perModel.select(col("model"), col("r2")))
      .withColumn("weight", round(col("weight"), 6))
    // weights to columns (tiny pivot) → broadcast onto the wide frame
    val wRow = weighted.groupBy().pivot("model", names).agg(first(col("weight")))
    val withW = wide.crossJoin(broadcast(wRow))
    val pAvg = names.map(n => col(s"p_$n")).reduce(_ + _) / names.size
    val pW = names.map(n => col(n) * col(s"p_$n")).reduce(_ + _)
    val ensembles =
      metricRow(pAvg, "ensemble_avg").unionByName(
        withW.agg(
          lit("ensemble_weighted").as("model"),
          count(lit(1)).as("n"),
          round(sqrt(avg(pow(col("label") - pW, 2))), 4).as("rmse"),
          round(lit(1.0) -
            (graft.functions.Stats.dsum(pow(col("label") - pW, 2), 4) /
              (graft.functions.Stats.dsum(col("label") * col("label"), 4) -
                graft.functions.Stats.dsum(col("label"), 2) *
                  graft.functions.Stats.dsum(col("label"), 2) / count(lit(1)))),
            6).as("r2")))
    val out = perModel
      .join(weighted.select(col("model"), col("weight")), Seq("model"), "left")
      .unionByName(ensembles.withColumn("weight", lit(null).cast("double")))
      .cache()
    out.count()
    wide.unpersist()
    out
  }

  /** One prediction task in a multi-task masked training run: `labelCol`
    * may be null on any subset of rows (the mask); `classification` picks
    * the estimator and the reported metric.
    */
  case class TaskSpec(name: String, labelCol: String, classification: Boolean)

  /** Per-task training over masked targets (reference M13,
    * `/root/reference/src/data/dataset.py:411-430` +
    * `/root/reference/src/models/lstm.py` masked per-task losses): each task
    * trains only on rows where ITS target is non-null. For independent
    * per-task heads a NaN-masked loss term contributes zero gradient, so
    * filtering the masked rows per task is the exact dataflow analog of the
    * reference's `loss * mask` — no fill value ever reaches an estimator.
    *
    * All tasks share ONE assembled, split-tagged, cached frame, so the
    * leakage-safe group split is consistent across tasks (a group lands in
    * the same split for every task, like the reference's single dataset
    * split); the per-task fits then run as concurrent Spark jobs. Returns
    * one row per task: (task, task_type, n_train, n_test, coverage, metric,
    * value) where coverage is the non-masked fraction of the full frame and
    * metric/value is rmse (regression) or accuracy (classification).
    *
    * Scale shape: one shuffle-free scan tags splits; each task's filter is
    * a cached-partition predicate; metrics come back as 1-row aggregates.
    */
  def multiTaskMasked(df: DataFrame, groupCol: String,
      featureCols: Seq[String], tasks: Seq[TaskSpec],
      partitions: Int = 2): DataFrame = {
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withSplit(df, groupCol))
    val data = (if (partitions > 0) base.coalesce(partitions) else base).cache()
    val total = data.count()
    val rows = tasks.par.map { task =>
      val masked = data.filter(col(task.labelCol).isNotNull)
        .withColumn("label", col(task.labelCol).cast("double"))
      val train = masked.filter(col("split") === "train")
      val test = masked.filter(col("split") === "test")
      val nTrain = train.count()
      require(nTrain > 0, s"task '${task.name}': train split is empty after masking")
      val scored =
        if (task.classification)
          new LogisticRegression().setMaxIter(50).setRegParam(0.01)
            .fit(train).transform(test)
        else
          new LinearRegression().setMaxIter(50).setRegParam(0.0)
            .fit(train).transform(test)
      val metric =
        if (task.classification)
          round(sum(when(col("prediction") === col("label"), 1).otherwise(0)) /
            count(lit(1)).cast("double"), 6)
        else
          round(sqrt(avg(pow(col("label") - col("prediction"), 2))), 6)
      scored.agg(
        lit(task.name).as("task"),
        lit(if (task.classification) "classification" else "regression")
          .as("task_type"),
        lit(nTrain).as("n_train"),
        count(lit(1)).as("n_test"),
        round(lit(masked.count() / total.toDouble), 6).as("coverage"),
        lit(if (task.classification) "accuracy" else "rmse").as("metric"),
        metric.as("value"))
    }.toList
    val out = rows.reduce(_.unionByName(_)).cache()
    out.count()
    data.unpersist()
    out
  }

  /** Closed-form OOF simple linear regression (reference M8 made
    * oracle-checkable): per fold, the OLS slope/intercept of y~x are
    * computed ANALYTICALLY from exact decimal sums over the fold's
    * complement (slope = (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²)) — no iterative
    * solver, so DuckDB reproduces the identical doubles from the identical
    * sums. Returns per-fold (n_train, n_test, slope, intercept, rmse_oof).
    *
    * Scale shape: two aggregation passes (per-fold + global) and one
    * broadcast join of k parameter rows back onto the data — no collect, no
    * per-fold scan.
    */
  def oofClosedFormOLS(df: DataFrame, idCol: String, xCol: String,
      yCol: String, k: Int): DataFrame = {
    import graft.functions.Stats.dsum
    val d = SplitOps.withFold(df, idCol, k)
      .select(col("fold"), col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
    def sums(g: org.apache.spark.sql.RelationalGroupedDataset, suf: String) =
      g.agg(
        count(lit(1)).as(s"n$suf"),
        dsum(col("x"), 2).as(s"sx$suf"),
        dsum(col("y"), 2).as(s"sy$suf"),
        dsum(col("x") * col("y"), 4).as(s"sxy$suf"),
        dsum(col("x") * col("x"), 4).as(s"sxx$suf"))
    val perFold = sums(d.groupBy(col("fold")), "_f")
    val global = sums(d.groupBy(), "_g")
    val params = perFold.crossJoin(broadcast(global))
      .withColumn("n_tr", col("n_g") - col("n_f"))
      .withColumn("sx", col("sx_g") - col("sx_f"))
      .withColumn("sy", col("sy_g") - col("sy_f"))
      .withColumn("sxy", col("sxy_g") - col("sxy_f"))
      .withColumn("sxx", col("sxx_g") - col("sxx_f"))
      // zero x-variance in a training fold → undefined fit (null), not an
      // ANSI divide-by-zero
      .withColumn("__den",
        col("n_tr") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope",
        when(col("__den") =!= 0.0,
          (col("n_tr") * col("sxy") - col("sx") * col("sy")) / col("__den")))
      .withColumn("intercept",
        when(col("__den") =!= 0.0,
          (col("sy") - col("slope") * col("sx")) / col("n_tr")))
      .select(col("fold"), col("n_tr"), col("n_f"), col("slope"), col("intercept"))
    val errs = d.join(broadcast(params), "fold")
      .withColumn("err", col("y") - (col("intercept") + col("slope") * col("x")))
      .groupBy(col("fold"))
      .agg(round(sqrt(dsum(col("err") * col("err"), 4) / count(lit(1))), 6)
        .as("rmse_oof"))
    params.join(errs, "fold")
      .select(col("fold"), col("n_tr").as("n_train"), col("n_f").as("n_test"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        col("rmse_oof"))
  }

  /** Closed-form OOF RIDGE — the oracle-checkable twin of the MLlib ridge
    * member of [[ensembleOOFWeighted]] (`LinearRegression(regParam = λ,
    * elasticNet = 0)`; reference `train_ensemble.py:134-136`
    * `Ridge(alpha=1.0)`). Single-feature normal equations + the λI term
    * under MLlib's WLS standardization convention: features AND label are
    * standardized internally (population moments), which makes the
    * effective penalty n·λ·varₚ(x)/sdₚ(y) — i.e.
    *
    *   slope = Sxy_c / (Sxx_c · (1 + λ/sdₚ(y))),  intercept = ȳ − slope·x̄.
    *
    * The convention is pinned against a real MLlib fit in the spec
    * (tolerance ~1e-6 relative — the solver is iterative-free WLS but
    * Cholesky round-off differs from the scalar closed form), while the
    * query itself replays EXACTLY in SQL: every sum is an exact decimal,
    * and the slope is one fixed IEEE expression both engines evaluate
    * identically. Degenerate training folds (zero x-variance or zero
    * label variance, where the standardized objective is undefined)
    * yield null parameters, never a throw.
    */
  def oofClosedFormRidge(df: DataFrame, idCol: String, xCol: String,
      yCol: String, k: Int, lambda: Double): DataFrame = {
    import graft.functions.Stats.dsum
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    val d = SplitOps.withFold(df, idCol, k)
      .select(col("fold"), col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
    def sums(g: org.apache.spark.sql.RelationalGroupedDataset, suf: String) =
      g.agg(
        count(lit(1)).as(s"n$suf"),
        dsum(col("x"), 2).as(s"sx$suf"),
        dsum(col("y"), 2).as(s"sy$suf"),
        dsum(col("x") * col("y"), 4).as(s"sxy$suf"),
        dsum(col("x") * col("x"), 4).as(s"sxx$suf"),
        dsum(col("y") * col("y"), 4).as(s"syy$suf"))
    val perFold = sums(d.groupBy(col("fold")), "_f")
    val global = sums(d.groupBy(), "_g")
    val params = perFold.crossJoin(broadcast(global))
      .withColumn("n_tr", col("n_g") - col("n_f"))
      .withColumn("sx", col("sx_g") - col("sx_f"))
      .withColumn("sy", col("sy_g") - col("sy_f"))
      .withColumn("sxy", col("sxy_g") - col("sxy_f"))
      .withColumn("sxx", col("sxx_g") - col("sxx_f"))
      .withColumn("syy", col("syy_g") - col("syy_f"))
      .withColumn("__den0",
        col("n_tr") * col("sxx") - col("sx") * col("sx"))
      .withColumn("__syyc",
        col("syy") - col("sy") * col("sy") / col("n_tr"))
      .withColumn("slope",
        when(col("__den0") =!= 0.0 && col("__syyc") > 0.0,
          (col("n_tr") * col("sxy") - col("sx") * col("sy")) /
            (col("__den0") *
              (lit(1.0) + lit(lambda) /
                sqrt(col("__syyc") / col("n_tr"))))))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          (col("sy") - col("slope") * col("sx")) / col("n_tr")))
      .select(col("fold"), col("n_tr"), col("n_f"),
        col("slope"), col("intercept"))
    val errs = d.join(broadcast(params), "fold")
      .withColumn("err", col("y") - (col("intercept") + col("slope") * col("x")))
      .groupBy(col("fold"))
      .agg(round(sqrt(dsum(col("err") * col("err"), 4) / count(lit(1))), 6)
        .as("rmse_oof"))
    params.join(errs, "fold")
      .select(col("fold"), col("n_tr").as("n_train"), col("n_f").as("n_test"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        col("rmse_oof"))
  }

  /** Learning-curve card — [[oofClosedFormRidge]]'s closed form fitted
    * on NESTED training fractions (25% ⊂ 50% ⊂ 100% of the train pool,
    * hash-bucket defined so each curve point trains on a superset of the
    * previous) and scored on ONE fixed held-out slice: the
    * data-scaling read ("is more data still buying accuracy?") that
    * decides whether the next 10× of corpus is worth ingesting.
    *
    * Scale shape: sufficient statistics are aggregated ONCE per hash
    * bucket (a 20-row frame); every fraction's sums are conditional
    * aggregations over that frame, so curve width never adds data
    * scans. Bucket stats stay DECIMAL until the per-fraction reduction
    * (two-level exact sums — addition-order-free); the holdout error
    * pass fans each test row across the |fractions| broadcast params.
    */
  def learningCurveRidge(df: DataFrame, idCol: String, xCol: String,
      yCol: String, lambda: Double = 1.0): DataFrame = {
    import graft.functions.Stats.dsum
    val d = df.select(
        SplitOps.hashBucket(col(idCol), 20).as("__b"),
        col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
      .withColumn("__test", pmod(col("__b"), lit(5L)) === 4L)
    val bucketStats = d.filter(!col("__test"))
      .groupBy(col("__b"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,2)")).as("sx"),
        sum(col("y").cast("decimal(28,2)")).as("sy"),
        sum((col("x") * col("y")).cast("decimal(28,4)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(28,4)")).as("sxx"),
        sum((col("y") * col("y")).cast("decimal(28,4)")).as("syy"))
    val params = Seq((25L, 5L), (50L, 10L), (100L, 20L)).map {
      case (pct, th) =>
        bucketStats.filter(col("__b") < th)
          .agg(sum(col("n")).as("n_tr"),
            sum(col("sx")).cast("double").as("sx"),
            sum(col("sy")).cast("double").as("sy"),
            sum(col("sxy")).cast("double").as("sxy"),
            sum(col("sxx")).cast("double").as("sxx"),
            sum(col("syy")).cast("double").as("syy"))
          .select(lit(pct).as("fraction_pct"), col("n_tr"), col("sx"),
            col("sy"), col("sxy"), col("sxx"), col("syy"))
    }.reduce(_.unionByName(_))
      .withColumn("__den0",
        col("n_tr") * col("sxx") - col("sx") * col("sx"))
      .withColumn("__syyc",
        col("syy") - col("sy") * col("sy") / col("n_tr"))
      .withColumn("slope",
        when(col("__den0") =!= 0.0 && col("__syyc") > 0.0,
          (col("n_tr") * col("sxy") - col("sx") * col("sy")) /
            (col("__den0") *
              (lit(1.0) + lit(lambda) /
                sqrt(col("__syyc") / col("n_tr"))))))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          (col("sy") - col("slope") * col("sx")) / col("n_tr")))
      .select(col("fraction_pct"), col("n_tr"), col("slope"),
        col("intercept"))
    val errs = d.filter(col("__test"))
      .crossJoin(broadcast(params))
      .withColumn("err",
        col("y") - (col("intercept") + col("slope") * col("x")))
      .groupBy(col("fraction_pct"))
      .agg(count(lit(1)).as("n_test"),
        round(sqrt(dsum(col("err") * col("err"), 4) / count(lit(1))), 6)
          .as("rmse_holdout"))
    params.join(errs, "fraction_pct")
      .select(col("fraction_pct"), col("n_tr").as("n_train"),
        col("n_test"), round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"), col("rmse_holdout"))
      .orderBy(col("fraction_pct"))
  }

  /** Portable ridge-λ GRID SEARCH — the hash-checkable twin of the MLlib
    * CV grid (q106 / reference `train_ensemble.py:150-158`): the
    * [[oofClosedFormRidge]] closed form evaluated for EVERY λ of the grid
    * on the SAME deterministic hash folds, pooled OOF RMSE per λ, argmin
    * flagged. Model selection made SQL-replayable end-to-end: every slope,
    * intercept, error and the winner flag are exact expressions both
    * engines evaluate identically — no seeded optimizer anywhere.
    *
    * Scale shape: the per-fold/global sufficient statistics are computed
    * ONCE for the whole grid (two aggregations over the data, independent
    * of |λ|); the grid enters as a broadcast cross join of |folds|·|λ|
    * parameter rows, and the single error pass fans each data row out to
    * its |λ| per-λ residuals map-side — so grid width multiplies only the
    * O(1)-per-row arithmetic, never the number of data scans (MLlib's
    * CrossValidator refits k·|λ| times, rescanning every time).
    */
  def ridgeGridClosedForm(df: DataFrame, idCol: String, xCol: String,
      yCol: String, k: Int, lambdas: Seq[Double]): DataFrame = {
    import graft.functions.Stats.dsum
    import org.apache.spark.sql.expressions.Window
    require(lambdas.nonEmpty, "need at least one lambda")
    require(lambdas.forall(_ >= 0), s"lambdas must be >= 0, got $lambdas")
    val spark = df.sparkSession
    import spark.implicits._
    val d = SplitOps.withFold(df, idCol, k)
      .select(col("fold"), col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y"))
    def sums(g: org.apache.spark.sql.RelationalGroupedDataset, suf: String) =
      g.agg(
        count(lit(1)).as(s"n$suf"),
        dsum(col("x"), 2).as(s"sx$suf"),
        dsum(col("y"), 2).as(s"sy$suf"),
        dsum(col("x") * col("y"), 4).as(s"sxy$suf"),
        dsum(col("x") * col("x"), 4).as(s"sxx$suf"),
        dsum(col("y") * col("y"), 4).as(s"syy$suf"))
    val perFold = sums(d.groupBy(col("fold")), "_f")
    val global = sums(d.groupBy(), "_g")
    val grid = lambdas.distinct.toDF("lambda")
    val params = perFold.crossJoin(broadcast(global))
      .crossJoin(broadcast(grid))
      .withColumn("n_tr", col("n_g") - col("n_f"))
      .withColumn("sx", col("sx_g") - col("sx_f"))
      .withColumn("sy", col("sy_g") - col("sy_f"))
      .withColumn("sxy", col("sxy_g") - col("sxy_f"))
      .withColumn("sxx", col("sxx_g") - col("sxx_f"))
      .withColumn("syy", col("syy_g") - col("syy_f"))
      .withColumn("__den0",
        col("n_tr") * col("sxx") - col("sx") * col("sx"))
      .withColumn("__syyc",
        col("syy") - col("sy") * col("sy") / col("n_tr"))
      // the oofClosedFormRidge slope with λ as a COLUMN from the grid
      .withColumn("slope",
        when(col("__den0") =!= 0.0 && col("__syyc") > 0.0,
          (col("n_tr") * col("sxy") - col("sx") * col("sy")) /
            (col("__den0") *
              (lit(1.0) + col("lambda") /
                sqrt(col("__syyc") / col("n_tr"))))))
      .withColumn("intercept",
        when(col("slope").isNotNull,
          (col("sy") - col("slope") * col("sx")) / col("n_tr")))
      .select(col("lambda"), col("fold"), col("slope"), col("intercept"))
    val pooled = d.join(broadcast(params), "fold")
      .withColumn("err", col("y") - (col("intercept") + col("slope") * col("x")))
      .groupBy(col("lambda"))
      .agg((sqrt(dsum(col("err") * col("err"), 4) / count(lit(1))))
        .as("__rmse_raw"))
    // argmin over the |λ|-row frame; λ asc breaks exact ties — a window
    // over a broadcast-sized frame, not a data-sized one
    pooled
      .withColumn("is_best",
        when(row_number().over(
          Window.orderBy(col("__rmse_raw").asc, col("lambda").asc)) === 1, 1)
          .otherwise(0))
      .select(col("lambda"), round(col("__rmse_raw"), 6).as("rmse_oof_pooled"),
        col("is_best"))
  }

  /** Fixed-iteration IRLS (Newton) LOGISTIC regression on one feature —
    * the hash-checkable twin of the MLlib classification path (q29 family;
    * reference `train.py:170-296` LogisticRegression): exactly `iters`
    * Newton steps from (0, 0), each step ONE exact-decimal aggregation
    * over the data plus a 2×2 solve, emitted as a per-iteration trace
    * (params + the mean log-loss each step saw).
    *
    * Engine portability of an ITERATIVE fit: the only non-exact per-row
    * math is exp/ln, where JVM and libm can disagree by an ulp. Every
    * per-row term is therefore cast to DECIMAL(28,12) before summing
    * (which absorbs sub-1e-12 per-row drift deterministically) and the
    * updated parameters are re-rounded to 9 decimals each step — so both
    * engines re-enter every iteration with IDENTICAL doubles and the trace
    * replays exactly in a DuckDB recursive CTE (the q126 PAV precedent for
    * iterative replay, applied to a Newton loop). The driver loop only
    * CONTROLS iteration (the [[graft.operators.GraphOps]] convention);
    * each step's data pass is fully distributed and map-side combined.
    *
    * Newton is affine-invariant, so no feature standardization is needed;
    * the spec pins the converged params against a real MLlib
    * `LogisticRegression(regParam=0)` fit.
    */
  def irlsLogisticPortable(df: DataFrame, xCol: String, yCol: String,
      iters: Int = 6): DataFrame =
    irlsCore(df, xCol, yCol, lit(1.0), iters)

  /** Class-WEIGHTED fixed-iteration IRLS logistic — the hash-checkable
    * twin of the q49 weighted-logistic family (reference
    * `train.py:238-252` `class_weight='balanced'`): per-row weight
    * n/(2·n_class) folds into gradient, Hessian, and loss, and every
    * weight is an exact integer ratio both engines compute identically —
    * so the balanced-training path replays in SQL exactly like the
    * unweighted [[irlsLogisticPortable]]. The spec pins the fixed point
    * against MLlib `LogisticRegression.setWeightCol` on the same weights.
    */
  def irlsLogisticWeightedPortable(df: DataFrame, xCol: String, yCol: String,
      iters: Int = 6): DataFrame = {
    val d0 = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    val cnt = d0.agg(count(lit(1)).as("n"),
      sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("npos")).head()
    val (n, npos) = (cnt.getLong(0), cnt.getLong(1))
    val nneg = n - npos
    require(npos > 0 && nneg > 0,
      s"balanced weights need both classes, got npos=$npos nneg=$nneg")
    // sklearn's 'balanced' rule n/(k·n_c): one exact double division per
    // class — both engines evaluate the identical literal ratio
    val wpos = n.toDouble / (2.0 * npos)
    val wneg = n.toDouble / (2.0 * nneg)
    val w = when(col("y") === 1.0, lit(wpos)).otherwise(lit(wneg))
    irlsCore(df, xCol, yCol, w, iters)
  }

  /** Shared Newton loop of the IRLS twins: `rowW` scales gradient,
    * Hessian, and loss per row (lit(1.0) — an exact IEEE no-op multiply —
    * recovers the unweighted fit). The portability contract lives here:
    * DECIMAL(28,12) per-row sums, round-9 params per step.
    */
  private def irlsCore(df: DataFrame, xCol: String, yCol: String,
      rowW: org.apache.spark.sql.Column, iters: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (trace, _, _) = irlsLoop(df, xCol, yCol, rowW, iters)
    trace.toDF("iter", "__b0", "__b1", "log_loss")
      .select(col("iter"), round(col("__b0"), 6).as("b0"),
        round(col("__b1"), 6).as("b1"), col("log_loss"))
  }

  /** The Newton loop itself, returning the per-iteration trace AND the
    * final round-9 parameters (the trace frame display-rounds to 6;
    * downstream scoring — Platt calibration, the q199 probe — needs the
    * exact round-9 fixed point the oracle's recursive CTE carries).
    */
  private[ml] def irlsLoop(df: DataFrame, xCol: String, yCol: String,
      rowW: org.apache.spark.sql.Column, iters: Int)
      : (Seq[(Int, Double, Double, Double)], Double, Double) = {
    import graft.functions.Stats.dsum
    require(iters >= 1, s"need at least one iteration, got $iters")
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    // fanned out for the same reason as gmm1dEmPortable: the Newton
    // aggregates dominate and must run cores-wide on big inputs (q224/
    // q405 fit over full orders); the small q189/q192 frames pay a few
    // extra tiny tasks per iteration, measured in the low tens of ms
    val d = graft.operators.ParOps.fanOut(
      df.select(col(xCol).cast("double").as("x"),
        col(yCol).cast("double").as("y")),
      // weight 4 balances two callers sharing one size estimate (Filter
      // does not shrink non-CBO stats): full-orders fits (q224/q405) want
      // width, the 500-row id-bounded fits (q189/q192) want none
      weight = 4.0).persist()
    try {
      var b0 = 0.0
      var b1 = 0.0
      val trace = (1 to iters).map { i =>
        val p = lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x"))))
        val w = rowW * p * (lit(1.0) - p)
        val r = d.agg(
          count(lit(1)).as("n"),
          dsum(rowW * (col("y") - p), 12).as("g0"),
          dsum(rowW * (col("y") - p) * col("x"), 12).as("g1"),
          dsum(w, 12).as("sw"),
          dsum(w * col("x"), 12).as("swx"),
          dsum(w * col("x") * col("x"), 12).as("swxx"),
          dsum(rowW * (col("y") * log(p) +
            (lit(1.0) - col("y")) * log(lit(1.0) - p)), 12).as("ll")).head()
        val n = r.getLong(0)
        val (g0, g1, sw, swx, swxx, ll) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
        val det = sw * swxx - swx * swx
        b0 = r9(b0 + (swxx * g0 - swx * g1) / det)
        b1 = r9(b1 + (sw * g1 - swx * g0) / det)
        val llMean = new java.math.BigDecimal(ll / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (i, b0, b1, llMean)
      }
      (trace, b0, b1)
    } finally { d.unpersist(); () }
  }

  /** Fixed-iteration PROBIT regression (Fisher scoring) — the
    * normal-link sibling of [[irlsLogisticPortable]]: η = b₀ + b₁x,
    * score Σ φ(η)(y − Φ(η))/(Φ(1−Φ)), information weights
    * w = φ²/(Φ(1−Φ)), the same round-9 2×2 Newton replay. Runs on the
    * portable [[graft.functions.Stats.normCdf]]/normPdf (fixed
    * expression trees — built-in normal CDFs are engine-specific), so
    * the whole trajectory is hash-checkable like q189's logistic.
    * Φ clamps to [1e-10, 1−1e-10] identically in both engines so a
    * separated point cannot blow the working weights or ln(0) the loss.
    *
    * Probit vs logit is the classic link-function robustness check:
    * agreement (b̂_logit ≈ 1.6·b̂_probit) says the verdict doesn't
    * hinge on the link; disagreement says the tails are doing the work.
    */
  def irlsProbitPortable(df: DataFrame, xCol: String, yCol: String,
      iters: Int = 6): DataFrame = {
    import graft.functions.Stats.{dsum, normCdf, normPdf}
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).persist()
    try {
      var b0 = 0.0
      var b1 = 0.0
      val trace = (1 to iters).map { i =>
        val eta = lit(b0) + lit(b1) * col("x")
        val phi = normPdf(eta)
        val cdf = greatest(lit(1e-10),
          least(lit(0.9999999999), normCdf(eta)))
        val v = cdf * (lit(1.0) - cdf)
        val u = phi * (col("y") - cdf) / v
        val w = phi * phi / v
        val r = d.agg(
          count(lit(1)).as("n"),
          dsum(u, 12).as("g0"),
          dsum(u * col("x"), 12).as("g1"),
          dsum(w, 12).as("sw"),
          dsum(w * col("x"), 12).as("swx"),
          dsum(w * col("x") * col("x"), 12).as("swxx"),
          dsum(col("y") * log(cdf) +
            (lit(1.0) - col("y")) * log(lit(1.0) - cdf), 12).as("ll"))
          .head()
        val n = r.getLong(0)
        val (g0, g1, sw, swx, swxx, ll) = (r.getDouble(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
        val det = sw * swxx - swx * swx
        require(det > 0.0, s"degenerate probit system at step $i")
        b0 = r9(b0 + (swxx * g0 - swx * g1) / det)
        b1 = r9(b1 + (sw * g1 - swx * g0) / det)
        val llMean = new java.math.BigDecimal(ll / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (i, b0, b1, llMean)
      }
      trace.toDF("iter", "__b0", "__b1", "log_loss")
        .select(col("iter"), round(col("__b0"), 6).as("b0"),
          round(col("__b1"), 6).as("b1"), col("log_loss"))
    } finally { d.unpersist(); () }
  }

  /** TWO-feature fixed-iteration IRLS logistic (intercept + x1 + x2) —
    * the multivariable extension of [[irlsLogisticPortable]]: the same
    * round-9 Newton contract, but each step solves the full 3×3 Fisher
    * system by Cramer's rule in ONE fixed double shape (the det3
    * convention the ADF/Granger closed forms already share), so the
    * whole trajectory still replays as a recursive CTE. This is the
    * step from "slope of one feature" to an actual multivariable
    * model with hash-checkable coefficients — adjusted effects, not
    * marginal ones.
    *
    * Scale shape: per iteration ONE 10-sum reduction over the scan
    * (6 Hessian moments, 3 gradient terms, the loss); driver holds
    * three scalars.
    */
  def irlsLogistic2Portable(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String, iters: Int = 6): DataFrame = {
    import graft.functions.Stats.dsum
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def det3(a: Double, b: Double, c: Double, d: Double, e: Double,
        f: Double, g: Double, h: Double, i: Double): Double =
      a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)
    val d = df.select(col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"),
      col(yCol).cast("double").as("y")).persist()
    try {
      var b0 = 0.0
      var b1 = 0.0
      var b2 = 0.0
      val trace = (1 to iters).map { it =>
        val p = lit(1.0) /
          (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x1") +
            lit(b2) * col("x2"))))
        val w = p * (lit(1.0) - p)
        val r = d.agg(
          count(lit(1)).as("n"),
          dsum(col("y") - p, 12).as("g0"),
          dsum((col("y") - p) * col("x1"), 12).as("g1"),
          dsum((col("y") - p) * col("x2"), 12).as("g2"),
          dsum(w, 12).as("s0"),
          dsum(w * col("x1"), 12).as("s1"),
          dsum(w * col("x2"), 12).as("s2"),
          dsum(w * col("x1") * col("x1"), 12).as("s11"),
          dsum(w * col("x1") * col("x2"), 12).as("s12"),
          dsum(w * col("x2") * col("x2"), 12).as("s22"),
          dsum(col("y") * log(p) +
            (lit(1.0) - col("y")) * log(lit(1.0) - p), 12).as("ll"))
          .head()
        val n = r.getLong(0)
        val (g0, g1, g2) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        val (s0, s1, s2) = (r.getDouble(4), r.getDouble(5), r.getDouble(6))
        val (s11, s12, s22) =
          (r.getDouble(7), r.getDouble(8), r.getDouble(9))
        val ll = r.getDouble(10)
        val det = det3(s0, s1, s2, s1, s11, s12, s2, s12, s22)
        require(math.abs(det) > 0.0,
          s"degenerate 3x3 Fisher system at step $it")
        val d0 = det3(g0, s1, s2, g1, s11, s12, g2, s12, s22)
        val d1 = det3(s0, g0, s2, s1, g1, s12, s2, g2, s22)
        val d2 = det3(s0, s1, g0, s1, s11, g1, s2, s12, g2)
        b0 = r9(b0 + d0 / det)
        b1 = r9(b1 + d1 / det)
        b2 = r9(b2 + d2 / det)
        val llMean = new java.math.BigDecimal(ll / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (it, b0, b1, b2, llMean)
      }
      trace.toDF("iter", "__b0", "__b1", "__b2", "log_loss")
        .select(col("iter"), round(col("__b0"), 6).as("b0"),
          round(col("__b1"), 6).as("b1"),
          round(col("__b2"), 6).as("b2"), col("log_loss"))
        .orderBy(col("iter"))
    } finally { d.unpersist(); () }
  }

  /** Dataset cartography (Swayamdipta et al. 2020) over the PORTABLE
    * training trajectory: for every example, the mean correct-class
    * probability (confidence) and its spread (variability) across the
    * [[irlsLoop]] steps, bucketed into the easy-to-learn /
    * hard-to-learn / ambiguous map that drives curation decisions
    * (ambiguous examples carry the learning signal; a large hard
    * region usually means label noise). Classically this needs
    * checkpoint replays of a neural run; here the trajectory is the
    * round-9 Newton fixed-point path, so the whole map is
    * deterministic and hash-checked — the curation workflow itself,
    * exercised end to end.
    *
    * Exactness: the per-step probabilities use the round-9 params both
    * engines carry; confidence/variability are FIXED per-row chains
    * over the `iters` steps (no aggregation order anywhere), rounded
    * to 9 before the zone thresholds. One scan, one 1-row reduction.
    */
  def trainingCartography(df: DataFrame, xCol: String, yCol: String,
      iters: Int = 6, confHi: Double = 0.7, confLo: Double = 0.3,
      varHi: Double = 0.15): DataFrame = {
    import graft.functions.Stats.dsum
    val spark = df.sparkSession
    import spark.implicits._
    val (trace, _, _) =
      irlsLoop(df, xCol, yCol, lit(1.0), iters)
    val d = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y"))
    val pts = trace.map { case (_, b0, b1, _) =>
      val p = lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x"))))
      when(col("y") === 1.0, p).otherwise(lit(1.0) - p)
    }
    val itD = iters.toDouble
    val cm = pts.reduce(_ + _) / lit(itD)
    val withCv = d
      .withColumn("__cm", cm)
      .withColumn("__conf", round(col("__cm"), 9))
      .withColumn("__var", round(
        pts.map(p => (p - col("__cm")) * (p - col("__cm")))
          .reduce(_ + _) / lit(itD), 9))
    val easy = col("__conf") >= confHi && col("__var") < varHi
    val hard = col("__conf") <= confLo && col("__var") < varHi
    val ambiguous = col("__var") >= varHi
    withCv.agg(
      count(lit(1)).as("n_examples"),
      sum(when(easy, 1L).otherwise(0L)).as("n_easy"),
      sum(when(ambiguous, 1L).otherwise(0L)).as("n_ambiguous"),
      sum(when(hard, 1L).otherwise(0L)).as("n_hard"),
      sum(when(!easy && !hard && !ambiguous, 1L).otherwise(0L))
        .as("n_other"),
      round(dsum(col("__conf"), 12) / count(lit(1)), 6)
        .as("mean_confidence"),
      round(dsum(col("__var"), 12) / count(lit(1)), 6)
        .as("mean_variability"))
  }

  /** PLATT-SCALING calibration card — the parametric sibling of isotonic
    * calibration (q126) and the fix the ECE card (q197) calls for: a
    * 1-feature logistic (the [[irlsLoop]] fixed point — same round-9
    * Newton replay as q189) maps raw scores to calibrated probabilities,
    * and the card reports per-bin raw-vs-calibrated reliability plus both
    * ECEs. On a miscalibrated scorer ece_cal < ece_raw is the measurable
    * win. One fit pass + one binned aggregation; everything replays in
    * SQL (recursive-CTE fit, plain expressions after).
    */
  def plattCalibrationCard(df: DataFrame, scoreCol: String,
      labelCol: String, iters: Int = 6, bins: Int = 10,
      rawScale: Int = 3): DataFrame = {
    import graft.functions.Stats.dsum
    require(bins >= 2, s"need >= 2 bins, got $bins")
    val d = df.select(col(scoreCol).cast("double").as("x"),
      col(labelCol).cast("double").as("y"))
    val (_, b0, b1) = irlsLoop(d, "x", "y", lit(1.0), iters)
    val scored = d.withColumn("__pc",
      round(lit(1.0) / (lit(1.0) + exp(-(lit(b0) + lit(b1) * col("x")))), 6))
    val binned = scored
      // Platt inputs need not live in [0,1] (margins are common) — clamp
      // BOTH ends so out-of-range raw scores land in the edge bins instead
      // of producing negative bin ids. `rawScale` is the raw score's true
      // decimal precision (the dsum contract: exact recovery, never a
      // rounding decision) — raise it for general-precision scores.
      .withColumn("bin",
        greatest(lit(0L),
          least(floor(col("x") * bins).cast("long"), lit(bins - 1L))))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"),
        (dsum(col("x"), rawScale) / count(lit(1))).as("avg_raw"),
        (dsum(col("__pc"), 6) / count(lit(1))).as("avg_cal"),
        (sum(col("y").cast("long")).cast("double") / count(lit(1)))
          .as("pos_rate"))
    val eces = binned.agg(
      round(dsum(abs(col("pos_rate") - col("avg_raw")) *
        col("n").cast("double"), 12) / sum(col("n")), 6).as("ece_raw"),
      round(dsum(abs(col("pos_rate") - col("avg_cal")) *
        col("n").cast("double"), 12) / sum(col("n")), 6).as("ece_cal"))
    binned.crossJoin(broadcast(eces))
      .select(col("bin"), col("n"), round(col("avg_raw"), 6).as("avg_raw"),
        round(col("avg_cal"), 6).as("avg_cal"),
        round(col("pos_rate"), 6).as("pos_rate"),
        col("ece_raw"), col("ece_cal"))
      .orderBy(col("bin"))
  }

  /** Per-key AR(1) fit in closed form: y_t = intercept + slope·y_{t−1} over
    * consecutive observations, the classical sequence model (the linear
    * ancestor of the reference's LSTM forecasting surface) — expressed as
    * ONE ordered window pass for the lag pairs plus exact-decimal normal
    * equations, the same engine-portable arithmetic as [[oofClosedFormOLS]],
    * so the fit itself is oracle-checkable (which no iterative fit is).
    * In-sample RMSE comes from a second pass against the broadcast
    * per-key parameters. `scale` is the measure's true decimal precision
    * (the [[graft.functions.Stats.dsum]] contract): per-row casts must be
    * exact recovery, never a rounding decision.
    */
  def ar1ClosedForm(df: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, valueCol: String, scale: Int = 2): DataFrame = {
    import graft.functions.Stats.dsum
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
    val pairs = df
      .withColumn("__x", lag(col(valueCol), 1).over(w))
      .filter(col("__x").isNotNull)
      .select(col(keyCol), col("__x").as("x"),
        col(valueCol).cast("double").as("y"))
    val params = pairs.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_pairs"),
        dsum(col("x"), scale).as("sx"),
        dsum(col("y"), scale).as("sy"),
        dsum(col("x") * col("y"), 2 * scale).as("sxy"),
        dsum(col("x") * col("x"), 2 * scale).as("sxx"))
      // constant lag series → undefined AR(1) fit (null), never a throw
      .withColumn("__den",
        col("n_pairs") * col("sxx") - col("sx") * col("sx"))
      .withColumn("slope",
        when(col("__den") =!= 0.0,
          (col("n_pairs") * col("sxy") - col("sx") * col("sy")) /
            col("__den")))
      .withColumn("intercept",
        when(col("__den") =!= 0.0,
          (col("sy") - col("slope") * col("sx")) / col("n_pairs")))
    val errs = pairs.join(broadcast(params), keyCol)
      .withColumn("err", col("y") - (col("intercept") + col("slope") * col("x")))
      .groupBy(col(keyCol))
      .agg(round(sqrt(dsum(col("err") * col("err"), 2 * scale) / count(lit(1))), 6)
        .as("rmse"))
    params.join(errs, keyCol)
      .select(col(keyCol), col("n_pairs"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"),
        col("rmse"))
  }

  /** PCA over an array-embedding column: fit k components, report each
    * component's explained-variance share and the total captured — the
    * dimensionality screen run before an ANN index or a probe classifier.
    * The fit is one distributed covariance pass (MLlib aggregates
    * per-partition Gram matrices; only the d×d summary reaches the
    * driver), so it scales to any row count at fixed dimension.
    */
  def pcaExplainedVariance(embeddings: DataFrame, vecCol: String,
      k: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val data = embeddings
      .withColumn("__features", array_to_vector(col(vecCol)))
    val model = new org.apache.spark.ml.feature.PCA()
      .setK(k).setInputCol("__features").setOutputCol("__pca")
      .fit(data)
    val ev = model.explainedVariance.toArray
    ev.zipWithIndex.map { case (v, i) =>
      (i + 1, BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }.toSeq.toDF("component", "explained_var_ratio")
      .withColumn("cum_explained",
        round(sum(col("explained_var_ratio")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("component"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, 0)), 6))
  }

  /** Fixed-iteration POWER-METHOD top principal component — the
    * hash-checkable twin of [[pcaExplainedVariance]]'s MLlib PCA (q105):
    * the population covariance of the embedding dimensions is built in ONE
    * distributed pass (per-row dim-pair products from the array itself —
    * no self-join of the exploded frame — exact-decimal sums, entries
    * rounded to 12 decimals), then exactly `iters` power steps
    * v ← C·v/‖C·v‖ run on the collected d×d matrix, emitting the
    * per-iteration eigenvalue estimate ‖C·v‖ and its share of the trace.
    *
    * Collecting C driver-side is the MLlib contract itself (PCA gathers
    * the Gramian to the driver to eigendecompose); the data-sized work —
    * the covariance pass — stays distributed and map-side combined.
    * Every driver step mirrors the SQL replay digit-for-digit: products
    * round to DECIMAL(38,18) before the order-free exact sums, the
    * normalized vector re-rounds to 9 decimals per step, trace sums
    * exactly — the q189 IRLS portability recipe applied to an
    * eigen-iteration, so a DuckDB recursive CTE replays the whole trace.
    * The eigenvalue SHARE λ₁/tr(C) is scaling-convention-free (population
    * vs MLlib's sample covariance cancels), which is what the spec pins
    * against a real MLlib PCA fit.
    */
  def powerIterationPC1(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, iters: Int = 12): DataFrame = {
    import graft.functions.Stats.dsum
    require(iters >= 1 && dim >= 1)
    val spark = embeddings.sparkSession
    import spark.implicits._
    val arr = col(vecCol).cast("array<double>")
    val n = embeddings.count()
    // the pair stage below expands every row d²/2 ≈ 2080× — fan the
    // compact embedding frame out first so the expansion runs wide
    // (guide §8: shuffle pre-expansion rows; decimal sums are order-free).
    // ONLY the pairs branch is fanned: the mu branch is a cheap
    // posexplode+group, and feeding both consumers from one unpersisted
    // fanned frame would execute the repartition shuffle (and the scan
    // beneath it) twice per call (round-15 advice).
    val slim = embeddings.select(arr.as("__arr"))
    val emb = graft.operators.ParOps.fanOut(slim, weight = 64.0)
    val earr = col("__arr")
    val vals = slim.select(posexplode(earr).as(Seq("i", "v")))
    val mu = vals.groupBy(col("i"))
      .agg((dsum(col("v"), 8) / lit(n.toDouble)).as("mu"))
    // pair products generated per ROW from the array (nested transform +
    // flatten) — rows go straight into one map-side-combined aggregation,
    // never a self-join of the exploded frame. C is symmetric, so only
    // the UPPER triangle (j ≥ i) is generated — half the n·d² explode —
    // and the driver mirrors the entries; the triangle's sums are
    // numerically identical to the full matrix's, so the SQL replay
    // (which computes both triangles) lands on the same rounded values.
    val pairs = emb
      .select(explode(flatten(transform(earr, (x, i) =>
        transform(slice(earr, i + lit(1), lit(dim) - i), (y, k) =>
          struct(i.as("i"), (i + k).as("j"), (x * y).as("p")))))).as("t"))
      .select(col("t.i").as("i"), col("t.j").as("j"), col("t.p").as("p"))
    val cov = pairs.groupBy(col("i"), col("j"))
      .agg(dsum(col("p"), 12).as("sp"))
      .join(broadcast(mu.select(col("i"), col("mu").as("mu_i"))), "i")
      .join(broadcast(mu.select(col("i").as("j"), col("mu").as("mu_j"))), "j")
      .select(col("i"), col("j"),
        round(col("sp") / lit(n.toDouble) - col("mu_i") * col("mu_j"), 12)
          .as("c"))
    val entries = cov.collect()
      .map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    def c(i: Int, j: Int): Double =
      entries.getOrElse((i, j), entries.getOrElse((j, i), 0.0))
    import java.math.{BigDecimal => JBD, RoundingMode}
    def r(v: Double, s: Int): Double =
      new JBD(v).setScale(s, RoundingMode.HALF_UP).doubleValue()
    // exact order-free sum of round-18 terms — the SUM(CAST(.. AS
    // DECIMAL(38,18))) both engines run
    def dsum18(ts: Seq[Double]): Double =
      ts.map(t => new JBD(t).setScale(18, RoundingMode.HALF_UP))
        .foldLeft(JBD.ZERO)(_.add(_)).doubleValue()
    val trace = dsum18((0 until dim).map(i => c(i, i)))
    var v = Array.fill(dim)(r(1.0 / math.sqrt(dim.toDouble), 9))
    val out = (1 to iters).map { t =>
      val w = (0 until dim).map(i => dsum18((0 until dim).map(j => c(i, j) * v(j))))
      val norm = math.sqrt(dsum18(w.map(x => x * x)))
      v = w.map(x => r(x / norm, 9)).toArray
      (t, r(norm, 6), r(norm / trace, 6))
    }
    out.toDF("iter", "lambda1", "pc1_share")
  }

  /** Grid-search cross-validation: k-fold CV of a logistic-regression
    * regularization grid using the same deterministic hash folds as every
    * other split here (leakage-safe, engine-reproducible — NOT MLlib's
    * random CrossValidator folds). Returns one row per grid point with the
    * mean held-out accuracy and the selected-best flag; ties break to the
    * strongest regularization, the conventional one-standard-error-style
    * rule. Fits run fold-parallel like [[ensembleOOFWeighted]].
    */
  def gridSearchLogReg(df: DataFrame, idCol: String,
      featureCols: Seq[String], labelCol: String,
      regGrid: Seq[Double], k: Int,
      partitions: Int = 2): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withFold(df, idCol, k))
      .withColumn("label", col(labelCol).cast("double"))
    val assembled =
      (if (partitions > 0) base.coalesce(partitions) else base).cache()
    assembled.count()
    val scores = regGrid.par.flatMap { reg =>
      (0 until k).par.map { f =>
        val m = new LogisticRegression().setMaxIter(50).setRegParam(reg)
          .fit(assembled.filter(col("fold") =!= f))
        val pred = m.transform(assembled.filter(col("fold") === f))
        val (hit, n) = pred.agg(
          sum(when(col("prediction") === col("label"), 1L).otherwise(0L)),
          count(lit(1))).as[(Long, Long)].head()
        (reg, hit, n)
      }.toList
    }.toList
    assembled.unpersist()
    // mean accuracy = pooled over folds (every row is held out exactly once)
    val perReg = scores.groupBy(_._1).map { case (reg, xs) =>
      (reg, xs.map(_._2).sum.toDouble / xs.map(_._3).sum)
    }.toSeq
    val best = perReg.maxBy { case (reg, acc) => (acc, reg) }._1
    perReg.sortBy(_._1)
      .map { case (reg, acc) =>
        (reg, BigDecimal(acc).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble, reg == best)
      }
      .toDF("reg_param", "cv_accuracy", "is_best")
  }

  /** Isotonic calibration: fit the pool-adjacent-violators monotone map
    * from a raw score to a calibrated probability — the repair step for
    * the miscalibration q84's reliability bins diagnose (the reference
    * reports raw sigmoid outputs as probabilities,
    * `/root/reference/scripts/evaluate.py:150-176`, which PAV corrects
    * without re-training). MLlib's IsotonicRegression pools violators per
    * partition and merges ONLY the pooled boundary frame on the driver —
    * the data itself never leaves the executors, so the fit scales in the
    * row count. Returns the fitted step function as (boundary, fitted)
    * rows, monotone non-decreasing by construction.
    */
  def isotonicCalibration(scored: DataFrame, scoreCol: String = "score",
      labelCol: String = "label"): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val model = new org.apache.spark.ml.regression.IsotonicRegression()
      .setFeaturesCol("__f").setLabelCol(labelCol)
      .fit(scored.withColumn("__f",
        array_to_vector(array(col(scoreCol).cast("double")))))
    model.boundaries.toArray.zip(model.predictions.toArray).toSeq
      .toDF("boundary", "fitted")
      .select(round(col("boundary"), 6).as("boundary"),
        round(col("fitted"), 6).as("fitted"))
  }

  /** Rolling-origin (expanding-window) backtest: the time-series analog of
    * k-fold CV, and the evaluation protocol the reference's forecaster
    * should have used instead of a random split
    * (`/root/reference/scripts/train.py:72-84` splits users, not time —
    * fine for population models, leakage for forecasting). The time range
    * divides into `nSlices` equal slices by pure integer-microsecond math;
    * fold k trains a closed-form OLS of `valueCol` on elapsed-seconds over
    * slices [0, k) and reports test RMSE on slice k.
    *
    * Everything is [[graft.functions.Stats.dsum]] exact-decimal sufficient
    * statistics: one aggregation collapses the data to `nSlices` rows of
    * (n, Σx, Σy, Σxy, Σx²); the expanding-window accumulation then runs on
    * that tiny frame under an ordered window (never on the data); and the
    * test pass joins 5 broadcast parameter rows. Two data shuffles total,
    * both keyed — no global sort at any size.
    */
  def rollingOriginBacktest(df: DataFrame, tsCol: String, valueCol: String,
      nSlices: Int = 6, scale: Int = 2): DataFrame = {
    import graft.functions.Stats.dsum
    import org.apache.spark.sql.expressions.Window
    val us = unix_micros(col(tsCol))
    val range = df.agg(min(us).as("__mn"), max(us).as("__mx"))
    val based = df.crossJoin(broadcast(range))
      .withColumn("__x",
        expr(s"(unix_micros($tsCol) - __mn) div 1000000").cast("double"))
      .withColumn("__slice",
        least(lit(nSlices - 1),
          expr(s"((unix_micros($tsCol) - __mn) * $nSlices) div (__mx - __mn + 1)")
            .cast("int")))
      .select(col("__slice"), col("__x"), col(valueCol).cast("double").as("__y"))
    // sufficient statistics stay DECIMAL through the expanding window so
    // the accumulation is associative-exact in every engine; one cast to
    // double happens after, for the closed-form arithmetic
    val suff = based.groupBy(col("__slice"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(28,0)")).as("sx"),
        sum(col("__y").cast(s"decimal(28,$scale)")).as("sy"),
        sum((col("__x") * col("__y")).cast(s"decimal(28,$scale)")).as("sxy"),
        sum((col("__x") * col("__x")).cast("decimal(28,0)")).as("sxx"))
    // expanding accumulation over the ≤ nSlices-row sufficient-stat frame
    val wTrain = Window.orderBy(col("__slice"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val params = suff
      .withColumn("tn", sum(col("n")).over(wTrain))
      .withColumn("tsx", sum(col("sx")).over(wTrain).cast("double"))
      .withColumn("tsy", sum(col("sy")).over(wTrain).cast("double"))
      .withColumn("tsxy", sum(col("sxy")).over(wTrain).cast("double"))
      .withColumn("tsxx", sum(col("sxx")).over(wTrain).cast("double"))
      .filter(col("tn").isNotNull && col("tn") > 1)
      // all training rows at one time point → undefined fit: drop the fold
      // instead of dividing by zero
      .withColumn("__den",
        col("tn") * col("tsxx") - col("tsx") * col("tsx"))
      .filter(col("__den") =!= 0.0)
      .withColumn("slope",
        (col("tn") * col("tsxy") - col("tsx") * col("tsy")) / col("__den"))
      .withColumn("intercept",
        (col("tsy") - col("slope") * col("tsx")) / col("tn"))
      .select(col("__slice"), col("tn").as("n_train"),
        col("slope"), col("intercept"))
    based.join(broadcast(params), "__slice")
      .withColumn("__err",
        col("__y") - (col("intercept") + col("slope") * col("__x")))
      .groupBy(col("__slice"))
      .agg(
        first(col("n_train")).as("n_train"),
        count(lit(1)).as("n_test"),
        round(first(col("slope")), 6).as("slope"),
        round(first(col("intercept")), 6).as("intercept"),
        round(sqrt(dsum(col("__err") * col("__err"), 2 * scale) /
          count(lit(1))), 6).as("rmse_test"))
      .withColumnRenamed("__slice", "fold")
  }

  /** Validated early stopping — the Spark analog of the reference trainer's
    * patience/best-checkpoint loop
    * (`/root/reference/src/training/trainer.py:262-320`): gradient-boosted
    * trees stop adding iterations once the held-out improvement drops
    * below `tol`, via MLlib's `validationIndicatorCol`/`validationTol`
    * (each boosting step IS an "epoch", and stopping the additive series
    * at the best validation point is the boosting equivalent of
    * restore-best-checkpoint — trees past the stop are never built).
    *
    * The held-out set is the engine's leakage-safe hash split (never a
    * random split — reproducible across runs/engines/partitionings), and
    * the per-iteration validation trace comes back as a queryable frame
    * (iteration, val_loss) via `evaluateEachIteration`, the observability
    * half that [[trainingHistory]] provides for L-BFGS. Returns exactly
    * `model.getNumTrees` rows: fewer than `maxIter` rows IS the early
    * stop, visible in the result itself.
    *
    * Scale shape: one distributed fit (each boosting iteration is a
    * distributed tree build over the train partition), one distributed
    * scoring pass per built tree for the trace; the returned frame is
    * ≤ maxIter rows — driver-sized by definition.
    */
  def gbtEarlyStopTrace(df: DataFrame, idCol: String,
      featureCols: Seq[String], labelCol: String,
      maxIter: Int = 60, tol: Double = 0.01, valPerMille: Int = 200,
      seed: Long = 42L, partitions: Int = 2, maxBins: Int = 32): DataFrame = {
    import org.apache.spark.ml.regression.GBTRegressor
    val spark = df.sparkSession
    import spark.implicits._
    val base = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
      .withColumn("label", col(labelCol).cast("double"))
      .withColumn("is_val",
        SplitOps.hashBucket(col(idCol), 1000) < valPerMille)
    val data =
      (if (partitions > 0) base.coalesce(partitions) else base).cache()
    data.count()
    try {
      val gbt = new GBTRegressor()
        .setMaxIter(maxIter).setMaxDepth(5).setStepSize(0.5)
        .setMaxBins(maxBins)
        .setValidationIndicatorCol("is_val")
        .setSeed(seed)
      // validationTol has no fluent setter on GBTRegressor — set the
      // Param directly
      val model = gbt.set(gbt.validationTol, tol).fit(data)
      val losses = model.evaluateEachIteration(
        data.filter(col("is_val")), "squared")
      losses.toSeq.zipWithIndex
        .map { case (l, i) =>
          // an empty validation split yields NaN losses — surface them
          // rather than crash in BigDecimal
          val r = if (l.isNaN || l.isInfinite) l
            else BigDecimal(l).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
          (i.toLong, r, maxIter.toLong)
        }
        .toDF("iteration", "val_loss", "max_iter")
    } finally data.unpersist()
  }

  /** Engine-portable MULTI-TASK masked training twin of
    * [[multiTaskMasked]] (q62 / reference M13, `dataset.py:411-430`): two
    * task heads over ONE shared input frame, each seeing only the rows
    * where its own target is non-null — the regression head as exact
    * closed-form OLS (the [[ar1ClosedForm]] normal-equations arithmetic),
    * the classification head as the fixed-iteration IRLS Newton fit (the
    * q189 recipe) — so the whole masked-multi-task surface replays in SQL
    * (one plain SELECT + one recursive CTE). The MLlib estimator path
    * (q62) stays the production default.
    *
    * Output, one row per task: (task, n_rows, intercept, coef, metric) —
    * metric is in-sample RMSE for the regression head and final-iteration
    * mean log-loss for the classification head.
    */
  def multiTaskMaskedPortable(df: DataFrame, xCol: String,
      regTarget: String, clsTarget: String, iters: Int = 6): DataFrame = {
    import graft.functions.Stats.dsum
    val reg = df.filter(col(regTarget).isNotNull)
      .select(col(xCol).cast("double").as("x"),
        col(regTarget).cast("double").as("y"))
    val params = reg.agg(
        count(lit(1)).as("n"),
        dsum(col("x"), 2).as("sx"),
        dsum(col("y"), 2).as("sy"),
        dsum(col("x") * col("y"), 4).as("sxy"),
        dsum(col("x") * col("x"), 4).as("sxx"))
      .withColumn("__den", col("n") * col("sxx") - col("sx") * col("sx"))
      .withColumn("coef",
        when(col("__den") =!= 0.0,
          (col("n") * col("sxy") - col("sx") * col("sy")) / col("__den")))
      .withColumn("intercept",
        when(col("coef").isNotNull,
          (col("sy") - col("coef") * col("sx")) / col("n")))
    val regRow = reg.crossJoin(broadcast(params))
      .withColumn("err",
        col("y") - (col("intercept") + col("coef") * col("x")))
      .groupBy()
      .agg(round(sqrt(dsum(col("err") * col("err"), 4) / count(lit(1))), 6)
        .as("metric"),
        max(col("n")).as("n_rows"),
        round(max(col("intercept")), 6).as("intercept"),
        round(max(col("coef")), 6).as("coef"))
      .select(lit("reg").as("task"), col("n_rows"), col("intercept"),
        col("coef"), col("metric"))
    val clsIn = df.filter(col(clsTarget).isNotNull)
    val clsN = clsIn.agg(count(lit(1)).as("n_rows"))
    val clsRow = irlsLogisticPortable(clsIn, xCol, clsTarget, iters)
      .filter(col("iter") === iters)
      .crossJoin(broadcast(clsN))
      .select(lit("cls").as("task"), col("n_rows"),
        col("b0").as("intercept"), col("b1").as("coef"),
        col("log_loss").as("metric"))
    regRow.unionByName(clsRow)
  }

  /** Hash-drawn weights for the portable MLP twin: MD5 of a fixed tag
    * mapped to [−1, 1] with exactly 3 decimals — model parameters any
    * engine can re-derive (or inline as literals, as the oracle does).
    */
  def mlpPortableWeight(tag: String): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tag.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(6)
    ((BigInt(hex, 16) % 2001).toLong - 1000L).toDouble / 1000.0
  }

  /** Engine-portable MLP FORWARD pass — the batched-inference twin of the
    * q47/q50 classifier pipeline (reference M4/M12, `train.py:170-296` +
    * `dataset.py:117-123`): standardize two features with the exact
    * closed-form scaler (decimal sums → population std, the A13 surface),
    * run a fixed 2→`hidden`→1 tanh/sigmoid network whose weights are the
    * deterministic [[mlpPortableWeight]] draw, and report the score
    * HISTOGRAM (decile, n, avg_p) — the score-distribution card of a
    * quality-classifier inference sweep (A15).
    *
    * Portability: standardized inputs and hidden activations re-round to
    * 9 (absorbing libm tanh/exp ulp drift), scores to 6; weights are
    * 3-decimal literals — so the whole forward pass replays in plain SQL.
    * TRAINING stays MLlib's (q50); what this pins is the inference
    * arithmetic, the scaler, and the score-distribution report.
    *
    * Scale shape: one stats pass (exact decimal sums), then a single
    * pure-projection scoring scan into a 10-group aggregate — no shuffle
    * of the corpus, no per-row state; exactly how a 100 TB scoring sweep
    * should look.
    */
  def mlpForwardPortable(df: DataFrame, x1Col: String, x2Col: String,
      hidden: Int = 4): DataFrame = {
    import graft.functions.Stats.dsum
    require(hidden >= 1 && hidden <= 16, s"hidden must be in [1,16]")
    val d = df.select(col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"))
    val r = d.agg(
      count(lit(1)).as("n"),
      dsum(col("x1"), 2).as("sx1"),
      dsum(col("x1") * col("x1"), 4).as("s11"),
      dsum(col("x2"), 2).as("sx2"),
      dsum(col("x2") * col("x2"), 4).as("s22")).head()
    val n = r.getLong(0).toDouble
    require(n > 0, "empty input")
    val (sx1, s11, sx2, s22) = (r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
    val mu1 = sx1 / n
    val mu2 = sx2 / n
    val sd1 = math.sqrt((s11 - sx1 * sx1 / n) / n)
    val sd2 = math.sqrt((s22 - sx2 * sx2 / n) / n)
    require(sd1 > 0.0 && sd2 > 0.0,
      "constant feature: the portable scaler needs variance in x1 and x2")
    val z1 = round((col("x1") - lit(mu1)) / lit(sd1), 9)
    val z2 = round((col("x2") - lit(mu2)) / lit(sd2), 9)
    val hs = (0 until hidden).map { j =>
      val zj = lit(mlpPortableWeight(s"b1_$j")) +
        lit(mlpPortableWeight(s"w1_${j}_0")) * col("z1") +
        lit(mlpPortableWeight(s"w1_${j}_1")) * col("z2")
      // tanh via the logistic identity so BOTH engines run the same
      // exp-based expression (no native TANH in the oracle dialect)
      val th = lit(1.0) - lit(2.0) / (exp(lit(2.0) * zj) + lit(1.0))
      round(th, 9).as(s"h$j")
    }
    val out = (0 until hidden).foldLeft(
        lit(mlpPortableWeight("b2")): org.apache.spark.sql.Column) {
      (acc, j) => acc + lit(mlpPortableWeight(s"v_$j")) * col(s"h$j")
    }
    val p = round(lit(1.0) / (lit(1.0) + exp(-out)), 6)
    d.withColumn("z1", z1).withColumn("z2", z2)
      .select((Seq(col("z1"), col("z2")) ++ hs): _*)
      .withColumn("p", p)
      .withColumn("decile", least(floor(col("p") * 10).cast("long"), lit(9L)))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        round(dsum(col("p"), 6) / count(lit(1)), 6).as("avg_p"))
  }

  /** Fixed-sweep LASSO by coordinate descent on two features — the
    * hash-checkable twin of q42/q59's lasso ensemble member (reference
    * `train_ensemble.py:134-143` `Lasso(alpha=...)`): minimizes
    * (1/2n)·SSE + λ‖b‖₁ on mean-centered features (intercept recovered
    * from the means), with exactly `sweeps` cyclic soft-threshold updates.
    *
    * The engine-portability recipe (q189/q196 family): ONE distributed
    * exact-decimal pass collects the 9 sufficient statistics (n, Σx, Σy,
    * Σx², Σxy, Σy² for both features); every CD sweep is then pure scalar
    * arithmetic on those 9 numbers — zero further data passes, and the
    * whole trace replays in a recursive CTE over a 1-row stats frame.
    * Coefficients re-round to 9 per sweep so both engines re-enter every
    * sweep with identical doubles; the per-sweep penalized objective
    * (round-6) exposes the descent the reference logs per epoch.
    *
    * At 100 TB the single stats pass is the only data-sized work — the
    * textbook "sufficient statistics beat iterative scans" shape for
    * linear models on columnar stores.
    */
  def lassoCDPortable(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String, lambda: Double, sweeps: Int = 8): DataFrame = {
    import graft.functions.Stats.dsum
    require(sweeps >= 1, s"need at least one sweep, got $sweeps")
    require(lambda >= 0, s"lambda must be >= 0, got $lambda")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    def r6(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    def r2(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = df.select(col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"), col(yCol).cast("double").as("y"))
    val r = d.agg(
      count(lit(1)).as("n"),
      dsum(col("x1"), 2).as("sx1"),
      dsum(col("x2"), 2).as("sx2"),
      dsum(col("y"), 2).as("sy"),
      dsum(col("x1") * col("x1"), 4).as("s11"),
      dsum(col("x2") * col("x2"), 4).as("s22"),
      dsum(col("x1") * col("x2"), 4).as("s12"),
      dsum(col("x1") * col("y"), 4).as("s1y"),
      dsum(col("x2") * col("y"), 4).as("s2y"),
      dsum(col("y") * col("y"), 4).as("syy")).head()
    val n = r.getLong(0).toDouble
    require(n > 0, "empty input")
    val (sx1, sx2, sy) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    // centered (population) moments — the same formulas the SQL replay runs
    val s11c = r.getDouble(4) - sx1 * sx1 / n
    val s22c = r.getDouble(5) - sx2 * sx2 / n
    val s12c = r.getDouble(6) - sx1 * sx2 / n
    val s1yc = r.getDouble(7) - sx1 * sy / n
    val s2yc = r.getDouble(8) - sx2 * sy / n
    val syyc = r.getDouble(9) - sy * sy / n
    require(s11c > 0.0 && s22c > 0.0,
      "constant feature: lasso CD needs non-degenerate x1 and x2")
    def soft(rho: Double): Double =
      if (rho > lambda) rho - lambda
      else if (rho < -lambda) rho + lambda
      else 0.0
    var b1 = 0.0
    var b2 = 0.0
    val trace = (1 to sweeps).map { i =>
      b1 = r9(soft((s1yc - b2 * s12c) / n) * n / s11c)
      b2 = r9(soft((s2yc - b1 * s12c) / n) * n / s22c)
      // round-2: the objective's magnitude is mean(y²)-scale, where a
      // round-6 grid is not exactly representable in a double and the
      // engines' rounding algorithms diverge at the ulp
      val obj = r2((syyc - 2.0 * (b1 * s1yc + b2 * s2yc) +
        (b1 * b1 * s11c + 2.0 * b1 * b2 * s12c + b2 * b2 * s22c)) /
        (2.0 * n) + lambda * (math.abs(b1) + math.abs(b2)))
      val b0 = r6(sy / n - b1 * (sx1 / n) - b2 * (sx2 / n))
      (i, r6(b1), r6(b2), b0, obj)
    }
    trace.toDF("sweep", "b1", "b2", "intercept", "objective")
  }

  /** Fixed-iteration gradient-boosted STUMPS with a fixed candidate-split
    * grid — the hash-checkable twin of the MLlib GBT training loop
    * (q145/q155 family; reference `trainer.py:262-320`'s descend-and-
    * checkpoint loop): each round fits one depth-1 regression stump on the
    * residual, chosen by the round-2 PER-ROW variance-reduction gain over
    * the candidate grid (ties → lowest candidate index), leaf means round to 9
    * decimals, and both the per-round train/holdout RMSE trace and the
    * best-checkpoint flag replay exactly in unrolled SQL.
    *
    * Portability contract (the q189 recipe applied to boosting): the
    * holdout is the deterministic congruential hash split, every data-pass
    * sum is DECIMAL(28,12), leaf means re-round to 9 before they enter the
    * model, and the per-row prediction is a chain of comparisons against
    * round-9 constants — so both engines re-enter every round with
    * IDENTICAL doubles. The driver only CONTROLS the loop (argmax over
    * |cands| numbers, the GraphOps convention); each round's passes are
    * fully distributed, map-side combined, and candidate-grid width
    * multiplies per-row arithmetic, never data scans.
    *
    * Early-stop surface: `is_best` flags the round with the lowest holdout
    * RMSE (earliest on ties) — MLlib's best-checkpoint selection
    * (`validationTol`) expressed as a queryable column instead of a hidden
    * fit internal.
    */
  def boostedStumpsPortable(df: DataFrame, keyCol: String,
      f1: String, f2: String, yExpr: org.apache.spark.sql.Column,
      cands: Seq[(String, Double)], iters: Int = 6, lr: Double = 0.5,
      kSplit: Int = 5, holdBucket: Int = 0): DataFrame = {
    import graft.functions.Stats.dsum
    import org.apache.spark.sql.expressions.Window
    require(iters >= 1, s"need at least one round, got $iters")
    require(cands.nonEmpty, "need at least one candidate split")
    require(cands.forall(c => c._1 == f1 || c._1 == f2),
      s"candidate features must be $f1 or $f2")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = df.select(
        (SplitOps.hashBucket(col(keyCol), kSplit) =!= holdBucket)
          .as("is_train"),
        col(f1).cast("double").as("x1"),
        col(f2).cast("double").as("x2"),
        yExpr.cast("double").as("y"))
      .persist()
    try {
      def leftOf(c: (String, Double)): org.apache.spark.sql.Column =
        (if (c._1 == f1) col("x1") else col("x2")) <= lit(c._2)
      val base = d.filter(col("is_train"))
        .agg(dsum(col("y"), 12).as("s"), count(lit(1)).as("n")).head()
      require(base.getLong(1) > 0, "empty train split")
      val b0 = r9(base.getDouble(0) / base.getLong(1))
      var pred: org.apache.spark.sql.Column = lit(b0)
      val trace = (1 to iters).map { t =>
        val r = col("y") - pred
        // ONE pass: train residual total + per-candidate left sums/counts
        val aggs =
          Seq(dsum(when(col("is_train"), r), 12).as("s"),
            sum(when(col("is_train"), 1L)).as("n")) ++
          cands.zipWithIndex.flatMap { case (c, i) =>
            Seq(dsum(when(col("is_train") && leftOf(c), r), 12).as(s"sl$i"),
              sum(when(col("is_train") && leftOf(c), 1L)).as(s"nl$i"))
          }
        val row = d.agg(aggs.head, aggs.tail: _*).head()
        val s = row.getDouble(0)
        val n = row.getLong(1)
        val scored = cands.zipWithIndex.map { case (c, i) =>
          val sL = if (row.isNullAt(2 + 2 * i)) 0.0
            else row.getDouble(2 + 2 * i)
          val nL = if (row.isNullAt(3 + 2 * i)) 0L
            else row.getLong(3 + 2 * i)
          val nR = n - nL
          val sR = s - sL
          // PER-ROW gain (÷ n): keeps the magnitude low enough that the
          // round-2 grid is exactly representable in BOTH engines —
          // ROUND(x, s) on x·10^s beyond 2^53 is engine-dependent noise
          val gain = if (nL > 0 && nR > 0)
            Some(new java.math.BigDecimal((sL * sL / nL + sR * sR / nR) / n)
              .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue())
          else None
          (i, c, sL, nL, sR, nR, gain)
        }
        val best = scored.filter(_._7.isDefined)
          .sortBy { case (i, _, _, _, _, _, g) => (-g.get, i) }.head
        val (_, c, sL, nL, sR, nR, gain) = best
        val mL = r9(sL / nL)
        val mR = r9(sR / nR)
        pred = pred + lit(lr) * when(leftOf(c), lit(mL)).otherwise(lit(mR))
        val r2 = col("y") - pred
        val rm = d.groupBy(col("is_train"))
          .agg(round(sqrt(dsum(r2 * r2, 12) / count(lit(1))), 6).as("rmse"))
          .collect().map(x => x.getBoolean(0) -> x.getDouble(1)).toMap
        (t, c._1, c._2, mL, mR, gain.get, rm(true), rm(false))
      }
      trace.toDF("iter", "feature", "threshold", "__ml", "__mr", "gain",
          "train_rmse", "valid_rmse")
        .withColumn("is_best",
          when(row_number().over(
            Window.orderBy(col("valid_rmse").asc, col("iter").asc)) === 1, 1)
            .otherwise(0))
        .select(col("iter"), col("feature"), col("threshold"),
          round(col("__ml"), 6).as("m_left"), round(col("__mr"), 6)
            .as("m_right"),
          col("gain"), col("train_rmse"), col("valid_rmse"), col("is_best"))
    } finally { d.unpersist(); () }
  }

  /** Portable exact-split CART regression tree — the hash-checkable twin of
    * the MLlib `DecisionTreeRegressor` split search inside the RF/GBT
    * ensembles (q42/q59/q155; reference `train_ensemble.py:137-139`,
    * `trainer.py:262-320`): a fixed-depth tree grown level by level with an
    * EXHAUSTIVE exact split search — per-feature threshold candidates are
    * the distinct observed values (`x <= v` sends a row left), the winning
    * split maximizes the round-2 per-row variance-reduction gain
    * (sL²/nL + sR²/nR)/n with deterministic tie-break (gain desc, feature
    * name asc, threshold asc), and children must keep `minLeaf` train rows.
    * Leaf predictions are round-6 train means. The whole fit replays in
    * unrolled SQL (one CTE block per level: assignment LEFT JOIN on the
    * previous level's 1-row-per-node winners, per-(node,feature,value)
    * DECIMAL(28,12) aggregates, prefix-sum window over the tiny aggregated
    * frame, per-node argmax) — digit for digit, the q189/q194 contract.
    *
    * Scale shape: each level is ONE unioned scan aggregated down to
    * (nodes × features × distinct values) cells — map-side combined,
    * linear in data; the prefix-sum window partitions by (node, feature)
    * over that aggregated frame only. The driver holds just the ≤2^depth
    * winning splits per level (the q234 driver-argmax convention). At
    * 100 TB the only knob is the candidate domain: quantize the feature to
    * a fixed decimal grid first and the same code is a binned search —
    * exactly MLlib's maxBins strategy.
    *
    * Returns one row per tree node: split nodes carry (feature, threshold,
    * gain), leaves carry the round-6 prediction; node ids are heap-ordered
    * (root 1, children 2n / 2n+1), depth derived from the id.
    *
    * CALLER CONTRACT on `gainRound`: the gain is rounded in ABSOLUTE
    * decimals before the argmax, so with the default 2 digits a target
    * whose per-row gains are all ≪ 0.01 collapses every candidate to
    * equal round-2 gains and the "best" split degrades to the
    * (feature asc, value asc) tie-break — deterministic and
    * oracle-consistent, but a silent tree-quality footgun. Either scale y
    * so gains are O(1) or larger (q407 multiplies its price target by
    * 1000), or raise `gainRound` — and mirror the same digits in any SQL
    * replay.
    */
  def cartTreePortable(df: DataFrame, keyCol: String,
      f1: String, f2: String, yExpr: Column,
      maxDepth: Int = 3, minLeaf: Int = 5,
      kSplit: Int = 5, holdBucket: Int = 0, gainRound: Int = 2): DataFrame = {
    import graft.functions.Stats.dsum
    import org.apache.spark.sql.expressions.Window
    require(maxDepth >= 1 && maxDepth <= 4,
      s"maxDepth must be in [1,4] (2^depth driver-held splits), got $maxDepth")
    require(minLeaf >= 1, s"minLeaf must be positive, got $minLeaf")
    val spark = df.sparkSession
    import spark.implicits._
    val d = df.select(
        (SplitOps.hashBucket(col(keyCol), kSplit) =!= holdBucket)
          .as("is_train"),
        col(f1).cast("double").as("x1"),
        col(f2).cast("double").as("x2"),
        yExpr.cast("double").as("y"))
      .filter(col("is_train"))
      .persist()
    try {
      def r6(v: Double): Double =
        new java.math.BigDecimal(v)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      // chained node assignment: parents processed before children, so a
      // later `when` only fires after the earlier one routed the row there
      def nodeExpr(splits: Seq[(Long, String, Double)]): Column =
        splits.foldLeft(lit(1L)) { case (e, (nd, f, thr)) =>
          val x = if (f == f1) col("x1") else col("x2")
          when(e === nd,
            when(x <= lit(thr), lit(2 * nd)).otherwise(lit(2 * nd + 1)))
            .otherwise(e)
        }
      var splits = Vector.empty[(Long, String, Double)]
      // output rows: (node, depth, kind, feature, threshold, n_rows, gain,
      // prediction)
      var out = Vector.empty[(Long, Int, String, Option[String],
        Option[Double], Long, Option[Double], Option[Double])]
      var frontier = Set(1L)
      (0 until maxDepth).foreach { depth =>
        val assigned = d.withColumn("node", nodeExpr(splits))
        val totals = assigned.groupBy("node")
          .agg(count(lit(1)).as("nn"), dsum(col("y"), 12).as("sn"))
        val longF = assigned
          .select(col("node"), lit(f1).as("feat"), col("x1").as("v"),
            col("y"))
          .unionAll(assigned.select(col("node"), lit(f2).as("feat"),
            col("x2").as("v"), col("y")))
        val cells = longF.groupBy("node", "feat", "v")
          .agg(count(lit(1)).as("nc"),
            sum(col("y").cast("decimal(28,12)")).as("sc"))
        val w = Window.partitionBy("node", "feat").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val scored = cells
          .select(col("node"), col("feat"), col("v"),
            sum(col("nc")).over(w).as("nl"),
            sum(col("sc")).over(w).cast("double").as("sl"))
          .join(broadcast(totals), "node")
          .withColumn("nr", col("nn") - col("nl"))
          .withColumn("sr", col("sn") - col("sl"))
          .filter(col("nl") >= minLeaf && col("nr") >= minLeaf)
          .withColumn("gain",
            round((col("sl") * col("sl") / col("nl") +
              col("sr") * col("sr") / col("nr")) / col("nn"), gainRound))
        val winners = scored
          .withColumn("rk", row_number().over(
            Window.partitionBy("node")
              .orderBy(col("gain").desc, col("feat").asc, col("v").asc)))
          .filter(col("rk") === 1)
          .select("node", "feat", "v", "nn", "gain")
          .collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
            r.getLong(3), r.getDouble(4)))
          .sortBy(_._1)
        val statRows = totals.collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        val won = winners.map(_._1).toSet
        // frontier nodes that found no admissible split become leaves now
        frontier.toSeq.sorted.filterNot(won.contains).foreach { nd =>
          val (nn, sn) = statRows(nd)
          out :+= ((nd, depth, "leaf", None, None, nn, None,
            Some(r6(sn / nn))))
        }
        winners.foreach { case (nd, f, thr, nn, g) =>
          out :+= ((nd, depth, "split", Some(f), Some(thr), nn, Some(g),
            None))
          splits :+= ((nd, f, thr))
        }
        frontier = winners.flatMap(w0 => Seq(2 * w0._1, 2 * w0._1 + 1)).toSet
      }
      if (frontier.nonEmpty) {
        val finalStats = d.withColumn("node", nodeExpr(splits))
          .groupBy("node")
          .agg(count(lit(1)).as("nn"), dsum(col("y"), 12).as("sn"))
          .collect()
          .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
        frontier.toSeq.sorted.foreach { nd =>
          val (nn, sn) = finalStats(nd)
          out :+= ((nd, maxDepth, "leaf", None, None, nn, None,
            Some(r6(sn / nn))))
        }
      }
      out.sortBy(_._1)
        .toDF("node", "depth", "kind", "feature", "threshold", "n_rows",
          "gain", "prediction")
    } finally { d.unpersist(); () }
  }

  /** Per-row predictions of a `cartTreePortable` model — routes each row
    * down the collected split chain and emits the leaf's round-6 mean.
    * Used by the MLlib `DecisionTreeRegressor` pinning spec.
    */
  def cartPredict(model: DataFrame, f1: String, f2: String): Column = {
    val rows = model.collect()
    val splits = rows.filter(_.getString(2) == "split")
      .map(r => (r.getLong(0), r.getString(3), r.getDouble(4)))
      .sortBy(_._1)
    val leaves = rows.filter(_.getString(2) == "leaf")
      .map(r => (r.getLong(0), r.getDouble(7)))
    val nodeE = splits.foldLeft(lit(1L)) { case (e, (nd, f, thr)) =>
      val x = if (f == f1) col(f1).cast("double") else col(f2).cast("double")
      when(e === nd,
        when(x <= lit(thr), lit(2 * nd)).otherwise(lit(2 * nd + 1)))
        .otherwise(e)
    }
    leaves.foldLeft(lit(null).cast("double")) { case (e, (nd, p)) =>
      when(nodeE === nd, lit(p)).otherwise(e)
    }
  }

  /** K-fold OUT-OF-FOLD target encoding — the leakage-safe categorical
    * encoder (the high-cardinality-feature workhorse): a row in fold f is
    * encoded with its category's target mean computed from the OTHER
    * folds only, enc(c, f) = (S_c − S_{c,f}) / (n_c − n_{c,f}); a
    * category entirely inside one fold falls back to the global
    * out-of-fold mean. Folds hash on `groupKey` (M2 — group-leakage-safe,
    * not row-random). Everything is ONE (category, fold) aggregation with
    * DECIMAL sums carried through the rollup, so the encoder replays in
    * SQL exactly; `scale` is the target's true decimal precision (the
    * dsum contract).
    *
    * Returns one row per (category, fold): the encoder table a scoring
    * join consumes — model state, not data.
    */
  def oofTargetEncoding(df: DataFrame, catCol: String, targetCol: String,
      groupKey: String, k: Int = 5, scale: Int = 2): DataFrame = {
    require(k >= 2, s"need k >= 2 folds, got $k")
    val cells = df
      .select(col(catCol).as("cat"),
        SplitOps.hashBucket(col(groupKey), k).as("fold"),
        col(targetCol).cast("double").as("__y"))
      .groupBy(col("cat"), col("fold"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("__y").cast(s"decimal(28,$scale)")).as("__s"))
    val catTot = cells.groupBy(col("cat"))
      .agg(sum(col("n_rows")).as("__nc"), sum(col("__s")).as("__sc"))
    val foldTot = cells.groupBy(col("fold"))
      .agg(sum(col("n_rows")).as("__nf"), sum(col("__s")).as("__sf"))
    val grand = cells.agg(sum(col("n_rows")).as("__n"),
      sum(col("__s")).as("__stot"))
    cells
      .join(broadcast(catTot), "cat")
      .join(broadcast(foldTot), "fold")
      .crossJoin(broadcast(grand))
      .withColumn("enc",
        when(col("__nc") - col("n_rows") > 0L,
          round((col("__sc") - col("__s")).cast("double") /
            (col("__nc") - col("n_rows")).cast("double"), 6))
        .otherwise(
          round((col("__stot") - col("__sf")).cast("double") /
            (col("__n") - col("__nf")).cast("double"), 6)))
      .select(col("cat"), col("fold"), col("n_rows"), col("enc"))
      .orderBy(col("cat"), col("fold"))
  }

  /** Portable Gaussian Naive Bayes — a third hash-proven classifier family
    * next to the IRLS logistic (q189) and the boosted stumps (q194),
    * mirroring the reference's classical-baseline sweep
    * (`/root/reference/scripts/train_ensemble.py:134-143`). Fully closed
    * form, so unlike every iterative fit it needs no Newton replay:
    * per-class priors, means, and sample variances from ONE exact-decimal
    * aggregation over the hash-split train rows (leakage-safe M2 split on
    * `keyCol`), parameters rounded to 9 decimals, then one pure-projection
    * scoring scan over the test rows — log-posteriors evaluated with a
    * fixed parenthesization both engines execute identically on the
    * round-9 parameters (the q189 exp/ln portability contract), rounded to
    * 6 before the argmax so 1-ulp drift cannot flip a prediction. Argmax
    * ties break toward the lexicographically smallest class.
    *
    * Scale shape: params are |classes| rows collected at the driver (a
    * bounded model, exactly what a fitted estimator is) and folded back in
    * as literals — the scoring scan carries NO join, NO shuffle before the
    * tiny confusion-matrix aggregate. Returns (actual, predicted, n_rows).
    *
    * Variances get a 1e-9 floor so a degenerate (constant) feature yields
    * a finite likelihood instead of a division by zero — documented, not
    * hidden: the floor is itself part of the replayed arithmetic.
    */
  def gaussianNbPortable(df: DataFrame, keyCol: String, classCol: String,
      f1: String, f2: String, trainBuckets: Int = 7): DataFrame = {
    import graft.functions.Stats.dsum
    val spark = df.sparkSession
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = df.select(col(classCol).cast("string").as("cls"),
      col(f1).cast("double").as("x1"), col(f2).cast("double").as("x2"),
      SplitOps.hashBucket(col(keyCol), 10).as("__b"))
    val train = d.filter(col("__b") < trainBuckets)
    val test = d.filter(col("__b") >= trainBuckets)
    // ONE aggregation → |classes| parameter rows; sums are exact decimals
    // so the closed-form fit is independent of accumulation order
    val params = train.groupBy(col("cls")).agg(
        count(lit(1)).as("nc"),
        dsum(col("x1"), 12).as("s1"), dsum(col("x1") * col("x1"), 12).as("q1"),
        dsum(col("x2"), 12).as("s2"), dsum(col("x2") * col("x2"), 12).as("q2"))
      .orderBy(col("cls")).collect()
    val nTrain = params.map(_.getLong(1)).sum
    require(nTrain > 0, "gaussianNbPortable: empty training split")
    case class P(cls: String, prior: Double, mu1: Double, v1: Double,
      mu2: Double, v2: Double)
    val ps = params.map { r =>
      val (nc, s1, q1, s2, q2) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      require(nc > 1, s"class ${r.getString(0)} needs >1 train rows")
      val mu1 = r9(s1 / nc); val mu2 = r9(s2 / nc)
      // sample variance from the exact sums, then the 1e-9 floor
      val v1 = r9(math.max((q1 - s1 * s1 / nc) / (nc - 1), 1e-9))
      val v2 = r9(math.max((q2 - s2 * s2 / nc) / (nc - 1), 1e-9))
      P(r.getString(0), r9(nc.toDouble / nTrain), mu1, v1, mu2, v2)
    }
    // fixed-shape log-posterior; 6.283185307179586 is 2π as the literal
    // BOTH engines parse, so no π builtin can differ
    def score(p: P): org.apache.spark.sql.Column =
      round(log(lit(p.prior))
        - lit(0.5) * (log(lit(6.283185307179586) * lit(p.v1))
          + ((col("x1") - lit(p.mu1)) * (col("x1") - lit(p.mu1))) / lit(p.v1))
        - lit(0.5) * (log(lit(6.283185307179586) * lit(p.v2))
          + ((col("x2") - lit(p.mu2)) * (col("x2") - lit(p.mu2))) / lit(p.v2)),
        6)
    // argmax with smallest-class tie-break: strictly-greater fold over the
    // class-sorted parameter rows
    val pred = ps.tail.foldLeft(
        (lit(ps.head.cls), score(ps.head))) { case ((bc, bs), p) =>
      val s = score(p)
      (when(s > bs, lit(p.cls)).otherwise(bc), when(s > bs, s).otherwise(bs))
    }._1
    test.withColumn("predicted", pred)
      .groupBy(col("cls").as("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** Confident-learning label-noise audit (Northcutt et al. 2021) over
    * [[gaussianNbPortable]]'s classifier: estimate WHICH labels are
    * wrong, not just how many. On the held-out split, each row gets
    * calibrated-ish class probabilities (softmax over the NB
    * log-posteriors); per-class confidence thresholds t_j are the mean
    * predicted probability of class j among rows LABELED j; a row
    * joins the confident joint at cell (given, suspected) where
    * suspected = argmax over classes whose probability clears their own
    * threshold (rows clearing none abstain — the paper's rule). The
    * off-diagonal mass IS the estimated label-noise rate, per
    * (given → suspected) direction — the audit that says which slice of
    * a labeled corpus to re-annotate first.
    *
    * Portability: log-posteriors round to 6 before the softmax; each
    * exp term rounds to 12 and the denominator accumulates those
    * rounded terms in exact decimal (order-free — a raw double Σ over
    * a window would depend on engine accumulation order); probabilities
    * and thresholds round to 6. Every comparison thereafter is on
    * identical doubles.
    *
    * Scale shape: one exact-decimal parameter aggregation (train), one
    * scoring scan grouped by distinct feature combos with multiplicity,
    * a |classes|-row threshold frame broadcast back, one (given,
    * suspected) count — no shuffle wider than the distinct-combo frame.
    */
  def confidentLearningCard(df: DataFrame, keyCol: String,
      classCol: String, f1: String, f2: String,
      trainBuckets: Int = 7): DataFrame = {
    import graft.functions.Stats.dsum
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = df.select(col(classCol).cast("string").as("cls"),
      col(f1).cast("double").as("x1"), col(f2).cast("double").as("x2"),
      SplitOps.hashBucket(col(keyCol), 10).as("__b"))
    val train = d.filter(col("__b") < trainBuckets)
    val test = d.filter(col("__b") >= trainBuckets)
      .groupBy(col("cls"), col("x1"), col("x2"))
      .agg(count(lit(1)).as("n"))
    val params = train.groupBy(col("cls")).agg(
        count(lit(1)).as("nc"),
        dsum(col("x1"), 12).as("s1"), dsum(col("x1") * col("x1"), 12).as("q1"),
        dsum(col("x2"), 12).as("s2"), dsum(col("x2") * col("x2"), 12).as("q2"))
      .orderBy(col("cls")).collect()
    val nTrain = params.map(_.getLong(1)).sum
    require(nTrain > 0, "confidentLearningCard: empty training split")
    case class P(cls: String, prior: Double, mu1: Double, v1: Double,
      mu2: Double, v2: Double)
    val ps = params.map { r =>
      val (nc, s1, q1, s2, q2) = (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))
      require(nc > 1, s"class ${r.getString(0)} needs >1 train rows")
      P(r.getString(0), r9(nc.toDouble / nTrain), r9(s1 / nc),
        r9(math.max((q1 - s1 * s1 / nc) / (nc - 1), 1e-9)),
        r9(s2 / nc),
        r9(math.max((q2 - s2 * s2 / nc) / (nc - 1), 1e-9)))
    }
    def score(p: P): org.apache.spark.sql.Column =
      round(log(lit(p.prior))
        - lit(0.5) * (log(lit(6.283185307179586) * lit(p.v1))
          + ((col("x1") - lit(p.mu1)) * (col("x1") - lit(p.mu1))) / lit(p.v1))
        - lit(0.5) * (log(lit(6.283185307179586) * lit(p.v2))
          + ((col("x2") - lit(p.mu2)) * (col("x2") - lit(p.mu2))) / lit(p.v2)),
        6)
    val smax = greatest(ps.map(score).toSeq: _*)
    // per-class exp terms rounded to 12; the softmax denominator is
    // their EXACT decimal sum (order-free in any engine)
    val es = ps.map(p => round(exp(score(p) - smax), 12))
    val denom = es.map(_.cast("decimal(38,12)")).reduce(_ + _)
      .cast("double")
    val longFrame = test.select(col("cls").as("given"), col("x1"),
        col("x2"), col("n"),
        explode(array(ps.zip(es).map { case (p, e) =>
          struct(lit(p.cls).as("cand"), round(e / denom, 6).as("p"))
        }: _*)).as("__c"))
      .select(col("given"), col("x1"), col("x2"), col("n"),
        col("__c.cand").as("cand"), col("__c.p").as("p"))
    val thresholds = longFrame.filter(col("given") === col("cand"))
      .groupBy(col("cand"))
      .agg(round(
        sum((col("n").cast("double") * col("p")).cast("decimal(38,6)"))
          .cast("double") / sum(col("n")).cast("double"), 6).as("t"))
    val wPick = org.apache.spark.sql.expressions.Window
      .partitionBy(col("given"), col("x1"), col("x2"))
      .orderBy(col("p").desc, col("cand"))
    val joint = longFrame.join(broadcast(thresholds), "cand")
      .filter(col("p") >= col("t"))
      .withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1)
      .groupBy(col("given"), col("cand").as("suspected"))
      .agg(sum(col("n")).as("n_rows"))
    joint.join(broadcast(thresholds
        .select(col("cand").as("suspected"), col("t").as("t_suspected"))),
        "suspected")
      .select(col("given"), col("suspected"), col("n_rows"),
        col("t_suspected"))
      .orderBy(col("given"), col("suspected"))
  }

  /** Fixed-iteration Huber-IRLS robust regression y = b0 + b1·x — the
    * outlier-resistant member of the portable-fit family (ridge q183,
    * logistic IRLS q189, lasso CD q196): per-row weight 1 for |r| ≤ δ,
    * δ/|r| beyond, refit by weighted least squares each round. Same
    * portability contract as [[irlsLoop]]: DECIMAL(28,12) per-row sums,
    * round-9 parameters per step, fixed-shape double assembly — the
    * whole loop replays as a DuckDB recursive CTE. The trace carries the
    * mean Huber loss (r²/2 inside, δ(|r|−δ/2) outside) per round.
    */
  def huberIrlsPortable(df: DataFrame, xCol: String, yCol: String,
      delta: Double, iters: Int = 8): DataFrame = {
    import graft.functions.Stats.dsum
    require(iters >= 1 && delta > 0.0, "need iters >= 1, delta > 0")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val d = df.select(col(xCol).cast("double").as("x"),
      col(yCol).cast("double").as("y")).persist()
    try {
      var b0 = 0.0
      var b1 = 0.0
      val trace = (1 to iters).map { i =>
        val r = col("y") - (lit(b0) + lit(b1) * col("x"))
        val w = when(abs(r) <= lit(delta), lit(1.0))
          .otherwise(lit(delta) / abs(r))
        val loss = when(abs(r) <= lit(delta), r * r / lit(2.0))
          .otherwise(lit(delta) * (abs(r) - lit(delta) / lit(2.0)))
        val m = d.agg(
          count(lit(1)).as("n"),
          dsum(w, 12).as("sw"),
          dsum(w * col("x"), 12).as("swx"),
          dsum(w * col("y"), 12).as("swy"),
          dsum(w * col("x") * col("x"), 12).as("swxx"),
          dsum(w * col("x") * col("y"), 12).as("swxy"),
          dsum(loss, 12).as("sl")).head()
        val n = m.getLong(0)
        val (sw, swx, swy, swxx, swxy, sl) = (m.getDouble(1), m.getDouble(2),
          m.getDouble(3), m.getDouble(4), m.getDouble(5), m.getDouble(6))
        val det = sw * swxx - swx * swx
        b1 = r9((sw * swxy - swx * swy) / det)
        b0 = r9((swxx * swy - swx * swxy) / det)
        val lm = new java.math.BigDecimal(sl / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (i, b0, b1, lm)
      }
      trace.toDF("iter", "__b0", "__b1", "huber_loss")
        .select(col("iter"), round(col("__b0"), 6).as("b0"),
          round(col("__b1"), 6).as("b1"), col("huber_loss"))
    } finally { d.unpersist(); () }
  }

  /** Fixed-iteration 1-D two-component Gaussian-mixture EM — the
    * unsupervised member of the portable-fit family (IRLS q189, Huber
    * q303): responsibilities are fixed-shape doubles per row, the seven
    * E-step moments accumulate as DECIMAL(28,12), and the M-step
    * parameters round to 9 per iteration, so the whole fit replays as a
    * DuckDB recursive CTE. Deterministic closed-form init
    * (μ = mean ∓ sd, σ² = var, π = ½); a vanishing mixture denominator
    * (double underflow on far outliers) falls back to γ = ½ in BOTH
    * engines. Trace: per iteration the parameters and mean
    * log-likelihood (the EM monotonicity certificate).
    */
  def gmm1dEmPortable(df: DataFrame, xCol: String,
      iters: Int = 6): DataFrame = {
    import graft.functions.Stats.dsum
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    // fan the value column out before persisting: the per-iteration
    // aggregates are the hot path and a one-row-group scan would pin
    // them to one core (decimal sums are order-free; guide §2.2)
    val d = graft.operators.ParOps.fanOut(df.filter(col(xCol).isNotNull)
      .select(col(xCol).cast("double").as("x")),
      weight = 16.0).persist() // iters× exp/decimal E-step aggregates
    try {
      val m0 = d.agg(count(lit(1)).as("n"), dsum(col("x"), 12).as("sx"),
        dsum(col("x") * col("x"), 12).as("sxx")).head()
      val n = m0.getLong(0)
      require(n > 1, s"need > 1 rows, got $n")
      val nD = n.toDouble
      val (sx, sxx) = (m0.getDouble(1), m0.getDouble(2))
      val mean = sx / nD
      val varAll = (sxx - sx * sx / nD) / (nD - 1.0)
      // a zero-variance (constant) column has no mixture to fit, and a
      // component whose variance collapses mid-fit would divide by zero
      // in the next E-step density (loudly under ANSI; as silent inf in
      // the SQL replay) — both are out of the portable-fit contract
      require(varAll > 0.0,
        s"gmm1dEmPortable needs non-degenerate variance, got $varAll")
      val sd = math.sqrt(varAll)
      var pi = 0.5
      var mu1 = r9(mean - sd)
      var mu2 = r9(mean + sd)
      var v1 = r9(varAll)
      var v2 = r9(varAll)
      val twoPi = 6.283185307179586
      val trace = (1 to iters).map { i =>
        def dens(mu: Double, v: Double) =
          exp(-((col("x") - lit(mu)) * (col("x") - lit(mu))) /
            (lit(2.0) * lit(v))) / sqrt(lit(twoPi) * lit(v))
        val n1 = lit(pi) * dens(mu1, v1)
        val n2 = (lit(1.0) - lit(pi)) * dens(mu2, v2)
        val den = n1 + n2
        val g = when(den > 0.0, n1 / den).otherwise(lit(0.5))
        val g2 = lit(1.0) - g
        val r = d.agg(
          dsum(g, 12).as("sg"),
          dsum(g * col("x"), 12).as("sgx"),
          dsum(g * (col("x") * col("x")), 12).as("sgxx"),
          dsum(g2, 12).as("sh"),
          dsum(g2 * col("x"), 12).as("shx"),
          dsum(g2 * (col("x") * col("x")), 12).as("shxx"),
          dsum(log(den), 12).as("ll")).head()
        val (sg, sgx, sgxx) = (r.getDouble(0), r.getDouble(1),
          r.getDouble(2))
        val (sh, shx, shxx) = (r.getDouble(3), r.getDouble(4),
          r.getDouble(5))
        pi = r9(sg / nD)
        mu1 = r9(sgx / sg)
        mu2 = r9(shx / sh)
        v1 = r9(sgxx / sg - (sgx / sg) * (sgx / sg))
        v2 = r9(shxx / sh - (shx / sh) * (shx / sh))
        require(v1 > 0.0 && v2 > 0.0,
          s"component variance collapsed at iteration $i: v1=$v1 v2=$v2")
        val llm = new java.math.BigDecimal(r.getDouble(6) / n)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        (i, pi, mu1, mu2, v1, v2, llm)
      }
      trace.toDF("iter", "__pi", "__m1", "__m2", "__v1", "__v2",
          "log_lik")
        .select(col("iter"), round(col("__pi"), 6).as("pi"),
          round(col("__m1"), 6).as("mu1"),
          round(col("__m2"), 6).as("mu2"),
          round(col("__v1"), 6).as("var1"),
          round(col("__v2"), 6).as("var2"),
          col("log_lik"))
        .orderBy(col("iter"))
    } finally { d.unpersist(); () }
  }

  /** Fixed-iteration 1-D k-means (Lloyd 1982) in the portable-fit
    * contract (IRLS q189, GMM q316): deterministic equal-spaced init
    * cⱼ = min + (2j−1)(max−min)/2k, hard nearest-center assignment with
    * ties toward the lower cluster id, per-cluster DECIMAL(28,12) sum /
    * BIGINT count moments, centers rounded to 9 per iteration — the
    * whole trajectory replays as a DuckDB recursive CTE. An emptied
    * cluster keeps its previous center (both engines). Trace: one row
    * per (iteration, cluster) with the post-update center, the
    * assignment-pass size, and the iteration's WCSS at its INPUT
    * centers (the Lloyd monotonicity certificate).
    *
    * Scale shape: per iteration ONE single-row conditional aggregation
    * over the persisted value column — assignment is a fixed-shape
    * codegen'd CASE, never a materialized label column or a shuffle
    * keyed on cluster.
    */
  def kmeans1dPortable(df: DataFrame, xCol: String, k: Int = 3,
      iters: Int = 6): DataFrame = {
    import graft.functions.Stats.dsum
    require(k >= 2 && iters >= 1, s"need k >= 2 and iters >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    // fan the value column out before persisting: the per-iteration
    // aggregates are the hot path and a one-row-group scan would pin
    // them to one core (decimal sums are order-free; guide §2.2)
    val d = graft.operators.ParOps.fanOut(df.filter(col(xCol).isNotNull)
      .select(col(xCol).cast("double").as("x")),
      weight = 16.0).persist() // iters× k-way CASE-chain aggregates
    try {
      val b = d.agg(count(lit(1)).as("n"), min(col("x")).as("mn"),
        max(col("x")).as("mx")).head()
      val (n, mn, mx) = (b.getLong(0), b.getDouble(1), b.getDouble(2))
      require(n >= k, s"need at least k=$k rows, got $n")
      require(mx > mn, "degenerate constant column: no clusters to fit")
      var centers = (1 to k).map(j =>
        r9(mn + (2 * j - 1) * (mx - mn) / (2 * k))).toArray
      val trace = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Double, Long, Double)]
      for (i <- 1 to iters) {
        // nearest center, ties to the lower cluster id: the CASE chain
        // j wins iff |x−cⱼ| ≤ |x−cₗ| for every later l (earlier js
        // already lost their own chain test)
        def assignIs(j: Int): Column =
          ((j + 1) to k).map(l =>
            abs(col("x") - lit(centers(j - 1))) <=
              abs(col("x") - lit(centers(l - 1))))
            .reduceOption(_ && _).getOrElse(lit(true))
        var assign: Column = when(assignIs(1), 1)
        for (j <- 2 until k) assign = assign.when(assignIs(j), j)
        assign = assign.otherwise(k)
        val nearestC = (1 until k).foldLeft(when(assign === 1,
          lit(centers(0)))) { (c, j) =>
          c.when(assign === (j + 1), lit(centers(j)))
        }
        val aggs = (1 to k).flatMap { j =>
          Seq(dsum(when(assign === j, col("x")), 12).as(s"s$j"),
            sum(when(assign === j, 1L).otherwise(0L)).as(s"n$j"))
        } :+ dsum((col("x") - nearestC) * (col("x") - nearestC), 12)
          .as("wcss")
        val r = d.agg(aggs.head, aggs.tail: _*).head()
        val wcss = new java.math.BigDecimal(r.getAs[Double]("wcss"))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
        val sizes = (1 to k).map(j => r.getAs[Long](s"n$j"))
        centers = (1 to k).map { j =>
          val nj = sizes(j - 1)
          if (nj > 0L) r9(r.getAs[Double](s"s$j") / nj.toDouble)
          else centers(j - 1)
        }.toArray
        (1 to k).foreach(j =>
          trace += ((i, j, centers(j - 1), sizes(j - 1), wcss)))
      }
      trace.toSeq.toDF("iter", "cluster", "__c", "size", "wcss")
        .select(col("iter"), col("cluster"),
          round(col("__c"), 6).as("center"), col("size"), col("wcss"))
        .orderBy(col("iter"), col("cluster"))
    } finally { d.unpersist(); () }
  }

  /** Shared closed-form 2-feature OLS moments: one exact-decimal
    * aggregation to (n, Σx₁, Σx₂, Σy, Σx₁², Σx₂², Σx₁x₂, Σx₁y, Σx₂y,
    * Σy²); centered sums and the 2×2 normal-equation solve are
    * fixed-shape doubles on that one row — engine-portable, and the
    * only contact with the data is the single scan.
    */
  private def ols2Moments(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    import graft.functions.Stats.dsum
    val d = df.select(col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"), col(yCol).cast("double").as("y"))
    d.agg(
      count(lit(1)).as("n"),
      dsum(col("x1"), 12).as("s1"),
      dsum(col("x2"), 12).as("s2"),
      dsum(col("y"), 12).as("sy"),
      dsum(col("x1") * col("x1"), 12).as("s11"),
      dsum(col("x2") * col("x2"), 12).as("s22"),
      dsum(col("x1") * col("x2"), 12).as("s12"),
      dsum(col("x1") * col("y"), 12).as("s1y"),
      dsum(col("x2") * col("y"), 12).as("s2y"),
      dsum(col("y") * col("y"), 12).as("syy"),
      dsum(abs(col("x1")), 12).as("sa1"),
      dsum(abs(col("x2")), 12).as("sa2"))
  }

  /** Linear-SHAP attribution card for the closed-form 2-feature OLS fit
    * (independence form, Lundberg & Lee 2017 §4.1: φⱼ(x) = bⱼ·(xⱼ−x̄ⱼ)):
    * per feature, the coefficient and the global importance
    * E|φⱼ| = |bⱼ|·E|xⱼ−x̄ⱼ|, normalized to shares. Two scans total (one
    * for moments + fit, one for the mean absolute deviations around the
    * fitted means) — attributions are never materialized per row.
    */
  def linearShapCard(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    import graft.functions.Stats.dsum
    val m = ols2Moments(df, x1Col, x2Col, yCol).head()
    val n = m.getLong(0)
    val nD = n.toDouble
    val (s1, s2, sy) = (m.getDouble(1), m.getDouble(2), m.getDouble(3))
    val (s11, s22, s12) = (m.getDouble(4), m.getDouble(5), m.getDouble(6))
    val (s1y, s2y) = (m.getDouble(7), m.getDouble(8))
    val c11 = s11 - s1 * s1 / nD
    val c22 = s22 - s2 * s2 / nD
    val c12 = s12 - s1 * s2 / nD
    val c1y = s1y - s1 * sy / nD
    val c2y = s2y - s2 * sy / nD
    val det = c11 * c22 - c12 * c12
    // round-9 fixed point (the irlsLoop recipe): absorbs last-ulp
    // engine differences before the parameters feed the second pass
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val b1 = r9((c22 * c1y - c12 * c2y) / det)
    val b2 = r9((c11 * c2y - c12 * c1y) / det)
    val (m1, m2) = (r9(s1 / nD), r9(s2 / nD))
    val d = df.select(col(x1Col).cast("double").as("x1"),
      col(x2Col).cast("double").as("x2"))
    val mad = d.agg(
      (dsum(abs(col("x1") - lit(m1)), 12) / lit(nD)).as("mad1"),
      (dsum(abs(col("x2") - lit(m2)), 12) / lit(nD)).as("mad2"))
    mad.select(
        explode(array(
          struct(lit(x1Col).as("feature"), lit(b1).as("__b"),
            col("mad1").as("__mad")),
          struct(lit(x2Col).as("feature"), lit(b2).as("__b"),
            col("mad2").as("__mad")))).as("f"),
        (abs(lit(b1)) * col("mad1") + abs(lit(b2)) * col("mad2"))
          .as("__tot"))
      .select(col("f.feature").as("feature"),
        round(col("f.__b"), 6).as("coef"),
        round(abs(col("f.__b")) * col("f.__mad"), 6).as("mean_abs_shap"),
        round(abs(col("f.__b")) * col("f.__mad") / col("__tot"), 6)
          .as("shap_share"))
      .orderBy(col("feature"))
  }

  /** Drop-column feature importance on the same closed-form surface:
    * R² of the full 2-feature OLS minus R² of each 1-feature refit
    * (the other column dropped and the model genuinely refit — the
    * honest variant permutation importance approximates). All three fits
    * come from the ONE moment row of [[ols2Moments]]; zero extra scans.
    */
  def dropColumnImportanceCard(df: DataFrame, x1Col: String, x2Col: String,
      yCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val m = ols2Moments(df, x1Col, x2Col, yCol).head()
    val nD = m.getLong(0).toDouble
    val (s1, s2, sy) = (m.getDouble(1), m.getDouble(2), m.getDouble(3))
    val (s11, s22, s12) = (m.getDouble(4), m.getDouble(5), m.getDouble(6))
    val (s1y, s2y, syy) = (m.getDouble(7), m.getDouble(8), m.getDouble(9))
    val c11 = s11 - s1 * s1 / nD
    val c22 = s22 - s2 * s2 / nD
    val c12 = s12 - s1 * s2 / nD
    val c1y = s1y - s1 * sy / nD
    val c2y = s2y - s2 * sy / nD
    val sst = syy - sy * sy / nD
    val det = c11 * c22 - c12 * c12
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val b1 = r9((c22 * c1y - c12 * c2y) / det)
    val b2 = r9((c11 * c2y - c12 * c1y) / det)
    val r2Full = (b1 * c1y + b2 * c2y) / sst
    val r2Only1 = (c1y / c11) * c1y / sst
    val r2Only2 = (c2y / c22) * c2y / sst
    def r6(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    Seq(
      (x1Col, r6(r2Full), r6(r2Only2), r6(r2Full - r2Only2)),
      (x2Col, r6(r2Full), r6(r2Only1), r6(r2Full - r2Only1)))
      .toDF("dropped_feature", "r2_full", "r2_without", "importance")
      .orderBy(col("dropped_feature"))
  }
}
