package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.StandardScaler
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame
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
      labelCol: String, hidden: Seq[Int]): DataFrame = {
    import org.apache.spark.ml.classification.MultilayerPerceptronClassifier
    val data = SplitOps.withSplit(embeddings, idCol)
      .withColumn("features", array_to_vector(col(vecCol)))
      .withColumn("label", col(labelCol).cast("double"))
      .coalesce(2)
    val train = data.filter(col("split") === "train").cache()
    val test = data.filter(col("split") === "test")
    train.count()
    val dim = train.select(col(vecCol)).head.getSeq[Float](0).size
    // output layer sized by max label over the FULL frame — distinct-count
    // over train alone breaks for non-contiguous labels or classes the
    // split left out of train (MLP requires labels in [0, numClasses))
    val nClasses = data.agg(max(col("label"))).head.getDouble(0).toInt + 1
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
      featureCols: Seq[String], labelCol: String): DataFrame = {
    val data = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features_raw")
      .transform(SplitOps.withSplit(features, idCol))
      .withColumn("label", col(labelCol).cast("double"))
      .coalesce(2)
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

  /** K-fold out-of-fold linear regression: per fold, train on the other
    * folds and score the held-out fold (the reference's
    * `cross_val_predict`). Returns per-fold RMSE/R² rows.
    */
  def kfoldOOFLinReg(df: DataFrame, idCol: String, featureCols: Seq[String],
      labelCol: String, k: Int): DataFrame = {
    // OOF CV input is small by construction (the reference's datasets are
    // tens-to-thousands of rows); one partition removes per-iteration
    // scheduling overhead from the k sequential fits.
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withFold(df, idCol, k))
      .withColumn("label", col(labelCol).cast("double"))
      .coalesce(1).cache()
    assembled.count()
    // independent fold fits run as concurrent jobs on the shared session
    val folds = (0 until k).par.map { f =>
      val model = new LinearRegression().setMaxIter(50).setRegParam(0.0)
        .fit(assembled.filter(col("fold") =!= f))
      model.transform(assembled.filter(col("fold") === f))
        .select(lit(f).as("fold"), col("label"), col("prediction"))
    }.toList
    val oof = folds.reduce(_.unionByName(_))
    val out = oof.groupBy(col("fold")).agg(
      count(lit(1)).as("n"),
      round(sqrt(avg(pow(col("label") - col("prediction"), 2))), 4).as("rmse"))
    val materialized = out.cache()
    materialized.count()
    assembled.unpersist()
    materialized
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
      featureCols: Seq[String], labelCol: String): DataFrame = {
    import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
    // ensemble training data is id-bounded small; a few partitions keep
    // tree building parallel while avoiding 32-task scheduling per
    // boosting iteration
    val data = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(SplitOps.withSplit(df, idCol))
      .withColumn("label", col(labelCol).cast("double"))
      .coalesce(2)
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
}
