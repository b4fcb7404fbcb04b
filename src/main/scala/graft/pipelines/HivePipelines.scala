package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Stats._
import graft.operators.{FuzzyJoins, SplitOps}

/** The reference's end-to-end dataset builders (§3.1/§3.2 of SURVEY.md) as
  * one declarative plan each — the user-facing API a
  * `hive-population-ml` user switches to.
  *
  * Reference shape (`/root/reference/src/data/preprocessing.py:142-200`):
  * for every population annotation, find the sensor hive whose ID suffix
  * matches, take its readings in a ±windowDays/2 interval around the
  * annotation date, and compute per-feature window statistics; keep windows
  * with ≥ minRows readings; label = frames_of_bees ≥ 20. The reference does
  * this as an O(annotations × sensor-rows) Python loop; here it is ONE
  * broadcast interval join + ONE hash aggregation regardless of annotation
  * count — the sensor table streams through once, which is what survives
  * 100 TB.
  */
object HivePipelines {

  /** The 22 sensor feature columns (`preprocessing.py:21-47`). */
  val sensorFeatures: Seq[String] =
    Seq("temperature", "humidity", "hive_power", "audio_density",
      "audio_density_ratio", "density_variation") ++ (1 to 16).map(i => s"hz_$i")

  private def windowStatExprs(features: Seq[String]): Seq[Column] =
    features.flatMap { f =>
      Seq(
        davg(col(f), 6).as(s"${f}_mean"),
        stdRounded(col(f)).as(s"${f}_std"),
        min(col(f)).as(s"${f}_min"),
        max(col(f)).as(s"${f}_max"),
        round(max(col(f)) - min(col(f)), 6).as(s"${f}_range"),
        // the reference emits higher moments only for n ≥ 4
        // (preprocessing.py:117)
        when(count(col(f)) >= 4, round(skewSample(col(f)), 6)).as(s"${f}_skew"),
        when(count(col(f)) >= 4, round(kurtSample(col(f)), 6)).as(s"${f}_kurt"),
        (dsum(col(s"__d_$f"), 6) / count(col(s"__d_$f"))).as(s"${f}_delta_mean"),
        // numpy population std, not the pandas sample std of the raw values
        stdPopRounded(col(s"__d_$f")).as(s"${f}_delta_std"))
    }

  /** Population feature matrix (reference `create_population_dataset`):
    * one row per (annotation, matched hive window) with
    * {mean,std,min,max,range,skew,kurt,delta_mean,delta_std} per feature,
    * count/coverage, and the binary population label (FoB ≥ 20,
    * `preprocessing.py:200`).
    */
  /** J1+J2 shared by the feature and sequence builders: each annotation
    * matches exactly ONE sensor hive. The reference takes the first suffix
    * match from set iteration (nondeterministic order,
    * preprocessing.py:168-174); the engine pins the choice to the minimum
    * matching sensor id — deterministic, and it prevents two
    * suffix-colliding physical hives from merging into one window. The
    * annotation side is broadcast; the sensor table streams through once.
    */
  private def matchedWindowJoin(sensor: DataFrame, population: DataFrame,
      windowDays: Int): DataFrame = {
    val half = windowDays / 2
    val s = sensor.withColumn("hive_key",
      FuzzyJoins.suffixKey(col("hive_id"), 10, 4))
    val hiveForKey = s.select(col("hive_id"), col("hive_key")).distinct()
      .groupBy(col("hive_key")).agg(min(col("hive_id")).as("matched_hive"))
    val p = population
      .withColumn("hive_key", FuzzyJoins.suffixKey(col("hive_id"), 10, 4))
      .select(col("hive_key"), col("hive_id").as("annot_hive_id"),
        col("date"), col("frames_of_bees"))
      .join(broadcast(hiveForKey), "hive_key")
    s.join(broadcast(p),
      s("hive_id") === p("matched_hive") &&
        col("timestamp") >= col("date") - expr(s"INTERVAL $half DAYS") &&
        col("timestamp") <= col("date") + expr(s"INTERVAL $half DAYS"))
      .drop(p("hive_key"))
  }

  def populationFeatures(sensor: DataFrame, population: DataFrame,
      features: Seq[String] = sensorFeatures, windowDays: Int = 7,
      minRows: Int = 10, minCoverage: Double = 0.3): DataFrame = {
    val joined = matchedWindowJoin(sensor, population, windowDays)
    // W2/A3: per-window lag deltas for every feature in one window pass
    val w = Window.partitionBy(col("annot_hive_id"), col("date"))
      .orderBy(col("timestamp"), col("hive_id"))
    val withDeltas = features.foldLeft(joined)((d, f) =>
      d.withColumn(s"__d_$f", col(f) - lag(col(f), 1).over(w)))
    // A1–A4 + P7 + F15
    withDeltas
      .groupBy(col("annot_hive_id").as("hive_id"), col("date"))
      .agg(
        count(lit(1)).as("n_samples"),
        (windowStatExprs(features) :+
          round(count(lit(1)) / lit(windowDays * 24.0 * 4), 6)
            .as("window_coverage") :+
          first(col("frames_of_bees")).as("frames_of_bees")): _*)
      .filter(col("n_samples") >= minRows &&
        col("window_coverage") >= minCoverage) // preprocessing.py:188
      .withColumn("population_class",
        when(col("frames_of_bees") >= 20, 1).otherwise(0))
  }

  /** Summer/phenotypic per-hive aggregate (reference
    * `create_phenotypic_dataset`, `preprocessing.py:278-358`): fixed-period
    * filter, per-hive basic stats, plus the diurnal daily range (A7) and
    * weekly-trend dispersion (A5) per feature — all features in one pass
    * per aggregation level (the reference recomputes per feature, 22×).
    */
  def summerAggregates(sensor: DataFrame, features: Seq[String] = sensorFeatures,
      start: String = "2020-05-01", end: String = "2020-10-01",
      minRows: Int = 100): DataFrame = {
    val summer = sensor.filter(
      col("timestamp") >= lit(start).cast("timestamp") &&
        col("timestamp") < lit(end).cast("timestamp"))
    val base = summer.groupBy(col("hive_id"))
      .agg(count(lit(1)).as("n_samples"),
        features.flatMap(f => Seq(
          davg(col(f), 6).as(s"${f}_mean"),
          stdRounded(col(f)).as(s"${f}_std"),
          min(col(f)).as(s"${f}_min"),
          max(col(f)).as(s"${f}_max"))): _*)
      .filter(col("n_samples") >= minRows)
    // A7: hourly means → daily range, every feature in one pass
    val hourly = summer.groupBy(col("hive_id"), hour(col("timestamp")).as("hr"))
      .agg(features.map(f => davg(col(f), 6).as(s"${f}_hm")).head,
        features.map(f => davg(col(f), 6).as(s"${f}_hm")).tail: _*)
    val diurnal = hourly.groupBy(col("hive_id"))
      .agg(features.map(f =>
          round(max(col(s"${f}_hm")) - min(col(s"${f}_hm")), 6)
            .as(s"${f}_daily_range")).head,
        features.map(f =>
          round(max(col(s"${f}_hm")) - min(col(s"${f}_hm")), 6)
            .as(s"${f}_daily_range")).tail: _*)
    // A5 multiscale: per-bucket means → dispersion across bucket means,
    // emitted only when >1 bucket exists (preprocessing.py:247-261)
    def bucketTrend(unit: String, tag: String): DataFrame = {
      val per = summer
        .groupBy(col("hive_id"), date_trunc(unit, col("timestamp")).as("bk"))
        .agg(features.map(f => davg(col(f), 6).as(s"${f}_bm")).head,
          features.map(f => davg(col(f), 6).as(s"${f}_bm")).tail: _*)
      per.groupBy(col("hive_id"))
        .agg(
          features.flatMap(f => Seq(
            stdRounded(col(s"${f}_bm")).as(s"${f}_${tag}_trend_std"),
            when(count(col(s"${f}_bm")) > 1,
              round(max(col(s"${f}_bm")) - min(col(s"${f}_bm")), 6))
              .as(s"${f}_${tag}_trend_range"))).head,
          features.flatMap(f => Seq(
            stdRounded(col(s"${f}_bm")).as(s"${f}_${tag}_trend_std"),
            when(count(col(s"${f}_bm")) > 1,
              round(max(col(s"${f}_bm")) - min(col(s"${f}_bm")), 6))
              .as(s"${f}_${tag}_trend_range"))).tail: _*)
    }
    // A6 early/late: halves at mid = len//2 in time order (the late half
    // gets the extra element), per-feature null-skipping means
    val w = Window.partitionBy(col("hive_id"))
      .orderBy(col("timestamp"))
    val wAll = Window.partitionBy(col("hive_id"))
    val halves = summer
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .withColumn("__half", when(col("__rn") <= expr("__n div 2"), 1).otherwise(2))
      .groupBy(col("hive_id"))
      .agg(
        features.flatMap(f => Seq(
          davg(when(col("__half") === 1, col(f)), 6).as(s"${f}_early_mean"),
          davg(when(col("__half") === 2, col(f)), 6).as(s"${f}_late_mean"))).head,
        features.flatMap(f => Seq(
          davg(when(col("__half") === 1, col(f)), 6).as(s"${f}_early_mean"),
          davg(when(col("__half") === 2, col(f)), 6).as(s"${f}_late_mean"))).tail: _*)
    val halvesWithChange = features.foldLeft(halves)((d, f) =>
      d.withColumn(s"${f}_trend_change",
        round(col(s"${f}_late_mean") - col(s"${f}_early_mean"), 6)))
    base.join(diurnal, Seq("hive_id"), "left")
      .join(bucketTrend("week", "weekly"), Seq("hive_id"), "left")
      .join(bucketTrend("month", "monthly"), Seq("hive_id"), "left")
      .join(halvesWithChange, Seq("hive_id"), "left")
  }

  /** Per-annotation sequence dataset (reference `SequenceDataset`,
    * `/root/reference/src/data/dataset.py:233-298`): the matched hive's
    * window readings as a time-ordered sequence of feature vectors —
    * NaN→0, stride-subsampled from the first element (`seq[::stride]`),
    * truncated to the most recent `maxLen`, front-padded with zero
    * vectors, plus the binary label. The deep models that consume this are
    * out of engine scope; the data surface is complete and typed
    * (`array<array<double>>`).
    */
  def windowSequences(sensor: DataFrame, population: DataFrame,
      features: Seq[String] = sensorFeatures, windowDays: Int = 7,
      stride: Int = 12, maxLen: Int = 168, minRows: Int = 10): DataFrame = {
    val joined = matchedWindowJoin(sensor, population, windowDays)
    val vec = array(features.map(f => coalesce(col(f), lit(0.0))): _*)
    val collected = joined
      // unlabeled annotations are dropped, not negatives (dataset.py:242-244)
      .filter(col("frames_of_bees").isNotNull)
      .groupBy(col("annot_hive_id").as("hive_id"), col("date"),
        col("frames_of_bees"))
      .agg(sort_array(collect_list(struct(col("timestamp").as("ts"),
        vec.as("v")))).as("s"))
      // min-support on the raw window (dataset.py:229-230)
      .filter(size(col("s")) >= minRows)
      .withColumn("vecs", transform(col("s"), x => x.getField("v")))
      // seq[::stride] — positions 0, stride, 2·stride, … — but only when
      // the sequence is longer than the stride (dataset.py:237)
      .withColumn("strided",
        when(lit(stride) > 1 && size(col("vecs")) > stride,
          filter(col("vecs"), (_, i) => i % stride === 0))
          .otherwise(col("vecs")))
    val zeroVec = array_repeat(lit(0.0), features.size)
    collected
      .withColumn("lastN",
        when(size(col("strided")) >= maxLen,
          slice(col("strided"), -maxLen, maxLen))
          .otherwise(col("strided")))
      .select(col("hive_id"), col("date"),
        concat(array_repeat(zeroVec, lit(maxLen) - size(col("lastN"))),
          col("lastN")).as("seq"),
        // unpadded variant: scaler fitting happens BEFORE padding in the
        // reference (dataset.py:269-278), so zero-pad steps must not
        // contaminate the feature moments
        col("lastN").as("seq_raw"),
        size(col("lastN")).cast("long").as("seq_len"),
        when(col("frames_of_bees") >= 20, 1).otherwise(0)
          .as("population_class"))
  }

  /** Sequence-scaler fit (reference A13: `np.vstack(all sequences)` then
    * per-feature mean/std — `dataset.py:269-275`): explode every sequence
    * step and aggregate, fully distributed. Returns one row per feature
    * index with (mean, std).
    */
  def sequenceScalerStats(sequences: DataFrame, seqCol: String): DataFrame =
    sequences
      .select(explode(col(seqCol)).as("step"))
      .select(posexplode(col("step")).as(Seq("feature_idx", "v")))
      .groupBy(col("feature_idx").cast("long").as("feature_idx"))
      // sklearn StandardScaler scale_ is population std (ddof=0)
      .agg(davg(col("v"), 6).as("mean"), stdPopRounded(col("v")).as("std"))

  /** Leakage-safe split tag (reference `split_by_hive`, M2). */
  def withHiveSplit(features: DataFrame): DataFrame =
    SplitOps.withSplit(features, "hive_id")

  /** Phenotypic derived averages (reference `loader.py:252-254`): row-wise
    * null-skipping means over measurement pairs (A8).
    */
  def withDerivedAverages(phenotypic: DataFrame): DataFrame =
    phenotypic
      .withColumn("varroa_avg", rowMean(col("varroa_may"), col("varroa_aug")))
      .withColumn("defensive_avg", rowMean(col("defensive_1"), col("defensive_2")))
      .withColumn("hygienic_avg", rowMean(col("hygienic_1"), col("hygienic_2")))

  /** Winter-mortality dataset (reference `load_winter_mortality` +
    * `create_winter_dataset`, `loader.py:259-295` /
    * `preprocessing.py:403-435`): survival defined BY nullness of the
    * mortality cause (F19), joined to pre-winter sensor aggregates.
    */
  def winterFeatures(sensor: DataFrame, winter: DataFrame,
      features: Seq[String] = sensorFeatures,
      start: String = "2020-09-01", end: String = "2020-11-14",
      minRows: Int = 100): DataFrame = {
    val agg = summerAggregates(sensor, features, start, end, minRows)
      .withColumn("hive_key", FuzzyJoins.suffixKey(col("hive_id"), 10, 4))
    val w = winter
      .withColumn("survived", col("mortality_cause").isNull)
      .withColumn("hive_key", FuzzyJoins.suffixKey(col("hive_id"), 10, 4))
      .drop("hive_id")
    agg.join(broadcast(w), "hive_key").drop("hive_key")
  }
}
