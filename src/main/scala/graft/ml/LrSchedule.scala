package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Stats.dsum

/** Learning-rate schedule replay — the one knob of the reference training
  * loop with no engine counterpart until now (reference `trainer.py:137-141`
  * builds `ReduceLROnPlateau(mode="min", patience=5, factor=0.5)` or
  * `CosineAnnealingLR(T_max=100)`, and `trainer.py:294` steps the plateau
  * scheduler on each epoch's validation loss).
  *
  * Two schedules, two portability postures:
  *   - PLATEAU is replayed IN the engine as a sequential fold
  *     ([[plateauReplay]]): the per-epoch state (lr, best, bad-epoch count)
  *     rides an `aggregate()` higher-order function over the
  *     array-collected epoch/loss history — pure comparisons and exact
  *     halvings, so a DuckDB recursive CTE replays it digit for digit.
  *     Torch semantics, `threshold_mode='rel'` (default): an epoch
  *     improves iff `loss < best * (1 - 1e-4)`; `patience` consecutive
  *     non-improvements decay lr by `factor` and reset the counter
  *     (torch's `eps=1e-8` no-op-update guard is irrelevant at these lr
  *     magnitudes and omitted).
  *   - COSINE is a closed-form function of the epoch index alone
  *     (`lr·(1+cos(πt/T_max))/2`) — model hyperparameters, not data — so
  *     its per-epoch values are round-12 literals shared verbatim with the
  *     oracle SQL (the q418–q421 weight-literal convention; cos is not in
  *     the proven cross-engine-portable function set).
  *
  * Scale shape: the history is ≤ [[maxEpochs]] aggregated rows by
  * construction (one per training epoch — bounded like any model
  * parameter), so the collect_list/fold runs on a frame that would be tiny
  * at any corpus size; the only data-sized work is the per-day loss
  * aggregation, one map-side-combined pass.
  */
object LrSchedule {
  val lr0: Double = 0.001
  val factor: Double = 0.5
  val patience: Int = 5
  val relThreshold: Double = 1.0e-4
  val tMax: Int = 100
  val maxEpochs: Int = 30

  /** Closed-form CosineAnnealingLR(T_max=100, eta_min=0) value at epoch t,
    * rounded to 12 — embedded as the SAME literal text in the Spark plan
    * and the oracle SQL ([[fmt]]).
    */
  def cosLr(t: Int): Double = {
    val v = lr0 * (1.0 + math.cos(math.Pi * t / tMax)) / 2.0
    new java.math.BigDecimal(v)
      .setScale(12, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Round-trip-exact literal text (shortest decimal repr — parses to the
    * identical double in Spark and DuckDB). */
  def fmt(d: Double): String =
    java.math.BigDecimal.valueOf(d).toPlainString

  /** Replay the plateau scheduler over an (epoch, loss) history frame.
    * The history collapses to ONE array-sorted column and the whole state
    * machine runs inside `aggregate()` — no driver loop, no UDF; every
    * step is comparisons, integer bumps, and an exact `* 0.5`.
    *
    * Output: one row per epoch — (epoch, val_loss, lr_plateau (lr AFTER
    * this epoch's step), bad_epochs (after reset), is_decay 0/1).
    */
  def plateauReplay(hist: DataFrame, epochCol: String,
      lossCol: String): DataFrame = {
    val outType =
      "array<struct<epoch:int,val_loss:double,lr_plateau:double," +
        "bad_epochs:int,is_decay:int>>"
    val init = struct(
      lit(lr0).as("lr"),
      lit(1.0e300).as("best"),
      lit(0).as("bad"),
      expr(s"CAST(array() AS $outType)").as("out"))
    def step(acc: Column, x: Column): Column = {
      val loss = x.getField("loss")
      // torch is_better (min / rel): loss < best * (1 - threshold)
      val better = loss < acc.getField("best") * lit(1.0 - relThreshold)
      val bad1 = when(better, lit(0)).otherwise(acc.getField("bad") + lit(1))
      val dec = bad1 > lit(patience)
      val lr1 = when(dec, acc.getField("lr") * lit(factor))
        .otherwise(acc.getField("lr"))
      val bad2 = when(dec, lit(0)).otherwise(bad1)
      val best1 = when(better, loss).otherwise(acc.getField("best"))
      struct(lr1.as("lr"), best1.as("best"), bad2.as("bad"),
        concat(acc.getField("out"), array(struct(
          x.getField("epoch").as("epoch"),
          loss.as("val_loss"),
          lr1.as("lr_plateau"),
          bad2.as("bad_epochs"),
          dec.cast("int").as("is_decay")))).as("out"))
    }
    hist
      .agg(array_sort(collect_list(struct(
        col(epochCol).cast("int").as("epoch"),
        col(lossCol).cast("double").as("loss")))).as("h"))
      .select(explode(aggregate(col("h"), init, step _,
        (acc: Column) => acc.getField("out"))).as("r"))
      .select(col("r.epoch").as("epoch"), col("r.val_loss").as("val_loss"),
        col("r.lr_plateau").as("lr_plateau"),
        col("r.bad_epochs").as("bad_epochs"),
        col("r.is_decay").as("is_decay"))
  }

  /** The q423 card: per-day validation-loss history from the events table
    * (epoch = day rank, loss = round-6 population variance of `value` that
    * day — a recorded noisy history, exactly what a plateau scheduler
    * consumes), plateau replay joined with the cosine-annealing literal
    * schedule.
    */
  def plateauCosineCard(events: DataFrame, tsCol: String,
      valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = events.sparkSession
    import spark.implicits._
    val v = col(valCol).cast("double")
    val daily = events
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(count(lit(1)).as("n"), dsum(v, 4).as("s"),
        dsum(v * v, 6).as("s2"))
    // day rank over the ≤O(100)-row aggregated frame (bounded, the
    // partition-less-window-on-aggregates convention)
    val hist = daily
      .withColumn("epoch",
        row_number().over(Window.orderBy(col("day"))).cast("int"))
      .filter(col("epoch") <= maxEpochs)
      .select(col("epoch"),
        round((col("s2") - col("s") * col("s") / col("n")) / col("n"), 6)
          .as("loss"))
    val cosine = (1 to maxEpochs).map(t => (t, cosLr(t)))
      .toDF("epoch", "lr_cosine")
    plateauReplay(hist, "epoch", "loss")
      .join(broadcast(cosine), Seq("epoch"))
      .orderBy(col("epoch"))
  }
}
