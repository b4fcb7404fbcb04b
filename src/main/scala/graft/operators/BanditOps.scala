package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic bandit-replay operators: what WOULD an adaptive
  * allocation policy have done on the logged daily rewards? Off-policy
  * replay over a fixed reward matrix — the standard sanity check before
  * anyone runs a live adaptive experiment, and the natural next step
  * after the static A/B battery (q121 z-test, q178 CUPED, q218
  * rerandomization): those judge ONE split; the replay judges a whole
  * allocation POLICY, including its exploration cost.
  */
object BanditOps {

  /** UCB1 replay (Auer, Cesa-Bianchi & Fischer 2002) over the daily
    * (arm = `armCol` value, reward = that arm's mean `valCol` that day,
    * max-normalized to [0,1]) matrix: the first K steps play each arm
    * once in name order, then every day plays
    * argmax_k (mean_k + √(2·ln t / n_k)) with ties to the first arm —
    * entirely deterministic, so the full trajectory (pulls, rewards,
    * regret vs the hindsight-best fixed arm) is engine-portable and
    * hash-checked.
    *
    * The card answers the pre-launch question "how much would adaptive
    * allocation have cost/saved versus the best fixed choice": a
    * shrinking per-step regret says UCB locked on; a flat one says the
    * arms are too close for adaptivity to pay.
    *
    * Portability: day×arm rewards are round-9 means of exact decimal
    * sums (missing cells are exact zeros); the driver replays the
    * recurrence in step order with one fixed double shape per update —
    * the oracle's recursive CTE carries the identical 2K-column state.
    * `arms` must list the arm domain explicitly (the oracle hardcodes
    * the same list): a data-dependent arm set would make the wide
    * state frame data-dependent too.
    *
    * Scale shape: one (day, arm) aggregation; the replay runs on the
    * DRIVER over the bounded day spine ([[graft.operators.TimeSeriesOps]]
    * grid contract, enforced ≤ `maxSteps`).
    */
  def ucbReplay(df: DataFrame, tsCol: String, armCol: String,
      valCol: String, arms: Seq[String],
      maxSteps: Long = 5000L): DataFrame = {
    require(arms.nonEmpty && arms == arms.sorted && arms.distinct == arms,
      "arms must be a sorted, distinct, explicit domain")
    val spark = df.sparkSession
    import spark.implicits._
    def r9(v: Double): Double =
      new java.math.BigDecimal(v)
        .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    val k = arms.length
    val cells = df
      .filter(col(armCol).isin(arms: _*) && col(valCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"), col(armCol).as("arm"))
      .agg((graft.functions.Stats.dsum(col(valCol).cast("double"), 12) /
        count(lit(1))).as("m"))
    val spine = cells.agg(min(col("day")).as("__lo"),
        max(col("day")).as("__hi"))
      .select(col("__lo"),
        explode(sequence(col("__lo"), col("__hi"))).as("day"))
      .select(datediff(col("day"), col("__lo")).cast("long").as("t0"),
        col("day"))
    val mx = cells.agg(max(col("m")).as("__mx"))
    val grid = spine.crossJoin(broadcast(mx))
      .join(cells, Seq("day"), "left")
      .select(col("t0"), coalesce(col("arm"), lit(arms.head)).as("arm"),
        round(coalesce(col("m"), lit(0.0)) / col("__mx"), 9).as("r"))
    val rows = grid.collect()
    require(rows.nonEmpty,
      "ucbReplay needs at least one event day for the listed arms")
    val nDays = rows.map(_.getLong(0)).max + 1
    require(nDays >= k && nDays <= maxSteps,
      s"need between $k and $maxSteps days, got $nDays")
    val rw = Array.fill(nDays.toInt, k)(0.0)
    rows.foreach { r =>
      val ai = arms.indexOf(r.getString(1))
      if (ai >= 0) rw(r.getLong(0).toInt)(ai) = r.getDouble(2)
    }
    val n = Array.fill(k)(0L)
    val s = Array.fill(k)(0.0)
    var cum = 0.0
    val bestArm = {
      val totals = (0 until k).map(a => rw.map(_(a)).sum)
      // first index attaining the max total (the oracle's tie rule)
      totals.indexOf(totals.max)
    }
    var bestCum = 0.0
    val trace = (1 to nDays.toInt).map { t =>
      val chosen =
        if (t <= k) t - 1
        else {
          val tD = t.toDouble
          val us = (0 until k).map(a =>
            s(a) / n(a).toDouble +
              math.sqrt(2.0 * math.log(tD) / n(a).toDouble))
          // first arm whose UCB is >= every later arm's
          us.indices.find(a => (a + 1 until k).forall(b =>
            us(a) >= us(b))).getOrElse(k - 1)
        }
      val r = rw(t - 1)(chosen)
      n(chosen) += 1
      s(chosen) += r
      cum += r
      bestCum += rw(t - 1)(bestArm)
      (t.toLong, arms(chosen), r, cum, bestCum - cum)
    }
    trace.toDF("t", "chosen_arm", "__r", "__cum", "__regret")
      .select(col("t"), col("chosen_arm"),
        round(col("__r"), 6).as("reward"),
        round(col("__cum"), 6).as("cum_reward"),
        round(col("__regret"), 6).as("cum_regret"))
      .orderBy(col("t"))
  }
}
