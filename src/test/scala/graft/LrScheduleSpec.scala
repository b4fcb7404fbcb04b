package graft

import graft.ml.LrSchedule

class LrScheduleSpec extends SparkSpec {
  import spark.implicits._

  private def replay(losses: Seq[Double]) =
    LrSchedule.plateauReplay(
      losses.zipWithIndex.map { case (l, i) => (i + 1, l) }
        .toDF("epoch", "loss"),
      "epoch", "loss")
      .orderBy("epoch")
      .select("epoch", "lr_plateau", "bad_epochs", "is_decay")
      .as[(Int, Double, Int, Int)].collect().toSeq

  test("plateau trigger fires exactly when val-loss stalls for patience+1 epochs") {
    // best settles at 9.0 on epoch 2; epochs 3..8 are six consecutive
    // non-improvements (rel threshold: 9.0 is NOT better than 9.0) →
    // first decay exactly at epoch 8, second at 14 after six more
    val r = replay(Seq(10.0, 9.0) ++ Seq.fill(12)(9.0))
    val decays = r.filter(_._4 == 1).map(_._1)
    assert(decays == Seq(8, 14), s"decay epochs $decays")
    assert(r.find(_._1 == 7).get._2 == 0.001)       // not yet
    assert(r.find(_._1 == 8).get._2 == 0.0005)      // halved at trigger
    assert(r.find(_._1 == 8).get._3 == 0)           // counter reset
    assert(r.find(_._1 == 14).get._2 == 0.00025)    // halved again
    // an improvement resets the counter without touching lr
    val r2 = replay(Seq(10.0, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0))
    assert(r2.forall(_._4 == 0) && r2.last._2 == 0.001)
    assert(r2.find(_._1 == 5).get._3 == 3 && r2.find(_._1 == 6).get._3 == 0)
  }

  test("torch rel-threshold semantics: equal-to-threshold is not better") {
    // is_better := loss < best * (1 - 1e-4); a loss exactly AT the
    // threshold (or a hair above) must count as a bad epoch
    val best = 10.0
    val atThreshold = best * (1.0 - 1.0e-4)
    val r = replay(Seq(best) ++ Seq.fill(6)(atThreshold))
    // epochs 2..7 all bad → decay at epoch 7
    assert(r.filter(_._4 == 1).map(_._1) == Seq(7))
    // while a loss clearly below the threshold resets
    val r3 = replay(Seq(best, best * (1.0 - 2.0e-4)))
    assert(r3.last._3 == 0 && r3.last._4 == 0)
  }

  test("cosine literals follow the CosineAnnealingLR closed form") {
    (1 to LrSchedule.maxEpochs).foreach { t =>
      val expect = LrSchedule.lr0 *
        (1.0 + math.cos(math.Pi * t / LrSchedule.tMax)) / 2.0
      assert(math.abs(LrSchedule.cosLr(t) - expect) < 5e-13)
    }
    // monotone non-increasing over the window and strictly below lr0
    val vals = (1 to LrSchedule.maxEpochs).map(LrSchedule.cosLr)
    assert(vals == vals.sorted.reverse)
    assert(vals.head < LrSchedule.lr0 && vals.last > 0.0)
  }

  test("plateauCosineCard: one row per epoch, joined cosine schedule") {
    val df = q(spark, "q423_lr_schedule")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= LrSchedule.maxEpochs)
    assert(rows.map(_.getAs[Int]("epoch")).toSeq ==
      (1 to rows.length))
    rows.foreach { r =>
      assert(r.getAs[Double]("lr_cosine") ==
        LrSchedule.cosLr(r.getAs[Int]("epoch")))
    }
  }

  private def q(spark: org.apache.spark.sql.SparkSession, name: String) =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
}
