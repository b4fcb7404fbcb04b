package graft

import org.apache.spark.sql.functions._

import graft.ml.SeqForward

class SeqForwardSpec extends SparkSpec {
  import spark.implicits._

  private def r9(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
  private def r6(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  // one user, 8 strictly-ordered events with known values
  private lazy val fixture = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (1 to 10).map { i =>
      (7L, new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong,
        i * 50.0)
    }.toDF("user_id", "ts", "event_id", "value")
  }

  test("sequencePivot ranks by (ts, event_id), keeps full windows only") {
    val p = SeqForward.sequencePivot(fixture, "user_id", "ts", "event_id",
      "value").collect()
    assert(p.length == 1)
    val row = p.head
    (1 to SeqForward.T).foreach { t =>
      assert(row.getDouble(t) == r9(t * 50.0 / 500.0))
    }
    // a user with fewer than T events is dropped, not padded
    val short = SeqForward.sequencePivot(
      fixture.filter(col("event_id") <= 5), "user_id", "ts", "event_id",
      "value")
    assert(short.count() == 0)
  }

  test("lstmForward matches a plain-Scala replay of the recurrence") {
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    var h = Array(0.0, 0.0)
    var c = Array(0.0, 0.0)
    xs.foreach { x =>
      def gate(g: Int, u: Int): Double =
        SeqForward.lstmParam(g, u, 0) * x +
          SeqForward.lstmParam(g, u, 1) * h(0) +
          SeqForward.lstmParam(g, u, 2) * h(1) +
          SeqForward.lstmParam(g, u, 3)
      val cNew = (0 until SeqForward.H).map(u =>
        r9(sig(gate(1, u)) * c(u) + sig(gate(0, u)) * th(gate(3, u))))
      val hNew = (0 until SeqForward.H).map(u =>
        r9(sig(gate(2, u)) * th(cNew(u))))
      c = cNew.toArray
      h = hNew.toArray
    }
    val row = SeqForward.lstmForward(fixture, "user_id", "ts", "event_id",
      "value").collect().head
    assert(row.getDouble(1) == r6(h(0)), s"h1 ${row.getDouble(1)} vs ${r6(h(0))}")
    assert(row.getDouble(2) == r6(h(1)))
    assert(row.getDouble(3) == r6(c(0)))
    assert(row.getDouble(4) == r6(c(1)))
    // states live strictly inside the squashing ranges
    assert(math.abs(row.getDouble(1)) < 1.0 && math.abs(row.getDouble(2)) < 1.0)
  }

  test("attentionForward: constant sequence gives uniform weights (entropy ln T) and out = v") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val const = (1 to 8).map { i =>
      (9L, new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong, 250.0)
    }.toDF("user_id", "ts", "event_id", "value")
    val row = SeqForward.attentionForward(const, "user_id", "ts",
      "event_id", "value").collect().head
    val x = r9(250.0 / 500.0)
    val v = r9(SeqForward.attnParam(4) * x + SeqForward.attnParam(5))
    assert(approx(row.getDouble(1), v, 1e-6), s"out ${row.getDouble(1)} vs $v")
    assert(approx(row.getDouble(2), math.log(SeqForward.T.toDouble), 1e-6))
  }

  test("attentionForward entropy drops below ln T on a varying sequence") {
    val row = SeqForward.attentionForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getDouble(2) < math.log(SeqForward.T.toDouble))
    assert(row.getDouble(2) > 0.0)
  }

  test("rnnRtrlTrain descends: MSE non-increasing, gradients shrink") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tr = SeqForward.rnnRtrlTrain(events, "user_id", "ts", "event_id",
      "value").collect()
    assert(tr.length == SeqForward.rnnIters)
    val mses = tr.map(_.getDouble(7)).toSeq
    assert(mses == mses.sorted.reverse, s"MSE not non-increasing: $mses")
    assert(mses.last < mses.head / 2.0,
      s"training did not actually learn: $mses")
    def gnorm(r: org.apache.spark.sql.Row) =
      math.abs(r.getDouble(4)) + math.abs(r.getDouble(5)) +
        math.abs(r.getDouble(6))
    assert(gnorm(tr.last) < gnorm(tr.head))
  }

  test("RTRL sensitivities are true derivatives (finite differences)") {
    // plain-Scala forward pass + RTRL on one sequence; compare the
    // carried sensitivity against a central finite difference in wx/wh/b
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    def forward(wx: Double, wh: Double, b: Double,
        rounded: Boolean): Double = {
      var h = 0.0
      xs.foreach { x =>
        val z = wx * x + wh * h + b
        val t = (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
        h = if (rounded) r9(t) else t
      }
      h
    }
    def rtrl(wx: Double, wh: Double, b: Double): (Double, Double, Double) = {
      var h = 0.0; var sx = 0.0; var sh = 0.0; var sb = 0.0
      xs.foreach { x =>
        val hPrev = h
        val z = wx * x + wh * h + b
        h = (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
        val damp = 1.0 - h * h
        val nsx = damp * (x + wh * sx)
        val nsh = damp * (hPrev + wh * sh)
        val nsb = damp * (1.0 + wh * sb)
        sx = nsx; sh = nsh; sb = nsb
      }
      (sx, sh, sb)
    }
    val (wx, wh, b) =
      (SeqForward.rnnInit(0), SeqForward.rnnInit(1), SeqForward.rnnInit(2))
    val (sx, sh, sb) = rtrl(wx, wh, b)
    val eps = 1e-6
    def fd(f: Double => Double): Double =
      (f(eps) - f(-eps)) / (2.0 * eps)
    assert(approx(sx, fd(e => forward(wx + e, wh, b, rounded = false)), 1e-4))
    assert(approx(sh, fd(e => forward(wx, wh + e, b, rounded = false)), 1e-4))
    assert(approx(sb, fd(e => forward(wx, wh, b + e, rounded = false)), 1e-4))
  }

  test("forward passes carry no global window and no join") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq(
        SeqForward.lstmForward(fixture, "user_id", "ts", "event_id", "value"),
        SeqForward.attentionForward(fixture, "user_id", "ts", "event_id",
          "value")).foreach { df =>
        val p = df.queryExecution.executedPlan
        p.foreach {
          case w: WindowExec =>
            assert(w.partitionSpec.nonEmpty, s"global window in:\n$p")
          case _ =>
        }
        assert(!p.toString.contains("Join"), "forward pass must be join-free")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
