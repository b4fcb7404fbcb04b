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

  test("adamwStep: bias correction exactly undoes the t=1 moment damping") {
    // at t=1 with zero moments, m' = (1-b1)*g and the correction divides
    // by exactly (1-b1^1) — so mhat must equal the raw round-9 gradient
    // (same for vhat and g^2); without bias correction mhat would be 0.1*g
    val g = 0.237
    val (_, m1, v1, mHat, vHat) = SeqForward.adamwStep(0.4, g, 0.0, 0.0, 1)
    assert(m1 == r9((1.0 - SeqForward.adamBeta1) * g))
    assert(mHat == r9(g), s"t=1 mhat $mHat must equal g $g")
    assert(v1 == r9((1.0 - SeqForward.adamBeta2) * g * g))
    assert(vHat == r9(r9((1.0 - SeqForward.adamBeta2) * g * g) /
      SeqForward.adamBc2(1)))
    // and the denominators really are 1 - beta^t, t flowing
    assert(SeqForward.adamBc1(3) == 1.0 - 0.9 * 0.9 * 0.9)
    assert(SeqForward.adamBc2(2) == 1.0 - 0.999 * 0.999)
  }

  test("adamwStep: true decimal ties resolve HALF_UP on the exact value") {
    // the sf0.01 regression: g = 0.080679525 makes 0.1*g an EXACT
    // 10-decimal tie (0.0080679525) whose nearest double sits BELOW it —
    // a double-side round gives ...952 (Java) or ...953 (DuckDB's scaled
    // ROUND) depending on the engine. The exact-decimal chain must give
    // the true HALF_UP answer, ...953, everywhere.
    val (_, m1, _, _, _) = SeqForward.adamwStep(0.4, 0.080679525, 0.0,
      0.0, 1)
    assert(m1 == 0.008067953,
      s"tie resolved $m1 — the m chain is not exact-decimal")
    // and the naive double round really does disagree (the trap exists):
    // (1.0 - 0.9) is the double 0.09999999999999998, so the double
    // product sits BELOW the exact tie and Java's exact-expansion
    // HALF_UP goes down while DuckDB's scaled ROUND goes up
    val naive = new java.math.BigDecimal((1.0 - 0.9) * 0.080679525)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()
    assert(naive == 0.008067952, "trap vanished — revisit this spec")
  }

  test("adamwStep: decay applies to weights, never to the gradient moments") {
    // zero gradient, zero moments -> the update is PURE decoupled decay:
    // theta * (1 - lr*wd), no gradient-coupled term
    val theta = 0.8
    val (tN, m, v, _, _) = SeqForward.adamwStep(theta, 0.0, 0.0, 0.0, 4)
    assert(m == 0.0 && v == 0.0)
    assert(tN == r9(theta * (1.0 - SeqForward.adamLr * SeqForward.adamWd)))
    // the moments are a function of the gradient ONLY — coupled (Adam-
    // style) decay would fold wd*theta into g and make them theta-
    // dependent; decoupled AdamW must not
    val (_, mA, vA, _, _) = SeqForward.adamwStep(5.0, 0.3, 0.1, 0.02, 2)
    val (_, mB, vB, _, _) = SeqForward.adamwStep(-7.0, 0.3, 0.1, 0.02, 2)
    assert(mA == mB && vA == vB,
      "moment estimates must not depend on the weight being decayed")
  }

  test("rnnAdamwTrain descends and shares q420's gradient machinery") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tr = SeqForward.rnnAdamwTrain(events, "user_id", "ts", "event_id",
      "value").collect()
    assert(tr.length == SeqForward.rnnIters)
    val mses = tr.map(_.getAs[Double]("mse")).toSeq
    assert(mses.last < mses.head, s"AdamW did not learn: $mses")
    // iteration 1 starts from the same init and the same full-batch RTRL
    // gradients as q420 (shared rnnGradPass body) — first-row params and
    // gradients must be IDENTICAL across the two optimizers
    val sgd = SeqForward.rnnRtrlTrain(events, "user_id", "ts", "event_id",
      "value").collect()
    Seq("wx", "wh", "b", "grad_wx", "grad_wh", "grad_b", "mse").foreach {
      c => assert(tr.head.getAs[Double](c) == sgd.head.getAs[Double](c),
        s"iter-1 $c diverged between SGD and AdamW") }
    // from iteration 2 on the trajectories diverge (different update rule)
    assert(tr(1).getAs[Double]("wx") != sgd(1).getAs[Double]("wx"))
    // replay the driver fold with the pure step function
    var (wx, m, v) = (SeqForward.rnnInit(0), 0.0, 0.0)
    tr.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("wx") == wx, s"iter ${i + 1} wx drifted")
      val st = SeqForward.adamwStep(wx, r.getAs[Double]("grad_wx"), m, v,
        i + 1)
      wx = st._1; m = st._2; v = st._3
      assert(r.getAs[Double]("m_wx") == m && r.getAs[Double]("v_wx") == v)
    }
  }

  test("lstmRtrlTrain descends: monotone MSE, 10x drop, forget-bias init") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tr = SeqForward.lstmRtrlTrain(events, "user_id", "ts", "event_id",
      "value").collect()
    assert(tr.length == SeqForward.lstmTrainIters)
    val mses = tr.map(_.getAs[Double]("mse")).toSeq
    assert(mses == mses.sorted.reverse, s"MSE not non-increasing: $mses")
    assert(mses.last < mses.head / 2.0,
      s"training did not actually learn: $mses")
    // iteration 1 carries the pinned biases (forget 1.0, candidate 1.0)
    assert(tr.head.getAs[Double]("bf") == 1.0)
    assert(tr.head.getAs[Double]("bg") == 1.0)
  }

  test("LSTM RTRL sensitivities are true derivatives for all 12 parameters") {
    // plain-Scala LSTM forward + RTRL on one sequence; the carried
    // ∂h_T/∂θ must match a central finite difference in EVERY θ
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    def forward(p: Seq[Double]): Double = {
      var h = 0.0; var c = 0.0
      xs.foreach { x =>
        val a = (0 until 4).map(g => p(3 * g) * x + p(3 * g + 1) * h +
          p(3 * g + 2))
        val (gi, gf, go, gg) = (sig(a(0)), sig(a(1)), sig(a(2)), th(a(3)))
        c = gf * c + gi * gg
        h = go * th(c)
      }
      h
    }
    def rtrl(p: Seq[Double]): Seq[Double] = {
      var h = 0.0; var c = 0.0
      var sc = Array.fill(12)(0.0); var sh = Array.fill(12)(0.0)
      xs.foreach { x =>
        val a = (0 until 4).map(g => p(3 * g) * x + p(3 * g + 1) * h +
          p(3 * g + 2))
        val (gi, gf, go, gg) = (sig(a(0)), sig(a(1)), sig(a(2)), th(a(3)))
        val (hprev, cprev) = (h, c)
        def dg(g: Int, i: Int): Double = {
          var ch = p(3 * g + 1) * sh(i)
          if (i / 3 == g) ch += Seq(x, hprev, 1.0)(i % 3)
          val damp = g match {
            case 0 => gi * (1 - gi); case 1 => gf * (1 - gf)
            case 2 => go * (1 - go); case 3 => 1 - gg * gg
          }
          damp * ch
        }
        c = gf * cprev + gi * gg
        val scn = (0 until 12).map(i =>
          gf * sc(i) + cprev * dg(1, i) + gg * dg(0, i) + gi * dg(3, i))
        val tc = th(c)
        h = go * tc
        val shn = (0 until 12).map(i =>
          go * (1 - tc * tc) * scn(i) + tc * dg(2, i))
        sc = scn.toArray; sh = shn.toArray
      }
      sh.toSeq
    }
    val p0 = (0 until 12).map(SeqForward.lstmTrainInit)
    val sens = rtrl(p0)
    val eps = 1e-6
    (0 until 12).foreach { i =>
      val fd = (forward(p0.updated(i, p0(i) + eps)) -
        forward(p0.updated(i, p0(i) - eps))) / (2.0 * eps)
      assert(approx(sens(i), fd, 1e-4),
        s"param $i: RTRL ${sens(i)} vs FD $fd")
    }
  }

  test("transformerBlockForward matches a plain-Scala replay of the block") {
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    val p = (0 to 40).map(SeqForward.blockParam)
    def emb(t: Int, d: Int): Double = {
      val pe = if (d == 0) SeqForward.posEnc(t)._1 else SeqForward.posEnc(t)._2
      r9(p(2 * d) * xs(t - 1) + p(2 * d + 1) + pe)
    }
    def proj(off: Int, e: (Double, Double), dd: Int): Double =
      r9(p(off + 2 * dd) * e._1 + p(off + 2 * dd + 1) * e._2 + p(off + 4 + dd))
    val eT = (emb(SeqForward.T, 0), emb(SeqForward.T, 1))
    val q = (proj(4, eT, 0), proj(4, eT, 1))
    val es = (1 to SeqForward.T).map(j => (emb(j, 0), emb(j, 1)))
    val ks = es.map(e => (proj(10, e, 0), proj(10, e, 1)))
    val vs = es.map(e => (proj(16, e, 0), proj(16, e, 1)))
    val ss = ks.map(k => (q._1 * k._1 + q._2 * k._2) * 0.707106781)
    val m = ss.max
    val ws = ss.map(s => math.exp(s - m))
    val z = ws.reduce(_ + _)
    val r1 = eT._1 + ws.zip(vs).map { case (w, v) => w * v._1 }.sum / z
    val r2 = eT._2 + ws.zip(vs).map { case (w, v) => w * v._2 }.sum / z
    val mu = (r1 + r2) / 2.0
    val va = ((r1 - mu) * (r1 - mu) + (r2 - mu) * (r2 - mu)) / 2.0
    val ln1 = r9((r1 - mu) / math.sqrt(va + 1e-6))
    val ln2 = r9((r2 - mu) / math.sqrt(va + 1e-6))
    val hd1 = math.max(0.0, r9(p(22) * ln1 + p(23) * ln2 + p(26)))
    val hd2 = math.max(0.0, r9(p(24) * ln1 + p(25) * ln2 + p(27)))
    val out1 = r6(ln1 + r9(p(28) * hd1 + p(29) * hd2 + p(32)))
    val out2 = r6(ln2 + r9(p(30) * hd1 + p(31) * hd2 + p(33)))
    val row = SeqForward.transformerBlockForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getDouble(1) == out1, s"out1 ${row.getDouble(1)} vs $out1")
    assert(row.getDouble(2) == out2, s"out2 ${row.getDouble(2)} vs $out2")
    // 2-dim LayerNorm invariant: the two normalized dims are exact
    // mirror images (r1 − μ = −(r2 − μ) when d = 2)
    assert(approx(row.getDouble(3), -row.getDouble(4), 1e-6))
  }

  test("multiHeadBlockForward: plain-Scala replay, heads provably independent") {
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    val p = (0 to 39).map(SeqForward.mhParam)
    def emb(t: Int, d: Int): Double = {
      val pe = if (d == 0) SeqForward.posEnc(t)._1 else SeqForward.posEnc(t)._2
      r9(p(2 * d) * xs(t - 1) + p(2 * d + 1) + pe)
    }
    def proj(off: Int, e: (Double, Double), dd: Int): Double =
      r9(p(off + 2 * dd) * e._1 + p(off + 2 * dd + 1) * e._2 + p(off + 4 + dd))
    val eT = (emb(SeqForward.T, 0), emb(SeqForward.T, 1))
    val es = (1 to SeqForward.T).map(j => (emb(j, 0), emb(j, 1)))
    // head replay takes ONLY that head's q scalar and k/v scalars — its
    // argument list cannot see the other head's parameter slice, so
    // equality with the engine's head output IS the independence proof
    def headOut(qh: Double, khs: Seq[Double], vhs: Seq[Double]): Double = {
      val ss = khs.map(k => qh * k) // head_dim = 1 → scale 1
      val m = ss.max
      val ws = ss.map(s => math.exp(s - m))
      r9(ws.zip(vhs).map { case (w, v) => w * v }.sum / ws.sum)
    }
    val o1 = headOut(proj(4, eT, 0),
      es.map(e => proj(10, e, 0)), es.map(e => proj(16, e, 0)))
    val o2 = headOut(proj(4, eT, 1),
      es.map(e => proj(10, e, 1)), es.map(e => proj(16, e, 1)))
    // concat → W_O + residual → LayerNorm → FFN + residual
    val r1 = eT._1 + r9(p(22) * o1 + p(23) * o2 + p(26))
    val r2 = eT._2 + r9(p(24) * o1 + p(25) * o2 + p(27))
    val mu = (r1 + r2) / 2.0
    val va = ((r1 - mu) * (r1 - mu) + (r2 - mu) * (r2 - mu)) / 2.0
    val ln1 = r9((r1 - mu) / math.sqrt(va + 1e-6))
    val ln2 = r9((r2 - mu) / math.sqrt(va + 1e-6))
    val hd1 = math.max(0.0, r9(p(28) * ln1 + p(29) * ln2 + p(32)))
    val hd2 = math.max(0.0, r9(p(30) * ln1 + p(31) * ln2 + p(33)))
    val out1 = r6(ln1 + r9(p(34) * hd1 + p(35) * hd2 + p(38)))
    val out2 = r6(ln2 + r9(p(36) * hd1 + p(37) * hd2 + p(39)))
    val row = SeqForward.multiHeadBlockForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getDouble(1) == out1, s"out1 ${row.getDouble(1)} vs $out1")
    assert(row.getDouble(2) == out2, s"out2 ${row.getDouble(2)} vs $out2")
    assert(row.getDouble(3) == r6(o1), s"head1 ${row.getDouble(3)} vs $o1")
    assert(row.getDouble(4) == r6(o2), s"head2 ${row.getDouble(4)} vs $o2")
    // the heads see different parameter slices, so on this fixture their
    // outputs must actually differ (a degenerate shared-head block would
    // collapse them)
    assert(row.getDouble(3) != row.getDouble(4))
  }

  // plain-Scala replay of the q418 LSTM hidden trajectory on `fixture`
  private def lstmHiddenTrajectory: Seq[(Double, Double)] = {
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    var h = Array(0.0, 0.0); var c = Array(0.0, 0.0)
    xs.map { x =>
      def gate(g: Int, u: Int): Double =
        SeqForward.lstmParam(g, u, 0) * x +
          SeqForward.lstmParam(g, u, 1) * h(0) +
          SeqForward.lstmParam(g, u, 2) * h(1) +
          SeqForward.lstmParam(g, u, 3)
      val cNew = (0 until SeqForward.H).map(u =>
        r9(sig(gate(1, u)) * c(u) + sig(gate(0, u)) * th(gate(3, u))))
      val hNew = (0 until SeqForward.H).map(u =>
        r9(sig(gate(2, u)) * th(cNew(u))))
      c = cNew.toArray; h = hNew.toArray
      (h(0), h(1))
    }
  }

  test("attentionPoolingForward: uniform scores reduce to the plain mean") {
    // w2 = 0 kills the score MLP's input dependence -> every position
    // scores b2 -> softmax is exactly uniform -> pooled = mean of h_t
    val hs = lstmHiddenTrajectory
    val row = SeqForward.attentionPoolingForward(fixture, "user_id", "ts",
      "event_id", "value",
      scoreParams = Seq(0.3, -0.2, 0.1, 0.0, 0.7)).collect().head
    val n = SeqForward.T.toDouble
    assert(row.getAs[Double]("pooled1") == r6(hs.map(_._1).sum / n))
    assert(row.getAs[Double]("pooled2") == r6(hs.map(_._2).sum / n))
    (1 to SeqForward.T).foreach { t =>
      assert(row.getAs[Double](s"w$t") == r6(1.0 / n),
        s"weight w$t not uniform") }
  }

  test("attentionPoolingForward: a planted peak dominates the pooling") {
    // s_t = 1000·tanh(h1_t): the position with the max first-unit state
    // takes essentially all the softmax mass
    val hs = lstmHiddenTrajectory
    val best = hs.map(_._1).zipWithIndex.maxBy(_._1)._2 + 1
    val row = SeqForward.attentionPoolingForward(fixture, "user_id", "ts",
      "event_id", "value",
      scoreParams = Seq(1.0, 0.0, 0.0, 1000.0, 0.0)).collect().head
    assert(row.getAs[Double](s"w$best") > 0.99,
      s"planted peak at $best did not dominate")
    assert(math.abs(row.getAs[Double]("pooled1") - hs(best - 1)._1) < 1e-4)
  }

  test("attentionPoolingForward matches a plain-Scala replay (default params)") {
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val hs = lstmHiddenTrajectory
    val p = (0 until 5).map(SeqForward.poolParam)
    val us = hs.map { case (h1, h2) => r9(p(0) * h1 + p(1) * h2 + p(2)) }
    val ss = us.map(u => r9(p(3) * th(u) + p(4)))
    val m = ss.max
    val es = ss.map(s => math.exp(s - m))
    val z = es.sum
    val row = SeqForward.attentionPoolingForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Double]("pooled1") ==
      r6(es.zip(hs).map { case (e, h) => e * h._1 }.sum / z))
    assert(row.getAs[Double]("pooled2") ==
      r6(es.zip(hs).map { case (e, h) => e * h._2 }.sum / z))
    (1 to SeqForward.T).foreach { t =>
      assert(row.getAs[Double](s"w$t") == r6(es(t - 1) / z)) }
  }

  test("bidiLstmForward: backward over the reversed sequence equals forward") {
    // share the forward weights across directions: the backward pass
    // processes positions T..1, so on a TIME-REVERSED fixture it sees the
    // original order and must reproduce the forward states exactly
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val rev = (1 to 8).map { i =>
      (7L, new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong,
        (9 - i) * 50.0) // values reversed in time
    }.toDF("user_id", "ts", "event_id", "value")
    val orig = fixture.filter(col("event_id") <= 8)
    val fwd = SeqForward.bidiLstmForward(orig, "user_id", "ts",
      "event_id", "value",
      revParam = SeqForward.lstmParam).collect().head
    val bwd = SeqForward.bidiLstmForward(rev, "user_id", "ts",
      "event_id", "value",
      revParam = SeqForward.lstmParam).collect().head
    assert(bwd.getAs[Double]("hb1") == fwd.getAs[Double]("hf1"))
    assert(bwd.getAs[Double]("hb2") == fwd.getAs[Double]("hf2"))
    // and symmetrically: forward on the reversed fixture = backward on
    // the original
    assert(bwd.getAs[Double]("hf1") == fwd.getAs[Double]("hb1"))
    assert(bwd.getAs[Double]("hf2") == fwd.getAs[Double]("hb2"))
  }

  test("bidiLstmForward: forward half equals the q418 trajectory; reverse draw differs") {
    val hs = lstmHiddenTrajectory
    val row = SeqForward.bidiLstmForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Double]("hf1") == r6(hs.last._1))
    assert(row.getAs[Double]("hf2") == r6(hs.last._2))
    // the independent reverse draw must actually produce different states
    assert(row.getAs[Double]("hb1") != row.getAs[Double]("hf1"))
  }

  test("posEncSin pins the reference's sinusoidal encoding literals") {
    // transformer.py:16-45 at d_model=2: PE(pos,0)=sin(pos), PE(pos,1)=
    // cos(pos) with torch 0-indexed positions; our t = pos+1
    (1 to SeqForward.T).foreach { t =>
      assert(SeqForward.posEncSin(t)._1 == r9(math.sin((t - 1).toDouble)))
      assert(SeqForward.posEncSin(t)._2 == r9(math.cos((t - 1).toDouble)))
    }
    // position 0 is the identity anchor: (sin 0, cos 0) = (0, 1)
    assert(SeqForward.posEncSin(1) == ((0.0, 1.0)))
  }

  test("sinusoidal-PE block differs from the polynomial block only through PE") {
    // same weights, same fixture: the two encodings give different
    // outputs (PE actually flows), and forcing the SAME pe function
    // reproduces q421 exactly (nothing else changed in the plan)
    val poly = SeqForward.transformerBlockForward(fixture, "user_id",
      "ts", "event_id", "value").collect().head
    val sin = SeqForward.transformerBlockForward(fixture, "user_id",
      "ts", "event_id", "value",
      pe = SeqForward.posEncSin).collect().head
    assert(sin.getDouble(1) != poly.getDouble(1))
    val polyAgain = SeqForward.transformerBlockForward(fixture, "user_id",
      "ts", "event_id", "value",
      pe = SeqForward.posEnc).collect().head
    assert(polyAgain.getDouble(1) == poly.getDouble(1))
    assert(polyAgain.getDouble(2) == poly.getDouble(2))
  }

  test("maskedAttentionForward: padding invariance and full-window parity") {
    // a 5-event user: masked positions 6..8 must contribute NOTHING —
    // the output equals a plain-Scala softmax over exactly 5 positions
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val short = (1 to 5).map { i =>
      (3L, new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong,
        i * 40.0)
    }.toDF("user_id", "ts", "event_id", "value")
    val xs = (1 to 5).map(i => r9(i * 40.0 / 500.0))
    val q = r9(SeqForward.attnParam(0) * xs.last + SeqForward.attnParam(1))
    val ks = xs.map(x => r9(SeqForward.attnParam(2) * x +
      SeqForward.attnParam(3)))
    val vs = xs.map(x => r9(SeqForward.attnParam(4) * x +
      SeqForward.attnParam(5)))
    val ss = ks.map(k => q * k * 4.0)
    val m = ss.max
    val es = ss.map(s => math.exp(s - m))
    val out = r6(es.zip(vs).map { case (e, v) => e * v }.sum / es.sum)
    val row = SeqForward.maskedAttentionForward(short, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Long]("n_valid") == 5L)
    assert(row.getAs[Double]("attn_out") == out,
      s"masked output ${row.getAs[Double]("attn_out")} vs replay $out")
    // a FULL window reproduces the unmasked q419 arithmetic digit for digit
    val full = SeqForward.maskedAttentionForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    val unmasked = SeqForward.attentionForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(full.getAs[Double]("attn_out") ==
      unmasked.getAs[Double]("attn_out"))
    // sub-Tmin users stay out
    assert(SeqForward.maskedAttentionForward(
      short.filter(col("event_id") <= 1), "user_id", "ts", "event_id",
      "value").count() == 0)
  }

  test("gruForward matches a plain-Scala replay with torch gate semantics") {
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val xs = (1 to SeqForward.T).map(t => r9(t * 50.0 / 500.0))
    var h = Array(0.0, 0.0)
    xs.foreach { x =>
      def inS(g: Int, u: Int) =
        SeqForward.gruParam(g, u, 0) * x + SeqForward.gruParam(g, u, 3)
      def hidS(g: Int, u: Int) =
        SeqForward.gruParam(g, u, 1) * h(0) +
          SeqForward.gruParam(g, u, 2) * h(1) + SeqForward.gruParam(g, u, 4)
      val r = (0 until SeqForward.H).map(u => r9(sig(inS(0, u) + hidS(0, u))))
      val z = (0 until SeqForward.H).map(u => r9(sig(inS(1, u) + hidS(1, u))))
      val pp = (0 until SeqForward.H).map(u => r9(hidS(2, u)))
      // torch semantics pinned: b_hn sits INSIDE the reset product (r·p
      // where p = W_hn·h + b_hn), not outside it
      h = (0 until SeqForward.H).map(u =>
        r9((1.0 - z(u)) * th(inS(2, u) + r(u) * pp(u)) + z(u) * h(u)))
        .toArray
    }
    val row = SeqForward.gruForward(fixture, "user_id", "ts", "event_id",
      "value").collect().head
    assert(row.getDouble(1) == r6(h(0)), s"h1 ${row.getDouble(1)} vs ${r6(h(0))}")
    assert(row.getDouble(2) == r6(h(1)))
    assert(math.abs(row.getDouble(1)) < 1.0 && math.abs(row.getDouble(2)) < 1.0)
  }

  test("stackedLstmForward: layer 1 equals q418, layer 2 consumes its sequence") {
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val hs = lstmHiddenTrajectory // layer-1 per-step states
    val row = SeqForward.stackedLstmForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Double]("l1_h1") == r6(hs.last._1))
    assert(row.getAs[Double]("l1_h2") == r6(hs.last._2))
    // layer-2 replay over the layer-1 trajectory
    var hh = Array(0.0, 0.0); var cc = Array(0.0, 0.0)
    hs.foreach { case (i1, i2) =>
      def g(g: Int, u: Int) =
        SeqForward.lstm2Param(g, u, 0) * i1 +
          SeqForward.lstm2Param(g, u, 1) * i2 +
          SeqForward.lstm2Param(g, u, 2) * hh(0) +
          SeqForward.lstm2Param(g, u, 3) * hh(1) +
          SeqForward.lstm2Param(g, u, 4)
      val cN = (0 until SeqForward.H).map(u =>
        r9(sig(g(1, u)) * cc(u) + sig(g(0, u)) * th(g(3, u))))
      val hN = (0 until SeqForward.H).map(u =>
        r9(sig(g(2, u)) * th(cN(u))))
      cc = cN.toArray; hh = hN.toArray
    }
    assert(row.getAs[Double]("l2_h1") == r6(hh(0)),
      s"l2_h1 ${row.getAs[Double]("l2_h1")} vs ${r6(hh(0))}")
    assert(row.getAs[Double]("l2_h2") == r6(hh(1)))
    // depth actually does something: the layers end in different states
    assert(row.getAs[Double]("l2_h1") != row.getAs[Double]("l1_h1"))
  }

  test("hiveLstmForward matches a plain-Scala replay of the whole model") {
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val T = SeqForward.T
    val p = (0 to 113).map(SeqForward.compParam)
    val xs = (1 to T).map(t => r9(t * 50.0 / 500.0))
    // input proj + LayerNorm
    val es = xs.map { x =>
      val l1 = r9(p(0) * x + p(1)); val l2 = r9(p(2) * x + p(3))
      val mu = (l1 + l2) / 2.0
      val va = ((l1 - mu) * (l1 - mu) + (l2 - mu) * (l2 - mu)) / 2.0
      (r9(p(4) * (l1 - mu) / math.sqrt(va + 1e-5) + p(5)),
        r9(p(6) * (l2 - mu) / math.sqrt(va + 1e-5) + p(7)))
    }
    // one LSTM direction over a given order of the embedded sequence
    def run(base: Int, seq: Seq[(Double, Double)]): Seq[(Double, Double)] = {
      var h = Array(0.0, 0.0); var c = Array(0.0, 0.0)
      seq.map { case (e1, e2) =>
        def g(g: Int, u: Int) =
          p(base + g * 2 * 5 + u * 5) * e1 +
            p(base + g * 2 * 5 + u * 5 + 1) * e2 +
            p(base + g * 2 * 5 + u * 5 + 2) * h(0) +
            p(base + g * 2 * 5 + u * 5 + 3) * h(1) +
            p(base + g * 2 * 5 + u * 5 + 4)
        val cN = (0 until 2).map(u =>
          r9(sig(g(1, u)) * c(u) + sig(g(0, u)) * th(g(3, u))))
        val hN = (0 until 2).map(u => r9(sig(g(2, u)) * th(cN(u))))
        c = cN.toArray; h = hN.toArray
        (h(0), h(1))
      }
    }
    val fwd = run(8, es) // position t -> fwd(t)
    val bwd = run(48, es.reverse).reverse // position t -> bwd(t)
    val o = (0 until T).map(i =>
      Seq(fwd(i)._1, fwd(i)._2, bwd(i)._1, bwd(i)._2))
    // pooling
    val ss = o.map { ot =>
      val u1 = r9((0 until 4).map(k => p(88 + k) * ot(k)).sum + p(96))
      val u2 = r9((0 until 4).map(k => p(92 + k) * ot(k)).sum + p(97))
      r9(p(98) * th(u1) + p(99) * th(u2) + p(100))
    }
    val m = ss.max
    val ws = ss.map(s => math.exp(s - m))
    val z = ws.sum
    val pool = (0 until 4).map(k =>
      r9(ws.zip(o).map { case (w, ot) => w * ot(k) }.sum / z))
    val op = (0 until 2).map(j => math.max(0.0,
      r9((0 until 4).map(k => p(101 + 4 * j + k) * pool(k)).sum +
        p(109 + j))))
    val pred = r6(p(111) * op(0) + p(112) * op(1) + p(113))
    val row = SeqForward.hiveLstmForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Double]("pred") == pred,
      s"pred ${row.getAs[Double]("pred")} vs $pred")
    (0 until 4).foreach(k =>
      assert(row.getAs[Double](s"pool${k + 1}") == r6(pool(k)),
        s"pool${k + 1} mismatch"))
  }

  test("hiveTransformerForward matches a plain-Scala replay of the whole model") {
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    def gelu(x: Double): Double =
      0.5 * x * (1.0 + th(0.797884561 * (x + 0.044715 * x * x * x)))
    val T = SeqForward.T
    val p = (0 to 102).map(SeqForward.trParam)
    val xs = (1 to T).map(t => r9(t * 50.0 / 500.0))
    val eps = 1e-5
    // input Linear + LayerNorm + PE; CLS at position 0
    val e = Seq(r9(p(8) + SeqForward.posEncCls(0)._1),
      r9(p(9) + SeqForward.posEncCls(0)._2)) +: xs.zipWithIndex.map {
      case (x, i) =>
        val t = i + 1
        val l1 = r9(p(0) * x + p(1)); val l2 = r9(p(2) * x + p(3))
        val mu = (l1 + l2) / 2.0
        val va = ((l1 - mu) * (l1 - mu) + (l2 - mu) * (l2 - mu)) / 2.0
        Seq(r9(p(4) * (l1 - mu) / math.sqrt(va + eps) + p(5) +
          SeqForward.posEncCls(t)._1),
          r9(p(6) * (l2 - mu) / math.sqrt(va + eps) + p(7) +
            SeqForward.posEncCls(t)._2))
    }
    def ln(v: Seq[Double], gOff: Int): Seq[Double] = {
      val mu = (v.head + v(1)) / 2.0
      val va = ((v.head - mu) * (v.head - mu) +
        (v(1) - mu) * (v(1) - mu)) / 2.0
      Seq(r9(p(gOff) * (v.head - mu) / math.sqrt(va + eps) + p(gOff + 1)),
        r9(p(gOff + 2) * (v(1) - mu) / math.sqrt(va + eps) + p(gOff + 3)))
    }
    def proj(off: Int, v: Seq[Double]): Seq[Double] = (0 until 2).map(dd =>
      r9(p(off + 2 * dd) * v.head + p(off + 2 * dd + 1) * v(1) +
        p(off + 4 + dd)))
    // one encoder block over `seq`, outputs at the given positions
    def block(base: Int, seq: Seq[Seq[Double]],
        outAt: Seq[Int]): Seq[Seq[Double]] = {
      val qs = seq.map(proj(base, _)); val ks = seq.map(proj(base + 6, _))
      val vs = seq.map(proj(base + 12, _))
      outAt.map { i =>
        val o = (0 until 2).map { hIdx =>
          val ss = ks.indices.map(j => qs(i)(hIdx) * ks(j)(hIdx))
          val m = ss.max
          val ws = ss.map(s => math.exp(s - m))
          r9(ws.zip(vs.map(_(hIdx))).map { case (w, v) => w * v }.sum /
            ws.sum)
        }
        val r = (0 until 2).map(dd => seq(i)(dd) +
          r9(p(base + 18 + 2 * dd) * o(0) + p(base + 19 + 2 * dd) * o(1) +
            p(base + 22 + dd)))
        val n1 = ln(r, base + 24)
        val f = (0 until 2).map(dd =>
          r9(p(base + 28 + 2 * dd) * n1(0) + p(base + 29 + 2 * dd) * n1(1) +
            p(base + 32 + dd)))
        val g = f.map(x => r9(gelu(x)))
        val r2 = (0 until 2).map(dd => n1(dd) +
          r9(p(base + 34 + 2 * dd) * g(0) + p(base + 35 + 2 * dd) * g(1) +
            p(base + 38 + dd)))
        ln(r2, base + 40)
      }
    }
    val b1out = block(10, e, 0 to T)
    val cls = block(54, b1out, Seq(0)).head
    val opIn = r9(p(98) * cls.head + p(99) * cls(1) + p(100))
    val op = r9(gelu(opIn))
    val pred = r6(p(101) * op + p(102))
    val row = SeqForward.hiveTransformerForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Double]("pred") == pred,
      s"pred ${row.getAs[Double]("pred")} vs $pred")
    assert(row.getAs[Double]("cls1") == r6(cls.head))
    assert(row.getAs[Double]("cls2") == r6(cls(1)))
  }

  test("packedLstmForward: packing semantics — state frozen past each length") {
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    // a 5-event user: the packed forward must equal the plain 5-step
    // recurrence — steps 6..8 are no-ops
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val short = (1 to 5).map { i =>
      (3L, new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong,
        i * 40.0)
    }.toDF("user_id", "ts", "event_id", "value")
    val xs = (1 to 5).map(i => r9(i * 40.0 / 500.0))
    var h = Array(0.0, 0.0); var c = Array(0.0, 0.0)
    xs.foreach { x =>
      def gate(g: Int, u: Int): Double =
        SeqForward.lstmParam(g, u, 0) * x +
          SeqForward.lstmParam(g, u, 1) * h(0) +
          SeqForward.lstmParam(g, u, 2) * h(1) +
          SeqForward.lstmParam(g, u, 3)
      val cN = (0 until SeqForward.H).map(u =>
        r9(sig(gate(1, u)) * c(u) + sig(gate(0, u)) * th(gate(3, u))))
      val hN = (0 until SeqForward.H).map(u => r9(sig(gate(2, u)) * th(cN(u))))
      c = cN.toArray; h = hN.toArray
    }
    val row = SeqForward.packedLstmForward(short, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Long]("n_valid") == 5L)
    assert(row.getAs[Double]("h1") == r6(h(0)))
    assert(row.getAs[Double]("h2") == r6(h(1)))
    assert(row.getAs[Double]("c1") == r6(c(0)))
    // a FULL window reproduces the fixed-window q418 forward exactly
    val packed = SeqForward.packedLstmForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    val fixed = SeqForward.lstmForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    Seq("h1", "h2", "c1", "c2").foreach { cn =>
      assert(packed.getAs[Double](cn) == fixed.getAs[Double](cn),
        s"full-window packed $cn diverged from q418") }
  }

  // ---- HiveMLP (q436/q438): the headline model --------------------

  /** Plain-Scala replay of the residual trunk + classification head on
    * the fixture's pivoted features — shared by the q436/q438 specs.
    */
  private def mlpReplay: (Seq[Double], Double, Double) = {
    val T = SeqForward.T
    val p = (0 to 62).map(SeqForward.mlpParam)
    val xs = (1 to T).map(t => r9(t * 50.0 / 500.0))
    def ln(q: Seq[Double], gOff: Int): Seq[Double] = {
      val mu = (q(0) + q(1)) / 2.0
      val va = ((q(0) - mu) * (q(0) - mu) + (q(1) - mu) * (q(1) - mu)) / 2.0
      (0 until 2).map(d =>
        r9(p(gOff + 2 * d) * (q(d) - mu) / math.sqrt(va + 1e-5) +
          p(gOff + 2 * d + 1)))
    }
    val in = (0 until 2).map(d =>
      r9(xs.zipWithIndex.map { case (x, i) => p(T * d + i) * x }.sum +
        p(T * 2 + d)))
    var h = ln(in, T * 2 + 2)
    (0 until SeqForward.mlpLayers).foreach { l =>
      val base = T * 2 + 6 + l * 10
      val q = (0 until 2).map(d =>
        r9(p(base + 2 * d) * h(0) + p(base + 2 * d + 1) * h(1) +
          p(base + 4 + d)))
      val r = ln(q, base + 6)
      h = (0 until 2).map(d => r9(h(d) + math.max(0.0, r(d))))
    }
    val off = SeqForward.mlpTrunkSize(T, 2, SeqForward.mlpLayers)
    val z = (0 until 2).map(c =>
      r9(p(off + 2 * c) * h(0) + p(off + 2 * c + 1) * h(1) +
        p(off + 4 + c)))
    (h, z(0), z(1))
  }

  test("hiveMlpForward matches a plain-Scala replay of the whole model") {
    val (h, z1, z2) = mlpReplay
    val m = math.max(z1, z2)
    val (e1, e2) = (math.exp(z1 - m), math.exp(z2 - m))
    val row = SeqForward.hiveMlpForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    assert(row.getAs[Double]("prob1") == r6(e1 / (e1 + e2)),
      s"prob1 ${row.getAs[Double]("prob1")} vs ${r6(e1 / (e1 + e2))}")
    assert(row.getAs[Double]("prob2") == r6(e2 / (e1 + e2)))
    assert(row.getAs[Long]("pred_class") == (if (z1 >= z2) 0L else 1L))
    assert(row.getAs[Double]("feat1") == r6(h(0)))
    assert(row.getAs[Double]("feat2") == r6(h(1)))
    // softmax sanity: the two probabilities are a distribution
    assert(approx(row.getAs[Double]("prob1") + row.getAs[Double]("prob2"),
      1.0, 2e-6))
  }

  test("residual identity: a zero-weight block leaves the trunk state unchanged") {
    // block with W = 0, b = 0: Linear gives (0,0); LayerNorm of a
    // constant vector is 0/√ε = 0, so the block output is β; with
    // β < 0 the ReLU zeroes it and h + block(h) = h — the residual
    // path is REAL, not a re-derivation of h
    val T = SeqForward.T
    def pZero(k: Int): Double = {
      val trunk0 = T * 2 + 6 // input proj + input LN params
      if (k < trunk0) SeqForward.mlpParam(k)
      else if (k < trunk0 + 6) 0.0 // block W + bias
      else if (k == trunk0 + 7 || k == trunk0 + 9) -1.0 // β₁, β₂
      else 1.0 // γ (irrelevant on a zero vector)
    }
    val piv = SeqForward.sequencePivot(fixture, "user_id", "ts",
      "event_id", "value")
    val withBlock = SeqForward.mlpTrunkGeneric(piv, T, 2, 1, pZero)
      .collect().head
    val noBlock = SeqForward.mlpTrunkGeneric(piv, T, 2, 0, pZero)
      .collect().head
    assert(withBlock.getAs[Double]("h1") == noBlock.getAs[Double]("h1"))
    assert(withBlock.getAs[Double]("h2") == noBlock.getAs[Double]("h2"))
    // and with β > 0 the block DOES move the state (the identity above
    // is the residual wiring, not a degenerate always-identity)
    def pPos(k: Int): Double =
      if (k == T * 2 + 13 || k == T * 2 + 15) 1.0 else pZero(k)
    val moved = SeqForward.mlpTrunkGeneric(piv, T, 2, 1, pPos)
      .collect().head
    assert(moved.getAs[Double]("h1") != noBlock.getAs[Double]("h1"))
  }

  test("dualHeadMlpForward shares the trunk with the single-head twin") {
    val single = SeqForward.hiveMlpForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    val dual = SeqForward.dualHeadMlpForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    // identical trunk features — the shared backbone is shared in fact
    assert(dual.getAs[Double]("feat1") == single.getAs[Double]("feat1"))
    assert(dual.getAs[Double]("feat2") == single.getAs[Double]("feat2"))
    // the classification head is the same bank: argmax of the dual
    // logits equals the single-head predicted class
    val cls = if (dual.getAs[Double]("logit1") >=
      dual.getAs[Double]("logit2")) 0L else 1L
    assert(cls == single.getAs[Long]("pred_class"))
    // regression head replay on the shared features
    val (h, _, _) = mlpReplay
    val off = SeqForward.mlpTrunkSize(SeqForward.T, 2, SeqForward.mlpLayers)
    val rh = math.max(0.0, r9(SeqForward.mlpParam(off + 6) * h(0) +
      SeqForward.mlpParam(off + 7) * h(1) + SeqForward.mlpParam(off + 8)))
    val reg = r6(SeqForward.mlpParam(off + 9) * rh +
      SeqForward.mlpParam(off + 10))
    assert(dual.getAs[Double]("reg_pred") == reg,
      s"reg ${dual.getAs[Double]("reg_pred")} vs $reg")
  }

  test("dual-head LSTM/Transformer: shared trunk pins reg_pred to the single-head twins") {
    // DualHeadLSTM (lstm.py:243-340): the regression leg IS q433's head
    // on the shared projection — bit-identical outputs prove the trunk
    // is shared in fact, not re-derived
    val lstmSingle = SeqForward.hiveLstmForward(fixture, "user_id", "ts",
      "event_id", "value").collect().head
    val lstmDual = SeqForward.hiveLstmForward(fixture, "user_id", "ts",
      "event_id", "value", dualHead = true).collect().head
    assert(lstmDual.getAs[Double]("reg_pred") ==
      lstmSingle.getAs[Double]("pred"))
    // classification leg: a true softmax distribution, argmax-consistent
    val (p1l, p2l) = (lstmDual.getAs[Double]("prob1"),
      lstmDual.getAs[Double]("prob2"))
    assert(approx(p1l + p2l, 1.0, 2e-6))
    assert(lstmDual.getAs[Long]("pred_class") ==
      (if (p1l >= p2l) 0L else 1L))
    // cls head replay from the shared projection (round-6 audit cols
    // are rounded AFTER the head reads round-9 op — replay the head on
    // the replayed trunk instead): reuse the q433 plain-Scala pipeline
    // via the exposed shared1/shared2 only for sanity bounds
    assert(math.abs(lstmDual.getAs[Double]("shared1")) < 10.0)
    // DualHeadTransformer (transformer.py:345-440): same contract
    val trSingle = SeqForward.hiveTransformerForward(fixture, "user_id",
      "ts", "event_id", "value").collect().head
    val trDual = SeqForward.hiveTransformerForward(fixture, "user_id",
      "ts", "event_id", "value", dualHead = true).collect().head
    assert(trDual.getAs[Double]("reg_pred") ==
      trSingle.getAs[Double]("pred"))
    val (p1t, p2t) = (trDual.getAs[Double]("prob1"),
      trDual.getAs[Double]("prob2"))
    assert(approx(p1t + p2t, 1.0, 2e-6))
    assert(trDual.getAs[Long]("pred_class") ==
      (if (p1t >= p2t) 0L else 1L))
  }

  // ---- weighted cross-entropy trajectory (q437) --------------------

  // three users with 9+ ordered events each: one lands class 1
  // (y = 0.9 ≥ ceThr), two land class 0 — a real 2:1 imbalance
  private lazy val ceFixture = {
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val a = (1 to 9).map(i => (1L,
      new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong, i * 50.0))
    val b = (1 to 9).map(i => (2L,
      new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong, 30.0))
    val c = (1 to 9).map(i => (3L,
      new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong,
      20.0 + i))
    (a ++ b ++ c).toDF("user_id", "ts", "event_id", "value")
  }

  /** Plain-Scala replay of one weighted-CE gradient pass at params th
    * over rows (x1, x8, yb): returns the six UNCLIPPED normalized
    * gradients and the weighted loss.
    */
  private def ceGradReplay(rows: Seq[(Double, Double, Int)],
      th: Seq[Double], w0: Double, w1: Double): (Seq[Double], Double) = {
    val n0 = rows.count(_._3 == 0); val n1 = rows.count(_._3 == 1)
    val sw = w0 * n0 + w1 * n1
    val per = rows.map { case (x1, x8, yb) =>
      val z0 = r9(th(0) * x1 + th(1) * x8 + th(2))
      val z1 = r9(th(3) * x1 + th(4) * x8 + th(5))
      val m = math.max(z0, z1)
      val (e0, e1) = (math.exp(z0 - m), math.exp(z1 - m))
      val p0 = r9(e0 / (e0 + e1)); val p1 = r9(e1 / (e0 + e1))
      val w = if (yb == 0) w0 else w1
      val d0 = p0 - (if (yb == 0) 1.0 else 0.0)
      val d1 = p1 - (if (yb == 1) 1.0 else 0.0)
      (Seq(w * d0 * x1, w * d0 * x8, w * d0,
        w * d1 * x1, w * d1 * x8, w * d1),
        -w * math.log(if (yb == 0) p0 else p1))
    }
    ((0 until 6).map(i => per.map(_._1(i)).sum / sw),
      per.map(_._2).sum / sw)
  }

  test("ceWeightedAdamwTrain matches a plain-Scala replay on the fixture") {
    val tr = SeqForward.ceWeightedAdamwTrain(ceFixture, "user_id", "ts",
      "event_id", "value").collect()
    assert(tr.length == SeqForward.rnnIters)
    // fixture pivot: x = value/500 at ranks 1..8, yb from rank 9
    val rows = Seq(
      (r9(50.0 / 500.0), r9(400.0 / 500.0), 1), // user 1: y = 0.9
      (r9(30.0 / 500.0), r9(30.0 / 500.0), 0), // user 2: y = 0.06
      (r9(21.0 / 500.0), r9(28.0 / 500.0), 0)) // user 3: y = 0.058
    val (w0, w1) = (1.0 / 3.0, 2.0 / 3.0) // n1/(n0+n1), n0/(n0+n1)
    assert(approx(tr.head.getAs[Double]("class_w0"), r6(w0), 1e-9))
    assert(approx(tr.head.getAs[Double]("class_w1"), r6(w1), 1e-9))
    var th = (0 until 6).map(SeqForward.ceInit)
    var mo = Seq.fill(6)(0.0); var vo = Seq.fill(6)(0.0)
    (1 to SeqForward.rnnIters).foreach { it =>
      val row = tr(it - 1)
      val names = Seq("w0a", "w0b", "b0", "w1a", "w1b", "b1")
      names.zipWithIndex.foreach { case (nm, i) =>
        assert(approx(row.getAs[Double](nm), th(i), 1e-9),
          s"iter $it param $nm: ${row.getAs[Double](nm)} vs ${th(i)}")
      }
      val (gRaw, loss) = ceGradReplay(rows, th, w0, w1)
      val g = gRaw.map(v => math.max(-1.0, math.min(1.0, r9(v))))
      names.zipWithIndex.foreach { case (nm, i) =>
        assert(approx(row.getAs[Double](s"g_$nm"), g(i), 1e-8),
          s"iter $it grad $nm: ${row.getAs[Double](s"g_$nm")} vs ${g(i)}")
      }
      assert(approx(row.getAs[Double]("ce_loss"), r6(loss), 1e-6))
      val stepped = (0 until 6).map(i =>
        SeqForward.adamwStep(th(i), g(i), mo(i), vo(i), it))
      th = stepped.map(_._1); mo = stepped.map(_._2); vo = stepped.map(_._3)
    }
  }

  test("weighted CE: uniform weights recover the unweighted case (scale invariance)") {
    def run(w: (Double, Double)) =
      SeqForward.ceWeightedAdamwTrain(ceFixture, "user_id", "ts",
        "event_id", "value", weightsOverride = Some(w)).collect()
    val a = run((1.0, 1.0)); val b = run((0.5, 0.5))
    val cols = Seq("w0a", "w0b", "b0", "w1a", "w1b", "b1",
      "g_w0a", "g_w0b", "g_b0", "g_w1a", "g_w1b", "g_b1", "ce_loss")
    a.zip(b).foreach { case (ra, rb) =>
      cols.foreach { c =>
        assert(approx(ra.getAs[Double](c), rb.getAs[Double](c), 1e-7),
          s"$c: ${ra.getAs[Double](c)} vs ${rb.getAs[Double](c)}")
      }
    }
  }

  test("weighted CE: per-class gradient contributions scale by the class weights") {
    // iteration-1 identity: g(w0,w1)·sw = w0·S0 + w1·S1 where S_c is
    // the raw class-c gradient sum, recovered from single-class runs
    // g(1,0)·n0 = S0 and g(0,1)·n1 = S1 — the weights enter the
    // gradient EXACTLY linearly, per class, as torch's weighted CE
    def iter1(w: (Double, Double)) =
      SeqForward.ceWeightedAdamwTrain(ceFixture, "user_id", "ts",
        "event_id", "value", weightsOverride = Some(w)).collect().head
    val (n0, n1) = (2.0, 1.0)
    val g10 = iter1((1.0, 0.0)); val g01 = iter1((0.0, 1.0))
    val (w0, w1) = (0.3, 0.7)
    val gw = iter1((w0, w1))
    val sw = w0 * n0 + w1 * n1
    Seq("g_w0a", "g_w0b", "g_b0", "g_w1a", "g_w1b", "g_b1").foreach { c =>
      val lhs = gw.getAs[Double](c) * sw
      val rhs = w0 * g10.getAs[Double](c) * n0 +
        w1 * g01.getAs[Double](c) * n1
      assert(math.abs(gw.getAs[Double](c)) < 1.0, s"$c clipped — identity void")
      assert(approx(lhs, rhs, 1e-6), s"$c: $lhs vs $rhs")
    }
  }

  test("CE gradient is the closed form p − y (finite differences)") {
    val rows = Seq((0.1, 0.8, 1), (0.06, 0.06, 0), (0.042, 0.056, 0))
    val (w0, w1) = (1.0 / 3.0, 2.0 / 3.0)
    val th0 = (0 until 6).map(SeqForward.ceInit)
    def lossAt(th: Seq[Double]): Double = {
      val per = rows.map { case (x1, x8, yb) =>
        val z0 = th(0) * x1 + th(1) * x8 + th(2)
        val z1 = th(3) * x1 + th(4) * x8 + th(5)
        val m = math.max(z0, z1)
        val (e0, e1) = (math.exp(z0 - m), math.exp(z1 - m))
        val p = if (yb == 0) e0 / (e0 + e1) else e1 / (e0 + e1)
        val w = if (yb == 0) w0 else w1
        -w * math.log(p)
      }
      per.sum / (w0 * 2 + w1 * 1)
    }
    // closed-form gradients WITHOUT the round-9 pinning (pure math)
    val per = rows.map { case (x1, x8, yb) =>
      val z0 = th0(0) * x1 + th0(1) * x8 + th0(2)
      val z1 = th0(3) * x1 + th0(4) * x8 + th0(5)
      val m = math.max(z0, z1)
      val (e0, e1) = (math.exp(z0 - m), math.exp(z1 - m))
      val p0 = e0 / (e0 + e1); val p1 = e1 / (e0 + e1)
      val w = if (yb == 0) w0 else w1
      val d0 = p0 - (if (yb == 0) 1.0 else 0.0)
      val d1 = p1 - (if (yb == 1) 1.0 else 0.0)
      Seq(w * d0 * x1, w * d0 * x8, w * d0, w * d1 * x1, w * d1 * x8,
        w * d1)
    }
    val g = (0 until 6).map(i => per.map(_(i)).sum / (w0 * 2 + w1 * 1))
    val eps = 1e-6
    (0 until 6).foreach { i =>
      val up = th0.updated(i, th0(i) + eps)
      val dn = th0.updated(i, th0(i) - eps)
      val fd = (lossAt(up) - lossAt(dn)) / (2 * eps)
      assert(approx(fd, g(i), 1e-5), s"param $i: fd $fd vs closed ${g(i)}")
    }
  }

  test("ceWeightedAdamwTrain actually learns on real data") {
    val events = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val tr = SeqForward.ceWeightedAdamwTrain(events, "user_id", "ts",
      "event_id", "value").collect()
    assert(tr.length == SeqForward.rnnIters)
    val losses = tr.map(_.getAs[Double]("ce_loss")).toSeq
    assert(losses.last < losses.head,
      s"weighted CE did not descend: $losses")
  }

  // ---- evaluate.py card (q439) --------------------------------------

  test("mlpEvaluateCard: confusion cells partition n and metrics follow from them") {
    val card = SeqForward.mlpEvaluateCard(ceFixture, "user_id", "ts",
      "event_id", "value").collect().head
    val (n, tp, fp, fn, tn) = (card.getAs[Long]("n"),
      card.getAs[Long]("tp"), card.getAs[Long]("fp"),
      card.getAs[Long]("fn"), card.getAs[Long]("tn"))
    assert(n == 3L) // the fixture's three full 9-windows
    assert(tp + fp + fn + tn == n)
    assert(card.getAs[Double]("accuracy") ==
      r6((tp + tn).toDouble / n.toDouble))
    if (tp + fp > 0)
      assert(card.getAs[Double]("precision") ==
        r6(tp.toDouble / (tp + fp).toDouble))
    if (2 * tp + fp + fn > 0)
      assert(card.getAs[Double]("f1") ==
        r6(2.0 * tp / (2.0 * tp + fp + fn)))
    // probabilistic pair present and finite
    assert(card.getAs[Double]("log_loss") > 0.0)
    val brier = card.getAs[Double]("brier")
    assert(brier >= 0.0 && brier <= 1.0)
    // AUC defined (both classes present in the fixture) and in range
    assert(!card.isNullAt(card.fieldIndex("auc")))
    val auc = card.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  // ---- width generalization: miniature by CHOICE --------------------

  test("lstmForwardGeneric at (T, H, lstmParam) is bit-identical to lstmForward") {
    val a = SeqForward.lstmForward(fixture, "user_id", "ts", "event_id",
      "value").collect().head
    val b = SeqForward.lstmForwardGeneric(fixture, "user_id", "ts",
      "event_id", "value", SeqForward.T, SeqForward.H,
      SeqForward.lstmParam).collect().head
    Seq("h1", "h2", "c1", "c2").foreach(c =>
      assert(a.getAs[Double](c) == b.getAs[Double](c), s"$c differs"))
  }

  test("lstmForwardGeneric at (12, 4): plain-Scala replay holds at the wider shape") {
    val steps = 12; val width = 4
    def pf(g: Int, u: Int, s: Int): Double =
      SeqForward.param(5000 + g * 200 + u * 20 + s)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val wide = (1 to 14).map { i =>
      (7L, new java.sql.Timestamp(base.getTime + i * 60000L), i.toLong,
        i * 30.0)
    }.toDF("user_id", "ts", "event_id", "value")
    def sig(z: Double) = 1.0 / (1.0 + math.exp(-z))
    def th(z: Double) =
      (math.exp(2.0 * z) - 1.0) / (math.exp(2.0 * z) + 1.0)
    val xs = (1 to steps).map(t => r9(t * 30.0 / 500.0))
    var h = Array.fill(width)(0.0); var c = Array.fill(width)(0.0)
    xs.foreach { x =>
      def gate(g: Int, u: Int): Double =
        ((pf(g, u, 0) * x) +: (1 to width).map(k =>
          pf(g, u, k) * h(k - 1))).sum + pf(g, u, width + 1)
      val cN = (0 until width).map(u =>
        r9(sig(gate(1, u)) * c(u) + sig(gate(0, u)) * th(gate(3, u))))
      val hN = (0 until width).map(u => r9(sig(gate(2, u)) * th(cN(u))))
      c = cN.toArray; h = hN.toArray
    }
    val row = SeqForward.lstmForwardGeneric(wide, "user_id", "ts",
      "event_id", "value", steps, width, pf).collect().head
    (0 until width).foreach { u =>
      assert(row.getAs[Double](s"h${u + 1}") == r6(h(u)), s"h${u + 1}")
      assert(row.getAs[Double](s"c${u + 1}") == r6(c(u)), s"c${u + 1}")
    }
  }

  test("staged builders generate plans LINEAR in the model shape") {
    import org.apache.spark.sql.catalyst.plans.logical.Project
    def maxProj(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case pr: Project => pr.projectList.size
      }.max
    // LSTM: widest authored stage carries user_id + steps features +
    // old/new state pairs — steps + 2·width + 1. The overhead beyond
    // that must be a CONSTANT across shapes (linear, no blowup).
    def pf(g: Int, u: Int, s: Int): Double =
      SeqForward.param(5000 + g * 200 + u * 20 + s)
    val lstmOver = Seq((8, 2), (12, 4), (10, 6)).map { case (st, w) =>
      val df = SeqForward.lstmForwardGeneric(fixture, "user_id", "ts",
        "event_id", "value", st, w, pf)
      maxProj(df) - (st + 2 * w + 1)
    }
    assert(lstmOver.distinct.size == 1,
      s"LSTM stage width not linear in (steps, width): $lstmOver")
    // MLP trunk: widest stage carries user_id + h + block-linear + mu +
    // va — 2·hid + 3. Same constant-overhead assertion across widths
    // (a 2-feature in-memory pivot so the source frame's own projection
    // never dominates the measurement).
    val pivSmall = Seq((5L, 0.1, 0.2)).toDF("user_id", "x1", "x2")
    val mlpOver = Seq(2, 4, 6).map { hid =>
      val df = SeqForward.mlpTrunkGeneric(pivSmall, 2, hid, 2,
        k => SeqForward.param(6000 + k))
      maxProj(df) - (2 * hid + 3)
    }
    assert(mlpOver.distinct.size == 1,
      s"MLP stage width not linear in hid: $mlpOver")
  }

  test("mlpTrunkGeneric at (12, 4, 2): plain-Scala replay holds at the wider shape") {
    val (nf, hid, layers) = (12, 4, 2)
    def p(k: Int): Double = SeqForward.param(6000 + k)
    // in-memory pivot row (the trunk consumes pivoted features directly)
    val xs = (1 to nf).map(i => r9(i * 37.0 / 500.0))
    val piv = Seq(Tuple1(5L)).toDF("user_id")
      .select(Seq(col("user_id")) ++
        xs.zipWithIndex.map { case (x, i) => lit(x).as(s"x${i + 1}") }: _*)
    def ln(q: Seq[Double], gOff: Int): Seq[Double] = {
      val mu = q.sum / hid.toDouble
      val va = q.map(v => (v - mu) * (v - mu)).sum / hid.toDouble
      (0 until hid).map(d =>
        r9(p(gOff + 2 * d) * (q(d) - mu) / math.sqrt(va + 1e-5) +
          p(gOff + 2 * d + 1)))
    }
    val in = (0 until hid).map(d =>
      r9(xs.zipWithIndex.map { case (x, i) => p(nf * d + i) * x }.sum +
        p(nf * hid + d)))
    var h = ln(in, nf * hid + hid)
    (0 until layers).foreach { l =>
      val base = nf * hid + 3 * hid + l * (hid * hid + 3 * hid)
      val q = (0 until hid).map(d =>
        r9((0 until hid).map(k => p(base + hid * d + k) * h(k)).sum +
          p(base + hid * hid + d)))
      val r = ln(q, base + hid * hid + hid)
      h = (0 until hid).map(d => r9(h(d) + math.max(0.0, r(d))))
    }
    val row = SeqForward.mlpTrunkGeneric(piv, nf, hid, layers, p)
      .collect().head
    (0 until hid).foreach(d =>
      assert(approx(row.getAs[Double](s"h${d + 1}"), h(d), 1e-12),
        s"h${d + 1}: ${row.getAs[Double](s"h${d + 1}")} vs ${h(d)}"))
  }

  test("forward passes carry no global window and no join") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq(
        SeqForward.lstmForward(fixture, "user_id", "ts", "event_id", "value"),
        SeqForward.attentionForward(fixture, "user_id", "ts", "event_id",
          "value"),
        SeqForward.transformerBlockForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.multiHeadBlockForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.attentionPoolingForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.bidiLstmForward(fixture, "user_id", "ts", "event_id",
          "value"),
        SeqForward.maskedAttentionForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.gruForward(fixture, "user_id", "ts", "event_id",
          "value"),
        SeqForward.stackedLstmForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.hiveLstmForward(fixture, "user_id", "ts", "event_id",
          "value"),
        SeqForward.hiveTransformerForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.packedLstmForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.hiveMlpForward(fixture, "user_id", "ts", "event_id",
          "value"),
        SeqForward.dualHeadMlpForward(fixture, "user_id", "ts",
          "event_id", "value"),
        SeqForward.hiveLstmForward(fixture, "user_id", "ts", "event_id",
          "value", dualHead = true),
        SeqForward.hiveTransformerForward(fixture, "user_id", "ts",
          "event_id", "value", dualHead = true),
        // (mlpEvaluateCard is NOT a forward pass: its AUC leg uses the
        // midrank machinery's broadcast joins by design — own spec)
        SeqForward.lstmForwardGeneric(fixture, "user_id", "ts",
          "event_id", "value", SeqForward.T, SeqForward.H,
          SeqForward.lstmParam)).foreach { df =>
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
