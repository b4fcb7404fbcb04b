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
          "event_id", "value")).foreach { df =>
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
