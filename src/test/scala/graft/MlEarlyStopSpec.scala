package graft

import graft.ml.MlPipelines

class MlEarlyStopSpec extends SparkSpec {
  import spark.implicits._

  // Planted-overfit fixture: y = x1·x2 over a 32×32 interaction surface.
  // One depth-5 tree (32 leaves) cannot express the 1024-cell product
  // surface, so boosting keeps refining with geometrically decaying
  // held-out improvement — exactly the regime where a validation-tol
  // stop fires mid-run instead of at iteration 1 or never. (A single
  // 1-D feature saturates after ONE tree under the default 32-bin
  // histogram, which would make any trace flat — measured, not guessed.)
  private def fixture = (1L to 4000L).map { i =>
    val x1 = (i % 32).toDouble
    val x2 = ((i / 32) % 32).toDouble
    (i, x1, x2, x1 * x2)
  }.toDF("id", "x1", "x2", "y")

  test("gbtEarlyStopTrace stops before maxIter and records the validation trace") {
    val trace = MlPipelines.gbtEarlyStopTrace(fixture, "id", Seq("x1", "x2"),
      "y", maxIter = 40, tol = 0.05).orderBy("iteration").collect()
    assert(trace.nonEmpty)
    // the stop itself: strictly fewer iterations than the budget
    assert(trace.length < 40,
      s"expected early stop, got ${trace.length} of 40 iterations")
    // and a genuine training run before it — not an iteration-1 bailout
    assert(trace.length > 3)
    // the trace is complete and self-describing
    assert(trace.map(_.getLong(0)).toSeq == (0L until trace.length.toLong))
    assert(trace.forall(_.getLong(2) == 40L))
    // on this fixture the recorded validation loss strictly improves
    val losses = trace.map(_.getDouble(1)).toSeq
    assert(losses.zip(losses.tail).forall { case (a, b) => b <= a + 1e-9 },
      s"validation trace not monotone: $losses")
    assert(losses.last < losses.head)
    assert(losses.forall(l => !l.isNaN && !l.isInfinite))
    // results.json parity (reference trainer.py:262-320 dumps the epoch
    // trace): the frame round-trips through the JSON sink
    val dir = java.nio.file.Files.createTempDirectory("graft_es").toString
    val frame = MlPipelines.gbtEarlyStopTrace(fixture, "id",
      Seq("x1", "x2"), "y", maxIter = 40, tol = 0.05)
    graft.sources.Sources.writeJson(frame, s"$dir/val_trace")
    val back = spark.read.json(s"$dir/val_trace")
    assert(back.count() == trace.length)
    assert(back.columns.toSet == Set("iteration", "val_loss", "max_iter"))
  }

  test("gbtEarlyStopTrace is deterministic across runs (hash split, fixed seed)") {
    def run() = MlPipelines.gbtEarlyStopTrace(fixture, "id", Seq("x1", "x2"),
      "y", maxIter = 12, tol = 0.05).orderBy("iteration")
      .collect().map(_.toSeq).toSeq
    assert(run() == run())
  }
}
