package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.{DriftOps, ProfileOps}
import graft.streaming.{StreamingOps, StreamSink}

/** EB shrinkage (q312), Wilcoxon signed-rank (q313), streaming fairness
  * twin (q314): exact MoM prior, hand-ranked pairs, stream ≡ batch.
  */
class ShrinkageAndPairedSpec extends SparkSpec {
  import spark.implicits._

  test("ebShrinkageCard: small samples shrink hard, large barely move") {
    // sources: tiny 2/2 vs solid 500/1000 — raw ranks tiny first,
    // shrunk must rank the solid source's neighborhood sanely
    val rows = Seq.fill(2)(("tiny", 300L)) ++
      (1 to 1000).map(i => ("big", if (i <= 500) 300L else 10L)) ++
      (1 to 100).map(i => ("mid", if (i <= 30) 300L else 10L))
    val df = rows.toDF("source", "n_chars")
    val out = ProfileOps.ebShrinkageCard(df, "source",
      col("n_chars") >= 200).collect()
      .map(r => r.getString(0) -> r).toMap
    val (tiny, big) = (out("tiny"), out("big"))
    assert(tiny.getDouble(3) == 1.0)             // raw 2/2
    assert(tiny.getDouble(4) < 0.9)              // shrunk well below 1
    assert(math.abs(big.getDouble(4) - 0.5) < 0.05) // big barely moves
    // shrinkage distance is larger for the tiny source
    assert(math.abs(tiny.getDouble(4) - tiny.getDouble(3)) >
      math.abs(big.getDouble(4) - big.getDouble(3)))
  }

  test("ebShrinkageCard: degenerate variance surfaces null prior") {
    val df = Seq(("a", 300L), ("a", 10L), ("b", 300L), ("b", 10L))
      .toDF("source", "n_chars")
    val out = ProfileOps.ebShrinkageCard(df, "source",
      col("n_chars") >= 200).collect()
    assert(out.forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("wilcoxonSignedRank: hand-computed W+ with ties") {
    // pairs (a−b): keys with diffs +1, +1, −2, +3 →
    // |d| = {1,1,2,3}: midranks 1.5,1.5,3,4 → W+ = 1.5+1.5+4 = 7
    // mu = 4·5/4 = 5; sr2 = 2·2.25+9+16 = 29.5 → sigma = √7.375
    val rows = Seq(
      (1L, "A", 2.0), (1L, "B", 1.0),
      (2L, "A", 5.0), (2L, "B", 4.0),
      (3L, "A", 1.0), (3L, "B", 3.0),
      (4L, "A", 9.0), (4L, "B", 6.0))
    val df = rows.toDF("k", "cond", "v")
    val r = DriftOps.wilcoxonSignedRank(df, "k", "v", "cond", "A", "B")
      .head()
    assert(r.getLong(0) == 4L)
    assert(r.getDouble(1) == 7.0)
    assert(r.getDouble(2) == 5.0)
    assert(r.getDouble(3) == 2.715695)   // sqrt(29.5/4)
    assert(math.abs(r.getDouble(4) - 2.0 / 2.7156946) < 1e-5)
  }

  test("wilcoxonSignedRank: zero differences are dropped") {
    val rows = Seq(
      (1L, "A", 2.0), (1L, "B", 2.0),     // d = 0 → dropped
      (2L, "A", 5.0), (2L, "B", 4.0))
    val r = DriftOps.wilcoxonSignedRank(rows.toDF("k", "cond", "v"),
      "k", "v", "cond", "A", "B").head()
    assert(r.getLong(0) == 1L && r.getDouble(1) == 1.0)
  }

  test("streamingFairnessCard converges to the batch card exactly") {
    val d = Files.createTempDirectory("graft_fair_stream").toString
    val rows = (1 to 60).map { i =>
      (if (i % 3 == 0) "g1" else "g2", i % 2 == 0, i % 5 < 2)
    }
    rows.toDF("grp", "y", "p").coalesce(3)
      .write.mode("overwrite").parquet(s"$d/f.parquet")
    val batch = graft.metrics.MetricQueries.fairnessCard(
      spark.read.parquet(s"$d/f.parquet"), "grp", col("y"), col("p"))
      .collect().toSeq
    val stream = StreamingOps.streamingFairnessCard(
      spark, d, "f.parquet", "grp", col("y"), col("p"),
      StreamSink.Memory(s"spec_fair_${System.nanoTime()}"))
      .collect().toSeq
    assert(batch.nonEmpty)
    assert(stream == batch, s"batch=$batch\nstream=$stream")
  }
}
