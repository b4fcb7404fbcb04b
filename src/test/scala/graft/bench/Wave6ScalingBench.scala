package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{SimilarityOps, TextOps, TimeSeriesOps}

/** Scaling micro-benchmark for the round-5 session-2 wave: BM25, the
  * portable LSH signature, integer-exact EWMA, and token chunking at 8×
  * inputs (id-offset copies, the [[WaveScalingBench]] convention). Loose
  * ceilings — super-linear plans blow past them, linear passes
  * comfortably; measured ratios print as the record.
  *
  * The LSH bench times the SIGNATURE pass (the per-row linear part): the
  * in-bucket pair profile is quadratic in bucket load BY DESIGN (that is
  * what banding bounds), so a fixed-plane 8× corpus inflates pairs ~64×
  * — at scale the plane count grows with the corpus, keeping bucket
  * loads constant.
  */
class Wave6ScalingBench extends SparkSpec {

  private def timed(f: => Long): (Long, Long) = {
    val t0 = System.nanoTime(); val n = f
    ((System.nanoTime() - t0) / 1000000, n)
  }

  private def ratioOf(small: => Long, big: => Long,
      tag: String): Double = {
    timed(small) // warm codegen
    val s = timed(small); val b = timed(big)
    val ratio = b._1.toDouble / math.max(1, s._1)
    info(f"$tag 1x=${s._1}%5d ms  8x=${b._1}%5d ms  ratio=$ratio%.1f")
    ratio
  }

  private def docs(copies: Int): DataFrame =
    (0 until copies).map { k =>
      spark.range(0L, 2000L).select(
        (col("id") + lit(k.toLong * 1000000L)).as("doc_id"),
        concat_ws(" ", (0 until 40).map(j =>
          concat(lit("w"), ((col("id") + j) * 2654435761L % 997L))): _*)
          .as("text"))
    }.reduce(_.unionByName(_)).cache()

  test("bm25 scales near-linearly in documents") {
    val small = docs(1); val big = docs(8)
    assert(small.count() * 8 == big.count())
    val terms = Seq("w3", "w500", "w996")
    def run(df: DataFrame) =
      TextOps.bm25TopDocs(df, "doc_id", "text", terms, 20).count()
    val ratio = ratioOf(run(small), run(big), "bm25")
    assert(ratio < 24.0, f"bm25 super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("portable LSH signature scales near-linearly in vectors") {
    def vecs(mult: Int) = spark.range(0L, 4000L * mult).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(31)),
        i => ((pmod(xxhash64(col("id"), i), lit(2001L)) - 1000L)
          .cast("double") / 1000.0).cast("float")).as("embedding"))
      .cache()
    val small = vecs(1); val big = vecs(8)
    def run(df: DataFrame) = df.select(
      SimilarityOps.portableHyperplaneSignature(col("embedding"), 8)
        .as("sig")).groupBy(col("sig")).count().count()
    val ratio = ratioOf(run(small), run(big), "lsh-signature")
    assert(ratio < 24.0, f"lsh signature super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("ewma scales near-linearly in events at fixed key count") {
    def events(mult: Int) = spark.range(0L, 20000L * mult).select(
      (col("id") % 50L).as("user_id"),
      col("id").as("ts"),
      col("id").as("event_id"),
      ((col("id") * 7919L % 1000L).cast("double") / 10.0).as("value"))
      .cache()
    val small = events(1); val big = events(8)
    def run(df: DataFrame) =
      TimeSeriesOps.ewma(df, "user_id", "ts", "event_id", "value").count()
    val ratio = ratioOf(run(small), run(big), "ewma")
    assert(ratio < 24.0, f"ewma super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("token chunking scales near-linearly in documents") {
    val small = docs(1); val big = docs(8)
    def run(df: DataFrame) =
      TextOps.slidingTokenChunks(df, "doc_id", "text", 32, 24).count()
    val ratio = ratioOf(run(small), run(big), "chunking")
    assert(ratio < 24.0, f"chunking super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }
}
