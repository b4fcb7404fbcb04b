package graft.bench

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.{DedupOps, LayoutOps, SketchOps}

/** Scaling micro-benchmark for the round-5 wave: small-file compaction,
  * SimHash under the portable MD5 digit decode, and CMS counters under
  * the portable bucket draw. 8× inputs are id-offset copies (the
  * [[WaveScalingBench]] convention); loose ceilings — a super-linear
  * plan (per-file driver work, a global sort, an unbounded window)
  * blows past them, linear passes comfortably. Measured ratios print
  * as the record.
  */
class Round5ScalingBench extends SparkSpec {

  private def timed(f: => Long): (Long, Long) = {
    val t0 = System.nanoTime(); val n = f
    ((System.nanoTime() - t0) / 1000000, n)
  }

  private def docs(copies: Int): DataFrame =
    (0 until copies).map { k =>
      spark.range(0L, 2000L).select(
        (col("id") + lit(k.toLong * 1000000L)).as("doc_id"),
        concat_ws(" ", (0 until 25).map(j =>
          concat(lit("w"), ((col("id") + j) * 2654435761L % 997L))): _*)
          .as("text"))
    }.reduce(_.unionByName(_)).cache()

  test("simhash (md5 digit decode) scales near-linearly in documents") {
    val small = docs(1); val big = docs(8)
    assert(small.count() * 8 == big.count())
    def run(df: DataFrame) =
      timed(DedupOps.simhash64(df, "doc_id", "text").count())
    run(small) // warm codegen
    val s = run(small); val b = run(big)
    val ratio = b._1.toDouble / math.max(1, s._1)
    info(f"simhash 1x=${s._1}%5d ms  8x=${b._1}%5d ms  ratio=$ratio%.1f")
    assert(ratio < 24.0, f"simhash super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("CMS counters (portable bucket draw) scale near-linearly in terms") {
    def terms(mult: Int) = spark.range(0L, 50000L * mult).select(
      ((col("id") * 40503L) % 20011L).cast("string").as("term"),
      lit(1L).as("n")).cache()
    val small = terms(1); val big = terms(8)
    def run(df: DataFrame) =
      timed(SketchOps.cmsCounters(df, "term", "n", 4, 1024).count())
    run(small)
    val s = run(small); val b = run(big)
    val ratio = b._1.toDouble / math.max(1, s._1)
    info(f"cms 1x=${s._1}%5d ms  8x=${b._1}%5d ms  ratio=$ratio%.1f")
    assert(ratio < 24.0, f"cms super-linear: $ratio%.1f×")
    small.unpersist(); big.unpersist()
  }

  test("compaction scales near-linearly in rows at fixed partition count") {
    def stage(mult: Int, tag: String): String = {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft_scale_compact_$tag").toString
      spark.range(0L, 20000L * mult).select(
          col("id"),
          concat(lit("2024-01-"),
            lpad((col("id") % 10 + 1).cast("string"), 2, "0")).as("day"))
        .repartition(8)
        .write.partitionBy("day").parquet(s"$root/frag")
      root
    }
    def run(root: String) = timed(LayoutOps.compactDatePartitioned(
      spark, s"$root/frag", s"$root/compact", "day", 1L << 30).count())
    val warm = stage(1, "warm"); run(warm)
    val r1 = stage(1, "small"); val r8 = stage(8, "big")
    val s = run(r1); val b = run(r8)
    val ratio = b._1.toDouble / math.max(1, s._1)
    info(f"compaction 1x=${s._1}%5d ms  8x=${b._1}%5d ms  ratio=$ratio%.1f")
    assert(s._2 == 10L && b._2 == 10L)
    // per-partition job overhead is fixed (10 partitions both sides); the
    // 8x cost is the 8x bytes through the coalesce writers
    assert(ratio < 24.0, f"compaction super-linear: $ratio%.1f×")
    Seq(warm, r1, r8).foreach(r =>
      graft.tools.FsUtils.deleteRecursively(java.nio.file.Paths.get(r)))
  }
}
