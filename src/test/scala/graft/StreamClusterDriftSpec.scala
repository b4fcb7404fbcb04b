package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Streaming cluster-occupancy drift (q254): the two-pass streamed card
  * equals the batch card row-for-row under DIFFERENT micro-batchings —
  * the min-k centroid merge and additive occupancy counts are both
  * batching-invariant, which is the whole contract.
  */
class StreamClusterDriftSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 150)
  private def sliceB = graft.operators.SplitOps
    .hashBucket(col("vec_id"), 20) >= 10

  private def streamWaves(waveOf: org.apache.spark.sql.Column,
      nWaves: Int): Seq[org.apache.spark.sql.Row] = {
    val root = java.nio.file.Files
      .createTempDirectory("graft_scd_spec").toString
    val tagged = emb.withColumn("__w", waveOf)
    val wavesDir = s"$root/waves"
    new java.io.File(wavesDir).mkdirs()
    (0 until nWaves).foreach { w =>
      val tmp = s"$root/w$w"
      tagged.filter(col("__w") === w).drop("__w")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(wavesDir, f"wave$w%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1000000L * (w + 1)))
    }
    graft.streaming.StreamingOps.streamingClusterDrift(
        spark, wavesDir, "vec_id", "embedding", sliceB,
        s"$root/store", nlist = 8)
      .orderBy(col("centroid_id")).collect().toSeq
  }

  test("streamed drift card equals batch under two different wave splits") {
    val batch = SimilarityOps.clusterOccupancyDrift(
        emb, "vec_id", "embedding", sliceB, nlist = 8)
      .orderBy(col("centroid_id")).collect().toSeq
    val b = graft.operators.SplitOps.hashBucket(col("vec_id"), 10)
    val s3 = streamWaves(
      when(b < 4, 0).when(b < 7, 1).otherwise(2), 3)
    assert(s3 == batch, "3-wave stream must equal batch")
    val s2 = streamWaves(when(col("vec_id") % 2 === 0, 0).otherwise(1), 2)
    assert(s2 == batch, "2-wave parity split must equal batch too")
  }
}
