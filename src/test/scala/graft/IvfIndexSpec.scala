package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Persisted IVF index (q226): the index artifact round-trips losslessly,
  * the persisted search is row-identical to the in-memory path, the scan
  * statically prunes to the probed list directories, and incremental
  * appends against the frozen quantizer converge to the full build.
  */
class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.load(spark, dir, "embeddings")
    .filter(col("vec_id") < 120)

  test("persisted search is row-identical to the in-memory path and prunes partitions") {
    val cents = SimilarityOps.ivfCentroidsPortable(
      emb, "vec_id", "embedding", nlist = 8)
    val assigned = SimilarityOps.ivfAssign(
      emb, "vec_id", "embedding", cents, simRound = Some(6))
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_spec").toString
    SimilarityOps.writeIvfIndex(assigned, cents, root)
    val (ia, ic) = SimilarityOps.readIvfIndex(spark, root)
    // lossless round-trip of the assignment frame itself
    assert(ia.columns.toSeq == assigned.columns.toSeq)
    assert(ia.count() == assigned.count())

    val queries = emb.filter(col("vec_id") < 10)
    def run(a: org.apache.spark.sql.DataFrame,
        c: org.apache.spark.sql.DataFrame, prune: Boolean) =
      SimilarityOps.ivfSearchBatch(a, "vec_id", queries, "vec_id",
        "embedding", c, nprobe = 3, k = 3, excludeSameId = true,
        simRound = Some(6), pruneByList = prune)
    val mem = run(assigned, cents, prune = false)
      .collect().map(_.toString).sorted.toSeq
    val per = run(ia, ic, prune = true)
    val got = per.collect().map(_.toString).sorted.toSeq
    assert(got == mem)

    // plan audit: the probed list ids reach the scan as STATIC partition
    // filters (the index layout pays off as directory pruning), and the
    // persisted path never re-draws centroids (no congruential __draw)
    val plan = per.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("assigned"))
      .orElse(plan.linesIterator.find(_.contains("PartitionFilters: [")))
    assert(scanLine.exists(_.contains("centroid_id")),
      s"expected centroid_id partition filters on the index scan:\n$plan")
    assert(!plan.contains("__draw"),
      "persisted path must not re-derive centroids from the corpus")
  }

  test("streamingIvfIngest: streamed index equals the frozen-wave-0 batch build") {
    val b = graft.operators.SplitOps.hashBucket(col("vec_id"), 10)
    val tagged = emb.withColumn("__w",
      when(b < 4, 0).when(b < 7, 1).otherwise(2))
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_stream").toString
    val wavesDir = s"$root/waves"
    new java.io.File(wavesDir).mkdirs()
    (0 until 3).foreach { w =>
      val tmp = s"$root/w$w"
      tagged.filter(col("__w") === w).drop("__w")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(wavesDir, f"wave$w%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1000000L * (w + 1)))
    }
    graft.streaming.StreamingOps.streamingIvfIngest(
      spark, wavesDir, "vec_id", "embedding", s"$root/index", nlist = 8)
    val (streamed, cents) = graft.streaming.StreamingOps
      .readStreamedIvfIndex(spark, s"$root/index", "vec_id")
    // batch reference: quantizer drawn from wave 0 only, frozen, full
    // corpus assigned against it
    val w0cents = SimilarityOps.ivfCentroidsPortable(
      tagged.filter(col("__w") === 0), "vec_id", "embedding", nlist = 8)
    val ref = SimilarityOps.ivfAssign(emb, "vec_id", "embedding",
        w0cents, simRound = Some(6))
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toSet
    val got = streamed.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toSet
    assert(got == ref)
    assert(got.size == emb.count())
    // the frozen quantizer round-trips exactly
    assert(cents.select("centroid_id").as[Int].collect().sorted.toSeq ==
      (0 until 8))
  }

  test("streamingIvfIngest: kill mid-stream, resume from the checkpoint, converge") {
    val b = graft.operators.SplitOps.hashBucket(col("vec_id"), 10)
    val tagged = emb.withColumn("__w",
      when(b < 3, 0).when(b < 6, 1).when(b < 8, 2).otherwise(3))
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_resume").toString
    val wavesDir = s"$root/waves"
    new java.io.File(wavesDir).mkdirs()
    (0 until 4).foreach { w =>
      val tmp = s"$root/w$w"
      tagged.filter(col("__w") === w).drop("__w")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(wavesDir, f"wave$w%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      assert(dst.setLastModified(1000000L * (w + 1)))
    }
    // phase 1: the query DIES in the worst crash window — batch 2's sink
    // write landed but its checkpoint commit never happened
    val crashed = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
      graft.streaming.StreamingOps.streamingIvfIngest(
        spark, wavesDir, "vec_id", "embedding", s"$root/index", nlist = 8,
        failAtBatch = Some(2L))
    }
    assert(crashed.getMessage.contains("injected crash"))
    // the orphaned batch-2 state is on disk (sink wrote before the kill)
    assert(new java.io.File(s"$root/index/assigned/batch=2").isDirectory)
    val centsBefore = spark.read.parquet(s"$root/index/centroids")
      .orderBy("centroid_id").collect().toSeq
    // phase 2: restart from the SAME checkpoint — batches 0/1 are NOT
    // reprocessed, batch 2 retries (overwriting its own orphaned state),
    // batch 3 runs, and the quantizer is never redrawn
    graft.streaming.StreamingOps.streamingIvfIngest(
      spark, wavesDir, "vec_id", "embedding", s"$root/index", nlist = 8)
    val centsAfter = spark.read.parquet(s"$root/index/centroids")
      .orderBy("centroid_id").collect().toSeq
    assert(centsAfter == centsBefore,
      "resume must keep the frozen wave-0 quantizer, not redraw it")
    // exactly one state directory per batch — the retry replaced, never
    // duplicated
    val batchDirs = new java.io.File(s"$root/index/assigned").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getName).sorted.toSeq
    assert(batchDirs == Seq("batch=0", "batch=1", "batch=2", "batch=3"))
    // convergence: the recovered index equals the uninterrupted reference
    val (streamed, _) = graft.streaming.StreamingOps
      .readStreamedIvfIndex(spark, s"$root/index", "vec_id")
    val w0cents = SimilarityOps.ivfCentroidsPortable(
      tagged.filter(col("__w") === 0), "vec_id", "embedding", nlist = 8)
    val ref = SimilarityOps.ivfAssign(emb, "vec_id", "embedding",
        w0cents, simRound = Some(6))
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toSet
    val got = streamed.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toSet
    assert(got == ref)
    assert(got.size == emb.count(), "no row lost or duplicated by the crash")
  }

  test("appendIvfIndex: incremental batches equal the frozen-centroid full build") {
    val batch1 = emb.filter(col("vec_id") < 60)
    val batch2 = emb.filter(col("vec_id") >= 60)
    val cents = SimilarityOps.ivfCentroidsPortable(
      batch1, "vec_id", "embedding", nlist = 8)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivf_append").toString
    SimilarityOps.writeIvfIndex(
      SimilarityOps.ivfAssign(batch1, "vec_id", "embedding", cents,
        simRound = Some(6)),
      cents, root)
    SimilarityOps.appendIvfIndex(spark, batch2, "vec_id", "embedding",
      root, simRound = Some(6))
    val (ia, _) = SimilarityOps.readIvfIndex(spark, root)
    // the incremental index must equal assigning the FULL corpus against
    // the frozen batch-1 quantizer (appends never recluster)
    val full = SimilarityOps.ivfAssign(emb, "vec_id", "embedding", cents,
      simRound = Some(6))
      .select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toSet
    val got = ia.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toSet
    assert(got == full)
    assert(got.size == emb.count())
  }
}
