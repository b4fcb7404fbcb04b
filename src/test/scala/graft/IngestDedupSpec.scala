package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Dedup-on-ingest capstone (q227): admission + Levenshtein verification
  * in one ingest stage over a persisted additive band store. Pins
  *   (1) the verification semantics on a planted fixture — an exact dup
  *       is rejected, a band-COLLIDING but textually distinct doc is
  *       rescued by verification (the false-positive gap q216's pure
  *       admission cannot close), a later dup of a KEPT doc is rejected
  *       while dups of a REJECTED doc are not re-blocked by it;
  *   (2) the streaming foreachBatch form ≡ the batch wave replay,
  *       row for row (deterministic wave files, maxFilesPerTrigger=1).
  */
class IngestDedupSpec extends SparkSpec {
  import spark.implicits._

  // 40 shared tokens; shingle-level overlap drives band collisions
  private val baseTokens = (1 to 40).map(i => s"tok$i")
  private val baseText = baseTokens.mkString(" ")
  // same shingle set minus one, but a radically different 200-char prefix:
  // bands collide, Levenshtein verification must NOT confirm
  private val prefixBomb = ("z" * 180) + " " + baseTokens.drop(1).mkString(" ")

  private def fixture = Seq(
    // wave 0 (seeds the store)
    (3L, 0, baseText),
    (5L, 0, "completely different words about weather patterns and storms today"),
    // wave 1
    (4L, 1, baseText),                     // exact dup of kept 3 → reject
    (7L, 1, prefixBomb),                   // bands collide, text differs → admit
    (9L, 1, "unrelated short document nine"),
    // wave 2
    (8L, 2, baseText),                     // dup of kept 3 → reject
    (11L, 2, "another unrelated document eleven entirely")
  ).toDF("doc_id", "wave_id", "text")

  test("admit-verify semantics: exact dup rejected, collision-only doc rescued") {
    val out = DedupOps.dedupIngestWaves(fixture, col("wave_id"),
        "doc_id", "text", waves = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    // wave 0 seeds: everything admitted with zero candidates
    assert(out(3L).getAs[Long]("admitted") == 1L)
    assert(out(5L).getAs[Long]("n_candidates") == 0L)
    // exact dup of a kept doc: banded AND verified → rejected
    assert(out(4L).getAs[Long]("n_verified") >= 1L)
    assert(out(4L).getAs[Long]("admitted") == 0L)
    // the prefix bomb: bands collide with doc 3 but the 200-char prefixes
    // are far apart — verification rescues it
    assert(out(7L).getAs[Long]("n_candidates") >= 1L,
      "fixture must produce a band collision for doc 7")
    assert(out(7L).getAs[Long]("n_verified") == 0L)
    assert(out(7L).getAs[Long]("admitted") == 1L)
    // wave 2 dup of doc 3 (kept): rejected. Note doc 4 was REJECTED and so
    // never entered the store — doc 8's candidates come from kept docs only
    assert(out(8L).getAs[Long]("admitted") == 0L)
    assert(out(9L).getAs[Long]("admitted") == 1L)
    assert(out(11L).getAs[Long]("admitted") == 1L)
  }

  test("streaming foreachBatch ingest converges to the batch wave replay") {
    val wavesDir = java.nio.file.Files
      .createTempDirectory("graft_ingest_waves").toString
    (0 until 3).foreach { w =>
      val tmp = java.nio.file.Files
        .createTempDirectory(s"graft_wave$w").toString
      fixture.filter(col("wave_id") === w).drop("wave_id")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = new java.io.File(wavesDir, f"wave$w%02d.parquet")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      // distinct ascending mtimes pin the micro-batch order = wave order
      assert(dst.setLastModified(1000000L * (w + 1)))
    }
    val storeRoot = java.nio.file.Files
      .createTempDirectory("graft_ingest_store").toString
    val streamed = graft.streaming.StreamingOps.streamingDedupIngest(
        spark, wavesDir, "doc_id", "text", storeRoot)
      .collect().map(_.toString).sorted.toSeq
    val batch = DedupOps.dedupIngestWaves(fixture, col("wave_id"),
        "doc_id", "text", waves = 3)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    // the persisted store holds exactly the admitted docs' prefixes
    val storedIds = spark.read.parquet(s"$storeRoot/texts")
      .select("doc_id").as[Long].collect().toSet
    assert(storedIds == Set(3L, 5L, 7L, 9L, 11L))
  }
}
