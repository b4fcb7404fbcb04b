package graft

import org.apache.spark.sql.functions._
import graft.operators.MultimodalOps

class MultimodalOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq((1L, "hello world"), (2L, "abc"), (3L, "hello world"))
    .toDF("doc_id", "text")

  test("withPayload attaches utf-8 binary payload") {
    val p = MultimodalOps.withPayload(docs, "text")
    assert(p.schema("payload").dataType.typeName == "binary")
    val bytes = p.filter($"doc_id" === 2L).select("payload")
      .head.getAs[Array[Byte]](0)
    assert(new String(bytes, "UTF-8") == "abc")
  }

  test("decodeMeta: deterministic metadata, stable across identical payloads") {
    val meta = MultimodalOps.decodeMeta(spark,
        MultimodalOps.withPayload(docs, "text"), "doc_id")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).n_bytes == 11L)
    assert(meta(2L).n_bytes == 3L)
    // identical payloads → identical hash and dims
    assert(meta(1L).content_hash == meta(3L).content_hash)
    assert(meta(1L).width == meta(3L).width && meta(1L).height == meta(3L).height)
    // stub dims are in the documented 64..1087 range
    assert(meta.values.forall(m => m.width >= 64 && m.width < 1088))
    assert(meta.values.forall(m => m.height >= 64 && m.height < 1088))
  }

  test("withPayloadEmbedding: fixed-dim deterministic embedding in [-1,1)") {
    val e = MultimodalOps.withPayloadEmbedding(
      MultimodalOps.withPayload(docs, "text"), dim = 8)
    val rows = e.select("doc_id", "payload_embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(rows.values.forall(_.size == 8))
    assert(rows.values.flatten.forall(v => v >= -1.0 && v < 1.0))
    assert(rows(1L) == rows(3L)) // same text → same embedding
  }

  test("withResizePlan: aspect-preserving downscale, never upscale") {
    val meta = Seq((1L, 2048, 1024), (2L, 100, 50)).toDF("doc_id", "width", "height")
    val out = MultimodalOps.withResizePlan(meta, maxEdge = 512)
      .orderBy("doc_id").collect()
    assert(out(0).getAs[Int]("out_width") == 512)
    assert(out(0).getAs[Int]("out_height") == 256)
    assert(out(1).getAs[Int]("out_width") == 100) // already small → untouched
    assert(out(1).getAs[Double]("resize_scale") == 1.0)
  }

  test("sampleFrames: strided frame rows with correct offsets") {
    val one = Seq((7L, "0123456789abcdef")).toDF("doc_id", "text")
    val frames = MultimodalOps.sampleFrames(spark,
      MultimodalOps.withPayload(one, "text"), "doc_id",
      frameSize = 4, stride = 2).orderBy("frame_idx").collect()
    // 16 bytes / 4 = 4 frames, stride 2 → frames 0 and 2
    assert(frames.map(_.getAs[Int]("frame_idx")).toSeq == Seq(0, 2))
    assert(frames.map(_.getAs[Int]("byte_offset")).toSeq == Seq(0, 8))
  }

  test("decodeMeta batches per partition (batch index populated)") {
    val many = (1L to 150L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      .repartition(1)
    val meta = MultimodalOps.decodeMeta(spark,
      MultimodalOps.withPayload(many, "text"), "doc_id", batchSize = 64)
    // 150 rows in one partition at batch 64 → batch indices 1,2,3
    assert(meta.select("batch_index").distinct().as[Int].collect().sorted
      .toSeq == Seq(1, 2, 3))
  }
}
