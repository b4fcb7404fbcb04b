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
      .head().getAs[Array[Byte]](0)
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

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, baos), s"no $fmt writer")
    baos.toByteArray
  }

  private def wavBytes(sampleRate: Int, channels: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(44)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * channels * 2).putShort((channels * 2).toShort)
      .putShort(16.toShort)
      .put("data".getBytes("US-ASCII")).putInt(0)
    bb.array()
  }

  test("parseHeader reads true dimensions from genuinely-encoded files") {
    // fixtures produced by the JDK's own encoders, not handcrafted headers
    assert(MultimodalOps.parseHeader(imageBytes("png", 123, 45))
      .contains(("png", 123, 45)))
    assert(MultimodalOps.parseHeader(imageBytes("gif", 64, 17))
      .contains(("gif", 64, 17)))
    assert(MultimodalOps.parseHeader(imageBytes("jpg", 200, 99))
      .contains(("jpeg", 200, 99)))
    assert(MultimodalOps.parseHeader(wavBytes(44100, 2))
      .contains(("wav", 44100, 2)))
    assert(MultimodalOps.parseHeader("plain text".getBytes("UTF-8")).isEmpty)
  }

  test("parseHeader: JPEG 0xFF fill bytes between segments are skipped") {
    // the JPEG spec allows any number of 0xFF padding bytes before a
    // marker; inject two right after SOI — a parser that treats the pad as
    // a length-prefixed segment misadvances and loses the real dimensions
    val clean = imageBytes("jpg", 200, 99)
    val padded = clean.take(2) ++ Array(0xff.toByte, 0xff.toByte) ++ clean.drop(2)
    assert(MultimodalOps.parseHeader(padded).contains(("jpeg", 200, 99)))
  }

  test("decodeMeta: real containers get real dims, unknown payloads the stub") {
    val rows = Seq(
      (1L, imageBytes("png", 321, 77)),
      (2L, wavBytes(16000, 1)),
      (3L, "just text".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val meta = MultimodalOps.decodeMeta(spark, rows, "doc_id")
      .collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).format == "png")
    assert(meta(1L).width == 321 && meta(1L).height == 77)
    assert(meta(2L).format == "wav")
    assert(meta(2L).width == 16000 && meta(2L).height == 1)
    assert(meta(3L).format == "unknown")
    assert(meta(3L).width >= 64 && meta(3L).width < 1088)
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
