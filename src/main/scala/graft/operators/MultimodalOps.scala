package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted metadata for one opaque media payload. The decode step itself
  * is STUBBED (no media codecs in this environment): `fakeDecodeDims`
  * derives deterministic pseudo-dimensions from the payload hash, standing
  * in for a real image/audio header parse. Everything around it — binary
  * column handling, typed Dataset plumbing, per-partition batching — is the
  * real production shape.
  */
case class MediaMeta(doc_id: Long, n_bytes: Long, content_hash: Long,
    width: Int, height: Int, batch_index: Int)

/** Multimodal-column plumbing: media as opaque `BinaryType` columns with
  * typed metadata extraction. On a real cluster the decode callback would
  * call into a codec (per-partition, batched, so library init amortizes);
  * here the codec is a deterministic stub, clearly marked.
  *
  * Scale shape: per-row map work, no shuffle; partitions process payloads in
  * fixed-size batches so peak memory is bounded by batch size × payload
  * size, not partition size.
  */
object MultimodalOps {

  /** Attach a binary payload column derived from text (the harness ships no
    * real media; utf-8 bytes stand in for an image/audio blob).
    */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** STUB decode: pseudo width/height from a stable 64-bit content hash.
    * A real implementation parses the media header here; the signature and
    * batching are what production code keeps.
    */
  private def fakeDecodeDims(hash: Long): (Int, Int) = {
    val w = 64 + (math.floorMod(hash, 1024L)).toInt
    val h = 64 + (math.floorMod(hash >>> 10, 1024L)).toInt
    (w, h)
  }

  private def fnv64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Decode metadata per payload via per-partition batched iteration —
    * the Spark-side plumbing (schema, partitioning, batch shape) a real
    * media pipeline needs; only the innermost dims call is the stub.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
      batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batched so a real decoder could vectorize / reuse buffers;
        // batch_index is the row's 1-based batch ordinal within its partition
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
          batch.map { case (id, payload) =>
            val h = fnv64(payload)
            val (w, ht) = fakeDecodeDims(h)
            MediaMeta(id, payload.length.toLong, h, w, ht, bi + 1)
          }
        }
      }
  }

  /** STUB feature extraction: a fixed-dimension embedding derived from the
    * payload bytes (a real pipeline calls an encoder here). Pure per-row
    * column expressions — codegen'd, no shuffle, linear to corpus size.
    */
  def withPayloadEmbedding(df: DataFrame, dim: Int): DataFrame =
    df.withColumn("payload_embedding",
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(xxhash64(col("payload"), i), lit(1000L)).cast("double") / 500.0 - 1.0))

  /** Resize planning: target dims preserving aspect ratio under a max edge.
    * Metadata-only arithmetic (the pixel work happens inside the decode
    * callback on a real cluster); demonstrates the typed transform layer.
    */
  def withResizePlan(meta: DataFrame, maxEdge: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxEdge) / greatest(col("width"), col("height")).cast("double"))
    meta
      .withColumn("resize_scale", round(scale, 6))
      .withColumn("out_width", floor(col("width") * scale).cast("int"))
      .withColumn("out_height", floor(col("height") * scale).cast("int"))
  }

  /** STUB frame sampling for video-like payloads: treat the payload as
    * `frameSize`-byte frames and keep every `stride`-th — one row per kept
    * frame with its offset and a content hash. The explode shape (one
    * input row → bounded frame rows) is the real pipeline's; only the
    * frame parse is fake.
    */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
      frameSize: Int, stride: Int): DataFrame = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, payload) =>
        val nFrames = math.max(1, payload.length / frameSize)
        (0 until nFrames by stride).map { f =>
          val from = f * frameSize
          val until = math.min(payload.length, from + frameSize)
          (id, f, from, fnv64(java.util.Arrays.copyOfRange(payload, from, until)))
        }
      }
      .toDF(idCol, "frame_idx", "byte_offset", "frame_hash")
  }
}
