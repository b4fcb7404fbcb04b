package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Extracted metadata for one opaque media payload. `format` is the real
  * container sniffed from magic bytes (png/gif/jpeg/wav) with true header
  * dimensions; unrecognized payloads fall back to the documented
  * deterministic stub (`format = "unknown"`). For images (width, height)
  * are pixels; for wav they carry (sample_rate, n_channels).
  */
case class MediaMeta(doc_id: Long, n_bytes: Long, content_hash: Long,
    format: String, width: Int, height: Int, batch_index: Int)

/** Multimodal-column plumbing: media as opaque `BinaryType` columns with
  * typed metadata extraction. The header decode is a REAL pure-JVM parse of
  * the common container formats (PNG/GIF/JPEG/WAV magic bytes +
  * dimensions); full pixel/sample decode would call a codec library here
  * (per-partition, batched, so library init amortizes) — payloads in
  * formats this parser doesn't know get deterministic stub dimensions,
  * clearly tagged `format = "unknown"`.
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

  private def beShort(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def beInt(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def leShort(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def leInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Real header parse from magic bytes: PNG (IHDR big-endian dims), GIF
    * (logical-screen little-endian dims), JPEG (scan segments to the first
    * SOFn frame header), WAV (RIFF/WAVE fmt chunk → (sample_rate,
    * channels)). Returns (format, width-like, height-like); None for
    * unrecognized bytes.
    */
  def parseHeader(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
        b(2) == 'N' && b(3) == 'G')
      Some(("png", beInt(b, 16), beInt(b, 20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("gif", leShort(b, 6), leShort(b, 8)))
    else if (b.length >= 28 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == 'F' && b(8) == 'W' && b(9) == 'A' && b(10) == 'V' &&
        b(11) == 'E')
      Some(("wav", leInt(b, 24), leShort(b, 22)))
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      jpegDims(b)
    else None

  /** Walk JPEG segments to the first start-of-frame marker (SOF0–SOF15
    * minus DHT/JPG/DAC) and read its [precision][height:2][width:2].
    * A 0xFF at the marker position is a fill/padding byte (the spec allows
    * any number between segments) — consume it one byte at a time rather
    * than misreading it as a length-prefixed segment.
    */
  private def jpegDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    var i = 2
    while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
      val marker = b(i + 1) & 0xff
      if (marker == 0xff) i += 1
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd8)) i += 2
      else if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
        return Some(("jpeg", beShort(b, i + 7), beShort(b, i + 5)))
      else i += 2 + beShort(b, i + 2)
    }
    None
  }

  /** Stub dims for UNRECOGNIZED payloads only: deterministic pseudo
    * width/height from the stable 64-bit content hash, in [64, 1088).
    */
  private def stubDims(hash: Long): (Int, Int) = {
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
    * media pipeline needs. Known containers get a REAL header parse; only
    * unrecognized bytes fall back to stub dims.
    */
  def decodeMeta(spark: SparkSession, df: DataFrame, idCol: String,
      batchSize: Int = 64): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // batched so a full pixel decoder could vectorize / reuse buffers;
        // batch_index is the row's 1-based batch ordinal within its partition
        it.grouped(batchSize).zipWithIndex.flatMap { case (batch, bi) =>
          batch.map { case (id, payload) =>
            val h = fnv64(payload)
            val (fmt, w, ht) = parseHeader(payload).getOrElse {
              val (sw, sh) = stubDims(h)
              ("unknown", sw, sh)
            }
            MediaMeta(id, payload.length.toLong, h, fmt, w, ht, bi + 1)
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
