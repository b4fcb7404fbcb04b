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
