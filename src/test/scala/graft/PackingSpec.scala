package graft

import graft.operators.SplitOps

/** Sequence-packing card (q248): hand-computed fragments on a tiny
  * corpus, and bucket-width invariance of the two-level prefix sum.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // L=5; token counts 3,4,1,6 → cum 3,7,8,14
  //  doc 1 ctx 0..0 → 1 frag; doc 2 ctx 0..1 → 2 (split)
  //  doc 3 ctx 1..1 → 1;      doc 4 ctx 1..2 → 2 (split)
  private val docs = Seq(
    (1L, "a b c"), (2L, "d e f g"), (3L, "h"),
    (4L, "i j k l m n")).toDF("doc_id", "text")

  test("packingCard: hand-computed card on a 4-doc corpus") {
    val r = SplitOps.packingCard(docs, "doc_id", "text",
      contextLen = 5, bucketWidth = 2).head()
    assert(r.getLong(0) == 4L)          // n_docs
    assert(r.getLong(1) == 14L)         // total_tokens
    assert(r.getLong(2) == 5L)          // context_len
    assert(r.getLong(3) == 3L)          // n_contexts = ceil(14/5)
    assert(r.getLong(4) == 2L)          // n_docs_split
    assert(r.getLong(5) == 6L)          // n_fragments
    assert(r.getLong(6) == 1L)          // tail waste = 15 - 14
    assert(r.getDouble(7) == 0.5)       // split_frac
  }

  test("packingCard: card is invariant to the prefix-sum bucket width") {
    val wide = SplitOps.packingCard(docs, "doc_id", "text", 5, 1000).head()
    val narrow = SplitOps.packingCard(docs, "doc_id", "text", 5, 1).head()
    assert(wide == narrow)
  }

  test("tokenShardPlan: docs land in the shard of their start offset, " +
      "mass partitions exactly") {
    // token counts 3,4,1,6 → starts 0,3,7,8; shardTokens 5 →
    // shards 0,0,1,1
    val rows = SplitOps.tokenShardPlan(docs, "doc_id", "text",
      shardTokens = 5L, bucketWidth = 2).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(2L, 2L))   // n_docs
    assert(rows.map(_.getLong(2)).toSeq == Seq(7L, 7L))   // n_tokens
    assert(rows.map(_.getLong(2)).sum == 14L)
    assert(rows.head.getDouble(4) == 0.4)                 // (7−5)/5
  }

  test("tokenShardPlan: plan is invariant to the prefix-sum bucket width") {
    val a = SplitOps.tokenShardPlan(docs, "doc_id", "text", 5L, 1000)
      .collect().toSeq
    val b = SplitOps.tokenShardPlan(docs, "doc_id", "text", 5L, 1)
      .collect().toSeq
    assert(a == b)
  }
}
