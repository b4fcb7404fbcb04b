package graft

import org.apache.spark.sql.functions._
import graft.operators.{BpeOps, SplitOps, TextOps}

/** Epoch shard manifest (q242) and BPE fertility card (q243): epoch
  * permutation determinism + distinctness, shard coverage, and fertility
  * coherence with the per-doc encode.
  */
class EpochShardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("epochShardManifest: deterministic per epoch, distinct across epochs") {
    val docs = Tables.load(spark, dir, "documents")
    def manifest(d: org.apache.spark.sql.DataFrame, epoch: Long) =
      SplitOps.epochShardManifest(d, "doc_id",
        size(TextOps.tokens(col("text"))), nShards = 8, epoch = epoch)
    val e1a = manifest(docs, 1L).collect().toSeq
    val e1b = manifest(docs.repartition(11), 1L).collect().toSeq
    assert(e1a == e1b, "the epoch permutation must not depend on layout")
    val e2 = manifest(docs, 2L).collect().toSeq
    // a different epoch is a DIFFERENT permutation: order fingerprints
    // (and generally shard assignment) change...
    assert(e1a.map(_.getString(4)).toSet != e2.map(_.getString(4)).toSet)
    // ...but the corpus totals are epoch-invariant
    def totals(rows: Seq[org.apache.spark.sql.Row]) =
      (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(totals(e1a) == totals(e2))
    assert(totals(e1a)._1 == docs.count())
  }

  test("q243 fertility card coheres with the per-doc encode") {
    val docs = Tables.load(spark, dir, "documents")
    val card = SparkEntry.queries("q243_bpe_fertility")(spark, dir)
      .collect()
    assert(card.map(_.getLong(1)).sum == 500L)
    // every word is at least one subword, so fertility >= 1 everywhere
    assert(card.forall(_.getDouble(4) >= 1.0))
    // per-lang sums must equal the q235 per-doc totals
    val merges = BpeOps.bpeMerges(docs, "text", rounds = 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val enc = BpeOps.bpeEncode(docs, "doc_id", "text", merges)
    val (w, s) = (enc.agg(sum(col("n_words"))).head().getLong(0),
      enc.agg(sum(col("n_subwords"))).head().getLong(0))
    assert(card.map(_.getLong(2)).sum == w)
    assert(card.map(_.getLong(3)).sum == s)
  }
}
