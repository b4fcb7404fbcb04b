package graft

import graft.operators.BpeOps

/** BPE trainer/encoder (q234/q235): hand-computed merge rounds on the
  * classic Sennrich corpus (including a three-way count tie resolved by
  * the left-symbol tiebreak), the overlap convention (counts include
  * overlaps, greedy merge applies fewer), and encode segmentation.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpeMerges hand-checked: classic corpus, tie broken on left sym") {
    // low x3, lower x2, newest x4, widest x1
    val docs = Seq("low low low lower", "lower newest newest",
      "newest newest widest").toDF("text")
    val m = BpeOps.bpeMerges(docs, "text", rounds = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    // round 1: w-e appears in lower(2) + newest(4) = 6 — the max
    assert(m(0) == ((1L, "w", "e", "we", 6L, 53L)))
    // round 2: l-o (5), s-t (5), t-</w> (5) tie; 'l' < 's' < 't'
    assert(m(1) == ((2L, "l", "o", "lo", 5L, 48L)))
  }

  test("bpeMerges counts overlaps but merges greedily left-to-right") {
    val docs = Seq("aaa aaa").toDF("text")
    val m = BpeOps.bpeMerges(docs, "text", rounds = 1).head()
    // word aaa x2: (a,a) occurs twice per word -> weighted count 4,
    // but greedy merge fires ONCE per word: 8 symbols -> 6, not 4
    assert((m.getString(1), m.getString(2), m.getLong(4), m.getLong(5)) ==
      (("a", "a", 4L, 6L)))
  }

  test("bpeEncode replays merges in order; empty table = chars+marker") {
    val docs = Seq((1L, "low lower")).toDF("doc_id", "text")
    val enc = BpeOps.bpeEncode(docs, "doc_id", "text",
      Seq(("w", "e"), ("l", "o"))).head()
    // low -> [lo, w, </w>] (w-e can't fire), lower -> [lo, we, r, </w>]
    assert((enc.getLong(1), enc.getLong(2)) == ((2L, 7L)))
    val raw = BpeOps.bpeEncode(docs, "doc_id", "text", Nil).head()
    // no merges: every word is chars + the </w> marker
    assert(raw.getLong(2) == ("lowlower".length + 2).toLong)
  }

  test("bpeEncode fingerprint distinguishes segmentations") {
    val d1 = Seq((1L, "abc")).toDF("doc_id", "text")
    val fpA = BpeOps.bpeEncode(d1, "doc_id", "text",
      Seq(("a", "b"))).head().getLong(3)
    val fpB = BpeOps.bpeEncode(d1, "doc_id", "text",
      Seq(("b", "c"))).head().getLong(3)
    // [ab, c, </w>] vs [a, bc, </w>]: same concatenation, different
    // segmentation — the separator-joined hash must tell them apart
    assert(fpA != fpB)
  }
}
