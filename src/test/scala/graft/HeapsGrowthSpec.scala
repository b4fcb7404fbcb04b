package graft

import graft.operators.TextOps

/** Heaps'-law growth card (q250): hand-computed vocabulary curve and β
  * exponents on a 4-doc corpus.
  */
class HeapsGrowthSpec extends SparkSpec {
  import spark.implicits._

  test("heapsGrowthCard: hand-computed checkpoints and beta") {
    // ids 1..4, checkpoints 25/50/100 → cutoffs at id 1, 2, 4
    val docs = Seq((1L, "a b"), (2L, "a c"), (3L, "c d"), (4L, "a e"))
      .toDF("doc_id", "text")
    val rows = TextOps.heapsGrowthCard(docs, "doc_id", "text",
      Seq(25, 50, 100)).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(25L, 50L, 100L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L))   // n_docs
    assert(rows.map(_.getLong(2)).toSeq == Seq(2L, 4L, 8L))   // n_tokens
    assert(rows.map(_.getLong(3)).toSeq == Seq(2L, 3L, 5L))   // n_vocab
    assert(rows(0).isNullAt(4), "first checkpoint has no beta")
    // beta = ln(V2/V1)/ln(N2/N1)
    assert(rows(1).getDouble(4) ==
      math.rint(math.log(3.0 / 2.0) / math.log(4.0 / 2.0) * 1e6) / 1e6)
    assert(rows(2).getDouble(4) ==
      math.rint(math.log(5.0 / 3.0) / math.log(8.0 / 4.0) * 1e6) / 1e6)
  }

  test("heapsGrowthCard: vocab and tokens are monotone, final vocab " +
      "equals corpus distinct tokens") {
    val docs = (1L to 40L).map(i =>
      (i, s"w${i % 7} w${i % 11} common")).toDF("doc_id", "text")
    val rows = TextOps.heapsGrowthCard(docs, "doc_id", "text").collect()
    val vs = rows.map(_.getLong(3)).toSeq
    val ts = rows.map(_.getLong(2)).toSeq
    assert(vs == vs.sorted && ts == ts.sorted)
    assert(vs.last == 12L) // w0..w10 (the %7 set is a subset) + "common"
  }
}
