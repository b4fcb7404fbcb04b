package graft

import graft.operators.DedupOps

/** LSH quality card (q246): identical docs are guaranteed detected AND
  * true, card invariants hold, and disjoint corpora yield empty sets
  * with null rates.
  */
class LshQualitySpec extends SparkSpec {
  import spark.implicits._

  test("lshQualityCard: planted exact dup is detected and true") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, dup), (2L, dup),
      (3L, "one two three four five six seven"),
      (4L, "red green blue cyan magenta yellow black")
    ).toDF("doc_id", "text")
    val r = DedupOps.lshQualityCard(docs, "doc_id", "text").head()
    // identical texts share every band -> always a candidate; J = 1.0
    // -> always truth; so both sets contain (1,2) and the hit matches
    assert(r.getLong(3) >= 1L && r.getLong(2) >= 1L && r.getLong(4) >= 1L)
    assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
    assert(r.getLong(1) == 6L) // 4 docs -> 6 possible pairs
    val (p, rec) = (r.getDouble(5), r.getDouble(6))
    assert(p >= 0.0 && p <= 1.0 && rec >= 0.0 && rec <= 1.0)
  }

  test("lshQualityCard: empty truth with detected pairs gives 0 hits, " +
      "0.0 precision (not null)") {
    // identical docs are ALWAYS banded candidates; an unreachable
    // threshold empties the truth set while detection stays non-empty —
    // the oracle coalesces n_hit to 0, so the Spark side must too
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq((1L, dup), (2L, dup),
      (3L, "one two three four five six seven")).toDF("doc_id", "text")
    val r = DedupOps.lshQualityCard(docs, "doc_id", "text",
      jaccardThreshold = 1.1).head()
    assert(r.getLong(2) >= 1L)  // n_detected: the (1,2) candidate
    assert(r.getLong(3) == 0L)  // n_truth empty
    assert(!r.isNullAt(4) && r.getLong(4) == 0L,
      "n_hit must coalesce to 0 on empty truth")
    assert(!r.isNullAt(5) && r.getDouble(5) == 0.0,
      "precision must be 0.0, not null, when candidates exist")
    assert(r.isNullAt(6), "recall stays null on 0 truth")
  }

  test("lshBandSweep: configs are nested — candidates shrink as rows " +
      "per band grow; exact dups survive every config") {
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, dup), (2L, dup),
      (3L, "one two three four five six seven"),
      (4L, "red green blue cyan magenta yellow black"),
      (5L, "one two three four five six eight")
    ).toDF("doc_id", "text")
    val rows = DedupOps.lshBandSweep(docs, "doc_id", "text").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    assert(rows.map(_.getLong(1)).toSeq == Seq(16L, 8L, 4L))
    // an 8-row band collision implies both 4-row halves collide →
    // det(8) ⊆ det(4) ⊆ det(2): counts must be non-increasing
    val det = rows.map(_.getLong(4)).toSeq
    assert(det == det.sorted.reverse, s"candidates must nest: $det")
    val hits = rows.map(_.getLong(6)).toSeq
    assert(hits == hits.sorted.reverse)
    // identical docs share EVERY band in every config
    rows.foreach(r => assert(r.getLong(4) >= 1L && r.getLong(6) >= 1L))
    // shared truth set across configs
    assert(rows.map(_.getLong(5)).distinct.length == 1)
  }

  test("lshQualityCard: disjoint corpus has empty truth, null recall") {
    val docs = Seq(
      (1L, "aa bb cc dd ee"), (2L, "ff gg hh ii jj"),
      (3L, "kk ll mm nn oo")).toDF("doc_id", "text")
    val r = DedupOps.lshQualityCard(docs, "doc_id", "text").head()
    assert(r.getLong(3) == 0L)            // no truth pairs
    assert(r.isNullAt(6), "recall must be null, not NaN, on 0 truth")
  }
}
