package graft

import graft.operators.DedupOps

/** Exact-substring span scrub (q238): hand-computed cross-doc and
  * within-doc duplicated spans, overlap merging, short-doc passthrough,
  * and fingerprint equality for identical scrub results.
  */
class SpanScrubSpec extends SparkSpec {
  import spark.implicits._

  test("duplicateSpanScrub hand-checked: cross-doc, within-doc, overlaps") {
    val docs = Seq(
      (1L, "a b c d e x y"),          // shares "a b c d e" with doc 2
      (2L, "p q a b c d e r"),
      (3L, "s t u v"),                // < n tokens: untouched
      (4L, "m n o p q z m n o p q"),  // repeats its own 5-gram
      (5L, "a a a a a a"),            // overlapping dup grams with doc 6
      (6L, "a a a a a a")
    ).toDF("doc_id", "text")
    val r = DedupOps.duplicateSpanScrub(docs, "doc_id", "text",
        n = 5, minCount = 2L)
      .collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4))).toMap

    assert(r(1)._1 == 7L && r(1)._2 == 5L && r(1)._3 == 1L)   // "x y" left
    assert(r(2)._1 == 8L && r(2)._2 == 5L && r(2)._3 == 1L)   // "p q r"
    assert(r(3) == ((4L, 0L, 0L, r(3)._4)))                   // untouched
    // within-doc: both occurrences covered, only "z" survives
    assert(r(4)._1 == 11L && r(4)._2 == 10L && r(4)._3 == 2L)
    // overlapping grams merge into one fully-covered span
    assert(r(5)._1 == 6L && r(5)._2 == 6L && r(5)._3 == 2L)
    assert(r(6)._2 == 6L)
    // identical scrub results carry identical fingerprints (docs 5/6
    // both clean to the empty string)
    assert(r(5)._4 == r(6)._4)
    // doc 3 keeps its full text: fingerprint differs from the empty one
    assert(r(3)._4 != r(5)._4)
  }

  test("duplicateSpanScrub leaves a dup-free corpus untouched") {
    val docs = Seq((1L, "one two three four five six"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val r = DedupOps.duplicateSpanScrub(docs, "doc_id", "text").collect()
    assert(r.forall(x => x.getLong(2) == 0L && x.getLong(3) == 0L))
  }
}
