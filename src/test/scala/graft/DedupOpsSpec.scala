package graft

import org.apache.spark.sql.functions._
import graft.operators.DedupOps

class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"), // near dup
    (4L, "completely different words entirely unrelated content here"),
  ).toDF("doc_id", "text")

  test("exactGroups collapses identical texts to canonical min id") {
    val g = DedupOps.exactGroups(docs, "text", "doc_id")
      .orderBy("canonical_id").collect()
    assert(g.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (3L, 1L), (4L, 1L)))
  }

  test("minhash signatures identical for exact dups, differing for distinct docs") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 16)
      .orderBy("doc_id").collect()
    assert(sigs.length == 4)
    val s1 = sigs(0).toSeq.drop(1)
    val s2 = sigs(1).toSeq.drop(1)
    val s4 = sigs(3).toSeq.drop(1)
    assert(s1 == s2)
    assert(s1 != s4)
  }

  test("LSH banding finds exact-dup candidate pair, not unrelated docs") {
    val sigs = DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 16)
    val pairs = DedupOps.candidatePairs(
      DedupOps.lshBands(sigs, "doc_id", 16, 4), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard: exact similarity of shingle arrays") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    assert(df.select(DedupOps.jaccard($"x", $"y")).head().getDouble(0) == 0.5)
    val empty = Seq((Seq.empty[String], Seq.empty[String])).toDF("x", "y")
    assert(empty.select(DedupOps.jaccard($"x", $"y")).head().getDouble(0) == 0.0)
  }

  test("simhash: equal fingerprints for dups; hamming small for near-dups") {
    val fp = DedupOps.simhash64(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    val hNear = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    val hFar = java.lang.Long.bitCount(fp(1L) ^ fp(4L))
    assert(hNear < hFar)
  }

  test("hamming64 column expression matches bitCount") {
    val df = Seq((5L, 6L)).toDF("a", "b") // 101 ^ 110 = 011 → 2
    assert(df.select(DedupOps.hamming64($"a", $"b")).head().getInt(0) == 2)
  }

  test("contaminatedIds flags exactly the docs sharing a shingle with bench") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),   // shares "alpha beta gamma"
      (2L, "one two three four"),       // clean
      (3L, "x y alpha beta gamma")).toDF("doc_id", "text")
    val bench = Seq((99L, "alpha beta gamma epsilon")).toDF("doc_id", "text")
    val got = DedupOps.contaminatedIds(corpus, bench, "doc_id", "text", 3)
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("verifyCandidatePairs: hand-computed Levenshtein verdicts") {
    import SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown box"),
      (3L, "completely different content"), (4L, "nothing alike at all"),
      (5L, ""), (6L, "   "))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val r = DedupOps.verifyCandidatePairs(docs, pairs, "doc_id", "text")
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    // one substituted char over 19: sim = 1 - 1/19
    val p12 = r((1L, 2L))
    assert(p12.getAs[Long]("prefix_lev") == 1L)
    assert(p12.getAs[Double]("prefix_sim") ==
      math.rint((1.0 - 1.0 / 19.0) * 1e6) / 1e6)
    assert(p12.getAs[Long]("verified") == 1L)
    assert(r((3L, 4L)).getAs[Long]("verified") == 0L)
    // both prefixes empty after trim: distance 0, similarity defined as 1
    val p56 = r((5L, 6L))
    assert(p56.getAs[Long]("prefix_lev") == 0L)
    assert(p56.getAs[Double]("prefix_sim") == 1.0)
    assert(p56.getAs[Long]("verified") == 1L)
  }

  test("incrementalAdmission: exact dup rejected, novel admitted, batch-internal dups pass") {
    val kept = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // = kept 1
      (11L, "sphinx of black quartz judge my vow today"),   // novel
      (12L, "completely original content nothing shared here at all"),
      (13L, "completely original content nothing shared here at all"))
      .toDF("doc_id", "text")
    val r = DedupOps.incrementalAdmission(kept, batch, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(10L).getAs[Long]("admitted") == 0L,
      "an exact copy of a kept doc must be rejected")
    assert(r(10L).getAs[Long]("n_band_collisions") > 0L)
    assert(r(11L).getAs[Long]("admitted") == 1L)
    assert(r(12L).getAs[Long]("admitted") == 1L)
    // batch-internal duplicates are NOT this gate's job (q27 handles them)
    assert(r(13L).getAs[Long]("admitted") == 1L)
    assert(r.keySet == Set(10L, 11L, 12L, 13L))
  }
}
