package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** PII scrub (q231/q233) and hashed-vocabulary NB classifier (q232):
  * exact redaction strings on crafted positives/negatives, the
  * cross-pattern non-matches the inventory order relies on, hand-checked
  * NB predictions (including the prior-argmax fallback for token-empty
  * docs), and the streaming card ≡ batch card on the real fixture.
  */
class PiiAndNbSpec extends SparkSpec {
  import spark.implicits._

  private def redactOne(text: String): (String, Long, Long, Long, Long) = {
    val r = TextOps.piiRedact(Seq(text).toDF("t"), "t")
      .select("redacted", "n_email", "n_ssn", "n_ipv4", "n_phone")
      .head()
    (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  test("piiRedact replaces all four kinds with exact output") {
    val (red, e, s, i, p) =
      redactOne("reach jane.doe42@sub.example.org or 555-1234 thanks")
    assert(red == "reach <EMAIL> or <PHONE> thanks")
    assert((e, s, i, p) == ((1L, 0L, 0L, 1L)))

    val (red2, e2, s2, i2, p2) =
      redactOne("ssn 987-65-4321 and ip 10.0.255.7 here")
    assert(red2 == "ssn <SSN> and ip <IP> here")
    // the SSN must NOT also count as a phone (3-2-4 vs 3-4 shapes are
    // disjoint under \b), and redaction order keeps it that way
    assert((e2, s2, i2, p2) == ((0L, 1L, 1L, 0L)))
  }

  test("piiRedact negatives: digit-adjacent IP and bare numbers stay") {
    // 'x1.2.3.4' has no word boundary between x and 1 — not an IP match
    val (red, e, s, i, p) = redactOne("no pii just 12345 and x1.2.3.4 glued")
    assert(red == "no pii just 12345 and x1.2.3.4 glued")
    assert((e, s, i, p) == ((0L, 0L, 0L, 0L)))
  }

  test("piiRedact counts repeated matches and trims trailing punctuation") {
    val (red, _, _, _, p) = redactOne("double 111-2222 and 333-4444")
    assert(red == "double <PHONE> and <PHONE>")
    assert(p == 2L)
    // the domain backtracks off a trailing dot in both engines
    val (red2, e2, _, _, _) = redactOne("mail: bob@ex.co.")
    assert(red2 == "mail: <EMAIL>.")
    assert(e2 == 1L)
  }

  test("naiveBayesLangClassify hand-checked fixture + prior fallback") {
    // hashBucket(id, 20) < 4 (eval): ids 0-3; train: 4-19
    val docs = (
      (4 to 11).map(i => (i.toLong, "aa", "alpha alpha beta")) ++
      (12 to 19).map(i => (i.toLong, "bb", "gamma gamma delta")) ++
      Seq((0L, "aa", "alpha alpha"), (1L, "bb", "gamma delta gamma"),
        (2L, "aa", ""), (3L, "bb", "alpha"))
    ).toDF("doc_id", "lang", "text")
    val got = TextOps.naiveBayesLangClassify(
        docs, "doc_id", "lang", "text", buckets = 512, evalBuckets = 4)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSet
    // id0 aa→aa (alpha mass), id1 bb→bb, id3 bb→aa (alpha token),
    // id2 aa: token-empty → priors tie (8 vs 8) → class-asc pick "aa"
    assert(got == Set(("aa", "aa", 2L), ("bb", "aa", 1L), ("bb", "bb", 1L)))
  }

  test("naiveBayes model state is bounded by classes x buckets") {
    val docs = (0 to 19).map(i =>
      (i.toLong, if (i % 2 == 0) "aa" else "bb",
        s"tok$i tok${i * 7} tok${i * 13}")).toDF("doc_id", "lang", "text")
    // buckets=4 forces heavy hashing collisions: still exactly <= 2x4
    // model rows regardless of the 60-token vocabulary
    val out = TextOps.naiveBayesLangClassify(
      docs, "doc_id", "lang", "text", buckets = 4, evalBuckets = 4)
    assert(out.agg(sum(col("n_docs"))).head().getLong(0) == 4L)
  }

  test("streaming PII card equals the batch card row-for-row") {
    val dir = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("q231_pii_redaction")(spark, dir)
      .collect().toSeq
    val streamed = SparkEntry.queries("q233_stream_pii")(spark, dir)
      .collect().toSeq
    assert(streamed == batch)
  }
}
