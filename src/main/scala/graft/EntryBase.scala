package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Stats._
import graft.metrics.MetricQueries
import graft.ml.MlPipelines
import graft.operators._

/** Shared helpers for the [[SparkEntry]] query surface, split by file so
  * no single entry file exceeds the 3 kLoC audit bound: the table loader
  * plus every private helper referenced from more than one query family.
  * The family traits chain linearly (Part1 <: Base, ..., SparkEntry <:
  * Part4) purely as a file-organization device — the object's public
  * surface and the `queries`/`oracleSql` contract are unchanged.
  */
private[graft] trait EntryBase {

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  // ---------------------------------------------------------------- q18
  // Confusion matrix (reference X6) over deterministic label/pred.
  protected def labeledOrders(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("label", (col("o_totalprice") > 150000).cast("int"))
      .withColumn("pred", ((col("o_orderkey") % 7) < 3).cast("int"))

  /** Blocked cosine near-dup pair generation shared by q37/q67/q72 (the
    * vec_id < 200 block bounds the all-pairs oracle; their DuckDB oracles
    * reproduce this recipe verbatim, so any change here must touch all
    * three oracle strings too).
    */
  protected def cosineEdges(spark: SparkSession, dir: String,
      minCosine: Double): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val l = e.select(col("vec_id").as("id_a"), col("emb").as("ea"))
    val r = e.select(col("vec_id").as("id_b"), col("emb").as("eb"))
    l.join(r, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(SimilarityOps.cosineNative(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  // lineitem has no binary label; derive one deterministically for q106
  protected def withReturnFlagBin(df: DataFrame): DataFrame =
    df.withColumn("l_returnflag_bin",
      (col("l_returnflag") =!= "N").cast("double"))

  // shared by q122 (Kaplan–Meier) and q376 (Nelson–Aalen): days from
  // each user's first signup to their first subsequent purchase,
  // right-censored at the corpus horizon
  protected def signupPurchaseDurations(spark: SparkSession,
      dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("__h"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__s"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .join(broadcast(signup), "user_id")
      .filter(unix_micros(col("ts")) >= col("__s"))
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__p"))
    signup
      .join(firstPurchase, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        expr("coalesce(__p, __h) - __s").as("__dur_us"),
        col("__p").isNotNull.as("__event"))
      .select(expr("__dur_us div 86400000000").as("dur_days"),
        col("__event"))
  }

  /** The per-document scoring stage of the curation capstone — pure
    * per-row projections (quality, language-ID, content hash), the part
    * that is embarrassingly incremental and runs per micro-batch in the
    * q184 streaming twin.
    */
  protected def curationScore(d: DataFrame): DataFrame = {
    import graft.operators.TextOps
    TextOps.withLangId(TextOps.withQuality(d, "text", Seq("the", "a")), "text")
      .withColumn("h", md5(col("text")))
  }

  /** The corpus-global tail of the curation capstone (gate → dedup →
    * decontaminate → sample → manifest), shared verbatim by the batch
    * q160 and the streaming-ingest q184 so both converge to the same
    * manifest by construction.
    */
  protected def curationManifest(spark: SparkSession, dir: String,
      scored: DataFrame): DataFrame = {
    import graft.operators.{DedupOps, SplitOps}
    val d = t(spark, dir, "documents")
    val kept = scored
      .filter(col("quality_score") >= 0.5 && col("lang_pred") === "en")
    val canon = kept.join(
        kept.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id")), "h")
      .filter(col("doc_id") === col("keep_id"))
    val bench = d.filter(col("source") === "src0")
    val corpus0 = canon.filter(col("source") =!= "src0")
    // 5-gram overlap: the decontamination grain real pipelines use —
    // 3-grams false-hit on common phrases and would wipe the corpus
    // (77 of 79 clean at 5; 2 of 79 at 3 — measured)
    val contaminated =
      DedupOps.contaminatedIds(corpus0, bench, "doc_id", "text", 5)
    val clean = corpus0.join(contaminated, Seq("doc_id"), "left_anti")
    val sampled = SplitOps.prioritySample(
      clean.select(col("doc_id"), col("source"), col("n_chars"),
        col("n_tokens")),
      "doc_id", "n_chars", k = 60)
    val fp = graft.operators.ProfileOps.contentFingerprint(
      sampled, Seq("doc_id"))
    sampled.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .crossJoin(broadcast(fp.select(col("fingerprint"))))
      .orderBy(col("source"))
  }

  /** Deterministic PII planting for q231/q233: the synthetic corpus is
    * PII-free word soup, so both engines graft identical synthetic
    * identifiers from doc_id arithmetic (the q40 constructed-column
    * convention) — detection then has real positives to find and the
    * redaction fingerprint checks the exact scrubbed text.
    */
  protected def piiAugment(docs: DataFrame): DataFrame =
    docs.withColumn("aug_text", concat(
      col("text"),
      when(col("doc_id") % 7 === 0,
        concat(lit(" contact user"), col("doc_id"),
          lit("@mail.example.com ok"))).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        concat(lit(" dial "), lit(100L) + col("doc_id") % 900,
          lit("-"), lit(1000L) + col("doc_id") % 9000))
        .otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        concat(lit(" node 10."), col("doc_id") % 256, lit("."),
          (col("doc_id") * 7) % 256, lit("."),
          (col("doc_id") * 13) % 256, lit(" up"))).otherwise(lit("")),
      when(col("doc_id") % 17 === 0,
        concat(lit(" id "), lit(100L) + col("doc_id") % 900, lit("-"),
          lit(10L) + col("doc_id") % 90, lit("-"),
          lit(1000L) + col("doc_id") % 9000, lit(" end")))
        .otherwise(lit(""))))

  /** The q231/q233 shared card plan: plant → detect/redact → per-source
    * additive sums (counts per kind, docs-with-PII, char delta, and a
    * 60-bit-hash fingerprint of every redacted text — so the oracle
    * checks the exact scrub output, not just match counts). Runs
    * unchanged on a batch frame or an unbounded stream.
    */
  protected def piiCard(docs: DataFrame): DataFrame = {
    val det = TextOps.piiRedact(piiAugment(docs), "aug_text")
    det.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_email")).as("n_email"),
        sum(col("n_ssn")).as("n_ssn"),
        sum(col("n_ipv4")).as("n_ipv4"),
        sum(col("n_phone")).as("n_phone"),
        sum(when(col("n_email") + col("n_ssn") + col("n_ipv4") +
          col("n_phone") > 0, 1L).otherwise(0L)).as("docs_with_pii"),
        sum(length(col("aug_text")).cast("long") -
          length(col("redacted")).cast("long")).as("char_delta"),
        sum(conv(substring(md5(col("redacted")), 1, 15), 16, 10)
          .cast("long") % lit(1000000007L)).as("redact_fp"))
  }

  /** The q122/q299 signup→first-purchase duration frame: per signup
    * user, days to first purchase (or censoring horizon), the observed
    * flag, and the even/odd-id cohort covariate.
    */
  protected def signupDurations(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    val horizon = ev.agg(max(unix_micros(col("ts"))).as("__h"))
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__s"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .join(broadcast(signup), "user_id")
      .filter(unix_micros(col("ts")) >= col("__s"))
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("__p"))
    signup
      .join(firstPurchase, Seq("user_id"), "left")
      .crossJoin(broadcast(horizon))
      .select(
        col("user_id"),
        expr("coalesce(__p, __h) - __s").as("__dur_us"),
        col("__p").isNotNull.as("__event"))
      .select(expr("__dur_us div 86400000000").as("dur_days"),
        col("__event"), (col("user_id") % 2 === 0).as("__cohort_a"))
  }

  protected def sqlQ(spark: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerViews(spark, dir)
    spark.sql(text)
  }

  protected def amsKeyed(df: DataFrame): DataFrame =
    df.filter(col("event_type").isNotNull)
      .select(concat_ws(":", col("user_id"), col("event_type")).as("k"))

  protected def amsExact(keyed: DataFrame): DataFrame =
    keyed.groupBy(col("k")).agg(count(lit(1)).as("f"))
      .agg(sum(col("f").cast("decimal(38,0)") *
        col("f").cast("decimal(38,0)")).cast("long").as("f2_exact"))
}
