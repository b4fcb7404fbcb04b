package graft

import org.apache.spark.sql.functions._
import graft.operators._
import graft.metrics.MetricQueries

/** Empty-input and degenerate-shape behavior of the round-2 operators: a
  * library operator must degrade to an empty/identity answer, never throw,
  * when a filter upstream leaves nothing — the normal situation in a
  * partitioned 100 TB run where some partitions are empty.
  */
class EdgeCasesRound2Spec extends SparkSpec {
  import spark.implicits._

  private val emptyDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")

  test("packSequences on an empty frame returns empty with pack_id column") {
    val out = SplitOps.packSequences(
      Seq.empty[(Long, String, Long)].toDF("id", "src", "n_tok"),
      "id", "src", "n_tok", 512L)
    assert(out.columns.contains("pack_id") && out.count() == 0)
  }

  test("calibrationBins on an empty frame returns zero bins") {
    val out = MetricQueries.calibrationBins(
      Seq.empty[(Double, Int)].toDF("score", "label"), "score", "label", 10)
    assert(out.count() == 0)
  }

  test("contaminatedIds with an empty benchmark flags nothing") {
    val corpus = Seq((1L, "a b c d")).toDF("doc_id", "text")
    assert(DedupOps.contaminatedIds(corpus, emptyDocs, "doc_id", "text", 3)
      .count() == 0)
  }

  test("intervalJoinBucketed with empty anchors yields no rows") {
    val fact = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1.0))
      .toDF("k", "ts", "v")
    val anchors = Seq.empty[(Long, java.sql.Timestamp)].toDF("ak", "ats")
    assert(FuzzyJoins.intervalJoinBucketed(fact, anchors, "k", "ak", "ts",
      "ats", 3600000000L, 3600000000L, 3600000000L).count() == 0)
  }

  test("compactLatest/compactWithDeletes on empty input return empty") {
    val empty = Seq.empty[(Long, Long, String)].toDF("k", "v", "op")
    assert(CdcOps.compactLatest(empty, Seq("k"), Seq("v")).count() == 0)
    assert(CdcOps.compactWithDeletes(empty, Seq("k"), Seq("v"),
      d => d("op") === "D").count() == 0)
  }

  test("connectedComponents with empty edges and empty nodes returns empty") {
    val edges = Seq.empty[(Long, Long)].toDF("a", "b")
    val nodes = Seq.empty[Long].toDF("v")
    assert(GraphOps.connectedComponents(edges, "a", "b", Some(nodes))
      .count() == 0)
  }

  test("tfIdfTopTerms on a single one-word document") {
    val out = TextOps.tfIdfTopTerms(Seq((1L, "word")).toDF("doc_id", "text"),
      "doc_id", "text", 3).collect()
    assert(out.length == 1 && out.head.getAs[String]("term") == "word")
  }

  test("knnJoin with an empty corpus yields no neighbors") {
    val q = Seq((1L, Seq(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    assert(SimilarityOps.knnJoin(empty, q, "vec_id", "embedding",
      "vec_id", "embedding", 3).count() == 0)
  }
}
