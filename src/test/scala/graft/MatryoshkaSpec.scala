package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** Matryoshka truncation-recall card (q240): a fixture where the short
  * prefix provably inverts the ranking, and the full-dim sanity row.
  */
class MatryoshkaSpec extends SparkSpec {
  import spark.implicits._

  test("matryoshkaRecallCard: misleading prefix scores 0, full dim 1") {
    // query 0 = (1,0,0,10); n1's 2-dim prefix matches perfectly but its
    // full vector points away; n2 is the true full-dim neighbor with an
    // orthogonal prefix
    val e = Seq(
      (0L, Seq(1f, 0f, 0f, 10f)),
      (1L, Seq(1f, 0f, 0f, -10f)),
      (2L, Seq(0f, 1f, 0f, 10f))
    ).toDF("vec_id", "embedding")
    val card = SimilarityOps.matryoshkaRecallCard(e, "vec_id", "embedding",
        e.filter(col("vec_id") === 0L), dims = Seq(2, 4), k = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(card(2L) == ((1L, 0L, 0.0)), s"prefix must mislead: $card")
    assert(card(4L) == ((1L, 1L, 1.0)), s"full dim is the truth: $card")
  }

  test("q240 card: full-dimension row is exact recall 1.0") {
    val rows = SparkEntry.queries("q240_matryoshka_recall")(
        spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(rows(64L) == 1.0)
    assert(rows.keySet == Set(8L, 16L, 64L))
  }

  test("embeddingDriftCard: identical halves score zero drift") {
    val e = Seq((1L, "a", Seq(1f, 0f)), (2L, "b", Seq(1f, 0f)),
        (3L, "a", Seq(0f, 1f)), (4L, "b", Seq(0f, 1f)))
      .toDF("vec_id", "grp", "embedding")
    val r = SimilarityOps.embeddingDriftCard(e, "vec_id", "embedding",
      col("grp") === "b").head()
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0)
    assert(r.getDouble(5) == 0.0)
  }

  test("embeddingDriftCard: hand-computed shift localizes the moved dim") {
    // means: A = (2,0), B = (2,1) -> cos 0.894427, L2 1, top dim 1
    val e = Seq((1L, "a", Seq(2f, 0f)), (2L, "b", Seq(2f, 1f)))
      .toDF("vec_id", "grp", "embedding")
    val r = SimilarityOps.embeddingDriftCard(e, "vec_id", "embedding",
      col("grp") === "b").head()
    assert((r.getLong(0), r.getLong(1)) == ((1L, 1L)))
    assert(r.getDouble(2) == 0.894427)
    assert(r.getDouble(3) == 1.0)
    assert((r.getLong(4), r.getDouble(5)) == ((1L, 1.0)))
  }

  test("clusterBalancedSample: equal quotas, partitioning-invariant") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val a = SimilarityOps.clusterBalancedSample(
      e, "vec_id", "embedding", nlist = 8, perList = 8).collect()
    a.groupBy(_.getLong(0)).foreach { case (c, rows) =>
      val nList = rows.head.getLong(3)
      assert(rows.length.toLong == math.min(8L, nList),
        s"cluster $c quota violated")
      assert(rows.map(_.getLong(1)).sorted.toSeq ==
        (1L to rows.length.toLong).toSeq, s"cluster $c ranks not dense")
    }
    // draws key on the id, never the layout: identical under repartition
    val b = SimilarityOps.clusterBalancedSample(
      e.repartition(13), "vec_id", "embedding",
      nlist = 8, perList = 8).collect()
    assert(a.toSeq == b.toSeq)
  }
}
