package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

/** IVFADC (q228) pinned against a FULL independent driver-side
  * re-implementation: congruential draws, rounded-cosine coarse
  * assignment, per-subspace argmin coding, probe pruning, the asymmetric
  * lookup table, and the decimal lookup-sum ranking are all recomputed in
  * plain Scala on the collected vectors and must match the operator's
  * output row for row. Arithmetic is replicated operation-for-operation
  * (sequential fold dot products, HALF_UP rounding, identical
  * parenthesization), so this is the same class of evidence as the
  * hand-computed specs — an independent engine agreeing on every value.
  */
class IvfAdcSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val (nlist, nprobe, m, kAnchors, topK) = (8, 3, 8, 4, 3)

  private def r6(v: Double): Double =
    new java.math.BigDecimal(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  private def dot(a: Seq[Double], b: Seq[Double]): Double =
    a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
  private def cos(a: Seq[Double], b: Seq[Double]): Double =
    dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
  private def d2(a: Seq[Double], b: Seq[Double]): Double =
    r6(dot(a, a) - 2.0 * dot(a, b) + dot(b, b))
  private def draw(id: Long, salt: Long): Long = {
    val p1 = 1000003L; val p2 = 9999991L
    val x1 = (((id + salt) % p1) * 2654435761L) % p1
    ((x1 + id / p1) % p2 * 22695477L) % p2
  }

  test("ivfAdcSearch matches a full driver-side re-implementation") {
    val emb = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 120)
    val vecs = emb.select(col("vec_id"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    val d = vecs.head._2.length
    val sub = d / m

    // reference pipeline
    val cents = vecs.map { case (id, v) => (draw(id, 0), id, v) }
      .sortBy(t => (t._1, t._2)).take(nlist).zipWithIndex
      .map { case ((_, _, v), i) => i -> v }
    val anchors = vecs.map { case (id, v) => (draw(id, 1), id, v) }
      .sortBy(t => (t._1, t._2)).take(kAnchors).zipWithIndex
      .map { case ((_, _, v), i) => i -> v }
    val assign = vecs.map { case (id, v) =>
      val best = cents.map { case (cid, c) => (r6(cos(v, c)), cid) }
        .minBy { case (sim, cid) => (-sim, cid) }
      id -> best._2
    }.toMap
    val codesFixed: Map[Long, IndexedSeq[Int]] = vecs.map { case (id, v) =>
      id -> (0 until m).map { s =>
        val sv = v.slice(s * sub, s * sub + sub)
        anchors.map { case (code, a) =>
          (d2(sv, a.slice(s * sub, s * sub + sub)), code)
        }.minBy { case (dd, code) => (dd, code) }._2
      }
    }.toMap
    val queries = vecs.filter(_._1 < 10)
    val expected = queries.flatMap { case (qid, qv) =>
      val probed = cents.map { case (cid, c) => (r6(cos(qv, c)), cid) }
        .sortBy { case (sim, cid) => (-sim, cid) }.take(nprobe)
        .map(_._2).toSet
      val adcTable = (0 until m).map { s =>
        val qslice = qv.slice(s * sub, s * sub + sub)
        anchors.map { case (code, a) =>
          code -> d2(qslice, a.slice(s * sub, s * sub + sub))
        }.toMap
      }
      val cand = vecs
        .filter { case (id, _) => id != qid && probed(assign(id)) }
        .map { case (id, _) =>
          val sum = (0 until m)
            .map(s => BigDecimal(adcTable(s)(codesFixed(id)(s)))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP))
            .sum
          (id, r6(sum.toDouble))
        }
        .sortBy { case (id, dist) => (dist, id) }.take(topK)
      cand.zipWithIndex.map { case ((id, dist), i) =>
        (qid, id, dist, (i + 1).toLong)
      }
    }.toSet

    val got = SimilarityOps.ivfAdcSearch(emb, "vec_id", "embedding",
        emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        nlist, nprobe, m, kAnchors, topK)
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // structural invariants: contiguous ranks, per-rank monotone distance
    got.groupBy(_._1).foreach { case (q, rows) =>
      val byRank = rows.toSeq.sortBy(_._4)
      assert(byRank.map(_._4) == (1L to byRank.size))
      assert(byRank.map(_._3) == byRank.map(_._3).sorted,
        s"adc_dist must be non-decreasing with rank for query $q")
    }
  }

  test("ivfAdcRerank at full probing + full shortlist equals exact kNN") {
    val emb = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 80)
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 8)
    // every list probed and every candidate shortlisted → the ADC stage
    // prunes nothing; the exact re-rank must reproduce brute-force kNN
    val reranked = SimilarityOps.ivfAdcRerank(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding",
        nlist = 8, nprobe = 8, m = 8, kAnchors = 4,
        shortlist = n, topK = 3)
      .select(col("q_id"), col("vec_id"), col("cosine"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    val exact = SimilarityOps.knnJoin(emb, queries, "vec_id", "embedding",
        "vec_id", "embedding", k = 3)
      .select(col("q_id"), col("n_id"), col("cosine"), col("rank"))
      .as[(Long, Long, Double, Long)].collect().toSet
    assert(reranked == exact)
    assert(reranked.nonEmpty)
  }
}
