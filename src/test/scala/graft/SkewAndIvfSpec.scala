package graft

import org.apache.spark.sql.functions._
import graft.operators.{SimilarityOps, SkewOps}

class SkewAndIvfSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin preserves join cardinality and spreads the hot key") {
    // hot key 1 with 1000 rows, key 2 with 3
    val fact = ((1 to 1000).map(i => (1L, i.toLong)) ++
      (1 to 3).map(i => (2L, 1000L + i))).toDF("k", "row_id")
    val dim = Seq((1L, "hot"), (2L, "cold"), (3L, "unmatched")).toDF("k", "name")
    val plain = fact.join(dim, "k")
    val salted = SkewOps.saltedJoin(fact, dim, "k", 8, Seq("row_id"))
    assert(salted.count() == plain.count())
    assert(salted.groupBy("k", "name").count().collect().toSet ==
      plain.groupBy("k", "name").count().collect().toSet)
    // the hot key's rows occupy multiple salt buckets
    val nBuckets = fact.withColumn("s", SkewOps.salt(8, col("row_id")))
      .filter($"k" === 1L).select("s").distinct().count()
    assert(nBuckets > 1)
  }

  test("IVF: assignment is exhaustive and exclusive; search finds the query's list") {
    val vecs = (0L until 100L).map { i =>
      // three well-separated directions
      val base = (i % 3) match {
        case 0 => Seq(10.0, 0.0, 0.0)
        case 1 => Seq(0.0, 10.0, 0.0)
        case _ => Seq(0.0, 0.0, 10.0)
      }
      (i, base.map(_ + (i % 7) * 0.01))
    }.toDF("vec_id", "embedding")

    val cents = SimilarityOps.ivfCentroids(vecs, "vec_id", "embedding", 8)
    assert(cents.count() == 8)
    val assigned = SimilarityOps.ivfAssign(vecs, "vec_id", "embedding", cents)
    // every vector assigned exactly once
    assert(assigned.count() == 100)
    assert(assigned.select("vec_id").distinct().count() == 100)

    val res = SimilarityOps.ivfSearch(assigned, "vec_id",
      Seq(1.0, 0.0, 0.0), cents, nprobe = 3, k = 5)
      .collect()
    assert(res.length == 5)
    // with x-direction query, all top hits must be x-direction vectors
    res.foreach(r => assert(r.getLong(0) % 3 == 0, r.toString))
    assert(res.forall(_.getDouble(1) > 0.99))
  }
}
