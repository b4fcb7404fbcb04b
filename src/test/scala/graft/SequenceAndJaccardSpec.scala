package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{DedupOps, TimeSeriesOps}

class SequenceAndJaccardSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sequenceAssembly truncates to last N and left-pads with zeros") {
    val df = (1 to 7).map(i => (1L, ts(f"2024-01-0$i 00:00:00"), i.toLong))
      .toDF("k", "ts", "id")
      .union(Seq((2L, ts("2024-01-01 00:00:00"), 99L)).toDF("k", "ts", "id"))
    val r = TimeSeriesOps.sequenceAssembly(df, "k", "ts", "id", 5)
      .orderBy("k").collect()
    // key 1: 7 rows → last 5 are 3,4,5,6,7
    assert(r(0).getAs[String]("seq_str") == "3,4,5,6,7")
    assert(r(0).getAs[Long]("seq_len") == 5L)
    // key 2: 1 row → padded to 0,0,0,0,99
    assert(r(1).getAs[String]("seq_str") == "0,0,0,0,99")
    assert(r(1).getAs[Long]("seq_len") == 1L)
  }

  test("jaccardPairsExact finds high-overlap pairs with exact scores") {
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 w6"),   // J = 1.0 with doc 1
      (3L, "w1 w2 w3 w4 w5 zz"),   // shares 3 of 4 shingles with 1: J = 3/5
      (4L, "aa bb cc dd ee ff"),   // disjoint
    ).toDF("doc_id", "text")
    val pairs = DedupOps.jaccardPairsExact(docs, "doc_id", "text", 3, 0.0)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) == 0.6)
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // threshold filters
    val thr = DedupOps.jaccardPairsExact(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(thr == Set((1L, 2L)))
  }

  test("jaccardPairsExact df-cap drops stopword shingles from candidate gen") {
    // "common common common" shingle appears in every doc → capped out,
    // so no pairs survive even though all docs share it.
    val docs = (1L to 5L).map(i => (i, s"common common common unique$i x y"))
      .toDF("doc_id", "text")
    val noPairs = DedupOps.jaccardPairsExact(docs, "doc_id", "text", 3, 0.0,
      maxShingleDf = Some(2))
    assert(noPairs.count() == 0L)
  }
}
