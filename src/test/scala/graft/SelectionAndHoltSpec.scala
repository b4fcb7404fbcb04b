package graft

import java.sql.Timestamp
import graft.operators.{SimilarityOps, TextOps, TimeSeriesOps}

/** MMR selection (q306), RAKE keywords (q307), Holt smoothing (q308):
  * hand-traced greedy picks, hand-computed degree/frequency scores, and
  * recursion fixed points with zero-filled gaps.
  */
class SelectionAndHoltSpec extends SparkSpec {
  import spark.implicits._

  test("mmrSelect: duplicates are deprioritized after their first pick") {
    // anchor = id 1 (1,0). Greedy: id1 (rel 1) → id2 (dup, mmr .4) →
    // id4 (rel .6, ms .6 → .24) → id3 (orthogonal, mmr 0)
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(0.0f, 1.0f)), (4L, Seq(0.6f, 0.8f)))
      .toDF("vec_id", "embedding")
    val r = SimilarityOps.mmrSelect(df, "vec_id", "embedding", k = 4)
      .collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(1L, 2L, 4L, 3L))
    assert(r(1).getDouble(4) == 0.4)     // 0.7·1 − 0.3·1
    assert(r(2).getDouble(4) == 0.24)    // 0.7·0.6 − 0.3·0.6
    assert(r(3).getDouble(4) == -0.24)   // rel 0, ms = cos(id3,id4) = .8
  }

  test("mmrSelect: first pick is the pure-relevance argmax") {
    val df = Seq(
      (10L, Seq(0.0f, 1.0f)), (11L, Seq(0.8f, 0.6f)),
      (12L, Seq(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    // anchor = id 10 → rel(10)=1 highest
    val r = SimilarityOps.mmrSelect(df, "vec_id", "embedding", k = 2)
      .collect()
    assert(r(0).getLong(1) == 10L && r(0).getDouble(2) == 1.0)
  }

  test("rakeKeywords: degree/frequency scores, hand-computed") {
    val df = Seq(
      (1L, "the fast table scan and quick table scan"),
      (2L, "the merge"))
      .toDF("doc_id", "text")
    val rows = TextOps.rakeKeywords(df, "doc_id", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    // all of fast/table/scan/quick have degree/freq = 3 → phrases score 9
    assert(rows("fast table scan") == ((1L, 9.0)))
    assert(rows("quick table scan") == ((1L, 9.0)))
    assert(rows("merge") == ((1L, 1.0)))
  }

  test("rakeKeywords: consecutive stopwords and stray spaces are clean") {
    val df = Seq((1L, "the a  big   join, and the")).toDF("doc_id", "text")
    val rows = TextOps.rakeKeywords(df, "doc_id", "text").collect()
    assert(rows.map(_.getString(0)).toSet == Set("big join"))
    assert(rows.head.getDouble(2) == 4.0) // big 2/1 + join 2/1
  }

  test("holtLinear: constant series is a fixed point with zero trend") {
    val mk = (d: Int) => Timestamp.valueOf(f"2024-01-0$d 10:00:00")
    val df = Seq(mk(1), mk(1), mk(2), mk(2), mk(3), mk(3)).toDF("ts")
    val r = TimeSeriesOps.holtLinear(df, "ts").collect()
    assert(r.length == 3)
    assert(r.forall(x => x.getDouble(3) == 2.0 && x.getDouble(4) == 0.0))
    assert(r(0).isNullAt(2) && r(1).getDouble(2) == 2.0)
  }

  test("holtLinear: gap days enter as zero observations") {
    val mk = (d: Int) => Timestamp.valueOf(f"2024-01-0$d 10:00:00")
    val df = Seq(mk(1), mk(3)).toDF("ts")
    val r = TimeSeriesOps.holtLinear(df, "ts").collect()
    assert(r.length == 3)
    assert(r(1).getLong(1) == 0L)        // the missing day is x = 0
    // hand recursion: l1=1,b1=0 → day2: fit=1, l=.7, b=-.03
    assert(r(1).getDouble(2) == 1.0)
    assert(r(1).getDouble(3) == 0.7)
    assert(r(1).getDouble(4) == -0.03)
  }

  test("holtLinear: grid contract is enforced") {
    val mk = (d: Int) => Timestamp.valueOf(f"2024-01-0$d 10:00:00")
    val df = Seq(mk(1), mk(9)).toDF("ts")
    val e = intercept[IllegalArgumentException] {
      TimeSeriesOps.holtLinear(df, "ts", maxGridSize = 3L).collect()
    }
    assert(e.getMessage.contains("day spine too long"))
  }
}
