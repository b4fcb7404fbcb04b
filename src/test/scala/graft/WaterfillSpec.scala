package graft

import org.apache.spark.sql.functions._
import graft.operators.SplitOps

/** Water-filling token allocation (q244): hand-computed saturation,
  * remainder dealing, budget-covers-everything, and the exact-sum
  * invariant on real data.
  */
class WaterfillSpec extends SparkSpec {
  import spark.implicits._

  private def alloc(rows: Seq[(String, Long)], num: Long, den: Long) =
    SplitOps.tokenBudgetWaterfill(
        rows.toDF("source", "tok"), "source", col("tok"), num, den)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap

  test("waterfill saturates small sources, levels the rest") {
    // totals 115, budget 60% = 69: a and b saturate, c takes 54
    val r = alloc(Seq(("a", 5L), ("b", 10L), ("c", 100L)), 6L, 10L)
    assert(r == Map("a" -> ((5L, 1L)), "b" -> ((10L, 1L)),
      "c" -> ((54L, 0L))))
  }

  test("waterfill deals the remainder one-each in sorted order") {
    // total 30, budget 20 = 3x6 + 2: first two sorted sources get +1
    val r = alloc(Seq(("a", 10L), ("b", 10L), ("c", 10L)), 2L, 3L)
    assert(r == Map("a" -> ((7L, 0L)), "b" -> ((7L, 0L)),
      "c" -> ((6L, 0L))))
  }

  test("waterfill with budget >= total gives everyone everything") {
    val r = alloc(Seq(("a", 5L), ("b", 50L)), 2L, 1L)
    assert(r == Map("a" -> ((5L, 1L)), "b" -> ((50L, 1L))))
  }

  test("q244 invariant: allocations sum exactly to the budget") {
    val out = SparkEntry.queries("q244_waterfill")(
      spark, "/root/testdata/sf0.001").collect()
    val budget = out.head.getLong(4)
    assert(out.map(_.getLong(2)).sum == budget)
    // never allocate more than available
    assert(out.forall(r => r.getLong(2) <= r.getLong(1)))
  }
}
