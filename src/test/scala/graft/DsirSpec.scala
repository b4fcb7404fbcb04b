package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** DSIR importance-resampling selection (q239): directionality (target-
  * like docs outrank target-unlike ones), weight additivity, and the
  * top-k selection contract.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("dsirSelection ranks target-like raw docs first") {
    val docs = Seq(
      (1L, "t", "zz zz zz zz qq"), (2L, "t", "zz qq zz zz"),
      (3L, "r", "zz zz zz qq aa"),   // looks like the target
      (4L, "r", "mm nn oo pp aa"),   // does not
      (5L, "r", "zz mm nn oo aa")    // in between
    ).toDF("doc_id", "grp", "text")
    val r = TextOps.dsirSelection(docs, "doc_id", "text",
        col("grp") === "t", buckets = 64, k = 1)
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(2), x.getLong(3))).toMap
    assert(r(3)._1 > r(5)._1 && r(5)._1 > r(4)._1,
      s"importance order violated: $r")
    assert(r(3)._2 == 1L && r(4)._2 == 0L && r(5)._2 == 0L)
  }

  test("dsirSelection log-weight is additive in content") {
    val docs = Seq(
      (1L, "t", "zz zz qq"),
      (2L, "r", "zz qq mm"),
      (3L, "r", "zz qq mm zz qq mm"),  // doc 2 twice
      (4L, "r", "aa bb cc dd ee ff gg hh")
    ).toDF("doc_id", "grp", "text")
    val r = TextOps.dsirSelection(docs, "doc_id", "text",
        col("grp") === "t", buckets = 64, k = 2)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(approx(r(3L), 2.0 * r(2L), 1e-5),
      s"doubled content must double the log weight: $r")
  }

  test("dsirSelection covers every raw doc and selects exactly k") {
    val dir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q239_dsir_selection")(spark, dir)
    val n = out.count()
    val raw = Tables.load(spark, dir, "documents")
      .filter(col("source") =!= "src0").count()
    assert(n == raw)
    assert(out.filter(col("selected") === 1L).count() == 50L)
  }
}
