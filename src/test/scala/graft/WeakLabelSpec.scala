package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Weak-supervision LF diagnostics (q245): hand-computed coverage,
  * overlap, and conflict on a crafted corpus.
  */
class WeakLabelSpec extends SparkSpec {
  import spark.implicits._

  test("weakLabelDiagnostics hand-checked card") {
    // d1: A+B vote different labels (conflict for both)
    // d2: A alone (no overlap, no conflict)
    // d3: A+C vote the SAME label (overlap, no conflict)
    // d4: nobody votes (abstention — appears in coverage denominator)
    val docs = Seq(
      (1L, "x y"), (2L, "x"), (3L, "x z"), (4L, "w")
    ).toDF("doc_id", "text")
    val toks = TextOps.tokens(col("text"))
    val card = TextOps.weakLabelDiagnostics(docs, "doc_id", Seq(
        ("lfA", array_contains(toks, "x"), "t"),
        ("lfB", array_contains(toks, "y"), "r"),
        ("lfC", array_contains(toks, "z"), "t")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(card("lfA") == ((3L, 0.75, 2L, 1L)))   // votes d1,d2,d3
    assert(card("lfB") == ((1L, 0.25, 1L, 1L)))   // only the conflict doc
    assert(card("lfC") == ((1L, 0.25, 1L, 0L)))   // agreeing overlap
  }
}
