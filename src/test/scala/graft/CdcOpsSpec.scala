package graft

import graft.operators.CdcOps

class CdcOpsSpec extends SparkSpec {
  import spark.implicits._

  // (key, version, op, payload)
  private val stream = Seq(
    (1L, 1L, "U", "a"), (1L, 3L, "U", "c"), (1L, 2L, "U", "b"),
    (2L, 1L, "U", "x"), (2L, 2L, "D", "-"),
    (3L, 1L, "D", "-"), (3L, 2L, "U", "y"), // re-insert after delete
    (4L, 5L, "U", "z")).toDF("k", "v", "op", "p")

  test("compactLatest keeps exactly the highest-version row per key") {
    val got = CdcOps.compactLatest(stream, Seq("k"), Seq("v"))
      .select("k", "v", "p").as[(Long, Long, String)].collect().toSet
    assert(got == Set((1L, 3L, "c"), (2L, 2L, "-"), (3L, 2L, "y"), (4L, 5L, "z")))
  }

  test("compactWithDeletes drops keys whose latest change is a tombstone") {
    val got = CdcOps.compactWithDeletes(stream, Seq("k"), Seq("v"),
        d => d("op") === "D")
      .select("k", "p").as[(Long, String)].collect().toSet
    // key 2 deleted; key 3 re-inserted after its delete → survives
    assert(got == Set((1L, "c"), (3L, "y"), (4L, "z")))
  }

  test("compactLatest tiebreaks on the full version tuple") {
    val s = Seq((1L, 10L, 1L, "first"), (1L, 10L, 2L, "second"))
      .toDF("k", "ts", "seq", "p")
    val got = CdcOps.compactLatest(s, Seq("k"), Seq("ts", "seq"))
      .select("p").as[String].collect()
    assert(got.toSeq == Seq("second"))
  }
}
