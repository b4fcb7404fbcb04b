package graft

import graft.operators.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents: clusters, singletons, min-id canonical") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (3L, 2L)).toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 10L, 11L, 20L).toDF("v")
    val got = GraphOps.connectedComponents(edges, "a", "b", Some(nodes))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("connectedComponents: long chain needs multiple propagation rounds") {
    // a path graph 0-1-2-...-30: min label must walk the full diameter
    val edges = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val got = GraphOps.connectedComponents(edges, "a", "b")
      .as[(Long, Long)].collect()
    assert(got.length == 31 && got.forall(_._2 == 0L))
  }

  test("connectedComponents matches brute-force union-find on a random graph") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val pairs = Seq.fill(45)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
    // driver-side union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = pairs.flatMap(p => Seq(p._1, p._2)).distinct.sorted
      .map(v => v -> {
        // canonical = min member of the component
        val root = find(v.toInt)
        (0 until n).filter(u => find(u) == root).min.toLong
      }).toMap
    val got = GraphOps.connectedComponents(pairs.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == expect)
  }

  test("keepCanonical drops exactly the non-canonical cluster members") {
    val docs = Seq((1L, "x"), (2L, "x'"), (3L, "x''"), (7L, "y"), (9L, "z"))
      .toDF("id", "text")
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val kept = GraphOps.keepCanonical(docs, "id", edges, "a", "b")
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 7L, 9L))
  }
}
