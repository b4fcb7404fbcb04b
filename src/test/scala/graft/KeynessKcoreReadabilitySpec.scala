package graft

import org.apache.spark.sql.functions._
import graft.operators.{GraphOps, TextOps}

class KeynessKcoreReadabilitySpec extends SparkSpec {
  import spark.implicits._

  test("kCore: tail cascades off over two rounds, triangle survives") {
    // triangle 1-2-3 plus chain 3-4-5: round 1 drops 5 (degree 1),
    // round 2 drops 4 (degree fell to 1) — the 2-core is the triangle
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val got = GraphOps.kCore(edges, "a", "b", k = 2, rounds = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("kCore: k above the max degree empties the graph") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    assert(GraphOps.kCore(edges, "a", "b", k = 5, rounds = 3).count() == 0L)
  }

  test("keynessCard: a source-exclusive term tops with G² = 2·a·ln2") {
    // foo only in A, baz only in B, bar everywhere: equal-size halves
    // give E = a/2, so G² = 2·(10·ln2 + 0) for the exclusives and 0
    // for bar
    val docs = (Seq.fill(10)(("A", "foo bar")) ++
      Seq.fill(10)(("B", "baz bar"))).toDF("source", "text")
    val got = TextOps.keynessCard(docs, "source", "text", minCount = 5L)
      .select("rank", "source", "term", "g2", "direction")
      .as[(Long, String, String, Double, String)].collect()
    val expG2 = BigDecimal(2.0 * 10.0 * math.log(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, "A", "foo", expG2, "over")))
    assert(got(1) == ((2L, "B", "baz", expG2, "over")))
    // bar is perfectly balanced: zero keyness
    assert(got.filter(_._3 == "bar").forall(_._4 == 0.0))
  }

  test("readabilityCard: hand-computed Flesch on a two-sentence doc") {
    val docs = Seq(("s1", "the cat sat. the dog ran.")).toDF("source", "text")
    val got = TextOps.readabilityCard(docs, "source", "text")
      .select("n_docs", "avg_words_per_sentence", "avg_syllables_per_word",
        "avg_reading_ease", "avg_grade_level")
      .as[(Long, Double, Double, Double, Double)].head()
    // 2 sentences, 6 words, 6 single-vowel-group syllables
    assert(got == ((1L, 3.0, 1.0, 119.19, -2.62)))
  }

  test("readabilityCard: empty and null texts drop, sources aggregate") {
    val docs = Seq(("a", "one two. three four"), ("a", "   "),
      ("b", null.asInstanceOf[String]), ("b", "go"))
      .toDF("source", "text")
    val got = TextOps.readabilityCard(docs, "source", "text")
      .select("source", "n_docs").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 1L, "b" -> 1L))
  }
}
