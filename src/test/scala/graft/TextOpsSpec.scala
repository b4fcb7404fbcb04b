package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("chiSquareTokens: hand-computed 2x2 contingency on a planted marker token") {
    // 6 docs, classes en(4)/fr(2); "marker" in 3 of the 4 en docs only:
    // A=3 B=0 C=1 D=2, N=6 → χ² = 6·(3·2−0·1)²/((3)(3)(4)(2)) = 216/72 = 3
    val docs = Seq(
      (1L, "marker one", "en"), (2L, "marker two", "en"),
      (3L, "marker three", "en"), (4L, "plain four", "en"),
      (5L, "autre cinq", "fr"), (6L, "autre six", "fr"))
      .toDF("doc_id", "text", "lang")
    val r = TextOps.chiSquareTokens(docs, "doc_id", "text", "lang",
      k = 20, minDf = 1L).collect()
    val m = r.filter(x => x.getAs[String]("cls") == "en" &&
      x.getAs[String]("token") == "marker")
    assert(m.length == 1)
    assert(m.head.getAs[Double]("chi2") == 3.0)
    assert(m.head.getAs[Long]("n_docs_in_class") == 3L)
    assert(m.head.getAs[Long]("n_docs_total") == 3L)
    // the class-exclusive "autre" token dominates fr: χ² = 6·(2·4)²/(2·4·2·4) = 6
    val fr = r.filter(x => x.getAs[String]("cls") == "fr")
    assert(fr.head.getAs[String]("token") == "autre" &&
      fr.head.getAs[Long]("rank") == 1L &&
      fr.head.getAs[Double]("chi2") == 6.0)
    // per-doc presence, not term frequency: repeating the token in one doc
    // must not change any count
    val rep = docs.withColumn("text",
      when(col("doc_id") === 1L, lit("marker marker one")).otherwise(col("text")))
    val r2 = TextOps.chiSquareTokens(rep, "doc_id", "text", "lang",
      k = 20, minDf = 1L).collect()
    assert(r2.map(_.toString).sorted.toSeq == r.map(_.toString).sorted.toSeq)
  }

  test("chiSquareTokens: a token in EVERY document gets null chi2, never rank 1") {
    // (C+D) = 0 for the ubiquitous token — the unguarded ratio would be
    // 0/0 = NaN, which sorts ABOVE every number in a descending window
    // and would steal rank 1 in every class
    val docs = Seq(
      (1L, "the marker one", "en"), (2L, "the marker two", "en"),
      (3L, "the plain three", "en"),
      (4L, "the autre quatre", "fr"), (5L, "the autre cinq", "fr"))
      .toDF("doc_id", "text", "lang")
    val r = TextOps.chiSquareTokens(docs, "doc_id", "text", "lang",
      k = 20, minDf = 1L).collect()
    val ubiquitous = r.filter(_.getAs[String]("token") == "the")
    assert(ubiquitous.nonEmpty)
    assert(ubiquitous.forall(x => x.isNullAt(x.fieldIndex("chi2"))))
    assert(ubiquitous.forall(_.getAs[Long]("rank") > 1L))
    // real discriminative tokens still take rank 1
    val en1 = r.filter(x => x.getAs[String]("cls") == "en" &&
      x.getAs[Long]("rank") == 1L).head
    assert(en1.getAs[String]("token") == "marker")
  }

  test("chiSquareTokens: ranks bounded by k and chi2 non-negative on real docs") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val r = TextOps.chiSquareTokens(docs, "doc_id", "text", "lang").collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("rank") <= 10L))
    assert(r.forall(_.getAs[Double]("chi2") >= 0.0))
    val perClass = r.groupBy(_.getAs[String]("cls")).view.mapValues(_.length)
    assert(perClass.values.forall(_ <= 10))
  }

  test("contaminationOverlap: planted leak flagged, clean and short docs handled") {
    // hashBucket(id, 20) reduces to id % 20 here — ids 20/40/60 are eval
    val leak = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, leak), (2L, "totally different training words here now"),
      (20L, leak),                       // eval: full leak → overlap 1.0
      (40L, "unique eval only text that matches nothing at all"),
      (60L, "too short"))                // < 5 tokens → no grams
      .toDF("doc_id", "text")
    val r = TextOps.contaminationOverlap(docs, "doc_id", "text",
      n = 5, evalBuckets = 1, threshold = 0.2)
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r.keySet == Set(20L, 40L, 60L))
    assert(r(20L).getAs[Double]("overlap_frac") == 1.0)
    assert(r(20L).getAs[Long]("contaminated") == 1L)
    assert(r(40L).getAs[Double]("overlap_frac") == 0.0)
    assert(r(40L).getAs[Long]("contaminated") == 0L)
    assert(r(60L).getAs[Long]("n_grams") == 0L)
    assert(r(60L).isNullAt(r(60L).fieldIndex("overlap_frac")))
    assert(r(60L).getAs[Long]("contaminated") == 0L)
  }

  test("unigramPerplexity: hand-computed add-one LM with UNK mass") {
    // train (ids 1,2): counts a=2, b=2, c=1 → N=5, V=3, denom=8
    // eval (id 20): "a c d" → ce = −(ln .375 + ln .25 + ln .125)/3
    val docs = Seq((1L, "a a b"), (2L, "b c"), (20L, "a c d"))
      .toDF("doc_id", "text")
    val r = TextOps.unigramPerplexity(docs, "doc_id", "text").collect()
    assert(r.length == 1 && r.head.getLong(0) == 20L)
    assert(r.head.getAs[Long]("n_tokens") == 3L)
    val ce = math.rint(-(math.log(0.375) + math.log(0.25) +
      math.log(0.125)) / 3.0 * 1e6) / 1e6
    assert(r.head.getAs[Double]("cross_entropy") == ce)
    assert(r.head.getAs[Double]("perplexity") ==
      math.rint(math.exp(ce) * 1e6) / 1e6)
    // a pure-UNK eval doc scores the flat 1/(N+V) mass: ce = ln 8
    val docs2 = Seq((1L, "a a b"), (2L, "b c"), (20L, "zz yy"))
      .toDF("doc_id", "text")
    val r2 = TextOps.unigramPerplexity(docs2, "doc_id", "text").head()
    assert(r2.getAs[Double]("cross_entropy") ==
      math.rint(math.log(8.0) * 1e6) / 1e6)
  }

  test("unigramPerplexity: empty train slice yields null scores, never a crash") {
    // only eval-bucket docs (ids % 20 == 0) → the LM has no training mass
    val docs = Seq((20L, "some eval words"), (40L, "more eval text"))
      .toDF("doc_id", "text")
    val r = TextOps.unigramPerplexity(docs, "doc_id", "text").collect()
    assert(r.length == 2)
    r.foreach { row =>
      assert(row.isNullAt(row.fieldIndex("cross_entropy")))
      assert(row.isNullAt(row.fieldIndex("perplexity")))
    }
  }

  test("tokens splits on single spaces after trim") {
    val df = Seq("  the cat sat  ").toDF("t")
    assert(df.select(TextOps.tokens($"t")).head().getSeq[String](0) ==
      Seq("the", "cat", "sat"))
  }

  test("withTokenStats counts tokens/chars/subword estimate") {
    val df = Seq(("a", "one two three")).toDF("id", "text")
    val r = TextOps.withTokenStats(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_chars_text") == 13L)
    assert(r.getAs[Long]("n_subwords_est") == 4L) // ceil(13/4)
  }

  test("withQuality computes stopword ratio and composite score") {
    val df = Seq(("a", "the cat the dog")).toDF("id", "text")
    val r = TextOps.withQuality(df, "text", Seq("the", "a")).head()
    assert(r.getAs[Double]("stop_ratio") == 0.5)
    // quality = min(4/100,1) * (1 - 0.5) = 0.02
    assert(r.getAs[Double]("quality_score") == 0.02)
  }

  test("withLangId applies threshold decision order") {
    val df = Seq(
      (1L, "the the cat dog runs far away home now then"), // the_ratio 0.2
      (2L, "a a chat chien court loin maison vite alors donc"), // a_ratio 0.2
      (3L, "uno dos tres cuatro cinco seis siete ocho nueve diez"),
    ).toDF("doc_id", "text")
    val r = TextOps.withLangId(df, "text").orderBy("doc_id")
      .select("lang_pred").as[String].collect()
    assert(r.toSeq == Seq("en", "fr", "und"))
  }

  test("wordShingles produces n-grams; short docs yield whole-text shingle") {
    val df = Seq("w1 w2 w3 w4").toDF("t")
    assert(df.select(TextOps.wordShingles($"t", 3)).head().getSeq[String](0) ==
      Seq("w1 w2 w3", "w2 w3 w4"))
    val short = Seq("w1 w2").toDF("t")
    assert(short.select(TextOps.wordShingles($"t", 3)).head().getSeq[String](0) ==
      Seq("w1 w2"))
  }

  test("fingerprint is order-independent over shingle multiset and deterministic") {
    val df = Seq("x y z", "x y z").toDF("t")
    val fps = df.select(TextOps.fingerprint($"t", 2)).as[Long].collect()
    assert(fps(0) == fps(1))
  }

  test("normalizeText lowercases, strips symbols, collapses whitespace") {
    val df = Seq("  Hello,   WORLD!! 42&x  ").toDF("t")
    assert(df.select(TextOps.normalizeText($"t")).head().getString(0) ==
      "hello world 42x")
  }

  test("redactPii replaces emails and phones, counts matches") {
    val df = Seq(
      "contact a.b+c@ex-ample.org or call +1 (555) 123-4567 now",
      "clean text with no pii at all").toDF("text")
    val r = TextOps.redactPii(df, "text").collect()
    assert(r(0).getAs[Int]("n_emails") == 1)
    assert(r(0).getAs[Int]("n_phones") == 1)
    assert(r(0).getAs[String]("text_redacted") ==
      "contact <EMAIL> or call <PHONE> now")
    assert(r(1).getAs[Int]("n_emails") == 0 && r(1).getAs[Int]("n_phones") == 0)
    assert(r(1).getAs[String]("text_redacted") == "clean text with no pii at all")
  }

  test("boilerplateNgrams: hand-computed counts, df cut, short docs contribute nothing") {
    val df = Seq(
      (1L, "all rights reserved by acme"),   // "all rights reserved" + 2 more
      (2L, "all rights reserved forever"),
      (3L, "all rights reserved"),
      (4L, "unique text entirely here"),
      (5L, "too short")                       // < 3 tokens → no grams
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateNgrams(df, "doc_id", "text", n = 3, k = 10,
      minDf = 2).collect()
    // only the shared trigram survives the df >= 2 cut
    assert(out.length == 1, out.mkString(";"))
    assert(out.head.getString(0) == "all rights reserved")
    assert(out.head.getLong(1) == 3L, "occurrences")
    assert(out.head.getLong(2) == 3L, "doc frequency")
    // within-doc repeats count every occurrence but one document
    val rep = Seq((1L, "ha ha ha ha"), (2L, "ha ha ha")).toDF("doc_id", "text")
    val r = TextOps.boilerplateNgrams(rep, "doc_id", "text", 2, 5, 2)
      .filter(col("ngram") === "ha ha").head()
    assert(r.getLong(1) == 5L && r.getLong(2) == 2L)
  }

  test("embeddingDiversity equals the brute-force pair mean on a small set") {
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0)),
      (3L, Seq(1.0, 1.0)), (4L, Seq(-1.0, 0.5)))
    val df = vecs.toDF("vec_id", "embedding")
    val r = graft.operators.ProfileOps.embeddingDiversity(df, "embedding")
      .head()
    assert(r.getAs[Long]("n_vecs") == 4L && r.getAs[Long]("n_dims") == 2L)
    // brute force over ALL ordered pairs incl. self (the i.i.d. identity):
    // E||x-y||^2 with x,y independent uniform draws = 2(E||x||^2-||mean||^2)
    val vs = vecs.map(_._2)
    val all = for (a <- vs; b <- vs) yield
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val expected = all.sum / all.size
    assert(approx(r.getAs[Double]("mean_pair_sq_dist"), expected, 1e-6),
      s"got ${r.getAs[Double]("mean_pair_sq_dist")} want $expected")
  }

  test("withRepetitionStats: hand-computed duplicate and bigram fractions") {
    val docs = Seq(
      (1L, "a b a b a b"),   // 6 tokens, 2 distinct; bigrams: a·b ×3, b·a ×2
      (2L, "w x y z"),       // all distinct; 3 distinct bigrams of 3
      (3L, "solo")).toDF("doc_id", "text")
    val r = TextOps.withRepetitionStats(docs, "doc_id", "text")
      .orderBy("doc_id")
      .select("n_tokens", "dup_token_frac", "top_bigram_frac")
      .as[(Long, Double, Double)].collect()
    assert(r(0) == ((6L, 0.666667, 0.6)))     // 1-2/6; 3 of 5 bigrams
    assert(r(1) == ((4L, 0.0, 0.333333)))
    assert(r(2) == ((1L, 0.0, 1.0)))          // single whole-text shingle
  }

  test("tfIdfTopTerms: hand-computed scores, rare term outranks common term") {
    // 3 docs; "apple" appears in 1 doc, "the" in all 3
    val docs = Seq(
      (1L, "the apple the"),
      (2L, "the pear"),
      (3L, "the plum")).toDF("doc_id", "text")
    val r = TextOps.tfIdfTopTerms(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .select("doc_id", "term", "tf", "tfidf")
      .as[(Long, String, Long, Double)].collect()
    def idf(df: Int) = math.log(4.0 / (df + 1.0)) + 1.0
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    // doc 1: "the" wins on tf (2·idf(3)=2.0 > 1·idf(1)=1.693)
    assert(r(0) == ((1L, "the", 2L, r6(2 * idf(3)))))
    assert(r(1) == ((1L, "apple", 1L, r6(idf(1)))))
    // doc 2: pear (rare) above the (ubiquitous)
    assert(r(2)._2 == "pear" && r(3)._2 == "the")
  }

  test("winnowing: shared runs of w+k-1 tokens always share a fingerprint; repetition collapses") {
    import spark.implicits._
    // k=3, w=4 → guarantee threshold is any shared 6-token run
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y z z c d e f g h w v"), // shares "c d e f g h" with doc 1
      (3L, "p q r s t u v w x")        // disjoint
    ).toDF("doc_id", "text")
    val fps = TextOps.winnowingFingerprints(docs, "doc_id", "text",
      k = 3, w = 4)
    // fingerprints are a SUBSET of k-gram positions, deduped
    val perDoc = fps.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc(1L) >= 1 && perDoc(1L) <= 6) // doc 1 has 6 k-grams
    val shared = fps.filter(col("doc_id") === 1L)
      .select("fp_hash").intersect(
        fps.filter(col("doc_id") === 2L).select("fp_hash"))
    assert(shared.count() >= 1, "winnowing guarantee violated")
    val pairs = TextOps.winnowingNearDupPairs(docs, "doc_id", "text",
      k = 3, w = 4, maxDf = 50L, minShared = 1L, topK = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    // a pure repetition doc yields exactly ONE distinct fingerprint hash
    val rep = Seq((9L, "a a a a a a a a")).toDF("doc_id", "text")
    val repFps = TextOps.winnowingFingerprints(rep, "doc_id", "text",
      k = 3, w = 4)
    assert(repFps.select("fp_hash").distinct().count() == 1L)
    // ties select the RIGHTMOST position in each window (robust
    // winnowing): the first full window [0..3] of equal hashes → pos 3
    assert(repFps.agg(min(col("fp_pos"))).head().getLong(0) == 3L)
  }

  test("oovDriftCard: frozen early vocab, hand-computed OOV rates") {
    // early = ids 1,2; vocab(top-2) = {aa, bb}; cc is early-OOV,
    // dd/ee are late-OOV and entirely new types
    val docs = Seq((1L, "aa aa bb"), (2L, "cc"), (3L, "aa dd"),
      (4L, "dd ee")).toDF("doc_id", "text")
    val r = graft.operators.TextOps.oovDriftCard(docs, "doc_id", "text",
      vocabSize = 2).head()
    assert(r.getLong(0) == 2L)
    assert(r.getLong(1) == 4L && r.getDouble(2) == 0.25)
    assert(r.getLong(3) == 4L && r.getDouble(4) == 0.75)
    assert(r.getLong(5) == 2L)
  }

  test("pmiCollocations: a planted exclusive pair wins over a frequent " +
      "independent pair") {
    // "aa bb" always and only together (c12=c1=c2=5); "xx" pairs with
    // many different partners, so (xx, y*) has high c1 and low PMI
    val docs = (
      Seq.fill(5)("aa bb") ++
      (0 until 5).flatMap(i => Seq.fill(5)(s"xx y$i"))
    ).zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "text")
    val rows = graft.operators.TextOps.pmiCollocations(docs, "text",
      minCount = 5L, k = 10).collect()
    val top = rows.head
    assert(top.getLong(0) == 1L)
    assert(top.getString(1) == "aa" && top.getString(2) == "bb")
    val n = 60.0 // 5*2 + 25*2 tokens
    val expected = math.rint(math.log(5.0 * n / (5.0 * 5.0)) * 1e6) / 1e6
    assert(top.getDouble(6) == expected)
    // every (xx, y_i) pair scores strictly lower: c1 = 25
    rows.tail.foreach { r =>
      assert(r.getDouble(6) < expected)
      assert(r.getString(1) == "xx" && r.getLong(4) == 25L)
    }
  }

  test("sourceCapCard: cap keeps the best-quality docs per source") {
    // s1: 3 docs — long no-stopword text scores higher than stopword-y
    // text; cap 2 drops exactly the worst. s2: 1 doc — under cap.
    val docs = Seq(
      (1L, "s1", "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "s1", "the a the a the a"),
      (3L, "s1", "iota kappa lambda mu nu xi omicron pi rho sigma"),
      (4L, "s2", "tau upsilon phi")).toDF("doc_id", "source", "text")
    val rows = TextOps.sourceCapCard(docs, "source", "doc_id", "text",
      cap = 2).collect()
    val s1 = rows.find(_.getString(0) == "s1").get
    val s2 = rows.find(_.getString(0) == "s2").get
    assert(s1.getLong(1) == 3L && s1.getLong(2) == 2L &&
      s1.getLong(3) == 1L)
    assert(s1.getLong(4) == 18L, "kept tokens = docs 1 (8) + 3 (10)")
    assert(s1.getLong(5) == 6L, "dropped tokens = doc 2's 6")
    assert(s1.getDouble(6) > 0.0, "kept docs all have positive quality")
    assert(s2.getLong(2) == 1L && s2.getLong(3) == 0L)
    rows.foreach { r =>
      assert(r.getLong(2) <= 2L && r.getLong(1) ==
        r.getLong(2) + r.getLong(3))
    }
  }

  test("crossSourceCrossEntropy: hand-computed 2x2 matrix") {
    // A: "x x y" → {x:2, y:1}, N=3; B: "x z" → {x:1, z:1}, N=2; V=3
    val df = Seq(("A", "x x y"), ("B", "x z")).toDF("source", "text")
    val out = TextOps.crossSourceCrossEntropy(df, "source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ln = (x: Double) => math.log(x)
    assert(out(("A", "A"))._1 == 3L)
    assert(out(("A", "A"))._2 ==
      r6(ln(6.0) - (2.0 * ln(3.0) + ln(2.0)) / 3.0))
    assert(out(("A", "B"))._2 == r6(ln(5.0) - 2.0 * ln(2.0) / 3.0))
    assert(out(("B", "A"))._2 == r6(ln(6.0) - ln(3.0) / 2.0))
    assert(out(("B", "B"))._2 == r6(ln(5.0) - (ln(2.0) + ln(2.0)) / 2.0))
    // self-entropy must be the cheapest model for each source
    assert(out(("A", "A"))._2 < out(("A", "B"))._2)
    assert(out(("B", "B"))._2 < out(("B", "A"))._2)
  }

  test("crossSourceCrossEntropy: disjoint vocabularies still emit pairs") {
    val df = Seq(("A", "x x"), ("B", "z")).toDF("source", "text")
    val out = TextOps.crossSourceCrossEntropy(df, "source", "text")
      .collect()
    assert(out.length == 4)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // H(A‖B) has no matched words: ln(N_B + V) = ln(1 + 2) exactly
    val ab = out.find(r => r.getString(0) == "A" && r.getString(1) == "B").get
    assert(ab.getDouble(3) == r6(math.log(3.0)))
  }

  test("goodTuringCard: hand-counted frequency of frequencies") {
    // tokens: a×3, b×2, c×1, d×1 → N=7, V=4; N1=2, N2=1, N3=1
    val df = Seq("a a a b", "b c d").toDF("text")
    val out = TextOps.goodTuringCard(df, "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L).getLong(1) == 2L)
    assert(out(2L).getLong(1) == 1L && out(3L).getLong(1) == 1L)
    assert(out(1L).getDouble(2) == r6(2.0 / 7.0)) // mass of singletons
    // r* (1) = 2·N2/N1 = 1; r*(2) = 3·N3/N2 = 3; r*(3) null (no N4)
    assert(out(1L).getDouble(4) == 1.0)
    assert(out(2L).getDouble(4) == 3.0)
    assert(out(3L).isNullAt(4))
    // p0 = N1/N on the r=1 row only
    assert(out(1L).getDouble(5) == r6(2.0 / 7.0))
    assert(out(2L).isNullAt(5))
  }

  test("vocabRichnessCard: hand-computed Chao1 and coverage") {
    // a×3, b×2, c×1, d×1 → N=7, V=4, f1=2, f2=1
    val df = Seq("a a a b", "b c d").toDF("text")
    val r = TextOps.vocabRichnessCard(df, "text").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L)
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L)
    assert(r.getDouble(4) == r6(4.0 + 2.0 * 1.0 / (2.0 * 2.0)))
    assert(r.getDouble(5) == r6(1.0 - 2.0 / 7.0))
    assert(r.getDouble(6) == r6(math.log(4.0) / math.log(7.0)))
    // no singletons → chao1 = V exactly, coverage 1
    val closed = Seq("x x y y").toDF("text")
    val c = TextOps.vocabRichnessCard(closed, "text").collect().head
    assert(c.getDouble(4) == 2.0 && c.getDouble(5) == 1.0)
  }

  test("hillTailIndex: hand-computed alpha on a tiny tail") {
    // counts: a=8, b=4, c=2, d=1 → k=3, cutoff=1,
    // α = 3/(ln8 + ln4 + ln2)
    val df = Seq(("a " * 8) + ("b " * 4) + ("c c d")).toDF("text")
    val r = TextOps.hillTailIndex(df, "text", k = 3).collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L)
    val s = Seq(8.0, 4.0, 2.0).map(c =>
      BigDecimal(math.log(c) - math.log(1.0))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble
    assert(r.getDouble(2) == r6(3.0 / s))
    // all-equal top counts → Σ = 0 → alpha null
    val flat = Seq("a b c d e f").toDF("text")
    val f = TextOps.hillTailIndex(flat, "text", k = 3).collect().head
    assert(f.isNullAt(2))
  }

  test("conditionalBigramEntropy: near-deterministic text, hand values") {
    // 'a b a b …' (20 tokens): bigrams (a,b)×10 at ln(10/10)=0 and
    // (b,a)×9 at ln(9/10) — the final b has no successor, so the
    // estimator's only nonzero term is the boundary one; H(w) = ln 2
    val df = Seq(Seq.fill(10)("a b").mkString(" ")).toDF("text")
    val r = TextOps.conditionalBigramEntropy(df, "text").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def t12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    assert(r.getLong(0) == 19L)
    val hu = -Seq(10.0 / 20.0, 10.0 / 20.0)
      .map(p => t12(p * math.log(p))).sum.toDouble
    val hc = -(t12((10.0 / 19.0) * math.log(10.0 / 10.0)) +
      t12((9.0 / 19.0) * math.log(9.0 / 10.0))).toDouble
    assert(r.getDouble(1) == r6(hu))
    assert(r.getDouble(2) == r6(hc))
    assert(r.getDouble(3) == r6(hu - hc))
    // context buys almost all of the entropy here
    assert(r.getDouble(2) < 0.1 * r.getDouble(1))
  }

  test("tokenBurstiness: clumped token has higher VMR than spread one") {
    // 'the' appears once in every doc (VMR 0 — perfectly even);
    // 'topic' appears 4 times in one doc only (maximal clumping)
    val docs = (1L to 8L).map { i =>
      (i, if (i == 1L) "the topic topic topic topic" else "the filler" + i)
    }
    val df = docs.toDF("doc_id", "text")
    val out = TextOps.tokenBurstiness(df, "doc_id", "text", k = 2)
      .collect().map(r => r.getString(1) -> r).toMap
    assert(out.contains("the") && out.contains("topic"))
    assert(out("the").getLong(3) == 8L) // doc_freq
    assert(out("the").getDouble(5) == 0.0) // one per doc → VMR 0
    assert(out("topic").getDouble(5) > 1.0,
      s"topic vmr ${out("topic").getDouble(5)}")
  }

  test("mixDiversityCard: uniform sources maximize effective count") {
    val uni = (for { s <- Seq("a", "b", "c", "d"); i <- 0 until 5 }
      yield (s, i)).toDF("source", "i")
    val r = TextOps.mixDiversityCard(uni, "source").collect().head
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getLong(0) == 20L && r.getLong(1) == 4L)
    assert(r.getDouble(3) == 4.0) // effective sources = true count
    assert(r.getDouble(4) == 0.25 && r.getDouble(5) == 0.25)
    // skewed: one source dominates → effective sources collapse
    val skew = ((0 until 17).map(i => ("a", i)) ++
      Seq(("b", 1), ("c", 2), ("d", 3))).toDF("source", "i")
    val s = TextOps.mixDiversityCard(skew, "source").collect().head
    assert(s.getDouble(3) < 2.0, s"effective ${s.getDouble(3)}")
    assert(s.getDouble(5) == r6(17.0 / 20.0))
  }
}
