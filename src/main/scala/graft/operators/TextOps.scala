package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: tokenization,
  * quality scoring, heuristic language ID, fingerprinting. All pure
  * `functions._` column expressions — codegen'd, no UDFs, embarrassingly
  * parallel (per-row, no shuffle), so they scale linearly to 100 TB of
  * documents.
  *
  * The reference has no text surface; these extend its windowed-feature
  * design (`/root/reference/src/data/preprocessing.py:101-137`) to the
  * document domain per the engine's north star.
  */
object TextOps {

  /** Whitespace tokens of a single-space-separated document. */
  def tokens(text: Column): Column = split(trim(text), " ")

  /** Count of tokens from `words` appearing in `toks`. */
  def tokenMatches(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Token statistics per document: token count, a BPE-ish subword estimate
    * (chars/4, the standard rule-of-thumb), and average token length.
    */
  def withTokenStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_chars_text", length(col(textCol)).cast("long"))
      .withColumn("n_subwords_est",
        ceil(length(col(textCol)) / 4.0).cast("long"))
      .withColumn("avg_token_len",
        (length(trim(col(textCol))) - (size(toks) - 1)) / size(toks))
  }

  /** Stopword ratio + composite quality score. Deterministic double
    * arithmetic (ratios of exact integers), portable across engines.
    */
  def withQuality(df: DataFrame, textCol: String, stopwords: Seq[String]): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    val nStop = tokenMatches(toks, stopwords)
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("stop_ratio", round(nStop / nTok.cast("double"), 6))
      .withColumn("quality_score",
        round(least(nTok / 100.0, lit(1.0)) * (lit(1.0) - nStop / nTok.cast("double")), 6))
  }

  /** Heuristic language ID: marker-token ratios with fixed thresholds and a
    * deterministic decision order. (An n-gram profile model is the scale-up
    * path; the contract here is a pure, portable column expression.)
    */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = size(toks).cast("double")
    val theRatio = tokenMatches(toks, Seq("the")) / nTok
    val aRatio = tokenMatches(toks, Seq("a")) / nTok
    df.withColumn("the_ratio", round(theRatio, 6))
      .withColumn("a_ratio", round(aRatio, 6))
      .withColumn("lang_pred",
        when(theRatio >= 0.04, "en")
          .when(aRatio >= 0.04, "fr")
          .otherwise("und"))
  }

  /** 64-bit document fingerprint over word shingles (rolling-hash style):
    * xxhash64 of each shingle, combined order-independently. Used for
    * near-dup blocking and content addressing.
    */
  def fingerprint(text: Column, shingleSize: Int): Column = {
    val sh = wordShingles(text, shingleSize)
    aggregate(transform(sh, s => xxhash64(s)), lit(0L), (acc, h) => acc.bitwiseXOR(h))
  }

  /** Canonical text normalization (the pre-tokenization scrub): lowercase,
    * strip every non-alphanumeric-space character, collapse whitespace
    * runs, trim. Pure codegen'd string expressions, engine-portable regex
    * (no lookarounds/classes that differ between Java regex and RE2).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** PII redaction for a training corpus: emails and phone-shaped numbers
    * replaced by typed placeholder tokens, plus match counts for audit. The
    * patterns are deliberately simple and portable; a production pass would
    * swap in jurisdiction-specific pattern packs behind the same shape.
    */
  private val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  private val phoneRe = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"

  def redactPii(df: DataFrame, textCol: String): DataFrame = df
    .withColumn("n_emails",
      size(regexp_extract_all(col(textCol), lit(emailRe), lit(0))))
    .withColumn("n_phones",
      size(regexp_extract_all(
        regexp_replace(col(textCol), emailRe, "<EMAIL>"), lit(phoneRe), lit(0))))
    .withColumn("text_redacted",
      regexp_replace(
        regexp_replace(col(textCol), emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"))

  /** Repetition quality metrics (the Gopher-rules family): per document,
    * the duplicate-token fraction (1 − distinct/total, a pure projection)
    * and the top-bigram fraction (most frequent bigram's share of all
    * bigrams — boilerplate and spam pages score high). The bigram mode
    * needs a per-(doc, bigram) count: one explode + two hash aggregations,
    * both keyed by document — shuffle-bounded, no global state, linear at
    * corpus scale.
    */
  def withRepetitionStats(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val base = df.select(col(idCol),
      size(toks).cast("long").as("n_tokens"),
      round(lit(1.0) - size(array_distinct(toks)) / size(toks).cast("double"), 6)
        .as("dup_token_frac"))
    val rep = df
      .select(col(idCol), explode(wordShingles(col(textCol), 2)).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(max(col("c")) / sum(col("c")).cast("double"), 6)
        .as("top_bigram_frac"))
    base.join(rep, idCol)
  }

  /** Top-`topK` TF-IDF terms per document (keyword extraction): term
    * frequencies and document frequencies by two hash aggregations, idf via
    * the smoothed sklearn formula ln((N+1)/(df+1))+1, ranked per document.
    *
    * Scale posture: the doc-count is a 1-row aggregate broadcast into the
    * scoring join (never a driver-side `count()` baked into the plan); the
    * df join shuffles on the term, the only unbounded key, and the ranking
    * window partitions BY DOCUMENT — no global ordering anywhere. Scores are
    * rounded to 6 decimals BEFORE ranking so tie order (score desc, term
    * asc) is total and engine-portable.
    */
  def tfIdfTopTerms(df: DataFrame, idCol: String, textCol: String,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        (log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + lit(1.0)), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= topK)
      .select(col(idCol), col("term"), col("tf"), col("tfidf"), col("rank"))
  }

  /** Unigram language-model corpus statistics per document: how "ordinary"
    * a document's vocabulary is relative to the corpus it lives in. For
    * each document: `avg_token_freq` (mean corpus term frequency of its
    * tokens — boilerplate scores high, novel text low) and `rare_frac`
    * (share of token occurrences whose corpus frequency is below
    * `rareBelow` — OCR noise and codey junk score high). The per-doc
    * numerator is an exact BIGINT sum, so results are partition-order-free.
    *
    * Scale posture: one explode, one term-keyed aggregation for the corpus
    * LM (the only unbounded-key shuffle), one join back, one doc-keyed
    * aggregation — the same linear shape as [[tfIdfTopTerms]].
    */
  def tokenLmStats(df: DataFrame, idCol: String, textCol: String,
      rareBelow: Long = 3): DataFrame = {
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("tok"))
    val lm = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    toks.join(lm, "tok")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(col("c")).as("sum_c"),
        sum(when(col("c") < rareBelow, 1L).otherwise(0L)).as("n_rare"))
      .select(col(idCol), col("n_tokens"),
        round(col("sum_c") / col("n_tokens").cast("double"), 6)
          .as("avg_token_freq"),
        round(col("n_rare") / col("n_tokens").cast("double"), 6)
          .as("rare_frac"))
  }

  /** Character-distribution quality metrics per document: Shannon entropy
    * (nats) and Simpson diversity (1 − Σp²) of the character histogram,
    * plus the top character's share. Low-entropy documents are padding/
    * repetition; extreme top-char share flags separator junk. One explode +
    * two doc-keyed hash aggregations — linear, no unbounded key (the
    * histogram key is (doc, char)).
    *
    * Simpson and top-share are pure rational arithmetic over integer
    * counts; entropy uses `ln` (the same engine-portable-at-6-decimals
    * surface [[tfIdfTopTerms]]' idf already relies on).
    */
  def withCharDiversity(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol), explode(split(col(textCol), "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_chars"),
        count(lit(1)).as("n_distinct_chars"),
        max(col("c")).as("max_c"),
        sum(col("c") * col("c")).as("sum_sq"),
        // -Σ c·ln(c) accumulated exactly in decimal; folded into the
        // entropy identity below so the per-doc result is order-free
        sum((col("c") * log(col("c").cast("double")))
          .cast("decimal(28,10)")).as("sum_clnc"))
      .select(col(idCol), col("n_chars"), col("n_distinct_chars"),
        round(lit(1.0) -
          col("sum_sq") / (col("n_chars") * col("n_chars")).cast("double"), 6)
          .as("simpson"),
        round(col("max_c") / col("n_chars").cast("double"), 6)
          .as("top_char_share"),
        // H = ln(n) − (Σ c·ln c)/n
        round(log(col("n_chars").cast("double")) -
          col("sum_clnc").cast("double") / col("n_chars").cast("double"), 6)
          .as("entropy_nats"))

  /** Word n-gram shingles as space-joined strings. Documents shorter than
    * `n` tokens yield a single shingle of the whole text.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))
  }

  /** Per-document bigram log-probability under the corpus's own bigram LM
    * (P(w₂|w₁) = corpus count(w₁ w₂) / corpus count(w₁·) as bigram
    * *context*) and the resulting perplexity — the LM-based quality
    * filter of an LLM data pipeline: boilerplate scores low perplexity,
    * gibberish high, and percentile cuts on this column are the classic
    * corpus-cleaning step (the bigram upgrade of [[tokenLmStats]]'s
    * unigram signal).
    *
    * Every probability is a ratio of exact corpus counts (no smoothing
    * needed: a document's own bigrams always have corpus count ≥ 1);
    * ln terms accumulate as exact decimals per document. Shuffles: one
    * bigram-keyed count, one bigram-keyed join, one doc-keyed aggregate.
    */
  /** Zipf-law fit of the corpus head vocabulary: closed-form OLS of
    * ln(freq) on ln(rank) over the `maxRank` most frequent terms. Natural
    * corpora slope ≈ −1; a synthetic or template-stamped corpus deviates
    * hard, so the slope is a one-number corpus-authenticity screen.
    *
    * The head cap is the scale contract: a 100 TB corpus has 10⁸–10⁹
    * distinct terms, and ranking ALL of them needs a global sort through
    * one task. Fitting over the top-N head is the standard Zipf
    * methodology anyway (the hapax-legomena tail flattens the log-log
    * line), and `orderBy.limit` plans as TakeOrderedAndProject —
    * per-partition top-N, merge of N rows — never a full-vocabulary
    * single-partition exchange. The rank window then runs over the capped
    * (≤ maxRank rows) frame, and the regression is exact-decimal
    * sufficient statistics.
    */
  def zipfFit(df: DataFrame, textCol: String,
      maxRank: Int = 100000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = df
      .select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
    val head = freq.orderBy(col("f").desc, col("term")).limit(maxRank)
    val ranked = head.withColumn("r",
      row_number().over(Window.orderBy(col("f").desc, col("term"))))
    val pts = ranked.select(log(col("r").cast("double")).as("x"),
      log(col("f").cast("double")).as("y"))
    pts.agg(
        count(lit(1)).as("n_terms"),
        sum(col("x").cast("decimal(28,12)")).cast("double").as("__sx"),
        sum(col("y").cast("decimal(28,12)")).cast("double").as("__sy"),
        sum((col("x") * col("y")).cast("decimal(28,12)")).cast("double")
          .as("__sxy"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).cast("double")
          .as("__sxx"))
      // a single-term vocabulary has zero rank variance — the fit is
      // undefined (null), not a divide-by-zero (ANSI throws on 0/0)
      .withColumn("__den",
        col("n_terms") * col("__sxx") - col("__sx") * col("__sx"))
      .withColumn("zipf_slope",
        when(col("__den") =!= 0.0,
          round((col("n_terms") * col("__sxy") - col("__sx") * col("__sy")) /
            col("__den"), 6)))
      .withColumn("intercept",
        when(col("__den") =!= 0.0,
          round((col("__sy") -
            ((col("n_terms") * col("__sxy") - col("__sx") * col("__sy")) /
             col("__den")) * col("__sx")) / col("n_terms"), 6)))
      .select(col("n_terms"), col("zipf_slope"), col("intercept"))
  }

  def bigramPerplexity(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    // id-keyed fan-out before the per-token bigram expansion (guide §8);
    // the final per-doc aggregate reuses the exchange
    val bigrams = graft.operators.ParOps.fanOut(
        df.select(col(idCol), col(textCol)), Seq(col(idCol)), weight = 16.0)
      .select(col(idCol),
        explode(transform(
          sequence(lit(1), greatest(size(toks) - 1, lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(2))))).as("bg"))
      // a 1-token document yields its lone token as a degenerate "bigram";
      // drop anything without a space (no transition to score)
      .filter(col("bg").contains(" "))
    val bgCount = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("__c2"))
    val ctxCount = bgCount
      .groupBy(substring_index(col("bg"), " ", 1).as("__w1"))
      .agg(sum(col("__c2")).as("__c1"))
    // context join stays a plain equi-join: the context table is the
    // corpus VOCABULARY, which at real scale is too large to assert
    // broadcastable — Catalyst/AQE picks broadcast when it actually fits
    val probs = bgCount.join(ctxCount,
        substring_index(col("bg"), " ", 1) === col("__w1"))
      .select(col("bg"),
        log(col("__c2").cast("double") / col("__c1")).as("__logp"))
    bigrams.join(probs, "bg")
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_bigrams"),
        (sum(col("__logp").cast("decimal(28,12)")).cast("double") /
          count(lit(1))).as("__avg"))
      .select(col(idCol), col("n_bigrams"),
        round(col("__avg"), 6).as("avg_logp"),
        round(exp(-col("__avg")), 6).as("ppl"))
  }

  /** BM25 top-`topK` document retrieval for a fixed bag of query terms —
    * the lexical-retrieval half of a RAG / data-curation stack (the dense
    * half is the ANN family, q15/q16/q52). Standard Robertson/Sparck-Jones
    * BM25: idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)), the tf component
    * saturating with `k1` and length-normalized with `b` against the mean
    * document length.
    *
    * Scale posture: the per-term explode is filtered to the QUERY terms
    * before any shuffle (a handful of postings rows per matching doc, not
    * the full inverted index); doc lengths are a doc-keyed aggregate;
    * corpus stats are a 1-row broadcast; the final top-k is `orderBy.limit`
    * → TakeOrderedAndProject, never a global sort. Per-term contributions
    * round to 6 decimals and accumulate as exact decimals, so the doc
    * score is addition-order-free; ln/division portability at 6 decimals
    * is the proven [[tfIdfTopTerms]] surface.
    */
  def bm25TopDocs(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], topK: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(topK >= 1, "topK must be >= 1")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("term"))
    val dl = toks.groupBy(col(idCol)).agg(count(lit(1)).as("dl"))
    val corpus = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = toks.filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    // dl·N/Σdl: exact integer numerator, one IEEE division — identical
    // operation order on the oracle side
    val relLen = (col("dl") * col("n_docs")).cast("double") /
      col("sum_dl").cast("double")
    val contrib = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * relLen))
    tf.join(dfreq, "term")
      .join(dl, idCol)
      .crossJoin(broadcast(corpus))
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_terms_hit"),
        sum(round(contrib, 6).cast("decimal(18,6)")).cast("double")
          .as("bm25"))
      .orderBy(col("bm25").desc, col(idCol))
      .limit(topK)
  }

  /** Character n-gram profile language ID — the scale-up path
    * [[withLangId]]'s scaladoc promises (Cavnar–Trenkle): per-language
    * profiles = the `topK` most frequent character trigrams of the
    * labeled corpus; a document's prediction is the language whose
    * profile overlaps most of its distinct trigrams (ties break on the
    * language code). Self-trained on the input's own label column and
    * reported per document next to the truth label — the confusion feed.
    *
    * Scale posture: the char-trigram keyspace is bounded by |charset|³
    * (unlike word vocabularies), so the per-language rank window runs
    * over a BOUNDED frame; profiles are langs×topK rows — broadcast —
    * and scoring is one distinct-trigram explode + a broadcast join +
    * one doc-keyed argmax (min over the (−matches, lang) struct). All
    * counts exact integers; fully oracle-replayable.
    */
  def charNgramLangId(df: DataFrame, idCol: String, langCol: String,
      textCol: String, topK: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tris = transform(
      sequence(lit(1), greatest(length(col(textCol)) - 2, lit(1))),
      i => col(textCol).substr(i, lit(3)))
    val profiles = df
      .select(col(langCol).as("__lang"), explode(tris).as("tri"))
      .groupBy(col("__lang"), col("tri")).agg(count(lit(1)).as("__c"))
      .withColumn("__r", row_number().over(Window.partitionBy(col("__lang"))
        .orderBy(col("__c").desc, col("tri"))))
      .filter(col("__r") <= topK)
      .select(col("__lang"), col("tri"))
    val docTris = df
      .select(col(idCol), array_distinct(tris).as("__ts"))
      .select(col(idCol), explode(col("__ts")).as("tri"))
    val scored = docTris.join(broadcast(profiles), "tri")
      .groupBy(col(idCol), col("__lang"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("__n")).as("__neg"), col("__lang").as("__l")))
        .as("__best"))
      .select(col(idCol), col("__best.__l").as("lang_pred_ngram"),
        (-col("__best.__neg")).as("n_profile_matches"))
    df.select(col(idCol), col(langCol))
      .join(scored, Seq(idCol), "left")
      .select(col(idCol), col(langCol),
        coalesce(col("lang_pred_ngram"), lit("und")).as("lang_pred_ngram"),
        coalesce(col("n_profile_matches"), lit(0L)).as("n_profile_matches"))
  }

  /** Vocabulary construction — the tokenizer-vocab builder of a training
    * pipeline: the `maxVocab` most frequent terms (with at least
    * `minCount` occurrences) get dense ids in (count desc, term asc)
    * order, each carrying its cumulative token-coverage fraction — the
    * curve that tells you what OOV rate a vocab size buys.
    *
    * Scale posture: the term count is the one unbounded-key shuffle; the
    * head cap plans as TakeOrderedAndProject (the q140 Zipf contract —
    * never a full-vocabulary single-task sort) and the rank/cumsum
    * windows run over the ≤ maxVocab frame. The coverage denominator is
    * the TOTAL token count (a 1-row broadcast), so dropped-tail mass is
    * visible as the gap below 1.0, not silently renormalized away.
    */
  def buildVocabulary(df: DataFrame, textCol: String, maxVocab: Int,
      minCount: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val counts = df.select(explode(tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_total"))
    val head = counts.filter(col("n") >= minCount)
      .orderBy(col("n").desc, col("term")).limit(maxVocab)
    val w = Window.orderBy(col("n").desc, col("term"))
    head
      .withColumn("token_id", row_number().over(w).cast("long") - 1L)
      .withColumn("__cum", sum(col("n")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("token_id"), col("term"), col("n"),
        round(col("__cum") / col("n_total").cast("double"), 6)
          .as("cum_coverage"))
  }

  /** Cross-document boilerplate mining: the `k` most frequent word
    * `n`-grams corpus-wide with total occurrences and document frequency —
    * the detector for repeated headers/footers/license blocks that
    * pre-training curation strips (within-doc repetition is
    * [[withRepetitionStats]]; this is the ACROSS-doc sibling). Shape: one
    * Generate (per-row n-gram array explode), a two-level aggregation
    * ((ngram, doc) counts → per-ngram totals, so document frequency
    * needs no count-distinct expand), a `minDf` tail cut at aggregation
    * time, and one TakeOrdered — no joins, no global sort, safe at any
    * corpus size. Full (count desc, df desc, ngram) tie-break keeps the
    * cut deterministic and engine-portable.
    */
  def boilerplateNgrams(df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, minDf: Int = 2): DataFrame = {
    require(n >= 1 && k >= 1 && minDf >= 1, "n, k, minDf must be >= 1")
    val toks = tokens(col(textCol))
    // docs shorter than n tokens contribute nothing (a bare sequence(1,
    // size-n+1) would run DOWNWARD for short docs and fabricate grams)
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
    // weight 2 (NOT the shingle-hash sites' 32–64): a single n-gram
    // explode into a two-level count is cheap per byte, and fanning this
    // ~600 KB frame to the full core count regressed 3× on a cold host
    // (the round-15 q185 verdict finding — width must track work)
    graft.operators.ParOps.fanOut(
        df.select(col(idCol), col(textCol)), Seq(col(idCol)), weight = 2.0)
      .select(col(idCol).as("__id"), explode(grams).as("ngram"))
      .groupBy(col("ngram"), col("__id"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col("ngram"))
      .agg(sum(col("__c")).as("n_occurrences"),
        count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= minDf)
      .orderBy(col("n_occurrences").desc, col("n_docs").desc, col("ngram"))
      .limit(k)
  }

  /** Sliding token-window chunking — the context-window builder of an LLM
    * pre-training pipeline: each document becomes ⌈len/stride⌉-ish chunks
    * of `chunkSize` tokens starting every `stride` tokens (overlapping
    * when stride < chunkSize; the final chunk keeps the tail and may be
    * short). Emits one row per chunk with its token span and an MD5
    * content address (chunk-level dedup plugs straight into q11's exact
    * dedup on that column).
    *
    * Pure per-row array arithmetic (sequence/slice/posexplode) — no
    * shuffle at all; output size is input tokens × (chunkSize/stride),
    * the same linear blow-up any chunker pays.
    */
  def slidingTokenChunks(df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0, "chunkSize and stride must be > 0")
    val toks = tokens(col(textCol))
    val nTok = size(toks)
    // starts 1, 1+stride, … while start ≤ len — covers every token,
    // yields exactly one chunk for docs shorter than chunkSize
    val starts = sequence(lit(1), nTok, lit(stride))
    df.select(col(idCol), toks.as("__toks"),
        posexplode(starts).as(Seq("chunk_idx", "start_token")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_token").cast("long").as("start_token"),
        slice(col("__toks"), col("start_token"), lit(chunkSize)).as("__chunk"))
      .select(col(idCol), col("chunk_idx"), col("start_token"),
        size(col("__chunk")).cast("long").as("n_chunk_tokens"),
        md5(concat_ws(" ", col("__chunk"))).as("chunk_hash"))
  }

  /** Robust-winnowing document fingerprints (the MOSS algorithm,
    * Schleimer–Wilkerson–Aiken SIGMOD'03): hash every word `k`-gram with
    * a portable 40-bit MD5-prefix hash, slide a `w`-window over
    * consecutive k-gram hashes, and keep each window's MINIMUM hash
    * (ties → rightmost position). Guarantee: two documents sharing any
    * token run of length ≥ w + k − 1 share at least one fingerprint —
    * the substring-granular sibling of document-level MinHash (q27).
    *
    * The min-with-tiebreak is ONE windowed `min` of a single BIGINT:
    * `hash · 2²⁰ + (2²⁰ − 1 − pos)` — low bits invert the position so the
    * smallest encoded value is the smallest hash at its RIGHTMOST
    * occurrence; both halves decode exactly (hash < 2⁴⁰, so the encoding
    * stays under 2⁶⁰ with no overflow). Documents are fingerprinted over
    * their first 2²⁰ k-grams (the bounded-state contract; a corpus doc
    * beyond ~1M tokens is chunked upstream by [[slidingTokenChunks]]).
    *
    * Scale shape: per-document projection + ONE bounded window pass
    * partitioned by document — no corpus-wide state, no shuffle beyond
    * the per-doc repartition, linear in corpus size.
    */
  def winnowingFingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1 && w >= 1, s"k and w must be >= 1, got k=$k w=$w")
    val posCap = 1048576L // 2^20
    val toks = tokens(col(textCol))
    // id-keyed fan-out BEFORE the k-gram expansion: provides exactly the
    // hashpartitioning(id) the window below requires, so the post-explode
    // exchange disappears AND the md5 grams compute wide (guide §2.4/§8)
    val grams = graft.operators.ParOps.fanOut(
        df.select(col(idCol), col(textCol)), Seq(col(idCol)),
        weight = 16.0) // md5 per k-gram feeds the windowed min
      .filter(size(toks) >= k)
      .select(col(idCol),
        posexplode(transform(sequence(lit(1), size(toks) - (k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k))))).as(Seq("pos", "ng")))
      .filter(col("pos") < posCap)
    val h = conv(substring(md5(col("ng")), 1, 10), 16, 10).cast("long")
    val enc = h * lit(posCap) + (lit(posCap - 1) - col("pos"))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .withColumn("__fp", min(enc).over(win))
      .filter(col("pos") >= w - 1) // only FULL windows select
      .select(col(idCol),
        (col("__fp").cast("decimal(38,0)") / lit(posCap)).cast("long")
          .as("fp_hash"),
        (lit(posCap - 1) - pmod(col("__fp"), lit(posCap))).as("fp_pos"))
      .distinct()
  }

  /** Substring-level near-duplicate CANDIDATE PAIRS from shared winnowing
    * fingerprints: distinct per-doc fingerprint hashes, boilerplate
    * buckets dropped (hashes appearing in more than `maxDf` docs — the
    * q39 capped-postings contract, which also bounds the join fan-out at
    * corpus scale), equi-join on the hash, pairs ranked by shared count.
    * `orderBy.limit` plans as TakeOrdered — no global sort.
    */
  def winnowingNearDupPairs(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, maxDf: Long = 50L, minShared: Long = 2L,
      topK: Int = 50): DataFrame = {
    val fps = winnowingFingerprints(df, idCol, textCol, k, w)
      .select(col(idCol), col("fp_hash")).distinct()
    val dfreq = fps.groupBy(col("fp_hash"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= maxDf && col("__df") >= 2)
    val keep = fps.join(dfreq, "fp_hash")
    val a = keep.select(col("fp_hash"), col(idCol).as("doc_a"))
    val b = keep.select(col("fp_hash"), col(idCol).as("doc_b"))
    a.join(b, "fp_hash")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(topK)
  }

  /** Train–eval contamination audit — the n-gram collision check run
    * before trusting a held-out benchmark (the GPT-3 appendix-C /
    * C4-audit recipe): the hash-held-out eval slice's DISTINCT word
    * n-grams probe the train slice's distinct n-gram set; every eval doc
    * reports its overlap fraction and a contaminated verdict at
    * `threshold`.
    *
    * Scale shape: grams join on a 60-bit MD5 hash (fixed-width shuffle
    * keys, never the gram strings); the train side is a distinct hash
    * SET; eval docs are a small hash slice, so the probe side broadcasts.
    * Docs shorter than n tokens carry zero grams and report a NULL
    * fraction (no fabricated 0/0).
    */
  def contaminationOverlap(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 5, evalBuckets: Int = 1, threshold: Double = 0.2): DataFrame = {
    require(n >= 1 && evalBuckets >= 1 && evalBuckets < 20,
      "need n >= 1 and evalBuckets in [1, 20)")
    val isEval = SplitOps.hashBucket(col(idCol), 20) < evalBuckets
    val toks = tokens(col(textCol))
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => conv(substring(md5(concat_ws(" ", slice(toks, i + 1, lit(n)))),
          1, 15), 16, 10).cast("long")))
      .otherwise(array().cast("array<long>"))
    val trainGrams = docs.filter(!isEval)
      .select(explode(grams).as("g")).distinct()
    val evalGrams = docs.filter(isEval)
      .select(col(idCol).as("doc_id"), explode(array_distinct(grams)).as("g"))
    val hits = evalGrams
      .join(trainGrams.withColumn("__hit", lit(1L)), Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
    docs.filter(isEval).select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_hit", coalesce(col("n_hit"), lit(0L)))
      .withColumn("overlap_frac",
        when(col("n_grams") > 0L,
          round(col("n_hit").cast("double") /
            col("n_grams").cast("double"), 6)))
      .withColumn("contaminated",
        when(col("overlap_frac") >= threshold, 1L).otherwise(0L))
      .orderBy(col("doc_id"))
  }

  /** Unigram-LM perplexity filter — the CCNet-style quality gate: a
    * unigram language model with add-one smoothing is "trained" on the
    * hash-majority train slice (token counts — ONE aggregation), and each
    * eval-slice document is scored with its cross-entropy
    * H = −Σ ln p(tok)/n and perplexity e^H. Unseen tokens score as the
    * UNK mass 1/(N+V). High-perplexity documents are the gibberish /
    * wrong-language / boilerplate candidates a curation pass drops.
    *
    * Scale shape: the "model" is the train vocabulary count frame keyed
    * by token — ln p computed ONCE per vocab row, then one equi-join
    * against the eval token stream and a per-doc decimal-sum aggregation.
    * No driver-side model, no sort; perplexity is computed from the
    * ROUNDED cross-entropy so both engines exponentiate the same double.
    */
  def unigramPerplexity(docs: DataFrame, idCol: String, textCol: String,
      evalBuckets: Int = 1): DataFrame = {
    require(evalBuckets >= 1 && evalBuckets < 20,
      "evalBuckets must be in [1, 20)")
    val isEval = SplitOps.hashBucket(col(idCol), 20) < evalBuckets
    val toks = tokens(col(textCol))
    val train = docs.filter(!isEval)
      .select(explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    val scal = train.agg(sum(col("c")).as("__n"), count(lit(1)).as("__v"))
    // ln p per VOCAB row (not per occurrence): p = (c+1)/(N+V)
    val lm = train.crossJoin(broadcast(scal))
      .select(col("token"),
        log((col("c").cast("double") + lit(1.0)) /
          (col("__n").cast("double") + col("__v").cast("double")))
          .as("__lnp"))
    val evalToks = docs.filter(isEval)
      .select(col(idCol).as("doc_id"), explode(toks).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).as("__cnt"))
    val unkLnp = log(lit(1.0) /
      (col("__n").cast("double") + col("__v").cast("double")))
    val scored = evalToks
      .join(lm, Seq("token"), "left")
      .crossJoin(broadcast(scal))
      .withColumn("__lnp", coalesce(col("__lnp"), unkLnp))
      .groupBy(col("doc_id"))
      .agg(sum(col("__cnt")).as("n_tokens"),
        sum((col("__lnp") * col("__cnt").cast("double"))
          .cast("decimal(28,12)")).cast("double").as("__ll"))
      .withColumn("cross_entropy",
        round(-col("__ll") / col("n_tokens").cast("double"), 6))
      .withColumn("perplexity", round(exp(col("cross_entropy")), 6))
    docs.filter(isEval).select(col(idCol).as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("cross_entropy"), col("perplexity"))
      .orderBy(col("doc_id"))
  }

  /** χ² token–class association (the classic feature-selection statistic,
    * Yang & Pedersen 1997): for each observed (token, class) pair, the
    * 2×2 document-presence contingency A/B/C/D and
    * χ² = N·(AD−BC)² / ((A+B)(C+D)(A+C)(B+D)) — which tokens *identify* a
    * class (language markers, domain jargon, template artifacts) before
    * any model is trained. Top `k` tokens per class by χ² among tokens
    * with document frequency ≥ `minDf`.
    *
    * Scale shape: per-doc token presence comes from `array_distinct`
    * INSIDE the explode (no separate distinct shuffle over the token
    * stream); then two vocabulary-sized aggregations and one broadcast of
    * the |classes|-row totals. The per-class ranking window runs over the
    * vocabulary frame (≪ corpus). Only observed pairs are scored — a
    * token's χ² against a class it never appears in is the
    * negative-association tail feature selection ignores.
    *
    * All counts are exact integers cast to double with a FIXED
    * parenthesization, so both engines run the identical IEEE ops
    * (determinism, not exactness, is the contract beyond 2⁵³), rounded to
    * 6.
    */
  def chiSquareTokens(docs: DataFrame, idCol: String, textCol: String,
      classCol: String, k: Int = 10, minDf: Long = 5L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val present = docs.select(col(classCol).as("cls"),
        explode(array_distinct(split(trim(col(textCol)), " "))).as("token"))
      .filter(col("token") =!= "")
    val nDocs = docs.select(count(lit(1)).as("__n"))
    val perClass = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("__nc"))
    val pairCnt = present.groupBy(col("token"), col("cls"))
      .agg(count(lit(1)).as("__a"))
    val tokCnt = pairCnt.groupBy(col("token"))
      .agg(sum(col("__a")).as("__t"))
      .filter(col("__t") >= minDf)
    val d = pairCnt.join(tokCnt, "token")
      .join(broadcast(perClass), "cls")
      .crossJoin(broadcast(nDocs))
      .withColumn("__ad", col("__a").cast("double"))
      .withColumn("__bd", (col("__t") - col("__a")).cast("double"))
      .withColumn("__cd", (col("__nc") - col("__a")).cast("double"))
      .withColumn("__dd",
        (col("__n") - col("__nc") - (col("__t") - col("__a"))).cast("double"))
      .withColumn("__den",
        ((col("__ad") + col("__bd")) * (col("__cd") + col("__dd"))) *
         ((col("__ad") + col("__cd")) * (col("__bd") + col("__dd"))))
      // degenerate margins (e.g. a token present in EVERY document makes
      // C+D = 0) would give 0/0 = NaN, and NaN sorts above every number in
      // a descending Spark window — guard to null, which sorts last in
      // both engines
      .withColumn("chi2", when(col("__den") > 0.0, round(
        (col("__n").cast("double") *
          ((col("__ad") * col("__dd") - col("__bd") * col("__cd")) *
           (col("__ad") * col("__dd") - col("__bd") * col("__cd")))) /
        col("__den"), 6)))
    val w = Window.partitionBy(col("cls"))
      .orderBy(col("chi2").desc, col("token").asc)
    d.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("cls"), col("rank"), col("token"),
        col("__a").as("n_docs_in_class"), col("__t").as("n_docs_total"),
        col("chi2"))
      .orderBy(col("cls"), col("rank"))
  }

  /** PII pattern inventory: (kind, regex, replacement token), in
    * REDACTION order — email before SSN before IPv4 before phone, so the
    * narrower numeric patterns never fire inside an already-redacted
    * wider match. The set is deliberately ASCII-only (`\d`, `\b`,
    * bounded quantifiers, literal classes): Java regex (Spark codegen)
    * and RE2 (DuckDB) execute these identically, which is what makes the
    * scrub oracle-checkable.
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("phone", "\\b\\d{3}-\\d{4}\\b", "<PHONE>"))

  /** Per-document PII detection + redaction — the pre-training scrub
    * pass every 100 TB corpus gets before tokenization. Adds one
    * `n_<kind>` count column per [[piiPatterns]] entry (non-overlapping
    * matches against the RAW text, so counts are per-kind evidence
    * independent of redaction order) and a `redacted` column with the
    * patterns replaced in inventory order.
    *
    * Scale shape: pure codegen'd `regexp_extract_all`/`regexp_replace`
    * projections — per-row, zero shuffle, embarrassingly parallel; the
    * pattern set is a compile-time constant so every executor compiles
    * each regex once.
    */
  def piiRedact(df: DataFrame, textCol: String): DataFrame = {
    val counted = piiPatterns.foldLeft(df) { case (d, (kind, pat, _)) =>
      d.withColumn(s"n_$kind",
        size(regexp_extract_all(col(textCol), lit(pat), lit(0)))
          .cast("long"))
    }
    val red = piiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tok)) =>
      regexp_replace(c, pat, tok)
    }
    counted.withColumn("redacted", red)
  }

  /** Weak-supervision labeling-function diagnostics (the Snorkel
    * LFAnalysis card, Ratner et al. 2017): each labeling function is a
    * deterministic predicate → label rule with abstention; the card
    * reports, per LF, its vote count, coverage, overlap (votes on docs
    * where ANOTHER LF also voted) and conflict (votes where another LF
    * voted a DIFFERENT label) — the triage view that decides which
    * rules are worth keeping before any label model is fit.
    *
    * Scale shape: the votes frame is a union of |LF| filtered
    * projections over ONE shared scan; per-doc distinct-label stats are
    * one aggregation; the final card is |LF| rows. No joins wider than
    * votes × per-doc stats (broadcast-sized per-doc frame never
    * materializes driver-side — the join is on doc id).
    */
  def weakLabelDiagnostics(docs: DataFrame, idCol: String,
      lfs: Seq[(String, Column, String)]): DataFrame = {
    require(lfs.nonEmpty, "need at least one labeling function")
    val votes = lfs.map { case (name, pred, label) =>
      docs.filter(pred).select(col(idCol).as("doc_id"),
        lit(name).as("lf"), lit(label).as("label"))
    }.reduce(_.unionByName(_))
    val perDoc = votes.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("__nv"),
        countDistinct(col("label")).as("__nl"))
    val nDocs = docs.select(count(lit(1)).as("__n"))
    votes.join(perDoc, "doc_id")
      .groupBy(col("lf"))
      .agg(count(lit(1)).as("n_votes"),
        sum(when(col("__nv") > 1L, 1L).otherwise(0L)).as("n_overlap"),
        sum(when(col("__nl") > 1L, 1L).otherwise(0L)).as("n_conflict"))
      .crossJoin(broadcast(nDocs))
      .withColumn("coverage",
        round(col("n_votes").cast("double") / col("__n").cast("double"),
          6))
      .select(col("lf"), col("n_votes"), col("coverage"),
        col("n_overlap"), col("n_conflict"))
      .orderBy(col("lf"))
  }

  /** DSIR data selection (Xie et al. 2023, "Data Selection for Language
    * Models via Importance Resampling"): score every raw document by its
    * hashed-n-gram importance weight toward a TARGET distribution —
    * log w(d) = Σ_b cnt_b · (ln p_target(b) − ln p_raw(b)) with add-one
    * smoothing over a FIXED bucket space — and flag the top-k. The
    * modern "make the crawl look like the benchmark" selection pass;
    * composes the hashed-LM machinery (q212/q232) with the TakeOrdered
    * top-k contract (q140).
    *
    * Scale shape: both LMs are `buckets`-row frames (constant state
    * regardless of vocabulary — the hashing trick); the per-bucket
    * log-ratio is computed ONCE per bucket and broadcast; raw documents
    * shuffle only for their per-doc bucket-count aggregation; selection
    * is a TakeOrdered limit-k (never a global sort), broadcast back as
    * an id set. Decimal(28,12) weight sums — exact, order-independent.
    */
  def dsirSelection(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024, k: Int = 50): DataFrame = {
    require(buckets >= 2 && k >= 1, "need buckets >= 2 and k >= 1")
    val toks = tokens(col(textCol))
    val bucket = pmod(
      conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"),
      lit(buckets.toLong))
    def bucketCounts(slice: DataFrame): DataFrame = slice
      .select(explode(toks).as("token")).filter(col("token") =!= "")
      .withColumn("b", bucket)
      .groupBy(col("b")).agg(count(lit(1)).as("c"))
    val tb = bucketCounts(docs.filter(isTarget))
    val rb = bucketCounts(docs.filter(!isTarget))
    val nt = tb.agg(sum(col("c")).as("__nt"))
    val nr = rb.agg(sum(col("c")).as("__nr"))
    val v = lit(buckets.toDouble)
    val delta = rb.select(col("b"), col("c").as("c_r"))
      .join(tb.select(col("b"), col("c").as("c_t")), Seq("b"), "left")
      .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
      .select(col("b"),
        (log((coalesce(col("c_t"), lit(0L)).cast("double") + lit(1.0)) /
          (col("__nt").cast("double") + v)) -
         log((col("c_r").cast("double") + lit(1.0)) /
          (col("__nr").cast("double") + v))).as("delta"))
    val docBk = docs.filter(!isTarget)
      .select(col(idCol).as("doc_id"), explode(toks).as("token"))
      .filter(col("token") =!= "")
      .withColumn("b", bucket)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
    val lw = docBk.join(broadcast(delta), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum((col("delta") * col("cnt").cast("double"))
          .cast("decimal(28,12)")).cast("double").as("__lw"))
    val picked = lw.orderBy(col("__lw").desc, col("doc_id"))
      .limit(k).select(col("doc_id"), lit(1L).as("selected"))
    docs.filter(!isTarget).select(col(idCol).as("doc_id"))
      .join(lw, Seq("doc_id"), "left")
      .join(broadcast(picked), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        round(col("__lw"), 6).as("log_ratio"),
        coalesce(col("selected"), lit(0L)).as("selected"))
      .orderBy(col("doc_id"))
  }

  /** Multinomial Naive Bayes text classifier over a HASHED vocabulary
    * (the hashing trick: McCallum & Nigam 1998 NB on Weinberger et al.
    * 2009 feature hashing) — the supervised upgrade of q171's
    * self-trained profile ranking and the trainable-classifier shape
    * (fastText-era baseline) a curation pipeline uses for
    * language/quality routing. Tokens hash into `buckets` fixed slots
    * (60-bit MD5 polynomial, the q207 convention), so the model is
    * |classes|·`buckets` rows REGARDLESS of corpus vocabulary — bounded
    * state at 100 TB where a token-keyed model would grow with the
    * crawl. Add-one smoothing runs over the fixed bucket space
    * (V = `buckets`, a portable constant); the hash-minority slice
    * (`hashBucket(id, 20) < evalBuckets`) is scored by
    * ln prior + Σ cnt·ln p(bucket|class) with exact DECIMAL(28,12) sums
    * and argmax (score desc, class asc), and the confusion matrix of
    * truth × prediction comes back.
    *
    * Scale shape: training is ONE (class, bucket) aggregation over the
    * token stream; the model and the |classes|-row prior frame broadcast
    * to the eval side (no shuffle of eval tokens beyond the per-doc
    * bucket-count aggregation); the ×|classes| scoring fan-out is a
    * bounded multiplier on the (small) eval slice. Token-empty eval docs
    * fall back to the prior argmax rather than dropping out.
    */
  def naiveBayesLangClassify(docs: DataFrame, idCol: String,
      labelCol: String, textCol: String, buckets: Int = 512,
      evalBuckets: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2 && evalBuckets >= 1 && evalBuckets < 20,
      "need buckets >= 2 and evalBuckets in [1, 20)")
    val isEval = SplitOps.hashBucket(col(idCol), 20) < evalBuckets
    val toks = tokens(col(textCol))
    def bucketed(slice: DataFrame, keep: Column*): DataFrame =
      slice.select(keep :+ explode(toks).as("token"): _*)
        .filter(col("token") =!= "")
        .withColumn("b", pmod(
          conv(substring(md5(col("token")), 1, 15), 16, 10).cast("long"),
          lit(buckets.toLong)))
    val trainCnt = bucketed(docs.filter(!isEval), col(labelCol).as("cls"))
      .groupBy(col("cls"), col("b")).agg(count(lit(1)).as("c"))
    val labelTok = trainCnt.groupBy(col("cls"))
      .agg(sum(col("c")).as("n_tok"))
    val nTrain = docs.filter(!isEval).select(count(lit(1)).as("__n"))
    val classes = docs.filter(!isEval)
      .groupBy(col(labelCol).as("cls")).agg(count(lit(1)).as("n_docs_l"))
      .join(labelTok, Seq("cls"), "left")
      .withColumn("n_tok", coalesce(col("n_tok"), lit(0L)))
      .crossJoin(broadcast(nTrain))
      .select(col("cls"),
        log(col("n_docs_l").cast("double") /
          col("__n").cast("double")).as("ln_prior"),
        log(lit(1.0) / (col("n_tok").cast("double") +
          lit(buckets.toDouble))).as("ln_unseen"))
    val model = trainCnt.join(labelTok, "cls")
      .select(col("cls"), col("b"),
        log((col("c").cast("double") + lit(1.0)) /
          (col("n_tok").cast("double") + lit(buckets.toDouble))).as("ln_p"))
    val evalDocs = docs.filter(isEval)
      .select(col(idCol).as("doc_id"), col(labelCol).as("lang"))
    val evalCnt = bucketed(docs.filter(isEval), col(idCol).as("doc_id"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("cnt"))
    val scored = evalCnt.crossJoin(broadcast(classes))
      .join(broadcast(model), Seq("cls", "b"), "left")
      .groupBy(col("doc_id"), col("cls"), col("ln_prior"))
      .agg(sum((coalesce(col("ln_p"), col("ln_unseen")) *
        col("cnt").cast("double")).cast("decimal(28,12)"))
        .cast("double").as("__ll"))
      .withColumn("score", col("ln_prior") + col("__ll"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("cls").asc)
    val preds = scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("doc_id"), col("cls").as("pred_lang"))
    // token-empty eval docs: argmax over priors alone (one-row broadcast)
    val priorPick = classes
      .orderBy(col("ln_prior").desc, col("cls").asc).limit(1)
      .select(col("cls").as("__prior_pred"))
    evalDocs.join(preds, Seq("doc_id"), "left")
      .crossJoin(broadcast(priorPick))
      .withColumn("pred_lang",
        coalesce(col("pred_lang"), col("__prior_pred")))
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  /** PMI collocation extraction (Church & Hanks 1990): adjacent-token
    * bigrams with corpus count ≥ `minCount`, scored
    * PMI = ln(c₁₂·N / (c₁·c₂)) against unigram counts, top-k — the
    * multi-word-expression mining a tokenizer-vocab or quality pass
    * runs to find units that should be single tokens ("new york") and
    * boilerplate collocations. The min-count filter is what keeps PMI
    * from degenerating to rare-pair noise (its classic failure mode).
    *
    * Scale shape: one token explosion for unigrams, one bigram
    * explosion ([[bigramPerplexity]]'s machinery), two count
    * aggregations, two vocabulary equi-joins (Catalyst broadcasts when
    * the vocab fits), TakeOrdered top-k — never a global sort of the
    * bigram table.
    */
  def pmiCollocations(docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 30): DataFrame = {
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    // Consecutive spaces split to "" tokens — exclude them from the
    // unigram stream AND from bigram membership (the bpeMerges /
    // dsirSelection convention), else "" pollutes counts and empty-
    // member bigrams survive the contains(" ") gate (concat_ws keeps
    // empty strings). A bigram spanning a dropped "" is NOT re-formed:
    // positions stay those of the raw token array.
    val words = docs.select(explode(toks).as("w"))
      .filter(col("w") =!= "")
    val uni = words.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = words.agg(count(lit(1)).as("n"))
    val bg = docs.select(
        explode(transform(
          sequence(lit(1), greatest(size(toks) - 1, lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(2))))).as("bg"))
      .filter(col("bg").contains(" "))
      .groupBy(col("bg")).agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    val scored = bg
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), "w2")
      .crossJoin(broadcast(tot))
      .withColumn("pmi", round(log(
        col("c12").cast("double") * col("n").cast("double") /
          (col("c1").cast("double") * col("c2").cast("double"))), 6))
    scored
      .orderBy(col("pmi").desc, col("w1"), col("w2"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))).cast("long"))
      .select(col("rank"), col("w1"), col("w2"), col("c12"), col("c1"),
        col("c2"), col("pmi"))
      .orderBy(col("rank"))
  }

  /** Dunning log-likelihood keyness (Dunning 1993): for every (source,
    * term), the G² statistic of the 2×2 contingency of term count in
    * the source vs the rest of the corpus —
    *
    *   G² = 2·[a·ln(a/Eₐ) + b·ln(b/E_b)],  Eₐ = Nₛ(a+b)/N, E_b = Nᵣ(a+b)/N
    *
    * with the 0·ln0 = 0 convention. G² is the principled "what words
    * characterize this source" ranking (χ² over-rates rare terms); the
    * signed direction column says over- vs under-represented. The
    * source-profiling sibling of [[chi2Tokens]]-style label association
    * and the per-source input to corpus-mix debugging.
    *
    * Scale shape: one (source, term) count aggregation, a broadcast
    * join against the per-source token totals (|sources| rows), pure
    * codegen scoring, TakeOrdered top-k. Never a pairwise join.
    */
  def keynessCard(docs: DataFrame, srcCol: String, textCol: String,
      minCount: Long = 5L, k: Int = 30): DataFrame =
    keynessFromCells(keynessCells(docs, srcCol, textCol), minCount, k)

  /** The additive state behind [[keynessCard]]: one count per (source,
    * term) — a complete-mode streaming aggregation's worth of state,
    * bounded by |sources|·|vocab|. Everything downstream (per-term and
    * per-source totals, G²) derives from this frame alone.
    */
  def keynessCells(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame =
    docs.select(col(srcCol).as("source"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("a"))

  /** [[keynessCard]]'s finisher over a [[keynessCells]] frame — shared
    * by the batch card and its streaming twin, so stream ≡ batch is an
    * additivity argument (counts merge across micro-batches), not a
    * re-implementation.
    */
  def keynessFromCells(cells: DataFrame, minCount: Long = 5L,
      k: Int = 30): DataFrame = {
    require(minCount >= 1 && k >= 1, "need minCount >= 1 and k >= 1")
    import org.apache.spark.sql.expressions.Window
    val bySrcTerm = cells
    val byTerm = bySrcTerm.groupBy(col("w"))
      .agg(sum(col("a")).as("ab"))
      .filter(col("ab") >= minCount)
    val bySrc = bySrcTerm.groupBy(col("source"))
      .agg(sum(col("a")).as("ns"))
    val tot = bySrc.agg(sum(col("ns")).as("n"))
    val aD = col("a").cast("double")
    val bD = (col("ab") - col("a")).cast("double")
    val nsD = col("ns").cast("double")
    val nrD = (col("n") - col("ns")).cast("double")
    val abD = col("ab").cast("double")
    val nD = col("n").cast("double")
    val ea = nsD * abD / nD
    val eb = nrD * abD / nD
    val term = (c: org.apache.spark.sql.Column,
        e: org.apache.spark.sql.Column) =>
      when(c > 0.0, c * log(c / e)).otherwise(lit(0.0))
    val scored = bySrcTerm
      .join(byTerm, "w")
      .join(broadcast(bySrc), "source")
      .crossJoin(broadcast(tot))
      .withColumn("g2", round(lit(2.0) * (term(aD, ea) + term(bD, eb)), 6))
      .withColumn("direction",
        when(aD / nsD > abD / nD, lit("over")).otherwise(lit("under")))
    scored
      .orderBy(col("g2").desc, col("source"), col("w"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("g2").desc, col("source"), col("w")))
        .cast("long"))
      .select(col("rank"), col("source"), col("w").as("term"),
        col("a").as("count_in_source"), (col("ab") - col("a")).as("count_rest"),
        col("g2"), col("direction"))
      .orderBy(col("rank"))
  }

  /** Readability card per source: Flesch Reading Ease and Flesch–
    * Kincaid grade from the classical proxies — sentences by ". "
    * splits, words by the corpus tokenizer, syllables by maximal
    * [aeiouy]+ vowel-group runs (the standard heuristic; exact
    * hyphenation needs a dictionary). Per-document ratios are exact
    * integer divisions; per-source means accumulate as DECIMAL(28,12).
    * The audience-level complement to [[withQuality]]'s length/stopword
    * gate: same corpus scan shape, a different axis of "is this
    * training-worthy text".
    *
    * Scale shape: pure per-row regex/size expressions (one corpus
    * scan, fully codegen) + one keyed aggregation to |sources| rows.
    */
  def readabilityCard(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val sentences = size(split(col(textCol), "\\. ")).cast("double")
    val toks = filter(split(trim(col(textCol)), " "),
      w => w =!= "")
    val words = size(toks).cast("double")
    val syllables = size(regexp_extract_all(lower(col(textCol)),
      lit("[aeiouy]+"), lit(0))).cast("double")
    val perDoc = docs
      .filter(col(textCol).isNotNull && size(toks) > 0)
      .select(col(srcCol).as("source"), sentences.as("s"),
        words.as("w"), syllables.as("y"))
      .select(col("source"), (col("w") / col("s")).as("wps"),
        (col("y") / col("w")).as("spw"))
      .withColumn("fre", lit(206.835) - lit(1.015) * col("wps") -
        lit(84.6) * col("spw"))
      .withColumn("fkgl", lit(0.39) * col("wps") +
        lit(11.8) * col("spw") - lit(15.59))
    import graft.functions.Stats.dsum
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        round(dsum(col("wps"), 12) / count(lit(1)), 6)
          .as("avg_words_per_sentence"),
        round(dsum(col("spw"), 12) / count(lit(1)), 6)
          .as("avg_syllables_per_word"),
        round(dsum(col("fre"), 12) / count(lit(1)), 6)
          .as("avg_reading_ease"),
        round(dsum(col("fkgl"), 12) / count(lit(1)), 6)
          .as("avg_grade_level"))
      .orderBy(col("source"))
  }

  /** TextRank keywords (Mihalcea & Tarau 2004): PageRank over the word
    * adjacency graph — vertices are corpus tokens with frequency ≥
    * `minCount`, an undirected edge links words that appear adjacent
    * anywhere in the corpus, and centrality in that graph IS the
    * keyword score (frequent words that co-occur with many other
    * frequent words). Runs on [[GraphOps.pageRankFixedPoint]]'s exact
    * BIGINT fixed-point contract, so the whole walk — tokenize, edge
    * build, 10 damped iterations — replays bit-for-bit in the SQL
    * oracle. Complements [[pmiCollocations]] (pairwise surprise) and
    * RAKE (stopword-delimited phrases) with a global-graph view.
    *
    * Scale shape: one token explode + one adjacent-pair explode (both
    * linear in corpus tokens), two vocab equi-joins (broadcast-sized:
    * vocab, not corpus), then PageRank on the vocab-sized graph — per
    * iteration one equi-join + one hash aggregation, never quadratic
    * in corpus size. Top-k via TakeOrdered.
    */
  def textRankKeywords(docs: DataFrame, textCol: String,
      minCount: Long = 5L, k: Int = 30, iterations: Int = 10): DataFrame = {
    require(minCount >= 1 && k >= 1 && iterations >= 1,
      "need minCount >= 1, k >= 1, iterations >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = tokens(col(textCol))
    // the pmiCollocations empty-token discipline: "" from consecutive
    // spaces joins neither the vocabulary nor any edge
    val vocab = docs.select(explode(toks).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
      .select(col("w"))
    val adj = docs.select(
        explode(transform(
          sequence(lit(1), greatest(size(toks) - 1, lit(1))),
          i => struct(element_at(toks, i).as("w1"),
            element_at(toks, i + 1).as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= "" && col("w2") =!= "" &&
        col("w1") =!= col("w2"))
      .join(vocab.select(col("w").as("w1")), "w1")
      .join(vocab.select(col("w").as("w2")), "w2")
    val pr = graft.operators.GraphOps.pageRankFixedPoint(
      adj, "w1", "w2", iterations)
    pr.orderBy(col("rank_fp").desc, col("v")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rank_fp").desc, col("v"))).cast("long"))
      .select(col("rank"), col("v").as("word"), col("rank_fp"),
        col("rank_fp").cast("double").divide(lit(1000000000000.0))
          .as("__s"))
      .select(col("rank"), col("word"), col("rank_fp"),
        round(col("__s"), 6).as("score"))
      .orderBy(col("rank"))
  }

  /** Per-source frequency cap (the Common-Crawl-style domain cap): each
    * source keeps at most `cap` documents, highest [[withQuality]] score
    * first (doc-id tiebreak — the rounded score makes the order
    * engine-portable), so no single domain dominates the training mix.
    * Returns the per-source curation card: kept/dropped counts, token
    * mass each way, and the quality bar the cap imposed (min kept
    * score).
    *
    * Scale shape: one quality-scoring scan (pure per-row expressions),
    * one per-source bounded-k window (shuffle keyed on source; the cap
    * bounds retained state per key — a skewed mega-domain is a k-select
    * within its partition, not a sort of it), one aggregation.
    */
  def sourceCapCard(docs: DataFrame, srcCol: String, idCol: String,
      textCol: String, cap: Int,
      stopwords: Seq[String] = Seq("the", "a")): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(srcCol))
      .orderBy(col("quality_score").desc, col(idCol))
    val ranked = withQuality(docs, textCol, stopwords)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__keep", col("__rn") <= cap)
    ranked.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_dropped"),
        sum(when(col("__keep"), col("n_tokens")).otherwise(0L))
          .as("kept_tokens"),
        sum(when(!col("__keep"), col("n_tokens")).otherwise(0L))
          .as("dropped_tokens"),
        min(when(col("__keep"), col("quality_score")))
          .as("min_kept_quality"))
      .orderBy(col("source"))
  }

  /** OOV drift vs a FROZEN vocabulary: the top-`vocabSize` tokens of the
    * EARLY id-half become the tokenizer's frozen vocab (the production
    * shape: vocabularies are trained once and then age); the card
    * reports each half's out-of-vocab token rate and the count of
    * entirely new token types in the late half — rising OOV is the
    * earliest tokenizer-rot signal, before perplexity moves.
    *
    * Scale shape: one token explosion, one count aggregation; the vocab
    * is a bounded TakeOrdered head broadcast back; everything else is
    * conditional sums on the (token, half) count frame.
    */
  def oovDriftCard(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 100): DataFrame = {
    require(vocabSize >= 1, "vocabSize must be >= 1")
    val bounds = docs.agg(min(col(idCol)).cast("long").as("__mn"),
      max(col(idCol)).cast("long").as("__mx"))
    val toks = docs.crossJoin(broadcast(bounds))
      .select((col(idCol).cast("long") * 2 > col("__mn") + col("__mx"))
        .as("__late"),
        explode(split(trim(col(textCol)), " ")).as("__tok"))
    val byTok = toks.groupBy(col("__tok"))
      .agg(sum(when(!col("__late"), 1L).otherwise(0L)).as("ca"),
        sum(when(col("__late"), 1L).otherwise(0L)).as("cb"))
    val vocab = byTok.filter(col("ca") > 0L)
      .orderBy(col("ca").desc, col("__tok"))
      .limit(vocabSize)
      .select(col("__tok"), lit(1L).as("__in_vocab"))
    byTok.join(broadcast(vocab.select(col("__tok"), col("__in_vocab"))),
        Seq("__tok"), "left")
      .withColumn("__iv", coalesce(col("__in_vocab"), lit(0L)))
      .agg(
        sum(col("ca")).as("n_tokens_early"),
        sum(col("cb")).as("n_tokens_late"),
        sum(when(col("__iv") === 0L, col("ca")).otherwise(0L))
          .as("__oov_a"),
        sum(when(col("__iv") === 0L, col("cb")).otherwise(0L))
          .as("__oov_b"),
        sum(when(col("ca") === 0L && col("cb") > 0L, 1L).otherwise(0L))
          .as("n_new_types_late"))
      .withColumn("vocab_size", lit(vocabSize.toLong))
      .withColumn("oov_rate_early", round(
        col("__oov_a").cast("double") / col("n_tokens_early").cast("double"),
        6))
      .withColumn("oov_rate_late", round(
        col("__oov_b").cast("double") / col("n_tokens_late").cast("double"),
        6))
      .select(col("vocab_size"), col("n_tokens_early"),
        col("oov_rate_early"), col("n_tokens_late"), col("oov_rate_late"),
        col("n_new_types_late"))
  }

  /** Heaps'-law vocabulary-growth card: distinct-token count V(N) as the
    * corpus grows through id-order checkpoints (prefix percentiles of
    * the doc-id range), with the empirical Heaps exponent
    * β = ln(V₂/V₁)/ln(N₂/N₁) between consecutive checkpoints — the
    * curve a tokenizer/vocab designer reads to predict vocabulary size
    * at 10× data (V ∝ N^β, β ≈ 0.4–0.6 for natural text; a β near 1
    * flags id-like token pollution).
    *
    * Scale shape: ONE token explosion; each token row carries the
    * EARLIEST checkpoint containing its doc, so "vocab at checkpoint c"
    * = count of tokens whose min-checkpoint ≤ c — cumulative counting on
    * the |vocab|-bounded (token, checkpoint) aggregate, never a distinct
    * per checkpoint over the corpus. Checkpoint cutoffs are exact
    * integer ceil-divisions of the id span (no double rounding).
    */
  def heapsGrowthCard(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Seq[Int] = Seq(10, 25, 50, 100)): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(p => p >= 1 && p <= 100)
      && checkpoints == checkpoints.sorted && checkpoints.last == 100,
      "checkpoints must be sorted percents ending at 100")
    import org.apache.spark.sql.expressions.Window
    def fdiv(x: Column, m: Column): Column =
      ((x - pmod(x, m)).cast("decimal(38,0)") / m).cast("long")
    val bounds = docs.agg(min(col(idCol)).cast("long").as("__mn"),
      max(col(idCol)).cast("long").as("__mx"))
    val span = col("__mx") - col("__mn") + 1L
    def cutoff(p: Int): Column = // mn − 1 + ceil(span·p/100)
      col("__mn") - 1L + fdiv(span * lit(p.toLong) + 99L, lit(100L))
    val cb = checkpoints.init.foldRight(
        lit(100L): Column) { (p, rest) =>
      when(col(idCol).cast("long") <= cutoff(p), lit(p.toLong))
        .otherwise(rest)
    }
    val tagged = docs.crossJoin(broadcast(bounds))
      .withColumn("__cb", cb)
    val tokCb = tagged.select(col("__cb"),
        explode(split(trim(col(textCol)), " ")).as("__tok"))
      .groupBy(col("__tok"), col("__cb"))
      .agg(count(lit(1)).as("__c"))
    val vocabNew = tokCb.groupBy(col("__tok"))
      .agg(min(col("__cb")).as("__minb"))
      .groupBy(col("__minb")).agg(count(lit(1)).as("__vnew"))
    val tokensAt = tokCb.groupBy(col("__cb"))
      .agg(sum(col("__c")).as("__tnew"))
    val docsAt = tagged.groupBy(col("__cb"))
      .agg(count(lit(1)).as("__dnew"))
    val spark = docs.sparkSession
    val cps = spark.range(1).select(explode(
      array(checkpoints.map(p => lit(p.toLong)): _*)).as("pct"))
    val w = Window.partitionBy(lit(1)).orderBy(col("pct"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val grown = cps
      .join(vocabNew.withColumnRenamed("__minb", "pct"), Seq("pct"), "left")
      .join(tokensAt.withColumnRenamed("__cb", "pct"), Seq("pct"), "left")
      .join(docsAt.withColumnRenamed("__cb", "pct"), Seq("pct"), "left")
      .withColumn("n_docs", sum(coalesce(col("__dnew"), lit(0L))).over(w))
      .withColumn("n_tokens", sum(coalesce(col("__tnew"), lit(0L))).over(w))
      .withColumn("n_vocab", sum(coalesce(col("__vnew"), lit(0L))).over(w))
    val wl = Window.partitionBy(lit(1)).orderBy(col("pct"))
    grown
      .withColumn("__pv", lag(col("n_vocab"), 1).over(wl))
      .withColumn("__pn", lag(col("n_tokens"), 1).over(wl))
      .withColumn("heaps_beta",
        when(col("__pv") > 0L && col("__pn") > 0L &&
            col("n_tokens") > col("__pn"),
          round(log(col("n_vocab").cast("double") /
              col("__pv").cast("double")) /
            log(col("n_tokens").cast("double") /
              col("__pn").cast("double")), 6)))
      .select(col("pct"), col("n_docs"), col("n_tokens"), col("n_vocab"),
        col("heaps_beta"))
      .orderBy(col("pct"))
  }

  /** Cross-source unigram cross-entropy matrix — the domain-shift audit
    * of a multi-source corpus: H(b‖a) is the expected surprisal of
    * source b's tokens under source a's add-1-smoothed unigram LM
    * (smoothed over the GLOBAL vocab V, so every source is scored on
    * the same support). A high H(b‖a) − H(b‖b) gap says a model tuned
    * on a will pay for it on b — which sources can share a mixing
    * bucket, measured. The whole matrix reduces to ONE closed form per
    * ordered pair:
    *
    *   H(b‖a) = ln(N_a + V) − (Σ_{w ∈ a∩b} c_b(w)·ln(c_a(w)+1)) / N_b
    *
    * because unmatched words contribute ln(0+1) = 0 to the sum — no
    * outer join, no missing-mass bookkeeping.
    *
    * Exactness: counts are exact; each matched term is one double
    * (c_b·ln(c_a+1)) cast to decimal before the sum (order-free); the
    * final assembly is fixed-shape. Perplexity is exp of the unrounded
    * entropy.
    *
    * Scale shape: one token-count aggregation, one vocab equi-join on
    * the word key (each word meets only its own |sources|² pair block),
    * one (pair) aggregation; the matrix frame is |sources|² rows.
    */
  def crossSourceCrossEntropy(docs: DataFrame, srcCol: String,
      textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val w = docs.select(col(srcCol).as("src"), explode(toks).as("w"))
      .filter(col("w") =!= "")
    val c = w.groupBy(col("src"), col("w")).agg(count(lit(1)).as("c"))
    val n = c.groupBy(col("src")).agg(sum(col("c")).as("nt"))
    val v = c.agg(countDistinct(col("w")).as("v"))
    val matched = c.select(col("src").as("src_from"), col("w"),
        col("c").as("cb"))
      .join(c.select(col("src").as("src_to"), col("w"),
        col("c").as("ca")), "w")
      .groupBy(col("src_from"), col("src_to"))
      .agg(sum((col("cb").cast("double") *
        log(col("ca").cast("double") + lit(1.0)))
        .cast("decimal(38,12)")).cast("double").as("__t"))
    // every ordered pair exists even with disjoint vocabularies
    val pairs = n.select(col("src").as("src_from"), col("nt").as("__nb"))
      .crossJoin(n.select(col("src").as("src_to"), col("nt").as("__na")))
      .join(matched, Seq("src_from", "src_to"), "left")
      .withColumn("__t", coalesce(col("__t"), lit(0.0)))
      .crossJoin(broadcast(v))
    val h = log((col("__na") + col("v")).cast("double")) -
      col("__t") / col("__nb").cast("double")
    pairs.select(col("src_from"), col("src_to"),
        col("__nb").as("n_tokens_from"),
        round(h, 6).as("h_cross"),
        round(exp(h), 6).as("ppl_cross"))
      .orderBy(col("src_from"), col("src_to"))
  }

  /** Good–Turing frequency-of-frequencies card (Good 1953): for the
    * `maxR` SMALLEST observed token counts r, the number of types N_r
    * seen exactly r times, their probability mass r·N_r/N, the Turing
    * estimate of UNSEEN mass p₀ = N₁/N (how much of the distribution
    * the corpus has not shown yet — whether the vocab/LM is
    * saturating), and the smoothed count r* = (r+1)·N_{r+1}/N_r. A fat
    * N₁ means more crawl moves the LM; a thin one means the corpus has
    * converged. Selecting the smallest observed counts (not r ≤ maxR)
    * keeps the card non-empty on a synthetic/deduped corpus whose
    * rarest token still appears thousands of times; r* is null where
    * r+1 is unobserved, and a null p₀ column (no singletons anywhere)
    * is itself the "vocabulary closed" signal.
    *
    * Exactness: everything is exact integer counting until the final
    * per-row divisions (fixed shape, round 6).
    *
    * Scale shape: one token count aggregation, one count-of-counts
    * aggregation (the frame collapses to |distinct r| rows), a
    * broadcast totals row, and a self-join on r+1 within the tiny
    * card frame.
    */
  def goodTuringCard(docs: DataFrame, textCol: String,
      maxR: Int = 10): DataFrame = {
    require(maxR >= 1, "maxR must be >= 1")
    val w = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val counts = w.groupBy(col("w")).agg(count(lit(1)).as("r"))
    val freqOfFreq = counts.groupBy(col("r"))
      .agg(count(lit(1)).as("n_types"))
    val tot = counts.agg(
      sum(col("r")).as("__n"), count(lit(1)).as("__v"))
    // smallest maxR observed counts — the card frame is bounded by the
    // distinct count values, so the rank window is driver-scale
    val low = freqOfFreq
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("r"))))
      .filter(col("__rn") <= maxR)
    val card = low
      .join(freqOfFreq.select((col("r") - 1).as("r"),
        col("n_types").as("__ntNext")), Seq("r"), "left")
      .crossJoin(broadcast(tot))
    card.select(col("r"), col("n_types"),
        round(col("r").cast("double") * col("n_types").cast("double") /
          col("__n").cast("double"), 6).as("mass"),
        round(col("n_types").cast("double") / col("__v").cast("double"),
          6).as("type_share"),
        when(col("__ntNext").isNotNull,
          round((col("r").cast("double") + lit(1.0)) *
            col("__ntNext").cast("double") /
            col("n_types").cast("double"), 6)).as("r_star"),
        round(when(col("r") === 1L,
          col("n_types").cast("double") / col("__n").cast("double"))
          .otherwise(lit(null)), 6).as("p0_unseen"))
      .orderBy(col("r"))
  }

  /** Vocabulary-richness card: the species-estimation view of a corpus
    * — observed types V, tokens N, singleton/doubleton counts f₁/f₂,
    * the bias-corrected Chao1 lower bound on TRUE vocabulary size
    * V + f₁(f₁−1)/(2(f₂+1)) (Chao 1984), Good's sample coverage
    * 1 − f₁/N, and Herdan's C = ln V/ln N. Together: how much
    * vocabulary the crawl has NOT seen yet and whether more data still
    * grows the lexicon — [[goodTuringCard]] gives the spectrum, this
    * card the headline numbers.
    *
    * Exactness: all counts exact; the three derived numbers are fixed-
    * shape double arithmetic.
    *
    * Scale shape: one token count aggregation, one 1-row reduction.
    */
  def vocabRichnessCard(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("r"))
    val agg = counts.agg(
        sum(col("r")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("r") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("r") === 2L, 1L).otherwise(0L)).as("f2"))
      .filter(col("n_tokens") > 1)
    val f1D = col("f1").cast("double")
    val f2D = col("f2").cast("double")
    agg.select(col("n_tokens"), col("n_types"), col("f1"), col("f2"),
      round(col("n_types").cast("double") +
        f1D * (f1D - lit(1.0)) / (lit(2.0) * (f2D + lit(1.0))), 6)
        .as("chao1"),
      round(lit(1.0) - f1D / col("n_tokens").cast("double"), 6)
        .as("coverage"),
      round(log(col("n_types").cast("double")) /
        log(col("n_tokens").cast("double")), 6).as("herdan_c"))
  }

  /** Hill tail-index estimator (Hill 1975) over the token-frequency
    * distribution: α̂ = k / Σ_{i=1..k} ln(c₍ᵢ₎/c₍ₖ₊₁₎) on the top-k
    * counts — the principled heavy-tail exponent next to the log-log
    * regression Zipf fit (regression slope is biased by the mid-rank
    * body; Hill reads the tail alone). α ≈ 1 is the classic Zipfian
    * corpus; α drifting up says head tokens are flattening (dedup or
    * templating at work).
    *
    * Exactness: counts exact; the k log-ratio terms are per-row doubles
    * summed in decimal on the (k+1)-row frame; ties with the cutoff
    * contribute ln 1 = 0 exactly.
    *
    * Scale shape: one token count aggregation, one TakeOrdered top-
    * (k+1), everything after on that tiny frame.
    */
  def hillTailIndex(docs: DataFrame, textCol: String,
      k: Int = 50): DataFrame = {
    require(k >= 2, "k must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    // adaptive tail size: k_eff = min(k, V−1) — a small-vocabulary
    // (synthetic/deduped) corpus still gets its tail estimate instead
    // of an empty card; the LAST selected rank is the cutoff
    val top = counts.orderBy(col("c").desc, col("w")).limit(k + 1)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("c").desc, col("w"))).cast("long"))
    val cutRank = top.agg(max(col("rank")).as("__cr"))
      .filter(col("__cr") >= 3)
    val cutoff = top.crossJoin(broadcast(cutRank))
      .filter(col("rank") === col("__cr"))
      .select(col("c").as("__ck1"), col("__cr"))
    val terms = top.crossJoin(broadcast(cutoff))
      .filter(col("rank") < col("__cr"))
      .select((log(col("c").cast("double")) -
        log(col("__ck1").cast("double"))).cast("decimal(38,12)").as("__t"),
        col("__ck1"))
    terms.groupBy(col("__ck1"))
      .agg(count(lit(1)).as("k"),
        sum(col("__t")).cast("double").as("__s"))
      .select(col("k"), col("__ck1").as("c_tail_cutoff"),
        when(col("__s") > 0.0,
          round(col("k").cast("double") / col("__s"), 6))
          .as("hill_alpha"))
  }

  /** Conditional bigram entropy card: H(w₂|w₁) = −Σ (c₁₂/N₂)·ln(c₁₂/c₁)
    * against the unigram entropy H(w) — the PREDICTABILITY-GAIN view of
    * a corpus (how many nats one token of context buys). A gain
    * collapsing toward zero says near-random token soup; a gain near
    * H(w) says heavily templated text — both are curation signals the
    * perplexity gates (q133/q212) only see through a trained model.
    *
    * Exactness: exact counts; each entropy term is one fixed-shape
    * double cast to decimal before the sum (order-free); the bigram
    * stream uses the [[pmiCollocations]] empty-token discipline.
    *
    * Scale shape: one token explosion + one bigram explosion, two
    * count aggregations, one broadcast-joined term scan over the
    * bigram vocabulary.
    */
  def conditionalBigramEntropy(docs: DataFrame,
      textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val words = docs.select(explode(toks).as("w"))
      .filter(col("w") =!= "")
    val uni = words.groupBy(col("w")).agg(count(lit(1)).as("c1"))
    val uniTot = uni.agg(sum(col("c1")).as("__n1"))
    val hUni = uni.crossJoin(broadcast(uniTot))
      .select(((col("c1").cast("double") / col("__n1").cast("double")) *
        log(col("c1").cast("double") / col("__n1").cast("double")))
        .cast("decimal(38,12)").as("__t"))
      .agg((-sum(col("__t")).cast("double")).as("__hu"))
    val bg = docs.select(
        explode(transform(
          sequence(lit(1), greatest(size(toks) - 1, lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(2))))).as("bg"))
      .filter(col("bg").contains(" "))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .withColumn("w2", substring_index(col("bg"), " ", -1))
      .filter(col("w1") =!= "" && col("w2") =!= "")
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
    val bgTot = bg.agg(sum(col("c12")).as("__n2"))
    val hCond = bg
      .join(uni.select(col("w").as("w1"), col("c1")), "w1")
      .crossJoin(broadcast(bgTot))
      .select(((col("c12").cast("double") / col("__n2").cast("double")) *
        log(col("c12").cast("double") / col("c1").cast("double")))
        .cast("decimal(38,12)").as("__t"), col("__n2"))
      .groupBy(col("__n2"))
      .agg((-sum(col("__t")).cast("double")).as("__hc"))
    hCond.crossJoin(broadcast(hUni))
      .select(col("__n2").as("n_bigrams"),
        round(col("__hu"), 6).as("h_unigram"),
        round(col("__hc"), 6).as("h_conditional"),
        round(col("__hu") - col("__hc"), 6).as("predictability_gain"))
  }

  /** Token burstiness card (the Church & Gale 1995 observation): for
    * the top-k corpus tokens, the variance-to-mean ratio of the
    * per-document count — content words CLUMP (one doc mentions them
    * many times, most never), function words spread evenly (VMR ≈ 1,
    * the Poisson line). A "content-like" stopword or a "function-like"
    * topic token is a tokenizer/boilerplate smell.
    *
    * Exactness: per-(token, doc) counts are exact; absent docs
    * contribute their zeros through the closed form (Σ over nonzero
    * rows + the known document total D), so no zero-filled explosion
    * exists; VMR assembles in one fixed double shape.
    *
    * Scale shape: one (token, doc) count aggregation restricted to the
    * broadcast top-k vocabulary, one per-token reduction, rank on the
    * k-row card.
    */
  def tokenBurstiness(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 20): DataFrame = {
    require(k >= 1, "k must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val nDocs = docs.agg(count(lit(1)).as("__d"))
    val words = docs.select(col(idCol).as("__doc"),
        explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val topK = words.groupBy(col("w")).agg(count(lit(1)).as("corpus_count"))
      .orderBy(col("corpus_count").desc, col("w")).limit(k)
    val perDoc = words.join(broadcast(topK), "w")
      .groupBy(col("w"), col("corpus_count"), col("__doc"))
      .agg(count(lit(1)).as("n_td"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val stats = perDoc.groupBy(col("w"), col("corpus_count"))
      .agg(count(lit(1)).as("doc_freq"),
        sum(col("n_td")).as("__s"),
        sum(dec(col("n_td")) * dec(col("n_td"))).cast("double").as("__q"))
      .crossJoin(broadcast(nDocs))
      .filter(col("__d") > 1)
    val dD = col("__d").cast("double")
    val mean = col("__s").cast("double") / dD
    val variance = (col("__q") - col("__s").cast("double") *
      col("__s").cast("double") / dD) / (dD - lit(1.0))
    stats
      .select(col("w").as("token"), col("corpus_count"), col("doc_freq"),
        round(mean, 6).as("mean_per_doc"),
        when(mean > 0.0, round(variance / mean, 6)).as("vmr"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("corpus_count").desc, col("token")))
        .cast("long"))
      .select(col("rank"), col("token"), col("corpus_count"),
        col("doc_freq"), col("mean_per_doc"), col("vmr"))
      .orderBy(col("rank"))
  }

  /** Source-mix diversity card: Shannon entropy of the document-source
    * distribution, its exponential (the EFFECTIVE number of sources —
    * 20 listed sources behaving like 3.2 is a concentration alarm),
    * the Simpson index Σp², and the top-source share. The one-row
    * answer to "is this corpus actually diverse or one crawl wearing
    * twenty names".
    *
    * Exactness: exact counts; entropy terms decimal-cast per source;
    * fixed double shapes.
    *
    * Scale shape: one (source) count aggregation; the card reduces the
    * |sources|-row frame.
    */
  def mixDiversityCard(docs: DataFrame, srcCol: String): DataFrame = {
    val bySrc = docs.filter(col(srcCol).isNotNull)
      .groupBy(col(srcCol)).agg(count(lit(1)).as("n_s"))
    val tot = bySrc.agg(sum(col("n_s")).as("__n"))
    val p = col("n_s").cast("double") / col("__n").cast("double")
    bySrc.crossJoin(broadcast(tot))
      .select(col("__n"), col("n_s"),
        (p * log(p)).cast("decimal(38,12)").as("__h"),
        (p * p).cast("decimal(38,12)").as("__sp"))
      .groupBy(col("__n"))
      .agg(count(lit(1)).as("n_sources"),
        (-sum(col("__h")).cast("double")).as("__hh"),
        sum(col("__sp")).cast("double").as("__simpson"),
        max(col("n_s")).as("__top"))
      .select(col("__n").as("n_docs"), col("n_sources"),
        round(col("__hh"), 6).as("entropy"),
        round(exp(col("__hh")), 6).as("effective_sources"),
        round(col("__simpson"), 6).as("simpson_index"),
        round(col("__top").cast("double") / col("__n").cast("double"),
          6).as("top_source_share"))
  }

  /** RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    * the maximal token runs between stopwords/punctuation; each word
    * scores degree/frequency over all candidate instances (degree = Σ
    * phrase length over phrases containing it), and a phrase scores the
    * sum of its word scores. The phrase-level keyword miner next to the
    * purely statistical collocations (q255 PMI) and TF-IDF terms (q69).
    *
    * The stopword break uses one \b-alternation regex (the RE2-safe
    * subset — no lookahead), so consecutive stopwords collapse without
    * consuming whitespace; empty tokens from the splits are filtered
    * (the q255 lesson). Scale shape: explode → two hash aggregations →
    * one equi-join back → TakeOrdered top-k; integer counts, one double
    * division per word, DECIMAL phrase sums.
    */
  /** Feature-hashing collision audit: the corpus vocabulary hashed into
    * each candidate dimension (the hashing-trick sizes a model designer
    * weighs), reporting how many distinct terms collide and how much
    * token MASS sits in collided buckets — the quantity that actually
    * degrades a hashed-features model (q232's hashed-vocab NB premise,
    * measured). Uses the portable two-round congruential draw on
    * MD5(term) (the q237 recipe), so the audit replays in SQL exactly.
    *
    * Scale shape: one token aggregation to the (term, occurrences)
    * frame, a |dims|-way explode of THAT frame, one (dim, bucket)
    * aggregation, one |dims|-row rollup. Nothing data-proportional
    * beyond the first aggregate.
    */
  def hashCollisionSweep(df: DataFrame, textCol: String,
      dims: Seq[Int] = Seq(256, 1024, 4096)): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 2), "dims must be >= 2")
    val p1 = 1000003L
    val p2 = 9999991L
    val terms = df
      .select(explode(split(trim(lower(col(textCol))), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy(col("term")).agg(count(lit(1)).as("occ"))
    val hx = conv(substring(md5(col("term")), 1, 15), 16, 10).cast("long")
    val hdiv = (hx.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(hx, lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + hdiv, lit(p2)) * lit(22695477L), lit(p2))
    val exploded = terms
      .withColumn("__draw", x2)
      .select(col("term"), col("occ"), col("__draw"),
        explode(array(dims.map(d => lit(d)): _*)).as("dim"))
      .withColumn("__bucket", pmod(col("__draw"), col("dim").cast("long")))
    val perBucket = exploded.groupBy(col("dim"), col("__bucket"))
      .agg(count(lit(1)).as("__bt"), sum(col("occ")).as("__bm"))
    perBucket.groupBy(col("dim"))
      .agg(
        sum(col("__bt")).as("n_terms"),
        count(lit(1)).as("buckets_used"),
        sum(when(col("__bt") >= 2L, col("__bt")).otherwise(0L))
          .as("colliding_terms"),
        sum(col("__bm")).as("__mass"),
        sum(when(col("__bt") >= 2L, col("__bm")).otherwise(0L))
          .as("__cmass"))
      .select(col("dim"), col("n_terms"), col("buckets_used"),
        col("colliding_terms"),
        round(col("colliding_terms").cast("double") /
          col("n_terms").cast("double"), 6).as("collision_rate"),
        round(col("__cmass").cast("double") /
          col("__mass").cast("double"), 6).as("colliding_mass_share"))
      .orderBy(col("dim"))
  }

  def rakeKeywords(df: DataFrame, idCol: String, textCol: String,
      k: Int = 15, maxPhraseLen: Int = 4): DataFrame = {
    val stop = "the|a|and|of|to|in|is|for|on|with"
    val broken = regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]+", " "),
      "\\b(" + stop + ")\\b", "|")
    val phrases = df
      .select(explode(split(broken, "\\|")).as("__raw"))
      .select(filter(split(col("__raw"), " "),
        t => t =!= "").as("__toks"))
      .filter(size(col("__toks")) >= 1 &&
        size(col("__toks")) <= maxPhraseLen)
      .select(col("__toks"),
        array_join(col("__toks"), " ").as("phrase"),
        size(col("__toks")).cast("long").as("__len"))
    val words = phrases
      .select(explode(col("__toks")).as("w"), col("__len"))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("__freq"), sum(col("__len")).as("__deg"))
      .withColumn("__wscore",
        col("__deg").cast("double") / col("__freq").cast("double"))
    val distinctPhrases = phrases
      .groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"),
        first(col("__toks")).as("__toks"))
    distinctPhrases
      .select(col("phrase"), col("n_occurrences"),
        explode(col("__toks")).as("w"))
      .join(words.select(col("w"), col("__wscore")), "w")
      .groupBy(col("phrase"), col("n_occurrences"))
      .agg(graft.functions.Stats.dsum(col("__wscore"), 12).as("__score"))
      .select(col("phrase"), col("n_occurrences"),
        round(col("__score"), 6).as("rake_score"))
      .orderBy(col("rake_score").desc, col("n_occurrences").desc,
        col("phrase"))
      .limit(k)
  }
  /** Lexical-diversity card over the corpus token spectrum: Yule's K
    * (Yule 1944 — repeat-rate scaled by 10⁴, length-robust), Simpson's
    * D (probability two random tokens coincide), Honoré's R (hapax-
    * driven richness), and Sichel's S (dis-legomena share) — the
    * repeat-structure view next to [[vocabRichnessCard]]'s species
    * estimates (Chao1/coverage read "how much is unseen", K/D read
    * "how repetitive is what we HAVE" — template floods move K hard).
    *
    * Exactness: every spectrum moment (Σr²V_r, Σr(r−1)V_r, V₁, V₂) is
    * an exact integer; K/D are fixed double shapes, R takes one ln.
    *
    * Scale shape: one token count aggregation + one spectrum
    * reduction.
    */
  def lexicalDiversityCard(docs: DataFrame, textCol: String): DataFrame = {
    val counts = docs.select(explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("r"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val agg = counts.agg(
        sum(col("r")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(dec(col("r")) * dec(col("r"))).cast("double").as("__sr2"),
        sum(dec(col("r")) * dec(col("r") - 1L)).cast("double").as("__sr11"),
        sum(when(col("r") === 1L, 1L).otherwise(0L)).as("v1"),
        sum(when(col("r") === 2L, 1L).otherwise(0L)).as("v2"))
      .filter(col("n_tokens") > 1)
    val nD = col("n_tokens").cast("double")
    val vD = col("n_types").cast("double")
    val v1D = col("v1").cast("double")
    agg.select(col("n_tokens"), col("n_types"), col("v1"), col("v2"),
      round(lit(10000.0) * (col("__sr2") - nD) / (nD * nD), 6)
        .as("yule_k"),
      round(col("__sr11") / (nD * (nD - lit(1.0))), 6).as("simpson_d"),
      when(col("v1") < col("n_types"),
        round(lit(100.0) * log(nD) / (lit(1.0) - v1D / vD), 6))
        .as("honore_r"),
      round(col("v2").cast("double") / vD, 6).as("sichel_s"))
  }

  /** Interpolated Kneser-Ney bigram language model (Kneser & Ney 1995;
    * absolute discount D) self-evaluated on the training corpus:
    * P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·) + D·N₁₊(w₁·)/c(w₁·) · N₁₊(·w₂)/N₁₊(··)
    * — the continuation-count smoother that fixed the "San Francisco
    * problem" (frequent-but-context-bound words stop leaking mass), the
    * principled upgrade over [[bigramPerplexity]]'s raw MLE (which
    * assigns unseen transitions −∞) and q283's Good-Turing spectrum
    * (which re-weights but doesn't interpolate).
    *
    * Exactness: every count — bigram, context total, forward/backward
    * continuation type counts, type total — is an exact integer;
    * each type's ln P is one fixed double shape weighted by its exact
    * occurrence count, rounded to 9 into the decimal corpus sum.
    *
    * Scale shape: one bigram count aggregation, three derived count
    * aggregations on the TYPE table (vocabulary-bounded), two hash
    * joins back; no per-token state.
    */
  def kneserNeyBigramCard(df: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, "discount must be in (0,1)")
    val toks = tokens(col(textCol))
    val bigrams = df.select(col(idCol),
        explode(transform(
          sequence(lit(1), greatest(size(toks) - 1, lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(2))))).as("bg"))
      .filter(col("bg").contains(" "))
    val bgCount = bigrams.groupBy(col("bg")).agg(count(lit(1)).as("__c2"))
      .withColumn("__w1", substring_index(col("bg"), " ", 1))
      .withColumn("__w2", substring_index(col("bg"), " ", -1))
    val ctx = bgCount.groupBy(col("__w1"))
      .agg(sum(col("__c2")).as("__c1"), count(lit(1)).as("__n1f"))
    val cont = bgCount.groupBy(col("__w2"))
      .agg(count(lit(1)).as("__n1b"))
    val types = bgCount.agg(count(lit(1)).as("__nt"))
    val d = lit(discount)
    val scored = bgCount
      .join(ctx, "__w1").join(cont, "__w2")
      .crossJoin(broadcast(types))
    val c1D = col("__c1").cast("double")
    val p = (col("__c2").cast("double") - d) / c1D +
      d * col("__n1f").cast("double") / c1D *
        (col("__n1b").cast("double") / col("__nt").cast("double"))
    val agg = scored
      .select(col("__c2"), col("__nt"),
        round(col("__c2").cast("double") * log(p), 9)
          .cast("decimal(38,9)").as("__t"))
      .groupBy(col("__nt"))
      .agg(sum(col("__c2")).as("n_bigrams"),
        count(lit(1)).as("n_bigram_types"),
        (sum(col("__t")).cast("double") /
          sum(col("__c2")).cast("double")).as("__avg"))
    agg.select(col("n_bigrams"), col("n_bigram_types"),
      round(col("__avg"), 6).as("avg_logp"),
      round(exp(-col("__avg")), 6).as("ppl"))
  }
}
