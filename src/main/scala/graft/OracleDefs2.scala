package graft

/** DuckDB-oracle SQL builders, part 2 of the file split. */
private[graft] trait OracleDefs2 extends OracleDefs1 {

  /** q232 oracle: the full hashed-vocabulary multinomial NB replay —
    * 60-bit MD5 polynomial token hash mod 512 (the q207 convention),
    * add-one smoothing over the CONSTANT bucket space (V = 512), exact
    * DECIMAL(28,12) score sums plus one double add of the log prior,
    * argmax with class tiebreak, prior-argmax fallback for token-empty
    * eval docs, truth x prediction confusion.
    */
  protected def q232NbLangSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, lang, string_split(TRIM(text), ' ') AS toks,
       |    ((doc_id % 1000003) * 2654435761) % 20 AS sb
       |  FROM documents),
       |tok0 AS (
       |  SELECT doc_id, lang, sb, MD5(u.token) AS h
       |  FROM dt, UNNEST(toks) AS u(token)
       |  WHERE u.token <> ''),
       |tok AS (
       |  SELECT doc_id, lang, sb, ${hexPoly15("h")} % 512 AS b
       |  FROM tok0),
       |tc AS (
       |  SELECT lang AS cls, b, COUNT(*) AS c
       |  FROM tok WHERE sb >= 4 GROUP BY lang, b),
       |lt AS (
       |  SELECT cls, CAST(SUM(c) AS BIGINT) AS n_tok FROM tc GROUP BY cls),
       |ntr AS (SELECT COUNT(*) AS n FROM dt WHERE sb >= 4),
       |pr AS (
       |  SELECT lang AS cls, COUNT(*) AS n_docs_l
       |  FROM dt WHERE sb >= 4 GROUP BY lang),
       |classes AS (
       |  SELECT pr.cls,
       |    LN(CAST(pr.n_docs_l AS DOUBLE) / CAST(ntr.n AS DOUBLE))
       |      AS ln_prior,
       |    LN(1.0 / (CAST(COALESCE(lt.n_tok, 0) AS DOUBLE) + 512.0))
       |      AS ln_unseen
       |  FROM pr LEFT JOIN lt USING (cls), ntr),
       |model AS (
       |  SELECT tc.cls, tc.b,
       |    LN((CAST(tc.c AS DOUBLE) + 1.0) /
       |      (CAST(lt.n_tok AS DOUBLE) + 512.0)) AS ln_p
       |  FROM tc JOIN lt USING (cls)),
       |ec AS (
       |  SELECT doc_id, b, COUNT(*) AS cnt
       |  FROM tok WHERE sb < 4 GROUP BY doc_id, b),
       |sc AS (
       |  SELECT ec.doc_id, classes.cls,
       |    classes.ln_prior + CAST(SUM(CAST(
       |      COALESCE(model.ln_p, classes.ln_unseen) *
       |      CAST(cnt AS DOUBLE) AS DECIMAL(28,12))) AS DOUBLE) AS score
       |  FROM ec CROSS JOIN classes
       |  LEFT JOIN model ON model.cls = classes.cls AND model.b = ec.b
       |  GROUP BY ec.doc_id, classes.cls, classes.ln_prior,
       |    classes.ln_unseen),
       |pk AS (
       |  SELECT doc_id, cls AS pred_lang,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id
       |      ORDER BY score DESC, cls ASC) AS rn
       |  FROM sc),
       |ed AS (SELECT doc_id, lang FROM dt WHERE sb < 4),
       |pp AS (
       |  SELECT cls AS prior_pred FROM classes
       |  ORDER BY ln_prior DESC, cls ASC LIMIT 1)
       |SELECT ed.lang,
       |  COALESCE(pk1.pred_lang, pp.prior_pred) AS pred_lang,
       |  COUNT(*) AS n_docs
       |FROM ed
       |LEFT JOIN (SELECT doc_id, pred_lang FROM pk WHERE rn = 1) pk1
       |  USING (doc_id), pp
       |GROUP BY ed.lang, COALESCE(pk1.pred_lang, pp.prior_pred)
       |ORDER BY lang, pred_lang""".stripMargin

  /** Shared q234/q235 CTE chain: the word-frequency table as
    * chr(31)-delimited symbol strings (chars + a '</w>' marker), then
    * `rounds` unrolled BPE rounds — pair counts from adjacent symbols
    * (overlaps included), argmax with (count desc, left, right)
    * tiebreak, and the greedy left-to-right merge as a list_reduce fold
    * (merge fires only when the accumulated string's LAST token equals
    * the winning left and the next symbol equals the winning right —
    * token-exact because the separator cannot occur inside symbols).
    * Mirrors the Spark side's `aggregate` fold element-for-element.
    */
  protected def bpeRoundsCte(rounds: Int): String = {
    val base =
      """WITH dt AS (
        |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks
        |  FROM documents),
        |wc AS (
        |  SELECT u.token AS w, COUNT(*) AS cnt
        |  FROM dt, UNNEST(toks) AS u(token)
        |  WHERE u.token <> '' GROUP BY u.token),
        |w0 AS (
        |  SELECT cnt, array_to_string(list_transform(range(1, len(w) + 1),
        |    i -> substring(w, i, 1)), chr(31)) || chr(31) || '</w>' AS s
        |  FROM wc)""".stripMargin
    val steps = (1 to rounds).map { i =>
      s""",p$i AS (
         |  SELECT u.p.l AS l, u.p.r AS r, CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM w${i - 1}, UNNEST(list_transform(
         |    range(1, len(string_split(s, chr(31)))), j ->
         |    struct_pack(l := string_split(s, chr(31))[j],
         |      r := string_split(s, chr(31))[j + 1]))) AS u(p)
         |  GROUP BY u.p.l, u.p.r),
         |b$i AS (
         |  SELECT l AS bl, r AS br, c FROM p$i
         |  ORDER BY c DESC, l, r LIMIT 1),
         |w$i AS (
         |  SELECT cnt, list_reduce(string_split(s, chr(31)), (acc, x) ->
         |    CASE WHEN x = b.br AND (acc = b.bl OR
         |      ends_with(acc, chr(31) || b.bl))
         |    THEN acc || b.br ELSE acc || chr(31) || x END) AS s
         |  FROM w${i - 1}, b$i b),
         |n$i AS (
         |  SELECT CAST(SUM(cnt * len(string_split(s, chr(31)))) AS BIGINT)
         |    AS n FROM w$i)""".stripMargin
    }.mkString
    base + steps
  }

  /** q234 oracle: the merge table — one UNION arm per unrolled round. */
  protected def q234BpeTrainSql: String = {
    val rounds = 8
    val arms = (1 to rounds).map { i =>
      s"""  SELECT $i AS merge_round, bl AS left_sym, br AS right_sym,
         |    bl || br AS merged, c AS pair_count,
         |    (SELECT n FROM n$i) AS n_symbols_after
         |  FROM b$i""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""${bpeRoundsCte(rounds)}
       |SELECT CAST(merge_round AS BIGINT) AS merge_round, left_sym,
       |  right_sym, merged, pair_count, n_symbols_after
       |FROM (
       |$arms)
       |ORDER BY merge_round""".stripMargin
  }

  protected def bpeEncodeCtes(rounds: Int): String = {
    val base =
      s"""${bpeRoundsCte(rounds)},
         |e0 AS (
         |  SELECT doc_id, array_to_string(list_transform(
         |    range(1, len(u.token) + 1),
         |    i -> substring(u.token, i, 1)), chr(31)) ||
         |    chr(31) || '</w>' AS s
         |  FROM dt, UNNEST(toks) AS u(token)
         |  WHERE u.token <> '')""".stripMargin
    val folds = (1 to rounds).map { i =>
      s""",e$i AS (
         |  SELECT doc_id, list_reduce(string_split(s, chr(31)), (acc, x) ->
         |    CASE WHEN x = b.br AND (acc = b.bl OR
         |      ends_with(acc, chr(31) || b.bl))
         |    THEN acc || b.br ELSE acc || chr(31) || x END) AS s
         |  FROM e${i - 1}, b$i b)""".stripMargin
    }.mkString
    base + folds
  }

  /** q242 oracle: the epoch permutation replayed — two-round draw with
    * salt = epoch, shard by clock, within-shard rank by (clock, id),
    * position-weighted 60-bit hash sum as the order fingerprint.
    */
  protected def q242EpochShardsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(TRIM(text), ' ')) AS BIGINT) AS tok
       |  FROM documents),
       |d AS (
       |  SELECT doc_id, tok,
       |    (((((((doc_id + 1) % 1000003) * 2654435761) % 1000003)
       |      + (doc_id // 1000003)) % 9999991) * 22695477) % 9999991
       |      AS clock,
       |    ${hexPoly15("MD5(CAST(doc_id AS VARCHAR))")} % 1000000007 AS h
       |  FROM t),
       |p AS (
       |  SELECT doc_id, tok, clock % 8 AS shard, h,
       |    ROW_NUMBER() OVER (PARTITION BY clock % 8
       |      ORDER BY clock, doc_id) AS pos
       |  FROM d)
       |SELECT CAST(1 AS BIGINT) AS epoch, shard,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS n_tokens,
       |  CAST(SUM(CAST(pos * h AS DECIMAL(38,0))) AS VARCHAR)
       |    AS order_fp
       |FROM p
       |GROUP BY shard
       |ORDER BY shard""".stripMargin

  /** q246 oracle: q27's banded-candidate chain and q39's capped exact
    * Jaccard chain (threshold 0.8) joined into the one-row
    * precision/recall/pruning card.
    */
  /** q257 oracle: the band sweep replayed — ONE signature/truth build
    * (q246's CTEs), then per configuration its own banding, candidate
    * join and counters, one UNION arm per rowsPerBand.
    */
  protected def q257LshBandSweepSql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    def bandCte(r: Int): String = {
      val arms = (0 until 32 / r).map { b =>
        val cols = (b * r until b * r + r).map(i => s"mh_$i")
          .mkString(" || '#' || ")
        s"SELECT doc_id, $b AS band, MD5($cols) AS bh FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""bands_$r AS (
         |  $arms),
         |det_$r AS (
         |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |  FROM bands_$r a JOIN bands_$r b
         |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |nd_$r AS (SELECT COUNT(*) AS n_detected FROM det_$r),
         |nh_$r AS (
         |  SELECT CAST(SUM(CASE WHEN dm.d IS NOT NULL THEN 1 ELSE 0
         |    END) AS BIGINT) AS n_hit
         |  FROM truth LEFT JOIN
         |    (SELECT id_a, id_b, 1 AS d FROM det_$r) dm
         |    USING (id_a, id_b))""".stripMargin
    }
    def arm(r: Int): String =
      s"""SELECT CAST($r AS BIGINT) AS rows_per_band,
         |  CAST(${32 / r} AS BIGINT) AS n_bands,
         |  nn.n_docs,
         |  CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS BIGINT)
         |    AS n_possible_pairs,
         |  nd_$r.n_detected, nt.n_truth,
         |  COALESCE(nh_$r.n_hit, 0) AS n_hit,
         |  CASE WHEN nd_$r.n_detected > 0 THEN
         |    ROUND(CAST(COALESCE(nh_$r.n_hit, 0) AS DOUBLE) /
         |      CAST(nd_$r.n_detected AS DOUBLE), 6) END AS precision,
         |  CASE WHEN nt.n_truth > 0 THEN
         |    ROUND(CAST(COALESCE(nh_$r.n_hit, 0) AS DOUBLE) /
         |      CAST(nt.n_truth AS DOUBLE), 6) END AS recall,
         |  CASE WHEN nn.n_docs > 1 THEN
         |    ROUND(CAST(nd_$r.n_detected AS DOUBLE) /
         |      CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS DOUBLE), 6)
         |    END AS candidate_frac
         |FROM nn, nt, nd_$r, nh_$r""".stripMargin
    val rs = Seq(2, 4, 8)
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk
       |  FROM documents),
       |shx AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM shx GROUP BY doc_id),
       |shd AS (SELECT DISTINCT doc_id, sh FROM shx),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
       |cold AS (SELECT sh FROM shd GROUP BY sh HAVING COUNT(*) <= 1000),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |  FROM shd a JOIN cold USING (sh)
       |  JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE ROUND(n_shared /
       |    CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6) >= 0.8),
       |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
       |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
       |${rs.map(bandCte).mkString(",\n")}
       |${rs.map(arm).mkString("\nUNION ALL\n")}
       |ORDER BY rows_per_band""".stripMargin
  }

  protected def q246LshQualitySql: String = {
    val mhs = (0 until 32)
      .map(s => s"MIN(MD5('$s#' || sh)) AS mh_$s").mkString(",\n    ")
    val bandArms = (0 until 8).map { b =>
      val cols = (b * 4 until b * 4 + 4).map(i => s"mh_$i")
        .mkString(" || '#' || ")
      s"SELECT doc_id, $b AS band, MD5($cols) AS bh FROM sig"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, string_split(trim(text), ' ') AS tk
       |  FROM documents),
       |shx AS (
       |  SELECT doc_id, unnest(CASE WHEN len(tk) >= 3
       |    THEN list_transform(range(1, len(tk) - 1),
       |      i -> array_to_string(tk[i:i+2], ' '))
       |    ELSE [array_to_string(tk, ' ')] END) AS sh
       |  FROM toks),
       |sig AS (
       |  SELECT doc_id,
       |    $mhs
       |  FROM shx GROUP BY doc_id),
       |bands AS (
       |  $bandArms),
       |det AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
       |shd AS (SELECT DISTINCT doc_id, sh FROM shx),
       |sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM shd GROUP BY doc_id),
       |cold AS (SELECT sh FROM shd GROUP BY sh HAVING COUNT(*) <= 1000),
       |shared AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_shared
       |  FROM shd a JOIN cold USING (sh)
       |  JOIN shd b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |truth AS (
       |  SELECT id_a, id_b FROM shared
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE ROUND(n_shared /
       |    CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE), 6) >= 0.8),
       |nn AS (SELECT COUNT(*) AS n_docs FROM documents),
       |nt AS (SELECT COUNT(*) AS n_truth FROM truth),
       |nd AS (SELECT COUNT(*) AS n_detected FROM det),
       |nh AS (
       |  SELECT CAST(SUM(CASE WHEN dm.d IS NOT NULL THEN 1 ELSE 0
       |    END) AS BIGINT) AS n_hit
       |  FROM truth LEFT JOIN
       |    (SELECT id_a, id_b, 1 AS d FROM det) dm USING (id_a, id_b))
       |SELECT nn.n_docs,
       |  CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS BIGINT)
       |    AS n_possible_pairs,
       |  nd.n_detected, nt.n_truth, COALESCE(nh.n_hit, 0) AS n_hit,
       |  CASE WHEN nd.n_detected > 0 THEN
       |    ROUND(CAST(COALESCE(nh.n_hit, 0) AS DOUBLE) /
       |      CAST(nd.n_detected AS DOUBLE), 6) END AS precision,
       |  CASE WHEN nt.n_truth > 0 THEN
       |    ROUND(CAST(COALESCE(nh.n_hit, 0) AS DOUBLE) /
       |      CAST(nt.n_truth AS DOUBLE), 6) END AS recall,
       |  CASE WHEN nn.n_docs > 1 THEN
       |    ROUND(CAST(nd.n_detected AS DOUBLE) /
       |      CAST(nn.n_docs * (nn.n_docs - 1) // 2 AS DOUBLE), 6)
       |    END AS candidate_frac
       |FROM nn, nt, nd, nh""".stripMargin
  }

  /** q244 oracle: the closed-form water-fill replayed — avail-sorted
    * prefix sums, the unique valid saturation point (prevAvail ≤ λ <
    * avail under budget < total), integer level + remainder dealt in
    * sorted order, sentinel pick when the budget covers everything.
    */
  protected def q244WaterfillSql: String =
    """WITH a AS (
      |  SELECT source,
      |    CAST(SUM(len(string_split(TRIM(text), ' '))) AS BIGINT)
      |      AS avail
      |  FROM documents GROUP BY source),
      |t AS (
      |  SELECT CAST(SUM(avail) AS BIGINT) AS total, COUNT(*) AS n
      |  FROM a),
      |b AS (SELECT (total * 6) // 10 AS budget, total, n FROM t),
      |s AS (
      |  SELECT source, avail,
      |    ROW_NUMBER() OVER (ORDER BY avail, source) AS pos,
      |    SUM(avail) OVER (ORDER BY avail, source
      |      ROWS UNBOUNDED PRECEDING) AS prefix,
      |    COALESCE(LAG(avail) OVER (ORDER BY avail, source), 0)
      |      AS prevavail
      |  FROM a),
      |g AS (
      |  SELECT s.*, b.budget, b.total, b.n - s.pos + 1 AS m,
      |    b.budget - (s.prefix - s.avail) AS x
      |  FROM s, b),
      |c AS (
      |  SELECT *,
      |    CASE WHEN x >= 0 THEN x // m ELSE -1 END AS level,
      |    CASE WHEN x >= 0 THEN x % m ELSE 0 END AS rem
      |  FROM g),
      |v AS (
      |  SELECT pos AS ppos, level AS plevel, rem AS prem FROM c
      |  WHERE budget < total AND prevavail <= level AND level < avail
      |  ORDER BY pos LIMIT 1),
      |p AS (
      |  SELECT
      |    COALESCE((SELECT ppos FROM v), 9223372036854775807) AS ppos,
      |    COALESCE((SELECT plevel FROM v), 9223372036854775807)
      |      AS plevel,
      |    COALESCE((SELECT prem FROM v), 0) AS prem),
      |al AS (
      |  SELECT c.source, c.avail, c.budget,
      |    CASE WHEN c.pos < p.ppos THEN c.avail
      |      ELSE p.plevel +
      |        CASE WHEN c.pos - p.ppos < p.prem THEN 1 ELSE 0 END
      |    END AS alloc
      |  FROM c, p)
      |SELECT source, avail AS avail_tokens,
      |  CAST(alloc AS BIGINT) AS alloc_tokens,
      |  CAST(CASE WHEN alloc = avail THEN 1 ELSE 0 END AS BIGINT)
      |    AS saturated,
      |  CAST(budget AS BIGINT) AS budget_tokens
      |FROM al
      |ORDER BY source""".stripMargin

  /** q236 oracle: the two stacked aggregations and the identical
    * double-division disclosure arithmetic (round AFTER max).
    */
  /** q249 oracle: t-closeness replayed — same exact-rational TVD
    * (HUGEINT products ≡ Spark's decimal(38,0)), same exact integer
    * threshold verdict num·5 > den, double division only at the end.
    */
  protected def q249TClosenessSql: String =
    """WITH gs AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM customer GROUP BY c_nationkey, c_mktsegment, 3),
      |gdist AS (SELECT s, CAST(SUM(c) AS BIGINT) AS cg FROM gs GROUP BY s),
      |tot AS (SELECT CAST(SUM(cg) AS BIGINT) AS n FROM gdist),
      |ngt AS (
      |  SELECT c_nationkey, c_mktsegment, CAST(SUM(c) AS BIGINT) AS ngv
      |  FROM gs GROUP BY c_nationkey, c_mktsegment),
      |per AS (
      |  SELECT gs.c_nationkey, gs.c_mktsegment,
      |    MAX(ngt.ngv) AS ngv, MAX(tot.n) AS n,
      |    SUM(ABS(CAST(gs.c AS HUGEINT) * tot.n -
      |      CAST(gdist.cg AS HUGEINT) * ngt.ngv)) AS s1,
      |    SUM(CAST(gdist.cg AS HUGEINT)) AS s2
      |  FROM gs
      |  JOIN gdist USING (s)
      |  JOIN ngt ON gs.c_nationkey = ngt.c_nationkey
      |    AND gs.c_mktsegment = ngt.c_mktsegment
      |  CROSS JOIN tot
      |  GROUP BY gs.c_nationkey, gs.c_mktsegment),
      |pv AS (
      |  SELECT ngv, n,
      |    s1 + (CAST(n AS HUGEINT) - s2) * ngv AS num,
      |    2 * CAST(ngv AS HUGEINT) * n AS den
      |  FROM per)
      |SELECT ROUND(CAST(1 AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS t,
      |  CAST(MAX(n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_groups,
      |  ROUND(MAX(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)), 6)
      |    AS max_tvd,
      |  CAST(SUM(CASE WHEN num * 5 > den THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_above_t,
      |  CAST(SUM(CASE WHEN num * 5 > den THEN ngv ELSE 0 END) AS BIGINT)
      |    AS n_rows_above_t,
      |  ROUND(CAST(SUM(CASE WHEN num * 5 > den THEN ngv ELSE 0 END)
      |      AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 6) AS frac_rows_above_t
      |FROM pv""".stripMargin

  protected def q236LDiversitySql: String =
    """WITH gs AS (
      |  SELECT c_nationkey, c_mktsegment,
      |    CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS s,
      |    COUNT(*) AS c
      |  FROM customer
      |  GROUP BY c_nationkey, c_mktsegment, 3),
      |gg AS (
      |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS d,
      |    CAST(SUM(c) AS BIGINT) AS n, CAST(MAX(c) AS BIGINT) AS mx
      |  FROM gs GROUP BY c_nationkey, c_mktsegment)
      |SELECT CAST(3 AS BIGINT) AS l,
      |  CAST(SUM(n) AS BIGINT) AS n_rows,
      |  COUNT(*) AS n_groups,
      |  CAST(MIN(d) AS BIGINT) AS min_distinct_sensitive,
      |  CAST(SUM(CASE WHEN d < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_groups_below_l,
      |  CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS BIGINT)
      |    AS n_rows_below_l,
      |  ROUND(CAST(SUM(CASE WHEN d < 3 THEN n ELSE 0 END) AS DOUBLE) /
      |    CAST(SUM(n) AS DOUBLE), 6) AS frac_rows_below_l,
      |  ROUND(MAX(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
      |    AS worst_disclosure
      |FROM gg""".stripMargin

  /** q237 oracle: seeded Laplace noise replayed — the 60-bit MD5
    * polynomial of the group key through the two-round congruential
    * generator (q135 convention), u = (x2 + 0.5)/p2 strictly inside
    * (0,1), inverse-CDF noise with the identical parenthesization.
    */
  protected def q237DpHistogramSql: String =
    s"""WITH h AS (
       |  SELECT o_orderpriority, COUNT(*) AS n_true
       |  FROM orders WHERE o_orderpriority IS NOT NULL
       |  GROUP BY o_orderpriority),
       |hx AS (
       |  SELECT o_orderpriority, n_true,
       |    ${hexPoly15("MD5(o_orderpriority)")} AS x
       |  FROM h),
       |d1 AS (
       |  SELECT o_orderpriority, n_true,
       |    ((x % 1000003) * 2654435761) % 1000003 AS x1,
       |    x // 1000003 AS hdiv
       |  FROM hx),
       |d2 AS (
       |  SELECT o_orderpriority, n_true,
       |    (((x1 + hdiv) % 9999991) * 22695477) % 9999991 AS x2
       |  FROM d1),
       |nz AS (
       |  SELECT o_orderpriority, n_true,
       |    ROUND((CASE WHEN ((CAST(x2 AS DOUBLE) + 0.5) / 9999991.0
       |        - 0.5) >= 0.0 THEN -1.0 ELSE 1.0 END *
       |      LN(1.0 - 2.0 * ABS((CAST(x2 AS DOUBLE) + 0.5) / 9999991.0
       |        - 0.5))) / 1.0, 6) AS noise
       |  FROM d2)
       |SELECT o_orderpriority, n_true, noise,
       |  ROUND(CAST(n_true AS DOUBLE) + noise, 6) AS n_noisy,
       |  1.0 AS eps
       |FROM nz
       |ORDER BY o_orderpriority""".stripMargin

  /** q238 oracle: the span scrub replayed — 60-bit gram hashes (q207
    * convention), the ≥2 duplicated-gram set, covered positions from
    * duplicated starts ×5 offsets, and the cleaned text re-assembled
    * with an ordered string_agg and fingerprinted.
    */
  protected def q238SpanScrubSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, string_split(TRIM(text), ' ') AS toks
       |  FROM documents),
       |pos AS (
       |  SELECT doc_id, u.s.i AS i, u.s.tok AS tok
       |  FROM dt, UNNEST(list_transform(toks,
       |    (t, k) -> struct_pack(tok := t, i := k - 1))) AS u(s)
       |  WHERE u.s.tok <> ''),
       |g0 AS (
       |  SELECT doc_id, g.i - 1 AS j,
       |    MD5(array_to_string(toks[g.i:g.i + 4], ' ')) AS h
       |  FROM dt, UNNEST(range(1, len(toks) - 3)) AS g(i)
       |  WHERE len(toks) >= 5),
       |st AS (
       |  SELECT doc_id, j, ${hexPoly15("h")} AS gh
       |  FROM g0),
       |dup AS (
       |  SELECT gh FROM st GROUP BY gh HAVING COUNT(*) >= 2),
       |ds AS (SELECT st.doc_id, st.j FROM st JOIN dup USING (gh)),
       |cov AS (
       |  SELECT DISTINCT ds.doc_id, ds.j + o.k AS i
       |  FROM ds, UNNEST(range(0, 5)) AS o(k)),
       |kept AS (
       |  SELECT pos.doc_id, pos.i, pos.tok,
       |    CASE WHEN cov.i IS NOT NULL THEN 1 ELSE 0 END AS cv
       |  FROM pos LEFT JOIN cov
       |    ON cov.doc_id = pos.doc_id AND cov.i = pos.i),
       |card AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    CAST(SUM(cv) AS BIGINT) AS n_removed,
       |    COALESCE(string_agg(tok, ' ' ORDER BY i)
       |      FILTER (WHERE cv = 0), '') AS clean
       |  FROM kept GROUP BY doc_id),
       |nds AS (
       |  SELECT doc_id, COUNT(*) AS n_dup_spans FROM ds GROUP BY doc_id),
       |ids AS (SELECT doc_id FROM dt)
       |SELECT ids.doc_id,
       |  COALESCE(card.n_tokens, 0) AS n_tokens,
       |  COALESCE(card.n_removed, 0) AS n_removed,
       |  COALESCE(nds.n_dup_spans, 0) AS n_dup_spans,
       |  ${hexPoly15("MD5(COALESCE(card.clean, ''))")} % 1000000007
       |    AS clean_fp
       |FROM ids
       |LEFT JOIN card USING (doc_id)
       |LEFT JOIN nds USING (doc_id)
       |ORDER BY ids.doc_id""".stripMargin

  /** q239 oracle: DSIR replayed — hashed-bucket LMs for target (src0)
    * and raw with add-one smoothing over the constant 1024-bucket
    * space, per-bucket log ratio, exact decimal weight sums, top-50 by
    * UNROUNDED weight with doc_id tiebreak.
    */
  protected def q239DsirSql: String =
    s"""WITH dt AS (
       |  SELECT doc_id, source, string_split(TRIM(text), ' ') AS toks
       |  FROM documents),
       |tok0 AS (
       |  SELECT doc_id, source, MD5(u.token) AS h
       |  FROM dt, UNNEST(toks) AS u(token)
       |  WHERE u.token <> ''),
       |tok AS (
       |  SELECT doc_id, source, ${hexPoly15("h")} % 1024 AS b
       |  FROM tok0),
       |tb AS (
       |  SELECT b, COUNT(*) AS c_t FROM tok
       |  WHERE source = 'src0' GROUP BY b),
       |rb AS (
       |  SELECT b, COUNT(*) AS c_r FROM tok
       |  WHERE source <> 'src0' GROUP BY b),
       |nt AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n FROM tb),
       |nr AS (SELECT CAST(SUM(c_r) AS BIGINT) AS n FROM rb),
       |delta AS (
       |  SELECT rb.b,
       |    LN((CAST(COALESCE(tb.c_t, 0) AS DOUBLE) + 1.0) /
       |      (CAST(nt.n AS DOUBLE) + 1024.0)) -
       |    LN((CAST(rb.c_r AS DOUBLE) + 1.0) /
       |      (CAST(nr.n AS DOUBLE) + 1024.0)) AS delta
       |  FROM rb LEFT JOIN tb USING (b), nt, nr),
       |db AS (
       |  SELECT doc_id, b, COUNT(*) AS cnt FROM tok
       |  WHERE source <> 'src0' GROUP BY doc_id, b),
       |lw AS (
       |  SELECT db.doc_id, CAST(SUM(cnt) AS BIGINT) AS n_tokens,
       |    CAST(SUM(CAST(delta.delta * CAST(cnt AS DOUBLE)
       |      AS DECIMAL(28,12))) AS DOUBLE) AS lw
       |  FROM db JOIN delta USING (b) GROUP BY db.doc_id),
       |pk AS (SELECT doc_id FROM lw ORDER BY lw DESC, doc_id LIMIT 50),
       |ids AS (SELECT doc_id FROM dt WHERE source <> 'src0')
       |SELECT ids.doc_id,
       |  CAST(COALESCE(lw.n_tokens, 0) AS BIGINT) AS n_tokens,
       |  ROUND(lw.lw, 6) AS log_ratio,
       |  CAST(CASE WHEN pk.doc_id IS NOT NULL THEN 1 ELSE 0 END
       |    AS BIGINT) AS selected
       |FROM ids
       |LEFT JOIN lw USING (doc_id)
       |LEFT JOIN pk USING (doc_id)
       |ORDER BY ids.doc_id""".stripMargin

  /** q240 oracle: the full-dim exact top-5 (q220's exact CTE) compared
    * against per-prefix truncated top-5 — truncation is a list slice on
    * the same DOUBLE[] cast, rounded cosine + id tiebreak as everywhere.
    */
  protected def q240MatryoshkaSql: String = {
    val dims = Seq(8, 16, 64)
    def topK(name: String, vec: String => String): String =
      s"""$name AS (
         |  SELECT q_id, vec_id AS n_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |        ROUND(list_inner_product(${vec("e.emb")}, ${vec("q.qe")}) /
         |          (SQRT(list_inner_product(${vec("e.emb")},
         |            ${vec("e.emb")})) *
         |           SQRT(list_inner_product(${vec("q.qe")},
         |            ${vec("q.qe")}))), 6) DESC,
         |        e.vec_id) AS rank
         |    FROM e, q WHERE e.vec_id <> q.q_id)
         |  WHERE rank <= 5)""".stripMargin
    val truncs = dims.map(d =>
      topK(s"t$d", v => s"$v[1:$d]")).mkString(",\n", ",\n", "")
    val arms = dims.map { d =>
      s"""  SELECT CAST($d AS BIGINT) AS dim,
         |    COUNT(DISTINCT exact.q_id) AS n_queries,
         |    COUNT(*) AS n_exact,
         |    CAST(SUM(CASE WHEN t$d.n_id IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_found,
         |    ROUND(CAST(SUM(CASE WHEN t$d.n_id IS NOT NULL THEN 1
         |        ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |      AS recall
         |  FROM exact LEFT JOIN t$d USING (q_id, n_id)""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS qe FROM e WHERE vec_id < 20),
       |${topK("exact", identity)}$truncs
       |SELECT dim, n_queries, n_exact, n_found, recall FROM (
       |$arms)
       |ORDER BY dim""".stripMargin
  }

  /** q241 oracle: q182's portable centroids/assignment over the full
    * table, then the per-cluster quota by the SAME two-round draw
    * (the centroid draw and the sampling clock share the generator —
    * both keyed on vec_id, salt 0) with id tiebreak.
    */
  protected def q241ClusterSampleSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings),
      |drawn AS (
      |  SELECT vec_id, emb,
      |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
      |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
      |  FROM e),
      |cent AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
      |      AS centroid_id,
      |    emb AS centroid
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |assign AS (
      |  SELECT vec_id, centroid_id FROM (
      |    SELECT t.vec_id, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |sized AS (
      |  SELECT a.centroid_id, a.vec_id, drawn.d,
      |    COUNT(*) OVER (PARTITION BY a.centroid_id) AS n_list,
      |    ROW_NUMBER() OVER (PARTITION BY a.centroid_id
      |      ORDER BY drawn.d, a.vec_id) AS rank
      |  FROM assign a JOIN drawn USING (vec_id))
      |SELECT CAST(centroid_id AS BIGINT) AS centroid_id,
      |  CAST(rank AS BIGINT) AS rank, vec_id,
      |  CAST(n_list AS BIGINT) AS n_list
      |FROM sized WHERE rank <= 8
      |ORDER BY centroid_id, rank""".stripMargin

  /** Shared q248/q265 oracle: the packing card — plain global window
    * prefix sum in DuckDB; the Spark batch side's two-level bucket sum
    * and the streaming side's wave-offset partials land on identical
    * values.
    */
  protected def q269AcfSql: String =
    """WITH counts AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY day),
        |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM counts),
        |days AS (
        |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
        |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |series AS (
        |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) AS i,
        |    COALESCE(c.x, 0) AS x
        |  FROM days d CROSS JOIN b LEFT JOIN counts c ON d.day = c.day),
        |tot AS (
        |  SELECT CAST(SUM(x) AS DOUBLE) AS s0,
        |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS s2,
        |    CAST(COUNT(*) AS BIGINT) AS d
        |  FROM series),
        |lags AS (SELECT UNNEST(range(1, 8)) AS l),
        |p AS (
        |  SELECT l.l, s1.x AS x, s2.x AS x2
        |  FROM series s1 CROSS JOIN lags l
        |  JOIN series s2 ON s2.i = s1.i + l.l),
        |a AS (
        |  SELECT l, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |    CAST(SUM(CAST(x AS HUGEINT) * x2) AS DOUBLE) AS nl,
        |    CAST(SUM(x) AS DOUBLE) AS al,
        |    CAST(SUM(x2) AS DOUBLE) AS bl
        |  FROM p GROUP BY l)
        |SELECT CAST(l AS BIGINT) AS lag, n_pairs,
        |  ROUND((nl - (s0 / CAST(d AS DOUBLE)) * (al + bl) +
        |    CAST(n_pairs AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |      (s0 / CAST(d AS DOUBLE))) /
        |    (s2 - CAST(d AS DOUBLE) * (s0 / CAST(d AS DOUBLE)) *
        |      (s0 / CAST(d AS DOUBLE))), 6) AS acf
        |FROM a CROSS JOIN tot
        |ORDER BY lag""".stripMargin

  protected def q276BhFdrSql: String =
    """WITH d AS (
        |  SELECT event_type AS g, CAST(value AS DOUBLE) AS v
        |  FROM events
        |  WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |grp AS (
        |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n_g,
        |    SUM(CAST(v AS DECIMAL(28,2))) AS sd,
        |    SUM(CAST(v * v AS DECIMAL(38,4))) AS qd
        |  FROM d GROUP BY g),
        |tot AS (
        |  SELECT CAST(SUM(n_g) AS BIGINT) AS n,
        |    SUM(sd) AS st, SUM(qd) AS qt
        |  FROM grp),
        |mo AS (
        |  SELECT g, n_g,
        |    CAST(n_g AS DOUBLE) AS ng, CAST(n - n_g AS DOUBLE) AS nr,
        |    CAST(sd AS DOUBLE) AS sa, CAST(qd AS DOUBLE) AS qa,
        |    CAST(st - sd AS DOUBLE) AS sr, CAST(qt - qd AS DOUBLE) AS qr
        |  FROM grp CROSS JOIN tot
        |  WHERE n_g > 1 AND n - n_g > 1),
        |zz AS (
        |  SELECT g, n_g,
        |    sa / ng AS ma, sr / nr AS mr,
        |    (qa - sa * sa / ng) / (ng - 1.0) AS va,
        |    (qr - sr * sr / nr) / (nr - 1.0) AS vr,
        |    ng, nr
        |  FROM mo),
        |zs AS (
        |  SELECT g, n_g, ma, mr,
        |    (ma - mr) / SQRT(va / ng + vr / nr) AS z
        |  FROM zz WHERE va / ng + vr / nr > 0.0),
        |ps AS (
        |  SELECT g, n_g, ma, mr, z,
        |    ROUND(2.0 * (EXP(-ABS(z) * ABS(z) / 2.0) /
        |      2.5066282746310002) *
        |      ((1.0 / (1.0 + 0.2316419 * ABS(z))) * (0.319381530 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * (-0.356563782 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * (1.781477937 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * (-1.821255978 +
        |        (1.0 / (1.0 + 0.2316419 * ABS(z))) * 1.330274429))))),
        |      9) AS p_value
        |  FROM zs),
        |rk AS (
        |  SELECT g, n_g, ma, mr, z, p_value,
        |    CAST(ROW_NUMBER() OVER (ORDER BY p_value, g) AS BIGINT)
        |      AS rank,
        |    CAST(COUNT(*) OVER () AS BIGINT) AS m
        |  FROM ps),
        |crit AS (
        |  SELECT *, ROUND(0.05 * CAST(rank AS DOUBLE) /
        |    CAST(m AS DOUBLE), 9) AS bh_critical
        |  FROM rk),
        |k AS (
        |  SELECT COALESCE(MAX(CASE WHEN p_value <= bh_critical
        |    THEN rank END), 0) AS kstar
        |  FROM crit)
        |SELECT g AS event_type, n_g, ROUND(ma, 6) AS mean_g,
        |  ROUND(mr, 6) AS mean_rest, ROUND(z, 6) AS z, p_value, rank,
        |  bh_critical, rank <= k.kstar AS rejected
        |FROM crit CROSS JOIN k
        |ORDER BY rank""".stripMargin

  protected def q267CusumSql: String =
    """WITH d AS (
        |  SELECT CAST(ts AS DATE) AS day,
        |    SUM(CAST(value AS DECIMAL(28,2))) AS td
        |  FROM events WHERE value IS NOT NULL
        |  GROUP BY day),
        |c AS (
        |  SELECT day, td,
        |    SUM(td) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ck,
        |    CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k
        |  FROM d),
        |t AS (
        |  SELECT CAST(SUM(td) AS DOUBLE) AS s,
        |    CAST(SUM(CAST(CAST(td AS DOUBLE) * CAST(td AS DOUBLE)
        |      AS DECIMAL(38,6))) AS DOUBLE) AS q,
        |    CAST(COUNT(*) AS BIGINT) AS dd
        |  FROM d),
        |dev AS (
        |  SELECT c.day, c.k, t.dd, t.s,
        |    SQRT((t.q - t.s * t.s / CAST(t.dd AS DOUBLE)) /
        |      CAST(t.dd AS DOUBLE)) AS sigma,
        |    CAST(c.ck AS DOUBLE) -
        |      CAST(c.k AS DOUBLE) * (t.s / CAST(t.dd AS DOUBLE)) AS dv
        |  FROM c CROSS JOIN t)
        |SELECT dd AS n_days, ROUND(s, 6) AS total_mass,
        |  ROUND(sigma, 6) AS sigma_daily,
        |  ROUND(ABS(dv) / (sigma * SQRT(CAST(dd AS DOUBLE))), 6)
        |    AS cusum_stat,
        |  day AS changepoint_day,
        |  ROUND(CAST(k AS DOUBLE) / CAST(dd AS DOUBLE), 6)
        |    AS changepoint_frac
        |FROM dev WHERE sigma > 0.0
        |ORDER BY ABS(dv) DESC, day LIMIT 1""".stripMargin

  protected def q266WelchSql: String =
    """WITH v AS (
        |  SELECT CAST(value AS DOUBLE) AS v, event_type = 'click' AS is_a
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND value IS NOT NULL),
        |a AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_b,
        |    CAST(SUM(CASE WHEN is_a THEN CAST(v AS DECIMAL(28,2)) END)
        |      AS DOUBLE) AS sa,
        |    CAST(SUM(CASE WHEN NOT is_a THEN CAST(v AS DECIMAL(28,2)) END)
        |      AS DOUBLE) AS sb,
        |    CAST(SUM(CASE WHEN is_a THEN CAST(v * v AS DECIMAL(38,4)) END)
        |      AS DOUBLE) AS qa,
        |    CAST(SUM(CASE WHEN NOT is_a
        |      THEN CAST(v * v AS DECIMAL(38,4)) END) AS DOUBLE) AS qb
        |  FROM v),
        |p AS (
        |  SELECT n_a, n_b,
        |    sa / CAST(n_a AS DOUBLE) AS ma,
        |    sb / CAST(n_b AS DOUBLE) AS mb,
        |    (qa - sa * sa / CAST(n_a AS DOUBLE)) /
        |      (CAST(n_a AS DOUBLE) - 1.0) AS va,
        |    (qb - sb * sb / CAST(n_b AS DOUBLE)) /
        |      (CAST(n_b AS DOUBLE) - 1.0) AS vb
        |  FROM a WHERE n_a > 1 AND n_b > 1)
        |SELECT n_a, n_b,
        |  ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
        |  ROUND(va, 6) AS var_a, ROUND(vb, 6) AS var_b,
        |  ROUND((ma - mb) / SQRT(va / CAST(n_a AS DOUBLE) +
        |    vb / CAST(n_b AS DOUBLE)), 6) AS t_welch,
        |  ROUND((va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) *
        |      (va / CAST(n_a AS DOUBLE) + vb / CAST(n_b AS DOUBLE)) /
        |    ((va / CAST(n_a AS DOUBLE)) * (va / CAST(n_a AS DOUBLE)) /
        |        (CAST(n_a AS DOUBLE) - 1.0) +
        |      (vb / CAST(n_b AS DOUBLE)) * (vb / CAST(n_b AS DOUBLE)) /
        |        (CAST(n_b AS DOUBLE) - 1.0)), 6) AS df_welch
        |FROM p""".stripMargin

  protected def q380KmvSql: String = {
    val h = hexPoly15("MD5('kmv#' || CAST(k AS VARCHAR))")
    s"""WITH keyed AS (
       |  SELECT l_returnflag AS grp, l_orderkey AS k FROM lineitem),
       |hashed AS (SELECT DISTINCT grp, $h AS h FROM keyed),
       |rk AS (
       |  SELECT grp, h,
       |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS r
       |  FROM hashed),
       |kept AS (SELECT grp, r, h FROM rk WHERE r <= 64),
       |allh AS (SELECT DISTINCT h FROM kept),
       |allr AS (
       |  SELECT 'ALL' AS grp, ROW_NUMBER() OVER (ORDER BY h) AS r, h
       |  FROM allh),
       |merged AS (
       |  SELECT grp, r, h FROM kept
       |  UNION ALL SELECT grp, r, h FROM allr WHERE r <= 64),
       |agg AS (
       |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_kept,
       |    CAST(MAX(h) AS BIGINT) AS kth_min_hash
       |  FROM merged GROUP BY grp),
       |est AS (
       |  SELECT grp, n_kept, kth_min_hash,
       |    ROUND(CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
       |      ELSE CAST(63.0 AS DOUBLE) *
       |        CAST(1152921504606846976 AS DOUBLE) /
       |        CAST(kth_min_hash AS DOUBLE) END, 6) AS kmv_estimate
       |  FROM agg),
       |exact AS (
       |  SELECT grp, CAST(COUNT(DISTINCT k) AS BIGINT) AS n_exact FROM (
       |    SELECT grp, k FROM keyed
       |    UNION ALL SELECT 'ALL' AS grp, k FROM keyed)
       |  GROUP BY grp)
       |SELECT e.grp AS grp, n_kept, kth_min_hash, kmv_estimate, n_exact,
       |  ROUND((kmv_estimate - CAST(n_exact AS DOUBLE)) /
       |    CAST(n_exact AS DOUBLE), 6) + 0.0 AS rel_err
       |FROM est e JOIN exact x ON e.grp = x.grp
       |ORDER BY grp""".stripMargin
  }

  /** Portable log-gamma — the SAME Numerical Recipes Lanczos expression
    * tree as [[graft.functions.Stats.lnGamma]], emitted as SQL text:
    * identical literals, identical association, only +,*,/ and LN, so
    * DuckDB reproduces Spark's doubles bit-for-bit (built-in `lgamma`s
    * are engine-specific and NOT portable).
    */
  protected def lnGammaSql(z: String): String =
    s"(-(($z) + 5.5 - (($z) + 0.5) * LN(($z) + 5.5)) + " +
      "LN(2.5066282746310005 * (1.000000000190015 + " +
      s"76.18009172947146 / (($z) + 1.0) + " +
      s"-86.50532032941677 / (($z) + 2.0) + " +
      s"24.01409824083091 / (($z) + 3.0) + " +
      s"-1.231739572450155 / (($z) + 4.0) + " +
      s"1.208650973866179e-3 / (($z) + 5.0) + " +
      s"-5.395239384953e-6 / (($z) + 6.0)) / ($z)))"

  protected def lnFactSql(x: String): String = lnGammaSql(s"($x) + 1.0")

  protected def lnChooseSql(n: String, k: String): String =
    s"(${lnFactSql(n)} - ${lnFactSql(k)} - ${lnFactSql(s"($n) - ($k)")})"

  protected def q381FisherSql: String = {
    def term(kd: String): String =
      s"(${lnChooseSql("r1d", kd)} + " +
        s"${lnChooseSql("(nd - r1d)", s"(c1d - $kd)")} - " +
        s"${lnChooseSql("nd", "c1d")})"
    s"""WITH m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      THEN 1 ELSE 0 END) AS BIGINT) AS r1,
       |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS c1,
       |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |      AND o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS a
       |  FROM orders),
       |md AS (
       |  SELECT n, r1, c1, a, CAST(n AS DOUBLE) AS nd,
       |    CAST(r1 AS DOUBLE) AS r1d, CAST(c1 AS DOUBLE) AS c1d,
       |    CAST(a AS DOUBLE) AS ad
       |  FROM m),
       |ks AS (
       |  SELECT nd, r1d, c1d,
       |    CAST(UNNEST(generate_series(a, LEAST(r1, c1))) AS DOUBLE)
       |      AS kd
       |  FROM md),
       |terms AS (SELECT ${term("kd")} AS lt FROM ks),
       |mx AS (
       |  SELECT MAX(lt) AS mxv, CAST(COUNT(*) AS BIGINT) AS n_terms
       |  FROM terms),
       |s AS (
       |  SELECT CAST(SUM(CAST(EXP(lt - mxv) AS DECIMAL(28,12)))
       |      AS DOUBLE) AS sv,
       |    MAX(mxv) AS mxv, MAX(n_terms) AS n_terms
       |  FROM terms, mx)
       |SELECT n, r1, c1, a AS a_obs,
       |  ROUND(r1d * c1d / nd, 6) AS expected_a,
       |  CASE WHEN ad > 0 AND r1d - ad > 0 AND c1d - ad > 0
       |      AND nd - r1d - c1d + ad > 0
       |    THEN ROUND(LN(ad * (nd - r1d - c1d + ad) /
       |      ((r1d - ad) * (c1d - ad))), 6) + 0.0 END AS log_odds,
       |  n_terms,
       |  ROUND(mxv + LN(sv), 6) + 0.0 AS ln_p_right,
       |  ROUND(EXP(mxv + LN(sv)), 6) AS p_right,
       |  ROUND(EXP(mxv + LN(sv)) - 0.5 * EXP(${term("ad")}), 6) + 0.0
       |    AS mid_p_right
       |FROM md, s""".stripMargin
  }

  protected def q382RansacSql: String = {
    def drawSql(seed: String): String =
      s"(((($seed) % 1000003) * 2654435761) % 1000003 + " +
        s"($seed) // 1000003) % 9999991 * 22695477 % 9999991 % n"
    s"""WITH $dailySeriesCtes,
       |meta AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CASE WHEN COUNT(*) > 1
       |      THEN ROUND(STDDEV_SAMP(CAST(x AS DOUBLE)), 6) END / 2.0
       |      AS thr
       |  FROM series),
       |cd AS (
       |  SELECT CAST(UNNEST(generate_series(0, 15)) AS BIGINT) AS cand,
       |    n, thr
       |  FROM meta),
       |dr AS (
       |  SELECT cand, n, thr,
       |    ${drawSql("cand * 7919")} AS i0,
       |    ${drawSql("cand * 7919 + 3571")} AS i1r
       |  FROM cd),
       |d2 AS (
       |  SELECT cand, n, thr, i0,
       |    CASE WHEN i1r = i0 THEN (i1r + 1) % n ELSE i1r END AS i1
       |  FROM dr),
       |pts0 AS (
       |  SELECT d2.*, s0.x AS x0, s1.x AS x1
       |  FROM d2 JOIN series s0 ON s0.i = d2.i0
       |    JOIN series s1 ON s1.i = d2.i1),
       |pts AS (
       |  SELECT cand, n, thr, i0, i1,
       |    ROUND((CAST(x1 AS DOUBLE) - CAST(x0 AS DOUBLE)) /
       |      (CAST(i1 AS DOUBLE) - CAST(i0 AS DOUBLE)), 9) AS cand_slope,
       |    ROUND(CAST(x0 AS DOUBLE) -
       |      ROUND((CAST(x1 AS DOUBLE) - CAST(x0 AS DOUBLE)) /
       |        (CAST(i1 AS DOUBLE) - CAST(i0 AS DOUBLE)), 9) *
       |      CAST(i0 AS DOUBLE), 9) AS cand_intercept
       |  FROM pts0),
       |scored AS (
       |  SELECT cand, n, thr, i0, i1, cand_slope, cand_intercept,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.i AS HUGEINT) END) AS DOUBLE) AS si,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.i AS HUGEINT) * s.i END) AS DOUBLE) AS sii,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.x AS HUGEINT) END) AS DOUBLE) AS sx,
       |    CAST(SUM(CASE WHEN ABS(CAST(s.x AS DOUBLE) -
       |      (cand_intercept + cand_slope * CAST(s.i AS DOUBLE))) <= thr
       |      THEN CAST(s.i AS HUGEINT) * s.x END) AS DOUBLE) AS six
       |  FROM series s CROSS JOIN pts
       |  GROUP BY cand, n, thr, i0, i1, cand_slope, cand_intercept),
       |best AS (
       |  SELECT * FROM scored ORDER BY n_inliers DESC, cand LIMIT 1)
       |SELECT n AS n_days, thr AS threshold, cand AS best_cand, i0, i1,
       |  ROUND(cand_slope, 6) + 0.0 AS cand_slope,
       |  ROUND(cand_intercept, 6) + 0.0 AS cand_intercept,
       |  n_inliers,
       |  ROUND(CAST(n_inliers AS DOUBLE) / CAST(n AS DOUBLE), 6)
       |    AS inlier_frac,
       |  ROUND((CAST(n_inliers AS DOUBLE) * six - si * sx) /
       |    (CAST(n_inliers AS DOUBLE) * sii - si * si), 6) + 0.0
       |    AS refit_slope,
       |  ROUND((sx - (CAST(n_inliers AS DOUBLE) * six - si * sx) /
       |      (CAST(n_inliers AS DOUBLE) * sii - si * si) * si) /
       |    CAST(n_inliers AS DOUBLE), 6) + 0.0 AS refit_intercept
       |FROM best""".stripMargin
  }

  /** Portable standard-normal pdf/CDF — the SAME fixed expression trees
    * as [[graft.functions.Stats.normPdf]]/normCdf (Zelen–Severo
    * rational tail), emitted as SQL text with identical literals.
    */
  protected def normPdfSql(x: String): String =
    s"(EXP(-0.5 * ($x) * ($x)) / 2.5066282746310002)"

  protected def normCdfSql(x: String): String = {
    def upper(ax: String): String = {
      val k = s"(1.0 / (1.0 + 0.2316419 * ($ax)))"
      s"(1.0 - ${normPdfSql(ax)} * (0.319381530 * $k + " +
        s"-0.356563782 * $k * $k + " +
        s"1.781477937 * $k * $k * $k + " +
        s"-1.821255978 * $k * $k * $k * $k + " +
        s"1.330274429 * $k * $k * $k * $k * $k))"
    }
    s"(CASE WHEN ($x) >= 0 THEN ${upper(s"ABS($x)")} " +
      s"ELSE 1.0 - ${upper(s"ABS($x)")} END)"
  }

  protected def q396ProbitSql: String = {
    val eta = "it.b0 + it.b1 * d.x"
    s"""WITH RECURSIVE d AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x,
       |    CASE WHEN l_returnflag <> 'N' THEN 1.0 ELSE 0.0 END AS y
       |  FROM lineitem WHERE l_orderkey < 500),
       |it(i, b0, b1, ll) AS (
       |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |    CAST(NULL AS DOUBLE)
       |  UNION ALL
       |  SELECT i + 1,
       |    ROUND(b0 + (swxx * g0 - swx * g1) / (sw * swxx - swx * swx), 9),
       |    ROUND(b1 + (sw * g1 - swx * g0) / (sw * swxx - swx * swx), 9),
       |    llm
       |  FROM (
       |    SELECT i, b0, b1,
       |      CAST(SUM(CAST(ph * (y - cdf) / vv AS DECIMAL(28,12)))
       |        AS DOUBLE) AS g0,
       |      CAST(SUM(CAST(ph * (y - cdf) / vv * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS g1,
       |      CAST(SUM(CAST(ph * ph / vv AS DECIMAL(28,12))) AS DOUBLE)
       |        AS sw,
       |      CAST(SUM(CAST(ph * ph / vv * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS swx,
       |      CAST(SUM(CAST(ph * ph / vv * x * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS swxx,
       |      ROUND(CAST(SUM(CAST(y * LN(cdf) + (1.0 - y) * LN(1.0 - cdf)
       |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
       |    FROM (
       |      SELECT i, b0, b1, x, y, ph, cdf,
       |        cdf * (1.0 - cdf) AS vv
       |      FROM (
       |        SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1,
       |          d.x AS x, d.y AS y,
       |          ${normPdfSql(eta)} AS ph,
       |          GREATEST(1e-10, LEAST(0.9999999999,
       |            ${normCdfSql(eta)})) AS cdf
       |        FROM it, d WHERE it.i < 6))
       |    GROUP BY i, b0, b1))
       |SELECT i AS iter, ROUND(b0, 6) + 0.0 AS b0,
       |  ROUND(b1, 6) + 0.0 AS b1, ll AS log_loss
       |FROM it WHERE i >= 1
       |ORDER BY iter""".stripMargin
  }

  protected def q398BlockBootstrapSql: String = {
    val seed = "(r * 31 + j * 7919)"
    val drw = s"((($seed % 1000003) * 2654435761) % 1000003 + " +
      s"$seed // 1000003) % 9999991 * 22695477 % 9999991 % (n - 6)"
    s"""WITH $dailySeriesCtes,
       |ff AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(i AS HUGEINT)) AS DOUBLE) AS fsi,
       |    CAST(SUM(CAST(i AS HUGEINT) * i) AS DOUBLE) AS fsii,
       |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS fsx,
       |    CAST(SUM(CAST(i AS HUGEINT) * x) AS DOUBLE) AS fsix
       |  FROM series),
       |fit0 AS (
       |  SELECT n, fsi, fsx,
       |    ROUND((CAST(n AS DOUBLE) * fsix - fsi * fsx) /
       |      (CAST(n AS DOUBLE) * fsii - fsi * fsi), 9) AS bf
       |  FROM ff),
       |fit AS (
       |  SELECT n, bf,
       |    ROUND((fsx - bf * fsi) / CAST(n AS DOUBLE), 9) AS af
       |  FROM fit0),
       |resid AS (
       |  SELECT s.i AS i,
       |    CAST(s.x AS DOUBLE) -
       |      (af + bf * CAST(s.i AS DOUBLE)) AS e
       |  FROM series s, fit),
       |r0 AS (
       |  SELECT CAST(UNNEST(generate_series(0, 31)) AS BIGINT) AS r),
       |j0 AS (
       |  SELECT r, n,
       |    CAST(UNNEST(generate_series(0, (n + 6) // 7 - 1)) AS BIGINT)
       |      AS j
       |  FROM r0, fit),
       |st AS (SELECT r, j, n, $drw AS s FROM j0),
       |off AS (
       |  SELECT r, j, s,
       |    CAST(UNNEST(generate_series(0, 6)) AS BIGINT) AS o
       |  FROM st),
       |ps AS (SELECT r, j * 7 + o AS pos, s + o AS i FROM off),
       |perr AS (
       |  SELECT r, CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(CAST(pos AS HUGEINT)) AS DOUBLE) AS sp,
       |    CAST(SUM(CAST(pos AS HUGEINT) * pos) AS DOUBLE) AS spp,
       |    CAST(SUM(CAST(ROUND(e, 12) AS DECIMAL(38,12))) AS DOUBLE)
       |      AS se,
       |    CAST(SUM(CAST(ROUND(CAST(pos AS DOUBLE) * e, 12)
       |      AS DECIMAL(38,12))) AS DOUBLE) AS spe
       |  FROM ps JOIN resid USING (i) GROUP BY r),
       |sl AS (
       |  SELECT r,
       |    bf + (CAST(m AS DOUBLE) * spe - sp * se) /
       |      (CAST(m AS DOUBLE) * spp - sp * sp) AS b
       |  FROM perr, fit),
       |rk AS (
       |  SELECT r, b, ROW_NUMBER() OVER (ORDER BY b, r) AS rk FROM sl),
       |agg AS (
       |  SELECT
       |    CAST(SUM(CAST(ROUND(b, 12) AS DECIMAL(38,12))) AS DOUBLE)
       |      AS sb,
       |    CAST(SUM(CAST(ROUND(b * b, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE) AS sbb,
       |    MAX(CASE WHEN rk = 2 THEN b END) AS lo,
       |    MAX(CASE WHEN rk = 31 THEN b END) AS hi,
       |    CAST(COUNT(*) AS BIGINT) AS n_boot
       |  FROM rk)
       |SELECT fit.n AS n_days, n_boot, CAST(7 AS BIGINT) AS block_len,
       |  ROUND(bf, 6) + 0.0 AS slope_full,
       |  ROUND(sb / CAST(n_boot AS DOUBLE), 6) + 0.0 AS boot_mean,
       |  ROUND(SQRT(GREATEST(0.0,
       |    (sbb - CAST(n_boot AS DOUBLE) * (sb / CAST(n_boot AS DOUBLE)) *
       |      (sb / CAST(n_boot AS DOUBLE))) /
       |    (CAST(n_boot AS DOUBLE) - 1.0))), 6) AS boot_se,
       |  ROUND(lo, 6) + 0.0 AS ci_lo,
       |  ROUND(hi, 6) + 0.0 AS ci_hi
       |FROM fit, agg""".stripMargin
  }

  protected def q399UcbReplaySql: String = {
    val arms = Seq("click", "error", "purchase", "signup", "view")
    def u(i: Int): String =
      s"CASE WHEN it.n$i > 0 THEN it.s$i / CAST(it.n$i AS DOUBLE) + " +
        s"SQRT(2.0 * LN(CAST(it.t + 1 AS DOUBLE)) / " +
        s"CAST(it.n$i AS DOUBLE)) ELSE 0.0 END"
    val armCase = arms.zipWithIndex
      .map { case (a, i) => s"WHEN ${i + 1} THEN '$a'" }.mkString(" ")
    val rCase = (1 to 5).map(i => s"WHEN $i THEN r$i").mkString(" ")
    s"""WITH RECURSIVE cells AS (
       |  SELECT CAST(ts AS DATE) AS day, event_type AS arm,
       |    CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,12)))
       |      AS DOUBLE) / COUNT(*) AS m
       |  FROM events
       |  WHERE event_type IN ('click', 'error', 'purchase', 'signup',
       |    'view') AND value IS NOT NULL
       |  GROUP BY day, arm),
       |b AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM cells),
       |days AS (
       |  SELECT CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
       |    CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
       |  FROM b),
       |mx AS (SELECT MAX(m) AS mxv FROM cells),
       |grid AS (
       |  SELECT CAST(date_diff('day', b.lo, d.day) AS BIGINT) + 1 AS t,
       |${arms.zipWithIndex.map { case (a, i) =>
           s"    COALESCE(MAX(CASE WHEN arm = '$a' " +
             s"THEN ROUND(m / mxv, 9) END), 0.0) AS r${i + 1}"
         }.mkString(",\n|")}
       |  FROM days d CROSS JOIN b CROSS JOIN mx
       |    LEFT JOIN cells c ON c.day = d.day
       |  GROUP BY 1),
       |it(t, n1, s1, n2, s2, n3, s3, n4, s4, n5, s5,
       |    chosen, rew, cum) AS (
       |  SELECT CAST(0 AS BIGINT),
       |    0, CAST(0.0 AS DOUBLE), 0, CAST(0.0 AS DOUBLE),
       |    0, CAST(0.0 AS DOUBLE), 0, CAST(0.0 AS DOUBLE),
       |    0, CAST(0.0 AS DOUBLE),
       |    0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
       |  UNION ALL
       |  SELECT t,
       |${(1 to 5).map(i =>
           s"    n$i + CASE WHEN ch = $i THEN 1 ELSE 0 END,\n" +
           s"|    s$i + CASE WHEN ch = $i THEN r$i ELSE 0.0 END"
         ).mkString(",\n|")},
       |    ch,
       |    CASE ch $rCase END,
       |    cum + CASE ch $rCase END
       |  FROM (
       |    SELECT g.t AS t, it.n1, it.s1, it.n2, it.s2, it.n3, it.s3,
       |      it.n4, it.s4, it.n5, it.s5, it.cum AS cum,
       |      g.r1 AS r1, g.r2 AS r2, g.r3 AS r3, g.r4 AS r4, g.r5 AS r5,
       |      CASE WHEN it.t + 1 <= 5 THEN CAST(it.t + 1 AS INT)
       |        WHEN ${u(1)} >= ${u(2)} AND ${u(1)} >= ${u(3)}
       |          AND ${u(1)} >= ${u(4)} AND ${u(1)} >= ${u(5)} THEN 1
       |        WHEN ${u(2)} >= ${u(3)} AND ${u(2)} >= ${u(4)}
       |          AND ${u(2)} >= ${u(5)} THEN 2
       |        WHEN ${u(3)} >= ${u(4)} AND ${u(3)} >= ${u(5)} THEN 3
       |        WHEN ${u(4)} >= ${u(5)} THEN 4
       |        ELSE 5 END AS ch
       |    FROM it JOIN grid g ON g.t = it.t + 1)),
       |tots AS (
       |  SELECT
       |${(1 to 5).map(i =>
           s"    CAST(SUM(CAST(r$i AS DECIMAL(28,12))) AS DOUBLE) AS t$i"
         ).mkString(",\n|")}
       |  FROM grid),
       |bsel AS (
       |  SELECT CASE
       |    WHEN t1 >= t2 AND t1 >= t3 AND t1 >= t4 AND t1 >= t5 THEN 1
       |    WHEN t2 >= t3 AND t2 >= t4 AND t2 >= t5 THEN 2
       |    WHEN t3 >= t4 AND t3 >= t5 THEN 3
       |    WHEN t4 >= t5 THEN 4
       |    ELSE 5 END AS ba
       |  FROM tots),
       |bcum AS (
       |  SELECT t, SUM(CASE ba $rCase END) OVER (ORDER BY t
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bc
       |  FROM grid, bsel)
       |SELECT it.t AS t,
       |  CASE chosen $armCase END AS chosen_arm,
       |  ROUND(rew, 6) AS reward,
       |  ROUND(cum, 6) AS cum_reward,
       |  ROUND(bc - cum, 6) + 0.0 AS cum_regret
       |FROM it JOIN bcum ON bcum.t = it.t
       |WHERE it.t >= 1 ORDER BY t""".stripMargin
  }

  protected def q400PermutationSql: String = {
    val seed = "(u * 31 + p * 7919)"
    val drw = s"((($seed % 1000003) * 2654435761) % 1000003 + " +
      s"$seed // 1000003) % 9999991 * 22695477 % 9999991"
    s"""WITH uu AS (
       |  SELECT user_id AS u,
       |    CAST(SUM(CAST(CAST(value AS DOUBLE) AS DECIMAL(28,12)))
       |      AS DOUBLE) / COUNT(*) AS v,
       |    user_id % 2 = 0 AS a
       |  FROM events WHERE value IS NOT NULL GROUP BY user_id),
       |m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS na
       |  FROM uu),
       |obs AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN a THEN CAST(v AS DECIMAL(28,12)) END)
       |        AS DOUBLE) / CAST(na AS DOUBLE) -
       |      CAST(SUM(CASE WHEN NOT a THEN CAST(v AS DECIMAL(28,12)) END)
       |        AS DOUBLE) / CAST(n - na AS DOUBLE) AS od
       |  FROM uu, m GROUP BY n, na),
       |pm AS (
       |  SELECT u, v,
       |    CAST(UNNEST(generate_series(1, 64)) AS BIGINT) AS p
       |  FROM uu),
       |dr AS (SELECT u, v, p, $drw AS d FROM pm),
       |rl AS (
       |  SELECT p, v, n, na,
       |    ROW_NUMBER() OVER (PARTITION BY p ORDER BY d, u) AS rn
       |  FROM dr, m),
       |pp AS (
       |  SELECT p,
       |    CAST(SUM(CASE WHEN rn <= na
       |        THEN CAST(v AS DECIMAL(28,12)) END) AS DOUBLE) /
       |      CAST(na AS DOUBLE) -
       |      CAST(SUM(CASE WHEN NOT rn <= na
       |        THEN CAST(v AS DECIMAL(28,12)) END) AS DOUBLE) /
       |      CAST(n - na AS DOUBLE) AS pd
       |  FROM rl GROUP BY p, n, na),
       |card AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_perm,
       |    CAST(SUM(CASE WHEN ABS(pd) >= ABS(od) THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_extreme
       |  FROM pp, obs)
       |SELECT m.n AS n_units, m.na AS n_a, m.n - m.na AS n_b,
       |  ROUND(od, 6) + 0.0 AS obs_diff,
       |  n_perm, n_extreme,
       |  ROUND(CAST(n_extreme + 1 AS DOUBLE) /
       |    CAST(n_perm + 1 AS DOUBLE), 6) AS p_value
       |FROM m, obs, card""".stripMargin
  }

  /** 3×3 determinant in the fixed [[graft]] det3 shape (row-major). */
  protected def det3Sql(a: String, b: String, c: String, d: String,
      e: String, f: String, g: String, h: String, i: String): String =
    s"(($a) * (($e) * ($i) - ($f) * ($h)) - " +
      s"($b) * (($d) * ($i) - ($f) * ($g)) + " +
      s"($c) * (($d) * ($h) - ($e) * ($g)))"

  protected def q401Logistic2Sql: String = {
    val det = det3Sql("s0", "s1", "s2", "s1", "s11", "s12",
      "s2", "s12", "s22")
    val d0 = det3Sql("g0", "s1", "s2", "g1", "s11", "s12",
      "g2", "s12", "s22")
    val d1 = det3Sql("s0", "g0", "s2", "s1", "g1", "s12",
      "s2", "g2", "s22")
    val d2 = det3Sql("s0", "s1", "g0", "s1", "s11", "g1",
      "s2", "s12", "g2")
    s"""WITH RECURSIVE d AS (
       |  SELECT CAST(l_quantity AS DOUBLE) AS x1,
       |    CAST(l_discount AS DOUBLE) AS x2,
       |    CASE WHEN l_returnflag <> 'N' THEN 1.0 ELSE 0.0 END AS y
       |  FROM lineitem WHERE l_orderkey < 500),
       |it(i, b0, b1, b2, ll) AS (
       |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |    CAST(0.0 AS DOUBLE), CAST(NULL AS DOUBLE)
       |  UNION ALL
       |  SELECT i + 1,
       |    ROUND(b0 + $d0 / $det, 9),
       |    ROUND(b1 + $d1 / $det, 9),
       |    ROUND(b2 + $d2 / $det, 9),
       |    llm
       |  FROM (
       |    SELECT i, b0, b1, b2,
       |      CAST(SUM(CAST(y - p AS DECIMAL(28,12))) AS DOUBLE) AS g0,
       |      CAST(SUM(CAST((y - p) * x1 AS DECIMAL(28,12))) AS DOUBLE)
       |        AS g1,
       |      CAST(SUM(CAST((y - p) * x2 AS DECIMAL(28,12))) AS DOUBLE)
       |        AS g2,
       |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
       |        AS s0,
       |      CAST(SUM(CAST(p * (1.0 - p) * x1 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s1,
       |      CAST(SUM(CAST(p * (1.0 - p) * x2 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s2,
       |      CAST(SUM(CAST(p * (1.0 - p) * x1 * x1 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s11,
       |      CAST(SUM(CAST(p * (1.0 - p) * x1 * x2 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s12,
       |      CAST(SUM(CAST(p * (1.0 - p) * x2 * x2 AS DECIMAL(28,12)))
       |        AS DOUBLE) AS s22,
       |      ROUND(CAST(SUM(CAST(y * LN(p) + (1.0 - y) * LN(1.0 - p)
       |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
       |    FROM (
       |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, it.b2 AS b2,
       |        d.x1 AS x1, d.x2 AS x2, d.y AS y,
       |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x1 +
       |          it.b2 * d.x2))) AS p
       |      FROM it, d
       |      WHERE it.i < 6)
       |    GROUP BY i, b0, b1, b2))
       |SELECT i AS iter, ROUND(b0, 6) + 0.0 AS b0,
       |  ROUND(b1, 6) + 0.0 AS b1, ROUND(b2, 6) + 0.0 AS b2,
       |  ll AS log_loss
       |FROM it WHERE i >= 1
       |ORDER BY iter""".stripMargin
  }

  protected def q402CartographySql: String = {
    val vterm = (1 to 6)
      .map(i => s"(p$i - cm) * (p$i - cm)").mkString(" + ")
    s"""WITH RECURSIVE d AS (
       |  SELECT l_orderkey AS k1, l_linenumber AS k2,
       |    CAST(l_quantity AS DOUBLE) AS x,
       |    CASE WHEN l_returnflag <> 'N' THEN 1.0 ELSE 0.0 END AS y
       |  FROM lineitem WHERE l_orderkey < 500),
       |it(i, b0, b1, ll) AS (
       |  SELECT 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
       |    CAST(NULL AS DOUBLE)
       |  UNION ALL
       |  SELECT i + 1,
       |    ROUND(b0 + (swxx * g0 - swx * g1) / (sw * swxx - swx * swx), 9),
       |    ROUND(b1 + (sw * g1 - swx * g0) / (sw * swxx - swx * swx), 9),
       |    llm
       |  FROM (
       |    SELECT i, b0, b1,
       |      CAST(SUM(CAST(y - p AS DECIMAL(28,12))) AS DOUBLE) AS g0,
       |      CAST(SUM(CAST((y - p) * x AS DECIMAL(28,12))) AS DOUBLE) AS g1,
       |      CAST(SUM(CAST(p * (1.0 - p) AS DECIMAL(28,12))) AS DOUBLE)
       |        AS sw,
       |      CAST(SUM(CAST(p * (1.0 - p) * x AS DECIMAL(28,12))) AS DOUBLE)
       |        AS swx,
       |      CAST(SUM(CAST(p * (1.0 - p) * x * x AS DECIMAL(28,12)))
       |        AS DOUBLE) AS swxx,
       |      ROUND(CAST(SUM(CAST(y * LN(p) + (1.0 - y) * LN(1.0 - p)
       |          AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS llm
       |    FROM (
       |      SELECT it.i AS i, it.b0 AS b0, it.b1 AS b1, d.x AS x, d.y AS y,
       |        1.0 / (1.0 + EXP(-(it.b0 + it.b1 * d.x))) AS p
       |      FROM it, d
       |      WHERE it.i < 6)
       |    GROUP BY i, b0, b1)),
       |ps AS (
       |  SELECT
       |${(1 to 6).map(i =>
           s"    MAX(CASE WHEN i = $i THEN b0 END) AS a$i,\n" +
           s"|    MAX(CASE WHEN i = $i THEN b1 END) AS c$i")
         .mkString(",\n|")}
       |  FROM it WHERE i >= 1),
       |pv AS (
       |  SELECT
       |${(1 to 6).map(i =>
           s"    CASE WHEN d.y = 1.0 " +
           s"THEN 1.0 / (1.0 + EXP(-(a$i + c$i * d.x))) " +
           s"ELSE 1.0 - 1.0 / (1.0 + EXP(-(a$i + c$i * d.x))) END AS p$i")
         .mkString(",\n|")}
       |  FROM d, ps),
       |cv0 AS (
       |  SELECT p1, p2, p3, p4, p5, p6,
       |    (p1 + p2 + p3 + p4 + p5 + p6) / 6.0 AS cm
       |  FROM pv),
       |cv AS (
       |  SELECT ROUND(cm, 9) AS conf,
       |    ROUND(($vterm) / 6.0, 9) AS vr
       |  FROM cv0)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_examples,
       |  CAST(SUM(CASE WHEN conf >= 0.7 AND vr < 0.15 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_easy,
       |  CAST(SUM(CASE WHEN vr >= 0.15 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_ambiguous,
       |  CAST(SUM(CASE WHEN conf <= 0.3 AND vr < 0.15 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_hard,
       |  CAST(SUM(CASE WHEN NOT (conf >= 0.7 AND vr < 0.15)
       |    AND NOT (conf <= 0.3 AND vr < 0.15)
       |    AND NOT vr >= 0.15 THEN 1 ELSE 0 END) AS BIGINT) AS n_other,
       |  ROUND(CAST(SUM(CAST(conf AS DECIMAL(28,12))) AS DOUBLE) /
       |    COUNT(*), 6) AS mean_confidence,
       |  ROUND(CAST(SUM(CAST(vr AS DECIMAL(28,12))) AS DOUBLE) /
       |    COUNT(*), 6) AS mean_variability
       |FROM cv""".stripMargin
  }

  protected def q404RfmSql: String = {
    def midq(dim: String, desc: Boolean): String = {
      val mid = s"CAST(prev AS DOUBLE) + CAST(cnt + 1 AS DOUBLE) / 2.0"
      val q =
        if (desc)
          s"CEIL((CAST(n AS DOUBLE) - ($mid) + 1.0) * 5 / " +
            "CAST(n AS DOUBLE))"
        else s"CEIL(($mid) * 5 / CAST(n AS DOUBLE))"
      s"""${dim}v AS (
         |  SELECT $dim AS v, CAST(COUNT(*) AS BIGINT) AS cnt
         |  FROM pc GROUP BY $dim),
         |${dim}c AS (
         |  SELECT v, cnt,
         |    CAST(SUM(cnt) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
         |      PRECEDING AND CURRENT ROW) AS BIGINT) - cnt AS prev
         |  FROM ${dim}v),
         |${dim}q AS (
         |  SELECT v, CAST($q AS BIGINT) AS qq FROM ${dim}c, nn)"""
        .stripMargin
    }
    s"""WITH hz AS (
       |  SELECT MAX(epoch_us(o_orderdate)) AS h FROM orders),
       |pc AS (
       |  SELECT o_custkey AS cust,
       |    (h - MAX(epoch_us(o_orderdate))) // 86400000000 AS recency,
       |    CAST(COUNT(*) AS BIGINT) AS freq,
       |    CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE)
       |      AS monetary
       |  FROM orders, hz WHERE o_custkey IS NOT NULL
       |  GROUP BY o_custkey, h),
       |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pc),
       |${midq("recency", desc = true)},
       |${midq("freq", desc = false)},
       |${midq("monetary", desc = false)},
       |j AS (
       |  SELECT pc.monetary AS monetary, rq.qq AS r, fq2.qq AS f,
       |    mq.qq AS m
       |  FROM pc
       |    JOIN recencyq rq ON pc.recency = rq.v
       |    JOIN freqq fq2 ON pc.freq = fq2.v
       |    JOIN monetaryq mq ON pc.monetary = mq.v),
       |cells AS (
       |  SELECT r, f, m, CAST(COUNT(*) AS BIGINT) AS n_customers,
       |    CAST(SUM(CAST(monetary AS DECIMAL(28,2))) AS DOUBLE) AS sm
       |  FROM j GROUP BY r, f, m),
       |tot AS (SELECT CAST(SUM(n_customers) AS BIGINT) AS nt FROM cells)
       |SELECT r, f, m, n_customers,
       |  ROUND(sm / CAST(n_customers AS DOUBLE), 6) AS mean_monetary,
       |  ROUND(CAST(n_customers AS DOUBLE) / CAST(nt AS DOUBLE), 6)
       |    AS share
       |FROM cells, tot ORDER BY r, f, m""".stripMargin
  }

  protected def q388SignTestSql: String =
    (s"""WITH $dailySeriesCtes,
       |d AS (SELECT x - LAG(x) OVER (ORDER BY i) AS dd FROM series),
       |m0 AS (
       |  SELECT
       |    CAST(SUM(CASE WHEN dd > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_pos,
       |    CAST(SUM(CASE WHEN dd < 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_neg,
       |    CAST(SUM(CASE WHEN dd = 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_ties
       |  FROM d WHERE dd IS NOT NULL),
       |m1 AS (
       |  SELECT n_pos, n_neg, n_ties, n_pos + n_neg AS m,
       |    GREATEST(n_pos, n_neg) AS k
       |  FROM m0),
       |ks AS (
       |  SELECT CAST(m AS DOUBLE) AS md,
       |    CAST(UNNEST(generate_series(k, m)) AS DOUBLE) AS jd
       |  FROM m1),
       |terms AS (
       |  SELECT (${lnChooseSql("md", "jd")} - md * LN(2.0)) AS lt
       |  FROM ks),
       |mx AS (SELECT MAX(lt) AS mxv FROM terms),
       |s AS (
       |  SELECT CAST(SUM(CAST(EXP(lt - mxv) AS DECIMAL(28,12)))
       |      AS DOUBLE) AS sv,
       |    MAX(mxv) AS mxv
       |  FROM terms, mx)
       |SELECT n_pos, n_neg, n_ties, m, k,
       |  ROUND(EXP(mxv + LN(sv)), 6) AS p_right,
       |  ROUND(LEAST(1.0, 2.0 * EXP(mxv + LN(sv))), 6) AS p_two_sided
       |FROM m1, s""").stripMargin

  protected def q391RrSql: String = {
    def draw(tag: String): String = {
      val hx = hexPoly15(s"MD5('rr:$tag:' || CAST(user_id AS VARCHAR))")
      s"(CAST(((($hx % 1000003) * 2654435761) % 1000003 + " +
        s"($hx) // 1000003) % 9999991 * 22695477 % 9999991 AS DOUBLE) " +
        "+ 0.5) / 9999991.0"
    }
    s"""WITH u AS (
       |  SELECT user_id,
       |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 15
       |      AS truth
       |  FROM events GROUP BY user_id),
       |r AS (
       |  SELECT truth,
       |    CASE WHEN ${draw("h")} < 0.75 THEN truth
       |      ELSE ${draw("c")} < 0.5 END AS resp
       |  FROM u),
       |agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS nt,
       |    CAST(SUM(CASE WHEN resp THEN 1 ELSE 0 END) AS BIGINT) AS ny
       |  FROM r),
       |d AS (
       |  SELECT n, nt, ny, CAST(n AS DOUBLE) AS nd,
       |    CAST(ny AS DOUBLE) / CAST(n AS DOUBLE) AS y
       |  FROM agg)
       |SELECT n,
       |  ROUND(CAST(nt AS DOUBLE) / nd, 6) AS true_rate,
       |  ROUND(y, 6) AS observed_yes_rate,
       |  ROUND((y - (1.0 - 0.75) / 2.0) / 0.75, 6) AS rr_estimate,
       |  ROUND(SQRT(y * (1.0 - y) / nd) / 0.75, 6) AS rr_se,
       |  ROUND(ABS((y - (1.0 - 0.75) / 2.0) / 0.75 -
       |    CAST(nt AS DOUBLE) / nd), 6) AS abs_err,
       |  CAST(0.75 AS DOUBLE) AS p_truth
       |FROM d""".stripMargin
  }

  protected def q392NegbinSql: String = {
    val llp = s"xd * LN(m) - m - ${lnFactSql("xd")}"
    val llnb = s"${lnGammaSql("xd + r")} - ${lnGammaSql("r")} - " +
      s"${lnFactSql("xd")} + r * LN(r / (r + m)) + " +
      "xd * LN(m / (r + m))"
    s"""WITH $dailySeriesCtes,
       |m0 AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CAST(x AS HUGEINT)) AS DOUBLE) AS sx,
       |    CAST(SUM(CAST(x AS HUGEINT) * x) AS DOUBLE) AS sxx
       |  FROM series),
       |mom AS (
       |  SELECT n, sx / CAST(n AS DOUBLE) AS m,
       |    (sxx - sx * sx / CAST(n AS DOUBLE)) /
       |      (CAST(n AS DOUBLE) - 1.0) AS v
       |  FROM m0),
       |mom2 AS (
       |  SELECT n, m, v,
       |    CASE WHEN v > m THEN m * m / (v - m) END AS r
       |  FROM mom),
       |xs AS (
       |  SELECT CAST(s.x AS DOUBLE) AS xd, mom2.m, mom2.v, mom2.r
       |  FROM series s, mom2),
       |ll AS (
       |  SELECT
       |    CAST(SUM(CAST(ROUND($llp, 12) AS DECIMAL(38,12)))
       |      AS DOUBLE) AS llp,
       |    CAST(SUM(CASE WHEN r > 0 THEN
       |      CAST(ROUND($llnb, 12) AS DECIMAL(38,12)) END)
       |      AS DOUBLE) AS llnb
       |  FROM xs)
       |SELECT mom2.n AS n_days, ROUND(m, 6) AS mean_daily,
       |  ROUND(v, 6) AS var_daily,
       |  ROUND(v / m, 6) AS vmr,
       |  ROUND(r, 6) AS nb_size,
       |  ROUND(llp, 6) AS ll_poisson,
       |  ROUND(llnb, 6) AS ll_negbin,
       |  ROUND(2.0 * (llnb - llp) - 2.0, 6) + 0.0 AS delta_aic
       |FROM mom2, ll""".stripMargin
  }

  protected def q393WeibullSql: String =
    """WITH h AS (SELECT MAX(epoch_us(ts)) AS hz FROM events),
      |s AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS su
      |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
      |p AS (
      |  SELECT e.user_id, MIN(epoch_us(e.ts)) AS pu
      |  FROM events e JOIN s ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.su
      |  GROUP BY e.user_id),
      |d AS (
      |  SELECT (COALESCE(p.pu, h.hz) - s.su) // 86400000000 AS t,
      |    p.pu IS NOT NULL AS ev
      |  FROM s LEFT JOIN p ON s.user_id = p.user_id, h),
      |byt AS (
      |  SELECT t,
      |    SUM(CASE WHEN ev THEN 1 ELSE 0 END) AS n_event,
      |    SUM(CASE WHEN ev THEN 0 ELSE 1 END) AS n_censored
      |  FROM d GROUP BY t),
      |km AS (
      |  SELECT t, n_event, n_censored,
      |    SUM(n_event + n_censored) OVER (ORDER BY t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
      |  FROM byt),
      |kmf AS (
      |  SELECT t,
      |    CASE WHEN n_event = n_risk THEN 0.0
      |      ELSE ROUND(EXP(SUM(CASE WHEN n_event < n_risk
      |        THEN LN(1.0 - CAST(n_event AS DOUBLE) / n_risk)
      |        ELSE 0.0 END)
      |      OVER (ORDER BY t
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) END
      |      AS survival
      |  FROM km),
      |pts AS (
      |  SELECT LN(CAST(t AS DOUBLE)) AS z, LN(-LN(survival)) AS y
      |  FROM kmf WHERE t > 0 AND survival > 0 AND survival < 1),
      |mm AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
      |    CAST(SUM(CAST(ROUND(z, 12) AS DECIMAL(38,12))) AS DOUBLE)
      |      AS sz,
      |    CAST(SUM(CAST(ROUND(z * z, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) AS szz,
      |    CAST(SUM(CAST(ROUND(y, 12) AS DECIMAL(38,12))) AS DOUBLE)
      |      AS sy,
      |    CAST(SUM(CAST(ROUND(y * y, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) AS syy,
      |    CAST(SUM(CAST(ROUND(z * y, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) AS szy
      |  FROM pts),
      |fit AS (
      |  SELECT n_points, CAST(n_points AS DOUBLE) AS nd,
      |    (CAST(n_points AS DOUBLE) * szy - sz * sy) /
      |      (CAST(n_points AS DOUBLE) * szz - sz * sz) AS slope,
      |    sz, sy, szz, syy, szy
      |  FROM mm WHERE n_points >= 3)
      |SELECT n_points,
      |  ROUND(slope, 6) AS shape_k,
      |  ROUND(EXP(-((sy - slope * sz) / nd) / slope), 6)
      |    AS scale_lambda,
      |  CASE WHEN (nd * szz - sz * sz) * (nd * syy - sy * sy) > 0
      |    THEN ROUND((nd * szy - sz * sy) * (nd * szy - sz * sy) /
      |      ((nd * szz - sz * sz) * (nd * syy - sy * sy)), 6) END AS r2,
      |  ROUND(EXP(-((sy - slope * sz) / nd) / slope) *
      |    EXP(LN(LN(2.0)) / slope), 6) AS median_time
      |FROM fit""".stripMargin

  protected def q248PackingSql: String =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, tok,
      |    CAST(SUM(tok) OVER (ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS BIGINT) AS cum_end
      |  FROM t),
      |f AS (
      |  SELECT tok, cum_end,
      |    CASE WHEN tok > 0 THEN
      |      (cum_end - 1) // 512 - (cum_end - tok) // 512 + 1
      |    ELSE 0 END AS frag
      |  FROM c)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tok) AS BIGINT) AS total_tokens,
      |  CAST(512 AS BIGINT) AS context_len,
      |  CAST((SUM(tok) + 511) // 512 AS BIGINT) AS n_contexts,
      |  CAST(SUM(CASE WHEN frag >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_docs_split,
      |  CAST(SUM(frag) AS BIGINT) AS n_fragments,
      |  CAST(((SUM(tok) + 511) // 512) * 512 - SUM(tok) AS BIGINT)
      |    AS tail_waste_tokens,
      |  ROUND(SUM(CASE WHEN frag >= 2 THEN 1 ELSE 0 END) /
      |    CAST(COUNT(*) AS DOUBLE), 6) AS split_frac
      |FROM f""".stripMargin

  /** q251 oracle: cluster-occupancy drift replayed — q241's full-corpus
    * portable draw/assignment, q247's hash-half slices, Laplace-smoothed
    * per-cluster JS contributions with the identical double expression
    * shape, total row accumulated through DECIMAL(28,6).
    */
  protected def q251ClusterDriftSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    ((vec_id % 1000003) * 2654435761) % 20 >= 10 AS b
      |  FROM embeddings),
      |drawn AS (
      |  SELECT vec_id, emb,
      |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
      |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
      |  FROM e),
      |cent AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
      |      AS centroid_id,
      |    emb AS centroid
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |assign AS (
      |  SELECT vec_id, b, centroid_id FROM (
      |    SELECT t.vec_id, t.b, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |occ AS (
      |  SELECT centroid_id,
      |    CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b
      |  FROM assign GROUP BY centroid_id),
      |f AS (
      |  SELECT c.centroid_id, COALESCE(o.n_a, 0) AS n_a,
      |    COALESCE(o.n_b, 0) AS n_b
      |  FROM cent c LEFT JOIN occ o USING (centroid_id)),
      |tot AS (
      |  SELECT CAST(SUM(n_a) AS BIGINT) AS na,
      |    CAST(SUM(n_b) AS BIGINT) AS nb FROM f),
      |sm AS (
      |  SELECT f.centroid_id, f.n_a, f.n_b,
      |    CAST(f.n_a + 1 AS DOUBLE) / CAST(t.na + 8 AS DOUBLE) AS pa,
      |    CAST(f.n_b + 1 AS DOUBLE) / CAST(t.nb + 8 AS DOUBLE) AS pb
      |  FROM f CROSS JOIN tot t),
      |jc AS (
      |  SELECT centroid_id, n_a, n_b, pa, pb,
      |    ROUND(0.5 * (pa * LN(pa / ((pa + pb) / 2.0)) +
      |                 pb * LN(pb / ((pa + pb) / 2.0))), 6) AS js_contrib
      |  FROM sm)
      |SELECT CAST(centroid_id AS BIGINT) AS centroid_id, n_a, n_b,
      |  ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b, js_contrib
      |FROM jc
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT), t.na, t.nb,
      |  CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
      |  CAST(SUM(CAST(js_contrib AS DECIMAL(28,6))) AS DOUBLE)
      |FROM jc CROSS JOIN tot t GROUP BY t.na, t.nb
      |ORDER BY centroid_id""".stripMargin

  /** q252 oracle: cohesion margins replayed — portable draw, round-6
    * cosines ranked per vector (top-2), DECIMAL(28,6) mean
    * accumulation.
    */
  protected def q394DaviesBouldinSql: String = {
    def dist(a: String, b: String): String =
      s"SQRT(GREATEST(0.0, list_inner_product($a, $a) - " +
        s"2.0 * list_inner_product($a, $b) + " +
        s"list_inner_product($b, $b)))"
    s"""WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings),
      |drawn AS (
      |  SELECT vec_id, emb,
      |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
      |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
      |  FROM e),
      |cent AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
      |      AS centroid_id,
      |    emb AS centroid
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |asg AS (
      |  SELECT vec_id, emb, centroid_id, centroid FROM (
      |    SELECT t.vec_id, t.emb, c.centroid_id, c.centroid,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |sc AS (
      |  SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |    CAST(SUM(CAST(ROUND(${dist("emb", "centroid")}, 12)
      |      AS DECIMAL(38,12))) AS DOUBLE) AS sd
      |  FROM asg GROUP BY centroid_id),
      |sc2 AS (
      |  SELECT centroid_id, n_vecs, sd / CAST(n_vecs AS DOUBLE) AS si
      |  FROM sc),
      |pr AS (
      |  SELECT a.centroid_id AS ci, b.centroid_id AS cj,
      |    ${dist("a.centroid", "b.centroid")} AS m
      |  FROM cent a JOIN cent b ON a.centroid_id <> b.centroid_id),
      |ri AS (
      |  SELECT pr.ci AS ci, s1.n_vecs, s1.si,
      |    MAX((s1.si + s2.si) / pr.m) AS r_max,
      |    MIN(pr.m) AS min_sep
      |  FROM pr JOIN sc2 s1 ON s1.centroid_id = pr.ci
      |    JOIN sc2 s2 ON s2.centroid_id = pr.cj
      |  WHERE pr.m > 0
      |  GROUP BY pr.ci, s1.n_vecs, s1.si),
      |dbx AS (
      |  SELECT CAST(SUM(CAST(ROUND(r_max, 12) AS DECIMAL(38,12)))
      |      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS db,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM ri)
      |SELECT CAST(ci AS BIGINT) AS centroid_id, n_vecs,
      |  ROUND(si, 6) AS scatter,
      |  ROUND(min_sep, 6) AS min_separation,
      |  ROUND(r_max, 6) AS db_component,
      |  k AS k_clusters,
      |  ROUND(db, 6) AS db_index
      |FROM ri, dbx ORDER BY centroid_id""".stripMargin
  }

  protected def q252ClusterCohesionSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
      |  FROM embeddings),
      |drawn AS (
      |  SELECT vec_id, emb,
      |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
      |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
      |  FROM e),
      |cent AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
      |      AS centroid_id,
      |    emb AS centroid
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |scored AS (
      |  SELECT t.vec_id, c.centroid_id,
      |    ROUND(list_inner_product(t.emb, c.centroid) /
      |      (SQRT(list_inner_product(t.emb, t.emb)) *
      |       SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |      AS sim,
      |    ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |      ROUND(list_inner_product(t.emb, c.centroid) /
      |        (SQRT(list_inner_product(t.emb, t.emb)) *
      |         SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |        DESC,
      |      c.centroid_id) AS rn
      |  FROM e t, cent c),
      |top2 AS (
      |  SELECT vec_id,
      |    MAX(CASE WHEN rn = 1 THEN centroid_id END) AS own_cid,
      |    MAX(CASE WHEN rn = 1 THEN sim END) AS own_sim,
      |    MAX(CASE WHEN rn = 2 THEN sim END) AS next_sim
      |  FROM scored WHERE rn <= 2 GROUP BY vec_id)
      |SELECT CAST(own_cid AS BIGINT) AS centroid_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_vecs,
      |  ROUND(CAST(SUM(CAST(own_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_own_cos,
      |  ROUND(CAST(SUM(CAST(next_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |    CAST(COUNT(*) AS DOUBLE), 6) AS mean_next_cos,
      |  ROUND(ROUND(CAST(SUM(CAST(own_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE), 6) -
      |    ROUND(CAST(SUM(CAST(next_sim AS DECIMAL(28,6))) AS DOUBLE) /
      |      CAST(COUNT(*) AS DOUBLE), 6), 6) AS margin
      |FROM top2
      |GROUP BY own_cid
      |ORDER BY centroid_id""".stripMargin

  /** q256 oracle: purity/NMI replayed — portable draw/assignment, the
    * bounded contingency table, every entropy/MI term accumulated
    * through DECIMAL(28,18) (q247's reduction convention), nmi computed
    * from the RAW sums and rounded last.
    */
  protected def q256ClusterLabelSql: String =
    """WITH e AS (
      |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
      |    CAST(label AS BIGINT) AS l
      |  FROM embeddings),
      |drawn AS (
      |  SELECT vec_id, emb,
      |    ((((((vec_id % 1000003) * 2654435761) % 1000003)
      |        + (vec_id // 1000003)) % 9999991) * 22695477) % 9999991 AS d
      |  FROM e),
      |cent AS (
      |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY d, vec_id) - 1 AS INT)
      |      AS centroid_id,
      |    emb AS centroid
      |  FROM (SELECT * FROM drawn ORDER BY d, vec_id LIMIT 8)),
      |assign AS (
      |  SELECT vec_id, l, centroid_id FROM (
      |    SELECT t.vec_id, t.l, c.centroid_id,
      |      ROW_NUMBER() OVER (PARTITION BY t.vec_id ORDER BY
      |        ROUND(list_inner_product(t.emb, c.centroid) /
      |          (SQRT(list_inner_product(t.emb, t.emb)) *
      |           SQRT(list_inner_product(c.centroid, c.centroid))), 6)
      |          DESC,
      |        c.centroid_id) AS rn
      |    FROM e t, cent c)
      |  WHERE rn = 1),
      |cont AS (
      |  SELECT centroid_id, l, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM assign GROUP BY centroid_id, l),
      |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM cont),
      |byc AS (
      |  SELECT centroid_id, CAST(SUM(n) AS BIGINT) AS nc,
      |    CAST(MAX(n) AS BIGINT) AS maxl
      |  FROM cont GROUP BY centroid_id),
      |byl AS (
      |  SELECT l, CAST(SUM(n) AS BIGINT) AS nl FROM cont GROUP BY l),
      |hc AS (
      |  SELECT CAST(SUM(CAST(
      |      (-(CAST(nc AS DOUBLE) / CAST(t.nn AS DOUBLE))) *
      |      LN(CAST(nc AS DOUBLE) / CAST(t.nn AS DOUBLE))
      |    AS DECIMAL(28,18))) AS DOUBLE) AS h_cluster
      |  FROM byc CROSS JOIN tot t),
      |hl AS (
      |  SELECT CAST(SUM(CAST(
      |      (-(CAST(nl AS DOUBLE) / CAST(t.nn AS DOUBLE))) *
      |      LN(CAST(nl AS DOUBLE) / CAST(t.nn AS DOUBLE))
      |    AS DECIMAL(28,18))) AS DOUBLE) AS h_label
      |  FROM byl CROSS JOIN tot t),
      |mi AS (
      |  SELECT CAST(SUM(CAST(
      |      (CAST(c.n AS DOUBLE) / CAST(t.nn AS DOUBLE)) *
      |      LN(CAST(c.n AS DOUBLE) * CAST(t.nn AS DOUBLE) /
      |        (CAST(b.nc AS DOUBLE) * CAST(y.nl AS DOUBLE)))
      |    AS DECIMAL(28,18))) AS DOUBLE) AS mi
      |  FROM cont c
      |  JOIN byc b USING (centroid_id)
      |  JOIN byl y USING (l)
      |  CROSS JOIN tot t),
      |pur AS (
      |  SELECT CAST(MAX(t.nn) AS BIGINT) AS n_vecs,
      |    COUNT(*) AS n_clusters,
      |    CAST(SUM(maxl) AS BIGINT) AS pure
      |  FROM byc CROSS JOIN tot t),
      |nl2 AS (SELECT COUNT(*) AS n_labels FROM byl)
      |SELECT p.n_vecs, p.n_clusters, nl2.n_labels,
      |  ROUND(CAST(p.pure AS DOUBLE) / CAST(p.n_vecs AS DOUBLE), 6)
      |    AS purity,
      |  ROUND(hc.h_cluster, 6) AS h_cluster,
      |  ROUND(hl.h_label, 6) AS h_label,
      |  ROUND(mi.mi, 6) AS mi,
      |  CASE WHEN hc.h_cluster > 0.0 AND hl.h_label > 0.0 THEN
      |    ROUND(mi.mi / SQRT(hc.h_cluster * hl.h_label), 6) END AS nmi
      |FROM pur p, nl2, hc, hl, mi""".stripMargin

  /** q311's vocabulary hash sweep: terms drawn through
    * hexPoly15(MD5(term)) and the two-round congruential generator,
    * bucketed mod each dim, rolled up to collision counts and mass.
    */
  protected def q311HashCollisionSql: String =
    s"""WITH tok AS (
       |  SELECT u.w AS term
       |  FROM (SELECT string_split(trim(lower(text)), ' ') AS toks
       |        FROM documents) t, UNNEST(toks) AS u(w)
       |  WHERE u.w <> ''),
       |terms AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS occ
       |  FROM tok GROUP BY term),
       |hx AS (
       |  SELECT term, occ, ${hexPoly15("MD5(term)")} AS x
       |  FROM terms),
       |d2 AS (
       |  SELECT term, occ,
       |    ((((((x % 1000003) * 2654435761) % 1000003)
       |      + (x // 1000003)) % 9999991) * 22695477) % 9999991 AS x2
       |  FROM hx),
       |ex AS (
       |  SELECT term, occ, x2, dim
       |  FROM d2 CROSS JOIN (SELECT UNNEST([256, 1024, 4096]) AS dim)),
       |pb AS (
       |  SELECT dim, x2 % CAST(dim AS BIGINT) AS bucket,
       |    CAST(COUNT(*) AS BIGINT) AS bt,
       |    CAST(SUM(occ) AS BIGINT) AS bm
       |  FROM ex GROUP BY dim, bucket)
       |SELECT dim,
       |  CAST(SUM(bt) AS BIGINT) AS n_terms,
       |  CAST(COUNT(*) AS BIGINT) AS buckets_used,
       |  CAST(SUM(CASE WHEN bt >= 2 THEN bt ELSE 0 END) AS BIGINT)
       |    AS colliding_terms,
       |  ROUND(CAST(SUM(CASE WHEN bt >= 2 THEN bt ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(bt) AS DOUBLE), 6) AS collision_rate,
       |  ROUND(CAST(SUM(CASE WHEN bt >= 2 THEN bm ELSE 0 END) AS DOUBLE)
       |    / CAST(SUM(bm) AS DOUBLE), 6) AS colliding_mass_share
       |FROM pb GROUP BY dim
       |ORDER BY dim""".stripMargin

  /** q315's HITS fixed point unrolled: per round, auth raw sums from the
    * previous hub frame, BIGINT floor-normalization against the round
    * max, then the hub half symmetrically. Exact integers end to end.
    * Every step CTE is MATERIALIZED: each round's score frame is
    * referenced twice (raw sums + their max), so DuckDB's default CTE
    * inlining would otherwise expand the plan 4^rounds-fold.
    */
  protected def hitsOracleSql(rounds: Int): String = {
    val steps = (1 to rounds).map { r =>
      s"""ar$r AS MATERIALIZED (
         |  SELECT e.dst AS v, CAST(SUM(h.s) AS BIGINT) AS raw
         |  FROM e JOIN h${r - 1} h ON e.src = h.v GROUP BY e.dst),
         |a$r AS MATERIALIZED (
         |  SELECT v, raw * 1000000 // (SELECT MAX(raw) FROM ar$r) AS s
         |  FROM ar$r),
         |hr$r AS MATERIALIZED (
         |  SELECT e.src AS v, CAST(SUM(a.s) AS BIGINT) AS raw
         |  FROM e JOIN a$r a ON e.dst = a.v GROUP BY e.src),
         |h$r AS MATERIALIZED (
         |  SELECT v, raw * 1000000 // (SELECT MAX(raw) FROM hr$r) AS s
         |  FROM hr$r)""".stripMargin
    }.mkString(",\n")
    s"""WITH e AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS src, l.l_partkey AS dst
       |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       |h0 AS MATERIALIZED (
       |  SELECT DISTINCT src AS v, CAST(1000000 AS BIGINT) AS s FROM e),
       |$steps
       |SELECT 'hub' AS side, v AS id, s AS score_fp,
       |  ROUND(CAST(s AS DOUBLE) / 1000000.0, 6) AS score
       |FROM (SELECT v, s FROM h$rounds ORDER BY s DESC, v LIMIT 10)
       |UNION ALL
       |SELECT 'authority' AS side, v AS id, s AS score_fp,
       |  ROUND(CAST(s AS DOUBLE) / 1000000.0, 6) AS score
       |FROM (SELECT v, s FROM a$rounds ORDER BY s DESC, v LIMIT 10)
       |ORDER BY side, score_fp DESC, id""".stripMargin
  }

  /** q306's greedy MMR loop unrolled: c0 scores every vector against the
    * smallest-id anchor; each step picks argmax ROUND(0.7·rel−0.3·ms,6)
    * (id tie-break) from c_{i−1} and folds the pick's rounded cosine
    * into the survivors' running max-sim.
    */
  protected def mmrOracleSql(k: Int): String = {
    def cos(a: String, b: String): String =
      s"ROUND(list_inner_product($a, $b) / " +
        s"(SQRT(list_inner_product($a, $a)) * " +
        s"SQRT(list_inner_product($b, $b))), 6)"
    val steps = (1 to k).map { i =>
      val prev = s"c${i - 1}"
      val pick =
        s"""p$i AS (
           |  SELECT vec_id, emb, rel, ms FROM $prev
           |  ORDER BY ROUND(0.7 * rel - 0.3 * ms, 6) DESC, vec_id
           |  LIMIT 1)""".stripMargin
      val next = if (i == k) "" else
        s""",
           |c$i AS (
           |  SELECT c.vec_id, c.emb, c.rel,
           |    GREATEST(c.ms, ${cos("c.emb", "p.emb")}) AS ms
           |  FROM $prev c CROSS JOIN p$i p
           |  WHERE c.vec_id <> p.vec_id)""".stripMargin
      pick + next
    }.mkString(",\n")
    val out = (1 to k).map { i =>
      s"""SELECT $i AS pick_rank, vec_id, rel AS relevance,
         |  ROUND(ms, 6) AS max_sim,
         |  ROUND(0.7 * rel - 0.3 * ms, 6) AS mmr_score FROM p$i"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
       |  FROM embeddings),
       |anc AS (SELECT emb FROM e ORDER BY vec_id LIMIT 1),
       |c0 AS (
       |  SELECT e.vec_id, e.emb,
       |    ${cos("e.emb", "a.emb")} AS rel,
       |    0.0 AS ms
       |  FROM e CROSS JOIN anc a),
       |$steps
       |$out
       |ORDER BY pick_rank""".stripMargin
  }

  /** q309's fairness-card SQL, shared verbatim by the q314 streaming
    * twin (additive confusion cells; stream ≡ batch contract).
    */
  protected def q309FairnessSql: String =
      """WITH d AS (
        |  SELECT o_orderpriority AS grp,
        |    o_totalprice > 150000 AS y,
        |    ((o_orderkey % 1000) / 1000.0 + o_totalprice / 1e6) > 0.65
        |      AS p
        |  FROM orders),
        |c AS (
        |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN y AND p THEN 1 ELSE 0 END) AS BIGINT)
        |      AS tp,
        |    CAST(SUM(CASE WHEN (NOT y) AND p THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN y AND (NOT p) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN (NOT y) AND (NOT p) THEN 1 ELSE 0 END)
        |      AS BIGINT) AS tn
        |  FROM d GROUP BY grp),
        |g AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(tp) AS BIGINT) AS gtp,
        |    CAST(SUM(fp) AS BIGINT) AS gfp,
        |    CAST(SUM(fn) AS BIGINT) AS gfn,
        |    CAST(SUM(tn) AS BIGINT) AS gtn
        |  FROM c)
        |SELECT grp AS o_orderpriority, n,
        |  ROUND(CASE WHEN n > 0 THEN
        |    CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
        |    AS selection_rate,
        |  ROUND(CASE WHEN n > 0 THEN
        |    CAST(tp + fp AS DOUBLE) / CAST(n AS DOUBLE) END -
        |    CASE WHEN nn > 0 THEN
        |      CAST(gtp + gfp AS DOUBLE) / CAST(nn AS DOUBLE) END, 6)
        |    AS dp_gap,
        |  ROUND(CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END, 6) AS tpr,
        |  ROUND(CASE WHEN tp + fn > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END -
        |    CASE WHEN gtp + gfn > 0 THEN
        |      CAST(gtp AS DOUBLE) / CAST(gtp + gfn AS DOUBLE) END, 6)
        |    AS eo_gap,
        |  ROUND(CASE WHEN fp + tn > 0 THEN
        |    CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) END, 6) AS fpr,
        |  ROUND(CASE WHEN fp + tn > 0 THEN
        |    CAST(fp AS DOUBLE) / CAST(fp + tn AS DOUBLE) END -
        |    CASE WHEN gfp + gtn > 0 THEN
        |      CAST(gfp AS DOUBLE) / CAST(gfp + gtn AS DOUBLE) END, 6)
        |    AS fpr_gap,
        |  ROUND(CASE WHEN tp + fp > 0 THEN
        |    CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END, 6)
        |    AS predictive_parity
        |FROM c CROSS JOIN g
        |ORDER BY o_orderpriority""".stripMargin

  /** Shared q235/q243 encode chain: q234's trained rounds, then every
    * document's words encoded by replaying the folds in merge order —
    * the per-word delimited subword string is what finishing selects
    * aggregate (the Spark side joins with the same separator). Callers
    * must select FROM the final fold relation [[bpeEncodeFinal]] — the
    * name is derived from the same rounds count so the two can't drift.
    */
  // defs, not vals: the oracles map is a val declared earlier in this
  // object and evaluates these during object init — a val here would
  // still be 0 at that point (init order), silently emitting 0 rounds
  protected def bpeEncodeRounds: Int = 8

  protected def bpeEncodeFinal: String = s"e$bpeEncodeRounds"

  protected def q235BpeEncodeSql: String =
    s"""${bpeEncodeCtes(bpeEncodeRounds)}
       |SELECT doc_id AS id, COUNT(*) AS n_words,
       |  CAST(SUM(len(string_split(s, chr(31)))) AS BIGINT)
       |    AS n_subwords,
       |  CAST(SUM(${hexPoly15("MD5(s)")} % 1000000007) AS BIGINT)
       |    AS encoding_fp
       |FROM $bpeEncodeFinal
       |GROUP BY doc_id
       |ORDER BY id""".stripMargin

  /** q243 oracle: the shared encode chain aggregated per LANGUAGE —
    * subwords-per-word fertility with the fixed double division.
    */
  protected def q243BpeFertilitySql: String =
    s"""${bpeEncodeCtes(bpeEncodeRounds)},
       |pd AS (
       |  SELECT doc_id, COUNT(*) AS n_words,
       |    CAST(SUM(len(string_split(s, chr(31)))) AS BIGINT)
       |      AS n_subwords
       |  FROM $bpeEncodeFinal GROUP BY doc_id)
       |SELECT d.lang, COUNT(*) AS n_docs,
       |  CAST(SUM(pd.n_words) AS BIGINT) AS n_words,
       |  CAST(SUM(pd.n_subwords) AS BIGINT) AS n_subwords,
       |  ROUND(CAST(SUM(pd.n_subwords) AS DOUBLE) /
       |    CAST(SUM(pd.n_words) AS DOUBLE), 6) AS fertility
       |FROM pd JOIN documents d USING (doc_id)
       |GROUP BY d.lang
       |ORDER BY d.lang""".stripMargin
}
