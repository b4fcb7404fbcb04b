package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alignment joins from the reference, re-expressed as single-pass Spark
  * joins instead of per-row Python loops.
  *
  * The reference matches sensor hive IDs (e.g. 202056) to annotation hive IDs
  * (2056) by string-suffix comparison inside an O(annotations × hives) loop
  * (`/root/reference/src/data/preprocessing.py:168-174` and clones), and
  * joins each annotation to its ±3-day sensor window by re-filtering the full
  * sensor table once per annotation row
  * (`/root/reference/src/data/preprocessing.py:93-94` inside the `iterrows`
  * loop at `preprocessing.py:165`). Both collapse here into one declarative
  * join: the fuzzy suffix match is normalized into an equi-join key (hash
  * joinable, shuffle-free when the small side is broadcast), and the
  * time-window match is a broadcast range join — the fact side streams once,
  * no matter how many anchors.
  */
object FuzzyJoins {

  /** Normalize an ID to its fixed-width decimal suffix so a fuzzy
    * "endswith" match (reference J1) becomes a plain equi-join key.
    * Zero-padding makes short and long IDs comparable deterministically.
    *
    * DOCUMENTED DIVERGENCE for ids shorter than `suffix` digits: the
    * reference's `str(sensor).endswith(str(annot)[-suffix:])`
    * (`preprocessing.py:168-174`) degrades to a SHORTER suffix there —
    * annotation id 56 at suffix 4 matches any sensor ending in "56" — while
    * this key zero-pads ("0056") and matches only sensors whose last 4
    * digits are literally 0056. The padded form is the sound join contract
    * (equi-joinable, no one-to-many suffix ambiguity) and every real MSPB
    * id has ≥ suffix digits, so the divergence is unreachable on the
    * reference's own data; replicating endswith would need a variable-
    * length key explode on the big side.
    */
  def suffixKey(id: Column, width: Int, suffix: Int): Column =
    substring(lpad(id.cast("string"), width, "0"), width - suffix + 1, suffix)

  /** Suffix-match equi-join: `big` keeps all columns, `small` is broadcast.
    * Replaces the reference's per-row linear scan
    * (`/root/reference/src/data/preprocessing.py:168-174`).
    */
  def suffixJoin(big: DataFrame, small: DataFrame, bigId: String,
      smallId: String, width: Int = 6, suffix: Int = 2): DataFrame = {
    val keyed = big.withColumn("suffix_key", suffixKey(col(bigId), width, suffix))
    val dim = small.withColumn("suffix_key", suffixKey(col(smallId), width, suffix))
    keyed.join(broadcast(dim), "suffix_key")
  }

  /** Point-in-interval join (reference J2): every anchor row picks up all
    * fact rows of the same key whose timestamp falls inside
    * [anchorTs - before, anchorTs + after]. The anchor side is broadcast —
    * annotations are tiny relative to the sensor stream — so the fact table
    * is scanned exactly once with no shuffle. `before`/`after` are SQL
    * interval strings, e.g. "3 DAYS".
    */
  def intervalJoin(fact: DataFrame, anchors: DataFrame,
      factKey: String, anchorKey: String,
      factTs: String, anchorTs: String,
      before: String, after: String): DataFrame = {
    val a = broadcast(anchors)
    fact.join(a,
      fact(factKey) === a(anchorKey) &&
        fact(factTs) >= a(anchorTs) - expr(s"INTERVAL $before") &&
        fact(factTs) <= a(anchorTs) + expr(s"INTERVAL $after"))
  }

  /** Shuffle-bounded point-in-interval join for when the anchor side is TOO
    * BIG to broadcast (the scale regime [[intervalJoin]] can't serve: at
    * corpus scale both the fact stream and the anchor set can be huge).
    * Time is discretized into `bucketMicros` buckets: each fact row belongs
    * to exactly ONE bucket, each anchor row is replicated onto the
    * ⌈window/bucket⌉+1 buckets its interval overlaps, and the join becomes a
    * plain EQUI-join on (key, bucket) + the exact range residual — one
    * bounded shuffle, no broadcast, no BroadcastNestedLoopJoin fallback,
    * and no dedup pass (single-bucket fact membership makes matches unique).
    *
    * Anchor replication factor = (beforeMicros+afterMicros)/bucketMicros + 1,
    * so pick the bucket near the window width (replication ≈ 2-3×). Output
    * rows are identical to [[intervalJoin]] on the same inputs.
    */
  def intervalJoinBucketed(fact: DataFrame, anchors: DataFrame,
      factKey: String, anchorKey: String, factTs: String, anchorTs: String,
      beforeMicros: Long, afterMicros: Long, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val fb = fact.withColumn("__b",
      floor(unix_micros(col(factTs)) / bucketMicros))
    val ab = anchors.withColumn("__b", explode(sequence(
      floor((unix_micros(col(anchorTs)) - beforeMicros) / bucketMicros),
      floor((unix_micros(col(anchorTs)) + afterMicros) / bucketMicros))))
    fb.join(ab,
        fb(factKey) === ab(anchorKey) && fb("__b") === ab("__b") &&
          unix_micros(fb(factTs)) >= unix_micros(ab(anchorTs)) - beforeMicros &&
          unix_micros(fb(factTs)) <= unix_micros(ab(anchorTs)) + afterMicros)
      .drop(fb("__b")).drop(ab("__b"))
  }

  /** As-of join: each left row picks up the `payload` columns of the LATEST
    * right row of the same key with `right.ts <= left.ts` (a right row at
    * the exact left timestamp matches). The temporal-alignment primitive
    * Spark lacks natively — the reference's windowed alignment
    * (`preprocessing.py:93-94`) is the interval flavor of the same need.
    *
    * NOT a range join: a tagged union of both sides plus ONE per-key
    * ordered window with `last(ignoreNulls)` carries the most recent right
    * payload forward onto each left row. One shuffle on the key, a
    * per-partition sort, zero candidate-pair blow-up — O(n log n) per key
    * where a range join is O(left × right) per key. Left rows with no
    * prior right row keep null payloads (left-outer semantics). DuckDB
    * expresses the identical operator natively (`ASOF LEFT JOIN`), which
    * the oracle uses.
    *
    * `payload` names must not collide with left columns. Ties between
    * right rows at one (key, ts) are resolved by window order — give right
    * rows a unique `tsCol` per key (true for any event stream with unique
    * event timestamps) for fully deterministic output.
    */
  /** Skew-safe as-of join: identical semantics to [[asofJoin]], but the
    * window partitions on (key, time bucket) instead of key alone, so ONE
    * hot key no longer serializes its entire history into a single task —
    * per-task work is bounded by `bucketMicros`, the partition count grows
    * with data, and the plan stays one wide shuffle.
    *
    * Cross-bucket continuity comes from carry-in seeds: each bucket's
    * last-right-payload summary (one row per key × bucket, a tiny frame) is
    * as-of joined — recursively, at summary granularity, where the plain
    * window form is safe — onto the buckets the left side occupies, and
    * injected as a synthetic row at bucket start that sorts before every
    * real row of its bucket. Use the plain [[asofJoin]] unless a key's
    * per-bucket row count is the scale risk.
    */
  def asofJoinBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String], bucketMicros: Long,
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.intersect(left.columns).isEmpty,
      s"payload columns ${payload.intersect(left.columns).mkString(",")} collide with left columns")
    import org.apache.spark.sql.expressions.Window
    def bucketStart(ts: Column): Column =
      timestamp_micros(floor(unix_micros(ts) / bucketMicros).cast("long") * bucketMicros)

    // per-(key, bucket) summary: the LAST right payload in the bucket,
    // stamped at bucket END so an as-of match at a later bucket's START
    // admits exactly the strictly-earlier buckets; max_by orders by the
    // same (ts, tiebreak…) tuple as the in-bucket window so the summary
    // picks the identical winning row
    val summary = right.withColumn("__b", bucketStart(col(tsCol)))
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(max_by(struct(payload.map(col): _*),
        struct((col(tsCol) +: rightTieBreak.map(col)): _*)).as("__p"))
      .withColumn("__bts", timestamp_micros(unix_micros(col("__b")) + bucketMicros))
      .select((keys.map(col) :+ col("__bts") :+ col("__p")): _*)
    val leftBuckets = left
      .select((keys.map(col) :+ bucketStart(col(tsCol)).as("__b")): _*)
      .distinct()
      .withColumn("__bts", col("__b"))
    val seeds = asofJoin(leftBuckets, summary, keys, "__bts", Seq("__p"))
      .filter(col("__p").isNotNull)

    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    def withNullLeftCols(d: DataFrame): DataFrame =
      leftOnly.foldLeft(d)((acc, c) =>
        acc.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    // Row-atomic payload struct — same contract as [[asofJoin]]: the matched
    // right row's fields travel together, nulls included.
    val pType = org.apache.spark.sql.types.StructType(payload.map(c =>
      org.apache.spark.sql.types.StructField(c, right.schema(c).dataType,
        nullable = true)))
    val tbCols = rightTieBreak.zipWithIndex.map { case (_, i) => s"__tb$i" }
    def withNullTbCols(d: DataFrame): DataFrame =
      rightTieBreak.zipWithIndex.foldLeft(d) { case (acc, (c, i)) =>
        acc.withColumn(s"__tb$i", lit(null).cast(right.schema(c).dataType))
      }
    val lTag = withNullTbCols(left.withColumn("__b", bucketStart(col(tsCol)))
      .withColumn("__rank", lit(1))
      .withColumn("__ap", lit(null).cast(pType)))
    val rTag = withNullLeftCols(
      right.select((keys :+ tsCol).map(col) ++
          (struct(payload.map(col): _*).cast(pType).as("__ap") +:
            rightTieBreak.zipWithIndex.map { case (c, i) =>
              col(c).as(s"__tb$i") }): _*)
        .withColumn("__b", bucketStart(col(tsCol)))
        .withColumn("__rank", lit(0)))
    val seedTag = withNullTbCols(withNullLeftCols(
      seeds.select((keys.map(col) ++ Seq(col("__b"), col("__b").as(tsCol),
        lit(-1).as("__rank"), col("__p").cast(pType).as("__ap"))): _*)))

    val w = Window.partitionBy((keys :+ "__b").map(col): _*)
      .orderBy(col(tsCol).asc +: col("__rank").asc +:
        tbCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(
        lTag.unionByName(rTag).unionByName(seedTag)
          .withColumn("__ap", last(col("__ap"), ignoreNulls = true).over(w))
          .filter(col("__rank") === 1)) { (d, c) =>
        d.withColumn(c, col("__ap").getField(c))
      }
      .drop("__rank" +: "__b" +: "__ap" +: tbCols: _*)
  }

  /** @param rightTieBreak right-side columns that order right rows sharing
    *   one (key, ts) — the LARGEST tuple wins, i.e. `arg_max` semantics,
    *   resolved inside the window sort at zero extra shuffle (a pre-dedup
    *   `groupBy(key, ts)` would cost a second wide shuffle of the right
    *   stream). Without it, tie order among same-ts right rows is
    *   arbitrary — fine only when `tsCol` is unique per key.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      tsCol: String, payload: Seq[String],
      rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(payload.intersect(left.columns).isEmpty,
      s"payload columns ${payload.intersect(left.columns).mkString(",")} collide with left columns")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{StructField, StructType}
    val leftOnly = left.columns.filterNot(c => keys.contains(c) || c == tsCol)
    // Carry the payload as ONE struct so the matched right row stays atomic:
    // per-column last(ignoreNulls) would backfill a null field of the
    // matched row from an OLDER right row, unlike a true as-of join (and
    // unlike DuckDB's ASOF), which returns the whole matched row nulls
    // included.
    val pType = StructType(payload.map(c =>
      StructField(c, right.schema(c).dataType, nullable = true)))
    val tbCols = rightTieBreak.zipWithIndex.map { case (_, i) => s"__tb$i" }
    val l = rightTieBreak.zipWithIndex.foldLeft(
      left.withColumn("__is_left", lit(1))
        .withColumn("__ap", lit(null).cast(pType))) { case (d, (c, i)) =>
      d.withColumn(s"__tb$i", lit(null).cast(right.schema(c).dataType))
    }
    val r = leftOnly.foldLeft(
      right.select((keys :+ tsCol).map(col) ++
          (struct(payload.map(col): _*).cast(pType).as("__ap") +:
            rightTieBreak.zipWithIndex.map { case (c, i) =>
              col(c).as(s"__tb$i") }): _*)
        .withColumn("__is_left", lit(0))) { (d, c) =>
      d.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    // at equal ts the right row sorts FIRST so it is visible to the left
    // row; among tied right rows the largest tiebreak sorts LAST, so
    // last(ignoreNulls) carries exactly the arg_max row
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc +: col("__is_left").asc +:
        tbCols.map(col(_).asc): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    payload.foldLeft(
        l.unionByName(r)
          .withColumn("__ap", last(col("__ap"), ignoreNulls = true).over(w))
          .filter(col("__is_left") === 1)) { (d, c) =>
        d.withColumn(c, col("__ap").getField(c))
      }
      .drop("__is_left" +: "__ap" +: tbCols: _*)
  }

  /** Fellegi–Sunter probabilistic record-linkage scoring over an
    * already-BLOCKED pair frame (never all-pairs — the block key bounds
    * candidate fan-out, q96's rule): each field contributes its
    * log₂(m/u) agreement weight when `agree` holds, its
    * log₂((1−m)/(1−u)) disagreement weight otherwise; the match score is
    * the sum. Weights arrive as precomputed literals (from labeled data
    * or EM in practice), so the score is pure column arithmetic — codegen
    * all the way, no shuffle beyond whatever produced the pairs.
    */
  def fellegiSunterScore(pairs: DataFrame,
      fields: Seq[(org.apache.spark.sql.Column, Double, Double)],
      threshold: Double): DataFrame = {
    val score = fields.map { case (agree, wAgree, wDisagree) =>
      when(agree, lit(wAgree)).otherwise(lit(wDisagree))
    }.reduce(_ + _)
    pairs.withColumn("score", round(score, 6))
      .filter(col("score") >= threshold)
  }

  /** Allen interval-algebra census (Allen 1983): every matched pair of
    * intervals classified into one of the 13 temporal relations
    * (precedes/meets/overlaps/starts/during/finishes, their inverses,
    * equals), counted with shares. The VOCABULARY behind the interval
    * joins this library already runs (point-in-interval q05, as-of
    * q63, period×interval q45): those ANSWER one relation; the census
    * says which relations the data actually exhibits — the profiling
    * step before choosing a temporal-join predicate. Intervals are
    * [start, end] integer pairs; the 13 arms partition all cases
    * (point intervals included), an `other` bucket would expose any
    * hole. Classification is exact integer comparison — fully
    * engine-portable.
    *
    * `a` and `b` must carry (keyCols..., `startCol`, `endCol`); pairs
    * match on keyCols (ONE equi-join shuffle), then one grouped count
    * over the 13-row relation frame.
    */
  def allenCensus(a: DataFrame, b: DataFrame, keyCols: Seq[String],
      startCol: String, endCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one pairing key")
    val la = a.select((keyCols.map(col) :+
      col(startCol).as("__as") :+ col(endCol).as("__ae")): _*)
    val lb = b.select((keyCols.map(col) :+
      col(startCol).as("__bs") :+ col(endCol).as("__be")): _*)
    val p = la.join(lb, keyCols)
    val as = col("__as"); val ae = col("__ae")
    val bs = col("__bs"); val be = col("__be")
    val rel =
      when(ae < bs, "precedes")
        .when(be < as, "preceded_by")
        .when(as === bs && ae === be, "equals")
        .when(ae === bs, "meets")
        .when(be === as, "met_by")
        .when(as === bs && ae < be, "starts")
        .when(as === bs && ae > be, "started_by")
        .when(ae === be && as > bs, "finishes")
        .when(ae === be && as < bs, "finished_by")
        .when(as > bs && ae < be, "during")
        .when(as < bs && ae > be, "contains")
        .when(as < bs && ae > bs && ae < be, "overlaps")
        .when(as > bs && as < be && ae > be, "overlapped_by")
        .otherwise("other")
    val counts = p.select(rel.as("relation"))
      .groupBy(col("relation")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("__t"))
    counts.crossJoin(broadcast(tot))
      .select(col("relation"), col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("share"))
      .orderBy(col("relation"))
  }
}
