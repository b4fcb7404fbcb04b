package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.functions.array_to_vector

import scala.collection.parallel.CollectionConverters._

/** Embedding similarity search: brute-force cosine as the exact baseline and
  * random-hyperplane LSH bucketing as the scale path.
  *
  * The dot product is a pure `zip_with` + `aggregate` column expression in
  * double precision — sequential, deterministic accumulation in array order,
  * no UDF, fully codegen'd. Brute-force against one query vector is a
  * broadcast cross join (one scan of the corpus, no shuffle); the LSH variant
  * buckets both sides so candidate generation is an equi-join on
  * (plane-sign signature), which is the only shuffle at corpus scale.
  */
object SimilarityOps {

  /** Deterministic double-precision dot product of two array columns —
    * composable `functions._` formulation.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))

  /** Native fused single-pass cosine ([[graft.functions.CosineSim]]) —
    * bit-identical to [[cosine]], one array scan instead of three, stays in
    * whole-stage codegen. The hot-path choice for corpus-scale ANN.
    */
  def cosineNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.functions.CosineSim(expression(a), expression(b)))
  }

  /** Native fused dot product ([[graft.functions.DotProduct]]). */
  def dotNative(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge._
    column(graft.functions.DotProduct(expression(a), expression(b)))
  }

  /** Cosine of every corpus vector against the single query vector
    * `queryId`. Output: (idCol, cosine rounded to 6) — the rounding makes
    * downstream top-k ordering portable across engines.
    */
  def cosineScores(embeddings: DataFrame, idCol: String, vecCol: String,
      queryId: Long): DataFrame = {
    val e = embeddings.withColumn("emb_d", col(vecCol).cast("array<double>"))
    val q = e.filter(col(idCol) === queryId).select(col("emb_d").as("q_emb"))
    e.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(q))
      .select(col(idCol),
        round(cosineNative(col("emb_d"), col("q_emb")), 6).as("cosine"))
  }

  /** Brute-force top-k by (rounded) cosine, deterministic tiebreak on id. */
  def topK(scores: DataFrame, idCol: String, k: Int): DataFrame =
    scores.orderBy(col("cosine").desc, col(idCol)).limit(k)

  /** Reciprocal-rank fusion of candidate rankings (the standard hybrid-
    * retrieval combiner: lexical BM25 + dense ANN, each contributing
    * 1/(k₀ + rank)): candidates appearing in any ranking fuse over the
    * union, missing rankers contribute 0. Ranks must already be
    * deterministic (rounded scores + id tiebreak — the [[topK]] /
    * bm25 discipline); the fused score is a fixed-order sum of one
    * IEEE division per ranker, rounded to 6 before the final top-k, so
    * the result replays on any engine.
    *
    * Scale posture: rankings are top-N candidate frames (bounded by
    * construction), so the full-outer fusion join and final TakeOrdered
    * run on k-sized inputs no matter the corpus size.
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, rankCol: String,
      topK: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol),
        (lit(1.0) / (lit(k0.toDouble) + col(rankCol).cast("double")))
          .as(s"__rrf$i"),
        col(rankCol).cast("long").as(s"rank_$i"))
    }
    val joined = tagged.reduce((a, b) => a.join(b, Seq(idCol), "full_outer"))
    val score = tagged.indices
      .map(i => coalesce(col(s"__rrf$i"), lit(0.0))).reduce(_ + _)
    joined
      .select((col(idCol) +: round(score, 6).as("rrf_score") +:
        tagged.indices.map(i => col(s"rank_$i"))): _*)
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topK)
  }

  /** Random-hyperplane LSH signature: sign bits of dot products with
    * `numPlanes` pseudo-random hyperplanes derived deterministically from
    * xxhash64(planeIdx, dimIdx). The plane components are generated per
    * element of the vector itself (no external dim parameter — a mismatch
    * would null-pad through zip_with and silently zero the signature).
    * Vectors in the same bucket are ANN candidates; at 100 TB the
    * all-pairs search becomes a bucket equi-join.
    */
  def hyperplaneSignature(vec: Column, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      // plane component for dim i: hash → uniform in [-1, 1)
      val contrib = aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1),
          (v, i) => v * (pmod(xxhash64(lit(p), i), lit(2000001L)) / 1000000.0 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(contrib >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN candidate pairs via hyperplane-signature buckets. */
  def lshCandidates(embeddings: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int): DataFrame = {
    val sig = embeddings.select(col(idCol),
      hyperplaneSignature(col(vecCol).cast("array<double>"), numPlanes).as("sig"))
    val l = sig.select(col("sig"), col(idCol).as("id_a"))
    val r = sig.select(col("sig"), col(idCol).as("id_b"))
    l.join(r, "sig").filter(col("id_a") < col("id_b")).select("id_a", "id_b")
  }

  /** Engine-PORTABLE sign-random-projection signature (the cosine-LSH
    * dual of [[hyperplaneSignature]], which draws real-valued planes from
    * xxhash64 that no other engine reproduces): hyperplane components are
    * ±1 signs from the parity of MD5's first hex digit over ("hp" + plane
    * + "_" + dim), and the vector is floor-scaled to exact integers
    * (⌊v·10⁶⌋ — float→double is exact, one IEEE multiply, floor; every
    * engine lands on the same integer), so each projection is an EXACT
    * integer sum whose sign bit is unambiguous — no float-accumulation
    * order anywhere, and a DuckDB oracle replays the signature verbatim.
    *
    * Pure per-row expression: no shuffle, no dim parameter (components
    * derive per element). ±1-sign projections are the standard SimHash-
    * for-cosine construction — collision probability 1 − θ/π per bit.
    */
  def portableHyperplaneSignature(vec: Column, numPlanes: Int): Column = {
    // signature bits pack into one signed long; 62 keeps 1L << p positive
    require(numPlanes >= 1 && numPlanes <= 62,
      s"numPlanes must be in [1,62], got $numPlanes")
    val scaled = transform(vec,
      v => floor(v.cast("double") * lit(1000000.0)).cast("long"))
    val bits = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(scaled, sequence(lit(0), size(vec) - 1), (sv, i) =>
          sv * when(pmod(conv(substring(md5(concat(lit(s"hp${p}_"),
                i.cast("string"))), 1, 1), 16, 10).cast("long"),
              lit(2L)) === 0L, lit(1L))
            .otherwise(lit(-1L))),
        lit(0L), (acc, v) => acc + v)
      when(proj >= 0L, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH bucket profile with in-bucket verification: every vector lands in
    * its [[portableHyperplaneSignature]] bucket; buckets report size and
    * the mean exact cosine over their internal pairs — the quality report
    * that tells an ANN operator whether its banding is tight enough
    * before it commits to a bucket-join search. The pair join is BUCKET-
    * keyed (the whole point of LSH — never all-pairs), and the mean
    * accumulates rounded-decimal cosines so it is addition-order-free.
    *
    * Scale note: the ±1 sign matrix is hoisted into a broadcast ONE-ROW
    * frame (planes × dim MD5 parities evaluated once per plan), so the
    * per-row work is just multiply-add over exact integers — the
    * per-element [[portableHyperplaneSignature]] form re-derives each
    * sign per row, which is dim-free but wasted CPU at corpus scale.
    * Same draws, same signatures, same oracle. Fixed-width vectors are
    * the contract, enforced with the [[productQuantize]] existence probe
    * (a ragged vector would silently zip into a null signature).
    */
  def lshBucketProfile(embeddings: DataFrame, idCol: String, vecCol: String,
      numPlanes: Int): DataFrame = {
    require(numPlanes >= 1 && numPlanes <= 62,
      s"numPlanes must be in [1,62], got $numPlanes")
    // ONE aggregate job proves the fixed-width contract AND yields the
    // dimension: min(size)==max(size) over the pruned vec column — not a
    // head() plus a separate full-scan isEmpty probe (an extra corpus
    // pass per call at this operator's scale posture)
    val dims = embeddings
      .agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!dims.isNullAt(0),
      "lshBucketProfile needs at least one non-null vector")
    val d = dims.getInt(0)
    require(d == dims.getInt(1),
      s"ragged input: vector lengths range [${d}, ${dims.getInt(1)}] " +
        s"(lshBucketProfile requires fixed-width vectors)")
    // planes × dim ±1 matrix from the same MD5-parity draw as
    // [[portableHyperplaneSignature]] ("hp<plane>_<dim>"), evaluated on a
    // one-row frame and broadcast
    val signsRow = embeddings.sparkSession.range(1).select(
      transform(sequence(lit(0), lit(numPlanes - 1)), b =>
        transform(sequence(lit(0), lit(d - 1)), i =>
          when(pmod(conv(substring(md5(concat(lit("hp"),
                b.cast("string"), lit("_"), i.cast("string"))), 1, 1),
              16, 10).cast("long"), lit(2L)) === 0L, lit(1L))
            .otherwise(lit(-1L)))).as("__signs"))
    val scaled = transform(col(vecCol),
      v => floor(v.cast("double") * lit(1000000.0)).cast("long"))
    val signature = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(scaled, element_at(col("__signs"), p + 1),
          (sv, s) => sv * s),
        lit(0L), (acc, v) => acc + v)
      when(proj >= 0L, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sig = embeddings.crossJoin(broadcast(signsRow))
      .select(col(idCol),
        col(vecCol).cast("array<double>").as("__emb"),
        signature.as("signature"))
    val a = sig.select(col("signature"), col(idCol).as("id_a"),
      col("__emb").as("__ea"))
    val b = sig.select(col("signature"), col(idCol).as("id_b"),
      col("__emb").as("__eb"))
    val pairAgg = a.join(b, "signature").filter(col("id_a") < col("id_b"))
      .select(col("signature"),
        round(cosineNative(col("__ea"), col("__eb")), 6).as("__cos"))
      .groupBy(col("signature"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("__cos").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("avg_cosine"))
    sig.groupBy(col("signature"))
      .agg(count(lit(1)).as("n_vecs"), min(col(idCol)).as("min_vec_id"))
      .join(pairAgg, Seq("signature"), "left")
      .select(col("signature"), col("n_vecs"), col("min_vec_id"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("avg_cosine"))
  }

  // ------------------------------------------------------------------ IVF

  /** Deterministic coarse quantizer: `nlist` centroids drawn from the
    * corpus itself by stable id hash (a k-means fit is the quality upgrade;
    * the index layout and query path are identical). Returns the broadcast-
    * sized centroid table (centroid_id, centroid).
    */
  def ivfCentroids(embeddings: DataFrame, idCol: String, vecCol: String,
      nlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // orderBy+limit compiles to TakeOrdered (per-partition top-k, no full
    // shuffle); the numbering window then runs on just nlist rows.
    val sampled = embeddings
      .withColumn("h", xxhash64(col(idCol)))
      .select(col("h"), col(idCol), col(vecCol).cast("array<double>").as("centroid"))
      .orderBy(col("h"), col(idCol))
      .limit(nlist)
    sampled
      .withColumn("rn", row_number().over(Window.orderBy(col("h"), col(idCol))))
      .select((col("rn") - 1).as("centroid_id"), col("centroid"))
  }

  /** Engine-portable coarse quantizer twin of [[ivfCentroids]]: the nlist
    * centroid rows are drawn by the two-round congruential hash (the
    * [[SplitOps.prioritySample]] draw family — NOT xxhash64, which no
    * other engine reproduces), so a plain-SQL oracle replays centroid
    * selection, assignment, and probe pruning end-to-end. Same
    * (centroid_id, centroid) contract; [[ivfCentroidsKMeans]] stays the
    * production-quality default — this twin pins the IVF plumbing's
    * arithmetic under an exact cross-engine check.
    */
  def ivfCentroidsPortable(embeddings: DataFrame, idCol: String,
      vecCol: String, nlist: Int, salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(salt), lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val sampled = embeddings
      .select(x2.as("__draw"), id.as("__id"),
        col(vecCol).cast("array<double>").as("centroid"))
      .orderBy(col("__draw"), col("__id"))
      .limit(nlist)
    sampled
      .withColumn("rn",
        row_number().over(Window.orderBy(col("__draw"), col("__id"))))
      .select((col("rn") - 1).cast("int").as("centroid_id"), col("centroid"))
  }

  /** Fitted coarse quantizer: MLlib k-means centroids (the quality upgrade
    * over [[ivfCentroids]]' hash sampling — same (centroid_id, centroid)
    * contract, so the assign/search path is untouched). Vectors are
    * L2-normalized before the fit so Euclidean k-means approximates
    * spherical clustering, matching the cosine metric the IVF lists are
    * probed with. The centroid table is model parameters (nlist rows), not
    * data — materializing it driver-side is the normal MLlib contract.
    */
  def ivfCentroidsKMeans(embeddings: DataFrame, vecCol: String, nlist: Int,
      maxIter: Int = 20, seed: Long = 42): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val unit = {
      val v = col(vecCol).cast("array<double>")
      transform(v, x => x / sqrt(aggregate(v, lit(0.0), (a, e) => a + e * e)))
    }
    val feats = embeddings.select(array_to_vector(unit).as("features"))
    val model = new KMeans().setK(nlist).setMaxIter(maxIter).setSeed(seed)
      .fit(feats)
    val spark = embeddings.sparkSession
    import spark.implicits._
    model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("centroid_id", "centroid")
  }

  /** IVF assignment: every vector to its nearest centroid by cosine — a
    * broadcast join + one argmax, no shuffle of the corpus. At 100 TB this
    * is the partitioning step that makes ANN queries touch 1/nlist of the
    * data per probe.
    */
  def ivfAssign(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, simRound: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // simRound: round the cosine BEFORE the argmax so another engine
    // ranking the same rounded values picks the same centroid (raw-double
    // ordering is the default — rounding costs a hair of assignment
    // quality and only the oracle twin needs the portability)
    val rawSim = cosineNative(col("emb"), col("centroid"))
    val scored = embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", simRound.fold(rawSim)(d => round(rawSim, d)))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("centroid_id"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("emb"), col("centroid_id"))
  }

  /** Centroid-count threshold above which the flat broadcast-argmax
    * assignment stops being the right plan: past it the centroid table is
    * no longer trivially broadcast-sized and the n·nlist compare grows
    * super-linearly, so [[ivfAssignAuto]] switches to the two-level
    * coarse→fine path (n·O(√nlist) compares, coarse-bucket equi-join
    * instead of an unbounded broadcast). 2048 × ~0.5 KB centroids ≈ 1 MB —
    * comfortably under any executor broadcast budget; with the
    * √(n·nprobe) adaptive nlist the switch engages around n·nprobe ≈ 4M
    * vectors, far past every local SF but well inside 100 TB territory.
    */
  val flatAssignMaxCentroids: Int = 2048

  /** Assignment dispatcher: flat argmax ([[ivfAssign]]) while the centroid
    * table stays broadcast-small, the two-level coarse→fine path
    * ([[ivfAssignTwoLevel]]) above [[flatAssignMaxCentroids]] — callers
    * that computed an adaptive nlist pass it here so the plan switch needs
    * no extra count.
    */
  def ivfAssignAuto(embeddings: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, nlist: Int,
      simRound: Option[Int] = None): DataFrame =
    if (nlist <= flatAssignMaxCentroids)
      ivfAssign(embeddings, idCol, vecCol, centroids, simRound)
    else ivfAssignTwoLevel(embeddings, idCol, vecCol, centroids, nlist,
      simRound = simRound)

  /** Two-level IVF assignment — the scale form of [[ivfAssign]] for
    * centroid tables too large to broadcast-argmax. Fine centroids are
    * grouped into ⌈√nlist⌉ contiguous COARSE blocks (block representative
    * = the block's lowest-id fine centroid — deterministic, no extra
    * fit); each vector first picks its best `coarseProbe` blocks against
    * the ⌈√nlist⌉-row representative table (the only broadcast — O(√nlist)
    * rows regardless of nlist), then argmaxes over just those blocks' fine
    * centroids via an EQUI-JOIN on the block id (Spark picks
    * broadcast/shuffle by size — nothing forces an unbounded broadcast).
    * Compare count per vector: √nlist + coarseProbe·√nlist instead of
    * nlist.
    *
    * The two-level argmax is approximate in the usual IVF sense (the true
    * nearest fine centroid can live in an unprobed block; `coarseProbe`
    * trades that recall against cost) but FULLY deterministic and
    * engine-portable under `simRound`: block choice and fine argmax both
    * rank rounded cosines with id tie-breaks, so a plain-SQL oracle
    * replays every assignment digit for digit (q422).
    */
  def ivfAssignTwoLevel(embeddings: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, nlist: Int,
      coarseProbe: Int = 2, simRound: Option[Int] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nlist >= 1, s"nlist must be positive, got $nlist")
    require(coarseProbe >= 1,
      s"coarseProbe must be positive, got $coarseProbe")
    val groupSize = math.ceil(math.sqrt(nlist.toDouble)).toInt
    def rnd(c: Column): Column = simRound.fold(c)(d => round(c, d))
    // block id = centroid_id div groupSize; representative = lowest id in
    // the block (centroid_id % groupSize == 0 — blocks are contiguous)
    val fine = centroids
      .withColumn("coarse_id",
        (col("centroid_id").cast("long") / lit(groupSize)).cast("long"))
    val coarse = fine
      .filter(col("centroid_id").cast("long") % lit(groupSize) === 0)
      .select(col("coarse_id"), col("centroid").as("coarse_centroid"))
    val v = embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("emb"))
    val wc = Window.partitionBy(col(idCol))
      .orderBy(col("c_sim").desc, col("coarse_id").asc)
    val probed = v.crossJoin(broadcast(coarse))
      .withColumn("c_sim", rnd(cosineNative(col("emb"), col("coarse_centroid"))))
      .withColumn("c_rn", row_number().over(wc))
      .filter(col("c_rn") <= coarseProbe)
      .select(col(idCol), col("emb"), col("coarse_id"))
    val wf = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("centroid_id").asc)
    probed
      .join(fine.select(col("coarse_id"), col("centroid_id"), col("centroid")),
        Seq("coarse_id"))
      .withColumn("sim", rnd(cosineNative(col("emb"), col("centroid"))))
      .withColumn("rn", row_number().over(wf))
      .filter(col("rn") === 1)
      .select(col(idCol), col("emb"), col("centroid_id"))
  }

  /** Batched exact kNN join: top-`k` corpus neighbors for EVERY query row —
    * the set-valued generalization of the single-vector [[cosineScores]]+
    * [[topK]] path. The query side broadcasts (queries ≪ corpus), cosine
    * runs in the fused codegen expression, and the ranking window partitions
    * BY QUERY — per-query state only, no global ordering, one corpus scan
    * regardless of query count. Ties broken by neighbor id; scores rounded
    * before ranking so the order is engine-portable.
    *
    * `excludeSameId` (default true) drops the corpus row whose id equals
    * the query's id before ranking — correct for self-queries over ONE id
    * space (each query gets k true neighbors, not itself at cosine 1).
    * Pass false when query ids are unrelated to corpus ids, or a
    * legitimate neighbor sharing the query's id number would be lost.
    */
  def knnJoin(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String,
      queryId: String, queryVec: String, k: Int,
      excludeSameId: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.select(col(corpusId).as("n_id"),
      col(corpusVec).cast("array<double>").as("ne"))
    val q = queries.select(col(queryId).as("q_id"),
      col(queryVec).cast("array<double>").as("qe"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("n_id").asc)
    val paired = c.crossJoin(broadcast(q))
    (if (excludeSameId) paired.filter(col("q_id") =!= col("n_id")) else paired)
      .select(col("q_id"), col("n_id"),
        round(cosineNative(col("ne"), col("qe")), 6).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Batched IVF search: [[ivfSearch]] for a whole QUERY TABLE in one plan.
    * Per-query probe lists come from ranking the (queries × centroids)
    * product — both broadcast-sized, so probe selection never touches the
    * corpus. The corpus joins the probe table on `centroid_id` (pruning each
    * query's scan to its nprobe lists), exact cosine runs only inside probed
    * lists, and the final top-k window partitions by query. At 100 TB this
    * is the ANN serving shape: query batches amortize the corpus scan, and
    * per-query work stays nprobe/nlist of the data.
    *
    * `excludeSameId=true` drops corpus rows whose id equals the query's id
    * BEFORE ranking (for self-queries over one id space, so each query gets
    * exactly `k` true neighbors); leave it false when query ids live in a
    * different id space than the corpus.
    */
  def ivfSearchBatch(assigned: DataFrame, idCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      centroids: DataFrame, nprobe: Int, k: Int,
      excludeSameId: Boolean = false,
      simRound: Option[Int] = None,
      pruneByList: Boolean = false,
      broadcastProbes: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(queryId).as("q_id"),
      col(queryVec).cast("array<double>").as("qe"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("centroid_id").asc)
    // simRound: round probe-selection cosines so another engine picks the
    // same nprobe lists (see ivfAssign) — the final candidate cosine is
    // always rounded to 6 below, this only affects WHICH lists are probed
    val rawCSim = cosineNative(col("qe"), col("centroid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("c_sim", simRound.fold(rawCSim)(d => round(rawCSim, d)))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nprobe)
      .select(col("centroid_id"), col("q_id"), col("qe"))
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    // pruneByList: over a PERSISTED index ([[writeIvfIndex]] lays the
    // assignments out partitioned by list id) the union of probed list ids
    // — at most nlist driver-bounded values, the counting-search
    // convention — is pushed as a LITERAL filter, so the scan statically
    // prunes to the probed directories instead of reading every list and
    // joining it away. Identical rows either way (the probe join already
    // restricts per query; the literal filter is its list-union superset).
    val scanned =
      if (pruneByList) {
        val listIds = probes.select(col("centroid_id")).distinct()
          .collect().map(_.get(0)).toSeq
        assigned.filter(col("centroid_id").isInCollection(listIds))
      } else assigned
    // broadcastProbes: the probe table is queries·nprobe rows WITH query
    // vectors — broadcast-right for a small query batch (the serving
    // shape), wrong when queries ≈ corpus (the all-nodes graph builds set
    // false and the centroid_id equi-join shuffles both sides instead of
    // shipping the whole corpus to every executor)
    val candidates = scanned
      .join(if (broadcastProbes) broadcast(probes) else probes,
        Seq("centroid_id"))
    val filtered =
      if (excludeSameId) candidates.filter(col("q_id") =!= col(idCol))
      else candidates
    filtered
      .select(col("q_id"), col(idCol),
        round(cosineNative(col("emb"), col("qe")), 6).as("cosine"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Semantic deduplication (the SemDeDup recipe, Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embedding space, compare pairs
    * ONLY within a cluster, and keep one canonical member per transitively-
    * connected near-dup group. The cluster equi-join makes the pair
    * generation O(Σ cluster²) instead of O(n²) — pick `nlist` ≈ n / desired
    * cluster size and the within-cluster work stays bounded while cross-
    * cluster pairs (which SemDeDup argues are never near-dups at tight
    * thresholds) cost nothing. One shuffle for the cluster join, then the
    * [[GraphOps.connectedComponents]] rounds; everything else is broadcast.
    */
  def semanticDedup(embeddings: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, nlist: Int = 0, kmeansIter: Int = 10): DataFrame = {
    // few k-means rounds suffice: clusters only BUCKET the pair search, so
    // centroid quality affects cost, not correctness, and near-dups stay
    // co-clustered long before convergence.
    // nlist = 0 → adaptive max(8, ⌈n/250⌉): a FIXED nlist makes the
    // within-cluster pair stage O(n²/nlist) — quadratic (the sf1 bench
    // measured 5.9× wall at 10× data with nlist=8). Growing nlist with n
    // pins the expected cluster size, so pair work is O(n·250) — linear.
    // The pin is 250 (not 640) so it EQUALS the max()-floor cluster size
    // at sf0.1 (2000/250 = 8): a larger divisor leaves a knee where
    // cluster size still grows 2.5× across the 2k→20k window (measured
    // 5.8× wall at 10× data — the max() floor, not the asymptote, was
    // the cost). At n ≤ 2000 the formula reproduces the old nlist = 8.
    val effNlist = if (nlist > 0) nlist
      else math.max(8, math.ceil(embeddings.count() / 250.0).toInt)
    val centroids = ivfCentroidsKMeans(embeddings, vecCol, effNlist,
      kmeansIter)
    // auto: adaptive nlist grows as n/250, so past the broadcast
    // threshold assignment must switch to the two-level coarse path
    val assigned = ivfAssignAuto(embeddings, idCol, vecCol, centroids,
      effNlist)
    val l = assigned.select(col("centroid_id"), col(idCol).as("id_a"),
      col("emb").as("ea"))
    val r = assigned.select(col("centroid_id"), col(idCol).as("id_b"),
      col("emb").as("eb"))
    val edges = l.join(r, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b") &&
        cosineNative(col("ea"), col("eb")) >= minCosine)
      .select("id_a", "id_b")
    graft.operators.GraphOps.keepCanonical(embeddings, idCol, edges,
      "id_a", "id_b")
  }

  /** Engine-portable SemDeDup twin of [[semanticDedup]]: identical
    * bucket → pair → component → keep-canonical pipeline, but the coarse
    * clusters come from [[ivfCentroidsPortable]]'s two-round congruential
    * draw and every cosine is rounded to 6 decimals BEFORE the argmax /
    * threshold decisions — so centroid selection, assignment, the edge
    * set, and the surviving canonical ids all replay exactly in plain SQL
    * (the q182 recipe applied to dedup; reach/min-component replays as the
    * q67 recursive CTE). [[semanticDedup]] with fitted k-means centroids
    * stays the quality default; this twin pins the WHOLE dedup pipeline's
    * arithmetic under an exact cross-engine hash, not just a recall spec.
    *
    * Same scale posture as the default: clusters only bucket the pair
    * search (n²/nlist pair work, corpus never globally shuffled), the
    * component step is the distributed label propagation of
    * [[GraphOps.connectedComponents]].
    */
  def semanticDedupPortable(embeddings: DataFrame, idCol: String,
      vecCol: String, minCosine: Double, nlist: Int = 0): DataFrame = {
    // nlist = 0 → the same adaptive ⌈n/250⌉ cluster-size pinning as
    // [[semanticDedup]] (the oracle SQL computes the identical formula
    // from COUNT(*), so both engines stay in lockstep at the local/gate
    // SFs where the FLAT assignment path runs; above
    // [[flatAssignMaxCentroids]] the approximate two-level coarse path
    // engages and the oracle no longer replays assignment — that path is
    // gated by the forced-two-level q422 card plus SimilarityOpsSpec's
    // coarseProbe ≡ flat unit test, not by this query's oracle)
    val effNlist = if (nlist > 0) nlist
      else math.max(8, math.ceil(embeddings.count() / 250.0).toInt)
    val centroids = ivfCentroidsPortable(embeddings, idCol, vecCol, effNlist)
    val assigned = ivfAssignAuto(embeddings, idCol, vecCol, centroids,
      effNlist, simRound = Some(6))
    val l = assigned.select(col("centroid_id"), col(idCol).as("id_a"),
      col("emb").as("ea"))
    val r = assigned.select(col("centroid_id"), col(idCol).as("id_b"),
      col("emb").as("eb"))
    val edges = l.join(r, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b") &&
        round(cosineNative(col("ea"), col("eb")), 6) >= minCosine)
      .select("id_a", "id_b")
    graft.operators.GraphOps.keepCanonical(embeddings, idCol, edges,
      "id_a", "id_b")
  }

  /** IVF top-k search: score the query against centroids, keep the best
    * `nprobe` lists, and run exact cosine only inside those lists. The
    * scan is pruned to the probed partitions; everything else is untouched.
    */
  def ivfSearch(assigned: DataFrame, idCol: String, queryVec: Seq[Double],
      centroids: DataFrame, nprobe: Int, k: Int): DataFrame = {
    val qCol = typedLit(queryVec)
    val probed = centroids
      .withColumn("q_sim", cosineNative(typedLit(queryVec), col("centroid")))
      .orderBy(col("q_sim").desc, col("centroid_id"))
      .limit(nprobe)
      .select("centroid_id")
    assigned
      .join(broadcast(probed), "centroid_id")
      .select(col(idCol),
        round(cosineNative(col("emb"), qCol), 6).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
  }

  /** Persist an IVF index as a reusable ARTIFACT — at corpus scale the
    * index IS the deliverable, rebuilt never, consumed by every ANN query:
    *
    *   - `root/centroids`: the coarse quantizer (nlist rows, plain
    *     parquet) — model parameters, broadcast-sized by construction;
    *   - `root/assigned`: the corpus assignments written PARTITIONED BY
    *     list id, so a probe of the persisted index prunes the scan to
    *     the probed directories (1/nlist of the data per probe) instead
    *     of reading everything and joining it away.
    *
    * Append convention (the q216 additive-state shape): centroids are
    * FROZEN at build time; [[appendIvfIndex]] assigns each new batch
    * against the frozen quantizer (one broadcast join per ingest, no
    * recluster, no touch of existing list files) and appends its rows
    * into the same partition layout. Re-clustering is an explicit
    * rebuild, never an implicit side effect of ingest.
    */
  def writeIvfIndex(assigned: DataFrame, centroids: DataFrame,
      root: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$root/centroids")
    assigned.write.mode("overwrite").partitionBy("centroid_id")
      .parquet(s"$root/assigned")
  }

  /** Read a persisted IVF index back: (assignments, centroids). The
    * assignment frame restores [[ivfAssign]]'s column order and list-id
    * type (partition-column read-back infers int and reorders columns
    * last — callers must see the exact frame [[writeIvfIndex]] was given).
    */
  def readIvfIndex(spark: org.apache.spark.sql.SparkSession,
      root: String): (DataFrame, DataFrame) = {
    val cents = spark.read.parquet(s"$root/centroids")
    val assignedRaw = spark.read.parquet(s"$root/assigned")
    val others = assignedRaw.columns.toIndexedSeq.filter(_ != "centroid_id")
    val assigned = assignedRaw.select(
      others.map(col) :+ col("centroid_id").cast("int"): _*)
    (assigned, cents)
  }

  /** Incremental ingest into a persisted IVF index: assign `newVectors`
    * against the index's FROZEN centroids and append into the partitioned
    * layout. One broadcast join per batch — the daily-ingest cost is
    * O(batch), independent of index size.
    */
  def appendIvfIndex(spark: org.apache.spark.sql.SparkSession,
      newVectors: DataFrame, idCol: String, vecCol: String, root: String,
      simRound: Option[Int] = None): Unit = {
    val cents = spark.read.parquet(s"$root/centroids")
    ivfAssign(newVectors, idCol, vecCol, cents, simRound)
      .write.mode("append").partitionBy("centroid_id")
      .parquet(s"$root/assigned")
  }

  /** Scalar int8 quantization of an embedding column: per-dimension affine
    * codes q = round((v − mn)/(mx − mn)·255) − 128 — the 4× memory cut
    * (float32 → int8) that decides whether an ANN index fits in executor
    * memory at corpus scale. Returns the per-dimension reconstruction-error
    * report (max |v − v̂| and RMSE); the code/decode columns themselves come
    * from [[quantizeCodes]].
    *
    * One posexplode pass + a 64-row broadcast of the per-dimension bounds;
    * the error aggregation is decimal-exact. Max abs error is bounded by
    * half a step ((mx − mn)/510) by construction — the spec asserts it.
    */
  def int8QuantizationReport(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val vals = embeddings.select(col(idCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
    val bounds = vals.groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    vals.join(broadcast(bounds), "dim")
      .withColumn("__q",
        when(col("mx") === col("mn"), lit(0))
          .otherwise((round((col("v") - col("mn")) /
            (col("mx") - col("mn")) * 255) - 128).cast("int")))
      .withColumn("__recon",
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") + (col("__q") + 128).cast("double") / 255.0 *
            (col("mx") - col("mn"))))
      .withColumn("__err", abs(col("v") - col("__recon")))
      .groupBy(col("dim"))
      .agg(
        count(lit(1)).as("n"),
        round(first(col("mx")) - first(col("mn")), 6).as("range"),
        round(max(col("__err")), 6).as("max_abs_err"),
        round(sqrt(sum((col("__err") * col("__err"))
          .cast("decimal(28,16)")).cast("double") / count(lit(1))), 6)
          .as("rmse"))
  }

  /** Product quantization (Jégou et al., "Product Quantization for
    * Nearest Neighbor Search"): split each D-dim vector into `m`
    * subvectors, k-means each subspace into `k` centroids, and store m
    * small codes per vector — D·4 bytes collapse to m·log₂k bits, the
    * compression that lets a billion-vector ANN index live in executor
    * memory (the vector-valued upgrade of [[int8QuantizationReport]]'s
    * scalar path). Returns (id, codes array, reconstructed vector); each
    * subspace fit is one distributed MLlib k-means over (rows × D/m)
    * doubles, the driver loop only iterates the m subspaces.
    */
  def productQuantize(embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, k: Int = 16, seed: Long = 42L): DataFrame = {
    val spark = embeddings.sparkSession
    // ONE aggregate job proves the fixed-width contract AND yields the
    // dimension (min(size)==max(size) over the pruned vec column): a
    // ragged vector would otherwise be silently sliced into wrong
    // subvectors (slice past the end truncates) and mis-coded with no
    // error — and a separate full-scan isEmpty probe would cost an extra
    // corpus pass per call
    val dims = embeddings
      .agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!dims.isNullAt(0),
      "productQuantize needs at least one non-null vector")
    val d = dims.getInt(0)
    require(d == dims.getInt(1),
      s"ragged input: vector lengths range [${d}, ${dims.getInt(1)}] " +
        s"(productQuantize requires fixed-width vectors)")
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    // each subspace's input is a SLICE of the vector column — a pure
    // codegen projection per fit, no explode/groupBy shuffle and no cache
    // to build subvectors
    val vec = col(vecCol).cast("array<double>")
    // the m subspace fits are independent distributed jobs — run them
    // concurrently from the driver (the gridSearchLogReg pattern) so the
    // cluster pipelines them instead of idling between sequential fits
    val fitted = (0 until m).par.map { s =>
      val part = embeddings.select(col(idCol),
          lit(s).as("s"), slice(vec, s * sub + 1, sub).as("sv"))
        .withColumn("__features", array_to_vector(col("sv")))
      val model = new org.apache.spark.ml.clustering.KMeans()
        .setK(k).setSeed(seed + s).setFeaturesCol("__features")
        .setPredictionCol("code")
        .fit(part)
      val centroids = model.clusterCenters.zipWithIndex.map {
        case (c, i) => (i, c.toArray.toSeq)
      }
      val cdf = spark.createDataFrame(centroids.toSeq)
        .toDF("code", "centroid")
      model.transform(part)
        .select(col(idCol), col("s"), col("code"))
        .join(broadcast(cdf), "code")
    }.toList.reduce(_.unionByName(_))
    fitted
      .select(col(idCol), col("s"), col("code"),
        posexplode(col("centroid")).as(Seq("__sd", "__cv")))
      .withColumn("dim", col("s") * sub + col("__sd"))
      .groupBy(col(idCol))
      .agg(
        // the centroid explode repeats (s, code) once per sub-dimension;
        // dedupe after the ordered collect
        transform(array_distinct(
          sort_array(collect_list(struct(col("s"), col("code"))))),
          x => x.getField("code")).as("codes"),
        transform(sort_array(collect_list(struct(col("dim"), col("__cv")))),
          x => x.getField("__cv")).as("recon"))
  }

  /** (id, int8 code array) + decoded reconstruction, for recall probes. */
  def quantizeCodes(embeddings: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val vals = embeddings.select(col(idCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
    val bounds = vals.groupBy(col("dim"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    vals.join(broadcast(bounds), "dim")
      .withColumn("__q",
        when(col("mx") === col("mn"), lit(0))
          .otherwise((round((col("v") - col("mn")) /
            (col("mx") - col("mn")) * 255) - 128).cast("int")))
      .withColumn("__recon",
        when(col("mx") === col("mn"), col("mn"))
          .otherwise(col("mn") + (col("__q") + 128).cast("double") / 255.0 *
            (col("mx") - col("mn"))))
      .groupBy(col(idCol))
      .agg(
        transform(sort_array(collect_list(struct(col("dim"), col("__q")))),
          x => x.getField("__q")).as("codes"),
        transform(sort_array(collect_list(struct(col("dim"), col("__recon")))),
          x => x.getField("__recon")).as("recon"))
  }

  /** Engine-portable product-quantization twin of [[productQuantize]]
    * (q143 family; reference ANN indexing surface): the per-subspace
    * codebooks are the SLICES of `k` hash-drawn anchor rows (the
    * [[ivfCentroidsPortable]] two-round congruential draw — one draw, all
    * m subspaces slice the same anchors), and code assignment is the
    * argmin of the ROUND-6 squared L2 distance (ties → lowest code) — so
    * codebook build, assignment, and the balance/distortion report replay
    * exactly in plain SQL. The squared distance is composed as
    * ‖x‖² − 2⟨x,c⟩ + ‖c‖² from sequential-fold dot products (the same
    * accumulation DuckDB's `list_inner_product` runs — the q182 parity
    * contract). MLlib-k-means [[productQuantize]] stays the
    * production-quality default; this twin pins the PQ plumbing under an
    * exact cross-engine hash.
    *
    * Output: one row per (subspace, code) — assignment count and round-6
    * mean squared distance, the codebook-balance profile an ANN index
    * operator monitors for dead/overloaded codes.
    *
    * 100 TB posture: the k-row codebook broadcasts; the corpus is scanned
    * once, exploded ×m (a pure projection, no shuffle), and aggregated
    * into m·k groups with map-side combine — no corpus shuffle at all.
    */
  def productQuantizePortable(embeddings: DataFrame, idCol: String,
      vecCol: String, m: Int = 8, k: Int = 4, salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Stats.dsum
    val dims = embeddings
      .agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!dims.isNullAt(0),
      "productQuantizePortable needs at least one non-null vector")
    val d = dims.getInt(0)
    require(d == dims.getInt(1),
      s"ragged input: vector lengths range [${d}, ${dims.getInt(1)}] " +
        s"(productQuantizePortable requires fixed-width vectors)")
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    val vec = col(vecCol).cast("array<double>")
    // k anchors by the congruential draw; code = dense rank over the draw
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(salt), lit(p1)) * lit(2654435761L), lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val anchors = embeddings
      .select(x2.as("__draw"), id.as("__id"), vec.as("anchor"))
      .orderBy(col("__draw"), col("__id"))
      .limit(k)
      .withColumn("code",
        (row_number().over(Window.orderBy(col("__draw"), col("__id"))) - 1)
          .cast("int"))
      .select(col("code"), col("anchor"))
    // one row per (vector, subspace): a pure projection explode, no shuffle
    val subvecs = embeddings
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), lit(m - 1)),
          s => slice(vec, s * sub + 1, lit(sub)))).as(Seq("subspace", "sv")))
    val cv = slice(col("anchor"), col("subspace") * sub + 1, lit(sub))
    val d2 = round(
      dot(col("sv"), col("sv")) - lit(2.0) * dot(col("sv"), cv) +
        dot(cv, cv), 6)
    val w = Window.partitionBy(col(idCol), col("subspace"))
      .orderBy(col("d2").asc, col("code").asc)
    subvecs.crossJoin(broadcast(anchors))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("subspace"), col("code"))
      .agg(count(lit(1)).as("n_assigned"),
        round(dsum(col("d2"), 12) / count(lit(1)), 6).as("avg_sqdist"))
  }

  /** IVFADC — IVF-probed, PQ-coded asymmetric-distance ANN search
    * (Jégou, Douze, Schmid 2011, "Product Quantization for Nearest
    * Neighbor Search"): the production composition of the coarse
    * quantizer ([[ivfCentroidsPortable]]/[[ivfAssign]] — q182) and the
    * product-quantization codebook ([[productQuantizePortable]]'s
    * congruential anchor draw — q193). Each corpus vector is stored as m
    * sub-space CODES; a query probes its `nprobe` best lists, builds a
    * per-(subspace, code) lookup table of exact squared distances to the
    * codebook (|q|·m·k tiny rows), and every candidate is scored by ONE
    * table-lookup sum instead of a full-vector distance.
    *
    * THE memory story at corpus scale: the search scans the m-byte code
    * table, never the raw vectors — with d=64 doubles → m=8 codes that
    * is a 64× read cut on top of the nprobe/nlist scan cut, which is
    * what makes a 100 TB ANN corpus probeable at all.
    *
    * Portability: every distance term is rounded to 6 before the exact
    * decimal sum (addition-order-free), argmins/rankings tie-break on
    * (code, id) — the whole pipeline (draw, assign, code, probe, table,
    * rank) replays in plain SQL. Distances are ADC approximations by
    * construction; [[annRecallCard]] is the quality gauge, this is the
    * cost shape.
    */
  def ivfAdcSearch(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      nlist: Int, nprobe: Int, m: Int = 8, kAnchors: Int = 4,
      topK: Int = 3, excludeSameId: Boolean = true,
      salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Stats.dsum
    val dims = embeddings
      .agg(min(size(col(vecCol))), max(size(col(vecCol)))).head()
    require(!dims.isNullAt(0), "ivfAdcSearch needs at least one vector")
    val d = dims.getInt(0)
    require(d == dims.getInt(1), s"ragged vectors [${d}, ${dims.getInt(1)}]")
    require(d % m == 0, s"dim $d not divisible by m=$m")
    val sub = d / m
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist, salt)
    val assigned = ivfAssign(embeddings, idCol, vecCol, cents,
      simRound = Some(6))
    // PQ codebook: kAnchors rows by the same congruential draw as
    // productQuantizePortable (salt-shifted so codebook != coarse draw)
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(salt + 1), lit(p1)) * lit(2654435761L),
      lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val anchors = embeddings
      .select(x2.as("__draw"), id.as("__id"),
        col(vecCol).cast("array<double>").as("anchor"))
      .orderBy(col("__draw"), col("__id"))
      .limit(kAnchors)
      .withColumn("code",
        (row_number().over(Window.orderBy(col("__draw"), col("__id"))) - 1)
          .cast("int"))
      .select(col("code"), col("anchor"))
    def slices(v: Column): Column =
      transform(sequence(lit(0), lit(m - 1)), s => slice(v, s * sub + 1,
        lit(sub)))
    val av = slice(col("anchor"), col("subspace") * sub + 1, lit(sub))
    def adcDist(qs: Column): Column = round(
      dot(qs, qs) - lit(2.0) * dot(qs, av) + dot(av, av), 6)
    // per-(vector, subspace) code over the ASSIGNED frame — the stored
    // index is (id, list, subspace, code), m ints per vector
    val wCode = Window.partitionBy(col(idCol), col("subspace"))
      .orderBy(col("__d2").asc, col("code").asc)
    val codes = assigned
      .select(col(idCol), col("centroid_id"),
        posexplode(slices(col("emb"))).as(Seq("subspace", "sv")))
      .crossJoin(broadcast(anchors))
      .withColumn("__d2", adcDist(col("sv")))
      .withColumn("__rn", row_number().over(wCode))
      .filter(col("__rn") === 1)
      .select(col(idCol), col("centroid_id"), col("subspace"), col("code"))
    // probe selection: q182's rounded-cosine top-nprobe lists per query
    val q = queries.select(col(queryId).as("q_id"),
      col(queryVec).cast("array<double>").as("qe"))
    val wp = Window.partitionBy(col("q_id"))
      .orderBy(col("c_sim").desc, col("centroid_id").asc)
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("c_sim",
        round(cosineNative(col("qe"), col("centroid")), 6))
      .withColumn("pr", row_number().over(wp))
      .filter(col("pr") <= nprobe)
      .select(col("centroid_id"), col("q_id"))
    // asymmetric lookup table: exact query-to-anchor distances per
    // subspace — |queries|·m·kAnchors rows, broadcast-sized
    val adc = q
      .select(col("q_id"), posexplode(slices(col("qe")))
        .as(Seq("subspace", "qs")))
      .crossJoin(broadcast(anchors))
      .withColumn("d2q", adcDist(col("qs")))
      .select(col("q_id"), col("subspace"), col("code"), col("d2q"))
    // score = Σ_subspace table[code] — one lookup-sum per candidate, the
    // codes scan never touches raw vectors
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("adc_dist").asc, col(idCol).asc)
    val restricted = codes.join(broadcast(probes), Seq("centroid_id"))
    val filtered =
      if (excludeSameId) restricted.filter(col("q_id") =!= col(idCol))
      else restricted
    filtered
      .join(broadcast(adc), Seq("q_id", "subspace", "code"))
      .groupBy(col("q_id"), col(idCol))
      .agg(round(dsum(col("d2q"), 6), 6).as("adc_dist"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Two-stage retrieval: IVFADC shortlist → EXACT re-rank — the standard
    * production refinement (FAISS's `refine` stage): [[ivfAdcSearch]]
    * produces a cheap `shortlist`-deep candidate set from the code table,
    * then raw vectors are fetched for ONLY those |queries|·shortlist
    * rows and re-scored with exact rounded cosine. The expensive exact
    * distance runs on a constant-size frame regardless of corpus size —
    * the quantization error of ADC decides the SHORTLIST, never the
    * final ranking.
    *
    * Output: (q_id, id, cosine, adc_dist, rank) — top `topK` by exact
    * cosine (desc, id tiebreak), carrying the ADC distance that
    * shortlisted each row for auditability.
    */
  def ivfAdcRerank(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, queryId: String, queryVec: String,
      nlist: Int, nprobe: Int, m: Int = 8, kAnchors: Int = 4,
      shortlist: Int = 10, topK: Int = 3,
      excludeSameId: Boolean = true, salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(shortlist >= topK,
      s"shortlist $shortlist must cover topK $topK")
    val short = ivfAdcSearch(embeddings, idCol, vecCol, queries, queryId,
      queryVec, nlist, nprobe, m, kAnchors, shortlist, excludeSameId, salt)
      .select(col("q_id"), col(idCol), col("adc_dist"))
    val q = queries.select(col(queryId).as("q_id"),
      col(queryVec).cast("array<double>").as("__qe"))
    val corpus = embeddings.select(col(idCol),
      col(vecCol).cast("array<double>").as("__e"))
    val wk = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col(idCol).asc)
    short
      .join(broadcast(q), Seq("q_id"))
      .join(corpus, Seq(idCol))
      .withColumn("cosine", round(cosineNative(col("__e"), col("__qe")), 6))
      .select(col("q_id"), col(idCol), col("cosine"), col("adc_dist"))
      .withColumn("rank", row_number().over(wk).cast("long"))
      .filter(col("rank") <= topK)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Portable kNN classification over the IVF index — the label-propagation
    * use of similarity search (weak supervision, label densification,
    * eval-set auditing): hash-split holdout queries are classified by the
    * majority label of their `k` nearest train neighbors, retrieved
    * through [[ivfCentroidsPortable]]/[[ivfAssign]]/[[ivfSearchBatch]], so
    * the ENTIRE pipeline — split, index build, probe pruning, top-k,
    * vote, confusion matrix — replays in plain SQL.
    *
    * Vote ties break by (more votes, then smallest label). Scale shape is
    * q182's: broadcast centroids and probes, the corpus is never shuffled
    * for the search; the neighbor-label join keys on the tiny
    * |test|·k frame (AQE broadcasts it), and the confusion matrix is a
    * |labels|² aggregate.
    */
  /** ANN quality evaluation card — recall@k of the portable IVF index
    * against the exact brute-force ground truth, per query: the
    * acceptance test every ANN deployment runs before trusting its
    * retrieval (recall trades off against the nprobe/nlist scan
    * fraction, and this measures the actual price). Both sides are
    * rounded-cosine deterministic, so the card replays in SQL.
    *
    * Scale shape: the exact side broadcasts the query batch and scans
    * the corpus once ([[knnJoin]]); the IVF side is q182's probe-pruned
    * search; the comparison joins two |queries|·k frames.
    */
  def annRecallCard(embeddings: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, nlist: Int = 8, nprobe: Int = 3,
      k: Int = 5): DataFrame = {
    val exact = knnJoin(embeddings, queries, idCol, vecCol, idCol, vecCol,
        k, excludeSameId = true)
      .select(col("q_id"), col("n_id"))
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist)
    val assigned = ivfAssign(embeddings, idCol, vecCol, cents,
      simRound = Some(6))
    val approx = ivfSearchBatch(assigned, idCol, queries, idCol, vecCol,
        cents, nprobe, k, excludeSameId = true, simRound = Some(6))
      .select(col("q_id"), col(idCol).as("n_id"),
        lit(1L).as("__found"))
    exact.join(approx, Seq("q_id", "n_id"), "left")
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_exact"),
        sum(coalesce(col("__found"), lit(0L))).as("n_found"))
      .withColumn("recall",
        round(col("n_found").cast("double") /
          col("n_exact").cast("double"), 6))
      .orderBy(col("q_id"))
  }

  /** Greedy k-CENTER coreset selection (farthest-point traversal — the
    * Sener & Savarese active-learning / data-pruning core): starting from
    * the portable-draw seed, repeatedly select the point FARTHEST (max
    * min-cosine-distance) from the chosen set, tie toward the smallest
    * id, and report each selection with its coverage radius (the max-min
    * distance at that step — the 2-approximation certificate of k-center).
    * The radius sequence is the "how much diversity does one more sample
    * buy" curve a pruning pass reads.
    *
    * Scale shape: the chosen set is the MODEL (k vectors at the driver —
    * the MLlib centroid contract); each step is ONE linear scan updating
    * the per-point min-distance (no pair join, no sort — argmax via
    * max-struct aggregation), so the full selection is k scans.
    * Distances are rounded cosines (engine-portable), so selection
    * replays in SQL exactly.
    */
  def kCenterCoreset(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 2, s"need k >= 2, got $k")
    val spark = embeddings.sparkSession
    import spark.implicits._
    // NOT fanned out (ParOps.fanOut): A/B at sf0.1 measured the k tiny
    // per-round scans paying more in 32-way task overhead than the wide
    // cosine work saves (fanned 2.42 s vs 1.64 s plain, median-of-5)
    val e = embeddings.select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__emb")).persist()
    try {
      // seed: rank-1 of the two-round congruential draw (q182's family)
      val p1 = 1000003L; val p2 = 9999991L
      val id = col("__id")
      val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
      val x1 = pmod(pmod(id, lit(p1)) * lit(2654435761L), lit(p1))
      val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
      val seedRow = e.withColumn("__d", x2)
        .orderBy(col("__d"), col("__id")).limit(1)
        .select(col("__id"), col("__emb")).head()
      def distTo(center: Seq[Double]): org.apache.spark.sql.Column =
        lit(1.0) - round(cosineNative(col("__emb"),
          array(center.map(lit): _*)), 6)
      var centers = Vector((seedRow.getLong(0),
        seedRow.getSeq[Double](1), Option.empty[Double]))
      var state = e.withColumn("__mind", distTo(centers.head._2))
      for (_ <- 2 to k) {
        // argmax(mind, tie smallest id) as ONE max-struct aggregate —
        // no sort, no limit stage
        val top = state
          .agg(max(struct(col("__mind").as("m"), (-col("__id")).as("negid")))
            .as("__t"))
          .select(col("__t.m"), (-col("__t.negid")).as("__id"))
          .head()
        val radius = top.getDouble(0)
        val cid = top.getLong(1)
        val cEmb = e.filter(col("__id") === cid).head().getSeq[Double](1)
        centers = centers :+ ((cid, cEmb: Seq[Double], Some(radius)))
        state = state.withColumn("__mind",
          least(col("__mind"), distTo(cEmb)))
      }
      centers.zipWithIndex.map { case ((cid, _, rad), i) =>
        (i + 1, cid, rad)
      }.toDF("step", "center_id", "radius")
        .select(col("step"), col("center_id"), round(col("radius"), 6)
          .as("radius"))
        .orderBy(col("step"))
    } finally { e.unpersist(); () }
  }

  /** Maximal-marginal-relevance selection (Carbonell & Goldstein 1998) —
    * the relevance-AND-diversity picker of a data-curation pass, next to
    * [[kCenterCoreset]]'s pure-diversity traversal: greedily take the
    * item maximizing λ·rel − (1−λ)·max-sim-to-chosen, where rel is the
    * rounded cosine to the deterministic anchor (the smallest-id vector
    * — a fixed "query" both engines agree on) and max-sim updates
    * against each pick. Ties break toward the smallest id.
    *
    * Scale shape: identical to the k-center loop — the chosen set lives
    * at the driver, each of the k steps is ONE linear scan (argmax via
    * max-struct aggregation, no sort) plus a constant-size broadcast
    * update. Rounded-6 cosines make every selection engine-portable; the
    * oracle replays the greedy loop as an unrolled CTE chain.
    */
  def mmrSelect(embeddings: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, lambda: BigDecimal = BigDecimal("0.7")): DataFrame = {
    require(k >= 1 && lambda > 0 && lambda < 1,
      s"need k >= 1 and lambda in (0,1), got k=$k lambda=$lambda")
    val spark = embeddings.sparkSession
    import spark.implicits._
    val (lam, clam) = (lambda.toDouble, (BigDecimal(1) - lambda).toDouble)
    val e0 = embeddings.select(col(idCol).cast("long").as("__id"),
      col(vecCol).cast("array<double>").as("__emb"))
    val anchor = e0.orderBy(col("__id")).limit(1).head().getSeq[Double](1)
    val e = e0.withColumn("__rel",
        round(cosineNative(col("__emb"), array(anchor.map(lit): _*)), 6))
      .persist()
    try {
      def r6(v: Double): Double =
        new java.math.BigDecimal(v)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      var state = e.withColumn("__ms", lit(0.0))
      val picks = (1 to k).map { rank =>
        val mmr = round(lit(lam) * col("__rel") - lit(clam) * col("__ms"), 6)
        val top = state
          .agg(max(struct(mmr.as("m"), (-col("__id")).as("negid"),
            col("__rel").as("rel"), col("__ms").as("ms"))).as("__t"))
          .select((-col("__t.negid")).as("id"), col("__t.rel"),
            col("__t.ms"), col("__t.m"))
          .head()
        val (cid, rel, ms) = (top.getLong(0), top.getDouble(1),
          top.getDouble(2))
        val cEmb = e.filter(col("__id") === cid).head().getSeq[Double](1)
        state = state.filter(col("__id") =!= cid)
          .withColumn("__ms", greatest(col("__ms"),
            round(cosineNative(col("__emb"), array(cEmb.map(lit): _*)), 6)))
        (rank, cid, rel, r6(ms), r6(lam * rel - clam * ms))
      }
      picks.toDF("pick_rank", "vec_id", "relevance", "max_sim", "mmr_score")
        .orderBy(col("pick_rank"))
    } finally { e.unpersist(); () }
  }

  /** Portable semi-supervised LABEL PROPAGATION (Zhu & Ghahramani 2002)
    * over the IVF neighbor graph — the multi-hop upgrade of
    * [[knnClassifyPortable]]'s single-hop vote, and the label-densification
    * pass of a weak-supervision pipeline: train nodes hold their one-hot
    * mass (clamped every round), every node repeatedly absorbs its
    * out-neighbors' label masses weighted by the non-negative rounded
    * cosine, normalized per node, `rounds` times; holdout nodes are then
    * classified by their final argmax mass. Everything — graph build
    * (q182's broadcast-centroid probe pruning), per-round mass sums
    * (exact decimal), round-9 normalization, argmax tie-break — replays
    * in SQL.
    *
    * Scale shape: the edge frame is |V|·k rows built without shuffling
    * the corpus; each round is ONE equi-join of masses onto edges plus
    * two bounded aggregations. Masses are ≤ |V|·|labels| rows.
    */
  def labelPropagationPortable(embeddings: DataFrame, idCol: String,
      vecCol: String, labelCol: String, nlist: Int = 0, nprobe: Int = 3,
      kNbrs: Int = 5, rounds: Int = 3, trainBuckets: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.Stats.dsum
    require(rounds >= 1, s"need at least one round, got $rounds")
    val b = SplitOps.hashBucket(col(idCol), 10)
    val all = embeddings.withColumn("__train", b < trainBuckets)
    // nlist = 0 → adaptive max(8, ⌈√(n·nprobe)⌉): an ALL-NODES kNN graph
    // joins every node against its nprobe lists, so a FIXED nlist makes
    // the candidate count n·nprobe·(n/nlist) — quadratic (the sf1 bench
    // measured 14× at 10× data). The √ formula BALANCES assignment cost
    // n·nlist against search cost n·nprobe·(n/nlist) — both sides land at
    // n^1.5·√nprobe, the optimum for a one-level quantizer (the round-12
    // ⌈n/640⌉ rule pinned list size but let assignment grow n·n/640 —
    // quadratic from the other side). The oracle SQL computes the SAME
    // formula from COUNT(*), so both engines stay in lockstep at the
    // local/gate SFs where the FLAT assignment path runs. Above
    // [[flatAssignMaxCentroids]] centroids, [[ivfAssignAuto]] switches to
    // the approximate two-level coarse→fine assignment (n·√nlist) and the
    // probe-side broadcast is dropped — the 100 TB path, where engine and
    // oracle diverge by design; that path is gated by the forced-two-level
    // q422 card plus SimilarityOpsSpec's coarseProbe ≡ flat unit test.
    val effNlist = if (nlist > 0) nlist
      else math.max(8, math.ceil(math.sqrt(all.count() * nprobe.toDouble)).toInt)
    val cents = ivfCentroidsPortable(all, idCol, vecCol, effNlist)
    val assigned = ivfAssignAuto(all, idCol, vecCol, cents, effNlist,
      simRound = Some(6))
    val edges = ivfSearchBatch(assigned, idCol, all, idCol, vecCol, cents,
        nprobe, kNbrs, excludeSameId = true, simRound = Some(6),
        broadcastProbes = effNlist <= flatAssignMaxCentroids)
      .select(col("q_id"), col(idCol).as("__nbr"),
        greatest(col("cosine"), lit(0.0)).as("__w"))
      .persist()
    val seed = all.filter(col("__train"))
      .select(col(idCol).as("__id"), col(labelCol).as("__lbl"),
        lit(1.0).as("__m"))
    try {
      edges.count()
      var mass = seed
      for (_ <- 1 to rounds) {
        val raw = edges
          .join(mass, edges("__nbr") === mass("__id"))
          .groupBy(col("q_id"), col("__lbl"))
          .agg(dsum(col("__w") * col("__m"), 12).as("__raw"))
        // per-node total in exact decimal so normalization is
        // accumulation-order-free; zero-mass nodes simply emit no rows
        val tot = Window.partitionBy(col("q_id"))
        val next = raw
          .withColumn("__tot",
            sum(col("__raw").cast("decimal(28,12)")).over(tot)
              .cast("double"))
          .filter(col("__tot") > 0.0)
          .select(col("q_id").as("__id"), col("__lbl"),
            round(col("__raw") / col("__tot"), 9).as("__m"))
        // clamp: train nodes snap back to their one-hot mass.
        // localCheckpoint flattens the per-round lineage — without it the
        // round-3 plan nests three join+window rounds and Catalyst
        // re-plans the whole tower (the GraphOps.connectedComponents
        // convention)
        val trainIds = seed.select(col("__id"))
        mass = next.join(trainIds, Seq("__id"), "left_anti")
          .unionByName(seed)
          .localCheckpoint()
      }
      val wv = Window.partitionBy(col("__id"))
        .orderBy(col("__m").desc, col("__lbl").asc)
      val predicted = mass
        .join(seed.select(col("__id")), Seq("__id"), "left_anti")
        .withColumn("__rn", row_number().over(wv))
        .filter(col("__rn") === 1)
        .select(col("__id"), col("__lbl").as("predicted"))
      all.filter(!col("__train"))
        .select(col(idCol).as("__id"), col(labelCol).as("actual"))
        .join(predicted, Seq("__id"), "left")
        .groupBy(col("actual"), col("predicted"))
        .agg(count(lit(1)).as("n_rows"))
        .orderBy(col("actual"), col("predicted"))
    } finally { edges.unpersist(); () }
  }

  def knnClassifyPortable(embeddings: DataFrame, idCol: String,
      vecCol: String, labelCol: String, nlist: Int = 0, nprobe: Int = 3,
      k: Int = 5, trainBuckets: Int = 7): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = SplitOps.hashBucket(col(idCol), 10)
    val train = embeddings.filter(b < trainBuckets)
    val test = embeddings.filter(b >= trainBuckets)
    // nlist = 0 → adaptive max(8, ⌈√(n_train·nprobe)⌉): the query side is
    // a constant FRACTION of the corpus here, so a fixed nlist is
    // quadratic and the round-12 ⌈n/640⌉ rule made ASSIGNMENT quadratic
    // instead — the √ formula balances both at n^1.5·√nprobe (see
    // labelPropagationPortable). Mirrored in the q205 oracle SQL.
    val effNlist = if (nlist > 0) nlist
      else math.max(8,
        math.ceil(math.sqrt(train.count() * nprobe.toDouble)).toInt)
    val cents = ivfCentroidsPortable(train, idCol, vecCol, effNlist)
    val assigned = ivfAssignAuto(train, idCol, vecCol, cents, effNlist,
      simRound = Some(6))
    val nn = ivfSearchBatch(assigned, idCol, test, idCol, vecCol, cents,
      nprobe, k, excludeSameId = false, simRound = Some(6),
      broadcastProbes = effNlist <= flatAssignMaxCentroids)
    val nbrLabels = embeddings
      .select(col(idCol).as("__nid"), col(labelCol).as("__nlabel"))
    val votes = nn.join(nbrLabels, nn(idCol) === col("__nid"))
      .groupBy(col("q_id"), col("__nlabel"))
      .agg(count(lit(1)).as("__votes"))
    val wv = Window.partitionBy(col("q_id"))
      .orderBy(col("__votes").desc, col("__nlabel").asc)
    val predicted = votes.withColumn("__rn", row_number().over(wv))
      .filter(col("__rn") === 1)
      .select(col("q_id"), col("__nlabel").as("predicted"))
    val actual = test.select(col(idCol).as("q_id"),
      col(labelCol).as("actual"))
    actual.join(predicted, Seq("q_id"), "left")
      .groupBy(col("actual"), col("predicted"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("actual"), col("predicted"))
  }

  /** Matryoshka truncation-recall card (Kusupati et al. 2022 MRL — the
    * "how many dimensions does retrieval actually need" read): for each
    * prefix length in `dims`, exact top-k by cosine over the TRUNCATED
    * embeddings is compared against full-dimension exact top-k, and the
    * card reports micro recall@k per prefix. The decision input for
    * shrinking a 100 TB vector corpus: if recall@5 holds at d=16 of 64,
    * the index shrinks 4× before any quantization (q143/q228's PQ
    * composes on top).
    *
    * Scale shape: one [[knnJoin]] per dim over the SAME broadcast query
    * set (queries stay tiny by contract); truncation is a zero-copy
    * `slice` projection — no re-embedding, no extra shuffle; each card
    * row is a global aggregate of |q|·k join hits.
    */
  def matryoshkaRecallCard(embeddings: DataFrame, idCol: String,
      vecCol: String, queries: DataFrame, dims: Seq[Int],
      k: Int = 5): DataFrame = {
    require(dims.nonEmpty && dims.forall(_ >= 1), "need positive dims")
    val exact = knnJoin(embeddings, queries, idCol, vecCol, idCol, vecCol,
        k, excludeSameId = true)
      .select(col("q_id"), col("n_id"))
    val cards = dims.map { d =>
      def trunc(df: DataFrame): DataFrame =
        df.withColumn("__t", slice(col(vecCol), 1, d))
      val approx = knnJoin(trunc(embeddings), trunc(queries),
          idCol, "__t", idCol, "__t", k, excludeSameId = true)
        .select(col("q_id"), col("n_id"), lit(1L).as("__found"))
      exact.join(approx, Seq("q_id", "n_id"), "left")
        .agg(countDistinct(col("q_id")).as("n_queries"),
          count(lit(1)).as("n_exact"),
          sum(coalesce(col("__found"), lit(0L))).as("n_found"))
        .select(lit(d.toLong).as("dim"), col("n_queries"), col("n_exact"),
          col("n_found"),
          round(col("n_found").cast("double") /
            col("n_exact").cast("double"), 6).as("recall"))
    }
    cards.reduce(_.unionByName(_)).orderBy(col("dim"))
  }

  /** Embedding distribution drift card — the vector-space sibling of
    * the tabular PSI drift family (q113/q131): two corpus slices'
    * per-dimension mean vectors compared as (a) cosine of the means,
    * (b) L2 shift of the means, and (c) the single most-shifted
    * dimension — the cheap early-warning read that an embedding model
    * or upstream content mix changed between two ingests. (Means are a
    * first-moment summary — the MMD-style witness for mean shift; the
    * per-dim view localizes WHICH directions moved.)
    *
    * Scale shape: ONE pass over the exploded (dim, value) stream with
    * per-dim exact DECIMAL sums for both slices (2·d accumulators);
    * everything after runs on the d-row frame. Final reductions over
    * dims accumulate in DECIMAL too — dimension order can never change
    * the card.
    */
  def embeddingDriftCard(embeddings: DataFrame, idCol: String,
      vecCol: String, sliceB: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dims = embeddings
      .select(sliceB.as("__b"), posexplode(col(vecCol)).as(Seq("d", "v")))
      .withColumn("v", col("v").cast("double"))
      .groupBy(col("d"))
      .agg(
        sum(when(!col("__b"), col("v")).cast("decimal(28,12)"))
          .cast("double").as("__sa"),
        count(when(!col("__b"), lit(1))).as("n_a"),
        sum(when(col("__b"), col("v")).cast("decimal(28,12)"))
          .cast("double").as("__sb"),
        count(when(col("__b"), lit(1))).as("n_b"))
      .withColumn("ma", col("__sa") / col("n_a").cast("double"))
      .withColumn("mb", col("__sb") / col("n_b").cast("double"))
      .withColumn("shift", abs(col("ma") - col("mb")))
    val agg = dims.agg(
      max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
      sum((col("ma") * col("mb")).cast("decimal(28,18)"))
        .cast("double").as("__dot"),
      sum((col("ma") * col("ma")).cast("decimal(28,18)"))
        .cast("double").as("__qa"),
      sum((col("mb") * col("mb")).cast("decimal(28,18)"))
        .cast("double").as("__qb"),
      sum(((col("ma") - col("mb")) * (col("ma") - col("mb")))
        .cast("decimal(28,18)")).cast("double").as("__sq"))
    // explicit NULLS LAST on both engines: a dim whose values land
    // entirely in one slice has NULL shift and must never win top_dim
    val w = Window.partitionBy(lit(1))
      .orderBy(col("shift").desc_nulls_last, col("d").asc)
    val top = dims.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("d").cast("long").as("top_dim"),
        round(col("shift"), 6).as("top_shift"))
    agg.crossJoin(broadcast(top))
      .select(col("n_a"), col("n_b"),
        when(col("__qa") > 0.0 && col("__qb") > 0.0,
          round(col("__dot") / (sqrt(col("__qa")) * sqrt(col("__qb"))),
            6)).as("cosine_means"),
        round(sqrt(col("__sq")), 6).as("l2_shift"),
        col("top_dim"), col("top_shift"))
  }

  /** Cluster-occupancy drift between two corpus slices (MAUVE-style,
    * first-order): both slices quantized against the SAME portable-IVF
    * coarse clusters, then their cluster-occupancy histograms compared
    * per cluster with Laplace smoothing and a Jensen–Shannon
    * contribution — the distribution-SHAPE drift read that complements
    * [[embeddingDriftCard]]'s mean-shift view (two corpora can share a
    * mean while occupying disjoint modes). Output: one row per cluster
    * (counts, smoothed probabilities, JS contribution) plus a TOTAL row
    * (centroid_id −1) whose js value accumulates the rounded per-cluster
    * contributions through decimals — addition-order-free.
    *
    * Scale shape: centroids are the bounded broadcast model fit on the
    * FULL corpus (shared vocabulary — drift is measured in one cluster
    * space); occupancy is ONE count aggregation over the assignment
    * scan; everything after runs on the nlist-row frame.
    */
  def clusterOccupancyDrift(embeddings: DataFrame, idCol: String,
      vecCol: String, sliceB: Column, nlist: Int = 8): DataFrame = {
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist)
    val assigned = ivfAssign(embeddings, idCol, vecCol, cents,
      simRound = Some(6))
    val occ = assigned
      .join(embeddings.select(col(idCol), sliceB.as("__b")), idCol)
      .groupBy(col("centroid_id"))
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("n_a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("n_b"))
    occupancyDriftFinish(cents, occ, nlist)
  }

  /** Finishing for [[clusterOccupancyDrift]] from raw per-cluster
    * occupancy counts — factored out so a streaming accumulation of the
    * SAME (additive) counts lands on the identical card (the shared-
    * oracle convention: counts are the state, this is the projection).
    */
  def occupancyDriftFinish(cents: DataFrame, occ: DataFrame,
      nlist: Int): DataFrame = {
    val full = cents.select(col("centroid_id"))
      .join(occ, Seq("centroid_id"), "left")
      .withColumn("n_a", coalesce(col("n_a"), lit(0L)))
      .withColumn("n_b", coalesce(col("n_b"), lit(0L)))
    val tot = full.agg(sum(col("n_a")).as("__na"),
      sum(col("n_b")).as("__nb"))
    val sm = full.crossJoin(broadcast(tot))
      .withColumn("p_a", (col("n_a") + 1L).cast("double") /
        (col("__na") + lit(nlist.toLong)).cast("double"))
      .withColumn("p_b", (col("n_b") + 1L).cast("double") /
        (col("__nb") + lit(nlist.toLong)).cast("double"))
      .withColumn("__m", (col("p_a") + col("p_b")) / lit(2.0))
      .withColumn("js_contrib", round(lit(0.5) *
        (col("p_a") * log(col("p_a") / col("__m")) +
         col("p_b") * log(col("p_b") / col("__m"))), 6))
    val perCluster = sm.select(col("centroid_id").cast("long"),
      col("n_a"), col("n_b"), round(col("p_a"), 6).as("p_a"),
      round(col("p_b"), 6).as("p_b"), col("js_contrib"))
    val total = sm
      .agg(max(col("__na")).as("n_a"), max(col("__nb")).as("n_b"),
        sum(col("js_contrib").cast("decimal(28,6)")).cast("double")
          .as("js_contrib"))
      .select(lit(-1L).as("centroid_id"), col("n_a"), col("n_b"),
        lit(null).cast("double").as("p_a"),
        lit(null).cast("double").as("p_b"), col("js_contrib"))
    perCluster.unionByName(total).orderBy(col("centroid_id"))
  }

  /** Cluster-cohesion card (silhouette-lite, cosine form): per portable
    * IVF cluster, the mean cosine to the OWN centroid vs the mean cosine
    * to the runner-up centroid — the margin that says whether the coarse
    * quantizer actually separates the corpus (margin ≈ 0 → probes spill,
    * ANN recall degrades; the tuning read behind [[annRecallCard]]'s
    * symptom). Classic silhouette needs all pairwise distances (O(n²));
    * against centroids it is ONE broadcast scan — the same cost as
    * assignment itself.
    *
    * Scale shape: one corpus × broadcast-centroids scan, per-vector
    * top-2 window (partitioned by vector), one aggregation on cluster
    * id. Cosines are rounded before ranking and summed through
    * DECIMAL(28,6) — engine-portable and addition-order-free.
    */
  def clusterCohesionCard(embeddings: DataFrame, idCol: String,
      vecCol: String, nlist: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist)
    val scored = embeddings
      .select(col(idCol), col(vecCol).cast("array<double>").as("emb"))
      .crossJoin(broadcast(cents))
      .withColumn("sim", round(cosineNative(col("emb"), col("centroid")), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("sim").desc, col("centroid_id"))
    val top2 = scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .groupBy(col(idCol))
      .agg(max(when(col("rn") === 1, col("centroid_id"))).as("own_cid"),
        max(when(col("rn") === 1, col("sim"))).as("own_sim"),
        max(when(col("rn") === 2, col("sim"))).as("next_sim"))
    top2.groupBy(col("own_cid").cast("long").as("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("own_sim").cast("decimal(28,6)")).as("__so"),
        sum(col("next_sim").cast("decimal(28,6)")).as("__sn"))
      .withColumn("mean_own_cos", round(
        col("__so").cast("double") / col("n_vecs").cast("double"), 6))
      .withColumn("mean_next_cos", round(
        col("__sn").cast("double") / col("n_vecs").cast("double"), 6))
      .withColumn("margin",
        round(col("mean_own_cos") - col("mean_next_cos"), 6))
      .select(col("centroid_id"), col("n_vecs"), col("mean_own_cos"),
        col("mean_next_cos"), col("margin"))
      .orderBy(col("centroid_id"))
  }

  /** Davies–Bouldin index (1979) of the portable-IVF clustering — the
    * INTERNAL validity score completing the clustering-eval set
    * (cohesion q252 is per-cluster margins, NMI q256 needs labels):
    * DB = mean_i max_{j≠i} (S_i + S_j)/M_ij, where S is mean
    * point-to-centroid Euclidean distance and M the centroid
    * separation — low = tight, well-separated clusters, and the
    * per-cluster component says WHICH cluster drags the score.
    *
    * Exactness: distances via the fused dot product in the fixed shape
    * √(x·x − 2x·c + c·c) (both engines replay identical doubles),
    * scatters and the final mean through round-12 decimal sums; empty
    * clusters (no assigned vectors) are excluded in both engines.
    *
    * Scale shape: one assignment scan (broadcast centroids), one
    * per-cluster reduction, then everything lives on nlist-sized
    * frames (the nlist² pair frame is trivial).
    */
  def daviesBouldinCard(embeddings: DataFrame, idCol: String,
      vecCol: String, nlist: Int = 8): DataFrame = {
    def d12(c: Column): Column =
      sum(round(c, 12).cast("decimal(38,12)")).cast("double")
    def dist(a: Column, b: Column): Column =
      sqrt(greatest(lit(0.0),
        dotNative(a, a) - lit(2.0) * dotNative(a, b) + dotNative(b, b)))
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist)
    val withC = ivfAssign(embeddings, idCol, vecCol, cents,
        simRound = Some(6))
      .join(broadcast(cents), "centroid_id")
    val scatter = withC
      .groupBy(col("centroid_id"))
      .agg(count(lit(1)).as("n_vecs"),
        d12(dist(col("emb"), col("centroid"))).as("__sd"))
      .withColumn("scatter", col("__sd") / col("n_vecs").cast("double"))
    val pair = cents.select(col("centroid_id").as("ci"),
        col("centroid").as("va"))
      .join(cents.select(col("centroid_id").as("cj"),
        col("centroid").as("vb")), col("ci") =!= col("cj"))
      .select(col("ci"), col("cj"), dist(col("va"), col("vb")).as("m"))
    val ri = pair
      .join(broadcast(scatter.select(col("centroid_id").as("ci"),
        col("scatter").as("si"), col("n_vecs"))), "ci")
      .join(broadcast(scatter.select(col("centroid_id").as("cj"),
        col("scatter").as("sj"))), "cj")
      .filter(col("m") > 0.0)
      .groupBy(col("ci"), col("n_vecs"), col("si"))
      .agg(max((col("si") + col("sj")) / col("m")).as("r_max"),
        min(col("m")).as("min_sep"))
    val db = ri.agg(d12(col("r_max")).as("__sr"), count(lit(1)).as("__k"))
      .select((col("__sr") / col("__k").cast("double")).as("__db"),
        col("__k"))
    ri.crossJoin(broadcast(db))
      .select(col("ci").cast("long").as("centroid_id"), col("n_vecs"),
        round(col("si"), 6).as("scatter"),
        round(col("min_sep"), 6).as("min_separation"),
        round(col("r_max"), 6).as("db_component"),
        col("__k").as("k_clusters"),
        round(col("__db"), 6).as("db_index"))
      .orderBy(col("centroid_id"))
  }

  /** Cluster-vs-label agreement card: the portable-IVF clustering
    * scored against a ground-truth label column with purity and NMI —
    * the external-validity eval that says whether unsupervised corpus
    * clusters track the taxonomy a curator cares about (high NMI →
    * cluster-balanced sampling ≈ label-stratified sampling; low →
    * clusters encode something else entirely).
    *
    *   purity = Σ_c max_l n(c,l) / N
    *   NMI    = I(C;L) / √(H(C)·H(L))
    *
    * Scale shape: one assignment scan into a (nlist × |labels|)-bounded
    * contingency aggregation; every entropy/MI term is computed on that
    * tiny frame and accumulated through DECIMAL(28,18) — addition-order
    * free, engine-portable (the q247 reduction convention).
    */
  def clusterLabelCard(embeddings: DataFrame, idCol: String,
      vecCol: String, labelCol: String, nlist: Int = 8): DataFrame = {
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist)
    val assigned = ivfAssign(embeddings, idCol, vecCol, cents,
      simRound = Some(6))
    val cont = assigned
      .join(embeddings.select(col(idCol),
        col(labelCol).cast("long").as("__l")), idCol)
      .groupBy(col("centroid_id"), col("__l"))
      .agg(count(lit(1)).as("n"))
    val tot = cont.agg(sum(col("n")).as("__N"))
    val byC = cont.groupBy(col("centroid_id"))
      .agg(sum(col("n")).as("nc"), max(col("n")).as("maxl"))
    val byL = cont.groupBy(col("__l")).agg(sum(col("n")).as("nl"))
    def entropy(df: DataFrame, cnt: String, out: String): DataFrame = {
      val p = col(cnt).cast("double") / col("__N").cast("double")
      df.crossJoin(broadcast(tot))
        .agg(sum((-p * log(p)).cast("decimal(28,18)")).cast("double")
          .as(out))
    }
    val hC = entropy(byC, "nc", "h_cluster")
    val hL = entropy(byL, "nl", "h_label")
    val mi = cont
      .join(byC.select(col("centroid_id"), col("nc")), "centroid_id")
      .join(byL, "__l")
      .crossJoin(broadcast(tot))
      .agg(sum(((col("n").cast("double") / col("__N").cast("double")) *
        log(col("n").cast("double") * col("__N").cast("double") /
          (col("nc").cast("double") * col("nl").cast("double"))))
        .cast("decimal(28,18)")).cast("double").as("mi"))
    val purity = byC.crossJoin(broadcast(tot))
      .agg(max(col("__N")).as("n_vecs"),
        count(lit(1)).as("n_clusters"),
        sum(col("maxl")).as("__pure"))
      .withColumn("purity", round(
        col("__pure").cast("double") / col("n_vecs").cast("double"), 6))
    purity
      .crossJoin(broadcast(byL.agg(count(lit(1)).as("n_labels"))))
      .crossJoin(broadcast(hC)).crossJoin(broadcast(hL))
      .crossJoin(broadcast(mi))
      .withColumn("nmi",
        when(col("h_cluster") > 0.0 && col("h_label") > 0.0,
          round(col("mi") / sqrt(col("h_cluster") * col("h_label")), 6)))
      .select(col("n_vecs"), col("n_clusters"), col("n_labels"),
        col("purity"), round(col("h_cluster"), 6).as("h_cluster"),
        round(col("h_label"), 6).as("h_label"),
        round(col("mi"), 6).as("mi"), col("nmi"))
  }

  /** Cluster-balanced diversity sample: assign every vector to its
    * portable-IVF cluster (q182 machinery), then take an EQUAL quota of
    * `perList` per cluster by engine-portable priority draw — the
    * semantic-diversity selection a curation pass runs so dominant
    * content modes don't drown the tail (the cluster-then-sample shape
    * of SemDeDup-era pipelines; proportional allocation is q209's job,
    * EQUAL allocation is the diversity variant). Output: one row per
    * selected vector (cluster, rank, id, cluster size).
    *
    * Scale shape: centroids are the bounded model (nlist rows,
    * broadcast); assignment is one scan; the per-cluster quota is a
    * bounded-k window selection shuffled on cluster id (k·nlist output
    * rows). Draws are the two-round congruential generator keyed on the
    * vector id — partitioning-invariant and replayable in SQL.
    */
  def clusterBalancedSample(embeddings: DataFrame, idCol: String,
      vecCol: String, nlist: Int = 8, perList: Int = 8,
      salt: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nlist >= 1 && perList >= 1, "need nlist >= 1 and perList >= 1")
    val cents = ivfCentroidsPortable(embeddings, idCol, vecCol, nlist)
    val assigned = ivfAssign(embeddings, idCol, vecCol, cents,
      simRound = Some(6))
    val p1 = 1000003L
    val p2 = 9999991L
    val id = col(idCol).cast("long")
    val idDiv = (id.cast("decimal(38,0)") / lit(p1)).cast("long")
    val x1 = pmod(pmod(id + lit(salt), lit(p1)) * lit(2654435761L),
      lit(p1))
    val x2 = pmod(pmod(x1 + idDiv, lit(p2)) * lit(22695477L), lit(p2))
    val w = Window.partitionBy(col("centroid_id"))
      .orderBy(col("__d"), col(idCol))
    val sizes = Window.partitionBy(col("centroid_id"))
    assigned.select(col("centroid_id"), col(idCol), x2.as("__d"))
      .withColumn("n_list", count(lit(1)).over(sizes))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= perList)
      .select(col("centroid_id").cast("long").as("centroid_id"),
        col("rank"), col(idCol), col("n_list"))
      .orderBy(col("centroid_id"), col("rank"))
  }

  /** Diagonal-Mahalanobis embedding outlier card: per-dimension means
    * and variances from ONE exact-decimal pass ([[embeddingDriftCard]]'s
    * accumulator shape), then each vector's standardized squared
    * distance D² = Σ_d (v_d − μ_d)²/σ²_d and the top-k — the cheap
    * whole-corpus anomaly screen before any clustering (a D² far above
    * the dimension count says broken embedding, wrong modality, or
    * truncation). Diagonal covariance by design: the full d×d matrix
    * is the PCA card's job (q191); the diagonal is one broadcast frame
    * at any d.
    *
    * Exactness: per-dim stats round to 9 (the NB parameter convention)
    * before broadcast; per-vector scores accumulate per-dim terms in
    * exact decimal (dimension order can never move a score); top-k ties
    * break on id.
    *
    * Scale shape: one exploded (dim, value) aggregation (d-row frame
    * broadcast back), one per-vector decimal sum keyed on the vector id
    * (map-side combinable), TakeOrdered top-k — never a global sort.
    */
  def embeddingOutlierCard(embeddings: DataFrame, idCol: String,
      vecCol: String, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val dims = embeddings
      .select(col(idCol), posexplode(col(vecCol)).as(Seq("d", "v")))
      .withColumn("v", col("v").cast("double"))
    val stats = dims.groupBy(col("d"))
      .agg(count(lit(1)).as("__n"),
        sum(col("v").cast("decimal(28,12)")).cast("double").as("__s"),
        sum((col("v") * col("v")).cast("decimal(38,16)"))
          .cast("double").as("__q"))
      .filter(col("__n") > 1)
      .select(col("d"),
        round(col("__s") / col("__n").cast("double"), 9).as("mu"),
        round(greatest(
          (col("__q") - col("__s") * col("__s") /
            col("__n").cast("double")) /
            (col("__n").cast("double") - lit(1.0)),
          lit(1e-9)), 9).as("vr"))
    val scored = dims.join(broadcast(stats), "d")
      .withColumn("__t",
        (((col("v") - col("mu")) * (col("v") - col("mu"))) / col("vr"))
          .cast("decimal(38,12)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_dims"),
        sum(col("__t")).cast("double").as("__d2"))
    // TakeOrdered top-k first; the rank window runs on the k-row result
    scored
      .orderBy(col("__d2").desc, col(idCol))
      .limit(k)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("__d2").desc, col(idCol))).cast("long"))
      .select(col("rank"), col(idCol), col("n_dims"),
        round(col("__d2"), 6).as("mahalanobis2"),
        round(col("__d2") / col("n_dims").cast("double"), 6)
          .as("score_per_dim"))
      .orderBy(col("rank"))
  }

  /** Linear-time MMD² (Gretton et al. 2012, §6 "MMD_l") between two
    * embedding cohorts under an RBF kernel: deterministic id-ordered
    * pairing inside each cohort, one h-statistic per quadruple
    * h = k(x₁,x₂) + k(y₁,y₂) − k(x₁,y₂) − k(x₂,y₁), MMD²_l = mean h —
    * O(n) where the full U-statistic is O(n²), THE scalable kernel
    * two-sample test for embedding drift (q247 compares centroids;
    * this sees any distribution change a characteristic kernel sees).
    *
    * Exactness: squared distances assemble from three [[dotNative]]
    * passes (float→double exact, the proven list_inner_product parity
    * surface), round to 9 before the exp, h rounds to 9 into the
    * decimal sum.
    *
    * Scale shape: two row_number windows partitioned by cohort, three
    * pair equi-joins on the pair index, one reduction. No all-pairs.
    */
  def mmdLinearCard(embeddings: DataFrame, idCol: String, vecCol: String,
      isA: Column, gamma: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = embeddings
      .select(col(idCol).as("id"),
        col(vecCol).cast("array<double>").as("e"), isA.as("__a"))
    val w = Window.partitionBy(col("__a")).orderBy(col("id"))
    val idx = d.withColumn("__r", row_number().over(w) - 1)
      .withColumn("pair", expr("__r div 2"))
      .withColumn("pos", col("__r") % 2)
    def side(a: Boolean, pos: Int, name: String) =
      idx.filter(col("__a") === a && col("pos") === pos)
        .select(col("pair"), col("e").as(name))
    val quads = side(a = true, 0, "x1").join(side(a = true, 1, "x2"), "pair")
      .join(side(a = false, 0, "y1"), "pair")
      .join(side(a = false, 1, "y2"), "pair")
    def k(a: Column, b: Column): Column =
      exp(-lit(gamma) * round(
        dotNative(a, a) + dotNative(b, b) -
          lit(2.0) * dotNative(a, b), 9))
    val h = round(
      k(col("x1"), col("x2")) + k(col("y1"), col("y2")) -
        k(col("x1"), col("y2")) - k(col("x2"), col("y1")), 9)
    quads.agg(count(lit(1)).as("n_quads"),
        sum(h.cast("decimal(38,9)")).cast("double").as("__sh"))
      .select(col("n_quads"),
        round(col("__sh") / col("n_quads").cast("double"), 6)
          .as("mmd2_linear"))
  }

  /** Rocchio pseudo-relevance feedback (Rocchio 1971) over the
    * embedding corpus, measured: round 1 retrieves exact top-`k` per
    * query; the top-`m` of those are treated as pseudo-relevant and the
    * query moves toward their centroid (q' = q + β·centroid); round 2
    * re-retrieves with q'. The card reports macro precision@k BEFORE vs
    * AFTER (label match = relevance) and the mean top-k overlap — the
    * "did feedback actually help, and how much did the lists move"
    * readout that decides whether PRF ships in a retrieval stack.
    *
    * Portability: centroids are per-(query, dim) round-12 decimal sums
    * (order-free), q' is one fixed zip_with, both retrieval rounds rank
    * on the round-6 cosine (the q16/q223 contract). Scale shape: two
    * broadcast-query corpus scans ([[knnJoin]]); the feedback frames
    * are (queries × m) and (queries × dims) — broadcast-sized.
    */
  def rocchioPrfCard(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int = 10,
      m: Int = 5, beta: Double = 0.75): DataFrame = {
    require(k >= 1 && m >= 1 && m <= k, "need 1 <= m <= k")
    val r1 = knnJoin(corpus, queries, idCol, vecCol, idCol, vecCol, k)
      .persist()
    try {
      val fb = r1.filter(col("rank") <= m)
        .join(corpus.select(col(idCol).as("n_id"),
          col(vecCol).cast("array<double>").as("__ne")), Seq("n_id"))
      val cent = fb
        .select(col("q_id"), posexplode(col("__ne")).as(Seq("dim", "v")))
        .groupBy(col("q_id"), col("dim"))
        .agg((sum(round(col("v"), 12).cast("decimal(38,12)"))
          .cast("double") / count(lit(1)).cast("double")).as("c"))
      val centArr = cent.groupBy(col("q_id"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"), col("c")))),
          s => s.getField("c")).as("__ce"))
      val q2 = queries
        .select(col(idCol).as("q_id"),
          col(vecCol).cast("array<double>").as("__qe"))
        .join(centArr, Seq("q_id"))
        .select(col("q_id"),
          zip_with(col("__qe"), col("__ce"),
            (a, b) => a + lit(beta) * b).as("__qe2"))
      val r2 = knnJoin(corpus, q2, idCol, vecCol, "q_id", "__qe2", k)
      val lbl = corpus.select(col(idCol).as("__id"),
        col(labelCol).as("__l"))
      def perQueryPrec(r: DataFrame, out: String) = r
        .join(lbl.withColumnRenamed("__id", "q_id")
          .withColumnRenamed("__l", "__ql"), Seq("q_id"))
        .join(lbl.withColumnRenamed("__id", "n_id")
          .withColumnRenamed("__l", "__nl"), Seq("n_id"))
        .groupBy(col("q_id"))
        .agg((sum(when(col("__ql") === col("__nl"), 1L).otherwise(0L))
          .cast("double") / count(lit(1)).cast("double")).as(out))
      val ov = r1.select(col("q_id"), col("n_id"))
        .join(r2.select(col("q_id"), col("n_id")), Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("__novl"))
      val perq = perQueryPrec(r1, "__p1")
        .join(perQueryPrec(r2, "__p2"), Seq("q_id"))
        .join(ov, Seq("q_id"), "left")
        .select(col("q_id"), col("__p1"), col("__p2"),
          (coalesce(col("__novl"), lit(0L)).cast("double") /
            lit(k.toDouble)).as("__ov"))
      def d12(c: Column): Column =
        sum(round(c, 12).cast("decimal(38,12)")).cast("double")
      perq.agg(count(lit(1)).as("n_queries"),
        d12(col("__p1")).as("__s1"), d12(col("__p2")).as("__s2"),
        d12(col("__ov")).as("__so"))
        .select(col("n_queries"),
          round(col("__s1") / col("n_queries").cast("double"), 6)
            .as("p_at_k_before"),
          round(col("__s2") / col("n_queries").cast("double"), 6)
            .as("p_at_k_after"),
          round(col("__s2") / col("n_queries").cast("double") -
            col("__s1") / col("n_queries").cast("double"), 6)
            .as("p_at_k_delta"),
          round(col("__so") / col("n_queries").cast("double"), 6)
            .as("mean_overlap_at_k"))
    } finally { r1.unpersist(); () }
  }
}
