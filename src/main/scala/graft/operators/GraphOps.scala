package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph operators for duplicate-cluster resolution. Near-dup detection
  * (MinHash/SimHash/Jaccard/cosine — [[DedupOps]], [[SimilarityOps]]) emits
  * PAIRS; a corpus-cleaning pipeline needs CLUSTERS — one canonical document
  * per transitively-connected duplicate group. The reference's dedup surface
  * stops at pairwise comparison, so this is the composition step that turns
  * its primitives into a usable dedup pass.
  *
  * Scale design: connected components by iterative min-label propagation over
  * DataFrames. Each round is ONE equi-join shuffle (labels onto the symmetric
  * edge list) plus ONE hash aggregation (min label per vertex) — no all-pairs
  * work, no driver-side graph. The driver loop only CONTROLS iteration (a
  * `count()` of changed labels per round, exactly like MLlib's iterative
  * fitters); all data movement is distributed. `localCheckpoint` truncates
  * lineage each round so plans stay O(1) deep. Rounds needed = graph
  * diameter; duplicate clusters are near-cliques (diameter ≤ 3-4 in
  * practice), so this converges in a handful of rounds at any corpus size.
  * For adversarially-deep graphs the alternating small-star/large-star
  * scheme (Kiveris et al., "Connected Components in MapReduce and Beyond")
  * bounds rounds by O(log n); not needed for dedup workloads.
  */
object GraphOps {

  /** Connected components of the undirected graph given by `edges`.
    * Returns (`v`, `component`) where `component` is the minimum vertex id
    * reachable from `v` — deterministic, partitioning-independent. Vertices
    * in `nodes` (optional, single-column) that touch no edge come back as
    * their own singleton components.
    *
    * Throws if `maxIter` rounds don't converge (a wrong-but-plausible result
    * would silently corrupt a dedup pass downstream).
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
      nodes: Option[DataFrame] = None, maxIter: Int = 50): DataFrame = {
    val fwd = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    // symmetric closure, deduped: halves redundant messages from multi-edges
    val sym = fwd.union(fwd.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct()
      .localCheckpoint() // materialize once: iterations must not re-derive
                         // the (possibly expensive) candidate-pair plan
    // seed each vertex with min(self, neighbors) — the first propagation
    // round folded into one aggregation (no join), which on near-clique
    // dedup graphs lands most vertices on their final label immediately
    val neighborMin = sym.groupBy(col("__src"))
      .agg(least(min(col("__dst")), col("__src")).as("component"))
      .withColumnRenamed("__src", "v")
    val seed = nodes match {
      case Some(n) =>
        val singletons = n.toDF("v")
          .join(neighborMin.select("v"), Seq("v"), "left_anti")
          .withColumn("component", col("v"))
        neighborMin.unionByName(singletons)
      case None => neighborMin
    }
    var labels = seed.localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = sym.join(labels, sym("__src") === labels("v"))
        .select(col("__dst").as("v"), col("component"))
      val next = labels.union(msgs)
        .groupBy("v").agg(min("component").as("component"))
        .localCheckpoint()
      val changed = next
        .join(labels.withColumnRenamed("component", "__prev"), "v")
        .filter(col("component") < col("__prev"))
        .count()
      labels = next
      converged = changed == 0L
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter; raise it or use star-contraction")
    labels
  }

  /** Dedup by cluster: keep exactly one row per duplicate cluster — the one
    * whose id equals the cluster's canonical (minimum) member. Rows that
    * appear in no edge survive untouched (they are their own cluster).
    */
  def keepCanonical(df: DataFrame, idCol: String, edges: DataFrame,
      srcCol: String, dstCol: String): DataFrame = {
    val comp = connectedComponents(edges, srcCol, dstCol)
      .filter(col("v") =!= col("component")) // non-canonical members only
      .select(col("v").as("__drop_id"))
    df.join(comp, df(idCol) === comp("__drop_id"), "left_anti")
  }

  /** Global triangle census of the undirected graph: triangle count and
    * the average local clustering coefficient (2·t_v / deg_v(deg_v−1),
    * averaged over nodes of degree ≥ 2). The density diagnostic of a
    * near-dup graph — duplicate clusters are near-cliques (coefficient
    * → 1), spurious LSH chains are not — so this is the quality check on
    * the q67 component structure.
    *
    * The classic two-join shape: orient edges by id (a < b kills both the
    * 6× triangle multiplicity and the wedge blow-up from high-degree
    * hubs), join wedges on the middle vertex, close them with a semi-join
    * back onto the oriented edge list. Wedge fan-out is bounded by the
    * oriented out-degree — the standard distributed-triangle bound.
    */
  def triangleStats(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val oriented = fwd
      .select(least(col("__a"), col("__b")).as("a"),
        greatest(col("__a"), col("__b")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val wedges = oriented
      .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
      .select(col("a"), col("b"), col("c"))
    val triangles = wedges
      .join(oriented.select(col("a"), col("b").as("c")), Seq("a", "c"),
        "leftsemi")
    val triPerNode = triangles
      .select(explode(array(col("a"), col("b"), col("c"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("__t"))
    val sym = oriented.select(col("a").as("v"))
      .union(oriented.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("__d"))
    val cc = sym.join(triPerNode, Seq("v"), "left")
      .withColumn("__cc",
        when(col("__d") >= 2,
          coalesce(col("__t"), lit(0L)).cast("double") * 2.0 /
            (col("__d") * (col("__d") - 1)).cast("double")))
    val tri = triangles.agg(count(lit(1)).as("n_triangles"))
    cc.agg(
        count(lit(1)).as("n_nodes"),
        sum(col("__d")).as("__sumdeg"),
        round(sum(col("__cc").cast("decimal(28,12)")).cast("double") /
          count(col("__cc")), 6).as("avg_clustering"))
      .withColumn("n_edges", expr("__sumdeg div 2"))
      .crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"),
        col("avg_clustering"))
  }

  /** PageRank over the undirected graph of `edges`, run for a FIXED number
    * of iterations in exact fixed-point integer arithmetic: ranks are
    * BIGINTs scaled by `scale` (1.0 ≡ `scale`), each iteration is
    * rank' = (1−d)·scale + d·Σ_in rank/outdeg with d = dampNum/dampDen and
    * every division an integer floor-divide. Because the math is pure
    * BIGINT, the result is bit-identical in ANY engine — an SQL oracle can
    * replay the same unrolled iterations — and partition-order-free (integer
    * sums commute exactly; float PageRank does not).
    *
    * The centrality score ranks canonical representatives inside duplicate
    * clusters (the most-linked member is usually the original; the mirrors
    * rank lower) and weights corpus sources. Each iteration is one equi-join
    * of the rank frame onto the edge list plus one hash aggregation — the
    * standard distributed PageRank shape; `localCheckpoint` keeps the
    * unrolled plan shallow.
    */
  def pageRankFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 10, dampNum: Long = 85L, dampDen: Long = 100L,
      scale: Long = 1000000000000L): DataFrame = {
    val fwd = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val sym = fwd
      .union(fwd.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct()
      .localCheckpoint()
    // degree table is iteration-invariant — checkpoint it once instead of
    // re-aggregating the edge list inside every iteration's join
    val outdeg = sym.groupBy(col("__src"))
      .agg(count(lit(1)).as("__deg"))
      .localCheckpoint()
    val base = lit(scale * (dampDen - dampNum) / dampDen)
    var ranks = outdeg.select(col("__src").as("v"),
      lit(scale).as("rank_fp"), col("__deg"))
    for (_ <- 1 to iterations) {
      // per-edge contribution: floor(floor(rank·d) / outdeg); summed as
      // exact BIGINTs, so no accumulation-order sensitivity exists
      val contrib = sym
        .join(ranks, sym("__src") === ranks("v"))
        .select(col("__dst").as("v"),
          // `div` (not `/`): Spark's `/` promotes to double; the contract
          // here is exact BIGINT floor division, replayable by the oracle
          expr(s"rank_fp * $dampNum div $dampDen div __deg").as("__c"))
      ranks = contrib.groupBy(col("v"))
        .agg((base + sum(col("__c"))).as("rank_fp"))
        .join(outdeg.withColumnRenamed("__src", "v"), "v")
        .localCheckpoint()
    }
    ranks.select(col("v"), col("rank_fp"),
      round(col("rank_fp").cast("double") / scale.toDouble, 6).as("rank"))
  }

  /** HITS hubs/authorities (Kleinberg 1999) on a DIRECTED bipartite-ish
    * edge set, in the [[pageRankFixedPoint]] exact-integer contract:
    * scores live as BIGINT fixed-point (scale 10⁶), every iteration is
    * two exact integer aggregations (auth = Σ in-hub, hub = Σ out-auth)
    * each followed by an L∞ normalization via one BIGINT floor division
    * against the broadcast max — no float touches an iterated value, so
    * the trajectory is engine-portable bit-for-bit. The scale keeps
    * score·10⁶ within BIGINT for in-degrees up to ~10⁶ at ~10⁶ scale —
    * the overflow-audited envelope.
    *
    * Output: top-`k` hubs and top-`k` authorities (side, id, score_fp,
    * score), ties toward the smaller id.
    */
  def hitsFixedPoint(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8, k: Int = 10,
      scale: Long = 1000000L): DataFrame = {
    val e = edges.select(col(srcCol).cast("long").as("__src"),
      col(dstCol).cast("long").as("__dst")).distinct().localCheckpoint()
    var hubs = e.select(col("__src").as("v")).distinct()
      .withColumn("s", lit(scale))
    var auths: DataFrame = null
    for (_ <- 1 to iterations) {
      // checkpoint the RAW aggregate, not the normalized frame: the max
      // for the L∞ normalization is a broadcast built from the same
      // frame, so checkpointing after it would execute the join+agg
      // twice per half-iteration (once to build the broadcast max, once
      // for the checkpoint) — materializing first halves the heavy work;
      // the normalization itself stays a lazy projection
      val aRaw = e.join(hubs, e("__src") === hubs("v"))
        .groupBy(col("__dst").as("v")).agg(sum(col("s")).as("raw"))
        .localCheckpoint()
      val aMax = aRaw.agg(max(col("raw")).as("__mx"))
      auths = aRaw.crossJoin(broadcast(aMax))
        .select(col("v"), expr(s"raw * $scale div __mx").as("s"))
      val hRaw = e.join(auths, e("__dst") === auths("v"))
        .groupBy(col("__src").as("v")).agg(sum(col("s")).as("raw"))
        .localCheckpoint()
      val hMax = hRaw.agg(max(col("raw")).as("__mx"))
      hubs = hRaw.crossJoin(broadcast(hMax))
        .select(col("v"), expr(s"raw * $scale div __mx").as("s"))
    }
    def top(side: String, d: DataFrame) = d
      .orderBy(col("s").desc, col("v")).limit(k)
      .select(lit(side).as("side"), col("v").as("id"),
        col("s").as("score_fp"),
        round(col("s").cast("double") / scale.toDouble, 6).as("score"))
    top("hub", hubs).unionAll(top("authority", auths))
      .orderBy(col("side"), col("score_fp").desc, col("id"))
  }

  /** Multi-source BFS distance card: exact shortest-path hop counts
    * from the `nSources` smallest vertex ids, expanded for a FIXED
    * number of rounds — the distance-structure view of the similarity
    * graph that the degree family (PageRank/HITS/k-core) cannot give:
    * how many hops until a near-dup cluster saturates, and whether the
    * graph is one ball or several islands (n_reached vs n_vertices).
    * Output: one row per (source, distance) with the level size, plus
    * each source's reach and eccentricity-within-rounds.
    *
    * Exactness: distances are exact integers (min over discovered
    * levels), sources are the deterministic smallest ids — fully
    * engine- and partition-order-portable, no floats anywhere.
    *
    * Scale shape: per round ONE frontier equi-join (only rows at
    * d = round−1 expand) and one (src, v) min-aggregation;
    * `localCheckpoint` caps lineage. `rounds` bounds the unrolled plan
    * exactly like [[kCore]]; real similarity graphs saturate in a few
    * hops, and the card SHOWS the saturation so a caller knows whether
    * the cap bound anything.
    */
  def bfsHops(edges: DataFrame, srcCol: String, dstCol: String,
      nSources: Int = 4, rounds: Int = 6): DataFrame = {
    require(nSources >= 1 && rounds >= 1,
      "need nSources >= 1 and rounds >= 1")
    val fwd = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    val sym = fwd
      .union(fwd.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct()
      .localCheckpoint()
    val verts = sym.select(col("__src").as("v")).distinct()
    val srcs = verts.orderBy(col("v")).limit(nSources)
      .select(col("v").as("src"))
    var dist = srcs
      .select(col("src"), col("src").as("v"), lit(0L).as("d"))
      .localCheckpoint()
    for (r <- 1 to rounds) {
      val expand = dist.filter(col("d") === lit((r - 1).toLong))
        .join(sym, col("v") === col("__src"))
        .select(col("src"), col("__dst").as("v"), lit(r.toLong).as("d"))
      dist = dist.unionByName(expand)
        .groupBy(col("src"), col("v")).agg(min(col("d")).as("d"))
        .localCheckpoint()
    }
    val nVerts = verts.agg(count(lit(1)).as("n_vertices"))
    val perSrc = dist.groupBy(col("src"))
      .agg(count(lit(1)).as("n_reached"),
        max(col("d")).as("ecc_within_rounds"))
    dist.groupBy(col("src"), col("d"))
      .agg(count(lit(1)).as("n_at_distance"))
      .join(broadcast(perSrc), "src")
      .crossJoin(broadcast(nVerts))
      .select(col("src"), col("d"), col("n_at_distance"),
        col("n_reached"), col("ecc_within_rounds"), col("n_vertices"))
      .orderBy(col("src"), col("d"))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983), run for a
    * FIXED number of rounds: each round drops every vertex whose degree
    * in the surviving subgraph is < `k`, then restricts the edge set to
    * survivors. `rounds` bounds the unrolled plan (and the oracle's CTE
    * chain) — peeling converges when a round removes nothing, and for
    * real graphs the cascade depth is small; a caller needing a
    * certificate of convergence compares rounds r and r−1. All
    * arithmetic is exact integer degree counting, so the surviving set
    * is engine- and partition-order-portable by construction.
    *
    * The k-core is the standard "dense enough to matter" filter before
    * community/centrality passes — peels leaf chains and weakly-attached
    * mirrors off a near-duplicate graph far cheaper than clustering.
    *
    * Scale shape: per round one degree aggregation (shuffle keyed on
    * vertex) + two semi-joins of the edge list against the ≤|V|-row
    * survivor frame; `localCheckpoint` caps lineage depth.
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int = 3, rounds: Int = 8): DataFrame = {
    require(k >= 1 && rounds >= 1, "need k >= 1 and rounds >= 1")
    val fwd = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
    var sym = fwd
      .union(fwd.select(col("__dst").as("__src"), col("__src").as("__dst")))
      .distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy(col("__src")).agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
      val keepSrc = keep.select(col("__src").as("__v1"))
      val keepDst = keep.select(col("__src").as("__v2"))
      sym = sym
        .join(keepSrc, col("__src") === col("__v1"), "leftsemi")
        .join(keepDst, col("__dst") === col("__v2"), "leftsemi")
        .localCheckpoint()
    }
    sym.groupBy(col("__src").as("v"))
      .agg(count(lit(1)).as("degree"))
      .orderBy(col("v"))
  }

  /** Link prediction over the undirected graph: for every NON-adjacent
    * pair sharing ≥1 neighbor, the three classic scores — common-
    * neighbor count, neighborhood Jaccard, and Adamic–Adar
    * Σ_z 1/ln(deg z) (Adamic & Adar 2003, rare shared neighbors count
    * more) — top-`topK` candidates. The "which near-dup pair did the
    * threshold MISS" view of the similarity graph: banded equi-join on
    * the shared neighbor, never all-pairs.
    *
    * Exactness: counts/degrees exact; AA terms round to 9 into a
    * decimal sum; Jaccard is one double division.
    *
    * Scale shape: one self-equi-join on the neighbor id (wedge
    * enumeration — the [[triangleStats]] budget), one anti-join against
    * the edge list, one TakeOrdered(topK).
    */
  def linkPredictionCard(edges: DataFrame, srcCol: String,
      dstCol: String, topK: Int = 20): DataFrame = {
    require(topK >= 1, "topK must be >= 1")
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val oriented = fwd
      .select(least(col("__a"), col("__b")).as("a"),
        greatest(col("__a"), col("__b")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val sym = oriented.union(
      oriented.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("z")).agg(count(lit(1)).as("dz"))
    // wedges through z: (u, w) with u < w, scored by z's degree
    val throuZ = sym.select(col("a").as("z"), col("b").as("u"))
      .join(deg, "z")
    val pairs = throuZ
      .join(throuZ.select(col("z"), col("u").as("w")), "z")
      .filter(col("u") < col("w"))
      .groupBy(col("u"), col("w"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(round(lit(1.0) / log(col("dz").cast("double")), 9)
          .cast("decimal(38,9)")).cast("double").as("__aa"))
    val candidates = pairs.join(
      oriented.select(col("a").as("u"), col("b").as("w")),
      Seq("u", "w"), "left_anti")
    val withDeg = candidates
      .join(deg.select(col("z").as("u"), col("dz").as("du")), "u")
      .join(deg.select(col("z").as("w"), col("dz").as("dw")), "w")
    withDeg
      .select(col("u").as("id_a"), col("w").as("id_b"),
        col("common_neighbors"),
        round(col("common_neighbors").cast("double") /
          (col("du") + col("dw") - col("common_neighbors"))
            .cast("double"), 6).as("jaccard"),
        round(col("__aa"), 6).as("adamic_adar"))
      .orderBy(col("common_neighbors").desc, col("id_a"), col("id_b"))
      .limit(topK)
  }

  /** One-row structural card of the undirected graph: degree
    * assortativity (Newman 2002 — do hubs link to hubs?) over the 2m
    * directed stubs, and global transitivity 3·triangles/wedges (the
    * closed-wedge fraction; [[triangleStats]]' avg-local-clustering is
    * the per-node mean, THIS is the edge-weighted global). Every
    * moment — stub degree sums, products, wedge counts — is an exact
    * integer; both ratios assemble in one fixed double shape.
    *
    * Scale shape: one degree aggregation, one broadcast-degree edge
    * join, the [[triangleStats]] wedge/triangle joins; no all-pairs.
    */
  def assortativityCard(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val fwd = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
    val oriented = fwd
      .select(least(col("__a"), col("__b")).as("a"),
        greatest(col("__a"), col("__b")).as("b"))
      .filter(col("a") < col("b")).distinct()
    val sym = oriented.union(
      oriented.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a").as("v")).agg(count(lit(1)).as("d"))
    def dec(c: Column): Column = c.cast("decimal(38,0)")
    val stubs = oriented
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .agg(count(lit(1)).as("m"),
        sum(col("da") + col("db")).cast("double").as("__sx"),
        sum(dec(col("da")) * dec(col("da")) +
          dec(col("db")) * dec(col("db"))).cast("double").as("__sxx"),
        (sum(dec(col("da")) * dec(col("db"))) * lit(2)).cast("double")
          .as("__sxy"))
    val wedgeTri = {
      val wedges = deg.agg(
        sum(dec(col("d")) * dec(col("d") - 1L)).cast("double")
          .as("__w2"),
        count(lit(1)).as("n_nodes"))
      val w = oriented
        .join(oriented.select(col("a").as("b"), col("b").as("c")), "b")
        .select(col("a"), col("c"))
      val tri = w.join(oriented.select(col("a"), col("b").as("c")),
          Seq("a", "c"), "leftsemi")
        .agg(count(lit(1)).as("n_triangles"))
      wedges.crossJoin(tri)
    }
    val mD2 = (col("m") * lit(2L)).cast("double")
    val mu = col("__sx") / mD2
    val r = (col("__sxy") / mD2 - mu * mu) /
      (col("__sxx") / mD2 - mu * mu)
    stubs.crossJoin(wedgeTri)
      .select(col("n_nodes"), col("m").as("n_edges"),
        col("n_triangles"),
        (col("__w2") / 2.0).cast("long").as("n_wedges"),
        round(lit(3.0) * col("n_triangles").cast("double") /
          (col("__w2") / lit(2.0)), 6).as("transitivity"),
        round(r, 6).as("assortativity"))
  }
}
