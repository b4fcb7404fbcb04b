package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audit: the properties that make these queries survive a
  * 100× scale-up are asserted here, not just eyeballed — filters reach the
  * parquet scan, projections prune the read schema, provably-small join
  * sides broadcast instead of shuffling, and the per-row operators stay
  * inside whole-stage codegen.
  */
class PlanAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** AQE finalizes (and wraps stages in WholeStageCodegen) only after an
    * action — execute first, then read the final plan.
    */
  private def finalPlan(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: predicate and projection are pushed into the parquet scan") {
    val p = plan(SparkEntry.q02(spark, dir))
    assert(p.contains("PushedFilters:"))
    assert(p.contains("GreaterThanOrEqual(l_quantity,45.0)"), p)
    // (the full PushedFilters list is truncated in toString; the DataFilters
    // mirror confirms the returnflag predicate reached the scan)
    assert(p.contains("(l_returnflag#") && p.contains("= R)"), p)
    // read schema must carry only the 4 projected + 2 filtered columns
    assert(!p.contains("l_shipdate"), "scan reads columns the query never uses")
    assert(!p.contains("l_tax"), "scan reads columns the query never uses")
  }

  test("q01: ship-date filter reaches the scan; aggregate is partial+final") {
    val p = plan(SparkEntry.q01(spark, dir))
    assert(p.contains("PushedFilters:") && p.contains("l_shipdate"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q03: small dimensions broadcast — no sort-merge shuffle join") {
    val p = plan(SparkEntry.q03(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "dim join must broadcast, not shuffle")
  }

  test("q05: interval join is a broadcast HASH join on the equi-key") {
    // the range condition must ride as a residual on the user_id hash join —
    // a nested-loop join here would be O(|fact|·|anchors|) at scale
    val p = plan(SparkEntry.q05(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  // in a finalized AQE plan, whole-stage-codegen stages print as "*(n) Op"
  private def hasCodegenStage(p: String): Boolean =
    p.contains("WholeStageCodegen") || "\\*\\(\\d+\\)".r.findFirstIn(p).isDefined

  test("q12/q13: text ops are pure per-row projections inside codegen") {
    val p12 = finalPlan(SparkEntry.q12(spark, dir))
    assert(hasCodegenStage(p12), p12)
    assert(!p12.contains("Exchange hashpartitioning"),
      "token stats must not shuffle")
    val p13 = plan(SparkEntry.q13(spark, dir))
    assert(!p13.contains("Exchange hashpartitioning"),
      "quality scoring must not shuffle")
  }

  test("q15: native cosine runs inside whole-stage codegen") {
    val p = finalPlan(SparkEntry.q15(spark, dir))
    assert(p.contains("vec_cosine"), p)
    // the projection containing vec_cosine must be inside a codegen stage
    assert("\\*\\(\\d+\\) Project \\[vec_id".r.findFirstIn(p).isDefined, p)
  }

  test("q31: semi and anti joins broadcast the filter side") {
    val p = plan(SparkEntry.q31(spark, dir))
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"), p)
  }

  test("q46/q61/q151: no global window; single-partition exchanges only above partial aggregates") {
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    @annotation.tailrec
    def strip(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => strip(w.child)
      case i: InputAdapter => strip(i.child)
      case other => other
    }
    // AQE off so the executed plan is the plain physical tree (traversable
    // without materializing query stages)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq(SparkEntry.q46(spark, dir), SparkEntry.q61(spark, dir),
          SparkEntry.q151(spark, dir)).foreach { df =>
        val p = df.queryExecution.executedPlan
        p.foreach {
          case w: WindowExec =>
            assert(w.partitionSpec.nonEmpty, s"global window in:\n$p")
          case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
            // a single-partition exchange is only scale-safe when it moves
            // partial-aggregate rows (one per upstream partition), never
            // the full table into one task
            assert(strip(e.child).isInstanceOf[BaseAggregateExec],
              s"single-partition exchange over non-aggregated rows in:\n$p")
          case _ =>
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q380 KMV: merged-ALL re-rank carries no single-partition window") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.q380(spark, dir).queryExecution.executedPlan
      p.foreach {
        case w: WindowExec =>
          assert(w.partitionSpec.nonEmpty, s"global window in:\n$p")
        case _ =>
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("minhash/simhash: one exchange, partial map-side aggregation, codegen") {
    import graft.operators.DedupOps
    val docs = Tables.load(spark, dir, "documents")
    for (full <- Seq(
        finalPlan(DedupOps.lshBands(
          DedupOps.minhashSignatures(docs, "doc_id", "text", 3, 16),
          "doc_id", 16, 4)),
        finalPlan(DedupOps.simhash64(docs, "doc_id", "text")))) {
      // the AQE string repeats the tree under "== Initial Plan ==" — audit
      // the final section only
      val p = full.split("== Initial Plan ==").head
      // exactly ONE shuffle — and it carries partially-aggregated
      // signature-width rows (map-side combine before the exchange), with
      // the per-shingle arithmetic inside whole-stage codegen (`*(n)`
      // stages). A lambda-HOF formulation would show zero exchanges but
      // run interpreted — measured ~10× slower; see DedupOps scaladoc.
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
      assert(p.contains("partial_min") || p.contains("partial_sum"), p)
      assert(p.contains("*("), p)
    }
  }

  test("q76 decontamination: benchmark side broadcasts, corpus never shuffles for the join") {
    val p = finalPlan(SparkEntry.q76(spark, dir))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
  }

  test("q68 bucketed interval join: equi-join shuffle, no broadcast-nested-loop") {
    val p = finalPlan(SparkEntry.q68(spark, dir))
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the join must be a hash/sort-merge EQUI-join on (key, bucket) — the
    // shape that survives an un-broadcastable anchor side
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q69 tf-idf: ranking window is per-document, never single-partition") {
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    @annotation.tailrec
    def strip(p: SparkPlan): SparkPlan = p match {
      case w: WholeStageCodegenExec => strip(w.child)
      case i: InputAdapter => strip(i.child)
      case other => other
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.q69(spark, dir).queryExecution.executedPlan
      var sawWindow = false
      p.foreach {
        case w: WindowExec =>
          sawWindow = true
          assert(w.partitionSpec.nonEmpty, s"global window in:\n$p")
        case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
          // only the 1-row doc-count aggregate may move to one task
          assert(strip(e.child).isInstanceOf[BaseAggregateExec],
            s"single-partition exchange over non-aggregated rows in:\n$p")
        case _ =>
      }
      assert(sawWindow, s"expected a per-doc ranking window in:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q70 cdc compact: one max_by hash aggregation, no window sort path") {
    val p = finalPlan(SparkEntry.q70(spark, dir))
    // the scale claim: compaction is an aggregation with map-side partial
    // combine, NOT a row_number window (full sort shuffle of every version)
    assert(!p.contains("Window"), p)
    assert(p.contains("partial_max_by"), p)
  }

  test("q63 as-of join: one key shuffle, no join operator, no pair blow-up") {
    val df = SparkEntry.q63(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the tagged-union window form: the only data movement is ONE hash
    // partitioning on the key (the final orderBy adds a range exchange);
    // a range-join formulation would show a join node and candidate blow-up
    val nHash = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nHash == 1, s"expected exactly 1 key shuffle, got $nHash:\n$p")
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
  }

  test("q64 corpus clean: bounded shuffles, text scoring stays in the scan pass") {
    val df = SparkEntry.q64(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // per-row scoring (tokens/quality/langid/md5) is projection work before
    // the first exchange; the dedup groupBy + join on the content hash and
    // the per-source aggregate are the only hash shuffles
    val nHash = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nHash <= 3, s"expected <=3 hash shuffles, got $nHash:\n$p")
    // the dedup join is an equi-join on the content hash — never a
    // cartesian pair explosion (SortMergeJoin on h is fine at scale)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q97 token LM: term shuffle + doc aggregate only, no window, no BNLJ") {
    val df = SparkEntry.q97(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // corpus LM (term key), join-back, doc aggregate — the term hash is the
    // only unbounded key; a window formulation would sort the whole explode
    assert(!p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"expected map-side partial aggregation:\n$p")
    val nHash = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nHash <= 3, s"expected <=3 hash shuffles, got $nHash:\n$p")
  }

  test("q101 weighted median: per-key window, never a single-partition sort") {
    val df = SparkEntry.q101(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the cumulative-weight window partitions BY KEY; a global orderBy-based
    // median would funnel the table through one task
    assert(!finalSection.contains("Exchange SinglePartition"),
      s"weighted median must not single-partition the data:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"totals must broadcast:\n$p")
  }

  test("q102 funnel: stage frontiers join on the user hash, no pair blow-up") {
    val df = SparkEntry.q102(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q104 profile: each column pass prunes its read schema") {
    val p = plan(SparkEntry.q104(spark, dir))
    // six per-column aggregation branches; every FileScan must read at most
    // one data column (plus none for the pure-count branch) — a profile
    // that rescans all columns per branch reads 6× the bytes at 100 TB
    val reads = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(p).map(_.group(1)).toList
    assert(reads.nonEmpty, p)
    reads.foreach { r =>
      val nCols = if (r.trim.isEmpty) 0 else r.split(",").length
      assert(nCols <= 1, s"profile branch reads $nCols columns ($r):\n$p")
    }
  }

  test("q109/q110: stratum/key windows partition by the key, no global sort") {
    for ((name, q) <- Seq("q109" -> SparkEntry.q109 _, "q110" -> SparkEntry.q110 _)) {
      val df = q(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val finalSection = p.split("== Initial Plan ==").head
      // the window must partition on the stratum/user key; a global
      // (single-partition) window here would serialize the corpus
      val globalExchanges = "Exchange SinglePartition".r
        .findAllIn(finalSection).length
      assert(globalExchanges == 0,
        s"$name funnels data through one task:\n$p")
    }
  }

  test("q111 AR(1): one ordered key window + broadcast of per-key params") {
    val df = SparkEntry.q111(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("Exchange SinglePartition"),
      s"AR(1) must not single-partition the events:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"per-key params must broadcast into the RMSE pass:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q112 skew report: aggregates the per-key count frame, not the data") {
    val df = SparkEntry.q112(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // two stacked aggregations (per-key counts, then the tiny summary) —
    // map-side partial combine on the big first one
    assert(p.contains("partial_count") || p.contains("partial_sum"), p)
    assert(!p.contains("Window"),
      s"the report needs no window pass over the data:\n$p")
  }

  test("q113/q115/q119: global windows/exchanges only above aggregated frames") {
    import org.apache.spark.sql.execution.{InputAdapter, SparkPlan, WholeStageCodegenExec}
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    def containsAgg(p: SparkPlan): Boolean = p.collectFirst {
      case a: BaseAggregateExec => a
    }.nonEmpty
    // the drift/KS/backtest shape: the DATA only ever crosses keyed
    // exchanges; anything global (ordered offset windows, closing
    // single-row aggregates) must sit above an aggregation that already
    // collapsed the data to a statistic frame — q46's midrank rule
    // generalized to cumulative-distribution operators
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Seq(SparkEntry.q113(spark, dir), SparkEntry.q115(spark, dir),
          SparkEntry.q119(spark, dir), SparkEntry.q137(spark, dir)).foreach { df =>
        val p = df.queryExecution.executedPlan
        p.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            assert(containsAgg(w.child),
              s"global window directly over data in:\n$p")
          case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
            assert(containsAgg(e.child),
              s"single-partition exchange over non-aggregated rows in:\n$p")
          case _ =>
        }
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q127/q133/q139: self-join shapes stay equi-joins, no pair blow-up") {
    // co-occurrence, bigram LM and the triangle wedge all self-join — the
    // plan must key every join (hash/broadcast on an equi-condition);
    // a CartesianProduct or BroadcastNestedLoopJoin here is the
    // all-pairs cliff that kills these at corpus scale
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    def containsAgg(p: SparkPlan): Boolean = p.collectFirst {
      case a: BaseAggregateExec => a
    }.nonEmpty
    for ((name, df) <- Seq(
        "q127" -> SparkEntry.q127(spark, dir),
        "q133" -> SparkEntry.q133(spark, dir),
        "q139" -> SparkEntry.q139(spark, dir))) {
      df.collect()
      val executed = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case other => other
      }
      val p = executed.toString
      assert(!p.contains("CartesianProduct"),
        s"$name plans an all-pairs cartesian:\n$p")
      // the ONLY admissible nested-loop join is the 1-row-aggregate cross
      // join (broadcasting a global count/bound frame) — a data-sized
      // nested loop is the all-pairs cliff
      executed.foreach {
        case b: BroadcastNestedLoopJoinExec =>
          assert(containsAgg(b.right) || containsAgg(b.left),
            s"$name nested-loops over non-aggregated data:\n$p")
        case _ =>
      }
    }
  }

  test("q117 bloom semi-join: constant bloom probe filters below a semi-join") {
    val df = SparkEntry.q117(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalSection = p.split("== Initial Plan ==").head
    // the probe is a plain Filter on the big side (pre-shuffle row pruning
    // with a constant bloom), then the exact LeftSemi wipes false positives
    assert(finalSection.contains("might_contain"),
      s"bloom probe missing from the physical plan:\n$p")
    assert(finalSection.contains("LeftSemi"),
      s"exact semi-join missing (false positives would survive):\n$p")
  }

  test("bucketed equi-join: ZERO exchanges — the co-located fact-fact join") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bucket_audit")
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = (1L to 500L).map(i => (i % 50, i)).toDF("k", "a")
      val right = (1L to 200L).map(i => (i % 50, i * 10)).toDF("kk", "b")
      val joined = graft.operators.LayoutOps.bucketedEquiJoin(
        spark, left, right, "k", "kk", buckets = 4, root.toString,
        "graft_audit_bkt")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      val finalSection = p.split("== Initial Plan ==").head
      assert(!finalSection.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      // and the layout is invisible: same rows as the plain join
      val plain = left.join(right, left("k") === right("kk"))
        .collect().map(_.toSeq).toSet
      assert(joined.collect().map(_.toSeq).toSet == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      graft.operators.LayoutOps.dropBucketed(spark, "graft_audit_bkt")
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  test("q140 zipf: rank window sits above a top-N cap, never the unbounded vocabulary") {
    import org.apache.spark.sql.execution.{SparkPlan, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.q140(spark, dir).queryExecution.executedPlan
      // the head cap must survive into the physical plan as a distributed
      // per-partition top-N (TakeOrderedAndProject), not a global sort
      assert(p.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
        s"no TakeOrderedAndProject cap in:\n$p")
      def bounded(n: SparkPlan): Boolean =
        n.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty
      p.foreach {
        case w: WindowExec if w.partitionSpec.isEmpty =>
          // a global rank window is only scale-safe over a capped frame
          assert(bounded(w.child), s"global window over unbounded frame:\n$p")
        case e: ShuffleExchangeExec if e.outputPartitioning.numPartitions == 1 =>
          assert(bounded(e.child),
            s"single-partition exchange over unbounded frame:\n$p")
        case _ =>
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q338 moods median: no unpartitioned window over the distinct-value frame") {
    import org.apache.spark.sql.execution.window.WindowExec
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = SparkEntry.q338(spark, dir).queryExecution.executedPlan
      val global = p.collect { case w: WindowExec if w.partitionSpec.isEmpty => w }
      // events.value is ~18% distinct — the distinct-value frame GROWS with
      // n, so the cumulative counts must run the two-level shape: the only
      // global window allowed is the per-bucket offset frame (≤ `buckets`
      // rows, keyed on __bkt after a groupBy)
      assert(global.nonEmpty, s"expected the bucket-offset window in:\n$p")
      global.foreach { w =>
        val outCols = w.child.output.map(_.name)
        assert(outCols.exists(_.contains("__bkt")) && outCols.size <= 3,
          s"global window over a non-bucket frame (${outCols.mkString(",")}):\n$p")
      }
      // and the in-bucket cumulation must be partitioned on the bucket key
      val bucketed = p.collect {
        case w: WindowExec if w.partitionSpec.nonEmpty => w
      }
      assert(bucketed.exists(_.partitionSpec.exists(_.toString.contains("__bkt"))),
        s"expected a __bkt-partitioned cumulative window in:\n$p")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q150 layout: date predicate prunes partitions at the scan") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.functions.{col, count, lit}
    val root = java.nio.file.Files.createTempDirectory("graft_prune_audit")
    try {
      val byDay = graft.operators.LayoutOps.writeDatePartitioned(
        Tables.load(spark, dir, "events"), "ts", "event_date",
        s"$root/events_by_day")
      val q = byDay
        .filter(col("event_date").between(lit("2024-01-08"), lit("2024-01-14")))
        .groupBy(col("event_date")).agg(count(lit(1)).as("n"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        val scans = q.queryExecution.executedPlan.collect {
          case f: FileSourceScanExec => f
        }
        assert(scans.nonEmpty, "no file scan in plan")
        val scan = scans.head
        // the date predicate must reach the scan as PartitionFilters —
        // a dataFilter would still read every directory
        assert(scan.partitionFilters.nonEmpty,
          s"no PartitionFilters in:\n${q.queryExecution.executedPlan}")
        val selected = scan.relation.location
          .listFiles(scan.partitionFilters, Nil).size
        val total = scan.relation.location.listFiles(Nil, Nil).size
        assert(total == 30, s"expected 30 day partitions, got $total")
        assert(selected == 7,
          s"expected 7 pruned partitions, got $selected of $total")
      } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
    }
  }

  test("q154 SQL star join: text plans with a broadcast customer side, like q93") {
    val p = finalPlan(SparkEntry.q154(spark, dir))
    // the SQL door pays no plan penalty: the filtered dimension broadcasts
    // and the fact chain never broadcast-inverts
    assert(p.contains("BroadcastHashJoin"), p)
    // the top-10 survives as a distributed TakeOrderedAndProject, not a
    // global sort
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("compaction: each partition rewrite is coalesce-shaped (no Exchange)") {
    import org.apache.spark.sql.functions.col
    val root = java.nio.file.Files.createTempDirectory("graft_compact_audit")
    try {
      Tables.load(spark, dir, "events")
        .withColumn("event_date", org.apache.spark.sql.functions.to_date(col("ts")))
        .repartition(6)
        .write.partitionBy("event_date").parquet(s"$root/frag")
      // the rewrite a single partition runs: read -> coalesce(n) -> write.
      // Audit the read+coalesce plan: bin-packing must be shuffle-free
      // (a repartition would pay a full shuffle per partition for nothing)
      val day = new java.io.File(s"$root/frag").listFiles()
        .filter(_.getName.startsWith("event_date=")).head
      val p = spark.read.parquet(day.getAbsolutePath).coalesce(1)
        .queryExecution.executedPlan.toString
      assert(p.contains("Coalesce"), p)
      assert(!p.contains("Exchange"), s"compaction rewrite shuffles:\n$p")
    } finally graft.tools.FsUtils.deleteRecursively(root)
  }

  test("q161 BM25: top-k is TakeOrdered, corpus stats broadcast") {
    val p = finalPlan(SparkEntry.q161(spark, dir))
    // never a global sort of the scored docs
    assert(p.contains("TakeOrderedAndProject"), s"top-k is not TakeOrdered:\n$p")
    // the 1-row corpus-stats frame joins by broadcast
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("q163 LSH buckets: pair join is bucket-keyed, never cartesian") {
    val p = finalPlan(SparkEntry.q163(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // the pair join must be an equi-join on the signature (the broadcast
    // 1-row sign-matrix crossjoin is the only nested-loop allowed)
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), s"pair join is not an equi-join:\n$p")
  }

  test("q165 chunking: pure per-row generate — no exchange at all") {
    val df = graft.operators.TextOps.slidingTokenChunks(
      Tables.load(spark, dir, "documents"), "doc_id", "text", 32, 24)
    val p = plan(df)
    assert(!p.contains("Exchange"), s"chunking should not shuffle:\n$p")
    assert(p.contains("Generate"), p)
  }

  test("q164 EWMA: one hash-partition exchange on the key, one window, no sort beyond it") {
    val p = finalPlan(SparkEntry.q164(spark, dir))
    // the per-key lag chain needs exactly one hashpartitioning exchange
    // (plus the output presentation sort's range exchange)
    val hashExchanges = "hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges >= 1 && p.contains("Window"), p)
    assert(!p.contains("SinglePartition"), s"EWMA must never globalize:\n$p")
  }

  test("q170 vocab build: head cap is TakeOrdered, never a full-vocab sort") {
    val p = finalPlan(SparkEntry.q170(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), s"vocab head is not top-k:\n$p")
  }

  test("q160 curation pipeline: benchmark side broadcasts, sample is TakeOrdered") {
    val p = finalPlan(SparkEntry.q160(spark, dir))
    // decontamination: the benchmark shingle set must broadcast so the
    // corpus side never shuffles for the semi-join
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"), p)
    // the priority sample must plan as a distributed top-k, not a global
    // sort of the clean corpus
    assert(p.contains("TakeOrderedAndProject"), s"sample is not top-k:\n$p")
    // nothing in the chain degenerates to a cartesian product
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q182 portable IVF: centroids broadcast everywhere, corpus joins stay keyed") {
    val p = finalPlan(SparkEntry.q182(spark, dir))
    // both the assignment argmax and the probe pruning join the tiny
    // centroid table by broadcast — the corpus never shuffles for them
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    // the probed-list join (candidates) is an equi-join on centroid_id,
    // never a cartesian pair blow-up
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q183 closed-form ridge: global sums broadcast onto folds, errors re-join broadcast") {
    val p = finalPlan(SparkEntry.q183(spark, dir))
    // the 1-row global-sums frame and the k-row params frame both ride as
    // broadcasts — the data side shuffles only for its fold aggregation
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q187 ridge grid: grid and params ride as broadcasts, data scans stay keyed") {
    val p = finalPlan(SparkEntry.q187(spark, dir))
    // the |folds|x|grid| parameter frame joins the data by BROADCAST on
    // fold — the data side never shuffles for the grid fan-out, so grid
    // width multiplies per-row arithmetic only, not exchanges
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q188 portable SemDeDup: pair stage is centroid-keyed, never cartesian") {
    val p = finalPlan(SparkEntry.q188(spark, dir))
    // centroids broadcast for assignment; the within-cluster pair join is
    // an equi-join on centroid_id (n^2/nlist bounded), and the canonical
    // keep is an anti join — no cartesian blow-up anywhere
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("q189 IRLS trace: each step is one partial+final aggregate, no window, no sort") {
    import org.apache.spark.sql.functions.{col, lit}
    // audit ONE Newton step's aggregation plan (the trace assembly is a
    // driver-side tiny frame): the sufficient statistics must map-side
    // combine — a single-partition window or a global sort here would
    // serialize the 100 TB pass
    val d = Tables.load(spark, dir, "lineitem")
      .select(col("l_quantity").cast("double").as("x"),
        (col("l_returnflag") =!= "N").cast("double").as("y"))
    val p2 = lit(1.0) / (lit(1.0) +
      org.apache.spark.sql.functions.exp(-(lit(0.1) + lit(0.2) * col("x"))))
    val step = d.agg(
      graft.functions.Stats.dsum(col("y") - p2, 12).as("g0"),
      graft.functions.Stats.dsum(p2 * (lit(1.0) - p2) * col("x"), 12).as("swx"))
    val p = finalPlan(step)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
  }

  test("q193 portable PQ: codebook broadcasts, corpus never shuffles before the tiny profile agg") {
    val p = finalPlan(SparkEntry.q193(spark, dir))
    // the k-row codebook rides as a broadcast onto the exploded corpus;
    // the only exchanges are the per-(vector,subspace) argmin window key
    // and the m·k-group profile aggregation
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q194 boosted stumps: one candidate-stat aggregate per round, map-side combined") {
    import org.apache.spark.sql.functions.{col, lit, when}
    // audit ONE round's candidate-stat pass (the trace frame is tiny):
    // all 8 candidates' left-sums ride in a SINGLE HashAggregate — no
    // window, no sort, no per-candidate rescan
    val d = Tables.load(spark, dir, "lineitem")
      .select(col("l_quantity").cast("double").as("x1"),
        col("l_extendedprice").cast("double").as("y"))
    val r = col("y") - lit(100.0)
    val step = d.agg(
      graft.functions.Stats.dsum(when(col("x1") <= 10.0, r), 12).as("sl0"),
      graft.functions.Stats.dsum(when(col("x1") <= 20.0, r), 12).as("sl1"),
      graft.functions.Stats.dsum(r, 12).as("s"))
    val p = finalPlan(step)
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Sort "), p)
  }

  test("q198 winnowing: per-doc window + hash-keyed pair join, never cartesian") {
    val p = finalPlan(SparkEntry.q198(spark, dir))
    // fingerprint selection is a doc-partitioned window; the pair stage
    // is an equi-join on fp_hash with capped postings; top-k is
    // TakeOrdered, not a global sort
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrdered"), p)
  }

  test("q200 MLP forward: scoring scan is one projection into a 10-group aggregate") {
    val p = finalPlan(SparkEntry.q200(spark, dir))
    // the stats pass ran at build time (driver literals); the scoring
    // query itself must be scan → project → partial/final HashAggregate,
    // with no join, window, or sort anywhere
    assert(p.contains("HashAggregate"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert(hasCodegenStage(p), p)
  }

  test("q203 Gaussian NB: join-free scoring scan — params fold in as literals") {
    val p = finalPlan(SparkEntry.q203(spark, dir))
    assert(!p.contains("Join"), "NB scoring must not join the params:\n" + p)
    // only the split key, class, and the two features are read
    assert(!p.contains("l_extendedprice") && !p.contains("l_shipdate"),
      "scan reads columns the query never uses")
  }

  test("q204 chi2 tokens: pruned scan, broadcast class totals, no shuffle of the token stream beyond the two aggregations") {
    val p = finalPlan(SparkEntry.q204(spark, dir))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "class totals must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!p.contains("n_chars") && !p.contains("source"),
      "scan reads columns the query never uses")
  }

  test("q206 Bloom card: the filter broadcasts to the probe side") {
    val p = finalPlan(SparkEntry.q206(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"),
      "a <=mBits-row filter must broadcast, never shuffle-join:\n" + p)
    // the only nested-loop joins are the 1-row scalar-card crossJoins
    val finalSection = p.split("== Initial Plan ==").head
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(finalSection).length
    assert(bnlj <= 2, s"expected only the scalar-card cross joins:\n$p")
  }

  test("q210 correlation matrix: ONE scan, read schema pruned to the four measures") {
    val df = SparkEntry.q210(spark, dir)
    df.collect()
    // the sufficient-statistics pass is the only data access; its scan
    // reads exactly the four measure columns
    val agg = df.queryExecution.analyzed
    val scans = df.queryExecution.executedPlan.toString
    assert(!scans.contains("FileScan") ||
      (!scans.contains("l_orderkey") && !scans.contains("l_shipdate")),
      "scan reads columns the query never uses")
    assert(agg != null)
  }

  test("q212 perplexity: LM joins hash on the token, scalars stay 1-row crossjoins") {
    val p = finalPlan(SparkEntry.q212(spark, dir))
    // AQE's toString appends the pre-adaptive "Initial Plan" — audit only
    // the executed final section
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"),
      "the LM join must hash on the token:\n" + p)
    assert(!finalSection.contains("CartesianProduct"), p)
    assert(!finalSection.contains("SortMergeJoin"), p)
    // nested-loop joins only for the broadcast 1-row (N, V) scalar frame
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(finalSection).length
    assert(bnlj <= 2, s"expected only the scalar crossjoins:\n$p")
  }

  test("q216 incremental admission: band-store equi-join, no cartesian anywhere") {
    val p = finalPlan(SparkEntry.q216(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"), p)
    assert(!finalSection.contains("BroadcastNestedLoopJoin"),
      "admission must decide on the (band, band_hash) equi-join:\n" + p)
  }

  test("q218 re-randomization: the 64x explode collapses map-side before one shuffle") {
    val p = finalPlan(SparkEntry.q218(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    // partial_sum aggregates must appear below the exchange — the 64x
    // blow-up never crosses the wire
    assert(finalSection.contains("partial_count")
      || finalSection.contains("partial_sum"), p)
    assert(!finalSection.contains("CartesianProduct"), p)
  }

  test("q225 pair verification: hash joins only, distance stage after candidate pruning") {
    val p = finalPlan(SparkEntry.q225(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"), p)
    assert(!finalSection.contains("BroadcastNestedLoopJoin"),
      "text payloads must join the candidate frame by id:\n" + p)
    assert(finalSection.contains("levenshtein"),
      "the verification expression must be in the plan:\n" + p)
  }

  test("populationFeatures: sensor table shuffles at most twice, joins broadcast") {
    import spark.implicits._
    val sensor = (0 until 200).map(i =>
      (202050L + i % 4, java.sql.Timestamp.valueOf(
        f"2020-06-${1 + i % 28}%02d 00:00:00"), i * 1.0, 50.0 + i))
      .toDF("hive_id", "timestamp", "temperature", "humidity")
    val annots = Seq((2050L,
      java.sql.Timestamp.valueOf("2020-06-10 00:00:00"), 25.0))
      .toDF("hive_id", "date", "frames_of_bees")
    val df = graft.pipelines.HivePipelines.populationFeatures(
      sensor, annots, Seq("temperature", "humidity"), 7, 1, 0.0)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // exchanges: one tiny dedup for the hive-key pin, one partitioning for
    // the window+aggregate (reused, not repeated) — the fact table itself
    // streams through the broadcast joins without shuffling.
    // (AQE's toString appends the pre-adaptive "Initial Plan" — count only
    // the executed final section)
    val finalSection = p.split("== Initial Plan ==").head
    val nShuffles = "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nShuffles <= 2, s"expected <=2 shuffles, got $nShuffles:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q231 PII card: join-free, one aggregation shuffle, pruned scan") {
    val p = finalPlan(SparkEntry.q231(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("Join"),
      "the scrub is per-row + one aggregate; no join belongs here:\n" + p)
    val nShuffles =
      "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nShuffles <= 1,
      s"detection/redaction must be map-side; got $nShuffles shuffles:\n$p")
    assert(!p.contains("n_chars") && !p.contains("lang"),
      "scan reads columns the scrub never uses:\n" + p)
  }

  test("q232 NB classify: model joins broadcast, eval tokens shuffle only for the per-doc aggregate") {
    val p = finalPlan(SparkEntry.q232(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"),
      "the bounded |classes|x buckets model must broadcast:\n" + p)
    assert(!finalSection.contains("SortMergeJoin"),
      "no sort-merge join belongs in the scoring path:\n" + p)
    assert(!finalSection.contains("CartesianProduct"), p)
  }

  test("q238 span scrub: hash equi-joins only, coverage explodes dup starts not the corpus") {
    val p = finalPlan(SparkEntry.q238(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"), p)
    assert(!finalSection.contains("BroadcastNestedLoopJoin"),
      "every join keys on gram hash or (doc, position):\n" + p)
  }

  test("q239 DSIR: the bucket log-ratio model broadcasts to the doc stream") {
    val p = finalPlan(SparkEntry.q239(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"),
      "the bounded bucket-delta frame must broadcast:\n" + p)
    assert(!finalSection.contains("CartesianProduct"), p)
    // only the two 1-row LM-total scalar frames ride nested-loop joins
    val bnlj =
      "BroadcastNestedLoopJoin".r.findAllIn(finalSection).length
    assert(bnlj <= 2, s"expected only the scalar crossJoins:\n$p")
  }

  test("q246 LSH quality: candidate and truth chains stay equi-joins") {
    val p = finalPlan(SparkEntry.q246(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"),
      "no all-pairs stage may exist in either chain:\n" + p)
    // 1-row card aggregates combine via nested-loop crossJoins only
    val bnlj =
      "BroadcastNestedLoopJoin".r.findAllIn(finalSection).length
    assert(bnlj <= 3, s"expected only the card crossJoins:\n$p")
  }

  test("q248 packing card: the corpus window partitions by bucket — no " +
      "global single-partition window over the data") {
    val df = SparkEntry.q248(spark, dir)
    val p = finalPlan(df)
    val finalSection = p.split("== Initial Plan ==").head
    // the wide per-doc running sum must be keyed on the bucket column;
    // the only SinglePartition exchange allowed is for the tiny
    // per-bucket offsets frame + final card aggregate
    assert(finalSection.contains("Window"), p)
    val winLines = finalSection.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.exists(_.contains("__bkt")),
      "per-doc cumsum must partition by __bkt:\n" + p)
    assert(!finalSection.contains("CartesianProduct"), p)
  }

  test("q251/q256 cluster cards: centroids broadcast onto the corpus " +
      "scan, no sort-merge join of the embeddings") {
    for (q <- Seq(SparkEntry.q251(spark, dir),
        SparkEntry.q256(spark, dir))) {
      val p = finalPlan(q)
      val finalSection = p.split("== Initial Plan ==").head
      assert(finalSection.contains("BroadcastNestedLoopJoin") ||
        finalSection.contains("BroadcastHashJoin"),
        "the nlist-row centroid frame must broadcast:\n" + p)
      assert(!finalSection.contains("CartesianProduct"), p)
    }
  }

  test("q257 band sweep: every config chain is equi-join only (no " +
      "all-pairs anywhere)") {
    val p = finalPlan(SparkEntry.q257(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("CartesianProduct"),
      "no all-pairs stage may exist in any config chain:\n" + p)
  }

  test("q259 Mann-Whitney: prefix sums run per range-bucket, never one " +
      "global ordered window over distinct values") {
    val p = finalPlan(SparkEntry.q259(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    val winLines = finalSection.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.exists(_.contains("__bkt")),
      "value cumsum must partition by __bkt:\n" + p)
    assert(!finalSection.contains("CartesianProduct"), p)
  }

  test("q367 ordinal association: the cell self-join broadcasts — pair " +
      "counting is |cells|² work, never a row shuffle join") {
    val p = finalPlan(SparkEntry.q367(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastNestedLoopJoin") ||
      finalSection.contains("BroadcastHashJoin"),
      "cell pair join must broadcast the tiny cell frame:\n" + p)
    assert(!finalSection.contains("SortMergeJoin"),
      "no row-scale shuffle join in the pair count:\n" + p)
  }

  test("q357 AMS sketch: one hash aggregation over the exploded " +
      "(row, bucket) pairs — no join before the counter matrix") {
    val counters = graft.operators.SketchOps.amsCounters(
      Tables.load(spark, dir, "events")
        .filter(org.apache.spark.sql.functions.col("event_type").isNotNull)
        .select(org.apache.spark.sql.functions.concat_ws(":",
          org.apache.spark.sql.functions.col("user_id"),
          org.apache.spark.sql.functions.col("event_type")).as("k")),
      org.apache.spark.sql.functions.col("k"))
    val p = finalPlan(counters)
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("Join"),
      "counter build is scan → explode → aggregate, no join:\n" + p)
    val nShuffles =
      "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nShuffles <= 1,
      s"one partial+final aggregation only; got $nShuffles shuffles:\n$p")
  }

  test("q370 gap KS: the lag window is KEY-partitioned — no global " +
      "sort of the event stream") {
    val p = finalPlan(SparkEntry.q370(spark, dir))
    assert(p.contains("hashpartitioning(user_id"),
      "gaps must partition by key:\n" + p)
  }

  test("q380 KMV: the rank window runs over the DISTINCT (grp, hash) " +
      "frame and partitions by group") {
    val p = finalPlan(SparkEntry.q380(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("Window"),
      "per-group top-k must be a rank window:\n" + p)
    assert(finalSection.contains("hashpartitioning(grp"),
      "the rank window must partition by grp (spillable per-group " +
        "sort, never a global one):\n" + p)
    assert(!finalSection.contains("CartesianProduct"), p)
  }

  test("q385 Rocchio: both retrieval rounds broadcast the query side " +
      "against the corpus scan") {
    val p = finalPlan(SparkEntry.q385(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    val nBnl =
      "BroadcastNestedLoopJoin".r.findAllIn(finalSection).length
    assert(nBnl >= 2,
      s"rounds 1 and 2 must each broadcast queries x corpus; got $nBnl:\n$p")
    assert(!finalSection.contains("CartesianProduct"),
      "no unbroadcast cross product anywhere in the PRF plan:\n" + p)
  }

  test("q390 jackknife: the nation dimension broadcasts and the data " +
      "is scanned through ONE keyed aggregation") {
    val p = finalPlan(SparkEntry.q390(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("BroadcastHashJoin"),
      "customer dim must broadcast onto orders:\n" + p)
    assert(!finalSection.contains("SortMergeJoin"),
      "no row-scale shuffle join:\n" + p)
  }

  test("q381 Fisher exact: the tail explode hangs off a 1-row " +
      "aggregate — no row-scale join anywhere") {
    val p = finalPlan(SparkEntry.q381(spark, dir))
    val finalSection = p.split("== Initial Plan ==").head
    assert(finalSection.contains("Generate explode"),
      "the hypergeometric support must be a sequence explode:\n" + p)
    assert(!finalSection.contains("SortMergeJoin"),
      "margins/terms frames are 1-row; every join must broadcast:\n" + p)
  }

  test("q235 BPE encode: scoring scan is join-free up to the per-doc aggregate") {
    // encode with a FIXED merge table (the apply side alone — q235
    // itself trains first, which adds the q234 control-loop jobs)
    val df = graft.operators.BpeOps.bpeEncode(
      Tables.load(spark, dir, "documents"), "doc_id", "text",
      Seq(("e", "</w>"), ("s", "t")))
    val p = finalPlan(df)
    val finalSection = p.split("== Initial Plan ==").head
    assert(!finalSection.contains("Join"),
      "merge literals must fold into projections, never join:\n" + p)
    val nShuffles =
      "Exchange hashpartitioning".r.findAllIn(finalSection).length
    assert(nShuffles <= 1,
      s"encoding is stateless per-row; got $nShuffles shuffles:\n$p")
    assert(!p.contains("n_chars") && !p.contains("source"),
      "scan reads columns the encoder never uses:\n" + p)
  }
}
