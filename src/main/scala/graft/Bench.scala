package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Bench main: the sequential per-query contract bench plus a 4-stream
  * concurrency section (a shared engine serves concurrent analysts; solo
  * timings hide driver-side contention from `.par` fits, control loops,
  * and scheduler queueing — the TPC-DS throughput-test idea at mini
  * scale).
  */
object Bench {

  /** Quick, shape-diverse queries for the concurrency streams: scans,
    * broadcast + shuffle joins, rollup/cube, dedup, text scoring, funnel,
    * drift, rank stats, SQL text. Each is sub-second solo, so 4 streams ×
    * the set bounds the added bench time while still mixing plan shapes.
    */
  private val streamSet: Seq[String] = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_join_revenue",
    "q11_dedup_exact", "q13_quality_score", "q25_distinct_count",
    "q54_rollup", "q77_cube", "q93_star_join", "q102_funnel",
    "q113_psi_drift", "q151_spearman", "q154_sql_star_join")

  /** Fixed 10-query host-noise canary: cheap, shape-diverse, run before
    * the first timed pass and again after every pass. Same-code canary
    * totals measured minutes apart expose the run's scheduling-noise
    * floor, so cross-round comparisons can be normalized MECHANICALLY
    * instead of argued by hand (this host has shown 1.25× same-code
    * median drift across rounds — the round-14 postmortem).
    */
  private val canarySet: Seq[String] = Seq(
    "q01_pricing_summary", "q02_filter_project", "q03_join_revenue",
    "q11_dedup_exact", "q13_quality_score", "q25_distinct_count",
    "q54_rollup", "q77_cube", "q93_star_join", "q102_funnel")
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // parse once so both the master URL and the JSON artifact are validated
    // (an unquoted non-numeric value would emit invalid JSON)
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(4)
    // shared engine configuration (EngineConf: codegen fallback + cache
    // sizing + UTC) — one definition site with Verify/Sf1Bench/
    // QueryProfile so the verified and timed paths match
    val spark = EngineConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      // FAIR scheduling so the concurrency section's streams share the
      // cores instead of FIFO-starving late submitters (no effect on the
      // single-threaded sequential section)
      .config("spark.scheduler.mode", "FAIR"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: touch every table once so first-scan + codegen setup cost
    // is not attributed to whichever query happens to run first. A bare
    // count() is NOT enough — parquet count pushdown answers it from
    // footers without reading a single data page, so whichever query
    // first scanned a cold table paid its full disk read (measured: q134
    // at 5.8 s cold vs 0.76 s warm — the round-8 "regression" cluster was
    // exactly this). Hashing every column forces the data pages through
    // the OS cache, making per-query timings comparable across rounds.
    // Per-table try/catch: one unreadable table must not zero the whole
    // artifact — its queries report -1 below, everything else still gets
    // timed. NonFatal only: an OutOfMemoryError means the JVM is
    // compromised and any timings after it would be fiction.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        try {
          val df = Tables.load(spark, sfDir, t)
          df.select(org.apache.spark.sql.functions.xxhash64(
              df.columns.map(org.apache.spark.sql.functions.col): _*).as("h"))
            .agg(org.apache.spark.sql.functions.sum(
              org.apache.spark.sql.functions.col("h"))).head()
          ()
        }
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] warm-up $t failed: ${e.getMessage}")
        }
      }
    // optional comma-separated query filter for load-controlled A/B runs
    // (SPARK_GRAFT_BENCH_QUERIES unset → the full contract bench)
    val wanted = sys.env.get("SPARK_GRAFT_BENCH_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = wanted match {
      case Some(ws) => SparkEntry.queries.filter { case (n, _) => ws(n) }
      case None => SparkEntry.queries
    }
    // a throwing query must be VISIBLE in the bench JSON: its time is
    // reported as -1 and its name lands in "failed" (a swallowed catch
    // would disguise a broken query as a normal timing entry).
    // Each entry also records its run index and start offset from bench
    // start: cross-round per-query comparisons need to distinguish a code
    // regression from a transient host-load window, and that diagnosis
    // requires knowing WHEN in the run each query executed.
    // SPARK_GRAFT_BENCH_REPEAT=N (default 1) runs the sequential section
    // N times and reports the per-query MEDIAN (plus min/max/spread per
    // query) — two same-code runs have measured 1.25× apart on this host,
    // so single-run cross-round comparisons are noise-limited; medians
    // are the auditable number.
    val repeat = sys.env.get("SPARK_GRAFT_BENCH_REPEAT")
      .map(_.trim.toInt).filter(_ >= 1).getOrElse(1)
    // single-pass mode gets one UNTIMED warm-up pass (opt out with
    // SPARK_GRAFT_BENCH_WARMUP=0): the table warm-up above covers disk
    // reads but not JIT — a cold single pass reads JIT-heavy queries up
    // to 3.7x high (q257: 37.4 s cold vs 10.1 s median), which poisons
    // cross-round comparison. Repeat mode skips it: the median already
    // absorbs the pass-1 JIT outlier. Cache is cleared after the warm-up
    // so persisted operator state can't serve the timed pass (the same
    // honesty rule as between repeat passes).
    val warmup = sys.env.get("SPARK_GRAFT_BENCH_WARMUP")
      .map(_.trim != "0").getOrElse(repeat == 1)
    if (warmup) {
      selected.foreach { case (name, fn) =>
        try { fn(spark, sfDir).count(); () }
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] warmup $name failed: ${e.getMessage}")
        }
      }
      spark.catalog.clearCache()
    }
    val canaryFns = canarySet.flatMap(n =>
      SparkEntry.queries.get(n).map(n -> _))
    // one timed canary sweep (sequential, warm tables): the per-run
    // TOTAL is the noise-floor sample; failures inside the canary are
    // reported as a 0-contribution (never abort the bench for it)
    def runCanary(): Double = {
      val t0 = System.nanoTime()
      canaryFns.foreach { case (name, fn) =>
        try { fn(spark, sfDir).count(); () }
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] canary $name failed: ${e.getMessage}")
        }
      }
      (System.nanoTime() - t0) / 1e9
    }
    val canaryRuns = scala.collection.mutable.ArrayBuffer[Double]()
    val seqStart = System.nanoTime()
    def runPass(pass: Int): Seq[(String, Double, Boolean, Int, Double)] =
      selected.toSeq.zipWithIndex.map { case ((name, fn), i) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).count(); true }
          catch { case NonFatal(e) =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        (name, if (ok) (System.nanoTime() - t0) / 1e9 else -1.0, ok,
          pass * selected.size + i, (t0 - seqStart) / 1e9)
      }
    // one UNTIMED canary sweep first: in repeat mode there is no global
    // warm-up pass, so the first timed canary would otherwise carry the
    // canary queries' JIT cost and overstate the noise floor ~3×
    // (measured at sf0.001: 8.9 s cold vs 3.0 s steady)
    runCanary()
    canaryRuns += runCanary()
    val passes = (0 until repeat).map { k =>
      // clear plan-matched cache entries between passes: operators that
      // persist their inputs (LSH sweep signatures, ingest wave stores)
      // would otherwise serve passes 2..N from pass 1's cache and the
      // median would measure a cache hit, not the query (measured: q257
      // 14.2 s cold vs 0.8 s cached)
      if (k > 0) spark.catalog.clearCache()
      val p = runPass(k)
      canaryRuns += runCanary()
      p
    }
    val results = passes.head
    // per-query stats across passes; a query that failed in ANY pass
    // reports -1 (failures must stay visible, never averaged away)
    // true median: average of the two middle samples for even pass counts
    // (lower-middle alone would bias REPEAT=2/4 'medians' fast)
    def med(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.size % 2 == 1) s((s.size - 1) / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
    }
    val byName = selected.toSeq.map(_._1).map { name =>
      val ts = passes.map(_.find(_._1 == name).get)
      val ok = ts.forall(_._3)
      val times = ts.map(_._2)
      (name, ok,
        if (ok) med(times) else -1.0,
        if (ok) times.min else -1.0,
        if (ok) times.max else -1.0)
    }
    val qs = byName.map { case (k, _, m, _, _) => s"\"" + k + "\":" + m }
      .mkString("{", ",", "}")
    val statsJson = if (repeat == 1) "null" else byName.map {
      case (k, _, m, mn, mx) =>
        val spread = if (mn > 0) math.round(mx / mn * 1000) / 1000.0 else -1.0
        s"""\"$k\":{"median":$m,"min":$mn,"max":$mx,"spread":$spread}"""
    }.mkString("{", ",", "}")
    val order = passes.flatten.map { case (k, v, _, i, off) =>
      s"""{"q":"$k","run_index":$i,"start_offset_sec":${math.round(off * 1000) / 1000.0},"sec":$v}"""
    }.mkString("[", ",", "]")
    val failed = byName.collect { case (k, false, _, _, _) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = byName.collect { case (_, true, m, _, _) => m }.sum

    // ---- concurrency section: 4 streams over the mixed set -------------
    // Baseline = the same set once, single-threaded; each stream runs a
    // deterministic rotation of the set (TPC-DS throughput style) so the
    // streams never line up on the same query at once. Ratio ≈ n_streams
    // × one_stream / aggregate — how much of the solo throughput a shared
    // engine keeps under concurrency.
    // skipped on filtered A/B runs (SPARK_GRAFT_BENCH_QUERIES set) or
    // SPARK_GRAFT_BENCH_STREAMS=0
    val nStreams =
      if (wanted.isDefined) 0
      else sys.env.get("SPARK_GRAFT_BENCH_STREAMS")
        .map(_.trim.toInt).getOrElse(4)
    val streamFns = streamSet.flatMap(n =>
      SparkEntry.queries.get(n).map(n -> _))
    val concFailed = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def runStream(tag: String, fns: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)]): Double = {
      // each stream gets its own on-demand FAIR pool: the default pool
      // schedules FIFO internally, which would starve late streams
      spark.sparkContext.setLocalProperty("spark.scheduler.pool", tag)
      val t0 = System.nanoTime()
      try fns.foreach { case (name, fn) =>
        try fn(spark, sfDir).count()
        catch { case NonFatal(e) =>
          System.err.println(s"[bench] $tag/$name failed: ${e.getMessage}")
          concFailed.add(s"$tag/$name")
        }
      }
      // clear the inheritable thread-local so a reused worker thread
      // doesn't silently keep running in this stream's pool
      finally spark.sparkContext.setLocalProperty("spark.scheduler.pool", null)
      (System.nanoTime() - t0) / 1e9
    }
    val concJson = if (nStreams <= 0 || streamFns.isEmpty) "null" else {
      val oneStream = runStream("solo", streamFns)
      val t0c = System.nanoTime()
      import scala.collection.parallel.CollectionConverters._
      val streamTimes = (0 until nStreams).par.map { s =>
        val rotated = streamFns.drop(s % streamFns.size) ++
          streamFns.take(s % streamFns.size)
        runStream(s"stream$s", rotated)
      }.toList
      val aggregate = (System.nanoTime() - t0c) / 1e9
      val ratio = nStreams * oneStream / aggregate
      s"""{"n_streams":$nStreams,"stream_queries":${streamFns.size},""" +
      s""""one_stream_sec":$oneStream,""" +
      s""""streams_sec":${streamTimes.mkString("[", ",", "]")},""" +
      s""""aggregate_sec":$aggregate,"throughput_ratio":$ratio,""" +
      s""""failed":${concFailed.toArray.map(f => "\"" + f + "\"").mkString("[", ",", "]")}}"""
    }

    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // canary block: per-run totals of the fixed 10-query sweep (run
    // repeat+1 times, interleaved with the passes) plus the spread —
    // the run's own host-noise floor, so cross-round deltas can be
    // normalized mechanically (a 1.2× canary spread says 1.2× query
    // movement is noise, not regression)
    val canarySpread =
      if (canaryRuns.min > 0) math.round(canaryRuns.max / canaryRuns.min * 1000) / 1000.0
      else -1.0
    val canaryJson =
      s"""{"queries":${canarySet.map(q => "\"" + q + "\"").mkString("[", ",", "]")},""" +
      s""""runs_sec":${canaryRuns.map(t => math.round(t * 1000) / 1000.0).mkString("[", ",", "]")},""" +
      s""""spread":$canarySpread}"""
    // the stdout line gets scraped (and sometimes truncated) by harnesses —
    // also write the full record as a machine-readable artifact so bench
    // runs diff cleanly round over round
    val artifact = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "bench_results.json")
    val cfg = s"""{"cpus":$cpus,"shuffle_partitions":$cpus,""" +
      s""""spark_version":"${spark.version}","n_queries":${results.size},""" +
      s""""repeat":$repeat}"""
    val record =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","config":$cfg,"failed":$failed,"concurrency":$concJson,"canary":$canaryJson,"query_stats":$statsJson,"order":$order,"queries":$qs}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(artifact),
      record.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // repeat-mode runs ALSO land at a stable median-artifact name that a
    // later single-pass gate run (the driver writes bench_results.json,
    // repeat:1) can never shadow — the committed median-of-N protocol
    // survives the working tree (round-14 verdict nit)
    if (repeat >= 2 && artifact == "bench_results.json")
      java.nio.file.Files.write(
        java.nio.file.Paths.get("bench_median.json"),
        record.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
