package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1-equivalent bench of the heavy operator families (dedup, retrieval,
  * streaming, layout). No sf1 testdata ships with the harness, so the
  * corpus is synthesized as 10 id-offset copies of sf0.1 — text copies get
  * a per-copy Caesar translation (copies are not near-dups of each other),
  * event/lineitem copies shift their key spaces. Each family is timed at
  * 1× and 10× after a warm-up pass; the JSON line (stdout) is the
  * committed artifact. Interpreting the ratios: for the row-expanding
  * families (exact dedup, minhash candidates, tfidf, cdc) OUTPUT rows grow
  * ~10×, so a near-linear engine shows time-ratio well under 10 (fixed
  * overhead amortizes) and quadratic machinery blows far past it; for the
  * aggregate-output families (bm25 top-k, zone-map report, finalized
  * windows) output is capped by construction and the ratio only bounds the
  * scan+aggregate pass — their per-row cost is additionally pinned
  * near-linear by the row-expanding families sharing the same scan shapes.
  */
object Sf1Bench {
  private def timed(f: => Long): (Double, Long) = {
    val t0 = System.nanoTime()
    val n = f
    ((System.nanoTime() - t0) / 1e9, n)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(32)
    val spark = EngineConf.common(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def docs(mult: Int): DataFrame = {
      val base = Tables.load(spark, sfDir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      // per-copy Caesar translation of the letters: copies of one text
      // share (almost) NO character shingles, so minhash/jaccard output
      // grows ~mult× (copies are not near-dups of each other) — a pure
      // rotation would leave copies shingle-identical and conflate
      // genuine pair blow-up with machinery scaling
      val alpha = "abcdefghijklmnopqrstuvwxyz"
      (0 until mult).map { k =>
        val shift = k % 26
        val mapped = alpha.drop(shift) + alpha.take(shift)
        base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          translate(col("text"), alpha, mapped).as("text"),
          col("source"))
      }.reduce(_.unionByName(_))
    }
    def events(mult: Int): DataFrame = {
      val base = Tables.events(spark, sfDir)
      (0 until mult).map(k =>
        base.withColumn("user_id", col("user_id") + lit(k * 10000000L))
          .withColumn("event_id", col("event_id") + lit(k * 1000000000L)))
        .reduce(_.unionByName(_))
    }
    def lineitem(mult: Int): DataFrame = {
      val base = Tables.load(spark, sfDir, "lineitem")
      (0 until mult).map(k =>
        base.withColumn("l_orderkey", col("l_orderkey") + lit(k * 100000000L)))
        .reduce(_.unionByName(_))
    }

    // parquet-materialize each scale so every family reads a real file
    // scan (the streaming family REQUIRES a directory), not an in-memory
    // union plan — the fair analog of a 10×-bigger table on disk
    val root = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_TMP_ROOT", System.getProperty("java.io.tmpdir"))),
      "graft_sf1_")
    try {
      for ((name, df1, df10) <- Seq(
          ("documents", docs(1), docs(10)),
          ("events", events(1), events(10)),
          ("lineitem", lineitem(1), lineitem(10)))) {
        df1.write.parquet(s"$root/x1/$name.parquet")
        df10.write.parquet(s"$root/x10/$name.parquet")
      }
      import graft.operators.{DedupOps, LayoutOps, TextOps}
      def suite(scale: String): Map[String, (Double, Long)] = {
        val d = spark.read.parquet(s"$root/$scale/documents.parquet")
        val e = spark.read.parquet(s"$root/$scale/events.parquet")
        val li = spark.read.parquet(s"$root/$scale/lineitem.parquet")
        Map(
          "dedup_minhash_lsh" -> timed(
            DedupOps.candidatePairs(
              DedupOps.lshBands(
                DedupOps.minhashSignatures(d, "doc_id", "text", 3, 16),
                "doc_id", 16, 4), "doc_id").count()),
          "dedup_exact" -> timed(
            DedupOps.exactGroups(d, "text", "doc_id").count()),
          "retrieval_bm25" -> timed(
            TextOps.bm25TopDocs(d, "doc_id", "text",
              Seq("the", "data", "model"), 20).count()),
          "retrieval_tfidf" -> timed(
            TextOps.tfIdfTopTerms(d, "doc_id", "text", 3).count()),
          // events were written by Spark as a DIRECTORY of part files —
          // stream from that directory with a part-file glob (the single-
          // file testdata convention does not apply to written output)
          "streaming_windowed" -> timed(
            graft.streaming.StreamingOps.windowedEventStats(
              spark, s"$root/$scale/events.parquet", "*.parquet", "ts",
              "event_type", "value", "1 day", "1 day",
              graft.streaming.StreamSink.Memory(
                s"sf1_${scale}_${System.nanoTime()}"),
              prepare = Tables.normalizeEventTs).count()),
          "streaming_cdc" -> timed(
            graft.operators.CdcOps.compactLatest(e,
              Seq("user_id"), Seq("ts", "event_id")).count()),
          "layout_zorder" -> timed(
            LayoutOps.zoneMapSkipping(li, "l_partkey", "l_suppkey",
              files = 64, xLo = 100L, xHi = 1500L, yLo = 2L, yHi = 5L)
              .count()))
      }
      suite("x1") // warm-up: codegen + file-source listing
      val s1 = suite("x1")
      val s10 = suite("x10")
      val fams = s1.keys.toSeq.sorted
      val js = fams.map { k =>
        val ratio = s10(k)._1 / math.max(1e-9, s1(k)._1)
        s""""$k":{"x1_sec":${s1(k)._1},"x1_rows":${s1(k)._2},""" +
          s""""x10_sec":${s10(k)._1},"x10_rows":${s10(k)._2},""" +
          s""""time_ratio":$ratio}"""
      }.mkString("{", ",", "}")
      println(s"""{"metric":"sf1_families","base_sf":"$sfDir","mult":10,""" +
        s""""families":$js}""")
    } finally {
      graft.tools.FsUtils.deleteRecursively(root)
      spark.stop()
    }
  }
}
