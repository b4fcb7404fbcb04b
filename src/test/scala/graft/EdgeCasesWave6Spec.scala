package graft

import org.apache.spark.sql.functions._
import graft.operators.{LayoutOps, SplitOps}

class EdgeCasesWave6Spec extends SparkSpec {
  import spark.implicits._

  test("prioritySample: ids differing by the first prime do NOT share a draw") {
    // the round-4 advice defect: a single-round draw collapses to
    // id mod 1000003, so (i, i + 1000003) pairs alias and the id
    // tie-break always picks the smaller — the sample of a 50/50 mix
    // would be EXACTLY the small ids. The second round folds id div p1
    // back in, so large ids must appear in the sample.
    val p1 = 1000003L
    val ids = (1L to 100L) ++ (1L to 100L).map(_ + p1)
    val df = ids.map((_, 1.0)).toDF("id", "w")
    val picked = SplitOps.prioritySample(df, "id", "w", 100)
      .collect().map(_.getLong(0)).toSet
    assert(picked.size == 100)
    assert(picked.exists(_ > p1),
      "no id above the prime selected - draws still alias mod p1")
    assert(picked.exists(_ <= 100L))
  }

  test("compactDatePartitioned: source without partition dirs yields an empty report") {
    val root = java.nio.file.Files.createTempDirectory("graft_compact_empty")
    try {
      // a bare directory with a stray file, no date partitions
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$root/readme.txt"), "not a partition")
      val rep = LayoutOps.compactDatePartitioned(spark, root.toString,
        s"$root/out", "event_date", 1L << 20)
      assert(rep.isEmpty)
    } finally graft.tools.FsUtils.deleteRecursively(root)
  }

  test("contentFingerprint: layout-invariant, row-change-sensitive, null-safe") {
    import graft.operators.ProfileOps
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("id", "v")
    def fp(d: org.apache.spark.sql.DataFrame) =
      ProfileOps.contentFingerprint(d, Seq("id", "v")).head()
    val base = fp(df)
    assert(base.getLong(0) == 1000L)
    // partitioning and row order are invisible — the replica-compare
    // property
    assert(fp(df.repartition(7)) == base)
    assert(fp(df.orderBy(col("v").desc)) == base)
    // any single-row difference changes the fingerprint
    val tampered = df.withColumn("v",
      when(col("id") === 500L, lit("vX")).otherwise(col("v")))
    assert(fp(tampered).getString(1) != base.getString(1))
    assert(fp(df.limit(999)).getString(1) != base.getString(1))
    // nulls hash via the sentinel, no crash, and differ from absence
    val withNull = (1L to 3L).map(i =>
      (i, if (i == 2L) null else s"v$i")).toDF("id", "v")
    assert(fp(withNull).getLong(0) == 3L)
  }

  test("boilerplateNgrams: empty corpus and all-short corpus yield empty results") {
    import graft.operators.TextOps
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.boilerplateNgrams(empty, "doc_id", "text", 3, 10).count() == 0)
    val short = Seq((1L, "just two"), (2L, "also two")).toDF("doc_id", "text")
    assert(TextOps.boilerplateNgrams(short, "doc_id", "text", 3, 10).count() == 0)
  }

  test("embeddingDiversity: empty input yields one all-null card, single vector zero diversity") {
    import graft.operators.ProfileOps
    val empty = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    val r0 = ProfileOps.embeddingDiversity(empty, "embedding").head()
    // global aggregate over zero dimension rows: one row, null stats —
    // never a crash (the SQL oracle convention for empty aggregates)
    assert(r0.isNullAt(0) && r0.getLong(1) == 0L)
    val one = Seq((1L, Seq(3.0, 4.0))).toDF("vec_id", "embedding")
    val r1 = ProfileOps.embeddingDiversity(one, "embedding").head()
    assert(r1.getAs[Long]("n_vecs") == 1L)
    assert(approx(r1.getAs[Double]("mean_sq_norm"), 25.0))
    // a single vector IS the mean: zero diversity
    assert(math.abs(r1.getAs[Double]("mean_pair_sq_dist")) < 1e-9)
  }

  test("gbtEarlyStopTrace: tiny input still yields a usable trace") {
    val df = (1L to 20L).map(i => (i, (i % 4).toDouble, (i % 4) * 2.0))
      .toDF("id", "x", "y")
    val trace = graft.ml.MlPipelines.gbtEarlyStopTrace(
      df, "id", Seq("x"), "y", maxIter = 5, tol = 0.0)
    val rows = trace.orderBy("iteration").collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(r => !r.getDouble(1).isNaN))
  }

  test("kAnonymityCard: hand-computed group sizes and below-k fraction") {
    import spark.implicits._
    // groups: (a,x)=3 rows, (a,y)=1, (b,x)=2 → below k=3: 1+2=3 of 6
    val df = Seq(("a", "x"), ("a", "x"), ("a", "x"), ("a", "y"),
      ("b", "x"), ("b", "x")).toDF("q1", "q2")
    val r = graft.operators.ProfileOps
      .kAnonymityCard(df, Seq("q1", "q2"), 3L).head()
    assert(r.getAs[Long]("n_rows") == 6L)
    assert(r.getAs[Long]("n_groups") == 3L)
    assert(r.getAs[Long]("min_group_size") == 1L)
    assert(r.getAs[Long]("n_rows_below_k") == 3L)
    assert(r.getAs[Double]("frac_below_k") == 0.5)
    assert(r.getAs[Long]("k") == 3L)
    // fully k-anonymous data reports zero exposure
    val safe = graft.operators.ProfileOps
      .kAnonymityCard(df, Seq("q1"), 3L).head()
    assert(safe.getAs[Long]("n_rows_below_k") == 2L) // b has only 2 rows
  }

  test("correlationMatrix: exact ±1 on linear columns, null on constant") {
    import spark.implicits._
    val df = (1 to 50).map { i =>
      (i.toDouble, 2.0 * i + 3.0, -1.5 * i + 10.0, 7.0)
    }.toDF("x", "y2x", "yneg", "konst")
    val r = graft.operators.ProfileOps
      .correlationMatrix(df, Seq("x", "y2x", "yneg", "konst"))
      .collect()
      .map(row => (row.getString(0), row.getString(1)) -> row).toMap
    assert(r(("x", "y2x")).getAs[Double]("corr") == 1.0)
    assert(r(("x", "yneg")).getAs[Double]("corr") == -1.0)
    assert(r(("y2x", "yneg")).getAs[Double]("corr") == -1.0)
    // zero-variance column: correlation undefined → null, never NaN
    val kr = r(("x", "konst"))
    assert(kr.isNullAt(kr.fieldIndex("corr")))
    assert(r.values.forall(_.getAs[Long]("n") == 50L))
  }
}
