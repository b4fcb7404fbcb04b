package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialize an sf1-equivalent copy of the full 10-table star schema:
  * `mult` id-offset copies of every fact table (the [[graft.Sf1Bench]]
  * synthesis, extended to the whole schema so the ENTIRE contract bench
  * can run against it). Offsets are applied consistently across tables —
  * each copy's orders reference that copy's customers, its lineitems that
  * copy's orders/parts/suppliers — so every join query sees a
  * referentially-intact 10× world, exactly how TPC-H scales facts while
  * nation/region stay fixed dimension tables.
  *
  * Copies must not be trivial duplicates of each other, or the dedup /
  * similarity families would measure planted-dup blow-up instead of
  * machinery scaling: document text gets a per-copy Caesar translation
  * (copies share almost no shingles) and embeddings get a per-copy cyclic
  * dimension shift (norm-preserving, so the vector distribution keeps its
  * shape while copies stop being near-dups).
  *
  * Usage: runMain graft.tools.ScaledDataGen <sfDir> <outDir> [mult=10]
  */
object ScaledDataGen {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir, mult) = args match {
      case Array(s, o) => (s, o, 10)
      case Array(s, o, m) => (s, o, m.toInt)
    }
    val cpus = sys.env.get("SPARK_GRAFT_CPUS").map(_.trim.toInt).getOrElse(16)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    writeAll(spark, sfDir, outDir, mult)
    spark.stop()
  }

  def writeAll(spark: SparkSession, sfDir: String, outDir: String,
      mult: Int): Unit = {
    def copies(base: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until mult).map(k => f(base, k)).reduce(_.unionByName(_))
    val K = 100000000L // fact-key offset per copy (TPC-H-ish key families)
    val alpha = "abcdefghijklmnopqrstuvwxyz"

    val out: Seq[(String, DataFrame)] = Seq(
      // dimensions don't scale (the TPC-H convention): one copy each
      "region" -> graft.Tables.load(spark, sfDir, "region"),
      "nation" -> graft.Tables.load(spark, sfDir, "nation"),
      "customer" -> copies(graft.Tables.load(spark, sfDir, "customer")) {
        (b, k) => b.withColumn("c_custkey", col("c_custkey") + lit(k * K)) },
      "supplier" -> copies(graft.Tables.load(spark, sfDir, "supplier")) {
        (b, k) => b.withColumn("s_suppkey", col("s_suppkey") + lit(k * K)) },
      "part" -> copies(graft.Tables.load(spark, sfDir, "part")) {
        (b, k) => b.withColumn("p_partkey", col("p_partkey") + lit(k * K)) },
      "orders" -> copies(graft.Tables.load(spark, sfDir, "orders")) {
        (b, k) => b
          .withColumn("o_orderkey", col("o_orderkey") + lit(k * K))
          .withColumn("o_custkey", col("o_custkey") + lit(k * K)) },
      "lineitem" -> copies(graft.Tables.load(spark, sfDir, "lineitem")) {
        (b, k) => b
          .withColumn("l_orderkey", col("l_orderkey") + lit(k * K))
          .withColumn("l_partkey", col("l_partkey") + lit(k * K))
          .withColumn("l_suppkey", col("l_suppkey") + lit(k * K)) },
      // the Sf1Bench event/document conventions, verbatim
      "events" -> copies(graft.Tables.events(spark, sfDir)) { (b, k) => b
        .withColumn("user_id", col("user_id") + lit(k * 10000000L))
        .withColumn("event_id", col("event_id") + lit(k * 1000000000L)) },
      "documents" -> copies(graft.Tables.load(spark, sfDir, "documents")) {
        (b, k) =>
          val shift = k % 26
          val mapped = alpha.drop(shift) + alpha.take(shift)
          b.withColumn("doc_id", col("doc_id") + lit(k * 10000000L))
            .withColumn("text", translate(col("text"), alpha, mapped)) },
      "embeddings" -> copies(graft.Tables.load(spark, sfDir, "embeddings")) {
        (b, k) =>
          val dim = 64
          val s = k % dim
          val emb =
            if (s == 0) col("embedding")
            else concat(slice(col("embedding"), s + 1, dim - s),
              slice(col("embedding"), 1, s))
          b.withColumn("vec_id", col("vec_id") + lit(k * 10000000L))
            .withColumn("embedding", emb) }
    )
    out.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      // fail fast if the synthesized table violates the schema contract
      graft.Tables.load(spark, outDir, name).head(1)
      println(s"[scaledgen] wrote $name x$mult")
    }
  }
}
