package graft.bench

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.SimilarityOps

/** Micro-benchmark: native fused cosine vs composable zip_with+aggregate.
  * Runs as a (tagged-slow) test so the ratio is recorded in CI output; the
  * assertion is deliberately loose (native must not be slower) — the point
  * is the measurement, printed for the bench log.
  */
class SimilarityMicroBench extends SparkSpec {
  import spark.implicits._

  test("native cosine is not slower than the composable formulation") {
    val dim = 64
    val n = 20000
    val vecs = spark.range(n).select(
      col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => pmod(xxhash64(col("id"), i), lit(1000L)).cast("double") / 500.0 - 1.0)
        .as("emb"))
      .cache()
    vecs.count()
    val q = vecs.filter(col("id") === 0).select(col("emb").as("q_emb"))

    def run(c: org.apache.spark.sql.Column): Long = {
      val t0 = System.nanoTime()
      vecs.crossJoin(broadcast(q))
        .select(sum(c).as("s")).collect()
      System.nanoTime() - t0
    }
    // warm both paths (codegen compile), then measure best-of-3
    val composable = col("emb")
    run(SimilarityOps.cosine(composable, col("q_emb")))
    run(SimilarityOps.cosineNative(composable, col("q_emb")))
    val tRef = (1 to 3).map(_ => run(SimilarityOps.cosine(composable, col("q_emb")))).min
    val tNat = (1 to 3).map(_ => run(SimilarityOps.cosineNative(composable, col("q_emb")))).min
    info(f"composable=${tRef / 1e6}%.1f ms native=${tNat / 1e6}%.1f ms " +
      f"speedup=${tRef.toDouble / tNat}%.2fx (n=$n, dim=$dim)")
    vecs.unpersist()
    assert(tNat <= tRef * 1.5, "native path regressed vs composable")
  }
}
