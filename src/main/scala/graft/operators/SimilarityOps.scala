package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Random-hyperplane LSH signature: sign bits of dot products with
    * `numPlanes` pseudo-random hyperplanes derived deterministically from
    * xxhash64(planeIdx, dimIdx). Vectors in the same bucket are ANN
    * candidates; at 100 TB the all-pairs search becomes a bucket equi-join.
    */
  def hyperplaneSignature(vec: Column, dim: Int, numPlanes: Int): Column = {
    val bits = (0 until numPlanes).map { p =>
      // plane component for dim i: hash → uniform in [-1, 1)
      val contrib = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (v, i) => v * (pmod(xxhash64(lit(p), i), lit(2000001L)) / 1000000.0 - 1.0)),
        lit(0.0), (acc, v) => acc + v)
      when(contrib >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_.bitwiseOR(_))
  }

  /** ANN candidate pairs via hyperplane-signature buckets. */
  def lshCandidates(embeddings: DataFrame, idCol: String, vecCol: String,
      dim: Int, numPlanes: Int): DataFrame = {
    val sig = embeddings.select(col(idCol),
      hyperplaneSignature(col(vecCol).cast("array<double>"), dim, numPlanes).as("sig"))
    val l = sig.select(col("sig"), col(idCol).as("id_a"))
    val r = sig.select(col("sig"), col(idCol).as("id_b"))
    l.join(r, "sig").filter(col("id_a") < col("id_b")).select("id_a", "id_b")
  }
}
