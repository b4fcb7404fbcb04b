package graft

import org.apache.spark.sql.functions._
import graft.operators.SimilarityOps

class VectorSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0, 2.0, 2.0), Seq(2.0, 0.0, 0.0)),
    (2L, Seq(0.5, -1.5, 3.25), Seq(-2.0, 4.5, 0.125)),
    (3L, Seq(1e-3, 1e3, -1e-3), Seq(1e3, 1e-3, 1e3)),
  ).toDF("id", "a", "b")

  test("native cosine/dot are bit-identical to the composable formulation") {
    val r = vecs.select(
      SimilarityOps.cosine($"a", $"b").as("c_ref"),
      SimilarityOps.cosineNative($"a", $"b").as("c_nat"),
      SimilarityOps.dot($"a", $"b").as("d_ref"),
      SimilarityOps.dotNative($"a", $"b").as("d_nat")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) == row.getDouble(1)) // exact, not approx
      assert(row.getDouble(2) == row.getDouble(3))
    }
  }

  test("float arrays widen per element like cast to array<double>") {
    val f = Seq((Seq(1.1f, 2.2f), Seq(3.3f, 4.4f))).toDF("a", "b")
    val nat = f.select(SimilarityOps.dotNative($"a", $"b")).head().getDouble(0)
    val ref = f.select(SimilarityOps.dot(
      $"a".cast("array<double>"), $"b".cast("array<double>"))).head().getDouble(0)
    assert(nat == ref)
  }

  test("zero-norm side yields null cosine, not NaN") {
    val z = Seq((Seq(0.0, 0.0), Seq(1.0, 2.0))).toDF("a", "b")
    assert(z.select(SimilarityOps.cosineNative($"a", $"b")).head().isNullAt(0))
  }

  test("null input yields null") {
    val n = Seq((None: Option[Seq[Double]], Some(Seq(1.0)))).toDF("a", "b")
    assert(n.select(SimilarityOps.cosineNative($"a", $"b")).head().isNullAt(0))
  }

  test("interpreted eval matches codegen (eval path exercised directly)") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val mk = (xs: Seq[Double]) =>
      Literal.create(ArrayData.toArrayData(xs.toArray), ArrayType(DoubleType, false))
    val e = graft.functions.CosineSim(mk(Seq(1.0, 2.0, 2.0)), mk(Seq(2.0, 0.0, 0.0)))
    assert(e.eval(null).asInstanceOf[Double] == 2.0 / 6.0)
  }

  test("vec_cosine / vec_dot are registered as SQL functions via extensions") {
    val df = Seq((Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    df.createOrReplaceTempView("vs_spec")
    val r = spark.sql(
      "SELECT vec_cosine(a, b) AS c, vec_dot(a, b) AS d FROM vs_spec").head()
    assert(r.getDouble(0) == 1.0 && r.getDouble(1) == 1.0)
  }
}
