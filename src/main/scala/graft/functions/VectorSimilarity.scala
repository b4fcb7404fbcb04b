package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/** Fused single-pass vector similarity over two array columns.
  *
  * The composable formulation (`zip_with` + `aggregate`, see
  * [[graft.operators.SimilarityOps.cosine]]) materializes an intermediate
  * product array and evaluates a lambda per element; for cosine it scans
  * each array three times (dot, ‖a‖, ‖b‖). This native expression computes
  * dot product and both norms in ONE loop with primitive accumulators and
  * participates in whole-stage codegen via [[doGenCode]] — the form a
  * 100 TB ANN scan needs (brute-force cosine is pure per-row compute; the
  * inner loop IS the workload).
  *
  * Numerics are identical to the composable form: elements widen to double,
  * accumulation is sequential left-to-right, so results are bit-equal and
  * oracle-stable. Null inputs → null; for cosine a zero-norm side → null
  * (no NaN leakage). Null elements are skipped (that dimension drops out —
  * embeddings are dense so this never fires in practice); mismatched
  * lengths take the common prefix.
  */
abstract class VectorSimilarityBase extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** cosine = dot / (‖a‖·‖b‖); dot = plain inner product. */
  protected def isCosine: Boolean

  private def elemGetter(dt: DataType, arr: String, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double> arguments, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  private def elemDouble(dt: DataType, arr: ArrayData, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = elemDouble(left.dataType, a, i)
        val y = elemDouble(right.dataType, b, i)
        dot += x * y
        na += x * x
        nb += y * y
      }
      i += 1
    }
    if (!isCosine) dot
    else {
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) null else dot / denom
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val loop =
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.isNullAt($i) || $b.isNullAt($i)) continue;
           |  double $x = ${elemGetter(left.dataType, a, i)};
           |  double $y = ${elemGetter(right.dataType, b, i)};
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |""".stripMargin
      if (!isCosine) s"$loop${ev.value} = $dot;"
      else
        s"""
           |$loop
           |double ${ev.value}_denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
           |if (${ev.value}_denom == 0.0) { ${ev.isNull} = true; }
           |else { ${ev.value} = $dot / ${ev.value}_denom; }
           |""".stripMargin
    })
}

/** `vec_cosine(a, b)` — cosine similarity, fused single pass, codegen'd. */
case class CosineSim(left: Expression, right: Expression)
    extends VectorSimilarityBase {
  override protected def isCosine: Boolean = true
  override def prettyName: String = "vec_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `vec_dot(a, b)` — inner product, fused single pass, codegen'd. */
case class DotProduct(left: Expression, right: Expression)
    extends VectorSimilarityBase {
  override protected def isCosine: Boolean = false
  override def prettyName: String = "vec_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
