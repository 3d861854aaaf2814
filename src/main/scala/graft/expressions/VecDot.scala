package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product of two float vectors.
  *
  * The HOF formulation — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` —
  * allocates an intermediate array and boxes through the lambda for
  * every pair; in a pairwise-similarity join that projection IS the hot
  * path. This expression evaluates the same sequential left fold
  * (double accumulator, elementwise float->double cast, identical IEEE
  * op order — results are bit-equal to the HOF and to DuckDB's
  * list_sum(list_transform(list_zip(...)))) as a tight loop inside
  * whole-stage codegen, no allocation.
  *
  * Contract: both arrays non-null, same length, no null elements (the
  * embedding-column shape). Extra trailing elements on either side are
  * ignored (min-length fold).
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isFloatArray(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires two array<float> arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VecDot.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Sequential left fold; called from interpreted eval and codegen. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}
