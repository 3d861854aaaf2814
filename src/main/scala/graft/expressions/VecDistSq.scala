package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native squared L2 distance between a float vector and a double
  * centroid (the k-means / PQ hot path).
  *
  * The HOF formulation —
  * `aggregate(zip_with(v, c, (x, y) => (x.cast(double) - y) * (...)),
  * 0.0, _+_)` — allocates an intermediate array and boxes through two
  * lambdas per element, and in the Lloyd assign step it runs K times
  * per corpus row inside a `transform` lambda (interpreted, no
  * codegen). This expression evaluates the same sequential left fold
  * (elementwise float→double cast, subtract, square, accumulate — the
  * identical IEEE op order, so results are bit-equal to the HOF and to
  * DuckDB's `list_sum(list_transform(list_zip(...)))` mirror) as a
  * tight loop, no allocation.
  *
  * Contract: both arrays non-null, same length, no null elements (the
  * embedding/centroid shape). Extra trailing elements on either side
  * are ignored (min-length fold), mirroring [[VecDot]].
  */
case class VecDistSq(left: Expression, right: Expression) extends BinaryExpression {

  private def is(t: DataType, elem: DataType) = t match {
    case ArrayType(e, _) => e == elem
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (is(left.dataType, FloatType) && is(right.dataType, DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dist_sq requires (array<float>, array<double>) arguments, got " +
        s"${left.dataType} and ${right.dataType}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dist_sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDistSq.distSq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VecDistSq.distSq($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDistSq =
    copy(left = newLeft, right = newRight)
}

object VecDistSq {
  /** Sequential left fold; called from interpreted eval and codegen. */
  def distSq(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }
}
