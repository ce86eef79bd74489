package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two numeric vectors as one codegen expression — the
  * query-side fold of the PQ/ADC paths (`dt` entries, the residual qc
  * term, query norms via vec_dot(v, v)), replacing the interpreted
  * `aggregate(zip_with(a, b, CAST·CAST), 0.0, +)` HOF chain. Numeric
  * contract (the SqDist posture): every element widens to double, one
  * left-to-right fold of products from 0.0 — the identical IEEE
  * sequence as the HOF form and the oracle's list_reduce, so distance
  * tables and rank cuts cannot move. Mismatched lengths / null
  * elements throw (the HOF propagated NULL — malformed vectors must
  * not score at all). */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects numeric arrays (float/double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.VecDot.compute($x, $y, " +
        s"${isFloat(left.dataType)}, ${isFloat(right.dataType)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  def compute(x: ArrayData, y: ArrayData,
      xFloat: Boolean, yFloat: Boolean): Double = {
    val n = x.numElements()
    if (y.numElements() != n) {
      throw new IllegalArgumentException(
        s"vec_dot: mismatched vector lengths ($n vs ${y.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"vec_dot: null element at position $i")
      }
      val a = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += a * b
      i += 1
    }
    acc
  }
}
