package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Squared L2 distance between two numeric vectors — the inner loop of
  * every product-quantizer ENCODE (per (vector, subspace) the nearest
  * codebook slice by ‖sv − cv‖², K evaluations each): a native codegen
  * expression for the same reason as [[PqAdc]] — Catalyst higher-order
  * functions run an interpreted lambda per element, and the residual
  * encode (q180, K=64) pays |corpus|·subspaces·K evaluations, where the
  * HOF form measured ~2.5× the DuckDB twin (BENCH_PAIR_DETAIL r19
  * first capture).
  *
  * Numeric contract: every element widens to double (exact for float
  * inputs), one left-to-right fold of (a−b)² — the identical IEEE
  * sequence as the `aggregate(zip_with(...))` HOF it replaces and the
  * oracle's list_reduce, so encode argmin cuts cannot move between
  * engines. Accepts float or double element types per side
  * independently (raw PQ slices are float, residual slices double). */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    // containsNull element TYPES stay accepted (zip_with/transform
    // outputs are nullable by schema even when no element ever is);
    // an actual null ELEMENT throws in compute() — see below
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq_dist expects numeric arrays (float/double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dist"

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    SqDist.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.SqDist.compute($x, $y, " +
        s"${isFloat(left.dataType)}, ${isFloat(right.dataType)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  def compute(x: ArrayData, y: ArrayData,
      xFloat: Boolean, yFloat: Boolean): Double = {
    val n = x.numElements()
    if (y.numElements() != n) {
      // fail loudly (the pq_adc posture): a prefix-only distance would
      // silently pick different argmin winners than the NULL-propagating
      // HOF form on malformed input
      throw new IllegalArgumentException(
        s"sq_dist: mismatched vector lengths ($n vs ${y.numElements()})")
    }
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) {
        // fail loudly too: the replaced HOF propagated NULL, which the
        // null-first ASC encode window would rank FIRST — a silent
        // wrong winner; malformed vectors must not encode at all
        throw new IllegalArgumentException(
          s"sq_dist: null element at position $i")
      }
      val a = if (xFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val b = if (yFloat) y.getFloat(i).toDouble else y.getDouble(i)
      val d = a - b
      acc += d * d
      i += 1
    }
    acc
  }
}
