package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Flattened upper-triangle outer product of a vector with itself:
  * `upper_products(v)` returns `array<double>` of length d·(d+1)/2 with
  * the products v[i]·v[j] for i ≤ j in (i asc, j asc) order — the
  * per-row fan-out of a second-moment / covariance accumulation
  * (q183's OPQ rotation trains on Σ rv·rvᵀ / N).
  *
  * Replaces the interpreted nested-transform struct fan-out
  * (`flatten(transform(sequence, i -> transform(sequence, j ->
  * struct(i, j, rv[i]·rv[j]))))`) — d²/2 interpreted lambda evals and
  * struct allocations per row — with one tight loop; the caller
  * posexplodes and aggregates by position (partial map-side agg
  * collapses the shuffle to d²/2 rows per partition, guide §2.3).
  * Position p ↔ (i, j) via p = i·d − i·(i−1)/2 + (j − i). Nulls
  * throw — the sq_dist fail-loudly rule. */
case class UpperProducts(child: Expression) extends UnaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"upper_products expects a numeric array (float/double), got " +
        s"${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "upper_products"

  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any): Any =
    UpperProducts.compute(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.UpperProducts.compute($v, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): UpperProducts =
    copy(child = newChild)
}

object UpperProducts {
  def compute(v: ArrayData, isFloat: Boolean): GenericArrayData = {
    val d = v.numElements()
    val vals = new Array[Double](d)
    var i = 0
    while (i < d) {
      if (v.isNullAt(i)) {
        throw new IllegalArgumentException(
          s"upper_products: null element at position $i")
      }
      vals(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val out = new Array[Double](d * (d + 1) / 2)
    var p = 0
    i = 0
    while (i < d) {
      val vi = vals(i)
      var j = i
      while (j < d) {
        out(p) = vi * vals(j)
        p += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
