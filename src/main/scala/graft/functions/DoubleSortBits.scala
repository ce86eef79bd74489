package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Order-preserving IEEE-754 bit image of a double: a LONG whose SIGNED
  * order equals the double's numeric/sort order (-Inf < finite < +Inf <
  * NaN — matching both Spark's and DuckDB's NaN-last sort contract).
  * Positives keep their raw bit pattern; negatives flip every bit below
  * the sign so larger magnitudes order lower. `shiftright(bits, s)` then
  * yields a deterministic, monotone, DATA-INDEPENDENT bucket key whose
  * resolution is relative (per-exponent), making histogram bucketing
  * immune to outliers — one 1e300 row cannot collapse an equi-width
  * histogram's useful range (the classic failure of min/max-scaled
  * bucketing). Used by the q71 histogram-refinement selection
  * (ProfileOps.featureBins). NOTE: -0.0 and +0.0 have distinct images —
  * normalize (`val + 0.0d`) before calling when the caller treats them
  * as equal. */
case class DoubleSortBits(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"double_sort_bits expects double, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "double_sort_bits"

  override def nullSafeEval(v: Any): Any =
    DoubleSortBits.compute(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.DoubleSortBits.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): DoubleSortBits =
    copy(child = newChild)
}

object DoubleSortBits {
  // doubleToLongBits (not Raw) canonicalizes every NaN payload to one image
  def compute(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b >= 0L) b else b ^ 0x7fffffffffffffffL
  }
}
