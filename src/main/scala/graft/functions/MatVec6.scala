package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dense matrix–vector product with the 6dp canonical rounding, as one
  * codegen expression: `mat_vec6(rflat, v)` where `rflat` is the
  * row-major flattened rotation matrix (|rflat| = rows·|v|) returns
  * `array<double>` with out[i] = round(Σ_j rflat[i·|v|+j]·v[j] + 1e-9, 6).
  *
  * This is the OPQ rotation apply (q183): the HOF form
  * (`transform(sequence(...), i -> round(aggregate(zip_with(...))))`)
  * runs interpreted lambda-per-element — N·d² interpreted multiply-adds
  * over the corpus (the one interpreted hot path the round-20 sweep
  * flagged). Numeric contract: identical left-to-right fold from 0.0 in
  * j-order, each element widened to double, then the identical
  * `round(x + 1e-9, 6)` canonicalization — Spark's Round(HALF_UP on
  * scala BigDecimal.decimal) replayed verbatim (MatVecSpec pins exact
  * equality against the HOF form), so both engines keep quantizing
  * bit-identical rotated inputs. Nulls/malformed lengths throw — the
  * sq_dist fail-loudly rule. */
case class MatVec6(left: Expression, right: Expression)
    extends BinaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"mat_vec6 expects numeric arrays (float/double), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec6"

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(r: Any, v: Any): Any =
    MatVec6.compute(r.asInstanceOf[ArrayData], v.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (r, v) =>
      s"${ev.value} = graft.functions.MatVec6.compute($r, $v, " +
        s"${isFloat(left.dataType)}, ${isFloat(right.dataType)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MatVec6 =
    copy(left = newLeft, right = newRight)
}

object MatVec6 {
  /** The 6dp HALF_UP canonicalization — Spark's Round(d, 6) semantics
    * (scala BigDecimal.decimal == java BigDecimal.valueOf), the same
    * code path as SimilarityOps.round6. */
  @inline private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double = {
    if (a.isNullAt(i)) {
      throw new IllegalArgumentException(
        s"mat_vec6: null element at position $i")
    }
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  }

  def compute(r: ArrayData, v: ArrayData,
      rFloat: Boolean, vFloat: Boolean): GenericArrayData = {
    val d = v.numElements()
    val rn = r.numElements()
    if (d == 0 || rn % d != 0) {
      throw new IllegalArgumentException(
        s"mat_vec6: |rflat|=$rn must be a positive multiple of |v|=$d")
    }
    val rows = rn / d
    val out = new Array[Double](rows)
    var i = 0
    while (i < rows) {
      val off = i * d
      var acc = 0.0
      var j = 0
      while (j < d) {
        acc += get(r, off + j, rFloat) * get(v, j, vFloat)
        j += 1
      }
      out(i) = round6(acc + 1e-9)
      i += 1
    }
    new GenericArrayData(out)
  }
}
