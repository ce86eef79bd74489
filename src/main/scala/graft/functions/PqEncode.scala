package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Whole-vector product-quantizer encode as ONE codegen expression:
  * given a vector `v` (length d = subspaces·w), a same-length `base`
  * vector (the IVF centroid for residual coding; zeros for raw PQ) and
  * the FLATTENED codebook `cb` (s-major, slot-minor, each entry w wide:
  * cb[(s·K + slot)·w + i] = c_{s,slot}[i], K derived from |cb|), returns
  * `struct(codes array<int>, rnorm double)` — per subspace the nearest
  * (L2², slot-ascending tie) codebook entry, and
  * rnorm = √Σ_s ‖base_s + c_{s,code_s}‖² folded in s-order.
  *
  * This replaces the explode→broadcast-join→window→groupBy encode
  * pipeline (guide §2.3/§2.4: it materialized |corpus|·subspaces·K rows
  * through TWO exchanges — the (vec_id, s) argmin window and the
  * re-assembly groupBy); the same argmin is a per-row loop needing no
  * shuffle at all. Numeric contract (the SqDist/PqAdc posture): every
  * element widens to double; the per-slice distance is the identical
  * left-to-right (a−b)² fold as `sq_dist`; the n2 term is the identical
  * left-to-right (base+c)² fold; the rnorm sum folds in s-order from
  * 0.0 — bit-identical to the window/groupBy formulation and the DuckDB
  * oracle's list_reduce, so no argmin or rank cut can move. Argmin
  * comparison uses Spark's nan-safe double ordering (NaN ties last,
  * equal keeps the lower slot), matching the row_number window it
  * replaces. Malformed input (null element, non-divisible lengths)
  * throws — the sq_dist fail-loudly rule.
  */
case class PqEncode(first: Expression, second: Expression,
    third: Expression, subspaces: Int) extends TernaryExpression {
  private def elemOk(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(first.dataType) && elemOk(second.dataType) &&
        elemOk(third.dataType) && subspaces > 0)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects (array<float|double> v, array<float|double> " +
        s"base, array<float|double> cb, subspaces > 0), got " +
        s"(${first.dataType.simpleString}, ${second.dataType.simpleString}, " +
        s"${third.dataType.simpleString}, $subspaces)")
  override def dataType: DataType = PqEncode.OutType
  override def prettyName: String = "pq_encode"

  private def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, base: Any, cb: Any): Any =
    PqEncode.compute(v.asInstanceOf[ArrayData], base.asInstanceOf[ArrayData],
      cb.asInstanceOf[ArrayData], subspaces,
      isFloat(first.dataType), isFloat(second.dataType),
      isFloat(third.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, c) =>
      s"${ev.value} = graft.functions.PqEncode.compute($v, $b, $c, " +
        s"$subspaces, ${isFloat(first.dataType)}, " +
        s"${isFloat(second.dataType)}, ${isFloat(third.dataType)});")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): PqEncode =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object PqEncode {
  val OutType: StructType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false),
      nullable = false),
    StructField("rnorm", DoubleType, nullable = false)))

  @inline private def get(a: ArrayData, i: Int, isFloat: Boolean): Double = {
    if (a.isNullAt(i)) {
      // fail loudly (the sq_dist rule): a null element must not encode
      throw new IllegalArgumentException(
        s"pq_encode: null element at position $i")
    }
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
  }

  def compute(v: ArrayData, base: ArrayData, cb: ArrayData, subspaces: Int,
      vFloat: Boolean, baseFloat: Boolean, cbFloat: Boolean): InternalRow = {
    val d = v.numElements()
    if (base.numElements() != d) {
      throw new IllegalArgumentException(
        s"pq_encode: |base|=${base.numElements()} != |v|=$d")
    }
    if (d % subspaces != 0) {
      throw new IllegalArgumentException(
        s"pq_encode: |v|=$d not divisible by subspaces=$subspaces")
    }
    val w = d / subspaces
    val cbLen = cb.numElements()
    if (w == 0 || cbLen % d != 0 || cbLen == 0) {
      throw new IllegalArgumentException(
        s"pq_encode: |cb|=$cbLen must be a positive multiple of " +
          s"subspaces·w = $d")
    }
    val k = cbLen / d // entries per subspace
    val codes = new Array[Int](subspaces)
    var rsum = 0.0
    var s = 0
    while (s < subspaces) {
      val vOff = s * w
      var best = 0.0
      var bestSlot = -1
      var slot = 0
      while (slot < k) {
        val cOff = (s * k + slot) * w
        // identical left-to-right fold as sq_dist
        var acc = 0.0
        var i = 0
        while (i < w) {
          val a = get(v, vOff + i, vFloat)
          val b = get(cb, cOff + i, cbFloat)
          val diff = a - b
          acc += diff * diff
          i += 1
        }
        // nan-safe ascending pick, lower slot wins ties — the
        // (err2 ASC, slot ASC) row_number ordering
        val better = bestSlot < 0 || acc < best ||
          (java.lang.Double.isNaN(best) && !java.lang.Double.isNaN(acc))
        if (better) { best = acc; bestSlot = slot }
        slot += 1
      }
      codes(s) = bestSlot
      // n2 = ‖base_s + c_{s,best}‖², the identical (base+c)² fold;
      // rsum folds in s-order from 0.0 (the array_sort(collect_list)
      // re-assembly order)
      val cOff = (s * k + bestSlot) * w
      var n2 = 0.0
      var i = 0
      while (i < w) {
        val x = get(base, vOff + i, baseFloat) + get(cb, cOff + i, cbFloat)
        n2 += x * x
        i += 1
      }
      rsum += n2
      s += 1
    }
    new GenericInternalRow(Array[Any](new GenericArrayData(codes),
      math.sqrt(rsum)))
  }
}
