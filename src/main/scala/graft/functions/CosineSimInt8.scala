package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType}

/** Cosine similarity between two INT8-quantized vectors (q64's absmax
  * scheme: code = floor(x/amax·127 + 0.5)). Cosine is SCALE-INVARIANT,
  * so the per-vector amax factors cancel and the codes alone carry the
  * answer — no dequantization, no stored norms; the whole "4× fewer
  * bytes" serving tier is this one expression over byte arrays.
  *
  * Numeric contract (DuckDB oracle bit-parity): codes widen to double,
  * the three accumulators fold sequentially left-to-right exactly like
  * [[CosineSimilarity]]; the oracle quantizes inline with the same
  * formula and folds with list_reduce. */
case class CosineSimInt8(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ =>
        TypeCheckResult.TypeCheckFailure(
          s"cosine_sim_int8 expects (array<tinyint>, array<tinyint>), " +
            s"got (${left.dataType.simpleString}, " +
            s"${right.dataType.simpleString})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_int8"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSimInt8.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.functions.CosineSimInt8.compute($x, $y);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimInt8 =
    copy(left = newLeft, right = newRight)
}

object CosineSimInt8 {
  def compute(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val a = x.getByte(i).toDouble
      val b = y.getByte(i).toDouble
      dot += a * b
      na += a * a
      nb += b * b
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}
