package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The shared tokenizer (`Text.tokens`) as one codegen expression:
  * lowercase → maximal runs of ASCII `[a-z0-9]` → array<string>.
  *
  * Bit-identical to the HOF form it replaces —
  * `filter(split(lower(text), "[^a-z0-9]+"), t -> t <> '')` — because
  * a maximal `[a-z0-9]` run in the lowercased string IS a regex-split
  * field (every non-run char, including each UTF-16 surrogate half of
  * a multi-byte char, matches the separator class, and all run chars
  * are single-byte in UTF-8, so byte runs ≡ char runs), and lowercasing
  * goes through the same `UTF8String.toLowerCase` as Spark's `lower`.
  * The HOF form evaluated an interpreted lambda per split field and
  * allocated the empty-string fields just to drop them; ~55 call sites
  * across the text family pay this per row (guide §4.1: prefer codegen
  * expressions on hot paths). TokensSpec-equivalent pin lives in
  * Round21OpsSpec (exact array equality over the documents fixture).
  * Element type stays non-null in the schema (the split/filter form's
  * exact type) so no downstream parquet/oracle schema shifts. */
case class Tokens(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_tokens expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(text: Any): Any =
    Tokens.compute(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.Tokens.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Tokens =
    copy(child = newChild)
}

object Tokens {
  def compute(text: UTF8String): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    val n = bytes.length
    var count = 0
    var i = 0
    // first pass: count tokens (exact-size output array, no buffers)
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        count += 1
        while (i < n && isTokenByte(bytes(i))) i += 1
      } else i += 1
    }
    val out = new Array[AnyRef](count)
    var t = 0
    i = 0
    while (i < n) {
      if (isTokenByte(bytes(i))) {
        val s = i
        while (i < n && isTokenByte(bytes(i))) i += 1
        out(t) = UTF8String.fromBytes(bytes, s, i - s)
        t += 1
      } else i += 1
    }
    new GenericArrayData(out)
  }

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
}
