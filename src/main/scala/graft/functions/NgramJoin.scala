package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Space-joined k-token windows of a token array as one codegen
  * expression — the string twin of [[ShingleHashes]], replacing the
  * interpreted `transform(sequence(1, n-k+1), i -> concat_ws(" ",
  * slice(toks, i, k)))` HOF that ran a lambda (and allocated a slice
  * array) per window across the n-gram text family (~10 call sites:
  * bigram LM, PMI, boilerplate n-grams, repetition battery, …).
  * `distinct = true` additionally applies `array_distinct` semantics
  * (first-occurrence order — the Text.shingles form).
  *
  * Exactness: byte-level concatenation with a single 0x20 separator ≡
  * `concat_ws(" ", ...)` over the slice (including its skip-null
  * contract), and first-seen dedup ≡ `array_distinct`. The < k guard
  * stays OUTSIDE in Text.scala (`when(size(toks) >= k, ...)`), so the
  * null/short-input behavior of the replaced expression is preserved
  * by construction. Round21OpsSpec pins value + schema equality over
  * the documents fixture. */
case class NgramJoin(child: Expression, k: Int, distinct: Boolean)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if k >= 1 => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_join expects (array<string>, k >= 1), got (${t.simpleString}, $k)")
  }
  // transform() output element nullability: true (the replaced HOF's
  // type) — keeps CaseWhen type merging in Text.scala identical
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "ngram_join"

  override def nullSafeEval(toks: Any): Any =
    NgramJoin.compute(toks.asInstanceOf[ArrayData], k, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramJoin.compute($x, $k, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): NgramJoin =
    copy(child = newChild)
}

object NgramJoin {
  private val Space = UTF8String.fromString(" ")

  def compute(toks: ArrayData, k: Int, distinct: Boolean): GenericArrayData = {
    val n = toks.numElements()
    val nW = n - k + 1
    if (nW <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val ts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      ts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val out = new Array[AnyRef](nW)
    var w = 0
    while (w < nW) {
      // concat_ws(" ", slice): null elements skipped, no separator
      var parts = 0
      var j = 0
      var g: UTF8String = null
      while (j < k) {
        val t = ts(w + j)
        if (t != null) {
          g = if (parts == 0) t else UTF8String.concat(g, Space, t)
          parts += 1
        }
        j += 1
      }
      out(w) = if (g == null) UTF8String.EMPTY_UTF8 else g
      w += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // array_distinct: first occurrence kept, order preserved
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var p = 0
    while (p < nW) { seen.add(out(p).asInstanceOf[UTF8String]); p += 1 }
    val ded = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var q = 0
    while (it.hasNext) { ded(q) = it.next(); q += 1 }
    new GenericArrayData(ded)
  }
}
