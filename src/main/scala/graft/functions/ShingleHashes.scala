package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Distinct k-token shingle hashes of a text column, as one codegen'd
  * Catalyst expression: lowercase → tokenize on `[^a-z0-9]+` → k-token
  * windows joined by a single space → xxhash64(seed 42) → sorted distinct
  * `array<long>`.
  *
  * This is the hot path of every near-dup operator (Q23). The HOF
  * formulation (`filter(split(lower(text)))` → `transform(sequence(...))` →
  * `transform(..., xxhash64)`) evaluates three interpreted lambdas per
  * document and allocates a string per shingle per plan branch; this loop
  * tokenizes the UTF-8 bytes in place, hashes each shingle from a reused
  * buffer, and produces only the output array.
  *
  * Tokenizer contract matches the DuckDB oracles in [[graft.llm.Text]]:
  * token chars are ASCII `[a-z0-9]` after Unicode lowercasing; every other
  * byte (incl. all multi-byte UTF-8 sequences, whose bytes have the high
  * bit set) separates tokens — exactly the `[^a-z0-9]+` regex split.
  * Hash values only ever compare against other outputs of this expression
  * (inverted-index join keys, MinHash input, intersection counts), never
  * against an oracle, so the shingle hash needs determinism, not SQL
  * `xxhash64` string-compatibility — though it happens to match it.
  */
case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(text: Any): Any =
    ShingleHashes.compute(text.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($x, $k);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Seed = 42L

  def compute(text: UTF8String, k: Int): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    // tokenize: starts(i)/ends(i) delimit maximal runs of ASCII [a-z0-9]
    var nTok = 0
    var starts = new Array[Int](16)
    var ends = new Array[Int](16)
    var i = 0
    val n = bytes.length
    while (i < n) {
      val b = bytes(i)
      if (isTokenByte(b)) {
        val s = i
        while (i < n && isTokenByte(bytes(i))) i += 1
        if (nTok == starts.length) {
          starts = java.util.Arrays.copyOf(starts, nTok * 2)
          ends = java.util.Arrays.copyOf(ends, nTok * 2)
        }
        starts(nTok) = s; ends(nTok) = i; nTok += 1
      } else i += 1
    }
    if (nTok < k) return new GenericArrayData(Array.emptyLongArray)
    // hash each k-window from a reused space-joined buffer
    val nSh = nTok - k + 1
    val hashes = new Array[Long](nSh)
    var maxLen = 0
    var w = 0
    while (w < nSh) {
      var len = k - 1
      var j = 0
      while (j < k) { len += ends(w + j) - starts(w + j); j += 1 }
      if (len > maxLen) maxLen = len
      w = w + 1
    }
    val buf = new Array[Byte](maxLen)
    w = 0
    while (w < nSh) {
      var pos = 0
      var j = 0
      while (j < k) {
        if (j > 0) { buf(pos) = ' '; pos += 1 }
        val l = ends(w + j) - starts(w + j)
        System.arraycopy(bytes, starts(w + j), buf, pos, l)
        pos += l
        j += 1
      }
      hashes(w) = XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, pos, Seed)
      w += 1
    }
    // sorted distinct (order is irrelevant to every consumer)
    java.util.Arrays.sort(hashes)
    var out = hashes
    var m = 1
    i = 1
    while (i < nSh) {
      if (hashes(i) != hashes(i - 1)) { hashes(m) = hashes(i); m += 1 }
      i += 1
    }
    if (m != nSh) out = java.util.Arrays.copyOf(hashes, m)
    new GenericArrayData(out)
  }

  @inline private def isTokenByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
}
