package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature + LSH band keys over a document's shingle-hash set, as
  * one native Catalyst expression with codegen.
  *
  * Input: `array<long>` of (distinct) 64-bit shingle hashes. Output:
  * `array<long>` of [[MinHashBands.Bands]] band keys, where band b mixes the
  * [[MinHashBands.RowsPerBand]] signature components
  * `sig[i] = min_x pmod(x*a_i + b_i, p)` (affine family mod the Mersenne
  * prime 2^61−1, coefficients from a spec-fixed LCG seed, matching the
  * previous column-wise formulation bit-for-bit).
  *
  * Why an expression and not HOFs: `transform`/`array_min` lambdas are
  * interpreted per element and allocate an intermediate array per hash
  * function (128 allocations/doc). This loop is O(n·128) multiply-adds with
  * zero allocation beyond the output, and the candidate-pair semantics are
  * unchanged — band keys only need determinism, not oracle reproducibility,
  * because LSH candidates are exactly verified afterwards.
  */
case class MinHashBands(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_bands expects array<bigint>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def nullSafeEval(hs: Any): Any =
    MinHashBands.bands(hs.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.MinHashBands.bands($x);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  val NumHashes = 128
  val Bands = 32
  val RowsPerBand: Int = NumHashes / Bands
  val Prime: Long = (1L << 61) - 1

  /** Same affine family as the original column formulation: coefficients
    * from scala.util.Random(42) (spec-fixed LCG → stable across JVMs),
    * a forced odd. */
  private val (coeffA, coeffB) = {
    val rnd = new scala.util.Random(42)
    val ab = Array.fill(NumHashes)((rnd.nextLong() | 1L, rnd.nextLong()))
    (ab.map(_._1), ab.map(_._2))
  }

  /** pmod(x*a + b, p) with 64-bit wrapping multiply — identical to Spark's
    * `pmod(col*a + b, p)` under ansi=false. */
  @inline private def affine(x: Long, a: Long, b: Long): Long = {
    val m = (x * a + b) % Prime
    if (m < 0) m + Prime else m
  }

  /** Full signature — exposed for tests and for callers that want the raw
    * MinHash estimate rather than band keys. */
  def signature(hs: ArrayData): Array[Long] = {
    val n = hs.numElements()
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < NumHashes) {
        val v = affine(h, coeffA(j), coeffB(j))
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  def bands(hs: ArrayData): ArrayData = {
    val sig = signature(hs)
    val out = new Array[Long](Bands)
    var b = 0
    while (b < Bands) {
      // 64-bit mix (splitmix64-style) of the band's signature rows;
      // determinism is all that matters — candidates are verified exactly
      var k = b.toLong
      var r = 0
      while (r < RowsPerBand) {
        var z = sig(b * RowsPerBand + r) + 0x9E3779B97F4A7C15L + k
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        k = z ^ (z >>> 31)
        r += 1
      }
      out(b) = k
      b += 1
    }
    new GenericArrayData(out)
  }
}
