package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (the engine's `Aggregator[IN, BUF, OUT]` surface — SURVEY.md
  * §2b UDF/UDAF inventory): exact second-moment accumulator over integral
  * doubles.
  *
  * Moments are accumulated as exact BigDecimal sums (count, Σx, Σx²), so the
  * merge order across partitions cannot perturb the result — the reason this
  * exists instead of a float Welford fold: at 1000-executor scale partial
  * merge order is nondeterministic, and a float accumulator would make the
  * same query hash differently run to run. The final mean/variance division
  * happens once, in double, at the end — deterministic for both engines.
  */
case class MomentsBuf(n: Long, sum: BigDecimal, sumSq: BigDecimal)
/** varSamp is None (SQL NULL) for n < 2 — matching `var_samp` semantics,
  * so a 1-row group cannot diverge from an engine that returns NULL. */
case class MomentsOut(n: Long, mean: Double, varSamp: Option[Double])

object ExactMoments extends Aggregator[Double, MomentsBuf, MomentsOut] {
  type Buf = MomentsBuf
  type Out = MomentsOut

  def zero: Buf = MomentsBuf(0L, BigDecimal(0), BigDecimal(0))

  def reduce(b: Buf, x: Double): Buf = {
    val d = BigDecimal(x)
    MomentsBuf(b.n + 1, b.sum + d, b.sumSq + d * d)
  }

  def merge(a: Buf, b: Buf): Buf =
    MomentsBuf(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)

  def finish(b: Buf): Out =
    if (b.n < 2) MomentsOut(b.n, if (b.n == 0) 0.0 else (b.sum / b.n).toDouble, None)
    else {
      // var_samp = (n·Σx² − (Σx)²) / (n·(n−1)), numerator kept exact.
      val num = b.sumSq * b.n - b.sum * b.sum
      val den = BigDecimal(b.n) * (b.n - 1)
      MomentsOut(b.n, b.sum.toDouble / b.n.toDouble,
        Some(num.toDouble / den.toDouble))
    }

  def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  def outputEncoder: Encoder[Out] = Encoders.product[Out]
}
