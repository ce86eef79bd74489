package graft.functions

import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable quantile sketches (Apache DataSketches KLL, the library
  * Spark itself bundles for its sketch functions) as typed Aggregators —
  * the quantile twin of the q65 HLL idiom: build small per-(key, epoch)
  * sketches once, persist them, and answer "p99 per key over ANY span"
  * by unioning fixed-size sketch rows instead of rescanning the data.
  * Spark exposes HLL sketches as SQL functions but no KLL column
  * aggregate, so these follow the [[MisraGries]] UDAF pattern.
  *
  * Buffer serialization only happens at shuffle boundaries (typed
  * Aggregator contract); [[KllBuf]] writes the sketch's own compact
  * byte form rather than trusting generic serialization of the
  * sketch internals.
  *
  * Error contract: KLL k=200 has single-sided normalized rank error
  * ~1.65% at 99% confidence ([[KllSketch.getNormalizedRankError]];
  * Karnin, Lang & Liberty, FOCS'16). Compaction flips random coins, so
  * estimates are NOT run-deterministic — bounded-oracle users must
  * compare against exact values at p ± a rank margin, not literals.
  */
class KllBuf(@transient var sk: KllDoublesSketch) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    val bytes = if (sk == null) Array.emptyByteArray else sk.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    val n = in.readInt()
    if (n == 0) sk = null
    else {
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    }
  }
}

/** `kll_agg(value, k)`: a KLL sketch of a double column, as bytes. */
class KllAgg(k: Int) extends Aggregator[Double, KllBuf, Array[Byte]] {
  override def zero: KllBuf = new KllBuf(null)
  override def reduce(b: KllBuf, v: Double): KllBuf = {
    if (b.sk == null) b.sk = KllDoublesSketch.newHeapInstance(k)
    b.sk.update(v)
    b
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf =
    if (a.sk == null) b
    else { if (b.sk != null) a.sk.merge(b.sk); a }
  override def finish(b: KllBuf): Array[Byte] =
    (if (b.sk == null) KllDoublesSketch.newHeapInstance(k) else b.sk).toByteArray
  override def bufferEncoder: Encoder[KllBuf] =
    Encoders.javaSerialization(classOf[KllBuf])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `kll_union_agg(sketch)`: lossless rollup of persisted KLL rows. */
class KllUnionAgg(k: Int) extends Aggregator[Array[Byte], KllBuf, Array[Byte]] {
  override def zero: KllBuf = new KllBuf(null)
  override def reduce(b: KllBuf, bytes: Array[Byte]): KllBuf = {
    // NULL / zero-length cells in a persisted sketch table are skipped,
    // not fatal: a single bad row must not NPE the whole rollup job.
    if (bytes == null || bytes.isEmpty) return b
    val s = KllDoublesSketch.heapify(Memory.wrap(bytes))
    if (b.sk == null) b.sk = s else b.sk.merge(s)
    b
  }
  override def merge(a: KllBuf, b: KllBuf): KllBuf =
    if (a.sk == null) b
    else { if (b.sk != null) a.sk.merge(b.sk); a }
  override def finish(b: KllBuf): Array[Byte] =
    (if (b.sk == null) KllDoublesSketch.newHeapInstance(k) else b.sk).toByteArray
  override def bufferEncoder: Encoder[KllBuf] =
    Encoders.javaSerialization(classOf[KllBuf])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object KllQuantiles {
  /** `percentile_disc`-style read of a serialized sketch (INCLUSIVE
    * search: smallest stored value whose cumulative weight reaches
    * ⌈p·n⌉) — evaluated on |groups × percentiles| rows AFTER
    * aggregation, never on data rows. */
  def quantile(bytes: Array[Byte], p: Double): Double = {
    if (bytes == null || bytes.isEmpty) return Double.NaN
    val sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
    // getQuantile on an empty sketch raises; a group that saw no values
    // reads as NaN, the SQL NULL analog for a double column.
    if (sk.isEmpty) Double.NaN
    else sk.getQuantile(p, QuantileSearchCriteria.INCLUSIVE)
  }

  /** Single-sided normalized rank error of a k-sketch (99% conf.). */
  def rankError(k: Int): Double = KllSketch.getNormalizedRankError(k, false)
}
