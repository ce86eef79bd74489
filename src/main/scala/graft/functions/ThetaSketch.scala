package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Union}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable distinct-SET sketches (Apache DataSketches theta) as typed
  * Aggregators — the set-operation member of the persisted-sketch family
  * (q65 HLL counts distincts, q73 KLL answers quantiles, theta
  * intersects/unions SETS). A theta sketch is a fixed-size uniform
  * sample of a key universe under a deterministic hash threshold
  * (default seed, no runtime coins — unlike KLL, a theta estimate IS
  * run-deterministic for a fixed input), so persisted per-(key, epoch)
  * sketch rows support |A ∩ B| / |A ∪ B| questions across ANY grouping
  * later, without rescanning or pair-joining the raw data.
  *
  * Buffer holds a [[Union]]; shuffle serialization writes the compact
  * ordered byte form (the [[KllBuf]] idiom — never generic object
  * serialization of sketch internals).
  */
class ThetaBuf(@transient var un: Union, var lgK: Int) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    // lgK rides alongside the bytes: rebuilding with the default-size
    // builder after a shuffle round trip would silently downsample a
    // lgK > 12 sketch to default precision (or oversize a lgK < 12 one).
    out.writeInt(lgK)
    val bytes =
      if (un == null) Array.emptyByteArray else un.getResult.toByteArray
    out.writeInt(bytes.length)
    out.write(bytes)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    lgK = in.readInt()
    val n = in.readInt()
    if (n == 0) un = null
    else {
      val bytes = new Array[Byte](n)
      in.readFully(bytes)
      un = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      un.union(CompactSketch.heapify(Memory.wrap(bytes)))
    }
  }
}

/** `theta_agg(key)`: theta sketch of a long key column, as compact bytes.
  * `lgK` = log2 nominal entries (12 → 4096 retained hashes, ~1.6%
  * relative standard error above that many distincts; exact below). */
class ThetaAgg(lgK: Int) extends Aggregator[Long, ThetaBuf, Array[Byte]] {
  private def fresh() = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def zero: ThetaBuf = new ThetaBuf(null, lgK)
  override def reduce(b: ThetaBuf, v: Long): ThetaBuf = {
    if (b.un == null) b.un = fresh()
    b.un.update(v)
    b
  }
  override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf =
    if (a.un == null) b
    else { if (b.un != null) a.un.union(b.un.getResult); a }
  override def finish(b: ThetaBuf): Array[Byte] =
    (if (b.un == null) fresh().getResult else b.un.getResult).toByteArray
  override def bufferEncoder: Encoder[ThetaBuf] =
    Encoders.javaSerialization(classOf[ThetaBuf])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** `theta_union_agg(sketch_bytes)`: lossless rollup of serialized theta
  * sketches — the persisted-sketch read path (union per-(key, epoch)
  * sketch rows into any coarser grouping without rescanning raw data).
  * q74 builds ONE sketch per distinct source-mask in the same pass as
  * the mask histogram, then unions the handful of per-mask sketches
  * into per-source sketches — each source's shingle set is exactly the
  * disjoint union of its masks' shingle sets. */
class ThetaUnionAgg(lgK: Int)
    extends Aggregator[Array[Byte], ThetaBuf, Array[Byte]] {
  private def fresh() = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
  override def zero: ThetaBuf = new ThetaBuf(null, lgK)
  override def reduce(b: ThetaBuf, v: Array[Byte]): ThetaBuf = {
    // NULL / empty cells (absent epochs, failed upstream writes) skip
    // instead of failing the whole rollup — the KllUnionAgg contract
    if (v == null || v.isEmpty) return b
    if (b.un == null) b.un = fresh()
    b.un.union(CompactSketch.heapify(Memory.wrap(v)))
    b
  }
  override def merge(a: ThetaBuf, b: ThetaBuf): ThetaBuf =
    if (a.un == null) b
    else { if (b.un != null) a.un.union(b.un.getResult); a }
  override def finish(b: ThetaBuf): Array[Byte] =
    (if (b.un == null) fresh().getResult else b.un.getResult).toByteArray
  override def bufferEncoder: Encoder[ThetaBuf] =
    Encoders.javaSerialization(classOf[ThetaBuf])
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object ThetaSketchOps {
  /** Intersection estimate of two serialized sketches with its ±nSigma
    * confidence interval — evaluated on |keys|² POST-aggregation rows,
    * never on data rows. Returns (estimate, lower, upper). */
  def intersectBounds(a: Array[Byte], b: Array[Byte],
      nSigma: Int = 2): (Double, Double, Double) = {
    val ix: Intersection = SetOperation.builder().buildIntersection()
    ix.intersect(CompactSketch.heapify(Memory.wrap(a)))
    ix.intersect(CompactSketch.heapify(Memory.wrap(b)))
    val r = ix.getResult
    (r.getEstimate, r.getLowerBound(nSigma), r.getUpperBound(nSigma))
  }

  /** Union estimate of two serialized sketches (lossless rollup read). */
  def unionEstimate(a: Array[Byte], b: Array[Byte]): Double = {
    val un: Union = SetOperation.builder().buildUnion()
    un.union(CompactSketch.heapify(Memory.wrap(a)))
    un.union(CompactSketch.heapify(Memory.wrap(b)))
    un.getResult.getEstimate
  }
}
