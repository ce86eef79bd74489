package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch

import graft.functions.{KllQuantiles, KllUnionAgg, ThetaAgg, ThetaBuf}

/** Round-11 hardening: sketch-buffer serialization fidelity and
  * bad-cell tolerance in persisted-sketch rollups. */
class Round11OpsSpec extends SparkSpec {

  private def roundTrip(b: ThetaBuf): ThetaBuf = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(b); oos.close()
    new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[ThetaBuf]
  }

  test("ThetaBuf round trip preserves a non-default lgK") {
    // lgK=16 retains ~64k hashes; a rebuild with the default (lgK=12)
    // builder would downsample the restored union to ≲8k on the next
    // getResult. 100k distincts distinguish the two regimes cleanly.
    val agg = new ThetaAgg(16)
    var buf = agg.zero
    (0L until 100000L).foreach(v => buf = agg.reduce(buf, v))
    val restored = roundTrip(buf)
    assert(restored.lgK == 16)
    val entries = restored.un.getResult.getRetainedEntries
    assert(entries > 16384, s"retained $entries — lgK lost in transit")
    // and the restored union still ACCEPTS updates at full precision:
    // merging a disjoint 100k-key half keeps the estimate within lgK=16
    // error (~0.4% RSE; 3% here is already impossible at lgK=12)
    var other = agg.zero
    (100000L until 200000L).foreach(v => other = agg.reduce(other, v))
    val est = agg.merge(restored, other).un.getResult.getEstimate
    assert(math.abs(est - 200000.0) / 200000.0 < 0.03, s"estimate $est")
  }

  test("ThetaBuf round trip of an empty buffer keeps lgK for later updates") {
    val agg = new ThetaAgg(8)
    val restored = roundTrip(agg.zero)
    assert(restored.lgK == 8)
    assert(restored.un == null)
  }

  test("KllUnionAgg skips NULL / empty cells instead of failing the rollup") {
    val k = 200
    val mk = (vals: Seq[Double]) => {
      val s = KllDoublesSketch.newHeapInstance(k)
      vals.foreach(s.update); s.toByteArray
    }
    val agg = new KllUnionAgg(k)
    var buf = agg.zero
    buf = agg.reduce(buf, mk(Seq(1.0, 2.0, 3.0)))
    buf = agg.reduce(buf, null)
    buf = agg.reduce(buf, Array.emptyByteArray)
    buf = agg.reduce(buf, mk(Seq(4.0, 5.0)))
    val out = agg.finish(buf)
    val sk = KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(out))
    assert(sk.getN == 5, s"n=${sk.getN} — a bad cell dropped real rows")
    assert(KllQuantiles.quantile(out, 1.0) == 5.0)
  }

  test("KllQuantiles.quantile is NaN for null / empty inputs, not an error") {
    assert(KllQuantiles.quantile(null, 0.5).isNaN)
    assert(KllQuantiles.quantile(Array.emptyByteArray, 0.5).isNaN)
    val empty = KllDoublesSketch.newHeapInstance(200).toByteArray
    assert(KllQuantiles.quantile(empty, 0.5).isNaN)
  }
}
