package graft

import org.apache.spark.sql.functions._
import graft.llm.SimilarityOps

/** Round-15 operators on hand-built frames where every expected value is
  * derivable by inspection: the centroid-silhouette audit (planted
  * mislabel must go negative) and DBSCAN over the blocked ε-graph
  * (core / border / noise roles, the singleton-core branch, and the
  * cluster census). The registry rows prove oracle equivalence on real
  * data; these pin the SEMANTICS. */
class Round15OpsSpec extends SparkSpec {
  import spark.implicits._

  private def unit(deg: Double): Array[Float] = {
    val r = math.toRadians(deg)
    Array(math.cos(r).toFloat, math.sin(r).toFloat)
  }

  // --------------------------------------------------------------- q137
  test("silhouetteAudit: planted mislabel is the negative-silhouette row") {
    // label a concentrated near (1,0), label b near (0,1); v5 carries
    // label a but sits ON b's axis — by construction closer (cosine) to
    // b's centroid than to its own, so it must count in a's n_neg and
    // drag a's min_sil below zero
    val em = Seq(
      (1L, "a", Array(1.0f, 0.0f)),
      (2L, "a", Array(0.96f, 0.28f)),
      (5L, "a", Array(0.0f, 1.0f)), // mislabeled
      (3L, "b", Array(0.0f, 1.0f)),
      (4L, "b", Array(0.28f, 0.96f)))
      .toDF("vec_id", "label", "embedding")
    val out = SimilarityOps.silhouetteAudit(em).collect()
    assert(out.length == 2)
    val byLabel = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val (na, meanA, minA, negA) = byLabel("a")
    val (nb, meanB, minB, negB) = byLabel("b")
    assert(na == 3 && nb == 2)
    // exactly the planted point is negative; b's members all cohere
    assert(negA == 1L, s"a.n_neg: $negA")
    assert(negB == 0L, s"b.n_neg: $negB")
    assert(minA < 0, s"a.min_sil: $minA")
    assert(minB > 0 && meanB > 0, s"b: $minB/$meanB")
    // silhouettes live in [-1, 1] by construction of (b-a)/max(a,b)
    Seq(meanA, minA, meanB, minB).foreach(s => assert(s >= -1 && s <= 1))
    // output is one row per label, sorted
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b"))
  }

  // --------------------------------------------------------------- q138
  test("dbscanClusters: core/border/noise roles and the singleton-core branch") {
    // Everything on the unit circle; cosine = cos(angle difference), so
    // τ = 0.93 admits pairs closer than ~21.6°. Block seeds at 0° / 90°.
    //   dense cluster: 0°,10°,20° mutually adjacent (all cores at
    //     minPts=2), 35° touches only 20° (border), 60° touches nothing
    //     (noise)
    //   clean cluster: 86°,88°,90° — all cores, no border
    //   star: 150° core via its two leaves 139°/161°, but the leaves are
    //     22° apart (cos 0.927 < τ) and not cores — exercising the
    //     singleton-core CC branch (a core with no core neighbor keeps
    //     its own id as cluster label) with the leaves as borders
    val em = Seq(
      1L -> 0.0, 2L -> 10.0, 3L -> 20.0, 4L -> 35.0, 5L -> 60.0,
      10L -> 90.0, 11L -> 88.0, 12L -> 86.0,
      20L -> 150.0, 21L -> 139.0, 22L -> 161.0)
      .map { case (id, deg) => (id, unit(deg)) }
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.dbscanClusters(em, threshold = 0.93, minPts = 2,
        centroidIds = Seq(1L, 10L), iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (-1L, 0L, 0L, 1L),   // noise: id 5 only
      (1L, 3L, 1L, 4L),    // cores 1,2,3 + border 4
      (10L, 3L, 0L, 3L),   // cores 10,11,12
      (20L, 1L, 2L, 3L)),  // singleton core 20 + borders 21,22
      out.toSeq.toString)
  }

  // --------------------------------------------------------------- q139
  test("annRecallAudit: planted cross-cluster neighbor is the measured miss") {
    // Query 100 (30°) has true top-2 {2 (25.8°), 5 (48°)} — but 5 sits
    // past the trained cluster boundary (~44°) in cluster B, so an
    // nProbe=1 probe of A can never return it: n_hit must be exactly 1.
    // Query 200 (78°) has both true neighbors {3, 4} inside its own
    // cluster: recall 1. The audit MEASURES the recall/probe trade.
    val em = Seq(
      1L -> 0.0, 2L -> 25.8, 100L -> 30.0,            // cluster A
      3L -> 90.0, 4L -> 64.0, 200L -> 78.0, 5L -> 48.0) // cluster B
      .map { case (id, deg) => (id, unit(deg)) }
      .toDF("vec_id", "embedding")
    val out = SimilarityOps.annRecallAudit(em, k = 2, nProbe = 1,
        sampleMod = 100L, sampleRes = 0L, minHits = 2,
        centroidIds = Seq(1L, 3L), iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      (100L, 1L, 0.5, 0),
      (200L, 2L, 1.0, 1)),
      out.toSeq.toString)
  }

  // --------------------------------------------------------------- q140
  test("epochPlan: epochs, repetition cap, and deficit from hand counts") {
    import graft.llm.ChunkOps
    // en: 5 natural tokens, target 0.4*100=40 -> 8 epochs, capped at 4
    // (20 effective, 20 deficit); zh: 2 tokens, target 20 -> 10 epochs,
    // capped 4 (8 effective, 12 deficit); xx: outside the weight map ->
    // explicit zero-target row, not dropped
    val docs = Seq(
      (1L, "en", "a b c"), (2L, "en", "d e"),
      (3L, "zh", "x y"),
      (4L, "xx", "q"))
      .toDF("doc_id", "lang", "text")
    val out = ChunkOps.epochPlan(docs, totalBudget = 100L, maxEpochs = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6), r.getLong(7)))
    assert(out.toSeq == Seq(
      ("en", 2L, 5L, 40L, 8.0, 20L, 4.0, 20L),
      ("xx", 1L, 1L, 0L, 0.0, 0L, 0.0, 0L),
      ("zh", 1L, 2L, 20L, 10.0, 8L, 4.0, 12L)),
      out.toSeq.toString)
  }
}
