package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{GraphAnnOps, SimilarityOps}

/** Round-20 pins: the r19 ADVICE closures (sq_dist malformed-input
  * posture, uniform-precision graph appends, scrub parameter
  * provenance, per-list codebook takedown arm) and the residual-PQ
  * serve tier's registry composition. */
class Round20OpsSpec extends SparkSpec {
  import spark.implicits._

  test("sq_dist fails loudly on malformed input: mismatched lengths " +
      "and null elements throw instead of scoring a silent prefix") {
    graft.functions.GraftFunctions.register(spark)
    val okRow = Seq((Array(1.0f, 2.0f), Array(3.0f, 5.0f)))
      .toDF("a", "b")
    assert(okRow.select(expr("sq_dist(a, b)")).first().getDouble(0)
      == 13.0)
    val mismatched = Seq((Array(1.0f, 2.0f), Array(3.0f)))
      .toDF("a", "b")
    val e1 = intercept[Exception] {
      mismatched.select(expr("sq_dist(a, b)")).collect()
    }
    assert(e1.toString.contains("mismatched") ||
      e1.getCause != null && e1.getCause.toString.contains("mismatched"),
      e1.toString)
    // a null ELEMENT (legal by schema for zip_with/transform outputs)
    // must throw, not rank first through the null-first encode window
    val withNull = Seq((Seq[java.lang.Float](1.0f, null),
        Seq[java.lang.Float](1.0f, 2.0f)))
      .toDF("a", "b")
    val e2 = intercept[Exception] {
      withNull.select(expr("sq_dist(a, b)")).collect()
    }
    assert(e2.toString.contains("null element") ||
      e2.getCause != null && e2.getCause.toString.contains("null element"),
      e2.toString)
  }

  test("appendToGraphIndex stores FULL-precision cosines: every " +
      "appended edge score equals the exact cosine of its endpoints, " +
      "so compaction's degree prune never ranks mixed precision") {
    graft.functions.GraftFunctions.register(spark)
    val em = graft.llm.EmbeddingFixtures.clustered(spark, 300L)
      .localCheckpoint()
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    GraphAnnOps.writeGraphIndex(base, "r20_gfull")
    GraphAnnOps.appendToGraphIndex(batch, "r20_gfull")
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    val appended = spark.table("r20_gfull_gedges")
      .filter(col("src").isin(batchIds.toSeq: _*) ||
        col("dst").isin(batchIds.toSeq: _*))
    val v = em.select(col("vec_id"), col("embedding"))
    val mism = appended
      .join(v.select(col("vec_id").as("src"), col("embedding").as("se")),
        "src")
      .join(v.select(col("vec_id").as("dst"), col("embedding").as("de")),
        "dst")
      .withColumn("exact", expr("cosine_sim(se, de)"))
      .filter(col("cos") =!= col("exact"))
      .count()
    assert(mism == 0L,
      s"$mism appended edges carry rounded (non-exact) cosines")
  }

  test("scrub rebuilds under the RECORDED build parameters: an index " +
      "built with non-default nBuckets/iters scrubs to the same state " +
      "as a fresh build with those parameters, not the defaults") {
    val em = Tables.embeddings(spark, sf0001)
    SimilarityOps.writeTrainedIvfIndex(em, "r20_meta", nBuckets = 4,
      iters = 1)
    // recorded provenance: the meta table carries the build knobs
    val meta = spark.table("r20_meta_meta").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(meta == Map("nbuckets" -> 4L, "iters" -> 1L), meta.toString)
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "r20_meta", Seq(3L))
    // scrub called with the (wrong) defaults must still rebuild at
    // nBuckets=4 / iters=1 — the meta table is the source of truth
    SimilarityOps.scrubIndexModelOnTakedown(spark, "r20_meta")
    val expectedSeeds = (SimilarityOps.CentroidIds
      .filterNot(_ == 3L) ++ Seq(0L)).sorted
    import org.apache.spark.sql.functions.col
    SimilarityOps.writeTrainedIvfIndex(
      em.filter(col("vec_id") =!= 3L), "r20_meta_ref", nBuckets = 4,
      centroidIds = expectedSeeds, iters = 1)
    assert(spark.table("r20_meta_model").collect().toSet
      == spark.table("r20_meta_ref_model").collect().toSet,
      "scrub must retrain with the recorded iters, not the default")
    assert(SimilarityOps.knnIvfTrained(spark.table("r20_meta"),
        spark.table("r20_meta_model")).collect().toSeq
      == SimilarityOps.knnIvfTrained(spark.table("r20_meta_ref"),
        spark.table("r20_meta_ref_model")).collect().toSeq)
    // and a pre-provenance index (no _seeds) is a no-op, not a crash
    SimilarityOps.writeTrainedIvfIndex(em, "r20_nosd", nBuckets = 4)
    graft.sources.FileIO.dropTableAndLocation(spark, "r20_nosd_seeds")
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "r20_nosd", Seq(3L))
    SimilarityOps.scrubIndexModelOnTakedown(spark, "r20_nosd")
    assert(spark.catalog.tableExists("r20_nosd_deletes"),
      "no-provenance scrub must leave the tombstones (no rebuild)")
  }

  test("takedownAudit's pq_codebook arm audits ITS OWN id list: a " +
      "non-default codebook reports its exposure, not the centroid " +
      "list's") {
    val docs = Tables.documents(spark, sf0001)
    val em = Tables.embeddings(spark, sf0001)
    // find a doc id in the takedown source to use as a codebook seed
    val hitIds = docs
      .filter(col("source") === graft.llm.TakedownOps.TakedownSource)
      .select(col("doc_id")).orderBy("doc_id").limit(2)
      .collect().map(_.getLong(0)).toSeq
    val rows = graft.llm.TakedownOps.takedownAudit(docs, em,
        graft.llm.TakedownOps.TakedownSource,
        codebookIds = hitIds ++ Seq(0L, 1L))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rows("pq_codebook")._1 == hitIds.size + 2L)
    assert(rows("pq_codebook")._2 == hitIds.size.toLong,
      s"codebook arm must count hits against the codebook ids: $rows")
    // the centroid arm is unchanged by the codebook override
    val defRows = graft.llm.TakedownOps.takedownAudit(docs, em,
        graft.llm.TakedownOps.TakedownSource)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    assert(rows("ivf_model") == defRows("ivf_model"))
    assert(defRows("pq_codebook") == defRows("ivf_model"),
      "default-seeded pipeline: the two arms coincide")
  }

  test("graph serve budget scales with log2(N): anchored at the " +
      "measured grid's 2k point, ~3x near 50k, and the persisted " +
      "serve derives it only on the default path") {
    // anchors: the 2k grid point keeps the measured defaults; 50k hits
    // the study's ~3x-budget recall point; growth is logarithmic
    assert(GraphAnnOps.scaledBeam(2000L) == 24)
    assert(GraphAnnOps.scaledHops(2000L) == 5)
    assert(GraphAnnOps.scaledBeam(50000L) == 70)
    assert(GraphAnnOps.scaledHops(50000L) == 7)
    assert(GraphAnnOps.scaledBeam(200000L) == 90)
    assert(GraphAnnOps.scaledHops(200000L) == 8)
    // small corpora never drop below the constant floor
    assert(GraphAnnOps.scaledBeam(100L) == 24)
    assert(GraphAnnOps.scaledHops(100L) == 5)
    // at fixture scale the scaled default ≡ the explicit constants,
    // so the derived-budget serve answers identically
    val em = graft.llm.EmbeddingFixtures.clustered(spark, 400L)
      .localCheckpoint()
    GraphAnnOps.writeGraphIndex(em, "r20_gscale")
    val scaled = GraphAnnOps.knnGraphServe(spark, "r20_gscale")
      .collect().toSeq
    val explicit = GraphAnnOps.knnGraphServe(spark, "r20_gscale",
      beam = GraphAnnOps.GraphBeam, hops = GraphAnnOps.GraphHops)
      .collect().toSeq
    assert(scaled == explicit)
  }

  test("q179 truth cap: the audit's exact-truth arm caps its sample " +
      "LOUDLY — effective modulus grows so truth queries stay <= cap, " +
      "and at registry scale the cap never binds") {
    val em = graft.llm.EmbeddingFixtures.clustered(spark, 600L)
      .localCheckpoint()
    // cap not binding: the sample is N/mod as before
    val free = GraphAnnOps.annGraphRecallAudit(em, sampleMod = 50L)
    assert(free.count() == 12L) // 600/50
    // cap binding: truthCap=5 forces mod up to ceil(600/5)=120
    val capped = GraphAnnOps.annGraphRecallAudit(em, sampleMod = 50L,
      truthCap = 5L)
    assert(capped.count() == 5L, // ids ≡ 7 (mod 120) in [0,600): 5
      "the effective sample must shrink to ~truthCap queries")
  }

  test("tier router: the cluster-margin signal sends clustered-half " +
      "queries to IVF and isotropic-half queries to the graph walk, " +
      "and routed recall tracks the best single tier") {
    graft.functions.GraftFunctions.register(spark)
    val n = 2000L
    val half = n / 2
    val em = graft.llm.EmbeddingFixtures.mixed(spark, n).localCheckpoint()
    val seeds = SimilarityOps.CentroidIds ++
      SimilarityOps.CentroidIds.map(_ + half)
    val rows = graft.llm.AnnRouterOps.routedRecallAudit(em,
      centroidIds = seeds).collect()
    val (clu, iso) = rows.partition(_.getLong(0) < half)
    assert(clu.nonEmpty && iso.nonEmpty)
    // the routing signal: clustered queries have a dominant cell,
    // isotropic queries don't
    val cluToIvf = clu.count(_.getString(2) == "ivf").toDouble / clu.length
    val isoToGraph = iso.count(_.getString(2) == "graph").toDouble / iso.length
    assert(cluToIvf >= 0.8, s"clustered-half routed to ivf: $cluToIvf")
    assert(isoToGraph >= 0.7, s"isotropic-half routed to graph: $isoToGraph")
    // routed tracks the best single tier (ties it; never the worst)
    def mean(rs: Array[org.apache.spark.sql.Row], i: Int) =
      rs.map(_.getLong(i)).sum.toDouble / rs.length
    val (ivfAll, graphAll, routed) =
      (mean(rows, 3), mean(rows, 4), mean(rows, 5))
    assert(routed >= math.max(ivfAll, graphAll) * 0.95,
      s"routed=$routed ivf=$ivfAll graph=$graphAll")
    assert(mean(clu, 5) >= mean(clu, 4),
      "on the clustered half the router must not lose to all-graph")
  }

  test("q183 OPQ rotation: R is orthogonal (Householder products " +
      "survive the 6dp canonicalization), rotation preserves norms, " +
      "and the rotated audit runs the full protocol") {
    graft.functions.GraftFunctions.register(spark)
    val em = graft.llm.EmbeddingFixtures.clustered(spark, 2000L)
      .localCheckpoint()
    val audit = SimilarityOps.annPqResidualOpqRecallAudit(em)
    val rows = audit.collect()
    assert(rows.length == 40) // 2000 / 50
    assert(rows.map(_.getDouble(3)).sum / rows.length > 0.2,
      "OPQ-rotated residual PQ should retain usable recall on the " +
        s"clustered fixture: ${rows.map(_.getDouble(3)).sum / 40}")
    // the rotation itself: R·Rᵀ = I to rounding tolerance (each H is
    // an exact reflection for ANY z, so orthogonality survives the z
    // rounding; only the final 6dp entry rounding perturbs it)
    val model = SimilarityOps.kmeansCentroids(em).localCheckpoint()
    val rf = SimilarityOps.assignUnderModel(em, model)
    val rfFrame = {
      // residualFrame is private — rebuild rv the same way
      import org.apache.spark.sql.functions.{broadcast => bc}
      rf.join(bc(model.select(col("cid"), col("ce"))), "cid")
        .withColumn("rv", expr(
          "zip_with(embedding, ce, (x, y) -> CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"))
    }
    val r = SimilarityOps.opqRotationFrom(rfFrame)
    val d = r.length
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(t => r(i)(t) * r(j)(t)).sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-3,
        s"R row $i · row $j = $dot (want $expect)")
    }
  }

  test("q182 residual-PQ serve: the composition returns the exact " +
      "re-ranked top-k and beats raw-slice PQ's ADC on clustered " +
      "data at equal budget") {
    val em = graft.llm.EmbeddingFixtures.clustered(spark, 2000L)
      .localCheckpoint()
    graft.functions.GraftFunctions.register(spark)
    val qids = em.filter(col("vec_id") % 400 === 7)
      .select("vec_id").as[Long].collect().toSeq.sorted
    val served = SimilarityOps.knnResidualPq(em, queryIds = qids)
      .collect()
    assert(served.nonEmpty)
    // rows are (qid, rnk, neighbor, cos): ranked per query, k rows max
    val byQ = served.groupBy(_.getLong(0))
    assert(byQ.keySet == qids.toSet)
    byQ.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
      // clustered fixture: served neighbors are near cluster-mates
      assert(rs.head.getDouble(3) > 0.9, rs.head.toString)
    }
  }
}
