package graft

import graft.core.Tables
import graft.llm.SimilarityOps

/** The "computed once, persisted, reused" ANN posture, demonstrated: the
  * LSH/IVF index is written out as a bucketed catalog table, queries run
  * against the persisted index, results are identical to the direct path,
  * and the plan proves the index construction never reruns — no plane
  * arithmetic / assignment window, and no exchange on the corpus side
  * (the probe set is broadcast; the index's own bucketing satisfies the
  * histogram's clustering requirement). */
class AnnIndexSpec extends SparkSpec {

  test("persisted LSH index: identical top-k, no bucket recompute, no corpus exchange") {
    val em = Tables.embeddings(spark, sf0001)
    SimilarityOps.writeLshIndex(em, "ann_lsh_idx", nBuckets = 8)
    val fromIndex = SimilarityOps.knnLshIndexed(spark.table("ann_lsh_idx"))
    val direct = SimilarityOps.knnLsh(em)
    assert(fromIndex.collect().toSeq == direct.collect().toSeq)

    val plan = fromIndex.queryExecution.executedPlan.toString
    // the bucket column is READ from storage — the plane projections
    // (aggregate over zip_with) appear nowhere in the query plan
    assert(!plan.contains("zip_with"),
      s"indexed LSH plan re-derives corpus buckets:\n$plan")
    // the corpus side streams into the broadcast probe join unshuffled,
    // and the bucket histogram rides the table's own bucketing
    assert(!plan.contains("Exchange hashpartitioning(bucket"),
      s"indexed LSH plan shuffles the corpus on bucket:\n$plan")
  }

  test("incremental LSH append: (index ∪ batch) answers identically to a rebuild") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    // a 4/5 : 1/5 split by id — the batch includes query id 0 and 250, so
    // the appended rows must be visible both as corpus AND as queries
    val base = em.filter(col("vec_id") % 5 =!= 0)
    val batch = em.filter(col("vec_id") % 5 === 0)
    SimilarityOps.writeLshIndex(base, "ann_lsh_inc", nBuckets = 8)
    SimilarityOps.appendToLshIndex(batch, "ann_lsh_inc", nBuckets = 8)
    val incr = SimilarityOps.knnLshIndexed(spark.table("ann_lsh_inc"))
    SimilarityOps.writeLshIndex(em, "ann_lsh_full", nBuckets = 8)
    val full = SimilarityOps.knnLshIndexed(spark.table("ann_lsh_full"))
    assert(incr.collect().toSeq == full.collect().toSeq)
  }

  test("incremental IVF append: assigns against stored centroids, matches rebuild") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    // the batch split must leave every centroid id in the base index —
    // residue 4 mod 10 is centroid-free (ids 3,33,66,99,132,165,198,231)
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    assert(SimilarityOps.CentroidIds.forall(_ % 10 != 4))
    SimilarityOps.writeIvfIndex(base, "ann_ivf_inc", nBuckets = 8)
    SimilarityOps.appendToIvfIndex(batch, "ann_ivf_inc", nBuckets = 8)
    val incr = SimilarityOps.knnIvfIndexed(spark.table("ann_ivf_inc"))
    SimilarityOps.writeIvfIndex(em, "ann_ivf_full", nBuckets = 8)
    val full = SimilarityOps.knnIvfIndexed(spark.table("ann_ivf_full"))
    assert(incr.collect().toSeq == full.collect().toSeq)
  }

  test("trained IVF index: append assigns under the STORED model, probe plan retrains nothing") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    // the batch split must leave every k-means seed id in the base index
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    assert(SimilarityOps.CentroidIds.forall(_ % 10 != 4))
    SimilarityOps.writeTrainedIvfIndex(base, "ann_tivf_inc", nBuckets = 8)
    SimilarityOps.appendToTrainedIvfIndex(batch, "ann_tivf_inc", nBuckets = 8)
    val model = spark.table("ann_tivf_inc_model")
    val incr = SimilarityOps.knnIvfTrained(spark.table("ann_tivf_inc"), model)
    // the trained-IVF equivalence is MODEL-pinned: (base ∪ batch) under the
    // stored model ≡ the full corpus assigned fresh under that SAME model
    // (a full-rebuild comparison would retrain on different data — k-means
    // centroids are corpus-dependent, unlike raw IVF's seed rows)
    val direct = SimilarityOps.knnIvfTrained(
      SimilarityOps.assignUnderModel(em, model), model)
    assert(incr.collect().toSeq == direct.collect().toSeq)

    val plan = incr.queryExecution.executedPlan.toString
    // training's update shuffle is a posexplode over the corpus — it must
    // never appear on the serve path (the model is read, not re-derived)
    assert(!plan.contains("posexplode"),
      s"trained-IVF probe plan retrains the model:\n$plan")
    // the probe set broadcasts; the bucketed corpus streams unshuffled
    assert(!plan.contains("Exchange hashpartitioning(cid") &&
      !plan.contains("Exchange hashpartitioning(vec_id"),
      s"trained-IVF probe plan shuffles the corpus:\n$plan")
  }

  test("trained IVF index: tombstone deletes serve correctly and compact away") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    SimilarityOps.writeTrainedIvfIndex(em, "ann_tivf_del", nBuckets = 8)
    val model = spark.table("ann_tivf_del_model")
    // delete two non-query, non-seed vectors that DO appear in some
    // query's top-k under the full index — the probe answers must change
    val gone = Seq(1L, 2L)
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "ann_tivf_del", gone)
    val served = SimilarityOps.knnIvfTrained(
      SimilarityOps.liveTrainedIvfIndex(spark, "ann_tivf_del"), model)
    // reference: the same STORED model over the corpus minus the ids
    // (deletes never retrain — the append contract's mirror)
    val direct = SimilarityOps.knnIvfTrained(
      SimilarityOps.assignUnderModel(
        em.filter(!col("vec_id").isin(gone: _*)), model), model)
    assert(served.collect().toSeq == direct.collect().toSeq)
    served.collect().foreach(r =>
      assert(!gone.contains(r.getLong(2)), s"deleted id served: $r"))

    // compaction folds the tombstones into the layout and drops them;
    // the served answers must not move
    SimilarityOps.compactTrainedIvfIndex(spark, "ann_tivf_del", nBuckets = 8)
    assert(!spark.catalog.tableExists("ann_tivf_del_deletes"),
      "compaction must drop the tombstone table")
    val afterCompact = SimilarityOps.knnIvfTrained(
      SimilarityOps.liveTrainedIvfIndex(spark, "ann_tivf_del"), model)
    assert(afterCompact.collect().toSeq == direct.collect().toSeq)
    // and the compacted layout is still the bucketed catalog table
    assert(spark.table("ann_tivf_del").count() == em.count() - gone.size)
  }

  test("semanticDedup: within-cluster near-dups found, cross-cluster blocked") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // two planted clusters around the axes; v3/v5 are each other's
    // nearest neighbors ACROSS the cluster boundary (cos 0.96) — the
    // SemDeDup contract is that clustering IS the blocking, so that
    // pair must NOT surface while every within-cluster pair ≥ τ does
    val em = Seq(
      (1L, Array(1.0f, 0.0f)),       // seed A
      (2L, Array(0.995f, 0.0999f)),  // A
      (3L, Array(0.8f, 0.6f)),       // A (0.8 vs 0.6)
      (4L, Array(0.0f, 1.0f)),       // seed B
      (5L, Array(0.6f, 0.8f)),       // B (0.8 vs 0.6)
      (6L, Array(0.0999f, 0.995f)))  // B
      .toDF("vec_id", "embedding")
    val rows = SimilarityOps.semanticDedup(em, threshold = 0.7,
        centroidIds = Seq(1L, 4L), iters = 2)
      .collect()
    val pairs = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L)), pairs.toString)
    assert(!pairs.contains((3L, 5L)), "cross-cluster pair must be blocked")
    val cos = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(math.abs(cos((1L, 3L)) - 0.8) < 1e-3, cos.toString)
    assert(math.abs(cos((1L, 2L)) - 0.995) < 1e-2, cos.toString)
    // every emitted pair shares a cluster id and clears the threshold
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.7, r.toString)
    }

    // the keeper resolution collapses each semantic component to its
    // min id; unpaired vectors keep themselves
    val keepers = SimilarityOps.semanticKeeper(em, threshold = 0.7,
        centroidIds = Seq(1L, 4L), iters = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(keepers.toSeq == Seq((1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0),
      (4L, 4L, 1), (5L, 4L, 0), (6L, 4L, 0)), keepers.mkString(","))
  }

  test("persisted IVF index: identical top-k, assignment window never reruns") {
    val em = Tables.embeddings(spark, sf0001)
    SimilarityOps.writeIvfIndex(em, "ann_ivf_idx", nBuckets = 8)
    val fromIndex = SimilarityOps.knnIvfIndexed(spark.table("ann_ivf_idx"))
    val direct = SimilarityOps.knnIvf(em)
    assert(fromIndex.collect().toSeq == direct.collect().toSeq)

    val plan = fromIndex.queryExecution.executedPlan.toString
    // the corpus-wide nearest-centroid assignment is a window over
    // vec_id — its exchange must not reappear on the query path
    assert(!plan.contains("Exchange hashpartitioning(vec_id"),
      s"indexed IVF plan reruns the corpus assignment:\n$plan")
  }

  // ------------------------------------------------------------- q171

  test("PQ codes beside the trained IVF index: serve ≡ direct, and the " +
      "serve plan neither retrains nor re-encodes") {
    val em = Tables.embeddings(spark, sf0001)
    SimilarityOps.writeTrainedIvfIndex(em, "ann_pq_idx", nBuckets = 8)
    SimilarityOps.writePqCodes(spark, "ann_pq_idx", nBuckets = 8)
    val served = SimilarityOps.knnPqServe(spark, "ann_pq_idx")
    // knnPq trains on the same data / seeds / iters → the same model
    val direct = SimilarityOps.knnPq(em)
    assert(served.collect().toSeq == direct.collect().toSeq)

    val plan = served.queryExecution.executedPlan.toString
    // training's update shuffle (posexplode) and the encoder's argmin
    // window (the ONLY window partitioned by (vec_id, s)) must not
    // appear at serve time — codes and model are READ, never
    // re-derived. (The query-side distance-table agg legitimately
    // exchanges on its |queries|-scale keys, so a blanket no-exchange
    // assertion would be wrong.)
    assert(!plan.contains("posexplode"),
      s"PQ serve plan retrains the model:\n$plan")
    assert("windowspecdefinition\\(vec_id#\\d+L?, s#".r
      .findFirstIn(plan).isEmpty,
      s"PQ serve plan re-runs the encoder argmin:\n$plan")
  }

  test("PQ append: batch encodes under the STORED codebook+model and " +
      "(base ∪ batch) serves identically to the same-model direct form") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    // residue 4 mod 10 keeps every seed id (3,33,…,231) in the base
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    SimilarityOps.writeTrainedIvfIndex(base, "ann_pq_inc", nBuckets = 8)
    SimilarityOps.writePqCodes(spark, "ann_pq_inc", nBuckets = 8)
    SimilarityOps.appendToTrainedIvfIndex(batch, "ann_pq_inc", nBuckets = 8)
    SimilarityOps.appendToPqCodes(batch, "ann_pq_inc", nBuckets = 8)
    val served = SimilarityOps.knnPqServe(spark, "ann_pq_inc")
    val direct = SimilarityOps.knnPqWith(em,
      spark.table("ann_pq_inc_model"),
      spark.table("ann_pq_inc_pqcodebook"))
    assert(served.collect().toSeq == direct.collect().toSeq)
  }

  test("PQ tombstones: ONE logical delete leaves both the full-precision " +
      "rows and the codes, before and after compaction") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    SimilarityOps.writeTrainedIvfIndex(em, "ann_pq_del", nBuckets = 8)
    SimilarityOps.writePqCodes(spark, "ann_pq_del", nBuckets = 8)
    val gone = Seq(1L, 2L)
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "ann_pq_del", gone)
    val model = spark.table("ann_pq_del_model")
    val cb = spark.table("ann_pq_del_pqcodebook")
    val direct = SimilarityOps.knnPqWith(
      em.filter(!col("vec_id").isin(gone: _*)), model, cb)
    val served = SimilarityOps.knnPqServe(spark, "ann_pq_del")
    assert(served.collect().toSeq == direct.collect().toSeq)
    served.collect().foreach(r =>
      assert(!gone.contains(r.getLong(2)), s"deleted id served: $r"))

    // combined compaction rewrites the codes BEFORE the base drops the
    // shared tombstone table; answers must not move
    SimilarityOps.compactPqIvfIndex(spark, "ann_pq_del", nBuckets = 8)
    assert(!spark.catalog.tableExists("ann_pq_del_deletes"))
    assert(spark.table("ann_pq_del_pq").count() == em.count() - gone.size)
    val afterCompact = SimilarityOps.knnPqServe(spark, "ann_pq_del")
    assert(afterCompact.collect().toSeq == direct.collect().toSeq)
  }

  // ------------------------------------------------------------- q172

  test("int8 codes beside the trained IVF index: serve ≡ direct under " +
      "the stored model, batch append encodes under it, and ONE " +
      "logical delete leaves the byte codes too") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    SimilarityOps.writeTrainedIvfIndex(base, "ann_i8", nBuckets = 8)
    SimilarityOps.writeInt8Codes(spark, "ann_i8", nBuckets = 8)
    SimilarityOps.appendToTrainedIvfIndex(batch, "ann_i8", nBuckets = 8)
    SimilarityOps.appendToInt8Codes(batch, "ann_i8", nBuckets = 8)
    val model = spark.table("ann_i8_model")
    val served = SimilarityOps.knnInt8Serve(spark, "ann_i8")
    val direct = SimilarityOps.knnInt8With(em, model)
    assert(served.collect().toSeq == direct.collect().toSeq)

    val gone = Seq(1L, 2L)
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "ann_i8", gone)
    val after = SimilarityOps.knnInt8Serve(spark, "ann_i8")
    val ref = SimilarityOps.knnInt8With(
      em.filter(!col("vec_id").isin(gone: _*)), model)
    assert(after.collect().toSeq == ref.collect().toSeq)
    after.collect().foreach(r =>
      assert(!gone.contains(r.getLong(2)), s"deleted id served: $r"))

    // base compaction folds the SHARED tombstones into the int8
    // sidecar too — a compaction that dropped _deletes with the
    // sidecar dirty would resurrect the deleted rows in int8 serving
    SimilarityOps.compactTrainedIvfIndex(spark, "ann_i8", nBuckets = 8)
    assert(!spark.catalog.tableExists("ann_i8_deletes"))
    assert(spark.table("ann_i8_int8").count() == em.count() - gone.size)
    val afterCompact = SimilarityOps.knnInt8Serve(spark, "ann_i8")
    assert(afterCompact.collect().toSeq == ref.collect().toSeq)
  }

  test("PQ re-rank tail covering the probed cells makes PQ lossless: " +
      "rerank→∞ ≡ the full-precision trained-IVF path") {
    val em = Tables.embeddings(spark, sf0001)
    // tail ≥ every candidate in the probed cells → the exact re-rank
    // sees the same pool as full-precision serving → identical top-k
    // (the measured-recall story: PQ's loss is ENTIRELY the tail cut)
    val pqAll = SimilarityOps.knnPq(em, rerank = 1000000)
    val model = SimilarityOps.kmeansCentroids(em).localCheckpoint()
    val full = SimilarityOps.knnIvfTrained(
      SimilarityOps.assignUnderModel(em, model), model)
    assert(pqAll.collect().toSeq == full.collect().toSeq)
  }

  test("takedown of a SEED vector: the audit reports the verbatim " +
      "retention, scrub re-elects + rebuilds so serve ≡ an index " +
      "rebuilt without the vectors, and no model artifact keeps the " +
      "gone floats") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    SimilarityOps.writeTrainedIvfIndex(em, "ann_scrub", nBuckets = 8)
    SimilarityOps.writePqCodes(spark, "ann_scrub", nBuckets = 8)
    SimilarityOps.writeResidualPqCodes(spark, "ann_scrub", nBuckets = 8)
    SimilarityOps.writeInt8Codes(spark, "ann_scrub", nBuckets = 8)

    // 3 and 33 are centroid AND codebook seeds; 7 is an rcodebook seed
    // (7·1) but neither centroid nor codebook
    val gone = Seq(3L, 33L, 7L)
    val goneVecs = em.filter(col("vec_id").isin(gone: _*))
      .select(col("embedding")).collect().map(_.getSeq[Float](0)).toSet
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "ann_scrub", gone)

    // before scrub: the audit surfaces the exposure (2 retained seeds
    // per role), and the stored model still carries the gone floats
    val before = SimilarityOps.retainedSeedAudit(spark, "ann_scrub")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(before.toSet ==
      Set(("centroid", 8L, 2L), ("codebook", 8L, 2L),
        ("rcodebook", 64L, 1L)), before.toSeq)

    SimilarityOps.scrubIndexModelOnTakedown(spark, "ann_scrub")

    // the re-election rule is deterministic: survivors keep their
    // seats; 3 and 33 are replaced by the smallest live non-seed ids
    val expectedSeeds = (SimilarityOps.CentroidIds
      .filterNot(Seq(3L, 33L).contains) ++ Seq(0L, 1L)).sorted
    val seedRows = spark.table("ann_scrub_seeds").collect()
      .map(r => (r.getString(1), r.getLong(0)))
    assert(seedRows.collect { case ("centroid", id) => id }
      .toSeq.sorted == expectedSeeds)
    assert(seedRows.collect { case ("codebook", id) => id }
      .toSeq.sorted == expectedSeeds)
    // rcodebook lost only id 7 → replaced by the smallest live id
    // outside ITS seed set ∪ gone (roles re-elect independently): 0
    val expectedRcb = (SimilarityOps.PqResidualCodebookIds
      .filterNot(_ == 7L) ++ Seq(0L)).sorted
    assert(seedRows.collect { case ("rcodebook", id) => id }
      .toSeq.sorted == expectedRcb)

    // scrub ≡ a from-scratch index over the live corpus with the same
    // re-elected seeds — every tier answers identically
    val live = em.filter(!col("vec_id").isin(gone: _*))
    SimilarityOps.writeTrainedIvfIndex(live, "ann_scrub_ref",
      nBuckets = 8, centroidIds = expectedSeeds)
    SimilarityOps.writePqCodes(spark, "ann_scrub_ref",
      codebookIds = expectedSeeds, nBuckets = 8)
    SimilarityOps.writeResidualPqCodes(spark, "ann_scrub_ref",
      codebookIds = expectedRcb, nBuckets = 8)
    SimilarityOps.writeInt8Codes(spark, "ann_scrub_ref", nBuckets = 8)
    assert(SimilarityOps.knnPqServe(spark, "ann_scrub").collect().toSeq
      == SimilarityOps.knnPqServe(spark, "ann_scrub_ref").collect().toSeq)
    assert(SimilarityOps.knnResidualPqServe(spark, "ann_scrub")
      .collect().toSeq
      == SimilarityOps.knnResidualPqServe(spark, "ann_scrub_ref")
        .collect().toSeq)
    assert(SimilarityOps.knnInt8Serve(spark, "ann_scrub").collect().toSeq
      == SimilarityOps.knnInt8Serve(spark, "ann_scrub_ref")
        .collect().toSeq)

    // no artifact retains the gone vectors' floats: not the index rows,
    // not the model centroids, not the codebook slices (gone slices =
    // every contiguous width-8 slice of a gone embedding)
    assert(spark.table("ann_scrub").collect()
      .forall(r => !goneVecs.contains(r.getSeq[Float](1))))
    assert(spark.table("ann_scrub_model").collect()
      .forall(r => !goneVecs.contains(r.getSeq[Float](1))))
    val goneSlices = goneVecs.flatMap(v => v.grouped(8).toSeq)
    assert(spark.table("ann_scrub_pqcodebook")
      .select(col("cv")).collect()
      .forall(r => !goneSlices.contains(r.getSeq[Float](0))))
    // and the audit is clean (fresh generation dropped the tombstones)
    val after = SimilarityOps.retainedSeedAudit(spark, "ann_scrub")
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(after.forall(_._2 == 0L), after.toSeq)

    // a takedown that hits NO seed leaves the artifacts untouched:
    // scrub is O(|deletes|) in the routine case
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "ann_scrub", Seq(9L))
    val modelBefore = spark.table("ann_scrub_model").collect().toSet
    SimilarityOps.scrubIndexModelOnTakedown(spark, "ann_scrub")
    assert(spark.catalog.tableExists("ann_scrub_deletes"),
      "no-seed-hit scrub must not trigger a rebuild")
    assert(spark.table("ann_scrub_model").collect().toSet == modelBefore)
  }

  // ------------------------------------------------------------- q182

  test("residual-PQ codes beside the trained IVF index: stored serve ≡ " +
      "direct under the shared model + trained residual book, append " +
      "encodes under the STORED book, ONE logical delete leaves the " +
      "residual codes too, and compaction folds them before dropping " +
      "the shared tombstones") {
    val em = Tables.embeddings(spark, sf0001)
    import org.apache.spark.sql.functions.col
    // residue 4 mod 10 keeps every k-means seed id in the base
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    SimilarityOps.writeTrainedIvfIndex(base, "ann_rpq", nBuckets = 8)
    SimilarityOps.writeResidualPqCodes(spark, "ann_rpq", nBuckets = 8)
    val model = spark.table("ann_rpq_model")
    val cb = spark.table("ann_rpq_rpqcodebook")
    val served0 = SimilarityOps.knnResidualPqServe(spark, "ann_rpq")
    val direct0 = SimilarityOps.knnResidualPqWith(base, model, cb)
    assert(served0.collect().toSeq == direct0.collect().toSeq)
    // the serve plan reads codes and book — it must not re-run the
    // encoder argmin (the only window partitioned by (vec_id, s)) nor
    // the model training's posexplode update shuffle
    val plan = served0.queryExecution.executedPlan.toString
    assert(!plan.contains("posexplode"),
      s"residual-PQ serve plan retrains the model:\n$plan")
    assert("windowspecdefinition\\(vec_id#\\d+L?, s#".r
      .findFirstIn(plan).isEmpty,
      s"residual-PQ serve plan re-runs the encoder argmin:\n$plan")

    SimilarityOps.appendToTrainedIvfIndex(batch, "ann_rpq", nBuckets = 8)
    SimilarityOps.appendToResidualPqCodes(batch, "ann_rpq", nBuckets = 8)
    val served = SimilarityOps.knnResidualPqServe(spark, "ann_rpq")
    val direct = SimilarityOps.knnResidualPqWith(em, model, cb)
    assert(served.collect().toSeq == direct.collect().toSeq)

    val gone = Seq(1L, 2L)
    SimilarityOps.deleteFromTrainedIvfIndex(spark, "ann_rpq", gone)
    val ref = SimilarityOps.knnResidualPqWith(
      em.filter(!col("vec_id").isin(gone: _*)), model, cb)
    val after = SimilarityOps.knnResidualPqServe(spark, "ann_rpq")
    assert(after.collect().toSeq == ref.collect().toSeq)
    after.collect().foreach(r =>
      assert(!gone.contains(r.getLong(2)), s"deleted id served: $r"))

    SimilarityOps.compactTrainedIvfIndex(spark, "ann_rpq", nBuckets = 8)
    assert(!spark.catalog.tableExists("ann_rpq_deletes"))
    assert(spark.table("ann_rpq_rpq").count() == em.count() - gone.size)
    val afterCompact = SimilarityOps.knnResidualPqServe(spark, "ann_rpq")
    assert(afterCompact.collect().toSeq == ref.collect().toSeq)
  }

  // ------------------------------------------------------------- q179

  test("graph ANN index: stored serve ≡ direct, appended vectors are " +
      "wired in both directions, takedown kills edges at EITHER " +
      "endpoint, and compaction restores the degree invariant without " +
      "moving answers") {
    import org.apache.spark.sql.functions.col
    import graft.llm.{EmbeddingFixtures, GraphAnnOps}
    val em = EmbeddingFixtures.clustered(spark, 600L).localCheckpoint()

    GraphAnnOps.writeGraphIndex(em, "ann_graph")
    val stored = GraphAnnOps.knnGraphServe(spark, "ann_graph")
      .collect().toSeq
    val direct = GraphAnnOps.knnGraphFrom(
      GraphAnnOps.nnDescentEdges(em), em,
      em.filter(col("vec_id").isin(SimilarityOps.QueryIds: _*))
        .select(col("vec_id").as("qid"), col("embedding").as("qe")))
      .collect().toSeq
    assert(stored == direct)

    // incremental insert: every appended vector gets edges BOTH ways
    // (searchable from, and reachable into), and serving an appended
    // id finds its near cluster-mates through the stored graph
    val base = em.filter(col("vec_id") % 10 =!= 4)
    val batch = em.filter(col("vec_id") % 10 === 4)
    GraphAnnOps.writeGraphIndex(base, "ann_graph_inc")
    GraphAnnOps.appendToGraphIndex(batch, "ann_graph_inc")
    val batchIds = batch.select(col("vec_id")).collect()
      .map(_.getLong(0)).toSet
    val srcs = spark.table("ann_graph_inc_gedges")
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(batchIds.forall(b => srcs.exists(_._1 == b)),
      "appended ids must have outgoing edges")
    assert(batchIds.forall(b => srcs.exists(_._2 == b)),
      "appended ids must be reachable (incoming edges)")
    val servedNew = GraphAnnOps.knnGraphServe(spark, "ann_graph_inc",
      queryIds = Seq(24L)).collect() // 24 ≡ 4 (mod 10): appended; cluster 0
    assert(servedNew.nonEmpty && servedNew.head.getDouble(3) > 0.9,
      s"appended vector should find near cluster-mates: ${servedNew.toSeq}")

    // takedown: gone ids vanish from results AND their edges die at
    // both endpoints
    val gone = Seq(9L, 17L)
    GraphAnnOps.deleteFromGraphIndex(spark, "ann_graph", gone)
    val after = GraphAnnOps.knnGraphServe(spark, "ann_graph")
      .collect().toSeq
    after.foreach(r => assert(!gone.contains(r.getLong(2))))
    val liveE = GraphAnnOps.liveGraphEdges(spark, "ann_graph")
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(liveE.forall(e => !gone.contains(e._1) && !gone.contains(e._2)))

    // compaction: tombstones fold, per-src degree invariant restored,
    // answers identical
    GraphAnnOps.compactGraphIndex(spark, "ann_graph")
    assert(!spark.catalog.tableExists("ann_graph_deletes"))
    val deg = spark.table("ann_graph_gedges")
      .groupBy(col("src")).count().agg(org.apache.spark.sql.functions
        .max(col("count"))).first().getLong(0)
    assert(deg <= GraphAnnOps.GraphDegree, s"max degree $deg")
    val afterCompact = GraphAnnOps.knnGraphServe(spark, "ann_graph")
      .collect().toSeq
    assert(afterCompact == after)
  }
}
