package graft

import org.apache.spark.sql.functions._

import graft.llm.{EmbeddingFixtures, SimilarityOps}

/** Round-19 additions: the two-regime embedding fixtures and the ANN
  * audit family's behavior on each — the isotropic cliff AND the
  * clustered win, both pinned (the r18 verdict's "every recall number
  * is measured only on the isotropic worst case" item). */
class Round19OpsSpec extends SparkSpec {

  private val N = 2000L

  test("EmbeddingFixtures: deterministic, schema-compatible, and " +
      "geometrically distinct — clustered within-cluster cosine far " +
      "above cross-cluster, isotropic near zero") {
    val iso = EmbeddingFixtures.isotropic(spark, N)
    val clu = EmbeddingFixtures.clustered(spark, N)
    // replay-stable: a second construction is row-identical
    assert(iso.collect().toSeq ==
      EmbeddingFixtures.isotropic(spark, N).collect().toSeq)
    assert(clu.collect().toSeq ==
      EmbeddingFixtures.clustered(spark, N).collect().toSeq)
    assert(iso.columns.toSeq == Seq("vec_id", "embedding", "label"))
    assert(clu.columns.toSeq == Seq("vec_id", "embedding", "label"))
    graft.functions.GraftFunctions.register(spark)
    def meanCos(em: org.apache.spark.sql.DataFrame, same: Boolean) = {
      val pairs = em.select(col("vec_id").as("a"), col("embedding").as("ea"),
          col("label").as("la"))
        .join(em.select(col("vec_id").as("b"), col("embedding").as("eb"),
          col("label").as("lb")), col("a") < col("b"))
        .filter(if (same) col("la") === col("lb") else col("la") =!= col("lb"))
      pairs.limit(200000).agg(avg(expr("cosine_sim(ea, eb)")))
        .first().getDouble(0)
    }
    val cluSame = meanCos(clu, same = true)
    val cluCross = meanCos(clu, same = false)
    assert(cluSame > 0.9, s"within-cluster cosine $cluSame")
    assert(cluCross < 0.5, s"cross-cluster cosine $cluCross")
    val isoSame = meanCos(iso, same = true)
    assert(math.abs(isoSame) < 0.2, s"isotropic cosine $isoSame")
  }

  test("the clustered win: trained-IVF recall is ~perfect at the " +
      "shipped nProbe on clustered data while the SAME config sits on " +
      "the isotropic cliff; the first probe list alone clears 0.85 " +
      "while scanning ~1/8 of the corpus") {
    val iso = EmbeddingFixtures.isotropic(spark, N).localCheckpoint()
    val clu = EmbeddingFixtures.clustered(spark, N).localCheckpoint()
    def mean(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(col("recall"))).first().getDouble(0)
    val rClu = mean(SimilarityOps.annRecallAudit(clu))
    val rIso = mean(SimilarityOps.annRecallAudit(iso))
    assert(rClu >= 0.9, s"clustered IVF recall $rClu")
    assert(rIso <= rClu - 0.2,
      s"isotropic $rIso vs clustered $rClu — the cliff should be wide")
    // q159 curve on clustered: probe list 1 already serves
    val c1 = SimilarityOps.annProbeCurve(clu, maxProbe = 2).collect()
      .map(r => r.getInt(0) -> (r.getDouble(3), r.getDouble(5))).toMap
    assert(c1(1)._1 >= 0.85, s"clustered nprobe=1 recall ${c1(1)._1}")
    assert(c1(1)._2 / N <= 0.2,
      s"clustered nprobe=1 scanned fraction ${c1(1)._2 / N}")
  }

  test("int8 on clustered data: quantized ranking agrees with the " +
      "full-precision path (n_agree tracks k) — recall is bounded by " +
      "the probe budget, not the quantization") {
    val clu = EmbeddingFixtures.clustered(spark, N).localCheckpoint()
    val out = SimilarityOps.annInt8RecallAudit(clu)
      .agg(avg(col("recall")), avg(col("n_agree").cast("double") / 5))
      .first()
    assert(out.getDouble(0) >= 0.9, s"int8 clustered recall ${out.getDouble(0)}")
    assert(out.getDouble(1) >= 0.9, s"int8 fp-agreement ${out.getDouble(1)}")
  }

  test("the PQ within-cluster indiscrimination, pinned honestly: an " +
      "8-entry raw-vector codebook assigns every cluster-mate the " +
      "same codes, so ADC cannot rank INSIDE a cluster and recall " +
      "collapses even though the data is maximally clusterable — the " +
      "measured case for residual (IVFADC) coding") {
    val clu = EmbeddingFixtures.clustered(spark, N).localCheckpoint()
    val pq = SimilarityOps.annPqRecallAudit(clu)
      .agg(avg(col("recall"))).first().getDouble(0)
    assert(pq <= 0.3, s"raw-vector PQ on clustered data should collapse " +
      s"(codes are cluster-constant); got $pq — if this rose, the " +
      "codebook geometry changed and BASELINE §y needs re-measuring")
  }

  test("residual (IVFADC) coding fixes what raw PQ loses: on clustered " +
      "data the residual codebook spans the within-cluster jitter, so " +
      "q180 recall lands a multiple of q171's at the same probe budget " +
      "and tail") {
    val clu = EmbeddingFixtures.clustered(spark, N).localCheckpoint()
    val raw = SimilarityOps.annPqRecallAudit(clu)
      .agg(avg(col("recall"))).first().getDouble(0)
    val res = SimilarityOps.annPqResidualRecallAudit(clu)
      .agg(avg(col("recall"))).first().getDouble(0)
    assert(res >= raw * 2 && res >= 0.4,
      s"residual $res should be a multiple of raw $raw on clustered data")
    // and it never hurts the isotropic case
    val iso = EmbeddingFixtures.isotropic(spark, N).localCheckpoint()
    val rawI = SimilarityOps.annPqRecallAudit(iso)
      .agg(avg(col("recall"))).first().getDouble(0)
    val resI = SimilarityOps.annPqResidualRecallAudit(iso)
      .agg(avg(col("recall"))).first().getDouble(0)
    assert(resI >= rawI, s"residual $resI vs raw $rawI on isotropic")
  }

  test("training the residual codebook (q181) only helps: per-subspace " +
      "Lloyd in residual space beats the static seed book on both " +
      "geometries (measured +36%/+13% relative at this N)") {
    val iso = EmbeddingFixtures.isotropic(spark, N).localCheckpoint()
    val clu = EmbeddingFixtures.clustered(spark, N).localCheckpoint()
    def mean(df: org.apache.spark.sql.DataFrame) =
      df.agg(avg(col("recall"))).first().getDouble(0)
    val sI = mean(SimilarityOps.annPqResidualRecallAudit(iso))
    val tI = mean(SimilarityOps.annPqResidualTrainedRecallAudit(iso))
    assert(tI >= sI, s"trained $tI vs static $sI on isotropic")
    val sC = mean(SimilarityOps.annPqResidualRecallAudit(clu))
    val tC = mean(SimilarityOps.annPqResidualTrainedRecallAudit(clu))
    assert(tC >= sC, s"trained $tC vs static $sC on clustered")
  }
}
