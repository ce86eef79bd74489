package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** The ANN tier ROUTER (r19 frontier item 7): the engine ships a
  * three-family index portfolio — IVF serves clustered geometry
  * (recall 1.0 at nProbe=3 on the clustered fixture; 0.65 isotropic),
  * the graph tier serves isotropic geometry (0.70 vs IVF's 0.62 at
  * testdata scale) — but a real corpus mixes regimes, and a single
  * global tier choice leaves one side's queries under-served. This
  * routes EACH QUERY by a cheap geometry signal computed from the
  * k-means model alone: the CLUSTER MARGIN, top1 − top2 centroid
  * cosine. A query with a dominant cell (high margin) has its
  * neighbors concentrated where IVF probes; a query without one (low
  * margin — the isotropic regime, where every centroid looks alike)
  * is exactly the case the graph walk's local steps serve. The signal
  * costs |centroids| cosines per query — strictly cheaper than either
  * tier's serve arm — and reuses q137/q147's "margin/anisotropy"
  * machinery at per-query granularity.
  *
  * Scale shape: margins are a broadcast-model projection; each side
  * then serves through its tier's standard path (IVF: broadcast
  * probes over the cid-partitioned corpus; graph: the
  * constant-budget beam walk). Nothing new shuffles.
  *
  * Measured (BASELINE §z.7, mixed fixture = isotropic ∪ clustered):
  * the router matches the best single tier on each half — neither
  * all-IVF nor all-graph does — at the documented margin threshold.
  */
object AnnRouterOps {

  /** Margin threshold separating the regimes. Measured on the mixed
    * fixture: clustered-half queries read margins ≫ 0.2 (a dominant
    * cell), isotropic-half ≪ 0.1 (no cell stands out). */
  val MarginTau = 0.15

  /** Per-query cluster margin under a trained model: top1 − top2
    * centroid cosine (broadcast-model projection, |q|·k cosines). */
  def clusterMargins(q: DataFrame, model: DataFrame): DataFrame = {
    GraftFunctions.register(q.sparkSession)
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("ccos").desc, col("cid"))
    q.crossJoin(broadcast(model.select(col("cid"), col("ce"))))
      .withColumn("ccos", expr("cosine_sim(qe, ce)"))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") <= 2)
      .groupBy(col("qid"))
      .agg((max(when(col("crn") === 1, col("ccos")))
        - max(when(col("crn") === 2, col("ccos")))).as("margin"))
  }

  /** Routed kNN over a (query) frame: margin ≥ tau → trained-IVF
    * probes; margin < tau → graph beam walk. Returns
    * (qid, tier, rnk, neighbor, cos). Both serve arms are the
    * standard tier paths — the router only partitions the query set. */
  def routedKnn(assigned: DataFrame, model: DataFrame, edges: DataFrame,
      q: DataFrame, k: Int = 5, nProbe: Int = SimilarityOps.NProbe,
      tau: Double = MarginTau, beam: Int = GraphAnnOps.GraphBeam,
      hops: Int = GraphAnnOps.GraphHops,
      entryIds: Seq[Long] = SimilarityOps.CentroidIds): DataFrame = {
    val m = clusterMargins(q, model).localCheckpoint()
    val qIvf = q.join(m.filter(col("margin") >= tau), "qid")
      .select(col("qid"), col("qe"))
    val qGraph = q.join(m.filter(col("margin") < tau), "qid")
      .select(col("qid"), col("qe"))
    val ivfTop = SimilarityOps.ivfTrainedTopkFor(assigned, model, qIvf,
        k, nProbe)
      .withColumn("tier", lit("ivf"))
    val graphTop = GraphAnnOps.knnGraphFrom(edges,
        assigned.select(col("vec_id"), col("embedding")), qGraph,
        k, beam, hops, entryIds)
      .withColumn("tier", lit("graph"))
    ivfTop.unionByName(graphTop)
      .select(col("qid"), col("tier"), col("rnk"), col("neighbor"),
        col("cos"))
      .orderBy("qid", "rnk")
  }

  /** The router's measured story on one frame: per-query recall@k of
    * (a) all-IVF, (b) all-graph, (c) routed — plus the chosen tier
    * and margin. The mixed-fixture study (BASELINE §z.7) runs this;
    * Round20OpsSpec pins the routing split and the dominance
    * direction at fixture scale. */
  def routedRecallAudit(em: DataFrame, k: Int = 5,
      nProbe: Int = SimilarityOps.NProbe, tau: Double = MarginTau,
      degree: Int = GraphAnnOps.GraphDegree,
      rounds: Int = GraphAnnOps.GraphRounds,
      salts: Int = GraphAnnOps.GraphSalts,
      beam: Int = GraphAnnOps.GraphBeam, hops: Int = GraphAnnOps.GraphHops,
      sampleMod: Long = 50L, sampleRes: Long = 7L,
      centroidIds: Seq[Long] = SimilarityOps.CentroidIds,
      iters: Int = SimilarityOps.KmeansIters): DataFrame = {
    GraftFunctions.register(em.sparkSession)
    val model = SimilarityOps.kmeansCentroids(em, centroidIds, iters)
      .localCheckpoint()
    val assigned = SimilarityOps.assignUnderModel(em, model)
      .localCheckpoint()
    val edges = GraphAnnOps.nnDescentEdges(em, degree, rounds, salts)
    val q = em.filter(col("vec_id") % sampleMod === sampleRes)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .localCheckpoint()
    val truth = em.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", expr("cosine_sim(qe, embedding)"))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rnk") <= k)
      .select(col("qid"), col("vec_id").as("neighbor"))
      .localCheckpoint()
    def hitsOf(c: DataFrame, out: String): DataFrame =
      truth.join(c.select(col("qid"), col("neighbor")),
          Seq("qid", "neighbor"), "left_semi")
        .groupBy(col("qid")).agg(count(lit(1)).as(out))
    val ivfAll = SimilarityOps.ivfTrainedTopkFor(assigned, model, q,
      k, nProbe)
    val graphAll = GraphAnnOps.knnGraphFrom(edges,
      em.select(col("vec_id"), col("embedding")), q, k, beam, hops,
      centroidIds)
    val routed = routedKnn(assigned, model, edges, q, k, nProbe, tau,
      beam, hops, centroidIds)
    val tierOf = routed.select(col("qid"), col("tier")).distinct()
    q.select(col("qid"))
      .join(clusterMargins(q, model), "qid")
      .join(tierOf, Seq("qid"), "left")
      .join(hitsOf(ivfAll, "n_hit_ivf"), Seq("qid"), "left")
      .join(hitsOf(graphAll, "n_hit_graph"), Seq("qid"), "left")
      .join(hitsOf(routed, "n_hit_routed"), Seq("qid"), "left")
      .select(col("qid"), round(col("margin"), 4).as("margin"),
        col("tier"),
        coalesce(col("n_hit_ivf"), lit(0L)).as("n_hit_ivf"),
        coalesce(col("n_hit_graph"), lit(0L)).as("n_hit_graph"),
        coalesce(col("n_hit_routed"), lit(0L)).as("n_hit_routed"))
      .orderBy("qid")
  }
}
