package graft.app

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{EmbeddingFixtures, GraphAnnOps, SimilarityOps}

/** Round-20 measurement arms for BASELINE §y:
  *
  *  - `serve`: the PERSISTED residual-PQ path's recall@5 — the r19
  *    verdict's top item was that the shipped `_pq` sidecar stored the
  *    coding scheme the audit condemns; this measures what
  *    writeResidualPqCodes → knnResidualPqServe actually returns on
  *    both fixture geometries at scale, next to the q180/q181 audit
  *    numbers it must match.
  *  - `graph`: default-budget graph recall across corpus sizes with the
  *    log₂(N)-scaled serve budget (scaledBeam/scaledHops) vs the old
  *    constant — the "recall held ~flat 2k → 50k → 200k" row.
  *
  * Usage: runMain graft.app.Round20Study [serve|graph|all] [n]
  */
object Round20Study {
  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("all")
    val n = args.lift(1).map(_.toLong).getOrElse(50000L)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def time[A](what: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = what
      ((System.nanoTime() - t0) / 1e9, a)
    }

    if (which == "serve" || which == "all") {
      Seq("isotropic" -> EmbeddingFixtures.isotropic(spark, n),
          "clustered" -> EmbeddingFixtures.clustered(spark, n))
        .foreach { case (name, em0) =>
          val em = em0.localCheckpoint()
          val tbl = s"r20srv_$name"
          val cbIds = SimilarityOps.adaptiveResidualCodebookIds(em)
          val (tBuild, _) = time {
            SimilarityOps.writeTrainedIvfIndex(em, tbl, nBuckets = 32)
            SimilarityOps.writeResidualPqCodes(spark, tbl,
              codebookIds = cbIds, nBuckets = 32)
          }
          val qids = em.filter(col("vec_id") % 50 === 7)
            .select("vec_id").collect().map(_.getLong(0)).toSeq
          val (tServe, served) = time {
            SimilarityOps.knnResidualPqServe(spark, tbl, queryIds = qids)
              .select(col("qid"), col("neighbor")).collect()
          }
          val truth = em.crossJoin(broadcast(
              em.filter(col("vec_id") % 50 === 7)
                .select(col("vec_id").as("qid"),
                  col("embedding").as("qe"))))
            .filter(col("vec_id") =!= col("qid"))
            .withColumn("cos", expr("cosine_sim(qe, embedding)"))
            .withColumn("rnk", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("qid"))
                .orderBy(col("cos").desc, col("vec_id"))))
            .filter(col("rnk") <= 5)
            .select(col("qid"), col("vec_id").as("neighbor"))
            .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
          val hits = served.count(r =>
            truth.contains((r.getLong(0), r.getLong(1))))
          val recall = hits.toDouble / truth.size
          println(f"[r20-study] n=$n fx=$name arm=rpq_persisted_serve " +
            f"K=${cbIds.size} recall=$recall%.3f build=$tBuild%.1f s " +
            f"serve=$tServe%.1f s queries=${qids.size}")
        }
    }

    if (which == "opq" || which == "all") {
      Seq("isotropic" -> EmbeddingFixtures.isotropic(spark, n),
          "clustered" -> EmbeddingFixtures.clustered(spark, n))
        .foreach { case (name, em0) =>
          val em = em0.localCheckpoint()
          // optional 3rd arg: explicit K (codebook size) instead of
          // the adaptive default — the K-sensitivity arm
          val cbIds = args.lift(2).map(_.toInt)
            .map(k => (1 to k).map(_ * 7L))
            .getOrElse(SimilarityOps.adaptiveResidualCodebookIds(em))
          val (tTr, tr) = time(
            SimilarityOps.annPqResidualTrainedRecallAudit(em,
                codebookIds = cbIds)
              .agg(avg(col("recall"))).first().getDouble(0))
          val (tOpq, opq) = time(
            SimilarityOps.annPqResidualOpqRecallAudit(em,
                codebookIds = cbIds)
              .agg(avg(col("recall"))).first().getDouble(0))
          println(f"[r20-study] n=$n fx=$name arm=opq K=${cbIds.size} " +
            f"trained=$tr%.3f opq=$opq%.3f " +
            f"delta=${(opq - tr) / math.max(tr, 1e-9) * 100}%+.0f%% " +
            f"wall_tr=$tTr%.1f s wall_opq=$tOpq%.1f s")
        }
    }

    if (which == "router" || which == "all") {
      val em = EmbeddingFixtures.mixed(spark, n).localCheckpoint()
      val half = n / 2
      val seeds = SimilarityOps.CentroidIds ++
        SimilarityOps.CentroidIds.map(_ + half)
      val (t, rows) = time(
        graft.llm.AnnRouterOps.routedRecallAudit(em,
            centroidIds = seeds,
            beam = GraphAnnOps.scaledBeam(n),
            hops = GraphAnnOps.scaledHops(n))
          .collect())
      Seq(("clustered-half", rows.filter(_.getLong(0) < half)),
          ("isotropic-half", rows.filter(_.getLong(0) >= half)),
          ("overall", rows)).foreach { case (part, rs) =>
        def mean(i: Int) = rs.map(_.getLong(i)).sum / 5.0 / rs.length
        val toGraph = rs.count(_.getString(2) == "graph")
        println(f"[r20-study] n=$n arm=router part=$part q=${rs.length} " +
          f"to_graph=$toGraph ivf=${mean(3)}%.3f graph=${mean(4)}%.3f " +
          f"routed=${mean(5)}%.3f wall=$t%.1f s")
      }
    }

    if (which == "graph" || which == "all") {
      Seq("isotropic", "clustered").foreach { name =>
        val em0 =
          if (name == "isotropic") EmbeddingFixtures.isotropic(spark, n)
          else EmbeddingFixtures.clustered(spark, n)
        val em = em0.localCheckpoint()
        Seq(("const", GraphAnnOps.GraphBeam, GraphAnnOps.GraphHops),
            ("logn", GraphAnnOps.scaledBeam(n),
             GraphAnnOps.scaledHops(n))).foreach { case (cfg, b, h) =>
          val (t, r) = time(GraphAnnOps.annGraphRecallAudit(em,
              beam = b, hops = h)
            .agg(avg(col("recall")), avg(col("n_scored"))).first())
          println(f"[r20-study] n=$n fx=$name arm=graph_budget cfg=$cfg " +
            f"beam=$b hops=$h recall=${r.getDouble(0)}%.3f " +
            f"scored=${r.getDouble(1)}%.0f wall=$t%.1f s")
        }
      }
    }

    // build-side degree knob (the §z.4 "next lever"): one measured
    // point per fixture at a scaled degree, logn serve budget
    if (which == "degree") {
      val deg = args.lift(2).map(_.toInt).getOrElse(16)
      Seq("isotropic", "clustered").foreach { name =>
        val em0 =
          if (name == "isotropic") EmbeddingFixtures.isotropic(spark, n)
          else EmbeddingFixtures.clustered(spark, n)
        val em = em0.localCheckpoint()
        val (t, r) = time(GraphAnnOps.annGraphRecallAudit(em,
            degree = deg, beam = GraphAnnOps.scaledBeam(n),
            hops = GraphAnnOps.scaledHops(n))
          .agg(avg(col("recall")), avg(col("n_scored"))).first())
        println(f"[r20-study] n=$n fx=$name arm=graph_degree deg=$deg " +
          f"recall=${r.getDouble(0)}%.3f scored=${r.getDouble(1)}%.0f " +
          f"wall=$t%.1f s")
      }
    }
    spark.stop()
  }
}
