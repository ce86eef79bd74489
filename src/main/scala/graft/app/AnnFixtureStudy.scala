package graft.app

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.{EmbeddingFixtures, SimilarityOps}

/** The two-regime ANN audit sweep (BASELINE §y): every recall audit in
  * the family — q139 trained-IVF, q159 probe curve, q171 PQ(+ADC),
  * q172 int8, q173 trained-PQ — measured on BOTH embedding geometries
  * at the same scale: the near-isotropic worst case (what the driver
  * testdata is, and where every prior BASELINE recall number was
  * measured) and the jittered-cluster regime IVF/PQ are actually
  * deployed for. One line per (fixture, audit).
  * Usage: runMain graft.app.AnnFixtureStudy [n] [nProbeReport] */
object AnnFixtureStudy {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(50000L)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def meanOf(df: DataFrame, c: String): Double =
      df.agg(avg(col(c))).first().getDouble(0)
    def time[A](what: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = what
      ((System.nanoTime() - t0) / 1e9, a)
    }
    Seq(
      "isotropic" -> EmbeddingFixtures.isotropic(spark, n),
      "clustered" -> EmbeddingFixtures.clustered(spark, n))
      .foreach { case (name, em0) =>
        val em = em0.localCheckpoint()
        val (tIvf, rIvf) = time(
          meanOf(SimilarityOps.annRecallAudit(em), "recall"))
        println(f"[fixture-study] n=$n fx=$name audit=q139_ivf " +
          f"recall=$rIvf%.3f wall=$tIvf%.1f s")
        val (tCur, curve) = time(
          SimilarityOps.annProbeCurve(em, maxProbe = 8).collect())
        curve.foreach { r =>
          println(f"[fixture-study] n=$n fx=$name audit=q159_curve " +
            f"nprobe=${r.getInt(0)} recall=${r.getDouble(3)}%.3f " +
            f"scanned_frac=${r.getDouble(5) / n}%.3f wall=$tCur%.1f s")
        }
        val (tPq, pq) = time(SimilarityOps.annPqRecallAudit(em)
          .agg(avg(col("recall")).as("r"),
            avg(col("n_hit_adc").cast("double") / 5).as("adc"))
          .first())
        println(f"[fixture-study] n=$n fx=$name audit=q171_pq " +
          f"recall=${pq.getDouble(0)}%.3f adc_recall=${pq.getDouble(1)}%.3f " +
          f"wall=$tPq%.1f s")
        val (tI8, i8) = time(SimilarityOps.annInt8RecallAudit(em)
          .agg(avg(col("recall")).as("r"),
            avg(col("n_agree").cast("double") / 5).as("agree"))
          .first())
        println(f"[fixture-study] n=$n fx=$name audit=q172_int8 " +
          f"recall=${i8.getDouble(0)}%.3f fp_agree=${i8.getDouble(1)}%.3f " +
          f"wall=$tI8%.1f s")
        val (tTr, tr) = time(
          meanOf(SimilarityOps.annPqTrainedRecallAudit(em), "recall"))
        println(f"[fixture-study] n=$n fx=$name audit=q173_pq_trained " +
          f"recall=$tr%.3f wall=$tTr%.1f s")
        Seq(("k8", SimilarityOps.CentroidIds),
            ("k64", (1 to 64).map(_ * 7L)),
            ("k256", (1 to 256).map(_ * 7L))).foreach { case (cfg, cbIds) =>
          val (tRe, re) = time(SimilarityOps.annPqResidualRecallAudit(em,
              codebookIds = cbIds)
            .agg(avg(col("recall")).as("r"),
              avg(col("n_hit_adc").cast("double") / 5).as("adc"))
            .first())
          println(f"[fixture-study] n=$n fx=$name audit=q180_pq_residual " +
            f"cfg=$cfg recall=${re.getDouble(0)}%.3f " +
            f"adc_recall=${re.getDouble(1)}%.3f wall=$tRe%.1f s")
        }
        val (tRt, rt) = time(
          SimilarityOps.annPqResidualTrainedRecallAudit(em)
            .agg(avg(col("recall")).as("r"),
              avg(col("n_hit_adc").cast("double") / 5).as("adc"))
            .first())
        println(f"[fixture-study] n=$n fx=$name " +
          f"audit=q181_pq_residual_trained recall=${rt.getDouble(0)}%.3f " +
          f"adc_recall=${rt.getDouble(1)}%.3f wall=$tRt%.1f s")
        // the graph tier at its registry defaults AND at a scaled
        // serve budget — the (recall, n_scored) pair is the story:
        // graph cost is a CONSTANT the caller picks, IVF cost is a
        // corpus fraction
        Seq(("const", graft.llm.GraphAnnOps.GraphRounds,
             graft.llm.GraphAnnOps.GraphBeam,
             graft.llm.GraphAnnOps.GraphHops),
            // the r20 serve DEFAULT: log2(N)-scaled budget, same build
            ("logn", graft.llm.GraphAnnOps.GraphRounds,
             graft.llm.GraphAnnOps.scaledBeam(n),
             graft.llm.GraphAnnOps.scaledHops(n)),
            ("scaled", 4, 64, 7)).foreach { case (cfg, r, b, h) =>
          val (tGr, gr) = time(
            graft.llm.GraphAnnOps.annGraphRecallAudit(em,
              rounds = r, beam = b, hops = h)
            .agg(avg(col("recall")), avg(col("n_scored"))).first())
          println(f"[fixture-study] n=$n fx=$name audit=q179_graph " +
            f"cfg=$cfg recall=${gr.getDouble(0)}%.3f " +
            f"scored=${gr.getDouble(1)}%.0f " +
            f"scored_frac=${gr.getDouble(1) / n}%.3f wall=$tGr%.1f s")
        }
      }
    spark.stop()
  }
}
