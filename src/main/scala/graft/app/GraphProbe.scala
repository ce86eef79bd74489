package graft.app

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.llm.{EmbeddingFixtures, GraphAnnOps, SimilarityOps}

/** Tuning probe for the q179 graph tier: decomposes recall loss into
  * BUILD loss (does the NN-descent graph contain the true
  * top-`degree` edges?) and SERVE loss (does the beam walk find what
  * the graph contains?), across a parameter grid.
  * Usage: runMain graft.app.GraphProbe [n] */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000L)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.functions.GraftFunctions.register(spark)
    Seq("isotropic" -> EmbeddingFixtures.isotropic(spark, n),
        "clustered" -> EmbeddingFixtures.clustered(spark, n))
      .foreach { case (name, em0) =>
        val em = em0.localCheckpoint()
        // true top-10 neighbor edges (for edge-recall)
        val trueEdges = em.select(col("vec_id").as("src"),
            col("embedding").as("se"))
          .join(em.select(col("vec_id").as("dst"),
            col("embedding").as("de")), col("src") =!= col("dst"))
          .withColumn("cos", expr("cosine_sim(se, de)"))
          .withColumn("rn", row_number().over(Window.partitionBy(col("src"))
            .orderBy(col("cos").desc, col("dst"))))
          .filter(col("rn") <= 10)
          .select(col("src"), col("dst"), col("rn"))
          .localCheckpoint()
        for (degree <- Seq(6, 12); rounds <- Seq(2, 4); salts <- Seq(2, 3)) {
          val t0 = System.nanoTime()
          val edges = GraphAnnOps.nnDescentEdges(em, degree, rounds, salts)
            .localCheckpoint()
          val tBuild = (System.nanoTime() - t0) / 1e9
          // edge recall vs true top-min(degree,10)
          val cap = math.min(degree, 10)
          val er = trueEdges.filter(col("rn") <= cap)
            .join(edges, Seq("src", "dst"), "left_semi").count().toDouble /
            trueEdges.filter(col("rn") <= cap).count()
          for (beam <- Seq(10, 24); hops <- Seq(3, 5)) {
            val q = em.filter(col("vec_id") % 50 === 7)
              .select(col("vec_id").as("qid"), col("embedding").as("qe"))
            val truth = em.crossJoin(broadcast(q))
              .filter(col("vec_id") =!= col("qid"))
              .withColumn("cos", expr("cosine_sim(qe, embedding)"))
              .withColumn("rnk", row_number().over(
                Window.partitionBy(col("qid"))
                  .orderBy(col("cos").desc, col("vec_id"))))
              .filter(col("rnk") <= 5)
              .select(col("qid"), col("vec_id").as("neighbor"))
            val got = GraphAnnOps.knnGraphFrom(edges, em, q, 5, beam, hops)
              .select(col("qid"), col("neighbor"))
            val rec = truth.join(got, Seq("qid", "neighbor"), "left_semi")
              .count().toDouble / truth.count()
            println(f"[graph-probe] n=$n fx=$name d=$degree r=$rounds " +
              f"s=$salts beam=$beam hops=$hops edge_recall=$er%.3f " +
              f"serve_recall=$rec%.3f build=$tBuild%.1f s")
          }
        }
      }
    spark.stop()
  }
}
