package graft.app

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** q138 stage attribution (r17 verdict item 7 — "measure before
  * accepting the floor"): time the ε-pair stage, the core-degree
  * aggregate, and the full DBSCAN at a replicated scale, to decide
  * whether fusing the degree count into the pair stage has any
  * headroom. The degree stage is the fusion candidate; if its share of
  * the wall is noise, the remaining gap is fixpoint-rounds floor and
  * gets re-classified as floor-attributed with these numbers.
  * Usage: runMain graft.app.DbscanProbe [sfDir] [factor] */
object DbscanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = java.nio.file.Files
      .createTempDirectory(s"dbscan-probe-$factor").toString
    try {
      // the Stress replication model: jittered replicas so near-dup
      // structure is "clusters of factor near-identical vectors"
      val reps = spark.range(factor).select(col("id").as("rep"))
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .crossJoin(reps)
        .withColumn("vec_id", col("vec_id") * factor + col("rep"))
        .withColumn("embedding", transform(col("embedding"),
          x => x + col("rep").cast("float") * lit(1e-3f)))
        .drop("rep").repartition(32)
        .write.mode("overwrite").parquet(s"$dir/em.parquet")
      val em = spark.read.parquet(s"$dir/em.parquet")
      def time(what: => Long): (Double, Long) = {
        val t0 = System.nanoTime()
        val n = what
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val pairs = SimilarityOps.semanticPairs(em,
        SimilarityOps.DbscanThreshold, SimilarityOps.CentroidIds, 2)
        .select("v1", "v2").persist()
      val (tPairs, nPairs) = time(pairs.count())
      val (tDeg, nCore) = time(
        pairs.select(explode(array(col("v1"), col("v2"))).as("id"))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= SimilarityOps.DbscanMinPts).count())
      pairs.unpersist()
      val (tFull, nClusters) = time(SimilarityOps.dbscanClusters(em).count())
      println(f"[dbscan-probe] factor=$factor vecs=${em.count()} " +
        f"pairs_stage=$tPairs%.2f s (n=$nPairs) " +
        f"degree_stage=$tDeg%.2f s (cores=$nCore) " +
        f"full=$tFull%.2f s (clusters=$nClusters) " +
        f"degree_share=${tDeg / tFull * 100}%.1f%%")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }
}
