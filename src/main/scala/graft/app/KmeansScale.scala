package graft.app

import org.apache.spark.sql.functions._

import graft.llm.SimilarityOps

/** q56 trainer scale probe (r17 verdict item 4): full Lloyd vs the
  * deterministic hash-sampled trainer at growing corpus scale — train
  * walls plus the centroid-quality delta, measured as the full-corpus
  * mean assignment cosine under each model (assignment is full-corpus
  * in BOTH cases; only the trainer's input is capped).
  * Usage: runMain graft.app.KmeansScale [sfDir] [factors] [cap] */
object KmeansScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("20,100")
      .split(",").map(_.trim.toInt).toSeq
    val cap = args.lift(2).map(_.toInt).getOrElse(20000)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    factors.foreach { f =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"kmeans-scale-$f").toString
      try {
        val reps = spark.range(f).select(col("id").as("rep"))
        spark.read.parquet(s"$sfDir/embeddings.parquet")
          .crossJoin(reps)
          .withColumn("vec_id", col("vec_id") * f + col("rep"))
          .withColumn("embedding", transform(col("embedding"),
            x => x + col("rep").cast("float") * lit(1e-3f)))
          .drop("rep").repartition(32)
          .write.mode("overwrite").parquet(s"$dir/em.parquet")
        val em = spark.read.parquet(s"$dir/em.parquet")
        def time[A](what: => A): (Double, A) = {
          val t0 = System.nanoTime()
          val a = what
          ((System.nanoTime() - t0) / 1e9, a)
        }
        val (tFull, mFull) = time(
          SimilarityOps.kmeansCentroids(em).localCheckpoint())
        val (tSamp, mSamp) = time(
          SimilarityOps.kmeansCentroidsSampled(em, cap).localCheckpoint())
        // quality: full-corpus mean assignment cosine under each model
        def quality(model: org.apache.spark.sql.DataFrame): Double =
          SimilarityOps.assignUnderModel(em, model)
            .join(model.select(col("cid"), col("ce")), "cid")
            .agg(avg(expr("cosine_sim(ce, embedding)"))).first().getDouble(0)
        println(f"[kmeans-scale] factor=$f vecs=${em.count()} cap=$cap " +
          f"full_train=$tFull%.2f s sampled_train=$tSamp%.2f s " +
          f"full_mean_cos=${quality(mFull)}%.4f " +
          f"sampled_mean_cos=${quality(mSamp)}%.4f")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
