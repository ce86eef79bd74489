package graft.app

import org.apache.spark.sql.functions._

/** q171 cost/recall probe: PQ-coded serving (ADC over slim codes +
  * exact re-rank tail) against the full-precision trained-IVF path at
  * growing corpus scale — the measured point behind "cut the
  * per-candidate bytes". Per factor: index+codes build walls, the two
  * serve walls (same probes, same model), per-path recall@k against
  * the brute-force truth, and the stored bytes of codes vs full rows.
  * Usage: runMain graft.app.AnnScale [sfDir] [factors] */
object AnnScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,20,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val src = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def time[A](what: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = what
      ((System.nanoTime() - t0) / 1e9, a)
    }
    factors.foreach { f =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"ann-scale-$f").toString
      try {
        val reps = spark.range(f).select(col("id").as("rep"))
        src.crossJoin(reps)
          .withColumn("vec_id", col("vec_id") * f + col("rep"))
          .drop("rep").repartition(32)
          .write.mode("overwrite").parquet(s"$dir/em.parquet")
        val em = spark.read.parquet(s"$dir/em.parquet")
        val t = "graft_ann_scale"
        val (tIdx, _) = time {
          graft.llm.SimilarityOps.writeTrainedIvfIndex(em, t)
        }
        val (tPq, _) = time {
          graft.llm.SimilarityOps.writePqCodes(spark, t)
        }
        graft.llm.SimilarityOps.writeInt8Codes(spark, t)
        val model = spark.table(s"${t}_model")
        def neighborSets(rows: Array[org.apache.spark.sql.Row])
            : Map[Long, Set[Long]] =
          rows.groupBy(_.getLong(0))
            .view.mapValues(_.map(_.getLong(2)).toSet).toMap
        // warm-up once each (catalog/file-index), then the timed pass —
        // construction INCLUDED: knnPqServe runs its ADC stage at
        // construction (the pointed-fetch collect), so timing only the
        // final collect would skip the serve's main cost
        def fullServe() = graft.llm.SimilarityOps.knnIvfTrained(
          graft.llm.SimilarityOps.liveTrainedIvfIndex(spark, t), model)
          .collect()
        fullServe()
        val (tFull, fullRows) = time(fullServe())
        def pqServe() =
          graft.llm.SimilarityOps.knnPqServe(spark, t).collect()
        pqServe()
        val (tPqServe, pqRows) = time(pqServe())
        def int8Serve() =
          graft.llm.SimilarityOps.knnInt8Serve(spark, t).collect()
        int8Serve()
        val (tInt8, int8Rows) = time(int8Serve())
        val truth = neighborSets(
          graft.llm.SimilarityOps.knnBrute(em).collect())
        def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
          val got = neighborSets(rows)
          val hits = truth.map { case (q, ns) =>
            got.getOrElse(q, Set.empty).count(ns) }.sum
          hits.toDouble / truth.values.map(_.size).sum
        }
        def tableBytes(name: String): Long = {
          val loc = java.net.URI.create(spark.sql(
            s"DESCRIBE EXTENDED $name").filter(col("col_name") === "Location")
            .first().getString(1)).getPath
          org.apache.commons.io.FileUtils
            .sizeOfDirectory(new java.io.File(loc))
        }
        println(f"[ann-scale] factor=$f vecs=${em.count()} " +
          f"idx_build=$tIdx%.2f s pq_build=$tPq%.2f s " +
          f"full_serve=$tFull%.2f s pq_serve=$tPqServe%.2f s " +
          f"int8_serve=$tInt8%.2f s " +
          f"full_recall=${recall(fullRows)}%.3f " +
          f"pq_recall=${recall(pqRows)}%.3f " +
          f"int8_recall=${recall(int8Rows)}%.3f " +
          f"full_bytes=${tableBytes(t)} pq_bytes=${tableBytes(s"${t}_pq")} " +
          f"int8_bytes=${tableBytes(s"${t}_int8")}")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
