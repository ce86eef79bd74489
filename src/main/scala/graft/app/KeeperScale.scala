package graft.app

import org.apache.spark.sql.functions._

/** q153 steady-state cost probe (the r16 verdict item: the incremental
  * keeper-merge arm ALONE, with the stored table already built): for
  * each corpus scale factor, bootstrap the keeper snapshot once (the
  * full-recompute baseline the incremental path replaces), then land a
  * FIXED-size batch and time `refreshKeepers`' incremental arm. The
  * claim under test: merge-arm wall is dominated by one corpus scan
  * (the shingle-index rebuild — the lambda-architecture posture) while
  * all pair and CC work stays batch-scale, so the slope across corpus
  * factors should be the scan's, never the bootstrap's.
  * Usage: runMain graft.app.KeeperScale [sfDir] [factors] [batchSize]
  */
object KeeperScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,5,20")
      .split(",").map(_.trim.toInt).toSeq
    val batchSize = args.lift(2).map(_.toInt).getOrElse(500)
    val spark = graft.core.Sessions.get("32")
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batchSrc = src.orderBy("doc_id").limit(batchSize)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    factors.foreach { f =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"keeper-scale-$f").toString
      try {
        val reps = spark.range(f).select(col("id").as("rep"))
        src.crossJoin(reps)
          .withColumn("doc_id", col("doc_id") * f + col("rep"))
          .drop("rep").repartition(32)
          .write.mode("overwrite").parquet(s"$dir/batch_id=0")
        val t0 = System.nanoTime()
        require(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 0L)
        val tBoot = (System.nanoTime() - t0) / 1e9
        // fixed batch, fresh ids beyond the replicated key space —
        // each batch doc near-dups its f replicas, so pair work per
        // batch doc grows with the true overlap, as production would
        val base = src.agg(max(col("doc_id"))).first().getLong(0) * f + f
        import spark.implicits._
        batchSrc.map { case (id, t) => (base + id, t) }.toSeq
          .toDF("doc_id", "text")
          .write.mode("overwrite").parquet(s"$dir/batch_id=1")
        val t1 = System.nanoTime()
        require(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 1L)
        val tIncr = (System.nanoTime() - t1) / 1e9
        val n = spark.read.parquet(s"$dir/keepers/upto=1").count()
        println(f"[keeper-scale] factor=$f corpus=${src.count() * f} " +
          f"batch=$batchSize bootstrap=$tBoot%.2f s incremental=$tIncr%.2f s " +
          f"keepers=$n")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
