package graft.app

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** End-to-end PipelineApp scale point (r17 verdict item 3): run the
  * full curation pipeline on a salted-replica corpus at `factor`× and
  * record per-stage walls (PipelineApp logs each boundary), the peak
  * scratch-disk draw, and fingerprint byte-stability across a resumed
  * re-run.
  *
  * Replication is SALTED, deliberately: rep 0 keeps the original text,
  * every other rep appends a rep-unique stopword-rich filler (cycling
  * "the of and in qz<rep>x<i>" — passes all four Gopher rules, shares
  * < 30% of its shingles with any other rep). Plain replication would
  * make every replica an exact near-dup and the dedup stage would
  * collapse the corpus back to 1× — downstream stages (span removal,
  * decontamination, mixture, chunking) would never see the scale.
  * Usage: runMain graft.app.PipelineScale [sfDir] [factor] */
object PipelineScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val dir = Files.createTempDirectory(s"pipe-scale-$factor").toString
    val outDir = s"$dir/out"
    try {
      val reps = spark.range(factor).select(col("id").as("rep"))
      val filler = expr("concat_ws(' ', transform(sequence(1, 40), " +
        "i -> concat('the of and in qz', rep, 'x', i)))")
      spark.read.parquet(s"$sfDir/documents.parquet")
        .crossJoin(reps)
        .withColumn("doc_id", col("doc_id") * factor + col("rep"))
        .withColumn("text", when(col("rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" "), filler)))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .drop("rep").repartition(64)
        .write.mode("overwrite").parquet(s"$dir/in/documents.parquet")

      @volatile var minFree = Long.MaxValue
      val sampler = new Thread(() => {
        try while (true) {
          minFree = math.min(minFree,
            new java.io.File("/tmp").getUsableSpace)
          Thread.sleep(250)
        } catch { case _: InterruptedException => }
      })
      sampler.setDaemon(true)
      val free0 = new java.io.File("/tmp").getUsableSpace
      sampler.start()
      val t0 = System.nanoTime()
      val m1 = PipelineApp.run(spark, s"$dir/in", outDir,
        totalBudget = 8000L * factor)
      val wall = (System.nanoTime() - t0) / 1e9
      sampler.interrupt()
      val fp1 = m1.collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap

      // resume stability: drop the two LAST boundaries and the chunk
      // artifacts, re-run with resume — earlier boundaries reuse, the
      // tail recomputes, and every fingerprint must land byte-identical
      Seq("corpus/decontaminated", "corpus/mixture_selected", "chunks",
        "packing", "curriculum").foreach { d =>
        org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(s"$outDir/$d"))
      }
      val m2 = PipelineApp.run(spark, s"$dir/in", outDir,
        totalBudget = 8000L * factor, resume = true)
      val fp2 = m2.collect()
        .map(r => r.getString(0) -> r.getLong(2)).toMap
      val stable = fp1 == fp2
      val peakGiB = (free0 - minFree) / 1024.0 / 1024.0 / 1024.0
      println(f"[pipeline-scale] factor=$factor wall=$wall%.1f s " +
        f"peak_disk=$peakGiB%.2f GiB fingerprints_stable=$stable " +
        f"stages=${fp1.size}")
      require(stable, s"fingerprint drift across resume:\n$fp1\nvs\n$fp2")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
    spark.stop()
  }
}
