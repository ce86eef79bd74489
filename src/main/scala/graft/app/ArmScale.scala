package graft.app

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** q168/q169 arm isolation (r17 verdict item 5, the q164 pattern): both
  * operators compose the expensive CC keeper fixture with a cheap arm
  * (the cap window / the report-card view). This probe pre-builds the
  * STORED keeper table once per factor and times each arm alone against
  * it — the slope lines that attribute fixture cost vs arm cost.
  * Replication is the PipelineScale salting (rep-unique stopword-rich
  * filler) so replicas are NOT near-dups and the keeper fixture stays
  * buildable at 100×. Usage: runMain graft.app.ArmScale [sfDir] [factors] */
object ArmScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,20,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[A](what: => A): Double = {
      val t0 = System.nanoTime()
      what
      (System.nanoTime() - t0) / 1e9
    }
    factors.foreach { f =>
      val dir = Files.createTempDirectory(s"arm-scale-$f").toString
      try {
        val reps = spark.range(f).select(col("id").as("rep"))
        val filler = expr("concat_ws(' ', transform(sequence(1, 40), " +
          "i -> concat('the of and in qz', rep, 'x', i)))")
        src.crossJoin(reps)
          .withColumn("doc_id", col("doc_id") * f + col("rep"))
          .withColumn("text", when(col("rep") === 0, col("text"))
            .otherwise(concat(col("text"), lit(" "), filler)))
          .withColumn("n_chars", length(col("text")).cast("long"))
          .drop("rep").repartition(64)
          .write.mode("overwrite").parquet(s"$dir/docs.parquet")
        val docs = spark.read.parquet(s"$dir/docs.parquet")
        val tFixture = time {
          graft.llm.DedupOps.dedupKeeper(docs)
            .write.mode("overwrite").parquet(s"$dir/keepers.parquet")
        }
        val keepers = spark.read.parquet(s"$dir/keepers.parquet")
        val tCap = time(
          graft.llm.DedupOps.clusterCapSampleWith(docs, keepers)
            .write.format("noop").mode("overwrite").save())
        val tCard = time(
          graft.llm.CorpusOps.sourceReportCardWith(docs, keepers)
            .write.format("noop").mode("overwrite").save())
        println(f"[arm-scale] factor=$f docs=${docs.count()} " +
          f"keeper_fixture=$tFixture%.2f s cap_arm=$tCap%.2f s " +
          f"card_arm=$tCard%.2f s")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
