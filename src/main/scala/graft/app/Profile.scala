package graft.app

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling harness: runs selected queries N times each and prints
  * per-iteration wall times, separating one-time cost (planning + codegen +
  * JIT) from steady-state execution. Usage:
  *   runMain graft.app.Profile <sfDir> <iters> [queryName ...]
  * With no names, profiles every registered query.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(1).map(_.toInt).getOrElse(3)
    val wanted = args.drop(2).toSet
    val spark = graft.core.Sessions.get("32")
    // SPARK_GRAFT_TRACE_JOBS=1: print every job's description + stage count
    // as it starts — attributes the per-query job-count floor to its source
    if (sys.env.get("SPARK_GRAFT_TRACE_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            println(s"[job] id=${e.jobId} stages=${e.stageInfos.size} " +
              s"desc=${Option(e.properties)
                .flatMap(p => Option(p.getProperty("spark.job.description")))
                .getOrElse("")} callsite=${e.stageInfos.headOption
                .map(_.details.linesIterator.take(1).mkString).getOrElse("")}")
        })
    val unknown = wanted -- graft.SparkEntry.queries.keySet
    if (unknown.nonEmpty)
      System.err.println(s"[profile] unknown query names: ${unknown.toSeq.sorted.mkString(", ")}")
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    qs.foreach { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          f"${(System.nanoTime() - t0) / 1e9}%7.3f"
        } catch {
          case e: Throwable =>
            System.err.println(s"[profile] $name FAILED: ${e.getMessage}")
            " FAILED"
        }
      }
      println(f"$name%-28s ${times.mkString(" ")}")
    }
    spark.stop()
  }
}
