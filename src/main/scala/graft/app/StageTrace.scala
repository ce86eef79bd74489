package graft.app

/** Local iteration aid: run one registry query with per-stage wall/task
  * prints — the first stop when a bench pair's wall exceeds its task
  * time (orchestration floor vs real compute).
  * Usage: runMain graft.app.StageTrace <name> [sfDir] [iters]
  */
object StageTrace {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          starts.put(e.jobId, e.time)
        }
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0: Long = Option(starts.get(e.jobId))
            .map(_.longValue).getOrElse(e.time)
          println(f"[job] id=${e.jobId} wall=${(e.time - t0) / 1e3}%.2f " +
            f"start=$t0%d")
        }
        override def onTaskEnd(
            e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = e.taskMetrics
          if (m != null) taskMs.addAndGet(m.executorRunTime)
        }
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1e3).getOrElse(-1.0)
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"wall=$wall%.2f task=${si.taskMetrics.executorRunTime / 1e3}%.2f")
        }
      })
    val fn = graft.SparkEntry.queries(name)
    if (sys.env.get("SPARK_GRAFT_PRINT_PLAN").contains("1")) {
      val df = fn(spark, sfDir)
      df.collect()
      println("[plan] " + df.queryExecution.executedPlan.toString
        .linesIterator.mkString("\n[plan] "))
    }
    (0 until iters).foreach { i =>
      spark.catalog.clearCache()
      Thread.sleep(300)
      val j0 = jobs.get; val m0 = taskMs.get
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[time] $name iter=$i $wall%.2f s " +
        f"jobs=${jobs.get - j0} task=${(taskMs.get - m0) / 1e3}%.2f s")
    }
    spark.stop()
  }
}
