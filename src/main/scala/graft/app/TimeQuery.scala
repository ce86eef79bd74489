package graft.app

/** Local iteration aid: time one registry query by name, with the same
  * session/noop-sink methodology as graft.Bench (first iteration is the
  * warm-up; read the later ones).
  * Usage: runMain graft.app.TimeQuery <name> [sfDir] [iters]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val fn = graft.SparkEntry.queries(name)
    (0 until iters).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[time] $name iter=$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
