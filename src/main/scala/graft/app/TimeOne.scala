package graft.app

import graft.SparkEntry

/** Local iteration aid: time named registry queries without the full
  * bench pair harness. `runMain graft.app.TimeOne <sfDir> <iters> <prefix...>`
  * runs each matching query `iters` times against a noop sink and prints
  * the per-iteration wall seconds. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val iters = args(1).toInt
    val prefixes = args.drop(2)
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    qs.foreach { case (name, fn) =>
      val times = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s " + times.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
