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
