package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — driver contract: runs the full query surface on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Methodology (recorded in BASELINE.md): one untimed warm-up pass over the
  * whole query set amortizes JVM classloading, codegen compilation, and JIT
  * — one-time costs that at real scale are noise against hours of execution
  * but at sf0.1 would dominate every number. Then each query runs
  * `SPARK_GRAFT_ITERS` timed iterations (default 2) and reports the minimum,
  * with the DataFrame cache cleared before every timed run so persisted
  * intermediates (e.g. the dedup shingle table) are recomputed inside the
  * measured window. The DuckDB baseline in BASELINE.md is measured the same
  * way (min of 3 warm in-process runs).
  *
  * Each query is forced through a `noop` sink write so the measurement is
  * full plan execution (scan → shuffle → agg/join/window) without parquet
  * write cost. Failures are loud (stderr + a negative duration) rather than
  * silently folded into the total.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_ITERS", "2").toInt
    val spark = graft.core.Sessions.get(cpus)

    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()

    // Untimed warm-up pass: compile + JIT every plan shape once.
    qs.foreach { case (_, fn) => try run(fn) catch { case _: Throwable => () } }

    val results = qs.map { case (name, fn) =>
      val dts = (1 to iters).flatMap { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try {
          run(fn)
          Some((System.nanoTime() - t0) / 1e9)
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      name -> (if (dts.isEmpty) -1.0 else dts.min)
    }
    val qsJson = results
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qsJson,"sf":"$sfDir","iterations":$iters}""")
    spark.stop()
  }
}
