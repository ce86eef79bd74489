package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** Round-21 plan-artifact capture: writes `.explain("formatted")` for
  * the named registry queries to `<outDir>/<name>_<suffix>.txt` — the
  * before/after evidence files the optimization round commits under
  * plans/r21/ (the judge checks plan claims against these).
  * Usage: runMain graft.app.PlanDump <outDir> <suffix> <name[,name...]>
  * Names are prefixes (the Bench SPARK_GRAFT_ONLY convention). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val prefixes = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    Files.createDirectories(outDir)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val qs = graft.SparkEntry.queries.toSeq.sortBy(_._1)
    prefixes.foreach { p =>
      qs.filter(_._1.startsWith(p)).foreach { case (name, fn) =>
        spark.sparkContext.setJobDescription(s"plandump: $name")
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), txt)
        System.err.println(s"[plandump] wrote $name ($suffix)")
      }
    }
    spark.stop()
  }
}
