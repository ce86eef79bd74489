package graft.app

import org.apache.spark.sql.SparkSession
import graft.sources.shardsim.ShardSimFixture

/** CLI fixture generator: replay an `events` table into shardsim files.
  * Usage: runMain graft.app.FixtureGen <sfDir> <outDir> <nShards> */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, nShards) = args.take(3)
    val spark = graft.core.Sessions.get("4")
    ShardSimFixture.generate(spark, sfDir, outDir, nShards.toInt)
    println(s"[fixturegen] wrote $nShards shards to $outDir")
    spark.stop()
  }
}
