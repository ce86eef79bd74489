package graft.app

import org.apache.spark.sql.SparkSession
import graft.sources.shardsim.ShardSimFixture

/** CLI fixture generator: replay an `events` table into shardsim files.
  * Usage: runMain graft.app.FixtureGen <sfDir> <outDir> <nShards> */
object FixtureGen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, nShards) = args.take(3)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ShardSimFixture.generate(spark, sfDir, outDir, nShards.toInt)
    println(s"[fixturegen] wrote $nShards shards to $outDir")
    spark.stop()
  }
}
