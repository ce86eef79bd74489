package graft

import org.apache.spark.sql.functions._

import graft.core.Salting

/** Skew handling, both paths: AQE's runtime skew-join split (thresholds
  * lowered so the mechanism fires at test scale) and manual salting for
  * aggregations/joins. */
class SkewSpec extends SparkSpec {

  /** ~100k rows where key 0 owns half the data. */
  private def skewed = {
    import spark.implicits._
    (0 until 100000).map(i => (if (i % 2 == 0) 0L else (i % 997).toLong, i.toDouble))
      .toDF("k", "v")
  }

  test("AQE splits a skewed sort-merge join partition (skew=true)") {
    import spark.implicits._
    val dims = (0L until 997L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val confs = Seq(
      // the session default is AQE-off for small-SF latency (Sessions
      // scaladoc); the skew-split mechanism under test is an AQE feature,
      // so this spec turns it on the way a cluster deployment would
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "100KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "50KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val joined = skewed.join(dims, col("k") === col("dk"))
        .groupBy(col("name")).agg(sum(col("v")).as("s"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join partition:\n$plan")
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation equals direct groupBy") {
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .orderBy("k").collect().toSeq
    val salted = Salting.saltedGroupSum(skewed, "k", "v")
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("salted join equals direct join") {
    import spark.implicits._
    val dims = (0L until 997L).map(k => (k, s"dim_$k")).toDF("dk", "name")
    val direct = skewed.join(dims, col("k") === col("dk"))
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("name").collect().toSeq
    val salted = Salting
      .saltedJoin(skewed, dims.withColumnRenamed("dk", "k"), Seq("k"),
        uniqueCol = "v", salts = 16)
      .groupBy("name").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("name").collect().toSeq
    assert(salted == direct)
  }

  test("salting guards: pre-existing _salt and missing columns fail at the call site") {
    import spark.implicits._
    val dims = (0L until 10L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val withSalt = skewed.withColumn("_salt", lit(1))
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(withSalt, dims, Seq("k"), "v")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(skewed, dims, Seq("k"), "no_such_col")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedJoin(skewed, dims, Seq("k"), "v", joinType = "right")
    }
    intercept[IllegalArgumentException] {
      Salting.saltedGroupSum(withSalt, "k", "v")
    }
  }
}
