package graft

import org.apache.spark.sql.functions._

import graft.core.Tables

/** Runtime Bloom-filter join pruning: when a shuffle join's build side is
  * selectively filtered, Spark injects a bloom_filter_might_contain guard
  * on the probe side so fact rows that cannot match are dropped at the
  * scan, before the shuffle — at 100 TB this is the difference between
  * shuffling the whole fact table and shuffling the matching slice.
  * Thresholds are lowered to fire at test scale. */
class RuntimeFilterSpec extends SparkSpec {

  test("selective dim filter injects a bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val olds = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val selectiveOrders = Tables.orders(spark, sf0001)
        .filter(col("o_totalprice") > 500000) // highly selective
      val q = Tables.lineitem(spark, sf0001)
        .join(selectiveOrders, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") &&
        optimized.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter on the probe side:\n$optimized")
      // and it must not change the result
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001).filter(col("o_totalprice") > 500000),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("l_quantity")).as("q"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(q.orderBy("o_orderpriority").collect().toSeq == expected)
    } finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
