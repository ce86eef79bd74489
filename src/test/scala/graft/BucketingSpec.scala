package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.FileIO

/** Bucketed co-located joins: the write-once/shuffle-never layout for
  * recurring fact⋈fact joins. Asserts the join over two tables bucketed on
  * the same key plans with NO Exchange — the property that at 100 TB turns
  * the dominant shuffle into a local merge. */
class BucketingSpec extends SparkSpec {

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // bucketed scans don't vectorize through AQE the same way; what we pin
    // here is exchange elimination, so disable the broadcast fallback to
    // force the join to actually use the bucketing
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      FileIO.writeParquetBucketed(
        Tables.lineitem(spark, sf0001).select("l_orderkey", "l_quantity"),
        "li_b", 8, "l_orderkey", Seq("l_orderkey"))
      FileIO.writeParquetBucketed(
        Tables.orders(spark, sf0001).select("o_orderkey", "o_totalprice"),
        "o_b", 8, "o_orderkey", Seq("o_orderkey"))
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed join must not shuffle:\n$plan")
      // cross-check the result against the unbucketed path
      val expected = Tables.lineitem(spark, sf0001)
        .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey")).agg(sum(col("l_quantity")).as("q"))
        .orderBy("o_orderkey").collect().toSeq
      val got = joined.orderBy("o_orderkey").collect().toSeq
      assert(got == expected)
    }
  }

  private def withConf[T](kvs: (String, String)*)(body: => T): T = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
