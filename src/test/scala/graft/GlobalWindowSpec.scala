package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.GlobalWindows

/** Distributed global order-statistics windows vs Spark's single-partition
  * built-in: identical numbers, but the data path range-partitions instead
  * of collapsing to one reducer, and the range shuffle is computed once
  * (ReusedExchange) for both the ranking pass and the offset counts. */
class GlobalWindowSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf0001)

  test("rank battery equals the built-in global window, ties included") {
    // o_orderdate has heavy ties → cross-partition tie patching is live
    val got = GlobalWindows
      .withGlobalOrderStats(orders, Seq("o_orderdate" -> true))
      .select(col("o_orderkey"), col("gw_rank"), col("gw_dense_rank"),
        round(col("gw_percent_rank"), 6).as("pr"))
      .orderBy("o_orderkey").collect().toSeq
    val w = Window.orderBy(col("o_orderdate"))
    val want = orders.select(col("o_orderkey"), rank().over(w).as("gw_rank"),
        dense_rank().over(w).as("gw_dense_rank"),
        round(percent_rank().over(w), 6).as("pr"))
      .withColumn("gw_rank", col("gw_rank").cast("long"))
      .withColumn("gw_dense_rank", col("gw_dense_rank").cast("long"))
      .orderBy("o_orderkey").collect().toSeq
    assert(got == want)
  }

  test("row_number and ntile equal the built-in under a total order") {
    val keys = Seq("o_totalprice" -> false, "o_orderkey" -> true)
    val got = GlobalWindows.withGlobalNtile(orders, keys, n = 7)
      .select(col("o_orderkey"), col("gw_row_number"), col("gw_ntile"))
      .orderBy("o_orderkey").collect().toSeq
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val want = orders.select(col("o_orderkey"),
        row_number().over(w).cast("long").as("gw_row_number"),
        ntile(7).over(w).cast("long").as("gw_ntile"))
      .orderBy("o_orderkey").collect().toSeq
    assert(got == want)
  }

  test("descending keys and nulls: region has few rows, still exact") {
    // tiny frame → several range partitions are empty; offsets must hold
    val got = GlobalWindows
      .withGlobalOrderStats(Tables.nation(spark, sf0001),
        Seq("n_regionkey" -> false, "n_nationkey" -> true))
      .select(col("n_nationkey"), col("gw_row_number"), col("gw_rank"))
      .orderBy("n_nationkey").collect().toSeq
    val w = Window.orderBy(col("n_regionkey").desc, col("n_nationkey").asc)
    val want = Tables.nation(spark, sf0001)
      .select(col("n_nationkey"), row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"))
      .orderBy("n_nationkey").collect().toSeq
    assert(got == want)
  }

  test("stats subset computes only what was asked and matches the full battery") {
    val keys = Seq("o_totalprice" -> false, "o_orderkey" -> true)
    val sub = GlobalWindows
      .withGlobalOrderStats(orders, keys, stats = Set("row_number", "count"))
    assert(sub.columns.toSet.intersect(
      Set("gw_rank", "gw_dense_rank", "gw_percent_rank")).isEmpty,
      sub.columns.mkString(","))
    val got = sub.select(col("o_orderkey"), col("gw_row_number"),
        col("gw_count")).orderBy("o_orderkey").collect().toSeq
    val full = GlobalWindows.withGlobalOrderStats(orders, keys)
      .select(col("o_orderkey"), col("gw_row_number"), col("gw_count"))
      .orderBy("o_orderkey").collect().toSeq
    assert(got == full)
    // percent_rank alone pulls in its rank/count intermediates but the
    // output surfaces only what was requested
    val pr = GlobalWindows
      .withGlobalOrderStats(orders, keys, stats = Set("percent_rank"))
    assert(pr.columns.count(_.startsWith("gw_")) == 1, pr.columns.mkString(","))
    val gotPr = pr.select(col("o_orderkey"),
        round(col("gw_percent_rank"), 6).as("pr"))
      .orderBy("o_orderkey").collect().toSeq
    val wantPr = GlobalWindows.withGlobalOrderStats(orders, keys)
      .select(col("o_orderkey"), round(col("gw_percent_rank"), 6).as("pr"))
      .orderBy("o_orderkey").collect().toSeq
    assert(gotPr == wantPr)
  }

  test("grouped form equals the built-in PARTITION BY window, one range shuffle for all groups") {
    // group = o_orderpriority (5 groups, plenty of rows each, date ties
    // inside every group exercise the per-group cross-partition patching)
    val keys = Seq("o_orderdate" -> true, "o_orderkey" -> true)
    val got = GlobalWindows
      .withGlobalOrderStats(orders, keys, groups = Seq("o_orderpriority"))
      .select(col("o_orderkey"), col("gw_row_number"), col("gw_rank"),
        col("gw_dense_rank"), round(col("gw_percent_rank"), 6).as("pr"),
        col("gw_count"))
      .orderBy("o_orderkey").collect().toSeq
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val cw = Window.partitionBy(col("o_orderpriority"))
    val want = orders.select(col("o_orderkey"),
        row_number().over(w).cast("long").as("gw_row_number"),
        rank().over(w).cast("long").as("gw_rank"),
        dense_rank().over(w).cast("long").as("gw_dense_rank"),
        round(percent_rank().over(w), 6).as("pr"),
        count(lit(1)).over(cw).as("gw_count"))
      .orderBy("o_orderkey").collect().toSeq
    assert(got == want)
    // grouped ntile too (the q68 shape): one pass, per-group buckets
    val nt = GlobalWindows.withGlobalNtile(orders, keys, n = 4,
        groups = Seq("o_orderpriority"))
      .select(col("o_orderkey"), col("gw_ntile"))
      .orderBy("o_orderkey").collect().toSeq
    val wantNt = orders.select(col("o_orderkey"),
        ntile(4).over(w).cast("long").as("gw_ntile"))
      .orderBy("o_orderkey").collect().toSeq
    assert(nt == wantNt)
    // and the plan still range-partitions the data exactly once
    val plan = GlobalWindows
      .withGlobalOrderStats(orders, keys, groups = Seq("o_orderpriority"))
    plan.collect()
    val p = plan.queryExecution.executedPlan.toString
    assert("\\+- Exchange rangepartitioning".r.findAllIn(p).length == 1, p)
  }

  test("plan: range-partitioned data path, one shuffle reused, no full-data single-partition exchange") {
    val df = GlobalWindows
      .withGlobalOrderStats(orders, Seq("o_orderdate" -> true))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange rangepartitioning"),
      s"data must be range-partitioned:\n$plan")
    assert(plan.contains("ReusedExchange"),
      s"offset counts must ride the same shuffle, not re-shuffle:\n$plan")
    // the only SinglePartition exchanges feed the |partitions|-row offset
    // window and the scalar gw_count aggregate (both metadata-scale, both
    // downstream of the per-pid counts); the naive plan's signature — the
    // full input collapsing into one partition — is a SinglePartition
    // exchange ABOVE the range shuffle's data path, which would also make
    // the rangepartitioning exchange count diverge from exactly 1
    assert("Exchange SinglePartition".r.findAllIn(plan).length <= 2, plan)
    // count operator NODES ("+- Exchange ...") — ReusedExchange lines
    // repeat the referenced exchange's description inline
    assert("\\+- Exchange rangepartitioning".r.findAllIn(plan).length == 1, plan)
  }
}
