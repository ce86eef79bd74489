package graft

import graft.core.{Tables => T}
import graft.operators.{AdvancedQueries, RelationalQueries}

/** Physical-plan shape assertions: the properties that decide whether a
  * query survives a 100× scale-up are visible in the plan — filters reaching
  * the parquet scan, projections pruning the read schema, dimension joins
  * broadcasting instead of shuffling the fact side, top-k never globally
  * sorting. These pin them so a refactor can't silently regress the plan.
  */
class PlanSpec extends SparkSpec {

  /** Execute first so AQE finalizes the plan (runtime join selection,
    * codegen spans), then render it. */
  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters are pushed down to the parquet scan") {
    val p = plan(RelationalQueries.q02Filter(T.lineitem(spark, sf0001)))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipda"), p) // toString may truncate
  }

  test("q01: read schema is pruned to the projected columns") {
    val p = plan(RelationalQueries.q01Scan(T.lineitem(spark, sf0001)))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"), p)
  }

  test("q05: dimension join broadcasts, fact side does not shuffle for the join") {
    val p = plan(RelationalQueries.q05Join(T.orders(spark, sf0001), T.customer(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q06: all dimension joins broadcast (star-join shape)") {
    val p = plan(RelationalQueries.q06MultiJoin(T.region(spark, sf0001), T.nation(spark, sf0001), T.customer(spark, sf0001), T.orders(spark, sf0001), T.lineitem(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q08: IN-subquery executes as a semi join, aggregation is two-phase") {
    val p = plan(RelationalQueries.q08Semi(T.part(spark, sf0001), T.lineitem(spark, sf0001)))
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("partial_count"), p) // map-side partial aggregation
  }

  test("q13: top-k is TakeOrderedAndProject, not a global sort") {
    val p = plan(RelationalQueries.q13TopK(T.orders(spark, sf0001)))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q03: aggregation is partial+final hash aggregate inside codegen") {
    val p = plan(RelationalQueries.q03Agg(T.lineitem(spark, sf0001)))
    assert(p.contains("partial_sum"), p) // map-side combine before the shuffle
    // `*(n)` prefixes mark whole-stage-codegen'd spans; the partial agg,
    // filter, and scan must share one
    assert(p.contains("*(1) HashAggregate"), p)
  }

  test("q27 as-of join plans a single shuffle of each input (no range join)") {
    val p = plan(AdvancedQueries.eventPurchaseAsof(graft.core.Tables.events(spark, sf0001)))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // one running-window pass provides the as-of semantics
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
  }

  test("dedup pair stage: sizes ride the rows — no per-document side joins after the pair shuffle") {
    // the round-3 scale fix: the candidate self-join aggregates straight to
    // (d1, n1, d2, n2, inter); regressing to size-table joins (let alone
    // forced broadcasts of per-doc tables) would resurface the 100 TB OOM
    val pairs = graft.llm.DedupOps.jaccardPairs(
      graft.core.Tables.documents(spark, sf0001))
    val optimized = pairs.queryExecution.optimizedPlan.toString
    // the pair aggregation is the plan's LAST shuffle-bearing operator: every
    // join sits below it (tree toString prints parents first, so the first
    // Aggregate line must precede the first Join line). The round-2 shape
    // joined per-doc size tables ABOVE the aggregation.
    val lines = optimized.linesIterator.toSeq
    val firstAgg = lines.indexWhere(_.contains("Aggregate "))
    val firstJoin = lines.indexWhere(_.contains("Join "))
    assert(firstAgg >= 0 && firstJoin > firstAgg,
      s"a join above the pair aggregation (agg@$firstAgg, join@$firstJoin):\n$optimized")
    // no user-forced broadcast hints survive anywhere in the pair pipeline
    assert(!optimized.contains("ResolvedHint"), optimized)
  }

  test("q29: fact pre-aggregates before broadcast dimension joins") {
    val p = plan(RelationalQueries.q29SupplierShare(
      T.lineitem(spark, sf0001), T.supplier(spark, sf0001), T.nation(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // per-supplier partial agg happens below the joins (map-side combine)
    assert(p.contains("partial_sum"), p)
  }
}
