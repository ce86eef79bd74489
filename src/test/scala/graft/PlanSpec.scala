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

  /** Adaptive plans print "== Final Plan ==" then "== Initial Plan ==";
    * operator-count assertions must only see the final one. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    plan(df).split("== Initial Plan ==")(0)

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

  test("q30 funnel: one fact shuffle — all windows and the per-key agg reuse it") {
    val p = finalPlan(SparkEntry.queries("q30_funnel")(spark, sf0001))
    // the N step-windows and the per-user reduction share a single
    // hash-partitioning Exchange of the events table; the only other
    // exchange is the 1-row-per-partition SinglePartition for the final
    // global agg. A second hashpartitioning would mean a step regressed
    // to a self-join.
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles == 1, s"expected 1 fact shuffle, got $hashShuffles:\n$p")
    assert(!p.contains("Join"), p) // sequence match must never self-join
  }

  test("q30 interval join: equi-join on user with the range as residual — no nested loop") {
    val p = plan(SparkEntry.queries("q30_interval_join")(spark, sf0001))
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"interval join degraded to a non-equi plan:\n$p")
    // the user_id equi-key must drive a hash-based join
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
      || p.contains("ShuffledHashJoin"), p)
  }

  test("q31 heavy hitters: ObjectHashAggregate with map-side partial sketch merge") {
    val p = plan(SparkEntry.queries("q31_heavy_hitters")(spark, sf0001))
    // the Misra–Gries UDAF must partially aggregate per partition (only
    // fixed-size counter maps cross the shuffle, never the token universe)
    assert(p.contains("ObjectHashAggregate"), p)
    assert(p.contains("partial_"), s"no map-side partial sketch merge:\n$p")
  }

  test("q32 upsert: anti-join of the corpus against the update keys broadcasts") {
    val p = plan(SparkEntry.queries("q32_upsert_merge")(spark, sf0001))
    // the CDC batch is small: its key set must broadcast so the corpus
    // streams through unshuffled (a SortMergeJoin here would shuffle the
    // full corpus at every merge)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q33 pii redact: single pass, no shuffle before the per-source rollup") {
    val p = finalPlan(SparkEntry.queries("q33_pii_redact")(spark, sf0001))
    // redaction is per-row regexp work: exactly one shuffle (the
    // per-source aggregation), with map-side partial aggregation below it
    val hashShuffles = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashShuffles <= 1, s"redaction pipeline grew extra shuffles:\n$p")
    assert(p.contains("partial_"), p)
  }

  test("q29: fact pre-aggregates before broadcast dimension joins") {
    val p = plan(RelationalQueries.q29SupplierShare(
      T.lineitem(spark, sf0001), T.supplier(spark, sf0001), T.nation(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // per-supplier partial agg happens below the joins (map-side combine)
    assert(p.contains("partial_sum"), p)
  }

  private def hashExchanges(p: String): Int =
    "Exchange hashpartitioning".r.findAllIn(p).length

  test("q34 chunking (chars and tokens) is a pure generate: no hash shuffle") {
    // the output is width/stride × the input — adding a shuffle here would
    // move that multiplied volume over the network for nothing (the final
    // presentation orderBy ranges, it does not hash)
    val docs = T.documents(spark, sf0001)
    for (df <- Seq(graft.llm.ChunkOps.chunk(docs),
        graft.llm.ChunkOps.chunkTokens(docs))) {
      val p = finalPlan(df)
      assert(hashExchanges(p) == 0, p)
    }
  }

  test("q34 pack/mixture: exactly one hash shuffle, on the bounded partition key") {
    // the running-sum window and any downstream per-key aggregate must
    // share ONE clustering on the low-cardinality key; a second hash
    // exchange would re-move the whole corpus at 100 TB
    val docs = T.documents(spark, sf0001)
    for ((df, key) <- Seq(
        graft.llm.ChunkOps.packingStats(docs) -> "source",
        graft.llm.ChunkOps.packSequences(docs) -> "source",
        graft.llm.ChunkOps.mixtureSelect(docs) -> "lang",
        graft.llm.ChunkOps.mixtureSelectDocs(docs) -> "lang")) {
      val p = finalPlan(df)
      assert(hashExchanges(p) == 1, p)
      assert(p.contains(s"Exchange hashpartitioning($key"), p)
    }
  }

  test("q38 scd2: one hash shuffle on the key serves the lead window") {
    val p = finalPlan(graft.operators.CdcOps.userStateScd2(T.events(spark, sf0001)))
    assert(hashExchanges(p) == 1, p)
    assert(p.contains("Exchange hashpartitioning(user_id"), p)
  }

  test("q39 stratified sample: rank limit is pushed below the shuffle (WindowGroupLimit)") {
    // the property that makes few-large-strata sampling survive 100 TB:
    // each map task keeps its local top-k per stratum BEFORE the exchange,
    // so the per-stratum reducer sees k·maps rows, never the whole stratum
    val p = finalPlan(graft.operators.SampleOps.docsPerLang(T.documents(spark, sf0001)))
    assert("WindowGroupLimit".r.findAllIn(p).length == 2, p) // partial + final
    assert(p.contains("Exchange hashpartitioning(lang"), p)
  }

  test("q40 constraints: one scan per table; FK check broadcasts the parent keys") {
    val p = finalPlan(graft.operators.QualityOps.ordersGate(
      T.orders(spark, sf0001), T.customer(spark, sf0001)))
    // six single-table constraints compile to ONE orders scan (+ one for
    // the FK branch); customer is scanned once and broadcast
    assert("FileScan parquet".r.findAllIn(p).length <= 3, p)
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q97 attribution: one fact exchange serves all three windows") {
    // the (user_id, conv_ts) windows' clustering requirement is subsumed
    // by the user_id hash partitioning, so only a sort is inserted; the
    // second exchange is the |channels|-row rollup
    val p = finalPlan(graft.operators.JourneyOps
      .attribution(T.events(spark, sf0001)))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length == 1, p)
    assert(hashExchanges(p) == 2, p)
  }

  test("q99 vocab coverage: membership joins broadcast, corpus never shuffles for it") {
    val p = finalPlan(graft.llm.TextOps
      .vocabCoverage(T.documents(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    // no sort-merge anywhere: the only hash exchanges are the vocab
    // count, the per-doc rollup, and the per-source rollup
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q107 waiting supplier: the Q21 EXISTS pair decorrelates — no anti join, one fact scan+exchange") {
    val p = finalPlan(graft.operators.RelationalQueries.q107WaitingSupplier(
      T.lineitem(spark, sf0001), T.orders(spark, sf0001),
      T.supplier(spark, sf0001)))
    assert(!p.contains("Anti"), p)
    // ONE lineitem scan; the flag agg and both windows ride the single
    // explicit orderkey repartition; supplier broadcasts
    assert("lineitem.parquet".r.findAllIn(p).length == 1, p)
    assert("Exchange hashpartitioning\\(l_orderkey".r.findAllIn(p).length == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q113 small-lot revenue: Q17 decorrelates — one fact scan, one " +
    "partkey exchange, brand filter pushed to the part scan") {
    val p = finalPlan(graft.operators.RelationalQueries.q113SmallLotRevenue(
      T.lineitem(spark, sf0001), T.part(spark, sf0001)))
    // the fact table never joins itself: one lineitem scan, one partkey
    // exchange feeding the window; brand parts broadcast with the
    // predicate at the parquet scan
    assert("lineitem.parquet".r.findAllIn(p).length == 1, p)
    assert("Exchange hashpartitioning\\(l_partkey".r.findAllIn(p).length == 1, p)
    assert(p.contains("EqualTo(p_brand,Brand#13)"), p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q115 single-source: one explicit partkey exchange feeds both " +
    "the (part,supplier) aggregate and the part-total window") {
    val p = finalPlan(graft.operators.RelationalQueries.q115SingleSourceRisk(
      T.lineitem(spark, sf0001), T.supplier(spark, sf0001)))
    assert("lineitem.parquet".r.findAllIn(p).length == 1, p)
    // the repartition is the ONLY fact-scale exchange: the aggregate's
    // grouping keys are a superset of the partitioning key, so no
    // second exchange lands between it and the window
    assert("Exchange hashpartitioning\\(l_partkey".r.findAllIn(p).length == 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q91 pmi: pairs generate map-side — no doc_id self-join, no " +
    "corpus-wide distinct exchange") {
    val p = finalPlan(graft.llm.TextOps.pmiPairs(T.documents(spark, sf0001)))
    // per-doc distinct is row-local (array_distinct) and the pair space
    // explodes from each doc's kept-term array: no join keyed on
    // doc_id, no exchange over the exploded (doc_id, t) table — the
    // doc_id-only exchange that remains is the n_docs countDistinct
    // scalar (slim ids, the q17 pattern)
    assert(!p.contains("SortMergeJoin"), p)
    assert(!"hashpartitioning\\(doc_id[^)]*, t#".r.findFirstIn(p).isDefined, p)
    assert(p.contains("array_distinct"), p)
  }

  test("q92 linkage: the LevenshteinPrefilter guard fires in front of " +
    "the verify stage") {
    // the r13/r14 posture decision for q92's residual 2.5–2.7× ratio:
    // the verify stage is output-bound by fixture construction, and the
    // free length-difference guard in front of the O(len²) distance is
    // PINNED here so a refactor of fuzzyLinkage (a renamed column, a
    // restructured filter) can't silently drop the rule's precondition
    val q = graft.operators.LinkageOps.partFeedLinkage(T.part(spark, sf0001))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length("),
      s"expected the length-difference guard in q92's optimized plan:\n$optimized")
  }

  test("q121: the EXISTS runs as a semi join with the quarter pushed " +
    "to the orders scan") {
    val p = plan(RelationalQueries.q121LateOrders(
      T.orders(spark, sf0001), T.lineitem(spark, sf0001)))
    assert(p.contains("LeftSemi"), p)
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("PushedFilters: [IsNotNull(o_orderdate)"), p)
  }

  test("q125: the disjunctive branches' part conjuncts reach the " +
    "broadcast build's scan") {
    val p = plan(RelationalQueries.q125DisjunctiveRevenue(
      T.lineitem(spark, sf0001), T.part(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    // the brand IN-list prunes the dimension scan, not the joined rows
    assert(p.contains("In(p_brand"), p)
  }

  test("q129: all three predicates reach the parquet scan") {
    val p = plan(RelationalQueries.q129ForecastRevenue(
      T.lineitem(spark, sf0001)))
    // toString truncates the PushedFilters list, so pin its head plus
    // the full predicate battery in the (codegen'd) Filter right above
    // the scan — all three columns, nothing evaluated post-shuffle
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)"), p)
    assert(p.contains(">= 0.05)") && p.contains("<= 0.07)"), p)
    assert(p.contains("< 24.0)"), p)
  }

  test("q128: the whole dimension chain broadcasts — the fact side " +
    "never sort-merge joins") {
    val p = plan(RelationalQueries.q128LocalSupplierVolume(
      T.lineitem(spark, sf0001), T.orders(spark, sf0001),
      T.customer(spark, sf0001), T.supplier(spark, sf0001),
      T.nation(spark, sf0001), T.region(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q90 pagerank rounds: co-partitioned shuffle-hash joins with no " +
    "exchange between the join and either input") {
    // BASELINE §q's central chassis claim, pinned: each fused round's
    // contribution join consumes the edge checkpoint's src partitioning
    // and the previous landing's dst partitioning AS IS — a lost
    // shuffle_hash hint (or a refactor that breaks either side's
    // partitioning) would silently restore a per-round exchange of the
    // corpus-scale edge table. The chain is stashed pre-checkpoint
    // because the checkpoint truncates it out of `out`'s plan.
    graft.llm.DedupOps.dupPagerank(T.documents(spark, sf0001)).collect()
    val chain = graft.llm.DedupOps.lastRoundChain.get("q90_pagerank")
    assert(chain != null, "round chain not stashed")
    val sp = chain.queryExecution.executedPlan
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
    val shjs = sp.collect { case j: ShuffledHashJoinExec => j }
    val rounds = graft.llm.DedupOps.DupPagerankIters
    assert(shjs.size == rounds - 1,
      s"expected ${rounds - 1} fused SHJ rounds, got ${shjs.size}:\n$sp")
    assert(sp.collect { case e: ShuffleExchangeExec => e }.size == rounds,
      s"expected exactly one exchange per round (the groupBy(dst) " +
        s"landing), got more:\n$sp")
    // no exchange between a round join and its inputs: walking down
    // from each join child must hit the previous round's (final)
    // aggregate or a leaf before any exchange
    def cleanAboveAgg(p: SparkPlan): Boolean = p match {
      case _: ShuffleExchangeExec => false
      case _: HashAggregateExec => true
      case leaf if leaf.children.isEmpty => true
      case other => other.children.forall(cleanAboveAgg)
    }
    shjs.foreach(j => j.children.foreach(c =>
      assert(cleanAboveAgg(c),
        s"exchange found between a fused round join and its input:\n$sp")))
  }

  test("q136 eval leakage: the EVAL side is the broadcast build, never " +
    "the training shingle frame") {
    // at fixture sizes the planner picks the training side (BuildLeft)
    // on its own — scale-wrong, a corpus shingle frame can never
    // broadcast; the explicit hint pins the operator's premise
    val docs = T.documents(spark, sf0001)
    val cut = docs.agg(org.apache.spark.sql.functions
      .max(org.apache.spark.sql.functions.col("doc_id")) * 9 / 10)
      .first().getDouble(0).toLong
    val df = graft.llm.DedupOps.evalLeakReport(
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < cut),
      docs.filter(org.apache.spark.sql.functions.col("doc_id") >= cut))
    df.collect()
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val bhjs = df.queryExecution.executedPlan
      .collect { case j: BroadcastHashJoinExec => j }
    assert(bhjs.nonEmpty, df.queryExecution.executedPlan.toString)
    bhjs.foreach(j => assert(
      j.buildSide == org.apache.spark.sql.catalyst.optimizer.BuildRight,
      s"training side built:\n${df.queryExecution.executedPlan}"))
  }

  test("q104 mahalanobis: the model broadcasts back; scoring adds no fact shuffle") {
    val p = finalPlan(graft.llm.SimilarityOps
      .mahalanobisOutliers(T.embeddings(spark, sf0001)))
    assert(p.contains("BroadcastHashJoin"), p)
    // exchanges: model-fit (label,pos) cells, model rollup by label, and
    // the final |labels|-row rollup — the em scoring side itself never
    // hash-shuffles (it streams into the broadcast join)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q141 dsir: the weight model joins back by broadcast and the " +
    "histogram is built once (cached) for both consumers") {
    val df = graft.llm.TextOps.dsirImportance(T.documents(spark, sf0001))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // the fixed-size weight table must broadcast — a lost broadcast
    // would hash-shuffle the doc-scale histogram against a 512-row frame
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    // every FileScan sits under the InMemoryRelation recipe: the token
    // explode runs once, both consumers read InMemoryTableScan
    assert(p.contains("InMemoryTableScan"), p)
  }

  test("q146 source divergence: the pair stage self-joins the bounded " +
    "model frame, never the corpus") {
    val df = graft.llm.TextOps.sourceDivergence(T.documents(spark, sf0001))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // both join inputs are InMemoryTableScans of the cached
    // |sources|×buckets model — the corpus-scale token explode feeds
    // only the cache build, not the join
    assert(p.contains("InMemoryTableScan"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q86 pair stage: the within-cluster self-join keys include the " +
    "sub-blocks (parallelism past the cluster count)") {
    // BASELINE §t's 100× straggler fix, pinned: with `cid` as the only
    // equi-key the pair compute collapses onto |clusters| tasks — one
    // task computed ~312 M cosines single-threaded at the 100× point.
    // The sub-block columns must stay INSIDE the join's equi-key (an
    // equality lost to a refactor would demote them to residual
    // conditions and silently restore the 8-task ceiling).
    val df = graft.llm.SimilarityOps.semanticDedup(
      T.embeddings(spark, sf0001))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("_sa#") && p.contains("_sb#"), p.take(3000))
    // equi-key form: the join node's key lists carry the sub-block
    // columns next to cid (residual-only form would print them inside
    // the post-join condition instead)
    val joinLine = p.linesIterator
      .find(l => l.contains("Join") && l.contains("_sa#"))
    assert(joinLine.exists(l => l.contains("_i#") && l.contains("_sb#")),
      s"sub-blocks not in the join keys: ${joinLine.getOrElse(p.take(3000))}")
  }
}
