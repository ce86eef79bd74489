package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType, StructType}

/** Distributed global order-statistics windows — SURVEY.md §2b Q35.
  *
  * Spark executes `Window.orderBy(...)` with no `partitionBy` by moving the
  * ENTIRE input into one partition ("Exchange SinglePartition" feeding a
  * single-threaded Window) — fine at test scale, broken at 100 TB: one
  * reducer sorts the world. This operator computes the same global
  * row_number / rank / dense_rank with the classic distributed-sort-rank
  * shape (the same structure as RDD.zipWithIndex/sortBy, re-expressed
  * in-plan with no driver-side job between construction and execution):
  *
  *  1. range-partition + locally sort on the key (`repartitionByRange` —
  *     ONE shuffle of the data; equal keys land in one partition, which is
  *     what makes local rank/dense_rank globally patchable);
  *  2. one linear per-partition pass appends partition id + LOCAL
  *     row_number/rank/dense_rank (mapPartitions — the window-over-
  *     spark_partition_id alternative would re-shuffle the full data a
  *     second time for a clustering it already has);
  *  3. per-partition row/distinct-key counts aggregate off the SAME
  *     shuffle (ReusedExchange: shuffle files are read twice, the data
  *     moves over the network once), a |partitions|-row cumulative-offset
  *     window (metadata-scale, like the LSH probe histogram), and a
  *     broadcast join patch local → global:
  *     global = partition offset + local.
  *
  * row_number (and anything built on it, e.g. ntile) is only
  * deterministic when `keys` is a total order — same contract as Spark's
  * own window. rank / dense_rank / percent_rank are tie-invariant.
  */
object GlobalWindows {

  /** The full order-statistics menu; pass a subset as `stats` to skip
    * the compute (and the local-pass tie detection) for the ones a
    * caller drops — q68 materialized 15 window columns to keep 3 before
    * this knob existed. */
  val AllStats: Set[String] =
    Set("row_number", "rank", "dense_rank", "percent_rank", "count")

  /** Appends the requested subset of `gw_row_number`, `gw_rank`,
    * `gw_dense_rank`, `gw_percent_rank` and `gw_count` (the group row
    * count, for ntile-style post-compute) to `df`, ordering globally by
    * `keys` (column name → ascending?). Only the requested statistics are
    * computed: when neither rank flavour is asked for, the linear local
    * pass skips key extraction and tie comparison entirely (a pure
    * counter), and the dense-rank offset column never exists.
    * `percent_rank` implies the rank and count intermediates; they are
    * dropped from the output unless requested themselves.
    *
    * `groups` is the GROUPED form — `... OVER (PARTITION BY groups ORDER
    * BY keys)` for groups too large (or too few) for Spark's hash-
    * partitioned window: group columns lead the range partitioning, the
    * linear pass resets its counters on every group change, per-partition
    * counts key on (partition, group), and the offset patch becomes a
    * per-group cumulative over partition ids — still metadata-scale. One
    * range shuffle serves ALL groups; with 3 groups of 10⁹ rows each a
    * `Window.partitionBy` would sort three 10⁹-row reducers, while this
    * keeps every core busy regardless of group count. An N-group ntile
    * (q68's three RFM quintiles, feature binning across N columns via
    * unpivot) is therefore ONE pass instead of N. */
  def withGlobalOrderStats(df: DataFrame,
      keys: Seq[(String, Boolean)],
      stats: Set[String] = AllStats,
      groups: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "global window needs at least one key column")
    require(stats.nonEmpty, "request at least one statistic")
    val unknown = stats -- AllStats
    require(unknown.isEmpty, s"unknown order statistics: $unknown")
    val needRank = stats("rank") || stats("percent_rank")
    val needDense = stats("dense_rank")
    val needCount = stats("count") || stats("percent_rank")
    // the linear local pass is a first-class physical operator
    // (plans/RunningStats.scala): InternalRow in, InternalRow out — no
    // Row-encoder round trip, which used to dominate the cost of every
    // query on this machinery. EnsureRequirements plans the one range
    // exchange from the node's declared distribution.
    val local = graft.plans.RunningStats.local(df, groups, keys,
      sums = Nil, needRowNumber = true, needRank = needRank,
      needDense = needDense)

    // per-(partition, group) totals ride the SAME range shuffle
    // (ReusedExchange); the offset window runs over |partitions × groups
    // spanned| rows — metadata, not data. A group split across partition
    // boundaries patches exactly like the ungrouped global window did.
    // The totals MUST aggregate `local`, not the pre-pass shuffle: a
    // separate aggregate over the raw exchange gets column-pruned into
    // a DIFFERENT (2-column) range exchange whose sampled boundaries
    // disagree with the pass's partitioning — measured: 75% of row
    // numbers off by the boundary drift. Re-reading `local` is cheap
    // now that the pass is InternalRow-level (no encoder round-trip).
    val gcols = groups.map(col)
    val countAggs = max(col("_gw_lrn")).as("_gw_n") +:
      (if (needDense) Seq(max(col("_gw_ldr")).as("_gw_nd")) else Nil)
    val counts = local.groupBy(col("_gw_pid") +: gcols: _*)
      .agg(countAggs.head, countAggs.tail: _*)
    val w = Window.partitionBy(gcols: _*).orderBy(col("_gw_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = {
      val base = counts
        .withColumn("_gw_row_off", sum(col("_gw_n")).over(w) - col("_gw_n"))
      val withDr = if (needDense)
        base.withColumn("_gw_dr_off",
          sum(col("_gw_nd")).over(w) - col("_gw_nd"))
      else base
      withDr.select(col("_gw_pid") +: gcols ++: col("_gw_row_off") +:
        (if (needDense) Seq(col("_gw_dr_off")) else Nil): _*)
    }

    var out = local.join(broadcast(offsets), "_gw_pid" +: groups)
    if (needCount) {
      if (groups.isEmpty)
        out = out.crossJoin(
          broadcast(counts.agg(sum(col("_gw_n")).as("gw_count"))))
      else
        out = out.join(
          broadcast(counts.groupBy(gcols: _*)
            .agg(sum(col("_gw_n")).as("gw_count"))), groups)
    }
    if (stats("row_number"))
      out = out.withColumn("gw_row_number", col("_gw_row_off") + col("_gw_lrn"))
    if (needRank)
      out = out.withColumn("gw_rank", col("_gw_row_off") + col("_gw_lrk"))
    if (needDense)
      out = out.withColumn("gw_dense_rank", col("_gw_dr_off") + col("_gw_ldr"))
    if (stats("percent_rank"))
      out = out.withColumn("gw_percent_rank",
        when(col("gw_count") > 1,
          (col("gw_rank") - 1).cast("double") / (col("gw_count") - 1))
          .otherwise(lit(0.0)))
    if (needRank && !stats("rank")) out = out.drop("gw_rank")
    if (needCount && !stats("count")) out = out.drop("gw_count")
    out.drop("_gw_pid", "_gw_lrn", "_gw_lrk", "_gw_ldr",
      "_gw_row_off", "_gw_dr_off")
  }

  /** Distributed global running sum — `sum(x) OVER (ORDER BY keys)` with
    * the same three-step shape as [[withGlobalOrderStats]] (range
    * partition → one linear local pass → broadcast offset patch), never
    * an Exchange SinglePartition. For each `(in, out)` in `sums`, appends
    * `out` = the cumulative sum of `in` in global `keys` order (NULLs
    * contribute nothing, like SQL SUM). Integral inputs accumulate as
    * LONG (exact), fractional as DOUBLE. Within equal keys the running
    * sum is row-order dependent (same contract as a ROWS window);
    * aggregate `df` per key first if ties must collapse. `groups` is the
    * grouped form — `SUM(x) OVER (PARTITION BY groups ORDER BY keys)`
    * with accumulators resetting on group change and per-group offset
    * patching, one range shuffle for all groups (the same extension
    * [[withGlobalOrderStats]] has). */
  def withGlobalRunningSum(df: DataFrame, keys: Seq[(String, Boolean)],
      sums: Seq[(String, String)], groups: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "global running sum needs at least one key")
    require(sums.nonEmpty, "global running sum needs at least one column")
    // same first-class local pass as [[withGlobalOrderStats]], in
    // running-sum mode — the sums come back already named `out`
    val local = graft.plans.RunningStats.local(df, groups, keys, sums,
      needRowNumber = false, needRank = false, needDense = false)

    // per-(partition, group) totals ride the SAME range shuffle
    // (ReusedExchange); they aggregate `local` — NOT a separate
    // aggregate over the raw exchange, which would column-prune into a
    // different range exchange with independently sampled (drifting)
    // boundaries. The offsets are a |partitions × groups spanned|-row
    // window, cumulative per group over pid order.
    val gcols = groups.map(col)
    val aggs = sums.zipWithIndex.map { case ((in, _), j) =>
      // all-NULL partitions total 0, not NULL — a NULL here would poison
      // the offset arithmetic for that partition
      coalesce(sum(col(in)), lit(0)).as(s"_gw_t$j") }
    val counts = local.groupBy(col("_gw_pid") +: gcols: _*)
      .agg(aggs.head, aggs.tail: _*)
    val w = Window.partitionBy(gcols: _*).orderBy(col("_gw_pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = sums.indices.foldLeft(counts) { (d, j) =>
      d.withColumn(s"_gw_off$j",
        sum(col(s"_gw_t$j")).over(w) - col(s"_gw_t$j"))
    }.select(col("_gw_pid") +: gcols ++:
      sums.indices.map(j => col(s"_gw_off$j")): _*)

    val patched = sums.zipWithIndex.foldLeft(
        local.join(broadcast(offsets), "_gw_pid" +: groups)) {
      case (d, ((_, out), j)) =>
        d.withColumn(out, col(out) + col(s"_gw_off$j"))
    }
    patched.drop("_gw_pid" +: sums.indices.map(j => s"_gw_off$j"): _*)
  }

  /** Global NTILE(n) by `keys` (requires a total order for determinism,
    * like the built-in): standard SQL bucketing — the first `count % n`
    * buckets get `count/n + 1` rows, the rest `count/n`. With `groups`,
    * NTILE(n) OVER (PARTITION BY groups ORDER BY keys) in one shared
    * range pass — N quantile cuts for the price of one shuffle. */
  def withGlobalNtile(df: DataFrame, keys: Seq[(String, Boolean)],
      n: Int, outCol: String = "gw_ntile",
      groups: Seq[String] = Nil): DataFrame = {
    // only the two stats ntile consumes — no rank/tie machinery at all
    val base = withGlobalOrderStats(df, keys, Set("row_number", "count"),
      groups)
    // `div`, not `/`: with ANSI off, `/` on longs is double division
    val size = expr(s"gw_count div $n")
    val rem = col("gw_count") % n
    val big = rem * (size + lit(1L))
    // size = 0 (fewer rows than buckets) keeps every row in the first
    // branch (big = gw_count), so the else-side `div size` cannot hit 0
    base.withColumn(outCol,
      when(col("gw_row_number") <= big,
        floor((col("gw_row_number") - 1) / (size + lit(1L))).cast("long") + 1)
        .otherwise(rem +
          floor((col("gw_row_number") - big - 1) / size).cast("long") + 1))
  }

  /** q35 registry entry: global (unpartitioned) rank battery over orders
    * by order date — heavy ties, so rank/dense_rank/percent_rank exercise
    * the cross-partition tie patching; output thinned to checked size.
    * Tie-invariant stats only (row_number under ties is as undefined here
    * as in any SQL engine; the spec checks it under a total order). */
  def orderDateGlobalRank(orders: DataFrame): DataFrame =
    withGlobalOrderStats(orders, Seq("o_orderdate" -> true))
      .filter(col("o_orderkey") % 500 === 0)
      .select(col("o_orderkey"), col("o_orderdate"),
        col("gw_rank"), col("gw_dense_rank"),
        round(col("gw_percent_rank"), 6).as("gw_pr"))
      .orderBy("o_orderkey")

  val q35GlobalRankSql: String =
    """SELECT o_orderkey, o_orderdate, gw_rank, gw_dense_rank, gw_pr FROM (
      |  SELECT o_orderkey, o_orderdate,
      |    rank() OVER w AS gw_rank,
      |    dense_rank() OVER w AS gw_dense_rank,
      |    round(percent_rank() OVER w, 6) AS gw_pr
      |  FROM orders
      |  WINDOW w AS (ORDER BY o_orderdate)) t
      |WHERE o_orderkey % 500 = 0 ORDER BY o_orderkey""".stripMargin

  type QFn = (org.apache.spark.sql.SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q35_global_rank",
      (s: org.apache.spark.sql.SparkSession, d: String) =>
        orderDateGlobalRank(graft.core.Tables.orders(s, d)),
      Some(q35GlobalRankSql)))
}
