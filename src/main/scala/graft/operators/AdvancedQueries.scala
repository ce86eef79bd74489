package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.ExactMoments

/** Operators beyond the SURVEY §2b core set: as-of join, pivot, exact
  * percentiles, and a typed-Aggregator UDAF. Each has a DuckDB oracle.
  */
object AdvancedQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** q27a — as-of join: attach to every event the value of the same user's
    * most recent purchase at-or-before the event's timestamp.
    *
    * Implemented the scale-correct way: no range join, no per-row subquery.
    * Tag the (pre-aggregated) purchase stream side=0 and the probe stream
    * side=1, union, and take `last(pv, ignoreNulls)` over a
    * (user_id) × (ts, side) running window — one shuffle on user_id, one
    * sort, linear in input. Purchases are pre-aggregated per (user, ts)
    * (max value) so the as-of match is unique and tie-free in both engines.
    * DuckDB expresses the same operator natively as ASOF LEFT JOIN.
    */
  def q27AsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("pv"))
      .select(col("user_id"), col("ts"), lit(0).as("side"),
        lit(null).cast("long").as("event_id"),
        lit(null).cast("string").as("event_type"),
        lit(null).cast("double").as("value"), col("pv"))
    val probes = ev.select(col("user_id"), col("ts"), lit(1).as("side"),
      col("event_id"), col("event_type"), col("value"),
      lit(null).cast("double").as("pv"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    purchases.unionByName(probes)
      .withColumn("asof_pv", last(col("pv"), ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"),
        round(col("asof_pv"), 2).as("asof_pv"))
      .orderBy("event_id")
  }
  val q27AsofSql: String =
    """WITH p AS (SELECT user_id, ts, max(value) AS pv FROM events
      |  WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
      |  round(p.pv, 2) AS asof_pv
      |FROM events e ASOF LEFT JOIN p
      |  ON e.user_id = p.user_id AND p.ts <= e.ts
      |ORDER BY e.event_id""".stripMargin

  /** q27b — pivot with explicit values (no distinct-collect planning job;
    * at scale the pivot column set must be declared, not discovered). */
  def q27Pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("f_cnt"),
        coalesce(col("O"), lit(0L)).as("o_cnt"),
        coalesce(col("P"), lit(0L)).as("p_cnt"))
      .orderBy("o_orderpriority")
  val q27PivotSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
      |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
      |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q27c — exact interpolated percentiles (R-7, the definition both Spark's
    * `percentile` and DuckDB's `quantile_cont` implement) plus an
    * approx_percentile bound check: at 100 TB the exact sort-based form is
    * what you replace with the sketch, so the query carries both and asserts
    * the sketch lands within 1.0 of the exact median. */
  def q27Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile(col("l_quantity"), lit(0.25)).as("p25"),
        percentile(col("l_quantity"), lit(0.5)).as("p50"),
        percentile(col("l_quantity"), lit(0.75)).as("p75"),
        percentile(col("l_quantity"), lit(0.95)).as("p95"),
        percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("ap50"))
      .select(col("l_returnflag"),
        round(col("p25"), 4).as("p25"), round(col("p50"), 4).as("p50"),
        round(col("p75"), 4).as("p75"), round(col("p95"), 4).as("p95"),
        (abs(col("ap50") - col("p50")) <= 1.0).as("approx_ok"))
      .orderBy("l_returnflag")
  val q27PercentilesSql: String =
    """SELECT l_returnflag,
      |  round(quantile_cont(l_quantity, 0.25), 4) AS p25,
      |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
      |  round(quantile_cont(l_quantity, 0.75), 4) AS p75,
      |  round(quantile_cont(l_quantity, 0.95), 4) AS p95,
      |  TRUE AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q27d — custom typed UDAF ([[ExactMoments]]): order-independent exact
    * moments → mean / sample variance. The oracle recomputes the same
    * closed form from exact integer sums (l_quantity is integral). */
  def q27Udaf(s: SparkSession, d: String): DataFrame = {
    val moments = udaf(ExactMoments)
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(moments(col("l_quantity")).as("m"))
      .select(col("l_returnflag"), col("m.n").as("n"),
        round(col("m.mean"), 4).as("mean_qty"),
        round(col("m.varSamp"), 4).as("var_qty"))
      .orderBy("l_returnflag")
  }
  val q27UdafSql: String =
    """WITH g AS (SELECT l_returnflag, count(*) AS n,
      |    sum(CAST(l_quantity AS BIGINT)) AS s,
      |    sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sq
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, n,
      |  round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 4) AS mean_qty,
      |  round(CAST(sq * n - s * s AS DOUBLE)
      |    / CAST(n * (n - 1) AS DOUBLE), 4) AS var_qty
      |FROM g ORDER BY l_returnflag""".stripMargin

  /** q28a — unpivot/melt (the inverse of q27_pivot): wide per-row metric
    * columns to long (metric, value) rows. Narrow generator, no shuffle
    * until the aggregation. */
  def q28Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").cast("double").as("retailprice"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
        "metric", "val")
      .groupBy(col("metric"))
      .agg(count(lit(1)).as("n"), round(sum(col("val")), 2).as("total"))
      .orderBy("metric")
  val q28UnpivotSql: String =
    """WITH u AS (
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
      |  UNION ALL
      |  SELECT p_partkey, 'retailprice', CAST(p_retailprice AS DOUBLE) FROM part)
      |SELECT metric, count(*) AS n, round(sum(val), 2) AS total
      |FROM u GROUP BY metric ORDER BY metric""".stripMargin

  /** q28b — distribution-rank window battery: ntile, percent_rank,
    * cume_dist over order value per priority class (rounded; ties broken by
    * orderkey so both engines rank identically). */
  def q28Ntile(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .filter(col("o_orderkey") % 1000 === 0) // thin the checked output
      .orderBy("o_orderpriority", "o_orderkey")
  }
  val q28NtileSql: String =
    """SELECT o_orderpriority, o_orderkey, quartile, pr, cd FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    ntile(4) OVER w AS quartile,
      |    round(percent_rank() OVER w, 6) AS pr,
      |    round(cume_dist() OVER w, 6) AS cd
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice DESC, o_orderkey)) t
      |WHERE o_orderkey % 1000 = 0
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q27_asof_join", q27AsofJoin _, Some(q27AsofSql)),
    ("q27_pivot", q27Pivot _, Some(q27PivotSql)),
    ("q27_percentiles", q27Percentiles _, Some(q27PercentilesSql)),
    ("q27_udaf_moments", q27Udaf _, Some(q27UdafSql)),
    ("q28_unpivot", q28Unpivot _, Some(q28UnpivotSql)),
    ("q28_ntile_window", q28Ntile _, Some(q28NtileSql)))
}
