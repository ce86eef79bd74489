package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.ExactMoments

/** Operators beyond the SURVEY §2b core set: as-of join, pivot, exact
  * percentiles, and a typed-Aggregator UDAF. Each has a DuckDB oracle.
  *
  * Library surface: `DataFrame => DataFrame` (the as-of join is fully
  * generic over any probe/quote pair); the registry entries at the bottom
  * adapt the fixture tables.
  */
object AdvancedQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** Generic as-of join: attach to every `probe` row the `valueCol` of the
    * same key's most recent `quotes` row at-or-before the probe's
    * timestamp, as `outCol`. All probe columns are preserved.
    *
    * Implemented the scale-correct way: no range join, no per-row
    * subquery. Tag quotes side=0 and probes side=1, union, and take
    * `last(value, ignoreNulls)` over a (key) × (ts, side) running window —
    * one shuffle on the key, one sort, linear in input. Ties at equal ts
    * resolve quote-before-probe, i.e. the inclusive `quote.ts <= probe.ts`
    * contract. `quotes` must be unique per (key, ts) for a deterministic
    * match — pre-aggregate if not. */
  def asofJoin(probe: DataFrame, quotes: DataFrame, keyCol: String,
      tsCol: String, valueCol: String, outCol: String = "asof_value"): DataFrame = {
    require(!probe.columns.contains(valueCol),
      s"probe already has a column named '$valueCol'; rename the quote value")
    Seq("_side", "_qv").foreach { reserved =>
      require(!probe.columns.contains(reserved) && !quotes.columns.contains(reserved),
        s"column name '$reserved' is reserved by asofJoin; rename it in the input")
    }
    val valueType = quotes.schema(valueCol).dataType
    val quoteSide = probe.columns.foldLeft(
      quotes.select(col(keyCol), col(tsCol), lit(0).as("_side"),
        col(valueCol).as("_qv"))) {
      case (df, c) if c == keyCol || c == tsCol => df
      case (df, c) => df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }
    val probeSide = probe.withColumn("_side", lit(1))
      .withColumn("_qv", lit(null).cast(valueType))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    quoteSide.unionByName(probeSide)
      .withColumn(outCol, last(col("_qv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .drop("_side", "_qv")
  }

  /** q27a — as-of join over the fixture events: each event gets the same
    * user's most recent purchase value. Purchases are pre-aggregated per
    * (user, ts) (max value) so the as-of match is unique and tie-free in
    * both engines. DuckDB expresses the same operator natively as
    * ASOF LEFT JOIN. */
  def eventPurchaseAsof(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("pv"))
    asofJoin(events, purchases, "user_id", "ts", "pv", "asof_pv")
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
  def statusPivot(orders: DataFrame): DataFrame =
    orders
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
  def quantityPercentiles(lineitem: DataFrame): DataFrame =
    lineitem
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
  def quantityMoments(lineitem: DataFrame): DataFrame = {
    val moments = udaf(ExactMoments)
    lineitem
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
      |  round(CASE WHEN n > 1 THEN CAST(sq * n - s * s AS DOUBLE)
      |    / CAST(n * (n - 1) AS DOUBLE) ELSE NULL END, 4) AS var_qty
      |FROM g ORDER BY l_returnflag""".stripMargin

  /** q28a — unpivot/melt (the inverse of q27_pivot): wide per-row metric
    * columns to long (metric, value) rows. Narrow generator, no shuffle
    * until the aggregation. */
  def partMetricsUnpivot(part: DataFrame): DataFrame =
    part
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
  def orderNtile(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
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
    ("q27_asof_join",
      (s: SparkSession, d: String) => eventPurchaseAsof(Tables.events(s, d)),
      Some(q27AsofSql)),
    ("q27_pivot",
      (s: SparkSession, d: String) => statusPivot(Tables.orders(s, d)),
      Some(q27PivotSql)),
    ("q27_percentiles",
      (s: SparkSession, d: String) => quantityPercentiles(Tables.lineitem(s, d)),
      Some(q27PercentilesSql)),
    ("q27_udaf_moments",
      (s: SparkSession, d: String) => quantityMoments(Tables.lineitem(s, d)),
      Some(q27UdafSql)),
    ("q28_unpivot",
      (s: SparkSession, d: String) => partMetricsUnpivot(Tables.part(s, d)),
      Some(q28UnpivotSql)),
    ("q28_ntile_window",
      (s: SparkSession, d: String) => orderNtile(Tables.orders(s, d)),
      Some(q28NtileSql)))
}
