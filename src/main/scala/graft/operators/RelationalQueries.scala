package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Batch relational operator library — SURVEY.md §2b Q01–Q18.
  *
  * Every query is expressed with the declarative DataFrame API so Catalyst
  * gets full visibility (predicate pushdown, column pruning, join selection,
  * AQE). Each query carries an equivalent DuckDB SQL oracle; both sides
  * follow the determinism contract (FIXTURES.md §3): explicit total ORDER
  * BY, doubles rounded in-query, timestamps emitted as DATE or epoch
  * integers (never raw sub-second timestamps — parquet stores nanos, Spark
  * truncates to micros).
  *
  * Scale posture (100 TB north star): dimension joins are broadcast; fact
  * sides never shuffle more than once per agg; no collect() anywhere.
  *
  * Library surface: every query is `DataFrame => DataFrame` over its input
  * table(s) — callable on any frames with the expected columns; the
  * registry entries at the bottom adapt the fixture tables.
  */
object RelationalQueries {
  type QFn = (SparkSession, String) => DataFrame

  /** q01 — scan + projection + column pruning. Reference analog: the raw
    * record scan (SURVEY §2a R2); here over parquet with pruned ReadSchema. */
  def q01Scan(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber")
  val q01Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** q02 — filter with pushdown-eligible predicates (date, range, numeric). */
  def q02Filter(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
        && col("l_discount").between(0.05, 0.07)
        && col("l_quantity") < 24)
      .agg(count(lit(1)).as("cnt"))
  val q02Sql: String =
    """SELECT count(*) AS cnt FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** q03 — TPC-H Q1 shape: partial+final hash aggregate. */
  def q03Agg(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  val q03Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q04 — distinct aggregates (expand + two-phase agg). */
  def q04Distinct(orders: DataFrame): DataFrame =
    orders.agg(
      countDistinct(col("o_custkey")).as("n_custkeys"),
      countDistinct(col("o_orderpriority")).as("n_priorities"))
  val q04Sql: String =
    """SELECT count(DISTINCT o_custkey) AS n_custkeys,
      |  count(DISTINCT o_orderpriority) AS n_priorities FROM orders""".stripMargin

  /** q05 — equi join, dimension side broadcast. */
  def q05Join(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy("c_mktsegment")
  val q05Sql: String =
    """SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue,
      |  count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q06 — multi-way star join (TPC-H Q5 shape): dims broadcast, single
    * shuffle on the fact side for the final agg. The region→nation link
    * (5×25 rows) runs as an in-stage nested loop rather than its own
    * nested broadcast-exchange job (the r11 verdict's q06 job-count
    * item); customer then probes the finished chain as a regular
    * broadcast-hash join — hash probing, not NL, because customer is
    * data-scale at real size. */
  def q06MultiJoin(region: DataFrame, nation: DataFrame, customer: DataFrame, orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val rn = region.filter(col("r_name").isin("ASIA", "EUROPE"))
      .join(nation.hint("shuffle_replicate_nl"),
        col("n_regionkey") === col("r_regionkey"))
    val dims = broadcast(
      customer.join(broadcast(rn), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name")))
    orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
      .join(dims, col("o_custkey") === col("c_custkey"))
      .join(lineitem, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      // dim-bounded output (≤ |nations| rows): one-partition sort
      // skips the RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions("n_name")
  }
  val q06Sql: String =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM region
      |JOIN nation ON n_regionkey = r_regionkey
      |JOIN customer ON c_nationkey = n_nationkey
      |JOIN orders ON o_custkey = c_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE r_name IN ('ASIA', 'EUROPE')
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q07a — left outer join keeping zero-match rows (count of urgent orders
    * per customer, zeros included). */
  def q07LeftOuter(customer: DataFrame, orders: DataFrame): DataFrame = {
    val o = orders.filter(col("o_orderpriority") === "1-URGENT")
    customer
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_urgent"))
      .orderBy("c_custkey")
  }
  val q07LeftOuterSql: String =
    """SELECT c_custkey, count(o_orderkey) AS n_urgent
      |FROM customer LEFT JOIN orders
      |  ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT'
      |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin

  /** q07b — anti join (NOT EXISTS): customers with no urgent orders. */
  def q07Anti(customer: DataFrame, orders: DataFrame): DataFrame = {
    val o = orders.filter(col("o_orderpriority") === "1-URGENT")
    customer
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"))
      .orderBy("c_custkey")
  }
  val q07AntiSql: String =
    """SELECT c_custkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** q07c — full outer join: order-calendar ⋈ event-calendar; days that
    * exist on only one side survive with zeros (both sides pre-aggregated,
    * so the join inputs are already small at any scale). */
  def q07FullOuter(orders: DataFrame, events: DataFrame): DataFrame = {
    val orderDays = orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"))
    val eventDays = events
      .groupBy(to_date(col("ts")).as("e_day"))
      .agg(count(lit(1)).as("n_events"))
    orderDays.join(eventDays, col("day") === col("e_day"), "full_outer")
      .select(coalesce(col("day"), col("e_day")).as("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy("day")
  }
  val q07FullOuterSql: String =
    """WITH o AS (SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
      |  FROM orders GROUP BY 1),
      |e AS (SELECT CAST(ts AS DATE) AS e_day, count(*) AS n_events
      |  FROM events GROUP BY 1)
      |SELECT coalesce(day, e_day) AS day,
      |  coalesce(n_orders, 0) AS n_orders,
      |  coalesce(n_events, 0) AS n_events
      |FROM o FULL OUTER JOIN e ON day = e_day
      |ORDER BY day""".stripMargin

  /** q08 — semi join (IN-subquery → left_semi). */
  def q08Semi(part: DataFrame, lineitem: DataFrame): DataFrame = {
    val li = lineitem.filter(col("l_quantity") > 45)
      .select(col("l_partkey"))
    part
      .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("p_brand")
  }
  val q08Sql: String =
    """SELECT p_brand, count(*) AS n_parts FROM part
      |WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q09 — range/theta join (events within 1 minute, same user). The
    * general theta form is the self-join `a.user = b.user AND a.ts < b.ts
    * AND b.ts <= a.ts + 1min` (equi key extracted to a hash/SMJ join, range
    * residual as post-filter) — but because this query only *counts* the
    * pairs, it composes into a range-frame window: sort each user's events
    * once and count, per row, the successors inside (ts, ts+1min]. One
    * shuffle + sort, O(n log n), and the O(pairs) intermediate never
    * materializes — the plan that survives a dense-burst user at 100 TB,
    * where the join form's per-key pair blowup is quadratic. */
  def q09RangeJoin(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(1L, 60L * 1000 * 1000) // (ts, ts + 1 min] in micros
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_succ", count(lit(1)).over(w))
      .agg(sum(col("n_succ")).cast("long").as("n_pairs"))
  }
  val q09Sql: String =
    """SELECT count(*) AS n_pairs
      |FROM events a JOIN events b ON a.user_id = b.user_id
      |  AND a.ts < b.ts AND b.ts <= a.ts + INTERVAL 1 MINUTE""".stripMargin

  /** q10 — ROLLUP grouping sets (Expand-based). Null group keys coalesced
    * to 'ALL' so sort order is engine-independent. */
  def q10Rollup(orders: DataFrame): DataFrame =
    orders
      .rollup(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("total"))
      .select(
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy("priority", "status")
  val q10Sql: String =
    """SELECT coalesce(o_orderpriority, 'ALL') AS priority,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
      |ORDER BY priority, status""".stripMargin

  /** q10b — CUBE over (year, status) with grouping_id to tell real nulls
    * from subtotal rows (the standard-SQL bitmask, identical in DuckDB). */
  def q10Cube(orders: DataFrame): DataFrame =
    orders
      .cube(year(col("o_orderdate")).as("yr"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        round(sum(col("o_totalprice")), 2).as("total"))
      .select(col("gid"), coalesce(col("yr"), lit(-1)).as("yr"),
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        col("n"), col("total"))
      .orderBy("gid", "yr", "status")
  val q10CubeSql: String =
    """SELECT CAST(grouping_id(year(o_orderdate), o_orderstatus) AS BIGINT) AS gid,
      |  coalesce(year(o_orderdate), -1) AS yr,
      |  coalesce(o_orderstatus, 'ALL') AS status,
      |  count(*) AS n, round(sum(o_totalprice), 2) AS total
      |FROM orders GROUP BY CUBE (year(o_orderdate), o_orderstatus)
      |ORDER BY gid, yr, status""".stripMargin

  /** q11 — ranking window: top-3 orders per customer. */
  def q11RankWindow(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"))
      .orderBy("o_custkey", "rn")
  }
  val q11Sql: String =
    """SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS price
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** q12a — analytic window with ROWS frame: running revenue per customer. */
  def q12Running(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders
      .withColumn("running", round(sum(col("o_totalprice")).over(w), 2))
      .select(col("o_custkey"), col("o_orderkey"), col("running"))
      .orderBy("o_custkey", "o_orderkey")
  }
  val q12RunningSql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q12b — lag/lead day-over-day on daily event revenue. */
  def q12LagLead(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(to_date(col("ts")).as("day"))
      .agg(round(sum(col("value")), 2).as("daily_value"), count(lit(1)).as("n"))
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("prev_value", lag(col("daily_value"), 1).over(w))
      .withColumn("next_value", lead(col("daily_value"), 1).over(w))
      .select(col("day"), col("n"), col("daily_value"),
        round(col("daily_value") - col("prev_value"), 2).as("delta_prev"),
        round(col("next_value") - col("daily_value"), 2).as("delta_next"))
      .orderBy("day")
  }
  val q12LagLeadSql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, round(sum(value), 2) AS daily_value,
      |    count(*) AS n
      |  FROM events GROUP BY 1)
      |SELECT day, n, daily_value,
      |  round(daily_value - lag(daily_value, 1) OVER (ORDER BY day), 2) AS delta_prev,
      |  round(lead(daily_value, 1) OVER (ORDER BY day) - daily_value, 2) AS delta_next
      |FROM daily ORDER BY day""".stripMargin

  /** q13 — top-k: global sort + limit → TakeOrderedAndProject. */
  def q13TopK(orders: DataFrame): DataFrame =
    orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), round(col("o_totalprice"), 2).as("price"))
  val q13Sql: String =
    """SELECT o_orderkey, round(o_totalprice, 2) AS price FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** q14 — set operations: INTERSECT / EXCEPT / UNION / UNION ALL, counted. */
  def q14SetOps(orders: DataFrame, customer: DataFrame): DataFrame = {
    val ok = orders.select(col("o_custkey").as("k"))
    val ck = customer.select(col("c_custkey").as("k"))
    def counted(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("op"), col("n"))
    counted("except", ck.except(ok))
      .unionAll(counted("intersect", ok.intersect(ck)))
      .unionAll(counted("union", ok.union(ck).distinct))
      .unionAll(counted("union_all", ok.unionAll(ck)))
      .orderBy("op")
  }
  val q14Sql: String =
    """SELECT op, n FROM (
      |  SELECT 'except' AS op, count(*) AS n FROM
      |    (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders) t1
      |  UNION ALL SELECT 'intersect', count(*) FROM
      |    (SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey FROM customer) t2
      |  UNION ALL SELECT 'union', count(*) FROM
      |    (SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer) t3
      |  UNION ALL SELECT 'union_all', count(*) FROM
      |    (SELECT o_custkey AS k FROM orders UNION ALL SELECT c_custkey FROM customer) t4
      |) u ORDER BY op""".stripMargin

  /** q15a — scalar string + math function battery over part. */
  def q15StringMath(part: DataFrame): DataFrame =
    part
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n"),
        sum(length(col("p_name"))).as("sum_name_len"),
        sum(when(col("p_name").like("%widget%"), 1).otherwise(0)).as("n_widget"),
        sum(length(upper(concat(col("p_brand"), lit("_"),
          substring(col("p_type"), 1, 3))))).as("sum_expr_len"),
        sum(regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).cast("int")).as("sum_brand_num"),
        sum(abs(col("p_size") - 25)).as("sum_abs"),
        sum(floor(col("p_retailprice")).cast("long")).as("sum_floor_price"),
        round(sum(log(col("p_retailprice") + 1.0)), 4).as("sum_ln"),
        round(sum(pow(col("p_size").cast("double"), 2.0)), 1).as("sum_pow"))
      .orderBy("p_brand")
  val q15StringMathSql: String =
    """SELECT p_brand, count(*) AS n,
      |  CAST(sum(length(p_name)) AS BIGINT) AS sum_name_len,
      |  CAST(sum(CASE WHEN p_name LIKE '%widget%' THEN 1 ELSE 0 END) AS BIGINT) AS n_widget,
      |  CAST(sum(length(upper(p_brand || '_' || substring(p_type, 1, 3)))) AS BIGINT) AS sum_expr_len,
      |  CAST(sum(CAST(regexp_extract(p_brand, 'Brand#(\d+)', 1) AS INT)) AS BIGINT) AS sum_brand_num,
      |  CAST(sum(abs(p_size - 25)) AS BIGINT) AS sum_abs,
      |  CAST(sum(CAST(floor(p_retailprice) AS BIGINT)) AS BIGINT) AS sum_floor_price,
      |  round(sum(ln(p_retailprice + 1.0)), 4) AS sum_ln,
      |  round(sum(pow(CAST(p_size AS DOUBLE), 2.0)), 1) AS sum_pow
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q15b — date function battery over orders. */
  def q15Date(orders: DataFrame): DataFrame =
    orders
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(month(col("o_orderdate"))).as("n_months"),
        countDistinct(date_trunc("month", col("o_orderdate"))).as("n_mon_trunc"),
        sum(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))).as("sum_days"),
        min(month(col("o_orderdate"))).as("min_month"),
        max(dayofmonth(col("o_orderdate"))).as("max_dom"))
      .orderBy("yr")
  val q15DateSql: String =
    """SELECT year(o_orderdate) AS yr, count(*) AS n,
      |  count(DISTINCT month(o_orderdate)) AS n_months,
      |  count(DISTINCT date_trunc('month', o_orderdate)) AS n_mon_trunc,
      |  CAST(sum(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS BIGINT) AS sum_days,
      |  min(month(o_orderdate)) AS min_month,
      |  max(dayofmonth(o_orderdate)) AS max_dom
      |FROM orders GROUP BY 1 ORDER BY yr""".stripMargin

  /** q16a — JSON extraction (from_json / get_json_object) + map functions. */
  def q16Json(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", IntegerType)))
    // JSON parsing is the per-row cost here; fan out past the row-group
    // scan-parallelism ceiling before it (see Tables.fanout)
    Tables.fanout(events)
      .withColumn("k1", from_json(col("props"), schema).getField("k"))
      .withColumn("k2", get_json_object(col("props"), "$.k").cast("int"))
      // map_from_entries roundtrip: build a map and read the key back out.
      .withColumn("k3", element_at(
        map_from_entries(array(struct(lit("k").as("key"), col("k1").as("value")))), "k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k1")).as("sum_k"),
        sum(col("k2")).as("sum_k2"), sum(col("k3")).as("sum_k3"),
        max(col("k1")).as("max_k"))
      .orderBy("event_type")
  }
  val q16JsonSql: String =
    """SELECT event_type, count(*) AS n,
      |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS sum_k,
      |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS sum_k2,
      |  CAST(sum(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS BIGINT) AS sum_k3,
      |  max(CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q16b — array higher-order functions over embeddings: size, slice,
    * transform, aggregate (all fold left-to-right in both engines; elements
    * cast to double before arithmetic so both engines do identical IEEE ops). */
  def q16Array(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), col("label"),
        size(col("embedding")).as("dim"),
        round(sqrt(expr(
          "aggregate(transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, b) -> a + b)")), 4).as("l2"),
        round(expr(
          "aggregate(transform(slice(embedding, 1, 8), x -> CAST(x AS DOUBLE)), CAST(0 AS DOUBLE), (a, b) -> a + b)"), 4).as("head_sum"),
        round(array_max(col("embedding")).cast("double"), 4).as("max_elem"))
      .orderBy("vec_id")
  val q16ArraySql: String =
    """SELECT vec_id, label, len(embedding) AS dim,
      |  round(sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (a, b) -> a + b)), 4) AS l2,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding[1:8], x -> CAST(x AS DOUBLE))),
      |    (a, b) -> a + b), 4) AS head_sum,
      |  round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_elem
      |FROM embeddings ORDER BY vec_id""".stripMargin

  /** q16c — generator: posexplode over a sliced array. */
  def q16Explode(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 4)))
      .select(col("vec_id"), col("pos"),
        // + 0.0 normalizes IEEE negative zero: rounding a tiny negative
        // yields -0.0 in DuckDB but +0.0 here, and the hash compare sees
        // the sign (surfaced at sf0.1 where such a value first occurs)
        (round(col("col").cast("double"), 4) + lit(0.0)).as("val"))
      .orderBy("vec_id", "pos")
  val q16ExplodeSql: String =
    """SELECT vec_id, i - 1 AS pos,
      |  round(CAST(embedding[i] AS DOUBLE), 4) + 0.0 AS val
      |FROM embeddings, UNNEST(generate_series(1, 4)) AS g(i)
      |ORDER BY vec_id, pos""".stripMargin

  /** q17 — scalar subquery (broadcast single-row join) + CASE bucketing. */
  def q17CaseSubquery(orders: DataFrame): DataFrame = {
    val o = orders
    val avgPrice = o.agg(avg(col("o_totalprice")).as("avg_price"))
    val bucket = when(col("o_totalprice") > col("avg_price") * 1.5, "high")
      .when(col("o_totalprice") > col("avg_price"), "mid")
      .otherwise("low")
    o.crossJoin(broadcast(avgPrice))
      .groupBy(col("o_orderpriority"), bucket.as("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("o_orderpriority", "bucket")
  }
  val q17Sql: String =
    """SELECT o_orderpriority,
      |  CASE WHEN o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5 THEN 'high'
      |       WHEN o_totalprice > (SELECT avg(o_totalprice) FROM orders) THEN 'mid'
      |       ELSE 'low' END AS bucket,
      |  count(*) AS n
      |FROM orders GROUP BY 1, 2 ORDER BY o_orderpriority, bucket""".stripMargin

  /** q18 — approx_count_distinct (HLL++) asserted within 5% of exact; the
    * hashed output carries the exact count plus the bound check (the approx
    * value itself is engine-specific so it cannot hash-match an oracle). */
  def q18ApproxDistinct(lineitem: DataFrame): DataFrame =
    lineitem
      .agg(countDistinct(col("l_partkey")).as("exact_cnt"),
        approx_count_distinct(col("l_partkey")).as("approx"))
      .select(col("exact_cnt"),
        (abs(col("approx") - col("exact_cnt")).cast("double") / col("exact_cnt") <= 0.05)
          .as("within5pct"))
  val q18Sql: String =
    """SELECT count(DISTINCT l_partkey) AS exact_cnt, TRUE AS within5pct
      |FROM lineitem""".stripMargin

  /** q29 — supplier revenue share per nation (TPC-H Q11 shape over the
    * available tables): lineitem pre-aggregated per supplier BEFORE the
    * dimension joins (one fact shuffle on l_suppkey, map-side partials),
    * supplier and nation broadcast, then a HAVING-style share filter
    * against the broadcast single-row total — no second fact scan. */
  def q29SupplierShare(lineitem: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    val perSupp = lineitem
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
    val byNation = perSupp
      .join(broadcast(supplier),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("rev")).as("rev"))
    val total = byNation.agg(sum(col("rev")).as("tot"))
    byNation.crossJoin(broadcast(total))
      .filter(col("rev") > col("tot") * 0.02)
      .select(col("n_name"), col("n_suppliers"),
        round(col("rev"), 2).as("revenue"),
        round(col("rev") / col("tot") * 100, 4).as("share_pct"))
      .orderBy(col("revenue").desc, col("n_name"))
  }
  val q29Sql: String =
    """WITH perSupp AS (
      |  SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS rev
      |  FROM lineitem GROUP BY 1),
      |byNation AS (
      |  SELECT n_name, count(*) AS n_suppliers, sum(rev) AS rev
      |  FROM perSupp
      |  JOIN supplier ON s_suppkey = l_suppkey
      |  JOIN nation ON n_nationkey = s_nationkey
      |  GROUP BY 1)
      |SELECT n_name, n_suppliers, round(rev, 2) AS revenue,
      |  round(rev / (SELECT sum(rev) FROM byNation) * 100, 4) AS share_pct
      |FROM byNation
      |WHERE rev > (SELECT sum(rev) FROM byNation) * 0.02
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** q107 — sole-late-supplier audit (the TPC-H Q21 shape over the
    * available columns: Q21's correlated EXISTS / NOT EXISTS pair
    * finds suppliers who ALONE held up a multi-supplier order; with no
    * commit/receipt dates, "late" is shipping > `lateDays` after the
    * order date). Re-expressed Spark-first WITHOUT correlated
    * subqueries: one pass collapses lineitem to per-(order, supplier)
    * late flags, and the per-order supplier/late counts are WINDOWS over
    * those flags — the qualifying rows are then a pure filter (late ∧
    * multi-supplier ∧ exactly-one-late). One explicit orderkey
    * repartition feeds BOTH the flag aggregation (its (orderkey,
    * suppkey) clustering is subsumed — same-order rows are co-located)
    * and the windows, so lineitem is scanned once and exchanged once;
    * a groupBy + self-join formulation measured TWO scans and four fact
    * exchanges (Spark plans each side of a self-join independently).
    * Supplier names broadcast at the end.
    *
    * The decorrelation matters at 100 TB: Catalyst rewrites correlated
    * EXISTS into joins, but the NOT EXISTS arm becomes a second
    * fact-fact anti-join; this formulation never joins the fact table
    * to itself in any form. */
  def q107WaitingSupplier(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, lateDays: Int = 60, topN: Int = 20): DataFrame = {
    val flags = lineitem
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .repartition(col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("l_shipdate") >
        col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"), 1)
        .otherwise(0)).as("late"))
    val w = Window.partitionBy(col("l_orderkey"))
    flags
      .withColumn("ns", count(lit(1)).over(w))
      .withColumn("nl", sum(col("late")).over(w))
      .filter(col("late") === 1 && col("ns") > 1 && col("nl") === 1)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(topN)
  }
  def q107Sql(lateDays: Int = 60, topN: Int = 20): String =
    s"""WITH f AS (
       |  SELECT l_orderkey, l_suppkey,
       |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL $lateDays DAY
       |      THEN 1 ELSE 0 END) AS late
       |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2),
       |o AS (SELECT l_orderkey, count(*) AS ns, sum(late) AS nl
       |  FROM f GROUP BY 1)
       |SELECT s_name, count(*) AS numwait
       |FROM f JOIN o USING (l_orderkey)
       |JOIN supplier ON s_suppkey = f.l_suppkey
       |WHERE f.late = 1 AND o.ns > 1 AND o.nl = 1
       |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT $topN"""
      .stripMargin

  /** q109 — dormant high-balance customers (the TPC-H Q22 shape,
    * re-cut for a stream of continuing orders: Q22's "no orders ever"
    * is empty on any live book, so dormancy is "no orders since
    * `cutoff`"): customers above the positive-balance average with no
    * recent order, rolled up per nation — the win-back candidate list
    * with the money on the table. Composition: a broadcast scalar
    * subquery (the q17 pattern), an anti join whose probe side is
    * PRE-FILTERED at the orders scan (the date predicate pushes down,
    * so the anti join sees only the recent slice, not order history),
    * and a broadcast dimension rollup. */
  def q109DormantCustomers(customer: DataFrame, orders: DataFrame,
      nation: DataFrame, cutoff: String = "2000-01-01"): DataFrame = {
    val avgbal = customer.filter(col("c_acctbal") > 0)
      .agg(avg(col("c_acctbal")).as("a"))
    val recent = orders
      .filter(col("o_orderdate") >= to_timestamp(lit(cutoff)))
      .select(col("o_custkey"))
    customer.crossJoin(broadcast(avgbal))
      .filter(col("c_acctbal") > col("a"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        round(sum(col("c_acctbal")) + lit(1e-9), 2).as("totacctbal"))
      // dim-bounded output: one-partition sort skips the
      // RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions("n_name")
  }
  def q109Sql(cutoff: String = "2000-01-01"): String =
    s"""WITH avgbal AS (
       |  SELECT avg(c_acctbal) AS a FROM customer WHERE c_acctbal > 0)
       |SELECT n_name, count(*) AS numcust,
       |  round(sum(c_acctbal) + 1e-9, 2) AS totacctbal
       |FROM customer, avgbal
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE c_acctbal > avgbal.a
       |  AND NOT EXISTS (SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '$cutoff')
       |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** q108 — customer order-count distribution (the TPC-H Q13 shape):
    * how many customers placed 0, 1, 2, … orders — the zero bucket is
    * the point (it only exists through the LEFT join) and the shape is
    * the canonical join-fanout histogram: a long zero/low head means
    * dormant accounts; a fat tail means concentration the per-key
    * operators (q80 skew audit) should know about. One outer join on
    * the customer key + two metadata-scale aggregations. */
  def q108CustOrderDist(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      // dim-bounded output: one-partition sort skips the
      // RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions(col("custdist").desc, col("c_count").desc)
  val q108Sql: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
      |  GROUP BY c_custkey)
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** q113 — small-lot revenue (the TPC-H Q17 shape): revenue locked in
    * orders whose quantity is under `frac` of that part's average lot,
    * for one brand — the "should we stop retailing small lots" number.
    * Q17's correlated scalar subquery (per-part average over the WHOLE
    * lineitem history) decorrelates to an average WINDOW over the
    * brand-filtered slice: the brand's parts broadcast into the fact
    * scan, and the per-part average rides the ONE partkey exchange the
    * filter-then-sum tail reuses — the fact table never joins itself,
    * and the unfiltered-history semantics survive because the window
    * sees every lineitem row of the surviving parts. */
  def q113SmallLotRevenue(lineitem: DataFrame, part: DataFrame,
      brand: String = "Brand#13", frac: Double = 0.2): DataFrame = {
    val bparts = part.filter(col("p_brand") === brand)
      .select(col("p_partkey"))
    val w = Window.partitionBy(col("l_partkey"))
    lineitem
      .join(broadcast(bparts), col("l_partkey") === col("p_partkey"))
      .withColumn("_avgq", avg(col("l_quantity")).over(w))
      .filter(col("l_quantity") < lit(frac) * col("_avgq"))
      .agg(count(lit(1)).as("n_small"),
        round(sum(col("l_extendedprice")) / 7.0 + lit(1e-9), 2)
          .as("avg_yearly"))
  }
  def q113Sql(brand: String = "Brand#13", frac: Double = 0.2): String =
    s"""SELECT count(*) AS n_small,
       |  round(sum(l_extendedprice) / 7.0 + 1e-9, 2) AS avg_yearly
       |FROM lineitem l JOIN part p ON p_partkey = l_partkey
       |WHERE p_brand = '$brand'
       |  AND l_quantity < (SELECT $frac * avg(l_quantity)
       |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)"""
      .stripMargin

  /** q114 — big-basket orders (the TPC-H Q18 shape): orders whose total
    * quantity exceeds `minQty`, with their customers — the large-volume
    * account report. One fact aggregate on the orderkey, the
    * HAVING-style filter BEFORE any join (the survivors are rare, so
    * the order/customer joins see a sliver), then two key joins. */
  def q114BigBaskets(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, minQty: Double = 250, topN: Int = 100)
      : DataFrame =
    lineitem.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"),
        round(col("sum_qty") + lit(1e-9), 1).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(topN)
  def q114Sql(minQty: Double = 250, topN: Int = 100): String =
    s"""WITH oq AS (SELECT l_orderkey, sum(l_quantity) AS sum_qty
       |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > $minQty)
       |SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       |  round(sum_qty + 1e-9, 1) AS sum_qty
       |FROM oq JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT $topN""".stripMargin

  /** q115 — single-source concentration audit (the TPC-H Q20 question
    * re-cut for shipment data: no partsupp table, so "excess stock"
    * becomes observed supply share): suppliers carrying at least
    * `minShare` of some part's total shipped quantity, rolled up per
    * supplier — the supply-chain-risk list (lose this supplier, lose a
    * chunk of those parts' volume). Quantities are integer-valued
    * doubles, so the share is an exact rational and the threshold
    * compare is engine-deterministic. One explicit partkey exchange
    * feeds both the (part, supplier) aggregate (key-subset clustering)
    * and the part-total window. */
  def q115SingleSourceRisk(lineitem: DataFrame, supplier: DataFrame,
      minShare: Double = 0.15): DataFrame = {
    val w = Window.partitionBy(col("l_partkey"))
    lineitem.repartition(col("l_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity")).as("_q"))
      .withColumn("_share", col("_q") / sum(col("_q")).over(w))
      .filter(col("_share") >= minShare)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_parts_dominated"),
        round(avg(col("_share")) + lit(1e-9), 4).as("avg_share"))
      .orderBy(col("n_parts_dominated").desc, col("s_name"))
  }
  def q115Sql(minShare: Double = 0.15): String =
    s"""WITH ps AS (SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
       |  FROM lineitem GROUP BY 1, 2),
       |sh AS (SELECT l_partkey, l_suppkey,
       |    q / sum(q) OVER (PARTITION BY l_partkey) AS share
       |  FROM ps)
       |SELECT s_name, count(*) AS n_parts_dominated,
       |  round(avg(share) + 1e-9, 4) AS avg_share
       |FROM sh JOIN supplier ON s_suppkey = l_suppkey
       |WHERE share >= $minShare
       |GROUP BY s_name
       |ORDER BY n_parts_dominated DESC, s_name""".stripMargin

  /** q116 — cheapest observed supplier per part (the TPC-H Q2 shape:
    * Q2's correlated min-supplycost subquery, re-cut to shipment data
    * as the min observed unit price): for parts of one size class, the
    * supplier with the lowest observed unit price — the argmin-join
    * every procurement dashboard runs. Decorrelated as a row_number
    * window over the (part, supplier) unit-cost table; the size-class
    * parts broadcast into the fact scan. */
  def q116CheapestSupplier(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, sizeSel: Int = 10, topN: Int = 100)
      : DataFrame = {
    val parts = part.filter(col("p_size") === sizeSel)
      .select(col("p_partkey"), col("p_name"))
    val w = Window.partitionBy(col("l_partkey"))
      .orderBy(col("_uc"), col("l_suppkey"))
    lineitem.filter(col("l_quantity") > 0)
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"), col("p_name"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("_uc"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("p_name"), col("s_name"),
        round(col("_uc") + lit(1e-9), 4).as("unit_cost"))
      // s_name completes the sort key: two partkeys tying on both
      // unit_cost and p_name at the LIMIT boundary would otherwise keep
      // an engine-dependent row
      .orderBy(col("unit_cost"), col("p_name"), col("s_name")).limit(topN)
  }
  def q116Sql(sizeSel: Int = 10, topN: Int = 100): String =
    s"""WITH uc AS (
       |  SELECT l_partkey, p_name, l_suppkey,
       |    min(l_extendedprice / l_quantity) AS uc
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_size = $sizeSel AND l_quantity > 0
       |  GROUP BY 1, 2, 3),
       |r AS (SELECT p_name, l_suppkey, uc,
       |    row_number() OVER (PARTITION BY l_partkey
       |      ORDER BY uc, l_suppkey) AS rn
       |  FROM uc)
       |SELECT p_name, s_name, round(uc + 1e-9, 4) AS unit_cost
       |FROM r JOIN supplier ON s_suppkey = l_suppkey
       |WHERE rn = 1
       |ORDER BY unit_cost, p_name, s_name LIMIT $topN""".stripMargin

  /** q117 — top revenue supplier in a quarter (the TPC-H Q15 shape:
    * the view + scalar-max subquery): per-supplier discounted revenue
    * over a 3-month ship window, keeping the supplier(s) achieving the
    * maximum. The max rides in-plan as a broadcast scalar over the
    * SAME aggregate (the q17 pattern); the date predicate pushes to
    * the scan so the aggregate sees one quarter, not history. */
  def q117TopSupplier(lineitem: DataFrame, supplier: DataFrame,
      from: String = "1996-01-01", months: Int = 3): DataFrame = {
    val lo = to_timestamp(lit(from))
    val rev = lineitem
      .filter(col("l_shipdate") >= lo &&
        col("l_shipdate") < lo + expr(s"INTERVAL $months MONTHS"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("_r"))
    val mx = rev.agg(max(col("_r")).as("_m"))
    rev.crossJoin(broadcast(mx)).filter(col("_r") === col("_m"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), round(col("_r") + lit(1e-9), 2)
        .as("total_rev"))
      .orderBy("s_name")
  }
  def q117Sql(from: String = "1996-01-01", months: Int = 3): String =
    s"""WITH rev AS (
       |  SELECT l_suppkey,
       |    sum(l_extendedprice * (1.0 - l_discount)) AS r
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$from'
       |    AND l_shipdate < TIMESTAMP '$from' + INTERVAL $months MONTH
       |  GROUP BY 1)
       |SELECT s_name, round(r + 1e-9, 2) AS total_rev
       |FROM rev JOIN supplier ON s_suppkey = l_suppkey
       |WHERE r = (SELECT max(r) FROM rev)
       |ORDER BY s_name""".stripMargin

  /** q121 — late-shipment priority census (the TPC-H Q4 shape): orders
    * placed in one quarter with at least one line shipped more than
    * `graceDays` after the order date (the commit-date proxy this
    * reduced schema carries), counted per priority — the SLA dashboard
    * row. Q4's EXISTS decorrelates to a left-semi join whose condition
    * carries the cross-table date compare; the quarter predicate pushes
    * to the orders scan, and the semi join dedups line fanout for free
    * (no distinct, no post-join aggregate by orderkey). */
  def q121LateOrders(orders: DataFrame, lineitem: DataFrame,
      from: String = "1995-07-01", graceDays: Int = 90): DataFrame = {
    val lo = to_timestamp(lit(from))
    orders
      .filter(col("o_orderdate") >= lo &&
        col("o_orderdate") < lo + expr("INTERVAL 3 MONTHS"))
      .join(lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") +
            expr(s"INTERVAL $graceDays DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      // dim-bounded output: one-partition sort skips the
      // RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions("o_orderpriority")
  }
  def q121Sql(from: String = "1995-07-01", graceDays: Int = 90): String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= TIMESTAMP '$from'
       |  AND o_orderdate < TIMESTAMP '$from' + INTERVAL 3 MONTH
       |  AND EXISTS (SELECT 1 FROM lineitem
       |    WHERE l_orderkey = o_orderkey
       |      AND l_shipdate > o_orderdate + INTERVAL $graceDays DAY)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q122 — priority mix per return class (the TPC-H Q12 shape): for
    * lines shipped in one year, how many belong to critical
    * (1-URGENT/2-HIGH) vs normal orders, per return flag (the ship-mode
    * stand-in this schema carries). The canonical join-then-CASE-count
    * shape: one fact scan with the year pushed down, the orders side
    * joined on the key, two conditional counts per group. */
  def q122PriorityLines(lineitem: DataFrame, orders: DataFrame,
      year: String = "1995"): DataFrame = {
    val lo = to_timestamp(lit(s"$year-01-01"))
    val critical = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .filter(col("l_shipdate") >= lo &&
        col("l_shipdate") < lo + expr("INTERVAL 12 MONTHS"))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(sum(when(critical, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(critical, 0L).otherwise(1L)).as("low_line_count"))
      // dim-bounded output: one-partition sort skips the
      // RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions("l_returnflag")
  }
  def q122Sql(year: String = "1995"): String =
    s"""SELECT l_returnflag,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
       |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
       |FROM lineitem JOIN orders ON o_orderkey = l_orderkey
       |WHERE l_shipdate >= TIMESTAMP '$year-01-01'
       |  AND l_shipdate < TIMESTAMP '$year-01-01' + INTERVAL 12 MONTH
       |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q123 — promo revenue share (the TPC-H Q14 shape): of one ship
    * month's discounted revenue, the percentage earned by PROMO-class
    * parts. The month predicate pushes to the fact scan, the part class
    * broadcasts, and both the conditional and total revenue fold in ONE
    * aggregate row — the in-plan ratio idiom (no second pass, no
    * driver action). */
  def q123PromoRevenue(lineitem: DataFrame, part: DataFrame,
      from: String = "1995-09-01"): DataFrame = {
    val lo = to_timestamp(lit(from))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .filter(col("l_shipdate") >= lo &&
        col("l_shipdate") < lo + expr("INTERVAL 1 MONTHS"))
      .join(broadcast(part.select(col("p_partkey"), col("p_type"))),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
          sum(when(col("p_type").startsWith("PROMO"), rev)
            .otherwise(lit(0.0))) / sum(rev) + lit(1e-9), 4)
        .as("promo_revenue_pct"))
  }
  def q123Sql(from: String = "1995-09-01"): String =
    s"""SELECT round(100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
       |    THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
       |  / sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 4)
       |  AS promo_revenue_pct
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_shipdate >= TIMESTAMP '$from'
       |  AND l_shipdate < TIMESTAMP '$from' + INTERVAL 1 MONTH"""
      .stripMargin

  /** q124 — supplier variety per part class (the TPC-H Q16 shape): how
    * many distinct suppliers ship each (brand, type, size) — sourcing
    * breadth, the procurement complement to q115's concentration risk —
    * EXCLUDING flagged suppliers (negative account balance, Q16's
    * complaints list). The exclusion is Q16's NOT IN, decorrelated to a
    * broadcast anti join on the slim supplier projection BEFORE the
    * distinct-count aggregate; supplier-part pairs come from the
    * shipment fact (this schema's partsupp). Null fact keys are
    * dropped EXPLICITLY on both sides: a bare left_anti keeps
    * null-key rows where SQL's NOT IN evaluates null NOT IN (...) to
    * null and drops them — the IS NOT NULL conjunct makes the two
    * shapes agree if the corpus ever grows null l_suppkey.
    *
    * Shape note (r15, measured then REJECTED): collapsing the fact to
    * DISTINCT (partkey, suppkey) pairs before the string-keyed work
    * looked attractive — it cut the sf0.1 wall 0.9 → 0.75 s by moving
    * the part probe and (brand,type,size) aggregate past an exchange
    * and off the row-group-bound scan stage — but this corpus's
    * duplication factor is 1.02 (590 973 distinct pairs in 600 000
    * lines), so the added exchange ships essentially the whole fact
    * and the 20× point regressed 2.78 → 5.0 s. The countDistinct's own
    * partial phase already dedups map-side inside the scan stage; the
    * sf0.1 residual (~0.6 s, 3 scan tasks) is the single-row-group
    * artifact the q37 profile documents, not a plan defect — real
    * multi-row-group data scans parallel. A fanout was measured no
    * better for the same reason (ships every line). */
  def q124SupplierVariety(lineitem: DataFrame, part: DataFrame,
      supplier: DataFrame, topN: Int = 50): DataFrame =
    lineitem.select(col("l_partkey"), col("l_suppkey"))
      .filter(col("l_suppkey").isNotNull)
      .join(broadcast(supplier.filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"),
        col("p_type"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(topN)
  def q124Sql(topN: Int = 50): String =
    s"""SELECT p_brand, p_type, p_size,
       |  count(DISTINCT l_suppkey) AS supplier_cnt
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE l_suppkey IS NOT NULL AND l_suppkey NOT IN (
       |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       |GROUP BY 1, 2, 3
       |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
       |LIMIT $topN""".stripMargin

  /** q125 — disjunctive basket revenue (the TPC-H Q19 shape): revenue
    * from three (brand, size-range, quantity-range) predicate branches
    * OR-ed together — the disjunctive-pushdown stress every optimizer
    * paper cites Q19 for. The part-side conjuncts (brand, size) filter
    * the broadcast build; the OR evaluates post-join in one codegen'd
    * pass; output is one scalar row. */
  def q125DisjunctiveRevenue(lineitem: DataFrame,
      part: DataFrame): DataFrame = {
    val b1 = col("p_brand") === "Brand#1" &&
      col("p_size").between(1, 10) && col("l_quantity").between(1, 15)
    val b2 = col("p_brand") === "Brand#2" &&
      col("p_size").between(1, 20) && col("l_quantity").between(10, 30)
    val b3 = col("p_brand") === "Brand#3" &&
      col("p_size").between(1, 35) && col("l_quantity").between(20, 50)
    lineitem
      .join(broadcast(part
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))
          .select(col("p_partkey"), col("p_brand"), col("p_size"))),
        col("l_partkey") === col("p_partkey"))
      .filter(b1 || b2 || b3)
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          + lit(1e-9), 2).as("revenue"))
  }
  val q125Sql: String =
    """SELECT count(*) AS n_lines,
      |  round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 2)
      |    AS revenue
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10
      |    AND l_quantity BETWEEN 1 AND 15)
      |  OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20
      |    AND l_quantity BETWEEN 10 AND 30)
      |  OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
      |    AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** q127 — unshipped-order revenue ranking (the TPC-H Q3 shape): the
    * top orders by open revenue for one market segment — segment
    * customers broadcast into the orders scan (date pushed down), the
    * lineitem side filtered to post-cutoff shipments before the join,
    * and the top-k rides TakeOrderedAndProject (never a global sort). */
  def q127ShippingPriority(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, segment: String = "BUILDING",
      cutoff: String = "1996-06-30", topN: Int = 10): DataFrame = {
    val d = to_timestamp(lit(cutoff))
    orders.filter(col("o_orderdate") < d)
      .join(broadcast(customer.filter(col("c_mktsegment") === segment)
        .select(col("c_custkey"))), col("o_custkey") === col("c_custkey"))
      .join(lineitem.filter(col("l_shipdate") > d)
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        + lit(1e-9), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderdate"), col("o_orderkey"))
      .limit(topN)
  }
  def q127Sql(segment: String = "BUILDING", cutoff: String = "1996-06-30",
      topN: Int = 10): String =
    s"""SELECT o_orderkey, o_orderdate,
       |  round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 2)
       |    AS revenue
       |FROM orders
       |JOIN customer ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = '$segment'
       |  AND o_orderdate < TIMESTAMP '$cutoff'
       |  AND l_shipdate > TIMESTAMP '$cutoff'
       |GROUP BY o_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderdate, o_orderkey
       |LIMIT $topN""".stripMargin

  /** q128 — local-supplier volume (the TPC-H Q5 shape): revenue per
    * nation where the ordering customer and the shipping supplier sit
    * in the SAME nation of one region, for one order year. The whole
    * dimension chain (region → nation → customer / supplier)
    * broadcasts; the only fact-scale work is the lineitem⋈orders key
    * join; the same-nation constraint is an equi-condition between the
    * two broadcast dims, so it prunes in-join, not post-join. */
  def q128LocalSupplierVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, regionName: String = "ASIA",
      year: String = "1996"): DataFrame = {
    val lo = to_timestamp(lit(s"$year-01-01"))
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    orders
      .filter(col("o_orderdate") >= lo &&
        col("o_orderdate") < lo + expr("INTERVAL 12 MONTHS"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey"),
          col("l_extendedprice"), col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        + lit(1e-9), 2).as("revenue"))
      // dim-bounded output (≤|nations| rows): sort on one partition —
      // a global orderBy would pay a RangePartitioning sample JOB to
      // order a handful of rows
      .coalesce(1).sortWithinPartitions(col("revenue").desc, col("n_name"))
  }
  def q128Sql(regionName: String = "ASIA", year: String = "1996"): String =
    s"""SELECT n_name,
       |  round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 2)
       |    AS revenue
       |FROM orders
       |JOIN customer ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |  AND s_nationkey = c_nationkey
       |JOIN nation ON n_nationkey = s_nationkey
       |JOIN region ON r_regionkey = n_regionkey
       |WHERE r_name = '$regionName'
       |  AND o_orderdate >= TIMESTAMP '$year-01-01'
       |  AND o_orderdate < TIMESTAMP '$year-01-01' + INTERVAL 12 MONTH
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q129 — forecast revenue change (the TPC-H Q6 shape): the pure
    * scan-aggregate — every predicate (year, discount band, quantity
    * cap) pushes to the parquet scan and one conditional sum comes
    * back; the benchmark's canonical pushdown/codegen showcase. */
  def q129ForecastRevenue(lineitem: DataFrame, year: String = "1996",
      loDisc: Double = 0.05, hiDisc: Double = 0.07,
      maxQty: Double = 24): DataFrame = {
    val lo = to_timestamp(lit(s"$year-01-01"))
    lineitem
      .filter(col("l_shipdate") >= lo &&
        col("l_shipdate") < lo + expr("INTERVAL 12 MONTHS") &&
        col("l_discount").between(loDisc, hiDisc) &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * col("l_discount")) + lit(1e-9), 2)
          .as("revenue_delta"))
  }
  def q129Sql(year: String = "1996", loDisc: Double = 0.05,
      hiDisc: Double = 0.07, maxQty: Double = 24): String =
    s"""SELECT count(*) AS n_lines,
       |  round(sum(l_extendedprice * l_discount) + 1e-9, 2)
       |    AS revenue_delta
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '$year-01-01'
       |  AND l_shipdate < TIMESTAMP '$year-01-01' + INTERVAL 12 MONTH
       |  AND l_discount BETWEEN $loDisc AND $hiDisc
       |  AND l_quantity < $maxQty""".stripMargin

  /** q130 — bilateral shipping volume (the TPC-H Q7 shape): revenue
    * shipped between two nations (both directions kept separate), per
    * supplier-nation / customer-nation / ship-year. The two-nation
    * disjunction restricts BOTH broadcast dims before the fact join;
    * year extraction is post-join projection (no date functions block
    * the scan filters). */
  def q130NationVolume(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      nationA: String = "NATION_18", nationB: String = "NATION_19",
      fromYear: String = "1996"): DataFrame = {
    val lo = to_timestamp(lit(s"$fromYear-01-01"))
    // ONE nation build serves both lookups: the supplier and customer
    // sides broadcast the IDENTICAL (unrenamed) subtree, so canonical
    // plan matching turns the second build into a ReusedExchange — the
    // rename to supp_nation/cust_nation happens OUTSIDE the broadcast
    // (renaming inside it made the two subtrees canonically distinct
    // and built the same 2-row frame twice, one job each).
    val nat = nation.filter(col("n_name").isin(nationA, nationB))
      .select(col("n_nationkey"), col("n_name"))
    val supp = supplier.select(col("s_suppkey"), col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer.select(col("c_custkey"), col("c_nationkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    lineitem
      .filter(col("l_shipdate") >= lo &&
        col("l_shipdate") < lo + expr("INTERVAL 24 MONTHS"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        + lit(1e-9), 2).as("revenue"))
      // 2 nations × 2 directions × bounded years: sort on one
      // partition, skipping the RangePartitioning sample job
      .coalesce(1)
      .sortWithinPartitions("supp_nation", "cust_nation", "l_year")
  }
  def q130Sql(nationA: String = "NATION_18", nationB: String = "NATION_19",
      fromYear: String = "1996"): String =
    s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |  CAST(year(l_shipdate) AS INT) AS l_year,
       |  round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 2)
       |    AS revenue
       |FROM lineitem
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = s_nationkey
       |JOIN nation n2 ON n2.n_nationkey = c_nationkey
       |WHERE n1.n_name IN ('$nationA', '$nationB')
       |  AND n2.n_name IN ('$nationA', '$nationB')
       |  AND n1.n_name <> n2.n_name
       |  AND l_shipdate >= TIMESTAMP '$fromYear-01-01'
       |  AND l_shipdate < TIMESTAMP '$fromYear-01-01' + INTERVAL 24 MONTH
       |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q131 — national market share (the TPC-H Q8 shape): one nation's
    * share of a region's order revenue per order year, for one part
    * class. The share is a conditional-sum ratio inside ONE aggregate
    * row per year (the q123 in-plan ratio, grouped) — no second pass,
    * no self-join; every dimension broadcasts. */
  def q131MarketShare(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, supplier: DataFrame, nation: DataFrame,
      region: DataFrame, part: DataFrame,
      homeNation: String = "NATION_3", regionName: String = "AMERICA",
      typePrefix: String = "STANDARD"): DataFrame = {
    val marketNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    lineitem
      .join(broadcast(part.filter(col("p_type").startsWith(typePrefix))
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(marketNations),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(supplier.select(col("s_suppkey"),
          col("s_nationkey").as("_sn"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("_hnk"),
          col("n_name").as("_hn"))), col("_sn") === col("_hnk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(when(col("_hn") === homeNation, rev).otherwise(0.0))
          / sum(rev) + lit(1e-9), 4).as("mkt_share"))
      // dim-bounded output: one-partition sort skips the
      // RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions("o_year")
  }
  def q131Sql(homeNation: String = "NATION_3",
      regionName: String = "AMERICA",
      typePrefix: String = "STANDARD"): String =
    s"""SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       |  round(sum(CASE WHEN n2.n_name = '$homeNation'
       |      THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END)
       |    / sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 4)
       |    AS mkt_share
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation n1 ON n1.n_nationkey = c_nationkey
       |JOIN region ON r_regionkey = n1.n_regionkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation n2 ON n2.n_nationkey = s_nationkey
       |WHERE r_name = '$regionName' AND p_type LIKE '$typePrefix%'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q132 — product-line margin by supplier nation (the TPC-H Q9
    * shape, re-cut to this schema's columns): for parts whose name
    * carries one material token, margin = revenue − 0.8·retail·qty
    * (the supplycost proxy this schema affords), per supplier nation
    * and order year. Part and supplier dims broadcast; lineitem joins
    * orders only for the year — projected to two columns before the
    * fact join. */
  def q132ProductProfit(lineitem: DataFrame, orders: DataFrame,
      supplier: DataFrame, nation: DataFrame, part: DataFrame,
      nameToken: String = "ring", costFactor: Double = 0.8): DataFrame =
    lineitem
      .join(broadcast(part
          .filter(col("p_name").contains(nameToken))
          .select(col("p_partkey"), col("p_retailprice"))),
        col("l_partkey") === col("p_partkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).as("o_year"))
      // whole-unit margin with a 1e-4 epsilon, not the house 1e-9/2dp:
      // this sum CANCELS (revenue minus cost terms at ~1e7 magnitude),
      // so cross-engine fp drift reaches ~1e-6 — far over a cent
      // boundary's 1e-9 guard, far under the 0.5 whole-unit grid
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          - lit(costFactor) * col("p_retailprice") * col("l_quantity"))
        + lit(1e-4), 0).cast("long").as("margin"))
      .orderBy(col("nation"), col("o_year").desc)
  def q132Sql(nameToken: String = "ring",
      costFactor: Double = 0.8): String =
    s"""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       |  CAST(round(sum(l_extendedprice * (1.0 - l_discount)
       |    - $costFactor * p_retailprice * l_quantity) + 1e-4, 0)
       |    AS BIGINT) AS margin
       |FROM lineitem
       |JOIN part ON p_partkey = l_partkey
       |JOIN orders ON o_orderkey = l_orderkey
       |JOIN supplier ON s_suppkey = l_suppkey
       |JOIN nation ON n_nationkey = s_nationkey
       |WHERE p_name LIKE '%$nameToken%'
       |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  /** q133 — returned-item losses per customer (the TPC-H Q10 shape):
    * the top customers by revenue lost to returns in one quarter —
    * return flag and quarter push to the two scans, the nation dim
    * broadcasts, and the top-k is TakeOrderedAndProject over the
    * per-customer aggregate. */
  def q133ReturnedItems(lineitem: DataFrame, orders: DataFrame,
      customer: DataFrame, nation: DataFrame,
      from: String = "1996-10-01", topN: Int = 20): DataFrame = {
    val lo = to_timestamp(lit(from))
    orders
      .filter(col("o_orderdate") >= lo &&
        col("o_orderdate") < lo + expr("INTERVAL 3 MONTHS"))
      .join(lineitem.filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"),
            col("l_discount")),
        col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer.select(col("c_custkey"), col("c_name"),
          col("c_acctbal"), col("c_nationkey"))),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"),
        round(col("c_acctbal") + lit(1e-9), 2).as("c_acctbal"),
        col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        + lit(1e-9), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(topN)
  }
  def q133Sql(from: String = "1996-10-01", topN: Int = 20): String =
    s"""SELECT c_custkey, c_name, round(c_acctbal + 1e-9, 2) AS c_acctbal,
       |  n_name,
       |  round(sum(l_extendedprice * (1.0 - l_discount)) + 1e-9, 2)
       |    AS revenue
       |FROM orders
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN customer ON c_custkey = o_custkey
       |JOIN nation ON n_nationkey = c_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '$from'
       |  AND o_orderdate < TIMESTAMP '$from' + INTERVAL 3 MONTH
       |GROUP BY 1, 2, 3, 4
       |ORDER BY revenue DESC, c_custkey LIMIT $topN""".stripMargin

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q01_scan",
      (s: SparkSession, d: String) => q01Scan(Tables.lineitem(s, d)),
      Some(q01Sql)),
    ("q02_filter",
      (s: SparkSession, d: String) => q02Filter(Tables.lineitem(s, d)),
      Some(q02Sql)),
    ("q03_agg",
      (s: SparkSession, d: String) => q03Agg(Tables.lineitem(s, d)),
      Some(q03Sql)),
    ("q04_distinct_agg",
      (s: SparkSession, d: String) => q04Distinct(Tables.orders(s, d)),
      Some(q04Sql)),
    ("q05_join_broadcast",
      (s: SparkSession, d: String) => q05Join(Tables.orders(s, d), Tables.customer(s, d)),
      Some(q05Sql)),
    ("q06_join_multiway",
      (s: SparkSession, d: String) => q06MultiJoin(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d)),
      Some(q06Sql)),
    ("q07_left_outer",
      (s: SparkSession, d: String) => q07LeftOuter(Tables.customer(s, d), Tables.orders(s, d)),
      Some(q07LeftOuterSql)),
    ("q07_anti_join",
      (s: SparkSession, d: String) => q07Anti(Tables.customer(s, d), Tables.orders(s, d)),
      Some(q07AntiSql)),
    ("q07_full_outer",
      (s: SparkSession, d: String) => q07FullOuter(Tables.orders(s, d), Tables.events(s, d)),
      Some(q07FullOuterSql)),
    ("q08_semi_join",
      (s: SparkSession, d: String) => q08Semi(Tables.part(s, d), Tables.lineitem(s, d)),
      Some(q08Sql)),
    ("q09_range_join",
      (s: SparkSession, d: String) => q09RangeJoin(Tables.events(s, d)),
      Some(q09Sql)),
    ("q10_rollup",
      (s: SparkSession, d: String) => q10Rollup(Tables.orders(s, d)),
      Some(q10Sql)),
    ("q10_cube",
      (s: SparkSession, d: String) => q10Cube(Tables.orders(s, d)),
      Some(q10CubeSql)),
    ("q11_rank_window",
      (s: SparkSession, d: String) => q11RankWindow(Tables.orders(s, d)),
      Some(q11Sql)),
    ("q12_running_window",
      (s: SparkSession, d: String) => q12Running(Tables.orders(s, d)),
      Some(q12RunningSql)),
    ("q12_lag_lead",
      (s: SparkSession, d: String) => q12LagLead(Tables.events(s, d)),
      Some(q12LagLeadSql)),
    ("q13_topk",
      (s: SparkSession, d: String) => q13TopK(Tables.orders(s, d)),
      Some(q13Sql)),
    ("q14_setops",
      (s: SparkSession, d: String) => q14SetOps(Tables.orders(s, d), Tables.customer(s, d)),
      Some(q14Sql)),
    ("q15_string_math",
      (s: SparkSession, d: String) => q15StringMath(Tables.part(s, d)),
      Some(q15StringMathSql)),
    ("q15_date",
      (s: SparkSession, d: String) => q15Date(Tables.orders(s, d)),
      Some(q15DateSql)),
    ("q16_json_map",
      (s: SparkSession, d: String) => q16Json(Tables.events(s, d)),
      Some(q16JsonSql)),
    ("q16_array_hof",
      (s: SparkSession, d: String) => q16Array(Tables.embeddings(s, d)),
      Some(q16ArraySql)),
    ("q16_explode",
      (s: SparkSession, d: String) => q16Explode(Tables.embeddings(s, d)),
      Some(q16ExplodeSql)),
    ("q17_case_subquery",
      (s: SparkSession, d: String) => q17CaseSubquery(Tables.orders(s, d)),
      Some(q17Sql)),
    ("q18_approx_distinct",
      (s: SparkSession, d: String) => q18ApproxDistinct(Tables.lineitem(s, d)),
      Some(q18Sql)),
    ("q29_supplier_share",
      (s: SparkSession, d: String) => q29SupplierShare(Tables.lineitem(s, d), Tables.supplier(s, d), Tables.nation(s, d)),
      Some(q29Sql)),
    ("q107_waiting_supplier",
      (s: SparkSession, d: String) => q107WaitingSupplier(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.supplier(s, d)),
      Some(q107Sql())),
    ("q108_cust_order_dist",
      (s: SparkSession, d: String) => q108CustOrderDist(
        Tables.customer(s, d), Tables.orders(s, d)),
      Some(q108Sql)),
    ("q109_dormant_customers",
      (s: SparkSession, d: String) => q109DormantCustomers(
        Tables.customer(s, d), Tables.orders(s, d), Tables.nation(s, d)),
      Some(q109Sql())),
    ("q113_smalllot_revenue",
      (s: SparkSession, d: String) => q113SmallLotRevenue(
        Tables.lineitem(s, d), Tables.part(s, d)),
      Some(q113Sql())),
    ("q114_big_baskets",
      (s: SparkSession, d: String) => q114BigBaskets(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d)),
      Some(q114Sql())),
    ("q115_single_source",
      (s: SparkSession, d: String) => q115SingleSourceRisk(
        Tables.lineitem(s, d), Tables.supplier(s, d)),
      Some(q115Sql())),
    ("q116_cheapest_supplier",
      (s: SparkSession, d: String) => q116CheapestSupplier(
        Tables.lineitem(s, d), Tables.part(s, d), Tables.supplier(s, d)),
      Some(q116Sql())),
    ("q117_top_supplier",
      (s: SparkSession, d: String) => q117TopSupplier(
        Tables.lineitem(s, d), Tables.supplier(s, d)),
      Some(q117Sql())),
    ("q121_late_orders",
      (s: SparkSession, d: String) => q121LateOrders(
        Tables.orders(s, d), Tables.lineitem(s, d)),
      Some(q121Sql())),
    ("q122_priority_lines",
      (s: SparkSession, d: String) => q122PriorityLines(
        Tables.lineitem(s, d), Tables.orders(s, d)),
      Some(q122Sql())),
    ("q123_promo_revenue",
      (s: SparkSession, d: String) => q123PromoRevenue(
        Tables.lineitem(s, d), Tables.part(s, d)),
      Some(q123Sql())),
    ("q124_supplier_variety",
      (s: SparkSession, d: String) => q124SupplierVariety(
        Tables.lineitem(s, d), Tables.part(s, d), Tables.supplier(s, d)),
      Some(q124Sql())),
    ("q125_disjunctive_revenue",
      (s: SparkSession, d: String) => q125DisjunctiveRevenue(
        Tables.lineitem(s, d), Tables.part(s, d)),
      Some(q125Sql)),
    ("q127_shipping_priority",
      (s: SparkSession, d: String) => q127ShippingPriority(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d)),
      Some(q127Sql())),
    ("q128_local_supplier_volume",
      (s: SparkSession, d: String) => q128LocalSupplierVolume(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d)),
      Some(q128Sql())),
    ("q129_forecast_revenue",
      (s: SparkSession, d: String) => q129ForecastRevenue(
        Tables.lineitem(s, d)),
      Some(q129Sql())),
    ("q130_nation_volume",
      (s: SparkSession, d: String) => q130NationVolume(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.nation(s, d)),
      Some(q130Sql())),
    ("q131_market_share",
      (s: SparkSession, d: String) => q131MarketShare(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.supplier(s, d), Tables.nation(s, d), Tables.region(s, d),
        Tables.part(s, d)),
      Some(q131Sql())),
    ("q132_product_profit",
      (s: SparkSession, d: String) => q132ProductProfit(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.part(s, d)),
      Some(q132Sql())),
    ("q133_returned_items",
      (s: SparkSession, d: String) => q133ReturnedItems(
        Tables.lineitem(s, d), Tables.orders(s, d), Tables.customer(s, d),
        Tables.nation(s, d)),
      Some(q133Sql())))
}
