package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables

/** User-journey analytics over event streams: funnel conversion and
  * event-time interval joins. These are the batch twins of classic
  * clickstream questions ("of the users who viewed, how many clicked, then
  * purchased?"), shaped for scale:
  *
  *  - The funnel is ONE shuffle on `user_id`: the three stage timestamps
  *    are running-window minima over the same (user, ts) sort, so Catalyst
  *    plans a single Exchange+Sort reused by all three Window projections,
  *    and the per-user reduction that follows reuses the same hash
  *    partitioning (no second exchange). No self-joins, no per-stage
  *    passes over the fact table.
  *  - The interval join is an equi-join on the user key with the time
  *    bound as a join residual — NOT a range cross-product. Work is
  *    bounded by per-user event density, and the same plan is what
  *    Structured Streaming executes incrementally in
  *    [[graft.streaming.StreamQueries.clickPurchaseJoin]] with watermarks
  *    evicting state (StreamingSpec asserts batch/stream equivalence).
  *
  * Library surface: `DataFrame => DataFrame` over any frame with the
  * `events` shape; registry entries adapt the fixture table.
  */
object JourneyOps {
  type QFn = (SparkSession, String) => DataFrame

  /** q30a — three-stage funnel (view → click → purchase) per user.
    *
    * Stage semantics: a click qualifies only if strictly after the user's
    * first view; a purchase only if strictly after the first qualifying
    * click. Running minima over an event-time sort give each row the
    * stage state "so far", so a single pass decides qualification without
    * joining the table to itself once per stage.
    *
    * Output is one row of exact integers (stage user-counts + summed
    * view→purchase latency in microseconds) — no float division, so the
    * DuckDB oracle hash-matches bit-for-bit. */
  /** Per-user funnel stage timestamps (tv, tc, tp — null until the user
    * reaches the stage). Exposed separately from [[funnel]] because it is
    * also the batch oracle for the streaming funnel processor
    * ([[graft.streaming.StreamQueries.funnelStages]]). */
  def funnelStages(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("t_click",
        min(when(col("event_type") === "click" && col("ts") > col("t_view"),
          col("ts"))).over(w))
      .withColumn("t_purchase",
        min(when(col("event_type") === "purchase" && col("ts") > col("t_click"),
          col("ts"))).over(w))
      .groupBy(col("user_id"))
      .agg(min(col("t_view")).as("tv"), min(col("t_click")).as("tc"),
        min(col("t_purchase")).as("tp"))
  }

  def funnel(events: DataFrame): DataFrame =
    funnelStages(events)
      .agg(
        count(col("tv")).as("users_viewed"),
        count(col("tc")).as("users_clicked"),
        count(col("tp")).as("users_converted"),
        sum(when(col("tp").isNotNull,
          unix_micros(col("tp")) - unix_micros(col("tv"))))
          .as("sum_convert_us"))

  val q30FunnelSql: String =
    """WITH s1 AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    min(CASE WHEN event_type = 'view' THEN ts END) OVER w AS t_view
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s2 AS (
      |  SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view
      |    THEN ts END) OVER w AS t_click
      |  FROM s1
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |s3 AS (
      |  SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click
      |    THEN ts END) OVER w AS t_purchase
      |  FROM s2
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |u AS (
      |  SELECT user_id, min(t_view) AS tv, min(t_click) AS tc,
      |    min(t_purchase) AS tp
      |  FROM s3 GROUP BY user_id)
      |SELECT count(tv) AS users_viewed, count(tc) AS users_clicked,
      |  count(tp) AS users_converted,
      |  CAST(sum(CASE WHEN tp IS NOT NULL
      |    THEN epoch_us(tp) - epoch_us(tv) END) AS BIGINT) AS sum_convert_us
      |FROM u""".stripMargin

  /** q30b — event-time interval join: each click paired with the same
    * user's purchases in the following 30 minutes. Exactly the semantics
    * of the streaming stream–stream join twin
    * ([[graft.streaming.StreamQueries.clickPurchaseJoin]]); here as a
    * batch equi-join on `user_id` whose range condition rides along as a
    * join residual — per-user work, never a cross product. */
  def clickPurchaseAttribution(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount"))
    clicks.join(purchases,
      col("user_id") === col("p_user")
        && col("purchase_ts") >= col("click_ts")
        && col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("user_id"), col("click_id"), col("purchase_id"),
        unix_micros(col("click_ts")).as("click_us"),
        unix_micros(col("purchase_ts")).as("purchase_us"),
        round(col("amount"), 2).as("amount"))
      .orderBy("click_id", "purchase_id")
  }
  val q30IntervalJoinSql: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
      |  round(p.value, 2) AS amount
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  private def onEvents(f: DataFrame => DataFrame): QFn =
    (s, d) => f(Tables.events(s, d))

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q30_funnel", onEvents(funnel), Some(q30FunnelSql)),
    ("q30_interval_join", onEvents(clickPurchaseAttribution),
      Some(q30IntervalJoinSql)))
}
