package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables

/** Event-time operators — SURVEY.md §2b Q19–Q22, batch-equivalence form.
  *
  * These are the batch twins of the Structured Streaming queries in
  * `graft.streaming`: Spark guarantees (and our StreamingSpec asserts) that
  * a windowed streaming aggregation over a replayed source converges to the
  * same result as the batch `window()` query, so the DuckDB-oracle gate
  * runs the batch form while the streaming form is exercised in tests with
  * MemoryStream + watermarks + checkpoint restarts.
  *
  * Window starts are emitted as epoch microseconds (`unix_micros`) — exact
  * integer compare, no float/rounding hazard. Both engines align tumbling
  * buckets on unix-epoch multiples (5 min divides the DuckDB time_bucket
  * origin 2000-01-01 offset too).
  *
  * Library surface: `DataFrame => DataFrame` over any frame with the
  * `events` shape (`ts, event_type, user_id, event_id, value` as each op
  * requires); the registry entries adapt the fixture table.
  */
object EventOps {
  type QFn = (SparkSession, String) => DataFrame

  /** q19 — tumbling window aggregate (streaming analog: groupBy(window(...))
    * with a 10-minute watermark; see graft.streaming.StreamQueries). */
  def tumbling(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_micros(col("window.start")).as("wstart"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("wstart", "event_type")
  val q19Sql: String =
    """SELECT epoch_us(time_bucket(INTERVAL 5 MINUTE, ts)) AS wstart,
      |  event_type, count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** q20a — sliding window (10 min length, 5 min slide): each event lands
    * in two windows. Oracle replicates the expansion with a UNION ALL. */
  def sliding(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("wstart"), col("event_type"), col("n"))
      .orderBy("wstart", "event_type")
  val q20SlidingSql: String =
    """WITH x AS (SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS b5, event_type
      |  FROM events),
      |w AS (SELECT b5 AS ws, event_type FROM x
      |  UNION ALL SELECT b5 - INTERVAL 5 MINUTE, event_type FROM x)
      |SELECT epoch_us(ws) AS wstart, event_type, count(*) AS n
      |FROM w GROUP BY 1, 2 ORDER BY wstart, event_type""".stripMargin

  /** q20b — session window (30-minute gap) per user. A new session starts
    * when the gap since the previous event is >= 30 min (Spark session
    * windows are half-open [ts, ts+gap)). Oracle: gaps-and-islands. */
  def session(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start"),
        col("n"), col("sum_value"))
      .orderBy("user_id", "session_start")
  val q20SessionSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, ts, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, ts, value,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x)
      |SELECT user_id, epoch_us(min(ts)) AS session_start,
      |  count(*) AS n, round(sum(value), 2) AS sum_value
      |FROM y GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  /** q21 — deterministic dedup: keep the earliest event per (user, minute)
    * key (streaming analog: dropDuplicatesWithinWatermark; see tests). */
  def dedupKeyed(events: DataFrame): DataFrame = {
    val keyed = events
      .withColumn("mn", window(col("ts"), "1 minute").getField("start"))
    val w = Window.partitionBy(col("user_id"), col("mn"))
      .orderBy(col("ts"), col("event_id"))
    keyed.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), unix_micros(col("mn")).as("minute"), col("event_id"))
      .orderBy("user_id", "minute")
  }
  val q21Sql: String =
    """SELECT user_id, epoch_us(mn) AS minute, event_id FROM (
      |  SELECT user_id, event_id, time_bucket(INTERVAL 1 MINUTE, ts) AS mn,
      |    row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL 1 MINUTE, ts)
      |      ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id, minute""".stripMargin

  /** q22 — per-user running totals via the *typed* API
    * (groupByKey.mapGroups), the batch twin of the streaming
    * mapGroupsWithState consumer-progress analog (SURVEY R4/R6). */
  def statefulTotals(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("value"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroups { (uid, it) =>
        var n = 0L
        var total = 0.0
        it.foreach { case (_, v) => n += 1; total += v }
        (uid, n, total)
      }
      .toDF("user_id", "n_events", "total_raw")
      .select(col("user_id"), col("n_events"), round(col("total_raw"), 2).as("total"))
      .orderBy("user_id")
  }
  val q22Sql: String =
    """SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  private def onEvents(f: DataFrame => DataFrame): QFn =
    (s, d) => f(Tables.events(s, d))

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q19_tumbling_window", onEvents(tumbling), Some(q19Sql)),
    ("q20_sliding_window", onEvents(sliding), Some(q20SlidingSql)),
    ("q20_session_window", onEvents(session), Some(q20SessionSql)),
    ("q21_dedup_keyed", onEvents(dedupKeyed), Some(q21Sql)),
    ("q22_stateful_totals", onEvents(statefulTotals), Some(q22Sql)))
}
