package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** CDC / changelog materialization — SURVEY.md §2b Q36.
  *
  * The canonical consumer of a Kinesis-style record stream (the exact
  * Processor the reference leaves user-supplied, reference
  * src/Kinesis/Coordination.hs:53): a keyed change feed of
  * upserts/deletes (Debezium / DynamoDB-streams shape) materialized into
  * current state — latest change per key wins, a winning delete is a
  * tombstone that removes the key.
  *
  * Plan shape: ONE shuffle on the key, a per-key top-1 window, a filter.
  * At 100 TB the change feed shuffles once by key; no join against the
  * previous snapshot is needed because the feed itself carries the state
  * (contrast MERGE/upsert in CorpusOps, which patches an EXISTING corpus
  * with a batch — that is the incremental form; this is the replay form
  * that builds state from the log alone).
  */
object CdcOps {

  /** Generic changelog apply: for each key keep the first change row under
    * `orderCols` (pass descending timestamp + a unique tiebreak for
    * latest-wins determinism), then drop keys whose winning change is a
    * `deleteOp` tombstone. All payload columns ride through. A winning
    * row with a NULL op is kept (it is an unknown op, not a tombstone —
    * a bare `=!=` would silently drop it via three-valued logic). */
  def cdcLatest(changes: DataFrame, keyCols: Seq[String],
      orderCols: Seq[Column], opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    changes
      .withColumn("_cdc_rn", row_number().over(w))
      .filter(col("_cdc_rn") === 1)
      .drop("_cdc_rn")
      .filter(!(col(opCol) <=> deleteOp))
  }

  /** q36 registry entry: the events feed read as a user-state changelog —
    * `error` events are tombstones, everything else upserts the user's
    * (event_type, value) payload; latest (ts, event_id) wins. Output: the
    * surviving users' current state. */
  def userStateCdc(events: DataFrame): DataFrame =
    cdcLatest(
      events.withColumn("op",
        when(col("event_type") === "error", "delete").otherwise("upsert")),
      keyCols = Seq("user_id"),
      orderCols = Seq(col("ts").desc, col("event_id").desc),
      opCol = "op")
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("event_type"), round(col("value"), 4).as("value"))
      .orderBy("user_id")

  /** Generic SCD Type-2 history build (Kimball's slowly-changing-dimension
    * type 2, public warehouse canon): every change row becomes a version
    * with a validity interval `[valid_from, valid_to)` — `valid_from` its
    * own timestamp, `valid_to` the NEXT change's timestamp for the same key
    * (any op, so a tombstone closes the last version), NULL while current.
    * Delete rows close intervals but emit no version themselves.
    *
    * Plan shape: the same ONE shuffle on the key as [[cdcLatest]], with a
    * `lead` frame instead of top-1 — per-key windows scale with the key
    * cardinality, never a global sort. This is the replay form: state
    * history from the log alone, no snapshot join. */
  def scd2History(changes: DataFrame, keyCols: Seq[String],
      tsCol: String, tieCol: String, opCol: String,
      deleteOp: String = "delete"): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col(tieCol).asc)
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) =!= deleteOp)
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** q38 registry entry: the events feed as an SCD2 user-state history
    * (`error` = tombstone, as in q36). Intervals emitted as epoch micros
    * (exact integer compare, the EventOps idiom); thinned to every 5th
    * user for the checked dump. */
  def userStateScd2(events: DataFrame): DataFrame =
    scd2History(
      events.withColumn("op",
        when(col("event_type") === "error", "delete").otherwise("upsert")),
      keyCols = Seq("user_id"), tsCol = "ts", tieCol = "event_id",
      opCol = "op")
      .filter(col("user_id") % 5 === 0)
      .select(col("user_id"), col("event_id"), col("event_type"),
        round(col("value"), 4).as("value"),
        unix_micros(col("valid_from")).as("valid_from"),
        unix_micros(col("valid_to")).as("valid_to"),
        col("is_current"))
      .orderBy("user_id", "valid_from", "event_id")

  val q38Scd2Sql: String =
    """SELECT user_id, event_id, event_type, round(value, 4) AS value,
      |  epoch_us(ts) AS valid_from, epoch_us(valid_to) AS valid_to,
      |  CAST(valid_to IS NULL AS INTEGER) AS is_current
      |FROM (
      |  SELECT user_id, event_id, event_type, value, ts,
      |    lead(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS valid_to,
      |    CASE WHEN event_type = 'error' THEN 'delete'
      |         ELSE 'upsert' END AS op
      |  FROM events) t
      |WHERE op <> 'delete' AND user_id % 5 = 0
      |ORDER BY user_id, valid_from, event_id""".stripMargin

  val q36CdcSql: String =
    """SELECT user_id, last_event_id, event_type, value FROM (
      |  SELECT user_id, event_id AS last_event_id, event_type,
      |    round(value, 4) AS value,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS rn,
      |    CASE WHEN event_type = 'error' THEN 'delete'
      |         ELSE 'upsert' END AS op
      |  FROM events) t
      |WHERE rn = 1 AND op <> 'delete' ORDER BY user_id""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q36_cdc_apply",
      (s: SparkSession, d: String) => userStateCdc(Tables.events(s, d)),
      Some(q36CdcSql)),
    ("q38_scd2_history",
      (s: SparkSession, d: String) => userStateScd2(Tables.events(s, d)),
      Some(q38Scd2Sql)))
}
