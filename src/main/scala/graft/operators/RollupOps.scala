package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Incremental aggregate maintenance — the materialized-rollup merge a
  * 100 TB deployment runs instead of rescanning history: the stored
  * rollup carries only MERGEABLE states (count/sum/min/max), a new batch
  * folds in with one metadata-scale aggregate over (stored ⊎ delta), and
  * exact distinct-user counts ride a separate presence table (distinct
  * is not mergeable from scalars; the two-table design is the standard
  * production answer — the presence table unions by key, the read path
  * derives the count). The reference delegates all per-record analytics
  * to consumer callbacks (reference src/Kinesis/Kinesis.hs:42-176); this
  * is the accumulate-don't-rescan shape those consumers converge on.
  *
  * Scale shape: the fact table is touched ONCE per batch (its own
  * rollup); every merge is an aggregate over two rollup-sized tables —
  * |days|·|types| rows — and the presence table is bounded by
  * |days|·|types|·|users-active-that-day|, itself the q65 HLL swap when
  * exactness stops paying. No state ever re-reads history.
  */
object RollupOps {

  /** One batch's mergeable daily rollup: (day, event_type) → count, sum,
    * min, max over `value`. */
  def dailyRollup(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Fold a delta rollup into a stored rollup: every column merges by
    * its own monoid (count/sum add, min/max keep the extremes). The
    * result is exactly `dailyRollup(historyᵤ∪ᵤbatch)` — the property the
    * registry oracle checks cross-engine and Round13OpsSpec pins. */
  def mergeRollups(stored: DataFrame, delta: DataFrame): DataFrame =
    mergeAll(stored.unionByName(delta))

  /** N-way merge: the same per-column monoids over any number of
    * stacked rollups (the streaming twin's merge-on-read path). */
  def mergeAll(rollups: DataFrame): DataFrame =
    rollups
      .groupBy(col("day"), col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** The distinct-user sidecar: mergeable by construction (union +
    * distinct on the full key). */
  def userPresence(events: DataFrame): DataFrame =
    events.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("user_id"))
      .distinct()

  def mergePresence(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(delta).distinct()

  /** The q65 swap point the exact sidecar documents, exercised in code:
    * when per-(day, type) active-user sets stop fitting (the 100 TB
    * regime), the presence table becomes one FIXED-SIZE DataSketches
    * HLL row per (day, type) — state bounded by |days|·|types|·2^lgK
    * bytes regardless of user cardinality, mergeable by
    * `hll_union_agg` under the same monoid discipline as the scalar
    * columns (union of sketches ≡ sketch of union, so incremental
    * maintenance stays exact-in-sketch: no re-read of history, and a
    * batch split changes nothing — Round14OpsSpec pins both bounds). */
  def approxPresence(events: DataFrame, lgK: Int = 12): DataFrame =
    events.filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(hll_sketch_agg(col("user_id"), lit(lgK)).as("user_sk"))

  /** N-way sketch merge: same shape as [[mergeAll]], one row per key. */
  def mergeApproxPresence(rollups: DataFrame): DataFrame =
    rollups.groupBy(col("day"), col("event_type"))
      .agg(hll_union_agg(col("user_sk")).as("user_sk"))

  /** Read path of the approximate sidecar: estimated distinct users. */
  def approxUsers(presence: DataFrame): DataFrame =
    presence.select(col("day"), col("event_type"),
      hll_sketch_estimate(col("user_sk")).as("n_users_est"))

  /** Read path: rollup + presence → the report a dashboard reads. */
  def rollupReport(rollup: DataFrame, presence: DataFrame): DataFrame =
    rollup.join(
        presence.groupBy(col("day"), col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users")),
        Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"), col("n_events"),
        round(col("sum_value") + lit(1e-9), 2).as("sum_value"),
        round(col("min_value") + lit(1e-9), 4).as("min_value"),
        round(col("max_value") + lit(1e-9), 4).as("max_value"),
        coalesce(col("n_users"), lit(0L)).as("n_users"))
      .orderBy("day", "event_type")

  /** q118 registry entry: history/batch split by event_id residue, each
    * side rolled up independently, merged, reported — the oracle
    * computes the SAME report from the unsplit table, so the green row
    * IS the incremental-≡-full proof, cross-engine. */
  def q118RollupMerge(events: DataFrame): DataFrame = {
    // Null event_ids route explicitly to the batch side: a bare
    // pmod(...) =!= 0 / === 0 pair evaluates null in BOTH filters and
    // silently drops such rows from the split while the oracle (which
    // never splits) keeps them.
    val residue = coalesce(pmod(col("event_id"), lit(5)), lit(0))
    val history = events.filter(residue =!= 0)
    val batch = events.filter(residue === 0)
    rollupReport(
      mergeRollups(dailyRollup(history), dailyRollup(batch)),
      mergePresence(userPresence(history), userPresence(batch)))
  }
  val q118Sql: String =
    """SELECT CAST(ts AS DATE) AS day, event_type,
      |  count(*) AS n_events,
      |  round(sum(value) + 1e-9, 2) AS sum_value,
      |  round(min(value) + 1e-9, 4) AS min_value,
      |  round(max(value) + 1e-9, 4) AS max_value,
      |  CAST(count(DISTINCT CASE WHEN user_id IS NOT NULL THEN user_id END)
      |    AS BIGINT) AS n_users
      |FROM events WHERE ts IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q118_rollup_merge",
      (s: SparkSession, d: String) => q118RollupMerge(Tables.events(s, d)),
      Some(q118Sql)))
}
