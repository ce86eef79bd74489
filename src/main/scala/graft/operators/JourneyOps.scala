package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  /** Generic N-step sequence match (the funnel generalized — what
    * ClickHouse exposes as `sequenceMatch` and SQL:2016 as
    * MATCH_RECOGNIZE's simplest pattern): per key, the timestamp at which
    * each step first completes, where step i counts only strictly after
    * step i−1's completion. `steps` maps output column name → row
    * predicate.
    *
    * One shuffle on the key: every step is a running `min` over the same
    * (key) × (ts, tiebreak) window, so Catalyst plans a single
    * Exchange+Sort reused by all N Window projections, and the final
    * per-key reduction reuses the same hash partitioning. Adding steps
    * adds Window operators (a linear scan each), never another shuffle
    * or self-join — at 100 TB an N-way self-join formulation would pay N
    * shuffles of the fact table. */
  def sequenceStages(events: DataFrame, keyCol: String, tsCol: String,
      tiebreakCol: String, steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "sequenceStages needs at least one step")
    val dupes = steps.map(_._1).diff(steps.map(_._1).distinct)
    require(dupes.isEmpty, s"duplicate step names: ${dupes.distinct.mkString(", ")}")
    steps.foreach { case (name, _) =>
      // a step name matching ANY input column would be silently clobbered
      // by withColumn — and read back by the next step's `prev` reference
      require(!events.columns.contains(name),
        s"step column '$name' collides with an input column") }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col(tiebreakCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val staged = steps.zipWithIndex.foldLeft(events) {
      case (df, ((name, pred), 0)) =>
        df.withColumn(name, min(when(pred, col(tsCol))).over(w))
      case (df, ((name, pred), i)) =>
        val prev = col(steps(i - 1)._1)
        df.withColumn(name,
          min(when(pred && col(tsCol) > prev, col(tsCol))).over(w))
    }
    staged
      .groupBy(col(keyCol))
      .agg(min(col(steps.head._1)).as(steps.head._1),
        steps.tail.map { case (n, _) => min(col(n)).as(n) }: _*)
  }

  /** Per-user funnel stage timestamps (tv, tc, tp — null until the user
    * reaches the stage): [[sequenceStages]] over view → click → purchase.
    * Exposed separately from [[funnel]] because it is also the batch
    * oracle for the streaming funnel processor
    * ([[graft.streaming.StreamQueries.funnelStages]]). */
  def funnelStages(events: DataFrame): DataFrame =
    sequenceStages(
      events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type")),
      "user_id", "ts", "event_id",
      Seq(
        "tv" -> (col("event_type") === "view"),
        "tc" -> (col("event_type") === "click"),
        "tp" -> (col("event_type") === "purchase")))

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
  /** Shared halves of the click→purchase attribution — ONE definition of
    * the projections, the interval condition, and the output shape, used
    * by both this batch form and the watermarked stream–stream join
    * ([[graft.streaming.StreamQueries.clickPurchaseJoin]]), so the two
    * twins cannot drift apart; their equivalence is asserted in
    * StreamingSpec. */
  private[graft] def attributionClicks(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
  private[graft] def attributionPurchases(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value").as("amount"))
  private[graft] val attributionCond: Column =
    col("user_id") === col("p_user") &&
      col("purchase_ts") >= col("click_ts") &&
      col("purchase_ts") <= col("click_ts") + expr("INTERVAL 30 MINUTES")
  private[graft] def attributionOutput(joined: DataFrame): DataFrame =
    joined.select(col("user_id"), col("click_id"), col("purchase_id"),
      unix_micros(col("click_ts")).as("click_us"),
      unix_micros(col("purchase_ts")).as("purchase_us"),
      round(col("amount"), 2).as("amount"))

  def clickPurchaseAttribution(events: DataFrame): DataFrame =
    attributionOutput(
      attributionClicks(events).join(attributionPurchases(events),
        attributionCond))
      .orderBy("click_id", "purchase_id")
  val q30IntervalJoinSql: String =
    """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
      |  epoch_us(c.ts) AS click_us, epoch_us(p.ts) AS purchase_us,
      |  round(p.value, 2) AS amount
      |FROM events c JOIN events p
      |  ON c.user_id = p.user_id
      |  AND c.event_type = 'click' AND p.event_type = 'purchase'
      |  AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
      |ORDER BY click_id, purchase_id""".stripMargin

  /** q57 — weekly cohort retention, the canonical growth-analytics matrix:
    * users are cohorted by the week of their first event; cell
    * (cohort_week, week_offset) counts the cohort's distinct users active
    * that week, with the retention fraction against the cohort's size
    * (= its week-0 activity, since every user is active in their own
    * first week).
    *
    * Scale shape: raw events collapse map-side (partial agg) into the
    * DISTINCT (user, week) activity set — the first exchange carries
    * activity pairs, not events; cohort assignment is a min WINDOW over
    * the user partition of that set (second exchange — a window, not a
    * groupBy + self-join, which would pay a third); the cell aggregation
    * then reduces |users × active weeks| pairs to |cells|. The
    * cohort-size window runs over the cells frame — metadata scale. No
    * self-join of raw events anywhere. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val weeks = events.select(col("user_id"),
      date_trunc("week", col("ts")).cast("date").as("week")).distinct()
    val withCohort = weeks.withColumn("cohort_week",
      min(col("week")).over(Window.partitionBy(col("user_id"))))
    val cells = withCohort
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int")
          .as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
    val w = Window.partitionBy(col("cohort_week"))
    cells
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(w))
      .withColumn("retention",
        round(col("n_active") / col("cohort_size"), 4))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"), col("retention"))
      .orderBy("cohort_week", "week_offset")
  }
  val q57CohortSql: String =
    """WITH wk AS (SELECT DISTINCT user_id,
      |    date_trunc('week', ts) AS week FROM events),
      |co AS (SELECT user_id, min(week) AS cohort_week FROM wk
      |  GROUP BY user_id),
      |cells AS (SELECT cohort_week,
      |    CAST(date_diff('day', cohort_week, week) // 7 AS INT)
      |      AS week_offset,
      |    count(DISTINCT w.user_id) AS n_active
      |  FROM wk w JOIN co USING (user_id) GROUP BY 1, 2)
      |SELECT cohort_week, week_offset, n_active,
      |  max(CASE WHEN week_offset = 0 THEN n_active END)
      |    OVER (PARTITION BY cohort_week) AS cohort_size,
      |  round(CAST(n_active AS DOUBLE)
      |    / max(CASE WHEN week_offset = 0 THEN n_active END)
      |      OVER (PARTITION BY cohort_week), 4) AS retention
      |FROM cells ORDER BY cohort_week, week_offset""".stripMargin

  /** q61 — first-order Markov transition matrix over per-user event
    * sequences: P(next event type | current event type), the model behind
    * next-action prediction, broken-flow detection (a transition whose
    * probability collapses between releases), and journey simulation.
    * Each user's events are ordered by (ts, event_id) — the id tiebreak
    * makes simultaneous events, and therefore the matrix, deterministic.
    * Terminal events (a user's last) have no successor and contribute no
    * transition, the standard open-sequence convention.
    *
    * Scale shape: ONE fact shuffle on user_id serves the lead window
    * (the q30/q38 posture); the transition counts then collapse to a
    * |types|² frame — metadata scale — where the per-source normalizing
    * window runs. */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val trans = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("src"), col("next_type").as("dst"))
      .agg(count(lit(1)).as("n"))
    val srcW = Window.partitionBy(col("src"))
    trans
      .withColumn("p", round(
        col("n") / sum(col("n")).over(srcW) + lit(1e-9), 4))
      .select(col("src"), col("dst"), col("n"), col("p"))
      .orderBy("src", "dst")
  }
  val q61MarkovSql: String =
    """WITH s AS (SELECT event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |t AS (SELECT event_type AS src, next_type AS dst, count(*) AS n
      |  FROM s WHERE next_type IS NOT NULL GROUP BY 1, 2)
      |SELECT src, dst, n,
      |  round(n / CAST(sum(n) OVER (PARTITION BY src) AS DOUBLE)
      |    + 1e-9, 4) AS p
      |FROM t ORDER BY src, dst""".stripMargin

  /** q68 — RFM segmentation (Hughes '94, the retention-marketing
    * canon): per-user Recency (days since last event, vs the corpus max
    * date riding in-plan as a broadcast scalar — no driver action),
    * Frequency (event count) and Monetary (summed value), each cut into
    * quintiles, rolled up to per-segment population and means. Quintile 1
    * is best on every axis (most recent / most frequent / highest value),
    * so segment (1,1,1) is the champion cell and (5,5,5) the churned one.
    *
    * Scale shape: one fact shuffle to per-user metrics; then ALL THREE
    * quintiles in ONE grouped [[GlobalWindows.withGlobalNtile]] pass —
    * the metrics unpivot to (user, metric, sortval) and the grouped
    * global window range-partitions on (metric, sortval, user), so a
    * single shuffle of 3·|users| narrow rows replaces three full passes
    * (and never an Exchange SinglePartition — with 10⁹ users a
    * PARTITION BY metric window would sort three 10⁹-row reducers).
    * Descending axes negate into the ascending sort. Monetary is rounded
    * to 4 dp BEFORE ranking so the quintile cut is invariant to
    * summation-order ulps; all ties break by user_id. The labels pivot
    * back on the user_id partitioning the metrics table already has. The
    * rollup output is ≤ 125 cells — metadata. */
  def rfmSegments(events: DataFrame, buckets: Int = 5): DataFrame = {
    // cached: the reference-day broadcast would otherwise re-scan the
    // fact table (max over per-user maxima ≡ the corpus max); its
    // build materializes the cache, the metric arm reads it warm —
    // one fact pass total, no cold-cache race (single broadcast)
    val byUser = graft.core.CacheOnce.swap("rfm-byuser",
      events.groupBy(col("user_id"))
        .agg(max(to_date(col("ts"))).as("_last_day"),
          count(lit(1)).as("freq"),
          round(sum(col("value")) + lit(1e-9), 4).as("monetary")))
    val ref = byUser.agg(max(col("_last_day")).as("_ref_day"))
    val m = byUser.crossJoin(broadcast(ref))
      .withColumn("recency_days",
        datediff(col("_ref_day"), col("_last_day")).cast("int"))
      .drop("_last_day", "_ref_day")
    // recency ranks ascending; freq/monetary descending → negate so one
    // ascending grouped pass cuts all three
    val un = m.select(col("user_id"), expr(
      "stack(3, 'r', CAST(recency_days AS DOUBLE)," +
        " 'f', CAST(-freq AS DOUBLE), 'm', -monetary) AS (metric, sortval)"))
    val cut = GlobalWindows.withGlobalNtile(un,
      Seq("sortval" -> true, "user_id" -> true), buckets, "q",
      groups = Seq("metric"))
    val labels = cut.groupBy(col("user_id"))
      .agg(max(when(col("metric") === "r", col("q"))).as("r_q"),
        max(when(col("metric") === "f", col("q"))).as("f_q"),
        max(when(col("metric") === "m", col("q"))).as("m_q"))
    m.join(labels, "user_id")
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"),
        round(avg(col("recency_days")) + lit(1e-9), 4).as("avg_recency"),
        round(avg(col("freq")) + lit(1e-9), 4).as("avg_freq"),
        round(avg(col("monetary")) + lit(1e-9), 4).as("avg_monetary"))
      // ≤ buckets³ output rows: sort on one partition, skipping the
      // RangePartitioning sample job (the q128 lesson)
      .coalesce(1).sortWithinPartitions("r_q", "f_q", "m_q")
  }
  val q68RfmSql: String =
    """WITH u AS (SELECT user_id, max(CAST(ts AS DATE)) AS last_day,
      |    count(*) AS freq, round(sum(value) + 1e-9, 4) AS monetary
      |  FROM events GROUP BY 1),
      |r AS (SELECT user_id, freq, monetary,
      |    CAST(date_diff('day', last_day,
      |      (SELECT max(CAST(ts AS DATE)) FROM events)) AS INT)
      |      AS recency_days FROM u),
      |q AS (SELECT recency_days, freq, monetary,
      |    ntile(5) OVER (ORDER BY recency_days, user_id) AS r_q,
      |    ntile(5) OVER (ORDER BY freq DESC, user_id) AS f_q,
      |    ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_q
      |  FROM r)
      |SELECT r_q, f_q, m_q, count(*) AS n_users,
      |  round(avg(recency_days) + 1e-9, 4) AS avg_recency,
      |  round(avg(freq) + 1e-9, 4) AS avg_freq,
      |  round(avg(monetary) + 1e-9, 4) AS avg_monetary
      |FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** q76 — market-basket association rules over event sessions (Agrawal
    * & Srikant VLDB'94 shape, at pair order): for every unordered pair
    * of event types, the session support, the a→b confidence, and the
    * lift, over 30-minute-gap sessions (the q20b session contract).
    *
    * Scale shape: ONE fact shuffle on user_id — the lag/running-sum
    * sessionization windows and the (user, session) type-set aggregate
    * all reuse the same Exchange+Sort. Per-session type sets collapse to
    * a 64-bit [[graft.core.BitDim]] OR mask (codegen'd bit_or, never
    * collect_set), and every pairwise count then comes from the distinct
    * mask HISTOGRAM — ≤ 2^|types| metadata rows — so the itemset pair
    * space never touches the fact table. An Apriori pass at higher order
    * would iterate on the same histogram.
    *
    * Precondition: ≤ 63 distinct event types. [[graft.core.BitDim]]
    * raise_errors loudly past that (never silent shift wraparound);
    * a wider dimension switches to the sharded family
    * ([[graft.core.BitDim.shardedDim]]/`shardedMasks`/`hasBitIn`, same
    * histogram discipline over array-of-masks state, property-tested at
    * 100 values in Round13OpsSpec). */
  /** Gap sessionization (the q20b contract: a session breaks when the
    * gap since the previous event is ≥ `gapMinutes`): appends `sid`, a
    * per-user session sequence number. ONE shuffle on user_id; the lag
    * and running-sum windows share the Exchange+Sort, and any
    * groupBy(user_id, sid) downstream reuses the partitioning. */
  def sessionized(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      // a null event time cannot be placed in any session — and Spark
      // sorts nulls FIRST where the SQL oracles sort them LAST, so
      // letting them through would silently shift every sid. A null
      // user_id drops too: the window would fuse every anonymous event
      // into one pseudo-user's sessions, and count_distinct-style
      // denominators (which skip NULL tuples) would silently disagree
      // with groupBy numerators (which keep them) — the r11 ADVICE
      // latent-inconsistency finding
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("_brk", (coalesce(unix_micros(col("ts"))
        - unix_micros(lag(col("ts"), 1).over(w)), lit(gapUs)) >= gapUs)
        .cast("long"))
      .withColumn("sid", sum(col("_brk")).over(w))
      .drop("_brk")
  }

  def basketRules(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import graft.core.BitDim
    val sess = sessionized(events, gapMinutes)
    val typeDim = BitDim.dim(events, "event_type")
    val bySess = sess.join(typeDim, "event_type")
      .groupBy(col("user_id"), col("sid"))
      .agg(bit_or(col("bit")).as("mask"))
    val masks = bySess.groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
    // session denominator from sess, NOT the mask table: a session whose
    // every event has a null type carries no mask row, but it is still a
    // session (and the SQL twin counts it)
    val total = sess.agg(
      count_distinct(col("user_id"), col("sid")).as("n_sessions"))
    val sizes = masks.join(typeDim, BitDim.hasBit(col("mask"), col("bit")))
      .groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
    val pairDim = BitDim.pairs(typeDim, "event_type", "type_a", "type_b")
    val inter = masks.join(pairDim,
        BitDim.hasBit(col("mask"), col("bit_a"))
          && BitDim.hasBit(col("mask"), col("bit_b")))
      .groupBy(col("type_a"), col("type_b")).agg(sum(col("cnt")).as("n_ab"))
    inter
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_sessions"),
        round(col("n_ab") / col("n_sessions") + lit(1e-9), 4).as("support"),
        round(col("n_ab") / col("n_a") + lit(1e-9), 4).as("confidence"),
        round(col("n_ab") * col("n_sessions") / (col("n_a") * col("n_b"))
          + lit(1e-9), 4).as("lift"))
      .orderBy("type_a", "type_b")
  }
  val q76BasketSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x),
      |s AS (SELECT DISTINCT user_id, sid, event_type FROM y),
      |t AS (SELECT count(*) AS n_sessions
      |  FROM (SELECT DISTINCT user_id, sid FROM s)),
      |sz AS (SELECT event_type, count(*) AS n FROM s GROUP BY 1),
      |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    count(*) AS n_ab
      |  FROM s a JOIN s b ON a.user_id = b.user_id AND a.sid = b.sid
      |    AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, CAST(za.n AS BIGINT) AS n_a,
      |  CAST(zb.n AS BIGINT) AS n_b, CAST(n_ab AS BIGINT) AS n_ab,
      |  CAST(t.n_sessions AS BIGINT) AS n_sessions,
      |  round(n_ab / t.n_sessions + 1e-9, 4) AS support,
      |  round(n_ab / za.n + 1e-9, 4) AS confidence,
      |  round(n_ab * t.n_sessions / (za.n * zb.n) + 1e-9, 4) AS lift
      |FROM i JOIN sz za ON za.event_type = i.type_a
      |JOIN sz zb ON zb.event_type = i.type_b, t
      |ORDER BY type_a, type_b""".stripMargin

  /** q85 — order-3 itemsets (the Apriori step up from [[basketRules]],
    * demonstrating the claim that higher orders ITERATE ON THE SAME
    * HISTOGRAM): for every unordered triple of event types, the number
    * of sessions containing all three and its support. No new pass over
    * the fact table — the sessionize + set-mask aggregate is identical
    * to q76's, and the C(|types|,3) triple dimension joins the SAME
    * distinct-mask histogram. At any corpus size the marginal cost of
    * order k over order k−1 is the dimension cross-join growth only.
    * Same ≤ 63-distinct-types precondition as [[basketRules]]. */
  def basketTriples(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import graft.core.BitDim
    val sess = sessionized(events, gapMinutes)
    val typeDim = BitDim.dim(events, "event_type")
    val bySess = sess.join(typeDim, "event_type")
      .groupBy(col("user_id"), col("sid"))
      .agg(bit_or(col("bit")).as("mask"))
    val masks = bySess.groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
    val total = sess.agg(
      count_distinct(col("user_id"), col("sid")).as("n_sessions"))
    val tripleDim = broadcast(
      typeDim.select(col("event_type").as("type_a"), col("bit").as("bit_a"))
        .crossJoin(typeDim.select(col("event_type").as("type_b"),
          col("bit").as("bit_b")))
        .crossJoin(typeDim.select(col("event_type").as("type_c"),
          col("bit").as("bit_c")))
        .filter(col("type_a") < col("type_b")
          && col("type_b") < col("type_c")))
    masks.join(tripleDim,
        BitDim.hasBit(col("mask"), col("bit_a"))
          && BitDim.hasBit(col("mask"), col("bit_b"))
          && BitDim.hasBit(col("mask"), col("bit_c")))
      .groupBy(col("type_a"), col("type_b"), col("type_c"))
      .agg(sum(col("cnt")).as("n_abc"))
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("type_c"), col("n_abc"),
        col("n_sessions"),
        round(col("n_abc") / col("n_sessions") + lit(1e-9), 4).as("support"))
      .orderBy("type_a", "type_b", "type_c")
  }
  val q85TriplesSql: String =
    """WITH x AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, event_type,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x),
      |s AS MATERIALIZED (SELECT DISTINCT user_id, sid, event_type FROM y),
      |t AS (SELECT count(*) AS n_sessions
      |  FROM (SELECT DISTINCT user_id, sid FROM s)),
      |i AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    c.event_type AS type_c, count(*) AS n_abc
      |  FROM s a
      |  JOIN s b ON a.user_id = b.user_id AND a.sid = b.sid
      |    AND a.event_type < b.event_type
      |  JOIN s c ON a.user_id = c.user_id AND a.sid = c.sid
      |    AND b.event_type < c.event_type
      |  GROUP BY 1, 2, 3)
      |SELECT type_a, type_b, type_c, CAST(n_abc AS BIGINT) AS n_abc,
      |  CAST(t.n_sessions AS BIGINT) AS n_sessions,
      |  round(n_abc / t.n_sessions + 1e-9, 4) AS support
      |FROM i, t ORDER BY type_a, type_b, type_c""".stripMargin

  /** q79 — per-user interval-union coverage (gaps-and-islands): each
    * event opens a half-open activity interval [ts, ts+horizon); the
    * operator reports, per user, how many merged activity islands those
    * intervals form and the total covered microseconds — the union
    * length, where overlaps count once. The same sweep answers ad-break
    * coverage, sensor uptime, and GPU-occupancy questions.
    *
    * Classic formulation is an interval self-join; this is the O(n log n)
    * sweep instead: a running `max(end)` over the event-time sort marks
    * island breaks (start strictly past everything seen → new island;
    * touching intervals merge), a running sum numbers them, and two
    * key-local aggregations collapse islands then users. ONE fact
    * shuffle on user_id — both windows share the Exchange+Sort, and both
    * groupBys reuse its hash partitioning. */
  def intervalCoverage(events: DataFrame, horizonMinutes: Int = 5): DataFrame = {
    val durUs = horizonMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("s"), col("event_id"))
    events
      .filter(col("ts").isNotNull) // null times open no interval; see sessionized
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("s"))
      .withColumn("e", col("s") + lit(durUs))
      .withColumn("_maxe",
        max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_brk",
        (col("_maxe").isNull || col("s") > col("_maxe")).cast("long"))
      .withColumn("island", sum(col("_brk")).over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("s")).as("_is"), max(col("e")).as("_ie"),
        count(lit(1)).as("_n"))
      .groupBy(col("user_id"))
      .agg(sum(col("_n")).as("n_events"),
        count(lit(1)).as("n_islands"),
        sum(col("_ie") - col("_is")).as("covered_us"))
      .orderBy("user_id")
  }
  val q79IntervalSql: String =
    """WITH x AS (SELECT user_id, event_id, epoch_us(ts) AS s,
      |    epoch_us(ts) + 300000000 AS e FROM events WHERE ts IS NOT NULL),
      |m AS (SELECT user_id, event_id, s, e,
      |    max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxe
      |  FROM x),
      |b AS (SELECT user_id, event_id, s, e,
      |    CASE WHEN maxe IS NULL OR s > maxe THEN 1 ELSE 0 END AS brk FROM m),
      |isl AS (SELECT user_id, s, e,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY s, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM b),
      |g AS (SELECT user_id, island, min(s) AS i_s, max(e) AS i_e,
      |    count(*) AS n FROM isl GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
      |  CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(sum(i_e - i_s) AS BIGINT) AS covered_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q81 — frequent session paths (sequential-pattern mining at fixed
    * order — the SPADE/PrefixSpan question asked the way production
    * funnels ask it): the top-N most common length-k event-type
    * sequences occurring contiguously inside a session, with
    * multiplicity. Markov (q61) gives 1-step transition rates; this
    * surfaces the actual multi-step journeys ("view click purchase")
    * ranked by raw frequency.
    *
    * Scale shape: the sessionize windows and the per-session ordered
    * collect ride ONE user-key exchange (collect_list is bounded by
    * session length — per-key density, not corpus size); k-gram
    * extraction is a per-row generator, and the path rollup shuffles
    * ≤|types|^k count rows. Top-N is TakeOrderedAndProject. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30, k: Int = 3,
      topN: Int = 15): DataFrame = {
    val sess = sessionized(events, gapMinutes)
    val perSession = sess.groupBy(col("user_id"), col("sid"))
      .agg(transform(
        array_sort(collect_list(struct(col("ts"), col("event_id"),
          col("event_type")))),
        x => x.getField("event_type")).as("seq"))
    perSession
      .select(explode(graft.llm.Text.ngramOccurrences(col("seq"), k))
        .as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(topN)
  }
  /** q149 — Markov session-anomaly scoring: the behavioral complement
    * to q61's transition matrix. The matrix is trained on every
    * intra-session transition (self-supervised — no labels), then each
    * session is scored by its mean negative log-likelihood per step;
    * the top-NLL sessions are the ones walking paths the corpus's own
    * dynamics call improbable — bot loops, broken flows, fraud probes.
    * Sessions under `minTrans` transitions are skipped (a two-step
    * session's NLL is noise, the same floor every anomaly family here
    * applies).
    *
    * Scale shape: the sessionize + lead window ride ONE user-key
    * exchange; the slim (user, sid, src, dst) pair projection is
    * CacheOnce'd for its two consumers (model fit + scoring) so the
    * fact shuffle is paid once; the model collapses to a |types|²
    * frame joined back by broadcast; output is top-N. Scoring against
    * the SAME corpus the model was fit on means every transition has
    * p > 0 — no smoothing term to disagree on. */
  def sessionAnomaly(events: DataFrame, gapMinutes: Int = 720,
      minTrans: Int = 5, topN: Int = 20): DataFrame = {
    val sw = Window.partitionBy(col("user_id"), col("sid"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = graft.core.CacheOnce.swap("q149_session_pairs",
      sessionized(events, gapMinutes)
        .withColumn("next_type", lead(col("event_type"), 1).over(sw))
        .filter(col("next_type").isNotNull)
        .select(col("user_id"), col("sid"),
          col("event_type").as("src"), col("next_type").as("dst")))
    val model = pairs.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        col("n") / sum(col("n")).over(Window.partitionBy(col("src"))))
      .select(col("src"), col("dst"), col("p"))
    pairs.join(broadcast(model), Seq("src", "dst"))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_trans"), avg(-log(col("p"))).as("_nll"))
      .filter(col("n_trans") >= minTrans)
      .select(col("user_id"), col("sid"), col("n_trans"),
        round(col("_nll") + lit(1e-9), 4).as("nll_per_step"))
      .orderBy(col("nll_per_step").desc, col("user_id"), col("sid"))
      .limit(topN)
  }
  def sessionAnomalySql(gapMinutes: Int = 720, minTrans: Int = 5,
      topN: Int = 20): String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, event_type, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL $gapMinutes MINUTE
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |y AS (
       |  SELECT user_id, event_id, event_type, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM x),
       |pr AS MATERIALIZED (
       |  SELECT user_id, sid, event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id, sid
       |      ORDER BY ts, event_id) AS dst
       |  FROM y),
       |pp AS (SELECT user_id, sid, src, dst FROM pr
       |  WHERE dst IS NOT NULL),
       |md AS (SELECT src, dst,
       |    count(*) / CAST(sum(count(*)) OVER (PARTITION BY src)
       |      AS DOUBLE) AS p
       |  FROM pp GROUP BY src, dst),
       |sc AS (SELECT pp.user_id, pp.sid, count(*) AS n_trans,
       |    avg(-ln(md.p)) AS nll
       |  FROM pp JOIN md ON md.src = pp.src AND md.dst = pp.dst
       |  GROUP BY 1, 2)
       |SELECT user_id, CAST(sid AS BIGINT) AS sid,
       |  CAST(n_trans AS BIGINT) AS n_trans,
       |  round(nll + 1e-9, 4) AS nll_per_step
       |FROM sc WHERE n_trans >= $minTrans
       |ORDER BY nll_per_step DESC, user_id, sid LIMIT $topN""".stripMargin

  def q81PathsSql(k: Int = 3, topN: Int = 15): String =
    s"""WITH x AS (
       |  SELECT user_id, event_id, event_type, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events WHERE ts IS NOT NULL
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |y AS (
       |  SELECT user_id, event_id, event_type, ts,
       |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
       |  FROM x),
       |p AS (SELECT list(event_type ORDER BY ts, event_id) AS seq
       |  FROM y GROUP BY user_id, sid),
       |g AS (SELECT unnest(${graft.llm.Text.ngramOccurrencesSql("seq", k)})
       |    AS path FROM p)
       |SELECT path, CAST(count(*) AS BIGINT) AS n
       |FROM g GROUP BY 1 ORDER BY n DESC, path LIMIT $topN""".stripMargin

  /** q97 — multi-touch conversion attribution: credit each `purchase`
    * to the user's preceding non-purchase touches under the three
    * standard position models at once — first-touch (the touch that
    * opened the journey gets the whole conversion), last-touch (the
    * closer gets it), and linear (1/n to each of the n touches). The
    * attribution window for a conversion is the touches since the user's
    * previous conversion, capped at `lookbackDays` — the "since last
    * purchase, at most L days" window every marketing stack defaults to.
    * Output is per channel (= event_type): touch volume and credited
    * conversions under each model; a channel whose first-touch ≫
    * last-touch credit is an opener (awareness), the reverse is a closer.
    *
    * Scale shape: ONE user-key exchange carries everything — the
    * next-conversion window (min over the following frame), the
    * per-conversion ranking window (its (user_id, conv_ts) clustering is
    * subsumed by the user_id hash partitioning, so Spark inserts a sort,
    * not a second Exchange), and only the final per-channel rollup (≤
    * |types| rows) shuffles again. No interval join, no fact-×-fact pair
    * blowup: a touch finds its conversion positionally, so cost is one
    * sort per user partition regardless of how many conversions a user
    * has. */
  def attribution(events: DataFrame, lookbackDays: Int = 3): DataFrame = {
    val lookUs = lookbackDays * 86400L * 1000000L
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val base = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .withColumn("conv_ts",
        min(when(col("event_type") === "purchase", col("ts"))).over(wNext))
    val touches = base
      .filter(col("event_type") =!= "purchase" && col("conv_ts").isNotNull
        && unix_micros(col("ts")) > unix_micros(col("conv_ts")) - lookUs)
    val wConv = Window.partitionBy(col("user_id"), col("conv_ts"))
    val wRank = wConv.orderBy(col("ts"), col("event_id"))
    touches
      .withColumn("rn", row_number().over(wRank))
      .withColumn("sz", count(lit(1)).over(wConv))
      .groupBy(col("event_type").as("channel"))
      .agg(count(lit(1)).as("n_touches"),
        sum(when(col("rn") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("rn") === col("sz"), 1L).otherwise(0L)).as("last_touch"),
        round(sum(lit(1.0) / col("sz")) + lit(1e-9), 4).as("linear_credit"))
      .orderBy("channel")
  }
  def q97AttributionSql(lookbackDays: Int = 3): String =
    s"""WITH b AS (
       |  SELECT event_id, user_id, event_type, ts,
       |    min(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS conv_ts
       |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
       |t AS (
       |  SELECT user_id, event_type, ts, event_id, conv_ts
       |  FROM b WHERE event_type <> 'purchase' AND conv_ts IS NOT NULL
       |    AND ts > conv_ts - INTERVAL $lookbackDays DAY),
       |r AS (
       |  SELECT event_type,
       |    row_number() OVER (PARTITION BY user_id, conv_ts
       |      ORDER BY ts, event_id) AS rn,
       |    count(*) OVER (PARTITION BY user_id, conv_ts) AS sz
       |  FROM t)
       |SELECT event_type AS channel, count(*) AS n_touches,
       |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS first_touch,
       |  CAST(sum(CASE WHEN rn = sz THEN 1 ELSE 0 END) AS BIGINT)
       |    AS last_touch,
       |  round(sum(1.0 / sz) + 1e-9, 4) AS linear_credit
       |FROM r GROUP BY channel ORDER BY channel""".stripMargin

  /** q111 — session entry-point quality: per ENTRY event type (the
    * session's first event — the "landing channel"), session volume,
    * bounce rate (single-event sessions), mean session depth, and mean
    * dwell (first→last event seconds). The standard web-analytics read
    * on the q20b sessionization: an entry channel with a high bounce
    * rate buys traffic that leaves immediately; one with long dwell and
    * depth seeds real journeys — read beside q97 attribution (which
    * credits the END of a journey; this scores how journeys START).
    *
    * Scale shape: rides the sessionized() user-key exchange; the
    * per-session rollup (count + min/max ts + min_by entry) groups on
    * (user_id, sid), whose clustering the user_id partitioning subsumes
    * — ONE fact exchange, then a ≤|types|-row rollup. min_by on the
    * (ts, event_id) struct picks the entry event deterministically
    * (unique tuple), mirrored by DuckDB's min_by over the same tuple. */
  def sessionStats(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    sessionized(events, gapMinutes)
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        min_by(col("event_type"), struct(col("ts"), col("event_id")))
          .as("entry_type"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
          / lit(1e6)).as("dwell_s"))
      .groupBy(col("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        round(sum(when(col("n_events") === 1, 1L).otherwise(0L))
          / count(lit(1)) + lit(1e-9), 4).as("bounce_rate"),
        round(avg(col("n_events")) + lit(1e-9), 2).as("avg_depth"),
        round(avg(col("dwell_s")) + lit(1e-9), 1).as("avg_dwell_s"))
      .orderBy("entry_type")
  /** Same parameters as [[sessionStats]] (the SQL builder/operator
    * parity rule: a non-default `gapMinutes` must not silently lose
    * oracle comparability). */
  def q111SessionStatsSql(gapMinutes: Int = 30): String =
    s"""WITH x AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR ts - lag(ts) OVER w >= INTERVAL $gapMinutes MINUTE
      |         THEN 1 ELSE 0 END AS brk
      |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |y AS (
      |  SELECT user_id, event_id, event_type, ts,
      |    sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x),
      |agg AS (
      |  SELECT user_id, sid, count(*) AS n_events,
      |    (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS dwell_s
      |  FROM y GROUP BY user_id, sid),
      |e AS (
      |  SELECT user_id, sid, event_type AS entry_type FROM (
      |    SELECT user_id, sid, event_type,
      |      row_number() OVER (PARTITION BY user_id, sid
      |        ORDER BY ts, event_id) AS rn
      |    FROM y) WHERE rn = 1),
      |s AS (SELECT agg.n_events, e.entry_type, agg.dwell_s
      |  FROM agg JOIN e USING (user_id, sid))
      |SELECT entry_type, count(*) AS n_sessions,
      |  round(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
      |    / count(*) + 1e-9, 4) AS bounce_rate,
      |  round(avg(n_events) + 1e-9, 2) AS avg_depth,
      |  round(avg(dwell_s) + 1e-9, 1) AS avg_dwell_s
      |FROM s GROUP BY entry_type ORDER BY entry_type""".stripMargin

  private def onEvents(f: DataFrame => DataFrame): QFn =
    (s, d) => f(Tables.events(s, d))

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q30_funnel", onEvents(funnel), Some(q30FunnelSql)),
    ("q30_interval_join", onEvents(clickPurchaseAttribution),
      Some(q30IntervalJoinSql)),
    ("q57_cohort_retention", onEvents(cohortRetention), Some(q57CohortSql)),
    ("q61_markov_transitions", onEvents(markovTransitions),
      Some(q61MarkovSql)),
    ("q149_session_anomaly", onEvents(sessionAnomaly(_)),
      Some(sessionAnomalySql())),
    ("q68_rfm_segments", onEvents(rfmSegments(_)), Some(q68RfmSql)),
    ("q76_basket_rules", onEvents(basketRules(_)), Some(q76BasketSql)),
    ("q79_interval_coverage", onEvents(intervalCoverage(_)),
      Some(q79IntervalSql)),
    ("q81_session_paths", onEvents(sessionPaths(_)), Some(q81PathsSql())),
    ("q85_basket_triples", onEvents(basketTriples(_)), Some(q85TriplesSql)),
    ("q97_attribution", onEvents(attribution(_)),
      Some(q97AttributionSql())),
    ("q111_session_stats", onEvents(sessionStats(_)),
      Some(q111SessionStatsSql())))
}
