package graft

import org.apache.spark.sql.functions._

import graft.operators.RollupOps

/** Round-14 operator behavior: the approximate presence sidecar and the
  * fd-audit extremes rewrite. */
class Round14OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------- q118 approx

  test("approxPresence: HLL sidecar merges across batch splits exactly " +
    "(union of sketches == sketch of union) and estimates within bound") {
    val events = graft.core.Tables.events(spark, sf0001)
    // same split discipline as q118RollupMerge
    val residue = coalesce(pmod(col("event_id"), lit(5)), lit(0))
    val parts = (0 to 4).map(r =>
      RollupOps.approxPresence(events.filter(residue === r)))
    val merged = RollupOps.approxUsers(
      RollupOps.mergeApproxPresence(parts.reduce(_.unionByName(_))))
    val direct = RollupOps.approxUsers(RollupOps.approxPresence(events))
    val exact = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))

    val joined = merged.withColumnRenamed("n_users_est", "est_merged")
      .join(direct.withColumnRenamed("n_users_est", "est_direct"),
        Seq("day", "event_type"))
      .join(exact, Seq("day", "event_type"))
      .collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (m, d, x) = (r.getAs[Long]("est_merged"),
        r.getAs[Long]("est_direct"), r.getAs[Long]("n_exact"))
      // maintenance invariant: a batch split must not change the sketch
      // state — union of per-batch sketches IS the whole-table sketch
      assert(m == d, s"merge-of-parts $m != direct $d at ${r.get(0)}/${r.get(1)}")
      // lgK=12 → ~1.6% relative standard error; 5% is > 3σ
      assert(math.abs(m - x) <= math.max(3L, (0.05 * x).toLong),
        s"estimate $m vs exact $x at ${r.get(0)}/${r.get(1)}")
    }
  }

  // ------------------------------------------------------------- q88

  test("fdAudit: min!=max violation test matches count(distinct)>1 on " +
    "nulls, all-null groups, and single-value-plus-null groups") {
    val df = Seq(
      // lhs=1: {a, a} — holds
      (1L, Some("a")), (1L, Some("a")),
      // lhs=2: {a, b} — violated
      (2L, Some("a")), (2L, Some("b")),
      // lhs=3: {a, null} — one distinct non-null value: holds
      (3L, Some("a")), (3L, None),
      // lhs=4: {null, null} — zero distinct non-null values: holds
      (4L, None), (4L, None)
    ).toDF("k", "v")
    val audit = graft.operators.QualityOps.fdAudit(df,
      Seq(graft.operators.QualityOps.Fd("k_determines_v", Seq("k"), "v")))
      .collect()
    assert(audit.length == 1)
    val r = audit.head
    assert(r.getAs[Long]("n_groups") == 4L)
    assert(r.getAs[Long]("n_violating") == 1L)
    assert(r.getAs[Int]("holds") == 0)
  }
}
