package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Declarative data-quality constraints — SURVEY.md §2b Q40: the
  * assert-before-ingest gate every pipeline runs between landing a batch
  * and letting it into the corpus (the deequ/Great-Expectations shape,
  * public canon: Schelter et al., "Automating Large-Scale Data Quality
  * Verification", VLDB 2018).
  *
  * Every constraint is normalized to ONE uniform metric — the count of
  * violating rows — so a suite of N constraints over a table compiles to
  * a SINGLE wide aggregation row (one scan, same shape as q37 profiling)
  * unpivoted by `stack` into (constraint, violations, passed). Uniqueness
  * uses distinct aggregates (Expand, the exact tradeoff documented on
  * ProfileOps); everything else is a plain conditional count, fully
  * codegen'd. Cross-table containment (foreign-key) checks are an
  * anti-join count — broadcastable when the parent's key set is small,
  * shuffle-join otherwise, never a crossed pair space.
  */
object QualityOps {

  /** A named constraint: `violations` must be an aggregate expression
    * counting offending rows (0 = pass). */
  final case class Check(name: String, violations: Column)

  /** Rows where `c` is NULL. */
  def complete(c: String): Check =
    Check(s"complete_$c", count(lit(1)) - count(col(c)))

  /** Duplicate rows under key `c` (count − distinct count). */
  def unique(c: String): Check =
    Check(s"unique_$c", count(col(c)) - countDistinct(col(c)))

  /** Non-null rows of `c` outside [lo, hi]. */
  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range_$c",
      count(when(col(c) < lo || col(c) > hi, lit(1))))

  /** Non-null rows of `c` outside the accepted domain. */
  def acceptedValues(c: String, values: Seq[String]): Check =
    Check(s"domain_$c", count(when(!col(c).isin(values: _*), lit(1))))

  /** Rows violating an arbitrary row-level predicate (NULL = violation,
    * so a predicate over a NULL column counts it — assert completeness
    * separately if NULLs are legal). */
  def satisfies(name: String, predicate: Column): Check =
    Check(s"satisfies_$name", count(when(!coalesce(predicate, lit(false)), lit(1))))

  /** Evaluate a suite in one scan: (constraint, violations, passed). */
  def check(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "constraint suite is empty")
    val aggs = checks.zipWithIndex.map { case (c, i) =>
      c.violations.cast("long").as(s"_v$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // names are caller-supplied (satisfies(name, ...)) and get spliced
    // into expression text — escape so a quote can't break parsing or
    // inject expression fragments into expr()
    def lit(s: String) =
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    val stackArgs = checks.zipWithIndex
      .map { case (c, i) => s"${lit(c.name)}, _v$i" }.mkString(", ")
    wide.select(expr(s"stack(${checks.size}, $stackArgs)")
        .as(Seq("constraint", "violations")))
      .withColumn("passed", (col("violations") === 0).cast("int"))
      .orderBy("constraint")
  }

  /** Foreign-key containment: child keys with no parent (anti-join count),
    * as a one-row suite result unionable with [[check]] output. */
  def containment(name: String, child: DataFrame, childKey: String,
      parent: DataFrame, parentKey: String): DataFrame =
    child.filter(col(childKey).isNotNull)
      .join(parent, col(childKey) === parent(parentKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit(s"fk_$name").as("constraint"), col("violations"),
        (col("violations") === 0).cast("int").as("passed"))

  /** q40 registry entry: the orders ingest gate — key uniqueness and
    * completeness, domain and range sanity, a row-level business rule,
    * and the customer foreign key. */
  def ordersGate(orders: DataFrame, customer: DataFrame): DataFrame =
    check(orders, Seq(
      unique("o_orderkey"),
      complete("o_custkey"),
      complete("o_totalprice"),
      acceptedValues("o_orderstatus", Seq("F", "O", "P")),
      inRange("o_totalprice", 0.0, 1e7),
      satisfies("priority_form",
        col("o_orderpriority").rlike("^[1-5]-"))))
      .unionAll(containment("orders_customer",
        orders, "o_custkey", customer, "c_custkey"))
      .orderBy("constraint")

  /** The percentile aggregate both treatments share. Default is
    * `approx_percentile` (GK sketch, bounded state — the plan you run at
    * 100 TB); `exact = true` switches to exact `percentile`, whose final
    * buffer holds one entry per distinct value — unbounded on a high-NDV
    * double column, so it exists for oracle contracts and small data, not
    * production. `accuracy` is the sketch knob (1/accuracy relative rank
    * error). */
  private def pct(c: Column, p: Double, exact: Boolean,
      accuracy: Int): Column =
    if (exact) percentile(c, lit(p))
    else percentile_approx(c, lit(p), lit(accuracy))

  /** Winsorization — clip a numeric column to its [pLo, pHi] percentiles
    * (the standard tabular outlier treatment; clipping, not dropping,
    * preserves row counts for downstream joins). The percentile pair is a
    * one-row aggregate broadcast back over the data (the in-plan scalar
    * pattern — no driver action), then a codegen'd greatest/least clamp.
    * Approximate percentiles by default (bounded sketch state — the
    * 100 TB plan); `exact = true` pins the oracle contract. */
  def winsorize(df: DataFrame, c: String, pLo: Double, pHi: Double,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    // ONE percentile aggregate with an array of targets, not one per
    // bound: each percentile() buffer independently collects every
    // value (the fat-state hazard doubled); the array form keeps one
    // value-count buffer and reads both order stats off it
    val bounds = df.agg(
      (if (exact) percentile(col(c), array(lit(pLo), lit(pHi)))
       else percentile_approx(col(c), array(lit(pLo), lit(pHi)),
         lit(accuracy))).as("_ps"))
      .select(element_at(col("_ps"), 1).as("_plo"),
        element_at(col("_ps"), 2).as("_phi"))
    df.crossJoin(broadcast(bounds))
      .withColumn(c + "_w",
        least(greatest(col(c), col("_plo")), col("_phi")))
  }

  /** q44 registry entry: the clipping audit for orders value at P1/P99 —
    * row count, rows clipped each side, mean before/after, the bounds.
    * `exact = true` because the DuckDB oracle computes exact quantiles;
    * library callers get the approx default. */
  def winsorizeAudit(orders: DataFrame): DataFrame =
    winsorize(orders, "o_totalprice", 0.01, 0.99, exact = true)
      .agg(count(lit(1)).as("n"),
        count(when(col("o_totalprice") < col("_plo"), 1)).as("n_low"),
        count(when(col("o_totalprice") > col("_phi"), 1)).as("n_high"),
        round(avg(col("o_totalprice")), 4).as("mean_before"),
        round(avg(col("o_totalprice_w")), 4).as("mean_after"),
        round(max(col("_plo")), 4).as("p_lo"),
        round(max(col("_phi")), 4).as("p_hi"))

  val q44WinsorizeSql: String =
    """WITH p AS (SELECT quantile_cont(o_totalprice, 0.01) AS plo,
      |    quantile_cont(o_totalprice, 0.99) AS phi FROM orders)
      |SELECT count(*) AS n,
      |  count(CASE WHEN o_totalprice < plo THEN 1 END) AS n_low,
      |  count(CASE WHEN o_totalprice > phi THEN 1 END) AS n_high,
      |  round(avg(o_totalprice), 4) AS mean_before,
      |  round(avg(least(greatest(o_totalprice, plo), phi)), 4)
      |    AS mean_after,
      |  round(max(plo), 4) AS p_lo, round(max(phi), 4) AS p_hi
      |FROM orders, p""".stripMargin

  /** Robust outlier detection via modified z-score (Iglewicz & Hoaglin
    * 1993, public canon): Mz = 0.6745·(x − median) / MAD, flag |Mz| > 3.5.
    * Median/MAD resist the very outliers they hunt (mean/stddev get
    * dragged). Two full passes by construction — MAD needs the median
    * first — each a scalar aggregate broadcast back in-plan; approximate
    * medians by default (the q44 pattern, bounded sketch state),
    * `exact = true` pins the oracle contract. */
  def madOutliers(df: DataFrame, c: String, cutoff: Double = 3.5,
      exact: Boolean = false, accuracy: Int = 10000): DataFrame = {
    val med = df.agg(pct(col(c), 0.5, exact, accuracy).as("_med"))
    val withMed = df.crossJoin(broadcast(med))
    val mad = withMed
      .agg(pct(abs(col(c) - col("_med")), 0.5, exact, accuracy).as("_mad"))
    withMed.crossJoin(broadcast(mad))
      .withColumn("_mz",
        lit(0.6745) * (col(c) - col("_med")) / col("_mad"))
      .withColumn("is_outlier", (abs(col("_mz")) > cutoff).cast("int"))
  }

  /** q45 registry entry: the outlier audit for orders value. Exact
    * medians to match the DuckDB oracle; library callers get approx. */
  def madOutlierAudit(orders: DataFrame): DataFrame =
    madOutliers(orders, "o_totalprice", exact = true)
      .agg(count(lit(1)).as("n"),
        count(when(col("is_outlier") === 1, 1)).as("n_outliers"),
        round(max(col("_med")), 4).as("med"),
        round(max(col("_mad")), 4).as("mad"),
        round(max(abs(col("_mz"))), 4).as("max_abs_mz"))

  val q45MadSql: String =
    """WITH m AS (SELECT quantile_cont(o_totalprice, 0.5) AS med
      |    FROM orders),
      |d AS (SELECT quantile_cont(abs(o_totalprice - med), 0.5) AS mad
      |    FROM orders, m),
      |z AS (SELECT 0.6745 * (o_totalprice - med) / mad AS mz
      |    FROM orders, m, d)
      |SELECT count(*) AS n,
      |  count(CASE WHEN abs(mz) > 3.5 THEN 1 END) AS n_outliers,
      |  round(max((SELECT med FROM m)), 4) AS med,
      |  round(max((SELECT mad FROM d)), 4) AS mad,
      |  round(max(abs(mz)), 4) AS max_abs_mz
      |FROM z""".stripMargin

  val q40ConstraintsSql: String =
    """WITH t AS (
      |  SELECT 'unique_o_orderkey' AS "constraint",
      |    count(o_orderkey) - count(DISTINCT o_orderkey) AS violations
      |  FROM orders
      |  UNION ALL SELECT 'complete_o_custkey',
      |    count(*) - count(o_custkey) FROM orders
      |  UNION ALL SELECT 'complete_o_totalprice',
      |    count(*) - count(o_totalprice) FROM orders
      |  UNION ALL SELECT 'domain_o_orderstatus',
      |    count(CASE WHEN o_orderstatus NOT IN ('F','O','P')
      |      THEN 1 END) FROM orders
      |  UNION ALL SELECT 'range_o_totalprice',
      |    count(CASE WHEN o_totalprice < 0 OR o_totalprice > 1e7
      |      THEN 1 END) FROM orders
      |  UNION ALL SELECT 'satisfies_priority_form',
      |    count(CASE WHEN NOT coalesce(
      |      regexp_matches(o_orderpriority, '^[1-5]-'), false)
      |      THEN 1 END) FROM orders
      |  UNION ALL SELECT 'fk_orders_customer', count(*)
      |  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
      |SELECT "constraint", violations,
      |  CAST(violations = 0 AS INTEGER) AS passed
      |FROM t ORDER BY "constraint"""".stripMargin

  /** q82 — keyed snapshot diff / reconciliation: given two snapshots of
    * the same logical table, report added / removed / changed / unchanged
    * key counts plus a per-compared-column changed count — the data-diff
    * a pipeline regression gate or a replication check reads (q41's xor
    * manifest answers "did anything change"; this answers WHAT changed,
    * at column granularity, without shipping rows anywhere).
    *
    * Scale shape: ONE full-outer shuffle join on the key (each side
    * shuffles once); all verdicts are per-row expressions folded by a
    * single wide aggregate into ONE row, unpivoted to (metric, n) by
    * the q37 stack. Null-safe equality (`<=>`) so NULL→value and
    * value→NULL count as changes, never as matches. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "snapshotDiff needs at least one compare column")
    val aSel = a.select((key +: cols).map(c => col(c).as(s"a_$c")): _*)
    val bSel = b.select((key +: cols).map(c => col(c).as(s"b_$c")): _*)
    val j = aSel.join(bSel, col(s"a_$key") === col(s"b_$key"), "full_outer")
    val inA = col(s"a_$key").isNotNull
    val inB = col(s"b_$key").isNotNull
    val colChanged = cols.map(c =>
      (inA && inB && !(col(s"a_$c") <=> col(s"b_$c"))).cast("long"))
    val anyChanged = colChanged.reduce((x, y) =>
      greatest(x, y))
    val aggs =
      Seq(sum((inB && !inA).cast("long")).as("added"),
        sum((inA && !inB).cast("long")).as("removed"),
        sum(when(inA && inB, anyChanged)).as("changed"),
        sum((inA && inB).cast("long") - anyChanged).as("unchanged")) ++
        cols.zip(colChanged).map { case (c, ch) =>
          sum(ch).as(s"col_$c") }
    val wide = j.agg(aggs.head, aggs.tail: _*)
    val names = Seq("added", "removed", "changed", "unchanged") ++
      cols.map(c => s"col_$c")
    val stackArgs = names
      .map(n => s"'${n.replace("'", "\\'")}', `${n.replace("`", "``")}`")
      .mkString(", ")
    wide.select(expr(s"stack(${names.size}, $stackArgs)")
        .as(Seq("metric", "n")))
      .orderBy("metric")
  }

  /** q82 registry fixture: snapshot B derived deterministically from
    * orders — keys ≡ 0 (mod 97) deleted, totalprice bumped where ≡ 0
    * (mod 13), plus re-keyed additions from keys ≡ 0 (mod 89). */
  def ordersSnapshotDiff(orders: DataFrame): DataFrame = {
    val b = orders.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 13 === 0, col("o_totalprice") + 1.0)
          .otherwise(col("o_totalprice")))
      .unionByName(orders.filter(col("o_orderkey") % 89 === 0)
        .withColumn("o_orderkey", -col("o_orderkey") - 1))
    snapshotDiff(orders, b, "o_orderkey",
      Seq("o_totalprice", "o_orderstatus"))
  }

  val q82DiffSql: String =
    """WITH b AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS o_totalprice,
      |    o_orderstatus
      |  FROM orders WHERE o_orderkey % 97 <> 0
      |  UNION ALL
      |  SELECT -o_orderkey - 1, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 89 = 0),
      |j AS (SELECT a.o_orderkey AS ak, b.o_orderkey AS bk,
      |    a.o_totalprice AS ap, b.o_totalprice AS bp,
      |    a.o_orderstatus AS asx, b.o_orderstatus AS bs
      |  FROM orders a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey),
      |w AS (SELECT
      |    sum(CASE WHEN bk IS NOT NULL AND ak IS NULL THEN 1 ELSE 0 END)
      |      AS added,
      |    sum(CASE WHEN ak IS NOT NULL AND bk IS NULL THEN 1 ELSE 0 END)
      |      AS removed,
      |    sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |          AND (NOT (ap IS NOT DISTINCT FROM bp)
      |            OR NOT (asx IS NOT DISTINCT FROM bs)) THEN 1 ELSE 0 END)
      |      AS changed,
      |    sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |          AND ap IS NOT DISTINCT FROM bp
      |          AND asx IS NOT DISTINCT FROM bs THEN 1 ELSE 0 END)
      |      AS unchanged,
      |    sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |          AND NOT (ap IS NOT DISTINCT FROM bp) THEN 1 ELSE 0 END)
      |      AS col_tp,
      |    sum(CASE WHEN ak IS NOT NULL AND bk IS NOT NULL
      |          AND NOT (asx IS NOT DISTINCT FROM bs) THEN 1 ELSE 0 END)
      |      AS col_st
      |  FROM j)
      |SELECT metric, CAST(n AS BIGINT) AS n FROM (
      |  SELECT 'added' AS metric, added AS n FROM w
      |  UNION ALL SELECT 'removed', removed FROM w
      |  UNION ALL SELECT 'changed', changed FROM w
      |  UNION ALL SELECT 'unchanged', unchanged FROM w
      |  UNION ALL SELECT 'col_o_totalprice', col_tp FROM w
      |  UNION ALL SELECT 'col_o_orderstatus', col_st FROM w)
      |ORDER BY metric""".stripMargin

  /** A candidate functional dependency `lhs → rhs` to validate. */
  final case class Fd(name: String, lhs: Seq[String], rhs: String)

  /** q88 — functional-dependency audit (candidate validation, the second
    * half of FD discovery — Papenbrock et al., "Functional Dependency
    * Discovery: An Experimental Evaluation", VLDB 2015): for each declared
    * `X → Y`, count the X-groups where Y takes more than one distinct
    * value. The schema-integrity gate a denormalized lake table needs —
    * a violated FD on a denormalization invariant (`part_key → brand`)
    * means the join that built the table drifted, long before any row
    * fails a q40-style range check.
    *
    * One PLAIN hash aggregate per distinct LHS — no GROUPING SETS. The
    * violation test is `min(rhs) ≠ max(rhs)` — exactly equivalent to
    * `count(DISTINCT rhs) > 1` (both ignore nulls; two distinct
    * non-null values exist iff the extremes differ) but needing no
    * distinct Expand and partial-aggregating map-side, so each set's
    * shuffle carries |groups| slim rows. Earlier forms fused the sets
    * into one GROUPING SETS aggregate ("one scan"), but the fused hash
    * state carried every RHS buffer for every key of every set and
    * measured as a near-serial spill-bound stage at sf0.1; the per-set
    * narrow aggregates re-read the (cheap, columnar, pruned) scan once
    * per set and run fully parallel — aggregate state, not scan I/O,
    * is this operator's bottleneck. A metadata-scale fold then emits
    * one verdict row per FD via a descriptor explode (a union of
    * filtered branches would re-run the aggregate per FD).
    *
 */
  def fdAudit(df: DataFrame, fds: Seq[Fd]): DataFrame = {
    require(fds.nonEmpty, "FD suite is empty")
    // One PLAIN aggregate per distinct LHS, each carrying only ITS
    // FDs' min/max buffers. The previous GROUPING SETS form fused
    // everything into one Expand'd aggregate whose hash state held
    // every RHS buffer for every key of every set — measured at sf0.1
    // as a near-serial spill-bound stage (2.5 s task floor), where the
    // per-set narrow aggregates (no Expand, map-side combine, ~half
    // the buffer width each) run fully parallel. The scan is read once
    // per set, but a columnar scan is the cheap side of this operator;
    // aggregate state is the bottleneck — the same tradeoff q37
    // documents, resolved the other way now that it is measured.
    val bySet: Seq[(Seq[String], Seq[Fd])] =
      fds.groupBy(_.lhs).toSeq.sortBy(_._1.mkString(","))
    bySet.map { case (lhs, setFds) =>
      val rhsCols = setFds.map(_.rhs).distinct
      val extremeAggs = rhsCols.flatMap(r => Seq(
        min(col(r)).as(s"_mn_$r"), max(col(r)).as(s"_mx_$r")))
      val verdictAggs = count(lit(1)).as("_ng") +:
        rhsCols.map(r =>
          sum(when(col(s"_mn_$r") =!= col(s"_mx_$r"), 1L).otherwise(0L))
            .as(s"_nv_$r"))
      val perSet = df.groupBy(lhs.map(col): _*)
        .agg(extremeAggs.head, extremeAggs.tail: _*)
        .groupBy()
        .agg(verdictAggs.head, verdictAggs.tail: _*)
      // per-FD rows via ONE descriptor explode over the one-row frame
      // (a union of filtered branches would re-run the set's aggregate
      // per FD — the union-runs-the-subtree-per-branch hazard)
      // Empty-input contract: the global aggregate above always emits
      // one row, so an empty table would otherwise yield _ng=0 verdict
      // rows with a null 0/0 viol_rate — filter them so fdAudit on an
      // empty table returns an empty result, matching the GROUPING
      // SETS oracle (which produces no per-set rows to judge).
      perSet.filter(col("_ng") > 0)
        .select(explode(array(setFds.map(fd => struct(
          lit(fd.name).as("fd"),
          col("_ng").as("n_groups"),
          col(s"_nv_${fd.rhs}").as("n_violating"))): _*)).as("x"))
        .select(col("x.fd").as("fd"), col("x.n_groups").as("n_groups"),
          col("x.n_violating").as("n_violating"))
    }.reduce(_.unionByName(_))
      .select(col("fd"), col("n_groups"), col("n_violating"),
        round(col("n_violating") / col("n_groups") + lit(1e-9), 4)
          .as("viol_rate"),
        (col("n_violating") === 0).cast("int").as("holds"))
      .orderBy("fd")
  }

  /** q88 registry fixture: the denormalized lineitem ⋈ part view (part
    * broadcast — a metadata-scale dim), auditing the denormalization
    * invariant that HOLDS (`l_partkey → p_brand`), the multi-sourcing
    * candidate that fails (`l_partkey → l_suppkey`), and the line-key
    * data-entry candidate that fails on duplicated line numbers
    * (`l_orderkey, l_linenumber → l_quantity`). */
  def lineitemFdAudit(lineitem: DataFrame, part: DataFrame): DataFrame =
    fdAudit(
      lineitem.join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey")),
      Seq(
        Fd("part_determines_brand", Seq("l_partkey"), "p_brand"),
        Fd("part_determines_supplier", Seq("l_partkey"), "l_suppkey"),
        Fd("linekey_determines_quantity",
          Seq("l_orderkey", "l_linenumber"), "l_quantity")))

  val q88FdAuditSql: String =
    """WITH f AS (
      |  SELECT l.l_partkey, l.l_orderkey, l.l_linenumber,
      |    l.l_suppkey, l.l_quantity, p.p_brand
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      |g AS (
      |  SELECT GROUPING(l_partkey)*1 + GROUPING(l_orderkey)*2
      |      + GROUPING(l_linenumber)*4 AS gid,
      |    count(DISTINCT p_brand) AS nd_brand,
      |    count(DISTINCT l_suppkey) AS nd_supp,
      |    count(DISTINCT l_quantity) AS nd_qty
      |  FROM f
      |  GROUP BY GROUPING SETS ((l_partkey), (l_orderkey, l_linenumber))),
      |v AS (
      |  SELECT gid, count(*) AS ng,
      |    sum(CASE WHEN nd_brand > 1 THEN 1 ELSE 0 END) AS nv_brand,
      |    sum(CASE WHEN nd_supp > 1 THEN 1 ELSE 0 END) AS nv_supp,
      |    sum(CASE WHEN nd_qty > 1 THEN 1 ELSE 0 END) AS nv_qty
      |  FROM g GROUP BY gid)
      |SELECT fd, CAST(n_groups AS BIGINT) AS n_groups,
      |  CAST(n_violating AS BIGINT) AS n_violating,
      |  round(n_violating / CAST(n_groups AS DOUBLE) + 1e-9, 4)
      |    AS viol_rate,
      |  CAST(n_violating = 0 AS INT) AS holds
      |FROM (
      |  SELECT 'part_determines_brand' AS fd, ng AS n_groups,
      |    nv_brand AS n_violating FROM v WHERE gid = 6
      |  UNION ALL
      |  SELECT 'part_determines_supplier', ng, nv_supp FROM v WHERE gid = 6
      |  UNION ALL
      |  SELECT 'linekey_determines_quantity', ng, nv_qty FROM v
      |  WHERE gid = 1)
      |ORDER BY fd""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  /** q110 — k-anonymity / l-diversity audit (Sweeney '02; Machanavajjhala
    * '07): group the table by its quasi-identifier columns and report
    * re-identification exposure in ONE row — groups below `k` members
    * (each such row is pin-pointable by its QI combination), the rows
    * they contain, and groups whose sensitive attribute shows fewer than
    * `l` distinct values (everyone in the group shares the secret even
    * when the group is large). The release gate a training-data pipeline
    * runs BESIDE q33 redaction: redaction strips direct identifiers;
    * this measures what the remaining quasi-identifiers still leak.
    * NULL QI values form their own group (both engines' GROUP BY
    * semantics); NULL sensitive values don't count toward diversity.
    *
    * Scale shape: one hash aggregate on the QI key (count + distinct
    * partials collapse map-side) and a one-row rollup — nothing else
    * touches the fact table. */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String],
      sensitive: Column, k: Int = 5, l: Int = 3): DataFrame = {
    require(qiCols.nonEmpty, "k-anonymity needs at least one QI column")
    val groups = df
      .groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("sz"),
        count_distinct(sensitive).as("ndist"))
    groups.agg(
      sum(col("sz")).as("n_rows"),
      count(lit(1)).as("n_groups"),
      min(col("sz")).as("min_group_size"),
      sum(when(col("sz") < k, 1L).otherwise(0L)).as("groups_below_k"),
      sum(when(col("sz") < k, col("sz")).otherwise(0L)).as("rows_at_risk"),
      round(sum(when(col("sz") < k, col("sz")).otherwise(0L))
        / sum(col("sz")) + lit(1e-9), 4).as("risk_share"),
      sum(when(col("ndist") < l, 1L).otherwise(0L))
        .as("groups_low_diversity"),
      round(avg(col("ndist")) + lit(1e-9), 4).as("avg_diversity"))
  }

  /** q110 registry entry: the customer dimension under its releasable
    * quasi-identifiers (nation, market segment), account balance coarsed
    * to the thousand as the sensitive attribute. */
  def customerKAnonymity(customer: DataFrame): DataFrame =
    kAnonymityAudit(customer, Seq("c_nationkey", "c_mktsegment"),
      floor(col("c_acctbal") / 1000).cast("long"))

  val q110KAnonymitySql: String =
    """WITH g AS (
      |  SELECT c_nationkey, c_mktsegment, count(*) AS sz,
      |    count(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS ndist
      |  FROM customer GROUP BY 1, 2)
      |SELECT CAST(sum(sz) AS BIGINT) AS n_rows,
      |  count(*) AS n_groups,
      |  CAST(min(sz) AS BIGINT) AS min_group_size,
      |  CAST(sum(CASE WHEN sz < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_below_k,
      |  CAST(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  round(sum(CASE WHEN sz < 5 THEN sz ELSE 0 END)
      |    / sum(sz) + 1e-9, 4) AS risk_share,
      |  CAST(sum(CASE WHEN ndist < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS groups_low_diversity,
      |  round(avg(ndist) + 1e-9, 4) AS avg_diversity
      |FROM g""".stripMargin

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q40_constraints",
      (s: SparkSession, d: String) =>
        ordersGate(Tables.orders(s, d), Tables.customer(s, d)),
      Some(q40ConstraintsSql)),
    ("q44_winsorize",
      (s: SparkSession, d: String) => winsorizeAudit(Tables.orders(s, d)),
      Some(q44WinsorizeSql)),
    ("q45_mad_outliers",
      (s: SparkSession, d: String) => madOutlierAudit(Tables.orders(s, d)),
      Some(q45MadSql)),
    ("q82_snapshot_diff",
      (s: SparkSession, d: String) => ordersSnapshotDiff(Tables.orders(s, d)),
      Some(q82DiffSql)),
    ("q88_fd_audit",
      (s: SparkSession, d: String) =>
        lineitemFdAudit(Tables.lineitem(s, d), Tables.part(s, d)),
      Some(q88FdAuditSql)),
    ("q110_kanonymity",
      (s: SparkSession, d: String) => customerKAnonymity(Tables.customer(s, d)),
      Some(q110KAnonymitySql)))
}
