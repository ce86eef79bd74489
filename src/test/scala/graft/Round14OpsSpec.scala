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

  // ------------------------------------------------------- q121–q125

  private def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")

  test("q121: an order counts once however many lines are late, and " +
    "on-time / out-of-window orders never count") {
    val orders = Seq(
      (1L, "1-URGENT", ts("1995-07-10")),  // two late lines -> counts once
      (2L, "1-URGENT", ts("1995-07-10")),  // on-time only -> excluded
      (3L, "5-LOW", ts("1995-08-01")),     // one late line -> counts
      (4L, "5-LOW", ts("1995-12-01"))      // late but outside the quarter
    ).toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val lineitem = Seq(
      (1L, ts("1995-11-01")), (1L, ts("1996-01-01")),
      (2L, ts("1995-08-01")),
      (3L, ts("1995-11-15")),
      (4L, ts("1996-06-01"))
    ).toDF("l_orderkey", "l_shipdate")
    val out = graft.operators.RelationalQueries
      .q121LateOrders(orders, lineitem)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("1-URGENT", 1L), ("5-LOW", 1L)))
  }

  test("q122/q123/q125: conditional-aggregate shapes on a hand fixture") {
    val orders = Seq((1L, "1-URGENT"), (2L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_orderpriority")
    val lineitem = Seq(
      // (orderkey, partkey, qty, price, discount, flag, shipdate)
      (1L, 10L, 5.0, 100.0, 0.0, "A", ts("1995-03-01")),
      (1L, 11L, 5.0, 200.0, 0.5, "A", ts("1995-04-01")),
      (2L, 10L, 5.0, 400.0, 0.0, "R", ts("1995-05-01")),
      (2L, 10L, 5.0, 999.0, 0.0, "R", ts("1994-01-01")) // out of year
    ).toDF("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
      "l_discount", "l_returnflag", "l_shipdate")
    val out = graft.operators.RelationalQueries
      .q122PriorityLines(lineitem, orders)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(("A", 2L, 0L), ("R", 0L, 1L)))

    val part = Seq((10L, "PROMO BRUSHED", "Brand#1", 5),
      (11L, "STANDARD PLATED", "Brand#2", 15))
      .toDF("p_partkey", "p_type", "p_brand", "p_size")
    // september window: none of the fixture rows - use the march rows
    // via a custom window start
    val promo = graft.operators.RelationalQueries
      .q123PromoRevenue(lineitem, part, from = "1995-03-01")
      .collect().head.getDouble(0)
    // march: only line 1 (100.0 promo) -> 100%
    assert(promo == 100.0)

    // q125: line (1,10): Brand#1 size 5 qty 5 in [1,15] -> branch 1 hits;
    // line (2,10) qty 5 fails branch 1? no - it also matches [1,15].
    // line 4 qty 5 matches too (no date filter in Q19 shape).
    // line (1,11): Brand#2 size 15 qty 5 not in [10,30] -> out.
    val disj = graft.operators.RelationalQueries
      .q125DisjunctiveRevenue(lineitem, part).collect().head
    assert(disj.getLong(0) == 3L)
    assert(disj.getDouble(1) == 100.0 + 400.0 + 999.0)
  }

  test("q124: flagged suppliers are excluded before the distinct count") {
    val lineitem = Seq((10L, 1L), (10L, 2L), (10L, 2L), (10L, 3L),
      (11L, 1L)).toDF("l_partkey", "l_suppkey")
    val part = Seq((10L, "Brand#1", "T", 5), (11L, "Brand#2", "T", 6))
      .toDF("p_partkey", "p_brand", "p_type", "p_size")
    val supplier = Seq((1L, 10.0), (2L, -5.0), (3L, 0.0))
      .toDF("s_suppkey", "s_acctbal")
    val out = graft.operators.RelationalQueries
      .q124SupplierVariety(lineitem, part, supplier)
      .collect().map(r => (r.getString(0), r.getLong(3))).toSeq
    // part 10: suppliers {1,2,2,3} minus flagged 2 -> 2 distinct
    assert(out == Seq(("Brand#1", 2L), ("Brand#2", 1L)))
  }

  // ------------------------------------------------------ q127–q133

  test("q129: every predicate prunes; delta = sum(price*discount) over " +
    "the qualifying band") {
    val lineitem = Seq(
      (10.0, 1000.0, 0.06, ts("1996-05-01")), // qualifies: 60.0
      (10.0, 2000.0, 0.05, ts("1996-06-01")), // qualifies: 100.0
      (30.0, 1000.0, 0.06, ts("1996-05-01")), // qty >= 24
      (10.0, 1000.0, 0.04, ts("1996-05-01")), // below band
      (10.0, 1000.0, 0.06, ts("1995-05-01"))  // wrong year
    ).toDF("l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
    val r = graft.operators.RelationalQueries
      .q129ForecastRevenue(lineitem).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 160.0)
  }

  test("q127/q133: segment/return-flag gates, revenue aggregate, " +
    "deterministic top-k") {
    val customer = Seq(
      (1L, "c1", 10.0, 0L, "BUILDING"), (2L, "c2", 20.0, 0L, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_acctbal", "c_nationkey",
        "c_mktsegment")
    val nation = Seq((0L, "NATION_0")).toDF("n_nationkey", "n_name")
    val orders = Seq(
      (100L, 1L, ts("1996-01-01")),  // BUILDING, before cutoff
      (200L, 2L, ts("1996-01-01")),  // wrong segment for q127
      (300L, 1L, ts("1996-12-01"))   // after cutoff for q127
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val lineitem = Seq(
      (100L, 100.0, 0.0, "R", ts("1996-07-01")), // ships after cutoff
      (100L, 50.0, 0.5, "N", ts("1996-08-01")),  // ships after cutoff
      (100L, 999.0, 0.0, "R", ts("1996-01-05")), // shipped pre-cutoff
      (200L, 70.0, 0.0, "R", ts("1996-07-01")),
      (300L, 80.0, 0.0, "R", ts("1997-01-01"))
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_returnflag",
      "l_shipdate")
    val q3 = graft.operators.RelationalQueries
      .q127ShippingPriority(lineitem, orders, customer)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(q3.toSeq == Seq((100L, 125.0))) // 100 + 50*0.5
    // q133: quarter 1996-10-01..1997-01-01 → only order 300 (c1, 'R')
    val q10 = graft.operators.RelationalQueries
      .q133ReturnedItems(lineitem, orders, customer, nation)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(4)))
    assert(q10.toSeq == Seq((1L, "c1", 80.0)))
  }

  test("q128/q130/q131/q132: the dimension-chain shapes on one " +
    "mini-warehouse") {
    val region = Seq((0L, "ASIA"), (1L, "AMERICA"))
      .toDF("r_regionkey", "r_name")
    val nation = Seq((1L, "NATION_1", 0L), (2L, "NATION_2", 0L),
      (3L, "NATION_3", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val supplier = Seq((11L, 1L), (12L, 2L), (13L, 3L))
      .toDF("s_suppkey", "s_nationkey")
    val customer = Seq((21L, 1L), (22L, 2L), (23L, 3L))
      .toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (100L, 21L, ts("1996-02-01")),
      (200L, 22L, ts("1996-03-01")),
      (300L, 23L, ts("1997-04-01"))
    ).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val part = Seq(
      (31L, "red ring small", "STANDARD X", 100.0),
      (32L, "blue bolt large", "PROMO Y", 200.0))
      .toDF("p_partkey", "p_name", "p_type", "p_retailprice")
    val lineitem = Seq(
      // order 100 (cust n1): supp 11 (n1, same nation), part 31
      (100L, 31L, 11L, 2.0, 1000.0, 0.0, ts("1996-02-10")),
      // order 100: supp 12 (n2, cross nation n1←n2), part 32
      (100L, 32L, 12L, 1.0, 500.0, 0.2, ts("1996-02-20")),
      // order 200 (cust n2): supp 11 (n1, cross nation n2←n1), part 31
      (200L, 31L, 11L, 1.0, 300.0, 0.0, ts("1996-03-10")),
      // order 300 (cust n3, AMERICA, 1997): supp 13 (n3), part 31
      (300L, 31L, 13L, 1.0, 400.0, 0.0, ts("1997-04-10"))
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_shipdate")

    // q128 (ASIA, 1996): only line 1 has c_nation == s_nation (n1):
    // revenue 1000 under NATION_1
    val q5 = graft.operators.RelationalQueries
      .q128LocalSupplierVolume(lineitem, orders, customer, supplier,
        nation, region)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(q5.toSeq == Seq(("NATION_1", 1000.0)))

    // q130 (N1↔N2, ship 1996-97): line 2 (supp n2 → cust n1, 400.0
    // after discount) and line 3 (supp n1 → cust n2, 300.0)
    val q7 = graft.operators.RelationalQueries
      .q130NationVolume(lineitem, orders, customer, supplier, nation,
        nationA = "NATION_1", nationB = "NATION_2")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getDouble(3)))
    assert(q7.toSeq == Seq(
      ("NATION_1", "NATION_2", 1996, 300.0),
      ("NATION_2", "NATION_1", 1996, 400.0)))

    // q131 (home NATION_3, region AMERICA market, STANDARD parts):
    // market = order 300 only (cust n3); its supplier IS n3 → share 1.0
    val q8 = graft.operators.RelationalQueries
      .q131MarketShare(lineitem, orders, customer, supplier, nation,
        region, part)
      .collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(q8.toSeq == Seq((1997, 1.0)))

    // q132 ('ring' parts = 31): margins per (supp nation, year):
    // line1 n1/1996: 1000 - 0.8*100*2 = 840; line3 n1/1996:
    // 300 - 80 = 220 → 1060; line4 n3/1997: 400 - 80 = 320
    val q9 = graft.operators.RelationalQueries
      .q132ProductProfit(lineitem, orders, supplier, nation, part)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    assert(q9.toSeq == Seq(("NATION_1", 1996, 1060L),
      ("NATION_3", 1997, 320L)))
  }

  // ------------------------------------------------------------ q126

  test("qualityKeeper keeps the highest-quality member and flags the " +
    "policy change vs keep-min-id") {
    // docs 1,2 identical; doc 3 swaps one filler token for a stopword:
    // still ~0.9 Jaccard (one token = ~5 of ~96 shingles) but higher
    // quality (stopword ratio +1/97 -> +0.004 after the 0.4 weight,
    // visible at 4 dp) — so the component keeps 3, not min-id 1
    val base = (1 to 90).map(i => s"tok$i").mkString(" ") +
      " the quick brown fox hunts tasty rabbits at night"
    val docs = Seq(
      (1L, base), (2L, base),
      (3L, base.replace("tok1 ", "of ")),
      (4L, "completely different text about spark and distributed " +
        "query engines processing petabytes of training data")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val out = graft.llm.DedupOps.qualityKeeper(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("component") == 1L)
    assert(r.getAs[Long]("kept_doc") == 3L)
    assert(r.getAs[Long]("n_members") == 3L)
    assert(r.getAs[Int]("policy_changed") == 1)
  }

  // ------------------------------------------------------------ q134

  test("lshTuningAudit: per-bin S-curve matches the closed form and " +
    "missed mass is (1 - p) of the bin") {
    val base = (1 to 90).map(i => s"tok$i").mkString(" ") +
      " the quick brown fox hunts tasty rabbits at night"
    val docs = Seq(
      (1L, base), (2L, base),                      // exact dup: jac 1.0
      (3L, base.replace("tasty", "fresh")),        // near dup of 1/2
      (4L, "entirely different content about distributed engines")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    val out = graft.llm.DedupOps.lshTuningAudit(docs).collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    assert(out.nonEmpty)
    val (b, rr) = (graft.functions.MinHashBands.Bands,
      graft.functions.MinHashBands.RowsPerBand)
    out.foreach { case (lo, n, p, missed) =>
      val jMid = lo + 0.025
      val pm = math.pow(1.0 - math.pow(jMid, rr), b)
      assert(math.abs(p - (1.0 - pm)) < 5e-4, s"p_detect at $lo")
      assert(math.abs(missed - n * pm) < 5e-2, s"exp_missed at $lo")
    }
    // the S-curve is monotone in similarity
    val ps = out.map(_._3)
    assert(ps.zip(ps.tail).forall { case (a2, b2) => b2 >= a2 })
    // the exact-dup pair (jac 1.0) bin must be detected with p = 1
    assert(out.last._1 == 1.0 && out.last._3 == 1.0 && out.last._4 == 0.0)
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
