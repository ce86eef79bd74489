package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Round-13 operator behavior: hand-computed fixtures for this round's
  * changes (fractional df threshold, linkage recovery pass). */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ q91/q94

  test("pmiPairs: fractional df default scales with corpus size " +
    "(5% of 100 docs prunes df-4 terms, keeps df-5)") {
    // 100 docs; "rare" pair co-occurs in 4 (df 4 < ceil(0.05·100)=5),
    // "com mon" co-occurs in 5 (df 5 ≥ 5). An absolute-25 default
    // would keep neither; the fraction admits exactly the df-5 pair.
    val docs = (
      (1 to 4).map(i => (i.toLong, "rare pair")) ++
      (5 to 9).map(i => (i.toLong, "com mon")) ++
      (10 to 100).map(i => (i.toLong, s"filler$i"))).toDF("doc_id", "text")
    val out = TextOps.pmiPairs(docs, minPair = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("com", "mon")))
    // absolute override restores the old behavior
    val abs = TextOps.pmiPairs(docs, minPair = 2, minDfAbs = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(abs == Set(("com", "mon"), ("pair", "rare")))
  }

  // ---------------------------------------------------------------- q106

  test("disorderAudit: snowflake-scale id spans (> 2^58) bucket without " +
    "overflow and report exact lateness") {
    // the pre-fix math ((event_id - lo) * buckets) wraps Long at this
    // span, yielding negative buckets and silently wrong lateness
    val big = 1L << 60
    val df = Seq(
      (0L, "x", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1100))),
      (1L << 59, "x", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1050))),
      (big, "x", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(1075))))
      .toDF("event_id", "event_type", "ts")
    val r = graft.operators.StatsOps.disorderAudit(df).collect()
    assert(r.length == 1)
    val row = r.head
    // arrival order 0 → 2^59 → 2^60; ts 1100, 1050, 1075: the last two
    // are 50 s and 25 s behind the running high-water mark
    assert(row.getLong(1) == 3L && row.getLong(2) == 2L)
    assert(math.abs(row.getDouble(4) - 37.5) < 1e-6)
    assert(math.abs(row.getDouble(5) - 50.0) < 1e-6)
  }

  // ------------------------------------------------------------- BitDim

  test("BitDim sharded form: pairwise co-occurrence over a 100-value " +
    "dimension matches the naive per-key self-join") {
    import graft.core.BitDim
    // 100 types (> 63 forces two shards), 40 keys, deterministic
    // pseudo-random membership: key k contains type t iff
    // (k*31 + t*17) % 7 < 2  (~29% density)
    val rows = for {
      k <- 1 to 40; t <- 0 until 100
      if (k * 31 + t * 17) % 7 < 2
    } yield (k.toLong, f"t$t%03d")
    val df = rows.toDF("key", "typ")
    val dim = BitDim.shardedDim(df, "typ")
    // the single-mask dim must refuse this width loudly
    val err = intercept[Exception] {
      df.join(BitDim.dim(df, "typ"), "typ").collect()
    }
    assert(err.getMessage.contains("63 distinct values"))
    val masks = BitDim.shardedMasks(df.join(dim, "typ"), Seq("key"))
    // histogram-then-pairs: the fact table never meets the pair space
    val hist = masks.groupBy(col("masks")).agg(count(lit(1)).as("cnt"))
    val got = hist.join(BitDim.shardedPairs(dim, "typ", "a", "b"),
        BitDim.hasBitIn(col("masks"), col("shard_a"), col("bit_a"))
          && BitDim.hasBitIn(col("masks"), col("shard_b"), col("bit_b")))
      .groupBy(col("a"), col("b")).agg(sum(col("cnt")).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val ref = rows.groupBy(_._1).values.flatMap { ks =>
      val ts = ks.map(_._2).sorted
      for (i <- ts.indices; j <- i + 1 until ts.size) yield (ts(i), ts(j))
    }.groupBy(identity).map { case (p, o) => p -> o.size.toLong }
    assert(got == ref)
    // shard math: value #64 (0-based id 63) lands in shard 1, bit 0
    val d = dim.collect().map(r =>
      r.getString(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(d("t000") == ((0, 1L)))
    assert(d(f"t${63}%03d") == ((1, 1L)))
  }

  // ---------------------------------------------------------------- q120

  test("pqAudit: per-subspace argmin assignment with hand-computed " +
    "reconstruction error; code-id tiebreak") {
    import graft.llm.SimilarityOps
    // d=2, 2 subspaces of 1 dim; codebook = vectors 1 and 2
    val em = Seq(
      (1L, Array(0.0f, 10.0f), 0),
      (2L, Array(4.0f, 0.0f), 0),
      (3L, Array(1.0f, 9.0f), 1),  // s0→code 1 (err 1), s1→code 1 (err 1)
      (4L, Array(3.0f, 1.0f), 1))  // s0→code 2 (err 1), s1→code 2 (err 1)
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.pqAudit(em, subspaces = 2,
        codebookIds = Seq(1L, 2L))
      .collect().map(r => (r.getInt(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      (0, 1L) -> ((2L, 0.5)), (0, 2L) -> ((2L, 0.5)),
      (1, 1L) -> ((2L, 0.5)), (1, 2L) -> ((2L, 0.5))), out.toString)
  }

  // ---------------------------------------------------------------- q119

  test("jaccardHistogram: pairs land in their similarity bins, " +
    "boundary values bin up") {
    import graft.llm.DedupOps
    // doc pairs with known jaccard: (1,2) identical → 1.0 (bin 20 at
    // width .05 → bin_lo 1.0); (3,4) share 4 of 8 shingles → 4/12 = 1/3
    // (bin 6 → 0.3). Doc 5 shares nothing that survives.
    val docs = Seq(
      (1L, "a b c d e f g h i"), (2L, "a b c d e f g h i"),
      (3L, "p q r s t u v w"), (4L, "p q r s t u v w x y z a"),
      (5L, "m n o m n o m n o m n o")).toDF("doc_id", "text")
    val out = DedupOps.jaccardHistogram(docs).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    // (3,4): doc3 has 4 5-gram shingles, doc4 has 8, 4 shared → 4/8? no:
    // shingles(doc3)=4, shingles(doc4)=8, inter=4 → 4/(4+8-4)=0.5 → 0.5
    assert(out(1.0) == 1L, out.toString)
    assert(out(0.5) == 1L, out.toString)
  }

  // -------------------------------------------------------------- Salting

  test("saltedJoin equals the plain equi-join and shuffles on the " +
    "fanned-out key") {
    import graft.core.Salting
    // 2-valued key (the parallelism-cap shape), 60 large rows, 6 small
    val large = (1 to 60).map(i => (i.toLong, s"k${i % 2}", i * 1.0))
      .toDF("id", "key", "v")
    val small = (1 to 6).map(i => (s"k${i % 2}", s"tag$i"))
      .toDF("key", "tag")
    val salted = Salting.saltedJoin(large, small, Seq("key"), "id",
      salts = 8)
    val plain = large.join(small, Seq("key"))
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.collect().map(_.toSeq).groupBy(identity).view
        .mapValues(_.length).toMap ==
      plain.collect().map(_.toSeq).groupBy(identity).view
        .mapValues(_.length).toMap)
    // the join key in the plan is (key, _salt), not the bare hot key
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("_salt"), p)
  }

  // ---------------------------------------------------------------- q118

  test("rollup merge: incremental maintenance equals the full recompute, " +
    "including cross-batch extremes and distinct users") {
    import graft.operators.RollupOps
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // day 1 type a: history has the min (1.0) and user 7; the batch has
    // the max (9.0) and users 7 (again — must not double-count) and 8
    val history = Seq(
      (1L, t("2024-05-01 10:00:00"), 7L, "a", 1.0),
      (2L, t("2024-05-01 11:00:00"), 7L, "a", 5.0),
      (3L, t("2024-05-02 10:00:00"), 9L, "b", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val batch = Seq(
      (10L, t("2024-05-01 12:00:00"), 7L, "a", 9.0),
      (11L, t("2024-05-01 13:00:00"), 8L, "a", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val incr = RollupOps.rollupReport(
      RollupOps.mergeRollups(
        RollupOps.dailyRollup(history), RollupOps.dailyRollup(batch)),
      RollupOps.mergePresence(
        RollupOps.userPresence(history), RollupOps.userPresence(batch)))
      .collect().toSeq
    val full = RollupOps.rollupReport(
      RollupOps.dailyRollup(history.unionByName(batch)),
      RollupOps.userPresence(history.unionByName(batch)))
      .collect().toSeq
    assert(incr == full)
    val d1 = incr.head
    assert(d1.getString(1) == "a" && d1.getLong(2) == 4L
      && d1.getDouble(3) == 17.0 && d1.getDouble(4) == 1.0
      && d1.getDouble(5) == 9.0 && d1.getLong(6) == 2L)
  }

  test("rollup merge: incremental equals full recompute over seeded " +
    "random splits (merge-monoid property)") {
    import graft.operators.RollupOps
    val rnd = new scala.util.Random(42)
    (1 to 3).foreach { round =>
      val n = 30 + rnd.nextInt(40)
      val events = (0 until n).map { i =>
        (i.toLong,
          java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
            1700000000L + rnd.nextInt(4) * 86400L + rnd.nextInt(3600))),
          rnd.nextInt(5).toLong,
          s"t${rnd.nextInt(3)}",
          math.round(rnd.nextDouble() * 100) / 10.0)
      }
      val mask = events.map(_ => rnd.nextBoolean())
      val cols = Seq("event_id", "ts", "user_id", "event_type", "value")
      val a = events.zip(mask).filter(_._2).map(_._1).toDF(cols: _*)
      val b = events.zip(mask).filterNot(_._2).map(_._1).toDF(cols: _*)
      val all = events.toDF(cols: _*)
      val incr = RollupOps.rollupReport(
        RollupOps.mergeRollups(
          RollupOps.dailyRollup(a), RollupOps.dailyRollup(b)),
        RollupOps.mergePresence(
          RollupOps.userPresence(a), RollupOps.userPresence(b)))
        .collect().toSeq
      val full = RollupOps.rollupReport(
        RollupOps.dailyRollup(all), RollupOps.userPresence(all))
        .collect().toSeq
      assert(incr == full, s"round $round (n=$n) diverged")
    }
  }

  // ---------------------------------------------------------------- q100

  test("knnLabelAgreement: a singleton-cluster vector surfaces as " +
    "n_unscored instead of vanishing from the audit") {
    // vec 0 is alone in its probed cluster (nProbe=1): no candidates,
    // no agreement — the pre-fix shape dropped it from n_vecs entirely
    val em = Seq(
      (0L, Array(1.0f, 0.0f), "x"),
      (10L, Array(0.0f, 1.0f), "z"),
      (11L, Array(0.1f, 0.9f), "z"),
      (12L, Array(0.0f, 0.9f), "z"))
      .toDF("vec_id", "embedding", "label")
    val out = graft.llm.SimilarityOps.knnLabelAgreement(em, k = 2,
        nProbe = 1, centroidIds = Seq(0L, 10L), iters = 1)
      .collect().map(r => r.getString(0) -> r).toMap
    val x = out("x")
    assert(x.getLong(1) == 1L && x.isNullAt(2) && x.getLong(3) == 0L
      && x.getLong(4) == 1L, x.toString)
    val z = out("z")
    assert(z.getLong(1) == 3L && z.getDouble(2) == 1.0
      && z.getLong(3) == 0L && z.getLong(4) == 0L, z.toString)
  }

  // ---------------------------------------------------------------- q92

  test("fuzzyLinkage: suffix recovery pass restores matches a hot " +
    "prefix block drops, and prefix-damaged matches pass 1 never sees") {
    import graft.operators.LinkageOps
    // Three A rows share the 4-char prefix "same" (occupancy 3 > cap 2)
    // → pass 1 drops the whole block. Their suffixes differ, so pass 2
    // blocks each with its true partner. "solo" is recovered by pass 1
    // alone (cold block); "zz early bird" damages the PREFIX only, the
    // q92 fixture class pass 1 structurally misses.
    val a = Seq((1L, "same alpha"), (2L, "same beta"), (3L, "same gamma"),
      (4L, "solo item"), (5L, "early bird")).toDF("id", "nm")
    val b = Seq((11L, "same alpha"), (12L, "same beta"), (13L, "same gamma"),
      (14L, "solo item"), (15L, "zz early bird")).toDF("id", "nm")
    def run(recover: Boolean) = LinkageOps.fuzzyLinkage(a, b, "id", "id",
        "nm", "nm", blockLen = 4, maxDist = 3, maxBlock = 2,
        recoverPass = recover)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // single-pass: the hot "same" block is capped out; "zz early bird"
    // blocks under "zz e" and never meets "earl"
    assert(run(recover = false) == Set((4L, 14L, 0)))
    // two-pass: suffix keys "lpha"/"beta"/"amma"/"item"/"bird" recover
    // all five (the zz prefix at dist 3)
    assert(run(recover = true) == Set((1L, 11L, 0), (2L, 12L, 0),
      (3L, 13L, 0), (4L, 14L, 0), (5L, 15L, 3)))
  }

  // ---------------------------------------------------- q113–q117

  test("q113 small-lot revenue: per-part average is over ALL of the " +
    "part's history, small lots sum, other brands invisible") {
    import graft.operators.RelationalQueries
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val part = Seq((1L, "B", "t", 1, "p1", 10.0), (2L, "X", "t", 1, "p2", 10.0))
      .toDF("p_partkey", "p_brand", "p_type", "p_size", "p_name", "p_retailprice")
    // part 1: quantities 1, 9, 10 → avg 20/3; frac 0.5 → cutoff 10/3:
    // only the qty-1 row is small. part 2 (brand X) never appears.
    val li = Seq((1L, 1.0, 100.0, ts), (1L, 9.0, 200.0, ts),
      (1L, 10.0, 300.0, ts), (2L, 1.0, 999.0, ts))
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_shipdate")
    val r = RelationalQueries.q113SmallLotRevenue(li, part,
      brand = "B", frac = 0.5).collect().head
    assert(r.getLong(0) == 1L)
    assert(math.abs(r.getDouble(1) - 100.0 / 7.0) < 0.01)
  }

  test("q114 big baskets: only orders over the quantity line survive, " +
    "with their customers") {
    import graft.operators.RelationalQueries
    val ts = java.sql.Timestamp.valueOf("1996-01-01 00:00:00")
    val li = Seq((1L, 30.0), (1L, 25.0), (2L, 10.0))
      .toDF("l_orderkey", "l_quantity")
    val orders = Seq((1L, 7L, ts, 500.0), (2L, 8L, ts, 900.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val cust = Seq((7L, "alice"), (8L, "bob")).toDF("c_custkey", "c_name")
    val out = RelationalQueries.q114BigBaskets(li, orders, cust,
      minQty = 50).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "alice" && r.getLong(2) == 1L
      && r.getDouble(5) == 55.0)
  }

  test("q115 single-source risk: a supplier over the share line is " +
    "counted once per dominated part") {
    import graft.operators.RelationalQueries
    val li = Seq(
      // part 1: s1 ships 60 of 100 (0.6), s2 40 (0.4)
      (1L, 1L, 60.0), (1L, 2L, 40.0),
      // part 2: s1 30 of 100 (0.3), s2 70 (0.7)
      (2L, 1L, 30.0), (2L, 2L, 70.0))
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val supp = Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
    val out = RelationalQueries.q115SingleSourceRisk(li, supp,
        minShare = 0.5)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map("s1" -> ((1L, 0.6)), "s2" -> ((1L, 0.7))))
  }

  test("q116 cheapest supplier: argmin per part by min observed unit " +
    "price, supplier-id tiebreak") {
    import graft.operators.RelationalQueries
    val part = Seq((1L, "pA", 5), (2L, "pB", 5), (3L, "pC", 9))
      .toDF("p_partkey", "p_name", "p_size")
    val li = Seq(
      (1L, 1L, 10.0, 40.0), // unit 4.0
      (1L, 2L, 10.0, 20.0), // unit 2.0 ← cheapest for pA
      (2L, 1L, 10.0, 30.0), // unit 3.0 ← tie...
      (2L, 2L, 10.0, 30.0), // unit 3.0, s1 wins by id
      (3L, 1L, 10.0, 10.0)) // wrong size class, invisible
      .toDF("l_partkey", "l_suppkey", "l_quantity", "l_extendedprice")
    val supp = Seq((1L, "s1"), (2L, "s2")).toDF("s_suppkey", "s_name")
    val out = RelationalQueries.q116CheapestSupplier(li, part, supp,
        sizeSel = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSet == Set(("pA", "s2", 2.0), ("pB", "s1", 3.0)))
  }

  test("q117 top supplier: max-revenue filter keeps ties, window " +
    "excludes out-of-range shipments") {
    import graft.operators.RelationalQueries
    def t(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val li = Seq(
      (1L, 100.0, 0.0, t("1996-02-01")),
      (2L, 60.0, 0.0, t("1996-03-01")),
      (2L, 40.0, 0.0, t("1996-03-02")),
      (3L, 500.0, 0.0, t("1997-01-01"))) // outside the quarter
      .toDF("l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    val supp = Seq((1L, "s1"), (2L, "s2"), (3L, "s3"))
      .toDF("s_suppkey", "s_name")
    val out = RelationalQueries.q117TopSupplier(li, supp,
        from = "1996-01-01", months = 3)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(out.toSet == Set(("s1", 100.0), ("s2", 100.0)))
  }

  test("textrank: fractional df default matches pmiPairs' vocabulary") {
    val docs = (
      (1 to 5).map(i => (i.toLong, "alpha beta")) ++
      (6 to 9).map(i => (i.toLong, "gamma delta")) ++
      (10 to 100).map(i => (i.toLong, s"filler$i"))).toDF("doc_id", "text")
    val out = TextOps.textrank(docs, minPair = 2).collect()
      .map(r => r.getString(0)).toSet
    // gamma/delta df 4 < 5 → out of the graph entirely
    assert(out == Set("alpha", "beta"))
  }
}
