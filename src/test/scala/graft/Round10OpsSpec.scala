package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llm.{DedupOps, TextOps}
import graft.operators.ProfileOps

/** Round-10 additions: split-leakage audit, Gopher rule gates, grouped
  * equal-frequency feature binning. */
class Round10OpsSpec extends SparkSpec {

  test("splitLeakage: cross-fold near-dup pairs flagged leaked, same-fold not") {
    import spark.implicits._
    // doc pairs (1,2) and (3,4) are exact near-dups; md5 fold assignment
    // is deterministic, so compute expected folds with the same rule
    def text(ns: Long): String = (0 until 12).map(t => s"w${ns}t$t").mkString(" ")
    val docs = Seq(
      (1L, text(100)), (2L, text(100)),
      (3L, text(200)), (4L, text(200)),
      (5L, text(300))).toDF("doc_id", "text")
    val got = DedupOps.splitLeakage(docs).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val folds = docs.select(col("doc_id"),
        when(conv(substring(md5(to_binary(col("doc_id").cast("string"),
          lit("utf-8"))), 1, 15), 16, 10).cast("long") % 100 < 80, "train")
          .when(conv(substring(md5(to_binary(col("doc_id").cast("string"),
            lit("utf-8"))), 1, 15), 16, 10).cast("long") % 100 < 90, "val")
          .otherwise("test").as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = Seq((1L, 2L), (3L, 4L))
      .map { case (a, b) =>
        val fs = Seq(folds(a), folds(b)).sorted
        (fs(0), fs(1)) }
      .groupBy(p => p).map { case ((x, y), g) =>
        (x, y, g.size.toLong, if (x != y) 1 else 0) }.toSet
    assert(got.toSet == expected, s"got ${got.toSeq} want $expected")
    // every pair is accounted for: leaked + unleaked == all near-dup pairs
    assert(got.map(_._3).sum == 2)
  }

  test("gopherRules: each rule fails exactly the doc built to fail it") {
    import spark.implicits._
    val stopRich = "the a an and of to in is it or"
    val docs = Seq(
      // passes everything: 20+ varied words incl. 2+ distinct stopwords
      (1L, "s1", stopRich + " " + (1 to 15).map(i => s"word$i").mkString(" ")),
      // fails word count (< 20 words)
      (2L, "s1", "the a short doc"),
      // fails mean word length only (> 10 avg): 20+ DISTINCT long words
      (3L, "s1", ("the a " + (1 to 20).map(i => s"extraordinarily$i").mkString(" "))),
      // fails stopword rule: 20+ words, none are stopwords
      (4L, "s1", (1 to 25).map(i => s"token$i").mkString(" ")),
      // fails repetition only: one trigram repeated end to end (dup frac
      // ≈ 0.9) while word count, mean length and stopwords all pass
      (5L, "s1", ("the and " + "xyzw abcd qrst " * 12).trim))
      .toDF("doc_id", "source", "text")
    val r = TextOps.gopherRules(docs).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getString(0) == "s1")
    assert(row.getLong(1) == 5, "n_docs")
    assert(row.getLong(2) == 1, s"fail_wordcount=${row.getLong(2)}")
    assert(row.getLong(3) == 1, s"fail_meanwordlen=${row.getLong(3)}")
    assert(row.getLong(4) == 1, s"fail_stopwords=${row.getLong(4)}")
    assert(row.getLong(5) == 1, s"fail_repetition=${row.getLong(5)}")
    assert(row.getLong(6) == 1, s"n_pass=${row.getLong(6)}")
  }

  test("featureBins: equal-frequency bins, ntile sizing law, matches built-in") {
    val li = Tables.lineitem(spark, sf0001)
    val bins = ProfileOps.lineitemFeatureBins(li).collect()
    val total = li.count()
    bins.groupBy(_.getString(0)).foreach { case (feature, rows) =>
      assert(rows.length == 10, s"$feature should have 10 bins")
      val ns = rows.sortBy(_.getLong(1)).map(_.getLong(2))
      assert(ns.sum == total, s"$feature bins must cover every row")
      // SQL ntile law: first (total % 10) bins one larger, rest equal
      assert(ns.max - ns.min <= 1, s"$feature bins must be equal-frequency")
      // bin value ranges are non-overlapping and ordered
      val sorted = rows.sortBy(_.getLong(1))
      sorted.sliding(2).foreach { case Array(a, b) =>
        assert(a.getDouble(4) <= b.getDouble(3) + 1e-9,
          s"$feature bin ${a.getLong(1)} hi > bin ${b.getLong(1)} lo")
      case _ => ()
      }
    }
  }

  test("grouped running sum equals the built-in PARTITION BY cumulative window") {
    val orders = Tables.orders(spark, sf0001)
    val got = graft.operators.GlobalWindows.withGlobalRunningSum(orders,
        Seq("o_orderdate" -> true, "o_orderkey" -> true),
        Seq("o_totalprice" -> "run"),
        groups = Seq("o_orderpriority"))
      .select(col("o_orderkey"), round(col("run"), 2).as("run"))
      .orderBy("o_orderkey").collect().toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = orders.select(col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("run"))
      .orderBy("o_orderkey").collect().toSeq
    assert(got == want)
  }

  test("exactPercentiles: percentile_disc semantics vs a sorted reference") {
    val events = Tables.events(spark, sf0001)
    val got = ProfileOps.eventValuePercentiles(events).collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val byType = events.filter(col("value").isNotNull)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0)).map { case (t, rows) =>
        t -> rows.map(_.getDouble(1)).sorted }
    byType.foreach { case (t, sorted) =>
      Seq(0.5, 0.9, 0.99).foreach { p =>
        val pos = math.max(math.ceil(p * sorted.length).toLong, 1L)
        assert(got((t, p)) == sorted((pos - 1).toInt),
          s"$t p$p: got ${got((t, p))}")
      }
    }
    // the data path range-partitions once; no per-group reducer sort
    val df = ProfileOps.eventValuePercentiles(events)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("\\+- Exchange rangepartitioning\\(_g#\\d+ ASC NULLS FIRST, _v#"
      .r.findAllIn(plan).length == 1, plan)
  }

  test("kllQuantileAudit: sketch estimates inside the exact ±2ε rank bounds") {
    val events = Tables.events(spark, sf0001)
    val rows = graft.llm.SketchOps.kllQuantileAudit(events).collect()
    assert(rows.length == 15, rows.length) // 5 types × 3 percentiles
    assert(rows.forall(_.getInt(4) == 1),
      rows.filter(_.getInt(4) != 1).mkString(";"))
    // the bounds are real data values that straddle the target rank
    rows.foreach(r => assert(r.getDouble(2) <= r.getDouble(3), r.toString))
  }

  test("thetaSourceOverlap: ≥90% of exact overlaps inside the sketch ±2σ") {
    val docs = Tables.documents(spark, sf0001)
    val rows = graft.llm.SketchOps.thetaSourceOverlap(docs).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(6) == 1),
      rows.filter(_.getInt(6) != 1).mkString(";"))
    // overlap counts are genuine intersections: n_inter <= min(n_a, n_b)
    rows.foreach { r =>
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)), r.toString)
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, r.toString)
    }
  }

  test("clusterSplit: zero leaked pairs, folds partition the corpus") {
    val docs = Tables.documents(spark, sf0001)
    val rows = graft.llm.DedupOps.clusterSplit(docs).collect()
    assert(rows.map(_.getString(0)).toSet == Set("train", "val", "test"))
    assert(rows.forall(_.getLong(2) == 0L), rows.mkString(";"))
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // the by-id split it replaces DOES leak on this fixture — the fix
    // is load-bearing, not vacuous
    val leakedById = graft.llm.DedupOps.splitLeakage(docs)
      .filter(col("leaked") === 1)
      .agg(sum(col("n_pairs"))).collect()(0).getLong(0)
    assert(leakedById > 0, s"fixture has no by-id leakage to prevent")
  }

  test("double_sort_bits: signed order equals double order across the range") {
    import spark.implicits._
    // adversarial ladder: -Inf, large/small negatives, denormals, zero,
    // denormal positives, ordinary values, +Inf, NaN (both engines sort
    // NaN last) — the expression's SIGNED long order must match exactly
    val vals = Seq(Double.NegativeInfinity, -1.7e308, -3.14, -1.0,
      -0.5, -Double.MinPositiveValue, 0.0, Double.MinPositiveValue,
      1e-300, 0.5, 1.0, 3.14, 1.7e308, Double.PositiveInfinity, Double.NaN)
    val keys = vals.map(graft.functions.DoubleSortBits.compute)
    assert(keys == keys.sorted, vals.zip(keys).toString)
    // -0.0 normalizes away BEFORE keying in featureBins; the raw images
    // differ (documented), which is why the +0.0 normalization exists
    assert(graft.functions.DoubleSortBits.compute(-0.0 + 0.0) ==
      graft.functions.DoubleSortBits.compute(0.0))
    // the SQL surface agrees with the static function
    val viaSql = vals.filterNot(_.isNaN).toDF("v")
      .selectExpr("double_sort_bits(v)").collect().map(_.getLong(0)).toSeq
    assert(viaSql == vals.filterNot(_.isNaN).map(
      graft.functions.DoubleSortBits.compute))
  }

  test("featureBins equals the ntile formulation on adversarial data") {
    import spark.implicits._
    // negatives, cross-octave magnitudes, heavy duplicate blocks longer
    // than a bin, a constant column, and fewer-rows-than-bins — none of
    // which the parquet fixtures exercise (all-positive data)
    val rnd = new scala.util.Random(7)
    val a = (1 to 997).map(_ => (rnd.nextDouble() - 0.5) * math.pow(10,
      rnd.nextInt(9) - 4))
    val b = (1 to 997).map(i => if (i % 3 == 0) -42.0 else rnd.nextInt(7)
      .toDouble)
    val c = (1 to 997).map(_ => 13.37)
    val d = (1 to 997).map(i => if (i <= 5) i.toDouble else Double.NaN)
    val df = a.indices.map(i => (i.toLong, a(i), b(i), c(i),
        if (d(i).isNaN) None else Some(d(i))))
      .toDF("rid", "fa", "fb", "fc", "fd")
    val got = graft.operators.ProfileOps
      .featureBins(df, Seq("fa", "fb", "fc", "fd"), n = 10).collect().toSeq
    df.createOrReplaceTempView("fb_prop")
    val arms = Seq("fa", "fb", "fc", "fd").map { col =>
      s"""SELECT '$col' AS feature, CAST($col AS DOUBLE) AS val, rid
         |FROM fb_prop WHERE $col IS NOT NULL""".stripMargin
    }.mkString("(", " UNION ALL ", ")")
    val want = spark.sql(
      s"""WITH u AS $arms,
         |b AS (SELECT feature, val,
         |    ntile(10) OVER (PARTITION BY feature ORDER BY val, rid) AS bin
         |  FROM u)
         |SELECT feature, bin, count(*) AS n,
         |  round(min(val), 4) AS lo, round(max(val), 4) AS hi
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin).collect().toSeq
    assert(got.map(_.toString) == want.map(_.toString),
      got.zip(want).filter { case (g, w) => g.toString != w.toString }
        .take(5).toString)
  }

  test("featureBins: histogram refinement keeps data off the exchanges") {
    val df = ProfileOps.lineitemFeatureBins(Tables.lineitem(spark, sf0001))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // no range exchange anywhere: the tail is coalesced to one partition
    // so even the closing ORDER BY is a plain sort
    assert(!plan.contains("Exchange rangepartitioning"), plan)
    // never the single-reducer ntile window collapse on the data path
    assert(!plan.contains("Window [ntile"), plan)
    // both passes key on the codegen'd order-preserving bit bucket, and
    // the refinement scan is pruned by the broadcast position join
    assert(plan.contains("double_sort_bits"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the only hash exchanges carry histogram/boundary rows, keyed by
    // the bucket — never a raw (feature, val) fact shuffle
    val hashEx = "Exchange hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(hashEx.nonEmpty && hashEx.forall(_.contains("_b#")), plan)
  }
}
