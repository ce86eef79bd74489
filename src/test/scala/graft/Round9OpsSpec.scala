package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.{GlobalWindows, LayoutOps, ProfileOps, PruneOps, SampleOps}

/** Invariants of the round-9 operators beyond the DuckDB oracle: bloom
  * prune exactness + actual pruning, the distributed running sum vs the
  * single-partition window, KS sensitivity both ways, correlation sanity,
  * weighted-sample statistics, and Morton-code bit laws. */
class Round9OpsSpec extends SparkSpec {

  test("bloom prune: result equals the plain semi join; the bloom really prunes") {
    val orders = graft.core.Tables.orders(spark, sf0001)
    val customer = graft.core.Tables.customer(spark, sf0001)
    val dim = customer.filter(col("c_mktsegment") === "BUILDING")

    val pruned = PruneOps.bloomPruneSemiJoin(orders, "o_custkey", dim, "c_custkey")
    val exact = orders.join(dim.select(col("c_custkey").as("o_custkey")).distinct(),
      Seq("o_custkey"), "left_semi")
    assert(pruned.count() == exact.count())
    assert(pruned.select("o_orderkey").exceptAll(exact.select("o_orderkey")).isEmpty)

    // the bloom-only stage (no exact verify) must pass all true keys and
    // prune most others: candidates between exact and total
    val bloom = dim.agg(expr("bloom_agg(xxhash64(c_custkey), 100000L)").as("_b")).scalar()
    val candidates = orders
      .filter(call_function("bloom_might_contain", bloom, xxhash64(col("o_custkey"))))
      .count()
    val (n, e) = (orders.count(), exact.count())
    assert(candidates >= e, "a bloom filter can never drop a true key")
    assert(candidates < n,
      s"bloom pruned nothing: $candidates of $n (exact $e)")
  }

  test("withGlobalRunningSum equals the single-partition window on mixed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(1000), i.toLong,
        if (i % 17 == 0) null else java.lang.Long.valueOf(rnd.nextInt(100) - 50),
        if (i % 13 == 0) null else java.lang.Double.valueOf(rnd.nextGaussian()))
    }
    val df = rows.toDF("k", "tie", "a", "b").repartition(8)
    val got = GlobalWindows.withGlobalRunningSum(df,
        Seq("k" -> true, "tie" -> true), Seq("a" -> "ca", "b" -> "cb"))
      .select("tie", "ca", "cb").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val w = Window.orderBy(col("k").asc, col("tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df
      .withColumn("ca", coalesce(sum(col("a")).over(w), lit(0L)))
      .withColumn("cb", coalesce(sum(col("b")).over(w), lit(0.0)))
      .select("tie", "ca", "cb").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    assert(got.size == want.size)
    for ((t, (a, b)) <- want) {
      assert(got(t)._1 == a, s"long cumsum diverges at tie=$t")
      assert(math.abs(got(t)._2 - b) < 1e-6, s"double cumsum diverges at tie=$t")
    }
  }

  test("withGlobalRunningSum plans no Exchange SinglePartition over the data") {
    val orders = graft.core.Tables.orders(spark, sf0001)
    val plan = GlobalWindows.withGlobalRunningSum(
        orders.groupBy(col("o_totalprice").as("v"))
          .agg(count(lit(1)).as("n")),
        Seq("v" -> true), Seq("n" -> "cn"))
      .queryExecution.executedPlan.toString
    // the only single-partition exchange allowed is the |partitions|-row
    // offset window, which sits under a broadcast — the data path itself
    // must stay range-partitioned
    val dataSingle = plan.linesIterator
      .filter(_.contains("Exchange SinglePartition"))
      .filterNot(_ => plan.contains("BroadcastExchange"))
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      plan.take(600))
  }

  test("ksDrift: no drift on identical halves, certain drift on shifted ones") {
    import spark.implicits._
    val base = (1 to 4000).map(i => (i.toLong, (i % 100).toDouble))
    // identical interleave: even/odd split of the same distribution
    val none = ProfileOps.ksDrift(base.toDF("id", "v"), "v",
        col("id") % 2 === 0, col("id") % 2 === 1)
      .collect()(0)
    assert(none.getAs[Long]("n_ref") == 2000 && none.getAs[Long]("n_cur") == 2000)
    assert(none.getAs[Int]("drifted") == 0, none.toString)
    assert(none.getAs[Double]("ks_d") < 0.05, none.toString)

    // cur shifted by +50: CDFs separate massively
    val shifted = base.map { case (i, v) =>
      (i, if (i % 2 == 1) v + 50.0 else v) }
    val drift = ProfileOps.ksDrift(shifted.toDF("id", "v"), "v",
        col("id") % 2 === 0, col("id") % 2 === 1)
      .collect()(0)
    assert(drift.getAs[Int]("drifted") == 1, drift.toString)
    assert(drift.getAs[Double]("ks_d") > 0.4, drift.toString)
  }

  test("corrMatrix: known correlations recovered, one row per unordered pair") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map { _ =>
      val x = rnd.nextGaussian()
      (x, 3.0 * x + 1.0, -x + rnd.nextGaussian() * 1e-6, rnd.nextGaussian())
    }
    val got = ProfileOps.corrMatrix(rows.toDF("x", "lin", "neg", "noise"),
        Seq("x", "lin", "neg", "noise"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(got.size == 6) // C(4,2)
    assert(got(("x", "lin")) == 1.0, got.toString)
    assert(got(("x", "neg")) == -1.0, got.toString)
    assert(math.abs(got(("x", "noise"))) < 0.1, got.toString)
  }

  test("weightedSample: reproducible, k-capped, and weight-sensitive") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val a = SampleOps.weightedDocsPerLang(docs).collect()
    val b = SampleOps.weightedDocsPerLang(docs).collect()
    assert(a.sameElements(b), "weighted sample must be a pure function of the rows")
    val perLang = a.groupBy(_.getString(0))
    assert(perLang.values.forall(_.length <= 15))
    assert(perLang.values.forall(g =>
      g.map(_.getInt(1)).sorted.sameElements(1 to g.length)))
    // weighting favors long docs: the sampled mean length must exceed the
    // corpus mean (A-ES inclusion probability increases with weight)
    val sampledMean = a.map(_.getLong(3)).sum.toDouble / a.length
    val corpusMean = docs.agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean should exceed corpus mean $corpusMean")
  }

  test("weightedSample plans WindowGroupLimit (map-side top-k per stratum)") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val plan = SampleOps.weightedDocsPerLang(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(600))
  }

  test("zValue: bit interleave laws and locality monotonicity") {
    import spark.implicits._
    // x=5 (101), y=3 (011), 3 bits: even bits 1,0,1 / odd bits 1,1,0
    // z = 1·1 + 1·2 + 0·4 + 1·8 + 1·16 + 0·32 = 27
    val df = Seq((5L, 3L)).toDF("x", "y")
    val z = df.select(LayoutOps.zValue(col("x"), col("y"), 3).as("z"))
      .collect()(0).getLong(0)
    assert(z == 27L, s"interleave(5,3) should be 27, got $z")
    // round trip: de-interleaving even/odd bits recovers x and y
    val full = Seq((171L, 93L)).toDF("x", "y")
      .select(LayoutOps.zValue(col("x"), col("y"), 8).as("z"))
      .collect()(0).getLong(0)
    val (xr, yr) = (0 until 8).foldLeft((0L, 0L)) { case ((xa, ya), b) =>
      (xa | (((full >> (2 * b)) & 1L) << b),
        ya | (((full >> (2 * b + 1)) & 1L) << b))
    }
    assert(xr == 171L && yr == 93L, s"round trip gave ($xr, $yr)")
  }

  test("zorder audit: every tile spans at most 2^tileBits cells of each dimension") {
    val orders = graft.core.Tables.orders(spark, sf0001)
    val audit = LayoutOps.ordersZorderAudit(orders).collect()
    assert(audit.nonEmpty)
    val maxSpan = (1 << 4) - 1 // tileBits = 4
    for (r <- audit) {
      assert(r.getAs[Long]("x_span") <= maxSpan, r.toString)
      assert(r.getAs[Long]("y_span") <= maxSpan, r.toString)
    }
    // the whole fact is accounted for
    assert(audit.map(_.getAs[Long]("n")).sum == orders.count())
  }

  test("zorderLayout: one range shuffle, files cover narrow tiles of BOTH dims") {
    val orders = graft.core.Tables.orders(spark, sf0001)
    val laid = LayoutOps.zorderLayout(orders, col("o_custkey"),
      col("o_totalprice"), bits = 8, numFiles = 16,
      xRange = (0.0, 16384.0), yRange = (0.0, 600000.0))
    val plan = laid.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"), plan.take(600))
    // measure actual per-output-partition locality vs a hash layout:
    // z-order keeps each partition's custkey span far below the full range
    val spans = laid
      .select(spark_partition_id().as("p"), col("o_custkey"))
      .groupBy("p").agg((max("o_custkey") - min("o_custkey")).as("span"))
      .collect().map(_.getAs[Long]("span"))
    val fullRange = 1500L // sf0.001 custkey range
    assert(spans.count(_ < fullRange / 2) >= spans.length / 2,
      s"z-ordered partitions should be locally narrow: ${spans.mkString(",")}")
  }
}
