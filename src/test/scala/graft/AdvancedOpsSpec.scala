package graft

import org.apache.spark.sql.functions._

import graft.functions.ExactMoments
import graft.llm.SimilarityOps
import graft.operators.AdvancedQueries

/** Invariants of the round-2 operators that the DuckDB oracle alone does
  * not pin down: as-of semantics on a hand-built frame, Aggregator merge
  * laws, IVF recall vs brute force. */
class AdvancedOpsSpec extends SparkSpec {

  test("as-of join picks the latest purchase at-or-before each event") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    // user 1: purchases at t=10 (5.0) and t=30 (7.0); events at 5, 10, 20, 30, 40
    // user 2: no purchases — library call on a hand-built frame
    val events = Seq(
      (1L, ts(5), 1L, "view", 0.0, "{}"),
      (2L, ts(10), 1L, "purchase", 5.0, "{}"),
      (3L, ts(20), 1L, "click", 0.0, "{}"),
      (4L, ts(30), 1L, "purchase", 7.0, "{}"),
      (5L, ts(40), 1L, "view", 0.0, "{}"),
      (6L, ts(15), 2L, "view", 0.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = AdvancedQueries.eventPurchaseAsof(events)
      .select("event_id", "asof_pv").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(got(1L).isEmpty)                 // before any purchase
    assert(got(2L).contains(5.0))           // purchase sees itself (ts <= ts)
    assert(got(3L).contains(5.0))
    assert(got(4L).contains(7.0))
    assert(got(5L).contains(7.0))
    assert(got(6L).isEmpty)                 // user with no purchases
  }

  test("generic asofJoin matches the subquery formulation on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // random quotes (unique per key+ts by construction) and probes,
    // including keys with no quotes and ties at equal timestamps
    val quotes = (1 to 120).map { i =>
      (i % 7L, (rnd.nextInt(50) * 2).toLong, rnd.nextDouble())
    }.distinctBy(q => (q._1, q._2)).toDF("k", "t", "v")
    val probes = (1 to 200).map { i =>
      (i % 9L, rnd.nextInt(100).toLong, i.toLong)
    }.toDF("k", "t", "probe_id")
    val got = AdvancedQueries.asofJoin(probes, quotes, "k", "t", "v", "av")
      .select("probe_id", "av").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    // oracle: per probe, the quote with max t among t <= probe.t, same key
    val qByKey = quotes.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    val expected = probes.collect().map { r =>
      val (k, t, id) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val best = qByKey.getOrElse(k, Array.empty).filter(_._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      id -> best
    }.toMap
    assert(got == expected)
  }

  test("ExactMoments: merge is associative/commutative and matches closed form") {
    val xs = Seq(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val bufs = xs.map(x => ExactMoments.reduce(ExactMoments.zero, x))
    val leftFold = bufs.reduceLeft(ExactMoments.merge)
    val rightFold = bufs.reduceRight(ExactMoments.merge)
    val shuffled = scala.util.Random.shuffle(bufs).reduceLeft(ExactMoments.merge)
    assert(leftFold == rightFold && leftFold == shuffled)
    val out = ExactMoments.finish(leftFold)
    val n = xs.size
    val mean = xs.sum / n
    val varSamp = xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)
    assert(out.n == n)
    assert(math.abs(out.mean - mean) < 1e-12)
    assert(math.abs(out.varSamp.get - varSamp) < 1e-9)
    // n < 2 has no sample variance: None (SQL NULL), not a fake 0.0
    assert(ExactMoments.finish(ExactMoments.reduce(ExactMoments.zero, 7.0))
      .varSamp.isEmpty)
    assert(ExactMoments.finish(ExactMoments.zero).varSamp.isEmpty)
  }

  test("IVF KNN achieves recall >= 0.6 vs brute force") {
    def neighbors(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet
    val em = graft.core.Tables.embeddings(spark, sf0001)
    val brute = neighbors(SimilarityOps.knnBrute(em))
    val ivf = neighbors(SimilarityOps.knnIvf(em))
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall too low (found ${ivf.size})")
  }

  test("pivot row counts equal group-by counts") {
    val pivoted = AdvancedQueries.statusPivot(graft.core.Tables.orders(spark, sf0001))
      .withColumn("total", col("f_cnt") + col("o_cnt") + col("p_cnt"))
      .select("o_orderpriority", "total").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = graft.core.Tables.orders(spark, sf0001)
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pivoted == direct)
  }

  test("numericProfile: null/ndv/min/max/mean by hand, one scan in the plan") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 10.0), (4.0, null))
      .toDF("a", "b")
    val prof = graft.operators.ProfileOps.numericProfile(df, Seq("a", "b"))
    val got = prof.collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    assert(got("a") == ((5L, 1L, 3L, 1.0, 4.0, 2.25)))
    assert(got("b") == ((5L, 2L, 2L, 10.0, 30.0, 16.6667)))
    // one wide aggregation over ONE scan of the input — the profile must
    // not rescan the table per column (the UNION-per-column anti-pattern)
    val plan = graft.operators.ProfileOps
      .lineitemProfile(graft.core.Tables.lineitem(spark, sf0001))
      .queryExecution.executedPlan.toString
    assert("FileScan parquet".r.findAllIn(plan).length == 1, plan)
  }
}
