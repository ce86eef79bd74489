package graft

import org.apache.spark.sql.functions._

import graft.functions.{MisraGries, TermCount}
import graft.llm.CorpusOps
import graft.operators.JourneyOps

/** Invariants of the round-4 operators that the DuckDB oracle alone does
  * not pin down: Misra–Gries sketch guarantees under capacity pressure,
  * funnel stage ordering on a hand-built frame, generic upsert semantics,
  * PII redaction on adversarial spans. */
class Round4OpsSpec extends SparkSpec {

  // ---- Misra–Gries -------------------------------------------------------

  private def mgCount(xs: Seq[String],
      capacity: Int): scala.collection.mutable.HashMap[String, Long] = {
    val mg = new MisraGries(capacity, capacity)
    xs.foldLeft(mg.zero)(mg.reduce)
  }

  test("MisraGries is exact when capacity >= distinct terms") {
    val xs = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    val mg = new MisraGries(8, 2)
    val out = mg.finish(mgCount(xs, 8))
    assert(out == Seq(TermCount("a", 40), TermCount("b", 25)))
  }

  test("MisraGries under pressure: counts undercount by at most N/(capacity+1)") {
    val rnd = new scala.util.Random(7)
    // zipf-ish stream: few heavy terms + a long tail of singletons
    val heavy = Seq.fill(400)("hot1") ++ Seq.fill(250)("hot2") ++ Seq.fill(120)("hot3")
    val tail = (1 to 600).map(i => s"t${rnd.nextInt(500)}")
    val xs = rnd.shuffle(heavy ++ tail)
    val n = xs.size
    val capacity = 16
    val sketch = mgCount(xs, capacity)
    val exact = xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val bound = n.toDouble / (capacity + 1)
    // every sketched count is a lower bound within the MG guarantee
    sketch.foreach { case (t, c) =>
      assert(c <= exact(t), s"$t overcounted: $c > ${exact(t)}")
      assert(exact(t) - c <= bound, s"$t error ${exact(t) - c} > $bound")
    }
    // every term with true frequency > N/(capacity+1) must be present
    exact.filter(_._2 > bound).keys.foreach { t =>
      assert(sketch.contains(t), s"guaranteed heavy hitter $t missing")
    }
  }

  test("MisraGries merge keeps the bound across arbitrary merge trees") {
    val rnd = new scala.util.Random(13)
    val xs = Seq.fill(300)("x") ++ Seq.fill(200)("y") ++
      (1 to 400).map(i => s"t${rnd.nextInt(300)}")
    val n = xs.size
    val capacity = 12
    val mg = new MisraGries(capacity, capacity)
    // split into uneven partitions, reduce each, merge in shuffled order —
    // the shape of Spark's partial aggregation with nondeterministic order
    val parts = rnd.shuffle(xs).grouped(37).toSeq
      .map(p => p.foldLeft(mg.zero)(mg.reduce))
    val merged = rnd.shuffle(parts).reduceLeft(mg.merge)
    assert(merged.size <= capacity)
    val exact = xs.groupBy(identity).map { case (t, g) => t -> g.size.toLong }
    val bound = n.toDouble / (capacity + 1)
    merged.foreach { case (t, c) =>
      assert(c <= exact(t) && exact(t) - c <= bound)
    }
    exact.filter(_._2 > bound).keys.foreach(t => assert(merged.contains(t)))
  }

  // ---- funnel ------------------------------------------------------------

  test("funnel counts only in-order view -> click -> purchase") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events = Seq(
      // user 1: full funnel in order
      (1L, ts(10), 1L, "view", 0.0), (2L, ts(20), 1L, "click", 0.0),
      (3L, ts(30), 1L, "purchase", 9.0),
      // user 2: purchase BEFORE the click — converts nothing past stage 2
      (4L, ts(10), 2L, "view", 0.0), (5L, ts(15), 2L, "purchase", 1.0),
      (6L, ts(20), 2L, "click", 0.0),
      // user 3: click before any view — never enters stage 2
      (7L, ts(5), 3L, "click", 0.0), (8L, ts(10), 3L, "view", 0.0),
      // user 4: view only
      (9L, ts(1), 4L, "view", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = JourneyOps.funnel(events).collect().head
    assert(r.getAs[Long]("users_viewed") == 4)
    assert(r.getAs[Long]("users_clicked") == 2)   // users 1 and 2
    assert(r.getAs[Long]("users_converted") == 1) // user 1 only
    assert(r.getAs[Long]("sum_convert_us") == 20L * 1000000)
  }

  test("funnel ties at equal ts do not qualify (strict ordering)") {
    import spark.implicits._
    def ts(sec: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(sec))
    val events = Seq(
      (1L, ts(10), 1L, "view", 0.0), (2L, ts(10), 1L, "click", 0.0),
      (3L, ts(20), 1L, "purchase", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val r = JourneyOps.funnel(events).collect().head
    assert(r.getAs[Long]("users_clicked") == 0)
    assert(r.getAs[Long]("users_converted") == 0)
  }

  test("sequenceStages generalizes to 4 steps with arbitrary predicates") {
    import spark.implicits._
    // key 1 completes a>b>c>d in order; key 2 stalls after two steps
    // (its 'c' fires before its 'b', so c-after-b never completes)
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "c"), (1L, 4L, "d"),
      (2L, 1L, "a"), (2L, 2L, "c"), (2L, 3L, "b")
    ).toDF("k", "t", "kind")
    val got = JourneyOps.sequenceStages(rows, "k", "t", "kind",
      Seq("sa" -> (col("kind") === "a"), "sb" -> (col("kind") === "b"),
        "sc" -> (col("kind") === "c"), "sd" -> (col("kind") === "d")))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), (1 to 4).map(i =>
        if (r.isNullAt(i)) None else Some(r.getLong(i)))))
    assert(got(0) == (1L, Seq(Some(1L), Some(2L), Some(3L), Some(4L))))
    assert(got(1) == (2L, Seq(Some(1L), Some(3L), None, None)))
  }

  // ---- upsert ------------------------------------------------------------

  test("upsert replaces matched keys, appends new, keeps the rest") {
    import spark.implicits._
    val corpus = Seq((1L, "one", "s"), (2L, "two", "s"), (3L, "three", "t"))
      .toDF("doc_id", "text", "source")
    val updates = Seq((2L, "TWO", "s"), (9L, "nine", "t"))
      .toDF("doc_id", "text", "source")
    val got = CorpusOps.upsert(corpus, updates, "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set(1L -> "one", 2L -> "TWO", 3L -> "three", 9L -> "nine"))
  }

  // ---- PII redaction -----------------------------------------------------

  test("redactPii strips emails, phones, IPs and leaves clean text alone") {
    import spark.implicits._
    val df = Seq(
      "write bob.smith+x@sub.example.co.uk today",
      "call 555-0199 or visit 192.168.001.1 now",
      "version 1.2 of 10.5 is fine",           // dotted numbers that are NOT IPs
      "clean text stays clean"
    ).toDF("text").select(CorpusOps.redactPii(col("text")).as("r"))
    val got = df.collect().map(_.getString(0))
    assert(got(0) == "write [EMAIL] today")
    assert(got(1) == "call [PHONE] or visit [IP] now")
    assert(got(2) == "version 1.2 of 10.5 is fine")
    assert(got(3) == "clean text stays clean")
  }
}
