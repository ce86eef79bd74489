package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch

import graft.functions.{KllQuantiles, KllUnionAgg, ThetaAgg, ThetaBuf}

/** Round-11 hardening: sketch-buffer serialization fidelity and
  * bad-cell tolerance in persisted-sketch rollups. */
class Round11OpsSpec extends SparkSpec {

  private def roundTrip(b: ThetaBuf): ThetaBuf = {
    val bos = new ByteArrayOutputStream()
    val oos = new ObjectOutputStream(bos)
    oos.writeObject(b); oos.close()
    new ObjectInputStream(new ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[ThetaBuf]
  }

  test("ThetaBuf round trip preserves a non-default lgK") {
    // lgK=16 retains ~64k hashes; a rebuild with the default (lgK=12)
    // builder would downsample the restored union to ≲8k on the next
    // getResult. 100k distincts distinguish the two regimes cleanly.
    val agg = new ThetaAgg(16)
    var buf = agg.zero
    (0L until 100000L).foreach(v => buf = agg.reduce(buf, v))
    val restored = roundTrip(buf)
    assert(restored.lgK == 16)
    val entries = restored.un.getResult.getRetainedEntries
    assert(entries > 16384, s"retained $entries — lgK lost in transit")
    // and the restored union still ACCEPTS updates at full precision:
    // merging a disjoint 100k-key half keeps the estimate within lgK=16
    // error (~0.4% RSE; 3% here is already impossible at lgK=12)
    var other = agg.zero
    (100000L until 200000L).foreach(v => other = agg.reduce(other, v))
    val est = agg.merge(restored, other).un.getResult.getEstimate
    assert(math.abs(est - 200000.0) / 200000.0 < 0.03, s"estimate $est")
  }

  test("ThetaBuf round trip of an empty buffer keeps lgK for later updates") {
    val agg = new ThetaAgg(8)
    val restored = roundTrip(agg.zero)
    assert(restored.lgK == 8)
    assert(restored.un == null)
  }

  test("ThetaUnionAgg: union of disjoint per-part sketches ≈ direct sketch") {
    // the persisted-sketch read path: per-(key, epoch) sketches roll up
    // into any coarser grouping without rescanning raw data
    val lgK = 12
    val direct = new ThetaAgg(lgK)
    var whole = direct.zero
    (0L until 60000L).foreach(v => whole = direct.reduce(whole, v))
    val parts = (0 until 6).map { p =>
      var b = direct.zero
      (p * 10000L until (p + 1) * 10000L).foreach(v => b = direct.reduce(b, v))
      direct.finish(b)
    }
    val u = new graft.functions.ThetaUnionAgg(lgK)
    var buf = u.zero
    buf = u.reduce(buf, null) // absent epoch tolerated, KllUnionAgg contract
    buf = u.reduce(buf, Array.emptyByteArray)
    parts.foreach(bytes => buf = u.reduce(buf, bytes))
    val est = org.apache.datasketches.theta.CompactSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(u.finish(buf))).getEstimate
    val want = org.apache.datasketches.theta.CompactSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(direct.finish(whole)))
      .getEstimate
    // both estimate the same 60k-key set; each carries ~1.6% RSE at
    // lgK=12, so 5% separates agreement from a lost part cleanly
    assert(math.abs(est - want) / want < 0.05, s"union $est vs direct $want")
    assert(math.abs(est - 60000.0) / 60000.0 < 0.05, s"estimate $est")
  }

  test("KllUnionAgg skips NULL / empty cells instead of failing the rollup") {
    val k = 200
    val mk = (vals: Seq[Double]) => {
      val s = KllDoublesSketch.newHeapInstance(k)
      vals.foreach(s.update); s.toByteArray
    }
    val agg = new KllUnionAgg(k)
    var buf = agg.zero
    buf = agg.reduce(buf, mk(Seq(1.0, 2.0, 3.0)))
    buf = agg.reduce(buf, null)
    buf = agg.reduce(buf, Array.emptyByteArray)
    buf = agg.reduce(buf, mk(Seq(4.0, 5.0)))
    val out = agg.finish(buf)
    val sk = KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(out))
    assert(sk.getN == 5, s"n=${sk.getN} — a bad cell dropped real rows")
    assert(KllQuantiles.quantile(out, 1.0) == 5.0)
  }

  test("KllQuantiles.quantile is NaN for null / empty inputs, not an error") {
    assert(KllQuantiles.quantile(null, 0.5).isNaN)
    assert(KllQuantiles.quantile(Array.emptyByteArray, 0.5).isNaN)
    val empty = KllDoublesSketch.newHeapInstance(200).toByteArray
    assert(KllQuantiles.quantile(empty, 0.5).isNaN)
  }

  // ---- round-11 operators, hand-pinned on tiny frames ----

  import org.apache.spark.sql.functions._

  private def eventsFrame(rows: Seq[(Long, Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("event_id", "user_id", "event_type", "_ts")
      .withColumn("ts", col("_ts").cast("timestamp")).drop("_ts")
      .withColumn("value", lit(1.0))
  }

  test("basketRules: support/confidence/lift by hand on 3 sessions") {
    // user 1: {A,B} then (40 min later) {A,C}; user 2: {A}
    val ev = eventsFrame(Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),
      (2L, 1L, "B", "2024-01-01 00:10:00"),
      (3L, 1L, "A", "2024-01-01 00:50:00"),
      (4L, 1L, "C", "2024-01-01 00:55:00"),
      (5L, 2L, "A", "2024-01-01 00:00:00")))
    val out = graft.operators.JourneyOps.basketRules(ev).collect()
    assert(out.length == 2) // (A,B) and (A,C); B,C never co-occur
    out.foreach { r =>
      assert(r.getString(0) == "A")
      assert(r.getLong(2) == 3L)      // n_a: A in all 3 sessions
      assert(r.getLong(3) == 1L)      // n_b
      assert(r.getLong(4) == 1L)      // n_ab
      assert(r.getLong(5) == 3L)      // n_sessions
      assert(r.getDouble(6) == 0.3333) // support 1/3
      assert(r.getDouble(7) == 0.3333) // confidence a→b 1/3
      assert(r.getDouble(8) == 1.0)    // lift 1·3/(3·1)
    }
    assert(out.map(_.getString(1)).toSeq == Seq("B", "C"))
  }

  test("basketTriples: order-3 support on the same histogram") {
    // sessions {A,B,C}, {A,C}, {A} → only triple (A,B,C), support 1/3
    val ev = eventsFrame(Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),
      (2L, 1L, "B", "2024-01-01 00:05:00"),
      (3L, 1L, "C", "2024-01-01 00:10:00"),
      (4L, 1L, "A", "2024-01-01 01:00:00"),
      (5L, 1L, "C", "2024-01-01 01:05:00"),
      (6L, 2L, "A", "2024-01-01 00:00:00")))
    val out = graft.operators.JourneyOps.basketTriples(ev).collect()
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getString(2)) == (("A", "B", "C")))
    assert(r.getLong(3) == 1L && r.getLong(4) == 3L)
    assert(r.getDouble(5) == 0.3333)
  }

  test("basketRules: a 30-minute gap splits, 29 minutes does not") {
    val ev = eventsFrame(Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),
      (2L, 1L, "B", "2024-01-01 00:29:00"),  // same session
      (3L, 1L, "C", "2024-01-01 00:59:00"))) // ≥30 min after B → new
    val out = graft.operators.JourneyOps.basketRules(ev).collect()
    // sessions {A,B} and {C}: only the (A,B) pair exists
    assert(out.length == 1)
    assert(out.head.getString(0) == "A" && out.head.getString(1) == "B")
    assert(out.head.getLong(5) == 2L)
  }

  test("intervalCoverage: overlap counts once, touching merges, gap splits") {
    val ev = eventsFrame(Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),  // [0, 300s)
      (2L, 1L, "A", "2024-01-01 00:01:00"),  // [60, 360) — overlaps
      (3L, 1L, "A", "2024-01-01 00:20:00"),  // [1200, 1500) — new island
      (4L, 2L, "A", "2024-01-01 00:00:00"),  // [0, 300)
      (5L, 2L, "A", "2024-01-01 00:05:00"))) // [300, 600) — touching: merge
    val out = graft.operators.JourneyOps.intervalCoverage(ev)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((3L, 2L, (360L + 300L) * 1000000L)))
    assert(out(2L) == ((2L, 1L, 600L * 1000000L)))
  }

  test("compactionPlan: first-fit bins by running start offset") {
    import spark.implicits._
    val files = Seq(("g", 1L, 3000L), ("g", 2L, 2000L), ("g", 3L, 1000L),
      ("g", 4L, 5000L), ("h", 1L, 100L))
      .toDF("source", "doc_id", "n_chars")
    val out = graft.operators.LayoutOps
      .compactionPlan(files, "source", "doc_id", "n_chars", 4096L)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // offsets 0, 3000, 5000, 6000 → bins 0, 0, 1, 1
    assert(out(("g", 0L)) == ((2L, 5000L, 1L, 2L)))
    assert(out(("g", 1L)) == ((2L, 6000L, 3L, 4L)))
    assert(out(("h", 0L)) == ((1L, 100L, 1L, 1L)))
  }

  test("bm25 matches the formula computed independently") {
    import spark.implicits._
    val docs = Seq((1L, "hash hash merge sort"), (2L, "hash sort join"),
      (3L, "scan scan scan scan"), (4L, "group order limit"))
      .toDF("doc_id", "text")
    val out = graft.llm.TextOps.bm25(docs, Seq("hash", "merge"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // independent reimplementation of the Lucene-form BM25
    val (k1, b) = (1.2, 0.75)
    val n = 4.0; val avgdl = (4 + 3 + 4 + 3) / 4.0
    def idf(df: Int) = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
    def w(df: Int, tf: Int, dl: Int) =
      idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    def r4(x: Double) = math.rint((x + 1e-9) * 10000) / 10000
    assert(out(1L) == ((r4(w(2, 2, 4) + w(1, 1, 4)), 2L)))
    assert(out(2L) == ((r4(w(2, 1, 3)), 1L)))
    assert(!out.contains(3L) && !out.contains(4L))
    // the two-term doc with the rare term outranks the one-term doc
    assert(out(1L)._1 > out(2L)._1)
  }

  test("sessionPaths: contiguous k-grams per session, multiplicity kept") {
    val ev = eventsFrame(Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),
      (2L, 1L, "B", "2024-01-01 00:01:00"),
      (3L, 1L, "C", "2024-01-01 00:02:00"),
      (4L, 1L, "D", "2024-01-01 00:03:00"),
      (5L, 1L, "A", "2024-01-01 01:00:00"),  // new session
      (6L, 1L, "B", "2024-01-01 01:01:00"),
      (7L, 1L, "C", "2024-01-01 01:02:00"),
      (8L, 2L, "A", "2024-01-01 00:00:00"))) // too short for a 3-gram
    val out = graft.operators.JourneyOps.sessionPaths(ev)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("A B C" -> 2L, "B C D" -> 1L))
  }

  test("snapshotDiff: added/removed/changed/unchanged + per-column counts") {
    import spark.implicits._
    val a = Seq((1L, Some(10.0), "x"), (2L, Some(20.0), "x"),
      (3L, Some(30.0), "x"), (4L, Some(40.0), "x"))
      .toDF("k", "v", "s")
    val b = Seq((1L, Some(10.0), "x"),        // unchanged
      (2L, Some(99.0), "y"),                  // both columns changed
      (4L, Option.empty[Double], "x"),        // v → NULL: a change
      (5L, Some(50.0), "x"))                  // added; 3 removed
      .toDF("k", "v", "s")
    val out = graft.operators.QualityOps
      .snapshotDiff(a, b, "k", Seq("v", "s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("added" -> 1L, "removed" -> 1L, "changed" -> 2L,
      "unchanged" -> 1L, "col_v" -> 2L, "col_s" -> 1L))
  }

  test("null event times and types don't shift sessions or denominators") {
    import spark.implicits._
    // user 1: one session of A+B plus a null-ts row (dropped) and a
    // null-type event (counts toward the session denominator, never
    // pairs); a null-USER row drops entirely (r11 ADVICE:
    // count_distinct denominators skip NULL tuples while groupBy
    // numerators keep them — sessionized filters the row so both
    // engines agree by construction)
    val ev = Seq(
      (1L, Some(1L), "A", Some("2024-01-01 00:00:00")),
      (2L, Some(1L), "B", Some("2024-01-01 00:05:00")),
      (3L, Some(1L), "A", None),
      (4L, Some(2L), null.asInstanceOf[String], Some("2024-01-01 00:00:00")),
      (5L, None, "A", Some("2024-01-01 00:00:00")),
      (6L, None, "B", Some("2024-01-01 00:01:00")))
      .toDF("event_id", "user_id", "event_type", "_ts")
      .withColumn("ts", col("_ts").cast("timestamp")).drop("_ts")
    val rules = graft.operators.JourneyOps.basketRules(ev).collect()
    assert(rules.length == 1)
    // user 2's null-type session still counts in n_sessions → support
    // 1/2; the anonymous A+B events form NO session (else n_ab would be
    // 2 and the denominator ambiguous between engines)
    assert(rules.head.getLong(4) == 1L)
    assert(rules.head.getLong(5) == 2L)
    assert(rules.head.getDouble(6) == 0.5)
    // q79 keeps the NULL-user group (plain groupBy on both engines — no
    // count_distinct denominator to disagree with)
    val cov = graft.operators.JourneyOps.intervalCoverage(ev)
      .collect().filterNot(_.isNullAt(0))
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cov(1L) == 2L) // the null-ts event opens no interval
  }

  test("joinCardinality: exact join size and skew profile by hand") {
    import spark.implicits._
    val a = Seq(1L, 1L, 2L, 3L).toDF("ka")
    val b = Seq(1L, 2L, 2L, 4L).toDF("kb")
    val r = graft.operators.StatsOps.joinCardinality(a, b, "ka", "kb")
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L) // n_a, keys_a
    assert(r.getLong(2) == 4L && r.getLong(3) == 3L) // n_b, keys_b
    assert(r.getLong(4) == 2L)                       // keys_common {1,2}
    assert(r.getLong(5) == 4L)                       // 2·1 + 1·2
    assert(r.getLong(6) == 2L)                       // hottest key contrib
    assert(r.getDouble(7) == 0.5)                    // 4 / (4+4)
    // cross-check against the actually-executed join
    val real = a.join(b, col("ka") === col("kb")).count()
    assert(real == r.getLong(5))
  }

  test("linearFit: exact line recovered, noise lowers r2, nulls skipped") {
    import spark.implicits._
    val df = Seq(
      ("a", Some(1.0), Some(3.0)), ("a", Some(2.0), Some(5.0)),
      ("a", Some(3.0), Some(7.0)), ("a", None, Some(9.0)),
      ("b", Some(1.0), Some(1.0)), ("b", Some(2.0), Some(3.0)),
      ("b", Some(3.0), Some(2.0)))
      .toDF("g", "x", "y")
    val out = graft.operators.StatsOps.linearFit(df, "g", "x", "y")
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("a") == ((2.0, 1.0, 1.0, 3L))) // y = 2x + 1 exactly; null x skipped
    assert(out("b")._4 == 3L)
    assert(out("b")._3 < 1.0) // noisy group: r2 strictly below 1
  }

  test("keySkewAudit: shares and skew scalars by hand") {
    import spark.implicits._
    val df = Seq("a", "a", "a", "a", "b", "b", "c", "d")
      .toDF("user_id")
    val out = graft.operators.StatsOps.keySkewAudit(df, "user_id", topN = 2)
      .collect()
    assert(out.map(_.getString(1)).toSeq == Seq("a", "b"))
    assert(out.head.getLong(2) == 4L)
    assert(out.head.getDouble(3) == 0.5)        // share 4/8
    assert(out.head.getDouble(4) == 2.0)        // max 4 / avg 2
    // counts (1,1,2,4): p50 = 1.5, p99 = 2 + 0.97·2 = 3.94
    assert(out.head.getDouble(5) == math.rint((3.94 / 1.5 + 1e-9) * 10000) / 10000)
  }
}
