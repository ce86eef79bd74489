package graft

import org.apache.spark.sql.functions._

import graft.llm.{DedupOps, SimilarityOps, TextOps}
import graft.operators.JourneyOps

/** Round-12 second batch on hand-computable fixtures: triangle census
  * over constructed dup graphs, multi-touch attribution journeys,
  * duplicated-span shares, vocabulary coverage, and IVF-blocked kNN
  * label agreement. */
class Round12bOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q96

  test("dupTriangles: identical-doc clique plus an isolated edge") {
    // A,B,C byte-identical (pairwise jaccard 1) → a 3-clique; D,E
    // identical → one edge; F unique (all its shingles df=1 → no pairs)
    val clique = "one two three four five six"
    val pair = "seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, clique, "s"), (2L, clique, "s"), (3L, clique, "s"),
      (4L, pair, "s"), (5L, pair, "s"),
      (6L, "apple banana cherry date elder fig", "s"))
      .toDF("doc_id", "text", "source")
    val r = DedupOps.dupTriangles(docs).collect().head
    assert(r.getLong(0) == 5L, s"n_nodes: $r")     // F never pairs
    assert(r.getLong(1) == 4L, s"n_edges: $r")     // 3 clique + 1 pair
    assert(r.getLong(2) == 3L, s"n_wedges: $r")    // 3 × C(2,2) at A,B,C
    assert(r.getLong(3) == 1L, s"n_triangles: $r")
    assert(math.abs(r.getDouble(4) - 1.0) < 1e-9)  // 3·1/3
    assert(r.getLong(5) == 0L, s"n_capped: $r")
  }

  test("dupTriangles: the degree cap removes hub vertices as a consistent subgraph") {
    // cap 1 excises the 3-clique (every member has degree 2) whole;
    // the D–E edge (degree 1) survives untouched
    val clique = "one two three four five six"
    val pair = "seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, clique, "s"), (2L, clique, "s"), (3L, clique, "s"),
      (4L, pair, "s"), (5L, pair, "s"))
      .toDF("doc_id", "text", "source")
    val r = DedupOps.dupTriangles(docs, maxDegree = 1).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(5)) == ((2L, 1L, 0L, 0L, 3L)), r.toString)
  }

  test("dupTriangles: an open wedge is not a triangle") {
    // B overlaps A and C; A and C share nothing → path A–B–C, no closure.
    // A has shingles {a1,a2}; C has {c1,c2}; B contains both token runs,
    // so jac(A,B) = 2/(2+8-2) = 0.25 — use a 0.2 threshold to admit it.
    val a = "one two three four five six"
    val c = "seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, a, "s"), (3L, c, "s"), (2L, s"$a $c", "s"))
      .toDF("doc_id", "text", "source")
    val r = DedupOps.dupTriangles(docs, threshold = 0.2).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((3L, 2L, 1L, 0L)), r.toString)
    assert(math.abs(r.getDouble(4) - 0.0) < 1e-9)
  }

  // ---------------------------------------------------------------- q97

  test("attribution: first/last/linear credit across two conversions") {
    def ts(min: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(min * 60))
    // user 1: click → view → PURCHASE, then click → PURCHASE
    // user 2: a touch with no conversion ever — dropped
    // user 3: only touch is 4 days before its purchase — outside lookback
    val events = Seq(
      (1L, ts(0), 1L, "click"),
      (2L, ts(10), 1L, "view"),
      (3L, ts(20), 1L, "purchase"),
      (4L, ts(30), 1L, "click"),
      (5L, ts(40), 1L, "purchase"),
      (6L, ts(0), 2L, "view"),
      (7L, ts(0), 3L, "click"),
      (8L, ts(4L * 1440), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = JourneyOps.attribution(events).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // conv1 touches {click, view}: click opens, view closes, ½ each;
    // conv2 touches {click}: all three models give it the whole credit
    assert(out("click") == ((2L, 2L, 1L, 1.5)), out.toString)
    assert(out("view") == ((1L, 0L, 1L, 0.5)), out.toString)
    assert(out.size == 2, out.toString)
  }

  test("attribution: touch at the conversion instant belongs to it") {
    def ts(min: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(min * 60))
    // the view shares the purchase's timestamp but sorts BEFORE it on
    // event_id, so its following-frame still sees the purchase
    val events = Seq(
      (1L, ts(5), 1L, "view"),
      (2L, ts(5), 1L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = JourneyOps.attribution(events).collect()
    assert(out.length == 1 && out.head.getString(0) == "view"
      && out.head.getLong(1) == 1L, out.mkString(","))
  }

  // ---------------------------------------------------------------- q98

  test("dupSpans: position-level duplication with within-corpus repeats") {
    val t = "a b c d e f"          // positions: "a b c d e", "b c d e f"
    val docs = Seq(
      (1L, t, "s1"), (2L, t, "s1"),                // every position dup
      (3L, "g h i j k l", "s2"),                   // all unique
      (4L, "a b c d e x", "s2"),                   // 1 of 2 positions dup
      (5L, "a b", "s2"))                           // < k tokens: unscored
      .toDF("doc_id", "text", "source")
    val out = TextOps.dupSpans(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3), s1.getLong(5)) ==
      ((2L, 4L, 4L, 2L)), s1.toString)
    assert(math.abs(s1.getDouble(4) - 1.0) < 1e-9)
    val s2 = out("s2")
    assert((s2.getLong(1), s2.getLong(2), s2.getLong(3), s2.getLong(5)) ==
      ((2L, 4L, 1L, 0L)), s2.toString)
    assert(math.abs(s2.getDouble(4) - 0.25) < 1e-9)
  }

  // ---------------------------------------------------------------- q99

  test("vocabCoverage: top-V vocab, OOV share, low-coverage docs") {
    val docs = Seq(
      (1L, "a a b c", "s1"),   // OOV: c → rate 1/4, coverage 0.75
      (2L, "a b b d", "s1"),   // OOV: d → rate 1/4, coverage 0.75
      (3L, "a b a b", "s2"))   // fully covered
      .toDF("doc_id", "text", "source")
    // counts: a=5, b=5, c=1, d=1 → top-2 vocab {a, b}
    val out = TextOps.vocabCoverage(docs, vocabSize = 2).collect()
      .map(r => r.getString(0) -> r).toMap
    val s1 = out("s1")
    assert((s1.getLong(1), s1.getLong(2), s1.getLong(3), s1.getLong(5)) ==
      ((2L, 8L, 2L, 2L)), s1.toString)
    assert(math.abs(s1.getDouble(4) - 0.25) < 1e-9)
    val s2 = out("s2")
    assert((s2.getLong(1), s2.getLong(2), s2.getLong(3), s2.getLong(5)) ==
      ((1L, 4L, 0L, 0L)), s2.toString)
  }

  test("vocabCoverage: count ties at the vocab boundary break by token") {
    // c and d both occur once; V=3 keeps {a, b, c} (token order), so d
    // is the only OOV occurrence
    val docs = Seq((1L, "a a b b c d", "s")).toDF("doc_id", "text", "source")
    val r = TextOps.vocabCoverage(docs, vocabSize = 3).collect().head
    assert(r.getLong(3) == 1L, r.toString)
  }

  // --------------------------------------------------------------- q100

  test("knnLabelAgreement: the off-label vector is the suspect") {
    // cluster A around (1,0): three 'x' and one 'y'; cluster B around
    // (0,1): all 'z'. nProbe=1 keeps neighbors within a cluster; k=2
    // top-2 of every A member is pure 'x', so only the 'y' disagrees.
    val em = Seq(
      (0L, Array(1.0f, 0.0f), "x"),
      (1L, Array(0.9f, 0.1f), "x"),
      (2L, Array(1.0f, 0.1f), "x"),
      (3L, Array(0.8f, 0.2f), "y"),
      (10L, Array(0.0f, 1.0f), "z"),
      (11L, Array(0.1f, 0.9f), "z"),
      (12L, Array(0.0f, 0.9f), "z"),
      (13L, Array(0.2f, 0.8f), "z"))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.knnLabelAgreement(em, k = 2, nProbe = 1,
        centroidIds = Seq(0L, 10L), iters = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("x") == ((3L, 1.0, 0L)), out.toString)
    assert(out("y") == ((1L, 0.0, 1L)), out.toString)
    assert(out("z") == ((4L, 1.0, 0L)), out.toString)
  }

  // --------------------------------------------------------------- q101

  test("boilerplateNgrams: df counts docs, occurrences count positions") {
    val t = "a b c d e f"
    val docs = Seq(
      (1L, t, "s"), (2L, t, "s"),
      // "a b c d e" repeats WITHIN doc 3 → df 3 but occurrences 4;
      // doc-3-only grams have df 1 and are filtered by minDf=2
      (3L, "a b c d e x a b c d e x", "s"))
      .toDF("doc_id", "text", "source")
    val out = TextOps.boilerplateNgrams(docs).collect()
    assert(out.length == 2, out.mkString(","))
    val top = out.head
    assert((top.getString(0), top.getLong(1), top.getLong(2)) ==
      (("a b c d e", 3L, 4L)), top.toString)
    assert(math.abs(top.getDouble(3) - 1.0) < 1e-9)
    val snd = out(1)
    assert((snd.getString(0), snd.getLong(1), snd.getLong(2)) ==
      (("b c d e f", 2L, 2L)), snd.toString)
    assert(math.abs(snd.getDouble(3) - 0.6667) < 1e-9)
  }

  // --------------------------------------------------------------- q102

  test("crossEntropyTransfer: reference-trained NLL, unseen floor") {
    val docs = Seq(
      (1L, "a b a b", "en", "s"),  // in-model: nll = -(2·ln(2.5/3)+ln .75)/3
      (2L, "c a", "fr", "s"),      // fully unseen bigram: ln(0.5/V) floor
      (3L, "x", "de", "s"))        // < 2 tokens: unscored, lang absent
      .toDF("doc_id", "text", "lang", "source")
    val out = TextOps.crossEntropyTransfer(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == Set("en", "fr"), out.toString)
    assert(out("en")._1 == 1L)
    assert(math.abs(out("en")._2 - 0.2174) < 1e-9, out.toString)
    // c12=0, c1=0, V=2 → lp = ln(0.5/(0.5·2)) = ln 0.5
    assert(math.abs(out("fr")._2 - 0.6931) < 1e-9, out.toString)
  }

  test("crossEntropyTransfer: stored-model scoring equals the direct path") {
    val docs = Seq(
      (1L, "a b a b c a", "en", "s"), (2L, "b a c a", "en", "s"),
      (3L, "c a b x", "fr", "s"), (4L, "x y z w", "de", "s"))
      .toDF("doc_id", "text", "lang", "source")
    TextOps.writeBigramLm(docs, "lm_ref")
    val stored = TextOps.scoreUnderStoredLm(spark, "lm_ref", docs)
    val direct = TextOps.crossEntropyTransfer(docs)
    assert(stored.collect().toSeq == direct.collect().toSeq)
    // the stored path reads the model from the catalog tables, not a
    // re-derivation of the reference slice
    val plan = stored.queryExecution.executedPlan.toString
    assert(plan.contains("lm_ref_bigrams"),
      s"stored-model plan must scan the persisted count table:\n$plan")
  }

  // --------------------------------------------------------------- q103

  test("segmentedDrift: total shift vs identical halves, per segment") {
    val df = Seq(
      // segment A: ref mass all in bucket 0, cur mass all in bucket 1
      ("A", 1.0, 1), ("A", 1.0, 1), ("A", 1.0, 1),
      ("A", 9.0, 0), ("A", 9.0, 0), ("A", 9.0, 0),
      // segment B: ref and cur identical
      ("B", 1.0, 1), ("B", 9.0, 1), ("B", 1.0, 0), ("B", 9.0, 0))
      .toDF("seg", "v", "is_ref")
    val out = graft.operators.ProfileOps.segmentedDrift(df, "v", "seg",
        refPred = col("is_ref") === 1, curPred = col("is_ref") === 0,
        lo = 0.0, hi = 10.0, k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // per bucket: (0.125−0.875)·ln(1/7), twice → 2·0.75·ln 7
    assert(out("A")._1 == 3L && out("A")._2 == 3L)
    assert(math.abs(out("A")._3 - 2.918865) < 1e-9, out.toString)
    assert(out("B") == ((2L, 2L, 0.0)), out.toString)
  }

  // --------------------------------------------------------------- q104

  test("mahalanobisOutliers: diagonal-covariance distances and the gate") {
    val em = Seq(
      (0L, Array(0.0f, 0.0f), "x"),
      (1L, Array(2.0f, 0.0f), "x"),
      (2L, Array(0.0f, 0.0f), "x"),
      (3L, Array(6.0f, 0.0f), "x"),  // d² = 16/6 — the only gate trip
      (10L, Array(5.0f, 5.0f), "y")) // singleton: var 0, d² 0
      .toDF("vec_id", "embedding", "label")
    // label x: μ=(2,0), σ²=(6,0) → d² = {4/6, 0, 4/6, 16/6}, avg 1
    val out = graft.llm.SimilarityOps.mahalanobisOutliers(em,
        threshold = 2.0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    assert(out("x")._1 == 4L)
    assert(math.abs(out("x")._2 - 1.0) < 1e-9, out.toString)
    assert(math.abs(out("x")._3 - 2.6667) < 1e-9, out.toString)
    assert(out("x")._4 == 1L, out.toString)
    assert(out("y") == ((1L, 0.0, 0.0, 0L)), out.toString)
  }

  // --------------------------------------------------------------- q105

  test("noveltyRate: first corpus occurrence wins, by ingest order") {
    val docs = Seq(
      (1L, "one two three four five six", "a"),   // both shingles novel
      (2L, "one two three four five six", "b"),   // all seen in doc 1
      (3L, "one two three four five seven", "b")) // 1 of 2 novel
      .toDF("doc_id", "text", "source")
    val out = graft.llm.DedupOps.noveltyRate(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out("a") == ((1L, 2L, 2L, 1.0)), out.toString)
    assert(out("b") == ((2L, 4L, 1L, 0.25)), out.toString)
  }

  // --------------------------------------------------------------- q106

  test("disorderAudit: lateness against the running high-water mark") {
    def ts(min: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(min * 60))
    // arrival order 1..5; high-water after each: 10, 10, 20, 20, 20.
    // e2 is 5 min late, e4 ties the mark exactly (NOT late), e5 is 12
    // min late. buckets=2 splits arrivals {1,2,3} / {4,5}, so e5's
    // lateness is only visible through the cross-bucket prefix patch.
    val events = Seq(
      (1L, ts(10), "A"), (2L, ts(5), "A"), (3L, ts(20), "B"),
      (4L, ts(20), "B"), (5L, ts(8), "A"))
      .toDF("event_id", "ts", "event_type")
    val out = graft.operators.StatsOps.disorderAudit(events, buckets = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val a = out("A")
    assert((a.getLong(1), a.getLong(2)) == ((3L, 2L)), a.toString)
    assert(math.abs(a.getDouble(3) - 0.6667) < 1e-9, a.toString)
    assert(math.abs(a.getDouble(4) - 510.0) < 1e-9, a.toString)
    assert(math.abs(a.getDouble(5) - 720.0) < 1e-9, a.toString)
    val b = out("B")
    assert((b.getLong(1), b.getLong(2)) == ((2L, 0L)), b.toString)
    assert(math.abs(b.getDouble(3) - 0.0) < 1e-9, b.toString)
    assert(b.isNullAt(4), s"no late events → avg lateness is null: $b")
    assert(math.abs(b.getDouble(5) - 0.0) < 1e-9, b.toString)
  }

  // --------------------------------------------------------------- q107

  test("q107: only the sole late supplier of a multi-supplier order waits") {
    def ts(day: Int) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(day * 86400L))
    val orders = Seq((1L, ts(0)), (2L, ts(0)), (3L, ts(0)), (4L, ts(0)))
      .toDF("o_orderkey", "o_orderdate")
    val lineitem = Seq(
      (1L, 1L, ts(100)), (1L, 2L, ts(10)),   // S1 alone late → counts
      (2L, 1L, ts(100)), (2L, 2L, ts(100)),  // both late → neither counts
      (3L, 1L, ts(100)),                     // single-supplier → no
      (4L, 2L, ts(100)), (4L, 3L, ts(10)))   // S2 alone late → counts
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val supplier = Seq((1L, "S1"), (2L, "S2"), (3L, "S3"))
      .toDF("s_suppkey", "s_name")
    val out = graft.operators.RelationalQueries
      .q107WaitingSupplier(lineitem, orders, supplier)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq(("S1", 1L), ("S2", 1L)), out.toString)
  }

  // --------------------------------------------------------------- q108

  test("q108: the zero-order bucket exists only through the left join") {
    val customer = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val out = graft.operators.RelationalQueries
      .q108CustOrderDist(customer, orders)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 2L), (3L, 1L), (1L, 1L)), out.toString)
  }

  // --------------------------------------------------------------- q109

  test("q109: above-average balance and no RECENT order, per nation") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    // positive-balance avg = (150+50+200)/3 ≈ 133.3; above: C1, C3.
    // C1 ordered recently → excluded; C3's only order predates the
    // cutoff → dormant; C4's negative balance is outside the average
    val customer = Seq(
      (1L, 1, 150.0), (2L, 1, 50.0), (3L, 2, 200.0), (4L, 2, -30.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq(
      (10L, 1L, ts("2001-05-01")), (11L, 3L, ts("1996-03-01")))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
    val nation = Seq((1, "N1"), (2, "N2")).toDF("n_nationkey", "n_name")
    val out = graft.operators.RelationalQueries
      .q109DormantCustomers(customer, orders, nation)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("N2", 1L, 200.0)), out.mkString(","))
  }

  // --------------------------------------------------------------- q110

  test("kAnonymityAudit: small groups and low-diversity groups both flag") {
    val df = Seq(
      ("A", Some(1)), ("A", Some(1)), ("A", Some(2)),
      ("A", Some(2)), ("A", Some(3)), ("A", Some(3)),
      ("B", Some(5)), ("B", Some(5)),           // sz 2 < k; ndist 1 < l
      ("C", Some(1)), ("C", Some(2)), ("C", Some(3)),
      ("C", Some(4)), ("C", None))              // null sensitive: no vote
      .toDF("g", "s")
    val r = graft.operators.QualityOps.kAnonymityAudit(df, Seq("g"), col("s"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((13L, 3L, 2L)),
      r.toString)
    assert((r.getLong(3), r.getLong(4)) == ((1L, 2L)), r.toString)
    assert(math.abs(r.getDouble(5) - 0.1538) < 1e-9, r.toString)
    assert(r.getLong(6) == 1L, r.toString)
    // diversities 3, 1, 4 → mean 8/3
    assert(math.abs(r.getDouble(7) - 2.6667) < 1e-9, r.toString)
  }

  // --------------------------------------------------------------- q111

  test("sessionStats: entry channel, bounce, depth, dwell") {
    def ts(min: Long) = java.sql.Timestamp.from(
      java.time.Instant.ofEpochSecond(min * 60))
    val events = Seq(
      (1L, ts(0), 1L, "view"),    // u1 s1: view → click (dwell 600 s)
      (2L, ts(10), 1L, "click"),
      (3L, ts(60), 1L, "click"),  // u1 s2: bounce (gap ≥ 30 min)
      (4L, ts(0), 2L, "view"))    // u2 s1: bounce
      .toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.JourneyOps.sessionStats(events)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out("view") == ((2L, 0.5, 1.5, 300.0)), out.toString)
    assert(out("click") == ((1L, 1.0, 1.0, 0.0)), out.toString)
  }

  // --------------------------------------------------------------- q112

  test("langConfusion: claimed lang crossed with the marker predictor") {
    val docs = Seq(
      (1L, "the cat is black and white", "en", "s"), // en → en
      (2L, "the dog was that good", "en", "s"),      // en → en
      (3L, "the final report", "fr", "s"),           // fr claimed, en text
      (4L, "zzz qqq xxx", "de", "s"))                // no markers → und
      .toDF("doc_id", "text", "lang", "source")
    val out = graft.llm.TextOps.langConfusion(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(out(("en", "en")) == ((2L, 1.0)), out.toString)
    assert(out(("fr", "en")) == ((1L, 1.0)), out.toString)
    assert(out(("de", "und")) == ((1L, 1.0)), out.toString)
    assert(out.size == 3, out.toString)
  }

  // ----------------------------------------------- adversarial batches

  test("disorderAudit: bucket-count invariance + in-memory reference on shuffled data") {
    // the distributed prefix-max patch must give THE answer, not an
    // answer-per-partitioning: any bucket count, including the
    // degenerate single bucket, agrees with a sequential reference
    val rnd = new scala.util.Random(7)
    val events = (1L to 300L).map { id =>
      (id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        rnd.nextInt(600000).toLong)), s"t${id % 3}")
    }
    val df = events.toDF("event_id", "ts", "event_type")
    def run(buckets: Int) = graft.operators.StatsOps
      .disorderAudit(df, buckets).collect().toSeq
    val canonical = run(32)
    assert(run(1) == canonical, "single-bucket degenerate case diverged")
    assert(run(7) == canonical, "odd bucket count diverged")

    // sequential reference: running max over arrival order
    def r2(x: Double) = BigDecimal(x + 1e-9)
      .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x + 1e-9)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    var mx = Long.MinValue
    val late = events.sortBy(_._1).map { case (_, ts, tp) =>
      val us = ts.toInstant.getEpochSecond * 1000000L
      val l = if (mx > us) mx - us else 0L
      mx = math.max(mx, us)
      tp -> l
    }
    val expected = late.groupBy(_._1).map { case (tp, xs) =>
      val ls = xs.map(_._2)
      val lateOnly = ls.filter(_ > 0)
      tp -> (ls.size.toLong, lateOnly.size.toLong,
        r4(lateOnly.size.toDouble / ls.size),
        if (lateOnly.isEmpty) null
        else r2(lateOnly.map(_ / 1e6).sum / lateOnly.size): Any,
        r2(ls.max / 1e6))
    }
    val got = canonical.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3),
        (if (r.isNullAt(4)) null else r.getDouble(4)): Any,
        r.getDouble(5))).toMap
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("attribution: credit conservation on a random journey batch") {
    // every conversion with >= 1 in-window touch hands out exactly one
    // first-touch, one last-touch, and a linear total of 1.0 — summed
    // over channels these must agree with each other
    val rnd = new scala.util.Random(11)
    val events = (1L to 400L).map { id =>
      val tp = rnd.nextInt(10) match {
        case 0 | 1 => "purchase"
        case 2 | 3 | 4 => "view"
        case _ => "click"
      }
      (id, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        rnd.nextInt(500000).toLong)), (id % 17) + 1L, tp)
    }
    val out = graft.operators.JourneyOps
      .attribution(events.toDF("event_id", "ts", "user_id", "event_type"))
      .collect()
    val first = out.map(_.getLong(2)).sum
    val last = out.map(_.getLong(3)).sum
    val linear = out.map(_.getDouble(4)).sum
    assert(first == last, s"first $first != last $last")
    assert(first > 0, "fixture must produce conversions with touches")
    assert(math.abs(linear - first) < 1e-3 * out.length,
      s"linear credit $linear must sum to the conversion count $first")
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1),
        r.toString)
    }
  }

  test("knnLabelAgreement: clusters smaller than k still score") {
    // one two-member cluster: each member's only neighbor is the other
    val em = Seq(
      (0L, Array(1.0f, 0.0f), "x"),
      (1L, Array(0.9f, 0.1f), "y"),
      (10L, Array(0.0f, 1.0f), "z"),
      (11L, Array(0.1f, 0.9f), "z"))
      .toDF("vec_id", "embedding", "label")
    val out = SimilarityOps.knnLabelAgreement(em, k = 5, nProbe = 1,
        centroidIds = Seq(0L, 10L), iters = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    // x's single neighbor is y (agree 0), z's single neighbor is z
    assert(out("x") == ((1L, 0.0, 1L)), out.toString)
    assert(out("y") == ((1L, 0.0, 1L)), out.toString)
    assert(out("z") == ((2L, 1.0, 0L)), out.toString)
  }
}
