package graft

import graft.llm.TextOps

/** Round-15 additions, second batch: DSIR importance selection, the
  * curriculum scheduler, and the per-language vocabulary audit — all on
  * hand-built corpora where every expected value is derivable by
  * inspection. The registry rows prove oracle equivalence on real data;
  * these pin the SEMANTICS. */
class Round15bOpsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------------- q141
  test("dsirImportance: target-like docs are selected, background is not") {
    // Target source speaks only {alpha, beta}; background speaks only
    // {gamma, delta} — except one background doc written in the target
    // vocabulary. Selection is centered at the corpus mean log-weight,
    // so the target docs and the target-like infiltrator must clear it
    // and the pure-background docs must not.
    val docs = (
      (1 to 4).map(i => (i.toLong, "alpha beta alpha beta alpha", "en", "tgt")) ++
        (5 to 12).map(i => (i.toLong, "gamma delta gamma delta gamma", "en", "bg")) ++
        Seq((13L, "alpha beta alpha beta alpha", "en", "bg")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = TextOps.dsirImportance(docs, targetSource = "tgt")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val (nTgt, meanTgt, selTgt) = out("tgt")
    val (nBg, meanBg, selBg) = out("bg")
    assert(nTgt == 4 && nBg == 9)
    // every target doc is more target-like than the corpus mean
    assert(selTgt == 4L, s"tgt selected: $selTgt")
    // exactly the infiltrator crosses the mean from the background side
    assert(selBg == 1L, s"bg selected: $selBg")
    assert(meanTgt > meanBg, s"mean order: $meanTgt vs $meanBg")
  }

  test("dsirScoreWithModel: stored-model scoring matches the batch path " +
      "and prices unseen features by the sentinel") {
    val docs = (
      (1 to 4).map(i => (i.toLong, "alpha beta alpha", "en", "tgt")) ++
        (5 to 10).map(i => (i.toLong, "gamma delta gamma", "en", "bg")))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val model = TextOps.dsirWeightTable(docs, targetSource = "tgt")
    // batch per-doc score: recompute the weighted histogram sum by hand
    // from the model (the same contraction dsirImportance aggregates)
    val scored = TextOps.dsirScoreWithModel(docs, model)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scored.size == 10)
    // identical texts score identically; tgt text outscores bg text
    assert((1 to 4).map(i => scored(i.toLong)).distinct.size == 1)
    assert((5 to 10).map(i => scored(i.toLong)).distinct.size == 1)
    assert(scored(1L) > scored(5L))
    // a doc written entirely in NEVER-SEEN vocabulary scores exactly
    // n_tokens x the sentinel weight
    val unseen = Seq((99L, "zzq zzr zzs", "en", "bg"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val sentinel = model.filter($"b" === -1L).collect().head.getDouble(1)
    val u = TextOps.dsirScoreWithModel(unseen, model).collect().head
    assert(math.abs(u.getDouble(2) - 3 * sentinel) < 1e-9,
      s"unseen: ${u.getDouble(2)} vs ${3 * sentinel}")
  }

  // --------------------------------------------------------------- q142
  test("curriculumSchedule: equal stages in quality order with token sums") {
    // identical text (constant stopword/alpha ratios) with n_chars
    // climbing 50..500 — the quality order IS the n_chars order, so
    // 10 docs over 5 stages pair up (1,2),(3,4),... by length
    val docs = (1 to 10).map(i =>
      (i.toLong, "alpha beta gamma delta", "en", "s", i * 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.curriculumSchedule(docs, stages = 5).collect()
    assert(out.length == 5)
    assert(out.map(_.getLong(0)).toSeq == (1L to 5L))
    assert(out.forall(_.getLong(1) == 2L)) // n_docs per stage
    // 4 whitespace tokens per doc, 2 docs per stage
    assert(out.forall(_.getLong(4) == 8L))
    // stages are quality-ordered and non-overlapping
    val (mins, maxs) = (out.map(_.getDouble(2)), out.map(_.getDouble(3)))
    assert(mins.zip(maxs).forall { case (mn, mx) => mn <= mx })
    assert(maxs.init.zip(mins.tail).forall { case (hi, lo) => hi <= lo },
      s"stage ranges overlap: ${mins.toSeq} / ${maxs.toSeq}")
  }

  // --------------------------------------------------------------- q144
  test("heapsLaw: an all-new-types corpus fits V = N exactly") {
    // every doc contributes 8 tokens, all globally unique -> cum_v ==
    // cum_n at every checkpoint, so the log-log OLS must return
    // beta = 1, K = 1, R^2 = 1 exactly (x and y are the same doubles)
    val docs = (0 until 16).map { i =>
      (i.toLong, (0 until 8).map(j => s"t${i}x$j").mkString(" "), "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = TextOps.heapsLaw(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) >= 4, s"n_points: ${r.getLong(0)}")
    assert(r.getDouble(1) == 1.0, s"beta: ${r.getDouble(1)}")
    assert(r.getDouble(2) == 1.0, s"k: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.0, s"r2: ${r.getDouble(3)}")
  }

  test("heapsLaw: a saturating vocabulary fits beta well below 1") {
    // 64 docs over a CLOSED 12-word vocabulary: growth stops after the
    // first docs, so the fitted exponent must be far below linear
    val vocab = (0 until 12).map(i => s"w$i")
    val docs = (0 until 64).map { i =>
      val text = (0 until 10).map(j => vocab((i * 3 + j) % 12)).mkString(" ")
      (i.toLong, text, "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val r = TextOps.heapsLaw(docs).collect().head
    assert(r.getDouble(1) < 0.5, s"beta: ${r.getDouble(1)}")
    assert(r.getDouble(1) > 0.0, s"beta: ${r.getDouble(1)}")
  }

  // --------------------------------------------------------------- q145
  test("burstiness: a clumped term scores VMR 3, a uniform one 0") {
    // 'f' once in each of 4 docs: mu=1, E[c^2]=1 -> VMR 0 (Poisson-flat
    // floor); 'b' 4 times in one doc: mu=1, E[c^2]=4 -> VMR 3
    val docs = Seq(
      (1L, "f b b b b", "en", "s"),
      (2L, "f", "en", "s"),
      (3L, "f", "en", "s"),
      (4L, "f", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = TextOps.burstiness(docs, minCount = 2, topN = 10).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("b", "f"))
    val b = out(0); val f = out(1)
    assert(b.getLong(1) == 4L && b.getLong(2) == 1L)
    assert(b.getDouble(3) == 1.0 && b.getDouble(4) == 3.0)
    assert(f.getLong(1) == 4L && f.getLong(2) == 4L)
    assert(f.getDouble(3) == 1.0 && f.getDouble(4) == 0.0)
  }

  // --------------------------------------------------------------- q146
  test("sourceDivergence: identical sources score 0, disjoint pairs are absent") {
    // A and B share the exact distribution over {xx,yy} -> JS 0; C
    // speaks a disjoint vocabulary -> no shared bucket with A or B, so
    // those pairs (JS = ln 2 exactly) produce no row by design
    val docs = Seq(
      (1L, "xx yy xx", "en", "A"), (2L, "xx yy xx", "en", "B"),
      (3L, "zz ww", "en", "C"), (4L, "xx xx yy", "en", "A"),
      (5L, "xx xx yy", "en", "B"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = TextOps.sourceDivergence(docs).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "A" && r.getString(1) == "B")
    assert(r.getLong(2) == 2L, s"n_shared: ${r.getLong(2)}")
    assert(r.getDouble(3) == 0.0, s"js: ${r.getDouble(3)}")
  }

  test("sourceDivergence: a skewed source diverges more than a near one") {
    // D is a mild tilt of A's distribution, E a hard tilt -> JS(A,D) <
    // JS(A,E), and the most-similar pair sorts first
    val mk = (id: Long, words: Seq[String], src: String) =>
      (id, words.mkString(" "), "en", src)
    val docs = Seq(
      mk(1L, Seq.fill(8)("xx") ++ Seq.fill(8)("yy"), "A"),
      mk(2L, Seq.fill(9)("xx") ++ Seq.fill(7)("yy"), "D"),
      mk(3L, Seq.fill(15)("xx") ++ Seq.fill(1)("yy"), "E"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val js = TextOps.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(js(("A", "D")) < js(("A", "E")),
      s"JS order: ${js(("A", "D"))} vs ${js(("A", "E"))}")
    assert(js.values.forall(v => v >= 0.0 && v <= math.log(2.0) + 1e-6))
  }

  // --------------------------------------------------------------- q147
  test("spectralAudit: a planted dominant direction explains all variance") {
    // mean-zero vectors living on axis 1 only -> C = diag(2.5, 0, 0, 0):
    // trace 2.5, lambda1 2.5, explained 1.0, all exact
    val em = Seq(
      (1L, Array(1.0f, 0f, 0f, 0f), 0),
      (2L, Array(-1.0f, 0f, 0f, 0f), 0),
      (3L, Array(2.0f, 0f, 0f, 0f), 0),
      (4L, Array(-2.0f, 0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = graft.llm.SimilarityOps.spectralAudit(em).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 4L)
    assert(r.getDouble(2) == 2.5, s"trace: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 2.5, s"lambda1: ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"explained: ${r.getDouble(4)}")
  }

  test("spectralAudit: two equal directions split the variance evenly") {
    // C = diag(0.5, 0.5, 0, 0): the tied-top-eigenvalue case power
    // iteration cannot separate — the Rayleigh quotient still reads the
    // shared eigenvalue exactly (the ones start vector stays in-plane)
    val em = Seq(
      (1L, Array(1.0f, 0f, 0f, 0f), 0),
      (2L, Array(-1.0f, 0f, 0f, 0f), 0),
      (3L, Array(0f, 1.0f, 0f, 0f), 0),
      (4L, Array(0f, -1.0f, 0f, 0f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = graft.llm.SimilarityOps.spectralAudit(em).collect().head
    assert(r.getDouble(2) == 1.0, s"trace: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.5, s"lambda1: ${r.getDouble(3)}")
    assert(r.getDouble(4) == 0.5, s"explained: ${r.getDouble(4)}")
  }

  // --------------------------------------------------------------- q148
  test("bootstrapCi: a constant corpus collapses the interval; more data " +
      "narrows it") {
    def corpus(n: Int, f: Int => String): org.apache.spark.sql.DataFrame =
      (1 to n).map(i => (i.toLong, f(i), "en", "s"))
        .toDF("doc_id", "text", "lang", "source")
        .withColumn("n_chars",
          org.apache.spark.sql.functions.length($"text"))
    // every replica mean of a constant score IS that score
    val const = TextOps.bootstrapCi(corpus(60, _ => "alpha beta gamma"))
      .collect().head
    assert(const.getLong(0) == 60L)
    assert(const.getDouble(1) == const.getDouble(2) &&
      const.getDouble(2) == const.getDouble(3),
      s"constant corpus must collapse: $const")
    // mixed-score corpora: the 10x corpus's interval must be narrower,
    // and both must bracket their mean
    def mixed(n: Int) = corpus(n, i =>
      if (i % 2 == 0) "alpha beta gamma" else "the a an and or of to in")
    val small = TextOps.bootstrapCi(mixed(80)).collect().head
    val big = TextOps.bootstrapCi(mixed(800)).collect().head
    Seq(small, big).foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(1) &&
        r.getDouble(1) <= r.getDouble(3), s"CI must bracket the mean: $r")
    }
    val wSmall = small.getDouble(3) - small.getDouble(2)
    val wBig = big.getDouble(3) - big.getDouble(2)
    assert(wBig < wSmall, s"width must shrink with N: $wBig vs $wSmall")
    // deterministic weights: a re-run reproduces bit-for-bit
    assert(TextOps.bootstrapCi(mixed(80)).collect().head == small)
  }

  // --------------------------------------------------------------- q149
  test("sessionAnomaly: the session walking a rare transition tops the NLL " +
      "ranking") {
    import java.sql.Timestamp
    def ts(m: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // ten users alternate A/B (the corpus norm); user 99 alternates A/C —
    // its A→C steps carry probability 3/33 while A→B carries 30/33, so
    // its mean NLL must rank first and every normal session ties below
    val rows = (1 to 10).flatMap { u =>
      "ABABABA".zipWithIndex.map { case (c, i) =>
        (u * 100L + i, ts(i), u.toLong, c.toString)
      }
    } ++ "ACACACA".zipWithIndex.map { case (c, i) =>
      (9900L + i, ts(i), 99L, c.toString)
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.operators.JourneyOps.sessionAnomaly(events).collect()
    assert(out.length == 11)
    assert(out.forall(_.getLong(2) == 6L)) // 7 events -> 6 transitions
    val top = out.head
    assert(top.getLong(0) == 99L, s"top: $top")
    val normals = out.tail.map(_.getDouble(3)).distinct
    assert(normals.length == 1, s"normal sessions must tie: ${normals.toSeq}")
    assert(top.getDouble(3) > normals.head * 5,
      s"anomaly margin: ${top.getDouble(3)} vs ${normals.head}")
  }

  // --------------------------------------------------------------- q150
  test("contextWindowPlan: coverage, truncation and padding from hand counts") {
    // token counts 2 / 4 / 8 against a 4-token window: kept 2+4+4 of 14,
    // one of three docs truncates, padding 2 of 12 slot-tokens
    val docs = Seq(
      (1L, "a b", "en", "s"), (2L, "a b c d", "en", "s"),
      (3L, "a b c d e f g h", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = graft.llm.ChunkOps
      .contextWindowPlan(docs, windows = Seq(4)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getInt(0) == 4 && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 0.7143) < 1e-9, s"cov: $r")
    assert(math.abs(r.getDouble(3) - 0.3333) < 1e-9, s"trunc: $r")
    assert(math.abs(r.getDouble(4) - 0.1667) < 1e-9, s"pad: $r")
  }

  // --------------------------------------------------------------- q151
  test("effectiveTokens: a 3-way clique keeps one doc's tokens; distinct " +
      "docs keep all") {
    val docs = Seq(
      // lang aa: three verbatim copies (6 tokens each) -> one keeper
      (1L, "p q r s t u", "aa", "s"),
      (2L, "p q r s t u", "aa", "s"),
      (3L, "p q r s t u", "aa", "s"),
      // lang bb: two unrelated docs (5 tokens each) -> both keep
      (4L, "aa bb cc dd ee", "bb", "s"),
      (5L, "vv ww xx yy zz", "bb", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = graft.llm.DedupOps.effectiveTokens(docs).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("aa", "bb"))
    val aa = out(0); val bb = out(1)
    assert(aa.getLong(1) == 3L && aa.getLong(2) == 1L)
    assert(aa.getLong(3) == 18L && aa.getLong(4) == 6L)
    assert(math.abs(aa.getDouble(5) - 0.3333) < 1e-9, s"aa: $aa")
    assert(bb.getLong(1) == 2L && bb.getLong(2) == 2L)
    assert(bb.getLong(3) == 10L && bb.getLong(4) == 10L)
    assert(bb.getDouble(5) == 1.0, s"bb: $bb")
  }

  // --------------------------------------------------------------- q152
  test("shingleDfHistogram: df bands, pair mass and cap counts by hand") {
    // three docs share one 5-token shingle (df=3 -> band lg=1,
    // pair_mass C(3,2)=3); one doc contributes a unique shingle
    // (df=1 -> band lg=0); cap=2 flags exactly the shared shingle
    val docs = Seq(
      (1L, "p q r s t", "en", "s"),
      (2L, "p q r s t", "en", "s"),
      (3L, "p q r s t", "en", "s"),
      (4L, "aa bb cc dd ee", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length($"text"))
    val out = graft.llm.DedupOps
      .shingleDfHistogram(docs, dfCap = 2).collect()
    val byLg = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(byLg.keySet == Set(0L, 1L), byLg.toString)
    assert(byLg(0L) == ((1L, 1L, 0L, 0L)), byLg.toString)
    assert(byLg(1L) == ((1L, 3L, 3L, 1L)), byLg.toString)
  }

  // --------------------------------------------------------------- q143
  test("vocabAudit: vocab, hapax, TTR and fertility from hand counts") {
    val docs = Seq(
      // lang aa: tokens x,x,y -> vocab 2, hapax 1 (y), ttr 2/3
      //   bpe tokens 3, chars 6 -> fertility 2.0
      (1L, "x x y", "aa", "s", 6L),
      // lang bb over two docs: tokens p,p,q,q -> vocab 2, hapax 0,
      //   ttr 1/2; bpe 4, chars 8 -> fertility 2.0
      (2L, "p q", "bb", "s", 4L),
      (3L, "q p", "bb", "s", 4L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.vocabAudit(docs).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("aa", "bb"))
    val aa = out(0); val bb = out(1)
    assert(aa.getLong(1) == 3L && aa.getLong(2) == 2L && aa.getLong(3) == 1L)
    assert(math.abs(aa.getDouble(4) - 0.6667) < 1e-9)
    assert(math.abs(aa.getDouble(5) - 2.0) < 1e-9)
    assert(bb.getLong(1) == 4L && bb.getLong(2) == 2L && bb.getLong(3) == 0L)
    assert(math.abs(bb.getDouble(4) - 0.5) < 1e-9)
    assert(math.abs(bb.getDouble(5) - 2.0) < 1e-9)
  }
}
