package graft

import org.apache.spark.sql.functions._
import graft.llm.{TakedownOps, TextOps}

/** Round-18 second wave: unlearning parity — the NB negative-delta
  * contract (ClassifyOps) ported to the bigram LM and the DSIR weight
  * model, and the takedown audit's two new model-artifact rows. Every
  * contract is train(A∪B) → unlearn(B) ≡ train(A), checked row for row
  * against a fresh training on A alone. */
class Round18bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def lmDocs(ids: Range, extra: Boolean): Seq[(Long, String, String, String)] =
    ids.map { i =>
      val base = s"alpha beta gamma w$i beta alpha"
      val text = if (extra) s"$base zulu$i yankee" else base
      (i.toLong, text, "en", if (i % 2 == 0) "src0" else "src1")
    }

  // ------------------------------------------------------------- q102

  test("bigram LM unlearning: train(A∪B) → unlearn(B) ≡ train(A) for " +
      "both delta tables, and stored scoring equals the direct path " +
      "on the A-only model") {
    val a = lmDocs(1 to 6, extra = false)
      .toDF("doc_id", "text", "lang", "source")
    // B introduces bigrams AND vocabulary tokens A never saw — the
    // unlearn must shrink V, not just the count table
    val b = lmDocs(7 to 9, extra = true)
      .toDF("doc_id", "text", "lang", "source")
    TextOps.writeBigramLm(a.union(b), "lm18")
    TextOps.unlearnFromBigramLm(b, "lm18")

    val (cntA, vocA) = TextOps.bigramLmFrames(a)
    val netCnt = spark.table("lm18_bigrams")
      .groupBy(col("bgh"), col("w1h")).agg(sum(col("c12")).as("c12"))
      .filter(col("c12") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val wantCnt = cntA.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(netCnt == wantCnt)
    val netVoc = spark.table("lm18_vocab")
      .groupBy(col("th")).agg(sum(col("c")).as("c"))
      .filter(col("c") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantVoc = vocA.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(netVoc == wantVoc)

    // scoring through the unlearned store ≡ scoring under a model
    // trained on A alone (same doubles from same integer inputs)
    val test0 = a.union(b)
    val stored = TextOps.scoreUnderStoredLm(spark, "lm18", test0)
      .collect().toSeq
    val vA = vocA.agg(count(lit(1)).as("v"))
    val direct = TextOps.scoreUnderLm(test0, cntA, vA).collect().toSeq
    assert(stored == direct)

    // append after unlearn keeps working: re-adding B restores A∪B
    TextOps.appendToBigramLm(b, "lm18")
    val (cntAB, _) = TextOps.bigramLmFrames(a.union(b))
    val netCnt2 = spark.table("lm18_bigrams")
      .groupBy(col("bgh"), col("w1h")).agg(sum(col("c12")).as("c12"))
      .filter(col("c12") > 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(netCnt2 == cntAB.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  // ------------------------------------------------------------- q141

  test("DSIR unlearning: train(A∪B) → unlearn(B) ≡ train(A) — the " +
      "served weight table matches a fresh A-only weight table row " +
      "for row, including dropped buckets and the sentinel") {
    def mk(ids: Range, tgt: Boolean, extra: Boolean) = ids.map { i =>
      val base = "red green blue"
      val text = if (extra) s"$base uniq$i" else base
      (i.toLong, text, if (tgt) "tgt" else "bg")
    }
    val a = (mk(1 to 4, tgt = true, extra = false) ++
      mk(5 to 8, tgt = false, extra = false))
      .toDF("doc_id", "text", "source")
    val b = (mk(9 to 10, tgt = true, extra = true) ++
      mk(11 to 12, tgt = false, extra = true))
      .toDF("doc_id", "text", "source")
    TextOps.writeDsirModel(a.union(b), "dsir18", targetSource = "tgt")
    TextOps.unlearnFromDsirModel(b, "dsir18", targetSource = "tgt")

    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val served = rows(TextOps.dsirServeWeights(spark, "dsir18"))
    val direct = rows(TextOps.dsirWeightTable(a, targetSource = "tgt"))
    assert(served == direct,
      s"served weights must equal A-only training:\n$served\nvs\n$direct")
    // B's unique tokens' buckets are gone entirely (net-unobserved)
    val bOnly = rows(TextOps.dsirWeightTable(a.union(b),
      targetSource = "tgt")).map(_._1).toSet
      .diff(direct.map(_._1).toSet)
    assert(bOnly.nonEmpty, "fixture must add B-only buckets")
    assert(served.map(_._1).toSet.intersect(bOnly).isEmpty)

    // the scoring surface agrees end to end through the store
    val scoredServed = TextOps.dsirScoreWithModel(a,
      TextOps.dsirServeWeights(spark, "dsir18")).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    val scoredDirect = TextOps.dsirScoreWithModel(a,
      TextOps.dsirWeightTable(a, targetSource = "tgt")).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(scoredServed == scoredDirect)
  }

  // ------------------------------------------------------------- q162

  test("takedownAudit model arms: bigram_lm / dsir_counts rows count " +
      "net-zero keys — present only when a key is fed SOLELY by the " +
      "taken-down source") {
    // src7 (the takedown source) shares "alpha beta" with src0 but owns
    // "omega psi" outright; only the owned bigram is a removed row
    val docs = Seq(
      (1L, "alpha beta alpha", "en", "src0"),
      (2L, "alpha beta omega psi", "en", "src7"),
      (3L, "omega psi chi", "en", "src7"))
      .toDF("doc_id", "text", "lang", "source")
    val em = Seq((1L, Array(1.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label")
    val out = TakedownOps.takedownAudit(docs, em, "src7").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // bigrams over en docs: d1 {alpha beta, beta alpha}; d2 {alpha
    // beta, beta omega, omega psi}; d3 {omega psi, psi chi}. Total
    // distinct = 5; fed only by src7: beta omega, omega psi, psi chi = 3
    assert(out("bigram_lm") == (5L, 3L), out.toString)
    // dsir: tokens alpha,beta ∈ src0; omega,psi,chi only src7 — bucket
    // collisions are possible in principle but not at 5 tokens / 512
    // buckets with these literals
    assert(out("dsir_counts") == (5L, 3L), out.toString)
    // seed arms: this fixture's em has no CentroidIds rows at all, so
    // both model artifacts report zero seeds (and zero exposure)
    assert(out("ivf_model") == (0L, 0L), out.toString)
    assert(out("pq_codebook") == (0L, 0L), out.toString)
    assert(out.keySet == Set("bigram_lm", "bm25_doclen", "bm25_postings",
      "corpus", "dedup_docn", "dedup_postings", "dsir_counts",
      "embeddings", "ivf_model", "pq_codebook"))
  }

  // ------------------------------------------------------------- q175

  test("htmlExtract: script/style content drops whole, tags become " +
      "separators, entities decode with &amp; LAST (double-escape " +
      "yields literal text), whitespace collapses") {
    import graft.llm.CorpusOps
    val rows = Seq(
      ("<p>a</p><script>var x = '<b>not text</b>';</script><p>b</p>",
        "a b"),
      ("<style>p { color: red; }</style>hello", "hello"),
      ("<div>x<br/>y</div>", "x y"),
      // decode order: &lt; first (literal <), &amp; last — the
      // double-escaped &amp;lt; must come out as the TEXT "&lt;"
      ("1 &lt; 2 &amp; 3 &amp;lt; 4", "1 < 2 & 3 &lt; 4"),
      ("say &quot;hi&quot; it&#39;s a&nbsp;b", "say \"hi\" it's a b"),
      ("  spaced\t\tout \n text  ", "spaced out text"))
      .toDF("html", "want")
    val got = rows.select(CorpusOps.htmlExtract(col("html")).as("got"),
      col("want")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got '${r.getString(0)}' want '${r.getString(1)}'"))
  }
}
