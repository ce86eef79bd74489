package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.llm.{ClassifyOps, DedupOps, SimilarityOps, TakedownOps, TextOps}

/** Round-17 second wave: the NB classifier lifecycle (train → persist →
  * score → append → EXACT unlearn), takedown propagation across the
  * persisted serve indexes (tombstone → serve ≡ rebuild-without →
  * compact), and hybrid RRF fusion semantics. Hand-built fixtures where
  * every expected value is derivable by inspection; the registry rows
  * prove oracle equivalence on real data, these pin the SEMANTICS and
  * the persisted-path contracts the oracles can't see. */
class Round17bOpsSpec extends SparkSpec {
  import spark.implicits._

  private def variant(changes: Set[Int]): String =
    (1 to 100).map(i =>
      if (changes.contains(i)) s"X$i" else s"w$i").mkString(" ")

  // ------------------------------------------------------------- q161

  test("nbScoreFrom: add-one smoothing algebra and the deterministic " +
      "(score DESC, class ASC) tie-break, OOV tokens skipped") {
    val train = Seq((1L, "x x x", "a"), (2L, "y y y", "b"))
      .toDF("doc_id", "text", "lang")
    val (tc, cs) = ClassifyOps.nbTrainFrames(train)
    // "x z x": z is OOV (skipped), two x hits → class a wins on counts
    // "x y":   symmetric counts and equal priors → exact score tie →
    //          class ASC tie-break must pick "a"
    val test0 = Seq((10L, "x z x", "a"), (11L, "x y", "b"))
      .toDF("doc_id", "text", "lang")
    val got = ClassifyOps.nbScoreFrom(tc, cs, test0).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3))).toSet
    assert(got == Set((10L, "a", 2L), (11L, "a", 2L)), got.toString)
  }

  test("NB model lifecycle: stored ≡ direct, append ≡ retrain, unlearn " +
      "is EXACT (train(A∪B) then unlearn(B) scores like train(A))") {
    val docs = Tables.documents(spark, sf0001)
    val a = docs.filter(col("doc_id") < 20)
    val b = docs.filter(col("doc_id") >= 20 && col("doc_id") < 40)
    val test0 = docs.filter(col("doc_id") >= 40)
    def scores(tc: org.apache.spark.sql.DataFrame,
        cs: org.apache.spark.sql.DataFrame) =
      ClassifyOps.nbScoreFrom(tc, cs, test0).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toSet
    val (tcAB, csAB) = ClassifyOps.nbTrainFrames(a.unionByName(b))
    val direct = scores(tcAB, csAB)

    ClassifyOps.writeNbModel(a.unionByName(b), "nb17")
    val stored = scores(spark.table("nb17_tokcounts"),
      spark.table("nb17_class"))
    assert(stored == direct, "stored model must score like the direct fit")

    ClassifyOps.writeNbModel(a, "nb17a")
    ClassifyOps.appendToNbModel(b, "nb17a")
    val appended = scores(spark.table("nb17a_tokcounts"),
      spark.table("nb17a_class"))
    assert(appended == direct, "append must equal a from-scratch retrain")

    ClassifyOps.unlearnFromNbModel(b, "nb17")
    val unlearned = scores(spark.table("nb17_tokcounts"),
      spark.table("nb17_class"))
    val (tcA, csA) = ClassifyOps.nbTrainFrames(a)
    val directA = scores(tcA, csA)
    assert(unlearned == directA,
      "unlearn(B) must restore train(A)'s scores exactly")
    assert(unlearned != direct,
      "fixture must actually change predictions when B leaves")
  }

  // ------------------------------------------------------------- q162

  test("BM25 takedown: tombstoned docs vanish from serve, scores equal " +
      "an index rebuilt without them, before and after compaction; " +
      "replayed takedown is a no-op") {
    val docs = Tables.documents(spark, sf0001)
    val terms = TextOps.bm25ServeTerms
    TextOps.writeBm25Index(docs, "bm17")
    val full = TextOps.bm25Serve(spark, "bm17", terms).collect()
    // take down the top-2 docs of the full answer — serve MUST move
    val gone = full.take(2).map(_.getLong(0)).toSeq
    TakedownOps.takedownBm25Index(spark, "bm17", gone.toDF("doc_id"))
    val served = TextOps.bm25Serve(spark, "bm17", terms).collect().toSeq
    TextOps.writeBm25Index(
      docs.filter(!col("doc_id").isin(gone: _*)), "bm17ref")
    val rebuilt = TextOps.bm25Serve(spark, "bm17ref", terms).collect().toSeq
    assert(served == rebuilt,
      "takedown serve must equal rebuild-without (df/stats re-derive)")
    served.foreach(r => assert(!gone.contains(r.getLong(0))))
    // replay the same takedown: tombstones must not duplicate
    TakedownOps.takedownBm25Index(spark, "bm17", gone.toDF("doc_id"))
    assert(spark.table("bm17_takedown").count() == gone.size)
    assert(TextOps.bm25Serve(spark, "bm17", terms).collect().toSeq == rebuilt)

    TakedownOps.compactBm25Index(spark, "bm17")
    assert(!spark.catalog.tableExists("bm17_takedown"))
    assert(TextOps.bm25Serve(spark, "bm17", terms).collect().toSeq == rebuilt)
    assert(spark.table("bm17_doclen").count() ==
      docs.count() - gone.size)
  }

  test("dedup-index takedown: serve equals rebuild-without — including " +
      "the df correction — idempotent under replay, exact after compact") {
    val corpus = Seq(
      (1L, variant(Set.empty)),
      (2L, variant(Set(10))),          // near-dups doc 1; pairs batch 20
      (3L, variant(Set(60, 70, 80, 90))))
      .toDF("doc_id", "text")
    val batch = Seq(
      (20L, variant(Set(10, 20))),     // pairs 1 and 2 when both live
      (21L, variant(Set(60, 70, 80, 90, 5)))) // pairs 3 only
      .toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    DedupOps.writeDedupIndex(corpus, "dd17")
    val before = pairs(DedupOps.incrementalNearDupServe(spark, "dd17", batch))
    assert(before.contains((2L, 20L)) && before.contains((1L, 20L)) &&
      before.contains((3L, 21L)), before.toString)

    TakedownOps.takedownDedupIndex(spark, "dd17", Seq(2L).toDF("doc_id"))
    val served = pairs(DedupOps.incrementalNearDupServe(spark, "dd17", batch))
    DedupOps.writeDedupIndex(corpus.filter(col("doc_id") =!= 2L), "dd17ref")
    val rebuilt = pairs(
      DedupOps.incrementalNearDupServe(spark, "dd17ref", batch))
    assert(served == rebuilt,
      s"takedown serve must equal rebuild-without: $served vs $rebuilt")
    assert(!served.exists(p => p._1 == 2L || p._2 == 2L))
    assert(served.contains((1L, 20L)), "unrelated pairs must survive")

    // replay: the df correction derives from tombstones at serve time,
    // so a re-delivered takedown cannot double-subtract
    TakedownOps.takedownDedupIndex(spark, "dd17", Seq(2L).toDF("doc_id"))
    assert(spark.table("dd17_takedown").count() == 1)
    assert(pairs(
      DedupOps.incrementalNearDupServe(spark, "dd17", batch)) == rebuilt)

    TakedownOps.compactDedupIndex(spark, "dd17")
    assert(!spark.catalog.tableExists("dd17_takedown"))
    assert(pairs(
      DedupOps.incrementalNearDupServe(spark, "dd17", batch)) == rebuilt)
    // the compacted df table is exact again (equals the rebuilt one)
    val dfGot = spark.table("dd17_df").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val dfRef = spark.table("dd17ref_df").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dfGot == dfRef)
  }

  // ------------------------------------------------------------- q163

  test("hybridRrf: fusion ranks by summed reciprocal ranks, one-arm " +
      "docs carry rank 0 on the absent arm, rrf ties break by doc_id") {
    val docs = Seq(
      (0L, "table scan only"),                 // no query terms → bm absent
      (1L, "vector join sort vector join"),    // strongest lexical hit
      (2L, "table scan row"),                  // no query terms
      (3L, "vector agg agg agg agg agg agg"))  // weaker lexical hit
      .toDF("doc_id", "text")
    val em = Seq(
      (0L, Array(1f, 0f)),      // the query vector (cos 1 with itself)
      (1L, Array(0f, 1f)),      // orthogonal → dense rank beyond armK=2
      (2L, Array(0.99f, 0.1f)), // dense rank 2
      (3L, Array(0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    val got = SimilarityOps.hybridRrf(docs, em,
        terms = Seq("vector", "join", "sort"), queryVecId = 0L,
        armK = 2, topN = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3))).toSeq
    // bm arm top-2: d1 (3 distinct terms), d3 (1 term); dense arm
    // top-2: vec0 (self), vec2. rrf: d0 = 1/61 (ann 1), d1 = 1/61
    // (bm 1), d2 = 1/62 (ann 2), d3 = 1/62 (bm 2) — two exact ties,
    // both broken by doc_id ascending
    val r61 = BigDecimal(1.0 / 61).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val r62 = BigDecimal(1.0 / 62).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      (0L, r61, 0L, 1L), (1L, r61, 1L, 0L),
      (2L, r62, 0L, 2L), (3L, r62, 2L, 0L)), got.toString)
  }
}
