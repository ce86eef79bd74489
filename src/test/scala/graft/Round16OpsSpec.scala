package graft

import org.apache.spark.sql.functions._
import graft.llm.DedupOps

/** Round-16 additions: incremental keeper maintenance (q153) and the
  * CC init fold. All on hand-built corpora where every expected
  * component is derivable by inspection; the registry rows prove oracle
  * equivalence on real data, these pin the SEMANTICS. */
class Round16OpsSpec extends SparkSpec {
  import spark.implicits._

  /** A token gradient: `variant(s)` replaces the token at each index in
    * `s` (indices spaced ≥ k apart, so each substitution kills an
    * independent run of shingles). With 100 tokens / k = 5 the Jaccard
    * between variants differing at c positions is ≈ (96−5c)/(96+5c):
    * c=1 → 0.90 (≥ 0.8 pairs), c=2 → 0.81 (pairs), c=3 → 0.73 (does
    * not pair). */
  private def variant(changes: Set[Int]): String =
    (1 to 100).map(i =>
      if (changes.contains(i)) s"X$i" else s"w$i").mkString(" ")

  // corpus: component {1,2} (c=1 apart), singleton 5 (c=3 from doc 2)
  private def corpus = Seq(
    (1L, variant(Set.empty)),
    (2L, variant(Set(10))),
    (5L, variant(Set(10, 20, 30, 40)))
  ).toDF("doc_id", "text")

  // batch: 20 bridges {1,2} and {5} (c=2 from doc 2, c=1 from doc 5);
  // 21 duplicates 20 (in-batch pair); 22 is novel (stays unpaired)
  private def batch = Seq(
    (20L, variant(Set(10, 20, 30))),
    (21L, variant(Set(10, 20, 30))),
    (22L, (1 to 100).map(i => s"novel$i").mkString(" "))
  ).toDF("doc_id", "text")

  private def keeperTable(ids: org.apache.spark.sql.DataFrame,
      pairs: org.apache.spark.sql.DataFrame) =
    ids.select(col("doc_id"))
      .join(DedupOps.connectedComponents(pairs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper"), col("doc_id")).as("keeper"))

  // ------------------------------------------------------------- q153
  test("mergeKeepers: incremental merge ≡ full recompute, including a " +
      "batch doc bridging two stored components") {
    val storedPairs = DedupOps.ngramJaccard(corpus).select("d1", "d2")
    val stored = keeperTable(corpus, storedPairs)
    // sanity on the premise: {1,2} resolved, 5 single
    assert(stored.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L))
    val newPairs = DedupOps.incrementalNearDup(corpus, batch)
      .select("d1", "d2")
    val merged = DedupOps.mergeKeepers(stored, newPairs,
      batch.select("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 20 pairs with 2 (c=2) and 5 (c=1): the bridge unites {1,2}, {5},
    // {20,21} into one component under keeper 1; 22 stays its own
    assert(merged == Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
      20L -> 1L, 21L -> 1L, 22L -> 22L), merged.toString)
    // the semantic contract, verbatim: CC over the UNION pair set
    val all = corpus.unionByName(batch)
    val full = keeperTable(all, storedPairs.unionByName(newPairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == full, s"incremental $merged != full $full")
  }

  test("mergeKeepers: empty new-pair set leaves the stored table intact " +
      "and admits the batch as singletons") {
    val stored = Seq((1L, 1L), (2L, 1L), (5L, 5L)).toDF("doc_id", "keeper")
    val noPairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    val merged = DedupOps.mergeKeepers(stored, noPairs,
      Seq(20L, 22L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == Map(1L -> 1L, 2L -> 1L, 5L -> 5L,
      20L -> 20L, 22L -> 22L), merged.toString)
  }

  test("refreshKeepers: bootstrap then incremental snapshot ≡ full " +
      "recompute over the whole corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-keepers")
      .toString
    corpus.write.mode("overwrite").parquet(s"$dir/batch_id=0")
    assert(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 0L)
    val snap0 = spark.read.parquet(s"$dir/keepers/upto=0")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap0 == Map(1L -> 1L, 2L -> 1L, 5L -> 5L), snap0.toString)
    batch.write.mode("overwrite").parquet(s"$dir/batch_id=1")
    assert(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 1L)
    val snap1 = spark.read.parquet(s"$dir/keepers/upto=1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(snap1 == Map(1L -> 1L, 2L -> 1L, 5L -> 1L,
      20L -> 1L, 21L -> 1L, 22L -> 22L), snap1.toString)
    // the refresh is idempotent under replay (generational overwrite)
    assert(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 1L)
    val replay = spark.read.parquet(s"$dir/keepers/upto=1")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(replay == snap1)
  }

  // ------------------------------------------------------- q154/q155
  test("trainBpeModel: greedy merges and final word symbols are the " +
      "hand-derivable ones") {
    // freq-weighted pair counts: 'ab' appears in every word of both
    // docs; hand-run of the greedy loop: merge1 = (a,b) count 6,
    // merge2 = (ab,c) count 6
    val docs = Seq(
      (1L, "abc abc abcabc", "en", "s"),
      (2L, "abd abcabc", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val (merges, vocab) = graft.llm.TextOps.trainBpeModel(docs, nMerges = 2)
    assert(merges.head == ("a", "b"), merges.toString)
    assert(merges(1) == ("ab", "c"), merges.toString)
    val vm = vocab.toMap
    assert(vm("abc") == Seq("abc"), vm.toString)
    assert(vm("abcabc") == Seq("abc", "abc"), vm.toString)
    assert(vm("abd") == Seq("ab", "d"), vm.toString)
  }

  test("bpeWordSymbols: the live-apply expression matches the trained " +
      "vocabulary on every in-vocab word AND tokenizes unseen words") {
    val docs = Seq((1L, "lower lowest newer newest wider", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val (merges, vocab) = graft.llm.TextOps.trainBpeModel(docs, nMerges = 6)
    // stored ≡ direct: fold every trained word through the expression
    val words = vocab.map(_._1)
    val applied = words.toDF("w")
      .select(col("w"), graft.llm.TextOps.bpeWordSymbols(col("w"), merges)
        .as("sym"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    vocab.foreach { case (w, sym) =>
      assert(applied(w) == sym, s"$w: expr ${applied(w)} != trained $sym")
    }
    // OOV: an unseen word still tokenizes under the same rules, and
    // symbols concatenate back to the word (a BPE invariant)
    val oov = Seq("lowers").toDF("w")
      .select(graft.llm.TextOps.bpeWordSymbols(col("w"), merges).as("sym"))
      .collect().head.getSeq[String](0)
    assert(oov.mkString("") == "lowers", oov.toString)
    assert(oov.length < "lowers".length, s"no merge applied: $oov")
  }

  test("bpe fold semantics: same-rule chains merge left-to-right " +
      "non-overlapping, matching the driver-side trainer") {
    val merges = Seq(("a", "a"))
    val got = Seq("aaaa", "aaa", "a").toDF("w")
      .select(col("w"), graft.llm.TextOps.bpeWordSymbols(col("w"), merges)
        .as("s"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSeq).toMap
    assert(got("aaaa") == Seq("aa", "aa"), got.toString)
    assert(got("aaa") == Seq("aa", "a"), got.toString)
    assert(got("a") == Seq("a"), got.toString)
  }

  test("writeBpeModel/readBpeMerges: stored model round-trips and " +
      "scores identically to the direct path") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val (direct, _) = graft.llm.TextOps.trainBpeModel(docs)
    graft.llm.TextOps.writeBpeModel(docs, "bpe_r16_test")
    val stored = graft.llm.TextOps.readBpeMerges(spark, "bpe_r16_test")
    assert(stored == direct, s"stored $stored != direct $direct")
  }

  test("q143/q150 re-base behind the merge-table flag: fertility and " +
      "window plan shift when the trained tokenizer replaces the stand-in") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val (merges, _) = graft.llm.TextOps.trainBpeModel(docs)
    val defFert = graft.llm.TextOps.vocabAudit(docs)
      .select("lang", "fertility").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bpeFert = graft.llm.TextOps.vocabAudit(docs, Some(merges))
      .select("lang", "fertility").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(defFert.keySet == bpeFert.keySet)
    assert(defFert != bpeFert, "flag changed nothing")
    // trained symbols are ≥1 char, so chars-per-symbol stays ≥ 1
    bpeFert.values.foreach(f => assert(f >= 1.0, bpeFert.toString))
    val defPlan = graft.llm.ChunkOps.contextWindowPlan(docs)
      .select("window", "token_coverage").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val bpePlan = graft.llm.ChunkOps.contextWindowPlan(docs,
      bpeMerges = Some(merges))
      .select("window", "token_coverage").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(defPlan.keySet == bpePlan.keySet)
    // BPE splits words into ≥1 symbols, so token counts grow and small
    // windows cover at most the whitespace coverage
    bpePlan.foreach { case (w, cov) =>
      assert(cov <= defPlan(w) + 1e-9, s"window $w: $cov > ${defPlan(w)}")
    }
  }

  // ------------------------------------------------------------- q156
  test("media dedup: planted near-dup payloads pair within the hamming " +
      "radius, exact dups at 0, unrelated media stay apart") {
    import graft.llm.MultimodalOps
    val base = (1 to 400).map(i => ('a' + i % 26).toChar).mkString
    val docs = Seq(
      (1L, base),                          // original
      (2L, base),                          // byte-identical copy
      (3L, base.updated(200, 'Z')),        // one-byte edit: near dup
      (4L, (1 to 400).map(i => ('a' + (i * 7) % 26).toChar).mkString))
      .toDF("doc_id", "text")
    val pairs = MultimodalOps.mediaNearDup(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs.get((1L, 2L)).contains(0), s"exact pair: $pairs")
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) <= 3,
      s"near-dup pair: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 4L || p._2 == 4L),
      s"unrelated payload paired: $pairs")
    val keepers = MultimodalOps.mediaDedupKeeper(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(keepers == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L),
      keepers.toString)
  }

  test("dHashStub: deterministic, byte-identical payloads collide, " +
      "one-byte edits flip at most two gradient bits") {
    import graft.llm.MultimodalOps.dHashStub
    val p = (1 to 500).map(i => (i % 251).toByte).toArray
    assert(dHashStub(p) == dHashStub(p.clone()))
    val q = p.clone(); q(250) = (q(250) + 90).toByte
    val d = java.lang.Long.bitCount(dHashStub(p) ^ dHashStub(q))
    assert(d <= 2, s"one-byte edit flipped $d bits")
    assert(dHashStub(Array.emptyByteArray) == 0L)
  }

  // ------------------------------------------------------------- q157
  test("bm25 serve: persisted index round-trips, serve ≡ direct scan, " +
      "and append ≡ rebuild") {
    import graft.llm.TextOps
    val docs = graft.core.Tables.documents(spark, sf0001)
    val terms = TextOps.bm25ServeTerms
    val direct = TextOps.bm25(docs, terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    // stored: write the index tables, serve the same query from them
    TextOps.writeBm25Index(docs, "bm25_r16_test")
    val served = TextOps.bm25Serve(spark, "bm25_r16_test", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(served == direct, s"served $served != direct $direct")
    // incremental: index the first 80% then append the rest — serving
    // over (index ∪ batch) must equal the rebuilt-from-scratch answer
    // (df/stats derive at query time, so appends need no model rewrite)
    val cut = docs.agg(max(col("doc_id"))).collect().head.getLong(0) * 8 / 10
    TextOps.writeBm25Index(docs.filter(col("doc_id") < cut), "bm25_r16_incr")
    TextOps.appendToBm25Index(docs.filter(col("doc_id") >= cut),
      "bm25_r16_incr")
    val incr = TextOps.bm25Serve(spark, "bm25_r16_incr", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(incr == direct, s"incremental $incr != rebuilt $direct")
  }

  // ------------------------------------------------- CC init fold
  test("connectedComponents converges in one round on a clique " +
      "(init already carries the closed-neighborhood minimum)") {
    // a 4-clique: min-over-neighborhood init IS the fixpoint; the one
    // round only confirms zero changes
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)).toDF("d1", "d2")
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("connectedComponents resolves a 12-node chain (diameter beyond " +
      "the init horizon) to one component") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("d1", "d2")
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == (1L to 12L).map(_ -> 1L).toMap, cc.toString)
  }
}
