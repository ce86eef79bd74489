package graft

import org.apache.spark.sql.functions._
import graft.llm.MultimodalOps

/** Round-17 additions: hardened keeper-snapshot recovery, dHash
  * short-payload locality, radius-derived hamming banding, and the
  * ExactSubstr span-removal operator (q158). Hand-built fixtures where
  * every expected value is derivable by inspection; the registry rows
  * prove oracle equivalence on real data, these pin the SEMANTICS. */
class Round17OpsSpec extends SparkSpec {
  import spark.implicits._

  private def variant(changes: Set[Int]): String =
    (1 to 100).map(i =>
      if (changes.contains(i)) s"X$i" else s"w$i").mkString(" ")

  test("refreshKeepers: a crashed (uncommitted) snapshot is skipped — " +
      "the merge base falls back to the last _SUCCESS generation") {
    val dir = java.nio.file.Files.createTempDirectory("graft-keepers17")
      .toString
    val corpus = Seq(
      (1L, variant(Set.empty)),
      (2L, variant(Set(10)))).toDF("doc_id", "text")
    corpus.write.mode("overwrite").parquet(s"$dir/batch_id=0")
    assert(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 0L)
    // simulate a refresh of upto=1 that died mid-write: the directory
    // exists with data files but NO _SUCCESS commit marker
    val batch1 = Seq((20L, variant(Set(10, 20, 30)))).toDF("doc_id", "text")
    batch1.write.mode("overwrite").parquet(s"$dir/batch_id=1")
    val partial = new java.io.File(s"$dir/keepers/upto=1")
    // a partial snapshot whose CONTENT is corrupt (drops doc 2): if the
    // next refresh consumed it as a base, doc 2 would vanish from
    // upto=2 — provably wrong output, not just a different path
    Seq((1L, 1L)).toDF("doc_id", "keeper")
      .write.mode("overwrite").parquet(partial.toString)
    assert(new java.io.File(partial, "_SUCCESS").delete(),
      "fixture: expected Spark to have written a _SUCCESS marker")
    val batch2 = Seq((30L, variant(Set(50)))).toDF("doc_id", "text")
    batch2.write.mode("overwrite").parquet(s"$dir/batch_id=2")
    assert(graft.app.IngestDedupApp.refreshKeepers(spark, dir) == 2L)
    val snap2 = spark.read.parquet(s"$dir/keepers/upto=2")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // built from committed upto=0 (which knows doc 2), never the
    // partial upto=1: 30 is c=1 from doc 1 → joins {1,2}; 20 (c=3 from
    // 1, c=2 from 2) pairs with 2 at 0.81 → same component
    assert(snap2.contains(2L) && snap2.size == 4,
      s"partial snapshot leaked into the merge base: $snap2")
    assert(snap2 == Map(1L -> 1L, 2L -> 1L, 20L -> 1L, 30L -> 1L),
      snap2.toString)
  }

  // ------------------------------------------------------------- q158
  test("exactSubstrClean: overlapping dup grams merge into one span, " +
      "abutting spans fuse, head/tail spans cut cleanly, a fully " +
      "duplicated doc empties, sub-k docs pass through") {
    import graft.llm.TextOps
    val docs = Seq(
      // E: "c d e" (dup via F) at pos 3 and "d e f" (dup via G) at
      // pos 4 — intervals [3,6) + [4,7) OVERLAP -> one span [3,7)
      (1L, "p q c d e f r s", "s1"),
      (2L, "u1 u2 c d e u3 u4", "s1"),      // F: head-interior span
      (3L, "d e f v1 v2", "s1"),            // G: HEAD span [1,4)
      // H: "t1 t2 t3" at 1 and "t4 t5 t6" at 4 (both dup via I) ABUT
      // ([1,4) + [4,7)) -> ONE span [1,7) -> doc empties
      (4L, "t1 t2 t3 t4 t5 t6", "s2"),
      (5L, "t1 t2 t3 zz t4 t5 t6", "s2"),   // I: two spans, keeps "zz"
      (6L, "w1 w2 w3 w4 w5 t4 t5 t6", "s2"),// TAIL span [6,9)
      (7L, "xx yy", "s3"))                   // < k tokens: untouched
      .toDF("doc_id", "text", "source")
    val out = TextOps.exactSubstrClean(docs, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))))
      .toMap
    assert(out(1L) == ((8L, 1L, 4L, "p q r s")), out(1L).toString)
    assert(out(2L) == ((7L, 1L, 3L, "u1 u2 u3 u4")), out(2L).toString)
    assert(out(3L) == ((5L, 1L, 3L, "v1 v2")), out(3L).toString)
    assert(out(4L) == ((6L, 1L, 6L, "")), out(4L).toString)
    assert(out(5L) == ((7L, 2L, 6L, "zz")), out(5L).toString)
    assert(out(6L) == ((8L, 1L, 3L, "w1 w2 w3 w4 w5")), out(6L).toString)
    assert(out(7L) == ((2L, 0L, 0L, "xx yy")), out(7L).toString)
    // char fate rolls the same rows up per source; docs_emptied counts
    // doc 4 only (n_tokens = removed_tokens > 0)
    val fate = TextOps.exactSubstrCharFate(docs, k = 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7)))).toMap
    assert(fate("s2") == ((3L, 3L, 1L, 4L, 21L, 15L, "zz".length.toLong
      + "w1 w2 w3 w4 w5".length)), fate("s2").toString)
    assert(fate("s3") == ((1L, 0L, 0L, 0L, 2L, 0L, 5L)),
      fate("s3").toString)
  }

  // ------------------------------------------------------------- q160
  test("dedup serve lifecycle: persisted index round-trips (served ≡ " +
      "direct), append ≡ rebuild, re-delivered ids dropped") {
    import graft.llm.DedupOps
    val docs = graft.core.Tables.documents(spark, sf0001)
    val ids = docs.agg(max(col("doc_id"))).first().getLong(0)
    val corpus = docs.filter(col("doc_id") <= ids * 6 / 10)
    val batch1 = docs.filter(col("doc_id") > ids * 6 / 10
      && col("doc_id") <= ids * 8 / 10)
    val batch2 = docs.filter(col("doc_id") > ids * 8 / 10)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // stored ≡ direct
    DedupOps.writeDedupIndex(corpus, "graft_q160_t")
    val direct1 = rows(DedupOps.incrementalNearDup(corpus, batch1))
    val served1 = rows(DedupOps.incrementalNearDupServe(
      spark, "graft_q160_t", batch1))
    assert(served1 == direct1, s"\nserved=$served1\ndirect=$direct1")
    assert(served1.nonEmpty, "fixture must produce pairs")
    // append ≡ rebuild: admit batch1, serve batch2 from the appended
    // index; compare against the direct run over corpus ∪ batch1
    DedupOps.appendToDedupIndex(batch1, "graft_q160_t")
    val direct2 = rows(DedupOps.incrementalNearDup(
      corpus.unionByName(batch1), batch2))
    val served2 = rows(DedupOps.incrementalNearDupServe(
      spark, "graft_q160_t", batch2))
    assert(served2 == direct2, s"\nserved=$served2\ndirect=$direct2")
    // a re-delivered (already indexed) id is not "new": no self pairs,
    // same output as serving only the genuinely fresh rows
    val redelivered = batch2.unionByName(corpus.limit(3))
    val served3 = rows(DedupOps.incrementalNearDupServe(
      spark, "graft_q160_t", redelivered))
    assert(served3 == served2, s"\nwithRedeliv=$served3\nclean=$served2")
  }

  // --------------------------------------------- CC spanning forest
  test("spanningForest: components preserved exactly on a dense random " +
      "graph, forest size ~nodes not ~edges, CC labels match a " +
      "driver-side union-find ground truth") {
    import graft.llm.DedupOps
    val rnd = new scala.util.Random(29)
    // 3 dense blobs + a bridge chain + singleton-free noise edges
    val edges = (
      (1 to 2000).map(_ => (rnd.nextInt(40).toLong,
        rnd.nextInt(40).toLong)) ++                    // blob 0-39
      (1 to 2000).map(_ => (100L + rnd.nextInt(40),
        100L + rnd.nextInt(40))) ++                    // blob 100-139
      Seq((39L, 100L)) ++                              // bridge
      (1 to 50).map(i => (1000L + i, 1000L + i + 1))   // chain
    ).filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
    val pairs = edges.toDF("d1", "d2").repartition(2)
    val forest = DedupOps.spanningForest(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // per-partition forests can overlap across partitions, so the
    // bound is O(nodes × partitions) — orders below the dense input
    assert(forest.length <= 2 * nodes.length,
      s"forest ${forest.length} vs bound ${2 * nodes.length} " +
        s"(input ${edges.length})")
    // driver-side union-find ground truth over the ORIGINAL edges
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = nodes.map(n => n -> find(n)).toMap
    val cc = DedupOps.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == truth,
      s"CC diverged from ground truth: ${cc.toSet -- truth.toSet}")
  }

  // -------------------------------------------------------- q154/q155
  test("trainBpeFromWordFreq: incremental pair-count update is " +
      "byte-identical to the naive full-recount loop") {
    import graft.llm.TextOps
    // naive reference: recount EVERY pair every round (the shape the
    // production trainer replaced; kept here as the semantic oracle)
    def naive(wf: Array[(String, Long)],
        nMerges: Int): Seq[(String, String)] = {
      var words = wf.map { case (w, f) =>
        (w.split("").filter(_.nonEmpty).toVector, f) }
      val out = Seq.newBuilder[(String, String)]
      var done = false
      for (_ <- 1 to nMerges if !done) {
        val counts =
          new scala.collection.mutable.HashMap[(String, String), Long]
        words.foreach { case (toks, f) =>
          toks.indices.dropRight(1).foreach { j =>
            val k = (toks(j), toks(j + 1))
            counts.update(k, counts.getOrElse(k, 0L) + f)
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, r), _) =
            counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((l, r))
          words = words.map { case (toks, f) =>
            val nt = toks.foldLeft(
              (Vector.empty[String], null: String)) { case ((acc, p), t) =>
              if (p == l && t == r) (acc, l + r)
              else (if (p != null) acc :+ p else acc, t)
            }
            ((if (nt._2 != null) nt._1 :+ nt._2 else nt._1), f)
          }
        }
      }
      out.result()
    }
    val rnd = new scala.util.Random(17)
    val alpha = "abcdef"
    val wf = (1 to 300).map { _ =>
      val w = (1 to (3 + rnd.nextInt(9)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      w -> (1L + rnd.nextInt(50))
    }.groupBy(_._1).map { case (w, xs) => (w, xs.map(_._2).sum) }
      .toArray.sortBy(_._1)
    val (fast, fastVocab) = TextOps.trainBpeFromWordFreq(wf, 64)
    val slow = naive(wf, 64)
    assert(fast == slow, s"\nfast=$fast\nslow=$slow")
    // the returned vocabulary is the fixpoint of applying the merges
    fastVocab.foreach { case (w, syms) =>
      assert(syms.mkString == w, s"$w -> $syms")
    }
  }

  test("trainBpeFromWordFreq at 1024 merges on a 3k-word vocabulary " +
      "finishes and stops cleanly when pairs run dry") {
    import graft.llm.TextOps
    val rnd = new scala.util.Random(23)
    val alpha = "abcdefghijklmnop"
    val wf = (1 to 3000).map { i =>
      val w = (1 to (4 + rnd.nextInt(10)))
        .map(_ => alpha(rnd.nextInt(alpha.length))).mkString + i.toString
      w -> (1L + rnd.nextInt(9))
    }.toMap.toArray.sortBy(_._1)
    val t0 = System.nanoTime()
    val (merges, vocab) = TextOps.trainBpeFromWordFreq(wf, 1024)
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"1024 merges over ${wf.length} words: $secs%.2f s, " +
      s"${merges.length} merges learned")
    assert(merges.length == 1024, s"pairs ran dry at ${merges.length}")
    assert(merges.distinct.length == merges.length,
      "a merge rule was learned twice")
    assert(vocab.length == wf.length)
    // dry-out: a vocabulary whose pair space exhausts stops early
    // instead of looping — every word fully fused to one symbol
    val tiny = Array(("ab", 5L), ("ab", 3L)).take(1)
    val (m2, v2) = TextOps.trainBpeFromWordFreq(tiny, 1024)
    assert(m2 == Seq(("a", "b")) && v2 == Seq(("ab", Seq("ab"))))
  }

  test("BpeMaxVocab guard fails loudly instead of collecting an " +
      "over-limit vocabulary") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      graft.llm.TextOps.trainBpeModel(docs, nMerges = 2, maxVocab = 3)
    }
    assert(e.getMessage.contains("exceeds"), e.getMessage)
  }

  // ------------------------------------------------------------- q159
  test("annProbeCurve: recall is monotone in nProbe, cost strictly " +
      "grows, and the full-probe level is exhaustive (recall 1.0)") {
    val em = graft.core.Tables.embeddings(spark, sf0001)
    val rows = graft.llm.SimilarityOps.annProbeCurve(em)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getInt(6)))
    assert(rows.length == 8, rows.mkString(","))
    // probe lists nest: every level adds candidates, never loses hits
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 >= a._2, s"hits fell $a -> $b")
      assert(b._4 > a._4, s"scanned did not grow $a -> $b")
    }
    // probing all lists IS brute force: recall exactly 1 by construction
    assert(rows.last._3 == 1.0, rows.last.toString)
    assert(rows.last._5 == 1, rows.last.toString)
    // the integer pass flag agrees with the recall it summarizes
    rows.foreach { case (p, _, rec, _, ok) =>
      assert((ok == 1) == (rec >= 0.8), s"p=$p rec=$rec ok=$ok")
    }
  }

  test("dHashStub: one-byte edit flips at most two gradient bits even " +
      "on payloads shorter than the 72-cell grid") {
    import MultimodalOps.dHashStub
    for (n <- Seq(5, 20, 71)) {
      val p = (1 to n).map(i => (i * 37 % 251).toByte).toArray
      assert(dHashStub(p) == dHashStub(p.clone()))
      for (idx <- 0 until n) {
        val q = p.clone(); q(idx) = (q(idx) + 90).toByte
        val d = java.lang.Long.bitCount(dHashStub(p) ^ dHashStub(q))
        assert(d <= 2, s"n=$n idx=$idx flipped $d bits")
      }
    }
  }

  test("mediaNearDup: band count derives from the radius — pigeonhole " +
      "holds at maxHamming 5, and an absurd radius fails loudly") {
    // two payloads exactly 5 bits apart in dHash space would be LOST by
    // fixed 4-band chunking if all 4 chunks differed; with radius-
    // derived 6 bands at least one band must match. Build the pair by
    // brute perturbation: find an edit at hamming 4..5.
    val base = (1 to 400).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val h0 = MultimodalOps.dHashStub(base.getBytes("UTF-8"))
    // a single-byte edit flips ≤2 bits (the locality bound), so build
    // the distance from three high-swing edits in far-apart blocks
    val edited = (for {
      i <- (0 until 130 by 3).view
      j <- (140 until 260 by 3).view
      k <- (270 until 400 by 3).view
    } yield base.updated(i, '~').updated(j, '~').updated(k, '~')).find { s =>
      val d = java.lang.Long.bitCount(
        h0 ^ MultimodalOps.dHashStub(s.getBytes("UTF-8")))
      d >= 4 && d <= 5
    }
    assume(edited.isDefined, "fixture: no 4..5-bit edit found")
    val docs = Seq((1L, base), (2L, edited.get)).toDF("doc_id", "text")
    val pairs = MultimodalOps.mediaNearDup(docs, maxHamming = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2)))
    assert(pairs.exists { case (k, h) => k == ((1L, 2L)) && h <= 5 },
      s"radius-5 pair lost: ${pairs.toSeq}")
    intercept[IllegalArgumentException] {
      MultimodalOps.mediaNearDup(docs, maxHamming = 40)
    }
  }
}
