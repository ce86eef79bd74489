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
