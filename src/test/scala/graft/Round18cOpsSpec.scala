package graft

import org.apache.spark.sql.functions._
import graft.llm.{CorpusOps, TextOps}

/** Round-18 third wave: hand-pinned semantics for the CCNet bucket
  * split, the Gopher top-n-gram repetition battery, and URL
  * canonicalization — fixtures where every expected value is
  * derivable by inspection (the registry rows prove cross-engine
  * equivalence on real data; these pin WHAT is computed). */
class Round18cOpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- q176

  test("ccnetBuckets: per-language ntile by NLL — bucket sizes follow " +
      "the remainder-first rule and ranges are ordered head→tail") {
    // 5 en docs with strictly increasing NLL under the en bigram LM:
    // repeated common bigrams score low, rare bigrams high
    val docs = Seq(
      (1L, "x y x y x y x y", "en", "s"),
      (2L, "x y x y x y q r", "en", "s"),
      (3L, "x y x y q r s t", "en", "s"),
      (4L, "x y q r s t u v", "en", "s"),
      (5L, "q r s t u v w z", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val out = TextOps.ccnetBuckets(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    // 5 docs into 3 buckets: remainder-first → sizes 2, 2, 1
    assert(out.map(x => (x._2, x._3)).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 1L)), out.mkString(","))
    // head max ≤ middle min ≤ middle max ≤ tail min (NLL ordered)
    val byB = out.map(x => x._2 -> (x._4, x._5)).toMap
    assert(byB(1L)._2 <= byB(2L)._1 && byB(2L)._2 <= byB(3L)._1,
      out.mkString(","))
  }

  // ------------------------------------------------------------- q177

  test("repetitionAudit: top-n-gram char shares on a hand doc — " +
      "exact fractions, overlap counting documented by the >1 case") {
    val docs = Seq((1L, "a b a b a b", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    val r = TextOps.repetitionAudit(docs).collect().head
    // tokens [a b a b a b], joined length 11
    // 2-grams: "a b"×3, "b a"×2 → 3·3/11
    assert(math.abs(r.getDouble(2) - (9.0 / 11 + 1e-9)) < 5e-5,
      r.toString)
    // 3-grams: "a b a"×2, "b a b"×2 → 2·5/11
    assert(math.abs(r.getDouble(3) - (10.0 / 11 + 1e-9)) < 5e-5,
      r.toString)
    // 4-grams: "a b a b"×2 → 2·7/11 — OVERLAPPING occurrences, so the
    // share exceeds 1: the metric is an upper bound on character
    // coverage (Gopher's thresholds live at ≤0.20 where overlaps are
    // immaterial; the audit keeps the cheap occurrence-count form)
    assert(r.getDouble(4) > 1.0, r.toString)
    assert(math.abs(r.getDouble(4) - (14.0 / 11 + 1e-9)) < 5e-5,
      r.toString)
    // all three flags fire at these shares
    assert((r.getLong(5), r.getLong(6), r.getLong(7)) == ((1L, 1L, 1L)))
  }

  // ------------------------------------------------------------- q178

  test("canonicalizeUrl: each rule in isolation and stacked edge cases") {
    val rows = Seq(
      // authority lowers, path case survives
      ("HTTP://ExAmPle.COM/KeepCase", "http://example.com/KeepCase"),
      // fragment drops
      ("http://a.com/p#frag", "http://a.com/p"),
      // default ports drop, non-default stays
      ("http://a.com:80/p", "http://a.com/p"),
      ("https://a.com:443/p", "https://a.com/p"),
      ("http://a.com:8080/p", "http://a.com:8080/p"),
      // tracking params strip with separator tidy-up
      ("http://a.com/p?utm_source=x", "http://a.com/p"),
      ("http://a.com/p?utm_source=x&id=1", "http://a.com/p?id=1"),
      ("http://a.com/p?id=1&gclid=z", "http://a.com/p?id=1"),
      ("http://a.com/p?fbclid=q&utm_medium=m&id=2",
        "http://a.com/p?id=2"),
      // nothing to do → unchanged
      ("https://a.com/p?id=3", "https://a.com/p?id=3"))
      .toDF("url", "want")
    val got = rows.select(CorpusOps.canonicalizeUrl(col("url")).as("got"),
      col("want")).collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1),
      s"got '${r.getString(0)}' want '${r.getString(1)}'"))
  }

  // ------------------------------------------- q102/q176 ingest guard

  test("lmGuard: the ingest loop routes high-NLL docs to lowquality/ " +
      "under a STORED reference LM; fluent and bigram-less docs land; " +
      "replay reaches the same routing") {
    import java.nio.file.Files
    import graft.app.IngestDedupApp
    import graft.sources.shardsim.ShardSimFixture
    // reference LM: fluent text = repeated familiar bigrams
    val ref = (1L to 20L)
      .map(i => (i, "alpha beta gamma delta alpha beta gamma delta", "en", "s"))
      .toDF("doc_id", "text", "lang", "source")
    TextOps.writeBigramLm(ref, "lm18c")
    // stream: doc 101 fluent (reference bigrams), 102 disfluent
    // (unseen words — every bigram smoothed-only), 103 one token
    // (no bigram → no defined NLL → passes)
    val rows = Seq(
      (101L, "alpha beta gamma delta alpha beta"),
      (102L, "zork quux blarg wibble zork quux blarg wibble"),
      (103L, "alpha"))
      .zipWithIndex.map { case ((id, txt), i) =>
        (s"d$id", 1700000000000000L + i,
          s"""{"doc_id":$id,"text":"$txt"}""")
      }
    val shardDir = Files.createTempDirectory("lmg_shard").toString
    ShardSimFixture.writeShard(shardDir, 0, rows)
    val corpus = Files.createTempDirectory("lmg_corpus").toString
    val ckpt = Files.createTempDirectory("lmg_ckpt").toString
    // the smoothed NLL floor for fully-unseen text is ln V (V = 4
    // here → 1.386); fluent text scores ≈ 0.05 — the 0.5 line
    // discriminates on this tiny-vocabulary fixture (a real corpus's
    // V puts the floor near ln V ≈ 10, where the 3.5 convention lives)
    def start() = IngestDedupApp.run(spark, shardDir, corpus, ckpt,
      lmGuard = Some(IngestDedupApp.LmGuard("lm18c", maxNll = 0.5)))
    start().awaitTermination()
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    assert(ids(IngestDedupApp.corpus(spark, corpus)) == Set(101L, 103L))
    assert(ids(IngestDedupApp.lowQuality(spark, corpus)) == Set(102L))
    // replay (same checkpoint, nothing new): routing unchanged
    start().awaitTermination()
    assert(ids(IngestDedupApp.corpus(spark, corpus)) == Set(101L, 103L))
    assert(ids(IngestDedupApp.lowQuality(spark, corpus)) == Set(102L))
  }
}
