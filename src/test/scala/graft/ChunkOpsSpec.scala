package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.llm.ChunkOps

/** Pins the q34 conventions on hand-built frames where the expected output
  * is computed by hand (chunk boundaries, packing cut-crossing, mixture
  * budget rounding + overshoot-by-one). */
class ChunkOpsSpec extends SparkSpec {

  private def docsDF(rows: Seq[(Long, String, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")))
  }

  test("chunk: sliding windows cover the doc; last window runs short") {
    // width=5, stride=3 over 10 chars: starts 0,3,6,9 → lens 5,5,4,1
    val out = ChunkOps.chunk(docsDF(Seq((1L, "abcdefghij", "en", "s"))),
        width = 5, stride = 3)
      .select("chunk_ix", "chunk_len").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((0L, 5L), (1L, 5L), (2L, 4L), (3L, 1L)))
  }

  test("chunk: default width=200/stride=150 boundary conventions") {
    val txt200 = "x" * 200 // starts 0 and 150 (< 200) → 2 chunks
    val txt150 = "y" * 150 // start 150 is NOT < 150 → 1 chunk
    val txt151 = "z" * 151 // start 150 < 151 → 2 chunks, second of len 1
    val out = ChunkOps.chunk(docsDF(Seq(
        (1L, txt200, "en", "s"), (2L, txt150, "en", "s"),
        (3L, txt151, "en", "s"))))
      .groupBy("doc_id").agg(count(lit(1)).as("n"), sum("chunk_len").as("tot"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // overlap = width − stride = 50 chars per extra chunk
    assert(out == Set((1L, 2L, 250L), (2L, 1L, 150L), (3L, 2L, 152L)))
  }

  test("chunk: md5 pins exact chunk content, not just lengths") {
    val md = MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val got = ChunkOps.chunk(docsDF(Seq((1L, "abcdefghij", "en", "s"))),
        width = 5, stride = 3)
      .select("chunk_md5").collect().map(_.getString(0)).toSeq
    assert(got == Seq("abcde", "defgh", "ghij", "j").map(hex))
  }

  test("packing: cut-crossing docs, sequence count, tail padding") {
    // token counts 4,5,3,7 (single-char tokens) → spans [0,4) [4,9) [9,12)
    // [12,19); capacity 10 cuts at 10 → only doc 3 straddles; 2 seqs; pad 1
    val docs = docsDF(Seq(
      (1L, "a b c d", "en", "s"),
      (2L, "a b c d e", "en", "s"),
      (3L, "a b c", "en", "s"),
      (4L, "a b c d e f g", "en", "s")))
    val r = ChunkOps.packingStats(docs, capacity = 10).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("n_docs") == 4L)
    assert(row.getAs[Long]("total_tokens") == 19L)
    assert(row.getAs[Long]("n_seqs") == 2L)
    assert(row.getAs[Long]("n_boundary_docs") == 1L)
    assert(row.getAs[Long]("tail_pad") == 1L)
  }

  test("packing: sources pack independently") {
    val docs = docsDF(Seq(
      (1L, "a b c d e f", "en", "s1"),  // 6 tokens → 1 seq, pad 4... cap 10
      (2L, "a b c d e f g h i j k", "en", "s2"))) // 11 → 2 seqs, pad 9
    val out = ChunkOps.packingStats(docs, capacity = 10).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_seqs"),
        r.getAs[Long]("tail_pad"))).toSet
    assert(out == Set(("s1", 1L, 4L), ("s2", 2L, 9L)))
  }

  test("chunkTokens: token windows mirror the char convention, md5-pinned") {
    val md = MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 10 tokens, width=5, stride=3 → starts 0,3,6,9 → sizes 5,5,4,1
    val out = ChunkOps.chunkTokens(
        docsDF(Seq((1L, "a b c d e f g h i j", "en", "s"))),
        width = 5, stride = 3)
      .select("chunk_ix", "chunk_tok", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val want = Seq("a b c d e", "d e f g h", "g h i j", "j").zipWithIndex
      .map { case (s, i) => (i.toLong, s.split(" ").length.toLong, hex(s)) }
    assert(out == want)
    // tokenizer contract rides through: punctuation/case fold away
    val norm = ChunkOps.chunkTokens(
        docsDF(Seq((1L, "A, b! C d E", "en", "s"))), width = 3, stride = 2)
      .select("chunk_md5").collect().map(_.getString(0)).toSeq
    // starts 0,2,4 (4 < 5 tokens) → the short tail window "e" is a chunk
    assert(norm == Seq(hex("a b c"), hex("c d e"), hex("e")))
    // empty doc → one empty chunk (same convention as char chunking)
    val empty = ChunkOps.chunkTokens(docsDF(Seq((1L, "", "en", "s"))))
      .select("chunk_tok", "chunk_md5").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(empty == Seq((0L, hex(""))))
  }

  test("packSequences: doc landing coordinates under the capacity cut") {
    // token counts 4,5,3,7 → spans [0,4) [4,9) [9,12) [12,19); capacity 10
    val docs = docsDF(Seq(
      (1L, "a b c d", "en", "s"),
      (2L, "a b c d e", "en", "s"),
      (3L, "a b c", "en", "s"),
      (4L, "a b c d e f g", "en", "s"),
      (5L, "", "en", "s"))) // zero tokens: spans no sequence
    val out = ChunkOps.packSequences(docs, capacity = 10).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_ix"),
        r.getAs[Long]("seq_offset"), r.getAs[Long]("n_seqs_spanned"))).toSeq
    assert(out == Seq(
      (1L, 0L, 0L, 1L),
      (2L, 0L, 4L, 1L),
      (3L, 0L, 9L, 2L), // straddles the cut at 10
      (4L, 1L, 2L, 1L),
      (5L, 1L, 9L, 0L)))
  }

  test("packSequences: agrees with packingStats aggregates per source") {
    val rnd = new scala.util.Random(7)
    val docs = docsDF((1L to 60L).map { i =>
      val n = rnd.nextInt(30) // includes 0-token docs
      (i, (1 to n).map(_ => "tok").mkString(" "),
        "en", s"s${i % 3}")
    })
    val cap = 16
    val perDoc = ChunkOps.packSequences(docs, capacity = cap).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tok"),
        r.getAs[Long]("seq_ix"), r.getAs[Long]("n_seqs_spanned")))
      .groupBy(_._1)
    val stats = ChunkOps.packingStats(docs, capacity = cap).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_seqs"), r.getAs[Long]("n_boundary_docs"))).toMap
    for ((src, rows) <- perDoc) {
      val (nSeqs, nBoundary) = stats(src)
      // a doc crosses a cut iff it spans >1 sequences
      assert(rows.count(_._4 > 1) == nBoundary, s"$src boundary docs")
      // the highest sequence touched is the last one the stats count
      val lastTouched = rows.collect {
        case (_, n, six, span) if n > 0 => six + span - 1
      }.max
      assert(lastTouched + 1 == nSeqs, s"$src sequence count")
    }
  }

  test("mixture: budget rounding and overshoot-by-one convention") {
    val md = MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // 6 en docs of 3 tokens each; totalBudget=20 → en budget = round(20*0.4)=8.
    // Keep docs whose cum_start < 8 in md5(doc_id) order: starts 0,3,6 kept
    // (6 < 8 → third doc kept even though it ends at 9 — overshoot by one).
    val docs = docsDF((1L to 6L).map(i => (i, "a b c", "en", "s")))
    val r = ChunkOps.mixtureSelect(docs, totalBudget = 20L).collect()
    assert(r.length == 1)
    val row = r(0)
    assert(row.getAs[Long]("budget") == 8L)
    assert(row.getAs[Long]("n_kept") == 3L)
    assert(row.getAs[Long]("tokens_kept") == 9L) // > budget: overshoot-by-one
    // the kept set is the md5-order prefix — replicate the ordering by hand
    val order = (1L to 6L).sortBy(i => (hex(i.toString), i))
    val keptIds = ChunkOps.mixtureSelectDocs(docs, totalBudget = 20L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(keptIds == order.take(3).toSet)
  }

  test("chunk: agrees with an independent reference on random docs, any width/stride") {
    val md = MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // driver-side reference of the convention: chunk k covers
    // [k*stride, k*stride+width), k while k*stride < len (min one chunk)
    def ref(text: String, width: Int, stride: Int): Seq[(Long, Long, String)] = {
      val maxIx = math.max((text.length - 1) / stride, 0)
      (0 to maxIx).map { k =>
        val c = text.slice(k * stride, math.min(k * stride + width, text.length))
        (k.toLong, c.length.toLong, hex(c))
      }
    }
    val rnd = new scala.util.Random(42)
    def randText(): String = {
      val n = rnd.nextInt(600) // includes 0: the empty-doc edge
      (1 to n).map(_ => "abcdefghij xyz"(rnd.nextInt(14))).mkString
    }
    // stride > width (gapped sampling) is deliberately included
    for ((width, stride) <- Seq((5, 3), (8, 8), (10, 4), (7, 10), (200, 150))) {
      val docs = (1L to 40L).map(i => (i, randText(), "en", "s"))
      val got = ChunkOps.chunk(docsDF(docs), width, stride)
        .collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3))))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq.sortBy(_._1)).toMap
      val want = docs.map { case (id, text, _, _) => id -> ref(text, width, stride) }.toMap
      assert(got == want, s"chunk($width,$stride) diverged from the reference")
    }
  }

  test("mixture: languages draw from independent budgets") {
    // en budget round(40*0.4)=16, zh budget round(40*0.2)=8; docs of 5 tokens
    // en: starts 0,5,10,15 < 16 → 4 kept; zh: starts 0,5 < 8 → 2 kept
    val docs = docsDF(
      (1L to 4L).map(i => (i, "a b c d e", "en", "s")) ++
        (11L to 13L).map(i => (i, "a b c d e", "zh", "s")))
    val out = ChunkOps.mixtureSelect(docs, totalBudget = 40L).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_kept"),
        r.getAs[Long]("tokens_kept"), r.getAs[Long]("budget"))).toSet
    assert(out == Set(("en", 4L, 20L, 16L), ("zh", 2L, 10L, 8L)))
  }
}
