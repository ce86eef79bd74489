package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Multimodal-column plumbing — SURVEY.md §2b (training-pipeline ops).
  *
  * Media payloads are opaque `binary` columns with typed metadata structs.
  * The decode itself is a clearly-marked deterministic STUB (no image/audio
  * codecs in this container); everything around it — schema, typed Dataset
  * plumbing, per-partition batch processing, frame sampling — is real and
  * hash-checked. At cluster scale the decode stub is the only thing to
  * swap (per-partition JNI/codec call inside mapPartitions).
  *
  * Library surface: `DataFrame => DataFrame` over any frame with
  * `(doc_id: long, text: string)` — the payload column is derived from
  * `text` bytes here; a real corpus supplies its own binary column.
  */
object MultimodalOps {
  type QFn = (SparkSession, String) => DataFrame

  /** Decoded-media metadata produced by the stub decoder. */
  case class MediaMeta(
      doc_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      n_sampled: Int,
      rms: Double)

  /** STUB DECODER — deterministic fake. A real deployment replaces this
    * body with an actual codec call; the signature (bytes in, typed
    * metadata out) and the surrounding Spark plumbing stay unchanged. */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val len = payload.length.toLong
    val width = (64 + len % 512).toInt
    val height = (64 + (len * 7) % 512).toInt
    val nFrames = (1 + len % 30).toInt
    val nSampled = (nFrames - 1) / 5 + 1 // sample every 5th frame from 0
    val rms = (len * 37 % 1000).toDouble / 1000.0
    MediaMeta(docId, width, height, nFrames, nSampled, rms)
  }

  /** q26 — binary ingestion + per-partition decode + metadata projection.
    * Payload = utf-8 bytes of `text` (stands in for image/audio bytes). */
  def mediaMeta(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val withPayload = docs
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
    // mapPartitions: decode is batched per partition (the real-codec shape —
    // amortizes codec init), not per-row UDF.
    withPayload
      .mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
      .toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("n_sampled"), round(col("rms"), 4).as("rms"))
      .orderBy("doc_id")
  }
  val mediaMetaSql: String =
    """SELECT doc_id,
      |  CAST(64 + octet_length(CAST(text AS BLOB)) % 512 AS INT) AS width,
      |  CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 512 AS INT) AS height,
      |  CAST(1 + octet_length(CAST(text AS BLOB)) % 30 AS INT) AS n_frames,
      |  CAST((octet_length(CAST(text AS BLOB)) % 30) // 5 + 1 AS INT) AS n_sampled,
      |  round((octet_length(CAST(text AS BLOB)) * 37 % 1000) / 1000.0, 4) AS rms
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q26b — frame sampling as a generator: one row per sampled frame. */
  def frameSample(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        octet_length(to_binary(col("text"), lit("utf-8"))).as("blen"))
      .withColumn("n_frames", (lit(1) + col("blen") % 30).cast("int"))
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")
  val frameSampleSql: String =
    """SELECT doc_id, unnest(generate_series(0,
      |    CAST(octet_length(CAST(text AS BLOB)) % 30 AS INT), 5)) AS frame_idx
      |FROM documents ORDER BY doc_id, frame_idx""".stripMargin

  /** q26c — resize planning: fit each decoded frame into a 224×224 budget
    * preserving aspect ratio (the preprocessing step in front of a vision
    * encoder). The scale factor and output dims are pure double arithmetic
    * over the decoded metadata — the actual pixel resample belongs in the
    * same per-partition codec stub as the decode. */
  def resizePlan(docs: DataFrame): DataFrame = {
    val decoded = mediaMeta(docs)
    val longest = greatest(col("width"), col("height"))
    val scale = when(longest > 224, lit(224.0) / longest.cast("double"))
      .otherwise(lit(1.0))
    decoded
      .select(col("doc_id"), col("width"), col("height"),
        round(scale, 6).as("scale"),
        floor(col("width").cast("double") * scale).cast("int").as("out_w"),
        floor(col("height").cast("double") * scale).cast("int").as("out_h"))
      .orderBy("doc_id")
  }
  val resizePlanSql: String =
    """WITH m AS (SELECT doc_id,
      |    CAST(64 + octet_length(CAST(text AS BLOB)) % 512 AS INT) AS width,
      |    CAST(64 + (octet_length(CAST(text AS BLOB)) * 7) % 512 AS INT) AS height
      |  FROM documents),
      |s AS (SELECT doc_id, width, height,
      |    CASE WHEN greatest(width, height) > 224
      |         THEN 224.0 / CAST(greatest(width, height) AS DOUBLE)
      |         ELSE 1.0 END AS sc
      |  FROM m)
      |SELECT doc_id, width, height, round(sc, 6) AS scale,
      |  CAST(floor(CAST(width AS DOUBLE) * sc) AS INT) AS out_w,
      |  CAST(floor(CAST(height AS DOUBLE) * sc) AS INT) AS out_h
      |FROM s ORDER BY doc_id""".stripMargin

  /** Multipliers for the stub feature map (distinct odd primes → the 8
    * components differ per payload length). */
  private val FeaturePrimes = Array(7L, 11L, 13L, 17L, 19L, 23L, 29L, 31L)

  /** STUB FEATURE EXTRACTOR — a real deployment computes an actual content
    * embedding here (pooled vision-encoder output); deterministic fake
    * derived from payload length so the oracle can reproduce it. */
  def featureStub(payload: Array[Byte]): Array[Float] = {
    val len = payload.length.toLong
    FeaturePrimes.map(p => ((len * p) % 1000L).toFloat / 1000.0f)
  }

  /** q26d — feature extraction: binary payload → fixed-width Array[Float]
    * feature vector per doc (typed mapPartitions, same codec-batch shape as
    * the decode), then scored against a fixed reference vector with the
    * codegen'd cosine expression — the join point between the multimodal
    * plumbing and the similarity stack. */
  def features(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val refVec = Array.fill(8)(0.5f)
    docs
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, featureStub(bytes)) })
      .toDF("doc_id", "feat")
      .select(col("doc_id"), size(col("feat")).as("dim"),
        round(element_at(col("feat"), 1).cast("double"), 4).as("f0"),
        round(expr("cosine_sim(feat, " +
          s"array(${refVec.map(v => s"CAST($v AS FLOAT)").mkString(",")}))"), 4)
          .as("ref_cos"))
      .orderBy("doc_id")
  }
  val featuresSql: String = {
    // Spark stores the components as float32; replicate by casting the
    // double quotient to REAL, then widening back to DOUBLE for the
    // arithmetic (verified: float32(k)/float32(1000) ==
    // float32(float64(k)/1000) for every k in [0,1000))
    val comps = FeaturePrimes.map(p =>
      "CAST(CAST(CAST((octet_length(CAST(text AS BLOB)) * " + p +
        ") % 1000 AS DOUBLE) / 1000.0 AS REAL) AS DOUBLE)")
    val sumSq = comps.map(c => s"($c) * ($c)").mkString(" + ")
    val dotRef = comps.map(c => s"($c) * 0.5").mkString(" + ")
    s"""SELECT doc_id, 8 AS dim,
       |  round(${comps.head}, 4) AS f0,
       |  round(($dotRef) / (sqrt($sumSq) * sqrt(2.0)), 4) AS ref_cos
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // q156 — perceptual-hash media dedup (dHash over the stub decode)
  // ------------------------------------------------------------------

  /** dHash-style 64-bit perceptual signature (Krawetz's difference
    * hash: downsample to a 9×8 grayscale grid, emit the sign of each
    * horizontal gradient). The DECODE half is the stub seam — the
    * "grayscale grid" is a 72-cell block-mean downsample of the raw
    * byte stream (a real deployment decodes pixels and resizes here;
    * signature math is unchanged) — and the HASH half is the real
    * dHash gradient logic. The block-mean decode preserves dHash's
    * defining locality: one changed byte moves ONE block mean, so at
    * most two gradient bits flip — near-identical payloads land within
    * a small hamming radius, identical payloads at exactly 0. */
  def dHashStub(payload: Array[Byte]): Long = {
    val cells = 72 // 9 columns × 8 rows
    val n = payload.length
    if (n == 0) return 0L
    val means = new Array[Double](cells)
    var i = 0
    while (i < cells) {
      // exact partition of [0, n) — every byte belongs to EXACTLY one
      // block (blocks are empty, mean 0, when n < cells), so a
      // one-byte edit moves one block mean and flips at most the two
      // gradient bits adjacent to that block at ANY payload size; the
      // earlier lo+1 clamp made short-payload blocks overlap and
      // broke that bound
      val lo = (i.toLong * n / cells).toInt
      val hi = ((i + 1).toLong * n / cells).toInt
      if (hi <= lo) means(i) = 0.0
      else {
        var s = 0L
        var j = lo
        while (j < hi) { s += payload(j) & 0xFF; j += 1 }
        means(i) = s.toDouble / (hi - lo)
      }
      i += 1
    }
    var fp = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (means(r * 9 + c + 1) > means(r * 9 + c))
          fp |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    fp
  }

  /** Per-doc perceptual hash — the same typed mapPartitions codec-batch
    * seam as [[mediaMeta]]. */
  def mediaHashes(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, dHashStub(bytes)) })
      .toDF("doc_id", "dhash")
  }

  /** Media near-dup candidate pairs: hamming-banded exactly like the
    * text SimHash path ([[graft.llm.DedupOps.simhash]]). The band
    * count is DERIVED as `maxHamming + 1` so the pigeonhole guarantee
    * holds for any radius: a pair differing in ≤ maxHamming of 64 bits
    * differs in at most maxHamming bands, so with maxHamming+1 bands
    * at least one band matches — no candidate is ever lost. (The
    * default radius 3 gives the same 4×16-bit banding as before.)
    * Verified by exact hamming distance. Never all-pairs: the
    * self-join is per (chunk, key) bucket. */
  def mediaNearDup(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 32,
      s"maxHamming=$maxHamming: banding needs maxHamming+1 <= 32 bands " +
        "over a 64-bit signature (2-bit minimum band width)")
    val nBands = maxHamming + 1
    val bound = (0 to nBands).map(i => i * 64 / nBands)
    val fps = mediaHashes(Tables.fanout(docs))
    val chunks = fps.select(col("doc_id"), col("dhash"),
      posexplode(array((0 until nBands).map { c =>
        val lo = bound(c); val w = bound(c + 1) - lo
        if (w >= 64) col("dhash")
        else shiftright(col("dhash"), lo).bitwiseAND(lit((1L << w) - 1))
      }: _*))
        .as(Seq("chunk", "ckey")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.dhash").bitwiseXOR(col("y.dhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("d1", "d2")
  }

  /** Media keeper table: the perceptual-hash pair graph collapsed by
    * the SAME shared CC machinery the text and embedding dedup paths
    * ride ([[graft.llm.DedupOps.connectedComponents]]) — keeper = min
    * doc_id per near-dup media component, every doc labeled. */
  def mediaDedupKeeper(docs: DataFrame, maxHamming: Int = 3,
      maxIters: Int = 15): DataFrame = {
    val cc = graft.llm.DedupOps.connectedComponents(
      mediaNearDup(docs, maxHamming).select(col("d1"), col("d2")))
    docs.select(col("doc_id"))
      .join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("keeper"), col("doc_id")).as("keeper"))
      .withColumn("is_keeper",
        (col("doc_id") === col("keeper")).cast("int"))
      .orderBy("doc_id")
  }

  /** q156 registry audit — the q23_dedup_simhash precedent: the 64-bit
    * signature is engine-specific, but dHash's STRUCTURAL guarantee is
    * not — byte-identical payloads have identical signatures, share
    * every band, and pass at hamming 0 — so `exact_covered` (exact-
    * duplicate payload pairs found among the perceptual candidates)
    * must EQUAL `n_exact_pairs` (all C(c,2) pairs over md5-payload
    * groups, which both engines count exactly). The probabilistic
    * near-dup behavior (one-byte edits landing within the hamming
    * radius) is pinned in Round16OpsSpec on planted media. */
  def mediaDedupAudit(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    val keyed = Tables.fanout(docs)
      .select(col("doc_id"), md5(to_binary(col("text"), lit("utf-8"))).as("m"))
    val nExact = keyed.groupBy(col("m")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) div 2")), lit(0L))
        .as("n_exact_pairs"))
    val cands = mediaNearDup(docs, maxHamming)
    val exactPairs = keyed.select(col("doc_id").as("d1"), col("m"))
      .join(keyed.select(col("doc_id").as("d2"), col("m").as("m2")),
        col("m") === col("m2") && col("d1") < col("d2"))
      .select(col("d1"), col("d2"))
    val covered = exactPairs.join(cands, Seq("d1", "d2"), "left_semi")
      .agg(count(lit(1)).as("exact_covered"))
    nExact.crossJoin(broadcast(covered))
      .select(col("n_exact_pairs"), col("exact_covered"))
  }

  val mediaDedupAuditSql: String =
    """WITH g AS (SELECT md5(text) AS m, count(*) AS c
      |  FROM documents GROUP BY 1)
      |SELECT CAST(COALESCE(sum((c * (c - 1)) // 2), 0) AS BIGINT)
      |    AS n_exact_pairs,
      |  CAST(COALESCE(sum((c * (c - 1)) // 2), 0) AS BIGINT)
      |    AS exact_covered
      |FROM g""".stripMargin

  private def onDocs(f: DataFrame => DataFrame): QFn =
    (s, d) => f(Tables.documents(s, d))

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q26_media_meta", onDocs(mediaMeta), Some(mediaMetaSql)),
    ("q26_frame_sample", onDocs(frameSample), Some(frameSampleSql)),
    ("q26_resize", onDocs(resizePlan), Some(resizePlanSql)),
    ("q26_features", onDocs(features), Some(featuresSql)),
    ("q156_media_dedup", onDocs(mediaDedupAudit(_)), Some(mediaDedupAuditSql)))
}
