package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.GraftFunctions

/** Deduplication operators over `documents` — SURVEY.md §2b Q23 plus the
  * training-pipeline extensions (SimHash, embedding near-dup).
  *
  * Algorithms (public literature): MinHash resemblance sketching — Broder,
  * "On the resemblance and containment of documents" (SEQUENCES 1997);
  * LSH banding — Indyk & Motwani (STOC 1998) / Gionis et al. (VLDB 1999);
  * SimHash — Charikar, "Similarity estimation techniques from rounding
  * algorithms" (STOC 2002), applied to web-scale dedup in Manku et al.
  * (WWW 2007).
  *
  * Scale notes (100 TB posture):
  *  - exact dedup = hash + groupBy (one shuffle on a 16-byte key);
  *  - near-dup never materializes the O(n²) pair space: the exact-Jaccard
  *    path joins on an inverted shingle index (pairs sharing ≥1 shingle),
  *    the MinHash path joins on LSH band buckets (pairs sharing a band) and
  *    then verifies candidates exactly — so the only quadratic term is
  *    per-bucket, controlled by band width;
  *  - embedding near-dup blocks on `label` (a cheap clustering surrogate)
  *    instead of a full cross join.
  */
object DedupOps {
  type QFn = (SparkSession, String) => DataFrame

  private val K = 5            // shingle width (tokens)
  private val JaccardThreshold = 0.8
  // MinHash family parameters (128 hashes, 32×4 banding) live with the
  // codegen'd expression: graft.functions.MinHashBands

  /** One row per doc: distinct 5-gram shingle hashes via the codegen'd
    * ShingleHashes expression — a single tight pass over the text per plan
    * branch, 8-byte downstream join keys instead of shingle strings. */
  private def shingleHashes(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.fanout(Tables.documents(s, d)).select(col("doc_id"),
      expr(s"shingle_hashes(text, $K)").as("hs"))
  }

  /** Oracle fragment shared by the exact and MinHash paths: all pairs with
    * 5-gram-shingle Jaccard >= 0.8, via an inverted shingle index. */
  private val jaccardOracle: String =
    s"""WITH tok AS (SELECT doc_id, ${Text.tokensSql("text")} AS ts FROM documents),
       |sh AS (SELECT doc_id, unnest(${Text.shinglesSql("ts", K)}) AS sh FROM tok),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1, d2,
       |  round(inter / (s1.n + s2.n - inter), 4) AS jaccard
       |FROM pairs
       |JOIN sizes s1 ON s1.doc_id = d1
       |JOIN sizes s2 ON s2.doc_id = d2
       |WHERE inter / (s1.n + s2.n - inter) >= $JaccardThreshold
       |ORDER BY d1, d2""".stripMargin

  /** q23a — exact dedup: md5 content hash → keep-first per group, plus a
    * corpus summary row (the corpus has no exact dups, so the per-group
    * output alone would be empty; the summary keeps the check meaningful). */
  def exactDedup(s: SparkSession, d: String): DataFrame = {
    val groups = Tables.documents(s, d)
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("content_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper"))
    groups.agg(
        count(lit(1)).as("n_unique"),
        sum(col("n_copies")).as("n_docs"),
        sum(when(col("n_copies") > 1, 1).otherwise(0)).as("n_dup_groups"),
        sum(col("n_copies") - 1).as("n_removed"))
      .select(col("n_docs"), col("n_unique"), col("n_dup_groups"), col("n_removed"))
  }
  val exactDedupSql: String =
    """WITH g AS (SELECT md5(text) AS content_hash, count(*) AS n_copies
      |  FROM documents GROUP BY 1)
      |SELECT CAST(sum(n_copies) AS BIGINT) AS n_docs, count(*) AS n_unique,
      |  CAST(sum(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_groups,
      |  CAST(sum(n_copies - 1) AS BIGINT) AS n_removed
      |FROM g""".stripMargin

  /** Exact Jaccard over the inverted shingle index (ground truth for the
    * LSH path; itself a legitimate distributed near-dup operator).
    *
    * The shingle table feeds three plan branches (inverted index ×2 sides,
    * sizes), so it is persisted — the 100 TB analog is materializing the
    * signature table once before the self-join rather than re-scanning the
    * corpus per branch. */
  def ngramJaccard(s: SparkSession, d: String): DataFrame = {
    val hs = shingleHashes(s, d).persist()
    val sh = hs.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = hs.select(col("doc_id"), size(col("hs")).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    val s1 = sizes.select(col("doc_id").as("d1"), col("n").as("n1"))
    val s2 = sizes.select(col("doc_id").as("d2"), col("n").as("n2"))
    pairs.join(broadcast(s1), "d1").join(broadcast(s2), "d2")
      .withColumn("jac", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** q23b — MinHash + LSH banding: signature → band buckets → candidate
    * pairs → exact-Jaccard verification. With 32×4 banding, P(miss) at
    * j=0.8 is (1−0.8⁴)³² ≈ 5e-8, so the verified output equals the exact
    * path (which is the oracle). */
  def minhashLsh(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    // The shingle table feeds the banding branch plus both verification
    // sides; persist it so the text is shingled once (at cluster scale this
    // is the materialized signature table).
    val hs0 = shingleHashes(s, d).persist()
    // Per doc: 32 LSH band keys from the 128-component MinHash signature,
    // computed row-local by the codegen'd MinHashBands expression — the only
    // shuffles in the whole operator are the bucket self-join and the
    // candidate→array verification join.
    val buckets = hs0.filter(size(col("hs")) > 0)
      .select(col("doc_id"),
        posexplode(expr("minhash_bands(hs)")).as(Seq("band", "bkey")))
    val candidates = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // exact Jaccard verification on the per-doc hash sets (arrays are
    // already distinct, so |intersect| / (n1 + n2 − |intersect|) is the
    // set Jaccard the oracle computes over shingle strings)
    val h1 = hs0.select(col("doc_id").as("d1"), col("hs").as("hs1"))
    val h2 = hs0.select(col("doc_id").as("d2"), col("hs").as("hs2"))
    candidates.join(h1, "d1").join(h2, "d2")
      .select(col("d1"), col("d2"),
        size(array_intersect(col("hs1"), col("hs2"))).as("inter"),
        size(col("hs1")).as("n1"), size(col("hs2")).as("n2"))
      .withColumn("jac", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** q23e — edit-distance near-dup verification: shingle-overlap candidates
    * (Jaccard ≥ 0.5 prefilter — cheap, on the already-materialized hash
    * sets) verified by relative Levenshtein distance ≤ 20% of the longer
    * text. The expensive O(len²) edit distance only ever runs on the
    * candidate pairs, never the corpus cross product. */
  def levenshteinDedup(s: SparkSession, d: String): DataFrame = {
    val hs = shingleHashes(s, d).persist()
    val sh = hs.select(col("doc_id"), explode(col("hs")).as("h"))
    val sizes = hs.select(col("doc_id"), size(col("hs")).as("n"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    val s1 = sizes.select(col("doc_id").as("d1"), col("n").as("n1"))
    val s2 = sizes.select(col("doc_id").as("d2"), col("n").as("n2"))
    val cand = pairs.join(broadcast(s1), "d1").join(broadcast(s2), "d2")
      .filter(col("inter") / (col("n1") + col("n2") - col("inter")) >= 0.5)
      .select("d1", "d2")
    val ta = Tables.documents(s, d).select(col("doc_id").as("d1"), col("text").as("ta"))
    val tb = Tables.documents(s, d).select(col("doc_id").as("d2"), col("text").as("tb"))
    cand.join(ta, "d1").join(tb, "d2")
      .withColumn("ld", levenshtein(col("ta"), col("tb")))
      .filter(col("ld") <= lit(0.2) * greatest(length(col("ta")), length(col("tb"))))
      .select(col("d1"), col("d2"), col("ld"))
      .orderBy("d1", "d2")
  }
  val levenshteinDedupSql: String =
    s"""WITH tok AS (SELECT doc_id, ${Text.tokensSql("text")} AS ts FROM documents),
       |sh AS (SELECT doc_id, unnest(${Text.shinglesSql("ts", K)}) AS sh FROM tok),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |cand AS (
       |  SELECT d1, d2 FROM pairs
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE inter / (s1.n + s2.n - inter) >= 0.5)
       |SELECT d1, d2, levenshtein(a.text, b.text) AS ld
       |FROM cand
       |JOIN documents a ON a.doc_id = d1
       |JOIN documents b ON b.doc_id = d2
       |WHERE levenshtein(a.text, b.text)
       |  <= 0.2 * greatest(length(a.text), length(b.text))
       |ORDER BY d1, d2""".stripMargin

  /** q23c — SimHash near-dup (no SQL oracle: the 64-bit token hash is not
    * reproducible in DuckDB; rows-only check + ScalaTest asserts it finds
    * every exact-duplicate pair). 64-bit fingerprint, banding on 4×16-bit
    * chunks, hamming-distance ≤ 3 verification. */
  def simhash(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val fps = Tables.fanout(Tables.documents(s, d))
      .select(col("doc_id"), expr("simhash64(text)").as("simhash"))
    val chunks = fps.select(col("doc_id"), col("simhash"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("simhash"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ckey")))
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ckey") === col("y.ckey")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= 3)
      .orderBy("d1", "d2")
  }

  /** q23d — embedding-cosine near-dup, blocked on `label`. Oracle uses the
    * same sequential-double cosine formula as CosineSimilarity. */
  def embeddingNearDup(s: SparkSession, d: String): DataFrame = {
    GraftFunctions.register(s)
    val em = Tables.embeddings(s, d)
    val a = em.select(col("label"), col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = em.select(col("label").as("label2"), col("vec_id").as("v2"), col("embedding").as("e2"))
    a.join(b, col("label") === col("label2") && col("v1") < col("v2"))
      .withColumn("cos", expr("cosine_sim(e1, e2)"))
      .filter(col("cos") >= CosineThreshold)
      .select(col("v1"), col("v2"), round(col("cos"), 4).as("cos"))
      .orderBy("v1", "v2")
  }
  /** Similarity threshold for "near-dup" embedding pairs. The synthetic
    * corpus tops out at ~0.47 same-label cosine, so 0.4 both exercises the
    * operator and sits >1e-4 from every pair (no float-boundary hazard). */
  private val CosineThreshold = 0.4

  val embeddingNearDupSql: String =
    """WITH n AS (SELECT vec_id, label, embedding,
      |  sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
      |    (acc, v) -> acc + v)) AS nrm
      |  FROM embeddings)
      |SELECT a.vec_id AS v1, b.vec_id AS v2,
      |  round(list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |      list_transform(generate_series(1, len(a.embedding)),
      |        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |      (acc, v) -> acc + v) / (a.nrm * b.nrm), 4) AS cos
      |FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      |WHERE list_reduce(list_prepend(CAST(0 AS DOUBLE),
      |    list_transform(generate_series(1, len(a.embedding)),
      |      i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))),
      |    (acc, v) -> acc + v) / (a.nrm * b.nrm) >= 0.4
      |ORDER BY v1, v2""".stripMargin

  /** q23f — dedup resolution: the near-dup pair graph collapsed to one
    * canonical keeper (min doc_id) per connected component, via iterative
    * min-label propagation — each round is one join + one aggregation, and
    * rounds needed = component diameter (≤3 for real dup clusters, capped
    * at 15 with an early-convergence check). This is the operator you
    * actually run at 100 TB: emitting all O(k²) pairs of a k-way dup group
    * (what the pair queries do) is fine for auditing but quadratic in
    * group size; the keeper assignment is linear. */
  def dedupKeeper(s: SparkSession, d: String): DataFrame = {
    val pairs = ngramJaccard(s, d).select(col("d1"), col("d2"))
    val edges = pairs.unionByName(
      pairs.select(col("d2").as("d1"), col("d1").as("d2"))).persist()
    var labels = edges.select(col("d1").as("id")).distinct()
      .withColumn("lab", col("id")).persist()
    var iter = 0
    var converged = false
    while (iter < 15 && !converged) {
      val nbrMin = edges.join(labels, edges("d2") === labels("id"))
        .groupBy(col("d1").as("id")).agg(min(col("lab")).as("nbr_lab"))
      val next = labels.join(nbrMin, "id")
        .select(col("id"), least(col("lab"), col("nbr_lab")).as("lab"))
        .persist()
      converged = next.join(labels.withColumnRenamed("lab", "old_lab"), "id")
        .filter(col("lab") =!= col("old_lab")).isEmpty
      labels = next
      iter += 1
    }
    labels.select(col("id").as("doc_id"), col("lab").as("keeper"))
      .orderBy("doc_id")
  }
  val dedupKeeperSql: String =
    s"""WITH RECURSIVE tok AS (SELECT doc_id, ${Text.tokensSql("text")} AS ts FROM documents),
       |sh AS (SELECT doc_id, unnest(${Text.shinglesSql("ts", K)}) AS sh FROM tok),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT d1, d2 FROM p
       |  JOIN sizes s1 ON s1.doc_id = d1
       |  JOIN sizes s2 ON s2.doc_id = d2
       |  WHERE inter / (s1.n + s2.n - inter) >= $JaccardThreshold),
       |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
       |  UNION ALL SELECT d2, d1 FROM pairs),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
       |SELECT src AS doc_id, least(src, min(dst)) AS keeper
       |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q23_dedup_exact", exactDedup _, Some(exactDedupSql)),
    ("q23_dedup_ngram_jaccard", ngramJaccard _, Some(jaccardOracle)),
    ("q23_dedup_minhash_lsh", minhashLsh _, Some(jaccardOracle)),
    ("q23_dedup_simhash", simhash _, None),
    ("q23_dedup_levenshtein", levenshteinDedup _, Some(levenshteinDedupSql)),
    ("q23_dedup_keeper", dedupKeeper _, Some(dedupKeeperSql)),
    ("q23_dedup_embedding", embeddingNearDup _, Some(embeddingNearDupSql)))
}
