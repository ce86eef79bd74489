package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Takedown propagation — the right-to-be-forgotten / licence-revocation
  * operation a production corpus owes its sources: remove a document set
  * not just from the corpus files but from EVERY derived serving
  * artifact that still references it (retrieval postings, dedup
  * postings, ANN index rows, classifier counts). One logical delete,
  * many physical stores.
  *
  * Contract per store — the same LSM posture as the IVF `_deletes`
  * table (SimilarityOps.deleteFromTrainedIvfIndex): takedown is an
  * O(|ids|) append to a `<table>_takedown` tombstone table (metadata
  * scale, broadcastable); serving anti-joins tombstones out; compaction
  * folds them into the layout in bulk when their share justifies the
  * rewrite. Nothing ever edits a bucketed file in place. Idempotent:
  * re-delivered ids are anti-joined away before the append, so a
  * replayed takedown batch is a no-op.
  *
  * Model state is handled by exact decrement instead of tombstones
  * (ClassifyOps.unlearnFromNbModel) because NB statistics are additive;
  * tombstoning a count table would change serving algebra.
  */
object TakedownOps {
  type QFn = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // Tombstone plumbing shared by the serve indexes
  // ------------------------------------------------------------------

  /** Append fresh ids (anti-joined against the existing tombstones —
    * idempotence under replay) to `<table>_takedown`. */
  def appendTakedown(spark: SparkSession, table: String,
      ids: DataFrame): Unit = {
    val t = s"${table}_takedown"
    val fresh =
      if (spark.catalog.tableExists(t))
        ids.select(col("doc_id")).distinct()
          .join(spark.table(t), Seq("doc_id"), "left_anti")
      else ids.select(col("doc_id")).distinct()
    // localCheckpoint: `fresh` reads the table it appends to
    val materialized = fresh.localCheckpoint()
    if (spark.catalog.tableExists(t))
      materialized.write.mode("append").format("parquet").saveAsTable(t)
    else materialized.write.format("parquet").saveAsTable(t)
  }

  /** The tombstone set, if any takedown ever ran against `table`. */
  def takedownIds(spark: SparkSession, table: String): Option[DataFrame] = {
    val t = s"${table}_takedown"
    if (spark.catalog.tableExists(t)) Some(spark.table(t)) else None
  }

  /** `base` with tombstoned doc_ids anti-joined out (broadcast — the
    * tombstone side is metadata-scale by contract). */
  def liveRows(base: DataFrame, tomb: Option[DataFrame]): DataFrame =
    tomb.fold(base)(t =>
      base.join(broadcast(t.select(col("doc_id")).distinct()),
        Seq("doc_id"), "left_anti"))

  // ------------------------------------------------------------------
  // BM25 serve index (TextOps.writeBm25Index tables)
  // ------------------------------------------------------------------

  /** Tombstone docs out of a persisted BM25 index. df and corpus stats
    * are derived at query time from postings/doclen rows
    * (TextOps.bm25FromIndex), so the anti-join alone restores exact
    * rebuild-without semantics — no stored aggregate to correct. */
  def takedownBm25Index(spark: SparkSession, table: String,
      ids: DataFrame): Unit =
    appendTakedown(spark, table, ids)

  /** Fold BM25 tombstones into the layout: rewrite postings (bucketed
    * by term, as written) and doclen from the live views, drop the
    * tombstone table. */
  def compactBm25Index(spark: SparkSession, table: String,
      nBuckets: Int = 8): Unit = takedownIds(spark, table).foreach { _ =>
    val tomb = takedownIds(spark, table)
    val post = liveRows(spark.table(s"${table}_postings"), tomb)
      .localCheckpoint()
    val dl = liveRows(spark.table(s"${table}_doclen"), tomb)
      .localCheckpoint()
    graft.sources.FileIO.writeParquetBucketed(
      post, s"${table}_postings", nBuckets, "t", Seq("t"))
    graft.sources.FileIO.dropTableAndLocation(spark, s"${table}_doclen")
    dl.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_doclen")
    graft.sources.FileIO.dropTableAndLocation(spark, s"${table}_takedown")
  }

  // ------------------------------------------------------------------
  // Near-dup serve index (DedupOps.writeDedupIndex tables)
  // ------------------------------------------------------------------

  /** Tombstone docs out of a persisted dedup index. Postings/docn are
    * anti-joined at serve; the stored `_df` aggregate is corrected at
    * serve time by negative counts derived from the tombstoned docs'
    * own posting rows (DedupOps.incrementalNearDupServe) — nothing is
    * persisted beyond the id list, so a replayed takedown cannot
    * double-subtract. */
  def takedownDedupIndex(spark: SparkSession, table: String,
      ids: DataFrame): Unit =
    appendTakedown(spark, table, ids)

  /** Fold dedup tombstones in: rewrite postings (bucketed by shingle
    * hash) and docn from the live views, REBUILD `_df` from the
    * compacted postings (the stored aggregate becomes exact again),
    * drop the tombstone table. */
  def compactDedupIndex(spark: SparkSession, table: String,
      nBuckets: Int = 8): Unit = takedownIds(spark, table).foreach { _ =>
    val tomb = takedownIds(spark, table)
    val post = liveRows(spark.table(s"${table}_postings"), tomb)
      .localCheckpoint()
    val docn = liveRows(spark.table(s"${table}_docn"), tomb)
      .localCheckpoint()
    graft.sources.FileIO.writeParquetBucketed(
      post, s"${table}_postings", nBuckets, "h", Seq("h"))
    graft.sources.FileIO.dropTableAndLocation(spark, s"${table}_docn")
    docn.write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_docn")
    graft.sources.FileIO.dropTableAndLocation(spark, s"${table}_df")
    post.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .write.mode("overwrite").format("parquet")
      .saveAsTable(s"${table}_df")
    graft.sources.FileIO.dropTableAndLocation(spark, s"${table}_takedown")
  }

  // ------------------------------------------------------------------
  // q162 — takedown impact audit
  // ------------------------------------------------------------------

  /** q162 — what a takedown of one source touches, per artifact: row
    * counts total/removed/live for the corpus, the BM25 index frames
    * (postings = distinct (doc, term); doclen = docs), the dedup index
    * frames (postings = per-doc distinct shingles; docn = docs), and
    * the embedding store (vec_id ≡ doc_id). ONE corpus scan computes
    * every document-derived arm (the per-doc posting/shingle counts
    * ride the same projection); the embedding arm is a second scan of
    * the (narrow) embeddings table; the MODEL arms (bigram LM and DSIR
    * counts — the artifacts exact unlearning decrements rather than
    * tombstones) each pay one more token-level pass, because "removed"
    * for a count table means NET-ZERO rows: bigrams / feature buckets
    * observed ONLY in the taken-down source, which a per-key group-max
    * decides. This is the PLAN a takedown executes dry-run first — the
    * audit a compliance run files before and after
    * [[takedownBm25Index]]/[[takedownDedupIndex]]/
    * SimilarityOps.deleteFromTrainedIvfIndex and the unlearn calls
    * (TextOps.unlearnFromBigramLm / unlearnFromDsirModel /
    * ClassifyOps.unlearnFromNbModel) fire. The `ivf_model` /
    * `pq_codebook` arms cover the VERBATIM-retention hole those row
    * paths cannot see: model artifacts whose entries are copies/slices
    * of seed vectors, cleared only by
    * SimilarityOps.scrubIndexModelOnTakedown. */
  /** SCOPE of the `ivf_model` / `pq_codebook` arms: they audit the
    * DEFAULT-seeded pipeline — `centroidIds`/`codebookIds` default to
    * SimilarityOps.CentroidIds, matching writeTrainedIvfIndex's and
    * writePqCodes' defaults. An index whose codebook was built with
    * non-default ids (e.g. the 64-entry residual book) must pass its
    * id lists here, or — the per-index source of truth — read
    * SimilarityOps.retainedSeedAudit, which derives exposure from the
    * recorded `<table>_seeds` provenance the scrub itself uses. */
  def takedownAudit(docs: DataFrame, em: DataFrame,
      source: String, refLang: String = "en",
      dsirBuckets: Int = 512,
      centroidIds: Seq[Long] = SimilarityOps.CentroidIds,
      codebookIds: Seq[Long] = SimilarityOps.CentroidIds): DataFrame = {
    val per = Tables.fanout(docs)
      .select((col("source") === lit(source)).as("hit"),
        Text.tokens(col("text")).as("ts"))
      .select(col("hit"),
        size(array_distinct(col("ts"))).cast("long").as("np"),
        size(Text.shingles(col("ts"), DedupOps.K)).cast("long").as("ns"))
    val a = per.agg(
      count(lit(1)).as("docs_t"),
      sum(when(col("hit"), 1L).otherwise(0L)).as("docs_r"),
      sum(col("np")).as("post_t"),
      sum(when(col("hit"), col("np")).otherwise(0L)).as("post_r"),
      sum(col("ns")).as("sh_t"),
      sum(when(col("hit"), col("ns")).otherwise(0L)).as("sh_r"))
    // left join keeps all em rows; removed = those matching a takedown id
    val e = em.join(
        broadcast(docs.filter(col("source") === lit(source))
          .select(col("doc_id").as("vec_id")).distinct()
          .withColumn("_m", lit(1))),
        Seq("vec_id"), "left")
      .agg(count(lit(1)).as("em_t"),
        sum(when(col("_m").isNotNull, 1L).otherwise(0L)).as("em_r"))
    // bigram-LM arm: the count table's (bigram) keys over the reference
    // slice; removed = keys occurring ONLY in the taken-down source
    // (their net count reaches zero under exact unlearning)
    val lm = Tables.fanout(docs).filter(col("lang") === lit(refLang))
      .select((col("source") === lit(source)).as("hit"),
        explode(Text.ngramOccurrences(Text.tokens(col("text")), 2))
          .as("bg"))
      .groupBy(col("bg"))
      .agg(max(when(!col("hit"), 1).otherwise(0)).as("keep"))
      .agg(count(lit(1)).as("lm_t"),
        sum(when(col("keep") === 0, 1L).otherwise(0L)).as("lm_r"))
    // DSIR arm: observed feature buckets; removed = buckets fed only by
    // the taken-down source
    val ds = Tables.fanout(docs)
      .select((col("source") === lit(source)).as("hit"),
        explode(Text.tokens(col("text"))).as("tok"))
      .withColumn("b", TextOps.dsirBucket(col("tok"), dsirBuckets))
      .groupBy(col("b"))
      .agg(max(when(!col("hit"), 1).otherwise(0)).as("keep"))
      .agg(count(lit(1)).as("ds_t"),
        sum(when(col("keep") === 0, 1L).otherwise(0L)).as("ds_r"))
    // ANN model-artifact arms: the trained-IVF `_model` centroids and
    // the `_pqcodebook` entries DERIVE FROM (verbatim at iters=0 /
    // always for codebook slices) the fixed SEED vectors — a takedown
    // that hits a seed leaves its exact floats in the serving model
    // until SimilarityOps.scrubIndexModelOnTakedown re-elects and
    // rebuilds. rows_removed here = seeds this takedown hits, i.e.
    // the retained-verbatim exposure the scrub must clear.
    def seedArm(ids: Seq[Long], t: String, r: String) = em.filter(
        col("vec_id").isin(ids: _*))
      .join(broadcast(docs.filter(col("source") === lit(source))
          .select(col("doc_id").as("vec_id")).distinct()
          .withColumn("_m", lit(1))),
        Seq("vec_id"), "left")
      .agg(count(lit(1)).as(t),
        // coalesce: a corpus with NO seed vectors at all must report
        // (0, 0), not (0, null) — sum over zero rows is null
        coalesce(sum(when(col("_m").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as(r))
    // the two arms audit their OWN id lists — identical only in the
    // default-seeded pipeline (see the scope note above)
    val sd = seedArm(centroidIds, "sd_t", "sd_r")
    val cd = seedArm(codebookIds, "cd_t", "cd_r")
    def art(name: String, t: org.apache.spark.sql.Column,
        r: org.apache.spark.sql.Column) =
      struct(lit(name).as("artifact"), t.as("rows_total"),
        r.as("rows_removed"))
    a.crossJoin(broadcast(e))
      .crossJoin(broadcast(lm)).crossJoin(broadcast(ds))
      .crossJoin(broadcast(sd)).crossJoin(broadcast(cd))
      .select(explode(array(
        art("bigram_lm", col("lm_t"), col("lm_r")),
        art("bm25_doclen", col("docs_t"), col("docs_r")),
        art("bm25_postings", col("post_t"), col("post_r")),
        art("corpus", col("docs_t"), col("docs_r")),
        art("dedup_docn", col("docs_t"), col("docs_r")),
        art("dedup_postings", col("sh_t"), col("sh_r")),
        art("dsir_counts", col("ds_t"), col("ds_r")),
        art("embeddings", col("em_t"), col("em_r")),
        art("ivf_model", col("sd_t"), col("sd_r")),
        art("pq_codebook", col("cd_t"), col("cd_r")))).as("x"))
      .select(col("x.artifact").as("artifact"),
        col("x.rows_total").as("rows_total"),
        col("x.rows_removed").as("rows_removed"),
        (col("x.rows_total") - col("x.rows_removed")).as("rows_live"))
      .orderBy(col("artifact"))
  }

  /** q162 fixture source. */
  val TakedownSource = "src7"

  val takedownAuditSql: String = {
    val toks = Text.tokensSql("text")
    s"""WITH per AS (SELECT source = '$TakedownSource' AS hit,
       |    len(list_distinct(toks)) AS np,
       |    len(${Text.shinglesSql("toks", DedupOps.K)}) AS ns
       |  FROM (SELECT source, $toks AS toks FROM documents)),
       |a AS (SELECT count(*) AS docs_t,
       |    sum(CASE WHEN hit THEN 1 ELSE 0 END) AS docs_r,
       |    sum(np) AS post_t,
       |    sum(CASE WHEN hit THEN np ELSE 0 END) AS post_r,
       |    sum(ns) AS sh_t,
       |    sum(CASE WHEN hit THEN ns ELSE 0 END) AS sh_r FROM per),
       |e AS (SELECT count(*) AS em_t,
       |    sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS em_r
       |  FROM embeddings em LEFT JOIN (
       |    SELECT DISTINCT doc_id FROM documents
       |    WHERE source = '$TakedownSource') d ON em.vec_id = d.doc_id),
       |lmocc AS (SELECT hit, unnest(${Text.ngramOccurrencesSql("toks", 2)})
       |    AS bg
       |  FROM (SELECT source = '$TakedownSource' AS hit, $toks AS toks
       |    FROM documents WHERE lang = 'en')),
       |lm AS (SELECT count(*) AS lm_t,
       |    sum(CASE WHEN keep = 0 THEN 1 ELSE 0 END) AS lm_r FROM (
       |  SELECT bg, max(CASE WHEN hit THEN 0 ELSE 1 END) AS keep
       |  FROM lmocc GROUP BY bg)),
       |dsb AS (SELECT hit,
       |    CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) % 512 AS b
       |  FROM (SELECT source = '$TakedownSource' AS hit,
       |    unnest($toks) AS tok FROM documents)),
       |ds AS (SELECT count(*) AS ds_t,
       |    sum(CASE WHEN keep = 0 THEN 1 ELSE 0 END) AS ds_r FROM (
       |  SELECT b, max(CASE WHEN hit THEN 0 ELSE 1 END) AS keep
       |  FROM dsb GROUP BY b)),
       |sd AS (SELECT count(*) AS sd_t,
       |    coalesce(sum(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END),
       |      0) AS sd_r
       |  FROM embeddings em LEFT JOIN (
       |    SELECT DISTINCT doc_id FROM documents
       |    WHERE source = '$TakedownSource') d ON em.vec_id = d.doc_id
       |  WHERE em.vec_id IN (${SimilarityOps.CentroidIds.mkString(", ")}))
       |SELECT artifact, CAST(rows_total AS BIGINT) AS rows_total,
       |  CAST(rows_removed AS BIGINT) AS rows_removed,
       |  CAST(rows_total - rows_removed AS BIGINT) AS rows_live
       |FROM (
       |  SELECT 'bigram_lm' AS artifact, lm_t AS rows_total,
       |    lm_r AS rows_removed FROM lm
       |  UNION ALL SELECT 'bm25_doclen', docs_t, docs_r FROM a
       |  UNION ALL SELECT 'bm25_postings', post_t, post_r FROM a
       |  UNION ALL SELECT 'corpus', docs_t, docs_r FROM a
       |  UNION ALL SELECT 'dedup_docn', docs_t, docs_r FROM a
       |  UNION ALL SELECT 'dedup_postings', sh_t, sh_r FROM a
       |  UNION ALL SELECT 'dsir_counts', ds_t, ds_r FROM ds
       |  UNION ALL SELECT 'embeddings', em_t, em_r FROM e
       |  UNION ALL SELECT 'ivf_model', sd_t, sd_r FROM sd
       |  UNION ALL SELECT 'pq_codebook', sd_t, sd_r FROM sd)
       |ORDER BY artifact""".stripMargin
  }

  // ------------------------------------------------------------------
  // Registry adapters
  // ------------------------------------------------------------------

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q162_takedown_audit",
      (s: SparkSession, d: String) =>
        takedownAudit(Tables.documents(s, d), Tables.embeddings(s, d),
          TakedownSource),
      Some(takedownAuditSql)))
}
