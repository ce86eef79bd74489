package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{ChunkOps, DedupOps, TextOps}
import graft.operators.{ManifestOps, QualityOps}

/** The end-to-end training-data pipeline: the canonical corpus path every
  * stage of which ships (and is oracle-verified) individually —
  *
  *   raw → normalize (q25's transform) → fail-loud constraint gate
  *   (q40's suite over the corpus schema — a broken invariant aborts
  *   the RUN, it never ships a partial corpus) → Gopher quality gate
  *   (q70's rules, row-level) → near-dup dedup with keep-min-id
  *   keepers (q23) → eval-set decontamination (q23_contamination —
  *   docs sharing ≥ minFrac of their shingles with the benchmark set
  *   are dropped) → token-budget mixture selection (q34c) → token
  *   chunking (q34a2) + packing audit (q34b)
  *
  * — chained under ONE manifest discipline: every stage boundary lands
  * on storage and is fingerprinted with the q41 order-invariant content
  * hash, so a re-run (or a replica on another cluster) proves
  * byte-equivalence stage by stage, and any divergence names the first
  * stage that drifted. A final row-fate audit accounts for every input
  * document exactly once (kept, or dropped at the first gate that
  * dropped it) — the no-silent-loss property a curation run signs off
  * on. The reference delegates per-record processing to consumer
  * callbacks (reference src/Kinesis/Kinesis.hs:42-176); this app is the
  * canonical shape those callbacks compose into for LLM corpus prep.
  *
  * Scale shape: each stage is the already-audited operator plan (no new
  * joins or shuffles are introduced here); stage boundaries write
  * parquet and READ BACK, so no stage pays a predecessor's lineage
  * twice and a failed stage restarts from the last boundary — the
  * checkpoint discipline a 100 TB run needs anyway. Manifests and fate
  * counts are metadata-scale rollups of frames the stages already
  * produce.
  */
object PipelineApp {

  /** Content columns every corpus-stage manifest hashes (exact-typed —
    * the q41 contract). */
  private val ManifestCols = Seq("doc_id", "text", "lang", "n_chars")

  private def oneManifest(stage: String, df: DataFrame,
      cols: Seq[String]): DataFrame =
    ManifestOps.manifest(df, Seq.empty, cols)
      .select(lit(stage).as("stage"), col("n"), col("fingerprint"))

  /** Stage 1: the canonical cleaning map, with `n_chars` re-derived so
    * downstream length-based logic sees the cleaned text. */
  def normalize(docs: DataFrame): DataFrame =
    docs.withColumn("text", TextOps.normalizeText(col("text")))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Stage 2: per-document Gopher gate — keep docs passing all four
    * rules; the flags come from the same expression battery q70
    * aggregates. */
  def qualityGate(docs: DataFrame): DataFrame =
    TextOps.gopherFlags(docs)
      .filter(col("_wc") && col("_mwl") && col("_stop") && col("_rep"))
      .select(docs.columns.map(col): _*)

  /** The fail-loud schema/invariant gate (q40's machinery over the
    * corpus table): key uniqueness and completeness, the normalize
    * postcondition (`n_chars` = cleaned length), and non-negative
    * length. One scan, a bounded verdict frame. */
  def corpusGate(docs: DataFrame): DataFrame =
    QualityOps.check(docs, Seq(
      QualityOps.unique("doc_id"),
      QualityOps.complete("doc_id"),
      QualityOps.complete("text"),
      QualityOps.satisfies("n_chars_consistent",
        col("n_chars") === length(col("text"))),
      QualityOps.inRange("n_chars", 0, 1e9)))

  /** ExactSubstr span removal (q158) applied AFTER doc-level dedup:
    * the keeper pass drops whole near-dup docs, but boilerplate spans
    * repeated ACROSS surviving docs (navbars, license headers, quoted
    * passages) are invisible to it — this stage excises them from the
    * text itself (Lee et al. '21's treatment) and drops docs cleaned
    * to empty. `n_chars` is re-derived so downstream length logic sees
    * the cleaned text; every other column rides through. */
  def spanClean(docs: DataFrame, k: Int = 5): DataFrame =
    docs.drop("text")
      .join(TextOps.exactSubstrClean(docs, k, sorted = false)
        .select(col("doc_id"), col("clean_text").as("text")),
        Seq("doc_id"))
      .filter(length(col("text")) > 0)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select(docs.columns.map(col): _*)

  /** Stage 4: drop training docs contaminated by the eval/benchmark
    * set — ≥ `minFrac` of their shingles appear in it (q23_contamination
    * inverted into a keep-filter; the eval shingle set is tiny next to
    * the corpus and broadcast-able, so the corpus streams through one
    * hash join — no pair space). */
  def decontaminate(docs: DataFrame, evalDocs: DataFrame,
      minFrac: Double = 0.1): DataFrame =
    docs.join(
      DedupOps.contamination(docs, evalDocs, minFrac = minFrac)
        .select("doc_id"),
      Seq("doc_id"), "left_anti")

  /** Stage 5: keep exactly the mixture-selected docs (q34c's doc-level
    * view; the semi join is on the slim selected-id set). */
  def mixtureGate(docs: DataFrame, totalBudget: Long): DataFrame =
    docs.join(
      ChunkOps.mixtureSelectDocs(docs, totalBudget).select("doc_id"),
      Seq("doc_id"), "left_semi")

  final case class StageOut(name: String, dir: String, df: DataFrame)

  /** Run the full pipeline from `sfDir`'s documents table into
    * `outDir`: per-stage corpus parquet + one `manifests` table (stage,
    * rows, fingerprint), one `row_fates` table, the final `chunks`
    * training output and the q34b `packing` audit. Returns the manifest
    * frame (already materialized).
    *
    * `resume = true` makes the stage boundaries actual restart points:
    * a boundary whose parquet landed completely (`_SUCCESS`) is reused
    * as-is and only missing boundaries recompute — the checkpoint
    * discipline a 100 TB run needs (a failure in stage 5 must not
    * re-pay stages 1–4). Resume TRUSTS landed bytes; the manifest
    * table is the audit for that trust — every stage is
    * re-fingerprinted from the landed frames on every run (resumed or
    * not), so a stale/foreign boundary shows up as a fingerprint
    * divergence against the reference run, named by stage. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
      totalBudget: Long = 8000L,
      evalDocs: Option[DataFrame] = None,
      resume: Boolean = false): DataFrame = {
    // Hadoop FS, not java.io.File: boundaries live wherever the run
    // writes (HDFS/S3/local) — the RollupStreamApp listing lesson
    def landedOk(dir: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(dir, "_SUCCESS")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    def materialize(dir: String, f: => DataFrame): Unit =
      if (!(resume && landedOk(dir))) {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").parquet(dir)
        println(f"[pipeline-stage] boundary=$dir " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      } else println(s"[pipeline-stage] boundary=$dir resumed")
    val stages = Seq[(String, Seq[StageOut] => DataFrame)](
      "normalized" -> (acc => normalize(acc.last.df)),
      "quality_gated" -> (acc => qualityGate(acc.last.df)),
      "deduped" -> (acc => DedupOps.dedupCorpus(acc.last.df)),
      "span_cleaned" -> (acc => spanClean(acc.last.df)),
      // the eval set is an EXTERNAL input in production; absent one,
      // the q23_contamination registry convention stands in (the top
      // 10% of raw ids play the benchmark set — scale-proportional)
      "decontaminated" -> (acc => decontaminate(acc.last.df,
        evalDocs.getOrElse {
          val cut = acc.head.df.agg(
            (max(col("doc_id")) * 9 / 10).cast("long")).first().getLong(0)
          acc.head.df.filter(col("doc_id") >= cut)
        })),
      "mixture_selected" -> (acc => mixtureGate(acc.last.df, totalBudget)))

    // each boundary lands on storage and the next stage reads the
    // landed bytes — the fingerprint then covers what was actually
    // persisted, not a lineage that might recompute differently
    val raw = graft.core.Tables.documents(spark, sfDir)
    val landed = stages.foldLeft(Seq(StageOut("raw", sfDir, raw))) {
      case (acc, (name, f)) =>
        val dir = s"$outDir/corpus/$name"
        materialize(dir, f(acc))
        val out = acc :+ StageOut(name, dir, spark.read.parquet(dir))
        // the fail-loud invariant gate sits on the landed normalized
        // corpus: a broken schema invariant aborts the run HERE, before
        // any downstream stage spends compute on (or ships) a corpus
        // that violates its own contract — the q43-style quarantine
        // path is for row-level quality, this gate is for corruption.
        // The VERDICT re-checks on resume too (it reads the landed
        // gate frame — a bounded |constraints|-row collect).
        if (name == "normalized") {
          val gateDir = s"$outDir/gate"
          materialize(gateDir, corpusGate(out.last.df))
          val verdict = spark.read.parquet(gateDir)
          val failed = verdict.filter(col("passed") === 0)
            .select(col("constraint"), col("violations"))
            .collect()
          require(failed.isEmpty,
            s"corpus gate failed, run aborted: " +
              failed.map(r => s"${r.getString(0)}=${r.getLong(1)}")
                .mkString(", "))
        }
        out
    }

    // final training artifacts off the selected corpus
    val selected = landed.last.df
    val chunksDir = s"$outDir/chunks"
    materialize(chunksDir, ChunkOps.chunkTokens(selected))
    val chunks = spark.read.parquet(chunksDir)
    materialize(s"$outDir/packing", ChunkOps.packingStats(selected))
    // the q142 schedule manifest over the selected corpus — the
    // easy→hard launch order a trainer consumes alongside the chunks
    materialize(s"$outDir/curriculum",
      TextOps.curriculumSchedule(selected))

    val manifests = landed
      .map(s => oneManifest(s.name, s.df, ManifestCols))
      .reduce(_.unionByName(_))
      .unionByName(oneManifest("chunks", chunks,
        Seq("doc_id", "chunk_ix", "chunk_tok", "chunk_md5")))
      // exact-typed columns only (the q41 contract): the rounded
      // quality bounds stay out of the fingerprint
      .unionByName(oneManifest("curriculum",
        spark.read.parquet(s"$outDir/curriculum"),
        Seq("stage", "n_docs", "sum_tokens")))
      // the gate verdict is corpus metadata, but it versions with the
      // run like any boundary: a replica proving byte-equivalence
      // proves it passed the SAME checks with the SAME outcome
      .unionByName(oneManifest("gate",
        spark.read.parquet(s"$outDir/gate"),
        Seq("constraint", "violations", "passed")))
    manifests.coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/manifests")

    rowFates(landed).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/row_fates")
    spark.read.parquet(s"$outDir/manifests")
  }

  /** Every input doc_id accounted once: `kept`, or `dropped_<stage>`
    * for the FIRST boundary it failed to cross. Uses the landed frames,
    * so each membership probe is a slim-id broadcast-ready join, not a
    * pipeline recomputation. */
  private def rowFates(landed: Seq[StageOut]): DataFrame = {
    val base = landed.head.df.select(col("doc_id"))
    val flagged = landed.tail.foldLeft(base) { (acc, s) =>
      acc.join(s.df.select(col("doc_id"), lit(1).as(s"_in_${s.name}")),
        Seq("doc_id"), "left")
    }
    val fate = landed.tail.foldLeft(when(lit(false), "")) { (acc, s) =>
      acc.when(col(s"_in_${s.name}").isNull, s"dropped_${s.name}")
    }.otherwise("kept")
    flagged.select(col("doc_id"), fate.as("fate"))
      .groupBy(col("fate")).agg(count(lit(1)).as("n_docs"))
      .orderBy("fate")
  }

  /** CLI: `runMain graft.app.PipelineApp <sfDir> <outDir> [budget]
    * [resume]`. */
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("target/pipeline_out")
    val budget = args.lift(2).map(_.toLong).getOrElse(8000L)
    val resume = args.lift(3).contains("resume")
    val spark = graft.core.Sessions.get(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    graft.core.Sessions.sizeShufflePartitionsFor(spark, sfDir)
    val m = run(spark, sfDir, outDir, budget, resume = resume)
    m.orderBy("stage").collect().foreach(r =>
      println(s"[pipeline] stage=${r.getString(0)} rows=${r.getLong(1)} " +
        s"fingerprint=${r.getLong(2)}"))
    spark.stop()
  }
}
