package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Constructing a registry query must not run Spark jobs: a driver action
  * at construction time (the old `.agg(max).first` split in DedupOps) costs
  * an extra scheduler round-trip per invocation and breaks lazy plan
  * composition — callers embedding a registry query into a larger plan
  * would trigger hidden work. Splits must ride in-plan as broadcast
  * scalars (the q17 pattern).
  *
  * Two kinds of construction-time jobs are legitimate and exempted:
  *  - first-touch parquet footer/schema reads (one per table per session;
  *    memoized by Tables.load) — pre-warmed here before counting;
  *  - the iterative connected-components queries (q23_dedup_keeper /
  *    q23_dedup_corpus), whose label-propagation loop materializes each
  *    round through an eager localCheckpoint by design (bounded plan
  *    depth beats laziness for an iterative fixpoint). */
class LazinessSpec extends SparkSpec {

  private val iterativeByDesign =
    Set("q23_dedup_keeper", "q23_dedup_corpus", "q55_dedup_cluster_stats",
      "q75_cluster_split", "q87_semantic_keeper", "q90_graph_pagerank",
      "q94_textrank", "q126_quality_keeper",
      // q100 localCheckpoints the Lloyd-trained k-row centroid model at
      // construction so training runs ONCE for its two consumers (the
      // corpus assignment and the probe ranking) — lazy composition
      // would re-train the model inside both broadcast subtrees
      "q100_knn_label_agreement",
      // q96 materializes its cached pair stage eagerly at construction:
      // the census arms' broadcast jobs launch concurrently and would
      // otherwise race the cold cache, each recomputing the full
      // shingle-scan + inverted-index subtree
      "q96_triangle_census",
      // q78 materializes its cached per-doc (dl, hits) projection for
      // the same reason: stats + df broadcasts race the cold cache and
      // each would re-run the corpus tokenize
      "q78_bm25",
      // q138 runs the same eager-localCheckpoint CC fixpoint as the
      // dedup keeper family, over the core-core subgraph
      "q138_dbscan",
      // q139 localCheckpoints the k-row trained centroid model at
      // construction (the q100 rationale: assignment + probe ranking
      // both consume it)
      "q139_ann_recall",
      // q159 sweeps the q139 machinery — same k-row model checkpoint
      // at construction, three consumers (assignment, probe ranking,
      // truth arm share the session)
      "q159_ann_probe_curve",
      // q160's in-session form materializes its cached shingle base
      // eagerly (the q78/q157 reason: postings ×2 arms + df race a
      // cold cache); the PERSISTED serve path is job-free until action
      "q160_dedup_serve",
      // q151 composes the q23_dedup_corpus fixpoint (same eager
      // checkpoint rounds)
      "q151_effective_tokens",
      // q147 collects the d²-bounded covariance model and runs the
      // power iteration on the driver at construction BY DESIGN — a
      // lazy formulation would either re-fit the model per consumer or
      // pay 50 scheduler round-trips to multiply a 64×64 matrix
      "q147_spectral_audit",
      // q153 runs TWO eager CC fixpoints at construction: the stored
      // keeper table's full run over the corpus split, then the
      // batch-scale contracted-graph merge
      "q153_keeper_merge",
      // q154/q155 collect the word-frequency vocabulary and run the
      // greedy BPE merge loop driver-side at construction (model-scale
      // by the q89 vocabulary-collapse argument, BpeMaxVocab-guarded)
      "q154_bpe_merges", "q155_bpe_fertility",
      // q157 eagerly materializes its cached index base at construction
      // (the q78 rationale: concurrent broadcast builds race the cold
      // cache and would re-run the corpus tokenize)
      "q157_bm25_serve",
      // q163's lexical arm IS q78's bm25 (same eager cached per-doc
      // projection, same rationale); the dense arm and fusion are lazy
      "q163_hybrid_rrf",
      // q164's registry fixture rebuilds the stored keeper table via
      // the q23 CC fixpoint (eager checkpoint rounds — the q151/q153
      // rationale); takedownKeepers itself is fully lazy
      "q164_keeper_takedown",
      // q165 is q78's bm25 with doc ↦ chunk — same eager cached slim
      // projection, same three concurrent consumers
      "q165_passage_bm25",
      // q168 composes the q23 CC fixpoint (eager checkpoint rounds —
      // the q151/q153/q164 rationale)
      "q168_cluster_cap_sample",
      // q169's dup arm composes the same q23 CC fixpoint
      "q169_source_report_card",
      // q170 eagerly materializes its cached chunk base at construction
      // (the q157 rationale, one level down)
      "q170_passage_serve")

  test("constructing registry queries fires no Spark job") {
    // pre-warm per-table schema resolution so first-touch footer reads
    // don't count against the queries that happen to read a table first
    graft.core.Tables.names.foreach(t =>
      graft.core.Tables.load(spark, sf0001, t))

    val jobs = new AtomicLong
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    // drain any in-flight events from earlier suites before counting
    Thread.sleep(200)
    spark.sparkContext.addSparkListener(listener)
    try {
      val before = jobs.get()
      val dfs = SparkEntry.queries.toSeq.sortBy(_._1)
        .filterNot { case (n, _) => iterativeByDesign(n) }
        .map { case (name, fn) => name -> fn(spark, sf0001) }
      Thread.sleep(500) // listener bus is async: give stray events time
      assert(jobs.get() == before,
        s"query construction fired ${jobs.get() - before} Spark job(s)")
      // the lazily-built plans still execute
      val (name, df) = dfs.head
      assert(df.count() >= 0, s"$name failed to execute")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
