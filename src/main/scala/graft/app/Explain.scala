package graft.app

import java.nio.file.{Files, Paths}

/** Plan documentation generator: dumps the AQE-final formatted physical
  * plan of selected headline queries to PLANS.md — the artifact to review
  * when asking "is this the plan you'd want at 100 TB?".
  * Usage: runMain graft.app.Explain [sfDir] [outFile]
  */
object Explain {
  private val Headline = Seq(
    "q02_filter"            -> "pushdown + pruning reach the scan",
    "q03_agg"               -> "partial+final hash agg in one codegen span",
    "q06_join_multiway"     -> "star join: all dims broadcast, fact never shuffles for joins",
    "q09_range_join"        -> "range pair-count as a range-frame window (no O(pairs) join)",
    "q13_topk"              -> "TakeOrderedAndProject, no global sort",
    "q23_dedup_minhash_lsh" -> "LSH band self-join; quadratic term bounded per bucket",
    "q23_dedup_ngram_jaccard" -> "shared pair stage: df-capped inverted index, sizes ride the rows (no broadcasts)",
    "q23_dedup_incremental" -> "one-sided index join: new batch vs corpus, no corpus self-pairing",
    "q24_knn_ivf"           -> "broadcast centroids; probes touch nprobe/N of the corpus",
    "q27_asof_join"         -> "as-of via union + running window: one shuffle per side",
    "q29_supplier_share"    -> "fact pre-agg before broadcast dims; share filter via broadcast single-row total",
    "q30_funnel"            -> "one exchange on user_id shared by all three stage windows + the per-user agg",
    "q30_interval_join"     -> "interval join as user-key equi-join with the time bound as residual (no range cross-product)",
    "q31_heavy_hitters"     -> "Misra-Gries: fixed-size sketch maps shuffle, never the term universe",
    "q24_knn_lsh"           -> "budgeted multi-probe: histogram-driven probe set, scan fraction bounded by construction",
    "q34_chunk"             -> "sliding-window chunking: pure per-row generate, zero shuffles",
    "q34_pack"              -> "packing audit: one running-sum window + agg per source key",
    "q34_mixture"           -> "mixture selection: per-lang budget window over md5 order, one shuffle on lang",
    "q35_global_rank"       -> "global rank without the single-reducer collapse: range shuffle reused for offsets",
    "q36_cdc_apply"         -> "changelog -> state: one key shuffle, per-key top-1",
    "q38_scd2_history"      -> "SCD2 history: the same single key shuffle with a lead frame",
    "q39_stratified_sample" -> "per-stratum top-k: WindowGroupLimit prunes map-side before the exchange",
    "q40_constraints"       -> "N constraints = one wide agg over one scan; FK via broadcast anti-join",
    "q41_manifest"          -> "content fingerprint: map-side partial bit_xor, groups-row shuffle",
    "q43_drift"             -> "PSI: one conditional-count scan, k-row frame, metadata-scale windows",
    "q44_winsorize"         -> "percentile bounds broadcast back in-plan; codegen'd clamp",
    "q46_bloom_prune"       -> "bloom semi-join prune: one-row sketch subquery filters the fact scan before the exact semi join",
    "q135_decontaminated_corpus" -> "decontamination keep-set: eval collapses to a distinct hash set, corpus streams one join; anti-join on the small contaminated ids",
    "q136_eval_leak_report" -> "eval leakage: one-sided bipartite inverted-index join (eval side small); (t,e) pair frame partial-aggregates map-side",
    "q137_silhouette" -> "centroid silhouette: |labels|*d model via posexplode partial-avg; one-row broadcast crossJoin scores per vector with array HOFs - no per-vector join or shuffle",
    "q138_dbscan" -> "DBSCAN on the blocked eps-graph: shared semantic pair stage cached for 3 consumers; core set joins shuffle_hash (node-scale, never broadcast); pointer-jumping CC on core-core edges",
    "q139_ann_recall" -> "measured recall@k: sampled-query brute truth (one broadcast vs one unshuffled corpus scan) against the trained-IVF serving path; checkpointed k-row model trains once",
    "q140_epoch_plan" -> "epoch plan: one token-count agg over one scan, weights folded as literals on the |langs|-row frame - no joins, no second scan",
    "q141_dsir_importance" -> "DSIR: per-doc hashed-feature histogram cached once; 512-row weight model built per-bucket and joined back by broadcast - the model is fixed-size at any corpus scale",
    "q142_curriculum" -> "curriculum ntile: distributed GlobalWindows range pass (no single-partition window on the corpus), |stages|-row rollup",
    "q144_heaps_law" -> "Heaps fit: token->min-doc first-occurrence agg (vocab-bounded) + ONE running-sum range pass for both cumulatives; curve + OLS metadata-scale",
    "q146_source_divergence" -> "source JS matrix: one corpus pass to the |sources|x512 model frame (cached), pair stage self-joins the MODEL, never the corpus",
    "q148_bootstrap_ci" -> "bootstrap CI: B hashed weights per row in ONE pass, map-side combine to the B-row replica frame; CI fold is a B-row window",
    "q149_session_anomaly" -> "session anomaly: sessionize+lead on ONE user-key exchange, cached pair projection serves model fit AND scoring, |types|^2 model broadcasts back",
    "q150_context_window_plan" -> "context-window plan: one tokenize scan, |windows|-cell map-side rollup - flat at any corpus size",
    "q143_vocab_audit" -> "vocab audit: one token explode to vocabulary-bounded (lang,tok) counts; fertility joins a separate narrow scan on the |langs|-row frame",
    "q145_burstiness" -> "burstiness: vocabulary-bounded per-term moment aggregate; absent-doc zeros folded analytically, never a doc x term frame",
    "q147_spectral_audit" -> "spectral audit: d^2/2 slim pair agg collected as the model; power iteration runs on the driver matrix (no per-step job launches). NOTE: collects at construction, so there is no single lazy plan to dump - Explain prints the covariance-aggregate side only",
    "q151_effective_tokens" -> "effective tokens: keeper CC fixpoint composed with per-lang token counts; only two |langs|-cell aggregates beyond the shared pair stage",
    "q152_shingle_df_histogram" -> "df-cap audit: vocabulary-bounded df aggregate into power-of-two bands; candidate-pair mass is the analytic C(df,2) fold",
    "q153_keeper_merge" -> "incremental keeper merge: new edges contract to stored roots (one batch-scale hash join), CC runs on the contracted batch-scale graph, stored table updates via one keeper-map join",
    "q154_bpe_merges" -> "BPE train: corpus collapses to the word-frequency vocabulary in one exchange; the greedy merge loop is driver-side model state",
    "q155_bpe_fertility" -> "BPE fertility: broadcast (word -> symbols) trained-vocab join; |langs|-row rollup - the corpus never re-runs the merge fold",
    "q156_media_dedup" -> "media dedup audit: per-partition dHash, 4x16-bit band self-join per bucket (never all-pairs), exact-hamming verify",
    "q157_bm25_serve" -> "BM25 serve: query scored from index frames only (postings filter prunes to |terms| buckets; df = |terms|-row agg; no corpus rescan). NOTE: materializes its cached index base eagerly at construction",
    "q158_exactsubstr_clean" -> "ExactSubstr span removal: hashed n-gram occurrence counts keep only c>1 (join carries the duplicated minority), per-doc island-merge window over dup positions only, HOF span excision — no driver collection",
    "q159_ann_probe_curve" -> "nProbe sweep in ONE pass: every (query,candidate) cosine scored once with its admitting probe rank; levels reconstructed by exploding p over crn..max (lists nest); cost bounded by the truth arm",
    "q160_dedup_serve" -> "near-dup admit from index frames only: batch vocab broadcasts into the stored postings scan (matched minority exchanges), df is an LSM re-aggregate, no corpus re-tokenize. NOTE: in-session form materializes its cached shingle base eagerly",
    "q161_nb_classifier" -> "NB classifier: one tokenize pass to the class x vocab count model; scoring joins tokens to the model on the token key only (absent-token smoothing is analytic) — never a tokens x classes fanout; argmax via per-doc window",
    "q162_takedown_audit" -> "takedown dry-run: every document-derived artifact count rides ONE corpus scan (per-doc posting/shingle sizes in the same projection); embeddings arm is a broadcast left join; 6-row explode output",
    "q163_hybrid_rrf" -> "hybrid RRF: each arm top-K-bounded by its own plan (BM25 scan-filtered postings; dense broadcast-query TakeOrdered), fusion joins 2K rows. NOTE: lexical arm shares q78's eager cached per-doc projection",
    "q164_keeper_takedown" -> "keeper takedown: affected roots = one broadcast semi-join; unaffected components pass through an anti-join scan (no shuffle); only the affected minority re-elects via groupBy. NOTE: registry fixture rebuilds the stored table via the eager q23 CC fixpoint",
    "q165_passage_bm25" -> "passage BM25: chunk explode is a pure per-row generate (~1.33x fanout, no shuffle); only matching postings leave the scan; per-doc best via WindowGroupLimit-prunable window, global top-N via TakeOrderedAndProject. NOTE: shares q78's eager cached projection rationale",
    "q166_semantic_contamination" -> "semantic decontamination: eval vectors broadcast (small by definition), the train side streams ONE scan with zero shuffles before the output filter — no pair-space materialization, no blocking recall loss",
    "q47_ks_drift"          -> "KS: distinct-value counts, CDFs via range-partitioned running sum (no single-reducer window)",
    "q48_corr_matrix"       -> "C(n,2) corr aggregates in ONE wide agg row over one scan, then unpivot",
    "q49_weighted_sample"   -> "A-ES weighted top-k per stratum: WindowGroupLimit prunes map-side",
    "q50_zorder_layout"     -> "Morton layout audit: expression-only z-key, range partition, per-tile span agg",
    "q51_dedup_containment" -> "containment rides the SAME pair stage as jaccard: no extra exchange for the second measure",
    "q53_welch_ttest"       -> "Welch A/B decision: one conditional wide agg over one scan, one row out",
    "q54_bigram_lm"         -> "bigram LM: pure generate + Zipf-bounded count table, scoring is one join on the bigram key",
    "q56_kmeans"            -> "spherical k-means: per-iter broadcast assignment, k*d-row update shuffle (corpus never shuffles)",
    "q57_cohort_retention"  -> "cohort matrix: map-side distinct (user,week) collapse, one user-key exchange reused by the cohort join",
    "q59_benford"           -> "Benford: one conditional scan to a 9-digit frame; string-head digit, no log10 ulp hazard",
    "q60_gini"              -> "Gini: per-key totals then the q35 distributed rank — never Exchange SinglePartition on keys",
    "q61_markov_transitions" -> "Markov: one user-key shuffle serves the lead window; |types|^2 normalizing frame",
    "q63_zipf_fit"          -> "Zipf: term counts -> TakeOrderedAndProject top-k -> regression over a k-row frame",
    "q64_quantize_audit"    -> "int8 quantize: expression-only HOFs over one scan; only the |labels|-row rollup shuffles",
    "q65_hll_vocab"         -> "HLL: fixed-size DataSketches rows shuffle, union rollup never rescans terms",
    "q67_source_overlap"    -> "cross-source dup matrix: thresholded pairs join the slim (doc,source) projection twice; |sources|^2 rollup",
    "q68_rfm_segments"      -> "RFM: one fact shuffle to user metrics, ONE grouped distributed-ntile pass over the unpivoted axes, 125-cell rollup",
    "q69_split_leakage"     -> "split leakage: the shared pair stage + two slim fold joins; 9-row rollup",
    "q71_feature_bins"      -> "feature bins: N columns unpivot into ONE grouped range shuffle; no per-column single-reducer ntile",
    "q72_exact_percentiles" -> "exact percentile_disc per group: NDV-collapse + grouped running sum + broadcast boundary lookup; no per-group buffers",
    "q73_kll_quantiles"     -> "mergeable KLL quantile sketches: fixed-size rows shuffle, union rollup; audit bounds ride the q72 exact machinery",
    "q74_theta_overlap"     -> "theta set-sketches: codegen'd bit_or source-bitmask per shingle (no collect_set); pairwise exact stats on the distinct-mask histogram; sketch rows post-agg",
    "q75_cluster_split"     -> "leakage-free split: pair stage + CC once, fold hash on keeper id; leaked-pairs scalar rides in-plan (provably 0)",
    "q76_basket_rules"      -> "basket rules: one user-key exchange for sessionize + set-mask agg; pair stats on the mask histogram, never the fact table",
    "q77_compaction_plan"   -> "compaction planner: metadata-scale running-sum window + per-bin rollup on one group-key exchange",
    "q78_bm25"              -> "BM25: ONE corpus tokenize — the slim (dl, hits) projection is cached+eager and every FileScan below sits inside an InMemoryRelation recipe (consumers read InMemoryTableScan); df + corpus scalars broadcast in-plan; TakeOrdered top-N",
    "q79_interval_coverage" -> "interval union: O(n log n) sweep — running max(end) + island sum on ONE user-key exchange, no interval self-join",
    "q80_key_skew"          -> "key-skew audit: one fact shuffle to per-key counts; scalars broadcast in-plan; TakeOrdered top-N",
    "q81_session_paths"     -> "frequent paths: sessionize + ordered collect on ONE user-key exchange; k-gram generate; |types|^k rollup",
    "q82_snapshot_diff"     -> "snapshot diff: one full-outer key join, verdicts folded into ONE wide agg row, stack unpivot",
    "q83_join_cardinality"  -> "join pre-flight: per-side count tables, |keys|-row join, ONE summary row — the join output never materializes",
    "q84_linear_fit"        -> "per-group OLS: five running sums per group in ONE hash aggregate over one scan",
    "q85_basket_triples"    -> "order-3 itemsets: the SAME session mask histogram as q76 joined to the C(|types|,3) dimension — no new fact pass",
    "q86_semantic_dedup"    -> "SemDeDup: k-means assignment blocks the pair space to within-cluster; exact cosine verifies; corpus shuffles once on cid",
    "q87_semantic_keeper"   -> "SemDeDup resolution: min-label CC over the semantic pairs, every vector labeled keeper/pruned",
    "q88_fd_audit"          -> "FD audit: one narrow plain aggregate per LHS set (min!=max verdicts, no Expand, map-side combine); metadata-scale descriptor-explode fold",
    "q89_bpe_pairs"         -> "BPE pairs: corpus collapses to NDV-bounded vocab FIRST; pair explode runs on vocab rows only",
    "q92_record_linkage"    -> "blocked linkage: occupancy audit rides the block-key shuffle; over-cap blocks dropped before the pair product; levenshtein on candidates only",
    "q93_wasserstein_drift" -> "exact W1: per-distinct-value counts -> distributed running-sum CDFs (range partition, no SinglePartition); segment widths via rn equi-join",
    "q95_embedding_profile" -> "embedding profile: posexplode fanout collapses map-side to <=d cells per task; d-row output",
    "q96_triangle_census"   -> "triangle census: degree-ordered orientation bounds wedge fanout to O(|E|^1.5); closing edge via one semi-join",
    "q97_attribution"       -> "attribution: next-conversion + rank windows share ONE user-key exchange; no touch x conversion interval join",
    "q98_dup_spans"         -> "dup spans: xxhash64 n-gram count join, singletons pruned from the build side; per-doc then per-source rollup",
    "q99_vocab_coverage"    -> "vocab coverage: top-V vocab broadcast to the token stream; corpus never shuffles for membership",
    "q100_knn_label_agreement" -> "kNN label audit: trained-IVF blocking; salted (cid,salt) candidate join (nProbe*N^2/k, parallel past k keys); arrays dropped pre-window",
    "q101_boilerplate_ngrams" -> "boilerplate report: one gram-keyed count shuffle (string is the output), TakeOrdered top-N, corpus count broadcast in-plan",
    "q102_crossentropy_transfer" -> "cross-entropy transfer: reference-slice count tables joined on xxhash64 longs; V broadcast in-plan; unseen floor via left joins",
    "q103_segmented_drift"  -> "segmented PSI: ONE conditional-count scan to a segments x k frame; per-segment windows; |segments|-row rollup",
    "q104_mahalanobis_outliers" -> "Mahalanobis audit: |labels|*d model cells collapse map-side; model broadcast back; scoring is an expression fold, no shuffle",
    "q105_novelty_rate"     -> "novelty: gram->first-doc table with singletons pruned from the build side (a join miss IS novel); hash-keyed throughout",
    "q106_disorder_audit"   -> "disorder audit: global running max via deterministic id-range buckets + broadcast prefix-max patch, never SinglePartition",
    "q107_waiting_supplier" -> "Q21 shape decorrelated: per-(order,supplier) late flags + per-order counts on ONE orderkey exchange; no fact-fact anti-join",
    "q108_cust_order_dist"  -> "Q13 shape: one outer key join; the zero bucket exists only through it; two metadata-scale aggs",
    "q109_dormant_customers" -> "Q22 shape: broadcast scalar subquery + anti join against the scan-filtered recent slice + broadcast dim rollup",
    "q110_kanonymity"       -> "k-anonymity/l-diversity: ONE QI-key hash aggregate (count + distinct partials map-side) + a one-row rollup",
    "q111_session_stats"    -> "entry-channel quality: sessionize + per-session rollup on ONE user-key exchange; |types|-row final rollup",
    "q112_lang_confusion"   -> "lang confusion: one expression-only scan to a |langs|^2 frame; share window on the frame, not the corpus",
    "q113_smalllot_revenue" -> "Q17 shape decorrelated: brand parts broadcast into the scan; per-part avg as a window on ONE partkey exchange — the fact table never joins itself",
    "q114_big_baskets"      -> "Q18 shape: fact aggregate + HAVING filter BEFORE any join; the order/customer joins see only the rare survivors",
    "q115_single_source"    -> "Q20-cut concentration audit: one explicit partkey exchange feeds the (part,supplier) aggregate (key-subset clustering) AND the part-total window",
    "q116_cheapest_supplier" -> "Q2 shape argmin join: size-class parts broadcast; row_number window over the (part,supplier) unit-cost table",
    "q117_top_supplier"     -> "Q15 shape: quarter pushed to the scan; max rides in-plan as a broadcast scalar over the SAME aggregate (q17 pattern)",
    "q118_rollup_merge"     -> "incremental rollup maintenance: fact scanned once per batch; merge is an aggregate over two rollup-sized tables; exact distinct users via the presence-table sidecar",
    "q120_pq_audit"         -> "PQ codebook audit: |subspaces| slim slice rows per vector, codebook broadcast, argmin window AFTER arrays are projected away; |subspaces|x|codes|-row output",
    "q121_late_orders"      -> "Q4 shape: EXISTS decorrelates to a left-semi join carrying the cross-table date compare; quarter pushed to the orders scan; semi join dedups line fanout for free",
    "q122_priority_lines"   -> "Q12 shape: year pushed to the fact scan; one join + two conditional counts per group, map-side combined",
    "q123_promo_revenue"    -> "Q14 shape: month pushed to the scan, part class broadcast; conditional and total revenue fold in ONE aggregate row (in-plan ratio)",
    "q124_supplier_variety" -> "Q16 shape: NOT IN decorrelates to a broadcast anti join BEFORE the distinct-count aggregate; both dims broadcast",
    "q125_disjunctive_revenue" -> "Q19 shape: part-side conjuncts filter the broadcast build; the OR evaluates in one codegen'd pass; scalar output",
    "q126_quality_keeper"   -> "quality-argmax keeper: shared pair stage + CC unchanged; slim quality join + per-component window; dfCap bounds component size",
    "q127_shipping_priority" -> "Q3 shape: segment customers broadcast into the date-pruned orders scan; post-cutoff lineitem filter pre-join; TakeOrderedAndProject top-k",
    "q128_local_supplier_volume" -> "Q5 shape: the whole region->nation->customer/supplier chain broadcasts; same-nation constraint prunes IN-join; one fact key join",
    "q129_forecast_revenue" -> "Q6 shape: every predicate at the parquet scan, one conditional-sum row back - the pushdown/codegen showcase",
    "q130_nation_volume"    -> "Q7 shape: two-nation filter restricts both broadcast dims before the fact join; year is post-join projection",
    "q131_market_share"     -> "Q8 shape: share as a conditional-sum ratio inside ONE aggregate row per year (grouped q123 in-plan ratio); all dims broadcast",
    "q132_product_profit"   -> "Q9 shape: material-token parts + supplier nation broadcast; margin folds in one agg; whole-unit rounding absorbs the cancelling-sum fp drift",
    "q133_returned_items"   -> "Q10 shape: return flag + quarter pushed to the scans; nation broadcast; TakeOrderedAndProject over the per-customer aggregate",
    "q134_lsh_tuning"       -> "MMDS S-curve over the OBSERVED q119 histogram: analytic detection probability + expected missed pairs per bin; metadata-scale on the shared pair stage")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("PLANS.md")
    val spark = graft.core.Sessions.get("8")
    val sb = new StringBuilder
    sb.append("# PLANS — AQE-final formatted physical plans (headline queries)\n\n")
    sb.append(s"Generated by `graft.app.Explain` on `$sfDir`. Regenerate after\n")
    sb.append("any operator change: `sbt \"runMain graft.app.Explain\"`.\n")
    Headline.foreach { case (name, why) =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.collect() // execute this exact queryExecution so AQE finalizes
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(df.queryExecution.executedPlan.toString.trim)
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[explain] wrote ${Headline.size} plans to $outFile")
    spark.stop()
  }
}
