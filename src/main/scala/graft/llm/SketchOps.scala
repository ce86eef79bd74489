package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders
import graft.core.Tables
import graft.functions.MisraGries

/** Sketch-based aggregations for corpus statistics at scale — the
  * frequent-items member of the approximate family (q18 HyperLogLog
  * distinct counts, q27 percentile_approx quantiles).
  *
  * Library surface: `DataFrame => DataFrame`; registry adapts the fixture
  * `documents` table.
  */
object SketchOps {
  type QFn = (SparkSession, String) => DataFrame

  /** q31 — top-k terms per language via the [[MisraGries]] sketch.
    *
    * Plan shape at scale: tokenize+explode is map-side, the sketch
    * partially aggregates per partition (ObjectHashAggregate) holding at
    * most `capacity` counters per (partition × lang), and only those
    * fixed-size maps shuffle — the full distinct-term universe never
    * does. Contrast `q25_top_terms`, which shuffles every distinct term;
    * at a billion-term vocabulary that exchange is the bottleneck and
    * this one is unchanged.
    *
    * With capacity 64 ≥ the fixture's 31-term vocabulary the sketch is
    * exact, so the DuckDB oracle is the exact per-language top-15
    * (ties broken by term, mirrored in [[MisraGries.finish]]). The
    * under-pressure error bound is asserted separately in SketchSpec. */
  def heavyHittersPerLang(docs: DataFrame, capacity: Int = 64,
      k: Int = 15): DataFrame = {
    val mg = udaf(new MisraGries(capacity, k), Encoders.STRING)
    Tables.fanout(docs)
      .select(col("lang"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(mg(col("term")).as("hh"))
      .select(col("lang"), explode(col("hh")).as("tc"))
      .select(col("lang"), col("tc.term").as("term"), col("tc.n").as("n"))
      .orderBy(col("lang"), col("n").desc, col("term"))
  }
  val q31HeavyHittersSql: String =
    s"""WITH t AS (SELECT lang, unnest(${Text.tokensSql("text")}) AS term
       |  FROM documents),
       |c AS (SELECT lang, term, count(*) AS n FROM t GROUP BY lang, term),
       |r AS (SELECT lang, term, n,
       |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rn
       |  FROM c)
       |SELECT lang, term, n FROM r WHERE rn <= 15
       |ORDER BY lang, n DESC, term""".stripMargin

  /** q65 — mergeable distinct-count sketches (Apache DataSketches HLL,
    * via Spark's built-in `hll_sketch_agg`/`hll_union_agg`): per
    * (lang, source) vocabulary sketches rolled up to per-lang estimates
    * WITHOUT rescanning — the composable form of q18's one-shot
    * approx_count_distinct. This is the 100 TB cardinality idiom: each
    * ingest batch/partition persists a kilobyte sketch, and any slice's
    * distinct count (per lang, per day, whole corpus) is a union of
    * sketches, never a rescan; the union is also how a 1000-executor
    * cluster combines partial counts with fixed-size shuffle rows.
    *
    * The raw estimate is engine-specific (DuckDB has no DataSketches
    * HLL), so the registry entry is the BOUNDED form [[hllVocabAudit]];
    * SketchSpec additionally asserts the union estimate lands within the
    * configured-precision error bound of the exact distinct, and that
    * union-of-parts equals sketching the whole. */
  def hllVocabBySource(docs: DataFrame, lgK: Int = 12): DataFrame = {
    val terms = Tables.fanout(docs)
      .select(col("lang"), col("source"),
        explode(Text.tokens(col("text"))).as("term"))
    val perSource = terms
      .groupBy(col("lang"), col("source"))
      .agg(hll_sketch_agg(col("term"), lit(lgK)).as("sk"))
    perSource
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_vocab"))
      .orderBy("lang")
  }

  /** The oracle-checkable form of q65: the sketch estimate judged against
    * the exact per-lang distinct count, emitting only engine-agnostic
    * columns — the exact vocabulary (both engines compute it) and an
    * `est_ok` flag that is 1 iff the HLL estimate landed within `tol`
    * relative error. The DuckDB twin emits the exact count and a literal
    * 1, so the driver's rows+schema+hash compare passes EXACTLY WHEN the
    * bound holds: an explicit bounded oracle instead of a rows-only row.
    * (lgK=12 ⇒ ~1.6% standard error; tol=5% is >3σ.) */
  def hllVocabAudit(docs: DataFrame, lgK: Int = 12,
      tol: Double = 0.05): DataFrame = {
    val est = hllVocabBySource(docs, lgK)
    val exact = Tables.fanout(docs)
      .select(col("lang"), explode(Text.tokens(col("text"))).as("term"))
      .groupBy(col("lang"))
      .agg(countDistinct(col("term")).as("exact_vocab"))
    est.join(exact, "lang")
      .select(col("lang"), col("n_sources"), col("exact_vocab"),
        (abs(col("est_vocab") - col("exact_vocab"))
          <= lit(tol) * col("exact_vocab")).cast("int").as("est_ok"))
      .orderBy("lang")
  }
  val q65HllAuditSql: String =
    s"""WITH t AS (SELECT lang, source, unnest(${Text.tokensSql("text")}) AS term
       |  FROM documents)
       |SELECT lang, count(DISTINCT source) AS n_sources,
       |  count(DISTINCT term) AS exact_vocab, 1 AS est_ok
       |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** q73 — mergeable per-key quantile sketches (DataSketches KLL, the
    * quantile member of the approximate family; [[graft.functions.KllAgg]]).
    * The persisted-sketch idiom from q65, for quantiles: one pass builds
    * fixed-size sketches per (event_type, week) — the rows you would
    * store — and ANY later span's p50/p90/p99 comes from a lossless
    * `kll_union_agg` rollup of those rows, never a rescan. At 100 TB the
    * exact path (q72) costs an NDV-sized shuffle per question; this
    * costs one |keys × epochs|-row union per question, with a proven
    * ±1.65% rank bound (k=200, 99% conf.).
    *
    * Bounded oracle, q65-style: KLL compaction is randomized, so the
    * audit emits the EXACT values at ranks p ± 2ε (both engines can
    * compute those) plus `est_ok` = 1 iff the sketch estimate landed
    * between them; the DuckDB twin emits the same exact bounds and a
    * literal 1. Exact bounds ride [[graft.operators.ProfileOps.exactPercentiles]]
    * — the q72 machinery — so the audit itself stays scale-safe. */
  def kllQuantileAudit(events: DataFrame, ps: Seq[Double] = Seq(0.5, 0.9, 0.99),
      k: Int = 200): DataFrame = {
    val kagg = udaf(new graft.functions.KllAgg(k), Encoders.scalaDouble)
    val kunion = udaf(new graft.functions.KllUnionAgg(k), Encoders.BINARY)
    val perEpoch = events.filter(col("value").isNotNull)
      .groupBy(col("event_type"), date_trunc("week", col("ts")).as("wk"))
      .agg(kagg(col("value")).as("sk"))
    val rolled = perEpoch.groupBy(col("event_type"))
      .agg(kunion(col("sk")).as("sk"))
    val qUdf = udf((b: Array[Byte], p: Double) =>
      graft.functions.KllQuantiles.quantile(b, p))
    val est = rolled
      .select(col("event_type"), explode(array(ps.map(lit): _*)).as("p"),
        col("sk"))
      .withColumn("est", qUdf(col("sk"), col("p")))
      .drop("sk")
    val eps = 2.0 * graft.functions.KllQuantiles.rankError(k)
    val ranks = ps.map(p => (p, math.max(p - eps, 1e-6), math.min(p + eps, 1.0)))
    val exact = graft.operators.ProfileOps.exactPercentiles(
      events, "value", "event_type",
      ranks.flatMap { case (_, lo, hi) => Seq(lo, hi) }.distinct)
    val spark = events.sparkSession
    import spark.implicits._
    val rankMap = ranks.toDF("p", "lo_r", "hi_r")
    // ONE broadcast of the exact bounds, reshaped to a per-group
    // rank→value map: the former two-join form broadcast `exact` twice
    // (lo and hi lookups), and each broadcast build re-executed the
    // whole q72 exact-percentile subtree — the union-runs-the-subtree-
    // per-branch hazard in broadcast form
    val pvMap = exact.groupBy(col("grp"))
      .agg(map_from_entries(collect_list(struct(col("p"), col("value"))))
        .as("pv"))
    est.join(broadcast(rankMap), "p")
      .join(broadcast(pvMap), col("grp") === col("event_type"))
      .select(col("event_type"), col("p"),
        element_at(col("pv"), col("lo_r")).as("lo"),
        element_at(col("pv"), col("hi_r")).as("hi"),
        (col("est") >= element_at(col("pv"), col("lo_r")) &&
          col("est") <= element_at(col("pv"), col("hi_r")))
          .cast("int").as("est_ok"))
      .orderBy("event_type", "p")
  }

  val q73KllAuditSql: String = {
    val k = 200
    val eps = 2.0 * graft.functions.KllQuantiles.rankError(k)
    Seq(0.5, 0.9, 0.99).map { p =>
      val lo = math.max(p - eps, 1e-6); val hi = math.min(p + eps, 1.0)
      s"""SELECT event_type, CAST($p AS DOUBLE) AS p,
         |  percentile_disc($lo) WITHIN GROUP (ORDER BY value) AS lo,
         |  percentile_disc($hi) WITHIN GROUP (ORDER BY value) AS hi,
         |  1 AS est_ok
         |FROM events WHERE value IS NOT NULL GROUP BY event_type""".stripMargin
    }.mkString("\nUNION ALL\n") + "\nORDER BY event_type, p"
  }

  /** q74 — cross-source distinct-content overlap via theta sketches
    * ([[graft.functions.ThetaAgg]]), completing the persisted-sketch
    * family: HLL counts distincts (q65), KLL answers quantiles (q73),
    * theta intersects SETS. q67 answers "which sources mirror each
    * other" through the near-dup pair stage; this answers the coarser
    * set question — what fraction of source A's distinct shingles also
    * appear in B — in ONE pass with fixed memory: per-mask sketches
    * build inside the cached mask-histogram aggregation (ObjectHash
    * partial merge; only fixed-size sketch rows shuffle), per-source
    * sketches are a [[graft.functions.ThetaUnionAgg]] rollup of those
    * metadata-scale rows, and every pairwise intersection runs
    * POST-aggregation. At 100 TB you run the sketch branch
    * alone (a direct groupBy(source) — kilobytes shuffled, persisted
    * per (source, day) for later rollup); the exact branch here is the
    * AUDIT, feasible at test scale, and the whole audit shares one
    * groupBy(shingle) exchange (ReusedExchange) so the corpus scan
    * runs once.
    *
    * Bounded oracle, q65-style with the q24 aggregate twist: the audit
    * emits the EXACT pairwise distinct-shingle overlap (both engines
    * can compute it at test scale) plus `cov_ok` = 1 iff ≥90% of pairs
    * land inside their sketch's own ±2σ interval
    * ([[ThetaSketchOps.intersectBounds]]). The interval is a ~95%
    * PER-PAIR guarantee, so over a 190-pair matrix a handful of misses
    * on near-disjoint pairs is expected behavior, not failure — the
    * spec-correct gate is coverage, exactly as q24_knn_lsh gates
    * aggregate recall rather than per-query rank. Zero-intersection
    * pairs drop from both engines' inner joins symmetrically.
    *
    * Precondition: ≤ 63 distinct sources ([[graft.core.BitDim]] fails
    * loudly past that — shard the dimension into multiple mask columns
    * before deploying wider). Shingle-distinct counts key on xxhash64,
    * so they are collision-exact only w.h.p. (~n²/2⁶⁵ per source pair —
    * negligible, but a semantic delta from exact string-distinct). */
  def thetaSourceOverlap(docs: DataFrame, k: Int = 5,
      lgK: Int = 12): DataFrame = {
    // Source dimension — metadata-scale, derived in-plan; each source
    // owns one bit of a 64-bit mask (see [[graft.core.BitDim]]).
    val srcDim = graft.core.BitDim.dim(docs, "source")
    // shingle_hashes is the codegen'd hot path (one in-place tokenize +
    // hash per doc). The HOF formulation Text.shingles(Text.tokens(..))
    // re-inlines the regexp tokenizer into the transform lambda —
    // CollapseProject keeps the alias only when referenced once — so
    // tokenization re-ran per shingle POSITION: O(tokens²) per doc, the
    // actual 5 s r10 bench tail. Hash values match xxhash64 of the
    // space-joined shingle, so oracle counts are unchanged.
    val sh = docs
      .select(col("source"), explode(expr(s"shingle_hashes(text, $k)")).as("sh"))
      .join(srcDim, "source")
      .select(col("bit").as("m"), col("sh"))
    // ONE codegen'd groupBy(sh) long-OR hash aggregate replaces the old
    // collect_set(source) ObjectHashAggregate (the r10 bench tail: 5 s
    // of string-array building + double final aggregation). Each
    // distinct shingle folds its witnessing sources into a bitmask;
    // the exchange is shared by the mask-histogram and sketch branches
    // below (identical subplans dedup to a ReusedExchange).
    val byMask = sh.groupBy(col("sh")).agg(bit_or(col("m")).as("mask"))
    // Distinct OBSERVED source-set combinations: bounded by the shingle
    // count but in practice a handful of rows. Every pairwise exact
    // statistic runs on THIS table — never per shingle — and the theta
    // sketch of each mask's (disjoint) shingle set builds in the SAME
    // aggregation, so the whole operator makes exactly ONE pass over the
    // shingle table (the r11 shape re-ran the 2M-row bit_or final once
    // per downstream branch and paid 13 broadcast-exchange jobs for
    // lookups between metadata-size frames; job latency, not compute,
    // was the entire bench tail). coalesce(1) pins the tail below to
    // one task — the PSI/q43 fixed-frame justification.
    // one bounded persist of the count histogram: the sizes arm, the
    // intersection arm, the SKETCH arm, and the coverage consumers all
    // branch from it, and each branch is its own subtree under AQE —
    // cached, the 2M-row final aggregation over the shingle exchange
    // runs once. The per-mask theta sketch builds IN the same
    // aggregation (each distinct shingle hash belongs to exactly one
    // mask, so a source's shingle set is the disjoint union of its
    // masks' sets and theta's deterministic hash-threshold sample makes
    // union-of-per-mask-sketches ≡ one per-source sketch) — without it
    // the sketch branch was a SECOND corpus tokenize+hash pass, the
    // actual r15 bench move 0.65 → 1.05 s. coalesce(1) BEFORE the cache
    // pins the whole tail below to one task (the PSI/q43 fixed-frame
    // justification): every later join is a broadcast lookup that
    // preserves the stream's SinglePartition, so no tail aggregate or
    // window ever re-exchanges.
    val masks = graft.core.CacheOnce.swap("theta-masks",
      byMask.groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
        .coalesce(1))
    val sizes = masks
      .join(srcDim, (col("mask").bitwiseAND(col("bit"))) =!= 0)
      .groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val pairDim = graft.core.BitDim.pairs(srcDim, "source",
      "source_a", "source_b")
    val inter = masks
      .join(pairDim, (col("mask").bitwiseAND(col("bit_a"))) =!= 0
        && (col("mask").bitwiseAND(col("bit_b"))) =!= 0)
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum(col("cnt")).as("n_inter"))
    // Per-MASK sketches ride byMask's reused exchange (one theta update
    // per distinct shingle — never the per-source fan-out, which pays
    // one update per (shingle × witnessing source)); per-source
    // sketches are then a lossless [[graft.functions.ThetaUnionAgg]]
    // rollup of the ≤|distinct masks| sketch rows. Each distinct
    // shingle hash belongs to exactly ONE mask, so a source's shingle
    // set is the disjoint union of its masks' sets, and theta's
    // deterministic hash-threshold sample makes union-of-per-mask-
    // sketches ≡ the directly-built per-source sketch. Kept OUT of the
    // cached histogram aggregate above: a udaf in that agg forces the
    // whole thing onto ObjectHashAggregate and serializes the critical
    // path (measured 1.26–1.38 s vs 0.84–0.97 s same-window).
    val tAgg = udaf(new graft.functions.ThetaAgg(lgK), Encoders.scalaLong)
    val uAgg = udaf(new graft.functions.ThetaUnionAgg(lgK),
      Encoders.BINARY)
    val maskSk = byMask.groupBy(col("mask")).agg(tAgg(col("sh")).as("msk"))
    val sk = maskSk
      .join(srcDim, (col("mask").bitwiseAND(col("bit"))) =!= 0)
      .groupBy(col("source")).agg(uAgg(col("msk")).as("sk"))
      .coalesce(1)
    val boundsUdf = udf((a: Array[Byte], b: Array[Byte]) => {
      val (_, lo, hi) = graft.functions.ThetaSketchOps.intersectBounds(a, b)
      Array(lo, hi)
    })
    // both sketch copies are the IDENTICAL 20-row subtree (its exchange
    // dedups); the pair frame coalesces back to one task
    val est = sk.alias("x")
      .join(sk.alias("y").hint("shuffle_replicate_nl"),
        col("x.source") < col("y.source"))
      .coalesce(1)
      .select(col("x.source").as("source_a"), col("y.source").as("source_b"),
        boundsUdf(col("x.sk"), col("y.sk")).as("ib"))
    // both size lookups broadcast the IDENTICAL `sizes` subtree (renames
    // stay OUTSIDE the broadcast) so the second join reuses the first's
    // exchange instead of recomputing
    val flags = inter
      .join(broadcast(sizes), col("source_a") === col("source"))
      .withColumnRenamed("n", "n_a").drop("source")
      .join(broadcast(sizes), col("source_b") === col("source"))
      .withColumnRenamed("n", "n_b").drop("source")
      .join(broadcast(est), Seq("source_a", "source_b"))
      .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
        col("n_inter"),
        round(col("n_inter") / (col("n_a") + col("n_b") - col("n_inter"))
          + lit(1e-9), 4).as("jaccard"),
        (col("n_inter") >= col("ib").getItem(0)
          && col("n_inter") <= col("ib").getItem(1)).cast("int").as("est_ok"))
    // the coverage scalar is an unpartitioned window over the (already
    // SinglePartition) pair frame — the crossJoin(broadcast(agg)) form
    // would re-run the whole pair subtree as its own job
    val wAll = Window.partitionBy()
    flags
      .withColumn("cov_ok",
        (sum(col("est_ok")).over(wAll)
          >= count(lit(1)).over(wAll) * lit(0.9)).cast("int"))
      .drop("est_ok")
      .orderBy("source_a", "source_b")
  }

  val q74ThetaOverlapSql: String =
    s"""WITH tok AS (SELECT source, ${Text.tokensSql("text")} AS ts
       |  FROM documents),
       |sh AS (SELECT DISTINCT source, sh FROM
       |  (SELECT source, unnest(${Text.shinglesSql("ts", 5)}) AS sh FROM tok)),
       |sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY 1),
       |i AS (SELECT a.source AS source_a, b.source AS source_b,
       |    count(*) AS n_inter
       |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
       |  GROUP BY 1, 2)
       |SELECT source_a, source_b, CAST(sa.n AS BIGINT) AS n_a,
       |  CAST(sb.n AS BIGINT) AS n_b, CAST(n_inter AS BIGINT) AS n_inter,
       |  round(n_inter / (sa.n + sb.n - n_inter) + 1e-9, 4) AS jaccard,
       |  1 AS cov_ok
       |FROM i JOIN sizes sa ON sa.source = i.source_a
       |JOIN sizes sb ON sb.source = i.source_b
       |ORDER BY 1, 2""".stripMargin

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q31_heavy_hitters",
      (s: SparkSession, d: String) => heavyHittersPerLang(Tables.documents(s, d)),
      Some(q31HeavyHittersSql)),
    ("q65_hll_vocab",
      (s: SparkSession, d: String) => hllVocabAudit(Tables.documents(s, d)),
      Some(q65HllAuditSql)),
    ("q73_kll_quantiles",
      (s: SparkSession, d: String) => kllQuantileAudit(Tables.events(s, d)),
      Some(q73KllAuditSql)),
    ("q74_theta_overlap",
      (s: SparkSession, d: String) => thetaSourceOverlap(Tables.documents(s, d)),
      Some(q74ThetaOverlapSql)))
}
