package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q31_heavy_hitters",
      (s: SparkSession, d: String) => heavyHittersPerLang(Tables.documents(s, d)),
      Some(q31HeavyHittersSql)),
    ("q65_hll_vocab",
      (s: SparkSession, d: String) => hllVocabAudit(Tables.documents(s, d)),
      Some(q65HllAuditSql)))
}
