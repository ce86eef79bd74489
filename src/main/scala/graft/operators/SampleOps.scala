package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Stratified sampling — SURVEY.md §2b Q39: deterministic, reproducible
  * samples per stratum, the step that builds balanced eval/ablation
  * subsets from a skewed corpus (a fraction sample of raw web data is
  * 90% English; eval sets want N docs PER language/source).
  *
  * Both samplers key on the same cross-engine doc_id hash as
  * `TextOps.trainSplit` (md5 prefix → integer), so membership is a pure
  * function of the row — reruns, engines, and cluster sizes all agree,
  * and a doc's membership never depends on what else is in the corpus.
  *
  * Scale shapes:
  *  - [[stratifiedFixedN]] (exact N per stratum) is a rank-limit window.
  *    Spark plans `row_number() <= k` as WindowGroupLimit (SPARK-37099):
  *    each MAP task keeps only its local top-k per stratum before the
  *    shuffle, so the per-stratum reducer sees ≤ k·numMapPartitions rows
  *    — NOT the whole stratum. That partial pruning is what makes
  *    few-large-strata sampling survive 100 TB (the naive window would
  *    funnel each stratum's full data through one reducer, the q35
  *    collapse); PlanSpec pins both WindowGroupLimit phases.
  *  - [[stratifiedFraction]] (p% per stratum) is a pure hash-threshold
  *    filter: ZERO shuffle, rides pushdown, exact expectation.
  */
object SampleOps {

  /** The shared deterministic per-row bucket in [0, mod): md5 of the id
    * rendered as utf-8, first 15 hex chars as an integer (fits a long;
    * same value DuckDB computes via CAST('0x'||substring(md5(..)) ...)). */
  def hashBucket(id: Column, mod: Int): Column =
    conv(substring(md5(to_binary(id.cast("string"), lit("utf-8"))), 1, 15),
      16, 10).cast("long") % mod

  /** Exactly `n` docs per `stratum` (fewer if the stratum is smaller),
    * chosen by ascending id-hash with the id as tiebreak — a total order,
    * so the selection is unique and reproducible. Emits `sample_rank`
    * (1..n within the stratum). */
  def stratifiedFixedN(df: DataFrame, stratum: Column, id: Column,
      n: Int): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(hashBucket(id, 1000000).asc, id.asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Hash-threshold sampler: keeps each row iff its id-bucket (out of
    * `denom`) falls under `num` — num/denom of every stratum in
    * expectation, zero shuffle, membership stable under corpus growth.
    * The stratum column only matters to the caller's bookkeeping; the
    * filter itself is embarrassingly parallel. */
  def stratifiedFraction(df: DataFrame, id: Column, num: Int,
      denom: Int = 100): DataFrame =
    df.filter(hashBucket(id, denom) < num)

  /** Temperature resampling (the data-mixing step of large-corpus
    * training runs, public canon: multinomial sampling with exponent
    * τ < 1 upweights small sources — Raffel et al. JMLR '20 §3.4.2,
    * Conneau & Lample '19): target share of stratum s ∝ n_s^τ, overall
    * volume ≈ `targetFrac` of the corpus, membership by the same
    * deterministic id-hash threshold as [[stratifiedFraction]].
    *
    * Entirely in-plan: one tiny count aggregate per stratum, the
    * normalizer via a metadata-scale window over the #strata rows, a
    * broadcast join of per-stratum thresholds back onto the corpus, and
    * a zero-shuffle filter. Fractions cap at 1 (a stratum can't be
    * upsampled past itself — this is selection, not duplication).
    * Thresholds quantize to 1/10000 so the cross-engine float boundary
    * is exact. */
  def temperatureSample(df: DataFrame, stratum: String, id: Column,
      tau: Double, targetFrac: Double): DataFrame = {
    val fr = temperatureFractions(df, stratum, tau, targetFrac)
    df.join(broadcast(fr.select(col(stratum), col("_thresh"))), stratum)
      .filter(hashBucket(id, 10000) < col("_thresh"))
      .drop("_thresh")
  }

  private def temperatureFractions(df: DataFrame, stratum: String,
      tau: Double, targetFrac: Double): DataFrame = {
    val w = Window.orderBy(col(stratum))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.groupBy(col(stratum)).agg(count(lit(1)).as("n_docs"))
      .withColumn("_z", sum(pow(col("n_docs"), tau)).over(w))
      .withColumn("_total", sum(col("n_docs")).over(w))
      .withColumn("frac",
        least(lit(1.0), lit(targetFrac) * col("_total")
          * pow(col("n_docs"), tau) / col("_z") / col("n_docs")))
      .withColumn("_thresh", round(col("frac") * 10000).cast("long"))
  }

  /** q42 registry entry: per-source audit of a τ=0.7, 50%-volume
    * temperature resample of documents — how many docs each source
    * holds, how many survive, at what fraction. */
  def temperatureAudit(docs: DataFrame, tau: Double = 0.7,
      targetFrac: Double = 0.5): DataFrame = {
    val fr = temperatureFractions(docs, "source", tau, targetFrac)
    docs.join(broadcast(fr), "source")
      .withColumn("keep",
        (hashBucket(col("doc_id"), 10000) < col("_thresh")).cast("int"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("keep")).as("n_selected"),
        round(max(col("frac")), 4).as("frac"))
      .orderBy("source")
  }

  val q42TemperatureSql: String =
    """WITH c AS (SELECT source, count(*) AS n_docs FROM documents
      |  GROUP BY source),
      |f AS (SELECT source, n_docs,
      |    least(1.0, 0.5 * (SELECT sum(n_docs) FROM c)
      |      * pow(n_docs, 0.7) / (SELECT sum(pow(n_docs, 0.7)) FROM c)
      |      / n_docs) AS frac
      |  FROM c),
      |s AS (SELECT d.source,
      |    CASE WHEN CAST(('0x' || substring(md5(CAST(d.doc_id AS VARCHAR)),
      |        1, 15)) AS BIGINT) % 10000 < round(f.frac * 10000)
      |      THEN 1 ELSE 0 END AS keep, f.frac
      |  FROM documents d JOIN f ON d.source = f.source)
      |SELECT source, count(*) AS n_docs,
      |  count(CASE WHEN keep = 1 THEN 1 END) AS n_selected,
      |  round(max(frac), 4) AS frac
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  /** q39 registry entry: 40 docs per language by the deterministic hash
    * order, with per-doc rank — the balanced-eval-set build. */
  def docsPerLang(docs: DataFrame, n: Int = 40): DataFrame =
    stratifiedFixedN(docs, col("lang"), col("doc_id"), n)
      .select(col("lang"), col("sample_rank"), col("doc_id"),
        col("source"), col("n_chars"))
      .orderBy("lang", "sample_rank")

  /** Deterministic weighted sampling WITHOUT replacement, k per stratum —
    * Efraimidis–Spirakis A-ES (IPL 2006, public canon): each row draws a
    * uniform u and keeps key u^(1/w); the top-k keys are exactly a
    * weighted sample without replacement. Here u is the hash-uniform
    * (bucket + 0.5)/10^6 of the id — so the draw is a pure function of
    * the row (reproducible across engines/cluster sizes, the
    * [[stratifiedFixedN]] contract) — and the top-k-per-stratum filter
    * plans as WindowGroupLimit: map-side partial top-k, never a full
    * stratum through one reducer. Weights must be > 0. */
  def weightedSample(df: DataFrame, stratum: Column, id: Column,
      weight: Column, k: Int): DataFrame = {
    val u = (hashBucket(id, 1000000).cast("double") + 0.5) / 1000000.0
    val key = pow(u, lit(1.0) / weight.cast("double"))
    val w = Window.partitionBy(stratum).orderBy(key.desc, id.asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }

  /** q49 registry entry: 15 docs per language, weighted by length — long
    * docs favored proportionally to n_chars, reproducibly. */
  def weightedDocsPerLang(docs: DataFrame, k: Int = 15): DataFrame =
    weightedSample(docs, col("lang"), col("doc_id"), col("n_chars"), k)
      .select(col("lang"), col("sample_rank"), col("doc_id"), col("n_chars"))
      .orderBy("lang", "sample_rank")

  val q49WeightedSql: String =
    """SELECT lang, sample_rank, doc_id, n_chars FROM (
      |  SELECT lang, doc_id, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      pow((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |             AS BIGINT) % 1000000 + 0.5) / 1000000.0,
      |          1.0 / n_chars) DESC, doc_id) AS sample_rank
      |  FROM documents) t
      |WHERE sample_rank <= 15 ORDER BY lang, sample_rank""".stripMargin

  val q39StratifiedSql: String =
    """SELECT lang, sample_rank, doc_id, source, n_chars FROM (
      |  SELECT lang, doc_id, source, n_chars,
      |    row_number() OVER (PARTITION BY lang ORDER BY
      |      CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))
      |        AS BIGINT) % 1000000, doc_id) AS sample_rank
      |  FROM documents) t
      |WHERE sample_rank <= 40 ORDER BY lang, sample_rank""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q39_stratified_sample",
      (s: SparkSession, d: String) => docsPerLang(Tables.documents(s, d)),
      Some(q39StratifiedSql)),
    ("q42_temperature_sample",
      (s: SparkSession, d: String) => temperatureAudit(Tables.documents(s, d)),
      Some(q42TemperatureSql)),
    ("q49_weighted_sample",
      (s: SparkSession, d: String) => weightedDocsPerLang(Tables.documents(s, d)),
      Some(q49WeightedSql)))
}
