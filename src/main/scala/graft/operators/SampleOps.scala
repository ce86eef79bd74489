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

  /** q39 registry entry: 40 docs per language by the deterministic hash
    * order, with per-doc rank — the balanced-eval-set build. */
  def docsPerLang(docs: DataFrame, n: Int = 40): DataFrame =
    stratifiedFixedN(docs, col("lang"), col("doc_id"), n)
      .select(col("lang"), col("sample_rank"), col("doc_id"),
        col("source"), col("n_chars"))
      .orderBy("lang", "sample_rank")

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
      Some(q39StratifiedSql)))
}
