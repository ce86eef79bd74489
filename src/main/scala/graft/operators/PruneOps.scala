package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Bloom-filter semi-join pruning — SURVEY.md §2b Q46: the explicit form
  * of the "filter the 100 TB fact by the small dimension BEFORE the
  * shuffle" pattern. Spark's optimizer injects this automatically
  * (InjectRuntimeFilter) only when its thresholds and join shapes line
  * up; a pipeline that KNOWS its selective side can declare it and keep
  * the guarantee under refactors.
  *
  * Mechanics: the build side aggregates its keys into one bloom filter
  * (`bloom_agg` = Spark's own BloomFilterAggregate, registered by
  * GraftExtensions — merged map-side like any partial aggregate, one
  * sketch per partition over the network), the one-row result is
  * broadcast and applied as a `bloom_might_contain` scan-side filter, and
  * an exact semi join afterwards removes the false positives. Net effect
  * at 100 TB: the fact table's shuffle carries ~selectivity·rows instead
  * of all rows, at the cost of one broadcast sketch — the result is
  * EXACT (the bloom can only pass extra rows; the semi join drops them).
  */
object PruneOps {

  /** `fact` rows whose `factKey` appears in `dim`'s `dimKey` (exact semi
    * join semantics), with the shuffle pruned by a broadcast bloom filter
    * built over the dim keys. `expectedItems` sizes the sketch (~1.2 KB
    * per 1k items at the default 3% fpp). */
  def bloomPruneSemiJoin(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    // might_contain requires its sketch side to be a scalar subquery (or
    // literal) — the build plans as an InSubqueryExec-style one-row
    // subquery evaluated once, not a join
    val bloom = dim.agg(
      expr(s"bloom_agg(xxhash64($dimKey), ${expectedItems}L)").as("_bloom"))
      .scalar()
    fact
      .filter(call_function("bloom_might_contain", bloom,
        xxhash64(col(factKey))))
      .join(dim.select(col(dimKey).as(factKey)).distinct(), Seq(factKey),
        "left_semi")
  }

  /** q46 registry entry: orders placed by BUILDING-segment customers —
    * the classic selective-dimension fact prune. */
  def buildingSegmentOrders(orders: DataFrame,
      customer: DataFrame): DataFrame =
    bloomPruneSemiJoin(
      orders, "o_custkey",
      customer.filter(col("c_mktsegment") === "BUILDING"), "c_custkey",
      expectedItems = 100000L)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate"))
      .orderBy("o_orderkey")

  val q46BloomPruneSql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer
      |                    WHERE c_mktsegment = 'BUILDING')
      |ORDER BY o_orderkey""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q46_bloom_prune",
      (s: SparkSession, d: String) =>
        buildingSegmentOrders(Tables.orders(s, d), Tables.customer(s, d)),
      Some(q46BloomPruneSql)))
}
