package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Column profiling — SURVEY.md §2b Q37: per-column row count, null count,
  * exact distinct count, min/max/mean — the first pass a pipeline runs
  * over any new table (schema sanity, null-rate regression gates,
  * join-key cardinality estimates).
  *
  * Plan shape: ONE scan of the table, a `stack` unpivot into narrow
  * (column, value) pairs, then a single grouped aggregation with ONE
  * distinct aggregate. With exactly one distinct column Spark plans the
  * NDV WITHOUT the Expand it needs for per-column distincts (the N-wide
  * form multiplies every row N+1 times through a wide-keyed hash
  * aggregate — measured 2.4× slower at sf0.1): the map side dedupes
  * (column, value) pairs while folding the plain stats, so only the
  * distinct pair set shuffles — low-cardinality columns collapse to
  * almost nothing. Swap `countDistinct` for `approx_count_distinct` when
  * an estimate suffices (the q18 pattern) and the pair dedup disappears
  * entirely. */
object ProfileOps {

  /** Profile `cols` (numeric, cast to double) of `df`: one row per column
    * with (n, nulls, ndv, min, max, mean), rounded for cross-engine
    * equality. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val stackArgs = cols
      .map(c => s"'$c', cast($c as double)").mkString(", ")
    df.select(expr(s"stack(${cols.size}, $stackArgs)")
        .as(Seq("column", "value")))
      .groupBy(col("column"))
      .agg(count(lit(1)).as("n"),
        (count(lit(1)) - count(col("value"))).as("nulls"),
        countDistinct(col("value")).as("ndv"),
        round(min(col("value")), 4).as("min"),
        round(max(col("value")), 4).as("max"),
        round(avg(col("value")), 4).as("mean"))
      .orderBy("column")
  }

  private val LineitemCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  def lineitemProfile(lineitem: DataFrame): DataFrame =
    numericProfile(lineitem, LineitemCols)

  val q37ProfileSql: String = LineitemCols.map { c =>
    s"""SELECT '$c' AS "column", count(*) AS n,
       |  count(*) - count($c) AS nulls,
       |  count(DISTINCT $c) AS ndv,
       |  round(min($c), 4) AS min, round(max($c), 4) AS max,
       |  round(avg($c), 4) AS mean
       |FROM lineitem""".stripMargin
  }.mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q37_profile",
      (s: SparkSession, d: String) => lineitemProfile(Tables.lineitem(s, d)),
      Some(q37ProfileSql)))
}
