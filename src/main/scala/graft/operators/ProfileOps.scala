package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Column profiling — SURVEY.md §2b Q37: per-column row count, null count,
  * exact distinct count, min/max/mean — the first pass a pipeline runs
  * over any new table (schema sanity, null-rate regression gates,
  * join-key cardinality estimates).
  *
  * Plan shape: ONE scan of the table computing every column's aggregates
  * in a single wide aggregation row, then a `stack` unpivot of that one
  * row into per-column rows. The exact distinct counts are the expensive
  * part — Spark plans the N distinct aggregates as an Expand (N× row
  * multiplication) feeding one shuffled aggregate, which is the standard
  * exact-NDV-at-scale tradeoff; swap `countDistinct` for
  * `approx_count_distinct` when an estimate suffices (the q18 pattern) and
  * the Expand disappears. */
object ProfileOps {

  /** Profile `cols` (numeric) of `df`: one row per column with
    * (n, nulls, ndv, min, max, mean), rounded for cross-engine equality. */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"${c}__n"),
        count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__ndv"),
        round(min(col(c)), 4).as(s"${c}__min"),
        round(max(col(c)), 4).as(s"${c}__max"),
        round(avg(col(c)), 4).as(s"${c}__mean"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map { c =>
      s"'$c', ${c}__n, ${c}__n - ${c}__nn, ${c}__ndv, " +
        s"${c}__min, ${c}__max, ${c}__mean"
    }.mkString(", ")
    wide.select(expr(s"stack(${cols.size}, $stackArgs)")
        .as(Seq("column", "n", "nulls", "ndv", "min", "max", "mean")))
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
