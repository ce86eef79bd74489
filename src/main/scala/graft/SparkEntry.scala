package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{AdvancedQueries, EventOps, RelationalQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (SURVEY §2b); each
  * entry with an `oracleSql` twin is hash-checked against DuckDB at sf0.01
  * by the driver. Queries whose semantics are not SQL-expressible (approx /
  * LSH variants) appear in `queries` only → rows-only check.
  */
object SparkEntry {
  private def registry: Seq[(String, (SparkSession, String) => DataFrame, Option[String])] =
    RelationalQueries.all ++ AdvancedQueries.all ++ EventOps.all ++
      graft.operators.JourneyOps.all ++ graft.operators.GlobalWindows.all ++
      graft.operators.CdcOps.all ++ graft.operators.ProfileOps.all ++
      graft.operators.SampleOps.all ++ graft.operators.QualityOps.all ++
      graft.operators.ManifestOps.all ++ graft.operators.PruneOps.all ++
      graft.operators.LayoutOps.all ++ graft.operators.StatsOps.all ++
      graft.operators.LinkageOps.all ++ graft.operators.RollupOps.all ++
      graft.llm.LlmOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q03Agg(
      graft.core.Tables.lineitem(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, f, _) => n -> f }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.collect { case (n, _, Some(sql)) => n -> sql }.toMap
}
