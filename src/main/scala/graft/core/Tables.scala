package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet corpus (TESTDATA.md).
  *
  * Tables are plain parquet files, one per table, under a scale-factor
  * directory. All reads go through here so that scan options (and, at
  * cluster scale, things like bucketing metadata) live in one place.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Memoized per (session, path, file mtime): re-running a query skips
    * file listing and footer/schema resolution — the single-node analog of
    * a catalog with cached table metadata. The cached value is only the
    * analyzed logical plan; no data is pinned.
    *
    * The mtime in the key invalidates naturally when a caller overwrites a
    * parquet path within the same session (fixture regen, Stress-style
    * rewrites) — the stale file index would otherwise yield wrong results
    * or FileNotFoundException. Entries of stopped sessions and superseded
    * mtimes are swept on each load so the map cannot pin dead sessions. */
  private case class TableKey(session: SparkSession, path: String, mtime: Long)
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[TableKey, DataFrame]()

  private def mtimeOf(path: String): Long =
    try java.nio.file.Files.getLastModifiedTime(java.nio.file.Paths.get(path))
      .toMillis
    catch { case _: Exception => -1L }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val key = TableKey(spark, path, mtimeOf(path))
    planCache.keySet.removeIf(k =>
      k.session.sparkContext.isStopped ||
        (k.path == path && (k.session eq spark) && k != key))
    planCache.computeIfAbsent(key, k => k.session.read.parquet(k.path))
  }

  /** Drop all memoized plans (for writers that restructure fixture dirs). */
  def clearPlanCache(): Unit = planCache.clear()

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is TIMESTAMP(NANOS) in parquet, which Spark's TimestampType
    * (micros) cannot hold; sessions set spark.sql.legacy.parquet.nanosAsLong
    * and we truncate ns→µs here with integer division — the same truncation
    * DuckDB applies when it reads nanos into its µs TIMESTAMP, so oracle
    * comparisons see identical instants. */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan a frame out to the cluster's core count ahead of CPU-heavy per-row
    * work (shingling, regex tokenization, JSON parsing). Parquet can only
    * split at row-group boundaries, so a table with few row groups scans at
    * less parallelism than the cluster has cores — and any expensive
    * map-side stage inherits that ceiling. The shuffle this inserts moves
    * each row once, which is noise next to per-row compute that costs
    * orders of magnitude more than a row copy; when scan parallelism
    * already saturates the cluster it is a wash, when it doesn't (few/huge
    * files — common for crawl dumps) it is the difference between 1 busy
    * core and all of them. */
  def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)
}
