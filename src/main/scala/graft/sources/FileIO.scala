package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch file-format surface of the engine (SURVEY.md §2b sources/sinks):
  * Parquet primary, CSV/JSON for fixtures/interchange.
  *
  * Schemas are always supplied explicitly: at 100 TB, schema inference is a
  * full extra pass over the data for CSV/JSON (and a footer fan-out for
  * parquet), and a silently inferred type change upstream corrupts every
  * downstream query. Inference is for notebooks; a pipeline declares.
  */
object FileIO {
  def readCsv(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
      .option("mode", "FAILFAST") // corrupt rows fail loudly, not as nulls
      .csv(path)

  def readJson(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]")
      .option("mode", "FAILFAST")
      .json(path)

  /** ORC: the other columnar interchange format (Hive-ecosystem hand-off).
    * Same pushdown/pruning machinery as parquet in Spark's reader — a
    * pipeline ingesting a warehouse's ORC extracts loses nothing. */
  def readOrc(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet sink: the layout that makes partition
    * pruning (directory-level skip, visible as PartitionFilters in the scan
    * node) work for every downstream reader. Low-cardinality keys only. */
  def writeParquetPartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)

  /** Bucketed catalog table: pre-shuffles once at write time on the join
    * key so every later equi-join/aggregation on that key is co-located —
    * at 100 TB this converts the recurring fact⋈fact shuffle (the single
    * most expensive step of a big join) into a zero-exchange sort-merge
    * join. Requires `saveAsTable` (bucket metadata lives in the catalog). */
  /** Drop `table` from the catalog AND clear its warehouse location: with
    * an in-memory catalog a previous JVM's table data may survive in the
    * warehouse dir without catalog metadata, and a later `saveAsTable`
    * fails with LOCATION_ALREADY_EXISTS. */
  def dropTableAndLocation(s: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    s.sql(s"DROP TABLE IF EXISTS $table")
    // Hadoop FS, not java.io.File: the warehouse can live on any
    // supported filesystem (here a local tmp dir, at cluster scale
    // HDFS/S3) and Path handles the URI scheme either way
    val p = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir").stripSuffix("/") + s"/$table")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true): Unit
  }

  def writeParquetBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    val s = df.sparkSession
    dropTableAndLocation(s, table)
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Append a batch to an existing bucketed table. The bucket spec must
    * match the table's (Spark verifies against the catalog) — each append
    * adds one file per (bucket, write job), which bucketed scans merge;
    * compaction cadence is the deployment's call. This is the incremental
    * half of the bucketed-index posture: the expensive write-time
    * derivation runs only over the NEW rows. */
  def appendParquetBucketed(df: DataFrame, table: String, nBuckets: Int,
      bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("append").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
