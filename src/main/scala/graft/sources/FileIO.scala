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

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Hive-style partitioned parquet sink: the layout that makes partition
    * pruning (directory-level skip, visible as PartitionFilters in the scan
    * node) work for every downstream reader. Low-cardinality keys only. */
  def writeParquetPartitioned(df: DataFrame, path: String, cols: String*): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
