package graft

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.sources.FileIO

/** Format-roundtrip and partition-pruning coverage for the batch file
  * surface: the same rows must survive parquet → CSV/JSON → read with an
  * explicit schema, and a partitioned write must prune at the scan. */
class FileIOSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("CSV roundtrip preserves rows and aggregates") {
    val docs = Tables.documents(spark, sf0001)
      .select("doc_id", "lang", "source", "n_chars") // text has newlines; CSV fixture surface is scalar columns
    val dir = tmp("csv")
    FileIO.writeCsv(docs, dir)
    val back = FileIO.readCsv(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    val a = docs.agg(sum("n_chars")).collect()(0).getLong(0)
    val b = back.agg(sum("n_chars")).collect()(0).getLong(0)
    assert(a == b)
  }

  test("JSON roundtrip preserves rows including multiline text") {
    val docs = Tables.documents(spark, sf0001)
    val dir = tmp("json")
    FileIO.writeJson(docs, dir)
    val back = FileIO.readJson(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    val a = docs.select(md5(concat_ws("|", col("doc_id"), col("text"))).as("h"))
      .agg(count_distinct(col("h"))).collect()(0).getLong(0)
    val b = back.select(md5(concat_ws("|", col("doc_id"), col("text"))).as("h"))
      .agg(count_distinct(col("h"))).collect()(0).getLong(0)
    assert(a == b)
  }

  test("ORC roundtrip preserves rows and pushes filters to the scan") {
    val docs = Tables.documents(spark, sf0001)
    val dir = tmp("orc")
    FileIO.writeOrc(docs, dir)
    val back = FileIO.readOrc(spark, dir, docs.schema)
    assert(back.count() == docs.count())
    val a = docs.select(md5(concat_ws("|", col("doc_id"), col("text"))).as("h"))
      .agg(count_distinct(col("h"))).collect()(0).getLong(0)
    val b = back.select(md5(concat_ws("|", col("doc_id"), col("text"))).as("h"))
      .agg(count_distinct(col("h"))).collect()(0).getLong(0)
    assert(a == b)
    // the ORC reader participates in the same pushdown machinery as parquet
    val filtered = back.filter(col("n_chars") > 500).select("doc_id")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:int>") ||
      plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), plan)
  }

  test("partitioned parquet write prunes partitions at the scan") {
    val docs = Tables.documents(spark, sf0001)
    val dir = tmp("part")
    FileIO.writeParquetPartitioned(docs, dir, "lang")
    val langs = docs.select("lang").distinct().collect().map(_.getString(0))
    val one = spark.read.parquet(dir).filter(col("lang") === langs.head)
    // pruning shows up as PartitionFilters in the FileSourceScan node
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    val expected = docs.filter(col("lang") === langs.head).count()
    assert(one.count() == expected)
  }
}
