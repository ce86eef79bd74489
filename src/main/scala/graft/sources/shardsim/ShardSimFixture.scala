package graft.sources.shardsim

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables

/** Deterministic shardsim fixture generator (FIXTURES.md §2.1): replays the
  * `events` table as N shard files. Shard = user_id mod N (the Kinesis
  * partition-key hash analog); per-shard sequence numbers are zero-padded
  * row indexes (lexicographically ordered, like Kinesis sequence numbers).
  *
  * collect() is deliberate: this writes local *test fixtures* (≤100k rows),
  * it is not a data-path operator.
  */
object ShardSimFixture {

  def generate(spark: SparkSession, sfDir: String, outDir: String, nShards: Int,
      closedShards: Set[Int] = Set.empty): Unit = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)
    // clean previous fixture files
    Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".tsv")).foreach(_.delete())

    val rows = Tables.events(spark, sfDir)
      .select(
        col("event_id"),
        pmod(col("user_id"), lit(nShards)).cast("int").as("shard"),
        col("user_id").cast("string").as("pk"),
        unix_micros(col("ts")).as("arrival"),
        to_json(struct(col("event_id"), col("user_id"), col("event_type"),
          col("value"), unix_micros(col("ts")).as("ts_us"), col("props"))).as("data"))
      .orderBy("event_id")
      .collect()

    val writers = (0 until nShards).map { k =>
      val name = if (closedShards.contains(k)) s"shard-$k.closed.tsv" else s"shard-$k.tsv"
      k -> Files.newBufferedWriter(dir.resolve(name),
        StandardCharsets.UTF_8, StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    }.toMap
    val counters = scala.collection.mutable.Map((0 until nShards).map(_ -> 0L): _*)
    try {
      rows.foreach { r =>
        val shard = r.getInt(1)
        val seq = counters(shard)
        counters(shard) = seq + 1
        val w = writers(shard)
        w.write(f"$seq%012d\t${r.getString(2)}\t${r.getLong(3)}\t${r.getString(4)}\n")
      }
    } finally writers.values.foreach(_.close())
  }

  private def writeShardFile(outDir: String, name: String,
      rows: Seq[(String, Long, String)]): Unit = {
    Files.createDirectories(Paths.get(outDir))
    val w = Files.newBufferedWriter(Paths.get(outDir, name),
      StandardCharsets.UTF_8, StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    try rows.zipWithIndex.foreach { case ((pk, arrival, data), i) =>
      w.write(f"$i%012d\t$pk\t$arrival\t$data\n")
    } finally w.close()
  }

  /** Write a standalone shard file with explicit rows
    * (partitionKey, arrivalMicros, dataJson). */
  def writeShard(outDir: String, shard: Int,
      rows: Seq[(String, Long, String)], closed: Boolean = false): Unit =
    writeShardFile(outDir,
      s"shard-$shard" + (if (closed) ".closed.tsv" else ".tsv"), rows)

  /** Write a split/merge child shard file (`shard-<child>.parent-<parent>.tsv`):
    * the source will admit its records only after `shard-<parent>` is closed
    * and drained. Rows: (partitionKey, arrivalMicros, dataJson). */
  def writeChild(outDir: String, child: Int, parent: Int,
      rows: Seq[(String, Long, String)], closed: Boolean = false): Unit =
    writeShardFile(outDir,
      s"shard-$child.parent-$parent" + (if (closed) ".closed.tsv" else ".tsv"), rows)

  /** Write a merge child declaring multiple parents
    * (`shard-<child>.parent-<p1>.parent-<p2>.tsv`): admitted only after
    * every parent is closed and drained. */
  def writeMergeChild(outDir: String, child: Int, parents: Seq[Int],
      rows: Seq[(String, Long, String)], closed: Boolean = false): Unit =
    writeShardFile(outDir,
      s"shard-$child" + parents.map(p => s".parent-$p").mkString +
        (if (closed) ".closed.tsv" else ".tsv"), rows)

  /** Seal a shard file (append `.closed` before `.tsv`), preserving any
    * parent marker — the shard-end event of a split. */
  def closeShard(outDir: String, shard: Int): Unit = {
    val dir = Paths.get(outDir)
    Option(dir.toFile.listFiles()).getOrElse(Array.empty)
      .filter(f => (f.getName == s"shard-$shard.tsv"
        || (f.getName.startsWith(s"shard-$shard.parent-") && !f.getName.contains(".closed")))
        && f.getName.endsWith(".tsv"))
      .foreach { f =>
        val newName = f.getName.stripSuffix(".tsv") + ".closed.tsv"
        Files.move(f.toPath, dir.resolve(newName))
      }
  }

  /** Append more rows to an existing fixture (for incremental-batch tests).
    * Rows: (partitionKey, arrivalMicros, dataJson) appended to `shard`. */
  def append(outDir: String, shard: Int, rows: Seq[(String, Long, String)]): Unit = {
    val f = Paths.get(outDir, s"shard-$shard.tsv")
    val existing = Files.readAllLines(f, StandardCharsets.UTF_8).size.toLong
    val w = Files.newBufferedWriter(f, StandardCharsets.UTF_8, StandardOpenOption.APPEND)
    try rows.zipWithIndex.foreach { case ((pk, arrival, data), i) =>
      w.write(f"${existing + i}%012d\t$pk\t$arrival\t$data\n")
    } finally w.close()
  }
}
