package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.app.ConsumeApp
import graft.sources.shardsim.ShardSimFixture

/** DSv2 shardsim source: batch + micro-batch reads, admission control,
  * resume-after-offset across restarts (SURVEY §7.3, §5.2-3). */
class ShardSimSourceSpec extends SparkSpec {

  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("shardsim").toString
    ShardSimFixture.generate(spark, sf0001, dir, nShards = 4)
    dir
  }
  private lazy val nEvents: Long =
    spark.read.parquet(s"$sf0001/events.parquet").count()

  test("batch read sees every record exactly once, with shard lineage") {
    val df = spark.read.format("graft.sources.shardsim.ShardSimProvider")
      .load(fixtureDir)
    assert(df.count() == nEvents)
    assert(df.select("shardId").distinct().count() == 4)
    // sequence numbers are unique per shard and contiguous from 0
    val perShard = df.groupBy("shardId")
      .agg(count(lit(1)).as("n"), countDistinct("sequenceNumber").as("d"),
        min("sequenceNumber").as("lo"))
      .collect()
    perShard.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Long]("d"))
      assert(r.getAs[String]("lo") == "000000000000")
    }
  }

  test("streaming AvailableNow consumes everything exactly once") {
    val out = Files.createTempDirectory("consume_out").toString
    val ckpt = Files.createTempDirectory("consume_ckpt").toString
    val q = ConsumeApp.run(spark, fixtureDir, out, ckpt)
    q.awaitTermination()
    val result = spark.read.parquet(s"$out/batch_id=*")
    assert(result.count() == nEvents)
    assert(result.select("event_id").distinct().count() == nEvents)
    // observe() metrics flow through the progress events: every payload
    // decodes, and the observed row count covers the whole fixture
    val observed = q.recentProgress.flatMap(p =>
      Option(p.observedMetrics.get("decode"))).toSeq
    assert(observed.nonEmpty, "expected observed 'decode' metrics")
    assert(observed.map(_.getAs[Long]("rows")).sum == nEvents)
    assert(observed.map(_.getAs[Long]("decode_failures")).sum == 0)
  }

  test("maxRecordsPerBatch bounds each micro-batch (admission control)") {
    val out = Files.createTempDirectory("capped_out").toString
    val ckpt = Files.createTempDirectory("capped_ckpt").toString
    val q = ConsumeApp.run(spark, fixtureDir, out, ckpt,
      trigger = Trigger.AvailableNow(), maxRecordsPerBatch = Some(100L))
    q.awaitTermination()
    val result = spark.read.parquet(s"$out/batch_id=*")
    assert(result.count() == nEvents)
    // with a 100-record cap and 1000 records there must be many batches
    val nBatches = result.select(input_file_name()).distinct().count()
    assert(nBatches >= 9, s"expected >=9 capped batches, got $nBatches")
  }

  test("restart from checkpoint resumes after-offset: no loss, no dupes") {
    val dir = Files.createTempDirectory("shardsim_resume").toString
    ShardSimFixture.generate(spark, sf0001, dir, nShards = 4)
    val out = Files.createTempDirectory("resume_out").toString
    val ckpt = Files.createTempDirectory("resume_ckpt").toString
    // phase 1: consume the initial fixture
    val q1 = ConsumeApp.run(spark, dir, out, ckpt)
    q1.awaitTermination()
    // phase 2: new records arrive, consumer restarts from the WAL
    val extra = (0 until 50).map(i =>
      (s"u$i", 1700000000000000L + i,
        s"""{"event_id":${100000 + i},"user_id":$i,"event_type":"x","value":1.0,"ts_us":${1700000000000000L + i},"props":"{}"}"""))
    ShardSimFixture.append(dir, shard = 1, extra)
    val q2 = ConsumeApp.run(spark, dir, out, ckpt)
    q2.awaitTermination()
    val result = spark.read.parquet(s"$out/batch_id=*")
    assert(result.count() == nEvents + 50)
    assert(result.select("event_id").distinct().count() == nEvents + 50,
      "resume must not replay committed offsets (exactly-once)")
  }

  test("shards appearing mid-stream are discovered and consumed (split/merge analog)") {
    // the reference's explicitly-unfinished TODO (README.md:8): after a
    // split, new child shards must be discovered and consumed from seq 0.
    // The simulator handles it structurally: shard listing happens per
    // latestOffset poll, and an unknown shard's start offset defaults to 0.
    val dir = Files.createTempDirectory("shardsim_split").toString
    ShardSimFixture.generate(spark, sf0001, dir, nShards = 2)
    val out = Files.createTempDirectory("split_out").toString
    val ckpt = Files.createTempDirectory("split_ckpt").toString
    val q1 = ConsumeApp.run(spark, dir, out, ckpt)
    q1.awaitTermination()
    // "split": shard-1 closes, two new child shards appear with fresh records
    java.nio.file.Files.move(
      java.nio.file.Paths.get(dir, "shard-1.tsv"),
      java.nio.file.Paths.get(dir, "shard-1.closed.tsv"))
    Seq(2, 3).foreach { child =>
      val rows = (0 until 25).map(i =>
        (s"u$i", 1710000000000000L + i,
          s"""{"event_id":${200000 + child * 1000 + i},"user_id":$i,"event_type":"x","value":1.0,"ts_us":${1710000000000000L + i},"props":"{}"}"""))
      val f = java.nio.file.Paths.get(dir, s"shard-$child.tsv")
      val w = java.nio.file.Files.newBufferedWriter(f)
      try rows.zipWithIndex.foreach { case ((pk, ar, data), i) =>
        w.write(f"$i%012d\t$pk\t$ar\t$data\n")
      } finally w.close()
    }
    val q2 = ConsumeApp.run(spark, dir, out, ckpt)
    q2.awaitTermination()
    val result = spark.read.parquet(s"$out/batch_id=*")
    assert(result.count() == nEvents + 50)
    assert(result.select("event_id").distinct().count() == nEvents + 50,
      "child-shard records must arrive exactly once, parents not replayed")
  }

  test("closed shards are read to their end and then excluded") {
    val dir = Files.createTempDirectory("shardsim_closed").toString
    ShardSimFixture.generate(spark, sf0001, dir, nShards = 4, closedShards = Set(0, 2))
    val df = spark.read.format("graft.sources.shardsim.ShardSimProvider").load(dir)
    assert(df.count() == nEvents)
    assert(df.select("shardId").distinct().count() == 4)
  }
}
