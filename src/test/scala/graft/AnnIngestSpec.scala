package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.app.AnnIngestApp
import graft.core.Tables
import graft.llm.SimilarityOps
import graft.sources.shardsim.ShardSimFixture

/** The ANN index family under the exactly-once streaming posture:
  * per-batch idempotent partitions (a WAL replay overwrites, never
  * double-appends — the flat appendToTrainedIvfIndex append would
  * duplicate), serve ≡ the same-model direct form, mid-batch crash +
  * replay convergence, read-time takedown, and the shared
  * checkpoint-binding guard. */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private def vecJson(r: org.apache.spark.sql.Row): (String, Long, String) = {
    val id = r.getLong(0)
    val e = r.getSeq[Float](1).mkString(",")
    (s"v$id", 1700000000000000L + id, s"""{"vec_id":$id,"embedding":[$e]}""")
  }

  test("streamed ANN index: exactly-once under mid-batch crash+replay, " +
      "serve ≡ same-model direct, takedown at read time, foreign " +
      "checkpoint refused") {
    val em = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"))
    val rows = em.orderBy("vec_id").collect().map(vecJson)
    val shardDir = Files.createTempDirectory("annin_shard").toString
    ShardSimFixture.writeShard(shardDir, 0, rows.take(300))
    ShardSimFixture.writeShard(shardDir, 1, rows.drop(300))
    val annDir = Files.createTempDirectory("annin_idx").toString
    val ckpt = Files.createTempDirectory("annin_ckpt").toString
    AnnIngestApp.trainModel(spark, annDir, em)
    val model = AnnIngestApp.model(spark, annDir).localCheckpoint()

    // first run crashes mid-batch; the replay must converge with no
    // duplicate rows (per-batch overwrite, not append)
    val marker = Files.createTempDirectory("annin_marker")
      .resolve("fired").toString
    def start(extra: Map[String, String] = Map.empty) =
      AnnIngestApp.run(spark, shardDir, annDir, ckpt,
        maxRecordsPerBatch = Some(120L), extraOptions = extra)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start(Map("faultInjectMarker" -> marker,
        "faultInjectAfter" -> "40")).awaitTermination()
    }
    start().awaitTermination()
    val idx = AnnIngestApp.index(spark, annDir)
    assert(idx.count() == 500L, "exactly-once: one row per vector")
    assert(idx.select("vec_id").distinct().count() == 500L)

    // serve ≡ the same-model direct composition
    val served = AnnIngestApp.serve(spark, annDir).collect().toSeq
    val direct = SimilarityOps.knnIvfTrained(
      SimilarityOps.assignUnderModel(em, model), model).collect().toSeq
    assert(served == direct)

    // the int8 tier serves from the SAME landed partitions (cq rode
    // in with each batch — no re-encode): ≡ the in-session int8 form
    // under the stored model
    val i8 = AnnIngestApp.serveInt8(spark, annDir).collect().toSeq
    val i8Direct = SimilarityOps.knnInt8With(em, model).collect().toSeq
    assert(i8 == i8Direct)

    // read-time takedown: landed partitions immutable, serve excludes
    AnnIngestApp.takedown(spark, annDir, Seq(1L, 2L).toDF("vec_id"))
    AnnIngestApp.takedown(spark, annDir, Seq(1L).toDF("vec_id")) // replay
    val after = AnnIngestApp.serve(spark, annDir).collect().toSeq
    val ref = SimilarityOps.knnIvfTrained(
      SimilarityOps.assignUnderModel(
        em.filter(!col("vec_id").isin(1L, 2L)), model), model)
      .collect().toSeq
    assert(after == ref)
    val i8After = AnnIngestApp.serveInt8(spark, annDir).collect().toSeq
    assert(i8After == SimilarityOps.knnInt8With(
      em.filter(!col("vec_id").isin(1L, 2L)), model).collect().toSeq,
      "int8 tier must serve through the takedown log too")

    // the shared binding guard holds for this app too
    val foreign = Files.createTempDirectory("annin_foreign").toString
    val err = intercept[IllegalArgumentException] {
      AnnIngestApp.run(spark, shardDir, annDir, foreign)
    }
    assert(err.getMessage.contains("bound to checkpoint"), err.getMessage)
  }

  test("streamed GRAPH index: exactly-once under mid-batch crash+replay " +
      "(faulted final state ≡ a clean run's, edge for edge), appended " +
      "vectors wired both ways and served, shared read-time takedown, " +
      "foreign checkpoint refused") {
    import graft.llm.{EmbeddingFixtures, GraphAnnOps}
    val em = EmbeddingFixtures.clustered(spark, 500L).localCheckpoint()
    val base = em.filter(col("vec_id") % 5 =!= 0)
    val stream = em.filter(col("vec_id") % 5 === 0)
    val rows = stream.select(col("vec_id"), col("embedding"))
      .orderBy("vec_id").collect().map(vecJson)
    val shardDir = Files.createTempDirectory("gann_shard").toString
    ShardSimFixture.writeShard(shardDir, 0, rows.take(60))
    ShardSimFixture.writeShard(shardDir, 1, rows.drop(60))
    val annDir = Files.createTempDirectory("gann_idx").toString
    val ckpt = Files.createTempDirectory("gann_ckpt").toString
    AnnIngestApp.bootstrapGraph(spark, annDir, base)

    val marker = Files.createTempDirectory("gann_marker")
      .resolve("fired").toString
    def start(dir: String, cp: String,
        extra: Map[String, String] = Map.empty) =
      AnnIngestApp.runGraph(spark, shardDir, dir, cp,
        maxRecordsPerBatch = Some(40L), extraOptions = extra)
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      start(annDir, ckpt, Map("faultInjectMarker" -> marker,
        "faultInjectAfter" -> "15")).awaitTermination()
    }
    start(annDir, ckpt).awaitTermination()

    // exactly-once: one landed row per streamed vector, no duplicates
    val landedV = spark.read.parquet(s"$annDir/gbatch/batch_id=*")
    assert(landedV.count() == 100L)
    assert(landedV.select("vec_id").distinct().count() == 100L)

    // crash/replay convergence: a clean twin run (same bootstrap, same
    // batch size, no fault) lands the IDENTICAL graph — vector for
    // vector, edge for edge at full precision
    val annDir2 = Files.createTempDirectory("gann_idx2").toString
    val ckpt2 = Files.createTempDirectory("gann_ckpt2").toString
    AnnIngestApp.bootstrapGraph(spark, annDir2, base)
    start(annDir2, ckpt2).awaitTermination()
    def edgeSet(dir: String) =
      spark.read.parquet(s"$dir/gedges/batch_id=*")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
    assert(edgeSet(annDir) == edgeSet(annDir2),
      "faulted+replayed run must converge to the clean run's graph")

    // appended vectors are wired BOTH directions and find cluster-mates
    val streamedIds = stream.select("vec_id").as[Long].collect().toSet
    val e = spark.read.parquet(s"$annDir/gedges/batch_id=*")
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(streamedIds.forall(b => e.exists(_._1 == b)),
      "streamed ids must have outgoing edges")
    assert(streamedIds.forall(b => e.exists(_._2 == b)),
      "streamed ids must be reachable (incoming edges)")
    val served = AnnIngestApp.serveGraph(spark, annDir,
      queryIds = Seq(10L)).collect() // 10 ≡ 0 (mod 5): streamed-in
    assert(served.nonEmpty && served.head.getDouble(3) > 0.9,
      s"streamed vector should find near cluster-mates: ${served.toSeq}")

    // read-time takedown is SHARED with the IVF arm's log: vectors
    // vanish from results, their edges die at either endpoint
    AnnIngestApp.takedown(spark, annDir,
      Seq(served.head.getLong(2)).toDF("vec_id"))
    val gone = served.head.getLong(2)
    val after = AnnIngestApp.serveGraph(spark, annDir,
      queryIds = Seq(10L)).collect()
    after.foreach(r => assert(r.getLong(2) != gone))

    // the binding guard holds for the graph arm too
    val foreign = Files.createTempDirectory("gann_foreign").toString
    val err = intercept[IllegalArgumentException] {
      AnnIngestApp.runGraph(spark, shardDir, annDir, foreign)
    }
    assert(err.getMessage.contains("bound to checkpoint"), err.getMessage)
  }
}
