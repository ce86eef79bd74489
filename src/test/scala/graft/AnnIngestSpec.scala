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
}
