package graft.app

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.llm.SimilarityOps

/** Exactly-once STREAMING ingest for the ANN index family — the q160
  * posture applied to embeddings. [[SimilarityOps.appendToTrainedIvfIndex]]
  * (and its PQ/int8 siblings) are flat bucketed APPENDS: correct for a
  * batch pipeline that runs each append once, and exactly wrong under a
  * streaming WAL, where a replayed foreachBatch would append the same
  * batch twice. This app lands each micro-batch as its own
  * `annDir/batch_id=N` partition — vectors assigned under the STORED
  * model inside the batch — so a WAL replay OVERWRITES the same
  * directory idempotently (the IngestDedupApp corpus contract, same
  * checkpoint-binding guard, same read-time takedown log). Serving
  * unions the landed partitions through the tombstones and probes with
  * the standard trained-IVF machinery; the model is immutable state —
  * re-clustering is a rebuild, exactly the writeTrainedIvfIndex
  * contract.
  *
  * 100 TB shape: each batch partition is cid-tagged at write, so a
  * compaction job can fold cold partitions into the bucketed serve
  * layout (`writeParquetBucketed`) whenever partition count grows past
  * the planner's comfort — the LSM story: streams land row-grouped by
  * arrival, maintenance re-sorts by access path. */
object AnnIngestApp {

  /** Payload schema of a vector record's `data` JSON. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  def vecStream(spark: SparkSession, shardDir: String,
      maxRecordsPerBatch: Option[Long] = None,
      extraOptions: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.readStream
      .format("graft.sources.shardsim.ShardSimProvider")
      .option("numPartitions", 4)
      .options(extraOptions)
    maxRecordsPerBatch.foreach(n => reader.option("maxRecordsPerBatch", n))
    reader.load(shardDir)
      .withColumn("payload", from_json(col("data"), vecSchema))
      .select(col("payload.vec_id").as("vec_id"),
        col("payload.embedding").as("embedding"))
  }

  private def batchDirs(spark: SparkSession, dir: String): Seq[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.toString).sorted
  }

  /** Train and persist the index model BEFORE streaming (parquet under
    * `annDir/model` — the stream assigns against it; it never
    * retrains). Sampled trainer by default: the ingest posture is
    * exactly the 100 TB regime the cap exists for. */
  def trainModel(spark: SparkSession, annDir: String, em: DataFrame,
      cap: Int = 100000): Unit =
    SimilarityOps.kmeansCentroidsSampled(em, cap)
      .write.mode("overwrite").parquet(s"$annDir/model")

  def model(spark: SparkSession, annDir: String): DataFrame =
    spark.read.parquet(s"$annDir/model")

  /** Start the ingest stream: per micro-batch, assign under the stored
    * model and land `annDir/batch_id=N` idempotently. */
  def run(spark: SparkSession, shardDir: String, annDir: String,
      checkpointDir: String, maxRecordsPerBatch: Option[Long] = None,
      extraOptions: Map[String, String] = Map.empty,
      rebind: Boolean = false): StreamingQuery = {
    graft.streaming.CheckpointBinding.bind(spark, annDir, checkpointDir,
      rebind, batchDirs(spark, annDir).nonEmpty)
    val m = model(spark, annDir).localCheckpoint()
    vecStream(spark, shardDir, maxRecordsPerBatch, extraOptions)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // cq rides the same partition: int8 encode is a pure projection
        // (SimilarityOps.int8Encode), so quantized serving gets the
        // exactly-once discipline for free instead of a second landing
        SimilarityOps.int8Encode(SimilarityOps.assignUnderModel(batch, m))
          .select(col("vec_id"), col("embedding"), col("cid"), col("cq"))
          .write.mode("overwrite").parquet(s"$annDir/batch_id=$batchId")
      }
      .start()
  }

  /** Read-time takedown: append ids to `annDir/takedown` — landed
    * batch partitions are immutable WAL state, removal applies at
    * serve (the IngestDedupApp / TakedownOps tombstone posture;
    * replayed appends distinct-fold at read). */
  def takedown(spark: SparkSession, annDir: String, ids: DataFrame): Unit =
    ids.select(col("vec_id")).write.mode("append")
      .parquet(s"$annDir/takedown")

  /** The live index: union of landed batch partitions minus the
    * takedown log. Rows carry (vec_id, embedding, cid, cq) — full
    * precision and the int8 sidecar land together. */
  def index(spark: SparkSession, annDir: String): DataFrame = {
    val dirs = batchDirs(spark, annDir)
    val base =
      if (dirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(vecSchema.fields ++ Seq(StructField("cid", LongType),
            StructField("cq", ArrayType(
              org.apache.spark.sql.types.ByteType)))))
      else spark.read.parquet(dirs: _*)
    val tomb = new org.apache.hadoop.fs.Path(s"$annDir/takedown")
    if (tomb.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(tomb))
      base.join(
        broadcast(spark.read.parquet(s"$annDir/takedown").distinct()),
        Seq("vec_id"), "left_anti")
    else base
  }

  /** Serve kNN from the landed index with the standard trained-IVF
    * probe machinery. */
  def serve(spark: SparkSession, annDir: String,
      queryIds: Seq[Long] = SimilarityOps.QueryIds): DataFrame = {
    val idx = index(spark, annDir)
    SimilarityOps.requireLiveQueries(idx, queryIds, annDir)
    SimilarityOps.knnIvfTrained(idx, model(spark, annDir), queryIds)
  }

  /** int8-tier serving from the SAME landed partitions: candidates
    * score from the cq sidecar column that streamed in with them —
    * the quantized tier inherits exactly-once and takedown for free
    * (no re-encode, no second landing). */
  def serveInt8(spark: SparkSession, annDir: String,
      queryIds: Seq[Long] = SimilarityOps.QueryIds): DataFrame = {
    val idx = index(spark, annDir)
    SimilarityOps.requireLiveQueries(idx, queryIds, annDir)
    val q = idx.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    SimilarityOps.knnInt8From(
      idx.select(col("vec_id"), col("cid"), col("cq")), q,
      model(spark, annDir))
  }
}
