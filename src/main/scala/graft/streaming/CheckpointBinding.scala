package graft.streaming

import org.apache.spark.sql.SparkSession

/** The corpus ↔ checkpoint binding guard shared by every ingest app
  * that lands `batch_id=N` idempotent-overwrite partitions (the
  * IngestDedupApp contract, extracted verbatim for AnnIngestApp):
  * batch dirs are keyed by the stream's WAL batch id, so a FOREIGN
  * checkpoint restarts ids at 0 and silently overwrites landed state.
  * A one-line marker binds the data dir to its checkpoint at first
  * run; later runs must present the same path, compared
  * FILESYSTEM-QUALIFIED with null≡empty authority (relative dirs
  * resolve, /x vs file:/x unify); a MISSING marker over a dir that
  * already has landed state refuses unless `rebind=true`. Pinned in
  * ShardSimSourceSpec + Round18OpsSpec. */
object CheckpointBinding {
  def bind(spark: SparkSession, dataDir: String, checkpointDir: String,
      rebind: Boolean, hasLandedState: => Boolean): Unit = {
    val marker = new org.apache.hadoop.fs.Path(dataDir, "_checkpoint_binding")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def qualified(p: String): String = {
      val path = new org.apache.hadoop.fs.Path(p)
      val uri = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .makeQualified(path).toUri
      s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}${uri.getPath}"
    }
    val canonical = qualified(checkpointDir)
    if (fs.exists(marker)) {
      val bound = {
        val in = fs.open(marker)
        try new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
        finally in.close()
      }
      require(qualified(bound) == canonical,
        s"data dir $dataDir is bound to checkpoint $bound; refusing to " +
          s"stream into it from $canonical — a fresh checkpoint restarts " +
          "batch ids at 0 and would overwrite landed batches. Resume the " +
          "original checkpoint, or target a new directory.")
    } else {
      require(rebind || !hasLandedState,
        s"data dir $dataDir has landed batch dirs but no checkpoint " +
          "binding marker (created before the guard, or marker lost); " +
          s"refusing to adopt $canonical — if it is NOT the stream's " +
          "original checkpoint, batch ids restart at 0 and overwrite " +
          "landed batches. Pass rebind=true to bind this checkpoint " +
          "explicitly.")
      val out = fs.create(marker, true)
      try out.write(canonical.getBytes("UTF-8")) finally out.close()
    }
  }
}
