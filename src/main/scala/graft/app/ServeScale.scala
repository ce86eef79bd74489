package graft.app

import org.apache.spark.sql.functions._

/** q160 cost probe: the served admit (persisted shingle postings)
  * against the direct incrementalNearDup (re-shingles the corpus per
  * batch) at growing corpus scale, fixed batch. Three numbers per
  * factor: one-time index build, direct admit, served admit — the
  * claim under test is that serve removes the per-batch corpus
  * re-tokenize (KeeperScale's residual slope) and pays only a
  * columnar postings scan. Usage:
  * runMain graft.app.ServeScale [sfDir] [factors] [batchSize] */
object ServeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,5,20")
      .split(",").map(_.trim.toInt).toSeq
    val batchSize = args.lift(2).map(_.toInt).getOrElse(500)
    val spark = graft.core.Sessions.get("32")
    import spark.implicits._
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val batchSrc = src.orderBy("doc_id").limit(batchSize)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    factors.foreach { f =>
      val dir = java.nio.file.Files
        .createTempDirectory(s"serve-scale-$f").toString
      try {
        val reps = spark.range(f).select(col("id").as("rep"))
        src.crossJoin(reps)
          .withColumn("doc_id", col("doc_id") * f + col("rep"))
          .drop("rep").repartition(32)
          .write.mode("overwrite").parquet(s"$dir/corpus.parquet")
        val corpus = spark.read.parquet(s"$dir/corpus.parquet")
        val base = src.agg(max(col("doc_id"))).first().getLong(0) * f + f
        val batch = batchSrc.map { case (id, t) => (base + id, t) }.toSeq
          .toDF("doc_id", "text")
        def time(what: => Long): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = what
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val (tIdx, _) = time {
          graft.llm.DedupOps.writeDedupIndex(corpus, "graft_serve_scale")
          0L
        }
        val (tDirect, nD) = time(
          graft.llm.DedupOps.incrementalNearDup(corpus, batch).count())
        val (tServe, nS) = time(graft.llm.DedupOps
          .incrementalNearDupServe(spark, "graft_serve_scale", batch)
          .count())
        require(nD == nS, s"served $nS pairs != direct $nD")
        println(f"[serve-scale] factor=$f corpus=${src.count() * f} " +
          f"batch=$batchSize index_build=$tIdx%.2f s " +
          f"direct=$tDirect%.2f s served=$tServe%.2f s pairs=$nD")
      } finally {
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
      }
    }
    spark.stop()
  }
}
