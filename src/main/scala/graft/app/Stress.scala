package graft.app

import org.apache.spark.sql.functions._

/** Scale-stress smoke: replicates the sf0.1 corpus N× into /tmp (doc ids
  * re-keyed so replicas are near-dup groups, embeddings jittered per
  * replica) and times the heavy operators at that scale. The point is the
  * growth curve, not the absolute numbers: LSH dedup and IVF search should
  * grow near-linearly with corpus size because their pair/probe spaces are
  * bucket-bounded, while a naive O(n²) formulation would blow up 400× at
  * 20× data. Usage: runMain graft.app.Stress [sfDir] [factor] [q1,q2,…]
  * (the optional comma-separated list narrows the run — e.g. the 100×
  * capture times only the heavy dedup/sketch/chunk operators rather than
  * paying the full suite at that scale).
  */
object Stress {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(20)
    val only = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val spark = graft.core.Sessions.get("32")
    val dir = java.nio.file.Files.createTempDirectory("stress").toString

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val nDocs = docs.count()
    // replicate: each replica r re-keys doc_id; r>0 replicas are exact dups
    // of r=0 (a worst-ish case for dedup: every doc is in a dup group)
    val reps = spark.range(factor).select(col("id").as("rep"))
    docs.crossJoin(reps)
      .withColumn("doc_id", col("doc_id") * factor + col("rep"))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val em = spark.read.parquet(s"$sfDir/embeddings.parquet")
    em.crossJoin(reps)
      .withColumn("vec_id", col("vec_id") * factor + col("rep"))
      .withColumn("embedding",
        transform(col("embedding"), x => x + col("rep").cast("float") * lit(1e-3f)))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // events: replicas re-key BOTH event_id and user_id, so the user
    // population grows with the factor while per-user event density stays
    // fixed — the realistic scaling model for journey/windowed operators
    // (more users, not denser users; per-key state and per-user window
    // work stay constant, task count grows).
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.crossJoin(reps)
      .withColumn("event_id", col("event_id") * factor + col("rep"))
      .withColumn("user_id", col("user_id") * factor + col("rep"))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

    // orders: same scaling model as events — replicas re-key both the
    // order and the customer, growing the population at fixed density
    // (feeds the global-window and relational stress entries)
    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    ord.crossJoin(reps)
      .withColumn("o_orderkey", col("o_orderkey") * factor + col("rep"))
      .withColumn("o_custkey", col("o_custkey") * factor + col("rep"))
      .drop("rep")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")

    println(s"[stress] ${nDocs * factor} docs, ${em.count() * factor} vectors, " +
      s"${ev.count() * factor} events, ${ord.count() * factor} orders " +
      s"(${factor}x $sfDir)")
    Seq(
      "q23_dedup_exact", "q23_dedup_minhash_lsh", "q23_dedup_ngram_jaccard",
      "q23_dedup_keeper", "q23_dedup_incremental", "q23_contamination",
      "q25_fingerprint",
      "q25_quality_score", "q24_knn_brute", "q24_knn_ivf", "q24_knn_lsh",
      "q30_funnel", "q30_interval_join", "q31_heavy_hitters",
      "q32_upsert_merge", "q33_pii_redact",
      "q34_chunk", "q34_pack", "q34_mixture", "q35_global_rank")
      .filter(n => only.forall(_.contains(n)))
      .foreach { name =>
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(name)(spark, dir).count()
        println(f"[stress] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
      }
    spark.stop()
  }
}
