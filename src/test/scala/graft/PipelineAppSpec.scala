package graft

import org.apache.spark.sql.functions._

import graft.app.PipelineApp

/** Integration proof for the end-to-end training-data pipeline: the
  * stage chain runs, every stage-boundary fingerprint reproduces across
  * an independent re-run (the corpus-versioning property the q41
  * manifest exists for), and the row-fate audit accounts for every
  * input document exactly once. */
class PipelineAppSpec extends SparkSpec {

  test("stage-boundary fingerprints reproduce across a full re-run and " +
    "row fates account for every input doc") {
    val out1 = java.nio.file.Files.createTempDirectory("pipe1").toString
    val out2 = java.nio.file.Files.createTempDirectory("pipe2").toString
    def summary(dir: String): Seq[(String, Long, Long)] = {
      PipelineApp.run(spark, sf0001, dir)
      spark.read.parquet(s"$dir/manifests")
        .orderBy("stage")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .toSeq
    }
    val m1 = summary(out1)
    val m2 = summary(out2)
    assert(m1 == m2,
      s"stage manifests must be bit-reproducible:\n$m1\nvs\n$m2")
    // the chain monotonically narrows: raw >= quality >= dedup >= mixture
    val rows = m1.map(t => t._1 -> t._2).toMap
    assert(rows("raw") >= rows("quality_gated"))
    assert(rows("quality_gated") >= rows("deduped"))
    assert(rows("deduped") >= rows("mixture_selected"))
    assert(rows("mixture_selected") > 0)
    // normalize is row-preserving
    assert(rows("raw") == rows("normalized"))

    // fate audit: disjoint fates sum to the input corpus
    val fates = spark.read.parquet(s"$out1/row_fates").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fates.values.sum == rows("raw"), fates.toString)
    assert(fates("kept") == rows("mixture_selected"), fates.toString)
    assert(!fates.contains("dropped_normalized"), fates.toString)

    // the packing audit landed and covers the selected corpus's sources
    val packing = spark.read.parquet(s"$out1/packing")
    assert(packing.count() > 0)
  }
}
