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
    assert(rows("deduped") >= rows("span_cleaned"))
    assert(rows("span_cleaned") >= rows("decontaminated"))
    assert(rows("decontaminated") >= rows("mixture_selected"))
    assert(rows("mixture_selected") > 0)
    // normalize is row-preserving
    assert(rows("raw") == rows("normalized"))
    // the stand-in eval split contaminates SOME training docs at this
    // fixture (near-copies straddle the id cut), so the stage is
    // exercised, not vacuous
    assert(rows("span_cleaned") > rows("decontaminated"))
    // the fail-loud gate verdict landed, all green
    val gate = spark.read.parquet(s"$out1/gate").collect()
      .map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(gate.nonEmpty && gate.values.forall(_ == 1), gate.toString)

    // fate audit: disjoint fates sum to the input corpus
    val fates = spark.read.parquet(s"$out1/row_fates").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fates.values.sum == rows("raw"), fates.toString)
    assert(fates("kept") == rows("mixture_selected"), fates.toString)
    assert(!fates.contains("dropped_normalized"), fates.toString)

    // the packing audit landed and covers the selected corpus's sources
    val packing = spark.read.parquet(s"$out1/packing")
    assert(packing.count() > 0)

    // the curriculum schedule landed, covers EXACTLY the selected
    // corpus, and its manifest row reproduces (it is in m1 == m2 above)
    val cur = spark.read.parquet(s"$out1/curriculum").collect()
    assert(cur.nonEmpty)
    assert(cur.map(_.getLong(1)).sum == rows("mixture_selected"),
      "curriculum stages must partition the selected corpus")
    assert(m1.exists(_._1 == "curriculum"))
  }

  test("a planted eval near-copy is dropped at the decontamination " +
    "stage and lands in its own fate bucket") {
    val out = java.nio.file.Files.createTempDirectory("pipe3").toString
    val pre = java.nio.file.Files.createTempDirectory("pipe3pre").toString
    val docs = graft.core.Tables.documents(spark, sf0001)
    // eval set = the text of a doc that reaches the decontamination
    // stage (one that the quality gate or dedup keeper dropped would
    // make the plant vacuous), taken from a reference run
    PipelineApp.run(spark, sf0001, pre)
    // taken from span_cleaned (the frame decontamination actually
    // sees) so the plant's shingles match the post-excision text
    val evalText = spark.read.parquet(s"$pre/corpus/span_cleaned")
      .orderBy("doc_id").limit(1).collect()(0).getAs[String]("text")
    val eval = docs.sparkSession.createDataFrame(Seq(
      (900001L, evalText))).toDF("doc_id", "text")
    PipelineApp.run(spark, sf0001, out, evalDocs = Some(eval))
    val fates = spark.read.parquet(s"$out/row_fates").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fates.getOrElse("dropped_decontaminated", 0L) >= 1L,
      fates.toString)
    // the contaminated doc is really gone from the selected corpus
    val decon = spark.read.parquet(s"$out/corpus/decontaminated")
    assert(decon.filter(col("text") === evalText).count() == 0)
    assert(fates.values.sum == docs.count(), fates.toString)
  }

  test("resume reuses landed boundaries, recomputes only missing ones, " +
    "and converges to the reference fingerprints") {
    val out = java.nio.file.Files.createTempDirectory("pipe5").toString
    def fps(m: org.apache.spark.sql.DataFrame): Map[String, Long] =
      m.collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val ref = fps(PipelineApp.run(spark, sf0001, out))
    def mtime(stage: String): Long =
      new java.io.File(s"$out/corpus/$stage").listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.lastModified).max

    // full resume: every boundary reused — no stage parquet rewritten,
    // manifests reproduce the reference fingerprints byte-for-byte
    val before = Seq("normalized", "deduped", "mixture_selected")
      .map(s => s -> mtime(s)).toMap
    val resumed = fps(PipelineApp.run(spark, sf0001, out, resume = true))
    assert(resumed == ref, s"$resumed vs $ref")
    before.foreach { case (s, t) =>
      assert(mtime(s) == t, s"stage $s was rewritten on full resume")
    }

    // partial resume: delete one mid-pipeline boundary — exactly the
    // missing stage recomputes (deterministically, to the SAME
    // fingerprint) while earlier boundaries stay untouched
    val tEarly = mtime("quality_gated")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$out/corpus/decontaminated"))
    val repaired = fps(PipelineApp.run(spark, sf0001, out, resume = true))
    assert(repaired == ref, s"$repaired vs $ref")
    assert(mtime("quality_gated") == tEarly,
      "an upstream boundary was recomputed on partial resume")

    // a boundary without _SUCCESS (interrupted write) is NOT trusted:
    // resume recomputes it even though parquet files are present
    val tBefore = mtime("deduped")
    assert(new java.io.File(s"$out/corpus/deduped/_SUCCESS").delete())
    val healed = fps(PipelineApp.run(spark, sf0001, out, resume = true))
    assert(healed == ref, s"$healed vs $ref")
    assert(mtime("deduped") > tBefore,
      "a _SUCCESS-less boundary must recompute on resume")
  }

  test("a broken corpus invariant aborts the run at the gate — no " +
    "downstream stage lands") {
    val out = java.nio.file.Files.createTempDirectory("pipe4").toString
    val sick = java.nio.file.Files.createTempDirectory("sick").toString
    // duplicate every doc_id: the unique_doc_id constraint must trip
    val docs = graft.core.Tables.documents(spark, sf0001)
    docs.unionByName(docs).write.mode("overwrite")
      .parquet(s"$sick/documents.parquet")
    val e = intercept[IllegalArgumentException] {
      PipelineApp.run(spark, sick, out)
    }
    assert(e.getMessage.contains("unique_doc_id"), e.getMessage)
    // fail-loud means fail EARLY: the dedup stage (which would have
    // absorbed the duplicates silently) never ran
    assert(!new java.io.File(s"$out/corpus/deduped").exists())
  }
}
