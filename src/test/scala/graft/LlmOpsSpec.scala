package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.llm.{DedupOps, SimilarityOps}

/** LLM-pipeline operators that the DuckDB oracle cannot fully check:
  * near-dup detection on injected duplicates, SimHash behavior, LSH
  * recall vs the brute-force baseline, cosine expression correctness. */
class LlmOpsSpec extends SparkSpec {

  test("cosine_sim expression matches a reference implementation") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val got = Seq((a, b)).toDF("x", "y")
      .select(expr("cosine_sim(x, y)")).collect()(0).getDouble(0)
    def dot(u: Array[Float], v: Array[Float]) =
      u.zip(v).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val expected = dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b)))
    assert(math.abs(got - expected) < 1e-12)
    // self-similarity is exactly 1 up to float fold error
    val self = Seq((a, a)).toDF("x", "y")
      .select(expr("cosine_sim(x, y)")).collect()(0).getDouble(0)
    assert(math.abs(self - 1.0) < 1e-12)
  }

  /** documents-shaped frame with injected near-duplicates — handed to the
    * library ops directly (the `DataFrame => DataFrame` contract: no
    * fixture tables involved). */
  private def docsWithDups = {
    import spark.implicits._
    // ~100 distinct tokens: one replaced token changes 5 of ~96 shingles,
    // keeping Jaccard ≈ 0.90 (above the 0.8 near-dup threshold)
    val base = (1 to 90).map(i => s"tok$i").mkString(" ") +
      " the quick brown fox hunts tasty rabbits at night"
    Seq(
      (1L, base),
      (2L, base),                                       // exact dup of 1
      (3L, base.replace("tasty", "fresh")),             // near dup of 1
      (4L, "completely different text about spark and distributed query engines " +
        "processing petabytes of training data with catalyst and tungsten runtime"),
      (5L, "short odd one out")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
  }

  test("ngram Jaccard on a hand-built DataFrame finds exact and near dups") {
    val pairs = DedupOps.ngramJaccard(docsWithDups)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), pairs.toString)
  }

  test("MinHash-LSH finds injected exact and near duplicates") {
    val pairs = DedupOps.minhashLsh(docsWithDups)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"exact dup pair missing from $pairs")
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)),
      s"near dup pairs missing from $pairs")
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("MinHash-LSH agrees with exact n-gram Jaccard on the corpus") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val exact = DedupOps.ngramJaccard(docs).collect().toSeq
    val lsh = DedupOps.minhashLsh(docs).collect().toSeq
    assert(lsh == exact)
  }

  test("SimHash flags exact duplicates at hamming distance 0") {
    val rows = DedupOps.simhash(docsWithDups)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(rows.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 0),
      s"exact dup must have hamming 0: $rows")
  }

  test("simhashAudit: every exact-duplicate pair is covered structurally") {
    val row = DedupOps.simhashAudit(docsWithDups).collect().head
    // one md5-identical pair (1,2); identical fingerprints share every
    // band and pass at hamming 0, so coverage must be total
    assert(row.getLong(0) == 1L, s"n_exact_pairs=${row.getLong(0)}")
    assert(row.getLong(1) == 1L, s"exact_covered=${row.getLong(1)}")
  }

  test("dedup keeper assigns one canonical min-id per near-dup component") {
    val keepers = DedupOps.dedupKeeper(docsWithDups)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1,2,3 form one near-dup component; 4 and 5 are not in any pair
    assert(keepers == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), keepers.toString)
  }

  test("incremental near-dup pairs a new batch against the corpus, never corpus-with-itself") {
    import spark.implicits._
    val base = (1 to 90).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, base),                              // will be duplicated by new doc 10
      (2L, base),                              // corpus-internal dup of 1 — NOT re-paired
      (3L, (1 to 90).map(i => s"other$i").mkString(" "))
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, base),                             // dup of corpus docs 1 and 2
      (11L, base.replace("tok5 ", "tok5x ")),  // near dup of 1, 2, 10 (one token)
      (12L, "entirely novel content " + (1 to 60).map(i => s"nv$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = DedupOps.incrementalNearDup(corpus, fresh)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every pair touches the new batch; the corpus-internal (1,2) pair is absent
    assert(!pairs.contains((1L, 2L)), pairs.toString)
    assert(pairs == Set((1L, 10L), (2L, 10L), (1L, 11L), (2L, 11L), (10L, 11L)),
      pairs.toString)
  }

  test("contamination flags training docs overlapping the eval set") {
    import spark.implicits._
    val evalText = (1 to 60).map(i => s"ev$i").mkString(" ")
    val train = Seq(
      (1L, evalText),                                          // full copy of eval
      (2L, (1 to 30).map(i => s"ev$i").mkString(" ") + " " +   // half eval, half own
        (1 to 30).map(i => s"own$i").mkString(" ")),
      (3L, (1 to 60).map(i => s"clean$i").mkString(" "))       // no overlap
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")
    val got = DedupOps.contamination(train, evalSet)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(got(1L) == 1.0, got.toString)                       // fully contaminated
    assert(got(2L) > 0.3 && got(2L) < 0.6, got.toString)       // partially
    assert(!got.contains(3L), got.toString)                    // clean doc absent
  }

  test("decontaminatedCorpus keeps exactly the non-contaminated training ids") {
    import spark.implicits._
    val evalText = (1 to 60).map(i => s"ev$i").mkString(" ")
    val train = Seq(
      (1L, evalText),                                          // dropped: full copy
      (2L, (1 to 30).map(i => s"ev$i").mkString(" ") + " " +   // dropped: half eval
        (1 to 30).map(i => s"own$i").mkString(" ")),
      (3L, (1 to 60).map(i => s"clean$i").mkString(" "))       // kept
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, evalText)).toDF("doc_id", "text")
    val kept = DedupOps.decontaminatedCorpus(train, evalSet)
      .collect().map(_.getLong(0)).toSeq
    assert(kept == Seq(3L), kept.toString)
  }

  test("evalLeakReport attributes leaking training docs to the eval doc " +
    "they leak, with the training-side containment fraction") {
    import spark.implicits._
    val evA = (1 to 60).map(i => s"a$i").mkString(" ")
    val evB = (1 to 60).map(i => s"b$i").mkString(" ")
    val train = Seq(
      (1L, evA),                                                // leaks A at 1.0
      (2L, (1 to 30).map(i => s"a$i").mkString(" ") + " " +     // leaks A partially
        (1 to 30).map(i => s"own$i").mkString(" ")),
      (3L, (1 to 60).map(i => s"clean$i").mkString(" "))        // leaks nothing
    ).toDF("doc_id", "text")
    val evalSet = Seq((100L, evA), (101L, evB)).toDF("doc_id", "text")
    val got = DedupOps.evalLeakReport(train, evalSet)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // eval doc A is leaked by docs 1 and 2 (max frac 1.0); B by nobody
    assert(got.keySet == Set(100L), got.toString)
    assert(got(100L)._1 == 2L && got(100L)._2 == 1.0, got.toString)
  }

  test("df-cap excludes boilerplate from both sides: identical docs still score jac = 1") {
    import spark.implicits._
    // every doc shares the same boilerplate preamble (its shingles exceed
    // the cap); docs 1 and 2 are byte-identical, doc 3 is unrelated content
    val boiler = (1 to 30).map(i => s"boiler$i").mkString(" ")
    val contentA = (1 to 40).map(i => s"alpha$i").mkString(" ")
    val docs = (Seq(
      (1L, s"$boiler $contentA"),
      (2L, s"$boiler $contentA")) ++
      (3L to 12L).map(i => i -> s"$boiler ${(1 to 40).map(j => s"t${i}x$j").mkString(" ")}"))
      .toDF("doc_id", "text")
    // cap = 5 < 12 docs sharing the boilerplate shingles → the cap binds
    val pairs = DedupOps.jaccardPairs(docs, dfCap = 5)
      .collect().map(r => ((r.getAs[Long]("d1"), r.getAs[Long]("d2")),
        r.getAs[Double]("jac"))).toMap
    // identical docs: all non-boilerplate shingles shared → exactly 1.0
    assert(pairs.get((1L, 2L)).contains(1.0), pairs.toString)
    // boilerplate-only overlap generates no candidate pair at all
    assert(pairs.keySet == Set((1L, 2L)), pairs.toString)
  }

  test("connected components: deep chain converges with O(1) plan depth") {
    import spark.implicits._
    // path graph 0-1-2-...-11: min-label propagation needs 11 rounds (one
    // hop per round) — deep enough that un-checkpointed lineage would show
    val pairs = (0L until 11L).map(i => (i, i + 1)).toDF("d1", "d2")
    val pinnedBefore = spark.sparkContext.getPersistentRDDs.size
    val cc = DedupOps.connectedComponents(pairs, maxIters = 15)
    val got = cc.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (0L to 11L).map(_ -> 0L).toMap, got.toString)
    // iteration hygiene: the result plan is a sort over checkpointed blocks
    // (constant depth), not 11 rounds of stacked joins
    val planLines = cc.queryExecution.optimizedPlan.toString.linesIterator.size
    assert(planLines <= 10, s"keeper plan grew with iterations ($planLines lines)")
    // superseded label levels + edges were unpersisted: only the final
    // labels level may newly remain pinned
    val delta = spark.sparkContext.getPersistentRDDs.size - pinnedBefore
    assert(delta <= 1, s"$delta new RDDs still pinned after CC — level leak")
  }

  test("connected components: non-convergence fails loudly instead of truncating labels") {
    import spark.implicits._
    // path 0-1-...-6 needs ~6 rounds; maxIters=2 must throw, not return
    // a partially-propagated label table
    val pairs = (0L until 6L).map(i => (i, i + 1)).toDF("d1", "d2")
    val e = intercept[IllegalStateException] {
      DedupOps.connectedComponents(pairs, maxIters = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"), e.getMessage)
    // and the failed run must not leak pinned checkpoint blocks
    val after = spark.sparkContext.getPersistentRDDs.size
    DedupOps.connectedComponents(pairs, maxIters = 15).collect() // sanity: converges
    assert(spark.sparkContext.getPersistentRDDs.size - after <= 1)
  }

  test("simhash64 expression equals the explode-based DataFrame formulation") {
    GraftFunctions.register(spark)
    // independent formulation from built-ins only: tokenize, xxhash64 each
    // occurrence (same default seed 42 as the expression), ±1 majority vote
    // per bit, recompose the fingerprint
    val docs = graft.core.Tables.documents(spark, sf0001)
    val toks = docs.select(col("doc_id"),
      explode(filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "")).as("tok"))
      .select(col("doc_id"), xxhash64(col("tok")).as("h"))
    val bits = toks.select(col("doc_id"), posexplode(
      array((0 until 64).map(j =>
        when(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L)) =!= 0L, 1)
          .otherwise(-1)): _*)).as(Seq("bit", "vote")))
    val expected = bits.groupBy("doc_id", "bit").agg(sum("vote").as("v"))
      .withColumn("contrib",
        when(col("v") > 0, expr("shiftleft(CAST(1 AS BIGINT), bit)")).otherwise(0L))
      .groupBy("doc_id")
      .agg(sum(col("contrib")).cast("long").as("fp"))
    val got = docs.select(col("doc_id"), expr("simhash64(text)").as("fp"))
    val joined = got.as("g").join(expected.as("e"), "doc_id")
      .filter(col("g.fp") =!= col("e.fp"))
    assert(joined.count() == 0, "expression and explode formulation disagree")
  }

  private def neighbors(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getAs[Long]("qid"), r.getAs[Long]("neighbor"))).toSet

  // budget 0.65 + overshoot-by-one-bucket: the crossing bucket is probed
  private val ScanCap = 0.70

  test("LSH KNN: recall >= 0.8 AND scanned fraction <= budget at the defaults") {
    val em = graft.core.Tables.embeddings(spark, sf0001)
    val brute = neighbors(SimilarityOps.knnBrute(em))
    val lsh = neighbors(SimilarityOps.knnLsh(em))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"LSH recall $recall too low (found ${lsh.size})")
    // the cost side of the contract: the budget binds by construction
    val fracs = SimilarityOps.lshProbeStats(em)
      .collect().map(r => r.getAs[Double]("scan_frac"))
    assert(fracs.forall(_ <= ScanCap),
      s"scan fractions ${fracs.mkString(",")} exceed the $ScanCap cap")
    // the probe budget is the recall/cost dial: recall is monotone in the
    // probed superset, so radius 0 cannot beat the default
    val r0 = neighbors(SimilarityOps.knnLsh(em, maxHamming = 0))
    val recallR0 = (brute & r0).size.toDouble / brute.size
    assert(recallR0 <= recall, s"radius-0 recall $recallR0 > default $recall")
  }

  test("LSH KNN at 20x corpus: budget still bounds the scan, recall holds") {
    import spark.implicits._
    // 20x replication with per-replica jitter (the Stress recipe): replicas
    // land in nearby-but-not-identical positions — bucket occupancy grows
    // 20x while the query ids keep their original vectors (rep 0)
    val base = graft.core.Tables.embeddings(spark, sf0001)
    val em = base.crossJoin(spark.range(20).select(col("id").as("rep")))
      .withColumn("vec_id", col("vec_id") * 20 + col("rep"))
      .withColumn("embedding",
        transform(col("embedding"), x => x + col("rep").cast("float") * lit(1e-3f)))
      .drop("rep")
    val qids = SimilarityOps.QueryIds.map(_ * 20)
    val brute = neighbors(SimilarityOps.knnBrute(em, queryIds = qids))
    val lsh = neighbors(SimilarityOps.knnLsh(em, queryIds = qids))
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.8, s"20x LSH recall $recall too low")
    val stats = SimilarityOps.lshProbeStats(em, queryIds = qids).collect()
    val fracs = stats.map(r => r.getAs[Double]("scan_frac"))
    assert(fracs.forall(_ <= ScanCap),
      s"20x scan fractions ${fracs.mkString(",")} exceed the $ScanCap cap")
    // the scan is bounded in ROWS, not buckets: candidates grew ~20x but
    // stayed the same fraction of the corpus
    val corpusN = stats.head.getAs[Long]("corpus_n")
    assert(corpusN == 10000L, s"expected 20x corpus, got $corpusN")
  }
}
