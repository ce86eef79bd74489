package graft

import org.apache.spark.sql.functions._

import graft.llm.{DedupOps, SimilarityOps, TextOps}
import graft.operators.ProfileOps

/** Semantic invariants of the second round-9 operator batch, beyond the
  * DuckDB oracles: containment vs Jaccard on embedded documents, JS
  * divergence bounds, Welch decision behavior, bigram-LM quality ordering,
  * cluster-stat identities against the keeper output, and k-means
  * assignment laws. */
class Round9bOpsSpec extends SparkSpec {
  import spark.implicits._

  test("containment flags a doc embedded in a longer one that Jaccard misses") {
    val short = (1 to 30).map(i => s"tok$i").mkString(" ")
    val long = short + " " + (1 to 90).map(i => s"pad$i").mkString(" ")
    val other = (1 to 90).map(i => s"other$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short), (3L, other))
      .toDF("doc_id", "text")

    val cont = DedupOps.containmentPairs(docs).collect()
    assert(cont.length == 1, cont.mkString("; "))
    assert(cont.head.getLong(0) == 1L && cont.head.getLong(1) == 2L)
    // every shingle of the short doc appears in the long one
    assert(cont.head.getDouble(2) >= 0.999)
    // resemblance dedup ships this duplicate: Jaccard is diluted by the
    // long doc's extra shingles
    assert(DedupOps.ngramJaccard(docs).isEmpty)
  }

  test("jsDrift: ~0 on identical snapshots, near ln 2 when disjoint, bounded") {
    val df = (1 to 1000).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    val same = ProfileOps.jsDrift(df, "v", lit(true), lit(true), 0.0, 100.0, 10)
    assert(same.count() == 10)
    val sumSame = same.agg(sum(col("js_term"))).first().getDouble(0)
    assert(math.abs(sumSame) < 1e-6, s"identical snapshots scored $sumSame")

    val dis = ProfileOps.jsDrift(df, "v", col("v") < 50, col("v") >= 50,
      0.0, 100.0, 10)
    val sumDis = dis.agg(sum(col("js_term"))).first().getDouble(0)
    assert(sumDis > 0.6, s"disjoint snapshots scored only $sumDis")
    assert(sumDis <= math.log(2.0) + 1e-9, s"JSD above its ln 2 bound: $sumDis")
  }

  test("welch t-test: zero on identical groups, fires on a shifted mean") {
    val vals = (1 to 1000).map(i => (i % 10).toDouble)
    val same = (vals.map(("a", _)) ++ vals.map(("b", _))).toDF("g", "v")
    val r0 = ProfileOps.welchTTest(same, "v",
      col("g") === "a", col("g") === "b").first()
    assert(r0.getAs[Long]("n_a") == 1000 && r0.getAs[Long]("n_b") == 1000)
    assert(r0.getAs[Double]("t_stat") == 0.0)
    assert(r0.getAs[Int]("significant") == 0)

    val shifted = (vals.map(("a", _)) ++ vals.map(v => ("b", v + 10.0)))
      .toDF("g", "v")
    val r1 = ProfileOps.welchTTest(shifted, "v",
      col("g") === "a", col("g") === "b").first()
    assert(r1.getAs[Double]("mean_b") - r1.getAs[Double]("mean_a") == 10.0)
    assert(r1.getAs[Double]("t_stat") < -10.0)
    assert(r1.getAs[Double]("df_w") > 100.0)
    assert(r1.getAs[Int]("significant") == 1)
  }

  test("bigram LM: fluent repetition scores below unique-token garble") {
    val fluent = (1 to 20).map(d =>
      (d.toLong, Seq.fill(5)("the cat sat on the mat").mkString(" "), "fluent"))
    val garble = (21 to 25).map(d =>
      (d.toLong, (1 to 30).map(i => s"g${d}x$i").mkString(" "), "garble"))
    // a 1-token doc has no bigrams: its source must not be scored at all
    val tiny = Seq((99L, "solo", "tiny"))
    val docs = (fluent ++ garble ++ tiny).toDF("doc_id", "text", "source")

    val got = TextOps.bigramLmScore(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got.keySet == Set("fluent", "garble"), got.keySet.toString)
    assert(got("fluent").getAs[Long]("n_docs") == 20)
    assert(got("garble").getAs[Long]("n_docs") == 5)
    assert(got("fluent").getAs[Double]("avg_nll")
      < got("garble").getAs[Double]("avg_nll"),
      s"fluent ${got("fluent")} should score below garble ${got("garble")}")
  }

  test("dedup cluster stats: identities against the keeper output") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val stats = DedupOps.dedupClusterStats(docs).first()
    val cc = DedupOps.dedupKeeper(docs).collect()

    assert(stats.getAs[Long]("n_docs") == docs.count())
    assert(stats.getAs[Long]("n_clustered") == cc.length)
    assert(stats.getAs[Long]("n_clusters") ==
      cc.map(_.getLong(1)).distinct.length)
    assert(stats.getAs[Long]("n_removed") ==
      cc.count(r => r.getLong(0) != r.getLong(1)))
    // every component keeps exactly one doc
    assert(stats.getAs[Long]("n_clustered") ==
      stats.getAs[Long]("n_clusters") + stats.getAs[Long]("n_removed"))
    // components have ≥ 2 members by construction (they come from pairs)
    assert(stats.getAs[Long]("max_cluster") >= 2)
    assert(stats.getAs[Long]("chars_removed") > 0)
  }

  test("cohort retention: hand-computed matrix on a 3-user fixture") {
    // 2024-01-01 is a Monday, so weeks are exactly the date arithmetic
    val rows = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-08 09:00:00"),
      (2L, "2024-01-03 12:00:00"),
      (3L, "2024-01-10 08:00:00"), (3L, "2024-01-22 23:00:00"))
    val events = rows.toDF("user_id", "s")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"))
    val got = graft.operators.JourneyOps.cohortRetention(events).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      ("2024-01-01", 0) -> (2L, 2L, 1.0),
      ("2024-01-01", 1) -> (1L, 2L, 0.5),
      ("2024-01-08", 0) -> (1L, 1L, 1.0),
      ("2024-01-08", 2) -> (1L, 1L, 1.0)), got.toString)
  }

  test("char entropy: degenerate text scores 0, a fair coin ln 2") {
    val docs = Seq(
      (1L, "aaaaaaaa", "flat"),
      (2L, "abababab", "coin"),
      (3L, "", "empty")).toDF("doc_id", "text", "source")
    val got = graft.llm.TextOps.charEntropy(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.keySet == Set("flat", "coin"), "empty text must not be scored")
    assert(got("flat") == 0.0)
    assert(math.abs(got("coin") - math.log(2.0)) < 1e-4)
  }

  test("kmeans: one assignment per vector, k centroids, objective improves") {
    val em = graft.core.Tables.embeddings(spark, sf0001)
    val n = em.count()
    val a2 = SimilarityOps.kmeansAssign(em, iters = 2)
    assert(a2.count() == n)
    assert(a2.select(col("vec_id")).distinct().count() == n)

    val cents = SimilarityOps.kmeansCentroids(em, iters = 2)
    assert(cents.count() <= SimilarityOps.CentroidIds.size)

    // Lloyd improvement: mean cosine to the assigned centroid under the
    // trained model vs under the raw seed rows (iters = 0)
    val m0 = SimilarityOps.kmeansAssign(em, iters = 0)
      .agg(avg(col("cos"))).first().getDouble(0)
    val m2 = a2.agg(avg(col("cos"))).first().getDouble(0)
    assert(m2 >= m0 - 1e-6, s"objective regressed: $m0 -> $m2")
  }
}
