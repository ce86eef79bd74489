package graft

import org.apache.spark.sql.functions._

import graft.llm.{SimilarityOps, SketchOps, TextOps}
import graft.operators.{JourneyOps, StatsOps}

/** Semantic invariants of the third round-9 operator batch, beyond the
  * DuckDB oracles: Benford digit extraction at power-of-ten boundaries,
  * Gini endpoints, Markov row-stochasticity, anomaly gating on flat vs
  * spiked histories, Zipf slope recovery on a synthetic power law, the
  * quantization error bound, and HLL union losslessness. */
class Round9cOpsSpec extends SparkSpec {
  import spark.implicits._

  test("benford: boundary digits, zero-count digits kept, terms hand-check") {
    // 999.99 must read as digit 9 and 1000.0 as digit 1 — the log10
    // formulation gets these wrong by a ulp, the string path must not
    val df = Seq(1.0, 19.0, 25.0, 999.99, 1000.0, 0.5).toDF("v")
    val got = StatsOps.benfordDigits(df, "v").collect()
    assert(got.length == 9, "all 9 digits emit a row")
    val byDigit = got.map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byDigit == Map(1 -> 3L, 2 -> 1L, 3 -> 0L, 4 -> 0L, 5 -> 0L,
      6 -> 0L, 7 -> 0L, 8 -> 0L, 9 -> 1L), byDigit.toString)
    // 0.5 < 1 is excluded; expected shares sum to 1, chi2 terms ≥ 0
    val pSum = got.map(_.getDouble(3)).sum
    assert(math.abs(pSum - 1.0) < 1e-3, s"Benford shares sum to $pSum")
    assert(got.forall(_.getDouble(4) >= 0.0))
  }

  test("gini: 0 on uniform activity, hand value on a concentrated pair") {
    val uniform = (1 to 4).flatMap(u => Seq.fill(25)(u.toLong)).toDF("user_id")
    val g0 = StatsOps.giniByKey(uniform, "user_id").first()
    assert(g0.getAs[Long]("n_keys") == 4)
    assert(g0.getAs[Long]("total_rows") == 100)
    assert(g0.getAs[Double]("gini") == 0.0)

    // totals (1, 99): G = 2·(1·1 + 2·99)/(2·100) − 3/2 = 0.49
    val skew = (Seq.fill(1)(1L) ++ Seq.fill(99)(2L)).toDF("user_id")
    assert(StatsOps.giniByKey(skew, "user_id").first()
      .getAs[Double]("gini") == 0.49)
  }

  test("markov: hand matrix on a fixture, rows sum to 1 on the corpus") {
    val rows = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"), (1L, 4L, "b"),
      (2L, 1L, "a"), (2L, 2L, "b"))
    val events = rows.toDF("user_id", "event_id", "o")
      .select(col("user_id"), col("event_id"),
        (to_timestamp(lit("2024-01-01 00:00:00"))
          + expr("make_interval(0, 0, 0, 0, 0, 0, event_id)")).as("ts"),
        col("o").as("event_type"))
    val got = JourneyOps.markovTransitions(events).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // u1: a→b, b→a, a→b; u2: a→b — terminal events contribute nothing
    assert(got == Map(("a", "b") -> (3L, 1.0), ("b", "a") -> (1L, 1.0)),
      got.toString)

    val corpus = JourneyOps.markovTransitions(
      graft.core.Tables.events(spark, sf0001))
    val rowSums = corpus.groupBy(col("src"))
      .agg(sum(col("p")).as("ps")).collect()
    assert(rowSums.nonEmpty)
    rowSums.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-2,
      s"row ${r.getString(0)} sums to ${r.getDouble(1)}"))
  }

  test("anomaly: spike day flagged, flat history yields no score") {
    def day(d: Int, n: Int, t: String) = (1 to n).map(i =>
      (t, f"2024-01-$d%02d 12:00:00"))
    // 'spiky': 8 slightly-varying days then a 10× spike on day 9
    val spiky = (1 to 8).flatMap(d => day(d, 10 + d % 2, "spiky")) ++
      day(9, 100, "spiky")
    // 'flat': constant volume — sd = 0, nothing is scorable
    val flat = (1 to 9).flatMap(d => day(d, 10, "flat"))
    val events = (spiky ++ flat).toDF("event_type", "s")
      .select(col("event_type"), to_timestamp(col("s")).as("ts"))

    val got = StatsOps.volumeAnomalies(events).collect()
    assert(got.forall(_.getString(0) == "spiky"), "flat history not scored")
    // day 8 has a full varying history (z small); day 9 is the spike
    val byDay = got.map(r => r.getDate(1).toString ->
      (r.getDouble(4), r.getInt(5))).toMap
    assert(byDay.keySet == Set("2024-01-08", "2024-01-09"), byDay.toString)
    assert(byDay("2024-01-08")._2 == 0)
    assert(byDay("2024-01-09")._1 > 3.0 && byDay("2024-01-09")._2 == 1)
  }

  test("zipf: recovers slope ≈ -1 and r2 ≈ 1 on a synthetic power law") {
    // term k appears ⌊120/k⌋ times: an exact-ish 1/rank law over 20 terms
    val text = (1 to 20).flatMap(k => Seq.fill(120 / k)(f"term$k%02d"))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val r = TextOps.zipfFit(docs, topK = 20).first()
    assert(r.getAs[Long]("n_terms") == 20)
    assert(math.abs(r.getAs[Double]("slope") + 1.0) < 0.05,
      s"slope ${r.getAs[Double]("slope")}")
    assert(r.getAs[Double]("r2") > 0.99)
  }

  test("quantize: hand values, error bound amax/254, zero vector excluded") {
    val vecs = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f), 0),
      (2L, Seq(0.0f, 0.0f, 0.0f), 1))
    val em = vecs.toDF("vec_id", "embedding", "label")
    val got = SimilarityOps.quantizeAudit(em).collect()
    assert(got.length == 1, "zero vector has no scale and is excluded")
    val r = got.head
    assert(r.getAs[Int]("label") == 0 && r.getAs[Long]("n_vecs") == 1)
    // q = (64, -127, 32)/127 → errors (−0.003937, 0, −0.001969)
    assert(r.getAs[Double]("avg_rmse") == 0.002541, r.toString)
    assert(r.getAs[Double]("max_abs_err") == 0.003937, r.toString)
    assert(r.getAs[Double]("avg_amax") == 1.0)

    // corpus-wide: the absmax scheme's worst component error is half a
    // quantization step; amax ≤ 1 in the fixture ⇒ bound 1/254 + ulp
    val corpus = SimilarityOps.quantizeAudit(
      graft.core.Tables.embeddings(spark, sf0001))
    corpus.collect().foreach { row =>
      assert(row.getAs[Double]("max_abs_err") <=
        row.getAs[Double]("avg_amax").max(1.0) / 254.0 + 1e-6, row.toString)
    }
  }

  test("dup degrees: handshake lemma and doc-count identity vs the pair list") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val pairs = graft.llm.DedupOps.ngramJaccard(docs)
    val nPairs = pairs.count()
    val degs = graft.llm.DedupOps.dupGraphDegrees(docs).collect()
    assert(degs.nonEmpty)
    // Σ degree·count = 2·|edges|; Σ count = |docs touching any pair|
    assert(degs.map(r => r.getLong(0) * r.getLong(1)).sum == 2 * nPairs)
    val touched = pairs.select(col("d1").as("d")).union(pairs.select(col("d2").as("d")))
      .distinct().count()
    assert(degs.map(_.getLong(1)).sum == touched)
  }

  test("source overlap: normalized pairs partition the thresholded pair list") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val nPairs = graft.llm.DedupOps.ngramJaccard(docs).count()
    val m = graft.llm.DedupOps.sourceOverlap(docs).collect()
    assert(m.map(_.getLong(2)).sum == nPairs, "matrix cells partition pairs")
    m.foreach { r =>
      assert(r.getString(0) <= r.getString(1), s"unnormalized cell $r")
      assert(r.getDouble(3) >= 0.8 && r.getDouble(3) <= 1.0)
    }
  }

  test("rfm: quintiles balanced, cells partition users, recency monotone") {
    val events = graft.core.Tables.events(spark, sf0001)
    val nUsers = events.select(col("user_id")).distinct().count()
    val cells = JourneyOps.rfmSegments(events).collect()
    assert(cells.map(_.getLong(3)).sum == nUsers, "cells partition users")

    // each recency quintile holds ⌊n/5⌋..⌈n/5⌉ users, and mean recency
    // is non-decreasing in the quintile number (1 = most recent)
    val byR = cells.groupBy(_.getLong(0)).view
      .mapValues(rs => (rs.map(_.getLong(3)).sum,
        rs.map(r => r.getDouble(4) * r.getLong(3)).sum
          / rs.map(_.getLong(3)).sum))
      .toMap
    assert(byR.keySet == (1L to 5L).toSet)
    byR.values.foreach { case (n, _) =>
      assert(n >= nUsers / 5 && n <= nUsers / 5 + 1, s"quintile size $n") }
    val means = (1L to 5L).map(byR(_)._2)
    assert(means == means.sorted, s"recency means not monotone: $means")
  }

  test("hll: union of per-source sketches is lossless, estimate within 5%") {
    val docs = graft.core.Tables.documents(spark, sf0001)
    val got = SketchOps.hllVocabBySource(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.nonEmpty)

    // exact per-lang distinct vocabulary
    val exact = docs
      .select(col("lang"), explode(graft.llm.Text.tokens(col("text"))).as("t"))
      .groupBy("lang").agg(countDistinct(col("t")).as("nd")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (lang, nd) =>
      val est = got(lang)._2
      assert(math.abs(est - nd).toDouble / nd < 0.05,
        s"$lang: est $est vs exact $nd")
    }

    // register-wise max means union-of-parts ≡ one sketch over the whole
    val whole = docs
      .select(col("lang"), explode(graft.llm.Text.tokens(col("text"))).as("t"))
      .groupBy(col("lang"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("t"), lit(12))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.view.mapValues(_._2).toMap == whole,
      s"union ${got.view.mapValues(_._2).toMap} vs whole $whole")
  }
}
