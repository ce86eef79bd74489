package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.llm.{DedupOps, TextOps}
import graft.operators.QualityOps

/** Round-12 operators on hand-computable fixtures: FD audit verdicts,
  * BPE pair counts, PageRank invariants + a driver-side power-iteration
  * twin, and PMI on corpora with known indicator counts. */
class Round12OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- q88

  test("fdAudit: holding, violated, and composite-LHS FDs in one suite") {
    val df = Seq(
      // a determines b (every a maps to one b); a does NOT determine c;
      // (a, b) → c violated only where the (a,b) group repeats with a
      // different c
      (1, "x", 10), (1, "x", 20),
      (2, "y", 10), (2, "y", 10),
      (3, "z", 30)).toDF("a", "b", "c")
    val out = QualityOps.fdAudit(df, Seq(
      QualityOps.Fd("a_to_b", Seq("a"), "b"),
      QualityOps.Fd("a_to_c", Seq("a"), "c"),
      QualityOps.Fd("ab_to_c", Seq("a", "b"), "c"))).collect()
    val byName = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    assert(byName("a_to_b") == ((3L, 0L, 1)))   // 3 groups, none violate
    assert(byName("a_to_c") == ((3L, 1L, 0)))   // group a=1 has c∈{10,20}
    assert(byName("ab_to_c") == ((3L, 1L, 0)))  // (1,x) violates
  }

  test("fdAudit: viol_rate is violating-groups over groups") {
    val df = Seq((1, 1), (1, 2), (2, 5), (3, 7), (4, 9), (4, 9))
      .toDF("k", "v")
    val r = QualityOps.fdAudit(df,
      Seq(QualityOps.Fd("k_to_v", Seq("k"), "v"))).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 1L)
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-9)
  }

  // ---------------------------------------------------------------- q89

  test("bpePairs: character pairs weighted by word frequency") {
    val docs = Seq(
      (1L, "aa ab aa"),
      (2L, "aa b")). // "b" has length 1 — contributes no pair
      toDF("doc_id", "text")
    val out = TextOps.bpePairs(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // vocab: aa×3 → pair "a a" n=3; ab×1 → pair "a b" n=1
    assert(out == Map("a a" -> 3L, "a b" -> 1L))
  }

  test("bpePairs: pair counts are per-occurrence within a word") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val out = TextOps.bpePairs(docs).collect()
    // "aaa" has two adjacent "a a" positions in ONE vocab entry of freq 1
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("a a", 2L)))
  }

  // ---------------------------------------------------------------- q90

  /** Driver-side power-iteration twin of [[DedupOps.pagerank]] for exact
    * cross-checking on small graphs. */
  private def prReference(edges: Seq[(Long, Long)], nodes: Seq[Long],
      damping: Double = 0.85, iters: Int = 5): Map[Long, Double] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val n = nodes.size.toDouble
    var pr = nodes.map(_ -> 1.0 / n).toMap
    (1 to iters).foreach { _ =>
      val dang = nodes.filterNot(adj.contains).map(pr).sum
      val contrib = nodes.map { v =>
        v -> adj.getOrElse(v, Nil).map(u => pr(u) / adj(u).size).sum
      }.toMap
      pr = nodes.map(v => v ->
        ((1.0 - damping) / n + damping * (contrib(v) + dang / n))).toMap
    }
    pr
  }

  test("pagerank: path graph — hub above leaves, symmetric leaves equal, " +
    "mass conserved, matches the driver-side power iteration") {
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("d1", "d2")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val out = DedupOps.pagerank(pairs, nodes, topN = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.size == 4)
    assert(out(2L) > out(1L) && out(1L) > out(4L))
    assert(math.abs(out(1L) - out(3L)) < 1e-9)
    assert(math.abs(out.values.sum - 1.0) < 1e-6) // 6dp rounding tolerance
    val ref = prReference(Seq((1L, 2L), (2L, 3L)), Seq(1L, 2L, 3L, 4L))
    ref.foreach { case (v, want) =>
      assert(math.abs(out(v) - want) < 1e-6, s"node $v: ${out(v)} vs $want")
    }
  }

  test("pagerank: all-isolated graph keeps the uniform distribution") {
    val pairs = spark.emptyDataset[(Long, Long)].toDF("d1", "d2")
    val nodes = Seq(10L, 20L, 30L).toDF("doc_id")
    val out = DedupOps.pagerank(pairs, nodes, topN = 10).collect()
    // no edges: every round redistributes all mass uniformly → 1/N each
    assert(out.length == 3)
    out.foreach(r => assert(math.abs(r.getDouble(1) - 1.0 / 3) < 1e-6))
  }

  test("pagerank: topN truncates deterministically by (rank, id)") {
    val pairs = Seq((1L, 2L)).toDF("d1", "d2")
    val nodes = (1L to 6L).toDF("doc_id")
    val out = DedupOps.pagerank(pairs, nodes, topN = 3).collect()
    assert(out.length == 3)
    // 1 and 2 tie above the four isolated nodes; 3 is the smallest-id
    // isolated node
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  // ---------------------------------------------------------------- q92

  test("fuzzyLinkage: blocking admits, distance verifies, prefix miss blocks") {
    val a = Seq((1L, "red widget"), (2L, "blue bolt")).toDF("id", "name")
    val b = Seq(
      (10L, "red widget"),   // exact → dist 0
      (11L, "red widgets"),  // within maxDist → dist 1
      (12L, "red gadget widget thing"), // same block, too far → dropped
      (13L, "xred widget")   // 1 edit but block prefix differs → never seen
    ).toDF("id", "name")
    // recoverPass off: this test pins the behavior of the prefix
    // blocking pass in isolation (Round13OpsSpec covers the recovery)
    val out = graft.operators.LinkageOps
      .fuzzyLinkage(a, b, "id", "id", "name", "name", blockLen = 3,
        recoverPass = false)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(out == Seq((1L, 10L, 0), (1L, 11L, 1)))
  }

  test("fuzzyLinkage: over-occupied blocks are dropped whole") {
    val a = Seq((1L, "aa x"), (2L, "aa y"), (3L, "aa z"), (4L, "bb x"))
      .toDF("id", "name")
    val b = Seq((10L, "aa x"), (11L, "bb x")).toDF("id", "name")
    val out = graft.operators.LinkageOps
      .fuzzyLinkage(a, b, "id", "id", "name", "name",
        blockLen = 2, maxBlock = 2, recoverPass = false).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the "aa" block holds 3 A-rows > cap → dropped outright, even though
    // (1, 10) would verify at dist 0; "bb" (occupancy 1) links normally
    assert(out == Seq((4L, 11L)))
  }

  test("partFeedLinkage: planted damage matches at its exact distance; " +
    "the prefix-damaged quarter is recovered by the suffix pass") {
    val part = graft.core.Tables.part(spark, sf0001)
    val out = graft.operators.LinkageOps.partFeedLinkage(part).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val self = out.collect {
      case (a, b, d) if b == a + 1000000L => a -> d }.toMap
    val keys = part.select("p_partkey").collect().map(_.getLong(0))
    keys.foreach { k =>
      (k % 4) match {
        case 0 => assert(self(k) == 0, s"key $k unchanged should be dist 0")
        case 1 => assert(self(k) == 1, s"key $k truncated should be dist 1")
        case 2 => assert(self(k) == 3, s"key $k suffixed should be dist 3")
        case _ => assert(self(k) == 3,
          s"key $k prefix-damaged should be recovered at dist 3")
      }
    }
  }

  // ---------------------------------------------------------------- q93

  test("wassersteinDrift: point masses a unit apart score W1 = 1") {
    val df = Seq((0.0, "ref"), (1.0, "cur")).toDF("v", "side")
    val r = graft.operators.ProfileOps.wassersteinDrift(
      df, "v", col("side") === "ref", col("side") === "cur").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-6) // support width is 1
  }

  test("wassersteinDrift: a 5-unit shift of a uniform 3-pointer scores 5") {
    val df = (Seq(0.0, 1.0, 2.0).map((_, "ref")) ++
      Seq(5.0, 6.0, 7.0).map((_, "cur"))).toDF("v", "side")
    val r = graft.operators.ProfileOps.wassersteinDrift(
      df, "v", col("side") === "ref", col("side") === "cur").collect().head
    // segments: 1/3 + 2/3 + 3·1 + 2/3 + 1/3 = 5 (mean-shift recovered
    // exactly — the property PSI/JS/KS all lack)
    assert(math.abs(r.getDouble(2) - 5.0) < 1e-6)
  }

  test("wassersteinDrift: identical distributions score 0") {
    val df = Seq((1.0, 0L), (2.0, 0L), (1.0, 1L), (2.0, 1L), (7.0, 0L),
      (7.0, 1L)).toDF("v", "k")
    val r = graft.operators.ProfileOps.wassersteinDrift(
      df, "v", col("k") === 0, col("k") === 1).collect().head
    assert(math.abs(r.getDouble(2)) < 1e-6)
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L)
  }

  // ---------------------------------------------------------------- q91

  test("pmiPairs: independent pair scores 0, associated pair scores ln 2") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha beta"),
      (3L, "gamma delta"), (4L, "gamma delta")).toDF("doc_id", "text")
    val out = TextOps.pmiPairs(docs, minDfAbs = 2, minPair = 2).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // alpha/beta co-occur in 2 of 4 docs, each df 2 → PMI = ln(2·4/(2·2))
    assert(out(("alpha", "beta"))._1 == 2L)
    assert(math.abs(out(("alpha", "beta"))._2 - math.log(2.0)) < 1e-4)
    assert(out(("delta", "gamma"))._1 == 2L) // pairs are lexicographic
    assert(!out.contains(("alpha", "gamma"))) // never co-occur
  }

  // ---------------------------------------------------------------- q94

  test("textrank: connected terms outrank isolated ones; symmetric " +
    "partners tie") {
    val docs = (
      (1 to 3).map(i => (i.toLong, "alpha beta")) ++
      (4 to 6).map(i => (i.toLong, "gamma"))).toDF("doc_id", "text")
    val out = TextOps.textrank(docs, minDfAbs = 2, minPair = 2).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("alpha", "beta", "gamma"))
    assert(math.abs(out("alpha") - out("beta")) < 1e-9)
    assert(out("alpha") > out("gamma"))
    assert(math.abs(out.values.sum - 1.0) < 1e-5)
  }

  // ---------------------------------------------------------------- q95

  test("embeddingProfile: per-dimension stats, 1-based dims, dead dim " +
    "shows sd 0") {
    val em = Seq(
      (1L, Seq(0.0f, 2.0f)),
      (2L, Seq(2.0f, 2.0f))).toDF("vec_id", "embedding")
    val out = graft.llm.SimilarityOps.embeddingProfile(em).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    assert(out(1) == ((2L, 1.0, 1.4142, 0.0, 2.0)))
    assert(out(2) == ((2L, 2.0, 0.0, 2.0, 2.0)))
  }

  test("pmiPairs: df threshold prunes exactly the sub-minPair terms") {
    val docs = Seq(
      (1L, "x y"), (2L, "x y"), (3L, "x z")).toDF("doc_id", "text")
    val out = TextOps.pmiPairs(docs, minDfAbs = 2, minPair = 2).collect()
    // (x,y): n_xy=2, n_x=3, n_y=2, N=3 → PMI = ln(6/6) = 0; z has df 1
    assert(out.length == 1)
    val r = out.head
    assert((r.getString(0), r.getString(1), r.getLong(2)) == ("x", "y", 2L))
    assert(math.abs(r.getDouble(3)) < 1e-4)
    intercept[IllegalArgumentException] {
      TextOps.pmiPairs(docs, minDfAbs = 1, minPair = 2)
    }
  }
}
