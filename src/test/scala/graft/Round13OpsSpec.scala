package graft

import org.apache.spark.sql.functions._

import graft.llm.TextOps

/** Round-13 operator behavior: hand-computed fixtures for this round's
  * changes (fractional df threshold, linkage recovery pass). */
class Round13OpsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ q91/q94

  test("pmiPairs: fractional df default scales with corpus size " +
    "(5% of 100 docs prunes df-4 terms, keeps df-5)") {
    // 100 docs; "rare" pair co-occurs in 4 (df 4 < ceil(0.05·100)=5),
    // "com mon" co-occurs in 5 (df 5 ≥ 5). An absolute-25 default
    // would keep neither; the fraction admits exactly the df-5 pair.
    val docs = (
      (1 to 4).map(i => (i.toLong, "rare pair")) ++
      (5 to 9).map(i => (i.toLong, "com mon")) ++
      (10 to 100).map(i => (i.toLong, s"filler$i"))).toDF("doc_id", "text")
    val out = TextOps.pmiPairs(docs, minPair = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("com", "mon")))
    // absolute override restores the old behavior
    val abs = TextOps.pmiPairs(docs, minPair = 2, minDfAbs = 2).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(abs == Set(("com", "mon"), ("pair", "rare")))
  }

  test("textrank: fractional df default matches pmiPairs' vocabulary") {
    val docs = (
      (1 to 5).map(i => (i.toLong, "alpha beta")) ++
      (6 to 9).map(i => (i.toLong, "gamma delta")) ++
      (10 to 100).map(i => (i.toLong, s"filler$i"))).toDF("doc_id", "text")
    val out = TextOps.textrank(docs, minPair = 2).collect()
      .map(r => r.getString(0)).toSet
    // gamma/delta df 4 < 5 → out of the graph entirely
    assert(out == Set("alpha", "beta"))
  }
}
