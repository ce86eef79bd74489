package graft

import org.apache.spark.sql.functions._

import graft.plans.LevenshteinPrefilter

/** The injected optimizer rule: guards levenshtein threshold predicates
  * with the free length-difference bound, without changing results and
  * without growing the plan at fixpoint. */
class LevenshteinRuleSpec extends SparkSpec {

  // parquet-backed (a LocalRelation would be constant-folded through the
  // filter before the rule could fire)
  private lazy val pairs = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lev").toString
    Seq(
      ("kitten", "sitting"),      // ld 3
      ("abc", "abcdefghij"),      // length diff 7 — guard prunes before ld
      ("same", "same"),           // ld 0
      ("short", "a much much longer string entirely")
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  test("guard appears in the optimized plan and results are unchanged") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 3)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length(a") || optimized.contains("abs((length("),
      s"expected length-difference guard in:\n$optimized")
    val got = q.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("kitten", "sitting"), ("same", "same")))
  }

  test("rule is fixpoint-safe (no repeated guard accumulation)") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 3)
    val once = LevenshteinPrefilter(q.queryExecution.optimizedPlan)
    val twice = LevenshteinPrefilter(once)
    assert(once == twice, "second application must be a no-op")
  }

  test("a levenshtein predicate folded into a join condition is guarded") {
    // predicate pushdown moves a post-join filter into the join
    // condition — the rule must fire there too (the q92 linkage shape;
    // PlanSpec pins the production query, this pins the mechanism)
    import spark.implicits._
    val left = pairs.select(col("a"))
    val right = pairs.select(col("b"))
    val q = left.join(right, levenshtein(col("a"), col("b")) <= 3)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length("),
      s"expected the guard inside the join condition:\n$optimized")
    val got = q.as[(String, String)].collect().toSet
    assert(got.contains(("kitten", "sitting")) && got.contains(("same", "same")))
  }

  test("levenshtein above a threshold is also guarded (strict greater)") {
    // 3 < levenshtein(a,b) keeps only pairs with distance > 3; the guard
    // direction flips but stays a necessary condition... which it is NOT
    // for lower bounds — so the rule must NOT fire here.
    val q = pairs.filter(lit(3) < levenshtein(col("a"), col("b")))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("abs((length("),
      s"lower-bound predicates must not be guarded:\n$optimized")
    assert(q.collect().length == 2)
  }
}
