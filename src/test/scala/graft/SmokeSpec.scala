package graft

import org.apache.spark.sql.functions._

/** t1 smoke: the flagship query end-to-end on sf0.001 (SURVEY §5.2-4). */
class SmokeSpec extends SparkSpec {

  test("entry (Q03 TPC-H Q1 shape) returns rows on sf0.001") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.nonEmpty)
    // 3 return flags × 2 line statuses at most; count must cover most of
    // the 6k-lineitem table (filter only cuts post-1998-09-02 shipdates)
    assert(rows.map(_.getAs[Long]("count_order")).sum > 3000)
  }

  test("every declared query runs and most return rows on sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, sf0001).count()
      if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with empty results: $empties")
  }

  test("every oracleSql key has a queries twin") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty)
  }

  test("q03 matches hand-computed aggregate") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val expectTotal = li.count()
    val got = graft.operators.RelationalQueries.q03Agg(graft.core.Tables.lineitem(spark, sf0001))
      .agg(sum("count_order")).collect()(0).getLong(0)
    assert(got == expectTotal)
  }
}
