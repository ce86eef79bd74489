package graft

import graft.core.Tables
import graft.functions.GraftFunctions

/** The SQL-text surface: every table registers as a view, Spark SQL runs
  * the same §2b queries the DataFrame API expresses, and the custom
  * expressions are callable from SQL (they live in the FunctionRegistry). */
class SqlInterfaceSpec extends SparkSpec {

  private def registerViews(): Unit =
    Tables.names.foreach { t =>
      Tables.load(spark, sf0001, t).createOrReplaceTempView(t)
    }

  test("spark.sql runs the q03 aggregation and matches the DataFrame API") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 4) AS avg_qty,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin).collect().toSeq
    val viaApi = graft.operators.RelationalQueries.q03Agg(graft.core.Tables.lineitem(spark, sf0001))
      .collect().toSeq
    assert(viaSql == viaApi)
  }

  test("custom expressions are callable from SQL text") {
    GraftFunctions.register(spark)
    registerViews()
    val row = spark.sql(
      """SELECT round(cosine_sim(embedding, embedding), 6) AS self_cos,
        |  size(shingle_hashes('a b c d e f g', 5)) AS n_shingles,
        |  simhash64('hello world') AS sh
        |FROM embeddings LIMIT 1""".stripMargin).collect()(0)
    assert(row.getDouble(0) == 1.0)
    assert(row.getInt(1) == 3)
    assert(row.getLong(2) != 0L)
  }

  test("shingle_hashes with a non-literal k fails with a clear analysis error") {
    GraftFunctions.register(spark)
    registerViews()
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        "SELECT shingle_hashes(text, CAST(n_chars AS INT)) FROM documents")
        .collect()
    }
    assert(e.getMessage.contains("shingle_hashes"), e.getMessage)
  }

  test("generator SQL (explode+sequence) matches the q34 chunking DataFrame") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT doc_id, chunk_ix,
        |  CAST(length(chunk) AS BIGINT) AS chunk_len, md5(chunk) AS chunk_md5
        |FROM (
        |  SELECT doc_id, chunk_ix,
        |    substr(text, CAST(chunk_ix * 150 + 1 AS INT), 200) AS chunk
        |  FROM (
        |    SELECT doc_id, text,
        |      explode(sequence(0L,
        |        greatest(CAST(floor((length(text) - 1) / 150) AS BIGINT), 0L)))
        |        AS chunk_ix
        |    FROM documents) g) s
        |ORDER BY doc_id, chunk_ix""".stripMargin).collect().toSeq
    val viaApi = graft.llm.ChunkOps.chunk(
      graft.core.Tables.documents(spark, sf0001)).collect().toSeq
    assert(viaSql == viaApi)
  }

  test("window + subquery SQL matches the q11 DataFrame top-3") {
    registerViews()
    val viaSql = spark.sql(
      """SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 2) AS price
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin).collect().toSeq
    val viaApi = graft.operators.RelationalQueries.q11RankWindow(graft.core.Tables.orders(spark, sf0001))
      .collect().toSeq
    assert(viaSql == viaApi)
  }

  test("stratified-sample SQL matches the q39 DataFrame (and keeps WindowGroupLimit)") {
    registerViews()
    val sql = spark.sql(
      """SELECT lang, sample_rank, doc_id, source, n_chars FROM (
        |  SELECT lang, doc_id, source, n_chars,
        |    row_number() OVER (PARTITION BY lang ORDER BY
        |      CAST(conv(substring(md5(to_binary(CAST(doc_id AS STRING),
        |        'utf-8')), 1, 15), 16, 10) AS BIGINT) % 1000000,
        |      doc_id) AS sample_rank
        |  FROM documents) t
        |WHERE sample_rank <= 40 ORDER BY lang, sample_rank""".stripMargin)
    val api = graft.operators.SampleOps
      .docsPerLang(graft.core.Tables.documents(spark, sf0001))
    assert(sql.collect().toSeq == api.collect().toSeq)
    // the SQL-text route gets the same map-side rank-limit pruning
    assert(sql.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("Q13/Q21-shape SQL matches the q108/q107 DataFrame operators") {
    registerViews()
    val q13 = spark.sql(
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        |  GROUP BY c_custkey)
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin)
    val api13 = graft.operators.RelationalQueries.q108CustOrderDist(
      graft.core.Tables.customer(spark, sf0001),
      graft.core.Tables.orders(spark, sf0001))
    assert(q13.collect().toSeq == api13.collect().toSeq)

    val q21 = spark.sql(
      """WITH f AS (
        |  SELECT l_orderkey, l_suppkey,
        |    max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAYS
        |      THEN 1 ELSE 0 END) AS late
        |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
        |  GROUP BY 1, 2),
        |w AS (SELECT l_orderkey, l_suppkey, late,
        |    count(*) OVER (PARTITION BY l_orderkey) AS ns,
        |    sum(late) OVER (PARTITION BY l_orderkey) AS nl
        |  FROM f)
        |SELECT s_name, count(*) AS numwait
        |FROM w JOIN supplier ON s_suppkey = l_suppkey
        |WHERE late = 1 AND ns > 1 AND nl = 1
        |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin)
    val api21 = graft.operators.RelationalQueries.q107WaitingSupplier(
      graft.core.Tables.lineitem(spark, sf0001),
      graft.core.Tables.orders(spark, sf0001),
      graft.core.Tables.supplier(spark, sf0001))
    assert(q21.collect().toSeq == api21.collect().toSeq)
  }
}
