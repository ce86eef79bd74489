package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Cross-table record linkage / entity resolution — the blocking +
  * verification shape of Fellegi & Sunter (JASA 1969) with the blocking
  * discipline of Newcombe et al. (Science 1959): candidate pairs come
  * only from shared cheap block keys, and the expensive string distance
  * runs on candidates alone. The reference delegates record semantics to
  * consumer callbacks (reference src/Kinesis/Kinesis.hs:42-176); this is
  * the master-data step a consumer of two feeds runs before joining them
  * on a surrogate key that doesn't exist yet.
  *
  * Distinct from [[graft.llm.DedupOps]]: dedup resolves duplicates
  * WITHIN one corpus on content similarity; linkage matches entities
  * ACROSS two differently-sourced tables on identifying fields.
  */
object LinkageOps {

  /** One blocking pass: candidates share `_blk`, and blocks whose A-side
    * occupancy exceeds `maxBlock` never reach the pair product — the
    * occupancy audit rides the same shuffle key. */
  private def blockPass(ax: DataFrame, bx: DataFrame,
      maxBlock: Int): DataFrame = {
    val ok = ax.groupBy(col("_blk")).agg(count(lit(1)).as("_occ"))
      .filter(col("_occ") <= maxBlock)
      .select(col("_blk"))
    ax.join(ok, "_blk").join(bx, "_blk")
      .select(col("a_id"), col("b_id"), col("_an"), col("_bn"))
  }

  /** Blocked fuzzy linkage of `a` to `b` on a name/description column:
    * candidates share the first `blockLen` characters, matches verify at
    * Levenshtein ≤ `maxDist`. Emits (a_id, b_id, dist).
    *
    * Scale shape: ONE shuffle of each slim (id, name) projection per
    * blocking pass; the per-block product is the cost driver, so blocks
    * whose A-side occupancy exceeds `maxBlock` are DROPPED outright —
    * the block-size cap every production blocker carries (the dedup
    * dfCap in linkage form), because one degenerate key ("unknown", a
    * boilerplate prefix) must not contribute occupancy² candidates.
    * Capped-out mass is recall loss, and the standard recovery is BUILT
    * IN: a second pass blocked on the name's SUFFIX (`right(name,
    * blockLen)`, independently capped) runs by default, and the two
    * candidate sets are unioned distinct BEFORE the one verification
    * stage — a pair lost to a degenerate or damaged prefix (a
    * boilerplate head, a prepended token) still surfaces when the tail
    * agrees. `recoverPass = false` restores the single-pass shape.
    * Levenshtein runs on unique candidates only, and the
    * LevenshteinPrefilter rule injects the free length-difference guard
    * in front of the O(len²) distance.
    * Discovered the hard way: a 3-char block over a low-diversity name
    * column put 25k rows in one block at the 20× stress point — 10⁹
    * distance calls. `blockLen` must reach past the shared head of the
    * name distribution; the cap is the backstop when it can't. */
  def fuzzyLinkage(a: DataFrame, b: DataFrame, idA: String, idB: String,
      nameA: String, nameB: String, blockLen: Int = 20,
      maxDist: Int = 3, maxBlock: Int = 1000,
      recoverPass: Boolean = true): DataFrame = {
    require(blockLen > 0 && maxDist >= 0 && maxBlock > 0,
      "blockLen > 0, maxDist >= 0, maxBlock > 0")
    def slim(df: DataFrame, id: String, nm: String, outId: String,
        outNm: String, key: Column => Column): DataFrame =
      df.select(col(id).as(outId), col(nm).as(outNm),
        key(col(nm)).as("_blk"))
    def passOn(key: Column => Column): DataFrame = blockPass(
      slim(a, idA, nameA, "a_id", "_an", key),
      slim(b, idB, nameB, "b_id", "_bn", key), maxBlock)
    val pre = passOn(substring(_, 1, blockLen))
    val cands =
      if (!recoverPass) pre
      else pre.unionByName(passOn(n => right(n, lit(blockLen)))).distinct()
    cands
      .withColumn("dist", levenshtein(col("_an"), col("_bn")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy("a_id", "b_id")
  }

  /** The composite "entity description" both the fixture and its oracle
    * link on — near-unique across parts (1995 of 2000 at sf0.01), so
    * cross-matches are real duplicate entities, not name collisions. */
  private val DescSql =
    "p_name || ' ' || p_brand || ' ' || p_type || ' ' || CAST(p_size AS VARCHAR)"
  private def desc(df: DataFrame): DataFrame =
    df.withColumn("_d", concat_ws(" ", col("p_name"), col("p_brand"),
      col("p_type"), col("p_size").cast("string")))

  /** q92 registry entry: link the part master to a deterministically
    * degraded "vendor feed" twin of itself — re-keyed, with per-key
    * description damage spanning the match spectrum: unchanged (dist 0),
    * truncated last char (dist 1), a ' zz' suffix (dist 3, at the
    * verify threshold), and a 'zz ' PREFIX — which survives verification
    * but falls outside the block prefix. The prefix family is exactly
    * what the built-in suffix recovery pass exists for: its last-20
    * characters agree with the master's, so the second pass blocks it
    * back in and the match count covers all four damage families. */
  def partFeedLinkage(part: DataFrame): DataFrame = {
    val master = desc(part)
    val feed = desc(part)
      .withColumn("f_id", col("p_partkey") + lit(1000000L))
      .withColumn("_fd",
        when(col("p_partkey") % 4 === 0, col("_d"))
          .when(col("p_partkey") % 4 === 1,
            expr("substring(_d, 1, length(_d) - 1)"))
          .when(col("p_partkey") % 4 === 2, concat(col("_d"), lit(" zz")))
          .otherwise(concat(lit("zz "), col("_d"))))
    fuzzyLinkage(master, feed, "p_partkey", "f_id", "_d", "_fd")
  }

  val q92LinkageSql: String =
    s"""WITH m AS (SELECT p_partkey AS a_id, $DescSql AS d FROM part),
       |f AS (SELECT p_partkey + 1000000 AS b_id,
       |    CASE WHEN p_partkey % 4 = 0 THEN d
       |         WHEN p_partkey % 4 = 1 THEN substring(d, 1, length(d) - 1)
       |         WHEN p_partkey % 4 = 2 THEN d || ' zz'
       |         ELSE 'zz ' || d END AS d
       |  FROM (SELECT p_partkey, $DescSql AS d FROM part)),
       |okp AS (SELECT substring(d, 1, 20) AS blk FROM m
       |  GROUP BY 1 HAVING count(*) <= 1000),
       |oks AS (SELECT right(d, 20) AS blk FROM m
       |  GROUP BY 1 HAVING count(*) <= 1000),
       |cand AS (
       |  SELECT m.a_id, m.d AS md, f.b_id, f.d AS fd
       |  FROM m JOIN f ON substring(m.d, 1, 20) = substring(f.d, 1, 20)
       |  JOIN okp ON okp.blk = substring(m.d, 1, 20)
       |  UNION
       |  SELECT m.a_id, m.d, f.b_id, f.d
       |  FROM m JOIN f ON right(m.d, 20) = right(f.d, 20)
       |  JOIN oks ON oks.blk = right(m.d, 20))
       |SELECT a_id, b_id, CAST(levenshtein(md, fd) AS INT) AS dist
       |FROM cand
       |WHERE levenshtein(md, fd) <= 3
       |ORDER BY a_id, b_id""".stripMargin

  type QFn = (SparkSession, String) => DataFrame
  val all: Seq[(String, QFn, Option[String])] = Seq(
    ("q92_record_linkage",
      (s: SparkSession, d: String) => partFeedLinkage(Tables.part(s, d)),
      Some(q92LinkageSql)))
}
