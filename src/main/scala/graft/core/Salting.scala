package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew treatment for joins and aggregations whose key has FEW distinct
  * values or a hot head (cluster ids, hot categories): a plain shuffle
  * caps parallelism at |distinct keys| tasks no matter how large the
  * sides are — the q100 lesson, where an 8-valued cid key ran 8 tasks
  * and paid 440 s until salted. The standard fix fans the key out:
  * the LARGE side takes one deterministic salt per row, the
  * SMALL/replicated side explodes across every salt, and the join runs
  * on (key, salt) — |keys|·|salts| cells, same logical output. For
  * aggregation, the salt splits a hot group into `salts` partial
  * groups, and a second metadata-scale aggregate folds the partials —
  * the classic two-phase combine made explicit.
  *
  * Every salt here derives from `xxhash64` of row content, never from
  * `rand()` or partition/row ordinals: recomputation under task retry
  * or a different upstream partitioning yields the SAME salt, so both
  * join branches and any replay agree. (This module is the
  * consolidation of the former `graft.operators.Salting`, whose
  * spark_partition_id+monotonically_increasing_id salt was
  * order-dependent under repartitioning.)
  *
  * Cost model: the replicated side grows |salts|×; use it for the side
  * whose rows are few or slim (probe sets, per-key aggregates), never
  * for the fact table. The salted output is exactly the unsalted
  * equivalent (property-tested in Round13OpsSpec and SkewSpec).
  */
object Salting {

  val DefaultSalts = 32

  private val SaltCol = "_salt"

  /** Deterministic per-row salt in [0, salts): xxhash64 of `unique`,
    * stable under retry and repartitioning. */
  def saltExpr(unique: Column, salts: Int): Column =
    pmod(xxhash64(unique), lit(salts)).cast("int")

  private def requireFresh(df: DataFrame, side: String): Unit =
    require(!df.columns.contains(SaltCol),
      s"$side input already has a '$SaltCol' column — rename it before salting")

  /** Equi-join on `keys` with salt fanout: `large` rows are salted by
    * `xxhash64(uniqueCol)`, `replicated` rows explode across all
    * `salts`. Returns the joined frame with the salt column dropped —
    * column set identical to `large.join(replicated, keys, joinType)`.
    *
    * Only large-side-preserving join types are legal: the replicated
    * side is exploded `salts`×, so right/full-outer (and right-semi/
    * anti) would emit every unmatched replicated row `salts` times. */
  def saltedJoin(large: DataFrame, replicated: DataFrame,
      keys: Seq[String], uniqueCol: String,
      salts: Int = DefaultSalts, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")(
        joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType': " +
        "the exploded replicated side would duplicate unmatched right rows")
    requireFresh(large, "large"); requireFresh(replicated, "replicated")
    require(large.columns.contains(uniqueCol),
      s"large input has no column '$uniqueCol' to salt by")
    keys.foreach(k => require(
      large.columns.contains(k) && replicated.columns.contains(k),
      s"join key '$k' must exist on both sides"))
    val l = large.withColumn(SaltCol, saltExpr(col(uniqueCol), salts))
    val r = replicated.withColumn(SaltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }

  /** Salted sum/count aggregation: `df.groupBy(key).agg(sum(value))`
    * with the hot-key shuffle spread over `salts` reducers via a
    * two-phase combine. The salt hashes the WHOLE row (content-stable
    * under retry); rows that are full duplicates share a salt, which
    * only matters if a hot group is mostly identical rows — pass more
    * `salts` or a distinct row id through `df` in that case. */
  def saltedGroupSum(df: DataFrame, key: String, value: String,
      salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    requireFresh(df, "input")
    df.withColumn(SaltCol, saltExpr(struct(df.columns.map(col): _*), salts))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$value"), sum(col("_pcnt")).as("cnt"))
  }
}
