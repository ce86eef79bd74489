package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-plan bit-position dimension for low-cardinality set columns.
  *
  * Several set-statistics operators (q74 source overlap, q76 basket
  * rules) collapse "which members of a small dimension witnessed this
  * key" into a 64-bit OR mask, so the expensive per-key aggregate is a
  * codegen'd `bit_or(long)` instead of `collect_set(string)`, and every
  * pairwise statistic then runs on the tiny distinct-mask histogram —
  * never per key.
  *
  * The dimension is derived IN-PLAN (no driver action at plan
  * construction — the laziness contract): a row_number over the distinct
  * frame, which is metadata-scale by the operator's own premise. More
  * than 63 members fails loudly via raise_error instead of silently
  * wrapping the shift; callers that outgrow it shard the dimension.
  */
object BitDim {

  /** (value, bit) dimension frame for `c`'s distinct non-null values,
    * broadcast-marked. Bit assignment is by ascending value order, so it
    * is deterministic across runs and engines. */
  def dim(df: DataFrame, c: String): DataFrame =
    broadcast(dimPlain(df, c))

  /** [[dim]] without the broadcast hint: already SinglePartition (the
    * bit-assignment window collapses it), so a metadata-scale tail can
    * merge/NL-join it in-stage instead of paying a broadcast-exchange
    * job per lookup. */
  def dimPlain(df: DataFrame, c: String): DataFrame =
    df.select(col(c)).na.drop().distinct()
      .select(col(c), row_number().over(Window.orderBy(c)).as("_bd_id"))
      .select(col(c),
        when(col("_bd_id") > 63, raise_error(concat(
          lit(s"BitDim($c) supports <= 63 distinct values; shard the "
            + "dimension (id="), col("_bd_id"), lit(")"))).cast("long"))
          .otherwise(expr("shiftleft(1L, _bd_id - 1)")).as("bit"))

  /** Unordered-pair frame of a [[dim]]: (a, bit_a, b, bit_b) with a < b. */
  def pairs(dimDf: DataFrame, c: String, aName: String, bName: String)
      : DataFrame =
    broadcast(dimDf.select(col(c).as(aName), col("bit").as("bit_a"))
      .crossJoin(dimDf.select(col(c).as(bName), col("bit").as("bit_b")))
      .filter(col(aName) < col(bName)))

  /** `mask` has `bit` set. */
  def hasBit(mask: Column, bit: Column): Column =
    (mask.bitwiseAND(bit)) =!= 0

  // ------------------------------------------------------- sharded form

  /** Sharded dimension for set columns WIDER than 63 values: bit ids
    * split into ⌈n/63⌉ 63-bit shards — (value, shard, bit), broadcast.
    * The single-mask [[dim]] stays the fast path (one long per key, one
    * `bit_or`); operators built on it declare ≤ 63 as a precondition and
    * fail loudly past it. A caller that outgrows the width switches to
    * this family: per-key state becomes one small sorted
    * `array<struct<shard,mask>>` (still fixed-size, still mergeable,
    * still groupable for the distinct-mask histogram), and membership
    * tests read the shard's mask. Same deterministic ascending-value bit
    * assignment as [[dim]]. */
  def shardedDim(df: DataFrame, c: String): DataFrame =
    broadcast(df.select(col(c)).na.drop().distinct()
      .select(col(c),
        (row_number().over(Window.orderBy(c)) - 1).as("_bd_id"))
      .select(col(c),
        expr("CAST(_bd_id DIV 63 AS INT)").as("shard"),
        expr("shiftleft(1L, CAST(_bd_id % 63 AS INT))").as("bit")))

  /** Per-key sharded masks: `joined` is the fact frame already joined to
    * [[shardedDim]] (carrying `shard`/`bit`); returns one row per key
    * with `masks: array<struct<shard,mask>>`, sorted so the array is
    * canonical — equal sets produce equal arrays, making the column
    * directly usable as a distinct-histogram grouping key. Two
    * aggregations, both map-side-collapsing: bits OR within a shard,
    * shards collect per key (≤ ⌈n/63⌉ rows each). */
  def shardedMasks(joined: DataFrame, keyCols: Seq[String]): DataFrame =
    joined
      .groupBy((keyCols.map(col) :+ col("shard")): _*)
      .agg(bit_or(col("bit")).as("mask"))
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("shard"), col("mask"))))
        .as("masks"))

  /** Unordered-pair frame of a [[shardedDim]]:
    * (a, shard_a, bit_a, b, shard_b, bit_b) with a < b. */
  def shardedPairs(dimDf: DataFrame, c: String, aName: String,
      bName: String): DataFrame =
    broadcast(dimDf.select(col(c).as(aName), col("shard").as("shard_a"),
        col("bit").as("bit_a"))
      .crossJoin(dimDf.select(col(c).as(bName), col("shard").as("shard_b"),
        col("bit").as("bit_b")))
      .filter(col(aName) < col(bName)))

  /** The sharded-mask array has `bit` set in shard `shard`. */
  def hasBitIn(masks: Column, shard: Column, bit: Column): Column =
    coalesce(element_at(map_from_entries(masks), shard), lit(0L))
      .bitwiseAND(bit) =!= 0
}
