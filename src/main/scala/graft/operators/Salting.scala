package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for hot keys — the complement to AQE's runtime
  * skew-join splitting (which only fires inside sort-merge joins; see
  * SkewSpec for that path).
  *
  * Aggregation: a hot grouping key funnels its entire group through one
  * reducer. Salting splits each key into `nSalts` sub-keys for a partial
  * aggregate, then reduces the (tiny) per-salt partials — the classic
  * two-phase combine, made explicit so the first shuffle spreads the hot
  * key over `nSalts` reducers.
  *
  * Join: the skewed (fact) side gets a random salt in [0, nSalts); the
  * small side is exploded `nSalts`× with every salt value so each salted
  * fact row still finds its match. Correct for inner/left joins on the
  * fact side; the small side must tolerate the fan-out (it is the
  * broadcast-sized one).
  */
object Salting {
  /** Salted sum/count aggregation: `df.groupBy(key).agg(sum(value))` with
    * the hot-key shuffle spread over `nSalts` reducers. */
  def saltedGroupSum(df: DataFrame, key: String, value: String,
      nSalts: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(value)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum(col("_psum")).as(s"sum_$value"), sum(col("_pcnt")).as("cnt"))

  /** Salted equi-join: spread `fact`'s hot join keys over `nSalts` copies
    * of the matching `small` rows. Join condition becomes
    * (key, salt) = (key, salt).
    *
    * Only fact-side-preserving join types are legal: the small side is
    * exploded `nSalts`×, so right/full-outer (and right-semi/anti) would
    * emit every unmatched small row `nSalts` times. */
  def saltedJoin(fact: DataFrame, small: DataFrame, factKey: String,
      smallKey: String, nSalts: Int = 16, joinType: String = "inner"): DataFrame = {
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin supports inner/left/left_semi/left_anti, got '$joinType': " +
        "the exploded small side would duplicate unmatched right-side rows")
    val salted = fact.withColumn("_salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts)))
    val exploded = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(nSalts - 1L))))
    salted.join(exploded,
      salted(factKey) === exploded(smallKey) && salted("_salt") === exploded("_salt"),
      joinType)
      .drop("_salt")
  }

  /** The salt expression used above, exposed for reuse: cheap, uniform
    * enough, and deterministic per (partition, row-in-partition) — no
    * rand() so re-computation under task retry yields the same salt. */
  def saltExpr(nSalts: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(nSalts))
}
