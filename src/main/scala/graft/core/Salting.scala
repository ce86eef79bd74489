package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-fanout treatment for equi-joins whose key has FEW distinct
  * values (cluster ids, hot categories): a plain shuffle join caps
  * parallelism at |distinct keys| tasks no matter how large the sides
  * are — the q100 lesson, where an 8-valued cid key ran 8 tasks and paid
  * 440 s until salted. The standard fix fans the key out: the LARGE side
  * takes one deterministic salt per row (hash of a unique column, so
  * replay and both join branches agree), the SMALL/replicated side
  * explodes across every salt, and the join runs on (key, salt) —
  * |keys|·|salts| cells, same logical output.
  *
  * Cost model: the replicated side grows |salts|×; use it for the side
  * whose rows are few or slim (probe sets, per-key aggregates), never
  * for the fact table. The salted output is exactly the unsalted join
  * (property-tested in Round13OpsSpec).
  */
object Salting {

  val DefaultSalts = 32

  /** Equi-join on `keys` with salt fanout: `large` rows are salted by
    * `xxhash64(uniqueCol)`, `replicated` rows explode across all
    * `salts`. Returns the joined frame with the salt column dropped —
    * column set identical to `large.join(replicated, keys)`. */
  def saltedJoin(large: DataFrame, replicated: DataFrame,
      keys: Seq[String], uniqueCol: String,
      salts: Int = DefaultSalts): DataFrame = {
    require(salts > 0, "salts must be positive")
    val l = large.withColumn("_salt",
      pmod(xxhash64(col(uniqueCol)), lit(salts)).cast("int"))
    val r = replicated.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "_salt").drop("_salt")
  }
}
