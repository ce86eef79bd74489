package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed marker for registry query functions whose CONSTRUCTION
  * legitimately fires Spark jobs — iterative fixpoints that
  * localCheckpoint each round (bounded plan depth beats laziness), and
  * model fits materialized once for multiple concurrent consumers
  * (lazy composition would re-train inside each broadcast subtree or
  * race a cold cache).
  *
  * LazinessSpec DISCOVERS this marker instead of reading a
  * hand-maintained name list: a new eager operator self-documents by
  * wrapping its registry function in `EagerByDesign("why")(fn)` — an
  * unmarked eager entry still fails the spec, and the exemption list
  * can no longer rot out of sync with the registry. The reason string
  * is mandatory and surfaced by the spec on demand. */
final class EagerByDesign(val reason: String,
    f: (SparkSession, String) => DataFrame)
    extends ((SparkSession, String) => DataFrame) {
  require(reason.trim.nonEmpty,
    "EagerByDesign requires a stated reason for construction-time jobs")
  override def apply(s: SparkSession, d: String): DataFrame = f(s, d)
}

object EagerByDesign {
  def apply(reason: String)(
      f: (SparkSession, String) => DataFrame): EagerByDesign =
    new EagerByDesign(reason, f)
}
