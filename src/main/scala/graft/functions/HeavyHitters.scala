package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One reported heavy hitter: `n` is the sketch's count for `term` — a
  * lower bound on the true frequency, exact when the sketch never
  * overflowed its capacity. */
case class TermCount(term: String, n: Long)

/** Misra–Gries heavy-hitters sketch as a typed UDAF (SURVEY.md §2b UDAF
  * inventory; the frequent-items counterpart to q18's HyperLogLog and
  * q27's percentile_approx).
  *
  * Why a sketch: exact top-k term counting shuffles the full distinct-term
  * set (`q25_top_terms` — the right call when the vocabulary is small).
  * At crawl scale the term universe is billions; Misra–Gries holds at most
  * `capacity` counters per partial aggregate — fixed memory regardless of
  * input size — and guarantees that every term with true frequency
  * > N/(capacity+1) survives, with reported counts undercounting by at
  * most N/(capacity+1) (Misra & Gries 1982, "Finding repeated elements").
  *
  * Merge follows Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * pointwise-sum the counter maps, and if more than `capacity` counters
  * remain, subtract the (capacity+1)-th largest count from all and drop
  * the non-positives — the error bound composes across arbitrary merge
  * trees, which is what makes the sketch safe under Spark's
  * nondeterministic partial-aggregate merge order.
  *
  * When `capacity` ≥ the number of distinct terms, no decrement ever
  * fires and the counts are exact — the property the DuckDB oracle
  * exploits (fixture vocabulary is 31 terms; q31 runs with capacity 64).
  * The error bound under pressure is property-tested in SketchSpec.
  */
class MisraGries(capacity: Int, k: Int)
    extends Aggregator[String, Map[String, Long], Seq[TermCount]]
    with Serializable {
  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  def zero: Map[String, Long] = Map.empty

  def reduce(b: Map[String, Long], term: String): Map[String, Long] =
    b.get(term) match {
      case Some(c) => b.updated(term, c + 1)
      case None if b.size < capacity => b.updated(term, 1L)
      // Counters full and term absent: the classic decrement-all step —
      // every counter pays 1, zeros evicted, the arriving term is dropped.
      case None => b.collect { case (t, c) if c > 1 => t -> (c - 1) }
    }

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (t, c)) =>
      m.updated(t, m.getOrElse(t, 0L) + c)
    }
    if (summed.size <= capacity) summed
    else {
      // (capacity+1)-th largest count is the uniform offset that restores
      // the size bound while keeping the composed error ≤ N/(capacity+1).
      val cut = summed.valuesIterator.toArray.sortBy(-_).apply(capacity)
      summed.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  def finish(b: Map[String, Long]): Seq[TermCount] =
    b.toSeq.map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.n, tc.term)).take(k)

  def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
}
