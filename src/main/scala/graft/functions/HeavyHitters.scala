package graft.functions

import scala.collection.mutable

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
    extends Aggregator[String, mutable.HashMap[String, Long], Seq[TermCount]]
    with Serializable {
  require(capacity > 0 && k > 0 && k <= capacity,
    s"need 0 < k <= capacity, got k=$k capacity=$capacity")

  // The buffer is MUTATED IN PLACE: ObjectHashAggregate holds the
  // deserialized object between input rows, so reduce/merge run once per
  // token — rebuilding an immutable Map there allocated a fresh
  // `capacity`-entry map per input row (measured ~25% of q31's 20× wall
  // time in GC churn). In-place mutation is the documented contract for
  // typed Aggregator buffers; serialization only happens at the shuffle
  // boundary (Kryo, opaque bytes — the map never needs a SQL view).

  def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  def reduce(b: mutable.HashMap[String, Long],
      term: String): mutable.HashMap[String, Long] = {
    b.get(term) match {
      case Some(c) => b.update(term, c + 1)
      case None if b.size < capacity => b.update(term, 1L)
      // Counters full and term absent: the classic decrement-all step —
      // every counter pays 1, zeros evicted, the arriving term is dropped.
      case None =>
        b.mapValuesInPlace((_, c) => c - 1)
        b.filterInPlace((_, c) => c > 0)
    }
    b
  }

  def merge(a: mutable.HashMap[String, Long],
      b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    // fold the smaller map into the larger; both are aggregation-owned,
    // so mutating either (and returning it) is safe
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    small.foreach { case (t, c) => big.update(t, big.getOrElse(t, 0L) + c) }
    if (big.size > capacity) {
      // (capacity+1)-th largest count is the uniform offset that restores
      // the size bound while keeping the composed error ≤ N/(capacity+1).
      val counts = big.valuesIterator.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - 1 - capacity)
      big.mapValuesInPlace((_, c) => c - cut)
      big.filterInPlace((_, c) => c > 0)
    }
    big
  }

  def finish(b: mutable.HashMap[String, Long]): Seq[TermCount] =
    b.toSeq.map { case (t, c) => TermCount(t, c) }
      .sortBy(tc => (-tc.n, tc.term)).take(k)

  def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  def outputEncoder: Encoder[Seq[TermCount]] =
    ExpressionEncoder[Seq[TermCount]]()
}
