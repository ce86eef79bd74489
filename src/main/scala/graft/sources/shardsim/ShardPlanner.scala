package graft.sources.shardsim

import scala.collection.immutable.SortedMap

/** Pure shard→slot assignment planner for the shardsim source.
  *
  * Re-expresses the reference's partition-assignment semantics
  * (`assign`, reference src/Kinesis/Coordination.hs:474-509, and
  * `balanceAssignments`, src/Kinesis/Coordination.hs:513-533) for
  * grouping stream shards into Spark input partitions:
  *
  *  - assignments to vanished slots / of vanished shards are dropped;
  *  - surviving assignments are *sticky* (minimally disturbed) — a shard
  *    stays where it was so per-shard reader state/caches stay warm;
  *  - new/orphaned shards go to the least-loaded slot;
  *  - greedy rebalance moves one shard at a time from the most- to the
  *    least-loaded slot until `max − min < 2` (the reference's invariant,
  *    src/Kinesis/Coordination.hs:520).
  *
  * Deterministic: ties broken by slot/shard ordering. Idempotent: a
  * balanced assignment is returned unchanged.
  */
object ShardPlanner {

  def assign(
      slots: Seq[Int],
      shards: Seq[String],
      prior: Map[Int, Seq[String]]): Map[Int, Seq[String]] = {
    if (slots.isEmpty) return Map.empty
    val shardSet = shards.toSet

    // 1. keep surviving assignments; first slot (in slot order) wins if a
    //    shard was somehow assigned twice
    var seen = Set.empty[String]
    var acc: SortedMap[Int, Vector[String]] = SortedMap.empty
    slots.sorted.foreach { slot =>
      val keep = prior.getOrElse(slot, Seq.empty)
        .filter(sh => shardSet.contains(sh) && !seen.contains(sh)).toVector
      seen ++= keep
      acc = acc.updated(slot, keep)
    }

    // 2. new / orphaned shards → least-loaded slot
    val newShards = shards.filterNot(seen.contains).sorted
    newShards.foreach { sh =>
      val target = acc.minBy { case (slot, ss) => (ss.size, slot) }._1
      acc = acc.updated(target, acc(target) :+ sh)
    }

    // 3. greedy rebalance until max − min < 2
    var done = false
    while (!done) {
      val (maxSlot, maxLoad) = acc.maxBy { case (slot, ss) => (ss.size, -slot) } match {
        case (sl, ss) => (sl, ss.size)
      }
      val (minSlot, minLoad) = acc.minBy { case (slot, ss) => (ss.size, slot) } match {
        case (sl, ss) => (sl, ss.size)
      }
      if (maxLoad - minLoad < 2) done = true
      else {
        val moved = acc(maxSlot).last
        acc = acc
          .updated(maxSlot, acc(maxSlot).init)
          .updated(minSlot, acc(minSlot) :+ moved)
      }
    }
    acc
  }
}
