package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.shardsim.ShardPlanner

/** Property tests of the shard→slot planner — direct ports of the
  * reference's only test suite (assignment-planner properties,
  * reference test/Kinesis/CoordinationTests.hs:32-67): coverage of slots
  * and shards, balance max−min<2, idempotence, and churn safety. */
class ShardPlannerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val genSlots = Gen.chooseNum(1, 12).map(n => (0 until n).toList)
  private val genShards = Gen.chooseNum(0, 60)
    .map(n => (0 until n).map(i => s"shard-$i").toList)
  private val genCase = for {
    slots <- genSlots
    shards <- genShards
    // a prior assignment over possibly-different slots/shards (churn)
    priorSlots <- genSlots
    priorShards <- genShards
  } yield (slots, shards, ShardPlanner.assign(priorSlots, priorShards, Map.empty))

  private def loads(a: Map[Int, Seq[String]]): Seq[Int] = a.values.map(_.size).toSeq

  test("every slot appears; every shard exactly once") {
    check(Prop.forAll(genCase) { case (slots, shards, prior) =>
      val a = ShardPlanner.assign(slots, shards, prior)
      a.keySet == slots.toSet &&
        a.values.flatten.toList.sorted == shards.sorted
    })
  }

  test("balance invariant max-min < 2 (reference Coordination.hs:520)") {
    check(Prop.forAll(genCase) { case (slots, shards, prior) =>
      val a = ShardPlanner.assign(slots, shards, prior)
      val ls = loads(a)
      ls.isEmpty || ls.max - ls.min < 2
    })
  }

  test("idempotent: re-planning a balanced assignment changes nothing") {
    check(Prop.forAll(genCase) { case (slots, shards, prior) =>
      val a = ShardPlanner.assign(slots, shards, prior)
      ShardPlanner.assign(slots, shards, a) == a
    })
  }

  test("sticky: shards keep their slot when the cluster is stable") {
    check(Prop.forAll(genSlots, genShards) { (slots, shards) =>
      val a = ShardPlanner.assign(slots, shards, Map.empty)
      // add one shard: at most one slot's existing shards may change
      val a2 = ShardPlanner.assign(slots, shards :+ "shard-new", a)
      val moved = shards.count { sh =>
        val before = a.find(_._2.contains(sh)).map(_._1)
        val after = a2.find(_._2.contains(sh)).map(_._1)
        before != after
      }
      moved == 0 // one new shard never displaces an existing one
    })
  }

  test("churn: removing a slot redistributes only that slot's shards") {
    check(Prop.forAll(genCase) { case (slots, shards, prior) =>
      slots.size < 2 || {
        val a = ShardPlanner.assign(slots, shards, Map.empty)
        val dropped = slots.last
        val remaining = slots.init
        val a2 = ShardPlanner.assign(remaining, shards, a)
        // shards that were NOT on the dropped slot stay put unless the
        // rebalance had to move them (bounded by the dropped slot's load)
        val movedSurvivors = shards.count { sh =>
          val before = a.find(_._2.contains(sh)).map(_._1)
          val after = a2.find(_._2.contains(sh)).map(_._1)
          before.exists(_ != dropped) && before != after
        }
        movedSurvivors <= a(dropped).size + 1
      }
    })
  }
}
