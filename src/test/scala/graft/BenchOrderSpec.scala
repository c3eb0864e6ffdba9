package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench's proportional-degradation contract: a driver
  * deadline shortfall skips a contiguous TAIL of the pass-1 order, so
  * the order itself must guarantee (a) every SURVEY family is measured
  * within the first few entries and (b) any tail cut costs a MIX of
  * d- and s-entries, never a whole family (r10's contiguous q→e→d→s
  * order erased all 29 streaming entries in one draw). */
class BenchOrderSpec extends AnyFunSuite {

  private def names: Seq[(String, Unit)] = {
    val familyRank = Map('q' -> 0, 'e' -> 1, 'd' -> 2, 's' -> 3)
    SparkEntry.queries.keys.toSeq
      .sortBy(n => (familyRank.getOrElse(n.head, 4), n))
      .map(n => n -> ())
  }

  test("order is a permutation of the suite") {
    val ord = Bench.measurementOrder(names).map(_._1)
    assert(ord.sorted === names.map(_._1).sorted)
    assert(ord.distinct.length === ord.length)
  }

  test("every family is measured within the first 4 entries") {
    val ord = Bench.measurementOrder(names).map(_._1)
    assert(ord.take(4).map(_.head).toSet === Set('q', 'e', 'd', 's'))
  }

  test("no tail cut removes a whole family: every suffix that drops " +
      "at least one d-entry also keeps d-and-s mixed proportionally") {
    val ord = Bench.measurementOrder(names).map(_._1)
    val total = Map('d' -> ord.count(_.head == 'd'), 's' -> ord.count(_.head == 's'))
    // cut the tail at every possible deadline position; the surviving
    // prefix must retain >= floor(survivingShare) of each of d and s
    // (proportional within one interleave step)
    for (k <- 4 to ord.length) {
      val kept = ord.take(k)
      val keptD = kept.count(_.head == 'd').toDouble / total('d')
      val keptS = kept.count(_.head == 's').toDouble / total('s')
      assert(math.abs(keptD - keptS) <= 0.35,
        s"cut at $k: d-share $keptD vs s-share $keptS diverge — a " +
          s"shortfall would cost one family disproportionately")
    }
  }

  test("the q/e families precede the interleaved d/s tail (warm-order rationale)") {
    val ord = Bench.measurementOrder(names).map(_._1)
    val afterSampler = ord.drop(4)
    val firstDs = afterSampler.indexWhere(n => n.head == 'd' || n.head == 's')
    val qeAfterDs = afterSampler.drop(firstDs).exists(n => n.head == 'q' || n.head == 'e')
    assert(!qeAfterDs, "q/e entries must all run before the d/s interleave")
  }
}
