package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

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

  test("property: for ANY suite composition, the order is a permutation, " +
      "every present family is sampled within the first |families| entries, " +
      "and no proper prefix loses a whole present family once past the sampler") {
    val famGen = Gen.oneOf('q', 'e', 'd', 's')
    val suiteGen = for {
      n <- Gen.choose(1, 120)
      fams <- Gen.listOfN(n, famGen)
    } yield fams.zipWithIndex.map { case (f, i) => s"$f${i}_x" -> () }
    // raw scalacheck (the repo's pattern — scalatestplus isn't on the
    // offline classpath): deterministic seeds, explicit sampling
    (1 to 200).foreach { i =>
      val suite = suiteGen(org.scalacheck.Gen.Parameters.default,
        Seed(i.toLong)).getOrElse(List("q0_x" -> ()))
      val familyRank = Map('q' -> 0, 'e' -> 1, 'd' -> 2, 's' -> 3)
      val byName = suite.sortBy { case (nm, _) =>
        (familyRank.getOrElse(nm.head, 4), nm)
      }
      val ord = Bench.measurementOrder(byName).map(_._1)
      assert(ord.sorted === suite.map(_._1).sorted,
        s"seed $i: not a permutation")                     // permutation
      val fams = suite.map(_._1.head).toSet
      assert(ord.take(fams.size).map(_.head).toSet === fams,
        s"seed $i: sampler missed a family")               // sampler
      // past the sampler, every prefix keeps >=1 of each present family
      for (k <- fams.size to ord.length) {
        assert(ord.take(k).map(_.head).toSet === fams,
          s"seed $i: prefix of $k lost a family")
      }
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
