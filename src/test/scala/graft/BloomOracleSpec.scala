package graft

import java.io.ByteArrayOutputStream

import org.apache.spark.util.sketch.BloomFilter
import org.scalatest.funsuite.AnyFunSuite

/** Pins the decontamination oracle's Bloom replay to the filter Spark
  * actually builds (the r12 lesson): the d62/s23 oracle re-derives the
  * filter's bit positions in DuckDB, and that replica is only as good
  * as its scatter scheme. Spark 4 ships BloomFilterImplV2 (64-bit
  * combine, hi·Integer.MAX_VALUE + i·lo) while the r8 replica replayed
  * V1's int32 combine — and EVERY sf0.01 draw passed anyway, because
  * true members hit under either scheme and only FALSE POSITIVES
  * exercise the scatter math; the first FP appeared at sf1 and split
  * the two sides (d62: 6 rows vs 2). This spec replays the ORACLE's
  * exact arithmetic in Scala against live filters, on distributions
  * where both halves of the contract bite:
  *  - true members (insertion parity: every replayed position must be
  *    a really-set bit — 7 positions x thousands of members),
  *  - an overloaded filter (~65% FP rate, so the probe-side flip /
  *    modulo / sign edges are exercised on both outcomes).
  * It also pins the serialized header to version 2 / seed 0: a Spark
  * upgrade that bumps the scheme fails HERE, not silently at sf1. */
class BloomOracleSpec extends AnyFunSuite {

  private def parse(bf: BloomFilter): (Int, Int, Int, Array[Long]) = {
    val bos = new ByteArrayOutputStream(); bf.writeTo(bos)
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    val version = in.readInt()
    val k = in.readInt()
    val seed = in.readInt()
    val words = Array.fill(in.readInt())(in.readLong())
    (version, k, seed, words)
  }

  /** The oracle's position sequence (OracleHash.bloomPositionsCte),
    * arithmetic-for-arithmetic: hi = hashLong(g, seed),
    * lo = hashLong(g, hi), pos_i = flip64(hi·2147483647 + i·lo) mod
    * bitSize with hi/lo sign-extended. */
  private def oraclePositions(g: Long, seed: Int, k: Int,
                              bitSize: Long): Seq[Long] = {
    val hi = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(g, seed)
    val lo = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(g, hi)
    (1 to k).map { i =>
      val acc = hi.toLong * 2147483647L + i.toLong * lo.toLong
      val c = if (acc < 0) acc ^ -1L else acc
      c % bitSize
    }
  }

  private def replicaContains(g: Long, seed: Int, k: Int,
                              words: Array[Long]): Boolean = {
    val bitSize = words.length.toLong * 64
    oraclePositions(g, seed, k, bitSize).forall { pos =>
      (words((pos >> 6).toInt) >> (pos & 63) & 1L) == 1L
    }
  }

  test("serialized filter is the V2 scheme the oracle replays (version 2, seed 0)") {
    val bf = BloomFilter.create(10000, 0.01)
    val (version, k, seed, words) = parse(bf)
    assert(version === 2,
      "BloomFilter.create no longer builds V2 — the DuckDB replay in " +
        "OracleHash.bloomPositionsCte must be re-derived for the new scheme")
    assert(seed === 0)
    assert(k === 7 && words.length === 1498,
      "sizing drifted from the cross-checked (10000, 0.01) constants")
  }

  test("insertion parity: every inserted long reads back through the " +
      "oracle's replayed positions") {
    val rnd = new scala.util.Random(4242)
    val bf = BloomFilter.create(10000, 0.01)
    val items = Array.fill(2000)(rnd.nextLong())
    items.foreach(bf.putLong)
    val (_, k, seed, words) = parse(bf)
    items.foreach { g =>
      assert(bf.mightContainLong(g), "bloom false negative (impossible)")
      assert(replicaContains(g, seed, k, words),
        s"replica misses inserted item $g — replayed positions differ " +
          "from the filter's real scatter")
    }
  }

  test("false-positive parity: on an overloaded filter the replica agrees " +
      "with mightContainLong on every probe, FPs included") {
    val rnd = new scala.util.Random(77)
    val bf = BloomFilter.create(10000, 0.01)
    (1 to 40000).foreach(_ => bf.putLong(rnd.nextLong()))
    val (_, k, seed, words) = parse(bf)
    var fps = 0
    (1 to 5000).foreach { _ =>
      val g = rnd.nextLong() // fresh draws: members-by-chance negligible
      val real = bf.mightContainLong(g)
      if (real) fps += 1
      assert(replicaContains(g, seed, k, words) === real,
        s"replica disagrees with the live filter on $g (real=$real)")
    }
    // the whole point: this distribution actually exercises FPs
    assert(fps > 1000, s"expected a dense-FP regime, got $fps/5000")
  }
}
