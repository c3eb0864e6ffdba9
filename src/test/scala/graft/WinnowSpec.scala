package graft

import graft.functions.expressions.Winnow
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Winnowing fingerprint properties (d14): determinism, the shared-
  * substring guarantee (Schleimer et al.: any common substring of length
  * >= k+w-1 produces at least one common fingerprint), and end-to-end
  * near-dup recall on real documents. */
class WinnowSpec extends SparkSpec {

  private val K = 16
  private val W = 8

  private def fp(s: String): Set[Long] =
    Winnow.fingerprints(UTF8String.fromString(s), K, W).toSet

  private def forSamples[A](gen: Gen[A], n: Int = 40)(f: A => Unit): Unit = {
    var seed = Seed(7L)
    val params = Gen.Parameters.default.withSize(60)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }

  private val genText: Gen[String] =
    Gen.listOf(Gen.frequency(8 -> Gen.alphaLowerChar, 2 -> Gen.const(' ')))
      .map(_.mkString)

  test("deterministic; empty yields none; short input yields one") {
    assert(fp("") === Set.empty)
    assert(fp("abc").size === 1)
    forSamples(genText) { s => assert(fp(s) === fp(s)) }
  }

  test("shared substring of length >= k+w-1 implies a shared fingerprint") {
    val shared = "the quick brown fox jumps over!" // 31 chars > k+w-1 = 23
    forSamples(Gen.zip(genText, genText)) { case (a, b) =>
      val da = a + shared + a.reverse
      val db = b.reverse + shared + b
      assert(fp(da).intersect(fp(db)).nonEmpty,
        s"no shared fingerprint between '$da' and '$db'")
    }
  }

  test("fingerprints are a small fraction of all k-grams (winnowing compresses)") {
    forSamples(genText.suchThat(_.length > 200), n = 15) { s =>
      val grams = s.length - K + 1
      // expected density ~ 2/(w+1); allow generous slack
      assert(fp(s).size <= grams / 2, s"selected ${fp(s).size} of $grams grams")
    }
  }

  test("d14 end-to-end: strong near-dups found, output sane (sf0.001)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = SparkEntry.queries("d14_winnow_fingerprint")(spark, Sf0001).collect()
    assert(rows.nonEmpty, "planted near-dups must share fingerprints")
    rows.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // near-identical documents (d8's verified jaccard>=0.8 pairs) must
    // share winnowed fingerprints too
    val strong = SparkEntry.queries("d8_ngram_jaccard")(spark, Sf0001)
      .filter($"jaccard" >= 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = strong -- got
    assert(missed.isEmpty, s"winnowing missed strong near-dups: $missed")
  }
}
