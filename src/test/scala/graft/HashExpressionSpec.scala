package graft

import graft.functions.expressions.{HashMix, MinHashSig, SimHash64}
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Exact invariants of the MinHash/SimHash expression family, checked on
  * both the interpreted (nullSafeEval) and codegen (DataFrame) paths.
  * Property sampling is seeded (no scalatestplus bridge in the offline
  * cache), so runs are fully deterministic. */
class HashExpressionSpec extends SparkSpec {

  /** Deterministic property driver over a scalacheck Gen. */
  private def forSamples[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    val params = Gen.Parameters.default.withSize(30)
    (0 until n).foreach { _ =>
      gen.apply(params, seed).foreach(f)
      seed = seed.next
    }
  }
  private def forSamples2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forSamples(Gen.zip(ga, gb))(t => f(t._1, t._2))

  private val sigExpr = MinHashSig(BoundReference(0, ArrayType(LongType), nullable = false), 64, 42L)

  private def sig(xs: Seq[Long]): Seq[Long] =
    sigExpr.nullSafeEval(new GenericArrayData(xs.toArray))
      .asInstanceOf[ArrayData].toLongArray().toSeq

  private val genHashes: Gen[List[Long]] = Gen.listOf(Gen.long)

  test("minhash signature has numPerms slots; empty set = all MaxValue") {
    assert(sig(Nil) === Seq.fill(64)(Long.MaxValue))
    assert(sig(Seq(1L, 2L, 3L)).length === 64)
  }

  test("minhash is a set function: order and duplicates don't matter") {
    forSamples(genHashes) { xs =>
      assert(sig(xs.reverse) === sig(xs))
      assert(sig(xs ++ xs) === sig(xs))
    }
  }

  test("minhash slots are monotone non-increasing under union") {
    forSamples2(genHashes, genHashes) { (xs, ys) =>
      val su = sig(xs ++ ys)
      assert(sig(xs).zip(su).forall { case (a, u) => u <= a })
    }
  }

  test("identical sets agree on every slot; disjoint random sets mostly differ") {
    val a = (1L to 50L).map(x => HashMix.fmix64(x))
    val b = (1000L to 1049L).map(x => HashMix.fmix64(x))
    assert(sig(a) === sig(a))
    val agree = sig(a).zip(sig(b)).count { case (x, y) => x == y }
    assert(agree < 10, s"disjoint sets agreed on $agree/64 slots")
  }

  test("minhash agreement tracks jaccard (deterministic fixture)") {
    // |A∩B| = 80 of |A∪B| = 120 → j = 2/3; expect agreement within ±0.2.
    val common = (1L to 80L).map(HashMix.fmix64)
    val a = common ++ (10000L to 10019L).map(HashMix.fmix64)
    val b = common ++ (20000L to 20019L).map(HashMix.fmix64)
    val agree = sig(a).zip(sig(b)).count { case (x, y) => x == y } / 64.0
    assert(math.abs(agree - 2.0 / 3.0) < 0.2, s"agreement $agree vs jaccard 0.667")
  }

  test("simhash: deterministic, empty input is 0, single hash is itself's sign pattern") {
    val e = SimHash64(BoundReference(0, ArrayType(LongType), nullable = false))
    def sh(xs: Seq[Long]): Long =
      e.nullSafeEval(new GenericArrayData(xs.toArray)).asInstanceOf[Long]
    assert(sh(Nil) === 0L)
    forSamples(genHashes) { xs => assert(sh(xs) === sh(xs)) }
    // a single feature's simhash is the feature's own bit pattern
    forSamples(Gen.long) { x => assert(sh(Seq(x)) === x) }
  }

  test("codegen path (DataFrame) agrees with interpreted eval") {
    import spark.implicits._
    val rows = Seq(
      Seq(1L, 2L, 3L), Seq.empty[Long], (1L to 100L).toSeq,
      Seq(-5L, Long.MinValue, Long.MaxValue))
    val df = rows.toDF("hs").select(
      call_function("minhash_sig", $"hs", lit(64), lit(42L)).as("sig"),
      call_function("simhash64", $"hs").as("sim"))
    val got = df.collect()
    rows.zip(got).foreach { case (xs, row) =>
      assert(row.getSeq[Long](0) === sig(xs))
      val simE = SimHash64(BoundReference(0, ArrayType(LongType), nullable = false))
        .nullSafeEval(new GenericArrayData(xs.toArray))
      assert(row.getLong(1) === simE)
    }
  }

  test("shingle_hashes is bit-identical to the composed HOF pipeline, sorted distinct") {
    import spark.implicits._
    import graft.functions.Text
    // value identity is the load-bearing property: every near-dup
    // artifact hash (d6/d7/d8/d18/d20) must be unchanged by swapping in
    // the native expression. Fixtures cover: normal text, duplicates
    // (identical shingles), doc shorter than k, single word, messy
    // whitespace (normalize runs inside both paths), multi-byte UTF-8.
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b a b a b a b",
      "one two",
      "word",
      "  spaced   out\ttext\nhere  ",
      "héllo wörld häufig wörld häufig wörld")
    for (k <- Seq(2, 3, 8)) {
      val df = docs.toDF("text").select(
        Text.shingleHashes($"text", k).as("fast"),
        array_sort(Text.hashed(Text.wordShingles($"text", k))).as("ref"))
      df.collect().zip(docs).foreach { case (r, d) =>
        val fast = r.getSeq[Long](0)
        assert(fast === r.getSeq[Long](1), s"mismatch for k=$k doc='$d'")
        assert(fast === fast.sorted && fast.distinct === fast,
          s"not sorted-distinct for k=$k doc='$d'")
      }
    }
    // the multiset form must equal the composed per-window pipeline
    // d22 used (order and duplicates preserved)
    for (k <- Seq(2, 3)) {
      val df2 = docs.toDF("text").select(
        Text.shingleHashesAll($"text", k).as("fast"),
        transform(
          sequence(lit(0), greatest(size(Text.tokens($"text")) - k, lit(0))),
          i => xxhash64(concat_ws(" ", slice(Text.tokens($"text"), i + 1, lit(k))))
        ).as("ref"))
      df2.collect().zip(docs).foreach { case (r, d) =>
        assert(r.getSeq[Long](0) === r.getSeq[Long](1),
          s"multiset mismatch for k=$k doc='$d'")
      }
    }
    // sorted_intersect_count on two shingle sets == array_intersect size
    val pair = Seq(("x y z w v", "x y z q r")).toDF("a", "b").select(
      call_function("sorted_intersect_count",
        Text.shingleHashes($"a", 2), Text.shingleHashes($"b", 2)).as("c"),
      size(array_intersect(
        Text.hashed(Text.wordShingles($"a", 2)),
        Text.hashed(Text.wordShingles($"b", 2)))).as("ref")).head()
    assert(pair.getLong(0) === pair.getInt(1).toLong)
  }

  test("vec_dot algebra: commutative, distributes over concatenated segments") {
    import spark.implicits._
    val gen = Gen.zip(
      Gen.listOfN(16, Gen.chooseNum(-100f, 100f)),
      Gen.listOfN(16, Gen.chooseNum(-100f, 100f)))
    val cases = {
      var seed = Seed(11L)
      val params = Gen.Parameters.default
      (0 until 25).flatMap { _ =>
        val r = gen.apply(params, seed); seed = seed.next; r
      }
    }
    val df = cases.map { case (a, b) => (a.toArray, b.toArray) }.toDF("a", "b")
      .select(
        call_function("vec_dot", $"a", $"b").as("ab"),
        call_function("vec_dot", $"b", $"a").as("ba"),
        (call_function("vec_dot", slice($"a", 1, 8), slice($"b", 1, 8)) +
          call_function("vec_dot", slice($"a", 9, 8), slice($"b", 9, 8))).as("split"))
    df.collect().foreach { r =>
      assert(r.getDouble(0) === r.getDouble(1), "dot must be commutative")
      // segment sums re-associate: equal within 1 ulp-ish tolerance
      assert(math.abs(r.getDouble(0) - r.getDouble(2)) <= 1e-9 * math.max(1.0, math.abs(r.getDouble(0))))
    }
  }

  test("vec_dot matches reference fold; mismatched dimensions fail loudly") {
    import spark.implicits._
    val ok = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array.empty[Float], Array.empty[Float]))
      .toDF("a", "b")
      .select(call_function("vec_dot", $"a", $"b").as("d"))
    assert(ok.collect().map(_.getDouble(0)).toSeq === Seq(32.0, 0.0))
    // silent truncation would turn schema drift into plausible-looking
    // partial dot products — the expression must throw instead
    val bad = Seq((Array(0.5f), Array(0.25f, 9.0f))).toDF("a", "b")
      .select(call_function("vec_dot", $"a", $"b"))
    val e = intercept[Exception] { bad.collect() }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(chain(e).exists(c =>
      Option(c.getMessage).exists(_.contains("mismatched vector dimensions"))))
  }
}
