package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared 64-bit avalanche finalizer (MurmurHash3's fmix64) — the mixing
  * step of the MinHash permutation family and the band seeds. Public so
  * generated code can call it. */
object HashMix {
  final val Golden = 0x9e3779b97f4a7c15L

  def fmix64(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33
    v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33
    v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    v
  }

  /** Deterministic per-permutation seed: no JVM RNG, stable everywhere. */
  def permSeed(seed: Long, j: Int): Long = fmix64(seed + Golden * (j + 1))
}

/** MinHash signature over a document's shingle-hash array.
  *
  * Input: `array<long>` of (xx)hashed shingles; output: `array<long>` of
  * `numPerms` slots, slot j = min over shingles of fmix64(x ^ S_j) — the
  * standard xor-permute-mix family. Empty input → Long.MaxValue slots
  * (agrees with nothing).
  *
  * This is the O(perms × shingles) hot loop of MinHash-LSH dedup
  * (SURVEY.md §2.4 d6/d8), kept inside whole-stage codegen. The band →
  * bucket-join step on top of it is declarative (posexplode + self-join),
  * so the 100 TB shuffle key is the 8-byte band hash, never text.
  */
case class MinHashSig(child: Expression, numPerms: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  @transient private lazy val seeds: Array[Long] =
    Array.tabulate(numPerms)(j => HashMix.permSeed(seed, j))

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = Array.fill(numPerms)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val x = hs.getLong(i)
      var j = 0
      while (j < numPerms) {
        val v = HashMix.fmix64(x ^ seeds(j))
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val seedsRef = ctx.addReferenceObj("minhashSeeds", seeds, "long[]")
    val mix = classOf[HashMix.type].getName.stripSuffix("$") // graft...HashMix
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val x = ctx.freshName("x")
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      s"""
         |final int $n = $in.numElements();
         |final long[] $out = new long[$numPerms];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $x = $in.getLong($i);
         |  for (int $j = 0; $j < $numPerms; $j++) {
         |    final long $v = $mix.fmix64($x ^ $seedsRef[$j]);
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over a document's token-hash array: each hash votes
  * ±1 per bit position (frequency-weighted, since repeated tokens appear
  * repeatedly), sign of the tally becomes the fingerprint bit. Near-dup
  * detection is then hamming distance on 8-byte fingerprints — band the
  * 64 bits into 16-bit chunks for the LSH bucket join (SURVEY.md §2.4 d7).
  * Empty input → 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $in.numElements();
         |final int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $in.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += (((($h >>> $b) & 1L) == 1L) ? 1 : -1);
         |  }
         |}
         |long $acc = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $acc |= (1L << $b);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
