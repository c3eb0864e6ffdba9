package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Sorted distinct xxhash64 values of the word k-shingles of a
  * NORMALIZED (single-space-separated, trimmed) string — the input
  * representation of the whole near-dup family (d6 minhash, d7 simhash,
  * d18/d8 exact Jaccard, d20/s10 decontamination).
  *
  * Replaces the composed
  * `array_distinct(transform(sequence(...), i -> xxhash64(concat_ws(" ",
  * slice(tokens, i, k)))))` pipeline: Spark evaluates higher-order
  * lambdas interpreted and materializes every shingle STRING per row —
  * measured as the dominant cost of the r4 sf1 scaling run (the 8-gram
  * pass alone: ~20M shingle strings built and discarded per scan).
  *
  * Here a shingle is never materialized: in normalized text the k-word
  * shingle IS the byte range from token i's first byte to token
  * (i+k−1)'s last byte, so each hash is one XXH64 pass over that range
  * (seed 42 — Spark's `xxhash64` — so values are BIT-IDENTICAL to the
  * composed pipeline's, and every downstream artifact hash is
  * unchanged). Output is sorted ascending and duplicate-free, the
  * contract [[SortedIntersectCount]] expects.
  *
  * Docs shorter than k tokens yield the single hash of the whole
  * string, matching `slice`'s partial-shingle behavior.
  */
object Shingle {
  /** Sorted distinct window hashes (the set form — Jaccard family). */
  def hashes(s: UTF8String, k: Int): Array[Long] = {
    val hs = allHashes(s, k)
    java.util.Arrays.sort(hs)
    var out = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    if (out == hs.length) hs else java.util.Arrays.copyOf(hs, out)
  }

  /** Every window hash in document order, duplicates kept (the
    * multiset form — repetition statistics need per-gram counts). */
  def allHashes(s: UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes()
    // token boundaries = byte positions of the single 0x20 separators
    // (0x20 never occurs inside a UTF-8 multi-byte sequence)
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val nTokens = spaces + 1
    if (nTokens <= k) {
      return Array(XXH64.hashUnsafeBytes(base, off, len, 42L))
    }
    val starts = new Array[Int](nTokens)
    starts(0) = 0
    var t = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val m = nTokens - k + 1
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      val from = starts(i)
      // end of token i+k-1: byte before the next separator, or end of string
      val until = if (i + k < nTokens) starts(i + k) - 1 else len
      hs(i) = XXH64.hashUnsafeBytes(base, off + from, until - from, 42L)
      i += 1
    }
    hs
  }
}

/** `shingle_hashes(normalizedText, k)` (distinct = the sorted set form)
  * / `shingle_hashes_all(normalizedText, k)` (every window in document
  * order, duplicates kept — repetition stats count per-gram
  * occurrences) — see [[Shingle]]. Single-pass body invoked from
  * codegen via the standard eval bridge; everything downstream
  * (explode, joins, sorted-merge verify) stays codegen'd. */
case class ShingleHashes(child: Expression, k: Int, distinct: Boolean = true)
    extends UnaryExpression {
  require(k > 0, "shingle k must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String =
    if (distinct) "shingle_hashes" else "shingle_hashes_all"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    new GenericArrayData(
      if (distinct) Shingle.hashes(s, k) else Shingle.allHashes(s, k))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val cls = classOf[Shingle.type].getName.stripSuffix("$")
      val fn = if (distinct) "hashes" else "allHashes"
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.$fn($in, $k));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
