package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
  * SIGMOD'03): rolling-hash every k-char gram, slide a window of w
  * hashes, keep the rightmost minimum per window — the classic
  * substring-robust fingerprint set with the guarantee that any shared
  * substring of length >= k+w-1 between two documents yields at least
  * one shared fingerprint.
  *
  * Output: sorted distinct selected hashes (`array<long>`), so
  * fingerprint overlap is a plain array_intersect / explode-join —
  * shuffle keys are 8-byte hashes, never text. NON-EMPTY input shorter
  * than k chars yields a single hash of the whole string; the empty
  * string yields no fingerprints (WinnowSpec pins both).
  */
object Winnow {
  final val Base = 1000003L // polynomial rolling base (odd, > alphabet)

  def fingerprints(s: UTF8String, k: Int, w: Int): Array[Long] = {
    val str = s.toString
    val n = str.length
    if (n == 0) return Array.empty[Long]
    if (n < k) return Array(HashMix.fmix64(rawHash(str, 0, n)))
    val m = n - k + 1 // number of k-grams
    val hs = new Array[Long](m)
    // rolling polynomial hash over chars, finalized through fmix64
    var h = 0L
    var pow = 1L
    var i = 0
    while (i < k) { h = h * Base + str.charAt(i); if (i < k - 1) pow *= Base; i += 1 }
    hs(0) = HashMix.fmix64(h)
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * pow) * Base + str.charAt(i + k - 1)
      hs(i) = HashMix.fmix64(h)
      i += 1
    }
    // winnow: rightmost minimum of each window of w hashes
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var min = hs(0); var j = 1
      while (j < m) { if (hs(j) <= min) min = hs(j); j += 1 }
      selected.add(min)
    } else {
      var start = 0
      while (start + w <= m) {
        var min = hs(start); var idx = start; var j = start + 1
        while (j < start + w) { if (hs(j) <= min) { min = hs(j); idx = j }; j += 1 }
        selected.add(hs(idx))
        start += 1
      }
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    out
  }

  private def rawHash(s: String, from: Int, until: Int): Long = {
    var h = 0L
    var i = from
    while (i < until) { h = h * Base + s.charAt(i); i += 1 }
    h
  }
}

/** `winnow(text, k, w)` — see [[Winnow]]. Non-codegen body (string +
  * TreeSet logic), but a single pass per row invoked from codegen via
  * the standard eval bridge; the heavy downstream ops (explode, joins)
  * stay fully codegen'd. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k > 0 && w > 0, "winnow k and w must be positive")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string input, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(Winnow.fingerprints(input.asInstanceOf[UTF8String], k, w))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val cls = classOf[Winnow.type].getName.stripSuffix("$")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  $cls.fingerprints($in, $k, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
