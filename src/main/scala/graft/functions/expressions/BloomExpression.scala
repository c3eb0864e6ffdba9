package graft.functions.expressions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Codegen Bloom-filter membership probe over a long column — the hot
  * scalar of the join-free decontamination gate (SURVEY.md §2.4 d62).
  *
  * The filter is carried as its serialized bytes (a constructor
  * parameter, so it ships inside the plan exactly once — NOT a per-row
  * child expression) and deserialized lazily once per JVM. Why an
  * Expression and not a Scala UDF: the UDF form boxes every gram to
  * `java.lang.Long`, wraps each result in an `Option`, and breaks the
  * whole-stage-codegen span around the one scan that is the operator's
  * entire cost model ("the gate is exactly one pass over the corpus").
  * Here the probe is a single virtual call fused into the generated
  * loop, with the shared `BloomFilter` hoisted into a plan reference.
  *
  * Thread safety: `BloomFilter.mightContainLong` only reads the bit
  * array, so one deserialized instance is safely shared by all of a
  * JVM's task threads.
  */
case class BloomContainsLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires bigint input, got $other")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
