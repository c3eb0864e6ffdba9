package graft.functions

import graft.functions.expressions.{BloomContainsLong, FloatVecDot, MinHashSig, PqAssignCodes, ShingleHashes, SimHash64, SortedIntersectCount, WinnowFingerprints}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, LongType}

/** Registration of graft's native Catalyst expressions in the session
  * `FunctionRegistry`, making them usable both from the Column API
  * (via `call_function`) and from `spark.sql(...)` strings
  * (SURVEY.md §2.5 "SQL registration").
  */
object GraftFunctions {

  private def litInt(e: Expression, arg: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be an integer literal, got $other")
  }
  private def litLong(e: Expression, arg: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$arg must be a long literal, got $other")
  }
  private def litBinary(e: Expression, arg: String): Array[Byte] = e match {
    case Literal(v: Array[Byte], BinaryType) => v
    case other => throw new IllegalArgumentException(
      s"$arg must be a binary literal, got $other")
  }
  private def litLongArray(e: Expression, arg: String): Seq[Long] = e match {
    case Literal(v: ArrayData, ArrayType(LongType, _)) => v.toLongArray().toSeq
    case other => throw new IllegalArgumentException(
      s"$arg must be an array<bigint> literal, got $other")
  }

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => FloatVecDot(args(0), args(1)) },
    // minhash_sig(hashes, numPerms, seed) — perms/seed must be literals.
    "minhash_sig" -> { args =>
      MinHashSig(args(0), litInt(args(1), "numPerms"), litLong(args(2), "seed")) },
    "simhash64" -> { args => SimHash64(args(0)) },
    // winnow(text, k, w) — k/w must be literals.
    "winnow" -> { args =>
      WinnowFingerprints(args(0), litInt(args(1), "k"), litInt(args(2), "w")) },
    "sorted_intersect_count" -> { args => SortedIntersectCount(args(0), args(1)) },
    // shingle_hashes(normalizedText, k) — k must be a literal.
    "shingle_hashes" -> { args => ShingleHashes(args(0), litInt(args(1), "k")) },
    "shingle_hashes_all" -> { args =>
      ShingleHashes(args(0), litInt(args(1), "k"), distinct = false) },
    // bloom_contains_long(value, serializedFilter) — filter a literal;
    // the bytes ride the plan once, deserialized lazily per JVM.
    "bloom_contains_long" -> { args =>
      BloomContainsLong(args(0), litBinary(args(1), "filter")) },
    // pq_codes(latticeVec, flatCodebook, m, k) — codebook/m/k literals.
    "pq_codes" -> { args =>
      PqAssignCodes(args(0), litLongArray(args(1), "flatCb"),
        litInt(args(2), "m"), litInt(args(3), "k")) },
    // mg_sketch(token) — the Misra-Gries Aggregator as a SQL aggregate
    // (d55's capacity); an AggregateFunction from a registry builder is
    // wrapped into its AggregateExpression by the analyzer, so the same
    // triple serves sessions (register) and clusters (GraftExtensions).
    "mg_sketch" -> { args =>
      org.apache.spark.sql.execution.aggregate.ScalaAggregator(
        args, new graft.operators.HeavyHitters.MisraGries(31),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String](),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]](),
        aggregatorName = Some("mg_sketch")) }
  )

  private val exprClass: Map[String, String] = Map(
    "vec_dot" -> classOf[FloatVecDot].getName,
    "minhash_sig" -> classOf[MinHashSig].getName,
    "simhash64" -> classOf[SimHash64].getName,
    "winnow" -> classOf[WinnowFingerprints].getName,
    "sorted_intersect_count" -> classOf[SortedIntersectCount].getName,
    "shingle_hashes" -> classOf[ShingleHashes].getName,
    "shingle_hashes_all" -> classOf[ShingleHashes].getName,
    "bloom_contains_long" -> classOf[BloomContainsLong].getName,
    "pq_codes" -> classOf[PqAssignCodes].getName,
    "mg_sketch" -> classOf[org.apache.spark.sql.execution.aggregate.ScalaAggregator[_, _, _]].getName)

  /** (identifier, info, builder) triples — the shape both the session
    * FunctionRegistry and SparkSessionExtensions.injectFunction take. */
  def registrations: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    builders.map { case (name, builder) =>
      (FunctionIdentifier(name), new ExpressionInfo(exprClass(name), name), builder)
    }

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registrations.foreach { case (id, info, builder) =>
      if (registry.lookupFunctionBuilder(id).isEmpty) {
        registry.registerFunction(id, info, builder)
      }
    }
  }
}
