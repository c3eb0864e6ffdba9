package graft.functions

import graft.functions.expressions.FloatVecDot
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native Catalyst expressions in the session
  * `FunctionRegistry`, making them usable both from the Column API
  * (via `call_function`) and from `spark.sql(...)` strings
  * (SURVEY.md §2.5 "SQL registration").
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_dot" -> { args => FloatVecDot(args(0), args(1)) }
  )

  /** Idempotent per-session registration. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (registry.lookupFunctionBuilder(id).isEmpty) {
        registry.registerFunction(
          id,
          new ExpressionInfo(classOf[FloatVecDot].getName, name),
          builder)
      }
    }
  }
}
