package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, backed by the
  * native codegen'd expressions in [[graft.functions.expressions]]
  * (registered per session by [[GraftFunctions.register]]). Accumulation
  * is a sequential index-ascending fold in double — the same order
  * DuckDB's list_sum uses — so oracle comparisons agree to the last ulp.
  */
object Vectors {

  /** Dot product of two float-array columns, accumulated in double.
    * Resolves to [[expressions.FloatVecDot]]: one fused codegen loop,
    * no per-row array materialization (the r1 HOF version made d9 the
    * bench hotspot at 170 s / sf0.1).
    *
    * Self-registering: `call_function` needs `vec_dot` in the session
    * FunctionRegistry, and a standalone user of the operators package
    * (no Tables.load, no test base class) would otherwise hit
    * "undefined function" at analysis — so make the idempotent
    * registration here, on whatever session is active on this thread. */
  def dot(a: Column, b: Column): Column = {
    SparkSession.getActiveSession.foreach(GraftFunctions.register)
    call_function("vec_dot", a, b)
  }

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity (not defensive against zero vectors — embeddings
    * are unit-ish; a zero vector yields NaN on both engines alike). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Cosine given precomputed norms (avoids recomputing per join pair). */
  def cosineWithNorms(a: Column, b: Column, na: Column, nb: Column): Column =
    dot(a, b) / (na * nb)
}
