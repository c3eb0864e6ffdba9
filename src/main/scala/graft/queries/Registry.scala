package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One engine capability: a Spark plan builder plus (when SQL-expressible)
  * a DuckDB oracle the driver hash-compares against.
  *
  * Oracle-parity rules (SURVEY.md §5): double aggregates go through exact
  * DECIMAL(30,6) sums so partition/vectorization order can't perturb the
  * result; rank/length/date-part outputs are cast to long to match
  * DuckDB's BIGINT; timestamps are emitted as DATE or epoch micros.
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GraftQuery {
  def sql(name: String, oracle: String)(build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, Some(oracle))
  def rowsOnly(name: String)(build: (SparkSession, String) => DataFrame): GraftQuery =
    GraftQuery(name, build, None)
}

/** Shared Bloom build for the decontamination gates (d62 batch, s23
  * stream): the eval slice's distinct 8-gram hashes folded into a 1%
  * FP filter, serialized once. Bloom insertion is commutative, so the
  * value is partitioning- and order-independent — both gates MUST
  * build through this one helper: the s23↔d62 bit-parity contract
  * (StreamingSpec) holds exactly as long as they cannot drift. */
private[queries] object DecontaminationFilter {
  val EvalMaxDocId = 25L
  val ShingleK = 8
  def bytes(docs: DataFrame): Array[Byte] = {
    import org.apache.spark.sql.functions._
    val bf = docs.filter(col("doc_id") < EvalMaxDocId)
      .select(explode(
        graft.functions.Text.shingleHashes(col("text"), ShingleK)).as("g"))
      .stat.bloomFilter("g", expectedNumItems = 10000L, fpp = 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }
}

/** Aggregation helpers shared by the query suite. */
object Agg {
  /** Order-insensitive sum of a double expression: exact decimal
    * accumulation, surfaced as double. Mirrors the SQL idiom
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Order-insensitive average (exact sum / exact count). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
