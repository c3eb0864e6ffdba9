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

/** Aggregation helpers shared by the query suite. */
object Agg {
  /** Order-insensitive sum of a double expression: exact decimal
    * accumulation, surfaced as double. Mirrors the SQL idiom
    * `CAST(SUM(CAST(x AS DECIMAL(30,6))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(30, 6))).cast(DoubleType)

  /** Order-insensitive average (exact sum / exact count). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
}
