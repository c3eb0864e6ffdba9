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
/** MinHash-LSH family parameters: 64 perms = 16 bands x 4 rows,
  * P(candidate | jaccard j) = 1-(1-j^4)^16, plus the degenerate-bucket
  * cap (boilerplate shingles would otherwise blow up the pair join
  * quadratically). ONE definition shared by the batch family (d6/d7/d8,
  * Docs.minhashCandidates) and the streaming gate (s11) — the stream
  * twin must not be able to drift to a different candidate set. */
private[queries] object LshParams {
  val Perms = 64
  val Bands = 16
  val Rows = 4
  val Seed = 42L
  val MaxBucket = 1000L
}

private[queries] object DecontaminationFilter {
  val EvalMaxDocId = 25L
  val ShingleK = 8
  val ExpectedItems = 10000L
  val Fpp = 0.01
  def bytes(docs: DataFrame): Array[Byte] = {
    val bf = docs.filter(col("doc_id") < EvalMaxDocId)
      .select(explode(
        graft.functions.Text.shingleHashes(col("text"), ShingleK)).as("g"))
      .stat.bloomFilter("g", expectedNumItems = ExpectedItems, fpp = Fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** The shared d62/s23 oracle: the Bloom gate replayed in DuckDB.
    * "Probabilistic" only names the FP rate — given the corpus the bit
    * pattern is deterministic, so the oracle rebuilds it: xxh64 8-gram
    * hashes (OracleHash, 1-stripe path), the Murmur3 (hi, lo) pair and
    * Spark 4's V2 64-bit scatter (OracleHash.bloomPositionsCte) mod
    * the word-rounded 95872-bit array, eval bits from
    * doc_id < EvalMaxDocId, and a gram hits iff ALL k of its
    * positions are set (by any eval gram — exactly how FPs arise).
    * Both gates emit the same (doc_id, n_grams, n_hits) rows, so one
    * oracle string serves d62 and s23 — extending the bit-parity
    * contract to the checker. */
  lazy val oracleSql: String = {
    val k = OracleHash.bloomNumHashes(ExpectedItems, Fpp)
    "WITH " + OracleHash.shingleCte(ShingleK) + ",\n" +
      "gd AS MATERIALIZED (SELECT DISTINCT h FROM sh),\n" +
      OracleHash.bloomPositionsCte(
        k, OracleHash.bloomBitSize(ExpectedItems, Fpp)) + ",\n" +
      s"""bits AS MATERIALIZED (SELECT DISTINCT gp.pos FROM gp
         |  WHERE gp.h IN (SELECT h FROM sh WHERE doc_id < $EvalMaxDocId)),
         |probe AS (SELECT doc_id, h FROM sh WHERE doc_id >= $EvalMaxDocId),
         |ghit AS (SELECT p.doc_id, p.h, COUNT(b.pos) AS nb
         |  FROM probe p JOIN gp ON gp.h = p.h
         |  LEFT JOIN bits b ON b.pos = gp.pos
         |  GROUP BY 1, 2),
         |dc AS (SELECT doc_id, COUNT(*) AS n_grams,
         |    CAST(SUM(CASE WHEN nb = $k THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
         |  FROM ghit GROUP BY 1)
         |SELECT doc_id, n_grams, n_hits FROM dc WHERE n_hits > 0
         |ORDER BY doc_id""".stripMargin
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
