package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each table is a single parquet file per scale-factor directory; at
  * cluster scale the same call reads a partitioned directory — Spark's
  * parquet source handles both, with filter/column pushdown intact.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Resolved-relation memo (r13): `spark.read.parquet` re-lists the
    * path and re-reads a parquet footer ON EVERY CALL — driver-side,
    * single-threaded work that every one of the ~400 load() calls in a
    * full 185-entry pass re-pays for the same ten immutable tables.
    * Memoize the ANALYZED DataFrame per (session, dir, table): a
    * DataFrame is a plan, not data — every execution still scans the
    * parquet — so this only dedups metadata resolution, exactly what
    * the temp-view path (registerAll) already does for SQL entries.
    * Keyed on the session OBJECT (not a hash) so a restarted session
    * can never collide, and entries die with the JVM (sessions per JVM
    * are few: one for Bench/Verify, dozens across the test suite).
    *
    * CONTRACT (ADVICE r13): a table directory is assumed IMMUTABLE for
    * the lifetime of the session that first loaded it — an in-place
    * rewrite of `dir` within one session would serve the stale file
    * listing/schema resolved at first load. Every current caller
    * (Bench, Verify, the specs) reads the driver-generated testdata,
    * which never mutates; if load() ever becomes library surface for
    * mutable paths, fold a content fingerprint (CorpusId's scheme) into
    * the memo key. Pinned by TablesMemoSpec: same session returns the
    * SAME DataFrame instance, a new session re-resolves. */
  private val relMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.parquet carries TIMESTAMP(NANOS); Spark only reads those as
    // long when this legacy flag is on (SPARK-40819). Harmless elsewhere.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // Every query path goes through here, so the session always has the
    // graft native functions available (Column API and spark.sql alike).
    graft.functions.GraftFunctions.register(spark)
    relMemo.computeIfAbsent((spark, dir, name),
      _ => spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** events with `ts` as a proper TimestampType (µs), whatever physical
    * type the generated parquet carries for it:
    *  - TIMESTAMP(NANOS) arrives as long (nanosAsLong) → floor to micros,
    *    exactly what DuckDB's TIMESTAMP_NS→TIMESTAMP cast does;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false) arrives as
    *    TIMESTAMP_NTZ → cast to TimestampType (sessions run in UTC, so
    *    wall times and instants coincide, matching DuckDB's naive read);
    *  - TimestampType passes through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Register every table as a temp view so spark.sql(...) works too. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    all.filterNot(_ == "events")
      .foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
    events(spark, dir).createOrReplaceTempView("events")
  }
}
