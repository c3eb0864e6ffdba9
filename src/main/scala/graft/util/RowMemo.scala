package graft.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Capped driver-side memo of a deterministic derived row set, keyed by
  * a caller-supplied corpus identity — the shared mechanism behind the
  * session artifact memos (Docs' near-dup edge set, Relational's
  * co-purchase pairs; see PLANS.md "r11 — session memos"). Callers
  * should derive the key via [[CorpusId.key]] so an in-place rewrite of
  * the corpus dir misses instead of serving stale rows.
  *
  * Concurrency contract (the concurrent Verify loop hits these from
  * several threads at once):
  *   - exactly ONE build per key: the cell is installed with a cheap
  *     computeIfAbsent and the expensive build runs in the cell's lazy
  *     initializer, which the JVM synchronizes PER CELL — concurrent
  *     callers of the same key block on that cell only, and callers of
  *     different keys never contend on a map bin held through a build;
  *   - the cap gates on count() BEFORE any collect, so an over-cap set
  *     never lands on the driver: the memo remembers the probe's
  *     persisted distributed frame and every caller shares it (the
  *     100 TB path — an artifact that size is materialized once and
  *     scanned by consumers, not held on a driver).
  */
final class RowMemo(maxRows: Long) {

  // Left = over-cap: the ONE persisted distributed frame for this key
  // (a single CacheManager registration, shared by every caller — the
  // r11 shape re-persisted a fresh plan per caller and accumulated
  // registrations nothing owned). Right = under-cap: the collected rows.
  private val cells =
    new KeyedOnce[Either[DataFrame, (StructType, java.util.List[Row])]]

  /** The memoized rows for `key` as a local-relation DataFrame, building
    * via `distributed` once per key; above the cap every caller shares
    * one persisted distributed frame instead. */
  def getOrBuild(spark: SparkSession, key: String,
                 distributed: => DataFrame): DataFrame = {
    val memo = cells.getOrCompute(key) {
      val df = distributed.persist()
      try {
        if (df.count() <= maxRows) {
          val rows = df.collect()
          val kept = (df.schema, java.util.Arrays.asList(rows.toIndexedSeq: _*))
          df.unpersist()
          Right(kept)
        } else {
          // over cap: keep the probe's MATERIALIZED cache entry alive and
          // remember the frame itself — consumers read the blocks count()
          // already built instead of running the expensive build twice
          Left(df)
        }
      } catch {
        // a failed probe (job error, cancellation) must not leak its
        // persisted cache entry: the lazy cell will retry on next access
        case t: Throwable => df.unpersist(); throw t
      }
    }
    memo match {
      case Right((schema, rows)) => spark.createDataFrame(rows, schema)
      // Over-cap frame bound to a DIFFERENT session (ADVICE r12): the
      // cached DataFrame carries the FIRST builder's SparkSession, and
      // actions on it from a restarted/second session would target a
      // stale (possibly stopped) session. Rebuild under a
      // session-qualified key so this caller gets a frame of its own;
      // the under-cap Right path is session-free (collected rows are
      // re-wrapped in the caller's session) and needs no such guard.
      case Left(df) if df.sparkSession ne spark =>
        getOrBuild(spark,
          s"$key#session=${System.identityHashCode(spark).toHexString}",
          distributed)
      case Left(df) =>
        // Re-persist the SAME frame if something evicted its entry: an
        // external clearCache — Verify.scala's periodic clear in the
        // concurrent loop deliberately evicts whatever is registered —
        // then costs one recompute on the next consumer, never a
        // permanently-uncached plan. One registration per KEY, lifetime
        // = the session's (by design: the whole point is that later
        // consumers skip the build); an external clear is the release
        // valve, and unpersisting here would defeat the memo. The
        // storageLevel guard (a CacheManager lookup) keeps the common
        // hit path from re-registering — a racing clear between the
        // check and the persist only costs that caller a recompute.
        if (df.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
          df.persist()
        df
    }
  }
}
