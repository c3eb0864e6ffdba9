package graft.util

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Capped driver-side memo of a deterministic derived row set, keyed by
  * a caller-supplied corpus identity — the shared mechanism behind the
  * session artifact memos (Docs' near-dup edge set, Relational's
  * co-purchase pairs; see PLANS.md "r11 — session memos").
  *
  * Concurrency contract (the concurrent Verify loop hits these from
  * several threads at once):
  *   - exactly ONE build per key: the cell is installed with a cheap
  *     computeIfAbsent and the expensive build runs in the cell's lazy
  *     initializer, which the JVM synchronizes PER CELL — concurrent
  *     callers of the same key block on that cell only, and callers of
  *     different keys never contend on a map bin held through a build;
  *   - the cap gates on count() BEFORE any collect, so an over-cap set
  *     never lands on the driver: the memo remembers "over cap" and
  *     every caller gets a freshly built distributed plan instead (the
  *     100 TB path — an artifact that size is materialized to a table
  *     once and scanned by consumers, not held on a driver).
  */
final class RowMemo(maxRows: Long) {

  private val cells = new KeyedOnce[Option[(StructType, java.util.List[Row])]]

  /** The memoized rows for `key` as a local-relation DataFrame, building
    * via `distributed` once per key; falls back to a fresh `distributed`
    * plan (persisted, caller-scoped) when the set exceeds the cap. */
  def getOrBuild(spark: SparkSession, key: String,
                 distributed: => DataFrame): DataFrame = {
    val memo = cells.getOrCompute(key) {
      val df = distributed.persist()
      try {
        if (df.count() <= maxRows) {
          val rows = df.collect()
          val kept = (df.schema, java.util.Arrays.asList(rows.toIndexedSeq: _*))
          df.unpersist()
          Some(kept)
        } else {
          // over cap: keep the probe's MATERIALIZED cache entry alive —
          // the fallback below re-persists the same logical plan, which
          // the CacheManager resolves to this entry, so the first
          // caller (and every later one, until something clears caches)
          // reads the blocks count() already built instead of running
          // the expensive build twice
          None
        }
      } catch {
        // a failed probe (job error, cancellation) must not leak its
        // persisted cache entry: the lazy cell will retry on next access
        case t: Throwable => df.unpersist(); throw t
      }
    }
    memo match {
      case Some((schema, rows)) => spark.createDataFrame(rows, schema)
      case None => distributed.persist()
    }
  }
}
