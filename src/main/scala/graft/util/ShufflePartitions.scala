package graft.util

import org.apache.spark.sql.SparkSession

/** Drain-immune view of the session's BATCH shuffle-partition setting.
  *
  * The streaming harness (queries.Streaming's DrainConfs) temporarily
  * sets `spark.sql.shuffle.partitions` session-wide to the drain value
  * while any drain is active (state-store sizing). Batch entries that
  * size their own plans from the conf (repartitionByRange parallelism,
  * salting fan-out, shard counts) must NOT read the live value: under
  * the concurrent Verify loop a drain can overlap any batch entry, and
  * the batch plan would silently pick up the drain's partition count —
  * results stay correct only by the suite-wide partition-invariance
  * contract, which nothing machine-checks for conf-reading entries.
  * Reading through [[batch]] removes the hazard structurally: while a
  * drain is active, callers get the captured pre-drain baseline.
  *
  * The baseline is registered/cleared by DrainConfs under its own lock
  * (first drain in, last drain out); the volatile here is only the
  * publication of that decision to concurrently-planning batch threads.
  */
object ShufflePartitions {

  @volatile private var drainBaseline: Option[Int] = None

  /** Called by the drain harness only (first-in captures, last-out
    * clears) — not library surface. */
  private[graft] def setDrainBaseline(p: Int): Unit = drainBaseline = Some(p)
  private[graft] def clearDrainBaseline(): Unit = drainBaseline = None

  /** The shuffle-partition count a BATCH plan should size itself from:
    * the live conf normally, the captured pre-drain baseline while any
    * streaming drain holds the conf at its drain value. */
  def batch(spark: SparkSession): Int = drainBaseline match {
    case Some(p) => p
    case None => spark.conf.get("spark.sql.shuffle.partitions").toInt
  }
}
