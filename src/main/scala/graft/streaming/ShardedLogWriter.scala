package graft.streaming

import java.nio.file.{Path, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Write side of the sharded log: a `foreachBatch` writer that routes a
  * micro-batch's (shard, value) rows into per-shard record files — the
  * durable counterpart of [[BatchingSink]] (which models the transport
  * semantics; this models the storage layout the source reads).
  *
  * Each epoch appends at most one file per shard, named by the epoch
  * sequence, so (a) per-shard sequence numbers are monotonic across
  * batches, (b) a replayed epoch (checkpoint recovery re-running
  * foreachBatch) overwrites the same file idempotently instead of
  * duplicating records, and (c) readers tailing the log see whole files
  * atomically (ShardedLog.append is write-temp + atomic move).
  *
  * Scale: rows are repartitioned by shard, so each task writes its
  * shards locally — no driver collection, no cross-task file contention.
  */
object ShardedLogWriter {

  /** Writer for `writeStream.foreachBatch(...)`; expects columns
    * `shard: string, value: string`. */
  def foreachBatchWriter(root: Path): (DataFrame, Long) => Unit = {
    val rootStr = root.toString
    (batch: DataFrame, epochId: Long) => {
      batch.select(col("shard").cast("string"), col("value").cast("string"))
        .repartition(col("shard"))
        .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
          rows.toSeq.groupBy(_.getString(0)).foreach { case (shard, rs) =>
            ShardedLog.append(Paths.get(rootStr), shard, epochId + 1L,
              rs.map(_.getString(1)))
          }
        }
    }
  }
}
