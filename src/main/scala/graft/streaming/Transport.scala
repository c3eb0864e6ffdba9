package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap

/** The injectable client seam — "bring your own transport".
  *
  * The reference makes its AWS client pluggable on both sides: the sink
  * takes a bare function (`type PutRecords = PutRecordsRequest =>
  * PutRecordsResult`, reference KinesisGraphStage.scala:20, injected at
  * KinesisGraphStage.scala:28-30 via `client.putRecords`), and the
  * source drives a three-call client surface — describeStream (shard
  * list with parent/adjacent-parent links, KinesisSource.scala:115-141),
  * getShardIterator (position → cursor, KinesisSource.scala:85-109) and
  * getRecords (cursor-bounded fetch, KinesisSource.scala:255-258).
  *
  * graft mirrors that seam so a user can swap the local sharded-log
  * transport for a real client without touching any operator:
  *
  *   - [[RecordWriter]] is the sink-side function surface; an AWS
  *     adapter is one line (`recs => client.putRecords(toRequest(recs))
  *     .getRecords.asScala.map(r => PutResult(Option(r.getErrorCode)))`),
  *     and [[BatchingSink.over]] runs the full buffer/flush/requeue/
  *     backoff machinery against it unchanged.
  *   - [[ShardReader]] is the source-side surface, re-keyed from opaque
  *     string iterators to explicit per-shard sequence numbers because
  *     that is what a replayable Spark offset must serialize anyway
  *     (the reference's iterator-reissue dance, KinesisSource.scala:
  *     43-65, exists precisely to recover a resumable position — a
  *     sequence range IS that position, checkpoint-durable). An AWS
  *     adapter maps describeShards → DescribeStream,
  *     sequenceAtTimestamp → GetShardIterator(AT_TIMESTAMP),
  *     read → GetShardIterator(AFTER_SEQUENCE_NUMBER) + GetRecords loop.
  *   - [[FileShardReader]] (the sharded-log layout) and
  *     [[InMemoryTransport]] (both sides, for tests) are the built-in
  *     implementations; `ShardedLogMicroBatchStream` itself compiles
  *     against the trait only.
  *
  * Implementations must be Serializable: the reader instance rides into
  * executor tasks inside the input partition. A real-client adapter
  * should hold its client `@transient lazy` and reconstruct it per JVM —
  * the same discipline as any DSv2 source.
  */
object Transport {

  /** One delivered record: per-shard sequence + arrival timestamp — the
    * fields the reference reads off its Record (sequence number,
    * KinesisSource.scala:59-63; ApproximateArrivalTimestamp analog,
    * see ShardedLog's at_timestamp note).
    *
    * Payload fidelity: the reference is "serialisation format agnostic"
    * and delivers raw ByteBuffers (reference KinesisSource.scala:68-70).
    * `value` is the UTF-8 TEXT VIEW (lossy for non-UTF-8 bytes — the
    * convenient column for the overwhelmingly-text pipelines); the
    * byte-exact payload is [[payload]], which `bin` carries explicitly
    * whenever the text view would not round-trip. Construct through
    * [[Rec.ofBytes]] so the invariant (bin set iff the text view is
    * lossy) holds. */
  final case class Rec(shard: String, seq: Long, value: String, tsUs: Long,
                       bin: Option[Array[Byte]] = None) {
    /** The exact delivered bytes, whatever the encoding. */
    def payload: Array[Byte] =
      bin.getOrElse(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))

    // The synthesized case-class equals/hashCode would compare `bin` by
    // ARRAY REFERENCE — two Recs with identical binary payloads would be
    // unequal, a silent trap for any equality/dedup use. Compare payload
    // CONTENT instead (text-only Recs are unaffected: bin is None on
    // both sides and the field compare short-circuits to the same
    // result as the content compare).
    override def equals(other: Any): Boolean = other match {
      case r: Rec =>
        shard == r.shard && seq == r.seq && value == r.value &&
          tsUs == r.tsUs && ((bin, r.bin) match {
            case (None, None) => true
            case (Some(a), Some(b)) => java.util.Arrays.equals(a, b)
            case _ => false
          })
      case _ => false
    }
    override def hashCode(): Int =
      java.util.Objects.hash(shard, Long.box(seq), value, Long.box(tsUs),
        Int.box(bin.fold(0)(java.util.Arrays.hashCode)))
  }

  object Rec {
    /** Byte-preserving constructor: keeps the raw payload alongside the
      * text view only when UTF-8 decode+re-encode would not reproduce
      * it (so text records pay no duplicate storage). */
    def ofBytes(shard: String, seq: Long, payload: Array[Byte], tsUs: Long): Rec = {
      val s = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
      if (java.util.Arrays.equals(
          s.getBytes(java.nio.charset.StandardCharsets.UTF_8), payload))
        Rec(shard, seq, s, tsUs)
      else Rec(shard, seq, s, tsUs, bin = Some(payload))
    }
  }

  /** Shard identity with reshard parentage — the reference's
    * parentShardId + adjacentParentShardId pair
    * (KinesisSource.scala:135-141): one parent = split child, two
    * parents = merge child, none = original shard.
    *
    * `maxSeq`, when present, is the shard's current frontier as of this
    * describeShards call, letting the driver admit a micro-batch from
    * ONE client call per trigger instead of one maxSequence call per
    * shard (the N+1 that multiplies API traffic for a remote client at
    * high shard counts — the reference gets shard metadata in a single
    * describeStream). Readers that can't compute it cheaply leave None
    * and the source falls back to per-shard maxSequence. */
  final case class ShardInfo(
      shardId: String, parents: Seq[String], maxSeq: Option[Long] = None)
}

/** Source-side client surface (see [[Transport]]). All methods are
  * driver-side except [[ShardReader.read]], which runs in executor
  * tasks. */
trait ShardReader extends Serializable {

  /** Current shards with their declared reshard parents — the
    * describeStream call (reference KinesisSource.scala:115-141). Called
    * every micro-batch, so discovery of split/merge children is
    * continuous, as in the reference's handleReshard
    * (KinesisSource.scala:229-235). */
  def describeShards(): Seq[Transport.ShardInfo]

  /** Highest sequence currently present in `shard` (0 when empty) — the
    * admission frontier. */
  def maxSequence(shard: String): Long

  /** Highest sequence whose record arrived strictly before `tsUs`
    * (0 if none) — GetShardIterator(AT_TIMESTAMP)
    * (reference KinesisSource.scala:99-102). */
  def sequenceAtTimestamp(shard: String, tsUs: Long): Long

  /** Records with `afterSeq < seq <= toSeq`, in ascending sequence
    * order — the per-shard ordering guarantee. The AFTER_SEQUENCE_NUMBER
    * + GetRecords loop (reference KinesisSource.scala:55-65, 255-258). */
  def read(shard: String, afterSeq: Long, toSeq: Long): Iterator[Transport.Rec]

  /** Everything at or below `upTo` is committed — a reader holding
    * per-position state (the Kinesis adapter's sequence ledger) may
    * release it, KEEPING position `upTo` itself as the resume anchor.
    * Called from the stream's `commit(end)`; default no-op for readers
    * whose positions are self-describing (files, in-memory log). */
  def prune(shard: String, upTo: Long): Unit = ()
}

/** Sink-side client surface — the reference's injectable
  * `PutRecordsRequest => PutRecordsResult` (KinesisGraphStage.scala:20)
  * with the request/response flattened to (partitionKey, payload) pairs
  * and per-record [[BatchingSink.PutResult]]s (errorCode None = ok;
  * [[BatchingSink.ThrottledCode]] triggers the sink's requeue +
  * self-throttle path). Must return exactly one result per record, in
  * order, as the AWS API does. */
trait RecordWriter extends Serializable {
  def putRecords(records: Seq[(String, Array[Byte])]): Seq[BatchingSink.PutResult]
}

/** Name → reader registry so a transport can be injected through DSv2's
  * string-only options map: `readStream.format(ShardedLog.Format)
  * .option("transport", name)`. Driver-side resolution only (the
  * resolved instance then travels inside partitions). */
object TransportRegistry {
  private val readers = TrieMap.empty[String, ShardReader]
  def register(name: String, reader: ShardReader): Unit = readers.put(name, reader)
  def unregister(name: String): Unit = readers.remove(name)
  private[streaming] def get(name: String): ShardReader =
    readers.getOrElse(name, throw new IllegalArgumentException(
      s"no transport registered under '$name' — call TransportRegistry.register first"))
}

/** [[ShardReader]] over the sharded-log file layout
  * (`<root>/<shard>/<seq>.rec`, [[ShardedLog]]) — the local, durable,
  * default transport. Serializable: carries only the root path string;
  * all IO goes through ShardedLog's retrying, taxonomy-aware readers. */
final class FileShardReader(rootStr: String) extends ShardReader {
  private def root: Path = Paths.get(rootStr)

  override def describeShards(): Seq[Transport.ShardInfo] =
    ShardedLog.listShards(root).map { d =>
      val name = d.getFileName.toString
      Transport.ShardInfo(name, ShardedLog.parentsOf(root, name),
        maxSeq = Some(maxSequence(name)))
    }

  override def maxSequence(shard: String): Long = {
    val dir = root.resolve(shard)
    if (!Files.isDirectory(dir)) 0L
    else ShardedLog.listFiles(dir).lastOption.map(_._1).getOrElse(0L)
  }

  override def sequenceAtTimestamp(shard: String, tsUs: Long): Long = {
    val dir = root.resolve(shard)
    if (!Files.isDirectory(dir)) 0L
    // takeWhile over the seq-ascending listing: file mtimes are
    // monotone with seq in an append-only log, and stopping at the
    // first at-or-after match mirrors the reference's "read from the
    // first record at or after the timestamp"
    else ShardedLog.listFiles(dir).takeWhile(_._3 < tsUs)
      .lastOption.map(_._1).getOrElse(0L)
  }

  override def read(shard: String, afterSeq: Long, toSeq: Long): Iterator[Transport.Rec] =
    ShardedLog.listFiles(root.resolve(shard)).iterator
      .filter { case (seq, _, _) => seq > afterSeq && seq <= toSeq }
      .flatMap { case (seq, p, mtUs) =>
        ShardedLog.readRecPayloads(p).map(payload =>
          Transport.Rec.ofBytes(shard, seq, payload, mtUs))
      }
}

/** Sink-side [[RecordWriter]] over the sharded-log file layout — the
  * durable local counterpart of [[FileShardReader]]: hash-routes each
  * partition key to one of `numShards` shard directories (the same
  * key→shard affinity contract as Kinesis partition keys) and appends
  * one record file per flush per shard through ShardedLog.append
  * (write-temp + atomic move, so a concurrently tailing reader never
  * observes a torn file). With [[BatchingSink.over]] on top this is the
  * full reference sink semantics against local durable storage.
  *
  * Concurrency: sequence allocation is serialized per (root, shard)
  * through a JVM-global lock, so the many per-partition sink instances
  * of a local[n] job cannot allocate the same file sequence and
  * replace each other's flushes (multi-JVM writers to one root would
  * still race — that deployment belongs on a real shared-log
  * transport, not local files). Payload contract: a flush whose
  * payloads are all newline-free UTF-8 text lands in the
  * human-readable line layout (`.rec`); any flush carrying a payload
  * that would not survive that round-trip (embedded newlines,
  * non-UTF-8 bytes) is written whole as a length-prefixed binary file
  * (`.recb`, [[ShardedLog.appendBinary]]) — byte-exact either way, the
  * reference's format-agnostic ByteBuffer contract (reference
  * KinesisSource.scala:68-70). */
final class FileRecordWriter(rootStr: String, numShards: Int = 4) extends RecordWriter {
  import FileRecordWriter.lockFor
  override def putRecords(records: Seq[(String, Array[Byte])]): Seq[BatchingSink.PutResult] = {
    val root = Paths.get(rootStr)
    records.groupBy { case (k, _) => "shard-" + math.floorMod(k.hashCode, numShards) }
      .foreach { case (shard, recs) =>
        val payloads = recs.map(_._2)
        val asLines: Option[Seq[String]] = {
          val decoded = payloads.map(p => new String(p, StandardCharsets.UTF_8))
          if (decoded.lazyZip(payloads).forall { (line, p) =>
              !line.exists(c => c == '\n' || c == '\r') &&
                java.util.Arrays.equals(line.getBytes(StandardCharsets.UTF_8), p)
            }) Some(decoded)
          else None
        }
        lockFor(rootStr, shard).synchronized {
          val dir = root.resolve(shard)
          val next = (if (Files.isDirectory(dir))
            ShardedLog.listFiles(dir).lastOption.map(_._1).getOrElse(0L)
          else 0L) + 1L
          asLines match {
            case Some(lines) => ShardedLog.append(root, shard, next, lines)
            case None => ShardedLog.appendBinary(root, shard, next, payloads)
          }
        }
      }
    records.map(_ => BatchingSink.PutResult(None))
  }
}

object FileRecordWriter {
  private val locks = TrieMap.empty[(String, String), Object]
  private def lockFor(root: String, shard: String): Object =
    locks.getOrElseUpdate((root, shard), new Object)
}

/** Both transport sides over a JVM-local in-memory log — the test fake
  * that proves the adapter path end-to-end: records written through
  * [[BatchingSink.over]] become readable by a real Structured Streaming
  * query via `option("transport", id)`, no filesystem involved.
  *
  * Data lives in a JVM-static registry keyed by `id`, so a copy
  * deserialized into a local-mode task re-attaches to the same log —
  * the in-memory stand-in for how a real adapter reconstructs its
  * client per JVM (single-JVM test transport; a distributed deploy
  * needs a reader whose backing store is reachable from executors,
  * which a real client adapter is by construction).
  *
  * @param clock arrival-timestamp source in micros, injectable so specs
  *              are deterministic (the server-side
  *              ApproximateArrivalTimestamp analog). */
final class InMemoryTransport(
    val id: String,
    numShards: Int = 4,
    clock: () => Long = () => System.currentTimeMillis() * 1000L)
  extends ShardReader with RecordWriter {
  import InMemoryTransport._

  register(id)

  /** Append directly to a named shard, bypassing hash routing — for
    * reshard tests, where a split/merge child needs records of its own. */
  def append(shard: String, value: String): Unit = {
    val log = logs(id)
    log.synchronized {
      val cur = log.shards.getOrElse(shard, Vector.empty)
      log.shards(shard) = cur :+ Transport.Rec(shard, cur.length + 1L, value, clock())
    }
  }

  /** Reshard declaration, mirroring ShardedLog.declareParents. */
  def declareParents(child: String, parents: Seq[String]): Unit = {
    require(parents.nonEmpty, "declareParents needs at least one parent")
    val log = logs(id)
    log.synchronized {
      log.shards.getOrElseUpdate(child, Vector.empty)
      log.parents(child) = parents.toVector
    }
  }

  override def putRecords(records: Seq[(String, Array[Byte])]): Seq[BatchingSink.PutResult] = {
    val log = logs(id)
    log.synchronized {
      records.foreach { case (key, payload) =>
        val shard = "shard-" + math.floorMod(key.hashCode, numShards)
        val cur = log.shards.getOrElse(shard, Vector.empty)
        log.shards(shard) = cur :+ Transport.Rec.ofBytes(
          shard, cur.length + 1L, payload, clock())
      }
    }
    records.map(_ => BatchingSink.PutResult(None))
  }

  override def describeShards(): Seq[Transport.ShardInfo] = {
    val log = logs(id)
    log.synchronized {
      log.shards.keys.toSeq.sorted.map(s =>
        Transport.ShardInfo(s, log.parents.getOrElse(s, Vector.empty),
          maxSeq = Some(log.shards(s).length.toLong)))
    }
  }

  override def maxSequence(shard: String): Long = {
    val log = logs(id)
    log.synchronized(log.shards.getOrElse(shard, Vector.empty).length.toLong)
  }

  override def sequenceAtTimestamp(shard: String, tsUs: Long): Long = {
    val log = logs(id)
    log.synchronized(log.shards.getOrElse(shard, Vector.empty)
      .takeWhile(_.tsUs < tsUs).lastOption.map(_.seq).getOrElse(0L))
  }

  override def read(shard: String, afterSeq: Long, toSeq: Long): Iterator[Transport.Rec] = {
    val log = logs(id)
    // snapshot under the lock; the iterator itself then needs no lock
    log.synchronized(log.shards.getOrElse(shard, Vector.empty)
      .filter(r => r.seq > afterSeq && r.seq <= toSeq)).iterator
  }
}

object InMemoryTransport {
  private final class Log {
    val shards = scala.collection.mutable.Map.empty[String, Vector[Transport.Rec]]
    val parents = scala.collection.mutable.Map.empty[String, Vector[String]]
  }
  private val logs = TrieMap.empty[String, Log]
  private def register(id: String): Unit = logs.getOrElseUpdate(id, new Log)
  /** Drop a fake's backing log (test cleanup). */
  def drop(id: String): Unit = logs.remove(id)
}
