package graft

import graft.streaming.KinesisPort
import scala.collection.concurrent.TrieMap
import scala.collection.mutable

/** In-JVM Kinesis emulator for the adapter suites — the Kinesalite
  * analog (reference KinesaliteTest.scala, which runs the real client
  * against a local Kinesis fake): opaque gappy ~56-digit decimal
  * sequence strings, iterator expiry injection, wholesale throttling,
  * per-record put errors, reshard topology with parent/adjacent-parent
  * links. State lives in a static registry keyed by id so port copies
  * deserialized into local-mode tasks re-attach (the same pattern as
  * InMemoryTransport). */
object FakeKinesis {
  /** A realistic Kinesis sequence magnitude — far past Long, so any
    * accidental numeric parse of the opaque string fails loudly. */
  private val SeqBase =
    BigInt("49590338271490256608559692538361571095921575989136588898")
  private val cores = TrieMap.empty[String, FakeKinesis]
  def create(id: String, numShards: Int): FakeKinesis = {
    val c = new FakeKinesis(numShards); cores.put(id, c); c
  }
  def get(id: String): FakeKinesis = cores(id)
  def drop(id: String): Unit = cores.remove(id)
}

final class FakeKinesis(numShards: Int) {
  import KinesisPort._

  @volatile var nowUs: Long = 1000L * 1000L
  @volatile var throttleNextGets: Int = 0
  @volatile var throttleNextPuts: Int = 0
  /** Per-record put error injection by partition key. */
  @volatile var putErrorFor: String => Option[String] = _ => None
  var getCalls = 0

  private var iterEpoch = 0L
  private var seqCounter = 0L
  private val shards = mutable.LinkedHashMap.empty[String, Vector[KRec]]
  private val parentsOf =
    mutable.Map.empty[String, (Option[String], Option[String])]
  (0 until numShards).foreach(i => shards.put(shardName(i), Vector.empty))

  def shardName(i: Int): String = f"shardId-$i%012d"
  def shardOfKey(key: String): String =
    shardName(math.floorMod(key.hashCode, numShards))

  def append(shard: String, key: String, payload: Array[Byte]): String =
    synchronized {
      seqCounter += 1
      // gappy and monotone per shard, as the real service's are
      val seq = (FakeKinesis.SeqBase + seqCounter * 1013L).toString
      shards(shard) = shards.getOrElse(shard, Vector.empty) :+
        KRec(seq, key, payload, nowUs)
      seq
    }

  def declareChild(child: String, parent: Option[String],
      adjacent: Option[String]): Unit = synchronized {
    shards.getOrElseUpdate(child, Vector.empty)
    parentsOf(child) = (parent, adjacent)
  }

  /** Invalidate every outstanding iterator (the server-side 5-minute
    * expiry, compressed to an injection hook). */
  def expireIterators(): Unit = synchronized { iterEpoch += 1 }

  private val closed = mutable.Set.empty[String]

  /** Close a shard (resharded away): reads past its content return
    * nextIterator = null, as the service does. */
  def closeShard(shard: String): Unit = synchronized { closed += shard }

  /** Drop all but the last `keep` records (retention trim). */
  def truncateShard(shard: String, keep: Int): Unit = synchronized {
    shards(shard) = shards.getOrElse(shard, Vector.empty).takeRight(keep)
  }

  // ---- the client call surface (what StubKinesisClient / the port wrap)

  def describe(): Seq[ShardDesc] = synchronized {
    shards.keys.toSeq.map { s =>
      val (p, a) = parentsOf.getOrElse(s, (None, None))
      ShardDesc(s, p, a)
    }
  }

  def iterator(shard: String, typ: String, startSeq: Option[String],
      tsUs: Option[Long]): String = synchronized {
    val recs = shards.getOrElse(shard, Vector.empty)
    val idx = typ match {
      case "TRIM_HORIZON" => 0
      case "LATEST" => recs.length
      case "AFTER_SEQUENCE_NUMBER" =>
        val s = startSeq.getOrElse(
          throw BatchingSinkClientError("missing StartingSequenceNumber"))
        val i = recs.indexWhere(_.sequenceNumber == s)
        if (i < 0) throw BatchingSinkClientError(s"unknown sequence $s")
        i + 1
      case "AT_TIMESTAMP" =>
        recs.indexWhere(_.arrivalUs >= tsUs.get) match {
          case -1 => recs.length
          case i => i
        }
      case other => throw BatchingSinkClientError(s"bad iterator type $other")
    }
    s"it|$iterEpoch|$shard|$idx"
  }

  def records(it: String, limit: Int): RecordsPage = synchronized {
    getCalls += 1
    if (throttleNextGets > 0) {
      throttleNextGets -= 1; throw new ThrottledException("slow down")
    }
    val Array(_, ep, shard, idxS) = it.split('|')
    if (ep.toLong != iterEpoch)
      throw new ExpiredIteratorException("iterator expired")
    val recs = shards.getOrElse(shard, Vector.empty)
    val idx = idxS.toInt
    val page = recs.slice(idx, math.min(idx + limit, recs.length))
    val exhausted = idx + page.length >= recs.length
    RecordsPage(page,
      if (exhausted && closed.contains(shard)) None
      else Some(s"it|$iterEpoch|$shard|${idx + page.length}"),
      if (exhausted) 0L else 1000L)
  }

  def put(records: Seq[(String, Array[Byte])]): Seq[Option[String]] =
    synchronized {
      if (throttleNextPuts > 0) {
        throttleNextPuts -= 1; throw new ThrottledException("slow down")
      }
      records.map { case (k, p) =>
        putErrorFor(k) match {
          case some @ Some(_) => some // failed records are NOT appended
          case None => append(shardOfKey(k), k, p); None
        }
      }
    }

  // malformed requests are caller bugs: the taxonomy's fail-fast arm
  private def BatchingSinkClientError(msg: String) =
    new graft.streaming.BatchingSink.ClientException(msg)
}

/** Serializable [[KinesisPort]] over a registered [[FakeKinesis]] core —
  * what the conformance suite injects into the real adapter classes. */
final class FakeKinesisPort(id: String) extends KinesisPort {
  private def core: FakeKinesis = FakeKinesis.get(id)
  override def describeStream(stream: String): Seq[KinesisPort.ShardDesc] =
    core.describe()
  override def getShardIterator(stream: String, shard: String, typ: String,
      startSeq: Option[String], tsUs: Option[Long]): String =
    core.iterator(shard, typ, startSeq, tsUs)
  override def getRecords(it: String, limit: Int): KinesisPort.RecordsPage =
    core.records(it, limit)
  override def putRecords(stream: String,
      records: Seq[(String, Array[Byte])]): Seq[Option[String]] =
    core.put(records)
}
