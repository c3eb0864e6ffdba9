package graft.fakesdk

import graft.FakeKinesis
import java.nio.ByteBuffer
import java.util.Date
import scala.jdk.CollectionConverters._

/** Offline stand-ins with the AWS-SDK-v1 Kinesis METHOD SURFACE (class
  * simple-names, setter/getter names, parameter shapes) so
  * ReflectiveKinesisPort's binding — Class.forName model construction,
  * overload resolution, ByteBuffer/Date marshalling, exception
  * translation — is exercised end-to-end with no SDK jar and no
  * network. Only the members the port touches exist; the behavior
  * behind them is the shared [[graft.FakeKinesis]] core. */
class DescribeStreamRequest {
  private var stream: String = _
  private var startAfter: String = _
  def setStreamName(s: String): Unit = stream = s
  def getStreamName: String = stream
  def setExclusiveStartShardId(s: String): Unit = startAfter = s
  def getExclusiveStartShardId: String = startAfter
}
class Shard(id: String, parent: String, adjacent: String) {
  def getShardId: String = id
  def getParentShardId: String = parent
  def getAdjacentParentShardId: String = adjacent
}
class StreamDescription(shards: java.util.List[Shard],
    more: java.lang.Boolean) {
  def getShards: java.util.List[Shard] = shards
  def getHasMoreShards: java.lang.Boolean = more
}
class DescribeStreamResult(d: StreamDescription) {
  def getStreamDescription: StreamDescription = d
}
class GetShardIteratorRequest {
  var shardId: String = _
  var iteratorType: String = _
  var startSeq: String = _
  var ts: Date = _
  def setStreamName(s: String): Unit = ()
  def setShardId(s: String): Unit = shardId = s
  def setShardIteratorType(s: String): Unit = iteratorType = s
  def setStartingSequenceNumber(s: String): Unit = startSeq = s
  def setTimestamp(d: Date): Unit = ts = d
}
class GetShardIteratorResult(it: String) {
  def getShardIterator: String = it
}
class GetRecordsRequest {
  var iterator: String = _
  var limit: Integer = 10000
  def setShardIterator(s: String): Unit = iterator = s
  def setLimit(l: Integer): Unit = limit = l
}
class Record(seq: String, key: String, data: ByteBuffer, arrival: Date) {
  def getSequenceNumber: String = seq
  def getPartitionKey: String = key
  def getData: ByteBuffer = data
  def getApproximateArrivalTimestamp: Date = arrival
}
class GetRecordsResult(records: java.util.List[Record], next: String,
    behind: java.lang.Long) {
  def getRecords: java.util.List[Record] = records
  def getNextShardIterator: String = next
  def getMillisBehindLatest: java.lang.Long = behind
}
class PutRecordsRequestEntry {
  var key: String = _
  var data: ByteBuffer = _
  def setPartitionKey(k: String): Unit = key = k
  def setData(b: ByteBuffer): Unit = data = b
}
class PutRecordsRequest {
  var stream: String = _
  var entries: java.util.Collection[PutRecordsRequestEntry] = _
  def setStreamName(s: String): Unit = stream = s
  // the SDK's signature takes Collection, not List — the overload the
  // reflective binder must still resolve against an ArrayList argument
  def setRecords(rs: java.util.Collection[PutRecordsRequestEntry]): Unit =
    entries = rs
}
class PutRecordsResultEntry(err: String) {
  def getErrorCode: String = err
}
class PutRecordsResult(rs: java.util.List[PutRecordsResultEntry]) {
  def getRecords: java.util.List[PutRecordsResultEntry] = rs
}

/** SDK-shaped exceptions: translation is by class-name shape plus the
  * getErrorType discriminator, exactly what the binder keys on. */
class ExpiredIteratorException(msg: String) extends RuntimeException(msg)
class ProvisionedThroughputExceededException(msg: String)
  extends RuntimeException(msg)
class AmazonKinesisException(msg: String, errorType: String)
    extends RuntimeException(msg) {
  def getErrorType: String = errorType
}

/** The client: request-object call surface over the FakeKinesis core,
  * re-raising its taxonomy as SDK-shaped exceptions. */
class StubKinesisClient(coreId: String) {
  private def core: FakeKinesis = FakeKinesis.get(coreId)

  // paged at TWO shards per call (the real service pages ~100): the
  // port's HasMoreShards/ExclusiveStartShardId loop is exercised on any
  // stream with more than two shards, not just trusted to exist
  def describeStream(r: DescribeStreamRequest): DescribeStreamResult = {
    val all = core.describe().map(d => new Shard(
      d.shardId, d.parentShardId.orNull, d.adjacentParentShardId.orNull))
    val rest = Option(r.getExclusiveStartShardId)
      .fold(all)(a => all.dropWhile(_.getShardId != a).drop(1))
    val page = rest.take(2)
    new DescribeStreamResult(new StreamDescription(
      page.asJava, java.lang.Boolean.valueOf(rest.size > page.size)))
  }

  def getShardIterator(r: GetShardIteratorRequest): GetShardIteratorResult =
    new GetShardIteratorResult(core.iterator(
      r.shardId, r.iteratorType, Option(r.startSeq),
      Option(r.ts).map(_.getTime * 1000L)))

  def getRecords(r: GetRecordsRequest): GetRecordsResult = {
    if (r.iterator == "force-client-error")
      throw new AmazonKinesisException("bad request", "Client")
    val page =
      try core.records(r.iterator, r.limit)
      catch {
        case e: graft.streaming.KinesisPort.ExpiredIteratorException =>
          throw new ExpiredIteratorException(e.getMessage)
        case e: graft.streaming.KinesisPort.ThrottledException =>
          throw new ProvisionedThroughputExceededException(e.getMessage)
        case e: graft.streaming.BatchingSink.ClientException =>
          throw new AmazonKinesisException(e.getMessage, "Client")
      }
    new GetRecordsResult(
      page.records.map(k => new Record(k.sequenceNumber, k.partitionKey,
        ByteBuffer.wrap(k.payload), new Date(k.arrivalUs / 1000L))).asJava,
      page.nextIterator.orNull,
      java.lang.Long.valueOf(page.millisBehindLatest))
  }

  def putRecords(r: PutRecordsRequest): PutRecordsResult = {
    val pairs = r.entries.asScala.toSeq.map { e =>
      val bb = e.data.duplicate()
      val bytes = new Array[Byte](bb.remaining()); bb.get(bytes)
      (e.key, bytes)
    }
    val results =
      try core.put(pairs)
      catch {
        case e: graft.streaming.KinesisPort.ThrottledException =>
          throw new ProvisionedThroughputExceededException(e.getMessage)
      }
    new PutRecordsResult(
      results.map(ec => new PutRecordsResultEntry(ec.orNull)).asJava)
  }
}
