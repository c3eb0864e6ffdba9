package graft

import graft.streaming.{BatchingSink, InMemoryTransport, ShardedLog, ToRecord, TransportRegistry}
import java.nio.file.Files
import org.apache.spark.sql.DataFrame

/** The injectable client seam (graft.streaming.Transport): both the
  * source and the sink compile against traits, so a user swaps the local
  * sharded-log transport for a real client adapter without touching
  * operator code (the reference's own pattern: the sink takes a bare
  * `PutRecordsRequest => PutRecordsResult`, KinesisGraphStage.scala:20,
  * the source drives describeStream/getShardIterator/getRecords,
  * KinesisSource.scala:115-163). The in-memory fake proves the path
  * end-to-end: records written through BatchingSink.over become visible
  * to a real Structured Streaming query, no filesystem involved. */
class TransportSpec extends SparkSpec {
  import spark.implicits._

  private var n = 0
  private def freshId(): String = { n += 1; s"transport-spec-$n" }

  private def drain(id: String, extra: Map[String, String] = Map.empty): DataFrame = {
    var r = spark.readStream.format(ShardedLog.Format).option("transport", id)
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val name = "tr_" + java.util.UUID.randomUUID().toString.replace("-", "")
    val q = r.load().writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
      .start()
    q.processAllAvailable(); q.stop()
    spark.table(name)
  }

  test("write through BatchingSink.over, read back through the streaming source") {
    val id = freshId()
    val fake = new InMemoryTransport(id, numShards = 3)
    TransportRegistry.register(id, fake)
    try {
      // the full sink machinery (buffer/flush/typeclass serialization)
      // against the injected writer — the reference's withClient shape
      implicit val rec: ToRecord[(String, String)] =
        ToRecord.instance(_._1, _._2.getBytes("UTF-8"))
      val sink = BatchingSink.over[(String, String)](fake, sleeper = _ => ())
      val input = (1 to 40).map(i => (s"key-${i % 5}", s"payload-$i"))
      val out = sink.run(input.iterator).toSeq
      assert(out.forall(_.isRight), "all puts succeed on the fake")

      val rows = drain(id).collect()
      assert(rows.length === 40)
      // same partition key -> same shard (the fake's hash routing), and
      // per-shard arrival order == put order for each key
      val byKeyPayloads = input.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val byShard = rows.groupBy(_.getString(0))
      assert(byShard.size <= 3)
      byKeyPayloads.foreach { case (_, payloads) =>
        val shardOf = rows.filter(r => payloads.contains(r.getString(2)))
          .map(_.getString(0)).distinct
        assert(shardOf.length === 1, "one key maps to exactly one shard")
        val inOrder = rows.filter(_.getString(0) == shardOf.head)
          .sortBy(_.getLong(1)).map(_.getString(2)).filter(payloads.contains)
        assert(inOrder === payloads, "per-shard order preserves put order")
      }
    } finally { TransportRegistry.unregister(id); InMemoryTransport.drop(id) }
  }

  test("merge-reshard gating holds through the seam: child waits for both parents") {
    val id = freshId()
    val fake = new InMemoryTransport(id, numShards = 2)
    TransportRegistry.register(id, fake)
    try {
      // two parent shards of unequal depth, a merged child declared on
      // BOTH — the gate must hold until the slower parent drains, all
      // of it running through the injected transport (no filesystem)
      (1 to 2).foreach(i => fake.append("p1", s"p1-$i"))
      (1 to 4).foreach(i => fake.append("p2", s"p2-$i"))
      fake.declareParents("m", Seq("p1", "p2"))
      fake.append("m", "m1")
      val seen = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      val q = spark.readStream.format(ShardedLog.Format)
        .option("transport", id).option("maxFilesPerTrigger", "1")
        .load().writeStream
        .foreachBatch { (df: DataFrame, batchId: Long) =>
          val shards = df.select($"shard").collect().map(_.getString(0))
          seen.synchronized { shards.foreach(s => seen += batchId -> s) }
          ()
        }
        .option("checkpointLocation", Files.createTempDirectory("ckpt").toString)
        .start()
      q.processAllAvailable(); q.stop()
      assert(seen.count(_._2 == "p1") === 2, "all p1 records delivered")
      assert(seen.count(_._2 == "p2") === 4, "all p2 records delivered")
      assert(seen.count(_._2 == "m") === 1, "merged child delivered (no loss)")
      val lastParent = seen.filter(r => r._2 == "p1" || r._2 == "p2").map(_._1).max
      val firstChild = seen.filter(_._2 == "m").map(_._1).min
      assert(lastParent < firstChild,
        s"merge child admitted at batch $firstChild before both parents drained at $lastParent")
    } finally { TransportRegistry.unregister(id); InMemoryTransport.drop(id) }
  }

  test("at_timestamp through the seam uses the fake's deterministic clock") {
    val id = freshId()
    var now = 1000L * 1000L // µs
    val fake = new InMemoryTransport(id, numShards = 1, clock = () => now)
    TransportRegistry.register(id, fake)
    try {
      fake.putRecords(Seq(("k", "early".getBytes)))
      now = 5000L * 1000L
      fake.putRecords(Seq(("k", "late".getBytes)))
      val rows = drain(id, Map(
        "startingPosition" -> "at_timestamp", "timestampMs" -> "3000")).collect()
      assert(rows.map(_.getString(2)).toSeq === Seq("late"))
    } finally { TransportRegistry.unregister(id); InMemoryTransport.drop(id) }
  }

  test("a reader carrying the frontier in describeShards never gets per-shard maxSequence calls") {
    // The N+1 guard: a remote client pays one API call per trigger when
    // ShardInfo.maxSeq is populated (the reference's single
    // describeStream); maxSequence must then never be consulted for
    // batch admission.
    val id = freshId()
    val inner = new InMemoryTransport(id, numShards = 3)
    val counting = new graft.streaming.ShardReader {
      val maxSeqCalls = new java.util.concurrent.atomic.AtomicInteger(0)
      override def describeShards() = inner.describeShards()
      override def maxSequence(shard: String) = {
        maxSeqCalls.incrementAndGet(); inner.maxSequence(shard)
      }
      override def sequenceAtTimestamp(shard: String, tsUs: Long) =
        inner.sequenceAtTimestamp(shard, tsUs)
      override def read(shard: String, afterSeq: Long, toSeq: Long) =
        inner.read(shard, afterSeq, toSeq)
    }
    TransportRegistry.register(id, counting)
    try {
      (1 to 9).foreach(i => inner.putRecords(Seq((s"k$i", s"v$i".getBytes))))
      val rows = drain(id).collect()
      assert(rows.length === 9)
      assert(counting.maxSeqCalls.get === 0)
    } finally { TransportRegistry.unregister(id); InMemoryTransport.drop(id) }
  }

  test("unregistered transport name fails fast with a clear error") {
    val err = intercept[Exception] { drain("no-such-transport") }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(_.getMessage != null) &&
      chain(err).exists(t => Option(t.getMessage).exists(_.contains("no transport registered"))))
  }
}
