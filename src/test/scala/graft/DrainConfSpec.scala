package graft

import graft.util.ShufflePartitions

/** Conf isolation between the streaming drain harness and batch plans.
  *
  * DrainConfs holds `spark.sql.shuffle.partitions` at the drain value
  * session-wide while any drain is active; batch entries that size
  * their plans from the conf (repartitionByRange parallelism, salting
  * fan-out, shard counts) read through ShufflePartitions.batch, which
  * must keep returning the pre-drain baseline — otherwise a concurrent
  * Verify drain changes batch plan shapes mid-run and correctness
  * rests on an unchecked partition-invariance assumption. */
class DrainConfSpec extends SparkSpec {

  test("ShufflePartitions.batch tracks the live conf when no drain is active") {
    val live = spark.conf.get("spark.sql.shuffle.partitions").toInt
    assert(ShufflePartitions.batch(spark) === live)
    spark.conf.set("spark.sql.shuffle.partitions", (live + 3).toString)
    try assert(ShufflePartitions.batch(spark) === live + 3)
    finally spark.conf.set("spark.sql.shuffle.partitions", live.toString)
  }

  test("ShufflePartitions.batch is drain-immune: while a drain holds the " +
      "conf, batch plans keep the captured baseline") {
    val live = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // simulate DrainConfs first-in: capture baseline, set the drain value
    ShufflePartitions.setDrainBaseline(live)
    spark.conf.set("spark.sql.shuffle.partitions", (live + 13).toString)
    try {
      assert(ShufflePartitions.batch(spark) === live,
        "a batch plan sized mid-drain must see the pre-drain baseline")
    } finally {
      // simulate DrainConfs last-out: restore conf, clear baseline
      spark.conf.set("spark.sql.shuffle.partitions", live.toString)
      ShufflePartitions.clearDrainBaseline()
    }
    assert(ShufflePartitions.batch(spark) === live,
      "after the last drain exits, batch reads the live conf again")
  }
}
