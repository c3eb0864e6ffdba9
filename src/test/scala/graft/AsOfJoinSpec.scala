package graft

import graft.operators.AsOfJoin
import java.sql.Timestamp
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = new Timestamp(m * 60000L)

  test("latest-at-or-before semantics, including exact-timestamp ties and no-match nulls") {
    val trades = Seq(
      (1L, t(10), "T1"), (1L, t(20), "T2"), (2L, t(5), "T3"))
      .toDF("acct", "trade_ts", "trade_id")
    val quotes = Seq(
      (1L, t(8), 100.0), (1L, t(20), 110.0), (1L, t(25), 120.0),
      (2L, t(7), 50.0))
      .toDF("acct", "quote_ts", "px")

    val joined = AsOfJoin.latestAtOrBefore(trades, quotes,
      keys = Seq("acct"), leftTs = "trade_ts", rightTs = "quote_ts",
      valueCols = Seq("px"))
      .select($"trade_id", $"px").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    assert(joined("T1") === Some(100.0)) // latest before 10 is 8
    assert(joined("T2") === Some(110.0)) // tie at 20 matches (<= semantics)
    assert(joined("T3") === None)        // no quote at or before 5
  }

  test("the matched right row is attached atomically — its own nulls survive") {
    val trades = Seq((1L, t(30), "T1")).toDF("acct", "trade_ts", "trade_id")
    // nearest quote (t=20) has a null px: a per-column fill would
    // resurrect the stale t=10 px and emit a row that never existed
    val quotes = Seq(
      (1L, t(10), Some(100.0), 5L), (1L, t(20), Option.empty[Double], 7L))
      .toDF("acct", "quote_ts", "px", "qty")
    val r = AsOfJoin.latestAtOrBefore(trades, quotes,
      keys = Seq("acct"), leftTs = "trade_ts", rightTs = "quote_ts",
      valueCols = Seq("px", "qty")).select($"px", $"qty").head()
    assert(r.isNullAt(0), "px must be the nearest row's own null")
    assert(r.getLong(1) === 7L, "qty must come from the same nearest row")
  }

  test("null timestamps: right rows never match, left rows match nothing (both directions)") {
    val trades = Seq(
      (1L, Some(t(10)), "T1"), (1L, Option.empty[Timestamp], "Tnull"))
      .toDF("acct", "trade_ts", "trade_id")
    val quotes = Seq(
      (1L, Some(t(5)), 100.0), (1L, Some(t(15)), 200.0),
      (1L, Option.empty[Timestamp], 999.0))
      .toDF("acct", "quote_ts", "px")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select($"trade_id", $"px").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
    val back = collect(AsOfJoin.latestAtOrBefore(trades, quotes,
      keys = Seq("acct"), leftTs = "trade_ts", rightTs = "quote_ts",
      valueCols = Seq("px")))
    assert(back("T1") === Some(100.0), "null-ts quote must not outrank t(5)")
    assert(back("Tnull") === None, "a null-ts trade has no as-of match")
    val fwd = collect(AsOfJoin.earliestAtOrAfter(trades, quotes,
      keys = Seq("acct"), leftTs = "trade_ts", rightTs = "quote_ts",
      valueCols = Seq("px")))
    assert(fwd("T1") === Some(200.0))
    assert(fwd("Tnull") === None, "a null-ts trade has no forward match either")
  }

  test("same-instant right duplicates resolve deterministically via the tiebreaker") {
    val trades = Seq((1L, t(10), "T1")).toDF("acct", "trade_ts", "trade_id")
    // two quotes at exactly t(10): without a tiebreaker the winner is
    // partitioning-dependent; with one, the greatest seq must win
    val quotes = Seq(
      (1L, t(10), 100.0, 1L), (1L, t(10), 200.0, 2L), (1L, t(9), 50.0, 3L))
      .toDF("acct", "quote_ts", "px", "seq")
    (1 to 3).foreach { i =>
      val joined = AsOfJoin.latestAtOrBefore(
        trades, quotes.repartition(i), // vary physical layout
        keys = Seq("acct"), leftTs = "trade_ts", rightTs = "quote_ts",
        valueCols = Seq("px"), tiebreaker = Some("seq"))
        .select($"px").collect()
      assert(joined.map(_.getDouble(0)).toSeq === Seq(200.0),
        s"repartition($i): seq=2 (greatest tiebreaker) must win the t(10) tie")
    }
  }

  test("earliest-at-or-after semantics: forward ties, forward tiebreaker, no-match nulls") {
    val trades = Seq(
      (1L, t(10), "T1"), (1L, t(30), "T2"), (2L, t(5), "T3"))
      .toDF("acct", "trade_ts", "trade_id")
    val quotes = Seq(
      (1L, t(10), 100.0, 1L), (1L, t(10), 200.0, 2L), (1L, t(12), 300.0, 3L),
      (2L, t(4), 50.0, 4L))
      .toDF("acct", "quote_ts", "px", "seq")
    (1 to 3).foreach { i =>
      val joined = AsOfJoin.earliestAtOrAfter(
        trades, quotes.repartition(i),
        keys = Seq("acct"), leftTs = "trade_ts", rightTs = "quote_ts",
        valueCols = Seq("px"), tiebreaker = Some("seq"))
        .select($"trade_id", $"px").collect()
        .map(r => r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      // tie at t(10) matches (>= semantics) and the SMALLEST seq wins;
      // T2 has no quote at or after t(30); T3's only quote is before it
      assert(joined("T1") === Some(100.0), s"repartition($i)")
      assert(joined("T2") === None, s"repartition($i)")
      assert(joined("T3") === None, s"repartition($i)")
    }
  }

  test("forward agrees with a correlated-lookup truth on real data (sf0.001)") {
    val ev = Tables.events(spark, Sf0001)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"event_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", unix_micros($"ts").as("p_us"), $"ts".as("p_ts"))

    val got = AsOfJoin.earliestAtOrAfter(clicks, purchases,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "p_ts",
      valueCols = Seq("p_us"))
      .select($"event_id", $"p_us").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    val pSeq = purchases.collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val truth = clicks.withColumn("us", unix_micros($"ts")).collect().map { r =>
      val (user, id, us) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val best = pSeq.getOrElse(user, Array.empty[Long]).dropWhile(_ < us).headOption
      id -> best.getOrElse(-1L)
    }.toMap
    assert(got === truth)
  }

  test("agrees with a correlated-lookup truth on real data (sf0.001)") {
    // purchases <- latest click at-or-before, per user
    val ev = Tables.events(spark, Sf0001)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"))
      .withColumn("click_us", unix_micros($"click_ts"))
      .select($"user_id", $"click_ts", $"click_us")

    val got = AsOfJoin.latestAtOrBefore(purchases, clicks,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "click_ts",
      valueCols = Seq("click_us"))
      .select($"event_id", $"click_us").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    // driver-side truth via plain collections
    val clickSeq = clicks.collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val truth = purchases.withColumn("us", unix_micros($"ts")).collect().map { r =>
      val (user, id, us) = (r.getLong(0), r.getLong(1), r.getLong(3))
      val best = clickSeq.getOrElse(user, Array.empty[Long]).takeWhile(_ <= us).lastOption
      id -> best.getOrElse(-1L)
    }.toMap
    assert(got === truth)
  }
}
