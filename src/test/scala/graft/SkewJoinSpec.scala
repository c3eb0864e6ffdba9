package graft

import graft.operators.SkewJoin
import org.apache.spark.sql.functions._

/** SkewJoin must be a drop-in for a plain inner equi-join — identical
  * result set, just a different shuffle shape. */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted inner join equals plain inner join on skewed real data (sf0.001)") {
    // orders→customer is naturally skewed enough for a semantic check
    val orders = Tables.load(spark, Sf0001, "orders")
      .select($"o_orderkey", $"o_custkey")
    val customer = Tables.load(spark, Sf0001, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")

    val plain = orders.join(customer, Seq("o_custkey"))
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment")
    val salted = SkewJoin.saltedInner(orders, customer, Seq("o_custkey"),
      saltOn = "o_orderkey", saltBuckets = 8)
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("hot key spreads across salt buckets") {
    val big = Seq.tabulate(1000)(i => ("hot", i.toLong)).toDF("k", "row_id")
    val small = Seq(("hot", "v")).toDF("k", "payload")
    val joined = SkewJoin.saltedInner(big, small, Seq("k"), "row_id", 8)
    assert(joined.count() === 1000)
    // the salt must actually distribute: >1 distinct salt for 1000 rows
    val salts = big.select(pmod(hash($"row_id"), lit(8))).distinct().count()
    assert(salts > 4, s"salt only produced $salts distinct buckets")
  }
}
