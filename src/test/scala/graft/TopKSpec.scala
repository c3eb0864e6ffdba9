package graft

import graft.operators.TopK
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("global top-k plans TakeOrderedAndProject (no full sort) and is correct") {
    val li = Tables.load(spark, Sf0001, "lineitem")
    val top = TopK.global(li.select($"l_orderkey", $"l_extendedprice"),
      10, $"l_extendedprice".desc, $"l_orderkey")
    val p = top.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject:\n$p")
    val got = top.collect().map(_.getDouble(1)).toSeq
    val truth = li.select($"l_extendedprice").collect().map(_.getDouble(0))
      .sorted(Ordering[Double].reverse).take(10).toSeq
    assert(got === truth)
  }

  test("per-group top-k: k rows per group, correct membership") {
    val li = Tables.load(spark, Sf0001, "lineitem")
    val top = TopK.perGroup(li.select($"l_returnflag", $"l_orderkey", $"l_extendedprice"),
      Seq("l_returnflag"), 3, $"l_extendedprice".desc, $"l_orderkey")
    val rows = top.collect()
    rows.groupBy(_.getString(0)).foreach { case (flag, rs) =>
      assert(rs.length === 3, s"group $flag returned ${rs.length}")
      val truth = li.filter($"l_returnflag" === flag)
        .select($"l_extendedprice").collect().map(_.getDouble(0))
        .sorted(Ordering[Double].reverse).take(3).toSeq
      assert(rs.sortBy(_.getLong(3)).map(_.getDouble(2)).toSeq === truth)
    }
  }
}
