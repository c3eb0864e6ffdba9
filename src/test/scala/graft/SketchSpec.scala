package graft

/** Error bounds of the sketch aggregates (q26): approximate answers must
  * track the exact ones computed in the same query. */
class SketchSpec extends SparkSpec {

  test("sketches are mergeable: unioned per-group HLL sketches equal the global sketch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // THE property that makes sketches work on a cluster: building
    // per-partition sketches and unioning them keeps the estimate inside
    // the sketch's error bounds (union is register-merge; the estimate
    // may move a hair because DataSketches unions promote HLL_4→HLL_8),
    // so a 1000-executor distinct count is a tree of tiny merges, never
    // a re-scan
    val li = Tables.load(spark, Sf0001, "lineitem")
    val global = li
      .agg(hll_sketch_estimate(hll_sketch_agg($"l_orderkey")).as("n"))
      .head().getLong(0)
    val merged = li.groupBy($"l_returnflag") // stand-ins for shards/partitions
      .agg(hll_sketch_agg($"l_orderkey").as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg($"sk")).as("n"))
      .head().getLong(0)
    assert(math.abs(merged - global).toDouble / global < 0.01,
      s"sketch union ($merged) diverged from the single global sketch ($global)")
    val exact = li.select($"l_orderkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"merged estimate $merged vs exact $exact")
    assert(math.abs(global - exact).toDouble / exact < 0.05,
      s"global estimate $global vs exact $exact")
  }

  test("q26: HLL distinct within 5% of exact; approx p50 within the rank tolerance") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the query now ships bound FLAGS (oracle-checked); they must hold
    val rows = SparkEntry.queries("q26_sketches")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) === 1L, s"flag ${r.getString(0)}: hll_ok violated")
      assert(r.getLong(4) === 1L, s"flag ${r.getString(0)}: p50_ok violated")
    }
    // tighter raw-value curve than the query's flags: recompute the raw
    // sketches and pin HLL to 5% relative error, approx p50 to the
    // exact p45–p55 rank window
    val li = Tables.load(spark, Sf0001, "lineitem")
    val raw = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_orderkey", rsd = 0.02).as("approx"),
        count_distinct($"l_orderkey").as("exact"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(2500)).as("ap50"),
        expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .collect()
    raw.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr < 0.05, s"flag ${r.getString(0)}: HLL $approx vs exact $exact (err $relErr)")
      val (ap50, lo, hi) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(ap50 >= lo && ap50 <= hi, s"approx p50 $ap50 outside [$lo, $hi]")
    }
  }
}
