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
    val rows = SparkEntry.queries("q26_sketches")(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      val relErr = math.abs(approx - exact).toDouble / exact
      assert(relErr < 0.05, s"flag ${r.getString(0)}: HLL $approx vs exact $exact (err $relErr)")
    }
    // percentile_approx(0.5, accuracy 2500): rank error <= n/2500; check
    // the approximate median lands between exact p45 and p55
    val li = Tables.load(spark, Sf0001, "lineitem")
    val bounds = li.groupBy($"l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.45)").as("lo"),
        expr("percentile(l_extendedprice, 0.55)").as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = bounds(r.getString(0))
      val p50 = r.getDouble(3)
      assert(p50 >= lo && p50 <= hi, s"approx p50 $p50 outside [$lo, $hi]")
    }
  }
}
