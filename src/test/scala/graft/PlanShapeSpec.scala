package graft

/** Physical-plan regression guards for the scale claims in SURVEY §4 /
  * PLANS.md: these shapes are WHY the suite survives 100 TB, so a
  * refactor that silently loses one (a filter that stops pushing, a
  * dimension that stops broadcasting, a top-k that becomes a full sort)
  * must fail loudly, not just run slower.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString

  test("q2: predicates and projection reach the parquet scan") {
    val p = plan("q2_filter_project")
    assert(p.contains("PushedFilters: ["), "no pushed filters at the scan")
    assert(p.contains("l_shipdate"), "the shipdate predicate did not reach the scan")
    assert(!p.contains("l_comment"), "scan reads columns the query never uses")
  }

  test("q1: aggregation is partial (map-side) before the exchange") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("partial_sum") || p.contains("partial_count"),
      s"no map-side partial aggregate in:\n$p")
  }

  test("q3: global top-k plans as TakeOrdered, not a full sort") {
    val p = plan("q3_topk_join")
    assert(p.contains("TakeOrderedAndProject"), s"top-k lost its TakeOrdered shape:\n$p")
  }

  test("q5: every dimension join broadcasts; no sort-merge join") {
    val p = plan("q5_multiway_join")
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts")
    assert(!p.contains("SortMergeJoin"), s"a dimension join fell back to sort-merge:\n$p")
  }

  test("q17: lineitem is semi-join-pruned before any aggregation") {
    val p = plan("q17_scalar_subquery")
    assert(p.contains("LeftSemi"), s"the Brand#4 pruning semi-join is gone:\n$p")
    val exchanges = "hashpartitioning\\(l_partkey".r.findAllIn(p).length
    assert(exchanges <= 1, s"pruned lineitem should shuffle once on l_partkey:\n$p")
  }
}
