package graft

/** Physical-plan regression guards: the scale properties the engine relies
  * on (pushdown, pruning, broadcast, no cartesian blowups) asserted against
  * the actual executed plans, so a refactor can't silently trade them away.
  */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = planOf("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      "filter not pushed to scan")
  }

  test("q1: scan is column-pruned (no join keys read for an aggregation)") {
    val p = planOf("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"), s"unpruned scan: $readSchema")
    assert(readSchema.contains("l_quantity"))
  }

  test("j1/q5: dimension joins broadcast; no sort-merge at this scale") {
    assert(planOf("j1_equi_join").contains("BroadcastHashJoin"))
    val q5 = planOf("q5_local_revenue")
    assert(q5.contains("BroadcastHashJoin"))
    assert(!q5.contains("CartesianProduct"))
  }

  test("d2 minhash LSH: candidate join is an equi-join, not a cross product") {
    val p = planOf("d2_minhash_lsh")
    assert(!p.contains("CartesianProduct"),
      "LSH candidate generation degenerated into a cartesian product")
  }

  test("p9: multi-predicate conjunction reaches the scan") {
    // plan toString truncates long filter lists — assert on the stable prefix
    val p = planOf("p9_conjunction")
    assert(p.contains("PushedFilters: [IsNotNull(l_returnflag), IsNotNull(l_linestatus)"),
      "conjunction not pushed")
  }
}
