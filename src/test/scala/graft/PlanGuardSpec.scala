package graft

import graft.queries.Queries

/** Structural plan guards for the properties PLANS.md claims: filters
  * reach the parquet scan, projections prune the read schema, top-k
  * plans TakeOrderedAndProject (never a global sort), and small
  * dimensions broadcast. Plan strings are checked on the sf0.001
  * fixtures — the properties are structural, not size-dependent.
  */
class PlanGuardSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    Queries.all(q)(spark, dir).queryExecution.executedPlan.toString

  test("q3: segment filter is pushed into the customer scan; top-k is distributed") {
    val plan = planOf("q3_top_orders")
    assert(plan.contains("PushedFilters") && plan.contains("c_mktsegment"),
      plan.take(2000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q1: lineitem read schema is pruned to the referenced columns") {
    val plan = planOf("q1_pricing_summary")
    // q1 touches 7 of lineitem's 16 columns; the scan must not read the rest
    assert(!plan.contains("l_comment") && !plan.contains("l_partkey"),
      plan.take(2000))
  }

  test("q5: dimension joins broadcast") {
    val plan = planOf("q5_region_revenue")
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("fetch queue: backfill/refresh top-k plans TakeOrderedAndProject") {
    val plan = planOf("q_fetch_queue")
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"))
  }
}
