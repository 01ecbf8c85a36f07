package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regressions: the physical properties the 100 TB design
  * depends on, asserted so a refactor can't silently lose them.
  */
class PlanQualitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, d).queryExecution.executedPlan.toString

  test("filters and projections are pushed into the parquet scan") {
    val p = plan("s01_scan_project")
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>"))
  }

  test("dimension joins broadcast; the fact table is never the build side") {
    val p = plan("j01_join_agg_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("as-of interval join is an equi-join with a range condition, not a cross product") {
    val p = plan("j11_asof_interval")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
  }

  test("brute-force knn broadcasts only the query side") {
    val p = plan("v01_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin"))
    // the broadcast side carries the vec_id < 8 pushdown
    assert(p.contains("LessThan(vec_id,8)"))
  }

  test("LSH candidate generation has no cartesian stage") {
    assert(!plan("d03_lsh_neardup").contains("CartesianProduct"))
  }

  test("dedup/clean two-pass operators broadcast their stats side") {
    assert(plan("a05_mode_dominance").contains("BroadcastHashJoin"))
    assert(plan("a06_percentile_clamp").contains("BroadcastHashJoin"))
  }
}
