package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions: the optimizations the engine's scale story
  * depends on must actually appear in the executed plans — filters reaching
  * the parquet scan, column pruning, broadcast joins for dimensions, and
  * TakeOrderedAndProject for top-k (SURVEY §4.1's table).
  */
class PlanQualitySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filter pushdown reaches the parquet scan (q1 date filter)") {
    val p = plan("q1_pricing")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("column pruning: q1 scan reads only the 7 needed lineitem columns") {
    val p = plan("q1_pricing")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey"),
      readSchema)
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_tax"))
  }

  test("dimension joins broadcast (q5: no shuffle for nation/region/supplier)") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("w_topk_precip")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("semi/anti joins use join strategies, not subquery re-scans") {
    assert(plan("j_semi").contains("LeftSemi"))
    assert(plan("j_anti").contains("LeftAnti"))
  }

  test("partial aggregation before shuffle (q1 partial_sum map-side)") {
    val p = plan("q1_pricing")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p.take(2000))
  }

  test("custom expressions participate in codegen (graft_dot in knn plan)") {
    val p = plan("sim_knn_brute")
    assert(p.contains("graft_dot"), p.take(3000))
  }
}
