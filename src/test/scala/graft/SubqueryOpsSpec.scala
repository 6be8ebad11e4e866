package graft

import org.scalatest.funsuite.AnyFunSuite

/** Decorrelation guarantees for the subquery surface: a correlated subquery
  * that survives to execution as per-row re-execution would be quadratic at
  * scale, so each query's physical plan must show the join form Catalyst
  * rewrites it to (left-semi / left-anti / aggregate+join / window rank).
  */
class SubqueryOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("EXISTS decorrelates to a left-semi join") {
    assert(plan("sq_exists").contains("LeftSemi"))
  }

  test("NOT EXISTS decorrelates to a left-anti join") {
    assert(plan("sq_not_exists").contains("LeftAnti"))
  }

  test("IN-subquery decorrelates to a left-semi join") {
    assert(plan("sq_in").contains("LeftSemi"))
  }

  test("correlated scalar avg becomes aggregate-once + join (no re-scan loop)") {
    val p = plan("sq_scalar_corr")
    // the avg leg appears as a partial/final aggregate feeding a join, and
    // no correlated-subquery node survives to the physical plan
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p.take(2000))
    assert(!p.toLowerCase.contains("subquery") || p.contains("Join"), p.take(2000))
  }

  test("LATERAL ORDER BY/LIMIT per outer row does not re-scan orders per customer") {
    // decorrelated: one pass over orders (window/limit), then a join
    val p = plan("j_lateral_topk")
    assert(p.contains("Join"), p.take(2000))
  }

  test("correlated min inside a 3-way join tree decorrelates (no per-row re-scan)") {
    val p = plan("sq_min_cost_join")
    // the min-price leg must appear as an aggregate feeding a join that
    // composes with the part⋈lineitem⋈supplier tree — at least 3 joins, an
    // aggregate, and no surviving correlated-subquery execution node
    assert(p.sliding("Join".length).count(_ == "Join") >= 3, p.take(3000))
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p.take(3000))
    assert(!p.contains("CorrelatedScalarSubquery"), p.take(3000))
  }

  test("sq_min_cost_join: every returned price IS the part's min (spot check)") {
    val rows = SparkEntry.queries("sq_min_cost_join")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perPart = rows.groupBy(_.getLong(0))
    perPart.foreach { case (_, rs) =>
      assert(rs.map(_.getDouble(4)).distinct.length == 1) // one min per part
    }
  }

  test("sq_not_exists is non-degenerate and exact at sf (rows > 0)") {
    assert(SparkEntry.queries("sq_not_exists")(spark, sf).count() > 0)
  }

  test("lateral top-2 returns at most 2 orders per customer, prices descending") {
    val rows = SparkEntry.queries("j_lateral_topk")(spark, sf)
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      assert(rs.length <= 2)
      val totals = rs.map(_.getDouble(2)).toSeq
      assert(totals == totals.sorted.reverse)
    }
  }
}
