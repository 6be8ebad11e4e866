package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.api.WeatherQueries

/** The typed API facade — one method per reference request message. */
class WeatherQueriesSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private lazy val wq = new WeatherQueries(spark, GraftTestSpark.sf)

  test("currentReading: newest event for the station") {
    val r = wq.currentReading(0L)
    assert(r.isDefined && r.get.stationId == 0L)
    val maxId = Tables.events(spark, GraftTestSpark.sf)
      .filter("user_id = 0")
      .agg(org.apache.spark.sql.functions.max("event_id"))
      .collect().head.getLong(0)
    assert(r.get.eventId == maxId)
  }

  test("dailyStats: golden values for station 0, 2024-01-01") {
    val d = wq.dailyStats(0L, 2024, 1, 1).get
    assert(d.high == 143.51 && d.low == 29.61)
    assert(math.abs(d.mean - 86.56) < 1e-9)
    assert(math.abs(d.variance - 3243.3025) < 1e-9)
  }

  test("NoDataAvailable maps to None (station/date with no rows)") {
    assert(wq.dailyStats(999999L, 2024, 1, 1).isEmpty)
    assert(wq.currentReading(999999L).isEmpty)
    assert(wq.annualSum(999999L, 2024).isEmpty)
    assert(wq.station(999999L).isEmpty)
  }

  test("monthlyHiLow equals max/min over daily stats") {
    val m = wq.monthlyHiLow(0L, 2024, 1).get
    val daily = wq.dailyStatsDs(Some(0L)).collect().filter(d => d.month == 1)
    assert(m.hi == daily.map(_.high).max && m.lo == daily.map(_.low).min)
  }

  test("dailyStats pushes the full (station, y, m, d) key below the aggregate") {
    val qe = wq.dailyStatsPlan(0L, 2024, 1, 1).queryExecution
    // station predicate reaches the parquet scan as a pushed filter
    val physical = qe.executedPlan.toString
    assert(physical.contains("PushedFilters") && physical.contains("EqualTo(user_id,0)"), physical)
    // calendar predicates sit BENEATH the aggregate (pre-agg filter), not
    // above it — the whole-history-then-filter shape is the anti-pattern
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter}
    val agg = qe.optimizedPlan.collect { case a: Aggregate => a }.head
    val below = agg.collect { case f: Filter => f.condition.toString }
    assert(below.exists(c => c.contains("year(") && c.contains("month(") &&
      c.contains("dayofmonth(")), below.mkString("; "))
  }

  test("monthlyHiLow is a relational rollup-of-rollup: no MapGroups, key pushed") {
    val qe = wq.monthlyHiLowPlan(0L, 2024, 1).queryExecution
    val physical = qe.executedPlan.toString
    assert(!physical.contains("MapGroups") && !physical.contains("DeserializeToObject"), physical)
    assert(physical.contains("EqualTo(user_id,0)"), physical)
  }

  test("async facade returns the same answers as the blocking API") {
    import scala.concurrent.Await
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val a = wq.async
    val futures = (a.dailyStats(0L, 2024, 1, 1), a.station(1L), a.topKDays(5))
    assert(Await.result(futures._1, 120.seconds) == wq.dailyStats(0L, 2024, 1, 1))
    assert(Await.result(futures._2, 120.seconds) == wq.station(1L))
    assert(Await.result(futures._3, 120.seconds) == wq.topKDays(5))
  }

  test("A10: identical in-flight requests coalesce to one Future, then evict") {
    import scala.concurrent.{Await, ExecutionContext}
    import scala.concurrent.duration._
    import java.util.concurrent.{CountDownLatch, Executors}
    val exec = Executors.newSingleThreadExecutor()
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(exec)
    try {
      val a = wq.async
      // hold the single worker hostage: everything submitted next is
      // provably still in flight when the second call arrives
      val gate = new CountDownLatch(1)
      exec.submit(new Runnable { def run(): Unit = gate.await() })
      val f1 = a.topKDays(3)
      val f2 = a.topKDays(3)
      val other = a.topKDays(4) // different key: must NOT coalesce
      assert(f1 eq f2)
      assert(!(f1 eq other))
      gate.countDown()
      assert(Await.result(f1, 120.seconds) == wq.topKDays(3))
      // eviction on completion: an identical request later re-executes
      // (coalescing is a thundering-herd guard, not a result cache)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      var fresh = a.topKDays(3)
      while ((fresh eq f1) && System.nanoTime() < deadline) {
        Thread.sleep(10); fresh = a.topKDays(3)
      }
      assert(!(fresh eq f1))
      Await.result(fresh, 120.seconds)
    } finally exec.shutdown()
  }

  test("topKDays: k rows, non-increasing totals") {
    val top = wq.topKDays(5)
    assert(top.size == 5)
    assert(top.map(_.total).sliding(2).forall(p => p.head >= p.last))
  }

  test("station lookup joins dimensions") {
    val s = wq.station(1L).get
    assert(s.id == 1L && s.nation.startsWith("NATION_") && s.region.nonEmpty)
  }

  test("write-back cascade: monthly served from materialized daily rollup") {
    val out = java.nio.file.Files.createTempDirectory("rollup-test").toString
    wq.materializeDaily(out)
    val viaRollup = wq.monthlyFromRollup(out).collect()
      .map(m => (m.stationId, m.year, m.month) -> (m.hi, m.lo)).toMap
    val direct = wq.monthlyHiLow(0L, 2024, 1).get
    assert(viaRollup((0L, 2024, 1)) == ((direct.hi, direct.lo)))
    val expected = Tables.events(spark, GraftTestSpark.sf)
      .selectExpr("user_id", "year(ts) y", "month(ts) m").distinct().count()
    assert(viaRollup.size == expected)
  }
}
