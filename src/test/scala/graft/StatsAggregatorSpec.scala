package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StatsAggregator

/** The custom one-pass Aggregator must agree with Spark's built-in
  * aggregates (which match the reference's StatCounter semantics —
  * population variance), including under arbitrary partition splits. */
class StatsAggregatorSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("matches built-in min/max/avg/var_pop/stddev_pop on events.value") {
    import spark.implicits._
    val vals = Tables.events(spark, GraftTestSpark.sf)
      .select(col("value")).as[Double]
    val agg = vals.select(StatsAggregator[Double](identity).toColumn).collect().head
    val b = Tables.events(spark, GraftTestSpark.sf)
      .agg(count(lit(1)), min("value"), max("value"), avg("value"),
        var_pop("value"), stddev_pop("value")).collect().head
    assert(agg.count == b.getLong(0))
    assert(agg.min == b.getDouble(1) && agg.max == b.getDouble(2))
    assert(math.abs(agg.mean - b.getDouble(3)) < 1e-9)
    assert(math.abs(agg.variance - b.getDouble(4)) < 1e-6)
    assert(math.abs(agg.stdev - b.getDouble(5)) < 1e-9)
  }

  test("property: merge(splits) == fold(whole) for random lists and cuts") {
    val rng = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val xs = List.fill(1 + rng.nextInt(50))(rng.nextDouble() * 2e4 - 1e4)
      val k = rng.nextInt(xs.size + 1)
      val (l, r) = xs.splitAt(k)
      val whole = StatsAggregator.finish(
        xs.foldLeft(StatsAggregator.zero)(StatsAggregator.add))
      val merged = StatsAggregator.finish(StatsAggregator.merge(
        l.foldLeft(StatsAggregator.zero)(StatsAggregator.add),
        r.foldLeft(StatsAggregator.zero)(StatsAggregator.add)))
      assert(whole.count == merged.count)
      assert(math.abs(whole.mean - merged.mean) < 1e-9)
      assert(math.abs(whole.variance - merged.variance) < 1e-6)
    }
  }

  test("empty input yields count 0") {
    assert(StatsAggregator.finish(StatsAggregator.zero).count == 0L)
  }
}
