package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.OrderedAggregators

/** A9: min/max under default AND custom orderings — the reference's
  * AggregationSpec.scala:23-41 surface (Algebird Min/Max incl. a custom
  * Ordering), distributed. */
case class OASpecR(user: Long, kind: String, value: Double)

class OrderedAggregatorsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("maxBy/minBy with the natural ordering match groupBy max/min") {
    import spark.implicits._
    val ds = Tables.events(spark, GraftTestSpark.sf)
      .selectExpr("user_id", "event_type", "value").as[(Long, String, Double)]
      .map(t => OASpecR(t._1, t._2, t._3))
    val got = ds.groupByKey(_.user)
      .agg(OrderedAggregators.maxBy[OASpecR, Double](_.value).toColumn.name("mx"),
        OrderedAggregators.minBy[OASpecR, Double](_.value).toColumn.name("mn"))
      .collect().map { case (u, mx, mn) => u -> (mx.value, mn.value) }.toMap
    val expected = ds.collect().groupBy(_.user)
      .map { case (u, rs) => u -> (rs.map(_.value).max, rs.map(_.value).min) }
    assert(got == expected)
  }

  test("custom Ordering: max by distance-from-100 (the reference's custom-ordering case)") {
    import spark.implicits._
    val custom: Ordering[Double] = Ordering.by(x => math.abs(x - 100.0))
    val ds = Seq(OASpecR(1, "a", 99.0), OASpecR(1, "b", 150.0), OASpecR(1, "c", 101.0),
      OASpecR(2, "d", 100.0), OASpecR(2, "e", 0.0)).toDS()
    val got = ds.groupByKey(_.user)
      .agg(OrderedAggregators.maxBy[OASpecR, Double](_.value)(custom,
        implicitly, implicitly).toColumn.name("far"))
      .collect().map { case (u, r) => u -> r.kind }.toMap
    assert(got == Map(1L -> "b", 2L -> "e")) // farthest from 100 per user
  }

  test("merge order does not change the result (partitioning invariance)") {
    import spark.implicits._
    val rows = (1 to 500).map(i => OASpecR(i % 7L, s"k$i", (i * 37 % 101).toDouble))
    for (parts <- Seq(1, 4, 13)) {
      val got = rows.toDS().repartition(parts).groupByKey(_.user)
        .agg(OrderedAggregators.maxBy[OASpecR, (Double, String)](r => (r.value, r.kind))
          .toColumn.name("mx"))
        .collect().map { case (u, r) => u -> (r.value, r.kind) }.toMap
      val expected = rows.groupBy(_.user)
        .map { case (u, rs) => u -> rs.map(r => (r.value, r.kind)).max }
      assert(got == expected, s"parts=$parts")
    }
  }
}
