package graft

import org.scalatest.funsuite.AnyFunSuite

/** The partitioned write-back must produce a layout the reader can prune:
  * the dy <= 10 filter has to land in PartitionFilters (file-index pruning,
  * zero I/O for other months), not as a post-scan row filter.
  */
class PartitionPrunedSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("read-back scan prunes partitions on the dy filter") {
    val df = SparkEntry.queries("w_partition_pruned")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("dy"), plan.take(3000))
    // the partition filter must not degrade to a data filter on mon
    assert(df.collect().map(_.getInt(0)).forall(_ <= 10))
  }

  test("j_dpp_prune: runtime dim filter lands as a dynamic partition filter") {
    val df = SparkEntry.queries("j_dpp_prune")(spark, sf)
    val rows = df.collect() // execute so the final adaptive plan is real
    assert(rows.length == 3) // exactly the top-3 purchase days
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"), plan.take(3000))
    val scanLine = plan.linesIterator
      .find(l => l.contains("PartitionFilters") && l.contains("dynamicpruning"))
      .getOrElse("")
    assert(scanLine.contains("dy"), plan.take(3000))
  }

  test("partitioned rollup equals direct aggregation over the pruned days") {
    import org.apache.spark.sql.functions._
    import graft.functions.GraftFunctions.centi
    val direct = Tables.events(spark, sf)
      .filter(dayofmonth(col("ts")) <= 10)
      .groupBy(dayofmonth(col("ts")).cast("int").as("dy"))
      .agg(countDistinct("user_id").as("n_users"),
        count(lit(1)).as("n_events"),
        sum(centi(col("value"))).as("vc"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    SparkEntry.queries("w_partition_pruned")(spark, sf).collect().foreach { r =>
      val (nu, ne, _) = direct(r.getInt(0))
      assert(r.getLong(1) == nu && r.getLong(2) == ne)
    }
  }
}
