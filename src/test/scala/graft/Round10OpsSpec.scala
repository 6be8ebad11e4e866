package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions: contract hardening on the custom-operator doors
  * (TopKPerKey.of rejects non-scalar key/order expressions with the
  * documented exception, the TTL counter path pins its UTC contract) and
  * the generalized band-join surface.
  */
class Round10OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("TopKPerKey.of rejects an aggregate smuggled in as key/order with IllegalArgumentException") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 1L), (1L, 3.0, 2L)).toDF("k", "v", "id")
    // an aggregate function as the KEY analyzes to an Aggregate plan, not
    // a Project — must land on the documented IllegalArgumentException,
    // never a raw ClassCastException
    val e1 = intercept[IllegalArgumentException] {
      graft.plans.TopKPerKey.of(df, Seq(sum(col("k"))), Seq(col("v")), 2)
    }
    assert(e1.getMessage.contains("TopKPerKey"))
    // and as the ORDER column (Sort over an aggregate analyzes away from
    // the expected bare Sort shape or fails analysis — either way the
    // door's contract is the same exception type)
    val e2 = intercept[IllegalArgumentException] {
      graft.plans.TopKPerKey.of(df, Seq(col("k")), Seq(max(col("v")).desc), 2)
    }
    assert(e2.getMessage.contains("TopKPerKey"))
    // unresolvable column: same contract
    val e3 = intercept[IllegalArgumentException] {
      graft.plans.TopKPerKey.of(df, Seq(col("nope")), Seq(col("v")), 2)
    }
    assert(e3.getMessage.contains("TopKPerKey"))
  }

  test("dailyCounter(stateTtl) fails fast outside the UTC session contract") {
    val tzKey = "spark.sql.session.timeZone"
    val saved = spark.conf.get(tzKey)
    val dir = java.nio.file.Files.createTempDirectory("r10tz").toString
    try {
      spark.conf.set(tzKey, "America/New_York")
      val events = spark.readStream.format("rate").load()
        .selectExpr("value AS user_id", "timestamp AS ts",
          "'click' AS event_type", "1.0 AS value", "'' AS props")
      val e = intercept[IllegalArgumentException] {
        graft.streaming.CounterStream.dailyCounter(
          events, s"$dir/tbl", s"$dir/ckpt", stateTtl = Some("7 days"))
      }
      assert(e.getMessage.contains("UTC"))
    } finally {
      spark.conf.set(tzKey, saved)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
