package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WeatherCsv

/** The honest 13-column wire decode (FIXTURES.md §1): valid rows, malformed
  * rows to PERMISSIVE nulls, the documented precip defaults, and the
  * population-variance daily stats — value-exact per SURVEY §5.2.2. */
class WeatherCsvSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private val fixture = Seq(
    "724940:23234,2008,01,01,00,11.7,-0.6,1023.8,50,7.2,2,0.0,0.0",
    "724940:23234,2008,01,01,01,12.7,-0.6,1023.8,50,7.2,2,0.5,0.0",
    "724940:23234,2008,01,01,02,14.2,-0.6,1023.8,50,7.2,2,0.0,0.0",
    "725030:14732,2008,01,01,00,3.0,-2.0,1011.1,200,4.6,4,,",       // missing precip
    "725030:14732,2008,01,01,01,bad,-2.0,1011.1,200,4.6,4,0.1,0.0", // bad double
    "junk,row")                                                     // short row

  private def parsed = {
    import spark.implicits._
    WeatherCsv.parseLines(fixture.toDS())
  }

  test("parse: 13 honest columns, no sky_condition_text") {
    assert(!WeatherCsv.schema.fieldNames.contains("sky_condition_text"))
    assert(WeatherCsv.schema.fieldNames.length == 13)
  }

  test("valid rows decode value-exact; malformed fields become null") {
    val v = WeatherCsv.valid(parsed)
    assert(v.count() == 5) // the short row is corrupt; 'bad' only nulls one field
    val r = v.filter(col("wsid") === "724940:23234" && col("hour") === 1)
      .head
    assert(r.getAs[Double]("temperature") == 12.7)
    assert(r.getAs[Double]("one_hour_precip") == 0.5)
    val badTemp = v.filter(col("hour") === 1 && col("wsid") === "725030:14732").head
    assert(badTemp.isNullAt(badTemp.fieldIndex("temperature")))
  }

  test("parseWithAudit: QA counters ride the parse pass via observe") {
    import spark.implicits._
    val (df, obs) = WeatherCsv.parseWithAudit(fixture.toDS())
    df.write.format("noop").mode("overwrite").save() // one action, no extra scan
    val m = obs.get
    assert(m("n_rows") == 6L)
    assert(m("n_corrupt") == 2L)      // short row + bad-double row
    assert(m("n_keyless") == 1L)      // only the short row loses its key
    assert(m("n_null_precip") == 2L)  // missing-precip row + short row
  }

  test("malformed input is captured in _corrupt_record, not dropped silently") {
    // both the short row AND the bad-field row carry their raw line
    val corrupt = parsed.filter(col("_corrupt_record").isNotNull)
      .select("_corrupt_record").collect().map(_.getString(0)).toSet
    assert(corrupt == Set("junk,row",
      "725030:14732,2008,01,01,01,bad,-2.0,1011.1,200,4.6,4,0.1,0.0"))
    // but only the short row is structurally unusable (key unparseable)
    assert(parsed.filter(col("year").isNull).count() == 1)
  }

  test("precip defaults: explicit coalesce to 0.0 (the reference's intent)") {
    val d = WeatherCsv.withPrecipDefaults(WeatherCsv.valid(parsed))
    val r = d.filter(col("wsid") === "725030:14732" && col("hour") === 0).head
    assert(r.getAs[Double]("one_hour_precip") == 0.0)
    assert(r.getAs[Double]("six_hour_precip") == 0.0)
  }

  test("daily stats: population variance (StatCounter semantics), value-exact") {
    val stats = WeatherCsv.dailyTemperatureStats(
      WeatherCsv.valid(parsed).filter(col("wsid") === "724940:23234"))
      .head
    // temps 11.7, 12.7, 14.2: mean 12.866..., var_pop = E[x^2]-E[x]^2
    val xs = Seq(11.7, 12.7, 14.2)
    val mean = xs.sum / 3
    val varPop = xs.map(x => (x - mean) * (x - mean)).sum / 3
    assert(stats.getAs[Double]("high") == 14.2)
    assert(stats.getAs[Double]("low") == 11.7)
    assert(math.abs(stats.getAs[Double]("mean") - mean) < 1e-12)
    assert(math.abs(stats.getAs[Double]("variance") - varPop) < 1e-12)
    assert(math.abs(stats.getAs[Double]("stdev") - math.sqrt(varPop)) < 1e-12)
  }

  test("batch file reader: same decode through spark.read.csv (gz-transparent path)") {
    val dir = Files.createTempDirectory("wire")
    Files.write(dir.resolve("w.csv"),
      fixture.mkString("\n").getBytes("UTF-8"))
    val v = WeatherCsv.valid(WeatherCsv.read(spark, dir.toString))
    assert(v.count() == 5)
    assert(WeatherCsv.dayKey(v).distinct().count() == 2) // two station-days
  }
}
