package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{WeatherCsv, WeatherStations}

/** Station dimension + sky lookup (J2/J3): decode, broadcast enrichment,
  * and the "current weather for a station, human-readable" composite. */
class WeatherStationsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private val stationCsv = Seq(
    "724940:23234,SAN FRANCISCO INTL,US,CA,KSFO,37.619,-122.365,2.4",
    "725030:14732,LA GUARDIA,US,NY,KLGA,40.779,-73.880,3.4",
    "10010:99999,JAN MAYEN(NOR-NAVY),NO,,ENJA,70.933,-8.667,9.0")

  private val readingCsv = Seq(
    "724940:23234,2008,01,01,00,11.7,-0.6,1023.8,50,7.2,0,0.0,0.0",
    "724940:23234,2008,01,01,01,12.1,-0.6,1023.8,50,7.2,8,0.0,0.0",
    "725030:14732,2008,01,01,00,3.0,-2.0,1011.1,200,4.6,19,0.0,0.0") // unknown code

  private lazy val stations = {
    val dir = Files.createTempDirectory("stations")
    Files.write(dir.resolve("s.csv"), stationCsv.mkString("\n").getBytes)
    WeatherStations.read(spark, dir.toString)
  }

  private lazy val readings = {
    import spark.implicits._
    WeatherCsv.valid(WeatherCsv.parseLines(readingCsv.toDS()))
  }

  test("station CSV decodes with typed coordinates") {
    val sfo = stations.filter(col("call_sign") === "KSFO").head
    assert(sfo.getAs[String]("name") == "SAN FRANCISCO INTL")
    assert(sfo.getAs[Double]("lat") == 37.619)
    val jan = stations.filter(col("id") === "10010:99999").head
    assert(jan.getAs[String]("state_code") == null) // empty field -> null
  }

  test("J3 enrichment joins by wsid via broadcast, keeps unmatched readings") {
    val e = WeatherStations.enrich(readings, stations)
    assert(e.count() == readings.count())
    assert(e.filter(col("wsid") === "724940:23234").head.getAs[String]("name")
      == "SAN FRANCISCO INTL")
    val p = e.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("J2 sky lookup decodes okta codes; unknown codes stay null (left join)") {
    val d = WeatherStations.withSkyText(readings)
    val clear = d.filter(col("hour") === 0 && col("wsid") === "724940:23234").head
    assert(clear.getAs[String]("condition") == "Clear (0 oktas)")
    val overcast = d.filter(col("hour") === 1).head
    assert(overcast.getAs[String]("condition") == "Overcast (8 oktas)")
    val unknown = d.filter(col("sky_condition") === 19).head
    assert(unknown.isNullAt(unknown.fieldIndex("condition")))
  }

  test("composite: human-readable current weather (latest reading + both lookups)") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("wsid")
      .orderBy(desc("year"), desc("month"), desc("day"), desc("hour"))
    val latest = readings.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val cur = WeatherStations.withSkyText(WeatherStations.enrich(latest, stations))
      .select(col("wsid"), col("name"), col("temperature"), col("condition"))
    val sfo = cur.filter(col("wsid") === "724940:23234").head
    assert(sfo.getAs[Double]("temperature") == 12.1) // hour 1 is newest
    assert(sfo.getAs[String]("condition") == "Overcast (8 oktas)")
  }
}
