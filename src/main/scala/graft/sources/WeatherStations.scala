package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The weather_station dimension and the sky_condition_lookup code table —
  * the reference's two lookup entities (create-timeseries.cql:15-24 and
  * :50-58; station CSV shape per FIXTURES.md §2:
  * `id,name,country_code,state_code,call_sign,lat,long,elevation`).
  *
  * Scale notes: both are classic broadcast dimensions (19,704 stations ≈
  * 2 MB; 9 okta codes) — every enrichment join on them must be a broadcast
  * hash join, never a shuffle (asserted in WeatherStationsSpec).
  */
object WeatherStations {

  val stationSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("country_code", StringType),
    StructField("state_code", StringType),
    StructField("call_sign", StringType),
    StructField("lat", DoubleType),
    StructField("long", DoubleType),
    StructField("elevation", DoubleType)))

  /** Batch reader for the station dimension CSV (S11-style load). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(stationSchema).csv(path)

  /** WMO okta cloud-cover codes (0-8 plus 9 = sky obscured) — the public
    * meteorological code table the reference's sky_condition_lookup holds. */
  def skyConditionLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      0 -> "Clear (0 oktas)",
      1 -> "Few clouds (1 okta)",
      2 -> "Few clouds (2 oktas)",
      3 -> "Scattered (3 oktas)",
      4 -> "Scattered (4 oktas)",
      5 -> "Broken (5 oktas)",
      6 -> "Broken (6 oktas)",
      7 -> "Broken (7 oktas)",
      8 -> "Overcast (8 oktas)",
      9 -> "Sky obscured").toDF("code", "condition")
  }

  /** J3: enrich readings with station metadata (broadcast). */
  def enrich(readings: DataFrame, stations: DataFrame): DataFrame =
    readings.join(broadcast(stations), readings("wsid") === stations("id"), "left")
      .drop("id")

  /** J2: decode sky_condition okta codes to text (broadcast lookup). */
  def withSkyText(readings: DataFrame): DataFrame = {
    val lookup = skyConditionLookup(readings.sparkSession)
    readings.join(broadcast(lookup),
      readings("sky_condition") === lookup("code"), "left").drop("code")
  }
}
