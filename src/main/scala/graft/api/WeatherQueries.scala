package graft.api

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions.{centi, fround}

/** Typed query facade — the engine's equivalent of the reference's actor
  * query API (WeatherEvent.scala:36-59 request messages; NodeGuardian.scala:
  * 70-75 routing). One method per request type, returning typed Datasets or
  * Options (the `NoDataAvailable` null-object of Weather.scala:118 becomes
  * None — SURVEY §7.0's mapping).
  *
  * Every method pushes its key predicates into the scan (Catalyst turns the
  * filters into parquet predicate pushdown + partition pruning on a
  * partitioned layout) and aggregates distributively — the reference
  * collected values to the driver and folded (TemperatureActor.scala:59-60),
  * which this deliberately does not reproduce.
  */
object WeatherQueries {
  final case class Reading(stationId: Long, eventId: Long, kind: String, value: Double)
  final case class DailyStats(stationId: Long, year: Int, month: Int, day: Int,
      high: Double, low: Double, mean: Double, variance: Double, stdev: Double)
  final case class MonthlyHiLow(stationId: Long, year: Int, month: Int, hi: Double, lo: Double)
  final case class AnnualSum(stationId: Long, year: Int, total: Double, count: Long)
  final case class StationDay(stationId: Long, day: java.sql.Date, total: Double)
  final case class Station(id: Long, name: String, nation: String, region: String)
}

final class WeatherQueries(spark: SparkSession, dir: String) {
  import WeatherQueries._
  import spark.implicits._

  private def events = Tables.events(spark, dir)

  /** GetCurrentWeather (WeatherStationActor.scala:43-48): newest reading.
    * The reference leaned on storage DESC order; ordering here is explicit. */
  def currentReading(stationId: Long): Option[Reading] =
    events.filter(col("user_id") === stationId)
      .orderBy(desc("event_id")).limit(1)
      .select(col("user_id").as("stationId"), col("event_id").as("eventId"),
        col("event_type").as("kind"), col("value"))
      .as[Reading].collect().headOption

  /** GetDailyTemperature (TemperatureActor.scala:55-60): one station-day's
    * stats, population variance per StatCounter semantics. */
  def dailyStats(stationId: Long, year: Int, month: Int, day: Int): Option[DailyStats] =
    dailyStatsDs(Some(stationId))
      .filter(d => d.year == year && d.month == month && d.day == day)
      .collect().headOption

  /** Full daily rollup (optionally one station) as a typed Dataset. */
  def dailyStatsDs(stationId: Option[Long] = None): Dataset[DailyStats] = {
    val varScaled = (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) / col("n")
    val base = stationId.fold(events)(id => events.filter(col("user_id") === id))
    base.withColumn("iv", centi(col("value")))
      .groupBy(col("user_id").as("stationId"), year(col("ts")).as("year"),
        month(col("ts")).as("month"), dayofmonth(col("ts")).as("day"))
      .agg(max("value").as("high"), min("value").as("low"),
        count(lit(1)).as("n"), sum("iv").as("s1"), sum(col("iv") * col("iv")).as("s2"))
      .select(col("stationId"), col("year"), col("month"), col("day"),
        col("high"), col("low"),
        fround(col("s1").cast("double") / col("n") / 100.0, 4).as("mean"),
        fround(varScaled / 10000.0, 4).as("variance"),
        fround(sqrt(varScaled) / 100.0, 4).as("stdev"))
      .as[DailyStats]
  }

  /** GetMonthlyTemperature (TemperatureActor.scala:65-69): hi/lo over the
    * daily rollup — the reference's aggregation-of-aggregates cascade. */
  def monthlyHiLow(stationId: Long, year: Int, month: Int): Option[MonthlyHiLow] =
    dailyStatsDs(Some(stationId))
      .filter(d => d.year == year && d.month == month)
      .groupByKey(d => (d.stationId, d.year, d.month))
      .mapGroups { (k: (Long, Int, Int), ds: Iterator[DailyStats]) =>
        val l = ds.toSeq
        MonthlyHiLow(k._1, k._2, k._3, l.map(_.high).max, l.map(_.low).min)
      }.collect().headOption

  /** GetPrecipitation (PrecipitationActor.scala:39-44): annual total. */
  def annualSum(stationId: Long, year: Int): Option[AnnualSum] =
    events.filter(col("user_id") === stationId &&
        col("event_type") === "purchase" && org.apache.spark.sql.functions.year(col("ts")) === year)
      .groupBy(col("user_id").as("stationId"))
      .agg(fround(sum("value"), 2).as("total"), count(lit(1)).as("count"))
      .withColumn("year", lit(year))
      .select(col("stationId"), col("year"), col("total"), col("count"))
      .as[AnnualSum].collect().headOption

  /** GetTopKPrecipitation (PrecipitationActor.scala:47-55): k largest
    * station-days — TakeOrderedAndProject, the distributed RDD.top(k). */
  def topKDays(k: Int): Seq[StationDay] =
    events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("stationId"), to_date(col("ts")).as("day"))
      .agg(fround(sum("value"), 2).as("total"))
      .orderBy(desc("total"), col("stationId"), col("day"))
      .limit(k)
      .as[StationDay].collect().toSeq

  /** GetWeatherStation (WeatherStationActor.scala:55-58): dimension lookup
    * enriched through broadcast joins. */
  def station(id: Long): Option[Station] =
    Tables.customer(spark, dir).filter(col("c_custkey") === id)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey").as("id"), col("c_name").as("name"),
        col("n_name").as("nation"), col("r_name").as("region"))
      .as[Station].collect().headOption

  /** The write-back cascade (TemperatureActor.scala:76-77 + 65-69): persist
    * the daily rollup, serve monthly queries from it. */
  def materializeDaily(outDir: String): Unit =
    dailyStatsDs(None).write.mode("overwrite").parquet(outDir)

  def monthlyFromRollup(rollupDir: String): Dataset[MonthlyHiLow] =
    spark.read.parquet(rollupDir)
      .groupBy(col("stationId"), col("year"), col("month"))
      .agg(max("high").as("hi"), min("low").as("lo"))
      .as[MonthlyHiLow]
}
