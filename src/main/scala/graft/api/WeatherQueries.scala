package graft.api

import scala.concurrent.{ExecutionContext, Future}

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
    * stats, population variance per StatCounter semantics. The full
    * (station, y, m, d) key is pushed into the SCAN as Column predicates —
    * the reference pushed the same key to storage (TemperatureActor.scala:
    * 57-58); filtering after aggregation would scan the station's entire
    * history to answer one day. */
  def dailyStats(stationId: Long, year: Int, month: Int, day: Int): Option[DailyStats] =
    dailyStatsPlan(stationId, year, month, day).collect().headOption

  /** The one-station-day plan (exposed so tests can assert the pushed
    * predicates on `queryExecution`). */
  def dailyStatsPlan(stationId: Long, yr: Int, mon: Int, day: Int): Dataset[DailyStats] =
    dailyRollup(events.filter(col("user_id") === stationId &&
      year(col("ts")) === yr && month(col("ts")) === mon &&
      dayofmonth(col("ts")) === day))

  /** Full daily rollup (optionally one station) as a typed Dataset. */
  def dailyStatsDs(stationId: Option[Long] = None): Dataset[DailyStats] =
    dailyRollup(stationId.fold(events)(id => events.filter(col("user_id") === id)))

  private def dailyRollup(base: Dataset[org.apache.spark.sql.Row]): Dataset[DailyStats] = {
    val varScaled = (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) / col("n")
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
    * daily rollup — the reference's aggregation-of-aggregates cascade. The
    * (station, y, m) key filters the scan, and the rollup-of-rollup is a
    * relational `groupBy.agg` (partial aggregation map-side) — a `mapGroups`
    * here would ship every daily row through the shuffle whole. */
  def monthlyHiLow(stationId: Long, year: Int, month: Int): Option[MonthlyHiLow] =
    monthlyHiLowPlan(stationId, year, month).collect().headOption

  /** The one-station-month plan (exposed for plan assertions in tests). */
  def monthlyHiLowPlan(stationId: Long, yr: Int, mon: Int): Dataset[MonthlyHiLow] =
    dailyRollup(events.filter(col("user_id") === stationId &&
        year(col("ts")) === yr && month(col("ts")) === mon))
      .groupBy(col("stationId"), col("year"), col("month"))
      .agg(max("high").as("hi"), min("low").as("lo"))
      .as[MonthlyHiLow]

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

  /** Non-blocking facade — the reference's query plane never blocked an
    * actor on a Spark job (`collectAsync` piped to the requester,
    * TemperatureActor.scala:59-60, syntax/FutureSyntax.scala:12-22). Each
    * method runs the same plan on the caller's ExecutionContext and
    * completes a Future. Spark's scheduler is thread-safe, so concurrent
    * queries from different threads interleave (pair with FAIR scheduler
    * pools when sharing a cluster). */
  final class Async(implicit ec: ExecutionContext) {
    private val sync = WeatherQueries.this

    /** A10 — request coalescing: identical CONCURRENT requests share one
      * running Future (the reference's client kept a `queried` set so the
      * same query was never issued twice, KillrWeatherClientApp.scala:
      * 95-99). Completed entries evict themselves, so a later identical
      * request re-executes against fresh data — this coalesces in-flight
      * duplicates (a thundering-herd guard), it is NOT a result cache.
      * The holder + putIfAbsent dance makes the side effect (starting the
      * job) happen exactly once per key even under a race — same pattern
      * as [[graft.PersistCache]]. */
    private final class Holder[T](run: () => T, done: Holder[T] => Unit) {
      lazy val fut: Future[T] = {
        val f = Future(run())
        f.onComplete(_ => done(this))
        f
      }
    }
    private val inflight =
      scala.collection.concurrent.TrieMap.empty[Any, Holder[_]]
    private def coalesced[T](key: Any)(run: => T): Future[T] = {
      val h = new Holder[T](() => run, me => inflight.remove(key, me))
      inflight.putIfAbsent(key, h).getOrElse(h)
        .asInstanceOf[Holder[T]].fut
    }

    def currentReading(stationId: Long): Future[Option[Reading]] =
      coalesced(("currentReading", stationId))(sync.currentReading(stationId))
    def dailyStats(stationId: Long, year: Int, month: Int, day: Int): Future[Option[DailyStats]] =
      coalesced(("dailyStats", stationId, year, month, day))(
        sync.dailyStats(stationId, year, month, day))
    def monthlyHiLow(stationId: Long, year: Int, month: Int): Future[Option[MonthlyHiLow]] =
      coalesced(("monthlyHiLow", stationId, year, month))(
        sync.monthlyHiLow(stationId, year, month))
    def annualSum(stationId: Long, year: Int): Future[Option[AnnualSum]] =
      coalesced(("annualSum", stationId, year))(sync.annualSum(stationId, year))
    def topKDays(k: Int): Future[Seq[StationDay]] =
      coalesced(("topKDays", k))(sync.topKDays(k))
    def station(id: Long): Future[Option[Station]] =
      coalesced(("station", id))(sync.station(id))
  }
  /** One Async per ExecutionContext, cached: the coalescing guard only
    * works when all callers share the `inflight` map, so `wq.async` must
    * hand two callers on the same EC the SAME instance (a fresh Async per
    * call would silently disable coalescing). */
  private val asyncPerEc =
    scala.collection.concurrent.TrieMap.empty[ExecutionContext, Async]
  def async(implicit ec: ExecutionContext): Async =
    asyncPerEc.getOrElseUpdate(ec, new Async)
}
