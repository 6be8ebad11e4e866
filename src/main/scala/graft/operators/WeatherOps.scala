package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GraftQuery, Tables}
import graft.functions.GraftFunctions.fround

/** Reference-parity query surface (killrweather's on-demand query API),
  * mapped onto the driver testdata: `events` plays `raw_weather_data`
  * (user_id ≈ wsid, value ≈ measurement, ts ≈ observation time) and
  * customer/nation/region play the station dimension tables.
  *
  * References (under /root/reference):
  *  - TemperatureActor.scala:55-69,87-103 (daily stats, monthly hi/low)
  *  - PrecipitationActor.scala:39-55      (annual sum, top-k)
  *  - WeatherStationActor.scala:43-58     (station lookup, latest reading)
  *  - KafkaStreamingActor.scala:47-64     (daily counter — batch equivalent here;
  *    streaming equivalent in graft.streaming.CounterStream)
  *
  * Scale notes: every aggregation here is a distributed partial→final
  * hash aggregate on the grouping keys (the reference collected values to
  * the driver and folded them — TemperatureActor.scala:59-60 — which cannot
  * scale; we keep it fully distributed). Dimension joins broadcast the small
  * side so the fact scan never shuffles.
  */
object WeatherOps {

  /** Daily per-station stats. StatCounter in the reference is *population*
    * variance (TemperatureActor.scala:100-103), hence var_pop semantics.
    * mean/variance/stdev are derived from exact fixed-point sums (n, Σv,
    * Σv²) instead of the built-in var_pop: the sums are exact integers, so
    * the derived doubles are bit-identical across engines and partitionings
    * (a Welford-style var_pop differs in the last ulp depending on
    * accumulation order, which can flip a rounding boundary). */
  private val dailyStats = GraftQuery(
    "w_daily_stats",
    "A1 daily high/low/mean/var_pop/stddev_pop per (station, y, m, d)",
    (s, d) => {
      val varScaled = (col("s2").cast("double") - col("s1").cast("double") * col("s1") / col("n")) / col("n")
      Tables.events(s, d)
        .withColumn("iv", graft.functions.GraftFunctions.centi(col("value")))
        .groupBy(col("user_id"), year(col("ts")).as("yr"),
          month(col("ts")).as("mon"), dayofmonth(col("ts")).as("dy"))
        .agg(
          fround(max("value"), 2).as("high"),
          fround(min("value"), 2).as("low"),
          count(lit(1)).as("n"),
          sum("iv").as("s1"),
          sum(col("iv") * col("iv")).as("s2"))
        .select(col("user_id"), col("yr"), col("mon"), col("dy"),
          col("high"), col("low"),
          graft.functions.GraftFunctions.fround(col("s1").cast("double") / col("n") / 100.0, 4).as("mean_val"),
          graft.functions.GraftFunctions.fround(varScaled / 10000.0, 4).as("variance"),
          graft.functions.GraftFunctions.fround(sqrt(varScaled) / 100.0, 4).as("stdev"))
        .orderBy("user_id", "yr", "mon", "dy")
    },
    Some("""SELECT user_id, yr, mon, dy, high, low, floor(CAST(s1 AS DOUBLE) / n / 100.0 * 10000.0 + 0.5) / 10000.0 AS mean_val, floor((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n / 10000.0 * 10000.0 + 0.5) / 10000.0 AS variance, floor(sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * s1 / n) / n) / 100.0 * 10000.0 + 0.5) / 10000.0 AS stdev FROM (SELECT user_id, CAST(year(ts) AS INTEGER) AS yr, CAST(month(ts) AS INTEGER) AS mon, CAST(day(ts) AS INTEGER) AS dy, floor(max(value) * 100.0 + 0.5) / 100.0 AS high, floor(min(value) * 100.0 + 0.5) / 100.0 AS low, count(*) AS n, CAST(sum(iv) AS BIGINT) AS s1, CAST(sum(iv * iv) AS BIGINT) AS s2 FROM (SELECT *, CAST(floor(value * 100 + 0.5) AS BIGINT) AS iv FROM events) GROUP BY 1, 2, 3, 4) ORDER BY 1, 2, 3, 4"""))

  /** Monthly hi/low — an aggregation of the daily aggregates (the reference
    * reads back its own daily write-backs: TemperatureActor.scala:65-69). */
  private val monthlyHiLow = GraftQuery(
    "w_monthly_hilo",
    "A2 monthly max(high)/min(low) over the daily rollup",
    (s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("user_id"), year(col("ts")).as("yr"),
          month(col("ts")).as("mon"), dayofmonth(col("ts")).as("dy"))
        .agg(fround(max("value"), 2).as("high"), fround(min("value"), 2).as("low"))
      daily.groupBy("user_id", "yr", "mon")
        .agg(max("high").as("hi"), min("low").as("lo"))
        .orderBy("user_id", "yr", "mon")
    },
    Some("""SELECT user_id, yr, mon, max(high) AS hi, min(low) AS lo FROM (SELECT user_id, CAST(year(ts) AS INTEGER) AS yr, CAST(month(ts) AS INTEGER) AS mon, CAST(day(ts) AS INTEGER) AS dy, floor(max(value) * 100.0 + 0.5) / 100.0 AS high, floor(min(value) * 100.0 + 0.5) / 100.0 AS low FROM events GROUP BY 1, 2, 3, 4) GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""))

  /** Annual sum per station (ref PrecipitationActor.scala:39-44; 'purchase'
    * events stand in for precipitation readings). */
  private val annualSum = GraftQuery(
    "w_annual_precip",
    "A3 annual precipitation sum per station",
    (s, d) => Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), year(col("ts")).as("yr"))
      .agg(graft.functions.GraftFunctions.fround(
          sum(graft.functions.GraftFunctions.centi(col("value"))).cast("double") / 100.0, 2)
          .as("precip"),
        count(lit(1)).as("cnt"))
      .orderBy("user_id", "yr"),
    Some("""SELECT user_id, CAST(year(ts) AS INTEGER) AS yr, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS precip, count(*) AS cnt FROM events WHERE event_type = 'purchase' GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** Top-k daily totals (ref PrecipitationActor.scala:47-55 uses RDD.top(k);
    * Catalyst's TakeOrderedAndProject is the same per-partition-heap+merge
    * algorithm, picked automatically for orderBy+limit). */
  private val topK = GraftQuery(
    "w_topk_precip",
    "A4/O2 top-10 station-days by daily total",
    (s, d) => Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), to_date(col("ts")).as("dy"))
      .agg(sum(graft.functions.GraftFunctions.centi(col("value"))).as("p"))
      .orderBy(desc("p"), col("user_id"), col("dy"))
      .limit(10)
      .select(col("user_id"), col("dy"),
        fround(col("p").cast("double") / 100.0, 2).as("precip"))
      .orderBy(desc("precip"), col("user_id"), col("dy")),
    Some("""SELECT user_id, dy, floor(CAST(p AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS precip FROM (SELECT user_id, CAST(ts AS DATE) AS dy, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS p FROM events WHERE event_type = 'purchase' GROUP BY 1, 2 ORDER BY p DESC, user_id, dy LIMIT 10) ORDER BY precip DESC, user_id, dy"""))

  /** PER-STATION top-k daily totals — the reference's A4 top-k
    * (PrecipitationActor.scala:47-55) in its per-station window form:
    * instead of one global top-10, every station keeps its own 3 wettest
    * days. Spelled DECLARATIVELY (row_number over the daily rollup,
    * filtered and dropped) so [[graft.WindowTopKRewrite]] lowers it to the
    * bounded-heap TopKPerKey operator, whose partial pass fuses into the
    * aggregate's whole-stage-codegen span (plan-asserted in
    * Round12OpsSpec). Scale: the heap rides the map-side output of the
    * (station, day) aggregate — O(n log k) per partition, no per-group
    * sort, and the shuffle carries at most k rows per (station, partition). */
  private val topKPerStation = GraftQuery(
    "w_topk_precip_perkey",
    "A4/O2 per-station top-3 precip days via the auto-lowered heap operator",
    (s, d) => {
      val daily = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), to_date(col("ts")).as("dy"))
        .agg(sum(graft.functions.GraftFunctions.centi(col("value"))).as("p"))
      val w = Window.partitionBy("user_id").orderBy(desc("p"), col("dy"))
      daily.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .drop("rn")
        .select(col("user_id"), col("dy"),
          fround(col("p").cast("double") / 100.0, 2).as("precip"))
        .orderBy("user_id", "dy")
    },
    Some("""WITH daily AS (SELECT user_id, CAST(ts AS DATE) AS dy, CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS p FROM events WHERE event_type = 'purchase' GROUP BY 1, 2), rk AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY p DESC, dy) AS rn FROM daily) SELECT user_id, dy, floor(CAST(p AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS precip FROM rk WHERE rn <= 3 ORDER BY user_id, dy"""))

  /** Latest reading per station (ref WeatherStationActor.scala:43-48 relies
    * on Cassandra DESC clustering; here the ordering is explicit — SURVEY §1.4).
    * event_id is monotone in ts, so ordering by it avoids the ns-vs-µs
    * timestamp precision mismatch between Spark and DuckDB. */
  private val latest = GraftQuery(
    "w_latest_reading",
    "P8/O1/O3 current (= newest) reading per station via row_number desc",
    (s, d) => Tables.events(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id").orderBy(desc("event_id"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy("user_id"),
    Some("""SELECT user_id, event_id, event_type, value FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events) WHERE rn = 1 ORDER BY user_id"""))

  /** Station metadata lookup via dimension joins (ref J3: weather_station
    * keyed by the same id as readings; 19k-row dim table => broadcast). */
  private val stationInfo = GraftQuery(
    "w_station_info",
    "S6/J3 station lookup enriched through two broadcast dimension joins",
    (s, d) => Tables.customer(s, d)
      .filter(col("c_custkey") <= 100)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select("c_custkey", "c_name", "n_name", "r_name")
      .orderBy("c_custkey"),
    Some("""SELECT c_custkey, c_name, n_name, r_name FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey WHERE c_custkey <= 100 ORDER BY c_custkey"""))

  /** Readings enriched with station dimension, aggregated per segment
    * (ref J2: the sky_condition_lookup code→text broadcast join pattern). */
  private val enrichedAgg = GraftQuery(
    "w_enriched_agg",
    "J2 fact-to-dimension broadcast join + aggregate per dimension attribute",
    (s, d) => Tables.events(s, d)
      .join(broadcast(Tables.customer(s, d)), col("user_id") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("cnt"),
        graft.functions.GraftFunctions.fround(
          sum(graft.functions.GraftFunctions.centi(col("value"))).cast("double") / 100.0, 2)
          .as("total"))
      .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, count(*) AS cnt, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total FROM events JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1"""))

  /** Full-scan count (ref A7: SimpleSparkJob.scala:26-31). */
  private val countRaw = GraftQuery(
    "w_count_raw",
    "A7 full table count — parquet row-group metadata count, no data read",
    (s, d) => Tables.lineitem(s, d).agg(count(lit(1)).as("cnt")),
    Some("""SELECT count(*) AS cnt FROM lineitem"""))

  /** Distinct stations active in a time range (ref A8/P6:
    * UserEventsAggregate.scala:62-64 — distinct user ids in a window). */
  private val distinctUsers = GraftQuery(
    "w_distinct_users",
    "A8/P6 distinct keys within a time-range predicate",
    (s, d) => Tables.events(s, d)
      .filter(to_date(col("ts")).between("2024-01-05", "2024-01-15"))
      .select("user_id").distinct()
      .orderBy("user_id"),
    Some("""SELECT DISTINCT user_id FROM events WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-05' AND DATE '2024-01-15' ORDER BY user_id"""))

  /** Batch equivalent of the streaming daily counter (ref S8/A5:
    * KafkaStreamingActor.scala:62-64 + the counter table). The streaming
    * path (update-mode sum + idempotent overwrite-by-key upsert) lives in
    * graft.streaming.CounterStream and is asserted equal to this in tests. */
  private val dailyCounter = GraftQuery(
    "w_daily_counter",
    "S8/A5 keyed running sum (counter-table emulation), batch view",
    (s, d) => Tables.events(s, d)
      .groupBy(col("user_id"), to_date(col("ts")).as("dy"))
      .agg(graft.functions.GraftFunctions.fround(
          sum(graft.functions.GraftFunctions.centi(col("value"))).cast("double") / 100.0, 2)
          .as("total"),
        count(lit(1)).as("cnt"))
      .orderBy("user_id", "dy"),
    Some("""SELECT user_id, CAST(ts AS DATE) AS dy, floor(CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 * 100.0 + 0.5) / 100.0 AS total, count(*) AS cnt FROM events GROUP BY 1, 2 ORDER BY 1, 2"""))

  /** The reference's okta sky-condition decode table, CONTENT-faithful:
    * the 17 seeded rows of `sky_condition_lookup`
    * (ref: data/load-timeseries.cql:14-29; schema at
    * create-timeseries.cql:61-64; the Scala-side mapping lives in
    * WeatherEvent.scala's Sky* types). Codes are sparse — 0..10 then
    * 12,13,14,16,19 — so the inner join also exercises the
    * no-matching-code drop (events hashing to 11/15/17/18 vanish).
    * The dimension is a 17-row LocalRelation: broadcast by construction,
    * the exact J2 lookup shape at any fact scale. */
  private val skyLookup = GraftQuery(
    "w_sky_lookup",
    "J2 okta sky-condition decode: seeded 17-row reference dimension joined to facts",
    (s, d) => {
      import s.implicits._
      val sky = Seq(
        0L -> "None, SKC or CLR",
        1L -> "One okta - 1/10 or less but not zero",
        2L -> "Two oktas - 2/10 - 3/10, or FEW",
        3L -> "Three oktas - 4/10",
        4L -> "Four oktas - 5/10, or SCT",
        5L -> "Five oktas - 6/10",
        6L -> "Six oktas - 7/10 - 8/10",
        7L -> "Seven oktas - 9/10 or more but not 10/10, or BKN",
        8L -> "Eight oktas - 10/10, or OVC",
        9L -> "Sky obscured, or cloud amount cannot be estimated",
        10L -> "Partial obscuration 11: Thin scattered",
        12L -> "Scattered",
        13L -> "Dark scattered",
        14L -> "Thin broken 15: Broken",
        16L -> "Dark broken 17: Thin overcast 18: Overcast",
        19L -> "Dark overcast"
      ).toDF("code", "condition")
      Tables.events(s, d)
        .select(pmod(col("event_id"), lit(20L)).as("code"))
        .join(broadcast(sky), Seq("code"))
        .groupBy("code", "condition")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("code")
    },
    Some("""WITH sky(code, condition) AS (VALUES (0, 'None, SKC or CLR'), (1, 'One okta - 1/10 or less but not zero'), (2, 'Two oktas - 2/10 - 3/10, or FEW'), (3, 'Three oktas - 4/10'), (4, 'Four oktas - 5/10, or SCT'), (5, 'Five oktas - 6/10'), (6, 'Six oktas - 7/10 - 8/10'), (7, 'Seven oktas - 9/10 or more but not 10/10, or BKN'), (8, 'Eight oktas - 10/10, or OVC'), (9, 'Sky obscured, or cloud amount cannot be estimated'), (10, 'Partial obscuration 11: Thin scattered'), (12, 'Scattered'), (13, 'Dark scattered'), (14, 'Thin broken 15: Broken'), (16, 'Dark broken 17: Thin overcast 18: Overcast'), (19, 'Dark overcast')) SELECT CAST(sky.code AS BIGINT) AS code, sky.condition, count(*) AS cnt FROM (SELECT event_id % 20 AS code FROM events) e JOIN sky ON e.code = sky.code GROUP BY 1, 2 ORDER BY 1"""))

  val all: Seq[GraftQuery] = Seq(
    dailyStats, monthlyHiLow, annualSum, topK, topKPerStation, latest,
    stationInfo, enrichedAgg, countRaw, distinctUsers, dailyCounter,
    skyLookup)
}
