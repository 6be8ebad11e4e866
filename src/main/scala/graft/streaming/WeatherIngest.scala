package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.sources.WeatherCsv

/** The reference's flagship continuous-ingest pipeline (SURVEY §3.1;
  * KafkaStreamingActor.scala:39-66) end-to-end on the REAL wire format:
  *
  *   text lines (Kafka topic stand-in: any line source)
  *     → honest 13-column decode (WeatherCsv.parseLines; S2)
  *     → fan-out:
  *         (a) raw append sink — the raw_weather_data table (S7)
  *         (b) per-(wsid, y, m, d) one_hour_precip running sum in update
  *             mode — the daily_aggregate_precip COUNTER table (S8/A5),
  *             MERGE-upserted durably and idempotently by key
  *         (c) per-(wsid, y) running sum — the year_cumulative_precip
  *             COUNTER table (A6, create-timeseries.cql:86-91; present in
  *             the reference's schema though its app never writes it)
  *         (d) corrupt-line quarantine — the PERMISSIVE corrupt-record
  *             channel; the reference had no answer for bad lines (its
  *             parser threw mid-batch, Weather.scala:93)
  *
  * Scale notes: the parse is stateless and shuffle-free; only the counter
  * legs shuffle (keyed state, bounded by active station-days / station-
  * years). Each sink is its own streaming query with its own checkpoint —
  * independent recovery, exactly the fan-out the reference builds with two
  * saveToCassandra calls. The counter tables are [[KeyedParquetSink]]s:
  * durable across restarts and convergent under batch replay, unlike the
  * reference's Cassandra counters which double-count replayed increments.
  */
object WeatherIngest {

  /** Reader options for the production Kafka form of the line source
    * (KafkaStreamingActor.scala:39-40: the reference subscribes one topic
    * from a bootstrap list and treats each record value as a raw CSV line).
    * Pure so the plumbing is unit-testable in a zero-egress environment.
    *
    * `failOnDataLoss=false` mirrors the reference's at-least-once stance:
    * a compacted/expired offset should surface as a gap, not kill the
    * query — the durable counter sinks converge under replay anyway. */
  def kafkaOptions(
      bootstrap: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      "failOnDataLoss" -> "false") ++
      maxOffsetsPerTrigger.map("maxOffsetsPerTrigger" -> _.toString)

  /** The `format("kafka")` streaming frame behind the same parse/fan-out as
    * [[start]]: record value → `value: String` line column, exactly what
    * `WeatherCsv.parseLines` consumes. Requires the spark-sql-kafka
    * connector on the classpath at runtime (absent here — zero egress — so
    * specs assert the option plumbing and that this path reaches Spark's
    * source resolution; the file/memory sources are the tested stand-in). */
  def kafkaLines(
      s: org.apache.spark.sql.SparkSession,
      bootstrap: String,
      topic: String,
      startingOffsets: String = "earliest",
      maxOffsetsPerTrigger: Option[Long] = None): DataFrame =
    s.readStream
      .format("kafka")
      .options(kafkaOptions(bootstrap, topic, startingOffsets, maxOffsetsPerTrigger))
      .load()
      .selectExpr("CAST(value AS STRING) AS value")

  final case class Running(raw: StreamingQuery, quarantine: StreamingQuery,
      counter: StreamingQuery, yearCounter: StreamingQuery,
      dailySink: KeyedParquetSink, yearSink: KeyedParquetSink) {
    def awaitAll(): Unit = { raw.awaitTermination(); quarantine.awaitTermination();
      counter.awaitTermination(); yearCounter.awaitTermination() }
  }

  /** Declare all four sinks over one line source and start them.
    * `tableRoot` holds the two durable counter tables
    * (`$tableRoot/daily_precip`, `$tableRoot/year_precip`).
    * `trigger` defaults to AvailableNow (drain-and-stop, the batch-bench
    * and test shape); BenchStream's steady-state leg passes a
    * ProcessingTime trigger so the fan-out keeps polling a live spool at
    * a fixed cadence instead of terminating at the current file set. */
  def start(
      lines: DataFrame, // streaming DataFrame with a `value: String` column
      rawOut: String,
      quarantineOut: String,
      checkpointRoot: String,
      tableRoot: String,
      trigger: Trigger = Trigger.AvailableNow()): Running = {
    import lines.sparkSession.implicits._
    val parsed = WeatherCsv.parseLines(lines.as[String])

    val rawQ = WeatherCsv.valid(parsed).writeStream
      .format("parquet")
      .option("path", rawOut)
      .option("checkpointLocation", s"$checkpointRoot/raw")
      .outputMode("append")
      .trigger(trigger)
      .start()

    val qQ = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("line"))
      .writeStream
      .format("parquet")
      .option("path", quarantineOut)
      .option("checkpointLocation", s"$checkpointRoot/quarantine")
      .outputMode("append")
      .trigger(trigger)
      .start()

    val measured = WeatherCsv.withPrecipDefaults(WeatherCsv.valid(parsed))

    // counter leg (S8/A5): update-mode keyed sum, durable idempotent MERGE
    val dailySink = new KeyedParquetSink(s"$tableRoot/daily_precip",
      Seq("wsid", "year", "month", "day"))
    val cQ = measured
      .groupBy("wsid", "year", "month", "day")
      .agg(sum("one_hour_precip").as("precipitation"), count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$checkpointRoot/counter")
      .foreachBatch { (batch: DataFrame, _: Long) => dailySink.upsert(batch) }
      .trigger(trigger)
      .start()

    // year-cumulative leg (A6): same machinery at year grain
    val yearSink = new KeyedParquetSink(s"$tableRoot/year_precip",
      Seq("wsid", "year"))
    val yQ = measured
      .groupBy("wsid", "year")
      .agg(sum("one_hour_precip").as("precipitation"), count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$checkpointRoot/year_counter")
      .foreachBatch { (batch: DataFrame, _: Long) => yearSink.upsert(batch) }
      .trigger(trigger)
      .start()

    Running(rawQ, qQ, cQ, yQ, dailySink, yearSink)
  }
}
