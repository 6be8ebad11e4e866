package graft.streaming

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *             upserted idempotently by key
  *         (c) corrupt-line quarantine — the PERMISSIVE corrupt-record
  *             channel; the reference had no answer for bad lines (its
  *             parser threw mid-batch, Weather.scala:93)
  *
  * Scale notes: the parse is stateless and shuffle-free; only the counter
  * leg shuffles (keyed state, bounded by active station-days). Each sink is
  * its own streaming query with its own checkpoint — independent recovery,
  * exactly the fan-out the reference builds with two saveToCassandra calls.
  */
object WeatherIngest {

  /** Counter-table test double keyed by (wsid, year, month, day) —
    * overwrite-by-key upsert (a real deployment MERGEs into Cassandra/Delta). */
  final class PrecipStore {
    val m: TrieMap[(String, Int, Int, Int), (Double, Long)] = TrieMap.empty
    def snapshot: Map[(String, Int, Int, Int), (Double, Long)] = m.toMap
  }

  final case class Running(raw: StreamingQuery, quarantine: StreamingQuery,
      counter: StreamingQuery, store: PrecipStore) {
    def awaitAll(): Unit = { raw.awaitTermination(); quarantine.awaitTermination();
      counter.awaitTermination() }
  }

  /** Declare all three sinks over one line source and start them. */
  def start(
      lines: DataFrame, // streaming DataFrame with a `value: String` column
      rawOut: String,
      quarantineOut: String,
      checkpointRoot: String): Running = {
    import lines.sparkSession.implicits._
    val parsed = WeatherCsv.parseLines(lines.as[String])

    val rawQ = WeatherCsv.valid(parsed).writeStream
      .format("parquet")
      .option("path", rawOut)
      .option("checkpointLocation", s"$checkpointRoot/raw")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

    val qQ = parsed.filter(col("_corrupt_record").isNotNull)
      .select(col("_corrupt_record").as("line"))
      .writeStream
      .format("parquet")
      .option("path", quarantineOut)
      .option("checkpointLocation", s"$checkpointRoot/quarantine")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()

    // counter leg (S8/A5): update-mode keyed sum, idempotent overwrite-by-key
    val store = new PrecipStore
    val cQ = WeatherCsv.withPrecipDefaults(WeatherCsv.valid(parsed))
      .groupBy("wsid", "year", "month", "day")
      .agg(sum("one_hour_precip").as("precipitation"), count(lit(1)).as("cnt"))
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$checkpointRoot/counter")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.collect().foreach { r =>
          store.m.put((r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)),
            (r.getDouble(4), r.getLong(5)))
        }
      }
      .trigger(Trigger.AvailableNow())
      .start()

    Running(rawQ, qQ, cQ, store)
  }
}
