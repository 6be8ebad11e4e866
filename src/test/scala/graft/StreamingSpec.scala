package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CounterStream

/** Streaming parity: the counter pipeline must equal the batch groupBy on
  * the same data (the property the reference delegates to Cassandra counter
  * columns — KafkaStreamingActor.scala:55-64), the upsert must be
  * idempotent under replay, and fan-out (one source, two sinks) must work.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  /** Stream the sf0.001 events table through a file source (ns->µs handled
    * the same way Tables.events does it for batch). FileStreamSource needs a
    * directory, so the table file is staged into a temp dir once. */
  private lazy val streamDir: String = {
    val dir = Files.createTempDirectory("events-stream")
    Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  private def eventStream() = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.readStream
      .schema("event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(streamDir)
    raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  test("streaming daily counter equals batch groupBy.sum") {
    val (q, store) = CounterStream.dailyCounter(eventStream(), tmp("ckpt-counter"))
    q.awaitTermination()
    val batch = Tables.events(spark, sf)
      .groupBy(col("user_id"), to_date(col("ts")).as("dy"))
      .agg(sum("value").as("total"), count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getLong(0), r.getDate(1)) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    val got = store.snapshot
    assert(got.size == batch.size)
    batch.foreach { case (k, (total, cnt)) =>
      val (gt, gc) = got(k)
      assert(gc == cnt && math.abs(gt - total) < 1e-6, s"key $k")
    }
  }

  test("overwrite-by-key upsert is idempotent under batch replay") {
    val store = new CounterStream.KeyedStore
    val updates = Seq((1L, java.sql.Date.valueOf("2024-01-01"), 10.5, 3L),
      (2L, java.sql.Date.valueOf("2024-01-02"), 4.0, 1L))
    def apply(): Unit = updates.foreach { case (u, d, t, c) => store.m.put((u, d), (t, c)) }
    apply(); val once = store.snapshot
    apply(); val twice = store.snapshot // replayed batch (same recomputed aggregates)
    assert(once == twice)
  }

  test("fan-out: raw append sink + counter sink from the same source") {
    val outDir = tmp("raw-out")
    val q1 = CounterStream.rawAppend(eventStream(), outDir, tmp("ckpt-raw"))
    val (q2, store) = CounterStream.dailyCounter(eventStream(), tmp("ckpt-counter2"))
    q1.awaitTermination(); q2.awaitTermination()
    assert(spark.read.parquet(outDir).count() == 1000L)
    assert(store.snapshot.nonEmpty)
  }

  test("watermarked tumbling-window agg equals batch window agg") {
    val agg = CounterStream.windowedSum(eventStream())
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out")
      .option("checkpointLocation", tmp("ckpt-win"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("win_out")
      .select(col("window.start").as("ws"), col("event_type"), col("total"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(sum("value").as("total"), count(lit(1)).as("cnt"))
      .select(col("window.start").as("ws"), col("event_type"), col("total"), col("cnt"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap
    // Append mode emits only FINALIZED windows: those older than
    // max(event_time) - 2d watermark. Later windows are correctly withheld
    // at stream end (they'd be emitted once more data advances the clock).
    val maxTs = Tables.events(spark, sf)
      .agg(max("ts")).collect().head.getTimestamp(0).toInstant
    val horizon = maxTs.minus(java.time.Duration.ofDays(2))
    assert(streamed.keySet.subsetOf(batch.keySet))
    batch.foreach { case (k @ (ws, _), (t, c)) =>
      val windowEnd = ws.toInstant.plus(java.time.Duration.ofDays(1))
      if (!windowEnd.isAfter(horizon)) {
        val (st, sc) = streamed(k)
        assert(sc == c && math.abs(st - t) < 1e-6, s"finalized window $k")
      } else {
        assert(!streamed.contains(k), s"non-finalized window $k must be withheld")
      }
    }
  }
}
