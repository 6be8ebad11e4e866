package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE events file-stream recipe, in one place: stage the (single-file)
  * events table into a watched directory and open it as a streaming frame
  * with the same TIMESTAMP(NANOS) handling the batch path applies
  * (Tables.events) — nanos read as long under the legacy conf, converted
  * to a µs TimestampType. StreamDemo, the stream≡batch equivalence specs,
  * and any future streaming consumer share this one spelling, so the
  * schema/encoding can never silently drift between copies. A Kafka topic
  * takes the staged directory's place in production. */
object EventStreamSource {

  val schemaDDL =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, value DOUBLE, props STRING"

  /** Copy a single table file into a fresh watched directory. */
  def stageToDir(file: String, prefix: String = "stream-src"): String = {
    val dir = Files.createTempDirectory(prefix)
    val src = java.nio.file.Paths.get(file)
    Files.copy(src, dir.resolve(src.getFileName))
    dir.toString
  }

  /** Streaming frame over an already-staged directory of events files. */
  def fromDir(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.readStream
      .schema(schemaDDL)
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }

  /** Stage `$sfDir/events.parquet` and open it as a stream. */
  def staged(spark: SparkSession, sfDir: String): DataFrame =
    fromDir(spark, stageToDir(s"$sfDir/events.parquet"))
}
