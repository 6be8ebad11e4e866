package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Executable example of the streaming plane: stages the events table as a
  * file-stream source, runs the fan-out (raw append + daily counter) and
  * the watermarked window agg, and prints what each sink saw.
  *
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the table file into a source directory (file stream sources
    // watch directories; a Kafka topic would take this place in production)
    val srcDir = EventStreamSource.stageToDir(s"$sfDir/events.parquet")
    def stream() = EventStreamSource.fromDir(spark, srcDir)

    val rawOut = Files.createTempDirectory("raw-out").toString
    val q1 = CounterStream.rawAppend(stream(), rawOut,
      Files.createTempDirectory("ckpt1").toString)
    val (q2, sink) = CounterStream.dailyCounter(stream(),
      Files.createTempDirectory("counter-table").toString + "/daily",
      Files.createTempDirectory("ckpt2").toString)
    val q3 = CounterStream.windowedSum(stream()).writeStream
      .outputMode("append").format("memory").queryName("win")
      .option("checkpointLocation", Files.createTempDirectory("ckpt3").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q1.awaitTermination(); q2.awaitTermination(); q3.awaitTermination()

    println(s"[demo] raw append sink rows: ${spark.read.parquet(rawOut).count()}")
    val counters = sink.read(spark)
    println(s"[demo] counter table keys:   ${counters.count()}")
    counters.orderBy("user_id", "dy").limit(3).collect().foreach { r =>
      println(f"[demo]   user=${r.getLong(0)}%-3d day=${r.getDate(1)} total=${r.getDouble(2)}%.2f cnt=${r.getLong(3)}")
    }
    println(s"[demo] finalized windows:    ${spark.table("win").count()}")
    spark.stop()
  }
}
