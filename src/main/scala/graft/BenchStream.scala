package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Streaming-throughput benchmark main — the published number behind the
  * reference's integration-test floors (BASELINE.md; the reference asserts
  * ≥ 8,000 rows Kafka→Spark→Cassandra within 60 s and > 500 daily-precip
  * counter rows in the same minute, KafkaStreamingActorSpec.scala:59-69).
  *
  * Protocol: synthesize a sized spool of the reference's 13-column CSV
  * wire format (deterministic values; ~0.5% corrupt lines so the
  * quarantine leg does real work), then run the COMPLETE §3.1 fan-out —
  * raw append + quarantine + daily counter MERGE + year counter MERGE,
  * four checkpointed streaming queries over one file source — with
  * `AvailableNow` and a bounded `maxFilesPerTrigger`, so the run executes
  * several real micro-batches (state lookup + durable MERGE per trigger),
  * not one mega-batch. Wall time spans start→all-terminated; rows/s is
  * lines/wall across the whole fan-out (each line is written to the raw
  * table AND folded into both counters — the honest per-line cost, not a
  * cheapest-leg number).
  *
  * Prints ONE JSON line and writes it to BENCH_STREAM.json:
  * rows/s, micro-batch count, per-table row counts, and the margin over
  * the reference floors (rows_per_sec × 60 vs 8,000; counter rows vs 500).
  * Consistency is asserted, not assumed: raw+quarantine must account for
  * every spooled line and the counter tables must carry the exact
  * station-day/station-year key counts, so the artifact can't publish a
  * rate for a run that silently dropped rows.
  */
object BenchStream {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nStations = sys.env.getOrElse("SPARK_GRAFT_STREAM_STATIONS", "200").toInt
    val nDays = sys.env.getOrElse("SPARK_GRAFT_STREAM_DAYS", "50").toInt
    val filesN = sys.env.getOrElse("SPARK_GRAFT_STREAM_FILES", "40").toInt
    val filesPerTrigger = sys.env.getOrElse("SPARK_GRAFT_STREAM_FPT", "8").toInt
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.max(8, cpus.toInt / 4).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    QuietLogs.quietBenignWindowWarnings()

    // --- sized spool: nStations × nDays × 24 hourly readings ------------
    val spool = Files.createTempDirectory("stream-bench-spool")
    val linesPerFile = math.max(1, nStations * nDays * 24 / filesN)
    var written = 0L
    var corrupt = 0L
    var buf = new java.lang.StringBuilder(1 << 20)
    var fileNo = 0
    def flush(): Unit = if (buf.length() > 0) {
      Files.write(spool.resolve(f"lines-$fileNo%05d.csv"),
        buf.toString.getBytes(StandardCharsets.UTF_8))
      fileNo += 1
      buf = new java.lang.StringBuilder(1 << 20)
    }
    var inFile = 0
    for (st <- 0 until nStations; d <- 0 until nDays; h <- 0 until 24) {
      val day = d % 28 + 1
      val month = d / 28 + 1
      // deterministic pseudo-measurements; every 200th line is corrupt
      // (short key) to keep the quarantine leg honest
      if (written % 200 == 199) {
        buf.append("garbled,line\n"); corrupt += 1
      } else {
        val t = (st * 31 + d * 7 + h) % 400 / 10.0 - 10.0
        val p = if ((st + d + h) % 3 == 0) (h % 10) / 10.0 else 0.0
        buf.append(f"7249$st%03d:23234,2008,$month%02d,$day%02d,$h%02d,$t%.1f,-0.6,1023.8,50,7.2,2,$p%.2f,0.0%n")
      }
      written += 1
      inFile += 1
      if (inFile >= linesPerFile) { flush(); inFile = 0 }
    }
    flush()

    // --- the full §3.1 fan-out over the spool, several micro-batches ----
    val out = Files.createTempDirectory("stream-bench-out").toString
    val lines = spark.readStream
      .option("maxFilesPerTrigger", filesPerTrigger)
      .text(spool.toString)
    val t0 = System.nanoTime()
    val run = graft.streaming.WeatherIngest.start(lines,
      s"$out/raw", s"$out/quarantine", s"$out/ckpt", s"$out/tables")
    run.awaitAll()
    val wall = (System.nanoTime() - t0) / 1e9

    // --- account for every line; then publish the rate ------------------
    val rawRows = spark.read.parquet(s"$out/raw").count()
    val qRows = spark.read.parquet(s"$out/quarantine").count()
    val dailyRows = run.dailySink.read(spark).count()
    val yearRows = run.yearSink.read(spark).count()
    val microBatches = run.raw.recentProgress.count(_.numInputRows > 0)
    val expectDaily = // distinct (wsid, y, m, d) among VALID lines
      spark.read.parquet(s"$out/raw").select("wsid", "year", "month", "day")
        .distinct().count()
    require(rawRows + qRows == written,
      s"lost lines: raw=$rawRows + quarantine=$qRows != spooled=$written")
    require(qRows == corrupt, s"quarantine=$qRows != corrupt=$corrupt")
    require(dailyRows == expectDaily,
      s"daily counter rows=$dailyRows != distinct station-days=$expectDaily")
    require(yearRows == nStations, s"year counter rows=$yearRows != $nStations")

    val rps = written / wall
    def r1(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    val line =
      s"""{"metric":"stream_rows_per_sec","value":${r1(rps)},"unit":"rows/sec","lines":$written,"wall_sec":${r1(wall)},"micro_batches":$microBatches,"raw_rows":$rawRows,"quarantine_rows":$qRows,"daily_counter_rows":$dailyRows,"year_counter_rows":$yearRows,"ref_floor_ingest_rows_60s":8000,"ref_floor_counter_rows_60s":500,"ingest_floor_margin_x":${r1(rps * 60 / 8000)},"counter_floor_margin_x":${r1(dailyRows * math.min(1.0, 60.0 / wall) / 500)},"cpus":$cpus}"""
    try Files.write(Paths.get("BENCH_STREAM.json"),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    catch { case e: Throwable =>
      System.err.println(s"[bench-stream] artifact write failed: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
