package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: decompose a registry query's warm wall time into
  *   build  — the registry fn call (Dataset ops analyze EAGERLY, so this
  *            carries per-transformation Catalyst analysis)
  *   plan   — forcing queryExecution.executedPlan (optimize + physical
  *            planning + initial codegen lookup)
  *   exec   — toRdd.foreach (AQE stage re-planning + job scheduling +
  *            task run)
  * plus a bench-mirror leg (fresh build + noop write, what Bench times),
  * scheduler counts (jobs/stages/tasks), and the Janino compile count
  * delta (codegen-cache misses) per phase.
  *
  * Usage: runMain graft.ProfileOverhead [q1,q2,...] — defaults to a
  * spread of overhead-dominated rows. SPARK_GRAFT_SF_DIR picks the
  * corpus (default sf0.1), SPARK_GRAFT_PROF_PASSES the passes (default 4,
  * floor reported).
  */
object ProfileOverhead {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROF_PASSES", "4").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.max(8, cpus.toInt / 4).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .getOrCreate()
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(';').foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.trim.nonEmpty => spark.conf.set(k.trim, v.trim)
        case _ =>
      }
    })
    spark.sparkContext.setLogLevel("WARN")
    QuietLogs.quietBenignWindowWarnings()

    val jobs = new AtomicLong; val stages = new AtomicLong; val tasks = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
    })
    def drain(): Unit = { // quiet-poll the async bus (counts stable 300ms)
      var last = -1L; var quiet = 0
      val deadline = System.nanoTime() + 5L * 1000 * 1000 * 1000
      while (quiet < 3 && System.nanoTime() < deadline) {
        Thread.sleep(100)
        val now = jobs.get + stages.get + tasks.get
        if (now == last) quiet += 1 else { quiet = 0; last = now }
      }
    }
    val compileCount = org.apache.spark.metrics.source.CodegenMetrics
      .METRIC_COMPILATION_TIME
    def compiles(): Long = compileCount.getCount

    val names: Seq[String] =
      if (args.nonEmpty) args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("samp_stratified", "dedup_components", "q6_forecast_rev",
        "w_topk_precip", "agg_grouping_sets", "q1_pricing", "q7_nation_volume")
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")

    // warm up JVM/codegen/FileIndexes the way Bench does
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    Bench.setup(spark, sfDir)

    def r3(v: Double) = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    // pure-scheduling baseline: a 1-task no-shuffle job
    locally {
      val base = spark.range(0, 1000, 1, 1).toDF("id")
      base.write.format("noop").mode("overwrite").save()
      val t = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        base.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(s"[prof] null 1-task noop floor: ${r3(t.min)} (passes ${t.map(r3).mkString(",")})")
    }
    println(f"${"query"}%-24s ${"build"}%7s ${"plan"}%7s ${"exec"}%7s ${"sum"}%7s ${"noop"}%7s  jobs stages tasks jit(b/p/e/n)")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val execJit = Array.fill(passes)(0L); val noopJit = Array.fill(passes)(0L)
      // per-pass phase samples; floors reported
      val b = Array.fill(passes)(0.0); val p = Array.fill(passes)(0.0)
      val e = Array.fill(passes)(0.0); val w = Array.fill(passes)(0.0)
      var jJobs = 0L; var jStages = 0L; var jTasks = 0L
      var cb = 0L; var cp = 0L; var ce = 0L; var cw = 0L
      (0 until passes).foreach { i =>
        val c0 = compiles()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        val c1 = compiles()
        drain(); val j0 = jobs.get; val s0 = stages.get; val k0 = tasks.get
        val t3 = System.nanoTime()
        df.queryExecution.toRdd.foreach(_ => ())
        val t4 = System.nanoTime()
        val c2 = compiles()
        drain(); jJobs = jobs.get - j0; jStages = stages.get - s0; jTasks = tasks.get - k0
        // bench-mirror: fresh build + noop write end-to-end
        val t5 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t6 = System.nanoTime()
        val c3 = compiles()
        b(i) = (t1 - t0) / 1e9; p(i) = (t2 - t1) / 1e9
        e(i) = (t4 - t3) / 1e9; w(i) = (t6 - t5) / 1e9
        cb += c1 - c0; ce += c2 - c1; cw += c3 - c2
        execJit(i) = c2 - c1; noopJit(i) = c3 - c2
      }
      println(f"$n%-24s ${r3(b.min)}%7s ${r3(p.min)}%7s ${r3(e.min)}%7s ${r3(b.min + p.min + e.min)}%7s ${r3(w.min)}%7s  $jJobs%4d $jStages%5d $jTasks%5d  $cb/$cp/$ce/$cw  execJit=${execJit.mkString(",")} noopJit=${noopJit.mkString(",")}")
    }
    spark.stop()
  }
}
