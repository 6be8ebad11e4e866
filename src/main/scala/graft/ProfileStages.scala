package graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Diagnostic main: run named registry queries under the Bench session
  * confs and print PER-STAGE wall / task-time / task-count attribution —
  * the "where do the 0.x s go" answer ProfileOverhead's per-query totals
  * can't give. Jobs are the bench-mirror noop writes; the floor pass
  * (min total) is printed stage-by-stage, so cold-JIT stages don't
  * pollute the read.
  *
  * Usage: runMain graft.ProfileStages <q1,q2,...>
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  * SPARK_GRAFT_PROF_PASSES (default 3), SPARK_GRAFT_SHUFFLE / SPARK_GRAFT_AQE
  * as in Bench.
  */
object ProfileStages {
  private final case class St(name: String, submitted: Long, completed: Long,
      tasks: Int, taskTimeMs: Long, maxTaskMs: Long)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileStages <q1,q2,...>")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val unknown = names.filterNot(SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_PROF_PASSES", "3").toInt
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.max(4, cpus.toInt / 8).toString))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "false"))
      .config("spark.sql.ui.explainMode", "simple")
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

    val stages = TrieMap.empty[Int, St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stages.put(e.stageInfo.stageId,
          St(e.stageInfo.name.takeWhile(_ != '\n'), System.nanoTime(), 0L, 0, 0L, 0L))
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        stages.get(si.stageId).foreach { st =>
          stages.put(si.stageId, st.copy(completed = System.nanoTime(),
            tasks = si.numTasks,
            taskTimeMs = si.taskMetrics.executorRunTime,
            maxTaskMs = 0L))
        }
      }
    })
    def drain(): Unit = { Thread.sleep(400) }

    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    Bench.setup(spark, sfDir)

    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // pass 0 warms codegen; then measure `passes` and report the floor
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      var best = Double.MaxValue
      var bestStages: Seq[(Int, St)] = Nil
      (1 to passes).foreach { _ =>
        drain(); stages.clear()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        drain()
        if (wall < best) { best = wall; bestStages = stages.toSeq.sortBy(_._1) }
      }
      println(f"== $n floor ${best}%.3f s, ${bestStages.size} stages ==")
      bestStages.foreach { case (id, st) =>
        val wallMs = if (st.completed > st.submitted) (st.completed - st.submitted) / 1e6 else -1.0
        println(f"  stage $id%4d wall ${wallMs}%8.1f ms  tasks ${st.tasks}%4d  taskTime ${st.taskTimeMs}%6d ms  ${st.name}%s")
      }
    }
    spark.stop()
  }
}
