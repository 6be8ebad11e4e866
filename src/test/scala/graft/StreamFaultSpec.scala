package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.CounterStream

object StreamFaultSpec {
  /** Armed by the test, consumed (exactly once) by the injected task —
    * a static so the executor-side closure and the test share one flag
    * (local mode is one JVM; the object also survives closure
    * serialization). */
  val fire = new AtomicBoolean(false)
  /** The poisoned row: lives in the second staged file, so the injected
    * failure lands in batch 1 — after batch 0 committed durable state.
    * Lives in the companion (with `fire`) so the executor closure
    * references ONLY statics — an instance member would drag the whole
    * non-serializable suite into the task closure. */
  val PoisonId = 777L
}

/** Exactly-once under a MID-BATCH task failure — the harder fault than
  * StreamingSpec's crash test (which kills the query BETWEEN the sink
  * write and the commit marker): here a task throws WHILE batch 1 is
  * executing, after batch 0 has already produced a durable table, so the
  * failed batch dies with sibling tasks' state-store deltas written and
  * the MERGE sink mid-flight. The restart must replay the failed batch
  * from the checkpoint and converge the durable table to exactly the
  * batch-twin aggregation — on BOTH state-store providers (the HDFS-backed
  * default and RocksDB, the 100 TB deployment's choice).
  */
class StreamFaultSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksCls =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** Stage the events table as two files (split at event_id 500) so
    * maxFilesPerTrigger=1 yields two micro-batches; mod-times are ordered
    * so the poison-free half is batch 0. */
  private def stageHalves(): String = {
    val src = Files.createTempDirectory("fault-src")
    def stage(name: String, filter: org.apache.spark.sql.Column, t: Long): Unit = {
      val outTmp = Files.createTempDirectory(s"fault-stage-$name")
      Tables.events(spark, sf).filter(filter).coalesce(1)
        .write.mode("overwrite").parquet(outTmp.toString)
      val part = Files.list(outTmp)
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .findFirst().get()
      val dst = Paths.get(src.toString, s"$name.parquet")
      Files.copy(part, dst, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dst, java.nio.file.attribute.FileTime.fromMillis(t))
    }
    val t0 = System.currentTimeMillis() - 60000
    stage("half1", col("event_id") <= 500, t0)
    stage("half2", col("event_id") > 500, t0 + 30000)
    src.toString
  }

  private def batchTwin() = Tables.events(spark, sf)
    .groupBy(col("user_id"), to_date(col("ts")).as("dy"))
    .agg(sum("value").as("total"), count(lit(1)).as("cnt"))
    .collect()
    .map(r => (r.getLong(0), r.getDate(1).toString) -> (r.getDouble(2), r.getLong(3)))
    .toMap

  /** The staged stream with the fault injected as a mapPartitions pass:
    * the first task to reach the poison row while the flag is armed
    * throws — mid-iteration, mid-batch, sibling tasks already running. */
  private def flakyStream(src: String) = {
    val base = spark.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    base.mapPartitions { it =>
      it.map { r =>
        if (r.getLong(0) == StreamFaultSpec.PoisonId &&
            StreamFaultSpec.fire.compareAndSet(true, false))
          throw new RuntimeException("graft: injected mid-batch task failure")
        r
      }
    }(org.apache.spark.sql.Encoders.row(base.schema))
  }

  private def causeChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  for (provider <- Seq("hdfs", "rocksdb")) {
    test(s"mid-batch task failure replays and converges to the batch twin ($provider)") {
      if (provider == "rocksdb") spark.conf.set(ProviderKey, RocksCls)
      try {
        val src = stageHalves()
        // the poison row must be in the staged data or the injection is
        // vacuous and this test silently degrades to the happy path
        assert(Tables.events(spark, sf)
          .filter(col("event_id") === StreamFaultSpec.PoisonId).count() == 1)
        val table = tmp("fault-tbl") + "/daily"
        val ckpt = tmp("fault-ckpt")
        StreamFaultSpec.fire.set(true)
        val (q1, sink1) = CounterStream.dailyCounter(flakyStream(src), table, ckpt)
        val e = intercept[StreamingQueryException] { q1.awaitTermination() }
        assert(causeChain(e).exists(_.contains("injected mid-batch task failure")),
          s"query must die on the INJECTED fault, got: ${causeChain(e)}")
        assert(!StreamFaultSpec.fire.get(), "the fault must actually have fired")
        // batch 0 committed before the fault: the durable table exists and
        // is partial — exactly the state a restart inherits
        assert(sink1.exists(spark), "batch 0 should have produced durable rows")
        val partial = sink1.read(spark).count()
        val (q2, sink2) = CounterStream.dailyCounter(flakyStream(src), table, ckpt)
        q2.awaitTermination()
        val twin = batchTwin()
        // strictly PARTIAL: batch 0 (event_id <= 500) covers 198 of the
        // corpus's 397 user-day keys — if this ever equals the twin, the
        // fault fired too late (or not mid-batch) and the test degraded
        // to the happy path
        assert(partial < twin.size,
          s"batch 0 must leave a PARTIAL table ($partial vs ${twin.size})")
        val got = sink2.read(spark).collect()
          .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Date]("dy").toString) ->
            (r.getAs[Double]("total"), r.getAs[Long]("cnt")))
          .toMap
        assert(got.size == twin.size,
          s"replayed run must converge: got ${got.size} keys, twin ${twin.size}")
        twin.foreach { case (k, (total, cnt)) =>
          val (gt, gc) = got(k)
          assert(gc == cnt && math.abs(gt - total) < 1e-6, s"key $k")
        }
      } finally {
        StreamFaultSpec.fire.set(false)
        if (provider == "rocksdb") spark.conf.unset(ProviderKey)
      }
    }
  }
}
