package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SessionStream
import graft.streaming.SessionStream.{Ev, Open, Session}

/** flatMapGroupsWithState sessionization: the fold's unit semantics, plus
  * end-to-end MemoryStream runs (cross-batch state carry, exactly-once
  * session emission). */
class SessionStreamSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private val M = 60L * 1000000L // one minute in µs

  test("fold: gap splits sessions, totals and bounds are exact") {
    val evs = Seq(Ev(1, 0, 1.0), Ev(1, 5 * M, 2.0), Ev(1, 40 * M, 4.0),
      Ev(1, 45 * M, 8.0))
    val (closed, open) = SessionStream.fold(1L, evs, None)
    assert(closed == Seq(Session(1, 0, 5 * M, 2, 3.0)))
    assert(open.contains(Open(40 * M, 45 * M, 2, 12.0)))
  }

  test("fold: out-of-order batch is sorted before folding") {
    val evs = Seq(Ev(1, 5 * M, 2.0), Ev(1, 0, 1.0))
    val (closed, open) = SessionStream.fold(1L, evs, None)
    assert(closed.isEmpty && open.contains(Open(0, 5 * M, 2, 3.0)))
  }

  test("fold: resumes an open session from prior state") {
    val (closed, open) =
      SessionStream.fold(1L, Seq(Ev(1, 10 * M, 5.0)), Some(Open(0, 5 * M, 2, 3.0)))
    assert(closed.isEmpty && open.contains(Open(0, 10 * M, 3, 8.0)))
  }

  test("streaming: sessions close across micro-batches, emitted exactly once") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = SessionStream.sessionize(in.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt-sess").toString)
      .start()

    // batch 1: user 1 opens session A; user 2 opens session B
    in.addData(Ev(1, 0, 1.0), Ev(1, 5 * M, 2.0), Ev(2, 0, 10.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 0) // nothing closed yet

    // batch 2: user 1's event past the gap closes session A and opens C
    in.addData(Ev(1, 60 * M, 4.0))
    q.processAllAvailable()
    val closed = spark.table("sess_out").as[Session].collect()
    assert(closed.toSeq == Seq(Session(1, 0, 5 * M, 2, 3.0)))

    // batch 3: replaying an in-gap event for user 2 extends B, closes nothing
    in.addData(Ev(2, 10 * M, 1.0))
    q.processAllAvailable()
    assert(spark.table("sess_out").count() == 1)
    q.stop()
  }

  test("stream sessionization equals the batch win_session query (closed sessions)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = GraftTestSpark.sf

    // batch ground truth from the registered query
    val batch = SparkEntry.queries("win_session")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3)) -> (r.getLong(2), r.getDouble(5))).toMap
    // each user's final session stays open at end-of-stream
    val lastPerUser = batch.keys.groupBy(_._1).map { case (u, ks) => u -> ks.map(_._2).max }

    // stream the same events through the file source
    val dir = java.nio.file.Files.createTempDirectory("events-sess")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val evs = graft.streaming.EventStreamSource.fromDir(spark, dir.toString)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("value"))
      .as[Ev]
    val q = SessionStream.sessionize(evs)
      .writeStream.outputMode("append").format("memory").queryName("sess_eq")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-eq").toString)
      .start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("sess_eq").as[Session].collect()
      .map(s => (s.user_id, s.start_us) -> (s.n_events.toLong, s.total_value)).toMap
    val expected = batch.filter { case ((u, st), _) => lastPerUser(u) != st }
    assert(streamed.keySet == expected.keySet)
    expected.foreach { case (k, (n, total)) =>
      val (sn, st) = streamed(k)
      assert(sn == n, s"$k n_events")
      assert(math.abs(st - total) < 0.01, s"$k total")
    }
  }
}
