package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamJoin

/** Stream-stream interval join + streaming dedup: results must equal the
  * batch formulation on the same data, and duplicate injections collapse. */
class StreamJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  private case class E(event_id: Long, user_id: Long, ts: Timestamp)
  private def t(min: Int) = Timestamp.valueOf(f"2024-01-01 ${10 + min / 60}%02d:${min % 60}%02d:00")

  test("stream-stream interval join equals the batch range join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val toDf = (m: MemoryStream[(Long, Long, Timestamp)]) =>
      m.toDF().toDF("event_id", "user_id", "ts")

    val joined = StreamJoin.clickToPurchase(toDf(clicks), toDf(purchases))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ssj").toString)
      .start()

    // user 1: click at 10:00 -> purchase 10:30 (match), purchase 12:00 (no: >1h)
    // user 2: click at 10:50 -> purchase 10:40 (no: click after purchase)
    clicks.addData((100L, 1L, t(0)), (101L, 2L, t(50)))
    purchases.addData((200L, 1L, t(30)), (201L, 1L, t(120)), (202L, 2L, t(40)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_out")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((200L, 100L)))
  }

  test("streaming dedup within watermark collapses injected duplicates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp)]
    val deduped = StreamJoin.dedupByKey(
      in.toDF().toDF("event_id", "user_id", "ts"), Seq("event_id"))
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-dd").toString)
      .start()

    in.addData((1L, 1L, t(0)), (1L, 1L, t(0)), (2L, 1L, t(1)))   // dup in batch
    q.processAllAvailable()
    in.addData((1L, 1L, t(0)), (3L, 2L, t(2)))                    // dup across batches
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_out").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L))
  }

  test("left-outer interval join emits unmatched purchases after the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val toDf = (m: MemoryStream[(Long, Long, Timestamp)]) =>
      m.toDF().toDF("event_id", "user_id", "ts")

    val joined = StreamJoin.clickToPurchaseOuter(toDf(clicks), toDf(purchases))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ssj_outer_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-ssjo").toString)
      .start()

    // user 1 purchase has a click; user 2 purchase is organic (no click)
    clicks.addData((100L, 1L, t(0)))
    purchases.addData((200L, 1L, t(30)), (201L, 2L, t(35)))
    q.processAllAvailable()
    // push both watermarks far past the join windows so the unmatched
    // purchase becomes emittable, then run the triggering batch
    clicks.addData((101L, 9L, t(600)))
    purchases.addData((299L, 9L, t(600)))
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ssj_outer_out")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(got.contains((200L, Some(100L))), got)   // attributed
    assert(got.contains((201L, None)), got)         // organic, emitted post-watermark
  }

  test("stream-static enrichment broadcasts the dimension, missing keys pass through") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Long, Timestamp)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val enriched = StreamJoin.enrichWithDim(
      in.toDF().toDF("event_id", "user_id", "ts"), dim, "user_id")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .option("checkpointLocation", Files.createTempDirectory("ckpt-en").toString)
      .start()

    in.addData((1L, 1L, t(0)), (2L, 2L, t(1)), (3L, 9L, t(2)))   // user 9 not in dim
    q.processAllAvailable()
    q.stop()

    val got = spark.table("enrich_out")
      .select("event_id", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }
}
