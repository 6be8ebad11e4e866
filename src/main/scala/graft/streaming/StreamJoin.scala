package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join and streaming dedup — the two stateful operator
  * classes beyond keyed aggregation (§2.9 parity extras; the reference has
  * no streaming joins at all — its only two-stream interaction is the
  * fan-out in KafkaStreamingActor.scala:45-66).
  *
  * Both are bounded-state by construction:
  *  - the interval join keeps each side's rows only until the other side's
  *    watermark passes the join window (here: clicks attribute to purchases
  *    at most 1h later, so click state lives <= 1h + watermark delay);
  *  - dedup-with-watermark keeps seen-keys only within the watermark
  *    horizon (exactly-once per key per horizon, constant state at steady
  *    ingest rate).
  *
  * At 100 TB/day these are THE patterns for attribution and at-least-once
  * source cleanup; unbounded variants (no watermark) would accrete state
  * forever and are deliberately not offered.
  */
object StreamJoin {

  /** Attribute each purchase to a same-user click in the preceding hour
    * (inner interval join). Both inputs must carry (user_id, ts, event_id). */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
  }

  /** Left-outer variant of the interval join: every purchase is emitted,
    * attributed when a click exists, with null click columns otherwise —
    * the unmatched rows can only be emitted once the click-side watermark
    * has passed the end of their join window (before that a matching click
    * could still arrive), so "organic purchase" rows trail real time by
    * the watermark delay. Same bounded state as the inner form. */
  def clickToPurchaseOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("click_id"))
    val p = purchases
      .withWatermark("ts", "2 hours")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("event_id").as("purchase_id"))
    p.join(c,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
  }

  /** Streaming exact dedup on a key within the watermark horizon — the
    * at-least-once-source cleanup stage of an ingest pipeline. */
  def dedupByKey(events: DataFrame, keyCols: Seq[String]): DataFrame =
    events.withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stream-static enrichment: join each micro-batch against a broadcast
    * dimension table (the reference's implicit station-metadata join,
    * SURVEY §2.3 J3). Stateless — the static side is re-resolved per batch
    * (so a refreshed dimension snapshot is picked up) and broadcast, so the
    * stream side never shuffles; missing dimension rows pass through with
    * nulls (left join) rather than silently dropping events. */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")
}
