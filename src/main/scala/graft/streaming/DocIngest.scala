package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming incremental exact-dedup ingest — the batch
  * `dedup_incremental` verdict (DedupOps) as a continuous pipeline: every
  * micro-batch of arriving documents is deduplicated in-batch AND against
  * the durable corpus registry, and only first-seen fingerprints are
  * admitted. The registry is a [[KeyedParquetSink]] keyed by content
  * fingerprint, so admission is FIRST-WRITER-WINS and convergent:
  *
  *  - in-batch: keep min doc_id per fingerprint (one keyed shuffle,
  *    batch-sized);
  *  - cross-batch: LEFT ANTI join against the registry — arriving keys are
  *    therefore DISJOINT from stored keys, and the MERGE degenerates to a
  *    pure insert of new fingerprints (no stored row is ever replaced, so a
  *    re-delivered batch cannot steal a fingerprint from its first writer);
  *  - replay (the at-least-once foreachBatch failure mode): a replayed
  *    batch anti-joins to empty against the registry its first delivery
  *    already populated — a no-op, which is the idempotence the reference's
  *    Cassandra counters lack (SURVEY §2.9).
  *
  * Scale shape: the registry probe is fingerprint-keyed and
  * partition-pruned by the sink's key buckets; nothing corpus-sized
  * shuffles per batch — the anti join touches only the buckets the batch's
  * fingerprints hash into. Reference analog: the ingest fan-out
  * (KafkaStreamingActor.scala:55-64) with the dedup admission the reference
  * never had.
  */
object DocIngest {

  final case class Running(query: StreamingQuery, registry: KeyedParquetSink) {
    def awaitAll(): Unit = query.awaitTermination()
  }

  /** CSV line decode for the document wire format `doc_id,text` (text is
    * comma-free corpus text; the weather pipeline's PERMISSIVE quarantine
    * pattern applies to dirtier feeds). */
  def parseLines(lines: DataFrame): DataFrame =
    lines.select(
      split(col("value"), ",", 2).getItem(0).cast("long").as("doc_id"),
      split(col("value"), ",", 2).getItem(1).as("text"))

  /** Start the dedup-admission stream over parsed `(doc_id, text)` rows.
    * The registry table holds one row per distinct fingerprint:
    * `(fp, doc_id, n_chars)` with `doc_id` = the first-admitted document. */
  def start(docs: DataFrame, tableDir: String, checkpoint: String): Running = {
    val registry = new KeyedParquetSink(tableDir, Seq("fp"))
    val q = docs
      .select(md5(lower(col("text"))).as("fp"), col("doc_id"),
        length(col("text")).as("n_chars"))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) => admit(registry, batch) }
      .trigger(Trigger.AvailableNow())
      .start()
    Running(q, registry)
  }

  /** One micro-batch admission: in-batch first-wins, then insert-if-absent
    * against the registry. Exposed for direct replay testing. */
  private[graft] def admit(registry: KeyedParquetSink, batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val perFp = batch.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("n_chars"))).as("first"))
      .select(col("fp"), col("first.doc_id").as("doc_id"),
        col("first.n_chars").as("n_chars"))
    val fresh =
      if (registry.exists(spark))
        perFp.join(registry.read(spark).select("fp"), Seq("fp"), "left_anti")
      else perFp
    registry.upsert(fresh)
  }
}
