package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** STREAMING heavy-hitter vocabulary: the same mergeable Misra-Gries
  * TypedImperativeAggregate the batch `txt_vocab_sketch` query uses
  * (`graft_freq_sketch`), run as a COMPLETE-mode streaming aggregation.
  * The serialized k-counter buffer IS the streaming state, so state is
  * O(k) regardless of vocabulary size — the point of the sketch on an
  * unbounded stream: a streaming groupBy(token) grows state with the
  * open vocabulary (10⁸–10⁹ keys at corpus scale), the sketch never
  * does. This is the streaming twin of the reference's running-counter
  * idea (cumulative state folded per micro-batch — KafkaStreamingActor
  * pattern) applied to a frequency summary instead of a per-key sum.
  *
  * Guarantee carried ACROSS micro-batches (the FreqSketchSpec bound,
  * pinned on the streaming path by StreamingSpec): for every reported
  * token, est_cnt ≤ true_cnt ≤ est_cnt + max_undercount, and any token
  * with true frequency > n/(k+1) is in the sketch. Merge ORDER differs
  * from the batch run (state-then-delta chain vs partition tree), so
  * est_cnt values may legitimately differ between the two while both
  * honor the bounds — Misra-Gries is mergeable, not
  * merge-order-invariant.
  */
object VocabSketchStream {
  /** The aggregation plan, usable on a batch OR streaming frame. */
  def heavyHitters(docs: DataFrame, k: Int, top: Int): DataFrame = {
    graft.functions.expressions.GraftExpressions
      .ensureRegistered(docs.sparkSession)
    docs
      .select(explode(graft.functions.GraftFunctions.tokens(col("text")))
        .as("tok"))
      .selectExpr(s"graft_freq_sketch(tok, $k, $top) AS items")
      .select(posexplode(col("items")).as(Seq("pos", "it")))
      .select((col("pos") + 1).cast("int").as("rk"),
        col("it.token").as("token"),
        col("it.est_cnt").as("est_cnt"),
        col("it.max_undercount").as("max_undercount"),
        col("it.n_tokens").as("n_tokens"))
  }

  /** Drain all available input (AvailableNow) into an in-memory table
    * named `sinkTable` holding the latest complete-mode sketch. */
  def run(docs: DataFrame, k: Int, top: Int, checkpoint: String,
      sinkTable: String): StreamingQuery =
    heavyHitters(docs, k, top).writeStream
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .format("memory")
      .queryName(sinkTable)
      .trigger(Trigger.AvailableNow())
      .start()
}
