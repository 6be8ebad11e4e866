package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end proof that the qa_table_checksum primitive is STREAMABLE:
  * XOR folding is commutative/associative, so per-micro-batch partial
  * checksums merged on the driver must equal the one-shot batch checksum
  * REGARDLESS of how the stream is batched. The spec forces a hostile
  * batching (one file per micro-batch over a 4-way split) and asserts the
  * merged (hi, lo, n) triple is bit-identical to the batch fold — the
  * property a continuous-ingest deployment relies on to maintain a live
  * anti-entropy checksum without ever re-scanning history. */
class StreamChecksumSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def canon = concat_ws("|", col("event_id"), col("event_type"))
  // the PRODUCTION fold (GraftFunctions.xorChecksum, the primitive behind
  // qa_table_checksum) — not a spec-local copy, so any future change to the
  // checksum definition keeps this streamability proof attached to it
  private def fold(df: DataFrame) =
    graft.functions.GraftFunctions.xorChecksum(df, canon)
      .select(col("xor_hi"), col("xor_lo"), col("n_rows"))
      .collect().head

  test("streamed per-batch XOR partials merge to the batch checksum") {
    val batch = fold(Tables.events(spark, sf))
    val expect = (batch.getLong(0), batch.getLong(1), batch.getLong(2))

    // stage a 4-way split and force one file per micro-batch
    val dir = Files.createTempDirectory("ck-src").resolve("files").toString
    Tables.events(spark, sf).select(col("event_id"), col("event_type"))
      .repartition(4).write.parquet(dir)
    val stream = spark.readStream
      .schema("event_id LONG, event_type STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(dir)

    var hiAcc = 0L; var loAcc = 0L; var nAcc = 0L; var batches = 0
    val q = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck-ckpt").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        val r = fold(b)
        // the merge IS xor/addition — the whole point of the primitive
        hiAcc ^= r.getLong(0); loAcc ^= r.getLong(1); nAcc += r.getLong(2)
        batches += 1
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    assert(batches >= 2, s"expected a multi-batch run, got $batches batch(es)")
    assert((hiAcc, loAcc, nAcc) == expect,
      s"merged stream checksum ($hiAcc, $loAcc, $nAcc) != batch $expect")
  }
}
