package graft

import org.apache.spark.sql.types.{ArrayType, FloatType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Testdata schema contract — the "AA" prefix sorts this suite first so a
  * silent regeneration of /root/testdata turns into ONE obvious red test
  * here instead of dozens of mysterious failures downstream (round 6 lost
  * 55 queries and 52 specs to exactly that: events.ts changed encoding
  * between testdata generations and every consumer crashed at analysis).
  *
  * Contract checked at sf0.001: all ten tables exist with rows > 0, and
  * the columns whose encodings have actually drifted before (events.ts)
  * or that non-trivial normalization depends on (embeddings.embedding,
  * documents.content) land as the types the whole repo assumes AFTER the
  * Tables normalization layer.
  */
class AAFixtureContractSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("all ten tables are present and non-empty at sf0.001") {
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, sf) else Tables(spark, sf, n)
      assert(df.count() > 0, s"table $n is empty — testdata regenerated incorrectly?")
    }
  }

  test("events.ts normalizes to session-TZ TimestampType regardless of parquet encoding") {
    val ev = Tables.events(spark, sf)
    assert(ev.schema("ts").dataType == TimestampType,
      s"events.ts is ${ev.schema("ts").dataType}; Tables.events must normalize " +
        "every testdata generation (nanos-as-int64 or native micros) to TimestampType")
    // the data spans a sane calendar range (catches unit mix-ups: a ns/µs/ms
    // confusion lands decades away from the generator's 2024 window)
    val yrs = ev.selectExpr("min(year(ts)) AS lo", "max(year(ts)) AS hi").head()
    assert(yrs.getInt(0) >= 2000 && yrs.getInt(1) <= 2100,
      s"events.ts years [${yrs.getInt(0)}, ${yrs.getInt(1)}] out of sane range — unit mix-up?")
  }

  test("embeddings.embedding is Array[Float]; documents carries doc_id + text") {
    val emb = Tables.embeddings(spark, sf)
    assert(emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = true) ||
           emb.schema("embedding").dataType == ArrayType(FloatType, containsNull = false),
      s"embeddings.embedding is ${emb.schema("embedding").dataType}")
    val doc = Tables.documents(spark, sf)
    assert(doc.columns.contains("doc_id") && doc.columns.contains("text"),
      s"documents columns drifted: ${doc.columns.mkString(",")}")
  }
}
