package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 contracts: the native char-entropy accumulator equals the
  * exploded composable formulation bit-for-bit (the shape txt_char_entropy
  * shipped with through round 13 and the oracle still uses), including
  * code-point iteration and the empty-text guard.
  */
class Round14OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("graft_char_entropy matches the exploded histogram formulation bit-for-bit") {
    import spark.implicits._
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val docs = Seq(
      (1L, "aaaa"),                       // degenerate: entropy 0
      (2L, "ab"),                         // two symbols: ln 2
      (3L, "the quick brown fox \r\n"),   // whitespace + CRLF count as chars
      (4L, "aabééx"),           // non-ASCII BMP
      (5L, "z")                           // single char
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("r14docs")
    val native = spark.sql(
      """SELECT doc_id, e[0] AS n_chars, e[1] AS n_distinct, e[2] AS s_micro
        |FROM (SELECT doc_id, graft_char_entropy(text) AS e FROM r14docs)
        |ORDER BY doc_id""".stripMargin).collect().toSeq
    // the pre-round-14 composable shape: explode per char, (doc,char)
    // combine, micro-unit integer log — the oracle's exact arithmetic
    val exploded = docs
      .select(col("doc_id"), explode(split(col("text"), "")).as("ch"))
      .groupBy("doc_id", "ch").agg(count(lit(1)).as("cnt"))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
      .groupBy("doc_id")
      .agg(max("n").as("n_chars"), count(lit(1)).as("n_distinct"),
        sum(col("cnt") *
          floor(log(col("cnt").cast("double") / col("n")) * 1e6 + 0.5)
            .cast("long")).as("s_micro"))
      .orderBy("doc_id").collect().toSeq
    assert(native.map(_.toString) == exploded.map(_.toString))
    // spot values: "aaaa" -> s_micro = 0; "ab" -> 2 * floor(ln(.5)*1e6+.5)
    val m = native.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(m(1L) == ((4L, 1L, 0L)))
    assert(m(2L) == ((2L, 2L, 2L * math.floor(math.log(0.5) * 1e6 + 0.5).toLong)))
  }

  test("graft_char_entropy: null text is null, empty text is the guarded [0,0,0]") {
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    import spark.implicits._
    val r = Seq((1L, null: String), (2L, "")).toDF("doc_id", "text")
      .selectExpr("doc_id", "graft_char_entropy(text) AS e")
      .orderBy("doc_id").collect()
    assert(r(0).isNullAt(1))
    assert(r(1).getSeq[Long](1) == Seq(0L, 0L, 0L))
    // and the registered query filters empties out before the divide
    val q = SparkEntry.queries("txt_char_entropy")(spark, sf)
    assert(q.columns.toSeq == Seq("doc_id", "n_chars", "n_distinct", "entropy"))
    assert(q.filter(col("n_chars") === 0).isEmpty)
  }
}
