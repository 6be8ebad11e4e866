package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-15 contracts: the native repetition-census generator equals the
  * two-shuffle composable formulation bit-for-bit (the shape txt_repetition
  * shipped with through round 14 and the oracle still uses), and the two
  * de-shuffled plans (txt_repetition, evt_rolling_dau) actually carry the
  * exchange counts their scale stories now claim.
  */
class Round15OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def hashExchanges(df: org.apache.spark.sql.DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).size

  test("graft_repetition_stats matches the exploded two-shuffle formulation bit-for-bit") {
    import spark.implicits._
    graft.functions.expressions.GraftExpressions.ensureRegistered(spark)
    val docs = Seq(
      (1L, "a b a b a"),          // repeated 2-grams: "a b" x2, "b a" x2
      (2L, "x x x x"),            // one distinct gram, count 3
      (3L, "unique tokens only here"),
      (4L, "one"),                // < 2 tokens: no 2-grams -> no row
      (5L, ""),                   // empty text: one empty token -> no row
      (6L, "a  b"),               // double space: EMPTY middle token kept
      (7L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    docs.createOrReplaceTempView("r15docs")
    val native = spark.sql(
      """SELECT doc_id, n_grams, n_uniq, top_n
        |FROM (SELECT doc_id, graft_repetition_stats(lower(text), 2)
        |      FROM r15docs)
        |ORDER BY doc_id""".stripMargin).collect().toSeq
    // the pre-round-15 composable shape: generator explode, (doc, gram)
    // combine, per-doc rollup — same tokenization (split ' ', -1)
    val exploded = docs
      .selectExpr("doc_id", "graft_shingles(lower(text), 2) AS sh")
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_grams"), count(lit(1)).as("n_uniq"),
        max("n").as("top_n"))
      .orderBy("doc_id").collect().toSeq
    assert(native.map(_.toString) == exploded.map(_.toString))
    val m = native.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(m(1L) == ((4L, 2L, 2L)))
    assert(m(2L) == ((3L, 1L, 3L)))
    assert(m(3L) == ((3L, 3L, 1L)))
    assert(m(6L) == ((2L, 2L, 1L)))   // "a "+"", ""+"b" — empties kept
    assert(!m.contains(4L) && !m.contains(5L) && !m.contains(7L))
  }

  test("txt_repetition is shuffle-free up to the output sort (row-local census)") {
    val df = SparkEntry.queries("txt_repetition")(spark, sf)
    assert(hashExchanges(df) == 0,
      df.queryExecution.executedPlan.toString.take(3000))
    // values must match the old two-aggregation spelling exactly
    val old = Tables.documents(spark, sf)
      .selectExpr("doc_id", "graft_shingles(lower(text), 2) AS sh")
      .groupBy("doc_id", "sh").agg(count(lit(1)).as("n"))
      .groupBy("doc_id")
      .agg(sum("n").as("o_2gram"), count(lit(1)).as("o_uniq"))
    assert(df.count() == old.count())
    val bad = df.join(old, "doc_id")
      .filter(col("n_2gram") =!= col("o_2gram") ||
        col("n_uniq") =!= col("o_uniq"))
    assert(bad.isEmpty)
  }

  test("evt_rolling_dau folds both metrics into one aggregate: no join, three keyed exchanges") {
    val df = SparkEntry.queries("evt_rolling_dau")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(3000))
    // du distinct + the single-distinct agg's (day,user) dedup + day rollup
    assert(hashExchanges(df) <= 3, p.take(3000))
    // dau must equal the direct per-day distinct count
    val direct = Tables.events(spark, sf)
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .groupBy("day").agg(count(lit(1)).as("dau_direct"))
    val bad = df.join(direct, "day")
      .filter(col("dau") =!= col("dau_direct"))
    assert(bad.isEmpty)
    // every observed day reports (the dau > 0 gate keeps exactly these)
    assert(df.count() == direct.count())
  }
}
