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

  test("txt_novelty without the shingle join-back equals the joined spelling bit-for-bit") {
    val sh = operators.DedupOps.shingles4(spark, sf)
      .select(col("doc_id"), xxhash64(col("sh")).as("shh"))
    val dfreq = sh.groupBy("shh").agg(count(lit(1)).as("dfreq"))
    val old = sh.join(dfreq, Seq("shh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("o_sh"),
        sum(when(col("dfreq") === 1, lit(1L)).otherwise(lit(0L))).as("o_uniq"))
    val neu = SparkEntry.queries("txt_novelty")(spark, sf)
    assert(neu.count() == old.count())
    val bad = neu.join(old, "doc_id")
      .filter(col("n_sh") =!= col("o_sh") || col("n_uniq") =!= col("o_uniq"))
    assert(bad.isEmpty)
  }

  test("evt_cohort_revenue pre-aggregate equals the countDistinct grid bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.centi
    val w = Window.partitionBy("o_custkey")
    val old = Tables.orders(spark, sf)
      .select(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("om"),
        centi(col("o_totalprice")).as("pc"))
      .withColumn("cohort_month", min("om").over(w))
      .withColumn("age_months",
        months_between(col("om"), col("cohort_month")).cast("int"))
      .groupBy("cohort_month", "age_months")
      .agg(countDistinct("o_custkey").as("o_cust"), count(lit(1)).as("o_ord"))
    val neu = SparkEntry.queries("evt_cohort_revenue")(spark, sf)
    assert(neu.count() == old.count())
    val bad = neu.join(old, Seq("cohort_month", "age_months"))
      .filter(col("n_customers") =!= col("o_cust") ||
        col("n_orders") =!= col("o_ord"))
    assert(bad.isEmpty)
  }

  test("agg_quantile_semantics cum-count rank selection equals row_number rank selection") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.GraftFunctions.centi
    import spark.implicits._
    // the pre-round-15 spelling: rank every row, pick rows at the ranks
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), centi(col("value")).as("v"))
    val w = Window.partitionBy("event_type").orderBy("v")
    val ranked = ev.withColumn("rn", row_number().over(w).cast("long"))
    val counts = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
    val targets = counts
      .crossJoin(broadcast(Seq(25, 50, 75).toDF("q")))
      .withColumn("disc_rank", expr("(q * n + 99) div 100"))
      .withColumn("lo_rank", expr("((n - 1) * q) div 100 + 1"))
      .withColumn("rem", expr("((n - 1) * q) % 100"))
      .withColumn("hi_rank",
        col("lo_rank") + when(col("rem") > 0, 1L).otherwise(0L))
    val old = ranked.join(broadcast(targets), Seq("event_type"))
      .filter(col("rn") === col("disc_rank") ||
        col("rn") === col("lo_rank") || col("rn") === col("hi_rank"))
      .groupBy("event_type", "q", "rem")
      .agg(min(when(col("rn") === col("disc_rank"), col("v"))).as("vd"),
        min(when(col("rn") === col("lo_rank"), col("v"))).as("vlo"),
        min(when(col("rn") === col("hi_rank"), col("v"))).as("vhi"))
      .select(col("event_type"), col("q"),
        graft.functions.GraftFunctions.fround(col("vd").cast("double") / 100.0, 4).as("o_disc"),
        graft.functions.GraftFunctions.fround((col("vlo") * (lit(100L) - col("rem")) +
          col("vhi") * col("rem")).cast("double") / 100.0 / 100.0, 4).as("o_cont"))
    val neu = SparkEntry.queries("agg_quantile_semantics")(spark, sf)
    assert(neu.count() == old.count())
    val bad = neu.join(old, Seq("event_type", "q"))
      .filter(col("disc_value") =!= col("o_disc") ||
        col("cont_value") =!= col("o_cont"))
    assert(bad.isEmpty)
  }
}
