package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Misra-Gries heavy-hitters aggregate
  * (functions/expressions/MisraGries.scala, SQL `graft_freq_sketch`) and
  * its registered query twin `txt_vocab_sketch`. The corpus's token
  * distribution is near-uniform (every count below the n/(k+1) presence
  * threshold), so the corpus test asserts the UNIVERSAL bounds; the
  * presence guarantee is proven on a skewed synthetic input. */
class FreqSketchSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  graft.functions.expressions.GraftExpressions.ensureRegistered(spark)

  test("txt_vocab_sketch: est <= true <= est + undercount, undercount <= n/(k+1)") {
    val exact = graft.Tables.documents(spark, sf)
      .select(explode(graft.functions.GraftFunctions.tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val rows = SparkEntry.queries("txt_vocab_sketch")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    rows.foreach { r =>
      val (tok, est, under, nTok) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTok == n, s"token total $nTok != exact $n")
      assert(under <= n / (16 + 1) + 1, s"undercount $under exceeds n/(k+1)")
      val truth = exact(tok)
      assert(est <= truth, s"$tok: est $est overcounts true $truth")
      assert(truth - est <= under, s"$tok: undercount certificate violated")
    }
    // presentation order is deterministic: est desc, token asc
    val keys = rows.map(r => (-r.getLong(2), r.getString(1))).toSeq
    assert(keys == keys.sorted)
  }

  test("heavy hitter above n/(k+1) is guaranteed present on a skewed stream (any merge order)") {
    import spark.implicits._
    // 1000 x "hot" + 400 distinct singletons, n = 1400, k = 16:
    // n/(k+1) ~ 82 << 1000, so "hot" must survive with est >= 1000 - 82
    val data = (Seq.fill(1000)("hot") ++ (1 to 400).map(i => s"rare_$i"))
    val ds = spark.createDataset(data).toDF("tok").repartition(8) // force multi-buffer merges
    val out = ds.selectExpr("graft_freq_sketch(tok, 16, 5) AS items")
      .select(explode(col("items")).as("it"))
      .select(col("it.token"), col("it.est_cnt"), col("it.max_undercount"))
      .collect()
    val hot = out.find(_.getString(0) == "hot")
    assert(hot.isDefined, "the heavy hitter must survive every merge order")
    val (est, under) = (hot.get.getLong(1), hot.get.getLong(2))
    assert(under <= 1400 / 17 + 1)
    assert(est >= 1000 - under && est <= 1000)
  }

  test("sketch merge is associative-safe: single-partition and multi-partition agree on the heavy hitter") {
    import spark.implicits._
    val data = Seq.fill(500)("hh") ++ (1 to 100).map(i => s"x_$i")
    def top(parts: Int) = spark.createDataset(data).toDF("tok").repartition(parts)
      .selectExpr("graft_freq_sketch(tok, 8, 3) AS items")
      .select(explode(col("items")).as("it"))
      .select(col("it.token")).collect().map(_.getString(0))
    assert(top(1).contains("hh") && top(7).contains("hh"))
  }
}
