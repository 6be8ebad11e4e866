package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 additions: the generalized TopKPerKey / WindowTopKRewrite
  * surface — multi-key and null-ordering registry queries lower to the
  * heap, and a randomized equivalence proof against Spark's own Window
  * machinery (the rewrite excluded on the expected side, so the two
  * engines genuinely differ in code path).
  */
class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("win_topk_multikey / win_topk_nulls lower to the heap operator") {
    for (q <- Seq("win_topk_multikey", "win_topk_nulls")) {
      val p = run(q).queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyPartial"), s"$q:\n${p.take(2000)}")
      assert(!p.contains("Window"), s"$q:\n${p.take(2000)}")
    }
  }

  test("TopKPerKey ≡ Spark's own window row_number on randomized data, keys, directions") {
    // fixed seed: reproducible trials over nullable string keys, nullable
    // double order values with NaN, all four null-ordering directions,
    // random k and random input partitioning (exercises the partial pass)
    val rnd = new scala.util.Random(20260814L)
    val schema = StructType(Seq(
      StructField("k1", LongType, nullable = false),
      StructField("k2", StringType, nullable = true),
      StructField("v", DoubleType, nullable = true),
      StructField("id", LongType, nullable = false)))
    val dirs = Seq(
      "desc_nulls_last" -> col("v").desc_nulls_last,
      "desc_nulls_first" -> col("v").desc_nulls_first,
      "asc_nulls_last" -> col("v").asc_nulls_last,
      "asc_nulls_first" -> col("v").asc_nulls_first)
    for (trial <- 1 to 6) {
      val n = 400 + rnd.nextInt(800)
      val k = 1 + rnd.nextInt(4)
      val rows = (0 until n).map { i =>
        val v: java.lang.Double = rnd.nextInt(5) match {
          case 0 => null
          case 1 => java.lang.Double.valueOf(Double.NaN)
          case _ => java.lang.Double.valueOf(rnd.nextInt(50).toDouble)
        }
        Row(rnd.nextInt(15).toLong,
          if (rnd.nextInt(8) == 0) null else s"g${rnd.nextInt(3)}",
          v, i.toLong)
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1 + rnd.nextInt(7)), schema)
      val (dname, dir) = dirs(rnd.nextInt(dirs.size))
      // expected side: Spark's OWN Window plan — exclude the rewrite and
      // ASSERT the exclusion took (a silently-ineffective exclusion would
      // compare the operator against itself and prove nothing)
      val confKey = "spark.sql.optimizer.excludedRules"
      val prev = scala.util.Try(spark.conf.get(confKey)).toOption.filter(_ != null)
      spark.conf.set(confKey, "graft.WindowTopKRewrite")
      val expected = try {
        val w = Window.partitionBy("k1", "k2").orderBy(dir, col("id"))
        val e = df.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= k).drop("rn")
        assert(e.queryExecution.executedPlan.toString.contains("Window"),
          "exclusion failed: the expected side must run the real window")
        e.collect().map(_.toString).sorted.toSeq
      } finally prev match {
        case Some(v) => spark.conf.set(confKey, v)
        case None => spark.conf.unset(confKey)
      }
      val got = graft.plans.TopKPerKey.of(df, Seq(col("k1"), col("k2")),
        Seq(dir, col("id")), k).collect().map(_.toString).sorted.toSeq
      assert(got == expected,
        s"trial $trial ($dname, k=$k, n=$n): heap diverged from the window\n" +
          s"missing=${expected.diff(got).take(5)}\nextra=${got.diff(expected).take(5)}")
    }
  }

  test("the SQL spelling of top-k lowers too (optimizer normalizes the subquery shape)") {
    // SELECT-from-ranked-subquery is how SQL users spell per-key top-k;
    // predicate pushdown + project collapse normalize it to the
    // Project(Filter(Window)) shape the rewrite matches
    import spark.implicits._
    Seq((1L, 1L, 1.0), (1L, 2L, 2.0), (1L, 3L, 3.0), (2L, 4L, 4.0))
      .toDF("k", "id", "v").createOrReplaceTempView("r9_topk_sql")
    val df = spark.sql(
      """SELECT k, id, v FROM (
        |  SELECT *, row_number() OVER (PARTITION BY k ORDER BY v DESC, id) AS rn
        |  FROM r9_topk_sql) WHERE rn <= 2""".stripMargin)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), p.take(2000))
    assert(!p.contains("Window"), p.take(2000))
    assert(df.collect().map(_.getLong(1)).toSet == Set(2L, 3L, 4L))
    spark.catalog.dropTempView("r9_topk_sql")
  }

  test("BandJoinRewrite ≡ brute force on randomized data with negatives and random eps") {
    // the bucketing spells floor division as (x − pmod(x, ε)) div ε so
    // NEGATIVE operands bucket like the oracle's // — fuzz that claim:
    // random signed values, random ε, compared against a local brute force
    import spark.implicits._
    val rnd = new scala.util.Random(99L)
    for (trial <- 1 to 5) {
      val eps = 1L + rnd.nextInt(50)
      val xs = (0 until 300).map(i => (rnd.nextInt(400) - 200L, i.toLong))
      val ys = (0 until 200).map(j => (rnd.nextInt(400) - 200L, j.toLong))
      val l = xs.toDF("x", "i").repartition(3)
      val r = ys.toDF("y", "j").repartition(2)
      val joined = l.join(r, abs(col("x") - col("y")) <= lit(eps))
        .select("i", "j")
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("NestedLoop") && !p.contains("Cartesian"),
        s"trial $trial (eps=$eps): rewrite did not fire:\n${p.take(1200)}")
      val got = joined.collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      val want = (for {
        (x, i) <- xs; (y, j) <- ys if math.abs(x - y) <= eps
      } yield (i, j)).toSet
      assert(got == want,
        s"trial $trial (eps=$eps): missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
    }
  }

  test("partial pass flushes at the key cap: bounded map-side memory, results exact") {
    // 200 distinct keys against a cap of 8: the partial map must flush
    // ~25× per input partition instead of growing, the final pass
    // re-merges the repeated per-key heaps, and the answer is unchanged.
    val confKey = graft.plans.TopKPerKeyExec.PartialMaxKeysKey
    val df = spark.range(0, 20000).selectExpr(
      "id % 200 as k", "cast(id % 37 as double) as v", "id")
      .repartition(4)
    def topk() = {
      val out = graft.plans.TopKPerKey.of(df, "k", "v", "id", 2)
      (out.collect().map(_.toString).sorted.toSeq, out)
    }
    val (uncapped, _) = topk()
    spark.conf.set(confKey, "8")
    val (capped, cappedDf) = try topk() finally spark.conf.unset(confKey)
    assert(capped == uncapped, "the key cap must never change results")
    // the operator's own SQL metrics record the degraded-regime signal
    def topkNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[graft.plans.TopKPerKeyExec] = p.collect {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        topkNodes(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        topkNodes(s.plan) // stages hide their subtree from collect
      case t: graft.plans.TopKPerKeyExec => Seq(t)
    }.flatten
    val partialNodes = topkNodes(cappedDf.queryExecution.executedPlan)
      .filter(_.partial)
    val partialFlushes = partialNodes.map(_.metrics("numCapFlushes").value).sum
    assert(partialFlushes > 0,
      "the partial node's numCapFlushes metric must record the cap hits")
    assert(uncapped.size == 400) // 200 keys × k=2
    // the operator's OWN output metric proves flushing emitted extra
    // per-key heaps through its exchange (a shuffle-level listener would
    // also count the input repartition's 20000 records and prove
    // nothing): an uncapped partial emits at most keys×k per input
    // partition (4·400 = 1600 total); repeated flushes at cap 8 must
    // exceed that bound
    val partialOut = partialNodes.map(_.metrics("numOutputRows").value).sum
    assert(partialOut > 1600,
      s"partial emitted only $partialOut rows — cap flushing never fired " +
        "beyond the uncapped per-partition top-k bound")
  }
}
