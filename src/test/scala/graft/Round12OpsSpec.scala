package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 additions: TopKPerKeyPartial's whole-stage-codegen
  * participation (the blocking-build fusion), pinned against the iterator
  * path it replaces.
  */
class Round12OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private def topkDf() = {
    val rnd = new scala.util.Random(1212L)
    import spark.implicits._
    (1 to 4000).map { i =>
      (rnd.nextInt(60).toLong, i.toLong, rnd.nextInt(1000) - 500.0)
    }.toDF("k", "id", "v")
  }

  test("TopKPerKeyPartial fuses into whole-stage codegen; results identical to the iterator path") {
    val fallbackKey = "spark.sql.codegen.fallback"
    val savedFb = spark.conf.getOption(fallbackKey)
    // no silent fallback: if the generated build loop fails to compile,
    // this test must FAIL, not quietly pass through the iterator path
    spark.conf.set(fallbackKey, "false")
    try {
      val out = graft.plans.TopKPerKey.of(topkDf(),
        Seq(col("k")), Seq(col("v").desc, col("id").asc), 3)
      val gen = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // AQE finalizes codegen stages at execution; inspect the final plan
      val p = out.queryExecution.executedPlan.toString
      // inside a codegen stage operators render with a "*(n) " prefix
      assert("""\*\(\d+\) TopKPerKeyPartial""".r.findFirstIn(p).isDefined,
        s"partial pass not inside WholeStageCodegen:\n${p.take(4000)}")
      // knob off → iterator path (the round-11 shape); must agree exactly
      spark.conf.set(graft.plans.TopKPerKeyExec.CodegenKey, "false")
      val (iter, pOff) = try {
        val d = graft.plans.TopKPerKey.of(topkDf(),
          Seq(col("k")), Seq(col("v").desc, col("id").asc), 3)
        val rows = d.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        (rows, d.queryExecution.executedPlan.toString)
      } finally spark.conf.unset(graft.plans.TopKPerKeyExec.CodegenKey)
      assert("""\*\(\d+\) TopKPerKeyPartial""".r.findFirstIn(pOff).isEmpty,
        "knob off must exclude the partial pass from codegen")
      assert(gen == iter)
      assert(gen.size == 60 * 3)
    } finally {
      savedFb.fold(spark.conf.unset(fallbackKey))(spark.conf.set(fallbackKey, _))
    }
  }

  test("codegen'd partial pass honors the key cap via the spill buffer, results exact") {
    val fallbackKey = "spark.sql.codegen.fallback"
    spark.conf.set(fallbackKey, "false")
    spark.conf.set(graft.plans.TopKPerKeyExec.PartialMaxKeysKey, "2")
    try {
      // cap=2 over 60 keys: the generated build flushes the heap map
      // dozens of times into the spillable buffer; the final pass
      // re-merges, so results must still be exactly row_number() <= 3
      val out = graft.plans.TopKPerKey.of(topkDf(),
        Seq(col("k")), Seq(col("v").desc, col("id").asc), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
      val want = topkDf().withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == want)
    } finally {
      spark.conf.unset(graft.plans.TopKPerKeyExec.PartialMaxKeysKey)
      spark.conf.unset(fallbackKey)
    }
  }

  test("flush buffer past its 4096-row in-memory threshold (sorter leg), results exact") {
    val fallbackKey = "spark.sql.codegen.fallback"
    spark.conf.set(fallbackKey, "false")
    spark.conf.set(graft.plans.TopKPerKeyExec.PartialMaxKeysKey, "8")
    try {
      // one partition, 5000 distinct keys, cap 8: the generated build
      // flushes ~625 times and accumulates ~10k rows in the spill buffer —
      // past GraftSpillableRowBuffer's 4096-row in-memory threshold, so
      // the ExternalAppendOnlyUnsafeRowArray hands itself to its
      // disk-spilling sorter mid-build; every row must survive the
      // in-memory → sorter transition bit-exactly
      val rnd = new scala.util.Random(1213L)
      import spark.implicits._
      val df = (1 to 10000).map { i =>
        (rnd.nextInt(5000).toLong, i.toLong, rnd.nextInt(100000) - 50000.0)
      }.toDF("k", "id", "v").coalesce(1)
      val out = graft.plans.TopKPerKey.of(df,
        Seq(col("k")), Seq(col("v").desc, col("id").asc), 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("k").orderBy(col("v").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == want)
    } finally {
      spark.conf.unset(graft.plans.TopKPerKeyExec.PartialMaxKeysKey)
      spark.conf.unset(fallbackKey)
    }
  }

  test("registered top-k queries ride the codegen'd partial over the parquet scan") {
    // fail-loud on BOTH axes: an unknown name and a missing lowering each
    // make the sweep vacuous (the round-12 version silently skipped a
    // misspelled query, exactly the assertion rot Bench's BENCH_ONLY guard
    // exists to prevent)
    for (q <- Seq("win_topk_multikey", "w_topk_precip_perkey")) {
      assert(SparkEntry.queries.contains(q),
        s"codegen sweep names unregistered query '$q' — fix the list")
      val d = run(q)
      d.collect() // executes THIS QueryExecution, finalizing AQE's stages
      val p = d.queryExecution.executedPlan.toString
      assert(p.contains("TopKPerKeyPartial"),
        s"$q no longer lowers to the heap operator:\n${p.take(2000)}")
      assert("""\*\(\d+\) TopKPerKeyPartial""".r.findFirstIn(p).isDefined,
        s"$q partial pass fell out of codegen:\n${p.take(2000)}")
    }
  }
}
