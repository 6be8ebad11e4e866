package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 pipeline additions: bloom-prefiltered decontamination,
  * boilerplate-span detection, cohort retention. The oracled invariants the
  * DuckDB gate can't express (pruning actually happened, exact/bloom
  * agreement) live here. */
class TextPipelineSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("bloom prefilter prunes the train shingle scan") {
    val total = graft.operators.DedupOps.shingles4(spark, sf)
      .filter(col("doc_id") % 100 =!= 0).count()
    val candidates = graft.operators.TextOps.bloomCandidates(spark, sf).count()
    info(s"bloom candidates: $candidates of $total train shingles")
    assert(candidates < total,
      s"bloom sketch should gate the scan ($candidates vs $total)")
  }

  test("txt_decontaminate_bloom == txt_decontaminate (false positives verified away)") {
    val exact = run("txt_decontaminate").collect().map(_.toSeq).toSet
    val bloom = run("txt_decontaminate_bloom").collect().map(_.toSeq).toSet
    assert(exact == bloom)
  }

  test("bloom build and probe are native expressions: no UDF anywhere in the plan") {
    val df = SparkEntry.queries("txt_decontaminate_bloom")(spark, sf)
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("ScalaUDF") && !df.queryExecution.analyzed.toString.contains("ScalaUDF"),
      "bloom path must not fall back to a Scala UDF")
    assert(physical.contains("might_contain"),
      "probe must be the native BloomFilterMightContain predicate")
    assert(physical.contains("bloom_filter_agg") || physical.contains("BloomFilterAggregate"),
      "sketch must be built in-plan by BloomFilterAggregate")
  }

  test("txt_boilerplate: shares in [0,1], boiler spans never exceed spans") {
    val rows = run("txt_boilerplate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSpans, nBoiler, share) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nBoiler <= nSpans)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - math.floor(nBoiler.toDouble / nSpans * 10000 + 0.5) / 10000) < 1e-12)
    }
  }

  test("evt_retention: offset 0 is full retention; activity never exceeds the cohort") {
    val rows = run("evt_retention").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (off, nActive, size, ret) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(nActive <= size)
      assert(off >= 0)
      if (off == 0) assert(ret == 1.0 && nActive == size)
    }
    // retention is keyed uniquely
    assert(rows.map(r => (r.getDate(0), r.getInt(1))).distinct.length == rows.length)
  }
}
