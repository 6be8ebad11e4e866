package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Layouts

/** Compaction must reduce file count to the target without touching the
  * data: identical rows, exact counts — the invariant that makes it safe
  * to run concurrently with readers on an immutable-snapshot store. */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  test("compact: 64 streaming-sized files -> 4, rows and values preserved") {
    val in = Files.createTempDirectory("compact-in").toString
    val out = Files.createTempDirectory("compact-out").toString
    val src = Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
    src.repartition(64).write.mode("overwrite").parquet(in)

    val (before, after) = Layouts.compact(spark, in, out, 4)
    assert(before == 64, s"expected 64 input files, got $before")
    assert(after == 4, s"expected 4 output files, got $after")

    val a = spark.read.parquet(in)
    val b = spark.read.parquet(out)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
