package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** The SparkSessionExtensions installer: permanent SQL functions + the
  * SelfDotRewrite optimizer rule. The shared test session is built with
  * `.withExtensions(new GraftExtensions)`, so these assert against exactly
  * what a `spark.sql.extensions=graft.GraftExtensions` deployment gets.
  */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("graft_dot available from plain SQL via extensions (no temp registration)") {
    val r = spark.sql(
      "SELECT graft_dot(array(1d, 2d, 3d), array(4d, 5d, 6d)) AS d").head.getDouble(0)
    assert(r == 32.0)
  }

  test("graft_shingles available from plain SQL via extensions") {
    val rows = spark.sql(
      "SELECT graft_shingles('a b c d', 2) AS sh").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a b", "b c", "c d"))
  }

  test("graft_shingle_set available from plain SQL via extensions; dedups per row") {
    val rows = spark.sql(
      "SELECT graft_shingle_set('a b a b a', 2) AS sh").collect().map(_.getString(0))
    assert(rows.toSeq == Seq("a b", "b a"), "first-occurrence order, duplicates dropped")
    // multiplicity-preserving variant keeps all 4 shingles for the same input
    assert(spark.sql("SELECT graft_shingles('a b a b a', 2)").count() == 4)
  }

  // LocalRelation data gets constant-folded end-to-end, hiding the rewrite —
  // so plan-shape assertions run over a parquet scan (embeddings table).
  private def vecs = Tables.embeddings(spark, GraftTestSpark.sf)
    .select(col("vec_id"), GraftFunctions.vecDouble(col("embedding")).as("v"))

  test("SelfDotRewrite: HOF self dot product optimizes to the native primitive") {
    val df = vecs.withColumn("n2", GraftFunctions.dot(col("v"), col("v")))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
    // values equal the unrewritten HOF evaluation
    val expected = vecs
      .withColumn("n2", expr(
        "aggregate(zip_with(v, v, (x, y) -> x * y), cast(0 as double), (a, e) -> a + e)"))
      .orderBy("vec_id").limit(5).collect().map(_.getDouble(2)).toSeq
    val got = df.orderBy("vec_id").limit(5).collect().map(_.getDouble(2)).toSeq
    assert(got == expected)
  }

  test("SelfDotRewrite does NOT fire for two different arrays (zip_with null-pad semantics)") {
    val a = vecs.select(col("vec_id"), col("v").as("va"))
    val b = vecs.select(col("vec_id"), col("v").as("vb"))
    val df = a.join(b, "vec_id")
      .withColumn("d", GraftFunctions.dot(col("va"), col("vb")))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), optimized)
  }

  test("rewrite preserves null propagation (null array -> null result)") {
    import spark.implicits._
    val df = Seq((1L, Some(Array(1.0, 2.0))), (2L, None))
      .toDF("id", "v")
      .withColumn("n2", GraftFunctions.dot(col("v"), col("v")))
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDouble(2) == 5.0)
    assert(rows(1).isNullAt(2))
  }
}
