package graft

import org.scalatest.funsuite.AnyFunSuite

/** The document-frequency cutoff on the 4-gram inverted-index pair path
  * (DedupOps.pairShingles, df <= MaxShingleDf): boilerplate shingles hot
  * enough to make the self-join quadratic must NOT produce near-dup pairs,
  * while genuinely rare shared shingles still do. The driver testdata has
  * no shingle anywhere near the cutoff, so this spec builds a synthetic
  * corpus where the cutoff is the deciding factor:
  *
  *  - 70 "boilerplate" docs sharing a 10-word template (7 template
  *    shingles, df = 70 > 64) with one unique trailing word each.
  *    WITHOUT the cutoff every pair scores Jaccard 7/13 ≈ 0.54 ≥ 0.4 →
  *    2415 pairs; with it the template shingles vanish and no pair
  *    survives.
  *  - 2 control docs sharing a distinct 6-word phrase (df = 2): their
  *    pair must survive with Jaccard 1.0.
  */
class ShingleDfCutoffSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark

  test("df cutoff kills boilerplate-only pairs, keeps rare-shingle pairs") {
    import spark.implicits._
    val template = (1 to 10).map(i => s"w$i").mkString(" ")
    val boiler = (0 until 70).map(i => (i.toLong, s"$template uniq$i"))
    val control = Seq((1000L, "r1 r2 r3 r4 r5 r6"), (1001L, "r1 r2 r3 r4 r5 r6"))
    val docs = (boiler ++ control).toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'synth' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
    val dir = java.nio.file.Files.createTempDirectory("df-cutoff").toString
    docs.coalesce(1).write.parquet(s"$dir/documents.parquet")

    val pairs = SparkEntry.queries("dedup_ngram_jaccard")(spark, dir).collect()
    assert(pairs.length == 1,
      s"expected only the control pair, got ${pairs.length} pairs")
    val p = pairs.head
    assert(p.getLong(0) == 1000L && p.getLong(1) == 1001L)
    assert(p.getDouble(2) == 1.0)
  }
}
