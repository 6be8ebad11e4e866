package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfPqAnn

/** IVF-PQ composite: stored-index shape (codes only, cid-partitioned),
  * partition-pruned probe scan, and recall against the exact brute-force
  * baseline — the checks the SQL oracle can't express. */
class IvfPqAnnSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("stored index holds ONLY (vec_id, codes) partitioned by cid — no raw vectors") {
    val idx = IvfPqAnn.storedIndex(spark, sf)
    val dirs = new java.io.File(idx).listFiles.filter(_.getName.startsWith("cid="))
    assert(dirs.nonEmpty, "index must be a cid-partitioned layout on disk")
    val df = spark.read.parquet(idx)
    assert(df.columns.sorted.toSeq == Seq("cid", "codes", "vec_id"),
      s"compressed payload only — got ${df.columns.mkString(",")}")
    val n = Tables.embeddings(spark, sf).count()
    assert(df.count() == n, "every corpus vector encoded exactly once")
    assert(df.select("vec_id").distinct().count() == n)
    // codes are M indices each within the codebook range
    val bad = df.filter(size(col("codes")) =!= operators.PqAnn.M ||
      exists(col("codes"), c => c < 0 || c >= operators.PqAnn.KC)).count()
    assert(bad == 0, "all codes in [0, KC) with M entries")
  }

  test("sim_knn_ivfpq: well-formed top-3, self excluded, partition-pruned scan") {
    val df = run("sim_knn_ivfpq")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length), s"query $q")
      rs.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
    // the probe scan must prune at the file index: nprobe bucket dirs
    // read, not the whole code table
    val p = df.queryExecution.executedPlan.toString
    val pruned = """PartitionFilters: \[[^\]]*cid""".r.findFirstIn(p)
    assert(pruned.isDefined, p.take(3000))
  }

  test("sim_knn_ivfpq recall@3 vs brute-force top-5 beats the random floor") {
    val brute = run("sim_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = run("sim_knn_ivfpq").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hits = got.count(brute.contains)
    val nQueries = got.map(_._1).distinct.length
    info(s"IVF-PQ->brute overlap: $hits/${got.length} over $nQueries queries")
    // the composite quantizes twice (coarse prune + 4-bit codes), so its
    // recall sits under plain IVF's — but random 3-of-~500 picks would hit
    // a brute top-5 ~3% of the time; require 5x that floor
    assert(hits.toDouble / got.length > 0.15,
      s"recall ${hits.toDouble / got.length} at the random floor — index broken")
  }

  test("ADC ranking agrees with driver-recomputed asymmetric distances (sample)") {
    // recompute ad2 for one query's returned neighbors straight from the
    // cached models and the stored codes; the query's values must match
    val rows = run("sim_knn_ivfpq").collect()
    val q0 = rows.map(_.getLong(0)).min
    val model = operators.PqAnn.trainedCodebooks(spark, sf)
    val byKey = model.map { case (m, c, v) => (m, c) -> v }.toMap
    val qv = operators.PqAnn.unitVecs(spark, sf)
      .filter(col("vec_id") === q0).select("v").head.getSeq[Double](0)
    val codes = spark.read.parquet(IvfPqAnn.storedIndex(spark, sf))
      .filter(col("vec_id").isin(rows.filter(_.getLong(0) == q0).map(r => Long.box(r.getLong(1))): _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    rows.filter(_.getLong(0) == q0).foreach { r =>
      val cs = codes(r.getLong(1))
      val ad2 = (0 until operators.PqAnn.M).map { m =>
        val qm = qv.slice(m * operators.PqAnn.SUBDIM, (m + 1) * operators.PqAnn.SUBDIM)
        val cv = byKey((m, cs(m)))
        qm.zip(cv).map { case (x, y) => (x - y) * (x - y) }.sum
      }.sum
      assert(math.abs(math.floor(ad2 * 1e4 + 0.5) / 1e4 - r.getDouble(2)) < 1e-9,
        s"neighbor ${r.getLong(1)}: recomputed $ad2 vs ${r.getDouble(2)}")
    }
  }
}
