package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IvfAnn

/** IVF ANN: quantizer sanity, index partition soundness, and recall against
  * the exact brute-force baseline (the checks a SQL oracle can't express). */
class IvfAnnSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  private lazy val vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), graft.functions.GraftFunctions.vecDouble(col("embedding")).as("v"))

  test("train: 16 centroids of the vector dimensionality, deterministic") {
    val c1 = IvfAnn.train(spark, vecs).collect().sortBy(_.getInt(0))
    assert(c1.length == 16)
    val dim = vecs.select(size(col("v"))).head.getInt(0)
    c1.foreach(r => assert(r.getSeq[Double](1).length == dim))
    val c2 = IvfAnn.train(spark, vecs).collect().sortBy(_.getInt(0))
    (c1 zip c2).foreach { case (a, b) => assert(a.getSeq[Double](1) == b.getSeq[Double](1)) }
  }

  test("assign: partitions the vector set (every vector exactly one bucket)") {
    val assigned = IvfAnn.assign(spark, vecs, IvfAnn.train(spark, vecs))
    assert(assigned.count() == vecs.count())
    assert(assigned.select("vec_id").distinct().count() == vecs.count())
    val cids = assigned.select("cid").distinct().collect().map(_.getInt(0))
    cids.foreach(c => assert(c >= 0 && c < 16))
  }

  test("assignment is nearest-centroid: assigned d2 <= any other centroid's d2 (sample)") {
    val cent = IvfAnn.train(spark, vecs).collect()
      .map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val sample = IvfAnn.assign(spark, vecs, IvfAnn.train(spark, vecs))
      .filter(col("vec_id") % 37 === 0).collect()
    sample.foreach { r =>
      val v = r.getSeq[Double](2).toArray
      val own = d2(v, cent(r.getInt(1)))
      cent.values.foreach(c => assert(own <= d2(v, c) + 1e-9))
    }
  }

  test("sim_knn_ivf: well-formed top-3 per query") {
    val rows = run("sim_knn_ivf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length), s"query $q")
      rs.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    }
  }

  test("sim_knn_ivf probes the stored cid-partitioned index with PartitionFilters") {
    // the registered query's probe scan must prune at the file index: its
    // parquet scan of the stored index carries a non-empty PartitionFilters
    // on cid (nprobe directories read, not a full scan / recomputed assign)
    val p = run("sim_knn_ivf").queryExecution.executedPlan.toString
    val pruned = """PartitionFilters: \[[^\]]*cid""".r.findFirstIn(p)
    assert(pruned.isDefined, p.take(3000))
    // and the stored index is a real partitioned layout on disk
    val idx = IvfAnn.storedIndex(spark, sf, vecs)
    val dirs = new java.io.File(idx).listFiles.filter(_.getName.startsWith("cid="))
    assert(dirs.nonEmpty)
    val total = spark.read.parquet(idx).count()
    assert(total == vecs.count())
  }

  test("sim_knn_ivf recall@3 vs brute-force top-5 beats the random floor") {
    val brute = run("sim_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = run("sim_knn_ivf").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hits = ivf.count(brute.contains)
    val nQueries = ivf.map(_._1).distinct.length
    info(s"IVF->brute overlap: $hits/${ivf.length} over $nQueries queries")
    // random 3 picks from ~500 vectors would hit a brute top-5 ~3% of the
    // time; nprobe=3 of k=16 buckets scans ~19% of data but concentrated
    // where neighbors are — demand clearly-better-than-random.
    assert(hits.toDouble / ivf.length > 0.15, s"recall proxy $hits/${ivf.length}")
  }
}
