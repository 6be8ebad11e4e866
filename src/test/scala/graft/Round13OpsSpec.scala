package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 contracts: the two BFS queries serve from ONE memoized
  * distance table, and the bit-packed sign codes behind emb_sign_fidelity
  * agree with the per-dimension compare on boundary values.
  */
class Round13OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("graph_bfs_distance and graph_bfs_doubling share one memoized distance table") {
    // evict first: a sibling suite running either BFS query earlier in the
    // shared session would pre-install the key and make the failing-thunk
    // probe below vacuous
    graft.PersistCache.evict(spark, s"bfs-doubled:$sf:3")
    val a = run("graph_bfs_distance").collect().map(_.toString).toSeq
    // the first run above must have installed the shared PersistCache key;
    // a getOrBuild with a failing thunk proves the build can't re-run
    val dist = graft.PersistCache.getOrBuild(spark, s"bfs-doubled:$sf:3") {
      fail("bfs distance table was not memoized under the shared key")
    }
    assert(dist.columns.toSeq == Seq("id", "dist"))
    val b = run("graph_bfs_doubling").collect().map(_.toString).toSeq
    assert(a == b, "the two BFS spellings must serve the identical census")
  }

  test("samp_dsir: full coverage, exact bigram counts, and target-discriminative scores") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"),
        size(split(lower(col("text")), " ")).as("n_tok"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val out = run("samp_dsir").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    // every document with at least one bigram scores; none invented
    val expected = docs.filter(_._2._2 >= 2).keySet
    assert(out.keySet == expected)
    // n_bigrams is exactly token-count - 1 (the bigram window)
    out.foreach { case (id, (nb, _)) => assert(nb == docs(id)._2 - 1L, s"doc $id") }
    // the DISCRIMINATIVE property DSIR exists for: the en target slice
    // must score higher on average than the rest (both groups are
    // non-empty in the fixture: 193 en / 307 non-en at sf0.001)
    val (en, rest) = out.toSeq.partition { case (id, _) => docs(id)._1 == "en" }
    assert(en.nonEmpty && rest.nonEmpty, "fixture must carry both slices")
    def mean(xs: Seq[(Long, (Long, Double))]) =
      xs.map(_._2._2).sum / xs.size
    assert(mean(en) > mean(rest),
      s"en mean ${mean(en)} must exceed non-en mean ${mean(rest)}")
  }

  test("samp_dsir serves every consumer from the memoized feature table, not corpus rescans") {
    run("samp_dsir").collect() // ensure the dsir-db cache entry is built
    val d = run("samp_dsir")
    d.collect() // finalize AQE stages on THIS QueryExecution
    // the consumers (distribution/totals under the broadcast stage, and
    // the scoring join) must read the persisted (doc,bucket) table; a
    // LIVE corpus scan in the executed tree means a consumer
    // re-tokenizes + re-hashes the whole corpus. Walk the tree (not the
    // string: the InMemoryRelation PRINTS its original build plan,
    // parquet scan included, but an InMemoryTableScan leaf never
    // executes it).
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    var fileScans, memScans = 0
    def walk(p: SparkPlan): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case _: InMemoryTableScanExec => memScans += 1
        case s if s.nodeName.contains("Scan") && s.toString.contains("parquet") =>
          fileScans += 1
        case _ =>
      }
      p.children.foreach(walk)
    }
    walk(d.queryExecution.executedPlan)
    assert(memScans >= 1, "expected the memoized feature table in the executed tree")
    assert(fileScans == 0,
      s"no consumer may rescan the corpus once features are stored ($fileScans live scans)")
  }

  test("bit-packed sign codes reproduce the per-dimension Hamming compare (0.0 boundary included)") {
    import spark.implicits._
    val rnd = new scala.util.Random(1313L)
    def vec(): Seq[Double] = Seq.tabulate(64) { _ =>
      rnd.nextInt(5) match {
        case 0 => 0.0 // the boundary: x > 0 is FALSE for exact zero
        case 1 => -rnd.nextDouble()
        case _ => rnd.nextDouble()
      }
    }
    val df = (1 to 40).map(i => (i.toLong, vec())).toDF("id", "v")
    val code = expr(
      "aggregate(zip_with(v, sequence(0, 63), (x, i) -> IF(x > 0D, shiftleft(1L, i), 0L)), 0L, (a, b) -> a + b)")
    val coded = df.withColumn("code", code)
    val q = coded.select(col("id").as("qid"), col("v").as("qv"), col("code").as("qc"))
    val got = coded.join(broadcast(q), col("qid") < col("id"))
      .select(col("qid"), col("id"),
        bit_count(col("qc").bitwiseXOR(col("code"))).cast("long").as("packed"),
        size(filter(zip_with(col("qv"), col("v"),
          (x, y) => (x > 0) =!= (y > 0)), b => b)).cast("long").as("unpacked"))
      .collect()
    assert(got.length == 40 * 39 / 2)
    got.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"pair (${r.getLong(0)}, ${r.getLong(1)}): packed ${r.getLong(2)} != per-dim ${r.getLong(3)}")
    }
  }
}
