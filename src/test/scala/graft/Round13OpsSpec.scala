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
