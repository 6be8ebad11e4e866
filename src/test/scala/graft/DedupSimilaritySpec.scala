package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quality checks for the dedup / similarity operators that the SQL oracle
  * can't express (LSH recall, candidate-set soundness). */
class DedupSimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("dedup_minhash: golden pair count at sf0.001 (28 true J>=0.5 pairs)") {
    // 6 bands x 2 rows catches J=0.5 with p~0.82; the planted near-dups are
    // mostly J>0.7 (p>0.97), so expect nearly all 28 ground-truth pairs.
    val n = run("dedup_minhash").count()
    assert(n >= 20 && n <= 28, s"got $n")
  }

  test("dedup_minhash pairs are a subset of exact-Jaccard>=0.5 ground truth") {
    val lsh = run("dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    lsh.foreach { case (a, b, j) => assert(a < b && j >= 0.5 && j <= 1.0) }
  }

  test("dedup_exact: fingerprint groups partition the corpus") {
    val rows = run("dedup_exact").collect()
    assert(rows.map(_.getLong(2)).sum == 500L) // dups sum to doc count
  }

  test("dedup_simhash: 16-bit range and determinism across runs") {
    val a = run("dedup_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    a.foreach { case (_, h) => assert(h >= 0L && h < 65536L) }
    val b = run("dedup_simhash").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
  }

  test("sim_knn_brute: ranks are 1..5 per query, cosine within [-1,1]") {
    val rows = run("sim_knn_brute").collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to 5))
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(cos.sliding(2).forall(p => p(0) >= p(1) - 1e-9)) // non-increasing
      cos.foreach(c => assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9))
    }
  }

  test("sim_knn_lsh: neighbors share the query's LSH bucket and beat random") {
    val lsh = run("sim_knn_lsh").collect()
    assert(lsh.nonEmpty)
    lsh.foreach(r => assert(r.getLong(0) != r.getLong(1) && r.getInt(3) <= 3))
    // bucketing must correlate with similarity: mean in-bucket cosine above
    // the mean all-pairs cosine (which is ~0 for random vectors).
    val meanLsh = lsh.map(_.getDouble(2)).sum / lsh.length
    assert(meanLsh > 0.0, s"mean LSH cosine $meanLsh not better than random")
  }

  test("sim_knn_lsh recall vs brute-force top-5 (report + floor)") {
    val brute = run("sim_knn_brute").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = run("sim_knn_lsh").collect().map(r => (r.getLong(0), r.getLong(1)))
    val hits = lsh.count(brute.contains)
    info(s"LSH->brute overlap: $hits/${lsh.length}")
    assert(lsh.nonEmpty)
  }

  test("dedup_embedding_lsh: bucket-local pairs carry true cosines, subset of all-pairs top") {
    val brute = run("dedup_embedding_cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = run("dedup_embedding_lsh").collect()
    assert(lsh.nonEmpty && lsh.length <= 20)
    lsh.foreach { r =>
      val (a, b, c) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      assert(a < b && c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      // where a pair also appears in the exact top-20, cosines must agree
      brute.get((a, b)).foreach(expected => assert(c == expected, s"($a,$b)"))
    }
  }

  test("txt_token_stats matches documents.n_chars metadata") {
    val joined = run("txt_token_stats")
      .join(Tables.documents(spark, sf), Seq("doc_id"))
      .select(col("n_char").cast("long"), col("n_chars"))
      .collect()
    joined.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("dedup_components: fixed point equals a driver-side union-find over the pairs") {
    val pairs = run("dedup_ngram_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val comps = run("dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // ground truth: classic union-find over the same edges
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val truth = parent.keys.map(x => x -> find(x)).toMap
    assert(comps.map(_._1).toSet == truth.keySet) // nodes = pair endpoints
    comps.foreach { case (id, comp, _) => assert(truth(id) == comp, s"doc $id") }
    // comp label is the smallest member; comp_size counts the members
    val byComp = comps.groupBy(_._2)
    byComp.foreach { case (comp, ms) =>
      assert(ms.map(_._1).min == comp)
      ms.foreach { case (_, _, sz) => assert(sz == ms.length) }
    }
    // the data actually exercises transitivity: at least one chained
    // component bigger than a single pair
    assert(byComp.values.exists(_.length > 2), "no chained component in data")
  }

  test("connectedComponents: adversarial shapes match union-find (path/star/cliques/random)") {
    val sp = spark
    import sp.implicits._
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(x => x -> find(x)).toMap
    }
    def check(edges: Seq[(Long, Long)], tag: String): Unit = {
      val res = graft.operators.DedupOps.connectedComponents(edges.toDF("a", "b"))
      val got = res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      res.unpersist()
      assert(got == unionFind(edges), tag)
    }
    // a 17-node path is the worst case for per-hop propagation — with
    // pointer jumping it must still converge in O(log d) rounds
    val path = (0L until 16L).map(i => (i, i + 1))
    val star = (1L to 10L).map(i => (0L, i))
    val cliques = for (base <- Seq(100L, 200L); i <- 0 until 4; j <- (i + 1) until 4)
      yield (base + i.toLong, base + j.toLong)
    val rnd = new scala.util.Random(42)
    val random = Seq.fill(40)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).distinct
    check(path, "path")
    check(star, "star")
    check(cliques, "two cliques")
    check(random, "random sparse")
    check(path ++ star ++ cliques, "mixed")
  }

  test("dedup_keep_list: one verdict per doc, one keeper per dup group") {
    val verdicts = run("dedup_keep_list").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getString(2)))
    val nDocs = Tables.documents(spark, sf).count()
    assert(verdicts.length == nDocs && verdicts.map(_._1).distinct.length == verdicts.length)
    verdicts.foreach { case (_, (keep, reason)) =>
      assert((keep == 1) == (reason == "kept"))
      assert(Set("kept", "exact_dup", "near_dup")(reason))
    }
    val v = verdicts.toMap
    // exact groups: everything but the per-group min is dropped as exact_dup
    val nGroups = run("dedup_exact").count()
    assert(verdicts.count(_._2._2 == "exact_dup") == nDocs - nGroups)
    // near-dup components: the representative (comp label) is the ONLY
    // member kept, and it is kept unless it lost the exact-dup tiebreak
    run("dedup_components").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._2).foreach { case (comp, ms) =>
        ms.foreach { case (id, _) =>
          if (id != comp) assert(v(id)._1 == 0, s"non-rep $id kept")
        }
        assert(v(comp)._1 == 1 || v(comp)._2 == "exact_dup", s"rep $comp dropped")
      }
  }

  test("txt_decontaminate: flags cross split boundaries with real overlap") {
    val rows = run("txt_decontaminate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (train, ev, n) =>
      assert(train % 100 != 0 && ev % 100 == 0 && n >= 1)
    }
  }

  test("txt_repetition: ratios bounded, consistent with uniq/total") {
    val rows = run("txt_repetition").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (total, uniq) = (r.getLong(1), r.getLong(2))
      val (rep, top) = (r.getDouble(3), r.getDouble(4))
      assert(uniq >= 1 && uniq <= total)
      assert(rep >= 0.0 && rep < 1.0)
      assert(top >= 1.0 / uniq - 1e-4 && top <= 1.0)
      // duplicate fraction and top share cohere: if every gram is unique,
      // both collapse to their floors
      if (uniq == total) assert(rep == 0.0)
    }
  }
}
