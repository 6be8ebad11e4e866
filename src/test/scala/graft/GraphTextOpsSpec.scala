package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the round-4 additions: vocabulary building,
  * unigram-LM scoring, importance sampling, PageRank + degree stats, the
  * filter gate, incremental dedup, chunking, the transition matrix,
  * matryoshka ANN recall, and the SCD2 merge. Oracle equality is the
  * driver's gate; these pin the semantic invariants a hash compare can't
  * express (monotonicity, probability mass, determinism, version chains). */
class GraphTextOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("txt_vocab_topk: shares in (0,1], cum_share monotone, full coverage when K >= |V|") {
    val rows = run("txt_vocab_topk").collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getDouble(5))
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-12 })
    val cnts = rows.map(_.getLong(2))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a }, "counts descend")
    // sf0.001's synthetic vocabulary is smaller than K=50, so the top-K
    // covers the whole corpus: cumulative share must end at exactly 1.0
    if (rows.length < 50) assert(math.abs(cums.last - 1.0) < 1e-6)
    rows.foreach { r => assert(r.getLong(3) >= 1L && r.getDouble(4) > 0.0) }
  }

  test("txt_unigram_logprob: all avg log-probs negative; rare-token docs score lower") {
    val rows = run("txt_unigram_logprob").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0.0, s"doc ${r.getLong(0)}: logprob must be < 0")
      assert(r.getLong(1) > 0L)
    }
    // corpus-level sanity: average over docs matches the corpus unigram
    // entropy's sign and rough scale (tiny vocab => entropy < ln(|V|))
    val nVocab = run("txt_vocab_topk").count()
    val meanLp = rows.map(_.getDouble(2)).sum / rows.length
    assert(meanLp >= -math.log(nVocab.toDouble) - 0.1,
      s"mean logprob $meanLp below -ln|V| floor")
  }

  test("samp_importance: kept iff u01 < w, weights in [0.2, 1.0], deterministic") {
    val a = run("samp_importance").collect()
    assert(a.nonEmpty)
    a.foreach { r =>
      val w = r.getDouble(1); val u = r.getDouble(2)
      assert(u < w + 1e-9, s"doc ${r.getLong(0)} kept with u=$u >= w=$w")
      assert(w >= 0.2 - 1e-9 && w <= 1.0 + 1e-9)
    }
    val b = run("samp_importance").collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq, "re-run must select identical rows")
  }

  test("graph_pagerank: ranks positive+descending, both node kinds, id encoding consistent") {
    val rows = run("graph_pagerank").collect()
    assert(rows.length > 0 && rows.length <= 30)
    val fps = rows.map(_.getLong(3))
    assert(fps.forall(_ > 0L))
    assert(fps.zip(fps.tail).forall { case (a, b) => b <= a }, "descending rank")
    // total mass is 1e12 picounits; no single node may exceed it
    assert(fps.head < 1000000000000L)
    rows.foreach { r =>
      val id = r.getLong(0); val kind = r.getString(1); val key = r.getLong(2)
      assert(if (id % 2 == 0) kind == "customer" && key * 2 == id
             else kind == "supplier" && key * 2 + 1 == id)
    }
    assert(rows.map(_.getString(1)).toSet == Set("customer", "supplier"),
      "trade graph must surface both customers and suppliers in the top-30")
  }

  test("pipe_curation_funnel: totals equal composing the individually-registered stages") {
    val funnel = run("pipe_curation_funnel").collect()
    val keep = run("dedup_keep_list").collect()
      .filter(_.getInt(1) == 1).map(_.getLong(0)).toSet
    val gate = run("pipe_filter_gate").collect()
      .filter(_.getInt(5) == 1).map(_.getLong(0)).toSet
    val samp = run("samp_importance").collect().map(_.getLong(0)).toSet
    val nTok = run("txt_token_stats").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val finalIds = keep & gate & samp
    assert(funnel.map(_.getLong(2)).sum == keep.size, "n_dedup")
    assert(funnel.map(_.getLong(3)).sum == (keep & gate).size, "n_gate")
    assert(funnel.map(_.getLong(4)).sum == finalIds.size, "n_final")
    assert(funnel.map(_.getLong(5)).sum == finalIds.toSeq.map(nTok).sum, "tokens_final")
    // the funnel must actually narrow (each stage drops something at sf0.001)
    val (raw, ded, gat, fin) = (funnel.map(_.getLong(1)).sum,
      funnel.map(_.getLong(2)).sum, funnel.map(_.getLong(3)).sum,
      funnel.map(_.getLong(4)).sum)
    assert(raw > ded && ded > gat && gat > fin && fin > 0, s"$raw>$ded>$gat>$fin>0")
  }

  test("mv_scd2_merge: exactly one current version per key, seamless validity chains") {
    val rows = run("mv_scd2_merge").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getDate(3).toString, r.getDate(4).toString, r.getInt(5)))
    val byKey = rows.groupBy(_._1)
    byKey.foreach { case (k, vs) =>
      assert(vs.count(_._6 == 1) == 1, s"key $k: exactly one current version")
      val sorted = vs.sortBy(_._2)
      assert(sorted.head._4 == "2024-01-01")
      assert(sorted.last._5 == "9999-12-31", s"key $k: open-ended current row")
      // seamless chain: each version starts where the previous one closed
      sorted.toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a._5 == b._4, s"key $k: gap between versions")
        case _ => ()
      }
      if (k % 7 == 0) {
        assert(vs.length == 2 && sorted.last._3 == "PROMO")
        assert(sorted.head._6 == 0, "closed version is not current")
      } else assert(vs.length == 1)
    }
  }

  test("evt_transition_matrix: rows are probability distributions, counts conserve pairs") {
    val rows = run("evt_transition_matrix").collect()
    assert(rows.nonEmpty)
    val byFrom = rows.groupBy(_.getString(0))
    byFrom.foreach { case (from, rs) =>
      val pSum = rs.map(_.getDouble(3)).sum
      // per-row fround(4) noise is bounded by |types|/2e4
      assert(math.abs(pSum - 1.0) < rs.length * 5e-5 + 1e-9,
        s"$from: probabilities sum to $pSum")
      rs.foreach(r => assert(r.getDouble(3) > 0.0 && r.getLong(2) > 0L))
    }
    // pair conservation: total transitions = total events - distinct users
    // (each user's sequence of n events yields n-1 consecutive pairs)
    val events = Tables.events(spark, sf)
    val expected = events.count() - events.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("sim_knn_matryoshka: two-stage recall vs brute force clears the random-data floor") {
    val brute = run("sim_knn_brute").collect()
      .filter(_.getInt(3) <= 3)
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val mat = run("sim_knn_matryoshka").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(mat.keySet == brute.keySet)
    mat.foreach { case (_, ns) => assert(ns.size == 3) }
    val hits = brute.map { case (q, ns) => (ns & mat(q)).size }.sum
    val total = brute.values.map(_.size).sum
    // random vectors bound prefix-cos correlation at sqrt(32/64) ≈ 0.71;
    // measured recall is ~73% — assert a margin below it (matryoshka-
    // trained embeddings would sit far higher)
    assert(hits.toDouble / total >= 0.6, s"recall $hits/$total")
  }

  test("pageRank library op matches a driver-side integer reference on random graphs") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, count, lit}
    def reference(sym: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val deg = sym.groupBy(_._1).map { case (k, es) => k -> es.size.toLong }
      val n = deg.size
      // same floor(x + 0.5) spelling as the operator and its oracle
      var r = deg.keys.map(_ -> math.floor(1e12 / n + 0.5).toLong).toMap
      val base = math.floor(1.5e11 / n + 0.5).toLong
      for (_ <- 1 to iters) {
        r = sym.groupBy(_._2).map { case (v, es) =>
          v -> (base + es.map { case (u, _) => (r(u) * 85L) / (100L * deg(u)) }.sum)
        }
      }
      r
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val raw = Seq.fill(40)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
        .filter(p => p._1 != p._2).distinct
      val sym = (raw ++ raw.map(_.swap)).distinct
      val symDf = sym.toDF("src", "dst").persist()
      val nd = symDf.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist()
      val got = graft.operators.GraphOps.pageRank(symDf, nd, iters = 3)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      symDf.unpersist(); nd.unpersist()
      assert(got == reference(sym, 3), s"trial $trial")
    }
  }

  test("pipe_chunk_overlap: chunks tile every doc at stride 48 and cover the final token") {
    val chunks = run("pipe_chunk_overlap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .groupBy(_._1)
    val nTok = run("txt_token_stats").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(chunks.keySet == nTok.keySet.filter(nTok(_) >= 1))
    chunks.foreach { case (doc, cs) =>
      val n = nTok(doc)
      val sorted = cs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until sorted.length).toSeq, "consecutive ids")
      sorted.foreach { case (_, cid, start, ct) =>
        assert(start == cid * 48 + 1)
        assert(ct == math.min(64, n - start + 1), s"doc $doc chunk $cid")
      }
      val (_, _, lastStart, lastCt) = sorted.last
      assert(lastStart + lastCt - 1 == n, "final token covered")
      assert(sorted.length == 1 + (n - 1) / 48, "chunk count formula")
    }
  }

  test("pipe_filter_gate: keep iff kept, rule order is length > repetitive > low_stopword") {
    val rows = run("pipe_filter_gate").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, ttr, stop, reason, keep) =
        (r.getInt(1), r.getDouble(2), r.getDouble(3), r.getString(4), r.getInt(5))
      assert((keep == 1) == (reason == "kept"))
      if (nTok < 20 || nTok > 200) assert(reason == "length")
      else if (ttr < 0.4) assert(reason == "repetitive")
      else if (stop < 0.05) assert(reason == "low_stopword")
      else assert(reason == "kept")
    }
    // the gate must actually separate classes on the fixed corpus
    assert(rows.map(_.getString(4)).toSet ==
      Set("kept", "length", "repetitive", "low_stopword"))
  }

  test("dedup_incremental: covers exactly the new batch; matches are corpus docs; consistent with pair list") {
    val rows = run("dedup_incremental").collect()
    val expected = run("txt_fingerprint").collect().map(_.getLong(0)).filter(_ % 10 == 9).toSet
    assert(rows.map(_.getLong(0)).toSet == expected, "one verdict per new-batch doc")
    rows.foreach { r =>
      val isNew = r.getString(1) == "new"
      assert(r.isNullAt(2) == isNew, s"matched_corpus_doc iff dup: $r")
      if (!isNew) assert(r.getLong(2) % 10 != 9, s"match must be a corpus doc: $r")
    }
    // every >= 0.4 Jaccard pair crossing the batch boundary must surface as
    // a non-'new' verdict for its new-batch end
    val flagged = rows.filter(_.getString(1) != "new").map(_.getLong(0)).toSet
    run("dedup_ngram_jaccard").collect().foreach { p =>
      val (a, b) = (p.getLong(0), p.getLong(1))
      if (a % 10 == 9 ^ b % 10 == 9)
        assert(flagged.contains(if (a % 10 == 9) a else b),
          s"crossing pair ($a,$b) not flagged")
    }
  }

  test("graph_degree_stats: both kinds, avg within [min, max], supplier degree dominates") {
    val rows = run("graph_degree_stats").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("customer", "supplier"))
    rows.foreach { r =>
      val (mn, mx, avg) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(mn >= 1L && mn <= mx && avg >= mn - 1e-9 && avg <= mx + 1e-9)
    }
    val byKind = rows.map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(byKind("supplier") > byKind("customer"),
      "fewer suppliers share the same edge set, so their mean degree must be higher")
  }

  test("evt_zscore_anomaly: sigma >= 0, z = 0 iff sigma = 0, z sign matches cnt vs mu") {
    val rows = run("evt_zscore_anomaly").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, mu, sg, z) = (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(sg >= 0.0)
      if (sg == 0.0) assert(z == 0.0)
      else {
        if (cnt > mu + 1e-4) assert(z > -1e-9)
        if (cnt < mu - 1e-4) assert(z < 1e-9)
      }
    }
  }

  test("graph_pagerank: suppliers aggregate more mass per node than customers (degree skew)") {
    // suppliers are ~10x fewer than customers in the TPC-H-ish schema, so
    // the undirected random walk concentrates on them — the supplier mean
    // rank in the top-30 should exceed the customer mean. This pins that
    // the rank actually reflects graph structure, not the init value.
    val rows = run("graph_pagerank").collect()
    val byKind = rows.groupBy(_.getString(1)).map { case (k, rs) =>
      k -> rs.map(_.getLong(3)).sum.toDouble / rs.length }
    for { s <- byKind.get("supplier"); c <- byKind.get("customer") }
      assert(s > c, s"supplier mean $s should exceed customer mean $c")
  }
}
